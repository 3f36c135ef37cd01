#!/usr/bin/env python3
"""Round-4 TPU measurements: single-dispatch S=1 fit, mixture-grid skip A/B.

Usage: python benchmarks/measure_r4.py [m_variants] [--no-mix]
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from profile_fit_host import build_dataset  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import viprs_tpu  # noqa: F401
    import jax
    from viprs_tpu.model import VIPRS

    m_target = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
        else 1_100_000
    ds = build_dataset(m_target)
    log(f"devices: {jax.devices()}  M={ds.m} NB={ds.layout.nb}")
    fit_kwargs = dict(max_iter=1000, f_abs_tol=1e-6, x_abs_tol=1e-6,
                      patience=10)

    # ---- S=1 headline: single dispatch incl. in-graph restart ----
    np.random.seed(0)
    t0 = time.time()
    m = VIPRS(ds)
    m.fit(**fit_kwargs)
    log(f"warm-up fit (compile): {time.time() - t0:.2f}s "
        f"iters={m.optim_result.nit} restarted="
        f"{m.fix_params.get('sigma_epsilon') is not None} "
        f"msg={m.optim_result.message}")

    times, iters = [], []
    for rep in range(5):
        np.random.seed(0)
        t0 = time.time()
        m2 = VIPRS(ds)
        m2.fit(**fit_kwargs)
        times.append(time.time() - t0)
        iters.append(m2.optim_result.nit)
        log(f"steady-state fresh fit {rep + 1}: {times[-1]:.3f}s "
            f"iters={iters[-1]}")
    log(f"S=1 fresh fit: median {np.median(times):.3f}s  "
        f"min {min(times):.3f}  max {max(times):.3f}  iters {sorted(iters)}")
    # sanity: same final ELBO as the two-dispatch host path would get
    log(f"final ELBO {float(np.atleast_1d(m2.history['ELBO'][-1])[0]):.2f} "
        f"h2={m2.get_heritability():.4f}")

    if '--no-mix' in sys.argv:
        return

    # ---- mixture grid 20 x K=3: plain batch vs activity-gated skip ----
    from viprs_tpu.model import VIPRSMixGrid
    from viprs_tpu.gridsearch import HyperparameterGrid
    for impl in ('pallas', 'skip'):
        np.random.seed(0)
        grid = HyperparameterGrid(pi_steps=20, n_snps=ds.m,
                                  h2_est=0.25, h2_se=0.05)
        g = VIPRSMixGrid(ds, grid, K=3)
        t0 = time.time()
        g.fit(max_iter=500, sweep_impl=impl)
        cold = time.time() - t0
        conv = int(np.sum([r.success for r in g.optim_results]))
        log(f"mix-grid(20xK=3) sweep_impl={impl} cold: {cold:.2f}s "
            f"converged={conv}/20")
        np.random.seed(0)
        g2 = VIPRSMixGrid(ds, grid, K=3)
        t0 = time.time()
        g2.fit(max_iter=500, sweep_impl=impl)
        steady = time.time() - t0
        conv = int(np.sum([r.success for r in g2.optim_results]))
        elbos = np.asarray(g2.validation_result['ELBO'], dtype=np.float64)
        log(f"mix-grid(20xK=3) sweep_impl={impl} steady: {steady:.2f}s "
            f"converged={conv}/20 elbo[0]={elbos[0]:.2f} "
            f"elbo[-1]={elbos[-1]:.2f}")


if __name__ == '__main__':
    main()
