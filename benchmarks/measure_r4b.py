#!/usr/bin/env python3
"""Round-4b TPU measurements: mixture-grid inner_steps A/B, S=1 check.

Usage: python benchmarks/measure_r4b.py [m_variants]
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
    import jax.numpy as jnp
    from viprs_tpu.model import VIPRS, VIPRSMixGrid
    from viprs_tpu.gridsearch import HyperparameterGrid

    # health probe first — bail fast if the tunnel is wedged:
    t0 = time.time()
    y = float(np.asarray((jnp.ones((256, 256)) @ jnp.ones((256, 256))).sum()))
    log(f"device probe: {y} in {time.time() - t0:.1f}s  {jax.devices()}")

    m_target = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
        else 1_100_000
    ds = build_dataset(m_target)
    log(f"M={ds.m} NB={ds.layout.nb}")
    fit_kwargs = dict(max_iter=1000, f_abs_tol=1e-6, x_abs_tol=1e-6,
                      patience=10)

    # S=1 sanity (cache should be warm from measure_r4):
    np.random.seed(0)
    t0 = time.time()
    m = VIPRS(ds)
    m.fit(**fit_kwargs)
    log(f"S=1 fit 1 (maybe compile): {time.time() - t0:.2f}s "
        f"iters={m.optim_result.nit}")
    np.random.seed(0)
    t0 = time.time()
    m = VIPRS(ds)
    m.fit(**fit_kwargs)
    log(f"S=1 fresh fit steady: {time.time() - t0:.3f}s "
        f"iters={m.optim_result.nit}")

    # S=1 (tile, inner_steps) A/B (per-iter cost vs iteration count; CPU
    # check at 12k: tile 256 keeps the iteration count, inner=4 doubles it):
    for tile, inner in ((128, 4), (256, 8), (512, 8)):
        np.random.seed(0)
        m2 = VIPRS(ds, tile=tile)
        t0 = time.time()
        m2.fit(inner_steps=inner, **fit_kwargs)
        cold = time.time() - t0
        np.random.seed(0)
        m2 = VIPRS(ds, tile=tile)
        t0 = time.time()
        m2.fit(inner_steps=inner, **fit_kwargs)
        log(f"S=1 tile={tile} inner={inner}: {time.time() - t0:.3f}s "
            f"(first {cold:.2f}s) iters={m2.optim_result.nit} "
            f"h2={m2.get_heritability():.4f}")

    # mixture grid 20 x K=3 inner_steps A/B:
    for inner in (8, 4, 2):
        np.random.seed(0)
        grid = HyperparameterGrid(pi_steps=20, n_snps=ds.m,
                                  h2_est=0.25, h2_se=0.05)
        g = VIPRSMixGrid(ds, grid, K=3)
        t0 = time.time()
        g.fit(max_iter=500, inner_steps=inner)
        cold = time.time() - t0
        np.random.seed(0)
        g2 = VIPRSMixGrid(ds, grid, K=3)
        t0 = time.time()
        g2.fit(max_iter=500, inner_steps=inner)
        steady = time.time() - t0
        conv = int(np.sum([r.success for r in g2.optim_results]))
        nits = sorted(r.nit for r in g2.optim_results)
        log(f"mix-grid(20xK=3) inner={inner}: steady {steady:.2f}s "
            f"(first {cold:.2f}s) converged={conv}/20 nit={nits}")


if __name__ == '__main__':
    main()
