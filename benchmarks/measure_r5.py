#!/usr/bin/env python3
"""Round-5 A/B: hybrid activity-gated dispatch vs the round-4 XLA tile loop.

The measured question (VERDICT r4 next #1): the production S=1 genome-wide
fit ran the all-active XLA tile loop for all ~112 iterations, while the
steady-state block activity collapses after the early phase (DESIGN.md 2b) —
the hybrid dispatch (ops/em_loop.py use_hybrid) switches to the
block-skipping Pallas sweep in-graph once the per-iteration proposal-mask
population count falls below HYBRID_FRAC * NB. This harness measures, on the
identical 1.1M problem of bench.py:

  - sweep_impl='xla'    (the round-4 headline configuration)
  - sweep_impl=None     (the measured policy: hybrid at S=1 on TPU)
  - the activity-vs-iteration trace of the hybrid fit (model._act_trace)

Usage: python benchmarks/measure_r5.py [--m M] [--reps N] [--impls xla,hybrid]
Emits one JSON line per configuration on stdout; narrative to stderr.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--m', type=int, default=1_100_000)
    ap.add_argument('--reps', type=int, default=3)
    ap.add_argument('--impls', default='xla,hybrid',
                    help='comma list of sweep_impl values to A/B '
                         '(hybrid = None = measured policy)')
    args = ap.parse_args()

    import viprs_tpu  # noqa: F401
    import jax
    import bench
    from viprs_tpu.data.dataset import SummaryStatsDataset
    from viprs_tpu.model import VIPRS

    log(f"devices: {jax.devices()}")
    t0 = time.time()
    ld_blocks, std_beta, n_per_snp = bench.synthesize_genome(m_target=args.m)
    log(f"synthesis: {time.time() - t0:.1f}s")
    t0 = time.time()
    ds = SummaryStatsDataset.from_dense_blocks(
        ld_blocks, std_beta, n_per_snp, block_size=1024, quantize=True)
    del ld_blocks
    log(f"packing: {time.time() - t0:.1f}s; NB={ds.layout.nb} M={ds.m}")

    fit_kwargs = dict(max_iter=1000, f_abs_tol=1e-6, x_abs_tol=1e-6,
                      patience=10)

    results = {}
    for impl in args.impls.split(','):
        # 'hybrid:<eps>' measures an explicit gate epsilon (default:
        # x_abs_tol — see em_loop.em_fit hybrid_eps):
        extra = {}
        if impl.startswith('hybrid:'):
            extra['hybrid_eps'] = float(impl.split(':', 1)[1])
            sweep_impl = None
            impl = impl.replace(':', '_eps')
        else:
            sweep_impl = None if impl == 'hybrid' else impl
        run_kwargs = dict(fit_kwargs, **extra)
        np.random.seed(0)
        t0 = time.time()
        model = VIPRS(ds)
        model.fit(sweep_impl=sweep_impl, **run_kwargs)
        cold = time.time() - t0
        log(f"[{impl}] cold (incl. compile): {cold:.2f}s; "
            f"iters={model.optim_result.nit}; "
            f"success={model.optim_result.success}; "
            f"h2={model.get_heritability():.4f}")

        times, iters = [], []
        h2 = None
        act_trace = None
        for rep in range(args.reps):
            np.random.seed(0)
            t0 = time.time()
            m2 = VIPRS(ds)
            m2.fit(sweep_impl=sweep_impl, **run_kwargs)
            times.append(time.time() - t0)
            iters.append(int(m2.optim_result.nit))
            h2 = float(m2.get_heritability())
            act_trace = list(m2._act_trace)
            log(f"[{impl}] rep {rep + 1}/{args.reps}: {times[-1]:.3f}s "
                f"over {iters[-1]} iters; h2={h2:.4f}")
            assert m2.optim_result.valid_optim_result, m2.optim_result.message
        med = float(np.median(times))
        nb = ds.layout.nb
        rec = {
            "metric": f"genomewide_em_fit_seconds_{impl}",
            "value": round(med, 3), "unit": "s",
            "vs_baseline": round(bench.BASELINE_SECONDS / med, 1),
            "min": round(min(times), 3), "max": round(max(times), 3),
            "iters": sorted(iters), "h2": round(h2, 4),
            "m_variants": int(ds.m), "nb": int(nb),
        }
        if act_trace:
            at = np.asarray(act_trace, dtype=np.int64)
            rec["activity"] = {
                "mean_frac": round(float(at.mean()) / nb, 4),
                "median_frac": round(float(np.median(at)) / nb, 4),
                "first10": [int(x) for x in at[:10]],
                "n_skip_iters": int(np.sum(
                    at <= int(nb * __import__(
                        'viprs_tpu.model._dispatch',
                        fromlist=['HYBRID_FRAC']).HYBRID_FRAC))),
                "trace_decimated": [int(x) for x in at[::5]],
            }
        results[impl] = rec
        print(json.dumps(rec), flush=True)

    if 'xla' in results and 'hybrid' in results:
        sp = results['xla']['value'] / results['hybrid']['value']
        log(f"hybrid speedup over xla: {sp:.2f}x")


if __name__ == '__main__':
    main()
