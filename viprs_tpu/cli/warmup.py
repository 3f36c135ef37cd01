"""viprs_warmup — precompile the fused EM programs for an LD store.

Cold-start accounting (BENCH.md round 4): the fused EM loop is a small
program (~1.6k StableHLO lines, <1 s to compile on a local CPU backend), but
on shared remote-compile TPU transports a cold compile can queue for minutes
with high variance. The compiled executable is keyed by the LD store's
packed SHAPES (number of blocks x block size) and the fit's static
parameters — so it can be built AHEAD of time, from store metadata alone
(no LD data is read), into the persistent compile cache
(~/.cache/viprs_tpu_jax). After a warmup, every fresh process fitting that
panel starts at steady-state speed.

Usage:
    viprs_warmup -l LD_STORE_PATH [--block-size 1024] [--max-iter 1000]
                 [--grid-widths 100 [S2 ...]] [--mixture-k K]
"""

import argparse
import logging
import sys
import time

import numpy as np

logger = logging.getLogger('viprs_warmup')


def build_parser():
    p = argparse.ArgumentParser(
        'viprs_warmup', description=__doc__.split('\n\n')[0])
    p.add_argument('-l', '--ld-panel', dest='ld_dir', required=True,
                   help='Path to the LD store (native or magenpy Zarr).')
    p.add_argument('--block-size', dest='block_size', type=int, default=1024)
    p.add_argument('--max-iter', dest='max_iter', type=int, default=1000,
                   help='Must match the --max-iter of the later fits '
                        '(it is a static shape of the compiled loop).')
    p.add_argument('--grid-widths', dest='grid_widths', type=int, nargs='*',
                   default=[], help='Also precompile grid fits at these '
                                    'model counts (e.g. 100).')
    p.add_argument('--float-precision', dest='float_precision',
                   default='float32')
    return p


def _shape_dataset(ld_dir, block_size):
    """A dataset with the store's exact packed shapes and ZERO data —
    np.zeros blocks cost no physical memory until written, and the packer
    only needs shapes. No LD data is decompressed."""
    from ..data import ld_store
    from ..data.dataset import SummaryStatsDataset

    sizes = ld_store.native_store_block_sizes(ld_dir)
    ld_blocks, std_beta, n_per_snp = {}, {}, {}
    for c, per_block in sizes.items():
        bl = [np.zeros((m_b, m_b)) for m_b in per_block]
        m_c = sum(b.shape[0] for b in bl)
        ld_blocks[c] = bl
        std_beta[c] = np.zeros(m_c)
        n_per_snp[c] = np.full(m_c, 1000.0)
    return SummaryStatsDataset.from_dense_blocks(
        ld_blocks, std_beta, n_per_snp, block_size=block_size, quantize=True)


def warm(ds, S, max_iter, mixture_k=None):
    """Compile (into the persistent cache) the fused fit program for S lanes
    on this dataset's shapes, without running it."""
    import jax.numpy as jnp
    from ..ops import em_loop
    from ..ops.cavi_jax import CaviState, Hyper
    from ..ops.updates import FixMask
    from ..model._dispatch import select_sweep_impl

    lay = ds.layout
    NB, B = lay.nb, lay.block_size
    zeros = jnp.zeros((S, NB, B), jnp.float32)
    state = CaviState(logits=zeros, mu=zeros, eta=zeros, q=zeros)
    hyper = Hyper(sigma_eps=jnp.full(S, 0.9, jnp.float32),
                  tau_beta=jnp.full(S, 1000.0, jnp.float32),
                  pi=jnp.full(S, 0.01, jnp.float32),
                  lambda_min=jnp.zeros(S, jnp.float32))
    fix = FixMask(sigma_eps=np.zeros(S, bool), tau_beta=np.zeros(S, bool),
                  pi=np.zeros(S, bool))
    use_pallas, use_skip = select_sweep_impl(S, None, None)
    kw = dict(n_sample=1000.0, m_total=float(ds.m), init_elbo=None,
              active0=np.ones(S, bool), max_iter=max_iter, min_iter=3,
              f_abs_tol=1e-6, x_abs_tol=1e-6, patience=10, tile=128,
              use_pallas=use_pallas, use_skip=use_skip, i0=0,
              counters0=em_loop.init_counters(S),
              sigma_g0=jnp.zeros(S, jnp.float64))
    if S == 1:
        # the single-dispatch path compiles with the in-graph restart:
        kw.update(max_restarts=1,
                  restart_hyper=Hyper(
                      sigma_eps=jnp.full(S, 0.95, jnp.float64),
                      tau_beta=jnp.full(S, 1000.0, jnp.float64),
                      pi=jnp.full(S, 0.01, jnp.float64),
                      lambda_min=jnp.zeros(S, jnp.float64)),
                  restart_logits=jnp.full(S, -4.0, jnp.float32))
    t0 = time.time()
    lowered = em_loop.em_fit.lower(
        ds.ld, state, ds.std_beta_flat(), ds.n_per_snp_flat(), hyper, fix,
        **kw)
    compiled = lowered.compile()
    logger.info("compiled S=%d em_fit (%s sweep) in %.1fs", S,
                'pallas' if use_pallas else 'xla', time.time() - t0)
    return compiled


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format='%(message)s')
    args = build_parser().parse_args(argv)
    import viprs_tpu  # noqa: F401  (enables x64 + the persistent cache)
    import jax
    logger.info("> backend: %s  devices: %s", jax.default_backend(),
                jax.devices())
    t0 = time.time()
    ds = _shape_dataset(args.ld_dir, args.block_size)
    logger.info("> store shapes: M=%d NB=%d B=%d (%.1fs, metadata only)",
                ds.m, ds.layout.nb, ds.layout.block_size, time.time() - t0)
    warm(ds, 1, args.max_iter)
    for S in args.grid_widths:
        warm(ds, int(S), args.max_iter)
        # compacted re-runs use power-of-2 widths down from S:
        w = 1 << max(0, int(np.ceil(np.log2(max(S, 1)))) - 2)
        while w >= 8:
            warm(ds, w, args.max_iter)
            w //= 4
    logger.info("> done in %.1fs — compiled programs are in the persistent "
                "cache; fits on this panel now start at steady-state speed.",
                time.time() - t0)
    return 0


if __name__ == '__main__':
    sys.exit(main())
