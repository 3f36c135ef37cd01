#!/usr/bin/env python3
"""E-step sweep microbenchmark harness.

The analog of the reference's benchmarks/benchmark_e_step.py (which sweeps
implementation x linalg x threads x precision x dequantization,
SURVEY.md §6): here the dimensions are

    impl        in {xla, pallas}
    S           grid width (models fit simultaneously)
    quantize    int8 vs float32 LD storage
    tile        CAVI tile width
    inner_steps tile-local refinement passes

Reports per-configuration sweep time, iterations/s, and effective HBM
bandwidth (LD bytes touched per sweep / time).

Usage: python benchmarks/benchmark_sweep.py [m_variants] [--quick]
"""

import itertools
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])


def main():
    import viprs_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp
    from viprs_tpu.ops.block_ld import pack_dense_blocks
    from viprs_tpu.ops.cavi_jax import CaviState, Hyper, cavi_sweep
    from viprs_tpu.ops.cavi_pallas import cavi_sweep_pallas

    m_target = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
        else 200_000
    quick = '--quick' in sys.argv

    # synthetic LDetect-like blocks:
    rng = np.random.default_rng(0)
    sizes = []
    while sum(sizes) < m_target:
        sizes.append(int(np.clip(rng.lognormal(np.log(600), 0.5), 80, 3000)))
    blocks = []
    for m_b in sizes:
        rho = rng.uniform(0.2, 0.9)
        idx = np.arange(m_b)
        blocks.append(rho ** np.abs(idx[:, None] - idx[None, :]))
    m = sum(sizes)
    sb_np = rng.standard_normal(m) * 0.005
    n_np = np.full(m, 3e5)

    print(f"devices: {jax.devices()}", file=sys.stderr)
    print(f"M={m} in {len(sizes)} blocks", file=sys.stderr)

    def logit(p):
        return float(np.log(p) - np.log1p(-p))

    impls = {'xla': cavi_sweep,
             'xla_s1r': lambda ld, st, sb, nf, hy, act, **kw:
                 cavi_sweep(ld, st, sb, nf, hy, act, s1_reduce=True, **kw),
             'pallas': lambda ld, st, sb, nf, hy, act, **kw:
                 cavi_sweep_pallas(ld, st, sb, nf, hy, act, **kw)}
    # pallasN: the chunked S=1 kernel with an explicit block-chunk size.
    for _g in (4, 8, 16, 24, 32, 48):
        impls[f'pallas{_g}'] = (
            lambda ld, st, sb, nf, hy, act, _g=_g, **kw:
                cavi_sweep_pallas(ld, st, sb, nf, hy, act, chunk=_g, **kw))

    # skipF: the gather-DMA compacted kernel at a fixed active fraction F%
    # (S=1 only). skip100 == all blocks active (overhead vs the others);
    # skip7 ~= the measured mean activity of a genome-wide EM fit.
    def _make_skip(frac):
        def f(ld, st, sb, nf, hy, act, **kw):
            import jax.numpy as _jnp
            import numpy as _np
            from viprs_tpu.ops.cavi_pallas import cavi_sweep_pallas_s1_skip
            kw.pop('tile', None)
            nb = ld.nb
            k = max(1, int(round(nb * frac / 100)))
            mask = _np.zeros(nb, bool)
            mask[_np.random.default_rng(1).choice(nb, size=k, replace=False)] = True
            return cavi_sweep_pallas_s1_skip(ld, st, sb, nf, hy, act,
                                             _jnp.asarray(mask), **kw)
        return f
    for _f in (100, 25, 7, 2):
        impls[f'skip{_f}'] = _make_skip(_f)

    def _flag(name, default, cast):
        if f'--{name}' in sys.argv:
            vals = sys.argv[sys.argv.index(f'--{name}') + 1]
            return [cast(v) for v in vals.split(',')]
        return default

    configs = itertools.product(
        _flag('impls', ['xla', 'pallas'], str),
        _flag('S', [1, 8] if quick else [1, 8, 32], int),
        _flag('quantize', [True] if quick else [True, False],
              lambda v: v in ('1', 'true', 'True')),
        _flag('tile', [128], int),
        _flag('inner', [4, 8], int),
    )

    rows = []
    packed = {}
    for impl, S, quantize, tile, inner in configs:
        if quantize not in packed:
            packed[quantize] = pack_dense_blocks({1: blocks}, block_size=1024,
                                                 quantize=quantize)
        ld, lay = packed[quantize]
        nb, B = lay.nb, lay.block_size
        sb = jnp.asarray(lay.to_flat({1: sb_np}).reshape(nb, B), jnp.float32)
        nf = jnp.asarray(lay.to_flat({1: n_np}).reshape(nb, B), jnp.float32)
        state = CaviState(
            logits=jnp.full((S, nb, B), np.float32(logit(0.01)), jnp.float32),
            mu=jnp.zeros((S, nb, B), jnp.float32),
            eta=jnp.zeros((S, nb, B), jnp.float32),
            q=jnp.zeros((S, nb, B), jnp.float32))
        hyper = Hyper(sigma_eps=jnp.full(S, 0.75, jnp.float32),
                      tau_beta=jnp.full(S, 0.01 * m / 0.25, jnp.float32),
                      pi=jnp.full(S, 0.01, jnp.float32),
                      lambda_min=jnp.zeros(S, jnp.float32))
        fn = impls[impl]
        act = jnp.ones(S)

        n_rep = 100

        # Time a fused chain of sweeps (one dispatch) — how the EM while_loop
        # actually runs them. A chain call costs ~27 ms of FIXED
        # dispatch+transfer latency on the axon tunnel regardless of length
        # (measured with an empty body), so the rep count is a dynamic
        # argument (one compile) and the fixed cost is subtracted.
        from functools import partial as _partial

        DISPATCH_S = 0.027

        # NB: ld/sb/nf/hyper/act must be ARGUMENTS — closing over them embeds
        # the GB-scale LD tiles as HLO constants (and blows the remote-compile
        # request limit on the axon transport).
        @_partial(jax.jit, static_argnames=('impl_', 'tile_', 'inner_'))
        def chain(state, ld_, sb_, nf_, hyper_, act_, n_, impl_, tile_, inner_):
            def body(_, st):
                return impls[impl_](ld_, st, sb_, nf_, hyper_, act_,
                                    tile=tile_, inner_steps=inner_)[0]
            return jax.lax.fori_loop(0, n_, body, state)

        def chain_call(st, n_):
            return chain(st, ld, sb, nf, hyper, act, jnp.asarray(n_),
                         impl_=impl, tile_=tile, inner_=inner)

        try:
            warm = chain_call(state, 3)
            # axon runtime: block_until_ready does not actually block; force a
            # device->host read of a device-side slice to drain the pipeline
            # (fetching the full eta would add MBs of tunnel traffic to the
            # timed region). The timed call takes the warmup OUTPUT as input
            # so the runtime's execution memoization cannot return a cached
            # result.
            float(np.asarray(warm.eta[:1, :1, :1]).ravel()[0])
            t0 = time.time()
            out = chain_call(warm, n_rep)
            float(np.asarray(out.eta[:1, :1, :1]).ravel()[0])
            dt = max(time.time() - t0 - DISPATCH_S, 1e-9) / n_rep
        except Exception as e:
            print(f"{impl} S={S} quant={quantize} tile={tile} inner={inner}: "
                  f"FAILED ({type(e).__name__}: {e})", file=sys.stderr)
            continue

        # Roofline accounting (v5e: 819 GB/s HBM, ~197 TFLOP/s bf16 MXU).
        # Bytes: every LD tile element is read once per sweep; state traffic is
        # S*NB*B*4 per array and negligible at genome scale.
        ld_bytes = ld.diag.size * ld.diag.dtype.itemsize \
            + ld.off_data.size * ld.off_data.dtype.itemsize
        state_bytes = 4 * 4 * S * ld.diag.shape[0] * B  # 4 arrays, rd+wr ~ 2x
        # FLOPs: rank-T q-update touches each tile element once (2 flops/MAC)
        # per model lane; inner iterations add 2*S*inner*NB*B*tile on R_tt
        # (plus the same again for the relaxation coupling row-sums).
        flops = 2.0 * S * (ld.diag.size + 2 * ld.off_data.size) \
            + 4.0 * S * inner * ld.diag.shape[0] * B * tile
        bw = ld_bytes / dt / 1e9
        bw_total = (ld_bytes + 2 * state_bytes) / dt / 1e9
        sol = bw / 819.0
        mfu = flops / dt / 197e12
        rows.append(dict(impl=impl, S=S, quantize=quantize, tile=tile,
                         inner=inner, ms_per_sweep=dt * 1e3,
                         sweeps_per_s=1.0 / dt, ld_gb_s=bw,
                         pct_hbm_sol=100 * sol, pct_mfu=100 * mfu))
        print(f"{impl:7s} S={S:3d} int8={quantize} tile={tile} inner={inner}: "
              f"{dt*1e3:8.2f} ms/sweep  {1/dt:7.1f} sweep/s  "
              f"LD-bw {bw:6.1f} GB/s ({100*sol:4.1f}% HBM SOL, "
              f"{100*mfu:4.2f}% MFU, {bw_total:6.1f} GB/s incl. state)",
              flush=True)

    return rows


if __name__ == '__main__':
    main()
