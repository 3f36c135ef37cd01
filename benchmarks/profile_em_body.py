#!/usr/bin/env python3
"""Decompose the fused EM while_loop's per-iteration cost at genome scale.

BENCH.md round-2 accounting left a gap: the S=1 sweep measures 6.44 ms
(inner=8, fused chain) and the reduction suite 0.44 ms/iter, but the fit-level
per-iteration cost lands at ~13-14 ms. This harness times, IN ONE PROCESS on
identical inputs (the shared tunnel is too noisy for cross-process A/B):

  sweep   : fori_loop chain of bare cavi_sweep calls
  body    : sweep + var_tau + collect_stats + m_step + ELBO + MSE + max|d_eta|
            (the em_loop body minus the ladder, hist, and counters), hyper fed
            back between iterations
  ladder  : the full em_loop body incl. status/patience/damping bookkeeping and
            the elbo_hist dynamic_update_slice, in a fori_loop
  em_fit  : the production ops/em_loop.py while_loop, convergence disabled so
            it runs exactly n iterations

Each is timed at two chain lengths so the marginal per-iteration cost separates
from fixed dispatch/transfer latency. Usage:

  python benchmarks/profile_em_body.py [m_variants] [--iters 100]
"""

import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CACHE = Path('/tmp/viprs_prof_cache')


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_problem(m_target):
    """Pack (and disk-cache) the bench.py genome-scale problem."""
    tag = CACHE / f'm{m_target}'
    if (tag / 'diag.npy').exists():
        log(f"loading cached problem from {tag}")
        diag = np.load(tag / 'diag.npy')
        off = np.load(tag / 'off.npz')
        meta = np.load(tag / 'meta.npz')
        return (diag, off['data'], off['src'], off['dst'],
                meta['sb'], meta['nf'], meta['mask'], int(meta['m']))

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'bench', Path(__file__).resolve().parent.parent / 'bench.py')
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    from viprs_tpu.ops.block_ld import pack_dense_blocks

    t0 = time.time()
    ld_blocks, std_beta, n_per_snp = bench.synthesize_genome(m_target=m_target)
    log(f"synthesis: {time.time() - t0:.1f}s")
    t0 = time.time()
    ld, lay = pack_dense_blocks(ld_blocks, block_size=1024, quantize=True)
    log(f"packing: {time.time() - t0:.1f}s NB={lay.nb} n_off={ld.n_off}")

    diag = np.asarray(ld.diag)
    sb = lay.to_flat(std_beta).reshape(lay.nb, lay.block_size).astype(np.float32)
    nf = lay.to_flat(n_per_snp).reshape(lay.nb, lay.block_size).astype(np.float32)
    mask = np.asarray(ld.mask)
    tag.mkdir(parents=True, exist_ok=True)
    np.save(tag / 'diag.npy', diag)
    np.savez(tag / 'off.npz', data=np.asarray(ld.off_data),
             src=np.asarray(ld.off_src), dst=np.asarray(ld.off_dst))
    np.savez(tag / 'meta.npz', sb=sb, nf=nf, mask=mask, m=lay.m)
    return (diag, np.asarray(ld.off_data), np.asarray(ld.off_src),
            np.asarray(ld.off_dst), sb, nf, mask, lay.m)


def main():
    import viprs_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp
    from viprs_tpu.ops.block_ld import BlockLD
    from viprs_tpu.ops.cavi_jax import CaviState, Hyper, cavi_sweep
    from viprs_tpu.ops import updates, em_loop
    from viprs_tpu.ops.updates import FixMask

    m_target = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
        else 1_100_000
    n_iters = int(sys.argv[sys.argv.index('--iters') + 1]) \
        if '--iters' in sys.argv else 100

    (diag_np, off_np, src_np, dst_np, sb_np, nf_np, mask_np, m) = \
        build_problem(m_target)
    nb, B = sb_np.shape
    log(f"devices: {jax.devices()}  M={m} NB={nb} B={B} n_off={len(src_np)} "
        f"LD={(diag_np.nbytes + off_np.nbytes) / 1e9:.2f} GB int8")

    ld = BlockLD(diag=jnp.asarray(diag_np),
                 off_data=jnp.asarray(off_np),
                 off_src=jnp.asarray(src_np),
                 off_dst=jnp.asarray(dst_np),
                 mask=jnp.asarray(mask_np), scale=1.0 / 127.0)
    sb = jnp.asarray(sb_np)
    nf = jnp.asarray(nf_np)
    S = 1

    def logit(p):
        return float(np.log(p) - np.log1p(-p))

    state0 = CaviState(
        logits=jnp.full((S, nb, B), np.float32(logit(0.01))),
        mu=jnp.zeros((S, nb, B), jnp.float32),
        eta=jnp.zeros((S, nb, B), jnp.float32),
        q=jnp.zeros((S, nb, B), jnp.float32))
    # sigma_eps pinned at 0.95: the post-restart regime of the real fit (the
    # negative-MSE restart fires at iteration ~8 on this problem — BENCH.md —
    # which would otherwise end the timed em_fit run early).
    hyper0 = Hyper(sigma_eps=jnp.full(S, 0.95, jnp.float32),
                   tau_beta=jnp.full(S, 0.01 * m / 0.25, jnp.float32),
                   pi=jnp.full(S, 0.01, jnp.float32),
                   lambda_min=jnp.zeros(S, jnp.float32))
    fix = FixMask(sigma_eps=jnp.ones(S, bool), tau_beta=jnp.zeros(S, bool),
                  pi=jnp.zeros(S, bool))
    active = jnp.ones(S, jnp.float32)
    n_sample, m_total = 350_000.0, float(m)

    # ---------------- candidate chains ----------------
    # NB: ld/sb/nf/hyper must be ARGUMENTS — closing over them embeds the
    # GB-scale LD tiles as HLO constants and blows the remote-compile request
    # limit on the axon transport (HTTP 413).
    @jax.jit
    def _chain_sweep(state, ld_, sb_, nf_, hy_, n_):
        def body(_, st):
            return cavi_sweep(ld_, st, sb_, nf_, hy_, active)[0]
        return jax.lax.fori_loop(0, n_, body, state)

    def chain_sweep(state, n_):
        return _chain_sweep(state, ld, sb, nf, hyper0, jnp.asarray(n_))

    @jax.jit
    def _chain_body(state, ld_, sb_, nf_, hy_, n_):
        """Sweep + reductions + M-step + objectives, hyper fed back."""
        def body(_, carry):
            st, hyp, sigma_g, prev_elbo = carry
            h32 = Hyper(*(x.astype(jnp.float32) for x in hyp))
            st2, eta_diff = cavi_sweep(ld_, st, sb_, nf_, h32, active)
            var_tau = updates.compute_var_tau(nf_, h32)
            stats = updates.collect_stats(st2, var_tau, sb_, ld_.mask)
            hyp2, sg = updates.m_step(stats, hyp, fix, m_total,
                                      jnp.ones(S, bool))
            e = updates.elbo(stats, hyp2, fix.sigma_eps, sg, n_sample, m_total)
            mse_ = updates.mse(stats, sg)
            med = jnp.max(jnp.abs(eta_diff) * ld_.mask[None], axis=(1, 2))
            # keep everything live without branching:
            e = e + 0.0 * (mse_ + med.astype(jnp.float64))
            return st2, hyp2, sg, e
        hyp64 = Hyper(*(x.astype(jnp.float64) for x in hy_))
        init = (state, hyp64, jnp.zeros(S, jnp.float64),
                jnp.zeros(S, jnp.float64))
        return jax.lax.fori_loop(0, n_, body, init)

    def chain_body(state, n_):
        return _chain_body(state, ld, sb, nf, hyper0, jnp.asarray(n_))

    def run_emfit(state, n_):
        return em_loop.em_fit(
            ld, state, sb, nf, hyper0, fix,
            n_sample=n_sample, m_total=m_total,
            init_elbo=jnp.zeros(S, jnp.float64),
            active0=jnp.ones(S, bool),
            max_iter=int(n_), min_iter=int(n_) + 1,   # ladder can't fire
            f_abs_tol=0.0, x_abs_tol=0.0, patience=10 ** 6)

    # ---------------- timing ----------------
    def drain(x):
        return float(np.asarray(x).ravel()[0])

    def time_chain(name, call, pulls, out_state):
        """Times call(state, n) at two lengths; reports marginal ms/iter.
        The timed call takes the warm call's OUTPUT state as input so the
        runtime's execution memoization cannot return a cached result."""
        rows = {}
        for n_ in (n_iters, 2 * n_iters):
            out = call(state0, n_)   # compile + warm at this length
            drain(pulls(out))
            t0 = time.time()
            out = call(out_state(out), n_)
            drain(pulls(out))
            rows[n_] = time.time() - t0
        marginal = (rows[2 * n_iters] - rows[n_iters]) / n_iters * 1e3
        fixed = rows[n_iters] - marginal * n_iters / 1e3
        log(f"{name:8s}: {rows[n_iters]:.3f}s @{n_iters}  "
            f"{rows[2 * n_iters]:.3f}s @{2 * n_iters}  ->  "
            f"{marginal:7.2f} ms/iter marginal, {fixed:+.3f}s fixed")
        return marginal

    t_sweep = time_chain('sweep', chain_sweep, lambda o: o.eta[:1, :1, :1],
                         lambda o: o)
    t_body = time_chain('body', chain_body, lambda o: o[3], lambda o: o[0])

    def emfit_call(state, n_):
        return run_emfit(state, n_)
    t_emfit = time_chain('em_fit', emfit_call, lambda r: r.final_elbo,
                         lambda r: r.state)

    log("")
    log(f"sweep-only          : {t_sweep:7.2f} ms/iter")
    log(f"+reductions/M-step  : {t_body:7.2f} ms/iter  "
        f"(+{t_body - t_sweep:.2f})")
    log(f"+ladder (em_fit)    : {t_emfit:7.2f} ms/iter  "
        f"(+{t_emfit - t_body:.2f})")


if __name__ == '__main__':
    main()
