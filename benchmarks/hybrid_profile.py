#!/usr/bin/env python3
"""Localize the hybrid dispatch's per-iteration overhead (round 5).

Fit-level numbers (measure_r5.py) show the hybrid fit averaging MORE per
iteration than the pure XLA loop despite 60+ skipped iterations — so either
the mask+cond wrapper taxes the XLA branch, or the skip branch is not as
cheap as the roofline suggested. This harness times fused chains of:

  A  plain cavi_sweep                         (baseline, no mask)
  B  mask + cond, threshold -1                (always XLA branch)
  C  mask + cond, threshold NB+1, all active  (always skip, all-active cost)
  D  cond threshold NB+1, mask forced ~3%     (always skip, collapsed cost)

Usage: python benchmarks/hybrid_profile.py [m_variants]
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import viprs_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp
    from jax import lax
    from viprs_tpu.ops.block_ld import pack_dense_blocks
    from viprs_tpu.ops.cavi_jax import CaviState, Hyper, cavi_sweep
    from viprs_tpu.ops.cavi_pallas import (cavi_sweep_pallas_s1_skip,
                                           block_proposal_mask)

    m_target = int(sys.argv[1]) if len(sys.argv) > 1 else 1_100_000
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
    ld, lay = pack_dense_blocks({1: blocks}, block_size=1024, quantize=True)
    nb, B = lay.nb, lay.block_size
    log(f"devices: {jax.devices()}; M={m} NB={nb} n_off={ld.n_off}")

    sb = jnp.asarray(lay.to_flat(
        {1: rng.standard_normal(m) * 0.005}).reshape(nb, B), jnp.float32)
    nf = jnp.asarray(lay.to_flat({1: np.full(m, 3e5)}).reshape(nb, B),
                     jnp.float32)

    def logit(p):
        return float(np.log(p) - np.log1p(-p))

    S = 1
    state0 = CaviState(
        logits=jnp.full((S, nb, B), np.float32(logit(0.01))),
        mu=jnp.zeros((S, nb, B), jnp.float32),
        eta=jnp.zeros((S, nb, B), jnp.float32),
        q=jnp.zeros((S, nb, B), jnp.float32))
    hyper = Hyper(sigma_eps=jnp.full(S, 0.75, jnp.float32),
                  tau_beta=jnp.full(S, 0.01 * m / 0.25, jnp.float32),
                  pi=jnp.full(S, 0.01, jnp.float32),
                  lambda_min=jnp.zeros(S, jnp.float32))
    act = jnp.ones(S)

    few_mask_np = np.zeros(nb, bool)
    few_mask_np[rng.choice(nb, size=max(1, nb * 3 // 100), replace=False)] \
        = True
    few_mask = jnp.asarray(few_mask_np)

    DISPATCH_S = 0.027
    N_REP = 50

    # NB: ld/sb/nf/hyper/act/mask must be chain ARGUMENTS — closing over
    # them embeds the GB-scale LD as HLO constants and blows the remote
    # compile request limit (HTTP 413) on the axon transport.
    @partial(jax.jit, static_argnames=('mode', 'thresh'))
    def chain(st, ld_, sb_, nf_, hyper_, act_, fmask_, n_, mode, thresh):
        def body(st):
            if mode == 'plain':
                return cavi_sweep(ld_, st, sb_, nf_, hyper_, act_, tile=128,
                                  inner_steps=8)[0]
            if mode == 'forced_few':
                blk = fmask_
            else:
                blk = block_proposal_mask(ld_, st, sb_, nf_, hyper_,
                                          eps=1e-6)[0] & (act_[0] > 0)
            n_act = jnp.sum(blk)

            def _skip(ops):
                s, a, b = ops
                return cavi_sweep_pallas_s1_skip(
                    ld_, s, sb_, nf_, hyper_, a, b, tile=128, inner_steps=8)

            def _xla(ops):
                s, a, _ = ops
                return cavi_sweep(ld_, s, sb_, nf_, hyper_, a, tile=128,
                                  inner_steps=8)

            st2, _ = lax.cond(n_act <= thresh, _skip, _xla, (st, act_, blk))
            return st2
        return lax.fori_loop(0, n_, lambda _, s: body(s), st)

    # E: the skip branch consumes its OWN device copy of the diag tiles —
    # if D's overhead is a per-iteration layout-change copy (the XLA branch
    # prefers (1,2,0), Pallas requires row-major), giving each branch its
    # own buffer removes it at the cost of 2x LD residency.
    from viprs_tpu.ops.block_ld import BlockLD

    @partial(jax.jit, static_argnames=('thresh',))
    def chain2(st, ld_, ld_skip_, sb_, nf_, hyper_, act_, fmask_, n_, thresh):
        def body(st):
            blk = fmask_
            n_act = jnp.sum(blk)

            def _skip(ops):
                s, a, b = ops
                return cavi_sweep_pallas_s1_skip(
                    ld_skip_, s, sb_, nf_, hyper_, a, b, tile=128,
                    inner_steps=8)

            def _xla(ops):
                s, a, _ = ops
                return cavi_sweep(ld_, s, sb_, nf_, hyper_, a, tile=128,
                                  inner_steps=8)

            st2, _ = lax.cond(n_act <= thresh, _skip, _xla, (st, act_, blk))
            return st2
        return lax.fori_loop(0, n_, lambda _, s: body(s), st)

    configs = [
        ('A_plain_xla', 'plain', 0),
        ('B_mask_cond_xla', 'mask', -1),
        ('C_mask_cond_skip_allactive', 'mask', nb + 1),
        ('D_cond_skip_3pct', 'forced_few', nb + 1),
    ]

    results = {}
    for name, mode, thresh in configs:
        def call(st, n_):
            return chain(st, ld, sb, nf, hyper, act, few_mask,
                         jnp.asarray(n_), mode=mode, thresh=thresh)
        try:
            warm = call(state0, 3)
            float(np.asarray(warm.eta[:1, :1, :1]).ravel()[0])
            t0 = time.time()
            out = call(warm, N_REP)
            float(np.asarray(out.eta[:1, :1, :1]).ravel()[0])
            dt = max(time.time() - t0 - DISPATCH_S, 1e-9) / N_REP
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {e}")
            continue
        results[name] = dt
        log(f"{name}: {dt * 1e3:.2f} ms/sweep")

    # E: separate diag buffer for the skip branch (3% active):
    import jax.numpy as _jnp
    ld_skip = BlockLD(diag=_jnp.asarray(np.asarray(ld.diag)),
                      off_data=ld.off_data, off_src=ld.off_src,
                      off_dst=ld.off_dst, mask=ld.mask, scale=ld.scale)
    try:
        def call2(st, n_):
            return chain2(st, ld, ld_skip, sb, nf, hyper, act, few_mask,
                          jnp.asarray(n_), thresh=nb + 1)
        warm = call2(state0, 3)
        float(np.asarray(warm.eta[:1, :1, :1]).ravel()[0])
        t0 = time.time()
        out = call2(warm, N_REP)
        float(np.asarray(out.eta[:1, :1, :1]).ravel()[0])
        dt = max(time.time() - t0 - DISPATCH_S, 1e-9) / N_REP
        results['E_cond_skip_3pct_own_diag'] = dt
        log(f"E_cond_skip_3pct_own_diag: {dt * 1e3:.2f} ms/sweep")
    except Exception as e:
        log(f"E: FAILED {type(e).__name__}: {e}")

    import json
    print(json.dumps({k: round(v * 1e3, 3) for k, v in results.items()}),
          flush=True)


if __name__ == '__main__':
    main()
