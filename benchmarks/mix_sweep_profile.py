#!/usr/bin/env python3
"""Mixture-grid sweep profiling (VERDICT r4 next #4).

The measured gap: the 20-lane K=3 mixture grid costs ~0.62 s/lane vs the
plain grid(100)'s 0.056 s/lane. K explains 3x; this harness localizes the
rest by timing fused chains (one dispatch, memoization-proof) of:

  - the batched mixture Pallas kernel at S=20, K=3 (the production config)
  - the plain batch Pallas kernel at S=20 and S=60 (60 = S*K MXU rows —
    the per-row floor if K cost nothing beyond its rows)
  - inner_steps 4 vs 8

Usage: python benchmarks/mix_sweep_profile.py [m_variants]
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
    from viprs_tpu.ops.block_ld import pack_dense_blocks
    from viprs_tpu.ops.cavi_jax import CaviState, Hyper
    from viprs_tpu.ops.cavi_pallas import (cavi_sweep_pallas,
                                           cavi_sweep_mixture_pallas_batch)
    from viprs_tpu.ops.cavi_mix import MixState, MixHyper

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
    log(f"devices: {jax.devices()}; M={m} in {len(sizes)} blocks")

    ld, lay = pack_dense_blocks({1: blocks}, block_size=1024, quantize=True)
    nb, B = lay.nb, lay.block_size
    sb = jnp.asarray(lay.to_flat(
        {1: rng.standard_normal(m) * 0.005}).reshape(nb, B), jnp.float32)
    nf = jnp.asarray(lay.to_flat({1: np.full(m, 3e5)}).reshape(nb, B),
                     jnp.float32)

    DISPATCH_S = 0.027
    N_REP = 50

    def logit(p):
        return float(np.log(p) - np.log1p(-p))

    # NB: ld/sb/nf/hyper/act must be chain ARGUMENTS — closing over them
    # embeds the GB-scale LD as HLO constants and blows the remote compile
    # request limit (HTTP 413) on the axon transport.
    @partial(jax.jit, static_argnames=('kind', 'inner'))
    def chain(st, ld_, sb_, nf_, hyper_, act_, n_, kind, inner):
        if kind == 'plain':
            def body(_, s):
                return cavi_sweep_pallas(ld_, s, sb_, nf_, hyper_, act_,
                                         tile=128, inner_steps=inner)[0]
        else:
            def body(_, s):
                return cavi_sweep_mixture_pallas_batch(
                    ld_, s, sb_, nf_, hyper_, act_, tile=128,
                    inner_steps=inner)[0]
        return jax.lax.fori_loop(0, n_, body, st)

    def time_chain(kind, inner, state, hyper, act, n_rep=N_REP):
        def call(st, n_):
            return chain(st, ld, sb, nf, hyper, act, jnp.asarray(n_),
                         kind=kind, inner=inner)
        warm = call(state, 3)
        float(np.asarray(warm.eta[:1, :1, :1]).ravel()[0])
        t0 = time.time()
        out = call(warm, n_rep)
        float(np.asarray(out.eta[:1, :1, :1]).ravel()[0])
        return max(time.time() - t0 - DISPATCH_S, 1e-9) / n_rep

    results = {}

    # ---- plain batch Pallas at S in {20, 60} ----
    for S in (20, 60):
        for inner in (8,):
            state = CaviState(
                logits=jnp.full((S, nb, B), np.float32(logit(0.01))),
                mu=jnp.zeros((S, nb, B), jnp.float32),
                eta=jnp.zeros((S, nb, B), jnp.float32),
                q=jnp.zeros((S, nb, B), jnp.float32))
            hyper = Hyper(sigma_eps=jnp.full(S, 0.75, jnp.float32),
                          tau_beta=jnp.full(S, 0.01 * m / 0.25, jnp.float32),
                          pi=jnp.full(S, 0.01, jnp.float32),
                          lambda_min=jnp.zeros(S, jnp.float32))
            dt = time_chain('plain', inner, state, hyper, jnp.ones(S))
            results[f'plain_S{S}_inner{inner}'] = dt
            log(f"plain batch Pallas S={S} inner={inner}: "
                f"{dt * 1e3:.2f} ms/sweep ({dt * 1e6 / S:.1f} us/lane)")

    # ---- batched mixture kernel S=20 K=3 ----
    S, K = 20, 3
    for inner in (4, 8):
        state = MixState(
            gamma=jnp.full((S, K, nb, B), 0.01 / K, jnp.float32),
            mu=jnp.zeros((S, K, nb, B), jnp.float32),
            eta=jnp.zeros((S, nb, B), jnp.float32),
            q=jnp.zeros((S, nb, B), jnp.float32))
        hyper = MixHyper(
            sigma_eps=jnp.full(S, 0.75, jnp.float32),
            tau_beta=jnp.full((S, K), 0.01 * m / 0.25, jnp.float32)
            * jnp.asarray([1.0, 4.0, 16.0], jnp.float32)[None],
            pi=jnp.full((S, K), 0.01 / K, jnp.float32),
            lambda_min=jnp.zeros(S, jnp.float32))
        dt = time_chain('mix', inner, state, hyper, jnp.ones(S))
        results[f'mix_S{S}K{K}_inner{inner}'] = dt
        log(f"mixture batch Pallas S={S} K={K} inner={inner}: "
            f"{dt * 1e3:.2f} ms/sweep ({dt * 1e6 / S:.1f} us/lane, "
            f"{dt * 1e6 / (S * K):.1f} us/lane-component)")

    import json
    print(json.dumps({k: round(v * 1e3, 3) for k, v in results.items()}),
          flush=True)


if __name__ == '__main__':
    main()
