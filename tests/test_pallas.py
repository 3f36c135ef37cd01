"""Pallas kernel parity vs the XLA sweep (runs in interpreter mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from viprs_tpu.ops.block_ld import pack_dense_blocks
from viprs_tpu.ops.cavi_jax import CaviState, Hyper, cavi_sweep
from viprs_tpu.data.simulate import simulate_sumstats_blocks


def _logit(p):
    return float(np.log(p) - np.log1p(-p))


@pytest.fixture(scope='module')
def problem():
    sim = simulate_sumstats_blocks(n=2000, block_sizes=(150, 100), h2=0.3,
                                   prop_causal=0.05, seed=5)
    ld, lay = pack_dense_blocks(sim['ld_blocks'], block_size=128)
    sb = jnp.asarray(lay.to_flat(sim['std_beta']).reshape(lay.nb, 128),
                     jnp.float32)
    nf = jnp.asarray(lay.to_flat(sim['n_per_snp']).reshape(lay.nb, 128),
                     jnp.float32)
    return ld, lay, sb, nf


def _state_hyper(lay, S=2):
    pis = np.geomspace(0.02, 0.1, S)
    logits = jnp.stack([jnp.full((lay.nb, 128), np.float32(_logit(p)))
                        for p in pis])
    zeros = jnp.zeros((S, lay.nb, 128), jnp.float32)
    state = CaviState(logits=logits, mu=zeros, eta=zeros, q=zeros)
    hyper = Hyper(sigma_eps=jnp.full(S, 0.7, jnp.float32),
                  tau_beta=jnp.full(S, 800.0, jnp.float32),
                  pi=jnp.asarray(pis, jnp.float32),
                  lambda_min=jnp.zeros(S, jnp.float32))
    return state, hyper


def test_pallas_matches_xla_interpret(problem, monkeypatch):
    """The Pallas kernel must reproduce the XLA sweep (interpret mode on CPU)."""
    from viprs_tpu.ops import cavi_pallas
    import jax.experimental.pallas as pl

    ld, lay, sb, nf = problem
    state, hyper = _state_hyper(lay)

    orig_call = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs['interpret'] = True
        return orig_call(*args, **kwargs)

    monkeypatch.setattr(pl, 'pallas_call', interp_call)
    # re-trace with interpretation (bypass the jit cache):
    out_p, diff_p = cavi_pallas.cavi_sweep_pallas.__wrapped__(
        ld, state, sb, nf, hyper, jnp.ones(2), tile=64)

    out_x, diff_x = cavi_sweep(ld, state, sb, nf, hyper, jnp.ones(2), tile=64)

    np.testing.assert_allclose(np.asarray(out_p.eta), np.asarray(out_x.eta),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_p.q), np.asarray(out_x.q),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_p.mu), np.asarray(out_x.mu),
                               atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jax.nn.sigmoid(out_p.logits)),
        np.asarray(jax.nn.sigmoid(out_x.logits)), atol=1e-5)


def test_pallas_s1_matches_xla_interpret(problem, monkeypatch):
    """The chunked single-model kernel must reproduce the XLA sweep at S=1,
    including the ragged last chunk (nb not divisible by the chunk size)."""
    from viprs_tpu.ops import cavi_pallas
    import jax.experimental.pallas as pl

    ld, lay, sb, nf = problem
    state, hyper = _state_hyper(lay, S=1)
    assert lay.nb % 2 == 0 or lay.nb < 8  # exercise G=min(chunk, nb)

    orig_call = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs['interpret'] = True
        return orig_call(*args, **kwargs)

    monkeypatch.setattr(pl, 'pallas_call', interp_call)
    # chunk > 1 and not dividing nb exercises the masked ragged edge:
    out_p, diff_p = cavi_pallas.cavi_sweep_pallas_s1.__wrapped__(
        ld, state, sb, nf, hyper, jnp.ones(1), tile=64, chunk=2)

    out_x, diff_x = cavi_sweep(ld, state, sb, nf, hyper, jnp.ones(1), tile=64)

    np.testing.assert_allclose(np.asarray(out_p.eta), np.asarray(out_x.eta),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_p.q), np.asarray(out_x.q),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(diff_p), np.asarray(diff_x),
                               atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jax.nn.sigmoid(out_p.logits)),
        np.asarray(jax.nn.sigmoid(out_x.logits)), atol=1e-5)


def test_mixture_pallas_matches_xla_interpret(problem, monkeypatch):
    """The Pallas mixture kernel must reproduce the XLA mixture sweep
    (interpret mode on CPU)."""
    from viprs_tpu.ops import cavi_pallas
    from viprs_tpu.ops.cavi_mix import MixState, MixHyper, cavi_sweep_mixture
    import jax.experimental.pallas as pl

    ld, lay, sb, nf = problem
    K = 3
    nb, B = lay.nb, 128
    pis = np.array([0.01, 0.03, 0.05], dtype=np.float32)
    gamma = jnp.asarray(np.tile(pis[:, None, None], (1, nb, B)), jnp.float32)
    state = MixState(gamma=gamma,
                     mu=jnp.zeros((K, nb, B), jnp.float32),
                     eta=jnp.zeros((nb, B), jnp.float32),
                     q=jnp.zeros((nb, B), jnp.float32))
    hyper = MixHyper(sigma_eps=jnp.asarray(0.7, jnp.float32),
                     tau_beta=jnp.asarray([3000.0, 1000.0, 400.0], jnp.float32),
                     pi=jnp.asarray(pis),
                     lambda_min=jnp.asarray(0.0, jnp.float32))

    orig_call = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs['interpret'] = True
        return orig_call(*args, **kwargs)

    monkeypatch.setattr(pl, 'pallas_call', interp_call)
    out_p, diff_p = cavi_pallas.cavi_sweep_mixture_pallas.__wrapped__(
        ld, state, sb, nf, hyper, tile=64)

    out_x, diff_x = cavi_sweep_mixture(ld, state, sb, nf, hyper, tile=64)

    np.testing.assert_allclose(np.asarray(out_p.eta), np.asarray(out_x.eta),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_p.q), np.asarray(out_x.q),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_p.gamma),
                               np.asarray(out_x.gamma), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_p.mu), np.asarray(out_x.mu),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(diff_p), np.asarray(diff_x),
                               atol=1e-5)


def test_mixture_batch_pallas_matches_xla_interpret(problem, monkeypatch):
    """The grid-batched Pallas mixture kernel (lanes + components VMEM-
    resident, one LD stream) must reproduce the XLA batched mixture sweep,
    including frozen (active=0) and damped (0<active<1) lanes."""
    from viprs_tpu.ops import cavi_pallas
    from viprs_tpu.ops.cavi_mix import (MixState, MixHyper,
                                        cavi_sweep_mixture_batch)
    import jax.experimental.pallas as pl

    ld, lay, sb, nf = problem
    S, K = 4, 3
    nb, B = lay.nb, 128
    rng = np.random.default_rng(7)
    pis = rng.uniform(0.005, 0.05, size=(S, K)).astype(np.float32)
    gamma = jnp.asarray(np.broadcast_to(pis[:, :, None, None],
                                        (S, K, nb, B)), jnp.float32)
    state = MixState(gamma=gamma,
                     mu=jnp.asarray(rng.normal(0, 1e-3, (S, K, nb, B)),
                                    jnp.float32),
                     eta=jnp.zeros((S, nb, B), jnp.float32),
                     q=jnp.zeros((S, nb, B), jnp.float32))
    hyper = MixHyper(
        sigma_eps=jnp.asarray(rng.uniform(0.6, 0.9, S), jnp.float32),
        tau_beta=jnp.asarray(rng.uniform(300, 3000, (S, K)), jnp.float32),
        pi=jnp.asarray(pis),
        lambda_min=jnp.zeros(S, jnp.float32))
    active = jnp.asarray([1.0, 0.0, 0.5, 1.0], jnp.float32)

    orig_call = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs['interpret'] = True
        return orig_call(*args, **kwargs)

    monkeypatch.setattr(pl, 'pallas_call', interp_call)
    out_p, diff_p = cavi_pallas.cavi_sweep_mixture_pallas_batch.__wrapped__(
        ld, state, sb, nf, hyper, active, tile=64)

    out_x, diff_x = cavi_sweep_mixture_batch(ld, state, sb, nf, hyper,
                                             active, tile=64)

    np.testing.assert_allclose(np.asarray(out_p.eta), np.asarray(out_x.eta),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_p.q), np.asarray(out_x.q),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_p.gamma),
                               np.asarray(out_x.gamma), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_p.mu), np.asarray(out_x.mu),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(diff_p), np.asarray(diff_x),
                               atol=1e-5)
    # frozen lane untouched:
    np.testing.assert_array_equal(np.asarray(out_p.eta[1]),
                                  np.asarray(state.eta[1]))


def test_skip_kernel_matches_xla_interpret(problem, monkeypatch):
    """The active-block-compacted skipping kernel: active blocks must match the
    XLA sweep; quiescent blocks must pass through bit-exactly."""
    from viprs_tpu.ops import cavi_pallas
    import jax.experimental.pallas as pl

    ld, lay, sb, nf = problem
    state, hyper = _state_hyper(lay, S=1)
    # non-trivial starting point so skipping is observable:
    state = state._replace(mu=0.01 * sb[None], eta=0.002 * sb[None])
    from viprs_tpu.ops.cavi_jax import compute_q
    state = state._replace(q=compute_q(ld, state.eta))

    orig_call = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs['interpret'] = True
        return orig_call(*args, **kwargs)

    monkeypatch.setattr(pl, 'pallas_call', interp_call)

    nb = lay.nb
    # all blocks active == full sweep:
    out_all, _ = cavi_pallas.cavi_sweep_pallas_s1_skip.__wrapped__(
        ld, state, sb, nf, hyper, jnp.ones(1),
        jnp.ones(nb, bool), tile=64, chunk=2)
    out_x, _ = cavi_sweep(ld, state, sb, nf, hyper, jnp.ones(1), tile=64)
    np.testing.assert_allclose(np.asarray(out_all.eta), np.asarray(out_x.eta),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_all.q), np.asarray(out_x.q),
                               atol=1e-4)

    # subset active (with a ragged last chunk): frozen blocks bit-identical:
    act = np.zeros(nb, bool)
    act[::2] = True
    out_sub, _ = cavi_pallas.cavi_sweep_pallas_s1_skip.__wrapped__(
        ld, state, sb, nf, hyper, jnp.ones(1), jnp.asarray(act),
        tile=64, chunk=2)
    for name in ('logits', 'mu', 'eta'):
        got = np.asarray(getattr(out_sub, name))[0]
        want = np.asarray(getattr(out_x, name))[0]
        inp = np.asarray(getattr(state, name))[0]
        np.testing.assert_allclose(got[act], want[act], atol=1e-4)
        np.testing.assert_array_equal(got[~act], inp[~act])

    # none active: state passes through bit-exactly:
    out_none, _ = cavi_pallas.cavi_sweep_pallas_s1_skip.__wrapped__(
        ld, state, sb, nf, hyper, jnp.ones(1),
        jnp.zeros(nb, bool), tile=64, chunk=2)
    for name in ('logits', 'mu', 'eta', 'q'):
        np.testing.assert_array_equal(np.asarray(getattr(out_none, name)),
                                      np.asarray(getattr(state, name)))


def test_proposal_mask_detects_quiescence(problem):
    """block_proposal_mask: blocks at their CAVI fixed point are inactive; a
    hyperparameter change re-activates them."""
    from viprs_tpu.ops.cavi_pallas import block_proposal_mask
    from viprs_tpu.ops.cavi_jax import compute_q

    ld, lay, sb, nf = problem
    state, hyper = _state_hyper(lay, S=1)
    state = state._replace(q=compute_q(ld, state.eta))
    st = state
    for _ in range(60):
        st, _ = cavi_sweep(ld, st, sb, nf, hyper, jnp.ones(1))
    pm = block_proposal_mask(ld, st, sb, nf, hyper)
    assert pm.shape == (1, lay.nb)
    assert int(pm.sum()) < lay.nb  # some blocks quiesced after 60 sweeps

    # a skipping sweep from this state reproduces the full sweep:
    from viprs_tpu.ops import cavi_pallas
    import jax.experimental.pallas as pl
    orig_call = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs['interpret'] = True
        return orig_call(*args, **kwargs)
    pl.pallas_call, saved = interp_call, orig_call
    try:
        out_skip, _ = cavi_pallas.cavi_sweep_pallas_s1_skip.__wrapped__(
            ld, st, sb, nf, hyper, jnp.ones(1), pm[0], tile=64, chunk=2)
    finally:
        pl.pallas_call = saved
    out_full, _ = cavi_sweep(ld, st, sb, nf, hyper, jnp.ones(1))
    np.testing.assert_allclose(np.asarray(out_skip.eta),
                               np.asarray(out_full.eta), atol=1e-5)

    # shrinking pi strongly re-activates blocks:
    hyper2 = hyper._replace(pi=hyper.pi * 0.01)
    pm2 = block_proposal_mask(ld, st, sb, nf, hyper2)
    assert int(pm2.sum()) > int(pm.sum())


def test_mixture_skip_kernel_matches_xla_interpret(problem, monkeypatch):
    """The mixture skipping kernel: all-active == full mixture sweep; frozen
    blocks bit-identical; quiescent-state skip reproduces the trajectory."""
    from viprs_tpu.ops import cavi_pallas
    from viprs_tpu.ops.cavi_mix import (MixState, MixHyper, cavi_sweep_mixture,
                                        compute_q_mix)
    import jax.experimental.pallas as pl

    ld, lay, sb, nf = problem
    K = 3
    nb, B = lay.nb, 128
    pis = np.array([0.01, 0.03, 0.05], dtype=np.float32)
    gamma = jnp.asarray(np.tile(pis[:, None, None], (1, nb, B)), jnp.float32)
    rng = np.random.default_rng(2)
    mu = jnp.asarray(rng.standard_normal((K, nb, B)) * 0.01, jnp.float32)
    eta = jnp.sum(gamma * mu, axis=0)
    state = MixState(gamma=gamma, mu=mu, eta=eta,
                     q=compute_q_mix(ld, eta))
    hyper = MixHyper(sigma_eps=jnp.asarray(0.7, jnp.float32),
                     tau_beta=jnp.asarray([3000.0, 1000.0, 400.0], jnp.float32),
                     pi=jnp.asarray(pis),
                     lambda_min=jnp.asarray(0.0, jnp.float32))

    orig_call = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs['interpret'] = True
        return orig_call(*args, **kwargs)

    monkeypatch.setattr(pl, 'pallas_call', interp_call)

    out_x, diff_x = cavi_sweep_mixture(ld, state, sb, nf, hyper, tile=64)

    # all active == full sweep:
    out_all, diff_all = cavi_pallas.cavi_sweep_mixture_pallas_skip.__wrapped__(
        ld, state, sb, nf, hyper, jnp.ones(nb, bool), tile=64, chunk=2)
    np.testing.assert_allclose(np.asarray(out_all.eta), np.asarray(out_x.eta),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_all.q), np.asarray(out_x.q),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_all.gamma),
                               np.asarray(out_x.gamma), atol=1e-5)
    np.testing.assert_allclose(np.asarray(diff_all), np.asarray(diff_x),
                               atol=1e-5)

    # subset active: frozen blocks bit-identical on gamma/mu/eta:
    act = np.zeros(nb, bool)
    act[::2] = True
    out_sub, _ = cavi_pallas.cavi_sweep_mixture_pallas_skip.__wrapped__(
        ld, state, sb, nf, hyper, jnp.asarray(act), tile=64, chunk=2)
    np.testing.assert_array_equal(np.asarray(out_sub.eta)[~act],
                                  np.asarray(state.eta)[~act])
    np.testing.assert_array_equal(np.asarray(out_sub.gamma)[:, ~act],
                                  np.asarray(state.gamma)[:, ~act])
    np.testing.assert_allclose(np.asarray(out_sub.eta)[act],
                               np.asarray(out_x.eta)[act], atol=1e-4)

    # none active: bit-exact passthrough:
    out_none, _ = cavi_pallas.cavi_sweep_mixture_pallas_skip.__wrapped__(
        ld, state, sb, nf, hyper, jnp.zeros(nb, bool), tile=64, chunk=2)
    for name in ('gamma', 'mu', 'eta', 'q'):
        np.testing.assert_array_equal(np.asarray(getattr(out_none, name)),
                                      np.asarray(getattr(state, name)))

    # proposal mask from a quiesced state reproduces the full sweep:
    st = state
    for _ in range(40):
        st, _ = cavi_sweep_mixture(ld, st, sb, nf, hyper, tile=64)
    pm = cavi_pallas.mix_block_proposal_mask(ld, st, sb, nf, hyper)
    assert pm.shape == (nb,)
    out_skip, _ = cavi_pallas.cavi_sweep_mixture_pallas_skip.__wrapped__(
        ld, st, sb, nf, hyper, pm, tile=64, chunk=2)
    ref_full, _ = cavi_sweep_mixture(ld, st, sb, nf, hyper, tile=64)
    np.testing.assert_allclose(np.asarray(out_skip.eta),
                               np.asarray(ref_full.eta), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_skip.q),
                               np.asarray(ref_full.q), atol=1e-4)


def test_grid_skip_kernel_matches_xla_interpret(problem, monkeypatch):
    """The S>1 model-grid skipping kernel vs the XLA sweep: all-active match,
    frozen blocks bit-exact, inactive lanes frozen."""
    from viprs_tpu.ops import cavi_pallas
    import jax.experimental.pallas as pl

    ld, lay, sb, nf = problem
    S = 3
    state, hyper = _state_hyper(lay, S=S)
    state = state._replace(mu=0.01 * jnp.tile(sb[None], (S, 1, 1)),
                           eta=0.002 * jnp.tile(sb[None], (S, 1, 1)))
    from viprs_tpu.ops.cavi_jax import compute_q
    state = state._replace(q=compute_q(ld, state.eta))
    nb = lay.nb

    orig_call = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs['interpret'] = True
        return orig_call(*args, **kwargs)

    monkeypatch.setattr(pl, 'pallas_call', interp_call)

    act = jnp.ones(S)
    out_x, diff_x = cavi_sweep(ld, state, sb, nf, hyper, act, tile=64)

    out_all, diff_all = cavi_pallas.cavi_sweep_pallas_skip_s.__wrapped__(
        ld, state, sb, nf, hyper, act, jnp.ones(nb, bool), tile=64)
    np.testing.assert_allclose(np.asarray(out_all.eta), np.asarray(out_x.eta),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_all.q), np.asarray(out_x.q),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(diff_all), np.asarray(diff_x),
                               atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jax.nn.sigmoid(out_all.logits)),
        np.asarray(jax.nn.sigmoid(out_x.logits)), atol=1e-5)

    # subset of blocks active: frozen blocks bit-exact:
    bm = np.zeros(nb, bool)
    bm[::2] = True
    out_sub, _ = cavi_pallas.cavi_sweep_pallas_skip_s.__wrapped__(
        ld, state, sb, nf, hyper, act, jnp.asarray(bm), tile=64)
    for name in ('logits', 'mu', 'eta'):
        got = np.asarray(getattr(out_sub, name))
        np.testing.assert_array_equal(got[:, ~bm],
                                      np.asarray(getattr(state, name))[:, ~bm])
        np.testing.assert_allclose(got[:, bm],
                                   np.asarray(getattr(out_x, name))[:, bm],
                                   atol=1e-4)

    # an inactive lane must freeze even on active blocks:
    act2 = jnp.asarray([1.0, 0.0, 1.0])
    out_l, _ = cavi_pallas.cavi_sweep_pallas_skip_s.__wrapped__(
        ld, state, sb, nf, hyper, act2, jnp.ones(nb, bool), tile=64)
    np.testing.assert_array_equal(np.asarray(out_l.eta)[1],
                                  np.asarray(state.eta)[1])


def test_mixture_batch_skip_kernel_matches_xla_interpret(problem, monkeypatch):
    """The grid-batched mixture skipping kernel (VERDICT r3 #6): all-active
    match vs the XLA batched mixture sweep, quiescent blocks bit-exact,
    inactive lanes frozen, and the union proposal mask gates correctly."""
    from viprs_tpu.ops import cavi_pallas
    from viprs_tpu.ops.cavi_mix import (MixState, MixHyper,
                                        cavi_sweep_mixture_batch)
    import jax.experimental.pallas as pl

    ld, lay, sb, nf = problem
    S, K = 4, 3
    nb, B = lay.nb, 128
    rng = np.random.default_rng(11)
    pis = rng.uniform(0.005, 0.05, size=(S, K)).astype(np.float32)
    gamma = jnp.asarray(np.broadcast_to(pis[:, :, None, None],
                                        (S, K, nb, B)), jnp.float32)
    state = MixState(gamma=gamma,
                     mu=jnp.asarray(rng.normal(0, 1e-3, (S, K, nb, B)),
                                    jnp.float32),
                     eta=0.002 * jnp.tile(sb[None], (S, 1, 1)),
                     q=jnp.zeros((S, nb, B), jnp.float32))
    from viprs_tpu.ops.cavi_jax import compute_q
    state = state._replace(q=jax.vmap(lambda e: compute_q(ld, e[None])[0])(
        state.eta))
    hyper = MixHyper(
        sigma_eps=jnp.asarray(rng.uniform(0.6, 0.9, S), jnp.float32),
        tau_beta=jnp.asarray(rng.uniform(300, 3000, (S, K)), jnp.float32),
        pi=jnp.asarray(pis),
        lambda_min=jnp.zeros(S, jnp.float32))
    act = jnp.asarray([1.0, 0.0, 0.5, 1.0], jnp.float32)

    orig_call = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs['interpret'] = True
        return orig_call(*args, **kwargs)

    monkeypatch.setattr(pl, 'pallas_call', interp_call)

    out_x, diff_x = cavi_sweep_mixture_batch(ld, state, sb, nf, hyper,
                                             act, tile=64)

    # all blocks active == full batched sweep:
    out_all, diff_all = \
        cavi_pallas.cavi_sweep_mixture_pallas_skip_batch.__wrapped__(
            ld, state, sb, nf, hyper, act, jnp.ones(nb, bool), tile=64)
    np.testing.assert_allclose(np.asarray(out_all.eta), np.asarray(out_x.eta),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_all.q), np.asarray(out_x.q),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_all.gamma),
                               np.asarray(out_x.gamma), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_all.mu),
                               np.asarray(out_x.mu), atol=1e-5)
    np.testing.assert_allclose(np.asarray(diff_all), np.asarray(diff_x),
                               atol=1e-5)
    # frozen lane untouched even with all blocks active:
    np.testing.assert_array_equal(np.asarray(out_all.eta[1]),
                                  np.asarray(state.eta[1]))

    # subset of blocks active: quiescent blocks bit-exact:
    bm = np.zeros(nb, bool)
    bm[::2] = True
    out_sub, _ = \
        cavi_pallas.cavi_sweep_mixture_pallas_skip_batch.__wrapped__(
            ld, state, sb, nf, hyper, act, jnp.asarray(bm), tile=64)
    for name in ('gamma', 'mu'):
        got = np.asarray(getattr(out_sub, name))
        np.testing.assert_array_equal(
            got[:, :, ~bm], np.asarray(getattr(state, name))[:, :, ~bm])
        np.testing.assert_allclose(
            got[:, :, bm], np.asarray(getattr(out_x, name))[:, :, bm],
            atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out_sub.eta)[:, ~bm],
                                  np.asarray(state.eta)[:, ~bm])

    # the union proposal mask gates a converged state correctly:
    from viprs_tpu.ops.cavi_pallas import mix_block_proposal_mask_batch
    st = state
    for _ in range(40):
        st, _ = cavi_sweep_mixture_batch(ld, st, sb, nf, hyper,
                                         jnp.ones(S, jnp.float32), tile=64)
    pm = mix_block_proposal_mask_batch(ld, st, sb, nf, hyper)
    assert pm.shape == (S, nb)
    blk = np.asarray(jnp.any(pm, axis=0))
    assert blk.sum() < nb       # some blocks quiesced after 40 sweeps
    out_skip, _ = \
        cavi_pallas.cavi_sweep_mixture_pallas_skip_batch.__wrapped__(
            ld, st, sb, nf, hyper, jnp.ones(S, jnp.float32),
            jnp.asarray(blk), tile=64)
    out_full, _ = cavi_sweep_mixture_batch(ld, st, sb, nf, hyper,
                                           jnp.ones(S, jnp.float32), tile=64)
    np.testing.assert_allclose(np.asarray(out_skip.eta),
                               np.asarray(out_full.eta), atol=1e-5)
