"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from viprs_tpu.data.simulate import simulate_sumstats_blocks
from viprs_tpu.ops.block_ld import pack_dense_blocks
from viprs_tpu.ops.cavi_jax import CaviState, Hyper
from viprs_tpu.ops import em_loop, updates
from viprs_tpu.parallel.mesh import make_mesh, shard_problem, pad_blocks


def _logit(p):
    return float(np.log(p) - np.log1p(-p))


def _problem(S=4, seed=0):
    sim = simulate_sumstats_blocks(n=2000, block_sizes=(100, 90, 110, 80),
                                   h2=0.3, prop_causal=0.05, seed=seed)
    ld, lay = pack_dense_blocks(sim['ld_blocks'], block_size=128)
    sb = jnp.asarray(lay.to_flat(sim['std_beta']).reshape(lay.nb, 128),
                     jnp.float32)
    nf = jnp.asarray(lay.to_flat(sim['n_per_snp']).reshape(lay.nb, 128),
                     jnp.float32)
    pis = np.geomspace(0.01, 0.2, S)
    logits = jnp.stack([jnp.full((lay.nb, 128), np.float32(_logit(p)))
                        for p in pis])
    zeros = jnp.zeros((S, lay.nb, 128), jnp.float32)
    state = CaviState(logits=logits, mu=zeros, eta=zeros, q=zeros)
    hyper = Hyper(sigma_eps=jnp.full(S, 0.7, jnp.float32),
                  tau_beta=jnp.asarray(pis * lay.m / 0.3, jnp.float32),
                  pi=jnp.asarray(pis, jnp.float32),
                  lambda_min=jnp.zeros(S, jnp.float32))
    return ld, lay, state, hyper, sb, nf


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
class TestSharding:

    def test_sharded_matches_single_device(self):
        ld, lay, state, hyper, sb, nf = _problem()
        S = 4
        fix = updates.FixMask(sigma_eps=jnp.zeros(S, bool),
                              tau_beta=jnp.zeros(S, bool),
                              pi=jnp.ones(S, bool))
        kw = dict(n_sample=2000.0, m_total=float(lay.m),
                  init_elbo=jnp.zeros(S, jnp.float64),
                  active0=jnp.ones(S, bool), max_iter=30,
                  f_abs_tol=0.0, x_abs_tol=0.0)

        res_single = em_loop.em_fit(ld, state, sb, nf, hyper, fix, **kw)

        mesh = make_mesh(4, 2)
        ld_s, state_s, sb_s, nf_s = shard_problem(mesh, ld, state, sb, nf)
        res_shard = em_loop.em_fit(ld_s, state_s, sb_s, nf_s, hyper, fix, **kw)

        np.testing.assert_allclose(np.asarray(res_shard.final_elbo),
                                   np.asarray(res_single.final_elbo),
                                   rtol=5e-4)
        # padded blocks stay zero:
        eta_s = np.asarray(res_shard.state.eta)
        assert eta_s.shape[1] >= ld.nb
        assert np.all(eta_s[:, ld.nb:] == 0)

    def test_pad_blocks(self):
        ld, *_ = _problem()
        ld_p = pad_blocks(ld, 8)
        assert ld_p.nb % 8 == 0
        assert np.all(np.asarray(ld_p.mask[ld.nb:]) == 0)

    def test_grid_axis_sharding(self):
        """S sharded over the grid mesh axis."""
        ld, lay, state, hyper, sb, nf = _problem(S=8)
        mesh = make_mesh(2, 4)
        ld_s, state_s, sb_s, nf_s = shard_problem(mesh, ld, state, sb, nf)
        fix = updates.FixMask(sigma_eps=jnp.zeros(8, bool),
                              tau_beta=jnp.zeros(8, bool),
                              pi=jnp.ones(8, bool))
        res = em_loop.em_fit(ld_s, state_s, sb_s, nf_s, hyper, fix,
                             n_sample=2000.0, m_total=float(lay.m),
                             init_elbo=jnp.zeros(8, jnp.float64),
                             active0=jnp.ones(8, bool), max_iter=10)
        assert np.isfinite(np.asarray(res.final_elbo)).all()
