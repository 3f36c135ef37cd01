"""Diagnostics: ELBO decomposition, history plotting, theta tables."""

import matplotlib
matplotlib.use('Agg')

import numpy as np
import pytest

from viprs_tpu.data.dataset import SummaryStatsDataset
from viprs_tpu.data.simulate import simulate_sumstats_blocks
from viprs_tpu.model import VIPRS


@pytest.fixture(scope='module')
def fitted():
    sim = simulate_sumstats_blocks(n=2500, block_sizes=(150, 120), h2=0.3,
                                   prop_causal=0.04, seed=44)
    ds = SummaryStatsDataset.from_dense_blocks(
        sim['ld_blocks'], sim['std_beta'], sim['n_per_snp'], block_size=128)
    np.random.seed(3)
    m = VIPRS(ds, tracked_params=['pi', 'heritability', 'sigma_epsilon',
                                  'mse', 'entropy'])
    m.fit(max_iter=60)
    return m


class TestDecomposition:

    def test_elbo_decomposition_identity(self, fitted):
        """With the reference's conventions (the spike point-mass contributes
        a full Gaussian-entropy slot), the decomposition satisfies
        ELBO = loglik + log_prior + entropy - (M - sum(gamma))/2
        (viprs ELBO's 0.5*sum(gamma) term vs entropy's 0.5*M term)."""
        elbo = fitted.elbo()
        parts = fitted.loglikelihood() + fitted.log_prior() + fitted.entropy()
        sum_gamma = sum(np.sum(v) for v in fitted.var_gamma.values())
        expected_gap = -0.5 * (fitted.m - sum_gamma)
        np.testing.assert_allclose(elbo - parts, expected_gap, rtol=1e-4)

    def test_mse_positive(self, fitted):
        assert 0 <= fitted.mse() <= 1.5

    def test_complete_loglikelihood(self, fitted):
        assert np.isfinite(fitted.complete_loglikelihood())


class TestPlotting:

    def test_plot_history(self, fitted):
        from viprs_tpu.plot import plot_history
        g = plot_history(fitted)
        assert g is not None
        # tracked params recorded per iteration:
        assert len(fitted.history['pi']) == len(fitted.history['ELBO'])
