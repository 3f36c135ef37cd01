"""Evaluation flows: binary phenotypes, covariates, GridSearch facade."""

import numpy as np
import pandas as pd
import pytest

from viprs_tpu import eval as ev
from viprs_tpu.data.dataset import SummaryStatsDataset
from viprs_tpu.data.simulate import simulate_sumstats_blocks
from viprs_tpu.gridsearch import GridSearch, HyperparameterGrid


@pytest.fixture(scope='module')
def binary_data():
    rng = np.random.default_rng(7)
    n = 600
    liability = rng.standard_normal(n)
    prs = 0.6 * liability + 0.8 * rng.standard_normal(n)
    y = (liability > np.quantile(liability, 0.7)).astype(float)
    cov = pd.DataFrame({'age': rng.uniform(40, 70, n),
                        'sex': rng.integers(0, 2, n).astype(float)})
    return y, prs, cov


class TestBinaryMetrics:

    def test_auc_family(self, binary_data):
        y, prs, _ = binary_data
        assert 0.6 < ev.roc_auc(y, prs) < 1.0
        assert 0 < ev.pr_auc(y, prs) <= 1.0
        assert 0 < ev.avg_precision(y, prs) <= 1.0
        assert 0 <= ev.f1(y, prs) <= 1.0

    def test_pseudo_r2_family(self, binary_data):
        y, prs, cov = binary_data
        for fn in (ev.mcfadden_r2, ev.cox_snell_r2, ev.nagelkerke_r2):
            v_nocov = fn(y, prs)
            v_cov = fn(y, prs, cov)
            assert 0 < v_nocov < 1
            assert np.isfinite(v_cov)

    def test_liability_family(self, binary_data):
        y, prs, cov = binary_data
        assert 0 < ev.liability_r2(y, prs) < 1
        full = ev.liability_r2(y, prs, cov, return_all_r2=True)
        assert set(full) == {'Null_R2', 'Full_R2', 'Incremental_R2'}
        assert np.isfinite(ev.liability_probit_r2(y, prs, cov))
        assert np.isfinite(ev.liability_logit_r2(y, prs, cov))

    def test_continuous_with_covariates(self, binary_data):
        _, prs, cov = binary_data
        rng = np.random.default_rng(1)
        y_cont = prs + 0.01 * cov['age'].values + rng.standard_normal(len(prs))
        inc = ev.incremental_r2(y_cont, prs, cov)
        assert 0 < inc < 1
        pc = ev.partial_correlation(y_cont, prs, cov)
        assert 0 < pc <= 1
        assert np.isfinite(ev.r2_residualized_target(y_cont, prs, cov))

    def test_registry_complete(self):
        assert len(ev.eval_metric_names) == 17


class TestGridSearchFacade:

    def test_fit_and_select(self):
        sim = simulate_sumstats_blocks(n=2500, block_sizes=(180, 150), h2=0.35,
                                       prop_causal=0.05, seed=55)
        ds = SummaryStatsDataset.from_dense_blocks(
            sim['ld_blocks'], sim['std_beta'], sim['n_per_snp'], block_size=128)
        np.random.seed(0)
        gs = GridSearch(ds, HyperparameterGrid(pi_steps=3, n_snps=ds.m),
                        criterion='training_objective')
        model = gs.fit(max_iter=150)
        assert model.n_models == 1
        assert model.post_mean_beta is not None

    def test_mixture_model_grid_is_simultaneous(self):
        """Reference parity: the search accepts any PRS model class
        (HyperparameterSearch.py:104-111). The mixture model now routes to
        the SIMULTANEOUS batched grid (VIPRSMixGrid / mix_em_fit_batch) —
        one fused fit for all rows instead of serial pathwise fits."""
        from viprs_tpu.model.mix import VIPRSMix
        from viprs_tpu.model.mix_grid import VIPRSMixGrid

        sim = simulate_sumstats_blocks(n=2500, block_sizes=(180, 150), h2=0.35,
                                       prop_causal=0.05, seed=56)
        ds = SummaryStatsDataset.from_dense_blocks(
            sim['ld_blocks'], sim['std_beta'], sim['n_per_snp'], block_size=128)
        grid = HyperparameterGrid(pi_steps=3, n_snps=ds.m)
        np.random.seed(0)
        gs = GridSearch(ds, grid, criterion='ELBO', model_class=VIPRSMix, K=2)
        assert gs._simultaneous and isinstance(gs.model, VIPRSMixGrid)
        model = gs.fit(max_iter=150)
        assert isinstance(model, VIPRSMix)
        assert model.post_mean_beta is not None
        assert gs.validation_result is not None
        assert len(gs.validation_result) == grid.n_models
        assert np.isfinite(gs.validation_result['ELBO']).any()
        # the returned model is the argmax of the recorded scores
        best = gs.validation_result['ELBO'].idxmax()
        assert np.isclose(model.objective(),
                          gs.validation_result['ELBO'][best])

    def test_pathwise_fallback_any_model_class(self):
        """Unknown (non-grid-capable) model classes still work through the
        pathwise fallback — the reference's any-model worker semantics
        (HyperparameterSearch.py:16-64): one fit per row with fix_params."""
        from viprs_tpu.model import VIPRS

        sim = simulate_sumstats_blocks(n=2500, block_sizes=(180, 150), h2=0.35,
                                       prop_causal=0.05, seed=57)
        ds = SummaryStatsDataset.from_dense_blocks(
            sim['ld_blocks'], sim['std_beta'], sim['n_per_snp'], block_size=128)
        grid = HyperparameterGrid(pi_steps=3, n_snps=ds.m)
        np.random.seed(0)
        gs = GridSearch(ds, grid, criterion='ELBO', model_class=VIPRS)
        assert not gs._simultaneous
        model = gs.fit(max_iter=150)
        assert isinstance(model, VIPRS)
        assert gs.validation_result is not None
        assert len(gs.validation_result) == grid.n_models
