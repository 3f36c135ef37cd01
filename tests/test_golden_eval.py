"""Head-to-head of the EVALUATION layer against the reference's executable
eval code (viprs/eval/*), imported in place via tests/ref_shim.py.

- continuous + sklearn-backed binary metrics: identical values at f64
  tolerance (same formulas, same library calls);
- GLM-backed metrics (pseudo-R2 family, liability family, incremental R2):
  the reference's formulas run over this framework's native GLM (the
  statsmodels shim), so any transcription error in
  viprs_tpu/eval/{binary,continuous}.py shows up as a mismatch;
- summary-statistics pseudo-validation (pseudo_r2 / pseudo_pearson_r): the
  reference's _match_variant_stats pipeline (allele-aware merge + LD-weighted
  betas, pseudo_metrics.py:4-127) runs on the shim GWADataLoader and is
  compared against this framework's eval/pseudo.py on the same fit.
"""

import numpy as np
import pandas as pd
import pytest

from viprs_tpu.data.dataset import SummaryStatsDataset
from viprs_tpu.data.simulate import simulate_sumstats_blocks
from viprs_tpu.eval import binary as our_bin
from viprs_tpu.eval import continuous as our_cont
from viprs_tpu.eval import pseudo as our_pseudo

try:
    import ref_shim
    ref = ref_shim.load_reference_viprs()
    from viprs.eval import binary_metrics as ref_bin
    from viprs.eval import continuous_metrics as ref_cont
    from viprs.eval import pseudo_metrics as ref_pseudo
    _SKIP = None
except Exception as e:
    ref = None
    _SKIP = str(e)

pytestmark = pytest.mark.skipif(
    ref is None, reason=f"reference package unavailable: {_SKIP}")


@pytest.fixture(scope='module')
def cont_data():
    rng = np.random.default_rng(3)
    n = 600
    pred = rng.standard_normal(n)
    true = 0.6 * pred + rng.standard_normal(n)
    cov = pd.DataFrame({'age': rng.uniform(40, 70, n),
                        'sex': rng.integers(0, 2, n).astype(float)})
    true = true + 0.02 * cov['age'].values - 0.3 * cov['sex'].values
    return true, pred, cov


@pytest.fixture(scope='module')
def bin_data(cont_data):
    true, pred, cov = cont_data
    y = (true > np.median(true)).astype(float)
    return y, pred, cov


class TestContinuousMetrics:

    def test_direct_metrics(self, cont_data):
        true, pred, _ = cont_data
        for name in ('r2', 'mse', 'spearman_r', 'pearson_r'):
            ours = getattr(our_cont, name)(true, pred)
            theirs = getattr(ref_cont, name)(true, pred)
            np.testing.assert_allclose(ours, theirs, rtol=1e-12, err_msg=name)

    def test_glm_backed_metrics(self, cont_data):
        true, pred, cov = cont_data
        np.testing.assert_allclose(
            our_cont.incremental_r2(true, pred, cov),
            ref_cont.incremental_r2(true, pred, cov), rtol=1e-6)
        np.testing.assert_allclose(
            our_cont.r2_residualized_target(true, pred, cov),
            ref_cont.r2_residualized_target(true, pred, cov), rtol=1e-6)
        np.testing.assert_allclose(
            our_cont.partial_correlation(true, pred, cov),
            ref_cont.partial_correlation(true, pred, cov), rtol=1e-6)


class TestBinaryMetrics:

    def test_sklearn_backed(self, bin_data):
        y, pred, _ = bin_data
        for name in ('roc_auc', 'pr_auc', 'avg_precision', 'f1'):
            ours = getattr(our_bin, name)(y, pred)
            theirs = getattr(ref_bin, name)(y, pred)
            np.testing.assert_allclose(ours, theirs, rtol=1e-10, err_msg=name)

    @pytest.mark.parametrize('name', ['mcfadden_r2', 'cox_snell_r2',
                                      'nagelkerke_r2', 'liability_r2',
                                      'liability_probit_r2',
                                      'liability_logit_r2'])
    def test_pseudo_r2_family(self, bin_data, name):
        y, pred, _ = bin_data
        ours = getattr(our_bin, name)(y, pred)
        theirs = getattr(ref_bin, name)(y, pred)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, err_msg=name)

    @pytest.mark.parametrize('name', ['mcfadden_r2', 'liability_r2'])
    def test_pseudo_r2_with_covariates(self, bin_data, name):
        y, pred, cov = bin_data
        ours = getattr(our_bin, name)(y, pred, cov)
        theirs = getattr(ref_bin, name)(y, pred, cov)
        np.testing.assert_allclose(ours, theirs, rtol=1e-3, err_msg=name)


class TestPseudoValidation:
    """The reference's full pseudo-validation pipeline (allele-aware merge,
    LD-weighted betas) vs this framework's on the same fitted model."""

    def test_pseudo_r2_head_to_head(self):
        from viprs_tpu.model import VIPRS
        sim = simulate_sumstats_blocks(n=3000, block_sizes=(150, 120), h2=0.4,
                                       prop_causal=0.05, seed=21)
        ds = SummaryStatsDataset.from_dense_blocks(
            sim['ld_blocks'], sim['std_beta'], sim['n_per_snp'],
            block_size=128)
        np.random.seed(4)
        m = VIPRS(ds, fix_params={'pi': 0.05, 'sigma_epsilon': 0.7,
                                  'tau_beta': 500.0}, mesh='off')
        m.fit(max_iter=200)
        prs_table = m.to_table()
        assert {'CHR', 'SNP', 'A1', 'A2', 'BETA'} <= set(prs_table.columns)

        # reference pipeline on an equivalent "validation" gdl (same stats):
        gdl = ref_shim.make_ref_gdl(sim)
        ref_r2 = ref_pseudo.pseudo_r2(gdl, prs_table)
        ref_r = ref_pseudo.pseudo_pearson_r(gdl, prs_table)

        ours_r2 = our_pseudo.pseudo_r2(ds, prs_table)
        ours_r = our_pseudo.pseudo_pearson_r(ds, prs_table)
        np.testing.assert_allclose(ours_r, ref_r, rtol=1e-5)
        np.testing.assert_allclose(ours_r2, ref_r2, rtol=1e-5)
        assert 0.0 < float(np.ravel(ours_r2)[0]) < 1.0

    def test_allele_flip_handling_matches(self):
        """Flipped-allele PRS rows change BETA sign identically through both
        merge implementations (ours serves as the shim's merge, so this
        drives the reference's USE of it end-to-end)."""
        from viprs_tpu.model import VIPRS
        sim = simulate_sumstats_blocks(n=3000, block_sizes=(100,), h2=0.4,
                                       prop_causal=0.1, seed=22)
        ds = SummaryStatsDataset.from_dense_blocks(
            sim['ld_blocks'], sim['std_beta'], sim['n_per_snp'],
            block_size=128)
        np.random.seed(4)
        m = VIPRS(ds, fix_params={'pi': 0.05, 'sigma_epsilon': 0.7,
                                  'tau_beta': 500.0}, mesh='off')
        m.fit(max_iter=100)
        tab = m.to_table()
        flipped = tab.copy()
        half = len(flipped) // 2
        a1 = flipped.loc[:half, 'A1'].copy()
        flipped.loc[:half, 'A1'] = flipped.loc[:half, 'A2'].values[:len(a1)]
        flipped.loc[:half, 'A2'] = a1.values
        flipped.loc[:half, 'BETA'] = -flipped.loc[:half, 'BETA']

        gdl = ref_shim.make_ref_gdl(sim)
        r2_orig = ref_pseudo.pseudo_r2(gdl, tab)
        r2_flip = ref_pseudo.pseudo_r2(gdl, flipped)
        np.testing.assert_allclose(r2_orig, r2_flip, rtol=1e-10)
        np.testing.assert_allclose(our_pseudo.pseudo_r2(ds, flipped),
                                   r2_orig, rtol=1e-5)
