"""Model-layer tests: VIPRS / VIPRSMix / VIPRSGrid / LDPredInf on synthetic data.

Mirrors the reference's test strategy (tests/test_basic.py: shape and hyper-range
invariants after initialize(), smoke fits, grid/selection/BMA flows) with
deterministic simulated fixtures instead of downloaded 1000G data.
"""

import numpy as np
import pytest

from viprs_tpu.data.dataset import SummaryStatsDataset
from viprs_tpu.data.simulate import simulate_sumstats_blocks
from viprs_tpu.model import VIPRS, VIPRSMix, VIPRSGrid, LDPredInf
from viprs_tpu.gridsearch import (HyperparameterGrid, select_best_model,
                                  bayesian_model_average)


@pytest.fixture(scope='module')
def sim():
    return simulate_sumstats_blocks(n=3000, block_sizes=(250, 200), h2=0.35,
                                    prop_causal=0.04, seed=21)


@pytest.fixture(scope='module')
def dataset(sim):
    return SummaryStatsDataset.from_dense_blocks(
        sim['ld_blocks'], sim['std_beta'], sim['n_per_snp'], block_size=256)


class TestVIPRS:

    def test_initialize_invariants(self, dataset):
        np.random.seed(0)
        m = VIPRS(dataset)
        m.initialize()
        assert 0 < m.pi < 1
        assert 0 < m.sigma_epsilon < 1
        assert m.tau_beta > 0
        vg = m.var_gamma
        for c, sz in m.shapes.items():
            assert vg[c].shape == (sz,)
            assert np.all((vg[c] > 0) & (vg[c] < 1))
            assert np.allclose(m.var_mu[c], 0.0)

    def test_smoke_fit(self, dataset, sim):
        np.random.seed(1)
        m = VIPRS(dataset)
        m.fit(max_iter=300)
        assert m.optim_result.stop_iteration
        assert m.optim_result.success, m.optim_result.message
        # posterior moments populated and h2 recovered in a sane range:
        assert m.post_mean_beta is not None
        h2 = m.get_heritability()
        assert 0.1 < h2 < 0.7
        # ELBO improves over the run (history[0] is computed with the
        # reference's fit_term==1 shortcut, which overestimates before the
        # first sigma_epsilon update — so compare from iteration 1):
        assert m.history['ELBO'][-1] >= m.history['ELBO'][1]
        # posterior mean correlates with truth:
        eta = np.concatenate([m.post_mean_beta[c] for c in m.chromosomes])
        bt = np.concatenate([sim['beta_true'][c] for c in m.chromosomes])
        assert np.corrcoef(eta, bt)[0, 1] > 0.4

    def test_lazy_posterior_moments(self, dataset):
        """fit() leaves the posterior on device; the pip/post_mean_beta/
        post_var_beta properties materialize host copies on first access and
        match an explicit update_posterior_moments() call."""
        np.random.seed(11)
        m = VIPRS(dataset)
        m.fit(max_iter=50)
        assert m._pip is None and m._post_mean_beta is None \
            and m._post_var_beta is None
        pip = m.pip            # triggers the one-dispatch materialization
        assert pip is not None and m._post_var_beta is not None
        lazy = {c: (np.array(m.pip[c]), np.array(m.post_mean_beta[c]),
                    np.array(m.post_var_beta[c])) for c in m.chromosomes}
        m.update_posterior_moments()
        for c in m.chromosomes:
            np.testing.assert_allclose(lazy[c][0], m.pip[c], rtol=1e-6)
            np.testing.assert_allclose(lazy[c][1], m.post_mean_beta[c],
                                       rtol=1e-6)
            np.testing.assert_allclose(lazy[c][2], m.post_var_beta[c],
                                       rtol=1e-6, atol=1e-12)

    def test_tracked_params(self, dataset):
        np.random.seed(2)
        m = VIPRS(dataset, tracked_params=['pi', 'sigma_epsilon', 'heritability'])
        m.fit(max_iter=20)
        assert len(m.history['pi']) == len(m.history['ELBO'])
        assert len(m.history['sigma_epsilon']) > 1

    def test_sweep_impl_validation(self, dataset):
        """A bad sweep_impl raises instead of silently falling through to the
        default dispatch (ADVICE r2); Pallas impls raise a clear error off-TPU
        instead of an opaque lowering failure."""
        np.random.seed(3)
        m = VIPRS(dataset)
        with pytest.raises(ValueError, match="sweep_impl"):
            m.fit(max_iter=2, sweep_impl='Skip')
        with pytest.raises(ValueError, match="sweep_impl"):
            m.fit(max_iter=2, sweep_impl='gather')
        import jax
        if jax.default_backend() not in ('tpu', 'axon'):
            with pytest.raises(ValueError, match="backend"):
                m.fit(max_iter=2, sweep_impl='skip')
            with pytest.raises(ValueError, match="backend"):
                m.fit(max_iter=2, sweep_impl='pallas')
        # the explicit XLA impl works everywhere:
        m.fit(max_iter=5, sweep_impl='xla')
        assert m.optim_result.stop_iteration

    def test_chunked_equals_fused(self, dataset):
        """Tracking runs the SAME fused loop in chunks of 1; the carried
        convergence-ladder counters make the trajectory identical to a single
        dispatch (one optimizer, one behavior)."""
        np.random.seed(31)
        m1 = VIPRS(dataset)
        m1.fit(max_iter=80)
        np.random.seed(31)
        m2 = VIPRS(dataset, tracked_params=['pi', 'heritability'])
        m2.fit(max_iter=80)
        np.testing.assert_allclose(m1.history['ELBO'], m2.history['ELBO'],
                                   rtol=1e-12)
        assert m1.optim_result.nit == m2.optim_result.nit
        assert m1.optim_result.message == m2.optim_result.message
        assert len(m2.history['pi']) == len(m2.history['ELBO'])

    def test_manual_em_api(self, dataset, sim):
        """The reference's manual-EM surface (e_step/m_step/update_*,
        VIPRS.py:381-495) drives the optimization correctly."""
        np.random.seed(33)
        m = VIPRS(dataset)
        m.initialize()
        m.e_step()
        m.m_step()
        e1 = m.elbo()
        for _ in range(40):
            m.e_step()
            m.m_step()
        e2 = m.elbo()
        assert e2 > e1
        m.update_pi()
        m.update_tau_beta()
        m.update_sigma_epsilon()
        m._update_sigma_g()
        m.update_theta_history()
        assert 0.1 < m.get_heritability() < 0.7
        m.update_posterior_moments()
        eta = np.concatenate([m.post_mean_beta[c] for c in m.chromosomes])
        bt = np.concatenate([sim['beta_true'][c] for c in m.chromosomes])
        assert np.corrcoef(eta, bt)[0, 1] > 0.4
        # validation-sumstats attachment (set_validation_sumstats):
        m.set_validation_sumstats({c: np.asarray(v)
                                   for c, v in sim['std_beta'].items()})
        assert np.isfinite(m.pseudo_validate())

    def test_progress_callback(self, dataset):
        np.random.seed(32)
        seen = []
        m = VIPRS(dataset)
        m.fit(max_iter=60,
              progress_callback=lambda model, it, statuses: seen.append(it))
        assert seen and seen[-1] == m.optim_result.nit

    def test_to_table_roundtrip(self, dataset, tmp_path):
        np.random.seed(3)
        m = VIPRS(dataset)
        m.fit(max_iter=50)
        tab = m.to_table()
        assert {'CHR', 'SNP', 'A1', 'A2', 'BETA', 'PIP', 'VAR_BETA'} <= set(tab.columns)
        assert len(tab) == m.m

        out = str(tmp_path / 'test')
        m.write_inferred_parameters(out)
        m2 = VIPRS(dataset)
        m2.read_inferred_parameters(out + '.fit', sep='\t')
        for c in m.chromosomes:
            np.testing.assert_allclose(m2.post_mean_beta[c], m.post_mean_beta[c],
                                       atol=1e-6)

    def test_theta_table(self, dataset):
        np.random.seed(4)
        m = VIPRS(dataset)
        m.fit(max_iter=30)
        tt = m.to_theta_table()
        assert 'ELBO' in tt['Parameter'].values
        ht = m.to_history_table()
        assert 'ELBO' in ht.columns

    def test_fix_params(self, dataset):
        np.random.seed(5)
        m = VIPRS(dataset, fix_params={'pi': 0.03, 'sigma_epsilon': 0.8})
        m.fit(max_iter=100)
        assert np.isclose(m.pi, 0.03)
        assert np.isclose(m.sigma_epsilon, 0.8)

    def test_pseudo_validate_internal(self, dataset):
        np.random.seed(6)
        m = VIPRS(dataset)
        m.split_gwas_sumstats(prop_train=0.8, seed=1)
        m.fit(max_iter=100)
        r2 = m.pseudo_validate()
        assert np.isfinite(r2)
        assert 0 <= r2 <= 1.0


class TestInGraphRestart:
    """The single-dispatch S=1 path folds restart-on-negative-MSE into the
    fused loop (em_loop.em_fit max_restarts>0). Its trajectory must be
    BIT-IDENTICAL to the chunked host-restart path (reference
    VIPRS.py:1025-1038 semantics), for nominal and pathological inputs."""

    @pytest.mark.parametrize('scale,expect_restart', [(1.0, False),
                                                      (3.0, True)])
    def test_matches_host_restart_path(self, scale, expect_restart):
        sim = simulate_sumstats_blocks(n=1500, block_sizes=(96, 80), h2=0.3,
                                       prop_causal=0.05, seed=0)
        sb = {c: scale * v for c, v in sim['std_beta'].items()}
        ds = SummaryStatsDataset.from_dense_blocks(
            sim['ld_blocks'], sb, sim['n_per_snp'], block_size=128)

        np.random.seed(7)
        m1 = VIPRS(ds, mesh='off')
        m1.fit(max_iter=60)                  # one dispatch, in-graph restart
        h1 = np.array([float(np.atleast_1d(v)[0])
                       for v in m1.history['ELBO']])
        np.random.seed(7)
        m2 = VIPRS(ds, mesh='off')
        m2.fit(max_iter=60, chunk_iters=25)  # chunked => host restart
        h2 = np.array([float(np.atleast_1d(v)[0])
                       for v in m2.history['ELBO']])

        assert len(h1) == len(h2)
        assert np.array_equal(h1, h2, equal_nan=True)
        assert m1.optim_result.message == m2.optim_result.message
        assert m1.optim_result.nit == m2.optim_result.nit
        assert m1.fix_params == m2.fix_params
        assert (m1.fix_params.get('sigma_epsilon') == 0.95) == expect_restart
        e1 = np.concatenate([np.asarray(m1.post_mean_beta[c])
                             for c in m1.chromosomes])
        e2 = np.concatenate([np.asarray(m2.post_mean_beta[c])
                             for c in m2.chromosomes])
        assert np.array_equal(e1, e2)

    def test_restart_on_final_iteration_budget(self):
        """MSE goes negative exactly when the budget runs out: the in-graph
        path must NOT reset mid-exit (it would report MAX_ITER + the fresh
        objective); both paths report the negative-MSE outcome."""
        sim = simulate_sumstats_blocks(n=1500, block_sizes=(96, 80), h2=0.3,
                                       prop_causal=0.05, seed=0)
        sb = {c: 3.0 * v for c, v in sim['std_beta'].items()}
        ds = SummaryStatsDataset.from_dense_blocks(
            sim['ld_blocks'], sb, sim['n_per_snp'], block_size=128)
        # find the iteration where the ladder stops (the MSE-negative point):
        np.random.seed(7)
        probe = VIPRS(ds, mesh='off')
        probe.fit(max_iter=60, max_restarts=0)
        k = probe.optim_result.nit
        assert 'MSE is negative' in probe.optim_result.message

        np.random.seed(7)
        m1 = VIPRS(ds, mesh='off')
        m1.fit(max_iter=k)              # in-graph path, budget ends at k
        np.random.seed(7)
        m2 = VIPRS(ds, mesh='off')
        m2.fit(max_iter=k, chunk_iters=max(1, k - 1))   # host path
        assert m1.optim_result.message == m2.optim_result.message
        assert 'MSE is negative' in m1.optim_result.message
        h1 = [float(np.atleast_1d(v)[0]) for v in m1.history['ELBO']]
        h2 = [float(np.atleast_1d(v)[0]) for v in m2.history['ELBO']]
        assert len(h1) == len(h2)
        np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))


class TestVIPRSMix:

    def test_smoke_fit(self, dataset, sim):
        np.random.seed(7)
        m = VIPRSMix(dataset, K=3)
        m.initialize()
        assert m.pi.shape == (3,)
        assert np.all(m.pi > 0) and m.pi.sum() < 1
        assert m.tau_beta.shape == (3,)

        m.fit(max_iter=200)
        assert m.optim_result.stop_iteration
        pip = np.concatenate([m.pip[c] for c in m.chromosomes])
        assert np.all((pip >= 0) & (pip <= 1 + 1e-6))
        eta = np.concatenate([m.post_mean_beta[c] for c in m.chromosomes])
        bt = np.concatenate([sim['beta_true'][c] for c in m.chromosomes])
        assert np.corrcoef(eta, bt)[0, 1] > 0.3
        # K=1 mixture should behave like plain VIPRS:

    def test_k1_close_to_viprs(self, dataset):
        np.random.seed(8)
        mv = VIPRS(dataset)
        mv.fit(max_iter=150, theta_0={'pi': 0.05, 'sigma_epsilon': 0.7})
        np.random.seed(8)
        mm = VIPRSMix(dataset, K=1)
        mm.fit(max_iter=150, theta_0={'pi': 0.05, 'sigma_epsilon': 0.7})
        eta_v = np.concatenate([mv.post_mean_beta[c] for c in mv.chromosomes])
        eta_m = np.concatenate([mm.post_mean_beta[c] for c in mm.chromosomes])
        assert np.corrcoef(eta_v, eta_m)[0, 1] > 0.99

    def test_k10_fit(self, dataset):
        """K=10 (the reference's own mixture test size and iteration budget,
        /root/reference/tests/test_basic.py:138-197 fits max_iter=10):
        initialization invariants, smoke fit, posterior shapes, and the
        reporting surface. NOTE the reference itself degenerates at K=10 when
        run to convergence on spike-and-slab data (pi collapses onto one
        component, null_pi -> 0, log(0) => 'Objective (ELBO) is undefined' —
        verified head-to-head via tests/ref_shim.py), so this mirrors the
        reference's own smoke budget; this framework detects the same
        pathology through the divergence/non-finite ladder instead of
        crashing."""
        np.random.seed(9)
        m = VIPRSMix(dataset, K=10)
        m.initialize()
        assert m.pi.shape == (10,)
        assert np.all((m.pi > 0) & (m.pi < 1)) and 0 < m.pi.sum() < 1
        assert 0.0 < float(m.sigma_epsilon) < 1.0
        assert m.tau_beta.shape == (10,) and np.all(m.tau_beta > 0)
        assert m.d.shape == (10,)

        m.fit(max_iter=10)
        assert m.optim_result.stop_iteration
        for c in m.chromosomes:
            assert m.pip[c].shape == (m.shapes[c],)
            assert m.post_mean_beta[c].shape == (m.shapes[c],)
            assert m.post_var_beta[c].shape == (m.shapes[c],)
        pip = np.concatenate([m.pip[c] for c in m.chromosomes])
        assert np.all((pip >= 0) & (pip <= 1 + 1e-5))
        # reporting surface doesn't throw (reference test parity):
        m.to_table()
        m.to_theta_table()
        m.to_history_table()
        assert np.isfinite(m.mse())
        assert np.isfinite(m.log_prior())
        assert np.isfinite(m.loglikelihood())
        assert np.isfinite(m.entropy())
        assert 0.0 <= m.get_heritability() <= 1.0
        # NOTE: elbo != loglikelihood + log_prior + entropy exactly, matching
        # the reference: its entropy()/log_prior() carry 0.5*M constants
        # (VIPRS.py:613,678) while elbo() carries 0.5*sum(gamma)
        # (VIPRS.py:566) — the null component has no Gaussian term. The
        # difference is 0.5*(M - sum(gamma)):
        gap = m.elbo() - (m.loglikelihood() + m.log_prior() + m.entropy())
        sum_gamma = float(sum(np.sum(v) for v in m.var_gamma.values()))
        np.testing.assert_allclose(gap, -0.5 * (m.n_snps - sum_gamma),
                                   rtol=1e-3)


class TestVIPRSMixGrid:

    def test_batch_converges_and_matches_serial(self, dataset):
        """All mixture grid lanes converge in ONE fused batched fit
        (mix_em_fit_batch with the damping ladder — the round-2 batched
        mixture kernel limit-cycled without it), landing at ELBOs equal or
        better than serial per-row fits."""
        from viprs_tpu.model.mix_grid import VIPRSMixGrid
        np.random.seed(5)
        grid = HyperparameterGrid(pi_steps=4, n_snps=dataset.m,
                                  h2_est=0.3, h2_se=0.05)
        g = VIPRSMixGrid(dataset, grid, K=2)
        g.fit(max_iter=300)
        assert g.converged_models.all(), \
            [r.message for r in g.optim_results]
        batch_elbos = np.asarray(g.elbo())
        assert np.all(np.isfinite(batch_elbos))

        rows = grid.combine_grids()
        for i, row in enumerate(rows):
            np.random.seed(100 + i)
            m = VIPRSMix(dataset, K=2, fix_params=dict(row))
            m.fit(max_iter=300)
            # equal-or-better (inits differ by the per-row Dirichlet draw;
            # the mixture ELBO is multi-modal in the component split):
            assert batch_elbos[i] >= m.elbo() - 1.0, (i, batch_elbos[i], m.elbo())

    def test_select_and_collapse(self, dataset):
        from viprs_tpu.model.mix_grid import VIPRSMixGrid
        from viprs_tpu.gridsearch import select_best_model
        np.random.seed(6)
        grid = HyperparameterGrid(pi_steps=4, n_snps=dataset.m,
                                  h2_est=0.3, h2_se=0.05)
        g = VIPRSMixGrid(dataset, grid, K=3)
        g.fit(max_iter=300)
        elbos = np.asarray(g.elbo()).copy()
        best = select_best_model(g, criterion='ELBO')
        assert best.n_models == 1
        assert np.isclose(best.objective(), elbos.max(), atol=0.05)
        assert 0 < best.get_heritability() < 1
        # posterior surface behaves like a plain VIPRSMix:
        pip = np.concatenate([best.pip[c] for c in best.chromosomes])
        assert pip.shape == (dataset.m,)
        assert np.all((pip >= 0) & (pip <= 1 + 1e-6))

    def test_chunked_equals_fused_mix_grid(self, dataset):
        """Chunked runs carry the ladder counters, so a chunk size of 25 is
        iteration-for-iteration identical to one fused dispatch (incl. the
        compacted-lane sub-runs)."""
        from viprs_tpu.model.mix_grid import VIPRSMixGrid
        np.random.seed(8)
        grid = HyperparameterGrid(pi_steps=4, n_snps=dataset.m,
                                  h2_est=0.3, h2_se=0.05)
        g1 = VIPRSMixGrid(dataset, grid, K=2)
        g1.fit(max_iter=200)
        np.random.seed(8)
        g2 = VIPRSMixGrid(dataset, grid, K=2)
        g2.fit(max_iter=200, chunk_iters=25)
        np.testing.assert_allclose(np.asarray(g2.elbo()),
                                   np.asarray(g1.elbo()), rtol=1e-12)
        np.testing.assert_array_equal(g2._nit, g1._nit)
        assert len(g1.history['ELBO']) == len(g2.history['ELBO'])
        np.testing.assert_allclose(np.asarray(g2.history['ELBO']),
                                   np.asarray(g1.history['ELBO']), rtol=1e-12)

    def test_pumas_pseudo_validation_selection(self, dataset):
        from viprs_tpu.model.mix_grid import VIPRSMixGrid
        from viprs_tpu.gridsearch import select_best_model
        np.random.seed(7)
        grid = HyperparameterGrid(pi_steps=3, n_snps=dataset.m,
                                  h2_est=0.3, h2_se=0.05)
        g = VIPRSMixGrid(dataset, grid, K=2)
        g.split_gwas_sumstats(prop_train=0.8)
        g.fit(max_iter=300)
        scores = g.pseudo_validate()
        assert scores.shape == (3,)
        best = select_best_model(g, criterion='pseudo_validation')
        assert best.n_models == 1


class TestVIPRSGrid:

    def _grid(self, dataset):
        return HyperparameterGrid(pi_steps=4, n_snps=dataset.m)

    def test_simultaneous_fit(self, dataset):
        np.random.seed(9)
        g = VIPRSGrid(dataset, self._grid(dataset))
        g.fit(max_iter=200)
        assert g.n_models == 4
        vt = g.to_validation_table()
        assert len(vt) == 4 and 'ELBO' in vt.columns
        # per-model posterior matrices:
        for c, sz in g.shapes.items():
            assert g.var_gamma[c].shape == (sz, 4)

    def test_grid_chunked_matches_fused(self, dataset):
        """A stiff grid (fixed hyperparameters -> stall damping engages) gives
        the same per-model outcomes whether run in one dispatch or chunks."""
        np.random.seed(41)
        g1 = VIPRSGrid(dataset, self._grid(dataset))
        g1.fit(max_iter=150)
        np.random.seed(41)
        g2 = VIPRSGrid(dataset, self._grid(dataset))
        g2.fit(max_iter=150, chunk_iters=7)
        np.testing.assert_allclose(np.asarray(g1._last_result.final_elbo),
                                   np.asarray(g2._last_result.final_elbo),
                                   rtol=1e-12)
        assert [r.success for r in g1.optim_results] == \
            [r.success for r in g2.optim_results]
        np.testing.assert_array_equal(np.asarray(g1._last_result.nit),
                                      np.asarray(g2._last_result.nit))

    def test_grid_lane_compaction_matches_fused(self, dataset):
        """With S >= 8 and bounded chunks, the driver re-runs only the
        still-active lanes at a smaller power-of-2 width between chunks
        (model/viprs.py fit). Lane subsetting must be EXACT — every per-lane
        computation in the fused loop is lane-independent."""
        grid = HyperparameterGrid(pi_steps=16, n_snps=dataset.m)
        np.random.seed(42)
        g1 = VIPRSGrid(dataset, grid)
        g1.fit(max_iter=150, chunk_iters=150)   # one dispatch, no compaction
        np.random.seed(42)
        g2 = VIPRSGrid(dataset, grid)
        g2.fit(max_iter=150, chunk_iters=2)     # compaction engages
        np.testing.assert_array_equal(np.asarray(g1._last_result.final_elbo),
                                      np.asarray(g2._last_result.final_elbo))
        np.testing.assert_array_equal(np.asarray(g1._last_result.nit),
                                      np.asarray(g2._last_result.nit))
        np.testing.assert_array_equal(np.asarray(g1._last_result.status),
                                      np.asarray(g2._last_result.status))
        np.testing.assert_array_equal(np.asarray(g1._state.eta),
                                      np.asarray(g2._state.eta))
        h1, h2 = np.asarray(g1.history['ELBO']), np.asarray(g2.history['ELBO'])
        np.testing.assert_array_equal(h1, h2)

    def test_pathwise_fit(self, dataset):
        np.random.seed(10)
        g = VIPRSGrid(dataset, self._grid(dataset))
        g.fit(pathwise=True, max_iter=200)
        assert len(g.optim_results) == 4
        assert g.to_validation_table()['ELBO'].notna().all()

    def test_select_best_model_elbo(self, dataset):
        np.random.seed(11)
        g = VIPRSGrid(dataset, self._grid(dataset))
        g.fit(max_iter=200)
        elbos = np.asarray(g.elbo())
        best = int(np.argmax(np.where(g.valid_terminated_models, elbos, -np.inf)))
        select_best_model(g, criterion='ELBO')
        assert g.n_models == 1
        assert np.isclose(g.pi, g.grid_table.iloc[best]['pi'])
        for c, sz in g.shapes.items():
            assert g.var_gamma[c].shape == (sz,)

    def test_select_pseudo_validation(self, dataset):
        np.random.seed(12)
        g = VIPRSGrid(dataset, self._grid(dataset))
        g.split_gwas_sumstats(prop_train=0.8, seed=2)
        g.fit(max_iter=200)
        select_best_model(g, criterion='pseudo_validation')
        assert g.n_models == 1
        assert 'Pseudo_Validation_R2' in g.validation_result.columns

    def test_select_validation_criterion(self, tmp_path):
        """Simultaneous grid fit + selection on individual-level R^2 against a
        simulated validation BED (the reference's `validation` criterion,
        grid_utils.py:44-57). Regression test: posterior moments are deferred
        for S > 1 and must materialize lazily inside predict()."""
        import os
        import sys
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from plink_utils import write_plink_bed
        from viprs_tpu.data.loader import GWADataLoader
        import pandas as pd

        rng = np.random.default_rng(33)
        n, m = 900, 240
        n_train = 600
        maf = rng.uniform(0.15, 0.5, m)
        dosages = rng.binomial(2, maf, size=(n, m)).astype(np.float64)
        alleles = rng.choice(['A', 'C'], size=m)
        bim = pd.DataFrame({'CHR': 22, 'SNP': [f'rs{i}' for i in range(m)],
                            'CM': 0.0, 'POS': np.arange(1, m + 1) * 500,
                            'A1': alleles,
                            'A2': np.where(alleles == 'A', 'G', 'T')})
        beta = np.zeros(m)
        causal = rng.random(m) < 0.08
        beta[causal] = rng.standard_normal(causal.sum()) * 0.3
        x_std = (dosages - dosages.mean(0)) / np.maximum(dosages.std(0), 1e-9)
        y = x_std @ beta + rng.standard_normal(n)

        # GWAS + LD on the training half:
        xt, yt = x_std[:n_train], y[:n_train]
        yt_std = (yt - yt.mean()) / yt.std()
        std_beta = xt.T @ yt_std / n_train
        half = m // 2
        ld_blocks = {22: [xt[:, :half].T @ xt[:, :half] / n_train,
                          xt[:, half:].T @ xt[:, half:] / n_train]}
        snp_table = {22: bim[['CHR', 'SNP', 'POS', 'A1', 'A2']].copy()}
        ds = SummaryStatsDataset.from_dense_blocks(
            ld_blocks, {22: std_beta},
            {22: np.full(m, float(n_train))}, snp_table=snp_table,
            block_size=128)

        # validation BED + phenotype (held-out samples):
        fam = pd.DataFrame({'FID': [f'F{i}' for i in range(n - n_train)],
                            'IID': [f'I{i}' for i in range(n - n_train)],
                            'father': 0, 'mother': 0, 'sex': 1,
                            'PHENO': y[n_train:]})
        prefix = str(tmp_path / 'valid')
        write_plink_bed(prefix, dosages[n_train:], bim, fam)
        validation_gdl = GWADataLoader(bed_files=prefix)

        np.random.seed(14)
        g = VIPRSGrid(ds, HyperparameterGrid(pi_steps=4, n_snps=ds.m))
        g.fit(max_iter=200)
        # fit() must not materialize host moments for S > 1 (they pull lazily
        # through the property on first access):
        assert g._post_mean_beta is None
        select_best_model(g, validation_gdl=validation_gdl,
                          criterion='validation')
        assert g.n_models == 1
        scores = g.validation_result['Validation_R2'].values
        assert np.isfinite(scores).any()
        best = int(np.nanargmax(np.where(np.isfinite(scores), scores, -np.inf)))
        assert np.isclose(g.pi, g.grid_table.iloc[best]['pi'])
        # the selected model actually predicts on the held-out samples:
        prs = g.predict(test_gdl=validation_gdl)
        assert prs.shape == (n - n_train,)
        assert np.corrcoef(prs, y[n_train:])[0, 1] ** 2 > 0.02

    def test_bma(self, dataset):
        np.random.seed(13)
        g = VIPRSGrid(dataset, self._grid(dataset))
        g.fit(max_iter=200)
        bayesian_model_average(g)
        assert g.n_models == 1
        assert g.post_mean_beta is not None
        eta = np.concatenate([g.post_mean_beta[c] for c in g.chromosomes])
        assert np.all(np.isfinite(eta))


class TestLDPredInf:

    def test_fit(self, dataset, sim):
        m = LDPredInf(dataset, h2=0.35)
        m.fit()
        eta = np.concatenate([m.post_mean_beta[c] for c in m.chromosomes])
        bt = np.concatenate([sim['beta_true'][c] for c in m.chromosomes])
        assert np.corrcoef(eta, bt)[0, 1] > 0.3


class TestCheckpoint:

    def test_save_load_resume(self, dataset, tmp_path):
        np.random.seed(15)
        m = VIPRS(dataset)
        m.fit(max_iter=20)
        ckpt = str(tmp_path / 'state.npz')
        m.save_checkpoint(ckpt)

        np.random.seed(16)
        m2 = VIPRS(dataset)
        m2.initialize()
        m2.load_checkpoint(ckpt)
        for c in m.chromosomes:
            np.testing.assert_allclose(m2.eta[c], m.eta[c], atol=1e-7)
        # resume and keep optimizing:
        m2.fit(max_iter=100, continued=True)
        assert m2.history['ELBO'][-1] >= m.history['ELBO'][-1] - 1e-3  # f32 state noise
