"""Exhaustive decision-table tests for the kernel-dispatch policy
(viprs_tpu/model/_dispatch.py).

The hazard this guards (VERDICT r3 weak #1): a >=8-lane grid fit on a real
multi-chip TPU mesh must NOT route GSPMD-sharded state into
``pl.pallas_call`` — Pallas kernels have no SPMD partitioning rule. The
policy is a pure function, so the full (S, mesh, backend, override) table is
asserted here; the model drivers (VIPRS.fit incl. its compacted
re-decision, VIPRSMix._fit_fused, VIPRSMixGrid.fit) all route through it.
"""

import numpy as np
import pytest
import jax
from jax.sharding import Mesh

from viprs_tpu.model._dispatch import (
    select_sweep_impl, pallas_allowed, MIN_PALLAS_LANES, S1_HYBRID_DEFAULT)


@pytest.fixture(scope='module')
def dataset():
    from viprs_tpu.data.dataset import SummaryStatsDataset
    from viprs_tpu.data.simulate import simulate_sumstats_blocks
    sim = simulate_sumstats_blocks(n=2000, block_sizes=(100, 90), h2=0.3,
                                   prop_causal=0.05, seed=7)
    return SummaryStatsDataset.from_dense_blocks(
        sim['ld_blocks'], sim['std_beta'], sim['n_per_snp'], block_size=128)


def _mesh():
    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    return Mesh(devs, ('blocks', 'grid'))


BACKENDS_TPU = ['tpu', 'axon']
BACKENDS_OFF = ['cpu', 'gpu']


class TestDefaultPolicy:
    """sweep_impl=None — the measured policy with both guards."""

    @pytest.mark.parametrize('backend', BACKENDS_TPU)
    @pytest.mark.parametrize('S', [8, 16, 100])
    def test_wide_grid_on_tpu_no_mesh_uses_pallas(self, backend, S):
        assert select_sweep_impl(S, None, None, backend) == \
            (True, False, False)

    @pytest.mark.parametrize('backend', BACKENDS_TPU)
    @pytest.mark.parametrize('S', [2, 4, 7])
    def test_narrow_on_tpu_uses_xla(self, backend, S):
        assert select_sweep_impl(S, None, None, backend) == \
            (False, False, False)

    @pytest.mark.parametrize('backend', BACKENDS_TPU)
    def test_s1_on_tpu_uses_hybrid(self, backend):
        # round-5 measured policy: the single-model fit runs the
        # activity-gated hybrid dispatch on a meshless TPU backend.
        assert S1_HYBRID_DEFAULT
        assert select_sweep_impl(1, None, None, backend) == \
            (False, False, True)

    @pytest.mark.parametrize('backend', BACKENDS_TPU)
    @pytest.mark.parametrize('S', [1, 4, 8, 100])
    def test_any_width_under_mesh_uses_xla(self, backend, S):
        """The round-3 hole: S>=8 on TPU under a mesh MUST NOT pick Pallas."""
        assert select_sweep_impl(S, _mesh(), None, backend) == \
            (False, False, False)

    @pytest.mark.parametrize('backend', BACKENDS_OFF)
    @pytest.mark.parametrize('S', [1, 8, 100])
    @pytest.mark.parametrize('mesh', [None, 'mesh'])
    def test_off_tpu_always_xla(self, backend, S, mesh):
        m = _mesh() if mesh else None
        assert select_sweep_impl(S, m, None, backend) == \
            (False, False, False)

    @pytest.mark.parametrize('backend', BACKENDS_TPU)
    def test_min_lanes_1_single_model_pallas(self, backend):
        # VIPRSMix's S=1 fused path has no lane threshold:
        assert pallas_allowed(None, backend)
        assert not pallas_allowed(_mesh(), backend)

    def test_min_lanes_parameter(self):
        assert select_sweep_impl(1, None, None, 'tpu', min_lanes=1) == \
            (True, False, False)
        assert MIN_PALLAS_LANES == 8


class TestExplicitOverride:
    """sweep_impl='xla'|'skip'|'pallas' — explicit requests, hard errors."""

    @pytest.mark.parametrize('backend', BACKENDS_TPU + BACKENDS_OFF)
    @pytest.mark.parametrize('mesh', [None, 'mesh'])
    def test_xla_always_allowed(self, backend, mesh):
        m = _mesh() if mesh else None
        assert select_sweep_impl(100, m, 'xla', backend) == \
            (False, False, False)

    @pytest.mark.parametrize('backend', BACKENDS_TPU)
    def test_pallas_on_tpu_no_mesh(self, backend):
        assert select_sweep_impl(1, None, 'pallas', backend) == \
            (True, False, False)
        assert select_sweep_impl(1, None, 'skip', backend) == \
            (False, True, False)
        assert select_sweep_impl(1, None, 'hybrid', backend) == \
            (False, False, True)

    @pytest.mark.parametrize('backend', BACKENDS_TPU)
    @pytest.mark.parametrize('S', [2, 8, 100])
    def test_hybrid_requires_s1(self, backend, S):
        with pytest.raises(ValueError, match='S == 1'):
            select_sweep_impl(S, None, 'hybrid', backend)

    @pytest.mark.parametrize('backend', BACKENDS_OFF)
    def test_hybrid_off_tpu_raises(self, backend):
        with pytest.raises(ValueError, match='TPU'):
            select_sweep_impl(1, None, 'hybrid', backend)

    @pytest.mark.parametrize('backend', BACKENDS_TPU)
    def test_hybrid_under_mesh_raises(self, backend):
        with pytest.raises(ValueError, match='mesh'):
            select_sweep_impl(1, _mesh(), 'hybrid', backend)

    @pytest.mark.parametrize('impl', ['pallas', 'skip'])
    @pytest.mark.parametrize('backend', BACKENDS_OFF)
    def test_pallas_off_tpu_raises(self, impl, backend):
        with pytest.raises(ValueError, match='TPU'):
            select_sweep_impl(100, None, impl, backend)

    @pytest.mark.parametrize('impl', ['pallas', 'skip'])
    @pytest.mark.parametrize('backend', BACKENDS_TPU)
    def test_pallas_under_mesh_raises(self, impl, backend):
        with pytest.raises(ValueError, match='mesh'):
            select_sweep_impl(100, _mesh(), impl, backend)

    def test_unknown_impl_raises(self):
        with pytest.raises(ValueError, match='sweep_impl'):
            select_sweep_impl(8, None, 'cuda', 'tpu')


class TestDriverIntegration:
    """The model drivers actually consult the policy (not a re-derivation)."""

    def test_viprs_fit_rejects_pallas_under_mesh(self, dataset):
        from viprs_tpu.model import VIPRS
        m = VIPRS(dataset)          # mesh='auto' -> 8-device CPU mesh
        assert m.mesh is not None
        with pytest.raises(ValueError, match='mesh|TPU'):
            m.fit(max_iter=2, sweep_impl='pallas')

    def test_viprs_fit_mesh_off_cpu_rejects_pallas(self, dataset):
        from viprs_tpu.model import VIPRS
        m = VIPRS(dataset, mesh='off')
        with pytest.raises(ValueError, match='TPU'):
            m.fit(max_iter=2, sweep_impl='skip')


class TestMixGridDriverIntegration:

    def test_mix_grid_rejects_pallas_off_tpu(self, dataset):
        import pandas as pd
        from viprs_tpu.model import VIPRSMixGrid
        from viprs_tpu.gridsearch import HyperparameterGrid
        grid = HyperparameterGrid(pi_grid=np.array([0.01, 0.05]),
                                  n_snps=dataset.m)
        g = VIPRSMixGrid(dataset, grid, K=2, mesh='off')
        with pytest.raises(ValueError, match='TPU'):
            g.fit(max_iter=2, sweep_impl='skip')
        with pytest.raises(ValueError, match='sweep_impl'):
            g.fit(max_iter=2, sweep_impl='bogus')
        # explicit 'xla' always works:
        g.fit(max_iter=5, sweep_impl='xla')
        assert len(g.optim_results) == 2
