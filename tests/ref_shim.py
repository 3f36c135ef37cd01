"""Run the REFERENCE's actual Python model layer (/root/reference/viprs)
inside this environment, head-to-head against viprs_tpu.

The reference package needs two things this environment lacks:

1. ``magenpy`` (its data layer) — replaced by a minimal in-memory shim
   exposing exactly the surface ``VIPRS.fit`` consumes (SURVEY.md §2.6,
   use-sites ``viprs/model/VIPRS.py:147-207, 284-292``,
   ``viprs/model/BayesPRSModel.py:118-142``): a ``GWADataLoader`` stand-in
   with ``shapes``/``m``/``sumstats_table``/``get_ld_matrices()``, an
   ``LDMatrix`` stand-in with banded ``load()`` semantics, ``is_numeric``
   and ``simple_ldsc``.
2. the compiled Cython bridge ``viprs.model.vi.e_step_cpp`` — replaced by a
   ctypes module over the reference's OWN C++ kernels (``e_step.hpp``),
   compiled from the read-only mount by tests/golden_kernel.py. The kernel
   code executed in the head-to-head is therefore the reference's, not a
   transcription.

Nothing from the reference is copied; its package is imported in place from
/root/reference with ``sys.modules`` injection for the two shims above.
"""

import sys
import types

import numpy as np

import golden_kernel

REF_ROOT = '/root/reference'


# --------------------------------------------------------------------------
# magenpy shim
# --------------------------------------------------------------------------

class ShimLDLinearOperator:
    """What ``LDMatrix.load(return_symmetric, dtype)`` returns: the banded
    CSR-like triplet the reference copies into VIPRS (VIPRS.py:167-172)."""

    def __init__(self, ld_data, ld_indptr, leftmost_idx):
        self.ld_data = ld_data
        self.ld_indptr = ld_indptr
        self.leftmost_idx = leftmost_idx


class ShimLDMatrix:
    """In-memory stand-in for magenpy's Zarr-backed LDMatrix.

    Built from a dense block-diagonal LD matrix; ``load`` produces the
    symmetric (full rows incl. diagonal) or upper-triangular (low_memory)
    banded layout, matching magenpy's ``load(return_symmetric=...)``.
    """

    def __init__(self, R_dense):
        self.R = np.asarray(R_dense, dtype=np.float64)
        self.stored_dtype = np.float64
        self.n_snps = self.R.shape[0]

    def load(self, return_symmetric=True, dtype='float32'):
        data, indptr, left = golden_kernel.dense_to_banded(
            self.R, triangular=not return_symmetric, dtype=np.dtype(dtype))
        return ShimLDLinearOperator(data, indptr, left.astype(np.int32))

    def get_lambda_min(self, min_max_ratio=1e-3):
        evals = np.linalg.eigvalsh(self.R)
        lam = float(evals.min())
        return max(0.0, -lam)

    def ld_scores(self):
        return (self.R ** 2).sum(axis=1)

    def dot(self, beta):
        """LDMatrix.dot (use-sites pseudo_metrics.py:64, BayesPRSModel:404)."""
        return self.R @ np.asarray(beta)

    def release(self):
        pass


class ShimSumstats:
    def __init__(self, std_beta, n_per_snp):
        self._std_beta = np.asarray(std_beta, dtype=np.float64)
        self.n_per_snp = np.asarray(n_per_snp, dtype=np.float64)

    def get_snp_pseudo_corr(self):
        return self._std_beta


class ShimGWADataLoader:
    """Duck-typed magenpy.GWADataLoader carrying in-memory synthetic data."""

    def __init__(self, ld_blocks, std_beta, n_per_snp, snp_tables=None):
        """ld_blocks: {chrom: [dense blocks]}; std_beta/n_per_snp: {chrom: (M,)};
        snp_tables: optional {chrom: DataFrame[SNP, A1, A2]} variant metadata
        (synthesized deterministically when absent)."""
        import pandas as pd
        from scipy.linalg import block_diag
        self.ld = {c: ShimLDMatrix(block_diag(*blocks))
                   for c, blocks in ld_blocks.items()}
        self.sumstats_table = {c: ShimSumstats(std_beta[c], n_per_snp[c])
                               for c in std_beta}
        self.shapes = {c: len(std_beta[c]) for c in std_beta}
        self.genotype = None
        self.sample_table = None
        self.phenotype_likelihood = None
        if snp_tables is None:
            # matches SummaryStatsDataset.default_snp_table so head-to-head
            # tables merge on identical variant ids:
            snp_tables = {
                c: pd.DataFrame({
                    'CHR': c,
                    'SNP': [f'rs_{c}_{i}' for i in range(len(std_beta[c]))],
                    'A1': 'A', 'A2': 'G'})
                for c in std_beta}
        self.snp_tables = snp_tables

    def to_snp_table(self, col_subset=None, per_chromosome=False):
        """Consumed by BayesPRSModel.to_table (BayesPRSModel.py:345)."""
        import pandas as pd
        out = {}
        for c, tab in self.snp_tables.items():
            t = tab.copy()
            t['CHR'] = c
            if col_subset is not None:
                t = t[[cc for cc in col_subset if cc in t.columns]]
            out[c] = t
        if per_chromosome:
            return out
        return pd.concat(list(out.values()), ignore_index=True)

    def to_summary_statistics_table(self, col_subset=None,
                                    per_chromosome=False):
        """Consumed by pseudo_metrics._match_variant_stats
        (pseudo_metrics.py:31-33)."""
        import pandas as pd
        out = {}
        for c, ss in self.sumstats_table.items():
            t = self.snp_tables[c].copy()
            t['CHR'] = c
            t['STD_BETA'] = ss.get_snp_pseudo_corr()
            if col_subset is not None:
                t = t[[cc for cc in col_subset if cc in t.columns]]
            out[c] = t
        if per_chromosome:
            return out
        return pd.concat(list(out.values()), ignore_index=True)

    @property
    def m(self):
        return sum(self.shapes.values())

    @property
    def n(self):
        return int(max(float(ss.n_per_snp.max())
                       for ss in self.sumstats_table.values()))

    @property
    def chromosomes(self):
        return sorted(self.shapes.keys())

    def get_ld_matrices(self):
        return self.ld


def _shim_is_numeric(obj):
    return np.issubdtype(type(obj) if np.isscalar(obj)
                         else np.asarray(obj).dtype, np.number)


def _shim_simple_ldsc(gdl):
    """Method-of-moments h2 (the magenpy estimator the reference calls at
    VIPRS.py:284-292): E[chi2] = 1 + n h2 l / M, solved for h2. Uses the
    identical chi2 recovery as viprs_tpu/data/ldsc.py so the two frameworks
    initialize from the same estimate when their LD scores agree."""
    ld_scores = np.concatenate([gdl.ld[c].ld_scores() for c in sorted(gdl.ld)])
    std_beta = np.concatenate([gdl.sumstats_table[c].get_snp_pseudo_corr()
                               for c in sorted(gdl.sumstats_table)])
    n = np.concatenate([gdl.sumstats_table[c].n_per_snp
                        for c in sorted(gdl.sumstats_table)])
    r2 = np.clip(std_beta.astype(np.float64) ** 2, 0.0, 1.0 - 1e-12)
    chi2 = n * r2 / (1.0 - r2)
    m = len(std_beta)
    return float(m * (np.mean(chi2) - 1.0) / (np.mean(n) * np.mean(ld_scores)))


def _install_magenpy_shim():
    mg = types.ModuleType('magenpy')
    mg.GWADataLoader = ShimGWADataLoader
    mg.__version__ = '0.1.5-shim'

    utils = types.ModuleType('magenpy.utils')
    cu = types.ModuleType('magenpy.utils.compute_utils')
    cu.is_numeric = _shim_is_numeric
    mu_ = types.ModuleType('magenpy.utils.model_utils')

    # This framework's own allele-aware merge stands in for magenpy's —
    # running the reference's harmonization/pseudo-validation through it is
    # itself a head-to-head check of the transcription
    # (viprs_tpu/data/harmonize.py vs magenpy.utils.model_utils):
    from viprs_tpu.data.harmonize import merge_snp_tables as _our_merge
    mu_.merge_snp_tables = _our_merge

    def _not_needed(*a, **k):
        raise NotImplementedError(
            "magenpy shim: PUMAS splitting is dataset-layout-specific here")
    mu_.sumstats_train_test_split = _not_needed

    stats = types.ModuleType('magenpy.stats')
    h2m = types.ModuleType('magenpy.stats.h2')
    ldsc = types.ModuleType('magenpy.stats.h2.ldsc')
    ldsc.simple_ldsc = _shim_simple_ldsc

    utils.compute_utils = cu
    utils.model_utils = mu_
    mg.utils = utils
    stats.h2 = h2m
    h2m.ldsc = ldsc
    mg.stats = stats

    sys.modules['magenpy'] = mg
    sys.modules['magenpy.utils'] = utils
    sys.modules['magenpy.utils.compute_utils'] = cu
    sys.modules['magenpy.utils.model_utils'] = mu_
    sys.modules['magenpy.stats'] = stats
    sys.modules['magenpy.stats.h2'] = h2m
    sys.modules['magenpy.stats.h2.ldsc'] = ldsc


def _install_statsmodels_shim():
    """statsmodels is absent from this environment; the reference's eval
    layer only touches sm.add_constant / OLS / Logit / Probit with
    .fit().{llf, rsquared, predict(), resid} — map those onto this
    framework's native GLM (viprs_tpu/eval/glm.py), so the reference's
    metric FORMULAS (pseudo-R2s, liability family, incremental R2) run
    head-to-head."""
    if 'statsmodels.api' in sys.modules:
        return
    try:
        import statsmodels.api  # noqa: F401 — real package present
        return
    except ImportError:
        pass
    import numpy as _np
    import pandas as _pd
    from viprs_tpu.eval import glm as _glm

    def add_constant(x):
        df = _pd.DataFrame(x).copy()
        df.insert(0, 'const', 1.0)
        return df

    class _Model:
        family = 'gaussian'
        link = None

        def __init__(self, y, x):
            self.y = _np.asarray(y, dtype=float)
            self.x = _np.asarray(x, dtype=float)

        def fit(self, disp=0):
            if self.family == 'gaussian':
                return _glm.fit_ols(self.y, self.x, add_intercept=False)
            return _glm.fit_binomial(self.y, self.x, link=self.link,
                                     add_intercept=False)

    class OLS(_Model):
        family = 'gaussian'

    class Logit(_Model):
        family, link = 'binomial', 'logit'

    class Probit(_Model):
        family, link = 'binomial', 'probit'

    api = types.ModuleType('statsmodels.api')
    api.add_constant = add_constant
    api.OLS, api.Logit, api.Probit = OLS, Logit, Probit
    root = types.ModuleType('statsmodels')
    root.api = api
    sys.modules['statsmodels'] = root
    sys.modules['statsmodels.api'] = api


# --------------------------------------------------------------------------
# e_step_cpp shim: ctypes over the reference's own compiled kernels
# --------------------------------------------------------------------------

def _install_e_step_cpp_shim():
    lib = golden_kernel.build_ref_kernel()
    mod = types.ModuleType('viprs.model.vi.e_step_cpp')

    def cpp_e_step(ld_left_bound, ld_indptr, ld_data, std_beta, var_gamma,
                   var_mu, eta, q, eta_diff, u_logs, sqrt_half_var_tau,
                   mu_mult, dq_scale, threads, low_memory):
        m = len(std_beta)
        left = np.ascontiguousarray(ld_left_bound, dtype=np.int32)
        indptr = np.ascontiguousarray(ld_indptr, dtype=np.int64)
        if std_beta.dtype == np.float32:
            fn = lib.ref_e_step_f32
            assert ld_data.dtype == np.float32, (
                "e_step_cpp shim: float32 state requires float32 LD")
        else:
            fn = lib.ref_e_step_i8 if ld_data.dtype == np.int8 \
                else lib.ref_e_step_f64
        fn(m, left, indptr, ld_data, std_beta, var_gamma, var_mu, eta, q,
           eta_diff, u_logs, sqrt_half_var_tau, mu_mult, dq_scale,
           int(threads), bool(low_memory))

    def cpp_e_step_mixture(ld_left_bound, ld_indptr, ld_data, std_beta,
                           var_gamma, var_mu, eta, q, eta_diff, log_null_pi,
                           u_logs, sqrt_half_var_tau, mu_mult, dq_scale,
                           threads, low_memory):
        m, K = var_mu.shape
        left = np.ascontiguousarray(ld_left_bound, dtype=np.int32)
        indptr = np.ascontiguousarray(ld_indptr, dtype=np.int64)
        fn = lib.ref_e_step_mixture_f32 if std_beta.dtype == np.float32 \
            else lib.ref_e_step_mixture_f64
        fn(m, K, left, indptr, ld_data, std_beta, var_gamma, var_mu, eta, q,
           eta_diff, log_null_pi, u_logs, sqrt_half_var_tau, mu_mult,
           dq_scale, int(threads), bool(low_memory))

    def cpp_e_step_grid(ld_left_bound, ld_indptr, ld_data, std_beta,
                        var_gamma, var_mu, eta, q, eta_diff, u_logs,
                        half_var_tau, mu_mult, dq_scale, active_model_idx,
                        threads, low_memory):
        m = var_mu.shape[0]
        left = np.ascontiguousarray(ld_left_bound, dtype=np.int32)
        indptr = np.ascontiguousarray(ld_indptr, dtype=np.int64)
        idx = np.ascontiguousarray(active_model_idx, dtype=np.int32)
        assert std_beta.dtype == np.float64, (
            "e_step_cpp shim: the grid kernel is compiled for float64 only")
        # (M, S) F-order == (S, M) C-order transpose; the ctypes signature
        # takes C-contiguous buffers, so pass the raveled F-order memory:
        lib.ref_e_step_grid_f64(
            m, len(idx), idx, left, indptr, ld_data, std_beta,
            np.reshape(var_gamma, -1, order='F'),
            np.reshape(var_mu, -1, order='F'),
            np.reshape(eta, -1, order='F'),
            np.reshape(q, -1, order='F'),
            np.reshape(eta_diff, -1, order='F'),
            np.reshape(u_logs, -1, order='F'),
            np.reshape(half_var_tau, -1, order='F'),
            np.reshape(mu_mult, -1, order='F'),
            dq_scale, int(threads), bool(low_memory))

    mod.cpp_e_step = cpp_e_step
    mod.cpp_e_step_mixture = cpp_e_step_mixture
    mod.cpp_e_step_grid = cpp_e_step_grid
    mod.check_blas_support = lambda: False
    mod.check_omp_support = lambda: False
    sys.modules['viprs.model.vi.e_step_cpp'] = mod


_ref_viprs = None


def load_reference_viprs():
    """Import the reference's viprs package (idempotent). Returns the module."""
    global _ref_viprs
    if _ref_viprs is not None:
        return _ref_viprs
    _install_magenpy_shim()
    _install_statsmodels_shim()
    _install_e_step_cpp_shim()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import viprs as ref_viprs  # noqa: E402
    assert ref_viprs.__file__.startswith(REF_ROOT), (
        f"imported the wrong viprs: {ref_viprs.__file__}")
    _ref_viprs = ref_viprs
    return ref_viprs


def make_ref_gdl(sim):
    """ShimGWADataLoader from a simulate_sumstats_blocks() dict."""
    return ShimGWADataLoader(sim['ld_blocks'], sim['std_beta'],
                             sim['n_per_snp'])
