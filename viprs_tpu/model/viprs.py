"""VIPRS — spike-and-slab variational PRS model, TPU-native.

Functional parity with the reference's viprs/model/VIPRS.py (initialization from
LDSC, the CAVI E-step, closed-form M-step, ELBO, the convergence/sanity ladder,
restart-on-negative-MSE), re-architected so that the entire EM loop runs fused on
device (ops/em_loop.py) with the model axis S >= 1 (S=1 here; the grid subclass
sets S = number of hyperparameter settings).

Differences from the reference, by design:
- no ``threads`` semantics: parallelism is the blocked update schedule itself
  (deterministic); the oscillation backoff becomes damping escalation in-graph;
- ``low_memory`` / ``dequantize_on_the_fly`` are dataset-level choices (pack the
  LD with ``quantize=True``); the arguments are accepted for API compatibility;
- per-iteration hyperparameter tracking (``tracked_params``) and live progress
  reporting run the SAME fused loop in bounded chunks (the convergence-ladder
  counters carry across chunk boundaries), so every mode shares one optimizer
  with identical behavior.
"""

import logging

import numpy as np
import jax
import jax.numpy as jnp

from . import _dispatch
from .base import BayesPRSModel
from ..ops.cavi_jax import CaviState, Hyper, compute_q
from ..ops import updates, em_loop
from ..ops.updates import FixMask
from ..utils import optimize as opt
from ..utils.optimize import OptimizeResult

logger = logging.getLogger(__name__)

F32 = jnp.float32
F64 = jnp.float64


def _logit(p):
    return np.log(p) - np.log1p(-p)


@jax.jit
def _restart_state_jit(state, restart_mask, fresh_logits):
    """Reset the masked lanes' variational state (restart-on-negative-MSE) in
    one fused dispatch. fresh_logits: (S,) f32 logit(pi) per lane."""
    mask = restart_mask[:, None, None]
    fresh = fresh_logits[:, None, None]
    zero = jnp.zeros((), jnp.float32)
    return CaviState(
        logits=jnp.where(mask, fresh, state.logits),
        mu=jnp.where(mask, zero, state.mu),
        eta=jnp.where(mask, zero, state.eta),
        q=jnp.where(mask, zero, state.q))


@jax.jit
def _posterior_moments_jit(state, n_flat, hyper32):
    """(pip, posterior mean, posterior variance) in one device dispatch."""
    var_tau = updates.compute_var_tau(n_flat, hyper32)
    zeta = updates.compute_zeta(state, var_tau)
    eta = state.eta
    return state.gamma, eta, zeta - eta * eta


@jax.jit
def _elbo_jit(state, n_flat, std_beta_flat, mask, hyper32, fix_sigma_eps,
              sigma_g, n_sample, m_total):
    """Full ELBO from raw state in one device dispatch (the eager path pays
    ~15 accelerator round trips for the same arithmetic)."""
    var_tau = updates.compute_var_tau(n_flat, hyper32)
    stats = updates.collect_stats(state, var_tau, std_beta_flat, mask)
    return updates.elbo(stats, hyper32, fix_sigma_eps, sigma_g,
                        n_sample, m_total)


class VIPRS(BayesPRSModel):

    def __init__(self,
                 dataset,
                 fix_params=None,
                 tracked_params=None,
                 lambda_min=None,
                 float_precision='float32',
                 order='F',
                 low_memory=True,
                 dequantize_on_the_fly=False,
                 threads=1,
                 tile=128,
                 mesh='auto'):
        """
        :param dataset: SummaryStatsDataset (or GWADataLoader) with blocked LD.
        :param fix_params: dict pinning hyperparameters out of the M-step
            (keys: 'pi', 'tau_beta', 'sigma_epsilon', 'lambda_min').
        :param tracked_params: list of quantities to record per iteration
            ('pi', 'heritability', 'sigma_epsilon', 'tau_beta', 'sigma_g',
            'max_eta_diff', 'entropy', 'loglikelihood', 'log_prior', 'mse',
            or callables taking the model).
        :param lambda_min: None (0), a number, or 'infer' (min-eigenvalue
            regularizer estimated from the LD blocks).
        :param order, low_memory, dequantize_on_the_fly, threads: accepted for
            reference-API compatibility; see module docstring.
        :param tile: CAVI tile width (multiple of 128 on TPU).
        :param mesh: multi-device placement — ``'auto'`` (default: shard LD
            blocks over all visible devices when there is more than one),
            ``'off'``/``None`` (single device), an explicit ``'<NB>x<NG>'``
            axis-size string, or a ('blocks', 'grid') jax Mesh. The TPU-native
            replacement for the reference CLI's ``--n-jobs`` process fan-out
            (bin/viprs_fit:1079-1086); M-step/ELBO reductions become psums
            over ICI inserted by GSPMD.
        """
        super().__init__(dataset, float_precision=float_precision)

        self.fix_params = dict(fix_params or {})
        self.tracked_params = tracked_params or []
        self.tile = tile
        self.threads = threads  # compatibility only

        from ..parallel.mesh import resolve_mesh
        self.mesh = resolve_mesh(mesh)
        # The (possibly NB-padded, block-sharded) device LD this model computes
        # against; dataset.ld stays the canonical single-device operator.
        self._ld = self.dataset.ld_for_mesh(self.mesh)

        # lambda_min resolution (reference VIPRS.py:174-191):
        if lambda_min is None:
            self.lambda_min = 0.0
        elif isinstance(lambda_min, str) and lambda_min == 'infer':
            self.lambda_min = self.infer_lambda_min()
        else:
            self.lambda_min = float(lambda_min)

        # --- device-side state (model axis S; 1 for the base model) ---
        self._S = 1
        self._state = None          # CaviState
        self._hyper = None          # Hyper, float64 numpy (S,)
        self._sigma_g = np.zeros(self._S)
        self._fix_mask = None       # FixMask bools (S,)

        self.optim_result = OptimizeResult()
        self.history = {}

        # flat device inputs:
        self._std_beta_flat = None
        self._n_flat = None
        self._refresh_inputs()

    # ------------------------------------------------------------------ inputs
    def _refresh_inputs(self):
        """(Re)build the flat device inputs from the current std_beta/n_per_snp
        dicts (these change under PUMAS splitting). With a mesh, inputs are
        padded to the sharded LD's NB and block-sharded alongside it.

        When the model's input dicts are untouched views of the dataset's
        (the common case — no PUMAS split, no manual edits), the device
        arrays come from the dataset's shared cache: fresh models pay no
        re-upload (~9 MB / ~0.1 s per fit on the tunnel transport)."""
        if self._inputs_are_dataset_views():
            self._std_beta_flat, self._n_flat = \
                self.dataset.device_inputs(self.mesh)
            return
        lay = self.dataset.layout
        sb = jnp.asarray(
            lay.to_flat(self.std_beta).reshape(lay.nb, lay.block_size), F32)
        nf = jnp.asarray(
            lay.to_flat(self.n_per_snp).reshape(lay.nb, lay.block_size), F32)
        if self.mesh is not None:
            from ..parallel.mesh import shard_flat
            sb = shard_flat(self.mesh, sb, self._ld.nb)
            nf = shard_flat(self.mesh, nf, self._ld.nb)
        self._std_beta_flat = sb
        self._n_flat = nf

    def _inputs_are_dataset_views(self):
        """True when std_beta/n_per_snp alias the dataset's own arrays
        (np.asarray(x, float64) in the base constructor is a no-copy
        passthrough for float64 input — but may return a new VIEW object,
        e.g. for unpickled arrays whose buffer is a base object, so compare
        the underlying memory, not object identity)."""
        def same_buffer(a, b):
            a, b = np.asarray(a), np.asarray(b)
            return (a.dtype == b.dtype and a.shape == b.shape
                    and a.strides == b.strides
                    and a.__array_interface__['data'][0]
                    == b.__array_interface__['data'][0])
        ds = self.dataset
        try:
            return (self.validation_std_beta is None
                    and all(same_buffer(self.std_beta[c], ds.std_beta[c])
                            for c in ds.std_beta)
                    and all(same_buffer(self.n_per_snp[c], ds.n_per_snp[c])
                            for c in ds.n_per_snp))
        except (KeyError, TypeError):
            return False

    def infer_lambda_min(self):
        """Spectral regularizer: |min(0, smallest eigenvalue over LD blocks)|.

        The analog of LDMatrix.get_lambda_min (use-site VIPRS.py:191).
        """
        ld = self.dataset.ld
        diag = np.asarray(ld.diag, dtype=np.float64) * ld.scale
        min_eig = 0.0
        if ld.n_off == 0:
            for b in range(ld.nb):
                w = np.linalg.eigvalsh(diag[b])
                min_eig = min(min_eig, float(w[0]))
        else:
            # coupled tiles: Gershgorin-style lower bound per row
            off = np.asarray(ld.off_data, dtype=np.float64) * ld.scale
            src_i = np.asarray(ld.off_src)
            dst_i = np.asarray(ld.off_dst)
            row_abs = np.abs(diag).sum(axis=2) \
                - np.abs(np.diagonal(diag, axis1=1, axis2=2))
            for o in range(ld.n_off):
                row_abs[src_i[o]] += np.abs(off[o]).sum(axis=1)
                row_abs[dst_i[o]] += np.abs(off[o]).sum(axis=0)
            min_eig = min(0.0, float((1.0 - row_abs).min()))
        return abs(min(0.0, min_eig))

    # -------------------------------------------------------------- dict views
    def _dict_view(self, flat_sx):
        """(S, NB, B) device array -> {chrom: (m_c,) or (m_c, S) numpy}."""
        lay = self.dataset.layout
        arr = np.asarray(flat_sx)
        S = arr.shape[0]
        per_model = [lay.from_flat(arr[s].reshape(-1)) for s in range(S)]
        out = {}
        for c in self.chromosomes:
            if S == 1:
                out[c] = per_model[0][c]
            else:
                out[c] = np.stack([pm[c] for pm in per_model], axis=1)
        return out

    @property
    def var_gamma(self):
        return self._dict_view(np.asarray(self._state.gamma))

    @property
    def var_mu(self):
        return self._dict_view(self._state.mu)

    @property
    def var_tau(self):
        vt = updates.compute_var_tau(self._n_flat, self._hyper_f32())
        return self._dict_view(vt)

    @property
    def eta(self):
        return self._dict_view(self._state.eta)

    @property
    def zeta(self):
        vt = updates.compute_var_tau(self._n_flat, self._hyper_f32())
        return self._dict_view(updates.compute_zeta(self._state, vt))

    @property
    def q(self):
        return self._dict_view(self._state.q)

    def q_dict(self):
        return self.q

    # ------------------------------------------------------------- hyper access
    def _hyper_f32(self):
        return Hyper(*(jnp.asarray(np.atleast_1d(x), F32) for x in self._hyper))

    def _scalar(self, arr):
        a = np.atleast_1d(np.asarray(arr))
        return float(a[0]) if (self._S == 1 and a.size == 1) else a

    @property
    def pi(self):
        return self._scalar(self._hyper.pi)

    @property
    def sigma_epsilon(self):
        return self._scalar(self._hyper.sigma_eps)

    @property
    def tau_beta(self):
        return self._scalar(self._hyper.tau_beta)

    @property
    def sigma_g(self):
        return self._scalar(self._sigma_g)

    def get_sigma_epsilon(self):
        return self.sigma_epsilon

    def get_tau_beta(self, chrom=None):
        return self.tau_beta

    def get_pi(self, chrom=None):
        return self.pi

    def get_null_pi(self, chrom=None):
        pi = self.get_pi(chrom)
        return 1.0 - pi

    def get_proportion_causal(self):
        return self.pi

    def get_average_effect_size_variance(self):
        return np.sum(np.atleast_1d(self._hyper.pi) / np.atleast_1d(self._hyper.tau_beta)) \
            if self._S == 1 else np.atleast_1d(self._hyper.pi) / np.atleast_1d(self._hyper.tau_beta)

    def get_heritability(self):
        sg = np.atleast_1d(self._sigma_g)
        se = np.atleast_1d(self._hyper.sigma_eps)
        return self._scalar(sg / (sg + se))

    # ------------------------------------------------------------ initialization
    def set_fixed_params(self, fix_params):
        """Pin hyperparameters (reference VIPRS.py:361-379)."""
        assert isinstance(fix_params, dict)
        self.fix_params.update(fix_params)
        if self._hyper is not None:
            h = {f: np.atleast_1d(np.asarray(getattr(self._hyper, f), dtype=np.float64)).copy()
                 for f in self._hyper._fields}
            key_map = {'sigma_epsilon': 'sigma_eps', 'tau_beta': 'tau_beta',
                       'pi': 'pi', 'lambda_min': 'lambda_min'}
            for key, val in fix_params.items():
                if key in key_map:
                    h[key_map[key]][:] = val
            self._hyper = Hyper(**h)
            if 'lambda_min' in fix_params:
                self.lambda_min = float(fix_params['lambda_min'])
            self._update_fix_mask()

    def _update_fix_mask(self):
        S = self._S
        # host numpy, NOT device arrays: the driver reads these masks every
        # chunk (restart gating) and each read of a device array blocks on
        # the device queue — measured 50 ms/fit on the axon tunnel
        # (benchmarks/trace_syncs). em_fit converts at dispatch.
        self._fix_mask = FixMask(
            sigma_eps=np.full(S, 'sigma_epsilon' in self.fix_params, bool),
            tau_beta=np.full(S, 'tau_beta' in self.fix_params, bool),
            pi=np.full(S, 'pi' in self.fix_params, bool))

    def initialize(self, theta_0=None, param_0=None):
        logger.debug("> Initializing model parameters")
        self.initialize_theta(theta_0)
        self.initialize_variational_parameters(param_0)
        self.init_optim_meta()

    def init_optim_meta(self):
        self.history = {'ELBO': []}
        for tt in self.tracked_params:
            self.history[tt if isinstance(tt, str) else tt.__name__] = []
        self.optim_result.reset()

    def _resolve_theta0(self, theta_0):
        """Reference initialization logic (VIPRS.py:245-316): returns scalars
        (pi, sigma_eps, tau_beta)."""
        theta_0 = dict(theta_0 or {})
        theta_0.update(self.fix_params)

        m = self.n_snps
        if 'pi' in theta_0:
            pi = float(theta_0['pi'])
        else:
            pi = float(np.random.uniform(low=max(10.0 / m, 1e-5),
                                         high=min(0.2, 1e4 / m)))

        if 'sigma_epsilon' not in theta_0:
            if 'tau_beta' not in theta_0:
                try:
                    from ..data.ldsc import simple_ldsc
                    naive_h2g = float(np.clip(simple_ldsc(self.dataset), 0.01, 0.99))
                except Exception as e:
                    logger.debug(e)
                    naive_h2g = float(np.random.uniform(0.01, 0.1))
                sigma_eps = 1.0 - naive_h2g
                tau_beta = pi * m / max(naive_h2g, 0.01)
            else:
                tau_beta = float(theta_0['tau_beta'])
                sigma_eps = float(np.clip(1.0 - (pi * m / tau_beta), 1e-4, 1.0 - 1e-4))
        else:
            sigma_eps = float(theta_0['sigma_epsilon'])
            if 'tau_beta' in theta_0:
                tau_beta = float(theta_0['tau_beta'])
            else:
                tau_beta = (pi * m) / max(0.01, 1.0 - sigma_eps)

        return pi, sigma_eps, tau_beta

    def initialize_theta(self, theta_0=None):
        pi, sigma_eps, tau_beta = self._resolve_theta0(theta_0)
        lam = float(self.fix_params.get('lambda_min', self.lambda_min))
        S = self._S
        self._hyper = Hyper(
            sigma_eps=np.full(S, sigma_eps), tau_beta=np.full(S, tau_beta),
            pi=np.full(S, pi), lambda_min=np.full(S, lam))
        self._sigma_g = np.zeros(S)
        self._update_fix_mask()

    def initialize_variational_parameters(self, param_0=None):
        param_0 = param_0 or {}
        lay = self.dataset.layout
        nb, B = lay.nb, lay.block_size
        S = self._S

        # Build the state on device (broadcasting per-model scalars) — host
        # materialization + transfer costs ~1s/40MB on the tunnel transport.
        if 'gamma' in param_0:
            g = np.clip(lay.to_flat(param_0['gamma']), 1e-8, 1 - 1e-8)
            logits_j = jnp.broadcast_to(
                jnp.asarray(_logit(g).reshape(1, nb, B), jnp.float32),
                (S, nb, B))
        else:
            pi_ = np.atleast_1d(np.asarray(self._hyper.pi, dtype=np.float64))
            if len(pi_) < S:
                pi_ = np.repeat(pi_, S)[:S]
            logits_j = jnp.broadcast_to(
                jnp.asarray(_logit(pi_), jnp.float32)[:, None, None],
                (S, nb, B))

        if 'mu' in param_0:
            mu_j = jnp.broadcast_to(
                jnp.asarray(lay.to_flat(param_0['mu']).reshape(1, nb, B),
                            jnp.float32), (S, nb, B))
        else:
            mu_j = jnp.zeros((S, nb, B), F32)

        if self.mesh is not None:
            # pad the NB axis to the sharded LD's width and place the state
            # with ('grid', 'blocks') sharding before any device compute
            # (padding lanes carry mask=0 and contribute nothing). The model
            # axis shards over 'grid' only when it divides evenly; otherwise
            # it is replicated (e.g. the S=1 post-selection refit on a 2D
            # mesh) and only the blocks axis partitions the work:
            from ..parallel.mesh import _pad_axis
            from jax.sharding import NamedSharding, PartitionSpec as P
            nb = self._ld.nb
            g_ax = self.mesh.shape['grid']
            s_spec = 'grid' if (g_ax > 1 and S % g_ax == 0) else None
            sh = NamedSharding(self.mesh, P(s_spec, 'blocks', None))
            logits_j = jax.device_put(_pad_axis(logits_j, 1, nb), sh)
            mu_j = jax.device_put(_pad_axis(mu_j, 1, nb), sh)

        if 'mu' in param_0 or 'gamma' in param_0:
            eta = jax.nn.sigmoid(logits_j) * mu_j * self._ld.mask[None]
            q = compute_q(self._ld, eta)
        else:
            eta = jnp.zeros_like(mu_j)
            q = jnp.zeros_like(mu_j)

        self._state = CaviState(logits=logits_j, mu=mu_j, eta=eta, q=q)

    # ------------------------------------------------------- manual EM stepping
    # (reference API surface: VIPRS.e_step / m_step / update_* let users and
    # subclasses drive EM manually, VIPRS.py:381-495. fit() does NOT go through
    # these — it runs the fused on-device loop — but the semantics match.)
    def e_step(self):
        """One CAVI e-step sweep over all variants (VIPRS.py:381-424)."""
        from ..ops.cavi_jax import cavi_sweep
        self._state, self._last_eta_diff = cavi_sweep(
            self._ld, self._state, self._std_beta_flat, self._n_flat,
            self._hyper_f32(), jnp.ones(self._S), tile=self.tile)
        return self

    def _m_step_stats(self):
        h32 = self._hyper_f32()
        var_tau = updates.compute_var_tau(self._n_flat, h32)
        return updates.collect_stats(self._state, var_tau,
                                     self._std_beta_flat, self._ld.mask)

    def m_step(self):
        """Closed-form hyperparameter updates (VIPRS.py:473-484), honoring
        ``fix_params``."""
        stats = self._m_step_stats()
        hyper64 = Hyper(*(jnp.asarray(np.atleast_1d(x), F64)
                          for x in self._hyper))
        new_hyper, sigma_g = updates.m_step(stats, hyper64, self._fix_mask,
                                            float(self.m),
                                            jnp.ones(self._S, bool))
        self._hyper = Hyper(*(np.asarray(x, dtype=np.float64)
                              for x in new_hyper))
        self._sigma_g = np.asarray(sigma_g, dtype=np.float64)
        return self

    def _set_unfixed(self, name, value):
        if name not in self.fix_params:
            h = {f: np.atleast_1d(np.asarray(getattr(self._hyper, f),
                                             dtype=np.float64)).copy()
                 for f in self._hyper._fields}
            h[{'pi': 'pi', 'tau_beta': 'tau_beta',
               'sigma_epsilon': 'sigma_eps'}[name]][:] = np.asarray(value)
            self._hyper = Hyper(**h)

    def update_pi(self):
        """pi = mean(gamma) (VIPRS.py:426-434)."""
        stats = self._m_step_stats()
        self._set_unfixed('pi', np.asarray(stats.sum_gamma) / float(self.m))
        return self

    def update_tau_beta(self):
        """tau_beta = pi * M / sum(zeta) (VIPRS.py:436-444)."""
        stats = self._m_step_stats()
        pi = np.atleast_1d(np.asarray(self._hyper.pi, dtype=np.float64))
        self._set_unfixed('tau_beta',
                          pi * float(self.m) / np.asarray(stats.sum_zeta))
        return self

    def _update_sigma_g(self):
        """sigma_g = sum((1+lambda_min) zeta + q*eta) (VIPRS.py:446-457)."""
        stats = self._m_step_stats()
        lam = np.atleast_1d(np.asarray(self._hyper.lambda_min,
                                       dtype=np.float64))
        self._sigma_g = ((1.0 + lam) * np.asarray(stats.sum_zeta)
                         + np.asarray(stats.sum_q_eta))
        return self._sigma_g

    def update_sigma_epsilon(self):
        """sigma_eps = 1 - 2 beta'eta + sigma_g (VIPRS.py:459-471)."""
        stats = self._m_step_stats()
        lam = np.atleast_1d(np.asarray(self._hyper.lambda_min,
                                       dtype=np.float64))
        sigma_g = ((1.0 + lam) * np.asarray(stats.sum_zeta)
                   + np.asarray(stats.sum_q_eta))
        self._sigma_g = sigma_g
        self._set_unfixed('sigma_epsilon',
                          1.0 - 2.0 * np.asarray(stats.sum_beta_eta) + sigma_g)
        return self

    def update_theta_history(self):
        """Record the tracked quantities for the current state
        (VIPRS.py:839-873)."""
        self._track_iteration()
        return self

    def initialize_input_data_arrays(self):
        super().initialize_input_data_arrays()
        self._refresh_inputs()

    # ------------------------------------------------------------- diagnostics
    def _stats(self):
        return updates.stats_bundle(self._state, self._n_flat,
                                    self._std_beta_flat, self._ld.mask,
                                    self._hyper_f32())

    def elbo(self, sum_axis=None):
        e = _elbo_jit(self._state, self._n_flat, self._std_beta_flat,
                      self._ld.mask, self._hyper_f32(),
                      jnp.asarray(self._fix_mask.sigma_eps),
                      jnp.asarray(np.atleast_1d(self._sigma_g)),
                      self.n, float(self.m))
        return self._scalar(np.asarray(e))

    def objective(self):
        return self.elbo()

    def entropy(self, sum_axis=None):
        return self._scalar(np.asarray(updates.entropy(self._stats(), float(self.m))))

    def log_prior(self, sum_axis=None):
        return self._scalar(np.asarray(
            updates.log_prior(self._stats(), self._hyper_f32(), float(self.m))))

    def loglikelihood(self):
        return self._scalar(np.asarray(updates.loglikelihood(
            self._stats(), self._hyper_f32(),
            jnp.asarray(np.atleast_1d(self._sigma_g)), self.n)))

    def complete_loglikelihood(self):
        return self.loglikelihood() + self.log_prior()

    def mse(self, sum_axis=None):
        return self._scalar(np.asarray(updates.mse(
            self._stats(), jnp.asarray(np.atleast_1d(self._sigma_g)))))

    # ------------------------------------------------------------------ moments
    def compute_pip(self):
        return self.var_gamma

    def compute_eta(self):
        return self.eta

    def compute_zeta(self):
        return self.zeta

    def update_posterior_moments(self):
        """pip / posterior mean / posterior variance (VIPRS.py:899-907).

        One fused device computation and one host transfer for all three
        moments (separate eager property reads each pay the full accelerator
        round-trip latency on remote transports)."""
        from ..parallel.distributed import fetch
        g, eta, var = fetch(_posterior_moments_jit(
            self._state, self._n_flat, self._hyper_f32()))
        self.pip = self._dict_view(g)
        self.post_mean_beta = self._dict_view(eta)
        self.post_var_beta = self._dict_view(var)

    def _materialize_posterior_moments(self, means_only=False):
        """Fits keep the posterior device-side (see ``fit``); consumers
        (prediction, table I/O, pseudo-validation over an external dataset, the
        lazy ``pip``/``post_mean_beta``/``post_var_beta`` properties) pull host
        arrays on first access — just the posterior means when ``means_only``
        (scoring needs nothing else)."""
        if self._state is None:
            return
        if means_only:
            if self._post_mean_beta is None:
                self.post_mean_beta = self.eta
        elif self._pip is None or self._post_var_beta is None:
            self.update_posterior_moments()

    # ---------------------------------------------------------------- reporting
    def to_theta_table(self):
        import pandas as pd
        rows = [
            {'Parameter': 'ELBO', 'Value': self.elbo()},
            {'Parameter': 'Residual_variance', 'Value': self.sigma_epsilon},
            {'Parameter': 'Heritability', 'Value': self.get_heritability()},
            {'Parameter': 'Proportion_causal', 'Value': self.get_proportion_causal()},
            {'Parameter': 'Average_effect_variance',
             'Value': self.get_average_effect_size_variance()},
            {'Parameter': 'Lambda_min', 'Value': self.lambda_min},
            {'Parameter': 'tau_beta', 'Value': self.tau_beta},
        ]
        return pd.DataFrame(rows)

    def to_history_table(self):
        import pandas as pd
        return pd.DataFrame(self.history)

    def write_inferred_theta(self, f_name, sep="\t"):
        self.to_theta_table().to_csv(f_name, sep=sep, index=False)

    def _track_iteration(self, max_eta_diff=None):
        for tt in self.tracked_params:
            if tt == 'pi':
                self.history['pi'].append(self.get_proportion_causal())
            elif tt == 'pis':
                self.history['pis'].append(self.pi)
            elif tt == 'heritability':
                self.history['heritability'].append(self.get_heritability())
            elif tt == 'sigma_epsilon':
                self.history['sigma_epsilon'].append(self.sigma_epsilon)
            elif tt == 'tau_beta':
                self.history['tau_beta'].append(self.tau_beta)
            elif tt == 'sigma_g':
                self.history['sigma_g'].append(self.sigma_g)
            elif tt == 'entropy':
                self.history['entropy'].append(self.entropy())
            elif tt == 'loglikelihood':
                self.history['loglikelihood'].append(self.loglikelihood())
            elif tt == 'log_prior':
                self.history['log_prior'].append(self.log_prior())
            elif tt == 'mse':
                self.history['mse'].append(self.mse())
            elif tt == 'max_eta_diff' and max_eta_diff is not None:
                self.history['max_eta_diff'].append(max_eta_diff)
            elif callable(tt):
                self.history[tt.__name__].append(tt(self))

    # --------------------------------------------------------------------- fit
    def fit(self,
            max_iter=1000,
            theta_0=None,
            param_0=None,
            continued=False,
            disable_pbar=True,
            min_iter=3,
            f_abs_tol=1e-6,
            x_abs_tol=1e-6,
            patience=10,
            max_restarts=1,
            chunk_iters=None,
            progress_callback=None,
            **kwargs):
        """Variational EM fit (reference VIPRS.py:909-1124).

        One driver for every mode: the fused on-device loop (ops/em_loop.py)
        runs in bounded chunks whose convergence-ladder state (patience /
        oscillation / stall / damping counters) carries across chunk
        boundaries, so a chunked run is iteration-for-iteration identical to a
        single fused dispatch. Chunk size:

        - no tracking, no progress -> one chunk of ``max_iter`` (one dispatch);
        - ``disable_pbar=False`` or ``progress_callback`` -> chunks of 25,
          with live ELBO reporting between chunks (reference tqdm parity,
          VIPRS.py:972-1019);
        - ``tracked_params`` -> chunks of 1 (exact per-iteration history).

        The host handles restart-on-negative-MSE (re-initialize with
        sigma_epsilon fixed at 0.95, VIPRS.py:1025-1038).

        :param sweep_impl: (keyword-only, via kwargs) override of the measured
            kernel dispatch policy (BENCH.md "Kernel dispatch policy"). One of
            ``None`` (default: XLA tile loop at S==1, batch Pallas at S>=8 on
            TPU), ``'xla'`` (batched tile loop), ``'skip'`` (block-skipping
            Pallas sweep — wins in low-activity regimes such as warm restarts
            and ``continued=True`` fits), or ``'pallas'`` (batch Pallas sweep).
            The Pallas impls require a TPU backend AND no device mesh
            (sharded state stays on the XLA tile loop — model/_dispatch.py).
        :param inner_steps: (keyword-only) tile-local refinement passes per
            sweep (default 8; see ops/cavi_jax._block_tile_loop).
        :param compile_only: (keyword-only) lower + compile the first
            chunk's exact dispatch into the persistent cache and return
            without running (the viprs_warmup path).
        """
        if not continued:
            self.initialize(theta_0, param_0)
        self._refresh_inputs()

        if chunk_iters is None:
            if self.tracked_params:
                chunk_iters = 1
            elif not disable_pbar or progress_callback is not None:
                chunk_iters = 25
            elif self._S >= 8:
                # bounded chunks give the driver compaction points (converged
                # lanes are dropped from subsequent chunks — see below):
                chunk_iters = 50
            else:
                chunk_iters = max_iter
        chunk_iters = max(1, min(chunk_iters, max_iter))

        S = self._S
        # The Pallas sweep kernel (VMEM-resident per-block state, MXU rank-T
        # updates) wins decisively for wide model grids on TPU (measured
        # 8.1 s vs 15-18 s for the grid(100) workload, BENCH.md): with many
        # lanes the union activity gate keeps most blocks live, so the
        # block-skipping kernel pays its gather-DMA overhead for nothing.
        # At S == 1 the plain XLA tile loop wins at fit level (same-process
        # A/B on the 1.1M headline workload: 1.58 s/112 iters vs 2.68 s/126
        # for the block-skipping kernel — the activity gate stays near
        # all-active for most iterations, where the skip kernel's gather-DMA
        # compaction costs ~2x the straight stream; BENCH.md "Per-iteration
        # accounting"). The skip kernel remains available via
        # sweep_impl='skip' for low-activity regimes (warm restarts,
        # continued fits).
        # Decision table (incl. the mesh guard: Pallas kernels must never see
        # GSPMD-sharded state) lives in model/_dispatch.py and is asserted
        # exhaustively by tests/test_dispatch.py.
        sweep_impl = kwargs.pop('sweep_impl', None)
        # compile_only (viprs_warmup): lower + compile the first chunk's
        # exact dispatch, then return without running:
        compile_only = kwargs.pop('compile_only', False)
        inner_steps = kwargs.pop('inner_steps', 8)
        hybrid_eps = kwargs.pop('hybrid_eps', None)
        use_pallas, use_skip, use_hybrid = _dispatch.select_sweep_impl(
            S, self.mesh, sweep_impl)
        if use_hybrid and not _dispatch.hybrid_ld_fits(self._ld.diag.nbytes):
            # the skip branch's second diag residency would not fit; the
            # explicit override errors (the user asked for it), the default
            # policy falls back to the XLA loop:
            if sweep_impl == 'hybrid':
                raise ValueError(
                    f"sweep_impl='hybrid' needs a second HBM residency of "
                    f"the {self._ld.diag.nbytes / 1e9:.1f} GB diag tiles "
                    f"(> VIPRS_HYBRID_MAX_LD_GB="
                    f"{_dispatch.HYBRID_MAX_LD_BYTES / 1e9:.1f}); use the "
                    f"mesh or streaming planner at this scale.")
            use_hybrid = False
        ld_skip = self.dataset.ld_skip_view() if use_hybrid else None

        # The initial objective (reference VIPRS.py:942) is computed IN-GRAPH
        # by the first em_fit dispatch (init_elbo=None) — a fresh fit pays no
        # separate ELBO dispatch + host round trip. History slot 0 is read
        # back from the chunk's elbo_hist.
        init_elbo = None
        last_elbo = None   # last known full-width objectives (history fill)
        hist0_needed = not continued or not self.history.get('ELBO')
        if hist0_needed:
            self.history['ELBO'] = []
        self._track_iteration()

        counters = em_loop.init_counters(S)
        # active/statuses bookkeeping stays on the HOST: reading a device
        # array here blocks on the in-flight chunk (~190 ms/fit measured):
        active = np.ones(S, bool)
        restarts = 0
        it_done = 0

        # Single-dispatch fits (S=1, fresh, one chunk) fold the
        # restart-on-negative-MSE into the fused loop itself: the restart
        # theta is PEEKED here (the same single np.random.uniform the host
        # restart would make at restart time, VIPRS.py:1032) WITHOUT
        # advancing the global stream — it is consumed after the fit only
        # if the restart actually fired, so the np.random state matches the
        # reference's draw-at-restart-time semantics in both outcomes.
        # em_fit resets the lane in-graph — the whole fit is one dispatch +
        # one result pull. Chunked/grid runs keep the host restart
        # (identical trajectory either way; tests assert it).
        ingraph_restart = (S == 1 and chunk_iters >= max_iter
                           and max_restarts == 1 and not continued
                           and 'sigma_epsilon' not in self.fix_params)
        r_hyper = r_logits = None
        rng_after_draw = None
        if ingraph_restart:
            rng_before = np.random.get_state()
            r_pi, r_se, r_tau = self._resolve_theta0(
                {**dict(theta_0 or {}), 'sigma_epsilon': 0.95})
            rng_after_draw = np.random.get_state()
            np.random.set_state(rng_before)
            r_hyper = Hyper(
                sigma_eps=jnp.full(S, r_se, F64),
                tau_beta=jnp.full(S, r_tau, F64),
                pi=jnp.full(S, r_pi, F64),
                lambda_min=jnp.asarray(
                    np.atleast_1d(np.asarray(self._hyper.lambda_min,
                                             dtype=np.float64)), F64))
            r_logits = jnp.full(S, _logit(r_pi), F32)
            restarts = max_restarts   # the host ladder must not re-fire
        pbar = self._make_pbar(max_iter) if not disable_pbar else None

        # Merged per-lane results across chunks (compacted sub-runs report
        # only their own lanes):
        statuses = np.full(S, opt.MAX_ITER, dtype=np.int32)
        nit_acc = np.zeros(S, dtype=np.int32)
        med_acc = np.zeros(S, dtype=np.float64)
        S_run = S   # width of the lane set currently being optimized
        # per-chunk (width, use_pallas, use_skip, use_hybrid) trace — lets
        # tests and the multi-chip dryrun assert that compaction and the
        # kernel-dispatch policy actually executed (VERDICT r3 weak #7):
        self._chunk_trace = []
        # per-iteration active-block counts (skip/hybrid dispatches only;
        # BENCH.md's activity-vs-iteration trace comes from here):
        self._act_trace = []

        while it_done < max_iter:
            this_chunk = min(chunk_iters, max_iter - it_done)
            active_np = np.asarray(active)
            n_act = int(active_np.sum())

            # Lane compaction: once most grid lanes have terminated, re-run
            # only the survivors at the next power-of-2 width — the sweep,
            # reductions and state traffic all scale with the lane count, and
            # the smaller widths hit the persistent compile cache after the
            # first use. (Compact only on a >=4x shrink so at most ~log4(S)
            # distinct widths ever compile.)
            bucket = min(S, 1 << max(0, int(np.ceil(np.log2(max(n_act, 1))))))
            if last_elbo is None:
                # no full-width objectives yet to back-fill history from;
                # run full-width (the very first chunk only):
                bucket = S
            if self.mesh is not None:
                # keep compacted widths divisible by the mesh 'grid' axis so
                # lane-sharded runs stay evenly partitioned:
                g_ax = self.mesh.shape['grid']
                bucket = min(S, ((bucket + g_ax - 1) // g_ax) * g_ax)
            if bucket > S_run:          # restarts can re-activate lanes
                S_run = bucket
            elif S >= 8 and bucket <= S_run // 4:
                S_run = bucket
            compact = S_run < S
            if compact:
                sel = np.nonzero(active_np)[0]
                sel_pad = np.concatenate(
                    [sel, np.full(S_run - n_act, sel[0])]).astype(np.int64)
                sel_dev = jnp.asarray(sel_pad)

                def sub(x):
                    return jnp.take(jnp.asarray(x), sel_dev, axis=0)
                state_in = CaviState(*(sub(x) for x in self._state))
                hyper_in = Hyper(*(sub(x) for x in self._hyper_f32()))
                fix_in = FixMask(*(sub(x) for x in self._fix_mask))
                counters_in = em_loop.EMCounters(*(sub(x) for x in counters))
                # post-restart chunks pass None: the restarted lanes' initial
                # objective is computed in-graph for the compacted subset
                init_elbo_in = (None if init_elbo is None
                                else init_elbo[sel_pad])
                active_in = jnp.asarray(np.arange(S_run) < n_act)
                sigma_g_in = np.atleast_1d(self._sigma_g)[sel_pad]
                if sweep_impl is None:
                    # compacted width re-decision — same policy, same guards:
                    run_pallas, run_skip, run_hybrid = \
                        _dispatch.select_sweep_impl(S_run, self.mesh, None)
                else:
                    run_pallas, run_skip, run_hybrid = \
                        use_pallas, use_skip, use_hybrid
                if run_hybrid and (
                        S_run != 1
                        or not _dispatch.hybrid_ld_fits(
                            self._ld.diag.nbytes)):
                    run_hybrid = False
                if run_hybrid and ld_skip is None:
                    ld_skip = self.dataset.ld_skip_view()
            else:
                state_in, hyper_in = self._state, self._hyper_f32()
                fix_in, counters_in = self._fix_mask, counters
                init_elbo_in, active_in = init_elbo, active
                sigma_g_in = np.atleast_1d(self._sigma_g)
                run_pallas, run_skip, run_hybrid = \
                    use_pallas, use_skip, use_hybrid

            self._chunk_trace.append((S_run, run_pallas, run_skip,
                                      run_hybrid))
            call_args = (self._ld, state_in, self._std_beta_flat,
                         self._n_flat, hyper_in, fix_in)
            call_kw = dict(
                n_sample=float(self.n), m_total=float(self.m),
                init_elbo=(None if init_elbo_in is None
                           else jnp.asarray(init_elbo_in, F64)),
                active0=active_in,
                max_iter=this_chunk, min_iter=min_iter,
                f_abs_tol=f_abs_tol, x_abs_tol=x_abs_tol,
                patience=patience, tile=self.tile,
                inner_steps=inner_steps,
                use_pallas=run_pallas, use_skip=run_skip,
                use_hybrid=run_hybrid,
                hybrid_frac=_dispatch.HYBRID_FRAC,
                hybrid_eps=hybrid_eps,
                ld_skip=ld_skip if run_hybrid else None,
                i0=it_done, counters0=counters_in,
                sigma_g0=jnp.asarray(sigma_g_in, F64),
                max_restarts=1 if ingraph_restart else 0,
                restart_hyper=r_hyper, restart_logits=r_logits)
            if compile_only:
                # viprs_warmup path: build THIS dispatch's executable into
                # the persistent cache without running it (no drift possible
                # — same args, same mesh context as a real fit):
                with self._mesh_context():
                    em_loop.em_fit.lower(*call_args, **call_kw).compile()
                if pbar is not None:
                    pbar.close()
                return self
            with self._mesh_context():
                res = em_loop.em_fit(*call_args, **call_kw)

            if compact:
                sel_j = jnp.asarray(sel)
                fill = init_elbo if init_elbo is not None else last_elbo

                def scat(full, part):
                    return jnp.asarray(full).at[sel_j].set(part[:n_act])
                self._state = CaviState(
                    *(scat(f, p) for f, p in zip(self._state, res.state)))
                hyper_np = {f: np.atleast_1d(np.asarray(
                    getattr(self._hyper, f), dtype=np.float64)).copy()
                    for f in self._hyper._fields}
                res_hyper_np, sg_np, status_np, nit_np, med_np, n_total_np, \
                    fe_part, hist_dev, act_dev = jax.device_get(
                        (res.hyper, res.sigma_g, res.status, res.nit,
                         res.max_eta_diff, res.n_iter_total, res.final_elbo,
                         res.elbo_hist, res.act_hist))
                if run_skip or run_hybrid:
                    self._act_trace.extend(
                        np.asarray(act_dev)[1:int(n_total_np) + 1].tolist())
                for i, f in enumerate(self._hyper._fields):
                    hyper_np[f][sel] = np.asarray(res_hyper_np[i],
                                                  dtype=np.float64)[:n_act]
                self._hyper = Hyper(**hyper_np)
                sg = np.atleast_1d(np.asarray(self._sigma_g,
                                              dtype=np.float64)).copy()
                sg[sel] = np.asarray(sg_np, dtype=np.float64)[:n_act]
                self._sigma_g = sg
                counters = em_loop.EMCounters(
                    *(scat(f, p) for f, p in zip(counters, res.counters)))
                statuses = statuses.copy()
                statuses[sel] = status_np[:n_act]
                nit_acc[sel] = nit_np[:n_act]
                med_acc[sel] = med_np[:n_act]
                n_in_chunk = int(n_total_np)
                it_done += n_in_chunk
                fe = fill.copy()
                fe[sel] = np.asarray(fe_part, dtype=np.float64)[:n_act]
                sub_hist = np.asarray(hist_dev)[1:n_in_chunk + 1]
                for row in sub_hist:
                    full_row = fill.copy()
                    full_row[sel] = row[:n_act]
                    self.history['ELBO'].append(full_row)
                init_elbo = fe
            else:
                counters = res.counters
                # merge only lanes that entered this chunk active — finished
                # lanes report nit=0 / RUNNING in later chunks (ONE batched
                # device->host transfer for everything the host needs,
                # including the hyperparameters; separate pulls each pay the
                # accelerator round trip):
                (hyper_np, sg_np, status_np, nit_np, med_np, n_total_np,
                 fe_np, hist_dev, ru_np, act_dev) = jax.device_get(
                    (res.hyper, res.sigma_g, res.status, res.nit,
                     res.max_eta_diff, res.n_iter_total, res.final_elbo,
                     res.elbo_hist, res.restarts_used, res.act_hist))
                if run_skip or run_hybrid:
                    self._act_trace.extend(
                        np.asarray(act_dev)[1:int(n_total_np) + 1].tolist())
                if ingraph_restart and int(np.asarray(ru_np).max()) > 0:
                    # mirror the in-graph restart on the host bookkeeping
                    # (what _restart_models would have done):
                    logger.info("MSE was negative; the fused loop restarted "
                                "with sigma_epsilon fixed at 0.95 "
                                "(reference behavior).")
                    self.fix_params['sigma_epsilon'] = 0.95
                    self._update_fix_mask()
                    # the restart consumed the peeked draw — advance the
                    # global stream exactly as the host restart would have:
                    np.random.set_state(rng_after_draw)
                self._state = res.state
                self._hyper = Hyper(*(np.asarray(x, dtype=np.float64)
                                      for x in hyper_np))
                self._sigma_g = np.asarray(sg_np, dtype=np.float64)
                self._last_result = res
                statuses = statuses.copy()
                statuses[active_np] = status_np[active_np]
                nit_acc[active_np] = nit_np[active_np]
                med_acc[active_np] = med_np[active_np]
                n_in_chunk = int(n_total_np)
                it_done += n_in_chunk
                init_elbo = np.asarray(fe_np, dtype=np.float64)

                hist = np.asarray(hist_dev)
                if hist0_needed:
                    self.history['ELBO'].append(
                        hist[0][0] if S == 1 else hist[0].copy())
                    hist0_needed = False
                hist = hist[1:n_in_chunk + 1]
                self.history['ELBO'].extend(
                    [row[0] for row in hist] if S == 1 else list(hist))
            last_elbo = init_elbo
            self._merged_result = em_loop.EMResult(
                state=None, hyper=None, sigma_g=None,
                status=statuses, nit=nit_acc, elbo_hist=None,
                n_iter_total=it_done, final_elbo=init_elbo,
                final_mse=None, counters=None, max_eta_diff=med_acc)
            if self.tracked_params:
                self._track_iteration(max_eta_diff=float(np.max(med_acc)))

            if pbar is not None:
                pbar.update(n_in_chunk)
                pbar.set_postfix({'ELBO': float(init_elbo.max())})
            if progress_callback is not None:
                progress_callback(self, it_done, statuses)

            # restart-on-negative-MSE (VIPRS.py:1025-1038):
            restart_mask = (statuses == opt.MSE_NEGATIVE) \
                & ~np.asarray(self._fix_mask.sigma_eps) \
                & (restarts < max_restarts)
            if restart_mask.any():
                restarts += 1
                logger.info("MSE is negative; restarting optimization with "
                            "sigma_epsilon fixed at 0.95 (reference behavior).")
                self._restart_models(restart_mask, theta_0, param_0)
                # the restarted state's objective is computed in-graph by the
                # next chunk (init_elbo=None) — no host ELBO dispatch here:
                init_elbo = None
                fresh = em_loop.init_counters(S)
                mask_dev = jnp.asarray(restart_mask)
                counters = em_loop.EMCounters(
                    *(jnp.where(mask_dev, f, c)
                      for f, c in zip(fresh, counters)))
                active = restart_mask | (statuses == opt.MAX_ITER)
                continue

            # lanes with status MAX_ITER only exhausted this chunk's budget:
            active = statuses == opt.MAX_ITER
            if not active.any():
                break

        if pbar is not None:
            pbar.close()

        # Posterior moments materialize lazily on first access (the pip /
        # post_mean_beta / post_var_beta properties) — fit() itself never pays
        # the device->host transfer. Clear any previously materialized host
        # copies so they can't go stale:
        self.pip = self.post_mean_beta = self.post_var_beta = None
        self._last_result = self._merged_result
        self._populate_optim_result(self._merged_result)

        if not self.optim_result.success:
            logger.warning("\t%s", self.optim_result.message)
        logger.info("> Final ELBO: %s", self.history['ELBO'][-1] if self.history['ELBO'] else None)
        logger.info("> Estimated heritability: %s", self.get_heritability())
        logger.info("> Estimated proportion of causal variants: %s",
                    self.get_proportion_causal())
        return self

    @staticmethod
    def _make_pbar(total):
        try:
            from tqdm import tqdm
            return tqdm(total=total, desc='EM iterations', unit='it')
        except ImportError:
            class _LogBar:
                def __init__(self, total):
                    self.n, self.total, self._postfix = 0, total, {}

                def update(self, k):
                    self.n += k

                def set_postfix(self, d):
                    self._postfix = d
                    logger.info("iteration %d/%d | %s", self.n, self.total,
                                ', '.join(f'{k}={v:.4f}'
                                          for k, v in d.items()))

                def close(self):
                    pass
            return _LogBar(total)

    def _restart_models(self, restart_mask, theta_0, param_0):
        """Re-initialize the masked models with sigma_epsilon fixed at 0.95."""
        self.fix_params['sigma_epsilon'] = 0.95
        # re-resolve theta with the new fixed value; keep fixed/gridded
        # hyperparameters untouched (the reference's restart re-runs
        # initialize_theta, which honors fix_params, VIPRS.py:1032-1036):
        pi, sigma_eps, tau_beta = self._resolve_theta0(theta_0)
        h = {f: np.atleast_1d(np.asarray(getattr(self._hyper, f))).copy()
             for f in self._hyper._fields}
        h['sigma_eps'][restart_mask] = 0.95
        fix_pi = np.atleast_1d(np.asarray(self._fix_mask.pi))
        fix_tb = np.atleast_1d(np.asarray(self._fix_mask.tau_beta))
        h['pi'][restart_mask & ~fix_pi] = pi
        h['tau_beta'][restart_mask & ~fix_tb] = tau_beta
        self._hyper = Hyper(**h)
        self._update_fix_mask()

        # reset variational state for the restarted lanes (device-side, one
        # fused dispatch — avoids both a host round trip of the (S, NB, B)
        # state and per-array eager dispatch latency on remote transports):
        self._state = _restart_state_jit(
            self._state, jnp.asarray(restart_mask),
            jnp.asarray(_logit(h['pi']), F32))
        self._sigma_g = np.where(restart_mask, 0.0, self._sigma_g)

    def _populate_optim_result(self, res):
        code = int(np.asarray(res.status)[0]) if self._S == 1 else None
        if code is not None:
            self.optim_result = OptimizeResult.from_status(
                code, float(np.asarray(res.final_elbo)[0]),
                int(np.asarray(res.nit)[0]))

    def pseudo_validate(self, test_gdl=None):
        """Pseudo-R^2; the internal (PUMAS-split) path runs on device using the
        cached q — per-model scalars are all that leave the accelerator."""
        if test_gdl is not None or self.validation_std_beta is None \
                or self._state is None:
            return super().pseudo_validate(test_gdl)

        lay = self.dataset.layout
        r = jnp.asarray(
            lay.to_flat(self.validation_std_beta).reshape(lay.nb, lay.block_size),
            F32)
        if self.mesh is not None:
            from ..parallel.mesh import shard_flat
            r = shard_flat(self.mesh, r, self._ld.nb)
        mask = self._ld.mask
        eta = self._state.eta
        ldw = self._state.q + eta  # S.b with the cached q (pseudo_metrics.py:130-152)
        rb = updates.masked_sum(eta * r[None], mask)
        bsb = updates.masked_sum(eta * ldw, mask)
        out = np.asarray(rb) ** 2 / np.asarray(bsb)
        return float(out[0]) if self._S == 1 else out

    # ------------------------------------------------------------- checkpoints
    def save_checkpoint(self, f_name):
        """Write the full variational state + hyperparameters to an .npz file
        (mid-optimization checkpointing; the reference only round-trips final
        posterior tables, BayesPRSModel.py:412-478 — resume with
        ``load_checkpoint`` + ``fit(continued=True)``)."""
        np.savez_compressed(
            f_name,
            logits=np.asarray(self._state.logits),
            mu=np.asarray(self._state.mu),
            eta=np.asarray(self._state.eta),
            q=np.asarray(self._state.q),
            sigma_eps=np.atleast_1d(np.asarray(self._hyper.sigma_eps)),
            tau_beta=np.atleast_1d(np.asarray(self._hyper.tau_beta)),
            pi=np.atleast_1d(np.asarray(self._hyper.pi)),
            lambda_min=np.atleast_1d(np.asarray(self._hyper.lambda_min)),
            sigma_g=np.atleast_1d(self._sigma_g),
            elbo_history=np.asarray(self.history.get('ELBO', [])),
        )

    def load_checkpoint(self, f_name):
        """Restore a checkpoint written by ``save_checkpoint``."""
        z = np.load(f_name if str(f_name).endswith('.npz') else f_name + '.npz')
        self._state = CaviState(logits=jnp.asarray(z['logits']),
                                mu=jnp.asarray(z['mu']),
                                eta=jnp.asarray(z['eta']),
                                q=jnp.asarray(z['q']))
        self._S = int(z['logits'].shape[0])
        self._hyper = Hyper(sigma_eps=z['sigma_eps'], tau_beta=z['tau_beta'],
                            pi=z['pi'], lambda_min=z['lambda_min'])
        self._sigma_g = z['sigma_g']
        self.history['ELBO'] = list(z['elbo_history'])
        self._update_fix_mask()
        return self
