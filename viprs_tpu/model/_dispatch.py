"""Kernel-dispatch policy — the single source of truth for when a fused fit
may route its sweep into a Pallas kernel.

Pallas kernels (`ops/cavi_pallas.py`) require BOTH:

- a real TPU backend (`jax.default_backend() in ('tpu', 'axon')`): the Mosaic
  lowering has no CPU/GPU path here, and the interpreter mode is far slower
  than the XLA tile loop; and
- NO device mesh on the model: `pl.pallas_call` has no SPMD partitioning
  rule, so handing it GSPMD-sharded `(S, NB, B)` state would either fail to
  compile or silently gather/replicate the state + LD onto every chip —
  exactly the multi-chip deployment the mesh exists for. Under a mesh the
  XLA tile loop is the only sweep implementation (XLA partitions it).

Every driver (VIPRS.fit including its compacted re-decision, VIPRSMix's fused
path, VIPRSMixGrid) calls :func:`select_sweep_impl` instead of making this
decision inline, and ``tests/test_dispatch.py`` asserts the full
(S, mesh, backend, override) decision table. Reference analog: the grid axis
of ``e_step.hpp:555-647`` runs per-process; the mesh path is this framework's
multi-chip substitute for that process fan-out.
"""

import jax

#: Backends on which the Mosaic/Pallas kernels can lower.
TPU_BACKENDS = ('tpu', 'axon')

#: Default minimum lane count for the batch Pallas kernel to win over the
#: XLA tile loop (measured dispatch policy, BENCH.md "Kernel dispatch
#: policy": the XLA tile loop wins at S==1; the batch kernel wins for wide
#: grids).
MIN_PALLAS_LANES = 8

#: Whether the measured default policy routes single-model (S==1) fits on a
#: meshless TPU backend into the HYBRID activity-gated dispatch: each EM
#: iteration picks, in-graph, between the all-active XLA tile loop and the
#: block-skipping Pallas sweep based on the live per-block proposal-mask
#: population count (ops/em_loop.py). The block-activity profile of a real
#: fit collapses to a few percent after the early iterations (DESIGN.md
#: §2b), where the skip kernel streams an order of magnitude less HBM —
#: while the early all-active iterations keep the cheaper XLA loop.
#: Measured fit-level A/B in BENCH.md (round 5).
S1_HYBRID_DEFAULT = True

#: In-graph activity threshold for the hybrid dispatch, as a fraction of
#: total LD blocks: iterations whose active-block count is at or below
#: ``HYBRID_FRAC * NB`` run the skip kernel. The measured crossover
#: (BENCH.md roofline: skip cost ~ 0.4 ms + 11.8 ms * frac vs the XLA
#: loop's flat ~6.2 ms at inner_steps=8) sits near 0.5; the default stays
#: below it so the gather-DMA path only runs where it wins clearly.
HYBRID_FRAC = 0.35


#: The hybrid dispatch doubles the diagonal-tile HBM residency (the skip
#: branch needs its own row-major buffer — see dataset.ld_skip_view); above
#: this diag size the driver falls back to the XLA tile loop. Override (GB)
#: via VIPRS_HYBRID_MAX_LD_GB. Capacity-scale fits (9.6M+) exceed this and
#: run under the mesh / streaming planner anyway, where Pallas is excluded.
HYBRID_MAX_LD_BYTES = float(
    __import__('os').environ.get('VIPRS_HYBRID_MAX_LD_GB', 4.0)) * 1e9


def hybrid_ld_fits(ld_diag_nbytes):
    """True iff the hybrid dispatch's second diag residency is affordable."""
    return ld_diag_nbytes <= HYBRID_MAX_LD_BYTES


def pallas_allowed(mesh, backend=None):
    """True iff Pallas kernels may be dispatched at all: a TPU backend and no
    device mesh (sharded state must stay on the XLA tile loop)."""
    if backend is None:
        backend = jax.default_backend()
    return backend in TPU_BACKENDS and mesh is None


def select_sweep_impl(S, mesh, sweep_impl=None, backend=None,
                      min_lanes=MIN_PALLAS_LANES):
    """Decide the sweep implementation for a fused fit.

    :param S: effective lane count feeding the kernel (grid width, or
        ``S * K`` for batched mixture kernels; 1 for single-model fits whose
        Pallas variants have no lane threshold — pass ``min_lanes=1``).
    :param mesh: the model's ``jax.sharding.Mesh`` or None.
    :param sweep_impl: optional explicit override: None (measured policy),
        ``'xla'``, ``'skip'``, ``'pallas'`` or ``'hybrid'``. Requesting a
        Pallas impl off TPU or under a mesh is an error, not a silent
        fallback; ``'hybrid'`` additionally requires ``S == 1`` (the
        activity-gated dispatch exists for the single-model fused loop).
    :param backend: JAX backend name; defaults to ``jax.default_backend()``.
    :param min_lanes: lane threshold for the default policy.
    :returns: ``(use_pallas, use_skip, use_hybrid)``.
    """
    if backend is None:
        backend = jax.default_backend()
    if sweep_impl not in (None, 'xla', 'skip', 'pallas', 'hybrid'):
        raise ValueError(
            f"sweep_impl must be one of None, 'xla', 'skip', 'pallas', "
            f"'hybrid'; got {sweep_impl!r}")
    if sweep_impl in ('skip', 'pallas', 'hybrid'):
        if backend not in TPU_BACKENDS:
            raise ValueError(
                f"sweep_impl={sweep_impl!r} requests a Pallas TPU kernel, "
                f"but the active JAX backend is {backend!r}; use "
                f"sweep_impl='xla' (or None) off-TPU.")
        if mesh is not None:
            raise ValueError(
                f"sweep_impl={sweep_impl!r} requests a Pallas kernel, but "
                f"the model has a device mesh {tuple(mesh.shape.items())}; "
                f"Pallas kernels cannot consume GSPMD-sharded state — use "
                f"sweep_impl='xla' (or None) under a mesh.")
        if sweep_impl == 'hybrid' and S != 1:
            raise ValueError(
                f"sweep_impl='hybrid' is the single-model (S == 1) "
                f"activity-gated dispatch; got S={S}. Wide grids use the "
                f"batch Pallas kernel ('pallas') or the union-gated skip "
                f"kernel ('skip').")
        return (sweep_impl == 'pallas', sweep_impl == 'skip',
                sweep_impl == 'hybrid')
    if sweep_impl == 'xla':
        return (False, False, False)
    # measured default policy:
    if pallas_allowed(mesh, backend):
        if S >= min_lanes:
            return (True, False, False)
        if S == 1 and S1_HYBRID_DEFAULT and min_lanes > 1:
            return (False, False, True)
    return (False, False, False)
