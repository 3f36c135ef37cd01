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
        ``'xla'``, ``'skip'`` or ``'pallas'``. Requesting a Pallas impl off
        TPU or under a mesh is an error, not a silent fallback.
    :param backend: JAX backend name; defaults to ``jax.default_backend()``.
    :param min_lanes: lane threshold for the default policy.
    :returns: ``(use_pallas, use_skip)``.
    """
    if backend is None:
        backend = jax.default_backend()
    if sweep_impl not in (None, 'xla', 'skip', 'pallas'):
        raise ValueError(
            f"sweep_impl must be one of None, 'xla', 'skip', 'pallas'; "
            f"got {sweep_impl!r}")
    if sweep_impl in ('skip', 'pallas'):
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
        return (sweep_impl == 'pallas', sweep_impl == 'skip')
    if sweep_impl == 'xla':
        return (False, False)
    # measured default policy:
    return (pallas_allowed(mesh, backend) and S >= min_lanes, False)
