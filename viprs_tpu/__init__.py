"""
viprs_tpu — a TPU-native framework for Variational Inference of Polygenic Risk Scores.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the reference
``viprs`` package (summary-statistics Bayesian PRS via coordinate-ascent variational
inference), built for TPU hardware: blocked dense LD tiles on the MXU, a model-grid
batch axis, fused on-device EM loops, and block-sharded multi-chip execution.

See DESIGN.md at the repository root for the architecture.
"""

import os as _os

import jax

# Full-framework requirement: ELBO convergence is measured at 1e-6 absolute on
# objectives of magnitude ~1e5-1e6 (reference defaults, viprs/model/VIPRS.py:909-919),
# which requires float64 scalar accumulation. State arrays remain explicitly float32.
jax.config.update("jax_enable_x64", True)

# Some JAX builds pin jax_platforms and ignore the JAX_PLATFORMS env var; honor
# the env var here so `JAX_PLATFORMS=cpu viprs_fit ...` behaves as documented.
if _os.environ.get("JAX_PLATFORMS"):
    try:
        jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # pragma: no cover - backend already initialized
        pass

# Persistent compilation cache: the fused EM loop costs ~1-2 min to compile on
# TPU; caching it across processes makes repeated fits start instantly.
if _os.environ.get("VIPRS_TPU_COMPILE_CACHE", "1") != "0":
    try:
        _cache_dir = _os.environ.get(
            "VIPRS_TPU_COMPILE_CACHE_DIR",
            _os.path.join(_os.path.expanduser("~"), ".cache", "viprs_tpu_jax"))
        _os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover
        pass

__version__ = "0.1.0"

def __getattr__(name):
    """Lazy top-level exports (avoids importing heavy modules for ops-only use)."""
    _model_exports = {'VIPRS', 'VIPRSMix', 'VIPRSGrid', 'BayesPRSModel', 'LDPredInf'}
    _grid_exports = {'HyperparameterGrid', 'select_best_model', 'bayesian_model_average'}
    if name in _model_exports:
        from . import model
        return getattr(model, name)
    if name in _grid_exports:
        from . import gridsearch
        return getattr(gridsearch, name)
    raise AttributeError(f"module 'viprs_tpu' has no attribute {name!r}")
