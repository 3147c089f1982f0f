"""GELATO-TPU: TPU-native launch trajectory optimizer.

A from-scratch JAX/XLA rebuild of the capabilities of istellartech/GELATO
(multi-phase launch-vehicle trajectory optimization via Legendre-Gauss-Radau
pseudospectral collocation).  Everything on the compute path is pure jittable
JAX: constraint Jacobians come from AD instead of finite differences, and the
NLP is solved by an on-device primal-dual interior-point method.

Reference layer map: /root/reference (see SURVEY.md).  This package is an
independent TPU-first re-design, not a port.
"""

import os

import jax

# Trajectory optimization at 1e-6 feasibility requires fp64 (SURVEY.md §7
# design decision 1).  TPU fp64 is emulated; the win comes from batching and
# staying on-device.
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the solver pieces (the fused IP step in
# particular) take ~40-70 min to compile on the remote toolchain.  The cache
# lives IN-REPO by default so committed entries survive the per-round
# container teardown (every round since r2 re-paid the fused-step compile
# because ~/.cache died with the container); falls back to ~/.cache when the
# package directory is not writable.
_cache_dir = os.environ.get("GELATO_TPU_CACHE")
if _cache_dir is None:
    _cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "xla_cache")
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        with open(os.path.join(_cache_dir, ".writable"), "w") as _f:
            _f.write("ok")
    except OSError:
        _cache_dir = os.path.expanduser("~/.cache/gelato_tpu_xla")
if _cache_dir:
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

__version__ = "0.1.0"

from . import ops  # noqa: E402,F401
