"""Test configuration: run everything on CPU with 8 virtual devices.

In this environment a TPU can be attached through an experimental PJRT
plugin registered at interpreter startup (sitecustomize, gated on
PALLAS_AXON_POOL_IPS).  Registration both adds the backend factory and
forces ``jax_platforms=axon`` programmatically, so the env var
``JAX_PLATFORMS=cpu`` alone is ignored — and when the accelerator tunnel
is down-but-listening, initializing that backend blocks forever in native
code with the GIL held.  Tests are CPU-only by design: we deregister the
plugin's backend factory *before any device lookup* and pin
``jax_platforms`` to cpu, which makes the suite immune to tunnel state.
The 8 virtual CPU devices back the multi-chip ``jax.sharding.Mesh`` tests
in ``tests/test_sharding.py`` (SURVEY.md §2.3).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(__file__))

import jax  # noqa: E402

from jax._src import xla_bridge as _xb  # noqa: E402

_xb._backend_factories.pop("axon", None)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_device", jax.devices("cpu")[0])
