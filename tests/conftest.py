"""Test configuration: run everything on CPU with 8 virtual devices.

In this environment the TPU is attached through an experimental platform
plugin that ignores ``JAX_PLATFORMS=cpu``, so we additionally pin
``jax_default_device`` to the first host CPU device.  The 8 virtual CPU
devices back the multi-chip ``jax.sharding.Mesh`` tests in
``tests/test_sharding.py`` (SURVEY.md §2.3).
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

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_device", jax.devices("cpu")[0])
