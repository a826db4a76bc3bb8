"""Test harness: force an 8-device virtual CPU mesh before JAX backends init.

All multi-device semantics (all-gather NT-Xent, global min/max weight
statistics, pjit train step) are validated on this virtual mesh exactly as
they would run over a TPU ICI mesh.

Note: the environment may pre-register a TPU plugin via sitecustomize and
pin ``JAX_PLATFORMS``; ``jax.config.update('jax_platforms', 'cpu')`` after
import overrides it reliably, env vars alone do not.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert len(jax.devices()) == 8, "test harness expects 8 virtual CPU devices"
