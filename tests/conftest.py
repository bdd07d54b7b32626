"""Test configuration: force an 8-device virtual CPU platform so every test
exercises the same multi-device code paths the TPU mesh uses, without TPU
hardware (see SURVEY.md §4: the reference has no multi-device tests; this
build adds them).

Note: the ambient environment pins JAX_PLATFORMS=axon (real TPU) through a
site hook that overrides os.environ, so the platform must be forced through
jax.config, not the environment variable.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
