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

# Persistent compilation cache: repeat test runs (the developer loop, CI
# retries) skip recompiling unchanged jitted graphs — on the 1-CPU CI
# host compile time dominates many tests. Set DIFFSCI_TEST_CACHE=off to
# disable (e.g. when bisecting XLA itself).
_cache = os.environ.get("DIFFSCI_TEST_CACHE", ".pytest_jax_cache")
if _cache != "off":
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def pytest_collection_modifyitems(config, items):
    """Auto-tier: every test in a test_reference_parity* file carries the
    'parity' marker (golden-fixture pins: thorough but heavy). Quick
    iteration: `make test-quick` == pytest -m "not slow and not parity";
    full cross-framework evidence: pytest -m parity. Parallelize any tier
    with -n auto (pytest-xdist is available in the image)."""
    import pytest
    for item in items:
        if item.fspath and "test_reference_parity" in str(item.fspath):
            item.add_marker(pytest.mark.parity)
