"""Test configuration: run everything on CPU with 8 virtual devices so
multi-chip sharding paths are exercised without a pod (SURVEY.md §4).

Note: the axon TPU plugin's sitecustomize sets ``jax_platforms="axon,cpu"``
at interpreter startup, overriding the JAX_PLATFORMS env var — so the
platform must be forced through jax.config *after* import, before the first
backend query.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Tight-tolerance numerics tests (and reference-parity f64 configs) need x64.
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: this host pays ~0.4 s per XLA CPU op compile;
# the cache amortizes that across test processes and reruns.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs
