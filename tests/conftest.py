"""Test configuration: run everything on a virtual 8-device CPU platform so
multi-chip sharding paths are exercised hermetically (no TPU needed).

NOTE: this environment's sitecustomize registers a remote 'axon' TPU backend
and pins jax_platforms='axon,cpu' via jax.config.update — env vars alone do
not win, so we re-update the config here before any backend is touched.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# persistent compile cache makes repeat test runs much faster
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must run on the CPU platform"
