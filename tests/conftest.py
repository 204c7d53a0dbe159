"""Test configuration: run on a simulated 8-device CPU mesh.

This environment's sitecustomize registers a TPU-tunnel ("axon") PJRT plugin
and sets the ``jax_platforms`` *config* to "axon,cpu" — a config value beats
the JAX_PLATFORMS env var, so the override below must also go through
jax.config.  Tests must run on local CPU: the tunnel's remote-compile path
stalls intermittently and supports only one real chip.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache: this box has one CPU core and the suite is
# compile-bound; caching XLA executables across runs cuts wall-clock.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)
