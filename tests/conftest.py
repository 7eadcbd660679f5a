"""Test configuration: force CPU with 8 virtual devices so distributed tests
run anywhere (SURVEY.md §4 'distributed without a cluster') with fixed seeds.

NOTE: this container's sitecustomize imports jax at interpreter startup (the
axon TPU relay), so env vars like JAX_PLATFORMS/XLA_FLAGS set here are
already latched — jax.config.update still works because backends initialize
lazily.
"""
import jax
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)
