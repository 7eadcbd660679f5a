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

# Files whose tests are compile-heavy end to end (full-model fixtures).
# Measured on this 1-core container (pytest --durations): the three
# model-forward files alone cost ~21 min of the former 27-min "quick" run.
_SLOW_FILES = {
    "test_cli_e2e.py",
    "test_engine.py",
    "test_goldens.py",
    "test_model_forward.py",
    "test_models_extra.py",
    "test_parallel.py",
    "test_remat.py",
    "test_torch_parity.py",
    "test_uxlstm.py",
}


def pytest_collection_modifyitems(config, items):
    """Two-tier suite (round-1 VERDICT #9): everything not marked slow gets
    the `quick` marker, so `pytest -m quick` is the fast CI tier and
    `pytest` (or `-m slow`) is the nightly full run."""
    for item in items:
        if item.fspath.basename in _SLOW_FILES or \
                item.get_closest_marker("slow"):
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.quick)


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)
