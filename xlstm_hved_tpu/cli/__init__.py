"""CLI entry points (train / pretrain / test / check).

XHVED_FORCE_CPU=1 pins the JAX CPU backend in-process before any backend
initializes (XHVED_CPU_DEVICES=N additionally creates N virtual CPU
devices). This exists because relay-attached TPU containers register their
backend from sitecustomize at interpreter startup, which latches
JAX_PLATFORMS before user code runs — jax.config.update is the only
reliable override (same mechanism as tests/conftest.py), and subprocess
phases (scripts/full_scale_run.py) need it inheritable via the
environment.
"""
import os

if os.environ.get("XHVED_FORCE_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")
    if os.environ.get("XHVED_CPU_DEVICES"):
        jax.config.update("jax_num_cpu_devices",
                          int(os.environ["XHVED_CPU_DEVICES"]))
