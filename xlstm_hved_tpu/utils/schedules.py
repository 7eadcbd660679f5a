"""Warmup LR schedules and memory probing.

Re-design of /root/reference/utils.py:259-491: the Base/Linear/Exponential
warmup classes (unused by the reference entry points but part of the utility
surface) become optax-composable schedule transforms, and
find_maximum_patch_size becomes a jit-compile probe (TPU memory failures
surface at compile/execute time as RESOURCE_EXHAUSTED).
"""
from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp


def linear_warmup(base_schedule: Callable, warmup_steps: int) -> Callable:
    """omega = min(1, (step+1)/warmup_period) multiplier
    (reference LinearWarmup semantics)."""

    def schedule(count):
        omega = jnp.minimum(1.0, (count + 1.0) / max(warmup_steps, 1))
        return omega * base_schedule(count)

    return schedule


def exponential_warmup(base_schedule: Callable, warmup_period: int) -> Callable:
    """omega = 1 - exp(-(step+1)/warmup_period) multiplier
    (reference ExponentialWarmup semantics)."""

    def schedule(count):
        omega = 1.0 - jnp.exp(-(count + 1.0) / max(warmup_period, 1))
        return omega * base_schedule(count)

    return schedule


DEFAULT_PATCH_SHAPES: Tuple[Tuple[int, int, int], ...] = (
    (64, 128, 128), (96, 128, 128),
    (64, 160, 160), (96, 160, 160),
    (64, 192, 192), (96, 192, 192),
    (128, 192, 128),
)


def find_maximum_patch_size(apply_fn: Callable, variables,
                            in_channels: int = 4,
                            patch_shapes: Sequence[Tuple[int, int, int]]
                            = DEFAULT_PATCH_SHAPES):
    """Largest patch the device can run without OOM (reference
    find_maximum_patch_size, utils.py:471-491). apply_fn(variables, x) must
    run the forward. Returns the last successful shape."""
    best = None
    for shape in patch_shapes:
        x = jnp.zeros((1, *shape, in_channels), jnp.float32)
        try:
            out = jax.jit(apply_fn)(variables, x)
            jax.block_until_ready(out)
            best = shape
        except Exception as e:  # noqa: BLE001 — RESOURCE_EXHAUSTED etc.
            print(f"patch {shape} failed: {type(e).__name__}")
            break
    return best
