"""Reference init scheme (/root/reference/utils.py:191-215 init_weights).

The reference protocol applies `model.apply(init_weights)` after every model
construction (train.py:145-147, Pretrain.py:149-151):

  - nn.Conv3d:   kaiming_normal_ weights, biases ~ N(0, 1)
  - nn.Linear:   xavier_normal_  weights, biases ~ N(0, 1)
  - BatchNorm3d: weight ~ N(1, 0.02), bias = 0
  - everything else (InstanceNorm3d, Conv1d, the vendored ViL inits)
    untouched -> torch defaults.

The N(0, 1) conv biases are the behaviorally loud part: every sigmoid head
starts spatially varied instead of 0.5-flat, and the round-5 ET control
showed the reference chain learning the ET channel from this basin while a
zero-bias start suppressed it.

This module re-applies that scheme to an already-initialized flax param
tree. Folded multi-stream convs keep their structural zero off-blocks
(stream separation is semantic, not init): kernels are re-drawn through the
existing nonzero mask with per-output-channel fan-in, which reproduces
per-stream kaiming exactly.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def _kaiming_std(mask_col_fan_in):
    # torch kaiming_normal_ default: gain = sqrt(2) (leaky_relu, a=0),
    # std = gain / sqrt(fan_in)
    return jnp.sqrt(2.0 / jnp.maximum(mask_col_fan_in, 1.0))


def _is_norm_dict(d: dict) -> bool:
    return "scale" in d


# path markers of the reference's true nn.Linear layers (everything else
# with a 2D kernel is a pointwise conv = torch Conv3d(1x1x1) -> kaiming)
_LINEAR_MARKERS = ("fc_", "igate", "fgate", "proj_up", "proj_down")
# subtrees init_weights does not dispatch on (torch Conv1d)
_SKIP_MARKERS = ("conv1d",)


def reference_init(params: Any, rng: jax.Array) -> Any:
    """Return a new param tree with the reference init_weights distribution.

    Rules (mirroring exactly which torch module classes init_weights
    touches — it dispatches on isinstance, so custom modules and Conv1d are
    left at their own defaults):
      - "kernel" leaves are convs (kaiming normal) unless their path names
        one of the reference's true nn.Linear layers (DuSE fc_*; ViL
        igate/fgate/proj_up/proj_down) -> xavier normal. Our pointwise
        Conv1x1 stores 2D kernels but corresponds to torch Conv3d(1x1x1),
        so shape alone cannot make this call. Structural zeros of the old
        kernel are preserved and fan-in is counted through the mask (per
        output channel); all-zero kernels (the zero-INIT ViL gate Linears)
        are redrawn dense, as torch's xavier overwrite does.
      - "bias" sibling of a "kernel" -> N(0, 1).
      - the ViL causal conv ("conv1d" in path) is untouched: it is a torch
        Conv1d, which init_weights does not dispatch on.
      - headwise q/k/v projections store "weight" (not "kernel") and are
        untouched — they are custom modules, not nn.Linear.
      - dict with "scale" (norm layers): BatchNorm paths ("BatchNorm" flax
        auto-name or the DuSE "bn_*" names) get scale ~ N(1, 0.02),
        bias = 0; instance-norm scales are untouched (init_weights skips
        InstanceNorm3d).
    """
    leaves_with_paths = jax.tree_util.tree_leaves_with_path(params)
    n = len(leaves_with_paths)
    keys = jax.random.split(rng, max(n, 1))
    key_of = {jax.tree_util.keystr(p): keys[i]
              for i, (p, _) in enumerate(leaves_with_paths)}

    def walk(tree, path=""):
        if not isinstance(tree, dict):
            return tree
        out = {}
        is_norm = _is_norm_dict(tree)
        has_kernel = "kernel" in tree and hasattr(tree["kernel"], "ndim")
        for name, sub in tree.items():
            sub_path = f"{path}['{name}']"
            if isinstance(sub, dict):
                out[name] = walk(sub, sub_path)
                continue
            key = key_of.get(sub_path)
            leaf = sub
            if any(mk in sub_path for mk in _SKIP_MARKERS):
                out[name] = leaf
            elif has_kernel and name == "kernel" and leaf.ndim >= 2:
                mask = (leaf != 0).astype(leaf.dtype)
                # an ALL-zero kernel is an init choice (the ViL i/f gate
                # Linears zero-init their weights, vision_lstm.py:341-348),
                # not structural sparsity — and the reference's init_weights
                # xavier-overwrites those Linears like any other; redraw
                # them dense. Block-diagonal folded convs always have
                # nonzero diagonal blocks, so they keep their mask.
                mask = jnp.where(jnp.any(mask > 0), mask,
                                 jnp.ones_like(mask))
                fan_in = jnp.sum(mask.reshape(-1, leaf.shape[-1]), axis=0)
                is_linear = (leaf.ndim == 2 and
                             any(mk in sub_path for mk in _LINEAR_MARKERS))
                if is_linear:
                    # xavier over the full matrix fan (plain nn.Linear)
                    std = jnp.sqrt(2.0 / jnp.maximum(
                        fan_in + jnp.float32(leaf.shape[-1]), 1.0))
                else:
                    std = _kaiming_std(fan_in)
                w = jax.random.normal(key, leaf.shape, jnp.float32) * std
                out[name] = (w * mask).astype(leaf.dtype)
            elif has_kernel and name == "bias":
                out[name] = jax.random.normal(
                    key, leaf.shape, jnp.float32).astype(leaf.dtype)
            elif (is_norm and name == "scale"
                  and ("BatchNorm" in path or "bn_" in path)):
                out[name] = (1.0 + 0.02 * jax.random.normal(
                    key, leaf.shape, jnp.float32)).astype(leaf.dtype)
            elif (is_norm and name == "bias"
                  and ("BatchNorm" in path or "bn_" in path)):
                out[name] = jnp.zeros_like(leaf)
            else:
                out[name] = leaf
        return out

    return walk(params)
