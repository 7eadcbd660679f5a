"""Evaluation engine: sliding-window whole-volume inference and the
15-subset missing-modality sweep.

TPU-native re-design of /root/reference/evaluation.py:279-498 (eval_overlap)
and /root/reference/test.py:78-102 (the per-subset Python loop):
- patch origins form a STATIC grid (shape-dependent only) including residual
  windows, fixing the reference's list-arithmetic TypeError on non-divisible
  volumes (evaluation.py:317-321, SURVEY.md §4 defect 5);
- the window loop is a lax.scan with on-device scatter-add accumulation
  (sum / count buffers) — no host round-trips per window;
- the 15-subset sweep is a vmapped keep-mask axis (chunked with lax.map to
  bound memory) instead of 15 full passes from Python;
- dropped modalities are zeroed in the input like the reference
  (evaluation.py:306-307) — the model additionally receives the keep mask.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from xlstm_hved_tpu.utils.subsets import SUBSET_MASKS


def window_origins(dim: int, patch: int, stride: int) -> Tuple[int, ...]:
    """Start offsets covering [0, dim) with a final residual window ending at
    dim - patch (semantics of evaluation.py:310-321, fixed)."""
    if dim <= patch:
        return (0,)
    starts = list(range(0, dim - patch + 1, stride))
    if starts[-1] != dim - patch:
        starts.append(dim - patch)
    return tuple(starts)


def origin_grid(shape: Sequence[int], patch: Sequence[int],
                stride: Sequence[int]) -> np.ndarray:
    """(N, 3) int32 array of window origins (static, host-side)."""
    ds = window_origins(shape[0], patch[0], stride[0])
    hs = window_origins(shape[1], patch[1], stride[1])
    ws = window_origins(shape[2], patch[2], stride[2])
    grid = [(d, h, w) for d in ds for h in hs for w in ws]
    return np.asarray(grid, dtype=np.int32)


def make_sliding_window(
    apply_fn: Callable,
    patch: Sequence[int],
    stride: Optional[Sequence[int]] = None,
    out_channels: int = 3,
    recon_channels: int = 0,
):
    """Build a jitted whole-volume predictor.

    apply_fn(variables, x_patch, keep) must return (seg_probs, recon|None)
    with seg probs (B, *patch, out_channels).

    Returns predict(variables, x, keep) -> (seg, recon|None) averaged over
    overlapping windows.
    """
    patch = tuple(patch)
    stride = tuple(stride) if stride is not None else patch

    @functools.partial(jax.jit, static_argnames=())
    def predict(variables, x, keep):
        B = x.shape[0]
        vol = x.shape[1:4]
        # zero dropped channels of the input (evaluation.py:306-307)
        x = x * keep.reshape((1,) * 4 + (-1,)).astype(x.dtype)
        grid = jnp.asarray(origin_grid(vol, patch, stride))

        seg_sum = jnp.zeros((B, *vol, out_channels), jnp.float32)
        rec_sum = (jnp.zeros((B, *vol, recon_channels), jnp.float32)
                   if recon_channels else None)
        count = jnp.zeros((1, *vol, 1), jnp.float32)
        ones_patch = jnp.ones((1, *patch, 1), jnp.float32)

        def body(carry, origin):
            seg_sum, rec_sum, count = carry
            d, h, w = origin[0], origin[1], origin[2]
            crop = jax.lax.dynamic_slice(
                x, (0, d, h, w, 0), (B, *patch, x.shape[-1]))
            seg_p, rec_p = apply_fn(variables, crop, keep)
            cur = jax.lax.dynamic_slice(
                seg_sum, (0, d, h, w, 0), (B, *patch, out_channels))
            seg_sum = jax.lax.dynamic_update_slice(
                seg_sum, cur + seg_p.astype(jnp.float32), (0, d, h, w, 0))
            if rec_sum is not None:
                curr = jax.lax.dynamic_slice(
                    rec_sum, (0, d, h, w, 0), (B, *patch, recon_channels))
                rec_sum = jax.lax.dynamic_update_slice(
                    rec_sum, curr + rec_p.astype(jnp.float32), (0, d, h, w, 0))
            curc = jax.lax.dynamic_slice(
                count, (0, d, h, w, 0), (1, *patch, 1))
            count = jax.lax.dynamic_update_slice(
                count, curc + ones_patch, (0, d, h, w, 0))
            return (seg_sum, rec_sum, count), None

        (seg_sum, rec_sum, count), _ = jax.lax.scan(
            body, (seg_sum, rec_sum, count), grid)
        seg = seg_sum / count
        rec = rec_sum / count if rec_sum is not None else None
        return seg, rec

    return predict


def make_subset_sweep(
    apply_fn: Callable,
    patch: Sequence[int],
    stride: Optional[Sequence[int]] = None,
    out_channels: int = 3,
    recon_channels: int = 0,
    subset_chunk: int = 1,
):
    """15-subset missing-modality evaluation as chunked-vmapped device passes
    inside ONE jitted program (replaces the Python loop at
    /root/reference/test.py:78-102).

    subset_chunk trades vmap width vs sequential lax.map steps. Measured at
    128^3 on a v5e chip: chunk=1 450 ms, chunk=3 496 ms, chunk=5 520 ms for
    the full 15-subset sweep — batching volumes is slower per volume on this
    model (memory pressure), so sequential-within-jit is the default.

    Returns sweep(variables, x) -> seg probs of shape (15, B, D, H, W, C).
    """
    predict = make_sliding_window(apply_fn, patch, stride, out_channels,
                                  recon_channels)
    n_subsets = len(SUBSET_MASKS)
    if not 1 <= subset_chunk <= n_subsets:
        raise ValueError(f"subset_chunk must be in [1, {n_subsets}], "
                         f"got {subset_chunk}")
    # any chunk size works: pad the subset table to a chunk multiple with
    # repeats of the last row and drop the padded outputs afterwards
    n_pad = (-n_subsets) % subset_chunk
    table = np.concatenate(
        [SUBSET_MASKS, np.repeat(SUBSET_MASKS[-1:], n_pad, axis=0)])
    keeps = jnp.asarray(table)  # (15 + n_pad, 4)

    @jax.jit
    def sweep(variables, x):
        chunks = keeps.reshape(-1, subset_chunk, keeps.shape[1])

        def run_chunk(keep_chunk):
            return jax.vmap(lambda k: predict(variables, x, k)[0])(keep_chunk)

        segs = jax.lax.map(run_chunk, chunks)
        return segs.reshape((-1,) + segs.shape[2:])[:n_subsets]

    if not recon_channels:
        return sweep

    @jax.jit
    def sweep_with_recon(variables, x):
        chunks = keeps.reshape(-1, subset_chunk, keeps.shape[1])

        def run_chunk(keep_chunk):
            return jax.vmap(lambda k: predict(variables, x, k))(keep_chunk)

        segs, recons = jax.lax.map(run_chunk, chunks)
        return (segs.reshape((-1,) + segs.shape[2:])[:n_subsets],
                recons.reshape((-1,) + recons.shape[2:])[:n_subsets])

    return sweep_with_recon


def make_hoisted_subset_sweep(
    model,
    patch: Sequence[int],
    stride: Optional[Sequence[int]] = None,
    out_channels: int = 3,
    recon_channels: int = 0,
):
    """15-subset sweep with the subset-invariant forward prefix hoisted out
    of the subset loop (round-3 VERDICT #2; replaces the 15 full forwards of
    /root/reference/test.py:78-102 per window with 1 prefix + 15 suffixes).

    Why this is exact (tested in tests/test_engine.py): a dropped modality's
    stream features only ever reach its own product-of-experts expert, which
    the keep-mask removes from the product entirely (ops/poe.py) — so kept
    streams see identical inputs whether the dropped channels were zeroed or
    not, and the prefix can run ONCE on the full input. The hoist boundary
    is model-dependent: the full multistream encoder+DRB stack for non-skr
    MVAE models, level 0 only for skip-return models (the skr gate chain is
    derived from the subset-masked input and feeds every kept stream's
    deeper encoder levels — see models/hved.py mode notes).

    Returns sweep(variables, x) -> seg (15, B, D, H, W, C) [, recon].
    """
    body = _hoisted_sweep_body(model, patch, stride, out_channels,
                               recon_channels)
    keeps = jnp.asarray(SUBSET_MASKS)  # (15, 4)

    @jax.jit
    def sweep(variables, x):
        return body(variables, x, keeps)

    return sweep


def _hoisted_sweep_body(model, patch, stride, out_channels, recon_channels):
    """Unjitted hoisted-sweep kernel parameterized by the keep-table, shared
    by the single-device and mesh-sharded sweeps.

    Returns body(variables, x, keeps (S, 4)) -> seg (S, B, *vol, C) [, rec].
    """
    patch = tuple(patch)
    stride = tuple(stride) if stride is not None else patch
    recon = recon_channels > 0

    def body(variables, x, keeps):
        n_subsets = keeps.shape[0]
        B = x.shape[0]
        vol = x.shape[1:4]
        grid = jnp.asarray(origin_grid(vol, patch, stride))

        seg_sum = jnp.zeros((n_subsets, B, *vol, out_channels), jnp.float32)
        rec_sum = (jnp.zeros((n_subsets, B, *vol, recon_channels), jnp.float32)
                   if recon else None)
        count = jnp.zeros((1, *vol, 1), jnp.float32)
        ones_patch = jnp.ones((1, *patch, 1), jnp.float32)

        def step(carry, origin):
            seg_sum, rec_sum, count = carry
            d, h, w = origin[0], origin[1], origin[2]
            crop = jax.lax.dynamic_slice(
                x, (0, d, h, w, 0), (B, *patch, x.shape[-1]))
            pref = model.apply(variables, crop, mode="prefix",
                               deterministic=True)

            def one_subset(keep):
                crop_m = crop * keep.reshape((1,) * 4 + (-1,)).astype(
                    crop.dtype)
                out = model.apply(variables, crop_m, keep=keep,
                                  mode="suffix", prefix=pref, recon=recon,
                                  deterministic=True)
                rec = (out.recon.astype(jnp.float32) if recon
                       else jnp.zeros((), jnp.float32))
                return out.seg.astype(jnp.float32), rec

            segs, recs = jax.lax.map(one_subset, keeps)

            cur = jax.lax.dynamic_slice(
                seg_sum, (0, 0, d, h, w, 0),
                (n_subsets, B, *patch, out_channels))
            seg_sum = jax.lax.dynamic_update_slice(
                seg_sum, cur + segs, (0, 0, d, h, w, 0))
            if recon:
                curr = jax.lax.dynamic_slice(
                    rec_sum, (0, 0, d, h, w, 0),
                    (n_subsets, B, *patch, recon_channels))
                rec_sum = jax.lax.dynamic_update_slice(
                    rec_sum, curr + recs, (0, 0, d, h, w, 0))
            curc = jax.lax.dynamic_slice(
                count, (0, d, h, w, 0), (1, *patch, 1))
            count = jax.lax.dynamic_update_slice(
                count, curc + ones_patch, (0, d, h, w, 0))
            return (seg_sum, rec_sum, count), None

        (seg_sum, rec_sum, count), _ = jax.lax.scan(
            step, (seg_sum, rec_sum, count), grid)
        seg = seg_sum / count
        if recon:
            return seg, rec_sum / count
        return seg

    return body


def make_sharded_subset_sweep(
    model,
    mesh,
    patch: Sequence[int],
    stride: Optional[Sequence[int]] = None,
    out_channels: int = 3,
    recon_channels: int = 0,
):
    """15-subset sweep sharded over the mesh 'data' axis (round-3 VERDICT
    #5; BASELINE.md north star "15-subset eval as a single sharded device
    pass" on a v5e-8, replacing the reference's sequential per-subset loop
    /root/reference/test.py:78-102 across chips instead of within one).

    Subsets are padded to a multiple of the data-axis size with repeats of
    the full subset and distributed via shard_map: each device runs the
    hoisted sweep for its local keep-masks (the per-window prefix is
    replicated compute, ~10-20% of a subset's cost); outputs gather on the
    subset axis with no cross-device communication inside the pass.

    Equality vs the single-device sweep is asserted on a virtual-8-CPU mesh
    in tests/test_parallel.py and the multichip dryrun.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    n_dev = mesh.shape["data"]
    n_subsets = len(SUBSET_MASKS)
    n_pad = (-n_subsets) % n_dev
    table = np.concatenate(
        [SUBSET_MASKS, np.repeat(SUBSET_MASKS[-1:], n_pad, axis=0)])
    keeps = jnp.asarray(table)  # (15 + n_pad, 4)
    body = _hoisted_sweep_body(model, patch, stride, out_channels,
                               recon_channels)
    recon = recon_channels > 0

    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P("data")),
        out_specs=(P("data"), P("data")) if recon else P("data"),
        check_rep=False)

    @jax.jit
    def sweep(variables, x):
        out = sharded(variables, x, keeps)
        if recon:
            return out[0][:n_subsets], out[1][:n_subsets]
        return out[:n_subsets]

    return sweep


def default_apply_fn(model, *, recon: bool = False):
    """Standard eval-mode apply for HVEDFusionNet (valid=True semantics:
    deterministic latents, /root/reference/RA_HVED.py:741-747)."""

    def apply_fn(variables, x_patch, keep):
        out = model.apply(variables, x_patch, keep=keep, recon=recon,
                          deterministic=True)
        return out.seg, out.recon

    return apply_fn


def label_volume_from_probs(seg: np.ndarray, threshold: float = 0.5) -> np.ndarray:
    """Nested WT/TC/ET probabilities -> BraTS label volume with the
    reference's remap WT->2, TC->1, ET->4 (evaluation.py:442-447)."""
    wt = seg[..., 0] > threshold
    tc = seg[..., 1] > threshold
    et = seg[..., 2] > threshold
    out = np.zeros(seg.shape[:-1], dtype=np.uint8)
    out[wt] = 2
    out[wt & tc] = 1
    out[wt & tc & et] = 4
    return out
