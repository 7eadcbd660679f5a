"""Fast 3D convolution for thin-channel volumes.

XLA:TPU's direct 3D conv lowering is far off bandwidth at this model's
channel widths (measured 4.37 ms for a 3^3 16ch conv at 128^3 that peaks at
0.17 ms/slice-pass). Two exact reformulations are used instead:

1. (historical) 2D-slab decomposition — k_d separate 2D convs over
   depth-folded batch with depth-shifted accumulation. Measured 1.82 ms for
   the 3^3/16ch/128^3 case: the k_d passes and the roll/mask/add chain pay
   ~3x HBM traffic.
2. (current) **depth-fold-into-channels**: stack the k_d depth-shifted
   views on the channel axis and run ONE 2D conv with K = k_d*Cin:

       x3[b, d, h, w, j*Cin + ci] = xpad[b, d - pad + j, h, w, ci]
       out = conv2d(x3 reshaped to (B*D, H, W, kd*Cin), w2)[::stride_d]

   Mathematically identical (same tap set per output voxel); measured
   0.60 ms for the same case — XLA's 2D conv runs at ~790 GB/s (bandwidth
   bound), and the single fused concat+conv pass beats the k_d-pass slab 3x.

Padding is torch-style symmetric ((k-1)//2 leading) — the reference's
Conv3d(padding=1) convention (/root/reference/buildingblocks.py) — which
XLA's "SAME" only matches at stride 1. Supports any kernel size (odd and
even, e.g. the discriminator's k=4) and uniform stride. Differentiable
(plain XLA ops). Pointwise (k=1) convs use the native path.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

# Global default formulation for k>1 convs: "depthfold" or "slab".
# Round-1 measured slab winning in-graph (52.9 vs 57.8 ms full forward),
# but that inverted once pointwise convs and kd>=5 kernels left the slab
# path: with the round-2 graph, global depthfold benches 21.6 ms vs slab's
# 26.2 (46.2 vs 38.2 vol/s) — the roll/mask/add chains were moving ~3x the
# conv's own bytes at 128^3 (HLO traffic dump, scripts/hlo_parse.py).
# Overridable per call; env var for experiments.
_DEFAULT_MODE = os.environ.get("XHVED_CONV3D_MODE", "depthfold")
# depthfold -> slab fallback threshold on kd*Cin (see mode choice below)
_FOLD_LIMIT = int(os.environ.get("XHVED_CONV3D_FOLD_LIMIT", "64"))


def set_conv3d_mode(mode: str) -> None:
    global _DEFAULT_MODE
    assert mode in ("depthfold", "slab"), mode
    _DEFAULT_MODE = mode


def conv3d_slab(
    x: jnp.ndarray,       # (B, D, H, W, Cin)
    w: jnp.ndarray,       # (kd, kh, kw, Cin, Cout)
    stride: int = 1,
    bias: Optional[jnp.ndarray] = None,
    mode: Optional[str] = None,
    padding: Optional[tuple] = None,  # ((d_lo,d_hi),(h_lo,h_hi),(w_lo,w_hi))
) -> jnp.ndarray:
    kd, kh, kw, Cin, Cout = w.shape
    B, D, H, W, _ = x.shape
    if padding is not None:
        # Explicit torch-style padding (needed where the symmetric default
        # is wrong, e.g. the PatchGAN discriminator's even k=4 with p=1,
        # Conv3d(k=4, s, p=1) — /root/reference/buildingblocks.py:342-358).
        # Depth is pre-padded and handled as a VALID conv via the same
        # depth-fold: windows j : j+Dout of the padded volume.
        (pd_lo, pd_hi), ph, pw = padding
        xp = jnp.pad(x, ((0, 0), (pd_lo, pd_hi), (0, 0), (0, 0), (0, 0)))
        dp = D + pd_lo + pd_hi
        dout = dp - kd + 1
        x3 = jnp.concatenate([xp[:, j:j + dout] for j in range(kd)], axis=-1)
        x2 = x3.reshape(B * dout, H, W, kd * Cin)
        w2 = w.transpose(1, 2, 0, 3, 4).reshape(kh, kw, kd * Cin, Cout)
        y = jax.lax.conv_general_dilated(
            x2, w2, (stride, stride), [tuple(ph), tuple(pw)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y.reshape(B, dout, *y.shape[1:])
        out = y[:, ::stride] if stride > 1 else y
        if bias is not None:
            out = out + bias.astype(out.dtype)
        return out
    pad_d = (kd - 1) // 2
    pad_hw = [((kh - 1) // 2,) * 2, ((kw - 1) // 2,) * 2]
    if mode is None:
        mode = _DEFAULT_MODE
        if mode == "depthfold" and kd * Cin > _FOLD_LIMIT:
            # Wide-input convs (decoder joins: Cin = 3f after the RSM
            # concat): depthfold's kd*Cin-channel concat materializes +
            # relayouts ~2x the volume (HLO shows 302 MB reshape+copy at
            # 128^3/36ch) and the probe has slab ahead there (2.48 vs
            # 3.33 ms at 48ch). Narrow convs (encoders, gates, DRBs)
            # stay depthfold. Explicit mode= requests are honored.
            mode = "slab"
        elif mode == "slab" and kd >= 5:
            # large depth kernels: the kd-pass slab's shift/add chain
            # dominates; depthfold halves the 7^3 gate convs (0.93 vs
            # 1.91 ms isolated). Explicit mode= requests are honored.
            mode = "depthfold"

    if kd == 1 and kh == 1 and kw == 1:
        # pointwise: the 5D NDHWC lowering measures 1.74 ms where the
        # depth-folded 2D form measures 0.09-0.24 ms (19x) at 128^3/16ch
        x2 = x.reshape(B * D, H, W, Cin)
        y = jax.lax.conv_general_dilated(
            x2, w[0], (stride, stride), [(0, 0)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y.reshape(B, D, *y.shape[1:])
        out = y[:, ::stride] if stride > 1 else y
    elif mode == "depthfold":
        # depth-fold: windows j = 0..kd-1 of the depth-padded volume, stacked
        # on channels; right pad covers even kernels (kd-1-pad_d >= pad_d)
        xp = jnp.pad(x, ((0, 0), (pad_d, kd - 1 - pad_d),
                         (0, 0), (0, 0), (0, 0)))
        x3 = jnp.concatenate([xp[:, j:j + D] for j in range(kd)], axis=-1)
        x2 = x3.reshape(B * D, H, W, kd * Cin)
        # channel index j*Cin + ci must pick w[j, dy, dx, ci, co]
        w2 = w.transpose(1, 2, 0, 3, 4).reshape(kh, kw, kd * Cin, Cout)
        y = jax.lax.conv_general_dilated(
            x2, w2, (stride, stride), pad_hw,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y.reshape(B, D, *y.shape[1:])
        if stride > 1:
            y = y[:, ::stride]
        out = y
    else:
        # slab: kd separate 2D convs with depth-shifted accumulation
        x2 = x.reshape(B * D, H, W, Cin)
        idx = jnp.arange(D)
        out = None
        for k in range(kd):
            y = jax.lax.conv_general_dilated(
                x2, w[k], (stride, stride), pad_hw,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = y.reshape(B, D, *y.shape[1:])
            shift = k - pad_d
            if shift:
                y = jnp.roll(y, -shift, axis=1)
                valid = (idx + shift >= 0) & (idx + shift < D)
                y = jnp.where(valid[None, :, None, None, None], y,
                              jnp.zeros((), y.dtype))
            if stride > 1:
                y = y[:, ::stride]
            out = y if out is None else out + y
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
