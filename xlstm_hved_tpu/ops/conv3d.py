"""Fast 3D convolution for thin-channel volumes: 2D-slab decomposition.

XLA:TPU's direct 3D conv lowering is 6-40x off bandwidth at this model's
channel widths (4-32). An exact decomposition runs k_d optimized 2D convs
over depth slabs folded into the batch axis and accumulates depth-shifted
results:

    out[d] = sum_kd conv2d(x[d + kd - pad], w[kd])

Measured at 128^3 (device-loop timing): 7^3 conv 4->16: 42.2 -> 6.8 ms;
3^3 conv 16->16: 6.8 -> 4.3 ms; 3^3 stride-2: 5.1 -> 2.9 ms.

Padding is torch-style symmetric ((k-1)//2 per side) — the reference's
Conv3d(padding=1) convention — which XLA's "SAME" only matches at stride 1.
Differentiable (plain XLA ops). Pointwise (k=1, stride 1) convs fall back to
the native path.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def conv3d_slab(
    x: jnp.ndarray,       # (B, D, H, W, Cin)
    w: jnp.ndarray,       # (kd, kh, kw, Cin, Cout)
    stride: int = 1,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    kd, kh, kw = w.shape[:3]
    B, D, H, W, Cin = x.shape
    pad_d = (kd - 1) // 2
    pad_hw = [((kh - 1) // 2,) * 2, ((kw - 1) // 2,) * 2]

    if kd == 1 and kh == 1 and kw == 1:
        out = jax.lax.conv_general_dilated(
            x, w, (stride,) * 3, [(0, 0)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    else:
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
