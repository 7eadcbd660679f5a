"""conv3d_slab formulation parity: slab vs depthfold vs direct XLA conv3d
across kernel sizes (odd/even), strides, and non-divisible depths — both
modes must match the torch-padding-convention reference exactly."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xlstm_hved_tpu.ops.conv3d import conv3d_slab

CASES = [
    (3, 1, 8), (3, 2, 8), (7, 1, 8), (1, 1, 8), (1, 2, 8),
    (4, 2, 8), (5, 1, 9), (3, 2, 9),
]


def _reference(x, w, stride):
    """Explicit torch-style pad + VALID direct 3D conv."""
    k = w.shape[0]
    p = (k - 1) // 2
    # depth gets right-heavy padding for even kernels (taps d-p .. d+k-1-p);
    # H/W stay symmetric (torch Conv3d(padding=p))
    xp = jnp.pad(x, ((0, 0), (p, k - 1 - p), (p, p), (p, p), (0, 0)))
    return jax.lax.conv_general_dilated(
        xp, w, (stride,) * 3, [(0, 0)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


@pytest.mark.parametrize("k,s,D", CASES)
@pytest.mark.parametrize("mode", ["slab", "depthfold"])
def test_conv3d_mode_matches_direct(k, s, D, mode):
    rng = np.random.RandomState(k * 100 + s * 10 + D)
    x = jnp.asarray(rng.randn(2, D, 9, 10, 5), jnp.float32)
    w = jnp.asarray(rng.randn(k, k, k, 5, 6) * 0.1, jnp.float32)
    y = conv3d_slab(x, w, stride=s, mode=mode)
    yr = _reference(x, w, s)
    d = min(y.shape[1], yr.shape[1])
    np.testing.assert_allclose(np.asarray(y[:, :d]), np.asarray(yr[:, :d]),
                               atol=2e-5)


def test_conv3d_modes_agree_with_bias():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 6, 6, 6, 4), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 3, 4, 8) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(8), jnp.float32)
    ya = conv3d_slab(x, w, bias=b, mode="slab")
    yb = conv3d_slab(x, w, bias=b, mode="depthfold")
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), atol=2e-5)


def test_conv3d_modes_gradients_agree():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 5, 5, 5, 3), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 3, 3, 4) * 0.1, jnp.float32)

    def f(mode):
        return jax.grad(
            lambda w: jnp.sum(conv3d_slab(x, w, mode=mode) ** 2))(w)

    np.testing.assert_allclose(np.asarray(f("slab")),
                               np.asarray(f("depthfold")), atol=1e-4)


@pytest.mark.parametrize("k,s", [(4, 1), (4, 2), (3, 1), (3, 2)])
def test_conv3d_explicit_padding_matches_direct(k, s):
    """The explicit-padding path (PatchGAN discriminator: even k=4 with
    torch p=1 on EVERY axis, /root/reference/buildingblocks.py:342-358)
    must match a direct 3D conv with the same padding, including the
    depth-output length (D-1 at k=4 s=1 — not the symmetric default's D)."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 9, 10, 11, 5), jnp.float32)
    w = jnp.asarray(rng.randn(k, k, k, 5, 6) * 0.1, jnp.float32)
    pad = ((1, 1),) * 3
    y = conv3d_slab(x, w, stride=s, padding=pad)
    yref = jax.lax.conv_general_dilated(
        x, w, (s,) * 3, list(pad),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    assert y.shape == yref.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(yref), atol=2e-5)


def test_conv3d_explicit_padding_gradients_match_direct():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 8, 8, 8, 3), jnp.float32)
    w = jnp.asarray(rng.randn(4, 4, 4, 3, 4) * 0.1, jnp.float32)
    pad = ((1, 1),) * 3

    def direct(w):
        y = jax.lax.conv_general_dilated(
            x, w, (2,) * 3, list(pad),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return jnp.sum(y ** 2)

    def folded(w):
        return jnp.sum(conv3d_slab(x, w, stride=2, padding=pad) ** 2)

    np.testing.assert_allclose(np.asarray(jax.grad(folded)(w)),
                               np.asarray(jax.grad(direct)(w)), atol=1e-4)
