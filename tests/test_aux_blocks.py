"""Shape/finiteness tests for the auxiliary attention heads and blocks
(SURVEY.md §2.2 tail: sa_module.py / attention_blocks.py /
DeformableBlock3D.py components unused by the flagship)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _rand(*shape, seed=0):
    return jnp.asarray(np.random.RandomState(seed).rand(*shape), jnp.float32)


def _run(model, *args, **kw):
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *args, **kw)
    return jax.jit(model.apply)(variables, *args, **kw)


def test_resformer_block_returns_mid_and_out():
    from xlstm_hved_tpu.nn.skr import ResFormerBlock

    x = _rand(1, 8, 8, 8, 4)
    mid, out = _run(ResFormerBlock(features=6, stride=2), x)
    assert mid.shape == (1, 4, 4, 4, 6)
    assert out.shape == (1, 4, 4, 4, 6)
    assert bool(jnp.isfinite(out).all())


def test_resbottleneck_quarter_width():
    from xlstm_hved_tpu.nn.skr import ResBottleneck

    x = _rand(1, 8, 8, 8, 8)
    y = _run(ResBottleneck(features=8), x)
    assert y.shape == x.shape
    # ReLU output is non-negative (norm != GROUP applies final act)
    assert float(y.min()) >= 0.0


def test_scale_upsample_doubles_resolution():
    from xlstm_hved_tpu.nn.skr import ScaleUpsample

    x = _rand(1, 4, 4, 4, 3)
    y = _run(ScaleUpsample(scale_factor=2), x)
    assert y.shape == (1, 8, 8, 8, 3)
    y2 = _run(ScaleUpsample(scale_factor=2, use_deconv=True, features=5), x)
    assert y2.shape == (1, 8, 8, 8, 5)


def test_attention_connection_scalar_gate():
    from xlstm_hved_tpu.nn.skr import AttentionConnection

    feat = _rand(1, 4, 4, 4, 2)
    att = jnp.zeros((1, 4, 4, 4, 1))
    y = _run(AttentionConnection(factor=1.0), feat, att)
    np.testing.assert_allclose(np.asarray(y), np.asarray(feat), rtol=1e-6)


def test_attention_gate_masks_skip():
    from xlstm_hved_tpu.nn.skr import AttentionGate

    g = _rand(1, 4, 4, 4, 8, seed=1)  # coarse gate signal
    x = _rand(1, 8, 8, 8, 4, seed=2)  # fine skip
    y = _run(AttentionGate(features_int=4), g, x)
    assert y.shape == x.shape
    assert bool(jnp.isfinite(y).all())


def test_parallel_decoder_and_fcn_head_fuse_three_scales():
    from xlstm_hved_tpu.nn.skr import FCNHead, ParallelDecoder

    x3 = _rand(1, 8, 8, 8, 8, seed=3)
    x4 = _rand(1, 4, 4, 4, 16, seed=4)
    x5 = _rand(1, 2, 2, 2, 32, seed=5)
    y = _run(ParallelDecoder(out_features=3), x3, x4, x5)
    assert y.shape == (1, 8, 8, 8, 3)
    y2 = _run(FCNHead(out_features=3), x3, x4, x5)
    assert y2.shape == (1, 8, 8, 8, 3)


def test_senet3d_gates_channels():
    from xlstm_hved_tpu.nn.skr import SENet3D

    x = _rand(2, 4, 4, 4, 16, seed=6)
    y = _run(SENet3D(ratio=4), x)
    assert y.shape == x.shape
    # sigmoid gate in (0, 1): output magnitude bounded by input
    assert float(jnp.abs(y).max()) <= float(jnp.abs(x).max()) + 1e-6


def test_att_deform_conv3d_shapes():
    from xlstm_hved_tpu.ops.deform import AttDeformConv3d

    x = _rand(1, 6, 6, 6, 8, seed=7)
    y = _run(AttDeformConv3d(features=5, se_ratio=4), x)
    assert y.shape == (1, 6, 6, 6, 5)
    assert bool(jnp.isfinite(y).all())


def test_deform_conv_zero_offsets_match_dense_grid():
    """With zero-init offset conv, the gather degenerates to the regular
    dense sampling grid — output must be finite and offset-free at init."""
    from xlstm_hved_tpu.ops.deform import DeformConv3d

    x = _rand(1, 6, 6, 6, 4, seed=8)
    model = DeformConv3d(features=4, kernel_size=3)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    # offset conv is zero-initialized -> offsets are exactly the bias (zero)
    off_kernel = variables["params"]["offset_conv"]["kernel"]
    np.testing.assert_allclose(np.asarray(off_kernel), 0.0)
    y = jax.jit(model.apply)(variables, x)
    assert bool(jnp.isfinite(y).all())


def test_decoder_stage_non_mvae_rsm_atten():
    """Non-MVAE RSM joining through AttenModule (reference Decoder with
    RSM=True, MVAE=False, buildingblocks.py:676-700 — a path the reference
    builds but whose forward crashes; wired and exercised here)."""
    from xlstm_hved_tpu.nn.blocks import DecoderStage

    r = np.random.RandomState(0)
    x = jnp.asarray(r.rand(1, 4, 4, 4, 64), jnp.float32)       # coarse
    # non-MVAE invariant: decoder features == multi_stream * per-stream C
    encs = [jnp.asarray(r.rand(1, 8, 8, 8, 8), jnp.float32)
            for _ in range(4)]                                  # 4 streams
    recons = [jnp.asarray(r.rand(1, 8, 8, 8, 8), jnp.float32)
              for _ in range(4)]
    stage = DecoderStage(features=32, rsm=True, mvae=False, order="ilc")
    variables = jax.jit(
        lambda k: stage.init(k, encs, x, None, False, recons)
    )(jax.random.PRNGKey(0))
    out = jax.jit(
        lambda v: stage.apply(v, encs, x, None, False, recons)
    )(variables)
    assert out.shape == (1, 8, 8, 8, 32)
    assert np.all(np.isfinite(np.asarray(out)))
