"""The HVED fusion engine — TPU-native re-design of AbstractFusion3DUNet
(/root/reference/RA_HVED.py:239-687) with its coupled decoders
(ReconDecoder :16-95, Seg_Recon_DuSFEDecoder :97-201) and the PatchGAN
Discriminator (:204-236).

Key structural departures from the reference (capability parity, not
structure parity):
- channels-last NDHWC everywhere; modality streams are folded into channel
  BLOCKS with block-diagonal dense convs (identical math to 4 module copies,
  26x faster than XLA's batched-weights conv lowering);
- subset selection is a boolean keep-mask, PoE is the masked product
  (ops/poe.py) — no data-dependent shapes under jit;
- ZeroLayerF drop semantics come from constant-mask multiplication;
- the mLSTM runs as a chunkwise scan (ops/mlstm.py) instead of materializing
  the (S, S) decay matrix;
- reparameterization noise comes from an explicit 'latent' PRNG collection.

Forward contract (matching /root/reference/RA_HVED.py:510-687): the model
takes the stacked 4-modality volume, a modality keep-mask (batch- or
per-instance), and flags seg/recon/deterministic; it returns an HVEDOutput
with seg probabilities, per-level expert (mu, logvar) stacks, and the shared
4-channel reconstruction.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from xlstm_hved_tpu.config import HVEDConfig, features_per_level
from xlstm_hved_tpu.nn.blocks import (
    BasicConv,
    BlockDiagConv,
    BlockDiagEncoderStage,
    BlockDiagSingleConv,
    Conv1x1,
    Conv3DFast,
    DecoderStage,
    EncoderStage,
    SingleConv,
    instance_norm,
    resize_trilinear,
)
from xlstm_hved_tpu.nn.dusfe import DuSEAttention
from xlstm_hved_tpu.nn.gates import DiscriminatorBlock, FusionModule
from xlstm_hved_tpu.nn.skr import SkrGate
from xlstm_hved_tpu.nn.vil import ViLLayer3D
from xlstm_hved_tpu.ops.poe import product_of_experts, reparametrize, stack_prior


class HVEDOutput(NamedTuple):
    seg: Optional[jnp.ndarray]            # (B, D, H, W, 3) probabilities
    mu: Tuple[jnp.ndarray, ...]           # per level (B, 5, D', H', W', C)
    logvar: Tuple[jnp.ndarray, ...]
    recon: Optional[jnp.ndarray]          # (B, D, H, W, 4)


class HoistedPrefix(NamedTuple):
    """Subset-invariant forward prefix for the hoisted 15-subset sweep
    (mode="prefix"/"suffix" below). Contains the per-level expert stacks of
    the hoisted multistream levels and, when more multistream levels remain
    (skip-return models hoist only level 0), the folded stream tensor at the
    hoist boundary."""

    mu: Tuple[jnp.ndarray, ...]
    logvar: Tuple[jnp.ndarray, ...]
    xs: Optional[jnp.ndarray]


class HVEDFusionNet(nn.Module):
    cfg: HVEDConfig

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,                      # (B, D, H, W, M)
        keep: Optional[jnp.ndarray] = None,  # (4,) or (B, 4) bool, True=present
        *,
        instance_missing: bool = False,
        seg: bool = True,
        recon: bool = False,
        deterministic: bool = False,
        train: bool = False,
        mode: str = "full",
        prefix: Optional[HoistedPrefix] = None,
    ) -> HVEDOutput:
        # mode="prefix"/"suffix" split the forward at the subset-invariance
        # boundary for the hoisted 15-subset sweep (engine/evaluate.py):
        #   prefix(x_full)  -> HoistedPrefix: everything that does NOT depend
        #                      on the modality keep-mask. A dropped stream's
        #                      features only ever reach its own PoE expert,
        #                      which the keep-mask zeroes out exactly
        #                      (ops/poe.py), so the prefix runs on the FULL
        #                      input and needs no per-subset variants.
        #   suffix(x_masked, keep, prefix) -> HVEDOutput for one subset.
        # For skip-return models the hoist stops after level 0: the skr gate
        # chain derives from the subset-MASKED input (x0_init -> skr_att,
        # /root/reference/RA_HVED.py:543-552 with eval masking at
        # evaluation.py:306-307) and multiplies every kept stream's encoder
        # input at levels >= 1, so deeper encoder levels are genuinely
        # subset-dependent — a full-encoder hoist is NOT exact there.
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        M = cfg.multi_stream
        B = x.shape[0]
        levels = cfg.num_levels
        enc_f = list(cfg.enc_f_maps)
        dec_f = list(cfg.dec_f_maps)
        latents = list(cfg.mvae_latents)

        # The MVAE VU path upsamples by an exact x2 per level (the reference
        # does the same: F.interpolate(size=(D*2, H*2, W*2)),
        # RA_HVED.py:596-598), so every spatial dim must survive `levels`
        # halvings exactly. Catch it at trace time with a real message
        # instead of a broadcast error deep in the graph.
        div = 2 ** levels
        bad = [s for s in x.shape[1:4] if s % div != 0]
        if cfg.mvae and bad:
            raise ValueError(
                f"spatial dims {x.shape[1:4]} must be divisible by "
                f"2^num_levels = {div} for the MVAE x2-upsample path "
                f"(same constraint as the reference's exact-x2 interpolate, "
                f"RA_HVED.py:596-598); pad or crop the input")

        n_ms = min(cfg.fusion_level, levels)  # multistream levels
        if mode not in ("full", "prefix", "suffix"):
            raise ValueError(f"unknown mode {mode!r}")
        if mode != "full":
            if not cfg.mvae or cfg.fusion:
                raise ValueError(
                    "hoisted prefix/suffix modes require an MVAE model "
                    "(fusion/plain multi-stream paths consume unmasked "
                    "stream features directly)")
            if mode == "suffix" and prefix is None:
                raise ValueError("mode='suffix' needs the HoistedPrefix")
        # levels whose encoder+DRB are subset-invariant (hoistable)
        hoist_ms = 0 if mode == "full" else (1 if cfg.skip_return else n_ms)

        if keep is None:
            if instance_missing:
                # infer per-instance presence from all-zero channels
                # (/root/reference/RA_HVED.py:513-515)
                keep = jnp.sum(jnp.abs(x), axis=(1, 2, 3)) != 0  # (B, M)
            else:
                keep = jnp.ones((M,), dtype=bool)
        keep = keep.astype(bool)
        if keep.ndim == 1:
            keep_b = jnp.broadcast_to(keep[None, :], (B, M))
        else:
            keep_b = keep

        # Optional stage-granular rematerialization: with cfg.remat, each
        # encoder/decoder stage recomputes its internals during backward so
        # only stage-boundary activations stay live (nn.remat preserves the
        # param tree — checkpoints are interchangeable). static_argnums mark
        # the python-bool `train` flag (and DecoderStage's static up_size),
        # counting self as arg 0.
        if cfg.remat:
            _BDEncStage = nn.remat(BlockDiagEncoderStage, static_argnums=(2,))
            _EncStage = nn.remat(EncoderStage, static_argnums=(2,))
            _DecStage = nn.remat(DecoderStage, static_argnums=(3, 4))
            _BDSingle = nn.remat(BlockDiagSingleConv, static_argnums=(2,))
        else:
            _BDEncStage = BlockDiagEncoderStage
            _EncStage = EncoderStage
            _DecStage = DecoderStage
            _BDSingle = BlockDiagSingleConv

        x_in = x.astype(dtype)
        x0 = x_in
        # Folded-stream layout: per-modality features live as channel BLOCKS
        # of one (B, D, H, W, M*C) tensor, and per-stream convs are
        # block-diagonal dense convs (nn/blocks.py::BlockDiagConv). This is
        # mathematically identical to the reference's per-stream module
        # copies but avoids XLA:TPU's pathological batched-weights conv
        # lowering (146 ms -> 5.6 ms per full-res conv) and quadruples lane
        # utilization of every elementwise op.
        # The Initial Block: per-stream 1x1 conv (RA_HVED.py:345-349); input
        # channel m IS stream m. In suffix mode the hoisted levels were
        # already computed; the stream tensor resumes at the hoist boundary.
        if mode == "suffix":
            xs = prefix.xs
        else:
            xs = BlockDiagConv(M, enc_f[0], kernel_size=1, dtype=dtype,
                               name="init_blocks")(x_in)

        mu_list, logvar_list = [], []
        rec_feats = []  # deep -> shallow after final insert-order
        seg_feats_nonmvae = []
        skr_feat = None
        rng_needed = cfg.mvae and not deterministic and mode != "prefix"
        latent_key = self.make_rng("latent") if rng_needed else None

        def latent_stage(level, mu_e, logvar_e):
            """Subset-DEPENDENT tail of one MVAE level: PoE over the kept
            experts -> reparameterize -> VU upsample (RA_HVED.py:588-603)."""
            pd_mu, pd_logvar = product_of_experts(mu_e, logvar_e, keep_b)
            if rng_needed:
                sub_key = jax.random.fold_in(latent_key, level)
            else:
                sub_key = None
            z = reparametrize(sub_key, pd_mu, pd_logvar,
                              deterministic=deterministic)
            z = z.astype(dtype)
            if cfg.mvae_reduction:
                # VU: 1x1 conv -> x2 trilinear -> depthwise conv
                # (RA_HVED.py:401-410, 598-603)
                z = BasicConv(dec_f[level], 1, dtype=dtype,
                              name=f"vu_{level}")(z)
                d, h, w = z.shape[1:4]
                z = resize_trilinear(z, (2 * d, 2 * h, 2 * w))
                z = BasicConv(dec_f[level], 3, groups=dec_f[level],
                              dtype=dtype, name=f"conv_block_{level}")(z)
            return z

        def skr_advance(skr_feat, level):
            """skip-return feature chain update (RA_HVED.py:617-621):
            level 0 initializes from the raw input via x0_init; each later
            level advances the chain with its own pooled encoder (E1: 4->8,
            E2: 8->16, E3: 16->32 for the flagship)."""
            if skr_feat is None:
                return Conv1x1(enc_f[0], dtype=dtype, name="x0_init")(x0)
            return _EncStage(
                features=enc_f[level],
                num_block=cfg.num_block[level],
                apply_pooling=True,
                basic_module=cfg.basic_module,
                order=cfg.layer_order,
                num_groups=cfg.num_groups,
                dtype=dtype,
                name=f"skr_encoder_{level}",
            )(skr_feat, train)

        for level in range(levels):
            multistream_level = level <= cfg.fusion_level - 1
            in_prefix = multistream_level and level < hoist_ms

            if mode == "suffix" and in_prefix:
                # hoisted level: encoder+DRB came precomputed; run only the
                # keep-dependent latent tail and the skr-chain bootstrap.
                mu_e, logvar_e = prefix.mu[level], prefix.logvar[level]
                mu_list.append(mu_e)
                logvar_list.append(logvar_e)
                rec_feats.insert(0, latent_stage(level, mu_e, logvar_e))
                if cfg.skip_return:
                    skr_feat = skr_advance(skr_feat, level)
                continue

            if multistream_level:
                # skip-return gating of every stream (RA_HVED.py:549-552);
                # the gate is shared across streams, so it broadcasts over
                # the folded channel blocks.
                if cfg.skip_return and skr_feat is not None:
                    gate = SkrGate(skr_feat.shape[-1], dtype=dtype,
                                   name=f"skr_att_{level}")(skr_feat, train=train)
                    xs = gate * xs + xs

                xs = _BDEncStage(
                    streams=M,
                    features=enc_f[level],
                    num_block=cfg.num_block[level],
                    apply_pooling=level > 0,
                    basic_module=cfg.basic_module,
                    order=cfg.layer_order,
                    dtype=dtype,
                    name=f"encoders_{level}",
                )(xs, train)

                def split_streams(t):
                    c = t.shape[-1] // M
                    return [t[..., m * c:(m + 1) * c] for m in range(M)]

                if cfg.fusion:
                    feats = [f * keep_b[:, m, None, None, None, None].astype(dtype)
                             for m, f in enumerate(split_streams(xs))]
                    # gate_channels = dec//rec_fac with rec_fac=2: the fused
                    # features feed the HALF-width recon ladder
                    # (RA_HVED.py:320,412)
                    fused, gated = FusionModule(
                        dec_f[level] // 2, mode="modal", in_modalities=M,
                        dtype=dtype, name=f"fusion_{level}",
                    )(feats)
                    rec_feats.insert(0, fused)
                    seg_feats_nonmvae.insert(0, feats)
                elif cfg.mvae:
                    if cfg.mvae_reduction:
                        drb = _BDSingle(
                            streams=M, features=2 * latents[level],
                            kernel_size=3, stride=2, order=cfg.layer_order,
                            dtype=dtype, name=f"drb_{level}",
                        )(xs, train)
                    else:
                        drb = xs  # latent params come straight off the encoder
                    # folded (B, ..., M*2L) -> (B, M, ..., L) each
                    sp = drb.shape[:-1]
                    drb = drb.reshape(sp + (M, -1))
                    drb = jnp.moveaxis(drb, -2, 1)
                    mod_mu = drb[..., : latents[level]]
                    mod_logvar = drb[..., latents[level]:]
                    mu_e, logvar_e = stack_prior(
                        mod_mu.astype(jnp.float32), mod_logvar.astype(jnp.float32))
                    mu_list.append(mu_e)
                    logvar_list.append(logvar_e)
                    if mode != "prefix":
                        rec_feats.insert(
                            0, latent_stage(level, mu_e, logvar_e))
                else:
                    # plain multi-stream concat (kept for completeness)
                    feats = [f * keep_b[:, m, None, None, None, None].astype(dtype)
                             for m, f in enumerate(split_streams(xs))]
                    rec_feats.insert(0, jnp.concatenate(feats, axis=-1))
                    seg_feats_nonmvae.insert(0, feats)

                if cfg.skip_return and mode != "prefix":
                    skr_feat = skr_advance(skr_feat, level)
            else:
                # Single-stream deeper levels (fusion_level < num_levels).
                # NOTE: the reference's forward cannot execute this arm AT
                # ALL — it re-inserts the last multistream feature instead of
                # the deep encoder output (RA_HVED.py:605-621), which
                # contradicts its own constructor's channel bookkeeping
                # (decoder convs sized for the deep output) and raises a
                # RuntimeError / mViL dim assert on every variant (pinned by
                # tests/test_torch_parity.py::test_reference_fusion_level3_
                # forward_is_defective). This implements the architecture the
                # reference CONSTRUCTS: the deep encoder output feeds the
                # decoder, and the skr chain advances through deep levels
                # (skr_encoders are built for every level at matching widths,
                # RA_HVED.py:369-384).
                top = rec_feats[0]
                top = _EncStage(
                    features=dec_f[level],
                    num_block=cfg.num_block[level],
                    apply_pooling=True,
                    basic_module=cfg.basic_module,
                    order=cfg.layer_order,
                    num_groups=cfg.num_groups,
                    dtype=dtype,
                    name=f"encoders_{level}",
                )(top, train)
                rec_feats.insert(0, top)
                if cfg.skip_return and mode != "prefix":
                    skr_feat = skr_advance(skr_feat, level)

            if mode == "prefix" and level == hoist_ms - 1:
                # hoist boundary reached: hand back the expert stacks (and,
                # when deeper multistream levels remain, the stream tensor).
                return HoistedPrefix(
                    mu=tuple(mu_list), logvar=tuple(logvar_list),
                    xs=xs if hoist_ms < n_ms else None)

        # mid-ViL over bottleneck tokens (+skr) (RA_HVED.py:623-626).
        # NOTE: the reference only applies mViL when skip_return is also on;
        # with mid_vil and no skr the constructed mViL is dead code there. We
        # apply it on the bottleneck alone in that case (intended semantics;
        # documented deviation).
        if cfg.mvae and cfg.mid_vil:
            if cfg.skip_return and skr_feat is not None:
                vil_in = rec_feats[0] + skr_feat
            else:
                vil_in = rec_feats[0]
            rec_feats[0] = rec_feats[0] + ViLLayer3D(
                dim=dec_f[-1], chunk_size=cfg.vil_chunk_size,
                use_pallas=cfg.use_pallas_mlstm, name="mvil"
            )(vil_in).astype(dtype)

        mu_t = tuple(mu_list)
        logvar_t = tuple(logvar_list)

        bottleneck = rec_feats[0]
        skips = rec_feats[1:]
        rev_dec = list(reversed(dec_f))
        n_dec = levels - 1
        rec_streams = 1 if cfg.shared_recon else M
        rec_last = M if cfg.shared_recon else 1

        def seg_decoder_stage(j):
            basic = ("double_conv_vil" if cfg.vil_decoder and j < 1
                     else cfg.basic_module)
            return _DecStage(
                features=rev_dec[j + 1], basic_module=basic,
                order=cfg.layer_order, num_groups=cfg.num_groups,
                rsm=cfg.mvae, mvae=cfg.mvae, dtype=dtype,
                name=f"sdecoder_{j}")

        # recon ladder width: dec_f_maps for MVAE, dec//2 for fusion
        # (ReconDecoder f_maps=rec_f_maps, RA_HVED.py:28,320)
        rev_rec = list(reversed(features_per_level(cfg.rec_f_maps, levels)))

        def rec_decoder_stage(m, j):
            return _DecStage(
                features=rev_rec[j + 1], basic_module=cfg.basic_module,
                order=cfg.layer_order, num_groups=cfg.num_groups,
                rsm=False, dtype=dtype, name=f"rdecoder_{m}_{j}")

        seg_out = None
        recon_out = None

        if cfg.seg_recon_decoder:
            # coupled seg+recon decode with DuSE cross-talk per level
            # (Seg_Recon_DuSFEDecoder, RA_HVED.py:97-201). Seg/DuSE module
            # instances are created ONCE and shared across recon streams
            # (flax errors on re-declared names; the reference shares its
            # sdecoders the same way, RA_HVED.py:103,173).
            sdecoders = [seg_decoder_stage(j) for j in range(n_dec)]
            dusfes = [DuSEAttention(rev_dec[j + 1], dtype=dtype,
                                    name=f"dusfe_{j}") for j in range(n_dec)]
            for m in range(rec_streams):
                rx, sx = bottleneck, bottleneck
                for j in range(n_dec):
                    rx = rec_decoder_stage(m, j)(skips[j], rx, None, train)
                    if seg:
                        sx = sdecoders[j](skips[j], sx, None, train)
                        if j <= 2:
                            rx, sx = dusfes[j](rx, sx, train=train)
                r_final = Conv1x1(rec_last, dtype=dtype,
                                  name=f"rfinal_{m}")(rx)
                recon_out = r_final if recon_out is None else jnp.concatenate(
                    [recon_out, r_final], axis=-1)
            if seg:
                s_head = Conv1x1(rec_last, dtype=dtype,
                                 name="sfinal_0")(sx)
                logits = Conv1x1(cfg.out_channels, dtype=dtype,
                                 name="final_conv")(s_head)
                seg_out = (nn.sigmoid(logits) if cfg.final_sigmoid
                           else nn.softmax(logits, axis=-1)).astype(jnp.float32)
            if not (recon and cfg.recon_decoder):
                recon_out = None
            else:
                recon_out = recon_out.astype(jnp.float32)
            return HVEDOutput(seg_out, mu_t, logvar_t, recon_out)

        # plain recon decoder (ReconDecoder, RA_HVED.py:16-95). Always traced
        # so its params exist regardless of the recon flag (the reference
        # constructs rdecoder in __init__); XLA prunes the computation when
        # the output is unused.
        if cfg.recon_decoder:
            parts = []
            for m in range(rec_streams):
                rx = bottleneck
                for j in range(n_dec):
                    skip_j = skips[j] if cfg.recon_skip else None
                    up = None if cfg.recon_skip else tuple(
                        s * 2 for s in rx.shape[1:4])
                    rx = rec_decoder_stage(m, j)(skip_j, rx, up, train)
                parts.append(Conv1x1(rec_last, dtype=dtype,
                                     name=f"rfinal_{m}")(rx))
            if recon:
                recon_out = jnp.concatenate(parts, axis=-1).astype(jnp.float32)

        # plain seg decoder path
        if seg:
            if cfg.fusion:
                # seg bottleneck is last_compress(cat(streams)) — distinct
                # from the recon bottleneck (the FusionModule output)
                # (RA_HVED.py:424,630)
                sx = BasicConv(rev_dec[0], 1, dtype=dtype,
                               name="last_compress")(
                    jnp.concatenate(seg_feats_nonmvae[0], axis=-1))
            else:
                sx = bottleneck
            skip_src = skips if cfg.mvae or not cfg.fusion else seg_feats_nonmvae[1:]
            for j in range(n_dec):
                sx = seg_decoder_stage(j)(skip_src[j], sx, None, train)
            logits = Conv1x1(cfg.out_channels, dtype=dtype,
                             name="final_conv")(sx)
            seg_out = (nn.sigmoid(logits) if cfg.final_sigmoid
                       else nn.softmax(logits, axis=-1)).astype(jnp.float32)

        return HVEDOutput(seg_out, mu_t, logvar_t, recon_out)


class Discriminator(nn.Module):
    """PatchGAN-style 3D conv discriminator on concat(seg, attention-weighted
    recon) (reference Discriminator, RA_HVED.py:204-236; blocks
    buildingblocks.py:342-358)."""

    f_maps: int = 64
    kernel: int = 4
    num_levels: int = 4
    strides: Tuple[int, ...] = (1, 2, 2, 2)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = [self.f_maps * (2 ** i) for i in range(self.num_levels)]
        for i, f in enumerate(feats):
            x = DiscriminatorBlock(
                f, kernel=self.kernel, stride=self.strides[i],
                normalize=i > 0, dtype=self.dtype, name=f"block{i}")(x)
        if min(x.shape[1:4]) + 2 < self.kernel:
            raise ValueError(
                f"Discriminator input too small: spatial {x.shape[1:4]} after "
                f"downsampling leaves no support for the final k={self.kernel} "
                "conv — use a larger crop or kernel=3")
        x = Conv3DFast(1, self.kernel, padding=((1, 1),) * 3,
                       kernel_init=nn.initializers.lecun_normal(),
                       use_bias=False, dtype=self.dtype, name="last")(x)
        return x
