"""xlstm_hved_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
cross-modal brain-tumor segmentation + MRI reconstruction under missing
modalities (the capability set of Quanato607/XLSTM-HVED, rebuilt TPU-first).

Layout convention: all volumetric tensors are channels-last NDHWC
(B, D, H, W, C) — the natural layout for XLA:TPU convolutions — in contrast
to the reference's NCDHW. Modality streams are a leading stacked axis mapped
with vmap instead of per-stream module copies.

Subpackages
-----------
- ops:      low-level numerical ops (layer-order convs, PoE, mLSTM chunked
            scan + Pallas kernel, trilinear resize, sliding-window scatter)
- nn:       flax building blocks (DoubleConv family, gates, DuSFE, skip-return)
- models:   the HVED fusion engine, model zoo registry, discriminator, HeMIS
- losses:   dice/GDL/KLD/LSGAN/boundary/WCE
- metrics:  dice region metrics, IoU, HD95, PSNR/SSIM
- data:     NIfTI IO (pure-numpy + native C++ loader), BraTS dataset,
            on-device augmentation pipeline
- engine:   jitted train/eval steps, checkpoint manager, CSV logging
- parallel: mesh/sharding helpers, sequence-parallel mLSTM
- cli:      train / pretrain / test entry points
"""

__version__ = "0.1.0"
