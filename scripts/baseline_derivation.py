"""Derive the A100 reference-throughput figure that bench.py compares against.

Round-1 VERDICT Weak #3: `A100_REFERENCE_VOLS_PER_SEC = 2.2` was asserted
without a derivation. This script produces one, from first principles, using
the ACTUAL reference network (PyTorch, CPU) rather than hand-listed layers:

1. Build the reference flagship (`XLSTM_HVED`, /root/reference/RA_HVED.py:945
   with the train.py:142-143 flags) minus CUDA, and run one 128^3 forward with
   hooks on every leaf module, recording true input/output shapes.
2. Per layer, count MACs and bytes moved (fp16 activations under AMP
   autocast — train.py:207 — except the ViL block, which the reference FORCES
   to fp32 via @autocast(enabled=False), UxLSTMEnc_3d.py:77-80).
3. Apply an A100-SXM4-80GB roofline under TWO scenarios:
   - OPTIMISTIC: a perfectly-scheduled reference (upper bound on what any
     CUDA rewrite of the reference graph could do). This is NOT what eager
     PyTorch achieves; it bounds the reference's headroom.
   - EAGER: the reference as actually written — one-kernel-at-a-time
     execution with published-benchmark efficiency derates for tiny-channel
     NCDHW 3D convs and per-kernel launch/dispatch overhead.
   time_layer = max(flops/eff_flops, bytes/eff_bw) + launch, summed.

`--measure_cpu` additionally times the reference (torch, eager) and this
repo's flagship (JAX, jitted) forward on the SAME host CPU at 64^3 — an
apples-to-apples software-efficiency measurement with no hardware modeling
at all. Expect ~2-4 min extra.

Run: python scripts/baseline_derivation.py [--measure_cpu]
Writes docs/BASELINE_DERIVATION.md.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# A100 SXM4 80GB public specs
PEAK_FLOPS_FP16 = 312e12     # dense tensor-core fp16 (no sparsity)
PEAK_BW = 2.0e12             # HBM2e bytes/s
BYTES_PER_EL = 2             # fp16 under AMP

SCENARIOS = {
    # Perfect scheduling: every op back-to-back at high achieved BW. 60%
    # of peak on both roofs is the practiced "speed of light" for real
    # kernels; 5 us launch assumes CUDA-graph-style dispatch.
    "optimistic": dict(conv_bw=0.60 * PEAK_BW, elt_bw=0.60 * PEAK_BW,
                       flops=0.60 * PEAK_FLOPS_FP16, launch=5e-6,
                       kernels_per_module=1.0),
    # The reference as written (eager PyTorch, AMP):
    # - conv_bw 15%: cuDNN NCDHW 3D convs at C_out in {4..32} cannot fill
    #   tensor-core tiles (the GEMM N dimension equals C_out; tiles are
    #   64-128 wide) and public conv benchmarks put tiny-channel 3D convs
    #   at 5-20% of the BW roof. 15% is the favorable end.
    # - elt_bw 70%: InstanceNorm/LeakyReLU/interp are large contiguous
    #   tensors; eager still reads+writes each once per op (the byte
    #   counts below already assume zero fusion).
    # - launch 12 us x 1.8 kernels/module: eager dispatch is host-bound at
    #   this size (Python + aten + cudaLaunch per op; norms and interps
    #   are multi-kernel).
    "eager": dict(conv_bw=0.15 * PEAK_BW, elt_bw=0.70 * PEAK_BW,
                  flops=0.30 * PEAK_FLOPS_FP16, launch=12e-6,
                  kernels_per_module=1.8),
}

# Types whose bytes move at the (derated) conv roof. The quadratic mLSTM
# stays on the elementwise roof: its S^2 GEMMs are well-shaped for cuBLAS
# and its traffic is dominated by S^2 elementwise intermediates — charging
# it the tiny-channel-conv derate would be unfair to the reference.
CONV_TYPES = ("Conv3d", "Conv1d", "Linear")


def collect_rows():
    """Hook every leaf module of the reference flagship; return
    (module_type, flops, bytes) rows for one 128^3 fp16 forward."""
    import torch
    from torch import nn

    from ref_loader import load_reference

    ra = load_reference()
    torch.manual_seed(0)
    model = ra.XLSTM_HVED(1, 3, multi_stream=4, fusion_level=4,
                          shared_recon=True, recon_skip=True,
                          MVAE_reduction=True, final_sigmoid=True,
                          f_maps=4, layer_order="ilc")
    model.eval()

    rows = []

    def numel(t):
        if isinstance(t, (tuple, list)):
            return sum(numel(x) for x in t if x is not None)
        return t.numel() if hasattr(t, "numel") else 0

    def hook(mod, inputs, output):
        name = type(mod).__name__
        n_in, n_out = numel(inputs), numel(output)
        flops = 0
        if isinstance(mod, nn.Conv3d):
            cin = mod.in_channels // mod.groups
            k = int(np.prod(mod.kernel_size))
            flops = 2 * numel(output) * cin * k
        elif isinstance(mod, nn.Conv1d):
            cin = mod.in_channels // mod.groups
            flops = 2 * numel(output) * cin * int(np.prod(mod.kernel_size))
        elif isinstance(mod, nn.Linear):
            flops = 2 * numel(output) * mod.in_features
        params = sum(p.numel() for p in mod.parameters(recurse=False))
        rows.append((name, flops, BYTES_PER_EL * (n_in + n_out + params)))

    leaf_types = (nn.Conv3d, nn.Conv1d, nn.Linear, nn.InstanceNorm3d,
                  nn.BatchNorm3d, nn.LayerNorm, nn.MaxPool3d, nn.AvgPool3d,
                  nn.LeakyReLU, nn.ReLU, nn.SiLU, nn.Sigmoid, nn.Softmax)
    for m in model.modules():
        if isinstance(m, leaf_types):
            m.register_forward_hook(hook)

    x = torch.from_numpy(
        np.random.RandomState(0).rand(1, 4, 128, 128, 128).astype(np.float32))
    with torch.no_grad():
        model(x, subset_idx_list=[14], valid=True, seg=True, recon=True)

    # analytic terms the hooks cannot see -----------------------------------
    # (a) the quadratic mLSTM (parallel_stabilized_simple,
    #     vision_lstm.py:48-130): S=4096 tokens (16^3 at /8 of 128^3),
    #     NH=4 heads, DH=16. The reference RUNS THIS IN FP32 (ViL wrapper is
    #     @autocast(enabled=False), UxLSTMEnc_3d.py:77-80) and materializes
    #     ~8 S x S x NH intermediates in HBM (cumsum matrix, log-D, masked-D,
    #     stabilized D, QK^T, C, normalizer broadcast, C_norm).
    S, NH, DH = 4096, 4, 16
    mlstm_flops = NH * (2 * S * S * DH * 2 + 5 * S * S)
    mlstm_bytes = 4 * NH * S * S * 8  # fp32, ~8 materializations
    rows.append(("mLSTM_quadratic(analytic)", mlstm_flops, mlstm_bytes))
    # (b) trilinear interpolates (VU x4 + decoder x6 + recon x3):
    #     read+write per resize, 8-point gather ~ 3 reads effective
    interp_bytes = 0
    for ch, d in ((4, 128), (8, 64), (16, 32), (32, 16),  # VU per level
                  (16, 32), (8, 64), (4, 128),            # seg decoder
                  (16, 32), (8, 64), (4, 128)):           # recon decoder
        interp_bytes += BYTES_PER_EL * 4 * ch * d ** 3
    rows.append(("trilinear_resize(analytic)", 0, interp_bytes))
    return rows


def roofline(rows, sc):
    agg = {}
    for name, fl, by in rows:
        bw = sc["conv_bw"] if name in CONV_TYPES else sc["elt_bw"]
        t = (max(fl / sc["flops"], by / bw)
             + sc["launch"] * sc["kernels_per_module"])
        a = agg.setdefault(name, [0, 0, 0.0, 0])
        a[0] += fl
        a[1] += by
        a[2] += t
        a[3] += 1
    return agg


def measure_cpu_ratio():
    """Same-host eager-torch vs jitted-JAX forward at 64^3 (software
    efficiency only — no hardware modeling)."""
    import time

    import torch

    from ref_loader import load_reference

    ra = load_reference()
    torch.manual_seed(0)
    tm = ra.XLSTM_HVED(1, 3, multi_stream=4, fusion_level=4,
                       shared_recon=True, recon_skip=True,
                       MVAE_reduction=True, final_sigmoid=True,
                       f_maps=4, layer_order="ilc").eval()
    xt = torch.from_numpy(
        np.random.RandomState(0).rand(1, 4, 64, 64, 64).astype(np.float32))
    with torch.no_grad():
        tm(xt, subset_idx_list=[14], valid=True, seg=True, recon=True)  # warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            tm(xt, subset_idx_list=[14], valid=True, seg=True, recon=True)
            ts.append(time.perf_counter() - t0)
    torch_s = min(ts)

    import functools

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    from xlstm_hved_tpu.models import find_model_using_name
    from xlstm_hved_tpu.utils.subsets import SUBSET_MASKS

    model = find_model_using_name("XLSTM_HVED")
    xj = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 64, 4),
                     jnp.float32)
    v = jax.jit(lambda k, x: model.init(k, x, deterministic=True))(
        {"params": jax.random.PRNGKey(0), "latent": jax.random.PRNGKey(1)}, xj)
    fwd = jax.jit(functools.partial(model.apply, recon=True,
                                    deterministic=True))
    keep = jnp.asarray(SUBSET_MASKS[14])
    jax.block_until_ready(fwd(v, xj, keep=keep))  # compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fwd(v, xj, keep=keep))
        ts.append(time.perf_counter() - t0)
    jax_s = min(ts)
    return torch_s, jax_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--measure_cpu", action="store_true")
    args = ap.parse_args()

    rows = collect_rows()
    lines = [
        "# Derivation of the A100 baseline figure (bench.py)",
        "",
        "Generated by `scripts/baseline_derivation.py` from the actual",
        "reference graph (XLSTM_HVED flagship, 128^3 single volume, fp16",
        "activations under AMP; the ViL block fp32 as the reference forces).",
        "Layer shapes come from forward hooks on the PyTorch model itself;",
        "the quadratic mLSTM and the trilinear resizes are added analytically",
        "(hooks cannot see functional calls).",
        "",
        "Two scenarios bound the truth from both sides:",
        "",
    ]
    results = {}
    for sc_name, sc in SCENARIOS.items():
        agg = roofline(rows, sc)
        total_t = sum(a[2] for a in agg.values())
        total_fl = sum(a[0] for a in agg.values())
        total_by = sum(a[1] for a in agg.values())
        results[sc_name] = 1.0 / total_t
        lines += [
            f"## {sc_name.upper()} — "
            f"{total_t*1e3:.1f} ms/volume → {1.0/total_t:.1f} vol/s",
            "",
            (f"conv BW {sc['conv_bw']/1e12:.2f} TB/s, elementwise BW "
             f"{sc['elt_bw']/1e12:.2f} TB/s, {sc['flops']/1e12:.0f} TFLOP/s, "
             f"{sc['launch']*1e6:.0f} us launch x "
             f"{sc['kernels_per_module']:.1f} kernels/module."),
            "",
            "| module | count | GFLOP | GB moved | est. ms |",
            "|---|---|---|---|---|",
        ]
        for name, (fl, by, t, n) in sorted(agg.items(),
                                           key=lambda kv: -kv[1][2]):
            lines.append(f"| {name} | {n} | {fl/1e9:.2f} | {by/1e9:.3f} | "
                         f"{t*1e3:.2f} |")
        lines += ["",
                  f"Totals: {total_fl/1e9:.1f} GFLOP, {total_by/1e9:.2f} GB.",
                  ""]

    opt, eag = results["optimistic"], results["eager"]
    lines += [
        "## Conclusion",
        "",
        f"- OPTIMISTIC bound (a perfectly-fused CUDA rewrite): "
        f"**{opt:.0f} vol/s**. No eager PyTorch program reaches this; it",
        "  exists to show the A100's hardware ceiling for this graph.",
        f"- EAGER estimate (the reference as written): **{eag:.0f} vol/s**,",
        "  dominated by tiny-channel cuDNN conv inefficiency and per-kernel",
        "  dispatch. Uncertainty is honestly ~±2x (launch overhead and cuDNN",
        "  algo selection are workload-specific).",
        "",
        "`bench.py` uses the EAGER estimate as `A100_REFERENCE_VOLS_PER_SEC`",
        "(the reference-favorable end of the plausible range) and the",
        "BASELINE.md target reading '5x one A100 using a v5e-8' →",
        "per-chip target = 5/8 x A100. Round 1 used 2.2 vol/s for the same",
        "constant — asserted, not derived, and (this analysis shows) far too",
        "pessimistic about the reference; the derived figure makes the",
        "target ~3x HARDER than round 1's.",
    ]

    if args.measure_cpu:
        torch_s, jax_s = measure_cpu_ratio()
        lines += [
            "",
            "## Same-host CPU measurement (no hardware modeling)",
            "",
            f"Reference (torch eager, fp32, 64^3): {torch_s*1e3:.0f} ms —",
            f"this repo (JAX jitted, fp32, 64^3): {jax_s*1e3:.0f} ms —",
            f"**{torch_s/jax_s:.1f}x** on identical silicon. Captures graph",
            "efficiency (fusion, layout, linear-vs-quadratic mLSTM) only;",
            "GPU-vs-TPU specifics are excluded by construction.",
        ]

    out = os.path.join(os.path.dirname(__file__), "..", "docs",
                       "BASELINE_DERIVATION.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
