"""Benchmark: flagship XLSTM_HVED seg+recon inference throughput at 128^3,
plus the full reference-protocol throughput (240x240x155 volume, 128x192x128
sliding window, 15-subset sweep — /root/reference/test.py:29,98) and the
adversarial train-step rate.

Budgeted (round-4 lesson: BENCH_r04 hit the driver's timeout with the
primary metric still unprinted): the PRIMARY 128^3 line is measured FIRST
and re-emitted LAST (the driver parses the last line), optional phases
(protocol sweep, train step) run only while inside the time budget and are
skipped with a logged notice otherwise, and every phase is individually
fault-tolerant (relay transients abort the phase, not the bench).
BENCH_BUDGET_S overrides the default 420 s soft budget.

Methodology: the tunneled-TPU relay both caches repeat executions with
identical inputs AND adds ~100 ms dispatch latency per host round-trip, so
neither naive repetition nor host-chained dependencies measure device
throughput. Instead the forward runs inside one jitted on-device fori_loop
with per-iteration input perturbation, and the per-volume time is the slope
between a small-N and a large-N loop (subtracting fixed dispatch cost).

Baseline context (BASELINE.md): the reference publishes no numbers; the
rebuild target is ">=5x A100 reference throughput on a v5e-8". The A100
figure is DERIVED, not asserted: scripts/baseline_derivation.py hooks every
leaf module of the actual PyTorch flagship at 128^3 and applies an A100
roofline to the measured shapes — see docs/BASELINE_DERIVATION.md. Its
EAGER scenario (the reference as written, reference-favorable derates)
gives ~50 vol/s. The 5x-on-8-chips target is therefore 5*50/8 = 31.25
vol/s PER CHIP, and this bench runs on one chip:
vs_baseline = value / (5 * 50 / 8) — 1.0 means the target is met.
"""
import json
import os
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

A100_REFERENCE_VOLS_PER_SEC = 50.0   # derived: docs/BASELINE_DERIVATION.md
TARGET_MULTIPLIER = 5.0
CHIPS_IN_TARGET_POD = 8.0            # "on a v5e-8" — target is per-pod
# The A100 denominator comes from a module-hook + roofline derivation with a
# stated +-2x uncertainty (docs/BASELINE_DERIVATION.md §5): the true multiple
# vs a real A100 run lies in [vs_baseline/2, vs_baseline*2].
BASELINE_UNCERTAINTY = "derived A100 denominator, +-2x"

# Full reference protocol (test.py:29,98): 240x240x155 BraTS volume,
# 128x192x128 patch, stride = patch (sliding window covers residual
# origins), all 15 modality subsets. Windows per subset: 2x2x2 = 8.
PROTOCOL_VOL = (240, 240, 155)
PROTOCOL_PATCH = (128, 192, 128)

BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "540"))
_T0 = time.time()


def _elapsed():
    return time.time() - _T0


def _protocol_windows():
    from xlstm_hved_tpu.engine.evaluate import origin_grid
    return len(origin_grid(PROTOCOL_VOL, PROTOCOL_PATCH, PROTOCOL_PATCH))


def bench_primary(model, variables, keep):
    """Primary metric: single-window 128^3 seg+recon inference, with the
    achieved-HBM-bandwidth context lines (round-3 VERDICT Weak #6: estimated
    HBM traffic of one forward from the optimized HLO, over measured time).
    Returns the JSON record (caller re-prints it as the last line)."""
    shape = (1, 128, 128, 128, 4)
    x0 = jnp.asarray(np.random.RandomState(0).rand(*shape), jnp.float32)

    def one(xi):
        out = model.apply(variables, xi, keep=keep, recon=True,
                          deterministic=True)
        return jnp.mean(out.seg) + jnp.mean(out.recon)

    def raw(xi):
        out = model.apply(variables, xi, keep=keep, recon=True,
                          deterministic=True)
        return out.seg, out.recon

    traffic_gb = hlo_traffic_bytes(
        jax.jit(raw).lower(x0).compile().as_text()) / 1e9

    def loop_time(n):
        @jax.jit
        def run(x):
            def body(i, acc):
                return acc + one(x + acc * 1e-6 + i * 1e-4)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        # NOTE: jax.block_until_ready can return without waiting on the axon
        # relay; forcing the scalar to host is the only reliable sync.
        float(run(x0))  # compile + sync
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(x0))
            times.append(time.perf_counter() - t0)
        return min(times)

    t_small, t_large = loop_time(4), loop_time(20)
    per_volume = (t_large - t_small) / 16.0

    vols_per_sec = shape[0] / per_volume
    target = (TARGET_MULTIPLIER * A100_REFERENCE_VOLS_PER_SEC
              / CHIPS_IN_TARGET_POD)  # per-chip share of the 5x-pod target
    V5E_HBM_PEAK_GBPS = 819.0  # v5e: 16 GB HBM2 @ 819 GB/s
    achieved_gbps = traffic_gb / per_volume
    return {
        "metric": "xlstm_hved_seg_recon_inference_128cubed",
        "value": round(vols_per_sec, 3),
        "unit": "volumes/sec/chip",
        "vs_baseline": round(vols_per_sec / target, 3),
        "baseline_uncertainty": BASELINE_UNCERTAINTY,
        "hlo_traffic_gb_per_volume": round(traffic_gb, 3),
        "achieved_hbm_gbps": round(achieved_gbps, 1),
        "pct_of_v5e_hbm_peak": round(100 * achieved_gbps / V5E_HBM_PEAK_GBPS,
                                     1),
    }


def bench_protocol(model, variables):
    """Full-protocol volumes/sec/chip: one volume = 15-subset sweep with
    sliding-window seg+recon inference. vs_baseline scales the derived A100
    128^3 rate by window count x voxel ratio (the same graph evaluated
    8 x 1.5x-voxel times per subset, 15 subsets).

    Uses the HOISTED sweep (round-4): the subset-invariant forward prefix
    runs once per window instead of 15x — exact (tests/test_engine.py)."""
    from xlstm_hved_tpu.engine.evaluate import make_hoisted_subset_sweep

    sweep = make_hoisted_subset_sweep(model, patch=PROTOCOL_PATCH,
                                      recon_channels=4)
    x0 = jnp.asarray(
        np.random.RandomState(1).rand(1, *PROTOCOL_VOL, 4), jnp.float32)

    def loop_time(n):
        @jax.jit
        def run(x):
            def body(i, acc):
                segs, recs = sweep(variables, x + acc * 1e-6 + i * 1e-4)
                return acc + jnp.mean(segs) + jnp.mean(recs)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        float(run(x0))  # compile + sync (axon relay: host scalar = only sync)
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            float(run(x0))
            times.append(time.perf_counter() - t0)
        return min(times)

    t_small, t_large = loop_time(1), loop_time(3)
    per_volume = (t_large - t_small) / 2.0
    vols_per_sec = 1.0 / per_volume

    voxel_ratio = float(np.prod(PROTOCOL_PATCH)) / 128 ** 3
    windows = _protocol_windows()
    a100_protocol = (A100_REFERENCE_VOLS_PER_SEC
                     / (15 * windows * voxel_ratio))
    target = TARGET_MULTIPLIER * a100_protocol / CHIPS_IN_TARGET_POD
    print(json.dumps({
        "metric": "xlstm_hved_full_protocol_15subset_sweep",
        "value": round(vols_per_sec, 4),
        "unit": "volumes/sec/chip (240x240x155, 128x192x128 window, "
                "15 subsets, seg+recon)",
        "vs_baseline": round(vols_per_sec / target, 3),
        "baseline_uncertainty": BASELINE_UNCERTAINTY,
    }), flush=True)


def bench_train_step(model):
    """Full adversarial G+D train step at 128^3 batch 1, bf16 D (the CLI
    default path). Emits steps/sec/chip; vs_baseline is relative to the
    round-3 measured 281 ms/step (docs/PERFORMANCE.md), making regressions
    and wins visible in BENCH_r* instead of only in docs."""
    import jax.random as jr

    from xlstm_hved_tpu.config import TrainConfig
    from xlstm_hved_tpu.engine.train import create_train_state, make_train_step
    from xlstm_hved_tpu.models import Discriminator

    R3_STEP_SECONDS = 0.281
    cfg = TrainConfig(crop_size=(128, 128, 128), num_epochs=100)
    disc = Discriminator(f_maps=64, kernel=4, dtype=jnp.bfloat16)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(1, 128, 128, 128, 4), jnp.float32)
    mask = jnp.asarray((rng.rand(1, 128, 128, 128, 3) > 0.7), jnp.float32)
    state, _ = create_train_state(model, disc, cfg, jr.PRNGKey(0), x)
    step = make_train_step(model, disc, cfg)

    def loop_time(n):
        @jax.jit
        def run(state, x, mask):
            def body(i, st):
                st, _m = step(st, x + i * 1e-4, mask,
                              jr.fold_in(jr.PRNGKey(1), i))
                return st
            st = jax.lax.fori_loop(0, n, body, state)
            # force real execution on the relay: reduce one param leaf
            return jnp.sum(st.params_g["final_conv"]["kernel"])

        float(run(state, x, mask))  # compile + sync
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            float(run(state, x, mask))
            times.append(time.perf_counter() - t0)
        return min(times)

    t_small, t_large = loop_time(2), loop_time(6)
    per_step = (t_large - t_small) / 4.0
    steps_per_sec = 1.0 / per_step
    print(json.dumps({
        "metric": "xlstm_hved_train_step_128cubed",
        "value": round(steps_per_sec, 3),
        "unit": "G+D train steps/sec/chip (128^3, batch 1, bf16 D)",
        "vs_baseline": round(steps_per_sec * R3_STEP_SECONDS, 3),
        "baseline_uncertainty": "baseline = round-3 measured 281 ms/step",
    }), flush=True)


_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
                "s8": 1, "u8": 1, "f64": 8, "s64": 8}


def _shape_bytes(stext):
    import re
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", stext):
        dt, dims = m.group(1), m.group(2)
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def hlo_traffic_bytes(compiled_text):
    """Estimated HBM bytes moved by one execution: sum of operand + output
    bytes over every top-level instruction of the ENTRY computation (the
    traffic model of scripts/hlo_parse.py; fusion-internal intermediates
    stay in VMEM and are correctly excluded).

    Two-pass: scheduled TPU HLO prints operands as bare %references (no
    inline types) and shapes carry layout suffixes like {1,0:T(8,128)}, so
    operand bytes must be resolved through a name->shape symbol table —
    the single-regex form silently measured 0 on the axon backend."""
    import re
    if "\nENTRY " not in compiled_text:
        return 0
    entry = compiled_text[compiled_text.rindex("\nENTRY "):]
    end = entry.find("\n}")
    if end > 0:
        entry = entry[:end]
    line_re = re.compile(
        r"^\s*(?:ROOT )?%([\w.\-]+) = ((?:\([^=]*?\)|\S+?)) (\S+?)\((.*)$")
    shapes, inst = {}, []
    for line in entry.splitlines():
        m = line_re.match(line)
        if not m:
            continue
        name, oshape, op, rest = m.groups()
        shapes[name] = oshape
        inst.append((oshape, op.rstrip("("), rest))
    total = 0
    for oshape, op, rest in inst:
        if op in ("parameter", "constant", "get-tuple-element", "tuple",
                  "bitcast", "copy-start", "copy-done"):
            continue
        args = rest.split(", kind=")[0].split(", calls=")[0]
        args = args.split(", metadata=")[0]
        in_b = sum(_shape_bytes(shapes.get(am.group(1), ""))
                   for am in re.finditer(r"%([\w.\-]+)", args))
        total += _shape_bytes(oshape) + in_b
    return total


def _phase(name, min_headroom_s, fn, *args):
    """Run one optional bench phase if the remaining budget allows; never
    let a phase failure (relay transient) kill the bench."""
    if _elapsed() + min_headroom_s > BUDGET_S:
        print(f"[bench] skipping {name}: {_elapsed():.0f}s elapsed, "
              f"needs ~{min_headroom_s:.0f}s, budget {BUDGET_S:.0f}s",
              flush=True)
        return
    try:
        fn(*args)
    except Exception:
        print(f"[bench] {name} failed (continuing):", flush=True)
        traceback.print_exc()


def main():
    from xlstm_hved_tpu.models import find_model_using_name
    from xlstm_hved_tpu.utils.compcache import enable_persistent_cache
    from xlstm_hved_tpu.utils.subsets import SUBSET_MASKS

    enable_persistent_cache()
    model = find_model_using_name("XLSTM_HVED", compute_dtype="bfloat16")
    x0 = jnp.asarray(np.random.RandomState(0).rand(1, 128, 128, 128, 4),
                     jnp.float32)
    variables = jax.jit(lambda k, x: model.init(k, x, deterministic=True))(
        {"params": jax.random.PRNGKey(0), "latent": jax.random.PRNGKey(1)}, x0)
    keep = jnp.asarray(SUBSET_MASKS[14])

    # primary first: the one metric that must always land
    primary = bench_primary(model, variables, keep)
    print(json.dumps(primary), flush=True)
    print(f"[bench] primary done at {_elapsed():.0f}s", flush=True)

    # optional phases, cheapest-information-first, each budget-gated.
    # Headroom estimates are warm-cache compile + run times on the relay.
    # The primary line is RE-EMITTED after every phase: the driver parses
    # the LAST line, and a driver-side kill mid-phase must never leave a
    # secondary metric as the final line.
    _phase("protocol_sweep", 130, bench_protocol, model, variables)
    print(json.dumps(primary), flush=True)
    _phase("train_step", 120, bench_train_step, model)
    print(json.dumps(primary), flush=True)


if __name__ == "__main__":
    main()
