"""Dump and analyze the optimized HLO of the flagship forward.

Lists every fusion/copy/convolution in the compiled module with its output
shape+layout and an estimated HBM traffic (sum of operand + output bytes,
counting only >=1MB arrays), sorted by traffic. This is the map for the
round-2 perf push: which fusions move the most bytes, and where pure layout
copies ({4,2,3,1,0}-style relayouts) sit.

Usage: python scripts/hlo_analysis.py [SIZE] [--train]
Writes /tmp/hlo_fwd.txt (full text) and prints the traffic table.
"""
import re
import sys

import jax
import jax.numpy as jnp
import numpy as np

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
               "s8": 1, "u8": 1, "f64": 8, "s64": 8}


def shape_bytes(stext: str) -> int:
    """Total bytes of an HLO shape string like 'bf16[1,128,128,128,16]{4,...}'
    or a tuple '(bf16[...], f32[...])'."""
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", stext):
        dt, dims = m.group(1), m.group(2)
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def main():
    size = 128
    for a in sys.argv[1:]:
        if a.isdigit():
            size = int(a)

    from xlstm_hved_tpu.models import find_model_using_name
    from xlstm_hved_tpu.utils.subsets import SUBSET_MASKS

    model = find_model_using_name("XLSTM_HVED", compute_dtype="bfloat16")
    shape = (1, size, size, size, 4)
    x0 = jnp.asarray(np.random.RandomState(0).rand(*shape), jnp.float32)
    variables = jax.jit(lambda k, x: model.init(k, x, deterministic=True))(
        {"params": jax.random.PRNGKey(0), "latent": jax.random.PRNGKey(1)}, x0)
    keep = jnp.asarray(SUBSET_MASKS[14])

    def fwd(v, xi):
        out = model.apply(v, xi, keep=keep, recon=True, deterministic=True)
        return out.seg, out.recon

    print("lowering + compiling...", flush=True)
    compiled = jax.jit(fwd).lower(variables, x0).compile()
    txt = compiled.as_text()
    with open("/tmp/hlo_fwd.txt", "w") as f:
        f.write(txt)
    print(f"wrote /tmp/hlo_fwd.txt ({len(txt)} bytes)", flush=True)

    # ENTRY computation: top-level instruction list (fusions already formed).
    # Parse lines:   %name = TYPE op(...), kind=..., calls=...
    entry = txt.split("ENTRY ")[1] if "ENTRY " in txt else txt
    rows = []
    for line in entry.splitlines():
        line = line.strip()
        m = re.match(r"%?([\w.\-]+) = ((?:\([^)]*\)|[\w\[\]{},\d]+)) "
                     r"(fusion|copy|convolution|transpose|bitcast|"
                     r"all-reduce|custom-call|reduce|concatenate|dot)\(",
                     line)
        if not m:
            continue
        name, oshape, op = m.groups()
        out_b = shape_bytes(oshape)
        # operand shapes: scan the argument list for TYPE[dims] tokens
        args = line[m.end():]
        # cut metadata/backend_config tails for operand parsing
        args = args.split(", kind=")[0].split(", calls=")[0]
        in_b = shape_bytes(args)
        big = out_b + in_b
        if big < 1 << 20:
            continue
        kindm = re.search(r"kind=(\w+)", line)
        rows.append((big, out_b, in_b, op,
                     kindm.group(1) if kindm else "", name, oshape[:48]))
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    print(f"\n{len(rows)} instructions with >=1MB traffic; "
          f"total est. {total/1e9:.2f} GB")
    print(f"{'est MB':>8} {'out MB':>8} {'op':<12} {'kind':<18} name")
    for big, ob, ib, op, kind, name, osh in rows[:60]:
        print(f"{big/1e6:8.1f} {ob/1e6:8.1f} {op:<12} {kind:<18} "
              f"{name[:44]:<44} {osh}")

    # aggregate by op type
    agg = {}
    for big, ob, ib, op, kind, name, osh in rows:
        k = f"{op}/{kind}" if kind else op
        a = agg.setdefault(k, [0, 0])
        a[0] += big
        a[1] += 1
    print("\nby op kind:")
    for k, (b, n) in sorted(agg.items(), key=lambda kv: -kv[1][0]):
        print(f"  {k:<28} {n:4d} ops  {b/1e9:.3f} GB")


if __name__ == "__main__":
    main()
