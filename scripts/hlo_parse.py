"""Parse an optimized-HLO text dump (scripts/hlo_analysis.py writes
/tmp/hlo_fwd.txt) into a per-instruction HBM-traffic table.

Standalone (no jax import) so it can run while TPU jobs are in flight:
    python scripts/hlo_parse.py /tmp/hlo_fwd.txt [min_mb]
"""
import re
import sys
from collections import defaultdict

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
               "s8": 1, "u8": 1, "f64": 8, "s64": 8, "u16": 2, "s16": 2}

OPS = ("fusion", "copy", "convolution", "transpose", "bitcast", "reduce",
       "concatenate", "dot", "custom-call", "all-reduce", "dynamic-slice",
       "dynamic-update-slice", "slice", "pad", "broadcast", "reshape",
       "select", "add", "multiply", "while", "tuple", "get-tuple-element",
       "copy-start", "copy-done")


def shape_bytes(stext: str) -> int:
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
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hlo_fwd.txt"
    min_mb = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    txt = open(path).read()
    # entry computation = last "ENTRY %..." block
    entry = txt[txt.rindex("\nENTRY "):]
    # stop at the closing brace at column 0
    end = entry.find("\n}")
    entry = entry[:end]

    # pass 1: symbol table name -> (shape_str, bytes)
    shapes = {}
    inst = []
    line_re = re.compile(
        r"^\s*(?:ROOT )?%([\w.\-]+) = ((?:\([^=]*?\)|\S+?)) (\S+?)\((.*)$")
    for line in entry.splitlines():
        m = line_re.match(line)
        if not m:
            continue
        name, oshape, op, rest = m.groups()
        op = op.rstrip("(")
        shapes[name] = oshape
        inst.append((name, oshape, op, rest))

    rows = []
    for name, oshape, op, rest in inst:
        if op in ("parameter", "constant", "get-tuple-element", "tuple",
                  "bitcast", "copy-start", "copy-done"):
            continue
        out_b = shape_bytes(oshape)
        args = rest.split(", kind=")[0].split(", calls=")[0]
        args = args.split(", metadata=")[0]
        in_b = 0
        for am in re.finditer(r"%([\w.\-]+)", args):
            s = shapes.get(am.group(1))
            if s:
                in_b += shape_bytes(s)
        tot = out_b + in_b
        kindm = re.search(r"kind=(\w+)", rest)
        meta = re.search(r'op_name="([^"]*)"', rest)
        rows.append((tot, out_b, op, kindm.group(1) if kindm else "",
                     name, (meta.group(1) if meta else "")[-70:]))

    rows.sort(reverse=True)
    shown = [r for r in rows if r[0] >= min_mb * 1e6]
    total = sum(r[0] for r in rows)
    print(f"{len(rows)} instructions, est total traffic {total/1e9:.2f} GB; "
          f"showing {len(shown)} >= {min_mb} MB")
    print(f"{'MB':>8} {'outMB':>7} {'op':<12} {'kind':<18} op_name")
    for tot, ob, op, kind, name, metan in shown[:70]:
        print(f"{tot/1e6:8.1f} {ob/1e6:7.1f} {op:<12} {kind:<18} {metan}")

    agg = defaultdict(lambda: [0, 0])
    for tot, ob, op, kind, name, metan in rows:
        k = f"{op}/{kind}" if kind else op
        agg[k][0] += tot
        agg[k][1] += 1
    print("\nby op kind:")
    for k, (b, n) in sorted(agg.items(), key=lambda kv: -kv[1][0]):
        if b > 1e7:
            print(f"  {k:<28} {n:4d} ops  {b/1e9:.3f} GB")


if __name__ == "__main__":
    main()
