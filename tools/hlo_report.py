#!/usr/bin/env python3
"""Summarize an optimized XLA HLO dump: top ops by output bytes, copy /
transpose / convert traffic, and total fusion output traffic.

The axon remote compiler returns optimized HLO via
``jit(f).lower(*args).compile().as_text()`` — this is the only profiling
window the tunnel gives us (no local xprof), so byte-level accounting of
materialized buffers is how we find layout padding and unfused copies.

Usage: python tools/hlo_report.py <hlo.txt> [--top N]
"""

import argparse
import re
import sys
from collections import defaultdict

DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1,
               "s8": 1, "u8": 1, "f16": 2, "s64": 8, "u64": 8}

SHAPE_RE = re.compile(r"(\w+)\[([0-9,]*)\]")


def shape_bytes(text):
    """Total bytes of all shapes in an instruction's result type."""
    total = 0
    for dt, dims in SHAPE_RE.findall(text):
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--top", type=int, default=20)
    args = ap.parse_args()

    by_kind = defaultdict(lambda: [0, 0])  # kind -> [count, bytes]
    rows = []
    in_entry = False
    for line in open(args.path):
        if line.startswith("ENTRY "):
            in_entry = True
            continue
        if line.startswith("}"):
            in_entry = False
        if not in_entry:
            # instructions inside fusion/callee computations are not
            # materialized in HBM — only entry-level results count.
            continue
        line = line.strip()
        m = re.match(r"(?:ROOT )?%?[\w.\-]+ = (\w+)\[", line)
        if not m:
            continue
        # result type = everything up to ' = ' then the op name after
        op_m = re.search(r"= [^ ]+ (\w+)\(", line)
        kind = op_m.group(1) if op_m else "?"
        # bytes of the RESULT only (before the op name)
        result_part = line.split(" = ", 1)[1]
        result_type = result_part.split(")", 1)[0] if kind == "?" else \
            result_part[:result_part.index(kind)]
        b = shape_bytes(result_type)
        by_kind[kind][0] += 1
        by_kind[kind][1] += b
        rows.append((b, kind, line[:160]))

    print(f"{'kind':24s} {'count':>6s} {'MB':>10s}")
    for kind, (cnt, b) in sorted(by_kind.items(), key=lambda kv: -kv[1][1]):
        print(f"{kind:24s} {cnt:6d} {b / 1e6:10.1f}")

    print(f"\n--- top {args.top} instructions by result bytes ---")
    rows.sort(key=lambda r: -r[0])
    for b, kind, line in rows[:args.top]:
        print(f"{b / 1e6:8.1f} MB  {line}")


if __name__ == "__main__":
    main()
