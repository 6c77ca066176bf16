"""Paired A/B comparison of two (or more) bench artifacts.

Usage: python tools/ab_compare.py BASE.json... -- FINAL.json...
Each side may list several runs; per gate the side's value is the
MEDIAN of its runs' warm medians (contention-robust), and the summary
prints per-gate ratios (final/base; < 1 = faster) plus the geomean.
"""

from __future__ import annotations

import json
import math
import statistics
import sys


def load(path: str) -> dict:
    d = json.load(open(path))
    return d.get("warm") or d["queries"]


def side(paths: list[str]) -> dict:
    runs = [load(p) for p in paths]
    keys = set.intersection(*[set(r) for r in runs])
    return {k: statistics.median(r[k] for r in runs) for k in keys}


def main() -> None:
    argv = sys.argv[1:]
    cut = argv.index("--")
    base, final = side(argv[:cut]), side(argv[cut + 1:])
    common = sorted(set(base) & set(final))
    rows = [(final[k] / base[k], base[k], final[k], k) for k in common if base[k] > 0]
    rows.sort()
    for r, b, f, k in rows:
        print(f"{r:6.3f}  {b:8.3f} -> {f:8.3f}  {k}")
    g = math.exp(sum(math.log(r) for r, *_ in rows) / len(rows))
    print(f"\ngeomean final/base over {len(rows)} gates: {g:.4f}")
    print(f"warm sums: base {sum(base[k] for k in common):.1f}s -> final {sum(final[k] for k in common):.1f}s")


if __name__ == "__main__":
    main()
