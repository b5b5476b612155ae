"""Per-query bench regression report: BENCH_r{N}.json vs BENCH_r{N-1}.json.

The driver's BENCH_r{N}.json wraps bench.py's JSON line under "parsed".
Also accepts a raw bench.py output file (the JSON line itself).

Usage: python tools/bench_diff.py [old.json new.json]
       python tools/bench_diff.py            # auto-pick two latest BENCH_r*.json
"""

from __future__ import annotations

import glob
import json
import re
import sys


def load(path: str) -> dict:
    with open(path) as fh:
        d = json.load(fh)
    return d.get("parsed", d)


def main() -> int:
    if len(sys.argv) == 3:
        old_p, new_p = sys.argv[1], sys.argv[2]
    else:
        found = sorted(
            glob.glob("BENCH_r*.json"),
            key=lambda p: int(re.search(r"r(\d+)", p).group(1)),
        )
        if len(found) < 2:
            print(f"need two BENCH_r*.json files, found {found}")
            return 1
        old_p, new_p = found[-2], found[-1]
    old, new = load(old_p), load(new_p)
    oq, nq = old.get("queries", {}), new.get("queries", {})
    print(f"{'query':34s} {'old':>8s} {'new':>8s} {'delta':>8s}")
    rows = []
    for q in sorted(set(oq) | set(nq)):
        a, b = oq.get(q), nq.get(q)
        delta = (b - a) if (a is not None and b is not None and a > 0 and b > 0) else None
        rows.append((q, a, b, delta))
    # biggest regressions first, then biggest wins
    rows.sort(key=lambda r: -(r[3] if r[3] is not None else float("-inf")))
    for q, a, b, delta in rows:
        fa = f"{a:.2f}" if a is not None else "-"
        fb = f"{b:.2f}" if b is not None else "-"
        fd = f"{delta:+.2f}" if delta is not None else "new/gone"
        flag = " <<" if delta is not None and delta > 1.0 else ""
        print(f"{q:34s} {fa:>8s} {fb:>8s} {fd:>8s}{flag}")
    print(
        f"\ntotal: {old.get('value')} -> {new.get('value')} "
        f"({old.get('sf')} sf, {old_p} -> {new_p})"
    )
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except BrokenPipeError:  # e.g. piped into head
        sys.exit(0)
