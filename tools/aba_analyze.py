"""Analyze a counterbalanced A/B/A jsonl (tools/run_aba7.sh output).

Reports, per query and for the suite total:
  - median seconds per version over ALL reps;
  - the position-effect control (mean of position-1 runs vs position-2
    runs pooled across versions — the r6 lesson: ~0.4 s penalty for
    position 2 inside a pair);
  - delta and ratio r07/r06.

Counterbalancing makes the all-reps medians fair (each version sits in
position 1 and position 2 equally often), so no window-slicing is
needed — the position effect cancels in the median.

Usage: python tools/aba_analyze.py BENCH/aba_r7.jsonl [r06 r07]
"""

from __future__ import annotations

import json
import statistics
import sys


def main(path: str, va: str = "r06", vb: str = "r07") -> int:
    rows = [json.loads(l) for l in open(path) if l.strip()]
    per: dict[str, dict[str, list[float]]] = {}
    suite: dict[str, list[float]] = {va: [], vb: []}
    pos_means: dict[int, list[float]] = {1: [], 2: []}
    # reconstruct position: run_aba7.sh appends in execution order
    for i, r in enumerate(rows):
        if not r.get("result"):
            continue
        v = r["version"]
        res = r["result"]
        suite[v].append(res["value"])
        pos_means[(i % 2) + 1].append(res["value"])
        for q, sec in res["queries"].items():
            per.setdefault(q, {va: [], vb: []})[v].append(sec)

    def med(xs: list[float]) -> float:
        return statistics.median(xs) if xs else float("nan")

    print(f"{'query':34s} {va:>8s} {vb:>8s} {'delta':>8s} {'ratio':>6s}")
    for q in sorted(per, key=lambda q: -med(per[q][va])):
        a, b = med(per[q][va]), med(per[q][vb])
        print(f"{q:34s} {a:8.2f} {b:8.2f} {b - a:+8.2f} {b / a:6.2f}")
    sa, sb = med(suite[va]), med(suite[vb])
    print(f"{'SUITE':34s} {sa:8.2f} {sb:8.2f} {sb - sa:+8.2f} {sb / sa:6.2f}")
    p1, p2 = statistics.mean(pos_means[1]), statistics.mean(pos_means[2])
    print(
        f"position control: pos1 mean {p1:.2f} s, pos2 mean {p2:.2f} s "
        f"(delta {p2 - p1:+.2f} s pooled across versions)"
    )
    print(f"reps: {len(suite[va])} x {va}, {len(suite[vb])} x {vb}")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
