"""Interleaved two-level scaling benchmark (round 8).

The sequential protocol (tools/bench_scaling.py) runs every rep of the
low-core level, then every rep of the high-core level — so a host whose
effective speed drifts 1.5x between adjacent 15-minute windows (this
sandbox, measured: same-window 1->4 = 1.026 at 3.2M pages vs 0.639 at
6.4M pages, all six cpu_burn brackets clean) turns the ratio into noise
even when the cache-resident burn certifies the window. Same lesson as
the repo's A/B/A bench protocol: INTERLEAVE what you compare.

Here both levels keep a warmed JVM alive (the idle one blocks on stdin
— zero CPU), and single timed passes alternate L1 L2 L1 L2 ... so each
per-pair ratio spans ~2 adjacent passes instead of ~2 adjacent windows.
Reported: per-pair efficiencies, their median, and min/max spread.

    pair_eff_i = (thr2_i / thr1_i) / (n2 / n1)

Usage: python tools/bench_scaling_interleaved.py [n1 n2] [pairs]
Env:   RML_SCALING_PAGES (default 3200000)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
os.environ["RML_SPARK_SHUFFLE_PARTITIONS"] = %(cpus)r
from rml_utils_processor_ts_spark import get_spark
from rml_utils_processor_ts_spark.operators.executor import execute_mapping
from rml_utils_processor_ts_spark.sources.pages import synth_pages

spark = get_spark("scaling_interleaved_%(cpus)s", cpus=%(cpus)r)
spark.sparkContext.setLogLevel("ERROR")
pages_path = %(pages_path)r
if not os.path.exists(pages_path):
    synth_pages(spark, %(n_pages)d, partitions=32).write.mode("overwrite").parquet(pages_path)

mapping = '''
ex:map_pages a rr:TriplesMap ;
    rml:logicalSource [ a rml:LogicalSource ;
        rml:source "pages:%(pages_path)s" ;
        rml:iterator "//data" ;
        rml:referenceFormulation ql:XPath ] ;
    rr:subjectMap [ a rr:SubjectMap ; rr:template "http://example.org/{@id}" ;
        rr:class <http://example.org/Entity> ] ;
    rr:predicateObjectMap [
        rr:predicateMap [ rr:constant rdfs:label ] ;
        rr:objectMap [ rml:reference "@label" ; rr:termType rr:Literal ] ] .
'''

for _ in range(2):  # JIT/codegen warmup, excluded from timing
    execute_mapping(spark, mapping).triples.write.format("noop").mode("overwrite").save()
print("READY", flush=True)
for line in sys.stdin:
    cmd = line.strip()
    if cmd == "run":
        t0 = time.time()
        n = execute_mapping(spark, mapping).triples.count()
        dt = time.time() - t0
        print(json.dumps({"sec": round(dt, 3), "n": n}), flush=True)
    elif cmd == "quit":
        break
"""


class Level:
    def __init__(self, cpus: int, pages_path: str, n_pages: int):
        self.cpus = cpus
        code = WORKER % {
            "repo": REPO,
            "cpus": str(cpus),
            "pages_path": pages_path,
            "n_pages": n_pages,
        }
        self.proc = subprocess.Popen(
            [sys.executable, "-c", code],
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
            bufsize=1,
        )
        while True:
            line = self.proc.stdout.readline()
            if not line:
                raise RuntimeError(f"level {cpus} worker died during warmup")
            if line.strip() == "READY":
                break

    def run_once(self) -> dict:
        self.proc.stdin.write("run\n")
        self.proc.stdin.flush()
        while True:
            line = self.proc.stdout.readline()
            if not line:
                raise RuntimeError(f"level {self.cpus} worker died mid-run")
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)

    def quit(self) -> None:
        try:
            self.proc.stdin.write("quit\n")
            self.proc.stdin.flush()
            self.proc.wait(timeout=60)
        except Exception:
            self.proc.kill()


def main() -> None:
    n1 = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    n2 = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    n_pages = int(os.environ.get("RML_SCALING_PAGES", "3200000"))
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    pages_path = f"{base}/rml_scaling_pages_{n_pages}"

    l1 = Level(n1, pages_path, n_pages)
    l2 = Level(n2, pages_path, n_pages)
    rows = []
    try:
        for i in range(pairs):
            # alternate which level goes first inside the pair
            # (counterbalance the within-pair position effect)
            first, second = (l1, l2) if i % 2 == 0 else (l2, l1)
            ra = first.run_once()
            rb = second.run_once()
            r1, r2 = (ra, rb) if first is l1 else (rb, ra)
            thr1 = r1["n"] / r1["sec"]
            thr2 = r2["n"] / r2["sec"]
            eff = (thr2 / thr1) / (n2 / n1)
            rows.append(
                {
                    "pair": i + 1,
                    "order": f"{first.cpus}-first",
                    "sec1": r1["sec"],
                    "sec2": r2["sec"],
                    "thr1": round(thr1, 1),
                    "thr2": round(thr2, 1),
                    "eff": round(eff, 3),
                }
            )
            print(json.dumps(rows[-1]), flush=True)
    finally:
        l1.quit()
        l2.quit()

    effs = sorted(r["eff"] for r in rows)
    median = effs[len(effs) // 2]
    result = {
        "job": "pages_pipeline interleaved",
        "n_pages": n_pages,
        "n1": n1,
        "n2": n2,
        "pairs": rows,
        "median_eff": median,
        "eff_min": effs[0],
        "eff_max": effs[-1],
        "target": 0.8,
        "timestamp": datetime.now(timezone.utc).isoformat(timespec="seconds"),
    }
    print(json.dumps(result))

    md_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(md_path, "a") as fh:
        fh.write(
            f"| {result['timestamp']} | pages_pipeline INTERLEAVED | {n_pages} pages "
            f"| {n1} | median of {len(rows)} pair-thr1 | {n2} | median of {len(rows)} pair-thr2 "
            f"| **{median}** (min {effs[0]}, max {effs[-1]}) |\n"
        )


if __name__ == "__main__":
    main()
