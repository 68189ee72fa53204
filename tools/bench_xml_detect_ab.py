"""Interleaved A/B of the XML self-nesting detector on the pages
pipeline (VERDICT r02 "Next round" #2 / "What's wrong" #2).

Modes, toggled per-iteration via RML_XML_NESTED_DETECT (read at
plan-build time, so one JVM serves all runs — same JIT, same host
window, per the BENCH/BASELINE.md protocol):

* ``off``   — r01-style single regex pass, no nesting detection
              (fast but silently mis-splits self-nested iterator tags);
* ``probe`` — round-3 detector: plain-substring ``locate`` probe over
              the already-extracted fragments (no second payload scan).

r02's detector (a second full-payload ``regexp_extract_all`` opener
count) measured 7.50 s vs r01's 4.08 s in the driver bench
(BENCH_r02.json); this tool shows what the probe costs instead.

Usage: python tools/bench_xml_detect_ab.py [n_pages] [reps]
Prints one JSON line with per-mode times and medians.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from rml_utils_processor_ts_spark import get_spark
    from rml_utils_processor_ts_spark.operators.executor import execute_mapping
    from rml_utils_processor_ts_spark.sources.pages import synth_pages

    spark = get_spark("bench-xml-ab", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    pages_path = "/dev/shm/rml_ab_pages" if os.path.isdir("/dev/shm") else "/tmp/rml_ab_pages"
    synth_pages(spark, n_pages).write.mode("overwrite").parquet(pages_path)

    mapping = f"""
ex:map_pages a rr:TriplesMap ;
    rml:logicalSource [ a rml:LogicalSource ;
        rml:source "pages:{pages_path}" ;
        rml:iterator "//data" ;
        rml:referenceFormulation ql:XPath ] ;
    rr:subjectMap [ a rr:SubjectMap ; rr:template "http://example.org/{{@id}}" ;
        rr:class <http://example.org/Entity> ] ;
    rr:predicateObjectMap [
        rr:predicateMap [ rr:constant rdfs:label ] ;
        rr:objectMap [ rml:reference "@label" ; rr:termType rr:Literal ] ] .
"""

    def run(detect: str) -> tuple[float, int]:
        os.environ["RML_XML_NESTED_DETECT"] = detect
        t0 = time.time()
        n = execute_mapping(spark, mapping).triples.count()
        return time.time() - t0, n

    # JIT warmup (one of each, discarded), then interleave
    modes = os.environ.get("RML_AB_MODES", "0,1,count").split(",")  # off / probe(default) / replace-count
    for m in modes:
        run(m)  # JIT warmup, discarded
    times: dict[str, list[float]] = {m: [] for m in modes}
    counts = set()
    for _ in range(reps):
        for m in modes:
            dt, n = run(m)
            times[m].append(round(dt, 3))
            counts.add(n)
    os.environ.pop("RML_XML_NESTED_DETECT", None)

    med = {m: statistics.median(ts) for m, ts in times.items()}
    print(
        json.dumps(
            {
                "n_pages": n_pages,
                "n_triples": sorted(counts),
                "times": times,
                "median_sec": med,
                "overhead_vs_off_pct": {
                    m: round((med[m] / med["0"] - 1) * 100, 1) for m in modes if m != "0"
                },
            }
        )
    )


if __name__ == "__main__":
    main()
