"""Per-query micro-benchmark with noop sink (guide §1.4) — round-robin
repetitions so host drift spreads evenly over queries.

Usage: python tools/bench_extra.py [--reps N] [query ...]

Defaults to the bench.py query set + pages_pipeline. Prints one JSON
line per (query, rep) and a final summary line with per-query medians.
This file is measurement-only; bench.py stays frozen for the driver.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

BENCH_QUERIES = [
    "rml_customer_triples",
    "rml_join_orders_customer",
    "rml_conditional_subject",
    "rml_ldes_versioned",
    "nquads_lines",
    "cdc_diff",
    "dedup_exact",
    "dedup_minhash_signatures",
    "dedup_minhash_lsh_pairs",
    "ann_cosine_topk",
    "text_profile",
    "events_window_agg",
    "cc_components",
    "entity_link_exact",
    "pages_pipeline",
]


def _pages_pipeline(spark, sf_dir):
    """Mirror of bench.py's flagship stage, minus the synth+write (done
    once at session setup by main())."""
    from rml_utils_processor_ts_spark.operators.executor import execute_mapping

    pages_path = _pages_path()
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
    res = execute_mapping(spark, mapping)
    return res.triples


def _pages_path() -> str:
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    return f"{base}/rml_bench_pages_extra"


def main() -> int:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "--reps":
        reps = int(args[1])
        args = args[2:]
    names = args or BENCH_QUERIES

    import __spark_entry__ as entrymod
    from rml_utils_processor_ts_spark import get_spark

    spark = get_spark("bench_extra", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    queries = {**entrymod.queries(), **entrymod.EXTRA_QUERIES}
    queries["pages_pipeline"] = _pages_pipeline
    if "pages_pipeline" in names:
        from rml_utils_processor_ts_spark.sources.pages import synth_pages

        n_pages = int(os.environ.get("RML_BENCH_PAGES", "800000"))
        synth_pages(spark, n_pages).write.mode("overwrite").parquet(_pages_path())

    results: dict[str, list[float]] = {n: [] for n in names}
    for rep in range(reps):
        for name in names:
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            if name == "pages_pipeline":
                # bench.py times execute_mapping + .count() for this one
                queries[name](spark, SF_DIR).count()
            else:
                queries[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            results[name].append(dt)
            print(json.dumps({"query": name, "rep": rep, "sec": dt}), flush=True)
            spark.sparkContext.setJobDescription(None)

    summary = {
        n: {
            "median": round(statistics.median(v), 3),
            "min": round(min(v), 3),
            "samples": v,
        }
        for n, v in results.items()
    }
    print(json.dumps({"summary": summary, "sf": SF_DIR, "cpus": CPUS, "reps": reps}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
