"""Full KG-construction pipeline stress (north_rule end-to-end): synth
page table -> extraction-invariant check -> RML mapping -> entity
linking (broadcast alias dict) -> connected-components canonicalization
-> partitioned triple table + lineage -> RESUME check (same run id
short-circuits; a second snapshot commits v2).

This is the composed form of the stages the per-operator benches measure
in isolation — one number for "the pipeline" plus the resume semantics
the north rule requires.

Usage: python tools/stress_kg_pipeline.py [n_pages]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MAPPING = """
ex:map_pages a rr:TriplesMap ;
    rml:logicalSource [ a rml:LogicalSource ;
        rml:source "pages" ;
        rml:iterator "//data" ;
        rml:referenceFormulation ql:XPath ] ;
    rr:subjectMap [ a rr:SubjectMap ; rr:template "http://ex.org/e/{@id}" ;
        rr:class <http://ex.org/Entity> ] ;
    rr:predicateObjectMap [
        rr:predicateMap [ rr:constant rdfs:label ] ;
        rr:objectMap [ rml:reference "@label" ; rr:termType rr:Literal ] ] .
"""


def _ui_metrics(spark) -> dict | None:
    """Aggregate shuffle/spill evidence from the Spark UI REST API
    (needs RML_SPARK_UI=true). Peak columns answer the scale question
    directly: does any single stage's shuffle approach executor memory,
    and did anything spill?"""
    import json as _j
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    if not base:
        return None
    try:
        apps = _j.load(urllib.request.urlopen(f"{base}/api/v1/applications"))
        app_id = apps[0]["id"]
        stages = _j.load(
            urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}/stages?status=complete")
        )
        return {
            "completed_stages": len(stages),
            "shuffle_write_bytes": sum(s.get("shuffleWriteBytes", 0) for s in stages),
            "shuffle_read_bytes": sum(s.get("shuffleReadBytes", 0) for s in stages),
            "memory_spill_bytes": sum(s.get("memoryBytesSpilled", 0) for s in stages),
            "disk_spill_bytes": sum(s.get("diskBytesSpilled", 0) for s in stages),
            "peak_stage_shuffle_write_bytes": max(
                (s.get("shuffleWriteBytes", 0) for s in stages), default=0
            ),
            "peak_execution_memory_bytes": max(
                (s.get("peakExecutionMemory", 0) for s in stages), default=0
            ),
        }
    except Exception as e:  # noqa: BLE001 — evidence capture must not fail the run
        return {"error": str(e)}


def main(n_pages: int) -> None:
    from pyspark.sql import functions as F

    from rml_utils_processor_ts_spark import get_spark
    from rml_utils_processor_ts_spark.pipeline import run_pipeline
    from rml_utils_processor_ts_spark.sources.pages import synth_pages

    spark = get_spark("stress_kg_pipeline", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    pages_path = f"{base}/kg_stress_pages"
    out_path = f"{base}/kg_stress_graph"
    shutil.rmtree(out_path, ignore_errors=True)
    if not os.path.exists(pages_path):
        synth_pages(spark, n_pages).write.mode("overwrite").parquet(pages_path)

    # alias dictionary: every 100th page's record-0 label is a known
    # mention; word groups (i % 211) share a canonical IRI, so linking
    # emits ~n/100 sameAs edges that CC merges into 211 star components
    alias_dict = spark.range(0, n_pages, 100).select(
        F.format_string("label %08d-0 word%d", F.col("id"), F.pmod(F.col("id"), F.lit(211)))
        .alias("alias"),
        F.concat(F.lit("http://ex.org/canon/word"), F.pmod(F.col("id"), F.lit(211)).cast("string"))
        .alias("canonical_iri"),
    )

    t0 = time.time()
    s1 = run_pipeline(spark, pages_path, MAPPING, out_path, run_id="stress-1",
                      alias_dict=alias_dict)
    run1_sec = time.time() - t0
    assert not s1["skipped"], s1
    ui = _ui_metrics(spark)  # run-1 attribution: captured before resume/v2

    # resume: the SAME run id must short-circuit without touching data
    t0 = time.time()
    s_resume = run_pipeline(spark, pages_path, MAPPING, out_path, run_id="stress-1",
                            alias_dict=alias_dict)
    resume_sec = time.time() - t0
    assert s_resume["skipped"], s_resume

    # canonicalization evidence: linked subjects were rewritten
    latest = sorted(d for d in os.listdir(out_path) if d.startswith("v_"))[-1]
    graph = spark.read.parquet(os.path.join(out_path, latest, "data"))
    n_triples = graph.count()
    n_canon = graph.filter(F.col("s").startswith("http://ex.org/canon/")).count()

    # QA audit over the committed graph (operators/kgqa): zero malformed
    # IRIs, and the only orphan object is the class IRI — i.e. the
    # canonicalization left no dangling entity references
    from rml_utils_processor_ts_spark.operators.kgqa import iri_audit, orphan_objects

    graph_t = graph.withColumn("o_termtype",
                               F.when(F.col("o").startswith("http"), "IRI").otherwise("Literal"))
    audit = iri_audit(graph_t.withColumn("s_termtype", F.lit("IRI"))).collect()
    bad = sum(r["bad_subject_iris"] + r["bad_predicate_iris"] + r["bad_object_iris"] for r in audit)
    orphans = [r["iri"] for r in orphan_objects(graph_t).collect()]

    # second snapshot -> second committed version
    s2 = run_pipeline(spark, pages_path, MAPPING, out_path, run_id="stress-2",
                      alias_dict=alias_dict)
    assert not s2["skipped"]

    print(json.dumps({
        "job": "kg_pipeline_stress",
        "n_pages": n_pages,
        "n_triples": n_triples,
        "canonicalized_subject_triples": n_canon,
        "expected_linked_subjects": n_pages // 100,
        "run1_sec": round(run1_sec, 1),
        "triples_per_sec": round(n_triples / run1_sec),
        "resume_skip_sec": round(resume_sec, 2),
        "second_snapshot_version": s2["version"],
        "run1_summary_n_triples": s1["n_triples"],
        "stage_metrics": s1.get("stage_metrics"),
        "qa_bad_iris": bad,
        "qa_orphan_objects": orphans,
        "ui_metrics_run1": ui,
    }))
    assert n_canon > 0, "no canonicalized subjects — linking/CC did not run"
    assert bad == 0, "malformed IRIs in the committed graph"
    assert orphans == ["http://ex.org/Entity"], orphans


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_600_000)
