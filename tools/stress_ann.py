"""ANN stress: exact brute-force cosine top-k vs LSH-bucketed top-k over
N synthetic 64-dim vectors; reports wall time for both and LSH recall@k
against the exact result.

Vectors are deterministic (xxhash-derived components, no RNG state).
To make recall meaningful the corpus is CLUSTERED: component c of
vector i mixes a shared cluster centroid (i mod 256) with a per-vector
delta, so each query has genuinely-near neighbors and LSH buckets align
with the cluster structure — uniform random vectors would make "top-k"
noise at any method.

Usage: python tools/stress_ann.py [n_vectors]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main(n: int) -> None:
    from rml_utils_processor_ts_spark import get_spark
    from rml_utils_processor_ts_spark.operators.similarity import cosine_topk, lsh_ann_topk

    spark = get_spark("stress_ann", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    centroid = F.pmod(F.col("id"), F.lit(256))
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda c: (
                (F.pmod(F.xxhash64(centroid, c), F.lit(1000)) / 500.0 - 1.0)
                + 0.1 * (F.pmod(F.xxhash64(F.col("id"), c), F.lit(1000)) / 500.0 - 1.0)
            ),
        ).alias("embedding"),
    )
    path = ("/dev/shm" if os.path.isdir("/dev/shm") else "/tmp") + "/stress_ann_vecs"
    emb.write.mode("overwrite").parquet(path)
    emb = spark.read.parquet(path)
    queries = [0, 1, 2, 3, 4]
    k = 10

    t0 = time.time()
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=k).collect()
    }
    exact_sec = time.time() - t0

    t0 = time.time()
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_ann_topk(emb, queries, k=k, n_planes=8).collect()
    }
    lsh_sec = time.time() - t0

    # ingest-time index: pay the bucketing once, query via pruned reads
    from rml_utils_processor_ts_spark.operators.similarity import (
        lsh_index_topk,
        write_lsh_index,
    )

    idx_path = ("/dev/shm" if os.path.isdir("/dev/shm") else "/tmp") + "/stress_ann_index"
    t0 = time.time()
    write_lsh_index(emb, idx_path, n_planes=8)
    index_build_sec = time.time() - t0
    # queries are corpus members here, so the id-lookup path applies
    # (self-excluded, comparable to the exact baseline); external query
    # vectors would use query_vectors= and keep identical corpus rows
    t0 = time.time()
    indexed = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_index_topk(spark, idx_path, queries, k=k).collect()
    }
    index_query_sec = time.time() - t0

    # the index's real claim at scale: the candidate read is a
    # partition-pruned FRACTION of the corpus (wall-clock at this input
    # size is fixed-cost dominated — see BENCH/BASELINE.md caveats)
    idx = spark.read.parquet(idx_path)
    q_buckets = sorted(
        {r["bucket"] for r in idx.filter(F.col("id").isin(queries)).select("bucket").collect()}
    )
    n_candidates = idx.filter(F.col("bucket").isin(q_buckets)).count()

    # margin-directed multi-probe (VERDICT r3 #5): recall and candidate
    # multiple vs single-probe, on the SAME index
    from rml_utils_processor_ts_spark.operators.similarity import (
        _hyperplanes,
        py_probe_buckets,
    )

    multiprobe = {}
    meta = spark.read.json(idx_path + "/_lsh_meta").first().asDict()
    planes = _hyperplanes(int(meta["dim"]), int(meta["n_planes"]), int(meta["seed"]))
    q_vecs = [
        (r["id"], list(r["v"]))
        for r in idx.filter(F.col("id").isin(queries)).select("id", "v").collect()
    ]
    for n_probe in (2, 3):
        t0 = time.time()
        probed = {
            (r["query_id"], r["neighbor_id"])
            for r in lsh_index_topk(spark, idx_path, queries, k=k, n_probe=n_probe).collect()
        }
        sec = time.time() - t0
        buckets = sorted(
            {"b" + b for _, vec in q_vecs for b in py_probe_buckets(vec, planes, n_probe)}
        )
        n_cand = idx.filter(F.col("bucket").isin(buckets)).count()
        multiprobe[f"n_probe_{n_probe}"] = {
            "recall_at_k": round(len(exact & probed) / len(exact), 4),
            "query_sec": round(sec, 1),
            "candidates": n_cand,
            "candidate_multiple_vs_single": round(n_cand / max(1, n_candidates), 2),
        }

    print(
        json.dumps(
            {
                "job": "ann_stress",
                "n_vectors": n,
                "k": k,
                "exact_sec": round(exact_sec, 1),
                "lsh_sec": round(lsh_sec, 1),
                "speedup": round(exact_sec / lsh_sec, 2),
                "lsh_recall_at_k": round(len(exact & approx) / len(exact), 4),
                "index_build_sec": round(index_build_sec, 1),
                "index_query_sec": round(index_query_sec, 1),
                "index_recall_at_k": round(len(exact & indexed) / len(exact), 4),
                "index_candidates": n_candidates,
                "index_candidate_fraction": round(n_candidates / n, 4),
                "multiprobe": multiprobe,
            }
        )
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000)
