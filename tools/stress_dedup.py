"""MinHash-LSH dedup stress: N synthetic documents with planted
near-duplicate pairs -> full signatures -> banding -> verify pipeline,
reporting recall of the planted pairs and end-to-end throughput.

Corpus (deterministic, no RNG state): doc 2k and doc 2k+1 share a
40-token body derived from xxhash64 of (k, position) over a 50k-word
vocabulary; the odd twin replaces its last token, so each pair sits at
~0.9 shingle-Jaccard — findable but NOT byte-identical (the hard case
for banding). Odd tokens make cross-pair collisions negligible, so
reported extra pairs are genuine LSH candidates that verified.

Usage: python tools/stress_dedup.py [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main(n_docs: int) -> None:
    from rml_utils_processor_ts_spark import get_spark
    from rml_utils_processor_ts_spark.operators.dedup import minhash_dedup_pairs

    spark = get_spark("stress_dedup", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    tokens_per_doc = 40
    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        (F.col("id") - F.pmod(F.col("id"), F.lit(2))).alias("pair_seed"),
    )
    words = F.transform(
        F.sequence(F.lit(0), F.lit(tokens_per_doc - 1)),
        lambda i: F.concat(
            F.lit("w"), F.pmod(F.xxhash64(F.col("pair_seed"), i), F.lit(50_000))
        ),
    )
    # odd twin: replace the LAST token -> near-dup, not exact dup
    words = F.when(
        F.pmod(F.col("doc_id"), F.lit(2)) == 1,
        F.concat(
            F.slice(words, 1, tokens_per_doc - 1),
            F.array(F.concat(F.lit("alt"), F.col("doc_id"))),
        ),
    ).otherwise(words)
    docs = base.select("doc_id", F.array_join(words, " ").alias("text"))
    path = ("/dev/shm" if os.path.isdir("/dev/shm") else "/tmp") + "/stress_dedup_docs"
    docs.write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)

    t0 = time.time()
    pairs = minhash_dedup_pairs(docs, threshold=0.5, num_hashes=16, bands=4)
    # ONE action for both counts — a second count() would re-run the
    # whole uncached pipeline and double the reported wall time
    agg = pairs.agg(
        F.count("*").alias("total"),
        F.sum(
            F.when(
                (F.col("id_b") == F.col("id_a") + 1)
                & (F.pmod(F.col("id_a"), F.lit(2)) == 0),
                1,
            ).otherwise(0)
        ).alias("planted"),
    ).first()
    found_planted = int(agg["planted"] or 0)
    n_pairs = agg["total"]
    dt = time.time() - t0
    planted = n_docs // 2
    print(
        json.dumps(
            {
                "job": "minhash_lsh_dedup_stress",
                "n_docs": n_docs,
                "planted_pairs": planted,
                "found_planted": found_planted,
                "recall": round(found_planted / planted, 4),
                "total_pairs": n_pairs,
                "sec": round(dt, 1),
                "docs_per_sec": round(n_docs / dt, 1),
            }
        )
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000)
