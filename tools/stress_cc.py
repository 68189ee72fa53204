"""Connected-components scale stress: 100k chains (depth stresses the
round count) + one 100k-spoke hub (skew stresses a single reducer) —
exactly 100,001 components expected, verified as a golden equality.

Edges: chains c{i}_0 - c{i}_1 - ... - c{i}_{L-1} for 100k i's, plus
hub h - s{j} for 100k j's: 100k*(L-1) + 100k edges (~4.1M at L=40).

Usage: python tools/stress_cc.py [n_chains] [chain_len] [n_spokes]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from rml_utils_processor_ts_spark import get_spark  # noqa: E402
from rml_utils_processor_ts_spark.operators.cc import connected_components  # noqa: E402


def main() -> None:
    n_chains = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    chain_len = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    n_spokes = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000
    spark = get_spark("stress-cc", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    chain_links = (
        spark.range(n_chains * (chain_len - 1), numPartitions=64)
        .select(
            (F.col("id") / (chain_len - 1)).cast("long").alias("c"),
            (F.col("id") % (chain_len - 1)).alias("p"),
        )
        .select(
            F.format_string("c%06d_%02d", "c", "p").alias("src"),
            F.format_string("c%06d_%02d", "c", F.col("p") + 1).alias("dst"),
        )
    )
    spokes = spark.range(n_spokes).select(
        F.lit("hub").alias("src"), F.format_string("s%06d", "id").alias("dst")
    )
    edges = chain_links.unionByName(spokes)
    edges.write.mode("overwrite").parquet("/dev/shm/stress_cc_edges")
    edges = spark.read.parquet("/dev/shm/stress_cc_edges")
    n_edges = edges.count()

    t0 = time.time()
    comp = connected_components(edges)
    n_components = comp.select("component").distinct().count()
    dt = time.time() - t0
    expected = n_chains + 1
    print(
        json.dumps(
            {
                "n_edges": n_edges,
                "n_components": n_components,
                "expected": expected,
                "golden_match": n_components == expected,
                "sec": round(dt, 1),
            }
        )
    )
    assert n_components == expected


if __name__ == "__main__":
    main()
