"""Skew-mitigation stress: prove the round-3 salts actually spread a
hot key at scale (the r02 defect was a key-derived salt that spread
NOTHING), and that results stay exact.

Shape: N rows where 50% share ONE key with byte-identical payloads —
the web-corpus worst case (ADVICE r02: identical rows defeat
content-derived salts) — plus a uniform tail.

Checks:
  1. two_phase_agg == plain groupBy (exact values);
  2. the hot key's partial stage spreads over ALL n_salt groups and the
     largest (key, salt) partial group holds ~1/n_salt of the hot rows
     (the bound the docstring claims);
  3. split_hot_keys == plain join (row-set equality by count + checksum)
     and the hot rows spread over all n_salt salt values;
  4. wall-clock for salted vs plain (reported honestly: on one shared-
     memory JVM the plain forms may win — the salt exists for the
     1000-executor shuffle where one reducer receiving 50% of all rows
     is the difference between finishing and not).

Usage: python tools/stress_skew.py [n_rows]  (default 20M)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from rml_utils_processor_ts_spark import get_spark  # noqa: E402
from rml_utils_processor_ts_spark.operators.skew import (  # noqa: E402
    row_spread_salt,
    split_hot_keys,
    two_phase_agg,
)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_salt = 16
    spark = get_spark("stress-skew", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    # 50% one hot key with BYTE-IDENTICAL payloads; long uniform tail
    base = spark.range(n_rows, numPartitions=64)
    df = base.select(
        F.when(F.col("id") % 2 == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 100_000).cast("string")))
        .alias("k"),
        F.when(F.col("id") % 2 == 0, F.lit(1.0)).otherwise(F.lit(2.0)).alias("v"),
    )
    df.write.mode("overwrite").parquet("/dev/shm/stress_skew_rows")
    df = spark.read.parquet("/dev/shm/stress_skew_rows")

    # 1+2: salted agg exactness + spread audit
    t0 = time.time()
    plain = df.groupBy("k").agg(F.count("*").alias("n"), F.sum("v").alias("s"))
    plain_hot = plain.filter(F.col("k") == "hot").collect()[0]
    t_plain = time.time() - t0

    t0 = time.time()
    salted = two_phase_agg(df, ["k"], {"n": "count", "s": "sum:v"}, n_salt=n_salt)
    salted_hot = salted.filter(F.col("k") == "hot").collect()[0]
    t_salted = time.time() - t0
    assert salted_hot["n"] == plain_hot["n"], (salted_hot, plain_hot)
    assert abs(salted_hot["s"] - plain_hot["s"]) < 1e-6

    audit = (
        df.withColumn("__salt", row_spread_salt(n_salt))
        .filter(F.col("k") == "hot")
        .groupBy("__salt")
        .count()
        .collect()
    )
    hot_n = plain_hot["n"]
    max_group = max(r["count"] for r in audit)
    spread = {
        "distinct_salts": len(audit),
        "n_salt": n_salt,
        "hot_rows": hot_n,
        "max_partial_group": max_group,
        "bound_ratio": round(max_group / (hot_n / n_salt), 3),
    }
    assert len(audit) == n_salt, spread
    assert max_group < hot_n * 0.25, spread  # far below the unsalted 100%

    # 3: hot-key split join exactness + spread
    small = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"L{i}") for i in range(100_000)],
        "k string, label string",
    )
    t0 = time.time()
    plain_join = df.join(small, "k")
    pj = plain_join.agg(
        F.count("*").alias("n"), F.bit_xor(F.xxhash64("k", "v", "label")).alias("sig")
    ).collect()[0]
    t_pjoin = time.time() - t0

    t0 = time.time()
    sj_df = split_hot_keys(df, small, "k", hot_threshold=1_000_000, n_salt=8, keep_salt=True)
    sj = sj_df.agg(
        F.count("*").alias("n"),
        F.bit_xor(F.xxhash64("k", "v", "label")).alias("sig"),
        F.countDistinct(F.when(F.col("k") == "hot", F.col("__salt"))).alias("hot_salts"),
    ).collect()[0]
    t_sjoin = time.time() - t0
    assert sj["n"] == pj["n"] and sj["sig"] == pj["sig"], (sj, pj)
    assert sj["hot_salts"] == 8, sj

    print(
        json.dumps(
            {
                "n_rows": n_rows,
                "agg": {
                    "plain_sec": round(t_plain, 2),
                    "salted_sec": round(t_salted, 2),
                    "exact_match": True,
                    "spread": spread,
                },
                "join": {
                    "plain_sec": round(t_pjoin, 2),
                    "split_sec": round(t_sjoin, 2),
                    "rows": sj["n"],
                    "checksum_match": True,
                    "hot_key_salts_used": sj["hot_salts"],
                },
            }
        )
    )


if __name__ == "__main__":
    main()
