"""Generate a schema-compatible synthetic scale-factor directory so the
bench can be exercised at sizes the sandbox testdata does not ship
(round-10 "optimizations must hold at both sizes" evidence).

NOT the driver's generator — distributions are approximate (documents
are word-soup with overlapping shingles, events cluster per user, etc.)
— but every column referenced by the declared queries exists with the
right type, so `bench.py` runs unmodified against the output via
$SPARK_GRAFT_SF_DIR.

Usage: python tools/synth_sf.py /dev/shm/sfX <scale>   # scale 1.0 ~ TPCH sf1-ish row counts
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


WORDS = [
    "the", "a", "and", "of", "to", "is", "in", "it", "table", "alpha", "beta",
    "gamma", "delta", "word", "data", "page", "model", "train", "corpus",
    "sample", "quality", "signal", "token", "line", "text", "value",
]


def main() -> int:
    out = sys.argv[1]
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0

    from rml_utils_processor_ts_spark import get_spark

    spark = get_spark("synth_sf")
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism

    single = os.environ.get("SYNTH_SF_SINGLE_FILE", "1") != "0"

    def rng(n, cols):
        df = spark.range(0, int(n), 1, par).select(*cols)
        # mirror the driver testdata layout (one file, one row group per
        # table) unless SYNTH_SF_SINGLE_FILE=0 — the single-file form is
        # the one that stresses the scan-parallelism rescue
        return df.coalesce(1) if single else df

    i = F.col("id")
    os.makedirs(out, exist_ok=True)

    # nation / region (fixed small)
    rng(25, [i.cast("int").alias("n_nationkey"),
             F.format_string("NATION_%d", i).alias("n_name"),
             (i % 5).cast("int").alias("n_regionkey")]).write.mode("overwrite").parquet(f"{out}/nation.parquet")
    rng(5, [i.cast("int").alias("r_regionkey"),
            F.format_string("REGION_%d", i).alias("r_name")]).write.mode("overwrite").parquet(f"{out}/region.parquet")

    n_cust = int(150_000 * scale)
    rng(n_cust, [
        (i + 1).alias("c_custkey"),
        F.format_string("Customer#%09d", i + 1).alias("c_name"),
        (i % 25).cast("int").alias("c_nationkey"),
        F.round((F.pmod(F.xxhash64(i), F.lit(100000)) / 100.0) - 100.0, 2).alias("c_acctbal"),
        F.element_at(F.array(*[F.lit(x) for x in ("BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE")]),
                     (i % 5 + 1).cast("int")).alias("c_mktsegment"),
    ]).write.mode("overwrite").parquet(f"{out}/customer.parquet")

    n_ord = int(1_500_000 * scale)
    rng(n_ord, [
        (i + 1).alias("o_orderkey"),
        (F.pmod(F.xxhash64(i + 7), F.lit(n_cust)) + 1).alias("o_custkey"),
        F.element_at(F.array(F.lit("O"), F.lit("F"), F.lit("P")), (i % 3 + 1).cast("int")).alias("o_orderstatus"),
        F.round(F.pmod(F.xxhash64(i + 13), F.lit(5000000)) / 10.0, 2).alias("o_totalprice"),
        F.timestamp_seconds(F.lit(820454400) + (i % 2557) * 86400).alias("o_orderdate"),
        F.format_string("%d-PRIORITY", i % 5 + 1).alias("o_orderpriority"),
    ]).write.mode("overwrite").parquet(f"{out}/orders.parquet")

    n_li = int(6_000_000 * scale)
    rng(n_li, [
        (F.pmod(F.xxhash64(i), F.lit(n_ord)) + 1).alias("l_orderkey"),
        (F.pmod(F.xxhash64(i + 1), F.lit(int(200_000 * scale))) + 1).alias("l_partkey"),
        (F.pmod(F.xxhash64(i + 2), F.lit(10_000)) + 1).alias("l_suppkey"),
        (i % 7 + 1).cast("int").alias("l_linenumber"),
        (F.pmod(F.xxhash64(i + 3), F.lit(50)) + 1).cast("double").alias("l_quantity"),
        F.round(F.pmod(F.xxhash64(i + 4), F.lit(10000000)) / 100.0, 2).alias("l_extendedprice"),
        F.round(F.pmod(F.xxhash64(i + 5), F.lit(11)) / 100.0, 2).alias("l_discount"),
        F.round(F.pmod(F.xxhash64(i + 6), F.lit(9)) / 100.0, 2).alias("l_tax"),
        F.element_at(F.array(F.lit("R"), F.lit("A"), F.lit("N")), (i % 3 + 1).cast("int")).alias("l_returnflag"),
        F.element_at(F.array(F.lit("O"), F.lit("F")), (i % 2 + 1).cast("int")).alias("l_linestatus"),
        F.timestamp_seconds(F.lit(820454400) + (i % 2500) * 86400).alias("l_shipdate"),
    ]).write.mode("overwrite").parquet(f"{out}/lineitem.parquet")

    # documents: word soup with shingle overlap (every 10th doc shares a
    # prefix with its neighbor so dedup/minhash find real near-dups)
    n_doc = int(50_000 * scale)
    word_arr = F.array(*[F.lit(w) for w in WORDS])
    body = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(79) + (i % 40).cast("int")),
            lambda j: F.element_at(word_arr, (F.pmod(F.xxhash64(F.when(i % 10 == 9, i - 1).otherwise(i) * 1000 + F.when(j < 40, j).otherwise(j * (i % 7 + 1))), F.lit(len(WORDS))) + 1).cast("int")),
        ),
    )
    rng(n_doc, [
        i.alias("doc_id"),
        body.alias("text"),
        F.element_at(F.array(*[F.lit(x) for x in ("en", "de", "fr", "es", "nl")]), (i % 5 + 1).cast("int")).alias("lang"),
        F.format_string("src%d", F.pmod(F.xxhash64(i + 3), F.lit(5))).alias("source"),
        F.length(body).alias("n_chars"),
    ]).write.mode("overwrite").parquet(f"{out}/documents.parquet")

    n_ev = int(1_000_000 * scale)
    rng(n_ev, [
        i.alias("event_id"),
        F.timestamp_seconds(F.lit(1704067200) + F.pmod(F.xxhash64(i), F.lit(30 * 86400))).alias("ts"),
        F.pmod(F.xxhash64(i + 11), F.lit(int(5000 * scale))).alias("user_id"),
        F.format_string("type_%d", i % 8).alias("event_type"),
        F.round(F.pmod(F.xxhash64(i + 17), F.lit(10000)) / 100.0, 2).alias("value"),
        F.to_json(F.struct(F.format_string("k%d", i % 13).alias("k"))).alias("props"),
    ]).write.mode("overwrite").parquet(f"{out}/events.parquet")

    n_emb = int(20_000 * scale)
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda d: (F.pmod(F.xxhash64(F.pmod(i, F.lit(211)) * 100 + d), F.lit(2001)) - 1000).cast("float") / 1000.0,
    )
    rng(n_emb, [
        i.alias("vec_id"),
        emb.alias("embedding"),
        F.pmod(F.xxhash64(i + 29), F.lit(20)).cast("int").alias("label"),
    ]).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")

    n_part = int(200_000 * scale)
    rng(n_part, [
        (i + 1).alias("p_partkey"),
        F.format_string("part name %d alpha beta", i).alias("p_name"),
        F.format_string("Brand#%d", i % 25 + 11).alias("p_brand"),
        F.format_string("TYPE %d", i % 150).alias("p_type"),
        (i % 50 + 1).cast("int").alias("p_size"),
        F.round(F.pmod(F.xxhash64(i + 31), F.lit(200000)) / 100.0, 2).alias("p_retailprice"),
    ]).write.mode("overwrite").parquet(f"{out}/part.parquet")

    rng(int(10_000 * scale), [
        (i + 1).alias("s_suppkey"),
        F.format_string("Supplier#%09d", i + 1).alias("s_name"),
        (i % 25).cast("int").alias("s_nationkey"),
        F.round((F.pmod(F.xxhash64(i + 37), F.lit(100000)) / 100.0) - 100.0, 2).alias("s_acctbal"),
    ]).write.mode("overwrite").parquet(f"{out}/supplier.parquet")

    print(f"wrote synthetic sf dir {out} at scale {scale}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
