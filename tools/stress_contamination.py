"""Contamination stress: plant benchmark passages into a synthetic
corpus and verify EXACT detection at scale — every planted document
flagged at the expected fraction, zero false positives.

Correctness-at-scale evidence (host-throttle-insensitive, unlike
wall-clock): the planted set is known analytically, so recall and
precision must both be 1.0.

Usage: python tools/stress_contamination.py [n_docs]
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
    from rml_utils_processor_ts_spark.operators.contamination import (
        contamination_report,
        decontaminate,
    )

    spark = get_spark("stress_contamination", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    # base corpus: 40 deterministic pseudo-words per doc
    words = F.transform(
        F.sequence(F.lit(0), F.lit(39)),
        lambda i: F.concat(F.lit("w"), F.pmod(F.xxhash64(F.col("id"), i), F.lit(5000)).cast("string")),
    )
    # benchmark: 3 fixed passages of 20 known tokens each
    passages = {
        b: " ".join(f"bench{b}tok{t}" for t in range(20)) for b in range(3)
    }
    # plant passage (id % 3) into every 1000th doc, mid-document
    planted = F.col("id") % 1000 == 0
    passage = F.element_at(
        F.array(*[F.lit(p) for p in passages.values()]),
        (F.col("id") % 3 + 1).cast("int"),
    )
    text = F.when(
        planted,
        F.concat_ws(" ", F.array_join(F.slice(words, 1, 20), " "), passage,
                    F.array_join(F.slice(words, 21, 20), " ")),
    ).otherwise(F.array_join(words, " "))
    docs = spark.range(n).select(F.col("id").alias("doc_id"), text.alias("text"))
    path = ("/dev/shm" if os.path.isdir("/dev/shm") else "/tmp") + "/stress_contam_docs"
    docs.write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)

    bench = spark.createDataFrame(
        [(b, p) for b, p in passages.items()], "bench_id long, text string"
    )

    t0 = time.time()
    rep = contamination_report(docs, bench, k=13)
    flagged = {(r["doc_id"], r["bench_id"]): r["fraction"] for r in rep.collect()}
    report_sec = time.time() - t0

    expected = {(d, d % 3) for d in range(0, n, 1000)}
    got = set(flagged)
    missing = expected - got
    false_pos = got - expected
    full = sum(1 for k, v in flagged.items() if v == 1.0)

    t0 = time.time()
    kept = decontaminate(docs, bench, k=13, min_fraction=0.8).count()
    decon_sec = time.time() - t0

    print(json.dumps({
        "job": "contamination_stress",
        "n_docs": n,
        "planted": len(expected),
        "flagged": len(got),
        "recall": round(1 - len(missing) / max(1, len(expected)), 6),
        "false_positives": len(false_pos),
        "fraction_1_0": full,
        "kept_after_decontaminate": kept,
        "expected_kept": n - len(expected),
        "report_sec": round(report_sec, 1),
        "decontaminate_sec": round(decon_sec, 1),
    }))
    assert not missing, f"missed planted docs: {sorted(missing)[:5]}"
    assert not false_pos, f"false positives: {sorted(false_pos)[:5]}"
    assert kept == n - len(expected)


def mask_main(n_docs: int, n_passages: int) -> None:
    """Mask-mode stress at a ≥1M-gram benchmark set: verifies the
    SparkContext.broadcast path (the gram set serializes once per
    executor, not per task) stays exact — every planted doc masks all
    33 passage tokens, clean docs untouched — and reports wall time.

    n_passages passages × 33 tokens → 21 k-grams each at k=13, so
    50_000 passages ≈ 1.05M distinct grams (~100 MB broadcast in
    Python-set form)."""
    from rml_utils_processor_ts_spark import get_spark
    from rml_utils_processor_ts_spark.operators.contamination import (
        mask_contaminated_spans,
    )

    spark = get_spark("stress_contam_mask", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    passage_toks = F.transform(
        F.sequence(F.lit(0), F.lit(32)),
        lambda t: F.concat(F.lit("b"), F.col("id").cast("string"), F.lit("t"), t.cast("string")),
    )
    bench = spark.range(n_passages).select(
        F.col("id").alias("bench_id"), F.array_join(passage_toks, " ").alias("text")
    )

    words = F.transform(
        F.sequence(F.lit(0), F.lit(39)),
        lambda i: F.concat(F.lit("w"), F.pmod(F.xxhash64(F.col("id"), i), F.lit(5000)).cast("string")),
    )
    # plant passage (id % 50) — only the first 50 passages are planted;
    # the rest exist to inflate the gram set past 1M
    planted = F.col("id") % 100 == 0
    pid = (F.col("id") % 50).cast("string")
    passage = F.array_join(
        F.transform(F.sequence(F.lit(0), F.lit(32)),
                    lambda t: F.concat(F.lit("b"), pid, F.lit("t"), t.cast("string"))),
        " ",
    )
    text = F.when(
        planted,
        F.concat_ws(" ", F.array_join(F.slice(words, 1, 20), " "), passage,
                    F.array_join(F.slice(words, 21, 20), " ")),
    ).otherwise(F.array_join(words, " "))
    docs = spark.range(n_docs).select(F.col("id").alias("doc_id"), text.alias("text"))
    path = ("/dev/shm" if os.path.isdir("/dev/shm") else "/tmp") + "/stress_contam_mask_docs"
    docs.write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)

    n_grams = n_passages * 21
    t0 = time.time()
    out = mask_contaminated_spans(docs, bench, k=13)
    masked = {r["doc_id"]: r["n_masked_tokens"]
              for r in out.filter(F.col("n_masked_tokens") > 0).collect()}
    mask_sec = time.time() - t0

    expected = set(range(0, n_docs, 100))
    wrong_counts = {d: c for d, c in masked.items() if c != 33}
    print(json.dumps({
        "job": "contamination_mask_stress",
        "n_docs": n_docs,
        "n_bench_passages": n_passages,
        "n_bench_grams": n_grams,
        "planted": len(expected),
        "masked_docs": len(masked),
        "false_positives": len(set(masked) - expected),
        "missed": len(expected - set(masked)),
        "wrong_mask_counts": len(wrong_counts),
        "mask_sec": round(mask_sec, 1),
        "docs_per_sec": round(n_docs / mask_sec),
    }))
    assert set(masked) == expected, "mask flag set mismatch"
    assert not wrong_counts, f"wrong counts: {dict(list(wrong_counts.items())[:3])}"


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "mask":
        mask_main(
            int(sys.argv[2]) if len(sys.argv) > 2 else 100_000,
            int(sys.argv[3]) if len(sys.argv) > 3 else 50_000,
        )
    else:
        main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000)
