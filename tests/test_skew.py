"""Skew-handling tests: salted two-phase aggregation equals plain
aggregation; hot-key split join equals plain join."""

from pyspark.sql import functions as F

from rml_utils_processor_ts_spark.operators.skew import split_hot_keys, two_phase_agg


def test_two_phase_agg_matches_plain(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    salted = two_phase_agg(
        events,
        ["event_type"],
        {"n": "count", "total": "sum:value", "mx": "max:value", "mean": "avg:value"},
    )
    plain = events.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("value").alias("total"),
        F.max("value").alias("mx"),
        F.avg("value").alias("mean"),
    )
    a = {(r["event_type"], r["n"], round(r["total"], 6), r["mx"], round(r["mean"], 6)) for r in salted.collect()}
    b = {(r["event_type"], r["n"], round(r["total"], 6), r["mx"], round(r["mean"], 6)) for r in plain.collect()}
    assert a == b


def test_split_hot_keys_join_matches_plain(spark):
    # one hot key (90% of rows) + long tail
    big = spark.createDataFrame(
        [(("hot" if i % 10 != 9 else f"cold{i}"), i) for i in range(1000)],
        "k string, v long",
    )
    small = spark.createDataFrame(
        [("hot", "H")] + [(f"cold{i}", f"C{i}") for i in range(9, 1000, 10)],
        "k string, label string",
    )
    skewed = split_hot_keys(big, small, "k", hot_threshold=100, n_salt=4)
    plain = big.join(small, "k")
    a = {(r["k"], r["v"], r["label"]) for r in skewed.collect()}
    b = {(r["k"], r["v"], r["label"]) for r in plain.collect()}
    assert a == b
    assert len(a) == 1000
