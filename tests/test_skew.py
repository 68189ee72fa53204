"""Skew-handling tests: salted two-phase aggregation equals plain
aggregation; hot-key split join equals plain join."""

from pyspark.sql import functions as F

from rml_utils_processor_ts_spark.operators.skew import row_spread_salt, split_hot_keys, two_phase_agg


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


def test_two_phase_agg_salt_spreads_hot_key(spark):
    # the regression the r02 verdict flagged: a salt derived from the
    # group key puts EVERY row of a hot key in one partial group (zero
    # skew protection). The fix must spread a single hot key's rows over
    # >1 distinct salt value — even when those rows are byte-identical.
    hot = spark.createDataFrame([("hot", 1)] * 400, "k string, v long").repartition(4)
    salted = hot.withColumn("__salt", row_spread_salt(8))
    per_salt = salted.groupBy("k", "__salt").count().collect()
    assert len(per_salt) > 1, "hot key collapsed to a single salt value"
    # partial-stage bound: no single (key, salt) group holds all rows
    assert max(r["count"] for r in per_salt) < 400
    # and the two-phase result is still exact
    agg = two_phase_agg(hot, ["k"], {"n": "count", "total": "sum:v"}, n_salt=8).collect()
    assert agg[0]["n"] == 400 and agg[0]["total"] == 400


def test_split_hot_keys_salt_spreads_identical_rows(spark):
    # byte-identical hot rows (the common web-corpus hot-key shape) must
    # not all hash to one salt — ADVICE r02: content-only salt silently
    # degenerates to an unsalted join for exactly these rows.
    big = spark.createDataFrame([("hot", "samepayload")] * 300, "k string, p string").repartition(3)
    small = spark.createDataFrame([("hot", "H")], "k string, label string")
    joined = split_hot_keys(big, small, "k", hot_threshold=10, n_salt=4, keep_salt=True)
    salts = {r["__salt"] for r in joined.select("__salt").distinct().collect()}
    assert len(salts) > 1, "identical hot rows collapsed to a single salt value"
    assert joined.count() == 300
