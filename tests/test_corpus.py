"""Corpus-shaping operators: deterministic sampling, chunking windows,
gap sessionization."""

from pyspark.sql import functions as F

from rml_utils_processor_ts_spark.operators.corpus import (
    chunk_documents,
    hash_sample,
    session_stats,
    sessionize,
)


def test_hash_sample_deterministic_and_sized(spark):
    df = spark.range(10_000).withColumnRenamed("id", "k")
    s1 = {r["k"] for r in hash_sample(df, "k", 0.2).collect()}
    s2 = {r["k"] for r in hash_sample(df, "k", 0.2).collect()}
    assert s1 == s2  # same sample every run
    assert 0.17 < len(s1) / 10_000 < 0.23  # ~rate
    # monotone: a higher rate strictly contains a lower one (same seed)
    s_half = {r["k"] for r in hash_sample(df, "k", 0.5).collect()}
    assert s1 <= s_half
    # rate 1.0 keeps everything (hex-compare edge case)
    assert hash_sample(df, "k", 1.0).count() == 10_000


def test_chunk_documents_windows(spark):
    text = " ".join(f"w{i}" for i in range(25))
    df = spark.createDataFrame([(1, text), (2, "short doc")], "doc_id long, text string")
    rows = {(r["doc_id"], r["chunk_idx"]): r for r in chunk_documents(df, window=10, stride=5).collect()}
    # 25 tokens, window 10 stride 5 -> 1 + ceil(15/5) = 4 chunks
    assert sorted(i for d, i in rows if d == 1) == [0, 1, 2, 3]
    assert rows[(1, 0)]["chunk_text"].startswith("w0 w1") and rows[(1, 0)]["n_chunk_tokens"] == 10
    assert rows[(1, 1)]["chunk_text"].startswith("w5")  # overlap of 5
    assert rows[(1, 3)]["n_chunk_tokens"] == 10  # 15..24
    assert rows[(2, 0)]["chunk_text"] == "short doc" and rows[(2, 0)]["n_chunk_tokens"] == 2


def test_sessionize_gap_semantics(spark):
    rows = [
        (1, "2024-01-01 10:00:00", 7, "a", 1.0, "{}"),
        (2, "2024-01-01 10:10:00", 7, "a", 2.0, "{}"),   # same session (10 min)
        (3, "2024-01-01 11:00:00", 7, "a", 4.0, "{}"),   # new session (50 min gap)
        (4, "2024-01-01 10:05:00", 9, "a", 8.0, "{}"),   # other user
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    s = {(r["event_id"]): r["session_idx"] for r in sessionize(ev).collect()}
    assert s[1] == s[2] == 1 and s[3] == 2 and s[4] == 1
    stats = {(r["user_id"], r["session_idx"]): r for r in session_stats(ev).collect()}
    assert stats[(7, 1)]["n_events"] == 2 and stats[(7, 1)]["span_sec"] == 600.0
    assert stats[(7, 2)]["total_value"] == 4.0


def test_corpus_plan_shapes(spark):
    """Shuffle discipline, asserted on the physical plan: chunking is
    explode-only (zero Exchanges); sessionization's two windows share
    ONE user-key Exchange; hash sampling pushes no shuffle at all."""
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    chunk_plan = chunk_documents(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in chunk_plan

    sample_plan = hash_sample(docs, "doc_id", 0.5)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in sample_plan

    ev = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 7, "a", 1.0, "{}")],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    sess_plan = sessionize(ev)._jdf.queryExecution().executedPlan().toString()
    assert sess_plan.count("Exchange hashpartitioning") == 1, sess_plan


def test_sessionize_matches_builtin_session_window(spark):
    """Two independent formulations of the same semantics — the lag +
    running-sum windows vs Spark's builtin session_window — must agree
    on every session's (n_events, span, total_value) over real data."""
    from rml_utils_processor_ts_spark.operators.corpus import session_stats_builtin

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ours = sorted(
        (r["user_id"], r["n_events"], r["span_sec"], r["total_value"])
        for r in session_stats(events, gap_minutes=30).collect()
    )
    builtin = sorted(
        (r["user_id"], r["n_events"], r["span_sec"], r["total_value"])
        for r in session_stats_builtin(events, gap_minutes=30).collect()
    )
    assert ours == builtin
    assert len(ours) > 100  # real session structure, not one blob


def test_stratified_hash_sample(spark):
    """Per-stratum deterministic sampling: rate-1.0 strata keep all,
    rate-0 strata drop all, fractional strata track their rate, and the
    sample is stable across calls + monotone in rate."""
    from rml_utils_processor_ts_spark.operators.corpus import stratified_hash_sample

    df = spark.range(12_000).select(
        F.col("id").alias("k"), (F.pmod(F.col("id"), F.lit(3))).cast("string").alias("s")
    )
    rates = {"0": 1.0, "1": 0.5, "2": 0.0}
    out = stratified_hash_sample(df, "k", "s", rates)
    by_s = {r["s"]: r["n"] for r in out.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert by_s["0"] == 4000
    assert "2" not in by_s
    assert 1700 < by_s["1"] < 2300
    again = stratified_hash_sample(df, "k", "s", rates)
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in again.collect()}
    # monotone: raising stratum 1's rate only adds rows
    bigger = stratified_hash_sample(df, "k", "s", {"0": 1.0, "1": 0.8, "2": 0.0})
    s1 = {r["k"] for r in out.filter(F.col("s") == "1").collect()}
    s1_big = {r["k"] for r in bigger.filter(F.col("s") == "1").collect()}
    assert s1 <= s1_big


def test_redact_pii(spark):
    from rml_utils_processor_ts_spark.operators.web import redact_pii

    docs = spark.createDataFrame(
        [
            (1, "mail alice.smith+x@sub.example.org now"),
            (2, "server at 192.168.001.7 port open"),
            (3, "call +1 (555) 123-4567 today"),
            (4, "clean text with no pii at all"),
            (5, "two mails a@b.co and c@d.io plus 10.0.0.1"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    assert rows[1]["n_email"] == 1 and "<EMAIL>" in rows[1]["text"]
    assert "alice" not in rows[1]["text"]
    assert rows[2]["n_ipv4"] == 1 and "<IPV4>" in rows[2]["text"]
    assert rows[3]["n_phone"] == 1 and "<PHONE>" in rows[3]["text"]
    assert rows[4]["text"] == "clean text with no pii at all"
    assert rows[5]["n_email"] == 2 and rows[5]["n_ipv4"] == 1
