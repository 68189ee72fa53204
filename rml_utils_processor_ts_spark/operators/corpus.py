"""Corpus-shaping operators for training-data pipelines: deterministic
sampling, fixed-window document chunking, and event sessionization.

All pure Column expressions with DuckDB-portable formulations (the
sampler hashes with md5 — stable across engines — instead of
engine-specific hash functions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_sample(df: DataFrame, key_col: str, rate: float, seed: str = "s1") -> DataFrame:
    """Deterministic content-hash sampling: a row is kept iff the first
    4 hex chars of md5(seed|key) fall below rate * 16^4. Stable across
    runs, engines, and partitionings (never ``rand()`` — resumability
    requires the same sample every time); the same key always lands on
    the same side, so per-entity sampling stays consistent across
    tables sharing the key."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    if rate >= 1.0:
        return df
    # same-length lowercase hex compares lexicographically == numerically
    # (mixed lengths would not: 'a000' > '10000' as strings)
    threshold = format(min(int(rate * 0x10000), 0xFFFF), "04x")
    bucket = F.substring(F.md5(F.concat(F.lit(seed + "|"), F.col(key_col).cast("string"))), 1, 4)
    return df.filter(bucket < F.lit(threshold))


def chunk_count(n_tokens: Column, window: int, stride: int) -> Column:
    return F.when(n_tokens <= window, F.lit(1)).otherwise(
        (F.lit(1) + F.ceil((n_tokens - window) / F.lit(float(stride)))).cast("int")
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 100,
    stride: int = 80,
) -> DataFrame:
    """Fixed-window token chunking with overlap (training-sample prep):
    whitespace tokens, chunks of ``window`` tokens every ``stride``
    (stride < window = overlapping context). One explode per document —
    no shuffle at all; chunk ids are (doc_id, chunk_idx), deterministic.
    Output: doc_id, chunk_idx, chunk_text, n_chunk_tokens."""
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    toks = F.split(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "), " ")
    n = F.size(toks)
    chunks = F.transform(
        F.sequence(F.lit(0), chunk_count(n, window, stride) - 1),
        lambda i: F.slice(toks, i * stride + 1, window),
    )
    out = df.select(
        F.col(id_col).alias("doc_id"), F.posexplode(chunks).alias("chunk_idx", "chunk_toks")
    )
    return out.select(
        "doc_id",
        "chunk_idx",
        F.array_join("chunk_toks", " ").alias("chunk_text"),
        F.size("chunk_toks").alias("n_chunk_tokens"),
    )


def _epoch(c: Column) -> Column:
    """Epoch seconds (fractional) — via an explicit TIMESTAMP cast first:
    parquet timestamps load as TIMESTAMP_NTZ, which ANSI mode refuses to
    cast straight to double. Offsets cancel in every use here (gaps and
    spans), so the session-timezone interpretation is harmless."""
    return c.cast("timestamp").cast("double")


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    order_col: str | None = None,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user's
    inter-event gap reaches ``gap_minutes`` (>= — the same boundary rule
    as Spark's builtin session_window, which merges an event only while
    its gap is strictly inside the duration). The classic two-window
    formulation — lag to flag session starts, running sum to number
    them — shuffles ONCE on the user key (both windows share the
    partitioning; Catalyst plans a single Exchange). Session id is
    (user, session_idx), deterministic.

    ``order_col`` is a tie-break column for events sharing a timestamp
    (required for a deterministic session numbering). Default: use an
    ``event_id`` column when the frame has one, else order by ``ts_col``
    alone (callers with same-timestamp duplicates should pass their own
    unique column explicitly)."""
    if order_col is None and "event_id" in events.columns:
        order_col = "event_id"
    if order_col is not None and order_col not in events.columns:
        raise ValueError(f"order_col {order_col!r} not in frame columns {events.columns}")
    order = [ts_col] + ([order_col] if order_col else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    is_new = (
        prev_ts.isNull() | (_epoch(F.col(ts_col)) - _epoch(prev_ts) >= gap_minutes * 60)
    ).cast("int")
    return events.withColumn("__new", is_new).withColumn(
        "session_idx", F.sum("__new").over(w)
    ).drop("__new")


def _session_aggs(ts: Column, value_col: str) -> list[Column]:
    """Engine-stable session aggregates. Floating-point sums are
    order-dependent in the last ulp, so a cross-engine value hash can
    flip on partitioning alone; instead (a) the value total sums exact
    fixed-point longs (``round(value*10000)``) and divides ONCE at the
    end — one bigint-sum plus one division is bit-identical in any
    engine/order — and (b) the span subtracts integer epoch-microseconds
    (``unix_micros``) before a single division. DuckDB twin:
    ``sum(CAST(round(value*10000,0) AS BIGINT)) / 10000.0`` and
    ``(max(epoch_us(ts)) - min(epoch_us(ts))) / 1000000.0``."""
    us = F.unix_micros(ts)
    fixed = F.round(F.col(value_col) * F.lit(10000)).cast("long")
    return [
        F.count("*").alias("n_events"),
        ((F.max(us) - F.min(us)) / F.lit(1000000.0)).alias("span_sec"),
        (F.sum(fixed) / F.lit(10000.0)).alias("total_value"),
    ]


def session_stats_builtin(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    value_col: str = "value",
) -> DataFrame:
    """The same rollup via Spark's builtin ``session_window`` — the
    streaming-capable form (with ``withWatermark`` it runs unchanged on
    a stream; parquet NTZ timestamps are cast to TIMESTAMP first, which
    watermarks require). Kept alongside the window formulation so the
    two validate each other (tests assert identical session counts and
    per-session aggregates). Requires a numeric ``value_col`` column."""
    if value_col not in events.columns:
        raise ValueError(f"value_col {value_col!r} not in frame columns {events.columns}")
    # a ts_col that is ALREADY TIMESTAMP is used as-is: re-aliasing it
    # to a derived column would strip any withWatermark the caller set,
    # and Spark then rejects append-mode streaming aggregation. Only
    # NTZ/string inputs (batch parquet) go through the cast alias.
    if dict(events.dtypes).get(ts_col) == "timestamp":
        src, tcol = events, ts_col
    else:
        src = events.withColumn("__ts", F.col(ts_col).cast("timestamp"))
        tcol = "__ts"
    return (
        src.groupBy(user_col, F.session_window(tcol, f"{gap_minutes} minutes"))
        .agg(*_session_aggs(F.col(tcol), value_col))
        .select(
            user_col,
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "span_sec",
            "total_value",
        )
    )


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    value_col: str = "value",
    order_col: str | None = None,
) -> DataFrame:
    """Per-session rollup: event count, span seconds, total value.
    Requires a numeric ``value_col``; see ``sessionize`` for
    ``order_col`` tie-break semantics and ``_session_aggs`` for why the
    aggregates are fixed-point (cross-engine bit stability)."""
    if value_col not in events.columns:
        raise ValueError(f"value_col {value_col!r} not in frame columns {events.columns}")
    s = sessionize(events, user_col, ts_col, gap_minutes, order_col=order_col)
    return s.groupBy(user_col, "session_idx").agg(
        *_session_aggs(F.col(ts_col).cast("timestamp"), value_col)
    )


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: str = "s1",
) -> DataFrame:
    """Deterministic per-stratum sampling (corpus mixing: keep 100% of
    one domain/language, 10% of another). Same md5 content-hash rule as
    ``hash_sample`` — reproducible across runs/engines and monotone in
    rate (raising a stratum's rate only ADDS rows) — with the threshold
    chosen per row from the stratum column. Unlike ``DataFrame.sampleBy``
    this is seed-stable across partitionings and resumable."""
    for stratum, rate in rates.items():
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate for stratum {stratum!r} must be in [0, 1], got {rate}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")

    def thr(rate: float) -> str:
        return format(min(int(rate * 0x10000), 0xFFFF), "04x")

    threshold = F.coalesce(
        *[
            F.when(F.col(strata_col) == s, F.lit(thr(r)))
            for s, r in sorted(rates.items())
        ],
        F.lit(thr(default_rate)),
    )
    bucket = F.substring(
        F.md5(F.concat(F.lit(seed + "|"), F.col(key_col).cast("string"))), 1, 4
    )
    # rate 1.0 strata keep everything (hex compare tops out at 'ffff')
    full = F.coalesce(
        *[F.when(F.col(strata_col) == s, F.lit(r >= 1.0)) for s, r in sorted(rates.items())],
        F.lit(default_rate >= 1.0),
    )
    return df.filter(full | (bucket < threshold))
