"""Explicit skew handling: salting + two-phase aggregation + hot-key
splitting for joins (north_rule: "skew from hot domains and head
entities is handled with key salting and adaptive repartitioning").

AQE's skew-join splitting covers sort-merge joins at runtime; these
helpers cover the cases AQE can't see: hash aggregations with a hot
group, and broadcast-side replication for hot probe keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salt_column(key, n_salt: int):
    """Deterministic salt derived from the full row key via a secondary
    hash — never a random number (reproducibility requirement)."""
    return F.pmod(F.xxhash64(key, F.lit("salt")), F.lit(n_salt)).cast("int")


def two_phase_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, str],
    n_salt: int = 16,
) -> DataFrame:
    """Salted two-phase aggregation: groupBy (key, salt) -> partial, then
    groupBy key -> final. Bounds any single reducer's input to ~1/n_salt
    of the hottest key. ``aggs``: output name -> 'count' | 'sum:col' |
    'min:col' | 'max:col' | 'avg:col' (algebraic aggregates only — avg
    decomposes into a (sum, count) pair that re-combines)."""
    salted = df.withColumn("__salt", salt_column(F.concat_ws("\x00", *[F.col(c) for c in key_cols]), n_salt))
    partial_exprs = []
    final_exprs = []
    for name, spec in aggs.items():
        if spec == "count":
            partial_exprs.append(F.count("*").alias(f"__p_{name}"))
            final_exprs.append(F.sum(f"__p_{name}").alias(name))
        else:
            op, _, col = spec.partition(":")
            if op == "avg":
                partial_exprs.append(F.sum(col).alias(f"__ps_{name}"))
                partial_exprs.append(F.count(col).alias(f"__pc_{name}"))
                final_exprs.append((F.sum(f"__ps_{name}") / F.sum(f"__pc_{name}")).alias(name))
                continue
            fn = {"sum": F.sum, "min": F.min, "max": F.max}[op]
            partial_exprs.append(fn(col).alias(f"__p_{name}"))
            final_exprs.append(fn(f"__p_{name}").alias(name))
    partial = salted.groupBy(*key_cols, "__salt").agg(*partial_exprs)
    return partial.groupBy(*key_cols).agg(*final_exprs)


def split_hot_keys(
    big: DataFrame,
    small: DataFrame,
    key: str,
    hot_threshold: int = 100_000,
    n_salt: int = 8,
    keep_salt: bool = False,
) -> DataFrame:
    """Skewed equi-join: detect hot keys on the big side (one cheap
    count), replicate the small side n_salt times for hot keys, salt the
    big side — each hot key spreads over n_salt reducers. Cold keys join
    normally. Returns big ⋈ small with all columns of both."""
    counts = big.groupBy(key).agg(F.count("*").alias("__n"))
    hot = counts.filter(F.col("__n") >= hot_threshold).select(key)

    big_flag = big.join(F.broadcast(hot.withColumn("__hot", F.lit(True))), key, "left")
    # salt from row CONTENT (all columns), never from
    # monotonically_increasing_id: partition placement must be identical
    # across runs/retries (determinism rule, SURVEY.md §7 hard part 4)
    big_hot = big_flag.filter(F.col("__hot").isNotNull()).drop("__hot").withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns], F.lit("salt")), F.lit(n_salt)).cast("int")
    )
    big_cold = big_flag.filter(F.col("__hot").isNull()).drop("__hot")

    salt_values = F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))).alias("__salt")
    small_hot = small.join(F.broadcast(hot), key, "left_semi").select("*", salt_values)
    small_cold = small.join(F.broadcast(hot), key, "left_anti")

    joined_hot = big_hot.join(small_hot, [key, "__salt"], "inner")
    joined_cold = big_cold.join(small_cold, key, "inner")
    if keep_salt:
        # exposes the (deterministic) partition assignment for tests/audit
        return joined_hot.unionByName(joined_cold.withColumn("__salt", F.lit(None).cast("int")))
    return joined_hot.drop("__salt").unionByName(joined_cold)
