"""Entity linking: broadcast alias-dictionary candidate generation +
MinHash-LSH similarity scoring for fuzzy mentions (north_rule stage;
SURVEY.md §7 Stage 3).

The alias dictionary is small relative to the mention stream ->
``F.broadcast`` pins a broadcast hash join (no shuffle of the 100 TB
side). Fuzzy linking reuses the dedup MinHash machinery on character
shingles of the mention string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_mention(col):
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def link_exact(
    mentions: DataFrame,
    alias_dict: DataFrame,
    mention_col: str = "mention",
    alias_col: str = "alias",
    canonical_col: str = "canonical_iri",
) -> DataFrame:
    """Exact alias match: normalized mention == normalized alias.
    Dictionary side broadcast; mention side untouched (no shuffle)."""
    d = alias_dict.select(
        normalize_mention(F.col(alias_col)).alias("__alias"),
        F.col(canonical_col).alias("canonical_iri"),
    ).dropDuplicates(["__alias"])
    return (
        mentions.withColumn("__m", normalize_mention(F.col(mention_col)))
        .join(F.broadcast(d), F.col("__m") == F.col("__alias"), "left")
        .drop("__alias", "__m")
    )


def char_shingles_expr(colname: str, k: int = 3):
    """Character k-grams via SQL expr (substring needs dynamic start)."""
    return F.expr(
        f"transform(sequence(1, greatest(length({colname}) - {k - 1}, 1)), "
        f"i -> substring({colname}, i, {k}))"
    )


def link_fuzzy(
    mentions: DataFrame,
    alias_dict: DataFrame,
    mention_col: str = "mention",
    alias_col: str = "alias",
    canonical_col: str = "canonical_iri",
    k: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """Fuzzy alias match: character-shingle MinHash LSH between mention
    strings and dictionary aliases, exact Jaccard verify, best match per
    mention (highest jaccard, ties -> lexicographically smallest IRI)."""
    from pyspark.sql import Window

    def seed_hash(j: int):
        # NB: a two-parameter lambda would make F.transform pass the array
        # INDEX as the second argument — bind the seed via closure instead.
        prefix = f"{j}|"
        return lambda s: F.md5(F.concat(F.lit(prefix), s))

    def sig(df: DataFrame, col: str, id_col: str) -> DataFrame:
        g = df.select(
            F.col(id_col).alias("id"),
            F.array_distinct(char_shingles_expr("__norm", k)).alias("grams"),
        )
        aggs = [
            F.array_min(F.transform(F.col("grams"), seed_hash(j))).alias(f"h{j}")
            for j in range(num_hashes)
        ]
        return g.select("id", "grams", *aggs)

    m = mentions.withColumn("__norm", normalize_mention(F.col(mention_col)))
    m_sig = sig(m.select(F.col(mention_col).alias("__id_m"), "__norm"), "__norm", "__id_m").withColumnRenamed("id", "mention")
    d = alias_dict.withColumn("__norm", normalize_mention(F.col(alias_col)))
    d_sig = sig(
        d.select(F.col(alias_col).alias("__id_a"), "__norm"), "__norm", "__id_a"
    ).withColumnRenamed("id", "alias")

    rows_per_band = num_hashes // bands
    def banded(s: DataFrame, id_name: str, extra: list[str] | None = None) -> DataFrame:
        extra = extra or []
        structs = []
        for b in range(bands):
            cols = [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
            structs.append(F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("|", *cols)).alias("bh")))
        return s.select(id_name, "grams", *extra, F.explode(F.array(*structs)).alias("bk")).select(
            id_name, "grams", *extra, "bk.band", "bk.bh"
        )

    mb = banded(m_sig, "mention")
    db = banded(
        d_sig.join(d.select(F.col(alias_col).alias("alias"), F.col(canonical_col)), "alias"),
        "alias",
        extra=[canonical_col],
    )
    cand = mb.join(db, ["band", "bh"]).select(
        "mention", "alias", canonical_col, mb["grams"].alias("__mg"), db["grams"].alias("__ag")
    ).distinct()
    inter = F.size(F.array_intersect(F.col("__mg"), F.col("__ag")))
    union = F.size("__mg") + F.size("__ag") - inter
    scored = cand.select(
        "mention",
        "alias",
        canonical_col,
        F.round(inter.cast("double") / union, 6).alias("jaccard"),
    ).filter(F.col("jaccard") >= min_jaccard)
    w = Window.partitionBy("mention").orderBy(F.desc("jaccard"), F.asc(canonical_col))
    return scored.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
