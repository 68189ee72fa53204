"""KG quality-assurance operators over the triple frame the executor
emits (s, s_termtype, p, o, o_termtype, o_datatype, o_lang, g, ...).

A construction pipeline at 10^12-document scale needs cheap, shuffle-
minimal audits of what it just built — these are the standard three:

* :func:`predicate_profile` — per-predicate cardinality statistics (the
  KG analog of column statistics): triple count, distinct subjects /
  objects, object-kind breakdown. One map-side-combined groupBy.
* :func:`iri_audit` — malformed-IRI detection on every IRI-typed
  position: pure Column regexes, zero shuffle before the tiny rollup.
* :func:`orphan_objects` — object IRIs that never appear as subjects
  (dangling references after canonicalization): both sides reduce to
  DISTINCT IRI sets before the anti-join, so the join keys are entity-
  not triple-cardinality.

The reference delegates all output handling to its jar and has no audit
surface (/root/reference/src/rml/rml.ts:432-444); these are north-star
additions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# RFC 3986-ish absolute IRI: scheme ':' then no whitespace/angle/quote
# control characters. Java-regex portable (RE2-safe: no backrefs).
_IRI_OK = r"^[A-Za-z][A-Za-z0-9+.\-]*:[^\s<>\"{}|\\^`]*$"


def predicate_profile(triples: DataFrame) -> DataFrame:
    """Per-predicate cardinality profile: n_triples, distinct subjects,
    distinct objects, and the IRI/literal split of objects. Exact
    distincts (one aggregate, map-side partial); at extreme scale swap
    the two count_distincts for approx_count_distinct — same plan
    shape, sketch-based partials."""
    return (
        triples.groupBy("p")
        .agg(
            F.count("*").alias("n_triples"),
            F.countDistinct("s").alias("n_subjects"),
            F.countDistinct("o").alias("n_objects"),
            F.sum(F.when(F.col("o_termtype") == "IRI", 1).otherwise(0)).alias("n_iri_objects"),
            F.sum(F.when(F.col("o_termtype") == "Literal", 1).otherwise(0)).alias("n_literal_objects"),
        )
    )


def iri_audit(triples: DataFrame) -> DataFrame:
    """Per-graph malformed-IRI counts for every IRI-typed position
    (subject, predicate, IRI objects). A healthy pipeline reports all
    zeros; non-zero rows point at the offending graph partition.
    Pure Column expressions — the only Exchange is the per-graph
    rollup."""
    s_bad = (~F.col("s").rlike(_IRI_OK)).cast("int")
    p_bad = (~F.col("p").rlike(_IRI_OK)).cast("int")
    o_bad = F.when(
        F.col("o_termtype") == "IRI", (~F.col("o").rlike(_IRI_OK)).cast("int")
    ).otherwise(F.lit(0))
    return (
        triples.groupBy(F.coalesce(F.col("g"), F.lit("")).alias("g"))
        .agg(
            F.count("*").alias("n_triples"),
            F.sum(s_bad).alias("bad_subject_iris"),
            F.sum(p_bad).alias("bad_predicate_iris"),
            F.sum(o_bad).alias("bad_object_iris"),
        )
    )


def orphan_objects(triples: DataFrame, predicate: str | None = None) -> DataFrame:
    """IRI objects that never occur as a subject — dangling references
    (a referencing object map whose parent never materialized, or a
    canonicalization miss). Optionally restricted to one predicate.
    Both sides collapse to distinct IRIs FIRST, so the anti-join keys
    scale with entity count, not triple count."""
    objs = triples.filter(F.col("o_termtype") == "IRI")
    if predicate is not None:
        objs = objs.filter(F.col("p") == predicate)
    objs = objs.select(F.col("o").alias("iri")).distinct()
    subjects = triples.select(F.col("s").alias("iri")).distinct()
    return objs.join(subjects, "iri", "left_anti")
