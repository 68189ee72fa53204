"""Deterministic N-Quads / N-Triples serialization (SURVEY.md §2.B8).

The reference emits N-Quads text per target via the Java engine and
concatenates per-target temp files (/root/reference/src/rml/rml.ts:446-463).
Spark-native: each quad row formats to one line with builtin expressions
(whole-stage codegen, no Python), and the writer range-partitions by
subject + sorts within partitions so the same input always produces the
same bytes in the same file order — determinism is a correctness
requirement for the byte-identical export invariant, not a nicety.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _escape_literal(col: Column) -> Column:
    # N-Triples literal escaping: backslash, quote, newline, CR, tab.
    out = F.regexp_replace(col, r"\\", r"\\\\")
    out = F.regexp_replace(out, '"', '\\\\"')
    out = F.regexp_replace(out, "\n", "\\\\n")
    out = F.regexp_replace(out, "\r", "\\\\r")
    out = F.regexp_replace(out, "\t", "\\\\t")
    return out


def _term(col: Column, ttype: Column, dtype: Column, lang: Column) -> Column:
    literal = F.concat(F.lit('"'), _escape_literal(col), F.lit('"'))
    literal = (
        F.when(lang.isNotNull(), F.concat(literal, F.lit("@"), lang))
        .when(
            dtype.isNotNull() & (dtype != F.lit("http://www.w3.org/2001/XMLSchema#string")),
            F.concat(literal, F.lit("^^<"), dtype, F.lit(">")),
        )
        .otherwise(literal)
    )
    return (
        F.when(ttype == "IRI", F.concat(F.lit("<"), col, F.lit(">")))
        .when(ttype == "BlankNode", F.concat(F.lit("_:"), col))
        .otherwise(literal)
    )


def nquad_line_column(df: DataFrame) -> Column:
    """Build the serialized N-Quads line for a triples-DataFrame row."""
    s = _term(F.col("s"), F.col("s_termtype"), F.lit(None), F.lit(None))
    p = F.concat(F.lit("<"), F.col("p"), F.lit(">"))
    o = _term(F.col("o"), F.col("o_termtype"), F.col("o_datatype"), F.col("o_lang"))
    base = F.concat_ws(" ", s, p, o)
    return F.when(
        F.col("g").isNotNull(),
        F.concat(base, F.lit(" <"), F.col("g"), F.lit("> .")),
    ).otherwise(F.concat(base, F.lit(" .")))


def triples_to_nquad_lines(df: DataFrame) -> DataFrame:
    return df.select(nquad_line_column(df).alias("line"))


def write_nquads(df: DataFrame, path: str, partitions: int = 8) -> None:
    """Byte-stable export: rows hash-partition on the quad content
    (pmod(xxhash64), a pure function of the data — unlike
    repartitionByRange, whose sampled boundaries and AQE coalescing vary
    between runs) and sort within partitions. Identical input =>
    identical bytes in identical files (SURVEY.md §4: determinism is a
    correctness requirement for the export invariant)."""
    # partition + sort on the fully serialized line: two quads equal on
    # (s,p,o,g) but differing in o_termtype/o_datatype/o_lang serialize
    # differently, so the line is the only key that makes the export
    # byte-stable for every distinct row the dedupe keeps.
    lines = df.select(nquad_line_column(df).alias("value"))
    lines = lines.repartition(partitions, F.pmod(F.xxhash64("value"), F.lit(partitions))).sortWithinPartitions("value")
    lines.write.mode("overwrite").text(path)
