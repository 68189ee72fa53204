"""Benchmark decontamination: flag training documents sharing k-gram
overlap with an evaluation/benchmark set (the standard LLM-corpus
hygiene pass — e.g. GPT-3's 13-gram and Dolma/C4-style n-gram
decontamination).

Spark-first shape: the benchmark side is tiny relative to the corpus,
so its k-gram hash set BROADCASTs; the corpus side explodes to one row
per k-gram, inner-joins the broadcast set map-side (no shuffle of the
corpus), and aggregates per (doc, benchmark item). Everything is builtin
Column expressions — md5-based k-gram keys so a DuckDB oracle reproduces
every hash byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import tokens


def _kgram_hashes(text_col, k: int):
    """array<string> of md5(k-gram) keys over whitespace tokens,
    lowercased — one entry per position (duplicates preserved; the
    caller decides distinct vs positional counting)."""
    toks = tokens(F.lower(text_col))
    n = F.size(toks)
    return F.when(n < k, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - F.lit(k - 1)),
            lambda i: F.md5(F.array_join(F.slice(toks, i, k), " ")),
        )
    )


def contamination_report(
    docs: DataFrame,
    benchmark: DataFrame,
    k: int = 13,
    doc_id_col: str = "doc_id",
    doc_text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """Per (document, benchmark item): how many of the benchmark item's
    DISTINCT k-grams appear in the document, plus the contamination
    fraction (matched / benchmark k-grams). Downstream filters drop or
    audit rows where ``fraction`` exceeds a policy threshold.

    Scale: the benchmark k-gram set is broadcast (distinct k-grams of an
    eval suite are at most a few million rows); the corpus explodes one
    row per k-gram and joins map-side, so corpus data never shuffles —
    the only Exchange is the per-(doc, bench) count aggregate, keyed on
    match PAIRS (a tiny fraction of the corpus at any real
    contamination rate)."""
    bench_grams = (
        benchmark.select(
            F.col(bench_id_col).alias("bench_id"),
            F.explode(_kgram_hashes(F.col(bench_text_col), k)).alias("gram"),
        )
        .distinct()
    )
    bench_sizes = bench_grams.groupBy("bench_id").agg(F.count("*").alias("bench_grams"))

    doc_grams = docs.select(
        F.col(doc_id_col).alias("doc_id"),
        F.explode(F.array_distinct(_kgram_hashes(F.col(doc_text_col), k))).alias("gram"),
    )
    matches = (
        doc_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("matched_grams"))
    )
    return (
        matches.join(F.broadcast(bench_sizes), "bench_id")
        .select(
            "doc_id",
            "bench_id",
            "matched_grams",
            "bench_grams",
            (F.col("matched_grams") / F.col("bench_grams")).alias("fraction"),
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    k: int = 13,
    min_fraction: float = 0.8,
    doc_id_col: str = "doc_id",
    doc_text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """Drop documents whose overlap with ANY benchmark item reaches
    ``min_fraction`` of that item's k-grams (anti-join against the
    report — corpus rows stream through once)."""
    flagged = (
        contamination_report(
            docs, benchmark, k, doc_id_col, doc_text_col, bench_id_col, bench_text_col
        )
        .filter(F.col("fraction") >= min_fraction)
        .select(F.col("doc_id").alias(doc_id_col))
        .distinct()
    )
    return docs.join(flagged, doc_id_col, "left_anti")


def mask_contaminated_spans(
    docs: DataFrame,
    benchmark: DataFrame,
    k: int = 13,
    mask_token: str = "<MASKED>",
    doc_id_col: str = "doc_id",
    doc_text_col: str = "text",
    bench_text_col: str = "text",
    batch_hint: int = 1024,
) -> DataFrame:
    """The third decontamination mode (report / drop / MASK): replace
    only the token spans that overlap benchmark k-grams, keeping the
    rest of the document. Position-level span math is not expressible
    as portable Column SQL, so this is an Arrow-batched ``mapInPandas``
    stage — the benchmark k-gram set is collected to the driver (small
    by definition) and shipped via ``SparkContext.broadcast``, so a
    multi-million-gram set serializes ONCE per executor (torrent
    broadcast) instead of riding every task closure; the corpus streams
    through one scan, zero shuffle.
    Output: doc_id, text (masked), n_masked_tokens."""
    import hashlib as _hashlib

    import pandas as pd

    bench_rows = (
        benchmark.select(F.explode(F.array_distinct(_kgram_hashes(F.col(bench_text_col), k))).alias("g"))
        .distinct()
        .collect()
    )
    bench_bc = docs.sparkSession.sparkContext.broadcast(
        frozenset(r["g"] for r in bench_rows)
    )
    schema = f"{doc_id_col} long, text string, n_masked_tokens int"

    def run(batches):
        bench_grams = bench_bc.value
        for pdf in batches:
            out_ids, out_texts, out_counts = [], [], []
            for doc_id, text in zip(pdf[doc_id_col], pdf[doc_text_col]):
                # same normalization as _kgram_hashes/tokens (lowercase
                # only for hashing; emitted text keeps original case),
                # except str.split() drops the empty edge tokens a
                # leading/trailing-space doc gives the Column path — the
                # Python side is strictly cleaner there
                raw_toks = " ".join(str(text).split()).split(" ") if str(text).strip() else []
                low = [t.lower() for t in raw_toks]
                masked = [False] * len(raw_toks)
                for i in range(len(raw_toks) - k + 1):
                    gram = " ".join(low[i : i + k])
                    if _hashlib.md5(gram.encode()).hexdigest() in bench_grams:
                        for j in range(i, i + k):
                            masked[j] = True
                n = sum(masked)
                if n:
                    # collapse each masked RUN to one mask token
                    out_tok, prev = [], False
                    for t, m in zip(raw_toks, masked):
                        if m and not prev:
                            out_tok.append(mask_token)
                        elif not m:
                            out_tok.append(t)
                        prev = m
                    out_texts.append(" ".join(out_tok))
                else:
                    out_texts.append(str(text))
                out_ids.append(doc_id)
                out_counts.append(n)
            yield pd.DataFrame(
                {doc_id_col: out_ids, "text": out_texts, "n_masked_tokens": out_counts}
            )

    return docs.select(doc_id_col, doc_text_col).mapInPandas(run, schema)
