"""Text analytics for corpus quality pipelines: language-ID (marker
heuristic), quality scoring, token counting (whitespace + BPE-ish regex),
document fingerprinting (min-hash of k-gram windows).

All builtin Column expressions — whole-stage codegen, no UDFs — and
formulated so a SQL oracle (DuckDB) reproduces every value exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language marker lexicons for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is"],
    "de": ["der", "die", "und", "ist"],
    "fr": ["le", "la", "et", "est"],
    "es": ["el", "los", "y", "es"],
    "nl": ["de", "het", "en", "is"],
}

STOPWORDS = ["the", "a", "and", "of", "to", "is", "in", "it"]

BPE_TOKEN_REGEX = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def tokens(col: Column) -> Column:
    return F.split(F.regexp_replace(F.lower(col), r"\s+", " "), " ")


def whitespace_token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_token_count(col: Column) -> Column:
    """BPE-ish subword proxy: runs of letters, runs of digits, single
    punctuation — a stable upper bound on BPE token count."""
    return F.size(F.regexp_extract_all(F.regexp_replace(F.lower(col), r"\s+", " "), F.lit(BPE_TOKEN_REGEX), F.lit(0)))


def stopword_ratio(col: Column) -> Column:
    toks = tokens(col)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    return F.round(n_stop.cast("double") / F.size(toks), 6)


def mean_word_length(col: Column) -> Column:
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.round(total.cast("double") / F.size(toks), 6)


def quality_score(col: Column) -> Column:
    """Composite quality heuristic in [0,1]: length band + stopword
    presence + word-length sanity. Deterministic, oracle-reproducible."""
    n = whitespace_token_count(col)
    len_ok = F.when((n >= 10) & (n <= 100000), F.lit(0.4)).otherwise(F.lit(0.0))
    stop_ok = F.when(stopword_ratio(col) >= 0.01, F.lit(0.3)).otherwise(F.lit(0.0))
    mwl = mean_word_length(col)
    mwl_ok = F.when((mwl >= 2.0) & (mwl <= 12.0), F.lit(0.3)).otherwise(F.lit(0.0))
    return F.round(len_ok + stop_ok + mwl_ok, 6)


def lang_id(col: Column) -> Column:
    """Marker-vote language ID: score = count of marker words present;
    highest score wins, ties broken by language code order."""
    toks = tokens(col)
    scores = []
    for lang in sorted(LANG_MARKERS):
        marker_arr = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        scores.append(
            (lang, F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t))))
        )
    # argmax via chained comparisons (deterministic tie-break: first max)
    best_lang = F.lit(sorted(LANG_MARKERS)[0])
    best_score = scores[0][1]
    for lang, sc in scores[1:]:
        better = sc > best_score
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(better, sc).otherwise(best_score)
    return F.when(best_score > 0, best_lang).otherwise(F.lit("und"))


def doc_fingerprint(col: Column, k: int = 5) -> Column:
    """Rolling fingerprint: min over word k-gram windows of md5(gram) —
    a 1-hash MinHash; robust to local edits, oracle-reproducible."""
    toks = tokens(col)
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )
    grams = F.when(n >= k, grams).otherwise(F.array(F.concat_ws(" ", toks)))
    return F.array_min(F.transform(grams, lambda g: F.md5(g)))


def text_profile(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per document with every text metric.

    Staged in three selects so the token array is computed ONCE and
    referenced by name — inlining ``tokens(col)`` into every metric
    multiplies the Catalyst expression tree combinatorially (measured:
    >10x analysis+codegen time on the naive single-select form)."""
    c = F.col(text_col)
    toks = F.col("__toks")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])

    staged = df.select(
        F.col(id_col),
        c.alias("__text"),
        tokens(c).alias("__toks"),
    ).select(
        F.col(id_col),
        "__toks",
        F.size(toks).alias("n_tokens"),
        bpe_token_count(F.col("__text")).alias("n_bpe_tokens"),
        F.round(
            F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).cast("double")
            / F.size(toks),
            6,
        ).alias("stopword_ratio"),
        F.round(
            F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)).cast("double")
            / F.size(toks),
            6,
        ).alias("mean_word_len"),
    )

    def marker_counter(markers: list[str]):
        # closure, NOT a default arg: a two-parameter lambda makes
        # F.filter pass the array index as the second argument
        arr = F.array(*[F.lit(m) for m in markers])
        return lambda t: F.array_contains(arr, t)

    lang_scores = [
        F.size(F.filter(toks, marker_counter(LANG_MARKERS[lang]))).alias(f"__sc_{lang}")
        for lang in sorted(LANG_MARKERS)
    ]
    k = 5
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )
    grams = F.when(n >= k, grams).otherwise(F.array(F.concat_ws(" ", toks)))
    staged = staged.select(
        "*",
        *lang_scores,
        F.array_min(F.transform(grams, lambda g: F.md5(g))).alias("fingerprint"),
    )

    len_ok = F.when((F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 100000), F.lit(0.4)).otherwise(F.lit(0.0))
    stop_ok = F.when(F.col("stopword_ratio") >= 0.01, F.lit(0.3)).otherwise(F.lit(0.0))
    mwl_ok = F.when((F.col("mean_word_len") >= 2.0) & (F.col("mean_word_len") <= 12.0), F.lit(0.3)).otherwise(F.lit(0.0))

    langs = sorted(LANG_MARKERS)
    best_lang = F.lit(langs[0])
    best_score = F.col(f"__sc_{langs[0]}")
    for lang in langs[1:]:
        better = F.col(f"__sc_{lang}") > best_score
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(better, F.col(f"__sc_{lang}")).otherwise(best_score)

    return staged.select(
        F.col(id_col),
        "n_tokens",
        "n_bpe_tokens",
        "stopword_ratio",
        "mean_word_len",
        F.round(len_ok + stop_ok + mwl_ok, 6).alias("quality"),
        F.when(best_score > 0, best_lang).otherwise(F.lit("und")).alias("lang_pred"),
        "fingerprint",
    )


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_stopword_ratio: float = 0.001,
) -> DataFrame:
    """Gopher/C4-style rule filter: per-document metrics, one boolean
    per rule, and the final ``keep`` conjunction — so a pipeline can
    both filter and AUDIT which rule dropped each document (silent
    filtering is how corpora rot). Pure Column expressions over one
    staged token array; symbol ratio = share of characters outside
    [a-z0-9 ] after lowercasing."""
    c = F.col(text_col)
    toks = F.col("__toks")
    low = F.col("__low")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    staged = df.select(
        F.col(id_col), F.lower(c).alias("__low"), tokens(c).alias("__toks")
    ).select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.round(
            F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)).cast("double")
            / F.size(toks),
            6,
        ).alias("mean_word_len"),
        F.round(
            (F.length(low) - F.length(F.regexp_replace(low, "[^a-z0-9 ]", ""))).cast("double")
            / F.length(low),
            6,
        ).alias("symbol_ratio"),
        F.round(
            F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).cast("double")
            / F.size(toks),
            6,
        ).alias("stopword_ratio"),
    )
    flags = staged.withColumns(
        {
            "len_ok": (F.col("n_tokens") >= min_tokens) & (F.col("n_tokens") <= max_tokens),
            "word_len_ok": (F.col("mean_word_len") >= min_mean_word_len)
            & (F.col("mean_word_len") <= max_mean_word_len),
            "symbols_ok": F.col("symbol_ratio") <= max_symbol_ratio,
            "stopwords_ok": F.col("stopword_ratio") >= min_stopword_ratio,
        }
    )
    return flags.withColumn(
        "keep",
        F.col("len_ok") & F.col("word_len_ok") & F.col("symbols_ok") & F.col("stopwords_ok"),
    )


def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_delimiter: str = "\n",
) -> DataFrame:
    """Gopher-style repetition quality signals per document:

    * ``dup_line_fraction`` — 1 - distinct(lines)/lines (normalized,
      case-folded lines split on ``line_delimiter``): boilerplate and
      templated pages repeat lines.
    * ``top_bigram_fraction`` — occurrences of the most frequent token
      bigram over all bigram slots: degenerate generations and spam
      repeat short phrases.

    The line statistic is pure per-row Column math (zero shuffle); the
    bigram mode needs a (doc, bigram) count -> per-doc max, one
    map-side-combined Exchange keyed by doc+bigram and a second tiny one
    per doc — both scale linearly and skew-free (the doc id is in every
    key). Output: doc_id, n_lines, dup_line_fraction, n_bigrams,
    top_bigram_fraction.
    """
    import re as _re

    col = F.col(text_col)
    lines = F.filter(
        F.transform(
            F.split(col, _re.escape(line_delimiter)),
            lambda s: F.trim(F.regexp_replace(F.lower(s), r"\s+", " ")),
        ),
        lambda s: F.length(s) > 0,
    )
    n_lines = F.size(lines)
    dup_frac = F.when(n_lines > 0, 1 - F.size(F.array_distinct(lines)) / n_lines).otherwise(
        F.lit(0.0)
    )
    per_doc = df.select(
        F.col(id_col).alias("doc_id"),
        n_lines.alias("n_lines"),
        F.round(dup_frac, 6).alias("dup_line_fraction"),
    )

    toks = tokens(col)
    n = F.size(toks)
    bigrams = F.when(n < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - F.lit(1)),
            lambda i: F.array_join(F.slice(toks, i, 2), " "),
        )
    )
    counts = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(bigrams).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count("*").alias("c"))
    )
    tops = counts.groupBy("doc_id").agg(
        F.max("c").alias("top_c"), F.sum("c").alias("n_bigrams")
    )
    return (
        per_doc.join(tops, "doc_id", "left")
        .select(
            "doc_id",
            "n_lines",
            "dup_line_fraction",
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            F.round(
                F.coalesce(F.col("top_c") / F.col("n_bigrams"), F.lit(0.0)), 6
            ).alias("top_bigram_fraction"),
        )
    )


def unigram_logprob_score(
    df: DataFrame,
    vocab_size: int = 1000,
    floor: float = 1e-6,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style language-model quality proxy without an external LM:
    two passes over the corpus.

    Pass 1 builds the corpus unigram distribution and keeps the
    ``vocab_size`` most frequent tokens (ties broken lexicographically
    for determinism) — ``orderBy().limit()`` compiles to Spark's
    distributed TakeOrderedAndProject (per-partition partial top-K, no
    single-partition window). Pass 2 explodes documents to tokens and
    broadcast-joins the tiny vocab: each token scores ln(count/total),
    out-of-vocabulary tokens score ln(floor). Output per document:
    ``n_tokens``, ``oov_fraction``, ``mean_logprob`` (rounded to 4
    decimals — summation-order float drift is far below 1e-4).
    Documents with no tokens produce no row.

    Scale: the corpus streams through twice (token explode is
    map-side); the only corpus-keyed Exchanges are the vocab count
    aggregate and the per-doc rollup. The vocab side is broadcast —
    at 10^12 docs the distribution pass is the same shape as a word
    count, and scoring adds zero extra shuffles beyond the rollup."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
    )
    freq = toks.groupBy("tok").agg(F.count("*").alias("c"))
    total = freq.agg(F.sum("c").alias("n_total"))
    vocab = (
        freq.orderBy(F.col("c").desc(), F.col("tok").asc())
        .limit(vocab_size)
        .crossJoin(F.broadcast(total))
        .select("tok", F.log(F.col("c") / F.col("n_total")).alias("logp"))
    )
    scored = toks.join(F.broadcast(vocab), "tok", "left")
    import math

    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.sum(F.when(F.col("logp").isNull(), 1).otherwise(0))
                / F.count("*"),
                6,
            ).alias("oov_fraction"),
            F.round(
                F.sum(F.coalesce(F.col("logp"), F.lit(math.log(floor))))
                / F.count("*"),
                4,
            ).alias("mean_logprob"),
        )
    )
