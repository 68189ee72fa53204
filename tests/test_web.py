"""Web-corpus operators: URL normalization edge cases, URL dedup,
paragraph-level dedup, quality filter flags."""

from pyspark.sql import functions as F

from rml_utils_processor_ts_spark.operators.web import (
    normalize_url,
    paragraph_dedup_groups,
    registered_domain,
    url_dedup_groups,
    url_host,
)


def test_normalize_url_edge_cases(spark):
    cases = [
        # (input, expected canonical)
        ("HTTPS://WWW.Ex.COM:443/a/b/?utm_source=x&q=1#frag", "https://www.ex.com/a/b?q=1"),
        ("http://ex.com:80/", "http://ex.com"),
        ("http://ex.com:8080/x", "http://ex.com:8080/x"),  # non-default port kept
        ("https://ex.com/path?utm_medium=a&utm_source=b", "https://ex.com/path"),
        ("https://ex.com/p?a=1&fbclid=zzz&b=2", "https://ex.com/p?a=1&b=2"),
        ("https://Sub.Deep.Ex.Co.Uk/P", "https://sub.deep.ex.co.uk/P"),  # path case kept
    ]
    cases += [
        # malformed / scheme-less inputs stay opaque, never collapse to '://'
        ("example.com/no-scheme", "example.com/no-scheme"),
        ("not a url at all", "not a url at all"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r[0] for r in df.select(normalize_url(F.col("url"))).collect()]
    assert got == [e for _, e in cases]


def test_url_userinfo_and_ipv6(spark):
    """Review fix (ADVICE r3): userinfo must not be mistaken for the
    host (http://alice:pw@ex.com/x previously parsed host 'alice', so
    url_dedup_groups merged unrelated documents), and bracketed IPv6
    literals must keep ':' out of port parsing."""
    from rml_utils_processor_ts_spark.operators.web import url_port

    cases = [
        # (url, host, port, canonical)
        ("http://alice:pw@Example.COM/x", "example.com", "", "http://example.com/x"),
        ("https://bob@ex.com:443/y/", "ex.com", "443", "https://ex.com/y"),
        ("http://a%40b@ex.com:8080/z", "ex.com", "8080", "http://ex.com:8080/z"),
        ("http://[2001:DB8::1]/p", "[2001:db8::1]", "", "http://[2001:db8::1]/p"),
        ("http://[::1]:8080/p", "[::1]", "8080", "http://[::1]:8080/p"),
        ("http://u:p@[::1]:80/p", "[::1]", "80", "http://[::1]/p"),
    ]
    df = spark.createDataFrame([(u,) for u, *_ in cases], "url string")
    got = df.select(
        url_host(F.col("url")).alias("h"),
        url_port(F.col("url")).alias("p"),
        normalize_url(F.col("url")).alias("n"),
    ).collect()
    for (u, h, p, n), r in zip(cases, got):
        assert (r["h"], r["p"], r["n"]) == (h, p, n), u
    # distinct userinfo-bearing URLs with different hosts never collapse
    dd = spark.createDataFrame(
        [(1, "http://alice@one.com/x"), (2, "http://alice@two.com/x")],
        "doc_id long, url string",
    )
    assert url_dedup_groups(dd).count() == 2


def test_registered_domain_and_host(spark):
    df = spark.createDataFrame([("https://A.B.Example.ORG:8443/x?y#z",)], "url string")
    row = df.select(
        url_host(F.col("url")).alias("h"),
        registered_domain(url_host(F.col("url"))).alias("d"),
    ).collect()[0]
    assert row["h"] == "a.b.example.org"
    assert row["d"] == "example.org"


def test_url_dedup_groups(spark):
    df = spark.createDataFrame(
        [
            (1, "https://ex.com/a?utm_source=x"),
            (2, "HTTPS://EX.COM/a"),  # same canonical as 1
            (3, "https://ex.com/b"),
        ],
        "doc_id long, url string",
    )
    rows = {r["norm_url"]: (r["keep_id"], r["n_copies"]) for r in url_dedup_groups(df).collect()}
    assert rows["https://ex.com/a"] == (1, 2)
    assert rows["https://ex.com/b"] == (3, 1)


def test_paragraph_dedup_groups(spark):
    docs = spark.createDataFrame(
        [
            (1, "Alpha beta.\n\nshared  PARA here.\n\n"),
            (2, "shared para HERE.\n\nunique text."),
        ],
        "doc_id long, text string",
    )
    groups = {r["para_hash"]: r for r in paragraph_dedup_groups(docs).collect()}
    # the normalized shared paragraph appears in both docs -> keeper is doc 1
    shared = [g for g in groups.values() if g["n_copies"] == 2]
    assert len(shared) == 1 and shared[0]["keep_doc_id"] == 1
    # empty trailing paragraph filtered; 3 distinct paragraphs total
    assert len(groups) == 3


def test_quality_filter_flags(spark):
    from rml_utils_processor_ts_spark.operators.text import quality_filter

    good = "the quick brown fox jumps over the lazy dog " * 10
    symbols = "@@@ ### $$$ %%% ^^^ &&& *** " * 20
    short = "tiny text"
    df = spark.createDataFrame(
        [(1, good), (2, symbols), (3, short)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in quality_filter(df, min_tokens=30).collect()}
    assert rows[1]["keep"] is True
    assert rows[2]["keep"] is False and rows[2]["symbols_ok"] is False
    assert rows[3]["keep"] is False and rows[3]["len_ok"] is False


def test_repetition_signals(spark):
    """Gopher-style repetition: duplicate lines and a dominant bigram
    are measured exactly; a clean doc scores near zero."""
    from rml_utils_processor_ts_spark.operators.text import repetition_signals

    docs = spark.createDataFrame(
        [
            (1, "Buy now\nbuy NOW\nunique line"),       # 3 lines, 2 distinct after fold
            (2, "spam spam spam spam"),                  # top bigram 'spam spam' = 3/3
            (3, "a clean sentence with no repeats"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_signals(docs).collect()}
    assert rows[1]["n_lines"] == 3
    assert abs(rows[1]["dup_line_fraction"] - (1 - 2 / 3)) < 1e-6
    assert rows[2]["top_bigram_fraction"] == 1.0 and rows[2]["n_bigrams"] == 3
    assert rows[3]["dup_line_fraction"] == 0.0
    assert rows[3]["top_bigram_fraction"] < 0.5


def test_contamination_report_and_decontaminate(spark):
    """Benchmark k-gram decontamination: a doc embedding a benchmark
    item verbatim is flagged at fraction 1.0; partial overlap scores
    proportionally; clean docs survive decontaminate."""
    from rml_utils_processor_ts_spark.operators.contamination import (
        contamination_report,
        decontaminate,
    )

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "bench_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "prefix words the quick brown fox jumps over the lazy dog suffix"),
            (2, "the quick brown fox sat still"),  # shares only a 4-gram prefix
            (3, "completely unrelated text about spark plans"),
        ],
        "doc_id long, text string",
    )
    rep = {r["doc_id"]: r for r in contamination_report(docs, bench, k=4).collect()}
    # benchmark has 9 tokens -> 6 distinct 4-grams; doc 1 contains all
    assert rep[1]["bench_grams"] == 6 and rep[1]["fraction"] == 1.0
    assert rep[2]["matched_grams"] == 1 and abs(rep[2]["fraction"] - 1 / 6) < 1e-9
    assert 3 not in rep
    kept = {r["doc_id"] for r in decontaminate(docs, bench, k=4, min_fraction=0.8).collect()}
    assert kept == {2, 3}


def test_html_to_text_extraction(spark):
    """Generic HTML visible-text extraction: scripts/styles/comments
    dropped, block closers become newlines, entities decode (amp last —
    '&amp;lt;' stays a literal '&lt;'), whitespace collapses."""
    from rml_utils_processor_ts_spark.sources.pages import html_to_text

    html = (
        "<html><head><title>T</title><style>p { color: red }</style>"
        "<script>var x = '<p>not text</p>';</script></head>"
        "<body><!-- hidden --><h1>Header</h1>"
        "<p>Para one with &amp; and &lt;tags&gt; and &amp;lt;escaped&amp;gt;.</p>"
        "<div>Block<br>break</div>"
        "<ul><li>item one</li><li>item two</li></ul>"
        "</body></html>"
    )
    df = spark.createDataFrame([(html,)], "html string")
    out = df.select(html_to_text(F.col("html")).alias("t")).collect()[0]["t"]
    assert "color: red" not in out and "var x" not in out and "hidden" not in out
    assert "Para one with & and <tags> and &lt;escaped&gt;." in out
    assert "Header\n" in out  # h1 closer -> newline
    assert "Block\nbreak" in out  # <br> -> newline
    assert "item one\nitem two" in out
    assert "  " not in out and "\n\n" not in out


def test_new_operator_plan_shapes(spark):
    """Shuffle discipline of the round-4 operators, asserted on physical
    plans: contamination joins the corpus map-side (broadcast, no
    SortMergeJoin, the only corpus-keyed Exchange is the post-match
    pair aggregate); PII redaction and HTML extraction are zero-shuffle;
    stratified sampling pushes no Exchange."""
    from rml_utils_processor_ts_spark.operators.contamination import contamination_report
    from rml_utils_processor_ts_spark.operators.corpus import stratified_hash_sample
    from rml_utils_processor_ts_spark.operators.web import redact_pii
    from rml_utils_processor_ts_spark.sources.pages import html_to_text

    docs = spark.createDataFrame(
        [(1, "some words here", "s0"), (2, "other words", "s1")],
        "doc_id long, text string, source string",
    )
    bench = spark.createDataFrame([(9, "some words here")], "bench_id long, text string")

    def plan_of(df):
        return df._jdf.queryExecution().executedPlan().toString()

    p = plan_of(contamination_report(docs, bench, k=2))
    assert "SortMergeJoin" not in p
    assert p.count("BroadcastHashJoin") >= 2
    non_broadcast = [l for l in p.splitlines() if "Exchange hashpartitioning" in l]
    assert all("bench_id" in l or "doc_id" in l for l in non_broadcast)
    corpus_keyed = [l for l in non_broadcast if "doc_id" in l]
    assert len(corpus_keyed) == 1  # only the (doc, bench) match aggregate

    assert "Exchange" not in plan_of(redact_pii(docs))
    assert "Exchange" not in plan_of(
        docs.select(html_to_text(F.col("text")).alias("t"))
    )
    assert "Exchange" not in plan_of(
        stratified_hash_sample(docs, "doc_id", "source", {"s0": 1.0}, 0.5)
    )


def test_mask_contaminated_spans(spark):
    """Span-level decontamination: only the overlapping token run is
    replaced (collapsed to one mask token), surrounding text survives,
    clean docs pass through untouched, counts are exact."""
    from rml_utils_processor_ts_spark.operators.contamination import (
        mask_contaminated_spans,
    )

    bench = spark.createDataFrame(
        [(1, "the quick brown fox jumps")], "bench_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            (1, "intro words THE QUICK BROWN FOX JUMPS outro words"),
            (2, "totally clean document text here"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in mask_contaminated_spans(docs, bench, k=5).collect()}
    assert rows[1]["text"] == "intro words <MASKED> outro words"
    assert rows[1]["n_masked_tokens"] == 5
    assert rows[2]["text"] == "totally clean document text here"
    assert rows[2]["n_masked_tokens"] == 0


def test_domain_profile(spark):
    from rml_utils_processor_ts_spark.operators.web import domain_profile

    docs = spark.createDataFrame(
        [
            (1, "https://a.ex.com/1", "one two three"),
            (2, "http://b.ex.com/2", "four five"),
            (3, "https://other.org/3", "six"),
        ],
        "doc_id long, url string, text string",
    )
    rows = {r["domain"]: r for r in domain_profile(docs).collect()}
    assert rows["ex.com"]["n_docs"] == 2 and rows["ex.com"]["total_tokens"] == 5
    assert rows["ex.com"]["mean_tokens"] == 2.5
    assert rows["other.org"]["n_docs"] == 1 and rows["other.org"]["total_tokens"] == 1
