"""Unit tests for the web-scale operators: CC on known graphs, dedup
family, text analytics, ANN, linking, multimodal plumbing."""

import pytest
from pyspark.sql import functions as F


def test_cc_chain_star_clique(spark):
    """Golden components: a chain, a star hub (skew case), a clique,
    a disjoint pair — component label = min node id (F7 fixture)."""
    from rml_utils_processor_ts_spark.operators.cc import connected_components

    edges = [
        # chain a1-a2-a3-a4
        ("a1", "a2"), ("a2", "a3"), ("a3", "a4"),
        # star: hub h0 with 50 spokes
        *[("h0", f"s{i:02d}") for i in range(50)],
        # clique k1..k4
        ("k1", "k2"), ("k1", "k3"), ("k1", "k4"), ("k2", "k3"), ("k2", "k4"), ("k3", "k4"),
        # pair
        ("z8", "z9"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    comp = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert comp["a4"] == "a1" and comp["a2"] == "a1" and comp["a1"] == "a1"
    assert comp["h0"] == "h0" and comp["s49"] == "h0"
    assert all(comp[f"k{i}"] == "k1" for i in range(1, 5))
    assert comp["z9"] == "z8"
    # partition check: one component per group
    groups = {}
    for node, c in comp.items():
        groups.setdefault(c, set()).add(node)
    assert len(groups) == 4


def test_dedup_exact_and_keep_canonical(spark):
    from rml_utils_processor_ts_spark.operators.dedup import (
        exact_duplicate_groups,
        jaccard_pairs,
        keep_canonical,
    )

    rows = [
        (1, "the quick brown fox jumps over the dog", "a"),
        (2, "THE  quick brown fox jumps over the dog", "a"),  # exact dup after norm
        (3, "the quick brown fox jumps over the cat", "a"),  # near dup
        (4, "completely different content here entirely", "b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    groups = exact_duplicate_groups(df)
    dup = [r for r in groups.collect() if r["n_copies"] > 1]
    assert len(dup) == 1 and dup[0]["keep_id"] == 1

    pairs = jaccard_pairs(df, threshold=0.5, block_col="source")
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got  # identical after normalization -> jaccard 1.0
    assert (1, 3) in got and (2, 3) in got

    kept = keep_canonical(df, pairs)
    assert {r["doc_id"] for r in kept.collect()} == {1, 4}


def test_keep_canonical_string_ids(spark):
    """String doc ids are first-class (r02 verdict correctness debt:
    the old cast('long') nulled them and dropped nothing). Min is
    lexicographic for strings, numeric for numeric ids."""
    from rml_utils_processor_ts_spark.operators.dedup import keep_canonical

    docs = spark.createDataFrame(
        [("doc-b", "x"), ("doc-a", "x"), ("doc-c", "y"), ("doc-z", "z")],
        "doc_id string, text string",
    )
    pairs = spark.createDataFrame(
        [("doc-b", "doc-a"), ("doc-a", "doc-c")], "id_a string, id_b string"
    )
    kept = {r["doc_id"] for r in keep_canonical(docs, pairs).collect()}
    assert kept == {"doc-a", "doc-z"}

    # numeric ids still compare numerically: 2 < 10 even though "10" < "2"
    ndocs = spark.createDataFrame([(2, "x"), (10, "x")], "doc_id long, text string")
    npairs = spark.createDataFrame([(2, 10)], "id_a long, id_b long")
    assert {r["doc_id"] for r in keep_canonical(ndocs, npairs).collect()} == {2}

    # fractional numeric ids round-trip through the CC string node in
    # the id column's OWN type (ADVICE r3: a hard-coded long cast
    # truncated 2.5 -> 2, so the anti-join never matched and the dup
    # was silently retained)
    fdocs = spark.createDataFrame([(2.5, "x"), (10.25, "x")], "doc_id double, text string")
    fpairs = spark.createDataFrame([(2.5, 10.25)], "id_a double, id_b double")
    assert {r["doc_id"] for r in keep_canonical(fdocs, fpairs).collect()} == {2.5}


def test_minhash_lsh_finds_near_dups(spark):
    from rml_utils_processor_ts_spark.operators.dedup import minhash_dedup_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    rows = [
        (1, base),
        (2, base.replace("zeta", "zetaX", 1)),  # one-token edit -> high jaccard
        (3, "unrelated words entirely different from the rest " * 5),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["id_a"], r["id_b"]) for r in minhash_dedup_pairs(df, threshold=0.5).collect()}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_simhash_similar_docs_close(spark):
    from rml_utils_processor_ts_spark.operators.dedup import simhash

    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again today"),
        (2, "the quick brown fox jumps over the lazy dog again and again tonight"),
        (3, "cryptographic hash functions exhibit avalanche behaviour under tiny input changes"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    h = {r["id"]: r["simhash"] for r in simhash(df).collect()}

    def hamming(a, b):
        return bin(a ^ b).count("1")

    assert hamming(h[1], h[2]) < hamming(h[1], h[3])
    assert hamming(h[1], h[2]) < hamming(h[2], h[3])


def test_text_profile_values(spark):
    from rml_utils_processor_ts_spark.operators.text import text_profile

    df = spark.createDataFrame(
        [(1, "the cat is in the hat"), (2, "der hund ist und der")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in text_profile(df).collect()}
    assert rows[1]["n_tokens"] == 6
    assert rows[1]["lang_pred"] == "en"
    assert rows[2]["lang_pred"] == "de"
    assert rows[1]["stopword_ratio"] == pytest.approx(4 / 6, abs=1e-6)  # the, is, in, the


def test_ann_exact_vs_lsh_recall(spark):
    """LSH-bucketed ANN finds a good fraction of the exact top-k (same
    bucket => candidate); exact path is the ground truth."""
    from rml_utils_processor_ts_spark.operators.similarity import cosine_topk, lsh_ann_topk

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
    )
    exact = cosine_topk(emb, [0, 1], k=5).collect()
    approx = lsh_ann_topk(emb, [0, 1], k=5, n_planes=4).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    # approximate results are a subset of scored candidates and overlap ground truth
    assert len(approx_set) > 0
    assert len(exact_set & approx_set) >= 2


def test_derive_n_planes_scales_with_corpus():
    """VERDICT r3 #4: plane counts derive from corpus size — buckets
    stay near the target width instead of degenerating to all-pairs."""
    from rml_utils_processor_ts_spark.operators.similarity import derive_n_planes

    assert derive_n_planes(1_000) == 4  # clamped at the floor
    assert derive_n_planes(100_000) == 7  # ceil(log2(100000/1024))
    assert derive_n_planes(1_000_000) == 10
    assert derive_n_planes(10**12) == 24  # clamped at the cap
    # monotone in n
    counts = [derive_n_planes(n) for n in (10**3, 10**5, 10**7, 10**9)]
    assert counts == sorted(counts)


def test_ann_multiprobe_recall_and_parity(spark):
    """VERDICT r3 #5: margin-directed multi-probe — recall at n_probe=3
    must dominate single-probe recall, candidates stay ~n_probe buckets,
    and the Spark probe-bucket column matches the Python twin exactly
    (a desync sends queries to wrong partitions with silent ~0 recall)."""
    from rml_utils_processor_ts_spark.operators.similarity import (
        _hyperplanes,
        cosine_topk,
        lsh_ann_topk,
        lsh_probe_buckets_column,
        py_probe_buckets,
    )

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
    )
    queries = [0, 1, 2, 3, 4, 5, 6, 7]
    exact = {(r["query_id"], r["neighbor_id"]) for r in cosine_topk(emb, queries, k=5).collect()}
    one = {(r["query_id"], r["neighbor_id"]) for r in lsh_ann_topk(emb, queries, k=5, n_planes=6).collect()}
    multi = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_ann_topk(emb, queries, k=5, n_planes=6, n_probe=3).collect()
    }
    assert len(exact & multi) >= len(exact & one)  # probing never hurts recall
    assert len(multi) >= len(one)

    # Spark/Python probe parity on real vectors
    dim = len(emb.select("embedding").first()[0])
    planes = _hyperplanes(dim, 6, 42)
    rows = emb.limit(20).select(
        "embedding", lsh_probe_buckets_column(F.col("embedding"), planes, 3).alias("p")
    ).collect()
    for r in rows:
        assert list(r["p"]) == py_probe_buckets(list(r["embedding"]), planes, 3)


def test_linking_exact_and_fuzzy(spark):
    from rml_utils_processor_ts_spark.operators.linking import link_exact, link_fuzzy

    alias_dict = spark.createDataFrame(
        [("Acme Corp", "http://kb/acme"), ("Globex", "http://kb/globex")],
        "alias string, canonical_iri string",
    )
    mentions = spark.createDataFrame(
        [("acme  corp",), ("globex",), ("unknown co",)], "mention string"
    )
    linked = {r["mention"]: r["canonical_iri"] for r in link_exact(mentions, alias_dict).collect()}
    assert linked["acme  corp"] == "http://kb/acme"
    assert linked["unknown co"] is None

    fuzzy = link_fuzzy(
        spark.createDataFrame([("acme korp",)], "mention string"),
        alias_dict,
        min_jaccard=0.3,
        num_hashes=8,
        bands=8,  # 1-row bands: any matching minhash -> candidate (max recall)
    ).collect()
    assert len(fuzzy) == 1 and fuzzy[0]["canonical_iri"] == "http://kb/acme"


def test_multimodal_plumbing(spark):
    from rml_utils_processor_ts_spark.operators.multimodal import (
        attach_media,
        decode_media,
        extract_features,
        frame_sample_plan,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(30)
    media = attach_media(docs)
    feats = extract_features(media).collect()
    assert len(feats) == 30
    assert all(len(r["feature"]) == 8 for r in feats)
    assert all(r["n_bytes"] > 0 or r["content_hash"] for r in feats)
    # determinism: same payload -> same hash across runs
    feats2 = extract_features(media).collect()
    assert {r["media_id"]: r["content_hash"] for r in feats} == {
        r["media_id"]: r["content_hash"] for r in feats2
    }
    frames = frame_sample_plan(media)
    assert frames.filter(F.col("frame_ts_ms") % 1000 != 0).count() == 0
    with pytest.raises(NotImplementedError):
        decode_media(b"xx", "image/png")


def test_pages_generator_and_extraction(spark, tmp_path):
    """F1 invariant: extracted text from html is byte-identical to the
    stored text column, per url; regeneration is bit-stable."""
    from rml_utils_processor_ts_spark.sources.pages import extract_text, synth_pages

    pages = synth_pages(spark, 200, partitions=4)
    ext = extract_text(pages)
    assert ext.filter(F.col("extracted_text") != F.col("text")).count() == 0
    # deterministic regeneration
    again = synth_pages(spark, 200, partitions=4)
    a = sorted(r["url"] + "|" + r["text"] for r in pages.collect())
    b = sorted(r["url"] + "|" + r["text"] for r in again.collect())
    assert a == b
    # hot-domain skew exists
    hot = pages.filter(F.col("url").startswith("http://hot.example.org")).count()
    assert 0 < hot < 200


def test_rml_over_page_table(spark, tmp_path):
    """North-star shape: RML mapping whose logical source is the page
    table; iterator runs over every page's payload; url/warc_ts pass
    through for LDES."""
    from rml_utils_processor_ts_spark.operators.executor import execute_mapping
    from rml_utils_processor_ts_spark.sources.pages import synth_pages

    path = str(tmp_path / "pages")
    synth_pages(spark, 50, partitions=2).write.parquet(path)
    mapping = f"""
ex:map_pages a rr:TriplesMap ;
    rml:logicalSource [ a rml:LogicalSource ;
        rml:source "pages:{path}" ;
        rml:iterator "//data" ;
        rml:referenceFormulation ql:XPath ] ;
    rr:subjectMap [ a rr:SubjectMap ; rr:template "http://example.org/{{@id}}" ;
        rr:class <http://example.org/Entity> ] ;
    rr:predicateObjectMap [
        rr:predicateMap [ rr:constant rdfs:label ] ;
        rr:objectMap [ rml:reference "@label" ; rr:termType rr:Literal ] ] .
"""
    res = execute_mapping(spark, mapping)
    rows = res.triples.collect()
    # 50 pages x 2 records x 2 quads (type + label)
    assert len(rows) == 200
    labels = [r for r in rows if r["p"].endswith("label")]
    assert len(labels) == 100
    assert all(r["o"].startswith("label ") for r in labels)


def test_embedding_lsh_bands_amplify_recall(spark):
    """r02 ADVICE: a single 4-plane signature keeps only ~65% of true
    pairs at cosine 0.95. Banding must (a) stay a subset of the exact
    pairs (precision 1.0 — candidates are cosine-verified), (b) find at
    least as many pairs as one band, (c) lift recall materially."""
    import math
    import random

    from rml_utils_processor_ts_spark.operators.dedup import (
        embedding_neardup_pairs,
        embedding_neardup_pairs_lsh,
    )

    rng = random.Random(7)
    dim = 16
    rows = []
    vid = 0
    for _ in range(60):
        base = [rng.gauss(0, 1) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in base))
        base = [x / n for x in base]
        near = [x + rng.gauss(0, 0.02) for x in base]  # cosine ~0.999
        rows.append((vid, base))
        rows.append((vid + 1, near))
        vid += 2
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs(emb, threshold=0.95, block_col=None).collect()
    }
    assert len(exact) >= 60  # every planted pair qualifies

    def lsh_pairs(n_bands):
        return {
            (r["id_a"], r["id_b"])
            for r in embedding_neardup_pairs_lsh(
                emb, threshold=0.95, n_planes=4, n_bands=n_bands
            ).collect()
        }

    one, three = lsh_pairs(1), lsh_pairs(3)
    assert one <= exact and three <= exact  # verify step keeps precision 1.0
    assert one <= three  # band 0 is the single-band signature
    recall_1 = len(one & exact) / len(exact)
    recall_3 = len(three & exact) / len(exact)
    assert recall_3 > recall_1
    assert recall_3 >= 0.9, (recall_1, recall_3)


def test_ivf_ann_trained_and_random_centroids(spark):
    """IVF ANN: (a) exact-cosine verified candidates only (subset of the
    brute-force top-k universe), (b) trained spherical-k-means cells
    recall at least as well as the same-size pseudo-random cells on a
    clustered corpus, (c) determinism (two runs identical)."""
    from rml_utils_processor_ts_spark.operators.similarity import (
        cosine_topk,
        ivf_ann_topk,
        pseudo_random_centroids,
        train_ivf_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    qids = [0, 1, 2]
    exact = {(r["query_id"], r["neighbor_id"]) for r in cosine_topk(emb, qids, k=5).collect()}

    rand_c = pseudo_random_centroids(64, 8, seed=7)
    rand_hits = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_ann_topk(emb, qids, k=5, n_probe=3, centroids=rand_c).collect()
    }
    trained_c = train_ivf_centroids(emb, n_cells=8, sample_size=256)
    trained_hits = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_ann_topk(emb, qids, k=5, n_probe=3, centroids=trained_c).collect()
    }
    assert len(trained_hits & exact) >= len(rand_hits & exact)
    assert len(trained_hits & exact) >= 6  # meaningful recall on 15 truth pairs

    again = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_ann_topk(emb, qids, k=5, n_probe=3, centroids=trained_c).collect()
    }
    assert again == trained_hits


def test_unigram_logprob_values_and_plan(spark):
    """Corpus-LM proxy: hand-computable distribution on a tiny corpus
    (vocab_size caps OOV), plan stays broadcast + distributed top-K —
    no SortMergeJoin on the token stream, no single-partition window."""
    import math

    from rml_utils_processor_ts_spark.operators.text import unigram_logprob_score

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, "zz zz")],
        "doc_id long, text string",
    )
    # corpus counts: a=3, zz=2, b=1, c=1 (total 7); vocab_size=2 keeps
    # {a, zz}; b/c are OOV at floor 1e-6
    out = {r["doc_id"]: r for r in unigram_logprob_score(docs, vocab_size=2).collect()}
    la, lz, lf = math.log(3 / 7), math.log(2 / 7), math.log(1e-6)
    assert out[1]["n_tokens"] == 3
    assert out[1]["mean_logprob"] == round((2 * la + lf) / 3, 4)
    assert out[1]["oov_fraction"] == round(1 / 3, 6)
    assert out[2]["mean_logprob"] == round((la + lf) / 2, 4)
    assert out[3]["mean_logprob"] == round(lz, 4) and out[3]["oov_fraction"] == 0.0

    plan = unigram_logprob_score(docs, vocab_size=2)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_kgqa_detects_bad_iris_and_orphans(spark):
    """The QA operators must actually FIRE on unhealthy graphs (the
    oracle gates cover the all-healthy customer graph)."""
    from rml_utils_processor_ts_spark.operators.kgqa import (
        iri_audit,
        orphan_objects,
        predicate_profile,
    )

    rows = [
        # (s, s_termtype, p, o, o_termtype, o_datatype, o_lang, g)
        ("http://a/1", "IRI", "http://p/knows", "http://a/2", "IRI", None, None, "http://g"),
        ("http://a/2", "IRI", "http://p/knows", "http://a/3", "IRI", None, None, "http://g"),
        ("http://a/1", "IRI", "http://p/name", "Alice", "Literal", None, None, "http://g"),
        ("not an iri", "IRI", "http://p/name", "Bob", "Literal", None, None, "http://g"),
        ("http://a/4", "IRI", "http://p/knows", "http://bad iri/x", "IRI", None, None, None),
    ]
    schema = ("s string, s_termtype string, p string, o string, o_termtype string, "
              "o_datatype string, o_lang string, g string")
    t = spark.createDataFrame(rows, schema)

    audit = {r["g"]: r for r in iri_audit(t).collect()}
    assert audit["http://g"]["bad_subject_iris"] == 1
    assert audit[""]["bad_object_iris"] == 1
    assert audit["http://g"]["bad_predicate_iris"] == 0

    # a/3 is referenced but never a subject; the malformed object too
    orphans = {r["iri"] for r in orphan_objects(t).collect()}
    assert orphans == {"http://a/3", "http://bad iri/x"}
    knows_only = {r["iri"] for r in orphan_objects(t, predicate="http://p/knows").collect()}
    assert knows_only == orphans

    prof = {r["p"]: r for r in predicate_profile(t).collect()}
    assert prof["http://p/knows"]["n_triples"] == 3
    assert prof["http://p/knows"]["n_iri_objects"] == 3
    assert prof["http://p/name"]["n_literal_objects"] == 2
    assert prof["http://p/knows"]["n_subjects"] == 3
