"""Determinism tests (SURVEY §4: byte-identical export is a correctness
requirement, not an optimization)."""

import glob
import hashlib

from rml_utils_processor_ts_spark.operators.executor import execute_mapping
from rml_utils_processor_ts_spark.sinks import write_nquads


def _digest(d):
    h = hashlib.sha256()
    for f in sorted(glob.glob(d + "/part-*")):
        with open(f, "rb") as fh:
            h.update(fh.read())
        h.update(b"\x00")
    return h.hexdigest()


MAPPING = """
ex:m a rr:TriplesMap ;
    rml:logicalSource [ rml:source "table:/root/testdata/sf0.001/lineitem.parquet" ;
        rml:referenceFormulation <urn:rml-spark:ql/Table> ] ;
    rr:subjectMap [ rr:template "http://x/li/{l_orderkey}/{l_linenumber}" ;
        rr:class <http://x/LineItem> ] ;
    rr:predicateObjectMap [ rr:predicateMap [ rr:constant <http://x/qty> ] ;
        rr:objectMap [ rml:reference "l_quantity" ] ] .
"""


def test_nquads_export_byte_identical(spark, tmp_path):
    """Same input, two full runs (plan rebuilt from scratch) => identical
    bytes in identical file layout."""
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_nquads(execute_mapping(spark, MAPPING).triples, d1)
    write_nquads(execute_mapping(spark, MAPPING).triples, d2)
    assert _digest(d1) == _digest(d2)
    lines = sum(1 for f in glob.glob(d1 + "/part-*") for _ in open(f))
    # RDF set semantics: quads are distinct — expected = |distinct subjects|
    # (class quads) + |distinct (subject, qty)| (literal quads)
    import duckdb

    con = duckdb.connect()
    n_subj, n_pairs = con.execute(
        "SELECT count(DISTINCT (l_orderkey, l_linenumber)),"
        "       count(DISTINCT (l_orderkey, l_linenumber, l_quantity))"
        " FROM '/root/testdata/sf0.001/lineitem.parquet'"
    ).fetchone()
    assert lines == n_subj + n_pairs


def test_synth_pages_bit_stable_html(spark):
    """The page generator's html bytes are a pure function of the index."""
    from pyspark.sql import functions as F

    from rml_utils_processor_ts_spark.sources.pages import synth_pages

    a = synth_pages(spark, 64, partitions=2).select("url", F.md5("html").alias("h"))
    b = synth_pages(spark, 64, partitions=4).select("url", F.md5("html").alias("h"))
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}
