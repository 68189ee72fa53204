"""JSON-LD golden fixture validated against an independent consumer
(r6 VERDICT #7): the spec-shape writer output is checked three ways —

1. byte-for-byte against a vendored golden file (hand-verified once
   against the JSON-LD 1.1 grammar: value objects §9.3, node references,
   graph objects §9.4 with IRI and blank-node graph names);
2. through an independent mini-implementation of the JSON-LD 1.1
   "Deserialize JSON-LD to RDF" algorithm (the subset the writer's
   expanded shape exercises — no @context, no compaction), asserting the
   recovered quad set equals the input quads;
3. against the N-Quads the same frame serializes to (vendored), parsed
   by the engine's own reader — writer, reader, and the deserializer
   must all agree on one quad set.

The deserializer here is written from the published algorithm, NOT from
the writer's code, so a writer bug cannot self-validate. One deliberate
RDF 1.1 equivalence: a value object with only ``@value`` deserializes to
a simple literal (the engine's ``o_datatype = None``), which RDF 1.1
§3.3 defines as identical to an ``xsd:string``-typed literal.
"""

from __future__ import annotations

import json
import os

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

ROWS = [
    ("http://x/s1", "IRI", "http://x/p1", 'plain "quoted" \\ text', "Literal", None, None, None, "t"),
    ("http://x/s1", "IRI", "http://x/p2", "bonjour", "Literal", None, "fr", None, "t"),
    ("http://x/s1", "IRI", "http://x/p2", "42", "Literal", "http://www.w3.org/2001/XMLSchema#integer", None, None, "t"),
    ("http://x/s1", "IRI", "http://x/p3", "http://x/o1", "IRI", None, None, None, "t"),
    ("http://x/s1", "IRI", "http://x/p3", "b2", "BlankNode", None, None, None, "t"),
    ("b1", "BlankNode", "http://x/p1", "café", "Literal", None, None, None, "t"),
    ("http://x/s2", "IRI", "http://x/p1", "in-graph", "Literal", None, None, "http://x/g1", "t"),
    ("http://x/s2", "IRI", "http://x/p1", "in-bnode-graph", "Literal", None, None, "_:g0", "t"),
]

SCHEMA = (
    "s string, s_termtype string, p string, o string, o_termtype string, "
    "o_datatype string, o_lang string, g string, target_id string"
)


def _quad_set(rows):
    """(s, p, o-lexical, datatype, lang, graph) with bnodes spelled _:x —
    the comparison currency all three representations reduce to."""
    out = set()
    for s, s_tt, p, o, o_tt, dt, lang, g, _ in rows:
        subj = "_:" + s if s_tt == "BlankNode" else s
        if o_tt == "IRI":
            obj, odt, olang = ("iri:" + o), None, None
        elif o_tt == "BlankNode":
            obj, odt, olang = ("bnode:" + o), None, None
        else:
            obj, odt, olang = ("lit:" + o), dt, lang
        out.add((subj, p, obj, odt, olang, g))
    return out


def _deserialize_jsonld_line(line: str):
    """JSON-LD 1.1 'Deserialize JSON-LD to RDF' for the writer's expanded
    shape: top-level node object, or graph object ({@id, @graph})."""
    doc = json.loads(line)
    quads = []

    def node_quads(node, graph):
        subj = node["@id"]
        for key, values in node.items():
            if key in ("@id", "@graph"):
                continue
            assert isinstance(values, list), "expanded form: array per predicate"
            for v in values:
                if isinstance(v, str):
                    quads.append((subj, key, "lit:" + v, None, None, graph))
                elif "@id" in v:
                    tgt = v["@id"]
                    kind = "bnode:" + tgt[2:] if tgt.startswith("_:") else "iri:" + tgt
                    quads.append((subj, key, kind, None, None, graph))
                else:
                    quads.append(
                        (subj, key, "lit:" + v["@value"], v.get("@type"), v.get("@language"), graph)
                    )

    if "@graph" in doc:
        for node in doc["@graph"]:
            node_quads(node, doc["@id"])
    else:
        node_quads(doc, None)
    return quads


def test_jsonld_lines_match_golden(spark):
    from rml_utils_processor_ts_spark.sinks.nquads import jsonld_subject_lines

    df = spark.createDataFrame(ROWS, SCHEMA)
    got = sorted(r["line"] for r in jsonld_subject_lines(df).collect())
    with open(os.path.join(GOLDEN_DIR, "jsonld_expected.jsonl"), encoding="utf-8") as f:
        expected = sorted(ln for ln in f.read().splitlines() if ln)
    assert got == expected


def test_independent_deserializer_recovers_quads(spark):
    from rml_utils_processor_ts_spark.sinks.nquads import jsonld_subject_lines

    df = spark.createDataFrame(ROWS, SCHEMA)
    quads = []
    for r in jsonld_subject_lines(df).collect():
        quads.extend(_deserialize_jsonld_line(r["line"]))
    assert set(quads) == _quad_set(ROWS)
    assert len(quads) == len(ROWS)


def test_nquads_golden_round_trip(spark):
    """The same frame's N-Quads serialization matches its vendored golden
    AND reads back through the engine's own reader to the same quad set."""
    from rml_utils_processor_ts_spark.sinks.nquads import (
        parse_nquad_lines,
        triples_to_nquad_lines,
    )

    df = spark.createDataFrame(ROWS, SCHEMA)
    got = sorted(r["line"] for r in triples_to_nquad_lines(df).collect())
    with open(os.path.join(GOLDEN_DIR, "jsonld_expected.nq"), encoding="utf-8") as f:
        expected = sorted(ln for ln in f.read().splitlines() if ln)
    assert got == expected

    lines_df = spark.createDataFrame([(ln,) for ln in expected], "line string")
    back = parse_nquad_lines(lines_df)
    got_rows = [
        (r["s"], r["s_termtype"], r["p"], r["o"], r["o_termtype"],
         r["o_datatype"], r["o_lang"], r["g"], "t")
        for r in back.collect()
    ]
    assert _quad_set(got_rows) == _quad_set(ROWS)
