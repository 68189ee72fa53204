"""rmlt:serialization sinks: Turtle + N-Triples (reference configs at
/root/reference/test/incrml.test.ts:345 and processors.test.ts:130,169),
byte-stable exports, per-target routing by declared serialization."""

import glob
import hashlib

from fixtures import RML_BASIC, XML_DOC

from rml_utils_processor_ts_spark.operators.executor import execute_mapping
from rml_utils_processor_ts_spark.sinks import (
    triples_to_ntriple_lines,
    turtle_subject_lines,
    write_targets,
    write_turtle,
)

EX = "http://example.org/"


def _run_golden(spark):
    """The reference's golden 4-quad fixture (rml.test.ts:419-431):
    2 entities x (rdf:type + rdfs:label) in a named graph."""
    return execute_mapping(
        spark,
        RML_BASIC.format(source="dataset/data.xml"),
        {"dataset/data.xml": "inline:" + XML_DOC},
    )


def _read_dir(d):
    return sorted(line.rstrip("\n") for f in glob.glob(d + "/part-*") for line in open(f))


def _digest(d):
    h = hashlib.sha256()
    for f in sorted(glob.glob(d + "/part-*")):
        with open(f, "rb") as fh:
            h.update(fh.read())
        h.update(b"\x00")
    return h.hexdigest()


def test_turtle_golden_fixture_byte_stable(spark, tmp_path):
    res = _run_golden(spark)
    d1, d2 = str(tmp_path / "t1"), str(tmp_path / "t2")
    write_turtle(res.triples, d1, partitions=2)
    write_turtle(_run_golden(spark).triples, d2, partitions=2)
    assert _digest(d1) == _digest(d2)
    lines = [line for line in _read_dir(d1) if line]
    assert len(lines) == 2  # one subject block per entity
    expected = (
        f"<{EX}001> "
        f"<http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <{EX}Entity> ; "
        f'<http://www.w3.org/2000/01/rdf-schema#label> "some data" .'
    )
    assert expected in lines


def test_turtle_groups_multivalued_predicates(spark):
    doc = '<resource><data id="001" label="a"></data><data id="001" label="b"></data></resource>'
    res = execute_mapping(
        spark,
        RML_BASIC.format(source="dataset/data.xml"),
        {"dataset/data.xml": "inline:" + doc},
    )
    lines = [r["line"] for r in turtle_subject_lines(res.triples).collect()]
    assert len(lines) == 1
    assert '<http://www.w3.org/2000/01/rdf-schema#label> "a", "b"' in lines[0]


def test_ntriples_drops_graph_and_dedupes(spark):
    res = _run_golden(spark)
    nq = {r for (r,) in res.triples.select("g").distinct().collect()}
    assert nq == {EX + "myNamedGraph"}  # quads carried a graph
    lines = {r["line"] for r in triples_to_ntriple_lines(res.triples).collect()}
    assert len(lines) == 4
    assert all(line.endswith((" .", '" .')) and "myNamedGraph" not in line for line in lines)
    assert f'<{EX}001> <http://www.w3.org/2000/01/rdf-schema#label> "some data" .' in lines


def test_turtle_roundtrips_through_own_parser(spark):
    """The Turtle sink's escaping must survive a round trip through the
    repo's own Turtle parser: quotes, backslashes, newlines, tabs,
    unicode, datatypes, language tags, blank nodes."""
    from rml_utils_processor_ts_spark.plans.turtle import parse_turtle

    rows = [
        ("http://x/s1", "IRI", "http://x/p", 'quote " backslash \\ tab\tnewline\nend', "Literal", None, None, None, "default"),
        ("http://x/s1", "IRI", "http://x/p", "café ünïcode", "Literal", None, "fr", None, "default"),
        ("http://x/s1", "IRI", "http://x/q", "42", "Literal", "http://www.w3.org/2001/XMLSchema#integer", None, None, "default"),
        ("b0", "BlankNode", "http://x/p", "http://x/o", "IRI", None, None, None, "default"),
    ]
    df = spark.createDataFrame(
        rows,
        "s string, s_termtype string, p string, o string, o_termtype string, o_datatype string, o_lang string, g string, target_id string",
    )
    text = "\n".join(r["line"] for r in turtle_subject_lines(df).collect())
    triples = parse_turtle(text)
    got = {
        (
            s.value if s.kind == "iri" else "_:" + s.value,
            p.value,
            o.value,
            o.datatype,
            o.lang,
        )
        for (s, p, o) in triples
    }
    assert (
        "http://x/s1",
        "http://x/p",
        'quote " backslash \\ tab\tnewline\nend',
        None,
        None,
    ) in got
    assert any(o == "café ünïcode" and l == "fr" for (_, _, o, _, l) in got)
    assert any(o == "42" and d == "http://www.w3.org/2001/XMLSchema#integer" for (_, _, o, d, _) in got)
    assert ("_:b0", "http://x/p", "http://x/o", None, None) in got
    assert len(triples) == 4


def test_write_targets_honors_serialization(spark, tmp_path):
    """Two logical targets with different rmlt:serialization + a default
    TM: each lands in its declared format."""
    mapping = """
ex:map_turtle a rr:TriplesMap ;
    rml:logicalSource [ rml:source "table:/root/testdata/sf0.001/region.parquet" ;
        rml:referenceFormulation <urn:rml-spark:ql/Table> ] ;
    rr:subjectMap [ rr:template "http://x/r/{r_regionkey}" ;
        rml:logicalTarget <http://x/target/turtle> ] ;
    rr:predicateObjectMap [ rr:predicateMap [ rr:constant <http://x/name> ] ;
        rr:objectMap [ rml:reference "r_name" ] ] .

<http://x/target/turtle> a rmlt:LogicalTarget ;
    rmlt:serialization formats:Turtle .

ex:map_nt a rr:TriplesMap ;
    rml:logicalSource [ rml:source "table:/root/testdata/sf0.001/region.parquet" ;
        rml:referenceFormulation <urn:rml-spark:ql/Table> ] ;
    rr:subjectMap [ rr:template "http://x/r2/{r_regionkey}" ;
        rml:logicalTarget <http://x/target/nt> ] ;
    rr:predicateObjectMap [ rr:predicateMap [ rr:constant <http://x/name> ] ;
        rr:objectMap [ rml:reference "r_name" ] ] .

<http://x/target/nt> a rmlt:LogicalTarget ;
    rmlt:serialization formats:N-Triples .

ex:map_default a rr:TriplesMap ;
    rml:logicalSource [ rml:source "table:/root/testdata/sf0.001/region.parquet" ;
        rml:referenceFormulation <urn:rml-spark:ql/Table> ] ;
    rr:subjectMap [ rr:template "http://x/r3/{r_regionkey}" ;
        rr:graphMap [ rr:constant "http://x/g" ] ] ;
    rr:predicateObjectMap [ rr:predicateMap [ rr:constant <http://x/name> ] ;
        rr:objectMap [ rml:reference "r_name" ] ] .
"""
    from rml_utils_processor_ts_spark.plans.rml_parser import parse_mapping
    from rml_utils_processor_ts_spark.operators.executor import PlanExecutor

    plan = parse_mapping(mapping)
    result = PlanExecutor(spark).execute(plan)
    written = write_targets(result, plan, str(tmp_path), partitions=2)
    assert set(written) == {"http://x/target/turtle", "http://x/target/nt", "default"}

    turtle = [line for line in _read_dir(written["http://x/target/turtle"]) if line]
    assert all(" ; " not in line and line.count("<http://x/name>") == 1 for line in turtle)
    assert len(turtle) == 5  # one block per region subject
    assert any(line.startswith("<http://x/r/0> <http://x/name> ") for line in turtle)

    nt = [line for line in _read_dir(written["http://x/target/nt"]) if line]
    assert len(nt) == 5 and all(line.count("<") == 2 for line in nt)  # s + p, literal object

    default = [line for line in _read_dir(written["default"]) if line]
    assert len(default) == 5 and all(line.endswith("<http://x/g> .") for line in default)


def test_turtle_hot_subject_spills_to_single_statements(spark):
    """r02 ADVICE: a subject with more triples than max_group_rows must
    NOT collect into one aggregated row (executor OOM risk for LDES
    tree:member fan-out) — it spills to separate '<s> <p> o .' lines,
    still valid deterministic Turtle; cold subjects stay grouped."""
    from rml_utils_processor_ts_spark.sinks.nquads import turtle_subject_lines

    rows = [
        ("http://x/stream", "IRI", "http://x/member", f"http://x/m{i}", "IRI", None, None, None, "default")
        for i in range(5)
    ] + [
        ("http://x/a", "IRI", "http://x/p", "v1", "Literal", None, None, None, "default"),
        ("http://x/a", "IRI", "http://x/p", "v2", "Literal", None, None, None, "default"),
    ]
    df = spark.createDataFrame(
        rows,
        "s string, s_termtype string, p string, o string, o_termtype string,"
        " o_datatype string, o_lang string, g string, target_id string",
    )
    lines = {r["line"] for r in turtle_subject_lines(df, max_group_rows=3).collect()}
    # hot subject: 5 single statements
    assert all(f"<http://x/stream> <http://x/member> <http://x/m{i}> ." in lines for i in range(5))
    # cold subject: one grouped line
    assert '<http://x/a> <http://x/p> "v1", "v2" .' in lines
    assert len(lines) == 6
    # default cap keeps everything grouped
    grouped = {r["line"] for r in turtle_subject_lines(df).collect()}
    assert len(grouped) == 2


def test_pom_level_logical_target_routes_union(spark):
    """rml:logicalTarget on an object map (broader RML-target surface
    than the reference's subject-map-only fixtures): that POM's quads
    route to the declared target (a quad with ANY declared target skips
    the default output, per RML-target union semantics); POMs without
    targets stay on the default output."""
    from rml_utils_processor_ts_spark.operators.executor import execute_mapping

    mapping = """
ex:m a rr:TriplesMap ;
    rml:logicalSource [ rml:source "d.json" ; rml:iterator "$.[*]" ;
        rml:referenceFormulation ql:JSONPath ] ;
    rr:subjectMap [ rr:template "http://x/{id}" ] ;
    rr:predicateObjectMap [
        rr:predicateMap [ rr:constant <http://x/p1> ] ;
        rr:objectMap [ rml:reference "a" ;
            rml:logicalTarget [ a rmlt:LogicalTarget ;
                rmlt:serialization formats:N-Triples ;
                rmlt:target [ a void:Dataset ; void:dataDump <file:///side/p1.nt> ] ] ] ] ;
    rr:predicateObjectMap [
        rr:predicateMap [ rr:constant <http://x/p2> ] ;
        rr:objectMap [ rml:reference "b" ] ] .
"""
    doc = '[{"id": "1", "a": "A", "b": "B"}]'
    res = execute_mapping(spark, mapping, {"d.json": "inline:" + doc})
    rows = {(r["p"], r["target_id"]) for r in res.triples.collect()}
    side = next(t for _, t in rows if t != "default")
    assert rows == {("http://x/p1", side), ("http://x/p2", "default")}

    # subject-level target + POM-level target => union: p1 to both
    both = mapping.replace(
        'rr:subjectMap [ rr:template "http://x/{id}" ]',
        'rr:subjectMap [ rr:template "http://x/{id}" ;'
        " rml:logicalTarget [ a rmlt:LogicalTarget ;"
        " rmlt:serialization formats:N-Quads ;"
        " rmlt:target [ a void:Dataset ; void:dataDump <file:///main/all.nq> ] ] ]",
    )
    res2 = execute_mapping(spark, both, {"d.json": "inline:" + doc})
    rows2 = {(r["p"], r["target_id"]) for r in res2.triples.collect()}
    targets_p1 = {t for p, t in rows2 if p == "http://x/p1"}
    targets_p2 = {t for p, t in rows2 if p == "http://x/p2"}
    assert len(targets_p1) == 2 and "default" not in targets_p1
    assert len(targets_p2) == 1 and "default" not in targets_p2


def test_nquads_round_trip(spark, tmp_path):
    """write_nquads -> read_nquads reproduces the triple frame exactly:
    IRIs, blank nodes, language/datatype literals, graphs, and literals
    holding every escaped character class (quote, backslash, newline,
    tab — including the adversarial backslash-then-n data case the
    sentinel unescape exists for)."""
    from rml_utils_processor_ts_spark.sinks import write_nquads
    from rml_utils_processor_ts_spark.sinks.nquads import read_nquads

    rows = [
        ("http://s/1", "IRI", "http://p/a", "http://o/1", "IRI", None, None, "http://g/1", "default"),
        ("b0", "BlankNode", "http://p/a", "plain", "Literal", None, None, None, "default"),
        ("http://s/2", "IRI", "http://p/b", "hallo", "Literal", None, "de", None, "default"),
        ("http://s/2", "IRI", "http://p/c", "5", "Literal",
         "http://www.w3.org/2001/XMLSchema#integer", None, "http://g/1", "default"),
        ("http://s/3", "IRI", "http://p/d", 'quote " back \\ nl \n tab \t', "Literal",
         None, None, None, "default"),
        ("http://s/3", "IRI", "http://p/e", "backslash then n: \\n data", "Literal",
         None, None, None, "default"),
        ("http://s/4", "IRI", "http://p/f", "b1", "BlankNode", None, None, None, "default"),
        # C0 controls round-trip through the writer's \u00XX escapes
        # (r5 VERDICT #6) — including the \b \f pair with ECHAR forms
        ("http://s/5", "IRI", "http://p/g", "bell \x07 bs \x08 ff \x0c esc \x1b end", "Literal",
         None, None, None, "default"),
        # astral literal (surrogate pair on the JVM side) survives raw
        ("http://s/5", "IRI", "http://p/h", "emoji \U0001f600 !", "Literal",
         None, None, None, "default"),
        # blank-node graph label (legal N-Quads; r5 ADVICE)
        ("http://s/6", "IRI", "http://p/i", "in bnode graph", "Literal",
         None, None, "_:g0", "default"),
    ]
    schema = ("s string, s_termtype string, p string, o string, o_termtype string, "
              "o_datatype string, o_lang string, g string, target_id string")
    df = spark.createDataFrame(rows, schema)
    out = str(tmp_path / "rt.nq")
    write_nquads(df, out)
    back = read_nquads(spark, out)
    orig = sorted(tuple(r) for r in df.collect())
    got = sorted(tuple(r) for r in back.collect())
    assert got == orig


def test_parse_nquads_external_uchar_escapes(spark):
    r"""External conformant dumps use UCHAR (\uXXXX / \UXXXXXXXX) and the
    full ECHAR set (\b \f \') — legal N-Triples this writer never emits
    but the reader must ingest (r5 ADVICE). Covers BMP singles, astral
    \U, surrogate PAIRS (two \u escapes = one code point), escaped-
    backslash-then-u data (must NOT decode), and the u-zero escape -> NUL (which parks
    on its own sentinel so the backslash-restore cannot eat it)."""
    from rml_utils_processor_ts_spark.sinks.nquads import parse_nquad_lines

    lines = [
        '<http://s/1> <http://p/x> "A is \\u0041, euro \\u20AC" .',
        '<http://s/2> <http://p/x> "astral \\U0001F600 ." .',
        '<http://s/3> <http://p/x> "pair \\uD83D\\uDE00 ." .',
        '<http://s/4> <http://p/x> "not an escape: \\\\u0041" .',
        '<http://s/5> <http://p/x> "bell\\u0007 bs\\b ff\\f quote\\\' nul\\u0000" .',
        '<http://s/6> <http://p/x> "run \\u0048\\u0049\\u0021" .',
    ]
    df = spark.createDataFrame([(l,) for l in lines], "line string")
    got = {r["s"]: r["o"] for r in parse_nquad_lines(df).collect()}
    assert got["http://s/1"] == "A is A, euro €"
    assert got["http://s/2"] == "astral \U0001F600 ."
    assert got["http://s/3"] == "pair \U0001F600 ."
    assert got["http://s/4"] == "not an escape: \\u0041"
    assert got["http://s/5"] == "bell\x07 bs\x08 ff\x0c quote' nul\x00"
    assert got["http://s/6"] == "run HI!"


def test_trig_lines_and_byte_stable_write(spark, tmp_path):
    from rml_utils_processor_ts_spark.sinks.nquads import trig_graph_lines, write_trig

    rows = [
        ("http://s/1", "IRI", "http://p/a", "x", "Literal", None, None, "http://g/1", "default"),
        ("http://s/1", "IRI", "http://p/a", "y", "Literal", None, None, "http://g/1", "default"),
        ("http://s/1", "IRI", "http://p/b", "http://o/2", "IRI", None, None, "http://g/1", "default"),
        ("http://s/2", "IRI", "http://p/a", "z", "Literal", None, None, None, "default"),
    ]
    schema = ("s string, s_termtype string, p string, o string, o_termtype string, "
              "o_datatype string, o_lang string, g string, target_id string")
    df = spark.createDataFrame(rows, schema)
    lines = sorted(r["line"] for r in trig_graph_lines(df).collect())
    assert lines == [
        '<http://g/1> { <http://s/1> <http://p/a> "x", "y" ; <http://p/b> <http://o/2> . }',
        '<http://s/2> <http://p/a> "z" .',
    ]

    import glob
    import hashlib

    def digest(path):
        h = hashlib.md5()
        for f in sorted(glob.glob(f"{path}/part-*")):
            h.update(open(f, "rb").read())
        return h.hexdigest()

    p1, p2 = str(tmp_path / "t1"), str(tmp_path / "t2")
    write_trig(df, p1)
    write_trig(df, p2)
    assert digest(p1) == digest(p2)


def test_jsonld_lines_valid_and_deterministic(spark):
    """Every line is standalone valid JSON-LD (escaping via to_json);
    IRI vs language vs typed vs plain objects take their compact forms;
    repeated builds emit identical lines."""
    import json as _json

    from rml_utils_processor_ts_spark.sinks.nquads import jsonld_subject_lines

    rows = [
        ("http://s/1", "IRI", "http://p/a", 'x "q" \\ y', "Literal", None, None, "http://g/1", "default"),
        ("http://s/1", "IRI", "http://p/a", "http://o/1", "IRI", None, None, "http://g/1", "default"),
        ("http://s/1", "IRI", "http://p/b", "hi", "Literal", None, "en", "http://g/1", "default"),
        ("http://s/2", "IRI", "http://p/c", "5", "Literal",
         "http://www.w3.org/2001/XMLSchema#integer", None, None, "default"),
        ("b0", "BlankNode", "http://p/d", "b1", "BlankNode", None, None, None, "default"),
    ]
    schema = ("s string, s_termtype string, p string, o string, o_termtype string, "
              "o_datatype string, o_lang string, g string, target_id string")
    df = spark.createDataFrame(rows, schema)
    lines1 = sorted(r["line"] for r in jsonld_subject_lines(df).collect())
    lines2 = sorted(r["line"] for r in jsonld_subject_lines(df).collect())
    assert lines1 == lines2
    docs = [_json.loads(ln) for ln in lines1]
    # named graphs wrap in the spec's graph-object shape:
    # {"@id": g, "@graph": [node]} — @graph takes node objects, and the
    # graph name lives on the enclosing object's @id (ADVICE r5)
    by_id = {}
    for d in docs:
        if "@graph" in d:
            assert isinstance(d["@graph"], list) and len(d["@graph"]) == 1
            node = d["@graph"][0]
            node["__graph"] = d["@id"]
            by_id[node["@id"]] = node
        else:
            by_id[d["@id"]] = d
    assert by_id["http://s/1"]["__graph"] == "http://g/1"
    assert {"@id": "http://o/1"} in by_id["http://s/1"]["http://p/a"]
    assert {"@value": 'x "q" \\ y'} in by_id["http://s/1"]["http://p/a"]
    assert by_id["http://s/1"]["http://p/b"] == [{"@value": "hi", "@language": "en"}]
    assert by_id["http://s/2"]["http://p/c"][0]["@type"].endswith("integer")
    assert "__graph" not in by_id["http://s/2"]
    # blank nodes carry the _: prefix on both ends (ADVICE r5: a bare
    # "b0" @id would read as a relative IRI, not a blank node)
    assert by_id["_:b0"]["http://p/d"] == [{"@id": "_:b1"}]
