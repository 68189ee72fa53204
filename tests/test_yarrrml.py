"""YARRRML front-end tests ≙ /root/reference/test/yarrrml.test.ts:8-37:
the fixture doc compiles to a plan with LogicalSource / TriplesMap /
SubjectMap / PredicateObjectMap / GraphMap, and executes end-to-end."""

from rml_utils_processor_ts_spark.operators.executor import PlanExecutor
from rml_utils_processor_ts_spark.plans.yarrrml import yarrrml_to_plan

YARRRML_DOC = """
prefixes:
    ex: "http://example.org/"
    rdfs: "http://www.w3.org/2000/01/rdf-schema#"

mappings:
    test-mapping:
        sources:
            - ["dataset/data.xml~xpath", "//data"]
        s: ex:$(@id)
        po:
            - [a, ex:Entity]
            - [rdfs:label, $(@label)]
        graph: ex:myNamedGraph
"""

XML_DOC = """<resource>
    <data id="001" label="some data"></data>
    <data id="002" label="some other data"></data>
</resource>"""


def test_yarrrml_compiles_to_full_plan():
    plan = yarrrml_to_plan(YARRRML_DOC)
    assert len(plan.triples_maps) == 1
    tm = plan.triples_maps[0]
    assert tm.logical_source.kind == "xpath"
    assert tm.logical_source.iterator == "//data"
    assert tm.subject_map.term_map.template == "http://example.org/{@id}"
    assert tm.subject_map.graph_map.constant == "http://example.org/myNamedGraph"
    assert len(tm.predicate_object_maps) == 2
    assert tm.predicate_object_maps[0].predicate.constant.endswith("#type")
    assert tm.predicate_object_maps[1].object.reference == "@label"


def test_yarrrml_executes_same_golden_4_quads(spark):
    """The YARRRML path must produce the same 4 quads as the RML path
    (rml.test.ts:419-431 golden)."""
    plan = yarrrml_to_plan(YARRRML_DOC, {"dataset/data.xml": "inline:" + XML_DOC})
    res = PlanExecutor(spark).execute(plan)
    quads = {(r["s"], r["p"], r["o"], r["g"]) for r in res.triples.collect()}
    EX = "http://example.org/"
    assert quads == {
        (EX + "001", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", EX + "Entity", EX + "myNamedGraph"),
        (EX + "001", "http://www.w3.org/2000/01/rdf-schema#label", "some data", EX + "myNamedGraph"),
        (EX + "002", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", EX + "Entity", EX + "myNamedGraph"),
        (EX + "002", "http://www.w3.org/2000/01/rdf-schema#label", "some other data", EX + "myNamedGraph"),
    }


def test_yarrrml_join_mapping(spark):
    doc = """
prefixes:
    ex: "http://example.org/"
mappings:
    child:
        sources: [["c.json~jsonpath", "$.[*]"]]
        s: ex:child/$(id)
        po:
            - p: ex:linked
              o:
                mapping: parent
                condition:
                    function: equal
                    parameters:
                        - [str1, $(pid)]
                        - [str2, $(id)]
    parent:
        sources: [["p.json~jsonpath", "$.[*]"]]
        s: ex:parent/$(id)
        po:
            - [ex:name, $(name)]
"""
    child_json = '[{"id": "1", "pid": "10"}, {"id": "2", "pid": "99"}]'
    parent_json = '[{"id": "10", "name": "X"}, {"id": "11", "name": "Y"}]'
    plan = yarrrml_to_plan(
        doc, {"c.json": "inline:" + child_json, "p.json": "inline:" + parent_json}
    )
    res = PlanExecutor(spark).execute(plan)
    links = {
        (r["s"], r["o"])
        for r in res.triples.collect()
        if r["p"] == "http://example.org/linked"
    }
    assert links == {("http://example.org/child/1", "http://example.org/parent/10")}
