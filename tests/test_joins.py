"""Referencing-object-map join tests ≙ F5 / POM_JOIN fixture
(/root/reference/test/incrml.test.ts:136-177): a join triple exists iff
child expr equals parent expr."""

from fixtures import RML_JOIN

from rml_utils_processor_ts_spark.operators.executor import execute_mapping

CHILD_XML = """<root>
    <Data id="c1"><Property Value="k1"/></Data>
    <Data id="c2"><Property Value="k2"/></Data>
    <Data id="c3"><Property Value="nomatch"/></Data>
</root>"""

PARENT_XML = """<root>
    <Data id="p1"><Property1 Value="k1"/></Data>
    <Data id="p2"><Property1 Value="k2"/></Data>
    <Data id="p3"><Property1 Value="k9"/></Data>
</root>"""


def test_join_pom_inner_equi_semantics(spark):
    mapping = RML_JOIN.format(parent_source="p.xml", child_source="c.xml")
    result = execute_mapping(
        spark,
        mapping,
        {"p.xml": "inline:" + PARENT_XML, "c.xml": "inline:" + CHILD_XML},
    )
    joins = {
        (r["s"], r["o"])
        for r in result.triples.collect()
        if r["p"] == "http://ex.org/ns/joinProperty"
    }
    assert joins == {
        ("http://ex.org/child/c1", "http://ex.org/parent/p1"),
        ("http://ex.org/child/c2", "http://ex.org/parent/p2"),
    }
    # join objects are IRIs (the parent subject)
    ttypes = {
        r["o_termtype"]
        for r in result.triples.collect()
        if r["p"] == "http://ex.org/ns/joinProperty"
    }
    assert ttypes == {"IRI"}
