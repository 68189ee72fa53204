"""MappingPlan -> RML Turtle serializer: round-trip (parse . serialize
== identity under plan_hash) across the term-map/join/target surface,
plus the reference's Y2R string-level contract."""

from fixtures import RML_STATEFUL
from pyspark.sql import functions as F

from rml_utils_processor_ts_spark.operators.executor import PlanExecutor
from rml_utils_processor_ts_spark.plans.rml_parser import parse_mapping
from rml_utils_processor_ts_spark.plans.serializer import plan_to_rml, yarrrml2rml
from rml_utils_processor_ts_spark.plans.yarrrml import yarrrml_to_plan


def _roundtrip(mapping: str, bindings=None) -> None:
    plan = parse_mapping(mapping, bindings)
    ttl = plan_to_rml(plan)
    plan2 = parse_mapping(ttl)
    assert plan.plan_hash() == plan2.plan_hash(), ttl


def test_roundtrip_basic_projection():
    _roundtrip(
        """
ex:m a rr:TriplesMap ;
    rml:logicalSource [ rml:source "table:/root/testdata/sf0.001/customer.parquet" ;
        rml:referenceFormulation <urn:rml-spark:ql/Table> ] ;
    rr:subjectMap [ rr:template "http://x/c/{c_custkey}" ; rr:class <http://x/C> ;
        rr:graphMap [ rr:constant "http://x/g" ] ] ;
    rr:predicateObjectMap [
        rr:predicateMap [ rr:constant rdfs:label ] ;
        rr:objectMap [ rml:reference "c_name" ; rr:termType rr:Literal ;
            rr:datatype xsd:string ] ] .
"""
    )


def test_roundtrip_join_and_query():
    _roundtrip(
        """
ex:parent a rr:TriplesMap ;
    rml:logicalSource [ rml:source "table:/root/testdata/sf0.001/customer.parquet" ;
        rml:query "SELECT c_custkey FROM customer WHERE c_custkey < 10" ;
        rml:referenceFormulation <urn:rml-spark:ql/Table> ] ;
    rr:subjectMap [ rr:template "http://x/c/{c_custkey}" ] ;
    rr:predicateObjectMap [
        rr:predicateMap [ rr:constant rdfs:label ] ;
        rr:objectMap [ rml:reference "c_custkey" ] ] .

ex:child a rr:TriplesMap ;
    rml:logicalSource [ rml:source "table:/root/testdata/sf0.001/orders.parquet" ;
        rml:referenceFormulation <urn:rml-spark:ql/Table> ] ;
    rr:subjectMap [ rr:template "http://x/o/{o_orderkey}" ] ;
    rr:predicateObjectMap [
        rr:predicateMap [ rr:constant <http://x/ns/placedBy> ] ;
        rr:objectMap [
            rr:parentTriplesMap ex:parent ;
            rml:joinCondition [ fnml:functionValue [
                rr:predicateObjectMap [ rr:predicate fno:executes ; rr:objectMap [ rr:constant idlab-fn:equal ] ] ;
                rr:predicateObjectMap [ rr:predicate grel:valueParameter ; rr:objectMap [ rml:reference "o_custkey" ] ] ;
                rr:predicateObjectMap [ rr:predicate grel:valueParameter2 ; rr:objectMap [ rr:parentTermMap [ rml:reference "c_custkey" ] ] ]
            ] ]
        ] ] .
"""
    )


def test_roundtrip_stateful_function_subject():
    """The IncRML-generated shape: FnO FunctionTermMap subject with
    nested function parameters survives serialization."""
    plan = parse_mapping(
        RML_STATEFUL.format(source="dataset/data.xml"),
        {"dataset/data.xml": "inline:<resource/>"},
    )
    ttl = plan_to_rml(plan)
    plan2 = parse_mapping(ttl)
    assert plan.plan_hash() == plan2.plan_hash(), ttl


def test_yarrrml2rml_string_contract(spark):
    """Reference Y2R parity at string level (yarrrml.ts:5-22): YARRRML
    in, RML Turtle out — and the emitted document EXECUTES identically
    to the directly-compiled plan."""
    doc = """
prefixes:
    ex: "http://example.org/"
mappings:
    stations:
        sources: [["s.json~jsonpath", "$.[*]"]]
        s: ex:s/$(id)
        po:
            - [ex:name, $(name)]
"""
    bindings = {"s.json": 'inline:[{"id": "1", "name": "A"}, {"id": "2", "name": "B"}]'}
    ttl = yarrrml2rml(doc, bindings)
    assert "rr:TriplesMap" in ttl and "rml:logicalSource" in ttl

    direct = PlanExecutor(spark).execute(yarrrml_to_plan(doc, bindings))
    via_rml = PlanExecutor(spark).execute(parse_mapping(ttl))
    a = {tuple(r) for r in direct.triples.collect()}
    b = {tuple(r) for r in via_rml.triples.collect()}
    assert a == b and len(a) == 2


def test_roundtrip_ldes_target():
    mapping = """
ex:m a rr:TriplesMap ;
    rml:logicalSource [ rml:source "table:/root/testdata/sf0.001/customer.parquet" ;
        rml:referenceFormulation <urn:rml-spark:ql/Table> ] ;
    rr:subjectMap [ rr:template "http://x/c/{c_custkey}" ;
        rml:logicalTarget ex:t1 ] ;
    rr:predicateObjectMap [
        rr:predicateMap [ rr:constant rdfs:label ] ;
        rr:objectMap [ rml:reference "c_name" ] ] .

ex:t1 a rmlt:EventStreamTarget ;
    rmlt:target [ a void:Dataset ; void:dataDump <file:///out.nq> ] ;
    rmlt:serialization <http://www.w3.org/ns/formats/N-Quads> ;
    rmlt:ldes [ <https://w3id.org/ldes#timestampPath> <http://purl.org/dc/terms/modified> ] ;
    rmlt:ldesGenerateImmutableIRI "true" .
"""
    plan = parse_mapping(mapping)
    ttl = plan_to_rml(plan)
    plan2 = parse_mapping(ttl)
    assert plan.plan_hash() == plan2.plan_hash(), ttl
    lt = plan2.triples_maps[0].subject_map.logical_target
    assert lt is not None and lt.is_ldes and lt.ldes_immutable_iri
    assert lt.location == "file:///out.nq"
    assert lt.ldes_timestamp_path == "http://purl.org/dc/terms/modified"


def test_rml2incrml_string_contract(spark, tmp_path):
    """Reference IncRMLTransformer parity at string level
    (incrml.ts:67-79): plain RML in, CDC-expanded RML out — the emitted
    document re-parses AND its stateful mapping executes a first
    snapshot as all-Create, matching the directly-expanded plan."""
    from rml_utils_processor_ts_spark.operators.cdc import StateStore
    from rml_utils_processor_ts_spark.plans.incrml import IncRMLConfig, expand_to_incrml
    from rml_utils_processor_ts_spark.plans.serializer import rml2incrml

    doc = """
ex:m a rr:TriplesMap ;
    rml:logicalSource [ rml:source "dataset/data.xml" ;
        rml:iterator "//data" ; rml:referenceFormulation ql:XPath ] ;
    rr:subjectMap [ rr:template "http://example.org/{@id}" ] ;
    rr:predicateObjectMap [
        rr:predicateMap [ rr:constant rdfs:label ] ;
        rr:objectMap [ rml:reference "@label" ] ] .
"""
    bindings = {
        "dataset/data.xml": 'inline:<resource><data id="001" label="x"/><data id="002" label="y"/></resource>'
    }
    cfg = IncRMLConfig(state_base_path=str(tmp_path / "st"))
    ttl = rml2incrml(doc, cfg, bindings)
    assert "explicitCreate" in ttl and "implicitDelete" in ttl

    direct = expand_to_incrml(parse_mapping(doc, bindings), cfg)
    replayed = parse_mapping(ttl)
    assert direct.plan_hash() == replayed.plan_hash(), ttl

    store = StateStore(spark, str(tmp_path / "store"))
    res = PlanExecutor(spark, state_store=store).execute(replayed)
    creates = {
        r["s"]
        for r in res.triples.collect()
        if r["p"].endswith("lifeCycleType") and r["o"].endswith("Create")
    }
    assert creates == {"http://example.org/001", "http://example.org/002"}


def test_round_trip_pom_graph_map_and_language_map():
    """Round-6 surface: POM-level rr:graphMap and rml:languageMap
    serialize and re-parse hash-equal (the serializer contract)."""
    from rml_utils_processor_ts_spark.plans.rml_parser import parse_mapping
    from rml_utils_processor_ts_spark.plans.serializer import plan_to_rml

    doc = """
ex:m a rr:TriplesMap ;
  rml:logicalSource [ rml:source "d.json" ; rml:iterator "$.[*]" ;
      rml:referenceFormulation ql:JSONPath ] ;
  rr:subjectMap [ rr:template "http://ex.org/{id}" ; rr:graph ex:sg ] ;
  rr:predicateObjectMap [
      rr:predicate ex:t ;
      rr:objectMap [ rml:reference "v" ; rml:languageMap [ rml:reference "l" ] ] ;
      rr:graphMap [ rr:template "http://ex.org/pg/{id}" ] ] .
"""
    plan = parse_mapping(doc)
    pom = plan.triples_maps[0].predicate_object_maps[0]
    assert pom.graph_map is not None and pom.graph_map.template is not None
    assert pom.object.language_map is not None
    rt = parse_mapping(plan_to_rml(plan))
    assert rt.plan_hash() == plan.plan_hash()


def test_roundtrip_template_with_escaped_braces():
    """r7: templates carrying the R2RML escape forms (literal braces and
    backslashes) survive serialize->reparse — the serializer must emit
    the fully-escaped short literal form, since Turtle ECHAR-decodes
    backslashes even inside triple-quoted long strings."""
    _roundtrip(
        """
ex:m a rr:TriplesMap ;
    rml:logicalSource [ rml:source "d.csv" ; rml:referenceFormulation ql:CSV ] ;
    rr:subjectMap [ rr:template "http://x/c/{id}" ] ;
    rr:predicateObjectMap [
        rr:predicateMap [ rr:constant rdfs:label ] ;
        rr:objectMap [ rr:template "\\\\{{v}\\\\}" ; rr:termType rr:Literal ] ] .
"""
    )


def test_inverse_expression_round_trips():
    """r7: rr:inverseExpression (R2RML §7.7) parses and re-serializes —
    vocabulary completeness; execution is a documented no-op (the
    DataFrame engine resolves referencing maps by equi-join, and
    RMLMapper likewise ignores the hint)."""
    mapping = """
ex:m a rr:TriplesMap ;
    rml:logicalSource [ rml:source "d.csv" ; rml:referenceFormulation ql:CSV ] ;
    rr:subjectMap [ rr:template "http://x/d/{deptno}" ;
        rr:inverseExpression "DEPTNO = substr({ID}, 5)" ] .
"""
    plan = parse_mapping(mapping)
    tm = plan.triples_maps[0].subject_map.term_map
    assert tm.inverse_expression == "DEPTNO = substr({ID}, 5)"
    rt = parse_mapping(plan_to_rml(plan))
    assert rt.triples_maps[0].subject_map.term_map.inverse_expression == tm.inverse_expression
