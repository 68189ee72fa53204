"""End-to-end golden tests: the reference's own fixture expectations
replayed against our executor.

Golden sets come from programmatic assertions in the reference tests
(exact quad counts + specific quads, /root/reference/test/rml.test.ts:419-431
for the basic mapping, :480-498 for the LDES variant)."""

from fixtures import JSON_DOC, RML_BASIC, RML_JSON, RML_LDES, XML_DOC

from rml_utils_processor_ts_spark.operators.executor import execute_mapping

EX = "http://example.org/"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
GRAPH = "http://example.org/myNamedGraph"


def quad_set(df):
    return {(r["s"], r["p"], r["o"], r["g"]) for r in df.collect()}


def test_basic_mapping_exact_4_quads(spark):
    """≙ 'RML mapping without explicit target' (rml.test.ts:419-431):
    exactly 4 quads, all in the named graph."""
    mapping = RML_BASIC.format(source="dataset/data.xml")
    result = execute_mapping(spark, mapping, {"dataset/data.xml": "inline:" + XML_DOC})
    quads = quad_set(result.triples)
    assert quads == {
        (EX + "001", RDF_TYPE, EX + "Entity", GRAPH),
        (EX + "001", RDFS_LABEL, "some data", GRAPH),
        (EX + "002", RDF_TYPE, EX + "Entity", GRAPH),
        (EX + "002", RDFS_LABEL, "some other data", GRAPH),
    }


def test_ldes_mapping_8_quads_with_versioning(spark):
    """≙ LDES target test (rml.test.ts:480-498): 8 quads; members carry
    dct:isVersionOf links to base IRIs + dct:modified timestamps."""
    mapping = RML_LDES.format(source="dataset/data.xml")
    result = execute_mapping(
        spark, mapping, {"dataset/data.xml": "inline:" + XML_DOC}, version_ts="2024-01-01T00:00:00Z"
    )
    rows = result.triples.collect()
    assert len(rows) == 8
    version_of = {(r["s"], r["o"]) for r in rows if r["p"] == "http://purl.org/dc/terms/isVersionOf"}
    assert (EX + "001#2024-01-01T00:00:00Z", EX + "001") in version_of
    assert (EX + "002#2024-01-01T00:00:00Z", EX + "002") in version_of
    modified = [r for r in rows if r["p"] == "http://purl.org/dc/terms/modified"]
    assert len(modified) == 2
    assert all(r["o_datatype"] == "http://www.w3.org/2001/XMLSchema#dateTime" for r in modified)
    # every member quad uses the version IRI as subject
    assert all(r["s"].endswith("#2024-01-01T00:00:00Z") for r in rows)
    # routed to the declared (non-default) target
    assert result.triples.select("target_id").distinct().count() == 1
    assert rows[0]["target_id"] != "default"


def test_json_mapping_blue_bike(spark):
    """≙ JSON/HTTP API mapping (rml.test.ts:660-688, localized): rdf:type,
    ex:name, ex:availableBikes quads present with datatypes."""
    mapping = RML_JSON.format(source="data.json")
    result = execute_mapping(spark, mapping, {"data.json": "inline:" + JSON_DOC})
    rows = result.triples.collect()
    by_pred = {}
    for r in rows:
        by_pred.setdefault(r["p"], []).append(r)
    assert len(by_pred[RDF_TYPE]) == 2
    names = {(r["s"], r["o"]) for r in by_pred["http://example.org/name"]}
    assert ("https://blue-bike.be/stations/101", "Station A") in names
    bikes = {(r["s"], r["o"]) for r in by_pred["http://example.org/availableBikes"]}
    assert ("https://blue-bike.be/stations/102", "0") in bikes
    ints = [r for r in rows if r["p"] == "http://example.org/availableBikes"]
    assert all(r["o_datatype"] == "http://www.w3.org/2001/XMLSchema#integer" for r in ints)
