"""LDES/target config-axis conformance (round 9, r8 VERDICT #5): the
knobs a real LDES deployment sets on an rmlt:EventStreamTarget —
non-default ldes:timestampPath / ldes:versionOfPath, tree:shape
passthrough, rmlt:ldesGenerateImmutableIRI on/off, rmlt:ldesBaseIRI
stream metadata, and rmlt:serialization variants — on a PLAIN parsed
RML mapping (not the IncRML expansion path, which test_incrml covers).

Reference anchor: the EventStreamTarget surface of
/root/reference/src/rml/incrml.ts:303-338 and the fixture
RML_TM_LOCAL_SOURCE_AND_LDES_TARGET (/root/reference/test/rml.test.ts:84-138).
"""

import glob

import pytest

from rml_utils_processor_ts_spark.operators.executor import PlanExecutor
from rml_utils_processor_ts_spark.plans.rml_parser import parse_mapping
from rml_utils_processor_ts_spark.sinks import write_targets

DCT = "http://purl.org/dc/terms/"
PROV = "http://www.w3.org/ns/prov#"
TREE = "https://w3id.org/tree#"
LDES = "https://w3id.org/ldes#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
TS = "2024-01-01T00:00:00Z"

_DATA = {"d.json": 'inline:[{"id": "1", "v": "a"}]'}


def _mapping(target_block: str) -> str:
    return f"""
ex:m a rr:TriplesMap ;
  rml:logicalSource [ rml:source "d.json" ; rml:iterator "$.[*]" ;
      rml:referenceFormulation ql:JSONPath ] ;
  rr:subjectMap [ rr:template "http://ex.org/e/{{id}}" ;
      rml:logicalTarget [ a rmlt:EventStreamTarget ;
          rmlt:target [ a void:Dataset ; void:dataDump <file:///out.nq> ] ;
          {target_block} ] ] ;
  rr:predicateObjectMap [ rr:predicate ex:val ; rr:objectMap [ rml:reference "v" ] ] .
"""


def _run(spark, target_block: str):
    plan = parse_mapping(_mapping(target_block), _DATA)
    res = PlanExecutor(spark, version_ts=TS).execute(plan)
    return plan, res.triples.collect()


def _by_p(rows):
    out = {}
    for r in rows:
        out.setdefault(r["p"], set()).add((r["s"], r["o"]))
    return out


def test_custom_timestamp_and_version_paths(spark):
    """Non-default ldes:timestampPath / ldes:versionOfPath become the
    member predicates (incrml.ts:303-338 config surface)."""
    _, rows = _run(
        spark,
        'rmlt:ldes [ a ldes:EventStream ; '
        f"ldes:timestampPath <{PROV}generatedAtTime> ; "
        f"ldes:versionOfPath <{DCT}hasVersion> ] ; "
        'rmlt:ldesGenerateImmutableIRI "true"^^xsd:boolean',
    )
    by_p = _by_p(rows)
    member = f"http://ex.org/e/1#{TS}"
    assert (member, TS) in by_p[PROV + "generatedAtTime"]
    assert (member, "http://ex.org/e/1") in by_p[DCT + "hasVersion"]
    # the default predicates are NOT emitted when overridden
    assert DCT + "modified" not in by_p
    assert DCT + "isVersionOf" not in by_p
    assert (member, "a") in by_p["http://example.org/val"]


def test_default_paths_and_immutable_off(spark):
    """Without ldesGenerateImmutableIRI the member keeps its base IRI
    (no '#ts' suffix, no versionOf link) but still carries the
    dct:modified timestamp — the mutable-members LDES mode."""
    _, rows = _run(spark, "rmlt:ldes [ a ldes:EventStream ]")
    by_p = _by_p(rows)
    assert ("http://ex.org/e/1", TS) in by_p[DCT + "modified"]
    assert DCT + "isVersionOf" not in by_p
    assert all(not s.endswith("#" + TS) for s, _ in by_p["http://example.org/val"])


def test_base_iri_shape_and_metadata(spark):
    """rmlt:ldesBaseIRI names the stream: members hang off tree:member,
    and the stream metadata (type, configured timestamp/versionOf paths,
    tree:shape) is emitted once."""
    _, rows = _run(
        spark,
        'rmlt:ldes [ a ldes:EventStream ; '
        f"ldes:timestampPath <{PROV}generatedAtTime> ; "
        f"tree:shape <http://ex.org/shape> ] ; "
        'rmlt:ldesBaseIRI <http://ex.org/stream> ; '
        'rmlt:ldesGenerateImmutableIRI "true"^^xsd:boolean',
    )
    by_p = _by_p(rows)
    stream = "http://ex.org/stream"
    member = f"http://ex.org/e/1#{TS}"
    assert (stream, member) in by_p[TREE + "member"]
    assert (stream, LDES + "EventStream") in by_p[RDF_TYPE]
    assert (stream, "http://ex.org/shape") in by_p[TREE + "shape"]
    # metadata advertises the CONFIGURED paths, not the defaults
    assert (stream, PROV + "generatedAtTime") in by_p[LDES + "timestampPath"]
    assert (stream, DCT + "isVersionOf") in by_p[LDES + "versionOfPath"]


@pytest.mark.parametrize(
    "ser,check",
    [
        ("N-Quads", lambda line: line.endswith(" .") and line.count("<http") >= 2),
        ("N-Triples", lambda line: line.endswith(" .")),
        ("Turtle", lambda line: line.endswith(" .")),
    ],
)
def test_serialization_variants_on_event_stream_target(spark, tmp_path, ser, check):
    """rmlt:serialization on an EventStreamTarget routes the members
    through the matching writer (formats: IRIs, incrml.ts:312)."""
    block = (
        f"rmlt:serialization <http://www.w3.org/ns/formats/{ser}> ; "
        "rmlt:ldes [ a ldes:EventStream ] ; "
        'rmlt:ldesGenerateImmutableIRI "true"^^xsd:boolean'
    )
    doc = _mapping(block).replace("file:///out.nq", f"file://{tmp_path}/out")
    plan = parse_mapping(doc, _DATA)
    res = PlanExecutor(spark, version_ts=TS).execute(plan)
    written = write_targets(res, plan, str(tmp_path))
    assert len(written) == 1
    path = next(iter(written.values()))
    lines = [ln.strip() for f in glob.glob(path + "/part-*")
             for ln in open(f) if ln.strip()]
    member = f"<http://ex.org/e/1#{TS}>"
    assert any(member in ln for ln in lines)
    assert all(check(ln) for ln in lines if not ln.startswith("@"))
    if ser == "N-Quads":
        # versioned member + timestamp + versionOf + the po quad
        assert any("isVersionOf" in ln for ln in lines)


def test_roundtrip_serializes_config_axes():
    """The LDES config axes survive plan -> RML -> plan hash-equal."""
    from rml_utils_processor_ts_spark.plans.serializer import plan_to_rml

    block = (
        'rmlt:serialization <http://www.w3.org/ns/formats/N-Quads> ; '
        "rmlt:ldes [ a ldes:EventStream ; "
        f"ldes:timestampPath <{PROV}generatedAtTime> ; "
        f"ldes:versionOfPath <{DCT}hasVersion> ; "
        "tree:shape <http://ex.org/shape> ] ; "
        "rmlt:ldesBaseIRI <http://ex.org/stream> ; "
        'rmlt:ldesGenerateImmutableIRI "true"^^xsd:boolean'
    )
    plan = parse_mapping(_mapping(block), _DATA)
    lt = plan.triples_maps[0].subject_map.logical_target
    assert lt.ldes_timestamp_path == PROV + "generatedAtTime"
    assert lt.ldes_version_of_path == DCT + "hasVersion"
    assert lt.ldes_shape == "http://ex.org/shape"
    assert lt.ldes_base_iri == "http://ex.org/stream"
    assert lt.ldes_immutable_iri is True
    plan2 = parse_mapping(plan_to_rml(plan), _DATA)
    assert plan.plan_hash() == plan2.plan_hash()
