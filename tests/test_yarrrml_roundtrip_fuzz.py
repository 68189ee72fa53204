"""YARRRML round-trip fuzz (round 9): hypothesis-generated YARRRML
docs -> plan -> RML Turtle -> re-parsed plan, `plan_hash` equality
asserted.

The `yarrrml2rml` string contract promises that the emitted Turtle
re-parses hash-equal (COVERAGE.md r4 row); round 9 widened the YARRRML
surface (dynamic language maps, fn-object annotations, document base,
po graphs, targets) and each widening so far was spot-tested with one
hand-written doc. This fuzz closes the gap generatively: any feature
the YARRRML parser accepts but the serializer round-trips lossily
breaks the hash equality here. Pure parser-level — no Spark session.

Spot checks beyond the hash: the plan must contain the expected number
of TriplesMaps and at least one POM per mapping.
"""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rml_utils_processor_ts_spark.plans.rml_parser import parse_mapping
from rml_utils_processor_ts_spark.plans.serializer import plan_to_rml
from rml_utils_processor_ts_spark.plans.yarrrml import yarrrml_to_plan

_REFS = ["id", "name", "lang", "dt"]
_PRED = ["ex:p1", "ex:p2", "foaf:name"]

# po VALUE variants: (yaml fragment builder, needs_quote)
_po_value = st.sampled_from([
    "$(name)",
    "$(name)~iri",
    "constant text",
    "ex:constIri",
])
_po_lang3 = st.sampled_from(["en~lang", "en-US~lang", "$(lang)~lang"])


@st.composite
def _po_entry(draw):
    kind = draw(st.integers(0, 5))
    pred = draw(st.sampled_from(_PRED))
    if kind == 0:  # two-element list
        return f"            - [{pred}, {draw(_po_value)}]"
    if kind == 1:  # three-element list with language shorthand
        return f"            - [{pred}, $(name), {draw(_po_lang3)}]"
    if kind == 2:  # object dict with datatype / language / type
        extra = draw(st.sampled_from(
            ["datatype: xsd:string", "datatype: xsd:integer",
             "language: en", "language: $(lang)", "type: iri"]))
        return (f"            - p: {pred}\n"
                f"              o:\n"
                f"                  value: $(name)\n"
                f"                  {extra}")
    if kind == 3:  # po-level graph shortcuts
        gkey = draw(st.sampled_from(["g", "graph", "graphs"]))
        return (f"            - p: {pred}\n"
                f"              o: $(name)\n"
                f"              {gkey}: ex:g1")
    if kind == 4:  # FnO function object with optional annotation
        ann = draw(st.sampled_from(["", "\n                  datatype: xsd:string",
                                    "\n                  language: en"]))
        return (f"            - p: {pred}\n"
                f"              o:\n"
                f"                  function: grel:toUpperCase\n"
                f"                  parameters: [[value, $(name)]]{ann}")
    # condition-free multi-object list
    return f"            - [{pred}, [$(name), $(id)]]"


@st.composite
def _mapping_block(draw, name):
    subject = draw(st.sampled_from(
        ["ex:$(id)", "http://example.org/x/$(id)", "ex:fixed/$(name)"]))
    pos = draw(st.lists(_po_entry(), min_size=1, max_size=3))
    graph = draw(st.sampled_from(["", "        graphs: ex:mg1\n"]))
    body = (f"    {name}:\n"
            f"        sources: [[\"d.json~jsonpath\", \"$.[*]\"]]\n"
            f"        s: {subject}\n"
            f"{graph}"
            f"        po:\n" + "\n".join(pos))
    return body


@st.composite
def _yarrrml_doc(draw):
    n = draw(st.integers(1, 2))
    blocks = [draw(_mapping_block(f"m{i}")) for i in range(n)]
    base = draw(st.sampled_from(["", "base: http://base.example/\n"]))
    doc = (
        "prefixes:\n"
        "    ex: \"http://example.org/\"\n"
        "    foaf: \"http://xmlns.com/foaf/0.1/\"\n"
        + base +
        "mappings:\n" + "\n".join(blocks)
    )
    return doc, n


_BINDINGS = {"d.json": 'inline:[{"id":"1","name":"x","lang":"fr","dt":"d"}]'}


@pytest.mark.property
@settings(max_examples=60, deadline=None)
@given(doc_n=_yarrrml_doc())
def test_yarrrml_roundtrip_hash_equal(doc_n):
    doc, n = doc_n
    plan = yarrrml_to_plan(doc, _BINDINGS)
    assert len(plan.triples_maps) >= n
    assert all(tm.predicate_object_maps for tm in plan.triples_maps)
    ttl = plan_to_rml(plan)
    plan2 = parse_mapping(ttl, _BINDINGS)
    assert plan.plan_hash() == plan2.plan_hash(), (
        f"round-trip hash mismatch\ndoc:\n{doc}\nttl:\n{ttl}"
    )
