"""Differential fuzz: hypothesis-generated RML mappings executed by BOTH
the Spark engine and the independent naive evaluator (tests/naive_rml.py),
quad-set equality asserted.

This attacks the transcription-bias risk in the re-authored conformance
suite (VERDICT r8 "What's missing" #1): the naive evaluator implements
R2RML/RML term-generation semantics directly from the spec text over
dict records, so a spec misreading must be made twice independently to
escape. The generated grammar covers: term-map kinds (constant /
reference / template with escape grammar) x positions x explicit
rr:termType overrides, IRI-safe template encoding, IRI data-error drops
(invalid constants, reference-valued IRIs, schemeless templates), XSD
canonical forms (boolean/integer/decimal/double), language tags, class
triples, subject- and POM-level graph maps with the §11.1 union,
referencing-object-map joins (equi-join, multi-condition, same-row
condition-less §11) and null join keys, multi-TriplesMap docs over
shared sources (the engine's fusion path), and set-dedup. Round 9
additions: data-derived rml:languageMap (null -> plain literal,
ill-formed tag -> quad drop) and rml:datatypeMap (runtime-CASE
canonicalization), §6.3 predicate/object lists (m x n cross product),
and multi-predicate JOIN POMs (the grouped single-join compile).

First catch (pre-wiring probe): a template PREDICATE with a null
reference emitted a quad with p = NULL instead of no triple —
fixed in operators/executor.py (R2RML §11.1).
"""

import json

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from naive_rml import evaluate as naive_evaluate

_XSD = "http://www.w3.org/2001/XMLSchema#"

REFS = ["k0", "k1", "k2"]
GOOD_IRIS = ["http://ex.org/a", "http://ex.org/b", "https://w.org/c#d"]
BAD_IRIS = ["relative/x", "0scheme:x"]
CLASSES = ["http://ex.org/C1", "http://ex.org/C2"]
GRAPH_IRIS = ["http://g.org/g1", "http://g.org/g2"]

# data alphabet: ASCII specials, controls, C1, iunreserved unicode,
# percent signs, braces, quotes, backslashes — the IRI-encode and
# JSON-coercion hot zones (surrogates excluded: not representable)
_special = st.sampled_from(
    ["", " ", "a b", "%20", "{x}", "\\", '"', "\n", "\t", "\x7f",
     "\x85", "\u0094", "\u00a0", "é", "中", "\U0001f600", "~tilde*star+plus",
     "x/y?q=1&r=2#f", "ALLCAPS", "00", "-0"]
)
_numericish = st.sampled_from(
    ["0", "1", "007", "-0", "+42", "20.0", "0.005", "-0.0", "1e3",
     "1E-2", ".5", "5.", "true", "false", "TRUE", "INF", "NaN", "abc"]
)
_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",),
                           blacklist_characters="\x00",
                           max_codepoint=0xD7FF),
    max_size=6,
)
# language-tag-ish and datatype-IRI values so the languageMap /
# datatypeMap branches bite (valid tags, ill-formed tags, subtag
# over the BCP47 8-char bound, canonicalizable + custom datatypes)
_mapish = st.sampled_from(
    ["en", "en-US", "fr-CA", "de-DE-1996", "x", "not a tag",
     "abcdefghi", "en_US", _XSD + "integer", _XSD + "boolean",
     _XSD + "decimal", _XSD + "double", _XSD + "string",
     "http://ex.org/customtype"]
)
_value = st.one_of(
    st.none(), _special, _numericish, _text, _mapish,
    st.integers(-10**9, 10**9), st.booleans(),
)
_record = st.dictionaries(st.sampled_from(REFS), _value, max_size=3)
_records = st.lists(_record, min_size=0, max_size=4)


def _term(kind, value, termtype=None, datatype=None, language=None,
          language_map=None, datatype_map=None):
    return {"kind": kind, "value": value, "termtype": termtype,
            "datatype": datatype, "language": language,
            "language_map": language_map, "datatype_map": datatype_map}


_subject_term = st.one_of(
    st.builds(_term, st.just("template"),
              st.sampled_from(["http://s.org/{k0}", "http://s.org/{k0}/{k1}",
                               "noscheme/{k0}", "http://s.org/a b/{k0}",
                               "http://s.org/\\{esc\\}/{k0}"])),
    st.builds(_term, st.just("reference"), st.sampled_from(REFS),
              st.just("IRI")),
    st.builds(_term, st.just("template"), st.just("b{k0}"),
              st.just("BlankNode")),
    st.builds(_term, st.just("constant_iri"), st.sampled_from(GOOD_IRIS)),
)
_predicate_term = st.one_of(
    st.builds(_term, st.just("constant_iri"),
              st.sampled_from(GOOD_IRIS + BAD_IRIS)),
    st.builds(_term, st.just("template"), st.just("http://p.org/{k1}")),
    st.builds(_term, st.just("reference"), st.sampled_from(REFS)),
)
_object_term = st.one_of(
    st.builds(_term, st.just("reference"), st.sampled_from(REFS),
              st.none(),
              st.sampled_from([None, _XSD + "string", _XSD + "integer",
                               _XSD + "boolean", _XSD + "decimal",
                               _XSD + "double"]),
              st.none()),
    st.builds(_term, st.just("reference"), st.sampled_from(REFS),
              st.none(), st.none(), st.sampled_from(["en", "en-US"])),
    st.builds(_term, st.just("reference"), st.sampled_from(REFS),
              st.sampled_from(["IRI", "BlankNode", "Literal"])),
    st.builds(_term, st.just("template"),
              st.sampled_from(["http://o.org/{k0}", "o-{k0}-{k1}",
                               "lit \\{x\\} {k2}"]),
              st.sampled_from([None, "Literal"])),
    st.builds(_term, st.just("constant_lit"),
              st.sampled_from(["plain value", "x y", "12"])),
    st.builds(_term, st.just("constant_iri"),
              st.sampled_from(GOOD_IRIS + BAD_IRIS)),
    # data-derived language tag (rml:languageMap): null -> plain
    # literal, ill-formed tag -> quad drops
    st.builds(_term, st.just("reference"), st.sampled_from(REFS),
              language_map=st.sampled_from(REFS)),
    # data-derived datatype (rml:datatypeMap): the record value IS
    # o_datatype; canonicalization becomes a runtime CASE
    st.builds(_term, st.just("reference"), st.sampled_from(REFS),
              datatype_map=st.sampled_from(REFS)),
)
_subject_graph = st.one_of(
    st.none(),
    st.builds(_term, st.just("constant_iri"), st.sampled_from(GRAPH_IRIS)),
    st.builds(_term, st.just("template"),
              st.sampled_from(["http://g.org/{k0}", "nogscheme{k0}"])),
)
_pom_graph = st.one_of(
    st.none(),
    st.builds(_term, st.just("constant_iri"), st.sampled_from(GRAPH_IRIS)),
    # template POM graphs: a null reference drops that graph COPY while
    # a subject-graph copy survives — engine choice probed directly
    # (r9) and mirrored in naive_rml._graphs_for
    st.builds(_term, st.just("template"),
              st.sampled_from(["http://g.org/{k1}", "badg {k0}"])),
)


@st.composite
def _plain_pom(draw):
    # ~half the POMs carry §6.3 predicate/object LISTS (the POM's
    # triples are the m x n cross product)
    if draw(st.booleans()):
        return {"predicates": draw(st.lists(_predicate_term, min_size=1,
                                            max_size=2)),
                "objects": draw(st.lists(_object_term, min_size=1,
                                         max_size=2)),
                "graph": draw(_pom_graph), "join": None}
    return {"predicate": draw(_predicate_term), "object": draw(_object_term),
            "graph": draw(_pom_graph), "join": None}


@st.composite
def _mapping_spec(draw):
    n_sources = draw(st.integers(1, 2))
    sources = {f"s{i}": draw(_records) for i in range(n_sources)}
    n_tms = draw(st.integers(1, 3))
    tms = []
    for i in range(n_tms):
        classes = draw(st.lists(st.sampled_from(CLASSES), max_size=2,
                                unique=True))
        poms = draw(st.lists(_plain_pom(), max_size=2))
        if not poms and not classes:
            poms = [draw(_plain_pom())]
        tms.append({
            "name": f"tm{i}",
            "source": draw(st.sampled_from(sorted(sources))),
            "subject": draw(_subject_term),
            "classes": classes,
            "graph": draw(_subject_graph),
            "poms": poms,
        })
    if n_tms >= 2 and draw(st.booleans()):
        # referencing object map: tm0 -> last tm
        parent = n_tms - 1
        same_source = tms[0]["source"] == tms[parent]["source"]
        if same_source and draw(st.booleans()):
            conditions = []  # §11 condition-less same-row form
        else:
            conditions = draw(st.lists(
                st.tuples(st.sampled_from(REFS), st.sampled_from(REFS)),
                min_size=1, max_size=2))
        # multi-predicate join POMs exercise the grouped single-join
        # compile (one child x parent join, per-variant payload)
        join_preds = [_term("constant_iri", "http://ex.org/ref")]
        if draw(st.booleans()):
            join_preds.append(_term("constant_iri", "http://ex.org/ref2"))
        tms[0]["poms"].append({
            "predicates": join_preds,
            "object": None,
            "graph": draw(_pom_graph),
            "join": {"parent": parent, "conditions": conditions},
        })
    return {"sources": sources, "tms": tms}


# ---- spec -> RML Turtle renderer -------------------------------------------


def _ttl_esc(s: str) -> str:
    return (s.replace("\\", "\\\\").replace('"', '\\"')
            .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t"))


def _render_term(t: dict) -> str:
    k = t["kind"]
    if k == "constant_iri":
        parts = [f'rr:constant <{t["value"]}>']
    elif k == "constant_lit":
        parts = [f'rr:constant "{_ttl_esc(t["value"])}"']
    elif k == "reference":
        parts = [f'rml:reference "{_ttl_esc(t["value"])}"']
    else:
        parts = [f'rr:template "{_ttl_esc(t["value"])}"']
    if t.get("termtype"):
        parts.append(f'rr:termType rr:{t["termtype"]}')
    if t.get("datatype"):
        parts.append(f'rr:datatype <{t["datatype"]}>')
    if t.get("language"):
        parts.append(f'rr:language "{t["language"]}"')
    if t.get("language_map"):
        parts.append(
            f'rml:languageMap [ rml:reference "{_ttl_esc(t["language_map"])}" ]'
        )
    if t.get("datatype_map"):
        parts.append(
            f'rml:datatypeMap [ rml:reference "{_ttl_esc(t["datatype_map"])}" ]'
        )
    return " ; ".join(parts)


def render_mapping(spec: dict) -> tuple[str, dict[str, str]]:
    blocks = []
    for tm in spec["tms"]:
        head = [
            f'ex:{tm["name"]} a rr:TriplesMap ;',
            f'  rml:logicalSource [ rml:source "{tm["source"]}.json" ; '
            'rml:iterator "$.[*]" ; rml:referenceFormulation ql:JSONPath ] ;',
        ]
        s_parts = [_render_term(tm["subject"])]
        s_parts += [f"rr:class <{c}>" for c in tm["classes"]]
        if tm.get("graph"):
            s_parts.append(f'rr:graphMap [ {_render_term(tm["graph"])} ]')
        head.append(f'  rr:subjectMap [ {" ; ".join(s_parts)} ]')
        pom_lines = []
        for pom in tm["poms"]:
            pred_specs = pom.get("predicates") or [pom["predicate"]]
            p = " ; ".join(
                f"rr:predicateMap [ {_render_term(ps)} ]" for ps in pred_specs
            )
            if pom["join"] is not None:
                parent = spec["tms"][pom["join"]["parent"]]["name"]
                conds = "".join(
                    f' ; rr:joinCondition [ rr:child "{c}" ; rr:parent "{pr}" ]'
                    for c, pr in pom["join"]["conditions"]
                )
                o = f"rr:objectMap [ rr:parentTriplesMap ex:{parent}{conds} ]"
            else:
                obj_specs = pom.get("objects") or [pom["object"]]
                o = " ; ".join(
                    f"rr:objectMap [ {_render_term(os_)} ]" for os_ in obj_specs
                )
            g = (f' ; rr:graphMap [ {_render_term(pom["graph"])} ]'
                 if pom.get("graph") else "")
            pom_lines.append(f"  rr:predicateObjectMap [ {p} ; {o}{g} ]")
        blocks.append(" ;\n".join(head + pom_lines) + " .")
    bindings = {
        f"{name}.json": "inline:" + json.dumps(records, ensure_ascii=False)
        for name, records in spec["sources"].items()
    }
    return "\n\n".join(blocks), bindings


def _engine_quads(spark, spec: dict) -> set[tuple]:
    from rml_utils_processor_ts_spark.operators.executor import execute_mapping

    doc, bindings = render_mapping(spec)
    result = execute_mapping(spark, doc, bindings)
    return {tuple(r) for r in result.triples.collect()}


def _assert_equal(spark, spec: dict) -> None:
    got = _engine_quads(spark, spec)
    want = naive_evaluate(spec)
    assert got == want, (
        f"engine-only: {sorted(got - want)!r}\n"
        f"naive-only: {sorted(want - got)!r}\n"
        f"spec: {spec!r}"
    )


# ---- seeded regression corpus ----------------------------------------------

_REC = [{"k0": "a", "k1": "x", "k2": "1"}, {"k0": "b"}, {"k1": " é%"}, {}]


def _spec(subject, poms, *, classes=(), graph=None, sources=None, extra_tms=()):
    tms = [{"name": "tm0", "source": "s0", "subject": subject,
            "classes": list(classes), "graph": graph, "poms": poms}]
    tms += list(extra_tms)
    return {"sources": sources or {"s0": _REC}, "tms": tms}


CORPUS = {
    # the pre-wiring catch: null template predicate must drop the quad
    "null_template_predicate": _spec(
        _term("template", "http://s.org/{k0}"),
        [{"predicate": _term("template", "http://p.org/{k1}"),
          "object": _term("reference", "k0"), "graph": None, "join": None}],
    ),
    "iri_encode_specials": _spec(
        _term("template", "http://s.org/{k1}"),
        [{"predicate": _term("constant_iri", "http://ex.org/a"),
          "object": _term("template", "http://o.org/{k1}"),
          "graph": None, "join": None}],
        sources={"s0": [{"k1": v} for v in
                        ["a b", "%20", "é", "\x85", "\u00a0", "中",
                         "\U0001f600", "~*+", "{x}", "\\", '"', "\n"]]},
    ),
    "xsd_canonical_forms": _spec(
        _term("template", "http://s.org/{k0}"),
        [{"predicate": _term("constant_iri", "http://ex.org/a"),
          "object": _term("reference", "k1", None, _XSD + dt),
          "graph": None, "join": None} for dt in
         ("integer", "boolean", "decimal", "double")],
        sources={"s0": [{"k0": str(i), "k1": v} for i, v in enumerate(
            ["007", "-0", "+42", "20.0", "0.005", "-0.0", "1e3", ".5",
             "5.", "1", "0", "true", "INF", "abc", ""])]},
    ),
    "invalid_iri_drops": _spec(
        _term("reference", "k0", "IRI"),
        [{"predicate": _term("constant_iri", "relative/x"),
          "object": _term("reference", "k1"), "graph": None, "join": None},
         {"predicate": _term("constant_iri", "http://ex.org/a"),
          "object": _term("reference", "k1", "IRI"),
          "graph": None, "join": None}],
        sources={"s0": [{"k0": "http://ok.org/s", "k1": "http://ok.org/o"},
                        {"k0": "not an iri", "k1": "x y"},
                        {"k0": "http://ok.org/s2", "k1": "rel/o"}]},
    ),
    "graph_union": _spec(
        _term("template", "http://s.org/{k0}"),
        [{"predicate": _term("constant_iri", "http://ex.org/a"),
          "object": _term("reference", "k0"),
          "graph": _term("constant_iri", "http://g.org/g2"), "join": None}],
        classes=["http://ex.org/C1"],
        graph=_term("template", "http://g.org/{k1}"),
    ),
    "same_row_join": _spec(
        _term("template", "http://s.org/{k0}"),
        [{"predicate": _term("constant_iri", "http://ex.org/ref"),
          "object": None, "graph": None,
          "join": {"parent": 1, "conditions": []}}],
        extra_tms=[{"name": "tm1", "source": "s0",
                    "subject": _term("template", "http://t.org/{k1}"),
                    "classes": [], "graph": None,
                    "poms": [{"predicate": _term("constant_iri", "http://ex.org/b"),
                              "object": _term("reference", "k0"),
                              "graph": None, "join": None}]}],
    ),
    "equi_join_null_keys": _spec(
        _term("template", "http://s.org/{k0}"),
        [{"predicate": _term("constant_iri", "http://ex.org/ref"),
          "object": None, "graph": None,
          "join": {"parent": 1, "conditions": [("k1", "k2")]}}],
        sources={"s0": [{"k0": "a", "k1": "m"}, {"k0": "b"}],
                 "s1": [{"k0": "p1", "k2": "m"}, {"k0": "p2", "k2": "m"},
                        {"k0": "p3"}]},
        extra_tms=[{"name": "tm1", "source": "s1",
                    "subject": _term("template", "http://t.org/{k0}"),
                    "classes": [], "graph": None,
                    "poms": [{"predicate": _term("constant_iri", "http://ex.org/b"),
                              "object": _term("reference", "k0"),
                              "graph": None, "join": None}]}],
    ),
    "language_map_tags": _spec(
        _term("template", "http://s.org/{k0}"),
        [{"predicate": _term("constant_iri", "http://ex.org/a"),
          "object": _term("reference", "k1", language_map="k2"),
          "graph": None, "join": None}],
        sources={"s0": [{"k0": "1", "k1": "v1", "k2": "en"},
                        {"k0": "2", "k1": "v2", "k2": "not a tag"},
                        {"k0": "3", "k1": "v3"},
                        {"k0": "4", "k1": "v4", "k2": "abcdefghi"},
                        {"k0": "5", "k1": "v5", "k2": "fr-CA"},
                        {"k0": "6", "k1": "v6", "k2": ""}]},
    ),
    "datatype_map_runtime_canon": _spec(
        _term("template", "http://s.org/{k0}"),
        [{"predicate": _term("constant_iri", "http://ex.org/a"),
          "object": _term("reference", "k1", datatype_map="k2"),
          "graph": None, "join": None}],
        sources={"s0": [{"k0": "1", "k1": "007", "k2": _XSD + "integer"},
                        {"k0": "2", "k1": "20.0", "k2": _XSD + "double"},
                        {"k0": "3", "k1": "05.10", "k2": _XSD + "decimal"},
                        {"k0": "4", "k1": "1", "k2": _XSD + "boolean"},
                        {"k0": "5", "k1": "007", "k2": "http://ex.org/custom"},
                        {"k0": "6", "k1": "007"}]},
    ),
    "pom_cross_product": _spec(
        _term("template", "http://s.org/{k0}"),
        [{"predicates": [_term("constant_iri", "http://ex.org/p1"),
                         _term("template", "http://p.org/{k1}")],
          "objects": [_term("reference", "k1"),
                      _term("constant_lit", "x y")],
          "graph": _term("constant_iri", "http://g.org/g1"), "join": None}],
    ),
    "bnode_and_escapes": _spec(
        _term("template", "b{k0}", "BlankNode"),
        [{"predicate": _term("constant_iri", "http://ex.org/a"),
          "object": _term("template", "lit \\{x\\} {k2}", "Literal"),
          "graph": None, "join": None}],
    ),
}


@pytest.mark.parametrize("name", sorted(CORPUS))
def test_diff_corpus(spark, name):
    _assert_equal(spark, CORPUS[name])


@pytest.mark.property
@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.data_too_large,
                                 HealthCheck.function_scoped_fixture])
@given(spec=_mapping_spec())
def test_diff_fuzz(spark_session_for_property, spec):
    _assert_equal(spark_session_for_property, spec)
