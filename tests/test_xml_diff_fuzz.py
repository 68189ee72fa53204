"""Differential fuzz for XML source extraction (round 9).

The JSON-source fuzz (test_diff_fuzz.py) attacks term-map semantics;
THIS harness attacks the extraction layer the round-9 ADVICE bugs
lived in: the XML iterator explode. The engine routes each document
per row — flat docs take the JVM `from_xml` + fragment-regex fast
path, docs with self-nested iterator tags or namespaces take the
Arrow-batched ElementTree walker — and the two paths must render
identically. Hypothesis generates small XML documents (optional
attributes, child elements, empty elements, whitespace-padded text,
XML-escaped specials, SELF-NESTED iterator tags, and xmlns-declared
documents), serialized through ElementTree so escaping is always
well-formed; the test extracts the records independently with a
spec-literal ElementTree walk and asserts the engine's exploded
records — and the quads of a fixed mapping over them — match exactly.

Reference semantics pinned by the engine (registry._xml_eval_ref,
byte-identical across both paths): a MISSING node/attribute is null
(no triple); an EXISTING element with no text is the EMPTY string;
element text is whitespace-stripped; `//item` matches nested items at
any depth; namespace declarations are stripped to local names
(registry._strip_xml_namespaces — the wild-RML local-name choice).
"""

import xml.etree.ElementTree as ET

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# text alphabet: XML-escapables, whitespace pads, unicode — NO raw
# control chars (not representable in XML 1.0)
_text = st.sampled_from(
    ["", "x", "a b", "  padded  ", "<&>", '"quot"', "'apos'", "é中",
     "line1\nline2", "\t tab", "100%", "{brace}", "a]]>b"]
)
_attr = st.sampled_from(
    ["", "v1", "a b", "<&>", '"q"', "é", "x\ny", "5"]
)


@st.composite
def _item(draw, depth=0):
    el = ET.Element("item")
    if draw(st.booleans()):
        el.set("id", draw(_attr))
    if draw(st.booleans()):
        el.set("v", draw(_attr))
    if draw(st.booleans()):
        el.text = draw(_text)
    for tag in ("c1", "c2"):
        if draw(st.booleans()):
            child = ET.SubElement(el, tag)
            if draw(st.booleans()):
                child.text = draw(_text)
            if tag == "c2" and draw(st.booleans()):
                child.set("a", draw(_attr))
    # self-nested iterator tag: forces the walker for the whole doc
    if depth == 0 and draw(st.integers(0, 9)) == 0:
        el.append(draw(_item(depth=1)))
    return el


@st.composite
def _doc(draw):
    root = ET.Element("root")
    if draw(st.integers(0, 4)) == 0:
        # namespaced doc: default xmlns routes to the walker, which
        # strips to local names — records must be identical
        root.set("xmlns", "http://fuzz.example/ns")
    for it in draw(st.lists(_item(), min_size=0, max_size=4)):
        root.append(it)
    return ET.tostring(root, encoding="unicode")


REFS = ["@id", "@v", "text()", "c1", "c2/@a"]


def _naive_records(doc: str) -> list[dict]:
    """Independent spec-literal extraction: ElementTree walk with the
    pinned null/empty/strip semantics."""
    root = ET.fromstring(doc)
    # local-name matching (the engine's documented namespace choice)
    for el in root.iter():
        if isinstance(el.tag, str) and el.tag.startswith("{"):
            el.tag = el.tag.split("}", 1)[1]
        if el.attrib and any(k.startswith("{") for k in el.attrib):
            el.attrib = {
                (k.split("}", 1)[1] if k.startswith("{") else k): v
                for k, v in el.attrib.items()
            }
    out = []
    for el in root.iter("item"):
        if el is root:
            continue
        rec = {}
        rec["@id"] = el.get("id")
        rec["@v"] = el.get("v")
        rec["text()"] = (el.text or "").strip()
        c1 = el.find("c1")
        rec["c1"] = (c1.text or "").strip() if c1 is not None else None
        c2 = el.find("c2")
        rec["c2/@a"] = c2.get("a") if c2 is not None else None
        out.append(rec)
    return out


_MAPPING = """
ex:m a rr:TriplesMap ;
    rml:logicalSource [ a rml:LogicalSource ;
        rml:source "doc.xml" ;
        rml:iterator "//item" ;
        rml:referenceFormulation ql:XPath ] ;
    rr:subjectMap [ a rr:SubjectMap ; rr:template "http://s.org/{@id}" ] ;
    rr:predicateObjectMap [
        rr:predicateMap [ rr:constant <http://p.org/t> ] ;
        rr:objectMap [ rml:reference "text()" ; rr:termType rr:Literal ] ] ;
    rr:predicateObjectMap [
        rr:predicateMap [ rr:constant <http://p.org/c1> ] ;
        rr:objectMap [ rml:reference "c1" ; rr:termType rr:Literal ] ] ;
    rr:predicateObjectMap [
        rr:predicateMap [ rr:constant <http://p.org/c2a> ] ;
        rr:objectMap [ rml:reference "c2/@a" ; rr:termType rr:Literal ] ] ;
    rr:predicateObjectMap [
        rr:predicateMap [ rr:constant <http://p.org/v> ] ;
        rr:objectMap [ rml:reference "@v" ; rr:termType rr:Literal ] ] .
"""


def _naive_quads(doc: str) -> set[tuple]:
    from naive_rml import iri_safe, valid_iri

    quads = set()
    for rec in _naive_records(doc):
        sid = rec["@id"]
        if sid is None:
            continue
        s = "http://s.org/" + iri_safe(sid)
        if not valid_iri(s):
            continue
        for pred, ref in (("http://p.org/t", "text()"),
                          ("http://p.org/c1", "c1"),
                          ("http://p.org/c2a", "c2/@a"),
                          ("http://p.org/v", "@v")):
            v = rec[ref]
            if v is None:
                continue
            quads.add((s, "IRI", pred, v, "Literal", None, None, None,
                       "default"))
    return quads


def _engine_quads(spark, doc: str) -> set[tuple]:
    from rml_utils_processor_ts_spark.operators.executor import execute_mapping

    result = execute_mapping(spark, _MAPPING, {"doc.xml": "inline:" + doc})
    return {tuple(r) for r in result.triples.collect()}


def _assert_equal(spark, doc: str) -> None:
    got = _engine_quads(spark, doc)
    want = _naive_quads(doc)
    assert got == want, (
        f"engine-only: {sorted(got - want)!r}\n"
        f"naive-only: {sorted(want - got)!r}\n"
        f"doc: {doc!r}"
    )


# ---- seeded regression corpus ----------------------------------------------

XML_CORPUS = {
    "empty_vs_missing": (
        "<root><item id='a'><c1/></item>"
        "<item id='b'>txt</item>"
        "<item v='only'/></root>"
    ),
    "whitespace_strip": (
        "<root><item id='a'>  padded  <c1>\n inner \n</c1></item></root>"
    ),
    "escapes": (
        "<root><item id='a' v='&lt;&amp;&gt;'><c1>&quot;q&quot; &amp; x</c1>"
        "<c2 a='a&#10;b'/></item></root>"
    ),
    "self_nested": (
        "<root><item id='outer'>t<item id='inner'><c1>deep</c1></item>"
        "</item></root>"
    ),
    "namespaced": (
        "<root xmlns='http://n.example/'><item id='a'><c1>x</c1>"
        "<c2 a='y'/></item></root>"
    ),
    "no_items": "<root><other/></root>",
}


@pytest.mark.parametrize("name", sorted(XML_CORPUS))
def test_xml_diff_corpus(spark, name):
    _assert_equal(spark, XML_CORPUS[name])


@pytest.mark.property
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.data_too_large,
                                 HealthCheck.function_scoped_fixture])
@given(doc=_doc())
def test_xml_diff_fuzz(spark_session_for_property, doc):
    _assert_equal(spark_session_for_property, doc)
