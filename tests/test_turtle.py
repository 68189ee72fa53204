"""Turtle parser unit tests over the syntax subset the RML fixtures use."""

from rml_utils_processor_ts_spark.plans.turtle import Graph, Term, parse_turtle


def test_basic_triples_and_prefixes():
    triples = parse_turtle(
        """
        @prefix ex: <http://example.org/> .
        @prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
        ex:a a ex:Thing ; rdfs:label "hello" ; ex:n 42 .
        """
    )
    assert (
        Term("iri", "http://example.org/a"),
        Term("iri", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"),
        Term("iri", "http://example.org/Thing"),
    ) in triples
    labels = [t for t in triples if t[1].value.endswith("label")]
    assert labels[0][2] == Term("literal", "hello")
    nums = [t for t in triples if t[1].value.endswith("/n")]
    assert nums[0][2].value == "42"


def test_nested_bnodes_and_trailing_semicolon():
    # the reference fixtures contain `;` immediately before `]`
    # (/root/reference/test/rml.test.ts:207)
    triples = parse_turtle(
        """
        @prefix ex: <http://example.org/> .
        ex:m ex:p [ ex:q [ ex:r "deep"; ]; ex:s "x", "y" ; ] .
        """
    )
    assert len([t for t in triples if t[2] == Term("literal", "deep")]) == 1
    assert len([t for t in triples if t[1].value.endswith("/s")]) == 2


def test_datatyped_and_lang_literals():
    triples = parse_turtle(
        """
        @prefix ex: <http://ex/> .
        @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
        ex:a ex:b "true"^^xsd:boolean ; ex:c "bonjour"@fr .
        """
    )
    dts = [t[2] for t in triples if t[1].value.endswith("/b")]
    assert dts[0].datatype == "http://www.w3.org/2001/XMLSchema#boolean"
    langs = [t[2] for t in triples if t[1].value.endswith("/c")]
    assert langs[0].lang == "fr"


def test_graph_match_api():
    g = Graph.from_turtle(
        """
        @prefix ex: <http://ex/> .
        ex:a ex:p ex:b . ex:c ex:p ex:d . ex:a ex:q "v" .
        """
    )
    assert len(list(g.match(p="http://ex/p"))) == 2
    assert g.object(Term("iri", "http://ex/a"), "http://ex/q").value == "v"
    assert len(g.subjects("http://ex/p")) == 2
