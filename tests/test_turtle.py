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


def test_single_and_triple_quoted_literals():
    """Round 4: Turtle single-quoted and triple-quoted (long) literal
    forms — long strings span lines and carry embedded quotes, which is
    how a mapping holds multi-line SQL in rml:query without escaping."""
    doc = "\n".join(
        [
            "@prefix ex: <http://x/> .",
            "ex:s ex:p 'single quoted' .",
            "ex:s ex:q '''multi\nline with \"double quotes\" inside''' .",
            'ex:s ex:r """long\nwith \'single quotes\'""" .',
            "ex:s ex:t 'tagged'@en .",
            "ex:s ex:u 'typed'^^ex:dt .",
        ]
    )
    from rml_utils_processor_ts_spark.plans.turtle import TurtleParser

    trips = {(t[0].value, t[1].value.rsplit("/", 1)[-1], t[2].value) for t in TurtleParser().parse(doc)}
    assert ("http://x/s", "p", "single quoted") in trips
    assert ("http://x/s", "q", 'multi\nline with "double quotes" inside') in trips
    assert ("http://x/s", "r", "long\nwith 'single quotes'") in trips
    lang = [t[2] for t in TurtleParser().parse(doc) if t[1].value.endswith("/t")][0]
    assert lang.lang == "en"


def test_multiline_sql_query_in_mapping(spark):
    """End-to-end: a triple-quoted rml:query spanning lines with a
    quoted SQL string literal parses and executes."""
    from rml_utils_processor_ts_spark.operators.executor import execute_mapping

    mapping = '''
ex:m a rr:TriplesMap ;
    rml:logicalSource [ a rml:LogicalSource ;
        rml:source "table:/root/testdata/sf0.001/nation.parquet" ;
        rml:query """
            SELECT n_nationkey AS k,
                   concat(n_name, ' of region "', n_regionkey, '"') AS label
            FROM nation WHERE n_regionkey = 3
        """ ;
        rml:referenceFormulation <urn:rml-spark:ql/Table> ] ;
    rr:subjectMap [ rr:template "http://x/n/{k}" ] ;
    rr:predicateObjectMap [
        rr:predicateMap [ rr:constant rdfs:label ] ;
        rr:objectMap [ rml:reference "label" ] ] .
'''
    res = execute_mapping(spark, mapping)
    rows = {(r["s"], r["o"]) for r in res.triples.collect()}
    assert len(rows) == 5
    assert all(o.endswith('of region "3"') for _, o in rows)


def test_bare_boolean_literals():
    """Turtle short form: bare true/false ≙ typed xsd:boolean literal
    (wild mappings write rmlt:ldesGenerateImmutableIRI true unquoted)."""
    t = parse_turtle('@prefix ex: <http://e/> .\nex:s ex:flag true ; ex:off false .')
    objs = {(tr[1].value.rsplit("/", 1)[-1], tr[2].value, tr[2].datatype) for tr in t}
    B = "http://www.w3.org/2001/XMLSchema#boolean"
    assert ("flag", "true", B) in objs and ("off", "false", B) in objs


def test_rdf_collections_desugar_to_first_rest():
    t = parse_turtle("@prefix ex: <http://e/> .\nex:s ex:l (ex:a ex:b) . ex:t ex:e () .")
    RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    firsts = [tr for tr in t if tr[1].value == RDF + "first"]
    rests = [tr for tr in t if tr[1].value == RDF + "rest"]
    assert [f[2].value for f in firsts] == ["http://e/a", "http://e/b"]
    assert rests[-1][2].value == RDF + "nil"
    empty = [tr for tr in t if tr[1].value == "http://e/e"]
    assert empty[0][2].value == RDF + "nil"
