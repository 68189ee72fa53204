"""RML conformance sweep (round 6, r5 VERDICT #2): a curated replay of
the official kg-construct RML test-case themes — the de facto spec of
the RMLMapper semantics the reference delegates to its Java jar
(/root/reference/src/rml/rml.ts:435-444).

Each case is data-driven: an inline source + mapping + the exact quad
set RMLMapper's documented semantics produce. Case ids reference the
official suite's theme families (RMLTC0000/0001 basics, 0002 term-map
errors + IRI safety, 0004 null handling, 0007 classes/graphs, 0009
joins, 0015 language tags, 0016 datatypes, 0019/0020 IRI encoding and
blank nodes). Results are summarized into PARITY.md §conformance by
tools/conformance_report.py, which imports CASES from here.

Deviations (documented, justified):
- D1 JSON natural typing: RMLMapper historically stringifies JSON
  scalars (5 -> "5" plain literal) without inferring xsd types; the
  newer W3C CG spec adds inference. We match RMLMapper: plain literal,
  lexical form preserved.
"""

from __future__ import annotations

import pytest

from rml_utils_processor_ts_spark.operators.executor import execute_mapping

EX = "http://example.com/"
FOAF = "http://xmlns.com/foaf/0.1/"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD = "http://www.w3.org/2001/XMLSchema#"

_LS_JSON = (
    'rml:logicalSource [ rml:source "d.json" ; rml:iterator "$.[*]" ; '
    "rml:referenceFormulation ql:JSONPath ]"
)

# one row mirroring the suite's student.csv / sport.csv shapes
_STUDENTS = (
    '[{"Id": "10", "Name": "Venus", "Sport": "100"},'
    ' {"Id": "11", "Name": "Fernando", "Sport": "101"},'
    ' {"Id": "12", "Name": "David", "Sport": null}]'
)
_SPORTS = '[{"ID": "100", "Label": "Tennis"}, {"ID": "101", "Label": "Moto"}]'


def _m(body: str) -> str:
    return f"ex:m a rr:TriplesMap ;\n  {_LS_JSON} ;\n  {body} .\n"


# (case_id, theme, mapping_turtle, sources, expected quad tuples
#  (s, s_tt, p, o, o_tt, dtype, lang, g))
CASES: list[tuple] = [
    (
        "RMLTC0000-theme",
        "subject template + rr:class only",
        _m('rr:subjectMap [ rr:template "http://example.com/{Id}" ; rr:class foaf:Person ]'),
        {"d.json": "inline:" + '[{"Id": "10"}]'},
        {(EX + "10", "IRI", RDF_TYPE, FOAF + "Person", "IRI", None, None, None)},
    ),
    (
        "RMLTC0001a-theme",
        "reference object map",
        _m(
            'rr:subjectMap [ rr:template "http://example.com/{Id}" ] ;\n'
            "  rr:predicateObjectMap [ rr:predicate foaf:name ; "
            'rr:objectMap [ rml:reference "Name" ] ]'
        ),
        {"d.json": "inline:" + '[{"Id": "10", "Name": "Venus"}]'},
        {(EX + "10", "IRI", FOAF + "name", "Venus", "Literal", None, None, None)},
    ),
    (
        "RMLTC0001b-theme",
        "rr:constant object shortcut (rr:object)",
        _m(
            'rr:subjectMap [ rr:template "http://example.com/{Id}" ] ;\n'
            "  rr:predicateObjectMap [ rr:predicate foaf:name ; rr:object \"fixed\" ] ;\n"
            "  rr:predicateObjectMap [ rr:predicate ex:knows ; rr:object ex:someone ]"
        ),
        {"d.json": "inline:" + '[{"Id": "10"}]'},
        {
            (EX + "10", "IRI", FOAF + "name", "fixed", "Literal", None, None, None),
            (EX + "10", "IRI", "http://example.org/knows", "http://example.org/someone", "IRI", None, None, None),
        },
    ),
    (
        "RMLTC0002a-theme",
        "two POMs from one row",
        _m(
            'rr:subjectMap [ rr:template "http://example.com/Student/{Id}/{Name}" ] ;\n'
            "  rr:predicateObjectMap [ rr:predicate ex:id ; rr:objectMap [ rml:reference \"Id\" ] ] ;\n"
            "  rr:predicateObjectMap [ rr:predicate foaf:name ; rr:objectMap [ rml:reference \"Name\" ] ]"
        ),
        {"d.json": "inline:" + '[{"Id": "10", "Name": "Venus"}]'},
        {
            (EX + "Student/10/Venus", "IRI", "http://example.org/id", "10", "Literal", None, None, None),
            (EX + "Student/10/Venus", "IRI", FOAF + "name", "Venus", "Literal", None, None, None),
        },
    ),
    (
        "RMLTC0002e-theme",
        "invalid IRI from reference drops the triple, run continues",
        _m(
            'rr:subjectMap [ rr:template "http://example.com/{Id}" ] ;\n'
            "  rr:predicateObjectMap [ rr:predicate ex:link ; "
            'rr:objectMap [ rml:reference "Url" ; rr:termType rr:IRI ] ]'
        ),
        {"d.json": "inline:" + '[{"Id": "1", "Url": "http://ok.org/x"}, {"Id": "2", "Url": "not an iri"}]'},
        {(EX + "1", "IRI", "http://example.org/link", "http://ok.org/x", "IRI", None, None, None)},
    ),
    (
        "RMLTC0002-relative-theme",
        "relative IRI (no base resolution available) drops",
        _m(
            'rr:subjectMap [ rr:template "http://example.com/{Id}" ] ;\n'
            "  rr:predicateObjectMap [ rr:predicate ex:link ; "
            'rr:objectMap [ rml:reference "Url" ; rr:termType rr:IRI ] ]'
        ),
        {"d.json": "inline:" + '[{"Id": "1", "Url": "relative/path"}]'},
        set(),
    ),
    (
        "RMLTC0004a-theme",
        "null and missing references produce no triple; empty string is a triple",
        _m(
            'rr:subjectMap [ rr:template "http://example.com/{Id}" ] ;\n'
            "  rr:predicateObjectMap [ rr:predicate ex:v ; rr:objectMap [ rml:reference \"V\" ] ]"
        ),
        {
            "d.json": "inline:"
            + '[{"Id": "1", "V": "x"}, {"Id": "2", "V": null}, {"Id": "3"}, {"Id": "4", "V": ""}]'
        },
        {
            (EX + "1", "IRI", "http://example.org/v", "x", "Literal", None, None, None),
            (EX + "4", "IRI", "http://example.org/v", "", "Literal", None, None, None),
        },
    ),
    (
        "RMLTC0007e-theme",
        "rr:graphMap template on the subject map scopes every POM + class quad",
        _m(
            'rr:subjectMap [ rr:template "http://example.com/{Id}" ; rr:class foaf:Person ;\n'
            '    rr:graphMap [ rr:template "http://example.com/graph/{Id}" ] ] ;\n'
            "  rr:predicateObjectMap [ rr:predicate foaf:name ; rr:objectMap [ rml:reference \"Name\" ] ]"
        ),
        {"d.json": "inline:" + '[{"Id": "10", "Name": "Venus"}]'},
        {
            (EX + "10", "IRI", RDF_TYPE, FOAF + "Person", "IRI", None, None, EX + "graph/10"),
            (EX + "10", "IRI", FOAF + "name", "Venus", "Literal", None, None, EX + "graph/10"),
        },
    ),
    (
        "RMLTC0009a-theme",
        "referencing object map with join condition",
        f"""
ex:student a rr:TriplesMap ;
  {_LS_JSON} ;
  rr:subjectMap [ rr:template "http://example.com/{{Id}}" ] ;
  rr:predicateObjectMap [
    rr:predicate ex:plays ;
    rr:objectMap [
      rr:parentTriplesMap ex:sport ;
      rml:joinCondition [ fnml:functionValue [
        rr:predicateObjectMap [ rr:predicate fno:executes ; rr:objectMap [ rr:constant <http://users.ugent.be/~bjdmeest/function/grel.ttl#equal> ] ] ;
        rr:predicateObjectMap [ rr:predicate grel:valueParameter ; rr:objectMap [ rml:reference "Sport" ] ] ;
        rr:predicateObjectMap [ rr:predicate grel:valueParameter2 ; rr:objectMap [ rr:parentTermMap [ rml:reference "ID" ] ] ]
      ] ]
    ]
  ] .
ex:sport a rr:TriplesMap ;
  rml:logicalSource [ rml:source "s.json" ; rml:iterator "$.[*]" ; rml:referenceFormulation ql:JSONPath ] ;
  rr:subjectMap [ rr:template "http://example.com/sport/{{ID}}" ] ;
  rr:predicateObjectMap [ rr:predicate ex:label ; rr:objectMap [ rml:reference "Label" ] ] .
""",
        {"d.json": "inline:" + _STUDENTS, "s.json": "inline:" + _SPORTS},
        {
            (EX + "10", "IRI", "http://example.org/plays", EX + "sport/100", "IRI", None, None, None),
            (EX + "11", "IRI", "http://example.org/plays", EX + "sport/101", "IRI", None, None, None),
            (EX + "sport/100", "IRI", "http://example.org/label", "Tennis", "Literal", None, None, None),
            (EX + "sport/101", "IRI", "http://example.org/label", "Moto", "Literal", None, None, None),
        },
    ),
    (
        "RMLTC0015a-theme",
        "rr:language tags the literal",
        _m(
            'rr:subjectMap [ rr:template "http://example.com/{Id}" ] ;\n'
            "  rr:predicateObjectMap [ rr:predicate ex:desc ; "
            'rr:objectMap [ rml:reference "Name" ; rr:language "en-US" ] ]'
        ),
        {"d.json": "inline:" + '[{"Id": "10", "Name": "Venus"}]'},
        {(EX + "10", "IRI", "http://example.org/desc", "Venus", "Literal", None, "en-US", None)},
    ),
    (
        "RMLTC0016a-theme",
        "explicit rr:datatype renders the XSD canonical lexical form"
        " (r7: matches RMLMapper's parse-then-reserialize; r6 preserved"
        " the raw form)",
        _m(
            'rr:subjectMap [ rr:template "http://example.com/{Id}" ] ;\n'
            "  rr:predicateObjectMap [ rr:predicate ex:n ; "
            f'rr:objectMap [ rml:reference "V" ; rr:datatype <{XSD}integer> ] ] ;\n'
            "  rr:predicateObjectMap [ rr:predicate ex:d ; "
            f'rr:objectMap [ rml:reference "W" ; rr:datatype <{XSD}double> ] ]'
        ),
        {"d.json": "inline:" + '[{"Id": "10", "V": "05", "W": "4.60"}]'},
        {
            (EX + "10", "IRI", "http://example.org/n", "5", "Literal", XSD + "integer", None, None),
            (EX + "10", "IRI", "http://example.org/d", "4.6E0", "Literal", XSD + "double", None, None),
        },
    ),
    (
        "RMLTC0019a-theme",
        "IRI-unsafe template characters percent-encode (space, slash, &, =)",
        _m(
            'rr:subjectMap [ rr:template "http://example.com/{Name}" ] ;\n'
            "  rr:predicateObjectMap [ rr:predicate ex:q ; "
            'rr:objectMap [ rr:template "http://example.com/q?{Q}" ] ]'
        ),
        {"d.json": "inline:" + '[{"Name": "Venus Williams", "Q": "a/b&c=d"}]'},
        {
            (
                EX + "Venus%20Williams", "IRI", "http://example.org/q",
                EX + "q?a%2Fb%26c%3Dd", "IRI", None, None, None,
            )
        },
    ),
    (
        "RMLTC0019b-theme",
        "iunreserved (non-ASCII) template characters stay raw",
        _m(
            'rr:subjectMap [ rr:template "http://example.com/{Name}" ] ;\n'
            "  rr:predicateObjectMap [ rr:predicate foaf:name ; rr:objectMap [ rml:reference \"Name\" ] ]"
        ),
        {"d.json": "inline:" + '[{"Name": "Bj\\u00f6rk Gu\\u00f0mundsd\\u00f3ttir"}]'},
        {
            (
                EX + "Björk%20Guðmundsdóttir", "IRI", FOAF + "name",
                "Björk Guðmundsdóttir", "Literal", None, None, None,
            )
        },
    ),
    (
        "RMLTC0020-literal-template-theme",
        "templates in Literal position do not percent-encode",
        _m(
            'rr:subjectMap [ rr:template "http://example.com/{Id}" ] ;\n'
            "  rr:predicateObjectMap [ rr:predicate ex:label ; "
            'rr:objectMap [ rr:template "{Name} ({Id})" ; rr:termType rr:Literal ] ]'
        ),
        {"d.json": "inline:" + '[{"Id": "10", "Name": "Venus Williams"}]'},
        {(EX + "10", "IRI", "http://example.org/label", "Venus Williams (10)", "Literal", None, None, None)},
    ),
    (
        "RMLTC-bnode-subject-theme",
        "blank-node subjects: same template value = same node, rows distinct",
        _m(
            'rr:subjectMap [ rr:template "s{Id}" ; rr:termType rr:BlankNode ] ;\n'
            "  rr:predicateObjectMap [ rr:predicate foaf:name ; rr:objectMap [ rml:reference \"Name\" ] ]"
        ),
        {"d.json": "inline:" + '[{"Id": "1", "Name": "a"}, {"Id": "1", "Name": "a2"}, {"Id": "2", "Name": "b"}]'},
        {
            ("s1", "BlankNode", FOAF + "name", "a", "Literal", None, None, None),
            ("s1", "BlankNode", FOAF + "name", "a2", "Literal", None, None, None),
            ("s2", "BlankNode", FOAF + "name", "b", "Literal", None, None, None),
        },
    ),
    (
        "RMLTC-dup-elim-theme",
        "duplicate rows collapse (an RDF graph is a set)",
        _m(
            'rr:subjectMap [ rr:template "http://example.com/{Id}" ] ;\n'
            "  rr:predicateObjectMap [ rr:predicate ex:v ; rr:objectMap [ rml:reference \"V\" ] ]"
        ),
        {"d.json": "inline:" + '[{"Id": "1", "V": "x"}, {"Id": "1", "V": "x"}]'},
        {(EX + "1", "IRI", "http://example.org/v", "x", "Literal", None, None, None)},
    ),
    (
        "RMLTC-json-natural-theme",
        "JSON scalars stringify with lexical form preserved (deviation D1)",
        _m(
            'rr:subjectMap [ rr:template "http://example.com/{Id}" ] ;\n'
            "  rr:predicateObjectMap [ rr:predicate ex:i ; rr:objectMap [ rml:reference \"I\" ] ] ;\n"
            "  rr:predicateObjectMap [ rr:predicate ex:b ; rr:objectMap [ rml:reference \"B\" ] ]"
        ),
        {"d.json": "inline:" + '[{"Id": "1", "I": 5, "B": true}]'},
        {
            (EX + "1", "IRI", "http://example.org/i", "5", "Literal", None, None, None),
            (EX + "1", "IRI", "http://example.org/b", "true", "Literal", None, None, None),
        },
    ),
    (
        "RMLTC0006a-theme",
        "rr:subject and rr:graph constant shortcuts; rr:defaultGraph means none",
        'ex:m a rr:TriplesMap ;\n'
        f"  {_LS_JSON} ;\n"
        "  rr:subject ex:thing ;\n"
        "  rr:predicateObjectMap [ rr:predicate ex:v ; rr:objectMap [ rml:reference \"V\" ] ] .\n"
        'ex:m2 a rr:TriplesMap ;\n'
        f"  {_LS_JSON} ;\n"
        '  rr:subjectMap [ rr:template "http://example.com/{Id}" ; rr:graph ex:g1 ] ;\n'
        "  rr:predicateObjectMap [ rr:predicate ex:w ; rr:objectMap [ rml:reference \"V\" ] ] .\n"
        'ex:m3 a rr:TriplesMap ;\n'
        f"  {_LS_JSON} ;\n"
        '  rr:subjectMap [ rr:template "http://example.com/d/{Id}" ; rr:graphMap [ rr:constant rr:defaultGraph ] ] ;\n'
        "  rr:predicateObjectMap [ rr:predicate ex:w ; rr:objectMap [ rml:reference \"V\" ] ] .",
        {"d.json": "inline:" + '[{"Id": "1", "V": "x"}]'},
        {
            ("http://example.org/thing", "IRI", "http://example.org/v", "x", "Literal", None, None, None),
            (EX + "1", "IRI", "http://example.org/w", "x", "Literal", None, None, "http://example.org/g1"),
            (EX + "d/1", "IRI", "http://example.org/w", "x", "Literal", None, None, None),
        },
    ),
    (
        "RMLTC0007f-theme",
        "POM-level graph map: union of subject and POM graphs (R2RML 9)",
        _m(
            'rr:subjectMap [ rr:template "http://example.com/{Id}" ;\n'
            "    rr:graph ex:sg ] ;\n"
            "  rr:predicateObjectMap [ rr:predicate ex:a ; rr:objectMap [ rml:reference \"V\" ] ;\n"
            '    rr:graphMap [ rr:template "http://example.org/pg/{Id}" ] ] ;\n'
            "  rr:predicateObjectMap [ rr:predicate ex:b ; rr:objectMap [ rml:reference \"V\" ] ]"
        ),
        {"d.json": "inline:" + '[{"Id": "1", "V": "x"}]'},
        {
            # ex:a lands in BOTH the POM graph and the subject graph
            (EX + "1", "IRI", "http://example.org/a", "x", "Literal", None, None, "http://example.org/pg/1"),
            (EX + "1", "IRI", "http://example.org/a", "x", "Literal", None, None, "http://example.org/sg"),
            # ex:b only in the subject graph
            (EX + "1", "IRI", "http://example.org/b", "x", "Literal", None, None, "http://example.org/sg"),
        },
    ),
    (
        "RMLTC-languageMap-theme",
        "rml:languageMap derives the tag from the data",
        _m(
            'rr:subjectMap [ rr:template "http://example.com/{Id}" ] ;\n'
            "  rr:predicateObjectMap [ rr:predicate ex:t ; "
            'rr:objectMap [ rml:reference "V" ; rml:languageMap [ rml:reference "L" ] ] ]'
        ),
        {"d.json": "inline:" + '[{"Id": "1", "V": "hello", "L": "en"}, {"Id": "2", "V": "hallo", "L": "de"}]'},
        {
            (EX + "1", "IRI", "http://example.org/t", "hello", "Literal", None, "en", None),
            (EX + "2", "IRI", "http://example.org/t", "hallo", "Literal", None, "de", None),
        },
    ),
    (
        "RMLTC-datatypeMap-theme",
        "rml:datatypeMap derives the datatype IRI from the data",
        _m(
            'rr:subjectMap [ rr:template "http://example.com/{Id}" ] ;\n'
            "  rr:predicateObjectMap [ rr:predicate ex:v ; "
            'rr:objectMap [ rml:reference "V" ; rml:datatypeMap [ rr:template "http://www.w3.org/2001/XMLSchema#{T}" ] ] ]'
        ),
        {"d.json": "inline:" + '[{"Id": "1", "V": "5", "T": "integer"}, {"Id": "2", "V": "4.6", "T": "double"}]'},
        {
            (EX + "1", "IRI", "http://example.org/v", "5", "Literal", XSD + "integer", None, None),
            # r7: data-derived datatypes canonicalize too (4.6 -> 4.6E0)
            (EX + "2", "IRI", "http://example.org/v", "4.6E0", "Literal", XSD + "double", None, None),
        },
    ),
    (
        "RMLTC0008-csv-theme",
        "CSV source: space-named columns in templates and references",
        'ex:m a rr:TriplesMap ;\n'
        '  rml:logicalSource [ rml:source "s.csv" ; rml:referenceFormulation ql:CSV ] ;\n'
        '  rr:subjectMap [ rr:template "http://example.com/{First Name}" ] ;\n'
        "  rr:predicateObjectMap [ rr:predicate ex:age ; rr:objectMap [ rml:reference \"Age\" ] ] .",
        {"s.csv": 'inline:"First Name",Age\nVenus,22\nSerena,20\n'},
        {
            (EX + "Venus", "IRI", "http://example.org/age", "22", "Literal", None, None, None),
            (EX + "Serena", "IRI", "http://example.org/age", "20", "Literal", None, None, None),
        },
    ),
    (
        "RMLTC-xsd-string-theme",
        "explicit xsd:string datatype is recorded on the term",
        _m(
            'rr:subjectMap [ rr:template "http://example.com/{Id}" ] ;\n'
            "  rr:predicateObjectMap [ rr:predicate ex:s ; "
            f'rr:objectMap [ rml:reference "V" ; rr:datatype <{XSD}string> ] ]'
        ),
        {"d.json": "inline:" + '[{"Id": "1", "V": "x"}]'},
        {(EX + "1", "IRI", "http://example.org/s", "x", "Literal", XSD + "string", None, None)},
    ),
    # ---- round 7: official-suite hard cases (r6 VERDICT #4) ----
    (
        "RMLTC-template-escape-literal-theme",
        r"R2RML template grammar: \{ \} are literal braces, \\ a literal"
        " backslash, in a literal-position template",
        _m(
            'rr:subjectMap [ rr:template "http://example.com/{Id}" ] ;\n'
            "  rr:predicateObjectMap [ rr:predicate ex:expr ; "
            'rr:objectMap [ rr:template "\\\\{{V}\\\\}" ; rr:termType rr:Literal ] ] ;\n'
            "  rr:predicateObjectMap [ rr:predicate ex:bs ; "
            'rr:objectMap [ rr:template "a\\\\\\\\{V}" ; rr:termType rr:Literal ] ]'
        ),
        {"d.json": "inline:" + '[{"Id": "1", "V": "x"}]'},
        {
            # "\{{V}\}" -> literal "{" + value + literal "}"
            (EX + "1", "IRI", "http://example.org/expr", "{x}", "Literal", None, None, None),
            # "a\\{V}" -> literal "a\" + value (the escaped backslash does
            # NOT swallow the placeholder)
            (EX + "1", "IRI", "http://example.org/bs", "a\\x", "Literal", None, None, None),
        },
    ),
    (
        "RMLTC-template-escape-iri-theme",
        "an escaped literal brace in an IRI-position template is an"
        " IRI-forbidden character: data error, quad dropped (RMLMapper"
        " raises per-term; lenient processors drop — we drop)",
        _m('rr:subjectMap [ rr:template "http://example.com/\\\\{x\\\\}/{Id}" ; rr:class foaf:Person ]'),
        {"d.json": "inline:" + '[{"Id": "1"}]'},
        set(),
    ),
    (
        "RMLTC0016b-double-canonical-theme",
        "xsd:double datatyped literals render the XSD canonical lexical"
        " form (20.0 -> 2.0E1, 0.005 -> 5.0E-3; RMLMapper parses then"
        " re-serializes canonically)",
        _m(
            'rr:subjectMap [ rr:template "http://example.com/{Id}" ] ;\n'
            "  rr:predicateObjectMap [ rr:predicate ex:v ; "
            f'rr:objectMap [ rml:reference "V" ; rr:datatype <{XSD}double> ] ]'
        ),
        {
            "d.json": "inline:"
            + '[{"Id": "1", "V": "20.0"}, {"Id": "2", "V": "0.005"},'
            ' {"Id": "3", "V": "-1E3"}, {"Id": "4", "V": "0"}]'
        },
        {
            (EX + "1", "IRI", "http://example.org/v", "2.0E1", "Literal", XSD + "double", None, None),
            (EX + "2", "IRI", "http://example.org/v", "5.0E-3", "Literal", XSD + "double", None, None),
            (EX + "3", "IRI", "http://example.org/v", "-1.0E3", "Literal", XSD + "double", None, None),
            (EX + "4", "IRI", "http://example.org/v", "0.0E0", "Literal", XSD + "double", None, None),
        },
    ),
    (
        "RMLTC0016c-decimal-canonical-theme",
        "xsd:decimal canonical form: no leading/trailing zeros, decimal"
        " point with a digit on each side",
        _m(
            'rr:subjectMap [ rr:template "http://example.com/{Id}" ] ;\n'
            "  rr:predicateObjectMap [ rr:predicate ex:v ; "
            f'rr:objectMap [ rml:reference "V" ; rr:datatype <{XSD}decimal> ] ]'
        ),
        {
            "d.json": "inline:"
            + '[{"Id": "1", "V": "05.10"}, {"Id": "2", "V": "5"}, {"Id": "3", "V": "-0.0"}]'
        },
        {
            (EX + "1", "IRI", "http://example.org/v", "5.1", "Literal", XSD + "decimal", None, None),
            (EX + "2", "IRI", "http://example.org/v", "5.0", "Literal", XSD + "decimal", None, None),
            (EX + "3", "IRI", "http://example.org/v", "0.0", "Literal", XSD + "decimal", None, None),
        },
    ),
    (
        "RMLTC0016d-boolean-canonical-theme",
        "xsd:boolean canonical form: 1 -> true, 0 -> false",
        _m(
            'rr:subjectMap [ rr:template "http://example.com/{Id}" ] ;\n'
            "  rr:predicateObjectMap [ rr:predicate ex:v ; "
            f'rr:objectMap [ rml:reference "V" ; rr:datatype <{XSD}boolean> ] ]'
        ),
        {"d.json": "inline:" + '[{"Id": "1", "V": "1"}, {"Id": "2", "V": "0"}, {"Id": "3", "V": "true"}]'},
        {
            (EX + "1", "IRI", "http://example.org/v", "true", "Literal", XSD + "boolean", None, None),
            (EX + "2", "IRI", "http://example.org/v", "false", "Literal", XSD + "boolean", None, None),
            (EX + "3", "IRI", "http://example.org/v", "true", "Literal", XSD + "boolean", None, None),
        },
    ),
    (
        "RMLTC0016e-integer-canonical-theme",
        "xsd:integer canonical form: no '+', no leading zeros, -0 -> 0",
        _m(
            'rr:subjectMap [ rr:template "http://example.com/{Id}" ] ;\n'
            "  rr:predicateObjectMap [ rr:predicate ex:v ; "
            f'rr:objectMap [ rml:reference "V" ; rr:datatype <{XSD}integer> ] ]'
        ),
        {"d.json": "inline:" + '[{"Id": "1", "V": "+05"}, {"Id": "2", "V": "-0"}, {"Id": "3", "V": "42"}]'},
        {
            (EX + "1", "IRI", "http://example.org/v", "5", "Literal", XSD + "integer", None, None),
            (EX + "2", "IRI", "http://example.org/v", "0", "Literal", XSD + "integer", None, None),
            (EX + "3", "IRI", "http://example.org/v", "42", "Literal", XSD + "integer", None, None),
        },
    ),
    (
        "RMLTC0016f-illtyped-passthrough-theme",
        "a value outside the datatype's lexical space passes through"
        " unchanged (ill-typed literal, RMLMapper lenient mode)",
        _m(
            'rr:subjectMap [ rr:template "http://example.com/{Id}" ] ;\n'
            "  rr:predicateObjectMap [ rr:predicate ex:v ; "
            f'rr:objectMap [ rml:reference "V" ; rr:datatype <{XSD}double> ] ]'
        ),
        {"d.json": "inline:" + '[{"Id": "1", "V": "abc"}]'},
        {(EX + "1", "IRI", "http://example.org/v", "abc", "Literal", XSD + "double", None, None)},
    ),
    (
        "RMLTC0019-percent-reencode-theme",
        "an IRI-template value already containing %XX is re-encoded:"
        " the '%' itself percent-encodes (RMLMapper double-encodes;"
        " iri-safe encoding has no decode step)",
        _m('rr:subjectMap [ rr:template "http://example.com/{Id}" ; rr:class foaf:Person ]'),
        {"d.json": "inline:" + '[{"Id": "p%20q"}]'},
        {(EX + "p%2520q", "IRI", RDF_TYPE, FOAF + "Person", "IRI", None, None, None)},
    ),
    (
        "RMLTC-datatypeMap-canonical-theme",
        "canonicalization also applies through a data-derived"
        " rml:datatypeMap (runtime CASE on the datatype column)",
        _m(
            'rr:subjectMap [ rr:template "http://example.com/{Id}" ] ;\n'
            "  rr:predicateObjectMap [ rr:predicate ex:v ; "
            'rr:objectMap [ rml:reference "V" ; '
            'rml:datatypeMap [ rr:template "http://www.w3.org/2001/XMLSchema#{DT}" ] ] ]'
        ),
        {
            "d.json": "inline:"
            + '[{"Id": "1", "V": "20.0", "DT": "double"},'
            ' {"Id": "2", "V": "1", "DT": "boolean"},'
            ' {"Id": "3", "V": "20.0", "DT": "string"}]'
        },
        {
            (EX + "1", "IRI", "http://example.org/v", "2.0E1", "Literal", XSD + "double", None, None),
            (EX + "2", "IRI", "http://example.org/v", "true", "Literal", XSD + "boolean", None, None),
            (EX + "3", "IRI", "http://example.org/v", "20.0", "Literal", XSD + "string", None, None),
        },
    ),
    (
        "RMLTC0003-multi-predicate-theme",
        "multiple rr:predicate values on one POM each yield a triple (R2RML §6.3)",
        _m(
            'rr:subjectMap [ rr:template "http://example.com/{Id}" ] ;\n'
            "  rr:predicateObjectMap [ rr:predicate foaf:name, ex:alias ; "
            'rr:objectMap [ rml:reference "Name" ] ]'
        ),
        {"d.json": "inline:" + '[{"Id": "10", "Name": "Venus"}]'},
        {
            (EX + "10", "IRI", FOAF + "name", "Venus", "Literal", None, None, None),
            (EX + "10", "IRI", "http://example.org/alias", "Venus", "Literal", None, None, None),
        },
    ),
    (
        "RMLTC0012-pair-crossproduct-theme",
        "m predicate maps x n object maps generate one triple per pair",
        _m(
            'rr:subjectMap [ rr:template "http://example.com/{Id}" ] ;\n'
            "  rr:predicateObjectMap [ rr:predicate foaf:name, ex:alias ; "
            'rr:objectMap [ rml:reference "Name" ], [ rr:template "{Name} ({Id})" ; rr:termType rr:Literal ] ]'
        ),
        {"d.json": "inline:" + '[{"Id": "10", "Name": "Venus"}]'},
        {
            (EX + "10", "IRI", FOAF + "name", "Venus", "Literal", None, None, None),
            (EX + "10", "IRI", "http://example.org/alias", "Venus", "Literal", None, None, None),
            (EX + "10", "IRI", FOAF + "name", "Venus (10)", "Literal", None, None, None),
            (EX + "10", "IRI", "http://example.org/alias", "Venus (10)", "Literal", None, None, None),
        },
    ),
    (
        "RMLTC0005-multi-predicate-join-theme",
        "multiple predicates expand across a referencing object map too",
        f"""
ex:student a rr:TriplesMap ;
  {_LS_JSON} ;
  rr:subjectMap [ rr:template "http://example.com/{{Id}}" ] ;
  rr:predicateObjectMap [
    rr:predicate ex:plays, ex:practices ;
    rr:objectMap [
      rr:parentTriplesMap ex:sport ;
      rml:joinCondition [ fnml:functionValue [
        rr:predicateObjectMap [ rr:predicate fno:executes ; rr:objectMap [ rr:constant <http://users.ugent.be/~bjdmeest/function/grel.ttl#equal> ] ] ;
        rr:predicateObjectMap [ rr:predicate grel:valueParameter ; rr:objectMap [ rml:reference "Sport" ] ] ;
        rr:predicateObjectMap [ rr:predicate grel:valueParameter2 ; rr:objectMap [ rr:parentTermMap [ rml:reference "ID" ] ] ]
      ] ]
    ]
  ] .
ex:sport a rr:TriplesMap ;
  rml:logicalSource [ rml:source "s.json" ; rml:iterator "$.[*]" ; rml:referenceFormulation ql:JSONPath ] ;
  rr:subjectMap [ rr:template "http://example.com/sport/{{ID}}" ] .
""",
        {
            "d.json": "inline:" + '[{"Id": "10", "Sport": "100"}]',
            "s.json": "inline:" + '[{"ID": "100", "Label": "Tennis"}]',
        },
        {
            (EX + "10", "IRI", "http://example.org/plays", EX + "sport/100", "IRI", None, None, None),
            (EX + "10", "IRI", "http://example.org/practices", EX + "sport/100", "IRI", None, None, None),
        },
    ),
    (
        "RMLTC0011-nojoin-same-source-theme",
        "referencing object map WITHOUT join condition: same logical"
        " source required, parent subject evaluates on the SAME row"
        " (R2RML §11 joint-query degeneration — no join, no cross product)",
        f"""
ex:student a rr:TriplesMap ;
  {_LS_JSON} ;
  rr:subjectMap [ rr:template "http://example.com/student/{{Id}}" ] ;
  rr:predicateObjectMap [ rr:predicate ex:sameAs ;
    rr:objectMap [ rr:parentTriplesMap ex:person ] ] .
ex:person a rr:TriplesMap ;
  {_LS_JSON} ;
  rr:subjectMap [ rr:template "http://example.com/person/{{Id}}" ] .
""",
        {"d.json": "inline:" + '[{"Id": "10"}, {"Id": "11"}]'},
        {
            (EX + "student/10", "IRI", "http://example.org/sameAs", EX + "person/10", "IRI", None, None, None),
            (EX + "student/11", "IRI", "http://example.org/sameAs", EX + "person/11", "IRI", None, None, None),
        },
    ),
    (
        "RMLTC0007h-multi-graph-theme",
        "multiple graph maps: class triples in every subject graph; POM"
        " triples in the union of subject graphs and POM graphs (R2RML §9)",
        _m(
            'rr:subjectMap [ rr:template "http://example.com/{Id}" ; rr:class foaf:Person ;\n'
            "      rr:graphMap [ rr:constant ex:g1 ] ; rr:graph ex:g2 ] ;\n"
            "  rr:predicateObjectMap [ rr:predicate foaf:name ; "
            'rr:objectMap [ rml:reference "Name" ] ; rr:graph ex:h1 ]'
        ),
        {"d.json": "inline:" + '[{"Id": "10", "Name": "Venus"}]'},
        {
            (EX + "10", "IRI", RDF_TYPE, FOAF + "Person", "IRI", None, None, "http://example.org/g1"),
            (EX + "10", "IRI", RDF_TYPE, FOAF + "Person", "IRI", None, None, "http://example.org/g2"),
            (EX + "10", "IRI", FOAF + "name", "Venus", "Literal", None, None, "http://example.org/g1"),
            (EX + "10", "IRI", FOAF + "name", "Venus", "Literal", None, None, "http://example.org/g2"),
            (EX + "10", "IRI", FOAF + "name", "Venus", "Literal", None, None, "http://example.org/h1"),
        },
    ),
    (
        "RMLTC0007i-default-plus-named-theme",
        "rr:graph ex:g1, rr:defaultGraph on a POM: the quad lands in g1 AND the default graph",
        _m(
            'rr:subjectMap [ rr:template "http://example.com/{Id}" ] ;\n'
            "  rr:predicateObjectMap [ rr:predicate foaf:name ; "
            'rr:objectMap [ rml:reference "Name" ] ; rr:graph ex:g1, rr:defaultGraph ]'
        ),
        {"d.json": "inline:" + '[{"Id": "10", "Name": "Venus"}]'},
        {
            (EX + "10", "IRI", FOAF + "name", "Venus", "Literal", None, None, "http://example.org/g1"),
            (EX + "10", "IRI", FOAF + "name", "Venus", "Literal", None, None, None),
        },
    ),
    (
        "RMLTC0015b-invalid-language-theme",
        "an invalid constant rr:language tag is a mapping error (RMLMapper raises)",
        _m(
            'rr:subjectMap [ rr:template "http://example.com/{Id}" ] ;\n'
            "  rr:predicateObjectMap [ rr:predicate ex:label ; "
            'rr:objectMap [ rml:reference "Name" ; rr:language "english-USA-x-" ] ]'
        ),
        {"d.json": "inline:" + '[{"Id": "10", "Name": "Venus"}]'},
        "MappingParseError",
    ),
    (
        "RMLTC0015-languageMap-invalid-theme",
        "a data-derived language tag outside the LANGTAG grammar is a data error: quad dropped",
        _m(
            'rr:subjectMap [ rr:template "http://example.com/{Id}" ] ;\n'
            "  rr:predicateObjectMap [ rr:predicate ex:label ; "
            'rr:objectMap [ rml:reference "Name" ; rml:languageMap [ rml:reference "L" ] ] ]'
        ),
        {
            "d.json": "inline:"
            + '[{"Id": "10", "Name": "Venus", "L": "en-US"},'
            ' {"Id": "11", "Name": "Serena", "L": "not a tag!"}]'
        },
        {
            (EX + "10", "IRI", "http://example.org/label", "Venus", "Literal", None, "en-US", None),
        },
    ),
    # ---- round 8: R2RML direct-source shortcuts + graph-on-ROM themes ----
    (
        "RMLTC0010-tableName-theme",
        "logical source via rr:tableName only (R2RML direct table form)",
        'ex:m a rr:TriplesMap ;\n'
        '  rml:logicalSource [ rr:tableName "regions" ] ;\n'
        '  rr:subjectMap [ rr:template "http://example.com/region/{r_regionkey}" ] ;\n'
        '  rr:predicateObjectMap [ rr:predicate ex:name ; rr:objectMap [ rml:reference "r_name" ] ] .',
        {"regions": "table:/root/testdata/sf0.001/region.parquet"},
        {
            (EX + f"region/{k}", "IRI", "http://example.org/name", n, "Literal", None, None, None)
            for k, n in enumerate(["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"])
        },
    ),
    (
        "RMLTC-sqlVersion-theme",
        "rr:sqlVersion rr:SQL2008 annotation tolerated; rr:sqlQuery subsets the table",
        'ex:m a rr:TriplesMap ;\n'
        '  rml:logicalSource [ rr:tableName "regions" ; rr:sqlVersion rr:SQL2008 ;\n'
        '      rr:sqlQuery "SELECT r_regionkey, r_name FROM regions WHERE r_regionkey < 2" ] ;\n'
        '  rr:subjectMap [ rr:template "http://example.com/region/{r_regionkey}" ] ;\n'
        '  rr:predicateObjectMap [ rr:predicate ex:name ; rr:objectMap [ rml:reference "r_name" ] ] .',
        {"regions": "table:/root/testdata/sf0.001/region.parquet"},
        {
            (EX + "region/0", "IRI", "http://example.org/name", "AFRICA", "Literal", None, None, None),
            (EX + "region/1", "IRI", "http://example.org/name", "AMERICA", "Literal", None, None, None),
        },
    ),
    (
        "RMLTC0009-plain-join-theme",
        "plain R2RML rr:joinCondition [ rr:child ; rr:parent ] syntax",
        f"""
ex:student a rr:TriplesMap ;
  {_LS_JSON} ;
  rr:subjectMap [ rr:template "http://example.com/{{Id}}" ] ;
  rr:predicateObjectMap [
    rr:predicate ex:plays ;
    rr:objectMap [ rr:parentTriplesMap ex:sport ;
                   rr:joinCondition [ rr:child "Sport" ; rr:parent "ID" ] ] ] .
ex:sport a rr:TriplesMap ;
  rml:logicalSource [ rml:source "s.json" ; rml:iterator "$.[*]" ; rml:referenceFormulation ql:JSONPath ] ;
  rr:subjectMap [ rr:template "http://example.com/sport/{{ID}}" ] .
""",
        {"d.json": "inline:" + _STUDENTS, "s.json": "inline:" + _SPORTS},
        {
            (EX + "10", "IRI", "http://example.org/plays", EX + "sport/100", "IRI", None, None, None),
            (EX + "11", "IRI", "http://example.org/plays", EX + "sport/101", "IRI", None, None, None),
        },
    ),
    (
        "RMLTC0009c-rom-pom-graph-theme",
        "graph map on a referencing-object-map POM: join quads land in that graph",
        f"""
ex:student a rr:TriplesMap ;
  {_LS_JSON} ;
  rr:subjectMap [ rr:template "http://example.com/{{Id}}" ] ;
  rr:predicateObjectMap [
    rr:predicate ex:plays ;
    rr:graph ex:practice ;
    rr:objectMap [ rr:parentTriplesMap ex:sport ;
                   rr:joinCondition [ rr:child "Sport" ; rr:parent "ID" ] ] ] .
ex:sport a rr:TriplesMap ;
  rml:logicalSource [ rml:source "s.json" ; rml:iterator "$.[*]" ; rml:referenceFormulation ql:JSONPath ] ;
  rr:subjectMap [ rr:template "http://example.com/sport/{{ID}}" ] .
""",
        {"d.json": "inline:" + _STUDENTS, "s.json": "inline:" + _SPORTS},
        {
            (EX + "10", "IRI", "http://example.org/plays", EX + "sport/100", "IRI", None, None, "http://example.org/practice"),
            (EX + "11", "IRI", "http://example.org/plays", EX + "sport/101", "IRI", None, None, "http://example.org/practice"),
        },
    ),
    (
        "RMLTC0009d-rom-subject-graph-theme",
        "child subject graph applies to referencing-object-map quads (§11)",
        f"""
ex:student a rr:TriplesMap ;
  {_LS_JSON} ;
  rr:subjectMap [ rr:template "http://example.com/{{Id}}" ; rr:graph ex:g1 ] ;
  rr:predicateObjectMap [
    rr:predicate ex:plays ;
    rr:objectMap [ rr:parentTriplesMap ex:sport ;
                   rr:joinCondition [ rr:child "Sport" ; rr:parent "ID" ] ] ] .
ex:sport a rr:TriplesMap ;
  rml:logicalSource [ rml:source "s.json" ; rml:iterator "$.[*]" ; rml:referenceFormulation ql:JSONPath ] ;
  rr:subjectMap [ rr:template "http://example.com/sport/{{ID}}" ] .
""",
        {"d.json": "inline:" + _STUDENTS, "s.json": "inline:" + _SPORTS},
        {
            (EX + "10", "IRI", "http://example.org/plays", EX + "sport/100", "IRI", None, None, "http://example.org/g1"),
            (EX + "11", "IRI", "http://example.org/plays", EX + "sport/101", "IRI", None, None, "http://example.org/g1"),
        },
    ),
    (
        "RMLTC0009e-rom-graph-union-theme",
        "subject graph + POM graph on a ROM: §9 union, quads in both graphs",
        f"""
ex:student a rr:TriplesMap ;
  {_LS_JSON} ;
  rr:subjectMap [ rr:template "http://example.com/{{Id}}" ; rr:graph ex:g1 ] ;
  rr:predicateObjectMap [
    rr:predicate ex:plays ;
    rr:graph ex:practice ;
    rr:objectMap [ rr:parentTriplesMap ex:sport ;
                   rr:joinCondition [ rr:child "Sport" ; rr:parent "ID" ] ] ] .
ex:sport a rr:TriplesMap ;
  rml:logicalSource [ rml:source "s.json" ; rml:iterator "$.[*]" ; rml:referenceFormulation ql:JSONPath ] ;
  rr:subjectMap [ rr:template "http://example.com/sport/{{ID}}" ] .
""",
        {"d.json": "inline:" + _STUDENTS, "s.json": "inline:" + _SPORTS},
        {
            (EX + "10", "IRI", "http://example.org/plays", EX + "sport/100", "IRI", None, None, "http://example.org/g1"),
            (EX + "11", "IRI", "http://example.org/plays", EX + "sport/101", "IRI", None, None, "http://example.org/g1"),
            (EX + "10", "IRI", "http://example.org/plays", EX + "sport/100", "IRI", None, None, "http://example.org/practice"),
            (EX + "11", "IRI", "http://example.org/plays", EX + "sport/101", "IRI", None, None, "http://example.org/practice"),
        },
    ),
    (
        "RMLTC0002g-bnode-object-theme",
        "blank-node object map: same reference value = same node label",
        _m(
            'rr:subjectMap [ rr:template "http://example.com/{Id}" ] ;\n'
            "  rr:predicateObjectMap [ rr:predicate ex:addr ; "
            'rr:objectMap [ rr:template "addr{Zip}" ; rr:termType rr:BlankNode ] ]'
        ),
        {"d.json": "inline:" + '[{"Id": "10", "Zip": "01000"}, {"Id": "11", "Zip": "01000"}]'},
        {
            (EX + "10", "IRI", "http://example.org/addr", "addr01000", "BlankNode", None, None, None),
            (EX + "11", "IRI", "http://example.org/addr", "addr01000", "BlankNode", None, None, None),
        },
    ),
    (
        "RMLTC0001c-multi-class-theme",
        "several rr:class values: one type triple each",
        _m('rr:subjectMap [ rr:template "http://example.com/{Id}" ; rr:class foaf:Person, ex:Student ]'),
        {"d.json": "inline:" + '[{"Id": "10"}]'},
        {
            (EX + "10", "IRI", RDF_TYPE, FOAF + "Person", "IRI", None, None, None),
            (EX + "10", "IRI", RDF_TYPE, "http://example.org/Student", "IRI", None, None, None),
        },
    ),
    (
        "RMLTC0001d-subject-constant-theme",
        "rr:subject + rr:object constant shortcuts (§6.3)",
        'ex:m a rr:TriplesMap ;\n'
        f"  {_LS_JSON} ;\n"
        "  rr:subject ex:thing ;\n"
        "  rr:predicateObjectMap [ rr:predicate ex:sameAs ; rr:object ex:other ] .",
        {"d.json": "inline:" + '[{"Id": "10"}]'},
        {
            ("http://example.org/thing", "IRI", "http://example.org/sameAs", "http://example.org/other", "IRI", None, None, None),
        },
    ),
    (
        "RMLTC0004b-null-subject-theme",
        "record with null subject reference produces no triples for that row",
        _m(
            'rr:subjectMap [ rr:template "http://example.com/{Id}" ] ;\n'
            "  rr:predicateObjectMap [ rr:predicate foaf:name ; rr:objectMap [ rml:reference \"Name\" ] ]"
        ),
        {"d.json": "inline:" + '[{"Id": "10", "Name": "Venus"}, {"Id": null, "Name": "Ghost"}]'},
        {
            (EX + "10", "IRI", FOAF + "name", "Venus", "Literal", None, None, None),
        },
    ),
    (
        "RMLTC0016-datatypeMap-theme",
        "data-derived rml:datatypeMap: record value becomes the datatype, "
        "canonicalization applies at runtime, null value -> plain literal",
        _m(
            'rr:subjectMap [ rr:template "http://example.com/{Id}" ] ;\n'
            "  rr:predicateObjectMap [ rr:predicate foaf:name ; rr:objectMap [ "
            'rml:reference "Val" ; rml:datatypeMap [ rml:reference "Dt" ] ] ]'
        ),
        {"d.json": "inline:" + (
            '[{"Id": "1", "Val": "007", "Dt": "http://www.w3.org/2001/XMLSchema#integer"},'
            ' {"Id": "2", "Val": "20.0", "Dt": "http://www.w3.org/2001/XMLSchema#double"},'
            ' {"Id": "3", "Val": "007", "Dt": "http://example.com/custom"},'
            ' {"Id": "4", "Val": "007"}]'
        )},
        {
            (EX + "1", "IRI", FOAF + "name", "7", "Literal", XSD + "integer", None, None),
            (EX + "2", "IRI", FOAF + "name", "2.0E1", "Literal", XSD + "double", None, None),
            (EX + "3", "IRI", FOAF + "name", "007", "Literal", EX + "custom", None, None),
            (EX + "4", "IRI", FOAF + "name", "007", "Literal", None, None, None),
        },
    ),
    (
        "RMLTC0015-languageMap-theme",
        "data-derived rml:languageMap: valid tag attaches, null -> plain "
        "literal, ill-formed tag is a data error (quad drops)",
        _m(
            'rr:subjectMap [ rr:template "http://example.com/{Id}" ] ;\n'
            "  rr:predicateObjectMap [ rr:predicate foaf:name ; rr:objectMap [ "
            'rml:reference "Val" ; rml:languageMap [ rml:reference "Lang" ] ] ]'
        ),
        {"d.json": "inline:" + (
            '[{"Id": "1", "Val": "cat", "Lang": "en"},'
            ' {"Id": "2", "Val": "gato", "Lang": "es-MX"},'
            ' {"Id": "3", "Val": "chat"},'
            ' {"Id": "4", "Val": "bad", "Lang": "not a tag"},'
            ' {"Id": "5", "Val": "bad2", "Lang": "abcdefghi"}]'
        )},
        {
            (EX + "1", "IRI", FOAF + "name", "cat", "Literal", None, "en", None),
            (EX + "2", "IRI", FOAF + "name", "gato", "Literal", None, "es-MX", None),
            (EX + "3", "IRI", FOAF + "name", "chat", "Literal", None, None, None),
        },
    ),
    (
        "RMLTC0002-jsonpath-descent-theme",
        "recursive-descent iterator $..items[*] explodes every nested match",
        (
            "ex:m a rr:TriplesMap ;\n"
            '  rml:logicalSource [ rml:source "d.json" ; rml:iterator "$..items[*]" ; '
            "rml:referenceFormulation ql:JSONPath ] ;\n"
            '  rr:subjectMap [ rr:template "http://example.com/{Id}" ] ;\n'
            "  rr:predicateObjectMap [ rr:predicate foaf:name ; "
            'rr:objectMap [ rml:reference "Name" ] ] .\n'
        ),
        {"d.json": "inline:" + (
            '{"east": {"items": [{"Id": "1", "Name": "a"}]},'
            ' "west": {"deep": {"items": [{"Id": "2", "Name": "b"}]}}}'
        )},
        {
            (EX + "1", "IRI", FOAF + "name", "a", "Literal", None, None, None),
            (EX + "2", "IRI", FOAF + "name", "b", "Literal", None, None, None),
        },
    ),
    (
        "RMLTC0004c-null-predicate-theme",
        "data-dependent predicate map over a null reference produces NO "
        "triple (R2RML data error), not a NULL-predicate quad",
        _m(
            'rr:subjectMap [ rr:template "http://example.com/{Id}" ] ;\n'
            "  rr:predicateObjectMap [ rr:predicateMap [ rr:template "
            '"http://example.com/p/{PName}" ] ; rr:objectMap [ rml:reference "Val" ] ]'
        ),
        {"d.json": "inline:" + (
            '[{"Id": "1", "PName": "x", "Val": "v1"},'
            ' {"Id": "2", "Val": "v2"}]'
        )},
        {
            (EX + "1", "IRI", EX + "p/x", "v1", "Literal", None, None, None),
        },
    ),
    (
        "RMLTC0007j-null-pom-graph-theme",
        "POM template graph map over a null reference drops that graph "
        "copy; a subject-graph copy survives",
        _m(
            'rr:subjectMap [ rr:template "http://example.com/{Id}" ; '
            "rr:graphMap [ rr:constant <http://example.com/sg> ] ] ;\n"
            "  rr:predicateObjectMap [ rr:predicate foaf:name ; "
            'rr:objectMap [ rml:reference "Val" ] ; '
            'rr:graphMap [ rr:template "http://example.com/g/{G}" ] ]'
        ),
        {"d.json": "inline:" + (
            '[{"Id": "1", "Val": "a", "G": "g1"}, {"Id": "2", "Val": "b"}]'
        )},
        {
            (EX + "1", "IRI", FOAF + "name", "a", "Literal", None, None, EX + "sg"),
            (EX + "1", "IRI", FOAF + "name", "a", "Literal", None, None, EX + "g/g1"),
            (EX + "2", "IRI", FOAF + "name", "b", "Literal", None, None, EX + "sg"),
        },
    ),
    (
        "RMLTC0006-pom-lists-theme",
        "R2RML §6.3: multiple predicateMaps x objectMaps in ONE POM emit "
        "the full cross product",
        _m(
            'rr:subjectMap [ rr:template "http://example.com/{Id}" ] ;\n'
            "  rr:predicateObjectMap [ rr:predicateMap [ rr:constant foaf:name ] ; "
            "rr:predicateMap [ rr:constant foaf:nick ] ; "
            'rr:objectMap [ rml:reference "A" ] ; rr:objectMap [ rml:reference "B" ] ]'
        ),
        {"d.json": "inline:" + '[{"Id": "1", "A": "x", "B": "y"}]'},
        {
            (EX + "1", "IRI", FOAF + "name", "x", "Literal", None, None, None),
            (EX + "1", "IRI", FOAF + "name", "y", "Literal", None, None, None),
            (EX + "1", "IRI", FOAF + "nick", "x", "Literal", None, None, None),
            (EX + "1", "IRI", FOAF + "nick", "y", "Literal", None, None, None),
        },
    ),
]


def _quads(df):
    return {
        (r["s"], r["s_termtype"], r["p"], r["o"], r["o_termtype"],
         r["o_datatype"], r["o_lang"], r["g"])
        for r in df.collect()
    }


@pytest.mark.parametrize("case", CASES, ids=[c[0] for c in CASES])
def test_conformance_case(spark, case):
    case_id, theme, mapping, sources, expected = case
    if expected == "MappingParseError":
        from rml_utils_processor_ts_spark.plans.rml_parser import MappingParseError

        with pytest.raises(MappingParseError):
            execute_mapping(spark, mapping, sources)
        return
    res = execute_mapping(spark, mapping, sources)
    assert _quads(res.triples) == expected, f"{case_id}: {theme}"


def test_iri_validation_statically_gated():
    """Perf contract for the RMLTC0002e filter (A/B/A r6 window 1
    measured the unconditional version at ~9% suite-wide): plans whose
    IRI terms are all templates-with-literal-scheme or valid constants
    skip the runtime regex filter entirely; reference-/function-sourced
    IRI terms, placeholder-leading templates, and invalid constants
    turn it on. No Spark session needed — this is plan-time analysis."""
    from rml_utils_processor_ts_spark.operators.executor import _plan_iri_check_positions
    from rml_utils_processor_ts_spark.plans.rml_parser import parse_mapping

    def plan(subject, om):
        return parse_mapping(f"""
ex:m a rr:TriplesMap ;
  rml:logicalSource [ rml:source "x" ; rml:referenceFormulation ql:CSV ] ;
  rr:subjectMap [ {subject} ] ;
  rr:predicateObjectMap [ rr:predicate ex:p ; rr:objectMap [ {om} ] ] .
""")

    tpl = 'rr:template "http://ex.org/c/{k}"'
    assert _plan_iri_check_positions(plan(tpl, 'rml:reference "v"')) == set()  # literal object
    assert _plan_iri_check_positions(plan(tpl, "rr:constant <http://ex.org/o>")) == set()
    # r7: the filter is per-POSITION — a data-dependent object turns on
    # only the o-column check, not 8 rlikes across the quad
    assert _plan_iri_check_positions(plan(tpl, 'rml:reference "v" ; rr:termType rr:IRI')) == {"o"}
    assert _plan_iri_check_positions(plan('rr:template "{scheme}://x/{k}"', 'rml:reference "v"')) == {"s"}
    assert _plan_iri_check_positions(plan('rml:reference "u"', 'rml:reference "v"')) == {"s"}
    # bad template literal (space in the constant part) -> runtime filter
    assert _plan_iri_check_positions(plan('rr:template "http://ex.org/a b/{k}"', 'rml:reference "v"')) == {"s"}
    # blank-node subject template: nothing to validate
    assert _plan_iri_check_positions(
        plan('rr:template "b{k}" ; rr:termType rr:BlankNode', 'rml:reference "v"')
    ) == set()
    # referencing object map over a data-dependent parent subject: the
    # parent IRI lands in the o column of the join quads
    join_plan = parse_mapping("""
ex:child a rr:TriplesMap ;
  rml:logicalSource [ rml:source "x" ; rml:referenceFormulation ql:CSV ] ;
  rr:subjectMap [ rr:template "http://ex.org/c/{k}" ] ;
  rr:predicateObjectMap [ rr:predicate ex:p ; rr:objectMap [
      rr:parentTriplesMap ex:parent ;
      rml:joinCondition [ fnml:functionValue [
        rr:predicateObjectMap [ rr:predicate fno:executes ; rr:objectMap [ rr:constant idlab-fn:equal ] ] ;
        rr:predicateObjectMap [ rr:predicate grel:valueParameter ; rr:objectMap [ rml:reference "k" ] ] ;
        rr:predicateObjectMap [ rr:predicate grel:valueParameter2 ; rr:objectMap [ rr:parentTermMap [ rml:reference "u" ] ] ]
      ] ] ] ] .
ex:parent a rr:TriplesMap ;
  rml:logicalSource [ rml:source "y" ; rml:referenceFormulation ql:CSV ] ;
  rr:subjectMap [ rml:reference "u" ; rr:termType rr:IRI ] .
""")
    assert _plan_iri_check_positions(join_plan) == {"s", "o"}


def test_base_iri_resolution(spark):
    """@base resolves relative IRIREFs and relative IRI-position
    templates (RMLTC0002c/0003 themes); literal-position and
    languageMap templates stay untouched."""
    mapping = """
@base <http://example.com/base/> .
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix rml: <http://semweb.mmlab.be/ns/rml#> .
@prefix ql: <http://semweb.mmlab.be/ns/ql#> .
@prefix ex: <http://example.org/> .
<#m> a rr:TriplesMap ;
  rml:logicalSource [ rml:source "d.json" ; rml:iterator "$.[*]" ;
      rml:referenceFormulation ql:JSONPath ] ;
  rr:subjectMap [ rr:template "student/{Id}" ] ;
  rr:predicateObjectMap [ rr:predicate ex:ref ; rr:objectMap [ rr:constant <other/thing> ] ] ;
  rr:predicateObjectMap [ rr:predicate ex:label ;
      rr:objectMap [ rr:template "row {Id}" ; rr:termType rr:Literal ] ] .
"""
    res = execute_mapping(spark, mapping, {"d.json": "inline:" + '[{"Id": "10"}]'})
    got = {(r["s"], r["p"], r["o"], r["o_termtype"]) for r in res.triples.collect()}
    assert got == {
        ("http://example.com/base/student/10", "http://example.org/ref",
         "http://example.com/base/other/thing", "IRI"),
        ("http://example.com/base/student/10", "http://example.org/label",
         "row 10", "Literal"),
    }
