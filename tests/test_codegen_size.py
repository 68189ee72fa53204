"""Round-10 codegen-size guard: a projection stacking MANY runtime
rml:datatypeMap canonicalization CASEs must stay in whole-stage codegen.

The round-9 fuzz found that inlining several datatypeMap CASE chains
(each carrying four canonical_* regexp chains) into one Generate's
struct array can exceed janino's method-size limit — Spark then logs
"failed to compile" / "Found too long generated codes" and silently
drops the stage to interpreted evaluation. The executor now stages each
datatypeMap object as a named projection column (its own codegen
method) before the explode; these tests pin both the values and the
absence of the compile-failure log lines.
"""

from __future__ import annotations

import json

from rml_utils_processor_ts_spark.operators.executor import execute_mapping

XSD = "http://www.w3.org/2001/XMLSchema#"

_N = 24  # the old inline form trips janino at ~16 CASE chains


def _mapping(n: int) -> str:
    poms = "\n".join(
        f'  rr:predicateObjectMap [ rr:predicate <http://example.org/p{i}> ; '
        f'rr:objectMap [ rml:reference "V{i}" ; '
        f'rml:datatypeMap [ rr:template "{XSD}{{T{i}}}" ] ] ] ;'
        for i in range(n)
    )
    return (
        "ex:m a rr:TriplesMap ;\n"
        '  rml:logicalSource [ rml:source "d.json" ; rml:iterator "$.[*]" ;\n'
        "      rml:referenceFormulation ql:JSONPath ] ;\n"
        '  rr:subjectMap [ rr:template "http://example.com/{Id}" ] ;\n'
        f"{poms}\n"
        "  .\n"
    )


def _doc(n: int) -> str:
    row = {"Id": "1"}
    for i in range(n):
        # alternate datatypes so every canonical_* branch is exercised
        row[f"V{i}"] = ["05", "4.60", "1", "20.0"][i % 4]
        row[f"T{i}"] = ["integer", "decimal", "boolean", "double"][i % 4]
    return json.dumps([row])


_EXPECT = {"integer": "5", "decimal": "4.6", "boolean": "true", "double": "2.0E1"}


def test_many_datatype_maps_values(spark):
    res = execute_mapping(
        spark, _mapping(_N), {"d.json": "inline:" + _doc(_N)}
    )
    rows = {
        r["p"]: (r["o"], r["o_datatype"])
        for r in res.triples.collect()
    }
    assert len(rows) == _N
    for i in range(_N):
        t = ["integer", "decimal", "boolean", "double"][i % 4]
        assert rows[f"http://example.org/p{i}"] == (_EXPECT[t], XSD + t)


def test_many_datatype_maps_stay_compiled(spark):
    """The generated stage must actually compile.

    With ``spark.sql.codegen.fallback=false`` a janino failure ("Code
    ... grows beyond 64 KB", the r9 fuzz marker) raises instead of
    silently dropping the stage to interpreted evaluation — so plain
    successful execution IS the assertion. The pre-fix executor (CASE
    chains inlined into the Generate's struct array) fails this test at
    _N=24; the staged-column form compiles each chain as its own
    method."""
    before = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        res = execute_mapping(
            spark, _mapping(_N), {"d.json": "inline:" + _doc(_N)}
        )
        assert res.triples.count() == _N
    finally:
        spark.conf.set("spark.sql.codegen.fallback", before)
