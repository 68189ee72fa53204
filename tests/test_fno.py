"""FnO registry tests: GREL string functions in object maps + the
user-extensible registration API."""

import pytest
from pyspark.sql import functions as F

from rml_utils_processor_ts_spark.functions.fno import register_function
from rml_utils_processor_ts_spark.operators.executor import execute_mapping

DOC = '[{"id": "1", "name": "  Hello World  "}]'


def _mapping(fn_block: str) -> str:
    return f"""
ex:m a rr:TriplesMap ;
    rml:logicalSource [ rml:source "d.json" ; rml:iterator "$.[*]" ;
        rml:referenceFormulation ql:JSONPath ] ;
    rr:subjectMap [ rr:template "http://x/{{id}}" ] ;
    rr:predicateObjectMap [
        rr:predicateMap [ rr:constant <http://x/v> ] ;
        rr:objectMap [ a fnml:FunctionTermMap ; fnml:functionValue [
            {fn_block}
        ] ]
    ] .
"""


def _run(spark, fn_block):
    res = execute_mapping(spark, _mapping(fn_block), {"d.json": "inline:" + DOC})
    return [r["o"] for r in res.triples.collect() if r["p"] == "http://x/v"][0]


def test_grel_upper_lower_trim(spark):
    upper = _run(
        spark,
        """rr:predicateObjectMap [ rr:predicate fno:executes ; rr:objectMap [ rr:constant <http://users.ugent.be/~bjdmeest/function/grel.ttl#toUpperCase> ] ] ;
           rr:predicateObjectMap [ rr:predicate grel:valueParameter ; rr:objectMap [ rml:reference "name" ] ]""",
    )
    assert upper == "  HELLO WORLD  "
    trimmed = _run(
        spark,
        """rr:predicateObjectMap [ rr:predicate fno:executes ; rr:objectMap [ rr:constant <http://users.ugent.be/~bjdmeest/function/grel.ttl#trim> ] ] ;
           rr:predicateObjectMap [ rr:predicate grel:valueParameter ; rr:objectMap [ rml:reference "name" ] ]""",
    )
    assert trimmed == "Hello World"


def test_grel_string_replace(spark):
    out = _run(
        spark,
        """rr:predicateObjectMap [ rr:predicate fno:executes ; rr:objectMap [ rr:constant <http://users.ugent.be/~bjdmeest/function/grel.ttl#string_replace> ] ] ;
           rr:predicateObjectMap [ rr:predicate grel:valueParameter ; rr:objectMap [ rml:reference "name" ] ] ;
           rr:predicateObjectMap [ rr:predicate <http://users.ugent.be/~bjdmeest/function/grel.ttl#p_string_find> ; rr:objectMap [ rr:constant "World" ] ] ;
           rr:predicateObjectMap [ rr:predicate <http://users.ugent.be/~bjdmeest/function/grel.ttl#p_string_replace> ; rr:objectMap [ rr:constant "Spark" ] ]""",
    )
    assert out == "  Hello Spark  "


def test_register_custom_function(spark):
    register_function(
        "http://ex.org/fn/reverse",
        lambda fn, ct: F.reverse(ct(next(iter(fn.params.values())), "value")),
    )
    out = _run(
        spark,
        """rr:predicateObjectMap [ rr:predicate fno:executes ; rr:objectMap [ rr:constant <http://ex.org/fn/reverse> ] ] ;
           rr:predicateObjectMap [ rr:predicate grel:valueParameter ; rr:objectMap [ rml:reference "id" ] ]""",
    )
    assert out == "1"


def test_unknown_function_actionable_error(spark):
    with pytest.raises(Exception, match="register_function"):
        _run(
            spark,
            """rr:predicateObjectMap [ rr:predicate fno:executes ; rr:objectMap [ rr:constant <http://ex.org/fn/never-registered> ] ] ;
               rr:predicateObjectMap [ rr:predicate grel:valueParameter ; rr:objectMap [ rml:reference "id" ] ]""",
        )
