"""The walker iterate UDF must be evaluated once per row, not twice.

Spark's InferFiltersFromGenerate rule adds ``size(__records) > 0`` below
the explode that follows the Arrow iterate UDF; with a deterministic UDF
predicate pushdown substitutes the UDF expression into that filter, so
the physical plan holds TWO ArrowEvalPython nodes and every walker-routed
row pays the Python boundary twice (guide §4.4 — observed in the r10
pages/xpath/jsonpath plans). The UDF is marked non-deterministic (it is
pure; the flag only stops the optimizer duplicating it), which pins the
plan to a single ArrowEvalPython. These tests assert both the plan shape
and that results are unchanged.
"""

from __future__ import annotations

import contextlib
import io

from rml_utils_processor_ts_spark.sources.registry import _python_iterate_records


def _walker_records(spark):
    docs = spark.createDataFrame(
        [
            ('<r xmlns="urn:x"><data id="a" label="l1"></data><data id="b" label="l2"></data></r>',),
            ("<r><data id='c' label='l3'><data id='d' label='l4'></data></data></r>",),
            (None,),
        ],
        "doc string",
    )
    return _python_iterate_records(docs, "doc", "xpath", "//data", ["@id", "@label"], [])


def test_walker_plan_has_single_arrow_eval(spark):
    recs = _walker_records(spark)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        recs.explain("formatted")
    plan = buf.getvalue()
    # one node = one tree line + one detail header
    assert plan.count("ArrowEvalPython") == 2, plan


def test_walker_results_unchanged(spark):
    rows = sorted(tuple(r) for r in _walker_records(spark).collect())
    # nested <data id='d'> is found by the tree walker; namespaced doc too
    assert rows == [("a", "l1"), ("b", "l2"), ("c", "l3"), ("d", "l4")]
