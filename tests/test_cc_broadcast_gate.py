"""r10: the label-broadcast gate in the hashmin loop is plan-only.

The loop hints the pointer-jump map and the convergence-probe label
sides broadcast when |V| is under RML_CC_BROADCAST_MAX_NODES (the
checkpointed label table carries no size statistics, so Catalyst can
never choose the broadcast join itself). The hint must not change the
labeling: this pins the gated path against the forced-shuffle path on a
graph that exercises multi-round convergence (deep chain + hub), and
pins the gate's off-switch.
"""

from __future__ import annotations

import hashlib
import os

import pytest


@pytest.fixture(scope="module")
def graph_edges():
    edges = [(f"c{i:04d}", f"c{i + 1:04d}") for i in range(120)]
    for i in range(300):
        h = int(hashlib.md5(f"bg{i}".encode()).hexdigest()[:8], 16)
        a, b = f"n{h % 150:04d}", f"n{(h // 150) % 150:04d}"
        if a != b:
            edges.append((a, b))
    edges += [("hub", f"n{i:04d}") for i in range(25)]
    return edges


def _labels(spark, edges, max_nodes: str):
    from rml_utils_processor_ts_spark.operators.cc import connected_components

    before = os.environ.get("RML_CC_BROADCAST_MAX_NODES")
    os.environ["RML_CC_BROADCAST_MAX_NODES"] = max_nodes
    try:
        df = spark.createDataFrame(edges, "src string, dst string")
        return {(r["node"], r["component"]) for r in connected_components(df).collect()}
    finally:
        if before is None:
            del os.environ["RML_CC_BROADCAST_MAX_NODES"]
        else:
            os.environ["RML_CC_BROADCAST_MAX_NODES"] = before


def test_cc_broadcast_gate_identical_labeling(spark, graph_edges):
    bcast = _labels(spark, graph_edges, "2000000")   # gate fires (tiny |V|)
    shuffle = _labels(spark, graph_edges, "0")       # gate forced off
    assert bcast == shuffle and bcast
    comps = {c for _, c in bcast}
    assert "c0000" in comps  # the chain collapsed to its min node
