"""CC round-structure experiment (r9, VERDICT task #6).

`cc_components` is the suite's most expensive query (8.9 s median at
sf0.1); its cost is rounds x per-round jobs. This tool measures three
loop structures on the stress graphs, interleaved A B C | A B C ... in
ONE JVM so host drift hits every variant equally:

  A  current: alternating large-star/small-star, TWO localCheckpoints
     per round (after each star step) + chain-check job.
  B  same algorithm, ONE localCheckpoint per round (only after the
     small-star step; the large-star intermediate stays lazy). The
     mid-round checkpoint predates the constraint-propagation root fix
     for the Spark 4.1.2 crash — if plans stay stable without it, a
     whole eager job per round disappears.
  C  hash-to-min label propagation with pointer jumping: static edge
     table, label table (node, comp); per round one propagate
     (join+groupBy-min) and one jump (self-join), one checkpoint.
     O(log d) rounds via doubling; convergence = label-set signature.

Exactness: every variant must reproduce the golden component count on
each graph, and B/C must match A's full (node, component) labeling
exactly (exceptAll both ways == 0) on the first rep.

Graphs: the 4.1M-edge chain+hub stress (tools/stress_cc.py shape) and
the gated sf0.1 orders->customer->nation graph.

Usage: python tools/cc_experiment.py [reps] [--small]
Writes one JSON line per (graph, variant, rep) to stdout and a summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from rml_utils_processor_ts_spark import get_spark  # noqa: E402
from rml_utils_processor_ts_spark.operators.cc import (  # noqa: E402
    _canonical_edges,
    _materialize,
    _min_neighbor,
    connected_components,
    constraint_propagation_disabled,
)

ROUNDS = {"variant": None, "rounds": 0}  # filled per run


def _finish(e: DataFrame) -> DataFrame:
    nodes = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = (
        e.select(F.col("v").alias("node"))
        .distinct()
        .join(e.select(F.col("u").alias("node")).distinct(), "node", "left_anti")
        .withColumn("component", F.col("node"))
    )
    return nodes.union(roots).groupBy("node").agg(F.min("component").alias("component"))


def cc_variant_b(edges: DataFrame, max_iterations: int = 25) -> DataFrame:
    """Alternating star steps, ONE materialization per round."""
    spark = edges.sparkSession
    with constraint_propagation_disabled(spark):
        e = _materialize(_canonical_edges(edges))
        rounds = 0
        for _ in range(max_iterations):
            rounds += 1
            sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
            mn = _min_neighbor(sym.union(sym.select(F.col("u"), F.col("u").alias("v"))))
            e2 = (
                sym.filter(F.col("v") > F.col("u"))
                .join(mn, F.col("u") == F.col("mu"))
                .select(F.col("v").alias("u"), F.col("mn").alias("v"))
                .filter(F.col("u") != F.col("v"))
                .distinct()
            )
            mn2 = _min_neighbor(e2.union(e2.select(F.col("u"), F.col("u").alias("v"))))
            j = e2.join(mn2, F.col("u") == F.col("mu")).select("u", "v", "mn")
            small = j.select(F.col("u"), F.col("mn").alias("v")).union(
                j.select(F.col("v").alias("u"), F.col("mn").alias("v"))
            )
            e = _materialize(small.filter(F.col("u") != F.col("v")).distinct())
            chains = (
                e.alias("a")
                .join(e.alias("b"), F.col("a.v") == F.col("b.u"), "inner")
                .filter(F.col("b.v") < F.col("a.v"))
                .limit(1)
                .count()
            )
            if chains == 0:
                break
        ROUNDS.update(variant="B", rounds=rounds)
        return _finish(e)


def cc_variant_c(edges: DataFrame, max_iterations: int = 25) -> DataFrame:
    """Hash-to-min label propagation + pointer jumping over a static
    symmetric edge table."""
    spark = edges.sparkSession
    with constraint_propagation_disabled(spark):
        e = _materialize(_canonical_edges(edges))
        sym = _materialize(
            e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        )
        lab = _materialize(
            sym.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select(
                F.col("u").alias("node"),
                F.least(F.col("u"), F.col("mn")).alias("comp"),
            )
        )
        prev_sig = None
        rounds = 0
        for _ in range(max_iterations):
            rounds += 1
            # propagate: comp'(v) = min(comp(v), min over neighbors comp(u))
            upd = sym.join(lab, sym["u"] == lab["node"]).select(
                F.col("v").alias("node"), F.col("comp")
            )
            lab2 = (
                lab.select("node", "comp")
                .union(upd)
                .groupBy("node")
                .agg(F.min("comp").alias("comp"))
            )
            # pointer jump: comp''(v) = comp'(comp'(v)) — alias-qualified
            # (derived-frame df["col"] refs mis-resolve on self-joins)
            m = lab2.select(
                F.col("node").alias("jn"), F.col("comp").alias("jc")
            )
            lab = _materialize(
                lab2.alias("L")
                .join(m.alias("R"), F.col("L.comp") == F.col("R.jn"), "left")
                .select(
                    F.col("L.node").alias("node"),
                    F.least(
                        F.col("L.comp"),
                        F.coalesce(F.col("R.jc"), F.col("L.comp")),
                    ).alias("comp"),
                )
            )
            sig_row = lab.agg(
                F.count("*").alias("n"),
                F.expr("bit_xor(xxhash64(node, comp))").alias("h"),
            ).collect()[0]
            sig = (sig_row["n"], sig_row["h"])
            if sig == prev_sig:
                break
            prev_sig = sig
        ROUNDS.update(variant="C", rounds=rounds)
        return lab.select("node", F.col("comp").alias("component"))


def cc_variant_a(edges: DataFrame) -> DataFrame:
    ROUNDS.update(variant="A", rounds=-1)  # rounds not instrumented in package loop
    return connected_components(edges)


def build_stress(spark, n_chains: int, chain_len: int, n_spokes: int):
    chain_links = (
        spark.range(n_chains * (chain_len - 1), numPartitions=64)
        .select(
            (F.col("id") / (chain_len - 1)).cast("long").alias("c"),
            (F.col("id") % (chain_len - 1)).alias("p"),
        )
        .select(
            F.format_string("c%06d_%02d", "c", "p").alias("src"),
            F.format_string("c%06d_%02d", "c", F.col("p") + 1).alias("dst"),
        )
    )
    spokes = spark.range(n_spokes).select(
        F.lit("hub").alias("src"), F.format_string("s%06d", "id").alias("dst")
    )
    path = "/dev/shm/cc_exp_stress"
    chain_links.unionByName(spokes).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path), n_chains + 1


def build_sf01(spark):
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    e1 = customer.select(
        F.format_string("c:%08d", F.col("c_custkey")).alias("src"),
        F.format_string("n:%08d", F.col("c_nationkey")).alias("dst"),
    )
    e2 = orders.select(
        F.format_string("o:%08d", F.col("o_orderkey")).alias("src"),
        F.format_string("c:%08d", F.col("o_custkey")).alias("dst"),
    )
    path = "/dev/shm/cc_exp_sf01"
    e1.union(e2).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path), 25  # one component per nation


VARIANTS = {"A": cc_variant_a, "B": cc_variant_b, "C": cc_variant_c}


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    small = "--small" in sys.argv
    spark = get_spark("cc-experiment", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    if small:
        stress, stress_golden = build_stress(spark, 2_000, 40, 2_000)
    else:
        stress, stress_golden = build_stress(spark, 100_000, 40, 100_000)
    sf01, sf01_golden = build_sf01(spark)
    graphs = [("stress", stress, stress_golden), ("sf01", sf01, sf01_golden)]

    # warmup + exactness gate: run every variant once per graph, compare
    # full labelings to A's
    baselines = {}
    for gname, gdf, golden in graphs:
        for vname, fn in VARIANTS.items():
            comp = fn(gdf).cache()
            ncomp = comp.select("component").distinct().count()
            assert ncomp == golden, f"{vname}/{gname}: {ncomp} != {golden}"
            if vname == "A":
                baselines[gname] = comp
            else:
                a = baselines[gname]
                d1 = comp.exceptAll(a).count()
                d2 = a.exceptAll(comp).count()
                assert d1 == 0 and d2 == 0, f"{vname}/{gname}: labeling differs A ({d1},{d2})"
                comp.unpersist()
            print(json.dumps({"phase": "exactness", "graph": gname, "variant": vname,
                              "n_components": ncomp, "rounds": ROUNDS["rounds"], "ok": True}),
                  flush=True)
        baselines[gname].unpersist()

    results = []
    for rep in range(reps):
        for gname, gdf, _golden in graphs:
            for vname, fn in VARIANTS.items():
                t0 = time.time()
                n = fn(gdf).select("component").distinct().count()
                dt = time.time() - t0
                rec = {"phase": "timed", "rep": rep, "graph": gname, "variant": vname,
                       "sec": round(dt, 2), "rounds": ROUNDS["rounds"], "n": n}
                results.append(rec)
                print(json.dumps(rec), flush=True)

    summary = {}
    for gname, *_ in graphs:
        summary[gname] = {}
        for vname in VARIANTS:
            ts = sorted(r["sec"] for r in results if r["graph"] == gname and r["variant"] == vname)
            summary[gname][vname] = ts[len(ts) // 2]
    print(json.dumps({"phase": "summary", "medians": summary}), flush=True)


if __name__ == "__main__":
    main()
