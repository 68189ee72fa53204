"""Partitioned triple-table materialization + per-partition lineage rows.

North-star obligations (BASELINE.json north_rule): the graph materializes
as partitioned tables, and every run writes lineage rows (url range,
triple counts, stage metrics) committed with the data so a killed job
resumes from the last committed snapshot.

Sandbox: parquet snapshot dirs + LATEST pointer (same layout as
operators/cdc.StateStore); on a cluster this is
``df.writeTo(table).append()`` on Iceberg with lineage in the same
transaction. Partitioning: quads bucket by predicate + subject-hash —
predicate is the natural pruning dimension for KG queries, the subject
hash spreads hot predicates (rdf:type!) across buckets.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_SCHEMA = (
    "run_id string, target_id string, bucket int, n_triples long, "
    "min_subject string, max_subject string, wall_sec double, "
    "min_source_url string, max_source_url string"
)


def write_triple_table(
    df: DataFrame,
    path: str,
    run_id: str,
    n_buckets: int = 16,
    source_url_range: tuple[str, str] | None = None,
    stage_metrics: dict | None = None,
) -> dict:
    """Materialize triples partitioned by subject-hash bucket; write
    lineage rows for the same snapshot; atomically repoint LATEST.
    Returns the lineage summary dict.

    ``source_url_range`` (min_url, max_url of the pages snapshot this
    run consumed) stamps every lineage row, and ``stage_metrics``
    (per-stage wall seconds etc.) lands in the snapshot's summary.json
    — both commit WITH the data (before the LATEST repoint), per the
    north rule's "source url range, triple counts, stage metrics"
    lineage obligation: a resumed job can see exactly which input range
    each committed snapshot covered and where time went."""
    spark = df.sparkSession
    t0 = time.time()
    version = _latest_version(path) + 1
    snap_dir = os.path.join(path, f"v_{version}")

    bucketed = df.withColumn("bucket", F.pmod(F.xxhash64("s"), F.lit(n_buckets)).cast("int"))
    bucketed.write.mode("overwrite").partitionBy("bucket").parquet(os.path.join(snap_dir, "data"))

    min_url, max_url = source_url_range or (None, None)
    lineage = (
        spark.read.parquet(os.path.join(snap_dir, "data"))
        .groupBy("bucket", "target_id")
        .agg(
            F.count("*").alias("n_triples"),
            F.min("s").alias("min_subject"),
            F.max("s").alias("max_subject"),
        )
        .withColumn("run_id", F.lit(run_id))
        .withColumn("wall_sec", F.lit(time.time() - t0))
        .withColumn("min_source_url", F.lit(min_url).cast("string"))
        .withColumn("max_source_url", F.lit(max_url).cast("string"))
        .select(
            "run_id", "target_id", "bucket", "n_triples", "min_subject",
            "max_subject", "wall_sec", "min_source_url", "max_source_url",
        )
    )
    lineage.write.mode("overwrite").parquet(os.path.join(snap_dir, "lineage"))

    wall = time.time() - t0
    # materialize_sec is stamped HERE so the persisted summary.json and
    # the dict returned to run_pipeline carry the same stage_metrics —
    # patching it in after the write left the on-disk lineage record
    # permanently missing the materialization timing (ADVICE r5).
    metrics = dict(stage_metrics or {})
    metrics["materialize_sec"] = round(wall, 3)
    summary = {
        "run_id": run_id,
        "version": version,
        "n_triples": sum(r["n_triples"] for r in lineage.select("n_triples").collect()),
        "wall_sec": wall,
        "source_url_range": list(source_url_range) if source_url_range else None,
        "stage_metrics": metrics,
    }
    with open(os.path.join(snap_dir, "summary.json"), "w") as fh:
        json.dump(summary, fh)
    tmp = os.path.join(path, "LATEST.tmp")
    with open(tmp, "w") as fh:
        fh.write(str(version))
    os.replace(tmp, os.path.join(path, "LATEST"))
    return summary


def _latest_version(path: str) -> int:
    pointer = os.path.join(path, "LATEST")
    if not os.path.exists(pointer):
        os.makedirs(path, exist_ok=True)
        return 0
    with open(pointer) as fh:
        return int(fh.read().strip())


def read_triple_table(spark: SparkSession, path: str) -> DataFrame:
    v = _latest_version(path)
    if v == 0:
        raise FileNotFoundError(f"no committed snapshot under {path}")
    return spark.read.parquet(os.path.join(path, f"v_{v}", "data"))


def write_bucketed_table(
    df: DataFrame,
    name: str,
    path: str,
    key: str,
    n_buckets: int = 16,
) -> None:
    """Persist a table hash-BUCKETED (and sorted) by the join key —
    Spark's co-located-join primitive: two tables bucketed the same way
    join with ZERO Exchange on either side (the sandbox analog of
    Iceberg bucket partition transforms). Use for dimension/fact pairs
    that join repeatedly on the same key (referencing object maps,
    entity-linking dictionaries, CDC state): the shuffle is paid once at
    write time instead of per query."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .format("parquet")
        .saveAsTable(name)
    )


def completed_runs(spark: SparkSession, path: str) -> set[str]:
    """Resume support: run ids whose lineage is already committed — the
    planner skips them (north_rule resumability)."""
    v = _latest_version(path)
    if v == 0:
        return set()
    lineage = spark.read.parquet(os.path.join(path, f"v_{v}", "lineage"))
    return {r["run_id"] for r in lineage.select("run_id").distinct().collect()}
