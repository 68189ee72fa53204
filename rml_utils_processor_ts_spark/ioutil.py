"""Input-scan helpers (guide: shuffles/partitioning + I/O layout).

``spread_small_scan`` rescues map-side parallelism for tiny inputs: a
single-file, single-row-group parquet table scans as ONE task no matter
how many cores the session has (parquet splits cannot cross row-group
boundaries), so every expression over it — regex chains, md5 shingling,
template projection — runs on one core of local[32]. When the input is
small enough that one round-robin pass is essentially free, repartition
to the session's default parallelism; when the input is large (real
scale), the gate never fires and the scan keeps its native splits.

The gate is derived from the actual input layout (file count + bytes),
not from a constant tuned to the sandbox: at 100 TB every table has
thousands of splits and this is a no-op.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# inputs larger than this are "real" scans — never add a spreading
# shuffle for them (env-tunable; 256 MB default keeps the worst-case
# round-robin pass well under a second on any modern node)
_SPREAD_MAX_BYTES = int(os.environ.get("RML_SPREAD_SCAN_MAX_MB", "256")) * 1024 * 1024


def _local_path(uri: str) -> str:
    if uri.startswith("file://"):
        return uri[len("file://"):]
    if uri.startswith("file:"):
        return uri[len("file:"):]
    return uri


def spread_small_scan(df: DataFrame) -> DataFrame:
    """Round-robin a small, under-split scan across the session's cores.

    Fires only when BOTH hold:
      * the scan has fewer input files than the session's default
        parallelism (a proxy for "fewer splits than cores": row-group
        granularity caps effective splits at ~1/file for small files);
      * the total input is under RML_SPREAD_SCAN_MAX_MB (default 256),
        so the repartition pass costs milliseconds.

    The explicit partition count is preserved by AQE (only
    ENSURE_REQUIREMENTS shuffles are coalesced), so the downstream
    map-side work genuinely runs wide.
    """
    if os.environ.get("RML_SPREAD_SCAN", "1") == "0":
        return df
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    if par <= 1:
        return df
    try:
        files = df.inputFiles()
    except Exception:  # noqa: BLE001 — non-file-based plans
        return df
    # "severely under-split" only: an input already ≥25% as parallel as
    # the session gains little from a balancing pass — the win cases are
    # the 1-to-few-file tables whose map side would otherwise serialize
    if not files or len(files) >= max(2, par // 4):
        return df
    total = 0
    for f in files:
        try:
            total += os.path.getsize(_local_path(f))
        except OSError:
            return df  # remote/unstattable storage: leave the scan alone
    if total > _SPREAD_MAX_BYTES:
        return df
    return df.repartition(par)


def read_parquet_spread(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet`` + :func:`spread_small_scan`."""
    return spread_small_scan(spark.read.parquet(path))
