"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB over
the same sf dir; compare row count, column names, and order-insensitive
values (columns sorted by name, rows sorted)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from rml_utils_processor_ts_spark import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


STRICT = os.environ.get("ORACLE_STRICT", "1") != "0"


def norm_cell(v):
    if v is None:
        return ""
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        # STRICT (default): raw repr — the driver's gate hashes raw
        # values, and the r3 sessionization failure hid for two rounds
        # behind this function's 6-decimal rounding. ORACLE_STRICT=0
        # restores the loose compare for diagnosing near-miss floats.
        return repr(v) if STRICT else f"{v:.6f}"
    return str(v)


# DuckDB widens integer sums to HUGEINT (int128) and exact division to
# DECIMAL; Arrow exports those as decimal128, whose bytes differ from
# Spark's int64/float64 even when values are equal — the driver's value
# hash flips while rows/schema "match". This burned rounds 3 and 4
# (sessionization, skew_split_join). Any oracle exposing such a column is
# a bug in the oracle SQL: wrap the offending expression in
# CAST(... AS BIGINT) / CAST(... AS DOUBLE).
_BAD_DUCK_TYPES = ("HUGEINT", "DECIMAL")


def bad_surface_types(con, sql):
    """Return [(col, type)] for oracle output columns whose DuckDB type
    cannot round-trip through Arrow with the same bytes as Spark's."""
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return [(r[0], r[1]) for r in rows
            if any(b in r[1].upper() for b in _BAD_DUCK_TYPES)]


def frame_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


def main(sf_dir: str, only: list[str] | None = None):
    spark = get_spark("oracle_check", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    # merge the driver-gated set with the EXTRA_QUERIES twins — the local
    # harness has no 50-row cap, so everything stays oracle-checked here
    queries = {**entrymod.queries(), **entrymod.EXTRA_QUERIES}
    oracles = {**entrymod.oracle_sql(), **entrymod.extra_oracle_sql()}
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"OK?   {name}: rows-only ({len(s_rows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            bad = bad_surface_types(con, oracles[name])
            if bad:
                print(f"FAIL  {name}: oracle surface type(s) the driver "
                      f"hashes differently: {bad} — CAST the expression")
                failures.append(name)
                continue
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        sc, sv = frame_key(s_cols, s_rows)
        dc, dv = frame_key(d_cols, d_rows)
        if sc != dc:
            print(f"FAIL  {name}: columns {sc} vs {dc}")
            failures.append(name)
            continue
        if len(sv) != len(dv):
            print(f"FAIL  {name}: rows {len(sv)} vs {len(dv)}")
            failures.append(name)
            continue
        if sv != dv:
            diff = [i for i, (a, b) in enumerate(zip(sv, dv)) if a != b][:3]
            print(f"FAIL  {name}: value mismatch at sorted rows {diff}")
            for i in diff[:2]:
                print(f"      spark : {sv[i]}")
                print(f"      duckdb: {dv[i]}")
            failures.append(name)
            continue
        print(f"PASS  {name}: {len(sv)} rows match ({time.time()-t0:.1f}s)")
    checked = [n for n in queries if not only or n in only]
    # the denominator is what actually RAN — counting skipped queries as
    # passes once hid a filtered-out failure behind an "all pass" line
    print(f"\n{len(checked) - len(failures)}/{len(checked)} checked pass"
          + (f" (of {len(queries)} total)" if only else ""))
    if only:
        missing = [n for n in only if n not in queries]
        if missing:
            print(f"WARNING: unknown query names ignored: {missing}")
            return 1
    return 1 if failures else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    # every arg after the sf dir is a query name (commas also accepted) —
    # argv[3:] used to be silently IGNORED, which skipped checks while
    # printing an all-pass summary
    names = [n for a in sys.argv[2:] for n in a.split(",") if n]
    raise SystemExit(main(sf, names or None))
