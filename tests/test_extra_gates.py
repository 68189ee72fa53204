"""Oracle + parity gates for the EXTRA_QUERIES twins.

The driver's correctness gate caps at 50 queries, so five result-identical
or serialization-variant twins live in ``__spark_entry__.EXTRA_QUERIES``
instead of ``queries()``.  This module keeps them just as verified:

* every extra query is compared against its DuckDB oracle with the same
  strict (raw-repr, column-sorted, row-sorted) compare the local harness
  uses, plus the HUGEINT/DECIMAL surface-type pre-check;
* the persisted-index ANN paths are additionally asserted row-identical
  to their gated non-index twins (the property that justified demoting
  them in the first place).
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import __spark_entry__ as entrymod  # noqa: E402
from check_oracles import bad_surface_types, frame_key  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(entrymod.EXTRA_QUERIES))
def test_extra_query_matches_oracle(spark, sf_dir, duck, name):
    oracles = entrymod.extra_oracle_sql()
    assert name in oracles, f"{name} has no oracle"
    assert not bad_surface_types(duck, oracles[name])
    sdf = entrymod.EXTRA_QUERIES[name](spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(oracles[name])
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    sc, sv = frame_key(s_cols, s_rows)
    dc, dv = frame_key(d_cols, d_rows)
    assert sc == dc
    assert sv == dv


@pytest.mark.parametrize("index_name,base_name", [
    ("ann_lsh_index_topk", "ann_lsh_topk"),
    ("ann_ivf_index_topk", "ann_ivf_topk"),
])
def test_index_path_identical_to_base(spark, sf_dir, index_name, base_name):
    """The persisted-index query path must return exactly the rows of the
    oracle-gated non-index twin — this identity is what lets the twin's
    oracle gate the whole persist/prune/score chain. (Since the round-6
    rotation both twins may live in EXTRA_QUERIES; the strict local
    harness still oracle-checks every entry.)"""
    merged = {**entrymod.queries(), **entrymod.EXTRA_QUERIES}
    base = merged[base_name](spark, sf_dir)
    idx = merged[index_name](spark, sf_dir)
    assert base.columns == idx.columns
    b = sorted(tuple(r) for r in base.collect())
    i = sorted(tuple(r) for r in idx.collect())
    assert b == i


def test_gated_dict_fits_driver_cap():
    """queries() must stay within the driver's 50-row correctness budget
    and every gated entry must carry an oracle."""
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert len(q) <= 50
    assert set(o) == set(q)


def test_harness_flags_uncast_sum(duck):
    """The surface-type pre-check must go red on the failure class that
    burned rounds 3 and 4 (DuckDB HUGEINT sums)."""
    bad = bad_surface_types(duck, "SELECT sum(n_nationkey) AS s FROM nation")
    assert bad and "HUGEINT" in bad[0][1].upper()
    assert not bad_surface_types(
        duck, "SELECT CAST(sum(n_nationkey) AS BIGINT) AS s FROM nation")
