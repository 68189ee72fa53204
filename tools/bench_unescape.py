"""Measure the reader-path cost of the HOF-based ``_unescape_literal``
(r6 VERDICT #6): the token decode uses ``F.transform`` (CodegenFallback),
and the open question is what that costs on ``parse_nquad_lines`` —
including whether merely HAVING the HOF in the projection hurts rows
that take the escape-free fast branch.

Three timed variants over the same generated N-Quads lines:
  A. full reader, 0% of literals carry escapes (gate short-circuits);
  B. full reader, ~50% of literals carry escapes (decode path hot);
  C. reader with unescape stubbed to identity (the hypothetical
     all-builtin ceiling).

One JVM, each variant counted 3x after a warm-up, medians reported.
Run ISOLATED (no concurrent Spark/pytest) per BENCH protocol.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from rml_utils_processor_ts_spark import get_spark  # noqa: E402
from rml_utils_processor_ts_spark.sinks import nquads as nq  # noqa: E402

N = 4_000_000


def lines_df(spark, escaped: bool):
    base = spark.range(N)
    lit = (
        F.when(
            (F.col("id") % 2 == 0) & F.lit(escaped),
            F.concat(F.lit('line \\"q\\" tab\\tu \\u00e9 nr '), F.col("id").cast("string")),
        )
        .otherwise(F.concat(F.lit("plain literal value number "), F.col("id").cast("string")))
    )
    return base.select(
        F.concat(
            F.lit("<http://x/s"), (F.col("id") % 1000).cast("string"), F.lit("> "),
            F.lit("<http://x/p> "),
            F.lit('"'), lit, F.lit('" .'),
        ).alias("line")
    )


def timed(df, reps: int = 3) -> float:
    out = []
    for _ in range(reps):
        t0 = time.time()
        df.agg(F.sum(F.length("o"))).collect()
        out.append(time.time() - t0)
    out.sort()
    return out[1]


def main() -> None:
    spark = get_spark("bench_unescape", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    plain = lines_df(spark, escaped=False).cache()
    esc = lines_df(spark, escaped=True).cache()
    plain.count(), esc.count()

    # variant C: monkeypatch unescape to identity to get the ceiling
    real_unescape = nq._unescape_literal
    parse = nq.parse_nquad_lines

    t_warm = timed(parse(plain))  # warm-up JIT (discarded)
    a = timed(parse(plain))
    b = timed(parse(esc))
    nq._unescape_literal = lambda c: c
    try:
        c = timed(parse(plain))
    finally:
        nq._unescape_literal = real_unescape

    print(json.dumps({
        "n_lines": N,
        "warmup_sec": round(t_warm, 2),
        "A_full_reader_no_escapes_sec": round(a, 2),
        "B_full_reader_50pct_escapes_sec": round(b, 2),
        "C_identity_unescape_sec": round(c, 2),
        "hof_presence_overhead_pct": round((a / c - 1) * 100, 1),
        "decode_path_overhead_pct": round((b / a - 1) * 100, 1),
        "lines_per_sec_full": round(N / a, 0),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
