"""Embedding-LSH band-recall stress: quantify, at scale, the recall the
r02 ADVICE said was silently lost — and the OR-amplification that
round 3 added.

Corpus: B seeded-random unit vectors (64-dim) + one perturbed twin per
base (noise sized for cosine ~0.95) = 2B vectors, B planted near-dup
pairs. Ground truth = planted pairs whose EXACT cosine clears the
threshold (computed driver-side with numpy — B dot products, cheap).
Brute force at this scale would be ~C(2B, 2) pairs; the point of LSH is
never materializing that.

For n_bands in 1..3: run embedding_neardup_pairs_lsh, measure recall of
planted pairs, false-pair count (must be 0 — candidates are
exact-cosine verified), and wall-clock. Expected single-band recall at
cosine c is (1 - acos(c)/pi)^n_planes; bands amplify OR-style.

Usage: python tools/stress_emb_bands.py [n_base] [n_planes]
       (defaults 75000, 8)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from rml_utils_processor_ts_spark import get_spark  # noqa: E402
from rml_utils_processor_ts_spark.operators.dedup import embedding_neardup_pairs_lsh  # noqa: E402

DIM = 64
THRESHOLD = 0.9


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 75_000
    n_planes = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rng = np.random.default_rng(42)

    base = rng.standard_normal((n_base, DIM))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    noise = rng.standard_normal((n_base, DIM)) * (0.33 / math.sqrt(DIM))
    twins = base + noise
    twins /= np.linalg.norm(twins, axis=1, keepdims=True)

    cos = (base * twins).sum(axis=1)
    true_pairs = {(i, i + n_base) for i in range(n_base) if cos[i] >= THRESHOLD}
    mean_cos = float(cos.mean())

    spark = get_spark("stress-emb-bands", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    import pandas as pd

    all_vecs = np.vstack([base, twins])
    pdf = pd.DataFrame({"vec_id": range(2 * n_base), "embedding": list(all_vecs)})
    path = "/dev/shm/stress_emb_bands"
    spark.createDataFrame(pdf).withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    ).repartition(32).write.mode("overwrite").parquet(path)
    emb = spark.read.parquet(path)

    p_plane = 1 - math.acos(min(mean_cos, 1.0)) / math.pi
    p_sig = p_plane**n_planes
    out = {
        "n_vectors": 2 * n_base,
        "planted_pairs": len(true_pairs),
        "mean_planted_cosine": round(mean_cos, 4),
        "n_planes": n_planes,
        "expected_single_band_recall": round(p_sig, 3),
        "bands": {},
    }
    for n_bands in (1, 2, 3):
        t0 = time.time()
        got = {
            (min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"]))
            for r in embedding_neardup_pairs_lsh(
                emb, threshold=THRESHOLD, n_planes=n_planes, n_bands=n_bands, dim=DIM
            ).collect()
        }
        dt = time.time() - t0
        hit = len(got & true_pairs)
        false_pairs = got - true_pairs
        # non-planted pairs above threshold are legitimate (random
        # near-collisions); verify any "false" pair's exact cosine
        for a, b in list(false_pairs)[:1000]:
            c = float(all_vecs[a] @ all_vecs[b])
            assert c >= THRESHOLD - 1e-9, (a, b, c)
        out["bands"][n_bands] = {
            "recall": round(hit / len(true_pairs), 4),
            "expected": round(1 - (1 - p_sig) ** n_bands, 3),
            "extra_true_pairs": len(false_pairs),
            "sec": round(dt, 1),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
