"""Memory-bandwidth scaling calibration (round 8).

The md5 `cpu_burn` is cache-resident: it certifies the host's CPU
scheduling but is blind to the shared memory-bandwidth/LLC ceiling that
a string-heavy Spark job DOES hit. This burn is the complement: each
worker streams over a large numpy array (far beyond LLC), so K workers
contend on the memory controller exactly the way K executor threads do.

    efficiency = sec@p1 / sec@p2      (fixed work per process)

An efficiency well below 1 at a core pair means the HOST's bandwidth
ceiling — not the engine — bounds any bandwidth-heavy job's scaling at
that pair; report it next to cpu_burn when adjudicating a scaling
point (BENCH/BASELINE.md protocol).

Usage: python tools/membw_burn.py [p1 p2] [mb_per_worker]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

MB = 512
ROUNDS = 30


def _chunk(_):
    import numpy as np

    n = MB * 1024 * 1024 // 8
    a = np.ones(n, dtype=np.float64)
    out = np.empty_like(a)
    s = 0.0
    for _ in range(ROUNDS):
        np.multiply(a, 1.0001, out=out)  # stream read+write, 2x MB per round
        s += float(out[-1])
    return s


def measure(procs: int) -> float:
    t0 = time.time()
    with mp.Pool(procs) as pool:
        pool.map(_chunk, range(procs), chunksize=1)
    return time.time() - t0


def main() -> None:
    global MB
    p1 = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    p2 = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    if len(sys.argv) > 3:
        MB = int(sys.argv[3])
    s1 = measure(p1)
    s2 = measure(p2)
    print(
        json.dumps(
            {
                "burn": "numpy stream multiply",
                "mb_per_worker": MB,
                "p1": p1,
                "sec1": round(s1, 2),
                "p2": p2,
                "sec2": round(s2, 2),
                "host_bw_efficiency": round(s1 / s2, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
