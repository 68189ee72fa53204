"""Raw-CPU scaling calibration (the r3 'burn check', now a tool): run a
pure-Python busy loop at two process counts in the same window and
report the HOST's own scaling efficiency. Used to validate Spark
scaling pairs — if the host itself scales ~1.0 at the same core pair,
a low engine ratio is real; if the host is below target, the window is
polluted and the pair is invalid (BENCH/BASELINE.md protocol).

Usage: python tools/cpu_burn.py [p1 p2]   (default 1 4)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

WORK_UNITS = 6  # chunks per process; each chunk is ~1s of hashing


def _chunk(_):
    import hashlib

    h = hashlib.md5(b"burn")
    for _ in range(1_200_000):
        h = hashlib.md5(h.digest())
    return h.hexdigest()


def measure(procs: int) -> float:
    """Wall seconds for procs workers x WORK_UNITS chunks each."""
    t0 = time.time()
    with mp.Pool(procs) as pool:
        pool.map(_chunk, range(procs * WORK_UNITS), chunksize=WORK_UNITS)
    return time.time() - t0


def main() -> None:
    p1 = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    p2 = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    t1 = measure(p1)
    t2 = measure(p2)
    thr1 = p1 * WORK_UNITS / t1
    thr2 = p2 * WORK_UNITS / t2
    eff = (thr2 / thr1) / (p2 / p1)
    print(
        json.dumps(
            {
                "burn": "md5 busy loop",
                "p1": p1,
                "sec1": round(t1, 2),
                "p2": p2,
                "sec2": round(t2, 2),
                "host_efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
