#!/usr/bin/env python
"""Host memory-bandwidth scaling probe (hardware calibration).

The extraction job streams hundreds of MB of parquet -> Arrow -> Python
per run; the plain ALU/regex kernel probe works on cache-resident data
and therefore over-reports the ceiling a memory-streaming Spark job can
reach. This probe streams a 200 MB buffer per process (full copies, far
beyond LLC) and reports aggregate MB/s at two process counts plus the
scaling efficiency — the bandwidth-bound analog of bench_scaling's
kernel probe. See BENCH/BASELINE.md §3 for recorded values.

Usage: python BENCH/membw_probe.py [low] [high]
"""

from __future__ import annotations

import json
import sys
import time


def membw_worker(reps: int) -> float:
    buf = bytearray(200 * 1024 * 1024)
    mv = memoryview(buf)
    t0 = time.perf_counter()
    for _ in range(reps):
        # tobytes() is a full 200 MB memcpy: read + write stream
        len(mv.tobytes())
    return reps * 200 / (time.perf_counter() - t0)  # MB/s per proc


def run(procs: int, reps: int = 5) -> float:
    import multiprocessing as mp

    ctx = mp.get_context("spawn")
    with ctx.Pool(procs) as pool:
        rates = pool.map(membw_worker, [reps] * procs)
    return sum(rates)


def main() -> None:
    low = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    high = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    lo = run(low)
    hi = run(high)
    print(
        json.dumps(
            {
                "low_procs": low,
                "high_procs": high,
                "low_mb_per_sec": round(lo),
                "high_mb_per_sec": round(hi),
                "efficiency": round((hi / lo) / (high / low), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
