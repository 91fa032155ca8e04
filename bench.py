#!/usr/bin/env python
"""Benchmark runner (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value", "unit", "queries", "sf", ...}.

Timing excludes session startup; each query is materialized with the
noop sink (full execution, no driver-side result pull — except top-k
queries whose result is tiny by construction).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "extract_e2e",          # flagship three-stage extraction
    "q1_pricing",
    "q3_revenue",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "ann_topk_cosine",
    "sessionize",
    "text_quality",
    "window_hourly",
]


def materialize(df) -> int:
    df.write.mode("overwrite").format("noop").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from onnxocr_ray_spark.session import get_spark
    from onnxocr_ray_spark.registry import load_all
    from onnxocr_ray_spark.packaging import ship_package

    spark = get_spark(
        app_name="onnxocr_ray_spark_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    ship_package(spark)
    queries = load_all()

    # count docs once for the throughput figure (outside timed sections)
    import duckdb

    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]

    # Warm the JVM (codegen/JIT) and the Python worker pool once, so the
    # timings below measure the queries, not first-run compilation.
    warm = queries["q1_pricing"].fn(spark, sf_dir)
    materialize(warm)

    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    timings = {}
    for name in HEADLINE:
        q = queries[name]
        best = None
        # best-of-N: this VM has bursty CPU-throttling windows (measured
        # up to 30x); the minimum is the only stable statistic
        for _rep in range(reps):
            # time build + execute together: extract() materializes its
            # routed pass eagerly at build time, so timing only the final
            # action would under-report it
            t0 = time.perf_counter()
            df = q.fn(spark, sf_dir)
            materialize(df)
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
            spark.catalog.clearCache()
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)

    # Throughput figure on a corpus big enough that per-job fixed costs
    # (probe, scheduling, plan build) amortize — the quantity that
    # matters at 100 TB. The 5k-doc headline timing above is dominated
    # by ~1s of fixed cost at local[32].
    from onnxocr_ray_spark.operators.extract import extract
    from onnxocr_ray_spark.sources.pages import pages_table

    tp_pages = pages_table(spark, sf_dir, copies=4)
    tp_docs = tp_pages.count()
    tp_best = None
    for _rep in range(reps):
        t0 = time.perf_counter()
        materialize(extract(tp_pages))
        dt = time.perf_counter() - t0
        tp_best = dt if tp_best is None or dt < tp_best else tp_best
        spark.catalog.clearCache()

    out = {
        "metric": "headline query wall-clock (full pipeline + corpus operators)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "docs": n_docs,
        "extract_docs_per_sec": round(tp_docs / tp_best, 2),
        "throughput_corpus_docs": tp_docs,
        "throughput_sec": round(tp_best, 3),
    }
    # embed the latest two-cluster-size scaling evidence (written by
    # bench_scaling.py; methodology + hardware calibration in
    # BENCH/BASELINE.md)
    scaling_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH", "scaling.json"
    )
    if os.path.exists(scaling_path):
        with open(scaling_path) as fh:
            s = json.load(fh)
        out["scaling"] = {
            "low_cpus": s["low"]["cpus"],
            "high_cpus": s["high"]["cpus"],
            "low_docs_per_sec": s["low"]["docs_per_sec"],
            "high_docs_per_sec": s["high"]["docs_per_sec"],
            "efficiency": s["efficiency"],
            "pass": s["pass"],
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
