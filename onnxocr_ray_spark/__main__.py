"""spark-submit driver entry (north rule: packaged for
``spark-submit --py-files``).

Usage, mirroring the reference's service entrypoint (`main.py` /
`app-service.py`) as a batch job:

    # inside an existing cluster session (or local):
    python -m onnxocr_ray_spark --input /data/pages_parquet \
        --output /data/extracted --snapshot-id snap-2026-08-17

    # cluster submit (package zip built by packaging.build_zip):
    spark-submit --py-files onnxocr_ray_spark.zip \
        -m ...  # or point spark-submit at this file's path

The job is resumable: lineage rows committed per work bucket mean a
re-run after a failure processes only the missing buckets
(plans/lineage.py; exercised by tests/test_lineage.py).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="onnxocr_ray_spark")
    ap.add_argument("--input", required=True,
                    help="parquet dir of pages (url, html[, html_size])")
    ap.add_argument("--output", required=True,
                    help="output dir (data/ + lineage/ committed per bucket)")
    ap.add_argument("--snapshot-id", default="snap-0",
                    help="input snapshot identity for lineage/resume")
    ap.add_argument("--n-buckets", type=int, default=64,
                    help="work buckets (stable across cluster sizes)")
    ap.add_argument("--master", default=None,
                    help="override master (default: the cluster's / local[n])")
    args = ap.parse_args(argv)

    from onnxocr_ray_spark.plans.lineage import run_extraction
    from onnxocr_ray_spark.session import get_spark

    spark = get_spark(app_name="onnxocr_extract", master=args.master)
    pages = spark.read.parquet(args.input)
    run = run_extraction(
        spark, pages, args.output,
        snapshot_id=args.snapshot_id, n_buckets=args.n_buckets,
    )
    print(json.dumps({
        "snapshot_id": args.snapshot_id,
        "output": run.output_dir,
        "n_docs": run.n_docs,
        "processed_buckets": run.processed_buckets,
        "skipped_buckets": run.skipped_buckets,
        "wall_s": round(run.wall_sec, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
