"""Per-partition lineage, metrics, and idempotent resume.

North-rule requirement: the pipeline "writes per-partition lineage rows
(input snapshot-id, partition, doc range, checksum of extracted spans)
and metrics to a checkpoint table so any partition can be replayed
idempotently after failure". The reference has no analog (its only
persistence is debug image dumps, `app-service.py:246-331`) — this is
Spark-native operational machinery:

- Work is bucketed deterministically: ``wp = pmod(xxhash64(url), n_buckets)``.
  The bucket id depends only on the url, never on physical partitioning,
  so a bucket means the same document set on any cluster size.
- Output data is written ``partitionBy(wp)`` with dynamic partition
  overwrite: re-processing a bucket REPLACES its files (idempotent).
- After the data write commits, one lineage row per bucket is appended:
  (snapshot_id, run_id, wp, n_docs, n_spans, bucket checksum, wall time).
  The bucket checksum is sha256 over the sorted per-url checksums — a
  deterministic content fingerprint that any replay must reproduce.
- Resume = anti-join of buckets against the lineage table for the same
  snapshot_id: only buckets without a committed lineage row are
  processed. A crash between data write and lineage append merely causes
  those buckets to be rewritten (same bytes) on the next run.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from onnxocr_ray_spark.config import DEFAULT_CONFIG, ExtractConfig
from onnxocr_ray_spark.operators.extract import extract

LINEAGE_SCHEMA = (
    "snapshot_id string, run_id string, wp int, n_docs long, n_spans long,"
    " bucket_checksum string, wall_sec double, committed_at double"
)


@dataclass
class ExtractionRun:
    output_dir: str
    n_buckets: int
    processed_buckets: int
    skipped_buckets: int
    n_docs: int
    wall_sec: float


def _data_dir(output_dir: str) -> str:
    return os.path.join(output_dir, "data")


def _lineage_dir(output_dir: str) -> str:
    return os.path.join(output_dir, "lineage")


def read_lineage(spark: SparkSession, output_dir: str) -> Optional[DataFrame]:
    path = _lineage_dir(output_dir)
    if not os.path.exists(path):
        return None
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def run_extraction(
    spark: SparkSession,
    pages: DataFrame,
    output_dir: str,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    snapshot_id: str = "snap-0",
    run_id: Optional[str] = None,
    n_buckets: int = 64,
    only_buckets: Optional[list] = None,
) -> ExtractionRun:
    """Extract ``pages`` into ``output_dir`` with lineage + resume.

    ``only_buckets`` restricts processing (used by tests to simulate an
    interrupted run and by operators to replay a specific partition).
    """
    run_id = run_id or f"run-{int(time.time() * 1000)}"
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    wp = F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int")
    bucketed = pages.withColumn("wp", wp)

    done = set()
    lineage = read_lineage(spark, output_dir)
    if lineage is not None:
        done = {
            r["wp"]
            for r in lineage.filter(F.col("snapshot_id") == snapshot_id)
            .select("wp")
            .distinct()
            .collect()
        }
    todo = bucketed.filter(~F.col("wp").isin(list(done)) if done else F.lit(True))
    if only_buckets is not None:
        todo = todo.filter(F.col("wp").isin(list(only_buckets)))

    t0 = time.perf_counter()
    # wp is a pure function of url — recompute it after extraction instead
    # of joining back (saves a shuffle)
    extracted = extract(todo, cfg).withColumn(
        "wp", F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int")
    )
    out = extracted.select("url", "spans", "extracted_text", "n_spans", "checksum", "wp")
    out.write.mode("overwrite").partitionBy("wp").parquet(_data_dir(output_dir))

    # lineage rows are derived from what was actually WRITTEN (read back),
    # so a lineage row always describes committed data — but ONLY this
    # run's buckets are re-read: wp is the physical partition column, so
    # the isin filter partition-prunes the scan and the commit cost grows
    # with the increment, not with total output history
    todo_wps = sorted(set(range(n_buckets)) - done)
    if only_buckets is not None:
        todo_wps = sorted(set(todo_wps) & set(only_buckets))
    written_new = spark.read.parquet(_data_dir(output_dir)).filter(
        F.col("wp").isin(todo_wps)
    )
    wall = time.perf_counter() - t0
    lineage_rows = (
        written_new
        .groupBy("wp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_spans").alias("n_spans"),
            F.sha2(
                F.concat_ws("\n", F.array_sort(F.collect_list(F.col("checksum")))), 256
            ).alias("bucket_checksum"),
        )
        .select(
            F.lit(snapshot_id).alias("snapshot_id"),
            F.lit(run_id).alias("run_id"),
            "wp",
            "n_docs",
            "n_spans",
            "bucket_checksum",
            F.lit(round(wall, 3)).alias("wall_sec"),
            F.lit(time.time()).alias("committed_at"),
        )
    )
    lineage_rows.write.mode("append").parquet(_lineage_dir(output_dir))

    n_docs = written_new.count()
    processed = written_new.select("wp").distinct().count()
    return ExtractionRun(
        output_dir=output_dir,
        n_buckets=n_buckets,
        processed_buckets=processed,
        skipped_buckets=len(done),
        n_docs=n_docs,
        wall_sec=round(wall, 3),
    )
