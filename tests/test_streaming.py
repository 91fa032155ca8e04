"""Structured Streaming surface: the streaming paths must reproduce the
batch results exactly on a bounded input."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from onnxocr_ray_spark.operators.extract import extract
from onnxocr_ray_spark.registry import load_all
from onnxocr_ray_spark.sources.pages import pages_table
from onnxocr_ray_spark.streaming.pipeline import extract_stream, windowed_events_stream

from tests.conftest import SF0001


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="stream_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_extract_stream_matches_batch(spark, tmpdir):
    pages = pages_table(spark, SF0001)
    pages_dir = f"{tmpdir}/pages"
    # several files so multiple micro-batches trigger
    pages.repartition(6).write.parquet(pages_dir)

    q = extract_stream(
        spark, pages_dir,
        output_dir=f"{tmpdir}/out",
        checkpoint_dir=f"{tmpdir}/ckpt",
        max_files_per_trigger=2,
    )
    q.processAllAvailable()
    q.stop()

    streamed = spark.read.parquet(f"{tmpdir}/out")
    batch = extract(pages)
    a = {(r.url, r.checksum) for r in streamed.select("url", "checksum").collect()}
    b = {(r.url, r.checksum) for r in batch.select("url", "checksum").collect()}
    assert a == b
    # more than one epoch actually ran (really incremental)
    assert streamed.select("epoch_id").distinct().count() > 1


def test_windowed_stream_matches_batch_oracle(spark, tmpdir):
    import os

    events_dir = f"{tmpdir}/events"
    os.makedirs(events_dir)
    shutil.copy(f"{SF0001}/events.parquet", f"{events_dir}/events.parquet")
    agg = windowed_events_stream(spark, events_dir)
    # bounded directory + complete mode memory sink = deterministic result
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_out")
        .option("checkpointLocation", f"{tmpdir}/ckpt")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    streamed = spark.sql("SELECT * FROM win_out")
    batch = load_all()["window_hourly"].fn(spark, SF0001)
    a = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert a == b


def test_extract_stream_epoch_replay_is_idempotent(spark, tmpdir):
    """Simulate the at-least-once failure mode: the same micro-batch is
    delivered twice (crash between sink write and checkpoint commit).
    With epoch-partitioned dynamic overwrite the rerun must REPLACE the
    epoch's partition, not append duplicates."""
    from pyspark.sql import functions as F
    from onnxocr_ray_spark.config import DEFAULT_CONFIG

    pages = pages_table(spark, SF0001).limit(50)
    out_dir = f"{tmpdir}/out"

    def process(batch_df, epoch_id):
        out = extract(batch_df, DEFAULT_CONFIG).withColumn("epoch_id", F.lit(epoch_id))
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch_id")
            .parquet(out_dir)
        )

    process(pages, 7)
    first = spark.read.parquet(out_dir)
    n1 = first.count()
    rows1 = {(r.url, r.checksum) for r in first.select("url", "checksum").collect()}
    process(pages, 7)  # replay of the SAME epoch
    second = spark.read.parquet(out_dir)
    assert second.count() == n1
    assert {(r.url, r.checksum) for r in second.select("url", "checksum").collect()} == rows1
