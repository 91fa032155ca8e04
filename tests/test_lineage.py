"""Lineage + idempotent resume (north-rule checkpoint requirement)."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from onnxocr_ray_spark.plans.lineage import read_lineage, run_extraction
from onnxocr_ray_spark.sources.pages import pages_table

from tests.conftest import SF0001


@pytest.fixture()
def outdir():
    d = tempfile.mkdtemp(prefix="lineage_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_full_run_writes_data_and_lineage(spark, outdir):
    pages = pages_table(spark, SF0001)
    run = run_extraction(spark, pages, outdir, n_buckets=16, snapshot_id="snapA")
    assert run.processed_buckets == 16
    assert run.skipped_buckets == 0
    assert run.n_docs == pages.count()
    lineage = read_lineage(spark, outdir)
    assert lineage.count() == 16
    data = spark.read.parquet(f"{outdir}/data")
    assert data.count() == run.n_docs


def test_interrupted_run_resumes_only_missing_buckets(spark, outdir):
    pages = pages_table(spark, SF0001)
    # simulate a crash after half the buckets committed
    first = run_extraction(
        spark, pages, outdir, n_buckets=16, snapshot_id="snapA",
        only_buckets=list(range(8)),
    )
    assert first.processed_buckets == 8
    # resume: full run must process exactly the other 8
    second = run_extraction(spark, pages, outdir, n_buckets=16, snapshot_id="snapA")
    assert second.processed_buckets == 8
    assert second.skipped_buckets == 8
    # final data identical to a clean full run
    data = spark.read.parquet(f"{outdir}/data")
    clean_dir = outdir + "_clean"
    try:
        clean = run_extraction(spark, pages, clean_dir, n_buckets=16, snapshot_id="snapA")
        clean_data = spark.read.parquet(f"{clean_dir}/data")
        a = {(r.url, r.checksum) for r in data.select("url", "checksum").collect()}
        b = {(r.url, r.checksum) for r in clean_data.select("url", "checksum").collect()}
        assert a == b
        # bucket checksums identical between interrupted+resumed and clean runs
        la = {
            (r.wp, r.bucket_checksum)
            for r in read_lineage(spark, outdir).select("wp", "bucket_checksum").collect()
        }
        lb = {
            (r.wp, r.bucket_checksum)
            for r in read_lineage(spark, clean_dir).select("wp", "bucket_checksum").collect()
        }
        assert la == lb
    finally:
        shutil.rmtree(clean_dir, ignore_errors=True)


def test_rerun_is_noop(spark, outdir):
    pages = pages_table(spark, SF0001)
    run_extraction(spark, pages, outdir, n_buckets=8, snapshot_id="snapA")
    again = run_extraction(spark, pages, outdir, n_buckets=8, snapshot_id="snapA")
    assert again.processed_buckets == 0
    assert again.skipped_buckets == 8
    assert read_lineage(spark, outdir).count() == 8


def test_new_snapshot_reprocesses(spark, outdir):
    pages = pages_table(spark, SF0001)
    run_extraction(spark, pages, outdir, n_buckets=8, snapshot_id="snapA")
    run2 = run_extraction(spark, pages, outdir, n_buckets=8, snapshot_id="snapB")
    assert run2.processed_buckets == 8  # different snapshot: all buckets again


def test_incremental_readback_partition_prunes(spark, outdir):
    """The lineage commit must re-read ONLY the buckets written this run:
    the wp isin filter has to reach the parquet scan as a partition
    filter, so commit cost grows with the increment, not total history."""
    pages = pages_table(spark, SF0001)
    # first run covers buckets 0..7
    run_extraction(
        spark, pages, outdir, n_buckets=16, snapshot_id="snapP",
        only_buckets=list(range(8)),
    )
    # the readback plan for an incremental second run (buckets 8..15)
    # must partition-prune to exactly those wp values
    df = spark.read.parquet(f"{outdir}/data").filter(
        F.col("wp").isin(list(range(8, 16)))
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "PartitionFilters" in scan and "wp" in scan.split("PartitionFilters")[1]
    # and the run itself only counts the new buckets
    run2 = run_extraction(
        spark, pages, outdir, n_buckets=16, snapshot_id="snapP",
    )
    assert run2.skipped_buckets == 8
    assert run2.processed_buckets == 8
    total = spark.read.parquet(f"{outdir}/data").count()
    assert total == pages.count()


def test_cli_main_runs_and_resumes(spark, outdir, capsys):
    """`python -m onnxocr_ray_spark` driver-entry contract (the
    spark-submit job body): first invocation extracts and commits
    lineage, second is a resume no-op."""
    import json

    from onnxocr_ray_spark.__main__ import main
    from onnxocr_ray_spark.sources.pages import pages_from_documents

    pages_dir = f"{outdir}/cli_pages"
    pages_from_documents(spark, SF0001).write.mode("overwrite").parquet(pages_dir)
    out_dir = f"{outdir}/cli_out"
    assert main(["--input", pages_dir, "--output", out_dir,
                 "--n-buckets", "16"]) == 0
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert first["processed_buckets"] == 16 and first["n_docs"] == 500
    assert main(["--input", pages_dir, "--output", out_dir,
                 "--n-buckets", "16"]) == 0
    second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert second["processed_buckets"] == 0
    assert second["skipped_buckets"] == 16
