"""Stateful streaming sessionizer (applyInPandasWithState)."""

import os
import shutil
import tempfile

import pytest

from onnxocr_ray_spark.streaming.pipeline import sessionize_stream

from tests.conftest import SF0001


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="state_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_sessionize_stream_emits_closed_sessions(spark, tmpdir):
    events_dir = f"{tmpdir}/events"
    os.makedirs(events_dir)
    shutil.copy(f"{SF0001}/events.parquet", f"{events_dir}/events.parquet")

    out = sessionize_stream(spark, events_dir, gap_seconds=1800)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_out")
        .option("checkpointLocation", f"{tmpdir}/ckpt")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM sess_out").collect()
    # sessions still open at stream end are (correctly) not emitted, but
    # with 1000 events over 30 days per ~15 users there are many closed gaps
    assert len(rows) > 10
    for r in rows:
        assert r.session_end >= r.session_start
        assert r.n_events >= 1
    # emitted sessions must be consistent with the batch sessionizer:
    # (user, n_events) multiset of closed sessions is a subset of batch
    from onnxocr_ray_spark.registry import load_all

    batch = load_all()["sessionize"].fn(spark, SF0001).collect()
    batch_counts = {}
    for b in batch:
        batch_counts.setdefault((b.user_id, b.n_events), 0)
        batch_counts[(b.user_id, b.n_events)] += 1
    for r in rows:
        key = (r.user_id, r.n_events)
        assert batch_counts.get(key, 0) > 0, f"streamed session {key} not in batch"
        batch_counts[key] -= 1
