"""Snapshot CDC: null-text contract (review finding regression)."""

from onnxocr_ray_spark.operators.cdc import snapshot_diff


def test_null_text_rows_classify_by_key_presence(spark):
    """md5(NULL text) is NULL — added/removed must come from KEY
    presence, and a NULL-involved fingerprint compare falls through to
    'unchanged' (the oracle's SQL CASE semantics, matched exactly)."""
    v1 = spark.createDataFrame(
        [(1, None), (2, "x"), (3, None)], "doc_id long, text string"
    )
    v2 = spark.createDataFrame(
        [(1, None), (2, None), (4, "y")], "doc_id long, text string"
    )
    got = {r.doc_id: r.change_type for r in snapshot_diff(v1, v2).collect()}
    assert got == {
        1: "unchanged",  # NULL on both sides, key present in both
        2: "unchanged",  # "x" -> NULL: NULL compare falls through, like SQL
        3: "removed",    # key only in v1
        4: "added",      # key only in v2
    }
