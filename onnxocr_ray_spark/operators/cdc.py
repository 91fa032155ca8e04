"""Snapshot diff (CDC): what changed between two corpus versions.

A continuously-refreshed crawl corpus is maintained as table snapshots
(the Iceberg model the loader in sources/tables.py gates on); the
incremental-processing primitive is the SNAPSHOT DIFF — classify every
document as added / removed / changed / unchanged between versions so
downstream stages (dedup state, embeddings, packing) reprocess only the
delta instead of the full 10^12 rows.

No external data (build brief): snapshot v2 is derived deterministically
from ``documents`` with all three mutation kinds, SQL-computable so the
oracle rebuilds it independently:

- doc_id % 13 == 0  -> removed in v2
- doc_id % 7  == 0  -> text changed in v2 (marker suffix)
- one new doc per doc_id % 11 == 0 (key = doc_id + 10^9)

Scale design: ONE full-outer join on the snapshot key with change
detection by content fingerprint (md5), not by comparing text bytes
through the shuffle — each side exchanges (doc_id, 32-hex fp), never
documents. On bucketed/Iceberg tables both sides are co-partitioned by
key and the exchange disappears entirely (the relational4 bucketed-join
recipe applies verbatim).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from onnxocr_ray_spark.functions import portable_md5
from onnxocr_ray_spark.registry import register
from onnxocr_ray_spark.sources.tables import load_table

_NEW_KEY_BASE = 1_000_000_000


def snapshot_v2(docs: DataFrame) -> DataFrame:
    """The deterministic second snapshot (see module doc)."""
    survivors = docs.filter(F.col("doc_id") % 13 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.col("text"), F.lit(" [rev2]")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    added = docs.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + _NEW_KEY_BASE).alias("doc_id"),
        F.concat(F.lit("new page for "), F.col("doc_id").cast("string"))
        .alias("text"),
    )
    return survivors.unionByName(added)


def snapshot_diff(v1: DataFrame, v2: DataFrame, key: str = "doc_id") -> DataFrame:
    """(key, change_type) for every key in either snapshot. Fingerprints
    are computed BEFORE the join so only (key, fp) crosses the wire."""
    # presence flags, NOT fp IS NULL: md5(NULL text) is NULL, and a
    # NULL-text row present on both sides must classify by KEY presence
    # (the oracle's a.doc_id IS NULL), not by its null fingerprint
    a = v1.select(
        F.col(key),
        portable_md5(F.col("text")).alias("fp_a"),
        F.lit(True).alias("in_a"),
    )
    b = v2.select(
        F.col(key),
        portable_md5(F.col("text")).alias("fp_b"),
        F.lit(True).alias("in_b"),
    )
    j = a.join(b, key, "full_outer")
    change = (
        F.when(F.col("in_a").isNull(), F.lit("added"))
        .when(F.col("in_b").isNull(), F.lit("removed"))
        # SQL null semantics on purpose: fp_a <> fp_b is NULL when either
        # text is NULL, falling through to 'unchanged' — identical to the
        # oracle's CASE
        .when(F.col("fp_a") != F.col("fp_b"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(F.col(key), change.alias("change_type"))


@register(
    "snapshot_diff",
    priority=20,  # new this round: into the checked window
    sql=f"""
    WITH v2 AS (
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 0 THEN text || ' [rev2]' ELSE text END
                 AS text
        FROM documents WHERE doc_id % 13 <> 0
        UNION ALL
        SELECT doc_id + {_NEW_KEY_BASE} AS doc_id,
               'new page for ' || CAST(doc_id AS VARCHAR) AS text
        FROM documents WHERE doc_id % 11 = 0
    ),
    a AS (SELECT doc_id, md5(text) AS fp_a FROM documents),
    b AS (SELECT doc_id, md5(text) AS fp_b FROM v2)
    SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
           CASE WHEN a.doc_id IS NULL THEN 'added'
                WHEN b.doc_id IS NULL THEN 'removed'
                WHEN fp_a <> fp_b THEN 'changed'
                ELSE 'unchanged' END AS change_type
    FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
    ORDER BY doc_id
    """,
    doc=(
        "training-data op: snapshot CDC diff — classify every document "
        "as added/removed/changed/unchanged between two corpus versions "
        "so downstream stages reprocess only the delta. One full-outer "
        "join on the key; change detection by md5 fingerprint computed "
        "BEFORE the join, so each side exchanges 40 bytes per row, never "
        "text. v2 is derived deterministically in both engines."
    ),
)
def snapshot_diff_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return snapshot_diff(docs, snapshot_v2(docs)).orderBy("doc_id")
