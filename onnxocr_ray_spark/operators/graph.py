"""Iterative graph + sketch operators.

- ``dedup_cc_canonical``: CONNECTED-COMPONENTS canonical assignment over
  the LSH near-dup edge set — the full transitive closure, upgrading
  ``dedup_near_canonical``'s 1-hop min. Spark side is iterative min-label
  propagation (each round one join + one groupBy, converges in
  O(diameter) rounds — the standard large-scale CC shape); the oracle is
  a recursive CTE computing the same closure.
- ``sketch_kmv_distinct``: K-minimum-values distinct-count sketch —
  a DETERMINISTIC sketch (md5 order statistics), so unlike HLL it is
  bit-reproducible across engines and the oracle can check it exactly.
"""

from __future__ import annotations

import warnings
from typing import Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from onnxocr_ray_spark.caching import scoped_persist
from onnxocr_ray_spark.functions import portable_md5
from onnxocr_ray_spark.registry import register
from onnxocr_ray_spark.sources.tables import load_table

# max propagation rounds: components here are tiny (near-dup clusters);
# the loop exits early on convergence, this only bounds a pathology
_CC_MAX_ITERS = 10


def _lsh_edges(spark: SparkSession, sf_dir: str) -> Tuple[DataFrame, DataFrame]:
    """Near-dup graph inputs: returns ``(nodes, pairs)`` — the node set
    ``(doc_id)`` and the undirected candidate edges ``(id_a, id_b)`` from
    a strict 2-signature MinHash match (same candidate rule as
    dedup_near_canonical, relational2.py)."""
    from onnxocr_ray_spark.operators.dedup import _signed

    sigs = scoped_persist(
        _signed(spark, sf_dir).select("doc_id", F.col("bands")[0].alias("b0"))
    )
    a = sigs.select(F.col("doc_id").alias("id_a"), F.col("b0").alias("ba"))
    b = sigs.select(F.col("doc_id").alias("id_b"), F.col("b0").alias("bb"))
    pairs = a.join(
        b, (F.col("ba") == F.col("bb")) & (F.col("id_a") < F.col("id_b"))
    ).select("id_a", "id_b")
    return sigs.select("doc_id"), pairs


_EDGE_SQL = """
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sigs a JOIN sigs b
        ON a.sig0 = b.sig0 AND a.sig1 = b.sig1 AND a.doc_id < b.doc_id
"""


@register(
    "dedup_cc_canonical",
    priority=85,  # rotation r5: green r4 (and prior rounds), parked; rotate back next
    sql=f"""
    WITH RECURSIVE sh AS (
      SELECT doc_id,
             [array_to_string((string_split(lower(trim(text, ' ')), ' '))[i:i+1], ' ')
              for i in range(1, len(string_split(lower(trim(text, ' ')), ' ')))] AS shingles
      FROM documents
      WHERE len(string_split(lower(trim(text, ' ')), ' ')) >= 2
    ),
    sigs AS (
      SELECT doc_id,
             list_min(list_transform(shingles, x -> md5('0|' || x))) AS sig0,
             list_min(list_transform(shingles, x -> md5('1|' || x))) AS sig1
      FROM sh
    ),
    pairs AS ({_EDGE_SQL}),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ),
    reach AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    )
    SELECT s.doc_id,
           least(s.doc_id, coalesce(min(r.v), s.doc_id)) AS canonical_id
    FROM sigs s LEFT JOIN reach r ON r.u = s.doc_id
    GROUP BY s.doc_id
    """,
    doc=(
        "training-data op: connected-components canonical assignment over "
        "LSH near-dup edges — iterative min-label propagation (full "
        "transitive closure, not 1-hop); oracle = recursive CTE"
    ),
)
def dedup_cc_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes, pairs = _lsh_edges(spark, sf_dir)
    return min_label_propagate(nodes, pairs)


def min_label_propagate(nodes: DataFrame, pairs: DataFrame,
                        max_iters: int = _CC_MAX_ITERS) -> DataFrame:
    """Connected components by iterative min-label propagation.

    ``nodes(doc_id)``, ``pairs(id_a, id_b)`` -> ``(doc_id, canonical_id)``
    where canonical_id = min doc_id in the node's component. Each round is
    one equi-join + one groupBy (both shuffle on doc_id); convergence is
    O(component diameter) rounds with an early exit, the standard
    large-scale CC shape when a full GraphX/star-contraction dependency
    is not warranted (near-dup clusters are small and shallow)."""
    edges = scoped_persist(
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v")).unionByName(
            pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v"))
        )
    )
    labels = scoped_persist(
        nodes.select("doc_id", F.col("doc_id").alias("canonical_id"))
    )
    changed = 0
    for _ in range(max_iters):
        # each node takes min(own label, neighbors' labels)
        neighbor_min = (
            edges.join(labels, edges.v == labels.doc_id)
            .groupBy(F.col("u").alias("doc_id"))
            .agg(F.min("canonical_id").alias("nmin"))
        )
        new = F.least(
            F.col("canonical_id"),
            F.coalesce(F.col("nmin"), F.col("canonical_id")),
        )
        # carry a per-row change flag out of the SAME propagation join, so
        # the convergence probe is one sum() over the persisted result —
        # no extra new-vs-old join per round
        new_labels = scoped_persist(
            labels.join(neighbor_min, "doc_id", "left").select(
                "doc_id",
                new.alias("canonical_id"),
                (new != F.col("canonical_id")).cast("long").alias("chg"),
            )
        )
        changed = new_labels.agg(F.sum("chg")).first()[0] or 0
        labels = new_labels.select("doc_id", "canonical_id")
        if changed == 0:
            break
    if changed != 0:
        warnings.warn(
            f"min_label_propagate: labels still changing after {max_iters} "
            f"rounds ({changed} rows); a component's diameter exceeds the "
            "round budget — returning PARTIAL labels. Raise max_iters for "
            "deep graphs (near-dup clusters converge in <=3 rounds).",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels


@register(
    "sketch_kmv_distinct",
    priority=85,  # rotation r5: green r4 (and prior rounds), parked; rotate back next
    sql="""
    WITH hashed AS (
      SELECT DISTINCT md5(cast(user_id AS VARCHAR)) AS h FROM events
    ),
    topk AS (
      SELECT h FROM hashed ORDER BY h LIMIT 64
    ),
    stats AS (
      SELECT max(h) AS kth, count(*) AS k FROM topk
    )
    SELECT k,
           CASE WHEN k < 64 THEN k
                ELSE cast(floor((k - 1)
                     / (cast(('0x' || substr(kth, 1, 15)) AS BIGINT)
                        / 1152921504606846976.0) + 0.5) AS BIGINT)
           END AS est_distinct,
           (SELECT count(DISTINCT user_id) FROM events) AS true_distinct
    FROM stats
    """,
    doc=(
        "training-data op: K-minimum-values distinct sketch (k=64) — "
        "deterministic md5 order statistics, so the estimate is "
        "bit-reproducible across engines (unlike HLL); emits the exact "
        "count alongside for error inspection"
    ),
)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    ev = load_table(spark, sf_dir, "events")
    k = 64
    hashed = ev.select(
        portable_md5(F.col("user_id").cast("string")).alias("h")
    )

    # Per-partition KMV state (the classic mergeable-sketch shape):
    # each partition keeps its k smallest DISTINCT hashes in a bounded
    # numpy buffer and emits <=k rows, so the global TakeOrdered merges
    # k x n_partitions rows. This replaces a distinct() pre-pass — a
    # full shuffle of every distinct hash — with zero shuffles before
    # the (tiny) final merge; duplicates cannot change the k-minimum
    # set, and capping after each Arrow batch bounds memory at O(k).
    def topk_part(batches):
        state = np.array([], dtype=object)
        for pdf in batches:
            u = pd.unique(pdf["h"])
            state = np.sort(np.union1d(state, u))[:k]
        if len(state):
            yield pd.DataFrame({"h": state})

    part_topk = hashed.mapInPandas(
        topk_part, schema=T.StructType([T.StructField("h", T.StringType())])
    )
    # distinct BEFORE the take: the same hash can reach the top-k of two
    # partitions; on <= k*n_partitions rows this dedup is negligible
    topk = part_topk.distinct().orderBy("h").limit(k)
    # kth-min hash as a fraction of the hash space: first 15 hex chars
    # (60 bits) / 16^15 — identical arithmetic on both engines
    stats = topk.agg(
        F.max("h").alias("kth"), F.count(F.lit(1)).alias("k")
    )
    frac = F.conv(F.substring("kth", 1, 15), 16, 10).cast("double") / F.lit(
        1152921504606846976.0
    )
    est = F.when(F.col("k") < k, F.col("k").cast("long")).otherwise(
        F.floor((F.col("k") - 1) / frac + 0.5).cast("long")
    )
    true_d = ev.select(F.countDistinct("user_id").alias("true_distinct"))
    return stats.crossJoin(F.broadcast(true_d)).select(
        "k", est.alias("est_distinct"), "true_distinct"
    )
