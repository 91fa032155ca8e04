"""Fourth batch of engine-coverage queries: semi/anti joins, RANGE-frame
windows, and the end-to-end corpus-curation pipeline (the keep/drop
decision a training-data user actually runs — dedup + quality + size
gates composed into one survivor set)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from onnxocr_ray_spark.functions import portable_md5
from onnxocr_ray_spark.registry import register
from onnxocr_ray_spark.sources.tables import load_table


# --- EXISTS semi-join (TPC-H Q4 shape) ---

@register(
    "q4_order_priority",
    sql="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
    )
    GROUP BY o_orderpriority
    """,
    doc="engine coverage: EXISTS correlated subquery as LEFT SEMI join (TPC-H Q4 shape, mixed equi + range condition)",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --- LEFT ANTI join ---

@register(
    "anti_customers_no_orders",
    sql="""
    SELECT c.c_nationkey, count(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    GROUP BY c.c_nationkey
    """,
    doc="engine coverage: NOT EXISTS as LEFT ANTI join (customers with no urgent orders, per nation)",
)
def anti_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_custkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# --- RANGE-frame window (time-based rolling aggregate) ---

@register(
    "rolling_1h_user_value",
    sql="""
    SELECT event_id, user_id,
           round(sum(value) OVER (
             PARTITION BY user_id ORDER BY epoch(ts)::BIGINT
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
           ), 4) AS rolling_1h,
           count(*) OVER (
             PARTITION BY user_id ORDER BY epoch(ts)::BIGINT
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
           ) AS n_1h
    FROM events
    """,
    doc="engine coverage: time-based RANGE window frame (rolling 1h sum per user) — value-based frames, not row counts; tie-safe by construction",
)
def rolling_1h_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    epoch = F.col("ts").cast("timestamp").cast("long")
    w = (
        W.partitionBy("user_id")
        .orderBy(epoch)
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 4).alias("rolling_1h"),
        F.count(F.lit(1)).over(w).alias("n_1h"),
    )


# --- end-to-end corpus curation (the training-data keep/drop pipeline) ---

# the curation decision, shared verbatim with curate_pack_e2e's oracle
# (operators/sampling.py) so the two queries cannot drift apart
CURATE_SCORED_SQL = """
      SELECT doc_id, lang,
             min(doc_id) OVER (PARTITION BY md5(text)) AS keeper,
             CASE WHEN length(trim(text, ' ')) = 0 THEN 0
                  ELSE length(trim(text, ' ')) - length(replace(trim(text, ' '), ' ', '')) + 1
             END AS n_tokens,
             round(least((length(trim(text, ' ')) - length(replace(trim(text, ' '), ' ', '')) + 1)
                         / 100.0, 1.0) * 0.5
                   + length(regexp_replace(text, '[^a-z]', '', 'g'))
                     / greatest(length(text), 1)::DOUBLE * 0.5, 6) AS quality
      FROM documents
"""
CURATE_KEEP_PRED = "doc_id = keeper AND n_tokens >= 30 AND quality >= 0.6"


@register(
    "curate_corpus",
    sql=f"""
    WITH scored AS ({CURATE_SCORED_SQL})
    SELECT doc_id, lang, n_tokens, quality
    FROM scored
    WHERE {CURATE_KEEP_PRED}
    """,
    doc=(
        "training-data op: end-to-end corpus curation — exact-dedup survivor "
        "(min doc_id per content hash) + token-count and quality gates, the "
        "composed keep/drop decision a pretraining pipeline runs per shard"
    ),
)
def curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = F.trim(F.col("text"))
    n_tokens = F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))) + 1
    )
    length = F.greatest(F.length("text"), F.lit(1)).cast("double")
    alpha = F.length(F.regexp_replace("text", "[^a-z]", ""))
    quality = F.round(
        F.least(n_tokens / 100.0, F.lit(1.0)) * 0.5 + alpha / length * 0.5, 6
    )
    keeper = F.min("doc_id").over(W.partitionBy(portable_md5(F.col("text"))))
    scored = docs.select(
        "doc_id",
        "lang",
        keeper.alias("keeper"),
        n_tokens.cast("long").alias("n_tokens"),
        quality.alias("quality"),
    )
    return scored.filter(
        (F.col("doc_id") == F.col("keeper"))
        & (F.col("n_tokens") >= 30)
        & (F.col("quality") >= 0.6)
    ).select("doc_id", "lang", "n_tokens", "quality")


# --- bucketed co-located join (the 100-TB shuffle-elision story) ---

@register(
    "bucketed_join_docs_embeddings",
    priority=12,
    sql="""
    SELECT d.doc_id, d.lang, d.n_chars, e.label
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """,
    doc=(
        "engine coverage: co-located join over BUCKETED tables — both "
        "sides written bucketBy(join key) so the join plans with zero "
        "Exchange (plan-asserted in tests/test_plans.py); the recipe for "
        "repeated fact-fact joins at 10^12 rows"
    ),
)
def bucketed_join_docs_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join documents⋈embeddings on the id key via bucketed tables.

    At 100 TB a fact-fact join shuffles BOTH sides every run; writing the
    tables bucketed by the join key once (an ingest-time cost) makes every
    subsequent join a zero-shuffle per-bucket sort-merge — the DataFrame
    mirror of Iceberg's bucket partition transform. Correctness is
    independent of the physical layout, which is why the oracle is the
    plain join.

    Lifecycle (VERDICT/ADVICE r4): the demo tables live in a DEDICATED
    database with SESSION-SCOPED storage paths (pid in the path, so
    concurrent sessions never race on one /tmp location), are reused
    within a session only after validating the path still exists and the
    row count matches the source (a regenerated sf_dir or a cleaned /tmp
    forces a rebuild instead of returning stale/empty rows), and are
    dropped — catalog entries AND files — at interpreter exit."""
    import hashlib
    import os
    import tempfile

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    n_buckets = 8
    base = tempfile.gettempdir()
    db = "onnxocr_bucketed_demo"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    specs = [
        ("documents", "doc_id", ["doc_id", "lang", "n_chars"]),
        ("embeddings", "vec_id", ["vec_id", "label"]),
    ]
    for name, key, cols in specs:
        tbl = f"{db}.bkt_{name}_{tag}"
        path = f"{base}/onnxocr_bucketed_{os.getpid()}_{name}_{tag}"
        src = load_table(spark, sf_dir, name).select(*cols)
        valid = (
            spark.catalog.tableExists(tbl)
            and os.path.isdir(path)
            and spark.table(tbl).count() == src.count()
        )
        if not valid:
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
            (
                src.write.bucketBy(n_buckets, key)
                .sortBy(key)
                .option("path", path)
                .mode("overwrite")
                .format("parquet")
                .saveAsTable(tbl)
            )
            _track_bucketed_table(spark, tbl, path)
    d = spark.table(f"{db}.bkt_documents_{tag}")
    e = spark.table(f"{db}.bkt_embeddings_{tag}")
    return d.join(e, d.doc_id == e.vec_id).select(
        "doc_id", "lang", "n_chars", "label"
    )


# session-end cleanup for the bucketed demo tables: drop the catalog
# entries while the JVM is still up, remove the session-scoped /tmp
# storage unconditionally — two consecutive bench/driver runs leave no
# orphan tables or files behind
_BUCKETED_LIVE: list = []


def _track_bucketed_table(spark: SparkSession, tbl: str, path: str) -> None:
    import atexit

    if not _BUCKETED_LIVE:
        def _cleanup() -> None:
            import shutil

            for s, t, p in _BUCKETED_LIVE:
                try:
                    s.sql(f"DROP TABLE IF EXISTS {t}")
                except Exception:
                    pass  # session already stopped; files still removed
                shutil.rmtree(p, ignore_errors=True)

        atexit.register(_cleanup)
    _BUCKETED_LIVE.append((spark, tbl, path))
