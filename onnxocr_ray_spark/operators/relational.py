"""Relational-analog queries for SURVEY.md §2 operator IDs + engine coverage.

These are the SQL-expressible faces of the reference's dataflow operators
(FIXTURES.md §F4): each query implements the operator's relational
semantics with the DataFrame API and carries a DuckDB oracle. Exact-parity
tests for the kernels themselves live in tests/test_kernels.py — the
window-sort analog here is a documented *approximation* of the bounded
bubble pass (SURVEY.md §2.5), used as a coverage check, not the production
path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from onnxocr_ray_spark.registry import register
from onnxocr_ray_spark.sources.tables import load_table


# --- flt_dropscore + pred_binarize (onnx_paddleocr.py:107-112; db_postprocess.py:218) ---

@register(
    "flt_dropscore",
    sql="""
    SELECT doc_id, round(least(n_chars / 600.0, 1.0), 6) AS score
    FROM documents
    WHERE round(least(n_chars / 600.0, 1.0), 6) >= 0.5
    """,
    doc="flt_dropscore, pred_binarize, flt_boxscore: confidence filter over a scored projection",
)
def flt_dropscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    score = F.round(F.least(F.col("n_chars") / 600.0, F.lit(1.0)), 6)
    return (
        docs.select("doc_id", score.alias("score"))
        .filter(F.col("score") >= 0.5)
    )


# --- lim_candidates (predict_det.py:34, db_postprocess.py:117) ---

@register(
    "lim_candidates",
    priority=15,  # rotation r5: no driver row since r2/r3 - back into the checked window
    sql="""
    SELECT doc_id, lang, rn FROM (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents
    ) WHERE rn <= 100
    """,
    doc="lim_candidates: per-group top-K candidate cap as row_number <= K",
)
def lim_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).cast("long").alias("rn"))
        .filter(F.col("rn") <= 100)
    )


# --- sort_boxes window approximation (onnx_paddleocr.py:13-33; SURVEY §2.5) ---

@register(
    "sort_boxes_window",
    sql="""
    SELECT event_id, user_id,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS reading_order
    FROM events
    """,
    doc="sort_boxes (relational APPROXIMATION): reading-order ranking via window; exact bounded-bubble semantics live in kernels/sort.py",
)
def sort_boxes_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id", "user_id", F.row_number().over(w).cast("long").alias("reading_order")
    )


# --- zip_boxrec (onnx_paddleocr.py:108,127-129): positional zip as 1:1 equi-join ---

@register(
    "zip_boxrec",
    sql="""
    WITH spans AS (
      SELECT l_orderkey AS okey,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice) AS span_idx,
             l_quantity AS qty, l_extendedprice AS price
      FROM lineitem
    )
    SELECT a.okey, a.span_idx, a.qty, b.price
    FROM (SELECT okey, span_idx, qty FROM spans) a
    JOIN (SELECT okey, span_idx, price FROM spans) b
      ON a.okey = b.okey AND a.span_idx = b.span_idx
    """,
    doc="zip_boxrec: boxes-to-recognition positional zip as inner 1:1 join on (doc, span_idx); span_idx derived by deterministic row_number since (l_orderkey, l_linenumber) is not unique in the test data",
)
def zip_boxrec(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"
    )
    spans = li.select(
        F.col("l_orderkey").alias("okey"),
        F.row_number().over(w).cast("long").alias("span_idx"),
        F.col("l_quantity").alias("qty"),
        F.col("l_extendedprice").alias("price"),
    )
    a = spans.select("okey", "span_idx", "qty")
    b = spans.select("okey", "span_idx", "price")
    return a.join(b, ["okey", "span_idx"], "inner")


# --- agg_batchratio (predict_rec.py:94-107): grouped MAX feeding the group ---

@register(
    "agg_batchratio",
    sql="""
    SELECT l_orderkey, l_linenumber, batch_id,
           round(max(l_quantity) OVER (PARTITION BY l_orderkey, batch_id), 2) AS batch_max_ratio
    FROM (
      SELECT l_orderkey, l_linenumber, l_quantity,
             cast(floor((row_number() OVER (PARTITION BY l_orderkey ORDER BY l_quantity, l_linenumber) - 1) / 6) AS INT) AS batch_id
      FROM lineitem
    )
    """,
    doc="agg_batchratio + batch_pack + sort_widthratio: width-argsort, chunks of 6, per-batch max re-applied to members",
)
def agg_batchratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    order_w = W.partitionBy("l_orderkey").orderBy("l_quantity", "l_linenumber")
    with_batch = li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.floor((F.row_number().over(order_w) - 1) / 6).cast("int").alias("batch_id"),
    )
    batch_w = W.partitionBy("l_orderkey", "batch_id")
    return with_batch.select(
        "l_orderkey",
        "l_linenumber",
        "batch_id",
        F.round(F.max("l_quantity").over(batch_w), 2).alias("batch_max_ratio"),
    )


# --- dec_ctc relational analog (rec_postprocess.py:58-111; SURVEY §2.7) ---

@register(
    "dec_ctc_analog",
    sql="""
    WITH toks AS (
      SELECT user_id, ts, event_id, event_type, substr(event_type, 1, 1) AS ch, value,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    )
    SELECT user_id,
           string_agg(ch, '' ORDER BY ts, event_id) AS decoded,
           round(avg(value), 6) AS mean_conf,
           count(*) AS n_tokens
    FROM toks
    WHERE (prev IS NULL OR prev <> event_type) AND event_type <> 'error'
    GROUP BY user_id
    """,
    doc="dec_ctc (relational analog): lag-based repeat suppression, blank drop, ordered join + agg_meanconf",
)
def dec_ctc_analog(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    toks = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.substring("event_type", 1, 1).alias("ch"),
        "value",
        "event_type",
        F.lag("event_type").over(w).alias("prev"),
    ).filter(
        (F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
        & (F.col("event_type") != "error")
    )
    return toks.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "ch"))),
                lambda x: x["ch"],
            ),
            "",
        ).alias("decoded"),
        F.round(F.avg("value"), 6).alias("mean_conf"),
        F.count(F.lit(1)).alias("n_tokens"),
    )


# --- agg_meanconf (rec_postprocess.py:71-83) ---

@register(
    "agg_meanconf",
    sql="""
    SELECT user_id, round(avg(value), 6) AS mean_conf, count(*) AS n
    FROM events GROUP BY user_id
    """,
    doc="agg_meanconf: mean confidence per span group",
)
def agg_meanconf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.round(F.avg("value"), 6).alias("mean_conf"),
        F.count(F.lit(1)).alias("n"),
    )


# --- pred_binarize + map_clip as column expressions (db_postprocess.py:218; predict_det.py:64-68) ---

@register(
    "binarize_clip",
    priority=15,  # rotation r5: no driver row since r2/r3 - back into the checked window
    sql="""
    SELECT event_id, (value > 0.3) AS seg,
           round(least(greatest(value, 0.0), 1.0), 6) AS clipped
    FROM events
    """,
    doc="pred_binarize + map_clip: elementwise threshold predicate and coordinate clamp",
)
def binarize_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        (F.col("value") > 0.3).alias("seg"),
        F.round(F.least(F.greatest(F.col("value"), F.lit(0.0)), F.lit(1.0)), 6).alias(
            "clipped"
        ),
    )


# --- proj_keepkeys (operators.py:178-186) ---

@register(
    "proj_keepkeys",
    priority=15,  # rotation r5: no driver row since r2/r3 - back into the checked window
    sql="SELECT p_partkey, p_name, p_size FROM part WHERE p_size >= 10",
    doc="proj_keepkeys: ordered-projection with pushdown filter (KeepKeys)",
)
def proj_keepkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select("p_partkey", "p_name", "p_size").filter(F.col("p_size") >= 10)


# --- engine coverage: TPC-H-style aggregation (Q1) ---

@register(
    "q1_pricing",
    sql="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="engine coverage: grouped multi-aggregate scan (TPC-H Q1 shape)",
)
def q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --- engine coverage: broadcast join + grouped revenue (Q3 shape) ---

@register(
    "q3_revenue",
    sql="""
    SELECT l.l_orderkey AS okey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, okey
    LIMIT 20
    """,
    doc="engine coverage: selective dim broadcast-join + grouped agg + deterministic top-N (TPC-H Q3 shape)",
)
def q3_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    return (
        l.join(F.broadcast(o), l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("l_orderkey").alias("okey"), "o_orderdate", "o_orderpriority"
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("okey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "okey")
        .limit(20)
    )


# --- engine coverage: top-K per group window ---

@register(
    "topk_per_group",
    sql="""
    SELECT p_brand, p_partkey, p_retailprice FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
      FROM part
    ) WHERE rn <= 3
    """,
    doc="engine coverage: top-K per group (window + filter)",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), "p_partkey")
    return (
        part.select(
            "p_brand", "p_partkey", "p_retailprice", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


# --- engine coverage: rollup grouping sets ---

@register(
    "rollup_lineitem",
    sql="""
    SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity), 2) AS qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="engine coverage: rollup grouping sets",
)
def rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty")
    )


# --- engine coverage: sessionization (gap > 30 min) ---

@register(
    "sessionize",
    sql="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, session_id, count(*) AS n_events
    FROM (
      SELECT user_id, event_id,
             cast(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM flagged
    )
    GROUP BY user_id, session_id
    """,
    doc="engine coverage: sessionization via lag-gap + running sum (streaming session_window batch analog)",
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(w).isNull()
            # parquet yields TIMESTAMP_NTZ; route through TIMESTAMP (session
            # tz = UTC) to get epoch seconds matching DuckDB's epoch(ts)
            | (
                F.col("ts").cast("timestamp").cast("long")
                - F.lag("ts").over(w).cast("timestamp").cast("long")
                > 1800
            ),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    running = flagged.select(
        "user_id",
        "event_id",
        F.sum("new_session")
        .over(w.rowsBetween(W.unboundedPreceding, 0))
        .cast("long")
        .alias("session_id"),
    )
    return running.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )


# --- streaming analog: hourly tumbling window (batch form) ---

@register(
    "window_hourly",
    sql="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS hour, event_type,
           count(*) AS n, round(sum(value), 4) AS total
    FROM events GROUP BY 1, 2
    """,
    doc="streaming surface (batch analog): tumbling 1h window agg; streaming form in streaming/pipeline.py",
)
def window_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .select(F.col("w.start").alias("hour"), "event_type", "n", "total")
    )
