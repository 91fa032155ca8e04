"""Third batch of engine-coverage queries: multi-way joins, cube grouping
sets, semi-structured JSON extraction, set operations, and the SQL-API
front-end (spark.sql over registered views — proving both front-ends
produce the same Catalyst plans)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from onnxocr_ray_spark.registry import register
from onnxocr_ray_spark.sources.tables import load_table, register_views


# --- 5-way star join (TPC-H Q5 shape) ---

@register(
    "q5_region_revenue",
    priority=85,  # rotation r5: green r4 (and prior rounds), parked; rotate back next
    sql="""
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
    doc="engine coverage: 5-way star join with selective dim filter (TPC-H Q5 shape; dims broadcast)",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(F.broadcast(o), l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


# --- cube grouping sets ---

@register(
    "cube_events",
    priority=85,  # rotation r5: green r4 (and prior rounds), parked; rotate back next
    sql="""
    SELECT event_type, cast(user_id % 5 AS BIGINT) AS user_band,
           count(*) AS n, round(sum(value), 4) AS total
    FROM events GROUP BY CUBE (event_type, cast(user_id % 5 AS BIGINT))
    """,
    doc="engine coverage: CUBE grouping sets over two dimensions",
)
def cube_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "user_band", (F.col("user_id") % 5).cast("long")
    )
    return ev.cube("event_type", "user_band").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total")
    )


# --- semi-structured JSON extraction ---

@register(
    "json_props",
    priority=85,  # rotation r5: green r4 (and prior rounds), parked; rotate back next
    sql="""
    SELECT event_type,
           round(avg(cast(json_extract_string(props, '$.k') AS DOUBLE)), 6) AS avg_k,
           count(*) FILTER (WHERE json_extract_string(props, '$.k') IS NOT NULL) AS n_with_k
    FROM events GROUP BY event_type
    """,
    doc="engine coverage: semi-structured JSON field extraction + aggregation (get_json_object / json_extract)",
)
def json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return ev.groupBy("event_type").agg(
        F.round(F.avg(k.cast("double")), 6).alias("avg_k"),
        F.count(F.when(k.isNotNull(), 1)).alias("n_with_k"),
    )


# --- set operations ---

@register(
    "setops_active_buyers",
    priority=85,  # rotation r5: green r4 (and prior rounds), parked; rotate back next
    sql="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'click'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'error' AND value > 300
    """,
    doc="engine coverage: INTERSECT / EXCEPT set operations",
)
def setops_active_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id")
    clickers = ev.filter(F.col("event_type") == "click").select("user_id")
    noisy = ev.filter(
        (F.col("event_type") == "error") & (F.col("value") > 300)
    ).select("user_id")
    return buyers.intersect(clickers).subtract(noisy)


# --- SQL-API front-end (spark.sql over registered views) ---

@register(
    "sql_api_q6",
    priority=85,  # rotation r5: green r4 (and prior rounds), parked; rotate back next
    sql="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="engine coverage: the SQL front-end — spark.sql() over register_views produces the same Catalyst plan as the DataFrame API (TPC-H Q6 shape)",
)
def sql_api_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
               count(*) AS n
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
        """
    )
