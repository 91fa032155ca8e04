"""Multi-level aggregation + deterministic quantile sketch.

Extends the §2.9 aggregation surface (rollup/cube already covered in
relational3) with:

- ``grouping_sets_events``: arbitrary GROUPING SETS — the general form
  rollup/cube specialize; one shuffle produces all requested levels
  (Spark expands the sets map-side, the classic multi-level agg plan).
- ``quantile_hist_det``: per-group quantiles from a two-pass fixed-bin
  histogram — a DETERMINISTIC, mergeable quantile sketch. Unlike
  approx_percentile/t-digest, identical arithmetic runs on both engines
  (bin = floor((v - min)/width), estimate = bin lower edge), so the
  oracle checks it exactly. At 10^12 rows the plan is two scans: a
  2-value global agg (broadcast back), then one groupBy of
  (group, bin) — cardinality bounded by groups x n_bins regardless of
  row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from onnxocr_ray_spark.registry import register
from onnxocr_ray_spark.sources.tables import load_table

N_BINS = 256


@register(
    "grouping_sets_events",
    priority=85,  # rotation r5: green r4 (and prior rounds), parked; rotate back next
    sql="""
    SELECT coalesce(event_type, 'ALL') AS etype,
           coalesce(extract(hour FROM ts), -1) AS hour_of_day,
           round(sum(value), 4) AS sum_value,
           count(*) AS n
    FROM events
    GROUP BY GROUPING SETS ((event_type), (event_type, extract(hour FROM ts)), ())
    """,
    doc=(
        "training-data op: GROUPING SETS multi-level aggregation — the "
        "general form of rollup/cube (relational3); one shuffle, all levels"
    ),
)
def grouping_sets_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.hour("ts").alias("hour_of_day"), "value"
    )
    return (
        ev.groupingSets(
            [["event_type"], ["event_type", "hour_of_day"], []],
            "event_type",
            "hour_of_day",
        )
        .agg(
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("etype"),
            F.coalesce("hour_of_day", F.lit(-1)).cast("long").alias("hour_of_day"),
            "sum_value",
            "n",
        )
    )


_QH_SQL = f"""
    WITH stats AS (
      SELECT min(value) AS vmin,
             greatest((max(value) - min(value)) / {N_BINS}, 1e-12) AS width
      FROM events
    ),
    binned AS (
      SELECT event_type,
             least(cast(floor((value - vmin) / width) AS BIGINT), {N_BINS - 1}) AS bin
      FROM events, stats
    ),
    counts AS (
      SELECT event_type, bin, count(*) AS c FROM binned GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, bin, c,
             sum(c) OVER (PARTITION BY event_type ORDER BY bin) AS cumc,
             sum(c) OVER (PARTITION BY event_type) AS tot
      FROM counts
    )
    SELECT event_type,
           round(min(CASE WHEN cumc >= 0.5 * tot
                 THEN vmin + bin * width END), 6) AS p50,
           round(min(CASE WHEN cumc >= 0.9 * tot
                 THEN vmin + bin * width END), 6) AS p90,
           round(min(CASE WHEN cumc >= 0.99 * tot
                 THEN vmin + bin * width END), 6) AS p99
    FROM cum, stats
    GROUP BY event_type
"""


@register(
    "quantile_hist_det",
    priority=85,  # rotation r5: green r4 (and prior rounds), parked; rotate back next
    sql=_QH_SQL,
    doc=(
        "training-data op: deterministic two-pass histogram quantile "
        "sketch (256 fixed bins, estimate = bin lower edge) — mergeable, "
        "engine-reproducible, state bounded by groups x bins at any scale"
    ),
)
def quantile_hist_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    stats = ev.agg(
        F.min("value").alias("vmin"),
        F.greatest(
            (F.max("value") - F.min("value")) / F.lit(N_BINS), F.lit(1e-12)
        ).alias("width"),
    )
    binned = ev.crossJoin(F.broadcast(stats)).select(
        "event_type",
        "vmin",
        "width",
        F.least(
            F.floor((F.col("value") - F.col("vmin")) / F.col("width")).cast("long"),
            F.lit(N_BINS - 1),
        ).alias("bin"),
    )
    counts = binned.groupBy("event_type", "vmin", "width", "bin").agg(
        F.count(F.lit(1)).alias("c")
    )
    w_cum = W.partitionBy("event_type").orderBy("bin")
    w_all = W.partitionBy("event_type")
    cum = counts.select(
        "event_type",
        "vmin",
        "width",
        "bin",
        F.sum("c").over(w_cum).alias("cumc"),
        F.sum("c").over(w_all).alias("tot"),
    )
    edge = F.col("vmin") + F.col("bin") * F.col("width")

    def q(p: float, name: str):
        return F.round(
            F.min(F.when(F.col("cumc") >= F.lit(p) * F.col("tot"), edge)), 6
        ).alias(name)

    return cum.groupBy("event_type").agg(q(0.5, "p50"), q(0.9, "p90"), q(0.99, "p99"))
