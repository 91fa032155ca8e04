"""Streaming wrappers over the batch operators.

The reference has no streaming semantics — its FastAPI service answers
one request at a time (`app-service.py:392-456`). The Spark-native
continuous form is:

- ``extract_stream``: ``readStream`` over an arriving pages directory →
  ``foreachBatch`` running the SAME ``extract()`` used in batch (so
  byte-identity per url carries over verbatim) → append to the output
  table. Exactly-once via the streaming checkpoint + idempotent batch
  writes.
- ``windowed_events_stream``: watermarked tumbling-window aggregation —
  the streaming form of the batch ``window_hourly`` registry query.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from onnxocr_ray_spark.config import DEFAULT_CONFIG, ExtractConfig
from onnxocr_ray_spark.operators.extract import extract
from onnxocr_ray_spark.sources.pages import PAGES_SCHEMA


def extract_stream(
    spark: SparkSession,
    pages_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    max_files_per_trigger: int = 4,
) -> StreamingQuery:
    """Continuously extract pages arriving as parquet files.

    foreachBatch keeps the full batch operator graph (fused fast path,
    straggler routing) — each micro-batch is just a bounded pages table.
    """
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(pages_dir)
    )

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        out = extract(batch_df, cfg).withColumn("epoch_id", F.lit(epoch_id))
        out.write.mode("append").parquet(output_dir)

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def windowed_events_stream(
    spark: SparkSession,
    events_dir: str,
    watermark: str = "2 hours",
    window: str = "1 hour",
    schema: Optional[str] = None,
) -> DataFrame:
    """Watermarked tumbling-window aggregation over streaming events.

    Returns the streaming DataFrame (caller attaches the sink); with a
    memory sink + ``processAllAvailable`` this is deterministic on a
    bounded directory, matching the batch ``window_hourly`` oracle.
    """
    schema = schema or (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    stream = spark.readStream.schema(schema).parquet(events_dir)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .select(F.col("w.start").alias("hour"), "event_type", "n", "total")
    )
