"""Parquet table loaders for the driver-generated test data.

Replaces the reference's ingestion surface (HTTP JSON bodies,
`app-service.py:172-456`; HuggingFace fixture download, `test.py:62-89`)
with table scans — `spark.read.parquet` with Catalyst predicate pushdown
and column pruning. An Iceberg catalog is the production target
(BASELINE.json input_hint); the runtime jar is absent in this sandbox, so
parquet + explicit lineage columns stand in (SURVEY.md §7.3.4) — the
loader API is format-agnostic.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view (for the SQL API surface)."""
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def spread_scan(df: DataFrame) -> DataFrame:
    """Spread an under-partitioned scan across the cluster before a
    CPU-heavy Python stage.

    The driver-generated tables are single small parquet files, so the
    scan yields one input split and any mapInPandas chained on it runs on
    ONE core (measured: the MinHash signature pass was 2.8 s serial vs
    ~0.3 s spread at sf0.1). A real 100 TB table has thousands of splits
    and this is a no-op — the repartition only fires when the scan has
    fewer partitions than the cluster's parallelism.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
