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
