"""Parquet table loaders for the driver-generated test data.

Replaces the reference's ingestion surface (HTTP JSON bodies,
`app-service.py:172-456`; HuggingFace fixture download, `test.py:62-89`)
with table scans — `spark.read.parquet` with Catalyst predicate pushdown
and column pruning. An Iceberg catalog is the production target
(BASELINE.json input_hint): ``load_table`` reads through the catalog
when an Iceberg runtime is on the classpath and ``SPARK_GRAFT_CATALOG``
names one, and falls back to parquet + explicit lineage columns
otherwise (SURVEY.md §7.3.4) — same API, same downstream plans.

Sandbox status (round 3, recorded attempt): no ``iceberg-spark-runtime``
jar ships with this PySpark install (287 jars checked) and the container
has no network to fetch one (maven central DNS fails), so the Iceberg
branch cannot execute here; ``iceberg_available`` gates it and
``tests/test_sources.py`` pins the fallback behavior. On a real cluster
the swap is configuration only: add the runtime jar + a catalog conf,
set ``SPARK_GRAFT_CATALOG``, and ``extract()``'s sized-table probe reads
``html_size`` through Iceberg's column stats for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def iceberg_available(spark: SparkSession) -> bool:
    """True iff an Iceberg runtime is actually on the JVM classpath (the
    SparkCatalog class loads). Cheap, cached per-JVM by the classloader."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Format-agnostic loader. With ``SPARK_GRAFT_CATALOG`` set AND an
    Iceberg runtime present, reads ``<catalog>.<db>.<name>`` through the
    catalog (snapshot isolation, stats-backed pruning); otherwise scans
    the sf_dir parquet file. Downstream operators are identical either
    way — they see a DataFrame with the same schema."""
    catalog = os.environ.get("SPARK_GRAFT_CATALOG")
    if catalog and iceberg_available(spark):  # pragma: no cover - needs jar
        return spark.read.format("iceberg").load(f"{catalog}.{name}")
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
