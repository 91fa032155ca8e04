"""File-directory ingestion (src_files analog).

The reference reads loose image files via cv2.imread in its docs/examples
(SURVEY.md §2.1 src_files); the Spark-native equivalent ingests a
directory of raw documents through the ``binaryFile`` source into the
standard pages shape, so every downstream operator works unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_html_dir(spark: SparkSession, path: str, glob: str = "*.html") -> DataFrame:
    """directory of html files -> pages-shaped DataFrame.

    url = file URI, warc_ts = file modification time, html = raw bytes;
    text/lang are null (unknown for loose files).
    """
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    return raw.select(
        F.col("path").alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("content").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )
