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


def read_b64_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSONL ingestion of base64-wire payloads (src_base64 analog: the
    reference accepts base64-encoded images in its POST bodies,
    app-service.py:30-31,81; the corpus-scale equivalent is newline-
    delimited JSON records {"url": ..., "ts": ..., "html_b64": ...}).

    ``unbase64`` runs JVM-side (whole-stage codegen) — the wire decode
    never touches Python.
    """
    raw = spark.read.json(path)
    return raw.select(
        F.col("url"),
        F.col("ts").cast("timestamp").alias("warc_ts"),
        F.unbase64(F.col("html_b64")).alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )


def _register_b64_query():
    from onnxocr_ray_spark.registry import register
    from onnxocr_ray_spark.sources.tables import load_table

    @register(
        "src_base64_roundtrip",
    priority=85,  # rotation r5: green r4 (and prior rounds), parked; rotate back next
        sql="""
        SELECT doc_id,
               base64(encode(text)) AS b64,
               octet_length(from_base64(base64(encode(text)))) AS n_bytes,
               md5(decode(from_base64(base64(encode(text))))) AS decoded_hash
        FROM documents
        """,
        doc=(
            "src_base64 (app-service.py:30-31,81): base64 wire encode/decode "
            "round-trip, JVM-side unbase64; hash proves byte fidelity"
        ),
    )
    def src_base64_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        # Spark's base64() emits MIME 76-char line chunking; strip the CRLF
        # to the canonical unchunked form (what DuckDB base64 and typical
        # JSON wire formats carry). unbase64 accepts both.
        b64 = F.regexp_replace(
            F.base64(F.col("text").cast("binary")), "[\\r\\n]", ""
        )
        return docs.select(
            "doc_id",
            b64.alias("b64"),
            F.length(F.unbase64(b64)).cast("long").alias("n_bytes"),
            F.md5(F.unbase64(b64)).alias("decoded_hash"),
        )


_register_b64_query()
