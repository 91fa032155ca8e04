"""Registry entries for the flagship extraction pipeline itself.

These run the real three-stage pipeline over pages synthesized from the
``documents`` table at the requested scale. They are not SQL-expressible
(three mapInPandas stages + the bounded bubble sort), so the driver
records rows-only checks; byte-level correctness is enforced by the
oracle parity suite (tests/test_extract_parity.py) instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from onnxocr_ray_spark.operators.extract import extract
from onnxocr_ray_spark.registry import register
from onnxocr_ray_spark.sources.pages import pages_table


@register(
    "extract_e2e",
    priority=95,
    sql=None,
    doc="flagship: full detect->classify->recognize->assemble extraction (src_base64..flt_dropscore composition; oracle parity in pytest)",
)
def extract_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = pages_table(spark, sf_dir)
    return extract(pages).select("url", "extracted_text", "n_spans", "checksum")


@register(
    "detection_only",
    priority=95,
    sql=None,
    doc="partial pipeline (POST /detection analog, app-service.py:172-223): detect + reading-order sort, boxes only",
)
def detection_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    from onnxocr_ray_spark.operators.extract import detect

    pages = pages_table(spark, sf_dir)
    det = detect(pages)
    # registry-facing projection serializes the nested arrays to JSON
    # strings: the driver canonicalizer sorts row values, and top-level
    # list cells are unhashable (the round-1 failure mode). The structured
    # form stays available through the library API (operators.extract.detect).
    return det.select(
        "url",
        "n_regions",
        F.to_json(F.expr("transform(spans, s -> s.box)")).alias("boxes"),
        F.to_json(
            F.expr("transform(spans, s -> cast(round(s.det_score * 1000000) as long))")
        ).alias("det_score_ppm"),
    )


@register(
    "extract_spans",
    priority=95,
    sql=None,
    doc="flagship detail: exploded span rows (sort_boxes order, zip_boxrec alignment, per-span scores)",
)
def extract_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = pages_table(spark, sf_dir)
    out = extract(pages)
    return out.select(
        "url", F.explode("spans").alias("s")
    ).select(
        "url",
        F.col("s.span_idx").alias("span_idx"),
        F.col("s.text").alias("text"),
        F.round(F.col("s.score"), 6).alias("score"),
        F.col("s.angle").alias("angle"),
        F.col("s.batch_id").alias("batch_id"),
        F.col("s.rec_width").alias("rec_width"),
    )
