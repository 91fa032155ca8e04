"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json). Fill these in
as you implement operators from SURVEY.md §2.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Make the sibling package importable no matter the driver's cwd, and ship
# it to executors (the spark-submit --py-files idiom, self-service).
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)


def _prepare(spark: SparkSession) -> None:
    from onnxocr_ray_spark.packaging import ship_package

    ship_package(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full three-stage content extraction over a
    Common-Crawl-style pages table synthesized (deterministically, seeded)
    from /root/testdata/sf0.001/documents.parquet.

    Returns one row per url with the extracted main content, span count,
    and sha256 checksum — the north-rule pipeline end to end.
    """
    from onnxocr_ray_spark.operators.extract import extract
    from onnxocr_ray_spark.sources.pages import pages_from_documents

    _prepare(spark)
    pages = pages_from_documents(spark, "/root/testdata/sf0.001")
    return extract(pages).select("url", "extracted_text", "n_spans", "checksum")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    training-data extension set). See onnxocr_ray_spark/registry.py.
    """
    from onnxocr_ray_spark.registry import load_all

    def wrap(q):
        def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
            _prepare(spark)
            return q.fn(spark, sf_dir)

        fn.__name__ = q.name
        fn.__doc__ = q.doc
        return fn

    return {name: wrap(q) for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle per query; non-SQL-expressible ops are omitted and
    get the driver's rows-only check (extract_e2e / extract_spans /
    detection_only — three mapInPandas stages + the bounded bubble sort
    are not SQL; their correctness gate is the byte-identity oracle
    parity pytest suite instead)."""
    from onnxocr_ray_spark.registry import load_all

    return {name: q.sql for name, q in load_all().items() if q.sql is not None}
