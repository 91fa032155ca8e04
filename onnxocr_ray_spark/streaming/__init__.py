"""Structured Streaming surface (optional per SURVEY.md §1.3: the
reference is request/response-only; this is the Spark-native equivalent
of running the same extraction continuously over arriving WARC batches)."""

from onnxocr_ray_spark.streaming.pipeline import (
    extract_stream,
    windowed_events_stream,
)

__all__ = ["extract_stream", "windowed_events_stream"]
