"""Plans: lineage, checkpointing, idempotent resume."""

from onnxocr_ray_spark.plans.lineage import ExtractionRun, run_extraction

__all__ = ["ExtractionRun", "run_extraction"]
