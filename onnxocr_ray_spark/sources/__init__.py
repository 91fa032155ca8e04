"""Sources: table loaders and the deterministic pages synthesizer."""

from onnxocr_ray_spark.sources.tables import TABLES, load_table, register_views
from onnxocr_ray_spark.sources.pages import pages_from_documents, synth_page

__all__ = ["TABLES", "load_table", "register_views", "pages_from_documents", "synth_page"]
