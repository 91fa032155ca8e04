"""Per-executor model-session plumbing.

The reference holds one ONNX Runtime session per process, built lazily
and configured once (`onnxocr/predict_base.py:9-70`: graph opt BASIC,
mem pattern off, cpu arena off, CUDA EP with 2 GB cap + CPU fallback).
The Spark-native equivalent is a module-level session cache inside each
executor's Python worker, keyed by model path — a worker builds its
session on first use and every subsequent Arrow batch reuses it
(SURVEY.md §7.0).

The reference snapshot ships no det/rec model blobs
(`.MISSING_LARGE_BLOBS`), so the default providers are deterministic
pure-Python stand-ins with the SAME I/O contract; a real ONNX model is a
config swap: put the .onnx file on SparkFiles / --files and pass its
path. onnxruntime is import-gated (not present in this container).

Determinism pins for a real-model deployment (SURVEY.md §4.1.5):
``intra_op_num_threads=1`` (Spark task parallelism owns the cores),
graph optimization BASIC, memory pattern and cpu arena disabled.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

try:  # pragma: no cover - not installed in this container
    import onnxruntime as ort  # type: ignore

    HAVE_ORT = True
except ImportError:
    HAVE_ORT = False

# executor-local (one per Python worker process); never pickled
_SESSION_CACHE: Dict[str, object] = {}


def get_session(model_path: str):  # pragma: no cover - needs onnxruntime
    """Lazily build and cache one ORT session per worker per model path."""
    if not HAVE_ORT:
        raise NotImplementedError(
            "onnxruntime is not available in this container; stages run the "
            "deterministic stand-in scorers (see StandinClassifier etc.)"
        )
    sess = _SESSION_CACHE.get(model_path)
    if sess is None:
        opts = ort.SessionOptions()
        opts.intra_op_num_threads = 1  # Spark tasks own the cores
        opts.graph_optimization_level = ort.GraphOptimizationLevel.ORT_ENABLE_BASIC
        opts.enable_mem_pattern = False
        opts.enable_cpu_mem_arena = False
        sess = ort.InferenceSession(
            model_path, sess_options=opts, providers=["CPUExecutionProvider"]
        )
        _SESSION_CACHE[model_path] = sess
    return sess


class StandinClassifier:
    """Deterministic stand-in with the angle-classifier I/O contract:
    batch of region contents -> [(label, prob)] (cls_postprocess.py:12-28).
    """

    def __call__(self, raws):
        from onnxocr_ray_spark.kernels.classify import classify_angle

        return [classify_angle(r) for r in raws]


class StandinRecognizer:
    """Deterministic stand-in with the recognizer I/O contract:
    (batch of contents, per-item rec_width) -> [(text, score)]
    (rec_postprocess.py:58-111)."""

    def __call__(self, raws, rec_widths):
        from onnxocr_ray_spark.kernels.recognize import recognize_span

        return [recognize_span(r, w) for r, w in zip(raws, rec_widths)]


def classifier_provider(model_path: Optional[str] = None) -> Callable:
    """Returns the classify callable a stage should use — the real ORT
    session wrapper when a model path is configured and onnxruntime is
    present, the stand-in otherwise."""
    if model_path is not None and HAVE_ORT:  # pragma: no cover
        session = get_session(model_path)
        raise NotImplementedError(
            "real-model preprocessing (resize/normalize to the cls input "
            "tensor) requires the raster pipeline; wire predict-time "
            "preprocessing here when deploying with real blobs"
        )
    return StandinClassifier()


def recognizer_provider(model_path: Optional[str] = None) -> Callable:
    if model_path is not None and HAVE_ORT:  # pragma: no cover
        session = get_session(model_path)
        raise NotImplementedError(
            "real-model preprocessing requires the raster pipeline; wire "
            "predict-time preprocessing here when deploying with real blobs"
        )
    return StandinRecognizer()
