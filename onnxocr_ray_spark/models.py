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


def get_session(model_path: str):
    """Lazily build and cache one model session per worker per model path.

    Backend choice: onnxruntime when installed (the production path, with
    the reference's determinism pins); otherwise, when ``model_path``
    names an actually-readable .onnx file, the pure-numpy graph evaluator
    (``onnx_numpy.NumpyOnnxSession``) — which is how the reference's REAL
    cls.onnx weights (`onnxocr/models/*/cls/cls.onnx`, the only model
    blobs the snapshot ships) execute in this container where
    onnxruntime cannot be installed. A missing file without onnxruntime
    keeps the historical NotImplementedError."""
    sess = _SESSION_CACHE.get(model_path)
    if sess is not None:
        return sess
    if HAVE_ORT:  # pragma: no cover - needs onnxruntime
        opts = ort.SessionOptions()
        opts.intra_op_num_threads = 1  # Spark tasks own the cores
        opts.graph_optimization_level = ort.GraphOptimizationLevel.ORT_ENABLE_BASIC
        opts.enable_mem_pattern = False
        opts.enable_cpu_mem_arena = False
        sess = ort.InferenceSession(
            model_path, sess_options=opts, providers=["CPUExecutionProvider"]
        )
    else:
        import os

        if not os.path.isfile(model_path):
            raise NotImplementedError(
                "onnxruntime is not available in this container and "
                f"{model_path!r} is not a readable model file; stages run "
                "the deterministic stand-in scorers (see StandinClassifier)"
            )
        from onnxocr_ray_spark.onnx_numpy import NumpyOnnxSession

        sess = NumpyOnnxSession(model_path)
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


class OrtClassifier:
    """Real angle classifier: batch of HxWx3 uint8 region rasters ->
    [(label, prob)], via the cached per-worker ORT session.

    Re-derives the reference's batched run loop (predict_cls.py:43-86):
    width-argsort, chunks of ``batch_num``, per-item cls_resize_norm,
    one session.run per chunk, argmax postprocess, scatter back."""

    def __init__(self, model_path: str, image_shape=(3, 48, 192),
                 labels=("0", "180"), batch_num: int = 6):
        from onnxocr_ray_spark.preprocess import cls_postprocess, cls_resize_norm

        self._session = get_session(model_path)
        self._input = self._session.get_inputs()[0].name
        self._shape = image_shape
        self._labels = labels
        self._batch = batch_num
        self._pre = cls_resize_norm
        self._post = cls_postprocess

    def __call__(self, images):
        import numpy as np

        n = len(images)
        order = sorted(range(n), key=lambda i: images[i].shape[1] / images[i].shape[0])
        out = [None] * n
        for beg in range(0, n, self._batch):
            chunk = order[beg:beg + self._batch]
            batch = np.stack([self._pre(images[i], self._shape) for i in chunk])
            preds = self._session.run(None, {self._input: batch})[0]
            for i, res in zip(chunk, self._post(preds, self._labels)):
                out[i] = res
        return out


class OrtRecognizer:
    """Real CRNN+CTC recognizer: batch of HxWx3 uint8 rasters ->
    [(text, score)], via the cached per-worker ORT session.

    Re-derives the reference's batched run loop (predict_rec.py:82-120):
    width-argsort, chunks of ``batch_num``, per-chunk max aspect ratio ->
    shared dynamic width (rec_resize_norm), one session.run per chunk,
    greedy CTC decode, scatter back.

    ``rec_widths`` in the call contract is accepted and ignored: the
    stand-in consumes precomputed batch widths, while the real model
    derives the shared dynamic width from raster aspect ratios inside
    each chunk (the reference does the same, predict_rec.py:93-101)."""

    def __init__(self, model_path: str, charset, image_shape=(3, 48, 320),
                 batch_num: int = 6):
        from onnxocr_ray_spark.preprocess import ctc_greedy_decode, rec_resize_norm

        if not charset:
            # an empty charset would IndexError inside ctc_greedy_decode on
            # the first non-blank prediction; fail at construction instead
            raise ValueError(
                "OrtRecognizer requires the model's charset (the decode "
                "dictionary the reference loads from rec_char_dict_path)"
            )
        self._session = get_session(model_path)
        self._input = self._session.get_inputs()[0].name
        self._shape = image_shape
        self._charset = list(charset)
        self._batch = batch_num
        self._pre = rec_resize_norm
        self._decode = ctc_greedy_decode

    _warned_widths = False

    def __call__(self, images, rec_widths=None):
        import numpy as np

        if rec_widths is not None and not OrtRecognizer._warned_widths:
            OrtRecognizer._warned_widths = True
            import logging

            logging.getLogger(__name__).info(
                "OrtRecognizer ignores precomputed rec_widths: the real "
                "model derives each chunk's shared width from raster "
                "aspect ratios (predict_rec.py:93-101), so width-packing "
                "semantics differ from StandinRecognizer"
            )
        n = len(images)
        ratios = [im.shape[1] / float(im.shape[0]) for im in images]
        order = sorted(range(n), key=lambda i: ratios[i])
        out = [None] * n
        img_c, img_h, img_w = self._shape
        for beg in range(0, n, self._batch):
            chunk = order[beg:beg + self._batch]
            max_ratio = max([img_w / img_h] + [ratios[i] for i in chunk])
            batch = np.stack(
                [self._pre(images[i], max_ratio, self._shape) for i in chunk]
            )
            preds = self._session.run(None, {self._input: batch})[0]
            for i, res in zip(chunk, self._decode(preds, self._charset)):
                out[i] = res
        return out


def classifier_provider(model_path: Optional[str] = None) -> Callable:
    """Returns the classify callable a stage should use — the real ORT
    session wrapper when a model path is configured and onnxruntime is
    present, the deterministic stand-in otherwise. Both are plain
    callables built lazily INSIDE the worker (ship the .onnx via
    --files / SparkFiles and pass its path).

    Call-contract note: both families take one batch list, but the item
    REPRESENTATION differs — the stand-ins consume the extraction
    kernel's text-span payloads (``Region.raw``), the Ort wrappers
    consume HxWx3 uint8 rasters. The span->raster step (the analog of
    the reference's crop + perspective transform) is
    ``rasterize.render_crop``, and the stage wiring is
    ``operators/extract.py:_process_doc_spans`` — provider mode is a
    config swap (cls_model_path/rec_model_path/rec_charset), parity
    tested end-to-end in ``tests/test_provider_pipeline.py``.
    ``tests/test_models_qa.py`` pins both contracts with synthetic
    rasters. Without onnxruntime, a model path naming a real readable
    .onnx file runs through the numpy evaluator (see get_session) —
    that's how the reference's shipped cls weights execute here."""
    if model_path is not None:
        import os

        if not HAVE_ORT and not os.path.isfile(model_path):
            raise RuntimeError(
                f"model path {model_path!r} configured but onnxruntime is "
                "not installed on this worker and the path is not a "
                "readable model file"
            )
        return OrtClassifier(model_path)
    return StandinClassifier()


def recognizer_provider(model_path: Optional[str] = None,
                        charset: Optional[list] = None) -> Callable:
    """See classifier_provider for the call-contract note. ``charset``
    is REQUIRED when ``model_path`` is set (ValueError otherwise)."""
    if model_path is not None:
        import os

        if not HAVE_ORT and not os.path.isfile(model_path):
            raise RuntimeError(
                f"model path {model_path!r} configured but onnxruntime is "
                "not installed on this worker and the path is not a "
                "readable model file"
            )
        if not charset:
            raise ValueError(
                f"model path {model_path!r} configured without a charset; "
                "pass the model's decode dictionary (the reference's "
                "rec_char_dict_path contents)"
            )
        return OrtRecognizer(model_path, charset)
    return StandinRecognizer()


def provider_mode(cfg) -> bool:
    """True when the classify/recognize stages should run through model
    providers over synthetic crop rasters instead of the stand-in text
    kernels (operators/extract.py consults this per batch)."""
    return (
        cfg.provider_factory is not None
        or cfg.cls_model_path is not None
        or cfg.rec_model_path is not None
    )


def stage_providers(cfg):
    """(classifier, recognizer) for the classify/recognize stages, built
    lazily INSIDE the worker from the config's model paths (or from its
    injected provider_factory), and cached per worker so every Arrow
    batch reuses the same sessions. The factory path caches on the
    deserialized factory object itself — each task ships a fresh closure,
    but the underlying ORT sessions are still shared via _SESSION_CACHE."""
    if cfg.provider_factory is not None:
        got = getattr(cfg.provider_factory, "_providers", None)
        if got is None:
            got = cfg.provider_factory()
            try:
                cfg.provider_factory._providers = got
            except AttributeError:  # e.g. a bound method / partial
                pass
        return got
    key = (cfg.cls_model_path, cfg.rec_model_path, cfg.rec_charset)
    got = _PROVIDER_CACHE.get(key)
    if got is None:
        got = (
            classifier_provider(cfg.cls_model_path),
            recognizer_provider(
                cfg.rec_model_path,
                list(cfg.rec_charset) if cfg.rec_charset else None,
            ),
        )
        _PROVIDER_CACHE[key] = got
    return got


_PROVIDER_CACHE: Dict[tuple, tuple] = {}
