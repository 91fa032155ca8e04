"""Traverses the real-ORT code path with a structural test double.

onnxruntime cannot be installed in this container (environment policy:
no pip/apt), so the native `session.run` is the ONLY line a real smoke
test could add. Everything else — `get_session`'s option pinning and
per-worker cache, `OrtClassifier`/`OrtRecognizer`'s batched run loops
(width argsort, chunking, per-chunk dynamic width, postprocess scatter),
and the provider guards — is exercised here against a fake `ort` module
that mimics the public onnxruntime API shape (clearly a test double, not
a vendored copy). The reference's runnable cls.onnx blobs
(/root/reference/onnxocr/models/*/cls/cls.onnx) stay unexercised until
an environment with onnxruntime exists; BENCH/BASELINE.md §5 records
the blocker.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

import onnxocr_ray_spark.models as models


class _FakeSessionOptions:
    def __init__(self):
        self.intra_op_num_threads = None
        self.graph_optimization_level = None
        self.enable_mem_pattern = None
        self.enable_cpu_mem_arena = None


class _FakeInput:
    name = "x"


class _FakeSession:
    """Deterministic stand-in for ort.InferenceSession: classifier mode
    returns 2-class scores from the mean pixel; recognizer mode returns
    a TxC one-hot sequence derived from batch index parity."""

    built = 0

    def __init__(self, model_path, sess_options=None, providers=None):
        _FakeSession.built += 1
        self.model_path = model_path
        self.sess_options = sess_options
        self.providers = providers
        self._rec = "rec" in model_path

    def get_inputs(self):
        return [_FakeInput()]

    def run(self, _out, feeds):
        batch = feeds["x"]
        n = batch.shape[0]
        if not self._rec:
            # bright crops -> label index 1 ("180"), dark -> 0
            mean = batch.mean(axis=(1, 2, 3))
            return [np.stack([0.5 - mean, 0.5 + mean], axis=1)]
        # T=4 steps, C=3 classes (blank + 2 chars): spell "ab" then blanks
        preds = np.zeros((n, 4, 3), dtype=np.float32)
        preds[:, 0, 1] = 1.0
        preds[:, 1, 2] = 1.0
        preds[:, 2, 0] = 1.0
        preds[:, 3, 0] = 1.0
        return [preds]


@pytest.fixture()
def fake_ort(monkeypatch):
    fake = types.ModuleType("onnxruntime")
    fake.SessionOptions = _FakeSessionOptions
    fake.GraphOptimizationLevel = types.SimpleNamespace(ORT_ENABLE_BASIC="basic")
    fake.InferenceSession = _FakeSession
    monkeypatch.setitem(sys.modules, "onnxruntime", fake)
    monkeypatch.setattr(models, "ort", fake, raising=False)
    monkeypatch.setattr(models, "HAVE_ORT", True)
    monkeypatch.setattr(models, "_SESSION_CACHE", {})
    _FakeSession.built = 0
    yield fake


def test_get_session_pins_options_and_caches(fake_ort):
    s1 = models.get_session("/models/cls.onnx")
    s2 = models.get_session("/models/cls.onnx")
    s3 = models.get_session("/models/rec.onnx")
    assert s1 is s2 and s1 is not s3          # one session per path
    assert _FakeSession.built == 2
    # the reference's determinism pins (predict_base.py:18-23)
    assert s1.sess_options.intra_op_num_threads == 1
    assert s1.sess_options.graph_optimization_level == "basic"
    assert s1.sess_options.enable_mem_pattern is False
    assert s1.sess_options.enable_cpu_mem_arena is False
    assert s1.providers == ["CPUExecutionProvider"]


def test_ort_classifier_batched_loop_scatters_back(fake_ort):
    clf = models.classifier_provider("/models/cls.onnx")
    # 8 crops of distinct widths (forces a non-identity argsort) in two
    # brightness classes; batch_num=6 forces two chunks
    imgs = []
    want = []
    for i in range(8):
        bright = i % 2 == 0
        img = np.full((32, 40 + 8 * i, 3), 255 if bright else 0, dtype=np.uint8)
        imgs.append(img)
        want.append("180" if bright else "0")
    out = clf(imgs)
    assert len(out) == 8
    labels = [lab for lab, _prob in out]
    assert labels == want                      # scatter-back preserves order
    # prob = max of the fake's raw (unsoftmaxed) scores: just shape-check
    assert all(isinstance(float(p), float) for _l, p in out)


def test_ort_recognizer_decodes_and_requires_charset(fake_ort):
    rec = models.recognizer_provider("/models/rec.onnx", charset=["a", "b"])
    imgs = [np.full((48, 60 + 20 * i, 3), 128, dtype=np.uint8) for i in range(7)]
    out = rec(imgs, rec_widths=None)           # unified call contract
    assert len(out) == 7
    for text, score in out:
        assert text == "ab"                    # CTC: [1,2,blank,blank] -> "ab"
        assert score == pytest.approx(1.0)
    with pytest.raises(ValueError):
        models.recognizer_provider("/models/rec.onnx", charset=[])
    with pytest.raises(ValueError):
        models.OrtRecognizer("/models/rec.onnx", charset=[])


def test_providers_guard_when_ort_missing(monkeypatch):
    monkeypatch.setattr(models, "HAVE_ORT", False)
    with pytest.raises(RuntimeError):
        models.classifier_provider("/models/cls.onnx")
    with pytest.raises(NotImplementedError):
        models.get_session("/models/cls.onnx")
