"""Hand-computed goldens for the real-model preprocess/postprocess
numerics (preprocess.py) — no onnxruntime or cv2 required: the resize is
injected (or the image already matches the target height so only the
normalize/pad/width laws are in play)."""

import math

import numpy as np
import pytest

from onnxocr_ray_spark.preprocess import (
    cls_postprocess,
    cls_resize_norm,
    ctc_greedy_decode,
    nearest_resize,
    rec_resize_norm,
)


def _img(h, w, value_grid=None):
    """HxWx3 uint8 test image; value_grid fills channel 0."""
    img = np.zeros((h, w, 3), dtype=np.uint8)
    if value_grid is not None:
        img[:, :, 0] = value_grid
    return img


def test_norm_maps_0_128_255_to_expected_floats():
    # identity geometry: h == target H and ceil(H*w/h) == w -> no resample
    img = _img(4, 8)
    img[:, :, 0] = 0
    img[:, :, 1] = 128
    img[:, :, 2] = 255
    out = cls_resize_norm(img, image_shape=(3, 4, 8), resize_fn=None)
    assert out.shape == (3, 4, 8)
    # (x/255 - 0.5) / 0.5 computed in float32 ARRAY arithmetic (matching
    # the implementation's dtype path; scalar numpy ops promote to f64)
    def f32norm(v):
        return ((np.array([v], dtype=np.float32) / 255.0 - 0.5) / 0.5)[0]

    exp0, exp1, exp2 = f32norm(0), f32norm(128), f32norm(255)
    assert np.all(out[0] == exp0) and exp0 == -1.0
    assert np.all(out[1] == exp1)
    assert np.all(out[2] == exp2) and exp2 == 1.0


def test_cls_pads_right_of_resized_width_with_zeros():
    # aspect 2:1 at H=4 -> resized_w = 8, target W = 12 -> cols 8..11 zero
    img = _img(4, 8, value_grid=np.full((4, 8), 255))
    out = cls_resize_norm(img, image_shape=(3, 4, 12))
    assert out.shape == (3, 4, 12)
    assert np.all(out[0, :, :8] == 1.0)
    assert np.all(out[:, :, 8:] == 0.0)


def test_cls_wide_image_capped_at_target_width():
    # aspect 10:1 at H=4 -> ceil(40) > W=12 -> resized_w = 12 (squeeze)
    img = _img(4, 40, value_grid=np.full((4, 40), 255))
    out = cls_resize_norm(img, image_shape=(3, 4, 12))
    assert np.all(out[0] == 1.0)  # no padding columns at all


def test_rec_width_is_batch_coupled():
    # the SAME image gets different padded widths under different batch
    # max ratios — the determinism hazard the engine pins at detect time
    img = _img(4, 8, value_grid=np.full((4, 8), 255))
    narrow = rec_resize_norm(img, max_wh_ratio=2.0, image_shape=(3, 4, 320))
    wide = rec_resize_norm(img, max_wh_ratio=5.0, image_shape=(3, 4, 320))
    assert narrow.shape == (3, 4, 8)    # int(4 * 2.0)
    assert wide.shape == (3, 4, 20)     # int(4 * 5.0)
    assert np.all(wide[:, :, 8:] == 0.0)


def test_rec_resized_w_uses_ceil():
    # w/h = 7/4 at H=4 -> ceil(4 * 1.75) = 7
    img = _img(4, 7, value_grid=np.full((4, 7), 255))
    out = rec_resize_norm(img, max_wh_ratio=3.0, image_shape=(3, 4, 320))
    assert out.shape == (3, 4, 12)
    assert np.all(out[0, :, :7] == 1.0) and np.all(out[:, :, 7:] == 0.0)


def test_nearest_resize_downsamples_deterministically():
    grid = np.arange(16, dtype=np.uint8).reshape(4, 4)
    img = _img(4, 4, value_grid=grid)
    small = nearest_resize(img, 2, 2)
    # index map: rows/cols [0, 2]
    assert small[:, :, 0].tolist() == [[0, 2], [8, 10]]


def test_ctc_greedy_decode_collapses_repeats_and_blanks():
    # charset index 0 is blank; char i -> charset[i-1]
    charset = ["a", "b", "c"]
    # sequence of class ids over 6 steps: a a blank a b b -> "aab"
    ids = [1, 1, 0, 1, 2, 2]
    probs = [0.9, 0.8, 0.99, 0.7, 0.6, 0.5]
    t, c = 6, 4
    preds = np.full((1, t, c), 0.01, dtype=np.float32)
    for step, (i, p) in enumerate(zip(ids, probs)):
        preds[0, step, i] = p
    [(text, conf)] = ctc_greedy_decode(preds, charset)
    assert text == "aab"
    # kept steps: 0 (a,0.9), 3 (a,0.7), 4 (b,0.6) — step 1 collapses into
    # step 0, step 2 is blank, step 5 collapses into step 4
    assert conf == pytest.approx((0.9 + 0.7 + 0.6) / 3, rel=1e-6)


def test_ctc_greedy_decode_empty_is_zero_conf():
    preds = np.zeros((1, 3, 4), dtype=np.float32)
    preds[:, :, 0] = 1.0  # all blank
    [(text, conf)] = ctc_greedy_decode(preds, ["a", "b", "c"])
    assert text == "" and conf == 0.0


def test_cls_postprocess_argmax_label():
    preds = np.array([[0.2, 0.8], [0.9, 0.1]], dtype=np.float32)
    assert cls_postprocess(preds) == [("180", pytest.approx(0.8)), ("0", pytest.approx(0.9))]


def test_provider_raises_clear_error_without_ort():
    from onnxocr_ray_spark.models import HAVE_ORT, classifier_provider

    if HAVE_ORT:  # pragma: no cover
        pytest.skip("onnxruntime present")
    with pytest.raises(RuntimeError, match="onnxruntime"):
        classifier_provider("/nonexistent/cls.onnx")


def test_provider_returns_standin_without_model_path():
    from onnxocr_ray_spark.models import StandinClassifier, classifier_provider

    assert isinstance(classifier_provider(None), StandinClassifier)
