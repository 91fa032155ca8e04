"""Real-model preprocess / postprocess numerics (pure numpy).

Re-derivations of the reference's predict-time tensor preparation so a
configured ``.onnx`` model actually runs through the per-worker session
cache (models.get_session) with correct inputs:

- ``cls_resize_norm``   — angle-classifier input tensor
                          (re-derivation of predict_cls.py:21-41)
- ``rec_resize_norm``   — recognizer dynamic-width input tensor
                          (re-derivation of predict_rec.py:25-79, the
                          default CRNN/CTC branch; the exotic-algorithm
                          branches are dead configuration here)
- ``ctc_greedy_decode`` — logits -> (text, mean confidence)
                          (re-derivation of rec_postprocess.py:58-111:
                          argmax, collapse repeats, drop blank id 0,
                          mean prob over kept steps)

The pixel resample itself is the only cv2-gated step: ``resize_fn`` is
injectable, defaulting to cv2's bilinear when present and a deterministic
nearest-neighbor stand-in otherwise (bit-parity with the reference's
outputs requires the cv2 resampler; everything around it is exact and
unit-tested against hand-computed goldens).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence, Tuple

import numpy as np

try:  # pragma: no cover - not present in this container
    import cv2  # type: ignore

    HAVE_CV2 = True
except ImportError:
    HAVE_CV2 = False


def nearest_resize(img: np.ndarray, dst_w: int, dst_h: int) -> np.ndarray:
    """Deterministic nearest-neighbor resample (cv2-free stand-in)."""
    src_h, src_w = img.shape[:2]
    rows = np.minimum((np.arange(dst_h) * src_h / dst_h).astype(int), src_h - 1)
    cols = np.minimum((np.arange(dst_w) * src_w / dst_w).astype(int), src_w - 1)
    return img[rows][:, cols]


def default_resize(img: np.ndarray, dst_w: int, dst_h: int) -> np.ndarray:
    if HAVE_CV2:  # pragma: no cover
        return cv2.resize(img, (dst_w, dst_h))
    return nearest_resize(img, dst_w, dst_h)


ResizeFn = Callable[[np.ndarray, int, int], np.ndarray]


def _norm_pad(
    resized: np.ndarray, img_c: int, img_h: int, img_w: int, resized_w: int
) -> np.ndarray:
    """Shared tail: float32, CHW, /255, (-0.5)/0.5, zero-pad to img_w."""
    x = resized.astype("float32")
    if img_c == 1 and x.ndim == 2:
        x = x[np.newaxis, :] / 255.0
    else:
        x = x.transpose((2, 0, 1)) / 255.0
    x = (x - 0.5) / 0.5
    out = np.zeros((img_c, img_h, img_w), dtype=np.float32)
    out[:, :, 0:resized_w] = x
    return out


def _fit_width(img: np.ndarray, img_h: int, img_w: int) -> int:
    """Aspect-preserving width at target height, capped at img_w
    (the ceil-vs-cap rule both predict paths share)."""
    h, w = img.shape[:2]
    ratio = w / float(h)
    if math.ceil(img_h * ratio) > img_w:
        return img_w
    return int(math.ceil(img_h * ratio))


def cls_resize_norm(
    img: np.ndarray,
    image_shape: Tuple[int, int, int] = (3, 48, 192),
    resize_fn: Optional[ResizeFn] = None,
) -> np.ndarray:
    """Angle-classifier input tensor: fixed (C, H, W), aspect-preserving
    resize to height H, right zero-padding past the resized width."""
    img_c, img_h, img_w = image_shape
    resized_w = _fit_width(img, img_h, img_w)
    resized = (resize_fn or default_resize)(img, resized_w, img_h)
    return _norm_pad(resized, img_c, img_h, img_w, resized_w)


def rec_resize_norm(
    img: np.ndarray,
    max_wh_ratio: float,
    image_shape: Tuple[int, int, int] = (3, 48, 320),
    resize_fn: Optional[ResizeFn] = None,
) -> np.ndarray:
    """Recognizer input tensor with the BATCH-COUPLED dynamic width:
    the target width is ``H * max_wh_ratio`` where max_wh_ratio is the
    maximum aspect ratio across the whole batch — the coupling that makes
    recognition output depend on batch packing (SURVEY.md §4.1.1; the
    engine pins packing at detect time for exactly this reason)."""
    img_c, img_h, _seed_w = image_shape
    img_w = int(img_h * max_wh_ratio)
    resized_w = _fit_width(img, img_h, img_w)
    resized = (resize_fn or default_resize)(img, resized_w, img_h)
    return _norm_pad(resized, img_c, img_h, img_w, resized_w)


def ctc_greedy_decode(
    preds: np.ndarray, charset: Sequence[str]
) -> list:
    """Greedy CTC over a (batch, time, classes) logit/prob tensor.

    Per item: argmax over classes, drop consecutive repeats, drop the
    blank id 0, map ids through ``charset`` (index 0 = blank, so char i
    is charset[i-1]), confidence = mean of kept-step probabilities
    (empty -> 0.0)."""
    idx = preds.argmax(axis=2)
    prob = preds.max(axis=2)
    out = []
    for ids, ps in zip(idx, prob):
        keep = np.ones(len(ids), dtype=bool)
        keep[1:] = ids[1:] != ids[:-1]   # collapse repeats
        keep &= ids != 0                 # drop blank
        chars = [charset[i - 1] for i in ids[keep]]
        confs = ps[keep]
        conf = float(confs.mean()) if len(confs) else 0.0
        out.append(("".join(chars), conf))
    return out


def cls_postprocess(
    preds: np.ndarray, labels: Sequence[str] = ("0", "180")
) -> list:
    """(batch, n_labels) probs -> [(label, prob)] (cls_postprocess.py:12-28)."""
    idx = preds.argmax(axis=1)
    return [(labels[i], float(preds[b, i])) for b, i in enumerate(idx)]
