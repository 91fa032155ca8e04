"""Synthetic span->raster crop rendering (the provider pipeline's "crop").

The reference crops each detected region out of the page raster with a
perspective transform before feeding the ONNX models
(`onnxocr/utils.py` get_rotate_crop_image, called from
`onnx_paddleocr.py:84-100`). This engine's documents are HTML text, so
there is no page raster to crop from — ``render_crop`` is the
deterministic analog: it renders a span's payload into an HxWx3 uint8
image whose encoding is LOSSLESSLY INVERTIBLE, so the *entire* real-model
path (cls_resize_norm / rec_resize_norm tensor prep, per-worker ORT
session, batched run loops, argmax / greedy-CTC postprocess —
`models.py`, `preprocess.py`) can be driven end-to-end and checked for
byte-parity against the stand-in kernels. A real-pixel deployment
replaces exactly this function with the perspective-transform crop; every
stage downstream of it is the production code.

Encoding (designed to survive the model preprocess exactly):

- R channel, row-major: payload bytes = rec_width(uint32 LE) +
  n(uint32 LE) + n bytes of UTF-8 span text.
- G channel: 255 on payload pixels, 0 elsewhere — after the preprocess
  normalization ((x/255-0.5)/0.5) payload pixels sit at +1.0 while
  right-padding introduced by ``_norm_pad`` sits at 0.0, so the payload
  mask survives batch padding unambiguously (threshold at +0.57 ≈ byte
  200).
- Raster shapes are chosen so the aspect-preserving resize inside
  cls_resize_norm / rec_resize_norm is the IDENTITY: the classifier crop
  is exactly (48, 192) (ratio 4.0 = the model ratio, so ``_fit_width``
  returns 192), and recognizer crops use widths that are multiples of
  48 (ratio w/48 is then an exact small float, so ceil(48*ratio) == w).
  Nothing in the decode depends on which resampler (cv2 or the
  nearest-neighbor stand-in) is installed.
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np

CLS_H, CLS_W = 48, 192          # == OrtClassifier image_shape (3, 48, 192)
REC_H = 48                      # == OrtRecognizer image_shape height
_REC_W_STEP = 48                # widths are multiples of 48 (exact ratios)
_HEADER = 8                     # rec_width uint32 + n uint32, little-endian


def _payload(raw: str, rec_width: int) -> bytes:
    data = raw.encode("utf-8")
    return (
        int(rec_width).to_bytes(4, "little")
        + len(data).to_bytes(4, "little")
        + data
    )


def cls_capacity_ok(raw: str) -> bool:
    """True iff a span's payload fits the FIXED classifier crop
    (48x192 bytes incl. header). Spans beyond this cannot be rendered
    losslessly for the cls stage; the pipeline routes them through the
    stand-in kernels instead of raising inside the batch
    (operators/extract.py:_process_doc_spans)."""
    return _HEADER + len(raw.encode("utf-8")) <= CLS_H * CLS_W


def render_crop(raw: str, rec_width: int, kind: str) -> np.ndarray:
    """Span payload -> HxWx3 uint8 crop for the ``kind`` model stage.

    ``kind`` is "cls" (fixed 48x192, the classifier input shape) or
    "rec" (48 x 48k, sized to fit the payload). Raises ValueError when a
    span exceeds the classifier crop's fixed capacity (48*192 bytes) —
    visible, never silently lossy.
    """
    payload = _payload(raw, rec_width)
    if kind == "cls":
        h, w = CLS_H, CLS_W
        if len(payload) > h * w:
            raise ValueError(
                f"span payload of {len(payload)} bytes exceeds the "
                f"classifier crop capacity {h * w}; the synthetic raster "
                "encoding cannot represent it losslessly"
            )
    elif kind == "rec":
        h = REC_H
        w = _REC_W_STEP * max(1, math.ceil(len(payload) / (h * _REC_W_STEP)))
    else:
        raise ValueError(f"unknown crop kind {kind!r}")
    img = np.zeros((h, w, 3), dtype=np.uint8)
    arr = np.frombuffer(payload, dtype=np.uint8)
    img[:, :, 0].flat[: len(arr)] = arr
    img[:, :, 1].flat[: len(arr)] = 255
    return img


def decode_norm_chw(x: np.ndarray) -> Tuple[int, str]:
    """Inverse of render_crop THROUGH the model preprocess: given one
    normalized (C, H, W) float32 tensor as produced by cls_resize_norm /
    rec_resize_norm (identity resize + /255 + (-0.5)/0.5 + right
    zero-pad), recover ``(rec_width, raw_text)``. Used by test doubles
    standing in for ``onnxruntime.InferenceSession`` so the batched run
    loops in models.py are exercised with real tensors."""
    r = np.rint((x[0].astype(np.float64) * 0.5 + 0.5) * 255.0).astype(np.int64)
    g = (x[1].astype(np.float64) * 0.5 + 0.5) * 255.0
    mask = g > 200.0            # payload=255 -> ~255; pad=0.0 -> 127.5; bg -> 0
    data = r.ravel()[mask.ravel()].astype(np.uint8).tobytes()
    if len(data) < _HEADER:
        raise ValueError("crop carries no payload header")
    rec_width = int.from_bytes(data[0:4], "little")
    n = int.from_bytes(data[4:8], "little")
    if len(data) < _HEADER + n:
        raise ValueError(
            f"crop payload truncated: header claims {n} bytes, "
            f"{len(data) - _HEADER} present"
        )
    return rec_width, data[_HEADER : _HEADER + n].decode("utf-8")
