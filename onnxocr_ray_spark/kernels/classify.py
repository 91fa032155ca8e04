"""Classify stage: 0/180-degree orientation detection per region.

Structural analog of the reference's angle classifier
(`onnxocr/predict_cls.py:43-84` + `onnxocr/cls_postprocess.py:12-28`):
each cropped region gets a label in {"0", "180"} with a confidence, and is
rotated back (here: string-reversed back) only when the label is "180"
AND the confidence exceeds ``cls_thresh`` (`predict_cls.py:82-83`,
threshold 0.9 from `config.yaml:91`).

The "model" is a deterministic direction-evidence scorer instead of the
reference's ONNX classifier (cls.onnx): forward evidence counts
sentence-like patterns in the text, reverse evidence counts them in the
mirrored text. A genuinely 180-degree-flipped region scores ~1.0.
"""

from __future__ import annotations

import re
from typing import Tuple

# Asymmetric signals only: patterns that appear in forward latin-script
# text and (by construction) almost never in its mirror image —
# lowercase letter immediately before sentence punctuation, and a
# capitalized word start. Symmetric signals (e.g. lowercase bigrams)
# would dilute the posterior below cls_thresh.
_SENT_END = re.compile(r"[0-9a-zà-öø-ÿ][.!?,;:](?=\s|$)")
_CAP_START = re.compile(r"(?:^|\s)[A-ZÀ-Þ][a-zà-öø-ÿ]")


def _direction_evidence(text: str) -> float:
    """How much this string looks like forward-reading text."""
    return 2.0 * len(_SENT_END.findall(text)) + 1.0 * len(_CAP_START.findall(text))


def classify_angle(raw: str) -> Tuple[str, float]:
    """region text -> (label, confidence), label in {"0", "180"}.

    Mirrors the decode contract of `cls_postprocess.py:12-28`
    (label_list=["0","180"], argmax prob).
    """
    fwd = _direction_evidence(raw)
    rev = _direction_evidence(raw[::-1])
    total = fwd + rev
    if total <= 0.0:
        return "0", 1.0
    p180 = rev / total
    if p180 > 0.5:
        return "180", p180
    return "0", 1.0 - p180


def maybe_rotate(raw: str, label: str, conf: float, cls_thresh: float) -> str:
    """Rotate (reverse) the region content iff label=="180" and conf>thresh.

    predict_cls.py:82-83 semantics: the rotation mutates the crop that the
    recognition stage then consumes — stage order is load-bearing
    (SURVEY.md §4.1.3).
    """
    if "180" in label and conf > cls_thresh:
        return raw[::-1]
    return raw
