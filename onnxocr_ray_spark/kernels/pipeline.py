"""Per-document composition of the three extraction stages.

This is the kernel-level equivalent of the reference's ``run()`` driver
(`onnx_paddleocr.py:72-114`): detect → early-exit → reading-order sort →
crop → classify(rotate) → recognize(batched) → drop_score → assemble.
Both the serial oracle and the Spark stages call into these functions; the
Spark stages additionally split the work at the documented stage
boundaries (detect / classify / recognize as separate DataFrame
transformations, `app-service.py:172,225,283` endpoint decomposition).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import List, Optional

from onnxocr_ray_spark.config import ExtractConfig
from onnxocr_ray_spark.kernels.classify import classify_angle, maybe_rotate
from onnxocr_ray_spark.kernels.detect import Box, Region, detect_regions_src
from onnxocr_ray_spark.kernels.html import decode_html
from onnxocr_ray_spark.kernels.recognize import pack_batches, recognize_span
from onnxocr_ray_spark.kernels.sort import sorted_boxes


@dataclass
class Span:
    """One extracted span in reading order (post drop_score)."""

    span_idx: int          # reading-order index among KEPT spans
    box: Box
    det_score: float
    angle: str             # "0" | "180"
    cls_conf: float
    text: str
    score: float
    batch_id: int
    rec_width: int


@dataclass
class DocResult:
    spans: List[Span]
    extracted_text: str
    n_spans: int
    checksum: str


def _ratio(box: Box) -> float:
    """Aspect ratio from the box's axis-aligned extent. For the default
    quad boxes ((x0,y0),(x1,y0),(x1,y1),(x0,y1)) this equals the old
    corner arithmetic bit-for-bit; for ``det_box_type="poly"`` outlines
    (N >= 4 vertices) it is the bounding-rect ratio — the analog of the
    reference deriving rec input shape from the min-area rect of a
    polygon box (db_postprocess.py:92-96, predict_det.py:50-62)."""
    xs = [p[0] for p in box]
    ys = [p[1] for p in box]
    w = max(xs) - min(xs)
    h = max(ys) - min(ys)
    if h <= 0.0:
        return 0.0
    return w / h


def detect_sorted(html: Optional[bytes], cfg: ExtractConfig) -> List[Region]:
    """Detect stage output in reading order (detect + sorted_boxes)."""
    return detect_sorted_src(decode_html(html), cfg)


def detect_sorted_src(src: Optional[str], cfg: ExtractConfig) -> List[Region]:
    """``detect_sorted`` over an already-decoded source string (the Arrow
    hot path's entry — see kernels/detect.py:detect_regions_src)."""
    regions = detect_regions_src(src, cfg)
    if not regions:
        return []
    return sorted_boxes(
        regions,
        y0=lambda r: r.box[0][1],
        x0=lambda r: r.box[0][0],
        band=cfg.sort_band_px,
    )


def classify_rotate(raws: List[str], cfg: ExtractConfig):
    """Classify stage over ordered region contents -> (rotated, labels, confs)."""
    labels: List[str] = []
    confs: List[float] = []
    rotated: List[str] = []
    for raw in raws:
        if cfg.use_angle_cls:
            label, conf = classify_angle(raw)
            rotated.append(maybe_rotate(raw, label, conf, cfg.cls_thresh))
        else:
            label, conf = "0", 1.0
            rotated.append(raw)
        labels.append(label)
        confs.append(conf)
    return rotated, labels, confs


def recognize_all(rotated: List[str], ratios: List[float], cfg: ExtractConfig):
    """Recognize stage: pack into batches, decode, restore input order."""
    batch_id, rec_width, _pos = pack_batches(
        ratios, cfg.rec_batch_num, cfg.rec_image_height, cfg.rec_seed_ratio
    )
    texts: List[str] = []
    scores: List[float] = []
    for raw, width in zip(rotated, rec_width):
        text, score = recognize_span(raw, width)
        texts.append(text)
        scores.append(score)
    return texts, scores, batch_id, rec_width


def assemble(
    regions: List[Region],
    texts: List[str],
    scores: List[float],
    labels: List[str],
    confs: List[float],
    batch_id: List[int],
    rec_width: List[int],
    cfg: ExtractConfig,
) -> DocResult:
    """zip boxes x rec results, drop_score filter, join text, checksum."""
    spans: List[Span] = []
    for i, region in enumerate(regions):
        if scores[i] >= cfg.drop_score:
            spans.append(
                Span(
                    span_idx=len(spans),
                    box=region.box,
                    det_score=region.det_score,
                    angle=labels[i],
                    cls_conf=confs[i],
                    text=texts[i],
                    score=scores[i],
                    batch_id=batch_id[i],
                    rec_width=rec_width[i],
                )
            )
    extracted = "\n".join(s.text for s in spans)
    checksum = hashlib.sha256(extracted.encode("utf-8")).hexdigest()
    return DocResult(
        spans=spans, extracted_text=extracted, n_spans=len(spans), checksum=checksum
    )


def extract_document(html: Optional[bytes], cfg: ExtractConfig) -> DocResult:
    """Full serial pipeline for one document (the oracle's unit of work)."""
    regions = detect_sorted(html, cfg)
    if not regions:  # early exit, onnx_paddleocr.py:78-79
        return DocResult(
            spans=[],
            extracted_text="",
            n_spans=0,
            checksum=hashlib.sha256(b"").hexdigest(),
        )
    raws = [r.raw for r in regions]
    rotated, labels, confs = classify_rotate(raws, cfg)
    ratios = [_ratio(r.box) for r in regions]
    texts, scores, batch_id, rec_width = recognize_all(rotated, ratios, cfg)
    return assemble(regions, texts, scores, labels, confs, batch_id, rec_width, cfg)
