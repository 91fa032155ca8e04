"""Detect stage: score candidate blocks, filter, unclip, emit region boxes.

Structural analog of the reference's DBPostProcess driver
(`onnxocr/db_postprocess.py:213-235` → threshold → contours → score →
filter → unclip → minibox → rescale) and the post-detect guards in
`onnxocr/predict_det.py:64-81` (clip + degenerate filter), re-derived for a
character-grid layout of HTML blocks:

- binarize analog (``score > det_db_thresh``)       db_postprocess.py:218
- candidate cap (``max_candidates``)                db_postprocess.py:117
- region score filter (``>= det_db_box_thresh``)    db_postprocess.py:128-132
- min-size filter (short side ``>= min_size`` px)   db_postprocess.py:123-137
- unclip (offset = area*ratio/perimeter)            db_postprocess.py:146-152
- clip to document bounds                           predict_det.py:64-68
- degenerate filter (w<=3 or h<=3 px)               predict_det.py:78-81

All arithmetic is plain float; box corners are emitted clockwise from
top-left, matching the reference's corner canonicalization
(`predict_det.py:50-62`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

from onnxocr_ray_spark.config import ExtractConfig
from onnxocr_ray_spark.kernels.html import RawBlock, decode_html, tokenize_blocks

Box = Tuple[
    Tuple[float, float], Tuple[float, float],
    Tuple[float, float], Tuple[float, float],
]


@dataclass
class Region:
    """A detected text region (span) before classification/recognition."""

    box: Box
    det_score: float
    raw: str          # inner text carried to the classify/recognize stages
    order: int        # tokenization order (contour order analog)


def content_density(block: RawBlock, cfg: ExtractConfig) -> float:
    """Content-density score in [0, 1] — the 'probability map' value.

    Boilerplate-stripping heuristic in the Arc90/boilerpipe tradition
    (text-to-tag ratio with link-text penalty): link characters contribute
    nothing, each swallowed inline tag costs ``tag_weight`` characters of
    denominator. Pure content paragraphs score ~1.0; navigation lists of
    links score ~0.0.
    """
    t = float(block.text_chars)
    l = float(block.link_chars)
    g = float(block.n_tags)
    denom = t + cfg.tag_weight * g
    if denom <= 0.0:
        return 0.0
    score = (t - l) / denom
    if score < 0.0:
        return 0.0
    if score > 1.0:
        return 1.0
    return score


def _block_box(block: RawBlock, cfg: ExtractConfig) -> Tuple[float, float, float, float]:
    """Axis-aligned extent of a block in pixel coordinates (x0, y0, x1, y1)."""
    x0 = block.col0 * float(cfg.char_w)
    y0 = block.line0 * float(cfg.char_h)
    x1 = x0 + block.width_chars * float(cfg.char_w)
    y1 = (block.line1 + 1) * float(cfg.char_h)
    return x0, y0, x1, y1


def _unclip(x0: float, y0: float, x1: float, y1: float, ratio: float) -> Tuple[float, float, float, float]:
    """Offset the rectangle outward by area*ratio/perimeter.

    Rectangular specialization of the polygon offset the reference performs
    with pyclipper (`db_postprocess.py:146-152`): distance
    d = A * unclip_ratio / L.
    """
    w = x1 - x0
    h = y1 - y0
    if w <= 0.0 or h <= 0.0:
        return x0, y0, x1, y1
    area = w * h
    perim = 2.0 * (w + h)
    d = area * ratio / perim
    return x0 - d, y0 - d, x1 + d, y1 + d


def _clip(v: float, lo: float, hi: float) -> float:
    return lo if v < lo else hi if v > hi else v


def _poly_outline(block: RawBlock, cfg: ExtractConfig) -> List[Tuple[float, float]]:
    """``det_box_type="poly"`` branch: the simplified rectilinear outline
    of the block's visible text lines, clockwise from top-left.

    Analog of the reference's ``polygons_from_bitmap``
    (`db_postprocess.py:58-100`): the block's per-line runs play the
    contour, and collinear-vertex merging with
    ``epsilon = 0.002 * perimeter`` plays ``cv2.approxPolyDP`` — two
    adjacent lines whose edges differ by less than epsilon share one
    straight edge. Per-line extents come from the block's raw text
    (original whitespace intact), so the hot quad path pays nothing.
    """
    lines = block.raw.split("\n")
    ext = []  # (left_px, right_px) per visible line
    for ln in lines:
        stripped = ln.strip()
        if not stripped:
            continue
        indent = len(ln) - len(ln.lstrip())
        left = (block.col0 + indent) * float(cfg.char_w)
        right = left + len(stripped) * float(cfg.char_w)
        ext.append((left, right))
    if not ext:
        return []
    y_top = block.line0 * float(cfg.char_h)
    pitch = float(cfg.char_h)
    perim = 2.0 * sum(r - l for l, r in ext) / max(len(ext), 1) + 2.0 * pitch * len(ext)
    eps = 0.002 * perim
    pts: List[Tuple[float, float]] = []
    # down the right side
    for i, (_l, r) in enumerate(ext):
        y0 = y_top + i * pitch
        y1 = y0 + pitch
        if pts and abs(pts[-1][0] - r) <= eps:
            pts[-1] = (pts[-1][0], y1)       # merge collinear edge
        else:
            pts.append((r, y0))
            pts.append((r, y1))
    # back up the left side
    up: List[Tuple[float, float]] = []
    for i in range(len(ext) - 1, -1, -1):
        l = ext[i][0]
        y0 = y_top + i * pitch
        y1 = y0 + pitch
        if up and abs(up[-1][0] - l) <= eps:
            up[-1] = (up[-1][0], y0)
        else:
            up.append((l, y1))
            up.append((l, y0))
    pts.extend(up)
    # rotate so the top-left-most vertex is first (corner
    # canonicalization analog, predict_det.py:50-62)
    start = min(range(len(pts)), key=lambda i: (pts[i][1], pts[i][0]))
    return pts[start:] + pts[:start]


def _dilate_merge(blocks: List[RawBlock], cfg: ExtractConfig) -> List[RawBlock]:
    """``op_dilate`` analog: merge above-threshold blocks a 2×2 dilation
    would connect, then hand the merged pseudo-blocks to the normal
    contour pipeline.

    The reference (`db_postprocess.py:56,223-224`) dilates the binarized
    segmentation mask with a 2×2 ones kernel before ``findContours`` when
    ``use_dilation`` is set: components separated by a one-pixel gap grow
    into each other and emerge as ONE contour, whose score is then
    re-measured on the ORIGINAL probability map (``box_score_fast``). On
    the char grid the analog is exact: two blocks that pass binarize
    (``score > det_db_thresh`` — below-threshold blocks are background and
    neither merge nor grow) connect iff their line gap and column gap are
    each <= 1 cell, transitively (connected components, 4-connectivity
    after growth). The merged pseudo-block is the component's bounding
    box; its stat sums make ``content_density`` the exact area-weighted
    re-score over the union (the mediant of member densities — provably
    within [min, max] of the members, so re-binarization in the caller
    never drops a merged component). ``lim_candidates`` then counts merged
    contours, matching ``contours[:max_candidates]`` post-dilation.

    Non-default path (``use_dilation=False`` in the reference config,
    `config.yaml:29`): the hot quad path never calls this.
    """
    qualifying: List[int] = []
    passthrough: List[RawBlock] = []
    for i, b in enumerate(blocks):
        if content_density(b, cfg) > cfg.det_db_thresh:
            qualifying.append(i)
        else:
            passthrough.append(b)
    n = len(qualifying)
    # union-find over qualifying blocks; candidate counts per doc are
    # bounded by max_candidates, and this runs only under the non-default
    # flag, so the O(n^2) adjacency scan is fine
    parent = list(range(n))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def touches(a: RawBlock, b: RawBlock) -> bool:
        gap_v = max(a.line0, b.line0) - min(a.line1, b.line1) - 1
        gap_h = max(a.col0, b.col0) - min(
            a.col0 + a.width_chars, b.col0 + b.width_chars
        )
        return gap_v <= 1 and gap_h <= 1

    for i in range(n):
        bi = blocks[qualifying[i]]
        for j in range(i + 1, n):
            if touches(bi, blocks[qualifying[j]]):
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[rj] = ri
    comps: Dict[int, List[RawBlock]] = {}
    for i in range(n):
        comps.setdefault(find(i), []).append(blocks[qualifying[i]])
    merged: List[RawBlock] = []
    for members in comps.values():
        if len(members) == 1:
            merged.append(members[0])
            continue
        members.sort(key=lambda b: (b.line0, b.col0, b.order))
        col0 = min(b.col0 for b in members)
        merged.append(
            RawBlock(
                raw="\n".join(b.raw for b in members),
                line0=min(b.line0 for b in members),
                line1=max(b.line1 for b in members),
                col0=col0,
                width_chars=max(b.col0 + b.width_chars for b in members) - col0,
                text_chars=sum(b.text_chars for b in members),
                link_chars=sum(b.link_chars for b in members),
                n_tags=sum(b.n_tags for b in members),
                order=min(b.order for b in members),
            )
        )
    out = merged + passthrough
    out.sort(key=lambda b: (b.order, b.line0, b.col0))
    return out


def doc_extent(blocks: List[RawBlock], cfg: ExtractConfig) -> Tuple[float, float]:
    """Document width/height in pixels, from the visible block extents."""
    w = 0.0
    h = 0.0
    for b in blocks:
        x0, y0, x1, y1 = _block_box(b, cfg)
        if x1 > w:
            w = x1
        if y1 > h:
            h = y1
    return max(w, 1.0), max(h, 1.0)


def detect_regions(html: Optional[bytes], cfg: ExtractConfig) -> List[Region]:
    """binary html -> filtered, unclipped, clipped region list.

    Returns [] for empty/undecodable payloads (no-regions early exit,
    `onnx_paddleocr.py:78-79`).
    """
    return detect_regions_src(decode_html(html), cfg)


def detect_regions_src(src: Optional[str], cfg: ExtractConfig) -> List[Region]:
    """``detect_regions`` over an already-decoded source string.

    The Arrow hot path (operators/extract.py) decodes html straight from
    the Arrow buffer into ONE str — this entry point lets it skip the
    intermediate ``bytes`` materialization ``decode_html`` would need.
    """
    if src is None:
        return []
    blocks = tokenize_blocks(src)
    if not blocks:
        return []
    doc_w, doc_h = doc_extent(blocks, cfg)
    if cfg.use_dilation:                         # op_dilate (non-default)
        blocks = _dilate_merge(blocks, cfg)

    regions: List[Region] = []
    n_candidates = 0
    for block in blocks:
        if n_candidates >= cfg.max_candidates:   # lim_candidates
            break
        n_candidates += 1
        score = content_density(block, cfg)
        if score <= cfg.det_db_thresh:           # pred_binarize
            continue
        if score < cfg.det_db_box_thresh:        # flt_boxscore
            continue
        if cfg.det_box_type == "poly":
            poly = _poly_region(block, cfg, doc_w, doc_h)
            if poly is not None:
                regions.append(
                    Region(box=poly, det_score=score, raw=block.raw,
                           order=block.order)
                )
            continue
        x0, y0, x1, y1 = _block_box(block, cfg)
        if min(x1 - x0, y1 - y0) < cfg.min_size: # flt_minsize (pre-unclip)
            continue
        x0, y0, x1, y1 = _unclip(x0, y0, x1, y1, cfg.det_db_unclip_ratio)
        if min(x1 - x0, y1 - y0) < cfg.min_size + 2:  # flt_minsize (post)
            continue
        # map_clip: clamp into [0, doc_w-1] x [0, doc_h-1]
        x0 = _clip(x0, 0.0, doc_w - 1.0)
        x1 = _clip(x1, 0.0, doc_w - 1.0)
        y0 = _clip(y0, 0.0, doc_h - 1.0)
        y1 = _clip(y1, 0.0, doc_h - 1.0)
        if x1 - x0 <= 3.0 or y1 - y0 <= 3.0:     # flt_degenerate
            continue
        box: Box = ((x0, y0), (x1, y0), (x1, y1), (x0, y1))
        regions.append(Region(box=box, det_score=score, raw=block.raw, order=block.order))
    return regions


def _poly_region(block: RawBlock, cfg: ExtractConfig, doc_w: float,
                 doc_h: float):
    """Geometry pipeline for one poly-mode candidate: outline ->
    vertex-count guard -> min-size -> unclip offset -> min-size ->
    clip -> degenerate. Returns the vertex tuple or None (filtered).

    Mirrors the reference poly branch's guard order
    (`db_postprocess.py:72-100`: approx -> <4-points drop -> unclip ->
    sside check -> rescale/clip), with the bounding-rect short side
    playing ``get_mini_boxes``'s sside."""
    pts = _poly_outline(block, cfg)
    if len(pts) < 4:                              # points.shape[0] < 4 guard
        return None
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    x0, y0, x1, y1 = min(xs), min(ys), max(xs), max(ys)
    if min(x1 - x0, y1 - y0) < cfg.min_size:
        return None
    w, h = x1 - x0, y1 - y0
    d = (w * h) * cfg.det_db_unclip_ratio / (2.0 * (w + h))  # unclip dist
    cx, cy = (x0 + x1) / 2.0, (y0 + y1) / 2.0
    # outward vertex offset (pyclipper-offset analog for rectilinear
    # outlines): every vertex moves away from the bbox center by d
    pts = [
        (px - d if px < cx else px + d, py - d if py < cy else py + d)
        for px, py in pts
    ]
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    if min(max(xs) - min(xs), max(ys) - min(ys)) < cfg.min_size + 2:
        return None
    pts = [
        (_clip(px, 0.0, doc_w - 1.0), _clip(py, 0.0, doc_h - 1.0))
        for px, py in pts
    ]
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    if max(xs) - min(xs) <= 3.0 or max(ys) - min(ys) <= 3.0:
        return None
    return tuple(pts)
