"""Sampled visual QA (the snk_imgs / draw_ocr analog, SURVEY.md §2.11).

The reference renders annotated images for eyeballing
(`onnxocr/utils.py:185-225`, `app-service.py:575-635`). At corpus scale
the equivalent is a cheap textual rendering of a SAMPLE of documents —
boxes on the char grid with their decoded text — for spot checks in
logs/notebooks, never in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def render_doc_row(row) -> str:
    """One extracted row -> a compact box/text listing."""
    lines = [f"url: {row['url']}  spans: {row['n_spans']}  sha256: {row['checksum'][:12]}"]
    for s in row["spans"]:
        (x0, y0) = s["box"][0]
        lines.append(
            f"  [{s['span_idx']:3d}] @({x0:7.1f},{y0:7.1f}) "
            f"det={s['det_score']:.2f} rec={s['score']:.2f} ang={s['angle']:>3s} "
            f"| {s['text'][:60]}"
        )
    return "\n".join(lines)


def render_canvas(row, char_w: float = 8.0, char_h: float = 16.0,
                  max_w: int = 100, max_h: int = 40) -> str:
    """ASCII draw_ocr analog (`onnxocr/utils.py:185-225`): draw each
    span's box outline back onto the character grid it was detected on,
    with the span index in the top-left interior. Pure function of the
    row — deterministic, log/notebook friendly, never in the hot path."""
    boxes = []
    for s in row["spans"]:
        xs = [p[0] / char_w for p in s["box"]]
        ys = [p[1] / char_h for p in s["box"]]
        boxes.append(
            (int(s["span_idx"]), int(min(xs)), int(min(ys)),
             int(max(xs)), int(max(ys)))
        )
    if not boxes:
        return "(no spans)"
    w = min(max(x1 for _, _, _, x1, _ in boxes) + 2, max_w)
    h = min(max(y1 for _, _, _, _, y1 in boxes) + 2, max_h)
    grid = [[" "] * w for _ in range(h)]

    def put(x, y, ch):
        if 0 <= x < w and 0 <= y < h:
            grid[y][x] = ch

    for idx, x0, y0, x1, y1 in boxes:
        for x in range(x0, min(x1, w - 1) + 1):
            put(x, y0, "-")
            put(x, y1, "-")
        for y in range(y0, min(y1, h - 1) + 1):
            put(x0, y, "|")
            put(x1, y, "|")
        for x, y in ((x0, y0), (x1, y0), (x0, y1), (x1, y1)):
            put(x, y, "+")
        for i, ch in enumerate(str(idx)):
            put(x0 + 1 + i, y0, ch)
    return "\n".join("".join(r).rstrip() for r in grid)


def sample_qa(extracted: DataFrame, n: int = 5, seed: int = 42) -> str:
    """Deterministic sample of rendered documents for eyeball QA."""
    rows = (
        extracted.filter(F.col("n_spans") > 0)
        .orderBy(F.pmod(F.xxhash64("url"), F.lit(997)), "url")
        .limit(n)
        .collect()
    )
    return "\n\n".join(render_doc_row(r) for r in rows)
