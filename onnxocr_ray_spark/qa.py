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


def sample_qa(extracted: DataFrame, n: int = 5, seed: int = 42) -> str:
    """Deterministic sample of rendered documents for eyeball QA."""
    rows = (
        extracted.filter(F.col("n_spans") > 0)
        .orderBy(F.pmod(F.xxhash64("url"), F.lit(997)), "url")
        .limit(n)
        .collect()
    )
    return "\n\n".join(render_doc_row(r) for r in rows)
