"""Single-process reference oracle.

The reference defines correctness operationally ("same as PaddleOCR",
`Readme.md` Core Advantages #5) and ships no golden outputs; its det/rec
model blobs are stripped from the snapshot (`.MISSING_LARGE_BLOBS`). Per
SURVEY.md §5/§7.1-M1, byte-identity for the rebuild is therefore defined
against THIS module: the same stage kernels executed serially, one
document at a time, in exact reference order (`onnx_paddleocr.py:72-114`).

The Spark pipeline (operators/extract.py) must produce byte-identical
``extracted_text`` per url regardless of partitioning, salting, batching,
or straggler splitting — that is the invariant the parity tests assert.
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional, Tuple

from onnxocr_ray_spark.config import DEFAULT_CONFIG, ExtractConfig
from onnxocr_ray_spark.kernels.pipeline import DocResult, extract_document


def extract_serial(
    docs: Iterable[Tuple[str, Optional[bytes]]],
    cfg: ExtractConfig = DEFAULT_CONFIG,
) -> Dict[str, DocResult]:
    """(url, html) pairs -> url -> DocResult, strictly serially."""
    out: Dict[str, DocResult] = {}
    for url, html in docs:
        out[url] = extract_document(html, cfg)
    return out
