"""Reading-order sort: banded (y, x) ordering with a bounded bubble pass.

Semantics of the reference's ``sorted_boxes`` (`onnx_paddleocr.py:13-33`),
re-implemented from its documented behavior (SURVEY.md §2.5, §4.1.2):

1. stable sort by (y0, x0) of the top-left corner;
2. one bounded bubble pass: walking i = 0..n-2, bubble element i+1 left
   past any predecessor j whose vertical distance is inside the band
   (|y_{j+1} - y_j| < band) and whose x is larger (x_{j+1} < x_j),
   stopping at the FIRST predecessor that does not satisfy the condition.

This is NOT a total order by (band, x) — the early ``break`` makes it a
local banded order, and it must not be "simplified" to a window sort in
the production path (SURVEY.md §7.3.5). The relational window analog
(row_number over (y0, x0)) exists only as a test approximation.
"""

from __future__ import annotations

from typing import List, Sequence, TypeVar

T = TypeVar("T")


def sorted_boxes(items: Sequence[T], y0, x0, band: float = 10.0) -> List[T]:
    """Return items in reading order.

    ``y0`` / ``x0`` are key functions extracting the top-left corner
    coordinates of an item (kept generic so the same comparator serves
    Region objects, span dicts, and test tuples).
    """
    out = sorted(items, key=lambda it: (y0(it), x0(it)))
    n = len(out)
    for i in range(n - 1):
        for j in range(i, -1, -1):
            if abs(y0(out[j + 1]) - y0(out[j])) < band and x0(out[j + 1]) < x0(out[j]):
                out[j], out[j + 1] = out[j + 1], out[j]
            else:
                break
    return out
