"""Recognize stage: decode region content to (text, confidence).

Structural analog of the reference's recognition path:

- width-argsort + fixed-size batch packing      predict_rec.py:86-96
- per-batch max aspect ratio -> shared width    predict_rec.py:94-107
  (seed ratio 320/48 at :98) — the batch-composition coupling that makes
  recognition output depend on packing (SURVEY.md §4.1.1)
- greedy CTC decode: drop repeats, drop blanks  rec_postprocess.py:86-87
- id->char mapping via dictionary               rec_postprocess.py:109-111
- mean confidence per span (empty -> 0.0)       rec_postprocess.py:71-83

Re-derived for text regions: the "decode" is HTML entity resolution +
blank/control removal + whitespace-repeat collapse; the confidence is a
deterministic per-token quality score whose final value depends (mildly,
deterministically) on the batch-assigned ``rec_width`` — preserving the
property that any re-batching scheme MUST reproduce the reference packing
to stay byte-identical. Straggler splitting therefore splits on batch
boundaries computed over the full document (operators/extract.py).
"""

from __future__ import annotations

import math
import re
from typing import Dict, List, Sequence, Tuple

# --- entity decode (dec_dict analog: small explicit table, no eval) ---

_NAMED_ENTITIES: Dict[str, str] = {
    "amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'",
    "nbsp": " ", "mdash": "—", "ndash": "–",
    "hellip": "…", "copy": "©", "reg": "®",
    "laquo": "«", "raquo": "»", "lsquo": "‘",
    "rsquo": "’", "ldquo": "“", "rdquo": "”",
    "times": "×", "middot": "·", "bull": "•",
    "deg": "°", "euro": "€", "pound": "£", "yen": "¥",
}

_ENTITY_RE = re.compile(r"&(#x?[0-9a-fA-F]+|[a-zA-Z][a-zA-Z0-9]{1,30});")

# "blank" characters (CTC blank-id analog): control chars and zero-width
# marks are dropped before repeat collapsing (rec_postprocess.py:86-87).
_BLANK_RE = re.compile("[\\x00-\\x08\\x0b-\\x1f\\x7f\\u200b\\u200c\\u200d\\ufeff]")
_WS_RUN_RE = re.compile(r"\s+")

_WORD_CHAR_RE = re.compile(r"[0-9A-Za-zÀ-ÖØ-öø-ÿĀ-ɏ぀-ヿ一-鿿؀-ۿݐ-ݿ]")


def _entity_sub(m: re.Match) -> str:
    body = m.group(1)
    if body.startswith("#"):
        try:
            code = int(body[2:], 16) if body[1:2].lower() == "x" else int(body[1:])
        except ValueError:
            return m.group(0)
        if 0 < code <= 0x10FFFF:
            return chr(code)
        return m.group(0)
    return _NAMED_ENTITIES.get(body, m.group(0))


def decode_entities(raw: str) -> str:
    return _ENTITY_RE.sub(_entity_sub, raw)


# RTL branch (analog of the reference's Arabic decode path,
# rec_postprocess.py:30-53 pred_reverse + the `"arabic" in dict_path`
# gate at :31-32): LTR-safe chars accumulate into runs, every other char
# is its own unit, and the unit list is reversed — rendering an RTL
# string in visual order while keeping embedded Latin/digit runs intact.
_LTR_RUN_RE = re.compile(r"[a-zA-Z0-9 :*./%+-]")
_ARABIC_RE = re.compile(
    "[؀-ۿݐ-ݿࢠ-ࣿﭐ-﷿ﹰ-﻾]"
)


def bidi_reassemble(s: str) -> str:
    """pred_reverse re-derivation: reverse the sequence of units, where a
    unit is either a maximal run of LTR-safe chars or a single other char.
    Identity on pure LTR-safe text (one unit)."""
    units: List[str] = []
    run: List[str] = []
    for ch in s:
        if _LTR_RUN_RE.match(ch):
            run.append(ch)
        else:
            if run:
                units.append("".join(run))
                run = []
            units.append(ch)
    if run:
        units.append("".join(run))
    return "".join(reversed(units))


def is_rtl_dominant(s: str) -> bool:
    """Per-span analog of the reference's per-MODEL arabic-dictionary gate
    (the engine is multilingual per document, so the gate must be content
    based): reassemble when Arabic-script chars outnumber every other
    non-LTR-safe char (so CJK/accented-Latin spans are untouched)."""
    arabic = len(_ARABIC_RE.findall(s))
    if arabic == 0:
        return False
    other = sum(
        1 for ch in s if not _LTR_RUN_RE.match(ch) and not _ARABIC_RE.match(ch)
    )
    return arabic > other


def ctc_normalize(raw: str) -> str:
    """Greedy-CTC-style cleanup: decode, drop blanks, collapse repeats,
    then the RTL visual-order reassembly for Arabic-dominant spans.

    Order matters and is pinned by tests: entities first (so &#9; becomes a
    tab that then collapses), blanks second, whitespace-run collapse third,
    bidi reassembly last (mirroring the reference, where pred_reverse runs
    on the fully decoded string, rec_postprocess.py:80-81).
    """
    s = decode_entities(raw)
    s = _BLANK_RE.sub("", s)
    s = _WS_RUN_RE.sub(" ", s)
    s = s.strip()
    if is_rtl_dominant(s):
        s = bidi_reassemble(s)
    return s


def token_confidence(token: str) -> float:
    """Deterministic per-token 'model confidence' in [0.2, 0.99]."""
    if not token:
        return 0.2
    # one C-level scan; single-char class => findall count == per-char match count
    good = len(_WORD_CHAR_RE.findall(token))
    frac = good / len(token)
    return 0.2 + 0.79 * frac


def span_confidence(text: str, rec_width: int) -> float:
    """Mean token confidence (agg_meanconf, rec_postprocess.py:71-83).

    The (rec_width % 8) * 1e-4 term deterministically couples the score to
    the batch-assigned resize width — the observable analog of the
    reference's batch-composition-dependent padding (SURVEY.md §4.1.1).
    Empty text -> 0.0.
    """
    if not text:
        return 0.0
    # token_confidence inlined (43k calls/500 docs showed up in the
    # profile); the per-token expression is kept IDENTICAL so the
    # accumulated float is bit-equal to the unrolled form
    findall = _WORD_CHAR_RE.findall
    total = 0.0
    n = 0
    for t in text.split(" "):
        if t:
            total += 0.2 + 0.79 * (len(findall(t)) / len(t))
            n += 1
    if not n:
        return 0.0
    return total / n - 1e-4 * float(rec_width % 8)


def recognize_span(raw: str, rec_width: int) -> Tuple[str, float]:
    """region content -> (decoded text, confidence)."""
    text = ctc_normalize(raw)
    return text, span_confidence(text, rec_width)


# --- batch packing (sort_widthratio + batch_pack + agg_batchratio) ---

def pack_batches(
    ratios: Sequence[float],
    batch_num: int,
    rec_image_height: int,
    seed_ratio: float,
) -> Tuple[List[int], List[int], List[int]]:
    """Width-argsort + sequential chunks of ``batch_num``; per-batch width.

    Given per-span aspect ratios (w/h) in reading order, returns
    ``(batch_id, rec_width, sorted_pos)`` aligned to the INPUT order:

    - spans are argsorted by ratio (stable, ties keep reading order —
      matching numpy's stable argsort use at `predict_rec.py:86-90`),
    - chunked sequentially into batches of ``batch_num``
      (`predict_rec.py:92-96`),
    - each batch's shared width is ``ceil(h * max(seed_ratio, max ratio in
      batch))`` (`predict_rec.py:94-107`),
    - results are scattered back to input positions (zip_restore,
      `predict_rec.py:117-118`).
    """
    n = len(ratios)
    indices = sorted(range(n), key=lambda i: (ratios[i], i))
    batch_id = [0] * n
    rec_width = [0] * n
    sorted_pos = [0] * n
    for beg in range(0, n, batch_num):
        chunk = indices[beg:beg + batch_num]
        max_ratio = seed_ratio
        for i in chunk:
            if ratios[i] > max_ratio:
                max_ratio = ratios[i]
        width = int(math.ceil(rec_image_height * max_ratio))
        b = beg // batch_num
        for k, i in enumerate(chunk):
            batch_id[i] = b
            rec_width[i] = width
            sorted_pos[i] = beg + k
    return batch_id, rec_width, sorted_pos
