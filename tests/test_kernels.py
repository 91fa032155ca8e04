"""Kernel-level unit tests (off-Spark) per SURVEY.md §2 operator IDs."""

import hashlib

import pytest

from onnxocr_ray_spark.config import DEFAULT_CONFIG, ExtractConfig
from onnxocr_ray_spark.kernels.classify import classify_angle, maybe_rotate
from onnxocr_ray_spark.kernels.detect import content_density, detect_regions
from onnxocr_ray_spark.kernels.html import decode_html, tokenize_blocks
from onnxocr_ray_spark.kernels.pipeline import extract_document
from onnxocr_ray_spark.kernels.recognize import (
    ctc_normalize,
    decode_entities,
    pack_batches,
    span_confidence,
)
from onnxocr_ray_spark.kernels.sort import sorted_boxes
from onnxocr_ray_spark.sources.pages import synth_page

CFG = DEFAULT_CONFIG


# --- src_base64 analog: binary decode guard (flt_emptyimg) ---

def test_decode_html_none_and_empty():
    assert decode_html(None) is None
    assert decode_html(b"") is None


def test_decode_html_invalid_utf8():
    assert decode_html(b"\xff\xfe\x80") is None


def test_decode_html_ok():
    assert decode_html("héllo".encode()) == "héllo"


# --- tokenize (detect preprocessing) ---

def test_tokenize_basic_blocks():
    src = "<html><body>\n<p>alpha beta</p>\n<p>gamma</p>\n</body></html>"
    blocks = tokenize_blocks(src)
    texts = [b.raw.strip() for b in blocks]
    assert texts == ["alpha beta", "gamma"]
    assert blocks[0].line0 == 1 and blocks[1].line0 == 2


def test_tokenize_skips_script_style():
    src = "<style>p{color:red}</style><script>var x='<p>no</p>';</script><p>yes</p>"
    blocks = tokenize_blocks(src)
    assert [b.raw for b in blocks if b.text_chars] == ["yes"]


def test_tokenize_link_chars_counted():
    src = '<p>read <a href="/x">this link</a> now</p>'
    blocks = tokenize_blocks(src)
    b = next(b for b in blocks if b.text_chars)
    assert b.link_chars == len("thislink")
    assert b.text_chars == len("readthislinknow")


def test_tokenize_tag_only_block_has_zero_width():
    src = '<p><img src="a"><img src="b"></p>'
    blocks = tokenize_blocks(src)
    assert len(blocks) == 1
    assert blocks[0].width_chars == 0 and blocks[0].text_chars == 0


def test_tokenize_columns_tracked():
    src = "<p>ab</p><p>cd</p>"
    blocks = tokenize_blocks(src)
    assert blocks[0].col0 == 3       # after "<p>"
    assert blocks[1].col0 == 12      # after "<p>ab</p><p>"
    assert blocks[0].line0 == blocks[1].line0 == 0


# --- detect: density score + filter chain ---

def test_density_pure_paragraph_near_one():
    blocks = tokenize_blocks("<p>plain content paragraph with several words</p>")
    assert content_density(blocks[0], CFG) == pytest.approx(1.0)


def test_density_nav_is_zero():
    blocks = tokenize_blocks('<nav><a href="/">Home</a> <a href="/b">About</a></nav>')
    b = next(b for b in blocks if b.text_chars)
    assert content_density(b, CFG) == 0.0


def test_detect_filters_boilerplate_keeps_content():
    html = (
        '<nav><a href="/">Home</a> <a href="/a">About</a></nav>\n'
        "<p>real content paragraph alpha beta gamma delta</p>\n"
    ).encode()
    regions = detect_regions(html, CFG)
    assert len(regions) == 1
    assert "real content" in regions[0].raw


def test_detect_zero_width_filtered():
    html = b'<p><img src="a"></p><p>kept paragraph text here</p>'
    regions = detect_regions(html, CFG)
    assert len(regions) == 1


def test_detect_candidate_cap():
    cfg = ExtractConfig(max_candidates=5)
    html = ("\n".join(f"<p>paragraph number {i} words</p>" for i in range(20))).encode()
    assert len(detect_regions(html, cfg)) == 5


def test_detect_empty_returns_no_regions():
    assert detect_regions(b"", CFG) == []
    assert detect_regions(None, CFG) == []


# --- classify ---

def test_classify_forward_text():
    label, conf = classify_angle("The quick brown fox. It jumped over things.")
    assert label == "0" and conf > 0.9


def test_classify_reversed_text():
    fwd = "The quick brown fox. It jumped over the lazy dog."
    label, conf = classify_angle(fwd[::-1])
    assert label == "180" and conf > 0.9
    assert maybe_rotate(fwd[::-1], label, conf, 0.9) == fwd


def test_classify_neutral_no_rotate():
    label, conf = classify_angle("数据 引擎")   # no latin sentence evidence
    assert maybe_rotate("数据 引擎", label, conf, 0.9) == "数据 引擎"


def test_classify_below_thresh_not_rotated():
    assert maybe_rotate("abc", "180", 0.85, 0.9) == "abc"


# --- recognize: entities, normalize, confidence, packing ---

def test_decode_entities():
    # &nbsp; -> U+00A0, which ctc_normalize then collapses as whitespace
    assert decode_entities("Q&amp;A &lt;b&gt; &#65; &#x42; &nbsp;x") == 'Q&A <b> A B \xa0x'
    assert decode_entities("&bogus12; stays") == "&bogus12; stays"
    assert ctc_normalize("a&nbsp;&nbsp;b") == "a b"


def test_ctc_normalize_collapse():
    assert ctc_normalize("a​ b\x01c   d\n\te") == "a bc d e"


def test_span_confidence_ranges():
    assert span_confidence("", 0) == 0.0
    assert span_confidence("clean words here", 0) > 0.9
    assert span_confidence("#$% !!! @@@", 0) < 0.5


def test_span_confidence_width_coupling():
    a = span_confidence("same words", 320)
    b = span_confidence("same words", 321)
    assert a != b


def test_pack_batches_reference_semantics():
    # ratios in reading order; batch_num=2, h=48, seed=320/48
    ratios = [10.0, 1.0, 5.0, 20.0, 2.0]
    batch_id, rec_width, pos = pack_batches(ratios, 2, 48, 320.0 / 48.0)
    # argsort order: [1(1.0), 4(2.0), 2(5.0), 0(10.0), 3(20.0)]
    # batches: {1,4} -> max(seed,2)=6.67 -> 320; {2,0} -> 10 -> 480; {3} -> 20 -> 960
    assert [batch_id[i] for i in (1, 4, 2, 0, 3)] == [0, 0, 1, 1, 2]
    assert rec_width[1] == rec_width[4] == 320
    assert rec_width[2] == rec_width[0] == 480
    assert rec_width[3] == 960
    assert [pos[i] for i in (1, 4, 2, 0, 3)] == [0, 1, 2, 3, 4]


def test_pack_batches_stable_ties():
    batch_id, _, pos = pack_batches([1.0, 1.0, 1.0], 2, 48, 1.0)
    assert pos == [0, 1, 2]  # ties keep input (reading) order


# --- sort: bounded bubble pass ---

def _mk(y, x):
    return {"y": y, "x": x}


def test_sorted_boxes_basic():
    items = [_mk(20, 0), _mk(0, 5), _mk(0, 1)]
    out = sorted_boxes(items, y0=lambda b: b["y"], x0=lambda b: b["x"])
    assert [(b["y"], b["x"]) for b in out] == [(0, 1), (0, 5), (20, 0)]


def test_sorted_boxes_band_swap():
    # near-same-band rows with inverted x: bubble pass reorders
    items = [_mk(0, 40), _mk(8, 0)]
    out = sorted_boxes(items, y0=lambda b: b["y"], x0=lambda b: b["x"], band=10)
    assert [(b["y"], b["x"]) for b in out] == [(8, 0), (0, 40)]


def test_sorted_boxes_break_stops_cascade():
    # The early break means an in-band inversion beyond a non-inverted
    # neighbor does NOT migrate further left — not a total band order.
    items = [_mk(0, 0), _mk(9, 50), _mk(17, 10)]
    out = sorted_boxes(items, y0=lambda b: b["y"], x0=lambda b: b["x"], band=10)
    assert [(b["y"], b["x"]) for b in out] == [(0, 0), (17, 10), (9, 50)]


# --- full document pipeline ---

def test_extract_document_empty():
    res = extract_document(b"", CFG)
    assert res.n_spans == 0 and res.extracted_text == ""
    assert res.checksum == hashlib.sha256(b"").hexdigest()


def test_extract_document_end_to_end():
    html = (
        "<html><body>\n"
        '<nav><a href="/">Home</a> <a href="/a">About</a></nav>\n'
        "<p>First paragraph of honest content.</p>\n"
        "<p>Second paragraph, also quite honest.</p>\n"
        "</body></html>"
    ).encode()
    res = extract_document(html, CFG)
    assert res.n_spans == 2
    assert res.extracted_text == (
        "First paragraph of honest content.\nSecond paragraph, also quite honest."
    )
    assert res.spans[0].span_idx == 0 and res.spans[1].span_idx == 1


def test_extract_document_restores_flipped_paragraph():
    fwd = "A perfectly normal sentence. It reads forward nicely."
    html = f"<p>{fwd[::-1]}</p>".encode()
    res = extract_document(html, CFG)
    assert res.n_spans == 1
    assert res.extracted_text == fwd


def test_extract_document_drop_score():
    html = b"<p>good readable text</p>\n<p>#$% @!! ^^* ### $$$ %%%</p>"
    res = extract_document(html, CFG)
    assert res.n_spans == 1
    assert "good readable" in res.extracted_text


def test_synth_page_buckets_deterministic():
    for doc_id in (0, 1, 2, 3, 4, 5, 6, 7, 8, 50):
        a = synth_page(doc_id, "some words " * 30, "en")
        b = synth_page(doc_id, "some words " * 30, "en")
        assert a == b
    assert synth_page(0, "x", "en") == b""
    assert decode_html(synth_page(1, "x", "en")) is None


def test_synth_page_extraction_strips_boilerplate():
    text = "the quick brown fox jumps over the lazy dog again and again " * 10
    html = synth_page(10, text, "en")
    res = extract_document(html, CFG)
    assert res.n_spans > 0
    assert "Home" not in res.extracted_text           # nav stripped
    assert "Buy now" not in res.extracted_text        # ad stripped
    assert "tracker" not in res.extracted_text        # script stripped
    assert "quick brown fox" in res.extracted_text


# --- RTL / bidi branch (rec_postprocess.py:30-53 analog) ---

def test_bidi_reassemble_reverses_units_keeps_ltr_runs():
    from onnxocr_ray_spark.kernels.recognize import bidi_reassemble

    # RTL chars are single units, the LTR-safe run ' abc 12 ' stays intact
    assert bidi_reassemble("سلام abc 12 مرحبا") == "ابحرم abc 12 مالس"


def test_bidi_reassemble_identity_on_pure_ltr():
    from onnxocr_ray_spark.kernels.recognize import bidi_reassemble

    assert bidi_reassemble("plain latin 123 :*/%+-") == "plain latin 123 :*/%+-"


def test_rtl_gate_ignores_cjk_and_accents():
    from onnxocr_ray_spark.kernels.recognize import is_rtl_dominant

    assert is_rtl_dominant("مرحبا بالعالم abc")
    assert not is_rtl_dominant("café résumé")
    assert not is_rtl_dominant("汉字文本 here")
    assert not is_rtl_dominant("plain english")


def test_ctc_normalize_applies_bidi_last():
    from onnxocr_ray_spark.kernels.recognize import ctc_normalize

    # entity decode + whitespace collapse happen BEFORE reassembly;
    # exact pin: decode->collapse gives 'مرحبا بالعالم', then unit-reverse
    out = ctc_normalize("  مرحبا&nbsp;&nbsp;بالعالم  ")
    from onnxocr_ray_spark.kernels.recognize import bidi_reassemble

    assert out == bidi_reassemble("مرحبا بالعالم")


def test_rtl_bucket_planted_in_synthesizer():
    from onnxocr_ray_spark.sources.pages import synth_page

    html = synth_page(9, "some words " * 30, "en")  # doc_id 9 -> bucket 9
    assert "مرحبا".encode("utf-8") in html or "بالعالم".encode("utf-8") in html


def test_rtl_span_survives_extraction_in_visual_order():
    from onnxocr_ray_spark.kernels.recognize import _ARABIC_RE, bidi_reassemble
    from onnxocr_ray_spark.oracle import extract_serial
    from onnxocr_ray_spark.sources.pages import pages_local

    res = extract_serial(pages_local([(9, "some words " * 50, "en")]))
    ((_, r),) = res.items()
    ar_lines = [l for l in r.extracted_text.split("\n") if _ARABIC_RE.search(l)]
    assert ar_lines, "RTL bucket produced no Arabic span"
    # reassembly is an involution on a single line: applying it again
    # restores logical order, proving the emitted form is the visual one
    assert bidi_reassemble(bidi_reassemble(ar_lines[0])) == ar_lines[0]


# --- op_dilate analog (_dilate_merge, db_postprocess.py:56,223-224) ---

def _mk_block(line0, line1, col0, width, text=40, link=0, tags=0, order=0,
              raw="x" * 40):
    from onnxocr_ray_spark.kernels.html import RawBlock
    return RawBlock(raw=raw, line0=line0, line1=line1, col0=col0,
                    width_chars=width, text_chars=text, link_chars=link,
                    n_tags=tags, order=order)


def test_dilate_merges_one_line_gap():
    from dataclasses import replace
    from onnxocr_ray_spark.kernels.detect import _dilate_merge
    cfg = replace(DEFAULT_CONFIG, use_dilation=True)
    a = _mk_block(0, 2, 0, 30, order=0, raw="aaa")
    b = _mk_block(4, 6, 5, 30, order=1, raw="bbb")   # gap of 1 line
    out = _dilate_merge([a, b], cfg)
    assert len(out) == 1
    m = out[0]
    assert (m.line0, m.line1) == (0, 6)
    assert m.col0 == 0 and m.width_chars == 35
    assert m.raw == "aaa\nbbb"
    assert m.order == 0
    assert m.text_chars == a.text_chars + b.text_chars


def test_dilate_does_not_merge_two_line_gap():
    from dataclasses import replace
    from onnxocr_ray_spark.kernels.detect import _dilate_merge
    cfg = replace(DEFAULT_CONFIG, use_dilation=True)
    a = _mk_block(0, 2, 0, 30, order=0)
    b = _mk_block(5, 7, 0, 30, order=1)              # gap of 2 lines
    assert len(_dilate_merge([a, b], cfg)) == 2


def test_dilate_does_not_merge_horizontally_disjoint():
    from dataclasses import replace
    from onnxocr_ray_spark.kernels.detect import _dilate_merge
    cfg = replace(DEFAULT_CONFIG, use_dilation=True)
    a = _mk_block(0, 2, 0, 10, order=0)              # cols [0, 10)
    b = _mk_block(3, 5, 12, 10, order=1)             # col gap of 2 cells
    assert len(_dilate_merge([a, b], cfg)) == 2


def test_dilate_below_threshold_blocks_are_background():
    """Blocks failing binarize neither merge nor bridge components —
    the reference dilates the BINARIZED mask, not the raw scores."""
    from dataclasses import replace
    from onnxocr_ray_spark.kernels.detect import _dilate_merge
    cfg = replace(DEFAULT_CONFIG, use_dilation=True)
    a = _mk_block(0, 2, 0, 30, order=0)
    nav = _mk_block(4, 4, 0, 30, text=30, link=30, order=1)  # density 0
    b = _mk_block(6, 8, 0, 30, order=2)
    # a and b are each 1 line from nav but 3 lines from each other: if
    # nav (below binarize) could bridge, all three would merge
    out = _dilate_merge([a, nav, b], cfg)
    assert len(out) == 3


def test_dilate_transitive_chain_merges():
    from dataclasses import replace
    from onnxocr_ray_spark.kernels.detect import _dilate_merge
    cfg = replace(DEFAULT_CONFIG, use_dilation=True)
    blocks = [_mk_block(i * 4, i * 4 + 2, 0, 30, order=i, raw=f"p{i}")
              for i in range(4)]                     # each 1 line apart
    out = _dilate_merge(blocks, cfg)
    assert len(out) == 1
    assert out[0].raw == "p0\np1\np2\np3"


def test_dilate_merged_score_is_mediant():
    """content_density over the merged pseudo-block equals the
    stat-weighted mediant of the members (the box_score_fast re-measure
    over the original probability map), and stays above det_db_thresh
    when every member does."""
    from dataclasses import replace
    from onnxocr_ray_spark.kernels.detect import _dilate_merge, content_density
    cfg = replace(DEFAULT_CONFIG, use_dilation=True)
    a = _mk_block(0, 2, 0, 30, text=100, link=10, tags=2, order=0)
    b = _mk_block(4, 6, 0, 30, text=50, link=20, tags=1, order=1)
    sa, sb = content_density(a, cfg), content_density(b, cfg)
    (m,) = _dilate_merge([a, b], cfg)
    sm = content_density(m, cfg)
    t, l, g = 150.0, 30.0, 3.0
    assert abs(sm - (t - l) / (t + cfg.tag_weight * g)) < 1e-12
    assert min(sa, sb) <= sm <= max(sa, sb)
    assert sm > cfg.det_db_thresh


def test_dilate_default_off_is_noop():
    """The hot path is untouched when use_dilation is False (reference
    default, config.yaml:29): detect output identical on a real page."""
    from dataclasses import replace
    html = synth_page(7, "spark shuffle join " * 40, "en")
    base = detect_regions(html, DEFAULT_CONFIG)
    again = detect_regions(html, replace(DEFAULT_CONFIG, use_dilation=False))
    assert [(r.box, r.det_score, r.raw) for r in base] == [
        (r.box, r.det_score, r.raw) for r in again
    ]
