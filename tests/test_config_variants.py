"""Config-knob coverage: the reference's tunable surface must actually
change behavior the way the reference documents (SURVEY.md §2 citations
on each knob)."""

from dataclasses import replace

from onnxocr_ray_spark.config import DEFAULT_CONFIG, SERVICE_CONFIG
from onnxocr_ray_spark.kernels.pipeline import extract_document


HTML = (
    "<p>good readable paragraph text</p>\n"
    + "<p>" + " ".join(["ok?!"] * 8) + "</p>\n"        # mid-confidence
    + "<p>" + " ".join(["#$%&"] * 8) + "</p>"           # low-confidence
).encode()

FLIPPED = ("<p>" + "A plain sentence. It reads well."[::-1] + "</p>").encode()


def test_drop_score_service_override():
    """Service mode (drop_score=0.1, app-service.py:27) keeps spans the
    library default (0.5, config.yaml:68) drops."""
    lib = extract_document(HTML, DEFAULT_CONFIG)
    svc = extract_document(HTML, SERVICE_CONFIG)
    assert svc.n_spans > lib.n_spans
    assert {s.text for s in lib.spans} <= {s.text for s in svc.spans}


def test_use_angle_cls_off_skips_rotation():
    """cls stage gated by use_angle_cls (onnx_paddleocr.py:51-54)."""
    on = extract_document(FLIPPED, DEFAULT_CONFIG)
    off = extract_document(FLIPPED, replace(DEFAULT_CONFIG, use_angle_cls=False))
    assert on.n_spans == 1
    assert on.extracted_text == "A plain sentence. It reads well."
    # without cls the reversed text stays reversed (and still low-ish conf
    # but above drop_score since chars are alnum)
    assert off.extracted_text != on.extracted_text


def test_box_thresh_raises_bar():
    """det_db_box_thresh sweeps candidates out (db_postprocess.py:128-132)."""
    html = b'<p>body text with <a href="/x">one link of text inside</a> words</p>'
    keep = extract_document(html, replace(DEFAULT_CONFIG, det_db_box_thresh=0.3))
    drop = extract_document(html, replace(DEFAULT_CONFIG, det_db_box_thresh=0.99))
    assert keep.n_spans >= 1
    assert drop.n_spans == 0


def test_max_candidates_cap():
    html = ("\n".join(f"<p>paragraph {i} content words</p>" for i in range(50))).encode()
    capped = extract_document(html, replace(DEFAULT_CONFIG, max_candidates=10))
    assert capped.n_spans == 10


def test_rec_batch_num_changes_packing_not_text():
    """Batch size changes widths/scores (the §4.1.1 coupling) but never
    the decoded text."""
    html = ("\n".join(f"<p>some words here number {i}</p>" for i in range(9))).encode()
    b6 = extract_document(html, DEFAULT_CONFIG)
    b2 = extract_document(html, replace(DEFAULT_CONFIG, rec_batch_num=2))
    assert [s.text for s in b6.spans] == [s.text for s in b2.spans]
    assert [s.batch_id for s in b6.spans] != [s.batch_id for s in b2.spans]


def test_poly_box_type_emits_outline_vertices():
    """det_box_type="poly" (db_postprocess.py:58-100 analog): a block
    whose lines have different widths gets a staircase outline with more
    than 4 vertices; the default quad path emits exactly 4. Text routing
    is geometry-independent, so the decoded text matches."""
    html = (
        "<p>a paragraph whose first line is quite long indeed\n"
        "short second\n"
        "and a medium third line</p>"
    ).encode()
    quad = extract_document(html, DEFAULT_CONFIG)
    poly = extract_document(html, replace(DEFAULT_CONFIG, det_box_type="poly"))
    assert quad.n_spans == poly.n_spans == 1
    assert len(quad.spans[0].box) == 4
    assert len(poly.spans[0].box) > 4          # staircase outline
    assert poly.spans[0].text == quad.spans[0].text
    # outline stays inside the quad's unclipped bbox neighborhood and is
    # clockwise from the top-left-most vertex
    pts = poly.spans[0].box
    assert min(p[1] for p in pts) == pts[0][1]


def test_poly_uniform_lines_simplify_to_quad_shape():
    """approxPolyDP analog: uniform line widths collapse the outline to
    the 4-corner shape (vertex merge under epsilon)."""
    html = ("<p>" + "\n".join(["equal width line abc"] * 4) + "</p>").encode()
    poly = extract_document(html, replace(DEFAULT_CONFIG, det_box_type="poly"))
    assert poly.n_spans == 1
    assert len(poly.spans[0].box) == 4
