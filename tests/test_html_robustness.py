"""Tokenizer robustness over messy real-world HTML shapes."""

import pytest

from onnxocr_ray_spark.config import DEFAULT_CONFIG as CFG
from onnxocr_ray_spark.kernels.html import tokenize_blocks
from onnxocr_ray_spark.kernels.pipeline import extract_document


def texts(html: bytes):
    return extract_document(html, CFG).extracted_text


def test_entities_inside_attributes_not_decoded_into_text():
    html = (
        b'<p>a longer paragraph of honest content where only '
        b'<a href="/x?a=1&amp;b=2" title="T&amp;C">one link</a> '
        b"appears among many ordinary words of text</p>"
    )
    out = texts(html)
    assert "a=1" not in out and "T&C" not in out  # attrs never leak
    assert "honest content" in out and "one link" in out


def test_link_heavy_block_is_filtered_as_boilerplate():
    # flt_boxscore semantics: a block that is ~half link text is below
    # det_db_box_thresh and dropped (that's the boilerplate filter working)
    html = b'<p>before <a href="/x">link words</a> after</p>'
    assert texts(html) == ""


def test_comment_with_markup_inside():
    html = b"<!-- <p>ghost paragraph</p> --><p>real paragraph content</p>"
    assert texts(html) == "real paragraph content"


def test_nested_tables():
    html = (
        b"<table><tr><td>outer cell words</td><td>"
        b"<table><tr><td>inner cell words</td></tr></table>"
        b"</td></tr></table>"
    )
    out = texts(html)
    assert "outer cell words" in out and "inner cell words" in out


def test_unclosed_everything():
    html = b"<div><p>first block words<p>second block words<li>third item words"
    out = texts(html)
    for t in ("first block words", "second block words", "third item words"):
        assert t in out


def test_uppercase_and_mixed_case_tags():
    html = b"<P>upper tag paragraph</P><ScRiPt>var hidden=1;</sCrIpT><p>after script</p>"
    out = texts(html)
    assert "upper tag paragraph" in out and "after script" in out
    assert "hidden" not in out


def test_self_closing_and_void_tags():
    html = b"<p>line one<br/>line two<hr>line three</p>"
    out = texts(html)
    # br/hr are block boundaries -> separate spans, all retained
    for t in ("line one", "line two", "line three"):
        assert t in out


def test_angle_brackets_in_text_via_entities():
    html = b"<p>compare 1 &lt; 2 &amp;&amp; 3 &gt; 2 ok</p>"
    assert texts(html) == "compare 1 < 2 && 3 > 2 ok"


def test_huge_single_line_no_newlines():
    body = " ".join(f"word{i}" for i in range(2000))
    html = f"<p>{body}</p>".encode()
    out = texts(html)
    assert out.startswith("word0 word1")
    assert f"word1999" in out


def test_whitespace_only_blocks_ignored():
    html = b"<p>   \n\t  </p><p>actual words</p>"
    blocks = tokenize_blocks(html.decode())
    assert texts(html) == "actual words"


def test_malformed_tag_soup_never_crashes():
    # `<a <b <p>` parses as one anchor tag (like browsers): the following
    # text is link content inside an unclosed <a> and is boilerplate-
    # filtered. The requirement is totality + determinism, not survival.
    html = b"<<<p><>>>><a <b <p>survivor text</p>< /p>>"
    a = extract_document(html, CFG)
    b = extract_document(html, CFG)
    assert a.checksum == b.checksum


def test_unclosed_anchor_does_not_poison_later_blocks():
    html = b'<p><a href="/x">unterminated anchor</p><p>clean paragraph of words</p>'
    assert "clean paragraph of words" in texts(html)
