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


def test_self_closed_skip_tag_does_not_swallow_rest_of_document():
    # <svg/> opens nothing: text after it must stay visible
    html = b'<p>before drawing <svg width="10"/> after drawing words</p>'
    out = texts(html)
    assert "before drawing" in out and "after drawing words" in out


def test_self_closed_iframe_with_space_slash():
    html = b'<p>intro words here <iframe src="/ad" /> closing words here</p>'
    out = texts(html)
    assert "intro words here" in out and "closing words here" in out


def test_balanced_skip_tags_still_skip():
    html = b"<p>shown before<svg><text>hidden vector text</text></svg>shown after</p>"
    out = texts(html)
    assert "shown before" in out and "shown after" in out
    assert "hidden" not in out


def test_block_tag_inside_script_does_not_flush():
    # document.write('<p>') must not split the surrounding visible block
    html = (
        b"<p>first half of the sentence "
        b"<script>document.write('<p>ghost</p>');</script>"
        b"continues to the second half</p>"
    )
    blocks = [b for b in tokenize_blocks(html.decode()) if b.text_chars > 0]
    assert len(blocks) == 1
    out = texts(html)
    assert "first half of the sentence" in out
    assert "second half" in out
    assert "ghost" not in out


def test_block_tag_inside_style_keeps_link_accounting():
    # a '</a>' or '<div>' inside style content must not reset link depth:
    # the anchor below is still open across the style element
    html = (
        b'<p><a href="/x">link start <style>.x{}</style>link end</a> '
        b"plus plain visible trailing words making this block mostly text "
        b"so it survives the density filter</p>"
    )
    blocks = [b for b in tokenize_blocks(html.decode()) if b.text_chars > 0]
    assert len(blocks) == 1
    # both halves of the anchor text counted as link chars
    assert blocks[0].link_chars >= len("linkstart") + len("linkend")


def test_closing_void_tag_soup_is_not_payload():
    # a stray </img> alone must not fabricate a payload-bearing block
    html = b"<p></img></p><p>real content words</p>"
    blocks = tokenize_blocks(html.decode())
    assert len(blocks) == 1  # no zero-width phantom block from </img>
    assert texts(html) == "real content words"
