"""Model-provider contract + sampled QA renderer."""

import pytest

from onnxocr_ray_spark.models import (
    HAVE_ORT,
    StandinClassifier,
    StandinRecognizer,
    classifier_provider,
    get_session,
    recognizer_provider,
)
from onnxocr_ray_spark.operators.extract import extract
from onnxocr_ray_spark.qa import sample_qa
from onnxocr_ray_spark.sources.pages import pages_table

from tests.conftest import SF0001


def test_standin_classifier_contract():
    cls = classifier_provider(None)
    assert isinstance(cls, StandinClassifier)
    out = cls(["A normal sentence. It reads fine.", "x"])
    assert len(out) == 2
    label, prob = out[0]
    assert label in ("0", "180") and 0.0 <= prob <= 1.0


def test_standin_recognizer_contract():
    rec = recognizer_provider(None)
    assert isinstance(rec, StandinRecognizer)
    [(text, score)] = rec(["some  raw &amp; text"], [320])
    assert text == "some raw & text"
    assert 0.0 < score <= 1.0


@pytest.mark.skipif(HAVE_ORT, reason="container unexpectedly has onnxruntime")
def test_get_session_gated_without_ort():
    with pytest.raises(NotImplementedError):
        get_session("/nonexistent/model.onnx")


def test_sample_qa_renders(spark):
    out = extract(pages_table(spark, SF0001))
    text = sample_qa(out, n=3)
    assert "url:" in text and "det=" in text and "sha256:" in text
    # deterministic sample
    assert text == sample_qa(extract(pages_table(spark, SF0001)), n=3)


def test_render_canvas_draws_boxes(spark):
    from onnxocr_ray_spark.operators.extract import extract
    from onnxocr_ray_spark.qa import render_canvas
    from onnxocr_ray_spark.sources.pages import pages_table

    from tests.conftest import SF0001

    row = (
        extract(pages_table(spark, SF0001))
        .filter("n_spans >= 2")
        .orderBy("url")
        .limit(1)
        .collect()[0]
    )
    canvas = render_canvas(row)
    assert "+" in canvas and "-" in canvas and "|" in canvas
    assert "0" in canvas  # span index 0 labeled
    lines = canvas.splitlines()
    assert len(lines) <= 40 and max(len(l) for l in lines) <= 100
    # deterministic
    assert render_canvas(row) == canvas


def test_render_canvas_empty():
    from onnxocr_ray_spark.qa import render_canvas

    assert render_canvas({"spans": []}) == "(no spans)"
