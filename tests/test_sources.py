"""Source surface: binaryFile ingestion (src_files analog)."""

import os
import shutil
import tempfile

import pytest

from onnxocr_ray_spark.operators.extract import extract
from onnxocr_ray_spark.sources.files import read_html_dir


@pytest.fixture()
def html_dir():
    d = tempfile.mkdtemp(prefix="htmlsrc_")
    with open(os.path.join(d, "a.html"), "w") as f:
        f.write("<p>honest content paragraph one two three</p>")
    with open(os.path.join(d, "b.html"), "w") as f:
        f.write('<nav><a href="/">Home</a></nav>\n<p>second document body text</p>')
    with open(os.path.join(d, "ignored.txt"), "w") as f:
        f.write("not html")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_read_html_dir_shape_and_extract(spark, html_dir):
    pages = read_html_dir(spark, html_dir)
    assert [f.name for f in pages.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang",
    ]
    rows = pages.collect()
    assert len(rows) == 2  # glob filtered the .txt
    out = {r.url.rsplit("/", 1)[-1]: r for r in extract(pages).collect()}
    assert "honest content paragraph" in out["a.html"].extracted_text
    assert "second document body" in out["b.html"].extracted_text
    assert "Home" not in out["b.html"].extracted_text  # nav stripped
