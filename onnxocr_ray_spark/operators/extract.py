"""The three-stage extraction pipeline as Spark DataFrame transformations.

Mirrors the reference's stage boundaries (`app-service.py` endpoints
/detection /classification /recognition /inference decompose the pipeline
exactly here; `onnx_paddleocr.py:72-114` composes them) — but the
architecture is Spark-first, not a translation:

- **detect** is one ``mapInPandas`` over the pages scan. Catalyst prunes
  the scan to (url, html); AQE sizes the partitions. Batch packing for the
  recognize stage (the reference's width-argsort + chunks-of-6 with shared
  padded width, `predict_rec.py:86-107`) is computed HERE, per document,
  and recorded per span — so every later stage is embarrassingly
  span-parallel while remaining byte-identical to the serial oracle no
  matter how spans are re-partitioned (SURVEY.md §4.1.1 determinism
  coupling, solved structurally).
- the production ``extract()`` routes heavy-tail documents away from the
  fused fast path (``extract_fused``: ALL three stages in one
  mapInPandas — zero shuffles, one Arrow crossing) into detect ->
  span-explode -> recognize -> regroup so one giant page cannot straggle
  a task. Routing strategy depends on the input: an ingest-materialized
  ``html_size`` column gives a metadata-scale probe (clean corpora run
  the pure fused plan); exact-shape tables use single-pass per-row
  routing over a persisted kernel output (html read exactly once). The
  stage-separated forms (``detect``, ``classify_recognize_grouped``,
  ``classify_recognize_exploded``) remain public — they are the
  /detection /classification /recognition endpoint analogs. All paths
  call the same kernels with the same inputs; parity tests assert
  byte-identity between them.
- **assemble** is pure JVM-side Catalyst expressions (filter / transform /
  array_join / sha2) — no Python in the final hot path.

At 100 TB: the only required shuffles are the straggler explode/regroup,
which touches just the heavy tail (a few % of documents). Everything else
is scan -> narrow mapInPandas -> project, which scales linearly with
executors.
"""

from __future__ import annotations

from typing import Iterator, List, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from onnxocr_ray_spark.config import DEFAULT_CONFIG, ExtractConfig
from onnxocr_ray_spark.kernels.classify import classify_angle, maybe_rotate
from onnxocr_ray_spark.kernels.pipeline import detect_sorted
from onnxocr_ray_spark.kernels.recognize import pack_batches, recognize_span

BOX_T = T.ArrayType(T.ArrayType(T.DoubleType()))

DET_SPAN_T = T.StructType(
    [
        T.StructField("box", BOX_T),
        T.StructField("det_score", T.DoubleType()),
        T.StructField("raw", T.StringType()),
        T.StructField("batch_id", T.IntegerType()),
        T.StructField("rec_width", T.IntegerType()),
    ]
)

REC_SPAN_T = T.StructType(
    [
        T.StructField("box", BOX_T),
        T.StructField("det_score", T.DoubleType()),
        T.StructField("angle", T.StringType()),
        T.StructField("cls_conf", T.DoubleType()),
        T.StructField("text", T.StringType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("batch_id", T.IntegerType()),
        T.StructField("rec_width", T.IntegerType()),
    ]
)

DETECT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("spans", T.ArrayType(DET_SPAN_T)),
        T.StructField("n_regions", T.IntegerType()),
    ]
)

REC_DOC_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("spans", T.ArrayType(REC_SPAN_T)),
    ]
)


def _detect_doc(html: Optional[bytes], cfg: ExtractConfig) -> List[dict]:
    """One document's detect output: sorted regions + precomputed packing."""
    regions = detect_sorted(html, cfg)
    if not regions:
        return []
    ratios = []
    for r in regions:
        # axis-aligned extent: identical to corner arithmetic for quads,
        # bounding-rect ratio for det_box_type="poly" outlines
        xs = [p[0] for p in r.box]
        ys = [p[1] for p in r.box]
        w = max(xs) - min(xs)
        h = max(ys) - min(ys)
        ratios.append(w / h if h > 0.0 else 0.0)
    batch_id, rec_width, _ = pack_batches(
        ratios, cfg.rec_batch_num, cfg.rec_image_height, cfg.rec_seed_ratio
    )
    return [
        {
            "box": [list(p) for p in r.box],
            "det_score": r.det_score,
            "raw": r.raw,
            "batch_id": batch_id[i],
            "rec_width": rec_width[i],
        }
        for i, r in enumerate(regions)
    ]


def _chunk_frames(pdf: pd.DataFrame, sizes: pd.Series, budget: int) -> Iterator[pd.DataFrame]:
    """Dynamic batch coalescing (SURVEY.md §4.3.2): split an Arrow batch at
    cumulative payload-size boundaries so one huge document doesn't pin a
    whole batch's worth of output in memory."""
    if len(pdf) == 0:
        return
    acc = 0
    start = 0
    for i, sz in enumerate(sizes):
        acc += int(sz) if sz is not None else 0
        if acc >= budget and i + 1 > start:
            yield pdf.iloc[start:i + 1]
            start = i + 1
            acc = 0
    if start < len(pdf):
        yield pdf.iloc[start:]


def detect(pages: DataFrame, cfg: ExtractConfig = DEFAULT_CONFIG) -> DataFrame:
    """pages(url, html, ...) -> (url, spans, n_regions).

    Catalyst column-prunes the scan to exactly (url, html); the stage is a
    narrow transformation (no shuffle).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sizes = pdf["html"].map(lambda h: len(h) if h is not None else 0)
            for chunk in _chunk_frames(pdf, sizes, cfg.coalesce_target_bytes):
                spans = [
                    _detect_doc(bytes(h) if h is not None else None, cfg)
                    for h in chunk["html"]
                ]
                yield pd.DataFrame(
                    {
                        "url": chunk["url"].values,
                        "spans": spans,
                        "n_regions": [len(s) for s in spans],
                    }
                )

    return pages.select("url", "html").mapInPandas(gen, schema=DETECT_SCHEMA)


def _process_span(raw: str, rec_width: int, cfg: ExtractConfig):
    """classify -> rotate -> recognize for one span (stage order is
    load-bearing: predict_cls.py:82-83 feeds predict_rec, SURVEY §4.1.3)."""
    if cfg.use_angle_cls:
        label, conf = classify_angle(raw)
        rotated = maybe_rotate(raw, label, conf, cfg.cls_thresh)
    else:
        label, conf, rotated = "0", 1.0, raw
    text, score = recognize_span(rotated, rec_width)
    return label, conf, text, score


def _process_doc_spans(raws: List[str], rec_widths: List[int], cfg: ExtractConfig):
    """classify -> rotate -> recognize for one batch of spans.

    Default: the deterministic stand-in kernels, span by span. When the
    config carries model providers (models.provider_mode), the batch
    instead flows through the real-model plumbing — render_crop
    rasterizes each span (the crop analog of `onnx_paddleocr.py:84-100`),
    OrtClassifier batches/chunks/classifies, the rotation is applied in
    span space and re-rendered (the synthetic-raster equivalent of
    np.rot90 on a pixel crop, `predict_cls.py:82-83`), and OrtRecognizer
    runs the batched CTC decode. Providers are built lazily per worker
    (models.stage_providers); the rasterizer is imported lazily so the
    stand-in hot path pays nothing.
    """
    from onnxocr_ray_spark.models import provider_mode, stage_providers

    if not provider_mode(cfg):
        return [
            _process_span(r, int(w), cfg) for r, w in zip(raws, rec_widths)
        ]
    from onnxocr_ray_spark.rasterize import render_crop

    clf, rec = stage_providers(cfg)
    if cfg.use_angle_cls:
        cls_out = clf(
            [render_crop(r, int(w), "cls") for r, w in zip(raws, rec_widths)]
        )
    else:
        cls_out = [("0", 1.0)] * len(raws)
    rotated = [
        maybe_rotate(r, label, conf, cfg.cls_thresh)
        for r, (label, conf) in zip(raws, cls_out)
    ]
    rec_out = rec(
        [render_crop(r, int(w), "rec") for r, w in zip(rotated, rec_widths)],
        rec_widths=[int(w) for w in rec_widths],
    )
    return [
        (label, conf, text, score)
        for (label, conf), (text, score) in zip(cls_out, rec_out)
    ]


def _rec_doc(spans, cfg: ExtractConfig) -> List[dict]:
    """One document's detected spans -> recognized span dicts (the shared
    tail of every classify/recognize path; batches the whole document
    through _process_doc_spans so provider mode sees per-document batches,
    matching the reference's per-image predict loops)."""
    results = _process_doc_spans(
        [s["raw"] for s in spans], [int(s["rec_width"]) for s in spans], cfg
    )
    return [
        {
            "box": s["box"],
            "det_score": s["det_score"],
            "angle": label,
            "cls_conf": conf,
            "text": text,
            "score": score,
            "batch_id": s["batch_id"],
            "rec_width": s["rec_width"],
        }
        for s, (label, conf, text, score) in zip(spans, results)
    ]


def classify_recognize_grouped(detected: DataFrame, cfg: ExtractConfig = DEFAULT_CONFIG) -> DataFrame:
    """Fast path: spans stay an array column; narrow mapInPandas, 0 shuffles."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_spans = []
            for spans in pdf["spans"]:
                doc = _rec_doc(spans, cfg)
                out_spans.append(doc)
            yield pd.DataFrame({"url": pdf["url"].values, "spans": out_spans})

    return detected.mapInPandas(gen, schema=REC_DOC_SCHEMA)


_SPAN_UDF_T = T.StructType(
    [
        T.StructField("angle", T.StringType()),
        T.StructField("cls_conf", T.DoubleType()),
        T.StructField("text", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def classify_recognize_exploded(detected: DataFrame, cfg: ExtractConfig = DEFAULT_CONFIG,
                                span_partitions: Optional[int] = None) -> DataFrame:
    """Straggler path (SURVEY.md §4.3.3): explode spans of heavy documents,
    classify+recognize at span granularity across the cluster, regroup.

    Byte-identity is preserved because the batch packing (batch_id,
    rec_width) was fixed at detect time over the whole document — span
    placement can no longer change what any kernel computes.
    """
    # zero-region documents (empty/undecodable payloads) are routed around
    # the explode+UDF entirely so they don't vanish from the output; the
    # split happens BEFORE the Generate so the explode runs once, not once
    # per branch
    has_spans = F.size("spans") > 0
    empty_docs = detected.filter(~has_spans | F.col("spans").isNull()).select(
        "url", F.from_json(F.lit("[]"), T.ArrayType(REC_SPAN_T)).alias("spans")
    )
    spans = detected.filter(has_spans).select(
        "url", F.posexplode("spans").alias("ord", "s")
    )
    if span_partitions:
        spans = spans.repartition(span_partitions, "url", "ord")

    @F.pandas_udf(_SPAN_UDF_T)
    def span_udf(raw: pd.Series, rec_width: pd.Series) -> pd.DataFrame:
        # whole Arrow batch through one provider/stand-in call — provider
        # mode chunks internally, so straggler spans batch across docs
        rows = _process_doc_spans(list(raw), [int(w) for w in rec_width], cfg)
        return pd.DataFrame(rows, columns=["angle", "cls_conf", "text", "score"])

    done = spans.withColumn("r", span_udf(F.col("s.raw"), F.col("s.rec_width")))
    span_struct = F.struct(
        F.col("s.box").alias("box"),
        F.col("s.det_score").alias("det_score"),
        F.col("r.angle").alias("angle"),
        F.col("r.cls_conf").alias("cls_conf"),
        F.col("r.text").alias("text"),
        F.col("r.score").alias("score"),
        F.col("s.batch_id").alias("batch_id"),
        F.col("s.rec_width").alias("rec_width"),
    )
    # regroup: collect spans with their reading-order index, then restore
    # order JVM-side (sort_array on (ord, span) structs sorts by ord first)
    regrouped = (
        done.select("url", F.struct(F.col("ord"), span_struct.alias("s")).alias("os"))
        .groupBy("url")
        .agg(F.sort_array(F.collect_list("os")).alias("oss"))
        .select("url", F.expr("transform(oss, x -> x.s)").alias("spans"))
    )
    return regrouped.unionByName(empty_docs)


def assemble(recognized: DataFrame, cfg: ExtractConfig = DEFAULT_CONFIG) -> DataFrame:
    """drop_score filter + reading-order zip + text join + checksum.

    Pure Catalyst expressions (whole-stage codegen; no Python). The span
    index is re-numbered over KEPT spans, matching the oracle's
    ``assemble`` (kernels/pipeline.py) and the reference's zip+filter
    (`onnx_paddleocr.py:107-112`).
    """
    with_kept = recognized.withColumn(
        "_kept", F.filter(F.col("spans"), lambda s: s["score"] >= F.lit(cfg.drop_score))
    )
    final_spans = F.transform(
        F.col("_kept"),
        lambda s, i: F.struct(
            i.cast("int").alias("span_idx"),
            s["box"].alias("box"),
            s["det_score"].alias("det_score"),
            s["angle"].alias("angle"),
            s["cls_conf"].alias("cls_conf"),
            s["text"].alias("text"),
            s["score"].alias("score"),
            s["batch_id"].alias("batch_id"),
            s["rec_width"].alias("rec_width"),
        ),
    )
    extracted = F.array_join(F.transform(F.col("_kept"), lambda s: s["text"]), "\n")
    return with_kept.select(
        "url",
        final_spans.alias("spans"),
        extracted.alias("extracted_text"),
        F.size("_kept").cast("int").alias("n_spans"),
        F.sha2(extracted, 256).alias("checksum"),
    )


def extract_fused(pages: DataFrame, cfg: ExtractConfig = DEFAULT_CONFIG) -> DataFrame:
    """All three stages fused into ONE mapInPandas pass per document.

    The reference runs its stages back-to-back in one process for the
    same reason (`onnx_paddleocr.py:72-114`; SURVEY.md §4.2 notes stage
    fusion beats inter-actor hops for batch workloads): the per-span
    kernels are microseconds, so separate Python stages would pay 3x
    Arrow serialization of the nested span structs for no parallelism
    gain. Output schema = (url, spans: array<REC_SPAN_T>).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sizes = pdf["html"].map(lambda h: len(h) if h is not None else 0)
            for chunk in _chunk_frames(pdf, sizes, cfg.coalesce_target_bytes):
                out_spans = []
                for h in chunk["html"]:
                    spans = _detect_doc(bytes(h) if h is not None else None, cfg)
                    doc = _rec_doc(spans, cfg)
                    out_spans.append(doc)
                yield pd.DataFrame({"url": chunk["url"].values, "spans": out_spans})

    return pages.select("url", "html").mapInPandas(gen, schema=REC_DOC_SCHEMA)


ROUTED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("spans", T.ArrayType(REC_SPAN_T)),       # small docs
        T.StructField("det_spans", T.ArrayType(DET_SPAN_T)),   # big docs
        T.StructField("is_big", T.BooleanType(), False),
    ]
)

# spill dir of the previous extract() call's routed pass — removed on the
# next call (and at interpreter exit) so repeated invocations (streaming
# epochs, bench loops) never accumulate spilled output
_PREV_SPILL_DIRS: List[str] = []


def _cleanup_spill_dirs() -> None:
    import shutil

    while _PREV_SPILL_DIRS:
        shutil.rmtree(_PREV_SPILL_DIRS.pop(), ignore_errors=True)


def _new_spill_dir() -> str:
    import atexit
    import tempfile

    if not _PREV_SPILL_DIRS:
        atexit.register(_cleanup_spill_dirs)
    else:
        _cleanup_spill_dirs()
    d = tempfile.mkdtemp(prefix="onnxocr_routed_spill_")
    _PREV_SPILL_DIRS.append(d)
    return d


def extract_routed(pages: DataFrame, cfg: ExtractConfig = DEFAULT_CONFIG,
                   straggler_html_bytes: int = 1 << 20) -> DataFrame:
    """ONE pass over the pages scan with per-row straggler routing.

    Typical documents (html <= threshold) are processed through all three
    stages fused (zero extra crossings); heavy-tail documents get detect
    ONLY — their per-span work is exported for cluster-wide distribution.
    This replaces the round-1 eager ``filter(is_big).limit(1).count()``
    probe, which could not short-circuit when NO straggler existed and so
    re-read every partition's html column (a full extra pass over the
    fattest column at 100 TB) just to elide ~1 s of empty-branch overhead.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sizes = pdf["html"].map(lambda h: len(h) if h is not None else 0)
            for chunk in _chunk_frames(pdf, sizes, cfg.coalesce_target_bytes):
                rec_out, det_out, big_out = [], [], []
                for h in chunk["html"]:
                    data = bytes(h) if h is not None else None
                    if data is not None and len(data) > straggler_html_bytes:
                        det_out.append(_detect_doc(data, cfg))
                        rec_out.append(None)
                        big_out.append(True)
                        continue
                    spans = _detect_doc(data, cfg)
                    doc = _rec_doc(spans, cfg)
                    rec_out.append(doc)
                    det_out.append(None)
                    big_out.append(False)
                yield pd.DataFrame(
                    {
                        "url": chunk["url"].values,
                        "spans": rec_out,
                        "det_spans": det_out,
                        "is_big": big_out,
                    }
                )

    return pages.select("url", "html").mapInPandas(gen, schema=ROUTED_SCHEMA)


SIZE_COL = "html_size"


def extract(pages: DataFrame, cfg: ExtractConfig = DEFAULT_CONFIG,
            doc_partitions: Optional[int] = None,
            span_partitions: Optional[int] = None,
            straggler_html_bytes: int = 1 << 20) -> DataFrame:
    """Full pipeline with straggler routing. Two strategies, picked by
    what the input table offers:

    pages(url, html, ...) -> (url, spans, extracted_text, n_spans, checksum)

    1. **Sized tables** (an ``html_size`` column materialized at ingest —
       every WARC record carries its length, and an Iceberg ingest
       keeps it as a stats column) — the PRODUCTION DEFAULT: the
       synthesized ingest (``sources/pages.py``) always materializes
       the stat, so this zero-cache strategy is what runs everywhere
       except truly schema-less inputs. One probe job scans ONLY that
       8-byte column (counting stragglers and NULL stats together); on
       a clean corpus slice the plan collapses to the pure zero-overhead
       fused pass — no cache, no extra stages, one scan of html.
       When stragglers exist, the branches carry pushed ``html_size``
       filters; only row groups mixing both classes are read twice.
       Rows whose size stat is NULL take the per-row routed leg, so a
       huge doc with a missing ingest stat keeps straggler protection.
    2. **Exact-shape tables** (no size column): single-pass per-row
       routing — ``extract_routed`` decides inside the fused kernel,
       the OUTPUT-SIZED result is persisted (MEMORY_AND_DISK) and
       eagerly materialized once, and both branch consumers read the
       cache. The html column is still read exactly once, but the
       cache footprint is why sized tables are preferred at 100 TB.

    Straggler spans explode across the cluster so one giant page cannot
    straggle a task. All paths run identical kernels with identical
    inputs — byte-identity is proven by tests regardless of which path
    a document takes.
    """
    if doc_partitions is None and pages.rdd.getNumPartitions() < (
        pages.sparkSession.sparkContext.defaultParallelism
    ):
        # under-partitioned input (single parquet file, small table):
        # without this the whole narrow detect chain runs on one core
        doc_partitions = pages.sparkSession.sparkContext.defaultParallelism
    if doc_partitions:
        # uniform doc distribution; url hash is effectively a salt because
        # input files may be ordered by crawl host (skewed localities)
        pages = pages.repartition(doc_partitions, "url")

    if SIZE_COL in pages.columns:
        return _extract_sized(pages, cfg, span_partitions, straggler_html_bytes)
    return assemble(
        _routed_spans(pages, cfg, span_partitions, straggler_html_bytes), cfg
    )


def _routed_spans(pages: DataFrame, cfg: ExtractConfig,
                  span_partitions: Optional[int],
                  straggler_html_bytes: int) -> DataFrame:
    """Exact-shape strategy body: per-row routed pass (spilled once) +
    the small/big branch consumers, returning the pre-assemble
    ``(url, spans)`` union. Also used by the sized strategy for rows
    whose ``html_size`` stat is NULL (unknown size -> per-row decision
    keeps straggler protection)."""
    # The routed pass is materialized EXACTLY ONCE by writing it to a
    # temp parquet table, then both branch consumers scan that table.
    # Two reasons this is a spill, not a persist:
    #  - eager materialization kills the branch race (the small/big legs
    #    are sibling tasks of ONE stage and at high parallelism raced on
    #    the same uncached partitions — measured as the kernel executing
    #    twice: local[8] ran 200k docs at 6.6k docs/s vs 9.6k at half
    #    the corpus);
    #  - at 100 TB an output-sized MEMORY_AND_DISK cache of a schema-less
    #    input would evict real working set; parquet on the shuffle-local
    #    disks is bounded and the is_big branch filters push down to the
    #    rescan. Sized tables (an html_size ingest stat) remain the
    #    production default and need neither cache nor spill.
    spill_dir = _new_spill_dir()
    extract_routed(pages, cfg, straggler_html_bytes).write.parquet(
        spill_dir, mode="overwrite"
    )
    routed = pages.sparkSession.read.parquet(spill_dir)

    rec_small = routed.filter(~F.col("is_big")).select("url", "spans")
    # The straggler branch handles the heavy TAIL — few documents by
    # definition. Coalesce it to a handful of partitions before the
    # span-level pandas_udf: every chained Python stage pays a worker
    # round-trip per partition even when the partition is near-empty;
    # classify_recognize_exploded then redistributes SPANS via
    # span_partitions when a finer fan-out is wanted.
    parallelism = pages.sparkSession.sparkContext.defaultParallelism
    big = (
        routed.filter(F.col("is_big"))
        .select("url", F.col("det_spans").alias("spans"))
        .repartition(max(4, parallelism // 4), "url")
    )
    rec_big = classify_recognize_exploded(big, cfg, span_partitions=span_partitions)
    return rec_small.unionByName(rec_big)


def _extract_sized(pages: DataFrame, cfg: ExtractConfig,
                   span_partitions: Optional[int],
                   straggler_html_bytes: int) -> DataFrame:
    """Sized-table strategy: metadata-scale probe + size-filtered branches.

    The probe reads ONLY the ingest-materialized ``html_size`` column
    (parquet row-group stats prune groups whose max size is under the
    threshold), never the html bytes — fixing the round-1 flaw where the
    elision probe re-read the fattest column of the whole corpus."""
    is_big = F.col(SIZE_COL) > straggler_html_bytes
    # ONE metadata-scale probe job for both facts (straggler present?
    # size stat ever NULL?): scans only the 8-byte size column
    stats = pages.select(
        F.sum(is_big.cast("long")).alias("n_big"),
        F.sum(F.col(SIZE_COL).isNull().cast("long")).alias("n_null"),
    ).first()
    n_big, n_null = stats["n_big"] or 0, stats["n_null"] or 0
    if n_big == 0 and n_null == 0:
        # clean corpus slice: the plan IS the fused zero-shuffle pass
        return assemble(extract_fused(pages.select("url", "html"), cfg), cfg)
    legs = []
    if n_null:
        # rows with a missing ingest stat: unknown size -> per-row routed
        # decision, so a huge doc with no stat keeps straggler protection
        legs.append(
            _routed_spans(
                pages.filter(F.col(SIZE_COL).isNull()),
                cfg, span_partitions, straggler_html_bytes,
            )
        )
    sized = pages.filter(F.col(SIZE_COL).isNotNull())
    small = sized.filter(~is_big).select("url", "html")
    legs.append(extract_fused(small, cfg))
    if n_big:
        parallelism = pages.sparkSession.sparkContext.defaultParallelism
        big_pages = (
            sized.filter(is_big)
            .select("url", "html")
            .repartition(max(4, parallelism // 4), "url")
        )
        big = detect(big_pages, cfg).drop("n_regions")
        legs.append(
            classify_recognize_exploded(big, cfg, span_partitions=span_partitions)
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return assemble(out, cfg)
