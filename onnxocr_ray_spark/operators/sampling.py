"""Corpus sampling / mixing / skew-handling operators.

Training-data pipelines constantly subsample, re-mix, and aggregate over
skewed keys. Three engine patterns, each oracle-backed:

- ``sample_systematic``   — deterministic hash-mod sampling (the portable
  form of TABLESAMPLE: same rows on any engine, any partitioning, any
  cluster size — RNG-based sampling is none of those).
- ``corpus_mix``          — per-language quota by quality rank (the data
  mixing step before training: top-N per stratum).
- ``salted_type_stats``   — two-phase salted aggregation: partial
  aggregate on (key, salt), final on key. Demonstrates the skew recipe
  for hot keys where a plain groupBy would funnel one key's rows into
  one reducer; output identical to the direct aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from onnxocr_ray_spark.functions import portable_md5
from onnxocr_ray_spark.registry import register
from onnxocr_ray_spark.sources.tables import load_table


@register(
    "sample_systematic",
    sql="""
    SELECT doc_id, lang
    FROM documents
    WHERE cast(('0x' || substr(md5('sample|' || cast(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 7
    """,
    doc=(
        "training-data op: deterministic systematic sampling (~7%) via "
        "content-hash mod — identical sample on any engine/partitioning, "
        "unlike RNG TABLESAMPLE"
    ),
)
def sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = portable_md5(F.concat(F.lit("sample|"), F.col("doc_id").cast("string")))
    bucket = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % 100
    return docs.filter(bucket < 7).select("doc_id", "lang")


@register(
    "corpus_mix",
    sql="""
    SELECT doc_id, lang, quality, rank FROM (
      SELECT doc_id, lang,
             round(least((length(trim(text, ' ')) - length(replace(trim(text, ' '), ' ', '')) + 1)
                         / 100.0, 1.0) * 0.5
                   + length(regexp_replace(text, '[^a-z]', '', 'g'))
                     / greatest(length(text), 1)::DOUBLE * 0.5, 6) AS quality,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY round(least((length(trim(text, ' ')) - length(replace(trim(text, ' '), ' ', '')) + 1)
                              / 100.0, 1.0) * 0.5
                        + length(regexp_replace(text, '[^a-z]', '', 'g'))
                          / greatest(length(text), 1)::DOUBLE * 0.5, 6) DESC,
                        doc_id
             ) AS rank
      FROM documents
    ) WHERE rank <= 20
    """,
    doc=(
        "training-data op: corpus mixing — per-language quota (top 20 by "
        "quality score, deterministic tiebreak) — the stratified keep list "
        "a data-mixing stage emits"
    ),
)
def corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = F.trim(F.col("text"))
    n_tokens = F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))) + 1
    length = F.greatest(F.length("text"), F.lit(1)).cast("double")
    alpha = F.length(F.regexp_replace("text", "[^a-z]", ""))
    quality = F.round(
        F.least(n_tokens / 100.0, F.lit(1.0)) * 0.5 + alpha / length * 0.5, 6
    )
    w = W.partitionBy("lang").orderBy(F.col("quality").desc(), "doc_id")
    return (
        docs.select("doc_id", "lang", quality.alias("quality"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 20)
    )


@register(
    "salted_type_stats",
    sql="""
    SELECT event_type, count(*) AS n, round(sum(value), 2) AS total,
           round(max(value), 4) AS max_value
    FROM events GROUP BY event_type
    """,
    doc=(
        "training-data op: skew-safe aggregation — partial aggregate on "
        "(key, salt) then final on key; 5 event_type values over 100k rows "
        "is exactly the hot-key shape where a direct groupBy funnels each "
        "key into one reducer. Output identical to the direct aggregation "
        "(the oracle), plan carries two exchanges with the salted key first."
    ),
)
def salted_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    n_salts = 16
    # deterministic salt (hash of the row id, NOT rand(): retries/replays
    # must route a row to the same salt)
    salted = ev.withColumn("salt", F.pmod(F.xxhash64("event_id"), F.lit(n_salts)))
    partial = salted.groupBy("event_type", "salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum("value").alias("psum"),
        F.max("value").alias("pmax"),
    )
    return (
        partial.groupBy("event_type")
        .agg(
            F.sum("pn").alias("n"),
            F.round(F.sum("psum"), 2).alias("total"),
            F.round(F.max("pmax"), 4).alias("max_value"),
        )
    )


N_SHARDS = 16


@register(
    "shard_manifest",
    priority=10,
    sql=f"""
    SELECT cast(('0x' || substr(md5(cast(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
             % {N_SHARDS} AS shard,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           min(doc_id) AS min_doc,
           max(doc_id) AS max_doc
    FROM documents
    GROUP BY 1
    """,
    doc=(
        "training-data op: deterministic hash-shard assignment manifest — "
        "the export-planning step of a training-data pipeline (shard = "
        "md5(doc_id) high word mod N, engine/partitioning-invariant); at "
        "corpus scale the same expression feeds "
        "df.repartition(N, shard).write.partitionBy(shard)"
    ),
)
def shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    shard = (
        F.conv(
            F.substring(portable_md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % N_SHARDS
    ).alias("shard")
    return docs.groupBy(shard).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


# --- sequence packing (concat-chunk pretraining batches) ---

SEQ_BUDGET = 2048  # tokens per packed training sequence


@register(
    "pack_sequences",
    priority=18,  # new this round: into the checked window
    sql=f"""
    WITH toks AS (
        SELECT doc_id,
               cast(('0x' || substr(md5(cast(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % {N_SHARDS} AS shard,
               CASE WHEN length(trim(text, ' ')) = 0 THEN 0
                    ELSE length(trim(text, ' '))
                         - length(replace(trim(text, ' '), ' ', '')) + 1
               END AS n_tokens
        FROM documents
    )
    SELECT doc_id, shard, n_tokens,
           CAST(coalesce(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS start_offset,
           CAST(coalesce(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             // {SEQ_BUDGET} AS BIGINT) AS seq_id,
           CAST(coalesce(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             % {SEQ_BUDGET} AS BIGINT) AS offset_in_seq
    FROM toks
    ORDER BY doc_id
    """,
    doc=(
        "training-data op: sequence packing — concat-chunk each shard's "
        "token stream into fixed-budget training sequences (GPT-style "
        "packing: docs concatenate in doc_id order, a doc may straddle a "
        "sequence boundary; every doc gets its shard-local start offset, "
        "sequence id, and in-sequence offset). The cumulative sum runs "
        "PER SHARD (hash-mod, the shard_manifest expression), so the "
        "window is one hash exchange with N_SHARDS-way parallelism — no "
        "global single-partition sort."
    ),
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = F.trim(F.col("text"))
    n_tokens = (
        F.when(F.length(t) == 0, F.lit(0))
        .otherwise(
            F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))) + 1
        )
        .cast("long")
    )
    return pack_token_stream(
        docs.select("doc_id", n_tokens.alias("n_tokens"))
    )


def pack_token_stream(toks: DataFrame) -> DataFrame:
    """(doc_id, n_tokens) -> packed layout (shard, start_offset, seq_id,
    offset_in_seq) — the reusable packing core (see pack_sequences)."""
    shard = (
        F.conv(
            F.substring(portable_md5(F.col("doc_id").cast("string")), 1, 8),
            16, 10,
        ).cast("long")
        % N_SHARDS
    )
    toks = toks.select("doc_id", shard.alias("shard"), "n_tokens")
    w = (
        W.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return toks.select(
        "doc_id",
        "shard",
        "n_tokens",
        start.cast("long").alias("start_offset"),
        F.floor(start / SEQ_BUDGET).cast("long").alias("seq_id"),
        (start % SEQ_BUDGET).cast("long").alias("offset_in_seq"),
    ).orderBy("doc_id")


# --- end-to-end: curation -> packed training sequences ---

# derived from the registered curation SQL itself (no hand-copy to drift)
from onnxocr_ray_spark.operators.relational4 import (  # noqa: E402
    CURATE_KEEP_PRED,
    CURATE_SCORED_SQL,
)

_CURATE_KEPT_SQL = (
    f"SELECT doc_id, n_tokens FROM ({CURATE_SCORED_SQL}) "
    f"WHERE {CURATE_KEEP_PRED}"
)


@register(
    "curate_pack_e2e",
    priority=21,  # new this round: into the checked window
    sql=f"""
    WITH kept AS ({_CURATE_KEPT_SQL}),
    toks AS (
        SELECT doc_id, n_tokens,
               cast(('0x' || substr(md5(cast(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % {{n_shards}} AS shard
        FROM kept
    )
    SELECT doc_id, shard, n_tokens,
           CAST(coalesce(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS start_offset,
           CAST(coalesce(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             // {{budget}} AS BIGINT) AS seq_id,
           CAST(coalesce(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             % {{budget}} AS BIGINT) AS offset_in_seq
    FROM toks
    ORDER BY doc_id
    """.format(n_shards=N_SHARDS, budget=SEQ_BUDGET),
    doc=(
        "training-data op: the END PRODUCT query — curation (exact-dedup "
        "survivor + token/quality gates, the curate_corpus decision) "
        "composed with per-shard sequence packing, emitting the packed "
        "training-sequence layout of the kept corpus. Demonstrates that "
        "the registered operators compose as DataFrame stages with no "
        "materialization between them: Catalyst fuses the curation "
        "filter under the packing window's shard exchange."
    ),
)
def curate_pack_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from onnxocr_ray_spark.operators.relational4 import curate_corpus

    kept = curate_corpus(spark, sf_dir).select("doc_id", "n_tokens")
    return pack_token_stream(kept)
