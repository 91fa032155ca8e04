"""Corpus deduplication operators (training-data pipeline extension set).

Five dedup families over ``documents``, each Spark-first with a DuckDB
oracle:

- exact (hash-groupBy)
- MinHash + LSH (shingle -> k signatures -> banded buckets -> bucket join
  -> exact-Jaccard verification)
- SimHash (token-hash bit-vote signature)
- n-gram Jaccard with blocking
- embedding-cosine near-dup (see also similarity.py)

Scale notes: the Spark implementations use explode + equi-join for LSH
bucketing (shuffle on band hash — the scalable plan at 10^12 docs); the
oracles use the naive OR-join, which is only feasible at oracle scale.
All hashes are md5-over-strings so both engines agree bit-for-bit
(functions/__init__.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from onnxocr_ray_spark.functions import (
    minhash_signature,
    portable_md5,
    shingles_of,
    words_of,
)
from onnxocr_ray_spark.registry import register
from onnxocr_ray_spark.sources.tables import load_table

MINHASH_K = 8          # signatures
LSH_BANDS = 4          # bands of 2 signatures each
SHINGLE_N = 2          # word bigrams
SIMHASH_BITS = 16

_ODD_HEX = ["1", "3", "5", "7", "9", "b", "d", "f"]


# --- exact dedup ---

@register(
    "dedup_exact",
    sql="""
    SELECT md5(text) AS content_hash, min(doc_id) AS canonical_id, count(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
    doc="training-data op: exact dedup via content-hash groupBy (canonical = min doc_id)",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", portable_md5(F.col("text")).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


@register(
    "dedup_exact_keep",
    sql="""
    SELECT doc_id FROM (
      SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS keeper
      FROM documents
    ) WHERE doc_id = keeper
    """,
    doc="training-data op: exact-dedup survivor set (keep canonical per content hash)",
)
def dedup_exact_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy(portable_md5(F.col("text")))
    return (
        docs.select("doc_id", F.min("doc_id").over(w).alias("keeper"))
        .filter(F.col("doc_id") == F.col("keeper"))
        .select("doc_id")
    )


# --- shared shingle/signature scaffolding ---

def _shingled(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = words_of(F.lower(F.trim(F.col("text"))))
    return docs.select(
        "doc_id",
        "lang",
        "n_chars",
        shingles_of(words, SHINGLE_N).alias("shingles"),
    ).filter(F.size("shingles") > 0)


_SH_SQL = """
      SELECT doc_id, lang, n_chars,
             [array_to_string((string_split(lower(trim(text)), ' '))[i:i+1], ' ')
              for i in range(1, len(string_split(lower(trim(text)), ' ')))] AS shingles
      FROM documents
      WHERE len(string_split(lower(trim(text)), ' ')) >= 2
"""

_SIG_COLS_SQL = ", ".join(
    f"list_min(list_transform(shingles, x -> md5('{s}|' || x))) AS sig{s}"
    for s in range(MINHASH_K)
)

_BAND_COLS_SQL = ", ".join(
    f"md5(sig{2 * b} || sig{2 * b + 1}) AS band{b}" for b in range(LSH_BANDS)
)

_BAND_OR_SQL = " OR ".join(f"a.band{b} = b.band{b}" for b in range(LSH_BANDS))


def _jaccard_cols(sa, sb):
    inter = F.size(F.array_intersect(sa, sb))
    union = F.size(F.array_union(sa, sb))
    return F.round(inter.cast("double") / union, 6)


# --- MinHash + LSH ---

@register(
    "dedup_minhash_lsh",
    sql=f"""
    WITH sh AS ({_SH_SQL}),
    sigs AS (
      SELECT doc_id, shingles, {_SIG_COLS_SQL} FROM sh
    ),
    banded AS (
      SELECT doc_id, shingles, {_BAND_COLS_SQL} FROM sigs
    ),
    cands AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b ON a.doc_id < b.doc_id AND ({_BAND_OR_SQL})
    )
    SELECT c.id_a, c.id_b,
           round(len(list_intersect(list_distinct(sa.shingles), list_distinct(sb.shingles)))::DOUBLE
                 / len(list_distinct(list_concat(sa.shingles, sb.shingles))), 6) AS jaccard
    FROM cands c
    JOIN sh sa ON sa.doc_id = c.id_a
    JOIN sh sb ON sb.doc_id = c.id_b
    """,
    doc="training-data op: MinHash+LSH near-dup candidates (k=8 sigs, 4 bands) with exact-Jaccard verify; Spark plan = explode bands + equi-join (scales), oracle = OR-join",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _shingled(spark, sf_dir).select("doc_id", "shingles")
    sigs = sh.select("doc_id", "shingles", *minhash_signature(F.col("shingles"), MINHASH_K))
    bands = sigs.select(
        "doc_id",
        "shingles",
        F.array(
            *[
                portable_md5(F.concat(F.col(f"sig{2 * b}"), F.col(f"sig{2 * b + 1}")))
                for b in range(LSH_BANDS)
            ]
        ).alias("bands"),
    )
    # scalable LSH plan: one row per (band_idx, band_hash), equi-join on both
    exploded = bands.select(
        "doc_id", F.posexplode("bands").alias("band_idx", "band_hash")
    )
    cands = (
        exploded.alias("a")
        .join(
            exploded.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"))
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            _jaccard_cols(F.col("sh_a"), F.col("sh_b")).alias("jaccard"),
        )
    )


# --- SimHash ---

@register(
    "dedup_simhash",
    sql=f"""
    WITH base AS (
      SELECT doc_id,
             list_transform(
               list_distinct(list_filter(string_split(lower(trim(text)), ' '), w -> w <> '')),
               w -> md5(w)) AS hashes
      FROM documents
    )
    SELECT doc_id,
           array_to_string(
             [CASE WHEN list_sum([CASE WHEN substr(h, j, 1) IN ('1','3','5','7','9','b','d','f')
                                       THEN 1 ELSE -1 END for h in hashes]) > 0
                   THEN '1' ELSE '0' END for j in range(1, {SIMHASH_BITS + 1})],
             '') AS simhash
    FROM base
    """,
    doc="training-data op: SimHash signature (bit votes over token md5 hex parity)",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = F.array_distinct(
        F.filter(words_of(F.lower(F.trim(F.col("text")))), lambda w: w != F.lit(""))
    )
    hashes = F.transform(words, portable_md5)
    bits = F.transform(
        F.sequence(F.lit(1), F.lit(SIMHASH_BITS)),
        lambda j: F.when(
            F.aggregate(
                hashes,
                F.lit(0),
                lambda acc, h: acc
                + F.when(F.substring(h, j, 1).isin(_ODD_HEX), 1).otherwise(-1),
            )
            > 0,
            F.lit("1"),
        ).otherwise(F.lit("0")),
    )
    return docs.select("doc_id", F.array_join(bits, "").alias("simhash"))


# --- exact n-gram Jaccard with blocking ---

@register(
    "dedup_ngram_jaccard",
    sql=f"""
    WITH sh AS ({_SH_SQL}),
    blocked AS (
      SELECT doc_id, lang, cast(floor(n_chars / 50) AS INT) AS blk,
             list_distinct(shingles) AS s
      FROM sh
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(len(list_intersect(a.s, b.s))::DOUBLE
                 / len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
    FROM blocked a JOIN blocked b
      ON a.lang = b.lang AND a.blk = b.blk AND a.doc_id < b.doc_id
    WHERE round(len(list_intersect(a.s, b.s))::DOUBLE
                / len(list_distinct(list_concat(a.s, b.s))), 6) >= 0.02
    """,
    doc="training-data op: exact n-gram Jaccard dedup with (lang, length-band) blocking",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _shingled(spark, sf_dir).select(
        "doc_id",
        "lang",
        F.floor(F.col("n_chars") / 50).cast("int").alias("blk"),
        F.array_distinct("shingles").alias("s"),
    )
    a = sh.select(
        F.col("doc_id").alias("id_a"),
        F.col("lang").alias("lang_a"),
        F.col("blk").alias("blk_a"),
        F.col("s").alias("s_a"),
    )
    b = sh.select(
        F.col("doc_id").alias("id_b"),
        F.col("lang").alias("lang_b"),
        F.col("blk").alias("blk_b"),
        F.col("s").alias("s_b"),
    )
    jac = _jaccard_cols(F.col("s_a"), F.col("s_b"))
    return (
        a.join(
            b,
            (F.col("lang_a") == F.col("lang_b"))
            & (F.col("blk_a") == F.col("blk_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.02)
    )
