"""Deterministic cross-engine Bloom filter: the membership sketch.

Completes the sketch family (KMV = distinct count, fixed-bin histogram =
quantiles) with set MEMBERSHIP — the sketch behind runtime join
pruning: build a tiny bit array over the build side's keys, push it
into the probe side's scan as a pure projection, and only the rows that
pass (all true members + a quantified false-positive fraction) ever
reach the expensive exact join/shuffle. At 100 TB this is the standard
way to cut a probe table by orders of magnitude before the first
Exchange; Spark's own AQE runtime filter is this exact shape, but
opaque and non-portable — this one is bit-reproducible on any engine.

Determinism contract (same idiom as KMV/sampling): position j of key =
``md5('bloom' || j || '|' || key)`` high 32 hex bits mod m. Both engines
compute the identical bit array, so bloom_pass — including which
non-members false-positive — is EXACTLY checkable by the DuckDB oracle,
not just statistically.

Scale design:
- build: distinct -> explode k positions -> groupBy word -> bit_or.
  Two bounded shuffles; partial aggregation makes the final state
  m/32 words (m fixed by design, independent of row count).
- probe: the m/32-word filter is collected (bounded, like the KMV
  k-mins) and embedded as an array LITERAL, so the probe is a
  whole-stage-codegen projection — zero joins, zero shuffles, zero
  Python on the probe side (plan-asserted in tests).
- m here is deliberately small (4096 bits) so the sf0.01 corpus
  produces REAL false positives the oracle must reproduce bit-for-bit;
  a production build sizes m ~ 10 bits/key and stays broadcastable
  (1 GB filter = 10^9 keys).
"""

from __future__ import annotations

from typing import List

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from onnxocr_ray_spark.functions import portable_md5
from onnxocr_ray_spark.registry import register
from onnxocr_ray_spark.sources.tables import load_table

M_BITS = 4096   # filter size (small on purpose: exercises false positives)
K_HASHES = 3
WORD = 32       # bits per word: values < 2^32 stay positive in a BIGINT
                # on BOTH engines (no sign-bit divergence)


def _position(key: Column, j: int) -> Column:
    h = portable_md5(F.concat(F.lit(f"bloom{j}|"), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % M_BITS


def bloom_build(df: DataFrame, key_col: str) -> DataFrame:
    """Build-side keys -> (word int, bits long): the m-bit filter as
    m/32 or-ed words. Bounded output regardless of input rows."""
    keys = df.select(F.col(key_col).alias("key")).distinct()
    pos = keys.select(
        F.explode(
            F.array(*[_position(F.col("key"), j) for j in range(K_HASHES)])
        ).alias("p")
    )
    # shiftleft/shiftright need column shift amounts -> SQL expr form
    # (still JVM whole-stage codegen)
    return pos.groupBy(
        F.expr(f"CAST(p DIV {WORD} AS INT)").alias("word")
    ).agg(
        F.expr(
            f"bit_or(shiftleft(CAST(1 AS BIGINT), CAST(p % {WORD} AS INT)))"
        ).alias("bits")
    )


def bloom_words(df: DataFrame, key_col: str) -> List[int]:
    """The filter as a dense m/32-long word list (bounded collect —
    the sketch state, same footprint logic as the KMV k-mins)."""
    dense = [0] * (M_BITS // WORD)
    for row in bloom_build(df, key_col).collect():
        dense[row["word"]] = row["bits"]
    return dense


def bloom_probe(probe: DataFrame, key_col: str, words: List[int]) -> DataFrame:
    """Adds ``bloom_pass``: all k positions set. Pure projection — the
    filter rides along as an array literal; no join, no shuffle."""
    arr = F.array(*[F.lit(int(w)).cast("long") for w in words])
    out = probe.withColumn("_arr", arr)
    for j in range(K_HASHES):
        out = out.withColumn(f"_p{j}", _position(F.col(key_col), j))
    hit = " AND ".join(
        f"(shiftright(element_at(_arr, CAST(_p{j} DIV {WORD} AS INT) + 1), "
        f"CAST(_p{j} % {WORD} AS INT)) & 1) = 1"
        for j in range(K_HASHES)
    )
    return out.withColumn("bloom_pass", F.expr(hit)).drop(
        "_arr", *[f"_p{j}" for j in range(K_HASHES)]
    )


@register(
    "bloom_semi_join",
    priority=14,  # new this round: into the checked window
    sql=f"""
    WITH js AS (SELECT * FROM (VALUES (0), (1), (2)) t(j)),
    keys AS (SELECT DISTINCT o_custkey FROM orders
             WHERE o_orderpriority LIKE '1%'),
    pos AS (
        SELECT CAST(('0x' || substr(md5('bloom' || CAST(j AS VARCHAR) || '|'
                       || CAST(o_custkey AS VARCHAR)), 1, 8)) AS BIGINT)
               % {M_BITS} AS p
        FROM keys CROSS JOIN js
    ),
    filt AS (
        SELECT p // {WORD} AS word,
               bit_or(CAST(1 AS BIGINT) << CAST(p % {WORD} AS INTEGER)) AS bits
        FROM pos GROUP BY 1
    ),
    probe AS (
        SELECT c_custkey, j,
               CAST(('0x' || substr(md5('bloom' || CAST(j AS VARCHAR) || '|'
                       || CAST(c_custkey AS VARCHAR)), 1, 8)) AS BIGINT)
               % {M_BITS} AS p
        FROM customer CROSS JOIN js
    ),
    hits AS (
        SELECT pr.c_custkey,
               sum(CASE WHEN (f.bits >> CAST(pr.p % {WORD} AS INTEGER)) & 1 = 1
                        THEN 1 ELSE 0 END) AS nhit
        FROM probe pr LEFT JOIN filt f ON pr.p // {WORD} = f.word
        GROUP BY pr.c_custkey
    )
    SELECT h.c_custkey,
           h.nhit = {K_HASHES} AS bloom_pass,
           EXISTS (SELECT 1 FROM keys k
                   WHERE k.o_custkey = h.c_custkey) AS is_member
    FROM hits h
    ORDER BY h.c_custkey
    """,
    doc=(
        "training-data op: deterministic Bloom-filter membership sketch — "
        "build a 4096-bit filter over the urgent-priority orders' custkeys "
        "(distinct -> k=3 md5 positions -> bit_or words; the subset makes "
        "real non-members exist at every SF), probe every customer as a "
        "pure codegen projection (the filter is an array literal; zero "
        "probe-side shuffle). The oracle reproduces the bit array exactly, "
        "so the check covers the false-positive rows bit-for-bit (52 FPs "
        "at sf0.01), not just true members."
    ),
)
def bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").like("1%")
    )
    customer = load_table(spark, sf_dir, "customer")
    words = bloom_words(urgent, "o_custkey")
    probed = bloom_probe(customer.select("c_custkey"), "c_custkey", words)
    members = urgent.select(F.col("o_custkey").alias("c_custkey")).distinct()
    return (
        probed.join(
            F.broadcast(members.withColumn("is_member", F.lit(True))),
            "c_custkey", "left")
        .select(
            "c_custkey",
            "bloom_pass",
            F.coalesce("is_member", F.lit(False)).alias("is_member"),
        )
        .orderBy("c_custkey")
    )
