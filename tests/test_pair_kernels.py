"""Focused tests for the r6 pair-enumeration arrow kernels.

The oracle-alignment suite pins end-to-end outputs at three SFs; these
tests pin the two invariants the kernels must hold INDEPENDENTLY of the
synthetic corpus, with inputs crafted to hit them:

- min-band dedup: a pair colliding in SEVERAL LSH bands must be emitted
  exactly once (in its first matching band), with the exact count;
- triangle tiling: a single hot block must produce exactly its
  m-choose-2 pairs once each across diagonal + cross tiles, whatever
  hash group each doc lands in.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF0001


def test_lsh_bucket_kernel_emits_multiband_pair_once(spark):
    """Two identical docs collide in ALL four bands; the min-band rule
    must emit their pair exactly once with the full intersection."""
    from onnxocr_ray_spark.operators.dedup import (
        _lsh_bucket_pair_counts,
        dedup_minhash_lsh,  # noqa: F401  (import keeps module registered)
    )

    rows = [
        (1, ["a b", "b c", "c d"], ["h0", "h1", "h2", "h3"]),
        (2, ["a b", "b c", "c d"], ["h0", "h1", "h2", "h3"]),  # all 4 collide
        (3, ["a b", "x y"], ["h0", "zz", "zz2", "zz3"]),       # band-0 only
    ]
    sh = spark.createDataFrame(
        rows, "doc_id long, shingles array<string>, bands array<string>"
    )
    ex = sh.select(
        "doc_id", "shingles", "bands",
        F.posexplode("bands").alias("band_idx", "band_hash"),
    )
    got = {
        (r.id_a, r.id_b): (r.sz_a, r.sz_b, r.c)
        for r in _lsh_bucket_pair_counts(ex).collect()
    }
    # each pair exactly once, with exact intersection counts
    assert got == {
        (1, 2): (3, 3, 3),   # identical docs — would appear 4x without dedup
        (1, 3): (3, 2, 1),
        (2, 3): (3, 2, 1),
    }


def test_ngram_tile_kernel_counts_hot_block_exactly(spark):
    """One (lang, blk) block of n docs sharing one common shingle plus a
    private one: every ordered pair must appear exactly once with c=1,
    across whatever diagonal/cross tiles the doc-hash grouping makes."""
    from onnxocr_ray_spark.operators.dedup import _ngram_block_pair_counts

    n = 40
    rows = []
    for i in range(n):
        for sh_v in ("common x", f"own {i}"):
            rows.append((i, "en", 7, 2, sh_v))
    ex = spark.createDataFrame(
        rows, "doc_id long, lang string, blk int, sz int, sh string"
    )
    out = _ngram_block_pair_counts(ex).collect()
    pairs = {(r.id_a, r.id_b): (r.s, r.c) for r in out}
    expect = {
        (a, b): (4, 1) for a in range(n) for b in range(a + 1, n)
    }
    assert pairs == expect, (len(pairs), len(expect))


def test_ngram_counting_paths_agree(spark):
    """The three counting strategies (BLAS matmul / bincount / chunked
    sort-unique) must produce identical rows on the same input — the
    fallbacks are the mega-block 100 TB path and only the caps choose
    between them."""
    from onnxocr_ray_spark.operators import dedup

    n = 30
    rows = []
    for i in range(n):
        for sh_v in ("common x", f"own {i}", "semi y" if i % 3 == 0 else f"o2 {i}"):
            rows.append((i, "en", 5, 3, sh_v))
    ex = spark.createDataFrame(
        rows, "doc_id long, lang string, blk int, sz int, sh string"
    )

    def run():
        out = dedup._ngram_block_pair_counts(ex).collect()
        return sorted((r.id_a, r.id_b, r.s, r.c) for r in out)

    mm_cap, bin_cap = dedup._NGRAM_MM_CAP, dedup._NGRAM_BIN_CAP
    try:
        ref = run()                       # matmul path
        assert ref, "degenerate fixture"
        dedup._NGRAM_MM_CAP = 0           # force bincount path
        assert run() == ref
        dedup._NGRAM_BIN_CAP = 0          # force chunked sort-unique path
        assert run() == ref
    finally:
        dedup._NGRAM_MM_CAP, dedup._NGRAM_BIN_CAP = mm_cap, bin_cap


def test_cluster_cos_kernel_matches_interpreted_cosine(spark):
    """The exact re-evaluation must be bit-identical to cosine_sim for
    vectors engineered to produce rounding-sensitive sums."""
    from onnxocr_ray_spark.functions import cosine_sim
    from onnxocr_ray_spark.operators.similarity import (
        _cluster_cos_candidates,
    )

    # awkward magnitudes so summation order matters in the last ulps
    vecs = [
        (0, 0, [1.0, 1e-9, 3.7, 1e8, 2.3e-5, 7.1] + [0.123456789] * 58),
        (1, 0, [0.9, 2e-9, 3.6, 1e8, 2.4e-5, 7.0] + [0.123456788] * 58),
        (2, 0, [1.1, 3e-9, 3.8, 1e8, 2.2e-5, 7.2] + [0.123456790] * 58),
    ]
    member = spark.createDataFrame(
        vecs, "vec_id long, cid long, v array<double>"
    )
    got = {
        (r.vec_id, r.ib): r.cos for r in _cluster_cos_candidates(member).collect()
    }
    a = member.alias("a")
    b = member.alias("b")
    ref = {
        (r.j, r.i): r.cos
        for r in a.join(b, F.col("a.vec_id") > F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("j"),
            F.col("b.vec_id").alias("i"),
            cosine_sim(F.col("a.v"), F.col("b.v")).alias("cos"),
        )
        .collect()
    }
    assert set(got) == set(ref)
    for k in ref:
        # bit-identical doubles, not approximately equal
        assert got[k] == ref[k], (k, got[k].hex(), ref[k].hex())
