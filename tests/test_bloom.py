"""Bloom membership sketch: determinism + the properties SQL can't state."""

import hashlib

from pyspark.sql import functions as F

from onnxocr_ray_spark.operators.bloom import (
    K_HASHES,
    M_BITS,
    WORD,
    bloom_probe,
    bloom_words,
)


def _py_position(key: int, j: int) -> int:
    h = hashlib.md5(f"bloom{j}|{key}".encode()).hexdigest()
    return int(h[:8], 16) % M_BITS


def _py_pass(key: int, words) -> bool:
    return all(
        (words[_py_position(key, j) // WORD] >> (_py_position(key, j) % WORD)) & 1
        for j in range(K_HASHES)
    )


def test_members_never_rejected_and_replica_agrees(spark):
    """Zero false negatives (the Bloom guarantee), and the Spark bit
    array equals an independent pure-Python replica bit-for-bit."""
    build_keys = list(range(0, 600, 3))
    build = spark.createDataFrame([(k,) for k in build_keys], "key long")
    words = bloom_words(build, "key")
    assert len(words) == M_BITS // WORD

    expect = [0] * (M_BITS // WORD)
    for k in build_keys:
        for j in range(K_HASHES):
            p = _py_position(k, j)
            expect[p // WORD] |= 1 << (p % WORD)
    assert words == expect

    probe_keys = list(range(600))  # members + interleaved non-members
    probe = spark.createDataFrame([(k,) for k in probe_keys], "key long")
    got = {r["key"]: r["bloom_pass"] for r in
           bloom_probe(probe, "key", words).collect()}
    members = set(build_keys)
    fps = 0
    for k in probe_keys:
        assert got[k] == _py_pass(k, words)      # engine == replica
        if k in members:
            assert got[k], f"false negative on member {k}"
        elif got[k]:
            fps += 1
    assert fps > 0  # m=4096 is sized so the sketch is non-vacuous here


def test_probe_is_projection_only(spark):
    """The probe side must reach bloom_pass with no join and no shuffle —
    the whole point of pushing a membership sketch into the scan."""
    build = spark.createDataFrame([(k,) for k in range(100)], "key long")
    words = bloom_words(build, "key")
    probe = spark.range(1000).select(F.col("id").alias("key"))
    plan = (
        bloom_probe(probe, "key", words)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert plan.lstrip().startswith("*(")  # codegen'd project end to end


# --- semantic-dedup skew stress (same file: small plan/scale guards) ---

def test_dedup_semantic_survives_one_giant_cluster(spark):
    """Boilerplate corpora funnel thousands of near-identical embeddings
    into ONE cluster — the worst case for cluster-blocked pairwise
    verify (candidates ~ cluster_size^2). 2k same-direction vectors must
    complete promptly with the exact SemDeDup outcome: every member
    except the lowest id dropped."""
    import time

    from pyspark.sql import functions as F

    from onnxocr_ray_spark.operators.similarity import (
        _SEMDEDUP_TAU,
        _cluster_cos_candidates,
        _ivf_assign,
    )

    n, dim = 2000, 8
    # vectors = e1 + tiny deterministic jitter on e2 (cosine ~ 1.0)
    rows = [(i, [1.0, (i % 97) * 1e-4] + [0.0] * (dim - 2)) for i in range(n)]
    e = spark.createDataFrame(rows, "vec_id long, v array<double>")
    c = e.filter(F.col("vec_id") < 1).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    # the production verify path (r6): per-cluster arrow kernel + exact
    # rounded threshold in the JVM — dedup_semantic's exact shape
    member = _ivf_assign(e, c).join(e, "vec_id")
    t0 = time.time()
    drops = (
        _cluster_cos_candidates(member)
        .filter(F.round(F.col("cos"), 6) >= F.lit(_SEMDEDUP_TAU))
        .select("vec_id")
        .distinct()
    )
    dropped = {r.vec_id for r in drops.collect()}
    wall = time.time() - t0
    kept = sorted(set(range(n)) - dropped)
    assert kept == [0]  # exactly the lowest id survives
    assert wall < 120, f"giant-cluster pairwise took {wall:.1f}s"
