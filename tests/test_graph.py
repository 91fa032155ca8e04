"""Connected-components propagation + KMV sketch unit tests (the oracle
comparison runs in test_oracle_alignment; these pin the parts the corpus
cannot exercise — transitive chains deeper than one hop)."""

from onnxocr_ray_spark.operators.graph import min_label_propagate


def _cc(spark, node_ids, pair_list):
    nodes = spark.createDataFrame([(i,) for i in node_ids], "doc_id long")
    pairs = spark.createDataFrame(
        [(a, b) for a, b in pair_list] or [(None, None)],
        "id_a long, id_b long",
    )
    if not pair_list:
        pairs = pairs.filter("id_a is not null")
    out = min_label_propagate(nodes, pairs)
    return {r.doc_id: r.canonical_id for r in out.collect()}


def test_chain_propagates_transitively(spark):
    # 1-2, 2-3, 3-4, 4-5: 1-hop min would give 3 -> 2; full CC gives 1
    got = _cc(spark, [1, 2, 3, 4, 5, 9], [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 9: 9}


def test_two_components_and_isolates(spark):
    got = _cc(spark, list(range(1, 9)), [(1, 3), (3, 5), (2, 4), (4, 6)])
    assert got == {1: 1, 3: 1, 5: 1, 2: 2, 4: 2, 6: 2, 7: 7, 8: 8}


def test_no_edges_all_self_canonical(spark):
    got = _cc(spark, [10, 20, 30], [])
    assert got == {10: 10, 20: 20, 30: 30}
