"""Connected components: chains (worst-case diameter), stars,
singletons, and the pairs→clusters dedup composition."""

from __future__ import annotations

from churn_model_evaluation_platform_spark.operators.graph import (
    connected_components,
)


def _components(spark, n_vertices, edge_list):
    vertices = spark.createDataFrame(
        [(i,) for i in range(1, n_vertices + 1)], ["id"]
    )
    edges = spark.createDataFrame(edge_list, ["src", "dst"])
    return {
        r["id"]: r["component"]
        for r in connected_components(vertices, edges).collect()
    }


def test_chain_converges_to_min(spark):
    # 1-2-3-4-5-6 chain: diameter 5, every vertex must reach label 1
    got = _components(spark, 6, [(i, i + 1) for i in range(1, 6)])
    assert got == {i: 1 for i in range(1, 7)}


def test_star_and_singletons(spark):
    # star centered at 4 (edges point outward), vertices 8..10 isolated
    got = _components(spark, 10, [(4, 5), (4, 6), (4, 7)])
    assert got[4] == got[5] == got[6] == got[7] == 4
    for iso in (1, 2, 3, 8, 9, 10):
        assert got[iso] == iso


def test_two_components_merge_via_bridge(spark):
    got = _components(spark, 6, [(1, 2), (3, 4), (5, 6), (2, 3)])
    assert got[1] == got[2] == got[3] == got[4] == 1
    assert got[5] == got[6] == 5


def test_dedup_clusters_composition(spark):
    """Near-identical docs land in one cluster keyed by the min doc id;
    the canonical doc is doc_id == cluster_id."""
    from churn_model_evaluation_platform_spark.operators.dedup import (
        lsh_verified_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base),
        (2, base + " extra"),
        (3, "completely different content about spark engines and parquet"),
        (4, base),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = lsh_verified_pairs(docs, n=3, threshold=0.5)
    comp = connected_components(
        docs.select("doc_id"),
        pairs.selectExpr("id_a AS src", "id_b AS dst"),
        id_col="doc_id",
    )
    got = {r["id"]: r["component"] for r in comp.collect()}
    assert got[1] == got[2] == got[4] == 1
    assert got[3] == 3
    canonical = sorted(i for i, c in got.items() if i == c)
    assert canonical == [1, 3]
