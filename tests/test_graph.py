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


def test_random_id_chain_matches_bruteforce(spark):
    """Pointer-jump chase (r15): a chain whose ids are NOT monotone
    along the path — the layout that defeats naive distance doubling —
    must still converge to the exact min-reachable labeling within
    max_iter, for several shuffled layouts."""
    import random

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        ids = list(range(1, 41))
        rng.shuffle(ids)
        # path through the shuffled ids + a second component
        edges = [(ids[i], ids[i + 1]) for i in range(len(ids) - 1)]
        edges += [(50, 51), (51, 52)]
        got = _components(spark, 52, edges)
        for v in ids:
            assert got[v] == 1, (seed, v, got[v])
        assert got[50] == got[51] == got[52] == 50
        for iso in (41, 42, 49):
            assert got[iso] == iso


def test_chase_labels_stay_in_component(spark):
    """The chase join must never leak a label across components:
    two interleaved chains (odd ids / even ids) sharing no edges."""
    odd = list(range(1, 40, 2))
    even = list(range(2, 41, 2))
    edges = [(odd[i], odd[i + 1]) for i in range(len(odd) - 1)]
    edges += [(even[i], even[i + 1]) for i in range(len(even) - 1)]
    got = _components(spark, 40, edges)
    assert all(got[v] == 1 for v in odd)
    assert all(got[v] == 2 for v in even)


def test_checkpoint_stats_do_not_compound(spark):
    """_without_origin_stats (r16): localCheckpoint preserves the
    origin plan's ESTIMATED sizeInBytes, and an iterative loop that
    checkpoints joins of the previous checkpoint compounds the
    estimate multiplicatively (the r15 'chase2 blowup': BigInteger
    exponents doubling per round until stats walks took minutes of
    driver time). The rebased frame must keep a bounded estimate and
    identical rows."""
    from pyspark.sql import functions as F

    from churn_model_evaluation_platform_spark.operators.graph import (
        _without_origin_stats,
    )

    df = spark.range(50).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    cur = _without_origin_stats(df.localCheckpoint(eager=True))
    for _ in range(4):
        nxt = (
            cur.alias("a")
            .join(cur.alias("b"), "k")
            .groupBy("k")
            .agg(F.count("*").alias("c"))
            .join(cur, "k")
            .select("id", "k")
            .distinct()
        )
        cur = _without_origin_stats(nxt.localCheckpoint(eager=True))
        stats = cur._jdf.queryExecution().optimizedPlan().stats().toString()
        # bounded: the conservative default (EiB range), never an
        # astronomical compounded product (E+NNN scientific form)
        assert "E+" not in stats, stats
    assert cur.count() == 50
