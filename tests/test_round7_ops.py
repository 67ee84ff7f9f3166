"""Round-6 second batch operators: CDC MERGE, nearest as-of join,
PageRank / triangle counting, bloom runtime filter, OHLC bars. The
DuckDB differential (tools/diffcheck.py) proves engine parity on the
registry queries; these tests pin the operator SEMANTICS on hand-built
frames where every expected value is known by construction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.functions.bloom import (
    bloom_build,
    bloom_might_contain,
)
from churn_model_evaluation_platform_spark.operators.cdc import cdc_apply
from churn_model_evaluation_platform_spark.operators.graph import (
    pagerank,
    triangle_count,
)
from churn_model_evaluation_platform_spark.operators.relational import (
    asof_join_nearest,
)
from churn_model_evaluation_platform_spark.operators.timeseries import ohlc_bars


def test_cdc_apply_upsert_insert_delete_passthrough(spark):
    snap = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "c")],
        "k int, bal double, tag string",
    )
    # key 1: update then later delete (delete wins by seq);
    # key 2: older delete superseded by newer update;
    # key 4: pure insert (absent from snapshot);
    # key 3: untouched passthrough.
    changes = spark.createDataFrame(
        [
            (1, "U", 1, 11.0),
            (1, "D", 2, None),
            (2, "D", 1, None),
            (2, "U", 5, 22.0),
            (4, "U", 1, 40.0),
        ],
        "k int, op string, seq int, bal double",
    )
    out = cdc_apply(snap, changes, keys=["k"], order_cols=["seq"])
    assert out.columns == ["k", "bal", "tag"]
    rows = {r.k: (r.bal, r.tag) for r in out.collect()}
    assert rows == {
        2: (22.0, "b"),  # later update beats older delete
        3: (30.0, "c"),  # passthrough
        4: (40.0, None),  # insert; snapshot-only col null
    }  # key 1 deleted


def test_cdc_latest_change_ordering_is_composite(spark):
    # Same first order col — the second must break the tie.
    snap = spark.createDataFrame([(1, 0.0)], "k int, bal double")
    changes = spark.createDataFrame(
        [(1, "U", 7, 1, 100.0), (1, "U", 7, 2, 200.0)],
        "k int, op string, d int, seq int, bal double",
    )
    out = cdc_apply(snap, changes, keys=["k"], order_cols=["d", "seq"])
    assert out.collect()[0].bal == 200.0


def test_asof_nearest_prefers_backward_on_tie(spark):
    left = spark.createDataFrame(
        [(1, 10, 100), (2, 1, 100), (3, 99, 100)], "id int, ts int, k int"
    )
    right = spark.createDataFrame(
        [(8, 100, 0.8), (12, 100, 1.2), (50, 100, 5.0)],
        "ts int, k int, v double",
    )
    out = asof_join_nearest(
        left, right, ["k"], right_cols=["v"], ts_out="near_ts"
    )
    got = {r.id: (r.near_ts, r.v) for r in out.collect()}
    # id=1 at ts=10: back=8 (d=2), fwd=12 (d=2) → tie → backward.
    # id=2 at ts=1: no backward → forward 8.
    # id=3 at ts=99: back=50 nearer than nothing forward.
    assert got == {1: (8, 0.8), 2: (8, 0.8), 3: (50, 5.0)}


def test_asof_nearest_inner_drops_keyless_rows(spark):
    left = spark.createDataFrame([(1, 10, 9)], "id int, ts int, k int")
    right = spark.createDataFrame([(8, 100, 0.8)], "ts int, k int, v double")
    assert (
        asof_join_nearest(left, right, ["k"], right_cols=["v"]).count() == 0
    )
    assert (
        asof_join_nearest(
            left, right, ["k"], right_cols=["v"], how="left"
        ).count()
        == 1
    )


def test_pagerank_mass_conserved_and_symmetric(spark):
    # 4-cycle (symmetric, regular): PR must stay uniform = 1/4.
    e0 = [(0, 1), (1, 2), (2, 3), (3, 0)]
    edges = spark.createDataFrame(
        e0 + [(b, a) for a, b in e0], "src int, dst int"
    )
    pr = {r.id: r.pr for r in pagerank(edges, iters=5).collect()}
    assert all(abs(v - 0.25) < 1e-12 for v in pr.values()), pr
    # Total mass sums to 1 on any symmetrized graph.
    e1 = [(0, 1), (0, 2), (2, 3), (3, 4), (4, 0)]
    edges2 = spark.createDataFrame(
        e1 + [(b, a) for a, b in e1], "src int, dst int"
    )
    total = sum(r.pr for r in pagerank(edges2, iters=4).collect())
    assert abs(total - 1.0) < 1e-9


def test_pagerank_hub_ranks_highest(spark):
    # Star: center 0 linked to 1..5 (symmetrized) → center has max PR.
    e0 = [(0, i) for i in range(1, 6)]
    edges = spark.createDataFrame(
        e0 + [(b, a) for a, b in e0], "src int, dst int"
    )
    pr = {r.id: r.pr for r in pagerank(edges, iters=6).collect()}
    assert pr[0] == max(pr.values())
    leaf_vals = {round(pr[i], 12) for i in range(1, 6)}
    assert len(leaf_vals) == 1  # leaves identical by symmetry


@pytest.mark.parametrize(
    "edges,expected",
    [
        ([(1, 2), (2, 3), (1, 3)], 1),  # single triangle
        ([(1, 2), (2, 3), (3, 4)], 0),  # path
        # K4 = 4 triangles; hub vertex shared by all of them.
        ([(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)], 4),
    ],
)
def test_triangle_count_known_graphs(spark, edges, expected):
    df = spark.createDataFrame(edges, "a int, b int")
    assert triangle_count(df).collect()[0].n_triangles == expected


def test_bloom_no_false_negatives_property(spark):
    dim = spark.range(0, 200).select((F.col("id") * 13 + 5).alias("k"))
    words = bloom_build(dim, "k", m=2048)
    fact = spark.range(0, 5000).select(F.col("id").alias("k"))
    kept = {
        r.k
        for r in fact.where(bloom_might_contain("k", words, m=2048)).collect()
    }
    member = {13 * i + 5 for i in range(200)}
    assert member <= kept  # Bloom guarantee: zero false negatives
    # And it actually filters: at m/n ≈ 10 the fp rate is a few percent.
    assert len(kept) < 1500


def test_ohlc_bars_tiebreak_deterministic(spark):
    rows = [
        # same hour, duplicate timestamps — open/close decided by id
        ("a", "2024-01-01 10:00:05", 1, 5.0),
        ("a", "2024-01-01 10:00:05", 2, 9.0),
        ("a", "2024-01-01 10:59:59", 3, 2.0),
        ("a", "2024-01-01 10:59:59", 4, 7.0),
        ("a", "2024-01-01 11:00:00", 5, 3.0),
    ]
    df = spark.createDataFrame(
        rows, "k string, ts_s string, eid long, value double"
    ).select("k", F.to_timestamp("ts_s").alias("ts"), "eid", "value")
    out = ohlc_bars(df, ["k"], "ts", "value", "eid", bucket="hour")
    bars = {r.bar_ts.hour: r for r in out.collect()}
    b10 = bars[10]
    assert (b10.open, b10.high, b10.low, b10.close, b10.volume) == (
        5.0,
        9.0,
        2.0,
        7.0,
        4,
    )
    assert (bars[11].open, bars[11].close, bars[11].volume) == (3.0, 3.0, 1)


def test_pagerank_and_triangles_empty_graph(spark):
    edges = spark.createDataFrame([], "src int, dst int")
    assert pagerank(edges).count() == 0
    und = spark.createDataFrame([], "a int, b int")
    assert triangle_count(und).collect()[0].n_triangles == 0


def test_bloom_empty_build_side_rejects_everything(spark):
    dim = spark.range(0).select(F.col("id").alias("k"))
    words = bloom_build(dim, "k", m=1024)
    fact = spark.range(0, 100).select(F.col("id").alias("k"))
    assert fact.where(bloom_might_contain("k", words, m=1024)).count() == 0


def test_cdc_apply_empty_changes_is_identity(spark):
    snap = spark.createDataFrame([(1, 1.0, "a")], "k int, bal double, tag string")
    changes = spark.createDataFrame([], "k int, op string, seq int, bal double")
    rows = cdc_apply(snap, changes, keys=["k"], order_cols=["seq"]).collect()
    assert [(r.k, r.bal, r.tag) for r in rows] == [(1, 1.0, "a")]


def test_ohlc_bars_pre_1970_timestamps_order_correctly(spark):
    """Negative epoch micros format with a '-' sign under '%020d',
    which sorts before digits AND reverses within negatives — the 2^62
    bias restores lexicographic == chronological (ADVICE r6)."""
    rows = [
        # one hour entirely before 1970: open must be the earliest
        ("a", "1969-12-31 23:00:01", 1, 4.0),
        ("a", "1969-12-31 23:30:00", 2, 8.0),
        ("a", "1969-12-31 23:59:59", 3, 6.0),
        # a bar straddling nothing but mixing signs across bars
        ("a", "1970-01-01 00:00:01", 4, 1.0),
        ("a", "1970-01-01 00:30:00", 5, 9.0),
    ]
    df = spark.createDataFrame(
        rows, "k string, ts_s string, eid long, value double"
    ).select("k", F.to_timestamp("ts_s").alias("ts"), "eid", "value")
    out = ohlc_bars(df, ["k"], "ts", "value", "eid", bucket="hour")
    bars = {(r.bar_ts.year, r.bar_ts.hour): r for r in out.collect()}
    pre = bars[(1969, 23)]
    assert (pre.open, pre.close, pre.volume) == (4.0, 6.0, 3)
    post = bars[(1970, 0)]
    assert (post.open, post.close) == (1.0, 9.0)
