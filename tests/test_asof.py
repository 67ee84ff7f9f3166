"""As-of join semantics: inclusive match, tie handling, inner vs left,
atomic payload carry."""

from __future__ import annotations

from churn_model_evaluation_platform_spark.operators.relational import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 5, "a"), (1, 10, "b"), (1, 3, "c"), (2, 7, "d"), (3, 1, "e")],
        "k int, ts int, tag string",
    )
    right = spark.createDataFrame(
        [(1, 4, 40.0), (1, 9, 90.0), (1, 10, 100.0), (2, 99, 990.0)],
        "k int, ts int, v double",
    )
    return left, right


def test_inner_asof_inclusive_and_latest(spark):
    left, right = _frames(spark)
    got = {
        r["tag"]: (r["asof_ts"], r["v"])
        for r in asof_join(left, right, ["k"], right_cols=["v"]).collect()
    }
    # ts=5 → right ts 4; ts=10 → right ts 10 (INCLUSIVE >=, latest wins)
    assert got == {"a": (4, 40.0), "b": (10, 100.0)}
    # "c" (ts 3 < first right 4), "d" (right only at 99 > 7), "e" (no
    # right rows for k=3) are all dropped in inner mode.


def test_left_asof_keeps_unmatched(spark):
    left, right = _frames(spark)
    got = {
        r["tag"]: r["asof_ts"]
        for r in asof_join(
            left, right, ["k"], right_cols=["v"], how="left"
        ).collect()
    }
    assert set(got) == {"a", "b", "c", "d", "e"}
    assert got["c"] is None and got["d"] is None and got["e"] is None


def test_interval_join_equals_naive_range_join(spark):
    import random

    from churn_model_evaluation_platform_spark.operators.relational import interval_join

    rng = random.Random(11)
    left = spark.createDataFrame(
        [(i, rng.randint(1, 3), rng.randint(0, 1000)) for i in range(300)],
        "lid int, k int, p long",
    )
    right = spark.createDataFrame(
        [
            (j, rng.randint(1, 3), s, s + rng.randint(1, 120))
            for j, s in ((j, rng.randint(0, 1000)) for j in range(60))
        ],
        "rid int, k int, ws long, we long",
    )
    naive = left.join(
        right,
        (left.k == right.k) & (left.p >= right.ws) & (left.p < right.we),
    ).select(left.lid, right.rid)
    bucketed = interval_join(
        left, right, ["k"], "p", "ws", "we", bucket_width=50
    ).select("lid", "rid")
    got = sorted((r["lid"], r["rid"]) for r in bucketed.collect())
    want = sorted((r["lid"], r["rid"]) for r in naive.collect())
    assert got == want and len(want) > 0


def test_payload_carried_atomically(spark):
    # Right payload with a null field must not inherit the field from an
    # older right row: the struct carry is atomic.
    left = spark.createDataFrame([(1, 10, "x")], "k int, ts int, tag string")
    right = spark.createDataFrame(
        [(1, 2, 20.0, "old"), (1, 8, None, "new")],
        "k int, ts int, v double, s string",
    )
    row = asof_join(left, right, ["k"], right_cols=["v", "s"]).first()
    assert row["asof_ts"] == 8
    assert row["v"] is None  # NOT 20.0 from the older row
    assert row["s"] == "new"
