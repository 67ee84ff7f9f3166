"""Property-based tier for the round-6 data-platform operators: CDC
MERGE vs a dict-based python reference, nearest as-of vs brute force,
OHLC vs sorted-list reference. Example counts small — each runs real
Spark jobs."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.operators.cdc import cdc_apply
from churn_model_evaluation_platform_spark.operators.relational import (
    asof_join_nearest,
)
from churn_model_evaluation_platform_spark.operators.timeseries import ohlc_bars

SETTINGS = settings(max_examples=5, deadline=None)

change = st.tuples(
    st.integers(min_value=0, max_value=5),  # key
    st.sampled_from(["U", "D"]),
    st.floats(min_value=-100, max_value=100, allow_nan=False),
)


@SETTINGS
@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=5),
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        max_size=6,
    ),
    st.lists(change, max_size=12),
)
def test_cdc_apply_matches_dict_reference(spark, snap0, changes):
    snap = spark.createDataFrame(
        [(k, v) for k, v in snap0.items()] or [(99, 0.0)],
        "k int, bal double",
    )
    if not snap0:
        snap = snap.where(F.lit(False))
    rows = [
        (k, op, seq, float(v)) for seq, (k, op, v) in enumerate(changes)
    ]
    ch = spark.createDataFrame(
        rows or [(0, "U", 0, 0.0)], "k int, op string, seq int, bal double"
    )
    if not rows:
        ch = ch.where(F.lit(False))
    got = {
        r.k: r.bal
        for r in cdc_apply(snap, ch, keys=["k"], order_cols=["seq"]).collect()
    }
    # Reference: latest change per key wins.
    state = dict(snap0)
    last: dict[int, tuple[str, float]] = {}
    for k, op, v in changes:
        last[k] = (op, float(v))
    for k, (op, v) in last.items():
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = v
    assert got == state


ts_int = st.integers(min_value=0, max_value=50)


@SETTINGS
@given(
    st.lists(ts_int, min_size=1, max_size=15, unique=True),
    st.lists(ts_int, min_size=0, max_size=10, unique=True),
)
def test_asof_nearest_matches_bruteforce(spark, lts, rts):
    left = spark.createDataFrame(
        [(i, t, 1) for i, t in enumerate(lts)], "id int, ts int, k int"
    )
    right = spark.createDataFrame(
        [(t, 1, float(t)) for t in rts] or [(0, 2, 0.0)],
        "ts int, k int, v double",
    )
    if not rts:
        right = right.where(F.lit(False))
    got = {
        r.id: r.near_ts
        for r in asof_join_nearest(
            left, right, ["k"], right_cols=["v"], ts_out="near_ts"
        ).collect()
    }
    want = {}
    for i, t in enumerate(lts):
        if rts:
            # min distance; ties -> the EARLIER right timestamp
            want[i] = min(rts, key=lambda r: (abs(r - t), r))
    assert got == want


@SETTINGS
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=7199),  # seconds offset
            st.floats(min_value=-50, max_value=50, allow_nan=False),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_ohlc_matches_sorted_reference(spark, points):
    rows = [
        ("k", f"2024-01-01 0{off // 3600}:{(off % 3600) // 60:02d}:{off % 60:02d}", i, float(v))
        for i, (off, v) in enumerate(points)
    ]
    df = spark.createDataFrame(
        rows, "k string, ts_s string, eid long, value double"
    ).select("k", F.to_timestamp("ts_s").alias("ts"), "eid", "value")
    out = {
        r.bar_ts.hour: (r.open, r.high, r.low, r.close, r.volume)
        for r in ohlc_bars(df, ["k"], "ts", "value", "eid").collect()
    }
    by_hour: dict[int, list] = {}
    for i, (off, v) in enumerate(points):
        by_hour.setdefault(off // 3600, []).append((off, i, float(v)))
    for h, pts in by_hour.items():
        pts.sort()
        vals = [v for _, _, v in pts]
        assert out[h] == (pts[0][2], max(vals), min(vals), pts[-1][2], len(pts))
