"""Engine-portable HyperLogLog (operators/sketch.py): register
construction, merge associativity/idempotence, accuracy envelope, and
the exact-integer indicator sum. Registry twins: hll_users_estimate,
hll_merge_daily, hll_users_by_type."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.operators.sketch import (
    HLL_P,
    hll_alpha,
    hll_distinct,
    hll_estimate,
    hll_merge,
    hll_registers,
)


def _ids(spark, values):
    return spark.createDataFrame([(v,) for v in values], "user_id long")


def _py_rho(value, p=HLL_P):
    h = int(hashlib.md5(str(value).encode()).hexdigest()[:15], 16)
    w = 60 - p
    v = h >> p
    return h % (1 << p), (w - v.bit_length() + 1) if v > 0 else w + 1


def test_registers_match_python_reference(spark):
    vals = [1, 2, 3, 42, 99999]
    got = {
        r["bucket"]: r["rho"]
        for r in hll_registers(_ids(spark, vals), "user_id").collect()
    }
    expect: dict[int, int] = {}
    for v in vals:
        b, r = _py_rho(v)
        expect[b] = max(expect.get(b, 0), r)
    assert got == expect


def test_nulls_skipped_and_duplicates_free(spark):
    df = spark.createDataFrame(
        [(1,), (1,), (None,), (2,)], "user_id long"
    )
    est_dup = hll_distinct(df, "user_id").collect()[0]["hll_estimate"]
    est_uniq = hll_distinct(
        _ids(spark, [1, 2]), "user_id"
    ).collect()[0]["hll_estimate"]
    assert est_dup == est_uniq  # sketch state depends only on the SET


def test_merge_equals_oneshot_on_any_split(spark):
    vals = list(range(2000))
    df = _ids(spark, vals).withColumn(
        "part", (F.col("user_id") % 7).cast("int")
    )
    partials = hll_registers(df, "user_id", group_cols=["part"])
    merged = hll_estimate(hll_merge(partials.select("bucket", "rho")))
    oneshot = hll_distinct(_ids(spark, vals), "user_id")
    assert (
        merged.collect()[0]["hll_estimate"]
        == oneshot.collect()[0]["hll_estimate"]
    )


def test_merge_idempotent(spark):
    regs = hll_registers(_ids(spark, range(500)), "user_id")
    doubled = hll_merge(regs.unionByName(regs))
    assert (
        hll_estimate(doubled).collect()[0]["hll_estimate"]
        == hll_estimate(regs).collect()[0]["hll_estimate"]
    )


def test_accuracy_envelope_across_cardinalities(spark):
    # m=1024 → std error ~3.25%; allow 4 sigma (the md5 'randomness'
    # is fixed, so this is a deterministic regression pin, not a flaky
    # statistical test).
    for n in (50, 500, 5000, 50000):
        est = hll_distinct(_ids(spark, range(n)), "user_id").collect()[0][
            "hll_estimate"
        ]
        assert abs(est - n) / n < 4 * 1.04 / math.sqrt(1024), (n, est)


def test_small_range_uses_linear_counting(spark):
    # 3 distinct values: E_raw ≤ 2.5m with zeros present → the
    # estimate must be m·ln(m/zeros), which for distinct buckets is
    # near-exact.
    m = 1 << HLL_P
    est = hll_distinct(_ids(spark, [7, 8, 9]), "user_id").collect()[0][
        "hll_estimate"
    ]
    regs = hll_registers(_ids(spark, [7, 8, 9]), "user_id").count()
    assert est == round(m * math.log(m / (m - regs)), 4)


def test_alpha_closed_form():
    assert hll_alpha(10) == 0.7213 / (1.0 + 1.079 / 1024)


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------


def test_cms_overestimates_never_under(spark):
    from churn_model_evaluation_platform_spark.operators.sketch import (
        cms_counters,
        cms_estimate,
    )

    # Zipf-ish stream: value v appears (200 // (v+1)) times.
    rows = [(v,) for v in range(100) for _ in range(200 // (v + 1))]
    df = spark.createDataFrame(rows, "user_id long")
    probes = spark.createDataFrame(
        [(v,) for v in range(100)] + [(123456,)], "probe long"
    )
    est = {
        r["probe"]: r["cms_estimate"]
        for r in cms_estimate(cms_counters(df, "user_id"), probes).collect()
    }
    exact: dict[int, int] = {}
    for (v,) in rows:
        exact[v] = exact.get(v, 0) + 1
    n = len(rows)
    for v in range(100):
        assert est[v] >= exact[v], v  # one-sided guarantee
        assert est[v] - exact[v] <= 2.718 / 512 * n * 4 + 1, v  # ~4x eps slack
    assert est[123456] >= 0  # absent key: pure collision mass


def test_cms_merge_partials_equals_oneshot(spark):
    from churn_model_evaluation_platform_spark.operators.sketch import (
        cms_counters,
        cms_estimate,
        cms_merge,
    )

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(v % 37,) for v in range(1500)], "user_id long"
    )
    halves = [
        cms_counters(df.where(F.col("user_id") % 2 == i), "user_id")
        for i in (0, 1)
    ]
    merged = cms_merge(halves[0].unionByName(halves[1]))
    oneshot = cms_counters(df, "user_id")
    probes = spark.createDataFrame([(v,) for v in range(37)], "probe long")
    em = {
        r["probe"]: r["cms_estimate"]
        for r in cms_estimate(merged, probes).collect()
    }
    eo = {
        r["probe"]: r["cms_estimate"]
        for r in cms_estimate(oneshot, probes).collect()
    }
    assert em == eo


def test_cms_exact_when_no_collisions(spark):
    from churn_model_evaluation_platform_spark.operators.sketch import (
        cms_counters,
        cms_estimate,
    )

    # 3 keys in 512 buckets: if ANY of the 4 rows separates them, the
    # min is exact. Verify estimates equal truth for this fixture.
    df = spark.createDataFrame(
        [(1,)] * 5 + [(2,)] * 3 + [(3,)], "user_id long"
    )
    probes = spark.createDataFrame([(1,), (2,), (3,)], "probe long")
    est = {
        r["probe"]: r["cms_estimate"]
        for r in cms_estimate(cms_counters(df, "user_id"), probes).collect()
    }
    assert est == {1: 5, 2: 3, 3: 1}


# ---------------------------------------------------------------------------
# bottom-k / KMV
# ---------------------------------------------------------------------------


def test_kmv_small_range_is_exact(spark):
    from churn_model_evaluation_platform_spark.operators.sketch import (
        bottomk_sketch,
        kmv_estimate,
    )

    row = kmv_estimate(
        bottomk_sketch(_ids(spark, range(40)), "user_id")
    ).collect()[0]
    assert row["n_sketch"] == 40
    assert row["kmv_estimate"] == 40.0  # non-full sketch IS the set


def test_kmv_matches_python_reference_and_envelope(spark):
    from churn_model_evaluation_platform_spark.operators.sketch import (
        bottomk_sketch,
        kmv_estimate,
    )

    n, k = 5000, 64
    hs = sorted(
        int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        for v in range(n)
    )
    expect = round((k - 1) * float(16**15) / hs[k - 1], 4)
    row = kmv_estimate(
        bottomk_sketch(_ids(spark, range(n)), "user_id")
    ).collect()[0]
    assert row["kmv_estimate"] == expect
    assert abs(row["kmv_estimate"] - n) / n < 4 / math.sqrt(k - 2)


def test_bottomk_merge_idempotent_and_equals_oneshot(spark):
    from churn_model_evaluation_platform_spark.operators.sketch import (
        bottomk_merge,
        bottomk_sketch,
        kmv_estimate,
    )

    df = _ids(spark, range(3000))
    halves = [
        bottomk_sketch(df.where(F.col("user_id") % 2 == i), "user_id")
        for i in (0, 1)
    ]
    merged = bottomk_merge(
        halves[0].unionByName(halves[1]).unionByName(halves[0])  # re-delivery
    )
    em = kmv_estimate(merged).collect()[0]["kmv_estimate"]
    eo = kmv_estimate(bottomk_sketch(df, "user_id")).collect()[0][
        "kmv_estimate"
    ]
    assert em == eo


def test_bottomk_is_uniform_distinct_sample(spark):
    from churn_model_evaluation_platform_spark.operators.sketch import (
        bottomk_sketch,
    )

    # duplicates must not bias the sample: sketch of the multiset ==
    # sketch of the set
    dup = spark.createDataFrame(
        [(v % 50,) for v in range(2000)], "user_id long"
    )
    uniq = _ids(spark, range(50))
    sd = sorted(r["v"] for r in bottomk_sketch(dup, "user_id").collect())
    su = sorted(r["v"] for r in bottomk_sketch(uniq, "user_id").collect())
    assert sd == su


def test_cms_heavy_hitters_no_false_negatives(spark):
    from churn_model_evaluation_platform_spark.operators.sketch import (
        cms_counters,
        cms_estimate,
    )

    # heavy keys 0..4 (200 each) + 500 singleton keys; floor 100:
    # every true HH must clear the estimate filter (est >= true).
    rows = [(v,) for v in range(5) for _ in range(200)]
    rows += [(1000 + v,) for v in range(500)]
    df = spark.createDataFrame(rows, "user_id long")
    probes = df.select(F.col("user_id").alias("probe")).distinct()
    est = cms_estimate(cms_counters(df, "user_id"), probes)
    passed = {
        r["probe"] for r in est.where("cms_estimate >= 100").collect()
    }
    assert set(range(5)) <= passed  # guarantee: no true HH missing


def test_kmv_jaccard_estimator_envelope(spark):
    from churn_model_evaluation_platform_spark.operators.sketch import (
        bottomk_merge,
        bottomk_sketch,
    )

    # A = 0..999, B = 500..1499 → true J = 1/3; k=64 minwise estimate
    # within ~4/sqrt(k) absolute.
    a = bottomk_sketch(_ids(spark, range(1000)), "user_id").select("hv")
    b = bottomk_sketch(_ids(spark, range(500, 1500)), "user_id").select(
        "hv"
    )
    u = bottomk_merge(a.unionByName(b)).select("hv")
    both = (
        u.join(a, "hv", "leftsemi").join(b, "hv", "leftsemi").count()
    )
    n_u = u.count()
    assert n_u == 64
    assert abs(both / n_u - 1 / 3) < 4 / math.sqrt(64)


# ---------------------------------------------------------------------------
# property: merge == one-shot over ARBITRARY partitionings
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@given(
    values=st.lists(
        st.integers(min_value=0, max_value=10_000), min_size=1, max_size=300
    ),
    n_parts=st.integers(min_value=1, max_value=5),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_property_hll_merge_any_partitioning(spark, values, n_parts, seed):
    import random as _random

    from churn_model_evaluation_platform_spark.operators.sketch import (
        hll_distinct,
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    rng = _random.Random(seed)
    parts: list[list[int]] = [[] for _ in range(n_parts)]
    for v in values:
        parts[rng.randrange(n_parts)].append(v)
    regs = None
    for p in parts:
        if not p:
            continue
        r = hll_registers(_ids(spark, p), "user_id")
        regs = r if regs is None else regs.unionByName(r)
    merged = hll_estimate(hll_merge(regs)).collect()[0]["hll_estimate"]
    oneshot = hll_distinct(_ids(spark, values), "user_id").collect()[0][
        "hll_estimate"
    ]
    assert merged == oneshot


# ---------------------------------------------------------------------------
# histogram quantile sketch
# ---------------------------------------------------------------------------


def test_hist_quantile_hand_computed(spark):
    from churn_model_evaluation_platform_spark.operators.sketch import (
        hist_quantiles,
        hist_registers,
    )

    # 10 values 0..9 into 10 bins over [0, 10): bin i holds value i.
    df = spark.createDataFrame([(float(v),) for v in range(10)], "value double")
    regs = hist_registers(df, "value", 0.0, 10.0, nbins=10)
    est = {
        r["q"]: r["hist_estimate"]
        for r in hist_quantiles(regs, [0.5, 1.0], 0.0, 10.0, nbins=10).collect()
    }
    # q=0.5 → target 5; first bin with cum>=5 is bin 4 (cum 5):
    # est = 4 + 1*(5-4)/1 = 5.0; q=1.0 → bin 9, est = 10.0.
    assert est[0.5] == 5.0
    assert est[1.0] == 10.0


def test_hist_quantile_error_bounded_by_bin_width(spark):
    from churn_model_evaluation_platform_spark.operators.sketch import (
        HIST_BINS,
        hist_quantiles,
        hist_registers,
    )

    vals = [(float((v * 37) % 500) + 0.5,) for v in range(5000)]
    df = spark.createDataFrame(vals, "value double")
    regs = hist_registers(df, "value", 0.0, 500.0)
    w = 500.0 / HIST_BINS
    exact = {
        0.5: sorted(v[0] for v in vals)[2500],
        0.9: sorted(v[0] for v in vals)[4500],
    }
    for r in hist_quantiles(regs, [0.5, 0.9], 0.0, 500.0).collect():
        assert abs(r["hist_estimate"] - exact[r["q"]]) <= w + 1e-9


def test_hist_merge_equals_oneshot_and_clamping(spark):
    from churn_model_evaluation_platform_spark.operators.sketch import (
        hist_merge,
        hist_quantiles,
        hist_registers,
    )

    # include out-of-range values: they clamp to edge bins and stay
    # rank-correct
    vals = [(-50.0,), (600.0,)] + [(float(v % 100),) for v in range(1000)]
    df = spark.createDataFrame(vals, "value double")
    halves = [
        hist_registers(
            df.where((F.col("value").cast("int") % 2) == i),
            "value",
            0.0,
            100.0,
        )
        for i in (0, 1)
    ]
    merged = hist_quantiles(
        hist_merge(halves[0].unionByName(halves[1])), [0.5], 0.0, 100.0
    ).collect()[0]["hist_estimate"]
    oneshot = hist_quantiles(
        hist_registers(df, "value", 0.0, 100.0), [0.5], 0.0, 100.0
    ).collect()[0]["hist_estimate"]
    assert merged == oneshot


@given(
    values=st.lists(
        st.integers(min_value=0, max_value=200), min_size=1, max_size=300
    ),
    n_parts=st.integers(min_value=1, max_value=4),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_property_cms_and_hist_merge_any_partitioning(
    spark, values, n_parts, seed
):
    import random as _random

    from churn_model_evaluation_platform_spark.operators.sketch import (
        cms_counters,
        cms_estimate,
        cms_merge,
        hist_merge,
        hist_quantiles,
        hist_registers,
    )

    rng = _random.Random(seed)
    parts: list[list[int]] = [[] for _ in range(n_parts)]
    for v in values:
        parts[rng.randrange(n_parts)].append(v)
    frames = [
        spark.createDataFrame([(v,) for v in p], "user_id long")
        for p in parts
        if p
    ]
    full = spark.createDataFrame([(v,) for v in values], "user_id long")

    cms_parts = None
    for f in frames:
        c = cms_counters(f, "user_id")
        cms_parts = c if cms_parts is None else cms_parts.unionByName(c)
    probes = spark.createDataFrame(
        [(v,) for v in sorted(set(values))[:20]], "probe long"
    )
    em = {
        r["probe"]: r["cms_estimate"]
        for r in cms_estimate(cms_merge(cms_parts), probes).collect()
    }
    eo = {
        r["probe"]: r["cms_estimate"]
        for r in cms_estimate(cms_counters(full, "user_id"), probes).collect()
    }
    assert em == eo

    h_parts = None
    for f in frames:
        h = hist_registers(
            f.select(F.col("user_id").cast("double").alias("value")),
            "value", 0.0, 200.0, nbins=32,
        )
        h_parts = h if h_parts is None else h_parts.unionByName(h)
    hm = hist_quantiles(
        hist_merge(h_parts), [0.5], 0.0, 200.0, nbins=32
    ).collect()[0]["hist_estimate"]
    ho = hist_quantiles(
        hist_registers(
            full.select(F.col("user_id").cast("double").alias("value")),
            "value", 0.0, 200.0, nbins=32,
        ),
        [0.5], 0.0, 200.0, nbins=32,
    ).collect()[0]["hist_estimate"]
    assert hm == ho


def test_hist_extreme_outliers_clamp_not_wrap(spark):
    from churn_model_evaluation_platform_spark.operators.sketch import (
        hist_registers,
    )

    # values billions of bin-widths out of range must land in the edge
    # bins (a bigint->int cast wrap would put them in interior bins)
    df = spark.createDataFrame(
        [(8.39e9,), (-8.39e9,), (50.0,)], "value double"
    )
    got = {
        r["bin"]: r["c"]
        for r in hist_registers(df, "value", 0.0, 500.0, nbins=256).collect()
    }
    assert got == {255: 1, 0: 1, 25: 1}
