"""Round-6 registry queries: scale-technique flagships (salted join,
bucketed co-located join, stream-stream join) and monitoring analytics
(trend / anomaly / SCD2). The DuckDB differential (tools/diffcheck.py)
proves engine parity; these tests pin the PLAN shapes and the
semantics against independent in-process recomputations."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.plans.registry_ext6 import (
    q_join_bucketed,
    q_metric_anomaly,
    q_metric_trend,
    q_scd2_intervals,
    q_skew_join_salted,
    q_stream_stream_join,
)
from churn_model_evaluation_platform_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"


def test_join_bucketed_single_exchange_and_matches_plain(spark):
    # Force the sort-merge path: a broadcastable dim would hide the
    # bucketing (and at 100 TB neither side broadcasts).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = q_join_bucketed(spark, SF)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the ONLY exchange is the final 5-group aggregation; the join
        # itself reads co-located buckets
        assert plan.count("Exchange") == 1, plan
        got = {
            (r["c_mktsegment"], r["n_orders"]): r["revenue"]
            for r in out.collect()
        }
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    o = load_table(spark, "orders", SF)
    c = load_table(spark, "customer", SF)
    want = {
        (r["c_mktsegment"], r["n_orders"]): r["revenue"]
        for r in o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .collect()
    }
    assert got == want


def test_skew_join_salted_matches_plain_and_drops_salt(spark):
    out = q_skew_join_salted(spark, SF)
    assert out.columns == ["event_type", "n_events", "weighted_value"]
    got = {tuple(r) for r in out.collect()}
    ev = load_table(spark, "events", SF)
    weights = {
        "click": 1.0,
        "error": 0.0,
        "purchase": 5.0,
        "signup": 2.0,
        "view": 0.2,
    }
    rows = (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    )
    want = {
        (r["event_type"], r["n"], round(r["s"] * weights[r["event_type"]], 6))
        for r in rows
    }
    assert got == want


def test_metric_trend_matches_numpy_ols(spark):
    import numpy as np

    out = {r["event_type"]: r for r in q_metric_trend(spark, SF).collect()}
    ev = load_table(spark, "events", SF)
    pdf = (
        ev.select(
            "event_type",
            "value",
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01"))
            .cast("double")
            .alias("x"),
        )
        .toPandas()
    )
    for etype, grp in pdf.groupby("event_type"):
        slope, intercept = np.polyfit(grp["x"], grp["value"], 1)
        r = np.corrcoef(grp["x"], grp["value"])[0, 1]
        row = out[etype]
        assert row["n"] == len(grp)
        assert math.isclose(row["slope"], slope, abs_tol=1e-4)
        assert math.isclose(row["intercept"], intercept, abs_tol=1e-4)
        assert math.isclose(row["r2"], r * r, abs_tol=1e-4)


def test_metric_anomaly_matches_pandas_robust_z(spark):
    out = {r["event_id"]: r["robust_z"] for r in q_metric_anomaly(spark, SF).collect()}
    pdf = load_table(spark, "events", SF).select(
        "event_id", "event_type", "value"
    ).toPandas()
    med = pdf.groupby("event_type")["value"].median()
    pdf["dev"] = (pdf["value"] - pdf["event_type"].map(med)).abs()
    mad = pdf.groupby("event_type")["dev"].median()
    pdf["z"] = (pdf["dev"] / (1.4826 * pdf["event_type"].map(mad))).round(4)
    want = pdf[pdf["z"] >= 6.0].set_index("event_id")["z"].to_dict()
    assert out == pytest.approx(want)


def test_scd2_intervals_contiguous_per_user(spark):
    rows = q_scd2_intervals(spark, SF).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    ev_counts = {
        r["user_id"]: r["n"]
        for r in load_table(spark, "events", SF)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(by_user) == set(ev_counts)
    for uid, ivs in by_user.items():
        ivs.sort(key=lambda r: r["valid_from"])
        # exactly one open-ended current interval, at the end
        assert [r["is_current"] for r in ivs] == [0] * (len(ivs) - 1) + [1]
        for prev, nxt in zip(ivs, ivs[1:]):
            assert prev["valid_to"] == nxt["valid_from"]  # contiguous
            assert prev["status"] != nxt["status"]  # true change points
        assert ivs[-1]["valid_to"] is None
        assert len(ivs) <= ev_counts[uid]


def test_stream_stream_join_matches_batch_interval_join(spark):
    got = {
        (r["user_id"], r["click_id"], r["purchase_id"])
        for r in q_stream_stream_join(spark, SF).collect()
    }
    ev = load_table(spark, "events", SF)
    clicks = ev.where("event_type = 'click'").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("cts")
    )
    purchases = ev.where("event_type = 'purchase'").select(
        F.col("user_id").alias("u2"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
    )
    want = {
        (r["user_id"], r["click_id"], r["purchase_id"])
        for r in clicks.join(
            purchases,
            (F.col("user_id") == F.col("u2"))
            & (F.col("pts") >= F.col("cts"))
            & (F.col("pts") <= F.col("cts") + F.expr("interval 1 hour")),
        ).collect()
    }
    assert got == want


def test_cohort_retention_matches_pandas(spark):
    from churn_model_evaluation_platform_spark.plans.registry_ext6 import (
        q_cohort_retention,
    )

    got = {
        (str(r["cohort_week"]), r["week_offset"]): r["n_users"]
        for r in q_cohort_retention(spark, SF).collect()
    }
    pdf = (
        load_table(spark, "events", SF)
        .where("event_type = 'purchase'")
        .select("user_id", "ts")
        .toPandas()
    )
    wk = pdf["ts"].dt.to_period("W").dt.start_time  # Monday-based
    pdf = pdf.assign(aw=wk)
    cohort = pdf.groupby("user_id")["aw"].min().rename("cw")
    act = pdf.merge(cohort, on="user_id")[["user_id", "cw", "aw"]].drop_duplicates()
    act["off"] = ((act["aw"] - act["cw"]).dt.days // 7).astype(int)
    want = {
        (str(cw.date()), off): n
        for (cw, off), n in act.groupby(["cw", "off"]).size().items()
    }
    assert got == want


def test_funnel_conversion_monotone_and_matches_pandas(spark):
    from churn_model_evaluation_platform_spark.plans.registry_ext6 import (
        q_funnel_conversion,
    )
    import pandas as pd

    got = {r["stage"]: r["n_users"] for r in q_funnel_conversion(spark, SF).collect()}
    assert (
        got["1_signup"] >= got["2_click_24h"] >= got["3_purchase_24h"]
    )
    pdf = load_table(spark, "events", SF).select(
        "user_id", "event_type", "ts"
    ).toPandas()
    day = pd.Timedelta(hours=24)
    t1 = pdf[pdf.event_type == "signup"].groupby("user_id")["ts"].min()
    clicks = pdf[pdf.event_type == "click"].merge(t1.rename("t1"), on="user_id")
    t2 = (
        clicks[(clicks.ts > clicks.t1) & (clicks.ts <= clicks.t1 + day)]
        .groupby("user_id")["ts"]
        .min()
    )
    buys = pdf[pdf.event_type == "purchase"].merge(t2.rename("t2"), on="user_id")
    t3 = (
        buys[(buys.ts > buys.t2) & (buys.ts <= buys.t2 + day)]
        .groupby("user_id")["ts"]
        .min()
    )
    assert got == {
        "1_signup": len(t1),
        "2_click_24h": len(t2),
        "3_purchase_24h": len(t3),
    }


def test_column_entropy_matches_scipy_free_formula(spark):
    from churn_model_evaluation_platform_spark.plans.registry_ext6 import (
        q_column_entropy,
    )
    import numpy as np

    got = {r["column_name"]: r["entropy"] for r in q_column_entropy(spark, SF).collect()}
    docs = load_table(spark, "documents", SF).select("lang", "source").toPandas()
    ev = load_table(spark, "events", SF).select("event_type").toPandas()
    for label, series in [
        ("documents.lang", docs["lang"]),
        ("documents.source", docs["source"]),
        ("events.event_type", ev["event_type"]),
    ]:
        p = series.value_counts(normalize=True).to_numpy()
        want = float(-(p * np.log2(p)).sum())
        assert math.isclose(got[label], want, abs_tol=1e-5), label


def test_ranking_ndcg_matches_pure_python(spark):
    from churn_model_evaluation_platform_spark.functions.hashing import (
        md5_hash_int,
    )
    from churn_model_evaluation_platform_spark.plans.registry_ext6 import (
        q_ranking_ndcg,
    )

    got = {r["user_id"]: r["ndcg"] for r in q_ranking_ndcg(spark, SF).collect()}
    pdf = (
        load_table(spark, "events", SF)
        .select(
            "user_id",
            "event_id",
            "value",
            md5_hash_int(F.col("event_id").cast("string")).alias("h"),
        )
        .toPandas()
    )
    pdf["rel"] = (pdf["value"] > 50).astype(int)
    pdf["proba"] = ((pdf["value"] + pdf["h"] % 41 - 65.0) / 20.0).clip(0.0, 1.0)
    import math as m

    want = {}
    for uid, grp in pdf.groupby("user_id"):
        grp = grp.sort_values(["proba", "event_id"], ascending=[False, True])
        rels = grp["rel"].tolist()
        n_pos = sum(rels)
        if n_pos == 0:
            continue
        dcg = sum(r / m.log2(i + 2) for i, r in enumerate(rels[:10]))
        idcg = sum(1 / m.log2(i + 2) for i in range(min(n_pos, 10)))
        want[uid] = round(dcg / idcg, 6)
    assert set(got) == set(want)
    for uid in want:
        assert math.isclose(got[uid], want[uid], abs_tol=1e-6), uid


def test_metric_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    from churn_model_evaluation_platform_spark.plans.registry_ext6 import (
        q_metric_bootstrap_ci,
    )

    r1 = q_metric_bootstrap_ci(spark, SF).collect()[0]
    r2 = q_metric_bootstrap_ci(spark, SF).collect()[0]
    assert tuple(r1) == tuple(r2)  # hash weights, not rand(): reproducible
    assert r1["n_replicates"] == 100
    assert r1["ci_lo"] < r1["point_mean"] < r1["ci_hi"]
    # width should be a few standard errors, not degenerate or huge
    import numpy as np

    vals = (
        load_table(spark, "events", SF).select("value").toPandas()["value"].to_numpy()
    )
    se = vals.std(ddof=1) / np.sqrt(len(vals))
    width = r1["ci_hi"] - r1["ci_lo"]
    assert 2 * se < width < 8 * se


def test_embedding_quantize_matches_numpy(spark):
    import numpy as np

    from churn_model_evaluation_platform_spark.plans.registry_ext6 import (
        q_embedding_quantize,
    )

    got = {
        r["vec_id"]: (r["n_dims"], r["scale"], r["max_abs_err"])
        for r in q_embedding_quantize(spark, SF).collect()
    }
    pdf = load_table(spark, "embeddings", SF).toPandas()
    for vec_id, emb in zip(pdf["vec_id"], pdf["embedding"]):
        v = np.asarray(emb, dtype=np.float64)
        scale = np.abs(v).max() / 127.0
        if scale <= 0:
            assert vec_id not in got
            continue
        # numpy rounds half-to-even; engines round half-away — avoid
        # asserting on exact .5 boundaries by recomputing their way
        q = np.floor(np.abs(v) / scale + 0.5) * np.sign(v)
        err = np.abs(q * scale - v).max()
        nd, s, e = got[vec_id]
        assert nd == len(v)
        assert math.isclose(s, round(scale, 6), abs_tol=1e-9)
        assert math.isclose(e, round(err, 6), abs_tol=1e-9), vec_id


def test_stream_session_window_equals_batch_session_window(spark):
    from churn_model_evaluation_platform_spark.plans.registry_ext6 import (
        q_stream_session_window,
    )

    got = {
        (r["user_id"], r["session_start"], r["session_end"]): r["n_events"]
        for r in q_stream_session_window(spark, SF).collect()
    }
    ev = load_table(spark, "events", SF)
    want = {
        (r["user_id"], r["session_start"], r["session_end"]): r["n_events"]
        for r in ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
        .collect()
    }
    assert got == want


def test_metric_anomaly_mad_zero_matches_oracle(spark, tmp_path):
    """A metric where >half the group repeats one value has MAD=0; the
    clamped divisor must flag the true outlier IDENTICALLY on Spark
    (x/0 would be NULL) and DuckDB (x/0 would be inf) — the
    embedding_outliers hazard class, pre-empted for robust-z."""
    import datetime

    import duckdb

    from churn_model_evaluation_platform_spark.plans.registry import _ORACLES

    rows = [
        # 9 identical values (MAD=0) + one wild outlier
        (i, datetime.datetime(2024, 1, 1, 0, i), i, "flat", 5.0, "{}")
        for i in range(9)
    ] + [(9, datetime.datetime(2024, 1, 1, 0, 59), 9, "flat", 500.0, "{}")]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    sf_dir = str(tmp_path)
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")

    got = {
        (r.event_id, r.event_type, r.value)
        for r in q_metric_anomaly(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet/*.parquet'"
    )
    want = {
        (r[0], r[1], r[2])
        for r in con.sql(_ORACLES["metric_anomaly"]).fetchall()
    }
    assert got == want
    assert (9, "flat", 500.0) in got  # the outlier IS flagged despite MAD=0
