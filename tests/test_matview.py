"""Incremental materialized aggregates (sources/matview.py): refresh
folds ONLY the files added since the last refreshed version, falls back
to a full recompute when the log window contains an overwrite, and the
state swap is atomic + idempotent via the state table's batch_id
contract."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.sources.matview import (
    MaterializedAggregate,
)
from churn_model_evaluation_platform_spark.sources.txnlog import TxnTable


def _batch(spark, lo, hi):
    return spark.range(lo, hi).select(
        (F.col("id") % 3).cast("string").alias("k"),
        (F.col("id") * 1.5).alias("v"),
    )


@pytest.fixture()
def mv(spark, tmp_path):
    src = TxnTable(spark, str(tmp_path / "src"))
    view = MaterializedAggregate(
        src,
        str(tmp_path / "view"),
        group_cols=["k"],
        aggs={
            "n": ("count",),
            "sv": ("sum", "v"),
            "mn": ("min", "v"),
            "mx": ("max", "v"),
            "av": ("avg", "v"),
        },
    )
    return src, view


def _expect(spark, src):
    return {
        r["k"]: r
        for r in src.snapshot()
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sv"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
            F.avg("v").alias("av"),
        )
        .collect()
    }


def _assert_matches(view, want):
    got = {r["k"]: r for r in view.read().collect()}
    assert set(got) == set(want)
    for k, w in want.items():
        g = got[k]
        assert g["n"] == w["n"]
        assert math.isclose(g["sv"], w["sv"], rel_tol=1e-9)
        assert g["mn"] == w["mn"] and g["mx"] == w["mx"]
        assert math.isclose(g["av"], w["av"], rel_tol=1e-9)


def test_incremental_refresh_matches_full(spark, mv):
    src, view = mv
    src.append(_batch(spark, 0, 50))
    assert view.refresh()["mode"] == "full"  # first refresh seeds state
    src.append(_batch(spark, 50, 120))
    r = view.refresh()
    assert r == {"mode": "incremental", "from": 1, "to": 2}
    _assert_matches(view, _expect(spark, src))
    src.append(_batch(spark, 120, 121))  # single-row delta
    assert view.refresh()["mode"] == "incremental"
    _assert_matches(view, _expect(spark, src))


def test_refresh_reads_only_new_files(spark, mv, monkeypatch):
    src, view = mv
    src.append(_batch(spark, 0, 50))
    view.refresh()
    v1_files = set(src.files())
    src.append(_batch(spark, 50, 80))
    seen = {}
    orig = MaterializedAggregate._partial

    def spy(self, rows):
        seen["inputs"] = set(rows.inputFiles())
        return orig(self, rows)

    monkeypatch.setattr(MaterializedAggregate, "_partial", spy)
    assert view.refresh()["mode"] == "incremental"
    new_files = set(src.files()) - v1_files
    # normalize scheme prefixes (inputFiles reports file:/...) and compare
    norm = {f.split(":", 1)[-1].lstrip("/") for f in seen["inputs"]}
    want = {f.split(":", 1)[-1].lstrip("/") for f in new_files}
    assert norm == want


def test_overwrite_forces_full_recompute(spark, mv):
    src, view = mv
    src.append(_batch(spark, 0, 50))
    view.refresh()
    src.append(_batch(spark, 50, 60))
    src.compact(partitions=1)  # overwrite action in the window
    r = view.refresh()
    assert r["mode"] == "full"
    _assert_matches(view, _expect(spark, src))


def test_noop_and_idempotent_replay(spark, mv):
    src, view = mv
    src.append(_batch(spark, 0, 30))
    view.refresh()
    assert view.refresh()["mode"] == "noop"
    # crash-replay of the same refresh: the state table's batch_id
    # contract skips the duplicate overwrite
    latest = src.latest_version()
    before = view.state.latest_version()
    view.state.overwrite(view.state.snapshot(), batch_id=latest)
    assert view.state.latest_version() == before
    _assert_matches(view, _expect(spark, src))


def test_nulls_in_avg_and_minmax(spark, tmp_path):
    src = TxnTable(spark, str(tmp_path / "src"))
    view = MaterializedAggregate(
        src,
        str(tmp_path / "view"),
        group_cols=["k"],
        aggs={"n": ("count",), "av": ("avg", "v"), "mn": ("min", "v")},
    )
    src.append(
        spark.createDataFrame(
            [Row(k="a", v=2.0), Row(k="a", v=None)], "k string, v double"
        )
    )
    view.refresh()
    src.append(
        spark.createDataFrame(
            [Row(k="a", v=4.0), Row(k="b", v=None)], "k string, v double"
        )
    )
    assert view.refresh()["mode"] == "incremental"
    got = {r["k"]: r for r in view.read().collect()}
    assert got["a"]["n"] == 3  # count(*) counts null rows
    assert got["a"]["av"] == 3.0  # avg ignores nulls: (2+4)/2
    assert got["a"]["mn"] == 2.0
    assert got["b"]["n"] == 1
    assert got["b"]["av"] is None  # all-null group: 0/0 -> NULL, not error
    assert got["b"]["mn"] is None


def test_hll_incremental_equals_single_pass(spark, tmp_path):
    """The HLL state is mergeable: unioning per-refresh partial
    sketches must give the SAME estimate as one sketch over all rows —
    incremental maintenance is exact w.r.t. the sketch."""
    src = TxnTable(spark, str(tmp_path / "src"))
    view = MaterializedAggregate(
        src,
        str(tmp_path / "view"),
        group_cols=["k"],
        aggs={"nd": ("approx_distinct", "uid")},
    )

    def b(lo, hi):
        # overlapping uid ranges across batches: dedup must span them
        return spark.range(lo, hi).select(
            (F.col("id") % 2).cast("string").alias("k"),
            (F.col("id") % 500).alias("uid"),
        )

    src.append(b(0, 400))
    view.refresh()
    src.append(b(300, 900))
    assert view.refresh()["mode"] == "incremental"
    src.append(b(850, 1300))
    assert view.refresh()["mode"] == "incremental"
    got = {r["k"]: r["nd"] for r in view.read().collect()}
    single = {
        r["k"]: r["nd"]
        for r in src.snapshot()
        .groupBy("k")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("uid")).alias("nd")
        )
        .collect()
    }
    assert got == single  # identical sketches, not just close
    exact = {
        r["k"]: r["nd"]
        for r in src.snapshot()
        .groupBy("k")
        .agg(F.countDistinct("uid").alias("nd"))
        .collect()
    }
    for k in exact:
        assert abs(got[k] - exact[k]) / exact[k] <= 0.05, (k, got[k], exact[k])


def test_var_stddev_incremental(spark, tmp_path):
    src = TxnTable(spark, str(tmp_path / "src"))
    view = MaterializedAggregate(
        src,
        str(tmp_path / "view"),
        group_cols=["k"],
        aggs={"sd": ("stddev", "v"), "vr": ("var", "v")},
    )
    src.append(_batch(spark, 0, 60))
    view.refresh()
    src.append(_batch(spark, 60, 200))
    assert view.refresh()["mode"] == "incremental"
    got = {r["k"]: r for r in view.read().collect()}
    want = {
        r["k"]: r
        for r in src.snapshot()
        .groupBy("k")
        .agg(F.stddev("v").alias("sd"), F.var_samp("v").alias("vr"))
        .collect()
    }
    for k, w in want.items():
        assert math.isclose(got[k]["sd"], w["sd"], rel_tol=1e-9)
        assert math.isclose(got[k]["vr"], w["vr"], rel_tol=1e-9)


def test_var_single_row_group_is_null(spark, tmp_path):
    from pyspark.sql import Row

    src = TxnTable(spark, str(tmp_path / "src"))
    view = MaterializedAggregate(
        src, str(tmp_path / "view"), ["k"], {"vr": ("var", "v")}
    )
    src.append(
        spark.createDataFrame(
            [Row(k="solo", v=3.0), Row(k="duo", v=1.0), Row(k="duo", v=2.0)],
            "k string, v double",
        )
    )
    view.refresh()
    got = {r["k"]: r["vr"] for r in view.read().collect()}
    assert got["solo"] is None  # n < 2: undefined, not a 0/0 crash
    assert math.isclose(got["duo"], 0.5)


def test_approx_quantile_incremental_and_bounds(spark, tmp_path):
    src = TxnTable(spark, str(tmp_path / "src"))
    qopts = {"p": 0.9, "lo": 0.0, "hi": 300.0, "bins": 100}
    view = MaterializedAggregate(
        src,
        str(tmp_path / "view"),
        group_cols=["k"],
        aggs={"p90": ("approx_quantile", "v", qopts)},
    )
    src.append(_batch(spark, 0, 70))
    view.refresh()
    src.append(_batch(spark, 70, 200))
    assert view.refresh()["mode"] == "incremental"
    got = {r["k"]: r["p90"] for r in view.read().collect()}
    # identical to the single-pass sketch (mergeable state)...
    single = MaterializedAggregate(
        src,
        str(tmp_path / "view2"),
        group_cols=["k"],
        aggs={"p90": ("approx_quantile", "v", qopts)},
    )
    single.refresh()
    assert got == {r["k"]: r["p90"] for r in single.read().collect()}
    # ...and within half a bin width of the ceil(p*n)-th order
    # statistic (the sketch's stated convention)
    width = (qopts["hi"] - qopts["lo"]) / qopts["bins"]
    vals: dict[str, list[float]] = {}
    for r in src.snapshot().collect():
        vals.setdefault(r["k"], []).append(r["v"])
    for k, vs in vals.items():
        vs.sort()
        os_ = vs[math.ceil(qopts["p"] * len(vs)) - 1]
        assert abs(got[k] - os_) <= width / 2 + 1e-9, (k, got[k], os_)


def test_approx_quantile_clamps_out_of_range(spark, tmp_path):
    from pyspark.sql import Row

    src = TxnTable(spark, str(tmp_path / "src"))
    view = MaterializedAggregate(
        src,
        str(tmp_path / "view"),
        ["k"],
        {"p50": ("approx_quantile", "v", {"p": 0.5, "lo": 0.0, "hi": 10.0, "bins": 10})},
    )
    src.append(
        spark.createDataFrame(
            [Row(k="a", v=-100.0), Row(k="a", v=500.0), Row(k="a", v=500.0)],
            "k string, v double",
        )
    )
    view.refresh()
    (row,) = view.read().collect()
    assert 9.0 <= row["p50"] <= 10.0  # saturates at the hi edge bin


def test_rejects_non_decomposable(spark, tmp_path):
    src = TxnTable(spark, str(tmp_path / "src"))
    with pytest.raises(ValueError, match="sketch"):
        MaterializedAggregate(
            src, str(tmp_path / "v"), ["k"], {"m": ("median", "v")}
        )
    with pytest.raises(ValueError, match="needs a column"):
        MaterializedAggregate(src, str(tmp_path / "v"), ["k"], {"s": ("sum",)})
    with pytest.raises(ValueError, match="at least one"):
        MaterializedAggregate(src, str(tmp_path / "v"), ["k"], {})
    with pytest.raises(ValueError, match="approx_quantile takes"):
        MaterializedAggregate(
            src, str(tmp_path / "v"), ["k"], {"q": ("approx_quantile", "v")}
        )
    with pytest.raises(ValueError, match="missing \\['hi'\\]"):
        MaterializedAggregate(
            src,
            str(tmp_path / "v"),
            ["k"],
            {"q": ("approx_quantile", "v", {"p": 0.5, "lo": 0.0})},
        )
    with pytest.raises(ValueError, match="p must be"):
        MaterializedAggregate(
            src,
            str(tmp_path / "v"),
            ["k"],
            {"q": ("approx_quantile", "v", {"p": 1.5, "lo": 0.0, "hi": 1.0})},
        )


def test_approx_quantile_ignores_nulls(spark, tmp_path):
    """NULL metric values must not be bucketed at lo (greatest/least
    skip NULL operands — r8 review): the quantile over [NULL x 50,
    100.0 x 5] is 100, not dragged toward 0."""
    from pyspark.sql import Row

    src = TxnTable(spark, str(tmp_path / "src"))
    view = MaterializedAggregate(
        src,
        str(tmp_path / "view"),
        ["k"],
        {"p50": ("approx_quantile", "v", {"p": 0.5, "lo": 0.0, "hi": 200.0, "bins": 100})},
    )
    rows = [Row(k="a", v=None)] * 50 + [Row(k="a", v=100.0)] * 5
    src.append(spark.createDataFrame(rows, "k string, v double"))
    view.refresh()
    (r,) = view.read().collect()
    assert 99.0 <= r["p50"] <= 101.0, r["p50"]


def test_refresh_handles_additive_source_history(spark, tmp_path):
    """A legal additive-mode append that OMITS an aggregated column
    must not crash the incremental refresh: the delta reads through
    the source's log schema (NULL backfill) — r8 review."""
    from pyspark.sql import Row

    src = TxnTable(spark, str(tmp_path / "src"), schema_mode="additive")
    view = MaterializedAggregate(
        src,
        str(tmp_path / "view"),
        ["k"],
        {"n": ("count",), "sv": ("sum", "v")},
    )
    src.append(
        spark.createDataFrame(
            [Row(k="a", v=1.0), Row(k="b", v=2.0)], "k string, v double"
        )
    )
    view.refresh()
    src.append(spark.createDataFrame([Row(k="a")], "k string"))  # no v
    assert view.refresh()["mode"] == "incremental"
    got = {r["k"]: (r["n"], r["sv"]) for r in view.read().collect()}
    assert got["a"] == (2, 1.0)  # omitted column folded as NULL
    assert got["b"] == (1, 2.0)


def test_concurrent_refresh_no_lost_update(spark, tmp_path, monkeypatch):
    """A rival refresh landing between this refresh's fold and its
    state overwrite must NOT be clobbered: the conditional overwrite
    detects the advance and the loser recomputes (r8 review)."""
    src = TxnTable(spark, str(tmp_path / "src"))
    mk = lambda: MaterializedAggregate(  # noqa: E731
        src,
        str(tmp_path / "view"),
        ["k"],
        {"n": ("count",), "sv": ("sum", "v")},
    )
    view_a, view_b = mk(), mk()
    src.append(_batch(spark, 0, 40))
    view_a.refresh()
    src.append(_batch(spark, 40, 100))
    fired = {}
    orig = MaterializedAggregate._partial

    def sneaky(self, rows):
        if self is view_a and not fired.get("done"):
            fired["done"] = True
            # rival: a NEWER source commit lands AND is refreshed into
            # the state while A is still folding toward the older
            # target — the classic lost-update interleaving
            src.append(_batch(spark, 100, 130))
            view_b.refresh()
        return orig(self, rows)

    monkeypatch.setattr(MaterializedAggregate, "_partial", sneaky)
    r = view_a.refresh()  # stale fold conflicts -> retry -> noop
    assert r["mode"] == "noop"
    monkeypatch.setattr(MaterializedAggregate, "_partial", orig)
    # nothing lost: the view equals a scratch recompute over ALL rows
    got = {r["k"]: (r["n"], r["sv"]) for r in view_a.read().collect()}
    want = {
        r["k"]: (r["n"], r["sv"])
        for r in src.snapshot()
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert math.isclose(got[k][1], want[k][1], rel_tol=1e-9)
