"""Round-9 regression tests for the three r8 ADVICE findings on
sources/txnlog.py:

1. (medium) ``stats_aggregate`` must RAISE when a float column contains
   +/-Infinity — ``_enc_stat`` encodes a non-finite bound to None, so a
   metadata min/max would silently drop the infinity (confirmed
   empirically: [-inf, 5.0, 9.0] used to answer v_min=5.0).
2. (low) ``history().rows_added`` must count only the files a commit
   actually WROTE — optimize/CoW/restore overwrites re-reference
   untouched files and merge their stats into the commit, which used to
   inflate rows_added to the whole post-commit row count.
3. (low) ``restore(version)`` must restore the target version's CHECK
   constraint set, not carry the current one onto the old data.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.sources.txnlog import TxnTable


def _frame(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2.0).alias("v")
    )


@pytest.fixture()
def table(spark, tmp_path):
    return TxnTable(spark, str(tmp_path / "tbl"))


# -- finding 1: infinity poisons metadata-only aggregates ---------------


def test_stats_aggregate_raises_on_infinity(spark, table):
    df = spark.createDataFrame(
        [(1, float("-inf")), (2, 5.0), (3, 9.0)], ["id", "v"]
    )
    table.append(df)
    with pytest.raises(ValueError, match="Infinity"):
        table.stats_aggregate(["v"])
    # the untouched column still answers exactly
    out = table.stats_aggregate(["id"]).first()
    assert out["n_rows"] == 3 and out["id_min"] == 1 and out["id_max"] == 3


def test_stats_aggregate_raises_on_positive_infinity_max(spark, table):
    df = spark.createDataFrame([(1, 2.0), (2, float("inf"))], ["id", "v"])
    table.append(df)
    with pytest.raises(ValueError, match="Infinity"):
        table.stats_aggregate(["v"])


def test_infinity_pruning_stays_conservative(spark, table):
    """The inf flag is a stats_aggregate guard only — scans must still
    keep the file (its None bound is conservative) and return the row."""
    df = spark.createDataFrame(
        [(1, float("-inf")), (2, 5.0), (3, 9.0)], ["id", "v"]
    ).coalesce(1)
    table.append(df)
    got = [r["v"] for r in table.scan([("v", "<", -100.0)]).collect()]
    assert got == [float("-inf")]
    # the finite max (9.0) is still a usable upper bound: -inf only
    # voids the MIN side of the envelope
    assert table.prune_report([("v", ">", 10.0)])["kept"] == 0


def test_finite_floats_have_no_inf_flag(spark, table):
    table.append(_frame(spark, 0, 10).coalesce(1))
    st = table._state()
    (entry,) = st["stats"].values()
    assert "inf" not in entry["cols"]["v"]
    assert math.isclose(
        table.stats_aggregate(["v"]).first()["v_max"], 18.0
    )


# -- finding 2: rows_added counts written files only --------------------


def test_history_rows_added_excludes_rereferenced_files(spark, table):
    table.append(_frame(spark, 0, 100).coalesce(2))   # v1: 100 rows
    table.append(_frame(spark, 100, 150).coalesce(1))  # v2: 50 rows
    # CoW delete touches only the file(s) that may hold id>=120: the
    # v1 files are re-referenced untouched
    table.delete([("id", ">=", 120)])                  # v3
    hist = {r["version"]: r for r in table.history().collect()}
    assert hist[1]["rows_added"] == 100
    assert hist[2]["rows_added"] == 50
    # v3 rewrote only the 50-row file minus 30 deleted rows = 20; the
    # old behavior reported 120 (the whole post-commit table)
    assert hist[3]["rows_added"] == 20


def test_history_rows_added_optimize_counts_bin_packed_only(spark, table):
    for lo in (0, 10, 20):
        table.append(_frame(spark, lo, lo + 10).coalesce(1))
    res = table.optimize()  # everything is tiny: all 3 rewritten
    assert res["files_rewritten"] == 3
    hist = {r["version"]: r for r in table.history().collect()}
    assert hist[res["version"]]["rows_added"] == 30  # rewrote 30 rows


def test_history_rows_added_restore_writes_nothing(spark, table):
    table.append(_frame(spark, 0, 10).coalesce(1))   # v1
    table.overwrite(_frame(spark, 0, 5).coalesce(1))  # v2: drops v1 files
    v3 = table.restore(1)
    hist = {r["version"]: r for r in table.history().collect()}
    # restore re-references v1's files but WRITES zero bytes: the
    # written-rows audit must not report phantom writes (r9 review —
    # freshness is judged against every file ever referenced, not just
    # the immediately prior version's live set)
    assert hist[v3]["rows_added"] == 0


# -- finding 3: restore restores constraints ----------------------------


def test_restore_restores_constraint_set(spark, table):
    table.append(_frame(spark, 0, 10))            # v1: ids 0..9
    v1 = table.latest_version()
    table.overwrite(_frame(spark, 100, 110))      # v2: ids 100..109
    table.add_constraint("big_ids", "id >= 100")  # v3: valid for v2 data
    table.restore(v1)
    # v1's data (ids 0..9) violates big_ids; carrying it forward would
    # leave committed content violating the table's own checks
    assert table.constraints() == {}
    # and appends validate against the RESTORED (empty) set
    table.append(_frame(spark, 10, 12))


def test_restore_keeps_constraints_that_existed_at_target(spark, table):
    table.append(_frame(spark, 0, 10))
    table.add_constraint("nonneg", "id >= 0")
    v = table.latest_version()
    table.append(_frame(spark, 10, 20))
    table.drop_constraint("nonneg")
    table.restore(v)
    assert table.constraints() == {"nonneg": "id >= 0"}
