"""Column mapping — rename/drop without rewrite (round 10, VERDICT r9
next #3; Delta/Iceberg column mapping): the log records a
logical→physical name map, files keep physical names forever, reads
project through the map, stats/pruning translate predicates, and drop
tombstones prevent a re-added column from resurrecting stale bytes.
Plus the r10 table-properties surface (Delta TBLPROPERTIES)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.sources.txnlog import TxnTable


def _frame(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .select(
            F.col("id"),
            F.concat(F.lit("m"), (F.col("id") % 3).cast("string")).alias(
                "metric"
            ),
            (F.col("id") * 1.5).alias("value"),
        )
        .coalesce(1)
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "tbl"), schema_mode="additive")
    t.append(_frame(spark, 0, 30), batch_id=0)
    t.append(_frame(spark, 30, 60), batch_id=1)
    return t


def test_rename_serves_old_files(spark, table):
    pre_files = set(table.files())
    table.rename_column("metric", "metric_name")
    assert set(table.files()) == pre_files  # zero files rewritten
    snap = table.snapshot()
    assert snap.columns == ["id", "metric_name", "value"]
    assert snap.where("metric_name = 'm1'").count() == 20


def test_rename_appends_and_prunes(spark, table):
    table.rename_column("value", "score")
    table.append(
        spark.range(100, 110)
        .select(
            F.col("id"),
            F.lit("m9").alias("metric"),
            F.lit(-1.0).alias("score"),
        )
        .coalesce(1)
    )
    snap = table.snapshot()
    assert snap.count() == 70
    assert snap.where("score = -1.0").count() == 10
    # pruning translates the logical predicate to the physical stats
    # key: the negative-score file is the only survivor
    rep = table.prune_report([("score", "<", 0.0)])
    assert rep == {"total": 3, "kept": 1, "pruned": 2}
    assert table.scan([("score", "<", 0.0)]).count() == 10


def test_rename_is_versioned(spark, table):
    v_pre = table.latest_version()
    table.rename_column("metric", "metric_name")
    assert table.snapshot(version=v_pre).columns == [
        "id",
        "metric",
        "value",
    ]
    table.restore(v_pre)
    assert table.snapshot().columns == ["id", "metric", "value"]


def test_drop_then_readd_never_resurrects(spark, table):
    table.drop_column("value")
    assert table.snapshot().columns == ["id", "metric"]
    table.append(
        spark.range(200, 205)
        .select(
            F.col("id"),
            F.lit("mz").alias("metric"),
            F.lit(42.0).alias("value"),
        )
        .coalesce(1)
    )
    snap = table.snapshot()
    assert snap.columns == ["id", "metric", "value"]
    # old rows read NULL — never the dropped physical bytes
    assert snap.where("id < 60").where("value IS NOT NULL").count() == 0
    assert snap.where("id >= 200").select(F.min("value")).first()[0] == 42.0
    st = table._state()
    assert st["dropped_physical"] == ["value"]
    assert st["column_map"]["value"].startswith("value_")


def test_rename_back_to_physical_is_identity(spark, table):
    table.rename_column("metric", "metric_name")
    table.rename_column("metric_name", "metric")
    assert table._state()["column_map"] == {}
    assert table.snapshot().where("metric = 'm0'").count() == 20


def test_governance_raises(spark, table):
    with pytest.raises(ValueError, match="does not exist"):
        table.rename_column("nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        table.rename_column("metric", "value")
    with pytest.raises(ValueError, match="only column"):
        t2 = TxnTable(spark, table.path + "_one")
        t2.append(spark.range(3).coalesce(1))
        t2.drop_column("id")
    table.add_constraint("pos_value", "value >= 0")
    with pytest.raises(ValueError, match="constraint"):
        table.rename_column("value", "score")
    with pytest.raises(ValueError, match="constraint"):
        table.drop_column("value")


def test_partition_column_refused(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "part"), partition_by=["p"])
    t.append(
        spark.range(10).select(F.col("id"), (F.col("id") % 2).alias("p"))
    )
    with pytest.raises(ValueError, match="partition"):
        t.rename_column("p", "q")
    with pytest.raises(ValueError, match="partition"):
        t.drop_column("p")


def test_compact_normalizes_physical_names(spark, table):
    table.rename_column("metric", "metric_name")
    table.compact(partitions=1)
    st = table._state()
    assert st["column_map"] == {} and st["dropped_physical"] == []
    snap = table.snapshot()
    assert snap.columns == ["id", "metric_name", "value"]
    assert snap.where("metric_name = 'm1'").count() == 20


def test_cow_delete_through_mapping(spark, table):
    table.rename_column("value", "score")
    rep = table.delete([("score", ">=", 45.0)])  # ids 30.. in file two
    assert rep["files_rewritten"] == 1 and rep["files_untouched"] == 1
    snap = table.snapshot()
    assert snap.columns == ["id", "metric", "score"]
    assert snap.count() == 30 and snap.where("score >= 45.0").count() == 0


def test_dv_delete_through_mapping(spark, table):
    table.rename_column("value", "score")
    rep = table.delete_dv([("score", "=", 1.5)])
    assert rep["rows_deleted"] == 1 and rep["files_rewritten"] == 0
    assert table.snapshot().where("id = 1").count() == 0


def test_stats_aggregate_logical_keys(spark, table):
    table.rename_column("value", "score")
    row = table.stats_aggregate(["score"]).first()
    assert row["n_rows"] == 60
    assert row["score_min"] == 0.0 and row["score_max"] == 59 * 1.5


def test_table_changes_pins_to_window_end_schema(spark, table):
    v0 = table.latest_version()
    table.rename_column("metric", "metric_name")
    table.append(_frame(spark, 60, 65).withColumnRenamed("metric", "metric_name"))
    feed = table.table_changes(v0)
    assert "metric_name" in feed.columns and "metric" not in feed.columns
    assert feed.where("_change_type = 'insert'").count() == 5


# -- table properties ------------------------------------------------------


def test_properties_roundtrip_and_versioned(spark, table):
    assert table.properties() == {}
    v = table.set_properties({"ann.codebook_version": 1, "owner": "me"})
    assert table.properties() == {
        "ann.codebook_version": 1,
        "owner": "me",
    }
    table.set_properties({"owner": None, "ann.codebook_version": 2})
    assert table.properties() == {"ann.codebook_version": 2}
    # versioned: the earlier commit still shows the first value
    assert table._state(version=v)["properties"]["ann.codebook_version"] == 1


def test_properties_validate(spark, table):
    with pytest.raises(ValueError):
        table.set_properties({})
    with pytest.raises(TypeError):
        table.set_properties({"bad": object()})
