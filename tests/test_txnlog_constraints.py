"""CHECK constraints on the transactional table: validated over
existing data when added, enforced on every append/overwrite/merge/
update before the commit lands, persisted in the log (and its
checkpoints), and droppable."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.sources.txnlog import (
    ConstraintViolation,
    TxnTable,
)


def _frame(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2.0).alias("v")
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "tbl"))
    t.append(_frame(spark, 0, 10))
    t.add_constraint("v_nonneg", "v >= 0")
    return t


def test_append_rejects_violations(spark, table):
    with pytest.raises(ConstraintViolation, match="v_nonneg.*2 rows"):
        table.append(
            spark.createDataFrame(
                [Row(id=100, v=-1.0), Row(id=101, v=-2.0), Row(id=102, v=3.0)],
                "id long, v double",
            )
        )
    # nothing landed: no version, no rows
    assert table.snapshot().count() == 10
    # valid rows still flow
    table.append(_frame(spark, 10, 12))
    assert table.snapshot().count() == 12


def test_null_check_passes(spark, table):
    # SQL CHECK semantics: NULL expression is not a violation
    table.append(
        spark.createDataFrame([Row(id=200, v=None)], "id long, v double")
    )
    assert table.snapshot().count() == 11


def test_add_constraint_validates_existing_data(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "tbl"))
    t.append(
        spark.createDataFrame(
            [Row(id=1, v=-5.0), Row(id=2, v=1.0)], "id long, v double"
        )
    )
    with pytest.raises(ConstraintViolation, match="1 rows"):
        t.add_constraint("v_nonneg", "v >= 0")
    assert t.constraints() == {}  # nothing recorded


def test_update_enforced_delete_exempt(spark, table):
    with pytest.raises(ConstraintViolation):
        table.update([("id", "<", 5)], {"v": F.lit(-9.0)})
    # deletes only remove rows — never re-validated, always fine
    table.delete([("id", ">=", 8)])
    assert table.snapshot().count() == 8


def test_constraints_survive_compaction_and_new_handles(spark, table, tmp_path):
    table.compact(partitions=1)
    t2 = TxnTable(spark, table.path)
    assert t2.constraints() == {"v_nonneg": "v >= 0"}
    with pytest.raises(ConstraintViolation):
        t2.append(
            spark.createDataFrame([Row(id=1, v=-1.0)], "id long, v double")
        )


def test_drop_constraint(spark, table):
    table.drop_constraint("v_nonneg")
    assert table.constraints() == {}
    table.append(
        spark.createDataFrame([Row(id=1, v=-1.0)], "id long, v double")
    )  # allowed again
    with pytest.raises(ValueError, match="does not exist"):
        table.drop_constraint("nope")
    with pytest.raises(ValueError, match="already exists"):
        table.add_constraint("a", "v >= -10")
        table.add_constraint("a", "v >= -10")


def test_constraints_in_checkpointed_state(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "tbl"), checkpoint_interval=2)
    t.append(_frame(spark, 0, 5))
    t.add_constraint("pos", "id >= 0")
    for lo in range(5, 20, 5):
        t.append(_frame(spark, lo, lo + 5))  # crosses checkpoint writes
    t2 = TxnTable(spark, str(tmp_path / "tbl"), checkpoint_interval=2)
    assert t2.constraints() == {"pos": "id >= 0"}
