"""File-lifecycle state machine (reference move_to_folder semantics,
churn_prediction_pipeline.py:642-680) on the Hadoop FileSystem API."""

from __future__ import annotations

import os

import pytest

from churn_model_evaluation_platform_spark.sources.lifecycle import (
    append_log,
    move_to_folder,
    read_log,
)


def test_move_through_stages_with_audit(spark, tmp_path):
    base = str(tmp_path)
    os.makedirs(f"{base}/input")
    with open(f"{base}/input/f.csv", "w") as fh:
        fh.write("x\n1\n")
    logs = f"{base}/logs"

    p1 = move_to_folder(spark, f"{base}/input/f.csv", f"{base}/processing",
                        "to processing", logs)
    assert p1.endswith("/processing/f.csv")
    assert not os.path.exists(f"{base}/input/f.csv")
    assert os.path.exists(f"{base}/processing/f.csv")

    move_to_folder(spark, f"{base}/processing/f.csv", f"{base}/processed",
                   "to processed", logs)
    assert os.path.exists(f"{base}/processed/f.csv")
    assert read_log(spark, f"{logs}/f.csv.log") == ["to processing", "to processed"]


def test_move_overwrites_same_name(spark, tmp_path):
    base = str(tmp_path)
    os.makedirs(f"{base}/a")
    os.makedirs(f"{base}/b")
    for d, body in (("a", "new"), ("b", "old")):
        with open(f"{base}/{d}/f.csv", "w") as fh:
            fh.write(body)
    move_to_folder(spark, f"{base}/a/f.csv", f"{base}/b")
    with open(f"{base}/b/f.csv") as fh:
        assert fh.read() == "new"


def test_move_missing_source_raises(spark, tmp_path):
    with pytest.raises(Exception):
        move_to_folder(spark, f"{tmp_path}/nope.csv", f"{tmp_path}/out")


def test_append_log_preserves_existing(spark, tmp_path):
    log = f"{tmp_path}/x.log"
    append_log(spark, log, "one")
    append_log(spark, log, "two")
    assert read_log(spark, log) == ["one", "two"]
    assert read_log(spark, f"{tmp_path}/absent.log") == []
