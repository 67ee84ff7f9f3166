"""Distributed assessment predicates, embedding near-dup pairs, and the
CSV roundtrip — the registry part-3 operators."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.operators.dedup import embedding_neardup_pairs
from churn_model_evaluation_platform_spark.operators.drift import (
    assess_data_drift_df,
    assess_prediction_scores_df,
)


def test_assess_data_drift_df_flags_majority(spark):
    drift = spark.createDataFrame(
        [("a", 0.9, 0.001), ("b", 0.8, 0.002), ("c", 0.1, 0.7)],
        ["column", "ks_stat", "p_value"],
    )
    row = assess_data_drift_df(drift).first()
    assert row["dataset_drift"] is True  # 2/3 > 0.5
    assert row["n_drifted"] == 2
    assert row["drifted_columns"] == "a,b"


def test_assess_data_drift_df_no_drift(spark):
    drift = spark.createDataFrame(
        [("a", 0.01, 0.9), ("b", 0.02, 0.8)], ["column", "ks_stat", "p_value"]
    )
    row = assess_data_drift_df(drift).first()
    assert row["dataset_drift"] is False
    assert row["n_drifted"] == 0
    assert row["drifted_columns"] == ""


def test_assess_prediction_scores_df_threshold(spark):
    metrics = spark.createDataFrame(
        [
            ("f1score", 0.65),
            ("precision", 0.9),
            ("recall", 0.69),
            ("accuracy", 0.71),
            ("valuedrift_x", 0.01),  # not a score metric — never flagged
        ],
        ["metric_name", "value"],
    )
    rows = assess_prediction_scores_df(metrics, 0.70).collect()
    assert sorted((r["metric_name"], r["value"]) for r in rows) == [
        ("f1score", 0.65),
        ("recall", 0.69),
    ]


def _cos(a: list[float], b: list[float]) -> float:
    d = sum(x * y for x, y in zip(a, b))
    return d / math.sqrt(sum(x * x for x in a) * sum(x * x for x in b))


def test_embedding_neardup_pairs_bruteforce(spark):
    import random

    rng = random.Random(3)
    base = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(20)]
    # plant 5 near-duplicates: tiny perturbations of existing vectors
    vecs = base + [
        [v + rng.uniform(-0.01, 0.01) for v in base[i]] for i in range(5)
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], ["vec_id", "embedding"]
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs(
            df, threshold=0.99, n_planes=4, seed=42, dim=16
        ).collect()
    }
    # every planted pair that the brute-force confirms AND that collides
    # in the LSH bucket must be found; near-identical vectors always share
    # a bucket (same signs on every plane unless a dot is ~0)
    planted = {(i, 20 + i) for i in range(5) if _cos(vecs[i], vecs[20 + i]) >= 0.99}
    assert planted <= got
    # and everything reported really is >= threshold
    for a, b in got:
        assert _cos(vecs[a], vecs[b]) >= 0.99


def test_csv_roundtrip(spark, tmp_path):
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from churn_model_evaluation_platform_spark.sources.csv_source import (
        read_csv,
        write_csv,
    )

    df = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b"), (3, 30, "c")], ["id", "n", "s"]
    )
    path = str(tmp_path / "roundtrip")
    write_csv(df, path)
    schema = StructType(
        [
            StructField("id", LongType(), True),
            StructField("n", LongType(), True),
            StructField("s", StringType(), True),
        ]
    )
    back = read_csv(spark, path, schema=schema)
    assert sorted(tuple(r) for r in back.collect()) == [
        (1, 10, "a"),
        (2, 20, "b"),
        (3, 30, "c"),
    ]


def test_multimodal_frame_sample_counts(spark):
    from churn_model_evaluation_platform_spark.operators.multimodal import sample_frames

    media = spark.createDataFrame(
        [
            (1, "video", 1000),  # 4 frames at 250ms
            (2, "video", 100),  # < every_ms → still 1 frame
            (3, "image", 5000),  # filtered out
        ],
        ["media_id", "media_type", "duration_ms"],
    )
    rows = sample_frames(media, every_ms=250).collect()
    by_id: dict[int, list[int]] = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert sorted(by_id[1]) == [0, 1, 2, 3]
    assert by_id[2] == [0]
    assert 3 not in by_id
