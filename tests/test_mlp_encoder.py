"""The real-model encoder slot: the pinned-weight numpy MLP through
``embed_map_in_pandas`` must agree BIT-FOR-BIT with the pure-Catalyst
matmul replay (and, via the registry oracle, with DuckDB's
list_dot_product replay). Dyadic weights over integer inputs make
every intermediate exact, so these are exact-equality checks — any
plumbing drift (Arrow dtype, batch shape, tokenization) breaks them
outright.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.operators.mlp_encoder import (
    MLP_HIDDEN,
    MLP_IN,
    MLP_OUT,
    embed_mlp,
    mlp_embed_catalyst,
    mlp_encode_py,
    mlp_weights,
)
from churn_model_evaluation_platform_spark.operators.similarity import (
    feature_hash_embed,
    feature_hash_vec_py,
)

TEXTS = [
    "hash join merge plan table scan",
    "the quick brown fox",
    "one",
    "",  # empty → zero input vector, biases only
    "table table table table table table table table",  # repeated mass
]


def test_weights_are_dyadic_and_shaped():
    w1, b1, w2, b2 = mlp_weights()
    assert (len(w1), len(w1[0])) == (MLP_HIDDEN, MLP_IN)
    assert (len(w2), len(w2[0])) == (MLP_OUT, MLP_HIDDEN)
    for row in [*w1, b1, *w2, b2]:
        for v in row if isinstance(row, list) else [row]:
            assert v * 4 == int(v * 4) and abs(v) <= 0.75
    # rows genuinely differ (the encoder is not rank-1)
    assert len({tuple(r) for r in w1}) > 1
    assert len({tuple(r) for r in w2}) > 1


def test_numpy_matches_pure_python_reference():
    """numpy's blocked matmul vs a naive Python loop — exactness of
    the dyadic construction means ==, not isclose."""
    w1, b1, w2, b2 = mlp_weights()
    got = mlp_encode_py(TEXTS)
    for t, out in zip(TEXTS, got):
        x = feature_hash_vec_py(t)
        h = [
            max(0.0, b1[j] + sum(w1[j][i] * x[i] for i in range(MLP_IN)))
            for j in range(MLP_HIDDEN)
        ]
        want = [
            b2[k] + sum(w2[k][j] * h[j] for j in range(MLP_HIDDEN))
            for k in range(MLP_OUT)
        ]
        assert out == want, t
        # every component an exact multiple of 1/16
        assert all(v * 16 == int(v * 16) for v in out)


def test_relu_actually_fires():
    """At least one hidden unit is clamped for some input — otherwise
    the 2-layer model collapses to an affine map and the test proves
    less than it claims."""
    w1, b1, _, _ = mlp_weights()
    clamped = 0
    for t in TEXTS:
        x = feature_hash_vec_py(t)
        for j in range(MLP_HIDDEN):
            pre = b1[j] + sum(w1[j][i] * x[i] for i in range(MLP_IN))
            clamped += pre < 0
    assert clamped > 0


def test_slot_matches_catalyst_replay(spark):
    """The Arrow mapInPandas path vs the zip_with/aggregate matmul on
    the JVM — the in-engine differential, exact equality."""
    df = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    slot = {
        r["doc_id"]: list(r["embedding"])
        for r in embed_mlp(df).collect()
    }
    catalyst = {
        r["doc_id"]: list(r["emb"])
        for r in df.select(
            "doc_id",
            mlp_embed_catalyst(
                feature_hash_embed(F.col("text"))
            ).alias("emb"),
        ).collect()
    }
    assert slot == catalyst
    assert all(len(v) == MLP_OUT for v in slot.values())


def test_empty_batch_and_none_text(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "words here")], "doc_id long, text string"
    )
    out = {r["doc_id"]: list(r["embedding"]) for r in embed_mlp(df).collect()}
    # None text encodes like "" (biases-only path), not a crash
    assert out[1] == mlp_encode_py([""])[0]
    assert mlp_encode_py([]) == []


def test_output_is_finite_double(spark):
    df = spark.createDataFrame([(0, TEXTS[0])], "doc_id long, text string")
    row = embed_mlp(df).collect()[0]
    assert all(
        isinstance(v, float) and math.isfinite(v)
        for v in row["embedding"]
    )
