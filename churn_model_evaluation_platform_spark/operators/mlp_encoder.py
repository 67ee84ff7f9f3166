"""A REAL (non-hash) neural encoder through the model-encoder slot —
closes the r12 verdict's "the encoder slot has never run a real
model" gap without torch/onnx (absent in this environment): a
pinned-weight 2-layer numpy MLP (16 → 16 ReLU → 8) over the
feature-hash base embedding, pushed through
``embed_map_in_pandas(encoder=..., dtype="double")`` exactly the way
a sentence-transformer would be.

Exactness by construction — the cross-engine float discipline made
structural: every weight and bias is a DYADIC rational in
{-3..3}/4 and the input vector is integer, so every product is an
exact multiple of 1/4, every hidden activation an exact multiple of
1/4 (ReLU preserves exactness), and every output component an exact
multiple of 1/16 — all far below 2^53. IEEE addition of exactly-
representable dyadics of one denominator is associative HERE, so
numpy's blocked matmul, Catalyst's left-fold ``aggregate``, and
DuckDB's ``list_dot_product`` produce bit-identical doubles with NO
rounding step anywhere. That turns the three-way differential
(Arrow-batched Pandas slot vs pure-Catalyst matmul replay vs DuckDB
SQL replay) into an exact-equality check of the PLUMBING — batch
shapes, schema, dtype handling — with zero float tolerance.

Weights are a fixed arithmetic formula (below), not trained: the
point is proving a genuine matrix-multiply model flows through the
slot end to end, with the Catalyst replay as the in-engine oracle
(the ``shap_linear`` pinned-weights pattern scaled to two layers).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import FEATHASH_DIM, feature_hash_vec_py

MLP_IN = FEATHASH_DIM  # 16
MLP_HIDDEN = 16
MLP_OUT = 8


def mlp_weights() -> tuple[list[list[float]], list[float], list[list[float]], list[float]]:
    """Pinned deterministic weights: W1 (hidden×in), b1, W2 (out×hidden),
    b2 — every value in {-3,-2,-1,0,1,2,3}/4 (exact dyadics). The
    mixing constants are coprime to the moduli so every row pattern
    differs."""
    w1 = [
        [(((3 * j + 11 * i + 3) % 7) - 3) / 4.0 for i in range(MLP_IN)]
        for j in range(MLP_HIDDEN)
    ]
    b1 = [((j % 5) - 2) / 4.0 for j in range(MLP_HIDDEN)]
    w2 = [
        [(((5 * k + 13 * j + 1) % 7) - 3) / 4.0 for j in range(MLP_HIDDEN)]
        for k in range(MLP_OUT)
    ]
    b2 = [((k % 3) - 1) / 4.0 for k in range(MLP_OUT)]
    return w1, b1, w2, b2


def mlp_encode_py(texts: list) -> list:
    """The numpy model — the ``encoder=`` callable: batch of texts →
    batch of 8-dim double vectors. Tokenize/hash exactly like the
    reference encoder, then two dense layers."""
    import numpy as np

    w1, b1, w2, b2 = mlp_weights()
    x = np.array(
        [feature_hash_vec_py(t or "") for t in texts], dtype=np.float64
    )
    if x.size == 0:
        return []
    h = np.maximum(x @ np.array(w1).T + np.array(b1), 0.0)
    out = h @ np.array(w2).T + np.array(b2)
    return [list(map(float, row)) for row in out]


def embed_mlp(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The real-model path: the numpy MLP through the Arrow-batched
    ``mapInPandas`` encoder slot — (id, embedding array<double>).
    Map-only; the model weights live in the task closure (a real
    checkpoint would be a broadcast or an executor-local load)."""
    from .similarity import embed_map_in_pandas

    return embed_map_in_pandas(
        df,
        text_col=text_col,
        id_col=id_col,
        encoder=mlp_encode_py,
        dtype="double",
    )


def mlp_embed_catalyst(x: Column) -> Column:
    """Pure-Catalyst replay of the SAME model over a feature-hash
    embedding column (``array<bigint>``): each layer is an
    ``aggregate(zip_with(...))`` dot product against weight-row array
    literals — whole-stage-codegen JVM arithmetic, no Python. The
    in-engine oracle for the Pandas slot."""
    w1, b1, w2, b2 = mlp_weights()
    xd = F.transform(x, lambda v: v.cast("double"))

    def dot(vec: Column, w: list[float], b: float) -> Column:
        return F.aggregate(
            F.zip_with(vec, F.lit(w), lambda a, ww: a * ww),
            F.lit(float(b)),
            lambda acc, t: acc + t,
        )

    h = F.array(
        *[
            F.greatest(F.lit(0.0), dot(xd, w1[j], b1[j]))
            for j in range(MLP_HIDDEN)
        ]
    )
    return F.array(*[dot(h, w2[k], b2[k]) for k in range(MLP_OUT)])


def _w_sql(w: list[float]) -> str:
    return "[" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in w) + "]"


def mlp_sql(rel: str) -> str:
    """DuckDB replay over a relation ``rel`` yielding
    ``(cid, vec)`` with vec the BIGINT feature-hash sums:
    ``list_dot_product`` per layer against the same dyadic literals —
    the third, fully independent engine. Returns a SELECT producing
    ``(cid, out)`` with out the 8-dim double list."""
    w1, b1, w2, b2 = mlp_weights()
    h = ", ".join(
        f"greatest(CAST(0.0 AS DOUBLE), CAST({b1[j]!r} AS DOUBLE)"
        f" + list_dot_product(xd, {_w_sql(w1[j])}))"
        for j in range(MLP_HIDDEN)
    )
    out = ", ".join(
        f"CAST({b2[k]!r} AS DOUBLE) + list_dot_product(h, {_w_sql(w2[k])})"
        for k in range(MLP_OUT)
    )
    return f"""
SELECT cid, [{out}] AS out FROM (
  SELECT cid, [{h}] AS h FROM (
    SELECT cid, list_transform(vec, v -> CAST(v AS DOUBLE)) AS xd
    FROM {rel}
  )
)
"""
