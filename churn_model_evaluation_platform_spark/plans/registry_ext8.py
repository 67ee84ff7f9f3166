"""Round-6 batch 4: streaming incremental MERGE (exactly the CDC
semantics of cdc_upsert, applied batch-by-batch through foreachBatch),
proper scoring rules for the eval suite (Brier / log-loss), an
embedding outlier gate, and the corpus mix report a data-budget owner
reads before every training run.

Same conventions as registry.py; sequential-merge oracle is the
3×-unrolled SQL of the per-batch semantics (an intermediate delete
genuinely differs from latest-only MERGE — the oracle replicates the
streaming order, not the shortcut).
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.testdata import load_table
from .registry import drain_stream, register

# registry_ext5 (whose _PROBA_SQL/corpus fragments this module reuses)
# composes oracle SQL from entries registered by the earlier extension
# modules at ITS import time — import the chain in registration order so
# importing this module standalone (tests) works like __spark_entry__.
from . import registry_ext as _ext  # noqa: F401
from . import registry_ext3 as _ext3  # noqa: F401
from . import registry_ext4 as _ext4  # noqa: F401
from . import registry_ext5 as _ext5  # noqa: F401
from .registry_ext import _TOKENS_SQL


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


# ---------------------------------------------------------------------------
# stream_cdc_upsert — the orders changelog replayed as THREE time-range
# batches (one file per tercile, oldest first) through foreachBatch,
# each batch MERGEd into the running snapshot with operators/cdc.py.
# Within a batch the latest change per key wins; across batches the
# later batch overwrites — so an intermediate delete loses snapshot-only
# columns (c_mktsegment) even if a later insert revives the key. The
# oracle unrolls exactly those three sequential merges.
# ---------------------------------------------------------------------------

_CDC_BATCH_BOUNDS = [
    ("o_orderdate < TIMESTAMP '1994-01-01'", None),
    (
        "o_orderdate >= TIMESTAMP '1994-01-01' "
        "AND o_orderdate < TIMESTAMP '1996-01-01'",
        None,
    ),
    ("o_orderdate >= TIMESTAMP '1996-01-01'", None),
]


def _stream_cdc_sql() -> str:
    parts = [
        """
WITH s0 AS (
  SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
  WHERE c_custkey % 3 <> 0
)"""
    ]
    for i, (where, _) in enumerate(_CDC_BATCH_BOUNDS):
        parts.append(
            f""",
ch{i} AS (
  SELECT o_custkey AS c_custkey,
         CASE WHEN o_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op,
         o_totalprice AS new_bal,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders WHERE {where}
),
l{i} AS (SELECT c_custkey, op, new_bal FROM ch{i} WHERE rn = 1),
s{i + 1} AS (
  SELECT COALESCE(s.c_custkey, l.c_custkey) AS c_custkey,
         CASE WHEN l.op = 'U' THEN l.new_bal ELSE s.c_acctbal END
           AS c_acctbal,
         s.c_mktsegment AS c_mktsegment
  FROM s{i} s FULL OUTER JOIN l{i} l ON s.c_custkey = l.c_custkey
  WHERE l.op IS NULL OR l.op <> 'D'
)"""
        )
    parts.append(
        f"\nSELECT c_custkey, c_acctbal, c_mktsegment FROM s{len(_CDC_BATCH_BOUNDS)}"
    )
    return "".join(parts)


def _write_single_parquet(df: DataFrame, dest: str) -> None:
    """Write ``df`` as ONE parquet file at ``dest`` (FileStreamSource
    treats every file as a unit, so each batch must be a single file)."""
    tmp = dest + "_tmpdir"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    shutil.move(part, dest)
    shutil.rmtree(tmp, ignore_errors=True)


@register("stream_cdc_upsert", _stream_cdc_sql())
def q_stream_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Streaming MERGE: each micro-batch folds into a localCheckpoint'ed
    # snapshot (driver holds a handle, executors hold the data) — the
    # production form writes the snapshot to a Delta/parquet store per
    # batch with the same cdc_apply plan. File mtimes are staggered so
    # FileStreamSource (oldest-first) replays the terciles in order.
    from ..operators.cdc import cdc_apply

    orders = _t(spark, sf_dir, "orders")
    src_dir = f"/tmp/spark_graft_stream_cdc_{os.getpid()}"  # per-process: no clash if a bench and a correctness run overlap
    shutil.rmtree(src_dir, ignore_errors=True)
    os.makedirs(src_dir, exist_ok=True)
    for i, (where, _) in enumerate(_CDC_BATCH_BOUNDS):
        dest = os.path.join(src_dir, f"b{i}.parquet")
        _write_single_parquet(orders.where(F.expr(where)), dest)
        os.utime(dest, (1_700_000_000 + i, 1_700_000_000 + i))

    snap = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 3 != 0)
        .select("c_custkey", "c_acctbal", "c_mktsegment")
    )
    state = {"df": snap.localCheckpoint(eager=True)}

    def _merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        changes = batch_df.select(
            F.col("o_custkey").alias("c_custkey"),
            F.when(F.col("o_orderkey") % 10 == 0, F.lit("D"))
            .otherwise(F.lit("U"))
            .alias("op"),
            "o_orderdate",
            "o_orderkey",
            F.col("o_totalprice").alias("c_acctbal"),
        )
        state["df"] = cdc_apply(
            state["df"],
            changes,
            keys=["c_custkey"],
            order_cols=["o_orderdate", "o_orderkey"],
            op_col="op",
        ).localCheckpoint(eager=True)

    stream = (
        spark.readStream.schema(orders.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        stream.writeStream.foreachBatch(_merge_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", src_dir + "_ckpt")
        .start()
    )
    drain_stream(q)
    shutil.rmtree(src_dir + "_ckpt", ignore_errors=True)
    return state["df"]


# ---------------------------------------------------------------------------
# proper_scoring — Brier score + log-loss of the pinned probability
# model: the two proper scoring rules mlflow.evaluate reports next to
# the curve artifacts (churn_model_training.py:144-168 consumers).
# ---------------------------------------------------------------------------


def _proper_scoring_sql() -> str:
    from .registry_ext5 import _PROBA_SQL

    return f"""
WITH scored AS ({_PROBA_SQL})
SELECT round(avg(pow(proba - churn, 2)), 6) AS brier,
       round(avg(-(churn * ln(greatest(proba, 1e-15))
                   + (1 - churn) * ln(greatest(1 - proba, 1e-15)))), 6)
         AS log_loss,
       count(*) AS n
FROM scored
"""


@register("proper_scoring", _proper_scoring_sql())
def q_proper_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One keyless aggregate (map-side partial). Probabilities clamped at
    # 1e-15 exactly as sklearn's log_loss does; ln is libm-dependent →
    # rounded at 6 on both engines, like every exp/log in the registry.
    from .registry_ext5 import _proba_scored

    s = _proba_scored(spark, sf_dir)
    churn_d = F.col("churn").cast("double")
    ll_term = -(
        churn_d * F.log(F.greatest(F.col("proba"), F.lit(1e-15)))
        + (1 - churn_d) * F.log(F.greatest(1 - F.col("proba"), F.lit(1e-15)))
    )
    return s.agg(
        F.round(F.avg(F.pow(F.col("proba") - churn_d, 2)), 6).alias("brier"),
        F.round(F.avg(ll_term), 6).alias("log_loss"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# embedding_outliers — top-20 diagonal-Mahalanobis outliers vs the
# corpus centroid (operators/similarity.py): zero-shuffle scoring via
# stats-as-literals, TakeOrdered top-k.
# ---------------------------------------------------------------------------

_OUTLIERS_SQL = """
WITH ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
stats AS (
  SELECT pos, round(avg(x), 6) AS mu, round(var_pop(x), 6) AS var
  FROM ex GROUP BY pos
),
s AS (
  SELECT vec_id,
         round(sqrt(sum(pow(x - mu, 2) / greatest(var, 1e-12))), 6) AS score
  FROM ex JOIN stats USING (pos)
  GROUP BY vec_id
)
SELECT vec_id, score FROM s ORDER BY score DESC, vec_id LIMIT 20
"""


@register("embedding_outliers", _OUTLIERS_SQL)
def q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import embedding_outliers

    return embedding_outliers(_t(spark, sf_dir, "embeddings"), k=20)


# ---------------------------------------------------------------------------
# corpus_mix_report — token budget per (lang, source): the table a
# data-mixture owner signs off before training. One grouped aggregate +
# a single-row total broadcast for the share column.
# ---------------------------------------------------------------------------

_MIX_SQL = f"""
WITH t AS (
  SELECT lang, source, len({_TOKENS_SQL}) AS n_tokens FROM documents
),
g AS (
  SELECT lang, source, count(*) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS n_tokens
  FROM t GROUP BY lang, source
),
tot AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS total FROM g)
SELECT lang, source, n_docs, n_tokens,
       round(n_tokens / total, 6) AS token_share
FROM g, tot
"""


@register("corpus_mix_report", _MIX_SQL)
def q_corpus_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import tokens

    docs = _t(spark, sf_dir, "documents")
    t = docs.select(
        "lang", "source", F.size(tokens(F.col("text"))).alias("n_tokens")
    )
    g = t.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
    )
    tot = g.agg(F.sum("n_tokens").cast("double").alias("total"))
    return g.crossJoin(F.broadcast(tot)).select(
        "lang",
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens") / F.col("total"), 6).alias("token_share"),
    )
