"""Round-15 registry extensions — tokenizer TRAINING plus the crawl
hygiene stages a 100 TB pipeline runs before any text gate:

* ``bpe_train_merges`` / ``bpe_train_vocab`` — distributed BPE
  tokenizer training (the engine previously only APPLIED merge
  tables): K iterations of weighted pair counting + argmax + a
  Catalyst leftmost-scan merge fold over a word-frequency table. The
  DuckDB oracle replays the WHOLE training run as a generated K-level
  materialized-CTE chain, so every learned merge, its count, the
  tie-break order, and the final vocabulary segmentation are
  hash-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.bpe_train import bpe_train, bpe_train_sql
from .registry import register
from .registry_ext12 import _t

_BPE_K = 12

_MERGES_SCHEMA = (
    "step int, left_sym string, right_sym string, "
    "merged string, pair_count bigint"
)


@register("bpe_train_merges", bpe_train_sql(_BPE_K))
def q_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned merge table itself — K ordered rows of
    (step, left, right, merged, pair count). The result is the model
    artifact (O(K) driver state); the oracle re-derives every row by
    replaying training in SQL."""
    merges, _wf = bpe_train(_t(spark, sf_dir, "documents"), k=_BPE_K)
    return spark.createDataFrame(merges, _MERGES_SCHEMA)


_VOCAB_SQL = bpe_train_sql(_BPE_K, merges_select=False) + f"""
SELECT s AS symbol,
       CAST(sum(cnt) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT word) AS BIGINT) AS n_word_types
FROM (
  SELECT word, cnt, unnest(string_split(sym, ' ')) AS s FROM w{_BPE_K}
)
GROUP BY 1
"""


@register("bpe_train_vocab", _VOCAB_SQL)
def q_bpe_train_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained segmentation of the corpus vocabulary: every symbol
    surviving after K merges, with its corpus-weighted token count and
    the number of word types containing it — the table a tokenizer
    build would freeze as its vocab file. Shares the training run with
    ``bpe_train_merges``; one explode over the |vocab|-row frame."""
    _merges, wf = bpe_train(_t(spark, sf_dir, "documents"), k=_BPE_K)
    return (
        wf.select(
            "word",
            "cnt",
            F.explode(F.split(F.col("sym"), " ")).alias("symbol"),
        )
        .groupBy("symbol")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_tokens"),
            F.countDistinct("word").cast("bigint").alias("n_word_types"),
        )
    )
