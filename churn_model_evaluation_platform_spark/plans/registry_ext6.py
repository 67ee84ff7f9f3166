"""Round-6 registry extensions: measured quality for the approximate
dedup path (VERDICT r5 #5) and multimodal breadth.

Same conventions as registry.py: every computed column aliased
identically on both engines; order-dependent float aggregates rounded
on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import dedup
from ..sources.testdata import load_table
from .registry import register
from .registry_ext import (
    _BAND_KEYS_SQL,
    _BAND_MATCH_SQL,
    _MINHASH_SELECT,
    _SHINGLE_HASH_CTE,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


# ---------------------------------------------------------------------------
# dedup_lsh_recall — candidate-pair recall of banded MinHash-LSH vs the
# exact n-gram Jaccard ground truth at the same threshold (0.1, matching
# dedup_ngram_jaccard / dedup_lsh_verified). One summary row; the oracle
# composes the two already-verified SQL bodies so both engines agree on
# BOTH sides of the ratio, not just the final number.
# ---------------------------------------------------------------------------

_LSH_RECALL_SQL = f"""
{_SHINGLE_HASH_CTE},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
exact AS (
  SELECT id_a, id_b
  FROM common
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE CAST(common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - common AS DOUBLE) >= 0.1
),
sigs AS ({_MINHASH_SELECT}),
banded AS (SELECT sigs.*, {_BAND_KEYS_SQL} FROM sigs),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.doc_id < b.doc_id AND ({_BAND_MATCH_SQL})
)
SELECT count(*) AS n_true_pairs,
       count(c.id_a) AS n_recalled,
       round(CAST(count(c.id_a) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS recall
FROM exact e LEFT JOIN cand c ON c.id_a = e.id_a AND c.id_b = e.id_b
"""


@register("dedup_lsh_recall", _LSH_RECALL_SQL)
def q_dedup_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    # QA/audit operator certifying the (k=16, bands=4) LSH config: what
    # share of true Jaccard>=0.1 pairs survive candidate generation.
    # Run on a sample at scale — the exact side is the self-join LSH
    # replaces (see operators/dedup.py:lsh_candidate_recall).
    return dedup.lsh_candidate_recall(
        _t(spark, sf_dir, "documents"), n=3, threshold=0.1
    )


# ---------------------------------------------------------------------------
# multimodal_decode_jpeg — REAL baseline-sequential JPEG pixel decode
# (Huffman + dequant + IDCT, operators/multimodal.py:_jpeg_decode).
# Fixtures are DC-only grayscale JPEGs with a uniform quant table of 8s,
# so block bi of media m decodes to a flat 8x8 of ((m + 7*bi) % 128) + 64
# exactly — every statistic the decoder produces is predicted
# arithmetically by the oracle. An error in the marker writer, Huffman
# tables, entropy coding, dequantization OR the IDCT breaks the hash.
# ---------------------------------------------------------------------------

_JPEG_DECODE_SQL = """
WITH g AS (
  SELECT doc_id AS media_id,
         CAST(1 + doc_id % 4 AS INT) AS bx,
         CAST(1 + doc_id % 3 AS INT) AS by
  FROM documents
),
px AS (
  SELECT media_id, bx, by, ((media_id + 7 * bi) % 128) + 64 AS v
  FROM g CROSS JOIN generate_series(0, 11) bis(bi)
  WHERE bi < bx * by
)
SELECT media_id, 'jpeg' AS format,
       CAST(bx * 8 * by * 8 AS BIGINT) AS n_values,
       round(avg(v), 6) AS mean_value,
       CAST(min(v) AS DOUBLE) AS min_value,
       CAST(max(v) AS DOUBLE) AS max_value
FROM px GROUP BY media_id, bx, by
"""


@register("multimodal_decode_jpeg", _JPEG_DECODE_SQL)
def q_multimodal_decode_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as _pd

    from ..operators.multimodal import decode_media, synth_jpeg_bytes

    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "content": [synth_jpeg_bytes(int(m)) for m in pdf["doc_id"]],
                }
            )

    media = docs.mapInPandas(synth, "media_id long, content binary")
    return decode_media(media)
