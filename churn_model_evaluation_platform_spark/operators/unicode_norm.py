"""Unicode NFC canonicalization (UAX #15) for the dedup/canonical-form
path — the curation gap byte-level hashing can't paper over: a
composed ``é`` (U+00E9) and its decomposed twin (``e`` + U+0301) are
the SAME text to every downstream consumer but different bytes, so
``md5(normalize_text(...))`` dedup keeps both copies and near-dup
metrics see phantom differences. Every serious corpus pipeline
canonicalizes before hashing.

Spark has no built-in Unicode normalizer, so the normalize step is
Python's ``unicodedata`` (a C implementation of the same UAX #15
tables DuckDB's ``nfc_normalize`` uses) run through a map-only
``mapInArrow`` pass, with ``unicodedata.is_normalized`` — the UAX #15
quick-check, implemented in C — deciding per string whether any
rewrite/allocation happens at all (already-NFC text, including all
ASCII, passes through untouched). Zero shuffle at any corpus size.

The differential is REAL here in a way most of the registry's
oracles can't be: Spark-side Python ``unicodedata.normalize`` is
checked against DuckDB's independent ``nfc_normalize``
implementation — two unrelated codebases implementing the same
standard must agree on every row (composed/decomposed Latin,
singleton mappings like U+212B ANGSTROM SIGN, Hangul jamo
composition, and NFC-invariant ligatures all probed in tests).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def nfc_normalize_py(s: str) -> str:
    import unicodedata

    if s is None:
        return None
    if unicodedata.is_normalized("NFC", s):
        return s
    return unicodedata.normalize("NFC", s)


def nfc_normalize_text(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, text) → (id, text_nfc). Map-only ``mapInArrow``; see the
    module docstring for the fast paths."""
    import pyarrow as pa

    def _norm(batches: Iterable["pa.RecordBatch"]):
        import unicodedata

        for batch in batches:
            ids = batch.column(0)
            texts = batch.column(1).to_pylist()
            out = [
                t
                if t is None or unicodedata.is_normalized("NFC", t)
                else unicodedata.normalize("NFC", t)
                for t in texts
            ]
            yield pa.record_batch(
                [ids, pa.array(out, pa.string())],
                names=[id_col, "text_nfc"],
            )

    return df.select(id_col, text_col).mapInArrow(
        _norm, f"{id_col} long, text_nfc string"
    )


def exact_dedup_nfc(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """``dedup.exact_dedup`` with NFC canonicalization FIRST: one row
    per distinct canonical content, min-id winner + copy count.
    Unicode-equivalent twins (composed vs decomposed) now collapse —
    byte-level md5 dedup provably keeps both (contrast pinned in
    tests and by the planted pairs in the registry query)."""
    from .text import normalize_text

    nfc = nfc_normalize_text(
        df.where(F.col(text_col).isNotNull()), text_col, id_col
    )
    h = F.md5(normalize_text(F.col("text_nfc")))
    return (
        nfc.select(F.col(id_col), h.alias("content_md5"))
        .groupBy("content_md5")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select(id_col, "content_md5", "n_copies")
    )


def exact_dedup_nfc_sql(source_sql: str) -> str:
    """DuckDB replay via its own independent ``nfc_normalize`` —
    same whitespace canonicalization, same min-id/copy-count shape."""
    norm = (
        "trim(regexp_replace(lower(nfc_normalize(text)),"
        " '\\s+', ' ', 'g'))"
    )
    return f"""
SELECT min(doc_id) AS doc_id, md5({norm}) AS content_md5,
       CAST(count(*) AS BIGINT) AS n_copies
FROM ({source_sql}) WHERE text IS NOT NULL
GROUP BY 2
"""
