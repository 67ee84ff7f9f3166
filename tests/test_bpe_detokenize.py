"""Detokenization under the real vocabulary (operators/bpe_vocab.py
bpe_detokenize, round 12): tokenize→detokenize is the identity on the
pre-token partition of the text — the registry pins it cross-engine
(detokenize_real); here the unit surfaces and the non-ASCII Python
reference."""

from __future__ import annotations

import re

from churn_model_evaluation_platform_spark.operators.bpe_vocab import (
    GPT2_SPLIT_PATTERN_PORTABLE,
    bpe_detokenize,
    bpe_tokenize_ids,
    byte_decode,
    byte_encode,
    py_pattern,
)

_TEXTS = [
    "order 12345 customer 899 date 1998-10-03 status P priority 5-LOW",
    "the fast key order sort table scan merge",
    "it's a test, really: 3.14 items!",
    "tabs\tand\nnewlines survive byte-level round trips",
]


def test_byte_decode_inverts_byte_encode():
    for t in _TEXTS + ["héllo wörld", "日本語テキスト", "\x01\x02"]:
        assert byte_decode(byte_encode(t)) == t


def test_spark_round_trip_is_identity(spark):
    df = spark.createDataFrame(
        list(enumerate(_TEXTS)), "doc_id long, text string"
    )
    ids = bpe_tokenize_ids(df, pattern=GPT2_SPLIT_PATTERN_PORTABLE)
    out = {
        r["doc_id"]: r["text_rebuilt"]
        for r in bpe_detokenize(ids).collect()
    }
    assert out == dict(enumerate(_TEXTS))


def test_pre_tokens_partition_the_text():
    """The identity argument rests on the pattern covering every
    character exactly once — pin it on adversarial ASCII."""
    pyc = re.compile(py_pattern(GPT2_SPLIT_PATTERN_PORTABLE))
    for t in _TEXTS + ["a  b", " lead", "trail ", "!@#$%", "__x__"]:
        assert "".join(pyc.findall(t)) == t, t
