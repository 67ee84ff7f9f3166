"""Large-vocabulary exact BPE (round 11, VERDICT r10 next #2): the
8192-entry pinned table applied through the O(1)-plan mapInArrow path
must equal the classic lowest-rank merge loop everywhere, the rank-order
replace chain (the oracle's replay mechanism) must equal the classic
loop on corpus words / rotated words / random words, and the plan must
not grow with vocabulary size."""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.operators import bpe
from churn_model_evaluation_platform_spark.operators.bpe import (
    RS,
    US,
    bpe_token_count_vocab,
    encode_word_classic,
    large_merges,
)
from churn_model_evaluation_platform_spark.operators.bpe_merges_large import (
    N_TRAINED,
)
from churn_model_evaluation_platform_spark.operators.text import (
    BPE_TOKEN_PATTERN,
)
from churn_model_evaluation_platform_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"
MERGES = large_merges()
RANK = {m: i for i, m in enumerate(MERGES)}


def _chain_encode(word: str, merges) -> list[str]:
    """The rank-order single-pass replace chain over one word — the
    exact mechanism of the DuckDB oracle's list_reduce and the 64-merge
    JVM path, in pure Python."""
    s = "".join(US + c + US for c in word)
    for a, b in merges:
        s = s.replace(US + a + US + US + b + US, US + a + b + US)
    s = s.replace(US + US, RS).replace(US, "")
    return [t for t in s.split(RS) if t]


@pytest.fixture(scope="module")
def corpus_words(spark):
    pat = re.compile(BPE_TOKEN_PATTERN)
    words = set()
    for r in load_table(spark, "documents", SF).select("text").collect():
        words.update(pat.findall(r["text"] or ""))
    assert words
    return sorted(words)


def test_table_shape():
    assert len(MERGES) == 8192
    assert len(set(MERGES)) == 8192  # no duplicate ranks
    assert 0 < N_TRAINED < 300  # the corpus bounds trainable merges
    # well-formed: every merge's parts are base chars or the product of
    # an EARLIER merge — the property both replay mechanisms rely on
    produced = set()
    for a, b in MERGES:
        for part in (a, b):
            assert len(part) == 1 or part in produced, (a, b)
        produced.add(a + b)
    # control separators can never collide with token text
    assert all(US not in a + b and RS not in a + b for a, b in MERGES)


def test_chain_equals_classic_on_corpus_words(corpus_words):
    for w in corpus_words:
        assert _chain_encode(w, MERGES) == encode_word_classic(w, RANK), w


def test_chain_equals_classic_on_rotated_words(corpus_words):
    # the bench slope probe vowel-rotates document text, creating words
    # the trainer never saw — both mechanisms must still agree
    tr = str.maketrans("aeiou", "eioua")
    for w in corpus_words:
        r = w.translate(tr)
        assert _chain_encode(r, MERGES) == encode_word_classic(r, RANK), r


@given(
    st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz0123456789",
        min_size=1,
        max_size=24,
    )
)
@settings(max_examples=300, deadline=None)
def test_chain_equals_classic_on_random_words(w):
    assert _chain_encode(w, MERGES) == encode_word_classic(w, RANK)


def test_trained_prefix_fires_somewhere(corpus_words):
    # every exhaustion-trained merge fires on at least one corpus word;
    # the padding entries are inert on this corpus by construction
    fired = set()
    for w in corpus_words:
        syms = list(w)
        n = len(MERGES)
        while len(syms) > 1:
            best_i, best_r = -1, n
            for i in range(len(syms) - 1):
                r = RANK.get((syms[i], syms[i + 1]), n)
                if r < best_r:
                    best_i, best_r = i, r
            if best_i < 0 or best_r >= n:
                break
            fired.add(best_r)
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    assert fired == set(range(N_TRAINED))


def test_operator_matches_reference_counts(spark):
    docs = load_table(spark, "documents", SF)
    got = {
        r["doc_id"]: r["n_tokens_exact"]
        for r in bpe_token_count_vocab(docs).collect()
    }
    pat = re.compile(BPE_TOKEN_PATTERN)
    memo: dict[str, int] = {}
    for r in docs.select("doc_id", "text").collect():
        n = 0
        for w in pat.findall(r["text"] or ""):
            if w not in memo:
                memo[w] = len(encode_word_classic(w, RANK))
            n += memo[w]
        assert got[r["doc_id"]] == n, r["doc_id"]


def test_zero_token_docs_report_zero(spark):
    df = spark.createDataFrame(
        [(1, "window scan"), (2, ""), (3, None)], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r["n_tokens_exact"] for r in bpe_token_count_vocab(df).collect()}
    assert got[2] == 0 and got[3] == 0 and got[1] > 0


def test_plan_depth_independent_of_vocab(spark):
    # the whole point of the scale path: an 8192-merge table must not
    # appear as 8192 nested expressions (the replace chain would)
    docs = load_table(spark, "documents", SF)
    plan = bpe_token_count_vocab(docs)._jdf.queryExecution().toString()
    assert plan.count("replace(") < 10
    assert len(plan) < 200_000
    # and the tiny-vocab chain path still exists for JVM-only callers
    small = bpe.bpe_token_count(docs)
    assert small.count() == docs.count()


def test_small_vocab_agreement(spark):
    # on the 64-merge pinned vocab, the scale path and the JVM replace
    # chain are the same function
    docs = load_table(spark, "documents", SF)
    a = {
        r["doc_id"]: r["n_tokens_exact"]
        for r in bpe_token_count_vocab(docs, merges=bpe.BPE_MERGES).collect()
    }
    b = {
        r["doc_id"]: r["n_tokens_exact"]
        for r in bpe.bpe_token_count(docs).collect()
    }
    assert a == b
