"""Text-analysis operators."""

from __future__ import annotations

import pytest

from churn_model_evaluation_platform_spark.operators.text import (
    doc_fingerprint,
    lang_id,
    text_quality,
    token_count,
)


def test_token_count(spark):
    df = spark.createDataFrame(
        [(1, "one  two   three"), (2, "single")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r["n_tokens"] for r in token_count(df).collect()}
    assert out == {1: 3, 2: 1}


def test_lang_id(spark):
    rows = [
        (1, "the cat and the dog went to the house of friends"),
        (2, "der hund und die katze sind nicht mit dem mann"),
        (3, "le chat est dans les maisons pour une souris qui dort"),
        (4, "el perro come por una casa pero sus amigos muy lejos"),
        (5, "zzz qqq www rrr"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["lang_pred"] for r in lang_id(df).collect()}
    assert out == {1: "en", 2: "de", 3: "fr", 4: "es", 5: "unknown"}


def test_text_quality_ranges(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox is in the yard"), (2, "x!!! ###")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in text_quality(df).collect()}
    good, bad = rows[1], rows[2]
    assert good["n_tokens"] == 8.0
    assert 0.0 <= good["quality_score"] <= 1.0
    assert good["alpha_ratio"] > bad["alpha_ratio"]
    assert good["quality_score"] > bad["quality_score"]
    # hits: the, is, in, the → 4 of 8 tokens
    assert good["stopword_ratio"] == pytest.approx(4 / 8)


def test_doc_fingerprint_stable(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "A  b C d E"), (3, "f g h i j")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in doc_fingerprint(df).collect()}
    # same normalized content → identical fingerprint fields
    assert rows[1]["content_md5"] == rows[2]["content_md5"]
    assert rows[1]["min_shingle_hash"] == rows[2]["min_shingle_hash"]
    assert rows[1]["n_shingles"] == 3  # 5 tokens → 3 trigram shingles
    assert rows[1]["content_md5"] != rows[3]["content_md5"]


def test_quality_filter_reject_reasons(spark):
    from churn_model_evaluation_platform_spark.operators.text import quality_filter

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat with a hat and a bat"),  # keeps
            (2, "one two"),  # too few tokens
            (3, "zzz qqq xxx www vvv uuu ttt sss"),  # no stopwords
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["keep"], r["reject_reason"]) for r in quality_filter(docs).collect()}
    assert got[1] == (True, "")
    assert got[2] == (False, "too_few_tokens")
    assert got[3] == (False, "low_stopword_ratio")


def test_top_ngrams_doc_frequency_not_occurrence(spark):
    from churn_model_evaluation_platform_spark.operators.text import top_ngrams

    docs = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "a b c"), (3, "c d e")],
        "doc_id long, text string",
    )
    rows = top_ngrams(docs, n=2, k=3).collect()
    top = {r["ngram"]: r["doc_freq"] for r in rows}
    assert top["a b"] == 2  # docs 1 and 2 — repeats within doc 1 not counted


def test_token_count_bpe_pinned(spark):
    from churn_model_evaluation_platform_spark.operators.text import token_count_bpe

    docs = spark.createDataFrame(
        [(1, "I can't stop, won't stop: 42 times!")],
        "doc_id long, text string",
    )
    # I | can | 't | stop | , | won | 't | stop | : | 42 | times | !
    assert token_count_bpe(docs).first()["n_bpe_tokens"] == 12


def test_repetition_stats_pinned(spark):
    from churn_model_evaluation_platform_spark.operators.text import repetition_stats

    docs = spark.createDataFrame(
        [(1, "x y\nx y\nz"), (2, "a b c d")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    # doc 1: 3 lines, 2 distinct → 1/3 dup; 5 tokens [x y x y z], 3 distinct → 2/5
    assert got[1]["line_dup_ratio"] == pytest.approx(1 / 3, abs=1e-6)
    assert got[1]["token_dup_ratio"] == pytest.approx(2 / 5, abs=1e-6)
    assert got[2]["line_dup_ratio"] == 0.0 and got[2]["token_dup_ratio"] == 0.0


def test_tfidf_top_terms_ranking(spark):
    from churn_model_evaluation_platform_spark.operators.text import (
        tfidf_top_terms,
    )

    rows = [
        (1, "apple apple banana shared"),
        (2, "cherry shared shared"),
        (3, "durian shared"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = tfidf_top_terms(df, k=2)
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], []).append(r["token"])
    # doc 1: 'apple' (tf=2, rare) must outrank the corpus-wide 'shared'
    assert got[1][0] == "apple"
    # doc 2: 'shared' tf=2 * idf(ln(4/4)+1)=2.0 beats 'cherry'
    # tf=1 * idf(ln(4/2)+1)=1.69; cherry is second
    assert got[2] == ["shared", "cherry"]
    assert got[3][0] == "durian"
    # k bounds every doc's list
    assert all(len(v) <= 2 for v in got.values())


def test_pii_scrub_counts_and_redaction(spark):
    from churn_model_evaluation_platform_spark.operators.text import pii_scrub

    rows = [
        (1, "mail bob.smith+x@corp.co.uk or 10.0.0.1 call +1 (555) 123-4567"),
        (2, "no pii here at all"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert set(out) == {1, 2}  # null text dropped
    r1 = out[1]
    assert (r1["n_email"], r1["n_ipv4"], r1["n_phone"]) == (1, 1, 1)
    assert "<EMAIL>" in r1["scrubbed"]
    assert "<IP>" in r1["scrubbed"]
    assert "<PHONE>" in r1["scrubbed"]
    assert "corp.co.uk" not in r1["scrubbed"]
    assert out[2]["scrubbed"] == "no pii here at all"
    assert (out[2]["n_email"], out[2]["n_ipv4"], out[2]["n_phone"]) == (0, 0, 0)


def test_doc_chunks_windows(spark):
    from churn_model_evaluation_platform_spark.operators.text import doc_chunks

    words = " ".join(f"w{i}" for i in range(12))
    df = spark.createDataFrame([(1, words), (2, "short text")], ["doc_id", "text"])
    out = doc_chunks(df, chunk_tokens=5, overlap=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: 12 tokens, stride 3 -> starts 0,3,6,9 -> 4 chunks
    chunks = sorted(by_doc[1], key=lambda r: r["chunk_index"])
    assert [r["chunk_index"] for r in chunks] == [0, 1, 2, 3]
    assert chunks[0]["chunk_text"] == "w0 w1 w2 w3 w4"
    assert chunks[1]["chunk_text"] == "w3 w4 w5 w6 w7"  # 2-token overlap
    assert chunks[3]["chunk_text"] == "w9 w10 w11"  # short tail
    assert chunks[3]["n_tokens"] == 3
    # doc 2: 2 tokens -> one chunk
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_text"] == "short text"


def test_lm_score_flags_unusual_text(spark):
    from churn_model_evaluation_platform_spark.operators.text import lm_score

    common = "the cat sat on the mat"
    rows = [(i, common) for i in range(1, 9)]
    rows.append((9, "zzz qqq vvv www uuu ttt"))  # tokens seen once each
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in lm_score(df).collect()}
    # the gibberish doc scores strictly worse than every common doc
    for i in range(1, 9):
        assert got[9]["lm_logprob"] < got[i]["lm_logprob"]
    assert got[1]["n_tokens"] == 6
    # all common docs share one score (identical token multisets)
    assert len({got[i]["lm_logprob"] for i in range(1, 9)}) == 1


def test_sequence_pack_semantics(spark):
    from churn_model_evaluation_platform_spark.operators.text import sequence_pack

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "e f g"), (3, "h i j k l"), (4, "m")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in sequence_pack(docs, ctx_len=5).collect()}
    # stream: d1 tokens 0-3, d2 4-6, d3 7-11, d4 12
    assert rows[1]["start_offset"] == 0 and rows[1]["pack_first"] == 0
    assert rows[1]["pack_last"] == 0
    assert rows[2]["start_offset"] == 4  # straddles packs 0 and 1
    assert (rows[2]["pack_first"], rows[2]["pack_last"]) == (0, 1)
    assert (rows[3]["pack_first"], rows[3]["pack_last"]) == (1, 2)
    assert (rows[4]["pack_first"], rows[4]["pack_last"]) == (2, 2)
    # stable under repartition (prefix sum is layout-independent)
    rows2 = {
        r["doc_id"]: r
        for r in sequence_pack(docs.repartition(3), ctx_len=5).collect()
    }
    assert {k: tuple(v) for k, v in rows.items()} == {
        k: tuple(v) for k, v in rows2.items()
    }


def test_sequence_pack_zero_token_doc(spark):
    from churn_model_evaluation_platform_spark.operators.text import sequence_pack

    # doc 2 is whitespace-only (normalizes to '' → 1 empty token per
    # split semantics? no: size(split('', ' ')) == 1) — use the real
    # boundary: a doc whose tokens exactly fill a window, followed by
    # docs straddling it.
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "f g"), (3, "h")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in sequence_pack(docs, ctx_len=5).collect()}
    # doc 1 fills pack 0 exactly: pack_last must stay 0, not -1 math
    assert (rows[1]["pack_first"], rows[1]["pack_last"]) == (0, 0)
    # doc 2 starts exactly at the window boundary
    assert (rows[2]["pack_first"], rows[2]["pack_last"]) == (1, 1)
    # pack_last >= pack_first invariant everywhere
    for r in rows.values():
        assert r["pack_last"] >= r["pack_first"]
