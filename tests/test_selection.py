"""Data-selection operators (operators/selection.py, round 12):
stupid-backoff bigram-LM perplexity scoring (the CCNet filter recipe)
and DSIR hashed-ngram importance weights, plus RRF fusion
(operators/similarity.py rrf_fuse) and the tokenizer fertility audit
(operators/bpe_vocab.py). Registry twins: lm_perplexity_bigram,
dsir_select_en, hybrid_topk_rrf, tokenizer_fertility_real."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.operators.selection import (
    bigram_lm_scores,
    dsir_importance_weights,
    dsir_select,
)
from churn_model_evaluation_platform_spark.operators.similarity import rrf_fuse


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# bigram LM
# ---------------------------------------------------------------------------


def test_bigram_lm_hand_computed(spark):
    # train: "a b a b c" → uni a2 b2 c1 (T=5, V=3);
    # bigrams: "a b"x2, "b a", "b c" → c("a b")=2, ctx(a)=2.
    # eval: "a b x" → "a b" seen: ln(2/2)=0; "b x" backoff, x unseen:
    # ln(0.4 * 1 / 8) = ln(0.05) ≈ -2.995732 (rounded grain 1e-6).
    train = _docs(spark, [(0, "a b a b c")])
    ev = _docs(spark, [(1, "a b x")])
    row = bigram_lm_scores(train, ev).collect()[0]
    assert row["n_bigrams"] == 2
    assert row["n_backoff"] == 1
    expect_mean = round((0 + round(math.log(0.05) * 1e6)) / 2e6, 6)
    assert row["lm_logprob"] == expect_mean
    assert row["ppl"] == round(math.exp(-expect_mean), 4)


def test_bigram_lm_seen_branch_is_conditional_probability(spark):
    # Context counts use w1-as-context totals, not raw unigram counts:
    # train "a b a c" → ctx(a)=2 (a b, a c), so p(b|a)=1/2 even though
    # count(a)=2 == ctx(a) here; distinguish via "b a" context b=1.
    train = _docs(spark, [(0, "a b a c")])
    ev = _docs(spark, [(1, "a b")])
    row = bigram_lm_scores(train, ev).collect()[0]
    assert row["n_backoff"] == 0
    assert row["lm_logprob"] == round(
        round(math.log(0.5) * 1e6) / 1e6, 6
    )


def test_bigram_lm_short_docs_excluded(spark):
    train = _docs(spark, [(0, "a b a b")])
    ev = _docs(spark, [(1, "a"), (2, "a b"), (3, None)])
    got = {r["doc_id"] for r in bigram_lm_scores(train, ev).collect()}
    assert got == {2}


def test_bigram_lm_backoff_ranks_gibberish_below_indomain(spark):
    train = _docs(
        spark, [(i, "the fast scan reads the sorted table") for i in range(4)]
    )
    ev = _docs(
        spark,
        [
            (10, "the fast scan reads the sorted table"),
            (11, "zq xv qqj zzk wpt vvx bbn mml"),
        ],
    )
    rows = {r["doc_id"]: r for r in bigram_lm_scores(train, ev).collect()}
    assert rows[10]["ppl"] < rows[11]["ppl"]
    assert rows[11]["n_backoff"] == rows[11]["n_bigrams"]


# ---------------------------------------------------------------------------
# DSIR
# ---------------------------------------------------------------------------


def test_dsir_weights_separate_target_like_from_raw_like(spark):
    # Target slice speaks 'alpha beta'; the raw remainder speaks
    # 'gamma delta'. Two probe docs (one per dialect) must separate.
    rows = [(i, "alpha beta alpha beta") for i in range(10)]
    rows += [(100 + i, "gamma delta gamma delta") for i in range(10)]
    rows += [(500, "alpha beta"), (501, "gamma delta")]
    df = _docs(spark, rows)
    w = {
        r["doc_id"]: r["dsir_weight"]
        for r in dsir_importance_weights(
            df, F.col("doc_id") < 100, n_buckets=64
        ).collect()
    }
    assert w[500] > 0 > w[501]
    assert w[500] > w[501]


def test_dsir_select_topn_deterministic_tiebreak(spark):
    # Identical texts → identical weights; the id tie-break pins the cut.
    df = _docs(spark, [(i, "same text here") for i in range(6)])
    sel = dsir_select(
        dsir_importance_weights(df, F.col("doc_id") % 2 == 0, n_buckets=32),
        n=3,
    ).collect()
    assert [r["doc_id"] for r in sel] == [0, 1, 2]


# ---------------------------------------------------------------------------
# RRF fusion
# ---------------------------------------------------------------------------


def test_rrf_fuse_hand_computed(spark):
    a = spark.createDataFrame(
        [(1, 3.0), (2, 2.0), (3, 1.0)], "doc_id long, score double"
    )
    b = spark.createDataFrame(
        [(3, 9.0), (4, 1.0)], "doc_id long, score double"
    )
    out = rrf_fuse([a, b], k0=60, k=4).collect()
    got = [(r["doc_id"], r["rank_0"], r["rank_1"]) for r in out]
    # id3: 1/63+1/61 (top); id1: 1/61; then the 1/62 tie id2 vs id4
    # breaks on id.
    assert got == [(3, 3, 1), (1, 1, None), (2, 2, None), (4, None, 2)]
    assert out[0]["rrf_score"] == round(1 / 63 + 1 / 61, 9)
    assert out[1]["rrf_score"] == round(1 / 61, 9)
    assert out[2]["rrf_score"] == out[3]["rrf_score"] == round(1 / 62, 9)


def test_rrf_fuse_rank_ties_break_on_id(spark):
    a = spark.createDataFrame(
        [(7, 1.0), (5, 1.0)], "doc_id long, score double"
    )
    out = rrf_fuse([a], k0=60, k=2).collect()
    assert [(r["doc_id"], r["rank_0"]) for r in out] == [(5, 1), (7, 2)]


# ---------------------------------------------------------------------------
# tokenizer fertility
# ---------------------------------------------------------------------------


def test_tokenizer_fertility_hand_computed(spark):
    from churn_model_evaluation_platform_spark.operators.bpe_vocab import (
        tokenizer_fertility_bytes,
    )

    # No merge fires → one token per byte-encoded symbol: "aa bb" →
    # pre-tokens "aa" (2) + " bb" (3, the Ġ counts) = 5 tokens over 2
    # whitespace words and 5 bytes.
    df = spark.createDataFrame(
        [(0, "aa bb", "en")], "doc_id long, text string, lang string"
    )
    row = tokenizer_fertility_bytes(df, merges=[("x", "y")]).collect()[0]
    assert row["lang"] == "en"
    assert row["n_docs"] == 1
    assert row["n_tokens"] == 5
    assert row["fertility"] == 2.5
    assert row["bytes_per_token"] == 1.0


# ---------------------------------------------------------------------------
# DSIR Gumbel sampling
# ---------------------------------------------------------------------------


def _py_gumbel_key(doc_id, weight, seed=42):
    import hashlib

    h = int(
        hashlib.md5(f"{doc_id}|gumbel|{seed}".encode()).hexdigest()[:7], 16
    )
    u = (h + 1.0) / float(16**7 + 1)
    return round(weight + round(-math.log(-math.log(u)), 6), 6)


def test_dsir_gumbel_key_hand_computed(spark):
    from churn_model_evaluation_platform_spark.operators.selection import (
        dsir_gumbel_sample,
    )

    w = spark.createDataFrame(
        [(7, 1.25), (8, -0.5)], "doc_id long, dsir_weight double"
    )
    got = {
        r["doc_id"]: r["gumbel_key"]
        for r in dsir_gumbel_sample(w, n=2, seed=42).collect()
    }
    assert got[7] == _py_gumbel_key(7, 1.25)
    assert got[8] == _py_gumbel_key(8, -0.5)


def test_dsir_gumbel_reproducible_and_seed_sensitive(spark):
    from churn_model_evaluation_platform_spark.operators.selection import (
        dsir_gumbel_sample,
    )

    w = spark.createDataFrame(
        [(i, 0.0) for i in range(40)], "doc_id long, dsir_weight double"
    )
    s1 = [r["doc_id"] for r in dsir_gumbel_sample(w, n=10, seed=1).collect()]
    s1b = [r["doc_id"] for r in dsir_gumbel_sample(w, n=10, seed=1).collect()]
    s2 = [r["doc_id"] for r in dsir_gumbel_sample(w, n=10, seed=2).collect()]
    assert s1 == s1b
    assert s1 != s2  # equal weights: the sample IS the noise


def test_dsir_gumbel_weight_dominates_noise(spark):
    from churn_model_evaluation_platform_spark.operators.selection import (
        dsir_gumbel_sample,
    )

    # Gumbel noise from u in (0,1) spans a bounded range at grain 1e-7
    # of u; a +100 weight gap cannot be overcome by any seed.
    rows = [(0, 100.0)] + [(i, 0.0) for i in range(1, 30)]
    w = spark.createDataFrame(rows, "doc_id long, dsir_weight double")
    for seed in (1, 2, 3):
        top = dsir_gumbel_sample(w, n=1, seed=seed).collect()[0]
        assert top["doc_id"] == 0


# ---------------------------------------------------------------------------
# token-level decontamination plant property
# ---------------------------------------------------------------------------


def test_prefix_plant_preserves_interior_token_ngrams(spark):
    # The decontaminate_bpe_13gram plant relies on this: a prefixed
    # copy's token stream is IDENTICAL from the second word on
    # (pre-tokenization is per-word), so interior 13-grams match.
    from churn_model_evaluation_platform_spark.operators.bpe_vocab import (
        GPT2_SPLIT_PATTERN_PORTABLE,
        bpe_tokenize_ids,
    )

    text = "the fast key order sort table scan merge row value part hash agg join"
    df = spark.createDataFrame(
        [(0, text), (1, "copied benchmark row " + text)],
        "doc_id long, text string",
    )
    ids = bpe_tokenize_ids(df, pattern=GPT2_SPLIT_PATTERN_PORTABLE)
    streams = {
        r["doc_id"]: [x["token_id"] for x in r["s"]]
        for r in ids.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("wpos", "ti", "token_id"))
            ).alias("s")
        )
        .collect()
    }
    orig, copy = streams[0], streams[1]
    # the original's stream from its 2nd word on is a contiguous
    # suffix of the copy
    suffix = orig[-13:]
    assert any(
        copy[i : i + 13] == suffix for i in range(len(copy) - 12)
    )


# ---------------------------------------------------------------------------
# trigram LM backoff chain
# ---------------------------------------------------------------------------


def test_trigram_lm_hand_computed_chain(spark):
    from churn_model_evaluation_platform_spark.operators.selection import (
        trigram_lm_scores,
    )

    # train "a b c a b d": uni a2 b2 c1 d1 (T=6, V=4);
    # trigrams: "a b c", "b c a", "c a b", "a b d" → c3("a b c")=1,
    # ctx("a b")=2; bigrams: "a b"x2, "b c", "c a", "b d".
    train = _docs(spark, [(0, "a b c a b d")])
    # eval "a b c x": "a b c" order3 ln(1/2); "b c x" order1 via x
    # unseen (bigram "c x" unseen): ln(0.16 * 1/10).
    ev = _docs(spark, [(1, "a b c x")])
    row = trigram_lm_scores(train, ev).collect()[0]
    assert (row["n_trigrams"], row["n_order3"], row["n_order2"], row["n_order1"]) == (2, 1, 0, 1)
    e1 = round(math.log(0.5) * 1e6)
    e2 = round(math.log(0.16 * 1.0 / 10.0) * 1e6)
    assert row["lm_logprob"] == round((e1 + e2) / 2e6, 6)


def test_trigram_lm_order2_branch(spark):
    from churn_model_evaluation_platform_spark.operators.selection import (
        trigram_lm_scores,
    )

    # train has bigram "c d" (via "b c d") but eval trigram "x c d" is
    # unseen → order2: ln(0.4 * c("c d")/ctx(c)).
    train = _docs(spark, [(0, "b c d x q")])
    ev = _docs(spark, [(1, "x c d")])
    row = trigram_lm_scores(train, ev).collect()[0]
    assert (row["n_order3"], row["n_order2"], row["n_order1"]) == (0, 1, 0)
    assert row["lm_logprob"] == round(
        round(math.log(0.4 * 1.0 / 1.0) * 1e6) / 1e6, 6
    )


# ---------------------------------------------------------------------------
# feature-hash embedder parity
# ---------------------------------------------------------------------------


def test_feature_hash_embed_matches_python_twin(spark):
    from churn_model_evaluation_platform_spark.operators.similarity import (
        feature_hash_embed,
        feature_hash_vec_py,
    )

    texts = [
        "hash join merge plan",
        "the fast key ORDER   sort table",
        "one",
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "cid long, t string"
    )
    got = {
        r["cid"]: list(r["v"])
        for r in df.select(
            "cid", feature_hash_embed(F.col("t")).alias("v")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == feature_hash_vec_py(t), t


# ---------------------------------------------------------------------------
# k-anonymity / l-diversity audit
# ---------------------------------------------------------------------------


def test_k_anonymity_audit_hand_computed(spark):
    from churn_model_evaluation_platform_spark.operators.dq import (
        k_anonymity_audit,
    )

    rows = [
        # class (1, 'a'): 3 rows, sensitive {x, y} -> l=2
        (1, "a", "x"), (1, "a", "x"), (1, "a", "y"),
        # class (2, 'b'): 1 row (violates k=2), single sensitive -> l=1
        (2, "b", "z"),
    ]
    df = spark.createDataFrame(rows, "q1 int, q2 string, s string")
    row = k_anonymity_audit(df, ["q1", "q2"], "s", k=2).collect()[0]
    assert row["k"] == 2
    assert row["n_classes"] == 2
    assert row["n_violating"] == 1
    assert row["n_rows_at_risk"] == 1
    assert row["min_class_size"] == 1
    assert row["min_l"] == 1


def test_embed_map_in_pandas_matches_catalyst_path(spark):
    # The UDF integration point must reproduce the pure-Catalyst fold
    # bit-for-bit (same md5 bucketing/sign, same tokenization).
    from churn_model_evaluation_platform_spark.operators.similarity import (
        embed_map_in_pandas,
        feature_hash_embed,
    )

    df = spark.createDataFrame(
        [(0, "hash join merge plan"), (1, "THE   fast Key"), (2, "x")],
        "doc_id long, text string",
    )
    udf_path = {
        r["doc_id"]: list(r["embedding"])
        for r in embed_map_in_pandas(df).collect()
    }
    jvm_path = {
        r["doc_id"]: list(r["v"])
        for r in df.select(
            "doc_id", feature_hash_embed(F.col("text")).alias("v")
        ).collect()
    }
    assert udf_path == jvm_path


def test_embed_map_in_pandas_custom_encoder_slot(spark):
    # A swapped-in encoder (here: constant vectors — the stub shape a
    # real model replaces) flows through the same plumbing.
    from churn_model_evaluation_platform_spark.operators.similarity import (
        embed_map_in_pandas,
    )

    df = spark.createDataFrame(
        [(7, "anything")], "doc_id long, text string"
    )
    out = embed_map_in_pandas(
        df, encoder=lambda texts: [[1, 2, 3]] * len(texts)
    ).collect()
    assert [list(out[0]["embedding"])] == [[1, 2, 3]]


def test_embed_map_in_pandas_float_encoder_dtype(spark):
    # A float-vector encoder with dtype="double" survives intact (the
    # integer default schema would truncate it).
    from churn_model_evaluation_platform_spark.operators.similarity import (
        embed_map_in_pandas,
    )

    df = spark.createDataFrame([(1, "t")], "doc_id long, text string")
    out = embed_map_in_pandas(
        df,
        encoder=lambda texts: [[0.25, -0.5]] * len(texts),
        dtype="double",
    ).collect()
    assert list(out[0]["embedding"]) == [0.25, -0.5]


# ---------------------------------------------------------------------------
# generalized n-gram chain (r13)
# ---------------------------------------------------------------------------


def test_ngram_chain_order4_hand_computed(spark):
    """Order-4 ladder on a planted corpus: one eval 4-gram hits each
    backoff level, every branch hand-computed including the repeated-
    multiplication α powers."""
    import math

    from churn_model_evaluation_platform_spark.operators.selection import (
        STUPID_BACKOFF_ALPHA as A,
    )
    from churn_model_evaluation_platform_spark.operators.selection import (
        ngram_lm_scores,
    )

    train = spark.createDataFrame(
        [(0, "a b c d e")], "doc_id long, text string"
    )
    # eval docs, each with exactly one 4-gram:
    #   10: "a b c d"  -> seen 4-gram: ln(c4/ctx4) = ln(1/1)
    #   11: "x b c d"  -> suffix tri "b c d" seen: ln(a * 1/1)
    #   12: "x y c d"  -> suffix bi  "c d" seen:  ln(a^2 * 1/1)
    #   13: "x y z d"  -> unigram backoff: ln(a^3 * (1+1)/(5+5))
    ev = spark.createDataFrame(
        [
            (10, "a b c d"),
            (11, "x b c d"),
            (12, "x y c d"),
            (13, "x y z d"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in ngram_lm_scores(train, ev, order=4).collect()
    }
    flags = {
        i: (
            out[i]["n_order4"],
            out[i]["n_order3"],
            out[i]["n_order2"],
            out[i]["n_order1"],
        )
        for i in out
    }
    assert flags == {
        10: (1, 0, 0, 0),
        11: (0, 1, 0, 0),
        12: (0, 0, 1, 0),
        13: (0, 0, 0, 1),
    }

    def pin(x):
        return round(round(math.log(x) * 1e6) / 1e6, 6)

    assert out[10]["lm_logprob"] == pin(1.0)
    assert out[11]["lm_logprob"] == pin(A * 1.0)
    assert out[12]["lm_logprob"] == pin(A * A * 1.0)
    assert out[13]["lm_logprob"] == pin(A * A * A * 2.0 / 10.0)
    assert all(out[i]["n_ngrams"] == 1 for i in out)


def test_ngram_order_guard():
    import pytest as _pytest

    from churn_model_evaluation_platform_spark.operators.selection import (
        ngram_lm_scores,
        ngram_lm_sql,
    )

    with _pytest.raises(ValueError):
        ngram_lm_sql(order=1)
    with _pytest.raises(ValueError):
        ngram_lm_scores(None, None, order=1)


# ---------------------------------------------------------------------------
# learned quality classifier (r14)
# ---------------------------------------------------------------------------


def _qc_scalar(text: str, bias_num: int = 137) -> tuple:
    """Independent scalar replay of the pinned classifier."""
    import hashlib
    import math
    import re

    norm = re.sub(r"\s+", " ", text.lower()).strip(" ")
    toks = norm.split(" ") if norm else [""]
    feats = toks + [
        f"{toks[i - 1]} {toks[i]}" for i in range(1, len(toks))
    ]
    mn = bias_num
    for f in feats:
        b = int(hashlib.md5(f.encode()).hexdigest()[:6], 16) % 2048
        mn += ((b + 1) * 2654435761) % 4096 - 2048
    margin = mn / 4096.0
    prob = round(1.0 / (1.0 + math.exp(-margin)), 6)
    return len(feats), margin, prob, mn >= 0


def test_quality_classifier_matches_scalar_replay(spark):
    from churn_model_evaluation_platform_spark.operators.selection import (
        quality_classifier_scores,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "spam spam spam"),
        (3, "a"),
        (4, "Mixed CASE   and\twhitespace\nnormalization here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in quality_classifier_scores(df).collect()
    }
    for i, t in rows:
        nf, margin, prob, keep = _qc_scalar(t)
        assert out[i]["n_features"] == nf
        assert out[i]["margin"] == margin  # exact dyadic, no tolerance
        assert out[i]["prob_keep"] == prob
        assert out[i]["keep"] is keep


def test_quality_classifier_gate_is_integer_exact(spark):
    # margins are dyadic rationals (denominator 4096): the keep gate
    # compares the integer numerator, so a margin of exactly 0 keeps
    from churn_model_evaluation_platform_spark.operators.selection import (
        quality_classifier_scores,
    )

    df = spark.createDataFrame(
        [(1, "hello world")], "doc_id long, text string"
    )
    row = quality_classifier_scores(df, bias_num=0).collect()[0]
    # whatever the sum, margin*4096 must round-trip to an exact int
    assert row["margin"] * 4096 == int(row["margin"] * 4096)


def test_hashed_ngram_buckets_shared_space(spark):
    # the classifier's feature space IS dsir's: same explode, same
    # bucketing (refactor regression for hashed_ngram_buckets)
    from pyspark.sql import functions as F

    from churn_model_evaluation_platform_spark.operators.selection import (
        hashed_ngram_buckets,
    )

    df = spark.createDataFrame(
        [(1, "alpha beta gamma")], "doc_id long, text string"
    )
    rows = hashed_ngram_buckets(df, "text", "doc_id", 2048, 6).collect()
    assert len(rows) == 5  # 3 unigrams + 2 bigrams
    extra = hashed_ngram_buckets(
        df, "text", "doc_id", 2048, 6, extra={"flag": F.lit(True)}
    ).collect()
    assert all(r["flag"] is True for r in extra)


def test_classifier_margin_col_bit_equal_to_aggregate(spark):
    # the stateless array-lambda Column (streaming form) must produce
    # the EXACT integer numerator the explode+groupBy form produces
    from pyspark.sql import functions as F

    from churn_model_evaluation_platform_spark.operators.selection import (
        QC_DENOM,
        quality_classifier_margin_num,
        quality_classifier_scores,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "a"),
        (3, "Mixed CASE   and\twhitespace\nnormalization here"),
        (4, "x " * 200),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    agg = {
        r["doc_id"]: r["margin"]
        for r in quality_classifier_scores(df).collect()
    }
    col = {
        r["doc_id"]: r["mn"]
        for r in df.select(
            "doc_id", quality_classifier_margin_num().alias("mn")
        ).collect()
    }
    assert {k: v / QC_DENOM for k, v in col.items()} == agg
