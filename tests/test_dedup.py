"""Dedup operators on planted duplicates/near-duplicates."""

from __future__ import annotations

import pytest

from churn_model_evaluation_platform_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)


@pytest.fixture
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = "the quick brown fox jumps over the lazy cat again and again today"
    other = "completely different content about spark engines and parquet files"
    rows = [
        (1, base),
        (2, "  THE   quick brown fox jumps over the lazy dog again and again today "),
        (3, near),
        (4, other),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_normalized(docs):
    out = exact_dedup(docs).collect()
    by_id = {r["doc_id"]: r["n_copies"] for r in out}
    # doc 2 is doc 1 modulo case/whitespace → collapsed, min id wins
    assert by_id == {1: 2, 3: 1, 4: 1}


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.3).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0  # identical after norm
    assert (1, 3) in pairs and 0.3 < pairs[(1, 3)] < 1.0
    assert (1, 4) not in pairs


def test_ngram_jaccard_value(spark):
    # doc a: tokens w1..w4 → 2 trigram shingles; doc b shares 1 of them
    a = "w1 w2 w3 w4"
    b = "w1 w2 w3 zz"
    df = spark.createDataFrame([(1, a), (2, b)], ["doc_id", "text"])
    pairs = ngram_jaccard_pairs(df, n=3, threshold=0.0).collect()
    assert len(pairs) == 1
    # shingles a: {w1 w2 w3, w2 w3 w4}; b: {w1 w2 w3, w2 w3 zz} → 1/3
    assert pairs[0]["jaccard"] == pytest.approx(1 / 3)


def test_minhash_equal_docs_equal_sigs(docs):
    sigs = {r["doc_id"]: tuple(r[f"m{i}"] for i in range(16))
            for r in minhash_signatures(docs).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[4]


def test_minhash_lsh_pairs(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_lsh_pairs(docs).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert (1, 4) not in pairs
    # near-dup (1,3) should collide on at least one band most of the time;
    # if present its estimate must be strictly between 0 and 1
    if (1, 3) in pairs:
        assert 0.0 < pairs[(1, 3)] < 1.0


def test_simhash_and_pairs(docs):
    fps = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert fps[1] == fps[2]  # identical normalized content
    assert 0 <= fps[1] < (1 << 32)
    ham_13 = bin(fps[1] ^ fps[3]).count("1")
    ham_14 = bin(fps[1] ^ fps[4]).count("1")
    assert ham_13 < ham_14  # near-dup closer than unrelated doc
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_pairs(docs, max_hamming=ham_13).collect()
    }
    assert pairs[(1, 2)] == 0
    assert pairs[(1, 3)] == ham_13


def test_minhash_matches_pure_python(spark):
    """Cross-check one signature against an independent Python MinHash."""
    import hashlib

    from churn_model_evaluation_platform_spark.functions.hashing import (
        MERSENNE_31,
        minhash_perms,
    )

    text = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    row = minhash_signatures(df, n=3).first()

    toks = text.split(" ")
    shingles = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    hs = {int(hashlib.md5(s.encode()).hexdigest()[:7], 16) for s in shingles}
    for i, (a, b) in enumerate(minhash_perms(16, seed=42)):
        expected = min((a * h + b) % MERSENNE_31 for h in hs)
        assert row[f"m{i}"] == expected


def test_lsh_verified_matches_exact_on_candidates(docs):
    from churn_model_evaluation_platform_spark.operators.dedup import (
        lsh_verified_pairs,
    )

    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.3).collect()
    }
    verified = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in lsh_verified_pairs(docs, n=3, threshold=0.3).collect()
    }
    # every LSH-surfaced pair carries the EXACT jaccard value
    for pair, j in verified.items():
        assert pair in exact
        assert j == pytest.approx(exact[pair])
    # the planted high-similarity pairs survive the LSH prefilter
    assert (1, 2) in verified and verified[(1, 2)] == 1.0
    assert (1, 3) in verified


def test_edit_distance_pairs_typo_class(spark):
    from churn_model_evaluation_platform_spark.operators.dedup import (
        edit_distance_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog again and again today"
    typo = base.replace("dog", "dgo")  # 2-char transposition
    other = "completely different content about engines and files today okay"
    docs = spark.createDataFrame(
        [(1, base), (2, typo), (3, other)], ["doc_id", "text"]
    )
    out = {
        (r["id_a"], r["id_b"]): r["edit_distance"]
        for r in edit_distance_pairs(docs, max_edit=5).collect()
    }
    assert (1, 2) in out and out[(1, 2)] == 2
    assert (1, 3) not in out and (2, 3) not in out


def test_contamination_pairs_broadcast_and_detection(spark):
    from churn_model_evaluation_platform_spark.operators import dedup as D
    from pyspark.sql import functions as F

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely unrelated text about spark shuffles and joins"),
            (3, "the quick brown fox jumps over the lazy dog yesterday"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog today")],
        ["bench_id", "text"],
    )
    out = D.contamination_pairs(corpus, bench, n=3, min_common=3)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert 1 in rows and rows[1]["containment"] == 1.0  # exact bench copy
    assert 3 in rows and rows[3]["common"] >= 3  # near-copy detected
    assert 2 not in rows  # clean doc untouched
    # the benchmark side must broadcast (corpus text never shuffles)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_ensure_parallelism_memoized_and_config_gated(spark, docs, monkeypatch):
    from churn_model_evaluation_platform_spark.operators import dedup as dmod

    dmod._PARALLELISM_MEMO.clear()
    probes = {"n": 0}
    cls = type(docs)  # the concrete (classic) DataFrame class
    # classic DataFrame.rdd is a functools.cached_property
    orig = cls.rdd.func

    def counting_rdd(self):
        probes["n"] += 1
        return orig(self)

    monkeypatch.setattr(cls, "rdd", property(counting_rdd))
    out1 = dmod.ensure_parallelism(docs)
    out2 = dmod.ensure_parallelism(docs)
    assert probes["n"] == 1  # second call hits the semanticHash memo
    assert out1.count() == out2.count() == 4
    # 100 TB posture: config gate skips even the first probe
    dmod._PARALLELISM_MEMO.clear()
    probes["n"] = 0
    spark.conf.set("spark.churnspark.ensureParallelism", "never")
    try:
        out = dmod.ensure_parallelism(docs)
        assert probes["n"] == 0 and out is docs
    finally:
        spark.conf.unset("spark.churnspark.ensureParallelism")


def test_lsh_candidate_recall_summary(spark):
    from churn_model_evaluation_platform_spark.operators.dedup import (
        lsh_candidate_recall,
    )

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base),
        (2, base.replace("dog", "cat")),  # high-Jaccard near-dup of 1
        (3, "completely different content about spark engines and parquet files"),
        (4, "yet another unrelated body of text with no overlap at all here"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    row = lsh_candidate_recall(docs, threshold=0.1).collect()[0]
    # exact side finds the (1,2) near-dup; banded LSH must recover it
    assert row["n_true_pairs"] >= 1
    assert row["n_recalled"] == row["n_true_pairs"]
    assert row["recall"] == 1.0


def test_ensure_parallelism_reprobes_when_source_gains_files(
    spark, tmp_path, monkeypatch
):
    """The memo key folds in the input-file count, so a drop-directory
    source that gains files between batches gets a fresh partition
    probe instead of the first verdict forever (ADVICE r5/r6)."""
    from churn_model_evaluation_platform_spark.operators import dedup as dmod

    dest = str(tmp_path / "drop")
    spark.createDataFrame([(1, "a")], ["doc_id", "text"]).coalesce(
        1
    ).write.mode("overwrite").parquet(dest)

    dmod._PARALLELISM_MEMO.clear()
    probes = {"n": 0}
    cls = type(spark.read.parquet(dest))
    orig = cls.rdd.func

    def counting_rdd(self):
        probes["n"] += 1
        return orig(self)

    monkeypatch.setattr(cls, "rdd", property(counting_rdd))
    dmod.ensure_parallelism(spark.read.parquet(dest))
    dmod.ensure_parallelism(spark.read.parquet(dest))
    assert probes["n"] == 1  # same path, same file count → memo hit

    # a new file lands in the drop directory
    spark.createDataFrame([(2, "b")], ["doc_id", "text"]).coalesce(
        1
    ).write.mode("append").parquet(dest)
    dmod.ensure_parallelism(spark.read.parquet(dest))
    assert probes["n"] == 2  # file count changed → fresh probe


def test_simhash_candidate_recall_is_exactly_one(spark):
    """max_hamming=3 < chunks=4 makes the pigeonhole candidate set
    provably complete — the measured recall must certify 1.0 (anything
    lower is a chunking bug, not a tuning trade-off)."""
    from churn_model_evaluation_platform_spark.operators.dedup import (
        simhash_candidate_recall,
    )

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base),
        (2, base + " extra"),  # near-identical → tiny hamming distance
        (3, base.replace("quick", "slow")),
        (4, "completely different content about spark engines and files"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    row = simhash_candidate_recall(docs).collect()[0]
    assert row["n_true_pairs"] >= 1
    assert row["n_recalled"] == row["n_true_pairs"]
    assert row["recall"] == 1.0


def test_containment_candidate_recall_is_one_even_for_tiny_docs(spark):
    """Rare-shingle blocking must recover every true containment>=0.5
    pair — including a doc below min_blocks distinct shingles (the
    degraded-threshold path)."""
    from churn_model_evaluation_platform_spark.operators.dedup import (
        containment_candidate_recall,
    )

    big = " ".join(f"w{i}" for i in range(40))
    rows = [
        (1, big),
        (2, "w10 w11 w12"),  # one-shingle doc, fully contained
        (3, " ".join(f"w{i}" for i in range(25))),  # prefix subset
        (4, "x y z q r s"),  # unrelated
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    row = containment_candidate_recall(docs).collect()[0]
    assert row["n_true_pairs"] >= 2  # (1,2) and (1,3) at least
    assert row["n_recalled"] == row["n_true_pairs"]
    assert row["recall"] == 1.0


def test_recall_audits_vacuous_on_pairless_corpus(spark):
    """Zero true pairs → recall must be a definite 1.0 (vacuously
    complete) on every audit, not the NULL a Spark 0/0 would produce
    (the DuckDB oracles would say nan — cross-engine divergence)."""
    from churn_model_evaluation_platform_spark.operators.dedup import (
        containment_candidate_recall,
        lsh_candidate_recall,
        simhash_candidate_recall,
    )

    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "one two three four five six seven"),
        (3, "red orange yellow green blue indigo"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    for op in (
        lambda d: lsh_candidate_recall(d, threshold=0.5),
        lambda d: simhash_candidate_recall(d, max_hamming=1),
        lambda d: containment_candidate_recall(d, threshold=0.9),
    ):
        row = op(docs).collect()[0]
        assert row["n_true_pairs"] == 0
        assert row["n_recalled"] == 0
        assert row["recall"] == 1.0
