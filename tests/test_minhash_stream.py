"""minhash_dedup_increment — gate semantics at the operator level:
exact vs near labels, state gating across increments (kept-only), and
the documented within-batch lower-id rule."""

from __future__ import annotations

from churn_model_evaluation_platform_spark.operators.dedup import (
    minhash_dedup_increment,
)

# A and B normalize identically (case/whitespace) -> same digest,
# identical signatures: exact_dup. C has the same 3-shingle SET as A
# (cyclic repetition) but different normalized text -> est = 1 with a
# different digest: near_dup.
_A = "alpha beta gamma alpha beta gamma"
_B = "Alpha  beta GAMMA alpha beta   gamma"
_C = "alpha beta gamma alpha beta gamma alpha beta gamma"
_D = "delta epsilon zeta eta theta iota kappa"  # unrelated


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _run(spark, rows, seen=None):
    per, state = minhash_dedup_increment(_df(spark, rows), seen)
    got = {
        r["doc_id"]: (r["status"], r["matched_id"])
        for r in per.collect()
    }
    return got, state


def test_first_increment_labels_and_state(spark):
    got, state = _run(
        spark, [(1, _A), (2, _B), (3, _C), (4, _D)]
    )
    assert got == {
        1: ("kept", None),
        2: ("exact_dup", 1),
        3: ("near_dup", 1),
        4: ("kept", None),
    }
    # only the kept docs' signatures enter the state
    assert sorted(r["doc_id"] for r in state.collect()) == [1, 4]


def test_second_increment_gated_by_kept_state_only(spark):
    _got, state = _run(spark, [(1, _A), (2, _B)])
    state = state.localCheckpoint(eager=True)
    # doc 10 duplicates A: matched to the KEPT doc 1 (doc 2 was
    # dropped and never entered the state)
    got, _ = _run(spark, [(10, _A), (11, _D)], seen=state)
    assert got == {10: ("exact_dup", 1), 11: ("kept", None)}


def test_within_batch_lower_id_gates_regardless_of_fate(spark):
    # 2 duplicates 1 (dropped); 3 duplicates 2 — the documented rule
    # matches 3 to the LOWEST matching earlier id (1 here, since all
    # three share signatures), and dropped docs still gate later ids
    # within the same batch.
    got, state = _run(spark, [(1, _A), (2, _A), (3, _A)])
    assert got == {
        1: ("kept", None),
        2: ("exact_dup", 1),
        3: ("exact_dup", 1),
    }
    assert [r["doc_id"] for r in state.collect()] == [1]


def test_null_text_rows_are_skipped(spark):
    got, state = _run(spark, [(1, _A), (2, None)])
    assert got == {1: ("kept", None)}
    assert [r["doc_id"] for r in state.collect()] == [1]
