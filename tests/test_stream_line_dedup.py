"""Streaming C4 line dedup (r14): the incremental gate operator and
the exactly-once two-table ingest it feeds (q:stream_line_dedup).

Covers: increment-with-no-state == one-shot corpus dedup; the seen-
digest gate actually removes previously-committed lines (while
within-batch first-occurrence still applies); a drained sequence of
increments reproduces the one-shot result under arrival order; and a
crash replay of an already-claimed epoch is a noop on BOTH tables.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.operators.text import (
    line_dedup_corpus,
    line_dedup_increment,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _k(line: str) -> str:
    return hashlib.md5(line.encode()).hexdigest()


def test_increment_without_state_equals_corpus(spark):
    rows = [
        (1, "alpha\nbeta\nalpha"),
        (2, "beta\ngamma"),
        (3, "  gamma  \n\ndelta"),
        (4, None),
    ]
    corpus = {
        r["doc_id"]: r.asDict()
        for r in line_dedup_corpus(_docs(spark, rows)).collect()
    }
    per_doc, new_k = line_dedup_increment(_docs(spark, rows), None)
    inc = {r["doc_id"]: r.asDict() for r in per_doc.collect()}
    assert inc == corpus
    # the digest set is exactly the distinct surviving lines
    want = {_k(x) for x in ["alpha", "beta", "gamma", "delta"]}
    assert {r["k"] for r in new_k.collect()} == want


def test_seen_gate_removes_committed_lines(spark):
    batch = _docs(spark, [(10, "alpha\nnew line\nalpha\nbeta")])
    seen = spark.createDataFrame(
        [(_k("alpha"),), (_k("beta"),)], "k string"
    )
    per_doc, new_k = line_dedup_increment(batch, seen)
    row = per_doc.collect()[0]
    assert row["text_deduped"] == "new line"
    assert row["n_lines_kept"] == 1
    assert row["n_lines_removed"] == 3  # two alphas + one beta
    assert [r["k"] for r in new_k.collect()] == [_k("new line")]


def test_drained_increments_equal_one_shot_arrival_order(spark):
    # three "micro-batches"; the duplicate line plants span batches so
    # only the cross-batch gate (not within-batch dedup) can catch them
    batches = [
        [(1, "shared nav\nbody one"), (4, "body four\nshared nav")],
        [(2, "shared nav\nbody two"), (5, "body one\nbody five")],
        [(3, "body two\nbody three")],
    ]
    state = None
    outs = []
    for rows in batches:
        per_doc, new_k = line_dedup_increment(_docs(spark, rows), state)
        outs.append(per_doc)
        state = (
            new_k.select("k")
            if state is None
            else state.select("k").unionByName(new_k.select("k"))
        )
    drained = outs[0]
    for o in outs[1:]:
        drained = drained.unionByName(o)
    # one-shot over the concatenated corpus with ids renumbered by
    # arrival (batch-major) order reproduces the same survivors
    arrival, remap = [], {}
    for rows in batches:
        for i, t in rows:
            remap[len(arrival)] = i
            arrival.append((len(arrival), t))
    one_shot = {
        remap[r["doc_id"]]: (
            r["text_deduped"],
            r["n_lines_kept"],
            r["n_lines_removed"],
        )
        for r in line_dedup_corpus(_docs(spark, arrival)).collect()
    }
    got = {
        r["doc_id"]: (
            r["text_deduped"],
            r["n_lines_kept"],
            r["n_lines_removed"],
        )
        for r in drained.collect()
    }
    assert got == one_shot


def test_replay_of_claimed_epoch_is_noop(spark, tmp_path):
    from churn_model_evaluation_platform_spark.sources.txnlog import (
        TxnTable,
    )

    docs_tbl = TxnTable(spark, str(tmp_path / "docs"))
    state_tbl = TxnTable(spark, str(tmp_path / "digests"))

    def ingest(batch_df, batch_id):
        seen = (
            None
            if state_tbl.latest_version() is None
            else state_tbl.scan()
        )
        per_doc, new_k = line_dedup_increment(batch_df, seen)
        docs_tbl.append(per_doc, batch_id=batch_id)
        state_tbl.append(new_k.select("k"), batch_id=batch_id)

    b0 = _docs(spark, [(1, "shared nav\nbody one")])
    b1 = _docs(spark, [(2, "shared nav\nbody two")])
    ingest(b0, 0)
    ingest(b1, 1)
    v_docs, v_state = docs_tbl.latest_version(), state_tbl.latest_version()
    before = sorted(
        map(tuple, docs_tbl.scan().collect())
    )
    # crash-replay of epoch 0: both appends must skip (claimed ids)
    ingest(b0, 0)
    assert docs_tbl.latest_version() == v_docs
    assert state_tbl.latest_version() == v_state
    assert sorted(map(tuple, docs_tbl.scan().collect())) == before
    # and the cross-batch gate held: batch 1's shared line was removed
    row2 = {
        r["doc_id"]: r.asDict() for r in docs_tbl.scan().collect()
    }[2]
    assert row2["text_deduped"] == "body two"
    assert row2["n_lines_removed"] == 1


def test_null_id_fails_loudly_in_increment(spark):
    import pytest

    bad = _docs(spark, [(None, "a line")])
    per_doc, _ = line_dedup_increment(bad, None)
    with pytest.raises(Exception, match="NULL id"):
        per_doc.collect()


# ---------------------------------------------------------------------------
# bloom-gated variant (r14)
# ---------------------------------------------------------------------------


def test_bloom_increment_bit_identical_to_plain(spark):
    from churn_model_evaluation_platform_spark.operators.sketch import (
        bloom_registers,
    )

    seen_lines = [f"seen line {i}" for i in range(40)]
    seen = spark.createDataFrame(
        [(_k(x),) for x in seen_lines], "k string"
    )
    regs = bloom_registers(seen, "k")
    batch = _docs(
        spark,
        [
            (1, "seen line 3\nfresh alpha\nseen line 7"),
            (2, "fresh alpha\nfresh beta"),
        ],
    )
    from churn_model_evaluation_platform_spark.operators.text import (
        line_dedup_increment_bloom,
    )

    plain_docs, plain_k = line_dedup_increment(batch, seen)
    bloom_docs, bloom_k = line_dedup_increment_bloom(batch, seen, regs)
    assert sorted(map(tuple, bloom_docs.collect())) == sorted(
        map(tuple, plain_docs.collect())
    )
    assert sorted(r["k"] for r in bloom_k.collect()) == sorted(
        r["k"] for r in plain_k.collect()
    )


def test_bloom_false_positive_forces_exact_check(spark):
    # a digest the bitmap claims "maybe" but that is NOT in the state
    # table must still survive — fp costs a lookup, never a line
    from churn_model_evaluation_platform_spark.operators.sketch import (
        bloom_member_flags,
        bloom_registers,
    )
    from churn_model_evaluation_platform_spark.operators.text import (
        line_dedup_increment_bloom,
    )

    seen = spark.createDataFrame([(_k("the seen one"),)], "k string")
    # registers deliberately saturated so EVERYTHING reads maybe
    fat = spark.createDataFrame(
        [(f"x{i}",) for i in range(20000)], "v string"
    )
    regs = bloom_registers(fat, "v")
    probe = spark.createDataFrame([(_k("fresh line"),)], "k string")
    assert bloom_member_flags(probe, "k", regs).collect()[0][
        "bloom_maybe"
    ]  # saturated: fp
    batch = _docs(spark, [(1, "fresh line\nthe seen one")])
    per_doc, new_k = line_dedup_increment_bloom(batch, seen, regs)
    row = per_doc.collect()[0]
    assert row["text_deduped"] == "fresh line"
    assert row["n_lines_removed"] == 1
    assert [r["k"] for r in new_k.collect()] == [_k("fresh line")]


def test_bloom_replay_with_fresher_bitmap_is_identical(spark, tmp_path):
    # crash between the bloom commit and the digest commit: the replay
    # sees EXTRA bloom bits (this batch's) but the same digest state —
    # extra bits only force the exact check, so the recompute is
    # identical and the claimed appends skip
    from churn_model_evaluation_platform_spark.operators.sketch import (
        bloom_registers,
    )
    from churn_model_evaluation_platform_spark.operators.text import (
        line_dedup_increment_bloom,
    )
    from churn_model_evaluation_platform_spark.sources.txnlog import (
        TxnTable,
    )

    state = TxnTable(spark, str(tmp_path / "digests"))
    bloom = TxnTable(spark, str(tmp_path / "bloom"))
    b0 = _docs(spark, [(1, "shared nav\nbody one")])
    per0, k0 = line_dedup_increment_bloom(b0, None, None)
    bloom.append(bloom_registers(k0, "k"), batch_id=0)
    # CRASH here: digests never committed. Replay epoch 0:
    regs = bloom.scan()  # fresher than the digest state
    seen = None if state.latest_version() is None else state.scan()
    per0r, k0r = line_dedup_increment_bloom(b0, seen, regs)
    assert sorted(map(tuple, per0r.collect())) == sorted(
        map(tuple, per0.collect())
    )
    assert sorted(r["k"] for r in k0r.collect()) == sorted(
        r["k"] for r in k0.collect()
    )
