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
