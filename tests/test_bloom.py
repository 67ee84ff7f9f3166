"""Portable Bloom sketch: merge semantics (OR — idempotent,
at-least-once safe), the no-false-negative guarantee, measured
false-positive behavior, and split-merge == one-shot under arbitrary
partitioning. The corpus-scale differential is q:`contamination_bloom`.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.operators.sketch import (
    BLOOM_K,
    BLOOM_M_WORDS,
    bloom_merge,
    bloom_probe_counts,
    bloom_registers,
)


def _vals(spark, values):
    return spark.createDataFrame([(v,) for v in values], "v string")


def _bits(rows):
    return {(r["word_idx"], r["bits"]) for r in rows}


def test_split_merge_equals_one_shot(spark):
    vals = [f"member-{i}" for i in range(300)]
    one_shot = _bits(bloom_registers(_vals(spark, vals), "v").collect())
    a = bloom_registers(_vals(spark, vals[:137]), "v")
    b = bloom_registers(_vals(spark, vals[137:]), "v")
    merged = _bits(bloom_merge(a.unionByName(b)).collect())
    assert merged == one_shot


def test_or_merge_idempotent(spark):
    regs = bloom_registers(
        _vals(spark, [f"x{i}" for i in range(100)]), "v"
    )
    once = _bits(bloom_merge(regs).collect())
    twice = _bits(bloom_merge(regs.unionByName(regs)).collect())
    assert once == twice  # at-least-once delivery safe


def test_no_false_negatives(spark):
    members = [f"member-{i}" for i in range(500)]
    regs = bloom_registers(_vals(spark, members), "v")
    cands = spark.createDataFrame(
        [(1, v) for v in members], "g long, v string"
    )
    out = bloom_probe_counts(cands, regs, "v", ["g"]).collect()
    assert out[0]["n_bloom_hits"] == len(members)  # every member found


def test_false_positive_rate_bounded(spark):
    members = [f"member-{i}" for i in range(500)]
    regs = bloom_registers(_vals(spark, members), "v")
    non_members = [f"other-{i}" for i in range(2000)]
    cands = spark.createDataFrame(
        [(1, v) for v in non_members], "g long, v string"
    )
    rows = bloom_probe_counts(cands, regs, "v", ["g"]).collect()
    fp = rows[0]["n_bloom_hits"] if rows else 0
    # fill ratio ~ 1-exp(-k*n/m) ≈ 0.117 → fp_rate ≈ 0.117^4 ≈ 2e-4;
    # allow a generous 20x margin over the expectation of ~0.4 hits
    assert fp <= 8


def test_bit_width_never_overflows(spark):
    # every stored word must be a valid signed 63-bit-payload BIGINT:
    # bit index < 63 by construction, so bits > 0 always
    regs = bloom_registers(
        _vals(spark, [f"v{i}" for i in range(1000)]), "v"
    ).collect()
    assert all(r["bits"] > 0 for r in regs)
    assert all(0 <= r["word_idx"] < BLOOM_M_WORDS for r in regs)
    assert len(regs) <= BLOOM_M_WORDS


def test_nulls_skipped(spark):
    df = spark.createDataFrame([(None,), ("a",)], "v string")
    regs = bloom_registers(df, "v").collect()
    only_a = bloom_registers(_vals(spark, ["a"]), "v").collect()
    assert _bits(regs) == _bits(only_a)
    assert len(regs) <= BLOOM_K


def test_stream_partials_or_merge_to_one_shot(spark):
    """The map-side streaming combine (per-partition running OR) must
    reproduce the one-shot bitmap exactly under any partitioning, and
    its plan must be Exchange-free."""
    from churn_model_evaluation_platform_spark.operators.sketch import (
        bloom_stream_partials,
    )

    flat = spark.createDataFrame(
        [(f"u{i}",) for i in range(3000)], "v string"
    )
    # the combine itself adds no Exchange (probe the un-repartitioned
    # plan; the repartition below is the TEST's scatter, not the op's)
    plan = (
        bloom_stream_partials(flat, "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    partials = bloom_stream_partials(flat.repartition(5), "v")
    merged = _bits(bloom_merge(partials).collect())
    one_shot = _bits(
        bloom_registers(
            spark.createDataFrame(
                [(f"u{i}",) for i in range(3000)], "v string"
            ),
            "v",
        ).collect()
    )
    assert merged == one_shot


def test_duplicate_candidates_not_dropped(spark):
    # Regression (r14): a candidate value occurring more than once in a
    # group used to explode to 2k bit-hit rows and fail the "== k"
    # membership test — a silent FALSE NEGATIVE from an operator whose
    # contract is false-negative-freedom. The operator now dedupes
    # (group, value) internally; duplicates must count exactly once.
    members = [f"member-{i}" for i in range(50)]
    regs = bloom_registers(_vals(spark, members), "v")
    cands = spark.createDataFrame(
        [(1, "member-0"), (1, "member-0"), (1, "member-1"),
         (2, "member-2")] + [(2, "member-3")] * 5,
        "g long, v string",
    )
    out = {
        r["g"]: r["n_bloom_hits"]
        for r in bloom_probe_counts(cands, regs, "v", ["g"]).collect()
    }
    assert out == {1: 2, 2: 2}


def test_duplicate_candidates_sql_parity(spark):
    # The DuckDB replay must mirror the internal dedup bit-for-bit.
    import duckdb

    from churn_model_evaluation_platform_spark.operators.sketch import (
        bloom_probe_sql,
        bloom_sql,
    )

    members = [f"member-{i}" for i in range(50)]
    regs = bloom_registers(_vals(spark, members), "v")
    cands = spark.createDataFrame(
        [(1, "member-0"), (1, "member-0"), (1, "member-1")],
        "g long, v string",
    )
    got = bloom_probe_counts(cands, regs, "v", ["g"]).collect()
    member_rows = " UNION ALL ".join(
        f"SELECT '{m}' AS v" for m in members
    )
    cand_rows = (
        "SELECT 1 AS g, 'member-0' AS v UNION ALL "
        "SELECT 1 AS g, 'member-0' AS v UNION ALL "
        "SELECT 1 AS g, 'member-1' AS v"
    )
    sql = bloom_probe_sql(cand_rows, bloom_sql(member_rows), "g")
    want = duckdb.sql(sql).fetchall()
    assert [(r["g"], r["n_bloom_hits"]) for r in got] == want
