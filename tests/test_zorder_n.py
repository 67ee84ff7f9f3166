"""N-column z-order (round 9, VERDICT r8 next #9): the n-ary Morton
interleave generalizing the 2-D magic-mask path, its DuckDB SQL twin,
and the quantitative pruning floor for a 3-D clustered layout."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.functions.zorder import (
    morton_interleave,
    morton_interleave_n,
    morton_interleave_n_sql,
    zorder_by_n,
)
from churn_model_evaluation_platform_spark.sources.txnlog import TxnTable


def _grid3(spark, n=8):
    return spark.sql(
        f"""SELECT x, y, w FROM (SELECT explode(sequence(0, {n - 1})) x),
            (SELECT explode(sequence(0, {n - 1})) y),
            (SELECT explode(sequence(0, {n - 1})) w)"""
    )


def test_n2_matches_magic_mask_path(spark):
    df = spark.sql(
        "SELECT x, y FROM (SELECT explode(sequence(0, 40)) x),"
        " (SELECT explode(sequence(0, 40)) y)"
    )
    out = df.select(
        morton_interleave(F.col("x"), F.col("y")).alias("a"),
        morton_interleave_n([F.col("x"), F.col("y")], bits=16).alias("b"),
    )
    assert out.where("a <> b").count() == 0


def test_n3_matches_duckdb_sql(spark):
    rows = (
        _grid3(spark, 6)
        .select(
            "x",
            "y",
            "w",
            morton_interleave_n(
                [F.col("x"), F.col("y"), F.col("w")]
            ).alias("z"),
        )
        .collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE pts AS SELECT * FROM (VALUES "
        + ", ".join(f"({r['x']}, {r['y']}, {r['w']})" for r in rows)
        + ") t(x, y, w)"
    )
    sql = morton_interleave_n_sql(["x", "y", "w"])
    got = {
        (x, y, w): z
        for x, y, w, z in con.execute(
            f"SELECT x, y, w, {sql} FROM pts"
        ).fetchall()
    }
    for r in rows:
        assert got[(r["x"], r["y"], r["w"])] == r["z"], r


def test_n3_locality_is_bitwise_exact(spark):
    """Low-order cube cells map to low z-values: the 2x2x2 cube at the
    origin occupies exactly z 0..7."""
    got = sorted(
        r["z"]
        for r in _grid3(spark, 2)
        .select(
            morton_interleave_n([F.col("x"), F.col("y"), F.col("w")]).alias(
                "z"
            )
        )
        .collect()
    )
    assert got == list(range(8))


def test_bits_validation():
    with pytest.raises(ValueError, match="at least 2"):
        morton_interleave_n([F.col("x")])
    with pytest.raises(ValueError, match="signed long"):
        morton_interleave_n([F.col("x")] * 3, bits=22)


def test_zorder3_pruning_floor(spark, tmp_path):
    """After a 3-column z-order rewrite, a box predicate on ALL three
    dims must prune most files — the quantitative floor the oracle
    query's `skipped` flag only hints at."""
    n = 32
    df = spark.sql(
        f"""SELECT x, y, w, CAST(x * 10000 + y * 100 + w AS DOUBLE) v
            FROM (SELECT explode(sequence(0, {n - 1})) x),
                 (SELECT explode(sequence(0, {n - 1})) y),
                 (SELECT explode(sequence(0, {n - 1})) w)"""
    )
    t = TxnTable(spark, str(tmp_path / "z3"))
    t.overwrite(df)
    t.optimize_zorder("x", "y", "w", partitions=16)
    where = [
        ("x", "between", (0, 7)),
        ("y", "between", (0, 7)),
        ("w", "between", (0, 7)),
    ]
    rep = t.prune_report(where)
    assert rep["total"] == 16
    # an eighth-per-axis box is 1/512 of the volume; the z-layout must
    # confine it to a small corner of the file range
    assert rep["kept"] <= 4, rep
    # and correctness: scan == plain filter
    got = t.scan(where).count()
    assert got == 8 * 8 * 8
    # a single-dimension predicate prunes too (the whole point of
    # interleaving over plain sort)
    for dim in ("x", "y", "w"):
        rep1 = t.prune_report([(dim, "between", (0, 3))])
        assert rep1["kept"] < rep1["total"], dim


def test_optimize_zorder_requires_two_columns(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "z1"))
    t.overwrite(spark.range(10).select(F.col("id")))
    with pytest.raises(ValueError, match="at least 2"):
        t.optimize_zorder("id")
