"""EDA operators (SURVEY §2.F — notebook cells of
churn_model_training.ipynb re-expressed as single-pass aggregations).

All built-ins; exact percentiles via ``percentile`` (matches DuckDB's
``quantile_cont`` for oracle checks — ``percentile_approx`` would not).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def describe_stats(df: DataFrame, columns: list[str]) -> DataFrame:
    """count/mean/std/min/q1/median/q3/max per column (notebook cell 2),
    long format: one row per column. One aggregation pass for ALL columns.
    """
    aggs = []
    for c in columns:
        col = F.col(c).cast("double")
        aggs += [
            F.count(col).alias(f"{c}__count"),
            F.avg(col).alias(f"{c}__mean"),
            F.stddev_samp(col).alias(f"{c}__std"),
            F.min(col).alias(f"{c}__min"),
            F.expr(f"percentile({c}, 0.25)").alias(f"{c}__q1"),
            F.expr(f"percentile({c}, 0.5)").alias(f"{c}__median"),
            F.expr(f"percentile({c}, 0.75)").alias(f"{c}__q3"),
            F.max(col).alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    stats = ["count", "mean", "std", "min", "q1", "median", "q3", "max"]
    rows = [
        F.struct(
            F.lit(c).alias("column"),
            *[F.col(f"{c}__{s}").cast("double").alias(s) for s in stats],
        )
        for c in columns
    ]
    return wide.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


def null_count_per_column(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Null counts per column, long format (notebook cell 6)."""
    cols = columns or df.columns
    wide = df.agg(
        *[F.sum(F.col(c).isNull().cast("long")).alias(c) for c in cols]
    )
    return wide.unpivot([], cols, "column", "null_count")


def duplicate_row_count(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Count of fully duplicated rows (notebook cell 7):
    ``count(*) - count(distinct <all cols>)`` in one aggregation."""
    cols = columns or df.columns
    return df.select(
        *cols
    ).agg(
        (F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in cols]))
        .cast("long")
        .alias("duplicate_rows")
    )


def grouped_describe(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Per-group distribution stats of one column (notebook cell 11)."""
    v = F.col(value_col).cast("double")
    return (
        df.groupBy(group_col)
        .agg(
            F.count(v).alias("count"),
            F.avg(v).alias("mean"),
            F.stddev_samp(v).alias("std"),
            F.min(v).alias("min"),
            F.expr(f"percentile({value_col}, 0.25)").alias("q1"),
            F.expr(f"percentile({value_col}, 0.5)").alias("median"),
            F.expr(f"percentile({value_col}, 0.75)").alias("q3"),
            F.max(v).alias("max"),
        )
    )


def histogram_bins(df: DataFrame, column: str, bin_width: float) -> DataFrame:
    """Fixed-width binned counts (notebook cells 8-10):
    ``groupBy(floor(col / width))`` — equivalent to SQL ``width_bucket``
    but expressible identically in any engine."""
    bin_expr = F.floor(F.col(column).cast("double") / F.lit(bin_width)).cast("long")
    return (
        df.where(F.col(column).isNotNull())
        .groupBy(bin_expr.alias("bin"))
        .agg(F.count(F.lit(1)).alias("bin_count"))
        .select(
            "bin",
            (F.col("bin") * F.lit(bin_width)).alias("bin_start"),
            "bin_count",
        )
    )


def mad_by_group(
    df: DataFrame, value_col: str, group_col: str
) -> DataFrame:
    """Median absolute deviation per group — the robust spread statistic,
    as an Arrow-batched pandas GROUPED-AGGREGATE UDF (the one UDF form
    the rest of the engine doesn't already exercise: scalar model UDFs in
    score.py, grouped-map/map-iter in multimodal.py, stateful in
    streaming/). Medians are not algebraic, so this genuinely needs the
    UDAF — there is no built-in exact distributed form.

    Scale note: each group's values are gathered to one executor (the
    UDAF contract); for huge groups prefer ``percentile_approx``-based
    approximations instead.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _mad(v: pd.Series) -> float:
        med = v.median()
        return float((v - med).abs().median())

    return (
        df.groupBy(group_col)
        .agg(_mad(F.col(value_col)).alias("mad"))
        .select(group_col, "mad")
    )


def histogram_bins_by_label(
    df: DataFrame, column: str, bin_width: float, label_col: str
) -> DataFrame:
    """Binned counts split by a hue column (notebook cells 8-10 pass
    ``hue="Churn"`` to the dist plots): same single hash aggregation,
    keyed on (bin, label)."""
    bin_expr = F.floor(F.col(column).cast("double") / F.lit(bin_width)).cast("long")
    return (
        df.where(F.col(column).isNotNull() & F.col(label_col).isNotNull())
        .groupBy(bin_expr.alias("bin"), F.col(label_col).alias("label"))
        .agg(F.count(F.lit(1)).alias("bin_count"))
        .select(
            "bin",
            (F.col("bin") * F.lit(bin_width)).alias("bin_start"),
            "label",
            "bin_count",
        )
    )


def corr_matrix(df: DataFrame, columns: list[str]) -> DataFrame:
    """Pairwise Pearson correlations in ONE aggregation pass: every
    upper-triangle pair is a ``corr(a, b)`` aggregate in the same job
    (the shuffle carries one partial-moment row per partition, never the
    data). Output: (col_a, col_b, corr) long form, rounded — the
    co-moment accumulation order differs across engines."""
    pairs = [
        (a, b) for i, a in enumerate(columns) for b in columns[i + 1 :]
    ]
    wide = df.agg(
        *[
            F.round(F.corr(a, b), 6).alias(f"{a}|{b}")
            for a, b in pairs
        ]
    )
    structs = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.col(f"{a}|{b}").alias("corr"),
            )
            for a, b in pairs
        ]
    )
    return wide.select(F.explode(structs).alias("p")).select(
        "p.col_a", "p.col_b", "p.corr"
    )
