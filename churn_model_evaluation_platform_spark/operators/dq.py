"""Declarative data-quality verification (Deequ-style): a list of
constraints compiles into ONE aggregate pass over the table, and the
result is a row-per-check verification report a pipeline can gate on —
the generalized form of the reference's schema-containment +
extension-validation admission checks
(churn_prediction_pipeline.py:153-159) for data, not just schemas.

Scale: every constraint folds into the same `agg(...)` — completeness
ratios, bounds, membership and row counts are plain conditional
aggregates (one scan, map-side combined); uniqueness adds one
`count(distinct struct(cols))`, which Spark plans as its standard
two-phase expand — the only extra shuffle, keyed on the checked
columns. No per-check scans, no driver loops over data.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Check:
    name: str
    target: str
    observed: Column  # scalar aggregate expression
    passes: "callable"  # observed_value_column -> boolean Column
    distinct_cols: list[str] = field(default_factory=list)


def not_null(col: str, min_ratio: float = 1.0) -> Check:
    obs = F.avg(F.col(col).isNotNull().cast("double"))
    return Check("not_null", col, obs, lambda o: o >= min_ratio)


def unique(cols: list[str]) -> Check:
    # observed = distinct-ratio; computed from the same agg row.
    obs = F.count_distinct(F.struct(*[F.col(c) for c in cols])) / F.count(
        F.lit(1)
    )
    return Check("unique", ",".join(cols), obs, lambda o: o >= 1.0)


def min_value(col: str, lo: float) -> Check:
    return Check("min_value", col, F.min(col).cast("double"), lambda o: o >= lo)


def max_value(col: str, hi: float) -> Check:
    return Check("max_value", col, F.max(col).cast("double"), lambda o: o <= hi)


def accepted_values(col: str, values: list[str]) -> Check:
    obs = F.avg(F.col(col).isin(values).cast("double"))
    return Check("accepted_values", col, obs, lambda o: o >= 1.0)


def row_count_at_least(n: int) -> Check:
    return Check(
        "row_count_at_least", "*", F.count(F.lit(1)).cast("double"),
        lambda o: o >= float(n),
    )


def dq_verify(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Run every check in one aggregate job. Output:
    (check, target, observed double, status 'pass'|'fail') — ordered
    rows via an explicit union so the report is deterministic."""
    agg_row = df.agg(
        *[c.observed.alias(f"__c{i}") for i, c in enumerate(checks)]
    )
    # ONE row → explode to a row per check: a union of per-check
    # projections would re-derive the aggregate subtree per branch.
    rows = []
    for i, c in enumerate(checks):
        obs = F.col(f"__c{i}").cast("double")
        rows.append(
            F.struct(
                F.lit(c.name).alias("check"),
                F.lit(c.target).alias("target"),
                F.round(obs, 6).alias("observed"),
                F.when(c.passes(obs), F.lit("pass"))
                .otherwise(F.lit("fail"))
                .alias("status"),
            )
        )
    return agg_row.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    k: int = 5,
) -> DataFrame:
    """Privacy-governance audit (Sweeney 2002 k-anonymity; Machanavajjhala
    et al. 2007 l-diversity): group rows by the quasi-identifier
    combination and report, in one summary row, how re-identifiable the
    release is — ``n_classes`` equivalence classes, ``n_violating``
    classes smaller than ``k``, ``n_rows_at_risk`` rows in them,
    ``min_class_size`` (the realized k), and ``min_l`` (the smallest
    per-class count of distinct sensitive values — l-diversity, which
    k-anonymity alone cannot guarantee: a size-k class with ONE
    sensitive value still leaks it).

    One groupBy over the quasi columns (count + distinct-sensitive per
    class), then a one-row fold — the shuffle key is the
    quasi-identifier tuple, the class table is |classes| rows. The
    audit a 100 TB release pipeline runs BEFORE publishing any
    user-grain extract.
    """
    classes = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("__n"),
        F.countDistinct(sensitive_col).alias("__l"),
    )
    return classes.agg(
        F.lit(k).cast("int").alias("k"),
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.sum((F.col("__n") < k).cast("int"))
        .cast("bigint")
        .alias("n_violating"),
        F.sum(F.when(F.col("__n") < k, F.col("__n")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("n_rows_at_risk"),
        F.min("__n").cast("bigint").alias("min_class_size"),
        F.min("__l").cast("bigint").alias("min_l"),
    )
