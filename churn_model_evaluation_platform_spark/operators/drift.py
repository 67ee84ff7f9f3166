"""Drift statistics — the reference's analytical core (SURVEY §2.D).

The reference delegates to Evidently's ``DataDriftPreset``
(churn_prediction_pipeline.py:322); every downstream consumer treats the
per-column drift value as a two-sample KS p-value with a 0.05 cutoff
(churn_prediction_pipeline.py:419; dashboard threshold
churn-model-evaluation.json:1170). We implement KS-with-p-value natively:

  KS statistic = max over x of |ECDF_ref(x) - ECDF_cur(x)|

as a pure DataFrame aggregation: pool both samples tagged with indicator
columns, compute tie-aware running counts ordered by value, take the max
absolute normalized difference. Two physical strategies:

- ``ks_2samp``: single huge column — scalable range-partitioned prefix sum
  (no single-partition window; see functions/stats.py).
- ``value_drift``: many modest columns at once (the monitoring batch case)
  — melt to long ``(column, value)`` and window per column, so all columns
  are computed in ONE pass over one shuffle, parallel across columns.

p-values use the asymptotic Kolmogorov series (functions/stats.py) since
scipy is deliberately not a dependency. Unit tests pin values against
scipy computed offline. Deviation from the reference noted in SURVEY §7.4:
Evidently switches to Wasserstein above 1000 rows; we keep KS as *the*
semantic at all sizes (it is what every consumer of the value assumes) and
keep the stat pluggable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.stats import (
    grouped_prefix_sum,
    ks_pvalue_expr,
    partitioned_prefix_sum,
    range_boundaries,
)

P_VALUE_DRIFT_THRESHOLD = 0.05  # churn_prediction_pipeline.py:419
DATASET_DRIFT_SHARE = 0.5  # churn_prediction_pipeline.py:415


def _pool(
    ref: DataFrame, cur: DataFrame, column: str, numeric: bool = True
) -> DataFrame:
    v = F.col(column).cast("double") if numeric else F.col(column)
    r = ref.select(
        v.alias("v"),
        F.lit(1).alias("is_ref"),
        F.lit(0).alias("is_cur"),
    ).where(F.col("v").isNotNull())
    c = cur.select(
        v.alias("v"),
        F.lit(0).alias("is_ref"),
        F.lit(1).alias("is_cur"),
    ).where(F.col("v").isNotNull())
    return r.unionAll(c)


def ks_2samp(
    ref: DataFrame,
    cur: DataFrame,
    column: str,
    strategy: str = "prefix",
    distinct_estimate: int | None = None,
) -> DataFrame:
    """Two-sample KS over one (possibly huge) column.

    Returns a single row ``(ks_stat double, p_value double, n_ref long,
    n_cur long)``. Scales: the only global ordering is done via
    range-partitioned prefix sums; everything else is map-side.

    ``strategy``: ``"prefix"`` (default — keeps plan construction fully
    lazy and the plan single-reducer-free at ANY cardinality) uses the
    range-partitioned prefix sum; ``"windowed"`` uses a plain ordered
    window over the tie-grouped values (single reducer — fine at
    moderate cardinality, skips the boundary pass); ``"auto"`` picks by
    the column's distinct count. Pass ``distinct_estimate`` (e.g. from a
    pass the caller already runs — ``estimate_distinct_counts`` — or
    table statistics) and auto routing stays FULLY LAZY: no job at
    plan-construction. Without it auto falls back to running the
    one-pass HLL estimate eagerly — opt in only where the caller
    executes immediately. All strategies produce identical rows.
    """
    if strategy == "auto":
        est = (
            distinct_estimate
            if distinct_estimate is not None
            else estimate_distinct_counts(ref, cur, [column])[column]
        )
        strategy = "windowed" if est <= WINDOWED_MAX_DISTINCT else "prefix"
    if strategy == "windowed":
        raw = _pool(ref, cur, column)
        pooled = raw.groupBy("v").agg(
            F.sum("is_ref").alias("is_ref"), F.sum("is_cur").alias("is_cur")
        )
        w = Window.orderBy("v")  # 1 row per distinct v → tie-safe
        tot = Window.partitionBy()
        cums = pooled.select(
            F.sum("is_ref").over(w).alias("cum_is_ref"),
            F.sum("is_cur").over(w).alias("cum_is_cur"),
            F.sum("is_ref").over(tot).alias("tot_is_ref"),
            F.sum("is_cur").over(tot).alias("tot_is_cur"),
        )
        stat = cums.agg(
            F.max(
                F.abs(
                    F.col("cum_is_ref") / F.col("tot_is_ref")
                    - F.col("cum_is_cur") / F.col("tot_is_cur")
                )
            ).alias("ks_stat"),
            F.first("tot_is_ref").alias("n_ref"),
            F.first("tot_is_cur").alias("n_cur"),
        )
        return stat.select(
            "ks_stat",
            ks_pvalue_expr(
                F.col("ks_stat"), F.col("n_ref"), F.col("n_cur")
            ).alias("p_value"),
            "n_ref",
            "n_cur",
        )
    # Tie pre-aggregation: collapse to one row per distinct value BEFORE
    # any ordering work. Map-side partial aggregation shrinks the shuffle
    # to the value's cardinality (continuous columns barely shrink; coded/
    # discrete columns shrink orders of magnitude), and the downstream
    # prefix sum sees exactly one row per value so tie semantics are
    # automatic. No cache anywhere: at 100 TB an intermediate this size
    # cannot be materialized — instead the boundary pass is a scan-only
    # aggregation over the raw pool (frequency-weighted quantiles are
    # balanced enough for bucketing), and the main plan consumes the
    # grouped pool exactly once (the window and per-bucket-totals
    # branches share one exchange).
    raw = _pool(ref, cur, column)
    pooled = raw.groupBy("v").agg(
        F.sum("is_ref").alias("is_ref"), F.sum("is_cur").alias("is_cur")
    )
    bounds = range_boundaries(raw, "v")
    cums = partitioned_prefix_sum(
        pooled, "v", ["is_ref", "is_cur"], bounds=bounds, with_totals=True
    )
    stat = cums.agg(
        F.max(
            F.abs(
                F.col("cum_is_ref") / F.col("tot_is_ref")
                - F.col("cum_is_cur") / F.col("tot_is_cur")
            )
        ).alias("ks_stat"),
        F.first("tot_is_ref").alias("n_ref"),
        F.first("tot_is_cur").alias("n_cur"),
    )
    return stat.select(
        "ks_stat",
        ks_pvalue_expr(F.col("ks_stat"), F.col("n_ref"), F.col("n_cur")).alias(
            "p_value"
        ),
        "n_ref",
        "n_cur",
    )


WINDOWED_MAX_DISTINCT = 250_000  # per-column single-reducer comfort zone


def estimate_distinct_counts(
    ref: DataFrame, cur: DataFrame, columns: list[str]
) -> dict[str, int]:
    """Approximate per-column distinct counts over the pooled sample in
    ONE map-side HLL pass (no shuffle of data, one-row result)."""

    def proj(df: DataFrame) -> DataFrame:
        return df.select(*[F.col(c).cast("double").alias(c) for c in columns])

    row = (
        proj(ref)
        .unionAll(proj(cur))
        .agg(*[F.approx_count_distinct(c).alias(c) for c in columns])
        .first()
    )
    return {c: int(row[c]) for c in columns}


def value_drift(
    ref: DataFrame,
    cur: DataFrame,
    columns: list[str],
    scalable: bool | str = False,
    distinct_estimates: dict[str, int] | None = None,
) -> DataFrame:
    """Per-column KS drift for a set of columns in ONE pass.

    Returns ``(column string, ks_stat double, p_value double)`` with one
    row per input column. Implementation: melt both sides to
    ``(column, v, is_ref, is_cur)`` long format, tie pre-aggregate (one
    row per distinct (column, value) — map-side combine does the heavy
    lifting before any shuffle), then compute each column's ECDF pair:

    - default: window partitioned by column — per-column work lands on
      one reducer each; right when per-column distinct-value counts are
      moderate (the monitoring-batch case: ≤ thousands of values).
    - ``scalable=True``: grouped range-partitioned prefix sum
      (functions/stats.py) — each column's ordering work spreads over
      many buckets, so even a single continuous column with billions of
      distinct values has no serial stage. Same results (both variants
      are checked against the same DuckDB oracle).
    - ``scalable="auto"``: estimate each column's distinct count with one
      HLL pass and route it to the right branch — windowed below
      ``WINDOWED_MAX_DISTINCT`` (skips the prefix-sum machinery's fixed
      boundary pass: ~1 s that dominates monitoring-sized batches),
      prefix-sum above it (no single-reducer cliff at scale). The two
      branches produce identical rows, so routing never changes results.
      Pass ``distinct_estimates`` (per-column counts the caller already
      has — one ``estimate_distinct_counts`` pass, or catalog column
      stats) and routing stays FULLY LAZY: no job at plan-construction
      (columns missing from the dict conservatively take the prefix-sum
      path). Without it, auto falls back to running the HLL estimate
      eagerly — opt in where the caller executes immediately (the
      monitoring pipeline passes estimates); fixed strategies are
      always lazy.
    """
    if not columns:
        raise ValueError("columns must be non-empty")
    if scalable == "auto":
        if distinct_estimates is not None:
            est = {
                c: distinct_estimates.get(c, WINDOWED_MAX_DISTINCT + 1)
                for c in columns
            }
        else:
            est = estimate_distinct_counts(ref, cur, columns)
        small = [c for c in columns if est[c] <= WINDOWED_MAX_DISTINCT]
        large = [c for c in columns if est[c] > WINDOWED_MAX_DISTINCT]
        parts = []
        if small:
            parts.append(value_drift(ref, cur, small, scalable=False))
        if large:
            parts.append(value_drift(ref, cur, large, scalable=True))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        return out

    def melt(df: DataFrame, is_ref: int) -> DataFrame:
        long = df.select(
            *[F.col(c).cast("double").alias(c) for c in columns]
        ).unpivot([], columns, "column", "v")
        return long.where(F.col("v").isNotNull()).select(
            "column",
            "v",
            F.lit(is_ref).alias("is_ref"),
            F.lit(1 - is_ref).alias("is_cur"),
        )

    pooled = melt(ref, 1).unionAll(melt(cur, 0))
    aggd = pooled.groupBy("column", "v").agg(
        F.sum("is_ref").alias("r"), F.sum("is_cur").alias("c")
    )
    if scalable:
        cums = grouped_prefix_sum(aggd, "column", "v", ["r", "c"]).select(
            "column",
            F.col("cum_r").alias("cum_ref"),
            F.col("cum_c").alias("cum_cur"),
            F.col("tot_r").alias("n_ref"),
            F.col("tot_c").alias("n_cur"),
        )
    else:
        w = Window.partitionBy("column").orderBy("v")  # 1 row/v → tie-safe
        totals_w = Window.partitionBy("column")
        cums = aggd.select(
            "column",
            F.sum("r").over(w).alias("cum_ref"),
            F.sum("c").over(w).alias("cum_cur"),
            F.sum("r").over(totals_w).alias("n_ref"),
            F.sum("c").over(totals_w).alias("n_cur"),
        )
    stat = cums.groupBy("column").agg(
        F.max(
            F.abs(
                F.col("cum_ref") / F.col("n_ref")
                - F.col("cum_cur") / F.col("n_cur")
            )
        ).alias("ks_stat"),
        F.first("n_ref").alias("n_ref"),
        F.first("n_cur").alias("n_cur"),
    )
    return stat.select(
        "column",
        "ks_stat",
        ks_pvalue_expr(F.col("ks_stat"), F.col("n_ref"), F.col("n_cur")).alias(
            "p_value"
        ),
    )


def value_drift_by_window(
    ref: DataFrame,
    cur: DataFrame,
    columns: list[str],
    ts_col: str,
    unit: str = "day",
) -> DataFrame:
    """Drift TIMESERIES in one pass: per-column two-sample KS of every
    event-time window of ``cur`` against the (static) reference —
    rows ``(window_start, column, ks_stat, p_value)``. This is the
    dashboard's drift-over-time panel computed as ONE lazy plan over the
    whole history, instead of re-running per-batch ``value_drift`` N
    times (churn_prediction_pipeline.py:322 ran once per pipeline
    invocation; Grafana then plotted the stored points —
    churn-model-evaluation.json's drift timeseries panels).

    ``unit`` is a ``date_trunc`` unit ('day'/'week'/'month') so the
    window key is reproducible across engines.

    Scale: ``ref`` is a training snapshot — broadcast-sized by platform
    design — so it is replicated once per distinct window via a
    broadcast cross join (n_windows is the dashboard x-axis grain:
    small). The 100 TB side (``cur``) is read ONCE, melted, and tie
    pre-aggregated map-side; each (window, column) pair then forms its
    own ECDF partition — strictly MORE parallelism than single-batch
    drift, with no serial stage. A (window, column) group with no
    current values yields a null ks_stat (0/0), never an error.
    """
    if not columns:
        raise ValueError("columns must be non-empty")
    wstart = F.date_trunc(unit, F.col(ts_col)).alias("window_start")

    cur_long = (
        cur.select(
            wstart, *[F.col(c).cast("double").alias(c) for c in columns]
        )
        .unpivot(["window_start"], columns, "column", "v")
        .where(F.col("v").isNotNull())
        .select(
            "window_start",
            "column",
            "v",
            F.lit(0).alias("is_ref"),
            F.lit(1).alias("is_cur"),
        )
    )
    windows = cur.select(wstart).distinct()
    ref_long = (
        ref.select(*[F.col(c).cast("double").alias(c) for c in columns])
        .unpivot([], columns, "column", "v")
        .where(F.col("v").isNotNull())
        .crossJoin(F.broadcast(windows))
        .select(
            "window_start",
            "column",
            "v",
            F.lit(1).alias("is_ref"),
            F.lit(0).alias("is_cur"),
        )
    )
    aggd = cur_long.unionByName(ref_long).groupBy(
        "window_start", "column", "v"
    ).agg(F.sum("is_ref").alias("r"), F.sum("is_cur").alias("c"))
    w = Window.partitionBy("window_start", "column").orderBy("v")
    tw = Window.partitionBy("window_start", "column")
    cums = aggd.select(
        "window_start",
        "column",
        F.sum("r").over(w).alias("cum_ref"),
        F.sum("c").over(w).alias("cum_cur"),
        F.sum("r").over(tw).alias("n_ref"),
        F.sum("c").over(tw).alias("n_cur"),
    )
    stat = cums.groupBy("window_start", "column").agg(
        F.max(
            F.abs(
                F.col("cum_ref") / F.col("n_ref")
                - F.col("cum_cur") / F.col("n_cur")
            )
        ).alias("ks_stat"),
        F.first("n_ref").alias("n_ref"),
        F.first("n_cur").alias("n_cur"),
    )
    return stat.select(
        "window_start",
        "column",
        "ks_stat",
        ks_pvalue_expr(F.col("ks_stat"), F.col("n_ref"), F.col("n_cur")).alias(
            "p_value"
        ),
    )


def wasserstein(ref: DataFrame, cur: DataFrame, column: str) -> DataFrame:
    """1-Wasserstein (earth mover's) distance between the two samples —
    Evidently's drift method above 1000 rows (closing the deviation
    documented in SURVEY §7.4; KS remains the default `value_drift`
    semantic because every reference consumer reads a p-value).

    W1 = ∫ |ECDF_ref(v) − ECDF_cur(v)| dv, computed exactly over the
    pooled distinct values: Σ |Δcdf(v)| · (v_next − v). Scalable shape:
    the same range-bucketed prefix sums as ``ks_2samp``; the only new
    piece is v_next — a within-bucket ``lead`` whose bucket-boundary
    null is filled from the next bucket's min(v) (a per-bucket frame of
    a few hundred rows, broadcast).
    """
    stepped = _ecdf_steps(ref, cur, column)
    term = (
        F.abs(
            F.col("cum_is_ref") / F.col("tot_is_ref")
            - F.col("cum_is_cur") / F.col("tot_is_cur")
        )
        * (F.col("__v_next") - F.col("v"))
    )
    return stepped.agg(
        F.sum(F.when(F.col("__v_next").isNotNull(), term).otherwise(0.0)).alias(
            "wasserstein"
        )
    )


def _ecdf_steps(ref: DataFrame, cur: DataFrame, column: str) -> DataFrame:
    """Shared ECDF step frame for the integral drift statistics
    (wasserstein, energy): one row per pooled distinct value with both
    sides' inclusive prefix sums, totals, and the next distinct value
    ``__v_next`` (null on the global max). Same range-bucketed
    prefix-sum shape as ``ks_2samp`` — no single-reducer window."""
    raw = _pool(ref, cur, column)
    pooled = raw.groupBy("v").agg(
        F.sum("is_ref").alias("is_ref"), F.sum("is_cur").alias("is_cur")
    )
    bounds = range_boundaries(raw, "v")
    cums = partitioned_prefix_sum(
        pooled, "v", ["is_ref", "is_cur"], bounds=bounds, with_totals=True
    )
    bucket: Column = F.lit(0)
    for b in bounds:
        bucket = bucket + (F.col("v") > F.lit(b)).cast("int")
    bucketed = cums.withColumn("__bucket", bucket)
    w_b = Window.partitionBy("__bucket").orderBy("v")
    bucket_mins = bucketed.groupBy("__bucket").agg(F.min("v").alias("__minv"))
    w_next = Window.orderBy("__bucket")  # a few hundred rows — trivial
    next_mins = bucket_mins.select(
        "__bucket", F.lead("__minv").over(w_next).alias("__next_bucket_min")
    )
    return bucketed.join(F.broadcast(next_mins), "__bucket").select(
        "*",
        F.coalesce(
            F.lead("v").over(w_b), F.col("__next_bucket_min")
        ).alias("__v_next"),
    )


def energy_distance(
    ref: DataFrame, cur: DataFrame, column: str
) -> DataFrame:
    """Energy distance between the two samples (Székely & Rizzo;
    Evidently's ``ed`` stat test, scipy.stats.energy_distance):
    E = sqrt(2 · ∫ (ECDF_ref(v) − ECDF_cur(v))² dv) — the same exact
    pooled-distinct-value step integral as ``wasserstein`` with the
    squared difference, so the O(n²) pairwise definition is never
    materialized."""
    stepped = _ecdf_steps(ref, cur, column)
    d = (
        F.col("cum_is_ref") / F.col("tot_is_ref")
        - F.col("cum_is_cur") / F.col("tot_is_cur")
    )
    term = d * d * (F.col("__v_next") - F.col("v"))
    return stepped.agg(
        F.sqrt(
            F.lit(2.0)
            * F.sum(
                F.when(F.col("__v_next").isNotNull(), term).otherwise(0.0)
            )
        ).alias("energy")
    )


def _binned_counts(
    ref: DataFrame, cur: DataFrame, column: str, bin_width: float | None
) -> DataFrame:
    """Shared fixed-width binning for the binned drift family: one row
    per bin with both sides' counts (full-outer via conditional sums on
    the pooled frame — a single groupBy, no join). ``bin_width=None``
    (r9) keys by the RAW value — the CATEGORICAL form of the same
    family (Evidently runs chi2/TVD on category frequencies directly),
    valid for string columns too."""
    pooled = _pool(ref, cur, column, numeric=bin_width is not None)
    b = (
        F.col("v")
        if bin_width is None
        else F.floor(F.col("v") / F.lit(bin_width)).cast("long")
    )
    return pooled.groupBy(b.alias("bin")).agg(
        F.sum("is_ref").alias("n_ref"), F.sum("is_cur").alias("n_cur")
    )


def psi(
    ref: DataFrame,
    cur: DataFrame,
    column: str,
    bin_width: float | None,
    epsilon: float = 1e-6,
) -> DataFrame:
    """Population Stability Index over fixed-width bins:
    Σ (p_cur - p_ref) * ln(p_cur / p_ref), zero-count bins floored at
    ``epsilon`` (industry convention; < 0.1 stable, > 0.25 shifted).
    One groupBy + one scalar aggregation — same shape at any scale.
    """
    counts = _binned_counts(ref, cur, column, bin_width)
    tot = counts.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    j = counts.crossJoin(F.broadcast(tot))
    p_ref = F.greatest(F.col("n_ref") / F.col("t_ref"), F.lit(epsilon))
    p_cur = F.greatest(F.col("n_cur") / F.col("t_cur"), F.lit(epsilon))
    term = (p_cur - p_ref) * F.log(p_cur / p_ref)
    return j.agg(F.sum(term).alias("psi"))


def binned_ref_counts(
    ref: DataFrame, columns: dict[str, float]
) -> DataFrame:
    """Static-reference bin counts ``(column, bin, n_ref)`` for the
    streaming-capable PSI drift panel: ``columns`` maps column name →
    fixed bin width. Computed once per reference snapshot (broadcast-
    sized by platform design) and reused across every window/batch."""
    cols = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.floor(F.col(c).cast("double") / F.lit(w)).alias("bin"),
            )
            for c, w in columns.items()
        ]
    )
    return (
        ref.select(F.explode(cols).alias("cb"))
        .select("cb.column", "cb.bin")
        .where(F.col("bin").isNotNull())
        .groupBy("column", "bin")
        .agg(F.count(F.lit(1)).alias("n_ref"))
    )


def binned_window_counts(
    cur: DataFrame,
    columns: dict[str, float],
    ts_col: str,
    unit: str = "week",
) -> DataFrame:
    """Per-window current-side bin counts ``(window_start, column, bin,
    n_cur)`` — the ONLY stateful piece of the PSI drift panel, and a
    pure streaming groupBy-count. This is why the streaming panel is
    PSI-based: KS needs the full value multiset per window (ECDF),
    which no mergeable bounded state can carry; binned counts are the
    drift statistic that STREAMS.

    Window key = ``date_trunc(unit, ts)`` — CALENDAR windows, matching
    the batch dashboard and the DuckDB oracle exactly. Caveat (r8
    review): date_trunc does not propagate the event-time watermark
    attribute (only ``F.window``/``session_window`` do), so a streaming
    aggregation on THIS shape runs in complete/update mode with state
    for every window ever seen — fine for a bounded drain
    (``stream_value_drift``) or a dashboard-span history, NOT for an
    unbounded 100 TB stream. For watermark-EVICTED bounded state use
    ``binned_window_counts_append`` (tumbling ``F.window`` keys,
    append-mode capable); same output schema, so ``psi_from_binned``
    finishes either one."""
    cols = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.floor(F.col(c).cast("double") / F.lit(w)).alias("bin"),
            )
            for c, w in columns.items()
        ]
    )
    return (
        cur.select(
            F.date_trunc(unit, F.col(ts_col)).alias("window_start"),
            F.explode(cols).alias("cb"),
        )
        .select("window_start", "cb.column", "cb.bin")
        .where(F.col("bin").isNotNull())
        .groupBy("window_start", "column", "bin")
        .agg(F.count(F.lit(1)).alias("n_cur"))
    )


def binned_window_counts_append(
    cur: DataFrame,
    columns: dict[str, float],
    ts_col: str,
    window_duration: str = "7 days",
) -> DataFrame:
    """``binned_window_counts`` with TUMBLING ``F.window`` keys instead
    of calendar ``date_trunc`` — the shape whose grouping carries the
    event-time watermark, so an APPEND-mode streaming aggregation is
    accepted and state is EVICTED once the watermark passes a window:
    live state = (open windows × columns × bins), bounded regardless of
    stream length — the 100 TB deployment shape (the input must carry
    ``withWatermark(ts_col, ...)``). Output schema matches
    ``binned_window_counts`` (window_start = the tumbling window's
    start), so ``psi_from_binned`` finishes the drained counts
    unchanged. Trade-off vs the calendar variant: epoch-aligned 7-day
    windows, not ISO weeks — use it where bounded state matters more
    than calendar alignment (proven equivalent per-window in
    tests/test_stream_drift.py)."""
    cols = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.floor(F.col(c).cast("double") / F.lit(w)).alias("bin"),
            )
            for c, w in columns.items()
        ]
    )
    return (
        cur.select(F.col(ts_col), F.explode(cols).alias("cb"))
        .select(ts_col, "cb.column", "cb.bin")
        .where(F.col("bin").isNotNull())
        .groupBy(
            F.window(ts_col, window_duration).alias("w"), "column", "bin"
        )
        .agg(F.count(F.lit(1)).alias("n_cur"))
        .select(
            F.col("w.start").alias("window_start"), "column", "bin", "n_cur"
        )
    )


def psi_from_binned(
    ref_bins: DataFrame,
    cur_bins: DataFrame,
    epsilon: float = 1e-6,
    round_to: int = 6,
) -> DataFrame:
    """Finish the PSI drift panel from binned counts: one row
    ``(window_start, column, psi)`` per window × column. Shared verbatim
    by the batch plan and the streaming drain (registry
    ``value_drift_psi_window`` / ``stream_value_drift``), which is what
    makes the drain == batch proof an identity of inputs, not a
    coincidence of two implementations.

    All frames here are bin-count sized (windows × columns × bins) —
    the 100 TB data only ever flows through ``binned_window_counts``.
    The full-outer join keeps ref-only bins (p_cur floored at
    ``epsilon``) and cur-only bins (p_ref floored) alike. Totals are
    clamped with greatest(·, 1e-12) before dividing so a (window,
    column) slice with zero rows stays finite and cross-engine
    identical (0/0 is NULL on Spark but NaN on DuckDB); ln() is libm-
    dependent → the final sum is rounded on both engines."""
    joined, p, q = _window_joined_pq(ref_bins, cur_bins)
    p_ref = F.greatest(p, F.lit(epsilon))
    p_cur = F.greatest(q, F.lit(epsilon))
    term = (p_cur - p_ref) * F.log(p_cur / p_ref)
    return (
        joined.select("window_start", "column", term.alias("term"))
        .groupBy("window_start", "column")
        .agg(F.round(F.sum("term"), round_to).alias("psi"))
    )


def _window_joined_pq(ref_bins: DataFrame, cur_bins: DataFrame):
    """Shared (window_start, column, bin) -> clamped (p, q) scaffolding
    for the windowed-panel finishers — ONE definition so a fix to the
    join or the clamp applies to every statistic (r9 review). The alias
    hop mints fresh attribute ids so base-vs-cur_bins is not a
    self-join on the same plan (memory-sink sources otherwise hit
    "conflicting references" in the full-outer join below)."""
    from pyspark.sql import Window as W

    windows = (
        cur_bins.select(F.col("window_start").alias("__w"))
        .distinct()
        .withColumnRenamed("__w", "window_start")
    )
    base = ref_bins.crossJoin(F.broadcast(windows))
    joined = base.join(
        cur_bins, ["window_start", "column", "bin"], "full_outer"
    ).select(
        "window_start",
        "column",
        F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
    )
    w = W.partitionBy("window_start", "column")
    p = F.col("n_ref").cast("double") / F.greatest(
        F.sum("n_ref").over(w).cast("double"), F.lit(1e-12)
    )
    q = F.col("n_cur").cast("double") / F.greatest(
        F.sum("n_cur").over(w).cast("double"), F.lit(1e-12)
    )
    return joined, p, q


def stat_from_binned(
    ref_bins: DataFrame,
    cur_bins: DataFrame,
    method: str = "psi",
    epsilon: float = 1e-6,
    round_to: int = 6,
) -> DataFrame:
    """Statistic-selectable finisher for the windowed drift panel (r9):
    any of the BINNED statistics — ``psi`` | ``hellinger`` | ``tvd`` |
    ``js`` — from the same ``(window_start, column, bin, n_*)`` count
    frames ``binned_ref_counts`` / ``binned_window_counts`` /
    ``binned_window_counts_append`` produce, so every one of them
    STREAMS with the identical bounded state (the statistic choice
    costs nothing at the stateful layer — it is pure arithmetic over
    the drained counts). Output ``(window_start, column, <method>)``.
    ``epsilon`` applies to ``psi`` only (hellinger/tvd/js are finite on
    zero bins by construction); totals are clamped at 1e-12 everywhere
    so an empty (window, column) slice stays finite and cross-engine
    identical."""
    if method == "psi":
        return psi_from_binned(ref_bins, cur_bins, epsilon, round_to)
    if method not in ("hellinger", "tvd", "js"):
        raise ValueError(
            f"unknown binned drift method {method!r}; "
            "expected psi|hellinger|tvd|js"
        )
    joined, p, q = _window_joined_pq(ref_bins, cur_bins)
    if method == "hellinger":
        d = F.sqrt(p) - F.sqrt(q)
        term, finish = d * d, lambda s: F.sqrt(F.lit(0.5) * s)
    elif method == "tvd":
        term, finish = F.abs(p - q), lambda s: F.lit(0.5) * s
    else:  # js
        m = (p + q) / F.lit(2.0)
        term = F.when(p > 0, F.lit(0.5) * p * F.log(p / m)).otherwise(
            F.lit(0.0)
        ) + F.when(q > 0, F.lit(0.5) * q * F.log(q / m)).otherwise(
            F.lit(0.0)
        )
        finish = lambda s: s  # noqa: E731
    return (
        joined.select("window_start", "column", term.alias("term"))
        .groupBy("window_start", "column")
        .agg(F.round(finish(F.sum("term")), round_to).alias(method))
    )


def value_drift_psi_by_window(
    ref: DataFrame,
    cur: DataFrame,
    columns: dict[str, float],
    ts_col: str,
    unit: str = "week",
    epsilon: float = 1e-6,
    round_to: int = 6,
) -> DataFrame:
    """Drift TIMESERIES with a statistic that also STREAMS: per-column
    PSI of every event-time window of ``cur`` against the static
    reference, ``(window_start, column, psi)``. The windowed-KS panel
    (``value_drift_by_window``) stays the batch dashboard's default;
    this is its streaming-capable sibling — the stateful piece is a
    pure groupBy-count over (window, column, bin) that Structured
    Streaming maintains incrementally with watermark-bounded state,
    and ``psi_from_binned`` finishes from counts alone."""
    return psi_from_binned(
        binned_ref_counts(ref, columns),
        binned_window_counts(cur, columns, ts_col, unit),
        epsilon,
        round_to,
    )


def js_divergence(
    ref: DataFrame, cur: DataFrame, column: str, bin_width: float | None
) -> DataFrame:
    """Jensen–Shannon divergence (base e, in [0, ln 2]) between the two
    binned distributions: JS = 0.5 KL(p||m) + 0.5 KL(q||m), m=(p+q)/2.
    Zero-count bins contribute 0 by the 0·log0 = 0 convention."""
    counts = _binned_counts(ref, cur, column, bin_width)
    tot = counts.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    j = counts.crossJoin(F.broadcast(tot))
    p = F.col("n_ref") / F.col("t_ref")
    q = F.col("n_cur") / F.col("t_cur")
    m = (p + q) / F.lit(2.0)
    kl_p = F.when(p > 0, p * F.log(p / m)).otherwise(F.lit(0.0))
    kl_q = F.when(q > 0, q * F.log(q / m)).otherwise(F.lit(0.0))
    return j.agg((F.lit(0.5) * F.sum(kl_p) + F.lit(0.5) * F.sum(kl_q)).alias("js"))


def chi2_drift(
    ref: DataFrame, cur: DataFrame, column: str, bin_width: float | None
) -> DataFrame:
    """Pearson chi-squared homogeneity test over the binned counts
    (Evidently's categorical drift method): the statistic from the
    standard contingency expectation, p-value via the Wilson–Hilferty
    cube-root normal approximation (pure closed form — identical on any
    engine; exact chi2 CDF needs the incomplete gamma, out of scope
    without scipy and documented as approximate here)."""
    return chi2_from_counts(_binned_counts(ref, cur, column, bin_width))


def chi2_from_counts(counts: DataFrame) -> DataFrame:
    tot = counts.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    j = counts.crossJoin(F.broadcast(tot))
    row_tot = F.col("n_ref") + F.col("n_cur")
    grand = F.col("t_ref") + F.col("t_cur")
    e_ref = row_tot * F.col("t_ref") / grand
    e_cur = row_tot * F.col("t_cur") / grand
    term = F.when(
        row_tot > 0,
        F.pow(F.col("n_ref") - e_ref, 2) / e_ref
        + F.pow(F.col("n_cur") - e_cur, 2) / e_cur,
    ).otherwise(F.lit(0.0))
    agg = j.agg(
        F.sum(term).alias("chi2"),
        (F.count(F.lit(1)) - F.lit(1)).cast("double").alias("dof"),
    )
    # Wilson–Hilferty: (X/k)^(1/3) ~ N(1 - 2/(9k), 2/(9k)); upper tail
    # via the complementary error function-free normal approx
    # 0.5 * erfc(z / sqrt(2)) expressed with exp-based logistic-ish
    # closed form is NOT portable — use the standard normal tail bound
    # via erfc available in both engines? Spark lacks erfc; use the
    # Abramowitz-Stegun 7.1.26 erf polynomial (max err 1.5e-7), exact
    # same arithmetic on both sides.
    z = (
        (F.pow(F.col("chi2") / F.col("dof"), 1.0 / 3.0)
         - (1 - 2.0 / (9.0 * F.col("dof"))))
        / F.sqrt(2.0 / (9.0 * F.col("dof")))
    )
    p_upper = F.lit(1.0) - _norm_cdf_expr(z)
    # dof == 0 (all mass in one shared bin): the Wilson–Hilferty z is
    # 0/0 — no distributional evidence either way, report p = 1.0.
    p_guarded = F.when(
        F.col("dof") >= 1,
        F.least(F.greatest(p_upper, F.lit(0.0)), F.lit(1.0)),
    ).otherwise(F.lit(1.0))
    return agg.select(
        "chi2",
        F.col("dof").cast("bigint").alias("dof"),
        p_guarded.alias("p_approx"),
    )


def _counts_with_totals(counts: DataFrame) -> tuple[DataFrame, Column, Column]:
    """Shared finisher input for the binned distances: the counts frame
    crossed with its single-row totals, plus the clamped probability
    expressions (totals floored at 1e-12 per the repo's zero-division
    convention — an empty or all-null side yields a FINITE zero-measure
    statistic, not a NULL a monitoring threshold silently ignores;
    r9 review)."""
    tot = counts.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    j = counts.crossJoin(F.broadcast(tot))
    p = F.col("n_ref").cast("double") / F.greatest(
        F.col("t_ref").cast("double"), F.lit(1e-12)
    )
    q = F.col("n_cur").cast("double") / F.greatest(
        F.col("t_cur").cast("double"), F.lit(1e-12)
    )
    return j, p, q


def hellinger_from_counts(counts: DataFrame) -> DataFrame:
    j, p, q = _counts_with_totals(counts)
    d = F.sqrt(p) - F.sqrt(q)
    return j.agg(F.sqrt(F.lit(0.5) * F.sum(d * d)).alias("hellinger"))


def hellinger(
    ref: DataFrame, cur: DataFrame, column: str, bin_width: float | None
) -> DataFrame:
    """Hellinger distance between the two binned distributions
    (Evidently's ``hellinger`` stat test): H = sqrt(0.5 · Σ (sqrt(p) −
    sqrt(q))²) ∈ [0, 1]. Zero-count bins contribute their full
    sqrt-mass difference — no epsilon floor needed (the statistic is
    finite by construction). Same one-groupBy shape as ``psi``."""
    return hellinger_from_counts(_binned_counts(ref, cur, column, bin_width))


def tvd_from_counts(counts: DataFrame) -> DataFrame:
    j, p, q = _counts_with_totals(counts)
    return j.agg((F.lit(0.5) * F.sum(F.abs(p - q))).alias("tvd"))


def tvd(
    ref: DataFrame, cur: DataFrame, column: str, bin_width: float | None
) -> DataFrame:
    """Total variation distance between the two binned distributions
    (Evidently's ``TVD`` stat test): 0.5 · Σ |p − q| ∈ [0, 1]."""
    return tvd_from_counts(_binned_counts(ref, cur, column, bin_width))


def mannwhitney_u(
    ref: DataFrame, cur: DataFrame, column: str
) -> DataFrame:
    """Mann–Whitney U rank test (Evidently's ``mannw`` stat test):
    → (u_stat, z, p_approx, n_ref, n_cur). Midranks over the pooled
    distinct values come from the same range-bucketed prefix sums as
    ``ks_2samp`` — the tie group at value v spans ranks
    (count below v, count at-or-below v], so its midrank is
    cum_before + (t+1)/2 and R_cur = Σ n_cur(v) · midrank(v) needs no
    per-row ranking. U = R_cur − n_cur(n_cur+1)/2; the p-value is the
    standard tie-corrected asymptotic normal approximation WITHOUT
    continuity correction (documented deviation from scipy's
    use_continuity=True default; exact same closed form on any
    engine). All-tied inputs (zero variance) report p = 1.0."""
    raw = _pool(ref, cur, column)
    pooled = raw.groupBy("v").agg(
        F.sum("is_ref").alias("is_ref"), F.sum("is_cur").alias("is_cur")
    )
    bounds = range_boundaries(raw, "v")
    cums = partitioned_prefix_sum(
        pooled, "v", ["is_ref", "is_cur"], bounds=bounds, with_totals=True
    )
    t_size = F.col("is_ref") + F.col("is_cur")
    cum_before = (
        F.col("cum_is_ref") + F.col("cum_is_cur") - t_size
    ).cast("double")
    midrank = cum_before + (t_size.cast("double") + F.lit(1.0)) / F.lit(2.0)
    # cube in DOUBLE: a >2.09M-row tie group (routine for constant /
    # low-cardinality columns at scale) overflows t³ in BIGINT — wrap
    # under non-ANSI, throw under Spark 4's ANSI default, and diverge
    # from the oracle, which casts before cubing (r9 review)
    td = t_size.cast("double")
    agg = cums.agg(
        F.sum(F.col("is_cur") * midrank).alias("r_cur"),
        F.sum(td * td * td - td).alias("tie_term"),
        F.max("tot_is_ref").alias("n1"),
        F.max("tot_is_cur").alias("n2"),
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    n = n1 + n2
    u = F.col("r_cur") - n2 * (n2 + F.lit(1.0)) / F.lit(2.0)
    mean = n1 * n2 / F.lit(2.0)
    var = (
        n1
        * n2
        / F.lit(12.0)
        * ((n + F.lit(1.0)) - F.col("tie_term") / (n * (n - F.lit(1.0))))
    )
    z = (u - mean) / F.sqrt(var)
    p = F.lit(2.0) * (F.lit(1.0) - _norm_cdf_expr(F.abs(z)))
    guarded = F.when(
        var > 0, F.least(F.greatest(p, F.lit(0.0)), F.lit(1.0))
    ).otherwise(F.lit(1.0))
    return agg.select(
        u.alias("u_stat"),
        F.when(var > 0, z).otherwise(F.lit(0.0)).alias("z"),
        guarded.alias("p_approx"),
        F.col("n1").cast("bigint").alias("n_ref"),
        F.col("n2").cast("bigint").alias("n_cur"),
    )


def _norm_cdf_expr(z: Column) -> Column:
    """Standard normal CDF via the Abramowitz–Stegun 7.1.26 erf
    polynomial (|err| < 1.5e-7) — pure closed form, bit-portable."""
    x = F.abs(z) / F.sqrt(F.lit(2.0))
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.3275911) * x)
    poly = (
        F.lit(0.254829592) * t
        - F.lit(0.284496736) * F.pow(t, 2)
        + F.lit(1.421413741) * F.pow(t, 3)
        - F.lit(1.453152027) * F.pow(t, 4)
        + F.lit(1.061405429) * F.pow(t, 5)
    )
    erf = F.lit(1.0) - poly * F.exp(-x * x)
    cdf_abs = (F.lit(1.0) + erf) / F.lit(2.0)
    return F.when(z >= 0, cdf_abs).otherwise(F.lit(1.0) - cdf_abs)


AUTO_REF_THRESHOLD = 1000


def drift_statistic(
    ref: DataFrame,
    cur: DataFrame,
    column: str,
    method: str = "ks",
    bin_width: float = 10.0,
    auto_threshold: int = AUTO_REF_THRESHOLD,
) -> DataFrame:
    """One entry point for the pluggable drift family (SURVEY §7.4):

    - ``ks``           → (ks_stat, p_value, n_ref, n_cur) — the default
      semantic every reference consumer assumes;
    - ``wasserstein``  → (wasserstein,) — Evidently's >1000-row branch;
    - ``psi``          → (psi,) — binned population stability;
    - ``js``           → (js,) — binned Jensen–Shannon divergence;
    - ``chi2``         → (chi2, dof, p_approx) — binned homogeneity test;
    - ``hellinger``    → (hellinger,) — binned Hellinger distance (r9);
    - ``tvd``          → (tvd,) — binned total variation distance (r9);
    - ``energy``       → (energy,) — exact ECDF energy distance (r9);
    - ``mannw``        → (u_stat, z, p_approx, n_ref, n_cur) —
      Mann–Whitney U rank test, tie-corrected asymptotic p (r9);
    - ``auto``         → (method, drift_score) — Evidently's numerical
      preset branch (the rule the reference's report actually executes,
      churn_prediction_pipeline.py:322): two-sample KS while the
      reference column has ≤ ``auto_threshold`` non-null rows,
      Wasserstein above. The chosen branch rides along as a ``method``
      column so consumers know which statistic they are reading; the
      score is rounded at 6 on both engines (the branches' own
      conventions). Deviation kept from SURVEY §7.4: the Wasserstein is
      raw (not std-normalized as Evidently's wd_norm) — consistent with
      the ``wasserstein`` method itself. The branch decision is ONE
      driver count on the reference snapshot (broadcast-sized by
      platform design), the standard iterative-algorithm scalar, not a
      per-row collect.

    Binned methods take ``bin_width``; distribution methods ignore it.
    """
    if method == "auto":
        n_ref = ref.where(F.col(column).isNotNull()).count()
        chosen = "ks" if n_ref <= auto_threshold else "wasserstein"
        stat = drift_statistic(ref, cur, column, chosen, bin_width)
        score = F.col("ks_stat") if chosen == "ks" else F.col("wasserstein")
        return stat.select(
            F.lit(chosen).alias("method"),
            F.round(score, 6).alias("drift_score"),
        )
    if method == "ks":
        return ks_2samp(ref, cur, column)
    if method == "wasserstein":
        return wasserstein(ref, cur, column)
    if method == "psi":
        return psi(ref, cur, column, bin_width)
    if method == "js":
        return js_divergence(ref, cur, column, bin_width)
    if method == "chi2":
        return chi2_drift(ref, cur, column, bin_width)
    if method == "hellinger":
        return hellinger(ref, cur, column, bin_width)
    if method == "tvd":
        return tvd(ref, cur, column, bin_width)
    if method == "energy":
        return energy_distance(ref, cur, column)
    if method == "mannw":
        return mannwhitney_u(ref, cur, column)
    raise ValueError(
        f"unknown drift method {method!r}; "
        "expected auto|ks|wasserstein|psi|js|chi2|hellinger|tvd|energy|mannw"
    )


def value_drift_metrics(
    ref: DataFrame, cur: DataFrame, columns: list[str]
) -> DataFrame:
    """Drift result as long metrics rows ``(metric_name, value)`` named
    ``valuedrift_<column>`` — the simplified-name contract the dashboard
    SQL depends on (churn_prediction_pipeline.py:533-553).
    """
    return value_drift(ref, cur, columns).select(
        F.concat(F.lit("valuedrift_"), F.col("column")).alias("metric_name"),
        F.col("p_value").alias("value"),
    )


def drifted_columns_count(
    drift: DataFrame, p_threshold: float = P_VALUE_DRIFT_THRESHOLD
) -> DataFrame:
    """Aggregate per-column drift into the two dataset-level metrics the
    reference consumes (churn_prediction_pipeline.py:412-416):
    ``driftedcolumnscount[count]`` and ``driftedcolumnscount[share]``.

    Input: the output of ``value_drift`` (one row per column).
    """
    agg = drift.agg(
        F.sum((F.col("p_value") < F.lit(p_threshold)).cast("int"))
        .cast("double")
        .alias("count"),
        F.count(F.lit(1)).cast("double").alias("n_cols"),
    )
    wide = agg.select(
        F.col("count").alias("driftedcolumnscount[count]"),
        (F.col("count") / F.col("n_cols")).alias("driftedcolumnscount[share]"),
    )
    return wide.unpivot([], wide.columns, "metric_name", "value")


def assess_data_drift_df(
    drift: DataFrame,
    share_threshold: float = DATASET_DRIFT_SHARE,
    p_threshold: float = P_VALUE_DRIFT_THRESHOLD,
) -> DataFrame:
    """Dataset-drift predicate as ONE aggregation row — the distributed
    form of ``assess_data_drift`` (churn_prediction_pipeline.py:395-431):
    ``(dataset_drift boolean, n_drifted bigint, drifted_columns string)``.

    Input is ``value_drift`` output (one row per column). No collect —
    the predicate itself is a Catalyst aggregate, so it composes into a
    larger plan (e.g. evaluated per monitoring micro-batch at scale).
    """
    flag = (F.col("p_value") < F.lit(p_threshold)).cast("int")
    agg = drift.agg(
        F.sum(flag).alias("n_drifted"),
        F.count(F.lit(1)).alias("n_cols"),
        F.sort_array(
            F.collect_list(F.when(F.col("p_value") < p_threshold, F.col("column")))
        ).alias("cols"),
    )
    return agg.select(
        (F.col("n_drifted") / F.col("n_cols") > F.lit(share_threshold)).alias(
            "dataset_drift"
        ),
        F.col("n_drifted").cast("bigint").alias("n_drifted"),
        F.concat_ws(",", "cols").alias("drifted_columns"),
    )


def assess_prediction_scores_df(
    scores: DataFrame, score_threshold: float = 0.70
) -> DataFrame:
    """Failing-score rows ``(metric_name, value)`` — the distributed form
    of ``assess_prediction_scores`` (churn_prediction_pipeline.py:434-485;
    threshold default 0.70 per :435,:879). Input: long metrics rows."""
    return scores.where(
        F.col("metric_name").isin("f1score", "precision", "recall", "accuracy")
        & (F.col("value") < F.lit(score_threshold))
    ).select("metric_name", "value")


def assess_data_drift(
    metrics: DataFrame, share_threshold: float = DATASET_DRIFT_SHARE
) -> tuple[bool, int, list[str]]:
    """Predicate over a metrics DataFrame: (dataset drifted?, n drifted
    columns, drifted column names) — churn_prediction_pipeline.py:395-431.
    The metrics frame is tiny (one row per metric); collect is intended.
    """
    rows = metrics.where(
        F.col("metric_name").startswith("driftedcolumnscount")
        | (
            F.col("metric_name").startswith("valuedrift_")
            & (F.col("value") < P_VALUE_DRIFT_THRESHOLD)
        )
    ).collect()
    share = next(
        (r["value"] for r in rows if r["metric_name"] == "driftedcolumnscount[share]"),
        0.0,
    )
    count = next(
        (r["value"] for r in rows if r["metric_name"] == "driftedcolumnscount[count]"),
        0.0,
    )
    drifted_cols = sorted(
        r["metric_name"].removeprefix("valuedrift_")
        for r in rows
        if r["metric_name"].startswith("valuedrift_")
    )
    return bool(share > share_threshold), int(count), drifted_cols


def assess_prediction_scores(
    metrics: DataFrame, score_threshold: float = 0.70
) -> tuple[bool, list[tuple[str, float]]]:
    """Predicate: any of f1score/precision/recall/accuracy below threshold?
    (churn_prediction_pipeline.py:434-485; default 0.70 per :435,:879).
    """
    rows = (
        metrics.where(
            F.col("metric_name").isin("f1score", "precision", "recall", "accuracy")
            & (F.col("value") < F.lit(score_threshold))
        )
        .orderBy("metric_name")
        .collect()
    )
    failing = [(r["metric_name"], float(r["value"])) for r in rows]
    return bool(failing), failing
