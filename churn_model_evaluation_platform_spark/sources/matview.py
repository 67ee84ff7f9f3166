"""Incremental materialized aggregates over a transactional table —
the 100 TB dashboard pattern the commit log makes possible.

The reference recomputes its monitoring aggregates from the full
metrics store on every pipeline run (churn_prediction_pipeline.py:
read-everything → pandas groupby). At 100 TB that full scan is the
whole cost of the dashboard. With a TxnTable the log itself says what
changed: a refresh reads ONLY the data files added by commits after
the last refreshed version and folds their partial aggregates into the
stored state — O(new data), not O(table).

Scope (documented, enforced):
- Aggregates must be DISTRIBUTIVE or ALGEBRAIC over row insertion:
  count / sum / min / max directly, avg as sum+count (folded at read
  time), and approx_distinct as a DataSketches HLL sketch (the state
  is a binary sketch column; per-bucket register max is associative
  and commutative, so unioning per-refresh partials yields the SAME
  sketch as a single pass over all rows — incremental maintenance is
  exact with respect to the sketch, tested). Genuinely
  non-decomposable aggregates (median, exact distinct count) are
  rejected at construction.
- Append-only incrementality: an ``overwrite`` commit in the refresh
  window (compaction, MERGE) invalidates per-row deltas, so the view
  falls back to a FULL recompute for that refresh — detected from the
  log, never guessed. ``compact()`` preserves rows, but the log does
  not know that; correctness beats cleverness here.
- The view state is itself a TxnTable: refreshes are atomic pointer
  swaps (a dashboard reader never sees a half-refreshed view), and the
  refresh high-water mark rides in the state table's commit as the
  ``batch_id`` — replaying a crashed refresh of the same source
  version is idempotent by the txn table's own exactly-once contract.

Spark-first: partial aggregation of the delta files is one narrow
``groupBy`` over just those files (map-side combine, shuffle bounded
by group cardinality); the fold is a ``unionByName`` + re-aggregate of
state × delta — state is group-cardinality-sized, not data-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .txnlog import TxnTable

_SUPPORTED = (
    "count",
    "sum",
    "min",
    "max",
    "avg",
    "var",
    "stddev",
    "approx_distinct",
    "approx_quantile",
)

_DEFAULT_QBINS = 64


class MaterializedAggregate:
    """An incrementally-maintained ``GROUP BY`` over a ``TxnTable``.

    ``aggs``: mapping of output column → ``("count",)`` /
    ``("sum", col)`` / ``("min", col)`` / ``("max", col)`` /
    ``("avg", col)``.
    """

    def __init__(
        self,
        source: TxnTable,
        state_path: str,
        group_cols: list[str],
        aggs: dict[str, tuple],
    ):
        if not aggs:
            raise ValueError("at least one aggregate required")
        for name, spec in aggs.items():
            if not spec or spec[0] not in _SUPPORTED:
                raise ValueError(
                    f"aggregate {name!r}: {spec!r} not in {_SUPPORTED} — "
                    "non-decomposable aggregates (exact median, exact "
                    "count distinct) cannot be folded incrementally; "
                    "distinct counts fold as 'approx_distinct' (an HLL "
                    "sketch), quantiles as 'approx_quantile' (a mergeable "
                    "bounded-range histogram sketch)"
                )
            if spec[0] == "approx_quantile":
                if len(spec) != 3 or not isinstance(spec[2], dict):
                    raise ValueError(
                        f"aggregate {name!r}: approx_quantile takes "
                        "(col, {'p': q, 'lo': lo, 'hi': hi[, 'bins': n]}) — "
                        "the [lo, hi] range bounds the sketch's error at "
                        "(hi-lo)/bins"
                    )
                opts = spec[2]
                missing = [k for k in ("p", "lo", "hi") if k not in opts]
                if missing:
                    raise ValueError(
                        f"aggregate {name!r}: approx_quantile opts missing "
                        f"{missing}"
                    )
                if not (0.0 < float(opts["p"]) < 1.0):
                    raise ValueError(f"aggregate {name!r}: p must be in (0,1)")
                if not float(opts["lo"]) < float(opts["hi"]):
                    raise ValueError(f"aggregate {name!r}: need lo < hi")
            elif spec[0] != "count" and len(spec) != 2:
                raise ValueError(f"aggregate {name!r}: {spec!r} needs a column")
        self.source = source
        self.group_cols = list(group_cols)
        self.aggs = dict(aggs)
        self.state = TxnTable(source.spark, state_path)

    # -- internal columns: every aggregate kept in fold-able form ---------

    def _partial_exprs(self) -> list:
        """Aggregate a ROW batch into internal partial columns."""
        out = []
        for name, spec in self.aggs.items():
            kind = spec[0]
            if kind == "count":
                out.append(F.count(F.lit(1)).alias(f"__cnt_{name}"))
            elif kind == "sum":
                out.append(F.sum(spec[1]).alias(f"__sum_{name}"))
            elif kind == "min":
                out.append(F.min(spec[1]).alias(f"__min_{name}"))
            elif kind == "max":
                out.append(F.max(spec[1]).alias(f"__max_{name}"))
            elif kind == "avg":  # algebraic: carry (sum, count)
                out.append(F.sum(spec[1]).alias(f"__sum_{name}"))
                out.append(
                    F.count(F.when(F.col(spec[1]).isNotNull(), 1)).alias(
                        f"__cnt_{name}"
                    )
                )
            elif kind in ("var", "stddev"):
                # algebraic: (sum, sum of squares, non-null count).
                # Textbook ssq form, not Welford — folding partials is
                # exact either way; the cancellation caveat only bites
                # when |mean| >> stddev, documented
                c = F.col(spec[1]).cast("double")
                out.append(F.sum(c).alias(f"__sum_{name}"))
                out.append(F.sum(c * c).alias(f"__ssq_{name}"))
                out.append(
                    F.count(F.when(c.isNotNull(), 1)).alias(f"__cnt_{name}")
                )
            elif kind == "approx_distinct":
                # DataSketches HLL: the state IS mergeable — per-bucket
                # register max is associative/commutative, so any
                # grouping of the input into partials unions to the
                # SAME sketch as a single pass (tested)
                out.append(
                    F.hll_sketch_agg(spec[1]).alias(f"__hll_{name}")
                )
            elif kind == "approx_quantile":
                # mergeable bounded-range histogram: bin counts are a
                # vector the fold adds elementwise — like the HLL, any
                # grouping of rows into partials sums to the IDENTICAL
                # state a single pass would build. Error <= bin width
                # = (hi-lo)/bins; out-of-range values clamp to the
                # edge bins (quantile then saturates at lo/hi)
                bucket = self._qbucket(spec)
                nbins = int(spec[2].get("bins", _DEFAULT_QBINS))
                out.append(
                    F.array(
                        *[
                            F.sum(
                                F.when(bucket == i, 1).otherwise(0)
                            ).cast("long")
                            for i in range(nbins)
                        ]
                    ).alias(f"__qh_{name}")
                )
        return out

    @staticmethod
    def _qbucket(spec: tuple):
        opts = spec[2]
        lo, hi = float(opts["lo"]), float(opts["hi"])
        nbins = int(opts.get("bins", _DEFAULT_QBINS))
        width = (hi - lo) / nbins
        raw = F.floor((F.col(spec[1]).cast("double") - F.lit(lo)) / F.lit(width))
        clamped = F.least(
            F.lit(nbins - 1), F.greatest(F.lit(0), raw)
        ).cast("int")
        # NULLs must stay NULL: greatest/least SKIP null operands, so
        # the bare clamp would silently bucket a NULL value at bin 0
        # and drag every quantile toward lo (r8 review)
        return F.when(F.col(spec[1]).isNotNull(), clamped)

    def _fold_exprs(self) -> list:
        """Fold partial columns across state ∪ delta: counts/sums add,
        min/max re-min/max."""
        out = []
        for name, spec in self.aggs.items():
            kind = spec[0]
            if kind == "count":
                out.append(F.sum(f"__cnt_{name}").alias(f"__cnt_{name}"))
            elif kind == "sum":
                out.append(F.sum(f"__sum_{name}").alias(f"__sum_{name}"))
            elif kind == "min":
                out.append(F.min(f"__min_{name}").alias(f"__min_{name}"))
            elif kind == "max":
                out.append(F.max(f"__max_{name}").alias(f"__max_{name}"))
            elif kind == "avg":
                out.append(F.sum(f"__sum_{name}").alias(f"__sum_{name}"))
                out.append(F.sum(f"__cnt_{name}").alias(f"__cnt_{name}"))
            elif kind in ("var", "stddev"):
                out.append(F.sum(f"__sum_{name}").alias(f"__sum_{name}"))
                out.append(F.sum(f"__ssq_{name}").alias(f"__ssq_{name}"))
                out.append(F.sum(f"__cnt_{name}").alias(f"__cnt_{name}"))
            elif kind == "approx_distinct":
                out.append(
                    F.hll_union_agg(f"__hll_{name}").alias(f"__hll_{name}")
                )
            elif kind == "approx_quantile":
                nbins = int(spec[2].get("bins", _DEFAULT_QBINS))
                out.append(
                    F.array(
                        *[
                            F.sum(F.element_at(f"__qh_{name}", i + 1)).cast(
                                "long"
                            )
                            for i in range(nbins)
                        ]
                    ).alias(f"__qh_{name}")
                )
        return out

    def _partial(self, rows: DataFrame) -> DataFrame:
        return rows.groupBy(*self.group_cols).agg(*self._partial_exprs())

    # -- refresh ----------------------------------------------------------

    def refreshed_version(self) -> int | None:
        """Source version the state currently reflects (the state
        table's newest batch_id), or None before the first refresh."""
        ids = self.state.batch_ids()
        return max(ids) if ids else None

    def refresh(self) -> dict:
        """Bring the view up to the source's latest version. Returns
        ``{"mode": "noop"|"incremental"|"full", "from": v, "to": v}``.

        Incremental when every commit in ``(from, to]`` is an append:
        aggregate ONLY those commits' files and fold into state. Any
        overwrite in the window → full recompute (per-row deltas are
        unknowable from the log). Either way the new state lands as ONE
        atomic overwrite of the state table, stamped with the source
        version as batch_id — a replayed refresh of the same version
        is skipped by the state table's exactly-once contract, and the
        overwrite is CONDITIONAL on the state version the fold was
        computed from, so two concurrent refreshes cannot lose a
        source commit (the faster one wins; the slower recomputes from
        the new state — r8 review)."""
        from .txnlog import CommitConflict

        last_err: CommitConflict | None = None
        for _ in range(3):
            state_base = self.state.latest_version()
            ids = (
                self.state._state(version=state_base)["batch_ids"]
                if state_base is not None
                else set()
            )
            last = max(ids) if ids else None
            latest = self.source.latest_version()
            if latest is None:
                raise ValueError(f"source {self.source.path} has no commits")
            if last == latest:
                return {"mode": "noop", "from": last, "to": latest}
            src_state = self.source._state(version=latest)
            window = self.source._commits(since=last or 0, until=latest)
            incremental = last is not None and all(
                c["action"] == "append" for c in window
            )
            if incremental:
                new_rels = [rel for c in window for rel in c["added"]]
                mode = "incremental"
                if new_rels:
                    # read through the source's log schema (additive
                    # evolution: a delta file may omit columns the
                    # table — and the aggregates — still carry)
                    delta = self._partial(
                        self.source._read_files(src_state, new_rels)
                    )
                    folded = (
                        self.state.snapshot(version=state_base)
                        .unionByName(delta)
                        .groupBy(*self.group_cols)
                        .agg(*self._fold_exprs())
                    )
                else:  # empty appends: state unchanged, advance the mark
                    folded = self.state.snapshot(version=state_base)
            else:
                mode = "full"
                folded = self._partial(self.source.snapshot(version=latest))
            try:
                self.state.overwrite(
                    folded, batch_id=latest, require_latest=state_base
                )
                return {"mode": mode, "from": last, "to": latest}
            except CommitConflict as e:  # rival refresh landed: redo
                last_err = e
        raise last_err  # pragma: no cover - needs 3 straight rival refreshes

    # -- read -------------------------------------------------------------

    def read(self) -> DataFrame:
        """The user-facing view: internal partials rendered as the
        requested aggregates (avg = sum/count at read time)."""
        cols = [F.col(c) for c in self.group_cols]
        for name, spec in self.aggs.items():
            kind = spec[0]
            if kind == "count":
                cols.append(F.col(f"__cnt_{name}").alias(name))
            elif kind == "sum":
                cols.append(F.col(f"__sum_{name}").alias(name))
            elif kind == "min":
                cols.append(F.col(f"__min_{name}").alias(name))
            elif kind == "max":
                cols.append(F.col(f"__max_{name}").alias(name))
            elif kind == "avg":
                cols.append(
                    (
                        F.col(f"__sum_{name}")
                        / F.nullif(F.col(f"__cnt_{name}"), F.lit(0))
                    ).alias(name)
                )
            elif kind in ("var", "stddev"):
                n = F.col(f"__cnt_{name}")
                # (ssq − sum²/n)/(n−1), clamped at 0 (float cancellation
                # can go a hair negative); n<2 → NULL, not a 0/0 error
                var = F.greatest(
                    F.lit(0.0),
                    (
                        F.col(f"__ssq_{name}")
                        - F.col(f"__sum_{name}") * F.col(f"__sum_{name}")
                        / n.cast("double")
                    )
                    / (n - 1).cast("double"),
                )
                var = F.when(n >= 2, var)
                cols.append(
                    (F.sqrt(var) if kind == "stddev" else var).alias(name)
                )
            elif kind == "approx_distinct":
                cols.append(
                    F.hll_sketch_estimate(F.col(f"__hll_{name}")).alias(name)
                )
            elif kind == "approx_quantile":
                cols.append(self._qread(name, spec).alias(name))
        return self.state.snapshot().select(*cols)

    @staticmethod
    def _qread(name: str, spec: tuple):
        """Histogram → quantile estimate, pure Catalyst: one HOF fold
        finds the first bin whose cumulative count reaches ceil(p·n);
        the estimate is that bin's midpoint. Convention: this targets
        the ceil(p·n)-th ORDER STATISTIC (the lower empirical
        quantile, type-1 in the Hyndman–Fan taxonomy), not an
        interpolated percentile — the estimate is within half a bin
        width of that order statistic (tested)."""
        opts = spec[2]
        lo, hi = float(opts["lo"]), float(opts["hi"])
        nbins = int(opts.get("bins", _DEFAULT_QBINS))
        width = (hi - lo) / nbins
        p = float(opts["p"])
        arr = F.col(f"__qh_{name}")
        total = F.aggregate(
            arr, F.lit(0).cast("long"), lambda a, x: a + x
        )
        target = F.ceil(F.lit(p) * total.cast("double")).cast("long")
        init = F.struct(
            F.lit(0).cast("long").alias("cum"),
            F.lit(-1).alias("idx"),
            F.lit(0).alias("pos"),
        )
        scan = F.aggregate(
            arr,
            init,
            lambda a, x: F.struct(
                (a["cum"] + x).alias("cum"),
                F.when(a["idx"] >= 0, a["idx"])
                .otherwise(
                    F.when(a["cum"] + x >= target, a["pos"]).otherwise(
                        F.lit(-1)
                    )
                )
                .alias("idx"),
                (a["pos"] + 1).alias("pos"),
            ),
        )
        return F.when(
            total > 0,
            F.lit(lo) + (scan["idx"].cast("double") + 0.5) * F.lit(width),
        )


__all__ = ["MaterializedAggregate"]
