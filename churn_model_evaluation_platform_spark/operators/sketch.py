"""Mergeable distinct-count sketches with ENGINE-PORTABLE determinism
(HyperLogLog — Flajolet et al. 2007).

Spark's built-in ``approx_count_distinct`` is an HLL++ whose hash and
register layout are JVM-internal: fine for one-off estimates, but its
state can't be stored, merged across increments, or replayed by an
independent engine. This module builds the registers EXPLICITLY from
the repo's portable md5 hash (functions/hashing.py), which buys the
two things a 100 TB metrics pipeline actually needs:

- **Mergeable partials** (the incremental-aggregate pattern): sketch
  each day/partition once — an m-row register frame, thousands of
  times smaller than the data — persist it, and answer "distinct over
  any window" by max-merging registers instead of rescanning raw
  events. Register max is associative/commutative/idempotent, so
  merged == one-shot by construction (pinned in tests AND hash-checked
  in the registry).
- **Cross-engine replay**: every step (hash, bucket, rho via minimal
  binary length, the 2^-rho sum) is exact integer/string arithmetic,
  so the DuckDB oracle reproduces the registers and the estimate
  bit-for-bit. The only libm in the stack is the final ln() of the
  small-range (linear counting) correction, rounded at grain 1e-4.

Layout: 60-bit md5 hash → bucket = h % m (p = log2(m) bits), suffix
v = h >> p (w = 60 − p bits), rho = leading-zeros(v) + 1 in w bits =
w − bitlength(v) + 1 (bitlength via length(bin(v)) — minimal binary
string on both engines, verified). The indicator sum Σ 2^−M_j is
carried as exact integers scaled by 2^(w+1) (max m·2^(w+1) ≪ 2^63),
so it is order-free across engines; empty registers contribute 2^0.

Scale shape: one explode-free projection + groupBy(bucket) partial
aggregation (map-side combine does almost all the work; the shuffle
is m rows per partial). Estimation is an m-row fold to one row.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_hash_int

HLL_P = 10  #: default precision: m = 1024 registers, ~3.25% std error
_HASH_CHARS = 15  #: 60-bit portable hashes (< 2^63 after any shift)


def _m(p: int) -> int:
    return 1 << p


def _w(p: int) -> int:
    return 4 * _HASH_CHARS - p  # suffix bits


def hll_alpha(p: int = HLL_P) -> float:
    """Bias constant alpha_m (Flajolet et al. 2007, Fig. 3); written as
    the same closed form the SQL oracle inlines so both engines fold
    the identical double."""
    m = _m(p)
    if m >= 128:
        return 0.7213 / (1.0 + 1.079 / m)
    return {16: 0.673, 32: 0.697, 64: 0.709}[m]


def hll_registers(
    df: DataFrame,
    col: str,
    p: int = HLL_P,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """HLL register frame for ``col``: (``group_cols...``, bucket,
    rho) with rho = max over the group's values — at most m rows per
    group regardless of input size. NULLs are skipped (COUNT DISTINCT
    semantics). This frame IS the mergeable partial: persist it per
    increment, max-merge per bucket across increments."""
    group_cols = group_cols or []
    bucket, rho = hll_register_cols(col, p)
    return (
        df.where(F.col(col).isNotNull())
        .select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_register_cols(col: str, p: int = HLL_P):
    """The ROW-LEVEL (bucket, rho) projection shared by the batch
    aggregate and the streaming partial path — one hash-arithmetic
    source."""
    m = _m(p)
    w = _w(p)
    h = md5_hash_int(F.col(col).cast("string"), _HASH_CHARS)
    # h >> p, NOT h / m: double division would round above 2^53.
    v = F.shiftright(h, p)
    rho = F.when(v > 0, F.lit(w) - F.length(F.bin(v)) + 1).otherwise(
        F.lit(w + 1)
    )
    return (h % F.lit(m)), rho


def hll_stream_partials(
    sdf: DataFrame, col: str, p: int = HLL_P
) -> DataFrame:
    """APPEND-MODE streaming register partials — the shape the native
    ``writeStream.format("txnlog")`` sink can carry. A streaming
    ``groupBy(bucket).max(rho)`` is a STATEFUL aggregation (needs
    update/complete mode, which a DSv2 append sink refuses); instead
    this is the classic map-side partial combine made explicit: the
    (bucket, rho) projection stays in Catalyst (row-narrow, the same
    ``hll_register_cols`` arithmetic as the batch path), and a
    stateless ``mapInArrow`` pass keeps ONE running max per bucket per
    partition, emitting ≤ m rows per input partition per micro-batch.
    Appended partials max-merge at read time to exactly the one-shot
    registers (max is associative/commutative/idempotent), so the
    estimate is EXACT vs the batch path at any partitioning — and the
    ingest never shuffles at all (the library ``foreachBatch`` path
    shuffles per batch; this one defers ALL merging to read).
    """
    import pyarrow as pa

    bucket, rho = hll_register_cols(col, p)
    rows = sdf.where(F.col(col).isNotNull()).select(
        bucket.alias("bucket"), rho.alias("rho")
    )

    def _partial(batches):
        best: dict = {}
        for batch in batches:
            for b, r in zip(
                batch.column(0).to_pylist(), batch.column(1).to_pylist()
            ):
                if r > best.get(b, 0):
                    best[b] = r
        if best:
            yield pa.record_batch(
                [
                    pa.array(list(best.keys()), pa.int64()),
                    pa.array(list(best.values()), pa.int32()),
                ],
                names=["bucket", "rho"],
            )

    return rows.mapInArrow(_partial, "bucket long, rho int")


def hll_merge(registers: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Merge register partials (e.g. one frame per day, unioned):
    register max per bucket. Associative + idempotent — re-merging a
    partial is a no-op, so at-least-once incremental maintenance is
    safe."""
    group_cols = group_cols or []
    return registers.groupBy(*group_cols, "bucket").agg(
        F.max("rho").alias("rho")
    )


def hll_estimate(
    registers: DataFrame,
    p: int = HLL_P,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Distinct-count estimate from a register frame: bias-corrected
    harmonic mean with the small-range linear-counting correction
    (E ≤ 2.5m and empty registers present → m·ln(m/zeros)). The
    indicator sum is exact integer arithmetic (order-free); the final
    estimate is rounded at 1e-4 (the ln() is the only libm step).
    Returns (``group_cols...``, n_buckets_used, hll_estimate)."""
    group_cols = group_cols or []
    m = _m(p)
    w = _w(p)
    scale = F.shiftleft(F.lit(1).cast("bigint"), w + 1)
    # shift amount is a COLUMN → the SQL form (pyspark's shiftleft
    # helper only takes an int literal)
    term = F.expr(f"shiftleft(cast(1 as bigint), {w + 1} - rho)")
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_used"),
        F.sum(term).alias("sum_int"),
    )
    zeros = F.lit(m) - F.col("n_used")
    z_scaled = (F.col("sum_int") + zeros * scale).cast("double")
    e_raw = (
        F.lit(hll_alpha(p)) * F.lit(float(m * m)) * scale.cast("double")
    ) / z_scaled
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(e_raw)
    return agg.select(
        *group_cols,
        F.col("n_used").alias("n_buckets_used"),
        F.round(est, 4).alias("hll_estimate"),
    )


def hll_distinct(
    df: DataFrame,
    col: str,
    p: int = HLL_P,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """One-shot distinct estimate: registers → estimate."""
    return hll_estimate(
        hll_registers(df, col, p=p, group_cols=group_cols),
        p=p,
        group_cols=group_cols,
    )


# ---------------------------------------------------------------------------
# DuckDB replay
# ---------------------------------------------------------------------------


def hll_registers_sql(
    source_sql: str, col: str, p: int = HLL_P, group_cols: str = ""
) -> str:
    """Register CTE body over ``source_sql`` (yields ``col`` and any
    group columns): identical hash/bucket/rho arithmetic."""
    m = _m(p)
    w = _w(p)
    gsel = f"{group_cols}, " if group_cols else ""
    h = (
        f"CAST('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, "
        f"{_HASH_CHARS}) AS BIGINT)"
    )
    return f"""
  SELECT {gsel}bucket, max(rho) AS rho FROM (
    SELECT {gsel}({h}) % {m} AS bucket,
           CASE WHEN ({h}) // {m} > 0
                THEN {w} - length(bin(({h}) // {m})) + 1
                ELSE {w + 1} END AS rho
    FROM ({source_sql}) WHERE {col} IS NOT NULL
  ) GROUP BY {"ALL" if not group_cols else gsel.rstrip(", ") + ", bucket"}
"""


def hll_estimate_sql(
    registers_sql: str, p: int = HLL_P, group_cols: str = ""
) -> str:
    """Estimate over a register CTE — identical integer indicator sum,
    bias constant, and small-range branch."""
    m = _m(p)
    w = _w(p)
    gsel = f"{group_cols}, " if group_cols else ""
    gby = f"GROUP BY {group_cols}" if group_cols else ""
    # Single alpha source for both engines: hll_alpha() returns table
    # constants for m<128 where the closed form would diverge.
    # CAST: DuckDB parses a bare float literal as DECIMAL, which
    # overflows in the m²·2^(w+1) product; Spark folds a double.
    alpha = f"CAST({hll_alpha(p)!r} AS DOUBLE)"
    scale = 1 << (w + 1)
    return f"""
  SELECT {gsel}
         CAST(n_used AS BIGINT) AS n_buckets_used,
         round(CASE WHEN ({alpha} * {float(m * m)} * {float(scale)})
                         / CAST(sum_int + ({m} - n_used) * {scale}
                                AS DOUBLE) <= {2.5 * m}
                     AND {m} - n_used > 0
                    THEN {float(m)} * ln({float(m)}
                         / CAST({m} - n_used AS DOUBLE))
                    ELSE ({alpha} * {float(m * m)} * {float(scale)})
                         / CAST(sum_int + ({m} - n_used) * {scale}
                                AS DOUBLE) END, 4) AS hll_estimate
  FROM (
    SELECT {gsel}count(*) AS n_used,
           sum((CAST(1 AS BIGINT) << ({w + 1} - rho))) AS sum_int
    FROM ({registers_sql}) {gby}
  )
"""


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005) — the frequency
# twin of the HLL: d portable hash rows × w counters, estimate =
# min_j counter[j][h_j(x)]. Counters are SUMS, so partials merge by
# addition (associative/commutative — NOT idempotent: exactly-once
# increments required, which the txn-table sink's claimed batch ids
# provide). Guarantees: est ≥ true count always; est ≤ true +
# ε·N with probability 1−δ for ε = e/w, δ = e^−d. All integer
# arithmetic on the portable md5 hash — the oracle replays counters
# and estimates exactly.
# ---------------------------------------------------------------------------

CMS_D = 4  #: hash rows (δ = e^-4 ≈ 1.8%)
CMS_W = 512  #: counters per row (ε = e/512 ≈ 0.53% of stream size)


def cms_counters(
    df: DataFrame, col: str, d: int = CMS_D, w: int = CMS_W
) -> DataFrame:
    """Sparse counter frame (j, bucket, c) — ≤ d·w rows regardless of
    input size; groupBy partials mean map-side combine carries the
    weight. NULLs are skipped. Merge partials with
    ``cms_merge`` (counter addition)."""
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("j"),
                    (
                        md5_hash_int(
                            F.concat(
                                F.col(col).cast("string"),
                                F.lit(f"|cms|{j}"),
                            )
                        )
                        % w
                    ).alias("bucket"),
                )
                for j in range(d)
            ]
        )
    )
    return (
        df.where(F.col(col).isNotNull())
        .select(rows.alias("s"))
        .select("s.j", "s.bucket")
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_merge(counters: DataFrame) -> DataFrame:
    """Merge counter partials: per-cell SUM (requires exactly-once
    partial delivery — addition is not idempotent)."""
    return counters.groupBy("j", "bucket").agg(F.sum("c").alias("c"))


def cms_estimate(
    counters: DataFrame,
    probes: DataFrame,
    probe_col: str = "probe",
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """Point-frequency estimates for ``probes`` (one row per probe
    value): est = min over the d rows of the addressed counter (0 when
    the cell was never touched). Returns (probe, cms_estimate)."""
    addressed = probes.select(
        F.col(probe_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        (
                            md5_hash_int(
                                F.concat(
                                    F.col(probe_col).cast("string"),
                                    F.lit(f"|cms|{j}"),
                                )
                            )
                            % w
                        ).alias("bucket"),
                    )
                    for j in range(d)
                ]
            )
        ).alias("s"),
    ).select(probe_col, "s.j", "s.bucket")
    return (
        addressed.join(F.broadcast(counters), ["j", "bucket"], "left")
        .groupBy(probe_col)
        .agg(
            F.min(F.coalesce(F.col("c"), F.lit(0)))
            .cast("bigint")
            .alias("cms_estimate")
        )
    )


def cms_sql(
    source_sql: str,
    col: str,
    probes_sql: str,
    d: int = CMS_D,
    w: int = CMS_W,
) -> str:
    """DuckDB replay: identical hashes, counters, min-estimate.
    ``probes_sql`` yields one column ``probe``."""

    def h(expr: str, j: int) -> str:
        return (
            f"CAST('0x' || substr(md5(CAST({expr} AS VARCHAR) || "
            f"'|cms|{j}'), 1, 7) AS BIGINT) % {w}"
        )

    addr_rows = " UNION ALL ".join(
        f"SELECT {j} AS j, {h(col, j)} AS bucket FROM src" for j in range(d)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT probe, {j} AS j, {h('probe', j)} AS bucket FROM probes"
        for j in range(d)
    )
    return f"""
WITH src AS ({source_sql}),
probes AS ({probes_sql}),
counters AS (
  SELECT j, bucket, count(*) AS c FROM ({addr_rows})
  WHERE bucket IS NOT NULL GROUP BY 1, 2
),
addressed AS ({probe_rows})
SELECT probe,
       CAST(min(coalesce(c, 0)) AS BIGINT) AS cms_estimate
FROM addressed LEFT JOIN counters USING (j, bucket)
GROUP BY probe
"""


# ---------------------------------------------------------------------------
# Bottom-k / KMV sketch (Bar-Yossef et al. 2002; Beyer et al. 2007
# "On Synopses for Distinct-Value Estimation...") — the k MINIMUM
# portable-hash values over the distinct keys. One structure, three
# uses: a uniform sample WITHOUT replacement over distinct keys, a
# distinct-count estimator (KMV: (k−1)·H / h_(k) with H the hash-space
# size), and (between two sketches) a Jaccard estimator. Mergeable by
# taking the k smallest of the union — min-style, so idempotent like
# the HLL (at-least-once safe). All integer arithmetic until the final
# division; the oracle replays the sketch exactly.
# ---------------------------------------------------------------------------

KMV_K = 64  #: default k: std error ~ 1/sqrt(k-2) ≈ 12.7%
_HASH_SPACE = float(16**_HASH_CHARS)  # 2^60


def bottomk_sketch(df: DataFrame, col: str, k: int = KMV_K) -> DataFrame:
    """The k smallest distinct hash values of ``col`` (ties impossible
    — distinct hashes): (hv, v) rows, ≤ k of them. ``v`` keeps one
    witness value per hash, making the sketch a uniform distinct-key
    sample. TakeOrderedAndProject over a distinct — no global sort."""
    h = md5_hash_int(F.col(col).cast("string"), _HASH_CHARS)
    return (
        df.where(F.col(col).isNotNull())
        .select(h.alias("hv"), F.col(col).alias("v"))
        .distinct()
        .orderBy("hv")
        .limit(k)
    )


def bottomk_merge(sketches: DataFrame, k: int = KMV_K) -> DataFrame:
    """Merge bottom-k partials (unioned (hv, v) frames): k smallest of
    the union. Idempotent — safe under at-least-once delivery."""
    return sketches.distinct().orderBy("hv").limit(k)


def kmv_estimate(sketch: DataFrame, k: int = KMV_K) -> DataFrame:
    """KMV distinct-count estimate from a bottom-k sketch: if the
    sketch is full (n = k), est = (k−1)·H / h_(k); else the sketch
    holds EVERY distinct hash and n IS the count (exact small-range).
    Returns one row (n_sketch, kmv_estimate), rounded 1e-4."""
    agg = sketch.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sketch"),
        F.max("hv").alias("h_k"),
    )
    est = F.when(
        F.col("n_sketch") >= k,
        F.lit(float(k - 1))
        * F.lit(_HASH_SPACE)
        / F.col("h_k").cast("double"),
    ).otherwise(F.col("n_sketch").cast("double"))
    return agg.select(
        "n_sketch", F.round(est, 4).alias("kmv_estimate")
    )


def kmv_sql(source_sql: str, col: str, k: int = KMV_K) -> str:
    """DuckDB replay of sketch + estimate over ``source_sql``."""
    h = (
        f"CAST('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, "
        f"{_HASH_CHARS}) AS BIGINT)"
    )
    return f"""
  SELECT CAST(n_sketch AS BIGINT) AS n_sketch,
         round(CASE WHEN n_sketch >= {k}
                    THEN {float(k - 1)} * {_HASH_SPACE}
                         / CAST(h_k AS DOUBLE)
                    ELSE CAST(n_sketch AS DOUBLE) END, 4) AS kmv_estimate
  FROM (
    SELECT count(*) AS n_sketch, max(hv) AS h_k FROM (
      SELECT DISTINCT {h} AS hv
      FROM ({source_sql}) WHERE {col} IS NOT NULL
      ORDER BY hv LIMIT {k}
    )
  )
"""


# ---------------------------------------------------------------------------
# Mergeable histogram quantiles — the QUANTILE synopsis completing the
# distinct (HLL) / frequency (CMS) / sample (KMV) trio: fixed-range
# equi-width bin counts, mergeable by ADDITION (like the CMS — the
# txn sink's exactly-once batch ids apply), answering any quantile to
# within one bin width by linear interpolation over the cumulative
# counts. The fixed range comes from domain knowledge or the txn
# table's own min/max column stats (zero extra data pass); Spark's
# percentile_approx answers one query but its internal state is not a
# persistable, cross-engine-replayable table — this is.
# ---------------------------------------------------------------------------

HIST_BINS = 256


def hist_registers(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    nbins: int = HIST_BINS,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-width bin counts over ``[lo, hi)`` — ≤ nbins rows per
    group; out-of-range values clamp to the edge bins (counted, so
    quantiles stay rank-correct; edge-bin interpolation degrades to
    the bin boundary). NULLs skipped. Merge partials by summing
    counts per bin (``hist_merge``)."""
    group_cols = group_cols or []
    w = (hi - lo) / nbins
    # clamp BEFORE the int cast: floor() yields bigint, and a value
    # ~2^31 bin-widths past hi would WRAP through a bigint->int cast
    # (ANSI off) into an interior bin instead of the edge
    b = F.least(
        F.lit(nbins - 1).cast("bigint"),
        F.greatest(
            F.lit(0).cast("bigint"),
            F.floor((F.col(col) - F.lit(lo)) / F.lit(w)),
        ),
    ).cast("int")
    return (
        # NaN rows are dropped alongside NULLs: Spark's non-ANSI cast
        # would silently bin floor(NaN) while DuckDB raises on the
        # BIGINT conversion — filtering keeps both engines comparable.
        df.where(
            F.col(col).isNotNull()
            & ~F.isnan(F.col(col).cast("double"))
        )
        .select(*group_cols, b.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def hist_merge(registers: DataFrame) -> DataFrame:
    """Merge histogram partials: per-bin SUM (exactly-once delivery
    required — addition is not idempotent)."""
    return registers.groupBy("bin").agg(F.sum("c").alias("c"))


def hist_quantiles(
    registers: DataFrame,
    qs: list[float],
    lo: float,
    hi: float,
    nbins: int = HIST_BINS,
) -> DataFrame:
    """Quantile estimates from a histogram register frame: for each q,
    locate the first bin whose cumulative count reaches rank q·N and
    linearly interpolate inside it — error ≤ one bin width for
    interior bins. All arithmetic from exact integer counts; the
    interpolation is the only double math, rounded at 1e-6. Returns
    (q, hist_estimate)."""
    from pyspark.sql import Window

    w = (hi - lo) / nbins
    # single-partition window over ≤ nbins post-aggregate rows — the
    # dashboard-grain shape, never data
    cum = registers.select(
        "bin",
        "c",
        F.sum("c").over(Window.orderBy("bin")).alias("cum"),
    )
    total = registers.agg(F.sum("c").alias("n_total"))
    qdf = None
    for q in qs:
        row = F.broadcast(
            total.select(
                F.lit(q).alias("q"),
                (F.lit(q) * F.col("n_total")).alias("target"),
            )
        )
        qdf = row if qdf is None else qdf.unionByName(row)
    hit = (
        qdf.join(cum, F.col("cum") >= F.col("target"))
        .groupBy("q", "target")
        .agg(F.min("bin").alias("bin"))
    )
    est = (
        hit.join(cum, "bin")
        .select(
            "q",
            F.round(
                F.lit(lo)
                + F.col("bin") * F.lit(w)
                + F.lit(w)
                * (F.col("target") - (F.col("cum") - F.col("c")))
                / F.col("c"),
                6,
            ).alias("hist_estimate"),
        )
    )
    return est


def hist_sql(
    source_sql: str,
    col: str,
    qs: list[float],
    lo: float,
    hi: float,
    nbins: int = HIST_BINS,
    partial_group: str | None = None,
) -> str:
    """DuckDB replay of registers + quantile interpolation over
    ``source_sql``. With ``partial_group`` (a column ``source_sql``
    must also yield), the registers are built as PER-GROUP PARTIALS
    first and then sum-merged per bin — a genuinely independent replay
    of the merge path, not a re-labeled one-shot."""
    w = (hi - lo) / nbins
    q_rows = " UNION ALL ".join(f"SELECT CAST({q} AS DOUBLE) AS q" for q in qs)
    pg = f"{partial_group}, " if partial_group else ""
    partials = f"""
  SELECT {pg}CAST(least({nbins - 1},
               greatest(0, CAST(floor(({col} - {lo!r}) / {w!r}) AS BIGINT)))
           AS INT) AS bin,
         count(*) AS c
  FROM src
  WHERE {col} IS NOT NULL AND NOT isnan(CAST({col} AS DOUBLE))
  GROUP BY ALL
"""
    regs = (
        f"SELECT bin, sum(c) AS c FROM ({partials}) GROUP BY bin"
        if partial_group
        else partials
    )
    return f"""
WITH src AS ({source_sql}),
regs AS ({regs}),
cum AS (
  SELECT bin, c, sum(c) OVER (ORDER BY bin) AS cum FROM regs
),
total AS (SELECT sum(c) AS n_total FROM regs),
qs AS ({q_rows}),
targets AS (SELECT q, q * n_total AS target FROM qs CROSS JOIN total),
hit AS (
  SELECT t.q, t.target, min(cum.bin) AS bin
  FROM targets t JOIN cum ON cum.cum >= t.target
  GROUP BY 1, 2
)
SELECT h.q,
       round({lo!r} + h.bin * {w!r}
             + {w!r} * (h.target - (cum.cum - cum.c)) / cum.c, 6)
         AS hist_estimate
FROM hit h JOIN cum ON cum.bin = h.bin
"""


# ---------------------------------------------------------------------------
# Portable Bloom filter — the FIFTH mergeable sketch (OR-merge,
# IDEMPOTENT like HLL/KMV: at-least-once delivery safe), and the
# scale path for membership gates whose reference set outgrows a raw
# broadcast: the filter is a FIXED-SIZE bitmap table (≤ m_words rows
# of 63 usable bits each — 63, not 64, so ``1 << bit`` can never
# overflow a signed BIGINT on either engine) built once over the
# reference values and broadcast everywhere. One-sided error: NO
# false negatives (a membership gate built on it can never MISS), a
# measurable false-positive rate ≈ fill_ratio^k. All arithmetic is
# exact integers from portable md5 (positions = md5(value || '#' || i)
# mod m_bits), so DuckDB replays the bitmap — and therefore the exact
# false-positive SET — bit for bit.
# ---------------------------------------------------------------------------

BLOOM_M_WORDS = 256  # 256 * 63 = 16,128 bits
BLOOM_K = 4
_BLOOM_CHARS = 15  # 60-bit positive md5 prefix


def bloom_positions(col: Column, k: int = BLOOM_K, m_words: int = BLOOM_M_WORDS):
    """The k (word, bit) pairs for a STRING column value — an array of
    structs, pure Catalyst."""
    m_bits = m_words * 63
    return F.array(
        *[
            F.struct(
                F.floor(
                    (md5_hash_int(
                        F.concat(col, F.lit(f"#{i}")), _BLOOM_CHARS
                    ) % m_bits)
                    / F.lit(63)
                ).cast("int").alias("w"),
                (
                    md5_hash_int(
                        F.concat(col, F.lit(f"#{i}")), _BLOOM_CHARS
                    ) % m_bits
                    % 63
                ).cast("int").alias("b"),
            )
            for i in range(k)
        ]
    )


def bloom_registers(
    df: DataFrame,
    col: str,
    k: int = BLOOM_K,
    m_words: int = BLOOM_M_WORDS,
) -> DataFrame:
    """Bloom bitmap over ``col`` (cast to string): (word_idx, bits) —
    ≤ m_words rows regardless of input size. Persist per increment;
    OR-merge partials (``bloom_merge``)."""
    pos = df.where(F.col(col).isNotNull()).select(
        F.explode(
            bloom_positions(F.col(col).cast("string"), k, m_words)
        ).alias("p")
    )
    return (
        pos.select(F.col("p.w").alias("word_idx"), F.col("p.b").alias("b"))
        .groupBy("word_idx")
        .agg(
            F.expr("bit_or(shiftleft(1L, b))").cast("bigint").alias("bits")
        )
    )


def bloom_merge(registers: DataFrame) -> DataFrame:
    """Merge partials: per-word bitwise OR — idempotent (at-least-once
    safe, the HLL/KMV side of the merge-semantics contrast)."""
    return registers.groupBy("word_idx").agg(
        F.expr("bit_or(bits)").cast("bigint").alias("bits")
    )


def bloom_probe_counts(
    candidates: DataFrame,
    registers: DataFrame,
    col: str,
    group_cols: list,
    k: int = BLOOM_K,
    m_words: int = BLOOM_M_WORDS,
) -> DataFrame:
    """Per-group count of candidate values the filter says are
    members: explode each candidate's k (word, bit) pairs, broadcast-
    join the ≤ m_words bitmap, member iff ALL k bits set. Returns
    (group_cols..., n_bloom_hits). Candidates are deduplicated per
    group INSIDE the operator — a value occurring twice would explode
    to 2k hit rows and fail the ``== k`` membership test, silently
    dropping a genuine member (a false negative from an operator whose
    contract is false-negative-freedom). Only (group, candidate)
    pairs shuffle; the corpus text itself never does."""
    pos = candidates.select(
        *group_cols,
        F.col(col).cast("string").alias("__v"),
    ).dropDuplicates([*group_cols, "__v"]).select(
        *group_cols,
        "__v",
        F.explode(bloom_positions(F.col("__v"), k, m_words)).alias("p"),
    ).select(
        *group_cols,
        "__v",
        F.col("p.w").alias("word_idx"),
        F.col("p.b").alias("b"),
    )
    hits = (
        pos.join(F.broadcast(bloom_merge(registers)), "word_idx")
        .where(F.expr("(bits >> b) & 1") == 1)
        .groupBy(*group_cols, "__v")
        .agg(F.count(F.lit(1)).alias("__n_set"))
        .where(F.col("__n_set") == k)
    )
    return hits.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bloom_hits")
    )


def bloom_member_flags(
    df: DataFrame,
    col: str,
    registers: DataFrame,
    k: int = BLOOM_K,
    m_words: int = BLOOM_M_WORDS,
) -> DataFrame:
    """Per-ROW bloom membership flag: returns ``df`` plus a boolean
    ``bloom_maybe`` (all k bits set — possibly a member; false =
    DEFINITELY not, the no-false-negative contract). The prefilter
    behind ``line_dedup_increment_bloom``'s pruned anti-join.
    Requires ``col``'s values to be DISTINCT across rows (the per-value
    hit count otherwise inflates past k and flips a member to false —
    the bloom_probe_counts dedup lesson); callers pass frames keyed by
    ``col``. Scale: one explode of k positions per row + a broadcast of
    the ≤ m_words bitmap — no shuffle of ``df`` itself beyond the
    flag's group-back, keyed by the same digest column."""
    hits = (
        df.select(
            F.col(col),
            F.explode(
                bloom_positions(F.col(col).cast("string"), k, m_words)
            ).alias("p"),
        )
        .join(
            F.broadcast(bloom_merge(registers)),
            F.col("p.w") == F.col("word_idx"),
        )
        .where(F.expr("(bits >> p.b) & 1") == 1)
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("__n_set"))
        .where(F.col("__n_set") == k)
        .select(F.col(col), F.lit(True).alias("bloom_maybe"))
    )
    return df.join(hits, col, "left").withColumn(
        "bloom_maybe", F.coalesce(F.col("bloom_maybe"), F.lit(False))
    )


def bloom_sql(
    values_sql: str,
    k: int = BLOOM_K,
    m_words: int = BLOOM_M_WORDS,
) -> str:
    """DuckDB replay of ``bloom_registers`` over ``values_sql``
    yielding a single column ``v`` (already string)."""
    m_bits = m_words * 63
    pos_rows = " UNION ALL ".join(
        f"SELECT CAST('0x' || substr(md5(v || '#{i}'), 1, {_BLOOM_CHARS})"
        f" AS BIGINT) % {m_bits} AS pos FROM vals"
        for i in range(k)
    )
    return f"""
  SELECT CAST(pos // 63 AS INT) AS word_idx,
         CAST(bit_or(1::BIGINT << CAST(pos % 63 AS INT)) AS BIGINT)
           AS bits
  FROM (WITH vals AS ({values_sql}) {pos_rows})
  GROUP BY 1
"""


def bloom_probe_sql(
    cand_sql: str,
    registers_sql: str,
    group_cols: str,
    k: int = BLOOM_K,
    m_words: int = BLOOM_M_WORDS,
) -> str:
    """DuckDB replay of ``bloom_probe_counts`` — ``cand_sql`` yields
    (group_cols..., v). Mirrors the operator's internal per-group
    dedup (SELECT DISTINCT) so duplicate candidate values cannot
    inflate the per-value bit-hit count past k."""
    m_bits = m_words * 63
    pos_rows = " UNION ALL ".join(
        f"SELECT {group_cols}, v,"
        f" CAST('0x' || substr(md5(v || '#{i}'), 1, {_BLOOM_CHARS})"
        f" AS BIGINT) % {m_bits} AS pos FROM cands"
        for i in range(k)
    )
    cand_sql = f"SELECT DISTINCT {group_cols}, v FROM ({cand_sql})"
    return f"""
  SELECT {group_cols}, CAST(count(*) AS BIGINT) AS n_bloom_hits
  FROM (
    SELECT {group_cols}, v
    FROM (
      SELECT p.*, r.bits FROM (
        WITH cands AS ({cand_sql}) {pos_rows}
      ) p JOIN ({registers_sql}) r
        ON CAST(p.pos // 63 AS INT) = r.word_idx
      WHERE (r.bits >> CAST(p.pos % 63 AS INT)) & 1 = 1
    ) GROUP BY {group_cols}, v HAVING count(*) = {k}
  ) GROUP BY {group_cols}
"""


def bloom_stream_partials(
    sdf: DataFrame,
    col: str,
    k: int = BLOOM_K,
    m_words: int = BLOOM_M_WORDS,
) -> DataFrame:
    """APPEND-MODE streaming bloom partials — the
    ``hll_stream_partials`` pattern with OR instead of max: the
    (word, bit) projection stays in Catalyst, a stateless
    ``mapInArrow`` pass keeps ONE running word-mask per partition
    (≤ m_words rows out per partition per micro-batch), and read-time
    OR-merge reproduces the one-shot bitmap exactly (OR is
    associative/commutative/idempotent). Zero shuffles at ingest; the
    native txnlog sink carries the partials exactly-once — though OR,
    like max, would survive at-least-once too."""
    import pyarrow as pa

    rows = sdf.where(F.col(col).isNotNull()).select(
        F.explode(
            bloom_positions(F.col(col).cast("string"), k, m_words)
        ).alias("p")
    ).select(
        F.col("p.w").alias("word_idx"),
        F.expr("shiftleft(1L, p.b)").cast("bigint").alias("bits"),
    )

    def _partial(batches):
        acc: dict = {}
        for batch in batches:
            for w, b in zip(
                batch.column(0).to_pylist(), batch.column(1).to_pylist()
            ):
                acc[w] = acc.get(w, 0) | b
        if acc:
            yield pa.record_batch(
                [
                    pa.array(list(acc.keys()), pa.int32()),
                    pa.array(list(acc.values()), pa.int64()),
                ],
                names=["word_idx", "bits"],
            )

    return rows.mapInArrow(_partial, "word_idx int, bits bigint")
