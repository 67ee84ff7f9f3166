"""Gopher repetition gates (Rae et al. 2021, Table A1) — the
remaining quality-filter family: documents dominated by repeated
lines or n-grams are boilerplate/spam even when they pass the
length/stopword/alpha gates ``quality_filter`` already applies.

Reference parity note: the reference pipeline has no text-quality
analog (churn rows); this completes the north-star text-analysis
family next to ``text.quality_filter``.

Per-document statistics (all exact integer counts, fractions rounded
at 1e-6 so the DuckDB replay compares identical doubles):

* ``dup_line_frac`` — duplicated lines / lines (lines = raw text
  split on newline, ASCII-space-trimmed, non-empty).
* ``dup_line_char_frac`` — characters in occurrences BEYOND a line's
  first / total line characters (the deterministic reading of the
  paper's "fraction of characters within duplicate lines").
* ``top{2,3,4}_frac`` — characters covered by the single most
  frequent n-gram (count × n-gram length incl. internal spaces) /
  normalized doc characters.
* ``dup_ngram_frac`` (n=5 default) — characters of token POSITIONS
  covered by any n-gram occurring ≥ 2 times / total token characters
  (position-coverage union, so overlapping duplicated grams never
  double count — the paper's "characters contained in duplicate
  n-grams").

Scale shape: the line statistics are pure array expressions (zero
shuffle); each top-n statistic is one explode → (doc, gram) count →
per-doc max (shuffle keyed by doc+gram, bounded by corpus tokens);
the coverage statistic adds a positions join keyed the same way.
Everything stays in whole-stage codegen — no UDFs.

``gopher_repetition_filter`` applies the paper's thresholds
(0.30 / 0.20 / 0.20 / 0.18 / 0.16 / 0.15) on the ROUNDED fractions,
reporting the first failed rule like ``quality_filter``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .selection import _ngrams_n
from .text import normalize_text, tokens

TOP_NS = (2, 3, 4)
DUP_N = 5

#: Gopher Table A1 thresholds.
MAX_DUP_LINE_FRAC = 0.30
MAX_DUP_LINE_CHAR_FRAC = 0.20
MAX_TOP_FRAC = {2: 0.20, 3: 0.18, 4: 0.16}
MAX_DUP_NGRAM_FRAC = 0.15


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ns: tuple = TOP_NS,
    dup_n: int = DUP_N,
) -> DataFrame:
    """Per-doc repetition statistics (see module docstring)."""
    t = F.col(text_col)
    norm = normalize_text(t)
    toks = tokens(t)
    lines = F.filter(
        F.transform(F.split(t, "\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    dlines = F.array_distinct(lines)
    tot_lc = F.aggregate(lines, F.lit(0), lambda a, x: a + F.length(x))
    dist_lc = F.aggregate(dlines, F.lit(0), lambda a, x: a + F.length(x))
    base = df.where(t.isNotNull()).select(
        F.col(id_col),
        F.length(norm).alias("__doc_chars"),
        (F.length(norm) - (F.size(toks) - 1)).alias("__tok_chars"),
        F.size(lines).alias("__n_lines"),
        (F.size(lines) - F.size(dlines)).alias("__n_dup_lines"),
        tot_lc.alias("__line_chars"),
        (tot_lc - dist_lc).alias("__dup_line_chars"),
        toks.alias("__toks"),
    )

    # Narrow scalar left side (optimization r15, guide §2.3): the
    # joined statistics used to hang off ``base`` itself, so the full
    # per-doc TOKEN ARRAY was shuffled through every doc-keyed join
    # below; the scalars are a handful of ints.
    scal = base.drop("__toks")

    # ONE tagged explode for every top-n order (r15): previously one
    # explode + two aggregations + one join PER order. Same (doc, n,
    # gram) count multiset, so the per-order maxima are identical; the
    # per-order columns come out of a single conditional aggregation.
    def _tag(n: int):
        return F.transform(
            _ngrams_n(F.col("__toks"), n),
            lambda g: F.struct(F.lit(n).alias("n"), g.alias("g")),
        )

    tagged = base.select(
        F.col(id_col),
        F.explode(
            F.flatten(F.array(*[_tag(n) for n in top_ns]))
        ).alias("__ng"),
    ).select(F.col(id_col), F.col("__ng.n").alias("n"), F.col("__ng.g").alias("g"))
    top = (
        tagged.groupBy(id_col, "n", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(
            *[
                F.max(
                    F.when(F.col("n") == n, F.col("c") * F.length("g"))
                ).alias(f"__top{n}_chars")
                for n in top_ns
            ]
        )
    )
    out = scal.join(top, id_col, "left")

    pos = base.select(
        F.col(id_col),
        F.posexplode(_ngrams_n(F.col("__toks"), dup_n)).alias("p", "g"),
    )
    dup = (
        pos.groupBy(id_col, "g")
        .agg(F.collect_list("p").alias("ps"))
        .where(F.size("ps") >= 2)
    )
    covered = (
        dup.select(F.col(id_col), F.explode("ps").alias("p"))
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(F.col("p"), F.col("p") + F.lit(dup_n - 1))
            ).alias("cp"),
        )
        .distinct()
    )
    # Covered-position char sum via the per-doc token-LENGTH array
    # (r15): the old shape shuffled EVERY corpus token position with
    # its word through a (doc, pos)-keyed join; only the covered
    # positions (duplicated-gram spans, typically a small fraction)
    # plus one int array per doc move now. element_at is 1-based,
    # posexplode 0-based — same indexing as the replaced join.
    lens = base.select(
        F.col(id_col),
        F.transform("__toks", lambda w: F.length(w)).alias("__lens"),
    )
    cov = (
        covered.groupBy(id_col)
        .agg(F.collect_list("cp").alias("__cps"))
        .join(lens, id_col)
        .select(
            F.col(id_col),
            F.aggregate(
                F.transform(
                    "__cps",
                    lambda cp: F.element_at(
                        F.col("__lens"), (cp + 1).cast("int")
                    ),
                ),
                F.lit(0).cast("bigint"),
                lambda a, x: a + x,
            ).alias("__dup_ngram_chars"),
        )
    )
    out = out.join(cov, id_col, "left")

    def frac(num, den):
        return F.when(
            den > 0,
            F.round(num.cast("double") / den.cast("double"), 6),
        ).otherwise(F.lit(0.0))

    sel = [
        F.col(id_col),
        frac(F.col("__n_dup_lines"), F.col("__n_lines")).alias(
            "dup_line_frac"
        ),
        frac(F.col("__dup_line_chars"), F.col("__line_chars")).alias(
            "dup_line_char_frac"
        ),
    ]
    for n in top_ns:
        sel.append(
            frac(
                F.coalesce(F.col(f"__top{n}_chars"), F.lit(0)),
                F.col("__doc_chars"),
            ).alias(f"top{n}_frac")
        )
    sel.append(
        frac(
            F.coalesce(F.col("__dup_ngram_chars"), F.lit(0)),
            F.col("__tok_chars"),
        ).alias("dup_ngram_frac")
    )
    return out.select(*sel)


def gopher_repetition_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Admission by the Gopher repetition thresholds over the rounded
    statistics — (id, stats..., reject_reason, keep); reason names the
    FIRST failed rule, '' when kept (the ``quality_filter`` shape)."""
    s = repetition_stats(df, text_col, id_col)
    reason = (
        F.when(
            F.col("dup_line_frac") > MAX_DUP_LINE_FRAC,
            F.lit("dup_lines"),
        )
        .when(
            F.col("dup_line_char_frac") > MAX_DUP_LINE_CHAR_FRAC,
            F.lit("dup_line_chars"),
        )
        .when(F.col("top2_frac") > MAX_TOP_FRAC[2], F.lit("top2_ngram"))
        .when(F.col("top3_frac") > MAX_TOP_FRAC[3], F.lit("top3_ngram"))
        .when(F.col("top4_frac") > MAX_TOP_FRAC[4], F.lit("top4_ngram"))
        .when(
            F.col("dup_ngram_frac") > MAX_DUP_NGRAM_FRAC,
            F.lit("dup_ngram_chars"),
        )
        .otherwise(F.lit(""))
    )
    return s.withColumn("reject_reason", reason).withColumn(
        "keep", F.col("reject_reason") == ""
    )


def char_entropy(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_bits: float = 2.0,
) -> DataFrame:
    """Per-document character-level Shannon entropy (bits) over the
    normalized text — the gibberish/degenerate-content gate next to
    the repetition fractions: a run of one repeated character scores
    ~0 bits, random base64 blobs score near log2(64), natural language
    sits ~4 bits. H = −Σ_c p_c·log2(p_c) with p_c = n_c/N from exact
    character counts.

    Cross-engine float discipline: each character's −p·log2(p) term is
    rounded at 1e-6 and carried as an exact INTEGER (term·10⁶), so the
    per-doc sum is order-free (the lm_scores recipe); the final H is
    the integer sum scaled back. Output: (id, n_chars, n_distinct_chars,
    char_entropy, keep) with keep = H ≥ ``min_bits`` on the rounded
    value.

    Scale shape (r14 reshape): the original per-char explode →
    (doc, char) groupBy measured 20.7 s warm-isolated at sf0.1 —
    a 14× constant-factor penalty over the corpus's other doc-grain
    gates — so character counting now runs as ONE Arrow pass
    (the ``html_extract`` shape): ``mapInArrow`` emits per-doc exact
    integer count ARRAYS (`Counter` — no floats in Python), and the
    −p·log2(p) terms, the integer sum, and the gate stay in Catalyst
    as array lambdas, expression-identical to the pre-reshape plan and
    to the DuckDB replay (which is unchanged). Map-only: zero
    exchanges, O(corpus chars) once, alphabet-bounded arrays out.
    The guards mirror the replay exactly (length(norm) > 0; Counter
    never emits an empty char), not Spark split('') edge semantics."""
    import pyarrow as pa

    id_type = df.schema[id_col].dataType.simpleString()
    norm = normalize_text(F.col(text_col))
    base = (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("__id"), norm.alias("__norm"))
        .where(F.length("__norm") > 0)
    )

    def _count(batches):
        from collections import Counter

        for batch in batches:
            texts = batch.column(1).to_pylist()
            counts = [sorted(Counter(t).values()) for t in texts]
            yield pa.record_batch(
                [
                    batch.column(0),
                    pa.array([sum(c) for c in counts], pa.int64()),
                    pa.array(counts, pa.list_(pa.int64())),
                ],
                names=["__id", "__n", "__counts"],
            )

    counted = base.mapInArrow(
        _count, f"__id {id_type}, __n bigint, __counts array<bigint>"
    )

    def _term(c):
        p = c.cast("double") / F.col("__n").cast("double")
        return F.round(-p * F.log2(p) * F.lit(1_000_000.0)).cast(
            "bigint"
        )

    ent = F.round(
        F.aggregate(
            F.transform(F.col("__counts"), _term),
            F.lit(0).cast("bigint"),
            lambda a, x: a + x,
        )
        / F.lit(1_000_000.0),
        6,
    )
    return counted.select(
        F.col("__id").alias(id_col),
        F.col("__n").cast("bigint").alias("n_chars"),
        F.size("__counts").cast("bigint").alias("n_distinct_chars"),
        ent.alias("char_entropy"),
        (ent >= F.lit(min_bits)).alias("keep"),
    )


def char_entropy_sql(source_sql: str, min_bits: float = 2.0) -> str:
    """DuckDB replay of ``char_entropy`` over ``source_sql`` yielding
    (doc_id, text) — same normalize, same integer-term rounding."""
    norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    return f"""
WITH base AS (
  SELECT doc_id, length(norm) AS n,
         unnest(string_split_regex(norm, '')) AS ch
  FROM (SELECT doc_id, {norm} AS norm FROM ({source_sql})
        WHERE text IS NOT NULL)
  WHERE length(norm) > 0
),
per_char AS (
  SELECT doc_id, n, ch, count(*) AS c FROM base
  WHERE ch <> '' GROUP BY 1, 2, 3
),
terms AS (
  SELECT doc_id, n,
         CAST(round(-(CAST(c AS DOUBLE) / n)
                    * log2(CAST(c AS DOUBLE) / n)
                    * 1000000.0) AS BIGINT) AS t
  FROM per_char
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_chars,
       CAST(count(*) AS BIGINT) AS n_distinct_chars,
       round(CAST(sum(t) AS DOUBLE) / 1000000.0, 6) AS char_entropy,
       round(CAST(sum(t) AS DOUBLE) / 1000000.0, 6) >= {min_bits}
         AS keep
FROM terms GROUP BY 1, 2
"""


def _ngrams_sql(n: int) -> str:
    """DuckDB n-gram list over the token list ``tk`` — the shared
    ``selection.duckdb_ngrams_sql`` fragment (one SQL twin of
    ``_ngrams_n`` across the LM and repetition oracles)."""
    from .selection import duckdb_ngrams_sql

    return duckdb_ngrams_sql(n, "tk")


def repetition_sql(
    source_sql: str,
    top_ns: tuple = TOP_NS,
    dup_n: int = DUP_N,
    with_filter: bool = True,
) -> str:
    """DuckDB replay of ``repetition_stats`` (+ the filter columns)
    over ``source_sql`` yielding (doc_id, text). Token positions are
    1-based here and 0-based in Spark — each engine is internally
    consistent, so the coverage join is identical."""
    # same normalize/tokenize fragments as the established text oracles
    NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    TOKENS_SQL = f"string_split({NORM_SQL}, ' ')"

    top_ctes, top_sel = [], []
    for n in top_ns:
        top_ctes.append(
            f"""top{n} AS (
  SELECT doc_id, max(c * length(g)) AS top{n}_chars FROM (
    SELECT doc_id, g, count(*) AS c FROM (
      SELECT doc_id, unnest({_ngrams_sql(n)}) AS g FROM base
    ) GROUP BY 1, 2
  ) GROUP BY 1
)"""
        )
        top_sel.append(
            f"CASE WHEN doc_chars > 0"
            f" THEN round(coalesce(top{n}_chars, 0)"
            f" / CAST(doc_chars AS DOUBLE), 6)"
            f" ELSE 0.0 END AS top{n}_frac"
        )
    stats = f"""
WITH src AS ({source_sql}),
base AS (
  SELECT doc_id, text, {NORM_SQL} AS norm, {TOKENS_SQL} AS tk,
         list_filter(list_transform(string_split(text, chr(10)),
                                    x -> trim(x, ' ')),
                     x -> x <> '') AS lines
  FROM src WHERE text IS NOT NULL
),
scal AS (
  SELECT doc_id,
         length(norm) AS doc_chars,
         length(norm) - (len(tk) - 1) AS tok_chars,
         len(lines) AS n_lines,
         len(lines) - len(list_distinct(lines)) AS n_dup_lines,
         coalesce(list_sum(list_transform(lines, x -> length(x))), 0)
           AS line_chars,
         coalesce(list_sum(list_transform(lines, x -> length(x))), 0)
           - coalesce(list_sum(list_transform(list_distinct(lines),
                                              x -> length(x))), 0)
           AS dup_line_chars
  FROM base
),
{", ".join(top_ctes)},
pos AS (
  SELECT doc_id, generate_subscripts(gs, 1) AS p, unnest(gs) AS g
  FROM (SELECT doc_id, {_ngrams_sql(dup_n)} AS gs FROM base)
),
dup AS (
  SELECT doc_id, g, list(p) AS ps FROM pos
  GROUP BY 1, 2 HAVING count(*) >= 2
),
covered AS (
  SELECT DISTINCT doc_id, p + u AS cp
  FROM (SELECT doc_id, unnest(ps) AS p FROM dup)
  CROSS JOIN (SELECT unnest(generate_series(0, {dup_n - 1})) AS u)
),
tok_pos AS (
  SELECT doc_id, generate_subscripts(tk, 1) AS cp, unnest(tk) AS w
  FROM base
),
cov AS (
  SELECT c.doc_id, sum(length(t.w)) AS dup_ngram_chars
  FROM covered c JOIN tok_pos t USING (doc_id, cp)
  GROUP BY 1
),
stats AS (
  SELECT s.doc_id,
         CASE WHEN n_lines > 0
              THEN round(CAST(n_dup_lines AS DOUBLE) / n_lines, 6)
              ELSE 0.0 END AS dup_line_frac,
         CASE WHEN line_chars > 0
              THEN round(CAST(dup_line_chars AS DOUBLE) / line_chars, 6)
              ELSE 0.0 END AS dup_line_char_frac,
         {", ".join(top_sel)},
         CASE WHEN tok_chars > 0
              THEN round(coalesce(cv.dup_ngram_chars, 0)
                         / CAST(tok_chars AS DOUBLE), 6)
              ELSE 0.0 END AS dup_ngram_frac
  FROM scal s
  {" ".join(f"LEFT JOIN top{n} USING (doc_id)" for n in top_ns)}
  LEFT JOIN cov cv USING (doc_id)
)"""
    if not with_filter:
        return stats + "\nSELECT * FROM stats"
    reason = f"""CASE
    WHEN dup_line_frac > {MAX_DUP_LINE_FRAC} THEN 'dup_lines'
    WHEN dup_line_char_frac > {MAX_DUP_LINE_CHAR_FRAC}
      THEN 'dup_line_chars'
    WHEN top2_frac > {MAX_TOP_FRAC[2]} THEN 'top2_ngram'
    WHEN top3_frac > {MAX_TOP_FRAC[3]} THEN 'top3_ngram'
    WHEN top4_frac > {MAX_TOP_FRAC[4]} THEN 'top4_ngram'
    WHEN dup_ngram_frac > {MAX_DUP_NGRAM_FRAC} THEN 'dup_ngram_chars'
    ELSE '' END"""
    return (
        stats
        + f"""
SELECT *, {reason} AS reject_reason, ({reason}) = '' AS keep
FROM stats"""
    )
