"""Distributed BPE tokenizer TRAINING (Sennrich et al. 2016) — the
missing half of the engine's tokenizer story: rounds 9-13 APPLY a
byte-pair vocabulary (token_count_bpe*/tokenize_ids_real ride merge
tables), this module LEARNS one from the corpus.

Algorithm (the classic trainer, re-expressed Spark-first):

1. Compact the corpus to a WORD-FREQUENCY table — the standard
   trainer optimization (one ``groupBy(word)`` shuffle over the raw
   corpus; afterwards every iteration runs on ``|vocab|`` rows, not
   ``O(corpus)``). Each word becomes a space-joined symbol string of
   its characters plus the ``_`` end-of-word marker.
2. K iterations of: count adjacent symbol pairs weighted by word
   frequency (one explode + map-side-combined ``groupBy(a, b)`` whose
   exchange is bounded by the DISTINCT-pair table, never the corpus) →
   pick the most frequent pair (count desc, then lexicographic (a, b)
   — a total, engine-independent order) → rewrite every word's symbol
   string with the pair merged.
3. The merge application is the exact leftmost-scan semantics of the
   reference trainer (scan symbols left to right; at a match consume
   BOTH symbols and continue after them — so ``x x x`` merges once,
   ``a b a b`` twice), implemented as ONE Catalyst
   ``aggregate(split(sym), (out, pend), ...)`` fold — no UDF, no
   regexp backtracking, whole-stage-codegen-friendly.

Scale: the per-iteration argmax collects ONE row to the driver (the
chosen pair becomes a literal in the next plan — the K-merge model is
O(K) driver state, exactly like the IVF centroid list); the
word-frequency frame is ``localCheckpoint``-ed each round (graph.py
discipline — K rounds of lineage would otherwise replan the whole
chain every iteration). At 100 TB the word-freq table is millions of
rows and the pair table is |symbol-vocab|²-bounded — both orders of
magnitude under the corpus, and the only corpus-sized pass is the
initial word count.

Differential: the DuckDB oracle replays the ENTIRE training run as a
generated K-level CTE chain — pair counts via ``generate_series``
position pairs, the argmax as ``ORDER BY ... LIMIT 1``, and the
leftmost-scan merge as a ``list_reduce`` fold carrying an
``out§pend`` state string — so a wrong count, a wrong tie-break, or a
wrong application order in either engine breaks the hash. (Beyond
the reference's own surface — part of the training-data-pipeline
mandate; semantics per the public BPE literature.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: End-of-word marker appended to every word's symbol sequence. Kept
#: out of the trained alphabet by the ``^[a-z]+$`` word filter.
EOW = "_"

#: DuckDB state-string separator for the oracle's fold (chr(167), a
#: character the filtered corpus can never contain).
_SEP_SQL = "chr(167)"


def bpe_word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """``(word, cnt, sym)`` — the compacted trainer input. Words are
    single-space tokens matching ``^[a-z]+$`` (the corpus alphabet;
    the filter also guarantees ``EOW`` and the oracle's state
    separator stay out of band); ``sym`` is the space-joined character
    sequence plus the end-of-word marker (``the`` → ``t h e _``)."""
    return (
        df.select(
            F.explode(F.split(F.col(text_col), " ")).alias("word")
        )
        .where(F.col("word").rlike("^[a-z]+$"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "sym",
            F.concat(
                F.regexp_replace(F.col("word"), "(.)", "$1 "),
                F.lit(EOW),
            ),
        )
    )


def pair_counts(wf: DataFrame) -> DataFrame:
    """Adjacent-pair counts ``(a, b, pcnt)`` over the word-frequency
    frame, weighted by word count. One explode; the exchange carries
    the distinct-pair table (map-side combine), never the corpus."""
    toks = F.split(F.col("sym"), " ")
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.struct(
            F.element_at(toks, i).alias("a"),
            F.element_at(toks, i + 1).alias("b"),
        ),
    )
    return (
        # the >= 2 guard matters: sequence(1, 0) is DESCENDING in
        # Spark, so a fully-merged single-symbol word would emit a
        # phantom reversed pair
        wf.where(F.size(toks) >= 2)
        .select("cnt", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").alias("pcnt"))
    )


def apply_merge(sym: Column, a: str, b: str) -> Column:
    """Rewrite a space-joined symbol string with the pair ``(a, b)``
    merged under the reference trainer's LEFTMOST-SCAN semantics, as a
    single Catalyst ``aggregate`` fold. State = (out, pend): ``pend``
    holds the last unconsumed symbol; a match emits the merged symbol
    and clears it, so the scan resumes AFTER the consumed pair
    (``x x x`` → ``xx x``, ``a b a b`` → ``ab ab`` — the cases plain
    string replace gets wrong)."""
    merged = a + b
    zero = F.struct(
        F.lit("").alias("out"), F.lit("").alias("pend")
    )

    def step(acc: Column, x: Column) -> Column:
        return (
            F.when(
                (acc["pend"] == F.lit(a)) & (x == F.lit(b)),
                F.struct(
                    F.concat(acc["out"], F.lit(" " + merged)).alias(
                        "out"
                    ),
                    F.lit("").alias("pend"),
                ),
            )
            .when(
                acc["pend"] == F.lit(""),
                F.struct(acc["out"].alias("out"), x.alias("pend")),
            )
            .otherwise(
                F.struct(
                    F.concat(
                        acc["out"], F.lit(" "), acc["pend"]
                    ).alias("out"),
                    x.alias("pend"),
                )
            )
        )

    def fin(acc: Column) -> Column:
        return F.ltrim(
            F.when(acc["pend"] == F.lit(""), acc["out"]).otherwise(
                F.concat(acc["out"], F.lit(" "), acc["pend"])
            )
        )

    return F.aggregate(F.split(sym, " "), zero, step, fin)


def bpe_train(
    df: DataFrame, k: int = 12, text_col: str = "text"
) -> tuple:
    """Train ``k`` merges on the corpus. Returns ``(merges, wf)``:
    ``merges`` is the ordered list of ``(step, left_sym, right_sym,
    merged, pair_count)`` driver-side tuples (the model artifact —
    O(k) state, like the IVF centroid list); ``wf`` is the final
    word-frequency frame with ``sym`` rewritten through every merge
    (the trained segmentation of the corpus vocabulary). Fails loudly
    if the corpus exhausts distinct pairs before ``k`` merges — the
    unrolled oracle replays exactly ``k`` levels."""
    spark = df.sparkSession
    wf = bpe_word_freqs(df, text_col).localCheckpoint(eager=True)
    merges: list = []
    for step in range(1, k + 1):
        best = (
            pair_counts(wf)
            .orderBy(F.col("pcnt").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not best:
            raise ValueError(
                f"bpe_train: corpus exhausted distinct pairs at step "
                f"{step} (< k={k})"
            )
        a, b, c = best[0]["a"], best[0]["b"], int(best[0]["pcnt"])
        merges.append((step, a, b, a + b, c))
        # LAZY checkpoint (optimization r15, guide §1.2): the rewrite
        # still cuts lineage every round, but it materializes inside
        # the NEXT round's pair-count/argmax job instead of as its own
        # eager job — one Spark job per merge instead of two. The last
        # round's rewrite materializes in the caller's first action.
        wf = wf.withColumn(
            "sym", apply_merge(F.col("sym"), a, b)
        ).localCheckpoint(eager=False)
    _ = spark
    return merges, wf


def bpe_train_sql(k: int = 12, merges_select: bool = True) -> str:
    """The generated DuckDB replay of the whole training run: a
    ``k``-level CTE chain (``w0 → p1 → b1 → w1 → …``) ending in either
    the merge table (``merges_select=True``) or the final
    word-frequency relation ``w{k}`` left open for a caller-appended
    SELECT."""
    S = _SEP_SQL
    out = f"split_part(f, {S}, 1)"
    pend = f"split_part(f, {S}, 2)"
    acc_out = f"split_part(acc, {S}, 1)"
    acc_pend = f"split_part(acc, {S}, 2)"
    ctes = [
        f"""w0 AS MATERIALIZED (
  SELECT word, cnt,
         regexp_replace(word, '(.)', '\\1 ', 'g') || '{EOW}' AS sym
  FROM (
    SELECT word, count(*) AS cnt FROM (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ) WHERE regexp_matches(word, '^[a-z]+$')
    GROUP BY word
  )
)"""
    ]
    for i in range(1, k + 1):
        ctes.append(
            f"""p{i} AS MATERIALIZED (
  SELECT a, b, sum(cnt) AS pcnt FROM (
    SELECT cnt, l[i] AS a, l[i + 1] AS b
    FROM (SELECT cnt, string_split(sym, ' ') AS l FROM w{i - 1})
    CROSS JOIN generate_series(1, 64) g(i)
    WHERE len(l) >= 2 AND i <= len(l) - 1
  ) GROUP BY 1, 2
),
b{i} AS MATERIALIZED (
  SELECT a, b, pcnt FROM p{i} ORDER BY pcnt DESC, a, b LIMIT 1
),
w{i} AS MATERIALIZED (
  SELECT word, cnt,
         ltrim(CASE WHEN {pend} = '' THEN {out}
                    ELSE {out} || ' ' || {pend} END) AS sym
  FROM (
    SELECT w.word, w.cnt,
      list_reduce(list_prepend({S}, string_split(w.sym, ' ')),
        (acc, x) -> CASE
          WHEN {acc_pend} = b.a AND x = b.b
            THEN {acc_out} || ' ' || b.a || b.b || {S}
          WHEN {acc_pend} = ''
            THEN {acc_out} || {S} || x
          ELSE {acc_out} || ' ' || {acc_pend} || {S} || x
        END) AS f
    FROM w{i - 1} w CROSS JOIN b{i} b
  )
)"""
        )
    chain = "WITH " + ",\n".join(ctes)
    if not merges_select:
        return chain
    unions = "\nUNION ALL ".join(
        f"SELECT {i} AS step, a AS left_sym, b AS right_sym, "
        f"a || b AS merged, CAST(pcnt AS BIGINT) AS pair_count "
        f"FROM b{i}"
        for i in range(1, k + 1)
    )
    return f"{chain}\n{unions}"
