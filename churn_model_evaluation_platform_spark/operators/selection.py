"""Training-data SELECTION operators — the quality/relevance filters a
large-scale LLM data pipeline runs between dedup and tokenization
(north-star extensions; SURVEY §7.2 item 7 family):

- ``bigram_lm_scores``: perplexity filtering with an n-gram language
  model (the CCNet recipe — Wenzek et al. 2019, "CCNet: Extracting
  High Quality Monolingual Datasets from Web Crawl Data" — which
  scores web text with a KenLM model and keeps the low-perplexity
  head). Here the LM is a bigram model with stupid backoff (Brants et
  al. 2007, "Large Language Models in Machine Translation" — the
  backoff actually used at web scale because it needs no discounting
  pass), trained on one half of the corpus and scoring the other.
- ``dsir_importance_weights`` / ``dsir_select``: Data Selection with
  Importance Resampling (Xie et al. 2023, NeurIPS) — hashed n-gram
  bag-of-words importance weights log p_target(f) − log p_raw(f),
  the published method for selecting raw web data that matches a
  target distribution (e.g. Wikipedia-like English).

Everything is pure Catalyst: explode → groupBy count tables → joins.
No UDFs, no driver-side state. The count tables are the only shuffles
and they are dimension-sized (vocabulary / bucket counts), so at
100 TB the per-doc scoring side stays embarrassingly parallel and the
model side broadcasts (unigram/bucket tables) or shuffle-joins on the
token key (bigram table, uniformly distributed by construction of the
key). Reference parity: the reference has no data-selection stage
(its corpus is 1,050 churn rows); these extend the text family
(text.py:560 lm_score is the unigram ancestor of the bigram LM here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_hash_int
from .text import tokens

#: Stupid-backoff weight (Brants et al. 2007 use 0.4 throughout).
STUPID_BACKOFF_ALPHA = 0.4


def _bigrams(toks_col):
    """Adjacent-pair bigram strings of a token array — the n=2
    instantiation of ``_ngrams_n`` (defined below; resolved at call
    time)."""
    return _ngrams_n(toks_col, 2)


def bigram_lm_scores(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = STUPID_BACKOFF_ALPHA,
) -> DataFrame:
    """Score ``eval_df`` documents under a stupid-backoff bigram LM
    trained on ``train`` — the CCNet-style perplexity quality filter.

    Per bigram position (w1, w2) of an eval document::

        score = ln( c(w1 w2) / c(w1 ·) )              if the bigram was seen
              = ln( α · (c(w2)+1) / (T+V) )           otherwise (backoff to
                                                       add-one unigram)

    where c(w1 ·) counts w1 as a bigram CONTEXT in training (so the
    seen branch is a proper conditional probability), T is the train
    token total and V the train vocabulary size. The per-position log
    is rounded to 6 before summing and the document mean re-rounded
    (the tfidf/lm_score cross-engine parity recipe — libm-vs-JVM ln
    noise stays below the rounding grain), and ``ppl = exp(−mean)``
    is rounded to 4.

    Output: (id, n_bigrams, n_backoff, lm_logprob, ppl); eval docs
    with fewer than 2 tokens are excluded (no bigram positions — the
    score is undefined, and reporting NULL would poison downstream
    percentile gates).

    Scale shape: the train pass is one explode + two groupBys (bigram
    counts, context counts) plus the unigram table lm_score already
    builds; (T, V) is a single broadcast row. The eval pass explodes
    bigrams once and joins the three count tables — the bigram join
    key is near-uniform (natural-language bigram frequency is Zipf but
    the JOIN fan-out per key is 1 on the count side, so AQE handles the
    hot keys), and the unigram/context tables broadcast at any corpus
    size with a bounded vocabulary.
    """
    out = ngram_lm_scores(
        train, eval_df, order=2, text_col=text_col, id_col=id_col,
        alpha=alpha,
    )
    return out.select(
        F.col(id_col),
        F.col("n_ngrams").alias("n_bigrams"),
        F.col("n_order1").alias("n_backoff"),
        "lm_logprob",
        "ppl",
    )


def bigram_lm_sql(
    train_pred: str = "doc_id % 2 = 0",
    eval_pred: str = "doc_id % 2 = 1",
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = STUPID_BACKOFF_ALPHA,
) -> str:
    """DuckDB replay of ``bigram_lm_scores`` over a train/eval split of
    one table — same tokenization, same count tables, same rounding."""
    tok = (
        f"string_split(trim(regexp_replace(lower({text_col}),"
        " '\\s+', ' ', 'g')), ' ')"
    )
    return f"""
WITH tok AS (
  SELECT {id_col}, {tok} AS toks
  FROM {table} WHERE {text_col} IS NOT NULL
),
tr_uni AS (
  SELECT w, count(*) AS c_uni FROM (
    SELECT unnest(toks) AS w FROM tok WHERE {train_pred}
  ) GROUP BY 1
),
tr_tot AS (SELECT sum(c_uni) AS t_total, count(*) AS v_size FROM tr_uni),
tr_big AS (
  SELECT bg, count(*) AS c_big FROM (
    SELECT unnest(list_transform(generate_series(2, len(toks)),
                                 i -> toks[i-1] || ' ' || toks[i])) AS bg
    FROM tok WHERE {train_pred}
  ) GROUP BY 1
),
tr_ctx AS (
  SELECT str_split(bg, ' ')[1] AS w1, sum(c_big) AS c_ctx
  FROM tr_big GROUP BY 1
),
ev AS (
  SELECT {id_col},
         unnest(list_transform(generate_series(2, len(toks)),
                               i -> toks[i-1] || ' ' || toks[i])) AS bg
  FROM tok WHERE {eval_pred}
),
scored AS (
  SELECT ev.{id_col},
         CAST(round((CASE WHEN b.c_big IS NOT NULL
                    THEN ln(b.c_big / c.c_ctx)
                    ELSE ln({alpha} * (coalesce(u.c_uni, 0) + 1.0)
                            / (t.t_total + t.v_size)) END)
                    * 1000000.0) AS BIGINT) AS logp_int,
         CASE WHEN b.c_big IS NULL THEN 1 ELSE 0 END AS backoff
  FROM ev
  LEFT JOIN tr_big b USING (bg)
  LEFT JOIN tr_ctx c ON str_split(ev.bg, ' ')[1] = c.w1
  LEFT JOIN tr_uni u ON str_split(ev.bg, ' ')[2] = u.w
  CROSS JOIN tr_tot t
)
SELECT {id_col},
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(backoff) AS BIGINT) AS n_backoff,
       round(CAST(sum(logp_int) AS DOUBLE) / (count(*) * 1000000.0), 6)
         AS lm_logprob,
       round(exp(-round(CAST(sum(logp_int) AS DOUBLE)
                        / (count(*) * 1000000.0), 6)), 4) AS ppl
FROM scored GROUP BY {id_col}
"""


def hashed_ngram_buckets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int,
    hash_chars: int,
    extra: dict | None = None,
) -> DataFrame:
    """The DSIR hashed unigram+bigram feature space, factored out
    (r14) so the learned quality classifier shares it: one explode over
    tokens ∪ bigrams, engine-portable md5 bucketing. ``extra`` maps
    output names to Columns carried alongside (e.g. the DSIR target
    flag). Returns (id, *extra, b) — one row per feature OCCURRENCE."""
    extra = extra or {}
    names = list(extra)
    return (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            *[c.alias(n) for n, c in extra.items()],
            tokens(F.col(text_col)).alias("__toks"),
        )
        .select(
            F.col(id_col),
            *names,
            F.explode(
                F.concat(F.col("__toks"), _bigrams(F.col("__toks")))
            ).alias("f"),
        )
        .select(
            F.col(id_col),
            *names,
            (md5_hash_int(F.col("f"), hash_chars) % n_buckets).alias("b"),
        )
    )


def dsir_importance_weights(
    df: DataFrame,
    target_pred,
    n_buckets: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_chars: int = 6,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023): hashed unigram+bigram
    bag-of-ngrams features, weight_d = Σ_b tf_{d,b} · (ln p_target(b) −
    ln p_raw(b)) with add-one smoothing over ``n_buckets`` buckets.

    ``target_pred`` is a boolean Column selecting the TARGET examples
    (the distribution to match — e.g. a trusted high-quality slice);
    the RAW distribution is the whole frame. Both count tables come
    from ONE explode pass (the target side is a filtered aggregate of
    the same rows, not a second scan). The per-bucket log-ratio is
    rounded to 6 before the weighted sum and the document weight
    re-rounded (cross-engine parity recipe).

    Features hash with the engine-portable md5 integer hash
    (functions/hashing.py — Spark xxhash64 and DuckDB hash() differ,
    md5 is bit-identical everywhere), so the DuckDB oracle replays the
    exact bucketing. Scale shape: the bucket table is ``n_buckets``
    rows → broadcast; the doc-side explode+groupBy is the only wide
    op and its key (id, bucket) is near-uniform. Output: (id,
    n_features, dsir_weight).
    """
    feats = hashed_ngram_buckets(
        df,
        text_col,
        id_col,
        n_buckets,
        hash_chars,
        extra={"__is_target": target_pred},
    )
    doc_tf = feats.groupBy(id_col, "b").agg(
        F.count(F.lit(1)).alias("tf")
    )
    buckets = feats.groupBy("b").agg(
        F.count(F.lit(1)).alias("c_raw"),
        F.sum(F.col("__is_target").cast("long")).alias("c_tgt"),
    )
    totals = buckets.agg(
        F.sum("c_raw").alias("t_raw"), F.sum("c_tgt").alias("t_tgt")
    )
    # Per-bucket log-ratio carried as an exact INTEGER (ratio·10⁶) so
    # the per-doc weighted sum is order-free across engines (the
    # bigram_lm_scores recipe).
    ratio_int = F.round(
        (
            F.log(
                (F.col("c_tgt") + F.lit(1.0))
                / (F.col("t_tgt") + F.lit(float(n_buckets)))
            )
            - F.log(
                (F.col("c_raw") + F.lit(1.0))
                / (F.col("t_raw") + F.lit(float(n_buckets)))
            )
        )
        * F.lit(1_000_000.0)
    ).cast("bigint")
    return (
        doc_tf.join(F.broadcast(buckets), "b")
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("bigint").alias("n_features"),
            F.round(
                F.sum(F.col("tf") * ratio_int) / F.lit(1_000_000.0), 6
            ).alias("dsir_weight"),
        )
    )


def dsir_sql(
    target_pred_sql: str,
    n_buckets: int = 2048,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_chars: int = 6,
) -> str:
    """DuckDB replay of ``dsir_importance_weights`` — identical
    tokenization, bucketing, smoothing, and rounding."""
    tok = (
        f"string_split(trim(regexp_replace(lower({text_col}),"
        " '\\s+', ' ', 'g')), ' ')"
    )
    return f"""
WITH tok AS (
  SELECT {id_col}, CASE WHEN {target_pred_sql} THEN 1 ELSE 0 END AS is_t,
         {tok} AS toks
  FROM {table} WHERE {text_col} IS NOT NULL
),
feats AS (
  SELECT {id_col}, is_t,
         (CAST('0x' || substr(md5(f), 1, {hash_chars}) AS BIGINT)
          % {n_buckets}) AS b
  FROM (
    SELECT {id_col}, is_t,
           unnest(list_concat(toks,
                  list_transform(generate_series(2, len(toks)),
                                 i -> toks[i-1] || ' ' || toks[i]))) AS f
    FROM tok
  )
),
doc_tf AS (
  SELECT {id_col}, b, count(*) AS tf
  FROM feats GROUP BY 1, 2
),
buckets AS (
  SELECT b, count(*) AS c_raw, sum(is_t) AS c_tgt FROM feats GROUP BY 1
),
totals AS (SELECT sum(c_raw) AS t_raw, sum(c_tgt) AS t_tgt FROM buckets)
SELECT {id_col},
       CAST(sum(tf) AS BIGINT) AS n_features,
       round(CAST(sum(tf * CAST(round((
         ln((c_tgt + 1.0) / (t_tgt + {float(n_buckets)}))
         - ln((c_raw + 1.0) / (t_raw + {float(n_buckets)})))
         * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0, 6)
         AS dsir_weight
FROM doc_tf JOIN buckets USING (b) CROSS JOIN totals
GROUP BY {id_col}
"""


#: Pinned-classifier constants: dyadic weights over 2048 buckets with
#: denominator 4096, bias numerator 137 (an arbitrary released-model
#: stand-in — see quality_classifier_scores).
QC_BUCKETS = 2048
QC_DENOM = 4096
QC_BIAS_NUM = 137
QC_MIX = 2654435761


def quality_classifier_scores(
    df: DataFrame,
    n_buckets: int = QC_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_chars: int = 6,
    bias_num: int = QC_BIAS_NUM,
) -> DataFrame:
    """LEARNED quality filter slot (the GPT-3 Appendix A / WebText
    recipe: a linear classifier over document features scores
    keep/drop next to the rule gates) — a logistic model over the
    hashed unigram+bigram bag, ``dsir_importance_weights``' exact
    feature space via the shared ``hashed_ngram_buckets``.

    The weight vector is PINNED and dyadic: w_b = n_b / 4096 with
    n_b = ((b+1)·2654435761 mod 4096) − 2048 — the released-checkpoint
    stand-in (the integer-dot-product discipline proven by
    ``permutation_importance``/``shap_linear``: swap in a trained
    vector and every downstream bit stays exact). Because the weights
    are a FORMULA of the bucket index, scoring needs NO weight table
    at all — no broadcast, no join: one explode, bucket arithmetic,
    one per-doc sum. The margin is carried as its exact integer
    NUMERATOR (Σ tf·n_b + bias), so the keep/drop gate is an integer
    comparison — no float in the decision; margin (an exact dyadic
    double) and the 1e-6-rounded sigmoid are emitted for reporting.

    Output: (id, n_features, margin, prob_keep, keep).
    Scale: explode O(corpus tokens) → (id) partial-agg sum; map-side
    combine does the heavy lifting, the exchange carries one row per
    doc."""
    feats = hashed_ngram_buckets(
        df, text_col, id_col, n_buckets, hash_chars
    )
    wnum = (
        (F.col("b") + 1) * F.lit(QC_MIX) % F.lit(QC_DENOM)
        - F.lit(QC_DENOM // 2)
    )
    per = feats.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_features"),
        (F.sum(wnum) + F.lit(bias_num)).alias("__mn"),
    )
    margin = F.col("__mn").cast("double") / F.lit(float(QC_DENOM))
    return per.select(
        F.col(id_col),
        "n_features",
        margin.alias("margin"),
        F.round(
            F.lit(1.0) / (F.lit(1.0) + F.exp(-margin)), 6
        ).alias("prob_keep"),
        (F.col("__mn") >= 0).alias("keep"),
    )


def quality_classifier_margin_num(
    text_col: str = "text",
    n_buckets: int = QC_BUCKETS,
    hash_chars: int = 6,
    bias_num: int = QC_BIAS_NUM,
):
    """The classifier's integer margin NUMERATOR as ONE stateless
    Column (the ``quality_keep_col`` pattern): tokens ∪ bigrams as an
    array expression, per-feature pinned weight via array lambdas, and
    the order-free integer sum via ``aggregate`` — no explode, no
    groupBy, so the learned gate runs in APPEND-MODE STREAMING
    unchanged. Bit-equal to ``quality_classifier_scores``' ``margin``
    numerator (integer sums commute; pinned in tests). keep =
    ``quality_classifier_margin_num() >= 0``."""
    from ..functions.hashing import md5_hash_int

    toks = tokens(F.col(text_col))
    feats = F.concat(toks, _bigrams(toks))

    def wnum(f):
        b = md5_hash_int(f, hash_chars) % n_buckets
        return (b + 1) * F.lit(QC_MIX) % F.lit(QC_DENOM) - F.lit(
            QC_DENOM // 2
        )

    return (
        F.aggregate(
            F.transform(feats, wnum),
            F.lit(0).cast("bigint"),
            lambda a, x: a + x,
        )
        + F.lit(bias_num)
    )


def quality_classifier_sql(
    n_buckets: int = QC_BUCKETS,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_chars: int = 6,
    bias_num: int = QC_BIAS_NUM,
    with_margin_num: bool = False,
) -> str:
    """DuckDB replay of ``quality_classifier_scores`` — identical
    tokenization, bucketing, pinned-weight formula, and integer
    margin. ``with_margin_num`` adds the exact integer numerator as
    ``margin_num`` (consumed by composing oracles, e.g.
    dedup_keep_best; off by default to keep the original query's
    hashed schema unchanged)."""
    tok = (
        f"string_split(trim(regexp_replace(lower({text_col}),"
        " '\\s+', ' ', 'g')), ' ')"
    )
    return f"""
WITH tok AS (
  SELECT {id_col}, {tok} AS toks
  FROM {table} WHERE {text_col} IS NOT NULL
),
feats AS (
  SELECT {id_col},
         (CAST('0x' || substr(md5(f), 1, {hash_chars}) AS BIGINT)
          % {n_buckets}) AS b
  FROM (
    SELECT {id_col},
           unnest(list_concat(toks,
                  list_transform(generate_series(2, len(toks)),
                                 i -> toks[i-1] || ' ' || toks[i]))) AS f
    FROM tok
  )
),
per AS (
  SELECT {id_col}, count(*) AS n_features,
         {bias_num} + sum(((b + 1) * {QC_MIX}) % {QC_DENOM}
                          - {QC_DENOM // 2}) AS mn
  FROM feats GROUP BY 1
)
SELECT {id_col},
       CAST(n_features AS BIGINT) AS n_features,{
        f'''
       CAST(mn AS BIGINT) AS margin_num,''' if with_margin_num else ''}
       CAST(mn AS DOUBLE) / {float(QC_DENOM)} AS margin,
       round(1.0 / (1.0 + exp(-(CAST(mn AS DOUBLE) / {float(QC_DENOM)}))),
             6) AS prob_keep,
       mn >= 0 AS keep
FROM per
"""


def dsir_select(
    weights: DataFrame, n: int, id_col: str = "doc_id"
) -> DataFrame:
    """Top-``n`` selection by DSIR weight (deterministic tie-break on
    id) — the 'resampling' step run as a rank cut, which is the
    argmax-n variant the paper evaluates alongside Gumbel sampling.
    TakeOrderedAndProject: per-partition heaps, no global sort."""
    return (
        weights.orderBy(F.col("dsir_weight").desc(), F.col(id_col))
        .limit(n)
    )


#: Denominator for the md5-derived uniform: hashes are < 16^7, so
#: (h+1)/(16^7+1) lies strictly inside (0, 1) — both ln() calls in the
#: Gumbel transform stay finite.
_GUMBEL_DENOM = float(16**7 + 1)


def gumbel_key_expr(id_col, weight_col, seed: int = 42):
    """Deterministic Gumbel perturbation key for importance
    RESAMPLING (the Gumbel top-k trick: top-n by log-weight + Gumbel
    noise is an exact sample-without-replacement ∝ exp(log-weight) —
    Vieira 2014; DSIR's sampling step, Xie et al. 2023 §2). The noise
    is derived from the engine-portable md5 hash of (id, seed), so the
    sample is reproducible and the DuckDB oracle replays it exactly:

        u = (md5_int(id || '|gumbel|' || seed) + 1) / (16^7 + 1)
        key = weight + round(-ln(-ln(u)), 6)

    Both rounded-6 inputs are bit-identical doubles cross-engine, so
    the final (key desc, id) order is total and portable."""
    u = (
        md5_hash_int(
            F.concat(
                F.col(id_col).cast("string"), F.lit(f"|gumbel|{seed}")
            )
        )
        + F.lit(1.0)
    ) / F.lit(_GUMBEL_DENOM)
    g = F.round(-F.log(-F.log(u)), 6)
    return F.round(F.col(weight_col) + g, 6)


def dsir_gumbel_sample(
    weights: DataFrame,
    n: int,
    seed: int = 42,
    id_col: str = "doc_id",
    weight_col: str = "dsir_weight",
) -> DataFrame:
    """DSIR's published sampling step: Gumbel top-``n`` over the
    importance weights — sampling WITHOUT replacement with probability
    ∝ exp(weight), not the deterministic argmax-n cut (``dsir_select``),
    so low-weight documents retain proportional probability mass and
    the selected corpus is not a hard quality cliff. Deterministic by
    seed (portable md5-derived noise); TakeOrderedAndProject — no
    global sort."""
    key = gumbel_key_expr(id_col, weight_col, seed)
    return (
        weights.select(
            F.col(id_col),
            F.col(weight_col),
            key.alias("gumbel_key"),
        )
        .orderBy(F.col("gumbel_key").desc(), F.col(id_col))
        .limit(n)
    )


def dsir_gumbel_sql(
    weights_sql: str,
    n: int,
    seed: int = 42,
    id_col: str = "doc_id",
    weight_col: str = "dsir_weight",
) -> str:
    """DuckDB replay of ``dsir_gumbel_sample`` over ``weights_sql``
    (a subquery yielding (id, ..., weight)) — identical hash, uniform,
    Gumbel transform, rounding, and tie order."""
    h = (
        "CAST('0x' || substr(md5(CAST(" + id_col + " AS VARCHAR) || "
        f"'|gumbel|{seed}'), 1, 7) AS BIGINT)"
    )
    return f"""
SELECT {id_col}, {weight_col},
       round({weight_col}
             + round(-ln(-ln(({h} + 1.0) / {_GUMBEL_DENOM})), 6), 6)
         AS gumbel_key
FROM ({weights_sql})
ORDER BY gumbel_key DESC, {id_col} LIMIT {n}
"""


def duckdb_ngrams_sql(n: int, lst: str = "toks") -> str:
    """DuckDB adjacent n-gram list over a token-list column ``lst`` —
    EMPTY below n tokens, matching ``_ngrams_n``. THE single SQL twin
    (review r13: the LM and repetition oracles each grew their own
    construction; an edge-case fix to one would have split them)."""
    cat = " || ' ' || ".join(f"{lst}[i-{n - 1 - j}]" for j in range(n))
    return (
        f"list_transform(generate_series({n}, len({lst})), i -> {cat})"
    )


def _ngrams_n(toks_col, n: int):
    """Adjacent n-gram strings of a token array (same guard as
    ``_bigrams``)."""
    return F.when(
        F.size(toks_col) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks_col) - (n - 1)),
            lambda i: F.concat_ws(
                " ",
                *[F.element_at(toks_col, i + j) for j in range(n)],
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def trigram_lm_scores(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = STUPID_BACKOFF_ALPHA,
) -> DataFrame:
    """Stupid-backoff TRIGRAM LM scoring — the full backoff CHAIN the
    web-scale recipe actually runs (Brants et al. 2007 use 5-gram;
    the chain mechanism is identical, the order is a constant):

        p(w3 | w1 w2) = c(w1 w2 w3) / c(w1 w2 ·)        if trigram seen
                      = α · c(w2 w3) / c(w2 ·)           elif bigram seen
                      = α² · (c(w3)+1) / (T+V)           else

    Per-position logs carried as exact logp·10⁶ integers (order-free
    sums, the bigram_lm_scores recipe). Output: (id, n_trigrams,
    n_order3, n_order2, n_order1, lm_logprob, ppl); eval docs with
    fewer than 3 tokens are excluded. Scale shape: the train pass is
    one explode + four count tables (trigram, trigram-context =
    bigram-as-prefix, bigram, bigram-context); the eval side explodes
    trigrams once and joins them — context tables are vocabulary- or
    vocabulary²-sized and shuffle-join on near-uniform string keys.
    """
    out = ngram_lm_scores(
        train, eval_df, order=3, text_col=text_col, id_col=id_col,
        alpha=alpha,
    )
    return out.select(
        F.col(id_col),
        F.col("n_ngrams").alias("n_trigrams"),
        "n_order3",
        "n_order2",
        "n_order1",
        "lm_logprob",
        "ppl",
    )


def trigram_lm_sql(
    train_pred: str = "doc_id % 2 = 0",
    eval_pred: str = "doc_id % 2 = 1",
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = STUPID_BACKOFF_ALPHA,
) -> str:
    """DuckDB replay of ``trigram_lm_scores``."""
    tok = (
        f"string_split(trim(regexp_replace(lower({text_col}),"
        " '\\s+', ' ', 'g')), ' ')"
    )
    tg = (
        "list_transform(generate_series(3, len(toks)),"
        " i -> toks[i-2] || ' ' || toks[i-1] || ' ' || toks[i])"
    )
    bg = (
        "list_transform(generate_series(2, len(toks)),"
        " i -> toks[i-1] || ' ' || toks[i])"
    )
    return f"""
WITH tok AS (
  SELECT {id_col}, {tok} AS toks
  FROM {table} WHERE {text_col} IS NOT NULL
),
tr_uni AS (
  SELECT w, count(*) AS c_uni FROM (
    SELECT unnest(toks) AS w FROM tok WHERE {train_pred}
  ) GROUP BY 1
),
tr_tot AS (SELECT sum(c_uni) AS t_total, count(*) AS v_size FROM tr_uni),
tr_tri AS (
  SELECT tg, count(*) AS c_tri FROM (
    SELECT unnest({tg}) AS tg FROM tok WHERE {train_pred}
  ) GROUP BY 1
),
tr_tctx AS (
  SELECT str_split(tg, ' ')[1] || ' ' || str_split(tg, ' ')[2] AS p12,
         sum(c_tri) AS c_tctx
  FROM tr_tri GROUP BY 1
),
tr_big AS (
  SELECT bg, count(*) AS c_big FROM (
    SELECT unnest({bg}) AS bg FROM tok WHERE {train_pred}
  ) GROUP BY 1
),
tr_ctx AS (
  SELECT str_split(bg, ' ')[1] AS w1, sum(c_big) AS c_ctx
  FROM tr_big GROUP BY 1
),
ev AS (
  SELECT {id_col}, unnest({tg}) AS tg
  FROM tok WHERE {eval_pred}
),
scored AS (
  SELECT ev.{id_col},
         CAST(round((CASE
           WHEN t.c_tri IS NOT NULL THEN ln(t.c_tri / tc.c_tctx)
           WHEN b.c_big IS NOT NULL
             THEN ln({alpha} * b.c_big / c.c_ctx)
           ELSE ln({alpha * alpha} * (coalesce(u.c_uni, 0) + 1.0)
                   / (tt.t_total + tt.v_size)) END)
           * 1000000.0) AS BIGINT) AS logp_int,
         CASE WHEN t.c_tri IS NOT NULL THEN 1 ELSE 0 END AS o3,
         CASE WHEN t.c_tri IS NULL AND b.c_big IS NOT NULL
              THEN 1 ELSE 0 END AS o2,
         CASE WHEN t.c_tri IS NULL AND b.c_big IS NULL
              THEN 1 ELSE 0 END AS o1
  FROM ev
  LEFT JOIN tr_tri t USING (tg)
  LEFT JOIN tr_tctx tc
    ON str_split(ev.tg, ' ')[1] || ' ' || str_split(ev.tg, ' ')[2] = tc.p12
  LEFT JOIN tr_big b
    ON str_split(ev.tg, ' ')[2] || ' ' || str_split(ev.tg, ' ')[3] = b.bg
  LEFT JOIN tr_ctx c ON str_split(ev.tg, ' ')[2] = c.w1
  LEFT JOIN tr_uni u ON str_split(ev.tg, ' ')[3] = u.w
  CROSS JOIN tr_tot tt
)
SELECT {id_col},
       CAST(count(*) AS BIGINT) AS n_trigrams,
       CAST(sum(o3) AS BIGINT) AS n_order3,
       CAST(sum(o2) AS BIGINT) AS n_order2,
       CAST(sum(o1) AS BIGINT) AS n_order1,
       round(CAST(sum(logp_int) AS DOUBLE) / (count(*) * 1000000.0), 6)
         AS lm_logprob,
       round(exp(-round(CAST(sum(logp_int) AS DOUBLE)
                        / (count(*) * 1000000.0), 6)), 4) AS ppl
FROM scored GROUP BY {id_col}
"""


# ---------------------------------------------------------------------------
# Generalized stupid-backoff chain (r13, VERDICT r12 next #5): the
# bigram and trigram scorers above are ORDER INSTANCES of one chain —
# Brants et al. 2007 run the identical mechanism at 5-gram. One
# implementation owns the count tables, the backoff ladder, the
# α-powers, and the integer-logp parity discipline; the order is a
# parameter. bigram_lm_scores / trigram_lm_scores now delegate here
# (their oracles unchanged — the diffcheck re-proves instance
# equality), and lm_perplexity_5gram exercises a higher order.
# ---------------------------------------------------------------------------


def _alpha_pow(alpha: float, n: int) -> float:
    """α^n by repeated multiplication — bit-identical to the inlined
    ``alpha * alpha`` constants the order-2/3 oracles fold (pow() may
    differ in the last ulp)."""
    out = 1.0
    for _ in range(n):
        out *= alpha
    return out


def ngram_lm_scores(
    train: DataFrame,
    eval_df: DataFrame,
    order: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = STUPID_BACKOFF_ALPHA,
) -> DataFrame:
    """Stupid-backoff n-gram LM scoring at any ``order`` ≥ 2::

        p(w_N | w_1..w_{N-1})
          = c(g_k) / c(ctx_k) · α^(N−k)   for the LONGEST seen suffix
                                           k-gram g_k (k = N..2)
          = α^(N−1) · (c(w_N)+1) / (T+V)  if no suffix bigram seen

    Output: (id, n_ngrams, n_order{N}..n_order1, lm_logprob, ppl);
    eval docs with fewer than ``order`` tokens are excluded. Same
    exact-integer logp·10⁶ discipline as the order-2/3 instances.

    Scale shape: the train pass is one explode per level → N−1
    count tables (k-grams) + N−1 context tables (their k−1-word
    prefixes) + the unigram/totals pair; each is vocabulary-bounded
    (Zipf-collapsed far below corpus size). The eval side explodes
    top-order grams ONCE and left-joins each level on its suffix —
    2(N−1)+1 joins of a doc-linear frame against count tables, all
    key-uniform on the count side.
    """
    if order < 2:
        raise ValueError("ngram_lm_scores: order must be >= 2")
    tr_toks = train.where(F.col(text_col).isNotNull()).select(
        tokens(F.col(text_col)).alias("__toks")
    )
    tr_uni = (
        tr_toks.select(F.explode("__toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c_uni"))
    )
    tr_tot = tr_uni.agg(
        F.sum("c_uni").alias("t_total"), F.count(F.lit(1)).alias("v_size")
    )
    ktabs = {}
    for k in range(2, order + 1):
        kg = (
            tr_toks.select(
                F.explode(_ngrams_n(F.col("__toks"), k)).alias("g")
            )
            .groupBy("g")
            .agg(F.count(F.lit(1)).alias(f"c_{k}"))
        )
        kparts = F.split(F.col("g"), " ")
        ctx = (
            kg.select(
                F.concat_ws(
                    " ", *[kparts.getItem(j) for j in range(k - 1)]
                ).alias("p"),
                f"c_{k}",
            )
            .groupBy("p")
            .agg(F.sum(f"c_{k}").alias(f"ctx_{k}"))
        )
        ktabs[k] = (kg, ctx)

    ev = (
        eval_df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
        .select(
            F.col(id_col),
            F.explode(_ngrams_n(F.col("__toks"), order)).alias("g"),
        )
    )
    parts = F.split(F.col("g"), " ")
    scored = ev
    for k in range(order, 1, -1):
        kg, ctx = ktabs[k]
        key = (
            F.col("g")
            if k == order
            else F.concat_ws(
                " ", *[parts.getItem(order - k + j) for j in range(k)]
            )
        )
        ckey = F.concat_ws(
            " ", *[parts.getItem(order - k + j) for j in range(k - 1)]
        )
        scored = scored.join(
            kg.withColumnRenamed("g", f"__g{k}"),
            key == F.col(f"__g{k}"),
            "left",
        ).join(
            ctx.withColumnRenamed("p", f"__p{k}"),
            ckey == F.col(f"__p{k}"),
            "left",
        )
    scored = scored.join(
        tr_uni.withColumnRenamed("w", "__wl"),
        parts.getItem(order - 1) == F.col("__wl"),
        "left",
    ).crossJoin(F.broadcast(tr_tot))

    seen = {k: F.col(f"c_{k}").isNotNull() for k in range(2, order + 1)}
    expr = None
    for k in range(order, 1, -1):
        mult = _alpha_pow(alpha, order - k)
        branch = F.log(
            F.lit(mult) * F.col(f"c_{k}") / F.col(f"ctx_{k}")
            if mult != 1.0
            else F.col(f"c_{k}") / F.col(f"ctx_{k}")
        )
        expr = (
            F.when(seen[k], branch)
            if expr is None
            else expr.when(seen[k], branch)
        )
    fallback = F.log(
        F.lit(_alpha_pow(alpha, order - 1))
        * (F.coalesce(F.col("c_uni"), F.lit(0)) + F.lit(1.0))
        / (F.col("t_total") + F.col("v_size"))
    )
    logp_int = F.round(expr.otherwise(fallback) * F.lit(1_000_000.0)).cast(
        "bigint"
    )

    flags = []
    none_higher = F.lit(True)
    for k in range(order, 1, -1):
        flags.append(
            (none_higher & seen[k]).cast("int").alias(f"__o{k}")
        )
        none_higher = none_higher & ~seen[k]
    flags.append(none_higher.cast("int").alias("__o1"))

    mean = F.round(
        F.sum("__logp_int") / (F.count(F.lit(1)) * F.lit(1_000_000.0)), 6
    )
    return (
        scored.select(
            F.col(id_col), logp_int.alias("__logp_int"), *flags
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_ngrams"),
            *[
                F.sum(f"__o{k}").cast("bigint").alias(f"n_order{k}")
                for k in range(order, 0, -1)
            ],
            mean.alias("lm_logprob"),
            F.round(F.exp(-mean), 4).alias("ppl"),
        )
    )


def ngram_lm_sql(
    order: int = 3,
    train_pred: str = "doc_id % 2 = 0",
    eval_pred: str = "doc_id % 2 = 1",
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = STUPID_BACKOFF_ALPHA,
) -> str:
    """DuckDB replay of ``ngram_lm_scores`` at any order — the same
    CTE shape as the order-2/3 oracles, generated per level."""
    if order < 2:
        raise ValueError("ngram_lm_sql: order must be >= 2")
    tok = (
        f"string_split(trim(regexp_replace(lower({text_col}),"
        " '\\s+', ' ', 'g')), ' ')"
    )

    gram = duckdb_ngrams_sql  # shared fragment (see its docstring)

    def suffix(k: int) -> str:  # 1-based positions order-k+1..order
        return " || ' ' || ".join(
            f"str_split(ev.g, ' ')[{order - k + 1 + j}]" for j in range(k)
        )

    ctes = [
        f"""tok AS (
  SELECT {id_col}, {tok} AS toks
  FROM {table} WHERE {text_col} IS NOT NULL
)""",
        """tr_uni AS (
  SELECT w, count(*) AS c_uni FROM (
    SELECT unnest(toks) AS w FROM tok WHERE __TRAIN__
  ) GROUP BY 1
)""".replace("__TRAIN__", train_pred),
        "tr_tot AS (SELECT sum(c_uni) AS t_total,"
        " count(*) AS v_size FROM tr_uni)",
    ]
    for k in range(2, order + 1):
        pfx = " || ' ' || ".join(
            f"str_split(g, ' ')[{j + 1}]" for j in range(k - 1)
        )
        ctes.append(
            f"""tr_g{k} AS (
  SELECT g, count(*) AS c_{k} FROM (
    SELECT unnest({gram(k)}) AS g FROM tok WHERE {train_pred}
  ) GROUP BY 1
)"""
        )
        ctes.append(
            f"""tr_ctx{k} AS (
  SELECT {pfx} AS p, sum(c_{k}) AS ctx_{k} FROM tr_g{k} GROUP BY 1
)"""
        )
    ctes.append(
        f"""ev AS (
  SELECT {id_col}, unnest({gram(order)}) AS g
  FROM tok WHERE {eval_pred}
)"""
    )

    cases, flags, joins = [], [], []
    for k in range(order, 1, -1):
        mult = _alpha_pow(alpha, order - k)
        m = "" if mult == 1.0 else f"{mult!r} * "
        cases.append(
            f"WHEN g{k}.c_{k} IS NOT NULL"
            f" THEN ln({m}g{k}.c_{k} / x{k}.ctx_{k})"
        )
        higher = " AND ".join(
            f"g{j}.c_{j} IS NULL" for j in range(order, k, -1)
        )
        cond = (
            f"g{k}.c_{k} IS NOT NULL"
            if k == order
            else f"{higher} AND g{k}.c_{k} IS NOT NULL"
        )
        flags.append(f"CASE WHEN {cond} THEN 1 ELSE 0 END AS o{k}")
        key = "ev.g" if k == order else suffix(k)
        ckey = " || ' ' || ".join(
            f"str_split(ev.g, ' ')[{order - k + 1 + j}]"
            for j in range(k - 1)
        )
        joins.append(f"LEFT JOIN tr_g{k} g{k} ON {key} = g{k}.g")
        joins.append(f"LEFT JOIN tr_ctx{k} x{k} ON {ckey} = x{k}.p")
    all_null = " AND ".join(
        f"g{j}.c_{j} IS NULL" for j in range(order, 1, -1)
    )
    flags.append(f"CASE WHEN {all_null} THEN 1 ELSE 0 END AS o1")
    fb = _alpha_pow(alpha, order - 1)
    case_sql = "\n           ".join(cases)
    flag_sql = ",\n         ".join(flags)
    join_sql = "\n  ".join(joins)
    osel = ",\n       ".join(
        f"CAST(sum(o{k}) AS BIGINT) AS n_order{k}"
        for k in range(order, 0, -1)
    )
    return f"""
WITH {", ".join(ctes)},
scored AS (
  SELECT ev.{id_col},
         CAST(round((CASE
           {case_sql}
           ELSE ln({fb!r} * (coalesce(u.c_uni, 0) + 1.0)
                   / (tt.t_total + tt.v_size)) END)
           * 1000000.0) AS BIGINT) AS logp_int,
         {flag_sql}
  FROM ev
  {join_sql}
  LEFT JOIN tr_uni u ON str_split(ev.g, ' ')[{order}] = u.w
  CROSS JOIN tr_tot tt
)
SELECT {id_col},
       CAST(count(*) AS BIGINT) AS n_ngrams,
       {osel},
       round(CAST(sum(logp_int) AS DOUBLE) / (count(*) * 1000000.0), 6)
         AS lm_logprob,
       round(exp(-round(CAST(sum(logp_int) AS DOUBLE)
                        / (count(*) * 1000000.0), 6)), 4) AS ppl
FROM scored GROUP BY {id_col}
"""
