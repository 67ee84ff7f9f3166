"""Text-analysis operators for training-data pipelines (north-star
extensions; SURVEY §7.2 item 7): tokenization, language ID, quality
scoring, document fingerprinting.

All pure Catalyst expressions (split / higher-order array functions /
regexp) — JVM-side, whole-stage codegen, no UDFs; embarrassingly parallel
(per-row), so they scale linearly with executors at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_hash_int

# Deliberately DISJOINT stopword sets so the language vote is unambiguous.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
    "fr": ["le", "les", "une", "est", "pour", "dans", "qui", "pas"],
    "es": ["el", "los", "una", "por", "como", "pero", "sus", "muy"],
}


def normalize_text(col: Column) -> Column:
    """lower → collapse whitespace → trim (the dedup canonical form)."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def tokens(col: Column) -> Column:
    """Whitespace tokenization of normalized text."""
    return F.split(normalize_text(col), " ")


def token_count(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count per document."""
    return df.select(
        id_col, F.size(tokens(F.col(text_col))).alias("n_tokens")
    )


def sequence_pack(
    df: DataFrame,
    ctx_len: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
    counter=None,
    counts_df: DataFrame | None = None,
) -> DataFrame:
    """Concat-then-chunk sequence packing — the standard pretraining data
    layout: the corpus token stream (docs in ``id_col`` order) is cut
    into fixed ``ctx_len`` windows, and each doc is mapped to the packs
    it lands in. Output per doc: ``(id, n_tokens, start_offset,
    pack_first, pack_last)`` — ``pack_last > pack_first`` means the doc
    straddles a window boundary.

    Scale: the only global ordering is the token-count running total,
    computed with the range-partitioned prefix sum
    (functions/stats.py) — no single-reducer window; everything else is
    per-row integer arithmetic in codegen (``DIV``, never double
    division — exact beyond 2^53 token streams). A zero-token doc gets
    ``pack_last == pack_first`` (it sits at its offset's window).

    ``counter`` swaps the token counter (Column -> Column); default is
    the whitespace count, operators/bpe.py supplies the exact-BPE count
    for real token budgets. ``counts_df`` swaps in a PRE-COMPUTED
    per-doc count frame ``(id_col, n_tokens)`` instead — the hook for
    counters that are plans rather than expressions (the large-vocab
    BPE path, bpe.bpe_token_count_vocab).
    """
    from ..functions.stats import partitioned_prefix_sum

    if counts_df is not None:
        counts = counts_df.select(F.col(id_col), F.col("n_tokens"))
    else:
        count_fn = counter or (lambda c: F.size(tokens(c)))
        counts = df.select(
            F.col(id_col), count_fn(F.col(text_col)).alias("n_tokens")
        )
    cum = partitioned_prefix_sum(counts, id_col, ["n_tokens"])
    start = (F.col("cum_n_tokens") - F.col("n_tokens")).cast("bigint")
    pack_first = F.expr(
        f"CAST((cum_n_tokens - n_tokens) DIV {ctx_len} AS BIGINT)"
    )
    return cum.select(
        id_col,
        "n_tokens",
        start.alias("start_offset"),
        pack_first.alias("pack_first"),
        F.greatest(
            pack_first, F.expr(f"CAST((cum_n_tokens - 1) DIV {ctx_len} AS BIGINT)")
        ).alias("pack_last"),
    )


# GPT-2-ish pre-tokenizer shape, reduced to the portable POSIX subset
# (no \p classes, no lookahead — identical matches in Spark and DuckDB):
# contraction suffixes | letter runs | digit runs | punctuation runs.
BPE_TOKEN_PATTERN = "'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"


def token_count_bpe(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """BPE-ish token count per doc: the pre-tokenization split a byte-pair
    encoder would see (contractions, letter runs, digit runs, punctuation
    runs) — the count LLM data pipelines budget by, vs the whitespace
    count ``token_count`` reports. Pure ``regexp_extract_all`` — map-only.
    """
    return df.select(
        id_col,
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_PATTERN), 0)
        ).alias("n_bpe_tokens"),
    )


def word_shingles(col: Column, n: int = 3) -> Column:
    """Array of n-word shingles ('w1 w2 w3' strings) of normalized text.
    Docs shorter than n words yield one (short) shingle. Pure higher-order
    array expression — no explode until the consumer asks for it."""
    toks = tokens(col)
    n_sh = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), n_sh),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )


def shingle_hashes(col: Column, n: int = 3) -> Column:
    """Distinct portable integer hashes of the n-word shingles."""
    return F.array_distinct(
        F.transform(word_shingles(col, n), lambda s: md5_hash_int(s))
    )


def lang_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic language ID: disjoint-stopword voting with a fixed
    tie-break order (en > de > fr > es > unknown)."""
    toks = tokens(F.col(text_col))

    def _hits(sw: list[str]) -> Column:
        # NB: the lambda must take exactly one arg — a second arg (even a
        # defaulted one) makes Spark pass the element INDEX into it.
        return F.size(F.filter(toks, lambda t: t.isin(*sw)))

    hit_cols = {lang: _hits(sw) for lang, sw in LANG_STOPWORDS.items()}
    en, de, fr, es = (hit_cols[x] for x in ("en", "de", "fr", "es"))
    pred = (
        F.when((en > 0) & (en >= de) & (en >= fr) & (en >= es), "en")
        .when((de > 0) & (de >= fr) & (de >= es), "de")
        .when((fr > 0) & (fr >= es), "fr")
        .when(es > 0, "es")
        .otherwise("unknown")
    )
    return df.select(id_col, pred.alias("lang_pred"))


def text_quality(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Quality heuristics per doc: length, token count, mean token length,
    stopword ratio, alpha ratio, and a composite score in [0, 1].
    All ratios are deterministic arithmetic over exact counts."""
    t = F.col(text_col)
    norm = normalize_text(t)
    toks = tokens(t)
    n_chars = F.length(t).cast("double")
    n_tokens = F.size(toks).cast("double")
    en_sw = LANG_STOPWORDS["en"]
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*en_sw))).cast("double")
    n_alpha = F.length(F.regexp_replace(norm, r"[^a-z]", "")).cast("double")
    mean_token_len = (F.length(norm) - (n_tokens - 1)) / n_tokens
    stop_ratio = n_stop / n_tokens
    alpha_ratio = n_alpha / F.length(norm).cast("double")
    score = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * F.lit(0.4)
        + stop_ratio * F.lit(0.3)
        + alpha_ratio * F.lit(0.3)
    )
    return df.select(
        id_col,
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(mean_token_len, 6).alias("mean_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 5,
    min_stopword_ratio: float = 0.05,
    min_alpha_ratio: float = 0.6,
    max_mean_token_len: float = 12.0,
) -> DataFrame:
    """Gopher-style document admission: keep a doc iff it clears every
    length/stopword/alpha/token-shape rule (Rae et al. 2021's repetition
    & quality gates, reduced to the deterministic subset computable from
    ``text_quality``'s exact counts). Output: (id, keep, reject_reason)
    — reason names the FIRST failed rule, '' when kept; map-only."""
    q = text_quality(df, text_col, id_col)
    reason = (
        F.when(F.col("n_tokens") < min_tokens, F.lit("too_few_tokens"))
        .when(
            F.col("stopword_ratio") < min_stopword_ratio,
            F.lit("low_stopword_ratio"),
        )
        .when(F.col("alpha_ratio") < min_alpha_ratio, F.lit("low_alpha_ratio"))
        .when(
            F.col("mean_token_len") > max_mean_token_len,
            F.lit("long_tokens"),
        )
        .otherwise(F.lit(""))
    )
    return q.select(
        id_col,
        reason.alias("reject_reason"),
    ).withColumn("keep", F.col("reject_reason") == "")


def line_dedup_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style corpus-wide LINE dedup (Raffel et al. 2020 §2.2 also
    ran a line-grain pass; CCNet dedups paragraph hashes the same
    way): only the FIRST occurrence — lexicographic (doc_id,
    line position) — of every distinct trimmed line survives, and
    each document is rebuilt from its surviving lines. Repeated
    boilerplate (nav bars, cookie banners, footers) collapses to one
    copy corpus-wide even when no structural tag identifies it — the
    statistical complement to ``html_extract``'s tag/link-density
    gates.

    Returns (id, text_deduped, n_lines_kept, n_lines_removed) — one
    row per non-null-text doc; a fully-deduplicated doc comes back
    ``''``. Lines are ASCII-space-trimmed; blank lines never count.

    Scale: one explode (O(corpus lines)); the wide exchange groups a
    128-bit line DIGEST (16-byte keys however long the line), the
    span_dedup_corpus discipline; first-occurrence is a struct min —
    unbounded positions, any orderable id. NULL ids fail loudly."""
    per_doc, _kept = _line_dedup_frames(df, text_col, id_col, seen=None)
    return per_doc


def line_dedup_increment(
    df: DataFrame,
    seen: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    materialize_kept: bool = False,
) -> tuple:
    """One INCREMENT of corpus-wide line dedup — the streaming /
    incremental-ingest form of ``line_dedup_corpus`` (the
    ``dedup_incremental`` gate pattern at LINE grain): lines already
    committed by earlier increments (``seen`` — a frame with the
    16-byte-hex digest column ``k``; None for the first increment)
    never survive, and within the batch the usual lexicographic
    (id, pos) first occurrence wins. Because each increment only ever
    sees state from STRICTLY earlier increments, draining a stream of
    increments reproduces one-shot ``line_dedup_corpus`` under the
    arrival order (pinned by q:``stream_line_dedup``'s oracle).

    Returns ``(per_doc, new_digests)``: ``per_doc`` is this batch's
    rows in ``line_dedup_corpus``'s exact output schema; ``new_digests``
    is the batch's kept digest set (one row per newly-seen line) to
    append to the state table for the next increment.

    Scale: the batch side is the corpus operator's shape (one explode,
    digest-keyed exchange); the gate is a left-anti join on 16-byte
    digests against the state table — bounded by batch lines, with the
    state scan prunable by the txn store's file stats. When the state
    outgrows a comfortable shuffle, use ``line_dedup_increment_bloom``:
    same output bit-for-bit, anti-join input pruned by a fixed-size
    broadcast bitmap.

    ``materialize_kept`` (optimization r15): localCheckpoint the
    shared kept-lines frame before deriving the two outputs, so a
    caller that ACTIONS both (the streaming ingests: one txn append
    per output) runs the explode + first-occurrence + gate joins once
    instead of once per action. Off by default — a single-action
    caller reuses the exchanges within its one plan for free."""
    return _line_dedup_frames(
        df, text_col, id_col, seen=seen, materialize_kept=materialize_kept
    )


def line_dedup_increment_bloom(
    df: DataFrame,
    seen: DataFrame | None,
    bloom_regs: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    materialize_kept: bool = False,
) -> tuple:
    """``line_dedup_increment`` with the anti-join BLOOM-GATED (the
    scale path when the kept corpus's digest table outgrows a
    comfortable per-batch shuffle): the ≤256-row broadcast bitmap
    (``sketch.bloom_registers`` over the seen digests) splits the
    batch's first-occurrence digests into definitely-new (bypass the
    exact join — the filter has NO false negatives) and possibly-seen
    (exact anti-join, so false positives cost a lookup, never a wrong
    answer). Output is BIT-IDENTICAL to the plain increment — the two
    share one oracle. Extra bits in the bitmap are always SAFE (they
    only force the exact check), so at-least-once bloom maintenance
    and crash-replay with a fresher bitmap cannot corrupt the corpus;
    MISSING bits are not — commit the bloom partials BEFORE the digest
    state (see q:``stream_line_dedup_bloom``)."""
    from .sketch import bloom_member_flags

    if bloom_regs is None or seen is None:
        return _line_dedup_frames(
            df,
            text_col,
            id_col,
            seen=seen,
            materialize_kept=materialize_kept,
        )

    def gate(first: DataFrame) -> DataFrame:
        flagged = bloom_member_flags(first, "k", bloom_regs)
        definite_new = flagged.where(~F.col("bloom_maybe")).drop(
            "bloom_maybe"
        )
        maybe = flagged.where(F.col("bloom_maybe")).drop("bloom_maybe")
        return definite_new.unionByName(
            maybe.join(
                seen.select("k").dropDuplicates(["k"]), "k", "left_anti"
            )
        )

    return _line_dedup_frames(
        df,
        text_col,
        id_col,
        seen=None,
        gate=gate,
        materialize_kept=materialize_kept,
    )


def _line_dedup_frames(
    df: DataFrame,
    text_col: str,
    id_col: str,
    seen: DataFrame | None,
    gate=None,
    materialize_kept: bool = False,
) -> tuple:
    """Shared body of the line-dedup family: returns
    ``(per_doc, kept_lines)`` where ``kept_lines`` carries
    (id, pos, line, k) for every surviving line. ``gate`` (a
    DataFrame→DataFrame hook over the first-occurrence frame)
    overrides the default seen-digest anti-join — the bloom variant's
    entry point."""
    # fail-loud NULL-id guard. NOT folded into the dedup subtree: a
    # NULL id makes the struct-equality filter all-NULL → `kept`
    # empty → AQE's empty-relation propagation replaces the right
    # side of the final join WITHOUT awaiting the failing stage (the
    # assert then fires only in a background broadcast thread whose
    # failure never propagates — observed). Folding it into the LEFT
    # side's per-row output makes it un-prunable.
    _id_ok = F.coalesce(
        F.assert_true(
            F.col("id").isNotNull(),
            F.lit("line_dedup_corpus: NULL id — dedup order undefined"),
        ).cast("int"),
        F.lit(0),
    )
    docs = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.filter(
            F.transform(F.split(F.col(text_col), "\n"), lambda x: F.trim(x)),
            lambda x: x != "",
        ).alias("ls"),
    )
    lines = docs.select(
        "id", F.posexplode("ls").alias("p0", "line")
    ).select(
        "id",
        (F.col("p0") + 1).alias("pos"),
        F.md5(F.encode("line", "UTF-8")).alias("k"),
        "line",
    )
    first = lines.groupBy("k").agg(
        F.min(F.struct(F.col("id"), F.col("pos"))).alias("first_occ")
    )
    if gate is not None:
        first = gate(first)
    elif seen is not None:
        first = first.join(
            seen.select("k").dropDuplicates(["k"]), "k", "left_anti"
        )
    kept = (
        lines.join(first, "k")
        .where(F.struct(F.col("id"), F.col("pos")) == F.col("first_occ"))
        .select("id", "pos", "line", "k")
    )
    if materialize_kept:
        # Eager on purpose: a lazy cut here was tried (r15) and
        # measured SLOWER (stream_line_dedup 6.4 s -> 9.1 s at sf0.1)
        # — the first consuming append then drags the whole explode +
        # first-occurrence chain into its own job where the kept
        # frame is referenced from several subplans, paying block-lock
        # waits instead of one clean materialization.
        kept = kept.localCheckpoint(eager=True)
    rebuilt = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("text_deduped"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    per_doc = (
        docs.select("id", (F.size("ls") + _id_ok).alias("n_lines"))
        .join(rebuilt, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("text_deduped", F.lit("")).alias("text_deduped"),
            F.coalesce("n_kept", F.lit(0))
            .cast("long")
            .alias("n_lines_kept"),
            (F.col("n_lines") - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_lines_removed"),
        )
    )
    return per_doc, kept


def quality_keep_col(
    text_col: str = "text",
    min_tokens: int = 5,
    min_stopword_ratio: float = 0.05,
    min_alpha_ratio: float = 0.6,
    max_mean_token_len: float = 12.0,
) -> Column:
    """The ``quality_filter`` admission rule as ONE stateless Column
    over the text — for streaming pipelines where joining the
    (id, keep) frame back would be a stateful stream-stream join.
    Same exact counts and the same ROUNDED ratios as
    ``text_quality``/``quality_filter`` (equivalence pinned in
    tests), so batch and streaming admission can never drift."""
    t = F.col(text_col)
    norm = normalize_text(t)
    toks = tokens(t)
    nt = F.size(toks).cast("double")
    en_sw = LANG_STOPWORDS["en"]
    stop_r = F.round(
        F.size(F.filter(toks, lambda x: x.isin(*en_sw))).cast("double")
        / nt,
        6,
    )
    alpha_r = F.round(
        F.length(F.regexp_replace(norm, r"[^a-z]", "")).cast("double")
        / F.length(norm).cast("double"),
        6,
    )
    mtl = F.round((F.length(norm) - (nt - 1)) / nt, 6)
    return (
        (nt >= F.lit(float(min_tokens)))
        & (stop_r >= F.lit(min_stopword_ratio))
        & (alpha_r >= F.lit(min_alpha_ratio))
        & (mtl <= F.lit(max_mean_token_len))
    )


def top_ngrams(
    df: DataFrame,
    n: int = 2,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level top-k n-grams by document frequency (one count per
    doc per distinct n-gram): explode → distinct per doc → count →
    TakeOrderedAndProject. Ties broken lexicographically for
    determinism."""
    grams = df.select(
        F.col("doc_id"),
        F.explode(F.array_distinct(word_shingles(F.col(text_col), n))).alias(
            "ngram"
        ),
    )
    counts = grams.groupBy("ngram").agg(F.count(F.lit(1)).alias("doc_freq"))
    return counts.orderBy(F.desc("doc_freq"), F.asc("ngram")).limit(k)


def span_dedup_corpus(
    df: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style exact SPAN dedup across the whole corpus (Raffel et al.
    2020 §2.2 removed all but one of any three-sentence span occurring
    more than once; Lee et al. 2021 'Deduplicating Training Data' is
    the exact-substring generalization): every word covered by an
    n-word span whose identical text occurred EARLIER in the corpus —
    earlier doc, or earlier position in the same doc — is dropped, and
    each document's text is rebuilt from the surviving words. The first
    occurrence of every span always survives intact (unless an
    overlapping different span duplicated it), so repeated boilerplate
    collapses to one copy corpus-wide. Deterministic: "earlier" is the
    lexicographic ``(doc_id, position)`` order — a struct min, so any
    orderable id type works and positions are unbounded (the previous
    ``doc_id * 2^20 + position`` arithmetic encoding silently
    mis-ordered ≥2^20-word docs and NULLed out on non-integer ids:
    ADVICE r11 low). A NULL id fails loudly instead of silently
    disabling dedup for that doc.

    Returns ``(id_col, text_deduped, n_words_removed)`` — one row per
    non-null-text input doc; a fully-deduplicated doc comes back as
    ``''``, a doc shorter than ``n`` words is untouched.

    Scale: two explodes (spans and words) are O(corpus tokens) each —
    map-side, no row blowup beyond token count; the wide exchanges are
    the groupBy on a 128-bit span DIGEST (md5 — 16 bytes however long
    the span text is, so the biggest shuffle in the job moves fixed-
    width keys; exact-match semantics hold up to 2^-128 collisions,
    the standard exact-substring-dedup tradeoff) and the
    (doc, position) anti-join, both hash-partitioned and
    AQE-coalesced. No sort, no window, no driver state; this is the
    shape distributed exact-substring dedup pipelines actually run
    when a suffix array doesn't fit."""
    # fail-loud NULL-id guard. Folded into the FINAL left side's
    # per-row output (n_words), NOT into the dedup subtree: a NULL id
    # empties `dup_words` (struct comparisons go NULL), and AQE's
    # empty-relation propagation then replaces the anti-join's right
    # side WITHOUT awaiting the failing stage — the assert fired only
    # in a background thread whose failure never propagated, and the
    # doc came back silently destroyed (caught r13 via the line-dedup
    # twin; previously this guard sat on the position column).
    _id_ok = F.coalesce(
        F.assert_true(
            F.col("id").isNotNull(),
            F.lit("span_dedup_corpus: NULL id — dedup order undefined"),
        ).cast("int"),
        F.lit(0),
    )
    toks = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.split(F.col(text_col), " ").alias("ws")
    )
    spans = (
        toks.select(
            "id",
            F.posexplode(
                F.when(
                    F.size("ws") >= n,
                    F.transform(
                        F.sequence(F.lit(1), F.size("ws") - F.lit(n - 1)),
                        lambda i: F.concat_ws(" ", F.slice(F.col("ws"), i, n)),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("p0", "gram"),
        )
        .select(
            "id",
            (F.col("p0") + 1).alias("pos"),
            F.md5(F.encode("gram", "UTF-8")).alias("g128"),
        )
    )
    first = spans.groupBy("g128").agg(
        F.min(F.struct(F.col("id"), F.col("pos"))).alias("first_occ")
    )
    dup_words = (
        spans.join(first, "g128")
        .where(
            F.struct(F.col("id"), F.col("pos"))
            > F.col("first_occ")
        )
        .select(
            "id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(n - 1))
            ).alias("wpos"),
        )
        .distinct()
    )
    words = toks.select(
        "id", F.posexplode("ws").alias("p0", "word")
    ).select("id", (F.col("p0") + 1).alias("wpos"), "word")
    kept = words.join(dup_words, ["id", "wpos"], "left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("wpos", "word"))),
                lambda s: s["word"],
            ),
        ).alias("text_deduped"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    return (
        toks.select("id", (F.size("ws") + _id_ok).alias("n_words"))
        .join(rebuilt, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("text_deduped", F.lit("")).alias("text_deduped"),
            (F.col("n_words") - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_words_removed"),
        )
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher repetition signals per doc: fraction of duplicate lines and
    duplicate tokens (1 - distinct/total). High values flag boilerplate /
    templated text that the quality gates should drop. Pure array
    expressions (split + array_distinct) — map-only."""
    lines = F.split(F.col(text_col), "\n")
    toks = tokens(F.col(text_col))

    def dup_ratio(arr: Column) -> Column:
        n = F.size(arr).cast("double")
        return F.when(
            n > 0, F.lit(1.0) - F.size(F.array_distinct(arr)).cast("double") / n
        ).otherwise(F.lit(0.0))

    return df.where(F.col(text_col).isNotNull()).select(
        id_col,
        F.round(dup_ratio(lines), 6).alias("line_dup_ratio"),
        F.round(dup_ratio(toks), 6).alias("token_dup_ratio"),
    )


ROLLING_BASE = 131
ROLLING_MOD = 2_147_483_647  # 2^31 - 1: acc*131 + 255 stays far below 2^63


def rolling_hash_expr(col: Column) -> Column:
    """Rabin–Karp polynomial rolling hash of the normalized text:
    fold (acc * B + charcode) mod P over the character sequence — one
    higher-order ``aggregate`` per row, no UDF. Portable: DuckDB's
    ``list_reduce`` over the same char codes computes the identical fold
    (its first-element seeding equals our 0-init first step)."""
    chars = F.split(normalize_text(col), "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(ROLLING_BASE) + F.ascii(c))
        % F.lit(ROLLING_MOD),
    )


def doc_fingerprint_rolling(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Content fingerprint via the polynomial rolling hash (the classic
    Rabin–Karp form of document fingerprinting; the shingle-based
    ``doc_fingerprint`` is the winnowing-flavored sibling)."""
    return df.where(F.col(text_col).isNotNull()).select(
        id_col, rolling_hash_expr(F.col(text_col)).alias("rolling_hash")
    )


def doc_fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Content fingerprint: min shingle hash (winnowing-lite) + shingle
    count + full-content md5. Equal fingerprints ⇒ candidate duplicates."""
    hashes = shingle_hashes(F.col(text_col), n)
    return df.select(
        id_col,
        F.array_min(hashes).alias("min_shingle_hash"),
        F.size(hashes).alias("n_shingles"),
        F.md5(normalize_text(F.col(text_col))).alias("content_md5"),
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF
    (sklearn convention: idf = ln((N+1)/(df+1)) + 1).

    Scale shape: term frequencies from one explode+groupBy on
    (doc, token); document frequencies are a count over that frame
    (rows are already distinct doc-token pairs — no second pass over
    text); the corpus size N is a single broadcast row; ranking is a
    per-document window (each doc's term list is small by construction).
    The score is rounded BEFORE ranking on both engines so libm-vs-JVM
    ln noise can never flip an order (ties then break on the token).
    """
    from pyspark.sql import Window

    base = df.where(F.col(text_col).isNotNull())
    tf = (
        base.select(
            F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
        )
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    doc_freq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df_cnt"))
    n_docs = base.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(doc_freq, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "token",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("n_docs") + 1.0) / (F.col("df_cnt") + 1.0))
                    + 1.0
                ),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(id_col, "token", "tfidf")
    )


# Portable PII patterns (POSIX subset — identical matches in Spark's
# Java regex and DuckDB's RE2). Replacement order is fixed:
# email → ipv4 → phone (later patterns can never match earlier tokens).
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\- ]{7,}[0-9]", "<PHONE>"),
]


def pii_scrub(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Detect + redact PII (emails, IPv4s, phone-shaped numbers) — the
    standard pre-training scrub pass. Counts are taken on the ORIGINAL
    text; redaction applies the replacements in the fixed pattern order.
    Pure ``regexp_count``/``regexp_replace`` expressions — map-only,
    whole-stage codegen, zero shuffle.

    Output: (id, n_email, n_ipv4, n_phone, scrubbed) with the redacted
    text in ``scrubbed``.
    """
    src = F.col(text_col)
    counts = [
        F.regexp_count(src, F.lit(pat)).alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    scrubbed = src
    for _, pat, token in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, token)
    return df.where(src.isNotNull()).select(
        F.col(id_col), *counts, scrubbed.alias("scrubbed")
    )


#: Payment-card candidate: EXACTLY 13–19 digits allowing at most one
#: space/dash separator between digits — the digit count is enforced
#: by the pattern itself, so the redaction can never touch a run that
#: could not be a card (a date like ``2026-08-16 12`` has 10 digits
#: and no longer matches; review r13 — the old ``[0-9 -]{11,21}``
#: form redacted such runs while correctly counting zero candidates).
#: Deliberately lookaround-free (Java regex has lookbehind, RE2 does
#: not — the pattern must mean the same thing on both engines);
#: leftmost-first greedy semantics verified identical on both. The
#: stripped-digit length window stays as a belt in the counting path.
CC_CANDIDATE_RE = "[0-9](?:[ -]?[0-9]){12,18}"


def luhn_valid(digits: Column) -> Column:
    """Luhn checksum (ISO/IEC 7812) over a pure-digit string as an
    exact integer Catalyst fold: from the RIGHTMOST digit, double
    every second digit, subtract 9 when the doubled value exceeds 9,
    sum, valid iff ≡ 0 (mod 10). Plus the 13–19 length window. This is
    what separates a real card number from thirteen arbitrary digits —
    regex-only scrubbing false-positives on order ids, timestamps,
    and checksums-that-aren't."""
    rev = F.split(F.reverse(digits), "")
    terms = F.transform(
        rev,
        lambda x, i: F.when(
            (i + 1) % 2 == 0,
            x.cast("int") * 2
            - F.when(x.cast("int") >= 5, F.lit(9)).otherwise(F.lit(0)),
        ).otherwise(x.cast("int")),
    )
    s = F.aggregate(terms, F.lit(0), lambda a, x: a + x)
    return (
        (s % 10 == 0)
        & (F.length(digits) >= 13)
        & (F.length(digits) <= 19)
    )


def credit_card_scan(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Checksum-validated payment-card detection + redaction — the
    PII scrub step ``pii_scrub``'s shape-only patterns can't do
    (Presidio/Macie-class scrubbers all validate Luhn). Candidates
    come from ``CC_CANDIDATE_RE``; each candidate's separators are
    stripped and the Luhn fold decides validity. Redaction replaces
    every candidate the pattern can match — which by construction is
    only 13–19-digit runs (a near-miss checksum is still a probable
    typo'd card, so validity does NOT gate redaction) — while the
    counts split candidates from Luhn-valid hits so the
    false-positive rate is itself measurable. Map-only, whole-stage
    codegen, zero shuffle.

    Output: (id, n_cc_candidates, n_cc_valid, scrubbed).
    """
    src = F.col(text_col)
    cands = F.regexp_extract_all(src, F.lit(CC_CANDIDATE_RE), 0)
    digits = F.transform(
        cands, lambda c: F.regexp_replace(c, "[ -]", "")
    )
    in_window = F.filter(
        digits, lambda d: (F.length(d) >= 13) & (F.length(d) <= 19)
    )
    valid = F.filter(digits, luhn_valid)
    return df.where(src.isNotNull()).select(
        F.col(id_col),
        F.size(in_window).cast("int").alias("n_cc_candidates"),
        F.size(valid).cast("int").alias("n_cc_valid"),
        F.regexp_replace(src, CC_CANDIDATE_RE, "<CC>").alias("scrubbed"),
    )


def credit_card_sql(source_sql: str) -> str:
    """DuckDB replay of ``credit_card_scan`` over ``source_sql``
    yielding (doc_id, text): same candidate pattern (RE2-safe), same
    separator strip, same exact-integer Luhn fold."""
    luhn = """list_sum([
      CASE WHEN i % 2 = 0
           THEN CAST(reverse(d)[i] AS INT) * 2
                - CASE WHEN CAST(reverse(d)[i] AS INT) >= 5
                       THEN 9 ELSE 0 END
           ELSE CAST(reverse(d)[i] AS INT) END
      FOR i IN range(1, length(d) + 1)]) % 10 = 0"""
    return f"""
SELECT doc_id,
       CAST(len(list_filter(ds, d -> length(d) BETWEEN 13 AND 19))
            AS INT) AS n_cc_candidates,
       CAST(len(list_filter(ds, d -> length(d) BETWEEN 13 AND 19
                                     AND ({luhn})))
            AS INT) AS n_cc_valid,
       regexp_replace(text, '{CC_CANDIDATE_RE}', '<CC>', 'g') AS scrubbed
FROM (
  SELECT doc_id, text,
         list_transform(
           regexp_extract_all(text, '{CC_CANDIDATE_RE}', 0),
           c -> regexp_replace(c, '[ -]', '', 'g')) AS ds
  FROM ({source_sql}) WHERE text IS NOT NULL
)
"""


def doc_chunks(
    df: DataFrame,
    chunk_tokens: int = 50,
    overlap: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping token windows — the
    training-sample chunking pass. starts = 0, stride, 2*stride, …
    (stride = chunk_tokens - overlap); each chunk is a ``slice`` of the
    token array. Pure sequence+explode+slice Catalyst expressions —
    no UDF, the explode is the only row multiplication (by ~n/stride).

    Output: (id, chunk_index, n_tokens, chunk_text).
    """
    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("chunk_tokens must exceed overlap")
    base = (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col), tokens(F.col(text_col)).alias("__tk"))
        .withColumn(
            "__starts",
            F.sequence(
                F.lit(0),
                F.greatest(F.size("__tk") - 1, F.lit(0)),
                F.lit(stride),
            ),
        )
    )
    exploded = base.select(
        id_col,
        "__tk",
        F.posexplode("__starts").alias("chunk_index", "__start"),
    )
    chunk = F.expr(f"slice(__tk, __start + 1, {chunk_tokens})")
    return exploded.select(
        F.col(id_col),
        "chunk_index",
        F.size(chunk).alias("n_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


def lm_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Unigram language-model score per document — the perplexity proxy
    used as a corpus-level quality signal (very negative = text unlike
    the corpus: gibberish, boilerplate, wrong language).

    Model: add-one-smoothed corpus unigram probabilities
    p(w) = (count(w)+1)/(T+V); score = Σ tf·ln p(w) / Σ tf (mean token
    log-probability). Scale shape: one explode+groupBy builds the
    per-(doc, token) frame; corpus counts aggregate from it (no second
    text pass); (T, V) is a single broadcast row; the final score is one
    more groupBy(doc). Rounded to 6 — cross-engine libm-ln noise stays
    far below the rounding grain.
    """
    base = df.where(F.col(text_col).isNotNull())
    tf = (
        base.select(
            F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
        )
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    corpus = tf.groupBy("token").agg(F.sum("tf").alias("c"))
    totals = corpus.agg(
        F.sum("c").alias("t_total"), F.count(F.lit(1)).alias("v")
    )
    logp = F.log((F.col("c") + 1.0) / (F.col("t_total") + F.col("v")))
    return (
        tf.join(corpus, "token")
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            F.round(F.sum(F.col("tf") * logp) / F.sum("tf"), 6).alias(
                "lm_logprob"
            ),
        )
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 ranked retrieval (Robertson–Spärck Jones; the Okapi
    formula): top-``k`` docs for a bag of query terms, scored

        Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))

    with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)). The IR-depth
    complement to ``tfidf_top_terms`` (which characterizes docs;
    this RANKS them for a query) — the retrieval half of a RAG-style
    corpus pipeline.

    Plan shape: token lengths ride along from the same projection that
    explodes tokens (no second doc-table join); the explode is
    immediately filtered to the query's terms, so everything after the
    scan is bounded by docs-containing-a-term, not corpus tokens; the
    (term, df) table is |query| rows, broadcast; corpus N/avgdl is a
    single-row broadcast crossJoin (the established scalar pattern);
    the final ranking is TakeOrderedAndProject. Per-term weights are
    rounded before the sum and the summed score re-rounded, so
    libm-vs-JVM ln noise and addition order cannot flip the ranking
    (the tfidf_top_terms parity recipe).
    """
    if not query_terms:
        raise ValueError("bm25_topk: query_terms must be non-empty")
    terms = sorted(set(query_terms))
    base = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    )
    corpus = base.select(
        F.col(id_col), F.size("__toks").alias("__dl"), F.col("__toks")
    )
    stats = corpus.agg(
        F.count(F.lit(1)).alias("__n_docs"),
        F.avg("__dl").alias("__avgdl"),
    )
    tf = (
        corpus.select(
            id_col, "__dl", F.explode("__toks").alias("token")
        )
        .where(F.col("token").isin(terms))
        .groupBy(id_col, "__dl", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(
        F.count(F.lit(1)).alias("__df")
    )
    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "__idf",
            F.log(
                F.lit(1.0)
                + (F.col("__n_docs") - F.col("__df") + 0.5)
                / (F.col("__df") + 0.5)
            ),
        )
        .withColumn(
            "__w",
            F.round(
                F.col("__idf")
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1
                    * (
                        1.0
                        - b
                        + b * F.col("__dl") / F.col("__avgdl")
                    )
                ),
                6,
            ),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.round(F.sum("__w"), 6).alias("bm25"),
            F.count(F.lit(1)).alias("n_terms_matched"),
        )
        .orderBy(F.desc("bm25"), F.col(id_col))
        .limit(k)
    )


def bm25_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    terms: tuple = (),
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    tok_cte: str | None = None,
) -> str:
    """DuckDB replay of ``bm25_topk`` as one parameterized builder —
    the single source for every BM25 oracle (bm25_search, the RRF
    hybrid, the RAG chain), so the formula constants and the round-6
    parity recipe can never drift between copies. ``tok_cte`` names an
    EXISTING outer CTE yielding (id_col, token) to skip the
    tokenization stage (the RAG chain tokenizes chunks once and shares
    the frame)."""
    if not terms:
        raise ValueError("bm25_sql: terms must be non-empty")
    terms = tuple(sorted(set(terms)))
    # Build the IN list explicitly: Python tuple repr would emit a
    # trailing comma for a single term (invalid SQL) and repr-quote
    # embedded quotes in a non-SQL way.
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    tok_src = (
        tok_cte
        if tok_cte
        else f"""(
  SELECT {id_col},
         unnest(string_split(trim(regexp_replace(lower({text_col}), '\\s+', ' ', 'g')), ' ')) AS token
  FROM {table} WHERE {text_col} IS NOT NULL
)"""
    )
    return f"""
WITH tok_b AS (SELECT {id_col}, token FROM {tok_src}),
dl AS (SELECT {id_col}, count(*) AS dl FROM tok_b GROUP BY {id_col}),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT t.{id_col}, d.dl, t.token, count(*) AS tf
  FROM tok_b t JOIN dl d USING ({id_col})
  WHERE t.token IN ({in_list})
  GROUP BY 1, 2, 3
),
dfq AS (SELECT token, count(*) AS dfc FROM tf GROUP BY token),
w AS (
  SELECT tf.{id_col},
         round(
           ln(1.0 + (n_docs - dfc + 0.5) / (dfc + 0.5))
           * (tf * ({k1} + 1.0))
           / (tf + {k1} * ({(1.0 - b)!r} + {b} * dl / avgdl)),
           6
         ) AS w
  FROM tf JOIN dfq USING (token) CROSS JOIN stats
)
SELECT {id_col}, round(sum(w), 6) AS bm25,
       CAST(count(*) AS BIGINT) AS n_terms_matched
FROM w GROUP BY {id_col}
ORDER BY bm25 DESC, {id_col} LIMIT {k}
"""
