"""Round-13 registry extensions — the curation pipeline's FRONT END
and the gates around it:

* HTML extraction (parse → boilerplate gates → clean text) +
  ``curation_pipeline_v3``, and the streaming twin
  ``stream_curation_sink`` (the stateless chain through the native
  txnlog sink);
* a real matrix-multiply model through the encoder slot
  (``rag_embed_mlp``), HLL register partials through the native sink
  (``stream_hll_sink``), the generalized stupid-backoff ladder at
  order 5 (``lm_perplexity_5gram``);
* the Gopher repetition gates (``gopher_repetition``), C4 corpus-wide
  line dedup (``line_dedup_extracted``), the per-doc char-entropy
  gibberish gate (``char_entropy_gate``), Luhn-validated card
  scrubbing (``pii_credit_cards``), NFC canonical dedup
  (``dedup_exact_nfc``), and the full composition
  ``curation_pipeline_v4``.

Oracle strategy for the extraction family (the ``detokenize_real``
trick): the corpus is RENDERED from ``documents.text`` through a
deterministic template, so DuckDB predicts every block arithmetically
and replays the gates — the stdlib parser must land on the prediction
exactly. See ``operators/html_extract.py`` for the scale posture
(map-only parse, zero-shuffle Catalyst gates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.html_extract import (
    boilerplate_keep_sql,
    demo_blocks_sql,
    html_extract_blocks,
    html_extract_text,
    render_demo_html,
)
from .registry import register
from .registry_ext12 import _t


def _rendered(spark: SparkSession, sf_dir: str) -> DataFrame:
    # documents.parquet at test SFs is one row-group → one input split,
    # so without an explicit scatter EVERY downstream Arrow pass
    # (HTML parse, BPE, repetition explodes) runs serial — profiled
    # 1-task stages end to end at sf0.1 (r14). Repartitioning the raw
    # doc rows (~2 MB here; one cheap round-robin exchange) pins the
    # extraction chain's parallelism to the CLUSTER, not the incoming
    # file layout — the standard scatter-before-expensive-map pattern.
    # At 100 TB the scan has thousands of natural splits and AQE keeps
    # this exchange from over-splitting small inputs.
    docs = (
        _t(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .repartition(spark.sparkContext.defaultParallelism)
    )
    return docs.select(
        "doc_id",
        render_demo_html(F.col("text"), F.col("doc_id")).alias("html"),
    )


# ---------------------------------------------------------------------------
# html_extract_blocks — the raw per-block frame: 5 predicted blocks
# per doc (title / nav / h1 / p / footer) with exact collapsed text,
# char count, and link-char count. Map-only parse + narrow explode;
# the oracle is pure arithmetic over documents.
# ---------------------------------------------------------------------------


@register(
    "html_extract_blocks",
    f"""
WITH blocks AS ({demo_blocks_sql()})
SELECT doc_id, CAST(block_idx AS INT) AS block_idx, tag, text,
       n_chars, n_link_chars
FROM blocks
""",
)
def q_html_extract_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return html_extract_blocks(_rendered(spark, sf_dir))


# ---------------------------------------------------------------------------
# html_extract_text — gated extraction: structural-role tags
# (nav/footer/aside/header) and high-link-density / short blocks
# dropped in a Catalyst array filter, survivors joined with newline
# block boundaries. Zero shuffles end-to-end. The oracle replays the
# same integer gates over the predicted blocks, so a drift in EITHER
# the parser counts or the gate arithmetic moves rows.
# ---------------------------------------------------------------------------


@register(
    "html_extract_text",
    f"""
WITH blocks AS ({demo_blocks_sql()}),
kept AS (SELECT * FROM blocks WHERE {boilerplate_keep_sql()}),
agg AS (
  SELECT doc_id,
         string_agg(text, chr(10) ORDER BY block_idx) AS extracted,
         count(*) AS k
  FROM kept GROUP BY doc_id
),
raw AS (SELECT doc_id, count(*) AS r FROM blocks GROUP BY doc_id)
SELECT raw.doc_id,
       coalesce(agg.extracted, '') AS extracted,
       CAST(raw.r AS INT) AS n_blocks_raw,
       CAST(coalesce(agg.k, 0) AS INT) AS n_blocks_kept
FROM raw LEFT JOIN agg USING (doc_id)
""",
)
def q_html_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    return html_extract_text(_rendered(spark, sf_dir))


# ---------------------------------------------------------------------------
# curation_pipeline_v3 — the v2 composition with the missing FRONT
# END: render → extract+boilerplate-gate → Gopher quality gates →
# exact content dedup → real-vocab token budget. One hashed summary
# row carries every stage's survivor count; the extraction handoff
# frame (extracted == the doc's clean text for every surviving page)
# is itself differentially pinned by the upstream stages.
# ---------------------------------------------------------------------------


def _quality_gate_ctes(src: str) -> str:
    """The Gopher quality-gate replay over a CTE ``src`` yielding
    (doc_id, text): emits the ``qg_base``/``qg_c`` CTE bodies whose
    columns the ``_QG_KEEP`` predicate consumes. The ONE source for
    every composed oracle in this file (v3 / streaming / v4) — a
    threshold or rounding change can no longer desynchronize them
    (review r13; previously copy-pasted three times)."""
    from .registry_ext import _EN_STOP, _NORM_SQL, _TOKENS_SQL

    return f"""qg_base AS (
  SELECT doc_id, {_NORM_SQL} AS norm, {_TOKENS_SQL} AS tk FROM {src}
),
qg_c AS (
  SELECT doc_id,
         CAST(len(tk) AS DOUBLE) AS nt,
         round(CAST(len(list_filter(tk, t -> t IN ({_EN_STOP}))) AS DOUBLE)
               / CAST(len(tk) AS DOUBLE), 6) AS stop_r,
         round(CAST(length(regexp_replace(norm, '[^a-z]', '', 'g')) AS DOUBLE)
               / CAST(length(norm) AS DOUBLE), 6) AS alpha_r,
         round((CAST(length(norm) AS DOUBLE) - (len(tk) - 1)) / len(tk), 6)
           AS mtl
  FROM qg_base
)"""


#: Admission predicate over qg_c's columns — the quality_filter CASE
#: (first failed rule rejects), shared by all three composed oracles.
_QG_KEEP = """CASE WHEN nt < 5 THEN 'r'
             WHEN stop_r < 0.05 THEN 'r'
             WHEN alpha_r < 0.6 THEN 'r'
             WHEN mtl > 12.0 THEN 'r'
             ELSE '' END = ''"""


def _curation_v3_sql() -> str:
    from ..operators.bpe_vocab import byte_vocab_count_sql
    from .registry_ext import _NORM_SQL

    counts = byte_vocab_count_sql(
        "SELECT e.doc_id, e.text FROM ext e JOIN q3 USING (doc_id)"
    )
    return f"""
WITH blocks AS ({demo_blocks_sql()}),
kept AS (SELECT * FROM blocks WHERE {boilerplate_keep_sql()}),
ext AS (
  SELECT doc_id, string_agg(text, chr(10) ORDER BY block_idx) AS text
  FROM kept GROUP BY doc_id
),
{_quality_gate_ctes("ext")},
q1 AS (
  SELECT e.doc_id, e.text
  FROM ext e JOIN qg_c USING (doc_id)
  WHERE {_QG_KEEP}
),
q3 AS (SELECT min(doc_id) AS doc_id FROM q1 GROUP BY md5({_NORM_SQL})),
counts AS ({counts})
SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents
        WHERE text IS NOT NULL) AS n_input,
       (SELECT CAST(count(*) AS BIGINT) FROM blocks) AS n_blocks_total,
       (SELECT CAST(count(*) AS BIGINT) FROM q1) AS n_after_quality,
       (SELECT CAST(count(*) AS BIGINT) FROM q3) AS n_final,
       (SELECT CAST(sum(n_tokens_exact) AS BIGINT) FROM counts)
         AS total_tokens_real
"""


@register("curation_pipeline_v3", _curation_v3_sql())
def q_curation_pipeline_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe_vocab import (
        GPT2_SPLIT_PATTERN_PORTABLE,
        bpe_token_count_bytes,
    )
    from ..operators.text import normalize_text, quality_filter

    ext = html_extract_text(_rendered(spark, sf_dir)).select(
        "doc_id", F.col("extracted").alias("text"), "n_blocks_raw"
    )
    qf = quality_filter(ext)
    q1 = ext.select("doc_id", "text").join(
        qf.where(F.col("keep")).select("doc_id"), "doc_id"
    )
    q3 = q1.groupBy(F.md5(normalize_text(F.col("text")))).agg(
        F.min("doc_id").alias("doc_id")
    )
    final = q3.select("doc_id").join(q1, "doc_id")
    counts = bpe_token_count_bytes(
        final.select("doc_id", "text"), pattern=GPT2_SPLIT_PATTERN_PORTABLE
    )
    n_input = _t(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_input"))
    n_blocks = ext.agg(
        F.sum("n_blocks_raw").cast("bigint").alias("n_blocks_total")
    )
    n_q1 = q1.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_after_quality")
    )
    n_q3 = q3.agg(F.count(F.lit(1)).cast("bigint").alias("n_final"))
    budget = counts.agg(
        F.sum("n_tokens_exact").cast("bigint").alias("total_tokens_real")
    )
    return (
        n_input.crossJoin(F.broadcast(n_blocks))
        .crossJoin(F.broadcast(n_q1))
        .crossJoin(F.broadcast(n_q3))
        .crossJoin(F.broadcast(budget))
    )


# ---------------------------------------------------------------------------
# rag_embed_mlp — a REAL (matrix-multiply) model through the encoder
# slot: the pinned-weight 2-layer numpy MLP (operators/mlp_encoder.py)
# runs through embed_map_in_pandas(dtype="double") exactly as a
# torch/onnx encoder would. Dyadic weights over integer inputs make
# every output an EXACT multiple of 1/16, so the Pandas slot, the
# pure-Catalyst matmul replay (pinned in tests), and this DuckDB
# list_dot_product replay must agree bit-for-bit with no rounding —
# the differential now checks a genuine two-layer model end to end,
# not just the hash embedder. Map-only plan.
# ---------------------------------------------------------------------------


def _rag_embed_mlp_sql() -> str:
    from ..operators.mlp_encoder import mlp_sql
    from ..operators.similarity import feature_hash_sums_sql

    return f"""
WITH ftok AS (
  SELECT doc_id AS cid,
         unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS token
  FROM documents WHERE text IS NOT NULL
),
emb AS ({feature_hash_sums_sql()}),
mlp AS ({mlp_sql("emb")})
SELECT cid AS doc_id,
       CAST(generate_subscripts(out, 1) AS INT) AS idx,
       CAST(unnest(out) AS DOUBLE) AS val
FROM mlp
"""


@register("rag_embed_mlp", _rag_embed_mlp_sql())
def q_rag_embed_mlp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mlp_encoder import embed_mlp

    docs = _t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    return (
        embed_mlp(docs)
        .select("doc_id", F.posexplode("embedding").alias("idx0", "val"))
        .select(
            "doc_id",
            (F.col("idx0") + 1).cast("int").alias("idx"),
            F.col("val").alias("val"),
        )
    )


# ---------------------------------------------------------------------------
# stream_hll_sink — the r12 verdict's symmetry gap closed: the SAME
# streaming HLL maintenance as stream_hll_ingest, but the register
# partials flow through the NATIVE writeStream.format("txnlog") sink
# (exactly-once keyed sinkId:batchId) instead of the library
# TxnTable.append in foreachBatch. A streaming groupBy is stateful
# (update mode — refused by a DSv2 append sink), so the partials are
# the map-side combine made explicit (hll_stream_partials): Catalyst
# row-level (bucket, rho) + a stateless per-partition running max —
# the ingest path never shuffles AT ALL, and appended partials
# max-merge at read time to exactly the one-shot registers. Shares
# stream_hll_ingest's verbatim one-shot oracle, so sink-path commits
# that dropped, truncated, or double-applied a batch break the hash.
# ---------------------------------------------------------------------------


@register("stream_hll_sink", None)
def q_stream_hll_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import (
        hll_estimate,
        hll_merge,
        hll_stream_partials,
    )
    from ..sources.txnlog import TxnTable
    from ..sources.txnlog_datasource import register_txnlog_source
    from .phases import timed_phase
    from .registry import drain_stream
    from .registry_ext18 import _make_user_id_drops

    ev = _t(spark, sf_dir, "events")
    register_txnlog_source(spark)
    with timed_phase("stream_hll_sink.build"):
        base = _make_user_id_drops(spark, sf_dir, "hllsink")
        from pyspark.sql import types as T

        schema = T.StructType([T.StructField("user_id", T.LongType())])
        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{base}/drops")
        )
        q = (
            hll_stream_partials(sdf, "user_id")
            .writeStream.format("txnlog")
            .option("path", f"{base}/regs")
            .option("checkpointLocation", f"{base}/ckpt")
            .option("sinkId", "hllsink")
            .trigger(availableNow=True)
            .start()
        )
        drain_stream(q)
    table = TxnTable(spark, f"{base}/regs")
    est = hll_estimate(hll_merge(table.scan().select("bucket", "rho")))
    exact = ev.agg(F.countDistinct("user_id").alias("n_exact"))
    return est.crossJoin(F.broadcast(exact)).select(
        "n_buckets_used",
        "hll_estimate",
        F.col("n_exact").cast("bigint").alias("n_exact"),
        F.round(
            F.abs(F.col("hll_estimate") - F.col("n_exact"))
            / F.col("n_exact"),
            4,
        ).alias("rel_err"),
    )


def _install_stream_hll_sink_oracle() -> None:
    from .registry import _ORACLES
    from .registry_ext18 import _hll_users_sql

    _ORACLES["stream_hll_sink"] = _hll_users_sql()


_install_stream_hll_sink_oracle()


# ---------------------------------------------------------------------------
# lm_perplexity_5gram — the generalized stupid-backoff chain at the
# order Brants et al. 2007 actually ran (r12 verdict #5): the bigram
# and trigram queries are now instances of ngram_lm_scores (their
# oracles unchanged — instance equality is re-proven by their own
# diffcheck), and this query exercises the 5-level ladder
# (5→4→3→2→add-one-unigram) with every per-order usage count in the
# hashed rows, so each backoff level genuinely firing is itself
# oracled.
# ---------------------------------------------------------------------------


def _lm_5gram_sql() -> str:
    from ..operators.selection import ngram_lm_sql

    return ngram_lm_sql(order=5)


@register("lm_perplexity_5gram", _lm_5gram_sql())
def q_lm_perplexity_5gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.selection import ngram_lm_scores

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return ngram_lm_scores(
        docs.where(F.col("doc_id") % 2 == 0),
        docs.where(F.col("doc_id") % 2 == 1),
        order=5,
    )


# ---------------------------------------------------------------------------
# stream_curation_sink — the curation FRONT END as a STREAMING ingest:
# HTML pages drop as files → html_extract_text (the parse is a
# stateless mapInArrow and the gates are array lambdas, so the whole
# extraction chain runs in append mode unchanged) → the Gopher
# admission rule as one stateless predicate (quality_keep_col — the
# (id, keep) join of the batch composition would be a stateful
# stream-stream join) → exactly-once into the native txnlog sink.
# The table then IS the curated corpus. Oracle = the batch prediction
# over the full rendered corpus (blocks → gates → reassembly →
# quality replay), so a stream that dropped, double-applied, or
# reordered any page's blocks breaks the hash — and streaming
# admission is pinned bit-equal to batch admission.
# ---------------------------------------------------------------------------


def _stream_curation_sql() -> str:
    return f"""
WITH blocks AS ({demo_blocks_sql()}),
kept AS (SELECT * FROM blocks WHERE {boilerplate_keep_sql()}),
ext AS (
  SELECT doc_id, string_agg(text, chr(10) ORDER BY block_idx) AS text
  FROM kept GROUP BY doc_id
),
{_quality_gate_ctes("ext")}
SELECT e.doc_id, e.text
FROM ext e JOIN qg_c USING (doc_id)
WHERE {_QG_KEEP}
"""


@register("stream_curation_sink", _stream_curation_sql())
def q_stream_curation_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import quality_keep_col
    from ..sources.txnlog import TxnTable
    from ..sources.txnlog_datasource import register_txnlog_source
    from .phases import timed_phase
    from .registry import drain_stream
    from .registry_ext12 import _tmp_table_path
    from .registry_ext18 import write_drop_files_one_pass

    register_txnlog_source(spark)
    with timed_phase("stream_curation_sink.build"):
        base = _tmp_table_path(sf_dir, "curastream")
        drops = f"{base}/drops"
        pages = _rendered(spark, sf_dir)
        write_drop_files_one_pass(pages, F.col("doc_id") % 3, 3, drops)
        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("html", T.StringType()),
            ]
        )
        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(drops)
        )
        curated = (
            html_extract_text(sdf)
            .select("doc_id", F.col("extracted").alias("text"))
            .where(quality_keep_col())
        )
        q = (
            curated.writeStream.format("txnlog")
            .option("path", f"{base}/tbl")
            .option("checkpointLocation", f"{base}/ckpt")
            .option("sinkId", "curation")
            .trigger(availableNow=True)
            .start()
        )
        drain_stream(q)
    return TxnTable(spark, f"{base}/tbl").scan().select("doc_id", "text")


# ---------------------------------------------------------------------------
# gopher_repetition — the REPETITION half of the Gopher quality suite
# (Rae et al. 2021 Table A1), completing quality_filter's length/
# stopword/alpha gates: duplicate-line fractions (array-only, zero
# shuffle), top-{2,3,4}-gram character fractions (one explode +
# (doc, gram) count each), and duplicate-5-gram POSITION-COVERAGE
# character fraction (overlap-safe union of covered token positions).
# Three planted pathological docs (a top-gram spam page, a repeated
# 5-gram page, a duplicated-lines page) ride along with real ids
# >= 10^6 so every reject branch provably fires inside the hashed
# result; thresholds compare the same rounded doubles on both
# engines.
# ---------------------------------------------------------------------------

_REP_PLANTED = [
    (1_000_001, "spam spam spam spam spam spam spam spam"),
    (1_000_002, "a b c d e a b c d e a b c d e"),
    (1_000_003, "good line\ngood line\nunique tail line"),
]


def _gopher_repetition_sql() -> str:
    from ..operators.repetition import repetition_sql

    planted = ", ".join(
        "({}, '{}')".format(i, t.replace("\n", "' || chr(10) || '"))
        for i, t in _REP_PLANTED
    )
    return repetition_sql(
        f"""SELECT doc_id, text FROM documents
UNION ALL SELECT * FROM (VALUES {planted}) AS pl(doc_id, text)"""
    )


@register("gopher_repetition", _gopher_repetition_sql())
def q_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.repetition import gopher_repetition_filter

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = spark.createDataFrame(
        _REP_PLANTED, "doc_id long, text string"
    )
    return gopher_repetition_filter(docs.unionByName(planted))


# ---------------------------------------------------------------------------
# line_dedup_extracted — C4-style corpus-wide line dedup over the
# UNGATED extracted pages: the nav bar line repeats on every page, so
# the statistical dedup (first occurrence survives corpus-wide)
# strips exactly the boilerplate the tag/link-density gates catch
# structurally — two independent mechanisms, one predicted result.
# The oracle replays global first-occurrence (row_number over the
# line text ordered by (doc_id, pos)) against Spark's md5-digest
# struct-min — equivalent keys to 2^-128.
# ---------------------------------------------------------------------------


@register(
    "line_dedup_extracted",
    f"""
WITH blocks AS ({demo_blocks_sql()}),
lines AS (SELECT doc_id, block_idx + 1 AS pos, text AS line FROM blocks),
kept AS (
  SELECT doc_id, pos, line FROM (
    SELECT *, row_number() OVER (
      PARTITION BY line ORDER BY doc_id, pos
    ) AS rn FROM lines
  ) WHERE rn = 1
),
rebuilt AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text_deduped,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
),
base AS (SELECT doc_id, count(*) AS n_lines FROM blocks GROUP BY doc_id)
SELECT b.doc_id,
       coalesce(r.text_deduped, '') AS text_deduped,
       CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_lines_kept,
       CAST(b.n_lines - coalesce(r.n_kept, 0) AS BIGINT)
         AS n_lines_removed
FROM base b LEFT JOIN rebuilt r USING (doc_id)
""",
)
def q_line_dedup_extracted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import line_dedup_corpus

    # ungated extraction: every block becomes a line (min_chars=0,
    # no structural drops, link gate vacuous at num=den=1)
    pages = html_extract_text(
        _rendered(spark, sf_dir),
        min_chars=0,
        link_density_num=1,
        link_density_den=1,
        drop_tags=(),
    ).select("doc_id", F.col("extracted").alias("text"))
    return line_dedup_corpus(pages)


# ---------------------------------------------------------------------------
# curation_pipeline_v4 — ALL the r13 stages composed as one curation
# run, the full modern web-pipeline shape (RefinedWeb/Gopher order):
# render → extract + structural boilerplate gates → corpus-wide line
# dedup (collapses exact-duplicate pages to their first copy — the C4
# line pass subsumes exact content dedup at this grain) → Gopher
# length/stopword/alpha gates → Gopher REPETITION gates → real-vocab
# token budget. One hashed summary row carries every stage's survivor
# count, so any stage OR any handoff frame drifting moves the row;
# each stage is an independently-oracled operator.
# ---------------------------------------------------------------------------


def _curation_v4_sql() -> str:
    from ..operators.bpe_vocab import byte_vocab_count_sql
    from ..operators.repetition import repetition_sql

    rep = repetition_sql("SELECT doc_id, text FROM q1")
    counts = byte_vocab_count_sql(
        "SELECT q1.doc_id, q1.text FROM q1 JOIN q2 USING (doc_id)"
    )
    return f"""
WITH blocks AS ({demo_blocks_sql()}),
kept AS (SELECT * FROM blocks WHERE {boilerplate_keep_sql()}),
ext AS (
  SELECT doc_id, string_agg(text, chr(10) ORDER BY block_idx) AS text
  FROM kept GROUP BY doc_id
),
exlines AS (
  SELECT doc_id,
         CAST(generate_subscripts(ls, 1) AS INT) AS pos,
         unnest(ls) AS line
  FROM (
    SELECT doc_id,
           list_filter(list_transform(string_split(text, chr(10)),
                                      x -> trim(x, ' ')),
                       x -> x <> '') AS ls
    FROM ext
  )
),
ldkept AS (
  SELECT doc_id, pos, line FROM (
    SELECT *, row_number() OVER (
      PARTITION BY line ORDER BY doc_id, pos
    ) AS rn FROM exlines
  ) WHERE rn = 1
),
ld AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
  FROM ldkept GROUP BY doc_id
),
{_quality_gate_ctes("ld")},
q1 AS (
  SELECT l.doc_id, l.text
  FROM ld l JOIN qg_c USING (doc_id)
  WHERE {_QG_KEEP}
),
q2 AS (SELECT doc_id FROM ({rep}) WHERE keep),
counts AS ({counts})
SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents
        WHERE text IS NOT NULL) AS n_input,
       (SELECT CAST(count(*) AS BIGINT) FROM kept) AS n_blocks_kept,
       (SELECT CAST(count(*) AS BIGINT) FROM ld) AS n_after_linededup,
       (SELECT CAST(count(*) AS BIGINT) FROM q1) AS n_after_quality,
       (SELECT CAST(count(*) AS BIGINT) FROM q2) AS n_after_repetition,
       (SELECT CAST(sum(n_tokens_exact) AS BIGINT) FROM counts)
         AS total_tokens_real
"""


@register("curation_pipeline_v4", _curation_v4_sql())
def q_curation_pipeline_v4(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe_vocab import (
        GPT2_SPLIT_PATTERN_PORTABLE,
        bpe_token_count_bytes,
    )
    from ..operators.repetition import gopher_repetition_filter
    from ..operators.text import line_dedup_corpus, quality_keep_col

    # Stage handoffs are MATERIALIZED with localCheckpoint (eager) —
    # optimization r15, guide §7.3/§3.3: the six stage-count branches
    # DID share the physical work through ReusedExchange (r14's
    # finding; a persist() A/B was slower), but the LOGICAL plan still
    # replicated the whole render → extract → dedup → gate chain under
    # every branch, and the event-log profile showed the driver idle-
    # planning that seven-way tree for longer than the stages ran
    # (v5: ~12 s of a 19 s run with no stage active). Checkpointing
    # each ≤ n_docs-row handoff truncates every branch's plan to a
    # scan of the materialized frame — each operator is planned AND
    # run exactly once. At 100 TB the same frames are the pipeline's
    # natural stage outputs (no bigger than the exchanges already
    # shuffled); fault-tolerance of the intermediate is not needed
    # inside one query.
    ext = (
        html_extract_text(_rendered(spark, sf_dir))
        .select(
            "doc_id",
            F.col("extracted").alias("text"),
            F.col("n_blocks_kept"),
        )
        .localCheckpoint(eager=True)
    )
    ld = (
        line_dedup_corpus(ext.where(F.col("n_blocks_kept") > 0))
        .where(F.col("n_lines_kept") > 0)
        .select("doc_id", F.col("text_deduped").alias("text"))
        .localCheckpoint(eager=True)
    )
    q1 = ld.where(quality_keep_col()).localCheckpoint(eager=True)
    q2 = q1.join(
        gopher_repetition_filter(q1)
        .where(F.col("keep"))
        .select("doc_id"),
        "doc_id",
    ).localCheckpoint(eager=True)
    counts = bpe_token_count_bytes(
        q2.select("doc_id", "text"), pattern=GPT2_SPLIT_PATTERN_PORTABLE
    )
    n_input = _t(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_input"))
    n_blocks = ext.agg(
        F.sum("n_blocks_kept").cast("bigint").alias("n_blocks_kept")
    )
    n_ld = ld.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_after_linededup")
    )
    n_q1 = q1.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_after_quality")
    )
    n_q2 = q2.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_after_repetition")
    )
    budget = counts.agg(
        F.sum("n_tokens_exact").cast("bigint").alias("total_tokens_real")
    )
    return (
        n_input.crossJoin(F.broadcast(n_blocks))
        .crossJoin(F.broadcast(n_ld))
        .crossJoin(F.broadcast(n_q1))
        .crossJoin(F.broadcast(n_q2))
        .crossJoin(F.broadcast(budget))
    )


# ---------------------------------------------------------------------------
# pii_credit_cards — checksum-validated payment-card scrubbing: the
# Luhn fold (exact integer arithmetic, identical on both engines)
# separates real card numbers from thirteen arbitrary digits, which
# shape-only PII regexes cannot. Planted docs carry a valid Visa
# test number (plain and separator-formatted), a one-digit-off
# invalid twin, a valid 15-digit Amex, a 13-digit non-card, and a
# digits-too-short line — so candidate-vs-valid splits and the
# redaction are all provably exercised inside the hashed result;
# real documents contribute the zero mass.
# ---------------------------------------------------------------------------

_CC_PLANTED = [
    (2_000_001, "pay 4111111111111111 today"),
    (2_000_002, "card 4111 1111 1111 1111 on file"),
    (2_000_003, "typo 4111111111111112 rejected"),
    (2_000_004, "amex 378282246310005 works"),
    (2_000_005, "order 1234567890123 is not a card"),
    (2_000_006, "short 12345 number"),
]


def _cc_sql() -> str:
    from ..operators.text import credit_card_sql

    planted = ", ".join(
        f"({i}, '{t}')" for i, t in _CC_PLANTED
    )
    return credit_card_sql(
        f"""SELECT doc_id, text FROM documents
UNION ALL SELECT * FROM (VALUES {planted}) AS pl(doc_id, text)"""
    )


@register("pii_credit_cards", _cc_sql())
def q_pii_credit_cards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import credit_card_scan

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = spark.createDataFrame(
        _CC_PLANTED, "doc_id long, text string"
    )
    return credit_card_scan(docs.unionByName(planted))


# ---------------------------------------------------------------------------
# dedup_exact_nfc — exact dedup with Unicode NFC canonicalization
# first (operators/unicode_norm.py): composed/decomposed twins and
# singleton mappings (U+212B ANGSTROM SIGN vs U+00C5) are the same
# text to every consumer but different BYTES, so byte-level md5 dedup
# keeps both copies. The differential is genuine two-implementation
# checking: Spark-side Python unicodedata (UAX #15) vs DuckDB's own
# independent nfc_normalize must agree on every row. Planted twin
# pairs collapse inside the hashed result (min-id winner, n_copies=2);
# the NFC-invariant ligature row pins NFC != NFKC.
# ---------------------------------------------------------------------------

_NFC_PLANTED = [
    (3_000_001, "caf\u00e9 composed form"),
    (3_000_002, "cafe\u0301 composed form"),  # decomposed twin
    (3_000_003, "\u212bngstrom unit sign"),  # ANGSTROM SIGN
    (3_000_004, "\u00c5ngstrom unit sign"),  # precomposed twin
    (3_000_005, "\ufb01nance ligature stays"),  # NFC-invariant
]


def _nfc_sql() -> str:
    from ..operators.unicode_norm import exact_dedup_nfc_sql

    planted = ", ".join(
        "({}, '{}')".format(i, t.replace("'", "''"))
        for i, t in _NFC_PLANTED
    )
    return exact_dedup_nfc_sql(
        "SELECT doc_id, text FROM documents UNION ALL "
        f"SELECT * FROM (VALUES {planted}) AS pl(doc_id, text)"
    )


@register("dedup_exact_nfc", _nfc_sql())
def q_dedup_exact_nfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.unicode_norm import exact_dedup_nfc

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = spark.createDataFrame(
        _NFC_PLANTED, "doc_id long, text string"
    )
    return exact_dedup_nfc(docs.unionByName(planted))


# ---------------------------------------------------------------------------
# char_entropy_gate — per-doc character-level Shannon entropy (bits)
# as the gibberish/degenerate-content gate beside the repetition
# fractions: repeated-character runs score ~0 bits, random-looking
# hex blobs score high, natural text sits ~4. Per-character
# −p·log2(p) terms ride as exact rounded integers (order-free sums,
# the lm_scores recipe). Planted docs pin a near-0-bit run, a 1-bit
# alternation, and a high-entropy blob inside the hashed result.
# ---------------------------------------------------------------------------

_ENT_PLANTED = [
    (4_000_001, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),  # ~0 bits
    (4_000_002, "abababababababababababababababab"),  # 1 bit
    (4_000_003, "9f8e7d6c5b4a39281706f5e4d3c2b1a0"),  # hex blob ~4
]


def _char_entropy_sql() -> str:
    from ..operators.repetition import char_entropy_sql

    planted = ", ".join(f"({i}, '{t}')" for i, t in _ENT_PLANTED)
    return char_entropy_sql(
        "SELECT doc_id, text FROM documents UNION ALL "
        f"SELECT * FROM (VALUES {planted}) AS pl(doc_id, text)"
    )


@register("char_entropy_gate", _char_entropy_sql())
def q_char_entropy_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.repetition import char_entropy

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = spark.createDataFrame(
        _ENT_PLANTED, "doc_id long, text string"
    )
    return char_entropy(docs.unionByName(planted))


# ---------------------------------------------------------------------------
# contamination_bloom — decontamination through the portable BLOOM
# sketch (operators/sketch.py): when the eval set outgrows a raw
# shingle broadcast, broadcast its FIXED-SIZE bitmap instead
# (≤ m_words rows at ANY eval size) and gate membership through it.
# One-sided error means the gate can never MISS contamination; the
# per-doc exact hit count rides alongside the bloom hit count in the
# hashed rows, so the (deterministic, md5-derived) false-positive
# behavior is itself oracled — n_bloom >= n_exact row by row, both
# engines reproducing the identical bitmap and FP set bit for bit.
# ---------------------------------------------------------------------------


def _contamination_bloom_sql() -> str:
    from ..operators.sketch import bloom_probe_sql, bloom_sql
    from .registry_ext import _SHINGLE_HASH_CTE

    regs = bloom_sql(
        "SELECT DISTINCT CAST(h AS VARCHAR) AS v FROM sh"
        " WHERE doc_id % 97 = 0"
    )
    probe = bloom_probe_sql(
        "SELECT doc_id, CAST(h AS VARCHAR) AS v FROM sh",
        "SELECT * FROM regs",
        "doc_id",
    )
    return (
        _SHINGLE_HASH_CTE
        + f""",
regs AS ({regs}),
probe AS ({probe}),
evals AS (SELECT DISTINCT h FROM sh WHERE doc_id % 97 = 0),
exact AS (
  SELECT s.doc_id, count(*) AS n_exact_hits
  FROM sh s JOIN evals e USING (h) GROUP BY 1
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1)
SELECT p.doc_id,
       CAST(z.n_sh AS BIGINT) AS n_sh,
       p.n_bloom_hits,
       CAST(coalesce(e.n_exact_hits, 0) AS BIGINT) AS n_exact_hits
FROM probe p
JOIN sizes z USING (doc_id)
LEFT JOIN exact e USING (doc_id)
WHERE p.n_bloom_hits >= 5
"""
    )


@register("contamination_bloom", _contamination_bloom_sql())
def q_contamination_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import bloom_probe_counts, bloom_registers
    from ..operators.text import shingle_hashes

    docs = _t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    sh = docs.select(
        "doc_id",
        F.explode(shingle_hashes(F.col("text"), 3)).alias("h"),
    )
    # ONE corpus pass instead of four (optimization r15, guide §1.2):
    # evals, the bloom probe, the exact twin, and the per-doc sizes
    # each re-derived the full tokenize + shingle explode. Compact the
    # explode once into (doc_id, h, n_occ) — one exchange over 16-byte
    # keys — materialize it (a few MB of longs per million shingles),
    # and derive all four from that frame: occurrence counts are
    # preserved through n_occ, distinctness through the group key, so
    # every output value is unchanged.
    sh2 = (
        sh.groupBy("doc_id", "h")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .localCheckpoint(eager=True)
    )
    evals = sh2.where(F.col("doc_id") % 97 == 0).select("h").distinct()
    regs = bloom_registers(evals, "h")
    probe = bloom_probe_counts(sh2, regs, "h", ["doc_id"])
    exact = (
        sh2.join(F.broadcast(evals), "h")
        .groupBy("doc_id")
        .agg(F.sum("n_occ").cast("bigint").alias("n_exact_hits"))
    )
    sizes = sh2.groupBy("doc_id").agg(
        F.sum("n_occ").cast("bigint").alias("n_sh")
    )
    return (
        probe.where(F.col("n_bloom_hits") >= 5)
        .join(sizes, "doc_id")
        .join(exact, "doc_id", "left")
        .select(
            "doc_id",
            "n_sh",
            "n_bloom_hits",
            F.coalesce("n_exact_hits", F.lit(0))
            .cast("bigint")
            .alias("n_exact_hits"),
        )
    )


# ---------------------------------------------------------------------------
# stream_bloom_sink — the bloom membership filter MAINTAINED as a
# stream through the native sink, completing the transport symmetry
# across the idempotent sketches (HLL max / bloom OR): the map-side
# partial combine (bloom_stream_partials — Catalyst (word,bit)
# projection + stateless per-partition running OR, zero exchanges at
# ingest) lands ≤ m_words rows per partition per micro-batch
# exactly-once via writeStream.format("txnlog"); read-time OR-merge
# must equal the ONE-SHOT bitmap, which the oracle computes
# independently over the full events table — so dropped, truncated,
# or double-applied batches (harmless here, but still detected as
# no-ops) and any partial-combine drift break the hash.
# ---------------------------------------------------------------------------


def _stream_bloom_sql() -> str:
    from ..operators.sketch import bloom_sql

    return bloom_sql(
        "SELECT DISTINCT CAST(user_id AS VARCHAR) AS v FROM events"
        " WHERE user_id IS NOT NULL"
    )


@register("stream_bloom_sink", _stream_bloom_sql())
def q_stream_bloom_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import bloom_merge, bloom_stream_partials
    from ..sources.txnlog import TxnTable
    from ..sources.txnlog_datasource import register_txnlog_source
    from .phases import timed_phase
    from .registry import drain_stream
    from .registry_ext18 import _make_user_id_drops

    register_txnlog_source(spark)
    with timed_phase("stream_bloom_sink.build"):
        base = _make_user_id_drops(spark, sf_dir, "bloomsink")
        from pyspark.sql import types as T

        schema = T.StructType([T.StructField("user_id", T.LongType())])
        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{base}/drops")
        )
        q = (
            bloom_stream_partials(sdf, "user_id")
            .writeStream.format("txnlog")
            .option("path", f"{base}/regs")
            .option("checkpointLocation", f"{base}/ckpt")
            .option("sinkId", "bloomsink")
            .trigger(availableNow=True)
            .start()
        )
        drain_stream(q)
    table = TxnTable(spark, f"{base}/regs")
    return bloom_merge(table.scan().select("word_idx", "bits"))


# ---------------------------------------------------------------------------
# multimodal_resize — the north-star resize step made REAL (it was the
# one remaining stub in the multimodal family): complete PNG files
# synthesized per doc id (valid CRCs, filtered zlib scanlines — the
# multimodal_decode fixture) → real stdlib pixel decode → numpy
# nearest-neighbor resize to 8×6 → resized RGB as array<int>, with
# ALL statistics (count / mean / min / max / position-weighted
# checksum, which pins pixel ORDER — a transposed or mirrored resize
# breaks it) computed in Catalyst from the array. The oracle predicts
# every resized pixel arithmetically from the generator formula and
# the floor index mapping, so an error in the encoder, the decoder,
# OR the resize indexing breaks the hash.
# ---------------------------------------------------------------------------

_RS_W, _RS_H = 8, 6


@register(
    "multimodal_resize",
    f"""
WITH png AS (
  SELECT doc_id AS media_id, 4 + doc_id % 13 AS w, 4 + doc_id % 11 AS h
  FROM documents WHERE doc_id % 4 = 0
),
grid AS (
  SELECT media_id, w, h,
         (yy * {_RS_W} + xx) * 3 + c + 1 AS pos,
         (media_id + 11 * ((yy * h) // {_RS_H})
          + (3 * ((xx * w) // {_RS_W}) + c)) % 256 AS v
  FROM png
  CROSS JOIN generate_series(0, {_RS_H - 1}) ys(yy)
  CROSS JOIN generate_series(0, {_RS_W - 1}) xs(xx)
  CROSS JOIN generate_series(0, 2) cs(c)
)
SELECT media_id,
       CAST(w AS INT) AS src_w, CAST(h AS INT) AS src_h,
       CAST(count(*) AS BIGINT) AS n_values,
       round(CAST(sum(v) AS DOUBLE) / count(*), 6) AS mean_value,
       CAST(min(v) AS INT) AS min_value,
       CAST(max(v) AS INT) AS max_value,
       CAST(sum(v * pos) AS BIGINT) AS checksum
FROM grid GROUP BY 1, 2, 3
""",
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as _pd

    from ..operators.multimodal import (
        resize_nearest,
        synth_decodable_media_bytes,
    )

    docs = _t(spark, sf_dir, "documents").where(
        F.col("doc_id") % 4 == 0
    ).select("doc_id")

    def synth(batches):
        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "content": [
                        synth_decodable_media_bytes(int(m))
                        for m in pdf["doc_id"]
                    ],
                }
            )

    media = docs.mapInPandas(synth, "media_id long, content binary")
    out = resize_nearest(media, out_w=_RS_W, out_h=_RS_H)
    px = F.col("pixels")
    n = F.size(px)
    s = F.aggregate(px, F.lit(0).cast("bigint"), lambda a, v: a + v)
    chk = F.aggregate(
        F.zip_with(
            px,
            F.sequence(F.lit(1), n),
            lambda v, i: v.cast("bigint") * i,
        ),
        F.lit(0).cast("bigint"),
        lambda a, t: a + t,
    )
    return out.where(px.isNotNull()).select(
        "media_id",
        "src_w",
        "src_h",
        n.cast("bigint").alias("n_values"),
        F.round(s / n, 6).alias("mean_value"),
        F.array_min(px).cast("int").alias("min_value"),
        F.array_max(px).cast("int").alias("max_value"),
        chk.alias("checksum"),
    )
