"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

The FINAL stdout line is ONE compact JSON object (kept well under the
driver's 2000-char tail buffer — BENCH_r06 was unparseable because the
per-query map outgrew it):
    {"metric": "headline_total_runtime", "value": <total sec>,
     "unit": "sec", "sf": <float>, "r1_subset_total": <sec>,
     "method": "...", "n_queries": N, "n_errors": N,
     "load_avg_start": x.xx, "detail_file": "BENCH_DETAIL.json"}
Per-query timings, scale slopes, and error strings are printed on an
EARLIER stdout line and written to BENCH_DETAIL.json next to this file.

Each query is forced end-to-end with the noop sink (full computation,
no result transfer, no output I/O) so Catalyst cannot prune the measured
work the way a bare count() would.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from churn_model_evaluation_platform_spark.session import get_spark  # noqa: E402

# Representative spread across operator families (SURVEY §2): quality agg,
# drift (windowed multi-column + scalable single-column KS), metric
# reshaping + store shapes, relational core, dedup, similarity, text.
HEADLINE = [
    "monitoring_metrics_full",
    "classification_scores",
    "per_label_scores",
    "value_drift",
    "value_drift_ks",
    "drifted_columns_count",
    "metrics_unpivot",
    "latest_per_metric",
    "metric_timeseries",
    "agg_groupby_multi",
    "agg_rollup",
    "join_agg_revenue",
    "join_semi_anti",
    "topk_per_group",
    "window_running_total",
    "asof_join",
    "interval_join",
    "sessionize",
    "value_drift_scalable",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "similarity_topk",
    "similarity_topk_lsh",
    "token_count",
    "text_quality",
    "describe_stats",
    "dedup_lsh_verified",
    "roc_curve_points",
    "auc_roc",
    "confusion_matrix",
    # round-4 additions (r1_subset stays HEADLINE[:27] — apples-to-apples)
    "batch_score_pinned",
    "multimodal_decode",
    # round-5 additions: the two heaviest previously-unbenched pipeline
    # queries (judge ADVICE r4) + the r4 packing operator
    "contamination_check",
    "corpus_curation",
    "sequence_pack",
    # round-6 additions: scale-technique flagships (salting, bucketed
    # co-located join) + the window-heavy SCD2 build and retention triangle
    "skew_join_salted",
    "join_bucketed",
    "scd2_intervals",
    "cohort_retention",
    # round-6 batch-2/3 additions: the data-platform family, including
    # its three heaviest members (triangle_count is combinatorial by
    # nature; quantile_bins carries an exact single-reducer percentile
    # that the 100 TB path swaps for percentile_approx)
    "cdc_upsert",
    "bloom_filter_join",
    "pagerank",
    "asof_join_nearest",
    "quantile_bins",
    "ngram_novelty",
    "dedup_containment",
    "triangle_count",
    # round-7 addition: the pinned-quantizer IVF twin — benches the
    # third ANN variant (brute force / LSH / IVF) end to end
    "similarity_topk_ivf_pinned",
    # round-8 additions: the ANN recall audit (exact side dominates — a
    # QA-scale composed plan), the streaming-capable PSI drift panel
    # (batch twin), and the transactional metrics store end-to-end
    # (3 appends + replay + compaction + time travel, all Spark jobs)
    "similarity_ivf_recall",
    "value_drift_psi_window",
    "txnlog_metrics_store",
    # round-8 batch-2 additions: the table-format + compressed-ANN
    # capabilities — stats-pruned time-range scan over a 6-commit txn
    # table (pruning cost is driver-side log reads), the two-stage
    # PQ query (code-only ADC shortlist + broadcast-semi-join exact
    # re-rank), and the IVF-PQ composition of both ANN levers
    "txnlog_data_skipping",
    "similarity_topk_pq_rerank",
    "similarity_topk_ivfpq_pinned",
    # round-9 additions: distributed txn-table planning (Hive partition
    # layout + file-index pruning as a Spark filter), the change feed
    # out of the table, predicate-constrained ANN, and the write-time
    # PQ store (codes persisted at ingest; the query scans codes only)
    "txnlog_partition_pruning",
    "txnlog_table_changes",
    "similarity_topk_filtered",
    "similarity_topk_pq_stored",
    # the Spark-native txnlog format: pushed-filter batch scan through
    # the Python DataSource (files_scanned = scan partitions)
    "txnlog_format_scan",
    # round-10 additions: the incremental PQ index on the txn table
    # (two exactly-once code-append commits + snapshot ADC query), the
    # merge-on-read deletion-vector DELETE, and exact BPE counting (a
    # 64-merge JVM replace chain — the real-tokenizer budget path)
    "similarity_topk_pq_txn",
    "txnlog_delete_dv",
    "token_count_bpe_exact",
    # round-10 batch 2: the embedding near-dup gate on the stored index
    # (broadcast batch x IVF-blocked candidates) and merge-on-read MERGE
    "ann_dedup_gate",
    "txnlog_merge_dv",
    # round-10 batch 3: the native txnlog WRITERS — batch-writer stats
    # parity powering the same pruning, and end-to-end txnlog-to-txnlog
    # streaming replication through Spark's own sink
    "txnlog_format_write",
    "txnlog_stream_sink",
    # round-11 additions: merge-on-read UPDATE (DV addresses + updated
    # versions, one commit), the partitioned native sink (Hive fan-out
    # through df.write.format), streaming ANN ingestion end-to-end
    # (writeStream -> gate -> exactly-once code appends -> ADC query),
    # and large-vocab exact BPE (8192-entry rank table through the
    # O(1)-plan distinct-word mapInArrow path)
    "txnlog_update_dv",
    "txnlog_format_write_partitioned",
    "stream_ann_ingest",
    "token_count_bpe_large",
    # round-11 batch 2: GDPR erasure from the vector index (clone the
    # cached store, merge-on-read delete a vec-id band, query)
    "ann_delete_vectors",
    # round-11 batch 3: bloom-filter point-lookup skipping (per-file
    # blooms in the commit log prune a shuffled-key layout range
    # stats cannot), SemDeDup clustered semantic dedup (n²/C pairwise
    # bounded by the centroid count)
    "txnlog_bloom_pointlookup",
    "dedup_semantic_clustered",
    # C4-style corpus-wide exact span dedup (first occurrence survives,
    # later covered words dropped, text rebuilt)
    "span_dedup_exact",
    # zero-copy shallow clone + independent CoW delete in the clone
    "txnlog_clone_shallow",
    # generated columns as derived partition keys (derive + prune)
    "txnlog_generated_partition",
    # commit-log retention: expire the prefix behind a checkpoint
    "txnlog_expire_log",
    # round-12 additions: the REAL-SIZE released-format vocabulary
    # (50k trained merges through merges.txt parser + GPT-2 byte-level
    # pre-tokenization, distinct-word mapInArrow path), the id-stream
    # tokenize step, and the non-broadcast backfill gate
    "token_count_bpe_real",
    "tokenize_ids_real",
    "ann_dedup_gate_shuffle",
    # tokenize->detokenize identity + the real-vocab mixture budget
    "detokenize_real",
    "corpus_mix_real",
    # round-12 batch 2: the data-SELECTION stage (CCNet-style bigram-LM
    # perplexity, DSIR importance weights), hybrid lexical+dense
    # retrieval, and the per-language fertility audit under the real
    # vocabulary
    "lm_perplexity_bigram",
    "dsir_select_en",
    "dsir_sample_gumbel",
    "hybrid_topk_rrf",
    "tokenizer_fertility_real",
    # engine-portable sketches: HLL one-shot + mergeable partials,
    # count-min point frequencies
    "hll_users_estimate",
    "hll_merge_daily",
    "hll_users_by_type",
    "cms_user_freq",
    # streaming sketch maintenance through the txn table
    "stream_hll_ingest",
    # the query the register table exists for + the KMV bottom-k twin
    "hll_window_7d",
    "kmv_distinct_users",
    "cms_heavy_hitters",
    "kmv_jaccard_cohorts",
    # GPT-3-recipe token-level benchmark decontamination
    "decontaminate_bpe_13gram",
    # the selection stages composed end-to-end
    "curation_pipeline_v2",
    # full stupid-backoff chain at trigram order
    "lm_perplexity_trigram",
    # EDA distinct profile + deterministic per-group exemplars
    "hll_profile_orders",
    "sample_per_lang",
    # chunk -> hash-embed -> dense+lexical -> RRF, end to end
    "rag_hybrid_hashed",
    # additive-sketch streaming (exactly-once contrast to the HLL)
    "stream_cms_ingest",
    # TPC-H Q14 shape: broadcast-dim conditional-aggregate ratio
    "promo_revenue_ratio",
    # privacy-governance release audit
    "k_anonymity_customers",
    # ID-space drift from persisted register partials
    "hll_cardinality_drift",
    # mergeable histogram quantiles (the 4th synopsis)
    "hist_quantile_events",
    # the mapInPandas encoder slot, differentially pinned
    "rag_embed_batch",
    # round-13 additions: the HTML extraction front end (map-only
    # stdlib parse + zero-shuffle Catalyst boilerplate gates) and the
    # full curation composition it completes
    "html_extract_blocks",
    "html_extract_text",
    "curation_pipeline_v3",
    # a real matrix-multiply model through the encoder slot
    "rag_embed_mlp",
    # register partials through the native txnlog sink (shuffle-free
    # map-side combine ingest)
    "stream_hll_sink",
    # the generalized stupid-backoff ladder at Brants et al.'s order
    "lm_perplexity_5gram",
    # streaming HTML curation into the native sink (stateless chain)
    "stream_curation_sink",
    # the Gopher repetition gates (dup lines, top-n-gram and
    # coverage-union dup-n-gram character fractions)
    "gopher_repetition",
    # C4-style corpus-wide line dedup over ungated extracted pages
    "line_dedup_extracted",
    # the full composed pipeline: extract -> gates -> line dedup ->
    # quality -> repetition -> token budget
    "curation_pipeline_v4",
    # Luhn-validated payment-card scrub (exact-integer checksum fold)
    "pii_credit_cards",
    # NFC canonical dedup (two independent UAX #15 implementations)
    "dedup_exact_nfc",
    # per-doc character-entropy gibberish gate
    "char_entropy_gate",
    # bloom-gated decontamination (fixed-size bitmap broadcast)
    "contamination_bloom",
    # bloom bitmap maintained as a stream through the native sink
    "stream_bloom_sink",
    # real nearest-neighbor image resize (decode -> index map -> stats)
    "multimodal_resize",
    # round-14 additions
    # streaming C4 line dedup (per-batch digest-gate through txn store)
    "stream_line_dedup",
    # two-tokenizer extraction differential over the adversarial corpus
    "html_extract_adversarial",
    # perceptual image dedup: 63-bit dHash + Hamming-banded pairs
    "multimodal_dedup_phash",
    # pinned-weight logistic quality classifier (integer margin gate)
    "quality_classifier_score",
    # the 7-stage composition ending in the classifier + token budget
    "curation_pipeline_v5",
    # bloom-pruned streaming line-dedup gate (same oracle as the exact)
    "stream_line_dedup_bloom",
    # streaming perceptual dedup: per-batch banded gate vs seen dhashes
    "stream_image_dedup",
    # audio frame-energy fingerprint dedup (exact-integer energies)
    "multimodal_dedup_audio",
    # perceptual pairs -> connected-component clusters
    "multimodal_dedup_clusters",
    # streaming curation with the learned gate in append-mode admission
    "stream_curation_classified",
    # round-15 additions
    # distributed BPE tokenizer training (12 pair-count+merge rounds)
    "bpe_train_merges",
    # RFC 3986 URL canonicalization + registered-domain dedup rollup
    "url_dedup_domains",
    # cluster-canonical keep-best dedup (CC + classifier-margin argmax)
    "dedup_keep_best",
    # streaming doc-level MinHash near-dup ingest vs the signature state
    "stream_minhash_dedup",
    # WARC crawl-container read (binaryFile -> per-file record parse)
    "warc_scan",
    # RFC 9309 robots gating (broadcast rules, longest-match struct-max)
    "robots_gate",
    # train->apply composition: tokenize the eval slice via the learned
    # segmentation (dictionary broadcast join against the trained frame)
    "bpe_train_encode",
]

# Scale-slope probes: re-run representative queries on an in-place
# 4× synthesis of their input tables (id-offset unions — same value
# distributions, 4× rows) so every round records a measured
# runtime-vs-data slope, not just a single-SF point. A healthy
# distributed plan stays near ratio ≤ factor (linear); super-linear
# ratios flag a shuffle/skew cliff before it bites at 100 TB.
#
# Copied document TEXT is vowel-rotated per copy: a plain 4× copy makes
# every doc an exact duplicate of its 3 clones, so pair-producing dedup
# queries would grow ~16× BY CONSTRUCTION (bucket sizes ×4 → pairs ×16)
# and the probe, not the operator, would read super-linear. Rotation
# scrambles nearly every shingle across copies while preserving length
# distributions and within-copy near-dup structure → linear output.
#
# Each probe is warmed once untimed, then timed best-of-2 at each scale:
# r03 recorded a 5.57 minhash ratio that steady-state reruns measure at
# ~1.7 — single-shot timings on a shared box are contention-dominated.
SLOPE_FACTOR = 4
# ---------------------------------------------------------------------------
# Headline rotation (r13, VERDICT r12 next #4): the registry grew past
# 100 benchable queries, so benching ALL of HEADLINE every round mixes
# new-query cost into the trend and grows the wall linearly. Each run
# now times a BOUNDED active set:
#   - the fixed r1 subset (HEADLINE[:27]) — always, so r1_subset_total
#     stays apples-to-apples back to round 1;
#   - every query with no prior measurement (new this round — it needs
#     a first number even if that busts the budget);
#   - least-recently-benched rotation filling up to BENCH_BUDGET.
# Deferral state rides in BENCH_DETAIL.json (bench_history: name →
# last run index; last_timings: most recent measurement for EVERY
# query, so regression flags survive deferral gaps).
# ---------------------------------------------------------------------------

BENCH_BUDGET = 60
FIXED_N = 27  # the round-1 headline prefix — never rotated out


def _pinned_rotation(headline: list, history: dict, run_idx: int):
    """Env-pinned active set (optimization r16, VERDICT r15 next #1):
    the LRU rotation advances every run, so consecutive driver runs
    (round-over-round, or 32- vs 8-core in the same round) measure
    DISJOINT slices and PERF_r15.json came back with n_common=0 and an
    empty scaling block. Two overrides let the caller re-run the SAME
    slice:

    - ``SPARK_GRAFT_BENCH_QUERIES=name,name,...`` (or ``all``) — an
      explicit active list (names outside HEADLINE are ignored);
    - ``SPARK_GRAFT_ROTATION_IDX=<n>`` — the deterministic slice n:
      the fixed r1 prefix plus a (BUDGET-FIXED_N)-wide window over the
      rest of HEADLINE starting at ``(n * window) % len(rest)``, a pure
      function of (n, HEADLINE) — stable across runs and core counts.

    A pinned run does NOT advance ``bench_history``/``bench_run_idx``,
    so unpinned runs resume their LRU cycle exactly where it was.
    Returns None when neither variable is set.
    """
    names_env = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    idx_env = os.environ.get("SPARK_GRAFT_ROTATION_IDX")
    if names_env:
        if names_env.strip().lower() == "all":
            active = list(headline)
        else:
            known = set(headline)
            active, seen = [], set()
            for raw in names_env.split(","):
                n = raw.strip()
                if n in known and n not in seen:
                    active.append(n)
                    seen.add(n)
    elif idx_env is not None:
        rest = headline[FIXED_N:]
        slots = min(max(BENCH_BUDGET - FIXED_N, 0), len(rest))
        start = (int(idx_env) * slots) % len(rest) if rest else 0
        active = headline[:FIXED_N] + [
            rest[(start + j) % len(rest)] for j in range(slots)
        ]
    else:
        return None
    deferred = [n for n in headline if n not in set(active)]
    return active, deferred, history, run_idx


def select_rotation(
    headline: list, prev_detail: dict
) -> tuple[list, list, dict, int]:
    """Returns (active, deferred, history, run_idx). ``history`` is
    already updated for this run's active set."""
    history = dict(prev_detail.get("bench_history") or {})
    pinned = _pinned_rotation(
        headline, history, int(prev_detail.get("bench_run_idx") or 0)
    )
    if pinned is not None:
        return pinned
    run_idx = int(prev_detail.get("bench_run_idx") or 0) + 1
    if not history:
        # seed from the pre-rotation era: anything measured last round
        # counts as benched at run 0
        for n in prev_detail.get("queries", {}) or {}:
            history[n] = 0
    fixed = headline[:FIXED_N]
    new = [n for n in headline[FIXED_N:] if n not in history]
    rest = sorted(
        (n for n in headline[FIXED_N:] if n in history),
        key=lambda n: (history[n], headline.index(n)),
    )
    active = fixed + new
    for n in rest:
        if len(active) >= BENCH_BUDGET:
            break
        active.append(n)
    deferred = [n for n in headline if n not in set(active)]
    for n in active:
        history[n] = run_idx
    return active, deferred, history, run_idx


SLOPE_QUERIES = [
    "dedup_exact",
    "dedup_minhash_signatures",
    "value_drift_scalable",
    "dedup_simhash",
    "dedup_lsh_verified",
    "similarity_topk",
    "monitoring_metrics_full",
    "tfidf_top_terms",
    "contamination_check",
    "corpus_curation",
    "scd2_intervals",
    # doc-keyed shuffles bounded by distinct-shingle count — the slope
    # proves the rare-blocking/bucket claims in SCALE.md
    "ngram_novelty",
    "dedup_containment",
    # graph family over the structure-preserving 4x orders/lineitem
    # synthesis (4 disjoint subgraphs): iterative + combinatorial ops
    "pagerank",
    "triangle_count",
    "item_cooccurrence",
    # round-7 additions: the user-keyed range join (events.user_id is
    # offset per copy → 4 disjoint user populations, so the probe scales
    # users, not per-user event density) and the hourly quantile panel
    "attribution_linear",
    "percentiles_hourly",
    # round-8 addition: the compressed-ANN two-stage query — encode +
    # ADC scan are map-side (expect ~linear), the re-rank stage is a
    # fixed-size broadcast semi-join (vec_id offsets keep pinned
    # codebook rows 1..8 and query 0 present in the 4x corpus)
    "similarity_topk_pq_rerank",
    # round-11 addition: the large-vocab BPE scale path — distinct-word
    # Python work should grow with the 4x corpus's distinct words
    # (vowel rotation multiplies the vocabulary), everything else
    # (explode/join/sum) is linear
    "token_count_bpe_large",
    # round-12 additions: the selection stage's two explode+count-table
    # shapes — bigram-LM scoring (vowel rotation multiplies the bigram
    # vocabulary, so the count tables grow with the corpus; the scoring
    # side is linear) and DSIR bucketing (bucket table FIXED at 2048
    # rows at any scale — the slope proves the broadcast claim) — plus
    # the HLL register build (map-side combine into m=1024 registers;
    # the canonical "shuffle is m rows" claim, measured)
    "lm_perplexity_bigram",
    "dsir_select_en",
    "hll_users_estimate",
    # round-14 additions (VERDICT r13 next #1): the whole r13 heavy
    # family gets a measured slope — extraction chain + line dedup
    # (digest-keyed shuffle), repetition gates (doc-keyed explodes),
    # the Arrow-batched entropy gate (map-only after the r14 reshape),
    # the 5-level backoff ladder (vocabulary-sized count tables), the
    # fixed-bitmap bloom gate, and the full v4 composition
    "char_entropy_gate",
    "gopher_repetition",
    "line_dedup_extracted",
    "lm_perplexity_5gram",
    "contamination_bloom",
    "curation_pipeline_v4",
    # round-14 additions: the classifier (explode + per-doc sum — the
    # map-side-combine claim), the two-tokenizer differential (two
    # Arrow parses + a doc-keyed join), the dHash pair query (banded
    # buckets — pair work must stay bucket-bounded as images multiply),
    # and the 7-stage composition (streaming builds are excluded from
    # slopes like the other trigger-machinery queries)
    "quality_classifier_score",
    "html_extract_adversarial",
    "multimodal_dedup_phash",
    "curation_pipeline_v5",
]
# Every listed column gets the same per-copy id offset, so join keys
# stay CONSISTENT within a copy (4 disjoint subgraphs — structure-
# preserving, which is what makes graph-query slopes meaningful: NOT
# offsetting l_partkey/l_suppkey would multiply key density 4x and the
# probe, not the operator, would read super-linear).
SLOPE_TABLES = {
    "documents": ["doc_id"],
    # user_id offset keeps user-keyed ops (attribution, sessions)
    # structure-preserving: 4x DISJOINT user populations, not 4x events
    # per user (which would quadruple join pair density by construction)
    "events": ["event_id", "user_id"],
    "embeddings": ["vec_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
}
_VOWEL_ROTATIONS = ["aeiou", "eioua", "iouae", "ouaei"]


# Load-normalization calibration (r12, VERDICT r11 next #7): r11
# burned a 62-entry rerun table on a uniform ~1.7x environment shift
# between recordings. The probe is a FIXED synthetic CPU+shuffle job
# with no code-path overlap with any registry query (range source →
# multiplicative-hash keys → groupBy agg → sort); timed at bench start
# AND end, recorded in the artifact, and used to normalize the
# cross-round regression flags below.
CALIB_ROWS = 20_000_000


def _calibration_probe(spark, runs: int = 2) -> float:
    from pyspark.sql import functions as F

    def _job():
        (
            spark.range(CALIB_ROWS)
            .select(
                (F.col("id") % 9973).alias("k"),
                (F.col("id") * 2654435761 % 104729).alias("v"),
            )
            .groupBy("k")
            .agg(F.sum("v").alias("s"), F.avg("v").alias("a"))
            .orderBy("s")
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    _job()  # untimed: codegen compile
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        _job()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def needs_rerun(
    t_now: float,
    t_prev: float | None,
    calib_now: float | None,
    calib_prev: float | None,
    threshold: float = 1.15,
) -> tuple[bool, float | None]:
    """LOAD-NORMALIZED regression flag: compare (t_now / calib_now)
    against (t_prev / calib_prev) so a uniform box slowdown — which
    moves the calibration probe by the same factor — never flags, and
    a genuine per-query regression still does. Falls back to the raw
    ratio when either round lacks a calibration record. Returns
    (flag, normalized_ratio)."""
    if not t_prev:
        return False, None
    ratio = t_now / t_prev
    if calib_now and calib_prev:
        ratio /= calib_now / calib_prev
    return ratio > threshold, round(ratio, 4)


def _contention_snapshot() -> dict:
    """Record machine load + any pre-existing JVMs at bench start so a
    contaminated run (this box has a documented 3-5x contention band,
    SCALE.md) is flaggable from the artifact instead of re-adjudicated
    by hand each round (BENCH_r06's similarity numbers were 4-7x
    phantom)."""
    snap: dict = {}
    try:
        snap["load_avg_start"] = round(os.getloadavg()[0], 2)
    except OSError:
        snap["load_avg_start"] = None
    try:
        import subprocess

        out = subprocess.run(
            ["pgrep", "-c", "-f", "java"], capture_output=True, text=True
        )
        # Our own JVM hasn't started yet, so any count here is foreign.
        snap["java_procs_at_start"] = int((out.stdout or "0").strip() or 0)
    except Exception:
        snap["java_procs_at_start"] = None
    return snap


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0

    contention = _contention_snapshot()
    # previous round's per-query detail, read BEFORE this run overwrites
    # it: any common query regressing >1.15x vs it gets an automatic
    # isolated best-of-2 rerun recorded in the artifact (r11, VERDICT
    # r10 next #8 — the contention-jitter flags self-resolve in the
    # JSON instead of in SCALE.md prose)
    prev_timings: dict = {}
    prev_calib: float | None = None
    _prev_detail: dict = {}
    try:
        with open(
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "BENCH_DETAIL.json",
            )
        ) as f:
            _prev_detail = json.load(f)
        # last_timings carries the most recent measurement for EVERY
        # query across deferral gaps; fall back to the pre-rotation
        # per-run map
        prev_timings = (
            _prev_detail.get("last_timings")
            or _prev_detail.get("queries", {})
            or {}
        )
        prev_calib = (_prev_detail.get("calibration") or {}).get("min")
    except Exception:
        pass

    active, deferred, bench_history, bench_run_idx = select_rotation(
        HEADLINE, _prev_detail
    )
    spark = get_spark(app_name="churn_model_evaluation_platform_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    # Warmup (not timed): JVM/codegen spin-up and one touch per table so
    # file-index listing + parquet footer reads don't land inside the
    # first query that happens to use each table.
    from churn_model_evaluation_platform_spark.sources.testdata import TABLES, load_table

    for t in TABLES:
        # noop write (not count): parquet count() is metadata-only and
        # would leave the first real page reads inside a timed query.
        load_table(spark, t, sf_dir).write.format("noop").mode("overwrite").save()

    # Warm every headline plan once at the smallest SF: identical
    # expression trees → Janino/whole-stage-codegen cache hits, so the
    # timed runs below measure execution, not first-compile (which
    # amortizes to zero in any long-lived deployment). Data volume at
    # sf0.001 is ~1% of the timed run — the warm pass is cheap.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for name in active:
            try:
                qs[name](spark, warm_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception:
                pass  # never let warmup kill the bench

    calib_start = _calibration_probe(spark)

    # Best-of-2 per query: BENCH_r03 recorded 3.2-3.5x "regressions" on
    # queries whose code had not changed — single-shot timings on a
    # shared box measure contention, not the plan. The min of two runs
    # is the steadier throughput figure.
    from churn_model_evaluation_platform_spark.plans import phases as _phases

    # Release leaked session state BETWEEN queries (optimization r15):
    # without it the 60-query session accretes RDD blocks / broadcasts
    # (ContextCleaner waits on a driver GC that an 8 GB mostly-idle
    # heap rarely runs) and late-rotation queries measure 2-5× slower
    # than fresh-session truth (gopher_repetition 22.0 s aged vs 4.0 s
    # fresh in the r15 baseline sweep). Runs OUTSIDE every timed
    # region; the per-query methodology (warm + best-of-2 + noop sink)
    # is unchanged.
    import gc as _gc

    def _release():
        # r16 (VERDICT r15 next #8): EXPLICITLY unpersist every block
        # still registered — a finished query's localCheckpoint RDDs
        # (one per CC round / pipeline handoff) otherwise linger until
        # a driver GC lets the ContextCleaner at them, which is the
        # measured session-aging source. Safe between queries: every
        # query (re)creates its own caches per call; nothing here is
        # shared across queries. Runs OUTSIDE every timed region.
        try:
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for jrdd in list(jmap.values()):
                jrdd.unpersist(False)
        except Exception:
            pass
        _gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    # Per-query build/query wall split (VERDICT r9 next #7): fixture
    # builders report their construction seconds via plans/phases.py, so
    # a feed/scan regression in the txnlog/ANN-store queries is visible
    # instead of hiding inside multi-commit fixture noise.
    phase_split: dict[str, dict] = {}
    for name in active:
        fn = qs[name]
        _release()
        try:
            best = float("inf")
            best_phases: dict[str, float] = {}
            for _ in range(2):
                _phases.drain()  # clear any stale accumulation
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                ph = _phases.drain()
                if dt < best:
                    best, best_phases = dt, ph
            timings[name] = round(best, 4)
            if best_phases:
                build = sum(best_phases.values())
                phase_split[name] = {
                    "build": round(build, 4),
                    "query": round(best - build, 4),
                }
        except Exception as e:  # one broken query must not blank the bench
            errors[name] = str(e).splitlines()[0][:200]

    calib_end = _calibration_probe(spark)
    calib_now = min(calib_start, calib_end)

    # auto-rerun of flagged regressions (r11, LOAD-NORMALIZED r12): a
    # >1.15x NORMALIZED delta vs last round's recorded time is
    # re-measured best-of-2 right here — the headline keeps the
    # contended number; the artifact carries both plus the normalized
    # ratio, so a jitter flag is adjudicated by the run itself and a
    # uniform environment shift (r11: 62 phantom flags) never flags
    rerun: dict[str, dict] = {}
    for name, t_now in timings.items():
        t_prev = prev_timings.get(name)
        flag, norm = needs_rerun(t_now, t_prev, calib_now, prev_calib)
        if not flag:
            continue
        _release()
        try:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            rerun[name] = {
                "prev": round(float(t_prev), 4),
                "contended": t_now,
                "isolated": round(best, 4),
                "normalized_ratio": norm,
            }
        except Exception:
            pass  # the rerun is diagnostic; never let it blank the bench

    def _timed(name: str, d: str, runs: int = 2) -> float:
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            qs[name](spark, d).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 4)

    slope = {}
    try:
        slope_dir = _build_slope_dir(spark, sf_dir, SLOPE_FACTOR)
        for name in SLOPE_QUERIES:
            _release()
            try:
                # untimed warm at x1: codegen compile + file-index listing
                qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                t1 = _timed(name, sf_dir)
                t4 = _timed(name, slope_dir)
                slope[name] = {
                    "x1": t1,
                    f"x{SLOPE_FACTOR}": t4,
                    "ratio": round(t4 / t1, 2) if t1 > 0 else None,
                }
            except Exception as e:
                slope[name] = {"error": str(e).splitlines()[0][:200]}
    except Exception as e:  # slope probes must never blank the bench
        slope = {"error": str(e).splitlines()[0][:200]}

    total = round(sum(timings.values()), 4)
    # apples-to-apples vs the round-1 bench: subtotal over the original
    # 27-query headline set (new queries extend HEADLINE at the end)
    r1_subset = round(sum(timings.get(n, 0.0) for n in HEADLINE[:27]), 4)

    # Full detail: an EARLIER stdout line (outside the driver's 2000-char
    # tail) + a file the judge can read verbatim.
    # a query that ERRORED produced no measurement: restore its prior
    # history stamp so it RETRIES next run instead of being treated as
    # freshly benched and rotated out for a full cycle (review r13)
    _prev_hist = _prev_detail.get("bench_history") or {}
    for n in errors:
        if n in _prev_hist:
            bench_history[n] = _prev_hist[n]
        else:
            bench_history.pop(n, None)

    # carry the most recent measurement for every query across
    # deferral gaps (regression flags compare against this when a
    # deferred query rotates back in)
    last_timings = {
        **{
            k: v
            for k, v in prev_timings.items()
            if isinstance(v, (int, float))
        },
        **timings,
    }

    detail = {
        "queries": timings,
        "phase_split": phase_split,
        "scale_slope": slope,
        "rerun": rerun,
        "errors": errors,
        "contention": contention,
        "bench_history": bench_history,
        "bench_run_idx": bench_run_idx,
        "last_timings": last_timings,
        "rotation": {
            "budget": BENCH_BUDGET,
            "n_active": len(active),
            "n_deferred": len(deferred),
            "deferred": deferred,
            # pin provenance (r16): which env override, if any, chose
            # this run's active set — pinned runs don't advance the LRU
            "pinned": (
                "list"
                if os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
                else os.environ.get("SPARK_GRAFT_ROTATION_IDX")
            ),
        },
        # the load-normalization index for NEXT round's flags: the
        # probe's best time this round (start/end kept for drift
        # visibility — a big start/end gap means the load changed
        # mid-run and per-query normalization is approximate)
        "calibration": {
            "start": calib_start,
            "end": calib_end,
            "min": calib_now,
            "prev": prev_calib,
        },
    }
    print(json.dumps(detail))
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    try:
        with open(detail_path, "w") as f:
            json.dump(
                {
                    "metric": "headline_total_runtime",
                    "value": total,
                    "unit": "sec",
                    "sf": sf,
                    "r1_subset_total": r1_subset,
                    "method": "best_of_2_warmed_rotated",
                    **detail,
                },
                f,
                indent=1,
            )
    except OSError:
        pass  # detail file is best-effort; the stdout lines stand alone

    # FINAL line: compact by construction (no per-query map, no nested
    # slope dicts) — the driver keeps only a 2000-char stdout tail and
    # BENCH_r06 came back parsed:null when the old combined line outgrew
    # it. Timing methodology recorded so rounds are comparable: r01-r03
    # were single-shot; r04+ are untimed-warm + best-of-2 (SCALE.md
    # "Bench methodology") — deltas spanning r03→r04 are NOT
    # like-for-like.
    out = {
        "metric": "headline_total_runtime",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "r1_subset_total": r1_subset,
        "method": "best_of_2_warmed_rotated",
        "n_queries": len(timings),
        "n_deferred": len(deferred),
        "n_errors": len(errors),
        "n_reruns": len(rerun),
        **contention,
        "detail_file": "BENCH_DETAIL.json",
    }
    line = json.dumps(out)
    # Backstop — structurally impossible, but never let the driver's
    # 2000-char tail buffer truncate the line (BENCH_r06 parsed:null).
    # Drop optional keys one at a time so the emitted line is ALWAYS
    # valid JSON — never slice a serialized string mid-token.
    for optional in (
        "detail_file",
        "n_reruns",
        "java_procs_at_start",
        "load_avg_start",
        "method",
        "r1_subset_total",
    ):
        if len(line) <= 1800:
            break
        out.pop(optional, None)
        line = json.dumps(out)
    print(line)


def _build_slope_dir(spark, sf_dir: str, factor: int) -> str:
    """Materialize {documents, events} at ``factor``× rows via id-offset
    unions (parquet, zstd) under /tmp; everything else is untouched."""
    from functools import reduce

    from pyspark.sql import functions as F

    from churn_model_evaluation_platform_spark.sources.testdata import load_table

    out = f"/tmp/spark_graft_slope_{factor}x"
    for table, id_cols in SLOPE_TABLES.items():
        base = load_table(spark, table, sf_dir)
        copies = []
        for i in range(factor):
            c = base
            for id_col in id_cols:
                c = c.withColumn(
                    id_col,
                    (F.col(id_col) + F.lit(i * 1_000_000_000)).cast("long"),
                )
            if table == "documents":
                # vowel-rotate per copy so clones are NOT near-duplicates
                # of each other (see SLOPE_QUERIES comment).
                c = c.withColumn(
                    "text",
                    F.translate(
                        F.col("text"),
                        _VOWEL_ROTATIONS[0],
                        _VOWEL_ROTATIONS[i % len(_VOWEL_ROTATIONS)],
                    ),
                )
            copies.append(c)
        reduce(lambda a, b: a.unionAll(b), copies).write.mode(
            "overwrite"
        ).parquet(f"{out}/{table}.parquet")
    return out


if __name__ == "__main__":
    main()
