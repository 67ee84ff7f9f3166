"""Registry part 2: north-star extensions (dedup, similarity search,
text analysis), relational engine capabilities (joins/windows/set-ops —
SURVEY §2.G: shipped as engine capabilities beyond reference parity), and
the streaming ingestion path.

Oracle SQL for hash-based operators is GENERATED from the same seeded
parameters the Spark side uses (functions/hashing.py), so both engines
compute bit-identical md5-derived integer hashes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import (
    MERSENNE_31,
    md5_hash_int_sql,
    minhash_perms,
)
from ..operators import dedup, similarity, text
from ..sources.testdata import load_table
from .registry import drain_stream, register

# ---------------------------------------------------------------------------
# Shared SQL fragments (DuckDB side of the text primitives)
# ---------------------------------------------------------------------------

# normalize: lower → collapse whitespace → trim ('g' flag: DuckDB's
# regexp_replace is first-match-only by default, Spark's is global).
_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_TOKENS_SQL = f"string_split({_NORM_SQL}, ' ')"


def _shingles_sql(n: int) -> str:
    """DuckDB list of n-word shingles matching text.word_shingles."""
    return (
        f"[array_to_string(list_slice(w, i, i + {n - 1}), ' ') "
        f"FOR i IN range(1, greatest(len(w) - {n - 1}, 1) + 1)]"
    )


_SHINGLE_HASH_CTE = f"""
WITH tok AS (SELECT doc_id, {_TOKENS_SQL} AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id, {md5_hash_int_sql('s')} AS h
  FROM (SELECT doc_id, unnest({_shingles_sql(3)}) AS s FROM tok)
)
"""


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    f"""
SELECT min(doc_id) AS doc_id, md5({_NORM_SQL}) AS content_md5,
       count(*) AS n_copies
FROM documents GROUP BY md5({_NORM_SQL})
""",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Hash-groupBy exact dedup — shuffles 16-byte digests, not text.
    return dedup.exact_dedup(_t(spark, sf_dir, "documents"))


@register(
    "dedup_ngram_jaccard",
    _SHINGLE_HASH_CTE
    + """,
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b,
       CAST(common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - common AS DOUBLE) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - common AS DOUBLE) >= 0.1
""",
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Shingle-join Jaccard (the exact verifier; LSH generates candidates
    # at scale). Threshold 0.1 exercises real pairs on the synthetic corpus.
    return dedup.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), n=3, threshold=0.1
    )


@register(
    "contamination_check",
    _SHINGLE_HASH_CTE
    + """,
bsh AS (SELECT doc_id AS bench_id, h FROM sh WHERE doc_id % 97 = 0),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT s.doc_id, b.bench_id, count(*) AS common
  FROM sh s JOIN bsh b ON s.h = b.h
  GROUP BY s.doc_id, b.bench_id
)
SELECT c.doc_id, c.bench_id, c.common,
       round(CAST(c.common AS DOUBLE) / CAST(z.n_sh AS DOUBLE), 6) AS containment
FROM common c JOIN sizes z ON z.doc_id = c.doc_id
WHERE c.common >= 5
""",
)
def q_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Benchmark decontamination (GPT-3 appendix-C style n-gram collision
    # check): every 97th doc plays the eval set; its shingle table is
    # broadcast so corpus text never shuffles.
    docs = _t(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    return dedup.contamination_pairs(docs, bench, n=3, min_common=5)


_PERMS = minhash_perms(dedup.DEFAULT_MINHASH_K, seed=42)

# SELECT-only form (no CTE prefix) so composed oracles can splice it
# into their own WITH chain (registry_ext5 dedup_lsh_verified).
_MINHASH_SELECT = (
    "SELECT doc_id, "
    + ", ".join(
        f"min((h * {a} + {b}) % {MERSENNE_31}) AS m{i}"
        for i, (a, b) in enumerate(_PERMS)
    )
    + " FROM sh GROUP BY doc_id"
)

_MINHASH_SQL = _SHINGLE_HASH_CTE + _MINHASH_SELECT


@register("dedup_minhash_signatures", _MINHASH_SQL)
def q_dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    # k=16 seeded universal hashes over shingle hashes; one explode + one
    # groupBy (the shuffle carries k ints per doc).
    return dedup.minhash_signatures(_t(spark, sf_dir, "documents"))


_K = dedup.DEFAULT_MINHASH_K
_R = _K // dedup.DEFAULT_BANDS
_BAND_KEYS_SQL = ", ".join(
    "concat_ws('|', "
    + ", ".join(f"m{bi * _R + j}" for j in range(_R))
    + f") AS bk{bi}"
    for bi in range(dedup.DEFAULT_BANDS)
)
_BAND_MATCH_SQL = " OR ".join(
    f"a.bk{bi} = b.bk{bi}" for bi in range(dedup.DEFAULT_BANDS)
)
_EQ_SUM_SQL = " + ".join(
    f"CASE WHEN a.m{i} = b.m{i} THEN 1 ELSE 0 END" for i in range(_K)
)


@register(
    "dedup_minhash_lsh",
    f"""
WITH sigs AS ({_MINHASH_SQL}),
banded AS (SELECT sigs.*, {_BAND_KEYS_SQL} FROM sigs)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST({_EQ_SUM_SQL} AS DOUBLE) / {_K}.0 AS est_jaccard
FROM banded a JOIN banded b
  ON a.doc_id < b.doc_id AND ({_BAND_MATCH_SQL})
""",
)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Band-bucket candidate join — near-linear at scale; est_jaccard =
    # fraction of equal signature mins.
    return dedup.minhash_lsh_pairs(_t(spark, sf_dir, "documents"))


_SIMHASH_BITS = 32
_BITSUM_SQL = ", ".join(
    f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS s{j}"
    for j in range(_SIMHASH_BITS)
)
_FP_SQL = " + ".join(
    f"CASE WHEN s{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END"
    for j in range(_SIMHASH_BITS)
)


@register(
    "dedup_simhash",
    f"""
WITH words AS (
  SELECT doc_id, {md5_hash_int_sql('w', 8)} AS h
  FROM (SELECT doc_id, unnest({_TOKENS_SQL}) AS w FROM documents)
),
bitsums AS (SELECT doc_id, {_BITSUM_SQL} FROM words GROUP BY doc_id)
SELECT doc_id, CAST({_FP_SQL} AS BIGINT) AS simhash FROM bitsums
""",
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 32-bit SimHash from word hashes — exact-int arithmetic end to end.
    return dedup.simhash(_t(spark, sf_dir, "documents"), bits=_SIMHASH_BITS)


_SIMHASH_SQL = f"""
WITH words AS (
  SELECT doc_id, {md5_hash_int_sql('w', 8)} AS h
  FROM (SELECT doc_id, unnest({_TOKENS_SQL}) AS w FROM documents)
),
bitsums AS (SELECT doc_id, {_BITSUM_SQL} FROM words GROUP BY doc_id)
SELECT doc_id, CAST({_FP_SQL} AS BIGINT) AS simhash FROM bitsums
"""


@register(
    "dedup_simhash_pairs",
    f"""
WITH sh AS ({_SIMHASH_SQL})
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
""",
)
def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # max_hamming=3 < chunks=4 → the pigeonhole candidate set is COMPLETE,
    # so the chunked-join result equals the brute-force pair set and the
    # O(n²) DuckDB oracle verifies it exactly.
    return dedup.simhash_pairs(
        _t(spark, sf_dir, "documents"), max_hamming=3, chunks=4
    )


_SIMHASH_CHUNK_MATCH = " OR ".join(
    f"((a.simhash >> {ci * 8}) & 255) = ((b.simhash >> {ci * 8}) & 255)"
    for ci in range(4)
)


@register(
    "dedup_simhash_recall",
    f"""
WITH sh AS ({_SIMHASH_SQL}),
exact AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         {_SIMHASH_CHUNK_MATCH} AS chunk_hit
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
)
SELECT count(*) AS n_true_pairs,
       CAST(coalesce(sum(CASE WHEN chunk_hit THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_recalled,
       CASE WHEN count(*) = 0 THEN 1.0
            ELSE round(CAST(sum(CASE WHEN chunk_hit THEN 1 ELSE 0 END)
                            AS DOUBLE)
                       / CAST(count(*) AS DOUBLE), 6) END AS recall
FROM exact
""",
)
def q_dedup_simhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    # QA/audit twin of dedup_lsh_recall for the pigeonhole generator:
    # certifies the provable recall-1.0 claim (max_hamming=3 < chunks=4)
    # with a measured number; <1.0 would mean a chunking bug. The oracle
    # evaluates chunk agreement directly on the brute-force pair set.
    return dedup.simhash_candidate_recall(
        _t(spark, sf_dir, "documents"), bits=32, max_hamming=3, chunks=4
    )


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

_EMB_DOUBLE = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
_COSINE_SQL_BODY = f"""
WITH q AS (SELECT {_EMB_DOUBLE} AS qv FROM embeddings WHERE vec_id = 0),
e AS (SELECT vec_id, {_EMB_DOUBLE} AS ev FROM embeddings WHERE vec_id <> 0)
SELECT vec_id,
       list_dot_product(ev, qv)
         / (sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(qv, qv)))
         AS cosine_sim
FROM e, q
ORDER BY cosine_sim DESC, vec_id
LIMIT 10
"""


def _query_vec(spark: SparkSession, sf_dir: str, vec_id: int = 0) -> list[float]:
    row = (
        _t(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") == vec_id)
        .select("embedding")
        .first()
    )
    return [float(v) for v in row["embedding"]]


@register("similarity_topk", _COSINE_SQL_BODY)
def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Brute-force exact baseline: one projection + TakeOrderedAndProject
    # (per-partition heap, no sort shuffle). Float64 sequential folds on
    # both engines → bit-identical cosines.
    q = _query_vec(spark, sf_dir)
    return similarity.cosine_topk(
        _t(spark, sf_dir, "embeddings"), q, k=10, exclude_id=0
    )


def _bucket_sql(vec_expr: str, planes: list[list[float]]) -> str:
    """Sign-LSH bucket id of ``vec_expr`` as pure SQL (plane literals)."""
    terms = [
        "CASE WHEN list_dot_product("
        + vec_expr
        + ", ["
        + ", ".join(f"{v:.1f}" for v in plane)
        + f"]) > 0 THEN {1 << i} ELSE 0 END"
        for i, plane in enumerate(planes)
    ]
    return "(" + " + ".join(terms) + ")"


# Multi-probe config: 4 planes / 8 probes ordered by flipped-|margin|
# cost — recall 0.8 vs the exact top-10 on the sf0.01 corpus (the
# synthetic embeddings are near-random, so sign-LSH recall/scan tracks
# the probed-bucket fraction; IVF is the stronger ANN here).
_LSH_N_PLANES = 4
_LSH_N_PROBES = 8
_PLANES = similarity.random_hyperplanes(64, _LSH_N_PLANES, seed=42)


def _margin_cost_sql(n_planes: int) -> str:
    """Σ |margin_i| over the bits set in ``mask`` — same left-to-right
    accumulation order as multiprobe_buckets' Python sum."""
    return " + ".join(
        f"CASE WHEN mask & {1 << i} = {1 << i} THEN a{i} ELSE 0.0 END"
        for i in range(n_planes)
    )


_MARGIN_ABS_SQL = ", ".join(
    "abs(list_dot_product(qv, ["
    + ", ".join(f"{v:.1f}" for v in plane)
    + f"])) AS a{i}"
    for i, plane in enumerate(_PLANES)
)

_LSH_TOPK_SQL = f"""
WITH q AS (SELECT {_EMB_DOUBLE} AS qv FROM embeddings WHERE vec_id = 0),
m AS (SELECT qv, {_MARGIN_ABS_SQL}, {_bucket_sql('qv', _PLANES)} AS q_bucket FROM q),
masks AS (
  SELECT qv, q_bucket, CAST(mask AS INTEGER) AS mask,
         {_margin_cost_sql(_LSH_N_PLANES)} AS cost
  FROM m, (SELECT unnest(range({1 << _LSH_N_PLANES})) AS mask)
),
probes AS (
  SELECT qv, xor(q_bucket, mask) AS pb
  FROM masks ORDER BY cost, mask LIMIT {_LSH_N_PROBES}
),
pl AS (SELECT any_value(qv) AS qv, list(pb) AS pbs FROM probes),
e AS (SELECT vec_id, {_EMB_DOUBLE} AS ev FROM embeddings),
b AS (SELECT vec_id, ev, {_bucket_sql('ev', _PLANES)} AS lsh_bucket FROM e)
SELECT vec_id,
       list_dot_product(ev, qv)
         / (sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(qv, qv)))
         AS cosine_sim
FROM b, pl
WHERE list_contains(pbs, lsh_bucket) AND vec_id <> 0
ORDER BY cosine_sim DESC, vec_id
LIMIT 10
"""


@register("similarity_topk_lsh", _LSH_TOPK_SQL)
def q_similarity_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Multi-probe sign-LSH prefilter + exact rescoring — the 100 TB path
    # (bucket IN-filter becomes a partition-pruned scan when written
    # bucketed by lsh_bucket).
    q = _query_vec(spark, sf_dir)
    return similarity.cosine_topk_lsh(
        _t(spark, sf_dir, "embeddings"),
        q,
        k=10,
        n_planes=_LSH_N_PLANES,
        n_probes=_LSH_N_PROBES,
        seed=42,
        exclude_id=0,
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@register(
    "token_count",
    f"SELECT doc_id, len({_TOKENS_SQL}) AS n_tokens FROM documents",
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.token_count(_t(spark, sf_dir, "documents"))


@register(
    "sequence_pack",
    f"""
WITH t AS (SELECT doc_id, len({_TOKENS_SQL}) AS n_tokens FROM documents),
c AS (SELECT doc_id, n_tokens,
             sum(n_tokens) OVER (ORDER BY doc_id) AS cum FROM t)
SELECT doc_id, n_tokens,
       CAST(cum - n_tokens AS BIGINT) AS start_offset,
       CAST((cum - n_tokens) // 512 AS BIGINT) AS pack_first,
       CAST(greatest((cum - n_tokens) // 512, (cum - 1) // 512) AS BIGINT)
         AS pack_last
FROM c
""",
)
def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Concat-then-chunk packing into 512-token windows; running total via
    # the range-partitioned prefix sum (no single-reducer window).
    return text.sequence_pack(_t(spark, sf_dir, "documents"), ctx_len=512)


def _in_list(items: list[str]) -> str:
    return ", ".join(f"'{w}'" for w in items)


_LANG_HITS = {
    lang: f"len(list_filter(tk, t -> t IN ({_in_list(sw)})))"
    for lang, sw in text.LANG_STOPWORDS.items()
}


@register(
    "lang_id",
    f"""
WITH tok AS (SELECT doc_id, {_TOKENS_SQL} AS tk FROM documents),
hits AS (
  SELECT doc_id, {_LANG_HITS['en']} AS en, {_LANG_HITS['de']} AS de,
         {_LANG_HITS['fr']} AS fr, {_LANG_HITS['es']} AS es
  FROM tok
)
SELECT doc_id,
       CASE WHEN en > 0 AND en >= de AND en >= fr AND en >= es THEN 'en'
            WHEN de > 0 AND de >= fr AND de >= es THEN 'de'
            WHEN fr > 0 AND fr >= es THEN 'fr'
            WHEN es > 0 THEN 'es'
            ELSE 'unknown' END AS lang_pred
FROM hits
""",
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.lang_id(_t(spark, sf_dir, "documents"))


_EN_STOP = _in_list(text.LANG_STOPWORDS["en"])


@register(
    "text_quality",
    f"""
WITH base AS (
  SELECT doc_id, length(text) AS raw_len, {_NORM_SQL} AS norm,
         {_TOKENS_SQL} AS tk
  FROM documents
),
c AS (
  SELECT doc_id,
         CAST(raw_len AS DOUBLE) AS n_chars,
         CAST(len(tk) AS DOUBLE) AS nt,
         CAST(len(list_filter(tk, t -> t IN ({_EN_STOP}))) AS DOUBLE) AS n_stop,
         CAST(length(regexp_replace(norm, '[^a-z]', '', 'g')) AS DOUBLE) AS n_alpha,
         CAST(length(norm) AS DOUBLE) AS norm_len
  FROM base
)
SELECT doc_id, n_chars, nt AS n_tokens,
       round((norm_len - (nt - 1)) / nt, 6) AS mean_token_len,
       round(n_stop / nt, 6) AS stopword_ratio,
       round(n_alpha / norm_len, 6) AS alpha_ratio,
       round(least(nt / 100.0, 1.0) * 0.4 + (n_stop / nt) * 0.3
             + (n_alpha / norm_len) * 0.3, 6) AS quality_score
FROM c
""",
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.text_quality(_t(spark, sf_dir, "documents"))


@register(
    "doc_fingerprint",
    _SHINGLE_HASH_CTE
    + f""",
norm AS (SELECT doc_id, md5({_NORM_SQL}) AS content_md5 FROM documents)
SELECT sh.doc_id, min(h) AS min_shingle_hash,
       CAST(count(*) AS INT) AS n_shingles, any_value(content_md5) AS content_md5
FROM sh JOIN norm ON sh.doc_id = norm.doc_id
GROUP BY sh.doc_id
""",
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = text.doc_fingerprint(_t(spark, sf_dir, "documents"))
    return out.withColumn("n_shingles", F.col("n_shingles").cast("int"))


# ---------------------------------------------------------------------------
# Relational engine capabilities (SURVEY §2.G — beyond reference parity)
# ---------------------------------------------------------------------------


@register(
    "join_agg_revenue",
    """
SELECT n.n_name, round(SUM(o.o_totalprice), 2) AS revenue,
       COUNT(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY n.n_name
""",
)
def q_join_agg_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Star join: dims broadcast (nation/region always; customer via AQE),
    # fact shuffles once for the final groupBy.
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "topk_per_group",
    """
SELECT o_orderpriority, o_orderkey, o_totalprice, rk FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
) WHERE rk <= 3
""",
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Top-k per group via rank window (deterministic orderkey tie-break).
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rk"),
        ).where(F.col("rk") <= 3)
    )


@register(
    "window_running_total",
    """
SELECT o_custkey, o_orderkey,
       round(SUM(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
FROM orders
""",
)
def q_window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@register(
    "set_ops",
    """
SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000
INTERSECT
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
""",
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = o.where(F.col("o_totalprice") > 150000).select(
        F.col("o_custkey").alias("custkey")
    )
    seg = c.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    return big.intersect(seg)


@register(
    "agg_groupby_multi",
    """
SELECT l_returnflag, l_linestatus,
       round(SUM(l_quantity), 2) AS sum_qty,
       round(SUM(l_extendedprice), 2) AS sum_base_price,
       round(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(AVG(l_quantity), 6) AS avg_qty,
       round(AVG(l_extendedprice), 4) AS avg_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def q_agg_groupby_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q1 shape: predicate pushed to the scan, partial aggregation
    # map-side, one shuffle of (2-char keys × 8 aggregates).
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Streaming ingestion (file-drop stream — SURVEY §2.A file_drop_stream)
# ---------------------------------------------------------------------------


@register(
    "file_drop_stream",
    "SELECT event_type, COUNT(*) AS n_events FROM events GROUP BY event_type",
)
def q_file_drop_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Real Structured Streaming run: file source → stateful aggregation →
    # memory sink, trigger=availableNow (drains then stops). Replaces the
    # reference's S3→Lambda→Prefect trigger (lambda_function.py:16-47).
    static = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")  # source dir holds all tables
        .parquet(sf_dir)
    )
    agg = stream.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_events"))
    name = "file_drop_stream_result"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    drain_stream(q)
    return spark.table(name)


# ---------------------------------------------------------------------------
# Training-side dataflow (rows-only: nondeterministic across engines)
# ---------------------------------------------------------------------------


_SPLIT_BUCKET_SQL = (
    "CAST('0x' || substr(md5(COALESCE(CAST(event_id AS VARCHAR), '') "
    "|| '|{salt}42'), 1, 7) AS BIGINT) % {mod}"
)


@register(
    "train_test_split",
    "SELECT COUNT(CASE WHEN bucket < 8000 THEN 1 END) AS train_rows, "
    "COUNT(CASE WHEN bucket >= 8000 THEN 1 END) AS test_rows, "
    "COUNT(*) AS total_rows FROM (SELECT "
    + _SPLIT_BUCKET_SQL.format(salt="split", mod=10_000)
    + " AS bucket FROM events)",
)
def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    # churn_model_training.py:335-337 — 80/20 seed-42 split, via the
    # deterministic hash_split scale path (ml/training.py:hash_split) so
    # the split is oracle-reproducible. randomSplit stays lib-only
    # (ml/training.py:train_test_split, unit-tested): its assignment
    # depends on partition layout and has no cross-engine oracle.
    from ..ml.training import hash_split

    ev = _t(spark, sf_dir, "events").select("event_id")
    train, test = hash_split(ev, "event_id", test_size=0.2, seed=42)
    sides = train.select(F.lit(1).alias("is_train")).unionByName(
        test.select(F.lit(0).alias("is_train"))
    )
    return sides.agg(
        F.count(F.when(F.col("is_train") == 1, 1)).alias("train_rows"),
        F.count(F.when(F.col("is_train") == 0, 1)).alias("test_rows"),
        F.count(F.lit(1)).alias("total_rows"),
    )


@register(
    "train_test_split_hash",
    "SELECT event_id, CASE WHEN "
    + _SPLIT_BUCKET_SQL.format(salt="split", mod=10_000)
    + " < 8000 THEN 'train' ELSE 'test' END AS side FROM events",
)
def q_train_test_split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # churn_model_training.py:335-337 re-expressed as the deterministic
    # scale path: portable md5-bucket split (ml/training.py:hash_split).
    # Per-row side assignment is oracle-reproducible bit-for-bit, unlike
    # randomSplit whose assignment depends on partition layout.
    from ..ml.training import hash_split

    ev = _t(spark, sf_dir, "events").select("event_id")
    train, test = hash_split(ev, "event_id", test_size=0.2, seed=42)
    return train.withColumn("side", F.lit("train")).unionByName(
        test.withColumn("side", F.lit("test"))
    )


@register(
    "kfold_hash",
    "SELECT event_id, CAST("
    + _SPLIT_BUCKET_SQL.format(salt="fold", mod=3)
    + " + 1 AS INT) AS fold FROM events",
)
def q_kfold_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # churn_model_training.py:254-257 scale path: deterministic per-row
    # fold via portable hash (ml/training.py:hash_folds) — zero shuffle,
    # engine-portable, stable under repartition/recomputation. Folds are
    # pseudo-random (stratified in expectation only); the exact-stratified
    # deterministic variant is `stratified_kfold` below.
    from ..ml.training import hash_folds

    ev = _t(spark, sf_dir, "events").select("event_id")
    return hash_folds(ev, "event_id", k=3, seed=42)


@register(
    "stratified_kfold",
    "SELECT label, fold, COUNT(*) AS n FROM ("
    "SELECT label, CAST((ROW_NUMBER() OVER (PARTITION BY label "
    "ORDER BY md5(COALESCE(CAST(event_id AS VARCHAR), '') || '|fold42'), "
    "event_id) - 1) % 3 + 1 AS INT) AS fold "
    "FROM (SELECT event_id, CAST(value > 50 AS INT) AS label FROM events)"
    ") GROUP BY label, fold",
)
def q_stratified_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    # churn_model_training.py:254-257 — EXACT-stratified 3-fold via the
    # deterministic hash-rank round-robin (ml/training.py:
    # stratified_hash_folds): per-stratum fold sizes within 1, and —
    # unlike the lib-only ntile-over-rand variant (stratified_folds) —
    # bit-reproducible across engines, so fully oracle-backed.
    from ..ml.training import stratified_hash_folds

    ev = _t(spark, sf_dir, "events").select(
        "event_id", (F.col("value") > 50).cast("int").alias("label")
    )
    folded = stratified_hash_folds(ev, "event_id", k=3, label_col="label")
    return folded.groupBy("label", "fold").agg(F.count(F.lit(1)).alias("n"))
