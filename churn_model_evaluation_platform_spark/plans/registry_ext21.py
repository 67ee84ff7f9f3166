"""Round-15 registry extensions — tokenizer TRAINING plus the crawl
hygiene stages a 100 TB pipeline runs before any text gate:

* ``bpe_train_merges`` / ``bpe_train_vocab`` — distributed BPE
  tokenizer training (the engine previously only APPLIED merge
  tables): K iterations of weighted pair counting + argmax + a
  Catalyst leftmost-scan merge fold over a word-frequency table. The
  DuckDB oracle replays the WHOLE training run as a generated K-level
  materialized-CTE chain, so every learned merge, its count, the
  tie-break order, and the final vocabulary segmentation are
  hash-checked.
* ``url_normalize`` / ``url_dedup_domains`` /
  ``domain_blocklist_filter`` — URL canonicalization (RFC 3986
  syntax normalization + crawl conventions: case, www, default
  ports, fragments, tracking params, param sort, trailing slashes),
  registered-domain rollups, and broadcast blocklist filtering. The
  fixture builds raw URLs from (doc_id, source) with the CONTENT
  identity keyed on ``doc_id % 60`` and the surface variants (case,
  www, trailing slash, tracking params, fragments) keyed on
  ``doc_id % 7`` — so normalization provably collapses the variants
  (dupes guaranteed) and both engines build identical raw strings
  while normalizing them through INDEPENDENT regex/list engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.bpe_train import bpe_train, bpe_train_sql
from .registry import register
from .registry_ext12 import _t

_BPE_K = 12

_MERGES_SCHEMA = (
    "step int, left_sym string, right_sym string, "
    "merged string, pair_count bigint"
)


@register("bpe_train_merges", bpe_train_sql(_BPE_K))
def q_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned merge table itself — K ordered rows of
    (step, left, right, merged, pair count). The result is the model
    artifact (O(K) driver state); the oracle re-derives every row by
    replaying training in SQL."""
    merges, _wf = bpe_train(_t(spark, sf_dir, "documents"), k=_BPE_K)
    return spark.createDataFrame(merges, _MERGES_SCHEMA)


_VOCAB_SQL = bpe_train_sql(_BPE_K, merges_select=False) + f"""
SELECT s AS symbol,
       CAST(sum(cnt) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT word) AS BIGINT) AS n_word_types
FROM (
  SELECT word, cnt, unnest(string_split(sym, ' ')) AS s FROM w{_BPE_K}
)
GROUP BY 1
"""


@register("bpe_train_vocab", _VOCAB_SQL)
def q_bpe_train_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained segmentation of the corpus vocabulary: every symbol
    surviving after K merges, with its corpus-weighted token count and
    the number of word types containing it — the table a tokenizer
    build would freeze as its vocab file. Shares the training run with
    ``bpe_train_merges``; one explode over the |vocab|-row frame."""
    _merges, wf = bpe_train(_t(spark, sf_dir, "documents"), k=_BPE_K)
    return (
        wf.select(
            "word",
            "cnt",
            F.explode(F.split(F.col("sym"), " ")).alias("symbol"),
        )
        .groupBy("symbol")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_tokens"),
            F.countDistinct("word").cast("bigint").alias("n_word_types"),
        )
    )


# ---------------------------------------------------------------------------
# URL canonicalization family — the crawl-frontier hygiene ops. The
# raw-URL generator is a SHARED closed-form formula over
# (doc_id, source): content identity (host/path/kept-params/scheme
# class/port class) is a function of m = doc_id % 60 and the source
# label; surface noise that normalization must collapse (upper/lower
# case, www/subdomain prefixes, trailing slashes, tracking params,
# fragments, default ports) is a function of v = doc_id % 7
# (coprime to 60, so every content class sees every variant). The
# NORMALIZERS are two independent implementations of the same spec
# (operators/urls.py Catalyst vs DuckDB regex/list SQL) — the hash
# pins the spec, not a shared code path.
# ---------------------------------------------------------------------------


def _url_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = F.col("doc_id")
    m = d % 60
    v = d % 7
    k = F.substring(F.col("source"), 4, 8).cast("int")
    src = F.col("source")
    scheme = F.when(
        m % 3 == 2,
        F.when(v % 2 == 0, F.lit("HTTPS")).otherwise(F.lit("https")),
    ).otherwise(
        F.when(v % 2 == 0, F.lit("HTTP")).otherwise(F.lit("http"))
    )
    www = (
        F.when(v % 3 == 0, F.lit("WWW.cdn."))
        .when(v % 3 == 1, F.lit("www."))
        .otherwise(F.lit("blog."))
    )
    srccase = F.when(v % 2 == 0, F.upper(src)).otherwise(src)
    tld = (
        F.when(k % 3 == 0, F.lit(".com"))
        .when(k % 3 == 1, F.lit(".net"))
        .otherwise(F.lit(".org"))
    )
    tldcase = F.when(v % 2 == 0, F.upper(tld)).otherwise(tld)
    host = F.concat(www, srccase, F.lit("site"), tldcase)
    port = (
        F.when(
            m % 5 == 0,
            F.when(m % 3 == 2, F.lit(":443")).otherwise(F.lit(":80")),
        )
        .when(m % 5 == 1, F.lit(":8080"))
        .otherwise(F.lit(""))
    )
    trail = (
        F.when(v % 5 == 0, F.lit("//"))
        .when(v % 2 == 0, F.lit("/"))
        .otherwise(F.lit(""))
    )
    path = F.when(m % 11 == 0, F.lit("")).otherwise(
        F.concat(F.lit("/Docs/p"), (m % 12).cast("string"), trail)
    )
    kept = (
        F.when(m % 4 == 0, F.concat(F.lit("id="), (m % 6).cast("string")))
        .when(
            m % 4 == 1,
            F.concat(F.lit("z=2&id="), (m % 6).cast("string")),
        )
        .when(m % 4 == 2, F.lit(""))
        .otherwise(F.lit("q=Ab"))
    )
    track = (
        F.when(v % 3 == 0, F.lit("utm_source=feed"))
        .when(v % 3 == 1, F.lit("fbclid=xYz"))
        .otherwise(F.lit(""))
    )
    qraw = (
        F.when((track == "") & (kept == ""), F.lit(""))
        .when(track == "", F.concat(F.lit("?"), kept))
        .when(kept == "", F.concat(F.lit("?"), track))
        .otherwise(F.concat(F.lit("?"), track, F.lit("&"), kept))
    )
    frag = F.when(v % 2 == 1, F.lit("#Sec1")).otherwise(F.lit(""))
    url = F.concat(scheme, F.lit("://"), host, port, path, qraw, frag)
    return _t(spark, sf_dir, "documents").select(
        "doc_id", "source", url.alias("url_raw")
    )


def _url_raw_sql() -> str:
    """The identical raw-URL formula in DuckDB SQL (shared generator;
    normalization is the independent part)."""
    return """
SELECT doc_id, source,
  (CASE WHEN doc_id % 60 % 3 = 2
        THEN CASE WHEN doc_id % 7 % 2 = 0 THEN 'HTTPS' ELSE 'https' END
        ELSE CASE WHEN doc_id % 7 % 2 = 0 THEN 'HTTP' ELSE 'http' END
   END)
  || '://'
  || (CASE WHEN doc_id % 7 % 3 = 0 THEN 'WWW.cdn.'
           WHEN doc_id % 7 % 3 = 1 THEN 'www.' ELSE 'blog.' END)
  || (CASE WHEN doc_id % 7 % 2 = 0 THEN upper(source) ELSE source END)
  || 'site'
  || (CASE WHEN doc_id % 7 % 2 = 0
        THEN upper(CASE WHEN CAST(substr(source, 4) AS INT) % 3 = 0
                        THEN '.com'
                        WHEN CAST(substr(source, 4) AS INT) % 3 = 1
                        THEN '.net' ELSE '.org' END)
        ELSE CASE WHEN CAST(substr(source, 4) AS INT) % 3 = 0
                  THEN '.com'
                  WHEN CAST(substr(source, 4) AS INT) % 3 = 1
                  THEN '.net' ELSE '.org' END END)
  || (CASE WHEN doc_id % 60 % 5 = 0
        THEN CASE WHEN doc_id % 60 % 3 = 2 THEN ':443' ELSE ':80' END
        WHEN doc_id % 60 % 5 = 1 THEN ':8080' ELSE '' END)
  || (CASE WHEN doc_id % 60 % 11 = 0 THEN ''
        ELSE '/Docs/p' || CAST(doc_id % 60 % 12 AS VARCHAR)
          || (CASE WHEN doc_id % 7 % 5 = 0 THEN '//'
                   WHEN doc_id % 7 % 2 = 0 THEN '/' ELSE '' END) END)
  || (CASE
       WHEN (CASE WHEN doc_id % 7 % 3 = 0 THEN 'utm_source=feed'
                  WHEN doc_id % 7 % 3 = 1 THEN 'fbclid=xYz'
                  ELSE '' END) = ''
        AND (CASE WHEN doc_id % 60 % 4 = 0
                  THEN 'id=' || CAST(doc_id % 60 % 6 AS VARCHAR)
                  WHEN doc_id % 60 % 4 = 1
                  THEN 'z=2&id=' || CAST(doc_id % 60 % 6 AS VARCHAR)
                  WHEN doc_id % 60 % 4 = 2 THEN ''
                  ELSE 'q=Ab' END) = ''
       THEN ''
       WHEN (CASE WHEN doc_id % 7 % 3 = 0 THEN 'utm_source=feed'
                  WHEN doc_id % 7 % 3 = 1 THEN 'fbclid=xYz'
                  ELSE '' END) = ''
       THEN '?' || (CASE WHEN doc_id % 60 % 4 = 0
                  THEN 'id=' || CAST(doc_id % 60 % 6 AS VARCHAR)
                  WHEN doc_id % 60 % 4 = 1
                  THEN 'z=2&id=' || CAST(doc_id % 60 % 6 AS VARCHAR)
                  WHEN doc_id % 60 % 4 = 2 THEN ''
                  ELSE 'q=Ab' END)
       WHEN (CASE WHEN doc_id % 60 % 4 = 0
                  THEN 'id=' || CAST(doc_id % 60 % 6 AS VARCHAR)
                  WHEN doc_id % 60 % 4 = 1
                  THEN 'z=2&id=' || CAST(doc_id % 60 % 6 AS VARCHAR)
                  WHEN doc_id % 60 % 4 = 2 THEN ''
                  ELSE 'q=Ab' END) = ''
       THEN '?' || (CASE WHEN doc_id % 7 % 3 = 0 THEN 'utm_source=feed'
                  WHEN doc_id % 7 % 3 = 1 THEN 'fbclid=xYz'
                  ELSE '' END)
       ELSE '?' || (CASE WHEN doc_id % 7 % 3 = 0 THEN 'utm_source=feed'
                  WHEN doc_id % 7 % 3 = 1 THEN 'fbclid=xYz'
                  ELSE '' END)
            || '&'
            || (CASE WHEN doc_id % 60 % 4 = 0
                  THEN 'id=' || CAST(doc_id % 60 % 6 AS VARCHAR)
                  WHEN doc_id % 60 % 4 = 1
                  THEN 'z=2&id=' || CAST(doc_id % 60 % 6 AS VARCHAR)
                  WHEN doc_id % 60 % 4 = 2 THEN ''
                  ELSE 'q=Ab' END)
     END)
  || (CASE WHEN doc_id % 7 % 2 = 1 THEN '#Sec1' ELSE '' END)
  AS url_raw
FROM documents
"""


def _url_norm_sql_parts() -> dict:
    from ..operators.urls import url_norm_sql

    return url_norm_sql("url_raw")


_URL_NORMALIZE_SQL = f"""
WITH pages AS MATERIALIZED ({_url_raw_sql()})
SELECT doc_id, url_raw,
       {_url_norm_sql_parts()["norm"]} AS url_norm,
       {_url_norm_sql_parts()["domain"]} AS domain
FROM pages
"""


@register("url_normalize", _URL_NORMALIZE_SQL)
def q_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical URL + registered domain for every page — map-only,
    no exchange; the full raw and normalized strings ride in the
    hashed rows so the generator AND both normalizers are pinned."""
    from ..operators.urls import normalize_url, registered_domain

    pages = _url_pages(spark, sf_dir)
    return pages.select(
        "doc_id",
        "url_raw",
        normalize_url(F.col("url_raw")).alias("url_norm"),
        registered_domain(F.col("url_raw")).alias("domain"),
    )


_URL_DEDUP_SQL = f"""
WITH pages AS MATERIALIZED ({_url_raw_sql()}),
norm AS MATERIALIZED (
  SELECT doc_id,
         {_url_norm_sql_parts()["norm"]} AS url_norm,
         {_url_norm_sql_parts()["domain"]} AS domain
  FROM pages
)
SELECT domain,
       CAST(count(*) AS BIGINT) AS n_pages,
       CAST(count(DISTINCT url_norm) AS BIGINT) AS n_urls,
       CAST(count(*) - count(DISTINCT url_norm) AS BIGINT)
         AS n_dup_pages
FROM norm
GROUP BY domain
"""


@register("url_dedup_domains", _URL_DEDUP_SQL)
def q_url_dedup_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-frontier dedup accounting per registered domain: pages
    seen vs distinct canonical URLs (the dupes are exactly the
    surface variants the normalizer collapses). One exchange on
    domain; the distinct is a partial-aggregated count-distinct."""
    from ..operators.urls import normalize_url, registered_domain

    pages = _url_pages(spark, sf_dir)
    norm = pages.select(
        normalize_url(F.col("url_raw")).alias("url_norm"),
        registered_domain(F.col("url_raw")).alias("domain"),
    )
    return norm.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.countDistinct("url_norm").alias("n_urls"),
        (F.count(F.lit(1)) - F.countDistinct("url_norm")).alias(
            "n_dup_pages"
        ),
    )


_BLOCKLIST_SQL = f"""
WITH pages AS MATERIALIZED ({_url_raw_sql()}),
norm AS MATERIALIZED (
  SELECT doc_id,
         {_url_norm_sql_parts()["norm"]} AS url_norm,
         {_url_norm_sql_parts()["domain"]} AS domain
  FROM pages
),
blocked AS (
  SELECT DISTINCT domain FROM norm
  WHERE CAST(substr(split_part(domain, 'site', 1), 4) AS INT) % 4 = 1
)
SELECT n.domain,
       CAST(count(*) AS BIGINT) AS n_pages_kept,
       CAST(count(DISTINCT url_norm) AS BIGINT) AS n_urls_kept
FROM norm n ANTI JOIN blocked b ON n.domain = b.domain
GROUP BY n.domain
"""


@register("domain_blocklist_filter", _BLOCKLIST_SQL)
def q_domain_blocklist_filter(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Domain blocklist filtering the way a 1000-executor crawl does
    it: the blocklist is a SMALL frame broadcast to every executor
    (left_anti hash join, no shuffle of the page side). Here the list
    is derived deterministically (source number % 4 == 1) so the
    oracle can rebuild it; a real UT1/operator blocklist swaps in as
    the same broadcast frame."""
    from ..operators.urls import normalize_url, registered_domain

    pages = _url_pages(spark, sf_dir)
    norm = pages.select(
        normalize_url(F.col("url_raw")).alias("url_norm"),
        registered_domain(F.col("url_raw")).alias("domain"),
    )
    blocked = (
        norm.select("domain")
        .distinct()
        .where(
            F.split(F.col("domain"), "site")
            .getItem(0)
            .substr(4, 8)
            .cast("int")
            % 4
            == 1
        )
    )
    kept = norm.join(F.broadcast(blocked), "domain", "left_anti")
    return kept.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_pages_kept"),
        F.countDistinct("url_norm").alias("n_urls_kept"),
    )


# ---------------------------------------------------------------------------
# dedup_keep_best — cluster-CANONICAL selection: the LSH-verified
# near-dup components keep their HIGHEST-QUALITY member (the learned
# classifier's exact integer margin; ties by lowest id), not the
# arbitrary min-id doc — the SemDeDup/FineWeb refinement of
# dedup_clusters. Composes three existing proven pieces (LSH-verified
# pairs → connected components → classifier margin) plus the new
# argmax-per-cluster aggregate; the oracle replays all three and takes
# the argmax with a window. Scale: the argmax is a struct-min groupBy
# (map-side combinable, no window sort); output is one row per
# cluster.
# ---------------------------------------------------------------------------


def _keep_best_sql() -> str:
    from ..operators.selection import quality_classifier_sql
    from .registry_ext5 import _LSH_VERIFIED_SQL

    low = -(1 << 62)
    return f"""
WITH RECURSIVE pairs AS ({_LSH_VERIFIED_SQL}),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL
  SELECT id_b AS a, id_a AS b FROM pairs
),
reach(id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.a, reach.r FROM reach JOIN edges e ON e.b = reach.id
),
comp AS (SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id),
qc AS (
  SELECT doc_id, margin_num
  FROM ({quality_classifier_sql(with_margin_num=True)})
),
j AS (
  SELECT c.cluster_id, c.doc_id, coalesce(q.margin_num, {low}) AS mn
  FROM comp c LEFT JOIN qc q ON q.doc_id = c.doc_id
),
r AS (
  SELECT cluster_id, doc_id, mn,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY mn DESC, doc_id) AS rk,
         count(*) OVER (PARTITION BY cluster_id) AS nm
  FROM j
)
SELECT cluster_id,
       CAST(nm AS BIGINT) AS n_members,
       CAST(nm - 1 AS BIGINT) AS n_dropped,
       doc_id AS kept_doc_id,
       CAST(NULLIF(mn, {low}) AS BIGINT) AS kept_score
FROM r WHERE rk = 1
"""


@register("dedup_keep_best", _keep_best_sql())
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup
    from ..operators.graph import connected_components
    from ..operators.selection import quality_classifier_margin_num

    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.lsh_verified_pairs(docs, n=3, threshold=0.1)
    comp = connected_components(
        docs.select("doc_id"),
        pairs.select(
            F.col("id_a").alias("src"), F.col("id_b").alias("dst")
        ),
        id_col="doc_id",
    ).select(F.col("id").alias("doc_id"), F.col("component").alias("cluster_id"))
    scores = docs.where(F.col("text").isNotNull()).select(
        "doc_id", quality_classifier_margin_num().alias("mn")
    )
    return dedup.keep_best_per_cluster(comp, scores)


# ---------------------------------------------------------------------------
# stream_minhash_dedup — STREAMING doc-level near-dup ingestion: the
# signature-state member of the streaming dedup family (lines r14,
# images r14, docs here — and the streaming form of the r6 batch
# incremental_dedup gate). Each micro-batch computes k=16 MinHash
# signatures + a content digest, band-joins them against the KEPT
# corpus's signature txn table (+ lower-id docs of the same batch),
# drops docs whose signature agreement ≥ 1/2, and appends survivors'
# signatures to the state — both appends claimed under the epoch id.
# State is FIXED WIDTH per kept doc (16 mins + digest), never text or
# shingle sets. The oracle replays all three increments unrolled
# (kept0 gates batch1, kept0∪kept1 gate batch2), so a dropped batch,
# replay double-apply, out-of-order batches, or a wrong gate rule all
# break the hash.
# ---------------------------------------------------------------------------

_SMH_BATCHES = 3
_SMH_EQ_MIN = 8  # est_jaccard >= 0.5 with k=16 (dyadic — exact both sides)


def _stream_minhash_sql() -> str:
    from .registry_ext import (
        _BAND_KEYS_SQL,
        _BAND_MATCH_SQL,
        _EQ_SUM_SQL,
        _MINHASH_SELECT,
        _NORM_SQL,
        _SHINGLE_HASH_CTE,
    )

    B = _SMH_BATCHES
    parts = [
        f"""{_SHINGLE_HASH_CTE},
sigs AS ({_MINHASH_SELECT}),
banded AS MATERIALIZED (
  SELECT s.*, {_BAND_KEYS_SQL}, d.digest, s.doc_id % {B} AS batch
  FROM sigs s
  JOIN (SELECT doc_id, md5({_NORM_SQL}) AS digest
        FROM documents WHERE text IS NOT NULL) d USING (doc_id)
)"""
    ]
    kept_union = ""
    for i in range(B):
        state = (
            f" OR (b.batch < {i} AND b.doc_id IN ({kept_union}))"
            if i
            else ""
        )
        parts.append(
            f"""match{i} AS MATERIALIZED (
  SELECT a.doc_id AS id, min(b.doc_id) AS matched_id,
         max(CASE WHEN a.digest = b.digest THEN 1 ELSE 0 END)
           AS anyexact
  FROM banded a JOIN banded b
    ON ({_BAND_MATCH_SQL})
   AND ((b.batch = {i} AND b.doc_id < a.doc_id){state})
  WHERE a.batch = {i} AND ({_EQ_SUM_SQL}) >= {_SMH_EQ_MIN}
  GROUP BY a.doc_id
),
kept{i} AS MATERIALIZED (
  SELECT doc_id FROM banded WHERE batch = {i}
    AND doc_id NOT IN (SELECT id FROM match{i})
)"""
        )
        kept_union = " UNION ALL ".join(
            f"SELECT doc_id FROM kept{j}" for j in range(i + 1)
        )
    per = "\nUNION ALL ".join(
        f"""SELECT b.doc_id, CAST({i} AS INT) AS batch_idx,
       CASE WHEN m.id IS NULL THEN 'kept'
            WHEN m.anyexact = 1 THEN 'exact_dup'
            ELSE 'near_dup' END AS status,
       m.matched_id
FROM banded b LEFT JOIN match{i} m ON m.id = b.doc_id
WHERE b.batch = {i}"""
        for i in range(B)
    )
    return ",\n".join(parts) + "\n" + per


@register("stream_minhash_dedup", _stream_minhash_sql())
def q_stream_minhash_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.dedup import minhash_dedup_increment
    from ..sources.txnlog import TxnTable
    from .phases import timed_phase
    from .registry import drain_stream
    from .registry_ext12 import _tmp_table_path
    from .registry_ext18 import write_drop_files_one_pass

    with timed_phase("stream_minhash_dedup.build"):
        base = _tmp_table_path(sf_dir, "minhashdedupstream")
        drops = f"{base}/drops"
        docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
        write_drop_files_one_pass(
            docs, F.col("doc_id") % _SMH_BATCHES, _SMH_BATCHES, drops
        )
        docs_tbl = TxnTable(spark, f"{base}/docs")
        state_tbl = TxnTable(spark, f"{base}/sigs")

        def ingest(batch_df: DataFrame, batch_id: int) -> None:
            seen = (
                None
                if state_tbl.latest_version() is None
                else state_tbl.scan()
            )
            per_doc, new_state = minhash_dedup_increment(
                batch_df, seen
            )
            per_doc = per_doc.withColumn(
                "batch_idx", F.lit(batch_id).cast("int")
            )
            # No output checkpoints (r15): the expensive shared
            # subframes (signatures, the band-match aggregate) are
            # already lazily checkpointed INSIDE the increment, so
            # each append's single data-write pass evaluates only the
            # cheap derivation on top of them — an eager cut per
            # output just doubled those tiny passes.
            # docs before sigs: crash-replay recomputes against the
            # unchanged state, so the claimed epoch skips cleanly
            docs_tbl.append(per_doc, batch_id=batch_id)
            state_tbl.append(new_state, batch_id=batch_id)

        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
            ]
        )
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(drops)
            .writeStream.foreachBatch(ingest)
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        drain_stream(q)
    return docs_tbl.scan().select(
        "doc_id", "batch_idx", "status", "matched_id"
    )


# ---------------------------------------------------------------------------
# warc_scan — the crawl CONTAINER format read natively: documents are
# rendered into three deterministic WARC/1.0 files (one per doc_id%3;
# the third as the per-record-member .warc.gz real crawls ship),
# response records wrapping each text in a minimal HTTP/1.1 envelope,
# then read back through sources/warc.py's binaryFile→mapInArrow
# parser. The oracle predicts every parsed field arithmetically from
# the documents table (envelope lengths are closed-form, the body md5
# is DuckDB's own md5 of the text), so a header-scan, Content-Length,
# HTTP-split, gzip-member, or charset bug anywhere in the parser
# breaks the hash. Scale: one file per task is THE WARC parallelism
# model (member-gzip is unsplittable; crawls ship thousands of ~1 GB
# files).
# ---------------------------------------------------------------------------

#: HTTP/1.1 envelope the fixture writer prepends to response bodies.
_WARC_HTTP_HEAD = 44  # "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"

_WARC_SQL = f"""
SELECT doc_id,
       'response' AS warc_type,
       CAST(200 AS INT) AS http_status,
       CAST({_WARC_HTTP_HEAD} + octet_length(encode(text)) AS BIGINT)
         AS content_length,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_body_bytes,
       md5(text) AS body_md5,
       (doc_id % 3 = 2) AS from_gz
FROM documents WHERE text IS NOT NULL
"""


@register("warc_scan", _WARC_SQL)
def q_warc_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..sources.warc import (
        read_warc,
        warc_record_bytes,
        write_warc_file,
    )
    from .registry_ext12 import _tmp_table_path

    base = _tmp_table_path(sf_dir, "warcscan")
    os.makedirs(base, exist_ok=True)
    docs = (
        _t(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id", "text")
        .collect()
    )  # fixture generation only — the READ path is the operator
    for part in range(3):
        recs = [
            warc_record_bytes(
                record_id=f"<urn:uuid:{r['doc_id']:032d}>",
                target_uri=f"http://example.org/doc/{r['doc_id']}",
                body=r["text"].encode("utf-8"),
            )
            for r in docs
            if r["doc_id"] % 3 == part
        ]
        gz = part == 2
        write_warc_file(
            f"{base}/part{part}.warc" + (".gz" if gz else ""),
            recs,
            gz=gz,
        )
    parsed = read_warc(spark, base)
    return parsed.select(
        F.regexp_extract(F.col("target_uri"), "doc/([0-9]+)$", 1)
        .cast("long")
        .alias("doc_id"),
        "warc_type",
        "http_status",
        "content_length",
        F.length(F.col("body")).cast("bigint").alias("n_body_bytes"),
        F.md5(F.col("body")).alias("body_md5"),
        F.col("path").endswith(".gz").alias("from_gz"),
    )


# ---------------------------------------------------------------------------
# bpe_train_encode — the train→apply composition: documents of the
# eval slice (doc_id % 5 == 0) are tokenized UNDER THE LEARNED
# SEGMENTATION by joining their words against the trained
# word-frequency frame (words → final symbol strings — the dictionary
# broadcast join that is the fast path for applying a trained
# tokenizer to text drawn from its training distribution; unseen
# words would fall back to the merge-replay, not needed here since
# training saw the whole corpus). Per-doc word/token/char counts are
# hashed; the oracle recomputes them from the same unrolled training
# chain.
# ---------------------------------------------------------------------------

_ENCODE_SQL = bpe_train_sql(_BPE_K, merges_select=False) + f""",
seg AS (
  SELECT word, len(string_split(sym, ' ')) AS n_sym FROM w{_BPE_K}
),
ew AS (
  SELECT doc_id, word FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word
    FROM documents WHERE doc_id % 5 = 0
  ) WHERE regexp_matches(word, '^[a-z]+$')
)
SELECT ew.doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(seg.n_sym) AS BIGINT) AS n_tokens,
       CAST(sum(length(ew.word)) AS BIGINT) AS n_chars
FROM ew JOIN seg ON seg.word = ew.word
GROUP BY ew.doc_id
"""


@register("bpe_train_encode", _ENCODE_SQL)
def q_bpe_train_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    _merges, wf = bpe_train(docs, k=_BPE_K)
    seg = wf.select(
        "word",
        F.size(F.split(F.col("sym"), " ")).alias("n_sym"),
    )
    ew = (
        docs.where(F.col("doc_id") % 5 == 0)
        .select(
            "doc_id",
            F.explode(F.split(F.col("text"), " ")).alias("word"),
        )
        .where(F.col("word").rlike("^[a-z]+$"))
    )
    return (
        ew.join(F.broadcast(seg), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sym").cast("bigint").alias("n_tokens"),
            F.sum(F.length("word")).cast("bigint").alias("n_chars"),
        )
    )


# ---------------------------------------------------------------------------
# robots_gate — RFC 9309 crawl politeness over the URL fixture: each
# domain's deterministic rule list (a blanket '/Docs/p1' disallow
# everywhere; a longer '/Docs/p10' allow that re-opens one subtree —
# the longest-match override the RFC is about; a root '/' disallow on
# every 4th domain; an extra '/Docs/p2' disallow on the next class)
# gates the normalized paths: longest matching prefix wins, allow
# wins length ties, no match ⇒ allowed. The decision, the winning
# rule, and its polarity ride in the hashed rows for every page.
# ---------------------------------------------------------------------------

_ROBOTS_SQL = f"""
WITH pages AS MATERIALIZED ({_url_raw_sql()}),
norm AS MATERIALIZED (
  SELECT doc_id,
         {_url_norm_sql_parts()["path"]} AS path,
         {_url_norm_sql_parts()["domain"]} AS domain
  FROM pages
),
doms AS (
  SELECT DISTINCT domain,
         CAST(substr(split_part(domain, 'site', 1), 4) AS INT) AS k
  FROM norm
),
rules AS (
  SELECT domain, '/Docs/p1' AS prefix, FALSE AS is_allow FROM doms
  UNION ALL SELECT domain, '/Docs/p10', TRUE FROM doms
  UNION ALL SELECT domain, '/', FALSE FROM doms WHERE k % 4 = 0
  UNION ALL SELECT domain, '/Docs/p2', FALSE FROM doms WHERE k % 4 = 1
),
cand AS (
  SELECT n.doc_id, r.prefix, r.is_allow
  FROM norm n JOIN rules r
    ON r.domain = n.domain AND starts_with(n.path, r.prefix)
),
best AS (
  SELECT doc_id, prefix, is_allow FROM (
    SELECT doc_id, prefix, is_allow,
           row_number() OVER (
             PARTITION BY doc_id
             ORDER BY len(prefix) DESC, is_allow DESC, prefix DESC
           ) AS rk
    FROM cand
  ) WHERE rk = 1
)
SELECT n.doc_id, n.domain, n.path,
       coalesce(b.is_allow, TRUE) AS allowed,
       b.prefix AS rule_prefix,
       b.is_allow AS rule_is_allow
FROM norm n LEFT JOIN best b ON b.doc_id = n.doc_id
"""


@register("robots_gate", _ROBOTS_SQL)
def q_robots_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.urls import (
        registered_domain,
        robots_decisions,
        url_path_norm,
    )

    pages = _url_pages(spark, sf_dir).select(
        "doc_id",
        url_path_norm(F.col("url_raw")).alias("path"),
        registered_domain(F.col("url_raw")).alias("domain"),
    )
    doms = pages.select("domain").distinct().select(
        "domain",
        F.split(F.col("domain"), "site")
        .getItem(0)
        .substr(4, 8)
        .cast("int")
        .alias("k"),
    )

    def _r(df: DataFrame, prefix: str, allow: bool) -> DataFrame:
        return df.select(
            "domain",
            F.lit(prefix).alias("prefix"),
            F.lit(allow).alias("is_allow"),
        )

    rules = (
        _r(doms, "/Docs/p1", False)
        .unionByName(_r(doms, "/Docs/p10", True))
        .unionByName(_r(doms.where(F.col("k") % 4 == 0), "/", False))
        .unionByName(
            _r(doms.where(F.col("k") % 4 == 1), "/Docs/p2", False)
        )
    )
    return robots_decisions(pages, rules)
