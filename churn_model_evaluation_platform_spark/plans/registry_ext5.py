"""Round-2 registry extensions: reference model-quality parity,
evaluation artifacts (ROC/PR/confusion), composed LSH-verified dedup,
multi-probe ANN.

Same conventions as registry.py: every computed column aliased
identically on both engines; order-dependent float aggregates rounded
on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup
from ..sources.testdata import load_table
from .registry import drain_stream, register
from .registry_ext import (
    _BAND_KEYS_SQL,
    _BAND_MATCH_SQL,
    _MINHASH_SELECT,
    _SHINGLE_HASH_CTE,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


# ---------------------------------------------------------------------------
# §2.C — reference model-quality parity (VERDICT r1 top-next)
# ---------------------------------------------------------------------------


@register("train_eval_churn")  # rows-only: model training, not SQL-expressible
def q_train_eval_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the engine's full Spark pipeline on the reference's own
    churn data and report holdout P/R/F1 next to the published targets
    (churn_model_training.py:335-376; published scores
    churn_model_training.ipynb cell 19 = 0.92/0.81/0.86)."""
    from ..ml.parity import train_eval_frame

    return train_eval_frame(spark)


# ---------------------------------------------------------------------------
# LLM-pipeline dedup — the composed scale path (VERDICT r1 #4)
# ---------------------------------------------------------------------------


_LSH_VERIFIED_SQL = f"""
{_SHINGLE_HASH_CTE},
sigs AS ({_MINHASH_SELECT}),
banded AS (SELECT sigs.*, {_BAND_KEYS_SQL} FROM sigs),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.doc_id < b.doc_id AND ({_BAND_MATCH_SQL})
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT c.id_a, c.id_b, count(*) AS common
  FROM cand c
  JOIN sh a ON a.doc_id = c.id_a
  JOIN sh b ON b.doc_id = c.id_b AND b.h = a.h
  GROUP BY c.id_a, c.id_b
)
SELECT id_a, id_b,
       CAST(common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - common AS DOUBLE) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - common AS DOUBLE) >= 0.1
"""


@register("dedup_lsh_verified", _LSH_VERIFIED_SQL)
def q_dedup_lsh_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Banded-LSH candidates → exact array_intersect Jaccard on the
    # candidates only — the near-linear 100 TB dedup path.
    return dedup.lsh_verified_pairs(
        _t(spark, sf_dir, "documents"), n=3, threshold=0.1
    )


@register(
    "dedup_clusters",
    f"""
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
)
SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id
""",
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pairs → CLUSTERS: connected components (min-label propagation)
    # over the LSH-verified near-dup graph; cluster_id = min doc id of
    # the component, so `doc_id == cluster_id` marks the canonical doc
    # a dedup job keeps. Oracle: DuckDB recursive-CTE reachability.
    from ..operators.graph import connected_components

    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.lsh_verified_pairs(docs, n=3, threshold=0.1)
    comp = connected_components(
        docs.select("doc_id"),
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        id_col="doc_id",
    )
    return comp.select(
        F.col("id").alias("doc_id"), F.col("component").alias("cluster_id")
    )


@register(
    "tfidf_top_terms",
    """
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS token
  FROM documents WHERE text IS NOT NULL
),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
dfq AS (SELECT token AS t2, COUNT(*) AS df_cnt FROM tf GROUP BY token),
nd AS (SELECT COUNT(*) AS n_docs FROM documents WHERE text IS NOT NULL),
scored AS (
  SELECT tf.doc_id, tf.token,
         round(tf * (ln((n_docs + 1.0) / (df_cnt + 1.0)) + 1.0), 6) AS tfidf
  FROM tf, dfq, nd WHERE dfq.t2 = tf.token
),
ranked AS (
  SELECT doc_id, token, tfidf,
         row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rk
  FROM scored
)
SELECT doc_id, token, tfidf FROM ranked WHERE rk <= 3
""",
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-doc characteristic terms: one explode+groupBy, df from the tf
    # frame, broadcast N, per-doc window ranking on the pre-rounded
    # score (libm-vs-JVM ln noise can't flip an order).
    from ..operators.text import tfidf_top_terms

    return tfidf_top_terms(_t(spark, sf_dir, "documents"), k=3)


@register(
    "impute_median",
    """
WITH holed AS (
  SELECT event_id, CASE WHEN user_id % 10 = 0 THEN NULL ELSE value END AS value
  FROM events
),
med AS (SELECT quantile_cont(value, 0.5) AS m FROM holed)
SELECT event_id, round(COALESCE(value, m), 6) AS value
FROM holed, med
""",
)
def q_impute_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Median imputation over deterministically-injected nulls (testdata
    # carries none): one agg for the median, broadcast, coalesce.
    from ..operators.prep import impute_median

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("user_id") % 10 == 0, F.lit(None)).otherwise(
            F.col("value")
        ).alias("value"),
    )
    return impute_median(ev, ["value"]).select(
        "event_id", F.round("value", 6).alias("value")
    )


@register(
    "percentile_exact",
    """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY event_type
""",
)
def q_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact interpolated percentiles per group (Spark `percentile` ==
    # SQL-standard quantile_cont linear interpolation). Exact ordering
    # statistics shuffle per-group sorted values — use
    # percentile_approx/t-digest at 100 TB when 0.1% error is fine;
    # this is the exact-answer path.
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        *[
            F.round(
                F.expr(f"percentile(value, {q})"), 6
            ).alias(f"p{int(q * 100)}")
            for q in (0.5, 0.9, 0.99)
        ]
    )


_MIX_WEIGHTS = {"en": 0.5, "zh": 0.2, "de": 0.2, "fr": 0.1, "es": 0.1}


def _weighted_sample_sql() -> str:
    from ..functions.hashing import md5_hash_int_sql

    h = md5_hash_int_sql("CAST(doc_id AS VARCHAR)")
    frac = "CASE lang " + " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in sorted(_MIX_WEIGHTS.items())
    ) + " ELSE 0.0 END"
    return f"""
WITH ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY {h}, doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM documents
)
SELECT doc_id, lang FROM ranked WHERE rn <= ceil(n * ({frac}))
"""


@register("weighted_sample", _weighted_sample_sql())
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Data-mixing sampler: per-language mixture weights as exact
    # per-stratum fractions in portable-hash order — the training-data
    # recipe step, identical row sets on both engines.
    from ..operators.prep import weighted_sample_exact

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return weighted_sample_exact(docs, "lang", _MIX_WEIGHTS, "doc_id")


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
_CORR_PAIRS = [
    (a, b) for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i + 1 :]
]


@register(
    "corr_matrix",
    "\nUNION ALL\n".join(
        f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
        f'round(corr({a}, {b}), 6) AS "corr" FROM lineitem'
        for a, b in _CORR_PAIRS
    ),
)
def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pairwise Pearson over the feature columns — all 6 pairs in ONE
    # aggregation pass (partial co-moments per partition).
    from ..operators.eda import corr_matrix

    return corr_matrix(_t(spark, sf_dir, "lineitem"), _CORR_COLS)


def _curation_sql() -> str:
    """Whole-pipeline LLM-curation oracle, assembled from the already-
    verified fragments: quality gates → LSH+verify near-dup graph on the
    kept docs → connected components (recursive CTE) → canonical docs →
    token accounting."""
    from .registry import _ORACLES
    from .registry_ext import _TOKENS_SQL

    qual = _ORACLES["quality_filter"]
    lshv = _LSH_VERIFIED_SQL.replace("FROM documents", "FROM keptdocs")
    return f"""
WITH RECURSIVE qual AS ({qual}),
keptdocs AS (
  SELECT d.* FROM documents d JOIN qual ON qual.doc_id = d.doc_id AND qual.keep
),
pairs AS ({lshv}),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL
  SELECT id_b AS a, id_a AS b FROM pairs
),
reach(id, r) AS (
  SELECT doc_id, doc_id FROM keptdocs
  UNION
  SELECT e.a, reach.r FROM reach JOIN edges e ON e.b = reach.id
),
comp AS (SELECT id, MIN(r) AS cluster FROM reach GROUP BY id),
canon AS (SELECT id FROM comp WHERE id = cluster),
tok2 AS (SELECT doc_id, len({_TOKENS_SQL}) AS n_tokens FROM keptdocs)
SELECT CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_docs,
       CAST((SELECT COUNT(*) FROM keptdocs) AS BIGINT) AS n_quality,
       CAST((SELECT COUNT(*) FROM canon) AS BIGINT) AS n_canonical,
       CAST((SELECT SUM(n_tokens) FROM tok2 JOIN canon ON canon.id = tok2.doc_id)
            AS BIGINT) AS total_tokens
"""


@register("corpus_curation", _curation_sql())
def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LLM-side whole-pipeline differential (the curation analog of
    monitoring_metrics_full): Gopher-style quality gates → LSH-verified
    near-dup graph → connected components → keep canonical docs → token
    accounting. One summary row, every count exact."""
    from ..operators.graph import connected_components
    from ..operators.text import quality_filter, tokens

    docs = _t(spark, sf_dir, "documents")
    kept = (
        quality_filter(docs)
        .where("keep")
        .select("doc_id")
        .join(docs, "doc_id")
    )
    pairs = dedup.lsh_verified_pairs(kept, n=3, threshold=0.1)
    comp = connected_components(
        kept.select("doc_id"),
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        id_col="doc_id",
    )
    canon = comp.where(F.col("id") == F.col("component")).select(
        F.col("id").alias("doc_id")
    )
    canon_tokens = kept.join(canon, "doc_id").select(
        F.size(tokens(F.col("text"))).alias("n_tokens")
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    n_quality = kept.agg(F.count(F.lit(1)).alias("n_quality"))
    n_canonical = canon.agg(F.count(F.lit(1)).alias("n_canonical"))
    total = canon_tokens.agg(
        F.sum("n_tokens").cast("bigint").alias("total_tokens")
    )
    return (
        n_docs.crossJoin(F.broadcast(n_quality))
        .crossJoin(F.broadcast(n_canonical))
        .crossJoin(F.broadcast(total))
    )


def _edit_distance_sql() -> str:
    """SimHash candidates (bit-exact shared SQL) → Levenshtein verify,
    restricted exactly like the Spark composition: the expensive DP runs
    only on pairs within max_hamming bits."""
    from .registry_ext import _SIMHASH_SQL

    return f"""
WITH sh AS ({_SIMHASH_SQL}),
norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
  FROM documents WHERE text IS NOT NULL
),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
)
SELECT id_a, id_b, hamming,
       CAST(levenshtein(na.norm, nb.norm) AS INT) AS edit_distance
FROM cand
JOIN norm na ON na.doc_id = id_a
JOIN norm nb ON nb.doc_id = id_b
WHERE levenshtein(na.norm, nb.norm) <= 20
"""


@register("dedup_edit_distance", _edit_distance_sql())
def q_dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Typo-class near-dups: SimHash pigeonhole candidates verified by
    # Levenshtein on normalized text — the O(len^2) DP never runs
    # all-pairs.
    return dedup.edit_distance_pairs(
        _t(spark, sf_dir, "documents"), max_edit=20, max_hamming=3, chunks=4
    )


@register(
    "multimodal_probe",
    """
SELECT doc_id AS media_id,
       CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
                       WHEN 2 THEN 'wav' ELSE 'mp4' END AS format,
       CASE doc_id % 4 WHEN 0 THEN CAST(16 + doc_id % 640 AS INT)
                       WHEN 1 THEN CAST(8 + doc_id % 100 AS INT)
                       WHEN 3 THEN CAST(16 + doc_id % 320 AS INT) END AS width,
       CASE doc_id % 4 WHEN 0 THEN CAST(16 + doc_id % 480 AS INT)
                       WHEN 1 THEN CAST(8 + doc_id % 80 AS INT)
                       WHEN 3 THEN CAST(16 + doc_id % 240 AS INT) END AS height,
       CASE doc_id % 4 WHEN 2 THEN CAST(44100 AS INT) END AS sample_rate,
       CASE doc_id % 4 WHEN 2 THEN CAST(100 * (1 + doc_id % 5) AS INT)
                       WHEN 3 THEN CAST(250 * (1 + doc_id % 8) AS INT) END AS duration_ms,
       CASE doc_id % 4 WHEN 3 THEN CAST(1 + doc_id % 3 AS INT) END AS track_count,
       CASE WHEN doc_id % 4 = 3 THEN
         CASE doc_id % 5 WHEN 0 THEN 'avc1' WHEN 1 THEN 'mp4a'
              WHEN 2 THEN 'hvc1' WHEN 3 THEN 'av01' ELSE 'vp09' END
       END AS codec
FROM documents
""",
)
def q_multimodal_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL multimodal metadata extraction: valid PNG/GIF/WAV/MP4
    container bytes are synthesized per id, then ``probe_media`` parses
    the headers back (pure byte parsing — incl. the ISO-BMFF box walk
    for mvhd duration / trak count / stsd codec fourcc — mapInPandas,
    zero shuffle). The oracle predicts every field arithmetically — if
    either the builder or the parser is wrong, the hashes diverge.
    Pixel/sample decode remains the (stubbed) step that needs codec
    libraries."""
    import pandas as _pd

    from ..operators.multimodal import probe_media, synth_media_bytes

    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "content": [
                        synth_media_bytes(int(m)) for m in pdf["doc_id"]
                    ],
                }
            )

    media = docs.mapInPandas(synth, "media_id long, content binary")
    return probe_media(media)


@register(
    "multimodal_decode",
    """
WITH png AS (
  SELECT doc_id AS media_id, 4 + doc_id % 13 AS w, 4 + doc_id % 11 AS h
  FROM documents WHERE doc_id % 4 = 0
),
png_s AS (
  SELECT media_id, 'png' AS format, CAST(w * h * 3 AS BIGINT) AS n_values,
         round(avg((media_id + 11 * y + j) % 256), 6) AS mean_value,
         CAST(min((media_id + 11 * y + j) % 256) AS DOUBLE) AS min_value,
         CAST(max((media_id + 11 * y + j) % 256) AS DOUBLE) AS max_value
  FROM png
  CROSS JOIN generate_series(0, 13) ys(y)
  CROSS JOIN generate_series(0, 47) js(j)
  WHERE y < h AND j < 3 * w
  GROUP BY media_id, w, h
),
bmp AS (
  SELECT doc_id AS media_id, 4 + doc_id % 9 AS w, 4 + doc_id % 7 AS h
  FROM documents WHERE doc_id % 4 = 1
),
bmp_s AS (
  SELECT media_id, 'bmp' AS format, CAST(w * h * 3 AS BIGINT) AS n_values,
         round(avg((media_id + 5 * y + j) % 256), 6) AS mean_value,
         CAST(min((media_id + 5 * y + j) % 256) AS DOUBLE) AS min_value,
         CAST(max((media_id + 5 * y + j) % 256) AS DOUBLE) AS max_value
  FROM bmp
  CROSS JOIN generate_series(0, 9) ys(y)
  CROSS JOIN generate_series(0, 35) js(j)
  WHERE y < h AND j < 3 * w
  GROUP BY media_id, w, h
),
wav AS (
  SELECT doc_id AS media_id, 256 + doc_id % 200 AS n
  FROM documents WHERE doc_id % 4 = 2
),
wav_s AS (
  SELECT media_id, 'wav' AS format, CAST(n AS BIGINT) AS n_values,
         round(avg(((media_id * 31 + i * 7) % 4096) - 2048), 6) AS mean_value,
         CAST(min(((media_id * 31 + i * 7) % 4096) - 2048) AS DOUBLE) AS min_value,
         CAST(max(((media_id * 31 + i * 7) % 4096) - 2048) AS DOUBLE) AS max_value
  FROM wav
  CROSS JOIN generate_series(0, 455) iss(i)
  WHERE i < n
  GROUP BY media_id, n
),
gif AS (
  SELECT doc_id AS media_id, 4 + doc_id % 11 AS w, 4 + doc_id % 13 AS h
  FROM documents WHERE doc_id % 4 = 3
),
gif_s AS (
  SELECT media_id, 'gif' AS format, CAST(w * h * 3 AS BIGINT) AS n_values,
         round(avg((media_id + 3 * ((media_id + 3 * y + x) % 8) + k) % 256), 6) AS mean_value,
         CAST(min((media_id + 3 * ((media_id + 3 * y + x) % 8) + k) % 256) AS DOUBLE) AS min_value,
         CAST(max((media_id + 3 * ((media_id + 3 * y + x) % 8) + k) % 256) AS DOUBLE) AS max_value
  FROM gif
  CROSS JOIN generate_series(0, 16) ys(y)
  CROSS JOIN generate_series(0, 14) xs(x)
  CROSS JOIN generate_series(0, 2) ks(k)
  WHERE y < h AND x < w
  GROUP BY media_id, w, h
)
SELECT * FROM png_s UNION ALL SELECT * FROM bmp_s
UNION ALL SELECT * FROM wav_s UNION ALL SELECT * FROM gif_s
""",
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel/sample decode (no codec libraries): complete PNG / BMP
    / WAV / GIF files are synthesized per doc id — valid CRCs,
    zlib-compressed filtered PNG scanlines, stride-padded bottom-up BMP
    rows, PCM16 WAV frames, genuinely LZW-compressed GIF frames — then
    ``decode_media`` inflates/unfilters/unpacks them back to raw values
    with the stdlib. The oracle predicts every decoded statistic
    arithmetically from the generator formulas, so an error in EITHER
    the encoder or the decoder breaks the hash. JPEG pixel decode is
    covered by its own query (`multimodal_decode_jpeg`, registry_ext6)
    with a real baseline-sequential Huffman+IDCT decoder."""
    import pandas as _pd

    from ..operators.multimodal import decode_media, synth_decodable_media_bytes

    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "content": [
                        synth_decodable_media_bytes(int(m)) for m in pdf["doc_id"]
                    ],
                }
            )

    media = docs.mapInPandas(synth, "media_id long, content binary")
    return decode_media(media)


@register(
    "lm_score",
    """
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS token
  FROM documents WHERE text IS NOT NULL
),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
cnt AS (SELECT token AS t2, SUM(tf) AS c FROM tf GROUP BY token),
tot AS (SELECT SUM(c) AS t_total, COUNT(*) AS v FROM cnt)
SELECT tf.doc_id,
       CAST(SUM(tf) AS BIGINT) AS n_tokens,
       round(SUM(tf * ln((c + 1.0) / (t_total + v))) / SUM(tf), 6) AS lm_logprob
FROM tf JOIN cnt ON cnt.t2 = tf.token, tot
GROUP BY tf.doc_id
""",
)
def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Unigram-LM mean token log-prob per doc (perplexity-proxy quality
    # signal): corpus counts derive from the tf frame, single broadcast
    # (T, V) row, one final groupBy(doc).
    from ..operators.text import lm_score

    return lm_score(_t(spark, sf_dir, "documents"))


# PII injection applied identically on both engines so the scrub regexes
# exercise real matches (the synthetic corpus carries no natural PII):
# every 5th doc gains an email + IP, every 3rd a phone number.
_PII_AUG_SQL = """
SELECT doc_id,
       text
       || CASE WHEN doc_id % 5 = 0
               THEN ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com at 192.168.' || CAST(doc_id % 256 AS VARCHAR) || '.1'
               ELSE '' END
       || CASE WHEN doc_id % 3 = 0 THEN ' call +1 (555) 123-4567' ELSE '' END
       AS text
FROM documents WHERE text IS NOT NULL
"""

_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_IPV4 = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
_PII_PHONE = "\\+?[0-9][0-9()\\- ]{7,}[0-9]"


@register(
    "pii_scrub",
    f"""
WITH aug AS ({_PII_AUG_SQL})
SELECT doc_id,
       len(regexp_extract_all(text, '{_PII_EMAIL}')) AS n_email,
       len(regexp_extract_all(text, '{_PII_IPV4}')) AS n_ipv4,
       len(regexp_extract_all(text, '{_PII_PHONE}')) AS n_phone,
       md5(regexp_replace(regexp_replace(regexp_replace(text,
             '{_PII_EMAIL}', '<EMAIL>', 'g'),
             '{_PII_IPV4}', '<IP>', 'g'),
             '{_PII_PHONE}', '<PHONE>', 'g')) AS scrubbed_md5
FROM aug
""",
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    # PII detect+redact over deterministically-injected emails/IPs/
    # phones; the scrubbed text is md5-compared so the full replacement
    # pipeline must match byte-for-byte.
    from ..operators.text import pii_scrub

    docs = _t(spark, sf_dir, "documents")
    aug = docs.where(F.col("text").isNotNull()).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com at 192.168."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit(".1"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 3 == 0, F.lit(" call +1 (555) 123-4567")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return pii_scrub(aug).select(
        "doc_id",
        "n_email",
        "n_ipv4",
        "n_phone",
        F.md5("scrubbed").alias("scrubbed_md5"),
    )


@register(
    "doc_chunks",
    """
WITH tok AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS tk
  FROM documents WHERE text IS NOT NULL
),
st AS (
  SELECT doc_id, tk, unnest(range(0, greatest(len(tk), 1), 40)) AS start
  FROM tok
)
SELECT doc_id,
       CAST(start // 40 AS INT) AS chunk_index,
       CAST(len(tk[start + 1 : start + 50]) AS INT) AS n_tokens,
       array_to_string(tk[start + 1 : start + 50], ' ') AS chunk_text
FROM st
""",
)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Overlapping token windows (50 tokens, stride 40): the training-
    # sample chunking pass as pure sequence+explode+slice expressions.
    from ..operators.text import doc_chunks

    return doc_chunks(_t(spark, sf_dir, "documents"), 50, 10)


@register(
    "embedding_drift",
    """
WITH r AS (
  SELECT pos, round(AVG(CAST(v AS DOUBLE)), 6) AS mr
  FROM (SELECT unnest(embedding) AS v,
               generate_subscripts(embedding, 1) - 1 AS pos
        FROM embeddings WHERE vec_id % 2 = 0)
  GROUP BY pos
),
c AS (
  SELECT pos, round(AVG(CAST(v AS DOUBLE)), 6) AS mc
  FROM (SELECT unnest(embedding) AS v,
               generate_subscripts(embedding, 1) - 1 AS pos
        FROM embeddings WHERE vec_id % 2 = 1)
  GROUP BY pos
)
SELECT round(SUM(mr*mc) / (sqrt(SUM(mr*mr)) * sqrt(SUM(mc*mc))), 6)
       AS centroid_cosine
FROM r JOIN c USING (pos)
""",
)
def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Embedding-space drift: centroid cosine between an even/odd split
    # of the corpus (near-random vectors → centroids near-orthogonal,
    # so the metric visibly separates from the no-shift value 1.0).
    from ..operators.similarity import embedding_drift

    emb = _t(spark, sf_dir, "embeddings")
    return embedding_drift(
        emb.where(F.col("vec_id") % 2 == 0),
        emb.where(F.col("vec_id") % 2 == 1),
    )


# ---------------------------------------------------------------------------
# JSONL source/sink — the de-facto LLM corpus interchange format
# ---------------------------------------------------------------------------


@register(
    "jsonl_scan",
    "SELECT doc_id, lang, text FROM documents",
)
def q_jsonl_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL roundtrip: write the documents table as newline-delimited
    JSON (Spark's native `json` format IS jsonl — one object per line,
    splittable, multi-part) and read it back with an EXPLICIT schema (no
    inference pass over 100 TB). String/integer columns only, so the
    text roundtrip is exact by construction."""
    import os

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    out = f"/tmp/spark_graft_jsonl_{os.path.basename(os.path.normpath(sf_dir))}"
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    docs.write.mode("overwrite").json(out)
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("lang", StringType(), True),
            StructField("text", StringType(), True),
        ]
    )
    return spark.read.schema(schema).json(out)


# ---------------------------------------------------------------------------
# Streaming: exactly-once de-duplication over a file-drop stream
# ---------------------------------------------------------------------------


@register(
    "stream_dedup",
    "SELECT DISTINCT user_id, event_type FROM events",
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Streaming dropDuplicates: state keyed by the dedup key emits each
    # key's first arrival (append mode). The state store holds KEYS,
    # never rows; at 100 TB use dropDuplicatesWithinWatermark so event-
    # time expiry bounds the key set (tests/test_streaming_ext.py).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream = (
        spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    dedup_stream = stream.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )
    name = "stream_dedup_result"
    q = (
        dedup_stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    drain_stream(q)
    return spark.table(name)


# ---------------------------------------------------------------------------
# §2.C evaluation artifacts — ROC / PR / confusion / AUC
# (mlflow_eval_suite's plots as DataFrames, churn_model_training.py:144-168)
# ---------------------------------------------------------------------------

# Synthetic calibrated score on events: label = value > 50, proba = a
# clamped affine transform of (value + user noise) — deterministic,
# pure rational arithmetic (bit-identical across engines, no rounding).
_PROBA_SQL = """
SELECT CAST(value > 50 AS INT) AS churn,
       least(greatest((value + (user_id % 11) - 45.0) / 20.0, 0.0), 1.0) AS proba
FROM events
"""


def _proba_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        (F.col("value") > 50).cast("int").alias("churn"),
        F.least(
            F.greatest(
                (F.col("value") + F.col("user_id") % 11 - F.lit(45.0))
                / F.lit(20.0),
                F.lit(0.0),
            ),
            F.lit(1.0),
        ).alias("proba"),
    )


@register(
    "roc_curve_points",
    f"""
WITH scored AS ({_PROBA_SQL}),
agg AS (
  SELECT proba,
         SUM(CASE WHEN churn = 1 THEN 1 ELSE 0 END) AS pos,
         SUM(CASE WHEN churn <> 1 THEN 1 ELSE 0 END) AS neg
  FROM scored GROUP BY proba
),
cum AS (
  SELECT proba,
         SUM(pos) OVER (ORDER BY proba DESC) AS tp,
         SUM(neg) OVER (ORDER BY proba DESC) AS fp,
         SUM(pos) OVER () AS p,
         SUM(neg) OVER () AS nn
  FROM agg
)
SELECT proba AS threshold,
       -- DuckDB SUM(int) widens to HUGEINT; the driver's hasher renders
       -- int128 differently from Spark's BIGINT → cast every integer sum
       -- in the final projection (CORRECTNESS_r06 root cause).
       CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(p - tp AS BIGINT) AS fn, CAST(nn - fp AS BIGINT) AS tn,
       CAST(tp AS DOUBLE) / p AS tpr,
       CAST(fp AS DOUBLE) / nn AS fpr,
       CASE WHEN tp + fp = 0 THEN 0.0
            ELSE CAST(tp AS DOUBLE) / (tp + fp) END AS "precision",
       CAST(tp AS DOUBLE) / p AS recall
FROM cum
""",
)
def q_roc_curve_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Threshold sweep: groupBy(score) then a range-partitioned prefix
    # sum — shuffle carries distinct-score cardinality, no global window.
    from ..operators.evalcurves import roc_pr_points

    return roc_pr_points(_proba_scored(spark, sf_dir))


@register(
    "auc_roc",
    f"""
WITH scored AS ({_PROBA_SQL}),
agg AS (
  SELECT proba, COUNT(*) AS n_g,
         SUM(CASE WHEN churn = 1 THEN 1 ELSE 0 END) AS pos
  FROM scored GROUP BY proba
),
cum AS (
  SELECT pos, n_g, SUM(n_g) OVER (ORDER BY proba) AS cum_n FROM agg
),
tot AS (SELECT SUM(n_g) AS nn, SUM(pos) AS p FROM agg),
u AS (SELECT SUM(pos * (cum_n - (n_g - 1) / 2.0)) AS s FROM cum)
SELECT (s - p * (p + 1) / 2.0) / (CAST(p AS DOUBLE) * (nn - p)) AS auc
FROM u, tot
""",
)
def q_auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Mann–Whitney U with midrank ties — algebraically the trapezoid
    # ROC integral, one prefix sum + one aggregation.
    from ..operators.evalcurves import auc_roc

    return auc_roc(_proba_scored(spark, sf_dir))


@register(
    "calibration_curve",
    f"""
WITH scored AS ({_PROBA_SQL})
SELECT least(CAST(floor(proba * 10) AS INT), 9) AS bin,
       COUNT(*) AS n,
       round(AVG(proba), 6) AS mean_predicted,
       AVG(CASE WHEN churn = 1 THEN 1.0 ELSE 0.0 END) AS fraction_positive
FROM scored GROUP BY 1
""",
)
def q_calibration_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Reliability diagram (the reference's calibration plot artifact):
    # one agg pass, n_bins partial rows after map-side combine.
    # mean_predicted is an order-dependent double avg → rounded on both
    # engines; fraction_positive is a ratio of exact integer sums.
    from ..operators.evalcurves import calibration_curve

    return calibration_curve(_proba_scored(spark, sf_dir)).select(
        "bin", "n", F.round("mean_predicted", 6).alias("mean_predicted"),
        "fraction_positive",
    )


@register(
    "lift_curve",
    f"""
WITH scored AS ({_PROBA_SQL}),
agg AS (
  SELECT proba, COUNT(*) AS n_g,
         SUM(CASE WHEN churn = 1 THEN 1 ELSE 0 END) AS pos
  FROM scored GROUP BY proba
),
cum AS (
  SELECT pos, n_g,
         SUM(n_g) OVER (ORDER BY proba DESC) AS cum_n,
         SUM(n_g) OVER () AS tot
  FROM agg
),
pb AS (
  SELECT CAST(ceil(10 * cum_n / CAST(tot AS DOUBLE)) AS INT) AS bucket,
         SUM(pos) AS positives, SUM(n_g) AS n
  FROM cum GROUP BY 1
),
fin AS (
  SELECT bucket, n, positives,
         SUM(positives) OVER (ORDER BY bucket) AS cum_pos,
         SUM(n) OVER (ORDER BY bucket) AS cum_n,
         SUM(positives) OVER () AS all_pos,
         SUM(n) OVER () AS all_n
  FROM pb
)
SELECT bucket,
       -- HUGEINT → BIGINT cast, same driver-hasher reason as roc_curve.
       CAST(n AS BIGINT) AS n, CAST(positives AS BIGINT) AS positives,
       CAST(cum_pos AS DOUBLE) / all_pos AS gain,
       (CAST(cum_pos AS DOUBLE) / cum_n)
         / (CAST(all_pos AS DOUBLE) / all_n) AS lift
FROM fin
""",
)
def q_lift_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Decile gains/lift (the reference's lift-chart artifact): bucket =
    # ceil(B*cum/total) from the per-score prefix sum — no global sort,
    # the only windows run over <= n_buckets rows.
    from ..operators.evalcurves import lift_curve

    return lift_curve(_proba_scored(spark, sf_dir))


@register(
    "confusion_matrix",
    """
WITH scored AS (
  SELECT event_id, CAST(value > 50 AS INT) AS churn,
         CAST(value + (user_id % 7) > 50 AS INT) AS churn_prediction
  FROM events
)
SELECT
  -- CAST: DuckDB SUM(int)=HUGEINT vs Spark BIGINT (driver hash r06).
  CAST(SUM(CASE WHEN churn = 1 AND churn_prediction = 1 THEN 1 ELSE 0 END)
       AS BIGINT) AS tp,
  CAST(SUM(CASE WHEN churn <> 1 AND churn_prediction = 1 THEN 1 ELSE 0 END)
       AS BIGINT) AS fp,
  CAST(SUM(CASE WHEN churn = 1 AND churn_prediction <> 1 THEN 1 ELSE 0 END)
       AS BIGINT) AS fn,
  CAST(SUM(CASE WHEN churn <> 1 AND churn_prediction <> 1 THEN 1 ELSE 0 END)
       AS BIGINT) AS tn,
  COUNT(*) AS n
FROM scored
""",
)
def q_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The reference's confusion-plot artifact as a single-row frame
    # (churn_model_training.py:153-156) — one conditional-agg pass.
    from ..operators.quality import confusion_matrix
    from .registry import _scored

    return confusion_matrix(_scored(spark, sf_dir))
