"""Round-14 registry extensions — the curation pipeline's remaining
streaming/differential/perceptual gaps (VERDICT r13 next-round list):

* ``stream_line_dedup`` — the one curation stage the r13 stream
  necessarily skipped: C4 corpus-wide line dedup as a STREAMING
  ingest, each micro-batch anti-joined against the kept corpus's
  line-digest state table through the txn store (the
  ``dedup_incremental`` pattern at line grain), exactly-once via
  claimed batch ids. Oracle = the batch line-dedup replay under the
  stream's arrival order, so a drop, replay double-apply, or
  wrong-order batch breaks the hash.
* ``html_extract_adversarial`` — extraction as a TWO-IMPLEMENTATION
  differential: the stdlib-parser primary vs a from-scratch scanner
  twin over a generated adversarial corpus, row-level agreement inside
  the hashed result, every block predicted arithmetically by DuckDB.
* ``multimodal_dedup_phash`` / ``stream_image_dedup`` — perceptual
  image dedup: 63-bit dHash over really-decoded pixels, Hamming-banded
  pairs with planted re-encoded/perturbed twins; and the STREAMING
  arrival-order gate (keep iff no earlier image within hamming ≤ 6)
  through the txn store.
* ``quality_classifier_score`` / ``curation_pipeline_v5`` — the
  learned quality filter (pinned-dyadic-weight logistic over the DSIR
  hashed n-gram bag, integer-numerator margin gate) and the seven-stage
  composition that ends in it.

Oracle strategy follows ext19: the corpus is RENDERED from
``documents.text`` through the deterministic template, so DuckDB
predicts every extracted line arithmetically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.html_extract import (
    boilerplate_keep_sql,
    demo_blocks_sql,
    html_extract_text,
)
from .registry import register
from .registry_ext19 import _rendered

# ---------------------------------------------------------------------------
# stream_line_dedup — STREAMING C4 line dedup (VERDICT r13 #2): pages
# drop as files → the stateless extraction chain → each micro-batch's
# lines are first-occurrence-deduped WITHIN the batch and anti-joined
# against the line-digest state table built by all EARLIER batches
# (line_dedup_increment), then the per-doc rebuilt rows land in the
# docs txn table and the batch's new digests land in the state table —
# both appends claimed under the foreachBatch epoch id, so a crash
# replay is a noop (exactly-once; pinned in tests). Because each batch
# only ever sees strictly-earlier state, the drained table equals the
# one-shot batch dedup under ARRIVAL order — the oracle replays
# first-occurrence ordered by (batch = doc_id % 3, doc_id, pos), so a
# dropped batch, a double-applied replay, or batches processed out of
# drop order all break the hash. Scale: the gate shuffles 16-byte
# digests bounded by batch lines; the state scan is stats-prunable and
# bloom-gateable (sketch.bloom_registers) when the kept corpus
# outgrows a comfortable shuffle.
# ---------------------------------------------------------------------------


def _stream_line_dedup_sql() -> str:
    return f"""
WITH blocks AS ({demo_blocks_sql()}),
kept AS (SELECT * FROM blocks WHERE {boilerplate_keep_sql()}),
ext AS (
  SELECT doc_id, string_agg(text, chr(10) ORDER BY block_idx) AS text
  FROM kept GROUP BY doc_id
),
exdocs AS (
  SELECT doc_id,
         list_filter(list_transform(string_split(text, chr(10)),
                                    x -> trim(x, ' ')),
                     x -> x <> '') AS ls
  FROM ext
),
exlines AS (
  SELECT doc_id,
         CAST(generate_subscripts(ls, 1) AS INT) AS pos,
         unnest(ls) AS line
  FROM exdocs
),
ldkept AS (
  SELECT doc_id, pos, line FROM (
    SELECT *, row_number() OVER (
      PARTITION BY line ORDER BY doc_id % 3, doc_id, pos
    ) AS rn FROM exlines
  ) WHERE rn = 1
),
rebuilt AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text_deduped,
         count(*) AS n_kept
  FROM ldkept GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(r.text_deduped, '') AS text_deduped,
       CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_lines_kept,
       CAST(len(d.ls) - coalesce(r.n_kept, 0) AS BIGINT)
         AS n_lines_removed
FROM exdocs d LEFT JOIN rebuilt r USING (doc_id)
"""


def _run_stream_line_dedup(
    spark: SparkSession, sf_dir: str, tag: str, bloom: bool
) -> DataFrame:
    """Shared build for the two streaming line-dedup queries: drop
    files → extraction chain → per-batch digest gate (exact anti-join,
    or bloom-pruned when ``bloom``) → claimed appends → scan."""
    from ..operators.sketch import bloom_registers
    from ..operators.text import (
        line_dedup_increment,
        line_dedup_increment_bloom,
    )
    from ..sources.txnlog import TxnTable
    from .phases import timed_phase
    from .registry import drain_stream
    from .registry_ext12 import _tmp_table_path
    from .registry_ext18 import write_drop_files_one_pass

    with timed_phase(f"{tag}.build"):
        base = _tmp_table_path(sf_dir, tag)
        drops = f"{base}/drops"
        pages = _rendered(spark, sf_dir)
        write_drop_files_one_pass(pages, F.col("doc_id") % 3, 3, drops)
        docs_tbl = TxnTable(spark, f"{base}/docs")
        state_tbl = TxnTable(spark, f"{base}/digests")
        bloom_tbl = TxnTable(spark, f"{base}/bloom")

        def ingest(batch_df: DataFrame, batch_id: int) -> None:
            # Extraction is MATERIALIZED once per batch (the
            # stream_image_dedup pattern): each txn append re-evaluates
            # its input lineage for the data write, so without the cut
            # the extraction + line-dedup chain re-ran inside every
            # append — twice per batch here, three times in the bloom
            # variant. ``materialize_kept`` then cuts ONCE at the
            # shared kept-lines frame (optimization r15): both outputs
            # derive from that checkpoint with narrow work, which is
            # cheaper than the previous two per-output checkpoints
            # that each re-ran the dedup joins. Both cuts stay EAGER:
            # lazy variants were tried (r15) and measured slower
            # (6.4 s -> 9.1 s plain / 11.6 s -> 13.3 s bloom).
            ext = (
                html_extract_text(batch_df)
                .where(F.col("n_blocks_kept") > 0)
                .select("doc_id", F.col("extracted").alias("text"))
                .localCheckpoint(eager=True)
            )
            seen = (
                None
                if state_tbl.latest_version() is None
                else state_tbl.scan()
            )
            if bloom:
                regs = (
                    None
                    if bloom_tbl.latest_version() is None
                    else bloom_tbl.scan()
                )
                per_doc, new_k = line_dedup_increment_bloom(
                    ext, seen, regs, materialize_kept=True
                )
            else:
                per_doc, new_k = line_dedup_increment(
                    ext, seen, materialize_kept=True
                )
            if bloom:
                # BLOOM FIRST: extra bits in the bitmap only force the
                # exact check (safe); a committed digest whose bit is
                # missing would later read "definitely new" and let a
                # duplicate through. bloom → docs → digests means any
                # crash point replays to the identical recompute.
                bloom_tbl.append(
                    bloom_registers(new_k, "k"), batch_id=batch_id
                )
            # docs before digests: a crash between the two commits
            # replays with the digest state still missing this batch,
            # so the recomputed per_doc is identical and the claimed
            # batch_id skips the already-landed append.
            docs_tbl.append(per_doc, batch_id=batch_id)
            state_tbl.append(new_k.select("k"), batch_id=batch_id)

        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("html", T.StringType()),
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
        "doc_id", "text_deduped", "n_lines_kept", "n_lines_removed"
    )


@register("stream_line_dedup", _stream_line_dedup_sql())
def q_stream_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_stream_line_dedup(
        spark, sf_dir, "linededupstream", bloom=False
    )


# ---------------------------------------------------------------------------
# stream_line_dedup_bloom — the SCALE PATH of the streaming line-dedup
# gate: the per-batch anti-join's input is pruned by the fixed-size
# bloom bitmap maintained as a fourth txn table (OR-merged partials,
# ≤256 rows broadcast), so only possibly-seen digests reach the exact
# join — definitely-new lines (the vast majority of a healthy crawl)
# bypass it entirely. No false negatives → output BIT-IDENTICAL to
# stream_line_dedup: the two queries share one oracle, which is itself
# the differential proof that the bloom pruning changes cost, never
# answers. Commit order bloom → docs → digests (extra bloom bits are
# safe, missing ones are not — see line_dedup_increment_bloom).
# ---------------------------------------------------------------------------


@register("stream_line_dedup_bloom", _stream_line_dedup_sql())
def q_stream_line_dedup_bloom(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _run_stream_line_dedup(
        spark, sf_dir, "linededupbloom", bloom=True
    )


# ---------------------------------------------------------------------------
# html_extract_adversarial — extraction correctness beyond the rendered
# template (VERDICT r13 #3): a deterministically-generated ADVERSARIAL
# corpus (nested mixed-case tables, comments containing markup, bogus
# declarations, unclosed elements, numeric/named character references
# next to bare '&', quoted attributes containing '>', CDATA script/
# style bodies full of fake tags, literal '<'/'>' in text) is parsed by
# BOTH the stdlib-parser primary (html_extract) and a from-scratch
# character-level scanner twin (html_extract_twin) — two independent
# tokenizers, one spec. Row-level agreement rides INSIDE the hashed
# result (twins_agree), and the DuckDB oracle predicts every block
# arithmetically from the generator formula, so a recovery-path bug in
# EITHER implementation breaks the hash. Scale: both parses are
# map-only Arrow passes; the agreement join is doc-keyed (a QA query,
# not a pipeline stage).
# ---------------------------------------------------------------------------


def render_adversarial_html(text, doc_id):
    """Adversarial page around a document's text, variant by
    doc_id % 6 — every construct is in the twin's supported-construct
    contract and its block list is predictable arithmetically."""
    sid = doc_id.cast("string")
    esc = F.replace(
        F.replace(
            F.replace(text, F.lit("&"), F.lit("&amp;")),
            F.lit("<"),
            F.lit("&lt;"),
        ),
        F.lit(">"),
        F.lit("&gt;"),
    )
    v = doc_id % 6
    head = F.concat(
        F.lit("<!DOCTYPE html><html><head><title>A"),
        sid,
        F.lit("</title></head><body>"),
    )
    v0 = F.concat(
        F.lit("<TABLE><tr><td>cell one "),
        sid,
        F.lit("</td><td><table><tr><td>inner cell "),
        sid,
        F.lit("</td></tr></table></td></tr></TABLE>"),
    )
    v1 = F.concat(
        F.lit(
            "<!-- <p>phantom</p> <div>never</div> --><p>after comment "
        ),
        sid,
        F.lit("</p><! bogus decl ><p>post bogus "),
        sid,
        F.lit("</p>"),
    )
    v2 = F.concat(
        F.lit("<p>first unclosed "),
        sid,
        F.lit("<p>second unclosed "),
        sid,
        F.lit("<div>div text "),
        sid,
    )
    v3 = F.concat(
        F.lit(
            "<p>&#65;&#x42;C dash &#8212; amp &amp; bare AT&T nb "
            "x&nbsp;&nbsp;y "
        ),
        sid,
        F.lit("</p>"),
    )
    v4 = F.concat(
        F.lit("<div title=\"a>b\" data-x='c>d'>attr text "),
        sid,
        F.lit(
            "</div><div><a href=\"/x?a>b\">Click here now</a>"
            " tail of div</div>"
        ),
    )
    v5 = F.concat(
        F.lit(
            '<script>if (a<b) { document.write("<td>never</td>"); }'
            "</script><style>p>span { color: blue }</style>"
            "<p>after cdata "
        ),
        sid,
        F.lit("</p>"),
    )
    body = (
        F.when(v == 0, v0)
        .when(v == 1, v1)
        .when(v == 2, v2)
        .when(v == 3, v3)
        .when(v == 4, v4)
        .otherwise(v5)
    )
    tail = F.concat(
        F.lit("<p>3 < 5 or 7 > 2, "),
        sid,
        F.lit("</p><p>"),
        esc,
        F.lit("</p></body></html>"),
    )
    return F.concat(head, body, tail)


def _adversarial_sql() -> str:
    return """
WITH src AS (
  SELECT doc_id, CAST(doc_id AS VARCHAR) AS sid, doc_id % 6 AS v,
         trim(regexp_replace(text, '[ \\t\\n\\r\\f\\v]+', ' ', 'g'), ' ')
           AS ptext
  FROM documents WHERE text IS NOT NULL
),
raw AS (
  SELECT doc_id, 0 AS ord, 'title' AS tag, 'A' || sid AS text,
         0 AS n_link FROM src
  UNION ALL SELECT doc_id, 10, 'td', 'cell one ' || sid, 0
    FROM src WHERE v = 0
  UNION ALL SELECT doc_id, 11, 'td', 'inner cell ' || sid, 0
    FROM src WHERE v = 0
  UNION ALL SELECT doc_id, 10, 'p', 'after comment ' || sid, 0
    FROM src WHERE v = 1
  UNION ALL SELECT doc_id, 11, 'p', 'post bogus ' || sid, 0
    FROM src WHERE v = 1
  UNION ALL SELECT doc_id, 10, 'p', 'first unclosed ' || sid, 0
    FROM src WHERE v = 2
  UNION ALL SELECT doc_id, 11, 'p', 'second unclosed ' || sid, 0
    FROM src WHERE v = 2
  UNION ALL SELECT doc_id, 12, 'div', 'div text ' || sid, 0
    FROM src WHERE v = 2
  UNION ALL SELECT doc_id, 10, 'p',
    'ABC dash ' || chr(8212) || ' amp & bare AT&T nb x'
      || chr(160) || chr(160) || 'y ' || sid, 0
    FROM src WHERE v = 3
  UNION ALL SELECT doc_id, 10, 'div', 'attr text ' || sid, 0
    FROM src WHERE v = 4
  UNION ALL SELECT doc_id, 11, 'div', 'Click here now tail of div', 14
    FROM src WHERE v = 4
  UNION ALL SELECT doc_id, 10, 'p', 'after cdata ' || sid, 0
    FROM src WHERE v = 5
  UNION ALL SELECT doc_id, 90, 'p', '3 < 5 or 7 > 2, ' || sid, 0
    FROM src
  UNION ALL SELECT doc_id, 91, 'p', ptext, 0 FROM src WHERE ptext <> ''
)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY ord) - 1
            AS INT) AS block_idx,
       tag, text,
       CAST(length(text) AS INT) AS n_chars,
       CAST(n_link AS INT) AS n_link_chars,
       TRUE AS twins_agree
FROM raw
"""


@register("html_extract_adversarial", _adversarial_sql())
def q_html_extract_adversarial(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.html_extract import html_parse_blocks
    from ..operators.html_extract_twin import twin_parse_blocks
    from .registry_ext12 import _t

    docs = (
        _t(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .repartition(spark.sparkContext.defaultParallelism)
    )
    pages = docs.select(
        "doc_id",
        render_adversarial_html(F.col("text"), F.col("doc_id")).alias(
            "html"
        ),
    )
    primary = html_parse_blocks(pages)
    twin = twin_parse_blocks(pages).withColumnRenamed(
        "blocks", "blocks_twin"
    )
    j = primary.join(twin, "doc_id")
    b = F.explode("blocks").alias("b")
    return j.select(
        "doc_id",
        (F.col("blocks") == F.col("blocks_twin")).alias("twins_agree"),
        b,
    ).select(
        "doc_id",
        F.col("b.block_idx").alias("block_idx"),
        F.col("b.tag").alias("tag"),
        F.col("b.text").alias("text"),
        F.col("b.n_chars").alias("n_chars"),
        F.col("b.n_link_chars").alias("n_link_chars"),
        "twins_agree",
    )


# ---------------------------------------------------------------------------
# multimodal_dedup_phash — PERCEPTUAL image dedup (VERDICT r13 #4):
# noise PNGs synthesized per id (complete files, valid CRCs) → real
# pixel decode → 10×7 nearest-neighbor resize → 63-bit dHash assembled
# in Catalyst → Hamming-banded candidate pairs (7 chunks × 9 bits —
# pigeonhole-complete for hamming ≤ 6) verified with bit_count. Two
# planted duplicate families ride along for every 20th base image: a
# byte-identical re-encode under a new id (hamming 0) and a perturbed
# twin with pixel (0,0) XORed by 128 (measured hamming ≤ 2 over the 4x
# id range) — both must surface inside the hashed pair list, labeled.
# The DuckDB oracle recomputes every fingerprint arithmetically from
# the generator formula + floor mapping and brute-forces the pairs, so
# an error in the encoder, decoder, resize indexing, grayscale,
# packing, banding, or verification breaks the hash.
# ---------------------------------------------------------------------------

_PH_COPY, _PH_PERT = 1_000_000, 2_000_000


def _phash_fps_ctes() -> str:
    """The shared DuckDB fingerprint prediction (base → imgs → g →
    fps) for the batch and streaming perceptual-dedup oracles: every
    image's 63-bit dHash recomputed arithmetically from the noise-PNG
    generator formula and the floor resize mapping."""
    mixv = (
        "(((src + 1000 * ((yy * (4 + src % 11)) // 7) "
        "+ 3 * ((xx * (4 + src % 13)) // 10) + {c}) "
        "* 2654435761) % 4294967296) // 16777216"
    )
    return f"""base AS (
  SELECT doc_id AS m FROM documents WHERE doc_id % 4 = 0
),
imgs AS (
  SELECT m AS media_id, m AS src, FALSE AS corrupt FROM base
  UNION ALL SELECT m + {_PH_COPY}, m, FALSE FROM base WHERE m % 20 = 0
  UNION ALL SELECT m + {_PH_PERT}, m, TRUE FROM base WHERE m % 20 = 0
),
g AS (
  SELECT media_id, yy, xx,
         CASE WHEN corrupt
                   AND (yy * (4 + src % 11)) // 7 = 0
                   AND (xx * (4 + src % 13)) // 10 = 0
              THEN xor({mixv.format(c=0)}, 128)
                   + xor({mixv.format(c=1)}, 128)
                   + xor({mixv.format(c=2)}, 128)
              ELSE {mixv.format(c=0)} + {mixv.format(c=1)}
                   + {mixv.format(c=2)}
         END AS gray
  FROM imgs
  CROSS JOIN generate_series(0, 6) ys(yy)
  CROSS JOIN generate_series(0, 9) xs(xx)
),
fps AS (
  SELECT media_id,
         CAST(sum(CASE WHEN nxt > gray
                       THEN 1::BIGINT << (yy * 9 + xx)
                       ELSE 0 END) AS BIGINT) AS fp
  FROM (
    SELECT media_id, yy, xx, gray,
           lead(gray) OVER (PARTITION BY media_id, yy ORDER BY xx)
             AS nxt
    FROM g
  ) WHERE xx < 9
  GROUP BY media_id
)"""


def _phash_sql() -> str:
    return f"""
WITH {_phash_fps_ctes()}
SELECT f1.media_id AS id_a, f2.media_id AS id_b,
       CAST(bit_count(xor(f1.fp, f2.fp)) AS INT) AS hamming,
       CASE WHEN f1.media_id % {_PH_COPY} = f2.media_id % {_PH_COPY}
            THEN CASE WHEN f2.media_id >= {_PH_PERT}
                      THEN 'planted_perturbed'
                      ELSE 'planted_exact' END
            ELSE 'background' END AS kind
FROM fps f1 JOIN fps f2 ON f1.media_id < f2.media_id
WHERE bit_count(xor(f1.fp, f2.fp)) <= 6
"""


def _perceptual_ids(spark, base: DataFrame, twin_mod: int) -> DataFrame:
    """Shared id frame for the perceptual-dedup fixtures: EXPLICIT
    ``(media_id, src, corrupt)`` columns (ADVICE r14 — the generator
    id and the corrupt flag used to be magnitude-decoded from
    ``media_id`` via ``% 1e6`` / ``>= 2e6``, which silently decoded
    the WRONG source once base ids crossed 1e6 — e.g. bench's slope
    copies at ``i*1e9`` offsets made every copy-i image an identical
    corrupt twin of copy 0's, so the slope probe measured fixture
    aliasing, not the operator). The only remaining id-namespace
    contract — twin ids at ``src+1M`` / ``src+2M`` must not collide
    with any real base id, i.e. base ids stay in ``[0, 1e6)`` within
    each ``1e9`` id block — is pinned by a fail-loud per-row assert
    folded into the always-consumed media_id output (the
    text.py:252 discipline: a standalone assert column is prunable)."""
    guard = F.coalesce(
        F.assert_true(
            F.col("media_id") % F.lit(1_000_000_000) < F.lit(_PH_COPY),
            F.lit(
                "perceptual fixture: base id collides with the twin "
                "id namespace (base ids must stay in [0, 1e6) within "
                "each 1e9 id block)"
            ),
        ).cast("bigint"),
        F.lit(0),
    )
    base = base.select((F.col("media_id") + guard).alias("media_id"))
    twins = base.where(F.col("media_id") % 20 == twin_mod)

    def _ids(df: DataFrame, offset: int, corrupt: bool) -> DataFrame:
        return df.select(
            (F.col("media_id") + F.lit(offset)).alias("media_id"),
            F.col("media_id").alias("src"),
            F.lit(corrupt).alias("corrupt"),
        )

    return (
        _ids(base, 0, False)
        .unionByName(_ids(twins, _PH_COPY, False))
        .unionByName(_ids(twins, _PH_PERT, True))
        .repartition(spark.sparkContext.defaultParallelism)
    )


def _phash_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The perceptual-dedup image corpus (shared by the batch and
    streaming queries): noise PNGs for every 4th doc id, plus — for
    every 20th base — a byte-identical re-encode under id+1M and a
    pixel-(0,0)-corrupted perturbed twin under id+2M. The generator
    id and corrupt flag ride as explicit columns (see
    ``_perceptual_ids``)."""
    import pandas as _pd

    from ..operators.multimodal import synth_noise_png_bytes
    from .registry_ext12 import _t

    base = (
        _t(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 4 == 0)
        .select(F.col("doc_id").alias("media_id"))
    )
    ids = _perceptual_ids(spark, base, twin_mod=0)

    def synth(batches):
        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": [
                        synth_noise_png_bytes(int(s), corrupt=bool(c))
                        for s, c in zip(pdf["src"], pdf["corrupt"])
                    ],
                }
            )

    return ids.mapInPandas(synth, "media_id long, content binary")


@register("multimodal_dedup_phash", _phash_sql())
def q_multimodal_dedup_phash(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.dedup import fingerprint_hamming_pairs
    from ..operators.multimodal_dedup import DHASH_BITS, dhash_bits

    media = _phash_media(spark, sf_dir)
    pairs = fingerprint_hamming_pairs(
        dhash_bits(media),
        "dhash",
        "media_id",
        bits=DHASH_BITS,
        max_hamming=6,
        chunks=7,
    )
    same = F.col("id_a") % _PH_COPY == F.col("id_b") % _PH_COPY
    kind = (
        F.when(
            same & (F.col("id_b") >= _PH_PERT),
            F.lit("planted_perturbed"),
        )
        .when(same, F.lit("planted_exact"))
        .otherwise(F.lit("background"))
    )
    return pairs.select(
        "id_a",
        "id_b",
        F.col("hamming").cast("int").alias("hamming"),
        kind.alias("kind"),
    )


# ---------------------------------------------------------------------------
# quality_classifier_score — the LEARNED quality filter (VERDICT r13
# #5; GPT-3 Appendix A / WebText run a linear classifier next to the
# rule gates): pinned-dyadic-weight logistic over the DSIR hashed
# unigram+bigram feature space, margin carried as its exact integer
# numerator so the keep/drop gate is an integer comparison on both
# engines. No weight table, no join — the weights are a formula of
# the bucket index; one explode + one per-doc sum.
# ---------------------------------------------------------------------------


def _qc_sql() -> str:
    from ..operators.selection import quality_classifier_sql

    return quality_classifier_sql()


@register("quality_classifier_score", _qc_sql())
def q_quality_classifier_score(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.selection import quality_classifier_scores
    from .registry_ext12 import _t

    return quality_classifier_scores(
        _t(spark, sf_dir, "documents").select("doc_id", "text")
    )


# ---------------------------------------------------------------------------
# curation_pipeline_v5 — v4 + the learned classifier as the final
# admission stage (the modern recipe: rule gates first, model score
# last): render → extract + structural gates → corpus-wide line dedup
# → Gopher length/stopword/alpha → repetition gates → quality
# classifier → real-vocab token budget. Seven stage survivor counts in
# one hashed row; every stage is an independently-oracled operator.
# ---------------------------------------------------------------------------


def _curation_v5_sql() -> str:
    from ..operators.bpe_vocab import byte_vocab_count_sql
    from ..operators.repetition import repetition_sql
    from ..operators.selection import quality_classifier_sql
    from .registry_ext19 import _QG_KEEP, _quality_gate_ctes

    rep = repetition_sql("SELECT doc_id, text FROM q1")
    qc = quality_classifier_sql(table="q2v")
    counts = byte_vocab_count_sql(
        "SELECT q2.doc_id, q2.text FROM q2 JOIN q3 USING (doc_id)"
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
q2 AS (SELECT q1.doc_id, q1.text FROM q1
       JOIN (SELECT doc_id FROM ({rep}) WHERE keep) r USING (doc_id)),
q2v AS (SELECT doc_id, text FROM q2),
q3 AS (SELECT doc_id FROM ({qc}) WHERE keep),
counts AS ({counts})
SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents
        WHERE text IS NOT NULL) AS n_input,
       (SELECT CAST(count(*) AS BIGINT) FROM kept) AS n_blocks_kept,
       (SELECT CAST(count(*) AS BIGINT) FROM ld) AS n_after_linededup,
       (SELECT CAST(count(*) AS BIGINT) FROM q1) AS n_after_quality,
       (SELECT CAST(count(*) AS BIGINT) FROM q2) AS n_after_repetition,
       (SELECT CAST(count(*) AS BIGINT) FROM q3) AS n_after_classifier,
       (SELECT CAST(sum(n_tokens_exact) AS BIGINT) FROM counts)
         AS total_tokens_real
"""


@register("curation_pipeline_v5", _curation_v5_sql())
def q_curation_pipeline_v5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe_vocab import (
        GPT2_SPLIT_PATTERN_PORTABLE,
        bpe_token_count_bytes,
    )
    from ..operators.repetition import gopher_repetition_filter
    from ..operators.selection import quality_classifier_scores
    from ..operators.text import line_dedup_corpus, quality_keep_col
    from .registry_ext12 import _t

    # Stage handoffs MATERIALIZED with localCheckpoint (optimization
    # r15): same rationale as curation_pipeline_v4 (registry_ext19) —
    # the event-log profile showed ~12 s of the 19 s run was the
    # driver planning the seven-way replicated logical chain, not
    # stages running. Each checkpoint is ≤ n_docs rows of (id, text).
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
    q3 = q2.join(
        quality_classifier_scores(q2)
        .where(F.col("keep"))
        .select("doc_id"),
        "doc_id",
    ).localCheckpoint(eager=True)
    counts = bpe_token_count_bytes(
        q3.select("doc_id", "text"), pattern=GPT2_SPLIT_PATTERN_PORTABLE
    )
    n_input = _t(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_input"))
    aggs = [
        ext.agg(
            F.sum("n_blocks_kept").cast("bigint").alias("n_blocks_kept")
        ),
        ld.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_after_linededup")
        ),
        q1.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_after_quality")
        ),
        q2.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_after_repetition")
        ),
        q3.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_after_classifier")
        ),
        counts.agg(
            F.sum("n_tokens_exact").cast("bigint").alias(
                "total_tokens_real"
            )
        ),
    ]
    out = n_input
    for a in aggs:
        out = out.crossJoin(F.broadcast(a))
    return out


# ---------------------------------------------------------------------------
# stream_image_dedup — PERCEPTUAL dedup as a STREAMING ingest (the
# image analog of stream_line_dedup, composing r14's dHash with the
# incremental-state pattern): images drop as files in three batches →
# per batch, each image's 63-bit dHash is banded-joined
# (fingerprint_hamming_join) against the fingerprints of ALL
# strictly-earlier images — the accumulated state table plus the
# batch's own earlier rows — and an image is kept iff no earlier image
# sits within hamming ≤ 6 ("first occurrence survives" at perceptual
# grain; arrival = (batch, media_id), encoded as one orderable key).
# Per-image verdict rows and the batch's fingerprints land in two txn
# tables, appends claimed under the epoch id (docs before state, the
# stream_line_dedup replay argument). The planted re-encoded/perturbed
# twins always land in a DIFFERENT batch than their base (the +1M/+2M
# offsets shift media_id % 3), so the cross-batch gate — not
# within-batch dedup — must catch them. Oracle: DuckDB recomputes
# every fingerprint arithmetically and brute-forces "count earlier
# within 6" over the arrival order, so a dropped batch, wrong batch
# order, or any fingerprint/banding error breaks the hash.
# ---------------------------------------------------------------------------

#: arrival key = batch * _ARR + media_id (media ids < 10^7).
_ARR = 10_000_000


def _stream_image_sql() -> str:
    return f"""
WITH {_phash_fps_ctes()},
arr AS (
  SELECT media_id, fp,
         media_id % 3 AS batch,
         (media_id % 3) * {_ARR} + media_id AS arrival
  FROM fps
)
SELECT a.media_id,
       CAST(a.batch AS INT) AS batch_idx,
       a.fp AS dhash,
       CAST(count(e.media_id) AS BIGINT) AS n_earlier_dups,
       count(e.media_id) = 0 AS keep
FROM arr a LEFT JOIN arr e
  ON e.arrival < a.arrival AND bit_count(xor(a.fp, e.fp)) <= 6
GROUP BY a.media_id, a.batch, a.fp
"""


@register("stream_image_dedup", _stream_image_sql())
def q_stream_image_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import fingerprint_hamming_join
    from ..operators.multimodal_dedup import DHASH_BITS, dhash_bits
    from ..sources.txnlog import TxnTable
    from .phases import timed_phase
    from .registry import drain_stream
    from .registry_ext12 import _tmp_table_path
    from .registry_ext18 import write_drop_files_one_pass

    with timed_phase("stream_image_dedup.build"):
        base = _tmp_table_path(sf_dir, "imagededupstream")
        drops = f"{base}/drops"
        media = _phash_media(spark, sf_dir)
        write_drop_files_one_pass(media, F.col("media_id") % 3, 3, drops)
        docs_tbl = TxnTable(spark, f"{base}/docs")
        state_tbl = TxnTable(spark, f"{base}/fps")

        def ingest(batch_df: DataFrame, batch_id: int) -> None:
            # The fingerprint frame is MATERIALIZED once
            # (localCheckpoint, the ngram_novelty pattern — ≤ batch
            # rows): it feeds FOUR subplans (ref union, probe, the
            # per-image left join, the state append), and without the
            # cut the decode re-ran inside every consumer — profiled
            # 35 s of the drain's 49 s at sf0.1. LAZY (r15): the
            # first consuming action materializes it in-place instead
            # of paying a dedicated checkpoint job per batch; and
            # per_img needs no checkpoint at all — it is consumed by
            # exactly one append, whose single data-write pass IS its
            # one evaluation (an eager cut there just ran the banded
            # join twice).
            fps = dhash_bits(batch_df).select(
                "media_id",
                F.col("dhash"),
                (F.lit(batch_id) * F.lit(_ARR) + F.col("media_id"))
                .alias("arrival"),
            ).localCheckpoint(eager=False)
            seen = (
                None
                if state_tbl.latest_version() is None
                else state_tbl.scan()
            )
            ref = (
                fps
                if seen is None
                else fps.select("arrival", "dhash").unionByName(
                    seen.select("arrival", "dhash")
                )
            )
            earlier = fingerprint_hamming_join(
                fps,
                ref,
                "dhash",
                "arrival",
                bits=DHASH_BITS,
                max_hamming=6,
                chunks=7,
            )
            per_img = (
                fps.join(earlier, "arrival", "left")
                .select(
                    "media_id",
                    F.lit(batch_id).cast("int").alias("batch_idx"),
                    "dhash",
                    F.coalesce("n_earlier", F.lit(0))
                    .cast("bigint")
                    .alias("n_earlier_dups"),
                    F.col("n_earlier").isNull().alias("keep"),
                )
            )
            docs_tbl.append(per_img, batch_id=batch_id)
            state_tbl.append(
                fps.select("arrival", "dhash"), batch_id=batch_id
            )

        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
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
        "media_id", "batch_idx", "dhash", "n_earlier_dups", "keep"
    )


# ---------------------------------------------------------------------------
# multimodal_dedup_audio — the AUDIO member of the perceptual-dedup
# family (images got dHash above; a multimodal corpus needs the same
# gate for clips): noise WAVs synthesized per id → real PCM16 decode →
# 32 exact-integer frame energies → 31-bit energy-difference
# fingerprint (comparisons + packing in Catalyst) → Hamming-banded
# pairs (4 chunks × 7 bits — pigeonhole-complete for hamming ≤ 3).
# Planted per 20th clip: a byte-identical re-encode under id+1M
# (hamming 0) and a first-frame-silenced perturbed twin under id+2M
# (measured hamming ≤ 1 over the 4x id range) — both surface labeled
# in the hashed pair list. Oracle recomputes every energy and
# fingerprint arithmetically from the generator formula and
# brute-forces the pairs.
# ---------------------------------------------------------------------------


def _audio_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as _pd

    from ..operators.multimodal import synth_noise_wav_bytes
    from .registry_ext12 import _t

    base = (
        _t(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 4 == 2)
        .select(F.col("doc_id").alias("media_id"))
    )
    ids = _perceptual_ids(spark, base, twin_mod=2)

    def synth(batches):
        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": [
                        synth_noise_wav_bytes(int(s), corrupt=bool(c))
                        for s, c in zip(pdf["src"], pdf["corrupt"])
                    ],
                }
            )

    return ids.mapInPandas(synth, "media_id long, content binary")


def _audio_sql() -> str:
    return f"""
WITH base AS (
  SELECT doc_id AS m FROM documents WHERE doc_id % 4 = 2
),
clips AS (
  SELECT m AS media_id, m AS src, FALSE AS corrupt FROM base
  UNION ALL SELECT m + {_PH_COPY}, m, FALSE FROM base WHERE m % 20 = 2
  UNION ALL SELECT m + {_PH_PERT}, m, TRUE FROM base WHERE m % 20 = 2
),
en AS (
  SELECT media_id, f,
         sum(CASE WHEN corrupt AND f = 0 THEN 0 ELSE v * v END) AS e
  FROM (
    SELECT c.media_id, c.corrupt, ff.f, ii.i,
           ((((c.src + 1009 * ii.i) * 2654435761) % 4294967296)
            // 1048576) - 2048 AS v,
           256 + c.src % 200 AS n
    FROM clips c
    CROSS JOIN generate_series(0, 31) ff(f)
    CROSS JOIN generate_series(0, 454) ii(i)
  )
  WHERE i >= (f * n) // 32 AND i < ((f + 1) * n) // 32
  GROUP BY 1, 2
),
fps AS (
  SELECT media_id,
         CAST(sum(CASE WHEN nxt > e THEN 1::BIGINT << f ELSE 0 END)
              AS BIGINT) AS fp
  FROM (
    SELECT media_id, f, e,
           lead(e) OVER (PARTITION BY media_id ORDER BY f) AS nxt
    FROM en
  ) WHERE f < 31
  GROUP BY media_id
)
SELECT f1.media_id AS id_a, f2.media_id AS id_b,
       CAST(bit_count(xor(f1.fp, f2.fp)) AS INT) AS hamming,
       CASE WHEN f1.media_id % {_PH_COPY} = f2.media_id % {_PH_COPY}
            THEN CASE WHEN f2.media_id >= {_PH_PERT}
                      THEN 'planted_perturbed'
                      ELSE 'planted_exact' END
            ELSE 'background' END AS kind
FROM fps f1 JOIN fps f2 ON f1.media_id < f2.media_id
WHERE bit_count(xor(f1.fp, f2.fp)) <= 3
"""


@register("multimodal_dedup_audio", _audio_sql())
def q_multimodal_dedup_audio(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.dedup import fingerprint_hamming_pairs
    from ..operators.multimodal_dedup import (
        AFP_BITS,
        audio_fingerprint_bits,
    )

    pairs = fingerprint_hamming_pairs(
        audio_fingerprint_bits(_audio_media(spark, sf_dir)),
        "afp",
        "media_id",
        bits=AFP_BITS,
        max_hamming=3,
        chunks=4,
    )
    same = F.col("id_a") % _PH_COPY == F.col("id_b") % _PH_COPY
    kind = (
        F.when(
            same & (F.col("id_b") >= _PH_PERT),
            F.lit("planted_perturbed"),
        )
        .when(same, F.lit("planted_exact"))
        .otherwise(F.lit("background"))
    )
    return pairs.select(
        "id_a",
        "id_b",
        F.col("hamming").cast("int").alias("hamming"),
        kind.alias("kind"),
    )


# ---------------------------------------------------------------------------
# multimodal_dedup_clusters — perceptual pairs → CLUSTERS: connected
# components (min-label propagation, the dedup_clusters pattern) over
# the dHash near-dup graph, so a dedup job can keep one canonical
# image per perceptual component instead of reasoning about pair
# lists. cluster_id = min media_id of the component. Oracle: DuckDB
# recursive-CTE reachability over the arithmetically-recomputed
# fingerprint pairs.
# ---------------------------------------------------------------------------


def _phash_clusters_sql() -> str:
    return f"""
WITH RECURSIVE {_phash_fps_ctes()},
prs AS (
  SELECT f1.media_id AS id_a, f2.media_id AS id_b
  FROM fps f1 JOIN fps f2 ON f1.media_id < f2.media_id
  WHERE bit_count(xor(f1.fp, f2.fp)) <= 6
),
edges AS (
  SELECT id_a AS a, id_b AS b FROM prs
  UNION ALL
  SELECT id_b AS a, id_a AS b FROM prs
),
reach(id, r) AS (
  SELECT media_id, media_id FROM fps
  UNION
  SELECT e.a, reach.r FROM reach JOIN edges e ON e.b = reach.id
)
SELECT id AS media_id, CAST(MIN(r) AS BIGINT) AS cluster_id
FROM reach GROUP BY id
"""


@register("multimodal_dedup_clusters", _phash_clusters_sql())
def q_multimodal_dedup_clusters(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.dedup import fingerprint_hamming_pairs
    from ..operators.graph import connected_components
    from ..operators.multimodal_dedup import DHASH_BITS, dhash_bits

    # Materialize the tiny fingerprint frame once (≤ ~n_docs/4 rows of
    # (id, 3 ints)): the PNG synth + decode mapInPandas pass above it
    # is the expensive part, and without the cut it runs once for the
    # edge derivation and AGAIN for the vertex set (connected_components
    # checkpoints each input in its own action, so there is no shared
    # exchange to reuse) — guide §2.4/§5 (optimization r15).
    fps = dhash_bits(_phash_media(spark, sf_dir)).localCheckpoint(
        eager=True
    )
    pairs = fingerprint_hamming_pairs(
        fps,
        "dhash",
        "media_id",
        bits=DHASH_BITS,
        max_hamming=6,
        chunks=7,
    )
    comp = connected_components(
        fps.select("media_id"),
        pairs.select(
            F.col("id_a").alias("src"), F.col("id_b").alias("dst")
        ),
        id_col="media_id",
    )
    return comp.select(
        F.col("id").alias("media_id"),
        F.col("component").cast("bigint").alias("cluster_id"),
    )


# ---------------------------------------------------------------------------
# stream_curation_classified — the r13 streaming curation ingest with
# the LEARNED gate composed into admission: because the classifier's
# pinned weights are a formula of the md5 bucket, its integer margin
# is expressible as ONE stateless array-lambda Column
# (quality_classifier_margin_num — no explode, no groupBy), so the
# model-scored admission runs in APPEND MODE exactly like the rule
# gates. Oracle = the batch chain (extract → Gopher rules → classifier
# replay) over the full rendered corpus; streaming admission is pinned
# bit-equal to batch admission for BOTH gate kinds.
# ---------------------------------------------------------------------------


def _stream_classified_sql() -> str:
    from ..operators.selection import quality_classifier_sql
    from .registry_ext19 import _QG_KEEP, _quality_gate_ctes

    qc = quality_classifier_sql(table="adm")
    return f"""
WITH blocks AS ({demo_blocks_sql()}),
kept AS (SELECT * FROM blocks WHERE {boilerplate_keep_sql()}),
ext AS (
  SELECT doc_id, string_agg(text, chr(10) ORDER BY block_idx) AS text
  FROM kept GROUP BY doc_id
),
{_quality_gate_ctes("ext")},
adm AS (
  SELECT e.doc_id, e.text
  FROM ext e JOIN qg_c USING (doc_id)
  WHERE {_QG_KEEP}
),
qck AS (SELECT doc_id FROM ({qc}) WHERE keep)
SELECT a.doc_id, a.text FROM adm a JOIN qck USING (doc_id)
"""


@register("stream_curation_classified", _stream_classified_sql())
def q_stream_curation_classified(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.selection import quality_classifier_margin_num
    from ..operators.text import quality_keep_col
    from ..sources.txnlog import TxnTable
    from ..sources.txnlog_datasource import register_txnlog_source
    from .phases import timed_phase
    from .registry import drain_stream
    from .registry_ext12 import _tmp_table_path
    from .registry_ext18 import write_drop_files_one_pass

    register_txnlog_source(spark)
    with timed_phase("stream_curation_classified.build"):
        base = _tmp_table_path(sf_dir, "curaclassified")
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
            .where(quality_classifier_margin_num() >= 0)
        )
        q = (
            curated.writeStream.format("txnlog")
            .option("path", f"{base}/tbl")
            .option("checkpointLocation", f"{base}/ckpt")
            .option("sinkId", "curationclassified")
            .trigger(availableNow=True)
            .start()
        )
        drain_stream(q)
    return TxnTable(spark, f"{base}/tbl").scan().select("doc_id", "text")
