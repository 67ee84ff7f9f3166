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


@register("stream_line_dedup", _stream_line_dedup_sql())
def q_stream_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import line_dedup_increment
    from ..sources.txnlog import TxnTable
    from .phases import timed_phase
    from .registry import drain_stream
    from .registry_ext12 import _tmp_table_path
    from .registry_ext18 import write_drop_files

    with timed_phase("stream_line_dedup.build"):
        base = _tmp_table_path(sf_dir, "linededupstream")
        drops = f"{base}/drops"
        pages = _rendered(spark, sf_dir)
        write_drop_files(
            (pages.where(F.col("doc_id") % 3 == i) for i in range(3)),
            drops,
        )
        docs_tbl = TxnTable(spark, f"{base}/docs")
        state_tbl = TxnTable(spark, f"{base}/digests")

        def ingest(batch_df: DataFrame, batch_id: int) -> None:
            ext = html_extract_text(batch_df).where(
                F.col("n_blocks_kept") > 0
            ).select("doc_id", F.col("extracted").alias("text"))
            seen = (
                None
                if state_tbl.latest_version() is None
                else state_tbl.scan()
            )
            per_doc, new_k = line_dedup_increment(ext, seen)
            # docs first, digests second: a crash between the two
            # commits replays with the digest state still missing this
            # batch, so the recomputed per_doc is identical and the
            # claimed batch_id skips the already-landed append.
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
