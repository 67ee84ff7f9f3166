"""Incremental PQ / IVF-PQ vector index ON the transactional table
(round 10, VERDICT r9 next #1): composes ``write_pq_encoded``'s
write-time encoding (operators/similarity.py) with ``TxnTable``'s
commit log (sources/txnlog.py), turning the one-shot PQ store into a
SYSTEM a daily-ingest corpus can live on:

- **Append-only ingest**: new embeddings arrive as PQ codes through an
  exactly-once log commit (``batch_id`` replay protection — the
  ``foreach_batch_appender`` epoch contract); the raw embedding column
  never lands in the index (codes + cell + filterable attrs only —
  the 100 TB residency story).
- **Snapshot-isolated queries**: ``topk`` resolves ONE version and
  reads both the code files AND the codebook properties of that
  version — a concurrent append or codebook refresh cannot tear a
  running query; time travel queries the index as of any commit.
- **OPTIMIZE**: compaction bin-packs small code files through the
  table's own rewrite (codes are plain columns — row-preserving).
- **Pinned codebooks**: the quantizer is a TABLE PROPERTY
  (``ann.codebooks`` / ``ann.centroids`` / ``ann.codebook_version``),
  so a codebook refresh is an EXPLICIT atomic re-encode commit
  (``reencode``: new codes + bumped version in one overwrite), and a
  reader can always tell which quantizer produced the codes it scans.
- **Drift guard**: ``recall_on`` measures the STALE codebook's recall
  on a new batch before it is appended (mirrors
  ``similarity_pq_recall``) — the number that tells an operator when
  to schedule the re-encode.

Scale posture: with ``centroids`` the table is Hive-partitioned by the
IVF cell, so a query's probe predicate is zero-data-IO partition
pruning through the commit log (``scan`` with an ``in`` predicate on
the partition column); encoding is pure Catalyst codegen (no UDF);
the only driver-side state is the codebook floats (m×ks×d_sub — KB).

Reference parity: the reference has no vector surface at all
(BASELINE.md); the design target is FAISS's IVFADC layout
(Jégou et al., TPAMI 2011) expressed as Spark jobs over a Delta-style
table.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.txnlog import TxnTable
from . import similarity

PROP_CODEBOOKS = "ann.codebooks"
PROP_CENTROIDS = "ann.centroids"
PROP_VERSION = "ann.codebook_version"


class PqVectorIndex:
    """Handle on a PQ-encoded vector index stored as a TxnTable."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        partition_by: list[str] | None = None,
    ):
        self.spark = spark
        self.path = path.rstrip("/")
        self._cell_col = "ivf_cell"
        self._code_col = "pq_code"
        # partition layout is log-adopted on existing tables; ``create``
        # passes the declared layout for the first commit
        self.table = TxnTable(
            spark, self.path, schema_mode="exact", partition_by=partition_by
        )

    # -- lifecycle ---------------------------------------------------------

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        codebooks: list[list[list[float]]],
        centroids: list[list[float]] | None = None,
        id_col: str = "vec_id",
    ) -> "PqVectorIndex":
        """Initialize an empty index: pin the quantizer as table
        properties (version 1) and, with ``centroids``, declare the
        IVF-cell partition layout. No data committed yet."""
        idx = cls(
            spark,
            path,
            partition_by=["ivf_cell"] if centroids is not None else None,
        )
        if idx.table.latest_version() is not None:
            raise ValueError(
                f"PqVectorIndex.create: {path} already has commits; "
                "open it instead"
            )
        idx.table.set_properties(
            {
                PROP_CODEBOOKS: codebooks,
                PROP_CENTROIDS: centroids,
                PROP_VERSION: 1,
            }
        )
        return idx

    def _props(self, version: int | None = None) -> dict:
        """The quantizer pinned at ``version`` (default latest) — the
        SAME version the paired code snapshot resolves, so a query can
        never scan codes with a mismatched codebook."""
        props = self.table._state(version).get("properties", {})
        if PROP_CODEBOOKS not in props:
            raise ValueError(
                f"{self.path} is not a PqVectorIndex (no "
                f"{PROP_CODEBOOKS!r} property)"
            )
        return props

    def codebooks(self, version: int | None = None) -> list:
        return self._props(version)[PROP_CODEBOOKS]

    def centroids(self, version: int | None = None) -> list | None:
        return self._props(version).get(PROP_CENTROIDS)

    def codebook_version(self, version: int | None = None) -> int:
        return int(self._props(version).get(PROP_VERSION, 1))

    # -- ingest ------------------------------------------------------------

    def append(
        self,
        df: DataFrame,
        batch_id=None,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        attr_cols: list[str] | None = None,
    ) -> int:
        """Encode ``df``'s embeddings under the CURRENT pinned
        quantizer and append the codes through the commit log —
        exactly-once under replays via ``batch_id`` (pass the
        foreachBatch epoch id from a streaming sink). The embedding
        column is DROPPED at encode time; only (id, [cell,] code,
        attrs) land. Encoding + cell assignment are zero-shuffle
        codegen expressions; the write's only wide op is the
        cell-directory fan-out.

        The commit is CONDITIONAL on the version whose codebook
        properties were read (r10 review): a concurrent ``reencode``
        landing mid-append would otherwise leave stale-quantizer codes
        on the refreshed table. On conflict the batch is re-encoded
        under the fresh quantizer and retried."""
        from ..sources.txnlog import CommitConflict

        last_err: CommitConflict | None = None
        for _ in range(3):
            v = self.table.latest_version()
            props = self._props(v)
            cbs = props[PROP_CODEBOOKS]
            cents = props.get(PROP_CENTROIDS)
            enc = df.withColumn(
                self._code_col,
                similarity.pq_encode_expr(F.col(vec_col), cbs),
            )
            cols = [id_col, self._code_col] + list(attr_cols or [])
            if cents is not None:
                enc = enc.withColumn(
                    self._cell_col,
                    similarity.ivf_cell_expr(F.col(vec_col), cents),
                )
                cols.insert(1, self._cell_col)
            try:
                return self.table.append(
                    self._clustered(enc.select(*cols), cents),
                    batch_id=batch_id,
                    require_latest=v,
                )
            except CommitConflict as e:
                last_err = e
        raise last_err  # pragma: no cover - needs 3 straight rivals

    def _clustered(self, codes: DataFrame, cents) -> DataFrame:
        """Cluster an encoded batch by its IVF cell before the
        partitioned write (optimization r16, guide §6): the cell
        fan-out otherwise writes one file per (input partition × cell)
        — a 32-partition batch over 16 cells landed ~445 tiny files
        per commit, and every downstream scan paid a 445-path
        distributed listing job plus 445-task stages (measured:
        ann_dedup_gate spent 0.7 s listing + most of its 5.8 s in
        tiny-task overhead). REBALANCE (AQE) by the cell column writes
        ~one file per cell at any batch size — coalescing small
        batches, still splitting a skewed hot cell into
        advisory-sized files at production scale. The exchange moves
        only (id, cell, code, attrs): the embedding column is already
        dropped (§2.3 — shuffle the narrow proxy, never the payload).
        Non-partitioned stores keep the writer's natural layout."""
        if cents is None:
            return codes
        return codes.hint("rebalance", F.col(self._cell_col))

    def reencode(
        self,
        source_df: DataFrame,
        codebooks: list[list[list[float]]],
        centroids: list[list[float]] | None = None,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        attr_cols: list[str] | None = None,
    ) -> int:
        """CODEBOOK REFRESH — an explicit atomic re-encode: encode the
        full source corpus under the NEW quantizer and commit codes +
        bumped ``ann.codebook_version`` in ONE overwrite (readers see
        old codes with old codebooks or new with new — never a mix).
        The old index remains time-travelable.

        CONDITIONAL on the head the properties were read at (r10
        review): an append landing between the source read and the
        overwrite would be silently wiped from the index, so the
        overwrite fails with CommitConflict instead — re-run with a
        source corpus that includes the new batch."""
        base = self.table.latest_version()
        props = self._props(base)
        enc = source_df.withColumn(
            self._code_col,
            similarity.pq_encode_expr(F.col(vec_col), codebooks),
        )
        cols = [id_col, self._code_col] + list(attr_cols or [])
        cents = (
            centroids if centroids is not None else props.get(PROP_CENTROIDS)
        )
        if cents is not None:
            enc = enc.withColumn(
                self._cell_col,
                similarity.ivf_cell_expr(F.col(vec_col), cents),
            )
            cols.insert(1, self._cell_col)
        new_props = dict(props)
        new_props[PROP_CODEBOOKS] = codebooks
        new_props[PROP_CENTROIDS] = cents
        new_props[PROP_VERSION] = int(props.get(PROP_VERSION, 1)) + 1
        return self.table.overwrite(
            self._clustered(enc.select(*cols), cents),
            properties=new_props,
            require_latest=base,
        )

    # -- query -------------------------------------------------------------

    def topk(
        self,
        query_vec: list[float],
        k: int = 10,
        nprobe: int | None = None,
        candidate_filter=None,
        exclude_id: int | None = None,
        version: int | None = None,
        id_col: str = "vec_id",
    ) -> DataFrame:
        """ADC top-k over the stored codes at ``version`` (default: the
        latest commit, resolved ONCE — the returned plan is pinned to
        that snapshot; later appends/refreshes do not leak in). With
        ``nprobe`` (and stored centroids) the probe-cell predicate goes
        through ``scan``'s partition pruning — zero data IO outside the
        probed cells; ``candidate_filter`` composes as a residual
        predicate over the stored attribute columns."""
        v = version if version is not None else self.table.latest_version()
        if v is None:
            raise ValueError(f"PqVectorIndex at {self.path} is empty")
        props = self._props(v)
        cbs = props[PROP_CODEBOOKS]
        cents = props.get(PROP_CENTROIDS)
        if nprobe is not None:
            if cents is None:
                raise ValueError(
                    "nprobe given but the index has no stored centroids"
                )
            probe = similarity._select_probes(query_vec, cents, nprobe)
            codes = self.table.scan(
                [(self._cell_col, "in", tuple(probe))], version=v
            )
        else:
            codes = self.table.snapshot(version=v)
        if candidate_filter is not None:
            codes = codes.where(candidate_filter)
        return similarity.pq_adc_topk(
            codes,
            query_vec,
            cbs,
            k=k,
            id_col=id_col,
            code_col=self._code_col,
            exclude_id=exclude_id,
        )

    def dedup_gate(
        self,
        batch_df: DataFrame,
        threshold: float,
        nprobe: int = 4,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        version: int | None = None,
        broadcast_batch: bool = True,
    ) -> DataFrame:
        """EMBEDDING NEAR-DUP GATE against the stored index — the
        vector analog of ``dedup_incremental`` (operators/dedup.py):
        before a new batch is appended, score each new embedding's
        approximate (ADC) distance to its nearest stored neighbor and
        flag ``keep = min_adc is NULL or min_adc > threshold`` — the
        rows a near-dup-free ingest should append. Output per batch
        row: ``(id, min_adc, keep)``.

        Plan shape (never all-pairs): each new vector probes its
        ``nprobe`` nearest IVF cells (``ivf_probe_cells_expr`` — same
        arithmetic and tie order as every other probe site), its m
        per-subspace ADC distance tables ride along as m×ks doubles,
        and the BROADCAST batch joins the stored codes on the cell id —
        candidates are |batch| × nprobe/n_cells of the store, scored at
        m code-byte lookups each, embeddings never read from the store
        (it has none).

        BATCH SIZE (r12, VERDICT r11 next #5): ``broadcast_batch=True``
        (default) broadcasts the probe rows — right whenever the batch
        fits the broadcast budget (each probe row carries its m×ks
        ADC tables: ~m·ks·8 bytes ≈ 2 KB/row at the 8×16 default, so
        the 10 MB default threshold crosses around ~5k rows/10 MB
        budget — with production multi-GB budgets, millions of rows;
        the daily-increment shape). For a BACKFILL batch beyond that,
        pass ``broadcast_batch=False``: the probe rows SHUFFLE-HASH
        join the stored codes on the cell id instead — both sides
        hash-partition on the cell, no driver-side collect of the
        batch, same result by construction (the oracle is shared, and
        the plan is asserted broadcast-free in
        tests/test_ann_dedup_gate.py). The crossover is simply
        whether |batch| × 2 KB fits the executor broadcast budget.

        CELL-PRUNED STORE READ (r11, VERDICT r10 next #6): the stored
        side is not the full snapshot but ``scan`` restricted to the
        UNION of the batch's probe cells — on the cell-partitioned
        layout the commit log prunes every non-probed cell's files with
        zero data IO (the same ``in``-predicate path ``topk`` takes).
        The union is collected driver-side, bounded by n_cells values
        regardless of batch size (and the batch broadcasts by
        contract, so one extra tiny job over it is noise); a batch
        whose probes cover every cell degrades to the full read it
        always was."""
        from . import similarity as S

        v = version if version is not None else self.table.latest_version()
        props = self._props(v)
        cbs = props[PROP_CODEBOOKS]
        cents = props.get(PROP_CENTROIDS)
        if cents is None:
            raise ValueError(
                "dedup_gate needs stored centroids (IVF-blocked "
                "candidates); build the index with centroids"
            )
        m = len(cbs)
        tabs = S._pq_subdist_arrays(F.col(vec_col), cbs)
        probe_cells_expr = S.ivf_probe_cells_expr(
            F.col(vec_col), cents, nprobe
        )
        probe_rows = batch_df.select(
            F.col(id_col).alias("_gate_id"),
            F.explode(probe_cells_expr).alias(self._cell_col),
            *[t.alias(f"_tab{s}") for s, t in enumerate(tabs)],
        )
        probed = sorted(
            r[0]
            for r in batch_df.select(
                F.explode(probe_cells_expr).alias("c")
            )
            .distinct()
            .collect()
        )
        if probed:
            stored = self.table.scan(
                [(self._cell_col, "in", tuple(probed))], version=v
            ).select(self._cell_col, self._code_col)
        else:  # empty batch: nothing probes, nothing to read
            stored = self.table.snapshot(version=v).select(
                self._cell_col, self._code_col
            ).limit(0)
        if broadcast_batch:
            joined = F.broadcast(probe_rows).join(stored, self._cell_col)
        else:
            # shuffle-hash, not sort-merge: the cell id is a small int
            # key with bounded cardinality — hash-partitioning both
            # sides is one exchange each, no sort; the hint also stops
            # AQE from converting back to a broadcast it was told to
            # avoid
            joined = probe_rows.hint("shuffle_hash").join(
                stored, self._cell_col
            )
        adc = None
        for s in range(m):
            term = F.element_at(
                F.col(f"_tab{s}"), F.col(self._code_col)[s] + 1
            )
            adc = term if adc is None else adc + term
        cand = joined.select("_gate_id", adc.alias("_adc"))
        mins = cand.groupBy("_gate_id").agg(F.min("_adc").alias("min_adc"))
        return (
            batch_df.select(F.col(id_col))
            .join(
                mins.withColumnRenamed("_gate_id", id_col),
                id_col,
                "left",
            )
            .select(
                id_col,
                F.round("min_adc", 6).alias("min_adc"),
                (
                    F.col("min_adc").isNull()
                    | (F.col("min_adc") > F.lit(float(threshold)))
                ).alias("keep"),
            )
        )

    # -- maintenance / audit -----------------------------------------------

    def delete(self, where: list[tuple]) -> dict:
        """DELETE vectors from the index — the GDPR-erasure surface a
        production vector store needs (r11): a merge-on-read
        ``delete_dv`` on the underlying table, so erasing a handful of
        vectors from a billion-code index writes O(deleted rows) of
        addresses and rewrites ZERO code files; every query path
        (topk / dedup_gate / scan) anti-joins the sidecar from the same
        snapshot machinery, erased vectors stay erased through OPTIMIZE
        (which materializes the DVs away), and time travel still
        serves pre-erasure versions until ``purge_dv`` + ``vacuum``
        retire them. ``where`` uses the table predicate grammar, e.g.
        ``[("vec_id", "in", (7, 9))]``."""
        return self.table.delete_dv(where)

    def optimize(self, target_bytes: int = 128 * 1024 * 1024) -> dict:
        """Bin-pack small code files (a streaming-ingested index
        accretes one file per cell per batch) through the table's own
        OPTIMIZE — row-preserving, snapshot-atomic."""
        return self.table.optimize(target_bytes=target_bytes)

    def recall_on(
        self,
        batch_df: DataFrame,
        query_ids: tuple[int, ...] = (0, 101, 202, 303, 404),
        k: int = 10,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """DRIFT GUARD: recall@k of the CURRENT (possibly stale)
        codebooks on a candidate batch — run BEFORE appending a new
        day's embeddings to decide whether the quantizer still fits
        the distribution (mirrors ``similarity_pq_recall``'s audit).
        A dropping number schedules ``reencode``."""
        return similarity.pq_recall(
            batch_df,
            self._props()[PROP_CODEBOOKS],
            query_ids=query_ids,
            k=k,
            id_col=id_col,
            vec_col=vec_col,
        )

    def prune_report(self, query_vec: list[float], nprobe: int) -> dict:
        """How many code files the probe predicate skips — the
        observable partition-pruning claim (zero data IO outside the
        probed cells)."""
        cents = self.centroids()
        if cents is None:
            raise ValueError("index has no stored centroids")
        probe = similarity._select_probes(query_vec, cents, nprobe)
        return self.table.prune_report(
            [(self._cell_col, "in", tuple(probe))]
        )


__all__ = [
    "PqVectorIndex",
    "PROP_CODEBOOKS",
    "PROP_CENTROIDS",
    "PROP_VERSION",
]
