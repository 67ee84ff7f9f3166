"""Measured recall audits for the IVF similarity path (VERDICT r7 #1):
the ANN counterpart of the dedup candidate-recall family. Pins the
nprobe→recall curve shape (monotone, exact at nprobe == n_cells) and a
quality floor for the production KMeans quantizer; the measured curves
are recorded in SCALE.md ("IVF recall curve")."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.operators.similarity import (
    fit_ivf_centroids,
    ivf_recall,
    ivf_recall_pinned,
)

SF_DIR = "/root/testdata/sf0.001"
QIDS = (0, 101, 202, 303, 404)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def qvecs(emb):
    return {
        int(r["vec_id"]): [float(v) for v in r["embedding"]]
        for r in emb.where(F.col("vec_id").isin(list(QIDS))).collect()
    }


def test_pinned_recall_exact_when_all_cells_probed(emb):
    # nprobe == n_cells probes every cell → IVF degrades to the exact
    # baseline, recall 1.0 by construction (the curve's sanity anchor).
    row = ivf_recall_pinned(emb, QIDS, n_cells=16, nprobe=16, k=10).first()
    assert row["recall"] == 1.0
    assert row["n_exact"] == row["n_hits"] == len(QIDS) * 10


def test_pinned_recall_monotone_in_nprobe(emb):
    recalls = [
        ivf_recall_pinned(emb, QIDS, n_cells=16, nprobe=p, k=10).first()["recall"]
        for p in (1, 4, 16)
    ]
    assert recalls == sorted(recalls)
    assert recalls[-1] == 1.0


def test_kmeans_recall_floor_and_curve(emb, qvecs):
    # The PRODUCTION quantizer's quality evidence: seeded KMeans with
    # n_cells=8 (the similarity_topk_ivf config). Measured at sf0.001/
    # sf0.01: nprobe 1/2/4/8 → 0.38/0.56/0.86/1.0 — monotone, exact at
    # full probe, and >= 0.7 at the shipped nprobe=4. The floor is set
    # below the measurement so KMeans seed jitter across Spark versions
    # can't flake it, while still catching a broken quantizer (random
    # cells at 50% probe fraction would sit near 0.5).
    cents = fit_ivf_centroids(emb, n_cells=8, seed=42)
    curve = {
        p: ivf_recall(emb, cents, qvecs, nprobe=p, k=10).first()["recall"]
        for p in (1, 2, 4, 8)
    }
    assert curve[8] == 1.0
    assert curve[1] <= curve[2] <= curve[4] <= curve[8]
    assert curve[4] >= 0.7


def test_pinned_missing_ids_raise(spark):
    small = spark.createDataFrame(
        [(i, [float(i)] * 4) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="lacks required"):
        ivf_recall_pinned(small, (0,), n_cells=16, nprobe=4, k=5)


def test_partitioned_corpus_prunes_scan(spark, emb, tmp_path):
    # The 100 TB claim made physical: a corpus written partitioned by
    # ivf_cell turns the probe filter into PartitionFilters (directory
    # pruning before any byte is read), and the pruned result equals
    # the unpartitioned IVF path exactly.
    from churn_model_evaluation_platform_spark.operators.similarity import (
        cosine_topk_ivf,
        cosine_topk_ivf_pruned,
        fit_ivf_centroids,
        write_ivf_partitioned,
    )

    cents = fit_ivf_centroids(emb, n_cells=8, seed=42)
    path = str(tmp_path / "ivf_corpus")
    write_ivf_partitioned(emb, path, cents)

    qvec = [float(v) for v in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    pruned = cosine_topk_ivf_pruned(
        spark, path, qvec, cents, k=10, nprobe=3, exclude_id=0
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    scan = next(l for l in plan.splitlines() if "FileScan" in l)
    assert "PartitionFilters: [ivf_cell" in scan  # pruning, not a data filter
    # the cell predicate must live ONLY in PartitionFilters — the
    # row-wise DataFilters may still carry the (pushed) exclude-id
    data_filters = scan.split("DataFilters:")[1].split(", Format")[0]
    assert "ivf_cell" not in data_filters

    direct = cosine_topk_ivf(emb, qvec, cents, k=10, nprobe=3, exclude_id=0)
    assert [
        (r["vec_id"], round(r["cosine_sim"], 9)) for r in pruned.collect()
    ] == [(r["vec_id"], round(r["cosine_sim"], 9)) for r in direct.collect()]
