"""Write-time PQ encoding (round 9, VERDICT r8 next #7): codes + cell
persisted at ingest, embedding column dropped — queries over the store
read codes only, the probe filter is partition pruning, and results
match the query-time encoding bit-for-bit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.operators import similarity
from churn_model_evaluation_platform_spark.sources.testdata import load_table

SF_DIR = "/root/testdata/sf0.001"
M, KS, K = 4, 8, 10


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, "embeddings", SF_DIR).cache()


@pytest.fixture(scope="module")
def cbs(emb):
    return similarity.pq_codebooks_pinned(emb, m=M, ks=KS)


@pytest.fixture(scope="module")
def qvec(emb):
    return [
        float(v)
        for v in emb.where(F.col("vec_id") == 0).first()["embedding"]
    ]


@pytest.fixture(scope="module")
def cents(emb):
    rows = {
        r["vec_id"]: [float(v) for v in r["embedding"]]
        for r in emb.where(F.col("vec_id").between(1, 8)).collect()
    }
    return [rows[i] for i in range(1, 9)]


def test_store_has_no_embedding_column(spark, emb, cbs, tmp_path):
    path = str(tmp_path / "codes")
    similarity.write_pq_encoded(emb, cbs, path)
    stored = spark.read.parquet(path)
    assert set(stored.columns) == {"vec_id", "pq_code"}


def test_stored_equals_query_time_adc(spark, emb, cbs, qvec, tmp_path):
    path = str(tmp_path / "codes")
    similarity.write_pq_encoded(emb, cbs, path)
    stored = similarity.pq_adc_topk_stored(
        spark, path, qvec, cbs, k=K, exclude_id=0
    ).collect()
    live = similarity.pq_adc_topk(
        similarity.pq_encode(emb, cbs), qvec, cbs, k=K, exclude_id=0
    ).collect()
    assert [(r["vec_id"], r["adc_dist"]) for r in stored] == [
        (r["vec_id"], r["adc_dist"]) for r in live
    ]


def test_scan_reads_codes_only(spark, emb, cbs, qvec, tmp_path):
    """The physical plan's ReadSchema must be id + codes — no vector
    bytes in the scan, which is the entire residency claim."""
    path = str(tmp_path / "codes")
    similarity.write_pq_encoded(emb, cbs, path)
    out = similarity.pq_adc_topk_stored(spark, path, qvec, cbs, k=K)
    plan = out._jdf.queryExecution().executedPlan().toString()
    scan = plan[plan.index("ReadSchema") :].splitlines()[0]
    assert "embedding" not in scan
    assert "pq_code" in scan


def test_cell_partitioned_store_prunes_directories(
    spark, emb, cbs, qvec, cents, tmp_path
):
    """With centroids the store is partitioned by ivf_cell and the
    probe filter lands in PartitionFilters — directory pruning before
    a byte is read."""
    path = str(tmp_path / "ivfpq")
    similarity.write_pq_encoded(emb, cbs, path, centroids=cents)
    out = similarity.pq_adc_topk_stored(
        spark, path, qvec, cbs, k=K, centroids=cents, nprobe=2, exclude_id=0
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    pf = plan[plan.index("PartitionFilters") :].splitlines()[0]
    assert "ivf_cell" in pf
    # and the pruned result equals filtering the unpartitioned store
    # to the same probe cells (layout changes IO, never answers)
    probe = similarity._select_probes(qvec, cents, 2)
    flat = str(tmp_path / "flat")
    similarity.write_pq_encoded(emb, cbs, flat, centroids=cents)
    want = similarity.pq_adc_topk(
        spark.read.parquet(flat).where(F.col("ivf_cell").isin(probe)),
        qvec,
        cbs,
        k=K,
        exclude_id=0,
    ).collect()
    assert [r["vec_id"] for r in out.collect()] == [
        r["vec_id"] for r in want
    ]


def test_stored_rerank_against_source_embeddings(
    spark, emb, cbs, qvec, tmp_path
):
    """Two-stage over the store: ADC shortlist from codes, exact
    re-rank fetching ONLY the shortlist's embeddings from the source
    table (broadcast semi-join, not a corpus scan)."""
    path = str(tmp_path / "codes")
    similarity.write_pq_encoded(emb, cbs, path)
    short = similarity.pq_adc_topk_stored(
        spark, path, qvec, cbs, k=4 * K, exclude_id=0
    ).select("vec_id")
    cand = emb.join(F.broadcast(short), "vec_id", "left_semi")
    got = similarity.cosine_topk(cand, qvec, K, exclude_id=0).collect()
    want = similarity.pq_adc_topk_rerank(
        similarity.pq_encode(emb, cbs), qvec, cbs, k=K, exclude_id=0
    ).collect()
    assert [r["vec_id"] for r in got] == [r["vec_id"] for r in want]


def test_filtered_store_pushes_predicate_no_embedding(
    spark, emb, cbs, qvec, tmp_path
):
    """r9 filtered search over the code store: attributes stored next
    to the codes, the filter a PUSHED parquet predicate — and the scan
    still embedding-free."""
    path = str(tmp_path / "codes_attr")
    similarity.write_pq_encoded(emb, cbs, path, attr_cols=["label"])
    assert set(spark.read.parquet(path).columns) == {
        "vec_id",
        "pq_code",
        "label",
    }
    out = similarity.pq_adc_topk_stored(
        spark, path, qvec, cbs, k=K, exclude_id=0,
        candidate_filter=F.col("label") == 1,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    scan = plan[plan.index("ReadSchema") :].splitlines()[0]
    assert "embedding" not in scan
    pushed = plan[plan.index("PushedFilters") :].splitlines()[0]
    assert "label" in pushed  # the filter reached the parquet scan
    # every hit satisfies the predicate, and results equal the
    # query-time filtered encoding
    rows = out.collect()
    labels = {
        r["vec_id"]: r["label"]
        for r in emb.select("vec_id", "label").collect()
    }
    assert rows and all(labels[r["vec_id"]] == 1 for r in rows)
    live = similarity.pq_adc_topk(
        similarity.pq_encode(emb.where(F.col("label") == 1), cbs),
        qvec, cbs, k=K, exclude_id=0,
    ).collect()
    assert [(r["vec_id"], r["adc_dist"]) for r in rows] == [
        (r["vec_id"], r["adc_dist"]) for r in live
    ]


def test_filtered_cell_partitioned_store_composes(
    spark, emb, cbs, qvec, cents, tmp_path
):
    """Filter + probe pruning together: the scan reads only probed
    cell directories AND applies the pushed attribute predicate."""
    path = str(tmp_path / "codes_attr_cells")
    similarity.write_pq_encoded(
        emb, cbs, path, centroids=cents, attr_cols=["label"]
    )
    out = similarity.pq_adc_topk_stored(
        spark, path, qvec, cbs, k=K, exclude_id=0,
        centroids=cents, nprobe=2,
        candidate_filter=F.col("label") == 1,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    rows = out.collect()
    labels = {
        r["vec_id"]: r["label"]
        for r in emb.select("vec_id", "label").collect()
    }
    assert rows and all(labels[r["vec_id"]] == 1 for r in rows)
