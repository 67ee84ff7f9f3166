"""Incremental ANN store on the transactional table (round 10, VERDICT
r9 next #1): PqVectorIndex — exactly-once code ingest, snapshot-isolated
queries, zero-IO probe pruning, OPTIMIZE compaction, atomic codebook
refresh, and the stale-codebook drift guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.operators import similarity
from churn_model_evaluation_platform_spark.operators.ann_store import PqVectorIndex
from churn_model_evaluation_platform_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"
M, KS, K, NCELLS, NPROBE = 4, 8, 10, 16, 4


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, "embeddings", SF).cache()


@pytest.fixture(scope="module")
def pinned(spark, emb):
    cbs = similarity.pq_codebooks_pinned(emb, m=M, ks=KS)
    small = {
        r["vec_id"]: [float(v) for v in r["embedding"]]
        for r in emb.where(
            F.col("vec_id").isin(list(range(0, NCELLS + 1)))
        ).collect()
    }
    cents = [small[j] for j in range(1, NCELLS + 1)]
    return cbs, cents, small[0]


@pytest.fixture()
def index(spark, emb, pinned, tmp_path):
    cbs, cents, _ = pinned
    idx = PqVectorIndex.create(spark, str(tmp_path / "idx"), cbs, cents)
    idx.append(emb.where("vec_id % 2 = 0"), batch_id=0)
    idx.append(emb.where("vec_id % 2 = 1"), batch_id=1)
    return idx


def _ids(df):
    return [r["vec_id"] for r in df.collect()]


def test_store_matches_query_time_demo(spark, emb, pinned, index):
    cbs, cents, qvec = pinned
    got = index.topk(qvec, k=K, nprobe=NPROBE, exclude_id=0)
    ref = similarity.cosine_topk_ivfpq_pinned(
        emb, n_cells=NCELLS, nprobe=NPROBE, m=M, ks=KS, k=K
    )
    assert [
        (r["vec_id"], round(r["adc_dist"], 9)) for r in got.collect()
    ] == [(r["vec_id"], round(r["adc_dist"], 9)) for r in ref.collect()]


def test_embedding_never_stored(spark, index):
    assert index.table.snapshot().columns == [
        "vec_id",
        "ivf_cell",
        "pq_code",
    ]


def test_exactly_once_append(spark, emb, index):
    n = index.table.snapshot().count()
    v = index.table.latest_version()
    assert index.append(emb.where("vec_id % 2 = 0"), batch_id=0) == v
    assert index.table.snapshot().count() == n


def test_snapshot_isolation_append_query_append_query(
    spark, emb, pinned, index
):
    cbs, cents, qvec = pinned
    v1 = index.table.latest_version()
    before = _ids(index.topk(qvec, k=K, nprobe=NPROBE, exclude_id=0))
    # craft an intruder identical to the true top-1 neighbor: it MUST
    # appear in fresh queries and MUST NOT in version-pinned ones
    top1 = before[0]
    intruder = (
        emb.where(F.col("vec_id") == top1)
        .withColumn("vec_id", F.lit(999_999).cast("long"))
    )
    index.append(intruder, batch_id=2)
    pinned_q = _ids(
        index.topk(qvec, k=K, nprobe=NPROBE, exclude_id=0, version=v1)
    )
    fresh_q = _ids(index.topk(qvec, k=K, nprobe=NPROBE, exclude_id=0))
    assert pinned_q == before
    assert 999_999 in fresh_q and 999_999 not in pinned_q


def test_probe_pruning_skips_cells(spark, pinned, index):
    _, _, qvec = pinned
    rep = index.prune_report(qvec, nprobe=NPROBE)
    # 4 of 16 cells probed; dense corpus -> most cell files skipped
    assert rep["pruned"] > 0 and rep["kept"] < rep["total"]


def test_optimize_compacts_and_preserves(spark, pinned, index):
    _, _, qvec = pinned
    before = _ids(index.topk(qvec, k=K, nprobe=NPROBE, exclude_id=0))
    n_files_before = len(index.table.files())
    rep = index.optimize()
    assert rep["files_rewritten"] > 0
    assert len(index.table.files()) < n_files_before
    assert _ids(index.topk(qvec, k=K, nprobe=NPROBE, exclude_id=0)) == before


def test_reencode_is_atomic_and_versioned(spark, emb, pinned, index):
    cbs, cents, qvec = pinned
    v_old = index.table.latest_version()
    assert index.codebook_version() == 1
    # refreshed codebooks: pinned rows 2..KS+1 (a genuinely different
    # quantizer, still deterministic)
    rows = {
        r["vec_id"]: [float(v) for v in r["embedding"]]
        for r in emb.where(
            F.col("vec_id").isin(list(range(2, KS + 2)))
        ).collect()
    }
    d_sub = len(rows[2]) // M
    cbs2 = [
        [rows[i][s * d_sub : (s + 1) * d_sub] for i in range(2, KS + 2)]
        for s in range(M)
    ]
    index.reencode(emb, cbs2, cents)
    assert index.codebook_version() == 2
    # old snapshot still pairs old codes WITH old codebooks
    assert index.codebook_version(version=v_old) == 1
    old_q = index.topk(qvec, k=K, nprobe=NPROBE, exclude_id=0, version=v_old)
    assert len(_ids(old_q)) == K
    # fresh query under the new quantizer equals a from-scratch encode
    got = index.topk(qvec, k=K, nprobe=NPROBE, exclude_id=0)
    probe = similarity._select_probes(qvec, cents, NPROBE)
    ref = similarity.pq_adc_topk(
        similarity.pq_encode(
            emb.withColumn(
                "ivf_cell",
                similarity.ivf_cell_expr(F.col("embedding"), cents),
            ).where(F.col("ivf_cell").isin(probe)),
            cbs2,
        ),
        qvec,
        cbs2,
        k=K,
        exclude_id=0,
    )
    assert _ids(got) == _ids(ref)


def test_recall_guard_shape(spark, emb, index):
    row = index.recall_on(emb, k=K).first()
    assert row["n_exact"] == 5 * K
    assert 0.0 <= row["recall"] <= 1.0


def test_create_refuses_existing(spark, emb, pinned, index):
    cbs, cents, _ = pinned
    with pytest.raises(ValueError, match="already has commits"):
        PqVectorIndex.create(spark, index.path, cbs, cents)


def test_open_plain_table_raises(spark, tmp_path):
    from churn_model_evaluation_platform_spark.sources.txnlog import TxnTable

    t = TxnTable(spark, str(tmp_path / "plain"))
    t.append(spark.range(3).coalesce(1))
    idx = PqVectorIndex(spark, t.path)
    with pytest.raises(ValueError, match="not a PqVectorIndex"):
        idx.codebooks()


def test_delete_vectors_erased_everywhere(spark, emb, pinned, index):
    # r11 GDPR erasure: delete a vec-id band merge-on-read — zero code
    # files rewritten, and NO query surface serves an erased vector
    _, _, qvec = pinned
    pre_files = set(index.table.files())
    n_band = emb.where("vec_id >= 100 and vec_id < 200").count()
    rep = index.delete([("vec_id", ">=", 100), ("vec_id", "<", 200)])
    assert rep["files_rewritten"] == 0
    assert rep["rows_deleted"] == n_band
    assert set(index.table.files()) == pre_files
    # topk over the whole store never surfaces the band
    got = index.topk(qvec, k=emb.count(), exclude_id=0)
    ids = {r["vec_id"] for r in got.collect()}
    assert not any(100 <= i < 200 for i in ids)
    # the gate cannot match against erased codes either: resubmitting
    # a deleted vector finds candidates only among the survivors
    dup = emb.where("vec_id = 150").withColumn(
        "vec_id", F.col("vec_id") + 1_000_000
    )
    out = index.dedup_gate(dup, threshold=1e18, nprobe=NCELLS).collect()
    assert len(out) == 1
    # its own (erased) code is gone, so min_adc is the distance to some
    # OTHER stored vector — strictly above the self-quantization floor
    cbs = pinned[0]
    self_adc = None
    for t in similarity._pq_subdist_arrays(F.col("embedding"), cbs):
        term = F.array_min(t)
        self_adc = term if self_adc is None else self_adc + term
    floor = dup.select(self_adc.alias("f")).first()["f"]
    assert out[0]["min_adc"] > floor + 1e-9
    # erasure survives OPTIMIZE (DVs materialize away, rows stay gone)
    index.optimize()
    assert not index.table._state()["dv"]
    got2 = index.topk(qvec, k=emb.count(), exclude_id=0)
    assert {r["vec_id"] for r in got2.collect()} == ids
    # pre-erasure versions remain time-travelable until purged
    v_pre = 3  # two appends land at v2/v3 (v1 = properties commit)
    assert index.topk(qvec, k=emb.count(), exclude_id=0, version=v_pre) \
        .where("vec_id = 150").count() == 1
