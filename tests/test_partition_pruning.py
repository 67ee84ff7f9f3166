"""Partition-pruning evidence for the similarity scale path: a corpus
written partitioned by ivf_cell is read back with PartitionFilters —
probing nprobe cells scans only those directories."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.operators.similarity import (
    fit_ivf_centroids,
    ivf_cell_expr,
)

DIM = 6


def test_ivf_partitioned_corpus_prunes(spark, tmp_path):
    rng = random.Random(9)
    centers = [[6.0] * DIM, [-6.0] * DIM, [0.0] * DIM]
    rows = [
        (i, [rng.gauss(centers[i % 3][j], 1.0) for j in range(DIM)])
        for i in range(300)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = fit_ivf_centroids(emb, n_cells=3, seed=42)

    path = str(tmp_path / "corpus")
    emb.withColumn("ivf_cell", ivf_cell_expr(F.col("embedding"), cents)).write.partitionBy(
        "ivf_cell"
    ).parquet(path)

    probed = spark.read.parquet(path).where(F.col("ivf_cell") == 0)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    # the cell filter must reach the scan as a partition filter...
    assert "PartitionFilters: [isnotnull(ivf_cell" in plan
    # ...and the scanned rows are exactly that cell's rows
    total = spark.read.parquet(path).count()
    cell0 = probed.count()
    assert 0 < cell0 < total


def test_lsh_bucketed_corpus_prunes_multiprobe(spark, tmp_path):
    """The multi-probe LSH scale contract: a corpus written partitioned
    by lsh_bucket serves the probe set as an IN partition filter —
    probing b buckets scans only those directories."""
    from churn_model_evaluation_platform_spark.operators.similarity import (
        lsh_bucket_expr,
        multiprobe_buckets,
        random_hyperplanes,
    )

    rng = random.Random(4)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(DIM)]) for i in range(400)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    planes = random_hyperplanes(DIM, 3, seed=42)

    path = str(tmp_path / "lsh_corpus")
    emb.withColumn(
        "lsh_bucket", lsh_bucket_expr(F.col("embedding"), planes)
    ).write.partitionBy("lsh_bucket").parquet(path)

    q = rows[0][1]
    probes = multiprobe_buckets(q, planes, n_probes=3)
    probed = spark.read.parquet(path).where(F.col("lsh_bucket").isin(probes))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lsh_bucket" in plan.split(
        "PartitionFilters"
    )[1][:200]
    total = spark.read.parquet(path).count()
    scanned = probed.count()
    assert 0 < scanned < total
