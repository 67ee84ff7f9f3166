"""Round-6 batch-3 semantics on hand-built frames: n-gram novelty,
containment vs Jaccard separation, Morton/z-order locality."""

from __future__ import annotations

from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.functions.zorder import (
    morton_interleave,
    morton_interleave_sql,
    zorder_by,
)
from churn_model_evaluation_platform_spark.operators.dedup import (
    containment_pairs,
    ngram_novelty,
)


def test_ngram_novelty_first_doc_fully_novel(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),  # first: all novel
            (2, "a b c d e"),  # exact copy: zero novel
            (3, "a b c x y z"),  # shares 'a b c' only
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in ngram_novelty(docs, n=3).collect()}
    assert out[1].novelty == 1.0 and out[1].n_sh == 3
    assert out[2].novelty == 0.0 and out[2].n_novel == 0
    # doc 3: shingles {abc, bcx, cxy, xyz}; only 'a b c' was seen.
    assert out[3].n_sh == 4 and out[3].n_novel == 3


def test_containment_catches_superset_jaccard_misses(spark):
    base = " ".join(f"w{i}" for i in range(30))
    sup = base + " " + " ".join(f"extra{i}" for i in range(90))
    docs = spark.createDataFrame(
        [(1, base), (2, sup)], "doc_id long, text string"
    )
    rows = containment_pairs(docs, n=3, threshold=0.5).collect()
    assert len(rows) == 1
    r = rows[0]
    # doc 1 fully contained → containment 1.0 but jaccard diluted.
    # (Rare-shingle blocking guarantees the candidate; banded MinHash
    # LSH would have missed it — band collision ~ jaccard^r.)
    assert r.containment == 1.0
    assert r.jaccard < 0.5


def test_morton_interleave_matches_manual_bits(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (1023, 1023)], "x long, y long"
    )
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", morton_interleave(F.col("x"), F.col("y")).alias("z")
        ).collect()
    }

    def morton(x, y):
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    for (x, y), z in got.items():
        assert z == morton(x, y), (x, y, z)


def test_morton_sql_matches_column_expr(spark):
    df = spark.createDataFrame([(i, 1023 - i) for i in range(0, 1024, 37)], "x long, y long")
    df.createOrReplaceTempView("mz")
    via_sql = {
        (r.x, r.y): r.z
        for r in spark.sql(
            f"SELECT x, y, {morton_interleave_sql('x', 'y')} AS z FROM mz"
        ).collect()
    }
    via_col = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", morton_interleave(F.col("x"), F.col("y")).alias("z")
        ).collect()
    }
    assert via_sql == via_col


def test_zorder_by_clusters_both_dimensions(spark):
    # 32x32 grid; after z-ordering into 8 partitions, each partition's
    # bounding box must be much tighter than the full domain in BOTH
    # dims (the point of Morton layout vs sorting by one column).
    df = spark.createDataFrame(
        [(x, y) for x in range(32) for y in range(32)], "x long, y long"
    )
    z = zorder_by(df, "x", "y", num_partitions=8)
    assert sorted(r.x * 32 + r.y for r in z.collect()) == list(range(1024))
    spans = (
        z.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
        )
        .collect()
    )
    assert len(spans) == 8
    # Perfect z-order on a 32x32 grid into 8 equal ranges gives 16x8
    # (or 8x16) tiles; allow slack for sampled range boundaries.
    assert all(r.sx <= 20 and r.sy <= 20 for r in spans), spans


def test_containment_recall_for_tiny_docs(spark):
    """A doc with fewer distinct shingles than min_blocks (here one:
    exactly n=3 tokens) can never collide on 2 blocks; the threshold
    must degrade to the doc's own shingle count so full containment
    still surfaces (ADVICE r6)."""
    big = " ".join(f"w{i}" for i in range(40))
    tiny = "w10 w11 w12"  # one 3-shingle, contained verbatim in big
    docs = spark.createDataFrame(
        [(1, big), (2, tiny), (3, "q r s t u v")],  # doc 3: no overlap
        "doc_id long, text string",
    )
    rows = containment_pairs(docs, n=3, threshold=0.5).collect()
    pairs = {(r.id_a, r.id_b): r for r in rows}
    assert (1, 2) in pairs
    assert pairs[(1, 2)].containment == 1.0
    assert all(3 not in k for k in pairs)
