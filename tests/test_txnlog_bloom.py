"""Per-file BLOOM FILTERS on the transactional table
(sources/txnlog.py `bloom_columns`): point-lookup skipping on
high-cardinality keys that min/max zone maps cannot prune (a uniformly
shuffled id makes every file's [min, max] cover every literal).
Invariants: no false negatives ever (every present key's file is
kept), `scan(where)` ≡ full-read + filter, blooms survive checkpoints
and column renames, cross-kind literals never consult the bloom (a
false negative would otherwise hide Spark's implicit-cast matches),
and the whole surface is advisory — a reader ignoring the key only
reads more files.

Reference parity: the reference stores model/metric frames as plain
parquet and filters in pandas (churn-model-evaluation-platform
pipeline.py) — point lookups re-read everything; here the log's
metadata answers "definitely not in this file" per file.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.sources.txnlog import (
    TxnTable,
    _bloom_may_contain,
    _file_may_match,
)


def _frame(spark, ids):
    return spark.createDataFrame(
        [(i, f"u{i:06d}") for i in ids], "uid long, name string"
    )


@pytest.fixture()
def shuffled_ids():
    rng = random.Random(7)
    ids = list(range(200_000))
    rng.shuffle(ids)
    return ids


@pytest.fixture()
def table(spark, tmp_path, shuffled_ids):
    """4 commits x 2 files of uniformly shuffled ids: every file's
    [min, max] spans nearly the whole key space, so range stats keep
    everything and only the bloom can prune."""
    t = TxnTable(spark, str(tmp_path / "tbl"), bloom_columns=["uid"])
    for c in range(4):
        t.append(_frame(spark, shuffled_ids[c * 800 : (c + 1) * 800]).repartition(2))
    return t


def test_point_lookup_prunes_where_minmax_cannot(table, shuffled_ids):
    probe = shuffled_ids[5]
    rep = table.prune_report([("uid", "=", probe)])
    assert rep["total"] == 8
    # range stats alone keep all 8 (uniform shuffle); the bloom keeps
    # the one true file plus at most one ~0.1%-probability false hit
    assert rep["kept"] <= 2
    rows = table.scan([("uid", "=", probe)]).collect()
    assert [(r["uid"], r["name"]) for r in rows] == [(probe, f"u{probe:06d}")]


def test_no_false_negatives(table, shuffled_ids):
    st = table._state()
    for probe in shuffled_ids[:100]:
        rows = table.scan([("uid", "=", probe)]).collect()
        assert len(rows) == 1 and rows[0]["uid"] == probe
    # and the driver-side primitive agrees: the file physically holding
    # the key is never pruned (checked via full-scan ground truth)
    assert all(
        _file_may_match(st["stats"].get(rel), [("uid", "=", shuffled_ids[0])])
        for rel in st["live"]
        if shuffled_ids[0]
        in {r["uid"] for r in table._read_files(st, [rel]).collect()}
    )


def test_absent_key_prunes_everything(table):
    rep = table.prune_report([("uid", "=", 999_999_999)])
    assert rep == {"total": 8, "kept": 0, "pruned": 8}
    assert table.scan([("uid", "=", 999_999_999)]).collect() == []


def test_in_predicate_uses_bloom(table, shuffled_ids):
    probes = [shuffled_ids[3], 999_999_998]
    rep = table.prune_report([("uid", "in", probes)])
    assert rep["kept"] <= 2
    rows = table.scan([("uid", "in", probes)]).collect()
    assert [r["uid"] for r in rows] == [shuffled_ids[3]]


def test_string_bloom(spark, tmp_path, shuffled_ids):
    t = TxnTable(spark, str(tmp_path / "tbl"), bloom_columns=["name"])
    for c in range(3):
        t.append(_frame(spark, shuffled_ids[c * 500 : (c + 1) * 500]).repartition(2))
    key = f"u{shuffled_ids[2]:06d}"
    rep = t.prune_report([("name", "=", key)])
    assert rep["total"] == 6 and rep["kept"] <= 2
    assert [r["name"] for r in t.scan([("name", "=", key)]).collect()] == [key]
    assert t.scan([("name", "=", "zzz-absent")]).collect() == []


def test_cross_kind_literal_never_consults_bloom():
    bl = {"m": 64, "k": 2, "kind": "str", "b64": "AAAAAAAAAAA="}
    # '05' = 5 matches under Spark's implicit cast; an int probe of a
    # string bloom must answer None (keep), never False (prune)
    assert _bloom_may_contain(bl, 5) is None
    assert _bloom_may_contain({**bl, "kind": "int"}, "5") is None
    assert _bloom_may_contain({**bl, "kind": "int"}, True) is None
    assert _bloom_may_contain({**bl, "kind": "int"}, 1.5) is None
    # matching kind against an all-zero filter: definitely absent
    assert _bloom_may_contain(bl, "x") is False
    assert _bloom_may_contain({**bl, "kind": "int"}, 5) is False


def test_bloom_survives_checkpoint_and_fresh_handle(
    spark, tmp_path, shuffled_ids
):
    t = TxnTable(
        spark,
        str(tmp_path / "tbl"),
        bloom_columns=["uid"],
        checkpoint_interval=2,
    )
    for c in range(5):  # crosses two checkpoint boundaries
        t.append(_frame(spark, shuffled_ids[c * 300 : (c + 1) * 300]).coalesce(1))
    fresh = TxnTable(spark, str(tmp_path / "tbl"), bloom_columns=["uid"])
    rep = fresh.prune_report([("uid", "=", shuffled_ids[1])])
    assert rep["total"] == 5 and rep["kept"] <= 2
    got = fresh.scan([("uid", "=", shuffled_ids[1])]).collect()
    assert [r["uid"] for r in got] == [shuffled_ids[1]]


def test_bloom_follows_column_rename(spark, tmp_path, shuffled_ids):
    t = TxnTable(spark, str(tmp_path / "tbl"), bloom_columns=["uid"])
    t.append(_frame(spark, shuffled_ids[:400]).coalesce(1))
    t.rename_column("uid", "user_id")
    t2 = TxnTable(spark, str(tmp_path / "tbl"), bloom_columns=["user_id"])
    t2.append(
        _frame(spark, shuffled_ids[400:800])
        .withColumnRenamed("uid", "user_id")
        .coalesce(1)
    )
    # a key from the PRE-rename commit: stats are keyed by the stable
    # physical name, predicates arrive logical — both files bloom-prune
    probe = shuffled_ids[0]
    rep = t2.prune_report([("user_id", "=", probe)])
    assert rep["total"] == 2 and rep["kept"] == 1
    got = t2.scan([("user_id", "=", probe)]).collect()
    assert [r["user_id"] for r in got] == [probe]


def test_unsupported_bloom_type_raises(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "tbl"), bloom_columns=["x"])
    with pytest.raises(ValueError, match="unsupported type"):
        t.append(spark.createDataFrame([(1.5,)], "x double"))


def test_bad_bloom_bits_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="multiple of 64"):
        TxnTable(spark, str(tmp_path / "t"), bloom_bits=100)


def test_nulls_never_enter_the_bloom(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "tbl"), bloom_columns=["uid"])
    t.append(
        spark.createDataFrame(
            [(None, "a"), (None, "b")], "uid long, name string"
        ).coalesce(1)
    )
    t.append(
        spark.createDataFrame([(7, "c")], "uid long, name string").coalesce(1)
    )
    # the all-null file prunes for any equality (null-rejecting)
    rep = t.prune_report([("uid", "=", 7)])
    assert rep == {"total": 2, "kept": 1, "pruned": 1}
    assert [r["name"] for r in t.scan([("uid", "=", 7)]).collect()] == ["c"]


def test_bloom_conservative_under_dv_delete(spark, tmp_path, shuffled_ids):
    t = TxnTable(spark, str(tmp_path / "tbl"), bloom_columns=["uid"])
    t.append(_frame(spark, shuffled_ids[:400]).coalesce(1))
    probe = shuffled_ids[10]
    t.delete_dv([("uid", "=", probe)])
    # the file still bloom-matches (write-time superset) — the DV
    # anti-join, not the prune, removes the row
    assert t.scan([("uid", "=", probe)]).collect() == []


def test_sink_blooms_match_library_blooms_bit_for_bit(
    spark, tmp_path, shuffled_ids
):
    from churn_model_evaluation_platform_spark.sources.txnlog_datasource import (
        register_txnlog_source,
    )

    register_txnlog_source(spark)
    df = _frame(spark, shuffled_ids[:500]).coalesce(1)
    lib = TxnTable(spark, str(tmp_path / "lib"), bloom_columns=["uid"])
    lib.append(df)
    df.write.format("txnlog").mode("append").option(
        "bloomColumns", "uid"
    ).save(str(tmp_path / "sink"))
    snk = TxnTable(spark, str(tmp_path / "sink"))

    def _bloom(t):
        st = t._state()
        (rel,) = st["live"]
        return st["stats"][rel]["bloom"]["uid"]

    assert _bloom(lib) == _bloom(snk)
    # and the sink-written table prunes the same point lookups
    rep = snk.prune_report([("uid", "=", 999_999_999)])
    assert rep["kept"] == 0
    got = snk.scan([("uid", "=", shuffled_ids[3])]).collect()
    assert [r["uid"] for r in got] == [shuffled_ids[3]]


def test_format_reader_pushes_point_lookup_through_bloom(
    spark, table, shuffled_ids
):
    from churn_model_evaluation_platform_spark.sources.txnlog_datasource import (
        register_txnlog_source,
    )

    register_txnlog_source(spark)
    base = spark.read.format("txnlog").load(table.path)
    assert base.rdd.getNumPartitions() == 8  # one per live file
    probe = shuffled_ids[5]
    filtered = base.where(F.col("uid") == probe)
    # the pushed '=' consults the bloom in _file_may_match: at most the
    # true file + one ~0.1%-probability false hit get planned
    assert filtered.rdd.getNumPartitions() <= 2
    assert [r["uid"] for r in filtered.collect()] == [probe]


def test_sink_bloom_unsupported_type_raises(spark, tmp_path):
    from churn_model_evaluation_platform_spark.sources.txnlog_datasource import (
        register_txnlog_source,
    )

    register_txnlog_source(spark)
    with pytest.raises(Exception, match="unsupported type"):
        spark.createDataFrame([(1.5,)], "x double").write.format(
            "txnlog"
        ).mode("append").option("bloomColumns", "x").save(
            str(tmp_path / "t")
        )


def test_distributed_prune_probes_blooms(table, shuffled_ids):
    """r12: the DISTRIBUTED prune path probes per-file blooms as a
    Catalyst expression over file_index (the r11 watch item — at 10^6
    files the driver-side bloom loop had to join the distributed
    path). Same prune power as the driver loop, same no-false-negative
    guarantee, and the two paths must agree file-for-file."""
    probe = shuffled_ids[5]
    drep = table.prune_report([("uid", "=", probe)], distributed=True)
    rep = table.prune_report([("uid", "=", probe)])
    assert drep["total"] == 8
    assert drep["pruned"] >= 6  # blooms prune where min/max cannot
    assert drep == rep  # distributed == driver, file-for-file power
    got = table.scan([("uid", "=", probe)], distributed=True).collect()
    assert [r["uid"] for r in got] == [probe]


def test_distributed_bloom_no_false_negatives(table, shuffled_ids):
    """Every present key must survive the distributed bloom prune —
    probe a spread of real keys and require exact scan results."""
    for probe in shuffled_ids[:3200:640]:  # keys the table holds
        got = table.scan(
            [("uid", "=", probe)], distributed=True
        ).collect()
        assert [r["uid"] for r in got] == [probe]


def test_distributed_bloom_in_list_and_kind_guard(table, shuffled_ids):
    """'in' prunes only when EVERY member is provably absent; a
    cross-kind literal (string against an int bloom) never consults
    the bloom on the distributed path either."""
    present, absent = shuffled_ids[5], 10_000_000
    got = table.scan(
        [("uid", "in", (present, absent))], distributed=True
    ).collect()
    assert [r["uid"] for r in got] == [present]
    # all-absent in-list: scans nothing but stays a valid empty read
    rep = table.prune_report(
        [("uid", "in", (10_000_001, 10_000_002))], distributed=True
    )
    assert rep["pruned"] == rep["total"] == 8
    # cross-kind: str literal against the int bloom - conservative keep
    rep2 = table.prune_report(
        [("name", "=", 12345)], distributed=True
    )
    assert rep2["pruned"] == 0


def test_blooms_collected_with_stats_disabled(spark, tmp_path):
    """stats_columns=[] disables min/max tracking but must NOT
    silently skip configured bloom_columns (ADVICE r11 low): the bloom
    pass runs regardless, so point lookups still prune."""
    t = TxnTable(
        spark,
        str(tmp_path / "nb"),
        stats_columns=[],
        bloom_columns=["uid"],
    )
    rng = random.Random(3)
    ids = list(range(2_000))
    rng.shuffle(ids)
    t.append(_frame(spark, ids[:1_000]).repartition(2))
    t.append(_frame(spark, ids[1_000:]).repartition(2))
    probe = ids[7]
    rep = t.prune_report([("uid", "=", probe)])
    # range stats are off, so only the bloom can prune — and it does
    assert rep["total"] == 4 and rep["pruned"] >= 2
    got = t.scan([("uid", "=", probe)]).collect()
    assert [r["uid"] for r in got] == [probe]


def test_blooms_collected_when_stats_filter_matches_no_field(
    spark, tmp_path
):
    """stats_columns naming only a non-existent column leaves the
    min/max field list empty — blooms on a REAL column still land."""
    t = TxnTable(
        spark,
        str(tmp_path / "nb2"),
        stats_columns=["no_such_col"],
        bloom_columns=["name"],
    )
    t.append(_frame(spark, range(100)).coalesce(1))
    t.append(_frame(spark, range(100, 200)).coalesce(1))
    rep = t.prune_report([("name", "=", "u000005")])
    assert rep["total"] == 2 and rep["pruned"] == 1
