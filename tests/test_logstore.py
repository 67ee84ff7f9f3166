"""Log-store abstraction for the transactional table's version claim
(sources/logstore.py — VERDICT r8 missing #4, the S3-compatible commit
protocol): the atomic create-if-absent contract, the object-store
semantics of the local conditional-put stand-in, a full TxnTable
lifecycle running on it (no rename anywhere in the claim path), a
two-writer race where exactly one claim wins per version, and the S3
conditional-put request/response shape pinned against a stub client.
"""

from __future__ import annotations

import json
import os
import threading

import pytest
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.sources.logstore import (
    HadoopRenameLogStore,
    LocalConditionalPutStore,
    S3ConditionalPutStore,
)
from churn_model_evaluation_platform_spark.sources.txnlog import TxnTable


def _frame(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .select(F.col("id"), (F.col("id") * 2.0).alias("v"))
        .coalesce(1)
    )


# -- the contract, per store ----------------------------------------------


@pytest.fixture(params=["rename", "condput"])
def store(request, spark):
    if request.param == "rename":
        from churn_model_evaluation_platform_spark.sources.lifecycle import (
            _fs_and_path,
        )

        fs, _ = _fs_and_path(spark, "/tmp")
        return HadoopRenameLogStore(fs, spark._jvm)
    return LocalConditionalPutStore()


def test_put_if_absent_contract(store, tmp_path):
    p = str(tmp_path / "claims" / "00000000000000000001.json")
    assert store.put_if_absent(p, b'{"v": 1}') is True
    with open(p, "rb") as f:
        assert f.read() == b'{"v": 1}'
    # second claim loses and must NOT touch the content
    assert store.put_if_absent(p, b'{"v": 2}') is False
    with open(p, "rb") as f:
        assert f.read() == b'{"v": 1}'


def test_condput_claim_is_all_or_nothing(tmp_path):
    s = LocalConditionalPutStore()
    target = str(tmp_path / "t.json")
    body = b"x" * 1_000_000
    assert s.put_if_absent(target, body)
    assert os.path.getsize(target) == len(body)  # never torn
    # no tmp residue
    assert [n for n in os.listdir(tmp_path) if n.startswith(".tmp")] == []


def test_condput_concurrent_single_winner(tmp_path):
    s = LocalConditionalPutStore()
    target = str(tmp_path / "race.json")
    results = []
    barrier = threading.Barrier(8)

    def claim(i):
        barrier.wait()
        results.append((i, s.put_if_absent(target, b"%d" % i)))

    threads = [threading.Thread(target=claim, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    winners = [i for i, won in results if won]
    assert len(winners) == 1
    with open(target, "rb") as f:
        assert f.read() == b"%d" % winners[0]


# -- TxnTable on the conditional-put store --------------------------------


def test_txntable_lifecycle_on_conditional_put(spark, tmp_path):
    path = str(tmp_path / "s3ish")
    t = TxnTable(spark, path, log_store=LocalConditionalPutStore())
    t.append(_frame(spark, 0, 10))
    t.append(_frame(spark, 10, 20))
    t.overwrite(_frame(spark, 100, 105))
    assert t.snapshot().count() == 5
    assert [r["id"] for r in t.snapshot(version=2).orderBy("id").collect()][
        :3
    ] == [0, 1, 2]
    assert t.latest_version() == 3
    # log entries are real JSON commits
    with open(os.path.join(path, "_txnlog", f"{3:020d}.json"), "rb") as f:
        assert json.loads(f.read())["action"] == "overwrite"


def test_txntable_rival_claim_retries_on_conditional_put(spark, tmp_path):
    path = str(tmp_path / "s3race")
    t = TxnTable(spark, path, log_store=LocalConditionalPutStore())
    t.append(_frame(spark, 0, 10))  # v1
    # a rival claims v2 out-of-band: the next commit must lose the v2
    # claim, re-resolve, and land v3 — never clobber
    rival = {
        "version": 2,
        "action": "append",
        "added": [],
        "batch_id": None,
        "committed_at": 0.0,
        "stats": {},
        "table_schema": None,
        "constraints": {},
        "partition_by": None,
        "data_change": True,
    }
    claimed = LocalConditionalPutStore().put_if_absent(
        os.path.join(path, "_txnlog", f"{2:020d}.json"),
        json.dumps(rival).encode(),
    )
    assert claimed
    t.append(_frame(spark, 10, 20))  # must land as v3
    assert t.latest_version() == 3
    assert t.snapshot().count() == 20


# -- S3 request shape (stub client; boto3 not a dependency) ----------------


class _StubS3:
    def __init__(self, fail=None):
        self.calls = []
        self._fail = fail

    def put_object(self, **kw):
        self.calls.append(kw)
        if self._fail is not None:
            raise self._fail


class _ClientError(Exception):
    def __init__(self, code, status):
        super().__init__(code)
        self.response = {
            "Error": {"Code": code},
            "ResponseMetadata": {"HTTPStatusCode": status},
        }


def test_s3_store_sends_if_none_match():
    stub = _StubS3()
    s = S3ConditionalPutStore(stub)
    assert s.put_if_absent("s3://bkt/tbl/_txnlog/v1.json", b"{}") is True
    assert stub.calls == [
        {
            "Bucket": "bkt",
            "Key": "tbl/_txnlog/v1.json",
            "Body": b"{}",
            "IfNoneMatch": "*",
        }
    ]


@pytest.mark.parametrize(
    "code,status",
    [("PreconditionFailed", 412), ("ConditionalRequestConflict", 409)],
)
def test_s3_store_lost_race_codes(code, status):
    s = S3ConditionalPutStore(_StubS3(fail=_ClientError(code, status)))
    assert s.put_if_absent("s3a://b/k.json", b"{}") is False


def test_s3_store_real_errors_propagate():
    s = S3ConditionalPutStore(_StubS3(fail=_ClientError("AccessDenied", 403)))
    with pytest.raises(Exception, match="AccessDenied"):
        s.put_if_absent("s3://b/k.json", b"{}")


def test_s3_store_rejects_non_s3_path():
    with pytest.raises(ValueError, match="not an S3 path"):
        S3ConditionalPutStore(_StubS3()).put_if_absent("/local/p", b"")
