"""Property-based state-machine test for the transactional table:
random append / overwrite / compact / replay sequences must keep the
real TxnTable in lockstep with a trivial pure-Python model — rows,
version count, exactly-once replay skips, and time travel to every
historical version."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.sources.txnlog import TxnTable

# op alphabet: ("append", lo, n, batch_id|None) / ("overwrite", lo, n)
#            / ("compact",) / ("replay", idx-of-earlier-batch-append)
_ops = st.lists(
    st.one_of(
        st.tuples(
            st.just("append"),
            st.integers(0, 50),
            st.integers(1, 4),
            st.one_of(st.none(), st.integers(0, 3)),
        ),
        st.tuples(st.just("overwrite"), st.integers(0, 50), st.integers(1, 4)),
        st.tuples(st.just("compact")),
        st.tuples(st.just("replay")),
    ),
    min_size=1,
    max_size=6,
)


@given(ops=_ops)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_table_matches_model(spark, tmp_path_factory, ops):
    tmp = tmp_path_factory.mktemp("txnprop")
    t = TxnTable(spark, str(tmp / "t"), checkpoint_interval=3)

    def frame(lo, n):
        return spark.range(lo, lo + n).select(
            F.col("id"), (F.col("id") * 1.0).alias("v")
        )

    model_rows: list[tuple[int, float]] = []  # multiset of (id, v)
    history: list[list[tuple[int, float]]] = []  # rows at each version
    seen_batches: set[int] = set()
    batch_appends: list[tuple[int, int, int]] = []  # (batch_id, lo, n)

    def rows_of(lo, n):
        return [(i, float(i)) for i in range(lo, lo + n)]

    for op in ops:
        if op[0] == "append":
            _, lo, n, batch_id = op
            if batch_id is not None and batch_id in seen_batches:
                t.append(frame(lo, n), batch_id=batch_id)  # must be a no-op
                continue
            t.append(frame(lo, n), batch_id=batch_id)
            model_rows = model_rows + rows_of(lo, n)
            if batch_id is not None:
                seen_batches.add(batch_id)
                batch_appends.append((batch_id, lo, n))
            history.append(list(model_rows))
        elif op[0] == "overwrite":
            _, lo, n = op
            t.overwrite(frame(lo, n))
            model_rows = rows_of(lo, n)
            history.append(list(model_rows))
        elif op[0] == "compact":
            if not history:
                continue  # empty table: nothing to compact
            t.compact(partitions=1)
            history.append(list(model_rows))  # rows unchanged
        elif op[0] == "replay":
            if not batch_appends:
                continue
            batch_id, lo, n = batch_appends[0]
            t.append(frame(lo, n), batch_id=batch_id)  # skipped
        # invariant after every op: live table == model
        assert sorted(map(tuple, t.snapshot().collect())) == sorted(model_rows)

    assert t.latest_version() == (len(history) if history else None)
    # time travel: every historical version replays exactly
    for v, expected in enumerate(history, start=1):
        assert sorted(map(tuple, t.snapshot(version=v).collect())) == sorted(
            expected
        )
