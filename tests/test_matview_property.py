"""Property-based state-machine test for the incremental materialized
aggregate: random append / compact / refresh / delete sequences over
the source table must keep the view, after each refresh, in lockstep
with a pure-Python recompute over every row the source then holds —
regardless of how the refreshes interleave with appends, overwrites
(compaction, DELETE) and duplicate batch ids."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.sources.matview import (
    MaterializedAggregate,
)
from churn_model_evaluation_platform_spark.sources.txnlog import TxnTable

# op alphabet: appends (some with duplicate batch ids), a compaction
# (overwrite action -> full-recompute path), a stats-pruned DELETE
# (also overwrite), and refresh points where the view must agree.
_ops = st.lists(
    st.one_of(
        st.tuples(
            st.just("append"),
            st.integers(0, 40),
            st.integers(1, 5),
            st.one_of(st.none(), st.integers(0, 2)),
        ),
        st.tuples(st.just("compact")),
        st.tuples(st.just("delete"), st.integers(0, 40)),
        st.tuples(st.just("refresh")),
    ),
    min_size=2,
    max_size=7,
)


@given(ops=_ops)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_view_matches_model(spark, tmp_path_factory, ops):
    tmp = tmp_path_factory.mktemp("mvprop")
    src = TxnTable(spark, str(tmp / "src"))
    view = MaterializedAggregate(
        src,
        str(tmp / "view"),
        group_cols=["k"],
        aggs={"n": ("count",), "sv": ("sum", "v"), "mx": ("max", "v")},
    )

    def frame(lo, n):
        return spark.range(lo, lo + n).select(
            (F.col("id") % 2).cast("string").alias("k"),
            F.col("id").alias("id"),
            (F.col("id") * 1.5).alias("v"),
        )

    rows: list[tuple[str, int, float]] = []
    seen: set[int] = set()
    refreshed = False

    def model_rows(lo, n):
        return [(str(i % 2), i, i * 1.5) for i in range(lo, lo + n)]

    for op in ops:
        if op[0] == "append":
            _, lo, n, batch_id = op
            src.append(frame(lo, n), batch_id=batch_id)
            if batch_id is None or batch_id not in seen:
                rows.extend(model_rows(lo, n))
            if batch_id is not None:
                seen.add(batch_id)
        elif op[0] == "compact":
            if src.latest_version() is not None:
                src.compact(partitions=1)
        elif op[0] == "delete":
            if src.latest_version() is not None and rows:
                lo = op[1]
                src.delete([("id", ">=", lo)])
                rows = [r for r in rows if r[1] < lo]
        elif op[0] == "refresh":
            if src.latest_version() is None:
                continue
            view.refresh()
            refreshed = True
            got = {
                r["k"]: (r["n"], r["sv"], r["mx"])
                for r in view.read().collect()
            }
            want: dict = {}
            for k, _i, v in rows:
                n0, s0, m0 = want.get(k, (0, 0.0, None))
                want[k] = (
                    n0 + 1,
                    s0 + v,
                    v if m0 is None else max(m0, v),
                )
            assert set(got) == set(want), (got, want)
            for k, (n0, s0, m0) in want.items():
                assert got[k][0] == n0
                assert math.isclose(got[k][1], s0, rel_tol=1e-9)
                assert got[k][2] == m0
    # every sequence must exercise at least the machinery end-to-end
    if src.latest_version() is not None and not refreshed:
        view.refresh()
