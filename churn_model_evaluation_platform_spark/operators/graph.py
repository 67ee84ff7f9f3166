"""Connected components over a pair/edge frame — the step that turns
near-duplicate PAIRS into duplicate CLUSTERS (and canonical
representatives) a 100 TB dedup pipeline can act on.

Algorithm: iterative min-label propagation (the GraphX/GraphFrames
baseline): every vertex starts labeled with its own id; each round
every vertex takes the min of its own and its neighbors' labels;
convergence in O(graph diameter) rounds. Near-duplicate graphs are
star/clique-like (tiny diameter), so rounds stay in the low single
digits; ``max_iter`` caps pathological chains (alternating-algorithm
variants — large-star/small-star, Kiveris et al. 2014 — halve rounds if
that cap ever binds).

Scale notes:
- Each round is one shuffle of (vertex, label) pairs on the vertex id —
  never the document payloads.
- ``localCheckpoint(eager)`` truncates lineage each round: without it
  the plan doubles per iteration and Catalyst analysis dominates.
- The convergence check is a count aggregate per round (a driver action
  on an already-materialized frame — the standard iterative-algorithm
  pattern, not a per-row collect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) — component = min vertex id reachable from
    ``id`` through ``edges`` (undirected). Vertices absent from every
    edge become singleton components labeled with their own id."""
    sym = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    ).unionAll(edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
    labels = vertices.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("label")
    ).localCheckpoint(eager=True)
    sym = sym.localCheckpoint(eager=True)
    for _ in range(max_iter):
        nbr_min = (
            sym.join(
                labels.select(
                    F.col("id").alias("b"), F.col("label").alias("b_label")
                ),
                "b",
            )
            .groupBy("a")
            .agg(F.min("b_label").alias("nbr_label"))
            .select(F.col("a").alias("id"), "nbr_label")
        )
        # The old label is already on the row here, so the convergence
        # flag rides along in the SAME select — no extra self-join +
        # rescan per iteration (labels are min-monotone: changed iff a
        # neighbor label is strictly smaller).
        new_labels = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
                (F.coalesce("nbr_label", F.col("label")) < F.col("label")).alias(
                    "changed"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.where("changed").count()  # checkpointed scan
        labels = new_labels.drop("changed")
        if changed == 0:
            break
    return labels.select("id", F.col("label").alias("component"))
