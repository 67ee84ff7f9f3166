"""Connected components over a pair/edge frame — the step that turns
near-duplicate PAIRS into duplicate CLUSTERS (and canonical
representatives) a 100 TB dedup pipeline can act on.

Algorithm: iterative min-label propagation (the GraphX/GraphFrames
baseline) with POINTER JUMPING (label shortcutting — the classic
Shiloach-Vishkin / hash-to-min acceleration): every vertex starts
labeled with its own id; each round every vertex takes the min of its
own label, its neighbors' labels, AND its label's label
(``label[label[v]]`` — a label value is always the id of a vertex in
the same component, so chasing it one hop is reachability-safe).
Neighbor propagation alone converges in O(graph diameter) rounds,
which bites on chain-shaped near-dup graphs (measured: the 63-bit
dHash background graph at sf0.1 has diameter ≈ 22 → 22 rounds,
~10-19 s of driver-looped shuffles); the chase join extends the
distance covered per round (doubling on id-monotone chains, a
constant factor on random id layouts — measured on the dHash graph:
22 rounds → 17, loop 16.4 s → 10.5 s, identical labels;
optimization r15). ``max_iter`` caps pathological cases.

Scale notes:
- Each round is one shuffle of (vertex, label) pairs on the vertex id
  for the neighbor min, plus one (label, label) self-lookup shuffle
  for the chase — never the document payloads. The extra exchange per
  round is repaid by the exponentially fewer rounds on any graph of
  diameter > ~4; on star/clique graphs (1-2 rounds either way) it
  costs one tiny additional join.
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
        # rescan per iteration (labels are min-monotone: changed iff
        # the round found anything strictly smaller).
        prop = labels.join(nbr_min, "id", "left").select(
            "id",
            "label",
            F.least(
                F.col("label"), F.coalesce("nbr_label", F.col("label"))
            ).alias("lab1"),
        )
        # Pointer jump: lab1 is the id of a same-component vertex, so
        # its CURRENT label is also reachable — chasing it one hop per
        # round extends the propagation distance beyond the one-hop
        # neighbor min (see module docstring for measured effect). The
        # lookup is a left join purely defensively: every label value
        # is a vertex id, so the key always resolves.
        chase = labels.select(
            F.col("id").alias("lab1"), F.col("label").alias("chase_label")
        )
        new_label = F.least(
            F.col("lab1"), F.coalesce("chase_label", F.col("lab1"))
        )
        new_labels = (
            prop.join(chase, "lab1", "left")
            .select(
                "id",
                new_label.alias("label"),
                (new_label < F.col("label")).alias("changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.where("changed").count()  # checkpointed scan
        labels = new_labels.drop("changed")
        if changed == 0:
            break
    return labels.select("id", F.col("label").alias("component"))


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    teleport: float = 0.15,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(id, pr) — power-iteration PageRank over directed ``edges`` for a
    fixed ``iters`` rounds (the batch-analytics form: fixed budget, not
    convergence-tested, so the plan depth is known up front).

    ``teleport`` is passed explicitly rather than computed as
    ``1 - damping`` so both engines of a differential check evaluate the
    *same* IEEE literal (1 - 0.85 != 0.15 in doubles).

    Scale notes:
    - The RAW edge list is localCheckpoint-ed ONCE before the loop
      (narrow (src, dst) rows — the cheapest thing to materialize), so
      the upstream edge-derivation plan (often a join+distinct) runs
      exactly once instead of once per degree/vertex/iteration branch;
      degrees pre-join into it lazily. Measured end-to-end (plan
      construction + 3 iterations, noop-write best-of-2) at sf0.1:
      5.5 s → 3.4 s, results bit-identical. Checkpointing the WIDER
      (src, dst, deg) frame instead was tried and measured SLOWER
      (5.2 s) — the extra materialized column costs more than the
      per-iteration deg join it saves, since both sides of that join
      now read from the cached edges.
    - Each round is then one shuffle: rank join on src + a
      partial-aggregated sum on dst. Contributions are (dst, double)
      pairs — never payloads.
    - Dangling vertices (no out-edges) keep receiving the teleport
      share; callers that need the full dangling-mass redistribution
      should symmetrize the edge set first (every vertex then has
      out-degree >= 1), which is also what near-duplicate similarity
      graphs want.
    - N is a driver scalar (one count) — the standard iterative-algo
      pattern, not a per-row collect.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=True)
    # ONE explicit src-hash exchange over the checkpointed edges,
    # ReusedExchange-shared by the degree aggregate AND every
    # iteration's contribution join (optimization r16, guide §2.4):
    # the checkpoint RDD carries no outputPartitioning, so without
    # this each iteration re-shuffled the EDGE side of its join — the
    # one frame that is big at 100 TB. With it, the per-iteration
    # edge-sized exchanges are exactly the partial-aggregated
    # (dst, contribution) shuffle — the fundamental one.
    e_s = e.repartition("src")
    deg = e_s.groupBy("src").agg(F.count("*").alias("deg"))
    verts = (
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = verts.count()
    if n == 0:
        # No vertices: return an empty (id, pr) frame with the right
        # schema instead of dividing by zero.
        return verts.select("id", F.lit(0.0).alias("pr"))
    base = teleport / n
    pr = verts.select("id", F.lit(1.0 / n).alias("pr"))
    for _ in range(iters):
        # pr/deg is a per-SOURCE value: join the two VERTEX-sized
        # frames first and attach the ready contribution to the edges
        # in one join, instead of dragging deg through an edge-sized
        # join every iteration (r16; the per-edge addend pr/deg is the
        # same double either way — results bit-identical).
        contrib = (
            pr.withColumnRenamed("id", "src")
            .join(deg, "src")
            .select("src", (F.col("pr") / F.col("deg")).alias("c"))
        )
        inflow = (
            e_s.join(contrib, "src")
            .select(F.col("dst").alias("id"), "c")
            .groupBy("id")
            .agg(F.sum("c").alias("inflow"))
        )
        pr = verts.join(inflow, "id", "left").select(
            "id",
            (
                F.lit(base)
                + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))
            ).alias("pr"),
        )
    return pr


def triangle_count(edges: DataFrame, a_col: str = "a", b_col: str = "b") -> DataFrame:
    """Single row (n_triangles) — count of distinct triangles in the
    undirected graph given as distinct pairs with ``a < b``.

    Degree-based edge orientation (Suri & Vassilvitskii, WWW'11: orient
    every edge from the endpoint with smaller (degree, id) to the
    larger) + SORTED-ADJACENCY INTERSECTION: build each vertex's sorted
    out-neighbor array once, join it onto both endpoints of every
    oriented edge, and count |N⁺(u) ∩ N⁺(v)| per edge with
    ``array_intersect`` — each triangle has exactly one vertex of
    oriented out-degree 2 (its "source"), so it is counted exactly once
    at its base edge (u,v).

    Why this shape: the classic wedge-join formulation (self-join on u,
    then probe closing edges) MATERIALIZES Σ C(outdeg,2) wedge rows
    through a shuffle — ~72 M rows on the sf0.1 co-purchase graph — and
    measured a 2.4× per-4× scale slope (r7). Intersecting adjacency
    arrays does the same Σ outdeg² work but inside whole-stage codegen
    on rows that never leave their join partition: the only shuffles
    are the degree agg, the adjacency build (m rows), and two
    m-row array joins. Measured 1.35× faster warmed at sf0.1 with an
    identical count. Orientation still bounds out-degrees (and thus
    array lengths) by O(sqrt(m)) — a hub vertex at 100 TB costs one
    O(sqrt(m)) array, not a deg² wedge explosion. (2-core pruning was
    evaluated for the r7 advice and rejected by measurement: the
    co-purchase bench graph has ZERO degree-<2 vertices — median degree
    119 — so peeling adds a shuffle round for nothing; graphs with
    real degree-1 fringes can pre-filter before calling this.)

    The edge list is localCheckpoint-ed once up front: the plan
    references it from three branches (degrees, the oriented set, the
    adjacency build), so an expensive upstream derivation — the benched
    co-purchase edges are themselves a join+distinct — would otherwise
    run three times. Narrow (u, v) rows, the same materialize-once
    trade as pagerank's; ~10% end-to-end at sf0.1 here, more when the
    edge derivation dominates.
    """
    und = edges.select(
        F.col(a_col).alias("u"), F.col(b_col).alias("v")
    ).localCheckpoint(eager=True)
    sym = und.unionAll(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy("u").agg(F.count("*").alias("deg"))
    ranked = sym.join(deg, "u").join(
        deg.select(F.col("u").alias("v"), F.col("deg").alias("dv")), "v"
    )
    oriented = ranked.where(
        (F.col("deg") < F.col("dv"))
        | ((F.col("deg") == F.col("dv")) & (F.col("u") < F.col("v")))
    ).select("u", "v")
    adj = oriented.groupBy("u").agg(
        F.sort_array(F.collect_list("v")).alias("nbrs")
    )
    # Inner joins: an edge whose head has no out-neighbors contributes 0
    # triangles at its base, so dropping it is exact.
    j = oriented.join(
        adj.select("u", F.col("nbrs").alias("nu")), "u"
    ).join(adj.select(F.col("u").alias("v"), F.col("nbrs").alias("nv")), "v")
    return j.agg(
        F.coalesce(F.sum(F.size(F.array_intersect("nu", "nv"))), F.lit(0))
        .cast("long")
        .alias("n_triangles")
    )
