"""Connected components over a pair/edge frame — the step that turns
near-duplicate PAIRS into duplicate CLUSTERS (and canonical
representatives) a 100 TB dedup pipeline can act on.

Algorithm: alternating LARGE-STAR / SMALL-STAR contraction (Kiveris,
Lattanzi, Mirrokni, Rastogi, Vassilvitskii, "Connected Components in
MapReduce and Beyond", SoCC 2014): each round rewrites the edge set —
large-star connects every neighbor larger than ``u`` to the minimum
of ``u``'s closed neighborhood, small-star connects the smaller
neighbors (and ``u`` itself) to that minimum — until the edge set is
a fixpoint, at which point it is a forest of stars whose centers are
the component minima. Convergence is O(log n) ROUNDS regardless of
graph diameter; the min-label-propagation loop this replaces
(optimization r16) was O(diameter) rounds even with a pointer-jump
chase — measured on the sf0.1 dHash background graph (1,750
vertices, diameter ≈ 22): 17 label rounds → 5 star rounds, loop
6.9 s → 3.8 s warm, labels bit-identical across all consumers.

Scale notes:
- Each round is two phases; a phase is one groupBy(min) + one join on
  the grouping key + a distinct over (u, v) id pairs — never the
  document payloads. The edge set never exceeds original + n rows
  (paper, Lemma 2), so per-round shuffle volume is bounded by the
  input.
- ``localCheckpoint(eager)`` truncates lineage each phase; the frame
  is then REBASED off its checkpoint RDD (``_without_origin_stats``)
  because checkpoint-carried size estimates otherwise COMPOUND
  multiplicatively round over round — see the helper's docstring for
  the measured blowup this prevents.
- The convergence check is an exact symmetric-difference count per
  round (a count aggregate over the two materialized edge sets — the
  standard iterative-algorithm pattern, not a per-row collect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _without_origin_stats(df: DataFrame) -> DataFrame:
    """Rebase a checkpointed frame onto its own RDD, dropping the
    checkpoint-carried ORIGIN STATISTICS (optimization r16 — the r15
    "chase2 blowup" root cause, found via driver thread dump §7.3):
    ``localCheckpoint`` preserves the origin plan's *estimated*
    ``sizeInBytes``, and a loop that checkpoints a multi-join plan of
    the previous round's checkpoint compounds those estimates —
    ``visitJoin`` multiplies children, so the BigInteger exponent
    DOUBLES per round with one chase join (measured: E+22 → E+105503
    by round 13) and triples with two (E+41 → E+23062897, where every
    stats walk did arithmetic on 23-million-digit integers and rounds
    went 6 s → 17 s → 78 s of pure driver time). Rebuilding the frame
    as a fresh LogicalRDD over the SAME checkpointed rows (zero row
    conversion, lineage still cut) resets the estimate to the
    conservative default every round — measured flat ~0.4 s/round at
    any depth, byte-identical results. Fail-open: if the internal
    constructor is unavailable, return the frame unchanged (the loop
    then merely re-grows the old estimates)."""
    try:
        jdf = df._jdf
        j2 = df.sparkSession._jsparkSession.internalCreateDataFrame(
            jdf.queryExecution().toRdd(), jdf.schema(), False
        )
        return DataFrame(j2, df.sparkSession)
    except Exception:
        return df


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

    def _cut(df: DataFrame) -> DataFrame:
        return _without_origin_stats(df.localCheckpoint(eager=True))

    # working edge set as directed (u, v) pairs; self-loops never
    # affect components and would survive every star rewrite, so they
    # are dropped up front
    E = _cut(
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    for _ in range(max_iter):
        # LARGE-STAR: for every vertex u, connect each neighbor v > u
        # to min(N(u) ∪ {u}). Emitted edges all point (larger →
        # smaller), which small-star relies on.
        sym = E.unionAll(
            E.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mn = sym.groupBy("u").agg(F.min("v").alias("mv"))
        m = F.least(F.col("u"), F.col("mv"))
        L = _cut(
            sym.join(mn, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), m.alias("v"))
            .distinct()
        )
        # SMALL-STAR: for every vertex u over its smaller neighbors N
        # (all of them, since large-star oriented every edge downward),
        # connect each member of N ∪ {u} except the minimum itself to
        # min(N).
        mn2 = L.groupBy("u").agg(F.min("v").alias("m2"))
        j = L.join(mn2, "u")
        S = _cut(
            j.where(F.col("v") != F.col("m2"))
            .select(F.col("v").alias("u"), F.col("m2").alias("v"))
            .unionAll(j.select("u", F.col("m2").alias("v")))
            .distinct()
        )
        # exact symmetric difference: both sides are distinct sets, so
        # a pair appearing once is in exactly one of them
        ndiff = (
            S.unionAll(E)
            .groupBy("u", "v")
            .agg(F.count("*").alias("c"))
            .where("c = 1")
            .count()
        )
        E = S
        if ndiff == 0:
            break
    # At the fixpoint E is a star forest centered at component minima:
    # every non-center vertex carries exactly one (vertex, center)
    # edge. The min() aggregate is exact there and keeps the labeling
    # deterministic even if max_iter truncated a pathological input.
    centers = E.groupBy("u").agg(F.min("v").alias("component"))
    return (
        vertices.select(F.col(id_col).alias("id"))
        .join(
            centers.select(F.col("u").alias("id"), "component"),
            "id",
            "left",
        )
        .select(
            "id", F.coalesce("component", F.col("id")).alias("component")
        )
    )


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
