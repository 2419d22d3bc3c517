"""Graph analytics over derived graphs: distributed triangle counting.

North-star scope (the reference has no graph surface): triangle counting
is the canonical "joins as graph compute" workload — the same
edge-list-join pattern MapReduce graph papers use (Suri & Vassilvitskii,
"Counting Triangles and the Curse of the Last Reducer", WWW'11),
executed here as keyed equi-joins that Catalyst plans like any other.

Scale posture at 100 TB:
  * pair enumeration never self-joins the fact table: one shuffle
    groups lines by order, pairs explode from the per-order part array
    (bounded by lines-per-order — TPC-H ≤ 7 — so the explosion is a
    constant factor, not quadratic), then one distinct;
  * **degree orientation** — each edge is directed from its
    lower-degree endpoint to its higher-degree one (ties by ID), and
    triangles are counted only where both edges point outward. Every
    triangle has exactly one vertex whose two triangle edges both point
    outward (its (deg, id)-minimum corner), so each is counted once,
    and out-degree is ≤ √(2m) in any degree-ordered orientation — the
    closure work is O(m^1.5) regardless of hub skew;
  * the `max_degree` cap drops super-node vertices entirely
    (documented, mirrored in the oracle) — kept as a safety valve for
    adversarial skew, no longer the cost bound. Cap and orientation
    share ONE degree aggregate and one 2-way join against the |V|-row
    degree table;
  * closure is the **edge-iterator** form: out-adjacency arrays are
    built once (Σ|N⁺| = m entries), joined back onto each oriented
    edge, and triangles are Σ_e |N⁺(src) ∩ N⁺(dst)| via
    `array_intersect` — JVM-side sorted-array work per edge instead of
    materializing Σ outdeg² wedge rows through a shuffle + semi-join
    (measured 1.7× faster at sf0.1, and the gap widens with skew).

Orientation and edge-iteration change only the physical plan: the
capped graph and its exact triangle count are identical to the naive
wedge algorithm, so the DuckDB oracle needs no semantic knob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Drop vertices with more co-occurrence partners than this before the
#: closure stage (the WWW'11 "last reducer" guard; with degree
#: orientation this is a safety valve, not the cost bound).
MAX_DEGREE = 256


def copart_pairs(lineitem: DataFrame) -> DataFrame:
    """Canonical (a < b) distinct edge list of the co-purchase graph:
    parts are adjacent when they appear in the same order.

    One shuffle groups by order; pairs come from the sorted per-order
    part array (posexplode × explode-of-suffix-slice — all JVM
    builtins), so the fact table is never self-joined. `collect_set`
    per order is bounded by lines-per-order, not data volume.
    """
    grouped = (lineitem.groupBy("l_orderkey")
               .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps")))
    return (grouped
            .select(F.posexplode("ps").alias("i", "a"), F.col("ps"))
            .select("a", F.explode(
                F.slice("ps", F.col("i") + F.lit(2), F.size("ps")))
                .alias("b"))
            .distinct())


def capped_oriented(edges: DataFrame,
                    max_degree: int = MAX_DEGREE) -> DataFrame:
    """Attach degrees to a canonical edge list, drop edges touching a
    vertex with deg > max_degree, and orient each survivor from its
    lower-degree endpoint to its higher-degree one (ties by ID — `a`
    wins because a < b canonically).

    Returns (a, b, src, dst): the canonical pair plus its orientation.
    Cap and orientation share one degree aggregate and one pair of
    keyed joins against the |V|-row degree table. Degrees are the
    FULL-graph degrees — the cap semantics the oracle mirrors — and
    orientation only needs *some* total order on vertices, so reusing
    them is free.
    """
    deg = (edges.select(F.col("a").alias("v"))
           .unionAll(edges.select(F.col("b").alias("v")))
           .groupBy("v").agg(F.count("*").alias("deg")))
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("deg_b"))
    a_first = (F.col("deg_a") < F.col("deg_b")) | \
              (F.col("deg_a") == F.col("deg_b"))
    return (edges.join(da, "a").join(db, "b")
            .where((F.col("deg_a") <= max_degree)
                   & (F.col("deg_b") <= max_degree))
            .select(
                "a", "b",
                F.when(a_first, F.col("a")).otherwise(F.col("b"))
                 .alias("src"),
                F.when(a_first, F.col("b")).otherwise(F.col("a"))
                 .alias("dst")))


def copart_edges(lineitem: DataFrame,
                 max_degree: int = MAX_DEGREE) -> DataFrame:
    """Degree-capped canonical edge list (a, b) — the public shape the
    tests and the oracle reason about."""
    return (capped_oriented(copart_pairs(lineitem), max_degree)
            .select("a", "b"))


def triangle_count(lineitem: DataFrame,
                   max_degree: int = MAX_DEGREE) -> DataFrame:
    """Count triangles in the co-purchase part graph (single summary
    row: vertices, edges, triangles) via degree-oriented
    edge-iteration: n_triangles = Σ over oriented edges of
    |N⁺(src) ∩ N⁺(dst)| — each triangle tallied exactly once at its
    (deg, id)-minimum corner."""
    edges = capped_oriented(copart_pairs(lineitem), max_degree) \
        .localCheckpoint(eager=False)
    oriented = edges.select("src", "dst")
    adj = (oriented.groupBy("src")
           .agg(F.sort_array(F.collect_list("dst")).alias("nbrs")))
    both = (oriented
            .join(adj.select(F.col("src"), F.col("nbrs").alias("na")),
                  "src", "inner")
            .join(adj.select(F.col("src").alias("dst"),
                             F.col("nbrs").alias("nb")),
                  "dst", "inner"))
    tri = (both.select(
        F.size(F.array_intersect("na", "nb")).alias("t"))
        .agg(F.coalesce(F.sum("t"), F.lit(0)).cast("bigint")
             .alias("n_triangles")))
    nodes = (edges.select(F.col("a").alias("v"))
             .unionAll(edges.select(F.col("b").alias("v")))
             .agg(F.count_distinct("v").alias("n_nodes")))
    n_edges = edges.agg(F.count("*").alias("n_edges"))
    # three 1-row frames — the crossJoins are trivially broadcast
    return (nodes.crossJoin(F.broadcast(n_edges))
            .crossJoin(F.broadcast(tri))
            .select("n_nodes", "n_edges", "n_triangles"))


#: Integer PageRank constants: ranks live in micro-units (1e6 = mass
#: 1.0), damping 0.85 as the exact rational 85/100.
PR_SCALE = 1_000_000
PR_ITERS = 5


def pagerank(lineitem: DataFrame, n_iter: int = PR_ITERS,
             max_degree: int = MAX_DEGREE) -> DataFrame:
    """Integer-exact PageRank over the undirected co-purchase part
    graph (same capped edge list as `triangle_count`): the second
    iterative graph operator beside connected components.

    All arithmetic is INTEGER — rank starts at PR_SCALE micro-units
    per vertex; each iteration every vertex sends ``rank DIV deg``
    along each incident edge (both directions of the undirected edge)
    and new rank = 0.15·PR_SCALE + (85 · inflow) DIV 100. Integer
    truncation replaces float damping exactly so the result is
    independent of aggregation order — which is what makes a
    VALUE-LEVEL DuckDB oracle possible for an iterative fixpoint
    (float PageRank sums would drift at ULP level between engines).
    The usual float formulation is this with SCALE→∞; at 1e6 units the
    quantization error per iteration is sub-ppm.

    Scale posture: the loop body is one keyed join (contribution
    scatter) + one hash aggregate (inflow) per iteration — the
    textbook MapReduce PageRank shape; degree attaches ONCE before the
    loop and rides the persisted bidirectional edge list, and each
    iteration's result is lineage-truncated (localCheckpoint) so plan
    depth stays O(1) per round, the `dedup/components` lesson. Every
    vertex of the capped graph has ≥ 1 incident edge, so inflow rows
    cover all vertices and no rank mass is silently dropped.
    """
    from pyspark import StorageLevel

    # lineage-truncate the edge list BEFORE the union below: its two
    # legs each reference the edge subplan, and Spark does not dedup
    # common subplans — without the barrier the copart_pairs build
    # (groupBy + explode + distinct) runs once per leg
    edges = copart_edges(lineitem, max_degree) \
        .localCheckpoint(eager=False)
    # ...and persist the bidirectional list too: it feeds the degree
    # aggregate AND the bi_d join input
    bi = (edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
          .unionAll(edges.select(F.col("b").alias("src"),
                                 F.col("a").alias("dst")))
          .persist(StorageLevel.MEMORY_AND_DISK))
    outd = bi.groupBy("src").agg(F.count("*").alias("d"))
    # bidirectional edges with the sender's degree attached once —
    # reused by every iteration's scatter join. Hash-partitioned on the
    # join key BEFORE persisting: the edge list is the big side (m ≫ V
    # at 100 TB) and must never re-shuffle per iteration — the persisted
    # layout satisfies the join's clustering requirement so only the
    # |V|-row rank table moves each round (classic PageRank layout;
    # sf1 soak: 33.7 s total — one edge-list build + 5 rounds over
    # ~18M directed edges; before the checkpoint/persist barriers
    # above the build re-ran per consumer and the same soak took 72 s)
    bi_d = (bi.join(outd, "src")
            .repartition("src")
            .persist(StorageLevel.MEMORY_AND_DISK))
    ranks = outd.select(F.col("src").alias("v"),
                        F.lit(PR_SCALE).cast("long").alias("rank"))
    for _ in range(n_iter):
        inflow = (bi_d.join(ranks, bi_d.src == ranks.v)
                  .select(F.col("dst"),
                          F.expr("rank DIV d").alias("c"))
                  .groupBy("dst")
                  .agg(F.sum("c").alias("inflow")))
        ranks = (inflow.select(
            F.col("dst").alias("v"),
            (F.lit(15 * PR_SCALE // 100)
             + F.expr("(85 * inflow) DIV 100")).cast("long")
            .alias("rank"))
            .localCheckpoint(eager=False))
    return ranks.select("v", "rank")


#: BFS: "unreached within the hop budget" sentinel distance.
BFS_INF = 99


def bfs_hops(lineitem: DataFrame, n_hops: int = 4,
             max_degree: int = MAX_DEGREE) -> DataFrame:
    """Bounded-hop BFS distances from the minimum-id vertex of the
    capped co-purchase graph, by `n_hops` rounds of integer min-
    relaxation: dist⁰(src)=0 else INF; distᵗ⁺¹(v) = min(distᵗ(v),
    1 + min over neighbors distᵗ(u)). Like `pagerank`, the arithmetic
    is all-integer and min() is aggregation-order independent, so the
    iterative operator earns a full value-level oracle (unrolled SQL).
    Vertices beyond the hop budget keep the BFS_INF sentinel — bounded
    BFS is the honest distributed form (k rounds = k shuffles; an
    unbounded frontier loop is `dedup/components`' convergence-test
    pattern, demonstrated there).

    Scale posture: the relaxation join is keyed on the persisted
    hash-partitioned edge list (only the |V|-row distance table moves
    per round), the per-round aggregate is a map-side-combining min,
    and each round is lineage-truncated.
    """
    from pyspark import StorageLevel

    # same union-leg dedup barrier as pagerank: checkpoint the edge
    # subplan so the bidirectional union builds it once
    edges = copart_edges(lineitem, max_degree) \
        .localCheckpoint(eager=False)
    bi = (edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
          .unionAll(edges.select(F.col("b").alias("src"),
                                 F.col("a").alias("dst"))))
    bi = bi.repartition("src").persist(StorageLevel.MEMORY_AND_DISK)
    verts = bi.select(F.col("src").alias("v")).distinct()
    source = verts.agg(F.min("v").alias("s"))
    dists = (verts.crossJoin(F.broadcast(source))
             .select("v", F.when(F.col("v") == F.col("s"), 0)
                     .otherwise(F.lit(BFS_INF)).cast("int")
                     .alias("dist")))
    for _ in range(n_hops):
        nbr = (bi.join(dists, bi.src == dists.v)
               .groupBy("dst")
               .agg((F.min("dist") + 1).alias("nd")))
        # shuffle_hash on the per-round |V|-row message side (round-15,
        # the components-loop lesson applied family-wide): sort-merge
        # re-sorted both |V|-row frames every round; hash-building the
        # aggregated messages is the same memory class as the round's
        # own aggregation state (A/B at sf0.1: 6.7 → 6.0-6.4 s)
        dists = (dists.join(nbr.hint("shuffle_hash"),
                             dists.v == nbr.dst, "left")
                 .select("v", F.least(
                     F.col("dist"),
                     F.coalesce(F.col("nd"), F.lit(BFS_INF)))
                     .cast("int").alias("dist"))
                 .localCheckpoint(eager=False))
    return dists.select("v", "dist")


def link_prediction(lineitem: DataFrame, min_common: int = 2,
                    k: int = 100, max_center_degree: int = 64,
                    max_degree: int = MAX_DEGREE) -> DataFrame:
    """Common-neighbor link prediction on the capped co-purchase part
    graph: for every NON-adjacent pair (a < b) sharing >= `min_common`
    LOW-DEGREE neighbors, the shared-neighbor count and the
    neighborhood Jaccard |N(a)∩N(b)| / |N(a)∪N(b)| — the classic
    Liben-Nowell/Kleinberg link-prediction scores, restricted to the
    integer-exact pair (count + one exact division) so the
    fixpoint-free oracle matches value-for-value (Adamic-Adar's
    1/ln(deg) sum would hang the verdict on cross-engine libm ULPs).

    `max_center_degree` is the load-bearing scale knob, NOT a tuning
    nicety: the wedge frame is Σ over shared-neighbor CENTERS of
    deg², so a few hub vertices dominate the whole join (the round-9
    sf1 soak measured 274 s uncapped at 12M edges vs 29 s capped —
    hubs at the 256 edge-cap each emit 32k wedges). Dropping
    high-degree centers is also the SEMANTIC choice link prediction
    wants — a neighbor shared with everybody carries no signal, which
    is the same observation Adamic-Adar's 1/log(deg) downweight
    encodes; the hard cap is its oracle-replayable integer form, and
    the oracle mirrors it so "common" means "common through centers
    of degree <= max_center_degree" in BOTH engines.

    Shape: degree-capped wedge join centered on the shared neighbor,
    count per candidate pair, one anti join to drop existing edges,
    degrees joined back, orderBy+limit → TakeOrdered. The
    deterministic (common desc, a, b) total order makes the top-k
    stable across partitionings and engines.
    """
    from pyspark import StorageLevel

    edges = copart_edges(lineitem, max_degree) \
        .localCheckpoint(eager=False)
    bi = (edges.select(F.col("a").alias("u"), F.col("b").alias("v"))
          .unionAll(edges.select(F.col("b").alias("u"),
                                 F.col("a").alias("v")))
          .persist(StorageLevel.MEMORY_AND_DISK))
    deg = bi.groupBy("u").agg(F.count("*").alias("deg"))
    centers = (bi.join(deg.where(F.col("deg") <= max_center_degree)
                       .select("u"), "u", "left_semi"))
    w1 = centers.select("u", F.col("v").alias("x"))
    w2 = centers.select("u", F.col("v").alias("y"))
    cand = (w1.join(w2, "u")
            .where(F.col("x") < F.col("y"))
            .groupBy("x", "y").agg(F.count("*").alias("common"))
            .where(F.col("common") >= min_common)
            .join(edges.select(F.col("a").alias("x"),
                               F.col("b").alias("y")),
                  ["x", "y"], "left_anti"))
    dx = deg.select(F.col("u").alias("x"), F.col("deg").alias("deg_x"))
    dy = deg.select(F.col("u").alias("y"), F.col("deg").alias("deg_y"))
    return (cand.join(dx, "x").join(dy, "y")
            .select(F.col("x").alias("part_a"),
                    F.col("y").alias("part_b"),
                    F.col("common").alias("common_cnt"),
                    F.round(F.col("common")
                            / (F.col("deg_x") + F.col("deg_y")
                               - F.col("common")), 4).alias("jaccard"))
            .orderBy(F.col("common_cnt").desc(), F.col("part_a"),
                     F.col("part_b"))
            .limit(k))


def personalized_pagerank(lineitem: DataFrame, n_iter: int = PR_ITERS,
                          max_degree: int = MAX_DEGREE) -> DataFrame:
    """Integer-exact PERSONALIZED PageRank from the minimum-id vertex
    of the capped co-purchase graph: the teleport mass all returns to
    the source instead of spreading uniformly — rank_{t+1}(v) =
    [v = s]·(15·SCALE·|V|) DIV 100 + (85·inflow) DIV 100, starting
    from all mass at s (|V|·SCALE micro-units, the same total as
    `pagerank` so magnitudes stay comparable). The random-walk-with-
    restart similarity underneath PPR-based recommenders; integer
    truncation keeps the iterative fixpoint aggregation-order exact,
    earning the same unrolled-SQL value-level oracle as `pagerank`.

    Same scale shape as `pagerank`: the degree-attached bidirectional
    edge list is built once, hash-partitioned and persisted; each
    round moves only the |V|-row rank table and the source/|V| scalars
    ride a broadcast 1-row frame (no driver-side collect)."""
    from pyspark import StorageLevel

    edges = copart_edges(lineitem, max_degree) \
        .localCheckpoint(eager=False)
    bi = (edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
          .unionAll(edges.select(F.col("b").alias("src"),
                                 F.col("a").alias("dst")))
          .persist(StorageLevel.MEMORY_AND_DISK))
    outd = bi.groupBy("src").agg(F.count("*").alias("d"))
    bi_d = (bi.join(outd, "src")
            .repartition("src")
            .persist(StorageLevel.MEMORY_AND_DISK))
    # (source vertex, vertex count) — 1-row frame broadcast into every
    # round; teleport mass = 15% of the |V|·SCALE total, all at s
    vstats = outd.agg(F.min("src").alias("s"),
                      F.count("*").alias("nv"))
    ranks = (outd.join(F.broadcast(vstats))
             .select(F.col("src").alias("v"),
                     F.when(F.col("src") == F.col("s"),
                            F.col("nv") * F.lit(PR_SCALE))
                     .otherwise(F.lit(0)).cast("long").alias("rank")))
    for _ in range(n_iter):
        inflow = (bi_d.join(ranks, bi_d.src == ranks.v)
                  .select(F.col("dst"),
                          F.expr("rank DIV d").alias("c"))
                  .groupBy("dst")
                  .agg(F.sum("c").alias("inflow")))
        ranks = (inflow.join(F.broadcast(vstats))
                 .select(
                     F.col("dst").alias("v"),
                     (F.when(F.col("dst") == F.col("s"),
                             F.expr(f"(15 * nv * {PR_SCALE}) DIV 100"))
                      .otherwise(F.lit(0))
                      + F.expr("(85 * inflow) DIV 100")).cast("long")
                     .alias("rank"))
                 .localCheckpoint(eager=False))
    return ranks.select("v", "rank")


def kcore_membership(lineitem: DataFrame, k: int = 3,
                     n_rounds: int = 4,
                     max_degree: int = MAX_DEGREE) -> DataFrame:
    """Bounded k-core peeling on the capped co-purchase part graph:
    `n_rounds` synchronous rounds of removing every vertex whose
    degree WITHIN the surviving subgraph is < k; (v, in_core) for
    every vertex of the capped graph. Bounded rounds are the honest
    distributed form (R rounds = R shuffles, the `bfs_hops`
    convention) — membership is monotone non-increasing per round and
    the peel is pure integer/boolean arithmetic, so the iterative
    fixpoint prefix earns the same unrolled-SQL value-level oracle as
    pagerank/bfs. The classic graph-curation signal (densest-region
    extraction / spam-farm pruning at web scale).

    Shape: the bidirectional edge list is built once and persisted;
    each round is two keyed semi-joins of the edge list against the
    |V|-row survivor set + one map-side-combined degree aggregate,
    with per-round lineage truncation."""
    from pyspark import StorageLevel

    edges = copart_edges(lineitem, max_degree) \
        .localCheckpoint(eager=False)
    # hash-partitioned on u BEFORE the persist (round-15, the
    # pagerank/bfs layout): each round's first survivor semi-join and
    # the degree aggregate are both keyed on u, so the persisted
    # layout satisfies their clustering requirement and only the
    # |V|-row survivor frame moves per round
    bi = (edges.select(F.col("a").alias("u"), F.col("b").alias("w"))
          .unionAll(edges.select(F.col("b").alias("u"),
                                 F.col("a").alias("w")))
          .repartition("u")
          .persist(StorageLevel.MEMORY_AND_DISK))
    verts = (bi.select(F.col("u").alias("v")).distinct()
             .persist(StorageLevel.MEMORY_AND_DISK))
    alive = verts
    for _ in range(n_rounds):
        alive = (bi
                 .join(alive.select(F.col("v").alias("u")), "u",
                       "left_semi")
                 .join(alive.select(F.col("v").alias("w")), "w",
                       "left_semi")
                 .groupBy("u").agg(F.count("*").alias("c"))
                 .where(F.col("c") >= k)
                 .select(F.col("u").alias("v"))
                 .localCheckpoint(eager=False))
    return (verts
            .join(alive.withColumn("_in", F.lit(True)), "v", "left")
            .select("v", F.coalesce("_in", F.lit(False))
                    .alias("in_core")))


#: Break-even for the frontier round's fixed overhead, in edge-scan
#: equivalents. Measured A/B on local[32]: at m = 2.39M (sf0.1) the
#: frontier tail ran 1.2-2.9 s/round vs 0.7-1.0 all-vertex, and at
#: m = 24M (sf1) adaptive vs all-vertex was 113.2 vs 105.1 s — the
#: frontier round still SCANS the full edge list twice for its
#: semi-joins (only the window shrinks), so it is not O(touched) on
#: an unindexed layout and never beat the stats-fixed all-vertex
#: round at either tested scale. The default therefore keeps the
#: switch off below 50M directed edges; the genuine 100 TB frontier
#: shape additionally wants the bidirectional edge list BUCKETED on
#: u so the changed-set semi-join becomes partition pruning instead
#: of a scan (the ivf_index.py layout lesson applied to graphs) —
#: pass a lower value to force the branch (the tests do).
FRONTIER_OVERHEAD_EDGES = 50_000_000


def kcore_decomposition(lineitem: DataFrame,
                        max_degree: int = MAX_DEGREE,
                        max_rounds: int = 256,
                        frontier_overhead_edges: int =
                        FRONTIER_OVERHEAD_EDGES) -> DataFrame:
    """Full k-core decomposition (per-vertex core number) of the
    capped co-purchase part graph, run to TRUE fixpoint — the
    peel-to-convergence upgrade of `kcore_membership`'s fixed-round
    prefix.

    Algorithm: iterated neighborhood h-index (Montresor et al.,
    "Distributed k-Core Decomposition", and Lü et al. 2016: the
    iterated H-index of a vertex's neighbor estimates converges to its
    coreness). core_0(v) = deg(v); core_{t+1}(v) = min(deg(v),
    H({core_t(w) : w ~ v})) where H is the h-index (the largest h such
    that at least h neighbors have estimate >= h). The min against
    static deg (not against core_t) is enough for monotonicity: H_t is
    non-increasing in t because each neighbor estimate is, so
    core_{t+1} = min(deg, H_t) <= min(deg, H_{t-1}) = core_t — which
    makes the per-round estimate sum strictly decreasing until the
    exact fixpoint, so ONE scalar-sum collect per round is a complete
    convergence barrier (the dedup/components convention; sum equal =>
    pointwise equal, since every update moves down or stays).

    Shape per round: one keyed join of the persisted bidirectional
    edge list against the |V|-row estimate table, one partitioned
    window (rank neighbor estimates desc; h = max_j min(j, c_j) is
    tie-order invariant), one map-side-combined max aggregate, eager
    localCheckpoint lineage truncation. Nothing driver-side but the
    1-value sum probe. Rounds needed = the graph's h-index convergence
    depth (9 at sf0.001, 18 at sf0.01, 37 at sf0.1 — erosion moves one
    hop per round along chains); `max_rounds` is a runaway backstop,
    not the semantics.

    Adaptive frontier switch (round-13 verdict #4, upgrading the
    round-10 measured note): a Pregel-style delta iteration
    (recompute only N(changed)) is EXACT here — estimates are
    monotone non-increasing, so H({core_t(w) : w ~ v}) can only move
    when some neighbor's estimate moved, hence a vertex outside
    N(changed_t) keeps its value verbatim — but hard-wiring it LOST
    at bench scale (round-10 A/B: the frontier restriction adds ~3
    extra shuffles per round, and while the changed set touches a
    large edge fraction those barriers cost more than the all-vertex
    window saves; 48 s → several minutes at sf0.1). The erosion
    profile is front-loaded though: the round-14 trajectory at sf0.1
    shows |changed| collapsing 19.5k → ≤80 by round 13 with ~24 tail
    rounds of tens-of-vertices erosion — over 2/3 of the 51 s wall
    time was all-vertex rounds windowing 2.39M edge rows to update
    ~50 estimates. The cutover criterion is EDGES TOUCHED, not
    vertex count (a first |changed| < m/10 attempt switched at round
    0, because |changed| ≤ |V| ≪ m here, and ran the whole graph
    through the frontier overhead): frontier runs next round iff
    Σ deg(changed) < m/10, re-decided EVERY round in both directions
    (the trajectory is non-monotone — changed bounces 1.3k → 6.2k at
    rounds 9-12). One 3-value collect per round is both the
    convergence barrier and the switch signal: new_core carries
    (core, old, deg), so the aggregate yields (sum(core), n_changed,
    Σ deg(changed)); the sum is strictly decreasing until fixpoint
    (monotonicity, as before) and n_changed == 0 IS the fixpoint.

    Checkpoint-stats trap (found by thread-dumping the exponential
    slowdown this switch first exhibited): `Dataset.localCheckpoint`
    REWRITES the new LogicalRDD's stats from the checkpointed plan's
    estimate, and the size-in-bytes visitor MULTIPLIES across joins
    in BigInt. A round that references the previous checkpoint twice
    (neighbor estimates + own-old-value join — both branches below
    do) therefore SQUARES the carried estimate every round: the
    BigInt's digit count doubles per round and by round ~20 the
    driver spends tens of seconds inside BigInteger.multiply during
    the stats rewrite (the single-reference r10-r13 loop only grew
    the digits linearly, which is why it never hit this). Fix:
    persist each round's frame so the checkpoint's stats rewrite
    reads the InMemoryRelation's EXACT materialized byte count
    instead of the compounded estimate — clean stats every round
    (and better AQE broadcast choices: measured 1.2-1.5 s/round →
    0.7-1.0 all-vertex). The previous round's cache entry is dropped
    once its successor is materialized."""
    from pyspark import StorageLevel
    from pyspark.sql.window import Window

    edges = copart_edges(lineitem, max_degree) \
        .localCheckpoint(eager=False)
    bi = (edges.select(F.col("a").alias("u"), F.col("b").alias("w"))
          .unionAll(edges.select(F.col("b").alias("u"),
                                 F.col("a").alias("w")))
          .persist(StorageLevel.MEMORY_AND_DISK))
    deg = (bi.groupBy("u").agg(F.count("*").alias("deg"))
           .persist(StorageLevel.MEMORY_AND_DISK))
    # one setup count: the frontier cutover threshold (~m/10 edges
    # touched). Also forces bi's persist, which every round reuses.
    m_edges = bi.count()
    switch_below = max(1, m_edges // 10)
    degv = deg.select(F.col("u").alias("v"), F.col("deg").alias("deg"))
    core = deg.select(F.col("u").alias("v"), F.col("deg").alias("core"))
    rn = Window.partitionBy("u").orderBy(F.col("nc").desc())
    frontier = False
    new_core = None
    prev_cache = None
    for _ in range(max_rounds):
        if not frontier:
            # all-vertex round: window every vertex's neighbor multiset
            nbr = bi.join(core.select(F.col("v").alias("w"),
                                      F.col("core").alias("nc")), "w")
            h = (nbr.select("u", F.least(F.row_number().over(rn),
                                         F.col("nc")).alias("m"))
                 .groupBy("u").agg(F.max("m").alias("h")))
            pre = (deg.join(h, "u")
                   .join(core.select(F.col("v").alias("u"),
                                     F.col("core").alias("old")),
                         "u")
                   .select(F.col("u").alias("v"),
                           F.least("deg", "h").alias("core"),
                           "old", "deg")
                   .persist(StorageLevel.MEMORY_AND_DISK))
            new_core = pre.localCheckpoint(eager=True)
        else:
            # frontier round: recompute only N(changed); everyone else
            # keeps their estimate verbatim (exact by monotonicity).
            # `changed` is derived from the PREVIOUS round's
            # checkpointed frame — never stale.
            changed = new_core.where(
                F.col("core") < F.col("old")).select("v")
            affected = (bi.join(changed.select(F.col("v").alias("w")),
                                "w", "left_semi")
                        .select(F.col("u").alias("v")).distinct())
            nbr = (bi.join(affected.select(F.col("v").alias("u")), "u",
                           "left_semi")
                   .join(core.select(F.col("v").alias("w"),
                                     F.col("core").alias("nc")), "w"))
            h = (nbr.select("u", F.least(F.row_number().over(rn),
                                         F.col("nc")).alias("m"))
                 .groupBy("u").agg(F.max("m").alias("h")))
            upd = (deg.join(h, "u")
                   .join(core.select(F.col("v").alias("u"),
                                     F.col("core").alias("old")), "u")
                   .select(F.col("u").alias("v"),
                           F.least("deg", "h").alias("core"),
                           "old", "deg"))
            pre = (core.join(affected, "v", "left_anti")
                   .select("v", "core",
                           F.col("core").alias("old"))
                   .join(degv, "v")
                   .select("v", "core", "old", "deg")
                   .unionAll(upd)
                   .persist(StorageLevel.MEMORY_AND_DISK))
            new_core = pre.localCheckpoint(eager=True)
        # drop the previous round's cache entry now that its
        # successor is materialized (checkpoint blocks keep the data)
        if prev_cache is not None:
            prev_cache.unpersist()
        prev_cache = pre
        s, n_changed, changed_deg = new_core.agg(
            F.sum("core"),
            F.count(F.when(F.col("core") < F.col("old"), 1)),
            F.coalesce(F.sum(F.when(F.col("core") < F.col("old"),
                                    F.col("deg"))),
                       F.lit(0))).collect()[0]
        core = new_core.select("v", "core")
        if n_changed == 0:
            break
        # Cost guard alongside the data-fraction rule: restricting
        # the recompute only pays when the edges NOT touched exceed
        # the frontier round's fixed overhead (see
        # FRONTIER_OVERHEAD_EDGES for the measured break-even and
        # why an unindexed layout caps the benefit).
        frontier = (changed_deg < switch_below
                    and m_edges - changed_deg > frontier_overhead_edges)
    return core.select("v", F.col("core").cast("bigint").alias("core"))


#: SSSP: "unreached within the round budget" sentinel distance. Large
#: enough that no 4-round path reaches it (max edge weight is 100 —
#: two l_quantity values <= 50 each), small enough that sentinel +
#: weight stays far from int overflow.
SSSP_INF = 99999


def copart_weighted_edges(lineitem: DataFrame,
                          max_degree: int = MAX_DEGREE) -> DataFrame:
    """Degree-capped canonical edge list (a, b, w) of the co-purchase
    graph with an integer cheapest-co-purchase weight: per order each
    part keeps its minimum quantity, an order's pair weight is the sum
    of the two minima, and the edge weight is the minimum over orders.
    All-integer (l_quantity is whole-valued in TPC-H), so weighted
    relaxations stay exactly replayable in SQL.

    Same never-self-join-the-fact-table build as `copart_pairs`: the
    per-(order, part) minimum is a partially-aggregated groupBy (map-
    side combine shrinks the shuffle to distinct (order, part) rows),
    the per-order struct array is a second keyed aggregate on the
    already-collapsed frame, pairs explode from the sorted array
    (bounded by lines-per-order), then one keyed min-aggregate prices
    each edge. A "one-shuffle" variant that collects raw lines per
    order and collapses duplicates in-array via higher-order
    functions benched the same at sf0.1 (within the ±15% noise band)
    but moves MORE shuffle bytes at scale — collect_list forfeits
    map-side combine, so every raw line crosses the wire where this
    form ships distinct (order, part) rows — so the two-stage
    partial-agg form is the 100 TB posture. The degree cap mirrors
    `bfs_hops`: degrees counted on the distinct pair list, both
    endpoints must survive.
    """
    opq = (lineitem.groupBy("l_orderkey", "l_partkey")
           .agg(F.min("l_quantity").cast("int").alias("q")))
    grouped = (opq.groupBy("l_orderkey")
               .agg(F.sort_array(
                   F.collect_list(F.struct("l_partkey", "q")))
                   .alias("ps")))
    raw = (grouped
           .select(F.posexplode("ps").alias("i", "x"), F.col("ps"))
           .select("x", F.explode(
               F.slice("ps", F.col("i") + F.lit(2), F.size("ps")))
               .alias("y"))
           .select(F.col("x.l_partkey").alias("a"),
                   F.col("y.l_partkey").alias("b"),
                   (F.col("x.q") + F.col("y.q")).alias("pw"))
           .groupBy("a", "b").agg(F.min("pw").cast("int").alias("w")))
    deg = (raw.select(F.col("a").alias("v"))
           .unionAll(raw.select(F.col("b").alias("v")))
           .groupBy("v").agg(F.count("*").alias("deg"))
           .where(F.col("deg") <= max_degree))
    return (raw
            .join(deg.select(F.col("v").alias("a")), "a", "left_semi")
            .join(deg.select(F.col("v").alias("b")), "b", "left_semi")
            .select("a", "b", "w"))


def sssp_weighted(lineitem: DataFrame, n_rounds: int = 4,
                  max_degree: int = MAX_DEGREE) -> DataFrame:
    """Bounded-round single-source shortest paths (Bellman-Ford) from
    the minimum-id vertex of the capped weighted co-purchase graph:
    dist⁰(src)=0 else SSSP_INF; distᵗ⁺¹(v) = min(distᵗ(v), min over
    in-edges (distᵗ(u) + w(u,v))). The weighted companion to
    `bfs_hops` — same all-integer arithmetic, same aggregation-order-
    independent min(), so the iterative operator carries a full
    value-level oracle (unrolled SQL). Vertices beyond the round
    budget keep the sentinel; a sentinel-sourced relaxation
    (SSSP_INF + w) can never undercut a real distance and is clipped
    by the least() against the vertex's own bound.

    Scale posture: identical to `bfs_hops` — the relaxation join is
    keyed on the persisted hash-partitioned bidirectional edge list
    (only the |V|-row distance table moves per round), the per-round
    aggregate is a map-side-combining min, each round is
    lineage-truncated, and rounds are the explicit cost bound.
    """
    from pyspark import StorageLevel

    edges = copart_weighted_edges(lineitem, max_degree) \
        .localCheckpoint(eager=False)
    bi = (edges.select(F.col("a").alias("src"), F.col("b").alias("dst"),
                       "w")
          .unionAll(edges.select(F.col("b").alias("src"),
                                 F.col("a").alias("dst"), "w")))
    bi = bi.repartition("src").persist(StorageLevel.MEMORY_AND_DISK)
    verts = bi.select(F.col("src").alias("v")).distinct()
    source = verts.agg(F.min("v").alias("s"))
    dists = (verts.crossJoin(F.broadcast(source))
             .select("v", F.when(F.col("v") == F.col("s"), 0)
                     .otherwise(F.lit(SSSP_INF)).cast("int")
                     .alias("dist")))
    for _ in range(n_rounds):
        nbr = (bi.join(dists, bi.src == dists.v)
               .groupBy("dst")
               .agg(F.min(F.col("dist") + F.col("w")).alias("nd")))
        dists = (dists.join(nbr.hint("shuffle_hash"),
                             dists.v == nbr.dst, "left")
                 .select("v", F.least(
                     F.col("dist"),
                     F.coalesce(F.col("nd"), F.lit(SSSP_INF)))
                     .cast("int").alias("dist"))
                 .localCheckpoint(eager=False))
    return dists.select("v", "dist")


def label_propagation(lineitem: DataFrame, n_rounds: int = 3,
                      max_degree: int = MAX_DEGREE,
                      block_mod: int | None = None,
                      cross_mod: int = 37) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007) on the capped co-purchase part graph, `n_rounds`
    deterministic rounds: label⁰(v) = v; labelᵗ⁺¹(v) = the most
    frequent label among v's neighbors, ties broken by the SMALLEST
    label — the tie-break that makes synchronous LPA fully
    deterministic and therefore value-level oracle-able (classic LPA
    randomizes tie-breaks and update order; bounded synchronous
    rounds with a total tie order is the reproducible form — labels
    and counts are all integers, and the per-round argmax is a window
    rank, aggregation-order independent).

    On a structureless graph LPA's min-label attractor floods to the
    giant community within a few rounds — the CORRECT answer for a
    random graph (the TPC-H-ish co-purchase graph is one: orders
    draw parts uniformly, so Q ≈ 0 for every cut, see
    `lpa_modularity`). To also demonstrate structure RECOVERY, the
    registry entry sets `block_mod`: edges are restricted to
    same-residue part pairs (a ≡ b mod block_mod) plus a thin
    deterministic slice of cross-block edges ((a + b) ≡ 0 mod
    `cross_mod`) — the planted-community pattern (`dedup_minhash`'s
    planted-corpus idea applied to graphs); LPA must then separate
    the blocks, and the modularity check certifies Q >> 0. The
    two-clique pytest pins recovery on a hand-built graph.

    Scale posture (the `bfs_hops` shape): the per-round join is keyed
    on the persisted hash-partitioned bidirectional edge list — only
    the |V|-row label table moves per round; the neighbor-label count
    is a map-side-combining aggregate; each round lineage-truncates
    via localCheckpoint. Returns (v, label) for every capped-graph
    vertex.
    """
    from pyspark import StorageLevel
    from pyspark.sql.window import Window

    pairs = copart_pairs(lineitem)
    if block_mod is not None:
        pairs = pairs.where(
            (F.col("a") % block_mod == F.col("b") % block_mod)
            | ((F.col("a") + F.col("b")) % cross_mod == 0))
    edges = (capped_oriented(pairs, max_degree).select("a", "b")
             .localCheckpoint(eager=False))
    bi = (edges.select(F.col("a").alias("u"), F.col("b").alias("w"))
          .unionAll(edges.select(F.col("b").alias("u"),
                                 F.col("a").alias("w")))
          .repartition("u").persist(StorageLevel.MEMORY_AND_DISK))
    labels = (bi.select(F.col("u").alias("v")).distinct()
              .select("v", F.col("v").alias("label")))
    rn = Window.partitionBy("u").orderBy(F.col("c").desc(),
                                         F.col("label").asc())
    for _ in range(n_rounds):
        counts = (bi.join(labels.select(F.col("v").alias("w"), "label"),
                          "w")
                  .groupBy("u", "label").agg(F.count("*").alias("c")))
        labels = (counts.withColumn("rn", F.row_number().over(rn))
                  .where(F.col("rn") == 1)
                  .select(F.col("u").alias("v"), "label")
                  .localCheckpoint(eager=False))
    return labels


def hits_scores(lineitem: DataFrame, top_k: int = 20,
                max_degree: int = MAX_DEGREE) -> DataFrame:
    """Hubs-and-authorities (Kleinberg's HITS, JACM'99) on the
    degree-ORIENTED capped co-purchase graph, two unnormalized
    mutual-reinforcement rounds:

        hub⁰ = 1;  auth¹(v) = Σ_{u→v} hub⁰(u);
        hub¹(u) = Σ_{u→v} auth¹(v);  auth²(v) = Σ_{u→v} hub¹(u)

    Unnormalized integer iteration is deliberate: HITS scores are
    defined up to scale (the eigenvector direction), per-round L2
    normalization only rescales, and skipping it keeps every score an
    EXACT path-count integer — aggregation-order independent, so the
    iterative operator earns a full unrolled-SQL value oracle (the
    `pagerank` integer-mass argument). Bounds: deg <= max_degree
    caps auth² at max_degree³ — far from bigint overflow. The
    orientation (lower-degree endpoint → higher) is the deterministic
    direction `capped_oriented` already proves; top_k by (auth²
    DESC, v) is a TakeOrdered cut, no global sort.
    """
    oriented = (capped_oriented(copart_pairs(lineitem), max_degree)
                .select("src", "dst")
                .localCheckpoint(eager=False))
    auth1 = (oriented.groupBy("dst")
             .agg(F.count("*").cast("bigint").alias("a1")))
    hub1 = (oriented.join(auth1, "dst")
            .groupBy("src").agg(F.sum("a1").cast("bigint").alias("h1")))
    auth2 = (oriented.join(hub1, "src")
             .groupBy("dst").agg(F.sum("h1").cast("bigint").alias("a2")))
    return (auth2.join(auth1, "dst")
            .select(F.col("dst").alias("v"), F.col("a2").alias("authority"),
                    F.col("a1").alias("indegree"))
            .orderBy(F.col("authority").desc(), F.col("v").asc())
            .limit(top_k))


def lpa_modularity(lineitem: DataFrame, n_rounds: int = 3,
                   max_degree: int = MAX_DEGREE,
                   block_mod: int | None = None,
                   cross_mod: int = 37) -> DataFrame:
    """Newman modularity of the label-propagation partition, in EXACT
    integer form: per community c, contrib(c) = 4m·e_c − d_c² (the
    numerator of Q = Σ_c [e_c/m − (d_c/2m)²] over common denominator
    4m²), where e_c = intra-community edges, d_c = degree mass, m =
    |E| of the capped graph. All integers — the modularity an audit
    can re-derive — plus the rounded per-community Q contribution.

    Shape: the partition is `label_propagation`'s output; e_c is one
    keyed double-join of the edge list against the |V|-row label
    table; d_c one degree aggregate joined to labels; m rides along
    as a broadcast 1-row frame (never a driver collect). The quality
    number that tells you whether LPA's communities beat a random
    cut (Q > 0) — the standard acceptance check before using a
    partition for locality-aware placement."""
    labels = label_propagation(lineitem, n_rounds, max_degree,
                               block_mod, cross_mod) \
        .localCheckpoint(eager=False)
    pairs = copart_pairs(lineitem)
    if block_mod is not None:
        pairs = pairs.where(
            (F.col("a") % block_mod == F.col("b") % block_mod)
            | ((F.col("a") + F.col("b")) % cross_mod == 0))
    edges = (capped_oriented(pairs, max_degree).select("a", "b")
             .localCheckpoint(eager=False))
    m = edges.agg(F.count("*").cast("bigint").alias("m"))
    la = labels.select(F.col("v").alias("a"), F.col("label").alias("lab_a"))
    lb = labels.select(F.col("v").alias("b"), F.col("label").alias("lab_b"))
    intra = (edges.join(la, "a").join(lb, "b")
             .where(F.col("lab_a") == F.col("lab_b"))
             .groupBy(F.col("lab_a").alias("label"))
             .agg(F.count("*").cast("bigint").alias("intra_edges")))
    bi = (edges.select(F.col("a").alias("u"))
          .unionAll(edges.select(F.col("b").alias("u"))))
    deg = bi.groupBy("u").agg(F.count("*").cast("bigint").alias("deg"))
    dmass = (deg.join(labels.select(F.col("v").alias("u"), "label"), "u")
             .groupBy("label")
             .agg(F.sum("deg").cast("bigint").alias("degree_sum"),
                  F.count("*").cast("bigint").alias("n_members")))
    out = (dmass.join(intra, "label", "left")
           .select("label", "n_members",
                   F.coalesce("intra_edges", F.lit(0)).cast("bigint")
                   .alias("intra_edges"), "degree_sum")
           .crossJoin(F.broadcast(m)))
    contrib = (F.lit(4) * F.col("m") * F.col("intra_edges")
               - F.col("degree_sum") * F.col("degree_sum"))
    return (out.select(
        "label", "n_members", "intra_edges", "degree_sum",
        contrib.cast("bigint").alias("contrib_4m2"),
        (F.round(contrib / (F.lit(4.0) * F.col("m") * F.col("m")), 6)
         + F.lit(0.0)).alias("q_contrib")))


def neighbor_agg_2hop(lineitem: DataFrame, part: DataFrame,
                      max_degree: int = MAX_DEGREE) -> DataFrame:
    """GraphSAGE-style 2-layer neighborhood feature aggregation on
    the capped co-purchase graph (Hamilton et al., NeurIPS'17 — the
    message-passing primitive a GNN feature pipeline materializes
    before training): each part's vertex feature is its retail price
    in exact cents (joined from the `part` dimension); layer 1
    aggregates neighbor features, layer 2 aggregates the neighbors'
    layer-1 aggregates.

    Aggregation is (sum, count) in EXACT integers — the algebraic
    parts of the mean a GNN uses, kept unreduced so every value is
    oracle-checkable with no tolerance (the divide is the consumer's
    one float op). Distinct from `hits_scores`: undirected
    neighborhoods, external feature vectors, all vertices emitted —
    the featurization op, not a centrality ranking.

    Shape per layer: ONE keyed join of the persisted bidirectional
    edge list against the |V|-row feature frame + one map-side-
    combining aggregate — the bfs/pagerank round shape; features
    broadcast nothing, the dimension join is |V|-sized.
    """
    from pyspark import StorageLevel

    edges = copart_edges(lineitem, max_degree).localCheckpoint(eager=False)
    bi = (edges.select(F.col("a").alias("u"), F.col("b").alias("w"))
          .unionAll(edges.select(F.col("b").alias("u"),
                                 F.col("a").alias("w")))
          .persist(StorageLevel.MEMORY_AND_DISK))
    feat = (bi.select(F.col("u").alias("v")).distinct()
            .join(part.select(F.col("p_partkey").alias("v"),
                              F.round(F.col("p_retailprice") * 100)
                              .cast("bigint").alias("f")), "v"))
    h1 = (bi.join(feat.select(F.col("v").alias("w"), "f"), "w")
          .groupBy("u")
          .agg(F.sum("f").cast("bigint").alias("s1"),
               F.count("*").cast("bigint").alias("n1")))
    h2 = (bi.join(h1.select(F.col("u").alias("w"),
                            F.col("s1").alias("ns1")), "w")
          .groupBy("u")
          .agg(F.sum("ns1").cast("bigint").alias("s2"),
               F.count("*").cast("bigint").alias("n2")))
    return (feat.join(h1, feat.v == h1.u).drop("u")
            .join(h2, feat.v == h2.u).drop("u")
            .select("v", "f", "s1", "n1", "s2", "n2"))


#: Landmark BFS sentinel (beyond any n_hops-bounded distance).
LM_INF = 99


def landmark_distances(lineitem: DataFrame, n_hops: int = 4,
                       n_landmarks: int = 4,
                       max_degree: int = MAX_DEGREE) -> DataFrame:
    """Bounded multi-source BFS from `n_landmarks` landmark vertices
    (the smallest vertex ids — deterministic), relaxing ALL landmark
    distances simultaneously: state is (v, d1..dL), and each round is
    ONE edge join + ONE aggregate with L min() columns — the
    vectorized-state form, same shuffle count as single-source
    `bfs_hops` for L× the distances. The (d1..dL) vector is the
    classic landmark/distance-sketch embedding (Potamias et al.,
    CIKM'09): d(u,v) is estimated by min_k d(u,l_k)+d(l_k,v), and
    `nearest` (argmin with smallest-k tie-break) is the routing/
    partitioning label. All-integer min-relaxation — aggregation-
    order independent, full unrolled-SQL oracle; unreached-in-budget
    keeps the LM_INF sentinel and nearest = 0.
    """
    from pyspark import StorageLevel

    edges = copart_edges(lineitem, max_degree).localCheckpoint(eager=False)
    bi = (edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
          .unionAll(edges.select(F.col("b").alias("src"),
                                 F.col("a").alias("dst"))))
    bi = bi.repartition("src").persist(StorageLevel.MEMORY_AND_DISK)
    verts = bi.select(F.col("src").alias("v")).distinct()
    lm = (verts.orderBy("v").limit(n_landmarks)
          .agg(F.sort_array(F.collect_set("v")).alias("ls")))
    cols = [f"d{k}" for k in range(1, n_landmarks + 1)]
    dists = verts.crossJoin(F.broadcast(lm)).select(
        "v", *[F.when(F.col("v") == F.element_at("ls", k), 0)
               .otherwise(F.lit(LM_INF)).cast("int").alias(f"d{k}")
               for k in range(1, n_landmarks + 1)])
    for _ in range(n_hops):
        nbr = (bi.join(dists, bi.src == dists.v)
               .groupBy("dst")
               .agg(*[(F.min(c) + 1).alias(f"n{c}") for c in cols]))
        dists = (dists.join(nbr.hint("shuffle_hash"),
                             dists.v == nbr.dst, "left")
                 .select("v", *[F.least(
                     F.col(c), F.coalesce(F.col(f"n{c}"),
                                          F.lit(LM_INF)))
                     .cast("int").alias(c) for c in cols])
                 .localCheckpoint(eager=False))
    best = F.least(*[F.col(c) for c in cols])
    nearest = F.when(best >= LM_INF, F.lit(0))
    for k, c in enumerate(cols, start=1):
        nearest = nearest.when(F.col(c) == best, F.lit(k))
    return dists.select("v", *cols,
                        nearest.cast("int").alias("nearest"))


def clustering_coefficients(lineitem: DataFrame,
                            max_degree: int = MAX_DEGREE) -> DataFrame:
    """Per-vertex local clustering coefficient on the capped
    co-purchase part graph: cc(v) = 2*t(v) / (d(v)*(d(v)-1)) for
    d(v) >= 2, where d is the degree WITHIN the capped graph and t(v)
    the number of triangles through v — the node-level refinement of
    `triangle_count`'s single global tally (same WWW'11
    degree-oriented edge iterator; orientation stays physical-only).

    Triangle crediting: each closed wedge (src, dst, w) found by the
    adjacency-intersection explodes once and credits all three
    corners, so t(v) is exact per vertex while every triangle is
    still discovered exactly once at its (deg, id)-minimum corner.
    cc is an exact-integer ratio evaluated in one IEEE division,
    rounded 6dp in-query both sides.

    Scale: identical movement to triangle_count (capped adjacency
    lists keyed twice) plus one |triangles|-row explode and a
    |V|-row degree join — no new corpus-sized shuffle."""
    edges = capped_oriented(copart_pairs(lineitem), max_degree) \
        .localCheckpoint(eager=False)
    oriented = edges.select("src", "dst")
    adj = (oriented.groupBy("src")
           .agg(F.sort_array(F.collect_list("dst")).alias("nbrs")))
    tri_inst = (oriented
                .join(adj.select(F.col("src"), F.col("nbrs").alias("na")),
                      "src", "inner")
                .join(adj.select(F.col("src").alias("dst"),
                                 F.col("nbrs").alias("nb")),
                      "dst", "inner")
                .select("src", "dst",
                        F.explode(F.array_intersect("na", "nb"))
                        .alias("w")))
    corners = (tri_inst.select(F.col("src").alias("v"))
               .unionAll(tri_inst.select(F.col("dst").alias("v")))
               .unionAll(tri_inst.select(F.col("w").alias("v")))
               .groupBy("v").agg(F.count(F.lit(1)).alias("t")))
    deg = (edges.select(F.col("a").alias("v"))
           .unionAll(edges.select(F.col("b").alias("v")))
           .groupBy("v").agg(F.count(F.lit(1)).alias("deg")))
    cc = (F.lit(2).cast("double") * F.col("t").cast("double")
          / (F.col("deg").cast("double")
             * (F.col("deg") - 1).cast("double")))
    return (deg.join(corners, "v", "left")
            .where(F.col("deg") >= 2)
            .select("v", F.col("deg").cast("bigint").alias("deg"),
                    F.coalesce(F.col("t"), F.lit(0)).cast("bigint")
                    .alias("triangles"))
            .withColumn("t", F.col("triangles"))
            .select("v", "deg", "triangles",
                    (F.round(cc, 6) + F.lit(0.0)).alias("cc")))


#: Fixed relaxation rounds for `dag_layers` — the layer is DEFINED as
#: the longest-path estimate after this many rounds (bounded-round
#: semantics, same contract as PR_ITERS/SSSP_ROUNDS), which keeps the
#: operator oracle-able by unrolling the identical rounds in SQL.
DAG_ROUNDS = 6


def dag_layers(lineitem: DataFrame,
               n_rounds: int = DAG_ROUNDS) -> DataFrame:
    """Topological layering of the co-purchase DAG: orienting every
    co-purchase edge from the lower to the higher part key makes the
    graph acyclic BY CONSTRUCTION (edges only increase the key), and
    layer(v) = longest incoming chain length after `n_rounds`
    Bellman-style relaxations — the dependency-depth / critical-path
    primitive (scheduling, lineage ordering) next to bfs_hops'
    shortest-path form.

    Per round only the |V|-row layer frame moves: incoming-max is a
    keyed join edges⋈state on the source, a map-side-combining max
    per destination, and a left join back — the persisted-edge
    bfs_hops shape with localCheckpoint truncation. All arithmetic
    is small integers; the oracle unrolls the identical rounds.

    Output: one row per layer (depth, vertex count, min vertex) —
    bounded by n_rounds + 1 rows."""
    edges = copart_pairs(lineitem).localCheckpoint(eager=False)
    verts = (edges.select(F.col("a").alias("v"))
             .unionAll(edges.select(F.col("b").alias("v")))
             .distinct())
    state = verts.select("v", F.lit(0).alias("lay")) \
        .localCheckpoint(eager=False)
    for _ in range(n_rounds):
        incoming = (edges.join(state.withColumnRenamed("v", "a"), "a")
                    .groupBy(F.col("b").alias("v"))
                    .agg((F.max("lay") + 1).alias("ml")))
        state = (state.join(incoming.hint("shuffle_hash"), "v", "left")
                 .select("v", F.greatest(F.col("lay"),
                                         F.coalesce(F.col("ml"),
                                                    F.lit(0)))
                         .alias("lay"))
                 .localCheckpoint(eager=False))
    return (state.groupBy(F.col("lay").alias("layer"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_vertices"),
                 F.min("v").cast("bigint").alias("min_vertex")))


#: Borůvka budget: outer rounds at least halve the component count;
#: inner label rounds propagate the min component id across each
#: round's selection graph (resolves merge groups of diameter up to
#: BORUVKA_LABEL_ROUNDS — every selection graph seen at sf0.001–sf3
#: resolves well inside it, verified by test + soak). Both budgets
#: are part of the operator's DEFINED bounded semantics; the oracle
#: unrolls the identical rounds.
BORUVKA_ROUNDS = 3
BORUVKA_LABEL_ROUNDS = 8


def boruvka_msf(lineitem: DataFrame, n_rounds: int = BORUVKA_ROUNDS,
                n_label_rounds: int = BORUVKA_LABEL_ROUNDS,
                max_degree: int = MAX_DEGREE) -> DataFrame:
    """Minimum spanning forest of the capped weighted co-purchase
    graph by bounded-round Borůvka — THE classic MST algorithm for
    massive graphs (each round is embarrassingly parallel: every
    component picks its lightest outgoing edge, then components
    contract), in pure DataFrame form:

      round: tag each edge with its endpoints' component labels
             (two keyed joins against the |V|-row label frame), keep
             cross edges, pick each component's minimum edge under
             the total order (w, a, b) with a component-partitioned
             rank window (the order is total, so the chosen forest
             is unique without assuming distinct weights), then
             contract: components connected by this round's selected
             edges take the MINIMUM component id of their merge
             group, found by n_label_rounds min-label rounds over
             the selection graph — the bfs_hops/sssp join shape
             (fixed checkpointed edge frame, only the |C|-row label
             frame moves per inner round), deliberately NOT a
             pointer-jumping self-join: self-joining a lazily
             re-planned AQE state frame re-executes its subtree
             per reference and went exponential in wall-clock
             (measured 92 s/step at sf0.001), while this form is
             the proven flat-cost shape.

    Output: one row per round — edges added, weight added (exact
    integer sums), components remaining — the convergence trace a
    100 TB run would be monitored by. Oracle unrolls the identical
    rounds x label rounds in SQL."""
    from pyspark.sql.window import Window

    # Round-15 NEGATIVE experiment: pre-partitioning this frame on "a"
    # (and the selection graph on "gn") for the per-round tag joins
    # measured 14.8 → 17.8 s at idle — AQE broadcasts the |C|-row
    # component/label sides, so the edge frame never shuffles in those
    # joins and the added layout exchanges were pure cost. Reverted;
    # recorded so round 16 doesn't retry it.
    edges = copart_weighted_edges(lineitem, max_degree) \
        .localCheckpoint(eager=False)
    comp = (edges.select(F.col("a").alias("v"))
            .unionAll(edges.select(F.col("b").alias("v")))
            .distinct()
            .select("v", F.col("v").alias("c"))
            .localCheckpoint(eager=False))
    round_stats = []
    for r in range(1, n_rounds + 1):
        ce = (edges
              .join(comp.select(F.col("v").alias("a"),
                                F.col("c").alias("ca")), "a")
              .join(comp.select(F.col("v").alias("b"),
                                F.col("c").alias("cb")), "b")
              .where(F.col("ca") != F.col("cb"))
              .localCheckpoint(eager=False))
        cand = (ce.select(F.col("ca").alias("cc"), "w", "a", "b",
                          F.col("cb").alias("oc"))
                .unionAll(ce.select(F.col("cb").alias("cc"), "w", "a",
                                    "b", F.col("ca").alias("oc"))))
        wsel = Window.partitionBy("cc").orderBy("w", "a", "b")
        sel = (cand.withColumn("rn", F.row_number().over(wsel))
               .where(F.col("rn") == 1)
               .select("cc", "oc", "w", "a", "b")
               .localCheckpoint(eager=False))
        stats = (sel.select("w", "a", "b").distinct()
                 .agg(F.count(F.lit(1)).cast("bigint")
                      .alias("edges_added"),
                      F.coalesce(F.sum("w"), F.lit(0)).cast("bigint")
                      .alias("weight_added")))
        # selection graph (bidirectional) is FIXED for the inner
        # loop; only the |C|-row label frame moves per round
        gedges = (sel.select(F.col("cc").alias("gc"),
                             F.col("oc").alias("gn"))
                  .unionAll(sel.select(F.col("oc").alias("gc"),
                                       F.col("cc").alias("gn")))
                  .distinct()
                  .localCheckpoint(eager=False))
        label = (comp.select(F.col("c").alias("cc")).distinct()
                 .select("cc", F.col("cc").alias("lab"))
                 .localCheckpoint(eager=False))
        for _ in range(n_label_rounds):
            nbr = (gedges.join(label.select(F.col("cc").alias("gn"),
                                            "lab"), "gn")
                   .groupBy(F.col("gc").alias("cc"))
                   .agg(F.min("lab").alias("nl")))
            label = (label.join(nbr, "cc", "left")
                     .select("cc", F.least(
                         F.col("lab"),
                         F.coalesce(F.col("nl"), F.col("lab")))
                         .alias("lab"))
                     .localCheckpoint(eager=False))
        comp = (comp.join(label.select(F.col("cc").alias("c"), "lab"),
                          "c")
                .select("v", F.col("lab").alias("c"))
                .localCheckpoint(eager=False))
        n_comp = comp.select("c").distinct() \
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_components"))
        round_stats.append(
            stats.crossJoin(F.broadcast(n_comp))
            .select(F.lit(r).cast("int").alias("round"),
                    "edges_added", "weight_added", "n_components"))
    out = round_stats[0]
    for s in round_stats[1:]:
        out = out.unionAll(s)
    return out


def graph_diameter_approx(lineitem: DataFrame, n_hops: int = 4,
                          max_degree: int = MAX_DEGREE) -> DataFrame:
    """Double-sweep diameter lower bound (Magnien/Latapy/Habib 2009 —
    the standard cheap diameter estimator: BFS from an arbitrary
    vertex, then BFS again from the farthest vertex found; the second
    eccentricity lower-bounds the diameter and is exact on trees) on
    the capped co-purchase graph, with both sweeps hop-budgeted at
    `n_hops` (the honest distributed form, like `bfs_hops` —
    eccentricities are reported within the budget).

    Determinism: integer min-relaxation rounds (aggregation-order
    free); the pivot vertex is the MINIMUM id among vertices at the
    first sweep's maximum reached distance — an exact integer argmax
    with a pinned tiebreak, so both engines pick the same vertex.

    Scale: two bounded BFS passes over the ONE persisted
    hash-partitioned bidirectional edge list (only the |V|-row
    distance frame moves per round); the sweep pivot is a 1-row
    broadcast. Output is one row: (source_v, ecc_source, far_v,
    diameter_lb)."""
    from pyspark import StorageLevel

    edges = copart_edges(lineitem, max_degree) \
        .localCheckpoint(eager=False)
    bi = (edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
          .unionAll(edges.select(F.col("b").alias("src"),
                                 F.col("a").alias("dst"))))
    bi = bi.repartition("src").persist(StorageLevel.MEMORY_AND_DISK)
    verts = bi.select(F.col("src").alias("v")).distinct() \
        .localCheckpoint(eager=False)

    def sweep(source):  # source: broadcastable 1-row frame with col s
        dists = (verts.crossJoin(F.broadcast(source))
                 .select("v", F.when(F.col("v") == F.col("s"), 0)
                         .otherwise(F.lit(BFS_INF)).cast("int")
                         .alias("dist")))
        for _ in range(n_hops):
            nbr = (bi.join(dists, bi.src == dists.v)
                   .groupBy("dst")
                   .agg((F.min("dist") + 1).alias("nd")))
            dists = (dists.join(nbr.hint("shuffle_hash"),
                             dists.v == nbr.dst, "left")
                     .select("v", F.least(
                         F.col("dist"),
                         F.coalesce(F.col("nd"), F.lit(BFS_INF)))
                         .cast("int").alias("dist"))
                     .localCheckpoint(eager=False))
        return dists

    s1 = verts.agg(F.min("v").alias("s"))
    d1 = sweep(s1)
    ecc1 = (d1.where(F.col("dist") < BFS_INF)
            .agg(F.max("dist").alias("ecc")))
    far = (d1.crossJoin(F.broadcast(ecc1))
           .where((F.col("dist") == F.col("ecc"))
                  & (F.col("dist") < BFS_INF))
           .agg(F.min("v").alias("s")))
    d2 = sweep(far)
    ecc2 = (d2.where(F.col("dist") < BFS_INF)
            .agg(F.max("dist").alias("ecc2")))
    return (s1.select(F.col("s").cast("bigint").alias("source_v"))
            .crossJoin(F.broadcast(
                ecc1.select(F.col("ecc").cast("bigint")
                            .alias("ecc_source"))))
            .crossJoin(F.broadcast(
                far.select(F.col("s").cast("bigint").alias("far_v"))))
            .crossJoin(F.broadcast(
                ecc2.select(F.col("ecc2").cast("bigint")
                            .alias("diameter_lb")))))


#: Harmonic-centrality contribution quantization (1e-8 units) and cut.
HC_SCALE = 100_000_000
HC_TOP_K = 50


def hc_contrib_expr(col: str) -> str:
    """Per-landmark harmonic contribution as SQL text over an integer
    distance column (shared verbatim with the oracle): 1/d quantized
    to BIGINT 1e-8 units for reached non-self distances — one
    round() per BOUNDED distance value, so centrality sums are exact
    integers."""
    return (f"CASE WHEN {col} > 0 AND {col} < {LM_INF} "
            f"THEN CAST(round({HC_SCALE}.0 / {col}, 0) AS BIGINT) "
            f"ELSE 0 END")


def harmonic_centrality_approx(lineitem: DataFrame, n_hops: int = 4,
                               n_landmarks: int = 4,
                               k: int = HC_TOP_K,
                               max_degree: int = MAX_DEGREE) -> DataFrame:
    """Landmark-approximated harmonic centrality (Boldi & Vigna 2014
    define the measure; Potamias et al. CIKM'09 the landmark
    estimation): hc(v) ≈ Σ over the L landmark vertices of
    1/d(v, l), with the same deterministic landmarks, hop budget and
    vectorized multi-source relaxation as `landmark_distances` — the
    "which vertices sit close to everything" ranking at L·BFS cost
    instead of the exact measure's all-pairs BFS (unpayable at any
    scale).

    Exactness: distances are bounded integers, each 1/d contribution
    quantizes to BIGINT 1e-8 units (`hc_contrib_expr`, shared text),
    so scores are exact integer sums with a (score desc, v) total
    order; unreached-in-budget and self distances contribute 0.
    Top-k via TakeOrdered. Output: (v, n_reached, hc_score)."""
    d = landmark_distances(lineitem, n_hops, n_landmarks, max_degree)
    cols = [f"d{j}" for j in range(1, n_landmarks + 1)]
    hc = " + ".join(f"({hc_contrib_expr(c)})" for c in cols)
    reached = " + ".join(
        f"(CASE WHEN {c} > 0 AND {c} < {LM_INF} THEN 1 ELSE 0 END)"
        for c in cols)
    return (d.select("v",
                     F.expr(f"CAST({reached} AS BIGINT)")
                     .alias("n_reached"),
                     F.expr(f"({hc})").alias("hc_q"))
            .orderBy(F.col("hc_q").desc(), "v").limit(k)
            .select("v", "n_reached",
                    (F.round(F.col("hc_q").cast("double")
                             / F.lit(float(HC_SCALE)), 6) + F.lit(0.0))
                    .alias("hc_score")))


#: Synchronous round budget for the maximal-independent-set loop:
#: greedy-by-priority MIS decides every vertex in O(log n) rounds
#: w.h.p. for hash priorities (8 rounds at sf0.01; the budget doubles
#: that). Vertices still undecided past the budget stay out of the
#: output — IDENTICALLY in both engines (the oracle unrolls the same
#: rounds), so truncation can never produce a comparison artifact.
MIS_ROUNDS = 16

#: Composite priority: (28-bit md5 hash, vertex id) packed into one
#: BIGINT — hash*2^34 + v, distinct per vertex (documented bound:
#: vertex ids < 2^34; repack with a wider shift beyond that).
_MIS_SHIFT = 17179869184


def luby_mis(lineitem: DataFrame,
             rounds: int = MIS_ROUNDS) -> DataFrame:
    """Maximal independent set of the capped co-purchase graph by
    synchronous greedy-by-priority rounds — Luby's algorithm (Luby
    1986) with a FIXED deterministic priority per vertex (md5-hash,
    id) instead of per-round randomness: each round, every undecided
    vertex whose priority beats all undecided neighbors joins the
    MIS and knocks its neighbors out. Fixed priorities make the
    result the unique lexicographically-first MIS under the hash
    order — deterministic under any partitioning and engine — while
    keeping Luby's O(log n) expected round count (hash priorities
    are random-ish w.r.t. graph structure). MIS is the classic
    building block for scheduling/coloring and, in a curation stack,
    for picking a maximal non-conflicting representative set from a
    similarity graph (keep no two adjacent near-duplicates).

    Shape — PEELING, not full-state rewrites (the first cut of this
    operator re-checkpointed the whole |V| state and the whole edge
    frame every round and soaked 538 s at sf1; decided vertices
    carry no information, so both frames now SHRINK): per round one
    keyed join of the current symmetric edge frame against the
    undecided set for the neighborhood priority floor, the winner
    cut, and two anti-joins that remove decided vertices from the
    undecided frame and their edges from the edge frame — round
    r+1's cost is proportional to what round r left undecided,
    which on hash priorities collapses geometrically. Early exit on
    an empty undecided set (one bounded scalar per round); the
    oracle unrolls the full budget — extra rounds are identity.

    Output: (partkey, mis_round) for MIS members, the round each
    joined."""
    edges = copart_edges(lineitem)
    key = (F.conv(F.substring(F.md5(F.col("v").cast("string")), 1, 7),
                  16, 10).cast("bigint")
           * F.lit(_MIS_SHIFT) + F.col("v"))
    sym = (edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .localCheckpoint(eager=True))
    und = (sym.select(F.col("a").alias("v")).distinct()
           .withColumn("k", key)
           .localCheckpoint(eager=True))
    parts = []
    for r in range(1, rounds + 1):
        # Round-15 job-count cut (guide §2.4 — remove jobs outright):
        # the round's four frames used to be four EAGER checkpoints
        # plus an isEmpty probe — 5 driver barriers per round, ~155
        # jobs per query at sf0.1 with the wall dominated by per-job
        # fixed overhead, not compute. The checkpoints are now LAZY
        # (still lineage-truncating and still cached-once on first
        # materialization, so no AQE re-execution of shared subtrees)
        # and ONE und.count() per round forces the chain and doubles
        # as the early-exit probe. Same frames, same results.
        kb = und.select(F.col("v").alias("b"), F.col("k").alias("kb"))
        nmin = (sym.join(kb, "b")
                .groupBy(F.col("a").alias("v"))
                .agg(F.min("kb").alias("mn")))
        m = (und.join(nmin, "v", "left")
             .where(F.col("mn").isNull() | (F.col("k") < F.col("mn")))
             .select("v")
             .localCheckpoint(eager=False))
        parts.append(m.select("v", F.lit(r).cast("int").alias("rnd")))
        x = (sym.join(m.select(F.col("v").alias("a")), "a")
             .select(F.col("b").alias("v")).distinct())
        removed = m.unionByName(x).distinct() \
            .localCheckpoint(eager=False)
        und = (und.join(removed, "v", "left_anti")
               .localCheckpoint(eager=False))
        sym = (sym.join(removed.select(F.col("v").alias("a")), "a",
                        "left_anti")
               .join(removed.select(F.col("v").alias("b")), "b",
                     "left_anti")
               .localCheckpoint(eager=False))
        if und.count() == 0:
            break
    if not parts:
        # Edge-free co-purchase graph (or rounds=0): ``und`` only ever
        # holds edge-incident vertices, so there is nothing to decide
        # and the oracle returns an empty set — mirror it instead of
        # crashing on parts[0] (round-13 advice).
        return lineitem.sparkSession.createDataFrame(
            [], "partkey bigint, mis_round int")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(F.col("v").cast("bigint").alias("partkey"),
                      F.col("rnd").alias("mis_round"))



#: WL refinement rounds: r rounds distinguish vertices whose
#: r-hop neighborhoods differ (1-WL); 3 is the GNN-literature
#: default where almost all real graphs stabilize.
WL_ROUNDS = 3


def wl_fingerprints(lineitem: DataFrame,
                    rounds: int = WL_ROUNDS) -> DataFrame:
    """Weisfeiler-Lehman color refinement (1-WL, Weisfeiler &
    Lehman 1968) over the capped co-purchase graph — the graph
    fingerprint behind WL kernels (Shervashidze et al. 2011) and the
    expressiveness ceiling of message-passing GNNs: every round
    rehashes each vertex's label with the SORTED multiset of its
    neighbors' labels, so round r separates vertices whose r-hop
    unfoldings differ. The per-round label-class profile is the
    graph's structural signature (two graphs with different
    profiles are provably non-isomorphic).

    Determinism: labels are md5 hex strings built from byte-
    identical inputs in both engines — the neighbor multiset is
    joined with an explicit lexicographic sort (Spark sort_array ↔
    DuckDB string_agg ORDER BY), so hashes, class sizes, and the
    order-free fingerprint Σ hash·count are exact integers.

    Scale: per round one keyed join of the static symmetric edge
    frame against the |V|-row label frame and one per-vertex
    aggregate whose state is bounded by the degree cap (≤256
    neighbor labels); summaries are label-class-sized. Output per
    round: (round, n_distinct_labels, max_class, fingerprint)."""
    edges = copart_edges(lineitem)
    # Round-15 NEGATIVE experiment: pre-partitioning sym on the join
    # key b before this checkpoint was bimodal at sf0.1 (6-18 s across
    # four gated A/B pairs vs a stable ~8 s without) — the checkpoint
    # drops the partitioning anyway (LogicalRDD, plan-verified on the
    # components loop) and the per-round join broadcasts the label
    # side, so the exchange bought nothing. Left out.
    sym = (edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .localCheckpoint(eager=False))
    lbl = (sym.select(F.col("a").alias("v")).distinct()
           .withColumn("lbl", F.lit("1"))
           .localCheckpoint(eager=False))
    # pinned per-round aggregate width (round-14's wedge-join lesson,
    # VERDICT r14 #7): the joined frame is byte-tiny, so AQE coalesces
    # the collect_list aggregate to 1-2 tasks of CPU-moderate string
    # sort/concat/md5 work (profiled 2.0 s single-task per round);
    # repartitioning on the grouping key at the deploy-configured
    # width replaces the aggregate's own exchange rather than adding
    # one
    n_shuffle = int(lineitem.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"))
    out = None
    for r in range(1, rounds + 1):
        nb = (sym.join(lbl.select(F.col("v").alias("b"),
                                  F.col("lbl").alias("nl")), "b")
              .repartition(n_shuffle, F.col("a"))
              .groupBy(F.col("a").alias("v"))
              .agg(F.array_join(F.sort_array(F.collect_list("nl")),
                                ",").alias("nls")))
        lbl = (lbl.join(nb, "v")
               .select("v", F.substring(
                   F.md5(F.concat_ws("|", F.col("lbl"),
                                     F.col("nls"))), 1, 8)
                   .alias("lbl"))
               .localCheckpoint(eager=True))
        classes = lbl.groupBy("lbl").agg(
            F.count(F.lit(1)).cast("bigint").alias("c"))
        summ = classes.agg(
            F.lit(r).cast("int").alias("round"),
            F.count(F.lit(1)).cast("bigint")
            .alias("n_distinct_labels"),
            F.max("c").cast("bigint").alias("max_class"),
            F.sum(F.expr("CAST(conv(lbl, 16, 10) AS BIGINT) * c"))
            .cast("bigint").alias("fingerprint"))
        out = summ if out is None else out.unionByName(summ)
    return out


#: k-truss parameters: truss level (every surviving edge sits in
#: >= k-2 triangles among surviving edges) and the synchronous peel
#: round budget — trusses stabilize in a handful of rounds on
#: co-occurrence graphs; the oracle unrolls the identical rounds so
#: truncation can never produce a comparison artifact.
KTRUSS_K = 4
KTRUSS_ROUNDS = 3


def ktruss_edges(lineitem: DataFrame, k: int = KTRUSS_K,
                 rounds: int = KTRUSS_ROUNDS) -> DataFrame:
    """k-truss of the capped co-purchase graph (Cohen 2008): the
    maximal subgraph where every EDGE participates in at least k−2
    triangles — the cohesion standard one notch stronger than
    k-core (a k-core vertex can survive on disjoint neighbors; a
    truss edge needs its endpoints' neighborhoods to OVERLAP), the
    standard community-core primitive.

    Synchronous peel: each round computes every surviving edge's
    support |N(a) ∩ N(b)| over the CURRENT edge set, drops edges
    below k−2, and re-checkpoints. Early exit when the edge count is
    stable (one bounded scalar per round); the oracle unrolls the
    same budget — post-convergence rounds are identity, so both
    engines agree whether or not the budget was needed.

    Support via DEGREE-ORDERED wedge enumeration (the round-12 judge
    rework, instruction #6; Chiba & Nishizeki 1985 / Latapy 2008):
    edges are oriented from their (deg, id)-lower endpoint, wedges
    enumerated ONLY at each triangle's lowest-ranked corner (pairs of
    out-neighbors), and closed against the oriented edge list — so
    each triangle is found exactly once and the join work is
    Σ_u outdeg(u)² = O(m^1.5) instead of the symmetric form's
    Σ_e deg. Each triangle then credits its three edges (explode,
    map-side combined count). The prior symmetric-adjacency form
    probed every edge against BOTH endpoints' full neighbor lists —
    ~2·Σ_e deg wedge rows/round, 492 s at sf1; this form cuts the
    wedge frame by the orientation factor with identical support
    values.

    Output: the surviving canonical edge list (a, b)."""
    edges = copart_edges(lineitem).localCheckpoint(eager=True)
    prev_n = None
    for _ in range(rounds):
        deg = (edges.select(F.col("a").alias("v"))
               .unionAll(edges.select(F.col("b").alias("v")))
               .groupBy("v").agg(F.count(F.lit(1)).alias("dg")))
        # total order: rank = deg·2³² + id (unique per vertex)
        rank = deg.select(
            "v", (F.col("dg") * F.lit(1 << 32) + F.col("v"))
            .alias("rk"))
        d = (edges
             .join(rank.select(F.col("v").alias("a"),
                               F.col("rk").alias("ra")), "a")
             .join(rank.select(F.col("v").alias("b"),
                               F.col("rk").alias("rb")), "b")
             .select(F.when(F.col("ra") < F.col("rb"), F.col("a"))
                     .otherwise(F.col("b")).alias("u"),
                     F.when(F.col("ra") < F.col("rb"), F.col("b"))
                     .otherwise(F.col("a")).alias("w"),
                     F.greatest("ra", "rb").alias("rw"))
             .localCheckpoint(eager=True))
        # pinned wedge-join width (round-14): the oriented edge frame
        # is tiny in BYTES, so AQE coalesces the self-join on u to one
        # partition and the Σ outdeg² wedge fan-out computes on one
        # core (measured 22.6 s single-task at sf0.1); repartitioning
        # both legs on the join key at the deploy-configured shuffle
        # width replaces the join's own exchange rather than adding one
        n_shuffle = int(lineitem.sparkSession.conf.get(
            "spark.sql.shuffle.partitions"))
        w1 = (d.select("u", F.col("w").alias("x"),
                       F.col("rw").alias("rx"))
              .repartition(n_shuffle, F.col("u")))
        w2 = (d.select("u", F.col("w").alias("y"),
                       F.col("rw").alias("ry"))
              .repartition(n_shuffle, F.col("u")))
        closing = d.select(F.col("u").alias("x"),
                           F.col("w").alias("y"))
        tri = (w1.join(w2, "u")
               .where(F.col("rx") < F.col("ry"))
               .join(closing, ["x", "y"]))
        supp = (tri.select(F.explode(F.array(
                    F.struct(F.least("u", "x").alias("a"),
                             F.greatest("u", "x").alias("b")),
                    F.struct(F.least("u", "y").alias("a"),
                             F.greatest("u", "y").alias("b")),
                    F.struct(F.least("x", "y").alias("a"),
                             F.greatest("x", "y").alias("b"))))
                    .alias("e"))
                .select("e.a", "e.b")
                .groupBy("a", "b")
                .agg(F.count(F.lit(1)).alias("sup")))
        edges = (edges.join(supp, ["a", "b"])
                 .where(F.col("sup") >= k - 2)
                 .select("a", "b")
                 .localCheckpoint(eager=True))
        n = edges.count()
        if prev_n is not None and n == prev_n:
            break
        prev_n = n
    return edges.select(F.col("a").cast("bigint").alias("a"),
                        F.col("b").cast("bigint").alias("b"))


def degree_assortativity(lineitem: DataFrame) -> DataFrame:
    """Degree assortativity coefficient of the capped co-purchase
    graph (Newman 2002): the Pearson correlation of endpoint degrees
    over edges — do hubs attach to hubs (assortative, r > 0, social
    networks) or to leaves (disassortative, r < 0, the
    recommender/co-occurrence shape)? The one-number structural
    readout next to `clustering_coefficients` and the degree cap's
    own design rationale (a disassortative graph is exactly where
    the hub cap bites).

    Exactness: degrees are integers; every moment (Σx, Σy, Σxy,
    Σx², Σy²) over the DIRECTED edge set (both orientations — the
    standard symmetric treatment) is an exact decimal(38) sum; r is
    ONE fixed-form double expression of those exact sums, 6dp.

    Scale: one degree aggregate, two |V|-row broadcast join-backs
    onto the edge list, one global aggregate. Output: (n_edges,
    mean_deg — 2m/n 2dp, r)."""
    edges = copart_edges(lineitem)
    deg = (edges.select(F.col("a").alias("v"))
           .unionAll(edges.select(F.col("b").alias("v")))
           .groupBy("v").agg(F.count(F.lit(1)).alias("deg")))
    sym = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    d38 = "decimal(38,0)"
    j = (sym.join(deg.select(F.col("v").alias("a"),
                             F.col("deg").alias("dx")), "a")
         .join(deg.select(F.col("v").alias("b"),
                          F.col("deg").alias("dy")), "b")
         .select(F.col("dx").cast(d38).alias("x"),
                 F.col("dy").cast(d38).alias("y")))
    agg = j.agg(F.count(F.lit(1)).cast("bigint").alias("m2"),
                F.sum("x").cast(d38).alias("sx"),
                F.sum("y").cast(d38).alias("sy"),
                F.sum(F.expr("x * y")).cast(d38).alias("sxy"),
                F.sum(F.expr("x * x")).cast(d38).alias("sxx"),
                F.sum(F.expr("y * y")).cast(d38).alias("syy"))
    nverts = deg.agg(F.count(F.lit(1)).cast("bigint").alias("n_v"))
    # zero-variance (regular) graphs have an undefined r: guard the
    # division explicitly — Spark 4 ANSI mode throws on double /0
    r = ("CASE WHEN m2 * sxx = sx * sx OR m2 * syy = sy * sy "
         "THEN CAST(NULL AS DOUBLE) ELSE "
         "(CAST(m2 AS DOUBLE) * CAST(sxy AS DOUBLE) "
         " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) "
         "/ (sqrt(CAST(m2 AS DOUBLE) * CAST(sxx AS DOUBLE) "
         "        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) "
         "   * sqrt(CAST(m2 AS DOUBLE) * CAST(syy AS DOUBLE) "
         "          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) END")
    return (agg.crossJoin(F.broadcast(nverts))
            .select((F.col("m2") / 2).cast("bigint").alias("n_edges"),
                    (F.round(F.expr("CAST(m2 AS DOUBLE) / n_v"), 2)
                     + F.lit(0.0)).alias("mean_deg"),
                    (F.round(F.expr(r), 6) + F.lit(0.0))
                    .alias("assortativity")))


#: Report size for the frequent-triple miner.
TRIPLES_TOP_K = 20


def frequent_triples(lineitem: DataFrame,
                     k: int = TRIPLES_TOP_K) -> DataFrame:
    """Top-k most frequent 3-itemsets over order baskets — the
    level-3 frequent-itemset mining step (Agrawal & Srikant, VLDB'94)
    above `association_rules`' pairs: which part TRIPLES sell
    together, the input to 3-way bundle rules.

    Scale: the classic Apriori candidate explosion never happens
    here because triples are enumerated INSIDE each basket from the
    sorted distinct-part array (nested suffix-slice transforms, all
    JVM builtins — the copart_pairs shape one level deeper): a
    basket of t parts yields C(t,3) rows with t bounded by
    lines-per-order, so the triple stream is a constant factor of
    the fact table, never a 3-way corpus self-join — which is
    exactly what the ORACLE does instead (bsk³ keyed joins), making
    the comparison a genuine differential test of the enumeration.
    One map-side-combined aggregate, TakeOrdered under the total
    order (support DESC, pa, pb, pc)."""
    grouped = (lineitem.groupBy("l_orderkey")
               .agg(F.sort_array(F.collect_set("l_partkey"))
                    .alias("ps")))
    triples = grouped.select(F.explode(F.expr(
        "flatten(flatten(transform(ps, (a, i) -> "
        "  transform(slice(ps, i + 2, size(ps)), (b, j) -> "
        "    transform(slice(ps, i + j + 3, size(ps)), c -> "
        "      struct(a, b, c))))))")).alias("t"))
    return (triples
            .select(F.col("t.a").alias("pa"),
                    F.col("t.b").alias("pb"),
                    F.col("t.c").alias("pc"))
            .groupBy("pa", "pb", "pc")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_support"))
            .orderBy(F.col("n_support").desc(), "pa", "pb", "pc")
            .limit(k)
            .select(F.col("pa").cast("bigint").alias("pa"),
                    F.col("pb").cast("bigint").alias("pb"),
                    F.col("pc").cast("bigint").alias("pc"),
                    "n_support"))


#: Hubs removed by the resilience audit.
HUB_REMOVAL_K = 20


def hub_removal_impact(lineitem: DataFrame,
                       k: int = HUB_REMOVAL_K) -> DataFrame:
    """Targeted-attack resilience audit of the co-purchase graph
    (Albert, Jeong & Barabási 2000): remove the k highest-degree
    vertices and measure what happens to connectivity — scale-free
    graphs shatter under targeted hub removal while staying robust
    to random failure, and THIS number (giant-component share
    before/after) is how that's quantified for a real catalog
    (which parts hold the recommendation graph together?).

    Deterministic: hubs are the top-k under the exact (degree DESC,
    vertex) total order; components are min-label exact (driver-
    checked convergence, `dedup/components.py`), counted WITH
    singletons (a stranded vertex is a component — the nodes frame
    keeps every non-hub vertex). One row out:
    (n_vertices, n_edges, n_comp_before, giant_before,
    n_comp_after, giant_after).

    Scale: the degree aggregate and top-k are one pass + TakeOrdered;
    the removal is two broadcast anti-joins; each components run is
    the standard persisted-edge label loop."""
    from cloud_native_mapreduce_spark.dedup.components import (
        connected_components)
    edges = copart_edges(lineitem).localCheckpoint(eager=True)
    verts = (edges.select(F.col("a").alias("v"))
             .unionAll(edges.select(F.col("b").alias("v")))
             .distinct()
             .localCheckpoint(eager=False))
    deg = (edges.select(F.col("a").alias("v"))
           .unionAll(edges.select(F.col("b").alias("v")))
           .groupBy("v").agg(F.count(F.lit(1)).alias("deg")))
    hubs = (deg.orderBy(F.col("deg").desc(), F.col("v"))
            .limit(k).select("v")
            .localCheckpoint(eager=True))

    def summarize(nodes, es):
        # edges_canonical: copart_edges yields DISTINCT a < b pairs and
        # the post-removal subset inherits that — skip the components
        # loop's symmetrize-dedup shuffle (round-14 optimization)
        comp = connected_components(
            nodes.select(F.col("v").alias("doc_id")),
            es.select(F.col("a").alias("doc_a"),
                      F.col("b").alias("doc_b")),
            edges_canonical=True)
        sizes = comp.groupBy("comp").agg(
            F.count(F.lit(1)).alias("sz"))
        return sizes.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_comp"),
            F.max("sz").cast("bigint").alias("giant"))

    before = summarize(verts, edges)
    verts_after = verts.join(hubs, "v", "left_anti")
    edges_after = (edges
                   .join(hubs.select(F.col("v").alias("a")), "a",
                         "left_anti")
                   .join(hubs.select(F.col("v").alias("b")), "b",
                         "left_anti"))
    after = summarize(verts_after, edges_after)
    nv = verts.agg(F.count(F.lit(1)).cast("bigint")
                   .alias("n_vertices"))
    ne = edges.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    return (nv.crossJoin(F.broadcast(ne))
            .crossJoin(F.broadcast(before.select(
                F.col("n_comp").alias("n_comp_before"),
                F.col("giant").alias("giant_before"))))
            .crossJoin(F.broadcast(after.select(
                F.col("n_comp").alias("n_comp_after"),
                F.col("giant").alias("giant_after")))))


#: Degree thresholds profiled by the rich-club audit.
RICH_CLUB_KS = (8, 16, 32, 64, 128)


def rich_club_coefficients(lineitem: DataFrame,
                           ks: "tuple[int, ...]" = RICH_CLUB_KS
                           ) -> DataFrame:
    """Rich-club coefficient profile of the capped co-purchase graph
    (Zhou & Mondragón 2004): φ(k) = 2·E_{>k} / (N_{>k}(N_{>k}−1)) —
    how densely the vertices of degree > k connect AMONG THEMSELVES,
    the hub-solidarity readout that complements
    `degree_assortativity` (one number, all degrees) and
    `hub_removal_impact` (what happens without the hubs).

    Exact integers end to end: one degree aggregate, one broadcast
    threshold fan-out (|ks| rows), per-k member counts and
    member-member edge counts via two keyed semi-join passes; φ is
    the only division (fixed-form double, 6dp; clubs with < 2
    members report NULL). Output: (k, n_members, n_club_edges,
    phi)."""
    spark = lineitem.sparkSession
    edges = copart_edges(lineitem).localCheckpoint(eager=False)
    deg = (edges.select(F.col("a").alias("v"))
           .unionAll(edges.select(F.col("b").alias("v")))
           .groupBy("v").agg(F.count(F.lit(1)).alias("deg"))
           .localCheckpoint(eager=False))
    kf = spark.createDataFrame([(k,) for k in ks], "k int")
    members = (deg.crossJoin(F.broadcast(kf))
               .where(F.col("deg") > F.col("k"))
               .select("k", "v")
               .localCheckpoint(eager=False))
    n_m = members.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"))
    # both endpoints must be in the k-club: two keyed inner joins
    # against the (k, member) frame
    club_edges = (edges.crossJoin(F.broadcast(kf))
                  .join(members.withColumnRenamed("v", "a"),
                        ["k", "a"])
                  .join(members.withColumnRenamed("v", "b"),
                        ["k", "b"])
                  .groupBy("k")
                  .agg(F.count(F.lit(1)).cast("bigint")
                       .alias("n_club_edges")))
    phi = ("CASE WHEN n_members < 2 THEN CAST(NULL AS DOUBLE) "
           "ELSE 2.0 * n_club_edges "
           "/ (CAST(n_members AS DOUBLE) * (n_members - 1)) END")
    return (kf.join(n_m, "k", "left").na.fill({"n_members": 0})
            .join(club_edges, "k", "left")
            .na.fill({"n_club_edges": 0})
            .select(F.col("k").cast("int").alias("k"),
                    "n_members", "n_club_edges",
                    (F.round(F.expr(phi), 6) + F.lit(0.0))
                    .alias("phi")))


def local_bridges(lineitem: DataFrame) -> DataFrame:
    """Local bridges of the capped co-purchase graph (Granovetter
    1973; Easley & Kleinberg ch. 3): edges whose endpoints share NO
    common neighbor — triangle support 0, the weak ties that are the
    only local route between their endpoints' neighborhoods. The
    edge-level complement of `clustering_coefficients` (vertex
    closure) and `ktruss_edges` (which keeps the OPPOSITE edges).

    Support via the same degree-ordered oriented wedge enumeration
    as the k-truss rework (each triangle counted once, O(m^1.5) join
    work), then an anti-join: edges absent from the support frame
    have zero triangles. One summary column marks whether either
    endpoint is degree-1 (a pendant edge — trivially a local
    bridge). Output: (a, b, deg_a, deg_b, pendant)."""
    edges = copart_edges(lineitem).localCheckpoint(eager=False)
    deg = (edges.select(F.col("a").alias("v"))
           .unionAll(edges.select(F.col("b").alias("v")))
           .groupBy("v").agg(F.count(F.lit(1)).alias("dg")))
    rank = deg.select(
        "v", (F.col("dg") * F.lit(1 << 32) + F.col("v")).alias("rk"))
    d = (edges
         .join(rank.select(F.col("v").alias("a"),
                           F.col("rk").alias("ra")), "a")
         .join(rank.select(F.col("v").alias("b"),
                           F.col("rk").alias("rb")), "b")
         .select(F.when(F.col("ra") < F.col("rb"), F.col("a"))
                 .otherwise(F.col("b")).alias("u"),
                 F.when(F.col("ra") < F.col("rb"), F.col("b"))
                 .otherwise(F.col("a")).alias("w"),
                 F.greatest("ra", "rb").alias("rw"))
         .localCheckpoint(eager=False))
    # pinned wedge-join width — the ktruss_edges rationale verbatim
    # (AQE coalesces the byte-tiny self-join input to one partition and
    # the wedge fan-out ran single-task, 22.9 s of the 29.8 s wall)
    n_shuffle = int(lineitem.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"))
    w1 = (d.select("u", F.col("w").alias("x"), F.col("rw").alias("rx"))
          .repartition(n_shuffle, F.col("u")))
    w2 = (d.select("u", F.col("w").alias("y"), F.col("rw").alias("ry"))
          .repartition(n_shuffle, F.col("u")))
    closing = d.select(F.col("u").alias("x"), F.col("w").alias("y"))
    tri = (w1.join(w2, "u")
           .where(F.col("rx") < F.col("ry"))
           .join(closing, ["x", "y"]))
    supported = (tri.select(F.explode(F.array(
        F.struct(F.least("u", "x").alias("a"),
                 F.greatest("u", "x").alias("b")),
        F.struct(F.least("u", "y").alias("a"),
                 F.greatest("u", "y").alias("b")),
        F.struct(F.least("x", "y").alias("a"),
                 F.greatest("x", "y").alias("b")))).alias("e"))
        .select("e.a", "e.b").distinct())
    return (edges.join(supported, ["a", "b"], "left_anti")
            .join(deg.select(F.col("v").alias("a"),
                             F.col("dg").alias("deg_a")), "a")
            .join(deg.select(F.col("v").alias("b"),
                             F.col("dg").alias("deg_b")), "b")
            .select(F.col("a").cast("bigint").alias("a"),
                    F.col("b").cast("bigint").alias("b"),
                    F.col("deg_a").cast("bigint").alias("deg_a"),
                    F.col("deg_b").cast("bigint").alias("deg_b"),
                    ((F.col("deg_a") == 1) | (F.col("deg_b") == 1))
                    .alias("pendant")))


def brand_assortativity(lineitem: DataFrame,
                        part: DataFrame) -> DataFrame:
    """Categorical (brand) assortativity of the capped co-purchase
    graph (Newman 2003, eq. 2): r = (Σ_i e_ii − Σ_i a_i²) /
    (1 − Σ_i a_i²) over the brand mixing matrix — do parts co-sell
    with their OWN brand (homophily, r → 1) or across brands
    (r < 0)? The attribute counterpart of `degree_assortativity`
    (which asks the same question of degrees).

    Exact integers end to end: over the symmetric edge-end list,
    s = same-brand directed ends, c_i = per-brand end counts,
    m2 = total ends; cross-multiplying the textbook fractions gives
    r = (s·m2 − Σc_i²) / (m2² − Σc_i²) — one division of exact
    decimal(38) integers, 6dp, NULL when every end carries one brand
    (denominator 0). The brand table is a broadcast dimension join.

    Output: (n_edges, n_brands, same_brand_edges, assortativity)."""
    edges = copart_edges(lineitem).localCheckpoint(eager=False)
    br = part.select(F.col("p_partkey"), F.col("p_brand"))
    lab = (edges
           .join(F.broadcast(br.select(
               F.col("p_partkey").alias("a"),
               F.col("p_brand").alias("ba"))), "a")
           .join(F.broadcast(br.select(
               F.col("p_partkey").alias("b"),
               F.col("p_brand").alias("bb"))), "b"))
    d38 = "decimal(38,0)"
    base = lab.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_edges"),
        F.sum((F.col("ba") == F.col("bb")).cast("bigint"))
        .cast("bigint").alias("same"))
    ends = (lab.select(F.col("ba").alias("br"))
            .unionAll(lab.select(F.col("bb").alias("br")))
            .groupBy("br")
            .agg(F.count(F.lit(1)).cast("bigint").alias("c")))
    endagg = ends.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_brands"),
        F.sum(F.expr(f"CAST(c AS {d38}) * c")).cast(d38).alias("sc2"),
        F.sum("c").cast("bigint").alias("m2"))
    r = ("CASE WHEN CAST(m2 AS DECIMAL(38,0)) * m2 = sc2 "
         "THEN CAST(NULL AS DOUBLE) ELSE "
         "(CAST(2 * same AS DOUBLE) * m2 - CAST(sc2 AS DOUBLE)) "
         "/ (CAST(m2 AS DOUBLE) * m2 - CAST(sc2 AS DOUBLE)) END")
    return (base.crossJoin(F.broadcast(endagg))
            .select("n_edges", "n_brands",
                    F.col("same").alias("same_brand_edges"),
                    (F.round(F.expr(r), 6) + F.lit(0.0))
                    .alias("assortativity")))
