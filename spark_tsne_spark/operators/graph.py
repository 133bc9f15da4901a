"""Graph analytics over candidate-pair edge sets.

The dedup pipeline produces graphs (near-dup candidate pairs); beyond
connected components (`operators/dedup.py::duplicate_clusters`), a
training-data pipeline uses *centrality* on those graphs — e.g. pick
the most-connected member of a duplicate cluster as its canonical
representative, or score boilerplate hubs. `pagerank` here is the
classic iterative power method expressed as DataFrame joins:

- per iteration: ONE equi-join (ranks ⋈ edges on src — both sides
  hash-partitioned on the node id, so consecutive iterations reuse
  the shuffle layout) + ONE groupBy(dst) sum with map-side partial
  aggregation;
- a fixed iteration count keeps the computation a deterministic
  function of the edge set (the DuckDB oracle replays the identical
  recursion), and `localCheckpoint` every few rounds cuts lineage so
  plan depth stays O(checkpoint interval), the same discipline as the
  connected-components loop.

Scale: each iteration's cost is |edges| join work + |nodes| aggregate
rows — linear, shuffle-bounded, no driver state beyond the loop
counter. At 100 TB the graph is the candidate-pair set (orders of
magnitude smaller than the corpus by construction of the bucketed
candidate generators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: Edge-count gate below which the power method runs on the driver
#: (one Arrow pull of the (src, dst) pairs + numpy bincount loop) —
#: the SAME production contract as duplicate_clusters' union-find
#: gate: a 5M-edge graph is ~80 MB of int64 pairs, and iterating it
#: driver-side costs one job instead of num_iters x 3 shuffle stages
#: whose per-stage dispatch dominates at this size. Above the gate
#: the distributed join loop runs (edges pre-partitioned on src so
#: the big side never re-shuffles).
DRIVER_EDGE_CAP = 5_000_000


def symmetrize_edges(pairs: DataFrame, i: str = "i", j: str = "j") -> DataFrame:
    """Undirected (i, j) candidate pairs → directed edge list with
    both orientations, deduplicated."""
    a = pairs.select(F.col(i).alias("src"), F.col(j).alias("dst"))
    b = pairs.select(F.col(j).alias("src"), F.col(i).alias("dst"))
    return a.unionByName(b).distinct()


def pagerank(
    edges: DataFrame,
    num_iters: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 5,
    driver_edge_cap: int = DRIVER_EDGE_CAP,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list:
    ``(node, rank)`` after ``num_iters`` power-method steps from the
    uniform start, ranks summing to ~1 over the graph's nodes.

    Nodes are the union of endpoints. Dangling nodes (no out-edges)
    redistribute their mass uniformly each step — the standard
    formulation — via one tiny scalar aggregate joined back as a
    broadcast, so the result is the true power method, not the
    leak-mass approximation. Deterministic given (edges, num_iters,
    damping): the oracle replays the same recursion in SQL.

    Two physical strategies behind one semantics (mirroring
    ``duplicate_clusters``' union-find gate):

    - ``m <= driver_edge_cap`` (default 5M): ONE Arrow pull of the
      (src, dst) pairs, then a numpy ``bincount`` power loop on the
      driver — index-ordered summation over a sorted node table, so
      the result is deterministic and engine-independent to float64
      round-off. At this size the distributed loop's cost is pure
      stage dispatch (measured ~0.7 s/iteration for a 4k-node graph
      at sf0.1), not compute.
    - above the cap: the distributed join loop, with the edge list
      persisted HASH-PARTITIONED ON ``src`` at the loop width —
      without that, the cached ``distinct()`` layout (hashed on the
      (src, dst) pair) forces a re-shuffle of the BIG side every
      iteration; pre-partitioning makes each iteration shuffle only
      the |nodes|-sized rank table. Pass ``driver_edge_cap=0`` to
      force this path (tests pin driver ≡ distributed).

    Concurrency note: the distributed loop temporarily narrows the
    session's ``spark.sql.shuffle.partitions`` (restored in a
    finally) — other queries planned on the same SparkSession DURING
    a pagerank call would plan at the narrowed width. This engine's
    driver loops are single-threaded by design; on a shared session,
    run pagerank serially or pin widths explicitly.
    """
    if num_iters < 1:
        raise ValueError(f"num_iters must be >= 1, got {num_iters}")
    # Materialize the edge list once: every use reads the persisted
    # edges instead of re-deriving them from their (possibly
    # expensive — e.g. LSH candidate generation) upstream plan.
    e0 = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).persist()
    m = e0.count()
    if m <= driver_edge_cap:
        try:
            return _pagerank_driver(e0, num_iters, damping)
        finally:
            e0.unpersist()
    # Size the LOOP's shuffle width to the graph, not the session
    # default: every iteration runs 2-3 shuffles, and on a small
    # graph a 32-wide session spends more wall-clock dispatching
    # tasks than computing (measured 2x at sf0.1's 232k edges; AQE
    # coalesces reducers but not the per-stage planning/dispatch).
    # ~500k edges per partition, clamped to the session's
    # parallelism, so a billion-edge graph still fans out fully.
    spark = edges.sparkSession
    width = max(
        4,
        min(
            spark.sparkContext.defaultParallelism,
            int(m // 500_000) + 4,
        ),
    )
    # Re-persist partitioned on src: the per-iteration contribution
    # join requires hash(src) distribution, and the persisted layout
    # satisfies it, so ONLY the thin rank rows shuffle each step.
    # Costs one extra (cached-input) shuffle up front; saves
    # num_iters shuffles of the edge list — the dominant term at
    # scale, where edges are orders of magnitude wider than ranks.
    e = e0.repartition(width, "src").persist()
    e.count()
    e0.unpersist()
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(width))
    try:
        return _pagerank_loop(
            e, num_iters, damping, checkpoint_every
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


def _pagerank_driver(
    e: DataFrame, num_iters: int, damping: float
) -> DataFrame:
    """Driver-side power method for gate-sized graphs: identical
    semantics to ``_pagerank_loop`` (uniform start over the endpoint
    union, out-degree contribution split, uniform dangling-mass
    redistribution), summed via ``np.bincount`` in node-index order
    over a SORTED node table — deterministic across runs and
    partitionings."""
    import numpy as np
    import pandas as pd

    pdf = e.toPandas()
    spark = e.sparkSession
    node_field = e.schema["src"].dataType
    if len(pdf) == 0:
        from pyspark.sql.types import DoubleType, StructField, StructType

        return spark.createDataFrame(
            [],
            StructType(
                [
                    StructField("node", node_field, True),
                    StructField("rank", DoubleType(), True),
                ]
            ),
        )
    nodes = np.unique(
        np.concatenate([pdf["src"].to_numpy(), pdf["dst"].to_numpy()])
    )  # sorted — fixes the summation and output order
    n = len(nodes)
    si = np.searchsorted(nodes, pdf["src"].to_numpy())
    di = np.searchsorted(nodes, pdf["dst"].to_numpy())
    deg = np.bincount(si, minlength=n).astype(np.float64)
    dangling = deg == 0.0
    safe_deg = np.where(dangling, 1.0, deg)
    rank = np.full(n, 1.0 / n, dtype=np.float64)
    for _ in range(num_iters):
        contrib = rank / safe_deg
        s = np.bincount(di, weights=contrib[si], minlength=n)
        dm = float(rank[dangling].sum())
        rank = (1.0 - damping) / n + damping * (s + dm / n)
    return spark.createDataFrame(
        pd.DataFrame({"node": nodes, "rank": rank})
    )


def _pagerank_loop(
    e: DataFrame,
    num_iters: int,
    damping: float,
    checkpoint_every: int,
) -> DataFrame:
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    ).persist()
    n = nodes.count()
    if n == 0:
        out = nodes.withColumn("rank", F.lit(0.0)).localCheckpoint(eager=True)
        nodes.unpersist()
        e.unpersist()
        return out
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    # out-degree per node (0 for dangling), partitioned once on the
    # node id; every iteration's join reuses this layout.
    nd = (
        nodes.join(deg, nodes["node"] == deg["src"], "left")
        .select("node", F.coalesce("deg", F.lit(0)).alias("deg"))
        .persist()
    )
    nd.count()

    # Dangling fast path: a symmetrized pair graph has out-degree >= 1
    # everywhere, so the per-iteration dangling-mass aggregate + scalar
    # broadcast (2 extra stages x num_iters) can be skipped entirely —
    # one driver-side count decides, like AQE deciding a join strategy
    # from runtime stats.
    has_dangling = nd.where(F.col("deg") == 0).count() > 0

    ranks = nd.select("node", "deg", F.lit(1.0 / n).alias("rank"))
    for it in range(num_iters):
        contribs = (
            ranks.where(F.col("deg") > 0)
            .join(e, ranks["node"] == e["src"])
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        joined = nd.join(contribs, nd["node"] == contribs["dst"], "left")
        if has_dangling:
            # mass leaving dangling nodes, redistributed uniformly
            dangling = ranks.where(F.col("deg") == 0).agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm")
            )
            rank_expr = F.lit((1.0 - damping) / n) + F.lit(damping) * (
                F.coalesce("s", F.lit(0.0)) + F.col("dm") / n
            )
            joined = joined.crossJoin(F.broadcast(dangling))
        else:
            rank_expr = F.lit((1.0 - damping) / n) + F.lit(damping) * F.coalesce(
                "s", F.lit(0.0)
            )
        ranks = joined.select("node", "deg", rank_expr.alias("rank"))
        if (it + 1) % checkpoint_every == 0 and it + 1 < num_iters:
            ranks = ranks.localCheckpoint(eager=True)
    # Materialize the final ranks (cutting lineage back to the cached
    # e/nodes/nd), then release the iteration caches — otherwise every
    # pagerank call grows the session cache for its lifetime.
    out = ranks.select("node", "rank").localCheckpoint(eager=True)
    for cached in (nd, nodes, e):
        cached.unpersist()
    return out


def label_propagation(
    edges: DataFrame,
    num_iters: int = 4,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 4,
    driver_edge_cap: int = DRIVER_EDGE_CAP,
) -> DataFrame:
    """Synchronous label propagation over a directed edge list:
    ``(node, label)`` after ``num_iters`` rounds from the identity
    labeling. Each round, every node with at least one in-neighbor
    takes the MOST FREQUENT label among its in-neighbors (ties →
    smallest label); nodes without in-edges keep their label. The
    synchronous schedule plus the total tie-break makes the result a
    deterministic function of (edges, num_iters) — unlike classic
    async LPA — so the DuckDB oracle can replay the identical
    recursion. On a symmetrized near-dup pair graph this yields
    density-based communities: unlike connected components, a thin
    bridge between two dense duplicate cliques does NOT merge them.

    Physical strategy mirrors :func:`pagerank`: under
    ``driver_edge_cap`` (default 5M edges) one Arrow pull + a numpy
    run-length mode loop on the driver; above it, a distributed loop
    — per round ONE join against the src-partitioned edge list (only
    the thin label rows shuffle), one (node, label) count with
    map-side partials, and a per-node top-1 window whose partitions
    are single nodes (skew-bounded by in-degree).
    """
    if num_iters < 1:
        raise ValueError(f"num_iters must be >= 1, got {num_iters}")
    e0 = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).persist()
    m = e0.count()
    if m <= driver_edge_cap:
        try:
            return _label_prop_driver(e0, num_iters)
        finally:
            e0.unpersist()
    spark = edges.sparkSession
    width = max(
        4,
        min(
            spark.sparkContext.defaultParallelism,
            int(m // 500_000) + 4,
        ),
    )
    e = e0.repartition(width, "src").persist()
    e.count()
    e0.unpersist()
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(width))
    try:
        return _label_prop_loop(e, num_iters, checkpoint_every)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


def _label_prop_loop(
    e: DataFrame, num_iters: int, checkpoint_every: int
) -> DataFrame:
    from pyspark.sql import Window

    # eager localCheckpoint (not just persist): the label table
    # derives FROM e, and the per-iteration join against e would
    # otherwise be an ambiguous self-join (shared attribute ids)
    labels = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )
    rank = Window.partitionBy("node").orderBy(F.desc("c"), "label")
    for it in range(num_iters):
        # string-qualified aliases: labels derives from e every round,
        # so unaliased column refs would be ambiguous self-join refs
        nbr = (
            labels.alias("l")
            .join(e.alias("g"), F.col("l.node") == F.col("g.src"))
            .select(F.col("g.dst").alias("node"), F.col("l.label").alias("label"))
        )
        cnt = nbr.groupBy("node", "label").agg(F.count("*").alias("c"))
        best = (
            cnt.withColumn("_rn", F.row_number().over(rank))
            .where(F.col("_rn") == 1)
            .select("node", F.col("label").alias("_new"))
        )
        labels = (
            labels.join(best, "node", "left")
            .select("node", F.coalesce("_new", "label").alias("label"))
        )
        if (it + 1) % checkpoint_every == 0 and it + 1 < num_iters:
            labels = labels.localCheckpoint(eager=True)
    out = labels.localCheckpoint(eager=True)
    e.unpersist()
    return out


def _label_prop_driver(e: DataFrame, num_iters: int) -> DataFrame:
    """Driver-side synchronous LPA for gate-sized graphs: identical
    semantics to ``_label_prop_loop``. Labels are node INDICES into
    the sorted node table during the loop (mode + min-tie-break on
    indices equals mode on values because the table is sorted),
    mapped back to values at the end."""
    import numpy as np
    import pandas as pd

    pdf = e.toPandas()
    spark = e.sparkSession
    node_field = e.schema["src"].dataType
    if len(pdf) == 0:
        from pyspark.sql.types import StructField, StructType

        return spark.createDataFrame(
            [],
            StructType(
                [
                    StructField("node", node_field, True),
                    StructField("label", node_field, True),
                ]
            ),
        )
    nodes = np.unique(
        np.concatenate([pdf["src"].to_numpy(), pdf["dst"].to_numpy()])
    )
    n = len(nodes)
    si = np.searchsorted(nodes, pdf["src"].to_numpy())
    di = np.searchsorted(nodes, pdf["dst"].to_numpy())
    lab = np.arange(n, dtype=np.int64)
    for _ in range(num_iters):
        nl = lab[si]
        # run-length count of (dst, neighbor-label) pairs: lexsort
        # puts equal pairs adjacent with labels ascending inside each
        # dst, so "first run of the best count" == min-label tie-break
        order = np.lexsort((nl, di))
        d_s, l_s = di[order], nl[order]
        change = np.empty(len(d_s), dtype=bool)
        change[0] = True
        change[1:] = (d_s[1:] != d_s[:-1]) | (l_s[1:] != l_s[:-1])
        starts = np.flatnonzero(change)
        counts = np.diff(np.append(starts, len(d_s)))
        rd, rl = d_s[starts], l_s[starts]
        # per dst: argmax count with ties to the SMALLEST label —
        # stable sort by count desc within dst keeps label order for
        # equal counts, then the first run per dst wins
        sel = np.lexsort((-counts, rd))
        rd2, rl2 = rd[sel], rl[sel]
        first = np.flatnonzero(
            np.append(True, rd2[1:] != rd2[:-1])
        )
        new_lab = lab.copy()
        new_lab[rd2[first]] = rl2[first]
        lab = new_lab
    return spark.createDataFrame(
        pd.DataFrame({"node": nodes, "label": nodes[lab]})
    )


def canonical_by_pagerank(
    pairs: DataFrame,
    num_iters: int = 10,
    i: str = "i",
    j: str = "j",
) -> DataFrame:
    """Centrality-based canonical selection over the near-dup pair
    graph: ``(node, rank)`` where rank is PageRank on the symmetrized
    pair graph — the highest-ranked member of each duplicate cluster
    is the best-connected (most representative) document, a
    cluster-aware alternative to min-id canonical selection."""
    return pagerank(symmetrize_edges(pairs, i, j), num_iters=num_iters)


def triangle_counts(pairs: DataFrame, src: str = "i", dst: str = "j") -> DataFrame:
    """Per-node triangle counts over an undirected pair list:
    ``(node, n_triangles)`` for every node in at least one triangle —
    the local clustering signal over the near-dup graph (a node whose
    neighbors also match *each other* sits inside a dense duplicate
    clique; a high-degree node with zero triangles is a hub/template
    artifact).

    Scale shape — DEGREE-ORIENTED enumeration, not the naive wedge
    join: every edge is oriented from its lower-(degree, id) endpoint
    to the higher one, so each triangle is generated from exactly one
    node (its lowest-rank corner) and the wedge fan-out per node is
    bounded by its OUT-degree in the orientation — O(sqrt(m)) even
    for a star's center, making the wedge volume O(m^1.5) worst-case
    instead of sum(deg^2). The naive self-join explodes on exactly
    the hot nodes a dedup graph has (mega-clique templates). Three
    node-keyed equi-joins + one map-side-combined groupBy; no driver
    state.
    """
    e = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .distinct()
    )
    # e is referenced four times below (degree union ×2, the
    # orientation join, the closing-edge set) and each reference
    # re-expands the whole upstream candidate pipeline — 215 plan ops
    # / 108 HashAggregate at the bench's LSH-candidate input (guide
    # §3.3). Materialize the bounded distinct edge list once — exactly
    # the table a production dedup graph persists before analytics.
    # Measured: 3.667 → 3.188 s mean (6-pair interleaved A/B, sf0.1).
    e = e.localCheckpoint(eager=False)
    deg = (
        e.select(F.col("u").alias("n"))
        .unionByName(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    # rank = (degree, id): total order; orient edges low -> high
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    ranked = e.join(du, "u").join(dv, "v")
    lower_u = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = ranked.select(
        F.when(lower_u, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(lower_u, F.col("v")).otherwise(F.col("u")).alias("t"),
    )
    # wedges from each source's out-neighborhood (t1 < t2 by id to
    # emit each unordered wedge once), closed by the edge between the
    # two tips IN EITHER orientation
    w1 = o.select(F.col("s"), F.col("t").alias("t1"))
    w2 = o.select(F.col("s"), F.col("t").alias("t2"))
    wedges = w1.join(w2, "s").where(F.col("t1") < F.col("t2"))
    # The closing-edge set IS e: orientation only reorders each
    # (u, v) pair, so least/greatest over o reconstructs the already-
    # distinct edge list — join e directly instead of re-deriving it
    # through the degree joins + another distinct.
    closing = e.select(F.col("u").alias("t1"), F.col("v").alias("t2"))
    tris = wedges.join(closing, ["t1", "t2"])
    return (
        tris.select(
            F.explode(F.array("s", "t1", "t2")).alias("node")
        )
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )


def degree_assortativity(
    pairs: DataFrame, src: str = "i", dst: str = "j", decimals: int = 6
) -> DataFrame:
    """Degree assortativity (Newman 2002): the Pearson correlation of
    the degrees at the two ends of every edge — positive when hubs
    attach to hubs, negative when hubs attach to leaves. ``pairs`` is
    an undirected edge list with each edge appearing ONCE.

    Computed over the SYMMETRIZED orientation set (each edge counted
    both ways), which makes the two endpoint marginals identical, so
    Pearson collapses to (n·sxy − sx²)/(n·sxx − sx²) — a ratio of two
    exact integers. Degrees are integers, the products are accumulated
    in DECIMAL(38,0) (deg ≤ 1e6 on a 1e12-edge graph puts sum(x·y)
    near 1e18·1e6 — past int64), and the ONLY float is the final
    rounded division. Plan: one degree aggregation, two equi joins of
    the edge list against the broadcast-or-shuffled degree table, one
    global agg — no quadratic stage, no driver state.

    Returns one row: ``n_directed, sx, sxx, sxy`` (accumulated in
    decimal, emitted as BIGINT — callers with >int64 sums should read
    the ratio, not the raw moments) plus ``assortativity`` (double,
    rounded). A degree-regular graph has zero endpoint variance — the
    0/0 ratio comes back NULL (try_divide), the documented degenerate
    case.
    """
    e = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    # sym is referenced three times (degree agg + both join sides'
    # lineage) and each reference re-expands the upstream candidate
    # pipeline twice (the union) — same §3.3 truncation as
    # triangle_counts; sym is the bounded directed edge list.
    # Measured: 1.544 → 1.219 s mean (6-pair interleaved A/B, sf0.1).
    sym = sym.localCheckpoint(eager=False)
    deg = sym.groupBy("u").agg(F.count("*").cast("long").alias("d"))
    du = deg.select(F.col("u"), F.col("d").alias("dx"))
    dv = deg.select(F.col("u").alias("v"), F.col("d").alias("dy"))
    j = sym.join(du, "u").join(dv, "v")
    s = j.agg(
        F.count("*").cast("long").alias("n_directed"),
        F.sum(F.col("dx").cast("decimal(38,0)")).alias("sx"),
        F.sum(
            (F.col("dx").cast("decimal(38,0)") * F.col("dx")).cast(
                "decimal(38,0)"
            )
        ).alias("sxx"),
        F.sum(
            (F.col("dx").cast("decimal(38,0)") * F.col("dy")).cast(
                "decimal(38,0)"
            )
        ).alias("sxy"),
    )
    return s.select(
        "n_directed",
        F.col("sx").cast("long").alias("sx"),
        F.col("sxx").cast("long").alias("sxx"),
        F.col("sxy").cast("long").alias("sxy"),
        F.round(
            F.try_divide(
                F.col("n_directed").cast("double")
                * F.col("sxy").cast("double")
                - F.col("sx").cast("double") * F.col("sx").cast("double"),
                F.col("n_directed").cast("double")
                * F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx").cast("double"),
            ),
            decimals,
        ).alias("assortativity"),
    )
