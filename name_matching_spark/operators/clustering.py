"""Transitive clustering: connected components on DataFrames.

North-rule extension (NOT in the reference, whose closest artifact is the
pair-uniqueness constraint ``src/db/models.py:189-191``): matched pairs are
edges; components get stable ``cluster_id = min(member_id)``.

Algorithm: alternating large-star / small-star label propagation
(Kiveris et al., "Connected Components in MapReduce and Beyond", SOCC'14) —
O(log^2 n) rounds, each round two shuffles, no GraphX dependency, scales to
10^12 edges because per-round state is just the edge list. ``localCheckpoint``
every few rounds truncates lineage so plans don't blow up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "connected_components",
    "assign_clusters",
    "constrained_clusters",
    "select_canonical",
    "golden_record",
    "group_linkage",
    "orient_edges_by_degree",
    "triangle_count",
    "clustering_coefficient",
    "pagerank",
    "k_truss",
    "cluster_depths",
]


def select_canonical(
    records: "DataFrame",
    clusters: "DataFrame",
    order_cols: list,
    id_col: str = "record_id",
    cluster_col: str = "cluster_id",
) -> "DataFrame":
    """Golden-record survivorship: one canonical row per entity cluster.

    ``clusters`` maps ``id_col`` -> ``cluster_col`` (the
    :func:`assign_clusters` output); the survivor is the first record per
    cluster under ``order_cols`` (caller supplies a DETERMINISTIC total
    order — end with the id column). Output: the survivor's full record +
    ``cluster_id`` + ``n_members``. One join + one window — shuffles on
    cluster id only.
    """
    from pyspark.sql.window import Window

    joined = records.join(clusters, id_col)
    w = Window.partitionBy(cluster_col).orderBy(*order_cols)
    n = Window.partitionBy(cluster_col)
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .withColumn("n_members", F.count("*").over(n))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def golden_record(
    records: DataFrame,
    clusters: DataFrame,
    value_cols: list,
    id_col: str = "record_id",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Attribute-level survivorship (the fusion step after
    :func:`select_canonical`'s row-level pick): per cluster and per field
    INDEPENDENTLY, the golden value is the most frequent non-null value,
    ties broken by the smaller value — a deterministic majority-vote merge,
    so the golden record can mix fields from different source rows.

    Values are compared/emitted as strings (pass string columns, or accept
    Spark cast semantics for others). Fields that are null across the whole
    cluster emit no row. Output (long format, one row per surviving value):
    ``(cluster_col, field, golden_value, n_votes)``.

    Scale shape: one explode to (cluster, field, value) — rows x |fields|,
    still narrow — then two keyed aggregations ending in ``min_by`` over
    ``struct(-n, value)``; everything map-side combines, no window over the
    row stream.
    """
    joined = records.join(clusters, id_col)
    long = joined.select(
        F.col(cluster_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("field"),
                        F.col(c).cast("string").alias("value"),
                    )
                    for c in value_cols
                ]
            )
        ).alias("_fv"),
    ).select(cluster_col, "_fv.field", "_fv.value").filter(
        F.col("value").isNotNull()
    )
    counted = long.groupBy(cluster_col, "field", "value").agg(
        F.count(F.lit(1)).alias("_n")
    )
    return (
        counted.groupBy(cluster_col, "field")
        .agg(
            F.min_by(
                F.struct(
                    F.col("value").alias("golden_value"),
                    F.col("_n").alias("n_votes"),
                ),
                F.struct((-F.col("_n")).alias("a"), F.col("value").alias("b")),
            ).alias("_g")
        )
        .select(
            cluster_col,
            "field",
            F.col("_g.golden_value").alias("golden_value"),
            F.col("_g.n_votes").cast("long").alias("n_votes"),
        )
    )


def _canonical(edges: DataFrame) -> DataFrame:
    """Undirected edge set, self-loops dropped, (small, large) orientation."""
    return (
        edges.select(
            F.least(F.col("u"), F.col("v")).alias("u"),
            F.greatest(F.col("u"), F.col("v")).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect every strictly-larger neighbor to
    m = min(N(u) ∪ {u})."""
    nbrs = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (
        nbrs.groupBy("u")
        .agg(F.min("v").alias("mv"))
        .select("u", F.least(F.col("mv"), F.col("u")).alias("m"))
    )
    return (
        nbrs.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect every neighbor v <= u (and u itself) to
    m = min({v in N(u): v <= u} ∪ {u})."""
    nbrs = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    small = nbrs.filter(F.col("v") <= F.col("u"))
    mins = (
        small.groupBy("u")
        .agg(F.min("v").alias("mv"))
        .select("u", F.least(F.col("mv"), F.col("u")).alias("m"))
    )
    out = small.join(mins, "u").select(F.col("v").alias("u"), F.col("m").alias("v"))
    centers = mins.select(F.col("u"), F.col("m").alias("v"))
    return out.union(centers)


# cap for the driver union-find fast path: canonical (deduplicated) edges
# collected to the driver (~16 MB of int64 pairs at the default, and a
# bounded ~1-2 s of driver CPU worst case). Same
# adaptive pattern as the dict-encoded scoring and vector-broadcast paths:
# small graphs skip the O(log n)-round star fixpoint (each round is several
# fixed-overhead Spark jobs); big graphs keep the distributed shape.
CC_DRIVER_EDGE_CAP = 1_000_000


def _driver_union_find(cur: DataFrame) -> DataFrame:
    """(record_id, cluster_id) via union-find over a collected canonical
    edge list — labels are component minima (the smaller root always wins
    the union), identical to the star fixpoint's output for ANY edge set;
    `<` on ids matches F.least/F.greatest for both numeric and string ids."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for u, v in cur.collect():
        if u not in parent:
            parent[u] = u
        if v not in parent:
            parent[v] = v
        ru, rv = find(u), find(v)
        if ru != rv:
            if rv < ru:
                ru, rv = rv, ru
            parent[rv] = ru

    id_type = cur.schema["u"].dataType
    from pyspark.sql.types import StructField, StructType

    schema = StructType(
        [StructField("record_id", id_type), StructField("cluster_id", id_type)]
    )
    spark = cur.sparkSession
    return spark.createDataFrame(
        [(x, find(x)) for x in parent], schema
    )


def connected_components(
    edges: DataFrame,
    src: str = "id1",
    dst: str = "id2",
    max_iterations: int = 50,
    checkpoint_every: int = 1,
    driver_fast_path: bool | None = None,
) -> DataFrame:
    """Edges -> (record_id, cluster_id) for every node appearing in an edge;
    cluster_id = minimum member id of the component.

    ``driver_fast_path`` (None = auto when the canonical edge count fits
    ``CC_DRIVER_EDGE_CAP``): small edge lists are resolved by a driver-side
    union-find — bit-identical labels (parity-tested), no per-round job
    overhead. The star fixpoint below is the 10^12-edge scale shape and
    remains the automatic fallback."""
    def _stats(df: DataFrame) -> tuple:
        row = df.agg(
            F.count("*").alias("n"),
            F.bit_xor(
                F.xxhash64(F.col("u").cast("string"), F.col("v").cast("string"))
            ).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    cur = _canonical(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    ).localCheckpoint()
    prev = _stats(cur)
    if driver_fast_path is None:
        driver_fast_path = prev[0] <= CC_DRIVER_EDGE_CAP
    elif driver_fast_path and prev[0] > CC_DRIVER_EDGE_CAP:
        raise ValueError("edge list exceeds CC_DRIVER_EDGE_CAP")
    if driver_fast_path:
        return _driver_union_find(cur)

    for it in range(max_iterations):
        stepped = _canonical(_small_star(_large_star(cur)))
        # each star step references its input several times (symmetrize
        # unions + joins) — without truncation the logical plan grows
        # EXPONENTIALLY in iterations and OOMs the driver during analysis;
        # default is therefore to checkpoint every round (the round is
        # materialized for the convergence stats anyway)
        if (it + 1) % checkpoint_every == 0:
            stepped = stepped.localCheckpoint()
        # convergence: identical canonical edge set between rounds, detected
        # by count + order-insensitive checksum (a collision merely costs one
        # extra round — the star fixpoint is stable under further rounds)
        now = _stats(stepped)
        cur = stepped
        if now == prev:
            break
        prev = now

    # converged: stars centered at component minima; canonical orientation
    # (u < v) therefore stores (root, member). Roots map to themselves.
    members = cur.select(F.col("v").alias("record_id"), F.col("u").alias("cluster_id"))
    roots = cur.select(F.col("u").alias("record_id"), F.col("u").alias("cluster_id")).distinct()
    return members.union(roots).groupBy("record_id").agg(
        F.min("cluster_id").alias("cluster_id")
    )


def assign_clusters(
    records: DataFrame,
    matches: DataFrame,
    id_col: str = "record_id",
    src: str = "id1",
    dst: str = "id2",
) -> DataFrame:
    """Attach cluster_id to every record: matched components get
    min-member-id labels; unmatched records are singleton clusters of
    themselves."""
    comps = connected_components(matches, src=src, dst=dst)
    return (
        records.join(comps, records[id_col] == comps["record_id"], "left")
        .drop(comps["record_id"])
        .withColumn("cluster_id", F.coalesce(F.col("cluster_id"), F.col(id_col)))
    )


def group_linkage(
    member_pairs: DataFrame,
    membership: DataFrame,
    id_col: str = "record_id",
    group_col: str = "group_id",
    score_col: str = "score",
) -> DataFrame:
    """Group-level linkage (household matching, On & Elmacioglu-style):
    lift record-level match evidence to pairs of GROUPS. A matched record
    pair whose two records belong to different groups is one cross-group
    link; per unordered group pair this emits the link count, the best
    member-level score, and a size-normalized strength
    ``n_links / (|g1| * |g2|)`` as exact integer ppm.

    Distributed shape: two equi-joins on the record id attach group labels
    to the (already blocked) pair stream, one groupBy on the oriented group
    pair aggregates, and the size census joins on the group key — every
    stage keyed, nothing quadratic, ``max`` is order-independent so doubles
    stay engine-exact.

    Output: ``g1, g2, n_links, max_score, strength_ppm`` with ``g1 < g2``.
    """
    m = membership.select(
        F.col(id_col).alias("_rid"), F.col(group_col).alias("_g")
    )
    linked = (
        member_pairs.join(m.withColumnRenamed("_rid", "id1").withColumnRenamed("_g", "_g1"), "id1")
        .join(m.withColumnRenamed("_rid", "id2").withColumnRenamed("_g", "_g2"), "id2")
        .filter(F.col("_g1") != F.col("_g2"))
        .select(
            F.least("_g1", "_g2").alias("g1"),
            F.greatest("_g1", "_g2").alias("g2"),
            F.col(score_col).alias("_s"),
        )
    )
    agg = linked.groupBy("g1", "g2").agg(
        F.count(F.lit(1)).alias("n_links"), F.max("_s").alias("max_score")
    )
    sizes = m.groupBy("_g").agg(F.count(F.lit(1)).alias("_n"))
    return (
        agg.join(sizes.withColumnRenamed("_g", "g1").withColumnRenamed("_n", "_n1"), "g1")
        .join(sizes.withColumnRenamed("_g", "g2").withColumnRenamed("_n", "_n2"), "g2")
        .select(
            "g1",
            "g2",
            F.col("n_links").cast("long").alias("n_links"),
            "max_score",
            F.expr(
                "CAST(n_links * 1000000 DIV (_n1 * _n2) AS BIGINT)"
            ).alias("strength_ppm"),
        )
    )


def constrained_clusters(
    records: DataFrame,
    matches: DataFrame,
    cannot_pairs: DataFrame,
    id_col: str = "record_id",
    src: str = "id1",
    dst: str = "id2",
) -> DataFrame:
    """Cannot-link constrained reclustering (the Dedupe/Zingg-style
    negative-evidence repair step): match edges directly contradicted by a
    cannot-link pair are dropped, components are recomputed, and residual
    violations — cannot pairs whose endpoints remain TRANSITIVELY connected
    through other edges — are surfaced per record instead of silently
    accepted (dropping the direct edge is a repair, not a proof; the
    violation flag is the honest remainder that goes to clerical review).

    Output: ``(id_col, cluster_id, in_violation)`` for every record —
    min-member-id cluster labels over the retained edges, singletons for
    unmatched records, ``in_violation`` = 1 when the record is an endpoint
    of a cannot pair that still shares a cluster.

    Scale shape: pair normalization + one left-anti join on the pair key
    drop the contradicted edges; the component step is the same
    large-star/small-star iteration as :func:`assign_clusters`; the
    violation check is two hash joins of the (small) cannot frame against
    the assignment. No driver loop beyond the CC fixpoint.
    """
    def _norm(df: DataFrame) -> DataFrame:
        return df.select(
            F.least(F.col(src), F.col(dst)).alias(src),
            F.greatest(F.col(src), F.col(dst)).alias(dst),
        ).distinct()

    edges = _norm(matches)
    cannot = _norm(cannot_pairs)
    kept = edges.join(cannot, [src, dst], "left_anti")
    assigned = assign_clusters(records, kept, id_col=id_col, src=src, dst=dst)
    a1 = assigned.select(F.col(id_col).alias(src), F.col("cluster_id").alias("_c1"))
    a2 = assigned.select(F.col(id_col).alias(dst), F.col("cluster_id").alias("_c2"))
    violated = (
        cannot.join(a1, src)
        .join(a2, dst)
        .filter(F.col("_c1") == F.col("_c2"))
        .select(F.explode(F.array(src, dst)).alias(id_col))
        .distinct()
        .withColumn("_viol", F.lit(1))
    )
    return (
        assigned.join(violated, id_col, "left")
        .select(
            id_col,
            "cluster_id",
            F.coalesce("_viol", F.lit(0)).cast("int").alias("in_violation"),
        )
    )


def orient_edges_by_degree(e: DataFrame) -> DataFrame:
    """Direct every canonical undirected edge ``(u, v)`` from its
    (degree, id)-smaller endpoint to the larger: the Suri & Vassilvitskii
    (WWW'11) orientation shared by :func:`triangle_count` and
    :func:`k_truss`. Out-degree of any vertex under this orientation is
    at most O(sqrt(edges)) — a total-order argument: a vertex keeps only
    neighbors of equal-or-larger degree, so a vertex with out-degree d
    has degree >= d and so do d of its neighbors, forcing >= d^2/2 edges.
    Wedge generation keyed on the orientation apex is therefore bounded
    per key regardless of hub degree. Input: ``(u, v)`` distinct,
    self-loop-free; output columns ``(a, b)``.
    """
    deg = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    return (
        e.join(deg.withColumnsRenamed({"n": "u", "d": "_du"}), "u")
        .join(deg.withColumnsRenamed({"n": "v", "d": "_dv"}), "v")
        .select(
            F.when(
                (F.col("_du") < F.col("_dv"))
                | ((F.col("_du") == F.col("_dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("a"), F.col("v").alias("b")),
            )
            .otherwise(F.struct(F.col("v").alias("a"), F.col("u").alias("b")))
            .alias("_e")
        )
        .select("_e.a", "_e.b")
    )


def triangle_count(
    edges: DataFrame,
    src: str = "id1",
    dst: str = "id2",
) -> DataFrame:
    """Per-node triangle counts over an undirected match graph — the
    structural companion to the cohesion audit: duplicate cliques are
    triangle-rich, chain-merged clusters (a-b, b-c matched but a-c not)
    are triangle-poor, so low counts inside big clusters flag transitive
    overreach.

    Classic degree-ordered orientation (Suri & Vassilvitskii, WWW'11
    "Counting Triangles and the Curse of the Last Reducer"): every edge
    is directed from its (degree, id)-smaller endpoint, wedges are
    generated only at each triangle's SMALLEST-degree vertex, and a wedge
    closes iff its (b, c) leg is an oriented edge. A degree-d hub emits
    O(d^2) wedges only if d is small by construction — the curse of the
    hot reducer never materializes, unlike the naive two-hop join.

    Output: ``(record_id, n_triangles)`` for every node with >= 1
    triangle. Self-loops and duplicate/reversed edges are normalized away
    first.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    oriented = orient_edges_by_degree(e)
    wedges = (
        oriented.alias("x")
        .join(oriented.alias("y"), "a")
        .filter(F.col("x.b") < F.col("y.b"))
        .select(F.col("a"), F.col("x.b").alias("b"), F.col("y.b").alias("c"))
    )
    # each triangle yields exactly ONE wedge (at its degree-order minimum:
    # the other two vertices have at most one out-edge inside the triangle);
    # the wedge legs are id-ordered (b < c), so the closing edge is looked
    # up in the id-canonical edge set, whichever way orientation points it
    tri = wedges.join(
        e.select(F.col("u").alias("b"), F.col("v").alias("c")), ["b", "c"]
    )
    return (
        tri.select(F.explode(F.array("a", "b", "c")).alias("record_id"))
        .groupBy("record_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )


def clustering_coefficient(
    edges: DataFrame,
    src: str = "id1",
    dst: str = "id2",
) -> DataFrame:
    """Local clustering coefficient per node of an undirected match graph:
    lcc(v) = 2 * triangles(v) / (deg(v) * (deg(v) - 1)), as an exact
    integer ppm (the engine-portable fraction idiom). The per-node
    refinement of the triangle census: inside an entity cluster, nodes
    with high degree but near-zero lcc are the transitive-merge bridges a
    reviewer should cut first, while lcc ~= 1 marks genuine duplicate
    cliques.

    Triangles come from the degree-ordered census (``triangle_count``);
    degrees from one map-side-combined aggregation of the normalized edge
    set. Every node of the graph gets a row (zero triangles included);
    degree-1 nodes emit lcc_ppm = 0. Scale shape: the triangle join is
    the only super-linear stage and inherits the orientation bound; the
    rest is O(edges).
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("record_id"))
        .unionAll(e.select(F.col("v").alias("record_id")))
        .groupBy("record_id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    tri = triangle_count(e, "u", "v")
    return (
        deg.join(tri, "record_id", "left")
        .select(
            "record_id",
            F.col("degree").cast("long").alias("degree"),
            F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles"),
            F.expr(
                "CAST(CASE WHEN degree < 2 THEN 0 ELSE "
                "2 * coalesce(n_triangles, 0) * 1000000 "
                "DIV (degree * (degree - 1)) END AS BIGINT)"
            ).alias("lcc_ppm"),
        )
    )


def pagerank(
    edges: DataFrame,
    src: str = "id1",
    dst: str = "id2",
    iterations: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank over the undirected match graph — the
    centrality audit for entity clusters: inside a cluster, the top-ranked
    node is the natural canonical-record candidate, and rank mass
    concentrating on one bridge node flags a star-shaped transitive merge.

    A FIXED iteration count (default 5) rather than a convergence test
    keeps the computation deterministic and lets the SQL oracle unroll the
    same rounds; pr_{t+1}(v) = (1-d)/N + d * sum_{u~v} pr_t(u)/deg(u).
    Every node of the edge set has degree >= 1, so there is no dangling
    mass.

    Scale shape: per round one join keyed on the node id and one map-side-
    combined aggregation — O(edges) per round, no pair blowup. The keyed
    adjacency (with source degree attached) is localCheckpoint'd once so
    the unrolled plan does not rescan/recompute it per round (the
    established small-keyed-frame pattern; ranks stay a nodes-sized
    frame).
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    und = e.select(F.col("u").alias("s"), F.col("v").alias("t")).unionAll(
        e.select(F.col("v").alias("s"), F.col("u").alias("t"))
    )
    # every frame below is re-entered by several plan arms (each round, the
    # final degree join, the totals broadcast) — checkpoint the SMALL keyed
    # frames once so the upstream edge plan (often a blocking self-join with
    # UDF normalization) is computed exactly once, not once per arm
    deg = und.groupBy("s").agg(F.count(F.lit(1)).alias("d")).localCheckpoint(
        eager=False
    )
    adj = und.join(deg, "s").localCheckpoint(eager=False)
    n_df = deg.agg(F.count(F.lit(1)).alias("_n")).localCheckpoint(eager=False)
    ranks = deg.crossJoin(F.broadcast(n_df)).select(
        F.col("s").alias("node"),
        (F.lit(1.0) / F.col("_n")).alias("r"),
    )
    for _ in range(iterations):
        contrib = (
            adj.join(ranks, adj["s"] == ranks["node"])
            .groupBy(F.col("t").alias("node"))
            .agg(F.sum(F.col("r") / F.col("d")).alias("_sum"))
        )
        ranks = contrib.crossJoin(F.broadcast(n_df)).select(
            "node",
            (
                F.lit(1.0 - damping) / F.col("_n")
                + F.lit(damping) * F.col("_sum")
            ).alias("r"),
        )
    return ranks.join(deg, ranks["node"] == deg["s"]).select(
        F.col("node").alias("record_id"),
        F.col("r").alias("pagerank"),
        F.col("d").cast("long").alias("degree"),
    )


# driver fast path budget for k_truss: the packed-bitset adjacency is
# n * n/8 bytes (32k nodes -> 128 MB) and per-round edge support is a
# chunked popcount — same adaptive small-graph/scale-shape split as
# CC_DRIVER_EDGE_CAP above
K_TRUSS_DRIVER_EDGE_CAP = 2_000_000
K_TRUSS_DRIVER_NODE_CAP = 32_768

_POPCOUNT_LUT = None


def _driver_truss(rows, k: int, rounds: int):
    """k-truss peeling over a collected canonical edge list: adjacency as
    packed bit rows (numpy uint8), per-edge triangle support =
    popcount(row[u] & row[v]) — exact common-neighbor counts, no joins.
    Bit-identical to the distributed peeling for any edge set
    (parity-tested): both drop edges with support < k-2 per round and
    recount on the final survivor set."""
    import numpy as np

    global _POPCOUNT_LUT
    if _POPCOUNT_LUT is None:
        _POPCOUNT_LUT = np.array(
            [bin(i).count("1") for i in range(256)], dtype=np.uint16
        )

    nodes = sorted({x for r in rows for x in r})
    idx = {x: i for i, x in enumerate(nodes)}
    n = len(nodes)
    w = (n + 7) // 8
    ui = np.array([idx[u] for u, _ in rows], dtype=np.int64)
    vi = np.array([idx[v] for _, v in rows], dtype=np.int64)
    adj = np.zeros((n, w), dtype=np.uint8)
    bit_u = (1 << (ui & 7)).astype(np.uint8)
    bit_v = (1 << (vi & 7)).astype(np.uint8)
    np.bitwise_or.at(adj, (ui, vi >> 3), bit_v)
    np.bitwise_or.at(adj, (vi, ui >> 3), bit_u)

    def _support(ui, vi):
        sup = np.empty(len(ui), dtype=np.int64)
        # chunk so the AND operand stays ~64 MB regardless of edge count
        step = max(1, (64 << 20) // max(w, 1))
        for s in range(0, len(ui), step):
            band = adj[ui[s : s + step]] & adj[vi[s : s + step]]
            sup[s : s + step] = _POPCOUNT_LUT[band].sum(axis=1)
        return sup

    for _ in range(rounds):
        keep = _support(ui, vi) >= k - 2
        du, dv = ui[~keep], vi[~keep]
        np.bitwise_and.at(adj, (du, dv >> 3), ~(1 << (dv & 7)).astype(np.uint8))
        np.bitwise_and.at(adj, (dv, du >> 3), ~(1 << (du & 7)).astype(np.uint8))
        ui, vi = ui[keep], vi[keep]
    sup = _support(ui, vi)
    return [
        (nodes[int(u)], nodes[int(v)], int(s)) for u, v, s in zip(ui, vi, sup)
    ]


def k_truss(
    edges: DataFrame,
    src: str = "id1",
    dst: str = "id2",
    k: int = 3,
    rounds: int = 3,
    driver_fast_path: bool | None = None,
) -> DataFrame:
    """Bounded k-truss peeling over the undirected match graph: per round,
    recount each edge's triangle support within the surviving edge set and
    drop edges supporting fewer than k-2 triangles. The truss is the
    cluster BACKBONE — chain-merge bridges (edges in no triangle, for
    k = 3) peel away without any scoring, the classic structural cleanup
    before transitive clustering (Cohen 2008).

    A FIXED round count (default 3; peeling converges geometrically on
    match graphs) keeps the operator deterministic and SQL-unrollable —
    the full truss fixpoint would need a data-dependent loop. Output:
    surviving edges with their support recounted on the FINAL edge set,
    so ``support >= k-2`` for all rows iff peeling converged (a cheap
    convergence audit for the caller).

    Scale shape per round: one degree-ordered triangle enumeration (the
    same Suri & Vassilvitskii orientation as ``triangle_count`` — wedges
    fan out ONLY from each triangle's orientation-minimum vertex, so a
    degree-10^5 hub record never puts ~d^2/2 wedge candidates on one join
    key, which the previous id-ordered form did) and one edge-keyed
    census — O(triangles + edges), pair-free; the shrinking edge set is
    localCheckpoint'd per round so round r never re-peels rounds 1..r-1.
    Degrees are censused ONCE on the input edge set and carried through
    the rounds as edge columns: peeling only shrinks degrees, so the
    input-degree total order stays a valid orientation (each triangle has
    exactly one minimum; the out-degree bound is w.r.t. the input graph).
    That makes per-round orientation a pure PROJECTION — no degree
    re-aggregation and no joins — instead of three extra shuffles.

    ``driver_fast_path`` (None = auto when the canonical edge count fits
    ``K_TRUSS_DRIVER_EDGE_CAP`` and the node count fits
    ``K_TRUSS_DRIVER_NODE_CAP``): small graphs peel on the driver via a
    packed-bitset popcount (``_driver_truss``) — bit-identical survivors
    and supports (parity-tested), none of the ~5-stages-per-round job
    overhead. The wedge-join form below is the 10^9-edge scale shape and
    remains the automatic fallback.
    """
    canon = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    if driver_fast_path is None:
        driver_fast_path = canon.count() <= K_TRUSS_DRIVER_EDGE_CAP
    elif driver_fast_path and canon.count() > K_TRUSS_DRIVER_EDGE_CAP:
        raise ValueError("edge list exceeds K_TRUSS_DRIVER_EDGE_CAP")
    if driver_fast_path:
        rows = [(r["u"], r["v"]) for r in canon.collect()]
        if len({x for r in rows for x in r}) <= K_TRUSS_DRIVER_NODE_CAP:
            spark = edges.sparkSession
            out_schema = (
                edges.select(
                    F.least(F.col(src), F.col(dst)).alias(src),
                    F.greatest(F.col(src), F.col(dst)).alias(dst),
                    F.lit(0).cast("long").alias("support"),
                )
            ).schema
            return spark.createDataFrame(
                _driver_truss(rows, k, rounds), schema=out_schema
            )
        # edge count fit but the graph is too sparse/wide for a dense
        # bitset — fall through to the distributed shape
    deg = (
        canon.select(F.col("u").alias("n"))
        .unionAll(canon.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e = (
        canon.join(deg.withColumnsRenamed({"n": "u", "d": "_du"}), "u")
        .join(deg.withColumnsRenamed({"n": "v", "d": "_dv"}), "v")
        .select("u", "v", "_du", "_dv")
        .localCheckpoint(eager=False)
    )
    u_is_apex = (F.col("_du") < F.col("_dv")) | (
        (F.col("_du") == F.col("_dv")) & (F.col("u") < F.col("v"))
    )

    def _support(cur: DataFrame) -> DataFrame:
        oriented = cur.select(
            F.when(u_is_apex, F.col("u")).otherwise(F.col("v")).alias("a"),
            F.when(u_is_apex, F.col("v")).otherwise(F.col("u")).alias("b"),
        )
        # wedges only at the orientation-minimum vertex; legs id-ordered
        # (b < c) so the closing edge is looked up in the ID-canonical set
        wedges = (
            oriented.alias("x")
            .join(oriented.alias("y"), "a")
            .filter(F.col("x.b") < F.col("y.b"))
            .select(F.col("a"), F.col("x.b").alias("b"), F.col("y.b").alias("c"))
        )
        tri = wedges.join(
            cur.select(F.col("u").alias("b"), F.col("v").alias("c")), ["b", "c"]
        )
        # apex a is degree-min, not id-min: canonicalize each triangle edge
        # back to (min, max) id order for the census
        sup = (
            tri.select(
                F.explode(
                    F.array(
                        F.struct(
                            F.least("a", "b").alias("u"),
                            F.greatest("a", "b").alias("v"),
                        ),
                        F.struct(
                            F.least("a", "c").alias("u"),
                            F.greatest("a", "c").alias("v"),
                        ),
                        F.struct(F.col("b").alias("u"), F.col("c").alias("v")),
                    )
                ).alias("_e")
            )
            .select("_e.u", "_e.v")
            .groupBy("u", "v")
            .agg(F.count(F.lit(1)).alias("support"))
        )
        return cur.join(sup, ["u", "v"], "left").select(
            "u",
            "v",
            "_du",
            "_dv",
            F.coalesce("support", F.lit(0)).cast("long").alias("support"),
        )

    for _ in range(rounds):
        e = (
            _support(e)
            .filter(F.col("support") >= k - 2)
            .select("u", "v", "_du", "_dv")
            .localCheckpoint(eager=False)
        )
    return _support(e).select(
        F.col("u").alias(src), F.col("v").alias(dst), "support"
    )


def cluster_depths(
    edges: DataFrame,
    src: str = "id1",
    dst: str = "id2",
    rounds: int = 4,
) -> DataFrame:
    """Bounded BFS depth audit of entity clusters: distance of every node
    from its cluster root (the component-minimum id) after a FIXED number
    of label-propagation rounds. Deep clusters are chain merges (a-b,
    b-c, ... linked without shortcuts); duplicate cliques sit at depth 1.
    Complements the triangle/truss audits with the GLOBAL shape signal.

    Per round, dist(v) = min(dist(v), min over neighbors(dist(u) + 1)) —
    one edge-keyed join plus a map-side-combined min per round, O(edges)
    per round. Nodes further than ``rounds`` hops from their root emit
    depth = -1 ("unreached within the audit horizon") rather than looping
    to a fixpoint — the bounded-rounds convention that keeps the operator
    deterministic and SQL-unrollable.

    Output: (record_id, cluster_id, depth).
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    und = e.select(F.col("u").alias("s"), F.col("v").alias("t")).unionAll(
        e.select(F.col("v").alias("s"), F.col("u").alias("t"))
    ).localCheckpoint(eager=False)
    roots = connected_components(e.select(F.col("u").alias("id1"), F.col("v").alias("id2")))
    # dist 0 at the root, unknown elsewhere
    dist = roots.select(
        F.col("record_id").alias("node"),
        "cluster_id",
        F.when(F.col("record_id") == F.col("cluster_id"), F.lit(0))
        .cast("long")
        .alias("d"),
    ).localCheckpoint(eager=False)
    for _ in range(rounds):
        relaxed = (
            und.join(dist, und["s"] == dist["node"])
            .filter(F.col("d").isNotNull())
            .groupBy(F.col("t").alias("node"))
            .agg((F.min("d") + 1).alias("_nd"))
        )
        dist = (
            dist.join(relaxed, "node", "left")
            .select(
                "node",
                "cluster_id",
                F.least(
                    F.coalesce("d", F.lit(2**62)),
                    F.coalesce("_nd", F.lit(2**62)),
                ).alias("_m"),
            )
            .select(
                "node",
                "cluster_id",
                F.when(F.col("_m") < 2**62, F.col("_m")).alias("d"),
            )
            .localCheckpoint(eager=False)
        )
    return dist.select(
        F.col("node").alias("record_id"),
        "cluster_id",
        F.coalesce("d", F.lit(-1)).cast("long").alias("depth"),
    )
