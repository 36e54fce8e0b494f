"""Graph analytics over the co-purchase graph (parts linked when they ship
in the same order): degree tables (exact, oracled) and PageRank (iterative
DataFrame loop — the §2 'non-SQL-expressible iterative algorithm' slot,
rows-only per §2.0 rule 6 with a numpy reference test instead).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from ..io import load
from ..ops.materialize import materialize
from ..registry import register

# Co-purchase edges: undirected part-part pairs that co-occur in an order.
# Self-join on orderkey with a < inequality yields each unordered pair once;
# DISTINCT collapses repeat co-purchases across orders.
_EDGES_SQL = """
SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
"""


# Process-level materialized view of the co-purchase edge list: every graph
# key starts from the same basket expansion (~2 s at sf0.1), so one
# materialized copy per (context, lineitem file version) is the shared
# intermediate a real analyst session would keep anyway. Invalidation is by
# file identity (path + mtime + size — the driver regenerates testdata
# between rounds) and application id (a new SparkContext cannot reuse old
# RDD blocks). The cached entry is lineage-truncated via materialize(), so
# callers' persist()/unpersist() pairs on the returned frame cannot evict
# the shared copy. Memory: 2 longs × |edges| (~1e6 rows at sf0.1).
_EDGE_CACHE: dict[tuple, DataFrame] = {}


def _edges(spark, sf_dir) -> DataFrame:
    # Posting-list formulation of the order-wise self-join (identical
    # result, measured 7.9 s → ~2 s at sf0.1): one groupBy(orderkey)
    # shuffle builds the per-basket sorted distinct part list, pairs expand
    # IN-ROW from that list, then one distinct. The oracle keeps the
    # self-join spelling — same edge set by construction.
    import os

    from ..io import table_path
    from ..ops.materialize import materialize as _mat

    cache_key = None
    try:
        st = os.stat(table_path(sf_dir, "lineitem"))
        cache_key = (
            spark.sparkContext.applicationId,
            table_path(sf_dir, "lineitem"),
            st.st_mtime_ns,
            st.st_size,
        )
    except OSError:
        pass
    if cache_key is not None and cache_key in _EDGE_CACHE:
        return _EDGE_CACHE[cache_key]

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    )
    pair_structs = F.expr(
        "flatten(transform(sequence(1, size(ps) - 1), "
        "i -> transform(sequence(i + 1, size(ps)), "
        "j -> struct(element_at(ps, i) AS src, element_at(ps, j) AS dst))))"
    )
    edges = (
        baskets.filter(F.size("ps") > 1)
        .select(F.explode(pair_structs).alias("p"))
        .select(F.col("p.src").alias("src"), F.col("p.dst").alias("dst"))
        .distinct()
    )
    if cache_key is None:
        return edges
    # Evict superseded entries for the same table path (regenerated file →
    # new mtime/size, or a new SparkContext): one live entry per path keeps
    # a long-lived driver from pinning dead localCheckpoint blocks forever.
    stale = [k for k in _EDGE_CACHE if k[1] == cache_key[1] and k != cache_key]
    for k in stale:
        old = _EDGE_CACHE.pop(k)
        try:
            old.unpersist()
        except Exception:
            pass  # blocks of a dead SparkContext are already gone
    _EDGE_CACHE[cache_key] = _mat(edges)
    return _EDGE_CACHE[cache_key]


def _oriented_adj(o: DataFrame) -> DataFrame:
    """Oriented out-adjacency (collect_list of b per source a) — shared by
    the four triangle-family keys (triangle_count, jaccard_neighbors,
    adamic_adar, local_clustering).

    Round-12 MEASURED NEGATIVE (kept opt-in for reproduction, the katz
    REPART precedent): both sides of the triangle join consume this table
    and the two broadcast subtrees differ only by an alias BELOW the
    exchange, so the collect_list aggregate (0.62 s at sf0.1) and its
    ~10 MB broadcast appear TWICE in the static plan — an apparent 2x
    waste. Materializing the adjacency once (SWALLOW_LCC_MAT=1) removes
    the duplicate, but measured a TIE-TO-LOSS across two interleaved A/B
    harnesses at sf0.1 (trimmed means, double-build vs materialized:
    local_clustering 2.81 vs 3.00 s, adamic_adar 3.32 vs 3.91 s,
    jaccard_neighbors 3.80 vs 3.91 s, triangle_count 2.18 vs 2.25 s;
    the non-trimmed pass split the same four keys 2/2). Mechanism: the
    two broadcast builds run CONCURRENTLY inside the one job (separate
    broadcast-exchange threads over the persisted `o`), so the duplicate
    work costs almost no wall-clock, while the eager localCheckpoint is a
    SERIAL barrier plus a write+read of the ~|E|-element adjacency before
    the main job can start. No shuffle-byte advantage either way, so the
    tie-at-scale rule keeps the overlap-friendly form as default.
    """
    adj = o.groupBy("a").agg(F.collect_list("b").alias("nbrs"))
    if os.environ.get("SWALLOW_LCC_MAT", "0") == "1":
        return materialize(adj)
    return adj


@register(
    "graph_copurchase_degree",
    oracle=f"""
WITH e AS ({_EDGES_SQL}),
und AS (SELECT src AS node, dst AS nbr FROM e
        UNION ALL SELECT dst, src FROM e)
SELECT node, COUNT(*) AS degree
FROM und GROUP BY node
ORDER BY degree DESC, node LIMIT 100
""",
    tier="T2",
)
def graph_copurchase_degree(spark, sf_dir):
    """Top-100 parts by co-purchase degree — the exact (oracled) half of the
    graph pipeline; PageRank below reuses the same edge builder.

    Scale note: the order-wise self-join shuffles once on l_orderkey and
    fans out quadratically in basket size — cap baskets with a size filter
    at 100 TB (a 10 000-item order would emit 5·10⁷ pairs). DISTINCT and
    the degree count shuffle on the part key.
    """
    e = _edges(spark, sf_dir)
    und = e.selectExpr("src AS node").unionAll(e.selectExpr("dst AS node"))
    return (
        und.groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
        .orderBy(F.col("degree").desc(), "node")
        .limit(100)
    )


# Exact-integer PageRank: ranks live in fixed-point units of 1e-12 (R0 =
# 1e12), per-edge contributions are R DIV deg (floor division), and the
# damping update is R' = 0.15e12 + (85 * sum) DIV 100 — every operation is
# int64-exact and therefore independent of partitioning and summation
# order, which is what makes an ITERATIVE algorithm hash-checkable against
# DuckDB (the usual float accumulation is not). Headroom: total rank mass
# ≈ |nodes|·1e12, ×85 stays < 2^63 for corpora up to ~10^5 nodes at this
# unit; at larger graphs drop the unit to 1e9.
_PR_R0 = 1_000_000_000_000
_PR_ITERS = 5


def _pagerank_oracle() -> str:
    base = f"""
WITH e0 AS ({_EDGES_SQL}),
edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
ed AS (SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d USING (src)),
nodes AS (SELECT DISTINCT src AS node FROM edges),
r0 AS (SELECT node, CAST({_PR_R0} AS BIGINT) AS r FROM nodes)"""
    steps = []
    for i in range(1, _PR_ITERS + 1):
        steps.append(
            f""",
c{i} AS (SELECT ed.dst AS node, SUM(r{i - 1}.r // ed.deg) AS csum
         FROM ed JOIN r{i - 1} ON ed.src = r{i - 1}.node GROUP BY ed.dst),
r{i} AS (SELECT nodes.node,
                CAST({_PR_R0} * 15 // 100
                     + 85 * COALESCE(c{i}.csum, 0) // 100 AS BIGINT) AS r
         FROM nodes LEFT JOIN c{i} USING (node))"""
        )
    return (
        base
        + "".join(steps)
        + f"""
SELECT node, r AS rank_units
FROM r{_PR_ITERS}
ORDER BY rank_units DESC, node
LIMIT 50
"""
    )


@register("graph_pagerank", oracle=_pagerank_oracle(), tier="T2")
def graph_pagerank(spark, sf_dir):
    """PageRank (damping 0.85, 5 fixed iterations) on the undirected
    co-purchase graph; top-50 parts by rank, ORACLE-CHECKED: ranks are
    exact int64 fixed-point (1e-12 units), contributions use floor
    division, so the result is bit-identical regardless of partitioning or
    summation order, and the DuckDB twin unrolls the 5 iterations as
    chained CTE stages (aggregates are illegal in a recursive term).
    tests/test_graph.py additionally checks against a numpy dense float
    reference (1e-6 relative tolerance) and rank-mass conservation.

    Scale note: the adjacency table (|nodes| rows, built in two shuffles —
    baskets, then a groupBy(src) whose collect_set fuses pair-dedup, degree,
    and adjacency) is persisted ALREADY hash-partitioned on the iteration
    join key, so each iteration moves only the |nodes|-row rank vector plus
    one contributions shuffle that is map-side partial-summed before it
    ships — the |edges| expansion exists only in-flight inside explode →
    partial agg, never materialized. Fixed iteration count keeps lineage
    bounded (no driver-side convergence collect); at 1000 executors
    checkpoint every ~10 iterations to truncate lineage. Hub nodes cap at
    the basket-size filter; a pathological degree would split its nbrs
    array into fixed-size chunks (same sums, bounded rows).
    """
    # Adjacency prep from the shared materialized edge view (round 8; the
    # r6 fused basket build — 8.5 s → 4.3 s — moved into _edges' cache):
    # the cached DISTINCT undirected pair set unions with its swap and one
    # groupBy(src) lands the |nodes|-row adjacency already hash-partitioned
    # on the iteration join key (collect_list suffices — the edge set is
    # distinct by construction, so no cross-basket dedup remains). Per
    # iteration the 2.4M-pair expansion happens in-flight (explode straight
    # into a map-side partial SUM), never materialized or re-shuffled.
    e = _edges(spark, sf_dir)
    und = e.unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    adj = (
        und.groupBy("src")
        .agg(F.collect_list("dst").alias("nbrs"))
        .withColumn("deg", F.size("nbrs"))
        .persist()
    )
    ranks = adj.select(F.col("src").alias("node")).withColumn(
        "r", F.lit(_PR_R0).cast("long")
    )
    # The rank-vector side of the iteration join carries a SHUFFLE_HASH
    # hint: without it the planner picks SortMergeJoin and RE-SORTS the
    # array-payload adjacency (the heavy side) EVERY iteration — the hint
    # keeps the co-partitioning (zero exchange either way, verified in the
    # plan) and replaces both per-iteration sorts with a per-partition hash
    # build of the skinny |V|-row rank vector, which also stays scale-safe
    # (build side is |V|/P rows per task, never a driver broadcast).
    rank_hint = (
        (lambda df: df)
        if os.environ.get("SWALLOW_PR_SMJ", "0") == "1"
        else (lambda df: df.hint("shuffle_hash"))
    )
    for _ in range(_PR_ITERS):
        # The graph is symmetric (undirected), so every node with an edge
        # receives contributions — contribs covers exactly the node set and
        # the oracle's LEFT JOIN never fires its NULL branch; the rank
        # update therefore needs no per-iteration nodes join at all.
        contribs = (
            adj.join(rank_hint(ranks), adj["src"] == ranks["node"])
            .select(F.explode("nbrs").alias("node"), F.expr("r DIV deg").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("csum"))
        )
        ranks = contribs.select(
            "node",
            F.expr(
                f"CAST({_PR_R0} * 15 DIV 100 + 85 * csum DIV 100 AS BIGINT)"
            ).alias("r"),
        )
    out = (
        ranks.select("node", F.col("r").alias("rank_units"))
        .orderBy(F.col("rank_units").desc(), "node")
        .limit(50)
    )
    # Materialize (and truncate the 5-iteration lineage) before unpersisting
    # the iteration input — localCheckpoint keeps the 50 rows executor-side
    # instead of a driver collect/re-create round trip. At 5 fixed iterations
    # one terminal checkpoint beats per-iteration cuts (measured: 5.4 → 4.3 s);
    # for deeper iteration counts checkpoint every ~10 to bound lineage.
    out = out.transform(materialize)
    adj.unpersist()
    return out


@register(
    "graph_triangle_count",
    oracle=f"""
WITH e AS ({_EDGES_SQL}),
tri AS (
  SELECT COUNT(*) AS n_triangles
  FROM e e1
  JOIN e e2 ON e1.dst = e2.src
  JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
deg AS (
  SELECT node, COUNT(*) AS d
  FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
  GROUP BY node
),
wedges AS (SELECT SUM(d * (d - 1) // 2) AS n_wedges FROM deg)
SELECT CAST(n_triangles AS BIGINT) AS n_triangles,
       CAST(n_wedges AS BIGINT) AS n_wedges,
       {{rnd}} AS global_clustering
FROM tri CROSS JOIN wedges
""".format(rnd="(FLOOR((CAST(3 * n_triangles AS DOUBLE) / n_wedges) * 1000000 + 0.5) / 1000000)"),
    tier="T2",
)
def graph_triangle_count(spark, sf_dir):
    """Triangle count + global clustering coefficient of the co-purchase
    graph — the standard oriented-edge-join algorithm: edges are kept in
    canonical src < dst orientation, so each triangle a<b<c is produced
    exactly once as (a,b)⋈(b,c)⋈(a,c). Clustering = 3·triangles / wedges,
    wedges = Σ d(d-1)/2 over the undirected degree table.

    Scale note: edges are ORIENTED BY INCREASING (degree, id)
    (Schank–Wagner), so every triangle is counted exactly once at its
    minimum vertex and oriented out-degree is bounded by O(√E) — the
    arboricity bound that tames hub nodes at 100 TB. The count is then
    Σ|N⁺(a) ∩ N⁺(b)| over oriented edges with the intersection computed
    in-row (codegen hash intersect), which avoids shuffling the Σoutdeg²
    wedge intermediate entirely — measured 14.9 s → 5.9 s at sf0.1 vs the
    unoriented 3-join on this dense co-purchase graph (avg degree ~120).
    Out-neighbor lists cap at the oriented out-degree; if a pathological
    graph still produced oversized lists, split them into fixed-size chunks
    and explode (same count, bounded rows).
    """
    e = _edges(spark, sf_dir).persist()
    und = e.selectExpr("src AS node").unionAll(e.selectExpr("dst AS node"))
    deg = und.groupBy("node").agg(F.count(F.lit(1)).alias("d")).persist()
    # total-order key (degree, id) packed into one long: ids are part keys
    # (< 1e9 at any TPC-H scale factor this repo targets)
    ed = (
        e.join(deg.select(F.col("node").alias("src"), F.col("d").alias("sd")), "src")
        .join(deg.select(F.col("node").alias("dst"), F.col("d").alias("dd")), "dst")
        .select(
            "src",
            "dst",
            (F.col("sd") * F.lit(1_000_000_000) + F.col("src")).alias("skey"),
            (F.col("dd") * F.lit(1_000_000_000) + F.col("dst")).alias("dkey"),
        )
    )
    o = ed.select(
        F.when(F.col("skey") < F.col("dkey"), F.col("src")).otherwise(F.col("dst")).alias("a"),
        F.when(F.col("skey") < F.col("dkey"), F.col("dst")).otherwise(F.col("src")).alias("b"),
    ).persist()
    # adjacency-intersection form: for each oriented edge (a, b), common
    # oriented out-neighbors are exactly the triangles whose minimum vertex
    # is a — Σ|N⁺(a) ∩ N⁺(b)| counts each triangle once, with the
    # intersection computed IN-ROW (codegen hash intersect) instead of
    # shuffling a Σoutdeg² wedge intermediate through a third join.
    adj = _oriented_adj(o)
    tri = (
        o.join(adj.select(F.col("a"), F.col("nbrs").alias("na")), "a")
        .join(
            adj.select(F.col("a").alias("b"), F.col("nbrs").alias("nb")), "b"
        )
        .select(F.size(F.array_intersect("na", "nb")).alias("t"))
        .agg(F.sum("t").cast("long").alias("n_triangles"))
    )
    wedges = deg.agg(F.sum(F.expr("d * (d - 1) DIV 2")).alias("n_wedges"))
    out = tri.crossJoin(F.broadcast(wedges)).select(
        F.col("n_triangles").cast("long"),
        F.col("n_wedges").cast("long"),
        (
            F.floor(
                (F.lit(3) * F.col("n_triangles")).cast("double")
                / F.col("n_wedges")
                * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("global_clustering"),
    )
    out = out.transform(materialize)
    for df in (e, deg, o):
        df.unpersist()
    return out


@register(
    "graph_jaccard_neighbors",
    oracle=f"""
WITH e0 AS ({_EDGES_SQL}),
und AS (SELECT src AS node, dst AS nbr FROM e0 UNION ALL SELECT dst, src FROM e0),
adj AS (SELECT node, list(nbr) AS nbrs, COUNT(*) AS d FROM und GROUP BY node),
j AS (
  SELECT e.src, e.dst,
         len(list_intersect(a1.nbrs, a2.nbrs)) AS n_common,
         a1.d + a2.d - 2 AS denom_base
  FROM e0 e
  JOIN adj a1 ON a1.node = e.src
  JOIN adj a2 ON a2.node = e.dst)
SELECT src, dst, CAST(n_common AS BIGINT) AS n_common,
       (FLOOR(CAST(n_common AS DOUBLE) / (denom_base - n_common) * 1000000 + 0.5)
        / 1000000) AS jaccard
FROM j
WHERE denom_base - n_common > 0
ORDER BY jaccard DESC, src, dst
LIMIT 50
""",
    tier="T2",
)
def graph_jaccard_neighbors(spark, sf_dir):
    """Neighbor-set Jaccard of each co-purchase EDGE's endpoints
    (embeddedness): |N(u)∩N(v)| / |N(u)∪N(v)| with the endpoints
    themselves excluded — the classic link-strength / tie-strength score.
    Top-50 strongest edges.

    Candidate pairs are restricted to existing edges, which is what keeps
    this exact AND bounded: scoring ALL pairs with a shared neighbor would
    enumerate Σd(w)² wedges (148M at sf0.1 on this dense graph).
    |N(u)∩N(v)| for an edge = the number of triangles through it, so the
    implementation LISTS triangles once via the Schank–Wagner oriented
    intersect (the graph_triangle_count machinery), explodes each triangle
    to its three member edges, and counts per canonical edge — measured
    14.2 s → ~7 s at sf0.1 vs joining both full adjacency arrays onto
    every edge (that formulation ships Σdeg² ≈ 300M ints through the
    join; triangle listing ships 3·|triangles| ≈ 5.7M small rows).
    Zero-common edges are restored by a left join from the edge table
    (they can reach the top-50 on sparse fixtures).

    Determinism: counts and degrees are exact ints; jaccard is ONE
    division then half-up 6dp; the (jaccard DESC, src, dst) total order
    fixes the top-50 cut in both engines.

    Scale note: one adjacency groupBy + one edge-keyed shuffle of the
    triangle attributions; oriented out-degree is bounded by O(√E)
    (arboricity), so no hub blow-up — the same bound that makes
    graph_triangle_count safe at 100 TB.
    """
    e = _edges(spark, sf_dir).persist()
    und = e.selectExpr("src AS node").unionAll(e.selectExpr("dst AS node"))
    deg = und.groupBy("node").agg(F.count(F.lit(1)).alias("d")).persist()
    # orient by the packed (degree, id) total order — each triangle is
    # produced exactly once at its minimum vertex (see graph_triangle_count)
    ed = (
        e.join(deg.select(F.col("node").alias("src"), F.col("d").alias("sd")), "src")
        .join(deg.select(F.col("node").alias("dst"), F.col("d").alias("dd")), "dst")
        .select(
            "src",
            "dst",
            (F.col("sd") * F.lit(1_000_000_000) + F.col("src")).alias("skey"),
            (F.col("dd") * F.lit(1_000_000_000) + F.col("dst")).alias("dkey"),
        )
    )
    o = ed.select(
        F.when(F.col("skey") < F.col("dkey"), F.col("src")).otherwise(F.col("dst")).alias("a"),
        F.when(F.col("skey") < F.col("dkey"), F.col("dst")).otherwise(F.col("src")).alias("b"),
    ).persist()
    adj = _oriented_adj(o)
    # list each triangle (a, b, w) once, then attribute it to its three
    # member edges in ORIGINAL id space (canonical src < dst)
    tri = (
        o.join(adj.select(F.col("a"), F.col("nbrs").alias("na")), "a")
        .join(adj.select(F.col("a").alias("b"), F.col("nbrs").alias("nb")), "b")
        .select("a", "b", F.explode(F.array_intersect("na", "nb")).alias("w"))
    )
    pair = lambda x, y: F.struct(  # noqa: E731
        F.least(x, y).alias("src"), F.greatest(x, y).alias("dst")
    )
    attributions = tri.select(
        F.explode(
            F.array(
                pair(F.col("a"), F.col("b")),
                pair(F.col("a"), F.col("w")),
                pair(F.col("b"), F.col("w")),
            )
        ).alias("p")
    ).select(F.col("p.src").alias("src"), F.col("p.dst").alias("dst"))
    cnt = attributions.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("long").alias("n_common")
    )
    j = (
        e.join(cnt, ["src", "dst"], "left")
        .join(deg.select(F.col("node").alias("src"), F.col("d").alias("da")), "src")
        .join(deg.select(F.col("node").alias("dst"), F.col("d").alias("db")), "dst")
        .select(
            "src",
            "dst",
            F.coalesce(F.col("n_common"), F.lit(0)).cast("long").alias("n_common"),
            (F.col("da") + F.col("db") - 2).alias("denom_base"),
        )
    )
    out = (
        j.filter(F.col("denom_base") - F.col("n_common") > 0)
        .select(
            "src",
            "dst",
            "n_common",
            (
                F.floor(
                    F.col("n_common").cast("double")
                    / (F.col("denom_base") - F.col("n_common"))
                    * 1000000
                    + F.lit(0.5)
                )
                / 1000000
            ).alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), "src", "dst")
        .limit(50)
    )
    out = out.transform(materialize)
    for df in (e, deg, o):
        df.unpersist()
    return out


@register(
    "graph_degree_distribution",
    oracle=f"""
WITH e AS ({_EDGES_SQL}),
und AS (SELECT src AS node FROM e UNION ALL SELECT dst FROM e),
deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM und GROUP BY node),
binned AS (
  SELECT CAST(length(bin(d)) - 1 AS BIGINT) AS log2_bin, d
  FROM deg
)
SELECT log2_bin,
       CAST(POW(2.0, log2_bin) AS BIGINT) AS bin_lo,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(MIN(d) AS BIGINT) AS min_degree,
       CAST(MAX(d) AS BIGINT) AS max_degree
FROM binned
GROUP BY log2_bin
""",
    tier="T2",
)
def graph_degree_distribution(spark, sf_dir):
    """Log₂-binned degree histogram of the co-purchase graph (the
    power-law fingerprint): per bin, node count and the min/max degree
    observed — the first diagnostic you run on a new 100 TB graph to
    size hub mitigation (salting caps, list chunking) before any join.

    Determinism: degrees are exact ints; the bin index floor(log₂ d) is
    computed as length(bin(d)) − 1 — pure integer/string ops in both
    engines — because a floating ln(d)/ln(2) sits EXACTLY on the floor
    boundary for power-of-two degrees, where a 1-ulp libm difference
    between JVM and C flips the bin.

    Scale note: degree table + one |bins|-row aggregate — nothing beyond
    the edge builder's shuffle.
    """
    e = _edges(spark, sf_dir)
    und = e.selectExpr("src AS node").unionAll(e.selectExpr("dst AS node"))
    deg = und.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    binned = deg.select(
        (F.length(F.bin(F.col("d"))) - 1).cast("long").alias("log2_bin"), "d"
    )
    return binned.groupBy("log2_bin").agg(
        F.pow(F.lit(2.0), F.col("log2_bin")).cast("long").alias("bin_lo"),
        F.count(F.lit(1)).alias("n_nodes"),
        F.min("d").alias("min_degree"),
        F.max("d").alias("max_degree"),
    )


def _kcore_k(deg_df) -> int:
    """k = floor(median initial degree / 2): deterministic and derived
    from the data so the key stays meaningful at every scale factor (a
    fixed k either trivializes or annihilates the core as SF shifts the
    degree distribution). Half-median is chosen with measured margin: the
    co-purchase graph's degeneracy is ~0.6–0.7× its median degree
    (68 vs 89 at sf0.001, 82 vs 115 at sf0.01), so the FULL median core
    is empty while the half-median core is always substantial."""
    import pyspark.sql.functions as _F

    return max(
        1,
        int(deg_df.agg(_F.expr("percentile(d, 0.5)").alias("m")).first()["m"]) // 2,
    )


@register(
    "graph_kcore",
    oracle=f"""
WITH RECURSIVE e0 AS ({_EDGES_SQL}),
und AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
kv AS (
  SELECT GREATEST(1, CAST(FLOOR(quantile_cont(d, 0.5)) AS BIGINT) // 2) AS k
  FROM (SELECT COUNT(*) AS d FROM und GROUP BY src)
),
peel(t, src, dst) AS (
  SELECT 0, src, dst FROM und
  UNION ALL
  SELECT t + 1, src, dst FROM (
    SELECT t, src, dst,
           COUNT(*) OVER (PARTITION BY src) AS ds,
           COUNT(*) OVER (PARTITION BY dst) AS dd
    FROM peel
  )
  WHERE t < 30 AND ds >= (SELECT k FROM kv) AND dd >= (SELECT k FROM kv)
)
SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS core_degree
FROM peel WHERE t = 30
GROUP BY src
""",
    tier="T2",
)
def graph_kcore(spark, sf_dir):
    """k-core decomposition at k = half the median initial degree:
    iteratively
    peel nodes of degree < k until the remaining subgraph has minimum
    degree ≥ k — the dense backbone used for community seeding and
    spam-cluster isolation. Returns the core's nodes with their
    within-core degree.

    ORACLE (promoted from rows-only in round 7): parallel peeling IS
    expressible as a recursive CTE despite the single-working-table-
    reference rule — on a SYMMETRIZED edge list, deg(node) = #rows with
    src=node = #rows with dst=node, so the per-round survivor filter
    (deg(src) ≥ k AND deg(dst) ≥ k) is two window COUNTs over ONE scan of
    the working table; no second self-reference, no per-iteration
    re-aggregation needed. The CTE runs a FIXED 30 rounds (rows keep
    reproducing after the fixpoint, matching Spark's iteration cap) and
    the final filter t = 30 reads exactly the 30-round survivor set —
    which is also the empty set when everything peels, because the
    recursion then dies early and no t=30 rows exist. k is computed inside
    the SQL with the same rule as _kcore_k (GREATEST(1,
    floor(quantile_cont(d, .5)) // 2); Spark's percentile ≡ DuckDB's
    quantile_cont linear interpolation, and the midpoint average of two
    int64 degrees is exact in binary on both engines).
    tests/test_graph.py additionally checks the result against an exact
    pandas peeling reference and the min-degree ≥ k invariant.

    Scale note: each peel iteration is one degree aggregate + one semi
    join on the surviving-node set, with localCheckpoint truncating the
    loop's lineage (same discipline as PageRank); the edge list only
    shrinks. Iterations are capped at 30 — degeneracy ordering converges
    far faster on real graphs, and each pass removes every sub-k node at
    once (parallel peeling), not one node at a time.
    """
    e = _edges(spark, sf_dir)
    edges = (
        e.selectExpr("src", "dst")
        .unionAll(e.selectExpr("dst AS src", "src AS dst"))
        .transform(materialize)
    )
    k = _kcore_k(edges.groupBy("src").agg(F.count(F.lit(1)).alias("d")))
    # Convergence bookkeeping (round-11 optimization, guide §1.2/§5): the
    # previous loop ran TWO count() actions per iteration (n_before and
    # the post-join count); carrying the surviving-edge count forward
    # halves the per-iteration driver actions — one pass over the
    # materialized edge blocks per peel instead of two. Identical peel
    # sequence and fixpoint test (count unchanged by the join == no node
    # fell below k).
    n_prev = edges.count()
    for _ in range(30):
        deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
        keep = deg.filter(F.col("d") >= k).select("src")
        edges = (
            edges.join(F.broadcast(keep), "src")
            .join(F.broadcast(keep.withColumnRenamed("src", "dst")), "dst")
            .select("src", "dst")
            .transform(materialize)
        )
        n_now = edges.count()
        if n_now == n_prev:
            break
        n_prev = n_now
    return (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).cast("long").alias("core_degree"))
    )


@register(
    "graph_shortest_hops",
    oracle=f"""
WITH RECURSIVE e0 AS ({_EDGES_SQL}),
und AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
seed AS (SELECT MIN(src) AS node FROM und),
bfs(node, d) AS (
  SELECT node, 0 FROM seed
  UNION
  SELECT u.dst, b.d + 1
  FROM bfs b JOIN und u ON u.src = b.node
  WHERE b.d < 4
),
md AS (SELECT node, MIN(d) AS d FROM bfs GROUP BY node)
SELECT CAST(d AS BIGINT) AS distance,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(node) AS BIGINT) AS sum_node_id
FROM md GROUP BY d
""",
    tier="T2",
)
def graph_shortest_hops(spark, sf_dir):
    """BFS hop distance from a deterministic seed (the smallest part key in
    the co-purchase graph), bounded at 4 hops: per-distance node count and
    node-id checksum — the reachability profile behind 'how local is this
    product neighborhood'. The oracle runs the same traversal as a
    recursive CTE; MIN(d) per node collapses the CTE's (node, depth)
    multiplicity to true BFS distance.

    Scale note: textbook frontier BFS — each hop is ONE join of the current
    frontier against the src-partitioned edge table plus an anti-join
    against the visited set (both shuffles bounded by |frontier| and
    |visited|, never |V|x|E|); localCheckpoint truncates the per-iteration
    lineage exactly like graph_pagerank. Hop count is fixed (4), so the
    plan depth is static regardless of data scale.
    """
    e = _edges(spark, sf_dir)
    und = (
        e.select("src", "dst")
        .union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .persist()
    )
    seed = und.agg(F.min("src").alias("node"))
    dist = seed.withColumn("d", F.lit(0)).transform(materialize)
    frontier = dist.select("node")
    for hop in range(1, 5):
        # The frontier (and the visited set) of a hop-bounded ego BFS stay
        # small, so both sides BROADCAST: each hop is a map-side join over
        # the persisted edge table — zero per-iteration exchange of |E|.
        # (Full-graph BFS where |visited| -> |V| would flip the anti-join
        # back to a shuffle join; the frontier broadcast still holds.)
        # Only the frontier is materialized per hop; dist stays a lazy
        # union of already-checkpointed frontiers.
        nxt = (
            und.join(F.broadcast(frontier), und["src"] == frontier["node"])
            .select(und["dst"].alias("node"))
            .distinct()
            .join(F.broadcast(dist.select("node")), "node", "left_anti")
            .withColumn("d", F.lit(hop))
            .transform(materialize)
        )
        dist = dist.union(nxt)
        frontier = nxt.select("node")
        if nxt.isEmpty():  # scans the materialized checkpoint — no recompute
            break
    out = dist.groupBy("d").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum("node").cast("long").alias("sum_node_id"),
    ).select(F.col("d").cast("long").alias("distance"), "n_nodes", "sum_node_id")
    out = out.transform(materialize)
    und.unpersist()
    return out


@register(
    "graph_adamic_adar",
    oracle=f"""
WITH e0 AS ({_EDGES_SQL}),
und AS (SELECT src AS node, dst AS nbr FROM e0 UNION ALL SELECT dst, src FROM e0),
adj AS (SELECT node, list(nbr) AS nbrs, COUNT(*) AS d FROM und GROUP BY node),
du AS (SELECT node, CAST(FLOOR(1000000 / ln(CAST(d AS DOUBLE))) AS BIGINT) AS u
       FROM adj WHERE d >= 2),
common0 AS (
  SELECT e.src, e.dst, list_intersect(a1.nbrs, a2.nbrs) AS cw
  FROM e0 e
  JOIN adj a1 ON a1.node = e.src
  JOIN adj a2 ON a2.node = e.dst
),
common AS (SELECT src, dst, unnest(cw) AS w FROM common0),
score AS (
  SELECT c.src, c.dst, CAST(SUM(du.u) AS BIGINT) AS aa_units,
         CAST(COUNT(*) AS BIGINT) AS n_common
  FROM common c JOIN du ON du.node = c.w
  GROUP BY c.src, c.dst
)
SELECT e.src, e.dst,
       COALESCE(s.n_common, 0) AS n_common,
       CAST(COALESCE(s.aa_units, 0) AS DOUBLE) / 1000000 AS adamic_adar
FROM e0 e LEFT JOIN score s ON s.src = e.src AND s.dst = e.dst
ORDER BY adamic_adar DESC, e.src, e.dst
LIMIT 50
""",
    tier="T2",
)
def graph_adamic_adar(spark, sf_dir):
    """Adamic–Adar link strength of each co-purchase edge: Σ over common
    neighbors w of 1/ln(deg(w)) — the link-prediction score that discounts
    promiscuous common neighbors (a hub shared by everything is weak
    evidence; a rare shared neighbor is strong). Top-50 edges.

    Same bounded shape as graph_jaccard_neighbors: candidates are
    EXISTING edges, common neighbors come from the oriented triangle
    listing (each triangle attributes its three edges, carrying the
    OPPOSITE vertex), so nothing Σdeg²-sized is enumerated. The
    1/ln(deg) weight is quantized once per node to integer 1e-6 units
    (deg ≥ 2 for any common neighbor, so ln > 0), then summed exactly —
    the text_unigram_logprob recipe. Scale note: one adjacency groupBy +
    one edge-keyed shuffle of 3·|triangles| attributions; oriented
    out-degree bounded O(√E).
    """
    e = _edges(spark, sf_dir).persist()
    und = e.selectExpr("src AS node").unionAll(e.selectExpr("dst AS node"))
    deg = und.groupBy("node").agg(F.count(F.lit(1)).alias("d")).persist()
    du = deg.filter(F.col("d") >= 2).select(
        "node",
        F.floor(F.lit(1000000) / F.log(F.col("d").cast("double"))).cast("long").alias("u"),
    )
    ed = (
        e.join(deg.select(F.col("node").alias("src"), F.col("d").alias("sd")), "src")
        .join(deg.select(F.col("node").alias("dst"), F.col("d").alias("dd")), "dst")
        .select(
            "src",
            "dst",
            (F.col("sd") * F.lit(1_000_000_000) + F.col("src")).alias("skey"),
            (F.col("dd") * F.lit(1_000_000_000) + F.col("dst")).alias("dkey"),
        )
    )
    o = ed.select(
        F.when(F.col("skey") < F.col("dkey"), F.col("src")).otherwise(F.col("dst")).alias("a"),
        F.when(F.col("skey") < F.col("dkey"), F.col("dst")).otherwise(F.col("src")).alias("b"),
    ).persist()
    adj = _oriented_adj(o)
    tri = (
        o.join(adj.select(F.col("a"), F.col("nbrs").alias("na")), "a")
        .join(adj.select(F.col("a").alias("b"), F.col("nbrs").alias("nb")), "b")
        .select("a", "b", F.explode(F.array_intersect("na", "nb")).alias("w"))
    )
    edge_opp = lambda x, y, opp: F.struct(  # noqa: E731
        F.least(x, y).alias("src"), F.greatest(x, y).alias("dst"), opp.alias("opp")
    )
    attributions = tri.select(
        F.explode(
            F.array(
                edge_opp(F.col("a"), F.col("b"), F.col("w")),
                edge_opp(F.col("a"), F.col("w"), F.col("b")),
                edge_opp(F.col("b"), F.col("w"), F.col("a")),
            )
        ).alias("p")
    ).select(F.col("p.src").alias("src"), F.col("p.dst").alias("dst"), F.col("p.opp").alias("opp"))
    score = (
        attributions.join(F.broadcast(du.select(F.col("node").alias("opp"), "u")), "opp")
        .groupBy("src", "dst")
        .agg(
            F.sum("u").cast("long").alias("aa_units"),
            F.count(F.lit(1)).cast("long").alias("n_common"),
        )
    )
    out = (
        e.join(score, ["src", "dst"], "left")
        .select(
            "src",
            "dst",
            F.coalesce(F.col("n_common"), F.lit(0)).cast("long").alias("n_common"),
            (F.coalesce(F.col("aa_units"), F.lit(0)).cast("double") / 1000000).alias(
                "adamic_adar"
            ),
        )
        .orderBy(F.col("adamic_adar").desc(), "src", "dst")
        .limit(50)
    )
    out = out.transform(materialize)
    for df in (e, deg, o):
        df.unpersist()
    return out


@register(
    "graph_modularity",
    oracle=f"""
WITH e AS ({_EDGES_SQL}),
eb AS (
  SELECT sa.p_brand AS bs, sb.p_brand AS bd
  FROM e
  JOIN part sa ON e.src = sa.p_partkey
  JOIN part sb ON e.dst = sb.p_partkey
),
mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM eb),
wb AS (
  SELECT bs AS brand, CAST(COUNT(*) AS BIGINT) AS e_within
  FROM eb WHERE bs = bd GROUP BY bs
),
db AS (
  SELECT brand, CAST(COUNT(*) AS BIGINT) AS d_sum
  FROM (SELECT bs AS brand FROM eb UNION ALL SELECT bd FROM eb)
  GROUP BY brand
),
per AS (
  SELECT db.brand,
         COALESCE(wb.e_within, 0) AS e_within,
         db.d_sum,
         4 * mm.m * COALESCE(wb.e_within, 0) - db.d_sum * db.d_sum
           AS contrib_num
  FROM db LEFT JOIN wb ON db.brand = wb.brand CROSS JOIN mm
),
tot AS (SELECT CAST(SUM(contrib_num) AS BIGINT) AS q_num FROM per)
SELECT per.brand, per.e_within, per.d_sum, CAST(per.contrib_num AS BIGINT) AS contrib_num,
       FLOOR(CAST(tot.q_num AS DOUBLE) / (4.0 * mm.m * mm.m) * 1000000 + 0.5)
         / 1000000 AS modularity_q
FROM per CROSS JOIN tot CROSS JOIN mm
""",
    tier="T2",
)
def graph_modularity(spark, sf_dir):
    """Newman modularity of the brand partition over the co-purchase graph:
    do customers co-purchase WITHIN part brands more than a degree-matched
    random graph predicts? Q = Σ_c [e_c/m − (d_c/2m)²] where e_c = edges
    inside community c, d_c = degree sum of c's nodes, m = |edges| — the
    community-quality score every clustering pipeline reports.

    Exact-integer form: 4m²·Q = Σ_c (4·m·e_c − d_c²), so each brand's
    contribution and the global numerator are exact int64 (4m² ≈ 2.3e13 at
    sf0.1; overflows int64 around m ≈ 1.5e9 edges ≈ SF 60 — carry the
    contribution as DECIMAL(38,0) beyond that). Q itself is ONE IEEE
    division of exact integers, half-up 6dp.

    Scale notes: edges come from the shared posting-list basket builder
    (one l_orderkey shuffle); brand labels attach via two broadcast joins
    of the part dim; d_c/e_c are partial+final aggregates over 25 brands;
    m and the Q numerator are 1-row broadcast scalars (the audited
    scalar-subquery crossJoin pattern).
    """
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    e = _edges(spark, sf_dir)
    eb = (
        e.join(
            F.broadcast(part.select(F.col("p_partkey").alias("src"), F.col("p_brand").alias("bs"))),
            "src",
        )
        .join(
            F.broadcast(part.select(F.col("p_partkey").alias("dst"), F.col("p_brand").alias("bd"))),
            "dst",
        )
        .select("bs", "bd")
    )
    eb = eb.persist()
    mm = eb.agg(F.count(F.lit(1)).cast("long").alias("m"))
    wb = (
        eb.filter(F.col("bs") == F.col("bd"))
        .groupBy(F.col("bs").alias("brand"))
        .agg(F.count(F.lit(1)).cast("long").alias("e_within"))
    )
    db = (
        eb.selectExpr("bs AS brand")
        .unionAll(eb.selectExpr("bd AS brand"))
        .groupBy("brand")
        .agg(F.count(F.lit(1)).cast("long").alias("d_sum"))
    )
    per = (
        db.join(F.broadcast(wb), "brand", "left")
        .crossJoin(F.broadcast(mm))
        .select(
            "brand",
            F.coalesce("e_within", F.lit(0)).cast("long").alias("e_within"),
            "d_sum",
            (
                4 * F.col("m") * F.coalesce("e_within", F.lit(0))
                - F.col("d_sum") * F.col("d_sum")
            )
            .cast("long")
            .alias("contrib_num"),
        )
    )
    tot = per.agg(F.sum("contrib_num").cast("long").alias("q_num"))
    return (
        per.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(mm))
        .select(
            "brand",
            "e_within",
            "d_sum",
            "contrib_num",
            (
                F.floor(
                    F.col("q_num").cast("double")
                    / (4.0 * F.col("m") * F.col("m"))
                    * 1000000
                    + F.lit(0.5)
                )
                / 1000000
            ).alias("modularity_q"),
        )
    )


@register(
    "graph_assortativity",
    oracle=f"""
WITH e AS ({_EDGES_SQL}),
und AS (SELECT src AS node, dst AS nbr FROM e
        UNION ALL SELECT dst, src FROM e),
deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM und GROUP BY node),
ed AS (
  SELECT da.d AS x, db.d AS y
  FROM und JOIN deg da ON da.node = und.node
           JOIN deg db ON db.node = und.nbr
),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m2,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM ed
)
SELECT m2, sx, sxy,
       FLOOR((CAST(m2 AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / sqrt((CAST(m2 AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * (CAST(m2 AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
             * 1000000 + 0.5) / 1000000 AS assortativity
FROM mom
""",
    tier="T2",
)
def graph_assortativity(spark, sf_dir):
    """Degree assortativity of the co-purchase graph: Pearson correlation
    of endpoint degrees over all DIRECTED edge instances (each undirected
    edge counted both ways, the Newman convention) — do hubs link to hubs
    (r > 0, social-network-like) or to leaves (r < 0,
    hub-and-spoke/retail-like)? The one-number structure summary that
    predicts how the graph responds to hub removal and how skewed the
    join fan-out will be.

    Determinism: degrees and all five moments are exact int64; r is ONE
    fixed IEEE expression, half-up 6dp. Headroom: Σx·y ≤ 2m·d_max² —
    int64-safe past 1e9 edges for d_max ~ 1e4. Scale note: one degree
    aggregate, two broadcastable degree joins onto the edge list (degree
    tables are |nodes|-sized), one partial+final moment pass — no
    quadratic anything.
    """
    e = _edges(spark, sf_dir)
    und = e.selectExpr("src AS node", "dst AS nbr").unionAll(
        e.selectExpr("dst AS node", "src AS nbr")
    )
    deg = und.groupBy("node").agg(F.count(F.lit(1)).cast("long").alias("d"))
    ed = (
        und.join(deg.select(F.col("node"), F.col("d").alias("x")), "node")
        .join(
            deg.select(F.col("node").alias("nbr"), F.col("d").alias("y")),
            "nbr",
        )
        .select("x", "y")
    )
    mom = ed.agg(
        F.count(F.lit(1)).cast("long").alias("m2"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    num = F.col("m2").cast("double") * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    den = F.sqrt(
        (F.col("m2").cast("double") * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        * (F.col("m2").cast("double") * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
    )
    return mom.select(
        "m2",
        "sx",
        "sxy",
        (F.floor(num / den * 1000000 + F.lit(0.5)) / 1000000).alias("assortativity"),
    )


_LPA_ITERS = 3

_LPA_SQL = f"""
WITH e AS ({_EDGES_SQL}),
und AS (SELECT src AS node, dst AS nbr FROM e
        UNION ALL SELECT dst, src FROM e),
l0 AS (SELECT DISTINCT node, node AS lbl FROM und),
c1 AS (SELECT u.node, l.lbl, COUNT(*) AS c
       FROM und u JOIN l0 l ON l.node = u.nbr GROUP BY u.node, l.lbl),
l1 AS (SELECT node, MIN(lbl) AS lbl FROM
         (SELECT node, lbl, c, MAX(c) OVER (PARTITION BY node) AS mx FROM c1)
       WHERE c = mx GROUP BY node),
c2 AS (SELECT u.node, l.lbl, COUNT(*) AS c
       FROM und u JOIN l1 l ON l.node = u.nbr GROUP BY u.node, l.lbl),
l2 AS (SELECT node, MIN(lbl) AS lbl FROM
         (SELECT node, lbl, c, MAX(c) OVER (PARTITION BY node) AS mx FROM c2)
       WHERE c = mx GROUP BY node),
c3 AS (SELECT u.node, l.lbl, COUNT(*) AS c
       FROM und u JOIN l2 l ON l.node = u.nbr GROUP BY u.node, l.lbl),
l3 AS (SELECT node, MIN(lbl) AS lbl FROM
         (SELECT node, lbl, c, MAX(c) OVER (PARTITION BY node) AS mx FROM c3)
       WHERE c = mx GROUP BY node)
SELECT lbl AS community, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM l3 GROUP BY lbl
ORDER BY n_nodes DESC, community LIMIT 50
"""


@register("graph_label_propagation", oracle=_LPA_SQL, tier="T2")
def graph_label_propagation(spark, sf_dir):
    """Community detection by synchronous label propagation over the
    co-purchase graph, 3 iterations: every node starts labeled with its
    own id; each round it adopts the MODE of its neighbors' labels with
    ties broken by MIN label — the determinism pin that makes an
    otherwise order-sensitive algorithm (classic async LPA depends on
    visit order) oracle-checkable: count → windowed max → filter → min is
    spelled identically in both engines, all integer. Distinct from
    dedup_connected_components (min-label to fixpoint = components);
    mode-propagation finds DENSE regions inside a component. Output: the
    top-50 communities by size after round 3.

    Scale note: each round is exactly one hash join (labels ⋈ undirected
    edges on the neighbor key) + one (node, lbl) count + one per-node
    argmax — three shuffles/round, all keyed on node ids, so
    pre-partitioning edges on nbr makes label tables arrive co-located
    every round. The edge table is persisted once and reused by all
    rounds (4 consumers); labels stay O(nodes). Fixed iteration count =
    bounded lineage; at 100 TB checkpoint every few rounds as pagerank
    does.
    """
    e = _edges(spark, sf_dir)
    und = (
        e.selectExpr("src AS node", "dst AS nbr")
        .unionAll(e.selectExpr("dst AS node", "src AS nbr"))
        .persist()
    )
    labels = und.select("node").distinct().withColumn("lbl", F.col("node"))
    from pyspark.sql.window import Window

    w = Window.partitionBy("node")
    for _ in range(_LPA_ITERS):
        cnt = (
            und.join(
                labels.withColumnRenamed("node", "nbr"), "nbr"
            )
            .groupBy("node", "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            cnt.withColumn("mx", F.max("c").over(w))
            .filter(F.col("c") == F.col("mx"))
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
        )
    out = (
        labels.groupBy(F.col("lbl").alias("community"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        .orderBy(F.col("n_nodes").desc(), "community")
        .limit(50)
    ).transform(materialize)
    und.unpersist()
    return out


# ----------------------------------------------------------------- HITS

_HITS_UNITS = 10**12
_HITS_ROUNDS = 2
_HITS_EDGES_SQL = """
SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
"""


def _hits_oracle() -> str:
    u = _HITS_UNITS
    base = f"""
WITH e AS ({_HITS_EDGES_SQL}),
h0 AS (SELECT DISTINCT c, CAST({u} AS BIGINT) AS h FROM e)"""
    steps = []
    prev_h = "h0"
    for i in range(1, _HITS_ROUNDS + 1):
        steps.append(
            f""",
ar{i} AS (SELECT e.p, CAST(SUM({prev_h}.h) AS BIGINT) AS raw
          FROM e JOIN {prev_h} USING (c) GROUP BY e.p),
ad{i} AS (SELECT GREATEST(CAST(SUM(raw) AS BIGINT) // {u}, 1) AS dn FROM ar{i}),
a{i} AS (SELECT p, raw // (SELECT dn FROM ad{i}) AS a FROM ar{i}),
hr{i} AS (SELECT e.c, CAST(SUM(a{i}.a) AS BIGINT) AS raw
          FROM e JOIN a{i} USING (p) GROUP BY e.c),
hd{i} AS (SELECT GREATEST(CAST(SUM(raw) AS BIGINT) // {u}, 1) AS dn FROM hr{i}),
h{i} AS (SELECT c, raw // (SELECT dn FROM hd{i}) AS h FROM hr{i})"""
        )
        prev_h = f"h{i}"
    return (
        base
        + "".join(steps)
        + f"""
SELECT p AS partkey, a AS auth_units
FROM a{_HITS_ROUNDS}
ORDER BY auth_units DESC, partkey
LIMIT 20
"""
    )


@register("graph_hits", oracle=_hits_oracle(), tier="T2")
def graph_hits(spark, sf_dir):
    """HITS hubs-and-authorities on the directed customer→part purchase
    graph (edge = customer ever ordered the part): 2 full (authority, hub)
    rounds, top-20 parts by authority — 'which parts do the broadest
    well-connected buyers converge on', the bipartite companion to
    graph_pagerank's symmetric ranking. ORACLE-CHECKED: scores are exact
    int64 fixed-point (1e-12 L1 mass), each step renormalizes by the
    truncated integer denominator GREATEST(Σraw DIV 1e12, 1), so every
    score is bit-identical regardless of partitioning; the DuckDB twin
    unrolls the rounds as chained CTE stages.

    Determinism: sums of int64 over in/out-edges, floor division of
    non-negative numerators only (Spark DIV ≡ DuckDB //). Int64 headroom:
    Σraw ≤ |edges|·1e12 — safe to ~9M distinct (customer, part) edges;
    beyond, drop UNITS to 1e9 or carry Σ as DECIMAL(38,0).
    Scale: the distinct edge list is built in one shuffle and persisted
    hash-partitioned; each half-step is one partial+final aggregate over
    the edges joined with the |nodes|-row score vector, plus an audited
    broadcast 1-row normalizer crossjoin — no per-edge state is ever
    materialized beyond the persisted edge list itself.
    """
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    e = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
        .persist()
    )
    u = _HITS_UNITS
    h = e.select("c").distinct().withColumn("h", F.lit(u).cast("long"))

    def _norm(raw_df, key, raw_col, out_col):
        # materialize the half-step ONCE: the normalizer aggregate and the
        # crossJoin both consume raw_df, and without a cut each would
        # re-execute the entire chained plan of every previous round
        # (measured 10.3 s → 4.2 s warm at sf0.1 from this one line; the
        # remaining cost is the customer→part edge build + 4 half-steps)
        raw_df = raw_df.transform(materialize)
        dn = raw_df.agg(
            F.greatest(F.expr(f"CAST(SUM({raw_col}) AS BIGINT) DIV {u}"), F.lit(1))
            .cast("long")
            .alias("dn")
        )
        return raw_df.crossJoin(F.broadcast(dn)).select(
            key, F.expr(f"{raw_col} DIV dn").alias(out_col)
        )

    a = None
    for _ in range(_HITS_ROUNDS):
        a_raw = (
            e.join(h, "c").groupBy("p").agg(F.sum("h").cast("long").alias("raw"))
        )
        a = _norm(a_raw, "p", "raw", "a")
        h_raw = (
            e.join(a, "p").groupBy("c").agg(F.sum("a").cast("long").alias("raw"))
        )
        h = _norm(h_raw, "c", "raw", "h")
    out = (
        a.select(F.col("p").alias("partkey"), F.col("a").alias("auth_units"))
        .orderBy(F.col("auth_units").desc(), "partkey")
        .limit(20)
    )
    out = out.transform(materialize)
    e.unpersist()
    return out


# ------------------------------------------------------ Katz centrality

_KATZ_SQL = f"""
WITH e AS ({_EDGES_SQL}),
und AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
x1 AS (
  SELECT dst AS node, 1000 + CAST(COUNT(*) * 1000 AS BIGINT) // 8 AS x
  FROM und GROUP BY dst
),
x2 AS (
  SELECT u.dst AS node, 1000 + CAST(SUM(x1.x) AS BIGINT) // 8 AS x
  FROM und u JOIN x1 ON x1.node = u.src GROUP BY u.dst
),
x3 AS (
  SELECT u.dst AS node, 1000 + CAST(SUM(x2.x) AS BIGINT) // 8 AS x
  FROM und u JOIN x2 ON x2.node = u.src GROUP BY u.dst
)
SELECT CAST(node AS BIGINT) AS node, CAST(x AS BIGINT) AS katz_milli
FROM x3
ORDER BY katz_milli DESC, node
LIMIT 20
"""


@register("graph_katz_centrality", oracle=_KATZ_SQL, tier="T2")
def graph_katz_centrality(spark, sf_dir):
    """Katz centrality (3 synchronous iterations, attenuation α=1/8, unit
    base) over the co-purchase graph: x⁰=1, xᵏ⁺¹(v) = 1 + α·Σ_{u~v} xᵏ(u)
    — the walk-counting centrality that, unlike degree, rewards being
    adjacent to well-connected nodes, and unlike PageRank does not
    normalize by the neighbour's out-degree. Top-20 by score.

    Determinism: milli-unit integer fixed point — each iteration is an
    exact int64 neighbour sum followed by ONE truncating DIV 8 on
    non-negative operands (÷ ≡ // cross-engine); no float exists. The α
    literal 1/8 keeps the 3-hop value ≤ ~1e9 on a graph with 1e3-degree
    hubs (int64 headroom to α·deg ≈ 2^40).

    Scale note: each iteration is one hash join of the undirected edge
    list against the |V|-row score vector plus one partial+final aggregate
    on dst — the textbook message-passing shape. At 100 TB pre-partition
    edges and scores on the same key ONCE and persist, so every iteration
    reuses the exchange (the graph_pagerank recipe, graph.py:~380); the
    fixed 3-iteration unroll is what keeps the oracle expressible.
    """
    e = _edges(spark, sf_dir)
    und = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # SHUFFLE_HASH hint on the skinny score vector (the graph_pagerank
    # recipe): the unhinted plan is SortMergeJoin, which SORTS all |2E|
    # edge rows inside EVERY iteration; the hint replaces those sorts with
    # a per-partition hash build of |V|/P score rows. Interleaved A/B at
    # sf0.1: 2.27 vs 3.37 s and 1.96 vs 2.87 s (~33%, hint wins both).
    # The per-iteration edge Exchange(src) subtrees are identical, so
    # physical-planning exchange reuse ships the edge bytes once per run;
    # pre-partitioning the persisted edge list on src additionally gives
    # zero per-iteration edge exchange even without reuse — the 100 TB
    # deployment shape. Round-12 measurement (VERDICT r11 item 5): the
    # pre-partition LOSES ~0.2-0.4 s at sf0.1 (the extra cache-build
    # barrier outweighs the reuse it makes redundant on a 1.2M-edge graph)
    # but WINS at sf1 — trimmed interleaved A/B on the 12M-edge scaled
    # graph: 4.10 s pre-partitioned vs 4.83 s (~15%), both harnesses
    # agreeing — so the default is SCALE-ADAPTIVE (guide §2: derive the
    # partitioning decision from input size, not a constant tuned for one
    # scale): pre-partition when the lineitem input exceeds 64 MB (the
    # measured crossover lies between 11 MB/sf0.1 and 184 MB/sf1; unknown
    # size defaults to pre-partitioned, the production-safe side).
    # SWALLOW_KATZ_REPART=0/1 forces either form for A/B.
    # SWALLOW_KATZ_SMJ=1 restores the pre-round-11 SMJ form for A/B.
    old_shape = os.environ.get("SWALLOW_KATZ_SMJ", "0") == "1"
    forced = os.environ.get("SWALLOW_KATZ_REPART")
    if forced is not None and forced != "":
        repart = forced == "1"
    else:
        from ..io import table_path

        try:
            repart = os.path.getsize(table_path(sf_dir, "lineitem")) >= 64 << 20
        except OSError:
            repart = True
    if repart:
        und = und.repartition("src")
    und = und.persist()
    x = und.groupBy(F.col("dst").alias("node")).agg(
        (F.lit(1000) + F.expr("CAST(COUNT(*) * 1000 AS BIGINT) DIV 8")).alias("x")
    )
    for _ in range(2):
        x = (
            und.join(
                x if old_shape else x.hint("shuffle_hash"),
                und.src == x.node,
            )
            .groupBy(und.dst.alias("node2"))
            .agg(
                (F.lit(1000) + F.expr("CAST(SUM(x) AS BIGINT) DIV 8")).alias("x")
            )
            .withColumnRenamed("node2", "node")
        )
    out = (
        x.select(
            F.col("node").cast("long").alias("node"),
            F.col("x").cast("long").alias("katz_milli"),
        )
        .orderBy(F.col("katz_milli").desc(), "node")
        .limit(20)
    )
    rows = out.transform(materialize)
    und.unpersist()
    return rows


_LOCAL_CC_SQL = f"""
WITH e AS ({_EDGES_SQL}),
tri AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM e e1
  JOIN e e2 ON e1.dst = e2.src
  JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
per_node AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri
  FROM (SELECT unnest([a, b, c]) AS node FROM tri)
  GROUP BY node
),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS d
  FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
  GROUP BY node
)
SELECT deg.node, deg.d, COALESCE(per_node.n_tri, 0) AS n_tri,
       CAST(COALESCE(per_node.n_tri, 0) * 2000000 // (deg.d * (deg.d - 1))
            AS BIGINT) AS local_cc_micro
FROM deg LEFT JOIN per_node USING (node)
WHERE deg.d >= 2
ORDER BY local_cc_micro DESC, deg.node
LIMIT 100
"""


@register("graph_local_clustering", oracle=_LOCAL_CC_SQL, tier="T2")
def graph_local_clustering(spark, sf_dir):
    """Per-node local clustering coefficient of the co-purchase graph:
    cc(v) = triangles_at(v) / (d(v)·(d(v)−1)/2) — the node-level
    neighborhood-density score (global clustering is
    [[graph_triangle_count]]'s single ratio; this is its distribution).
    Top-100 nodes by (cc desc, node).

    Determinism: triangle counts and degrees are exact integers; the
    coefficient is one non-negative micro `//` (2·tri·1e6 // d(d−1),
    d ≥ 2 enforced on both sides).

    Scale note: triangles come from the Schank–Wagner oriented listing
    (edges oriented by increasing packed (degree, id) key, common
    out-neighbors intersected IN-ROW), so each triangle is produced once
    at its minimum-key vertex and then attributed to its three VERTICES —
    the [[graph_adamic_adar]] machinery with vertex attribution instead of
    edge attribution. One adjacency groupBy + one node-keyed shuffle of
    3·|triangles| attributions; oriented out-degree is arboricity-bounded
    O(√E), so no hub straggler at 100 TB. The oracle keeps the canonical
    3-join spelling — identical triangle set by construction.
    """
    e = _edges(spark, sf_dir).persist()
    und = e.selectExpr("src AS node").unionAll(e.selectExpr("dst AS node"))
    deg = und.groupBy("node").agg(F.count(F.lit(1)).alias("d")).persist()
    ed = (
        e.join(deg.select(F.col("node").alias("src"), F.col("d").alias("sd")), "src")
        .join(deg.select(F.col("node").alias("dst"), F.col("d").alias("dd")), "dst")
        .select(
            "src",
            "dst",
            (F.col("sd") * F.lit(1_000_000_000) + F.col("src")).alias("skey"),
            (F.col("dd") * F.lit(1_000_000_000) + F.col("dst")).alias("dkey"),
        )
    )
    o = ed.select(
        F.when(F.col("skey") < F.col("dkey"), F.col("src")).otherwise(F.col("dst")).alias("a"),
        F.when(F.col("skey") < F.col("dkey"), F.col("dst")).otherwise(F.col("src")).alias("b"),
    ).persist()
    # Round-12 (VERDICT r11 item 3 — the packed-bitset intersect): measured
    # and REJECTED on this graph's density. At sf0.1 the oriented adjacency
    # has avg out-degree 60 (p50 68, max 97) over 1.196M edges, so a
    # <=2-word (128-bit) hash signature is ~37% full and an empty-AND
    # prefilter passes ~everything (P(AND=0 | truly disjoint) ~ 1e-8),
    # while only 31.6% of the 1.19M joined edge pairs have an empty
    # intersection at all; an EXACT bitmap over the 20k-node universe is
    # 313 int64 words/row vs the avg-60-element arrays it would replace
    # (5x the shipped bytes). Component timings (probe, round 12): the
    # broadcast join SHIPPING the two arrays costs ~2.4 s with or without
    # the intersect+explode on top — the intersect is not the bottleneck,
    # copying ~132M array elements through the join projections is, and
    # that is the algorithm's working set (the wedge-join alternative was
    # already measured dead in r11: 41M wedge rows through a shuffle).
    # The shared-adjacency materialize was also measured — tie-to-loss,
    # kept opt-in; see _oriented_adj.
    adj = _oriented_adj(o)
    tri = (
        o.join(adj.select(F.col("a"), F.col("nbrs").alias("na")), "a")
        .join(adj.select(F.col("a").alias("b"), F.col("nbrs").alias("nb")), "b")
        .select("a", "b", F.explode(F.array_intersect("na", "nb")).alias("w"))
    )
    per_node = (
        tri.select(F.explode(F.array("a", "b", "w")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tri"))
    )
    out = (
        deg.filter(F.col("d") >= 2)
        .join(per_node, "node", "left")
        .select(
            "node",
            F.col("d").cast("long").alias("d"),
            F.coalesce(F.col("n_tri"), F.lit(0)).cast("long").alias("n_tri"),
            F.expr(
                "CAST(COALESCE(n_tri, 0) * 2000000 DIV (d * (d - 1)) AS BIGINT)"
            ).alias("local_cc_micro"),
        )
        .orderBy(F.col("local_cc_micro").desc(), "node")
        .limit(100)
    )
    out = out.transform(materialize)
    for df in (e, deg, o):
        df.unpersist()
    return out


_CLOSENESS_HOPS = 4
# exact micro-unit reciprocal-distance weights 1/d for d = 1..4 (baked
# integers — the eval_retrieval_ndcg rule for quantized reciprocals)
_HARMONIC_W = {1: 1000000, 2: 500000, 3: 333333, 4: 250000}

_CLOSENESS_SQL = f"""
WITH RECURSIVE e AS ({_EDGES_SQL}),
und AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
lm AS (
  SELECT node FROM (SELECT DISTINCT src AS node FROM und)
  ORDER BY node LIMIT 5
),
walk(lmk, node, d) AS (
  SELECT node, node, 0 FROM lm
  UNION
  -- UNION (not ALL): per-step dedup of (lmk, node, d) keeps the working
  -- set bounded by |reached| per depth instead of enumerating every path
  -- (path enumeration is exponential on this dense co-purchase graph)
  SELECT DISTINCT w.lmk, und.dst, w.d + 1
  FROM walk w JOIN und ON und.src = w.node
  WHERE w.d < {_CLOSENESS_HOPS}
),
dist AS (SELECT lmk, node, CAST(MIN(d) AS BIGINT) AS d
         FROM walk GROUP BY lmk, node),
reached AS (SELECT lmk, node, d FROM dist WHERE d > 0)
SELECT lmk AS landmark,
       CAST(COUNT(*) AS BIGINT) AS n_reached,
       CAST(SUM(d) AS BIGINT) AS sum_d,
       CAST(SUM(CASE d WHEN 1 THEN {_HARMONIC_W[1]} WHEN 2 THEN {_HARMONIC_W[2]}
                       WHEN 3 THEN {_HARMONIC_W[3]} ELSE {_HARMONIC_W[4]} END)
            AS BIGINT) AS harmonic_micro
FROM reached
GROUP BY lmk
"""


@register("graph_closeness_landmarks", oracle=_CLOSENESS_SQL, tier="T2")
def graph_closeness_landmarks(spark, sf_dir):
    """Hop-bounded harmonic centrality of 5 deterministic landmark nodes
    (the smallest part keys in the co-purchase graph): HC = Σ 1/d(v) over
    nodes reached within 4 hops — the landmark-sampling estimator used
    when all-pairs closeness is unaffordable, and harmonic (not classic
    closeness) so disconnected remainders contribute 0 instead of
    poisoning the mean.

    Determinism: PURE int64 — BFS levels are exact (MIN(d) collapses the
    oracle CTE's multiplicity to true distance), and 1/d is the baked
    micro-unit table {{1: 1000000, 2: 500000, 3: 333333, 4: 250000}}
    (quantized reciprocals as integer constants, the NDCG-weights rule, so
    no division crosses the hash).

    Scale note: ONE multi-source frontier BFS carrying (landmark, node) —
    5 landmarks share each hop's edge join instead of 5 sequential
    traversals; frontier and visited sets broadcast (bounded by 5·reach),
    the persisted edge table never re-shuffles, localCheckpoint truncates
    per-hop lineage ([[graph_shortest_hops]] discipline). Fixed hop bound
    ⇒ static plan depth at any data scale.
    """
    e = _edges(spark, sf_dir)
    und = (
        e.select("src", "dst")
        .union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .persist()
    )
    seeds = (
        und.select("src").distinct().orderBy("src").limit(5)
        .select(F.col("src").alias("lmk"), F.col("src").alias("node"))
    )
    dist = seeds.withColumn("d", F.lit(0)).transform(materialize)
    frontier = dist.select("lmk", "node")
    for hop in range(1, _CLOSENESS_HOPS + 1):
        # Anti-join against the broadcast visited set BEFORE the distinct,
        # so the hop's only exchange carries just the UNVISITED expansions
        # (guide §2.3). Round-11 finding: Catalyst's PushDownLeftSemiAntiJoin
        # already performs this rewrite — the former distinct-then-anti
        # spelling compiled to the IDENTICAL physical plan (captured in
        # plans/r11/graph_closeness_landmarks_hop_{before,after}.txt, diff
        # empty modulo expr ids; interleaved A/B "same") — the source now
        # simply matches what runs. Also measured: replacing the per-hop
        # materialize with one 4-hop DAG is a 2.4x LOSS (16.6 vs 6.9 s —
        # hop i's subtree recomputes inside every later hop's lineage), so
        # the per-hop cut stays.
        nxt = (
            und.join(F.broadcast(frontier), und["src"] == frontier["node"])
            .select("lmk", und["dst"].alias("node"))
            .join(
                F.broadcast(dist.select("lmk", "node")),
                ["lmk", "node"],
                "left_anti",
            )
            .distinct()
            .withColumn("d", F.lit(hop))
            .transform(materialize)
        )
        dist = dist.union(nxt)
        frontier = nxt.select("lmk", "node")
        if nxt.isEmpty():
            break
    w = F.expr(
        "CASE d WHEN 1 THEN {w1} WHEN 2 THEN {w2} WHEN 3 THEN {w3} "
        "ELSE {w4} END".format(
            w1=_HARMONIC_W[1], w2=_HARMONIC_W[2], w3=_HARMONIC_W[3],
            w4=_HARMONIC_W[4],
        )
    )
    out = (
        dist.filter(F.col("d") > 0)
        .groupBy(F.col("lmk").alias("landmark"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_reached"),
            F.sum("d").cast("long").alias("sum_d"),
            F.sum(w).cast("long").alias("harmonic_micro"),
        )
    )
    out = out.transform(materialize)
    und.unpersist()
    return out


# ------------------------------------- personalized PageRank (round 9)
# PPR with restart to a small seed set — the recommendation/expansion
# primitive ("parts related to THESE parts") that global graph_pagerank
# cannot answer. Same exact-int64 fixed-point recipe: the restart mass is
# R0 split over the seeds, every iteration is
#   r = 15*v DIV 100 + 85*contribs DIV 100
# with floor division, so the result is partition-order independent and
# the DuckDB twin unrolls the iterations as chained CTEs.
_PPR_ITERS = 4
_PPR_TOPK = 30
_PPR_SEEDS = 3


def _ppr_oracle() -> str:
    base = f"""
WITH e0 AS ({_EDGES_SQL}),
edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
ed AS (SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d USING (src)),
nodes AS (SELECT DISTINCT src AS node FROM edges),
seeds AS (SELECT node FROM nodes ORDER BY node LIMIT {_PPR_SEEDS}),
sv AS (SELECT node,
              CAST({_PR_R0} // GREATEST((SELECT COUNT(*) FROM seeds), 1)
                   AS BIGINT) AS v
       FROM seeds),
r0 AS (SELECT n.node, CAST(COALESCE(sv.v, 0) AS BIGINT) AS r
       FROM nodes n LEFT JOIN sv USING (node))"""
    steps = []
    for i in range(1, _PPR_ITERS + 1):
        steps.append(
            f""",
c{i} AS (SELECT ed.dst AS node, SUM(r{i - 1}.r // ed.deg) AS csum
         FROM ed JOIN r{i - 1} ON ed.src = r{i - 1}.node GROUP BY ed.dst),
r{i} AS (SELECT nodes.node,
                CAST(15 * COALESCE(sv.v, 0) // 100
                     + 85 * COALESCE(c{i}.csum, 0) // 100 AS BIGINT) AS r
         FROM nodes LEFT JOIN c{i} USING (node) LEFT JOIN sv USING (node))"""
        )
    return (
        base
        + "".join(steps)
        + f"""
SELECT r.node AS node, r.r AS ppr_units,
       CAST(CASE WHEN sv.node IS NULL THEN 0 ELSE 1 END AS BIGINT) AS is_seed
FROM r{_PPR_ITERS} r LEFT JOIN sv ON sv.node = r.node
ORDER BY ppr_units DESC, r.node
LIMIT {_PPR_TOPK}
"""
    )


@register("graph_ppr_restart", oracle=_ppr_oracle(), tier="T2")
def graph_ppr_restart(spark, sf_dir):
    """Personalized PageRank (restart 0.15 to the {3} lowest part ids,
    4 fixed iterations) on the undirected co-purchase graph — "what is
    related to THESE parts": top-30 nodes by PPR mass with a seed flag.
    ORACLE-CHECKED via graph_pagerank's exact int64 fixed-point recipe
    (floor-division contributions, restart mass R0 split over the seed
    set), unrolled in DuckDB as chained CTEs.

    Determinism: identical to graph_pagerank — every quantity is int64,
    every divide floors on non-negative operands, so the scores are
    bit-identical at any partitioning; seed selection is a total order
    (ORDER BY node LIMIT k).

    Scale note: shares the cached edge view and the pagerank iteration
    shape (adjacency persisted hash-partitioned on the join key; the
    |edges| expansion lives only in-flight between explode and the
    map-side partial sum). The restart vector is a k-row broadcast. The
    asymmetric detail vs pagerank: mass DIES at non-seed dangling ends
    instead of teleporting uniformly, which is what localizes the scores
    around the seeds.
    """
    e = _edges(spark, sf_dir)
    und = e.unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    adj = (
        und.groupBy("src")
        .agg(F.collect_list("dst").alias("nbrs"))
        .withColumn("deg", F.size("nbrs"))
        .persist()
    )
    nodes = adj.select(F.col("src").alias("node"))
    seeds = nodes.orderBy("node").limit(_PPR_SEEDS)
    ns = seeds.agg(F.count(F.lit(1)).alias("n_seeds"))
    sv = materialize(
        seeds.crossJoin(F.broadcast(ns)).select(
            "node",
            F.expr(
                f"CAST({_PR_R0} DIV GREATEST(n_seeds, 1) AS BIGINT)"
            ).alias("v"),
        )
    )
    ranks = nodes.join(F.broadcast(sv), "node", "left").select(
        "node", F.coalesce(F.col("v"), F.lit(0)).cast("long").alias("r")
    )
    for _ in range(_PPR_ITERS):
        contribs = (
            adj.join(ranks, adj["src"] == ranks["node"])
            .select(
                F.explode("nbrs").alias("node"),
                F.expr("r DIV deg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("csum"))
        )
        # undirected symmetric graph: contribs covers every node, so the
        # nodes frame never needs re-joining; only the seed bonus does.
        ranks = contribs.join(F.broadcast(sv), "node", "left").select(
            "node",
            F.expr(
                "CAST(15 * COALESCE(v, 0) DIV 100"
                " + 85 * csum DIV 100 AS BIGINT)"
            ).alias("r"),
        )
    out = (
        ranks.join(F.broadcast(sv), "node", "left")
        .select(
            "node",
            F.col("r").alias("ppr_units"),
            F.when(F.col("v").isNotNull(), 1)
            .otherwise(0)
            .cast("long")
            .alias("is_seed"),
        )
        .orderBy(F.col("ppr_units").desc(), "node")
        .limit(_PPR_TOPK)
        .transform(materialize)
    )
    adj.unpersist()
    return out
