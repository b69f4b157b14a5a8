"""Iterative graph analytics on Spark DataFrames.

The reference has no graph surface; this module supplies the iterative
sparse-matvec pattern (PageRank) the same way ``dedup.py`` supplies
connected components — each iteration is a join + aggregate declared
through the DataFrame API so Catalyst plans every step, with the rank
vector broadcast (it is |V|-sized, tiny next to the edge list).

Cross-engine determinism: PageRank is a fixed point of FLOAT arithmetic,
and float summation order differs between engines — so ranks are kept in
exact fixed-point integers (scale 1e9): transition probabilities are
floor-divided integers, contributions are exact decimal sums of int×int
products, and the damping update is an integer floor-division. Both
engines then compute bit-identical BIGINT ranks; the deliberate price is
≤1 unit-in-the-last-place of floor-rounding drift per edge per iteration
(≈1e-9 of rank mass), which leaks to nowhere — it is simply dropped,
identically, by both engines.

Scale (100 TB): the edge-building join/aggregate is the heavy stage
(lineitem⋈orders⋈customer⋈supplier → 625-row edge list); the iterations
themselves touch only |E| aggregated edges. For a billion-node graph the
same plan holds with the rank vector shuffling instead of broadcasting —
the iteration is still one equi-join + one hash aggregate per step, and
lineage is truncated per round the way ``dedup.connected_components``
documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cache import persist_tracked
from ..tables import load_table

_SCALE = 1_000_000_000  # fixed-point 1e9: ranks sum to ~_SCALE
_DAMP_NUM, _DAMP_DEN = 85, 100  # damping 0.85 as an exact rational
_ITERS = 3


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the nation-level trade graph.

    Nodes are nations; a directed edge src→dst carries the number of
    lineitems a customer in ``src`` bought from a supplier in ``dst``.
    3 damped iterations (d=0.85) from a uniform start, in exact
    fixed-point (see module docstring). Returns (nation, rank_e9) with
    rank_e9 = round-down(rank × 1e9).
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")

    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    outs = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    # transition probability as floor((w * SCALE) / out_w), exact integer
    ep = (
        edges.join(outs, "src")
        .select(
            "src",
            "dst",
            F.expr(
                f"CAST(CAST(w AS DECIMAL(38,0)) * {_SCALE} DIV out_w AS BIGINT)"
            ).alias("p"),
        )
    )
    # 3 iterations + the final join all consume ep; materialize it once
    # (released by the harness's release_persists() after the query)
    ep = persist_tracked(ep)
    ep.count()

    n_nodes = n.count()  # 25 at every TPC-H SF; derived, not assumed
    base = (15 * _SCALE) // (100 * n_nodes)  # (1-d)/N in fixed-point

    ranks = n.select(
        F.col("n_nationkey").alias("node"),
        F.lit(_SCALE // n_nodes).cast("long").alias("r"),
    )
    for _ in range(_ITERS):
        contrib = (
            ep.join(F.broadcast(ranks), ep.src == F.col("node"))
            .groupBy("dst")
            .agg(
                F.sum(
                    (F.col("r") * F.col("p")).cast("decimal(38,0)")
                ).alias("s")
            )
        )
        ranks = (
            n.join(contrib, n.n_nationkey == contrib.dst, "left")
            .select(
                F.col("n_nationkey").alias("node"),
                F.expr(
                    f"CAST({base} + COALESCE(CAST(s AS DECIMAL(38,0)) * "
                    f"{_DAMP_NUM} DIV {_DAMP_DEN * _SCALE}, 0) AS BIGINT)"
                ).alias("r"),
            )
        )
    return n.join(ranks, n.n_nationkey == ranks.node).select(
        F.col("n_name").alias("nation"), F.col("r").alias("rank_e9")
    )


def _pagerank_sql() -> str:
    scale = _SCALE
    base = (
        f"(CAST(15 AS BIGINT) * {scale}) // (100 * (SELECT count(*) FROM nation))"
    )
    sql = f"""
WITH edges AS (
  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w
  FROM lineitem l
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey  = c.c_custkey
  JOIN supplier s ON l.l_suppkey  = s.s_suppkey
  GROUP BY 1, 2
),
outs AS (SELECT src, sum(w) AS out_w FROM edges GROUP BY 1),
ep AS (
  SELECT e.src, e.dst,
         CAST((CAST(e.w AS HUGEINT) * {scale}) // o.out_w AS BIGINT) AS p
  FROM edges e JOIN outs o ON e.src = o.src
),
r0 AS (
  SELECT n_nationkey AS node,
         CAST({scale} // (SELECT count(*) FROM nation) AS BIGINT) AS r
  FROM nation
)"""
    prev = "r0"
    for i in range(1, _ITERS + 1):
        sql += f""",
c{i} AS (
  SELECT ep.dst AS node, sum(CAST({prev}.r AS HUGEINT) * ep.p) AS s
  FROM ep JOIN {prev} ON ep.src = {prev}.node
  GROUP BY 1
),
r{i} AS (
  SELECT n.n_nationkey AS node,
         CAST({base} + COALESCE((c{i}.s * {_DAMP_NUM}) //
              {_DAMP_DEN * _SCALE}, 0) AS BIGINT) AS r
  FROM nation n LEFT JOIN c{i} ON n.n_nationkey = c{i}.node
)"""
        prev = f"r{i}"
    sql += f"""
SELECT n.n_name AS nation, {prev}.r AS rank_e9
FROM nation n JOIN {prev} ON n.n_nationkey = {prev}.node
"""
    return sql


GRAPH_PAGERANK_SQL = _pagerank_sql()


# ---------------------------------------------------------------------------
# Triangle counting (degree-ordered compact-forward)
# ---------------------------------------------------------------------------

# an edge exists where two brands co-occur in at least n_baskets/this orders
_TRI_SUP_DIV = 50


def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangles in the brand co-purchase graph, enumerated by the
    degree-ordered compact-forward algorithm (Latapy 2008 / Schank &
    Wagner 2005) — THE scale shape for triangle counting.

    Undirected edges connect brands co-occurring in ≥ n_orders/50 orders
    (support derived from corpus size). Each edge is then ORIENTED from
    its lower (degree, id) endpoint to its higher one; wedges are built
    only from a common SOURCE's outgoing pairs, and a wedge closes iff
    the oriented edge (v→w) exists. Orienting by degree bounds every
    node's out-degree by O(√m), so wedge fan-out is O(m^1.5) total
    regardless of degree skew — a star node that would generate deg²
    wedges under naive enumeration generates none, because a hub sorts
    LAST in (degree, id) order and keeps no out-edges. Both the Spark
    plan and the oracle use row-value (deg, id) comparisons, so the two
    engines orient identically.

    Plan: basket build (one shuffle) → pair aggregate — both
    session-shared with ``assoc_basket_rules`` via
    ``warehouse.shared_brand_baskets`` (localCheckpoint, built once) —
    → degree aggregate (tiny, broadcast) → oriented edge list → wedge
    self-join on source → closure equi-join on (v, w). All joins equi;
    no cartesian anywhere.
    """
    # session-shared basket + co-occurrence frames (localCheckpoint —
    # warehouse.shared_brand_baskets; assoc_basket_rules reads the same
    # ones, so the basket build and pair self-join run once per session)
    from .warehouse import shared_brand_baskets

    items, co_pairs, n_baskets = shared_brand_baskets(spark, sf_dir)
    pairs = co_pairs.select(
        F.col("brand_a").alias("u"), F.col("brand_b").alias("v"), "co"
    )
    edges = persist_tracked(
        pairs.filter(F.col("co") >= F.lit(n_baskets // _TRI_SUP_DIV)).select(
            "u", "v"
        )
    )
    edges.count()  # materialize: consumed by deg (twice) and orientation

    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = F.broadcast(deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_u")))
    dv = F.broadcast(deg.select(F.col("node").alias("v"), F.col("deg").alias("deg_v")))
    # orient each undirected edge from lower (deg, id) to higher (deg, id);
    # keep the destination's degree so wedge endpoints rank by the same key
    lower_first = F.struct(F.col("deg_u"), F.col("u")) < F.struct(
        F.col("deg_v"), F.col("v")
    )
    oriented = persist_tracked(
        edges.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("d"),
            F.when(lower_first, F.col("deg_v"))
            .otherwise(F.col("deg_u"))
            .alias("deg_d"),
        )
    )
    oriented.count()  # consumed by e1, e2, and the closure probe

    e1 = oriented.select(
        F.col("s").alias("u"), F.col("d").alias("v"), F.col("deg_d").alias("kv")
    )
    e2 = oriented.select(
        F.col("s").alias("u"), F.col("d").alias("w"), F.col("deg_d").alias("kw")
    )
    # order u's two out-neighbors by the SAME (deg, id) key the edges are
    # oriented by — the closing oriented edge, if it exists, is exactly
    # v→w, so closure is ONE equi join (no OR-condition nested loop)
    wedges = e1.join(e2, "u").filter(
        F.struct(F.col("kv"), F.col("v")) < F.struct(F.col("kw"), F.col("w"))
    )
    closure = oriented.select(F.col("s").alias("v"), F.col("d").alias("w"))
    tri = wedges.join(closure, ["v", "w"])
    trip = F.array_sort(F.array("u", "v", "w"))
    return tri.select(
        trip.getItem(0).alias("b1"),
        trip.getItem(1).alias("b2"),
        trip.getItem(2).alias("b3"),
    )


GRAPH_TRIANGLE_COUNT_SQL = f"""
WITH items AS (
  SELECT DISTINCT l.l_orderkey, p.p_brand AS brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
pairs AS (
  SELECT a.brand AS u, b.brand AS v, count(*) AS co
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.brand < b.brand
  GROUP BY 1, 2
),
edges AS (
  SELECT u, v FROM pairs
  WHERE co >= (SELECT count(DISTINCT l_orderkey) FROM items) // {_TRI_SUP_DIV}
),
deg AS (
  SELECT node, count(*) AS deg FROM (
    SELECT u AS node FROM edges UNION ALL SELECT v AS node FROM edges
  ) GROUP BY 1
),
oriented AS (
  SELECT CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.u ELSE e.v END AS s,
         CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.v ELSE e.u END AS d,
         CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN dv.deg ELSE du.deg END AS deg_d
  FROM edges e
  JOIN deg du ON du.node = e.u
  JOIN deg dv ON dv.node = e.v
),
wedges AS (
  SELECT e1.s AS u, e1.d AS v, e2.d AS w
  FROM oriented e1 JOIN oriented e2
    ON e1.s = e2.s AND (e1.deg_d, e1.d) < (e2.deg_d, e2.d)
)
SELECT
  list_sort([wd.u, wd.v, wd.w])[1] AS b1,
  list_sort([wd.u, wd.v, wd.w])[2] AS b2,
  list_sort([wd.u, wd.v, wd.w])[3] AS b3
FROM wedges wd JOIN oriented c
  ON wd.v = c.s AND wd.w = c.d
"""


QUERIES = {
    "graph_pagerank": graph_pagerank,
    "graph_triangle_count": graph_triangle_count,
}

ORACLES = {
    "graph_pagerank": GRAPH_PAGERANK_SQL,
    "graph_triangle_count": GRAPH_TRIANGLE_COUNT_SQL,
}


# ---------------------------------------------------------------------------
# BFS shortest hops (iterative frontier relaxation)
# ---------------------------------------------------------------------------

_BFS_ITERS = 3


def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shortest hop count from the hub nation (max total outgoing
    weight — data-derived, so every scale factor has a seed with live
    edges) over the *above-mean* trade graph: keep only edges whose
    lineitem weight is >= the mean edge weight, then run ``_BFS_ITERS``
    rounds of frontier
    relaxation — dist'(v) = min(dist(v), min over edges u->v of
    dist(u)+1) — the min-plus twin of ``graph_pagerank``'s sum-times
    iteration. Unreached nations report hops = -1.

    Plan per round: one equi-join (distance vector broadcast — it is
    |V|-sized, tiny next to the edge list) + one hash min-aggregate; at
    a billion nodes the vector shuffles instead of broadcasting and the
    round is still join + aggregate, the Pregel shape. All arithmetic
    integer, so both engines agree exactly.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")

    weights = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("src") != F.col("dst"))
    )
    # three consumers (mean, seed, edge filter): materialize once
    weights = persist_tracked(weights)
    weights.count()
    mean_w = weights.agg(
        (F.sum("w") / F.count(F.lit(1))).alias("mw")
    )
    edges = persist_tracked(
        weights.crossJoin(F.broadcast(mean_w))
        .filter(F.col("w") >= F.col("mw"))
        .select("src", "dst")
    )
    edges.count()  # consumed once per BFS round

    seed = (
        weights.groupBy("src")
        .agg(F.sum("w").alias("out_w"))
        .agg(
            F.min_by(
                "src", F.struct((-F.col("out_w")).alias("nw"), F.col("src"))
            ).alias("seed")
        )
    )
    # the distance vector is |V| rows and every round references it
    # TWICE (frontier filter + union): localCheckpoint per round keeps
    # the plan one-round deep instead of doubling per iteration (the r7
    # census measured 27 distinct exchanges / 24 broadcasts for a
    # 3-round loop on a 25-node vector; checkpointed: one join + one
    # aggregate per round, the Pregel shape the docstring claims)
    dist = n.crossJoin(F.broadcast(seed)).select(
        F.col("n_nationkey").alias("node"),
        F.when(F.col("n_nationkey") == F.col("seed"), F.lit(0)).alias("d"),
    ).localCheckpoint()
    for _ in range(_BFS_ITERS):
        relaxed = (
            edges.join(
                F.broadcast(dist.filter(F.col("d").isNotNull())),
                edges.src == F.col("node"),
            )
            .select(F.col("dst").alias("node"), (F.col("d") + 1).alias("d"))
        )
        dist = (
            dist.unionAll(relaxed)
            .groupBy("node")
            .agg(F.min("d").alias("d"))
        ).localCheckpoint()
    return n.join(dist, n.n_nationkey == dist.node).select(
        F.col("n_name").alias("nation"),
        F.coalesce(F.col("d"), F.lit(-1)).alias("hops"),
    )


def _bfs_sql() -> str:
    # every CTE referenced more than once is MATERIALIZED: DuckDB
    # re-inlines plain CTEs per consumer (weights feeds the mean, the
    # seed, and the edge filter; each d_i feeds the next round twice),
    # which overran the oracle harness's memory budget at sf0.1 — the
    # same fix DEDUP_COMPONENTS_SQL documents
    sql = f"""
WITH weights AS MATERIALIZED (
  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w
  FROM lineitem l
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey  = c.c_custkey
  JOIN supplier s ON l.l_suppkey  = s.s_suppkey
  GROUP BY 1, 2
  HAVING c.c_nationkey <> s.s_nationkey
),
edges AS MATERIALIZED (
  SELECT src, dst FROM weights
  WHERE w >= (SELECT sum(w) / count(*) FROM weights)
),
seed AS (
  SELECT src AS seed FROM weights
  GROUP BY src ORDER BY sum(w) DESC, src LIMIT 1
),
d0 AS (
  SELECT n_nationkey AS node,
         CASE WHEN n_nationkey = (SELECT seed FROM seed) THEN 0 END AS d
  FROM nation
)"""
    prev = "d0"
    for i in range(1, _BFS_ITERS + 1):
        sql += f""",
d{i} AS MATERIALIZED (
  SELECT node, min(d) AS d FROM (
    SELECT node, d FROM {prev}
    UNION ALL
    SELECT e.dst AS node, {prev}.d + 1 AS d
    FROM edges e JOIN {prev} ON e.src = {prev}.node AND {prev}.d IS NOT NULL
  ) GROUP BY node
)"""
        prev = f"d{i}"
    sql += f"""
SELECT n.n_name AS nation, COALESCE({prev}.d, -1) AS hops
FROM nation n JOIN {prev} ON n.n_nationkey = {prev}.node
"""
    return sql


GRAPH_BFS_HOPS_SQL = _bfs_sql()

QUERIES["graph_bfs_hops"] = graph_bfs_hops
ORACLES["graph_bfs_hops"] = GRAPH_BFS_HOPS_SQL


# ---------------------------------------------------------------------------
# Label propagation communities (synchronous LPA)
# ---------------------------------------------------------------------------

_LPA_ITERS = 2


def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007) over the undirected nation trade graph: every node
    starts labeled with itself; each round it adopts the label carrying
    the highest total edge weight among its neighbors (ties → smallest
    label), ``_LPA_ITERS`` synchronous rounds. The modularity-free,
    O(|E|)-per-round community algorithm production graph stacks run
    first — and the third member of this module's Pregel family
    (sum-times = PageRank, min-plus = BFS, argmax-mode = LPA).

    Plan per round: one equi-join (label vector broadcast, |V|-sized) +
    one weighted tally aggregate + one argmax — the argmax is the
    ``max(struct(sw, -lab))`` hash-aggregate kernel pinned by
    ``tests/test_argmax_agg.py``, never a window. All weights are
    bigint counts, so both engines agree exactly.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")

    weights = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("src") != F.col("dst"))
    )
    und = persist_tracked(
        weights.unionAll(
            weights.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
            )
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
    )
    und.count()  # consumed once per LPA round

    # |V|-row label vector, referenced TWICE per round (tally broadcast
    # + carry-forward join): persist per round so the runtime computes
    # each round once instead of once per downstream reference. LAZY
    # persist, not the eager localCheckpoint BFS uses — LPA's rounds
    # chain into one job under the noop sink, and r8 measured the three
    # eager checkpoint jobs 0.6 s slower at sf0.1 than the lazily
    # cached chain (per-job scheduling overhead on 25-row frames)
    labels = n.select(
        F.col("n_nationkey").alias("node"), F.col("n_nationkey").alias("lab")
    )
    for _ in range(_LPA_ITERS):
        tally = (
            und.join(F.broadcast(labels), und.src == F.col("node"))
            .groupBy(F.col("dst"), F.col("lab"))
            .agg(F.sum("w").alias("sw"))
        )
        winner = (
            tally.groupBy("dst")
            .agg(
                F.max(
                    F.struct(
                        F.col("sw").alias("k1"),
                        (-F.col("lab")).alias("k2"),
                        F.col("lab").alias("lab"),
                    )
                ).alias("b")
            )
            .select(F.col("dst").alias("node"), F.col("b.lab").alias("nlab"))
        )
        labels = persist_tracked(
            labels.join(winner, "node", "left")
            .select("node", F.coalesce("nlab", "lab").alias("lab"))
        )
    return n.join(labels, n.n_nationkey == labels.node).select(
        F.col("n_name").alias("nation"), F.col("lab").alias("community")
    )


def _lpa_sql() -> str:
    sql = """
WITH weights AS MATERIALIZED (
  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w
  FROM lineitem l
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey  = c.c_custkey
  JOIN supplier s ON l.l_suppkey  = s.s_suppkey
  GROUP BY 1, 2
  HAVING c.c_nationkey <> s.s_nationkey
),
und AS MATERIALIZED (
  SELECT src, dst, sum(w) AS w FROM (
    SELECT src, dst, w FROM weights
    UNION ALL
    SELECT dst AS src, src AS dst, w FROM weights
  ) GROUP BY 1, 2
),
l0 AS (SELECT n_nationkey AS node, n_nationkey AS lab FROM nation)"""
    prev = "l0"
    for i in range(1, _LPA_ITERS + 1):
        sql += f""",
l{i} AS MATERIALIZED (
  SELECT p.node, COALESCE(w.nlab, p.lab) AS lab
  FROM {prev} p LEFT JOIN (
    SELECT dst AS node, lab AS nlab FROM (
      SELECT dst, lab,
             row_number() OVER (PARTITION BY dst ORDER BY sw DESC, lab) AS rn
      FROM (
        SELECT u.dst, l.lab, sum(u.w) AS sw
        FROM und u JOIN {prev} l ON u.src = l.node
        GROUP BY 1, 2
      )
    ) WHERE rn = 1
  ) w ON p.node = w.node
)"""
        prev = f"l{i}"
    sql += f"""
SELECT n.n_name AS nation, {prev}.lab AS community
FROM nation n JOIN {prev} ON n.n_nationkey = {prev}.node
"""
    return sql


GRAPH_LPA_SQL = _lpa_sql()

QUERIES["graph_label_propagation"] = graph_label_propagation
ORACLES["graph_label_propagation"] = GRAPH_LPA_SQL
