"""Graph + sketch analytics queries: PageRank over a derived trade graph
and two-pass exact heavy hitters over document tokens.

Both are iterative/sketch-backed operators whose *final outputs* are
nevertheless exactly SQL-expressible, so they carry full DuckDB oracles:

- PageRank with a fixed iteration count unrolls to a chain of CTEs
  computing the identical recurrence (both engines do the same IEEE
  double ops on the same operands; the result is rounded to 6 decimals
  to absorb last-ulp accumulation-order slack in the per-node sums).
- Misra–Gries two-pass heavy hitters returns *exactly* the keys with
  frequency > n/(k+1) plus exact counts (the sketch only prunes the
  candidate space — see ``operators/sketches.py``), so the oracle is the
  naive full-domain GROUP BY / HAVING the two-pass plan avoids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..operators.graph import pagerank
from ..operators.sketches import heavy_hitters
from ..sources import load_table
from .registry import query
from .text import _TOKS

_PR_ITERS = 5
_PR_DAMPING = 0.85


def _pagerank_oracle() -> str:
    """Unroll the PageRank recurrence as chained CTEs (fixed 5 iterations).

    Every constant is forced to DOUBLE before arithmetic so DuckDB's
    DECIMAL literal typing can't diverge from Spark's float literals
    (e.g. DECIMAL ``1 - 0.85`` is exactly 0.15; DOUBLE ``1 - 0.85`` is
    0.15000000000000002 — Spark computes the latter).

    r13: the multi-consumer CTEs are explicitly MATERIALIZED — the
    BENCH_NOTES r12 §4 rule applied to this r8-era oracle after the r13
    deep sweep caught it OOMing at sf10: DuckDB 1.0 inlines ``e`` into
    ``outw``+``ratio`` and ``ratio`` into all five ``c{i}``s, so the
    60M-row lineitem 4-table join pipeline executed many times with
    concurrent hash tables (40 GB cap hit); materialized, ``e`` is 625
    rows and every iteration reads bounded frames.
    """
    parts = [
        """
    WITH e AS MATERIALIZED (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             CAST(COUNT(*) AS DOUBLE) AS w
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey  = c.c_custkey
      JOIN supplier s ON l.l_suppkey  = s.s_suppkey
      GROUP BY 1, 2
    ),
    nodes AS MATERIALIZED (SELECT n_nationkey AS id FROM nation),
    nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    outw AS MATERIALIZED (SELECT src, SUM(w) AS w_out FROM e GROUP BY src),
    ratio AS MATERIALIZED (
      SELECT e.src, e.dst, e.w / outw.w_out AS ratio
      FROM e JOIN outw ON e.src = outw.src
    ),
    pr0 AS MATERIALIZED (
      SELECT id, CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS rank FROM nodes
    )"""
    ]
    for i in range(1, _PR_ITERS + 1):
        p = i - 1
        parts.append(f""",
    d{i} AS (
      SELECT COALESCE(SUM(rank), CAST(0 AS DOUBLE)) AS dangling
      FROM pr{p} WHERE id NOT IN (SELECT src FROM outw)
    ),
    c{i} AS (
      SELECT r.dst, SUM(pr.rank * r.ratio) AS in_rank
      FROM ratio r JOIN pr{p} pr ON r.src = pr.id GROUP BY r.dst
    ),
    pr{i} AS MATERIALIZED (
      SELECT nodes.id,
             (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)
             + CAST(0.85 AS DOUBLE)
               * (COALESCE(c.in_rank, CAST(0 AS DOUBLE))
                  + (SELECT dangling FROM d{i}) / (SELECT n FROM nn)) AS rank
      FROM nodes LEFT JOIN c{i} c ON nodes.id = c.dst
    )""")
    parts.append(f"""
    SELECT id AS node, round(rank, 6) AS rank FROM pr{_PR_ITERS}
    """)
    return "".join(parts)


@query("pagerank_nation_trade", oracle=_pagerank_oracle())
def pagerank_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the customer-nation → supplier-nation trade
    graph (edge weight = lineitem count), 5 iterations, damping 0.85,
    dangling mass redistributed uniformly.  Exercises the iterative graph
    operator (``operators/graph.py:pagerank``) end-to-end against an
    unrolled-CTE oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    ranks = pagerank(
        edges,
        nodes=nation.select(F.col("n_nationkey").alias("id")),
        weight="w",
        iters=_PR_ITERS,
        damping=_PR_DAMPING,
    )
    return ranks.select("node", F.round("rank", 6).alias("rank"))


_HH_K = 50


@query(
    "heavy_hitter_tokens",
    oracle=f"""
    WITH toks AS (
      SELECT unnest({_TOKS}) AS tok FROM documents
    ),
    tot AS (SELECT COUNT(*) AS n FROM toks),
    cnt AS (SELECT tok, COUNT(*) AS n_key FROM toks GROUP BY tok)
    SELECT tok, n_key FROM cnt, tot WHERE n_key * {_HH_K + 1} > n
    """,
)
def heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy-hitter tokens (frequency > n/{k+1}, k=50) over the
    corpus vocabulary via the two-pass Misra–Gries plan — identical
    output to the full-domain GROUP BY the oracle runs, without ever
    shuffling the distinct-token domain (``operators/sketches.py``)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens("text")).alias("tok"))
    return heavy_hitters(toks, "tok", _HH_K)


_SSSP_ITERS = 6


def _sssp_oracle() -> str:
    """Unroll the Bellman–Ford relaxation (6 bounded hops).  ``min`` is
    order-insensitive, so — unlike PageRank's sums — no rounding is
    needed: both engines compute identical doubles at every step.

    r13: multi-consumer CTEs MATERIALIZED (same fix as the PageRank
    oracle, BENCH_NOTES r12 §4): ``e`` is consumed by all six rounds and
    each ``d{i}`` twice by round i+1, so DuckDB 1.0's inlining re-ran the
    60M-row join pipeline per reference at sf10 (35 s in the r10 sweep,
    OOM-marginal); materialized it runs once into 625 edge rows."""
    parts = [
        """
    WITH e AS MATERIALIZED (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             CAST(1 AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS w
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey  = c.c_custkey
      JOIN supplier s ON l.l_suppkey  = s.s_suppkey
      GROUP BY c.c_nationkey, s.s_nationkey
    ),
    d0 AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS id, CAST(0 AS DOUBLE) AS dist)"""
    ]
    for i in range(1, _SSSP_ITERS + 1):
        p = i - 1
        parts.append(f""",
    d{i} AS MATERIALIZED (
      SELECT id, MIN(dist) AS dist FROM (
        SELECT id, dist FROM d{p}
        UNION ALL
        SELECT e.dst AS id, d.dist + e.w AS dist
        FROM e JOIN d{p} d ON e.src = d.id
      ) GROUP BY id
    )""")
    parts.append(f"""
    SELECT n.n_nationkey AS node, d.dist
    FROM nation n LEFT JOIN d{_SSSP_ITERS} d ON n.n_nationkey = d.id
    """)
    return "".join(parts)


@query("sssp_nation_trade", oracle=_sssp_oracle())
def sssp_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source shortest trade distance from nation 0 over the
    customer-nation → supplier-nation graph (edge length = 1/trade
    volume, 6 bounded hops) via the iterative Bellman–Ford operator
    (``operators/graph.py:shortest_paths``); unreachable nations surface
    as NULL.  Bit-exact vs the unrolled-CTE oracle — min-based DP needs
    no rounding."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg((F.lit(1.0) / F.count(F.lit(1)).cast("double")).alias("w"))
    )
    from ..operators.graph import shortest_paths

    sources = spark.range(1).select(F.lit(0).cast("bigint").alias("id"))
    dist = shortest_paths(edges, sources, weight="w", max_iters=_SSSP_ITERS)
    return nation.join(
        dist, nation.n_nationkey == dist.node, "left"
    ).select(F.col("n_nationkey").alias("node"), "dist")


# r13: raw/ud/tri MATERIALIZED — ud is consumed three times by the
# triangle join and tri three times by the per-node unpivot; inlined,
# DuckDB re-ran the 60M-row trade join per reference at sf10 (17.8 s in
# the r10 sweep, OOM-marginal under a co-resident Spark JVM).
_TRI_ORACLE = """
WITH raw AS MATERIALIZED (
  SELECT DISTINCT least(c.c_nationkey, s.s_nationkey) AS a,
                  greatest(c.c_nationkey, s.s_nationkey) AS b
  FROM lineitem l
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey  = c.c_custkey
  JOIN supplier s ON l.l_suppkey  = s.s_suppkey
),
ud AS MATERIALIZED (SELECT a, b FROM raw WHERE a < b),
tri AS MATERIALIZED (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM ud e1
  JOIN ud e2 ON e1.b = e2.a
  JOIN ud e3 ON e1.a = e3.a AND e2.b = e3.b
),
pn AS (
  SELECT node, COUNT(*) AS n_triangles FROM (
    SELECT x AS node FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri
  ) GROUP BY node
)
SELECT n.n_nationkey AS node, COALESCE(pn.n_triangles, 0) AS n_triangles
FROM nation n LEFT JOIN pn ON n.n_nationkey = pn.node
"""


@query("triangle_count_trade", oracle=_TRI_ORACLE)
def triangle_count_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation triangle counts over the undirected trade graph
    (distinct customer-nation ↔ supplier-nation pairs, self-loops
    dropped) via the compact-forward algorithm: orient every edge
    low→high id, then two shuffle equi-joins enumerate each triangle
    exactly once as (x < y < z).

    Scale shape: this IS the distributed algorithm — edge-sized shuffles
    keyed on endpoint ids, no node-local adjacency materialization.  At
    web scale you'd orient by degree instead of id (node-iterator++) so
    high-degree hubs never land on the build side of both joins; with
    25 nations the id orientation is the same plan."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    ud = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .select(
            F.least("c_nationkey", "s_nationkey").alias("a"),
            F.greatest("c_nationkey", "s_nationkey").alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )
    e1, e2, e3 = ud.alias("e1"), ud.alias("e2"), ud.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(e3, (F.col("e1.a") == F.col("e3.a")) & (F.col("e2.b") == F.col("e3.b")))
        .select(
            F.col("e1.a").alias("x"), F.col("e1.b").alias("y"), F.col("e2.b").alias("z")
        )
    )
    pn = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return nation.join(pn, nation.n_nationkey == pn.node, "left").select(
        F.col("n_nationkey").alias("node"),
        F.coalesce("n_triangles", F.lit(0).cast("bigint")).alias("n_triangles"),
    )


_LPA_ITERS = 4

_LPA_EDGES_SQL = """
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(*) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY c.c_nationkey, s.s_nationkey
"""


def _lpa_oracle() -> str:
    """Unroll the deterministic LPA recurrence as chained CTEs (same
    technique as the PageRank/SSSP oracles): labels_k derives from
    labels_{k-1} via max-weight-neighbor-label argmax with min-label
    tie-break — all integer arithmetic, so the fixpoint is exact.

    Every CTE is MATERIALIZED: ``labels_k`` is referenced twice per
    iteration (votes + carry-forward), so DuckDB's default inlining
    duplicates the whole upstream subtree 2^iters times — at sf1 that
    re-executed the 6M-row edge join 16× and spilled ~80 GB of hash-join
    temp before being killed.  Materialization makes the oracle linear
    in iters, like the Spark side."""
    parts = [
        f"WITH e AS MATERIALIZED ({_LPA_EDGES_SQL}),",
        """und AS MATERIALIZED (
      SELECT src, dst, SUM(w) AS w FROM (
        SELECT src, dst, w FROM e WHERE src <> dst
        UNION ALL
        SELECT dst AS src, src AS dst, w FROM e WHERE src <> dst
      ) GROUP BY src, dst
    ),
    labels_0 AS MATERIALIZED (
      SELECT n_nationkey AS id, n_nationkey AS label FROM nation)""",
    ]
    for k in range(1, _LPA_ITERS + 1):
        parts.append(
            f""",
    votes_{k} AS MATERIALIZED (
      SELECT u.src AS id, l.label AS nbr_label, SUM(u.w) AS tw
      FROM und u JOIN labels_{k - 1} l ON u.dst = l.id
      GROUP BY u.src, l.label
    ),
    best_{k} AS MATERIALIZED (
      SELECT id, nbr_label FROM (
        SELECT id, nbr_label,
               ROW_NUMBER() OVER (PARTITION BY id
                                  ORDER BY tw DESC, nbr_label) AS rn
        FROM votes_{k}
      ) WHERE rn = 1
    ),
    labels_{k} AS MATERIALIZED (
      SELECT l.id, COALESCE(b.nbr_label, l.label) AS label
      FROM labels_{k - 1} l LEFT JOIN best_{k} b ON l.id = b.id
    )"""
        )
    parts.append(
        f"""
    SELECT id AS node, label AS community FROM labels_{_LPA_ITERS}"""
    )
    return "".join(parts)


@query("label_propagation_communities", oracle=_lpa_oracle())
def label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synchronous label-propagation communities over the
    nation trade graph (edge weight = lineitem count, symmetrized), 4
    iterations — exercises ``operators/graph.py:label_propagation``
    end-to-end against an unrolled-CTE oracle.  The update rule's argmax
    runs on integer weights with a min-label tie-break, so the result is
    exact (no float voting)."""
    from ..operators.graph import label_propagation

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    out = label_propagation(
        edges,
        nodes=nation.select(F.col("n_nationkey").alias("id")),
        weight="w",
        iters=_LPA_ITERS,
    )
    return out.select("node", F.col("label").alias("community"))
