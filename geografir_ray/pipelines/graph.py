"""Graph pipelines: fixed-point integer PageRank over a distributed
edge list.

The iterative sibling of stages/components.py: where components
propagates MIN labels to a fixpoint, PageRank propagates SUMMED rank
shares for a fixed number of rounds.  All arithmetic is integer floor
division at the exact points the SQL twin floors ((r // d) per source,
(85 * c) // 100 per damping step), so the Ray result and the unrolled
DuckDB CTE chain are bit-equal — no float iteration drift.

Scale shape per round: ONE bucketed hash join (edges x ranks on src)
plus ONE grouped-sum exchange (contributions keyed by dst, unioned
with a static zero row per node so dangling-in nodes keep the base
rank).  Both are the engine's standard exchanges; nothing grows on the
driver.  Edges (with out-degree attached) and the node set are
coalesced + materialized ONCE before the loop (CLAUDE.md rules 9/18 —
per-round sample-sort cost scales with block count and compounds).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.tables import read_table
from .common import grouped_sum

PR_SCALE = 1_000_000          # initial rank per node (fixed-point)
PR_BASE = 150_000             # (1 - 0.85) * SCALE
PR_ITERS = 4
SUPP_NODE_OFFSET = 1_000_000_000   # supplier node ids live above this


def pagerank(edges, iters: int = PR_ITERS, n_buckets: int = 64):
    """Integer PageRank over ``edges`` (src, dst int64), ``iters``
    synchronous rounds.  Returns a Dataset (node, r).

    r_0(u) = PR_SCALE for every node (src or dst of any edge);
    r_{i+1}(u) = PR_BASE + (85 * sum_{(v,u) in E} (r_i(v) // d(v))) // 100
    with d(v) = out-degree counted WITH edge multiplicity.  Dangling
    nodes (no out-edges) leak rank; nodes with no in-edges settle at
    PR_BASE — both identical in the SQL twin by construction.
    """
    from ..stages.join import hash_join

    def add_one(t: pa.Table) -> pa.Table:
        return t.append_column("one", pa.array(np.ones(t.num_rows, dtype=np.int64)))

    edges = edges.map_batches(add_one, batch_format="pyarrow")
    outd = grouped_sum(edges, ["src"], {"d": ("one", "sum")})

    # attach out-degree to each edge ONCE; coalesce before the loop
    edges_d = (
        hash_join(
            edges,
            outd,
            on="src",
            n_buckets=n_buckets,
            left_cols=["src", "dst"],
            right_cols=["src", "d"],
        )
        .repartition(16)
        .materialize()
    )

    # node set = distinct(src) U distinct(dst); kept as a zero-
    # contribution table so the per-round merge needs no left join
    def endpoints(t: pa.Table) -> pa.Table:
        n = pa.concat_arrays(
            [
                pc.cast(t["src"], pa.int64()).combine_chunks(),
                pc.cast(t["dst"], pa.int64()).combine_chunks(),
            ]
        )
        u = pc.unique(n)
        return pa.table(
            {"node": u, "c": pa.array(np.zeros(len(u), dtype=np.int64))}
        )

    node_zero = grouped_sum(
        edges_d.map_batches(endpoints, batch_format="pyarrow"),
        ["node"],
        {"c": ("c", "sum")},
    ).repartition(8).materialize()

    def init_rank(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pc.cast(t["node"], pa.int64()),
                "r": pa.array(np.full(t.num_rows, PR_SCALE, dtype=np.int64)),
            }
        )

    ranks = node_zero.map_batches(init_rank, batch_format="pyarrow").materialize()

    from ..functions.hashing import splitmix64

    _SHARE = pa.schema(
        [("node", pa.int64()), ("c", pa.int64()), ("__bkt", pa.int64())]
    )

    def share(t: pa.Table) -> pa.Table:
        # per-edge rank share, pre-combined per (node) within the batch
        # and tagged with the merge bucket — the merge itself is a
        # bucketed exchange + vectorized add.at, NOT a sort-based
        # aggregate over the unbounded node key (CLAUDE.md rule 1)
        if t.num_rows == 0:
            return _SHARE.empty_table()
        r = t["r"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = pc.cast(t["dst"], pa.int64()).to_numpy(zero_copy_only=False)
        u, inv = np.unique(dst, return_inverse=True)
        c = np.zeros(len(u), dtype=np.int64)
        np.add.at(c, inv, r // d)
        bkt = (splitmix64(u.astype(np.uint64)) % np.uint64(n_buckets)).astype(
            np.int64
        )
        return pa.table(
            {"node": pa.array(u), "c": pa.array(c), "__bkt": pa.array(bkt)}
        )

    def tag_zero(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _SHARE.empty_table()
        n = pc.cast(t["node"], pa.int64()).to_numpy(zero_copy_only=False)
        bkt = (splitmix64(n.astype(np.uint64)) % np.uint64(n_buckets)).astype(
            np.int64
        )
        return pa.table(
            {"node": t["node"], "c": t["c"], "__bkt": pa.array(bkt)}
        )

    node_zero_tagged = node_zero.map_batches(
        tag_zero, batch_format="pyarrow"
    ).materialize()

    _RANK = pa.schema([("src", pa.int64()), ("r", pa.int64())])

    def merge_damp(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _RANK.empty_table()
        n = pc.cast(g["node"], pa.int64()).to_numpy(zero_copy_only=False)
        cin = g["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, inv = np.unique(n, return_inverse=True)
        c = np.zeros(len(u), dtype=np.int64)
        np.add.at(c, inv, cin)
        return pa.table(
            {"src": pa.array(u), "r": pa.array(PR_BASE + (85 * c) // 100)}
        )

    for _ in range(iters):
        contrib = hash_join(
            edges_d,
            ranks,
            on="src",
            n_buckets=n_buckets,
            left_cols=["src", "dst", "d"],
            right_cols=["src", "r"],
        ).map_batches(share, batch_format="pyarrow")
        ranks = (
            contrib.union(node_zero_tagged)
            .groupby("__bkt")
            .map_groups(merge_damp, batch_format="pyarrow")
            .repartition(8)
            .materialize()
        )

    return ranks.map_batches(
        lambda t: pa.table({"node": t["src"], "r": t["r"]}),
        batch_format="pyarrow",
    )


def graph_pagerank(sf_dir: str, iters: int = PR_ITERS):
    """PageRank over the customer -> supplier order graph: one edge per
    lineitem, src = the order's customer, dst = SUPP_NODE_OFFSET +
    supplier (keyspaces disjoint by construction).  Exact unrolled-CTE
    DuckDB oracle (graph_pagerank_sql)."""
    from ..stages.join import hash_join

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])

    def o_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"okey": pc.cast(t["o_orderkey"], pa.int64()),
             "src": pc.cast(t["o_custkey"], pa.int64())}
        )

    def l_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "okey": pc.cast(t["l_orderkey"], pa.int64()),
                "dst": pc.add(
                    pc.cast(t["l_suppkey"], pa.int64()),
                    pa.scalar(SUPP_NODE_OFFSET, pa.int64()),
                ),
            }
        )

    edges = hash_join(
        li.map_batches(l_prep, batch_format="pyarrow"),
        orders.map_batches(o_prep, batch_format="pyarrow"),
        on="okey",
        left_cols=["okey", "dst"],
        right_cols=["okey", "src"],
    ).select_columns(["src", "dst"])

    return pagerank(edges, iters=iters).sort("node")


def graph_pagerank_sql(iters: int = PR_ITERS) -> str:
    head = f"""
WITH edges AS (
  SELECT o_custkey AS src, {SUPP_NODE_OFFSET} + l_suppkey AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
nodes AS (
  SELECT DISTINCT src AS node FROM edges
  UNION
  SELECT DISTINCT dst AS node FROM edges
),
outd AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY src),
r0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) AS r FROM nodes)"""
    steps = []
    for i in range(1, iters + 1):
        steps.append(f""",
r{i} AS (
  SELECT n.node,
         CAST({PR_BASE} + (85 * COALESCE(c.c, 0)) // 100 AS BIGINT) AS r
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, CAST(sum(rr.r // o.d) AS BIGINT) AS c
    FROM edges e
    JOIN r{i - 1} rr ON rr.node = e.src
    JOIN outd o ON o.src = e.src
    GROUP BY e.dst
  ) c ON c.node = n.node
)""")
    return head + "".join(steps) + f"""
SELECT node, r FROM r{iters} ORDER BY node
"""
