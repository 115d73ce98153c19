"""Graph pipelines: fixed-point integer PageRank over a distributed
edge list.

The iterative sibling of stages/components.py: where components
propagates MIN labels to a fixpoint, PageRank propagates SUMMED rank
shares for a fixed number of rounds.  All arithmetic is integer floor
division at the exact points the SQL twin floors ((r // d) per source,
(85 * c) // 100 per damping step), so the Ray result and the unrolled
DuckDB CTE chain are bit-equal — no float iteration drift.

Scale shape: the graph is STATIC across rounds, so it is sharded ONCE
— edges hash-partitioned on src into B object-store shards, each
pre-encoded (sorted unique srcs, per-src out-degree, src/dst dictionary
codes, edge multiplicities) — and the per-round work is a raw-task BSP
exchange: B contribution tasks (rank lookup by searchsorted + one
np.add.at per shard, emitting <= B dst-bucket pieces) feeding B merge
tasks (np.add.at over each bucket's static sorted node array).  Only
rank arrays and combined contribution pieces move per round; the
10M-edge shards never leave the object store, and the driver holds
O(B^2) ObjectRefs, never data.  This is the one operator family where
Ray Data genuinely cannot express the semantics (a static partitioned
side reused across iterations — Dataset.groupby re-sorts the full edge
set every round: measured 184 s for 4 rounds at 10M edges vs ~8 s for
this form), so raw tasks are used per the documented escape hatch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.tables import read_table

PR_SCALE = 1_000_000          # initial rank per node (fixed-point)
PR_BASE = 150_000             # (1 - 0.85) * SCALE
PR_ITERS = 4
SUPP_NODE_OFFSET = 1_000_000_000   # supplier node ids live above this


def _split_block(n_buckets: int):
    """Task: split one edge block into per-src-bucket piece tables."""
    from ..functions.hashing import splitmix64

    def fn(t: pa.Table):
        src = pc.cast(t["src"], pa.int64()).to_numpy(zero_copy_only=False)
        dst = pc.cast(t["dst"], pa.int64()).to_numpy(zero_copy_only=False)
        bkt = (splitmix64(src.astype(np.uint64)) % np.uint64(n_buckets)).astype(
            np.int64
        )
        order = np.argsort(bkt, kind="stable")
        sb, ss, sd = bkt[order], src[order], dst[order]
        bounds = np.searchsorted(sb, np.arange(n_buckets + 1))
        return [
            pa.table({"src": pa.array(ss[bounds[b]:bounds[b + 1]]),
                      "dst": pa.array(sd[bounds[b]:bounds[b + 1]])})
            for b in range(n_buckets)
        ]

    return fn


def _build_shard(n_buckets: int):
    """Task: concat one bucket's pieces and pre-encode the CSR-ish
    shard consumed every round: usrc (sorted unique), d (out-degree
    incl. multiplicity), src_code/dst_code (edge dictionary codes,
    multiplicity-collapsed with weight w), udst + the dst-bucket of
    each distinct dst.  Also returns the per-out-bucket distinct dst
    arrays used once to build the node sets."""
    from ..functions.hashing import splitmix64

    def fn(*pieces):
        tbls = [t for t in pieces if t.num_rows]
        if not tbls:
            empty = np.array([], dtype=np.int64)
            shard = {"usrc": empty, "d": empty, "src_code": empty,
                     "dst_code": empty, "w": empty, "udst": empty,
                     "udst_bkt": empty}
            return shard, [empty] * n_buckets
        t = pa.concat_tables(tbls)
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        # collapse multiplicities: w edges (s, d) contribute w * (r//deg)
        key = np.stack([src, dst])
        uniq, w = np.unique(key, axis=1, return_counts=True)
        usrc, src_code = np.unique(uniq[0], return_inverse=True)
        udst, dst_code = np.unique(uniq[1], return_inverse=True)
        d = np.zeros(len(usrc), dtype=np.int64)
        np.add.at(d, src_code, w.astype(np.int64))
        udst_bkt = (
            splitmix64(udst.astype(np.uint64)) % np.uint64(n_buckets)
        ).astype(np.int64)
        shard = {
            "usrc": usrc, "d": d,
            "src_code": src_code.astype(np.int64),
            "dst_code": dst_code.astype(np.int64),
            "w": w.astype(np.int64),
            "udst": udst, "udst_bkt": udst_bkt,
        }
        dst_pieces = [udst[udst_bkt == b] for b in range(n_buckets)]
        return shard, dst_pieces

    return fn


def pagerank(edges, iters: int = PR_ITERS, n_buckets: int = 64):
    """Integer PageRank over ``edges`` (src, dst int64), ``iters``
    synchronous rounds.  Returns a Dataset (node, r).

    r_0(u) = PR_SCALE for every node (src or dst of any edge);
    r_{i+1}(u) = PR_BASE + (85 * sum_{(v,u) in E} (r_i(v) // d(v))) // 100
    with d(v) = out-degree counted WITH edge multiplicity.  Dangling
    nodes (no out-edges) leak rank; nodes with no in-edges settle at
    PR_BASE — both identical in the SQL twin by construction.
    """
    import ray
    import ray.data

    B = n_buckets
    block_refs = edges.materialize().to_arrow_refs()

    split = ray.remote(num_returns=B)(_split_block(B))
    build = ray.remote(num_returns=2)(_build_shard(B))
    piece_refs = [split.remote(r) for r in block_refs]
    if B == 1:  # num_returns=1 yields a bare ref, not a list
        piece_refs = [[r] for r in piece_refs]
    shard_refs, dstp_refs = [], []
    for b in range(B):
        s, dp = build.remote(*[pr[b] for pr in piece_refs])
        shard_refs.append(s)
        dstp_refs.append(dp)

    def _init_bucket(b):
        def fn(shard, *dst_pieces_all):
            # nodes hashing to b = shard b's srcs U every shard's
            # dst pieces destined for b (refs passed unpacked so Ray
            # dereferences them)
            parts = [shard["usrc"]] + [dp[b] for dp in dst_pieces_all]
            nodes = np.unique(np.concatenate(parts))
            return nodes, np.full(len(nodes), PR_SCALE, dtype=np.int64)

        return fn

    nodes_refs, rank_refs = [], []
    for b in range(B):
        nr, rr = ray.remote(num_returns=2)(_init_bucket(b)).remote(
            shard_refs[b], *dstp_refs
        )
        nodes_refs.append(nr)
        rank_refs.append(rr)

    def _contrib(shard, nodes, r):
        if len(shard["usrc"]) == 0:
            e = np.array([], dtype=np.int64)
            return [(e, e)] * B
        ru = r[np.searchsorted(nodes, shard["usrc"])]
        share = (ru // shard["d"])[shard["src_code"]] * shard["w"]
        c = np.zeros(len(shard["udst"]), dtype=np.int64)
        np.add.at(c, shard["dst_code"], share)
        ub = shard["udst_bkt"]
        return [(shard["udst"][ub == b], c[ub == b]) for b in range(B)]

    def _merge(nodes, *pieces):
        acc = np.zeros(len(nodes), dtype=np.int64)
        for nd, c in pieces:
            if len(nd):
                np.add.at(acc, np.searchsorted(nodes, nd), c)
        return PR_BASE + (85 * acc) // 100

    contrib = ray.remote(num_returns=B)(_contrib)
    merge = ray.remote(_merge)

    for _ in range(iters):
        piece = [contrib.remote(shard_refs[b], nodes_refs[b], rank_refs[b])
                 for b in range(B)]
        if B == 1:
            piece = [[p] for p in piece]
        rank_refs = [
            merge.remote(nodes_refs[b], *[piece[s][b] for s in range(B)])
            for b in range(B)
        ]

    def _emit(nodes, r):
        return pa.table({"node": pa.array(nodes), "r": pa.array(r)})

    emit = ray.remote(_emit)
    out_refs = [emit.remote(nodes_refs[b], rank_refs[b]) for b in range(B)]
    return ray.data.from_arrow_refs(out_refs)


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
