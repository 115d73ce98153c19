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


def _split_block(n_buckets: int, src_col: str = "src", dst_col: str = "dst",
                 w_col: str | None = None):
    """Task: split one edge block into per-src-bucket piece tables.

    ``src_col``/``dst_col`` let a caller shard the REVERSE graph from
    the same blocks (hits' h-phase) without materializing swapped
    edges.  ``w_col`` (weighted graphs, e.g. sssp) rides the split as
    an extra int64 column."""
    from ..functions.hashing import splitmix64

    def fn(t: pa.Table):
        if t.num_rows == 0:
            # Ray's groupby-sort occasionally emits a zero-row block
            # with an EMPTY schema (the UDF is skipped for empty sort
            # partitions), so don't index columns before checking.
            cols = {"src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64())}
            if w_col is not None:
                cols["w"] = pa.array([], pa.int64())
            e = pa.table(cols)
            return [e] * n_buckets if n_buckets > 1 else e
        src = pc.cast(t[src_col], pa.int64()).to_numpy(zero_copy_only=False)
        dst = pc.cast(t[dst_col], pa.int64()).to_numpy(zero_copy_only=False)
        w = (
            pc.cast(t[w_col], pa.int64()).to_numpy(zero_copy_only=False)
            if w_col is not None
            else None
        )
        bkt = (splitmix64(src.astype(np.uint64)) % np.uint64(n_buckets)).astype(
            np.int64
        )
        order = np.argsort(bkt, kind="stable")
        sb, ss, sd = bkt[order], src[order], dst[order]
        sw = w[order] if w is not None else None
        bounds = np.searchsorted(sb, np.arange(n_buckets + 1))
        out = []
        for b in range(n_buckets):
            cols = {"src": pa.array(ss[bounds[b]:bounds[b + 1]]),
                    "dst": pa.array(sd[bounds[b]:bounds[b + 1]])}
            if sw is not None:
                cols["w"] = pa.array(sw[bounds[b]:bounds[b + 1]])
            out.append(pa.table(cols))
        # num_returns=1 hands the whole list back as ONE object; the
        # caller re-wraps, so return the bare table at n_buckets=1
        return out if n_buckets > 1 else out[0]

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
        if "w" in t.schema.names:
            # weighted graph: parallel (s, d) edges collapse by MIN
            # weight (shortest-path semantics); "w" holds the weight
            ew = t["w"].to_numpy(zero_copy_only=False)
            key = np.stack([src, dst])
            uniq, inv = np.unique(key, axis=1, return_inverse=True)
            w = np.full(uniq.shape[1], np.iinfo(np.int64).max, dtype=np.int64)
            np.minimum.at(w, inv, ew)
        else:
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


def _shard_graph(block_refs, n_buckets: int,
                 src_col: str = "src", dst_col: str = "dst",
                 w_col: str | None = None):
    """Shard edge blocks ONCE into B pre-encoded object-store shards
    (see module docstring).  Returns (shard_refs, dstp_refs)."""
    import ray

    B = n_buckets
    split = ray.remote(num_returns=B)(_split_block(B, src_col, dst_col, w_col))
    build = ray.remote(num_returns=2)(_build_shard(B))
    piece_refs = [split.remote(r) for r in block_refs]
    if B == 1:  # num_returns=1 yields a bare ref, not a list
        piece_refs = [[r] for r in piece_refs]
    shard_refs, dstp_refs = [], []
    for b in range(B):
        s, dp = build.remote(*[pr[b] for pr in piece_refs])
        shard_refs.append(s)
        dstp_refs.append(dp)
    return shard_refs, dstp_refs


def _init_buckets(shard_refs, dstp_refs, n_buckets: int, fill: int):
    """Per-bucket node sets + a constant-``fill`` value array each.
    Bucket b's nodes = shard b's srcs U every shard's dst pieces
    destined for b (refs passed unpacked so Ray dereferences them)."""
    import ray

    B = n_buckets

    def _init_bucket(b):
        def fn(shard, *dst_pieces_all):
            parts = [shard["usrc"]] + [dp[b] for dp in dst_pieces_all]
            nodes = np.unique(np.concatenate(parts))
            return nodes, np.full(len(nodes), fill, dtype=np.int64)

        return fn

    nodes_refs, val_refs = [], []
    for b in range(B):
        nr, vr = ray.remote(num_returns=2)(_init_bucket(b)).remote(
            shard_refs[b], *dstp_refs
        )
        nodes_refs.append(nr)
        val_refs.append(vr)
    return nodes_refs, val_refs


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
    # Hold the MaterializedDataset until the shard builds finish:
    # Ray Data eagerly free()s a dataset's blocks when the object is
    # GC'd (bypassing ref counts), and lineage reconstruction can hand
    # a split task a pre-select_columns block (observed once as a
    # KeyError on "dst" from an orders-side union block).  The wait
    # barrier pins blocks through the only stage that reads them.
    mat = edges.materialize()
    shard_refs, dstp_refs = _shard_graph(mat.to_arrow_refs(), B)
    nodes_refs, rank_refs = _init_buckets(shard_refs, dstp_refs, B, PR_SCALE)
    ray.wait(list(shard_refs), num_returns=B, fetch_local=False)
    del mat

    def _contrib(shard, nodes, r):
        if len(shard["usrc"]) == 0:
            e = np.array([], dtype=np.int64)
            return [(e, e)] * B if B > 1 else (e, e)
        ru = r[np.searchsorted(nodes, shard["usrc"])]
        share = (ru // shard["d"])[shard["src_code"]] * shard["w"]
        c = np.zeros(len(shard["udst"]), dtype=np.int64)
        np.add.at(c, shard["dst_code"], share)
        ub = shard["udst_bkt"]
        out = [(shard["udst"][ub == b], c[ub == b]) for b in range(B)]
        return out if B > 1 else out[0]

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


# ---------------------------------------------------------------------------
# HITS (hubs & authorities)
# ---------------------------------------------------------------------------

HITS_SCALE = 1_000_000
HITS_ITERS = 2


def hits(edges, iters: int = HITS_ITERS, n_buckets: int = 64):
    """Integer fixed-point HITS over ``edges`` (src, dst int64).
    Returns a Dataset (node, h, a) after ``iters`` synchronous rounds.

    h_0(u) = HITS_SCALE for every node.  Each round, bit-equal to the
    unrolled SQL twin (:func:`graph_hits_sql`):

        araw(u) = sum_{(v,u) in E} h(v)          (edge multiplicity counts)
        a(u)    = (araw(u) * HITS_SCALE) // max_u araw(u)
        hraw(v) = sum_{(v,u) in E} a(u)
        h(v)    = (hraw(v) * HITS_SCALE) // max_v hraw(v)

    Max-normalization (Kleinberg's L-inf variant) keeps every value in
    [0, HITS_SCALE] so int64 never overflows below ~9e12 in-degree —
    and, unlike sum-normalization, needs no 128-bit intermediate.

    Scale shape: the SAME shard-once BSP engine as :func:`pagerank` —
    the a-phase pushes h along FORWARD shards (edges bucketed by src),
    the h-phase pushes a along REVERSE shards (same blocks re-sharded
    by dst, built once before the loop) — so each phase is B
    contribution tasks + B merge tasks with only value arrays moving.
    The per-round global max is B scalars reduced on the driver
    (bytes, not data).  Dataset.groupby would re-sort the static edge
    set 2x per round (the measured 50x penalty — module docstring).
    """
    import ray
    import ray.data

    B = n_buckets
    # Same eager-free hazard as pagerank(): pin the materialized edge
    # blocks until BOTH shard builds complete (see pagerank comment).
    mat = edges.materialize()
    block_refs = mat.to_arrow_refs()
    fwd_shards, fwd_dstp = _shard_graph(block_refs, B, "src", "dst")
    rev_shards, rev_dstp = _shard_graph(block_refs, B, "dst", "src")
    nodes_refs, h_refs = _init_buckets(fwd_shards, fwd_dstp, B, HITS_SCALE)
    ray.wait(list(fwd_shards) + list(rev_shards), num_returns=2 * B,
             fetch_local=False)
    del mat, block_refs

    def _contrib(shard, nodes, v):
        # per-edge push of v(src) along the shard, bucketed by dst
        if len(shard["usrc"]) == 0:
            e = np.array([], dtype=np.int64)
            return [(e, e)] * B if B > 1 else (e, e)
        vu = v[np.searchsorted(nodes, shard["usrc"])]
        share = vu[shard["src_code"]] * shard["w"]
        c = np.zeros(len(shard["udst"]), dtype=np.int64)
        np.add.at(c, shard["dst_code"], share)
        ub = shard["udst_bkt"]
        out = [(shard["udst"][ub == b], c[ub == b]) for b in range(B)]
        return out if B > 1 else out[0]

    def _merge_raw(nodes, *pieces):
        acc = np.zeros(len(nodes), dtype=np.int64)
        for nd, c in pieces:
            if len(nd):
                np.add.at(acc, np.searchsorted(nodes, nd), c)
        return acc

    def _bucket_max(raw):
        return int(raw.max()) if len(raw) else 0

    def _scale(raw, mx):
        if mx <= 0:
            return np.zeros(len(raw), dtype=np.int64)
        return (raw * HITS_SCALE) // mx

    contrib = ray.remote(num_returns=B)(_contrib)
    merge_raw = ray.remote(_merge_raw)
    bucket_max = ray.remote(_bucket_max)
    scale = ray.remote(_scale)

    def _phase(shards, vals):
        piece = [contrib.remote(shards[b], nodes_refs[b], vals[b])
                 for b in range(B)]
        if B == 1:
            piece = [[p] for p in piece]
        raw = [merge_raw.remote(nodes_refs[b], *[piece[s][b] for s in range(B)])
               for b in range(B)]
        mx = max(ray.get([bucket_max.remote(r) for r in raw]))
        return [scale.remote(r, mx) for r in raw]

    a_refs = h_refs
    for _ in range(iters):
        a_refs = _phase(fwd_shards, h_refs)   # authorities from hubs
        h_refs = _phase(rev_shards, a_refs)   # hubs from authorities

    def _emit(nodes, h, a):
        return pa.table({"node": pa.array(nodes), "h": pa.array(h),
                         "a": pa.array(a)})

    emit = ray.remote(_emit)
    out_refs = [emit.remote(nodes_refs[b], h_refs[b], a_refs[b])
                for b in range(B)]
    return ray.data.from_arrow_refs(out_refs)


def graph_hits(sf_dir: str, iters: int = HITS_ITERS):
    """HITS over the same customer -> supplier order graph as
    :func:`graph_pagerank`: customers are pure hubs, suppliers pure
    authorities (the graph is bipartite, which exercises the zero-raw
    normalization paths on both sides).  Exact unrolled-CTE DuckDB
    oracle (:func:`graph_hits_sql`)."""
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

    return hits(edges, iters=iters).sort("node")


def graph_hits_sql(iters: int = HITS_ITERS) -> str:
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
h0 AS (SELECT node, CAST({HITS_SCALE} AS BIGINT) AS v FROM nodes)"""
    steps = []
    for i in range(1, iters + 1):
        steps.append(f""",
araw{i} AS (
  SELECT n.node, CAST(COALESCE(s.c, 0) AS BIGINT) AS v
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, CAST(sum(h.v) AS BIGINT) AS c
    FROM edges e JOIN h{i - 1} h ON h.node = e.src
    GROUP BY e.dst
  ) s ON s.node = n.node
),
a{i} AS (
  SELECT node,
         CAST((v * {HITS_SCALE}) // (SELECT max(v) FROM araw{i}) AS BIGINT) AS v
  FROM araw{i}
),
hraw{i} AS (
  SELECT n.node, CAST(COALESCE(s.c, 0) AS BIGINT) AS v
  FROM nodes n LEFT JOIN (
    SELECT e.src AS node, CAST(sum(a.v) AS BIGINT) AS c
    FROM edges e JOIN a{i} a ON a.node = e.dst
    GROUP BY e.src
  ) s ON s.node = n.node
),
h{i} AS (
  SELECT node,
         CAST((v * {HITS_SCALE}) // (SELECT max(v) FROM hraw{i}) AS BIGINT) AS v
  FROM hraw{i}
)""")
    return head + "".join(steps) + f"""
SELECT n.node, h.v AS h, a.v AS a
FROM nodes n
JOIN h{iters} h ON h.node = n.node
JOIN a{iters} a ON a.node = n.node
ORDER BY n.node
"""


# ---------------------------------------------------------------------------
# Triangle counting (per-node) — degree orientation
# ---------------------------------------------------------------------------

TRI_GROUPS = 64  # wedge-expansion parallelism (bounded group count)


TRI_BROADCAST_EDGES = 2_000_000  # 8 B/key -> 16 MB sorted-key broadcast cap


def _orient_arrays(a, b, deg_a, deg_b):
    """Shared degree-orientation kernel: direct every edge from its
    lower (degree, id)-rank endpoint to the higher one.  Returns
    (src, dst, rdst) where rdst is dst's packed (deg << 31 | id) rank
    (wedge pairs sorted by rdst come out in oriented order, so the
    closing edge — if present — is exactly src' = v, dst' = w)."""
    if len(a):
        hi = max(int(a.max()), int(b.max()))
        hd = max(int(deg_a.max()), int(deg_b.max()))
        if hi >= (1 << 31) or hd >= (1 << 31):
            raise ValueError(
                "triangles: node id / degree >= 2^31 overflows the "
                "packed (deg << 31 | node) rank"
            )
    ra = (deg_a << np.int64(31)) | a
    rb = (deg_b << np.int64(31)) | b
    swap = rb < ra
    src = np.where(swap, b, a)
    dst = np.where(swap, a, b)
    rdst = np.where(swap, ra, rb)
    return src, dst, rdst


def triangles(
    edges,
    n_groups: int = TRI_GROUPS,
    broadcast_threshold: int = TRI_BROADCAST_EDGES,
):
    """Per-node triangle counts over ``edges`` — a Dataset of DISTINCT
    undirected edges ``(a, b)`` int64 with ``a < b``.

    Degree orientation (node-iterator++ / its MapReduce form, Suri &
    Vassilvitskii "Counting Triangles and the Curse of the Last
    Reducer", WWW'11): every edge is directed from its lower
    (degree, id)-rank endpoint to the higher one, giving a DAG whose
    max out-degree is O(sqrt(m)) regardless of hub skew; each triangle
    then has exactly ONE node with out-edges to the other two, so
    joining wedges (pairs of out-neighbors) against the oriented edge
    set counts every triangle exactly once.

    Two plans, picked by the DISTINCT edge count (the edge list is
    materialized first — it is this pipeline's whole working set and
    every stage reuses it; leaving it lazy re-ran the upstream build
    once per consumer, measured 5x end-to-end at 1.2M edges):

    - ``m <= broadcast_threshold`` (16 MB of sorted u64 keys at the
      default): the CLAUDE.md rule-11 broadcast form.  Degrees,
      orientation and the sorted closure-key set are computed once
      driver-side (bounded by the cap), the oriented edge list is
      split at src-segment boundaries into ``n_groups`` blocks, and
      the quadratic wedge expansion runs distributed with closure
      checked IN-GROUP by searchsorted against the broadcast key set
      — only per-group compacted (node, count) partials ever leave a
      task.  Zero shuffles; the 40M-wedge stream at 1.2M edges never
      materializes anywhere.

    - above the cap: fully distributed.  Degrees via grouped_sum
      (shuffle merge — node space unbounded at scale), orientation
      via two hash_joins, wedge expansion inside ``n_groups`` BOUNDED
      hash(src) groups (vectorized sorted-segment triu, size-batched
      gathers — CLAUDE.md rule 1 compliant), closure via a hash
      semi-join on the packed (v << 31 | w) edge key, corner counts
      via grouped_sum.  No stage materializes on the driver; the
      reused intermediates (degrees, oriented edges) are materialized
      in the object store, never fetched.

    Both paths are equivalence-tested on the same graphs.
    """
    edges = edges.materialize()
    if edges.count() <= int(broadcast_threshold):
        return _triangles_broadcast(edges, n_groups)
    return _triangles_shuffle(edges, n_groups)


def _triangles_broadcast(edges, n_groups: int):
    import ray
    import ray.data

    from ..stages.broadcast import with_broadcast
    from .common import grouped_sum

    _empty = pa.table(
        {"node": pa.array([], pa.int64()), "one": pa.array([], pa.int64())}
    )

    tabs = [
        t
        for t in edges.iter_batches(batch_size=None, batch_format="pyarrow")
        if t.num_rows
    ]
    if not tabs:
        return ray.data.from_arrow(
            pa.table(
                {"node": pa.array([], pa.int64()),
                 "n_tri": pa.array([], pa.int64())}
            )
        )
    whole = pa.concat_tables(tabs)
    a = whole["a"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    b = whole["b"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    nodes, deg = np.unique(np.concatenate([a, b]), return_counts=True)
    deg = deg.astype(np.int64)
    src, dst, rdst = _orient_arrays(
        a, b, deg[np.searchsorted(nodes, a)], deg[np.searchsorted(nodes, b)]
    )
    keys_ref = ray.put(np.sort((src << np.int64(31)) | dst))

    # split the oriented list at src-segment boundaries into ~n_groups
    # blocks (one Dataset block each -> batch_size=None hands complete
    # segments to the expansion task)
    order = np.lexsort((rdst, src))
    src, dst = src[order], dst[order]
    m = len(src)
    seg_starts = np.concatenate(
        ([0], np.flatnonzero(src[1:] != src[:-1]) + 1)
    )
    want = np.linspace(0, m, int(n_groups) + 1).astype(np.int64)[1:-1]
    cut_idx = np.minimum(
        np.searchsorted(seg_starts, want), len(seg_starts) - 1
    )
    cuts = np.unique(np.concatenate(([0], seg_starts[cut_idx], [m])))
    oriented = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    blocks = [
        oriented.slice(int(lo), int(hi - lo))
        for lo, hi in zip(cuts[:-1], cuts[1:])
        if hi > lo
    ]

    def expand_close(keys, t: pa.Table) -> pa.Table:
        """Wedge expansion + in-group closure: size-batched triu over
        the src segments (rows arrive segment-complete and sorted by
        (src, rdst)), each candidate pair checked against the broadcast
        sorted oriented-key set; emits compacted per-group corner
        counts only."""
        if t.num_rows == 0:
            return _empty
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        change = np.flatnonzero(s[1:] != s[:-1]) + 1
        starts = np.concatenate(([0], change))
        sizes = np.diff(np.concatenate((starts, [len(s)])))
        corners = []
        for size in np.unique(sizes):
            if size < 2:
                continue
            seg_s = starts[sizes == size]
            ii, jj = np.triu_indices(int(size), k=1)
            v = d[seg_s[:, None] + ii[None, :]].ravel()
            w = d[seg_s[:, None] + jj[None, :]].ravel()
            kk = (v << np.int64(31)) | w
            pos = np.minimum(np.searchsorted(keys, kk), len(keys) - 1)
            hit = keys[pos] == kk
            if hit.any():
                u = np.repeat(s[seg_s], len(ii))[hit]
                corners.extend((u, v[hit], w[hit]))
        if not corners:
            return _empty
        node, n = np.unique(np.concatenate(corners), return_counts=True)
        return pa.table(
            {"node": pa.array(node), "one": pa.array(n.astype(np.int64))}
        )

    parts = ray.data.from_arrow(blocks).map_batches(
        with_broadcast(keys_ref, expand_close, name="tri_expand_close"),
        batch_size=None,
        batch_format="pyarrow",
    )
    # distinct nodes bounded by 2 * broadcast_threshold -> driver merge
    return grouped_sum(
        parts, ["node"], {"n_tri": ("one", "sum")}, merge="driver"
    ).sort("node")


def _triangles_shuffle(edges, n_groups: int):
    from ..stages.join import _bucket_of, hash_join
    from .common import grouped_sum

    def endpoints(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        node = np.concatenate([a, b])
        return pa.table(
            {"node": pa.array(node),
             "one": pa.array(np.ones(len(node), dtype=np.int64))}
        )

    # deg is consumed by BOTH orientation joins; oriented by both the
    # wedge expansion and the closure semi-join — materialize once in
    # the object store (lazy reuse re-runs the whole upstream chain
    # per consumer).
    deg = grouped_sum(
        edges.map_batches(endpoints, batch_format="pyarrow"),
        ["node"],
        {"deg": ("one", "sum")},
        merge="shuffle",
    ).materialize()

    def deg_as(kname: str, vname: str):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({kname: t["node"], vname: t["deg"]})

        fn.__name__ = f"deg_as_{kname}"
        return fn

    j1 = hash_join(
        edges,
        deg.map_batches(deg_as("a", "deg_a"), batch_format="pyarrow"),
        on="a",
        left_cols=["a", "b"],
        right_cols=["a", "deg_a"],
    )
    j2 = hash_join(
        j1,
        deg.map_batches(deg_as("b", "deg_b"), batch_format="pyarrow"),
        on="b",
        left_cols=["b", "a", "deg_a"],
        right_cols=["b", "deg_b"],
    )

    def orient(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        da = t["deg_a"].to_numpy(zero_copy_only=False)
        db = t["deg_b"].to_numpy(zero_copy_only=False)
        src, dst, rdst = _orient_arrays(a, b, da, db)
        return pa.table(
            {
                "src": pa.array(src),
                "dst": pa.array(dst),
                "rdst": pa.array(rdst),
                "key": pa.array((src << np.int64(31)) | dst),
            }
        )

    oriented = j2.map_batches(orient, batch_format="pyarrow").materialize()

    def route(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        return t.append_column("grp", pa.array(_bucket_of(src, n_groups)))

    _empty_wedges = pa.table(
        {"key": pa.array([], pa.int64()), "u": pa.array([], pa.int64())}
    )

    def expand(g: pa.Table) -> pa.Table:
        """Per-group wedge expansion: lexsort by (src, rank of dst),
        then size-batched triu gathers over the src segments.  Pairs
        come out rank-ordered, so the closing undirected edge — if it
        exists — is oriented exactly v -> w and matches key v<<31|w."""
        if g.num_rows == 0:
            return _empty_wedges
        src = g["src"].to_numpy(zero_copy_only=False)
        dst = g["dst"].to_numpy(zero_copy_only=False)
        rd = g["rdst"].to_numpy(zero_copy_only=False)
        order = np.lexsort((rd, src))
        src, dst = src[order], dst[order]
        change = np.flatnonzero(src[1:] != src[:-1]) + 1
        starts = np.concatenate(([0], change))
        sizes = np.diff(np.concatenate((starts, [len(src)])))
        us, keys = [], []
        for size in np.unique(sizes):
            if size < 2:
                continue
            seg_s = starts[sizes == size]
            ii, jj = np.triu_indices(int(size), k=1)
            v = dst[seg_s[:, None] + ii[None, :]].ravel()
            w = dst[seg_s[:, None] + jj[None, :]].ravel()
            us.append(np.repeat(src[seg_s], len(ii)))
            keys.append((v << np.int64(31)) | w)
        if not us:
            return _empty_wedges
        return pa.table(
            {"key": pa.array(np.concatenate(keys)),
             "u": pa.array(np.concatenate(us))}
        )

    wedges = (
        oriented.map_batches(route, batch_format="pyarrow")
        .groupby("grp")
        .map_groups(expand, batch_format="pyarrow")
    )

    tri = hash_join(
        wedges,
        oriented,
        on="key",
        how="semi",
        left_cols=["key", "u"],
        right_cols=["key"],
    )

    def corners(t: pa.Table) -> pa.Table:
        k = t["key"].to_numpy(zero_copy_only=False)
        u = t["u"].to_numpy(zero_copy_only=False)
        node = np.concatenate([u, k >> np.int64(31), k & np.int64((1 << 31) - 1)])
        return pa.table(
            {"node": pa.array(node),
             "one": pa.array(np.ones(len(node), dtype=np.int64))}
        )

    return grouped_sum(
        tri.map_batches(corners, batch_format="pyarrow"),
        ["node"],
        {"n_tri": ("one", "sum")},
        merge="shuffle",
    ).sort("node")


def graph_triangles(sf_dir: str):
    """Per-node triangle counts over the part co-purchase graph: two
    parts are linked iff some order contains both (the classic
    frequently-bought-together projection).  Exact DuckDB triple
    self-join oracle (:func:`graph_triangles_sql`)."""
    from ..stages.join import hash_join
    from .common import grouped_sum

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def side(name: str):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "okey": pc.cast(t["l_orderkey"], pa.int64()),
                    name: pc.cast(t["l_partkey"], pa.int64()),
                }
            )

        fn.__name__ = f"li_side_{name}"
        return fn

    pairs = hash_join(
        li.map_batches(side("a"), batch_format="pyarrow"),
        li.map_batches(side("b"), batch_format="pyarrow"),
        on="okey",
        left_cols=["okey", "a"],
        right_cols=["okey", "b"],
    )

    def ordered(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["a"], t["b"]))
        return pa.table(
            {
                "a": t["a"],
                "b": t["b"],
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    edges = grouped_sum(
        pairs.map_batches(ordered, batch_format="pyarrow"),
        ["a", "b"],
        {"w": ("one", "min")},  # distinct undirected edges
        merge="shuffle",
    ).select_columns(["a", "b"])

    return triangles(edges)


def graph_triangles_sql() -> str:
    return """
WITH e AS (
  SELECT DISTINCT CAST(l1.l_partkey AS BIGINT) AS a,
                  CAST(l2.l_partkey AS BIGINT) AS b
  FROM lineitem l1
  JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1
  JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
)
SELECT node, CAST(count(*) AS BIGINT) AS n_tri
FROM (
  SELECT x AS node FROM tri
  UNION ALL SELECT y AS node FROM tri
  UNION ALL SELECT z AS node FROM tri
) c
GROUP BY node
ORDER BY node
"""


# ---------------------------------------------------------------------------
# k-core decomposition (iterative peeling) on the shard-once BSP engine
# ---------------------------------------------------------------------------

KCORE_K = 2
KCORE_MIN_W = 2       # co-purchase edge threshold (>= 2 shared orders)
KCORE_MAX_ROUNDS = 10  # SQL twin unrolls this many peel rounds


def kcore_bsp(edges, k: int, n_buckets: int = 64,
              max_rounds: int = KCORE_MAX_ROUNDS):
    """k-core via synchronous peeling over the shard-once BSP engine:
    every round each node counts its ALIVE neighbors and dies if the
    count is < k; fixpoint = the k-core.  Returns a Dataset
    (node, deg) of surviving nodes with their in-core degree.

    ``edges`` must contain BOTH orientations of each distinct
    undirected edge (so out-degree == undirected degree and every node
    appears as a src in its owner shard); multiplicities are honored
    via the shard weights (pass distinct edges for simple-graph cores).

    Per round: B owner-bucket lookup tasks serve alive flags for the
    STATIC distinct-dst request lists built at shard time (dstp_refs),
    then B update tasks recount degrees (one np.add.at over the static
    edge codes) and kill locally — only alive bitmaps move; the driver
    sees B kill-counts per round.  Raises if max_rounds is hit before
    the fixpoint so the unrolled SQL twin can never silently diverge.
    """
    import ray
    import ray.data

    B = n_buckets
    mat = edges.materialize()
    shard_refs, dstp_refs = _shard_graph(mat.to_arrow_refs(), B)
    nodes_refs, _ = _init_buckets(shard_refs, dstp_refs, B, fill=1)
    ray.wait(list(shard_refs), num_returns=B, fetch_local=False)
    del mat

    def _init_alive(nodes):
        return np.ones(len(nodes), dtype=bool)

    def _serve(nodes, alive, *req_lists):
        """Owner bucket c: alive flags for each shard b's distinct dsts
        owned by c (req_lists[b] = dstp_refs[b] value, indexed [c] by
        the closure bucket)."""
        out = [alive[np.searchsorted(nodes, req)] if len(req) else
               np.array([], dtype=bool) for req in req_lists]
        return out if B > 1 else out[0]

    def _update(shard, nodes, alive, *alive_pieces):
        """Shard/owner bucket b: recount alive-neighbor degrees for its
        srcs and kill those below k.  Returns (alive', deg_by_node,
        n_kills)."""
        deg = np.zeros(len(nodes), dtype=np.int64)
        if len(shard["usrc"]):
            alive_udst = np.zeros(len(shard["udst"]), dtype=bool)
            ub = shard["udst_bkt"]
            for c in range(B):
                piece = alive_pieces[c]
                if len(piece):
                    alive_udst[ub == c] = piece
            pos = np.searchsorted(nodes, shard["usrc"])
            e_alive = alive_udst[shard["dst_code"]]
            dsum = np.zeros(len(shard["usrc"]), dtype=np.int64)
            np.add.at(dsum, shard["src_code"],
                      np.where(e_alive, shard["w"], 0))
            # a dead src keeps degree 0 so it can never resurrect
            deg[pos] = np.where(alive[pos], dsum, 0)
        new_alive = alive & (deg >= k)
        return new_alive, deg, int((alive & ~new_alive).sum())

    init = ray.remote(_init_alive)
    serve = ray.remote(num_returns=B)(_serve)
    update = ray.remote(num_returns=3)(_update)

    alive_refs = [init.remote(nodes_refs[b]) for b in range(B)]
    deg_refs = alive_refs  # placeholder; set in round 1

    # static request lists: req_refs[b][c] = shard b's distinct dsts
    # owned by bucket c — split ONCE from each dstp list, reused every
    # round (the pieces stay in the object store)
    def _sel(dp, c):
        return dp[c]

    sel = ray.remote(_sel)
    req_refs = [[sel.remote(dstp_refs[b], c) for c in range(B)]
                for b in range(B)]

    converged = False
    for _ in range(max_rounds + 1):  # +1: the confirming zero-kill round
        served = [
            serve.remote(nodes_refs[c], alive_refs[c],
                         *[req_refs[b][c] for b in range(B)])
            for c in range(B)
        ]
        if B == 1:
            served = [[s] for s in served]
        out = [update.remote(shard_refs[b], nodes_refs[b], alive_refs[b],
                             *[served[c][b] for c in range(B)])
               for b in range(B)]
        alive_refs = [o[0] for o in out]
        deg_refs = [o[1] for o in out]
        kills = sum(ray.get([o[2] for o in out]))
        if kills == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"kcore_bsp: peeling exceeded max_rounds={max_rounds}; "
            f"raise the cap (and the SQL twin's unroll) together"
        )

    def _emit(nodes, alive, deg):
        return pa.table({"node": pa.array(nodes[alive]),
                         "deg": pa.array(deg[alive])})

    emit = ray.remote(_emit)
    return ray.data.from_arrow_refs(
        [emit.remote(nodes_refs[b], alive_refs[b], deg_refs[b])
         for b in range(B)]
    )


def graph_kcore(sf_dir: str, k: int = KCORE_K):
    """k-core of the thresholded part co-purchase graph (parts linked
    iff co-ordered in >= KCORE_MIN_W orders — the raw co-purchase
    projection is too dense to peel).  Exact unrolled-peel DuckDB
    oracle (:func:`graph_kcore_sql`)."""
    from ..stages.join import hash_join
    from .common import grouped_sum

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def side(name: str):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "okey": pc.cast(t["l_orderkey"], pa.int64()),
                    name: pc.cast(t["l_partkey"], pa.int64()),
                }
            )

        fn.__name__ = f"li_side_{name}"
        return fn

    pairs = hash_join(
        li.map_batches(side("a"), batch_format="pyarrow"),
        li.map_batches(side("b"), batch_format="pyarrow"),
        on="okey",
        left_cols=["okey", "a"],
        right_cols=["okey", "b"],
    )

    def ordered(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["a"], t["b"]))
        return pa.table(
            {
                "a": t["a"],
                "b": t["b"],
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    edges = grouped_sum(
        pairs.map_batches(ordered, batch_format="pyarrow"),
        ["a", "b"],
        {"w": ("one", "sum")},
        merge="shuffle",
    )

    def both_ways(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["w"], pa.scalar(KCORE_MIN_W)))
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b])),
                "dst": pa.array(np.concatenate([b, a])),
            }
        )

    undirected = edges.map_batches(both_ways, batch_format="pyarrow")
    return kcore_bsp(undirected, k=k).sort("node")


def graph_kcore_sql(k: int = KCORE_K, rounds: int = KCORE_MAX_ROUNDS) -> str:
    head = f"""
WITH e0 AS MATERIALIZED (
  SELECT CAST(l1.l_partkey AS BIGINT) AS a, CAST(l2.l_partkey AS BIGINT) AS b
  FROM lineitem l1
  JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= {KCORE_MIN_W}
),
a0 AS MATERIALIZED (
  SELECT DISTINCT node FROM (
    SELECT a AS node FROM e0 UNION ALL SELECT b AS node FROM e0
  )
)"""
    step = """,
a{i} AS MATERIALIZED (
  SELECT node FROM (
    SELECT node, count(*) AS d FROM (
      SELECT e.a AS node FROM e0 e
      JOIN a{p} x ON e.a = x.node JOIN a{p} y ON e.b = y.node
      UNION ALL
      SELECT e.b AS node FROM e0 e
      JOIN a{p} x ON e.a = x.node JOIN a{p} y ON e.b = y.node
    ) GROUP BY node
  ) WHERE d >= {k}
)"""
    steps = [step.format(i=i, p=i - 1, k=k) for i in range(1, rounds + 1)]
    return head + "".join(steps) + f"""
SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
  SELECT e.a AS node FROM e0 e
  JOIN a{rounds} x ON e.a = x.node JOIN a{rounds} y ON e.b = y.node
  UNION ALL
  SELECT e.b AS node FROM e0 e
  JOIN a{rounds} x ON e.a = x.node JOIN a{rounds} y ON e.b = y.node
) GROUP BY node
ORDER BY node
"""


# ---------------------------------------------------------------------------
# Multi-source BFS hop distance — the graph-TRAVERSAL class next to the
# fixpoint (components), sum-propagate (pagerank/hits) and peel (kcore)
# families.  Same shard-once BSP shape: the static graph is pre-encoded
# into B object-store shards and each synchronous round is B min-plus
# contribution tasks (dist lookup by searchsorted, one np.minimum.at
# per shard) feeding B merge tasks; only the int64 distance arrays and
# the sub-INF contribution pieces move per round.  dist_{i+1}(u) =
# min(dist_i(u), 1 + min over in-neighbours) — after R rounds this is
# exactly "min hops from any seed, capped at R", matching the unrolled
# SQL twin round for round.
# ---------------------------------------------------------------------------

BFS_INF = np.int64(1) << 60
BFS_ROUNDS = 3
BFS_SEED_MOD = 97


def bfs_bsp(edges, seed_pred, rounds: int = BFS_ROUNDS, n_buckets: int = 64):
    """BFS hop distances over ``edges`` (src, dst int64) from the seed
    set ``{node : seed_pred(node)}`` (vectorized numpy predicate over
    node-id arrays — evaluated bucket-locally, no seed exchange).
    Returns a Dataset (node, hops) holding every node reached within
    ``rounds`` hops."""
    import ray
    import ray.data

    B = n_buckets
    mat = edges.materialize()  # pin blocks through the shard build
    shard_refs, dstp_refs = _shard_graph(mat.to_arrow_refs(), B)
    nodes_refs, dist_refs = _init_buckets(shard_refs, dstp_refs, B, int(BFS_INF))
    ray.wait(list(shard_refs), num_returns=B, fetch_local=False)
    del mat

    def _seed(nodes, d):
        d = d.copy()
        d[seed_pred(nodes)] = 0
        return d

    seed = ray.remote(_seed)
    dist_refs = [seed.remote(nodes_refs[b], dist_refs[b]) for b in range(B)]

    def _contrib(shard, nodes, d):
        if len(shard["usrc"]) == 0:
            e = np.array([], dtype=np.int64)
            return [(e, e)] * B if B > 1 else (e, e)
        du = d[np.searchsorted(nodes, shard["usrc"])]
        per_edge = (du + 1)[shard["src_code"]]
        c = np.full(len(shard["udst"]), BFS_INF + 1, dtype=np.int64)
        np.minimum.at(c, shard["dst_code"], per_edge)
        ub = shard["udst_bkt"]
        out = []
        for b in range(B):
            m = (ub == b) & (c <= BFS_INF)  # ship only reachable dsts
            out.append((shard["udst"][m], c[m]))
        return out if B > 1 else out[0]

    def _merge(nodes, d, *pieces):
        nd = d.copy()
        for n_, c in pieces:
            if len(n_):
                np.minimum.at(nd, np.searchsorted(nodes, n_), c)
        return nd

    contrib = ray.remote(num_returns=B)(_contrib)
    merge = ray.remote(_merge)

    for _ in range(rounds):
        piece = [contrib.remote(shard_refs[b], nodes_refs[b], dist_refs[b])
                 for b in range(B)]
        if B == 1:
            piece = [[p] for p in piece]
        dist_refs = [
            merge.remote(nodes_refs[b], dist_refs[b],
                         *[piece[s][b] for s in range(B)])
            for b in range(B)
        ]

    def _emit(nodes, d):
        m = d < BFS_INF
        return pa.table({"node": pa.array(nodes[m]), "hops": pa.array(d[m])})

    emit = ray.remote(_emit)
    out_refs = [emit.remote(nodes_refs[b], dist_refs[b]) for b in range(B)]
    return ray.data.from_arrow_refs(out_refs)


def graph_bfs_hops(sf_dir: str, rounds: int = BFS_ROUNDS):
    """Hop distance from the seed customers (custkey % BFS_SEED_MOD == 0)
    over the UNDIRECTED customer–supplier order graph (one edge per
    lineitem, both directions).  Exact unrolled-round DuckDB oracle
    (:func:`graph_bfs_hops_sql`)."""
    from ..stages.join import hash_join

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])

    def o_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"okey": pc.cast(t["o_orderkey"], pa.int64()),
             "cust": pc.cast(t["o_custkey"], pa.int64())}
        )

    def l_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "okey": pc.cast(t["l_orderkey"], pa.int64()),
                "supp": pc.add(
                    pc.cast(t["l_suppkey"], pa.int64()),
                    pa.scalar(SUPP_NODE_OFFSET, pa.int64()),
                ),
            }
        )

    joined = hash_join(
        li.map_batches(l_prep, batch_format="pyarrow"),
        orders.map_batches(o_prep, batch_format="pyarrow"),
        on="okey",
        left_cols=["okey", "supp"],
        right_cols=["okey", "cust"],
    )

    def both_ways(t: pa.Table) -> pa.Table:
        c = t["cust"].to_numpy(zero_copy_only=False)
        s = t["supp"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.concatenate([c, s])),
                "dst": pa.array(np.concatenate([s, c])),
            }
        )

    edges = joined.map_batches(both_ways, batch_format="pyarrow")

    def seeds(nodes: np.ndarray) -> np.ndarray:
        return (nodes < SUPP_NODE_OFFSET) & (nodes % BFS_SEED_MOD == 0)

    return bfs_bsp(edges, seeds, rounds=rounds).sort("node")


def graph_bfs_hops_sql(rounds: int = BFS_ROUNDS) -> str:
    head = f"""
WITH e AS MATERIALIZED (
  SELECT CAST(o_custkey AS BIGINT) AS src,
         CAST(l_suppkey AS BIGINT) + {SUPP_NODE_OFFSET} AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  UNION ALL
  SELECT CAST(l_suppkey AS BIGINT) + {SUPP_NODE_OFFSET},
         CAST(o_custkey AS BIGINT)
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
d0 AS MATERIALIZED (
  SELECT DISTINCT src AS node, 0 AS hops FROM e
  WHERE src < {SUPP_NODE_OFFSET} AND src % {BFS_SEED_MOD} = 0
)"""
    step = """,
d{i} AS MATERIALIZED (
  SELECT node, MIN(hops) AS hops FROM (
    SELECT node, hops FROM d{p}
    UNION ALL
    SELECT e.dst AS node, d{p}.hops + 1 AS hops
    FROM e JOIN d{p} ON e.src = d{p}.node
  ) GROUP BY node
)"""
    steps = [step.format(i=i, p=i - 1) for i in range(1, rounds + 1)]
    return head + "".join(steps) + f"""
SELECT node, CAST(hops AS BIGINT) AS hops FROM d{rounds} ORDER BY node
"""


# ---------------------------------------------------------------------------
# Weighted single-source (multi-seed) shortest path — Bellman-Ford
# rounds on the same shard-once BSP engine as bfs_bsp, with per-edge
# integer weights riding the shard build (parallel edges collapse by
# MIN weight at encode time).  dist_{i+1}(v) = min(dist_i(v),
# min over in-edges (u,v): dist_i(u) + w(u,v)) — after R rounds this
# is exactly "cheapest path using <= R edges", matching the unrolled
# SQL twin round for round (no fixpoint/termination ambiguity in the
# oracle).  Per round only the int64 distance arrays and sub-INF
# contribution pieces move; the weighted shards are static.
# ---------------------------------------------------------------------------

SSSP_ROUNDS = 3
SSSP_SEED_MOD = 97


def sssp_bsp(edges, seed_pred, rounds: int = SSSP_ROUNDS, n_buckets: int = 64):
    """Weighted shortest-path distances over ``edges`` (src, dst, w
    int64; w >= 0) from the seed set ``{node : seed_pred(node)}``.
    Returns a Dataset (node, dist) of nodes reached within ``rounds``
    edge relaxations."""
    import ray
    import ray.data

    B = n_buckets
    mat = edges.materialize()  # pin blocks through the shard build
    shard_refs, dstp_refs = _shard_graph(mat.to_arrow_refs(), B, w_col="w")
    nodes_refs, dist_refs = _init_buckets(shard_refs, dstp_refs, B, int(BFS_INF))
    ray.wait(list(shard_refs), num_returns=B, fetch_local=False)
    del mat

    def _seed(nodes, d):
        d = d.copy()
        d[seed_pred(nodes)] = 0
        return d

    seed = ray.remote(_seed)
    dist_refs = [seed.remote(nodes_refs[b], dist_refs[b]) for b in range(B)]

    def _contrib(shard, nodes, d):
        if len(shard["usrc"]) == 0:
            e = np.array([], dtype=np.int64)
            return [(e, e)] * B if B > 1 else (e, e)
        du = d[np.searchsorted(nodes, shard["usrc"])]
        # clamp so INF + w cannot wrap; INF stays INF-scale
        per_edge = np.minimum(du[shard["src_code"]], BFS_INF) + shard["w"]
        c = np.full(len(shard["udst"]), BFS_INF + 1, dtype=np.int64)
        np.minimum.at(c, shard["dst_code"], per_edge)
        ub = shard["udst_bkt"]
        out = []
        for b in range(B):
            m = (ub == b) & (c < BFS_INF)  # ship only reachable dsts
            out.append((shard["udst"][m], c[m]))
        return out if B > 1 else out[0]

    def _merge(nodes, d, *pieces):
        nd = d.copy()
        for n_, c in pieces:
            if len(n_):
                np.minimum.at(nd, np.searchsorted(nodes, n_), c)
        return nd

    contrib = ray.remote(num_returns=B)(_contrib)
    merge = ray.remote(_merge)

    for _ in range(rounds):
        piece = [contrib.remote(shard_refs[b], nodes_refs[b], dist_refs[b])
                 for b in range(B)]
        if B == 1:
            piece = [[p] for p in piece]
        dist_refs = [
            merge.remote(nodes_refs[b], dist_refs[b],
                         *[piece[s][b] for s in range(B)])
            for b in range(B)
        ]

    def _emit(nodes, d):
        m = d < BFS_INF
        return pa.table({"node": pa.array(nodes[m]), "dist": pa.array(d[m])})

    emit = ray.remote(_emit)
    out_refs = [emit.remote(nodes_refs[b], dist_refs[b]) for b in range(B)]
    return ray.data.from_arrow_refs(out_refs)


def graph_sssp(sf_dir: str, rounds: int = SSSP_ROUNDS):
    """Cheapest-path distance from the seed customers
    (custkey % SSSP_SEED_MOD == 0) over the undirected customer–supplier
    order graph, edge weight 1 + l_partkey % 5 (both directions, data-
    derived, parallel edges min-collapsed).  Exact unrolled-round
    DuckDB oracle (:func:`graph_sssp_sql`)."""
    from ..stages.join import hash_join

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_partkey"])

    def o_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"okey": pc.cast(t["o_orderkey"], pa.int64()),
             "cust": pc.cast(t["o_custkey"], pa.int64())}
        )

    def l_prep(t: pa.Table) -> pa.Table:
        pk = pc.cast(t["l_partkey"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "okey": pc.cast(t["l_orderkey"], pa.int64()),
                "supp": pc.add(
                    pc.cast(t["l_suppkey"], pa.int64()),
                    pa.scalar(SUPP_NODE_OFFSET, pa.int64()),
                ),
                "w": pa.array(1 + pk % 5),
            }
        )

    joined = hash_join(
        li.map_batches(l_prep, batch_format="pyarrow"),
        orders.map_batches(o_prep, batch_format="pyarrow"),
        on="okey",
        left_cols=["okey", "supp", "w"],
        right_cols=["okey", "cust"],
    )

    def both_ways(t: pa.Table) -> pa.Table:
        c = t["cust"].to_numpy(zero_copy_only=False)
        s = t["supp"].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.concatenate([c, s])),
                "dst": pa.array(np.concatenate([s, c])),
                "w": pa.array(np.concatenate([w, w])),
            }
        )

    edges = joined.map_batches(both_ways, batch_format="pyarrow")

    def seeds(nodes: np.ndarray) -> np.ndarray:
        return (nodes < SUPP_NODE_OFFSET) & (nodes % SSSP_SEED_MOD == 0)

    return sssp_bsp(edges, seeds, rounds=rounds).sort("node")


def graph_sssp_sql(rounds: int = SSSP_ROUNDS) -> str:
    head = f"""
WITH e AS MATERIALIZED (
  SELECT CAST(o_custkey AS BIGINT) AS src,
         CAST(l_suppkey AS BIGINT) + {SUPP_NODE_OFFSET} AS dst,
         CAST(1 + l_partkey % 5 AS BIGINT) AS w
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  UNION ALL
  SELECT CAST(l_suppkey AS BIGINT) + {SUPP_NODE_OFFSET},
         CAST(o_custkey AS BIGINT),
         CAST(1 + l_partkey % 5 AS BIGINT)
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
d0 AS MATERIALIZED (
  SELECT DISTINCT src AS node, 0 AS dist FROM e
  WHERE src < {SUPP_NODE_OFFSET} AND src % {SSSP_SEED_MOD} = 0
)"""
    step = """,
d{i} AS MATERIALIZED (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT node, dist FROM d{p}
    UNION ALL
    SELECT e.dst AS node, d{p}.dist + e.w AS dist
    FROM e JOIN d{p} ON e.src = d{p}.node
  ) GROUP BY node
)"""
    steps = [step.format(i=i, p=i - 1) for i in range(1, rounds + 1)]
    return head + "".join(steps) + f"""
SELECT node, CAST(dist AS BIGINT) AS dist FROM d{rounds} ORDER BY node
"""
