"""Connected components via iterative distributed min-label propagation.

Shared engine for every clustering-style operator (near-dup dedup
groups, spatial point clusters): each round every node takes the min
label among itself and its neighbors — one bucketed hash join + one
grouped min per round.  Labels are monotone non-increasing non-negative
ints, so global-label-SUM equality IS the fixpoint test (no row-wise
diff).  Rounds needed = graph diameter.

Scale shape: both the join and the min-merge are the existing bucketed
exchanges (stages/join.hash_join, pipelines/common.grouped_sum); no
driver-side structure grows with the graph.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def min_label_components(edges, labels, max_iters: int = 25, op_name: str = "components"):
    """Propagate min labels over directed ``edges`` (node, dst) starting
    from ``labels`` (node, label) until fixpoint; returns the final
    (node, label) Dataset.  Raises if the cap is hit before the
    fixpoint — a silent early exit would diverge from any transitive-
    closure oracle (components with diameter > max_iters).

    Both inputs should be materialized by the caller if they are
    consumed elsewhere too.
    """
    from ..pipelines.common import grouped_sum
    from .join import hash_join

    # Coalesce both sides once: every round re-sorts them inside
    # hash_join, and sample-sort cost scales with block COUNT, not rows
    # (CLAUDE.md rule 9) — groupby/map_groups outputs arrive as hundreds
    # of tiny blocks and would otherwise compound per round.
    edges = edges.repartition(16).materialize()
    labels = labels.repartition(8).materialize()

    prev_sum = labels.sum("label")
    converged = False
    for _ in range(max_iters):
        # pointer doubling: besides graph edges, relabel through the
        # label's OWN label (label values are always node ids), so
        # effective reach doubles per round — rounds = O(log diameter),
        # not O(diameter).  The doubling relation has the same (node,
        # dst) shape as edges, so both ride ONE join per round.
        hop = labels.map_batches(
            lambda t: pa.table({"node": t["label"], "dst": t["node"]}),
            batch_format="pyarrow",
        )
        msgs = hash_join(
            edges.union(hop),
            labels,
            on="node",
            left_cols=["node", "dst"],
            right_cols=["node", "label"],
        ).map_batches(
            lambda t: pa.table({"node": t["dst"], "label": t["label"]}),
            batch_format="pyarrow",
        )
        labels = (
            grouped_sum(
                labels.union(msgs),
                ["node"],
                {"label": ("label", "min")},
            )
            .repartition(8)
            .materialize()
        )
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        raise RuntimeError(
            f"{op_name}: min-label propagation did not reach a fixpoint "
            f"within max_iters={max_iters} (label sum still changing); "
            f"raise max_iters for long chains"
        )
    return labels


def min_label_components_bsp(
    edges,
    n_buckets: int = 64,
    max_rounds: int = 64,
):
    """Connected components on the shard-once BSP engine (the same
    escape hatch as pipelines/graph.pagerank — CLAUDE.md rule 22):
    edges are hash-sharded ONCE into pre-encoded object-store shards
    and each round moves only label arrays, so per-round cost is
    milliseconds instead of a full Dataset re-sort of the static edge
    set (the :func:`min_label_components` form measured ~9 s/round of
    fixed exchange overhead at ANY size).

    Labels start as the node's own id and flow along directed edges
    (src -> dst); pass both orientations for undirected components.
    Each round runs TWO phases, both bucketed minimum.at exchanges:

      1. edge relax:  label(dst) <- min(label(dst), label(src))
      2. pointer doubling: label(v) <- min(label(v), label(label(v)))
         — label values are node ids, so the round-reach doubles and
         total rounds are O(log diameter), matching the Dataset twin.

    Every graph node appears in exactly one bucket's sorted node array
    (bucket = splitmix64(node) % B), which is what makes the doubling
    lookup a local searchsorted in label-owner buckets.  Returns a
    Dataset (node, label).  Raises if max_rounds is hit pre-fixpoint.
    """
    import ray
    import ray.data

    from ..functions.hashing import splitmix64
    from ..pipelines.graph import _init_buckets, _shard_graph

    B = n_buckets
    mat = edges.materialize()
    shard_refs, dstp_refs = _shard_graph(mat.to_arrow_refs(), B)
    nodes_refs, _ = _init_buckets(shard_refs, dstp_refs, B, fill=0)
    ray.wait(list(shard_refs), num_returns=B, fetch_local=False)
    del mat

    def _init_labels(nodes):
        return nodes.copy()  # label = own node id

    def _relax(shard, nodes, lab):
        """Phase-1 contribution: per dst-bucket (dst nodes, min src label)."""
        if len(shard["usrc"]) == 0:
            e = np.array([], dtype=np.int64)
            return [(e, e)] * B if B > 1 else (e, e)
        lu = lab[np.searchsorted(nodes, shard["usrc"])]
        c = np.full(len(shard["udst"]), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(c, shard["dst_code"], lu[shard["src_code"]])
        ub = shard["udst_bkt"]
        out = [(shard["udst"][ub == b], c[ub == b]) for b in range(B)]
        return out if B > 1 else out[0]

    def _merge_relax(nodes, lab, *pieces):
        """Phase-1 merge + emit doubling requests (label, node) routed
        to the label's owner bucket."""
        new = lab.copy()
        for nd, c in pieces:
            if len(nd):
                np.minimum.at(new, np.searchsorted(nodes, nd), c)
        want = new != nodes  # self-labeled nodes need no lookup
        l_arr, v_arr = new[want], nodes[want]
        lb = (splitmix64(l_arr.astype(np.uint64)) % np.uint64(B)).astype(np.int64)
        order = np.argsort(lb, kind="stable")
        lb, l_arr, v_arr = lb[order], l_arr[order], v_arr[order]
        bounds = np.searchsorted(lb, np.arange(B + 1))
        reqs = [
            (l_arr[bounds[b]:bounds[b + 1]], v_arr[bounds[b]:bounds[b + 1]])
            for b in range(B)
        ]
        return (new, *reqs)

    def _lookup(nodes, lab, *reqs):
        """Phase-2 lookup in the label-owner bucket: label(label(v))."""
        out = []
        for l_arr, v_arr in reqs:
            if len(l_arr):
                out.append((v_arr, lab[np.searchsorted(nodes, l_arr)]))
            else:
                e = np.array([], dtype=np.int64)
                out.append((e, e))
        return out if B > 1 else out[0]

    def _merge_double(nodes, lab, start, *replies):
        new = lab.copy()
        for v_arr, ll in replies:
            if len(v_arr):
                np.minimum.at(new, np.searchsorted(nodes, v_arr), ll)
        return new, int((new != start).sum())

    init = ray.remote(_init_labels)
    relax = ray.remote(num_returns=B)(_relax)
    merge_relax = ray.remote(num_returns=B + 1)(_merge_relax)
    lookup = ray.remote(num_returns=B)(_lookup)
    merge_double = ray.remote(num_returns=2)(_merge_double)

    lab_refs = [init.remote(nodes_refs[b]) for b in range(B)]

    converged = False
    for _ in range(max_rounds):
        start_refs = lab_refs
        piece = [relax.remote(shard_refs[b], nodes_refs[b], lab_refs[b])
                 for b in range(B)]
        if B == 1:
            piece = [[p] for p in piece]
        mr = [merge_relax.remote(nodes_refs[b], lab_refs[b],
                                 *[piece[s][b] for s in range(B)])
              for b in range(B)]
        relaxed = [m[0] for m in mr]
        # reqs[b][c]: bucket b's requests owned by bucket c
        reqs = [m[1:] for m in mr]
        lk = [lookup.remote(nodes_refs[c], relaxed[c],
                            *[reqs[b][c] for b in range(B)])
              for c in range(B)]
        if B == 1:
            lk = [[r] for r in lk]
        out = [merge_double.remote(nodes_refs[b], relaxed[b], start_refs[b],
                                   *[lk[c][b] for c in range(B)])
               for b in range(B)]
        lab_refs = [o[0] for o in out]
        changed = sum(ray.get([o[1] for o in out]))
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"components_bsp: no fixpoint within max_rounds={max_rounds}"
        )

    def _emit(nodes, lab):
        return pa.table({"node": pa.array(nodes), "label": pa.array(lab)})

    emit = ray.remote(_emit)
    return ray.data.from_arrow_refs(
        [emit.remote(nodes_refs[b], lab_refs[b]) for b in range(B)]
    )
