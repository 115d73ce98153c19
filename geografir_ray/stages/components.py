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
