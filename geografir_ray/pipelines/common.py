"""Shared pipeline helpers: exact float→integer aggregation and
pre-aggregated (combiner-style) groupbys.

Float sums are order-dependent, and Ray's reduction tree will not
match DuckDB's scan order ulp-for-ulp.  The engine therefore aggregates
value columns in integer domain: per-row ``floor(expr * scale)`` (both
engines compute identical doubles row-wise, so identical int64), then
exact int64 sums, then an optional final division.  This makes the
driver's value-hash comparison exact, not approximate — and it is also
the deterministic-aggregation strategy SURVEY.md §7.4.5 calls for.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def floor_scale(arr: pa.ChunkedArray | pa.Array, scale: float = 100.0) -> pa.Array:
    """int64 floor(arr * scale) — the exact-aggregation encoding."""
    return pc.cast(pc.floor(pc.multiply(arr, pa.scalar(float(scale)))), pa.int64())


def floor_scale_sql(expr: str, scale: float = 100.0) -> str:
    return f"CAST(floor(({expr}) * {float(scale)}) AS BIGINT)"


def partial_groupby(keys: list[str], aggs: dict[str, tuple[str, str]]):
    """Combiner stage: per-batch pyarrow group_by partial aggregation.

    aggs: out_col -> (in_col, fn) with fn in {"sum", "count", "min", "max"}.
    Emits one row per key per batch — collapses hot keys *before* the
    all-to-all shuffle (SURVEY.md §4 "pre-aggregate before shuffle").
    The caller then runs a tiny global groupby over the partials with
    the matching merge fn (sum→sum, count→sum, min→min, max→max).
    """

    def fn(batch: pa.Table) -> pa.Table:
        spec = []
        renames = {}
        for out, (col, how) in aggs.items():
            if how == "count":
                spec.append((col, "count"))
                renames[f"{col}_count"] = out
            else:
                spec.append((col, how))
                renames[f"{col}_{how}"] = out
        g = batch.group_by(keys).aggregate(spec)
        cols = {}
        for name in g.column_names:
            cols[renames.get(name, name)] = g[name]
        return pa.table(cols)

    fn.__name__ = f"partial_groupby[{','.join(keys)}]"
    return fn


def merge_fn_for(how: str) -> str:
    return {"sum": "sum", "count": "sum", "min": "min", "max": "max"}[how]


def grouped_sum(
    ds,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    merge: str = "shuffle",
):
    """Two-phase exact aggregation: per-batch partials → global merge.

    merge="shuffle": global groupby over the partials (all-to-all) —
    required when key cardinality is unbounded (urls, tokens, pairs).

    merge="driver": stream the partial batches to the driver and merge
    with one vectorized pyarrow group_by — correct whenever the DISTINCT
    key count is bounded (zones<=25, nations<=25, 1-degree tiles<=64800,
    hours, brands...): the partial set is O(keys x batches) tiny rows
    and the all-to-all shuffle is pure overhead (~2-3 s/query at sf0.1).

    Returns a Dataset with columns keys + list(aggs).
    """
    from ray.data.aggregate import Max, Min, Sum

    partial = ds.map_batches(
        partial_groupby(keys, aggs), batch_format="pyarrow", zero_copy_batch=True
    )
    if merge == "driver":
        import ray.data

        tables = [
            b
            for b in partial.iter_batches(batch_size=None, batch_format="pyarrow")
            if b.num_rows
        ]
        if not tables:
            return partial  # empty; schema preserved
        whole = pa.concat_tables(tables, promote_options="permissive")
        spec = []
        renames = {}
        for out, (_, how) in aggs.items():
            m = merge_fn_for(how)
            spec.append((out, m))
            renames[f"{out}_{m}"] = out
        g = whole.group_by(keys).aggregate(spec)
        g = g.rename_columns([renames.get(c, c) for c in g.column_names])
        return ray.data.from_arrow(g.select([*keys, *aggs.keys()]))

    ray_aggs = []
    for out, (_, how) in aggs.items():
        m = merge_fn_for(how)
        cls = {"sum": Sum, "min": Min, "max": Max}[m]
        ray_aggs.append(cls(out, alias_name=out))
    return partial.groupby(keys).aggregate(*ray_aggs)
