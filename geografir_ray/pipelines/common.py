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


def group_by_nullsafe(t: pa.Table, keys: list[str], spec: list) -> pa.Table:
    """``pa.Table.group_by(keys).aggregate(spec)`` with null-free key
    encoding.  pyarrow 16.1's multi-key grouper emits data-dependent
    DUPLICATE groups when a key column contains nulls (observed: 36
    null-key rows spanning 6 int subkeys grouped into 19 rows, stable
    across buffer rebuilds; single-key grouping is fine).  Keys with
    nulls are grouped as (fill_null(col, sentinel), is_null flag) —
    null-free, so the sentinel can't collide with a real value — and
    the nulls are restored on the output."""
    aug = t
    flags: list[tuple[str, str]] = []
    for k in keys:
        col = t[k]
        if col.null_count == 0:
            continue
        typ = col.type
        flag = f"__nv_{k}"
        if pa.types.is_null(typ):
            # degenerate all-null key column (Arrow null type): one
            # group; stand in a constant and restore nulls after
            filled = pa.array(np.zeros(len(col), dtype=np.int8))
        else:
            if pa.types.is_string(typ) or pa.types.is_large_string(typ):
                sentinel: object = ""
            elif pa.types.is_binary(typ) or pa.types.is_large_binary(typ):
                sentinel = b""
            else:
                sentinel = pc.cast(pa.scalar(0, pa.int64()), typ)
            filled = pc.fill_null(col, sentinel)
        aug = aug.set_column(aug.schema.get_field_index(k), k, filled)
        aug = aug.append_column(flag, pc.cast(pc.is_null(col), pa.int8()))
        flags.append((k, flag))
    g = aug.group_by(keys + [f for _, f in flags]).aggregate(spec)
    for k, flag in flags:
        restored = pc.if_else(
            pc.equal(g[flag], 1),
            pa.scalar(None, type=g.schema.field(k).type),
            g[k],
        )
        g = g.set_column(g.schema.get_field_index(k), k, restored)
        g = g.drop_columns([flag])
    return g


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
        g = group_by_nullsafe(batch, keys, spec)
        cols = {}
        for name in g.column_names:
            cols[renames.get(name, name)] = g[name]
        return pa.table(cols)

    fn.__name__ = f"partial_groupby[{','.join(keys)}]"
    return fn


def merge_fn_for(how: str) -> str:
    return {"sum": "sum", "count": "sum", "min": "min", "max": "max"}[how]


def bucket_ids(t: pa.Table, keys: list[str], n_buckets: int) -> np.ndarray:
    """Deterministic int64 bucket id per row from the key columns:
    splitmix64 for integer-castable keys, buffer-native SipHash for
    strings, hash-combined across a composite key.  Rows sharing a key
    always share a bucket, so per-bucket aggregation is exact.  Nulls
    are filled with a sentinel before hashing — a null key merely
    shares a bucket with the sentinel value, which is harmless (bucket
    assignment only needs same-key → same-bucket, not injectivity);
    the per-bucket Arrow group_by still keeps null as its own group."""
    from ..functions.hashing import hash_strings, splitmix64

    h = np.zeros(t.num_rows, dtype=np.uint64)
    for k in keys:
        col = t[k]
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            hk = hash_strings(pc.fill_null(col, ""))
        else:
            hk = splitmix64(
                pc.fill_null(pc.cast(col, pa.int64()), 0)
                .to_numpy(zero_copy_only=False)
                .astype(np.uint64)
            )
        h = splitmix64(h ^ hk)
    return (h % np.uint64(n_buckets)).astype(np.int64)


def grouped_sum(
    ds,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    merge: str = "bucket",
    n_buckets: int = 64,
    empty_schema: pa.Schema | None = None,
):
    """Two-phase exact aggregation: per-batch partials → global merge.

    merge="bucket" (DEFAULT): ONE hash-partition exchange — tag each
    partial row with hash(keys) % n_buckets, co-locate by bucket, and
    finish each bucket with a single vectorized pyarrow group_by (C++
    hash agg).  Same _shuffle_dedup shape that runs 12M urls in ~4 s;
    the per-group Python cost is per-BUCKET (bounded n_buckets calls),
    not per-key.  Output rows are NOT globally key-sorted (sort after
    if you need order).  Size n_buckets so one bucket's distinct keys
    fit a worker heap.

    merge="shuffle": Ray's global groupby over the partials.  CAUTION:
    Ray's sort-based Aggregate degrades badly with DISTINCT-group count
    (measured on 10M rows / 64 blocks at 32 CPUs: 2.5 s at 1k groups,
    29 s at 100k, 62 s at 8M where merge="bucket" runs flat 2-4.6 s
    over the same sweep) — kept only as the sortedness-preserving twin.

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
    if merge == "bucket":

        def tag(t: pa.Table) -> pa.Table:
            return t.append_column("__bkt", pa.array(bucket_ids(t, keys, n_buckets)))

        def finish(g: pa.Table) -> pa.Table:
            spec = []
            renames = {}
            for out, (_, how) in aggs.items():
                m = merge_fn_for(how)
                spec.append((out, m))
                renames[f"{out}_{m}"] = out
            merged = group_by_nullsafe(g.drop_columns(["__bkt"]), keys, spec)
            merged = merged.rename_columns(
                [renames.get(c, c) for c in merged.column_names]
            )
            return merged.select([*keys, *aggs.keys()])

        return (
            partial.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("__bkt")
            .map_groups(finish, batch_format="pyarrow")
        )
    if merge == "driver":
        import ray.data

        batches = list(partial.iter_batches(batch_size=None, batch_format="pyarrow"))
        # keep one zero-row batch when everything is empty: the final
        # group_by over it yields an EMPTY table with the full output
        # schema (rule 8 — an empty Dataset otherwise drops its columns
        # and downstream sorts/compares break).  Ray's iter_batches can
        # drop empty blocks ENTIRELY, so callers whose result can be
        # fully empty pass ``empty_schema`` explicitly.
        tables = [b for b in batches if b.num_rows] or batches[:1]
        if not tables:
            if empty_schema is not None:
                return ray.data.from_arrow(empty_schema.empty_table())
            return partial  # no batches at all; schema unknown
        whole = pa.concat_tables(tables, promote_options="permissive")
        spec = []
        renames = {}
        for out, (_, how) in aggs.items():
            m = merge_fn_for(how)
            spec.append((out, m))
            renames[f"{out}_{m}"] = out
        g = group_by_nullsafe(whole, keys, spec)
        g = g.rename_columns([renames.get(c, c) for c in g.column_names])
        return ray.data.from_arrow(g.select([*keys, *aggs.keys()]))

    ray_aggs = []
    for out, (_, how) in aggs.items():
        m = merge_fn_for(how)
        cls = {"sum": Sum, "min": Min, "max": Max}[m]
        ray_aggs.append(cls(out, alias_name=out))
    return partial.groupby(keys).aggregate(*ray_aggs)
