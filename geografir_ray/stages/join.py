"""Large-large joins: explicit bucketed hash join and time-range join.

When neither side fits in memory, broadcast is off the table
(ray_guide "Joins and lookups"): both sides are hash-partitioned on
the key into B buckets and matching buckets merge pairwise.  B is the
unit of parallelism AND the map_groups call count — pick B ≈ a few x
cluster cores, NOT the key cardinality (the per-group-Python trap
measured in pages dedup).  Hot keys within a bucket can be salted
upstream (stages/salt.py).

Ray >= 2.47 also ships a native ``Dataset.join`` (hash shuffle); the
relational queries exercise both paths so either can be swapped in.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import splitmix64


def _bucket_of(key: np.ndarray, n_buckets: int) -> np.ndarray:
    return (splitmix64(key.astype(np.uint64)) % np.uint64(n_buckets)).astype(np.int64)


def hash_join(
    left,
    right,
    on: str,
    n_buckets: int = 64,
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
    how: str = "inner",
):
    """Equi-join of two Datasets on an int64 key column.

    Both sides tagged with bucket = hash(key) % B, unioned, and merged
    pairwise per bucket with a vectorized pandas merge.  Column name
    collisions (other than ``on``) must be resolved by the caller via
    left_cols/right_cols projections.

    ``how``: "inner" (default), "left" (unmatched left rows kept with
    nullable-Int64 right columns so matched and unmatched blocks agree
    on schema), "semi" (left rows with a match, left columns only), or
    "anti" (left rows without a match, left columns only).
    """
    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(f"unsupported join how={how!r}")

    def tag(side: int, cols):
        def fn(t: pa.Table) -> pa.Table:
            if cols:
                t = t.select(cols)
            k = t[on].to_numpy(zero_copy_only=False).astype(np.int64)
            t = t.append_column("__bucket", pa.array(_bucket_of(k, n_buckets)))
            return t.append_column(
                "__side", pa.array(np.full(t.num_rows, side, dtype=np.int8))
            )

        fn.__name__ = f"tag_side{side}"
        return fn

    lt = left.map_batches(tag(0, left_cols), batch_format="pyarrow")
    rt = right.map_batches(tag(1, right_cols), batch_format="pyarrow")
    unioned = lt.union(rt)

    import pyarrow.types as pt

    lschema = left.schema()
    rschema = right.schema()
    lnames = [c for c in (left_cols or lschema.names) if c != on]
    rnames = [c for c in (right_cols or rschema.names) if c != on]
    # the union null-promotes each side's missing columns, and pandas
    # renders int-with-nulls as float — restore integer dtypes after
    # the (null-free) per-side selection
    int_cols = [on]
    for name, schema in [(c, lschema) for c in lnames] + [(c, rschema) for c in rnames]:
        t = schema.base_schema.field(name).type if hasattr(schema, "base_schema") else None
        if t is not None and pt.is_integer(t):
            int_cols.append(name)

    r_int = [c for c in int_cols if c in rnames]

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        missing_l = [c for c in lnames if c not in g.columns]
        missing_r = [c for c in rnames if c not in g.columns]
        if missing_l or missing_r:
            # a fully-empty side contributes no blocks to the union, so
            # its columns never materialize in the group frame
            if missing_l or how in ("inner", "semi"):
                out_cols = {on: pd.Series([], dtype=np.int64)}
                for c in (*lnames, *(rnames if how not in ("semi", "anti") else ())):
                    out_cols[c] = pd.Series([], dtype=object)
                return pd.DataFrame(out_cols)
            # right side empty, left present
            lmask0 = g["__side"].values == 0
            l0 = g.loc[lmask0, [on, *lnames]]
            for c in int_cols:
                if c in l0.columns:
                    l0 = l0.astype({c: np.int64})
            if how == "anti":
                return l0
            for c in rnames:  # how == "left": all-null right columns
                l0[c] = pd.array([None] * len(l0), dtype="Int64" if c in r_int else object)
            return l0
        lmask = g["__side"].values == 0
        l = g.loc[lmask, [on, *lnames]]
        r = g.loc[~lmask, [on, *rnames]]
        for c in int_cols:
            if c in l.columns:
                l = l.astype({c: np.int64})
            if c in r.columns:
                r = r.astype({c: np.int64})
        if how == "semi":
            return l[np.isin(l[on].values, r[on].values)]
        if how == "anti":
            return l[~np.isin(l[on].values, r[on].values)]
        if how == "left":
            out = l.merge(r, on=on, how="left")
            # matched-vs-missed blocks must agree on dtype: nullable
            # Int64 for right int columns (arrow int64-with-nulls)
            for c in r_int:
                out[c] = out[c].astype("Int64")
            return out
        return l.merge(r, on=on, how="inner")

    return unioned.groupby("__bucket").map_groups(merge, batch_format="pandas")


def range_join(
    left,
    right,
    key: str,
    left_ts: str,
    right_ts: str,
    tolerance_us: int,
    n_time_buckets_pad: int = 1,
):
    """Inner join on ``key`` where |left_ts - right_ts| <= tolerance.

    Co-partition by time bucket (width = tolerance): right rows land in
    their own bucket; left rows probe buckets b-1..b+1, so every
    qualifying pair meets exactly once (in the right row's bucket) —
    no dedup needed.  The per-bucket merge joins on ``key``; for
    key-skewed data add a key-hash component to the bucket column
    (same pattern as hash_join) to split giant time buckets.
    """

    width = int(tolerance_us)

    def tag_right(t: pa.Table) -> pa.Table:
        ts = t[right_ts].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        return pa.table(
            {
                "__tb": pa.array(ts // width),
                "__side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
                "key": t[key],
                "ts": pa.array(ts),
                "rid": t["rid"],
            }
        )

    def tag_left(t: pa.Table) -> pa.Table:
        ts = t[left_ts].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        tb = ts // width
        n = t.num_rows
        offs = np.arange(-n_time_buckets_pad, n_time_buckets_pad + 1, dtype=np.int64)
        m = len(offs)
        return pa.table(
            {
                "__tb": pa.array((tb[:, None] + offs[None, :]).ravel()),
                "__side": pa.array(np.zeros(n * m, dtype=np.int8)),
                "key": pa.array(np.repeat(t[key].to_numpy(zero_copy_only=False), m)),
                "ts": pa.array(np.repeat(ts, m)),
                "rid": pa.array(np.repeat(t["rid"].to_numpy(zero_copy_only=False), m)),
            }
        )

    lt = left.map_batches(tag_left, batch_format="pyarrow")
    rt = right.map_batches(tag_right, batch_format="pyarrow")
    unioned = lt.union(rt)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        # right rows owned by this time bucket x probing left rows
        rmask = g["__side"].values == 1
        r = g.loc[rmask, ["key", "ts", "rid"]].rename(
            columns={"ts": "r_ts", "rid": "r_rid"}
        )
        l = g.loc[~rmask, ["key", "ts", "rid"]].rename(
            columns={"ts": "l_ts", "rid": "l_rid"}
        )
        if not len(r) or not len(l):
            return pd.DataFrame(
                {"l_rid": pd.Series([], dtype=np.int64), "r_rid": pd.Series([], dtype=np.int64)}
            )
        m = l.merge(r, on="key", how="inner")
        ok = (m["l_ts"] - m["r_ts"]).abs() <= width
        out = m.loc[ok, ["l_rid", "r_rid"]]
        return out.astype({"l_rid": np.int64, "r_rid": np.int64})

    return unioned.groupby("__tb").map_groups(merge, batch_format="pandas")
