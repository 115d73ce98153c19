"""Large-large joins: explicit bucketed hash join and time-range join.

When neither side fits in memory, broadcast is off the table
(ray_guide "Joins and lookups"): both sides are hash-partitioned on
the key into B buckets and matching buckets merge pairwise.  B is the
unit of parallelism AND the map_groups call count — pick B ≈ a few x
cluster cores, NOT the key cardinality (the per-group-Python trap
measured in pages dedup).  Hot keys within a bucket can be salted
upstream (stages/salt.py).

The per-bucket merge is Arrow-native end-to-end: numpy
argsort/searchsorted builds gather indices and ``pa.Table.take``
materializes the output — no pandas, so string/list columns never pay
per-row Python-object materialization (CLAUDE.md rule 10) and
unmatched left-join right columns are typed Arrow nulls from the right
side's real schema (no object-dtype schema drift between matched and
unmatched buckets).

Ray >= 2.47 also ships a native ``Dataset.join`` (hash shuffle); the
relational queries exercise both paths so either can be swapped in.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import splitmix64


def _bucket_of(key: np.ndarray, n_buckets: int) -> np.ndarray:
    return (splitmix64(key.astype(np.uint64)) % np.uint64(n_buckets)).astype(np.int64)


def _int64(col) -> np.ndarray:
    return col.to_numpy(zero_copy_only=False).astype(np.int64)


def _expand_matches(
    lk: np.ndarray, rk_sorted: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All (left row, sorted-right row) index pairs with equal keys.

    Returns (left_idx, right_sorted_idx, counts) where counts[i] is
    the number of matches for left row i.  Pure vectorized expansion:
    searchsorted bounds + the cumsum-offset trick.
    """
    lo = np.searchsorted(rk_sorted, lk, side="left")
    hi = np.searchsorted(rk_sorted, lk, side="right")
    cnt = hi - lo
    total = int(cnt.sum())
    li = np.repeat(np.arange(len(lk), dtype=np.int64), cnt)
    starts = np.repeat(lo, cnt)
    offs = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(cnt) - cnt, cnt)
    return li, starts + offs, cnt


def hash_join(
    left,
    right,
    on: str,
    n_buckets: int = 64,
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
    how: str = "inner",
    hot_keys=None,
    n_salts: int = 8,
):
    """Equi-join of two Datasets on an int64 key column.

    Both sides tagged with bucket = hash(key) % B, unioned, and merged
    pairwise per bucket with a vectorized searchsorted gather (Arrow
    take — zero pandas).  Column name collisions (other than ``on``)
    must be resolved by the caller via left_cols/right_cols projections.

    ``how``: "inner" (default), "left" (unmatched left rows kept with
    typed-null right columns so matched and unmatched blocks agree on
    schema), "full" (additionally keeps unmatched RIGHT rows with
    typed-null left columns; ``on`` is coalesced from whichever side
    has it), "semi" (left rows with a match, left columns only), or
    "anti" (left rows without a match, left columns only).

    ``hot_keys``: optional list/array of skewed key values.  A zipf-hot
    key otherwise lands its entire left payload in ONE bucket task;
    with salting, left rows of a hot key spread over ``n_salts``
    sub-buckets (salt from a row-content hash) and the hot key's RIGHT
    rows replicate once per salt — the classic replicated-fragment
    skew join.  The per-bucket merge is key-based and each left row
    lives in exactly one bucket, so every (l, r) pair is still emitted
    exactly once; correctness holds for inner/left/semi/anti.  "full"
    rejects hot_keys (replicated right rows would duplicate in the
    right-only remainder).  Hot-key detection is the caller's job (a
    sampled heavy-hitter pass or domain knowledge).
    """
    if how not in ("inner", "left", "full", "semi", "anti"):
        raise ValueError(f"unsupported join how={how!r}")
    hot_sorted = None
    if hot_keys is not None:
        hot_sorted = np.sort(np.asarray(hot_keys, dtype=np.int64))
        if len(hot_sorted) and how == "full":
            raise ValueError("hot_keys salting is not supported for how='full'")

    def _is_hot(k: np.ndarray) -> np.ndarray:
        pos = np.clip(np.searchsorted(hot_sorted, k), 0, len(hot_sorted) - 1)
        return hot_sorted[pos] == k

    def _salted_bucket(k: np.ndarray, salt: np.ndarray) -> np.ndarray:
        mixed = splitmix64(k.astype(np.uint64)) ^ (salt.astype(np.uint64) + np.uint64(1))
        return (splitmix64(mixed) % np.uint64(n_buckets)).astype(np.int64)

    def tag(side: int, cols):
        def fn(t: pa.Table) -> pa.Table:
            if cols:
                t = t.select(cols)
            k = _int64(t[on])
            b = _bucket_of(k, n_buckets)
            if hot_sorted is not None and len(hot_sorted) and t.num_rows:
                hot = _is_hot(k)
                if side == 0:
                    # spread hot left rows over n_salts sub-buckets
                    salt = (
                        splitmix64(np.arange(t.num_rows, dtype=np.uint64))
                        % np.uint64(n_salts)
                    ).astype(np.int64)
                    b = np.where(hot, _salted_bucket(k, salt), b)
                else:
                    # replicate hot right rows once per salt
                    cold = t.filter(pa.array(~hot))
                    ct = cold.append_column(
                        "__bucket", pa.array(b[~hot])
                    ).append_column(
                        "__side",
                        pa.array(np.full(cold.num_rows, side, dtype=np.int8)),
                    )
                    if not hot.any():
                        return ct
                    hrows = t.filter(pa.array(hot))
                    hk = k[hot]
                    reps = []
                    for s in range(n_salts):
                        sb = _salted_bucket(
                            hk, np.full(len(hk), s, dtype=np.int64)
                        )
                        reps.append(
                            hrows.append_column(
                                "__bucket", pa.array(sb)
                            ).append_column(
                                "__side",
                                pa.array(
                                    np.full(hrows.num_rows, side, dtype=np.int8)
                                ),
                            )
                        )
                    return pa.concat_tables([ct, *reps])
            t = t.append_column("__bucket", pa.array(b))
            return t.append_column(
                "__side", pa.array(np.full(t.num_rows, side, dtype=np.int8))
            )

        fn.__name__ = f"tag_side{side}"
        return fn

    lt = left.map_batches(tag(0, left_cols), batch_format="pyarrow")
    rt = right.map_batches(tag(1, right_cols), batch_format="pyarrow")
    unioned = lt.union(rt)

    lschema = left.schema()
    rschema = right.schema()
    l_pa: pa.Schema = getattr(lschema, "base_schema", lschema)
    r_pa: pa.Schema = getattr(rschema, "base_schema", rschema)
    lnames = [c for c in (left_cols or l_pa.names) if c != on]
    rnames = [c for c in (right_cols or r_pa.names) if c != on]
    out_rnames = rnames if how in ("inner", "left", "full") else []

    def _empty_out() -> pa.Table:
        cols: dict[str, pa.Array] = {on: pa.array([], type=l_pa.field(on).type)}
        for c in lnames:
            cols[c] = pa.array([], type=l_pa.field(c).type)
        for c in out_rnames:
            cols[c] = pa.array([], type=r_pa.field(c).type)
        return pa.table(cols)

    def _right_only(rt_tbl: pa.Table) -> pa.Table:
        """Right rows with typed-null left columns (full-join remainder)."""
        cols = {on: rt_tbl[on]}
        for c in lnames:
            cols[c] = pa.nulls(rt_tbl.num_rows, type=l_pa.field(c).type)
        for c in rnames:
            cols[c] = rt_tbl[c]
        return pa.table(cols)

    def merge(g: pa.Table) -> pa.Table:
        present = set(g.column_names)
        # a fully-empty side contributes no blocks to the union, so its
        # columns never materialize in the group table
        if any(c not in present for c in (on, *lnames)):
            if how == "full" and all(c in present for c in rnames):
                side0 = g["__side"].to_numpy(zero_copy_only=False)
                return _right_only(g.filter(pa.array(side0 == 1)))
            return _empty_out()
        side = g["__side"].to_numpy(zero_copy_only=False)
        lmask = side == 0
        lt_ = g.filter(pa.array(lmask)).select([on, *lnames])
        lk = _int64(lt_[on])
        r_present = all(c in present for c in rnames)
        if r_present and (~lmask).any():
            rt_full = g.filter(pa.array(~lmask))
            rk = _int64(rt_full[on])
        else:
            rt_full = None
            rk = np.array([], dtype=np.int64)

        if how in ("semi", "anti"):
            hit = np.isin(lk, rk)
            return lt_.filter(pa.array(hit if how == "semi" else ~hit))

        if len(rk) == 0:
            if how == "inner":
                return _empty_out()
            # left/full join, no right rows in bucket: typed nulls
            cols = {on: lt_[on]}
            for c in lnames:
                cols[c] = lt_[c]
            for c in rnames:
                cols[c] = pa.nulls(lt_.num_rows, type=r_pa.field(c).type)
            return pa.table(cols)

        order = np.argsort(rk, kind="stable")
        rk_s = rk[order]
        li, ri_s, cnt = _expand_matches(lk, rk_s)
        rt_vals = rt_full.select(rnames)

        if how == "inner":
            out_l = lt_.take(pa.array(li))
            out_r = rt_vals.take(pa.array(order[ri_s]))
            cols = {on: out_l[on]}
            for c in lnames:
                cols[c] = out_l[c]
            for c in rnames:
                cols[c] = out_r[c]
            return pa.table(cols)

        # how in ("left", "full"): unmatched left rows emit one row of
        # typed nulls
        cnt2 = np.where(cnt == 0, 1, cnt)
        total = int(cnt2.sum())
        li2 = np.repeat(np.arange(len(lk), dtype=np.int64), cnt2)
        starts = np.repeat(np.searchsorted(rk_s, lk, side="left"), cnt2)
        offs = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(cnt2) - cnt2, cnt2
        )
        matched = np.repeat(cnt > 0, cnt2)
        ri_raw = np.where(matched, starts + offs, 0)
        ridx = pa.array(order[ri_raw], mask=~matched)  # null index -> null row
        out_l = lt_.take(pa.array(li2))
        out_r = rt_vals.take(ridx)
        cols = {on: out_l[on]}
        for c in lnames:
            cols[c] = out_l[c]
        for c in rnames:
            cols[c] = out_r[c]
        out = pa.table(cols)
        if how != "full":
            return out
        # full join: append right rows no left key matched
        r_unmatched = ~np.isin(rk, lk)
        if not r_unmatched.any():
            return out
        rest = _right_only(rt_full.select([on, *rnames]).filter(pa.array(r_unmatched)))
        return pa.concat_tables([out, rest])

    return unioned.groupby("__bucket").map_groups(merge, batch_format="pyarrow")


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
    no dedup needed.  The per-bucket merge is a numpy lexsort +
    searchsorted gather on ``key`` (no pandas); for key-skewed data add
    a key-hash component to the bucket column (same pattern as
    hash_join) to split giant time buckets.
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

    def merge(g: pa.Table) -> pa.Table:
        side = g["__side"].to_numpy(zero_copy_only=False)
        rmask = side == 1
        k = _int64(g["key"])
        ts = _int64(g["ts"])
        rid = _int64(g["rid"])
        rkey, rts, rrid = k[rmask], ts[rmask], rid[rmask]
        lkey, lts, lrid = k[~rmask], ts[~rmask], rid[~rmask]
        if not len(rkey) or not len(lkey):
            return pa.table(
                {
                    "l_rid": pa.array([], type=pa.int64()),
                    "r_rid": pa.array([], type=pa.int64()),
                }
            )
        order = np.argsort(rkey, kind="stable")
        li, ri_s, _ = _expand_matches(lkey, rkey[order])
        ri = order[ri_s]
        ok = np.abs(lts[li] - rts[ri]) <= width
        return pa.table(
            {"l_rid": pa.array(lrid[li][ok]), "r_rid": pa.array(rrid[ri][ok])}
        )

    return unioned.groupby("__tb").map_groups(merge, batch_format="pyarrow")
