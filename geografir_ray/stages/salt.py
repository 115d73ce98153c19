"""Explicit skew handling: salted two-phase aggregation.

For zipf-hot keys (dense urban cells, BASELINE.json:6) where even the
per-batch combiner leaves one reducer holding a giant group, shuffle
ONCE on a salted key (key, row_hash % n_salts), aggregate partials,
then shuffle the tiny partial set on the bare key (SURVEY.md §4 /
§7.3).  Group sizes after phase 1 are capped at ~|group| / n_salts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import splitmix64


def add_salt(key_col: str, n_salts: int, out_col: str = "__salt") -> "callable":
    """Stage: deterministic salt column from a row-content hash."""

    def fn(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # mix with row index within batch for rows sharing the key
        idx = np.arange(len(k), dtype=np.uint64)
        salt = (splitmix64(k.astype(np.uint64) ^ splitmix64(idx)) % np.uint64(n_salts)).astype(
            np.int64
        )
        return batch.append_column(out_col, pa.array(salt))

    fn.__name__ = f"add_salt[{key_col}%{n_salts}]"
    return fn


def salted_grouped_sum(
    ds,
    key: str,
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    combine_per_batch: bool = True,
):
    """Two-shuffle salted aggregation: groupby((key, salt)) partials →
    groupby(key) final.  ``aggs`` as in pipelines.common.grouped_sum
    (sum/count/min/max only — all mergeable).

    ``combine_per_batch=True`` (default, the engine recommendation)
    additionally pre-aggregates inside each batch, so for these
    mergeable aggs the hot key collapses to one row per (batch, salt)
    BEFORE the exchange.  ``False`` exchanges the raw rows — the mode
    that isolates what salting alone buys (the hot key's rows spread
    over n_salts reducers instead of landing on one), which is the
    regime salting exists for: holistic / non-combinable per-key work
    where a per-batch combiner cannot shrink the payload.

    MEASURED (bench, 50M rows, 80%-hot key, 32 CPUs): for mergeable
    aggs salting does NOT beat the naive single groupby on Ray Data —
    raw-row mode 89 s and default mode 75 s vs naive 44 s — because the
    sort-based reducer is a vectorized kernel (a 40M-row sum is
    milliseconds) and the cost is exchange volume plus the extra
    exchange; the per-batch combiner alone (pipelines.common.
    grouped_sum) wins at 14 s.  Use THIS function only when a
    downstream per-(key, salt) stage does holistic work; for exact
    per-key distinct counting use ``salted_distinct_count`` (measured
    3.1x over the naive per-group plan on the same skew).
    """
    from ray.data.aggregate import Max, Min, Sum

    from ..pipelines.common import merge_fn_for, partial_groupby

    salted = ds.map_batches(add_salt(key, n_salts), batch_format="pyarrow")
    if combine_per_batch:
        phase1 = salted.map_batches(
            partial_groupby([key, "__salt"], aggs), batch_format="pyarrow"
        )
    else:
        # raw rows ride the exchange; rename value columns to the output
        # names so the same Ray aggs apply (sum of raw == sum of partials;
        # count must pre-combine to stay mergeable, so it is rejected here)
        for _out, (_col, how) in aggs.items():
            if merge_fn_for(how) != how:
                raise ValueError(
                    f"combine_per_batch=False requires self-mergeable aggs; {how!r} is not"
                )

        def rename(batch: pa.Table) -> pa.Table:
            cols = {key: batch[key], "__salt": batch["__salt"]}
            for out, (col, _how) in aggs.items():
                cols[out] = batch[col]
            return pa.table(cols)

        phase1 = salted.map_batches(rename, batch_format="pyarrow")

    ray_aggs1 = []
    for out, (_, how) in aggs.items():
        cls = {"sum": Sum, "min": Min, "max": Max}[merge_fn_for(how)]
        ray_aggs1.append(cls(out, alias_name=out))
    partials = phase1.groupby([key, "__salt"]).aggregate(*ray_aggs1)

    ray_aggs2 = []
    for out, (_, how) in aggs.items():
        cls = {"sum": Sum, "min": Min, "max": Max}[merge_fn_for(how)]
        ray_aggs2.append(cls(out, alias_name=out))
    return partials.groupby(key).aggregate(*ray_aggs2)


def _dedup_pairs(k: np.ndarray, v: np.ndarray):
    """Sorted unique (k, v) pairs of two int64 arrays (vectorized)."""
    order = np.lexsort((v, k))
    ko, vo = k[order], v[order]
    first = np.ones(len(ko), dtype=bool)
    first[1:] = (ko[1:] != ko[:-1]) | (vo[1:] != vo[:-1])
    return ko[first], vo[first]


def salted_distinct_count(
    ds,
    key: str,
    val: str,
    n_buckets: int = 256,
    out: str = "n_distinct",
    merge: str = "shuffle",
):
    """Exact per-key COUNT(DISTINCT val) under key skew — the holistic
    regime where skew handling genuinely pays on Ray Data.

    The naive plan (``groupby(key)`` → per-group unique) funnels every
    row of a hot key into ONE task: an 80%-hot key at 50M rows means a
    single 40M-row np.unique on one core while 31 sit idle.  Measured
    note on the mergeable-agg case: for sums the naive reducer is a
    vectorized kernel, so raw-row salting does NOT win there (the
    per-batch combiner does, see ``salted_grouped_sum``); distinct
    count is the op class where the exchange genuinely must be re-keyed.

    Here the exchange key is a hash of the (key, val) PAIR — the
    generalized salt: all copies of a pair co-locate by construction,
    the hot key's rows spread over all ``n_buckets`` reducers, and an
    in-bucket vectorized dedup + per-key segment count yields partials
    whose per-key SUM is the exact distinct count (each distinct pair
    counted in exactly one bucket).  Per batch, rows first collapse to
    unique (key, val) pairs so repeated pairs never ride the exchange
    — the combiner idea applied to a non-mergeable agg via re-keying.

    One full exchange; the merge moves only O(keys × buckets) partial
    rows (``merge="driver"`` when the distinct key count is provably
    bounded, per pipelines.common.grouped_sum).  Integer key/val
    columns (pre-hash strings via functions.hashing.hash_strings).
    """

    def tag(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t[val].to_numpy(zero_copy_only=False).astype(np.int64)
        ku, vu = _dedup_pairs(k, v)
        b = (
            splitmix64(splitmix64(vu.astype(np.uint64)) ^ ku.astype(np.uint64))
            % np.uint64(n_buckets)
        ).astype(np.int64)
        return pa.table({key: pa.array(ku), val: pa.array(vu), "__bkt": pa.array(b)})

    def count_bucket(g: pa.Table) -> pa.Table:
        k = g[key].to_numpy(zero_copy_only=False).astype(np.int64)
        v = g[val].to_numpy(zero_copy_only=False).astype(np.int64)
        ku, _vu = _dedup_pairs(k, v)  # global dedup: the bucket owns its pairs
        firstk = np.ones(len(ku), dtype=bool)
        firstk[1:] = ku[1:] != ku[:-1]
        idx = np.flatnonzero(firstk)
        counts = np.diff(np.append(idx, len(ku)))
        return pa.table(
            {key: pa.array(ku[idx]), out: pa.array(counts.astype(np.int64))}
        )

    from ..pipelines.common import grouped_sum

    partials = (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bkt")
        .map_groups(count_bucket, batch_format="pyarrow")
    )
    return grouped_sum(partials, [key], {out: (out, "sum")}, merge=merge)
