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
