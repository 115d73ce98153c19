"""Event-stream pipelines: tumbling windows, sessionization, as-of join.

Ray Data is a batch engine; stream-shaped semantics are expressed as
groupbys over (key, time-bucket) and per-key ordered map_groups
(ray_guide: "Streaming-shaped workloads").  Ordering assumption: within
a (user_id) group, rows are sorted by (ts, event_id) inside the group
fn — never relying on global input order.

The events table is (event_id, ts, user_id, event_type, value, props).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.tables import read_table
from .common import grouped_sum

SESSION_GAP_MIN = 30


# ---------------------------------------------------------------------------
# Tumbling hourly window: count + exact value sum per (hour, event_type)
# ---------------------------------------------------------------------------


def events_hourly(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["ts", "event_type", "value"])

    def bucket(t: pa.Table) -> pa.Table:
        # epoch-hour bucket; identical to SQL date_trunc('hour', ts)
        ts = t["ts"].to_numpy(zero_copy_only=False)
        hour = ts.astype("datetime64[h]").astype("datetime64[us]")
        return pa.table(
            {
                "hour": pa.array(hour),
                "event_type": t["event_type"],
                "value_c": pc.cast(
                    pc.floor(pc.multiply(t["value"], pa.scalar(100.0))), pa.int64()
                ),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    ds = ds.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
    agg = grouped_sum(
        ds,
        ["hour", "event_type"],
        {"n_events": ("one", "sum"), "sum_value_c": ("value_c", "sum")},
        merge="driver",  # bounded keys: hours x 5 event types
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "hour": t["hour"],
                "event_type": t["event_type"],
                "n_events": t["n_events"],
                "sum_value": pc.divide(pc.cast(t["sum_value_c"], pa.float64()), 100.0),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort(["hour", "event_type"])


EVENTS_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n_events,
       sum(CAST(floor(value * 100.0) AS BIGINT)) / 100.0 AS sum_value
FROM events
GROUP BY hour, event_type
ORDER BY hour, event_type
"""


# ---------------------------------------------------------------------------
# Sessionization: per-user session count with a 30-minute inactivity gap
# (groupby(user) → per-group sort + diff; the partition key is user_id)
# ---------------------------------------------------------------------------


def events_sessions(sf_dir: str):
    """Delegates to the sort-based engine (:func:`events_sessions_sorted`).

    The original per-user ``groupby.map_groups`` form paid one Python
    call per user_id — the per-group trap on an unbounded key
    (CLAUDE.md rule 1); it was retired in r4 so no caller can pick it
    at scale.  Same oracle, same output."""
    return events_sessions_sorted(sf_dir)


EVENTS_SESSIONS_SQL = f"""
WITH o AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
)
SELECT user_id,
       count(*) FILTER (WHERE prev_ts IS NULL
                        OR ts - prev_ts > INTERVAL {SESSION_GAP_MIN} MINUTE) AS n_sessions,
       count(*) AS n_events
FROM o
GROUP BY user_id
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# As-of join: each purchase matched to the user's most recent signup at
# or before the purchase ts (tie-break: max signup event_id).
# Partition key: user_id; per-group sorted searchsorted (merge_asof
# semantics with an explicit deterministic tie rule).
# ---------------------------------------------------------------------------


def events_asof_signup(sf_dir: str):
    """Delegates to the sort-merge engine
    (:func:`events_asof_signup_sorted`).

    The original per-user ``groupby.map_groups`` form paid one Python
    call per user_id — the per-group trap on an unbounded key
    (CLAUDE.md rule 1); it was retired in r4 so no caller can pick it
    at scale.  Same oracle, same output."""
    return events_asof_signup_sorted(sf_dir)


EVENTS_ASOF_SQL = """
SELECT event_id, signup_event_id FROM (
  SELECT p.event_id,
         (SELECT s.event_id FROM events s
          WHERE s.event_type = 'signup' AND s.user_id = p.user_id AND s.ts <= p.ts
          ORDER BY s.ts DESC, s.event_id DESC LIMIT 1) AS signup_event_id
  FROM events p
  WHERE p.event_type = 'purchase'
)
WHERE signup_event_id IS NOT NULL
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# Sort-merge as-of (the high-cardinality path): instead of one Python
# call per user (groupby.map_groups — the per-group trap), sort the
# filtered stream globally by (user_id, ts, is_purchase, event_id) —
# signups sort BEFORE purchases at equal ts, so the at-or-before rule
# is a pure carry-forward — then one vectorized scan per block.
#
# Boundary repair mirrors events_sessions_sorted: within a sorted
# block, only purchases of the block's FIRST user can need a signup
# from an earlier block (interior users' runs are fully local — a
# pending interior purchase is truly unmatched).  Any earlier-block
# signup of the same user is at-or-before by sort order, so a pending
# purchase's answer is just "the last signup of that user in earlier
# blocks": an O(blocks) driver carry-walk over per-block edge records
# builds a (block-key -> signup_event_id) map that broadcasts into a
# final vectorized resolution stage.  Nothing driver-side scales with
# rows or users — only with block count.
# ---------------------------------------------------------------------------


def events_asof_signup_sorted(sf_dir: str):
    import ray

    from ..stages.broadcast import with_broadcast

    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])

    def keep(t: pa.Table) -> pa.Table:
        m = pc.or_(
            pc.equal(t["event_type"], "purchase"), pc.equal(t["event_type"], "signup")
        )
        t = t.filter(m)
        return pa.table(
            {
                "event_id": t["event_id"],
                "ts": t["ts"],
                "user_id": t["user_id"],
                "is_purchase": pc.cast(
                    pc.equal(t["event_type"], "purchase"), pa.int8()
                ),
            }
        )

    sorted_ds = ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True).sort(
        ["user_id", "ts", "is_purchase", "event_id"]
    )

    # kind 0 = matched pair, 1 = pending head-user purchase (carries its
    # block key), 2 = block edge record
    _SCHEMA = pa.schema(
        [
            ("kind", pa.int8()),
            ("event_id", pa.int64()),
            ("signup_event_id", pa.int64()),
            ("buid", pa.int64()),  # block key: first row's (uid, ts, eid)
            ("bts", pa.int64()),
            ("beid", pa.int64()),
            ("last_uid", pa.int64()),
            ("tail_sig_eid", pa.int64()),  # last signup of the block's last user
        ]
    )

    def per_block(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return _SCHEMA.empty_table()
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        isp = t["is_purchase"].to_numpy(zero_copy_only=False).astype(bool)
        # carry-forward: index of the last signup at or before each row
        idx = np.where(~isp, np.arange(n, dtype=np.int64), -1)
        last_sig = np.maximum.accumulate(idx)
        has = (last_sig >= 0) & (uid[np.clip(last_sig, 0, n - 1)] == uid)
        matched = isp & has
        neg = np.full
        m = int(matched.sum())
        parts = [
            pa.table(
                {
                    "kind": pa.array(np.zeros(m, dtype=np.int8)),
                    "event_id": pa.array(eid[matched]),
                    "signup_event_id": pa.array(eid[last_sig[matched]]),
                    "buid": pa.array(neg(m, -1, np.int64)),
                    "bts": pa.array(neg(m, -1, np.int64)),
                    "beid": pa.array(neg(m, -1, np.int64)),
                    "last_uid": pa.array(neg(m, -1, np.int64)),
                    "tail_sig_eid": pa.array(neg(m, -1, np.int64)),
                },
                schema=_SCHEMA,
            )
        ]
        # pending: head-user purchases with no in-block signup before them
        pending = isp & ~has & (uid == uid[0])
        p = int(pending.sum())
        if p:
            parts.append(
                pa.table(
                    {
                        "kind": pa.array(np.ones(p, dtype=np.int8)),
                        "event_id": pa.array(eid[pending]),
                        "signup_event_id": pa.array(neg(p, -1, np.int64)),
                        "buid": pa.array(neg(p, uid[0], np.int64)),
                        "bts": pa.array(neg(p, ts[0], np.int64)),
                        "beid": pa.array(neg(p, eid[0], np.int64)),
                        "last_uid": pa.array(neg(p, -1, np.int64)),
                        "tail_sig_eid": pa.array(neg(p, -1, np.int64)),
                    },
                    schema=_SCHEMA,
                )
            )
        # edge record: block key + the last user's last in-block signup
        tail_user_rows = uid == uid[-1]
        tail_sigs = np.flatnonzero(tail_user_rows & ~isp)
        tail_sig_eid = int(eid[tail_sigs[-1]]) if len(tail_sigs) else -1
        parts.append(
            pa.table(
                {
                    "kind": pa.array(np.array([2], dtype=np.int8)),
                    "event_id": pa.array([-1], type=pa.int64()),
                    "signup_event_id": pa.array([-1], type=pa.int64()),
                    "buid": pa.array([int(uid[0])], type=pa.int64()),
                    "bts": pa.array([int(ts[0])], type=pa.int64()),
                    "beid": pa.array([int(eid[0])], type=pa.int64()),
                    "last_uid": pa.array([int(uid[-1])], type=pa.int64()),
                    "tail_sig_eid": pa.array([tail_sig_eid], type=pa.int64()),
                },
                schema=_SCHEMA,
            )
        )
        return pa.concat_tables(parts)

    tagged = sorted_ds.map_batches(
        per_block, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).materialize()

    # driver carry-walk over O(blocks) edge records: what is the last
    # signup of each block's head user in EARLIER blocks?
    edges = tagged.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], 2)), batch_format="pyarrow"
    ).take_all()
    edges.sort(key=lambda e: (e["buid"], e["bts"], e["beid"]))
    resolve: dict[tuple, int] = {}
    carry_user, carry_sig = -1, -1
    for e in edges:
        key = (e["buid"], e["bts"], e["beid"])
        resolve[key] = carry_sig if e["buid"] == carry_user else -1
        if e["tail_sig_eid"] >= 0:
            carry_user, carry_sig = e["last_uid"], e["tail_sig_eid"]
        elif e["last_uid"] == carry_user:
            pass  # user continues with no new signup: carry persists
        else:
            carry_user, carry_sig = e["last_uid"], -1
    rk = np.array(
        [k[0] ^ (k[1] << 1) ^ (k[2] << 2) for k in resolve], dtype=np.int64
    )
    rv = np.array([resolve[k] for k in resolve], dtype=np.int64)
    order = np.argsort(rk, kind="stable")
    ref = ray.put((rk[order], rv[order]))

    def finish(state, t: pa.Table) -> pa.Table:
        rk, rv = state
        k = t["kind"].to_numpy(zero_copy_only=False)
        out = t.filter(pa.array(k == 0)).select(["event_id", "signup_event_id"])
        pend = t.filter(pa.array(k == 1))
        if pend.num_rows and len(rk):
            key = (
                pend["buid"].to_numpy(zero_copy_only=False)
                ^ (pend["bts"].to_numpy(zero_copy_only=False) << 1)
                ^ (pend["beid"].to_numpy(zero_copy_only=False) << 2)
            )
            pos = np.clip(np.searchsorted(rk, key), 0, len(rk) - 1)
            sig = np.where(rk[pos] == key, rv[pos], -1)
            ok = sig >= 0
            if ok.any():
                out = pa.concat_tables(
                    [
                        out,
                        pa.table(
                            {
                                "event_id": pend["event_id"].filter(pa.array(ok)),
                                "signup_event_id": pa.array(sig[ok]),
                            }
                        ),
                    ]
                )
        return out

    return tagged.map_batches(
        with_broadcast(ref, finish, "asof_boundary_fix"), batch_format="pyarrow"
    ).sort("event_id")


# ---------------------------------------------------------------------------
# Top users by total purchase value (sort + limit)
# ---------------------------------------------------------------------------


def events_top_users(sf_dir: str, k: int = 20):
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "purchase"))
        return pa.table(
            {
                "user_id": t["user_id"],
                "value_c": pc.cast(
                    pc.floor(pc.multiply(t["value"], pa.scalar(100.0))), pa.int64()
                ),
            }
        )

    ds = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    agg = grouped_sum(ds, ["user_id"], {"total_value_c": ("value_c", "sum")}, merge="driver")  # bounded user set

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "total_value": pc.divide(
                    pc.cast(t["total_value_c"], pa.float64()), 100.0
                ),
            }
        )

    return (
        agg.map_batches(finish, batch_format="pyarrow")
        .sort(["total_value", "user_id"], descending=[True, False])
        .limit(k)
    )


EVENTS_TOP_USERS_SQL = """
SELECT user_id,
       sum(CAST(floor(value * 100.0) AS BIGINT)) / 100.0 AS total_value
FROM events
WHERE event_type = 'purchase'
GROUP BY user_id
ORDER BY total_value DESC, user_id
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Range join: purchase events within ±10 minutes of an error event by
# the same user (time-bucket co-partition, stages/join.py)
# ---------------------------------------------------------------------------

RANGE_TOL_MIN = 10


def events_range_join(sf_dir: str):
    from ..stages.join import range_join

    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])

    def side(kind):
        def fn(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t["event_type"], kind))
            return pa.table(
                {"key": t["user_id"], "ts": t["ts"], "rid": t["event_id"]}
            )

        fn.__name__ = f"side_{kind}"
        return fn

    purchases = ds.map_batches(side("purchase"), batch_format="pyarrow")
    errors = ds.map_batches(side("error"), batch_format="pyarrow")
    out = range_join(
        purchases, errors, key="key", left_ts="ts", right_ts="ts",
        tolerance_us=RANGE_TOL_MIN * 60 * 1_000_000,
    )

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["purchase_id", "error_id"])

    return out.map_batches(rename, batch_format="pyarrow").sort(
        ["purchase_id", "error_id"]
    )


EVENTS_RANGE_JOIN_SQL = f"""
SELECT p.event_id AS purchase_id, e.event_id AS error_id
FROM events p JOIN events e
  ON p.user_id = e.user_id
 AND p.event_type = 'purchase' AND e.event_type = 'error'
 AND abs(date_diff('microsecond', e.ts, p.ts)) <= {RANGE_TOL_MIN * 60 * 1_000_000}
ORDER BY purchase_id, error_id
"""


# ---------------------------------------------------------------------------
# Sort-based sessionization (the high-cardinality path)
#
# groupby(user).map_groups costs one Python call per user (the
# per-group trap measured in pages dedup); this variant instead sorts
# globally by (user_id, ts, event_id), computes session starts with a
# single vectorized diff per batch, and merges the per-user partials
# IN THE SHUFFLE (grouped_sum) — the driver only ever sees the
# per-block edge records (one explicit row per block, O(blocks)),
# which produce a tiny correction map broadcast back into a final
# vectorized subtraction stage.  Edge records are dedicated rows with
# their own kind tag (not row-0 positional encoding), so they survive
# any block splitting/coalescing between stages.
# ---------------------------------------------------------------------------


def events_sessions_sorted(sf_dir: str):
    import ray
    import ray.data

    from ..stages.broadcast import with_broadcast
    from .common import grouped_sum

    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id"]).sort(
        ["user_id", "ts", "event_id"]
    )

    gap_us = SESSION_GAP_MIN * 60 * 1_000_000

    _SCHEMA = pa.schema(
        [
            ("kind", pa.int8()),  # 0 = per-user partial, 1 = block edge record
            ("user_id", pa.int64()),
            ("n_sessions", pa.int64()),
            ("n_events", pa.int64()),
            ("first_uid", pa.int64()),
            ("first_ts", pa.int64()),
            ("first_eid", pa.int64()),
            ("last_uid", pa.int64()),
            ("last_ts", pa.int64()),
        ]
    )

    def per_batch(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        n = len(uid)
        if n == 0:
            return _SCHEMA.empty_table()
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        gap = np.empty(n, dtype=bool)
        gap[0] = True
        gap[1:] = (ts[1:] - ts[:-1]) > gap_us
        start = new_user | gap
        # per-user partials within the batch
        tb = pa.table(
            {
                "user_id": pa.array(uid),
                "s": pa.array(start.astype(np.int64)),
                "one": pa.array(np.ones(n, dtype=np.int64)),
            }
        )
        g = tb.group_by("user_id").aggregate([("s", "sum"), ("one", "sum")])
        m = g.num_rows
        neg1 = pa.array(np.full(m, -1, dtype=np.int64))
        partials = pa.table(
            {
                "kind": pa.array(np.zeros(m, dtype=np.int8)),
                "user_id": g["user_id"],
                "n_sessions": g["s_sum"],
                "n_events": g["one_sum"],
                "first_uid": neg1,
                "first_ts": neg1,
                "first_eid": neg1,
                "last_uid": neg1,
                "last_ts": neg1,
            },
            schema=_SCHEMA,
        )
        edge = pa.table(
            {
                "kind": pa.array(np.array([1], dtype=np.int8)),
                "user_id": pa.array([-1], type=pa.int64()),
                "n_sessions": pa.array([0], type=pa.int64()),
                "n_events": pa.array([0], type=pa.int64()),
                "first_uid": pa.array([int(uid[0])], type=pa.int64()),
                "first_ts": pa.array([int(ts[0])], type=pa.int64()),
                "first_eid": pa.array([int(t["event_id"][0].as_py())], type=pa.int64()),
                "last_uid": pa.array([int(uid[-1])], type=pa.int64()),
                "last_ts": pa.array([int(ts[-1])], type=pa.int64()),
            },
            schema=_SCHEMA,
        )
        return pa.concat_tables([partials, edge])

    tagged = ds.map_batches(
        per_batch, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).materialize()  # O(users x blocks + blocks) rows, never the input size

    def only(kind: int, cols):
        def f(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["kind"], kind)).select(cols)

        return f

    base = grouped_sum(
        tagged.map_batches(
            only(0, ["user_id", "n_sessions", "n_events"]), batch_format="pyarrow"
        ),
        ["user_id"],
        {"n_sessions": ("n_sessions", "sum"), "n_events": ("n_events", "sum")},
    )

    # Edge records: one per input block — tiny, bounded by block count.
    # Re-ordered by (first_uid, first_ts, first_eid) so boundary pairing
    # does NOT depend on block arrival order; batch i+1's first row was
    # counted as a session start, cancel it when batch i ends with the
    # same user within the gap.
    edges = tagged.map_batches(
        only(1, ["first_uid", "first_ts", "first_eid", "last_uid", "last_ts"]),
        batch_format="pyarrow",
    ).take_all()
    edges.sort(key=lambda e: (e["first_uid"], e["first_ts"], e["first_eid"]))
    corrections: dict[int, int] = {}
    for i in range(1, len(edges)):
        fu, ft = edges[i]["first_uid"], edges[i]["first_ts"]
        lu, lt = edges[i - 1]["last_uid"], edges[i - 1]["last_ts"]
        if fu == lu and (ft - lt) <= gap_us:
            corrections[fu] = corrections.get(fu, 0) + 1

    if corrections:
        ckeys = np.array(sorted(corrections), dtype=np.int64)
        cvals = np.array([corrections[k] for k in sorted(corrections)], dtype=np.int64)
        ref = ray.put((ckeys, cvals))

        def apply_corr(state, t: pa.Table) -> pa.Table:
            ckeys, cvals = state
            u = t["user_id"].to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(ckeys, u), 0, len(ckeys) - 1)
            sub = np.where(ckeys[pos] == u, cvals[pos], 0)
            return pa.table(
                {
                    "user_id": t["user_id"],
                    "n_sessions": pa.array(
                        t["n_sessions"].to_numpy(zero_copy_only=False) - sub
                    ),
                    "n_events": t["n_events"],
                }
            )

        base = base.map_batches(
            with_broadcast(ref, apply_corr, "session_boundary_fix"),
            batch_format="pyarrow",
        )
    return base.sort("user_id")


# ---------------------------------------------------------------------------
# Sliding windows: 2-hour windows advancing hourly — each event explodes
# into size/step windows, then the usual two-phase aggregation
# ---------------------------------------------------------------------------


def events_sliding(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["ts", "event_type", "value"])

    def explode(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False)
        hour = ts.astype("datetime64[h]")
        win0 = hour.astype("datetime64[us]")
        win1 = (hour - np.timedelta64(1, "h")).astype("datetime64[us]")
        v_c = pc.cast(
            pc.floor(pc.multiply(t["value"], pa.scalar(100.0))), pa.int64()
        ).to_numpy(zero_copy_only=False)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        n = len(ts)
        return pa.table(
            {
                "window_start": pa.array(np.concatenate([win0, win1])),
                "event_type": pa.array(np.concatenate([et, et])),
                "value_c": pa.array(np.concatenate([v_c, v_c])),
                "one": pa.array(np.ones(2 * n, dtype=np.int64)),
            }
        )

    ds = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    agg = grouped_sum(
        ds,
        ["window_start", "event_type"],
        {"n_events": ("one", "sum"), "sum_value_c": ("value_c", "sum")},
        merge="driver",  # bounded: hours x event types
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_start": t["window_start"],
                "event_type": t["event_type"],
                "n_events": t["n_events"],
                "sum_value": pc.divide(pc.cast(t["sum_value_c"], pa.float64()), 100.0),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort(
        ["window_start", "event_type"]
    )


EVENTS_SLIDING_SQL = """
SELECT window_start, event_type,
       count(*) AS n_events,
       sum(CAST(floor(value * 100.0) AS BIGINT)) / 100.0 AS sum_value
FROM (
  SELECT unnest([date_trunc('hour', ts),
                 date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS window_start,
         event_type, value
  FROM events
)
GROUP BY window_start, event_type
ORDER BY window_start, event_type
"""


# ---------------------------------------------------------------------------
# Running (cumulative) per-user total — the UNBOUNDED PRECEDING window
# aggregate.  Scale design: hash-partition users into B buckets so each
# user's rows land WHOLLY in one bucket (no cross-block boundary repair
# needed, unlike the global-sort sessionization above), then ONE
# vectorized lexsort + segmented cumsum per bucket — B Python calls
# total, never one per user, and the only exchange is the groupby.
# ---------------------------------------------------------------------------


def events_running_total(sf_dir: str, n_buckets: int = 64):
    from ..functions.hashing import splitmix64

    ds = read_table(
        sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type", "value"]
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "purchase"))
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(
                    (splitmix64(uid.astype(np.uint64)) % np.uint64(n_buckets)).astype(
                        np.int64
                    )
                ),
                "event_id": t["event_id"],
                "ts_us": pa.array(
                    t["ts"]
                    .to_numpy(zero_copy_only=False)
                    .astype("datetime64[us]")
                    .astype(np.int64)
                ),
                "user_id": pa.array(uid),
                "value_c": pc.cast(
                    pc.floor(pc.multiply(t["value"], pa.scalar(100.0))), pa.int64()
                ),
            }
        )

    _OUT = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("running_value", pa.float64()),
        ]
    )

    def bucket_running(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return _OUT.empty_table()
        uid = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = g["ts_us"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        vc = g["value_c"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, ts, uid))  # = PARTITION BY user ORDER BY ts, id
        uid, eid, vc = uid[order], eid[order], vc[order]
        cum = np.cumsum(vc)
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        # prefix-exclusive cumsum at each segment start, broadcast down
        # via segment-start INDICES (monotonic regardless of value sign)
        seg_first = np.maximum.accumulate(np.where(new_user, np.arange(n), 0))
        run_c = cum - (cum - vc)[seg_first]
        return pa.table(
            {
                "event_id": pa.array(eid),
                "user_id": pa.array(uid),
                "running_value": pa.array(run_c.astype(np.float64) / 100.0),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(bucket_running, batch_format="pyarrow")
        .sort("event_id")
    )


EVENTS_RUNNING_TOTAL_SQL = """
SELECT event_id, user_id,
       CAST(SUM(CAST(floor(value * 100.0) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 100.0
       AS running_value
FROM events
WHERE event_type = 'purchase'
ORDER BY event_id
"""


def events_streaming_windows(sf_dir: str):
    """Driver surface for the actor-held-state streaming path
    (stages/streaming.py): events replayed in ts order through
    WindowShard actors — tumbling 60-min event-time windows with a
    5-min watermark.  On an ordered replay nothing is late, so the
    emitted windows equal the batch groupby exactly and the query gets
    a full SQL oracle (the late-data machinery is exercised separately
    in tests/test_runner_salt_mm.py)."""
    from ..stages.streaming import streaming_window_counts

    out, _late = streaming_window_counts(sf_dir, window_min=60, lateness_min=5)
    return out


EVENTS_STREAMING_WINDOWS_SQL = """
SELECT user_id, date_trunc('hour', ts) AS window_start,
       count(*) AS n_events,
       sum(CAST(floor(value * 100.0) AS BIGINT)) / 100.0 AS sum_value
FROM events
GROUP BY user_id, date_trunc('hour', ts)
ORDER BY user_id, window_start
"""


# ---------------------------------------------------------------------------
# Lead/lag window operator (per-user prev/next event + gap), the
# scale-safe shape: ONE hash-partition exchange on a bounded bucket
# count, vectorized lexsort + segment shifts inside each bucket (all of
# a user's rows co-locate by construction; NO per-user Python calls —
# CLAUDE.md rule 1).  NULL lead/lag encodes as -1 (COALESCE in the SQL
# twin) so the oracle schema stays integer-exact.
# ---------------------------------------------------------------------------


def events_lead_lag(sf_dir: str, n_buckets: int = 32):
    from ..functions.hashing import splitmix64

    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id"])

    def tag(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (splitmix64(uid) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("__bkt", pa.array(b))

    def window(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (
            g["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        )
        order = np.lexsort((eid, ts, uid))
        uo, eo, to = uid[order], eid[order], ts[order]
        n = len(uo)
        same_prev = np.zeros(n, dtype=bool)
        same_prev[1:] = uo[1:] == uo[:-1]
        same_next = np.zeros(n, dtype=bool)
        same_next[:-1] = same_prev[1:]
        prev_eid = np.full(n, -1, dtype=np.int64)
        prev_eid[1:][same_prev[1:]] = eo[:-1][same_prev[1:]]
        next_eid = np.full(n, -1, dtype=np.int64)
        next_eid[:-1][same_next[:-1]] = eo[1:][same_next[:-1]]
        gap = np.full(n, -1, dtype=np.int64)
        gap[1:][same_prev[1:]] = (to[1:] - to[:-1])[same_prev[1:]]
        return pa.table(
            {
                "event_id": pa.array(eo),
                "user_id": pa.array(uo),
                "prev_event_id": pa.array(prev_eid),
                "next_event_id": pa.array(next_eid),
                "gap_prev_us": pa.array(gap),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bkt")
        .map_groups(window, batch_format="pyarrow")
        .sort("event_id")
    )


EVENTS_LEAD_LAG_SQL = """
SELECT event_id, user_id,
       COALESCE(LAG(event_id)  OVER w, -1) AS prev_event_id,
       COALESCE(LEAD(event_id) OVER w, -1) AS next_event_id,
       COALESCE(CAST(epoch_us(ts) - epoch_us(LAG(ts) OVER w) AS BIGINT), -1)
         AS gap_prev_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# Rank-family windows (row_number / rank / dense_rank / ntile) and a
# conditional-aggregation pivot — per-user, fully vectorized segment
# logic over hash buckets (no per-group Python, CLAUDE.md rule 1).
# ---------------------------------------------------------------------------


def events_rank(sf_dir: str, n_buckets: int = 32, ntiles: int = 4):
    """row_number / rank / dense_rank / ntile per user.  Order within a
    user is (event_type, ts, event_id) — event_type has 5 distinct
    values, so rank vs dense_rank diverge on real ties while the full
    key keeps row_number deterministic.  Users hash into buckets; the
    ranks are computed with lexsort + run-boundary numpy logic over the
    whole bucket at once."""
    from ..functions.hashing import splitmix64

    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])

    def tag(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (splitmix64(uid) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("__bkt", pa.array(b))

    _OUT_SCHEMA = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("rown", pa.int64()),
            ("rnk", pa.int64()),
            ("drnk", pa.int64()),
            ("nt", pa.int64()),
        ]
    )

    def window(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:  # explicit dtypes for empty outputs (rule 8)
            return _OUT_SCHEMA.empty_table()
        uid = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (
            g["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        )
        # dictionary-encode event_type; np.unique sorts lexicographically
        # so the integer codes order exactly like the strings
        et_codes = pc.dictionary_encode(
            g["event_type"].combine_chunks()
            if isinstance(g["event_type"], pa.ChunkedArray)
            else g["event_type"]
        )
        dict_vals = np.asarray(et_codes.dictionary.to_pylist())
        lex = np.argsort(dict_vals, kind="stable")
        remap = np.empty(len(dict_vals), dtype=np.int64)
        remap[lex] = np.arange(len(dict_vals), dtype=np.int64)
        et = remap[et_codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)]

        order = np.lexsort((eid, ts, et, uid))
        uo, eo, to, eto = uid[order], eid[order], ts[order], et[order]
        n = len(uo)
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = uo[1:] != uo[:-1]
        seg_start = np.where(new_user)[0]
        seg_id = np.cumsum(new_user) - 1
        start_of = seg_start[seg_id]
        rown = np.arange(n, dtype=np.int64) - start_of + 1

        new_val = np.ones(n, dtype=bool)
        new_val[1:] = (eto[1:] != eto[:-1]) | new_user[1:]
        run_start = np.where(new_val)[0]
        run_of = np.cumsum(new_val) - 1
        rnk = run_start[run_of] - start_of + 1
        # dense rank: count of runs since the segment start
        runs_before_seg = (np.cumsum(new_val) - 1)[start_of]
        drnk = (np.cumsum(new_val) - 1) - runs_before_seg + 1

        # NTILE over the same per-user order: first (cnt % ntiles)
        # buckets get base+1 rows (SQL semantics)
        seg_len = np.diff(np.append(seg_start, n))
        cnt = seg_len[seg_id]
        base = cnt // ntiles
        rem = cnt % ntiles
        idx0 = rown - 1
        big = rem * (base + 1)
        in_big = idx0 < big
        nt = np.where(
            in_big,
            idx0 // np.maximum(base + 1, 1) + 1,
            rem + np.where(base > 0, (idx0 - big) // np.maximum(base, 1), 0) + 1,
        ).astype(np.int64)

        return pa.table(
            {
                "event_id": pa.array(eo),
                "user_id": pa.array(uo),
                "rown": pa.array(rown),
                "rnk": pa.array(rnk),
                "drnk": pa.array(drnk),
                "nt": pa.array(nt),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bkt")
        .map_groups(window, batch_format="pyarrow")
        .sort("event_id")
    )


EVENTS_RANK_SQL = """
SELECT event_id, user_id,
       ROW_NUMBER() OVER (PARTITION BY user_id
                          ORDER BY event_type, ts, event_id) AS rown,
       RANK()       OVER (PARTITION BY user_id ORDER BY event_type) AS rnk,
       DENSE_RANK() OVER (PARTITION BY user_id ORDER BY event_type) AS drnk,
       NTILE(4)     OVER (PARTITION BY user_id
                          ORDER BY event_type, ts, event_id) AS nt
FROM events
ORDER BY event_id
"""


def events_user_median(sf_dir: str, n_buckets: int = 32):
    """EXACT per-user median event value — the canonical holistic
    aggregate (no mergeable partial exists, unlike sum/count): users
    hash into buckets, each bucket holds its users WHOLE, and the
    median is one lexsort + segment-select over the bucket (no
    per-group Python, CLAUDE.md rule 1).  Values ride the integer-cents
    encoding (rule 5) and the result is ``median2_cents`` = the SUM of
    the two central values (odd n: the middle twice — ``m1 == m2`` so
    ``v[m1] + v[m2]`` needs no branch), keeping the oracle comparison
    in exact BIGINT space with no float division on either side.

    At 10^12 rows this is ONE exchange on hash(user) — the same shape
    as events_rank — and each bucket's work is O(rows log rows)
    vectorized; skewed users cost their own rows only, never a Python
    call per group."""
    from ..functions.hashing import splitmix64
    from .common import floor_scale

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "value"])

    def tag(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (splitmix64(uid) % np.uint64(n_buckets)).astype(np.int64)
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_id": t["event_id"],
                "v": floor_scale(t["value"]),
                "__bkt": pa.array(b),
            }
        )

    _OUT = pa.schema(
        [
            ("user_id", pa.int64()),
            ("n_events", pa.int64()),
            ("median2_cents", pa.int64()),
        ]
    )

    def median_win(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:  # explicit dtypes for empty outputs (rule 8)
            return _OUT.empty_table()
        uid = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = g["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, v, uid))
        uo, vo = uid[order], v[order]
        n = len(uo)
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = uo[1:] != uo[:-1]
        seg_start = np.flatnonzero(new_user)
        seg_len = np.diff(np.append(seg_start, n))
        m1 = seg_start + (seg_len + 1) // 2 - 1
        m2 = seg_start + (seg_len + 2) // 2 - 1
        return pa.table(
            {
                "user_id": pa.array(uo[seg_start]),
                "n_events": pa.array(seg_len.astype(np.int64)),
                "median2_cents": pa.array(vo[m1] + vo[m2]),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bkt")
        .map_groups(median_win, batch_format="pyarrow")
        .sort("user_id")
    )


EVENTS_USER_MEDIAN_SQL = """
WITH c AS (
  SELECT user_id, event_id,
         CAST(floor(value * 100.0) AS BIGINT) AS v
  FROM events
),
r AS (
  SELECT user_id, v,
         row_number() OVER (PARTITION BY user_id ORDER BY v, event_id) AS rn,
         count(*)     OVER (PARTITION BY user_id) AS n
  FROM c
)
SELECT user_id,
       CAST(max(n) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN rn = (n + 1) // 2 OR rn = (n + 2) // 2
                     THEN v ELSE 0 END)
            * CASE WHEN max(n) % 2 = 1 THEN 2 ELSE 1 END
            AS BIGINT) AS median2_cents
FROM r
GROUP BY user_id
ORDER BY user_id
"""


def events_pivot(sf_dir: str):
    """Pivot / conditional aggregation: one row per user with per-type
    event counts and the exact purchase-revenue sum (integer-cents).
    Indicators are built vectorized per batch, then a combiner-first
    grouped_sum with a SHUFFLE merge — user_id is unbounded at corpus
    scale, so no driver merge."""
    from .common import floor_scale

    ds = read_table(sf_dir, "events", columns=["user_id", "event_type", "value"])

    def indicators(t: pa.Table) -> pa.Table:
        cols = {"user_id": t["user_id"]}
        for et in ("click", "view", "purchase", "signup", "error"):
            cols[f"n_{et}"] = pc.cast(pc.equal(t["event_type"], et), pa.int64())
        cents = floor_scale(t["value"])
        is_p = pc.cast(pc.equal(t["event_type"], "purchase"), pa.int64())
        cols["purchase_c"] = pc.multiply(cents, is_p)
        return pa.table(cols)

    ds = ds.map_batches(indicators, batch_format="pyarrow", zero_copy_batch=True)
    agg = grouped_sum(
        ds,
        ["user_id"],
        {
            "n_click": ("n_click", "sum"),
            "n_view": ("n_view", "sum"),
            "n_purchase": ("n_purchase", "sum"),
            "n_signup": ("n_signup", "sum"),
            "n_error": ("n_error", "sum"),
            "purchase_c": ("purchase_c", "sum"),
        },
    )

    def finish(t: pa.Table) -> pa.Table:
        cols = {c: t[c] for c in t.column_names if c != "purchase_c"}
        cols["purchase_revenue"] = pc.divide(
            pc.cast(t["purchase_c"], pa.float64()), 100.0
        )
        return pa.table(cols)

    return agg.map_batches(finish, batch_format="pyarrow").sort("user_id")


EVENTS_PIVOT_SQL = """
SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(sum(CASE WHEN event_type = 'purchase'
                     THEN CAST(floor(value * 100.0) AS BIGINT) ELSE 0 END) AS BIGINT
           ) / 100.0 AS purchase_revenue
FROM events
GROUP BY user_id
ORDER BY user_id
"""


def events_funnel(sf_dir: str):
    """Funnel analysis (signup → click → purchase): for every user who
    signed up, count clicks at-or-after their first signup and
    purchases at-or-after their first qualifying click.  Three
    combiner-first grouped aggregations chained by bucketed hash joins
    — user_id is unbounded, so every merge is a shuffle and the funnel
    state never touches the driver."""
    from ..stages.join import hash_join

    ds = read_table(sf_dir, "events", columns=["ts", "user_id", "event_type"])

    def prep(et: str):
        def fn(t: pa.Table) -> pa.Table:
            mask = pc.equal(t["event_type"], et)
            t = t.filter(mask)
            ts_us = pc.cast(t["ts"], pa.int64())
            return pa.table(
                {
                    "user_id": t["user_id"],
                    "ts_us": ts_us,
                    "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                }
            )

        fn.__name__ = f"prep[{et}]"
        return fn

    signup = ds.map_batches(prep("signup"), batch_format="pyarrow", zero_copy_batch=True)
    s = grouped_sum(signup, ["user_id"], {"signup_us": ("ts_us", "min")})

    clicks = ds.map_batches(prep("click"), batch_format="pyarrow", zero_copy_batch=True)
    cj = hash_join(
        clicks,
        s,
        on="user_id",
        left_cols=["user_id", "ts_us", "one"],
        right_cols=["user_id", "signup_us"],
    )
    cj = cj.filter(expr="ts_us >= signup_us")
    c = grouped_sum(
        cj,
        ["user_id"],
        {"click_us": ("ts_us", "min"), "n_click_after": ("one", "sum")},
    )

    purch = ds.map_batches(prep("purchase"), batch_format="pyarrow", zero_copy_batch=True)
    pj = hash_join(
        purch,
        c,
        on="user_id",
        left_cols=["user_id", "ts_us", "one"],
        right_cols=["user_id", "click_us"],
    )
    pj = pj.filter(expr="ts_us >= click_us")
    p = grouped_sum(pj, ["user_id"], {"n_purchase_after": ("one", "sum")})

    out = hash_join(
        s,
        c,
        on="user_id",
        left_cols=["user_id", "signup_us"],
        right_cols=["user_id", "n_click_after"],
        how="left",
    )
    out = hash_join(
        out,
        p,
        on="user_id",
        left_cols=["user_id", "signup_us", "n_click_after"],
        right_cols=["user_id", "n_purchase_after"],
        how="left",
    )

    def finish(t: pa.Table) -> pa.Table:
        z = pa.scalar(0, pa.int64())
        return pa.table(
            {
                "user_id": t["user_id"],
                "signup_us": t["signup_us"],
                "n_click_after": pc.fill_null(pc.cast(t["n_click_after"], pa.int64()), z),
                "n_purchase_after": pc.fill_null(
                    pc.cast(t["n_purchase_after"], pa.int64()), z
                ),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow").sort("user_id")


EVENTS_FUNNEL_SQL = """
WITH s AS (
  SELECT user_id, min(epoch_us(ts)) AS signup_us
  FROM events WHERE event_type = 'signup' GROUP BY 1
), c AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS click_us,
         count(*) AS n_click_after
  FROM events e JOIN s ON e.user_id = s.user_id
  WHERE e.event_type = 'click' AND epoch_us(e.ts) >= s.signup_us
  GROUP BY 1
), p AS (
  SELECT e.user_id, count(*) AS n_purchase_after
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= c.click_us
  GROUP BY 1
)
SELECT s.user_id, CAST(s.signup_us AS BIGINT) AS signup_us,
       CAST(COALESCE(c.n_click_after, 0) AS BIGINT) AS n_click_after,
       CAST(COALESCE(p.n_purchase_after, 0) AS BIGINT) AS n_purchase_after
FROM s
LEFT JOIN c ON s.user_id = c.user_id
LEFT JOIN p ON s.user_id = p.user_id
ORDER BY s.user_id
"""


# ---------------------------------------------------------------------------
# Cohort retention — the classic product-analytics matrix: users grouped
# by first-activity day, counted on each subsequent active day offset.
# ---------------------------------------------------------------------------

_US_PER_DAY = 86_400_000_000


def events_retention(sf_dir: str):
    """Retention matrix (cohort_day, day_offset) -> n_users.

    Scale shape: user_id is unbounded, so every per-user step is a
    shuffle over pre-combined partials — (1) distinct (user, day)
    pairs via grouped min (per-batch combiner first), (2) per-user
    cohort day via grouped min over the pairs, (3) one bucketed hash
    join pairs x cohorts on user_id, (4) the final (cohort, offset)
    count is bounded (days x days window) and merges on the driver.
    """
    from ..stages.join import hash_join
    from .common import grouped_sum

    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def derive(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        day = ts.astype(np.int64) // _US_PER_DAY
        return pa.table(
            {
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "day": pa.array(day),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    pairs = grouped_sum(
        ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id", "day"],
        {"one": ("one", "min")},
    )
    firsts = grouped_sum(pairs, ["user_id"], {"cohort": ("day", "min")})
    joined = hash_join(
        pairs,
        firsts,
        on="user_id",
        left_cols=["user_id", "day"],
        right_cols=["user_id", "cohort"],
    )

    def offset(t: pa.Table) -> pa.Table:
        day = t["day"].to_numpy(zero_copy_only=False)
        coh = t["cohort"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "cohort_day": pa.array(coh),
                "day_offset": pa.array(day - coh),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    out = grouped_sum(
        joined.map_batches(offset, batch_format="pyarrow", zero_copy_batch=True),
        ["cohort_day", "day_offset"],
        {"n_users": ("one", "sum")},
        merge="driver",  # bounded: observation-window days squared
    )
    return out.sort(["cohort_day", "day_offset"])


EVENTS_RETENTION_SQL = f"""
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_US_PER_DAY} AS day FROM events
),
f AS (SELECT user_id, MIN(day) AS cohort FROM ud GROUP BY user_id)
SELECT CAST(f.cohort AS BIGINT) AS cohort_day,
       CAST(ud.day - f.cohort AS BIGINT) AS day_offset,
       count(*) AS n_users
FROM ud JOIN f USING (user_id)
GROUP BY 1, 2
ORDER BY cohort_day, day_offset
"""


# ---------------------------------------------------------------------------
# Per-user travel distance (trajectory length) — the GPS-track shape:
# order each user's events by time, sum the leg lengths between
# consecutive positions.  Same sorted-segment engine as
# events_sessions_sorted (one vectorized diff per block + O(blocks)
# edge records), never a per-user map_groups.  Legs are planar
# distances integer-scaled to "meters" (floor(sqrt(dd) * 111000)) so
# the cross-engine sum is order-independent (CLAUDE.md rule 5).
# ---------------------------------------------------------------------------

_TRAVEL_SCALE = 111000.0  # deg -> approx meters; parity encoding, not geodesy


def events_travel_distance(sf_dir: str):
    import ray

    from ..functions import synthgeo
    from ..stages.broadcast import with_broadcast
    from .common import grouped_sum

    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id"]).sort(
        ["user_id", "ts", "event_id"]
    )

    _SCHEMA = pa.schema(
        [
            ("kind", pa.int8()),  # 0 = per-user partial, 1 = block edge record
            ("user_id", pa.int64()),
            ("n_events", pa.int64()),
            ("travel_m", pa.int64()),
            ("first_uid", pa.int64()),
            ("first_ts", pa.int64()),
            ("first_eid", pa.int64()),
            ("first_lat", pa.float64()),
            ("first_lon", pa.float64()),
            ("last_uid", pa.int64()),
            ("last_lat", pa.float64()),
            ("last_lon", pa.float64()),
        ]
    )

    def leg_m(lat1, lon1, lat2, lon2):
        dlat = lat2 - lat1
        dlon = lon2 - lon1
        return np.floor(
            np.sqrt(dlat * dlat + dlon * dlon) * _TRAVEL_SCALE
        ).astype(np.int64)

    def per_batch(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (
            t["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(uid)
        if n == 0:
            return _SCHEMA.empty_table()
        lat = synthgeo.synth_lat(eid)
        lon = synthgeo.synth_lon(eid)
        seg = np.zeros(n, dtype=np.int64)
        if n > 1:
            same = uid[1:] == uid[:-1]
            seg[1:][same] = leg_m(lat[:-1], lon[:-1], lat[1:], lon[1:])[same]
        tb = pa.table(
            {
                "user_id": pa.array(uid),
                "m": pa.array(seg),
                "one": pa.array(np.ones(n, dtype=np.int64)),
            }
        )
        g = tb.group_by("user_id").aggregate([("m", "sum"), ("one", "sum")])
        m = g.num_rows
        neg1 = pa.array(np.full(m, -1, dtype=np.int64))
        negf = pa.array(np.full(m, 0.0, dtype=np.float64))
        partials = pa.table(
            {
                "kind": pa.array(np.zeros(m, dtype=np.int8)),
                "user_id": g["user_id"],
                "n_events": g["one_sum"],
                "travel_m": g["m_sum"],
                "first_uid": neg1,
                "first_ts": neg1,
                "first_eid": neg1,
                "first_lat": negf,
                "first_lon": negf,
                "last_uid": neg1,
                "last_lat": negf,
                "last_lon": negf,
            },
            schema=_SCHEMA,
        )
        edge = pa.table(
            {
                "kind": pa.array(np.array([1], dtype=np.int8)),
                "user_id": pa.array([-1], type=pa.int64()),
                "n_events": pa.array([0], type=pa.int64()),
                "travel_m": pa.array([0], type=pa.int64()),
                "first_uid": pa.array([int(uid[0])], type=pa.int64()),
                "first_ts": pa.array([int(ts[0])], type=pa.int64()),
                "first_eid": pa.array([int(eid[0])], type=pa.int64()),
                "first_lat": pa.array([float(lat[0])], type=pa.float64()),
                "first_lon": pa.array([float(lon[0])], type=pa.float64()),
                "last_uid": pa.array([int(uid[-1])], type=pa.int64()),
                "last_lat": pa.array([float(lat[-1])], type=pa.float64()),
                "last_lon": pa.array([float(lon[-1])], type=pa.float64()),
            },
            schema=_SCHEMA,
        )
        return pa.concat_tables([partials, edge])

    tagged = ds.map_batches(
        per_batch, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).materialize()  # O(users x blocks + blocks) rows, never the input size

    def only(kind: int, cols):
        def f(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["kind"], kind)).select(cols)

        return f

    base = grouped_sum(
        tagged.map_batches(
            only(0, ["user_id", "n_events", "travel_m"]), batch_format="pyarrow"
        ),
        ["user_id"],
        {"n_events": ("n_events", "sum"), "travel_m": ("travel_m", "sum")},
    )

    # Block-boundary legs: one candidate per adjacent block pair,
    # ordered by (first_uid, first_ts, first_eid) so pairing does not
    # depend on block arrival order.
    edges = tagged.map_batches(
        only(1, ["first_uid", "first_ts", "first_eid", "first_lat",
                 "first_lon", "last_uid", "last_lat", "last_lon"]),
        batch_format="pyarrow",
    ).take_all()
    edges.sort(key=lambda e: (e["first_uid"], e["first_ts"], e["first_eid"]))
    corrections: dict[int, int] = {}
    for i in range(1, len(edges)):
        if edges[i]["first_uid"] == edges[i - 1]["last_uid"]:
            m = int(
                leg_m(
                    np.float64(edges[i - 1]["last_lat"]),
                    np.float64(edges[i - 1]["last_lon"]),
                    np.float64(edges[i]["first_lat"]),
                    np.float64(edges[i]["first_lon"]),
                )
            )
            u = int(edges[i]["first_uid"])
            corrections[u] = corrections.get(u, 0) + m

    if corrections:
        ckeys = np.array(sorted(corrections), dtype=np.int64)
        cvals = np.array([corrections[k] for k in sorted(corrections)], dtype=np.int64)
        ref = ray.put((ckeys, cvals))

        def apply_corr(state, t: pa.Table) -> pa.Table:
            ckeys, cvals = state
            u = t["user_id"].to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(ckeys, u), 0, len(ckeys) - 1)
            add = np.where(ckeys[pos] == u, cvals[pos], 0)
            return pa.table(
                {
                    "user_id": t["user_id"],
                    "n_events": t["n_events"],
                    "travel_m": pa.array(
                        t["travel_m"].to_numpy(zero_copy_only=False) + add
                    ),
                }
            )

        base = base.map_batches(
            with_broadcast(ref, apply_corr, "travel_boundary_fix"),
            batch_format="pyarrow",
        )

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["n_events"], 2))
        return pa.table(
            {
                "user_id": t["user_id"],
                "n_legs": pc.subtract(t["n_events"], pa.scalar(1, pa.int64())),
                "travel_m": t["travel_m"],
            }
        )

    return base.map_batches(finish, batch_format="pyarrow").sort("user_id")


def events_travel_distance_sql() -> str:
    from ..functions.synthgeo import synth_lat_sql, synth_lon_sql

    lat = synth_lat_sql("event_id")
    lon = synth_lon_sql("event_id")
    return f"""
WITH pts AS (
  SELECT user_id, ts, event_id, {lat} AS lat, {lon} AS lon FROM events
),
segs AS (
  SELECT user_id,
         lag(lat) OVER w AS plat, lag(lon) OVER w AS plon, lat, lon
  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       count(*) AS n_legs,
       CAST(sum(CAST(floor(sqrt((lat - plat) * (lat - plat)
                               + (lon - plon) * (lon - plon))
                           * {_TRAVEL_SCALE}) AS BIGINT)) AS BIGINT) AS travel_m
FROM segs
WHERE plat IS NOT NULL
GROUP BY user_id
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Stay-point detection (trajectory stop mining, the Li/Zheng GeoLife
# recipe): a "stay" is a maximal run of >= 2 consecutive pings where
# every step moved < STAY_RADIUS_M (same integer leg encoding as
# events_travel_distance) AND arrived within STAY_GAP_HOURS.  Output:
# per-user stay count + qualifying-pair count.
#
# Same sorted-segment engine as events_sessions_sorted, with one
# genuinely new piece: a run START depends on TWO consecutive pair
# predicates (cont[i] & !cont[i-1]), so independent per-boundary
# cancellation is NOT exact when a block holds a single row (the two
# boundary pairs around it are adjacent in the global sequence).  The
# edge walk is therefore a chain state machine carrying the effective
# truth of the pair ending at each block's last row
# (_staypoint_chain) — exact under ANY block split, O(blocks) driver
# state.
# ---------------------------------------------------------------------------

STAY_RADIUS_M = 250_000
STAY_GAP_HOURS = 24
_STAY_GAP_US = STAY_GAP_HOURS * 3600 * 1_000_000


def _stay_leg_m(lat1, lon1, lat2, lon2):
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    return np.floor(np.sqrt(dlat * dlat + dlon * dlon) * _TRAVEL_SCALE).astype(
        np.int64
    )


def _staypoint_chain(edges: list[dict]) -> tuple[dict, dict]:
    """Walk block edge records (global row order) and return per-user
    corrections (d_stays, d_pairs) for the boundary pairs the per-block
    pass could not see.  ``tail_state``: 2 = single-row block, else the
    cont value of the pair ending at the block's last row."""
    d_stays: dict[int, int] = {}
    d_pairs: dict[int, int] = {}
    prev = None
    prev_eff = False  # global cont of the pair ending at prev block's last row
    for e in edges:
        single = e["tail_state"] == 2
        bp = False
        if prev is not None and e["first_uid"] == prev["last_uid"]:
            m = int(
                _stay_leg_m(
                    np.float64(prev["last_lat"]),
                    np.float64(prev["last_lon"]),
                    np.float64(e["first_lat"]),
                    np.float64(e["first_lon"]),
                )
            )
            bp = (e["first_ts"] - prev["last_ts"]) <= _STAY_GAP_US and (
                m < STAY_RADIUS_M
            )
        u = e["first_uid"]
        if bp:
            d_pairs[u] = d_pairs.get(u, 0) + 1
            delta = 0
            if not prev_eff:
                delta += 1  # the boundary pair itself starts a run
            if not single and e["b"]:
                delta -= 1  # block's first pair loses its local start
            if delta:
                d_stays[u] = d_stays.get(u, 0) + delta
        prev_eff = bp if single else bool(e["tail_state"])
        prev = e
    return d_stays, d_pairs


_STAY_SCHEMA = pa.schema(
        [
            ("kind", pa.int8()),  # 0 = per-user partial, 1 = block edge record
            ("user_id", pa.int64()),
            ("n_stays", pa.int64()),
            ("n_stay_pairs", pa.int64()),
            ("first_uid", pa.int64()),
            ("first_ts", pa.int64()),
            ("first_eid", pa.int64()),
            ("first_lat", pa.float64()),
            ("first_lon", pa.float64()),
            ("last_uid", pa.int64()),
            ("last_ts", pa.int64()),
            ("last_lat", pa.float64()),
            ("last_lon", pa.float64()),
            ("b", pa.int8()),           # cont of the block's FIRST pair
            ("tail_state", pa.int8()),  # 2 = single row, else cont of last pair
    ]
)


def _staypoint_per_batch(t: pa.Table) -> pa.Table:
    from ..functions import synthgeo

    _SCHEMA = _STAY_SCHEMA
    uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    ts = (
        t["ts"].to_numpy(zero_copy_only=False)
        .astype("datetime64[us]").astype(np.int64)
    )
    eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(uid)
    if n == 0:
        return _SCHEMA.empty_table()
    lat = synthgeo.synth_lat(eid)
    lon = synthgeo.synth_lon(eid)
    c = np.zeros(n, dtype=bool)
    if n > 1:
        same = uid[1:] == uid[:-1]
        gap_ok = (ts[1:] - ts[:-1]) <= _STAY_GAP_US
        legm = _stay_leg_m(lat[:-1], lon[:-1], lat[1:], lon[1:])
        c[1:] = same & gap_ok & (legm < STAY_RADIUS_M)
    start = c.copy()
    start[1:] &= ~c[:-1]
    tb = pa.table(
        {
            "user_id": pa.array(uid),
            "s": pa.array(start.astype(np.int64)),
            "p": pa.array(c.astype(np.int64)),
        }
    )
    g = tb.group_by("user_id").aggregate([("s", "sum"), ("p", "sum")])
    m = g.num_rows
    neg1 = pa.array(np.full(m, -1, dtype=np.int64))
    negf = pa.array(np.full(m, 0.0, dtype=np.float64))
    zero8 = pa.array(np.zeros(m, dtype=np.int8))
    partials = pa.table(
        {
            "kind": pa.array(np.zeros(m, dtype=np.int8)),
            "user_id": g["user_id"],
            "n_stays": g["s_sum"],
            "n_stay_pairs": g["p_sum"],
            "first_uid": neg1,
            "first_ts": neg1,
            "first_eid": neg1,
            "first_lat": negf,
            "first_lon": negf,
            "last_uid": neg1,
            "last_ts": neg1,
            "last_lat": negf,
            "last_lon": negf,
            "b": zero8,
            "tail_state": zero8,
        },
        schema=_SCHEMA,
    )
    tail_state = 2 if n == 1 else int(c[-1])
    edge = pa.table(
        {
            "kind": pa.array(np.array([1], dtype=np.int8)),
            "user_id": pa.array([-1], type=pa.int64()),
            "n_stays": pa.array([0], type=pa.int64()),
            "n_stay_pairs": pa.array([0], type=pa.int64()),
            "first_uid": pa.array([int(uid[0])], type=pa.int64()),
            "first_ts": pa.array([int(ts[0])], type=pa.int64()),
            "first_eid": pa.array([int(eid[0])], type=pa.int64()),
            "first_lat": pa.array([float(lat[0])], type=pa.float64()),
            "first_lon": pa.array([float(lon[0])], type=pa.float64()),
            "last_uid": pa.array([int(uid[-1])], type=pa.int64()),
            "last_ts": pa.array([int(ts[-1])], type=pa.int64()),
            "last_lat": pa.array([float(lat[-1])], type=pa.float64()),
            "last_lon": pa.array([float(lon[-1])], type=pa.float64()),
            "b": pa.array([int(c[1]) if n > 1 else 0], type=pa.int8()),
            "tail_state": pa.array([tail_state], type=pa.int8()),
        },
        schema=_SCHEMA,
    )
    return pa.concat_tables([partials, edge])


def events_staypoints(sf_dir: str):
    import ray

    from ..stages.broadcast import with_broadcast
    from .common import grouped_sum

    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id"]).sort(
        ["user_id", "ts", "event_id"]
    )

    tagged = ds.map_batches(
        _staypoint_per_batch,
        batch_format="pyarrow",
        batch_size=None,
        zero_copy_batch=True,
    ).materialize()  # O(users x blocks + blocks) rows, never the input size

    def only(kind: int, cols):
        def f(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["kind"], kind)).select(cols)

        return f

    base = grouped_sum(
        tagged.map_batches(
            only(0, ["user_id", "n_stays", "n_stay_pairs"]), batch_format="pyarrow"
        ),
        ["user_id"],
        {"n_stays": ("n_stays", "sum"), "n_stay_pairs": ("n_stay_pairs", "sum")},
    )

    edges = tagged.map_batches(
        only(
            1,
            ["first_uid", "first_ts", "first_eid", "first_lat", "first_lon",
             "last_uid", "last_ts", "last_lat", "last_lon", "b", "tail_state"],
        ),
        batch_format="pyarrow",
    ).take_all()
    edges.sort(key=lambda e: (e["first_uid"], e["first_ts"], e["first_eid"]))
    d_stays, d_pairs = _staypoint_chain(edges)

    if d_stays or d_pairs:
        keys = np.array(sorted(set(d_stays) | set(d_pairs)), dtype=np.int64)
        sv = np.array([d_stays.get(int(k), 0) for k in keys], dtype=np.int64)
        pv = np.array([d_pairs.get(int(k), 0) for k in keys], dtype=np.int64)
        ref = ray.put((keys, sv, pv))

        def apply_corr(state, t: pa.Table) -> pa.Table:
            keys, sv, pv = state
            u = t["user_id"].to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(keys, u), 0, len(keys) - 1)
            hit = keys[pos] == u
            return pa.table(
                {
                    "user_id": t["user_id"],
                    "n_stays": pa.array(
                        t["n_stays"].to_numpy(zero_copy_only=False)
                        + np.where(hit, sv[pos], 0)
                    ),
                    "n_stay_pairs": pa.array(
                        t["n_stay_pairs"].to_numpy(zero_copy_only=False)
                        + np.where(hit, pv[pos], 0)
                    ),
                }
            )

        base = base.map_batches(
            with_broadcast(ref, apply_corr, "staypoint_boundary_fix"),
            batch_format="pyarrow",
        )
    return base.sort("user_id")


def events_staypoints_sql() -> str:
    from ..functions.synthgeo import synth_lat_sql, synth_lon_sql

    lat = synth_lat_sql("event_id")
    lon = synth_lon_sql("event_id")
    return f"""
WITH pts AS (
  SELECT user_id, ts, event_id, {lat} AS lat, {lon} AS lon FROM events
),
seg AS (
  SELECT user_id, ts, event_id, lat, lon,
         lag(lat) OVER w AS plat, lag(lon) OVER w AS plon,
         lag(ts) OVER w AS prev_ts
  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
cont AS (
  SELECT user_id, ts, event_id,
         (plat IS NOT NULL
          AND ts - prev_ts <= INTERVAL {STAY_GAP_HOURS} HOUR
          AND CAST(floor(sqrt((lat - plat) * (lat - plat)
                              + (lon - plon) * (lon - plon))
                         * {_TRAVEL_SCALE}) AS BIGINT) < {STAY_RADIUS_M}) AS c
  FROM seg
),
runs AS (
  SELECT user_id, c,
         lag(c, 1, FALSE) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pc
  FROM cont
)
SELECT user_id,
       CAST(count(*) FILTER (WHERE c AND NOT pc) AS BIGINT) AS n_stays,
       CAST(count(*) FILTER (WHERE c) AS BIGINT) AS n_stay_pairs
FROM runs
GROUP BY user_id
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Zone-visit summary (trajectory x geofence): every ping is tested
# against the 25 diamond zones through the REAL broadcast raycast PIP
# machinery (stages/geo.broadcast_pip_task — same GridZoneIndex as
# geo_pip_join, fused task form, zones ride one ray.put), then a
# per-(user, zone) visit aggregate: ping count, first/last entry time.
# Scale shape: zones are a bounded broadcast side; the only exchange is
# the grouped_sum over (user_id, zone_id) partials.
# ---------------------------------------------------------------------------


def events_zone_visits(sf_dir: str):
    import ray

    from ..stages.geo import add_latlon, broadcast_pip_task, zones_payload
    from .common import grouped_sum
    from .spatial import N_ZONES

    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id"])

    def prep(t: pa.Table) -> pa.Table:
        ts_us = (
            t["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        return pa.table(
            {
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "ts_us": pa.array(ts_us),
            }
        )

    ref = ray.put(zones_payload(np.arange(N_ZONES, dtype=np.int64)))
    hits = (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(add_latlon("event_id"), batch_format="pyarrow")
        .map_batches(
            broadcast_pip_task(ref, "user_id", keep_cols=("ts_us",)),
            batch_format="pyarrow",
        )
    )

    def add_one(t: pa.Table) -> pa.Table:
        return t.append_column(
            "one", pa.array(np.ones(t.num_rows, dtype=np.int64))
        )

    agg = grouped_sum(
        hits.map_batches(add_one, batch_format="pyarrow"),
        ["user_id", "zone_id"],
        {
            "n_pings": ("one", "sum"),
            "first_ts": ("ts_us", "min"),
            "last_ts": ("ts_us", "max"),
        },
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "zone_id": pc.cast(t["zone_id"], pa.int64()),
                "n_pings": pc.cast(t["n_pings"], pa.int64()),
                "first_ts": pc.cast(t["first_ts"], pa.int64()),
                "last_ts": pc.cast(t["last_ts"], pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort(
        ["user_id", "zone_id"]
    )


def events_zone_visits_sql() -> str:
    from .spatial import _pip_condition_sql

    return f"""
WITH z AS (SELECT CAST(n_nationkey AS BIGINT) AS zkey FROM nation)
SELECT user_id, z.zkey AS zone_id,
       CAST(count(*) AS BIGINT) AS n_pings,
       CAST(min(epoch_us(ts)) AS BIGINT) AS first_ts,
       CAST(max(epoch_us(ts)) AS BIGINT) AS last_ts
FROM events, z
WHERE {_pip_condition_sql('event_id')}
GROUP BY user_id, z.zkey
ORDER BY user_id, zone_id
"""


# ---------------------------------------------------------------------------
# Origin-destination matrix (zone-to-zone trajectory flows): each ping
# is assigned its MIN containing zone (deterministic under overlapping
# zones; pings outside every zone are dropped), each user's in-zone
# ping sequence is time-ordered, and every consecutive pair counts one
# (zone_from, zone_to) trip — self-loops included.
#
# Scale shape: the PIP assignment is the fused broadcast min-zone task
# (no shuffle), the transition count is the sorted-segment engine
# (per-block vectorized pair counts + O(blocks) boundary records —
# a transition depends on ONE adjacent pair, so sessions-style
# independent boundary handling is exact), and the final aggregate is
# bounded at N_ZONES^2 = 625 keys -> grouped_sum(merge="driver")
# (CLAUDE.md rule 2).
# ---------------------------------------------------------------------------


def events_od_matrix(sf_dir: str):
    import ray
    import ray.data

    from ..stages.geo import add_latlon, broadcast_min_zone_task, zones_payload
    from .common import grouped_sum
    from .spatial import N_ZONES

    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id"])

    def prep(t: pa.Table) -> pa.Table:
        ts_us = (
            t["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        return pa.table(
            {
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "ts_us": pa.array(ts_us),
            }
        )

    ref = ray.put(zones_payload(np.arange(N_ZONES, dtype=np.int64)))
    hits = (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(add_latlon("event_id"), batch_format="pyarrow")
        .map_batches(
            broadcast_min_zone_task(
                ref, keep_cols=("user_id", "ts_us", "event_id")
            ),
            batch_format="pyarrow",
        )
        .sort(["user_id", "ts_us", "event_id"])
    )

    _SCHEMA = pa.schema(
        [
            ("kind", pa.int8()),  # 0 = transition partial, 1 = block edge
            ("zone_from", pa.int64()),
            ("zone_to", pa.int64()),
            ("n_trips", pa.int64()),
            ("first_uid", pa.int64()),
            ("first_ts", pa.int64()),
            ("first_eid", pa.int64()),
            ("first_z", pa.int64()),
            ("last_uid", pa.int64()),
            ("last_z", pa.int64()),
        ]
    )

    def per_batch(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return _SCHEMA.empty_table()
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        z = t["zone_id"].to_numpy(zero_copy_only=False)
        same = uid[1:] == uid[:-1]
        zf, zt = z[:-1][same], z[1:][same]
        key = zf * np.int64(N_ZONES) + zt
        uk, cnt = np.unique(key, return_counts=True)
        m = len(uk)
        neg1 = pa.array(np.full(m, -1, dtype=np.int64))
        partials = pa.table(
            {
                "kind": pa.array(np.zeros(m, dtype=np.int8)),
                "zone_from": pa.array(uk // N_ZONES),
                "zone_to": pa.array(uk % N_ZONES),
                "n_trips": pa.array(cnt.astype(np.int64)),
                "first_uid": neg1,
                "first_ts": neg1,
                "first_eid": neg1,
                "first_z": neg1,
                "last_uid": neg1,
                "last_z": neg1,
            },
            schema=_SCHEMA,
        )
        edge = pa.table(
            {
                "kind": pa.array(np.array([1], dtype=np.int8)),
                "zone_from": pa.array([-1], type=pa.int64()),
                "zone_to": pa.array([-1], type=pa.int64()),
                "n_trips": pa.array([0], type=pa.int64()),
                "first_uid": pa.array([int(uid[0])], type=pa.int64()),
                "first_ts": pa.array(
                    [int(t["ts_us"][0].as_py())], type=pa.int64()
                ),
                "first_eid": pa.array(
                    [int(t["event_id"][0].as_py())], type=pa.int64()
                ),
                "first_z": pa.array([int(z[0])], type=pa.int64()),
                "last_uid": pa.array([int(uid[-1])], type=pa.int64()),
                "last_z": pa.array([int(z[-1])], type=pa.int64()),
            },
            schema=_SCHEMA,
        )
        return pa.concat_tables([partials, edge])

    tagged = hits.map_batches(
        per_batch, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).materialize()  # O(625 x blocks + blocks) rows

    def only(kind: int, cols):
        def f(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["kind"], kind)).select(cols)

        return f

    partials = tagged.map_batches(
        only(0, ["zone_from", "zone_to", "n_trips"]), batch_format="pyarrow"
    )

    edges = tagged.map_batches(
        only(1, ["first_uid", "first_ts", "first_eid", "first_z",
                 "last_uid", "last_z"]),
        batch_format="pyarrow",
    ).take_all()
    edges.sort(key=lambda e: (e["first_uid"], e["first_ts"], e["first_eid"]))
    bnd: dict[tuple[int, int], int] = {}
    for i in range(1, len(edges)):
        if edges[i]["first_uid"] == edges[i - 1]["last_uid"]:
            k = (int(edges[i - 1]["last_z"]), int(edges[i]["first_z"]))
            bnd[k] = bnd.get(k, 0) + 1
    if bnd:
        ks = sorted(bnd)
        extra = pa.table(
            {
                "zone_from": pa.array([k[0] for k in ks], pa.int64()),
                "zone_to": pa.array([k[1] for k in ks], pa.int64()),
                "n_trips": pa.array([bnd[k] for k in ks], pa.int64()),
            }
        )
        partials = partials.union(ray.data.from_arrow(extra))

    out = grouped_sum(
        partials,
        ["zone_from", "zone_to"],
        {"n_trips": ("n_trips", "sum")},
        merge="driver",
    )
    return out.sort(["zone_from", "zone_to"])


def events_od_matrix_sql() -> str:
    from .spatial import _pip_condition_sql

    return f"""
WITH z AS (SELECT CAST(n_nationkey AS BIGINT) AS zkey FROM nation),
hits AS (
  SELECT user_id, ts, event_id, min(z.zkey) AS zone
  FROM events, z
  WHERE {_pip_condition_sql('event_id')}
  GROUP BY user_id, ts, event_id
),
seq AS (
  SELECT user_id, zone,
         lag(zone) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pzone
  FROM hits
)
SELECT pzone AS zone_from, zone AS zone_to,
       CAST(count(*) AS BIGINT) AS n_trips
FROM seq
WHERE pzone IS NOT NULL
GROUP BY pzone, zone
ORDER BY zone_from, zone_to
"""


# ---------------------------------------------------------------------------
# Gap filling: per-user dense hourly series with zero-filled holes
# (the time-series resample/asfreq surface; SQL twin = generate_series)
# ---------------------------------------------------------------------------

# pack (user_id, epoch_hour) into one int64 join key: epoch-hour needs
# 20 bits through year 2089; user ids get the remaining 43.  Guarded
# below — a violation raises rather than silently corrupting the join.
_GAPFILL_HOUR_BITS = 20


def events_gapfill(sf_dir: str):
    """Per-user hourly event counts with ZERO rows filled in for every
    hour between that user's first and last event — the gap-fill /
    resample operator a telemetry or training-curriculum pipeline needs
    before windowed models (SQL shape: generate_series + left join).

    Scale plan: three bounded exchanges, none keyed on raw rows —
    (1) per-(user, hour) counts via the combiner + one hash exchange,
    (2) per-user [min, max] hour spans off those counts (already one
    row per user-hour), (3) the dense grid is EXPLODED from the spans
    inside map_batches (np.repeat/arange, zero Python loops) and
    left-joins the counts back through the bucketed hash_join on the
    packed (user, hour) key.  Grid size is sum of user spans — the
    output's own size — so no stage materializes more than the result.
    """
    from ..stages.join import hash_join

    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def bucket(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False)
        hr = ts.astype("datetime64[h]").astype(np.int64)
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if hr.size:
            assert int(hr.max()) < (1 << _GAPFILL_HOUR_BITS) and int(hr.min()) >= 0
            assert int(uid.max()) < (1 << (63 - _GAPFILL_HOUR_BITS))
        return pa.table(
            {
                "user_id": pa.array(uid),
                "hr": pa.array(hr),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    counts = grouped_sum(
        ds.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id", "hr"],
        {"n_events": ("one", "sum")},
    )

    def pack(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy().astype(np.int64)
        hr = t["hr"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "gk": pa.array((uid << _GAPFILL_HOUR_BITS) | hr),
                "n_events": t["n_events"],
            }
        )

    packed = counts.map_batches(pack, batch_format="pyarrow", zero_copy_batch=True)

    spans = grouped_sum(
        counts,
        ["user_id"],
        {"mn": ("hr", "min"), "mx": ("hr", "max")},
    )

    def explode(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy().astype(np.int64)
        mn = t["mn"].to_numpy().astype(np.int64)
        mx = t["mx"].to_numpy().astype(np.int64)
        width = mx - mn + 1
        total = int(width.sum())
        users = np.repeat(uid, width)
        starts = np.repeat(mn, width)
        offs = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(width) - width, width
        )
        hr = starts + offs
        return pa.table(
            {
                "user_id": pa.array(users),
                "hr": pa.array(hr),
                "gk": pa.array((users << _GAPFILL_HOUR_BITS) | hr),
            }
        )

    grid = spans.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)

    joined = hash_join(
        grid,
        packed,
        on="gk",
        left_cols=["gk", "user_id", "hr"],
        right_cols=["gk", "n_events"],
        how="left",
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_events"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = np.where(np.isnan(n), 0, n).astype(np.int64)
        hr = t["hr"].to_numpy().astype("datetime64[h]").astype("datetime64[us]")
        return pa.table(
            {
                "user_id": t["user_id"],
                "hour": pa.array(hr),
                "n_events": pa.array(n),
            }
        )

    out = joined.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
    # the join emits one small block per bucket; coalesce before the
    # global sort (CLAUDE.md rule 9: sort cost tracks block COUNT)
    return out.repartition(8).sort(["user_id", "hour"])


EVENTS_GAPFILL_SQL = """
WITH h AS (
  SELECT CAST(user_id AS BIGINT) AS user_id, date_trunc('hour', ts) AS hr,
         count(*) AS n
  FROM events GROUP BY 1, 2
), spans AS (
  SELECT user_id, min(hr) AS mn, max(hr) AS mx FROM h GROUP BY 1
), grid AS (
  SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hr
  FROM spans
)
SELECT g.user_id, g.hr AS hour, COALESCE(h.n, 0) AS n_events
FROM grid g LEFT JOIN h ON g.user_id = h.user_id AND g.hr = h.hr
ORDER BY g.user_id, hour
"""


# ---------------------------------------------------------------------------
# Linear interpolation over the gap-filled hourly series (resample +
# interpolate — the other half of events_gapfill)
# ---------------------------------------------------------------------------


def events_interpolate(sf_dir: str):
    """Per-user dense hourly VALUE series over the events table (see
    :func:`interpolate_hourly_ds` for the engine)."""
    return interpolate_hourly_ds(
        read_table(sf_dir, "events", columns=["user_id", "ts", "value"])
    )


def interpolate_hourly_ds(ds):
    """Per-user dense hourly VALUE series: known hours carry the exact
    hourly cents sum; gap hours are linearly interpolated between the
    neighboring known hours.  The interpolation is the all-non-negative
    integer form ``(v0*(gap-off) + v1*off) // gap`` so floor == trunc
    and the DuckDB twin (IGNORE-NULLS window walk) is bit-equal — the
    naive ``v0 + ((v1-v0)*off)//gap`` diverges on negative slopes
    (numpy floors, DuckDB truncates).

    Scale plan: ONE exchange for the hourly sums — hash(user_id) % B
    bucket tag + per-bucket vectorized lexsort/segment-sum (the
    _shuffle_dedup shape; Ray's sort-based Aggregate over millions of
    (user, hr) partial keys measured 60+ s at 10M rows where this runs
    in ~4 s) — then a single vectorized pass: adjacent in-block known
    pairs explode their gap rows locally (np.repeat/arange); pairs
    SPLIT by a block boundary are repaired from O(blocks) edge records
    on the driver (same machinery as events_travel_distance).  Users
    never span buckets, so a cross-bucket edge pair can't false-match
    (uids are disjoint); within-bucket splits repair exactly as the
    sorted case.  No stage holds more than the output.  ``ds`` needs
    (user_id, ts, value) columns.
    """
    import ray.data

    from ..functions.hashing import splitmix64

    N_BUCKETS = 64

    def hourly(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False)
        hr = ts.astype("datetime64[h]").astype(np.int64)
        uid = pc.cast(t["user_id"], pa.int64()).to_numpy(zero_copy_only=False)
        bkt = (splitmix64(uid.astype(np.uint64)) % np.uint64(N_BUCKETS)).astype(
            np.int64
        )
        return pa.table(
            {
                "user_id": pa.array(uid),
                "hr": pa.array(hr),
                "v": pc.cast(
                    pc.floor(pc.multiply(t["value"], pa.scalar(100.0))), pa.int64()
                ),
                "__bkt": pa.array(bkt),
            }
        )

    _KNOWN_SCHEMA = pa.schema(
        [("user_id", pa.int64()), ("hr", pa.int64()), ("v", pa.int64())]
    )

    def bucket_sum(g: pa.Table) -> pa.Table:
        # all rows of every user in this bucket are co-located: one
        # lexsort + reduceat yields the exact hourly sums, pre-sorted
        # by (user_id, hr) — which is all the explode pass needs
        if g.num_rows == 0:
            return _KNOWN_SCHEMA.empty_table()
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        hr = g["hr"].to_numpy(zero_copy_only=False)
        v = g["v"].to_numpy(zero_copy_only=False)
        order = np.lexsort((hr, uid))
        uo, ho, vo = uid[order], hr[order], v[order]
        first = np.ones(len(uo), dtype=bool)
        first[1:] = (uo[1:] != uo[:-1]) | (ho[1:] != ho[:-1])
        starts = np.flatnonzero(first)
        return pa.table(
            {
                "user_id": pa.array(uo[starts]),
                "hr": pa.array(ho[starts]),
                "v": pa.array(np.add.reduceat(vo, starts)),
            },
            schema=_KNOWN_SCHEMA,
        )

    known = (
        ds.map_batches(hourly, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bkt")
        .map_groups(bucket_sum, batch_format="pyarrow")
    )

    _SCHEMA = pa.schema(
        [
            ("kind", pa.int8()),  # 0 = series row, 1 = block edge record
            ("user_id", pa.int64()),
            ("hr", pa.int64()),
            ("v", pa.int64()),
            ("first_uid", pa.int64()),
            ("first_hr", pa.int64()),
            ("first_v", pa.int64()),
            ("last_uid", pa.int64()),
            ("last_hr", pa.int64()),
            ("last_v", pa.int64()),
        ]
    )

    def _interp(u0, t0, v0, t1, v1):
        """Explode interior hours of each (t0, v0) -> (t1, v1) pair."""
        gap = t1 - t0
        width = np.maximum(gap - 1, 0)
        total = int(width.sum())
        if total == 0:
            e = np.array([], dtype=np.int64)
            return e, e, e
        users = np.repeat(u0, width)
        g = np.repeat(gap, width)
        base = np.repeat(t0, width)
        a = np.repeat(v0, width)
        b = np.repeat(v1, width)
        off = (
            np.arange(total, dtype=np.int64)
            - np.repeat(np.cumsum(width) - width, width)
            + 1
        )
        val = (a * (g - off) + b * off) // g
        return users, base + off, val

    def per_block(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return _SCHEMA.empty_table()
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        hr = t["hr"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        same = uid[1:] == uid[:-1]
        iu, it, iv = _interp(
            uid[:-1][same], hr[:-1][same], v[:-1][same],
            hr[1:][same], v[1:][same],
        )
        z = np.zeros(n + len(iu), dtype=np.int64)
        rows = pa.table(
            {
                "kind": pa.array(np.zeros(n + len(iu), dtype=np.int8)),
                "user_id": pa.array(np.concatenate([uid, iu])),
                "hr": pa.array(np.concatenate([hr, it])),
                "v": pa.array(np.concatenate([v, iv])),
                "first_uid": pa.array(z), "first_hr": pa.array(z),
                "first_v": pa.array(z), "last_uid": pa.array(z),
                "last_hr": pa.array(z), "last_v": pa.array(z),
            },
            schema=_SCHEMA,
        )
        zero = pa.array([0], type=pa.int64())
        edge = pa.table(
            {
                "kind": pa.array(np.array([1], dtype=np.int8)),
                "user_id": pa.array([-1], type=pa.int64()),
                "hr": zero, "v": zero,
                "first_uid": pa.array([int(uid[0])], type=pa.int64()),
                "first_hr": pa.array([int(hr[0])], type=pa.int64()),
                "first_v": pa.array([int(v[0])], type=pa.int64()),
                "last_uid": pa.array([int(uid[-1])], type=pa.int64()),
                "last_hr": pa.array([int(hr[-1])], type=pa.int64()),
                "last_v": pa.array([int(v[-1])], type=pa.int64()),
            },
            schema=_SCHEMA,
        )
        return pa.concat_tables([rows, edge])

    tagged = known.map_batches(
        per_block, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).materialize()

    series = tagged.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], 0)).select(["user_id", "hr", "v"]),
        batch_format="pyarrow",
    )

    # boundary pairs: known points split across adjacent sorted blocks
    edges = tagged.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], 1)).select(
            ["first_uid", "first_hr", "first_v", "last_uid", "last_hr", "last_v"]
        ),
        batch_format="pyarrow",
    ).take_all()
    edges.sort(key=lambda e: (e["first_uid"], e["first_hr"]))
    fix_u, fix_t, fix_v = [], [], []
    for i in range(1, len(edges)):
        if edges[i]["first_uid"] == edges[i - 1]["last_uid"]:
            u0 = np.array([edges[i - 1]["last_uid"]], dtype=np.int64)
            t0 = np.array([edges[i - 1]["last_hr"]], dtype=np.int64)
            v0 = np.array([edges[i - 1]["last_v"]], dtype=np.int64)
            t1 = np.array([edges[i]["first_hr"]], dtype=np.int64)
            v1 = np.array([edges[i]["first_v"]], dtype=np.int64)
            iu, it, iv = _interp(u0, t0, v0, t1, v1)
            fix_u.append(iu)
            fix_t.append(it)
            fix_v.append(iv)
    if fix_u:
        fixes = pa.table(
            {
                "user_id": pa.array(np.concatenate(fix_u)),
                "hr": pa.array(np.concatenate(fix_t)),
                "v": pa.array(np.concatenate(fix_v)),
            }
        )
        if fixes.num_rows:
            series = series.union(ray.data.from_arrow(fixes))

    def finish(t: pa.Table) -> pa.Table:
        hr = t["hr"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": t["user_id"],
                "hour": pa.array(
                    hr.astype("datetime64[h]").astype("datetime64[us]")
                ),
                "value": pc.divide(pc.cast(t["v"], pa.float64()), 100.0),
            }
        )

    return (
        series.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(8)
        .sort(["user_id", "hour"])
    )


EVENTS_INTERPOLATE_SQL = """
WITH h AS (
  SELECT CAST(user_id AS BIGINT) AS user_id, date_trunc('hour', ts) AS hr,
         CAST(sum(CAST(floor(value * 100.0) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY 1, 2
), spans AS (
  SELECT user_id, min(hr) AS mn, max(hr) AS mx FROM h GROUP BY 1
), grid AS (
  SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hr
  FROM spans
), j AS (
  SELECT g.user_id, g.hr, h.v
  FROM grid g LEFT JOIN h ON g.user_id = h.user_id AND g.hr = h.hr
), w AS (
  SELECT user_id, hr, v,
    last_value(v IGNORE NULLS) OVER
      (PARTITION BY user_id ORDER BY hr ROWS UNBOUNDED PRECEDING) AS pv,
    last_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS) OVER
      (PARTITION BY user_id ORDER BY hr ROWS UNBOUNDED PRECEDING) AS pt,
    first_value(v IGNORE NULLS) OVER
      (PARTITION BY user_id ORDER BY hr
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    first_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS) OVER
      (PARTITION BY user_id ORDER BY hr
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
  FROM j
)
SELECT user_id, hr AS hour,
  CASE WHEN v IS NOT NULL THEN v
       ELSE (pv * (CAST(datediff('hour', pt, nt) AS BIGINT)
                   - CAST(datediff('hour', pt, hr) AS BIGINT))
             + nv * CAST(datediff('hour', pt, hr) AS BIGINT))
            // CAST(datediff('hour', pt, nt) AS BIGINT)
  END / 100.0 AS value
FROM w
ORDER BY user_id, hour
"""


def events_props_stats(sf_dir: str):
    """Semi-structured extraction: parse the integer ``k`` field out of
    the JSON ``props`` column and aggregate per event type.

    The extraction is ONE vectorized RE2 pass (pc.extract_regex) over
    the string column — the flat-field fast path every log-processing
    pipeline wants before reaching for a JSON parser; rows whose props
    lack a parseable integer k (or are null) are excluded on both
    engines.  Per-type sums are bounded (5 event types) and
    driver-merge (CLAUDE.md rule 2).  All-integer, so the oracle hash
    is exact."""
    from .common import grouped_sum

    def extract(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t["props"], r'"k":\s*(?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        ok = pc.is_valid(k)
        et = t["event_type"].filter(ok)
        kv = k.filter(ok)
        return pa.table(
            {
                "event_type": et,
                "k": kv,
                "one": pa.array(np.ones(len(et), dtype=np.int64)),
            }
        )

    ds = read_table(sf_dir, "events", columns=["event_type", "props"]).map_batches(
        extract, batch_format="pyarrow", zero_copy_batch=True
    )
    agg = grouped_sum(
        ds,
        ["event_type"],
        {"n": ("one", "sum"), "sum_k": ("k", "sum"), "max_k": ("k", "max")},
        merge="driver",  # bounded: one key per event type
    )
    return agg.sort("event_type")


EVENTS_PROPS_STATS_SQL = r"""
SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT))
            AS BIGINT) AS sum_k,
       max(CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT)) AS max_k
FROM events
WHERE regexp_extract(props, '"k":\s*(-?\d+)', 1) <> ''
GROUP BY event_type
ORDER BY event_type
"""


def events_sliding_distinct(sf_dir: str):
    """Distinct users per sliding 2-hour window (each hour h covers
    events in (h-1h, h]) — the windowed-DISTINCT shape where the
    aggregate is holistic, so no combiner can collapse values.

    Plan: explode each event into its two covering windows, dedupe
    (window, user) pairs with one bucketed grouped-min (the pair key is
    unbounded — users x windows — exactly the merge="bucket" regime),
    then count per window (bounded: one key per hour, driver merge).
    Two exchanges total, each moving at most 2 rows per event."""
    from .common import grouped_sum

    def explode(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False)
        hour = ts.astype("datetime64[h]").astype(np.int64)
        uid = pc.cast(t["user_id"], pa.int64()).to_numpy(zero_copy_only=False)
        win = np.concatenate([hour, hour + 1])
        u2 = np.concatenate([uid, uid])
        return pa.table(
            {
                "win": pa.array(win),
                "user_id": pa.array(u2),
                "one": pa.array(np.ones(len(win), dtype=np.int64)),
            }
        )

    pairs = grouped_sum(
        read_table(sf_dir, "events", columns=["ts", "user_id"]).map_batches(
            explode, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["win", "user_id"],
        {"one": ("one", "min")},
    )
    counts = grouped_sum(
        pairs.map_batches(
            lambda t: pa.table(
                {"win": t["win"], "one": pa.array(np.ones(t.num_rows, dtype=np.int64))}
            ),
            batch_format="pyarrow",
        ),
        ["win"],
        {"n_users": ("one", "sum")},
        merge="driver",  # bounded: one key per hour
    )

    def finish(t: pa.Table) -> pa.Table:
        w = t["win"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "window_end": pa.array(
                    w.astype("datetime64[h]").astype("datetime64[us]")
                ),
                "n_users": t["n_users"],
            }
        )

    return counts.map_batches(finish, batch_format="pyarrow").sort("window_end")


EVENTS_SLIDING_DISTINCT_SQL = """
WITH h AS (
  SELECT DISTINCT date_trunc('hour', ts) AS hr, user_id FROM events
), w AS (
  SELECT hr AS window_end, user_id FROM h
  UNION
  SELECT hr + INTERVAL 1 HOUR, user_id FROM h
)
SELECT window_end, count(DISTINCT user_id) AS n_users
FROM w GROUP BY window_end ORDER BY window_end
"""


# ---------------------------------------------------------------------------
# Trailing RANGE-interval window: per-event sum/count of the SAME
# user's purchases in the preceding 24 hours (inclusive, tied
# timestamps are peers) — the RANGE BETWEEN INTERVAL ... PRECEDING
# window shape, distinct from the tumbling/sliding fixed windows
# above (every row carries its OWN window).
#
# Scale design: users hash-partition into B buckets (a user's rows
# never split, so no cross-block history problem), ONE lexsort per
# bucket, then the per-row window bounds come from a SINGLE
# searchsorted over band-offset keys: key = seg_id * 2^46 + (ts - t0).
# Bands are wide enough that target = key - 24h never escapes its
# user's band (24h << 2^46 us ~ 814 days), so one global searchsorted
# respects segment boundaries with zero per-user Python.  Both band
# preconditions are asserted per bucket (span, segment count); at
# larger corpora raise n_buckets.
# ---------------------------------------------------------------------------

_DAY_US = 24 * 3600 * 1_000_000


def events_trailing_24h(sf_dir: str, n_buckets: int = 64):
    from ..functions.hashing import splitmix64

    ds = read_table(
        sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type", "value"]
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "purchase"))
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(
                    (splitmix64(uid.astype(np.uint64)) % np.uint64(n_buckets)).astype(
                        np.int64
                    )
                ),
                "event_id": t["event_id"],
                "ts_us": pa.array(
                    t["ts"]
                    .to_numpy(zero_copy_only=False)
                    .astype("datetime64[us]")
                    .astype(np.int64)
                ),
                "user_id": pa.array(uid),
                "value_c": pc.cast(
                    pc.floor(pc.multiply(t["value"], pa.scalar(100.0))), pa.int64()
                ),
            }
        )

    _OUT = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("trail_sum", pa.float64()),
            ("n_24h", pa.int64()),
        ]
    )

    _BAND = np.int64(1) << 46  # us; ~814 days > corpus span + 24h

    def bucket_window(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return _OUT.empty_table()
        uid = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = g["ts_us"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        vc = g["value_c"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, ts, uid))
        uid, ts, eid, vc = uid[order], ts[order], eid[order], vc[order]
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        seg_id = np.cumsum(new_user) - 1
        ts_rel = ts - ts.min()
        assert ts_rel.max() + _DAY_US < _BAND, "corpus span exceeds band width"
        assert (seg_id[-1] + 1) < (np.iinfo(np.int64).max // _BAND), "too many users/bucket"
        key = seg_id * _BAND + ts_rel
        lo = np.searchsorted(key, key - _DAY_US, side="left")
        hi = np.searchsorted(key, key, side="right")
        cumv = np.concatenate(([0], np.cumsum(vc)))
        return pa.table(
            {
                "event_id": pa.array(eid),
                "user_id": pa.array(uid),
                "trail_sum": pa.array((cumv[hi] - cumv[lo]) / 100.0),
                "n_24h": pa.array((hi - lo).astype(np.int64)),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(bucket_window, batch_format="pyarrow")
        .sort("event_id")
    )


EVENTS_TRAILING_24H_SQL = """
SELECT event_id, CAST(user_id AS BIGINT) AS user_id,
       CAST(sum(CAST(floor(value * 100.0) AS BIGINT)) OVER w AS BIGINT) / 100.0
         AS trail_sum,
       CAST(count(*) OVER w AS BIGINT) AS n_24h
FROM events
WHERE event_type = 'purchase'
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 24 HOURS PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# Markov transition matrix over event types: per-user time-ordered
# adjacent pairs, aggregated to the (from, to) transition counts —
# the sequence-mining shape (clickstream Markov models).  Same sorted-
# segment + O(blocks) edge-record machinery as events_od_matrix, over
# the BOUNDED event-type vocabulary (the final aggregate driver-merges
# per rule 2); a transition depends only on ONE adjacent pair, so
# per-block partials + boundary repair are exact under any split.
# ---------------------------------------------------------------------------


def events_type_transitions(sf_dir: str):
    import ray
    import ray.data

    from .common import grouped_sum

    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        ts_us = (
            t["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        return pa.table(
            {
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "ts_us": pa.array(ts_us),
                "event_type": t["event_type"],
            }
        )

    rows = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True).sort(
        ["user_id", "ts_us", "event_id"]
    )

    _SCHEMA = pa.schema(
        [
            ("kind", pa.int8()),  # 0 = transition partial, 1 = block edge
            ("type_from", pa.string()),
            ("type_to", pa.string()),
            ("n", pa.int64()),
            ("first_uid", pa.int64()),
            ("first_ts", pa.int64()),
            ("first_eid", pa.int64()),
            ("last_uid", pa.int64()),
        ]
    )

    def per_batch(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return _SCHEMA.empty_table()
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        ty = t["event_type"].to_numpy(zero_copy_only=False)
        same = uid[1:] == uid[:-1]
        tf, tt = ty[:-1][same], ty[1:][same]
        # batch-local factorize: vocabulary is bounded, partial rows too
        vocab, code_f = np.unique(tf, return_inverse=True)
        _, code_t = np.unique(tt, return_inverse=True)
        vocab_t = np.unique(tt)
        key = code_f.astype(np.int64) * np.int64(len(vocab_t) + 1) + code_t
        uk, cnt = np.unique(key, return_counts=True)
        m = len(uk)
        neg1 = pa.array(np.full(m, -1, dtype=np.int64))
        partials = pa.table(
            {
                "kind": pa.array(np.zeros(m, dtype=np.int8)),
                "type_from": pa.array(
                    vocab[(uk // (len(vocab_t) + 1))].astype(object), pa.string()
                ),
                "type_to": pa.array(
                    vocab_t[(uk % (len(vocab_t) + 1))].astype(object), pa.string()
                ),
                "n": pa.array(cnt.astype(np.int64)),
                "first_uid": neg1,
                "first_ts": neg1,
                "first_eid": neg1,
                "last_uid": neg1,
            },
            schema=_SCHEMA,
        )
        edge = pa.table(
            {
                "kind": pa.array(np.array([1], dtype=np.int8)),
                "type_from": pa.array([str(ty[-1])], pa.string()),  # block tail type
                "type_to": pa.array([str(ty[0])], pa.string()),  # block head type
                "n": pa.array([0], type=pa.int64()),
                "first_uid": pa.array([int(uid[0])], type=pa.int64()),
                "first_ts": pa.array([int(t["ts_us"][0].as_py())], type=pa.int64()),
                "first_eid": pa.array([int(t["event_id"][0].as_py())], type=pa.int64()),
                "last_uid": pa.array([int(uid[-1])], type=pa.int64()),
            },
            schema=_SCHEMA,
        )
        return pa.concat_tables([partials, edge])

    tagged = rows.map_batches(
        per_batch, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).materialize()  # O(types^2 x blocks + blocks) rows

    partials = tagged.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], 1)).select(
            ["type_from", "type_to", "first_uid", "first_ts", "first_eid", "last_uid"]
        ),
        batch_format="pyarrow",
    ).take_all()
    partials.sort(key=lambda e: (e["first_uid"], e["first_ts"], e["first_eid"]))
    bnd: dict[tuple[str, str], int] = {}
    for i in range(1, len(partials)):
        if partials[i]["first_uid"] == partials[i - 1]["last_uid"]:
            k = (partials[i - 1]["type_from"], partials[i]["type_to"])
            bnd[k] = bnd.get(k, 0) + 1

    trans = tagged.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], 0)).select(
            ["type_from", "type_to", "n"]
        ),
        batch_format="pyarrow",
    )
    if bnd:
        ks = sorted(bnd)
        extra = pa.table(
            {
                "type_from": pa.array([k[0] for k in ks], pa.string()),
                "type_to": pa.array([k[1] for k in ks], pa.string()),
                "n": pa.array([bnd[k] for k in ks], pa.int64()),
            }
        )
        trans = trans.union(ray.data.from_arrow(extra))

    out = grouped_sum(
        trans, ["type_from", "type_to"], {"n": ("n", "sum")}, merge="driver"
    )
    return out.sort(["type_from", "type_to"])


EVENTS_TYPE_TRANSITIONS_SQL = """
WITH seq AS (
  SELECT event_type AS type_to,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS type_from
  FROM events
)
SELECT type_from, type_to, count(*)::BIGINT AS n
FROM seq WHERE type_from IS NOT NULL
GROUP BY 1, 2
ORDER BY type_from, type_to
"""


# ---------------------------------------------------------------------------
# Exact per-type variance: the numerically-hazardous aggregate done in
# EXACT integer arithmetic — per-type (n, sum_c, sumsq_c) stream as
# int64 partials (driver-merged, bounded types), then the sample
# variance numerator n*sumsq - sum^2 evaluates in PYTHON INTS on the
# driver (arbitrary precision) exactly where the SQL twin evaluates in
# HUGEINT; only the final floor-divided result (fits int64) crosses.
# ---------------------------------------------------------------------------


def events_value_variance(sf_dir: str):
    import ray.data

    from .common import grouped_sum

    ds = read_table(sf_dir, "events", columns=["event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        vc = pc.cast(pc.floor(pc.multiply(t["value"], pa.scalar(100.0))), pa.int64())
        return pa.table(
            {
                "event_type": t["event_type"],
                "v": vc,
                "v2": pc.multiply(vc, vc),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    agg = grouped_sum(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type"],
        {"n": ("one", "sum"), "sum_c": ("v", "sum"), "sumsq_c": ("v2", "sum")},
        merge="driver",
    )
    t = pa.concat_tables(
        [b for b in agg.iter_batches(batch_size=None, batch_format="pyarrow")]
    )
    ns = t["n"].to_pylist()
    sums = t["sum_c"].to_pylist()
    sqs = t["sumsq_c"].to_pylist()
    mean_c = [s // n for s, n in zip(sums, ns)]
    var_c2 = [
        ((n * q - s * s) // (n * (n - 1))) if n > 1 else 0
        for n, s, q in zip(ns, sums, sqs)
    ]
    out = pa.table(
        {
            "event_type": t["event_type"],
            "n": pa.array(ns, pa.int64()),
            "mean_c": pa.array(mean_c, pa.int64()),
            "var_c2": pa.array(var_c2, pa.int64()),
        }
    )
    return ray.data.from_arrow(out).sort("event_type")


EVENTS_VALUE_VARIANCE_SQL = """
SELECT event_type,
       count(*)::BIGINT AS n,
       CAST(sum(CAST(floor(value * 100.0) AS BIGINT)) // count(*) AS BIGINT)
         AS mean_c,
       CAST(CASE WHEN count(*) > 1 THEN
         (count(*) * sum(CAST(floor(value * 100.0) AS BIGINT)
                         * CAST(floor(value * 100.0) AS BIGINT))
          - sum(CAST(floor(value * 100.0) AS BIGINT))
            * sum(CAST(floor(value * 100.0) AS BIGINT)))
         // (count(*) * (count(*) - 1))
       ELSE 0 END AS BIGINT) AS var_c2
FROM events
GROUP BY 1
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Per-user MODE (most frequent event type, ties -> lexicographically
# smallest): grouped argmax over an UNBOUNDED user key — counts and
# maxes are two bucketed exchanges, the argmax recovery is one bucketed
# hash_join + equality filter, tie-break is a string-min grouped_sum.
# No driver state at any user cardinality.
# ---------------------------------------------------------------------------


def events_user_mode(sf_dir: str):
    from ..stages.join import hash_join
    from .common import grouped_sum

    ds = read_table(sf_dir, "events", columns=["user_id", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "event_type": t["event_type"],
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    counts = grouped_sum(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id", "event_type"],
        {"cnt": ("one", "sum")},
    ).materialize()  # feeds both the max exchange and the join

    maxes = grouped_sum(counts, ["user_id"], {"mx": ("cnt", "max")})
    j = hash_join(
        counts,
        maxes,
        on="user_id",
        left_cols=["user_id", "event_type", "cnt"],
        right_cols=["user_id", "mx"],
    )

    def keep_max(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["cnt"], t["mx"]))
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_type": t["event_type"],
                "mx": t["mx"],
            }
        )

    out = grouped_sum(
        j.map_batches(keep_max, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"],
        {"mode_type": ("event_type", "min"), "n_events": ("mx", "min")},
    )
    return out.sort("user_id")


EVENTS_USER_MODE_SQL = """
WITH c AS (
  SELECT CAST(user_id AS BIGINT) AS user_id, event_type, count(*) AS cnt
  FROM events GROUP BY 1, 2
), m AS (
  SELECT user_id, max(cnt) AS mx FROM c GROUP BY 1
)
SELECT c.user_id, min(event_type) AS mode_type, CAST(mx AS BIGINT) AS n_events
FROM c JOIN m ON c.user_id = m.user_id AND c.cnt = m.mx
GROUP BY c.user_id, mx
ORDER BY c.user_id
"""

# ---------------------------------------------------------------------------
# Exponentially-weighted trailing window (EWMA over the last 16 rows,
# alpha = 1/2): the position-WEIGHTED ROWS-frame window, complementing
# events_trailing_24h's unweighted RANGE frame.  Dyadic weights
# 2^15..2^0 keep the whole computation in exact int64 on both engines
# (no float recurrence drift): ewma = ewma_num / ewma_den with
# ewma_num = sum_{j=0..min(r,15)} value_c[i-j] * 2^(15-j) and
# ewma_den the matching weight sum.  Same one-exchange shape as
# events_trailing_24h: users hash into buckets, ONE lexsort per
# bucket, then 16 shifted vectorized adds (a ROWS frame is a fixed
# number of adjacent-row gathers — no per-user Python, rule 1).
# ---------------------------------------------------------------------------


def events_ewma16(sf_dir: str, n_buckets: int = 64):
    from ..functions.hashing import splitmix64

    ds = read_table(
        sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type", "value"]
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "purchase"))
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(
                    (splitmix64(uid.astype(np.uint64)) % np.uint64(n_buckets)).astype(
                        np.int64
                    )
                ),
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "ts_us": pa.array(
                    t["ts"]
                    .to_numpy(zero_copy_only=False)
                    .astype("datetime64[us]")
                    .astype(np.int64)
                ),
                "user_id": pa.array(uid),
                "value_c": pc.cast(
                    pc.floor(pc.multiply(t["value"], pa.scalar(100.0))), pa.int64()
                ),
            }
        )

    _OUT = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("ewma_num", pa.int64()),
            ("ewma_den", pa.int64()),
        ]
    )

    K = 16

    def bucket_ewma(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return _OUT.empty_table()
        uid = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = g["ts_us"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        vc = g["value_c"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, ts, uid))
        uid, eid, vc = uid[order], eid[order], vc[order]
        num = np.zeros(n, dtype=np.int64)
        den = np.zeros(n, dtype=np.int64)
        for j in range(K):
            w = np.int64(1) << (K - 1 - j)
            if j == 0:
                num += vc * w
                den += w
                continue
            # row i-j contributes iff it exists and is the same user
            valid = np.zeros(n, dtype=bool)
            valid[j:] = uid[j:] == uid[:-j]
            num[j:] += np.where(valid[j:], vc[:-j], 0) * w
            den[j:] += np.where(valid[j:], w, 0)
        return pa.table(
            {
                "event_id": pa.array(eid),
                "user_id": pa.array(uid),
                "ewma_num": pa.array(num),
                "ewma_den": pa.array(den),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(bucket_ewma, batch_format="pyarrow")
        .sort("event_id")
    )


EVENTS_EWMA16_SQL = """
WITH p AS (
  SELECT event_id, CAST(user_id AS BIGINT) AS user_id,
         CAST(floor(value * 100.0) AS BIGINT) AS vc,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events WHERE event_type = 'purchase'
)
SELECT a.event_id, a.user_id,
       CAST(sum(b.vc * (1::BIGINT << CAST(15 - (a.rn - b.rn) AS INTEGER))) AS BIGINT)
         AS ewma_num,
       CAST(sum(1::BIGINT << CAST(15 - (a.rn - b.rn) AS INTEGER)) AS BIGINT)
         AS ewma_den
FROM p a JOIN p b
  ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - 15 AND a.rn
GROUP BY a.event_id, a.user_id
ORDER BY a.event_id
"""


# ---------------------------------------------------------------------------
# Stream-stream interval join (stages/streaming.StreamJoinShardLogic):
# buffered-left-rows state — the streaming-op class the windowed
# aggregate shards don't cover.  Ordered replay makes the result equal
# the batch interval join exactly, so it carries a full SQL oracle;
# chunk-boundary invariance is unit-tested (the strict l.ts < r.ts
# bound is what makes equal-ts splits safe).
# ---------------------------------------------------------------------------


def events_stream_join(sf_dir: str):
    from ..stages.streaming import streaming_interval_join

    return streaming_interval_join(sf_dir, window_min=60)


EVENTS_STREAM_JOIN_SQL = """
SELECT r.event_id,
       CAST(count(l.event_id) AS BIGINT) AS n_clicks,
       CAST(COALESCE(sum(CAST(floor(l.value * 100.0) AS BIGINT)), 0) AS BIGINT)
         AS click_value_c
FROM events r
LEFT JOIN events l
  ON l.user_id = r.user_id AND l.event_type = 'click'
 AND l.ts >= r.ts - INTERVAL 1 HOUR AND l.ts < r.ts
WHERE r.event_type = 'purchase'
GROUP BY r.event_id
ORDER BY r.event_id
"""


# ---------------------------------------------------------------------------
# Per-user z-score anomaly detection: the aggregate -> join-back ->
# per-row predicate class (events_value_variance computed the moments;
# this one applies them back to every row).  The z² > K² test is
# cross-multiplied into pure int64 — 4·(n·v − Σ)² > 25·(n·Σv² − Σ²)
# is exactly |z| > 5/2 under the population variance — so both engines
# evaluate identical integers (no sqrt, no division; the
# small_qty_revenue trick applied to second moments).  One bucketed
# stats exchange + one bucketed join-back; magnitudes bounded by
# n ≤ 10^3 rows/user · v_c ≤ 10^5 cents → every product < 2.5·10^17.
# ---------------------------------------------------------------------------


def events_anomaly(sf_dir: str, min_n: int = 8):
    from ..stages.join import hash_join

    ds = read_table(
        sf_dir, "events", columns=["event_id", "user_id", "event_type", "value"]
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "purchase"))
        vc = pc.cast(pc.floor(pc.multiply(t["value"], pa.scalar(100.0))), pa.int64())
        return pa.table(
            {
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "vc": vc,
                "vc2": pc.multiply(vc, vc),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    p = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True).materialize()
    stats = grouped_sum(
        p,
        ["user_id"],
        {"n": ("one", "sum"), "sm": ("vc", "sum"), "sq": ("vc2", "sum")},
    )
    j = hash_join(
        p,
        stats,
        on="user_id",
        left_cols=["user_id", "event_id", "vc"],
        right_cols=["user_id", "n", "sm", "sq"],
    )

    def flag(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False)
        sm = t["sm"].to_numpy(zero_copy_only=False)
        sq = t["sq"].to_numpy(zero_copy_only=False)
        vc = t["vc"].to_numpy(zero_copy_only=False)
        dev = n * vc - sm
        keep = (n >= min_n) & (4 * dev * dev > 25 * (n * sq - sm * sm))
        t = t.filter(pa.array(keep))
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "value_c": t["vc"],
                "n": t["n"],
            }
        )

    return j.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True).sort(
        "event_id"
    )


EVENTS_ANOMALY_SQL = """
WITH p AS (
  SELECT event_id, CAST(user_id AS BIGINT) AS u,
         CAST(floor(value * 100.0) AS BIGINT) AS vc
  FROM events WHERE event_type = 'purchase'
), s AS (
  SELECT u, count(*)::BIGINT AS n, CAST(sum(vc) AS BIGINT) AS sm,
         CAST(sum(vc * vc) AS BIGINT) AS sq
  FROM p GROUP BY u
)
SELECT p.event_id, p.u AS user_id, p.vc AS value_c, s.n
FROM p JOIN s ON p.u = s.u
WHERE s.n >= 8
  AND 4 * (s.n * p.vc - s.sm) * (s.n * p.vc - s.sm)
      > 25 * (s.n * s.sq - s.sm * s.sm)
ORDER BY p.event_id
"""


# ---------------------------------------------------------------------------
# Ordered string aggregation (collect_list / string_agg class): each
# user's full event-type path in time order — the clickstream-path
# export shape.  Order-SENSITIVE holistic aggregate: users hash into
# buckets (one exchange), one lexsort per bucket, and the per-user
# join is a single vectorized pc.binary_join over a ListArray built
# from the segment offsets — no per-user Python, no string loops.
# ---------------------------------------------------------------------------


def events_user_path(sf_dir: str, n_buckets: int = 64):
    from ..functions.hashing import splitmix64

    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(
                    (splitmix64(uid.astype(np.uint64)) % np.uint64(n_buckets)).astype(
                        np.int64
                    )
                ),
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "ts_us": pa.array(
                    t["ts"].to_numpy(zero_copy_only=False)
                    .astype("datetime64[us]").astype(np.int64)
                ),
                "user_id": pa.array(uid),
                "event_type": t["event_type"],
            }
        )

    _OUT = pa.schema([("user_id", pa.int64()), ("n_events", pa.int64()), ("path", pa.string())])

    def paths(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return _OUT.empty_table()
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts_us"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid_s = uid[order]
        et = g["event_type"].combine_chunks() if isinstance(
            g["event_type"], pa.ChunkedArray
        ) else g["event_type"]
        et_s = et.take(pa.array(order))
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = uid_s[1:] != uid_s[:-1]
        starts = np.flatnonzero(new_user)
        offs = np.append(starts, n).astype(np.int32)
        lists = pa.ListArray.from_arrays(pa.array(offs), et_s)
        return pa.table(
            {
                "user_id": pa.array(uid_s[starts]),
                "n_events": pa.array(np.diff(offs).astype(np.int64)),
                "path": pc.binary_join(lists, ","),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(paths, batch_format="pyarrow")
        .sort("user_id")
    )


EVENTS_USER_PATH_SQL = """
SELECT CAST(user_id AS BIGINT) AS user_id,
       count(*)::BIGINT AS n_events,
       string_agg(event_type, ',' ORDER BY ts, event_id) AS path
FROM events
GROUP BY user_id
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Time-weighted average (TWAP) per user — the interval-weighted
# aggregation class (financial TWAP / sensor time-weighted mean): each
# observation holds its value until the user's NEXT event, so the mean
# weights values by holding duration, not by row count.  Engine shape:
# one hash(user) bucket exchange, per-bucket lexsort + vectorized
# segment logic (same machinery as events_lead_lag), per-user sums via
# np.add.reduceat — zero per-user Python.  All arithmetic is exact
# integers (cents x microseconds); the numerator accumulates via a
# hi/lo split of each holding interval so intermediates never exceed
# the true per-user numerator (safe wherever the answer itself fits
# int64, matching DuckDB's HUGEINT sum), and the final TWAP is a
# floor division mirrored by the SQL twin.
# ---------------------------------------------------------------------------


def events_twap(sf_dir: str, n_buckets: int = 32):
    from ..functions.hashing import splitmix64
    from .common import floor_scale

    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])

    def tag(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (splitmix64(uid) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("__bkt", pa.array(b))

    _OUT = pa.schema(
        [("user_id", pa.int64()), ("span_us", pa.int64()), ("twap_c", pa.int64())]
    )

    def twap(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        uid = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (
            g["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        )
        vc = floor_scale(g["value"]).to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uo, to, vo = uid[order], ts[order], vc[order]
        n = len(uo)
        same_next = np.zeros(n, dtype=bool)
        same_next[:-1] = uo[1:] == uo[:-1]
        dt = np.zeros(n, dtype=np.int64)
        dt[:-1][same_next[:-1]] = (to[1:] - to[:-1])[same_next[:-1]]
        first = np.ones(n, dtype=bool)
        first[1:] = uo[1:] != uo[:-1]
        starts = np.flatnonzero(first)
        span = np.add.reduceat(dt, starts)
        # hi/lo split keeps every intermediate <= the true per-user
        # numerator (vo >= 0, lo <= dt, vo*hi*2^32 <= vo*dt), so the
        # sum is exact whenever the numerator itself fits int64 —
        # unlike the direct vo*dt per-element product, whose wrap at
        # multi-year spans DuckDB's HUGEINT sum would not share
        assert vo.min(initial=0) >= 0, "twap requires non-negative values"
        hi, lo = dt >> np.int64(32), dt & np.int64(0xFFFFFFFF)
        numer = np.add.reduceat(vo * hi, starts) * np.int64(1 << 32) + np.add.reduceat(
            vo * lo, starts
        )
        assert numer.min(initial=0) >= 0, "twap numerator exceeds int64"
        keep = span > 0  # users with >= 2 distinct-ts events
        return pa.table(
            {
                "user_id": pa.array(uo[starts][keep]),
                "span_us": pa.array(span[keep]),
                "twap_c": pa.array(numer[keep] // span[keep]),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bkt")
        .map_groups(twap, batch_format="pyarrow")
        .sort("user_id")
    )


EVENTS_TWAP_SQL = """
WITH w AS (
  SELECT user_id,
         CAST(floor(value * 100.0) AS BIGINT) AS vc,
         epoch_us(ts) AS tsu,
         epoch_us(LEAD(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id)) AS nxt
  FROM events
)
SELECT user_id,
       CAST(sum(nxt - tsu) AS BIGINT) AS span_us,
       CAST(sum(vc * (nxt - tsu)) AS BIGINT)
         // CAST(sum(nxt - tsu) AS BIGINT) AS twap_c
FROM w
WHERE nxt IS NOT NULL
GROUP BY user_id
HAVING sum(nxt - tsu) > 0
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Gaps-and-islands / interval union per user: each event opens a
# 5-minute activity interval; overlapping-or-touching intervals merge
# into islands, and the per-user result is (number of islands, total
# covered microseconds) — the interval-coverage class (uptime
# calculation, sensor-activity union, sessionized coverage).  Engine
# shape: one hash(user) bucket exchange, then a per-bucket lexsort and
# a SEGMENTED RUNNING MAX of interval ends (the classic islands
# detector: a row starts a new island iff its start exceeds the
# running max end of everything before it in the user's order) done
# with a per-segment offset trick on one np.maximum.accumulate —
# zero per-user Python.  Island and user rollups are reduceat sums.
# ---------------------------------------------------------------------------

INTERVAL_WINDOW_US = 300_000_000  # 5 minutes


def events_interval_coverage(sf_dir: str, n_buckets: int = 32):
    from ..functions.hashing import splitmix64

    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id"])

    def tag(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (splitmix64(uid) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("__bkt", pa.array(b))

    _OUT = pa.schema(
        [("user_id", pa.int64()), ("n_islands", pa.int64()), ("covered_us", pa.int64())]
    )

    def islands(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        uid = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (
            g["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        )
        order = np.lexsort((eid, ts, uid))
        uo, so = uid[order], ts[order]
        eo = so + INTERVAL_WINDOW_US
        n = len(uo)
        first = np.ones(n, dtype=bool)
        first[1:] = uo[1:] != uo[:-1]
        seg_id = np.cumsum(first) - 1
        # segmented running max of ends: add a per-segment offset larger
        # than the whole value range so accumulate never crosses users
        base = eo.min()
        rel = eo - base
        big = int(rel.max()) + INTERVAL_WINDOW_US + 1
        # offsets must stay clear of int64; users-per-bucket x time-range
        # is bounded by raising n_buckets with cluster size
        assert int(seg_id[-1]) * big < (1 << 62), "raise n_buckets"
        runmax = np.maximum.accumulate(rel + seg_id * big) - seg_id * big + base
        new_island = first.copy()
        new_island[1:] |= so[1:] > runmax[:-1]  # touch merges (> strict)
        isl_starts = np.flatnonzero(new_island)
        # island end = running max at the island's LAST row
        isl_last = np.concatenate([isl_starts[1:] - 1, [n - 1]])
        covered = runmax[isl_last] - so[isl_starts]
        # roll islands up to users
        isl_user = uo[isl_starts]
        ufirst = np.ones(len(isl_user), dtype=bool)
        ufirst[1:] = isl_user[1:] != isl_user[:-1]
        ustarts = np.flatnonzero(ufirst)
        counts = np.diff(np.concatenate([ustarts, [len(isl_user)]]))
        return pa.table(
            {
                "user_id": pa.array(isl_user[ustarts]),
                "n_islands": pa.array(counts.astype(np.int64)),
                "covered_us": pa.array(np.add.reduceat(covered, ustarts)),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bkt")
        .map_groups(islands, batch_format="pyarrow")
        .sort("user_id")
    )


EVENTS_INTERVAL_COVERAGE_SQL = f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS s,
         epoch_us(ts) + {INTERVAL_WINDOW_US} AS e,
         max(epoch_us(ts) + {INTERVAL_WINDOW_US}) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS prev_max
  FROM events
),
f AS (
  SELECT user_id, event_id, s, e,
         CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END
           AS isl_start
  FROM e
),
i AS (
  -- tie-break by event_id to match the prev_max window and the
  -- engine's (user, ts, event_id) lexsort on duplicate timestamps
  SELECT user_id, s, e,
         sum(isl_start) OVER (
           PARTITION BY user_id ORDER BY s, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS island_id
  FROM f
),
g AS (
  SELECT user_id, island_id,
         max(e) - min(s) AS covered
  FROM i GROUP BY user_id, island_id
)
SELECT user_id, count(*)::BIGINT AS n_islands,
       CAST(sum(covered) AS BIGINT) AS covered_us
FROM g GROUP BY user_id ORDER BY user_id
"""
