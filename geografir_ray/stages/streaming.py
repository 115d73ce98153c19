"""Stream-shaped processing with genuine actor-held state.

Ray Data has no event-time watermarks (ray_guide: "Streaming-shaped
workloads"); for batch pipelines the engine expresses windows as
groupbys (pipelines/events.py).  This module covers the remaining
case from the build brief — semantics that NEED incremental state:
an ordered log consumed in arrival chunks, tumbling event-time
windows with a watermark, and late-data accounting.

Design: one ``WindowShard`` actor per key-hash bucket (the unit of
parallelism and of ordering); a driver-side replayer feeds each chunk
to its shards by key hash.  Each shard keeps open windows in a dict,
closes them when the watermark (max event ts seen minus allowed
lateness) passes the window end, and counts rows arriving after their
window closed as late.  Window results are emitted exactly once, on
close or at flush.

Determinism: results depend only on (event content, chunk boundaries,
lateness), never on actor scheduling — each shard sees its keys in
log order because the replayer feeds chunks sequentially.
"""

from __future__ import annotations

import numpy as np


class WindowShardLogic:
    """Pure-Python shard state machine (actor-wrappable, test-bare)."""

    def __init__(self, window_us: int, lateness_us: int):
        self.window_us = window_us
        self.lateness_us = lateness_us
        self.open: dict[tuple[int, int], list[float]] = {}  # (key, win) -> [count, sum]
        self.closed: list[tuple[int, int, int, float]] = []
        self.watermark = -(1 << 62)
        self.late_rows = 0

    def ingest(self, keys: np.ndarray, ts_us: np.ndarray, values: np.ndarray) -> None:
        """Chunk ingest, vectorized: the watermark only advances AFTER
        the chunk (matching the original row-loop, whose cutoff was also
        computed once per chunk), so aggregating the chunk by (key,
        window) first is exactly equivalent — and turns the per-ROW
        Python loop into a lexsort + reduceat plus one dict update per
        DISTINCT (key, window) in the chunk."""
        wins = (ts_us // self.window_us).astype(np.int64)
        closed_cutoff = (self.watermark - self.lateness_us) // self.window_us
        live = wins >= closed_cutoff
        self.late_rows += int(len(wins) - live.sum())
        k, w, v = keys[live], wins[live], values[live]
        if len(k):
            order = np.lexsort((w, k))
            k, w, v = k[order], w[order], v[order]
            first = np.ones(len(k), dtype=bool)
            first[1:] = (k[1:] != k[:-1]) | (w[1:] != w[:-1])
            starts = np.flatnonzero(first)
            cnt = np.diff(np.concatenate((starts, [len(k)])))
            vsum = np.add.reduceat(v, starts)
            open_ = self.open
            for kk, ww, c, s in zip(
                k[starts].tolist(), w[starts].tolist(), cnt.tolist(), vsum.tolist()
            ):
                acc = open_.get((kk, ww))
                if acc is None:
                    open_[(kk, ww)] = [c, s]
                else:
                    acc[0] += c
                    acc[1] += s
        if len(ts_us):
            self.watermark = max(self.watermark, int(ts_us.max()))
        self._close_expired()

    def _close_expired(self) -> None:
        cutoff = (self.watermark - self.lateness_us) // self.window_us
        expired = [kw for kw in self.open if kw[1] < cutoff]
        for kw in expired:
            c, s = self.open.pop(kw)
            self.closed.append((kw[0], kw[1], c, s))

    def flush(self) -> list[tuple[int, int, int, float]]:
        for kw in sorted(self.open):
            c, s = self.open.pop(kw)
            self.closed.append((kw[0], kw[1], c, s))
        out = self.closed
        self.closed = []
        return out

    def flush_arrays(self):
        """flush(), but returned as four packed numpy columns — the
        bench-scale path: a shard may close millions of windows, and
        shipping tuple lists to the driver (then building a DataFrame
        row-wise) would measure Python object churn, not the engine.
        The np.asarray conversion runs shard-side, in parallel."""
        rows = self.flush()
        if not rows:
            z = np.empty(0, dtype=np.int64)
            return z, z, z, np.empty(0, dtype=np.float64)
        a = np.asarray(rows, dtype=np.float64)
        return (
            a[:, 0].astype(np.int64),
            a[:, 1].astype(np.int64),
            a[:, 2].astype(np.int64),
            a[:, 3],
        )

    def drain_closed(self) -> list[tuple[int, int, int, float]]:
        out = self.closed
        self.closed = []
        return out

    def late_count(self) -> int:
        return self.late_rows


def streaming_window_counts(
    sf_dir: str,
    window_min: int = 60,
    lateness_min: int = 5,
    n_shards: int = 4,
    chunk_rows: int = 2000,
):
    """Replay the events table in ts order through WindowShard actors.

    Returns (pandas result sorted by (user_id, window_start), total
    late rows).  The batch-equivalent groupby gives identical results
    when no rows are late (tested).
    """
    import pandas as pd
    import ray

    from ..sources.tables import read_table_local

    Shard = ray.remote(WindowShardLogic)

    ev = read_table_local(
        sf_dir, "events", columns=["user_id", "ts", "value"]
    ).sort_values("ts", kind="mergesort")
    keys = ev["user_id"].values.astype(np.int64)
    ts_us = ev["ts"].values.astype("datetime64[us]").astype(np.int64)
    vals = np.floor(ev["value"].values * 100.0).astype(np.int64)  # exact cents

    window_us = window_min * 60 * 1_000_000
    lateness_us = lateness_min * 60 * 1_000_000
    shards = [
        Shard.remote(window_us, lateness_us) for _ in range(n_shards)
    ]
    shard_of = keys % n_shards

    pending = []
    for start in range(0, len(ev), chunk_rows):
        end = min(start + chunk_rows, len(ev))
        for s in range(n_shards):
            sel = slice(start, end)
            m = shard_of[sel] == s
            if m.any():
                pending.append(
                    shards[s].ingest.remote(keys[sel][m], ts_us[sel][m], vals[sel][m])
                )
    ray.get(pending)  # all chunks ingested in order per shard

    rows = []
    for s in range(n_shards):
        rows.extend(ray.get(shards[s].flush.remote()))
    late_total = sum(ray.get([s.late_count.remote() for s in shards]))
    out = pd.DataFrame(
        rows, columns=["user_id", "window", "n_events", "sum_value_c"]
    )
    out["window_start"] = (out["window"].values * window_us).astype("datetime64[us]")
    out["sum_value"] = out["sum_value_c"] / 100.0
    out = out[["user_id", "window_start", "n_events", "sum_value"]].sort_values(
        ["user_id", "window_start"], kind="mergesort"
    ).reset_index(drop=True)
    return out, late_total


def bench_rows(i: np.ndarray, n_users: int = 100_000):
    """Deterministic synthetic event rows for the streaming bench:
    ~10 events/sec global advance (dense enough that 60-min windows
    genuinely aggregate, ~4 events per (key, window) at n_users=10k),
    +-10 min jitter, and every 1000th row a 3-hour straggler (well past
    the lateness horizon, so the late-drop path is genuinely
    exercised)."""
    base = np.int64(1_577_836_800_000_000)  # 2020-01-01 in us
    keys = (i * 2654435761) % n_users
    ts_us = base + i * 100_000 + ((i * 48271) % 1_200_000_000) - 600_000_000
    ts_us = ts_us - (i % 1000 == 7) * np.int64(3 * 3600 * 1_000_000)
    vals = i % 1000
    return keys, ts_us, vals


def streaming_replay_bench(
    n_rows: int = 5_000_000,
    n_shards: int = 8,
    chunk_rows: int = 250_000,
    window_min: int = 60,
    lateness_min: int = 5,
    n_users: int = 100_000,
):
    """Bench-scale deterministic replay through WindowShard actors —
    the same state machine streaming_window_counts drives from the
    events table, sized to measure the shard-parallel ingest path:
    time advances mostly monotonically with a +-10 min deterministic
    jitter, so the watermark closes windows as it goes (bounded open
    state) and a small deterministic fraction arrives late."""
    import pandas as pd
    import ray

    Shard = ray.remote(WindowShardLogic)

    window_us = window_min * 60 * 1_000_000
    lateness_us = lateness_min * 60 * 1_000_000
    shards = [Shard.remote(window_us, lateness_us) for _ in range(n_shards)]

    pending = []
    for start in range(0, n_rows, chunk_rows):
        end = min(start + chunk_rows, n_rows)
        i = np.arange(start, end, dtype=np.int64)
        keys, ts_us, vals = bench_rows(i, n_users)
        shard_of = keys % n_shards
        for s in range(n_shards):
            m = shard_of == s
            if m.any():
                pending.append(
                    shards[s].ingest.remote(keys[m], ts_us[m], vals[m])
                )
    # no per-chunk barrier needed: actor tasks from one submitter run
    # in submission order, which IS the ordered-replay contract
    ray.get(pending)

    cols = ray.get([s.flush_arrays.remote() for s in shards])
    late_total = sum(ray.get([s.late_count.remote() for s in shards]))
    out = pd.DataFrame(
        {
            "key": np.concatenate([c[0] for c in cols]),
            "window": np.concatenate([c[1] for c in cols]),
            "n_events": np.concatenate([c[2] for c in cols]),
            "sum_value": np.concatenate([c[3] for c in cols]),
        }
    )
    return out, late_total


class StreamJoinShardLogic:
    """Stream-stream interval-join shard: LEFT rows (clicks) buffer in
    bounded per-shard state; each arriving RIGHT row (purchase) joins
    the buffered lefts of its key with ``l.ts in [r.ts - window, r.ts)``
    (strict upper bound: an equal-ts left may land in a LATER replay
    chunk, so including it would make results depend on chunk
    boundaries — the batch twin uses the same strict bound).  The
    buffer holds only the trailing ``window_us`` of lefts (evicted on
    watermark advance) — the genuinely-streaming state the windowed
    aggregate shards don't have.

    Exactness: the replayer feeds rows in global (ts, event_id) order,
    so every left with ts < r.ts has arrived by the time r's chunk is
    processed; per-chunk matching is one lexsort + two searchsorteds
    over (key code, ts) band offsets — no per-row Python.
    """

    def __init__(self, window_us: int):
        self.window_us = window_us
        z = np.empty(0, dtype=np.int64)
        self.buf_k, self.buf_ts, self.buf_v = z, z, z.copy()
        self.out_id: list[np.ndarray] = []
        self.out_n: list[np.ndarray] = []
        self.out_s: list[np.ndarray] = []
        self.max_ts = -(1 << 62)

    def ingest(
        self,
        keys: np.ndarray,
        ts_us: np.ndarray,
        vals: np.ndarray,
        is_left: np.ndarray,
        rids: np.ndarray,
    ) -> None:
        lk = np.concatenate([self.buf_k, keys[is_left]])
        lts = np.concatenate([self.buf_ts, ts_us[is_left]])
        lv = np.concatenate([self.buf_v, vals[is_left]])
        right = ~is_left
        rk, rts, rid = keys[right], ts_us[right], rids[right]
        if len(rk):
            if len(lk):
                uk = np.unique(np.concatenate([lk, rk]))
                lcode = np.searchsorted(uk, lk)
                rcode = np.searchsorted(uk, rk)
                ts0 = int(min(lts.min(), rts.min()))
                span = int(max(lts.max(), rts.max())) - ts0 + 2
                packed = lcode * span + (lts - ts0)
                order = np.argsort(packed, kind="stable")
                packed = packed[order]
                cs = np.concatenate(([0], np.cumsum(lv[order])))
                lo_off = np.maximum(rts - self.window_us - ts0, 0)
                lo = np.searchsorted(packed, rcode * span + lo_off, side="left")
                hi_off = np.clip(rts - ts0, 0, span - 1)
                hi = np.searchsorted(packed, rcode * span + hi_off, side="left")
                n = (hi - lo).astype(np.int64)
                s = cs[hi] - cs[lo]
            else:
                n = np.zeros(len(rk), dtype=np.int64)
                s = np.zeros(len(rk), dtype=np.int64)
            self.out_id.append(rid)
            self.out_n.append(n)
            self.out_s.append(s)
        if len(ts_us):
            self.max_ts = max(self.max_ts, int(ts_us.max()))
        keep = lts >= self.max_ts - self.window_us
        self.buf_k, self.buf_ts, self.buf_v = lk[keep], lts[keep], lv[keep]

    def buffered(self) -> int:
        return len(self.buf_k)

    def flush_arrays(self):
        if not self.out_id:
            z = np.empty(0, dtype=np.int64)
            return z, z, z
        return (
            np.concatenate(self.out_id),
            np.concatenate(self.out_n),
            np.concatenate(self.out_s),
        )


def streaming_interval_join(
    sf_dir: str,
    window_min: int = 60,
    n_shards: int = 4,
    chunk_rows: int = 2000,
):
    """Replay the events table in (ts, event_id) order through
    StreamJoinShard actors: per purchase, the count and cent-sum of
    the same user's clicks in the strictly-preceding hour.  Returns a
    pandas frame sorted by event_id — identical to the batch interval
    join when replayed in order (the oracle twin)."""
    import pandas as pd
    import ray

    from ..sources.tables import read_table_local

    Shard = ray.remote(StreamJoinShardLogic)

    ev = read_table_local(
        sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type", "value"]
    )
    ev = ev[ev["event_type"].isin(["click", "purchase"])]
    ev = ev.sort_values(["ts", "event_id"], kind="mergesort")
    keys = ev["user_id"].values.astype(np.int64)
    ts_us = ev["ts"].values.astype("datetime64[us]").astype(np.int64)
    vals = np.floor(ev["value"].values * 100.0).astype(np.int64)
    is_left = (ev["event_type"] == "click").values
    rids = ev["event_id"].values.astype(np.int64)

    window_us = window_min * 60 * 1_000_000
    shards = [Shard.remote(window_us) for _ in range(n_shards)]
    shard_of = keys % n_shards

    pending = []
    for start in range(0, len(ev), chunk_rows):
        sel = slice(start, min(start + chunk_rows, len(ev)))
        for s in range(n_shards):
            m = shard_of[sel] == s
            if m.any():
                pending.append(
                    shards[s].ingest.remote(
                        keys[sel][m], ts_us[sel][m], vals[sel][m],
                        is_left[sel][m], rids[sel][m],
                    )
                )
    ray.get(pending)
    ids, ns, ss = [], [], []
    for s in range(n_shards):
        i, n, v = ray.get(shards[s].flush_arrays.remote())
        ids.append(i)
        ns.append(n)
        ss.append(v)
    out = pd.DataFrame(
        {
            "event_id": np.concatenate(ids),
            "n_clicks": np.concatenate(ns),
            "click_value_c": np.concatenate(ss),
        }
    ).sort_values("event_id", kind="mergesort").reset_index(drop=True)
    return out
