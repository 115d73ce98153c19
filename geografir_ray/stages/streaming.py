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
        wins = (ts_us // self.window_us).astype(np.int64)
        closed_cutoff = (self.watermark - self.lateness_us) // self.window_us
        for k, w, v in zip(keys.tolist(), wins.tolist(), values.tolist()):
            if w < closed_cutoff:
                self.late_rows += 1  # window already closed -> dropped, counted
                continue
            acc = self.open.get((k, w))
            if acc is None:
                self.open[(k, w)] = [1, v]
            else:
                acc[0] += 1
                acc[1] += v
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
