"""Partitioned spatial kNN — the large-large path (no broadcast side).

Algorithm (SURVEY.md §2.2 "kNN via cell-ring expansion"):

1. Targets are assigned to grid cells at ``bits`` resolution.
2. Queries emit candidate rows for every cell in their (2R+1)^2
   neighborhood (ring radius R) — shuffle key = cell id.
3. groupby(cell): each group holds the cell's targets + the queries
   probing it; emit per-(query, cell) local top-k by haversine.
4. groupby(query): merge local top-ks into the global top-k.
5. **Correctness guarantee**: a query's result is provably exact when
   its k-th distance <= the distance to the edge of its ring-R
   neighborhood.  Queries that fail the bound (or found < k targets)
   fall back to an exact pass against the full target set — the
   fallback fraction is tiny when cell size is matched to target
   density, and the answer is exact regardless.

All distances in km (haversine); ties broken by target id — fully
deterministic output.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import cells, geom


def _neighbor_cells(cell: np.ndarray, bits: int, radius: int) -> np.ndarray:
    """(n, (2R+1)^2) neighbor cell ids (clipped at grid edges, lon wraps)."""
    n_axis = np.int64(1) << bits
    row = (cell >> np.uint64(32)).astype(np.int64)
    col = (cell & np.uint64(0xFFFFFFFF)).astype(np.int64)
    offs = np.arange(-radius, radius + 1, dtype=np.int64)
    rr = np.clip(row[:, None] + offs[None, :], 0, n_axis - 1)  # (n, 2R+1)
    cc = (col[:, None] + offs[None, :]) % n_axis  # lon wraps
    out = (
        rr[:, :, None].astype(np.uint64) << np.uint64(32)
    ) | cc[:, None, :].astype(np.uint64)
    return out.reshape(len(cell), -1)


def _ring_edge_km(lat: np.ndarray, bits: int, radius: int) -> np.ndarray:
    """Lower bound on distance from a point to outside its ring-R
    neighborhood: (radius) full cell extents in the tighter axis.

    Conservative: uses the point's own latitude for the lon-degree →
    km conversion and the minimum of the lat/lon extents.
    """
    cell_lat_deg = 180.0 / (1 << bits)
    cell_lon_deg = 360.0 / (1 << bits)
    km_per_deg_lat = 111.19492664455873  # 2*pi*R/360
    lat_km = cell_lat_deg * km_per_deg_lat
    lon_km = cell_lon_deg * km_per_deg_lat * np.cos(np.radians(np.abs(lat)))
    return radius * np.minimum(lat_km, lon_km)


def knn_partitioned(
    queries,
    targets,
    k: int,
    bits: int = 6,
    radius: int = 1,
):
    """Exact k nearest targets per query, cell-partitioned.

    queries: Dataset (query_id, lat, lon); targets: Dataset
    (target_id, lat, lon).  Returns Dataset (query_id, neighbor_id,
    rank) — rank 1..k by (distance, target_id).
    """
    import ray
    import ray.data

    def target_rows(t: pa.Table) -> pa.Table:
        lat = t["lat"].to_numpy(zero_copy_only=False)
        lon = t["lon"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "cell": pa.array(cells.grid_cell(lat, lon, bits)),
                "side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
                "id": t["target_id"],
                "lat": t["lat"],
                "lon": t["lon"],
            }
        )

    def query_rows(t: pa.Table) -> pa.Table:
        lat = t["lat"].to_numpy(zero_copy_only=False)
        lon = t["lon"].to_numpy(zero_copy_only=False)
        home = cells.grid_cell(lat, lon, bits)
        neigh = _neighbor_cells(home, bits, radius)  # (n, m)
        m = neigh.shape[1]
        return pa.table(
            {
                "cell": pa.array(neigh.ravel()),
                "side": pa.array(np.zeros(t.num_rows * m, dtype=np.int8)),
                "id": pa.array(np.repeat(t["query_id"].to_numpy(zero_copy_only=False), m)),
                "lat": pa.array(np.repeat(lat, m)),
                "lon": pa.array(np.repeat(lon, m)),
            }
        )

    tset = targets.map_batches(target_rows, batch_format="pyarrow")
    qset = queries.map_batches(query_rows, batch_format="pyarrow")
    unioned = qset.union(tset)

    def local_topk(g: pd.DataFrame) -> pd.DataFrame:
        tmask = g["side"].values == 1
        if not tmask.any() or tmask.all():
            return pd.DataFrame(
                {
                    "query_id": pd.Series([], dtype=np.int64),
                    "neighbor_id": pd.Series([], dtype=np.int64),
                    "dist": pd.Series([], dtype=np.float64),
                }
            )
        tid = g.loc[tmask, "id"].values.astype(np.int64)
        tlat = g.loc[tmask, "lat"].values
        tlon = g.loc[tmask, "lon"].values
        qid = g.loc[~tmask, "id"].values.astype(np.int64)
        qlat = g.loc[~tmask, "lat"].values
        qlon = g.loc[~tmask, "lon"].values
        d = geom.haversine_km(qlat[:, None], qlon[:, None], tlat[None, :], tlon[None, :])
        kk = min(k, d.shape[1])
        order = np.lexsort((np.broadcast_to(tid, d.shape), d), axis=1)[:, :kk]
        return pd.DataFrame(
            {
                "query_id": np.repeat(qid, kk),
                "neighbor_id": tid[order].ravel(),
                "dist": np.take_along_axis(d, order, axis=1).ravel(),
                "qlat": np.repeat(qlat, kk),
            }
        )

    local = unioned.groupby("cell").map_groups(local_topk, batch_format="pandas")

    # global merge per query, fully VECTORIZED (one lexsort over all
    # candidate rows instead of one Python call per query — a query
    # holds at most (2R+1)^2 * k candidates, so the candidate set is
    # O(queries * ring * k) small rows).  Collected via streaming
    # iter_batches; for query counts beyond driver memory, run this
    # same segment logic inside map_batches over a sort("query_id").
    cand_batches = [
        b
        for b in local.iter_batches(batch_size=None, batch_format="pandas")
        if len(b)
    ]
    mpd = (
        pd.concat(cand_batches, ignore_index=True)
        if cand_batches
        else pd.DataFrame({"query_id": [], "neighbor_id": [], "dist": [], "qlat": []})
    )
    qpd_all = queries.to_pandas()
    qpd_all["query_id"] = qpd_all["query_id"].astype(np.int64)
    if len(mpd) == 0:
        mpd = pd.DataFrame(
            {"query_id": pd.Series([], dtype=np.int64),
             "neighbor_id": pd.Series([], dtype=np.int64),
             "dist": pd.Series([], dtype=np.float64),
             "qlat": pd.Series([], dtype=np.float64)}
        )
        return _brute_force_all(qpd_all, targets, k)
    # sort by (query, dist, neighbor); drop duplicate (query, neighbor)
    order = np.lexsort(
        (
            mpd["neighbor_id"].values,
            mpd["dist"].values,
            mpd["query_id"].values,
        )
    )
    mpd = mpd.iloc[order].reset_index(drop=True)
    dup = (mpd["query_id"].values[1:] == mpd["query_id"].values[:-1]) & (
        mpd["neighbor_id"].values[1:] == mpd["neighbor_id"].values[:-1]
    )
    keep = np.concatenate(([True], ~dup))
    mpd = mpd[keep].reset_index(drop=True)
    # rank within query segment
    qv = mpd["query_id"].values
    seg_start = np.concatenate(([True], qv[1:] != qv[:-1]))
    seg_idx = np.cumsum(seg_start) - 1
    pos_in_seg = np.arange(len(mpd)) - np.maximum.accumulate(
        np.where(seg_start, np.arange(len(mpd)), 0)
    )
    mpd["rank"] = (pos_in_seg + 1).astype(np.int64)
    # per-query found-count and kth distance (vectorized segment stats)
    found = np.bincount(seg_idx, minlength=seg_idx[-1] + 1 if len(seg_idx) else 0)
    topk_mask = mpd["rank"].values <= k
    kth_rank = np.minimum(found, k)
    seg_first = np.flatnonzero(seg_start)
    kth_row = seg_first + kth_rank - 1
    kth_dist = mpd["dist"].values[kth_row]
    edge = _ring_edge_km(mpd["qlat"].values[seg_first], bits, radius)
    seg_exact = (found >= k) & (kth_dist <= edge)

    qpd = queries.to_pandas()
    qpd["query_id"] = qpd["query_id"].astype(np.int64)
    exact_qids = qv[seg_first][seg_exact]
    answered_exact = set(int(x) for x in exact_qids)
    fallback_q = set(qpd["query_id"]) - answered_exact

    row_exact = np.repeat(seg_exact, found)
    frames = [
        mpd.loc[row_exact & topk_mask, ["query_id", "neighbor_id", "rank"]].astype(
            {"query_id": np.int64, "neighbor_id": np.int64}
        )
    ]
    if fallback_q:
        # exact fallback: the affected queries against the full target set
        tpd = targets.to_pandas()
        tid = tpd["target_id"].values.astype(np.int64)
        tlat = tpd["lat"].values
        tlon = tpd["lon"].values
        fq = qpd[qpd["query_id"].isin(fallback_q)]
        d = geom.haversine_km(
            fq["lat"].values[:, None], fq["lon"].values[:, None],
            tlat[None, :], tlon[None, :],
        )
        kk = min(k, d.shape[1])
        order = np.lexsort((np.broadcast_to(tid, d.shape), d), axis=1)[:, :kk]
        frames.append(
            pd.DataFrame(
                {
                    "query_id": np.repeat(fq["query_id"].values.astype(np.int64), kk),
                    "neighbor_id": tid[order].ravel(),
                    "rank": np.tile(np.arange(1, kk + 1, dtype=np.int64), len(fq)),
                }
            )
        )

    out = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
        {"query_id": [], "neighbor_id": [], "rank": []}
    )
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return ray.data.from_pandas(out)


def _brute_force_all(qpd, targets, k: int):
    """Exact brute force for every query (degenerate-input path)."""
    import ray.data

    tpd = targets.to_pandas()
    if len(tpd) == 0 or len(qpd) == 0:
        return ray.data.from_pandas(
            pd.DataFrame(
                {"query_id": pd.Series([], dtype=np.int64),
                 "neighbor_id": pd.Series([], dtype=np.int64),
                 "rank": pd.Series([], dtype=np.int64)}
            )
        )
    tid = tpd["target_id"].values.astype(np.int64)
    d = geom.haversine_km(
        qpd["lat"].values[:, None], qpd["lon"].values[:, None],
        tpd["lat"].values[None, :], tpd["lon"].values[None, :],
    )
    kk = min(k, d.shape[1])
    order = np.lexsort((np.broadcast_to(tid, d.shape), d), axis=1)[:, :kk]
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "query_id": np.repeat(qpd["query_id"].values.astype(np.int64), kk),
                "neighbor_id": tid[order].ravel(),
                "rank": np.tile(np.arange(1, kk + 1, dtype=np.int64), len(qpd)),
            }
        ).sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
