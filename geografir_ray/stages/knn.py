"""Partitioned spatial kNN — the large-large path (no broadcast side).

Algorithm (SURVEY.md §2.2 "kNN via cell-ring expansion"):

1. Targets are assigned to grid cells at ``bits`` resolution; both
   sides co-partition on ``hash(cell) % n_buckets`` (B buckets, not one
   group per cell — avoids the per-group-Python trap at high cell
   cardinality; the per-bucket probe is a vectorized postings
   expansion, same shape as the PIP probe).
2. Queries emit candidate rows for every cell in their (2R+1)^2
   neighborhood (ring radius R); the home-cell row is flagged so every
   query is guaranteed at least one row in the candidate stream (a
   sentinel with dist=+inf when its home cell holds no targets).
3. Per bucket: vectorized pair expansion (query-cell row -> target run
   of the same cell) + haversine + per-(query,cell) top-k.
4. Global merge is FULLY DISTRIBUTED: sort(["query_id","dist",
   "neighbor_id"]) then vectorized segment logic inside map_batches.
   Segments that touch a block boundary (first/last query of each
   block) are emitted as tiny edge records and repaired in one
   driver-side pass — O(blocks * ring * k) rows, bounded by block
   count, never by dataset size.
5. **Correctness guarantee**: a query's result is provably exact when
   its k-th distance <= a true spherical lower bound on the distance
   to the outside of its ring-R neighborhood (lat term: R full cell
   extents; lon term: Re*asin(sin(min(R*dlon, 90deg))*cos(lat)) — the
   exact point-to-meridian great-circle distance, a valid lower bound
   at every latitude).  Queries that fail the bound (or found < k
   targets) are retried DISTRIBUTED at a doubled ring radius; once the
   ring covers the whole grid the round is exact by construction, so
   the loop always terminates.

All distances in km (haversine); ties broken by target id — fully
deterministic output.  No stage materializes an unbounded dataset on
the driver: the only driver-side rows are the per-block-boundary edge
records.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import cells, geom
from ..functions.hashing import splitmix64 as _smx

_EARTH_R_KM = 6371.0088
_KM_PER_DEG = 111.19492664455873  # 2*pi*R/360

_OUT_SCHEMA = pa.schema(
    [
        ("query_id", pa.int64()),
        ("neighbor_id", pa.int64()),
        ("rank", pa.int64()),
        ("dist", pa.float64()),
        ("qlat", pa.float64()),
        ("qlon", pa.float64()),
        ("status", pa.int8()),  # 0=edge raw, 1=final, 2=unresolved marker
    ]
)

_FINAL_SCHEMA = pa.schema(
    [("query_id", pa.int64()), ("neighbor_id", pa.int64()), ("rank", pa.int64())]
)


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
    """True spherical lower bound on the distance from a point to any
    point OUTSIDE its ring-R cell neighborhood.

    lat term: an outside-by-lat point differs by >= R full cell extents
    in latitude, and great-circle distance >= latitude difference.
    lon term: an outside-by-lon point has wrapped lon offset
    dl >= R*cell_lon (< 180 deg whenever the ring does not cover every
    column); the min distance from (lat, *) to the meridian at offset
    dl is Re*asin(sin(min(dl, 90deg))*cos(lat)) — exact for dl <= 90,
    and for dl > 90 the pole distance 90-|lat| = asin(cos lat) is the
    binding case, which the clamp reproduces.
    """
    n_axis = 1 << bits
    cell_lat_deg = 180.0 / n_axis
    cell_lon_deg = 360.0 / n_axis
    lat_km = radius * cell_lat_deg * _KM_PER_DEG
    if 2 * radius + 1 >= n_axis:
        # every column covered: only the lat boundary exists
        return np.full_like(np.asarray(lat, dtype=np.float64), lat_km)
    dl = np.minimum(np.radians(radius * cell_lon_deg), np.pi / 2.0)
    lon_km = _EARTH_R_KM * np.arcsin(
        np.sin(dl) * np.cos(np.radians(np.abs(lat)))
    )
    return np.minimum(lat_km, lon_km)


def _empty_final() -> pa.Table:
    return _FINAL_SCHEMA.empty_table()


def _resolve_segments(
    qv: np.ndarray,
    nv: np.ndarray,
    dv: np.ndarray,
    qlat: np.ndarray,
    qlon: np.ndarray,
    k: int,
    bits: int,
    radius: int,
    full_cover: bool,
):
    """Vectorized per-query-segment merge over candidate rows.

    Rows may arrive in any order; sentinels are neighbor_id == -1
    (dist=+inf).  Returns (finals pa.Table[query_id, neighbor_id,
    rank], unresolved pa.Table[query_id, qlat, qlon]).
    """
    empty_un = pa.table(
        {
            "query_id": pa.array([], type=pa.int64()),
            "qlat": pa.array([], type=pa.float64()),
            "qlon": pa.array([], type=pa.float64()),
        }
    )
    if len(qv) == 0:
        return _empty_final(), empty_un
    order = np.lexsort((nv, dv, qv))
    qv, nv, dv = qv[order], nv[order], dv[order]
    qlat, qlon = qlat[order], qlon[order]
    # drop duplicate (query, neighbor) pairs (ring clipping at poles
    # can route the same target to a query via two neighborhood slots)
    dup = np.zeros(len(qv), dtype=bool)
    dup[1:] = (qv[1:] == qv[:-1]) & (nv[1:] == nv[:-1])
    qv, nv, dv = qv[~dup], nv[~dup], dv[~dup]
    qlat, qlon = qlat[~dup], qlon[~dup]

    seg_start = np.empty(len(qv), dtype=bool)
    seg_start[0] = True
    seg_start[1:] = qv[1:] != qv[:-1]
    seg_idx = np.cumsum(seg_start) - 1
    n_seg = seg_idx[-1] + 1
    seg_first = np.flatnonzero(seg_start)
    real = nv >= 0  # non-sentinel candidate rows
    found = np.bincount(seg_idx[real], minlength=n_seg)

    # rank within segment (sentinels sort last: dist=+inf)
    pos = np.arange(len(qv)) - seg_first[seg_idx]
    rank = pos + 1

    if full_cover:
        seg_exact = np.ones(n_seg, dtype=bool)
    else:
        kth_rank = np.minimum(found, k)
        kth_row = seg_first + np.maximum(kth_rank - 1, 0)
        kth_dist = dv[kth_row]
        edge = _ring_edge_km(qlat[seg_first], bits, radius)
        seg_exact = (found >= k) & (kth_dist <= edge)

    row_exact = seg_exact[seg_idx]
    keep = row_exact & real & (rank <= k)
    finals = pa.table(
        {
            "query_id": pa.array(qv[keep], type=pa.int64()),
            "neighbor_id": pa.array(nv[keep], type=pa.int64()),
            "rank": pa.array(rank[keep], type=pa.int64()),
        }
    )
    un = ~seg_exact
    unresolved = pa.table(
        {
            "query_id": pa.array(qv[seg_first][un], type=pa.int64()),
            "qlat": pa.array(qlat[seg_first][un], type=pa.float64()),
            "qlon": pa.array(qlon[seg_first][un], type=pa.float64()),
        }
    )
    return finals, unresolved


def _knn_round(qds, targets, k: int, bits: int, radius: int, full_cover: bool,
               n_buckets: int = 64):
    """One distributed ring-expansion round.  Returns a MATERIALIZED
    Dataset with _OUT_SCHEMA rows (finals / unresolved markers / edge
    records).  The materialized size is O(queries * k), never the
    input size."""
    import ray.data

    nb = np.uint64(n_buckets)

    def target_rows(t: pa.Table) -> pa.Table:
        lat = t["lat"].to_numpy(zero_copy_only=False)
        lon = t["lon"].to_numpy(zero_copy_only=False)
        cell = cells.grid_cell(lat, lon, bits)
        return pa.table(
            {
                "bucket": pa.array((_smx(cell) % nb).astype(np.int64)),
                "cell": pa.array(cell),
                "side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
                "home": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
                "id": pc.cast(t["target_id"], pa.int64()),
                "lat": t["lat"],
                "lon": t["lon"],
            }
        )

    m = (2 * radius + 1) ** 2
    home_slot = radius * (2 * radius + 1) + radius  # offset (0,0) in ravel order

    def query_rows(t: pa.Table) -> pa.Table:
        lat = t["lat"].to_numpy(zero_copy_only=False)
        lon = t["lon"].to_numpy(zero_copy_only=False)
        home = cells.grid_cell(lat, lon, bits)
        neigh = _neighbor_cells(home, bits, radius)  # (n, m)
        hflag = np.zeros((t.num_rows, m), dtype=np.int8)
        hflag[:, home_slot] = 1
        flat = neigh.ravel()
        return pa.table(
            {
                "bucket": pa.array((_smx(flat) % nb).astype(np.int64)),
                "cell": pa.array(flat),
                "side": pa.array(np.zeros(t.num_rows * m, dtype=np.int8)),
                "home": pa.array(hflag.ravel()),
                "id": pa.array(
                    np.repeat(
                        t["query_id"].to_numpy(zero_copy_only=False).astype(np.int64), m
                    )
                ),
                "lat": pa.array(np.repeat(lat, m)),
                "lon": pa.array(np.repeat(lon, m)),
            }
        )

    tset = targets.map_batches(target_rows, batch_format="pyarrow")
    qset = qds.map_batches(query_rows, batch_format="pyarrow")
    unioned = qset.union(tset)

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        """Vectorized postings probe (as in the PIP join): sort targets
        by cell, expand (query-cell row x target run) pairs, one
        haversine over all pairs, per-probe-row top-k by lexsort."""
        empty = pd.DataFrame(
            {
                "query_id": pd.Series([], dtype=np.int64),
                "neighbor_id": pd.Series([], dtype=np.int64),
                "dist": pd.Series([], dtype=np.float64),
                "qlat": pd.Series([], dtype=np.float64),
                "qlon": pd.Series([], dtype=np.float64),
            }
        )
        tmask = g["side"].values == 1
        qmask = ~tmask
        if not qmask.any():
            return empty
        qcell = g.loc[qmask, "cell"].values.astype(np.uint64)
        qid = g.loc[qmask, "id"].values.astype(np.int64)
        qlat = g.loc[qmask, "lat"].values
        qlon = g.loc[qmask, "lon"].values
        qhome = g.loc[qmask, "home"].values.astype(np.int8)

        parts = []
        if tmask.any():
            tcell = g.loc[tmask, "cell"].values.astype(np.uint64)
            tid = g.loc[tmask, "id"].values.astype(np.int64)
            tlat = g.loc[tmask, "lat"].values
            tlon = g.loc[tmask, "lon"].values
            t_order = np.argsort(tcell, kind="stable")
            tcell, tid = tcell[t_order], tid[t_order]
            tlat, tlon = tlat[t_order], tlon[t_order]
            ucells, ustart = np.unique(tcell, return_index=True)
            uend = np.concatenate((ustart[1:], [len(tcell)]))
            loc = np.searchsorted(ucells, qcell)
            loc_c = np.clip(loc, 0, max(len(ucells) - 1, 0))
            valid = (ucells[loc_c] == qcell) if len(ucells) else np.zeros(len(qcell), bool)
        else:
            valid = np.zeros(len(qcell), dtype=bool)

        if valid.any():
            vq = np.flatnonzero(valid)
            starts = ustart[loc_c[vq]]
            counts = uend[loc_c[vq]] - starts
            total = int(counts.sum())
            run_pos = np.arange(total, dtype=np.int64) - np.repeat(
                np.cumsum(counts) - counts, counts
            )
            trow = np.repeat(starts, counts) + run_pos
            prow = np.repeat(vq, counts)
            d = geom.haversine_km(qlat[prow], qlon[prow], tlat[trow], tlon[trow])
            # per probe-row top-k: sort by (probe row, dist, target id)
            order = np.lexsort((tid[trow], d, prow))
            ps = prow[order]
            seg_start = np.empty(total, dtype=bool)
            seg_start[0] = True
            seg_start[1:] = ps[1:] != ps[:-1]
            seg_first = np.maximum.accumulate(np.where(seg_start, np.arange(total), 0))
            rank = np.arange(total) - seg_first
            keep = order[rank < k]
            parts.append(
                pd.DataFrame(
                    {
                        "query_id": qid[prow[keep]],
                        "neighbor_id": tid[trow[keep]],
                        "dist": d[keep],
                        "qlat": qlat[prow[keep]],
                        "qlon": qlon[prow[keep]],
                    }
                )
            )
        # sentinel for home-cell probe rows with no targets: guarantees
        # every query appears in the candidate stream
        sent = qhome.astype(bool) & ~valid
        if sent.any():
            ns = int(sent.sum())
            parts.append(
                pd.DataFrame(
                    {
                        "query_id": qid[sent],
                        "neighbor_id": np.full(ns, -1, dtype=np.int64),
                        "dist": np.full(ns, np.inf),
                        "qlat": qlat[sent],
                        "qlon": qlon[sent],
                    }
                )
            )
        if not parts:
            return empty
        out = pd.concat(parts, ignore_index=True)
        return out.astype(
            {"query_id": np.int64, "neighbor_id": np.int64, "dist": np.float64}
        )

    local = unioned.groupby("bucket").map_groups(bucket_topk, batch_format="pandas")
    srt = local.sort(["query_id", "dist", "neighbor_id"])

    def segment_stage(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _OUT_SCHEMA.empty_table()
        qv = t["query_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nv = t["neighbor_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        dv = t["dist"].to_numpy(zero_copy_only=False)
        qa = t["qlat"].to_numpy(zero_copy_only=False)
        qo = t["qlon"].to_numpy(zero_copy_only=False)
        # first/last query of the block may continue in a neighbor
        # block: ship those raw as edge records (status 0)
        edge_mask = (qv == qv[0]) | (qv == qv[-1])
        pieces = []
        fin, unres = _resolve_segments(
            qv[~edge_mask], nv[~edge_mask], dv[~edge_mask],
            qa[~edge_mask], qo[~edge_mask], k, bits, radius, full_cover,
        )
        nf = fin.num_rows
        if nf:
            pieces.append(
                pa.table(
                    {
                        "query_id": fin["query_id"],
                        "neighbor_id": fin["neighbor_id"],
                        "rank": fin["rank"],
                        "dist": pa.array(np.zeros(nf)),
                        "qlat": pa.array(np.zeros(nf)),
                        "qlon": pa.array(np.zeros(nf)),
                        "status": pa.array(np.ones(nf, dtype=np.int8)),
                    },
                    schema=_OUT_SCHEMA,
                )
            )
        nu = unres.num_rows
        if nu:
            pieces.append(
                pa.table(
                    {
                        "query_id": unres["query_id"],
                        "neighbor_id": pa.array(np.full(nu, -1, dtype=np.int64)),
                        "rank": pa.array(np.zeros(nu, dtype=np.int64)),
                        "dist": pa.array(np.zeros(nu)),
                        "qlat": unres["qlat"],
                        "qlon": unres["qlon"],
                        "status": pa.array(np.full(nu, 2, dtype=np.int8)),
                    },
                    schema=_OUT_SCHEMA,
                )
            )
        ne = int(edge_mask.sum())
        if ne:
            pieces.append(
                pa.table(
                    {
                        "query_id": pa.array(qv[edge_mask]),
                        "neighbor_id": pa.array(nv[edge_mask]),
                        "rank": pa.array(np.zeros(ne, dtype=np.int64)),
                        "dist": pa.array(dv[edge_mask]),
                        "qlat": pa.array(qa[edge_mask]),
                        "qlon": pa.array(qo[edge_mask]),
                        "status": pa.array(np.zeros(ne, dtype=np.int8)),
                    },
                    schema=_OUT_SCHEMA,
                )
            )
        if not pieces:
            return _OUT_SCHEMA.empty_table()
        return pa.concat_tables(pieces)

    resolved = srt.map_batches(
        segment_stage, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    return resolved.materialize()


def _filter_status(ds, status: int, cols):
    """Vectorized status filter + projection (stays a Dataset)."""
    def f(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["status"], status)).select(cols)

    return ds.map_batches(f, batch_format="pyarrow")


def knn_partitioned(
    queries,
    targets,
    k: int,
    bits: int = 6,
    radius: int = 1,
):
    """Exact k nearest targets per query, cell-partitioned, fully
    distributed (see module docstring).

    queries: Dataset (query_id, lat, lon); targets: Dataset
    (target_id, lat, lon).  Returns Dataset (query_id, neighbor_id,
    rank) — rank 1..k by (distance, target_id).
    """
    import ray.data

    n_axis = 1 << bits
    final_parts = []
    qds = queries
    r = radius
    while True:
        full_cover = r >= n_axis - 1
        out = _knn_round(qds, targets, k, bits, r, full_cover)
        final_parts.append(
            _filter_status(out, 1, ["query_id", "neighbor_id", "rank"])
        )
        # edge records: bounded by O(sorted blocks * 2 segments * ring*k)
        edge = _filter_status(
            out, 0, ["query_id", "neighbor_id", "dist", "qlat", "qlon"]
        ).take_all()
        retry_tables = []
        if edge:
            et = pa.Table.from_pylist(edge)
            efin, eun = _resolve_segments(
                et["query_id"].to_numpy(zero_copy_only=False).astype(np.int64),
                et["neighbor_id"].to_numpy(zero_copy_only=False).astype(np.int64),
                et["dist"].to_numpy(zero_copy_only=False),
                et["qlat"].to_numpy(zero_copy_only=False),
                et["qlon"].to_numpy(zero_copy_only=False),
                k, bits, r, full_cover,
            )
            if efin.num_rows:
                final_parts.append(ray.data.from_arrow(efin))
            if eun.num_rows:
                retry_tables.append(eun)
        markers = _filter_status(out, 2, ["query_id", "qlat", "qlon"])
        n_markers = markers.count()
        if n_markers == 0 and not retry_tables:
            break
        # distributed retry at a doubled radius: unresolved interior
        # markers stay a Dataset; edge-derived retries are tiny tables
        def to_query(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "query_id": t["query_id"],
                    "lat": t["qlat"],
                    "lon": t["qlon"],
                }
            )

        retry_ds = markers.map_batches(to_query, batch_format="pyarrow")
        if retry_tables:
            extra = ray.data.from_arrow(
                pa.concat_tables(
                    [
                        pa.table(
                            {
                                "query_id": tt["query_id"],
                                "lat": tt["qlat"],
                                "lon": tt["qlon"],
                            }
                        )
                        for tt in retry_tables
                    ]
                )
            )
            retry_ds = retry_ds.union(extra) if n_markers else extra
        qds = retry_ds
        r = min(max(2 * r, r + 1), n_axis - 1)

    result = final_parts[0]
    for p in final_parts[1:]:
        result = result.union(p)
    return result.sort(["query_id", "rank"])
