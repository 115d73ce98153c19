"""Partitioned spatial kNN — the large-large path (no broadcast side).

Algorithm (SURVEY.md §2.2 "kNN via cell-ring expansion"), fully
distributed and density-adaptive.  The key inversion vs the textbook
plan: TARGETS replicate into their radius-R cell neighborhood and
QUERIES stay in their home cell, so every query meets its entire ring
candidate set inside ONE bucket and resolves there — one all-to-all
exchange per round, k output rows per resolved query, and NO global
candidate sort / edge-repair pass at all (replicating queries instead
costs an O(queries * ring * k) multi-key sort, which measured as the
dominant stage).

Per round (grid level ``bits``, radius R):

1. Targets key by every cell within R of their own cell (m=(2R+1)^2
   rows each; R=0 -> 1 row); queries key by home cell; both sides
   co-partition on hash(cell) % B (B buckets, NOT one group per cell
   — the per-group-Python trap).
2. In-bucket kernel: targets sort by (cell, id); each query's run =
   its home cell's (replicated) targets = its whole ring.  Ranking
   runs on squared unit-sphere CHORD lengths (monotonic in
   great-circle distance, 8 flops/pair, no transcendentals — measured
   ~20x over per-pair haversine here), selected with count-class
   batched argsort matrices (no giant lexsort); only the k kept rows
   pay the asin to km.
3. **Exactness**: a query is done when found >= k and its k-th
   distance <= its POSITION-AWARE lower bound on the distance to
   anything outside the ring (actual offsets to the four ring
   boundaries; lon boundary via the exact point-to-meridian distance
   Re*asin(sin(min(dlon,90deg))*cos(lat)); boundaries clipped at the
   poles / full wrap drop out).  Ties break by target id (stable
   argsort over (cell,id)-sorted runs) — output equals ranking by
   (haversine_km, target_id), fully deterministic.
4. **Ladder**: round (bits, R=0) resolves the density-matched bulk
   with zero replication; (bits, R=1) catches cell-boundary queries;
   then (bits-2, R=2), (bits-4, R=2), ... — the edge bound grows ~4x
   per rung so sparse-region queries resolve before cluster-dumping
   levels, and only still-unresolved queries re-enter each round.
5. **Distributed brute force** finishes the (by now tiny) remainder:
   unresolved queries go to the object store once, every target block
   computes a local top-k (BLAS matmul on unit vectors), and a
   sorted-segment merge with block-boundary edge repair completes —
   no driver-side target materialization, ever.

The only driver-side rows in the whole operator are the final
brute-force remainder (O(stragglers)) and its per-block edge records
(O(blocks * k)).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import cells
from ..functions.geom import EARTH_RADIUS_KM, chord2_to_km, unit_xyz
from ..functions.hashing import splitmix64 as _smx

_KM_PER_DEG = 2.0 * np.pi * EARTH_RADIUS_KM / 360.0
_PAIR_CHUNK = 2_000_000  # max gathered pair cells per matrix chunk (sized so the ~6 per-chunk temps stay ~16 MB each: big enough for dense BLAS-ish kernels, small enough that a hypervisor page-fault window cannot multiply 100s of MB of fresh temps per iteration; see CLAUDE.md rules 13/17/21)
_MIN_BITS = 3  # below this, finish with the distributed brute force

def _neighbor_cells(cell: np.ndarray, bits: int, radius: int) -> np.ndarray:
    """(n, (2R+1)^2) radius-R cell neighborhood — lat rows clamp at the
    poles, lon columns wrap (delegates to :func:`cells.grid_neighbors`;
    kept as a named seam so tests can cross-validate the replication
    geometry against the cell-index API)."""
    return cells.grid_neighbors(cell, bits, radius)


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

_CAND_COLS = ["query_id", "neighbor_id", "dist", "qlat", "qlon"]


# ---------------------------------------------------------------------------
# geometry bounds
# ---------------------------------------------------------------------------


def _lon_edge_km(dlon_deg: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """Min great-circle distance from a point at ``lat`` to the
    meridian at lon offset ``dlon_deg`` — exact for offsets <= 90 deg,
    and the pole distance (the binding case) beyond."""
    dl = np.minimum(np.radians(np.maximum(dlon_deg, 0.0)), np.pi / 2.0)
    return EARTH_RADIUS_KM * np.arcsin(np.sin(dl) * np.cos(np.radians(np.abs(lat))))


def _ring_edge_km_pos(
    lat: np.ndarray, lon: np.ndarray, qcell: np.ndarray, bits: int, radius: int
) -> np.ndarray:
    """Per-query lower bound on the distance to anything OUTSIDE its
    radius-R cell neighborhood, from the query's ACTUAL offsets to the
    four ring boundaries (tighter than a whole-cell-extent bound).

    row/col are decoded from ``qcell`` — the EXACT cell the bucket was
    partitioned on — rather than recomputed from floor math, so the
    bound can never drift from the partitioning cell by one cell (the
    unsafe direction: an overestimated bound would mark inexact results
    exact).

    Boundaries that don't exist drop out: a ring clipped at a pole has
    no lat boundary on that side; a ring covering every column has no
    lon boundary."""
    n = 1 << bits
    cl_lat = 180.0 / n
    cl_lon = 360.0 / n
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    qcell = np.asarray(qcell, dtype=np.uint64)
    row = (qcell >> np.uint64(32)).astype(np.float64)
    col = (qcell & np.uint64(0xFFFFFFFF)).astype(np.float64)
    inf = np.inf
    # lat boundaries (clipped rings reach the pole -> no boundary)
    lat_lo = (row - radius) * cl_lat - 90.0
    lat_hi = (row + radius + 1) * cl_lat - 90.0
    d_south = np.where(row - radius <= 0, inf, np.maximum(lat - lat_lo, 0.0))
    d_north = np.where(row + radius >= n - 1, inf, np.maximum(lat_hi - lat, 0.0))
    lat_km = np.minimum(d_south, d_north) * _KM_PER_DEG
    if 2 * radius + 1 >= n:
        return lat_km  # every column covered: no lon boundary
    lon_lo = (col - radius) * cl_lon - 180.0  # may extend past +-180 (wraps)
    lon_hi = (col + radius + 1) * cl_lon - 180.0
    d_west = np.maximum(lon - lon_lo, 0.0)
    d_east = np.maximum(lon_hi - lon, 0.0)
    lon_km = _lon_edge_km(np.minimum(d_west, d_east), lat)
    return np.minimum(lat_km, lon_km)


# ---------------------------------------------------------------------------
# count-class batched top-k over target runs (the hot kernel)
# ---------------------------------------------------------------------------


def _class_topk_iter(starts, counts, pq, txyz, qxyz, k: int):
    """Iterate per-run top-k for probe rows ``pq`` whose target run is
    (starts[i], counts[i]) into the (cell,id)-sorted target arrays.

    Yields (probe_rows, found, topk_idx (m, ks), topk_c2 (m, ks)) —
    one chunk per (count class, row chunk), every step a dense
    vectorized matrix op.  Stable argsort preserves the within-run
    ascending target-id order for exact chord ties."""
    tx, ty, tz = txyz
    qx, qy, qz = qxyz
    for c in np.unique(counts):
        c = int(c)
        sel = np.flatnonzero(counts == c)
        rows_per = max(1, _PAIR_CHUNK // c)
        for off in range(0, len(sel), rows_per):
            sub = sel[off : off + rows_per]
            ss = starts[sub]
            qq = pq[sub]
            idx = ss[:, None] + np.arange(c, dtype=np.int64)[None, :]
            c2 = (
                (qx[qq][:, None] - tx[idx]) ** 2
                + (qy[qq][:, None] - ty[idx]) ** 2
                + (qz[qq][:, None] - tz[idx]) ** 2
            )
            ks = min(k, c)
            order = np.argsort(c2, axis=1, kind="stable")[:, :ks]
            yield (
                qq,
                np.full(len(qq), c, dtype=np.int64),
                np.take_along_axis(idx, order, axis=1),
                np.take_along_axis(c2, order, axis=1),
            )


# ---------------------------------------------------------------------------
# one resolve round (radius-R target replication, in-bucket resolution)
# ---------------------------------------------------------------------------


def _resolve_round(qds, targets, k: int, bits: int, radius: int,
                   n_buckets: int = 64, needed_ref=None):
    """One distributed round: targets replicate to their radius-R cell
    neighborhood, queries key by home cell, and every query resolves
    (or emits an unresolved marker) inside its bucket.  Returns a
    MATERIALIZED Dataset of _OUT_SCHEMA rows (statuses 1/2 only) —
    O(queries * k), never the input size.

    ``needed_ref``: optional ``ray.ObjectRef`` to a SORTED uint64 array
    of the pending queries' home cells — a broadcast semi-join filter
    (same pattern as the Bloom prefilter in functions/hashing.py): a
    target replica whose ring cell holds no pending query is dropped
    before the shuffle, so late rungs (few stragglers, wide rings) ship
    only matched rows instead of every target * (2R+1)^2."""
    import ray

    nb = np.uint64(n_buckets)
    m = (2 * radius + 1) ** 2

    def target_rows(t: pa.Table) -> pa.Table:
        lat = t["lat"].to_numpy(zero_copy_only=False)
        lon = t["lon"].to_numpy(zero_copy_only=False)
        cell = cells.grid_cell(lat, lon, bits)
        if radius == 0:
            flat = cell
            reps = 1
        else:
            flat = _neighbor_cells(cell, bits, radius).reshape(-1)
            reps = m
        tid = np.repeat(
            t["target_id"].to_numpy(zero_copy_only=False).astype(np.int64), reps
        )
        tlat = np.repeat(lat, reps)
        tlon = np.repeat(lon, reps)
        if needed_ref is not None:
            needed = ray.get(needed_ref)  # cached per-worker by Ray
            if len(needed) == 0:
                keep = np.zeros(len(flat), dtype=bool)
            else:
                pos = np.minimum(np.searchsorted(needed, flat), len(needed) - 1)
                keep = needed[pos] == flat
            flat, tid = flat[keep], tid[keep]
            tlat, tlon = tlat[keep], tlon[keep]
        return pa.table(
            {
                "bucket": pa.array((_smx(flat) % nb).astype(np.int64)),
                "cell": pa.array(flat),
                "side": pa.array(np.ones(len(flat), dtype=np.int8)),
                "id": pa.array(tid),
                "lat": pa.array(tlat),
                "lon": pa.array(tlon),
            }
        )

    def query_rows(t: pa.Table) -> pa.Table:
        lat = t["lat"].to_numpy(zero_copy_only=False)
        lon = t["lon"].to_numpy(zero_copy_only=False)
        cell = cells.grid_cell(lat, lon, bits)
        return pa.table(
            {
                "bucket": pa.array((_smx(cell) % nb).astype(np.int64)),
                "cell": pa.array(cell),
                "side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
                "id": pa.array(
                    t["query_id"].to_numpy(zero_copy_only=False).astype(np.int64)
                ),
                "lat": t["lat"],
                "lon": t["lon"],
            }
        )

    tset = targets.map_batches(target_rows, batch_format="pyarrow")
    qset = qds.map_batches(query_rows, batch_format="pyarrow")
    unioned = qset.union(tset)

    def resolve_bucket(g: pa.Table) -> pa.Table:
        # pyarrow group format: scalar columns come out as zero-ish-copy
        # numpy views instead of a full pandas conversion per bucket
        side = g["side"].to_numpy(zero_copy_only=False)
        cellv = g["cell"].to_numpy(zero_copy_only=False).astype(np.uint64)
        idv = g["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        latv = g["lat"].to_numpy(zero_copy_only=False)
        lonv = g["lon"].to_numpy(zero_copy_only=False)
        tmask = side == 1
        qmask = ~tmask
        nq = int(qmask.sum())
        if nq == 0:
            return _OUT_SCHEMA.empty_table()
        qcell = cellv[qmask]
        qid = idv[qmask]
        qlat = latv[qmask]
        qlon = lonv[qmask]
        pieces = []
        resolved = np.zeros(nq, dtype=bool)
        if tmask.any():
            tcell = cellv[tmask]
            tid = idv[tmask]
            tlat = latv[tmask]
            tlon = lonv[tmask]
            order = np.lexsort((tid, tcell))  # ascending id within cell
            tcell, tid = tcell[order], tid[order]
            tlat, tlon = tlat[order], tlon[order]
            # pole-clipped neighborhoods can replicate a target into the
            # same cell twice: drop exact (cell, id) duplicates
            dup = np.zeros(len(tcell), dtype=bool)
            dup[1:] = (tcell[1:] == tcell[:-1]) & (tid[1:] == tid[:-1])
            if dup.any():
                keep = ~dup
                tcell, tid = tcell[keep], tid[keep]
                tlat, tlon = tlat[keep], tlon[keep]
            ucells, ustart = np.unique(tcell, return_index=True)
            uend = np.concatenate((ustart[1:], [len(tcell)]))
            loc = np.searchsorted(ucells, qcell)
            loc_c = np.clip(loc, 0, max(len(ucells) - 1, 0))
            valid = (
                (ucells[loc_c] == qcell) if len(ucells) else np.zeros(nq, bool)
            )
            vq = np.flatnonzero(valid)
            if len(vq):
                starts = ustart[loc_c[vq]]
                counts = uend[loc_c[vq]] - starts
                bound = _ring_edge_km_pos(qlat, qlon, qcell, bits, radius)
                qxyz = unit_xyz(qlat, qlon)
                txyz = unit_xyz(tlat, tlon)
                for qq, found, idx, c2 in _class_topk_iter(
                    starts, counts, vq, txyz, qxyz, k
                ):
                    ks = idx.shape[1]
                    kth_km = chord2_to_km(c2[:, ks - 1])
                    exact = (found >= k) & (kth_km <= bound[qq])
                    resolved[qq[exact]] = True
                    nvr = int(exact.sum())
                    if nvr:
                        pieces.append(
                            (
                                np.repeat(qid[qq[exact]], ks),
                                tid[idx[exact]].ravel(),
                                np.tile(
                                    np.arange(1, ks + 1, dtype=np.int64), nvr
                                ),
                                np.zeros(nvr * ks),
                                np.zeros(nvr * ks),
                                np.ones(nvr * ks, dtype=np.int8),
                            )
                        )
        un = ~resolved
        if un.any():
            nu = int(un.sum())
            pieces.append(
                (
                    qid[un],
                    np.full(nu, -1, dtype=np.int64),
                    np.zeros(nu, dtype=np.int64),
                    qlat[un],
                    qlon[un],
                    np.full(nu, 2, dtype=np.int8),
                )
            )
        if not pieces:
            return _OUT_SCHEMA.empty_table()
        cols = [np.concatenate(c) for c in zip(*pieces)]
        return pa.table(
            {
                "query_id": pa.array(cols[0].astype(np.int64)),
                "neighbor_id": pa.array(cols[1].astype(np.int64)),
                "rank": pa.array(cols[2].astype(np.int64)),
                "dist": pa.array(np.zeros(len(cols[0]))),
                "qlat": pa.array(cols[3].astype(np.float64)),
                "qlon": pa.array(cols[4].astype(np.float64)),
                "status": pa.array(cols[5]),
            }
        )

    return (
        unioned.groupby("bucket")
        .map_groups(resolve_bucket, batch_format="pyarrow")
        .materialize()
    )


# ---------------------------------------------------------------------------
# final distributed brute force (tiny unresolved remainder) + its merge
# ---------------------------------------------------------------------------


def _resolve_segments(qv, nv, dv, k):
    """Vectorized per-query-segment top-k over brute-force candidate
    rows (any order; full coverage, so every segment is exact).
    Returns a finals arrow table."""
    if len(qv) == 0:
        return _FINAL_SCHEMA.empty_table()
    order = np.lexsort((nv, dv, qv))
    qv, nv = qv[order], nv[order]
    seg_start = np.empty(len(qv), dtype=bool)
    seg_start[0] = True
    seg_start[1:] = qv[1:] != qv[:-1]
    seg_first = np.maximum.accumulate(
        np.where(seg_start, np.arange(len(qv)), 0)
    )
    rank = np.arange(len(qv)) - seg_first + 1
    keep = rank <= k
    return pa.table(
        {
            "query_id": pa.array(qv[keep], type=pa.int64()),
            "neighbor_id": pa.array(nv[keep], type=pa.int64()),
            "rank": pa.array(rank[keep], type=pa.int64()),
        }
    )


def _brute_round(q_table: pa.Table, targets, k: int):
    """Queries broadcast via the object store once; each target block
    computes its local per-query top-k with a BLAS matmul on unit
    vectors; a sorted-segment merge (block-boundary segments shipped
    as tiny edge records and repaired driver-side) finishes — no
    driver-side target materialization."""
    import ray

    from ..stages.broadcast import with_broadcast

    qid = q_table["query_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    qlat = q_table["qlat"].to_numpy(zero_copy_only=False)
    qlon = q_table["qlon"].to_numpy(zero_copy_only=False)
    qx, qy, qz = unit_xyz(qlat, qlon)
    Q = np.stack([qx, qy, qz], axis=1)
    ref = ray.put((qid, Q))

    def local_topk(state, t: pa.Table) -> pa.Table:
        qid, Q = state
        tid = t["target_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nq, nt = len(qid), len(tid)
        if nq == 0 or nt == 0:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "neighbor_id": pa.array([], type=pa.int64()),
                    "dist": pa.array([], type=pa.float64()),
                }
            )
        t_order = np.argsort(tid, kind="stable")  # id order for ties
        tid = tid[t_order]
        tx, ty, tz = unit_xyz(
            t["lat"].to_numpy(zero_copy_only=False)[t_order],
            t["lon"].to_numpy(zero_copy_only=False)[t_order],
        )
        T = np.stack([tx, ty, tz], axis=0)  # (3, nt)
        step = max(1, _PAIR_CHUNK // max(nt, 1))
        kk = min(k, nt)
        parts = []
        for s in range(0, nq, step):
            e = min(s + step, nq)
            c2 = 2.0 - 2.0 * (Q[s:e] @ T)  # (m, nt), monotonic in dist
            order = np.argsort(c2, axis=1, kind="stable")[:, :kk]
            parts.append(
                pd.DataFrame(
                    {
                        "query_id": np.repeat(qid[s:e], kk),
                        "neighbor_id": tid[order].ravel(),
                        "dist": chord2_to_km(
                            np.take_along_axis(c2, order, axis=1)
                        ).ravel(),
                    }
                )
            )
        return pa.Table.from_pandas(pd.concat(parts, ignore_index=True))

    cand = targets.map_batches(
        with_broadcast(ref, local_topk, "brute_knn"), batch_format="pyarrow"
    )
    srt = cand.sort(["query_id", "dist", "neighbor_id"])

    def segment_stage(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [
                    ("query_id", pa.int64()),
                    ("neighbor_id", pa.int64()),
                    ("rank", pa.int64()),
                    ("dist", pa.float64()),
                    ("edge", pa.int8()),
                ]
            ).empty_table()
        qv = t["query_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nv = t["neighbor_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        dv = t["dist"].to_numpy(zero_copy_only=False)
        edge_mask = (qv == qv[0]) | (qv == qv[-1])
        fin = _resolve_segments(qv[~edge_mask], nv[~edge_mask], dv[~edge_mask], k)
        nf = fin.num_rows
        ne = int(edge_mask.sum())
        return pa.table(
            {
                "query_id": pa.concat_arrays(
                    [fin["query_id"].combine_chunks(), pa.array(qv[edge_mask])]
                ),
                "neighbor_id": pa.concat_arrays(
                    [fin["neighbor_id"].combine_chunks(), pa.array(nv[edge_mask])]
                ),
                "rank": pa.concat_arrays(
                    [
                        fin["rank"].combine_chunks(),
                        pa.array(np.zeros(ne, dtype=np.int64)),
                    ]
                ),
                "dist": pa.concat_arrays(
                    [pa.array(np.zeros(nf)), pa.array(dv[edge_mask])]
                ),
                "edge": pa.concat_arrays(
                    [
                        pa.array(np.zeros(nf, dtype=np.int8)),
                        pa.array(np.ones(ne, dtype=np.int8)),
                    ]
                ),
            }
        )

    out = srt.map_batches(
        segment_stage, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).materialize()
    return out


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


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
    distributed and density-adaptive (see module docstring).

    queries: Dataset (query_id, lat, lon); targets: Dataset
    (target_id, lat, lon).  Returns Dataset (query_id, neighbor_id,
    rank) — rank 1..k by (distance, target_id).  ``bits`` sets the
    starting grid level (match cell size to the DENSEST regions);
    ``radius`` the first ring radius.
    """
    import ray.data

    final_parts = []
    qds = queries
    # ladder: (bits, 0) -> (bits, radius) -> (bits-2, 2) -> (bits-4, 2) ...
    rungs = [(bits, 0), (bits, max(radius, 1))]
    b = bits - 2
    while b >= _MIN_BITS:
        rungs.append((b, 2))
        b -= 2

    pending = True
    needed_ref = None
    for rb, rr in rungs:
        out = _resolve_round(qds, targets, k, rb, rr, needed_ref=needed_ref)
        final_parts.append(
            _filter_status(out, 1, ["query_id", "neighbor_id", "rank"])
        )
        markers = _filter_status(out, 2, ["query_id", "qlat", "qlon"])
        n_pending = markers.count()
        if n_pending == 0:
            pending = False
            break

        def to_query(t: pa.Table) -> pa.Table:
            return pa.table(
                {"query_id": t["query_id"], "lat": t["qlat"], "lon": t["qlon"]}
            )

        qds = markers.map_batches(to_query, batch_format="pyarrow")
        # Semi-join prefilter for the NEXT rung: collect the pending
        # queries' distinct home cells (per-batch unique -> driver
        # unique; O(distinct cells), bounded by both n_pending and
        # 4^bits — broadcast metadata, like a Bloom build) and ship the
        # sorted set once via the object store.  Guarded by a size cap
        # so the broadcast never exceeds ~16 MB.
        nxt = next(
            (r for r in rungs[rungs.index((rb, rr)) + 1 :]), None
        )
        needed_ref = None
        if nxt is not None and n_pending <= 2_000_000:
            nb_bits = nxt[0]

            def cell_uniq(t: pa.Table) -> pa.Table:
                c = cells.grid_cell(
                    t["lat"].to_numpy(zero_copy_only=False),
                    t["lon"].to_numpy(zero_copy_only=False),
                    nb_bits,
                )
                return pa.table({"cell": pa.array(np.unique(c))})

            parts = [
                b["cell"].to_numpy(zero_copy_only=False)
                for b in qds.map_batches(
                    cell_uniq, batch_format="pyarrow"
                ).iter_batches(batch_format="pyarrow")
            ]
            needed = (
                np.unique(np.concatenate(parts))
                if parts
                else np.array([], dtype=np.uint64)
            )
            needed_ref = ray.put(needed)

    if pending:
        # tiny remainder -> distributed brute force (the marker set
        # transits the driver once to enter the object store)
        qt = pa.Table.from_pylist(markers.take_all())
        if qt.num_rows:
            bout = _brute_round(qt, targets, k)

            def non_edge(t: pa.Table) -> pa.Table:
                return t.filter(pc.equal(t["edge"], 0)).select(
                    ["query_id", "neighbor_id", "rank"]
                )

            final_parts.append(bout.map_batches(non_edge, batch_format="pyarrow"))

            def edge_rows(t: pa.Table) -> pa.Table:
                return t.filter(pc.equal(t["edge"], 1)).select(
                    ["query_id", "neighbor_id", "dist"]
                )

            er = bout.map_batches(edge_rows, batch_format="pyarrow").take_all()
            if er:
                et = pa.Table.from_pylist(er)
                efin = _resolve_segments(
                    et["query_id"].to_numpy(zero_copy_only=False).astype(np.int64),
                    et["neighbor_id"].to_numpy(zero_copy_only=False).astype(np.int64),
                    et["dist"].to_numpy(zero_copy_only=False),
                    k,
                )
                if efin.num_rows:
                    final_parts.append(ray.data.from_arrow(efin))

    result = final_parts[0]
    for p in final_parts[1:]:
        result = result.union(p)
    # The per-rung groupby outputs leave the union in hundreds of tiny
    # blocks, and Ray's sample-based sort degrades superlinearly with
    # block COUNT (measured 63 s vs 4 s for the same 5M rows at 896 vs
    # 64 blocks).  Coalesce to ~250k-row blocks (floor = CPU count)
    # before the final presentation sort; scales with output size.
    merged = result.materialize()
    n_blocks = int(np.clip(merged.count() // 250_000 + 1, 32, 1024))
    if merged.num_blocks() > 2 * n_blocks:
        merged = merged.repartition(n_blocks)
    return merged.sort(["query_id", "rank"])
