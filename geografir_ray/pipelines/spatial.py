"""Spatial pipelines: geocode → cells → point-in-polygon joins → kNN →
tile assignment / zonal stats → reprojection.

Points are derived deterministically from integer key columns
(functions/synthgeo.py) so every query has an op-for-op SQL twin; the
polygon side is the diamond-zone set (genuine 4-gon rings for the Ray
machinery, closed-form containment for the oracle).

Shuffle keys (SURVEY.md §7.3): grid cell for PIP co-partitioning, tile
id for zonal aggregation, bare groupby for the final small reductions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import cells, geom, synthgeo
from ..functions.synthgeo import synth_lat_sql, synth_lon_sql, zone_params_sql
from ..sources.tables import read_table, read_table_local
from ..stages import geo as geo_stages
from .common import grouped_sum

N_ZONES = 25
PIP_COVER_BITS = 6  # 5.6°x2.8° cells: diamonds cover ≤ ~20 cells each


def _points_ds(sf_dir: str, table: str, key_col: str, key_expr=None, extra_cols=()):
    """Dataset of (point_id, lat, lon [, extra]) derived from a table."""
    columns = sorted({key_col, *extra_cols})
    ds = read_table(sf_dir, table, columns=columns)

    def derive(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if key_expr is not None:
            k = key_expr(t)
        cols = {
            "point_id": pa.array(k),
            "lat": pa.array(synthgeo.synth_lat(k)),
            "lon": pa.array(synthgeo.synth_lon(k)),
        }
        for c in extra_cols:
            cols[c] = t[c]
        return pa.table(cols)

    return ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Tile assignment + per-tile aggregation (two-phase, skew-safe)
# ---------------------------------------------------------------------------


def tile_assign(sf_dir: str, tile_deg: float = 1.0):
    """lineitem-derived points → 1° tiles → count + quantity per tile.

    Scale design: the hot-center skew concentrates ~70% of points in 12
    clusters; the per-batch combiner (partial_groupby) collapses each
    hot tile to one row per batch before the shuffle, so the all-to-all
    exchange moves O(tiles × batches), not O(rows).
    """
    ds = read_table(
        sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_quantity"]
    )

    def derive(t: pa.Table) -> pa.Table:
        k = (
            t["l_orderkey"].to_numpy(zero_copy_only=False) * 8
            + t["l_linenumber"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        lat = synthgeo.synth_lat(k)
        lon = synthgeo.synth_lon(k)
        tx = np.floor((lon + 180.0) / tile_deg).astype(np.int64)
        ty = np.floor((lat + 90.0) / tile_deg).astype(np.int64)
        qty_c = pc.cast(
            pc.floor(pc.multiply(t["l_quantity"], pa.scalar(100.0))), pa.int64()
        )
        return pa.table(
            {
                "tile_x": pa.array(tx),
                "tile_y": pa.array(ty),
                "qty_c": qty_c,
                "one": pa.array(np.ones(len(k), dtype=np.int64)),
            }
        )

    ds = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
    agg = grouped_sum(
        ds,
        ["tile_x", "tile_y"],
        {"n_points": ("one", "sum"), "sum_qty_c": ("qty_c", "sum")},
        merge="driver",  # bounded keys: <=64800 one-degree tiles
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "tile_x": t["tile_x"],
                "tile_y": t["tile_y"],
                "n_points": t["n_points"],
                "sum_qty": pc.divide(pc.cast(t["sum_qty_c"], pa.float64()), 100.0),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort(["tile_y", "tile_x"])


def tile_assign_sql(tile_deg: float = 1.0) -> str:
    key = "(l_orderkey * 8 + l_linenumber)"
    lat = synth_lat_sql(key)
    lon = synth_lon_sql(key)
    return f"""
SELECT CAST(floor(({lon} + 180.0) / {tile_deg}) AS BIGINT) AS tile_x,
       CAST(floor(({lat} + 90.0) / {tile_deg}) AS BIGINT) AS tile_y,
       count(*) AS n_points,
       sum(CAST(floor(l_quantity * 100.0) AS BIGINT)) / 100.0 AS sum_qty
FROM lineitem
GROUP BY tile_x, tile_y
ORDER BY tile_y, tile_x
"""


def hot_tiles(sf_dir: str, k: int = 20):
    """Top-k hottest tiles: two-phase count then global sort-limit."""
    full = tile_assign(sf_dir)
    return full.select_columns(["tile_x", "tile_y", "n_points"]).sort(["n_points", "tile_y", "tile_x"], descending=[True, False, False]).limit(k)


def hot_tiles_sql(k: int = 20) -> str:
    key = "(l_orderkey * 8 + l_linenumber)"
    lat = synth_lat_sql(key)
    lon = synth_lon_sql(key)
    return f"""
SELECT CAST(floor(({lon} + 180.0) / 1.0) AS BIGINT) AS tile_x,
       CAST(floor(({lat} + 90.0) / 1.0) AS BIGINT) AS tile_y,
       count(*) AS n_points
FROM lineitem
GROUP BY tile_x, tile_y
ORDER BY n_points DESC, tile_y, tile_x
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Point-in-polygon join — partitioned machinery
# (explode zones to covering cells; co-partition both sides on
# hash(cell) % B; vectorized per-bucket postings probe + exact raycast)
# ---------------------------------------------------------------------------


def _zones_table() -> pa.Table:
    zk = np.arange(N_ZONES, dtype=np.int64)
    verts = synthgeo.zone_vertices(zk)  # (n, 4, 2) lon/lat
    return pa.table(
        {
            "zone_id": pa.array(zk),
            "xs": pa.array(list(verts[:, :, 0])),
            "ys": pa.array(list(verts[:, :, 1])),
        }
    )


def pip_join_partitioned(
    points, zones: pa.Table, bits: int = PIP_COVER_BITS, n_buckets: int = 64,
    payload_cols: tuple = (),
):
    """Generic partitioned PIP join — no broadcast assumption.

    points: Dataset with (point_id, lat, lon); zones: Arrow table with
    (zone_id, xs, ys) rings.  Both sides key by grid cell, then
    co-partition on ``hash(cell) % n_buckets`` — B buckets, NOT one
    group per cell: a groupby(cell).map_groups probe pays one Python
    call per cell (the per-group trap), while B buckets make the merge
    fn run once per bucket with a fully vectorized postings probe
    (sorted cell → zone-run lookup + raycast pairs) inside.  Pairs are
    exact: a point meets every zone whose cover includes its cell, in
    exactly one bucket.

    ``payload_cols``: point-side columns carried through the shuffle
    and emitted on matched pairs — the scale-correct way to join fact
    payloads back to the result (one extra column in the same exchange
    instead of a second join or a driver-side broadcast).
    """
    import ray.data

    payload_cols = tuple(payload_cols)
    if payload_cols:
        sch = points.schema()
        base = getattr(sch, "base_schema", sch)
        payload_types = {c: base.field(c).type for c in payload_cols}
    else:
        payload_types = {}

    # zone side: explode to covering cells (driver-side: zone table is a
    # Dataset in the general case; here it is already collected/compact)
    xs = zones["xs"].to_pylist()
    ys = zones["ys"].to_pylist()
    zone_id = zones["zone_id"].to_numpy()
    ring_offsets = np.cumsum([0] + [len(r) for r in xs])
    vertex_xy = np.stack(
        [np.concatenate([np.asarray(r) for r in xs]), np.concatenate([np.asarray(r) for r in ys])],
        axis=1,
    )
    boxes = geom.bbox_of_rings(vertex_xy, ring_offsets)
    poly_idx, cell_ids = geom.cover_bboxes_with_grid(boxes, bits)
    from ..functions.hashing import splitmix64 as _smx

    zbucket = (_smx(cell_ids) % np.uint64(n_buckets)).astype(np.int64)
    zcols = {
        "bucket": pa.array(zbucket),
        "cell": pa.array(cell_ids),
        "side": pa.array(np.ones(len(poly_idx), dtype=np.int8)),
        "id": pa.array(zone_id[poly_idx]),
        "lon": pa.array(np.full(len(poly_idx), np.nan)),
        "lat": pa.array(np.full(len(poly_idx), np.nan)),
        "xs": pa.array([xs[p] for p in poly_idx]),
        "ys": pa.array([ys[p] for p in poly_idx]),
    }
    for c, typ in payload_types.items():
        zcols[c] = pa.nulls(len(poly_idx), type=typ)
    zones_ds = ray.data.from_arrow(pa.table(zcols))

    def point_rows(t: pa.Table) -> pa.Table:
        lat = t["lat"].to_numpy(zero_copy_only=False)
        lon = t["lon"].to_numpy(zero_copy_only=False)
        cell = cells.grid_cell(lat, lon, bits)
        n = len(lat)
        cols = {
            "bucket": pa.array((_smx(cell) % np.uint64(n_buckets)).astype(np.int64)),
            "cell": pa.array(cell),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "id": t["point_id"],
            "lon": t["lon"],
            "lat": t["lat"],
            "xs": pa.array([None] * n, type=pa.list_(pa.float64())),
            "ys": pa.array([None] * n, type=pa.list_(pa.float64())),
        }
        for c in payload_cols:
            cols[c] = t[c]
        return pa.table(cols)

    pts = points.map_batches(point_rows, batch_format="pyarrow", zero_copy_batch=True)
    unioned = pts.union(zones_ds)

    def _empty_pairs() -> pa.Table:
        fields = [("point_id", pa.int64()), ("zone_id", pa.int64())]
        fields += [(c, typ) for c, typ in payload_types.items()]
        return pa.schema(fields).empty_table()

    def probe(g: pa.Table) -> pa.Table:
        # pyarrow group format on purpose: a pandas group would
        # materialize a Python list object PER ROW for the (all-null on
        # the point side) xs/ys ring columns — measured as the dominant
        # cost at 4M points.  Here only the few zone rows ever touch
        # Python; point columns stay numpy.
        side = g["side"].to_numpy(zero_copy_only=False)
        zmask = side == 1
        if not zmask.any() or zmask.all():
            return _empty_pairs()
        cellv = g["cell"].to_numpy(zero_copy_only=False).astype(np.uint64)
        idv = g["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        zrows = np.flatnonzero(zmask)
        # bucket-local postings: (cell -> zone rows), probed vectorized
        zcell = cellv[zrows]
        zid = idv[zrows]
        ztab = g.select(["xs", "ys"]).take(pa.array(zrows))
        zxs = [np.asarray(r) for r in ztab["xs"].to_pylist()]
        zys = [np.asarray(r) for r in ztab["ys"].to_pylist()]
        order = np.argsort(zcell, kind="stable")
        zcell, zid = zcell[order], zid[order]
        zxs = [zxs[i] for i in order]
        zys = [zys[i] for i in order]
        offs = np.cumsum([0] + [len(r) for r in zxs])
        vxy = np.stack([np.concatenate(zxs), np.concatenate(zys)], axis=1)
        ucells, ustart = np.unique(zcell, return_index=True)
        uend = np.concatenate((ustart[1:], [len(zcell)]))

        pmask = ~zmask
        px = g["lon"].to_numpy(zero_copy_only=False)[pmask]
        py = g["lat"].to_numpy(zero_copy_only=False)[pmask]
        pid = idv[pmask]
        pcell = cellv[pmask]
        loc = np.searchsorted(ucells, pcell)
        loc_c = np.clip(loc, 0, max(len(ucells) - 1, 0))
        valid = ucells[loc_c] == pcell
        vpt = np.flatnonzero(valid)
        starts = ustart[loc_c[vpt]]
        counts = uend[loc_c[vpt]] - starts
        total = int(counts.sum())
        if total == 0:
            return _empty_pairs()
        run_pos = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        zrow = np.repeat(starts, counts) + run_pos  # candidate zone row
        prow = np.repeat(vpt, counts)  # candidate point row
        ok = geom.points_in_polygons_pairs(px[prow], py[prow], zrow, vxy, offs)
        out = {
            "point_id": pa.array(pid[prow[ok]]),
            "zone_id": pa.array(zid[zrow[ok]]),
        }
        if payload_cols:
            pt_idx = np.flatnonzero(pmask)[prow[ok]]
            for c in payload_cols:
                out[c] = g[c].take(pa.array(pt_idx)).combine_chunks()
        return pa.table(out)

    return unioned.groupby("bucket").map_groups(probe, batch_format="pyarrow")


def pip_customer_zones(sf_dir: str):
    """customer-derived points × diamond zones → (point_id, zone_id)."""
    pts = _points_ds(sf_dir, "customer", "c_custkey")
    out = pip_join_partitioned(pts, _zones_table())
    return out.sort(["point_id", "zone_id"])


def _pip_condition_sql(key: str, z: str = "z.zkey") -> str:
    lat = synth_lat_sql(key)
    lon = synth_lon_sql(key)
    p = zone_params_sql(z)
    return (
        f"abs({lon} - {p['cx']}) / {p['rx']} + abs({lat} - {p['cy']}) / {p['ry']} <= 1.0"
    )


PIP_CUSTOMER_SQL = f"""
WITH z AS (SELECT CAST(n_nationkey AS BIGINT) AS zkey FROM nation)
SELECT c_custkey AS point_id, z.zkey AS zone_id
FROM customer, z
WHERE {_pip_condition_sql('c_custkey')}
ORDER BY point_id, zone_id
"""


def pip_zonal_stats(sf_dir: str):
    """Zonal aggregate: count + total acctbal (cents) per zone.

    Scale design: ``c_acctbal`` rides through the partitioned PIP
    exchange as a carried payload column (one extra float per point in
    the same shuffle) — no second join and no driver-side
    materialization of the fact-table payload.
    """
    pts = _points_ds(sf_dir, "customer", "c_custkey", extra_cols=("c_acctbal",))
    pairs = pip_join_partitioned(pts, _zones_table(), payload_cols=("c_acctbal",))

    def to_cents(t: pa.Table) -> pa.Table:
        bal = t["c_acctbal"].to_numpy(zero_copy_only=False)
        bal_c = np.floor(bal * 100.0).astype(np.int64)
        return pa.table(
            {
                "zone_id": t["zone_id"],
                "bal_c": pa.array(bal_c),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    tagged = pairs.map_batches(to_cents, batch_format="pyarrow")
    agg = grouped_sum(
        tagged, ["zone_id"], {"n_points": ("one", "sum"), "sum_bal_c": ("bal_c", "sum")},
        merge="driver",  # <=25 zones
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "zone_id": t["zone_id"],
                "n_points": t["n_points"],
                "sum_acctbal": pc.divide(pc.cast(t["sum_bal_c"], pa.float64()), 100.0),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("zone_id")


PIP_ZONAL_SQL = f"""
WITH z AS (SELECT CAST(n_nationkey AS BIGINT) AS zkey FROM nation)
SELECT z.zkey AS zone_id, count(*) AS n_points,
       sum(CAST(floor(c_acctbal * 100.0) AS BIGINT)) / 100.0 AS sum_acctbal
FROM customer, z
WHERE {_pip_condition_sql('c_custkey')}
GROUP BY z.zkey
ORDER BY zone_id
"""


# ---------------------------------------------------------------------------
# kNN: documents-derived query points → k nearest supplier-derived points
# (small target side → broadcast brute force, the scale-correct plan;
# the partitioned ring-expansion variant lives in stages/knn.py and is
# exercised by tests and the flagship)
# ---------------------------------------------------------------------------


def knn_doc_suppliers(sf_dir: str, k: int = 5):
    import ray

    supp = read_table_local(sf_dir, "supplier", columns=["s_suppkey"])
    sk = supp["s_suppkey"].values.astype(np.int64)
    slat = synthgeo.synth_lat(sk)
    slon = synthgeo.synth_lon(sk)
    ref = ray.put((sk, slat, slon))

    from ..stages.broadcast import with_broadcast

    def knn_batch(state, t: pa.Table) -> pa.Table:
        sk, slat, slon = state
        qid = t["point_id"].to_numpy(zero_copy_only=False)
        qlat = t["lat"].to_numpy(zero_copy_only=False)
        qlon = t["lon"].to_numpy(zero_copy_only=False)
        d = geom.haversine_km(
            qlat[:, None], qlon[:, None], slat[None, :], slon[None, :]
        )
        kk = min(k, d.shape[1])
        # deterministic order: distance, then neighbor id
        order = np.lexsort((sk[None, :].repeat(len(qid), 0), d), axis=1)[:, :kk]
        return pa.table(
            {
                "point_id": pa.array(np.repeat(qid, kk)),
                "neighbor_id": pa.array(sk[order].ravel()),
                "rank": pa.array(np.tile(np.arange(1, kk + 1), len(qid)).astype(np.int64)),
            }
        )

    pts = _points_ds(sf_dir, "documents", "doc_id")
    return pts.map_batches(
        with_broadcast(ref, knn_batch, "knn"), batch_format="pyarrow",
        zero_copy_batch=True,
    ).sort(["point_id", "rank"])


def knn_doc_suppliers_sql(k: int = 5) -> str:
    qlat = synth_lat_sql("d.doc_id")
    qlon = synth_lon_sql("d.doc_id")
    tlat = synth_lat_sql("s.s_suppkey")
    tlon = synth_lon_sql("s.s_suppkey")
    dist = geom.haversine_km_sql(qlat, qlon, tlat, tlon)
    return f"""
WITH ranked AS (
  SELECT d.doc_id AS point_id, s.s_suppkey AS neighbor_id,
         row_number() OVER (PARTITION BY d.doc_id
                            ORDER BY {dist}, s.s_suppkey) AS rank
  FROM documents d CROSS JOIN supplier s
)
SELECT point_id, neighbor_id, rank FROM ranked WHERE rank <= {k}
ORDER BY point_id, rank
"""


# ---------------------------------------------------------------------------
# Reprojection + per-nation bbox
# ---------------------------------------------------------------------------


def reproject_customers(sf_dir: str):
    """customer points → EPSG:3857, rounded to mm for exact oracle parity."""
    pts = _points_ds(sf_dir, "customer", "c_custkey")
    return pts.map_batches(
        geo_stages.web_mercator(), batch_format="pyarrow", zero_copy_batch=True
    ).select_columns(["point_id", "x3857", "y3857"]).sort("point_id")


REPROJECT_SQL = f"""
SELECT c_custkey AS point_id,
       round(radians({synth_lon_sql('c_custkey')}) * 6378137.0, 3) AS x3857,
       round(ln(tan(pi() / 4.0 + radians({synth_lat_sql('c_custkey')}) / 2.0)) * 6378137.0, 3) AS y3857
FROM customer
ORDER BY point_id
"""


def bbox_by_nation(sf_dir: str):
    """BoundingBox.from_geometry semantics as a grouped aggregate:
    per-nation bbox of customer point sets (min/max over coords,
    bounding_box.py:138-169)."""
    pts = _points_ds(sf_dir, "customer", "c_custkey", extra_cols=("c_nationkey",))

    agg = grouped_sum(
        pts.map_batches(
            lambda t: pa.table(
                {
                    "c_nationkey": pc.cast(t["c_nationkey"], pa.int64()),
                    "lon": t["lon"],
                    "lat": t["lat"],
                }
            ),
            batch_format="pyarrow",
        ),
        ["c_nationkey"],
        {
            "minx": ("lon", "min"),
            "miny": ("lat", "min"),
            "maxx": ("lon", "max"),
            "maxy": ("lat", "max"),
        },
        merge="driver",  # <=25 nations
    )
    return agg.sort("c_nationkey")


BBOX_BY_NATION_SQL = f"""
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       min({synth_lon_sql('c_custkey')}) AS minx,
       min({synth_lat_sql('c_custkey')}) AS miny,
       max({synth_lon_sql('c_custkey')}) AS maxx,
       max({synth_lat_sql('c_custkey')}) AS maxy
FROM customer
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


# ---------------------------------------------------------------------------
# Cell assignment (geohash / S2 / hex) — no SQL twin (rows-only check;
# kernel correctness is pinned by published vectors in tests/test_cells.py)
# ---------------------------------------------------------------------------


def cell_assignment(sf_dir: str):
    pts = _points_ds(sf_dir, "customer", "c_custkey")
    out = pts.map_batches(
        geo_stages.add_cells(geohash_precision=9, s2_level=12, hex_resolution=7),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def cast_cells(t: pa.Table) -> pa.Table:
        # bijective u64 -> i64 reinterpretation (two's complement view):
        # masking the top bit would collide S2 faces 4-5 with 0-1
        def as_i64(col):
            return pa.array(
                col.to_numpy(zero_copy_only=False).astype(np.uint64).view(np.int64)
            )

        return pa.table(
            {
                "point_id": t["point_id"],
                "geohash": t["geohash"],
                "cell_geohash": as_i64(t["cell_geohash"]),
                "cell_s2": as_i64(t["cell_s2"]),
                "cell_hex": as_i64(t["cell_hex"]),
            }
        )

    return out.map_batches(cast_cells, batch_format="pyarrow").sort("point_id")


def knn_partitioned_query(sf_dir: str, k: int = 5):
    """Cell-partitioned kNN (ring expansion + exact fallback) — the
    large-large path; brute-force-equivalence pinned in tests."""
    from ..stages.knn import knn_partitioned

    queries = _points_ds(sf_dir, "documents", "doc_id").map_batches(
        lambda t: t.rename_columns(["query_id", "lat", "lon"]), batch_format="pyarrow"
    )
    targets = _points_ds(sf_dir, "customer", "c_custkey").map_batches(
        lambda t: t.rename_columns(["target_id", "lat", "lon"]), batch_format="pyarrow"
    )
    return knn_partitioned(queries, targets, k=k, bits=6, radius=1)


def knn_partitioned_sql(k: int = 5) -> str:
    from ..functions.geom import haversine_km_sql

    qlat = synth_lat_sql("d.doc_id")
    qlon = synth_lon_sql("d.doc_id")
    tlat = synth_lat_sql("c.c_custkey")
    tlon = synth_lon_sql("c.c_custkey")
    dist = haversine_km_sql(qlat, qlon, tlat, tlon)
    return f"""
WITH ranked AS (
  SELECT d.doc_id AS query_id, c.c_custkey AS neighbor_id,
         row_number() OVER (PARTITION BY d.doc_id
                            ORDER BY {dist}, c.c_custkey) AS rank
  FROM documents d CROSS JOIN customer c
)
SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= {k}
ORDER BY query_id, rank
"""


def geohash_assignment(sf_dir: str, precision: int = 9):
    """Geohash-only cell assignment with a FULL SQL oracle: the
    interleaved-bit geohash is reproduced in DuckDB with
    generate_series bit arithmetic (quantize -> interleave -> base32),
    converting this kernel from golden-pinned to DuckDB-checked
    (`geo_cells` keeps the S2/hex columns, which SQL can't express)."""
    from ..functions import cells

    pts = _points_ds(sf_dir, "customer", "c_custkey")

    def assign(t: pa.Table) -> pa.Table:
        lat = t["lat"].to_numpy(zero_copy_only=False)
        lon = t["lon"].to_numpy(zero_copy_only=False)
        code = cells.geohash_int(lat, lon, precision)
        return pa.table(
            {
                "point_id": t["point_id"],
                "geohash": pa.array(cells.geohash_encode(lat, lon, precision)),
                "cell_geohash": pa.array(code.view(np.int64)),
            }
        )

    return pts.map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    ).sort("point_id")


def geohash_assignment_sql(precision: int = 9) -> str:
    nbits = 5 * precision
    lon_bits = (nbits + 1) // 2
    lat_bits = nbits // 2
    lat = synth_lat_sql("c_custkey")
    lon = synth_lon_sql("c_custkey")
    # quantization: identical expression order to cells.geohash_quantize
    latq = (
        f"LEAST(GREATEST(CAST(floor((({lat}) + 90.0) / 180.0 * {1 << lat_bits}"
        f".0) AS BIGINT), 0), {(1 << lat_bits) - 1})"
    )
    lonq = (
        f"LEAST(GREATEST(CAST(floor((({lon}) + 180.0) / 360.0 * {1 << lon_bits}"
        f".0) AS BIGINT), 0), {(1 << lon_bits) - 1})"
    )
    return f"""
WITH q AS (
  SELECT CAST(c_custkey AS BIGINT) AS point_id,
         {latq} AS lat_q, {lonq} AS lon_q
  FROM customer
),
interleaved AS (
  -- MSB-first: even offsets are lon bits (odd total bit count)
  SELECT point_id,
         CAST(SUM(CASE WHEN j % 2 = 0
             THEN ((lon_q >> ({lon_bits - 1} - j // 2)) & 1) << ({nbits - 1} - j)
             ELSE ((lat_q >> ({lat_bits - 1} - j // 2)) & 1) << ({nbits - 1} - j)
             END) AS BIGINT) AS cell_geohash
  FROM q, generate_series(0, {nbits - 1}) AS t(j)
  GROUP BY point_id
)
SELECT point_id,
       (SELECT string_agg(
           substr('0123456789bcdefghjkmnpqrstuvwxyz',
                  CAST(((cell_geohash >> (5 * ({precision - 1} - k))) & 31)
                       AS INTEGER) + 1, 1), '' ORDER BY k)
        FROM generate_series(0, {precision - 1}) AS g(k)) AS geohash,
       cell_geohash
FROM interleaved
ORDER BY point_id
"""


# ---------------------------------------------------------------------------
# Tile pyramid — multi-resolution rollup (the tiling engine's product)
# ---------------------------------------------------------------------------


def tile_pyramid(sf_dir: str, precision: int = 5, min_level: int = 1):
    """Multi-resolution tile pyramid: per-cell point counts at every
    geohash level from `precision` down to `min_level` (the vector
    analogue of `raster_overview`'s 2x overview chain; the map-tile
    pyramid a tile server pre-computes).

    Scale design: the corpus is scanned ONCE — per-batch combiners
    collapse rows to finest-level cells before a single distributed
    merge (finest cells are unbounded at corpus scale, so the merge is
    the shuffle form). Every coarser level is then derived from the
    PREVIOUS, already-aggregated level by 5-bit prefix truncation +
    re-merge: each successive exchange is ~32x smaller, so the whole
    rollup chain costs a vanishing fraction of the base scan. No stage
    re-reads the input.
    """
    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber"])

    def derive(t: pa.Table) -> pa.Table:
        k = (
            t["l_orderkey"].to_numpy(zero_copy_only=False) * 8
            + t["l_linenumber"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        code = cells.geohash_int(synthgeo.synth_lat(k), synthgeo.synth_lon(k), precision)
        return pa.table(
            {
                "cell": pa.array(code.view(np.int64)),
                "one": pa.array(np.ones(len(k), dtype=np.int64)),
            }
        )

    base = grouped_sum(
        ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True),
        ["cell"],
        {"n_points": ("one", "sum")},
    )

    def with_level(lvl: int):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "level": pa.array(np.full(t.num_rows, lvl, dtype=np.int64)),
                    "cell": t["cell"],
                    "n_points": t["n_points"],
                }
            )

        fn.__name__ = f"level[{lvl}]"
        return fn

    levels = [base.map_batches(with_level(precision), batch_format="pyarrow")]
    prev = base
    for lvl in range(precision - 1, min_level - 1, -1):

        def shift(t: pa.Table, _s=5) -> pa.Table:  # prev level -> one level up
            return pa.table(
                {
                    "cell": pc.shift_right(t["cell"], _s),
                    "n_points": t["n_points"],
                }
            )

        prev = grouped_sum(
            prev.map_batches(shift, batch_format="pyarrow", zero_copy_batch=True),
            ["cell"],
            {"n_points": ("n_points", "sum")},
        )
        levels.append(prev.map_batches(with_level(lvl), batch_format="pyarrow"))

    out = levels[0].union(*levels[1:])
    # union of many tiny groupby outputs -> coalesce before the sort
    # (CLAUDE.md rule 9: sort cost scales with block COUNT)
    return out.repartition(8).sort(["level", "cell"])


def tile_pyramid_sql(precision: int = 5, min_level: int = 1) -> str:
    nbits = 5 * precision
    lon_bits = (nbits + 1) // 2
    lat_bits = nbits // 2
    key = "(l_orderkey * 8 + l_linenumber)"
    lat = synth_lat_sql(key)
    lon = synth_lon_sql(key)
    latq = (
        f"LEAST(GREATEST(CAST(floor((({lat}) + 90.0) / 180.0 * {1 << lat_bits}"
        f".0) AS BIGINT), 0), {(1 << lat_bits) - 1})"
    )
    lonq = (
        f"LEAST(GREATEST(CAST(floor((({lon}) + 180.0) / 360.0 * {1 << lon_bits}"
        f".0) AS BIGINT), 0), {(1 << lon_bits) - 1})"
    )
    per_level = "\nUNION ALL\n".join(
        f"SELECT CAST({lvl} AS BIGINT) AS level,"
        f" cell5 >> {5 * (precision - lvl)} AS cell,"
        f" count(*) AS n_points FROM q GROUP BY 2"
        for lvl in range(precision, min_level - 1, -1)
    )
    return f"""
WITH pts AS (
  SELECT {latq} AS lat_q, {lonq} AS lon_q FROM lineitem
),
q AS (
  -- MSB-first interleave, lon at even offsets (odd total bit count)
  SELECT CAST(SUM(CASE WHEN j % 2 = 0
      THEN ((lon_q >> ({lon_bits - 1} - j // 2)) & 1) << ({nbits - 1} - j)
      ELSE ((lat_q >> ({lat_bits - 1} - j // 2)) & 1) << ({nbits - 1} - j)
      END) AS BIGINT) AS cell5
  FROM (SELECT row_number() OVER () AS rid, lat_q, lon_q FROM pts),
       generate_series(0, {nbits - 1}) AS t(j)
  GROUP BY rid
)
{per_level}
ORDER BY level, cell
"""


# ---------------------------------------------------------------------------
# BBox overlap join — rectangle x rectangle spatial join
# ---------------------------------------------------------------------------

BBOX_GRID_DEG = 2.0
BBOX_JOIN_BUCKETS = 64


def bbox_overlap_join(sf_dir: str, grid_deg: float = BBOX_GRID_DEG,
                      n_buckets: int = BBOX_JOIN_BUCKETS,
                      cust=None, supp=None, box_scale: float = 1.0):
    """Rectangle-rectangle overlap join (planar closed-interval
    intersection) between customer- and supplier-derived boxes,
    the third spatial-join class next to PIP and kNN.

    Scale design — the textbook partitioned spatial join:
    1. cover-explode each box into the coarse grid cells it touches
       (<= 3x3 cells at these box sizes);
    2. co-partition both sides by hash(cell) % B into B BOUNDED
       buckets (one map_groups call per bucket, never per cell —
       CLAUDE.md rule 1);
    3. inside a bucket: sort-searchsorted equi-match on cell, then the
       vectorized overlap predicate;
    4. de-duplicate multi-cell matches with the REFERENCE-POINT rule
       (Dittrich & Seeger, ICDE 2000, public): a pair is emitted only
       in the grid cell containing the intersection's lower-left
       corner — that cell is covered by both boxes by construction, so
       each qualifying pair is emitted exactly once, with no
       post-shuffle distinct pass.
    """
    if cust is None:
        cust = read_table(sf_dir, "customer", columns=["c_custkey"])
    if supp is None:
        supp = read_table(sf_dir, "supplier", columns=["s_suppkey"])

    def boxes(key_col: str, side: int):
        def fn(t: pa.Table) -> pa.Table:
            k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
            cy = synthgeo.synth_lat(k)
            cx = synthgeo.synth_lon(k)
            # box_scale != 1 is the bench-scale knob: at 1M x 100k the
            # default +-0.25..1.75 deg boxes over the clustered synth
            # points make the join OUTPUT quadratic (~1e9 pairs); the
            # sf-table oracle always runs at the default 1.0
            hw = (k % 7 + 1) * (0.25 * box_scale)
            hh = (k % 5 + 1) * (0.25 * box_scale)
            # covered cell range (grid anchored at lon -180 / lat -90)
            gx0 = np.floor((cx - hw + 180.0) / grid_deg).astype(np.int64)
            gx1 = np.floor((cx + hw + 180.0) / grid_deg).astype(np.int64)
            gy0 = np.floor((cy - hh + 90.0) / grid_deg).astype(np.int64)
            gy1 = np.floor((cy + hh + 90.0) / grid_deg).astype(np.int64)
            nx = gx1 - gx0 + 1
            ny = gy1 - gy0 + 1
            n_cover = nx * ny
            ridx = np.repeat(np.arange(len(k), dtype=np.int64), n_cover)
            offs = np.arange(int(n_cover.sum()), dtype=np.int64) - np.repeat(
                np.cumsum(n_cover) - n_cover, n_cover
            )
            gx = gx0[ridx] + offs % nx[ridx]
            gy = gy0[ridx] + offs // nx[ridx]
            cell = gx * np.int64(1 << 20) + gy
            return pa.table(
                {
                    "cell": pa.array(cell),
                    "bucket": pa.array(
                        ((cell * np.int64(2654435761)) % np.int64(n_buckets) + n_buckets)
                        % n_buckets
                    ),
                    "side": pa.array(np.full(len(cell), side, dtype=np.int8)),
                    "id": pa.array(k[ridx]),
                    "cx": pa.array(cx[ridx]),
                    "cy": pa.array(cy[ridx]),
                    "hw": pa.array(hw[ridx]),
                    "hh": pa.array(hh[ridx]),
                }
            )

        fn.__name__ = f"boxes[{key_col}]"
        return fn

    left = cust.map_batches(boxes("c_custkey", 0), batch_format="pyarrow",
                            zero_copy_batch=True)
    right = supp.map_batches(boxes("s_suppkey", 1), batch_format="pyarrow",
                             zero_copy_batch=True)

    def probe(t: pa.Table) -> pa.Table:
        side = t["side"].to_numpy(zero_copy_only=False)
        cell = t["cell"].to_numpy(zero_copy_only=False)
        ids = t["id"].to_numpy(zero_copy_only=False)
        cx = t["cx"].to_numpy(zero_copy_only=False)
        cy = t["cy"].to_numpy(zero_copy_only=False)
        hw = t["hw"].to_numpy(zero_copy_only=False)
        hh = t["hh"].to_numpy(zero_copy_only=False)
        li = np.flatnonzero(side == 0)
        ri = np.flatnonzero(side == 1)
        empty = pa.table(
            {
                "c_custkey": pa.array([], pa.int64()),
                "s_suppkey": pa.array([], pa.int64()),
            }
        )
        if li.size == 0 or ri.size == 0:
            return empty
        order = np.argsort(cell[ri], kind="stable")
        ri = ri[order]
        rcell = cell[ri]
        lo = np.searchsorted(rcell, cell[li], side="left")
        hi = np.searchsorted(rcell, cell[li], side="right")
        cnt = hi - lo
        if int(cnt.sum()) == 0:
            return empty
        lrep = np.repeat(li, cnt)
        offs = np.arange(int(cnt.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(cnt) - cnt, cnt
        )
        rrep = ri[np.repeat(lo, cnt) + offs]
        # closed-interval overlap
        ok = (np.abs(cx[lrep] - cx[rrep]) <= hw[lrep] + hw[rrep]) & (
            np.abs(cy[lrep] - cy[rrep]) <= hh[lrep] + hh[rrep]
        )
        lrep, rrep = lrep[ok], rrep[ok]
        # reference point: intersection's lower-left corner
        refx = np.maximum(cx[lrep] - hw[lrep], cx[rrep] - hw[rrep])
        refy = np.maximum(cy[lrep] - hh[lrep], cy[rrep] - hh[rrep])
        refc = np.floor((refx + 180.0) / grid_deg).astype(np.int64) * np.int64(
            1 << 20
        ) + np.floor((refy + 90.0) / grid_deg).astype(np.int64)
        keep = refc == cell[lrep]
        return pa.table(
            {
                "c_custkey": pa.array(ids[lrep[keep]]),
                "s_suppkey": pa.array(ids[rrep[keep]]),
            }
        )

    out = left.union(right).groupby("bucket").map_groups(
        probe, batch_format="pyarrow"
    )
    return out.repartition(4).sort(["c_custkey", "s_suppkey"])


def bbox_overlap_join_sql() -> str:
    clat = synth_lat_sql("c.c_custkey")
    clon = synth_lon_sql("c.c_custkey")
    slat = synth_lat_sql("s.s_suppkey")
    slon = synth_lon_sql("s.s_suppkey")
    return f"""
SELECT c.c_custkey, s.s_suppkey
FROM customer c CROSS JOIN supplier s
WHERE abs(({clon}) - ({slon}))
        <= (c.c_custkey % 7 + 1) * 0.25 + (s.s_suppkey % 7 + 1) * 0.25
  AND abs(({clat}) - ({slat}))
        <= (c.c_custkey % 5 + 1) * 0.25 + (s.s_suppkey % 5 + 1) * 0.25
ORDER BY c_custkey, s_suppkey
"""


# ---------------------------------------------------------------------------
# Spatial point clustering — grid-bucketed eps-graph connected components
# ---------------------------------------------------------------------------

CLUSTER_EPS_DEG = 0.5
CLUSTER_POINT_LIMIT = 800  # oracle window: recursive closure stays tractable
CLUSTER_BUCKETS = 64


def cluster_points(sf_dir: str, eps: float = CLUSTER_EPS_DEG,
                   limit: int = CLUSTER_POINT_LIMIT,
                   n_buckets: int = CLUSTER_BUCKETS):
    """Density clustering of points (DBSCAN's eps-graph with min_pts=1,
    i.e. single-linkage at radius eps): two points are linked when
    their planar squared distance is <= eps^2; clusters are the
    connected components; cluster_id = min point_id in the component.

    Scale design: NO all-pairs — each point homes in its eps-sized grid
    cell and probes only the 3x3 neighborhood, co-partitioned into B
    BOUNDED hash buckets (one map_groups call per bucket, CLAUDE.md
    rule 1); a genuine edge is found exactly once per direction (the
    home cell of its far end is unique).  Components run on the shared
    min-label engine (stages/components.py) — one bucketed hash join +
    one grouped min per round, rounds = cluster diameter in hops.

    The `limit` window exists ONLY so the SQL twin's recursive
    transitive closure stays tractable (same device as
    docs_jaccard_pairs' JACCARD_DOC_LIMIT); the Ray path never
    materializes pairs beyond grid neighborhoods.
    """
    from ..stages.components import min_label_components

    pts = read_table(sf_dir, "customer", columns=["c_custkey"])

    def derive(t: pa.Table) -> pa.Table:
        k = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        k = k[k < limit]
        return pa.table(
            {
                "point_id": pa.array(k),
                "lon": pa.array(synthgeo.synth_lon(k)),
                "lat": pa.array(synthgeo.synth_lat(k)),
            }
        )

    base = pts.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)

    def explode(t: pa.Table) -> pa.Table:
        pid = t["point_id"].to_numpy(zero_copy_only=False)
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        gx = np.floor((lon + 180.0) / eps).astype(np.int64)
        gy = np.floor((lat + 90.0) / eps).astype(np.int64)
        home = gx * np.int64(1 << 20) + gy
        n = len(pid)
        # role 0: home copy (one per point); role 1: probe copies into
        # the 3x3 neighborhood (including own cell — matches there too)
        cells_ = [home]
        roles = [np.zeros(n, dtype=np.int8)]
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                cells_.append(home + np.int64(dx) * np.int64(1 << 20) + np.int64(dy))
                roles.append(np.ones(n, dtype=np.int8))
        cell = np.concatenate(cells_)
        role = np.concatenate(roles)
        rep = np.tile(np.arange(n, dtype=np.int64), 10)
        return pa.table(
            {
                "cell": pa.array(cell),
                "bucket": pa.array(
                    ((cell * np.int64(2654435761)) % np.int64(n_buckets) + n_buckets)
                    % n_buckets
                ),
                "role": pa.array(role),
                "point_id": pa.array(pid[rep]),
                "lon": pa.array(lon[rep]),
                "lat": pa.array(lat[rep]),
            }
        )

    exploded = base.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)

    def probe(t: pa.Table) -> pa.Table:
        role = t["role"].to_numpy(zero_copy_only=False)
        cell = t["cell"].to_numpy(zero_copy_only=False)
        pid = t["point_id"].to_numpy(zero_copy_only=False)
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        hi_ = np.flatnonzero(role == 0)
        pi_ = np.flatnonzero(role == 1)
        empty = pa.table(
            {"node": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
        )
        if hi_.size == 0 or pi_.size == 0:
            return empty
        order = np.argsort(cell[hi_], kind="stable")
        hi_ = hi_[order]
        hcell = cell[hi_]
        lo = np.searchsorted(hcell, cell[pi_], side="left")
        hi = np.searchsorted(hcell, cell[pi_], side="right")
        cnt = hi - lo
        total = int(cnt.sum())
        if total == 0:
            return empty
        prep = np.repeat(pi_, cnt)
        offs = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        hrep = hi_[np.repeat(lo, cnt) + offs]
        dx = lon[prep] - lon[hrep]
        dy = lat[prep] - lat[hrep]
        ok = (dx * dx + dy * dy <= eps * eps) & (pid[prep] != pid[hrep])
        return pa.table(
            {
                "node": pa.array(pid[prep[ok]]),
                "dst": pa.array(pid[hrep[ok]]),
            }
        )

    edges = (
        exploded.groupby("bucket")
        .map_groups(probe, batch_format="pyarrow")
        .materialize()
    )
    labels = base.map_batches(
        lambda t: pa.table({"node": t["point_id"], "label": t["point_id"]}),
        batch_format="pyarrow",
    ).materialize()

    labels = min_label_components(edges, labels, op_name="cluster_points")

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({"point_id": t["node"], "cluster_id": t["label"]})

    return labels.map_batches(finish, batch_format="pyarrow").sort("point_id")


def cluster_points_sql(eps: float = CLUSTER_EPS_DEG,
                       limit: int = CLUSTER_POINT_LIMIT) -> str:
    lat = synth_lat_sql("c_custkey")
    lon = synth_lon_sql("c_custkey")
    return f"""
WITH RECURSIVE pts AS (
  SELECT CAST(c_custkey AS BIGINT) AS node, {lon} AS lon, {lat} AS lat
  FROM customer WHERE c_custkey < {limit}
),
edges AS (
  SELECT p.node AS src, q.node AS dst
  FROM pts p JOIN pts q ON p.node <> q.node
  WHERE (p.lon - q.lon) * (p.lon - q.lon)
      + (p.lat - q.lat) * (p.lat - q.lat) <= {eps} * {eps}
),
reach(node, label) AS (
  SELECT node, node FROM pts
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
)
SELECT node AS point_id, MIN(label) AS cluster_id
FROM reach GROUP BY node ORDER BY point_id
"""


def pip_anti_join(sf_dir: str):
    """Spatial ANTI-join: customer points contained by NO zone (the
    'uncovered points' audit every coverage pipeline needs).

    Scale shape: the matched side comes from the partitioned PIP join
    (cover-explode + bucket co-partition, no broadcast assumption);
    the uncovered set is then a bucketed ANTI hash join of the full
    point stream against the matched point_ids — both sides unbounded,
    one co-partitioned exchange, no driver set."""
    from ..stages.join import hash_join

    pts = _points_ds(sf_dir, "customer", "c_custkey")
    matched = pip_join_partitioned(pts, _zones_table())

    def ids_only(t: pa.Table) -> pa.Table:
        return pa.table({"point_id": t["point_id"]})

    out = hash_join(
        pts.map_batches(ids_only, batch_format="pyarrow"),
        matched.map_batches(ids_only, batch_format="pyarrow"),
        on="point_id",
        how="anti",
    )
    return out.sort("point_id")


PIP_ANTI_SQL = f"""
WITH z AS (SELECT CAST(n_nationkey AS BIGINT) AS zkey FROM nation)
SELECT c_custkey AS point_id
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM z WHERE {_pip_condition_sql('c.c_custkey')}
)
ORDER BY point_id
"""


# ---------------------------------------------------------------------------
# Within-distance (radius / range) spatial join — the bipartite twin of
# cluster_points' eps-graph: every (customer, supplier) pair closer
# than a radius.  Reference parity: geografir users compose this from
# Geometry.to_crs + shapely dwithin per pair; here it is one
# cell-partitioned exchange.
# ---------------------------------------------------------------------------

RADIUS_JOIN_DEG = 0.5
RADIUS_JOIN_BUCKETS = 64


def radius_join(sf_dir: str, radius: float = RADIUS_JOIN_DEG,
                n_buckets: int = RADIUS_JOIN_BUCKETS):
    """All (customer, supplier) pairs with planar distance <= radius deg.

    Scale design: NO broadcast, NO all-pairs — suppliers home into
    radius-sized grid cells (role 0), customers replicate into their
    3x3 cell neighborhood (role 1); candidates meet inside BOUNDED
    hash buckets (one vectorized map_groups call per bucket, CLAUDE.md
    rule 1) where a searchsorted postings probe expands only same-cell
    pairs, and the exact predicate filters.  Both inputs stream; the
    exchange volume is O(candidate pairs), never O(n x m).  The 3x3
    probe is sufficient because the cell size equals the radius, so a
    qualifying pair can differ by at most one cell per axis.
    """

    def explode_side(ds, role: int):
        def f(t: pa.Table) -> pa.Table:
            pid = t["point_id"].to_numpy(zero_copy_only=False)
            lon = t["lon"].to_numpy(zero_copy_only=False)
            lat = t["lat"].to_numpy(zero_copy_only=False)
            gx = np.floor((lon + 180.0) / radius).astype(np.int64)
            gy = np.floor((lat + 90.0) / radius).astype(np.int64)
            home = gx * np.int64(1 << 20) + gy
            n = len(pid)
            if role == 0:
                cell = home
                rep = np.arange(n, dtype=np.int64)
            else:
                cells_ = []
                for dx in (-1, 0, 1):
                    for dy in (-1, 0, 1):
                        cells_.append(
                            home + np.int64(dx) * np.int64(1 << 20) + np.int64(dy)
                        )
                cell = np.concatenate(cells_) if n else home
                rep = np.tile(np.arange(n, dtype=np.int64), 9)
            return pa.table(
                {
                    "cell": pa.array(cell),
                    "bucket": pa.array(
                        ((cell * np.int64(2654435761)) % np.int64(n_buckets)
                         + n_buckets) % n_buckets
                    ),
                    "role": pa.array(np.full(len(rep), role, dtype=np.int8)),
                    "point_id": pa.array(pid[rep]),
                    "lon": pa.array(lon[rep]),
                    "lat": pa.array(lat[rep]),
                }
            )

        return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)

    sup = explode_side(_points_ds(sf_dir, "supplier", "s_suppkey"), role=0)
    cust = explode_side(_points_ds(sf_dir, "customer", "c_custkey"), role=1)

    r2 = radius * radius

    def probe(t: pa.Table) -> pa.Table:
        role = t["role"].to_numpy(zero_copy_only=False)
        cell = t["cell"].to_numpy(zero_copy_only=False)
        pid = t["point_id"].to_numpy(zero_copy_only=False)
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        empty = pa.table(
            {"point_id": pa.array([], pa.int64()),
             "neighbor_id": pa.array([], pa.int64())}
        )
        hi_ = np.flatnonzero(role == 0)   # supplier home copies
        pi_ = np.flatnonzero(role == 1)   # customer probe copies
        if hi_.size == 0 or pi_.size == 0:
            return empty
        order = np.argsort(cell[hi_], kind="stable")
        hi_ = hi_[order]
        hcell = cell[hi_]
        lo = np.searchsorted(hcell, cell[pi_], side="left")
        hi = np.searchsorted(hcell, cell[pi_], side="right")
        cnt = hi - lo
        total = int(cnt.sum())
        if total == 0:
            return empty
        prep = np.repeat(pi_, cnt)
        offs = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        hrep = hi_[np.repeat(lo, cnt) + offs]
        dx = lon[prep] - lon[hrep]
        dy = lat[prep] - lat[hrep]
        ok = dx * dx + dy * dy <= r2
        return pa.table(
            {
                "point_id": pa.array(pid[prep[ok]]),
                "neighbor_id": pa.array(pid[hrep[ok]]),
            }
        )

    return (
        sup.union(cust)
        .groupby("bucket")
        .map_groups(probe, batch_format="pyarrow")
        .sort(["point_id", "neighbor_id"])
    )


def radius_join_sql(radius: float = RADIUS_JOIN_DEG) -> str:
    clat = synth_lat_sql("c.c_custkey")
    clon = synth_lon_sql("c.c_custkey")
    slat = synth_lat_sql("s.s_suppkey")
    slon = synth_lon_sql("s.s_suppkey")
    return f"""
SELECT c.c_custkey AS point_id, s.s_suppkey AS neighbor_id
FROM customer c CROSS JOIN supplier s
WHERE ({clon} - {slon}) * ({clon} - {slon})
    + ({clat} - {slat}) * ({clat} - {slat}) <= {radius} * {radius}
ORDER BY point_id, neighbor_id
"""


# ---------------------------------------------------------------------------
# Grid-density hotspot clustering (DBSCAN-on-a-grid)
# ---------------------------------------------------------------------------

HOTSPOT_RES_DEG = 1.0      # cell edge in degrees (360 x 150 grid here)
HOTSPOT_MIN_PTS = 20       # density threshold per cell


def geo_hotspot_clusters(sf_dir: str, min_pts: int = HOTSPOT_MIN_PTS):
    """Spatial hotspot mining, the grid flavor of DBSCAN (STING /
    grid-DBSCAN family): bin every event ping into 1-degree cells, keep
    cells with >= ``min_pts`` points (dense cells), 8-connect adjacent
    dense cells into clusters, and report per-cluster extent and mass.

    Returns (cluster_id, n_cells, n_points) with cluster_id = the MIN
    dense cell id of the component, ordered by cluster_id.  No
    antimeridian wrap: cells gx=0 and gx=359 are NOT adjacent (the
    synthetic lon never straddles; documented grid semantics shared
    with the SQL twin).

    Scale shape: binning is a per-batch combiner + grouped_sum over the
    BOUNDED 1-degree cell space (rule-2 driver merge at this res; at a
    0.01-degree grid switch merge="shuffle" — nothing else changes);
    adjacency probes the dense-cell set against its own 8 neighbor
    offsets (vectorized searchsorted, no cross join); clustering is the
    distributed min-label components engine (stages/components.py,
    pointer-doubled), so NOTHING here depends on the dense-cell count
    fitting anywhere — at a fine grid both the edge list and the label
    table stay sharded.
    """
    import ray.data

    from ..stages.components import min_label_components

    ds = read_table(sf_dir, "events", columns=["event_id"])

    def bin_cells(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lat = synthgeo.synth_lat(eid)
        lon = synthgeo.synth_lon(eid)
        gx = np.floor((lon + 180.0) / HOTSPOT_RES_DEG).astype(np.int64)
        gy = np.floor((lat + 90.0) / HOTSPOT_RES_DEG).astype(np.int64)
        cell = gy * 360 + gx
        uc, cnt = np.unique(cell, return_counts=True)
        return pa.table({"cell": pa.array(uc),
                         "n": pa.array(cnt.astype(np.int64))})

    counts = grouped_sum(
        ds.map_batches(bin_cells, batch_format="pyarrow", zero_copy_batch=True),
        ["cell"], {"n": ("n", "sum")}, merge="driver",
    ).materialize()

    # counts is driver-merged over the BOUNDED 1-degree cell space, so
    # the dense filter runs locally on the small table — this also
    # sidesteps rule 25 (a fully-empty filtered Dataset loses its
    # schema in to_pandas, which happened at sf0.001 where no cell
    # reaches min_pts).  At a fine grid (merge="shuffle") the filter
    # moves back into map_batches with an explicit empty schema.
    cnt_pd = counts.to_pandas()
    cells_np = cnt_pd["cell"].to_numpy().astype(np.int64)
    n_np = cnt_pd["n"].to_numpy().astype(np.int64)
    keep = n_np >= min_pts
    dense_tbl = pa.table(
        {"cell": pa.array(cells_np[keep]), "n": pa.array(n_np[keep])}
    )
    dense = ray.data.from_arrow(dense_tbl)

    # one sorted broadcast of the dense CELL IDS (8 bytes/cell) for the
    # vectorized neighbor probe — the same needed-set semi-join trick as
    # stages/knn.py; at a fine grid this is the per-bucket dense set of
    # a cell-range bucket, not a global array.
    dense_ids = np.sort(cells_np[keep]).astype(np.int64)
    if len(dense_ids) == 0:
        # rule 25: an empty Dataset cannot carry its schema through the
        # driver's to_pandas compare — return the typed Table itself
        return pa.table({
            "cluster_id": pa.array([], pa.int64()),
            "n_cells": pa.array([], pa.int64()),
            "n_points": pa.array([], pa.int64()),
        })
    import ray
    dense_ref = ray.put(dense_ids)

    def edges_stage(t: pa.Table) -> pa.Table:
        ids = ray.get(dense_ref)
        c = t["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        gx, gy = c % 360, c // 360
        srcs, dsts = [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                nx, ny = gx + dx, gy + dy
                ok = (nx >= 0) & (nx < 360)
                nb = ny * 360 + nx
                pos = np.searchsorted(ids, nb)
                pos_c = np.minimum(pos, len(ids) - 1)
                hit = ok & (ids[pos_c] == nb)
                srcs.append(c[hit])
                dsts.append(nb[hit])
        return pa.table({"node": pa.array(np.concatenate(srcs)),
                         "dst": pa.array(np.concatenate(dsts))})

    edges = dense.map_batches(
        edges_stage, batch_format="pyarrow", zero_copy_batch=True
    )
    labels = dense.map_batches(
        lambda t: pa.table({"node": t["cell"], "label": t["cell"]}),
        batch_format="pyarrow",
    )
    comp = min_label_components(edges, labels, op_name="hotspots")

    # attach per-cell counts back to the labels (both sides keyed on the
    # dense cell id) and reduce per cluster
    from ..stages.join import hash_join

    joined = hash_join(
        comp,
        dense.map_batches(
            lambda t: pa.table({"node": t["cell"], "n": t["n"]}),
            batch_format="pyarrow",
        ),
        on="node",
        left_cols=["node", "label"],
        right_cols=["node", "n"],
    )

    def pre_agg(t: pa.Table) -> pa.Table:
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        ul, inv = np.unique(lab, return_inverse=True)
        ncells = np.bincount(inv).astype(np.int64)
        npts = np.zeros(len(ul), dtype=np.int64)
        np.add.at(npts, inv, n)
        return pa.table({"cluster_id": pa.array(ul),
                         "n_cells": pa.array(ncells),
                         "n_points": pa.array(npts)})

    out = grouped_sum(
        joined.map_batches(pre_agg, batch_format="pyarrow", zero_copy_batch=True),
        ["cluster_id"],
        {"n_cells": ("n_cells", "sum"), "n_points": ("n_points", "sum")},
        merge="driver",
    )
    return out.sort("cluster_id")


GEO_HOTSPOT_CLUSTERS_SQL = f"""
WITH RECURSIVE pts AS (
  SELECT {synth_lat_sql('event_id')} AS lat,
         {synth_lon_sql('event_id')} AS lon
  FROM events
),
cells AS (
  SELECT CAST(floor((lat + 90.0) / {HOTSPOT_RES_DEG}) AS BIGINT) * 360
         + CAST(floor((lon + 180.0) / {HOTSPOT_RES_DEG}) AS BIGINT) AS cell,
         CAST(count(*) AS BIGINT) AS n
  FROM pts
  GROUP BY 1
  HAVING count(*) >= {HOTSPOT_MIN_PTS}
),
edges AS (
  SELECT a.cell AS src, b.cell AS dst
  FROM cells a JOIN cells b
    ON abs((a.cell % 360) - (b.cell % 360)) <= 1
   AND abs((a.cell // 360) - (b.cell // 360)) <= 1
   AND a.cell <> b.cell
),
reach(node, label) AS (
  SELECT cell, cell FROM cells
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
),
comp AS (
  SELECT node AS cell, MIN(label) AS cluster_id FROM reach GROUP BY node
)
SELECT comp.cluster_id,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST(sum(cells.n) AS BIGINT) AS n_points
FROM comp JOIN cells ON cells.cell = comp.cell
GROUP BY comp.cluster_id
ORDER BY comp.cluster_id
"""


# ---------------------------------------------------------------------------
# Per-nation convex hull: the spatial-aggregate (ST_ConvexHull_Agg)
# surface.  Hulls are MERGEABLE (hull(A ∪ B) ⊆ hull-vertices(A) ∪
# hull-vertices(B)), so each batch reduces its nation's points to the
# batch-hull vertex set — vectorized Akl-Toussaint quad discard first,
# tiny monotone chain on the shell survivors — and the driver finishes
# an exact strict chain per nation over the bounded partials (≤25
# nations × O(hull size) points; random-point hulls are O(log n)).
# All geometry runs in integer microdegrees so cross products are
# exact int64 on both engines.
# ---------------------------------------------------------------------------

HULL_CUST_LIMIT = 2000  # deterministic window caps the O(k^3) SQL twin


def _hull_indices(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Andrew monotone chain, STRICT turns (collinear mid-points
    excluded; endpoints of collinear runs are strict vertices and stay).
    Returns indices of hull vertices of the (distinct) input points."""
    n = len(x)
    if n <= 2:
        return np.arange(n)
    order = np.lexsort((y, x))

    def chain(idx):
        out = []
        for i in idx:
            while len(out) >= 2:
                ax, ay = x[out[-2]], y[out[-2]]
                bx, by = x[out[-1]], y[out[-1]]
                if (bx - ax) * (y[i] - ay) - (by - ay) * (x[i] - ax) <= 0:
                    out.pop()
                else:
                    break
            out.append(i)
        return out

    lower = chain(order)
    upper = chain(order[::-1])
    return np.unique(np.array(lower[:-1] + upper[:-1], dtype=np.int64))


def _quad_survivors(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Vectorized Akl-Toussaint: drop points STRICTLY inside the
    quadrilateral of the 4 axis-extreme points (they cannot be hull
    vertices).  Degenerate quads discard nothing — safe fallback."""
    n = len(x)
    if n <= 4:
        return np.ones(n, dtype=bool)
    quad = [int(np.argmin(x)), int(np.argmax(y)), int(np.argmax(x)), int(np.argmin(y))]
    inside = np.ones(n, dtype=bool)
    for i in range(4):  # W -> N -> E -> S is CCW
        ax, ay = x[quad[i]], y[quad[i]]
        bx, by = x[quad[(i + 1) % 4]], y[quad[(i + 1) % 4]]
        inside &= (bx - ax) * (y - ay) - (by - ay) * (x - ax) > 0
    return ~inside


def convex_hull_by_nation(sf_dir: str):
    """Hull VERTEX SET per nation over the deterministic customer
    window (c_custkey < HULL_CUST_LIMIT), in integer microdegrees,
    sorted (c_nationkey, x_us, y_us).  Exact SQL twin: p is a hull
    vertex iff some directed edge (p -> q) has every other point
    strictly on its left — collinear points allowed only on the ray
    beyond q — which is precisely strict-chain vertex membership."""
    pts = _points_ds(sf_dir, "customer", "c_custkey", extra_cols=("c_nationkey",))

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["point_id"], HULL_CUST_LIMIT))
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = np.floor(t["lon"].to_numpy(zero_copy_only=False) * 1e6).astype(np.int64)
        y = np.floor(t["lat"].to_numpy(zero_copy_only=False) * 1e6).astype(np.int64)
        keep_n, keep_x, keep_y = [], [], []
        for key in np.unique(nk):  # bounded: <=25 nations per batch
            m = nk == key
            xs, ys = x[m], y[m]
            # distinct points only (duplicates break the vertex test)
            packed = (xs.astype(np.uint64) << np.uint64(32)) ^ (
                ys.astype(np.uint64) & np.uint64(0xFFFFFFFF)
            )
            _, uidx = np.unique(packed, return_index=True)
            xs, ys = xs[uidx], ys[uidx]
            shell = _quad_survivors(xs, ys)
            hx, hy = xs[shell], ys[shell]
            hidx = _hull_indices(hx, hy)
            keep_n.append(np.full(len(hidx), key, dtype=np.int64))
            keep_x.append(hx[hidx])
            keep_y.append(hy[hidx])
        if not keep_n:
            return pa.table(
                {
                    "c_nationkey": pa.array([], pa.int64()),
                    "x_us": pa.array([], pa.int64()),
                    "y_us": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "c_nationkey": pa.array(np.concatenate(keep_n)),
                "x_us": pa.array(np.concatenate(keep_x)),
                "y_us": pa.array(np.concatenate(keep_y)),
            }
        )

    parts = [
        b
        for b in pts.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow")
        if b.num_rows
    ]
    if not parts:
        return pa.table(
            {
                "c_nationkey": pa.array([], pa.int64()),
                "x_us": pa.array([], pa.int64()),
                "y_us": pa.array([], pa.int64()),
            }
        )
    whole = pa.concat_tables(parts)
    nk = whole["c_nationkey"].to_numpy()
    x = whole["x_us"].to_numpy()
    y = whole["y_us"].to_numpy()
    out_n, out_x, out_y = [], [], []
    for key in np.unique(nk):  # bounded: <=25 nations
        m = nk == key
        xs, ys = x[m], y[m]
        packed = (xs.astype(np.uint64) << np.uint64(32)) ^ (
            ys.astype(np.uint64) & np.uint64(0xFFFFFFFF)
        )
        _, uidx = np.unique(packed, return_index=True)
        xs, ys = xs[uidx], ys[uidx]
        hidx = _hull_indices(xs, ys)
        order = np.lexsort((ys[hidx], xs[hidx]))
        out_n.append(np.full(len(hidx), key, dtype=np.int64))
        out_x.append(xs[hidx][order])
        out_y.append(ys[hidx][order])
    return pa.table(
        {
            "c_nationkey": pa.array(np.concatenate(out_n)),
            "x_us": pa.array(np.concatenate(out_x)),
            "y_us": pa.array(np.concatenate(out_y)),
        }
    )


def convex_hull_by_nation_sql() -> str:
    x = f"CAST(floor(({synth_lon_sql('c_custkey')}) * 1000000) AS BIGINT)"
    y = f"CAST(floor(({synth_lat_sql('c_custkey')}) * 1000000) AS BIGINT)"
    return f"""
WITH pts AS (
  SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS nk, {x} AS x, {y} AS y
  FROM customer WHERE c_custkey < {HULL_CUST_LIMIT}
), singles AS (
  SELECT nk FROM pts GROUP BY nk HAVING count(*) = 1
)
SELECT p.nk AS c_nationkey, p.x AS x_us, p.y AS y_us
FROM pts p
WHERE EXISTS (
  SELECT 1 FROM pts q
  WHERE q.nk = p.nk AND (q.x <> p.x OR q.y <> p.y)
    AND NOT EXISTS (
      SELECT 1 FROM pts r
      WHERE r.nk = p.nk
        AND (r.x <> p.x OR r.y <> p.y) AND (r.x <> q.x OR r.y <> q.y)
        AND ( (q.x - p.x) * (r.y - p.y) - (q.y - p.y) * (r.x - p.x) < 0
              OR ( (q.x - p.x) * (r.y - p.y) - (q.y - p.y) * (r.x - p.x) = 0
                   AND (q.x - p.x) * (r.x - p.x)
                       + (q.y - p.y) * (r.y - p.y) <= 0 ) )
    )
)
   OR p.nk IN (SELECT nk FROM singles)
ORDER BY c_nationkey, x_us, y_us
"""


# ---------------------------------------------------------------------------
# IDW spatial interpolation: estimate a surface value at grid nodes
# from scattered points — the kriging-lite geostatistics primitive.
# Grid nodes are the DISTINCT integer-degree corners that contain data
# (bounded by the world grid at any corpus size); each node averages
# the points within 3 degrees weighted by 1/d².  Per-pair weights are
# floor-scaled to int64 BEFORE summation (floor(1e6·v/d²) /
# floor(1e6/d²)) so both engines sum identical integers in any order —
# the float-IDW made hash-comparable (rule 5 generalized to weights).
#
# Scale shape: node set rides ONE driver-merged bounded aggregate and
# broadcasts back as a sorted packed-key array (≤64800 keys); each
# point then probes its 7×7 neighbor corners vectorized (49 shifted
# membership tests per batch, no join, no exchange of the point side);
# the final (node → sums) aggregate is bounded and driver-merges.
# ---------------------------------------------------------------------------

IDW_RADIUS_DEG = 3.0
IDW_MIN_D2 = 0.0001  # exclude pathological near-node points (both engines)


def geo_idw_grid(sf_dir: str):
    import ray

    from ..stages.broadcast import with_broadcast

    ds = read_table(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])

    def derive(t: pa.Table) -> pa.Table:
        k = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "lat": pa.array(synthgeo.synth_lat(k)),
                "lon": pa.array(synthgeo.synth_lon(k)),
                "bal": pc.cast(t["c_acctbal"], pa.float64()),
            }
        )

    pts = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)

    # pass 1: bounded node set (distinct occupied integer corners)
    def corners(t: pa.Table) -> pa.Table:
        nlat = np.floor(t["lat"].to_numpy(zero_copy_only=False)).astype(np.int64)
        nlon = np.floor(t["lon"].to_numpy(zero_copy_only=False)).astype(np.int64)
        key = np.unique((nlat + 90) * 512 + (nlon + 200))
        return pa.table({"nkey": pa.array(key),
                         "one": pa.array(np.ones(len(key), dtype=np.int64))})

    nodes_tbl = grouped_sum(
        pts.map_batches(corners, batch_format="pyarrow", zero_copy_batch=True),
        ["nkey"],
        {"one": ("one", "min")},
        merge="driver",
    ).to_pandas()
    node_keys = np.sort(nodes_tbl["nkey"].values.astype(np.int64))
    ref = ray.put(node_keys)

    _OFFS = [(di, dj) for di in range(-3, 4) for dj in range(-3, 4)]

    def contrib(keys: np.ndarray, t: pa.Table) -> pa.Table:
        if len(keys) == 0:
            return pa.table(
                {
                    "nkey": pa.array([], pa.int64()),
                    "one": pa.array([], pa.int64()),
                    "num": pa.array([], pa.int64()),
                    "den": pa.array([], pa.int64()),
                }
            )
        lat = t["lat"].to_numpy(zero_copy_only=False)
        lon = t["lon"].to_numpy(zero_copy_only=False)
        bal = t["bal"].to_numpy(zero_copy_only=False)
        flat = np.floor(lat).astype(np.int64)
        flon = np.floor(lon).astype(np.int64)
        out_k, out_num, out_den = [], [], []
        for di, dj in _OFFS:
            nlat = flat + di
            nlon = flon + dj
            dlat = lat - nlat
            dlon = lon - nlon
            d2 = dlat * dlat + dlon * dlon
            # 512 stride / +200 offset: probe corners up to 3 deg
            # OUTSIDE the world lon range must not collide with a
            # real node's key ((nlat+90)*360 wrapped them; measured
            # as an sf0.1 hash mismatch)
            key = (nlat + 90) * 512 + (nlon + 200)
            pos = np.searchsorted(keys, key)
            pos_c = np.minimum(pos, len(keys) - 1)
            m = (
                (d2 <= IDW_RADIUS_DEG * IDW_RADIUS_DEG)
                & (d2 >= IDW_MIN_D2)
                & (keys[pos_c] == key)
            )
            if not m.any():
                continue
            out_k.append(key[m])
            out_num.append(np.floor(1000000.0 * bal[m] / d2[m]).astype(np.int64))
            out_den.append(np.floor(1000000.0 / d2[m]).astype(np.int64))
        if not out_k:
            return pa.table(
                {
                    "nkey": pa.array([], pa.int64()),
                    "one": pa.array([], pa.int64()),
                    "num": pa.array([], pa.int64()),
                    "den": pa.array([], pa.int64()),
                }
            )
        k = np.concatenate(out_k)
        return pa.table(
            {
                "nkey": pa.array(k),
                "one": pa.array(np.ones(len(k), dtype=np.int64)),
                "num": pa.array(np.concatenate(out_num)),
                "den": pa.array(np.concatenate(out_den)),
            }
        )

    agg = grouped_sum(
        pts.map_batches(
            with_broadcast(ref, contrib), batch_format="pyarrow", zero_copy_batch=True
        ),
        ["nkey"],
        {"n": ("one", "sum"), "num": ("num", "sum"), "den": ("den", "sum")},
        merge="driver",
    )

    def unpack(t: pa.Table) -> pa.Table:
        k = t["nkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "nlat": pa.array(k // 512 - 90),
                "nlon": pa.array(k % 512 - 200),
                "n": t["n"],
                "num": t["num"],
                "den": t["den"],
            }
        )

    return agg.map_batches(unpack, batch_format="pyarrow", zero_copy_batch=True).sort(
        ["nlat", "nlon"]
    )


GEO_IDW_GRID_SQL = f"""
WITH p AS (
  SELECT c_acctbal AS bal,
         {synth_lat_sql('CAST(c_custkey AS BIGINT)')} AS lat,
         {synth_lon_sql('CAST(c_custkey AS BIGINT)')} AS lon
  FROM customer
), g AS (
  SELECT DISTINCT CAST(floor(lat) AS BIGINT) AS nlat,
                  CAST(floor(lon) AS BIGINT) AS nlon
  FROM p
), j AS (
  SELECT g.nlat, g.nlon, p.bal,
         (p.lat - CAST(g.nlat AS DOUBLE)) * (p.lat - CAST(g.nlat AS DOUBLE))
         + (p.lon - CAST(g.nlon AS DOUBLE)) * (p.lon - CAST(g.nlon AS DOUBLE))
           AS d2
  FROM g JOIN p
    ON p.lat BETWEEN g.nlat - 3 AND g.nlat + 3
   AND p.lon BETWEEN g.nlon - 3 AND g.nlon + 3
)
SELECT nlat, nlon, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(1000000.0 * bal / d2) AS BIGINT)) AS BIGINT) AS num,
       CAST(sum(CAST(floor(1000000.0 / d2) AS BIGINT)) AS BIGINT) AS den
FROM j
WHERE d2 <= {IDW_RADIUS_DEG * IDW_RADIUS_DEG} AND d2 >= {IDW_MIN_D2}
GROUP BY 1, 2
ORDER BY 1, 2
"""
