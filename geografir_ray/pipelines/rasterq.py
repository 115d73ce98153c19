"""Raster pipelines over Ray Data: tile tables, zonal (per-tile) masked
stats, vector→raster burn, and a distributed conform_to stage.

Tile synthesis is deterministic from the ``part`` table (one 16x16
int tile per part row, pixel v = p_partkey*256 + i, nodata where
v % 7 == 0 — mirroring the reference's np.arange fixtures,
raster_test_helpers.py / test_raster_array.py:19-71), so DuckDB can
reproduce the pixels with generate_series and the oracle is exact.

Scale design: one row per tile (SURVEY.md §1.3 tile table); per-tile
stats are a pure map (no shuffle at all — the tile IS the partition);
burn aggregates co-partition on (tile, pixel) with per-batch combine.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import synthgeo
from ..functions.raster import (
    RasterArray,
    RasterMetadata,
    affine_from_bounds,
)
from ..sources.tables import read_table
from .common import grouped_sum

TILE_PX = 16
NODATA_MOD = 7  # pixel v is nodata when v % 7 == 0


def synth_tile_values(partkey: np.ndarray) -> np.ndarray:
    """(n, 256) int64 pixel values for each part-derived tile."""
    base = partkey.astype(np.int64)[:, None] * (TILE_PX * TILE_PX)
    return base + np.arange(TILE_PX * TILE_PX, dtype=np.int64)[None, :]


def tiles_dataset(sf_dir: str):
    """Tile table: one row per part row (tile_id, data, meta fields)."""
    ds = read_table(sf_dir, "part", columns=["p_partkey"])

    def build(t: pa.Table) -> pa.Table:
        pk = t["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        vals = synth_tile_values(pk)
        # tile georeference: row-major over a world grid, 1 deg / tile
        tx = pk % 360
        ty = (pk // 360) % 180
        return pa.table(
            {
                "tile_id": pa.array(pk),
                "data": pa.array(list(vals), type=pa.list_(pa.int64())),
                "crs": pa.array(np.full(len(pk), 4326, dtype=np.int32)),
                "count": pa.array(np.ones(len(pk), dtype=np.int32)),
                "width": pa.array(np.full(len(pk), TILE_PX, dtype=np.int32)),
                "height": pa.array(np.full(len(pk), TILE_PX, dtype=np.int32)),
                "dtype": pa.array(["int64"] * len(pk)),
                "nodata": pa.array(np.full(len(pk), -1.0)),
                "tile_x": pa.array(tx),
                "tile_y": pa.array(ty),
            }
        )

    return ds.map_batches(build, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Zonal / per-tile masked stats: sum + count of non-nodata pixels
# (pure map over tile rows — zero shuffle; the Ray-native shape of
# "RasterArray.masked reductions")
# ---------------------------------------------------------------------------


def raster_tile_stats(sf_dir: str):
    tiles = tiles_dataset(sf_dir)

    def stats(t: pa.Table) -> pa.Table:
        data = t["data"]
        if isinstance(data, pa.ChunkedArray):
            data = data.combine_chunks()
        n = len(data)
        vals = data.flatten().to_numpy(zero_copy_only=False).reshape(n, -1)
        mask = vals % NODATA_MOD == 0  # nodata rule
        valid = ~mask
        return pa.table(
            {
                "tile_id": t["tile_id"],
                "n_valid": pa.array(valid.sum(axis=1).astype(np.int64)),
                "sum_valid": pa.array(np.where(valid, vals, 0).sum(axis=1)),
                "max_valid": pa.array(np.where(valid, vals, np.iinfo(np.int64).min).max(axis=1)),
            }
        )

    return tiles.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True).sort(
        "tile_id"
    )


RASTER_TILE_STATS_SQL = f"""
SELECT p_partkey AS tile_id,
       CAST(count(*) FILTER (WHERE v % {NODATA_MOD} <> 0) AS BIGINT) AS n_valid,
       CAST(sum(v) FILTER (WHERE v % {NODATA_MOD} <> 0) AS BIGINT) AS sum_valid,
       CAST(max(v) FILTER (WHERE v % {NODATA_MOD} <> 0) AS BIGINT) AS max_valid
FROM (
  SELECT p_partkey, p_partkey * {TILE_PX * TILE_PX} + i AS v
  FROM part, generate_series(0, {TILE_PX * TILE_PX - 1}) AS t(i)
)
GROUP BY p_partkey
ORDER BY tile_id
"""


# ---------------------------------------------------------------------------
# Vector → raster burn: customer points binned to (tile, pixel) counts.
# Affine inverse = the same floor arithmetic the SQL twin uses.
# ---------------------------------------------------------------------------

BURN_TILE_DEG = 1.0


def raster_burn(sf_dir: str):
    ds = read_table(sf_dir, "customer", columns=["c_custkey"])

    def burn(t: pa.Table) -> pa.Table:
        k = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        lat = synthgeo.synth_lat(k)
        lon = synthgeo.synth_lon(k)
        gx = (lon + 180.0) / BURN_TILE_DEG
        gy = (lat + 90.0) / BURN_TILE_DEG
        tx = np.floor(gx).astype(np.int64)
        ty = np.floor(gy).astype(np.int64)
        px = np.floor((gx - np.floor(gx)) * TILE_PX).astype(np.int64)
        py = np.floor((gy - np.floor(gy)) * TILE_PX).astype(np.int64)
        return pa.table(
            {
                "tile_x": pa.array(tx),
                "tile_y": pa.array(ty),
                "px": pa.array(px),
                "py": pa.array(py),
                "one": pa.array(np.ones(len(k), dtype=np.int64)),
            }
        )

    ds = ds.map_batches(burn, batch_format="pyarrow", zero_copy_batch=True)
    agg = grouped_sum(
        ds, ["tile_x", "tile_y", "px", "py"], {"n_points": ("one", "sum")}
    )
    return agg.sort(["tile_y", "tile_x", "py", "px"])


def raster_burn_sql() -> str:
    lat = synthgeo.synth_lat_sql("c_custkey")
    lon = synthgeo.synth_lon_sql("c_custkey")
    gx = f"(({lon} + 180.0) / {BURN_TILE_DEG})"
    gy = f"(({lat} + 90.0) / {BURN_TILE_DEG})"
    return f"""
SELECT CAST(floor({gx}) AS BIGINT) AS tile_x,
       CAST(floor({gy}) AS BIGINT) AS tile_y,
       CAST(floor(({gx} - floor({gx})) * {TILE_PX}) AS BIGINT) AS px,
       CAST(floor(({gy} - floor({gy})) * {TILE_PX}) AS BIGINT) AS py,
       count(*) AS n_points
FROM customer
GROUP BY tile_x, tile_y, px, py
ORDER BY tile_y, tile_x, py, px
"""


# ---------------------------------------------------------------------------
# Distributed conform_to: every tile reprojected/resampled onto a
# shifted half-resolution reference grid (rows-only; kernel goldens are
# pinned by tests/test_raster.py against the reference's own arrays).
# The stage is the map_batches form of pipeline (A) in SURVEY.md §3.
# ---------------------------------------------------------------------------


_CONFORM_IDX_CACHE: dict[tuple, np.ndarray] = {}


def _conform_index_map() -> np.ndarray:
    """Flat src-pixel index for each in-bounds ref pixel.

    Every tile in this pipeline shares the same RELATIVE geometry
    (quarter-degree shift, half resolution), so the warp's gather
    indices are computed ONCE — by running the real
    RasterArray.conform_to kernel on an index tile — and then applied
    as a single vectorized gather across the whole batch (removes the
    per-tile Python loop flagged in VERDICT r1 item 7/10)."""
    key = (TILE_PX,)
    if key not in _CONFORM_IDX_CACHE:
        src_meta = RasterMetadata(
            4326, 1, TILE_PX, TILE_PX, np.int64, -1,
            affine_from_bounds(0.0, 0.0, 1.0, 1.0, TILE_PX, TILE_PX),
        )
        idx_tile = np.arange(TILE_PX * TILE_PX, dtype=np.int64).reshape(
            1, TILE_PX, TILE_PX
        )
        src = RasterArray(idx_tile, src_meta)
        ref_meta = RasterMetadata(
            4326, 1, TILE_PX // 2, TILE_PX // 2, np.int64, -1,
            affine_from_bounds(0.25, 0.25, 1.25, 1.25, TILE_PX // 2, TILE_PX // 2),
        )
        out = src.conform_to(
            RasterArray(np.zeros(ref_meta.shape, dtype=np.int64), ref_meta)
        )
        _CONFORM_IDX_CACHE[key] = out.array[~out.mask].astype(np.int64)
    return _CONFORM_IDX_CACHE[key]


def raster_conform(sf_dir: str):
    tiles = tiles_dataset(sf_dir)

    def conform(t: pa.Table) -> pa.Table:
        data = t["data"]
        if isinstance(data, pa.ChunkedArray):
            data = data.combine_chunks()
        n = len(data)
        vals = data.flatten().to_numpy(zero_copy_only=False).reshape(n, -1)
        src_idx = _conform_index_map()
        sub = vals[:, src_idx]  # (n_tiles, n_inbounds_ref_pixels) gather
        valid = sub % NODATA_MOD != 0  # nodata rule
        return pa.table(
            {
                "tile_id": t["tile_id"],
                "conform_sum": pa.array(np.where(valid, sub, 0).sum(axis=1)),
                "conform_valid": pa.array(valid.sum(axis=1).astype(np.int64)),
            }
        )

    return tiles.map_batches(conform, batch_format="pyarrow", zero_copy_batch=True).sort(
        "tile_id"
    )

# Exact DuckDB twin of raster_conform: the source/reference grids have
# identical RELATIVE geometry for every tile (quarter-degree shift,
# half resolution, north-up affines), so nearest-neighbor conform maps
# ref pixel (r, c) to src pixel (2r-3, 2c+5) — verified against the
# RasterArray.conform_to kernel — and the pixel values regenerate with
# generate_series exactly as in RASTER_TILE_STATS_SQL.
RASTER_CONFORM_SQL = f"""
SELECT p_partkey AS tile_id,
       CAST(coalesce(sum(v) FILTER (WHERE v % {NODATA_MOD} <> 0), 0) AS BIGINT) AS conform_sum,
       CAST(count(*) FILTER (WHERE v % {NODATA_MOD} <> 0) AS BIGINT) AS conform_valid
FROM (
  SELECT p_partkey,
         p_partkey * {TILE_PX * TILE_PX} + (2*r - 3) * {TILE_PX} + (2*c + 5) AS v
  FROM part, generate_series(2, 7) AS t1(r), generate_series(0, 5) AS t2(c)
)
GROUP BY p_partkey
ORDER BY tile_id
"""


# ---------------------------------------------------------------------------
# Bilinear conform: same grids as raster_conform (quarter-degree shift,
# half resolution) but resampling=bilinear.  On this geometry every ref
# pixel center lands exactly on a src pixel CORNER (srow_f = 2r-3,
# scol_f = 2c+5, both integral), so the bilinear kernel is four equal
# 0.25 weights over src pixels (2r-4+dr, 2c+4+dc) with nodata
# renormalization — i.e. the arithmetic mean of the valid neighbors.
# Exact integer parity: both engines emit per-pixel 12*sum/count
# (count in {1..4} divides 12) and sum per tile.
# ---------------------------------------------------------------------------


_BILINEAR_IDX_CACHE: dict[tuple, np.ndarray] = {}


def _conform_bilinear_index_map() -> np.ndarray:
    """(36, 4) flat src indices of each in-bounds ref pixel's four
    bilinear neighbors (ref r in 2..7, c in 0..5 — the same in-bounds
    region as the nearest conform; verified against the real
    RasterArray.conform_to bilinear kernel in tests/test_raster_queries)."""
    key = (TILE_PX,)
    if key not in _BILINEAR_IDX_CACHE:
        r = np.arange(2, 8, dtype=np.int64)
        c = np.arange(0, 6, dtype=np.int64)
        rr, cc = np.meshgrid(r, c, indexing="ij")
        i0 = (2 * rr - 4).ravel()
        j0 = (2 * cc + 4).ravel()
        nb = np.stack(
            [
                i0 * TILE_PX + j0,
                i0 * TILE_PX + j0 + 1,
                (i0 + 1) * TILE_PX + j0,
                (i0 + 1) * TILE_PX + j0 + 1,
            ],
            axis=1,
        )
        _BILINEAR_IDX_CACHE[key] = nb
    return _BILINEAR_IDX_CACHE[key]


def raster_conform_bilinear(sf_dir: str):
    tiles = tiles_dataset(sf_dir)

    def conform(t: pa.Table) -> pa.Table:
        data = t["data"]
        if isinstance(data, pa.ChunkedArray):
            data = data.combine_chunks()
        n = len(data)
        vals = data.flatten().to_numpy(zero_copy_only=False).reshape(n, -1)
        nb = vals[:, _conform_bilinear_index_map()]  # (n, 36, 4)
        valid = nb % NODATA_MOD != 0
        s = np.where(valid, nb, 0).sum(axis=2)
        cnt = valid.sum(axis=2)
        v12 = np.where(cnt > 0, (12 * s) // np.maximum(cnt, 1), 0)
        return pa.table(
            {
                "tile_id": t["tile_id"],
                "conform12_sum": pa.array(v12.sum(axis=1).astype(np.int64)),
                "conform_valid": pa.array((cnt > 0).sum(axis=1).astype(np.int64)),
            }
        )

    return tiles.map_batches(conform, batch_format="pyarrow", zero_copy_batch=True).sort(
        "tile_id"
    )


RASTER_CONFORM_BILINEAR_SQL = f"""
WITH nb AS (
  SELECT p_partkey, r, c,
         p_partkey * {TILE_PX * TILE_PX}
           + (2*r - 4 + dr) * {TILE_PX} + (2*c + 4 + dc) AS v
  FROM part,
       generate_series(2, 7) AS t1(r), generate_series(0, 5) AS t2(c),
       generate_series(0, 1) AS t3(dr), generate_series(0, 1) AS t4(dc)
),
px AS (
  SELECT p_partkey, r, c,
         coalesce(sum(v) FILTER (WHERE v % {NODATA_MOD} <> 0), 0) AS s,
         count(*) FILTER (WHERE v % {NODATA_MOD} <> 0) AS cnt
  FROM nb GROUP BY 1, 2, 3
)
SELECT p_partkey AS tile_id,
       CAST(coalesce(sum((12 * s) // cnt) FILTER (WHERE cnt > 0), 0) AS BIGINT)
         AS conform12_sum,
       CAST(count(*) FILTER (WHERE cnt > 0) AS BIGINT) AS conform_valid
FROM px
GROUP BY 1
ORDER BY tile_id
"""


# ---------------------------------------------------------------------------
# COG-style overview: nodata-aware 2x downsample per tile (the first
# pyramid level the reference's COG profile implies —
# /root/reference/raster_array/src/raster_array/profiles.py block/
# overview constants).  Pure map over tile rows — zero shuffle; every
# output pixel carries the valid-sum and valid-count of its 2x2 block
# in exact integers.
# ---------------------------------------------------------------------------


def raster_overview(sf_dir: str):
    tiles = tiles_dataset(sf_dir)
    half = TILE_PX // 2

    def overview(t: pa.Table) -> pa.Table:
        data = t["data"]
        if isinstance(data, pa.ChunkedArray):
            data = data.combine_chunks()
        n = len(data)
        vals = data.flatten().to_numpy(zero_copy_only=False).reshape(
            n, TILE_PX, TILE_PX
        )
        valid = vals % NODATA_MOD != 0
        v4 = vals.reshape(n, half, 2, half, 2)
        m4 = valid.reshape(n, half, 2, half, 2)
        s = np.where(m4, v4, 0).sum(axis=(2, 4))  # (n, half, half)
        c = m4.sum(axis=(2, 4)).astype(np.int64)
        tid = np.repeat(
            t["tile_id"].to_numpy(zero_copy_only=False).astype(np.int64),
            half * half,
        )
        py = np.tile(np.repeat(np.arange(half, dtype=np.int64), half), n)
        px = np.tile(np.tile(np.arange(half, dtype=np.int64), half), n)
        return pa.table(
            {
                "tile_id": pa.array(tid),
                "py": pa.array(py),
                "px": pa.array(px),
                "ov_sum": pa.array(s.reshape(-1)),
                "n_valid": pa.array(c.reshape(-1)),
            }
        )

    return tiles.map_batches(
        overview, batch_format="pyarrow", zero_copy_batch=True
    ).sort(["tile_id", "py", "px"])


RASTER_OVERVIEW_SQL = f"""
SELECT p_partkey AS tile_id,
       (i // {TILE_PX}) // 2 AS py,
       (i % {TILE_PX}) // 2 AS px,
       CAST(COALESCE(sum(v) FILTER (WHERE v % {NODATA_MOD} <> 0), 0) AS BIGINT)
         AS ov_sum,
       CAST(count(*) FILTER (WHERE v % {NODATA_MOD} <> 0) AS BIGINT) AS n_valid
FROM (
  SELECT p_partkey, i, p_partkey * {TILE_PX * TILE_PX} + i AS v
  FROM part, generate_series(0, {TILE_PX * TILE_PX - 1}) AS t(i)
)
GROUP BY 1, 2, 3
ORDER BY tile_id, py, px
"""


# ---------------------------------------------------------------------------
# GeoTIFF round trip (REAL binary I/O): every tile is encoded to
# GeoTIFF bytes with the pure-Python codec (functions/geotiff.py,
# reference writer profile: tiled/deflate-9/BigTIFF/pixel) and decoded
# back before the stats run — so the EXACT SQL oracle covers the whole
# binary path, not just the array math.  Per-tile encode/decode is a
# pure map: zero shuffle, trivially parallel at any corpus size.
# ---------------------------------------------------------------------------


def raster_geotiff_stats(sf_dir: str):
    from ..functions.geotiff import decode_geotiff, encode_geotiff

    tiles = tiles_dataset(sf_dir)

    def roundtrip_stats(t: pa.Table) -> pa.Table:
        data = t["data"]
        if isinstance(data, pa.ChunkedArray):
            data = data.combine_chunks()
        n = len(data)
        vals = data.flatten().to_numpy(zero_copy_only=False).reshape(n, -1)
        tx = t["tile_x"].to_numpy(zero_copy_only=False)
        ty = t["tile_y"].to_numpy(zero_copy_only=False)
        n_valid = np.empty(n, dtype=np.int64)
        sum_valid = np.empty(n, dtype=np.int64)
        max_valid = np.empty(n, dtype=np.int64)
        ok_geo = np.empty(n, dtype=np.int64)
        for r in range(n):
            arr = vals[r].reshape(1, TILE_PX, TILE_PX)
            transform = (
                1.0 / TILE_PX, 0.0, float(tx[r]) - 180.0,
                0.0, -1.0 / TILE_PX, 90.0 - float(ty[r]),
            )
            tif = encode_geotiff(arr, transform, 4326, nodata=-1.0)
            back, info = decode_geotiff(tif)
            dec = back[0].reshape(-1)
            valid = dec % NODATA_MOD != 0
            n_valid[r] = int(valid.sum())
            sum_valid[r] = int(dec[valid].sum())
            max_valid[r] = int(dec[valid].max())
            ok_geo[r] = int(
                (dec == vals[r]).all()
                and info["epsg"] == 4326
                and info["nodata"] == -1.0
                and np.allclose(info["transform"], transform)
            )
        return pa.table(
            {
                "tile_id": t["tile_id"],
                "n_valid": pa.array(n_valid),
                "sum_valid": pa.array(sum_valid),
                "max_valid": pa.array(max_valid),
                "roundtrip_ok": pa.array(ok_geo),
            }
        )

    return tiles.map_batches(
        roundtrip_stats, batch_format="pyarrow", zero_copy_batch=True
    ).sort("tile_id")


RASTER_GEOTIFF_STATS_SQL = f"""
SELECT p_partkey AS tile_id,
       CAST(count(*) FILTER (WHERE v % {NODATA_MOD} <> 0) AS BIGINT) AS n_valid,
       CAST(sum(v) FILTER (WHERE v % {NODATA_MOD} <> 0) AS BIGINT) AS sum_valid,
       CAST(max(v) FILTER (WHERE v % {NODATA_MOD} <> 0) AS BIGINT) AS max_valid,
       CAST(1 AS BIGINT) AS roundtrip_ok
FROM (
  SELECT p_partkey, p_partkey * {TILE_PX * TILE_PX} + i AS v
  FROM part, generate_series(0, {TILE_PX * TILE_PX - 1}) AS t(i)
)
GROUP BY p_partkey
ORDER BY tile_id
"""


# ---------------------------------------------------------------------------
# Focal (neighborhood) raster op with cross-tile HALO EXCHANGE: 3x3
# valid-masked box sum over the global pixel grid.  The distributed-
# raster pattern none of the per-tile ops need: a pixel's window spans
# tile borders, so tiles must exchange edge strips.
# ---------------------------------------------------------------------------

FOCAL_BUCKETS = 64



# ---------------------------------------------------------------------------
# Shared focal-kernel machinery: halo exchange + padded-mosaic assembly
# (used by raster_focal_sum and raster_slope — any 3x3-neighborhood
# kernel is one more tail over the same (tiles, 18, 18) pads).
# ---------------------------------------------------------------------------

def _focal_halo(t: pa.Table, n_buckets: int = FOCAL_BUCKETS) -> pa.Table:
    data = t["data"]
    if isinstance(data, pa.ChunkedArray):
        data = data.combine_chunks()
    n = len(data)
    vals = data.flatten().to_numpy(zero_copy_only=False).reshape(
        n, TILE_PX, TILE_PX
    )
    tid = t["tile_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    # WRAPPED world-grid coordinates (tiles_dataset's georeference):
    # tiles whose ids exceed 360*180 overlay earlier world cells, and
    # the SQL twin joins on the wrapped (gx, gy) — so every exchange
    # key here is the wrapped world CELL, with the emitting tile_id
    # carried alongside so output stays per source tile.
    tx = tid % 360
    ty = (tid // 360) % 180
    wcell = ty * 360 + tx
    out_dest, out_kind, out_src, out_vals = [], [], [], []
    # kind 0: the tile body itself (256 px)
    out_dest.append(wcell)
    out_kind.append(np.zeros(n, dtype=np.int8))
    out_src.append(tid)
    out_vals.append(vals.reshape(n, -1))
    # kinds 1..8: strips to each neighbor  (dx, dy, slice)
    strips = [
        (1, -1, 0, np.s_[:, :, :1]),    # W neighbor gets our left col
        (2, 1, 0, np.s_[:, :, -1:]),    # E neighbor gets our right col
        (3, 0, -1, np.s_[:, :1, :]),    # S (lower ty) gets our bottom row
        (4, 0, 1, np.s_[:, -1:, :]),    # N gets our top row
        (5, -1, -1, np.s_[:, :1, :1]),  # SW corner
        (6, 1, -1, np.s_[:, :1, -1:]),  # SE corner
        (7, -1, 1, np.s_[:, -1:, :1]),  # NW corner
        (8, 1, 1, np.s_[:, -1:, -1:]),  # NE corner
    ]
    for kind, dx, dy, sl in strips:
        ntx, nty = tx + dx, ty + dy
        ok = (ntx >= 0) & (ntx < 360) & (nty >= 0) & (nty < 180)
        dest = nty * 360 + ntx
        strip = vals[sl].reshape(n, -1)
        out_dest.append(dest[ok])
        out_kind.append(np.full(int(ok.sum()), kind, dtype=np.int8))
        out_src.append(np.full(int(ok.sum()), -1, dtype=np.int64))
        out_vals.append(strip[ok])
    dest = np.concatenate(out_dest)
    kind = np.concatenate(out_kind)
    src = np.concatenate(out_src)
    flat_parts = [v.ravel() for v in out_vals]
    lens = np.concatenate(
        [np.full(v.shape[0], v.shape[1], dtype=np.int64) for v in out_vals]
    )
    offs = np.r_[0, np.cumsum(lens)]
    return pa.table(
        {
            "dest": pa.array(dest),
            "bucket": pa.array(
                ((dest * np.int64(2654435761)) % np.int64(n_buckets) + n_buckets)
                % n_buckets
            ),
            "kind": pa.array(kind),
            "src": pa.array(src),
            "vals": pa.ListArray.from_arrays(
                pa.array(offs, type=pa.int64()), pa.array(np.concatenate(flat_parts))
            ),
        }
    )


_PLACE = {
    0: (np.s_[1:17, 1:17], (TILE_PX, TILE_PX)),
    1: (np.s_[1:17, 17:18], (TILE_PX, 1)),   # from E emitter's view: W nbr
    2: (np.s_[1:17, 0:1], (TILE_PX, 1)),
    3: (np.s_[17:18, 1:17], (1, TILE_PX)),
    4: (np.s_[0:1, 1:17], (1, TILE_PX)),
    5: (np.s_[17:18, 17:18], (1, 1)),
    6: (np.s_[17:18, 0:1], (1, 1)),
    7: (np.s_[0:1, 17:18], (1, 1)),
    8: (np.s_[0:1, 0:1], (1, 1)),
}


def _accumulate_pads(t: pa.Table):
    if t.num_rows == 0:
        return None
    dest = t["dest"].to_numpy(zero_copy_only=False).astype(np.int64)
    kind = t["kind"].to_numpy(zero_copy_only=False)
    src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    vcol = t["vals"]
    if isinstance(vcol, pa.ChunkedArray):
        vcol = vcol.combine_chunks()
    flat = vcol.flatten().to_numpy(zero_copy_only=False)
    offs = vcol.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    # world cells that actually exist = have >= 1 kind-0 body row
    body_rows = np.flatnonzero(kind == 0)
    uniq = np.unique(dest[body_rows])
    m = len(uniq)
    if m == 0:  # bucket holds only strips to absent world cells
        return None
    # accumulate per-SOURCE-valid contributions: each contributing
    # pixel counts iff its own value v % NODATA_MOD != 0, and
    # overlaying tiles (wrapped ids) ADD — exactly the SQL twin's
    # LEFT JOIN against the valid-pixel mosaic.
    vsum = np.zeros((m, TILE_PX + 2, TILE_PX + 2), dtype=np.int64)
    vcnt = np.zeros((m, TILE_PX + 2, TILE_PX + 2), dtype=np.int64)
    for k, (sl, shape) in _PLACE.items():
        rows = np.flatnonzero(kind == k)
        if rows.size == 0:
            continue
        # drop strips destined to absent world cells (no body)
        p = np.searchsorted(uniq, dest[rows])
        p_ok = (p < m) & (uniq[np.minimum(p, m - 1)] == dest[rows])
        rows = rows[p_ok]
        if rows.size == 0:
            continue
        idx = p[p_ok]
        L = shape[0] * shape[1]
        gather = offs[rows][:, None] + np.arange(L, dtype=np.int64)[None, :]
        chunk = flat[gather].reshape(len(rows), *shape)
        ok = chunk % NODATA_MOD != 0
        masked = np.where(ok, chunk, 0)
        cnt = ok.astype(np.int64)
        if len(np.unique(idx)) == len(idx):
            # no overlay at this (cell, kind): fast fancy-index add
            vsum[(idx, *sl)] += masked
            vcnt[(idx, *sl)] += cnt
        else:
            np.add.at(vsum, (idx, *sl), masked)
            np.add.at(vcnt, (idx, *sl), cnt)
    return uniq, vsum, vcnt, dest, src, body_rows



def raster_focal_sum(sf_dir: str, n_buckets: int = FOCAL_BUCKETS):
    """3x3 focal sum/count of VALID (non-nodata) pixels over the global
    mosaic, per pixel.  Missing neighbor tiles contribute nothing (the
    mosaic is sparse); nodata pixels are excluded from every window.

    Scale design — halo exchange, not tile replication: each tile
    emits its full body to ITS OWN key plus only the 8 edge strips its
    neighbors need (2x16 + 2x16 + 4 = 68 px vs 8x256 for whole-tile
    replication).  Both streams co-partition on hash(dest_tile) % B
    bounded buckets; inside a bucket every destination tile assembles
    an 18x18 padded array and the 3x3 window reduces as 9 shifted adds
    over the whole (tiles, 18, 18) stack — no per-pixel Python, no
    per-tile call.  Strips destined to absent tiles are dropped by the
    center-presence filter.  The SQL twin computes the same windows by
    9-way equi-join on global pixel coordinates."""
    tiles = tiles_dataset(sf_dir)

    _OUT = pa.schema(
        [
            ("tile_id", pa.int64()),
            ("pix", pa.int64()),
            ("focal_sum", pa.int64()),
            ("n_valid", pa.int64()),
        ]
    )

    def halo(t: pa.Table) -> pa.Table:
        return _focal_halo(t, n_buckets)

    def assemble(t: pa.Table) -> pa.Table:
        acc = _accumulate_pads(t)
        if acc is None:
            return _OUT.empty_table()
        uniq, vsum, vcnt, dest, src, body_rows = acc
        m = len(uniq)
        fs = np.zeros((m, TILE_PX, TILE_PX), dtype=np.int64)
        nv = np.zeros((m, TILE_PX, TILE_PX), dtype=np.int64)
        for dy in (0, 1, 2):
            for dx in (0, 1, 2):
                fs += vsum[:, dy : dy + TILE_PX, dx : dx + TILE_PX]
                nv += vcnt[:, dy : dy + TILE_PX, dx : dx + TILE_PX]
        # one output stripe per SOURCE tile: every tile overlaying a
        # world cell reads that cell's mosaic windows
        out_tiles = src[body_rows]
        cell_idx = np.searchsorted(uniq, dest[body_rows])
        nt = len(out_tiles)
        pix = np.tile(np.arange(TILE_PX * TILE_PX, dtype=np.int64), nt)
        return pa.table(
            {
                "tile_id": pa.array(np.repeat(out_tiles, TILE_PX * TILE_PX)),
                "pix": pa.array(pix),
                "focal_sum": pa.array(fs[cell_idx].reshape(-1)),
                "n_valid": pa.array(nv[cell_idx].reshape(-1)),
            }
        )

    out = (
        tiles.map_batches(halo, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(assemble, batch_format="pyarrow")
    )
    return out.repartition(8).sort(["tile_id", "pix"])


RASTER_FOCAL_SUM_SQL = f"""
WITH px AS (
  SELECT p_partkey AS tile_id, i,
         (p_partkey % 360) * {TILE_PX} + (i % {TILE_PX}) AS gx,
         ((p_partkey // 360) % 180) * {TILE_PX} + (i // {TILE_PX}) AS gy,
         p_partkey * {TILE_PX * TILE_PX} + i AS v
  FROM part, generate_series(0, {TILE_PX * TILE_PX - 1}) AS t(i)
),
valid AS (SELECT gx, gy, v FROM px WHERE v % {NODATA_MOD} <> 0),
offs AS (SELECT dx, dy FROM (VALUES (-1),(0),(1)) a(dx), (VALUES (-1),(0),(1)) b(dy))
SELECT a.tile_id,
       CAST(a.i AS BIGINT) AS pix,
       CAST(COALESCE(sum(b.v), 0) AS BIGINT) AS focal_sum,
       CAST(count(b.v) AS BIGINT) AS n_valid
FROM px a
CROSS JOIN offs o
LEFT JOIN valid b ON b.gx = a.gx + o.dx AND b.gy = a.gy + o.dy
GROUP BY a.tile_id, a.i
ORDER BY tile_id, pix
"""


# ---------------------------------------------------------------------------
# raster_slope: central-difference gradient over the valid mosaic —
# a second 3x3 kernel on the SAME halo-exchange machinery
# (_focal_halo + _accumulate_pads), proving the pads generalize past
# sum/count.  dx = E - W, dy = N - S over the SUMMED valid mosaic
# (invalid/absent neighbors contribute 0, exactly the SQL twin's
# COALESCE(LEFT JOIN, 0)); mag2 = dx^2 + dy^2 stays int64-exact at
# every tested scale (|v| <= partkey*65536 + 256 -> dx^2 < 2^62).
# ---------------------------------------------------------------------------


def raster_slope(sf_dir: str, n_buckets: int = FOCAL_BUCKETS):
    tiles = tiles_dataset(sf_dir)

    _OUT = pa.schema(
        [
            ("tile_id", pa.int64()),
            ("pix", pa.int64()),
            ("dx", pa.int64()),
            ("dy", pa.int64()),
            ("mag2", pa.int64()),
        ]
    )

    def halo(t: pa.Table) -> pa.Table:
        return _focal_halo(t, n_buckets)

    def assemble(t: pa.Table) -> pa.Table:
        acc = _accumulate_pads(t)
        if acc is None:
            return _OUT.empty_table()
        uniq, vsum, _vcnt, dest, src, body_rows = acc
        # pad layout: row index grows with gy, col with gx (see _PLACE)
        dx = vsum[:, 1:17, 2:18] - vsum[:, 1:17, 0:16]
        dy = vsum[:, 2:18, 1:17] - vsum[:, 0:16, 1:17]
        assert int(np.abs(dx).max(initial=0)) < (1 << 31) and int(
            np.abs(dy).max(initial=0)
        ) < (1 << 31), "gradient exceeds int64-exact square range"
        mag2 = dx * dx + dy * dy
        out_tiles = src[body_rows]
        cell_idx = np.searchsorted(uniq, dest[body_rows])
        nt = len(out_tiles)
        pix = np.tile(np.arange(TILE_PX * TILE_PX, dtype=np.int64), nt)
        return pa.table(
            {
                "tile_id": pa.array(np.repeat(out_tiles, TILE_PX * TILE_PX)),
                "pix": pa.array(pix),
                "dx": pa.array(dx[cell_idx].reshape(-1)),
                "dy": pa.array(dy[cell_idx].reshape(-1)),
                "mag2": pa.array(mag2[cell_idx].reshape(-1)),
            }
        )

    out = (
        tiles.map_batches(halo, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(assemble, batch_format="pyarrow")
    )
    return out.repartition(8).sort(["tile_id", "pix"])


RASTER_SLOPE_SQL = f"""
WITH px AS (
  SELECT p_partkey AS tile_id, i,
         (p_partkey % 360) * {TILE_PX} + (i % {TILE_PX}) AS gx,
         ((p_partkey // 360) % 180) * {TILE_PX} + (i // {TILE_PX}) AS gy,
         p_partkey * {TILE_PX * TILE_PX} + i AS v
  FROM part, generate_series(0, {TILE_PX * TILE_PX - 1}) AS t(i)
),
vsum AS (
  SELECT gx, gy, sum(v) AS v FROM px WHERE v % {NODATA_MOD} <> 0 GROUP BY 1, 2
)
SELECT a.tile_id, CAST(a.i AS BIGINT) AS pix,
       CAST(COALESCE(e.v, 0) - COALESCE(w.v, 0) AS BIGINT) AS dx,
       CAST(COALESCE(n.v, 0) - COALESCE(s.v, 0) AS BIGINT) AS dy,
       CAST((COALESCE(e.v, 0) - COALESCE(w.v, 0)) * (COALESCE(e.v, 0) - COALESCE(w.v, 0))
          + (COALESCE(n.v, 0) - COALESCE(s.v, 0)) * (COALESCE(n.v, 0) - COALESCE(s.v, 0))
         AS BIGINT) AS mag2
FROM px a
LEFT JOIN vsum e ON e.gx = a.gx + 1 AND e.gy = a.gy
LEFT JOIN vsum w ON w.gx = a.gx - 1 AND w.gy = a.gy
LEFT JOIN vsum n ON n.gx = a.gx AND n.gy = a.gy + 1
LEFT JOIN vsum s ON s.gx = a.gx AND s.gy = a.gy - 1
ORDER BY tile_id, pix
"""


# ---------------------------------------------------------------------------
# raster_regions: raster -> vector POLYGONIZE — connected regions of
# "lit" mosaic pixels (valid-sum msum % 11 < 4, ~36% density: below
# the 4-adjacency percolation threshold, so regions stay small) with
# per-region pixel count and value sum, region id = min global pixel
# key.  Composes the two existing distributed engines: the focal
# halo exchange (_focal_halo/_accumulate_pads gives every world cell
# its 1-px neighbor rim, so CROSS-TILE adjacency needs no second
# exchange) feeding min-label connected components
# (stages/components.py).  Each undirected E/S edge is emitted exactly
# once by the cell owning its west/south pixel; the SQL twin is the
# same mosaic -> lit -> adjacency -> recursive-CTE min label.
# ---------------------------------------------------------------------------

REGION_MOD = 11
REGION_LIT = 4
_WORLD_W = 360 * TILE_PX  # global pixel key stride (gy * W + gx)


def raster_regions(sf_dir: str, n_buckets: int = FOCAL_BUCKETS):
    from ..stages.components import min_label_components
    from ..stages.join import hash_join
    from .common import grouped_sum

    tiles = tiles_dataset(sf_dir)

    _PART = pa.schema(
        [("kind", pa.int8()), ("a", pa.int64()), ("b", pa.int64()), ("val", pa.int64())]
    )

    def halo(t: pa.Table) -> pa.Table:
        return _focal_halo(t, n_buckets)

    def assemble(t: pa.Table) -> pa.Table:
        acc = _accumulate_pads(t)
        if acc is None:
            return _PART.empty_table()
        uniq, vsum, vcnt, dest, src, body_rows = acc
        center = vsum[:, 1:17, 1:17]
        lit = (vcnt[:, 1:17, 1:17] > 0) & (center % REGION_MOD < REGION_LIT)
        ty, tx = uniq // 360, uniq % 360
        gx = (tx * TILE_PX)[:, None, None] + np.arange(TILE_PX, dtype=np.int64)[
            None, None, :
        ]
        gy = (ty * TILE_PX)[:, None, None] + np.arange(TILE_PX, dtype=np.int64)[
            None, :, None
        ]
        key = gy * _WORLD_W + gx
        east_lit = (vcnt[:, 1:17, 2:18] > 0) & (
            vsum[:, 1:17, 2:18] % REGION_MOD < REGION_LIT
        )
        north_lit = (vcnt[:, 2:18, 1:17] > 0) & (
            vsum[:, 2:18, 1:17] % REGION_MOD < REGION_LIT
        )
        e_edge = lit & east_lit
        n_edge = lit & north_lit
        ka, kb, vv = [], [], []
        # kind 0: lit nodes with their mosaic value
        ka.append(key[lit])
        kb.append(np.full(int(lit.sum()), -1, dtype=np.int64))
        vv.append(center[lit])
        kinds = [np.zeros(int(lit.sum()), dtype=np.int8)]
        # kind 1: adjacency, both directions for the propagate engine
        for m, nbr in ((e_edge, key + 1), (n_edge, key + _WORLD_W)):
            cnt = int(m.sum())
            ka.append(key[m])
            kb.append(nbr[m])
            ka.append(nbr[m])
            kb.append(key[m])
            vv.append(np.zeros(2 * cnt, dtype=np.int64))
            kinds.append(np.ones(2 * cnt, dtype=np.int8))
        return pa.table(
            {
                "kind": pa.array(np.concatenate(kinds)),
                "a": pa.array(np.concatenate(ka)),
                "b": pa.array(np.concatenate(kb)),
                "val": pa.array(np.concatenate(vv)),
            }
        )

    parts = (
        tiles.map_batches(halo, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(assemble, batch_format="pyarrow")
        .materialize()
    )
    nodes = parts.map_batches(
        lambda t: pa.table(
            {
                "node": t.filter(pc.equal(t["kind"], 0))["a"],
                "val": t.filter(pc.equal(t["kind"], 0))["val"],
            }
        ),
        batch_format="pyarrow",
    )
    labels0 = nodes.map_batches(
        lambda t: pa.table({"node": t["node"], "label": t["node"]}),
        batch_format="pyarrow",
    )
    edges = parts.map_batches(
        lambda t: pa.table(
            {
                "node": t.filter(pc.equal(t["kind"], 1))["a"],
                "dst": t.filter(pc.equal(t["kind"], 1))["b"],
            }
        ),
        batch_format="pyarrow",
    )
    labels = min_label_components(edges, labels0, op_name="raster_regions")
    lv = hash_join(
        labels,
        nodes,
        on="node",
        left_cols=["node", "label"],
        right_cols=["node", "val"],
    )

    def one(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "region": t["label"],
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "val": t["val"],
            }
        )

    agg = grouped_sum(
        lv.map_batches(one, batch_format="pyarrow", zero_copy_batch=True),
        ["region"],
        {"n_px": ("one", "sum"), "sum_val": ("val", "sum")},
    )
    return agg.repartition(8).sort("region")


RASTER_REGIONS_SQL = f"""
WITH RECURSIVE px AS (
  SELECT (p_partkey % 360) * {TILE_PX} + (i % {TILE_PX}) AS gx,
         ((p_partkey // 360) % 180) * {TILE_PX} + (i // {TILE_PX}) AS gy,
         p_partkey * {TILE_PX * TILE_PX} + i AS v
  FROM part, generate_series(0, {TILE_PX * TILE_PX - 1}) AS t(i)
),
mosaic AS (
  SELECT gx, gy, sum(v) AS msum FROM px WHERE v % {NODATA_MOD} <> 0
  GROUP BY gx, gy
),
lit AS (
  SELECT gx, gy, gy * {_WORLD_W} + gx AS key, msum
  FROM mosaic WHERE msum % {REGION_MOD} < {REGION_LIT}
),
pairs AS (
  SELECT a.key AS a, b.key AS b FROM lit a
  JOIN lit b ON b.gx = a.gx + 1 AND b.gy = a.gy
  UNION ALL
  SELECT a.key, b.key FROM lit a
  JOIN lit b ON b.gx = a.gx AND b.gy = a.gy + 1
),
edges AS (
  SELECT a AS src, b AS dst FROM pairs
  UNION ALL SELECT b, a FROM pairs
),
reach(node, label) AS (
  SELECT key, key FROM lit
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
),
lab AS (SELECT node, MIN(label) AS region FROM reach GROUP BY node)
SELECT CAST(lab.region AS BIGINT) AS region,
       CAST(count(*) AS BIGINT) AS n_px,
       CAST(sum(l.msum) AS BIGINT) AS sum_val
FROM lab JOIN lit l ON l.key = lab.node
GROUP BY 1 ORDER BY 1
"""
