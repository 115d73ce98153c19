"""GeoTIFF file sink + source over the tile table — REAL .tif binary
artifacts (functions/geotiff.py pure-Python codec) with the resumable
layout rule: one file per tile, deterministic names, skip-if-exists.

Scale shape: the write is a pure map over tile rows (zero shuffle) and
each task writes only its own tiles via atomic tmp+rename, so a failed
run resumes by re-running the same pipeline — finished tiles are
detected and skipped, matching the checkpoint convention of
state/checkpoint.py without needing the lineage table.  The manifest
returned is one small row per tile (path, bytes, written flag).

Reader: ray.data.read_binary_files(include_paths) → vectorized decode
back into the canonical tile-table schema (pipelines/rasterq.py).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..functions.geotiff import decode_geotiff, encode_geotiff


def write_geotiff_tiles(
    tiles_ds,
    out_dir: str,
    *,
    overwrite: bool = False,
    profile: dict | None = None,
):
    """Tile-table Dataset → one ``tile_<id>.tif`` per row under
    ``out_dir``.  Returns the manifest Dataset (tile_id, path, n_bytes,
    written); consume it (e.g. ``.materialize()``) to drive the write.

    Resumable: existing non-empty files are skipped unless
    ``overwrite=True``; writes are atomic (tmp + rename) so a killed
    run never leaves a torn tile visible.
    """
    os.makedirs(out_dir, exist_ok=True)
    prof = profile or {}
    bigtiff = str(prof.get("bigtiff", "YES")).upper() == "YES"
    bxs = int(prof.get("blockxsize", prof.get("blocksize", 512)))
    bys = int(prof.get("blockysize", prof.get("blocksize", 512)))
    compress = str(prof.get("compress", "deflate")).lower()
    zlevel = int(prof.get("zlevel", prof.get("level", 9)))

    def write_batch(t: pa.Table) -> pa.Table:
        data = t["data"]
        if isinstance(data, pa.ChunkedArray):
            data = data.combine_chunks()
        n = len(data)
        flat = data.flatten().to_numpy(zero_copy_only=False)
        widths = t["width"].to_numpy(zero_copy_only=False)
        heights = t["height"].to_numpy(zero_copy_only=False)
        counts = t["count"].to_numpy(zero_copy_only=False)
        crs = t["crs"].to_numpy(zero_copy_only=False)
        nodata = t["nodata"].to_numpy(zero_copy_only=False)
        ids = t["tile_id"].to_numpy(zero_copy_only=False)
        dtypes = t["dtype"].to_pylist()
        has_transform = "transform" in t.column_names
        if has_transform:
            trs = t["transform"].to_pylist()
        tx = t["tile_x"].to_numpy(zero_copy_only=False) if "tile_x" in t.column_names else None
        ty = t["tile_y"].to_numpy(zero_copy_only=False) if "tile_y" in t.column_names else None

        paths, n_bytes, written = [], [], []
        off = 0
        for r in range(n):
            npx = int(counts[r]) * int(heights[r]) * int(widths[r])
            arr = (
                np.asarray(flat[off : off + npx], dtype=np.dtype(dtypes[r]))
                .reshape(int(counts[r]), int(heights[r]), int(widths[r]))
            )
            off += npx
            if has_transform:
                transform = tuple(float(v) for v in trs[r])
            elif tx is not None and ty is not None:
                transform = (
                    1.0 / widths[r], 0.0, float(tx[r]) - 180.0,
                    0.0, -1.0 / heights[r], 90.0 - float(ty[r]),
                )
            else:
                transform = (1.0, 0.0, 0.0, 0.0, -1.0, 0.0)
            path = os.path.join(out_dir, f"tile_{int(ids[r])}.tif")
            paths.append(path)
            if not overwrite and os.path.exists(path) and os.path.getsize(path) > 0:
                n_bytes.append(os.path.getsize(path))
                written.append(False)
                continue
            payload = encode_geotiff(
                arr,
                transform,
                int(crs[r]),
                nodata=float(nodata[r]),
                bigtiff=bigtiff,
                blockxsize=bxs,
                blockysize=bys,
                compress=compress,
                zlevel=zlevel,
            )
            tmp = f"{path}.tmp.{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(payload)
            os.replace(tmp, path)
            n_bytes.append(len(payload))
            written.append(True)
        return pa.table(
            {
                "tile_id": t["tile_id"],
                "path": pa.array(paths, type=pa.string()),
                "n_bytes": pa.array(n_bytes, type=pa.int64()),
                "written": pa.array(written, type=pa.bool_()),
            }
        )

    return tiles_ds.map_batches(
        write_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def read_geotiff_tiles(in_dir: str, value_type: str = "int64"):
    """Directory of tile_<id>.tif → canonical tile-table Dataset
    (tile_id, data, crs, count, width, height, dtype, nodata,
    transform).

    ``value_type`` fixes the ``data`` list element type for EVERY
    block (CLAUDE.md rule 8: inter-block schema stability) — pass
    "float64" for float rasters; the per-file source dtype is kept in
    the ``dtype`` column for lossless reconstruction."""
    import ray.data

    if value_type not in ("int64", "float64"):
        raise ValueError(f"read_geotiff_tiles: value_type {value_type!r} unsupported")
    elem = pa.int64() if value_type == "int64" else pa.float64()
    np_elem = np.int64 if value_type == "int64" else np.float64

    ds = ray.data.read_binary_files(in_dir, include_paths=True)

    def decode_batch(t: pa.Table) -> pa.Table:
        rows: dict[str, list] = {
            "tile_id": [], "data": [], "crs": [], "count": [],
            "width": [], "height": [], "dtype": [], "nodata": [],
            "transform": [],
        }
        for path, payload in zip(t["path"].to_pylist(), t["bytes"].to_pylist()):
            arr, info = decode_geotiff(payload)
            base = os.path.basename(path)
            tile_id = int(base[len("tile_") : -len(".tif")])
            rows["tile_id"].append(tile_id)
            rows["data"].append(arr.ravel())
            rows["crs"].append(int(info["epsg"]))
            rows["count"].append(arr.shape[0])
            rows["width"].append(arr.shape[2])
            rows["height"].append(arr.shape[1])
            rows["dtype"].append(arr.dtype.name)
            rows["nodata"].append(
                float(info["nodata"]) if info["nodata"] is not None else float("nan")
            )
            rows["transform"].append(list(info["transform"]))
        return pa.table(
            {
                "tile_id": pa.array(rows["tile_id"], type=pa.int64()),
                "data": pa.array(
                    [np.asarray(v, dtype=np_elem) for v in rows["data"]],
                    type=pa.list_(elem),
                ),
                "crs": pa.array(rows["crs"], type=pa.int32()),
                "count": pa.array(rows["count"], type=pa.int32()),
                "width": pa.array(rows["width"], type=pa.int32()),
                "height": pa.array(rows["height"], type=pa.int32()),
                "dtype": pa.array(rows["dtype"], type=pa.string()),
                "nodata": pa.array(rows["nodata"], type=pa.float64()),
                "transform": pa.array(rows["transform"], type=pa.list_(pa.float64())),
            }
        )

    return ds.map_batches(decode_batch, batch_format="pyarrow", zero_copy_batch=True)
