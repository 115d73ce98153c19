"""Real GeoTIFF binary I/O: pure-Python codec (TIFF 6.0 + BigTIFF +
GeoKeys + GDAL_NODATA), RasterArray bridge, and the resumable .tif
file sink/source."""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pytest

from geografir_ray.functions.geotiff import (
    decode_geotiff,
    encode_geotiff,
    raster_from_geotiff,
    raster_to_geotiff,
)


@pytest.mark.parametrize("bigtiff", [True, False])
@pytest.mark.parametrize("compress", ["deflate", "none"])
@pytest.mark.parametrize("interleave", ["pixel", "band"])
def test_round_trip_matrix(bigtiff, compress, interleave):
    rng = np.random.default_rng(9)
    cases = [
        (rng.integers(0, 255, (1, 16, 16)).astype(np.uint8),
         (1.0, 0, 10.0, 0, -1.0, 50.0), 4326, -1.0),
        (rng.integers(-9999, 9999, (3, 40, 33)).astype(np.int16),
         (30.0, 0, 500000.0, 0, -30.0, 4649776.0), 32633, -9999.0),
        ((rng.standard_normal((2, 50, 77)) * 10).astype(np.float32),
         (0.5, 0, -180.0, 0, -0.5, 90.0), 4326, float("nan")),
        (rng.integers(0, 2**40, (1, 40, 530)).astype(np.int64),
         (1.0, 0, 0.0, 0, -1.0, 0.0), 3857, -1.0),
    ]
    for arr, tr, epsg, nd in cases:
        data = encode_geotiff(
            arr, tr, epsg, nd, bigtiff=bigtiff, compress=compress,
            interleave=interleave,
        )
        back, info = decode_geotiff(data)
        assert back.shape == arr.shape and back.dtype == arr.dtype
        assert np.array_equal(back, arr, equal_nan=arr.dtype.kind == "f")
        assert info["epsg"] == epsg
        assert np.allclose(info["transform"], tr)
        assert (np.isnan(info["nodata"]) if np.isnan(nd) else info["nodata"] == nd)
        assert info["bigtiff"] == bigtiff and info["interleave"] == interleave


def test_rotated_affine_uses_transformation_tag():
    arr = np.arange(25, dtype=np.float64).reshape(1, 5, 5)
    tr = (2.0, 0.1, 5.0, 0.2, -2.0, 7.0)
    back, info = decode_geotiff(encode_geotiff(arr, tr, 4326))
    assert np.allclose(info["transform"], tr)
    assert np.array_equal(back, arr)
    assert info["nodata"] is None


def test_multiple_tiles_and_edge_padding():
    """Raster larger than one 16x16 tile block with non-multiple edges:
    tile reassembly must drop the padding exactly."""
    rng = np.random.default_rng(4)
    arr = rng.integers(0, 1000, (2, 37, 53)).astype(np.int32)
    data = encode_geotiff(
        arr, (1.0, 0, 0.0, 0, -1.0, 0.0), 4326, blockxsize=16, blockysize=16
    )
    back, info = decode_geotiff(data)
    assert np.array_equal(back, arr)


def test_deterministic_golden():
    arr = np.arange(256, dtype=np.uint8).reshape(1, 16, 16)
    data = encode_geotiff(arr, (1.0, 0, 10.0, 0, -1.0, 50.0), 4326, -1.0)
    assert hashlib.sha256(data).hexdigest()[:16] == "8cb9ea80706fbc09"


def test_reads_foreign_layouts():
    """Classic big-endian STRIPPED uncompressed TIFF written by hand —
    the layout GDAL's default (untiled) writer produces — must decode."""
    arr = np.arange(48, dtype=np.uint8).reshape(6, 8)
    # build: header | IFD | strip data (two strips of 3 rows)
    strips = [arr[:3].tobytes(), arr[3:].tobytes()]

    def entry(tag, ftype, cnt, val):
        return struct.pack(">HHI", tag, ftype, cnt) + val

    n_entries = 9
    ifd_off = 8
    data_off = 8 + 2 + n_entries * 12 + 4
    e = b""
    e += entry(256, 3, 1, struct.pack(">HH", 8, 0))       # width
    e += entry(257, 3, 1, struct.pack(">HH", 6, 0))       # length
    e += entry(258, 3, 1, struct.pack(">HH", 8, 0))       # bits
    e += entry(259, 3, 1, struct.pack(">HH", 1, 0))       # no compression
    e += entry(262, 3, 1, struct.pack(">HH", 1, 0))       # photometric
    e += entry(273, 4, 2, struct.pack(">I", data_off + 48))  # strip offsets -> aux
    e += entry(277, 3, 1, struct.pack(">HH", 1, 0))       # spp
    e += entry(278, 3, 1, struct.pack(">HH", 3, 0))       # rows per strip
    e += entry(279, 4, 2, struct.pack(">I", data_off + 56))  # strip counts -> aux
    ifd = struct.pack(">H", n_entries) + e + struct.pack(">I", 0)
    aux_offsets = struct.pack(">II", data_off, data_off + len(strips[0]))
    aux_counts = struct.pack(">II", len(strips[0]), len(strips[1]))
    blob = (
        struct.pack(">2sHI", b"MM", 42, ifd_off)
        + ifd
        + strips[0]
        + strips[1]
        + aux_offsets
        + aux_counts
    )
    back, info = decode_geotiff(blob)
    assert back.shape == (1, 6, 8)
    assert np.array_equal(back[0], arr)
    assert info["compress"] == "none" and not info["tiled"]


def test_malformed_rejected():
    with pytest.raises(ValueError, match="not a TIFF"):
        decode_geotiff(b"PK\x03\x04junk")
    with pytest.raises(ValueError, match="version"):
        decode_geotiff(struct.pack("<2sHI", b"II", 41, 8))
    with pytest.raises(ValueError, match="unsupported"):
        encode_geotiff(
            np.zeros((1, 4, 4), dtype=np.complex64), (1, 0, 0, 0, -1, 0), 4326
        )


def test_raster_array_bridge():
    from geografir_ray.functions.raster import RasterArray, RasterMetadata

    arr = np.arange(64, dtype=np.int32).reshape(1, 8, 8)
    meta = RasterMetadata(
        crs=4326, count=1, width=8, height=8, dtype=np.int32, nodata=-1,
        transform=(0.5, 0.0, -10.0, 0.0, -0.5, 42.0),
    )
    ra = RasterArray(arr, meta)
    tif = ra.to_geotiff()
    back = RasterArray.from_geotiff(tif)
    assert np.array_equal(back.array, arr)
    assert back.metadata.crs.epsg == 4326
    assert back.metadata.transform == meta.transform
    assert back.metadata.nodata == -1.0
    # band subset + cast + nodata rewrite (reference from_raster semantics)
    multi = RasterArray(
        np.stack([arr[0], arr[0] * 2, arr[0] * 3]),
        meta.copy(count=3),
    )
    sub = RasterArray.from_geotiff(
        multi.to_geotiff(), band_index=[2], target_dtype=np.int64, target_nodata=-7
    )
    assert sub.array.shape == (1, 8, 8)
    assert sub.array.dtype == np.int64
    assert sub.metadata.nodata == -7
    # source nodata pixels rewritten: value -1 doesn't appear here, so equality
    assert np.array_equal(sub.array[0], arr[0].astype(np.int64) * 2)
    # convenience functions too
    assert np.array_equal(raster_from_geotiff(raster_to_geotiff(ra)).array, arr)


def test_profile_knobs_respected():
    arr = np.zeros((1, 64, 64), dtype=np.uint8)
    tr = (1.0, 0, 0.0, 0, -1.0, 0.0)
    small = encode_geotiff(arr, tr, 4326, compress="deflate")
    raw = encode_geotiff(arr, tr, 4326, compress="none")
    assert len(small) < len(raw)
    classic = encode_geotiff(arr, tr, 4326, bigtiff=False)
    assert classic[:4] == b"II\x2a\x00"
    big = encode_geotiff(arr, tr, 4326, bigtiff=True)
    assert big[:4] == b"II\x2b\x00"


def test_geotiff_file_sink_resumable(ray_session, sf_small, tmp_path):
    from geografir_ray.pipelines.rasterq import TILE_PX, tiles_dataset
    from geografir_ray.sources.geotiff_files import (
        read_geotiff_tiles,
        write_geotiff_tiles,
    )

    out = str(tmp_path / "tiles")
    tiles = tiles_dataset(sf_small)
    man1 = write_geotiff_tiles(tiles, out).to_pandas()
    assert man1["written"].all()
    n = len(man1)
    assert n == tiles.count()

    # read back: values identical, georeferencing restored
    back = read_geotiff_tiles(out, value_type="int64").to_pandas()
    assert len(back) == n
    back = back.sort_values("tile_id").reset_index(drop=True)
    src = tiles.to_pandas().sort_values("tile_id").reset_index(drop=True)
    for i in range(0, n, max(1, n // 7)):
        assert list(back["data"][i]) == list(src["data"][i])
        assert back["crs"][i] == 4326
        assert back["width"][i] == TILE_PX
    assert back["tile_id"].tolist() == src["tile_id"].tolist()

    # resume: delete two files; only those get rewritten
    import os

    victims = sorted(os.listdir(out))[:2]
    for v in victims:
        os.unlink(os.path.join(out, v))
    man2 = write_geotiff_tiles(tiles, out).to_pandas()
    assert int(man2["written"].sum()) == 2
    rewritten = {os.path.basename(p) for p in man2[man2["written"]]["path"]}
    assert rewritten == set(victims)
