"""Pure-Python GeoTIFF codec (stdlib struct + zlib + numpy) — REAL
binary raster I/O for `to_raster` / `from_raster`, no GDAL/rasterio
required.

Derives from the public TIFF 6.0 specification, the BigTIFF extension
(version 43, 8-byte offsets), and the OGC GeoTIFF 1.1 standard
(GeoKeyDirectoryTag / ModelPixelScale / ModelTiepoint /
ModelTransformation), plus GDAL's documented GDAL_NODATA ASCII tag
(42113).

Writer honors the reference profile knobs
(/root/reference/raster_array/src/raster_array/profiles.py:81-88):
tiled 512x512 blocks, deflate (zlib) at zlevel 9, BIGTIFF=YES, pixel
interleave.  ``interleave="band"`` writes PlanarConfiguration=2.

Reader accepts classic + BigTIFF, both endiannesses, tiled + stripped
layouts, deflate (8 and legacy 32946) or uncompressed, chunky + planar
configuration — the subset GDAL emits with the reference's creation
options.  Predictors other than 1 (none) are rejected loudly.
"""

from __future__ import annotations

import struct
import zlib
from typing import Any

import numpy as np

# TIFF field types
_T_SHORT, _T_LONG, _T_ASCII, _T_DOUBLE = 3, 4, 2, 12
_T_LONG8 = 16
_TYPE_SIZE = {_T_SHORT: 2, _T_LONG: 4, _T_ASCII: 1, _T_DOUBLE: 8, _T_LONG8: 8}
_TYPE_FMT = {_T_SHORT: "H", _T_LONG: "I", _T_DOUBLE: "d", _T_LONG8: "Q"}

# tags
TAG_WIDTH = 256
TAG_LENGTH = 257
TAG_BITS = 258
TAG_COMPRESSION = 259
TAG_PHOTOMETRIC = 262
TAG_STRIP_OFFSETS = 273
TAG_SPP = 277
TAG_ROWS_PER_STRIP = 278
TAG_STRIP_COUNTS = 279
TAG_PLANAR = 284
TAG_PREDICTOR = 317
TAG_TILE_W = 322
TAG_TILE_L = 323
TAG_TILE_OFFSETS = 324
TAG_TILE_COUNTS = 325
TAG_SAMPLE_FORMAT = 339
TAG_PIXEL_SCALE = 33550
TAG_TIEPOINT = 33922
TAG_TRANSFORM = 34264
TAG_GEO_KEYS = 34735
TAG_GDAL_NODATA = 42113

_SF_UINT, _SF_INT, _SF_FLOAT = 1, 2, 3

_DTYPE_SF = {
    "u": _SF_UINT,
    "i": _SF_INT,
    "f": _SF_FLOAT,
}
_SF_DTYPE = {
    (_SF_UINT, 8): np.uint8,
    (_SF_UINT, 16): np.uint16,
    (_SF_UINT, 32): np.uint32,
    (_SF_UINT, 64): np.uint64,
    (_SF_INT, 8): np.int8,
    (_SF_INT, 16): np.int16,
    (_SF_INT, 32): np.int32,
    (_SF_INT, 64): np.int64,
    (_SF_FLOAT, 32): np.float32,
    (_SF_FLOAT, 64): np.float64,
}

# GeoKey ids
_GK_MODEL_TYPE = 1024  # 1 projected, 2 geographic
_GK_RASTER_TYPE = 1025  # 1 PixelIsArea
_GK_GEOGRAPHIC_CS = 2048
_GK_PROJECTED_CS = 3072


def _fmt_nodata(nodata) -> str:
    """GDAL prints nodata with repr-ish formatting; keep ints clean."""
    f = float(nodata)
    if np.isnan(f):
        return "nan"
    return str(int(f)) if f == int(f) and abs(f) < 1e15 else repr(f)


class _Entry:
    __slots__ = ("tag", "ftype", "values")

    def __init__(self, tag: int, ftype: int, values):
        self.tag = tag
        self.ftype = ftype
        self.values = values


def encode_geotiff(
    array: np.ndarray,
    transform: tuple,
    epsg: int,
    nodata=None,
    *,
    bigtiff: bool = True,
    blockxsize: int = 512,
    blockysize: int = 512,
    compress: str = "deflate",
    zlevel: int = 9,
    interleave: str = "pixel",
) -> bytes:
    """(count, height, width) array → GeoTIFF bytes.

    Defaults match the reference writer profile: 512x512 tiles,
    deflate level 9, BigTIFF, pixel interleave.  Tile dims are clamped
    to the TIFF-required multiples of 16.
    """
    a = np.ascontiguousarray(array)
    if a.ndim == 2:
        a = a[None, :, :]
    if a.ndim != 3:
        raise ValueError(f"encode_geotiff: array must be (count,h,w), got {array.shape}")
    count, height, width = a.shape
    kind = a.dtype.kind
    if kind not in _DTYPE_SF:
        raise ValueError(f"encode_geotiff: dtype {a.dtype} unsupported")
    bits = a.dtype.itemsize * 8
    sample_format = _DTYPE_SF[kind]
    if compress not in ("deflate", "none"):
        raise ValueError(f"encode_geotiff: compress={compress!r} unsupported")
    if interleave not in ("pixel", "band"):
        raise ValueError(f"encode_geotiff: interleave={interleave!r} unsupported")

    tw = max(16, (min(blockxsize, ((width + 15) // 16) * 16) // 16) * 16)
    tl = max(16, (min(blockysize, ((height + 15) // 16) * 16) // 16) * 16)
    tiles_across = (width + tw - 1) // tw
    tiles_down = (height + tl - 1) // tl

    # assemble tile payloads
    chunks: list[bytes] = []
    planar = 1 if interleave == "pixel" else 2
    if planar == 1:
        pix = np.zeros((tiles_down * tl, tiles_across * tw, count), dtype=a.dtype)
        pix[:height, :width] = np.transpose(a, (1, 2, 0))
        for ty in range(tiles_down):
            for tx in range(tiles_across):
                block = pix[ty * tl : (ty + 1) * tl, tx * tw : (tx + 1) * tw]
                chunks.append(np.ascontiguousarray(block).tobytes())
    else:
        pad = np.zeros((count, tiles_down * tl, tiles_across * tw), dtype=a.dtype)
        pad[:, :height, :width] = a
        for b in range(count):
            for ty in range(tiles_down):
                for tx in range(tiles_across):
                    block = pad[b, ty * tl : (ty + 1) * tl, tx * tw : (tx + 1) * tw]
                    chunks.append(np.ascontiguousarray(block).tobytes())
    if compress == "deflate":
        chunks = [zlib.compress(c, zlevel) for c in chunks]

    # geo tags
    a_, b_, c_, d_, e_, f_ = (float(v) for v in transform)
    entries: list[_Entry] = [
        _Entry(TAG_WIDTH, _T_LONG, [width]),
        _Entry(TAG_LENGTH, _T_LONG, [height]),
        _Entry(TAG_BITS, _T_SHORT, [bits] * count),
        _Entry(TAG_COMPRESSION, _T_SHORT, [8 if compress == "deflate" else 1]),
        _Entry(TAG_PHOTOMETRIC, _T_SHORT, [1]),
        _Entry(TAG_SPP, _T_SHORT, [count]),
        _Entry(TAG_PLANAR, _T_SHORT, [planar]),
        _Entry(TAG_TILE_W, _T_SHORT, [tw]),
        _Entry(TAG_TILE_L, _T_SHORT, [tl]),
        _Entry(TAG_TILE_OFFSETS, _T_LONG8 if bigtiff else _T_LONG, None),  # patched
        _Entry(TAG_TILE_COUNTS, _T_LONG, [len(c) for c in chunks]),
        _Entry(TAG_SAMPLE_FORMAT, _T_SHORT, [sample_format] * count),
    ]
    if b_ == 0.0 and d_ == 0.0:
        entries.append(_Entry(TAG_PIXEL_SCALE, _T_DOUBLE, [a_, -e_, 0.0]))
        entries.append(_Entry(TAG_TIEPOINT, _T_DOUBLE, [0.0, 0.0, 0.0, c_, f_, 0.0]))
    else:
        entries.append(
            _Entry(
                TAG_TRANSFORM,
                _T_DOUBLE,
                [a_, b_, 0.0, c_, d_, e_, 0.0, f_, 0, 0, 0, 0, 0, 0, 0, 1],
            )
        )
    geographic = 4000 <= int(epsg) <= 4999
    keys = [
        (_GK_MODEL_TYPE, 0, 1, 2 if geographic else 1),
        (_GK_RASTER_TYPE, 0, 1, 1),
        (
            _GK_GEOGRAPHIC_CS if geographic else _GK_PROJECTED_CS,
            0,
            1,
            int(epsg),
        ),
    ]
    gk = [1, 1, 0, len(keys)]
    for k in keys:
        gk.extend(k)
    entries.append(_Entry(TAG_GEO_KEYS, _T_SHORT, gk))
    if nodata is not None:
        nd = _fmt_nodata(nodata).encode() + b"\x00"
        entries.append(_Entry(TAG_GDAL_NODATA, _T_ASCII, nd))
    entries.sort(key=lambda e: e.tag)

    return _assemble(entries, chunks, bigtiff)


def _assemble(entries: list[_Entry], chunks: list[bytes], bigtiff: bool) -> bytes:
    inline_cap = 8 if bigtiff else 4
    head_len = 16 if bigtiff else 8

    # layout: header | tile data | aux arrays | IFD
    pos = head_len
    tile_offsets = []
    for c in chunks:
        tile_offsets.append(pos)
        pos += len(c)
    for e in entries:
        if e.tag == TAG_TILE_OFFSETS:
            e.values = tile_offsets

    def pack_values(e: _Entry) -> bytes:
        if e.ftype == _T_ASCII:
            return bytes(e.values)
        return struct.pack("<" + _TYPE_FMT[e.ftype] * len(e.values), *e.values)

    aux: list[bytes] = []
    aux_offsets: dict[int, int] = {}
    for e in entries:
        raw = pack_values(e)
        if len(raw) > inline_cap:
            aux_offsets[e.tag] = pos
            aux.append(raw)
            pos += len(raw)

    ifd_offset = pos
    if bigtiff:
        header = struct.pack("<2sHHHQ", b"II", 43, 8, 0, ifd_offset)
        ifd = struct.pack("<Q", len(entries))
        for e in entries:
            raw = pack_values(e)
            n = len(e.values)
            if len(raw) <= 8:
                val = raw + b"\x00" * (8 - len(raw))
            else:
                val = struct.pack("<Q", aux_offsets[e.tag])
            ifd += struct.pack("<HHQ", e.tag, e.ftype, n) + val
        ifd += struct.pack("<Q", 0)
    else:
        if ifd_offset > 0xFFFFFFF0:
            raise ValueError("classic TIFF overflow; pass bigtiff=True")
        header = struct.pack("<2sHI", b"II", 42, ifd_offset)
        ifd = struct.pack("<H", len(entries))
        for e in entries:
            raw = pack_values(e)
            n = len(e.values)
            if len(raw) <= 4:
                val = raw + b"\x00" * (4 - len(raw))
            else:
                val = struct.pack("<I", aux_offsets[e.tag])
            ifd += struct.pack("<HHI", e.tag, e.ftype, n) + val
        ifd += struct.pack("<I", 0)

    return header + b"".join(chunks) + b"".join(aux) + ifd


# ---------------------------------------------------------------------------
# Reader
# ---------------------------------------------------------------------------


def _read_ifd(data: bytes, bo: str, bigtiff: bool, offset: int) -> dict[int, tuple]:
    tags: dict[int, tuple] = {}
    if bigtiff:
        (n,) = struct.unpack_from(bo + "Q", data, offset)
        pos = offset + 8
        step, cnt_fmt, off_fmt, inline = 20, "Q", "Q", 8
    else:
        (n,) = struct.unpack_from(bo + "H", data, offset)
        pos = offset + 2
        step, cnt_fmt, off_fmt, inline = 12, "I", "I", 4
    for _ in range(n):
        tag, ftype = struct.unpack_from(bo + "HH", data, pos)
        (cnt,) = struct.unpack_from(bo + cnt_fmt, data, pos + 4)
        vpos = pos + step - inline
        size = _TYPE_SIZE.get(ftype, 1) * cnt
        if size > inline:
            (voff,) = struct.unpack_from(bo + off_fmt, data, vpos)
            vpos = voff
        if ftype == _T_ASCII:
            values: Any = data[vpos : vpos + cnt]
        elif ftype in _TYPE_FMT:
            values = list(struct.unpack_from(bo + _TYPE_FMT[ftype] * cnt, data, vpos))
        else:  # unknown type: keep raw (rational etc. unused here)
            values = data[vpos : vpos + size]
        tags[tag] = (ftype, values)
        pos += step
    return tags


def decode_geotiff(data: bytes) -> tuple[np.ndarray, dict]:
    """GeoTIFF bytes → ((count, h, w) array, info dict with keys
    transform (6-tuple), epsg, nodata, tiled, compress, bigtiff)."""
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("decode_geotiff: not a TIFF stream")
    (ver,) = struct.unpack_from(bo + "H", data, 2)
    if ver == 42:
        bigtiff = False
        (ifd_off,) = struct.unpack_from(bo + "I", data, 4)
    elif ver == 43:
        bigtiff = True
        bytesize, zero = struct.unpack_from(bo + "HH", data, 4)
        if bytesize != 8 or zero != 0:
            raise ValueError("decode_geotiff: malformed BigTIFF header")
        (ifd_off,) = struct.unpack_from(bo + "Q", data, 8)
    else:
        raise ValueError(f"decode_geotiff: bad TIFF version {ver}")
    tags = _read_ifd(data, bo, bigtiff, ifd_off)

    def one(tag: int, default=None):
        if tag not in tags:
            return default
        return tags[tag][1][0]

    def many(tag: int, default=None):
        if tag not in tags:
            return default
        return tags[tag][1]

    width = int(one(TAG_WIDTH))
    height = int(one(TAG_LENGTH))
    spp = int(one(TAG_SPP, 1))
    bits = many(TAG_BITS, [8])
    if len(set(bits)) != 1:
        raise ValueError("decode_geotiff: mixed bits-per-sample unsupported")
    sfmts = many(TAG_SAMPLE_FORMAT, [_SF_UINT] * spp)
    if len(set(sfmts)) != 1:
        raise ValueError("decode_geotiff: mixed sample formats unsupported")
    key = (int(sfmts[0]), int(bits[0]))
    if key not in _SF_DTYPE:
        raise ValueError(f"decode_geotiff: sample format {key} unsupported")
    dtype = np.dtype(_SF_DTYPE[key]).newbyteorder(bo)
    compression = int(one(TAG_COMPRESSION, 1))
    if compression not in (1, 8, 32946):
        raise ValueError(f"decode_geotiff: compression {compression} unsupported")
    predictor = int(one(TAG_PREDICTOR, 1))
    if predictor != 1:
        raise ValueError(f"decode_geotiff: predictor {predictor} unsupported")
    planar = int(one(TAG_PLANAR, 1))

    def blocks(offsets, counts):
        for off, cnt in zip(offsets, counts):
            raw = data[int(off) : int(off) + int(cnt)]
            yield zlib.decompress(raw) if compression in (8, 32946) else raw

    out = np.zeros((spp, height, width), dtype=dtype.newbyteorder("="))
    tiled = TAG_TILE_OFFSETS in tags
    if tiled:
        tw = int(one(TAG_TILE_W))
        tl = int(one(TAG_TILE_L))
        tiles_across = (width + tw - 1) // tw
        tiles_down = (height + tl - 1) // tl
        per_plane = tiles_across * tiles_down
        gen = blocks(many(TAG_TILE_OFFSETS), many(TAG_TILE_COUNTS))
        n_planes = spp if planar == 2 else 1
        for plane in range(n_planes):
            for ti in range(per_plane):
                ty, tx = divmod(ti, tiles_across)
                buf = next(gen)
                if planar == 1:
                    block = np.frombuffer(buf, dtype=dtype).reshape(tl, tw, spp)
                    block = np.transpose(block, (2, 0, 1))
                else:
                    block = np.frombuffer(buf, dtype=dtype).reshape(1, tl, tw)
                y0, x0 = ty * tl, tx * tw
                h = min(tl, height - y0)
                w = min(tw, width - x0)
                if planar == 1:
                    out[:, y0 : y0 + h, x0 : x0 + w] = block[:, :h, :w]
                else:
                    out[plane, y0 : y0 + h, x0 : x0 + w] = block[0, :h, :w]
    else:
        rps = int(one(TAG_ROWS_PER_STRIP, height))
        strips = (height + rps - 1) // rps
        gen = blocks(many(TAG_STRIP_OFFSETS), many(TAG_STRIP_COUNTS))
        n_planes = spp if planar == 2 else 1
        for plane in range(n_planes):
            for si in range(strips):
                y0 = si * rps
                h = min(rps, height - y0)
                buf = next(gen)
                if planar == 1:
                    block = np.frombuffer(buf, dtype=dtype, count=h * width * spp)
                    out[:, y0 : y0 + h] = np.transpose(
                        block.reshape(h, width, spp), (2, 0, 1)
                    )
                else:
                    block = np.frombuffer(buf, dtype=dtype, count=h * width)
                    out[plane, y0 : y0 + h] = block.reshape(h, width)

    # geo referencing
    if TAG_TRANSFORM in tags:
        m = many(TAG_TRANSFORM)
        transform = (m[0], m[1], m[3], m[4], m[5], m[7])
    elif TAG_PIXEL_SCALE in tags and TAG_TIEPOINT in tags:
        sx, sy = many(TAG_PIXEL_SCALE)[:2]
        tp = many(TAG_TIEPOINT)
        # tiepoint maps raster (i,j) -> model (x,y): origin shifted back
        ox = tp[3] - tp[0] * sx
        oy = tp[4] + tp[1] * sy
        transform = (sx, 0.0, ox, 0.0, -sy, oy)
    else:
        transform = (1.0, 0.0, 0.0, 0.0, -1.0, 0.0)

    epsg = None
    if TAG_GEO_KEYS in tags:
        gk = many(TAG_GEO_KEYS)
        nkeys = gk[3]
        for i in range(nkeys):
            kid, loc, cnt, val = gk[4 + 4 * i : 8 + 4 * i]
            if kid in (_GK_GEOGRAPHIC_CS, _GK_PROJECTED_CS) and loc == 0:
                epsg = int(val)

    nodata = None
    if TAG_GDAL_NODATA in tags:
        s = bytes(tags[TAG_GDAL_NODATA][1]).rstrip(b"\x00").strip().decode()
        nodata = float(s)

    info = {
        "transform": tuple(float(v) for v in transform),
        "epsg": epsg,
        "nodata": nodata,
        "tiled": tiled,
        "compress": "deflate" if compression in (8, 32946) else "none",
        "bigtiff": bigtiff,
        "interleave": "pixel" if planar == 1 else "band",
    }
    return out, info


# ---------------------------------------------------------------------------
# RasterArray bridge (reference to_raster/from_raster semantics —
# raster_array.py:222-327 — now over REAL GeoTIFF bytes)
# ---------------------------------------------------------------------------


def raster_to_geotiff(raster, profile: dict | None = None) -> bytes:
    """RasterArray → GeoTIFF bytes using the metadata profile merged
    with reference GeoTIFF writer defaults (512x512/deflate-9/
    BIGTIFF=YES/pixel)."""
    m = raster.metadata
    prof = dict(m.profile)
    if profile:
        prof.update(profile)
    return encode_geotiff(
        raster.array,
        transform=m.transform,
        epsg=int(m.crs.epsg),
        nodata=m.nodata,
        bigtiff=str(prof.get("bigtiff", "YES")).upper() == "YES",
        blockxsize=int(prof.get("blockxsize", prof.get("blocksize", 512))),
        blockysize=int(prof.get("blockysize", prof.get("blocksize", 512))),
        compress=str(prof.get("compress", "deflate")).lower(),
        zlevel=int(prof.get("zlevel", prof.get("level", 9))),
        interleave=str(prof.get("interleave", "pixel")).lower(),
    )


def raster_from_geotiff(data: bytes):
    """GeoTIFF bytes → RasterArray (epsg + transform + nodata restored)."""
    from .raster import RasterArray, RasterMetadata

    arr, info = decode_geotiff(data)
    meta = RasterMetadata(
        crs=int(info["epsg"]),
        count=arr.shape[0],
        width=arr.shape[2],
        height=arr.shape[1],
        dtype=arr.dtype,
        nodata=info["nodata"] if info["nodata"] is not None else 0,
        transform=info["transform"],
    )
    return RasterArray(arr, meta)
