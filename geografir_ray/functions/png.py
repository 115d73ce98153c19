"""Pure-Python PNG codec (stdlib zlib + numpy) — a REAL image codec
for the multimodal stages, no external imaging library required.

Scope (deliberate): 8-bit greyscale / grey+alpha / RGB / RGBA, no
interlacing, no palette — the subset a training-data pipeline stores
thumbnails/patches in.  The DECODER accepts any of the five PNG filter
types (spec §6, required of every conforming reader); the ENCODER
chooses per-row between None/Sub/Up by the standard minimum-sum-of-
absolute-differences heuristic, so output is deterministic and byte-
stable across runs/workers (goldens pinned in tests/test_media.py).

Everything here derives from the public PNG specification (RFC 2083 /
W3C PNG 1.2) only.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> channels
_CTYPE_CH = {0: 1, 2: 3, 4: 2, 6: 4}
_CH_CTYPE = {1: 0, 2: 4, 3: 2, 4: 6}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    body = tag + payload
    return struct.pack(">I", len(payload)) + body + struct.pack(
        ">I", zlib.crc32(body) & 0xFFFFFFFF
    )


def _paeth_vec(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (spec §6.6) over int16 operands."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa_ = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    out = np.where((pa_ <= pb) & (pa_ <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 array (H,W) or (H,W,C in {1,2,3,4}) → PNG bytes.

    Deterministic: per-row filter choice is the spec's MSAD heuristic
    over filters {0 None, 1 Sub, 2 Up}; zlib level 9.
    """
    a = np.ascontiguousarray(arr)
    if a.dtype != np.uint8:
        raise ValueError(f"encode_png: uint8 only, got {a.dtype}")
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in _CH_CTYPE:
        raise ValueError(f"encode_png: shape {arr.shape} unsupported")
    h, w, ch = a.shape
    if h == 0 or w == 0:
        raise ValueError("encode_png: empty image")
    ctype = _CH_CTYPE[ch]

    flat = a.reshape(h, w * ch)
    # candidate filtered forms, all vectorized over the full image
    f0 = flat
    left = np.zeros_like(flat)
    left[:, ch:] = flat[:, :-ch]
    f1 = flat - left  # uint8 wraparound == mod 256
    up = np.zeros_like(flat)
    up[1:] = flat[:-1]
    f2 = flat - up

    # MSAD: sum of |signed byte| per row, pick the smallest (ties → lower id)
    def msad(f: np.ndarray) -> np.ndarray:
        s = f.astype(np.int16)
        return np.minimum(s, 256 - s).sum(axis=1, dtype=np.int64)

    scores = np.stack([msad(f0), msad(f1), msad(f2)])
    pick = np.argmin(scores, axis=0).astype(np.uint8)

    stride = w * ch + 1
    raw = np.empty(h * stride, dtype=np.uint8)
    raw[::stride] = pick
    body = raw.reshape(h, stride)[:, 1:]
    body[pick == 0] = f0[pick == 0]
    body[pick == 1] = f1[pick == 1]
    body[pick == 2] = f2[pick == 2]

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    idat = zlib.compress(raw.tobytes(), 9)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (H,W) for greyscale, else (H,W,C).

    Handles all five filter types; rejects interlace/palette/16-bit
    with a clear error.  Chunk CRCs are verified.
    """
    if data[:8] != _SIG:
        raise ValueError("decode_png: bad signature")
    pos = 8
    width = height = ctype = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + ln)
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"decode_png: CRC mismatch in {tag!r}")
        pos += 12 + ln
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8:
                raise ValueError(f"decode_png: bit depth {depth} unsupported (8 only)")
            if ctype not in _CTYPE_CH:
                raise ValueError(f"decode_png: color type {ctype} unsupported")
            if comp != 0 or filt != 0:
                raise ValueError("decode_png: nonstandard compression/filter method")
            if interlace != 0:
                raise ValueError("decode_png: interlaced images unsupported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("decode_png: missing IHDR")
    ch = _CTYPE_CH[ctype]
    stride = width * ch + 1
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if len(raw) != height * stride:
        raise ValueError("decode_png: decompressed size mismatch")
    raw = raw.reshape(height, stride)
    filters = raw[:, 0]
    scan = raw[:, 1:]

    out = np.zeros((height, width * ch), dtype=np.uint8)
    prev = np.zeros(width * ch, dtype=np.uint8)
    for y in range(height):
        f = int(filters[y])
        row = scan[y]
        if f == 0:
            rec = row.copy()
        elif f == 2:  # Up — fully vectorized
            rec = row + prev
        elif f == 1:  # Sub — per-byte-lane prefix sum mod 256
            lanes = row.reshape(width, ch)
            rec = np.cumsum(lanes.astype(np.int64), axis=0).astype(np.uint8).reshape(-1)
        elif f == 3:  # Average — left-dependence, pixel loop over the row
            rec = np.empty_like(row)
            lanes = row.reshape(width, ch).astype(np.int16)
            up_l = prev.reshape(width, ch).astype(np.int16)
            rlanes = rec.reshape(width, ch)
            left_px = np.zeros(ch, dtype=np.int16)
            for x in range(width):
                v = (lanes[x] + ((left_px + up_l[x]) >> 1)) & 0xFF
                rlanes[x] = v.astype(np.uint8)
                left_px = v
        elif f == 4:  # Paeth — left-dependence, pixel loop over the row
            rec = np.empty_like(row)
            lanes = row.reshape(width, ch)
            up_l = prev.reshape(width, ch)
            up_left = np.zeros((width, ch), dtype=np.uint8)
            up_left[1:] = up_l[:-1]
            rlanes = rec.reshape(width, ch)
            left_px = np.zeros(ch, dtype=np.uint8)
            ul_px = np.zeros(ch, dtype=np.uint8)
            for x in range(width):
                pred = _paeth_vec(left_px, up_l[x], ul_px)
                v = lanes[x] + pred  # uint8 wraparound
                rlanes[x] = v
                left_px = v
                ul_px = up_l[x]
        else:
            raise ValueError(f"decode_png: filter type {f} invalid")
        out[y] = rec
        prev = rec
    img = out.reshape(height, width, ch)
    return img[:, :, 0] if ch == 1 else img


def resize_nearest(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbour resize (pixel-center sampling), any channel count."""
    h, w = arr.shape[:2]
    ys = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64), w - 1)
    return arr[ys][:, xs]


def resize_bilinear(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resize with pixel-center alignment; uint8 in → uint8 out
    (round-half-up), matching the conform_to bilinear kernel's
    edge-clamp convention (functions/raster.py)."""
    h, w = arr.shape[:2]
    a = arr.astype(np.float64)
    if a.ndim == 2:
        a = a[:, :, None]
    fy = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    fx = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(fy).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(fx).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(fy - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(fx - x0, 0.0, 1.0)[None, :, None]
    top = a[y0][:, x0] * (1 - wx) + a[y0][:, x1] * wx
    bot = a[y1][:, x0] * (1 - wx) + a[y1][:, x1] * wx
    res = top * (1 - wy) + bot * wy
    out = np.floor(res + 0.5).astype(arr.dtype)
    return out[:, :, 0] if arr.ndim == 2 else out
