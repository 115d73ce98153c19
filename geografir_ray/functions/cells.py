"""Spatial cell indexes — vectorized, from scratch (numpy only).

Three index families, all usable as shuffle keys (SURVEY.md §7.3):

- **geohash**: standard public geohash (Niemeyer) — lat/lon bit
  interleave, base32.  Both an integer form (fast join key) and the
  canonical string form.  The integer grid form is also the engine's
  generic "grid cell" used for polygon covers and kNN rings because
  cells are axis-aligned lat/lon boxes (trivial range math).
- **S2**: spec-accurate S2 cell ids (face + quadratic s/t projection +
  Hilbert curve), per the published s2geometry design docs.  Level 0-30.
- **hex**: an H3-*style* hierarchical hex index.  Full icosahedral H3
  (gnomonic faces, Class II/III pentagon handling) is out of scope for
  a from-scratch numpy build (SURVEY.md §7.4.2); this is the documented
  fallback: axial hex grid on the plate-carree plane with aperture-3
  scaling between resolutions, H3-compatible API (cell, parent,
  k_ring, resolutions 0..15).

No reference-repo counterpart exists (geografir has zero cell-index
code); semantics follow the north rule (BASELINE.json:6,14).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Bit interleave helpers (Morton spreading, classic magic-number form)
# ---------------------------------------------------------------------------

_U64 = np.uint64


def _spread_bits32(x: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of x into the even bit positions of a uint64."""
    x = x.astype(np.uint64)
    x = (x | (x << _U64(16))) & _U64(0x0000FFFF0000FFFF)
    x = (x | (x << _U64(8))) & _U64(0x00FF00FF00FF00FF)
    x = (x | (x << _U64(4))) & _U64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << _U64(2))) & _U64(0x3333333333333333)
    x = (x | (x << _U64(1))) & _U64(0x5555555555555555)
    return x


def _compact_bits64(x: np.ndarray) -> np.ndarray:
    """Inverse of _spread_bits32: gather even bit positions into low 32."""
    x = x.astype(np.uint64) & _U64(0x5555555555555555)
    x = (x | (x >> _U64(1))) & _U64(0x3333333333333333)
    x = (x | (x >> _U64(2))) & _U64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x >> _U64(4))) & _U64(0x00FF00FF00FF00FF)
    x = (x | (x >> _U64(8))) & _U64(0x0000FFFF0000FFFF)
    x = (x | (x >> _U64(16))) & _U64(0x00000000FFFFFFFF)
    return x


# ---------------------------------------------------------------------------
# Geohash
# ---------------------------------------------------------------------------

_BASE32 = np.frombuffer(b"0123456789bcdefghjkmnpqrstuvwxyz", dtype=np.uint8)


def geohash_quantize(
    lat: np.ndarray, lon: np.ndarray, precision: int
) -> tuple[np.ndarray, np.ndarray, int, int]:
    """Quantize lat/lon to the geohash integer grid at ``precision`` chars.

    Returns (lat_q, lon_q, lat_bits, lon_bits).  lat_q/lon_q are the
    row/column of the axis-aligned cell box — the engine's generic grid
    coordinates (used for covers and ring expansion).
    """
    nbits = 5 * precision
    lon_bits = (nbits + 1) // 2
    lat_bits = nbits // 2
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    lat_q = np.floor((lat + 90.0) / 180.0 * (1 << lat_bits)).astype(np.int64)
    lon_q = np.floor((lon + 180.0) / 360.0 * (1 << lon_bits)).astype(np.int64)
    np.clip(lat_q, 0, (1 << lat_bits) - 1, out=lat_q)
    np.clip(lon_q, 0, (1 << lon_bits) - 1, out=lon_q)
    return lat_q, lon_q, lat_bits, lon_bits


def geohash_int(lat: np.ndarray, lon: np.ndarray, precision: int = 9) -> np.ndarray:
    """Geohash as a uint64 (the 5*precision interleaved bits, lon first)."""
    if not 1 <= precision <= 12:
        raise ValueError(f"geohash precision must be in [1, 12], got {precision}")
    lat_q, lon_q, lat_bits, lon_bits = geohash_quantize(lat, lon, precision)
    s_lon = _spread_bits32(lon_q.astype(np.uint64))
    s_lat = _spread_bits32(lat_q.astype(np.uint64))
    if lon_bits > lat_bits:  # odd total: first (MSB) bit is lon, lon at even offsets
        return s_lon | (s_lat << _U64(1))
    return (s_lon << _U64(1)) | s_lat


def geohash_encode(lat: np.ndarray, lon: np.ndarray, precision: int = 9) -> np.ndarray:
    """Canonical base32 geohash strings (numpy unicode array)."""
    code = geohash_int(lat, lon, precision)
    n = code.shape[0]
    chars = np.empty((n, precision), dtype=np.uint8)
    for i in range(precision):
        shift = _U64(5 * (precision - 1 - i))
        chars[:, i] = _BASE32[((code >> shift) & _U64(0x1F)).astype(np.int64)]
    return chars.view(f"S{precision}").reshape(n).astype(str)


def geohash_int_to_latlon(code: np.ndarray, precision: int) -> tuple[np.ndarray, np.ndarray]:
    """Cell-center lat/lon of integer geohashes."""
    nbits = 5 * precision
    lon_bits = (nbits + 1) // 2
    lat_bits = nbits // 2
    c = code.astype(np.uint64)
    if lon_bits > lat_bits:
        lon_q = _compact_bits64(c)
        lat_q = _compact_bits64(c >> _U64(1))
    else:
        lon_q = _compact_bits64(c >> _U64(1))
        lat_q = _compact_bits64(c)
    lat = (lat_q.astype(np.float64) + 0.5) / (1 << lat_bits) * 180.0 - 90.0
    lon = (lon_q.astype(np.float64) + 0.5) / (1 << lon_bits) * 360.0 - 180.0
    return lat, lon


# ---------------------------------------------------------------------------
# Generic lat/lon grid (the engine's join/cover grid)
#
# cell = (row << 32) | col at a given resolution ``bits`` per axis.
# Axis-aligned boxes make polygon covers and kNN ring expansion exact
# integer range math.  Used as the co-partition key for PIP and kNN.
# ---------------------------------------------------------------------------


def grid_cell(lat: np.ndarray, lon: np.ndarray, bits: int) -> np.ndarray:
    """uint64 grid cell id: row in high 32 bits, col in low 32."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    n = 1 << bits
    row = np.floor((lat + 90.0) / 180.0 * n).astype(np.int64)
    col = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    np.clip(row, 0, n - 1, out=row)
    np.clip(col, 0, n - 1, out=col)
    return (row.astype(np.uint64) << _U64(32)) | col.astype(np.uint64)


def grid_cell_box(cell: np.ndarray, bits: int) -> tuple[np.ndarray, ...]:
    """(lat_min, lat_max, lon_min, lon_max) of grid cells."""
    n = 1 << bits
    row = (cell >> _U64(32)).astype(np.float64)
    col = (cell & _U64(0xFFFFFFFF)).astype(np.float64)
    lat_min = row / n * 180.0 - 90.0
    lon_min = col / n * 360.0 - 180.0
    return lat_min, lat_min + 180.0 / n, lon_min, lon_min + 360.0 / n


def grid_range(
    lat_min: float, lat_max: float, lon_min: float, lon_max: float, bits: int
) -> tuple[int, int, int, int]:
    """Inclusive (row0, row1, col0, col1) of cells overlapping a bbox."""
    n = 1 << bits
    r0 = max(0, min(n - 1, int(np.floor((lat_min + 90.0) / 180.0 * n))))
    r1 = max(0, min(n - 1, int(np.floor((lat_max + 90.0) / 180.0 * n))))
    c0 = max(0, min(n - 1, int(np.floor((lon_min + 180.0) / 360.0 * n))))
    c1 = max(0, min(n - 1, int(np.floor((lon_max + 180.0) / 360.0 * n))))
    return r0, r1, c0, c1


def pack_rc(row: np.ndarray, col: np.ndarray) -> np.ndarray:
    return (np.asarray(row).astype(np.uint64) << _U64(32)) | np.asarray(col).astype(
        np.uint64
    )


# ---------------------------------------------------------------------------
# S2 cell ids (levels 0..30)
#
# Published design (s2geometry.io / "S2 cells" docs):
#   lat/lon -> unit XYZ -> face (0..5, largest |component|)
#   -> (u, v) gnomonic face coords in [-1, 1]
#   -> (s, t) via the quadratic projection st = sqrt-like transform
#   -> (i, j) 30-bit ints -> Hilbert curve position -> 64-bit id:
#      [face:3][hilbert pos: 2*level bits][1][zeros]
# ---------------------------------------------------------------------------

_S2_MAX_LEVEL = 30
_S2_LOOKUP_BITS = 4

# Hilbert sub-cell orders, from the public S2 reference tables:
# ij index -> hilbert position, per orientation, and orientation delta.
_S2_POS_TO_IJ = np.array(
    [[0, 1, 3, 2], [0, 2, 3, 1], [3, 2, 0, 1], [3, 1, 0, 2]], dtype=np.int64
)
_S2_SWAP_MASK = 0x01
_S2_INVERT_MASK = 0x02
_S2_POS_TO_ORIENT = np.array(
    [_S2_SWAP_MASK, 0, 0, _S2_INVERT_MASK | _S2_SWAP_MASK], dtype=np.int64
)


def _build_s2_lookup() -> tuple[np.ndarray, np.ndarray]:
    """lookup_pos/lookup_ij tables exactly as in the public S2 sources."""
    lookup_pos = np.zeros(1 << (2 * _S2_LOOKUP_BITS + 2), dtype=np.int64)
    lookup_ij = np.zeros(1 << (2 * _S2_LOOKUP_BITS + 2), dtype=np.int64)

    def init_cell(level: int, i: int, j: int, orig_orient: int, pos: int, orient: int):
        if level == _S2_LOOKUP_BITS:
            ij = (i << _S2_LOOKUP_BITS) + j
            lookup_pos[(ij << 2) + orig_orient] = (pos << 2) + orient
            lookup_ij[(pos << 2) + orig_orient] = (ij << 2) + orient
            return
        level += 1
        i <<= 1
        j <<= 1
        pos <<= 2
        r = _S2_POS_TO_IJ[orient]
        for index in range(4):
            ij = r[index]
            init_cell(
                level,
                i + (ij >> 1),
                j + (ij & 1),
                orig_orient,
                pos + index,
                orient ^ _S2_POS_TO_ORIENT[index],
            )

    for orient in range(4):
        init_cell(0, 0, 0, orient, 0, orient)
    return lookup_pos, lookup_ij


_S2_LOOKUP_POS, _S2_LOOKUP_IJ = _build_s2_lookup()


def _xyz_from_latlon(lat_deg: np.ndarray, lon_deg: np.ndarray):
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    theta = np.radians(np.asarray(lon_deg, dtype=np.float64))
    cos_phi = np.cos(phi)
    return cos_phi * np.cos(theta), cos_phi * np.sin(theta), np.sin(phi)


def _face_uv_from_xyz(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    # negative major axis -> face + 3
    major = np.choose(face, [x, y, z])
    face = np.where(major < 0, face + 3, face)
    # u, v per face (public S2 face conventions)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ue, ve, de) in enumerate(
        [
            (lambda x, y, z: y / x, lambda x, y, z: z / x, None),
            (lambda x, y, z: -x / y, lambda x, y, z: z / y, None),
            (lambda x, y, z: -x / z, lambda x, y, z: -y / z, None),
            (lambda x, y, z: z / x, lambda x, y, z: y / x, None),
            (lambda x, y, z: z / y, lambda x, y, z: -x / y, None),
            (lambda x, y, z: -y / z, lambda x, y, z: -x / z, None),
        ]
    ):
        m = face == f
        if np.any(m):
            with np.errstate(divide="ignore", invalid="ignore"):
                u[m] = ue(x[m], y[m], z[m])
                v[m] = ve(x[m], y[m], z[m])
    return face.astype(np.int64), u, v


def _st_from_uv(u: np.ndarray) -> np.ndarray:
    """S2's quadratic projection (the library default)."""
    with np.errstate(invalid="ignore"):
        return np.where(
            u >= 0.0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u)
        )


def _ij_from_st(s: np.ndarray) -> np.ndarray:
    i = np.floor(s * (1 << _S2_MAX_LEVEL)).astype(np.int64)
    return np.clip(i, 0, (1 << _S2_MAX_LEVEL) - 1)


def s2_cell_id(lat: np.ndarray, lon: np.ndarray, level: int = 30) -> np.ndarray:
    """S2 cell id (uint64) containing each lat/lon, at ``level``."""
    if not 0 <= level <= _S2_MAX_LEVEL:
        raise ValueError(f"S2 level must be in [0, 30], got {level}")
    x, y, z = _xyz_from_latlon(lat, lon)
    face, u, v = _face_uv_from_xyz(x, y, z)
    i = _ij_from_st(_st_from_uv(u))
    j = _ij_from_st(_st_from_uv(v))

    # Hilbert: consume i/j 4 bits at a time, MSB first (public algorithm).
    n = np.zeros(i.shape, dtype=np.uint64)
    bits = face & _S2_SWAP_MASK  # initial orientation
    for k in range(7, -1, -1):
        mask = (1 << _S2_LOOKUP_BITS) - 1
        bits += ((i >> (k * _S2_LOOKUP_BITS)) & mask) << (_S2_LOOKUP_BITS + 2)
        bits += ((j >> (k * _S2_LOOKUP_BITS)) & mask) << 2
        bits = _S2_LOOKUP_POS[bits]
        n = (n << _U64(8)) | (bits >> 2).astype(np.uint64)
        bits &= _S2_SWAP_MASK | _S2_INVERT_MASK

    cell = (face.astype(np.uint64) << _U64(61)) | (n << _U64(1)) | _U64(1)
    if level < _S2_MAX_LEVEL:
        lsb = _U64(1) << _U64(2 * (_S2_MAX_LEVEL - level))
        cell = (cell & ~(lsb - _U64(1))) | lsb
    return cell


def s2_level(cell: np.ndarray) -> np.ndarray:
    """Level of each S2 cell id (position of lowest set bit)."""
    c = np.asarray(cell, dtype=np.uint64)
    lsb = c & (~c + _U64(1))
    # level = 30 - (log2(lsb) / 2)
    log2 = np.zeros(c.shape, dtype=np.int64)
    v = lsb.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        m = v >= (_U64(1) << _U64(shift))
        log2[m] += shift
        v[m] >>= _U64(shift)
    return 30 - log2 // 2


def s2_parent(cell: np.ndarray, level: int) -> np.ndarray:
    """Ancestor id at ``level`` (must be <= cell's level)."""
    c = np.asarray(cell, dtype=np.uint64)
    lsb = _U64(1) << _U64(2 * (_S2_MAX_LEVEL - level))
    return (c & ~(lsb - _U64(1))) | lsb


# ---------------------------------------------------------------------------
# H3-style hex index (documented axial fallback, SURVEY.md §7.4.2)
#
# Axial (q, r) hex grid over plate-carree (lon, lat) degrees.  Hex size
# shrinks by sqrt(3) per resolution (aperture 3), alternating a 30 deg
# rotation like H3's Class II/III.  Parent = containing hex of the
# child's center at res-1 (H3 cells are likewise not strictly nested).
# Cell id packs (res, q, r) into a uint64.
# ---------------------------------------------------------------------------

_HEX_BASE_SIZE = 12.0  # degrees, circumradius at resolution 0
_HEX_OFFSET = 1 << 27  # bias so q/r fit unsigned 28-bit fields
_SQRT3 = np.sqrt(3.0)


def _hex_size(res: int) -> float:
    return _HEX_BASE_SIZE * (3.0 ** (-res / 2.0))


def _hex_axial(lon: np.ndarray, lat: np.ndarray, res: int):
    """Fractional axial coords (pointy-top; odd res rotated 30deg)."""
    size = _hex_size(res)
    x = np.asarray(lon, dtype=np.float64)
    y = np.asarray(lat, dtype=np.float64)
    if res % 2 == 1:  # Class III-style rotation
        c, s = np.cos(np.pi / 6.0), np.sin(np.pi / 6.0)
        x, y = c * x - s * y, s * x + c * y
    q = (_SQRT3 / 3.0 * x - 1.0 / 3.0 * y) / size
    r = (2.0 / 3.0 * y) / size
    return q, r


def _axial_round(qf: np.ndarray, rf: np.ndarray):
    """Cube-coordinate rounding (standard hex-grid algorithm)."""
    sf = -qf - rf
    q = np.round(qf)
    r = np.round(rf)
    s = np.round(sf)
    dq, dr, ds = np.abs(q - qf), np.abs(r - rf), np.abs(s - sf)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = ~fix_q & (dr > ds)
    q = np.where(fix_q, -r - s, q)
    r = np.where(fix_r, -q - s, r)
    return q.astype(np.int64), r.astype(np.int64)


def hex_cell(lat: np.ndarray, lon: np.ndarray, res: int) -> np.ndarray:
    """Hex cell id at resolution ``res`` (0..15)."""
    if not 0 <= res <= 15:
        raise ValueError(f"hex resolution must be in [0, 15], got {res}")
    qf, rf = _hex_axial(lon, lat, res)
    q, r = _axial_round(qf, rf)
    return (
        (np.uint64(res) << _U64(58))
        | ((q + _HEX_OFFSET).astype(np.uint64) << _U64(29))
        | (r + _HEX_OFFSET).astype(np.uint64)
    )


def hex_res(cell: np.ndarray) -> np.ndarray:
    return (np.asarray(cell, dtype=np.uint64) >> _U64(58)).astype(np.int64)


def hex_unpack(cell: np.ndarray):
    c = np.asarray(cell, dtype=np.uint64)
    res = (c >> _U64(58)).astype(np.int64)
    q = ((c >> _U64(29)) & _U64((1 << 29) - 1)).astype(np.int64) - _HEX_OFFSET
    r = (c & _U64((1 << 29) - 1)).astype(np.int64) - _HEX_OFFSET
    return res, q, r


def hex_center(cell: np.ndarray):
    """(lat, lon) centers of hex cells."""
    res, q, r = hex_unpack(cell)
    if np.any(res != res[0] if res.size else False):
        raise ValueError("hex_center requires a single resolution per call")
    rr = int(res[0]) if res.size else 0
    size = _hex_size(rr)
    x = size * (_SQRT3 * q.astype(np.float64) + _SQRT3 / 2.0 * r.astype(np.float64))
    y = size * (3.0 / 2.0 * r.astype(np.float64))
    if rr % 2 == 1:
        c, s = np.cos(np.pi / 6.0), np.sin(np.pi / 6.0)
        x, y = c * x + s * y, -s * x + c * y
    return y, x  # lat, lon


def hex_parent(cell: np.ndarray, res: int) -> np.ndarray:
    """Ancestor at coarser resolution = containing hex of the center."""
    cur = hex_res(cell)
    if np.any(cur < res):
        raise ValueError("hex_parent target resolution must be <= cell resolution")
    lat, lon = hex_center(cell)
    return hex_cell(lat, lon, res)


def hex_k_ring(cell: int, k: int) -> np.ndarray:
    """All hex ids within grid distance k of ``cell`` (single id in)."""
    res, q0, r0 = hex_unpack(np.asarray([cell], dtype=np.uint64))
    rr, q0, r0 = int(res[0]), int(q0[0]), int(r0[0])
    out = []
    for dq in range(-k, k + 1):
        for dr in range(max(-k, -dq - k), min(k, -dq + k) + 1):
            out.append((q0 + dq, r0 + dr))
    qs = np.array([o[0] for o in out], dtype=np.int64)
    rs = np.array([o[1] for o in out], dtype=np.int64)
    return (
        (np.uint64(rr) << _U64(58))
        | ((qs + _HEX_OFFSET).astype(np.uint64) << _U64(29))
        | (rs + _HEX_OFFSET).astype(np.uint64)
    )


def s2_children(cell: np.ndarray) -> np.ndarray:
    """(n, 4) child ids one level finer (canonical id arithmetic:
    child lsb l = lsb >> 2; children = c - lsb + (2i+1) * l)."""
    c = np.asarray(cell, dtype=np.uint64)
    lsb = c & (~c + _U64(1))
    l = lsb >> _U64(2)
    if np.any(l == 0):
        raise ValueError("cannot take children of a level-30 cell")
    base = c - lsb
    offs = np.arange(1, 9, 2, dtype=np.uint64)  # 1,3,5,7
    return base[:, None] + offs[None, :] * l[:, None]


def grid_neighbors(cell: np.ndarray, bits: int, radius: int = 1) -> np.ndarray:
    """(n, (2R+1)^2) neighboring grid cells (lat rows clamped at the
    poles, lon columns wrap around the antimeridian)."""
    n_axis = np.int64(1) << bits
    row = (np.asarray(cell, dtype=np.uint64) >> _U64(32)).astype(np.int64)
    col = (np.asarray(cell, dtype=np.uint64) & _U64(0xFFFFFFFF)).astype(np.int64)
    offs = np.arange(-radius, radius + 1, dtype=np.int64)
    rr = np.clip(row[:, None] + offs[None, :], 0, n_axis - 1)
    cc = (col[:, None] + offs[None, :]) % n_axis
    out = (rr[:, :, None].astype(np.uint64) << _U64(32)) | cc[:, None, :].astype(
        np.uint64
    )
    return out.reshape(len(row), -1)


def geohash_neighbors(code: np.ndarray, precision: int) -> np.ndarray:
    """(n, 8) neighboring geohash ints (N, NE, E, SE, S, SW, W, NW) —
    computed on the integer lat/lon grid (clamped lat, wrapped lon)."""
    nbits = 5 * precision
    lon_bits = (nbits + 1) // 2
    lat_bits = nbits // 2
    c = np.asarray(code, dtype=np.uint64)
    if lon_bits > lat_bits:
        lon_q = _compact_bits64(c).astype(np.int64)
        lat_q = _compact_bits64(c >> _U64(1)).astype(np.int64)
    else:
        lon_q = _compact_bits64(c >> _U64(1)).astype(np.int64)
        lat_q = _compact_bits64(c).astype(np.int64)
    n_lat = np.int64(1) << lat_bits
    n_lon = np.int64(1) << lon_bits
    moves = [(1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (-1, -1), (0, -1), (1, -1)]
    out = np.empty((len(c), 8), dtype=np.uint64)
    for i, (dlat, dlon) in enumerate(moves):
        la = np.clip(lat_q + dlat, 0, n_lat - 1).astype(np.uint64)
        lo = ((lon_q + dlon) % n_lon).astype(np.uint64)
        s_lon = _spread_bits32(lo)
        s_lat = _spread_bits32(la)
        if lon_bits > lat_bits:
            out[:, i] = s_lon | (s_lat << _U64(1))
        else:
            out[:, i] = (s_lon << _U64(1)) | s_lat
    return out


def _ij_from_cell(cell: np.ndarray):
    """(face, i, j) of each cell's center leaf (inverse Hilbert traversal
    with the lookup_ij table — public ToFaceIJOrientation algorithm)."""
    c = np.asarray(cell, dtype=np.uint64)
    face = (c >> _U64(61)).astype(np.int64)
    i = np.zeros(len(c), dtype=np.int64)
    j = np.zeros(len(c), dtype=np.int64)
    bits = face & _S2_SWAP_MASK
    lk = _S2_LOOKUP_BITS
    for k in range(7, -1, -1):
        nbits = (_S2_MAX_LEVEL - 7 * lk) if k == 7 else lk
        chunk = ((c >> _U64(k * 2 * lk + 1)) & _U64((1 << (2 * nbits)) - 1)).astype(
            np.int64
        )
        bits += chunk << 2
        bits = _S2_LOOKUP_IJ[bits]
        i += (bits >> (lk + 2)) << (k * lk)
        j += ((bits >> 2) & ((1 << lk) - 1)) << (k * lk)
        bits &= _S2_SWAP_MASK | _S2_INVERT_MASK
    return face, i, j


def _uv_from_st(s: np.ndarray) -> np.ndarray:
    """Inverse of the quadratic projection (_st_from_uv)."""
    return np.where(
        s >= 0.5,
        (1.0 / 3.0) * (4.0 * s * s - 1.0),
        (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)),
    )


def _xyz_from_face_uv(face: np.ndarray, u: np.ndarray, v: np.ndarray):
    """Unit-sphere direction per face (public S2 face conventions,
    inverse of _face_uv_from_xyz)."""
    one = np.ones_like(u)
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    specs = [
        (one, u, v),        # face 0: +x major
        (-u, one, v),       # face 1: +y
        (-u, -v, one),      # face 2: +z
        (-one, -v, -u),     # face 3: -x
        (v, -one, -u),      # face 4: -y
        (v, u, -one),       # face 5: -z
    ]
    for f, (fx, fy, fz) in enumerate(specs):
        m = face == f
        if np.any(m):
            x[m] = fx[m] if isinstance(fx, np.ndarray) else fx
            y[m] = fy[m] if isinstance(fy, np.ndarray) else fy
            z[m] = fz[m] if isinstance(fz, np.ndarray) else fz
    n = np.sqrt(x * x + y * y + z * z)
    return x / n, y / n, z / n


def s2_to_latlon(cell: np.ndarray):
    """(lat, lon) degrees of each cell's center."""
    face, i, j = _ij_from_cell(cell)
    # center leaf -> st at leaf center
    s = (i.astype(np.float64) + 0.5) / (1 << _S2_MAX_LEVEL)
    t = (j.astype(np.float64) + 0.5) / (1 << _S2_MAX_LEVEL)
    u = _uv_from_st(s)
    v = _uv_from_st(t)
    x, y, z = _xyz_from_face_uv(face, u, v)
    lat = np.degrees(np.arctan2(z, np.hypot(x, y)))
    lon = np.degrees(np.arctan2(y, x))
    return lat, lon
