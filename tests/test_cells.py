"""Cell-index conformance tests (SURVEY.md §5: published test vectors +
property checks for the from-scratch kernels)."""

import numpy as np
import pytest

from geografir_ray.functions import cells


# ---------------------------------------------------------------------------
# Geohash: canonical published vectors (Niemeyer geohash, public spec)
# ---------------------------------------------------------------------------

GEOHASH_VECTORS = [
    # (lat, lon, precision, expected)
    (42.605, -5.603, 5, "ezs42"),                       # classic wiki example
    (57.64911, 10.40744, 11, "u4pruydqqvj"),            # classic wiki example
    (37.8324, 112.5584, 9, "ww8p1r4t8"),                # public example (Taiyuan)
    (0.0, 0.0, 9, "s00000000"),
    (90.0, 180.0, 4, "zzzz"),                           # corner clamps to last cell
    (-90.0, -180.0, 4, "0000"),
]


@pytest.mark.parametrize("lat,lon,prec,expected", GEOHASH_VECTORS)
def test_geohash_known_vectors(lat, lon, prec, expected):
    got = cells.geohash_encode(np.array([lat]), np.array([lon]), prec)[0]
    assert got == expected


def test_geohash_int_roundtrip():
    rng = np.random.default_rng(42)
    lat = rng.uniform(-89.9, 89.9, 1000)
    lon = rng.uniform(-179.9, 179.9, 1000)
    for prec in (5, 7, 9, 12):
        code = cells.geohash_int(lat, lon, prec)
        clat, clon = cells.geohash_int_to_latlon(code, prec)
        # center of the containing cell re-encodes to the same cell
        code2 = cells.geohash_int(clat, clon, prec)
        np.testing.assert_array_equal(code, code2)
        # cell size bound: |center - point| <= half cell extent
        lat_bits = (5 * prec) // 2
        lon_bits = (5 * prec + 1) // 2
        assert np.max(np.abs(clat - lat)) <= 180.0 / (1 << lat_bits)
        assert np.max(np.abs(clon - lon)) <= 360.0 / (1 << lon_bits)


def test_geohash_prefix_property():
    """A geohash at precision p is a string prefix of precision p+1."""
    rng = np.random.default_rng(7)
    lat = rng.uniform(-85, 85, 500)
    lon = rng.uniform(-179, 179, 500)
    g9 = cells.geohash_encode(lat, lon, 9)
    for p in (4, 6, 8):
        gp = cells.geohash_encode(lat, lon, p)
        assert all(a.startswith(b) for a, b in zip(g9, gp))


# ---------------------------------------------------------------------------
# Grid cells
# ---------------------------------------------------------------------------


def test_grid_cell_box_contains_point():
    rng = np.random.default_rng(3)
    lat = rng.uniform(-89.9, 89.9, 2000)
    lon = rng.uniform(-179.9, 179.9, 2000)
    for bits in (4, 8, 12):
        cell = cells.grid_cell(lat, lon, bits)
        lat0, lat1, lon0, lon1 = cells.grid_cell_box(cell, bits)
        assert np.all((lat >= lat0) & (lat < lat1 + 1e-9))
        assert np.all((lon >= lon0) & (lon < lon1 + 1e-9))


def test_grid_range_covers():
    r0, r1, c0, c1 = cells.grid_range(-1.0, 1.0, -1.0, 1.0, 8)
    # every cell of every point inside the bbox is inside the range
    rng = np.random.default_rng(5)
    lat = rng.uniform(-1, 1, 500)
    lon = rng.uniform(-1, 1, 500)
    cell = cells.grid_cell(lat, lon, 8)
    row = (cell >> np.uint64(32)).astype(np.int64)
    col = (cell & np.uint64(0xFFFFFFFF)).astype(np.int64)
    assert row.min() >= r0 and row.max() <= r1
    assert col.min() >= c0 and col.max() <= c1


# ---------------------------------------------------------------------------
# S2
# ---------------------------------------------------------------------------


def test_s2_structure():
    """Id structure: face in top 3 bits, sentinel lsb at 2*(30-level)."""
    lat = np.array([0.0, 45.0, -30.0, 80.0])
    lon = np.array([0.0, 90.0, -120.0, 10.0])
    for level in (0, 5, 12, 30):
        ids = cells.s2_cell_id(lat, lon, level)
        assert np.all(cells.s2_level(ids) == level)
        lsb = ids & (~ids + np.uint64(1))
        assert np.all(lsb == np.uint64(1) << np.uint64(2 * (30 - level)))


def test_s2_face_centers():
    """Points at face centers land on the right face (public face layout)."""
    # face 0: +x axis => (lat 0, lon 0); face 1: +y => (0, 90);
    # face 2: +z => (90, anything); face 3: -x => (0, 180);
    # face 4: -y => (0, -90); face 5: -z => (-90, anything)
    lat = np.array([0.0, 0.0, 90.0, 0.0, 0.0, -90.0])
    lon = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
    ids = cells.s2_cell_id(lat, lon, 0)
    faces = (ids >> np.uint64(61)).astype(int)
    assert list(faces) == [0, 1, 2, 3, 4, 5]
    # level-0 id is exactly face<<61 ... i.e. (face<<60)<<... with sentinel
    expect = (np.arange(6, dtype=np.uint64) << np.uint64(61)) | (
        np.uint64(1) << np.uint64(60)
    )
    np.testing.assert_array_equal(ids, expect)


def test_s2_parent_consistency():
    rng = np.random.default_rng(11)
    lat = rng.uniform(-89, 89, 2000)
    lon = rng.uniform(-180, 180, 2000)
    full = cells.s2_cell_id(lat, lon, 30)
    for level in (3, 10, 18):
        direct = cells.s2_cell_id(lat, lon, level)
        via_parent = cells.s2_parent(full, level)
        np.testing.assert_array_equal(direct, via_parent)


def test_s2_hilbert_locality():
    """Nearby points at fine level share coarse ancestors (sanity)."""
    lat = np.array([40.0, 40.0001])
    lon = np.array([-111.0, -111.0001])
    a, b = cells.s2_cell_id(lat, lon, 10)
    assert a == b


def test_s2_distinct_at_fine_level():
    rng = np.random.default_rng(13)
    lat = rng.uniform(-60, 60, 5000)
    lon = rng.uniform(-180, 180, 5000)
    ids = cells.s2_cell_id(lat, lon, 30)
    assert len(np.unique(ids)) == 5000  # level 30 cells ~ 1cm: all distinct


# ---------------------------------------------------------------------------
# Hex (H3-style axial fallback)
# ---------------------------------------------------------------------------


def test_hex_roundtrip_center():
    rng = np.random.default_rng(17)
    lat = rng.uniform(-60, 72, 2000)
    lon = rng.uniform(-170, 170, 2000)
    for res in (5, 7, 9):
        cell = cells.hex_cell(lat, lon, res)
        clat, clon = cells.hex_center(cell)
        cell2 = cells.hex_cell(clat, clon, res)
        np.testing.assert_array_equal(cell, cell2)
        # center within circumradius of the point's hex
        d = np.hypot(clat - lat, clon - lon)
        assert np.max(d) <= cells._hex_size(res) * 1.0000001


def test_hex_res_field():
    lat = np.array([10.0])
    lon = np.array([20.0])
    for res in range(0, 16):
        cell = cells.hex_cell(lat, lon, res)
        assert cells.hex_res(cell)[0] == res


def test_hex_parent_contains_child_center():
    rng = np.random.default_rng(19)
    lat = rng.uniform(-60, 72, 500)
    lon = rng.uniform(-170, 170, 500)
    child = cells.hex_cell(lat, lon, 9)
    parent = cells.hex_parent(child, 7)
    assert np.all(cells.hex_res(parent) == 7)
    clat, clon = cells.hex_center(child)
    np.testing.assert_array_equal(parent, cells.hex_cell(clat, clon, 7))


def test_hex_k_ring():
    cell = cells.hex_cell(np.array([10.0]), np.array([20.0]), 7)[0]
    ring0 = cells.hex_k_ring(cell, 0)
    assert len(ring0) == 1 and ring0[0] == cell
    for k in (1, 2, 3):
        ring = cells.hex_k_ring(cell, k)
        assert len(ring) == 1 + 3 * k * (k + 1)  # hexagonal number
        assert cell in ring
        assert len(np.unique(ring)) == len(ring)


def test_s2_children_parent_roundtrip():
    rng = np.random.default_rng(67)
    lat = rng.uniform(-80, 80, 500)
    lon = rng.uniform(-179, 179, 500)
    for level in (5, 12, 20):
        parent = cells.s2_cell_id(lat, lon, level)
        kids = cells.s2_children(parent)
        assert kids.shape == (500, 4)
        for j in range(4):
            assert np.all(cells.s2_level(kids[:, j]) == level + 1)
            np.testing.assert_array_equal(cells.s2_parent(kids[:, j], level), parent)
        # all four children distinct
        assert all(len(set(kids[i])) == 4 for i in range(0, 500, 50))


def test_s2_children_of_leaf_raises():
    leaf = cells.s2_cell_id(np.array([10.0]), np.array([20.0]), 30)
    with pytest.raises(ValueError, match="level-30"):
        cells.s2_children(leaf)


def test_geohash_neighbors_are_adjacent():
    rng = np.random.default_rng(71)
    lat = rng.uniform(-80, 80, 200)
    lon = rng.uniform(-170, 170, 200)
    prec = 6
    code = cells.geohash_int(lat, lon, prec)
    nb = cells.geohash_neighbors(code, prec)
    assert nb.shape == (200, 8)
    clat, clon = cells.geohash_int_to_latlon(code, prec)
    lat_bits = (5 * prec) // 2
    lon_bits = (5 * prec + 1) // 2
    dlat = 180.0 / (1 << lat_bits)
    dlon = 360.0 / (1 << lon_bits)
    for j in range(8):
        nlat, nlon = cells.geohash_int_to_latlon(nb[:, j], prec)
        assert np.all(np.abs(nlat - clat) <= dlat + 1e-9)
        # lon may wrap; compare circular distance
        dd = np.minimum(np.abs(nlon - clon), 360.0 - np.abs(nlon - clon))
        assert np.all(dd <= dlon + 1e-9)
    # neighbors distinct from the center
    assert np.all(nb != code[:, None])


def test_grid_neighbors_match_knn_internal():
    from geografir_ray.stages.knn import _neighbor_cells

    rng = np.random.default_rng(73)
    lat = rng.uniform(-80, 80, 300)
    lon = rng.uniform(-179, 179, 300)
    cell = cells.grid_cell(lat, lon, 6)
    np.testing.assert_array_equal(
        cells.grid_neighbors(cell, 6, 1), _neighbor_cells(cell, 6, 1)
    )


def test_s2_to_latlon_roundtrip_all_levels():
    rng = np.random.default_rng(79)
    lat = rng.uniform(-89, 89, 2000)
    lon = rng.uniform(-180, 180, 2000)
    for level in (1, 5, 10, 15, 20, 30):
        ids = cells.s2_cell_id(lat, lon, level)
        clat, clon = cells.s2_to_latlon(ids)
        np.testing.assert_array_equal(cells.s2_cell_id(clat, clon, level), ids)


def test_s2_center_near_point_at_fine_level():
    # level-20 cells are ~10m: center within ~0.001 deg of the point
    ids = cells.s2_cell_id(np.array([40.7128]), np.array([-74.0060]), 20)
    clat, clon = cells.s2_to_latlon(ids)
    assert abs(clat[0] - 40.7128) < 1e-3
    assert abs(clon[0] + 74.0060) < 1e-3


# ---------------------------------------------------------------------------
# S2 canonical-vector validation: an INDEPENDENT bit-by-bit reference
# implementation built directly from the published s2geometry
# constants (kIJtoPos / kPosToOrientation / ValidFaceXYZtoUV / the
# quadratic UVtoST), with no shared code with functions/cells.py
# (which uses the 4-bit lookup-table acceleration).  Agreement across
# random points and levels proves the ST projection, face/UV
# conventions, Hilbert orientation chain, and id bit-packing all match
# the canonical algorithm — a wrong orientation or projection in
# either implementation would diverge immediately.
# ---------------------------------------------------------------------------

_KIJ_TO_POS = [[0, 1, 3, 2], [0, 3, 1, 2], [2, 3, 1, 0], [2, 1, 3, 0]]
_KPOS_TO_ORIENT = [1, 0, 0, 3]  # kSwapMask, 0, 0, kInvertMask|kSwapMask


def _ref_s2_id(lat_deg: float, lon_deg: float, level: int) -> int:
    import math

    phi, lam = math.radians(lat_deg), math.radians(lon_deg)
    x = math.cos(phi) * math.cos(lam)
    y = math.cos(phi) * math.sin(lam)
    z = math.sin(phi)
    ax, ay, az = abs(x), abs(y), abs(z)
    if ax >= ay and ax >= az:
        face = 0 if x >= 0 else 3
    elif ay >= az:
        face = 1 if y >= 0 else 4
    else:
        face = 2 if z >= 0 else 5
    u, v = {
        0: lambda: (y / x, z / x),
        1: lambda: (-x / y, z / y),
        2: lambda: (-x / z, -y / z),
        3: lambda: (z / x, y / x),
        4: lambda: (z / y, -x / y),
        5: lambda: (-y / z, -x / z),
    }[face]()

    def st(w: float) -> float:
        return 0.5 * math.sqrt(1 + 3 * w) if w >= 0 else 1 - 0.5 * math.sqrt(1 - 3 * w)

    def ij(s: float) -> int:
        return min(max(int(math.floor(s * (1 << 30))), 0), (1 << 30) - 1)

    i, j = ij(st(u)), ij(st(v))
    orient = face & 1
    pos = 0
    for k in range(29, -1, -1):
        q = (((i >> k) & 1) << 1) | ((j >> k) & 1)
        p = _KIJ_TO_POS[orient][q]
        pos = (pos << 2) | p
        orient ^= _KPOS_TO_ORIENT[p]
    cell = (face << 61) | (pos << 1) | 1
    if level < 30:
        lsb = 1 << (2 * (30 - level))
        cell = (cell & ~(lsb - 1)) | lsb
    return cell


def test_s2_matches_independent_reference():
    rng = np.random.default_rng(1729)
    lat = rng.uniform(-89.9, 89.9, 300)
    lon = rng.uniform(-180.0, 180.0, 300)
    for level in (1, 4, 9, 17, 30):
        got = cells.s2_cell_id(lat, lon, level)
        expect = np.array(
            [_ref_s2_id(float(a), float(o), level) for a, o in zip(lat, lon)],
            dtype=np.uint64,
        )
        np.testing.assert_array_equal(got, expect)


def test_s2_pinned_level1_vectors():
    """Hand-derived level-1 ids on face 0 (orientation chain pinned):
    (10N, 20E) has u=tan(20)>0 (i MSB 1), v=tan(10)>0 (j MSB 1) =>
    q=(i<<1)|j=3 => kIJtoPos[0][3] = 2 => id = (2<<59)|(1<<58) =
    0x1400...; the other three quadrants follow the same published
    table row (level-1 id = face<<61 | pos<<59 | 1<<58)."""
    cases = [
        # (lat, lon) -> ij-quadrant -> hilbert pos via kIJtoPos[0]
        ((-10.0, -20.0), 0x0400000000000000),  # i=0,j=0 -> pos 0
        ((+10.0, -20.0), 0x0C00000000000000),  # i=0,j=1 -> pos 1
        ((+10.0, +20.0), 0x1400000000000000),  # i=1,j=1 -> pos 2
        ((-10.0, +20.0), 0x1C00000000000000),  # i=1,j=0 -> pos 3
    ]
    for (la, lo), expect in cases:
        got = int(cells.s2_cell_id(np.array([la]), np.array([lo]), 1)[0])
        assert got == expect, (la, lo, hex(got), hex(expect))
