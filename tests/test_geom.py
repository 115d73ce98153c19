"""Geometry kernel tests: PIP vs scalar reference, STRtree vs brute
force, bbox semantics, haversine goldens."""

import numpy as np
import pytest

from geografir_ray.functions import geom, synthgeo


def _scalar_pip(px, py, ring):
    """Independent scalar ray-casting reference (textbook form)."""
    inside = False
    n = len(ring)
    j = n - 1
    for i in range(n):
        xi, yi = ring[i]
        xj, yj = ring[j]
        if (yi <= py) != (yj <= py):
            xint = xi + (py - yi) / (yj - yi) * (xj - xi)
            if px < xint:
                inside = not inside
        j = i
    return inside


def test_pip_matches_scalar_reference():
    rng = np.random.default_rng(23)
    # irregular concave polygon
    ang = np.sort(rng.uniform(0, 2 * np.pi, 11))
    rad = rng.uniform(0.5, 2.0, 11)
    ring = np.stack([rad * np.cos(ang), rad * np.sin(ang)], axis=1)
    px = rng.uniform(-2.5, 2.5, 3000)
    py = rng.uniform(-2.5, 2.5, 3000)
    got = geom.points_in_polygon(px, py, ring)
    want = np.array([_scalar_pip(x, y, ring) for x, y in zip(px, py)])
    np.testing.assert_array_equal(got, want)


def test_pip_diamond_matches_closed_form():
    zones = np.arange(25, dtype=np.int64)
    verts = synthgeo.zone_vertices(zones)
    p = synthgeo.zone_params(zones)
    rng = np.random.default_rng(29)
    for z in range(0, 25, 5):
        px = rng.uniform(p["cx"][z] - 8, p["cx"][z] + 8, 2000)
        py = rng.uniform(p["cy"][z] - 6, p["cy"][z] + 6, 2000)
        got = geom.points_in_polygon(px, py, verts[z])
        want = synthgeo.point_in_diamond(
            px, py, p["cx"][z], p["cy"][z], p["rx"][z], p["ry"][z]
        )
        # closed form uses <=; raycast boundary rule may differ ON the edge
        edge = np.abs(
            np.abs(px - p["cx"][z]) / p["rx"][z] + np.abs(py - p["cy"][z]) / p["ry"][z] - 1.0
        ) < 1e-12
        np.testing.assert_array_equal(got[~edge], want[~edge])


def test_pairs_pip():
    zones = np.arange(10, dtype=np.int64)
    verts = synthgeo.zone_vertices(zones)
    vertex_xy = verts.reshape(-1, 2)
    ring_offsets = np.arange(0, 44, 4)
    rng = np.random.default_rng(31)
    px = rng.uniform(-180, 180, 500)
    py = rng.uniform(-60, 72, 500)
    poly_idx = rng.integers(0, 10, 500)
    got = geom.points_in_polygons_pairs(px, py, poly_idx, vertex_xy, ring_offsets)
    want = np.array(
        [_scalar_pip(x, y, verts[p]) for x, y, p in zip(px, py, poly_idx)]
    )
    np.testing.assert_array_equal(got, want)


def test_bbox_of_rings():
    zones = np.arange(7, dtype=np.int64)
    verts = synthgeo.zone_vertices(zones)
    boxes = geom.bbox_of_rings(verts.reshape(-1, 2), np.arange(0, 32, 4))
    p = synthgeo.zone_params(zones)
    np.testing.assert_allclose(boxes[:, 0], p["cx"] - p["rx"])
    np.testing.assert_allclose(boxes[:, 1], p["cy"] - p["ry"])
    np.testing.assert_allclose(boxes[:, 2], p["cx"] + p["rx"])
    np.testing.assert_allclose(boxes[:, 3], p["cy"] + p["ry"])


def test_haversine_goldens():
    # Public golden: Paris (48.8566, 2.3522) <-> NYC (40.7128, -74.0060)
    # great-circle distance ~ 5837 km (R=6371)
    d = geom.haversine_km(48.8566, 2.3522, 40.7128, -74.0060)
    assert abs(d - 5837.0) < 5.0
    # zero distance, antipodal bound
    assert geom.haversine_km(10.0, 20.0, 10.0, 20.0) == 0.0
    assert abs(geom.haversine_km(0.0, 0.0, 0.0, 180.0) - np.pi * 6371.0) < 1.0


def test_strtree_query_box_matches_brute_force():
    rng = np.random.default_rng(37)
    n = 500
    cx = rng.uniform(-100, 100, n)
    cy = rng.uniform(-50, 50, n)
    w = rng.uniform(0.1, 5, n)
    h = rng.uniform(0.1, 5, n)
    boxes = np.stack([cx - w, cy - h, cx + w, cy + h], axis=1)
    tree = geom.STRtree(boxes)
    for _ in range(30):
        qx0, qy0 = rng.uniform(-100, 90), rng.uniform(-50, 40)
        qx1, qy1 = qx0 + rng.uniform(0.5, 15), qy0 + rng.uniform(0.5, 15)
        got = np.sort(tree.query_box(qx0, qy0, qx1, qy1))
        brute = np.flatnonzero(
            (boxes[:, 0] <= qx1) & (boxes[:, 2] >= qx0) & (boxes[:, 1] <= qy1) & (boxes[:, 3] >= qy0)
        )
        np.testing.assert_array_equal(got, brute)


def test_strtree_query_points_matches_brute_force():
    rng = np.random.default_rng(41)
    n = 300
    cx = rng.uniform(-100, 100, n)
    cy = rng.uniform(-50, 50, n)
    w = rng.uniform(0.5, 8, n)
    h = rng.uniform(0.5, 8, n)
    boxes = np.stack([cx - w, cy - h, cx + w, cy + h], axis=1)
    tree = geom.STRtree(boxes)
    px = rng.uniform(-110, 110, 1000)
    py = rng.uniform(-60, 60, 1000)
    pi, bi = tree.query_points(px, py)
    got = set(zip(pi.tolist(), bi.tolist()))
    inside = (
        (boxes[None, :, 0] <= px[:, None])
        & (boxes[None, :, 2] >= px[:, None])
        & (boxes[None, :, 1] <= py[:, None])
        & (boxes[None, :, 3] >= py[:, None])
    )
    want = set(zip(*[a.tolist() for a in np.nonzero(inside)]))
    assert got == want


def test_strtree_empty():
    tree = geom.STRtree(np.empty((0, 4)))
    assert len(tree.query_box(0, 0, 1, 1)) == 0
    pi, bi = tree.query_points(np.array([0.0]), np.array([0.0]))
    assert len(pi) == 0 and len(bi) == 0


def test_cover_bboxes_with_grid():
    boxes = np.array([[-1.0, -1.0, 1.0, 1.0], [100.0, 40.0, 101.0, 41.0]])
    poly, cell = geom.cover_bboxes_with_grid(boxes, bits=8)
    from geografir_ray.functions import cells as C

    # every point inside each box must land in a covered cell
    rng = np.random.default_rng(43)
    for p, box in enumerate(boxes):
        lat = rng.uniform(box[1], box[3], 200)
        lon = rng.uniform(box[0], box[2], 200)
        pc = C.grid_cell(lat, lon, 8)
        covered = set(cell[poly == p].tolist())
        assert set(pc.tolist()) <= covered


def test_synthgeo_ranges_and_determinism():
    k = np.arange(100000, dtype=np.int64)
    lat = synthgeo.synth_lat(k)
    lon = synthgeo.synth_lon(k)
    assert lat.min() >= -60.0 and lat.max() < 72.0
    assert lon.min() >= -180.0 and lon.max() < 180.0
    np.testing.assert_array_equal(lat, synthgeo.synth_lat(k))  # deterministic
    # skew: hot fraction ~70%
    hot = (k % 10) < 7
    assert 0.69 < hot.mean() < 0.71


def test_grid_zone_index_matches_brute_force():
    rng = np.random.default_rng(53)
    zones = np.arange(25, dtype=np.int64)
    verts = synthgeo.zone_vertices(zones)
    vertex_xy = verts.reshape(-1, 2)
    ring_offsets = np.arange(0, 4 * 26, 4)
    idx = geom.GridZoneIndex(vertex_xy, ring_offsets, bits=6)
    px = rng.uniform(-180, 180, 20000)
    py = rng.uniform(-60, 72, 20000)
    pi, zi = idx.contains_pairs(px, py)
    got = set(zip(pi.tolist(), zi.tolist()))
    p = synthgeo.zone_params(zones)
    expect = set()
    for z in range(25):
        inside = synthgeo.point_in_diamond(px, py, p["cx"][z], p["cy"][z], p["rx"][z], p["ry"][z])
        expect.update((int(i), z) for i in np.flatnonzero(inside))
    assert got == expect


def test_grid_zone_index_empty():
    idx = geom.GridZoneIndex(np.empty((0, 2)), np.array([0]), bits=6)
    pi, zi = idx.contains_pairs(np.array([1.0]), np.array([2.0]))
    assert len(pi) == 0 and len(zi) == 0


def test_pip_with_holes_even_odd():
    # 10x10 shell with a 4x4 hole in the middle
    shell = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=float)
    hole = np.array([[3, 3], [7, 3], [7, 7], [3, 7]], dtype=float)
    vxy = np.vstack([shell, hole])
    offs = np.array([0, 4, 8])
    px = np.array([5.0, 1.0, 5.0, 11.0, 3.5])
    py = np.array([5.0, 1.0, 2.0, 5.0, 3.5])
    got = geom.points_in_polygon_with_holes(px, py, vxy, offs)
    # center -> in hole (False); (1,1) in shell (True); (5,2) in shell
    # below hole (True); (11,5) outside (False); (3.5,3.5) in hole (False)
    np.testing.assert_array_equal(got, [False, True, True, False, False])


def test_pip_with_holes_matches_single_ring_when_no_holes():
    rng = np.random.default_rng(97)
    ang = np.sort(rng.uniform(0, 2 * np.pi, 9))
    rad = rng.uniform(0.5, 2.0, 9)
    ring = np.stack([rad * np.cos(ang), rad * np.sin(ang)], axis=1)
    px = rng.uniform(-2.2, 2.2, 500)
    py = rng.uniform(-2.2, 2.2, 500)
    single = geom.points_in_polygon(px, py, ring)
    multi = geom.points_in_polygon_with_holes(px, py, ring, np.array([0, len(ring)]))
    np.testing.assert_array_equal(single, multi)
