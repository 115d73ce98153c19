"""CRS tests — reference semantics ported onto from-scratch kernels
(golden coordinates from /root/reference/geometry/tests/test_geometry.py:95-137,
ensure_crs contract from test_crs.py, tolerance 0.01)."""

import numpy as np
import pytest

from geografir_ray.functions import crs


# golden pairs from the reference test suite (test_geometry.py:95-137)
GOLDEN = [
    (4326, (-120.185, 39.3569), 26910, (742545.777, 4360163.483)),
    (26910, (742545.777, 4360163.483), 4326, (-120.185, 39.3569)),
]

ALBERS_TRIANGLE_4326 = [
    (-119.2265119, 47.1494626),
    (-76.8890466, 40.6633579),
    (-98.5617967, 29.3224771),
]
ALBERS_TRIANGLE_5070 = [
    (-1753062.53068809, 2899526.83714174),
    (1591497.34267417, 2121855.51950513),
    (-248908.09041749, 697602.45076673),
]


@pytest.mark.parametrize("src,pt,dst,expect", GOLDEN)
def test_reference_golden_points(src, pt, dst, expect):
    x, y = crs.transform(np.array([pt[0]]), np.array([pt[1]]), src, dst)
    assert abs(x[0] - expect[0]) < 0.01
    assert abs(y[0] - expect[1]) < 0.01


def test_reference_golden_albers_triangle():
    src = np.array(ALBERS_TRIANGLE_4326)
    dst = np.array(ALBERS_TRIANGLE_5070)
    x, y = crs.transform(src[:, 0], src[:, 1], 4326, 5070)
    assert np.abs(x - dst[:, 0]).max() < 0.01
    assert np.abs(y - dst[:, 1]).max() < 0.01
    lon, lat = crs.transform(dst[:, 0], dst[:, 1], 5070, 4326)
    assert np.abs(lon - src[:, 0]).max() < 0.01
    assert np.abs(lat - src[:, 1]).max() < 0.01


def test_ensure_crs_passthrough_identity():
    # reference: CRS object in -> same object out (test_crs.py:8-14)
    c = crs.ensure_crs(4326)
    assert crs.ensure_crs(c) is c


@pytest.mark.parametrize("spec", [4326, "4326", "EPSG:4326", "epsg:4326", " EPSG:4326 "])
def test_ensure_crs_spellings(spec):
    assert crs.ensure_crs(spec).epsg == 4326


@pytest.mark.parametrize("spec", ["invalid_crs", "EPSG:99999999", -5, "utm"])
def test_ensure_crs_invalid(spec):
    # reference error contract: CRSError with this message prefix
    # (crs.py:145-146, test_geometry.py:87-90)
    with pytest.raises(crs.CRSError, match="Invalid target CRS specification"):
        crs.ensure_crs(spec)


def test_transform_identity_same_crs():
    x = np.array([1.5, 2.5])
    y = np.array([3.5, 4.5])
    ox, oy = crs.transform(x, y, 4326, "EPSG:4326")
    np.testing.assert_array_equal(ox, x)
    np.testing.assert_array_equal(oy, y)


def test_utm_roundtrip_many():
    rng = np.random.default_rng(47)
    lon = rng.uniform(-126.0 + 3, -120.0 - 0.5, 500)  # zone 10
    lat = rng.uniform(30, 60, 500)
    x, y = crs.tm_forward(lat, lon, crs.ensure_crs(32610))
    lat2, lon2 = crs.tm_inverse(x, y, crs.ensure_crs(32610))
    assert np.abs(lat2 - lat).max() < 1e-9
    assert np.abs(lon2 - lon).max() < 1e-9


def test_southern_hemisphere_utm():
    # Sydney approx: (-33.8688, 151.2093) zone 56S; northing positive, < 1e7
    x, y = crs.transform(np.array([151.2093]), np.array([-33.8688]), 4326, 32756)
    assert 0 < y[0] < 10_000_000
    assert 200_000 < x[0] < 800_000
    lon, lat = crs.transform(x, y, 32756, 4326)
    assert abs(lon[0] - 151.2093) < 1e-6
    assert abs(lat[0] + 33.8688) < 1e-6


def test_webmercator_golden():
    # public golden: (0,0) -> (0,0); lon 180 -> 20037508.34
    x, y = crs.wgs84_to_webmercator(np.array([0.0]), np.array([180.0]))
    assert abs(x[0] - 20037508.342789244) < 1e-6
    assert abs(y[0]) < 1e-9
