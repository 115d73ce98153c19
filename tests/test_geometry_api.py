"""Geometry/BoundingBox record-API tests — reference semantics
(geometry/tests/test_geometry.py, test_bounding_box.py) on the
from-scratch shapes + CRS kernels."""

import numpy as np
import pytest

from geografir_ray.functions.crs import CRSError
from geografir_ray.functions.geometry_api import BoundingBox, Geometry
from geografir_ray.functions.shapes import (
    GeometryCollection,
    LineString,
    MultiLineString,
    MultiPoint,
    MultiPolygon,
    Point,
    Polygon,
)

ALL_SHAPES = [
    Point(1, 2),
    LineString([(0, 0), (1, 1), (2, 0)]),
    Polygon([(0, 0), (2, 0), (2, 2), (0, 2)]),
    MultiPoint([(0, 0), (1, 1)]),
    MultiLineString([LineString([(0, 0), (1, 1)]), LineString([(2, 2), (3, 3)])]),
    MultiPolygon([Polygon([(0, 0), (1, 0), (1, 1)]), Polygon([(2, 2), (3, 2), (3, 3)])]),
    GeometryCollection([Point(1, 2), LineString([(0, 0), (1, 1)])]),
]


@pytest.mark.parametrize("shape", ALL_SHAPES, ids=lambda s: s.kind)
def test_geometry_accepts_all_shape_types(shape):
    g = Geometry(shape, 4326)
    assert g.crs.epsg == 4326
    assert g.geometry is shape


def test_geometry_rejects_non_shape():
    # TypeError on non-shape payload (geometry.py:154-157)
    with pytest.raises(TypeError):
        Geometry("POINT (1 2)", 4326)


def test_geometry_invalid_crs():
    # CRSError contract (test_geometry.py:87-90)
    with pytest.raises(CRSError, match="Invalid target CRS specification"):
        Geometry(Point(1, 2), "invalid_crs")


def test_to_crs_identity_same_object():
    g = Geometry(Point(1, 2), 4326)
    assert g.to_crs("EPSG:4326") is g  # geometry.py:226-227


def test_to_crs_golden_point():
    # reference golden (test_geometry.py:96): 4326 -> 26910
    g = Geometry(Point(-120.185, 39.3569), 4326)
    out = g.to_crs(26910)
    assert out.crs.epsg == 26910
    assert out.geometry.equals_exact(Point(742545.777, 4360163.483), tolerance=0.01)
    back = out.to_crs(4326)
    assert back.geometry.equals_exact(g.geometry, tolerance=0.01)


def test_to_crs_golden_polygon_albers():
    # reference golden triangle 4326 <-> 5070 (test_geometry.py:98-126)
    src = Polygon(
        [
            (-119.2265119, 47.1494626),
            (-76.8890466, 40.6633579),
            (-98.5617967, 29.3224771),
        ]
    )
    expect = Polygon(
        [
            (-1753062.53068809, 2899526.83714174),
            (1591497.34267417, 2121855.51950513),
            (-248908.09041749, 697602.45076673),
        ]
    )
    out = Geometry(src, 4326).to_crs(5070)
    assert out.geometry.equals_exact(expect, tolerance=0.01)


def test_geometry_repr():
    # golden repr (test_geometry.py:159-162)
    g = Geometry(Point(1.1, 2.2), 4326)
    assert repr(g) == "Geometry(geometry=<POINT (1.1 2.2)>, crs='EPSG:4326')"


def test_bounding_box_no_validation():
    # no min<=max validation (bounding_box.py:83-86)
    bb = BoundingBox(5, 5, 1, 1, 4326)
    assert list(bb) == [5, 5, 1, 1]


def test_bounding_box_from_geometry():
    g = Geometry(Polygon([(0, 0), (4, 0), (4, 3), (0, 3)]), 4326)
    bb = BoundingBox.from_geometry(g)
    assert list(bb) == [0, 0, 4, 3]
    assert bb.crs.epsg == 4326


def test_bounding_box_iter_order():
    bb = BoundingBox(1, 2, 3, 4, 4326)
    assert list(bb) == [1, 2, 3, 4]  # [minx, miny, maxx, maxy]


def test_wkt_forms():
    assert Point(1, 2).wkt == "POINT (1 2)"
    assert LineString([(0, 0), (1, 1)]).wkt == "LINESTRING (0 0, 1 1)"
    assert (
        Polygon([(0, 0), (1, 0), (1, 1)]).wkt == "POLYGON ((0 0, 1 0, 1 1, 0 0))"
    )  # auto-closed
    assert MultiPoint([(0, 0), (1, 1)]).wkt == "MULTIPOINT ((0 0), (1 1))"
