"""Geometry / BoundingBox record API — reference parity surface
(/root/reference/geometry/src/geometry/geometry.py:95-245,
bounding_box.py:60-179) over the from-scratch shape types and CRS
kernels.  The engine's hot path is columnar (functions/geom.py); this
record view exists at the Python-API edge (SURVEY.md §1.3).

Semantics preserved:
- constructor validates payload type → TypeError (geometry.py:154-157)
- CRS normalized through ensure_crs (geometry.py:160)
- to_crs: returns SELF when CRSs equal (geometry.py:226-227); new
  Geometry with transformed coords otherwise, always_xy coordinate
  order (geometry.py:231-238)
- repr: "Geometry(geometry=<WKT>, crs='EPSG:x')" (geometry.py:242-245)
- BoundingBox: 4 scalars + CRS, NO min<=max validation
  (bounding_box.py:83-93); from_geometry extracts .bounds
  (bounding_box.py:138-169); iterates [minx, miny, maxx, maxy]
  (bounding_box.py:172-174)
"""

from __future__ import annotations

from .crs import CRSDef, ensure_crs, transform as crs_transform
from .shapes import BaseShape


class Geometry:
    def __init__(self, geometry: BaseShape, crs):
        if not isinstance(geometry, BaseShape):
            raise TypeError(
                f"geometry must be a shape instance, got {type(geometry).__name__}"
            )
        self.geometry = geometry
        self.crs: CRSDef = ensure_crs(crs)

    def to_crs(self, crs) -> "Geometry":
        target = ensure_crs(crs)
        if self.crs.equals(target):
            return self  # same-object identity (geometry.py:226-227)

        def fn(xs, ys):
            return crs_transform(xs, ys, self.crs, target)

        return Geometry(self.geometry.transform(fn), target)

    def __repr__(self):
        return f"Geometry(geometry=<{self.geometry.wkt}>, crs='{self.crs.name}')"


class BoundingBox:
    def __init__(self, minx, miny, maxx, maxy, crs):
        self.minx = float(minx)
        self.miny = float(miny)
        self.maxx = float(maxx)
        self.maxy = float(maxy)
        self.crs: CRSDef = ensure_crs(crs)

    @staticmethod
    def from_geometry(geometry: Geometry) -> "BoundingBox":
        minx, miny, maxx, maxy = geometry.geometry.bounds
        return BoundingBox(minx, miny, maxx, maxy, geometry.crs)

    def __iter__(self):
        return iter([self.minx, self.miny, self.maxx, self.maxy])

    def __repr__(self):
        return (
            f"BoundingBox(minx={self.minx}, miny={self.miny}, "
            f"maxx={self.maxx}, maxy={self.maxy}, crs='{self.crs.name}')"
        )
