"""Minimal from-scratch shape types (shapely stand-ins for the record
API edge — the engine's hot path is columnar, functions/geom.py; these
exist so the reference's Geometry/BoundingBox semantics
(geometry/src/geometry/) can be reproduced and tested without shapely).

Supported kinds mirror geometry/tests/test_geometry.py:19-37: Point,
LineString, Polygon, MultiPoint, MultiLineString, MultiPolygon,
GeometryCollection.
"""

from __future__ import annotations

import numpy as np


def _fmt(v: float) -> str:
    """WKT coordinate formatting: ints without trailing .0."""
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


class BaseShape:
    kind: str = "BASE"

    @property
    def bounds(self) -> tuple[float, float, float, float]:
        xs, ys = self._xy()
        return (min(xs), min(ys), max(xs), max(ys))

    def _xy(self) -> tuple[list[float], list[float]]:
        raise NotImplementedError

    def transform(self, fn) -> "BaseShape":
        """fn(xs: ndarray, ys: ndarray) -> (xs, ys); returns a new shape."""
        raise NotImplementedError

    @property
    def wkt(self) -> str:
        raise NotImplementedError

    def __eq__(self, other):
        return type(self) is type(other) and self.wkt == other.wkt

    def __hash__(self):
        return hash(self.wkt)

    def equals_exact(self, other: "BaseShape", tolerance: float = 0.0) -> bool:
        if type(self) is not type(other):
            return False
        a = np.array(self._coords_flat())
        b = np.array(other._coords_flat())
        if a.shape != b.shape:
            return False
        return bool(np.all(np.abs(a - b) <= tolerance))

    def _coords_flat(self) -> list[float]:
        xs, ys = self._xy()
        out = []
        for x, y in zip(xs, ys):
            out.extend((x, y))
        return out


class Point(BaseShape):
    kind = "POINT"

    def __init__(self, x: float, y: float):
        self.x = float(x)
        self.y = float(y)

    def _xy(self):
        return [self.x], [self.y]

    def transform(self, fn):
        xs, ys = fn(np.array([self.x]), np.array([self.y]))
        return Point(xs[0], ys[0])

    @property
    def wkt(self):
        return f"POINT ({_fmt(self.x)} {_fmt(self.y)})"


class LineString(BaseShape):
    kind = "LINESTRING"

    def __init__(self, coords):
        self.coords = [(float(x), float(y)) for x, y in coords]

    def _xy(self):
        return [c[0] for c in self.coords], [c[1] for c in self.coords]

    def transform(self, fn):
        xs, ys = self._xy()
        nx, ny = fn(np.array(xs), np.array(ys))
        return LineString(list(zip(nx, ny)))

    @property
    def wkt(self):
        body = ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in self.coords)
        return f"LINESTRING ({body})"


class Polygon(BaseShape):
    kind = "POLYGON"

    def __init__(self, shell, holes=()):
        shell = [(float(x), float(y)) for x, y in shell]
        if shell and shell[0] != shell[-1]:
            shell = shell + [shell[0]]
        self.shell = shell
        self.holes = [
            [(float(x), float(y)) for x, y in h] for h in holes
        ]

    def _xy(self):
        xs = [c[0] for c in self.shell]
        ys = [c[1] for c in self.shell]
        for h in self.holes:
            xs.extend(c[0] for c in h)
            ys.extend(c[1] for c in h)
        return xs, ys

    def transform(self, fn):
        def t(ring):
            xs = np.array([c[0] for c in ring])
            ys = np.array([c[1] for c in ring])
            nx, ny = fn(xs, ys)
            return list(zip(nx, ny))

        return Polygon(t(self.shell), [t(h) for h in self.holes])

    @property
    def wkt(self):
        def ring_wkt(ring):
            return "(" + ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in ring) + ")"

        rings = [ring_wkt(self.shell)] + [ring_wkt(h) for h in self.holes]
        return f"POLYGON ({', '.join(rings)})"


class _Multi(BaseShape):
    member_cls: type = BaseShape

    def __init__(self, members):
        self.members = [
            m if isinstance(m, self.member_cls) else self.member_cls(*m)
            if isinstance(m, tuple)
            else self.member_cls(m)
            for m in members
        ]

    def _xy(self):
        xs, ys = [], []
        for m in self.members:
            mx, my = m._xy()
            xs.extend(mx)
            ys.extend(my)
        return xs, ys

    def transform(self, fn):
        return type(self)([m.transform(fn) for m in self.members])


class MultiPoint(_Multi):
    kind = "MULTIPOINT"
    member_cls = Point

    def __init__(self, members):
        self.members = [
            m if isinstance(m, Point) else Point(m[0], m[1]) for m in members
        ]

    @property
    def wkt(self):
        body = ", ".join(f"({_fmt(m.x)} {_fmt(m.y)})" for m in self.members)
        return f"MULTIPOINT ({body})"


class MultiLineString(_Multi):
    kind = "MULTILINESTRING"
    member_cls = LineString

    @property
    def wkt(self):
        parts = []
        for m in self.members:
            parts.append(
                "(" + ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in m.coords) + ")"
            )
        return f"MULTILINESTRING ({', '.join(parts)})"


class MultiPolygon(_Multi):
    kind = "MULTIPOLYGON"
    member_cls = Polygon

    @property
    def wkt(self):
        parts = []
        for m in self.members:
            inner = m.wkt[len("POLYGON ") :]
            parts.append(inner)
        return f"MULTIPOLYGON ({', '.join(parts)})"


class GeometryCollection(BaseShape):
    kind = "GEOMETRYCOLLECTION"

    def __init__(self, members):
        self.members = list(members)

    def _xy(self):
        xs, ys = [], []
        for m in self.members:
            mx, my = m._xy()
            xs.extend(mx)
            ys.extend(my)
        return xs, ys

    def transform(self, fn):
        return GeometryCollection([m.transform(fn) for m in self.members])

    @property
    def wkt(self):
        return f"GEOMETRYCOLLECTION ({', '.join(m.wkt for m in self.members)})"
