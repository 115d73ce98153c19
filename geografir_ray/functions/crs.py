"""From-scratch CRS registry + vectorized projection kernels.

Replaces the reference's pyproj dependence (ensure_crs,
/root/reference/geometry/src/geometry/crs.py:46-146; Geometry.to_crs,
geometry.py:163-239) with a small EPSG registry and closed-form numpy
kernels (no pyproj in the sandbox):

- EPSG:4326  geographic WGS84 (lon/lat degrees)
- EPSG:3857  spherical web mercator
- EPSG:326xx / 327xx  UTM on WGS84 (transverse mercator, Karney/Krüger
  6th-order series — published formulas, sub-mm accurate)
- EPSG:26901-26923  UTM on NAD83 (GRS80 ellipsoid)
- EPSG:5070  CONUS Albers equal-area (NAD83), EPSG:3310 California Albers
  (Snyder 1987 §14, exact forward, Newton-iterated inverse)

Semantics preserved from the reference:
- ``ensure_crs`` accepts CRS objects (identity pass-through,
  crs.py:140-141), int EPSG codes and "EPSG:xxxx"/"epsg:xxxx" strings
  (crs.py:143-144), raising ``CRSError("Invalid target CRS
  specification: ...")`` otherwise (crs.py:145-146).
- ``transform(...)`` between incompatible CRSs raises
  ``TransformError`` (geometry.py:232-235); equal CRSs are an identity
  (geometry.py:226-227).
- Transformer state is cached per process keyed by (src, dst) —
  hoisting the reference's per-call Transformer construction
  (geometry.py:231) out of the hot loop (SURVEY.md §3B).

Accuracy is pinned by the reference's own golden coordinates at
tolerance 0.01 (geometry/tests/test_geometry.py:95-137).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


class CRSError(ValueError):
    """Invalid CRS specification (mirrors pyproj.exceptions.CRSError use)."""


class TransformError(ValueError):
    """Incompatible CRSs (mirrors geometry/src/geometry/exceptions.py:1-2)."""


# ---------------------------------------------------------------------------
# Ellipsoids
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Ellipsoid:
    a: float
    f: float

    @property
    def e2(self) -> float:
        return self.f * (2.0 - self.f)


WGS84 = Ellipsoid(6378137.0, 1.0 / 298.257223563)
GRS80 = Ellipsoid(6378137.0, 1.0 / 298.257222101)


@dataclass(frozen=True)
class CRSDef:
    epsg: int
    kind: str  # "geographic" | "webmercator" | "tm" | "albers"
    ellipsoid: Ellipsoid = WGS84
    lon0: float = 0.0
    lat0: float = 0.0
    k0: float = 1.0
    x0: float = 0.0
    y0: float = 0.0
    lat1: float = 0.0  # albers standard parallels
    lat2: float = 0.0

    @property
    def name(self) -> str:
        return f"EPSG:{self.epsg}"

    def equals(self, other: "CRSDef") -> bool:
        return isinstance(other, CRSDef) and self.epsg == other.epsg


def _build_registry() -> dict[int, CRSDef]:
    reg: dict[int, CRSDef] = {
        4326: CRSDef(4326, "geographic", WGS84),
        4269: CRSDef(4269, "geographic", GRS80),  # NAD83 geographic
        3857: CRSDef(3857, "webmercator", WGS84),
        5070: CRSDef(
            5070, "albers", GRS80, lon0=-96.0, lat0=23.0, lat1=29.5, lat2=45.5
        ),
        3310: CRSDef(
            3310,
            "albers",
            GRS80,
            lon0=-120.0,
            lat0=0.0,
            lat1=34.0,
            lat2=40.5,
            y0=-4000000.0,
        ),
    }
    for zone in range(1, 61):
        lon0 = -183.0 + 6.0 * zone
        reg[32600 + zone] = CRSDef(
            32600 + zone, "tm", WGS84, lon0=lon0, k0=0.9996, x0=500000.0
        )
        reg[32700 + zone] = CRSDef(
            32700 + zone, "tm", WGS84, lon0=lon0, k0=0.9996, x0=500000.0, y0=10000000.0
        )
    for zone in range(1, 24):  # NAD83 UTM
        lon0 = -183.0 + 6.0 * zone
        reg[26900 + zone] = CRSDef(
            26900 + zone, "tm", GRS80, lon0=lon0, k0=0.9996, x0=500000.0
        )
    return reg


_REGISTRY = _build_registry()


def _parse_proj4(s: str) -> CRSDef | None:
    """Resolve a PROJ4 string to a registry CRSDef (the projection
    families the registry supports: longlat, web mercator, UTM/tmerc,
    Albers).  Returns None when the string is not one of them."""
    kv: dict[str, str] = {}
    flags: set[str] = set()
    for p in s.split():
        if not p.startswith("+"):
            return None
        body = p[1:]
        if "=" in body:
            k, v = body.split("=", 1)
            kv[k] = v
        else:
            flags.add(body)
    proj = kv.get("proj")
    datum = kv.get("datum", "").upper()
    ellps = kv.get("ellps", "").upper()
    nad83 = datum == "NAD83" or (not datum and ellps == "GRS80")

    def f(key: str, default: float = 0.0) -> float:
        try:
            return float(kv.get(key, default))
        except ValueError:
            return float("nan")

    if proj == "longlat":
        if nad83:
            return _REGISTRY.get(4269)
        if datum in ("", "WGS84") and ellps in ("", "WGS84"):
            return _REGISTRY.get(4326)
        return None
    if proj == "merc":
        # the canonical web-mercator spelling: spherical radius 6378137
        # (+a=+b) or +ellps=WGS84 with +nadgrids=@null, lat_ts 0
        spherical = kv.get("a") == "6378137" and kv.get("b", kv.get("a")) == "6378137"
        if (spherical or "nadgrids" in kv) and f("lat_ts") == 0.0 and f("lon_0") == 0.0:
            return _REGISTRY.get(3857)
        return None
    if proj == "utm":
        try:
            zone = int(kv["zone"])
        except (KeyError, ValueError):
            return None
        south = "south" in flags
        if nad83:
            return None if south else _REGISTRY.get(26900 + zone)
        return _REGISTRY.get((32700 if south else 32600) + zone)
    if proj == "tmerc":
        # match against the UTM registry entries
        if f("lat_0") == 0.0 and abs(f("k", 1.0) - 0.9996) < 1e-12 and f("x_0") == 500000.0:
            zone = (f("lon_0") + 183.0) / 6.0
            if zone == int(zone) and 1 <= int(zone) <= 60:
                zone = int(zone)
                if nad83:
                    return None if f("y_0") != 0.0 else _REGISTRY.get(26900 + zone)
                if f("y_0") == 10000000.0:
                    return _REGISTRY.get(32700 + zone)
                if f("y_0") == 0.0:
                    return _REGISTRY.get(32600 + zone)
        return None
    if proj == "aea":
        for code in (5070, 3310):
            c = _REGISTRY[code]
            if (
                f("lat_1") == c.lat1
                and f("lat_2") == c.lat2
                and f("lat_0") == c.lat0
                and f("lon_0") == c.lon0
                and f("x_0") == c.x0
                and f("y_0") == c.y0
            ):
                return c
        return None
    return None


_WKT_HEADS = (
    "GEOGCRS", "GEOGCS", "PROJCRS", "PROJCS", "GEODCRS", "COMPOUNDCRS",
    "BOUNDCRS", "GEOCCS",
)


def _parse_wkt(s: str) -> CRSDef | None:
    """Resolve a WKT1/WKT2 CRS string via its (outermost, i.e. last)
    EPSG authority/id clause."""
    import re

    codes = re.findall(r'(?:AUTHORITY|ID)\s*\[\s*"EPSG"\s*,\s*"?(\d+)"?', s)
    if codes:
        return _REGISTRY.get(int(codes[-1]))
    return None


def ensure_crs(crs) -> CRSDef:
    """Normalize int / "EPSG:x" / PROJ4 string / WKT string / CRSDef
    to a CRSDef.

    Same contract as the reference ensure_crs (crs.py:46-146, which
    delegates to pyproj CRS.from_user_input): CRSDef pass-through is
    identity (crs.py:140-141); EPSG ints and strings, PROJ4 strings
    ("+proj=..." — geometry/tests/test_crs.py:31-37) and WKT strings
    (test_crs.py:40-48) resolve to registry entries; anything else
    raises ``CRSError("Invalid target CRS specification: ...")`` with
    the reference's exact message prefix (crs.py:145-146).
    """
    if isinstance(crs, CRSDef):
        return crs
    code: int | None = None
    if isinstance(crs, (int, np.integer)):
        code = int(crs)
    elif isinstance(crs, str):
        s = crs.strip()
        if s.upper().startswith("EPSG:"):
            tail = s[5:]
            if tail.isdigit():
                code = int(tail)
        elif s.isdigit():
            code = int(s)
        elif s.startswith("+"):
            found = _parse_proj4(s)
            if found is not None:
                return found
        elif s.upper().startswith(_WKT_HEADS) and "[" in s:
            found = _parse_wkt(s)
            if found is not None:
                return found
    if code is not None and code in _REGISTRY:
        return _REGISTRY[code]
    raise CRSError(f"Invalid target CRS specification: {crs}")


# ---------------------------------------------------------------------------
# Web mercator
# ---------------------------------------------------------------------------

_WEBMERC_LIMIT = 85.051128779806589


def wgs84_to_webmercator(lat, lon):
    a = WGS84.a
    lat = np.clip(np.asarray(lat, dtype=np.float64), -_WEBMERC_LIMIT, _WEBMERC_LIMIT)
    x = np.radians(np.asarray(lon, dtype=np.float64)) * a
    y = np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0)) * a
    return x, y


def webmercator_to_wgs84(x, y):
    a = WGS84.a
    lon = np.degrees(np.asarray(x, dtype=np.float64) / a)
    lat = np.degrees(2.0 * np.arctan(np.exp(np.asarray(y, dtype=np.float64) / a)) - np.pi / 2.0)
    return lat, lon


# ---------------------------------------------------------------------------
# Transverse Mercator — Karney (2011) / Krüger series, 6th order in n.
# Published algorithm; sub-mm over a UTM zone.
# ---------------------------------------------------------------------------


def _tm_constants(ell: Ellipsoid):
    n = ell.f / (2.0 - ell.f)
    n2, n3, n4, n5, n6 = n**2, n**3, n**4, n**5, n**6
    A = ell.a / (1 + n) * (1 + n2 / 4 + n4 / 64 + n6 / 256)
    alpha = np.array(
        [
            n / 2 - 2 * n2 / 3 + 5 * n3 / 16 + 41 * n4 / 180 - 127 * n5 / 288 + 7891 * n6 / 37800,
            13 * n2 / 48 - 3 * n3 / 5 + 557 * n4 / 1440 + 281 * n5 / 630 - 1983433 * n6 / 1935360,
            61 * n3 / 240 - 103 * n4 / 140 + 15061 * n5 / 26880 + 167603 * n6 / 181440,
            49561 * n4 / 161280 - 179 * n5 / 168 + 6601661 * n6 / 7257600,
            34729 * n5 / 80640 - 3418889 * n6 / 1995840,
            212378941 * n6 / 319334400,
        ]
    )
    beta = np.array(
        [
            n / 2 - 2 * n2 / 3 + 37 * n3 / 96 - n4 / 360 - 81 * n5 / 512 + 96199 * n6 / 604800,
            n2 / 48 + n3 / 15 - 437 * n4 / 1440 + 46 * n5 / 105 - 1118711 * n6 / 3870720,
            17 * n3 / 480 - 37 * n4 / 840 - 209 * n5 / 4480 + 5569 * n6 / 90720,
            4397 * n4 / 161280 - 11 * n5 / 504 - 830251 * n6 / 7257600,
            4583 * n5 / 161280 - 108847 * n6 / 3991680,
            20648693 * n6 / 638668800,
        ]
    )
    return A, alpha, beta


_TM_CACHE: dict[float, tuple] = {}


def _tm_const_cached(ell: Ellipsoid):
    key = ell.f
    if key not in _TM_CACHE:
        _TM_CACHE[key] = _tm_constants(ell)
    return _TM_CACHE[key]


def tm_forward(lat, lon, crs: CRSDef):
    """Geographic (deg) -> transverse mercator easting/northing."""
    ell = crs.ellipsoid
    A, alpha, _ = _tm_const_cached(ell)
    e = np.sqrt(ell.e2)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64) - crs.lon0)
    # conformal latitude
    t = np.sinh(
        np.arctanh(np.sin(phi)) - e * np.arctanh(e * np.sin(phi))
    )
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.hypot(t, np.cos(lam)))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j in range(6):
        xi += alpha[j] * np.sin(2 * (j + 1) * xi_p) * np.cosh(2 * (j + 1) * eta_p)
        eta += alpha[j] * np.cos(2 * (j + 1) * xi_p) * np.sinh(2 * (j + 1) * eta_p)
    x = crs.k0 * A * eta + crs.x0
    y = crs.k0 * A * xi + crs.y0
    return x, y


def tm_inverse(x, y, crs: CRSDef):
    """Transverse mercator easting/northing -> geographic (deg)."""
    ell = crs.ellipsoid
    A, _, beta = _tm_const_cached(ell)
    e = np.sqrt(ell.e2)
    xi = (np.asarray(y, dtype=np.float64) - crs.y0) / (crs.k0 * A)
    eta = (np.asarray(x, dtype=np.float64) - crs.x0) / (crs.k0 * A)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j in range(6):
        xi_p -= beta[j] * np.sin(2 * (j + 1) * xi) * np.cosh(2 * (j + 1) * eta)
        eta_p -= beta[j] * np.cos(2 * (j + 1) * xi) * np.sinh(2 * (j + 1) * eta)
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))  # conformal latitude
    # invert conformal latitude via Newton on tau = tan(phi) (Karney 2011 §3)
    tau_p = np.tan(chi)
    tau = tau_p.copy()
    e2 = ell.e2
    for _ in range(6):
        s = tau / np.hypot(1.0, tau)
        sig = np.sinh(e * np.arctanh(e * s))
        tau_i = tau * np.hypot(1.0, sig) - sig * np.hypot(1.0, tau)
        f = tau_i - tau_p
        d = (np.hypot(1.0, sig) * np.hypot(1.0, tau) - sig * tau) * (1.0 - e2) * np.hypot(
            1.0, tau
        ) / (1.0 + (1.0 - e2) * tau**2)
        tau = tau - f / d
    phi = np.arctan(tau)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return np.degrees(phi), np.degrees(lam) + crs.lon0


# ---------------------------------------------------------------------------
# Albers equal-area conic (Snyder 1987, §14) on the ellipsoid
# ---------------------------------------------------------------------------


def _authalic_q(ell: Ellipsoid, phi):
    e = np.sqrt(ell.e2)
    s = np.sin(phi)
    return (1 - ell.e2) * (
        s / (1 - ell.e2 * s**2) - (1.0 / (2 * e)) * np.log((1 - e * s) / (1 + e * s))
    )


def _albers_constants(crs: CRSDef):
    ell = crs.ellipsoid
    e2 = ell.e2
    phi1 = np.radians(crs.lat1)
    phi2 = np.radians(crs.lat2)
    phi0 = np.radians(crs.lat0)
    m1 = np.cos(phi1) / np.sqrt(1 - e2 * np.sin(phi1) ** 2)
    m2 = np.cos(phi2) / np.sqrt(1 - e2 * np.sin(phi2) ** 2)
    q0 = _authalic_q(ell, phi0)
    q1 = _authalic_q(ell, phi1)
    q2 = _authalic_q(ell, phi2)
    n = (m1**2 - m2**2) / (q2 - q1)
    C = m1**2 + n * q1
    rho0 = ell.a * np.sqrt(C - n * q0) / n
    return n, C, rho0


_ALBERS_CACHE: dict[int, tuple] = {}


def _albers_const_cached(crs: CRSDef):
    if crs.epsg not in _ALBERS_CACHE:
        _ALBERS_CACHE[crs.epsg] = _albers_constants(crs)
    return _ALBERS_CACHE[crs.epsg]


def albers_forward(lat, lon, crs: CRSDef):
    ell = crs.ellipsoid
    n, C, rho0 = _albers_const_cached(crs)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64) - crs.lon0)
    q = _authalic_q(ell, phi)
    rho = ell.a * np.sqrt(C - n * q) / n
    theta = n * lam
    x = rho * np.sin(theta) + crs.x0
    y = rho0 - rho * np.cos(theta) + crs.y0
    return x, y


def albers_inverse(x, y, crs: CRSDef):
    ell = crs.ellipsoid
    e2 = ell.e2
    e = np.sqrt(e2)
    n, C, rho0 = _albers_const_cached(crs)
    xs = np.asarray(x, dtype=np.float64) - crs.x0
    ys = rho0 - (np.asarray(y, dtype=np.float64) - crs.y0)
    rho = np.hypot(xs, ys)
    theta = np.arctan2(xs, ys)
    q = (C - (rho * n / ell.a) ** 2) / n
    # iterate Snyder 3-16 for phi
    phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
    for _ in range(8):
        s = np.sin(phi)
        den = 1 - e2 * s**2
        phi = phi + (den**2 / (2 * np.cos(phi))) * (
            q / (1 - e2)
            - s / den
            + (1.0 / (2 * e)) * np.log((1 - e * s) / (1 + e * s))
        )
    lam = theta / n
    return np.degrees(phi), np.degrees(lam) + crs.lon0


# ---------------------------------------------------------------------------
# Generic transform (cached "transformer" = pair of kernel closures)
# ---------------------------------------------------------------------------


def _to_geographic(crs: CRSDef, x, y):
    """Any CRS -> (lat, lon) on its own datum (datum shifts ignored:
    WGS84 and NAD83/GRS80 differ by <2 m, inside every golden tolerance)."""
    if crs.kind == "geographic":
        return np.asarray(y, dtype=np.float64), np.asarray(x, dtype=np.float64)
    if crs.kind == "webmercator":
        return webmercator_to_wgs84(x, y)
    if crs.kind == "tm":
        return tm_inverse(x, y, crs)
    if crs.kind == "albers":
        return albers_inverse(x, y, crs)
    raise TransformError(f"unsupported CRS kind: {crs.kind}")


def _from_geographic(crs: CRSDef, lat, lon):
    """(lat, lon) -> CRS coords, returned as (x, y)."""
    if crs.kind == "geographic":
        return np.asarray(lon, dtype=np.float64), np.asarray(lat, dtype=np.float64)
    if crs.kind == "webmercator":
        return wgs84_to_webmercator(lat, lon)
    if crs.kind == "tm":
        return tm_forward(lat, lon, crs)
    if crs.kind == "albers":
        return albers_forward(lat, lon, crs)
    raise TransformError(f"unsupported CRS kind: {crs.kind}")


def transform(x, y, src, dst):
    """Vectorized coordinate transform src->dst; (x, y) always_xy order
    (lon/lat for geographic CRSs), mirroring Transformer.from_crs(...,
    always_xy=True) at geometry.py:231.  Identity when src == dst
    (geometry.py:226-227 returns the same object)."""
    s = ensure_crs(src)
    d = ensure_crs(dst)
    if s.equals(d):
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    lat, lon = _to_geographic(s, x, y)
    return _from_geographic(d, lat, lon)
