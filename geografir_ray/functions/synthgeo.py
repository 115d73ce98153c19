"""Deterministic, SQL-mirrorable synthetic geometry derived from integer keys.

The driver's testdata (TPC-H-ish tables, TESTDATA.md) has no spatial
columns, and the DuckDB oracle can only see those registered views.  So
every spatial query derives (lat, lon) from an integer key column with
formulas that numpy and DuckDB evaluate bit-identically (int64 modular
arithmetic + IEEE-754 double ops in the same association order).  Each
numpy kernel here has a twin ``*_sql`` generator emitting the exact
same expression as ANSI SQL, so the driver's value-hash comparison
(CORRECTNESS_r{N}.json) is exact, not approximate.

Distribution design mirrors FIXTURES.md §1-2: ~70% of points cluster
around 12 "hot centers" (urban-skew stand-in, exercises salting) and
~30% spread uniformly over lat [-60, 72) / lon [-180, 180).
"""

from __future__ import annotations

import numpy as np

# LCG-style mixing constants (Knuth / Numerical Recipes; public domain values).
_M1, _A1 = 2654435761, 1013904223
_M2, _A2 = 1597334677, 3812015801
_MOD = 4294967296  # 2^32

N_HOT_CENTERS = 12


def _as_i64(key: np.ndarray) -> np.ndarray:
    k = np.asarray(key).astype(np.int64, copy=False)
    if k.size and k.min() < 0:
        raise ValueError("synthgeo keys must be non-negative")
    return k


def synth_lat(key: np.ndarray) -> np.ndarray:
    """lat(key) in [-60, 72); 70% clustered near 12 hot centers."""
    k = _as_i64(key)
    h1 = (k * _M1 + _A1) % _MOD
    u1 = h1 / float(_MOD)
    center = k % N_HOT_CENTERS
    hot = (k % 10) < 7
    clat = -33.0 + 9.0 * center
    return np.where(hot, clat + (u1 - 0.5) * 3.0, -60.0 + u1 * 132.0)


def synth_lon(key: np.ndarray) -> np.ndarray:
    """lon(key) in [-180, 180); same hot/uniform split as synth_lat."""
    k = _as_i64(key)
    h2 = (k * _M2 + _A2) % _MOD
    u2 = h2 / float(_MOD)
    center = k % N_HOT_CENTERS
    hot = (k % 10) < 7
    clon = -150.0 + 27.0 * center
    return np.where(hot, clon + (u2 - 0.5) * 3.0, -180.0 + u2 * 360.0)


def synth_lat_sql(key_expr: str) -> str:
    """DuckDB SQL expression identical (op-for-op) to :func:`synth_lat`."""
    h1 = f"((({key_expr}) * 2654435761 + 1013904223) % 4294967296)"
    u1 = f"({h1} / 4294967296.0)"
    center = f"(({key_expr}) % 12)"
    return (
        f"(CASE WHEN (({key_expr}) % 10) < 7 "
        f"THEN (-33.0 + 9.0 * {center}) + ({u1} - 0.5) * 3.0 "
        f"ELSE -60.0 + {u1} * 132.0 END)"
    )


def synth_lon_sql(key_expr: str) -> str:
    """DuckDB SQL expression identical (op-for-op) to :func:`synth_lon`."""
    h2 = f"((({key_expr}) * 1597334677 + 3812015801) % 4294967296)"
    u2 = f"({h2} / 4294967296.0)"
    center = f"(({key_expr}) % 12)"
    return (
        f"(CASE WHEN (({key_expr}) % 10) < 7 "
        f"THEN (-150.0 + 27.0 * {center}) + ({u2} - 0.5) * 3.0 "
        f"ELSE -180.0 + {u2} * 360.0 END)"
    )


# ---------------------------------------------------------------------------
# Diamond zones (SQL-mirrorable polygon stand-ins)
#
# Each zone z (0..n-1) is a diamond (rotated square / L1 ball):
#   inside  <=>  |lon - cx|/rx + |lat - cy|/ry <= 1
# The Ray engine treats these as genuine 4-vertex polygons and runs the
# full cover→partition→raycast machinery; the oracle uses the closed
# form.  Centers reuse the hot-center grid so zones actually catch the
# skewed point mass.
# ---------------------------------------------------------------------------


def zone_params(zone_key: np.ndarray) -> dict[str, np.ndarray]:
    """Deterministic diamond parameters (cx, cy, rx, ry) per zone key."""
    z = _as_i64(zone_key)
    center = z % N_HOT_CENTERS
    cy = -33.0 + 9.0 * center + (z % 5) * 0.7
    cx = -150.0 + 27.0 * center + (z % 7) * 0.9
    ry = 2.0 + (z % 4) * 1.5
    rx = 3.0 + (z % 3) * 2.0
    return {"cx": cx, "cy": cy, "rx": rx, "ry": ry}


def zone_params_sql(z: str) -> dict[str, str]:
    return {
        "cy": f"(-33.0 + 9.0 * (({z}) % 12) + (({z}) % 5) * 0.7)",
        "cx": f"(-150.0 + 27.0 * (({z}) % 12) + (({z}) % 7) * 0.9)",
        "ry": f"(2.0 + (({z}) % 4) * 1.5)",
        "rx": f"(3.0 + (({z}) % 3) * 2.0)",
    }


def zone_vertices(zone_key: np.ndarray) -> np.ndarray:
    """(n, 4, 2) lon/lat vertex rings (CCW) of the diamond zones."""
    p = zone_params(zone_key)
    cx, cy, rx, ry = p["cx"], p["cy"], p["rx"], p["ry"]
    n = np.asarray(zone_key).shape[0]
    v = np.empty((n, 4, 2), dtype=np.float64)
    v[:, 0, 0], v[:, 0, 1] = cx + rx, cy  # east
    v[:, 1, 0], v[:, 1, 1] = cx, cy + ry  # north
    v[:, 2, 0], v[:, 2, 1] = cx - rx, cy  # west
    v[:, 3, 0], v[:, 3, 1] = cx, cy - ry  # south
    return v


def point_in_diamond(
    lon: np.ndarray, lat: np.ndarray, cx: float, cy: float, rx: float, ry: float
) -> np.ndarray:
    return np.abs(lon - cx) / rx + np.abs(lat - cy) / ry <= 1.0
