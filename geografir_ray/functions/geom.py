"""Vectorized geometry kernels: bbox, haversine, point-in-polygon,
STR-tree, polygon→cell covering.

Replaces the reference's shapely object graph (geometry.py:95-245,
bounding_box.py:60-179 in /root/reference/geometry/src/geometry/) with
batch-columnar math: polygons are (vertex_xy, ring_offsets) arrays, one
batch of polygons per call, so every operator is a pure numpy kernel
usable inside ``map_batches``.
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_KM = 6371.0


# ---------------------------------------------------------------------------
# Bounding boxes (BoundingBox.from_geometry semantics,
# /root/reference/geometry/src/geometry/bounding_box.py:138-169: plain
# coord min/max, no validation that min <= max — preserved)
# ---------------------------------------------------------------------------


def bbox_of_rings(vertex_xy: np.ndarray, ring_offsets: np.ndarray) -> np.ndarray:
    """Per-polygon (minx, miny, maxx, maxy) from packed vertices.

    vertex_xy: (total_vertices, 2) float64; ring_offsets: (n_polys+1,)
    int — polygon p owns vertices [ring_offsets[p], ring_offsets[p+1]).
    """
    n = len(ring_offsets) - 1
    out = np.empty((n, 4), dtype=np.float64)
    mins = np.minimum.reduceat(vertex_xy, ring_offsets[:-1], axis=0)
    maxs = np.maximum.reduceat(vertex_xy, ring_offsets[:-1], axis=0)
    out[:, 0] = mins[:, 0]
    out[:, 1] = mins[:, 1]
    out[:, 2] = maxs[:, 0]
    out[:, 3] = maxs[:, 1]
    return out


# ---------------------------------------------------------------------------
# Haversine distance
# ---------------------------------------------------------------------------


def haversine_km(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Great-circle distance in km (all args broadcastable, degrees)."""
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dphi = p2 - p1
    dlmb = np.radians(lon2) - np.radians(lon1)
    a = np.sin(dphi / 2.0) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dlmb / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(a))


def unit_xyz(lat, lon) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Unit-sphere Cartesian coordinates (degrees in).

    Distance ranking trick: the squared CHORD length between two unit
    vectors, |p1-p2|^2 = 4 sin^2(d/2), is strictly monotonic in the
    great-circle distance d — so top-k selection can run on chord^2
    (8 cheap flops per pair, no transcendentals) and only the selected
    rows pay the asin to convert to km.  chord^2/4 equals haversine's
    ``a`` term exactly, so :func:`chord2_to_km` reproduces
    :func:`haversine_km` to fp rounding.
    """
    p = np.radians(np.asarray(lat, dtype=np.float64))
    l = np.radians(np.asarray(lon, dtype=np.float64))
    cp = np.cos(p)
    return cp * np.cos(l), cp * np.sin(l), np.sin(p)


def chord2_to_km(c2) -> np.ndarray:
    """Squared unit-sphere chord -> great-circle km (haversine-equal)."""
    return 2.0 * EARTH_RADIUS_KM * np.arcsin(
        np.minimum(np.sqrt(np.maximum(c2, 0.0)) * 0.5, 1.0)
    )


def haversine_km_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """DuckDB expression matching :func:`haversine_km` op-for-op.

    Used only for ORDER BY in kNN oracles — tiny libm ulp differences
    cannot flip an ordering of well-separated synthetic points.
    """
    p1 = f"radians({lat1})"
    p2 = f"radians({lat2})"
    return (
        f"(2.0 * {EARTH_RADIUS_KM} * asin(sqrt("
        f"pow(sin(({p2} - {p1}) / 2.0), 2) + "
        f"cos({p1}) * cos({p2}) * "
        f"pow(sin((radians({lon2}) - radians({lon1})) / 2.0), 2))))"
    )


# ---------------------------------------------------------------------------
# Point-in-polygon (ray casting)
#
# Edge rule (documented, SURVEY.md §7.1(5)): half-open crossing test —
# a horizontal ray to +x counts edges with (y1 <= py < y2) or
# (y2 <= py < y1); points exactly on a boundary may land either way
# (synthetic data never places points exactly on edges).
# ---------------------------------------------------------------------------


def points_in_polygon(
    px: np.ndarray, py: np.ndarray, ring_xy: np.ndarray
) -> np.ndarray:
    """Vectorized: which of n points fall inside ONE polygon ring.

    px, py: (n,); ring_xy: (m, 2) closed or open ring (auto-closed).
    Returns bool (n,).
    """
    x1 = ring_xy[:, 0]
    y1 = ring_xy[:, 1]
    x2 = np.roll(x1, -1)
    y2 = np.roll(y1, -1)
    px = px[:, None]
    py = py[:, None]
    crosses = (y1[None, :] <= py) != (y2[None, :] <= py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1[None, :] + (py - y1[None, :]) / (y2[None, :] - y1[None, :]) * (
            x2[None, :] - x1[None, :]
        )
    hits = crosses & (px < xint)
    return (hits.sum(axis=1) % 2).astype(bool)


def points_in_polygons_pairs(
    px: np.ndarray,
    py: np.ndarray,
    poly_idx: np.ndarray,
    vertex_xy: np.ndarray,
    ring_offsets: np.ndarray,
) -> np.ndarray:
    """Candidate-pair PIP: for pairs (point k, polygon poly_idx[k]),
    return bool per pair.  Vectorized over pairs grouped by polygon."""
    out = np.zeros(len(px), dtype=bool)
    order = np.argsort(poly_idx, kind="stable")
    sorted_poly = poly_idx[order]
    bounds = np.flatnonzero(np.diff(sorted_poly)) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [len(sorted_poly)]))
    for s, e in zip(starts, ends):
        if s == e:
            continue
        p = int(sorted_poly[s])
        ring = vertex_xy[ring_offsets[p] : ring_offsets[p + 1]]
        sel = order[s:e]
        out[sel] = points_in_polygon(px[sel], py[sel], ring)
    return out


# ---------------------------------------------------------------------------
# STR-tree (sort-tile-recursive bulk-loaded R-tree over bboxes)
# ---------------------------------------------------------------------------


class STRtree:
    """Static R-tree bulk-loaded with the sort-tile-recursive algorithm
    (Leutenegger et al., 1997 — public).  Query = bbox intersection →
    candidate item indices.  Built once per actor (stateful stage,
    SURVEY.md §7.2); probe is numpy-vectorized per level.
    """

    def __init__(self, boxes: np.ndarray, node_capacity: int = 16):
        """boxes: (n, 4) [minx, miny, maxx, maxy]."""
        self.boxes = np.asarray(boxes, dtype=np.float64)
        n = len(self.boxes)
        self.node_capacity = node_capacity
        if n == 0:
            self.levels = []
            return
        cx = (self.boxes[:, 0] + self.boxes[:, 2]) * 0.5
        cy = (self.boxes[:, 1] + self.boxes[:, 3]) * 0.5
        # STR: sort by x, slice into vertical strips, sort each by y
        nleaf = int(np.ceil(n / node_capacity))
        nslice = int(np.ceil(np.sqrt(nleaf)))
        per_slice = nslice * node_capacity
        order = np.argsort(cx, kind="stable")
        for s in range(0, n, per_slice):
            chunk = order[s : s + per_slice]
            chunk_sorted = chunk[np.argsort(cy[chunk], kind="stable")]
            order[s : s + per_slice] = chunk_sorted
        self.item_order = order  # leaf-contiguous item permutation

        # build level bboxes bottom-up
        self.levels = []  # each: (boxes (m,4), child_start offsets)
        cur = self.boxes[order]
        while len(cur) > 1:
            m = int(np.ceil(len(cur) / node_capacity))
            pad = m * node_capacity - len(cur)
            if pad:
                filler = np.tile(cur[-1], (pad, 1))
                padded = np.vstack([cur, filler])
            else:
                padded = cur
            grp = padded.reshape(m, node_capacity, 4)
            merged = np.empty((m, 4), dtype=np.float64)
            merged[:, 0] = grp[:, :, 0].min(axis=1)
            merged[:, 1] = grp[:, :, 1].min(axis=1)
            merged[:, 2] = grp[:, :, 2].max(axis=1)
            merged[:, 3] = grp[:, :, 3].max(axis=1)
            self.levels.append(cur)
            cur = merged
        self.levels.append(cur)
        self.levels.reverse()  # [root ... leaves]

    def query_box(self, minx: float, miny: float, maxx: float, maxy: float) -> np.ndarray:
        """Item indices whose boxes intersect the query box."""
        if not self.levels:
            return np.empty(0, dtype=np.int64)
        cand = np.array([0], dtype=np.int64)  # node idx in current level
        cap = self.node_capacity
        for li in range(len(self.levels) - 1):
            child_level = self.levels[li + 1]
            starts = cand * cap
            idx = (starts[:, None] + np.arange(cap)[None, :]).ravel()
            idx = idx[idx < len(child_level)]
            b = child_level[idx]
            hit = (b[:, 0] <= maxx) & (b[:, 2] >= minx) & (b[:, 1] <= maxy) & (b[:, 3] >= miny)
            cand = idx[hit]
            if len(cand) == 0:
                return np.empty(0, dtype=np.int64)
        return self.item_order[cand]

    def query_points(self, px: np.ndarray, py: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(point_idx, item_idx) candidate pairs for many points.

        Vectorized level-descent for all points at once.
        """
        npts = len(px)
        if not self.levels or npts == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        cap = self.node_capacity
        pt = np.arange(npts, dtype=np.int64)
        node = np.zeros(npts, dtype=np.int64)
        for li in range(len(self.levels) - 1):
            child_level = self.levels[li + 1]
            idx = (node[:, None] * cap + np.arange(cap)[None, :]).ravel()
            ptr = np.repeat(pt, cap)
            keep = idx < len(child_level)
            idx = idx[keep]
            ptr = ptr[keep]
            b = child_level[idx]
            x = px[ptr]
            y = py[ptr]
            hit = (b[:, 0] <= x) & (b[:, 2] >= x) & (b[:, 1] <= y) & (b[:, 3] >= y)
            pt = ptr[hit]
            node = idx[hit]
            if len(pt) == 0:
                return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        return pt, self.item_order[node]


# ---------------------------------------------------------------------------
# Polygon → covering grid cells (explode step before the PIP shuffle)
# ---------------------------------------------------------------------------


def cover_bboxes_with_grid(
    boxes: np.ndarray, bits: int, max_cells_per_poly: int = 4096
) -> tuple[np.ndarray, np.ndarray]:
    """Explode polygon bboxes to covering grid cells.

    Returns (poly_index, cell_id) pair arrays.  Conservative cover
    (bbox-based): downstream PIP verifies exactly.  ``bits`` chooses
    the co-partition granularity (SURVEY.md §7.3: cell id is the PIP
    shuffle key).
    """
    n = 1 << bits
    polys = []
    cellids = []
    for p in range(len(boxes)):
        minx, miny, maxx, maxy = boxes[p]
        r0 = max(0, min(n - 1, int(np.floor((miny + 90.0) / 180.0 * n))))
        r1 = max(0, min(n - 1, int(np.floor((maxy + 90.0) / 180.0 * n))))
        c0 = max(0, min(n - 1, int(np.floor((minx + 180.0) / 360.0 * n))))
        c1 = max(0, min(n - 1, int(np.floor((maxx + 180.0) / 360.0 * n))))
        ncell = (r1 - r0 + 1) * (c1 - c0 + 1)
        if ncell > max_cells_per_poly:
            raise ValueError(
                f"polygon {p} covers {ncell} cells at bits={bits}; "
                "lower the cover resolution"
            )
        rows = np.arange(r0, r1 + 1, dtype=np.uint64)
        cols = np.arange(c0, c1 + 1, dtype=np.uint64)
        rr, cc = np.meshgrid(rows, cols, indexing="ij")
        cellids.append((rr.ravel() << np.uint64(32)) | cc.ravel())
        polys.append(np.full(ncell, p, dtype=np.int64))
    if not polys:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64)
    return np.concatenate(polys), np.concatenate(cellids)


# ---------------------------------------------------------------------------
# Grid-bucket zone index (fast vectorized point→candidate-zone lookup)
# ---------------------------------------------------------------------------


class GridZoneIndex:
    """Broadcastable point-in-polygon index over a zone set.

    Build: explode zone bboxes to covering grid cells (bits-resolution),
    sort by cell.  Query: cell per point → searchsorted run lookup →
    variable-length candidate expansion (all numpy, no per-point loop,
    no O(points × nodes) intermediates — the STR-tree descent
    materializes (npts × fanout) index arrays per level, which is the
    wrong trade for millions of points against a broadcast zone set).
    """

    def __init__(self, vertex_xy: np.ndarray, ring_offsets: np.ndarray, bits: int = 6):
        self.vertex_xy = vertex_xy
        self.ring_offsets = np.asarray(ring_offsets, dtype=np.int64)
        self.bits = bits
        self.boxes = bbox_of_rings(vertex_xy, self.ring_offsets)
        poly_idx, cell_ids = cover_bboxes_with_grid(self.boxes, bits)
        order = np.argsort(cell_ids, kind="stable")
        self._cells = cell_ids[order]
        self._polys = poly_idx[order]
        self._ucells, ustart = np.unique(self._cells, return_index=True)
        self._ustart = np.concatenate([ustart, [len(self._cells)]])

    def query_points(self, px: np.ndarray, py: np.ndarray):
        """(point_idx, poly_idx) candidate pairs (bbox-filtered)."""
        from .cells import grid_cell

        pcell = grid_cell(py, px, self.bits)
        loc = np.searchsorted(self._ucells, pcell)
        loc_c = np.clip(loc, 0, max(len(self._ucells) - 1, 0))
        valid = (
            (self._ucells[loc_c] == pcell)
            if len(self._ucells)
            else np.zeros(len(px), dtype=bool)
        )
        vpt = np.flatnonzero(valid)
        starts = self._ustart[loc_c[vpt]]
        ends = self._ustart[loc_c[vpt] + 1]
        counts = ends - starts
        pt_idx = np.repeat(vpt, counts)
        # gather candidate runs: ranges [starts, ends) concatenated
        total = int(counts.sum())
        if total == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        run_pos = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        cand = self._polys[np.repeat(starts, counts) + run_pos]
        # bbox filter
        b = self.boxes[cand]
        x = px[pt_idx]
        y = py[pt_idx]
        hit = (b[:, 0] <= x) & (b[:, 2] >= x) & (b[:, 1] <= y) & (b[:, 3] >= y)
        return pt_idx[hit], cand[hit]

    def contains_pairs(self, px: np.ndarray, py: np.ndarray):
        """Exact (point_idx, poly_idx) containment pairs."""
        pi, zi = self.query_points(px, py)
        if len(pi):
            ok = points_in_polygons_pairs(
                px[pi], py[pi], zi, self.vertex_xy, self.ring_offsets
            )
            pi, zi = pi[ok], zi[ok]
        return pi, zi


def points_in_polygon_with_holes(
    px: np.ndarray,
    py: np.ndarray,
    vertex_xy: np.ndarray,
    ring_offsets: np.ndarray,
) -> np.ndarray:
    """Even-odd PIP over a polygon made of MULTIPLE rings (shell +
    holes, or a multipolygon): crossings are counted across all rings,
    so a point inside the shell but inside a hole has an even total.

    vertex_xy: (total, 2); ring_offsets: (n_rings+1,) — all rings
    belong to the ONE polygon being tested.
    """
    total = np.zeros(len(px), dtype=np.int64)
    for r in range(len(ring_offsets) - 1):
        ring = vertex_xy[ring_offsets[r] : ring_offsets[r + 1]]
        x1 = ring[:, 0]
        y1 = ring[:, 1]
        x2 = np.roll(x1, -1)
        y2 = np.roll(y1, -1)
        crosses = (y1[None, :] <= py[:, None]) != (y2[None, :] <= py[:, None])
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x1[None, :] + (py[:, None] - y1[None, :]) / (
                y2[None, :] - y1[None, :]
            ) * (x2[None, :] - x1[None, :])
        total += (crosses & (px[:, None] < xint)).sum(axis=1)
    return (total % 2).astype(bool)
