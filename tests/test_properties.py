"""Property-based tests (hypothesis) for the from-scratch kernels —
SURVEY.md §5 determinism/conformance strategy."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geografir_ray.functions import cells, crs, geom, synthgeo

lat_st = st.floats(min_value=-89.9, max_value=89.9, allow_nan=False)
lon_st = st.floats(min_value=-179.9, max_value=179.9, allow_nan=False)


@given(lat=lat_st, lon=lon_st, prec=st.integers(min_value=1, max_value=12))
@settings(max_examples=200, deadline=None)
def test_geohash_center_reencodes_to_same_cell(lat, lon, prec):
    code = cells.geohash_int(np.array([lat]), np.array([lon]), prec)
    clat, clon = cells.geohash_int_to_latlon(code, prec)
    code2 = cells.geohash_int(clat, clon, prec)
    assert code[0] == code2[0]


@given(lat=lat_st, lon=lon_st, level=st.integers(min_value=1, max_value=30))
@settings(max_examples=200, deadline=None)
def test_s2_parent_is_prefix(lat, lon, level):
    full = cells.s2_cell_id(np.array([lat]), np.array([lon]), 30)
    parent = cells.s2_parent(full, level)
    direct = cells.s2_cell_id(np.array([lat]), np.array([lon]), level)
    assert parent[0] == direct[0]
    assert cells.s2_level(parent)[0] == level


@given(lat=st.floats(min_value=-80, max_value=80, allow_nan=False),
       lon=st.floats(min_value=-170, max_value=170, allow_nan=False))
@settings(max_examples=100, deadline=None)
def test_webmercator_roundtrip(lat, lon):
    x, y = crs.wgs84_to_webmercator(np.array([lat]), np.array([lon]))
    la, lo = crs.webmercator_to_wgs84(x, y)
    assert abs(la[0] - lat) < 1e-9
    assert abs(lo[0] - lon) < 1e-9


@given(lon=st.floats(min_value=-119.9, max_value=-114.1, allow_nan=False),
       lat=st.floats(min_value=5, max_value=75, allow_nan=False))
@settings(max_examples=100, deadline=None)
def test_utm_zone11_roundtrip(lon, lat):
    c = crs.ensure_crs(32611)
    x, y = crs.tm_forward(np.array([lat]), np.array([lon]), c)
    la, lo = crs.tm_inverse(x, y, c)
    assert abs(la[0] - lat) < 1e-8
    assert abs(lo[0] - lon) < 1e-8


@given(seed=st.integers(min_value=0, max_value=2**31), n=st.integers(5, 40))
@settings(max_examples=50, deadline=None)
def test_pip_parity_with_scalar(seed, n):
    rng = np.random.default_rng(seed)
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    rad = rng.uniform(0.3, 2.0, n)
    ring = np.stack([rad * np.cos(ang), rad * np.sin(ang)], axis=1)
    px = rng.uniform(-2.2, 2.2, 100)
    py = rng.uniform(-2.2, 2.2, 100)
    got = geom.points_in_polygon(px, py, ring)

    def scalar(x, y):
        inside = False
        j = n - 1
        for i in range(n):
            xi, yi = ring[i]
            xj, yj = ring[j]
            if (yi <= y) != (yj <= y):
                if x < xi + (y - yi) / (yj - yi) * (xj - xi):
                    inside = not inside
            j = i
        return inside

    want = np.array([scalar(x, y) for x, y in zip(px, py)])
    np.testing.assert_array_equal(got, want)


@given(k=st.integers(min_value=0, max_value=10**12))
@settings(max_examples=200, deadline=None)
def test_synthgeo_in_range_for_any_key(k):
    lat = synthgeo.synth_lat(np.array([k]))[0]
    lon = synthgeo.synth_lon(np.array([k]))[0]
    assert -60.0 <= lat < 72.0
    assert -180.0 <= lon < 180.0


@given(lat=st.floats(-60, 71.9, allow_nan=False),
       lon=st.floats(-179.9, 179.9, allow_nan=False),
       res=st.integers(0, 12))
@settings(max_examples=150, deadline=None)
def test_hex_center_roundtrip_property(lat, lon, res):
    cell = cells.hex_cell(np.array([lat]), np.array([lon]), res)
    clat, clon = cells.hex_center(cell)
    assert cells.hex_cell(clat, clon, res)[0] == cell[0]


@given(seed=st.integers(min_value=0, max_value=2**31), n=st.integers(1, 400))
@settings(max_examples=60, deadline=None)
def test_group_by_nullsafe_matches_pandas(seed, n):
    """group_by_nullsafe == pandas groupby(dropna=False) on random
    multi-key tables with null string AND null int keys — the pyarrow
    16.1 grouper duplicates null-key groups (CLAUDE.md rule 24); the
    nullsafe wrapper must not."""
    import pandas as pd
    import pyarrow as pa

    from geografir_ray.pipelines.common import group_by_nullsafe

    rng = np.random.RandomState(seed)
    ks = pd.Series(rng.randint(0, 8, n)).astype(str)
    ks[rng.rand(n) < 0.2] = None
    ki = pd.Series(rng.randint(0, 5, n).astype(np.float64))
    ki[rng.rand(n) < 0.2] = None  # nullable numeric key
    v = rng.randint(-100, 100, n).astype(np.int64)
    t = pa.table({"ks": pa.array(ks), "ki": pa.array(ki), "v": pa.array(v)})

    g = group_by_nullsafe(t, ["ks", "ki"], [("v", "sum")]).to_pandas()
    want = (
        pd.DataFrame({"ks": ks, "ki": ki, "v": v})
        .groupby(["ks", "ki"], dropna=False)["v"]
        .sum()
        .reset_index(name="v_sum")
    )
    key = lambda df: df.assign(
        ks=df["ks"].fillna("∅"), ki=df["ki"].fillna(-999.0)
    ).sort_values(["ks", "ki"]).reset_index(drop=True)
    g, want = key(g), key(want)
    assert len(g) == len(want)
    assert (g["ks"] == want["ks"]).all()
    assert np.allclose(g["ki"], want["ki"])
    assert (g["v_sum"].to_numpy() == want["v_sum"].to_numpy()).all()


def test_block_topk_with_ties_partial_safety():
    """Property: splitting the (nation, part, rev) table into ANY blocks
    and filtering each with _block_topk_with_ties never drops a row
    whose global RANK() <= k — including heavy tie plateaus at the
    boundary — and the union still yields the exact RANK<=k set."""
    import numpy as np
    import pyarrow as pa

    from geografir_ray.pipelines.relational import _block_topk_with_ties

    rng = np.random.default_rng(7)
    for trial in range(30):
        n = int(rng.integers(1, 200))
        nk = rng.integers(0, 5, n).astype(np.int64)
        # tiny value range forces massive ties, incl. at the k-boundary
        rv = rng.integers(0, 4, n).astype(np.int64)
        pk = np.arange(n, dtype=np.int64)
        t = pa.table({"n_nationkey": nk, "p_partkey": pk, "rev_c": rv})
        k = int(rng.integers(1, 4))

        # brute-force global RANK() <= k membership
        want = set()
        for key in np.unique(nk):
            m = nk == key
            r = rv[m]
            rnk = (r[:, None] < r[None, :]).sum(axis=1) + 1  # strictly greater
            for pid in pk[m][rnk <= k]:
                want.add(int(pid))

        # random block split (incl. single-row blocks)
        n_blocks = int(rng.integers(1, max(2, n)))
        assign = rng.integers(0, n_blocks, n)
        survived = set()
        for b in range(n_blocks):
            blk = t.filter(pa.array(assign == b))
            kept = _block_topk_with_ties(blk, k)
            survived.update(kept["p_partkey"].to_pylist())
        assert want <= survived, f"trial {trial}: partial filter dropped winners"

        # driver finish over survivors reproduces the exact set
        sub = t.filter(pa.array([int(p) in survived for p in pk]))
        snk = sub["n_nationkey"].to_numpy()
        srv = sub["rev_c"].to_numpy()
        spk = sub["p_partkey"].to_numpy()
        got = set()
        for key in np.unique(snk):
            m = snk == key
            r = srv[m]
            full = rv[nk == key]
            # rank vs the FULL group (all survivors of that group present
            # above the threshold, so ranks <= k are preserved)
            rnk = (full[None, :] > r[:, None]).sum(axis=1) + 1
            for pid in spk[m][rnk.ravel() <= k]:
                got.add(int(pid))
        assert got == want, f"trial {trial}: finish set mismatch"


def test_convex_hull_strict_chain_vs_brute_and_partial_merge():
    """_hull_indices (strict monotone chain) matches the O(n^3) brute
    hull-vertex characterization (the SQL twin's EXISTS/NOT-EXISTS
    form) on random clouds with forced collinear runs and duplicates;
    the batch-partial (quad discard + chain) -> merge -> final chain
    pipeline is split-invariant."""
    import numpy as np

    from geografir_ray.pipelines.spatial import _hull_indices, _quad_survivors

    def brute_vertices(x, y):
        pts = list({(int(a), int(b)) for a, b in zip(x, y)})
        if len(pts) == 1:
            return set(pts)
        out = set()
        for p in pts:
            for q in pts:
                if q == p:
                    continue
                ok = True
                for r in pts:
                    if r == p or r == q:
                        continue
                    cr = (q[0] - p[0]) * (r[1] - p[1]) - (q[1] - p[1]) * (r[0] - p[0])
                    dt = (q[0] - p[0]) * (r[0] - p[0]) + (q[1] - p[1]) * (r[1] - p[1])
                    if cr < 0 or (cr == 0 and dt <= 0):
                        ok = False
                        break
                if ok:
                    out.add(p)
                    break
        return out

    rng = np.random.default_rng(11)
    for trial in range(25):
        n = int(rng.integers(1, 60))
        x = rng.integers(-50, 50, n).astype(np.int64)
        y = rng.integers(-50, 50, n).astype(np.int64)
        if trial % 3 == 0 and n >= 6:
            # forced collinear run on the far east edge (+ a duplicate)
            x[:4] = 60
            y[:4] = np.array([-30, -10, 10, 30])
            x[4], y[4] = x[0], y[0]
        if trial % 5 == 0:
            y[:] = 7  # fully degenerate: all collinear
        want = brute_vertices(x, y)

        # distinct points, full chain
        pk = {(int(a), int(b)) for a, b in zip(x, y)}
        ux = np.array([p[0] for p in sorted(pk)], dtype=np.int64)
        uy = np.array([p[1] for p in sorted(pk)], dtype=np.int64)
        hidx = _hull_indices(ux, uy)
        got = {(int(ux[i]), int(uy[i])) for i in hidx}
        assert got == want, f"trial {trial}: chain != brute"

        # partial -> merge -> final is split-invariant
        n_blocks = int(rng.integers(1, max(2, n)))
        assign = rng.integers(0, n_blocks, n)
        merged_x, merged_y = [], []
        for b in range(n_blocks):
            bx, by = x[assign == b], y[assign == b]
            if len(bx) == 0:
                continue
            bpk = sorted({(int(a), int(c)) for a, c in zip(bx, by)})
            bx = np.array([p[0] for p in bpk], dtype=np.int64)
            by = np.array([p[1] for p in bpk], dtype=np.int64)
            shell = _quad_survivors(bx, by)
            sx, sy = bx[shell], by[shell]
            hb = _hull_indices(sx, sy)
            merged_x.extend(sx[hb].tolist())
            merged_y.extend(sy[hb].tolist())
        mpk = sorted(set(zip(merged_x, merged_y)))
        mx = np.array([p[0] for p in mpk], dtype=np.int64)
        my = np.array([p[1] for p in mpk], dtype=np.int64)
        fidx = _hull_indices(mx, my)
        got2 = {(int(mx[i]), int(my[i])) for i in fidx}
        assert got2 == want, f"trial {trial}: partial-merge != brute"
