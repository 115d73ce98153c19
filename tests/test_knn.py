

def test_knn_partitioned_hot_cell_skew(ray_session):
    """Everything in ONE grid cell (worst-case skew: a single bucket
    holds the entire dataset).  The count-class kernel must chunk the
    pair matrices rather than materialize an n_q x n_t block, and the
    result must still be exact vs brute force."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geografir_ray.functions.geom import haversine_km
    from geografir_ray.stages.knn import knn_partitioned

    rng = np.random.default_rng(41)
    nq, nt, k = 300, 2000, 3
    # all points inside one bits=6 cell (~2.8 deg): a 0.5-deg patch
    qlat = 10.0 + rng.uniform(0, 0.5, nq)
    qlon = 20.0 + rng.uniform(0, 0.5, nq)
    tlat = 10.0 + rng.uniform(0, 0.5, nt)
    tlon = 20.0 + rng.uniform(0, 0.5, nt)
    q = rd.from_arrow(
        pa.table({"query_id": pa.array(np.arange(nq)), "lat": pa.array(qlat), "lon": pa.array(qlon)})
    )
    t = rd.from_arrow(
        pa.table({"target_id": pa.array(np.arange(nt)), "lat": pa.array(tlat), "lon": pa.array(tlon)})
    )
    got = knn_partitioned(q, t, k=k, bits=6, radius=1).to_pandas()
    assert len(got) == nq * k
    # brute-force reference with (dist, id) tie-break
    for qi in rng.choice(nq, 25, replace=False):
        d = haversine_km(qlat[qi], qlon[qi], tlat, tlon)
        order = np.lexsort((np.arange(nt), d))[:k]
        mine = got[got["query_id"] == qi].sort_values("rank")["neighbor_id"].values
        assert list(mine) == list(order), qi


def test_knn_partitioned_poles_and_antimeridian(ray_session):
    """Queries clustered at the poles and straddling the +-180 meridian:
    exercises ring wrap-around (lon modulo), pole clipping (dedup of
    clipped replicas), and the position-aware edge bound where the
    meridian distance formula matters most. Exact vs brute force."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geografir_ray.functions.geom import haversine_km
    from geografir_ray.stages.knn import knn_partitioned

    rng = np.random.default_rng(97)
    lat_groups = [
        rng.uniform(86, 89.9, 80),      # near north pole
        rng.uniform(-89.9, -86, 80),    # near south pole
        rng.uniform(-30, 30, 80),       # antimeridian band
    ]
    lon_groups = [
        rng.uniform(-180, 180, 80),
        rng.uniform(-180, 180, 80),
        np.where(rng.random(80) < 0.5, rng.uniform(-180, -176, 80), rng.uniform(176, 180, 80)),
    ]
    tlat = np.concatenate(lat_groups)
    tlon = np.concatenate(lon_groups)
    qlat = tlat[::3] + 0.05
    qlon = tlon[::3] - 0.05
    nq, nt, k = len(qlat), len(tlat), 4

    q = rd.from_arrow(
        pa.table({"query_id": pa.array(np.arange(nq)), "lat": pa.array(qlat), "lon": pa.array(qlon)})
    )
    t = rd.from_arrow(
        pa.table({"target_id": pa.array(np.arange(nt)), "lat": pa.array(tlat), "lon": pa.array(tlon)})
    )
    got = knn_partitioned(q, t, k=k, bits=6, radius=1).to_pandas()
    assert len(got) == nq * k
    for qi in range(nq):
        d = haversine_km(qlat[qi], qlon[qi], tlat, tlon)
        order = np.lexsort((np.arange(nt), d))[:k]
        mine = got[got["query_id"] == qi].sort_values("rank")["neighbor_id"].values
        assert list(mine) == list(order), qi
