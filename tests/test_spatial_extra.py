"""Tests for grid-density hotspot clustering (geo_hotspot_clusters)."""

import numpy as np



def _hotspot_reference(min_pts=20):
    """Pure-python grid-density clustering over sf0.001 events."""
    import pyarrow.parquet as pq

    from geografir_ray.functions import synthgeo

    eid = pq.read_table(
        "/root/testdata/sf0.001/events.parquet", columns=["event_id"]
    )["event_id"].to_numpy().astype(np.int64)
    lat, lon = synthgeo.synth_lat(eid), synthgeo.synth_lon(eid)
    gx = np.floor((lon + 180.0) / 1.0).astype(np.int64)
    gy = np.floor((lat + 90.0) / 1.0).astype(np.int64)
    cell = gy * 360 + gx
    uc, cnt = np.unique(cell, return_counts=True)
    dense = {int(c): int(n) for c, n in zip(uc, cnt) if n >= min_pts}
    # union-find over 8-neighbors
    parent = {c: c for c in dense}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for c in dense:
        cx, cy = c % 360, c // 360
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == dy == 0:
                    continue
                nx, ny = cx + dx, cy + dy
                nb = ny * 360 + nx
                if 0 <= nx < 360 and nb in dense:
                    ra, rb = find(c), find(nb)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    out = {}
    for c, n in dense.items():
        r = find(c)
        cells_n, pts_n = out.get(r, (0, 0))
        out[r] = (cells_n + 1, pts_n + n)
    return out


def test_hotspot_clusters_union_find_replay(ray_session, sf_small):
    from geografir_ray.pipelines.spatial import geo_hotspot_clusters

    got = geo_hotspot_clusters(sf_small, min_pts=5).to_pandas()
    ref = _hotspot_reference(min_pts=5)
    assert len(got) == len(ref)
    for row in got.itertuples(index=False):
        assert ref[row.cluster_id] == (row.n_cells, row.n_points), row.cluster_id


def test_hotspot_clusters_empty_dense_keeps_schema(ray_session, tmp_path):
    """No cell reaches min_pts (the sf0.001 shape): the result must
    still carry the 3-column schema — rule 25, empty Datasets lose
    theirs, so the pipeline returns a typed Table."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from geografir_ray.pipelines.spatial import geo_hotspot_clusters

    t = pa.table(
        {"event_id": pa.array(np.arange(5, dtype=np.int64)),
         "ts": pa.array(np.zeros(5).astype("datetime64[us]")),
         "user_id": pa.array(np.zeros(5, dtype=np.int64)),
         "event_type": pa.array(["x"] * 5),
         "value": pa.array(np.ones(5)),
         "props": pa.array(["{}"] * 5)}
    )
    pq.write_table(t, tmp_path / "events.parquet")
    out = geo_hotspot_clusters(str(tmp_path))
    out_t = out if isinstance(out, pa.Table) else pa.Table.from_pandas(out.to_pandas())
    assert out_t.num_rows == 0
    assert out_t.schema.names == ["cluster_id", "n_cells", "n_points"]
