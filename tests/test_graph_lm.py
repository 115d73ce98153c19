"""Tests for the round-4 continuation-4 operators: integer PageRank
and corpus-conditioned LM scoring."""

import numpy as np
import pyarrow as pa
import pytest


def _pagerank_reference(edges, iters):
    """Pure-python integer PageRank, the spec both engines implement."""
    from geografir_ray.pipelines.graph import PR_BASE, PR_SCALE

    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    outd = {}
    for s, _ in edges:
        outd[s] = outd.get(s, 0) + 1
    r = {n: PR_SCALE for n in nodes}
    for _ in range(iters):
        c = {n: 0 for n in nodes}
        for s, d in edges:
            c[d] += r[s] // outd[s]
        r = {n: PR_BASE + (85 * c[n]) // 100 for n in nodes}
    return r


def test_pagerank_tiny_graph_exact(ray_session):
    import ray.data

    from geografir_ray.pipelines.graph import pagerank

    # a small digraph with a dangling node (4), a no-in-edges node (0),
    # a multi-edge (1->2 twice), and a 2-cycle
    edges = [(0, 1), (1, 2), (1, 2), (2, 1), (2, 3), (3, 4), (0, 4)]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.int64()),
                "dst": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    )
    got = pagerank(ds, iters=4, n_buckets=4).to_pandas()
    got = dict(zip(got["node"], got["r"]))
    assert got == _pagerank_reference(edges, 4)


def test_pagerank_partition_invariant(ray_session):
    import ray.data

    from geografir_ray.pipelines.graph import pagerank

    rng = np.random.RandomState(7)
    src = rng.randint(0, 50, 400).astype(np.int64)
    dst = rng.randint(0, 50, 400).astype(np.int64)
    t = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    a = pagerank(ray.data.from_arrow(t), iters=3, n_buckets=8).to_pandas()
    b = pagerank(
        ray.data.from_arrow(t).repartition(13), iters=3, n_buckets=3
    ).to_pandas()
    a = a.sort_values("node").reset_index(drop=True)
    b = b.sort_values("node").reset_index(drop=True)
    assert a.equals(b)
    ref = _pagerank_reference(list(zip(src.tolist(), dst.tolist())), 3)
    assert dict(zip(a["node"], a["r"])) == ref


def test_graph_pagerank_matches_duckdb(ray_session, sf_small):
    import duckdb

    from geografir_ray.pipelines.graph import graph_pagerank, graph_pagerank_sql

    got = graph_pagerank(sf_small).to_pandas()
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_small}/{t}.parquet')"
        )
    exp = con.execute(graph_pagerank_sql()).df()
    assert len(got) == len(exp)
    assert (got["node"].to_numpy() == exp["node"].to_numpy()).all()
    assert (got["r"].to_numpy() == exp["r"].to_numpy()).all()


def _lm_reference(doc_ids, texts):
    from collections import Counter

    bgs = {}
    for d, s in zip(doc_ids, texts):
        toks = [w for w in (s or "").split(" ") if w]
        bgs[d] = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    corpus = Counter(g for gl in bgs.values() for g in gl)
    out = {}
    for d, gl in bgs.items():
        if not gl:
            continue
        nb = len(gl)
        hits = sum(corpus[g] for g in gl)
        out[d] = (nb, hits, (1000 * hits) // nb)
    return out


def test_lm_score_brute_replay(ray_session, sf_small):
    import pyarrow.parquet as pq

    from geografir_ray.pipelines.documents import docs_lm_score

    got = docs_lm_score(sf_small).to_pandas()
    docs = pq.read_table(
        f"{sf_small}/documents.parquet", columns=["doc_id", "text"]
    )
    ref = _lm_reference(
        docs["doc_id"].to_pylist(), docs["text"].to_pylist()
    )
    assert len(got) == len(ref)
    for row in got.itertuples(index=False):
        assert ref[row.doc_id] == (row.nb, row.hits, row.lm_score), row.doc_id


def test_lm_score_bucket_invariant(ray_session, sf_small):
    from geografir_ray.pipelines.documents import docs_lm_score

    a = docs_lm_score(sf_small, n_buckets=64).to_pandas()
    b = docs_lm_score(sf_small, n_buckets=7).to_pandas()
    assert a.equals(b)


def _pmi_reference(texts, min_count=5, top_k=100):
    from collections import Counter

    uni, big = Counter(), Counter()
    for s in texts:
        toks = [w for w in (s or "").split(" ") if w]
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
    n = sum(uni.values())
    rows = []
    for (w1, w2), c_ab in big.items():
        if c_ab < min_count:
            continue
        score = ((c_ab * 1_000_000) // uni[w1]) * n // uni[w2]
        rows.append((w1, w2, c_ab, score))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    return rows[:top_k]


def test_pmi_collocations_brute_replay(ray_session, sf_small):
    import pyarrow.parquet as pq

    from geografir_ray.pipelines.documents import docs_pmi_collocations

    got = docs_pmi_collocations(sf_small, min_count=2).to_pandas()
    docs = pq.read_table(f"{sf_small}/documents.parquet", columns=["text"])
    ref = _pmi_reference(docs["text"].to_pylist(), min_count=2)
    assert len(got) == len(ref)
    got_rows = list(got.itertuples(index=False, name=None))
    assert got_rows == ref


def test_pmi_collocations_bucket_invariant(ray_session, sf_small):
    from geografir_ray.pipelines.documents import docs_pmi_collocations

    a = docs_pmi_collocations(sf_small, n_buckets=64, min_count=2).to_pandas()
    b = docs_pmi_collocations(sf_small, n_buckets=5, min_count=2).to_pandas()
    assert a.equals(b)


def _hits_reference(edges, iters):
    """Pure-python integer HITS, the spec both engines implement."""
    from geografir_ray.pipelines.graph import HITS_SCALE

    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    h = {n: HITS_SCALE for n in nodes}
    a = dict(h)
    for _ in range(iters):
        araw = {n: 0 for n in nodes}
        for s, d in edges:
            araw[d] += h[s]
        mx = max(araw.values())
        a = {n: (v * HITS_SCALE) // mx if mx else 0 for n, v in araw.items()}
        hraw = {n: 0 for n in nodes}
        for s, d in edges:
            hraw[s] += a[d]
        mx = max(hraw.values())
        h = {n: (v * HITS_SCALE) // mx if mx else 0 for n, v in hraw.items()}
    return h, a


def test_hits_tiny_graph_exact(ray_session):
    import ray.data

    from geografir_ray.pipelines.graph import hits

    edges = [(0, 1), (1, 2), (1, 2), (2, 1), (2, 3), (3, 4), (0, 4)]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.int64()),
                "dst": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    )
    got = hits(ds, iters=2, n_buckets=4).to_pandas()
    h_ref, a_ref = _hits_reference(edges, 2)
    assert dict(zip(got["node"], got["h"])) == h_ref
    assert dict(zip(got["node"], got["a"])) == a_ref


def test_hits_partition_invariant(ray_session):
    import ray.data

    from geografir_ray.pipelines.graph import hits

    rng = np.random.RandomState(11)
    src = rng.randint(0, 40, 300).astype(np.int64)
    dst = rng.randint(0, 40, 300).astype(np.int64)
    t = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    a = hits(ray.data.from_arrow(t), iters=3, n_buckets=8).to_pandas()
    b = hits(
        ray.data.from_arrow(t).repartition(11), iters=3, n_buckets=3
    ).to_pandas()
    a = a.sort_values("node").reset_index(drop=True)
    b = b.sort_values("node").reset_index(drop=True)
    assert a.equals(b)
    h_ref, a_ref = _hits_reference(list(zip(src.tolist(), dst.tolist())), 3)
    assert dict(zip(a["node"], a["h"])) == h_ref
    assert dict(zip(a["node"], a["a"])) == a_ref


def _triangles_reference(edges):
    """Brute-force per-node triangle counts (set-intersection form)."""
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = {}
    for a, b in edges:
        for c in adj[a] & adj[b]:
            if a < b < c or not (a < b):
                pass
            # count each triangle once via the ordered corner rule below
    # simpler exact: enumerate id-ordered triangles
    eset = {(a, b) for a, b in edges}
    nodes = sorted(adj)
    for x, y in sorted(eset):
        common = adj[x] & adj[y]
        for z in common:
            if z > y:  # x < y < z and all three edges exist
                for n in (x, y, z):
                    counts[n] = counts.get(n, 0) + 1
    return counts


def test_triangles_tiny_graph_exact(ray_session):
    import ray.data

    from geografir_ray.pipelines.graph import triangles

    # K4 on {0,1,2,3} (4 triangles, every node in 3), plus a pendant
    # edge (4,5) and one extra triangle (3,6,7)
    edges = [
        (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
        (4, 5), (3, 6), (3, 7), (6, 7),
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([e[0] for e in edges], pa.int64()),
                "b": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    )
    got = triangles(ds, n_groups=4).to_pandas()
    assert dict(zip(got["node"], got["n_tri"])) == _triangles_reference(edges)


def test_triangles_random_graph_matches_reference(ray_session):
    import ray.data

    from geografir_ray.pipelines.graph import triangles

    rng = np.random.RandomState(11)
    a = rng.randint(0, 60, 500).astype(np.int64)
    b = rng.randint(0, 60, 500).astype(np.int64)
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    keep = lo < hi
    pairs = sorted({(int(x), int(y)) for x, y in zip(lo[keep], hi[keep])})
    t = pa.table(
        {
            "a": pa.array([p[0] for p in pairs], pa.int64()),
            "b": pa.array([p[1] for p in pairs], pa.int64()),
        }
    )
    ref = _triangles_reference(pairs)
    got = triangles(ray.data.from_arrow(t), n_groups=8).to_pandas()
    assert dict(zip(got["node"], got["n_tri"])) == ref
    # partition invariance: different block structure + group count
    got2 = triangles(
        ray.data.from_arrow(t).repartition(17), n_groups=3
    ).to_pandas()
    assert dict(zip(got2["node"], got2["n_tri"])) == ref
    # path equivalence: broadcast_threshold=0 forces the fully
    # distributed semi-join plan on the same graph
    got3 = triangles(
        ray.data.from_arrow(t).repartition(5), n_groups=4,
        broadcast_threshold=0,
    ).to_pandas()
    assert dict(zip(got3["node"], got3["n_tri"])) == ref


def test_components_bsp_matches_union_find_and_dataset_engine(ray_session):
    """BSP components (shard-once, pointer doubling) vs a pure-python
    union-find AND the Dataset min-label engine, on a random graph plus
    a 200-node path (exercises the doubling ladder), at two bucket
    counts (1 hits the num_returns=1 edge paths)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geografir_ray.stages.components import (
        min_label_components,
        min_label_components_bsp,
    )

    rng = np.random.default_rng(3)
    N, E = 500, 700
    src = rng.integers(0, N, E)
    dst = rng.integers(0, N, E)
    path = np.arange(200)
    src = np.concatenate([src, path[:-1] + N])
    dst = np.concatenate([dst, path[1:] + N])
    s2 = np.concatenate([src, dst]).astype(np.int64)
    d2 = np.concatenate([dst, src]).astype(np.int64)

    parent = np.arange(N + 200)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(s2.tolist(), d2.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict[int, set] = {}
    for v in set(s2.tolist()) | set(d2.tolist()):
        comp.setdefault(find(v), set()).add(v)
    exp = {}
    for mem in comp.values():
        m = min(mem)
        for v in mem:
            exp[v] = m

    for nb in (1, 8):
        edges = rd.from_arrow(pa.table({"src": s2, "dst": d2})).repartition(4)
        out = min_label_components_bsp(edges, n_buckets=nb).to_pandas()
        got = dict(zip(out["node"].tolist(), out["label"].tolist()))
        assert got == exp, f"n_buckets={nb}"

    # Dataset engine agreement (same labels on the same graph)
    edges_ds = rd.from_arrow(pa.table({"node": s2, "dst": d2})).repartition(4)
    nodes = np.array(sorted(exp.keys()), dtype=np.int64)
    labels = rd.from_arrow(pa.table({"node": nodes, "label": nodes}))
    out2 = min_label_components(edges_ds, labels).to_pandas()
    got2 = dict(zip(out2["node"].tolist(), out2["label"].tolist()))
    assert got2 == exp


def test_kcore_bsp_matches_numpy_peel(ray_session):
    """kcore_bsp vs a direct numpy peel replay on a random graph, at
    two bucket counts and two k values (k=4 empties the graph)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geografir_ray.pipelines.graph import kcore_bsp

    rng = np.random.default_rng(11)
    N, E = 300, 900
    a = rng.integers(0, N, E).astype(np.int64)
    b = rng.integers(0, N, E).astype(np.int64)
    keep = a != b
    a, b = a[keep], b[keep]
    # distinct undirected edges
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    pairs = np.unique(lo * N + hi)
    lo, hi = pairs // N, pairs % N
    s2 = np.concatenate([lo, hi])
    d2 = np.concatenate([hi, lo])

    def peel(k):
        nodes, inv = np.unique(np.concatenate([lo, hi]), return_inverse=True)
        ia, ib = inv[: len(lo)], inv[len(lo):]
        alive = np.ones(len(nodes), bool)
        while True:
            m = alive[ia] & alive[ib]
            deg = np.zeros(len(nodes), np.int64)
            np.add.at(deg, ia[m], 1)
            np.add.at(deg, ib[m], 1)
            kills = alive & (deg < k)
            if not kills.any():
                return {
                    int(n): int(d)
                    for n, d, al in zip(nodes, deg, alive)
                    if al
                }
            alive &= ~kills

    for k in (3, 4):
        exp = peel(k)
        for nb in (1, 8):
            edges = rd.from_arrow(pa.table({"src": s2, "dst": d2})).repartition(4)
            out = kcore_bsp(edges, k=k, n_buckets=nb, max_rounds=40).to_pandas()
            got = dict(zip(out["node"].tolist(), out["deg"].tolist()))
            assert got == exp, (k, nb)


def test_bfs_tiny_graph_exact_and_bucket_invariant(ray_session):
    """bfs_bsp vs a brute frontier BFS on a random sparse digraph, at
    n_buckets 1 and 8 (bucketing must not change distances)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geografir_ray.pipelines.graph import bfs_bsp

    rng = np.random.default_rng(11)
    N, M = 60, 150
    src = rng.integers(0, N, M).astype(np.int64)
    dst = rng.integers(0, N, M).astype(np.int64)

    def seeds(nodes):
        return nodes % 7 == 0

    # brute rounds
    nodes = np.unique(np.concatenate([src, dst]))
    INF = 1 << 60
    dist = {int(n): (0 if n % 7 == 0 else INF) for n in nodes}
    for _ in range(3):
        nxt = dict(dist)
        for s, d in zip(src, dst):
            if dist[int(s)] + 1 < nxt[int(d)]:
                nxt[int(d)] = dist[int(s)] + 1
        dist = nxt
    exp = {n: h for n, h in dist.items() if h < INF}

    for nb in (1, 8):
        edges = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(3)
        out = bfs_bsp(edges, seeds, rounds=3, n_buckets=nb).to_pandas()
        got = dict(zip(out["node"].tolist(), out["hops"].tolist()))
        assert got == exp, nb
