"""Embedding pipelines: brute-force cosine kNN (broadcast query matrix),
cosine near-dup pairs, per-label centroids, and an IVF-bucketed ANN
variant (the scale path).

Embeddings table: (vec_id:int64, embedding:list<float>[64], label:int32).

Scale design: the query side is broadcast once via ray.put as a dense
float64 matrix; each batch does one numpy matmul against it (vectorized
batched inference pattern).  The IVF variant assigns vectors to
centroid buckets (deterministic seeded k-means init, no iteration
dependence) and probes only the nearest buckets — the 100TB path where
the target side cannot be broadcast.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.tables import read_table, read_table_local

N_QUERIES = 10
TOP_K = 5


def _emb_matrix(t: pa.Table) -> np.ndarray:
    """(n, d) float64 from a list<float> column (flatten, reshape)."""
    col = t["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    return flat.reshape(n, -1)


def _queries_payload(sf_dir: str):
    """First N_QUERIES vectors by vec_id (deterministic query set)."""
    t = (
        read_table_local(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        .sort_values("vec_id")
        .head(N_QUERIES)
    )
    q = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"]])
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    return t["vec_id"].values.astype(np.int64), qn


# ---------------------------------------------------------------------------
# Brute-force cosine top-k (oracle: DuckDB list_cosine_similarity)
# ---------------------------------------------------------------------------


def emb_knn(sf_dir: str):
    """Top-5 cosine neighbors among all vectors for each of the first 10
    query vectors (self-match excluded).  Output int ranks only — float
    similarity stays engine-internal so the value-hash is exact.

    Expressed on the generic ``ann_brute_topk`` operator: the exchange
    is bounded at ~k rows per query per batch (per-batch partial top-k
    with tie-safe threshold), never the full score cross-product."""
    qids, qn = _queries_payload(sf_dir)
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ann_brute_topk(ds, qids, qn, k=TOP_K, exclude_self=True)


EMB_KNN_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  ORDER BY vec_id LIMIT {N_QUERIES}
),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(q.qe, e.embedding) AS sim
  FROM q CROSS JOIN embeddings e
  WHERE q.query_id <> e.vec_id
),
ranked AS (
  SELECT query_id, vec_id AS neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


# ---------------------------------------------------------------------------
# Cosine near-duplicate pairs (threshold chosen for non-empty results on
# the synthetic table; output int ids only)
# ---------------------------------------------------------------------------

NEARDUP_THRESHOLD = 0.4  # chosen for non-empty results on the synthetic table


def emb_neardup(sf_dir: str):
    """All pairs (a < b) with cosine >= threshold.

    Broadcast full matrix (500 x 64 here); per-batch rows x all matmul.
    At scale this becomes the IVF-bucketed variant (emb_ivf_knn) —
    documented tradeoff."""
    import ray

    t = read_table_local(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    t = t.sort_values("vec_id")
    m = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"]])
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    ids = t["vec_id"].values.astype(np.int64)
    ref = ray.put((ids, mn))

    from ..stages.broadcast import with_broadcast

    def pairs(state, batch: pa.Table) -> pa.Table:
        ids, mn = state
        bm = _emb_matrix(batch)
        bm = bm / np.linalg.norm(bm, axis=1, keepdims=True)
        bid = batch["vec_id"].to_numpy(zero_copy_only=False)
        sims = bm @ mn.T
        bi, aj = np.nonzero(sims >= NEARDUP_THRESHOLD)
        a = bid[bi]
        b = ids[aj]
        keep = a < b
        return pa.table({"a": pa.array(a[keep]), "b": pa.array(b[keep])})

    return (
        read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        .map_batches(with_broadcast(ref, pairs, "neardup_pairs"),
                     batch_format="pyarrow", zero_copy_batch=True)
        .sort(["a", "b"])
    )


EMB_NEARDUP_SQL = f"""
SELECT a.vec_id AS a, b.vec_id AS b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= {NEARDUP_THRESHOLD}
ORDER BY a, b
"""


# ---------------------------------------------------------------------------
# Per-label counts + centroid norms (rows-only: float mean order)
# ---------------------------------------------------------------------------


def emb_label_stats(sf_dir: str):
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])

    def partial(t: pa.Table) -> pa.Table:
        m = _emb_matrix(t)
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        rows = []
        for l in np.unique(lab):
            sel = lab == l
            rows.append((int(l), int(sel.sum()), m[sel].sum(axis=0)))
        return pa.table(
            {
                "label": pa.array([r[0] for r in rows], type=pa.int64()),
                "n": pa.array([r[1] for r in rows], type=pa.int64()),
                "vec_sum": pa.array([r[2].tolist() for r in rows], type=pa.list_(pa.float64())),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def merge(t: pa.Table) -> pa.Table:
        # pyarrow group format (CLAUDE.md rule 10): the list<double>
        # vec_sum column stays a flat buffer — no per-row PyObject.
        if t.num_rows == 0:  # typed empty block (CLAUDE.md rule 8)
            return pa.table(
                {
                    "label": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                    "centroid_norm_pct": pa.array([], type=pa.int64()),
                }
            )
        n = int(t["n"].combine_chunks().to_numpy().sum())
        vs = t["vec_sum"].combine_chunks()
        flat = np.asarray(vs.flatten(), dtype=np.float64).reshape(t.num_rows, -1)
        centroid = flat.sum(axis=0) / n
        return pa.table(
            {
                "label": pa.array([t["label"][0].as_py()], type=pa.int64()),
                "n": pa.array([n], type=pa.int64()),
                "centroid_norm_pct": pa.array(
                    [int(np.floor(np.linalg.norm(centroid) * 100))], type=pa.int64()
                ),
            }
        )

    return partials.groupby("label").map_groups(merge, batch_format="pyarrow").sort("label")


# ---------------------------------------------------------------------------
# IVF-bucketed ANN (scale path, rows-only): deterministic centroids from
# the first C vectors; probe nprobe nearest buckets per query.
# ---------------------------------------------------------------------------


def emb_ivf_knn(sf_dir: str, n_cells: int = 8, nprobe: int = 3):
    """IVF-bucketed approximate top-5, expressed on the generic
    ``ann_ivf_topk`` operator (bounded exchange, cell-inverted probe).

    Deterministic "training": centroids = first n_cells vectors (seeded
    kmeans++ would need iteration; init-only keeps it reproducible)."""
    head = (
        read_table_local(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        .sort_values("vec_id")
        .head(n_cells)
    )
    cent = np.stack([np.asarray(v, dtype=np.float64) for v in head["embedding"]])
    qids, qn = _queries_payload(sf_dir)
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ann_ivf_topk(
        ds, qids, qn, cent, k=TOP_K, nprobe=nprobe, exclude_self=True
    )


# ---------------------------------------------------------------------------
# LSH-bucketed cosine near-dup — the documented scale path for
# emb_neardup (no broadcast of the full matrix, no all-pairs).
#
# Random-hyperplane signatures, made EXACTLY reproducible in SQL:
# embeddings quantize to integer milli-units (floor(x*1000), identical
# in numpy float64 and DuckDB DOUBLE) and the hyperplane weights derive
# from the same integer LCG formula both sides, so every dot product —
# and therefore every sign bit and bucket id — is integer-exact in both
# engines.  Banding: N_BANDS bands of PLANES_PER_BAND sign bits; a pair
# is a candidate if ANY band bucket matches; candidates verify with
# full cosine >= threshold inside the bucket (pairwise only within
# buckets), then dedup across bands in the shuffle.  This mirrors the
# text-side MinHash-LSH shape (documents.py) on the embedding column.
# ---------------------------------------------------------------------------

N_LSH_PLANES = 16
LSH_PLANES_PER_BAND = 2  # 8 bands x 2 bits: ~98% recall at cos 0.4
EMB_DIM = 64


def _lsh_planes(n_planes: int = N_LSH_PLANES) -> np.ndarray:
    """(n_planes, EMB_DIM) int64 hyperplane weights from the shared
    integer LCG (same formula inlined in the SQL twin)."""
    idx = np.arange(n_planes * EMB_DIM, dtype=np.int64)
    w = (idx * 2654435761 + 1013904223) % 4294967296 - 2147483648
    return w.reshape(n_planes, EMB_DIM)


def emb_lsh_neardup(
    sf_dir: str,
    n_planes: int = N_LSH_PLANES,
    planes_per_band: int = LSH_PLANES_PER_BAND,
    chunk: int = 4096,
):
    """LSH-bucketed cosine near-dup pairs.

    The sf-table defaults (16 planes, 2 bits/band = 8 bands x 4
    buckets) are oracle-pinned for the small synthetic table at the low
    0.4 threshold.  At corpus scale raise ``planes_per_band`` (e.g. 64
    planes, 8 bits/band = 256 buckets/band) so per-bucket occupancy
    stays bounded and the within-bucket verification doesn't degenerate
    to near-all-pairs; the SQL twin (emb_lsh_neardup_sql) takes the
    same parameters, so parity holds for any setting.  The verification
    itself runs in ``chunk``-row slabs, bounding peak memory to
    chunk x bucket_size even on a hot bucket."""
    from .common import grouped_sum

    if n_planes % planes_per_band:
        raise ValueError("planes_per_band must divide n_planes")
    W = _lsh_planes(n_planes)
    n_bands = n_planes // planes_per_band
    bitw = (np.int64(1) << np.arange(planes_per_band, dtype=np.int64))

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    _SIG = pa.schema(
        [
            ("band", pa.int64()),
            ("bucket", pa.int64()),
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
        ]
    )

    def sig_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _SIG.empty_table()
        m = _emb_matrix(t)
        n = len(m)
        q = np.floor(m * 1000.0).astype(np.int64)
        dots = q @ W.T  # (n, n_planes), integer-exact
        bits = (dots >= 0).astype(np.int64)
        buckets = (
            bits.reshape(n, n_bands, planes_per_band) * bitw[None, None, :]
        ).sum(axis=2)
        rep = pa.array(np.repeat(np.arange(n, dtype=np.int64), n_bands))
        col = t["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pa.table(
            {
                "band": pa.array(np.tile(np.arange(n_bands, dtype=np.int64), n)),
                "bucket": pa.array(buckets.ravel()),
                "vec_id": t["vec_id"].take(rep),
                "embedding": col.take(rep),
            }
        )

    _PAIRS = pa.schema([("a", pa.int64()), ("b", pa.int64()), ("one", pa.int64())])

    def bucket_pairs(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n < 2:
            return _PAIRS.empty_table()
        m = _emb_matrix(g)
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        ids = g["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        outs_a, outs_b = [], []
        # Slab the i-axis so a hot bucket costs chunk x n peak memory,
        # never n x n.  Only j > i survives (strict upper triangle).
        for lo in range(0, n - 1, chunk):
            hi = min(lo + chunk, n)
            sims = mn[lo:hi] @ mn.T  # (hi-lo, n)
            ii, jj = np.nonzero(sims >= NEARDUP_THRESHOLD)
            keep = jj > (ii + lo)
            x, y = ids[ii[keep] + lo], ids[jj[keep]]
            outs_a.append(np.minimum(x, y))
            outs_b.append(np.maximum(x, y))
        a = np.concatenate(outs_a) if outs_a else np.empty(0, dtype=np.int64)
        b = np.concatenate(outs_b) if outs_b else np.empty(0, dtype=np.int64)
        return pa.table(
            {
                "a": pa.array(a),
                "b": pa.array(b),
                "one": pa.array(np.ones(len(a), dtype=np.int64)),
            }
        )

    cand = (
        ds.map_batches(sig_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["band", "bucket"])  # bounded: n_bands * 2^bits groups
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    dedup = grouped_sum(cand, ["a", "b"], {"n": ("one", "sum")})

    def project(t: pa.Table) -> pa.Table:
        return t.select(["a", "b"])

    return dedup.map_batches(project, batch_format="pyarrow").sort(["a", "b"])


def emb_lsh_neardup_sql(
    n_planes: int = N_LSH_PLANES, planes_per_band: int = LSH_PLANES_PER_BAND
) -> str:
    """DuckDB twin of emb_lsh_neardup; takes the same banding parameters
    so parity can be checked at any occupancy setting."""
    return f"""
WITH e AS (
  SELECT vec_id, gd.d,
         CAST(FLOOR(CAST(embedding[gd.d + 1] AS DOUBLE) * 1000.0) AS BIGINT) AS q
  FROM embeddings, generate_series(0, {EMB_DIM - 1}) AS gd(d)
),
planes AS (
  SELECT gp.p, gd.d,
         (CAST(gp.p * {EMB_DIM} + gd.d AS BIGINT) * 2654435761 + 1013904223)
           % 4294967296 - 2147483648 AS w
  FROM generate_series(0, {n_planes - 1}) AS gp(p),
       generate_series(0, {EMB_DIM - 1}) AS gd(d)
),
dots AS (
  SELECT e.vec_id, planes.p, SUM(e.q * planes.w) AS dot
  FROM e JOIN planes USING (d)
  GROUP BY e.vec_id, planes.p
),
sig AS (
  SELECT vec_id, p // {planes_per_band} AS band,
         SUM(CASE WHEN dot >= 0
                  THEN 1 << (p % {planes_per_band}) ELSE 0 END) AS bucket
  FROM dots GROUP BY vec_id, band
),
cand AS (
  SELECT s1.vec_id AS a, s2.vec_id AS b
  FROM sig s1 JOIN sig s2
    ON s1.band = s2.band AND s1.bucket = s2.bucket AND s1.vec_id < s2.vec_id
  GROUP BY 1, 2
)
SELECT c.a, c.b
FROM cand c
JOIN embeddings ea ON ea.vec_id = c.a
JOIN embeddings eb ON eb.vec_id = c.b
WHERE list_cosine_similarity(ea.embedding, eb.embedding) >= {NEARDUP_THRESHOLD}
ORDER BY a, b
"""


# ---------------------------------------------------------------------------
# Generic ANN operators for arbitrary scale (the bench path; the
# sf-table queries above keep their oracle-pinned shapes).
#
# ann_brute_topk: broadcast query matrix, one BLAS matmul per batch,
# and a PER-BATCH partial top-k so the shuffle moves k rows per
# (query, batch) — never the full similarity matrix.  ann_ivf_topk:
# batch vectors group by their nearest centroid and only the queries
# probing that cell pay a matmul — candidate generation cost drops by
# ~nprobe/n_cells vs brute force; same partial-top-k merge.
# ---------------------------------------------------------------------------


def _partial_topk_rows(qids, sims, vid, k: int):
    """(query_id, vec_id, sim) rows of the per-batch top-k per query.

    sims: (nq, n_batch) QUERY-MAJOR — the k-selection runs along the
    contiguous axis (measured 2.5x faster than the strided column-wise
    orientation: 0.7 s vs 1.8 s per 50M-element chunk on this host) and
    the kth-largest is found as the (nb-k)th-smallest so no negated
    temp matrix is allocated.  Rows TIED with the kth similarity are
    all kept (>= threshold, not an arbitrary argpartition cut), so the
    global merge's (sim desc, vec_id asc) tie-break sees every candidate
    that could be in the true top-k — exactness is partition-invariant.
    -inf similarities (self-match masking) are dropped."""
    q, v, s = _partial_topk_arrays(qids, sims, vid, k)
    return pa.table(
        {
            "query_id": pa.array(q),
            "vec_id": pa.array(v),
            "sim": pa.array(s),
        }
    )


def _partial_topk_arrays(qids, sims, vid, k: int):
    """Numpy-array form of :func:`_partial_topk_rows` — same candidate
    rows, returned as (query_id, vec_id, sim) arrays for callers that
    locally reduce candidates before building an Arrow table."""
    nq, nb = sims.shape
    kk = min(k, nb)
    # kth-largest sim per query row; keep everything >= it
    thresh = np.partition(sims, nb - kk, axis=1)[:, nb - kk]
    mask = (sims >= thresh[:, None]) & np.isfinite(sims)
    qi, vi = np.nonzero(mask)  # query-major order
    return (
        np.asarray(qids, dtype=np.int64)[qi],
        np.asarray(vid, dtype=np.int64)[vi],
        sims[qi, vi].astype(np.float64, copy=False),
    )


def _local_topk_arrays(q, v, s, k: int):
    """Exact per-query top-k over candidate arrays, with the SAME
    ordering rule as the global merge (sim desc, vec_id asc) — a local
    pre-reduction that cannot change the final merged top-k."""
    order = np.lexsort((v, -s, q))
    qo = q[order]
    first = np.ones(len(qo), dtype=bool)
    first[1:] = qo[1:] != qo[:-1]
    starts = np.flatnonzero(first)
    grp = np.cumsum(first) - 1
    pos = np.arange(len(qo), dtype=np.int64) - starts[grp]
    keep = order[pos < k]
    return q[keep], v[keep], s[keep]


_TOPK_OUT = pa.schema(
    [("query_id", pa.int64()), ("neighbor_id", pa.int64()), ("rank", pa.int64())]
)


def _merge_topk(scored, k: int, n_buckets: int = 64):
    """Global per-query top-k over the per-batch partial candidates.

    Co-partition by hash(query_id) % B (B ≈ a few x cores, bounded),
    then one lexsort + segment-select per bucket — the sort+segment
    pattern of stages/knn.py, NOT one Python call per query (the
    per-group trap: 1M queries x ~50 us is a minute of pure overhead).
    Ranks tie-break by ascending vec_id, matching the SQL twin's
    ORDER BY sim DESC, vec_id."""
    from ..functions.hashing import splitmix64

    def tag(t: pa.Table) -> pa.Table:
        q = t["query_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column(
            "__bkt", pa.array((splitmix64(q) % np.uint64(n_buckets)).astype(np.int64))
        )

    def merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _TOPK_OUT.empty_table()
        q = g["query_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = g["sim"].to_numpy(zero_copy_only=False)
        v = g["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((v, -s, q))  # by query, sim desc, vec_id asc
        qo, vo = q[order], v[order]
        first = np.ones(len(qo), dtype=bool)
        first[1:] = qo[1:] != qo[:-1]
        starts = np.flatnonzero(first)
        grp = np.cumsum(first) - 1
        pos = np.arange(len(qo), dtype=np.int64) - starts[grp]
        keep = pos < k
        return pa.table(
            {
                "query_id": pa.array(qo[keep]),
                "neighbor_id": pa.array(vo[keep]),
                "rank": pa.array(pos[keep] + 1),
            }
        )

    return (
        scored.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bkt")
        .map_groups(merge, batch_format="pyarrow")
        .sort(["query_id", "rank"])
    )


def _mask_self(sims: np.ndarray, vid: np.ndarray, qids: np.ndarray) -> None:
    """Set sims[q, c] = -inf where qids[q] == vid[c] (self-match
    exclusion; sims is query-major (nq, nb)).  Columns whose vec_id is
    some query's id are rare (at most nq across the whole dataset), so
    the inner scan is tiny."""
    cols = np.flatnonzero(np.isin(vid, qids))
    for c in cols:
        sims[qids == vid[c], c] = -np.inf


def ann_brute_topk(
    ds, qids: np.ndarray, qmat: np.ndarray, k: int = 10, exclude_self: bool = False,
    qchunk: int = 8192, batch_size: int | None = None, dtype=np.float64,
):
    """Exact cosine top-k of each query against a Dataset with
    (vec_id, embedding).  qmat rows need not be normalized.
    ``exclude_self`` drops rows whose vec_id equals the query's id
    (the self-kNN case where queries come from the dataset itself).

    The matmul is chunked over the QUERY axis (``qchunk`` columns at a
    time) so peak per-task memory is batch_rows x qchunk doubles no
    matter how many queries there are — 100k+ query workloads don't
    materialize a batch x nq similarity matrix.  The per-batch partial
    top-k is emitted per chunk (identical rows to the unchunked form),
    keeping the exchange at ~k rows per query per batch.
    ``batch_size=None`` (default) scores whole blocks — fewer, larger
    partials; pass a row count to cap batch memory instead.

    ``dtype=np.float64`` (default) keeps scoring bit-compatible with
    the float64 SQL oracle; large bench/production workloads pass
    ``np.float32`` — half the memory traffic through the matmul and the
    partition-dominated top-k (measured ~2x on this host), standard
    practice for brute-force exact ANN where 24-bit mantissa ties are
    broken deterministically by vec_id anyway."""
    import ray

    from ..stages.broadcast import with_broadcast

    qn = (qmat / np.linalg.norm(qmat, axis=1, keepdims=True)).astype(
        dtype, copy=False
    )
    ref = ray.put((np.asarray(qids, dtype=np.int64), qn))

    def score(state, t: pa.Table) -> pa.Table:
        qids, qn = state
        empty = pa.schema(
            [("query_id", pa.int64()), ("vec_id", pa.int64()), ("sim", pa.float64())]
        ).empty_table()
        if t.num_rows == 0:
            return empty
        m = _emb_matrix(t)
        m = (m / np.linalg.norm(m, axis=1, keepdims=True)).astype(dtype, copy=False)
        vid = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        parts = []
        for lo in range(0, len(qids), qchunk):
            hi = min(lo + qchunk, len(qids))
            sims = qn[lo:hi] @ m.T  # query-major (chunk, nb)
            if exclude_self:
                _mask_self(sims, vid, qids[lo:hi])
            parts.append(_partial_topk_rows(qids[lo:hi], sims, vid, k))
        return pa.concat_tables(parts) if parts else empty

    scored = ds.map_batches(
        with_broadcast(ref, score, "ann_brute"), batch_format="pyarrow",
        zero_copy_batch=True, batch_size=batch_size,
    )
    return _merge_topk(scored, k)


def ann_ivf_topk(
    ds, qids: np.ndarray, qmat: np.ndarray, centroids: np.ndarray,
    k: int = 10, nprobe: int = 8, exclude_self: bool = False,
):
    """IVF-bucketed approximate cosine top-k: batch vectors group by
    nearest centroid; only queries probing a cell compute sims against
    that cell's vectors (cell-inverted — no per-query Python loop)."""
    import ray

    from ..stages.broadcast import with_broadcast

    qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    cent = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    qcells = np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]
    # invert: cell -> probing query rows
    n_cells = len(cent)
    probes = [np.flatnonzero((qcells == c).any(axis=1)) for c in range(n_cells)]
    ref = ray.put((np.asarray(qids, dtype=np.int64), qn, cent, probes))

    def score(state, t: pa.Table) -> pa.Table:
        qids, qn, cent, probes = state
        empty = pa.schema(
            [("query_id", pa.int64()), ("vec_id", pa.int64()), ("sim", pa.float64())]
        ).empty_table()
        if t.num_rows == 0:
            return empty
        m = _emb_matrix(t)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        vid = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cell = np.argmax(m @ cent.T, axis=1)
        parts = []
        for c in np.unique(cell):
            qsel = probes[int(c)]
            if len(qsel) == 0:
                continue
            rows = np.flatnonzero(cell == c)
            sims = qn[qsel] @ m[rows].T  # query-major (probing queries, cell rows)
            if exclude_self:
                _mask_self(sims, vid[rows], qids[qsel])
            parts.append(_partial_topk_rows(qids[qsel], sims, vid[rows], k))
        if not parts:
            return empty
        return pa.concat_tables(parts)

    scored = ds.map_batches(
        with_broadcast(ref, score, "ann_ivf"), batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return _merge_topk(scored, k)


def ann_ivf_join(
    queries_ds,
    targets_ds,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 8,
    exclude_self: bool = False,
    n_buckets: int = 256,
    tile: int = 2048,
    dtype=np.float64,
    salt_rows: int | None = 100_000,
):
    """Fully-partitioned IVF kNN JOIN: top-k cosine targets for every
    query row, with NEITHER side broadcast — the embedding-space twin
    of the geo ring ladder (stages/knn.py).

    Every other ANN operator here ships the query matrix to each task
    via ray.put, which caps the query side at what fits in one object
    (fine for <=1M queries, wrong for a corpus-x-corpus join).  This
    one streams BOTH tables: targets home into their nearest-centroid
    cell (one row each), queries explode into their ``nprobe`` nearest
    cells (the only amplification — nprobe x (dim x 4 B) per query,
    exactly the lists an IVF scan visits anyway).  Both streams then
    co-partition on hash(cell) % n_buckets — ONE bounded exchange per
    side — and each bucket task lexsorts by cell and runs per-cell
    query x target matmuls in fixed-size tiles (CLAUDE.md rules
    13/17), emitting per-tile partial top-k rows (k rows per query per
    tile, never the sims matrix).  The global per-query merge is the
    same bucketed sort+segment path as every other ANN operator
    (_merge_topk).  Recall is IDENTICAL to ann_ivf_topk by
    construction: same cell assignment, same nprobe probe set — only
    the execution is distributed on both sides (equivalence-tested in
    tests/test_pipelines_misc.py).

    100 TB story: centroids are the only broadcast (k_cells x dim
    floats); exchange volume is n_targets + nprobe x n_queries rows
    regardless of corpus size; per-bucket memory is bounded by cell
    sizes (size k_cells so n/k_cells blocks fit a worker heap, the
    FAISS nlist sizing rule).

    Cell skew: real cluster sizes are zipf-ish, and one cell = one
    bucket task (measured 34.7 s max vs 7.2 s mean task time at
    100k x 1M before salting).  With ``salt_rows`` set, a bounded
    pre-pass counts targets per cell (k_cells keys, driver-merged),
    and any cell above the threshold splits its TARGETS into
    ceil(count / salt_rows) fragments while that cell's QUERIES
    replicate once per fragment — per-fragment partial top-k rows feed
    the same associative global merge, so the result set is unchanged
    (the merge already combines per-tile partials).  Costs one extra
    pass over the target embeddings for the histogram; pass
    salt_rows=None to skip when cluster sizes are known to be even.
    """
    import ray

    from ..functions.hashing import splitmix64
    from ..stages.broadcast import with_broadcast

    cent = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    salts = np.ones(len(cent), dtype=np.int64)
    if salt_rows is not None:
        from .common import grouped_sum

        def cell_hist(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table(
                    {"cell": pa.array([], type=pa.int64()),
                     "n": pa.array([], type=pa.int64())}
                )
            m = _emb_matrix(t)
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            cell = np.argmax(m @ cent.T, axis=1)
            cnt = np.bincount(cell, minlength=len(cent))
            nz = np.flatnonzero(cnt)
            return pa.table({"cell": pa.array(nz), "n": pa.array(cnt[nz])})

        hist = grouped_sum(
            targets_ds.map_batches(
                cell_hist, batch_format="pyarrow", zero_copy_batch=True
            ),
            ["cell"],
            {"n": ("n", "sum")},
            merge="driver",  # bounded: k_cells keys
        ).to_pandas()
        counts = np.zeros(len(cent), dtype=np.int64)
        counts[hist["cell"].to_numpy()] = hist["n"].to_numpy()
        salts = np.maximum(1, -(-counts // salt_rows))

    ref = ray.put((cent, salts))

    _TAGGED = pa.schema(
        [
            ("__bkt", pa.int64()),
            ("cell", pa.int64()),
            ("is_query", pa.bool_()),
            ("rid", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
        ]
    )

    def _emb_f32(t: pa.Table) -> pa.Array:
        col = t["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if col.type != pa.list_(pa.float32()):
            col = col.cast(pa.list_(pa.float32()))
        return col

    def _bkt_of(cell: np.ndarray, salt: np.ndarray) -> np.ndarray:
        mixed = splitmix64(cell.astype(np.uint64)) ^ (
            salt.astype(np.uint64) + np.uint64(1)
        )
        return (splitmix64(mixed) % np.uint64(n_buckets)).astype(np.int64)

    def tag_targets(state, t: pa.Table) -> pa.Table:
        cent, salts_ = state
        if t.num_rows == 0:
            return _TAGGED.empty_table()
        m = _emb_matrix(t)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        cell = np.argmax(m @ cent.T, axis=1).astype(np.int64)
        rid = t["vec_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        # fragment hot cells: target rows split over salts[cell]
        salt = (splitmix64(rid.astype(np.uint64)) % salts_[cell].astype(np.uint64)
                ).astype(np.int64)
        # the grouping key inside bucket_knn is the packed (cell,
        # fragment) id: fragments of one cell must NOT merge even when
        # their buckets collide, or replicated queries would score the
        # same (query, target) pair once per fragment
        M = np.int64(salts_.max())
        return pa.table(
            {
                "__bkt": pa.array(_bkt_of(cell, salt)),
                "cell": pa.array(cell * M + salt),
                "is_query": pa.array(np.zeros(t.num_rows, dtype=bool)),
                "rid": t["vec_id"].cast(pa.int64()),
                "embedding": _emb_f32(t),
            }
        )

    def tag_queries(state, t: pa.Table) -> pa.Table:
        cent, salts_ = state
        if t.num_rows == 0:
            return _TAGGED.empty_table()
        m = _emb_matrix(t)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        np_ = min(nprobe, len(cent))
        # same probe-selection rule as ann_ivf_topk (argsort, so the
        # probe SET is bit-identical on the same inputs — the
        # output-identity gate depends on it)
        cells = np.argsort(-(m @ cent.T), axis=1)[:, :np_].astype(np.int64)
        idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), np_)
        cell = cells.ravel()
        # a query probing a fragmented cell must visit EVERY fragment:
        # replicate its (query, cell) row once per salt
        reps = salts_[cell]
        idx2 = np.repeat(idx, reps)
        cell2 = np.repeat(cell, reps)
        total = int(reps.sum())
        salt = (
            np.arange(total, dtype=np.int64)
            - np.repeat(np.cumsum(reps) - reps, reps)
        )
        rep = t.take(idx2)
        M = np.int64(salts_.max())
        return pa.table(
            {
                "__bkt": pa.array(_bkt_of(cell2, salt)),
                "cell": pa.array(cell2 * M + salt),
                "is_query": pa.array(np.ones(len(idx2), dtype=bool)),
                "rid": rep["vec_id"].cast(pa.int64()),
                "embedding": _emb_f32(rep),
            }
        )

    _SCORED = pa.schema(
        [("query_id", pa.int64()), ("vec_id", pa.int64()), ("sim", pa.float64())]
    )

    def bucket_knn(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _SCORED.empty_table()
        cell = g["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        isq = g["is_query"].to_numpy(zero_copy_only=False)
        rid = g["rid"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _emb_matrix(g)
        # dtype=np.float32 halves memory traffic through the matmul and
        # the partition-dominated top-k (same rationale/caveat as
        # ann_brute_topk's dtype knob); float64 default stays
        # bit-compatible with the broadcast-query twin.
        m = (m / np.linalg.norm(m, axis=1, keepdims=True)).astype(
            dtype, copy=False
        )
        parts = []
        qrows_all = np.flatnonzero(isq)
        trows_all = np.flatnonzero(~isq)
        if len(qrows_all) == 0 or len(trows_all) == 0:
            return _SCORED.empty_table()
        # group both sides by cell via one lexsort each (no per-cell scan)
        qorder = qrows_all[np.argsort(cell[qrows_all], kind="stable")]
        torder = trows_all[np.argsort(cell[trows_all], kind="stable")]
        qcells, qstarts = np.unique(cell[qorder], return_index=True)
        tcells, tstarts = np.unique(cell[torder], return_index=True)
        qends = np.append(qstarts[1:], len(qorder))
        tends = np.append(tstarts[1:], len(torder))
        common, qi, ti = np.intersect1d(qcells, tcells, return_indices=True)
        for ci in range(len(common)):
            qr = qorder[qstarts[qi[ci]] : qends[qi[ci]]]
            tr = torder[tstarts[ti[ci]] : tends[ti[ci]]]
            qn, qv = m[qr], rid[qr]
            tn, tv = m[tr], rid[tr]
            # fixed-size tiles on both dims: constant-footprint temps
            # recycle through the malloc arena (rules 13/17).  Candidates
            # from all target tiles of a cell reduce LOCALLY to exactly
            # k per query (same ordering rule as the global merge) before
            # any Arrow row is emitted — without this the exchange is
            # k rows per query per TARGET TILE (~8x blowup measured as
            # 64M partial rows / 147 s at 100k x 1M; with it, k rows per
            # query per cell).
            for q0 in range(0, len(qr), tile):
                q1 = min(q0 + tile, len(qr))
                cq, cv, cs = [], [], []
                for t0 in range(0, len(tr), tile):
                    t1 = min(t0 + tile, len(tr))
                    sims = qn[q0:q1] @ tn[t0:t1].T
                    if exclude_self:
                        _mask_self(sims, tv[t0:t1], qv[q0:q1])
                    aq, av, as_ = _partial_topk_arrays(
                        qv[q0:q1], sims, tv[t0:t1], k
                    )
                    cq.append(aq)
                    cv.append(av)
                    cs.append(as_)
                lq, lv, ls = _local_topk_arrays(
                    np.concatenate(cq), np.concatenate(cv), np.concatenate(cs), k
                )
                parts.append(
                    pa.table(
                        {
                            "query_id": pa.array(lq),
                            "vec_id": pa.array(lv),
                            "sim": pa.array(ls),
                        }
                    )
                )
        if not parts:
            return _SCORED.empty_table()
        return pa.concat_tables(parts)

    tq = queries_ds.map_batches(
        with_broadcast(ref, tag_queries, "ivf_join_cent"),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    tt = targets_ds.map_batches(
        with_broadcast(ref, tag_targets, "ivf_join_cent"),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    scored = (
        tq.union(tt)
        .groupby("__bkt")
        .map_groups(bucket_knn, batch_format="pyarrow")
    )
    return _merge_topk(scored, k)


def emb_ivf_join(sf_dir: str, k: int = TOP_K, nprobe: int = 3):
    """IVF kNN join over the sf embeddings table: queries = every 41st
    vector (vec_id % 41 == 0), targets = all vectors, self-matches
    excluded; centroids from the deterministic streaming k-means.

    rows-only: the kmeans assignment is iterative, not SQL-expressible
    (same rationale as emb_ivf_knn / emb_semantic_dedup); gated by an
    exact replay of the probe/cell rule plus output-identity vs the
    broadcast-query ann_ivf_topk on the same inputs
    (tests/test_pipelines_misc.py)."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cent, _ = kmeans_fit(ds, k=SEMDEDUP_K, n_iters=5)

    def pick(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(ids % 41 == 0))

    queries = ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)
    return ann_ivf_join(
        queries, ds, cent, k=k, nprobe=nprobe, exclude_self=True
    )


def synth_vectors(ids: np.ndarray, dim: int = 64) -> np.ndarray:
    """Deterministic synthetic embeddings in [-1, 1] from integer ids
    (splitmix over id*dim+d) — the bench input generator.

    Computed in row chunks: the whole-matrix form materializes ~5
    matrices of (n, dim) int64/f64 temps in one go, and on this host
    fresh pages fault at up to ~0.5 ms each (CLAUDE.md rules 13/17) —
    measured 185 s/1M rows under a pressure wave, i.e. the generator
    cost more than the operator under measurement.  Fixed-size chunk
    temps are reused from the malloc arena (functions/allocator.py
    keeps them mapped); values bit-identical to the unchunked
    formula."""
    from ..functions.hashing import splitmix64

    n = len(ids)
    ids64 = ids.astype(np.int64)
    out = np.empty((n, dim), dtype=np.float64)
    step = 8192
    dd = np.arange(dim, dtype=np.int64)[None, :]
    for i in range(0, n, step):
        idx = ids64[i : i + step, None] * dim + dd
        h = splitmix64(idx.astype(np.uint64).ravel())
        u = (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)
        out[i : i + step] = (u * 2.0 - 1.0).reshape(-1, dim)
    return out


def synth_vectors_clustered(
    ids: np.ndarray, dim: int = 64, n_centers: int = 64, spread: float = 0.35
) -> np.ndarray:
    """Deterministic clustered embeddings: center[id % n_centers] +
    spread * noise(id) — the realistic (mixture) distribution where an
    IVF index actually concentrates neighbors; centers come from
    synth_vectors so the bench needs no data files."""
    centers = synth_vectors(np.arange(n_centers, dtype=np.int64) + 3_000_000, dim)
    centers = centers / np.linalg.norm(centers, axis=1, keepdims=True)
    noise = synth_vectors(ids.astype(np.int64) + 7_000_000, dim)
    return centers[ids.astype(np.int64) % n_centers] + spread * noise


# ---------------------------------------------------------------------------
# Distributed k-means (Lloyd's algorithm) — trains the IVF centroids
# instead of assuming synthetic ones.  Each iteration is ONE streaming
# pass: broadcast centroids -> per-batch assign (argmax matmul) ->
# per-batch partial (sum vectors + count per cluster) -> driver merge
# over k x n_blocks tiny partials (k is bounded -> CLAUDE.md rule 2).
#
# Partial sums accumulate in FIXED-POINT int64 (scale 2^32): integer
# addition is associative, so the fitted centroids are bit-identical
# under ANY partitioning / block order — same determinism device as
# the integer-cents oracle encoding.  Max |coord| ~1.4, 2^32 scale,
# ~1e9 rows/cluster before int64 risk: fine for every realistic shard.
# ---------------------------------------------------------------------------

_KMEANS_SCALE = float(1 << 32)


def _euclid_assign(m: np.ndarray, c: np.ndarray):
    """(assign, sqdist_to_assigned) under exact Euclidean distance via
    the matmul expansion ||m||^2 - 2 m.c + ||c||^2 — one BLAS call, no
    (n, k, dim) broadcast temp.  Ties break to the lowest cluster id
    (np.argmin), the same rule everywhere it is called."""
    d2 = (
        (m * m).sum(axis=1, keepdims=True)
        - 2.0 * (m @ c.T)
        + (c * c).sum(axis=1)[None, :]
    )
    assign = np.argmin(d2, axis=1)
    best = np.maximum(d2[np.arange(len(m)), assign], 0.0)
    return assign, best


def kmeans_fit(
    ds, k: int = 8, n_iters: int = 5, dim: int = EMB_DIM, seed: int = 0
):
    """Fit k cluster centroids over a (vec_id, embedding) Dataset.

    Returns (centroids (k, dim) float64, counts (k,) int64).  Init is
    deterministic (synth_vectors seeded by ``seed``); empty clusters
    keep their previous centroid.  Each iteration streams the dataset
    once; nothing but k x (dim+1) partials per block leaves a task."""
    import ray

    from ..stages.broadcast import with_broadcast

    cent = synth_vectors(np.arange(k, dtype=np.int64) + seed + 5_000_000, dim)
    cent = cent / np.linalg.norm(cent, axis=1, keepdims=True)

    _PART = pa.schema(
        [("cluster", pa.int64()), ("cnt", pa.int64()), ("sums", pa.list_(pa.int64()))]
    )

    def partials(state, t: pa.Table) -> pa.Table:
        c = state
        if t.num_rows == 0:
            return _PART.empty_table()
        m = _emb_matrix(t)
        assign = _euclid_assign(m, c)[0]
        fixed = np.round(m * _KMEANS_SCALE).astype(np.int64)
        sums = np.zeros((len(c), fixed.shape[1]), dtype=np.int64)
        np.add.at(sums, assign, fixed)
        cnt = np.bincount(assign, minlength=len(c)).astype(np.int64)
        keep = np.flatnonzero(cnt > 0)
        flat = pa.array(sums[keep].ravel())
        offs = pa.array(
            np.arange(0, (len(keep) + 1) * fixed.shape[1], fixed.shape[1]),
            type=pa.int32(),
        )
        return pa.table(
            {
                "cluster": pa.array(keep.astype(np.int64)),
                "cnt": pa.array(cnt[keep]),
                "sums": pa.ListArray.from_arrays(offs, flat),
            }
        )

    counts = np.zeros(k, dtype=np.int64)
    for _ in range(n_iters):
        ref = ray.put(cent)
        part = ds.map_batches(
            with_broadcast(ref, partials, "kmeans_assign"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        # driver merge: k x n_blocks rows of (cluster, cnt, int sums)
        tot_cnt = np.zeros(k, dtype=np.int64)
        tot_sum = np.zeros((k, dim), dtype=np.int64)
        for b in part.iter_batches(batch_size=None, batch_format="pyarrow"):
            if b.num_rows == 0:
                continue
            cl = b["cluster"].to_numpy(zero_copy_only=False).astype(np.int64)
            cn = b["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
            sm = (
                b["sums"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
                .astype(np.int64).reshape(len(cl), dim)
            )
            np.add.at(tot_cnt, cl, cn)
            np.add.at(tot_sum, cl, sm)
        nonempty = tot_cnt > 0
        new_cent = cent.copy()
        new_cent[nonempty] = (
            tot_sum[nonempty] / _KMEANS_SCALE
        ) / tot_cnt[nonempty, None]
        cent, counts = new_cent, tot_cnt
    return cent, counts


def emb_kmeans(sf_dir: str, k: int = 8, n_iters: int = 5):
    """Cluster the embeddings table with distributed k-means; returns
    the per-cluster summary (cluster, n_vecs, inertia_c) where
    inertia_c is the integer-cents-scaled sum of squared distances of
    members to their final centroid (partition-invariant by the same
    fixed-point argument as the fit).  rows-only: iterative Lloyd
    refinement is not SQL-expressible (documented in __ray_entry__ and
    tests/test_entry.py)."""
    import ray

    from ..stages.broadcast import with_broadcast

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cent, _ = kmeans_fit(ds, k=k, n_iters=n_iters)

    _OUT = pa.schema(
        [("cluster", pa.int64()), ("n_vecs", pa.int64()), ("inertia_c", pa.int64())]
    )

    def summarize(state, t: pa.Table) -> pa.Table:
        c = state
        if t.num_rows == 0:
            return _OUT.empty_table()
        m = _emb_matrix(t)
        assign, best = _euclid_assign(m, c)
        cents = np.round(best * 10000.0).astype(np.int64)  # 1e-4 fixed point
        inertia = np.zeros(len(c), dtype=np.int64)
        np.add.at(inertia, assign, cents)
        cnt = np.bincount(assign, minlength=len(c)).astype(np.int64)
        keep = np.flatnonzero(cnt > 0)
        return pa.table(
            {
                "cluster": pa.array(keep.astype(np.int64)),
                "n_vecs": pa.array(cnt[keep]),
                "inertia_c": pa.array(inertia[keep]),
            }
        )

    from .common import grouped_sum

    ref = ray.put(cent)
    per_batch = ds.map_batches(
        with_broadcast(ref, summarize, "kmeans_summary"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    out = grouped_sum(
        per_batch,
        ["cluster"],
        {"n_vecs": ("n_vecs", "sum"), "inertia_c": ("inertia_c", "sum")},
        merge="driver",
    )
    return out.sort("cluster")


# ---------------------------------------------------------------------------
# Per-dimension embedding statistics (feature-distribution audit)
# ---------------------------------------------------------------------------


def emb_dim_stats(sf_dir: str):
    """Per-dimension stats over the embedding matrix (n, sum, min, max
    per dim) — the feature-distribution audit a training pipeline runs
    before normalizing embeddings.  Floats are made oracle-exact by the
    integer-micros encoding (round(f64 * 1e6) as int64 on BOTH engines;
    the stored f32 promotes to the same f64 in numpy and DuckDB, so
    the rounding matches bit-for-bit).

    Scale shape: one per-batch numpy reduction emits d partial rows per
    batch; dims are bounded (d=64), so the merge is the driver fast
    path (CLAUDE.md rule 2) — zero all-to-all."""
    import pyarrow.compute as pc

    from .common import grouped_sum

    ds = read_table(sf_dir, "embeddings", columns=["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        m = _emb_matrix(t)  # (n, d) float64
        # floor(x + 0.5): round-half-up in BOTH engines (np.round would
        # be banker's rounding, DuckDB round() half-away — mismatch)
        s = np.floor(m * 1e6 + 0.5).astype(np.int64)
        d = s.shape[1]
        return pa.table(
            {
                "dim": pa.array(np.arange(d, dtype=np.int64)),
                "n": pa.array(np.full(d, s.shape[0], dtype=np.int64)),
                "sum_micros": pa.array(s.sum(axis=0)),
                "min_micros": pa.array(s.min(axis=0)),
                "max_micros": pa.array(s.max(axis=0)),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_sum(
        parts,
        ["dim"],
        {
            "n": ("n", "sum"),
            "sum_micros": ("sum_micros", "sum"),
            "min_micros": ("min_micros", "min"),
            "max_micros": ("max_micros", "max"),
        },
        merge="driver",
    )
    return out.sort("dim")


EMB_DIM_STATS_SQL = """
WITH e AS (
  SELECT unnest(embedding) AS v, generate_subscripts(embedding, 1) AS dim1
  FROM embeddings
)
SELECT CAST(dim1 - 1 AS BIGINT) AS dim,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(CAST(v AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_micros,
       CAST(min(CAST(floor(CAST(v AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
         AS min_micros,
       CAST(max(CAST(floor(CAST(v AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
         AS max_micros
FROM e
GROUP BY dim1
ORDER BY dim
"""


# ---------------------------------------------------------------------------
# Product-quantization ANN (Jegou, Douze & Schmid, TPAMI 2011 — public):
# the memory-bound scale path for similarity search.  Vectors compress
# to M sub-space code ids (M bytes-ish per vector instead of dim
# floats); queries score against codes via ADC lookup tables — the
# approximate dot product is a sum of M table gathers, no matmul
# against the raw matrix.  At 100 TB the raw embedding matrix cannot
# live in worker memory; the PQ codes (64x smaller at dim=64, M=8) can.
# ---------------------------------------------------------------------------

PQ_M_SUB = 32  # sub-spaces (dim 64 -> 2 dims each)
PQ_K_CODES = 256  # codewords per sub-space (8-bit codes, the standard)


def pq_fit(
    train: np.ndarray, m_sub: int = PQ_M_SUB, k_codes: int = PQ_K_CODES,
    n_iters: int = 10,
) -> np.ndarray:
    """Train PQ codebooks on a (n, dim) sample: independent Lloyd
    k-means per sub-space.  Deterministic: init picks k spread rows via
    splitmix indices; empty clusters keep their previous codeword; ties
    assign to the lowest code (same rule as _euclid_assign everywhere).
    Returns (m_sub, k_codes, dim // m_sub) float64.

    Codebooks are tiny global state (m*k*dsub doubles): train on a
    bounded driver-side sample, ship once via ray.put — never a shuffle.
    """
    from ..functions.hashing import splitmix64

    n, dim = train.shape
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    dsub = dim // m_sub
    idx = (splitmix64(np.arange(k_codes, dtype=np.uint64)) % np.uint64(n)).astype(
        np.int64
    )
    cbs = np.empty((m_sub, k_codes, dsub), dtype=np.float64)
    for m in range(m_sub):
        sub = np.ascontiguousarray(train[:, m * dsub : (m + 1) * dsub])
        sub32 = sub.astype(np.float32)
        cent = sub[idx].copy()
        for _ in range(n_iters):
            assign = _pq_assign(sub32, cent)
            # vectorized update: scatter-add sums + bincount (a per-code
            # boolean-mask loop is k_codes full scans per iteration)
            sums = np.zeros((k_codes, dsub), dtype=np.float64)
            np.add.at(sums, assign, sub)
            cnt = np.bincount(assign, minlength=k_codes)
            nz = cnt > 0
            cent[nz] = sums[nz] / cnt[nz, None]
        cbs[m] = cent
    return cbs


def _pq_assign(sub32: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """Nearest-codeword assignment via the dot trick (argmin ||x-c||^2 =
    argmax x.c - ||c||^2/2; ||x||^2 is constant per row) in float32 —
    no (n, k) float64 distance matrix, one small BLAS call + argmax.
    Ties break to the lowest code id (np.argmax first-max rule).

    Scalar sub-spaces (dsub == 1, the 64x1 quantization the 10M bench
    point uses) skip the (n, k) score matrix entirely: nearest center
    of a scalar is a searchsorted against the sorted centers — O(n log
    k) with ~n-element temps instead of a fresh 80 MB score matrix per
    sub-space per batch (the encode entry's whole footprint under the
    hypervisor's page-fault windows; CLAUDE.md rules 13/17/21)."""
    c32 = cent.astype(np.float32)
    if c32.shape[1] == 1:
        return _pq_assign_1d(np.ascontiguousarray(sub32[:, 0]), c32[:, 0])
    scores = sub32 @ c32.T
    scores -= 0.5 * (c32 * c32).sum(axis=1)[None, :]
    return np.argmax(scores, axis=1)


def _pq_assign_1d(x: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Exact scalar nearest-center assignment, ties to the LOWEST code
    id (both between equidistant neighbors and among duplicate center
    values — stable argsort keeps equal values in code-id order, so
    the 'left' duplicate of a value is its lowest id)."""
    order = np.argsort(c, kind="stable")
    cs = c[order]
    pos = np.searchsorted(cs, x)
    lo = np.clip(pos - 1, 0, len(cs) - 1)
    hi = np.clip(pos, 0, len(cs) - 1)
    dl = np.abs(x - cs[lo])
    dr = np.abs(x - cs[hi])
    il = order[np.searchsorted(cs, cs[lo], "left")]
    ir = order[np.searchsorted(cs, cs[hi], "left")]
    return np.where(
        dl < dr, il, np.where(dr < dl, ir, np.minimum(il, ir))
    ).astype(np.int64)


def pq_encode(m: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """(n, m_sub) int8 codes: nearest codeword per sub-space."""
    m_sub, _, dsub = codebooks.shape
    m32 = m.astype(np.float32)
    codes = np.empty((m.shape[0], m_sub), dtype=np.int64)
    for s in range(m_sub):
        sub = np.ascontiguousarray(m32[:, s * dsub : (s + 1) * dsub])
        codes[:, s] = _pq_assign(sub, codebooks[s])
    return codes


def ann_pq_topk(
    ds, qids: np.ndarray, qmat: np.ndarray, codebooks: np.ndarray,
    k: int = 10, exclude_self: bool = False, qchunk: int = 8192,
):
    """Approximate cosine top-k via PQ asymmetric distance computation:
    each batch encodes its vectors to (nb, m_sub) codes once, each
    query chunk computes per-sub-space lookup tables (LUT[s] =
    q_sub @ codebook[s].T), and the approximate similarity is the sum
    of m_sub row gathers — O(nb * m_sub) per query instead of
    O(nb * dim).  Partial top-k per batch bounds the exchange at
    ~k rows per (query, batch), same contract as ann_brute_topk; the
    global merge is the shared sort+segment _merge_topk.

    In production the encode happens ONCE at ingest (codes persisted as
    a column); re-encoding per scan here keeps the operator
    self-contained over the raw embeddings table."""
    import ray

    from ..stages.broadcast import with_broadcast

    qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    m_sub, k_codes, dsub = codebooks.shape
    qn32 = qn.astype(np.float32)
    cbs32 = codebooks.astype(np.float32)
    ref = ray.put((np.asarray(qids, dtype=np.int64), qn32, cbs32, codebooks))

    def score(state, t: pa.Table) -> pa.Table:
        qids, qn32, cbs32, cbs = state
        empty = pa.schema(
            [("query_id", pa.int64()), ("vec_id", pa.int64()), ("sim", pa.float64())]
        ).empty_table()
        if t.num_rows == 0:
            return empty
        m = _emb_matrix(t)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        vid = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        codes = pq_encode(m, cbs)
        nb = len(vid)
        dim = cbs32.shape[0] * cbs32.shape[2]
        dsub = cbs32.shape[2]
        # DECODE + BLAS instead of per-sub-space LUT gathers: the
        # quantized similarity sum_s LUT_s[code_s] equals q . x_hat
        # where x_hat concatenates the assigned codewords, so one sgemm
        # against the reconstructed batch gives the same quantity
        # (up to float addition order; ranks tie-break by vec_id).
        # LUT gathers move O(nb * nq * m_sub) bytes of random rows —
        # memory-bound and ~10x slower at 32 concurrent workers —
        # while the decode is O(nb * dim) + a compute-dense matmul.
        # (LUT-gather ADC wins only when nq is tiny per scan AND the
        # decode itself dominates, i.e. dim >> m_sub; not at dim 64.)
        xhat = np.empty((nb, dim), dtype=np.float32)
        for s in range(cbs32.shape[0]):
            xhat[:, s * dsub : (s + 1) * dsub] = cbs32[s][codes[:, s]]
        nq = len(qids)
        parts = []
        for lo in range(0, nq, qchunk):
            hi = min(lo + qchunk, nq)
            sims = (qn32[lo:hi] @ xhat.T).astype(np.float64)  # query-major
            if exclude_self:
                _mask_self(sims, vid, qids[lo:hi])
            parts.append(_partial_topk_rows(qids[lo:hi], sims, vid, k))
        return pa.concat_tables(parts) if parts else empty

    scored = ds.map_batches(
        with_broadcast(ref, score, "ann_pq"), batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return _merge_topk(scored, k)


def emb_pq_knn(sf_dir: str):
    """PQ-ADC approximate top-5 over the embeddings table (rows-only:
    quantized scores have no SQL twin; recall is gated in tests and the
    shape contract — one rank 1..k row per query — is asserted here)."""
    t = read_table_local(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    train = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"]])
    train = train / np.linalg.norm(train, axis=1, keepdims=True)
    cbs = pq_fit(train)
    qids, qn = _queries_payload(sf_dir)
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ann_pq_topk(ds, qids, qn, cbs, k=TOP_K, exclude_self=True)


def ann_ivfpq_topk(
    ds, qids: np.ndarray, qmat: np.ndarray, centroids: np.ndarray,
    codebooks: np.ndarray, k: int = 10, nprobe: int = 8,
    exclude_self: bool = False,
):
    """IVF-PQ: the composed billion-scale ANN path (FAISS's IVFADC
    shape, Jegou et al. 2011) — IVF cell partitioning prunes the
    candidate set to the probed cells (compute bound), PQ codes stand
    in for the raw vectors (memory bound: 32 B/vector).  Per batch:
    one cell assignment + one PQ encode, then per probed cell a
    decode+sgemm against only that cell's probing queries (the same
    cell-inverted structure as ann_ivf_topk — no per-query Python).
    Exchange bounded at ~k rows per (query, batch) by the per-batch
    partial top-k; merge via the shared sort+segment path."""
    import ray

    from ..stages.broadcast import with_broadcast

    qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    cent = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    qcells = np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]
    n_cells = len(cent)
    probes = [np.flatnonzero((qcells == c).any(axis=1)) for c in range(n_cells)]
    qn32 = qn.astype(np.float32)
    cbs32 = codebooks.astype(np.float32)
    ref = ray.put(
        (np.asarray(qids, dtype=np.int64), qn32, cent, probes, cbs32, codebooks)
    )

    def score(state, t: pa.Table) -> pa.Table:
        qids, qn32, cent, probes, cbs32, cbs = state
        empty = pa.schema(
            [("query_id", pa.int64()), ("vec_id", pa.int64()), ("sim", pa.float64())]
        ).empty_table()
        if t.num_rows == 0:
            return empty
        m = _emb_matrix(t)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        vid = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cell = np.argmax(m @ cent.T, axis=1)
        codes = pq_encode(m, cbs)
        dsub = cbs32.shape[2]
        dim = cbs32.shape[0] * dsub
        xhat = np.empty((len(vid), dim), dtype=np.float32)
        for s in range(cbs32.shape[0]):
            xhat[:, s * dsub : (s + 1) * dsub] = cbs32[s][codes[:, s]]
        parts = []
        for c in np.unique(cell):
            qsel = probes[int(c)]
            if len(qsel) == 0:
                continue
            rows = np.flatnonzero(cell == c)
            sims = (qn32[qsel] @ xhat[rows].T).astype(np.float64)
            if exclude_self:
                _mask_self(sims, vid[rows], qids[qsel])
            parts.append(_partial_topk_rows(qids[qsel], sims, vid[rows], k))
        if not parts:
            return empty
        return pa.concat_tables(parts)

    scored = ds.map_batches(
        with_broadcast(ref, score, "ann_ivfpq"), batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return _merge_topk(scored, k)


def emb_ivfpq_knn(sf_dir: str, n_cells: int = 8, nprobe: int = 3):
    """IVF-PQ approximate top-5 (rows-only: quantized + pruned scores
    have no SQL twin; recall gated in tests).  Centroids = first
    n_cells vectors (deterministic, same rule as emb_ivf_knn);
    codebooks trained on the local table."""
    head = (
        read_table_local(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        .sort_values("vec_id")
    )
    cent = np.stack(
        [np.asarray(v, dtype=np.float64) for v in head.head(n_cells)["embedding"]]
    )
    train = np.stack([np.asarray(v, dtype=np.float64) for v in head["embedding"]])
    train = train / np.linalg.norm(train, axis=1, keepdims=True)
    cbs = pq_fit(train)
    qids, qn = _queries_payload(sf_dir)
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ann_ivfpq_topk(
        ds, qids, qn, cent, cbs, k=TOP_K, nprobe=nprobe, exclude_self=True
    )


def pq_encode_dataset(ds, codebooks: np.ndarray):
    """Encode a (vec_id, embedding) Dataset into the persisted-codes
    shape: (vec_id, codes list<int8-ish>) — the encode-at-ingest step.
    Codes are 1 byte of information per sub-space (k<=256); stored
    int16 for Arrow simplicity, still ~16x smaller than the raw
    float32 matrix at dim 64 / m_sub 32."""
    import ray
    import pyarrow.compute as pc

    from ..stages.broadcast import with_broadcast

    ref = ray.put(codebooks)

    def encode(state, t: pa.Table) -> pa.Table:
        cbs = state
        empty = pa.schema(
            [("vec_id", pa.int64()), ("codes", pa.list_(pa.int16()))]
        ).empty_table()
        if t.num_rows == 0:
            return empty
        m = _emb_matrix(t)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        codes = pq_encode(m, cbs).astype(np.int16)
        n, msub = codes.shape
        offs = pa.array(np.arange(0, (n + 1) * msub, msub, dtype=np.int32))
        return pa.table(
            {
                "vec_id": pc.cast(t["vec_id"], pa.int64()),
                "codes": pa.ListArray.from_arrays(offs, pa.array(codes.ravel())),
            }
        )

    return ds.map_batches(
        with_broadcast(ref, encode, "pq_encode"), batch_format="pyarrow",
        zero_copy_batch=True,
    )


def ann_pq_codes_topk(
    codes_ds, qids: np.ndarray, qmat: np.ndarray, codebooks: np.ndarray,
    k: int = 10, exclude_self: bool = False, qchunk: int = 8192,
):
    """Approximate cosine top-k scanning a PERSISTED codes table
    (vec_id, codes) — the production shape where encoding happened once
    at ingest and the scan never touches raw embeddings: per batch it
    decodes codes -> x_hat and runs one sgemm, so the table read moves
    ~16x fewer bytes than the raw-matrix scan.  Scores are identical to
    ann_pq_topk over the raw table (same codebooks, same codes)."""
    import ray

    from ..stages.broadcast import with_broadcast

    qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    qn32 = qn.astype(np.float32)
    cbs32 = codebooks.astype(np.float32)
    ref = ray.put((np.asarray(qids, dtype=np.int64), qn32, cbs32))

    def score(state, t: pa.Table) -> pa.Table:
        qids, qn32, cbs32 = state
        empty = pa.schema(
            [("query_id", pa.int64()), ("vec_id", pa.int64()), ("sim", pa.float64())]
        ).empty_table()
        if t.num_rows == 0:
            return empty
        col = t["codes"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        msub = cbs32.shape[0]
        codes = (
            col.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
            .reshape(len(col), msub)
        )
        vid = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        dsub = cbs32.shape[2]
        xhat = np.empty((len(vid), msub * dsub), dtype=np.float32)
        for s in range(msub):
            xhat[:, s * dsub : (s + 1) * dsub] = cbs32[s][codes[:, s]]
        nq = len(qids)
        parts = []
        for lo in range(0, nq, qchunk):
            hi = min(lo + qchunk, nq)
            sims = (qn32[lo:hi] @ xhat.T).astype(np.float64)
            if exclude_self:
                _mask_self(sims, vid, qids[lo:hi])
            parts.append(_partial_topk_rows(qids[lo:hi], sims, vid, k))
        return pa.concat_tables(parts) if parts else empty

    scored = codes_ds.map_batches(
        with_broadcast(ref, score, "ann_pq_codes"), batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return _merge_topk(scored, k)


def ann_pq_refine_topk(
    codes_ds, raw_ds, qids: np.ndarray, qmat: np.ndarray,
    codebooks: np.ndarray, k: int = 10, refine: int = 4,
    exclude_self: bool = False,
):
    """PQ shortlist + EXACT re-rank (FAISS's IndexRefineFlat shape):
    pass 1 scans the compressed codes table for a ``refine * k``
    candidate shortlist per query (16x fewer bytes read than raw);
    pass 2 streams the RAW table once, rescoring ONLY shortlisted
    (query, vector) pairs with exact float64 cosine, and keeps the
    true top-k of the shortlist.

    Whenever the shortlist contains the true top-k (it does with
    mild over-fetch — recall at refine=4 measured 1.0 on the
    clustered synth where the PQ-only scan gets 0.975), the result is
    bit-equal to exact brute force — tested by the full-refine
    equality gate in tests/test_pipelines_misc.py.

    Scale shape: the shortlist is nq x refine x k id pairs — bounded
    by the (already broadcast-bounded) query count, never by corpus
    size; it broadcasts sorted-by-vec_id so pass 2 semi-joins each raw
    batch via two searchsorted probes and rescans nothing else.  Per
    batch the rescoring work is |matched pairs| row-wise dots (one
    einsum), not a matmul."""
    import ray

    from ..stages.broadcast import with_broadcast

    short = ann_pq_codes_topk(
        codes_ds, qids, qmat, codebooks, k=refine * k,
        exclude_self=exclude_self,
    )
    # bounded materialization: nq x refine x k id pairs
    st = short.to_pandas()
    pair_q = st["query_id"].to_numpy().astype(np.int64)
    pair_v = st["neighbor_id"].to_numpy().astype(np.int64)
    # map query ids -> row index in the broadcast matrix
    qids = np.asarray(qids, dtype=np.int64)
    qorder = np.argsort(qids, kind="stable")
    qrow = qorder[np.searchsorted(qids[qorder], pair_q)]
    vorder = np.argsort(pair_v, kind="stable")
    pv, pq_ = pair_v[vorder], qrow[vorder]
    qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    ref = ray.put((qids, qn, pv, pq_))

    _SCORED = pa.schema(
        [("query_id", pa.int64()), ("vec_id", pa.int64()), ("sim", pa.float64())]
    )

    def rescore(state, t: pa.Table) -> pa.Table:
        qids, qn, pv, pq_ = state
        if t.num_rows == 0:
            return _SCORED.empty_table()
        vid = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lo = np.searchsorted(pv, vid, "left")
        hi = np.searchsorted(pv, vid, "right")
        cnt = hi - lo
        total = int(cnt.sum())
        if total == 0:
            return _SCORED.empty_table()
        rows = np.repeat(np.arange(len(vid), dtype=np.int64), cnt)
        offs = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(cnt) - cnt, cnt
        )
        pidx = np.repeat(lo, cnt) + offs
        m = _emb_matrix(t)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        qsel = pq_[pidx]
        sims = np.einsum("ij,ij->i", qn[qsel], m[rows])
        return pa.table(
            {
                "query_id": pa.array(qids[qsel]),
                "vec_id": pa.array(vid[rows]),
                "sim": pa.array(sims),
            }
        )

    scored = raw_ds.map_batches(
        with_broadcast(ref, rescore, "pq_refine_pairs"),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return _merge_topk(scored, k)


def emb_pq_refine_knn(sf_dir: str, refine: int = 4):
    """PQ shortlist + exact re-rank over the sf embeddings table.

    rows-only: PQ-quantized shortlist (same rationale as emb_pq_knn);
    gated by the full-refine brute-equality + recall tests
    (tests/test_pipelines_misc.py)."""
    t = read_table_local(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    train = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"]])
    train = train / np.linalg.norm(train, axis=1, keepdims=True)
    cbs = pq_fit(train)
    qids, qn = _queries_payload(sf_dir)
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    codes = pq_encode_dataset(ds, cbs)
    return ann_pq_refine_topk(
        codes, ds, qids, qn, cbs, k=TOP_K, refine=refine, exclude_self=True
    )


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup shape, Abbas et al. 2023): k-means-cluster
# the embedding space, then near-dup-filter WITHIN each cluster only —
# the O(n^2) cosine comparison collapses to O(sum n_c^2), and each
# cluster dedups independently (the cross-cluster misses are the
# method's documented recall tradeoff, not a bug).
# ---------------------------------------------------------------------------

SEMDEDUP_THRESHOLD = NEARDUP_THRESHOLD
SEMDEDUP_K = 8


def emb_semantic_dedup(
    sf_dir: str,
    k: int = SEMDEDUP_K,
    n_iters: int = 5,
    threshold: float = SEMDEDUP_THRESHOLD,
    chunk: int = 2048,
):
    """Per-cluster keep-first cosine dedup over k-means buckets.

    Drop rule (deterministic, order-free): vector v is dropped iff some
    u in the SAME cluster has u.vec_id < v.vec_id and cosine(u, v) >=
    threshold — "earlier wins", independent of u's own drop status (the
    same winner-min convention as docs_paragraph_dedup).  Output is one
    row per vector: (vec_id, cluster, kept).

    Scale design: centroids are fit with the streaming kmeans_fit
    (k x (dim+1) partials per block), assignment is one broadcast
    matmul per batch, and the per-cluster comparison runs inside
    groupby(cluster).map_groups — BOUNDED group count (k), CLAUDE.md
    rule 1 — in fixed (chunk, chunk) tiles over the id-ordered prefix,
    so a hot cluster costs chunk^2 peak temp memory (constant-size,
    arena-recycled; rules 13/17), never n_c^2 at once.
    rows-only: the kmeans assignment is iterative, not SQL-expressible
    (documented in __ray_entry__ and tests/test_entry.py); gated by an
    exact brute-force replay + repartition-invariance test
    (tests/test_pipelines_misc.py).
    """
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return semantic_dedup(
        ds, k=k, n_iters=n_iters, threshold=threshold, chunk=chunk
    )


def semantic_dedup(
    ds,
    k: int = SEMDEDUP_K,
    n_iters: int = 5,
    threshold: float = SEMDEDUP_THRESHOLD,
    chunk: int = 2048,
):
    """Dataset-level SemDeDup operator (see emb_semantic_dedup).  At
    corpus scale size ``k`` so n/k keeps the per-cluster O(n_c^2)
    comparison tractable (SemDeDup's own knob: more, smaller clusters
    trade cross-cluster recall for quadratic-term control)."""
    import ray

    from ..stages.broadcast import with_broadcast

    cent, _ = kmeans_fit(ds, k=k, n_iters=n_iters)

    _ASSIGNED = pa.schema(
        [
            ("cluster", pa.int64()),
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
        ]
    )

    def assign(state, t: pa.Table) -> pa.Table:
        c = state
        if t.num_rows == 0:
            return _ASSIGNED.empty_table()
        m = _emb_matrix(t)
        a = _euclid_assign(m, c)[0]
        col = t["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pa.table(
            {
                "cluster": pa.array(a.astype(np.int64)),
                "vec_id": t["vec_id"],
                "embedding": col,
            }
        )

    _OUT = pa.schema(
        [("vec_id", pa.int64()), ("cluster", pa.int64()), ("kept", pa.bool_())]
    )

    def dedup_group(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return _OUT.empty_table()
        ids = g["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        m = _emb_matrix(g)[order]
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        dropped = np.zeros(n, dtype=bool)
        # BOTH matmul dims are tiled at the fixed edge ``chunk`` so every
        # sims / hit temp has the same (chunk, chunk) footprint and the
        # malloc arena recycles it across tiles, groups and tasks.  The
        # previous growing (chunk, n_c) slab against the whole prefix
        # re-paid ~0.5 ms/page first-touch faults on every fresh temp
        # (CLAUDE.md rules 13/17): one 8k group measured 51 s cold vs
        # 0.7 s warm — the math is identical, only the temp shape
        # changed.  Off-diagonal tiles are entirely "earlier" columns;
        # only the diagonal tile needs the strict-lower-triangle mask.
        tri = np.tril(np.ones((min(chunk, n),) * 2, dtype=bool), -1)
        for r0 in range(0, n, chunk):
            r1 = min(r0 + chunk, n)
            acc = np.zeros(r1 - r0, dtype=bool)
            for c0 in range(0, r1, chunk):
                c1 = min(c0 + chunk, r1)
                sims = mn[r0:r1] @ mn[c0:c1].T
                hit = sims >= threshold
                if c0 == r0:  # diagonal tile: only cols j < i count
                    hit &= tri[: r1 - r0, : c1 - c0]
                acc |= hit.any(axis=1)
            dropped[r0:r1] = acc
        cluster = int(g["cluster"][0].as_py())
        return pa.table(
            {
                "vec_id": pa.array(ids),
                "cluster": pa.array(np.full(n, cluster, dtype=np.int64)),
                "kept": pa.array(~dropped),
            }
        )

    ref = ray.put(cent)
    assigned = ds.map_batches(
        with_broadcast(ref, assign, "semdedup_assign"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return (
        assigned.groupby("cluster")
        .map_groups(dedup_group, batch_format="pyarrow")
        .sort("vec_id")
    )


# ---------------------------------------------------------------------------
# Distributed PCA (top principal component) by power iteration — the
# iterative-linear-algebra surface beyond k-means: each iteration is
# ONE streaming pass computing w = X^T (X v) from per-batch partials.
# Partials accumulate in FIXED-POINT int64 per ROW (scale 2^32, the
# k-means determinism device): integer addition is associative, so the
# fitted component is bit-identical under ANY partitioning or block
# order.  Only a dim-length vector leaves each block; the driver
# normalizes (and fixes the sign to the largest-|coord| positive) —
# rows-only entry (float eigenvector; gated by invariance + agreement
# tests vs a local eigensolve).  The synth embeddings are nearly
# isotropic (top eigen-gap ~1.07), so convergence needs ~64 passes —
# each pass streams once and ships only dim-length partials, so
# iteration count, not data volume, is the cost.
# ---------------------------------------------------------------------------

_PCA_SCALE = float(1 << 32)


def pca_power_fit(ds, n_iters: int = 64, dim: int = EMB_DIM, seed: int = 0):
    """Top principal direction (uncentered second moment — add a
    centering pass upstream if means matter) of the ``embedding``
    column.  Returns (v (dim,) float64 unit, lam float64) where
    lam = v.(X^T X v)/n along the way."""
    import ray

    from ..stages.broadcast import with_broadcast

    v = synth_vectors(np.arange(1, dtype=np.int64) + seed + 9_000_000, dim)[0]
    v = v / np.linalg.norm(v)

    _PART = pa.schema([("sums", pa.list_(pa.int64())), ("n", pa.int64())])

    def partials(state, t: pa.Table) -> pa.Table:
        vv = state
        if t.num_rows == 0:
            return _PART.empty_table()
        m = _emb_matrix(t).astype(np.float64)
        d = m @ vv
        fixed = np.round(m * d[:, None] * _PCA_SCALE).astype(np.int64)
        s = fixed.sum(axis=0)
        return pa.table(
            {
                "sums": pa.ListArray.from_arrays(
                    pa.array([0, dim], type=pa.int32()), pa.array(s)
                ),
                "n": pa.array([t.num_rows], pa.int64()),
            }
        )

    lam = 0.0
    n_total = 0
    for _ in range(n_iters):
        ref = ray.put(v)
        part = ds.map_batches(
            with_broadcast(ref, partials, "pca_power"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        tot = np.zeros(dim, dtype=np.int64)
        n_total = 0
        for b in part.iter_batches(batch_size=None, batch_format="pyarrow"):
            if b.num_rows == 0:
                continue
            sm = (
                b["sums"].combine_chunks().flatten()
                .to_numpy(zero_copy_only=False).astype(np.int64)
                .reshape(b.num_rows, dim)
            )
            tot += sm.sum(axis=0)
            n_total += int(b["n"].to_numpy().sum())
        w = tot / _PCA_SCALE
        lam = float(v @ w) / max(n_total, 1)
        nrm = np.linalg.norm(w)
        if nrm == 0.0:
            break
        v = w / nrm
    # deterministic sign: largest-|coordinate| positive
    j = int(np.argmax(np.abs(v)))
    if v[j] < 0:
        v = -v
    return v, lam


def emb_pca_power(sf_dir: str, n_iters: int = 64):
    """rows-only: per-dim top principal component in fixed-point 1e9
    plus the Rayleigh-quotient eigenvalue estimate — floats are not
    SQL-hashable; gated by bit-identical partition invariance and
    >=0.99 agreement with a driver-local eigensolve in tests."""
    import ray.data

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    v, lam = pca_power_fit(ds, n_iters=n_iters)
    out = pa.table(
        {
            "dim": pa.array(np.arange(len(v), dtype=np.int64)),
            "comp_fp": pa.array(np.round(v * 1e9).astype(np.int64)),
            "lam_fp": pa.array(
                np.full(len(v), round(lam * 1e9), dtype=np.int64)
            ),
        }
    )
    return ray.data.from_arrow(out)


# ---------------------------------------------------------------------------
# Scalar quantization (SQ8, FAISS IndexScalarQuantizer shape): per-dim
# min/max train pass -> uint8 codes (4x memory reduction vs f32, 8x vs
# f64) -> decode-at-score.  Completes the compression family next to
# PQ/IVF-PQ: SQ trades less compression for near-lossless recall and
# needs no codebook training.  The decode stage streams the codes
# table back into the EXACT generic top-k operator, so all the
# bounded-exchange/merge machinery is reused as-is.
# ---------------------------------------------------------------------------


def sq_fit(ds, dim: int = EMB_DIM):
    """Per-dimension (min, max) over the embedding column — one
    streaming pass of per-batch partial extrema, driver-combined
    (dim-length arrays; order-free, so partition-invariant)."""
    _PART = pa.schema([("mins", pa.list_(pa.float64())), ("maxs", pa.list_(pa.float64()))])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _PART.empty_table()
        m = _emb_matrix(t).astype(np.float64)
        offs = pa.array([0, m.shape[1]], type=pa.int32())
        return pa.table(
            {
                "mins": pa.ListArray.from_arrays(offs, pa.array(m.min(axis=0))),
                "maxs": pa.ListArray.from_arrays(offs, pa.array(m.max(axis=0))),
            }
        )

    vmin = np.full(dim, np.inf)
    vmax = np.full(dim, -np.inf)
    for b in ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_size=None, batch_format="pyarrow"):
        if b.num_rows == 0:
            continue
        mn = b["mins"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
        mx = b["maxs"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
        vmin = np.minimum(vmin, mn.reshape(b.num_rows, dim).min(axis=0))
        vmax = np.maximum(vmax, mx.reshape(b.num_rows, dim).max(axis=0))
    return vmin, vmax


def sq_encode_dataset(ds, vmin: np.ndarray, vmax: np.ndarray):
    """(vec_id, code list<uint8>) — round((x-min)/(max-min)*255),
    degenerate dims (max == min) encode to 0."""
    import ray

    from ..stages.broadcast import with_broadcast

    span = np.where(vmax > vmin, vmax - vmin, 1.0)
    ref = ray.put((vmin, span))

    def encode(state, t: pa.Table) -> pa.Table:
        vmin, span = state
        if t.num_rows == 0:
            return pa.schema(
                [("vec_id", pa.int64()), ("code", pa.list_(pa.uint8()))]
            ).empty_table()
        m = _emb_matrix(t).astype(np.float64)
        q = np.clip(np.round((m - vmin) / span * 255.0), 0, 255).astype(np.uint8)
        offs = pa.array(
            np.arange(0, (t.num_rows + 1) * m.shape[1], m.shape[1], dtype=np.int32)
        )
        vid = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "vec_id": pa.array(vid),
                "code": pa.ListArray.from_arrays(offs, pa.array(q.ravel())),
            }
        )

    return ds.map_batches(
        with_broadcast(ref, encode, "sq_encode"), batch_format="pyarrow",
        zero_copy_batch=True,
    )


def sq_decoded_view(codes_ds, vmin: np.ndarray, vmax: np.ndarray, dim: int = EMB_DIM):
    """Streaming decode of an SQ8 codes table back to (vec_id,
    embedding) — feeds the exact generic operators unchanged."""
    import ray

    from ..stages.broadcast import with_broadcast

    span = np.where(vmax > vmin, vmax - vmin, 1.0)
    ref = ray.put((vmin, span))

    def decode(state, t: pa.Table) -> pa.Table:
        vmin, span = state
        if t.num_rows == 0:
            return pa.schema(
                [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32()))]
            ).empty_table()
        col = t["code"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        q = col.flatten().to_numpy(zero_copy_only=False).reshape(t.num_rows, dim)
        x = (q.astype(np.float64) / 255.0 * span + vmin).astype(np.float32)
        offs = pa.array(
            np.arange(0, (t.num_rows + 1) * dim, dim, dtype=np.int32)
        )
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "embedding": pa.ListArray.from_arrays(offs, pa.array(x.ravel())),
            }
        )

    return codes_ds.map_batches(
        with_broadcast(ref, decode, "sq_decode"), batch_format="pyarrow",
        zero_copy_batch=True,
    )


def emb_sq_knn(sf_dir: str):
    """SQ8 approximate top-5 (rows-only: quantized scores; recall vs
    brute is gated in tests): train extrema -> encode to uint8 codes ->
    streaming decode -> the EXACT generic top-k operator."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    vmin, vmax = sq_fit(ds)
    codes = sq_encode_dataset(ds, vmin, vmax)
    decoded = sq_decoded_view(codes, vmin, vmax)
    qids, qn = _queries_payload(sf_dir)
    return ann_brute_topk(decoded, qids, qn, k=TOP_K, exclude_self=True)


# ---------------------------------------------------------------------------
# MMR diversified top-k (Carbonell & Goldstein, SIGIR 1998) — the
# diversified-retrieval / training-data-selection operator: greedy
# re-rank balancing relevance to the query against redundancy with the
# already-selected set, score = lam*cos(q,d) - (1-lam)*max_sel cos(d,s).
# Engine shape: the part that touches every corpus vector is the
# DISTRIBUTED exact shortlist (ann_brute_topk: bounded k-rows/query/
# batch exchange, chunked matmul); the greedy loop then runs on the
# BOUNDED n_queries x shortlist candidate set, whose vectors are
# fetched by one broadcast-membership filter scan — never a full
# materialize.  Deterministic vec_id tie-breaks; rows-only (greedy
# float argmax chains are not SQL-expressible), golden-pinned +
# invariance-tested.
# ---------------------------------------------------------------------------

MMR_LAMBDA = 0.7
MMR_SHORTLIST = 50


def emb_mmr_topk(
    sf_dir: str,
    k: int = TOP_K,
    shortlist: int = MMR_SHORTLIST,
    lam: float = MMR_LAMBDA,
):
    import ray

    from ..stages.broadcast import with_broadcast

    qids, qn = _queries_payload(sf_dir)
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    short = ann_brute_topk(ds, qids, qn, k=shortlist, exclude_self=True).to_pandas()
    need = np.unique(short["neighbor_id"].values.astype(np.int64))
    ref = ray.put(need)

    def pick(state, t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) == 0 or len(state) == 0:
            return t.slice(0, 0)
        pos = np.clip(np.searchsorted(state, ids), 0, len(state) - 1)
        return t.filter(pa.array(state[pos] == ids))

    cand = pa.concat_tables(
        ds.map_batches(
            with_broadcast(ref, pick), batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_size=None, batch_format="pyarrow")
    )
    cid = cand["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    cmat = _emb_matrix(cand)
    cmat = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)
    row_of = {int(v): i for i, v in enumerate(cid)}

    out_q, out_n, out_r = [], [], []
    for qi, qvec in zip(qids, qn):
        mine = short[short["query_id"] == qi]
        ids = mine["neighbor_id"].values.astype(np.int64)
        V = cmat[[row_of[int(v)] for v in ids]]
        rel = V @ qvec
        remaining = np.arange(len(ids))
        max_div = np.zeros(len(ids))
        for r in range(min(k, len(ids))):
            score = lam * rel[remaining] - (1.0 - lam) * max_div[remaining]
            # argmax with deterministic vec_id tie-break
            j = remaining[np.lexsort((ids[remaining], -score))[0]]
            out_q.append(int(qi))
            out_n.append(int(ids[j]))
            out_r.append(r + 1)
            remaining = remaining[remaining != j]
            if len(remaining) == 0:
                break
            max_div[remaining] = np.maximum(
                max_div[remaining], V[remaining] @ V[j]
            )
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "mmr_rank": pa.array(out_r, pa.int64()),
        }
    )
