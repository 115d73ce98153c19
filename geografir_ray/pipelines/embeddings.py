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
    similarity stays engine-internal so the value-hash is exact."""
    import ray

    qids, qn = _queries_payload(sf_dir)
    ref = ray.put((qids, qn))

    from ..stages.broadcast import with_broadcast

    def score(state, t: pa.Table) -> pa.Table:
        qids, qn = state
        m = _emb_matrix(t)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ qn.T  # (batch, nq)
        vid = t["vec_id"].to_numpy(zero_copy_only=False)
        out_q = np.repeat(qids, len(vid))
        out_v = np.tile(vid, len(qids))
        out_s = sims.T.ravel()
        keep = out_q != out_v  # exclude self
        return pa.table(
            {
                "query_id": pa.array(out_q[keep]),
                "vec_id": pa.array(out_v[keep]),
                "sim": pa.array(out_s[keep]),
            }
        )

    scored = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"]).map_batches(
        with_broadcast(ref, score, "cosine_score"), batch_format="pyarrow",
        zero_copy_batch=True,
    )

    # per-query top-k merge: groupby(query) over per-batch candidates.
    # Scale path: a per-batch partial top-k before the shuffle bounds
    # the exchange at k rows per query per batch.
    import pandas as pd

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True], kind="mergesort").head(
            TOP_K
        )
        return pd.DataFrame(
            {
                "query_id": g["query_id"].values.astype(np.int64),
                "neighbor_id": g["vec_id"].values.astype(np.int64),
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
            }
        )

    return (
        scored.groupby("query_id")
        .map_groups(topk, batch_format="pandas")
        .sort(["query_id", "rank"])
    )


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
    import pandas as pd

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

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:  # typed empty block (CLAUDE.md rule 8)
            return pd.DataFrame(
                {
                    "label": pd.Series([], dtype=np.int64),
                    "n": pd.Series([], dtype=np.int64),
                    "centroid_norm_pct": pd.Series([], dtype=np.int64),
                }
            )
        n = int(g["n"].sum())
        vsum = np.sum(np.stack([np.asarray(v) for v in g["vec_sum"]]), axis=0)
        centroid = vsum / n
        return pd.DataFrame(
            {
                "label": [np.int64(g["label"].iloc[0])],
                "n": [np.int64(n)],
                "centroid_norm_pct": [np.int64(np.floor(np.linalg.norm(centroid) * 100))],
            }
        )

    return partials.groupby("label").map_groups(merge, batch_format="pandas").sort("label")


# ---------------------------------------------------------------------------
# IVF-bucketed ANN (scale path, rows-only): deterministic centroids from
# the first C vectors; probe nprobe nearest buckets per query.
# ---------------------------------------------------------------------------


def emb_ivf_knn(sf_dir: str, n_cells: int = 8, nprobe: int = 3):
    import pandas as pd
    import ray

    full = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    # deterministic "training": centroids = first n_cells vectors (seeded
    # kmeans++ would need iteration; init-only keeps it reproducible)
    head = read_table_local(sf_dir, "embeddings", columns=["vec_id", "embedding"]).sort_values("vec_id").head(n_cells)
    cent = np.stack([np.asarray(v, dtype=np.float64) for v in head["embedding"]])
    cent = cent / np.linalg.norm(cent, axis=1, keepdims=True)
    qids, qn = _queries_payload(sf_dir)
    # queries probe their nprobe nearest cells
    qcells = np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]
    ref = ray.put((qids, qn, cent, qcells))

    from ..stages.broadcast import with_broadcast

    def assign(state, t: pa.Table) -> pa.Table:
        qids, qn, cent_m, qcells = state
        m = _emb_matrix(t)
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        cell = np.argmax(mn @ cent_m.T, axis=1)
        vid = t["vec_id"].to_numpy(zero_copy_only=False)
        # emit candidates only for (query, vector-in-probed-cell)
        out_q, out_v, out_s = [], [], []
        sims = mn @ qn.T  # (batch, nq)
        for qi in range(len(qids)):
            probe = np.isin(cell, qcells[qi])
            probe &= vid != qids[qi]
            out_q.append(np.full(int(probe.sum()), qids[qi], dtype=np.int64))
            out_v.append(vid[probe])
            out_s.append(sims[probe, qi])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v)),
                "sim": pa.array(np.concatenate(out_s)),
            }
        )

    scored = full.map_batches(
        with_broadcast(ref, assign, "ivf_assign"), batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True], kind="mergesort").head(
            TOP_K
        )
        return pd.DataFrame(
            {
                "query_id": g["query_id"].values.astype(np.int64),
                "neighbor_id": g["vec_id"].values.astype(np.int64),
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
            }
        )

    return (
        scored.groupby("query_id")
        .map_groups(topk, batch_format="pandas")
        .sort(["query_id", "rank"])
    )
