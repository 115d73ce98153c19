"""Document pipelines: text analysis, term frequencies, and the
deduplication family (exact, n-gram Jaccard, MinHash+LSH, SimHash,
fingerprints) — the training-data operators of the engine.

The ``text`` column is never modified anywhere in these pipelines
(byte-identical passthrough invariant, BASELINE.json:15): stages only
READ it and emit derived columns.

Tokenization contract shared with the SQL oracles: split on single
spaces, drop empties (functions/text.py docstring).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import text as T
from ..sources.tables import read_table, read_table_local, table_path
from .common import grouped_sum

_TOKENS_SQL = "list_filter(string_split(text, ' '), x -> x <> '')"


# ---------------------------------------------------------------------------
# Per-document stats (token counts, distinct ratio, char count check)
# ---------------------------------------------------------------------------


def docs_stats(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])

    def stats(t: pa.Table) -> pa.Table:
        n_tok, n_dis = T.token_count_stats_arrow(t["text"])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(n_tok),
                "n_distinct": pa.array(n_dis),
                "text_len": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
                "n_chars": t["n_chars"],
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True).sort(
        "doc_id"
    )


DOCS_STATS_SQL = f"""
SELECT doc_id,
       CAST(len({_TOKENS_SQL}) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct({_TOKENS_SQL})) AS BIGINT) AS n_distinct,
       CAST(length(text) AS BIGINT) AS text_len,
       n_chars
FROM documents
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Corpus term frequencies: explode tokens → two-phase count → top-k
# (the token is the shuffle key; per-batch combining collapses the
# zipf-hot head before the exchange)
# ---------------------------------------------------------------------------


def docs_term_topk(sf_dir: str, k: int = 50):
    ds = read_table(sf_dir, "documents", columns=["text"])

    def explode(t: pa.Table) -> pa.Table:
        # per-batch combiner fused into the explode: emit (token, count)
        # via one flat tokenize + one Arrow value_counts — zero per-row
        # Python (string-exact grouping)
        flat, _docidx, _counts = T.flat_tokens(t["text"])
        vc = pc.value_counts(flat)
        return pa.table(
            {
                "token": vc.field("values"),
                "n": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    ds = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    # vocabulary-bounded key space: driver merge over per-batch partials
    agg = grouped_sum(ds, ["token"], {"n": ("n", "sum")}, merge="driver")
    return agg.sort(["n", "token"], descending=[True, False]).limit(k)


DOCS_TERM_TOPK_SQL = f"""
SELECT token, count(*)::BIGINT AS n
FROM (SELECT unnest({_TOKENS_SQL}) AS token FROM documents)
GROUP BY token
ORDER BY n DESC, token
LIMIT 50
"""


# ---------------------------------------------------------------------------
# Exact dedup: hash-partition on text, keep min doc_id per group
# (scale path: the shuffle key is a 64-bit content hash, not the full
# text — only the winner row's id moves in phase 2)
# ---------------------------------------------------------------------------


def docs_exact_dedup(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def hash_stage(t: pa.Table) -> pa.Table:
        from ..functions.hashing import hash_strings

        h = hash_strings(t["text"])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "text_hash": pa.array(
                    (h & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
                ),
            }
        )

    hashed = ds.map_batches(hash_stage, batch_format="pyarrow", zero_copy_batch=True)
    agg = grouped_sum(
        hashed.map_batches(
            lambda t: pa.table(
                {
                    "text_hash": t["text_hash"],
                    "doc_id": t["doc_id"],
                    "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                }
            ),
            batch_format="pyarrow",
        ),
        ["text_hash"],
        {"doc_id": ("doc_id", "min"), "n_dupes": ("one", "sum")},
    )
    return agg.select_columns(["doc_id", "n_dupes"]).sort("doc_id")


DOCS_EXACT_DEDUP_SQL = """
SELECT min(doc_id) AS doc_id, count(*)::BIGINT AS n_dupes
FROM documents
GROUP BY text
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# JSONL ingest leg: the engine's pipelines are source-agnostic — this
# query proves it by running a per-lang aggregate over a JSONL copy of
# the documents table (the wire format web dumps actually ship in) and
# matching the Parquet-side SQL oracle exactly, i.e. text survives the
# JSON encode/parse round trip byte-identically.
# ---------------------------------------------------------------------------


def docs_jsonl_ingest(sf_dir: str):
    """Per-lang (n_docs, total_chars) computed from a JSONL copy of the
    documents table read back through ray.data.read_json
    (sources/jsonl.py).  Exact oracle over the ORIGINAL parquet — any
    encode/parse infidelity (unicode escaping, float coercion, row
    loss) breaks the value hash."""
    import shutil
    import tempfile

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..sources.jsonl import read_jsonl, write_jsonl_shards

    src = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    out_dir = os.path.join(
        tempfile.gettempdir(),
        f"graft_jsonl_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    write_jsonl_shards(src, out_dir, key="doc_id", n_shards=4)

    ds = read_jsonl(out_dir, columns=["doc_id", "text", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": t["lang"],
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "chars": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
            }
        )

    agg = grouped_sum(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["lang"],
        {"n_docs": ("one", "sum"), "total_chars": ("chars", "sum")},
        merge="driver",  # lang count provably bounded (CLAUDE.md rule 2)
    )
    return agg.sort("lang")


DOCS_JSONL_INGEST_SQL = """
SELECT lang, count(*)::BIGINT AS n_docs, sum(length(text))::BIGINT AS total_chars
FROM documents
GROUP BY lang
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# Normalized ("fuzzy-exact", C4-style) dedup: lowercase, strip
# non-alphanumerics, collapse whitespace — catches the trivial-variant
# duplicates exact hashing misses (case/punct/spacing edits), the
# standard first rung below MinHash in a web-corpus dedup ladder.
# Same shuffle shape as docs_exact_dedup: the exchanged key is a 64-bit
# hash of the NORMALIZED text, winner = min doc_id per group.
# ---------------------------------------------------------------------------


def docs_normalized_dedup(sf_dir: str):
    """Keep-first dedup on normalized text.

    Normalization (identical RE2 semantics in both engines — Arrow's
    replace_substring_regex and DuckDB's regexp_replace are both RE2):
    lower -> drop [^a-z0-9\\s] -> collapse \\s+ to one space -> trim.
    Output (doc_id of winner, n_dupes in its group), exact oracle."""
    import pyarrow.compute as pc

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def norm_hash(t: pa.Table) -> pa.Table:
        from ..functions.hashing import hash_strings

        x = pc.utf8_lower(t["text"])
        x = pc.replace_substring_regex(x, pattern=r"[^a-z0-9\s]", replacement="")
        x = pc.replace_substring_regex(x, pattern=r"\s+", replacement=" ")
        x = pc.utf8_trim_whitespace(x)
        if isinstance(x, pa.ChunkedArray):
            x = x.combine_chunks()
        h = hash_strings(x)
        return pa.table(
            {
                "norm_hash": pa.array(
                    (h & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
                ),
                "doc_id": t["doc_id"],
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    hashed = ds.map_batches(norm_hash, batch_format="pyarrow", zero_copy_batch=True)
    agg = grouped_sum(
        hashed,
        ["norm_hash"],
        {"doc_id": ("doc_id", "min"), "n_dupes": ("one", "sum")},
    )
    return agg.select_columns(["doc_id", "n_dupes"]).sort("doc_id")


DOCS_NORMALIZED_DEDUP_SQL = r"""
WITH norm AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text),
              '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')) AS ntext
  FROM documents
)
SELECT min(doc_id) AS doc_id, count(*)::BIGINT AS n_dupes
FROM norm
GROUP BY ntext
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Exact n-gram (token-set) Jaccard pairs: token-inverted-index join →
# pair co-count → |A∩B| / (|A|+|B|-|A∩B|) ≥ threshold.
# Shuffle key: token.  Output int pair ids only (exact oracle parity).
# ---------------------------------------------------------------------------


JACCARD_DOC_LIMIT = 500  # deterministic window: doc_id < 500
JACCARD_DF_CUTOFF = 1000  # stop-token document-frequency cutoff


_PAIR_SIZE_SCHEMA = pa.schema(
    [("a", pa.int64()), ("b", pa.int64()), ("common", pa.int64())]
)


def _token_pair_counts(sf_dir: str, df_cutoff: int, n_groups: int):
    """Shared machinery for the exact pair-similarity family
    (jaccard / containment): df-filtered distinct-token postings →
    in-group pair expansion → one grouped-sum exchange.  Returns the
    merged (a, b, common) Dataset (b = -1 sentinel rows carry per-doc
    df-filtered set sizes) and a ray.put ref of the sorted per-doc
    size table for broadcast verifies."""
    import ray

    from ..functions.hashing import splitmix64

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        lambda t: t.filter(pc.less(t["doc_id"], JACCARD_DOC_LIMIT)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def distinct_tokens(t: pa.Table) -> pa.Table:
        # distinct (doc, token) postings, fully vectorized: flat
        # tokenize -> dictionary codes (string-exact) -> np.unique on
        # the packed (row, code) key.  Row order within the batch is
        # irrelevant downstream (pairs_and_sizes lexsorts per group).
        flat, docidx, _c = T.flat_tokens(t["text"])
        if len(flat) == 0:
            return pa.table(
                {"grp": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64()),
                 "token": pa.array([], pa.string())}
            )
        enc = pc.dictionary_encode(flat)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ncodes = len(enc.dictionary)
        uq = np.unique(docidx * np.int64(ncodes) + codes)
        row_u = (uq // np.int64(ncodes)).astype(np.int64)
        code_u = (uq % np.int64(ncodes)).astype(np.int64)
        toks = enc.dictionary.take(pa.array(code_u, type=pa.int64()))
        # group key: splitmix of the token's first-8-bytes prefix
        # (buffer-native, zero-padded little-endian — same value the
        # old numpy "S8" view produced for ASCII tokens); prefix
        # collisions only co-locate extra tokens in a group (harmless:
        # segments key on full token)
        from ..functions.hashing import _str_buffers

        starts, lens, data = _str_buffers(toks)
        pre = np.zeros(len(lens), dtype=np.uint64)
        for j in range(8):
            has = lens > j
            pre[has] |= data[starts[has] + j].astype(np.uint64) << np.uint64(8 * j)
        grp = (splitmix64(pre) % np.uint64(n_groups)).astype(np.int64)
        return pa.table(
            {
                "grp": pa.array(grp),
                "doc_id": pc.cast(t["doc_id"], pa.int64()).take(
                    pa.array(row_u, type=pa.int64())
                ),
                "token": toks,
            }
        )

    posting = ds.map_batches(distinct_tokens, batch_format="pyarrow")

    def pairs_and_sizes(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _PAIR_SIZE_SCHEMA.empty_table()
        doc = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # token identity via dictionary codes (string-exact, C-speed);
        # only segment IDENTITY matters below, not code order
        tok_col = g["token"]
        if isinstance(tok_col, pa.ChunkedArray):
            tok_col = tok_col.combine_chunks()
        inv = pc.dictionary_encode(tok_col).indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        order = np.lexsort((doc, inv))
        inv_s, doc_s = inv[order], doc[order]
        first = np.ones(len(inv_s), dtype=bool)
        first[1:] = inv_s[1:] != inv_s[:-1]
        seg_id = np.cumsum(first) - 1
        starts = np.flatnonzero(first)
        seg_len = np.diff(np.append(starts, len(inv_s)))
        ok = seg_len[seg_id] <= df_cutoff  # global df: postings co-located
        # df-filtered size partials: per doc, count of surviving tokens
        ud, cnt = np.unique(doc_s[ok], return_counts=True)
        # pair expansion: each surviving row pairs with every EARLIER
        # row of its segment (docs sorted asc + distinct per token, so
        # a < b by construction) — cumsum-offset trick, no Python loop
        pos = np.arange(len(inv_s), dtype=np.int64) - starts[seg_id]
        rep = np.where(ok, pos, 0)
        total = int(rep.sum())
        b_idx = np.repeat(np.arange(len(inv_s), dtype=np.int64), rep)
        offs = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(rep) - rep, rep
        )
        a_idx = np.repeat(starts[seg_id], rep) + offs
        return pa.table(
            {
                "a": pa.array(np.concatenate([doc_s[a_idx], ud])),
                "b": pa.array(
                    np.concatenate([doc_s[b_idx], np.full(len(ud), -1, np.int64)])
                ),
                "common": pa.array(
                    np.concatenate([np.ones(total, dtype=np.int64), cnt.astype(np.int64)])
                ),
            }
        )

    merged = grouped_sum(
        posting.groupby("grp").map_groups(pairs_and_sizes, batch_format="pyarrow"),
        ["a", "b"],
        {"common": ("common", "sum")},
    ).materialize()

    # df-filtered sizes (b = -1 sentinel rows): tiny per-doc table
    sizes_pd = (
        merged.map_batches(
            lambda t: t.filter(pc.equal(t["b"], -1)), batch_format="pyarrow"
        )
        .to_pandas()
        .sort_values("a")
    )
    keys = sizes_pd["a"].values.astype(np.int64)
    szs = sizes_pd["common"].values.astype(np.int64)
    ref = ray.put((keys, szs))
    return merged, ref




def docs_jaccard_pairs(
    sf_dir: str,
    threshold: float = 0.8,
    df_cutoff: int = JACCARD_DF_CUTOFF,
    n_groups: int = 64,
):
    """Token-inverted n-gram Jaccard pairs with a document-frequency
    cutoff: tokens whose GLOBAL df exceeds ``df_cutoff`` are excluded
    from both intersections and set sizes (standard stop-token
    filtering — mirrored exactly in the SQL twin), which caps the
    per-token pair blowup at C(df_cutoff, 2) regardless of skew.

    Exact all-pairs jaccard is inherently quadratic on a corpus with a
    64-word vocabulary (nearly every doc pair is similar), so the exact
    query also runs on a deterministic doc window; the scalable
    candidate generator for full corpora is docs_minhash_lsh.

    Shape: postings hash-bucket by token into ``n_groups`` groups (ONE
    merge call per group, not per token — the per-group-Python trap);
    a token's postings all land in one group, so the in-group segment
    length IS the global df and the cutoff needs no extra pass.  Pair
    counts and df-filtered size partials ride the SAME distributed
    grouped-sum exchange (size partials use the b = -1 sentinel); only
    the tiny per-doc size table lands on the driver for the broadcast
    verify."""
    from ..stages.broadcast import with_broadcast

    merged, ref = _token_pair_counts(sf_dir, df_cutoff, n_groups)

    def verify(state, t: pa.Table) -> pa.Table:
        keys, szs = state
        t = t.filter(pc.greater_equal(t["b"], 0))
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        common = t["common"].to_numpy(zero_copy_only=False)
        sa = szs[np.searchsorted(keys, a)]
        sb = szs[np.searchsorted(keys, b)]
        union = sa + sb - common
        jac = common / np.maximum(union, 1)
        keep = jac >= threshold
        return pa.table({"a": pa.array(a[keep]), "b": pa.array(b[keep])})

    return merged.map_batches(
        with_broadcast(ref, verify, "verify_jaccard"), batch_format="pyarrow"
    ).sort(["a", "b"])


DOCS_JACCARD_SQL = f"""
WITH tok0 AS (
  SELECT doc_id, unnest(list_distinct({_TOKENS_SQL})) AS token
  FROM documents WHERE doc_id < {JACCARD_DOC_LIMIT}
),
df AS (
  SELECT token FROM tok0 GROUP BY token
  HAVING count(*) <= {JACCARD_DF_CUTOFF}
),
tok AS (
  SELECT t.doc_id, t.token FROM tok0 t JOIN df USING (token)
),
sizes AS (
  SELECT doc_id, count(*)::BIGINT AS sz FROM tok GROUP BY doc_id
),
common AS (
  SELECT t1.doc_id AS a, t2.doc_id AS b, count(*)::BIGINT AS c
  FROM tok t1 JOIN tok t2 ON t1.token = t2.token AND t1.doc_id < t2.doc_id
  GROUP BY t1.doc_id, t2.doc_id
)
SELECT a, b FROM common
JOIN sizes sa ON sa.doc_id = a
JOIN sizes sb ON sb.doc_id = b
WHERE c >= 0.8 * (sa.sz + sb.sz - c)
ORDER BY a, b
"""


# containment pairs: one-sided near-dup (quote / mirror-with-boilerplate
# detection) — containment(x -> y) = |x ∩ y| / |x| catches docs whose
# token set is swallowed by a larger doc, which symmetric Jaccard
# misses entirely (a 50-token quote inside a 5000-token page has
# jaccard ~0.01 but containment 1.0).  Same distributed machinery as
# docs_jaccard_pairs (_token_pair_counts); the verify emits ORDERED
# (contained, container) pairs, integer-exact threshold (100*c >= P*sz).
# ---------------------------------------------------------------------------

_CONTAINMENT_PCT = 90  # keep pairs where >= 90% of the smaller set is covered


def docs_containment_pairs(
    sf_dir: str,
    pct: int = _CONTAINMENT_PCT,
    df_cutoff: int = JACCARD_DF_CUTOFF,
    n_groups: int = 64,
):
    """Ordered containment pairs over df-filtered distinct token sets:
    emit (contained, container, containment_bp) whenever at least
    ``pct``% of one doc's tokens appear in the other.  The threshold
    and the reported basis points are all-integer (100*c >= pct*sz;
    bp = 10000*c // sz) so both engines compare exactly."""
    from ..stages.broadcast import with_broadcast

    merged, ref = _token_pair_counts(sf_dir, df_cutoff, n_groups)

    def verify(state, t: pa.Table) -> pa.Table:
        keys, szs = state
        t = t.filter(pc.greater_equal(t["b"], 0))
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        common = t["common"].to_numpy(zero_copy_only=False)
        sa = szs[np.searchsorted(keys, a)]
        sb = szs[np.searchsorted(keys, b)]
        out_src, out_dst, out_bp = [], [], []
        for src, dst, sz in ((a, b, sa), (b, a, sb)):
            keep = 100 * common >= pct * sz
            out_src.append(src[keep])
            out_dst.append(dst[keep])
            out_bp.append(10000 * common[keep] // sz[keep])
        return pa.table(
            {
                "contained": pa.array(np.concatenate(out_src)),
                "container": pa.array(np.concatenate(out_dst)),
                "containment_bp": pa.array(np.concatenate(out_bp)),
            }
        )

    return merged.map_batches(
        with_broadcast(ref, verify, "verify_containment"), batch_format="pyarrow"
    ).sort(["contained", "container"])


DOCS_CONTAINMENT_SQL = f"""
WITH tok0 AS (
  SELECT doc_id, unnest(list_distinct({_TOKENS_SQL})) AS token
  FROM documents WHERE doc_id < {JACCARD_DOC_LIMIT}
),
df AS (
  SELECT token FROM tok0 GROUP BY token
  HAVING count(*) <= {JACCARD_DF_CUTOFF}
),
tok AS (
  SELECT t.doc_id, t.token FROM tok0 t JOIN df USING (token)
),
sizes AS (
  SELECT doc_id, count(*)::BIGINT AS sz FROM tok GROUP BY doc_id
),
common AS (
  SELECT t1.doc_id AS a, t2.doc_id AS b, count(*)::BIGINT AS c
  FROM tok t1 JOIN tok t2 ON t1.token = t2.token AND t1.doc_id < t2.doc_id
  GROUP BY t1.doc_id, t2.doc_id
),
directed AS (
  SELECT a AS contained, b AS container, c, sa.sz AS sz
  FROM common JOIN sizes sa ON sa.doc_id = a
  UNION ALL
  SELECT b, a, c, sb.sz
  FROM common JOIN sizes sb ON sb.doc_id = b
)
SELECT CAST(contained AS BIGINT) AS contained,
       CAST(container AS BIGINT) AS container,
       CAST(10000 * c // sz AS BIGINT) AS containment_bp
FROM directed
WHERE 100 * c >= {_CONTAINMENT_PCT} * sz
ORDER BY contained, container
"""


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup candidates (rows-only: minhash seeds are not
# SQL-expressible).  Fully distributed shuffle form: band-bucket rows
# stay in Ray, candidate pairs expand inside B hash-bucketed groups
# (vectorized triu, one merge call per group — not one per (band,
# bucket), which is the per-group-Python trap on mostly-singleton
# keys), duplicates collapse via the two-phase grouped count, and
# verification fetches the two texts through bucketed hash joins and
# computes EXACT token-set jaccard per candidate — identical output to
# a broadcast verify, with nothing ever collected on the driver.
# ---------------------------------------------------------------------------


def docs_minhash_lsh(sf_dir: str, num_perm: int = 128, n_bands: int = 16, threshold: float = 0.5):
    from ..functions.hashing import splitmix64
    from ..stages.join import hash_join
    from .common import grouped_sum

    n_groups = 64  # pair-expansion parallelism (a few x cluster cores)
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def band_stage(t: pa.Table) -> pa.Table:
        # fully vectorized across the batch AND zero-copy from Arrow:
        # tokenize/hash/shingle/sign straight off the string buffers
        # (minhash_signatures_arrow) — bit-identical to the per-doc
        # form, with no Python-string materialization (to_pylist was
        # the last Python hot-path in this chain; VERDICT r3 item 7)
        docs = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sigs = T.minhash_signatures_arrow(t["text"], num_perm, k=3)
        bh = T.minhash_bands_batch(sigs, n_bands)  # (n_docs, n_bands)
        buckets = (bh & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
        n = len(docs)
        band = np.tile(np.arange(n_bands, dtype=np.int64), n)
        flat_bucket = buckets.ravel()
        grp = (
            splitmix64(flat_bucket.astype(np.uint64) ^ (band.astype(np.uint64) << np.uint64(48)))
            % np.uint64(n_groups)
        ).astype(np.int64)
        return pa.table(
            {
                "grp": pa.array(grp),
                "doc_id": pa.array(np.repeat(docs, n_bands)),
                "band": pa.array(band),
                "bucket": pa.array(flat_bucket),
            }
        )

    banded = ds.map_batches(band_stage, batch_format="pyarrow")

    def expand_pairs(g: pa.Table) -> pa.Table:
        """Same-bucket pair expansion, vectorized with size-batched
        triu gathers over sorted (band, bucket) segments."""
        band_v = g["band"].to_numpy(zero_copy_only=False).astype(np.int64)
        bucket_v = g["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc_v = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((doc_v, bucket_v, band_v))
        band_v, bucket_v, doc_v = band_v[order], bucket_v[order], doc_v[order]
        seg_start = np.concatenate(
            ([True], (band_v[1:] != band_v[:-1]) | (bucket_v[1:] != bucket_v[:-1]))
        ) if len(band_v) else np.array([], dtype=bool)
        starts = np.flatnonzero(seg_start)
        sizes = np.diff(np.concatenate((starts, [len(doc_v)])))
        pair_a, pair_b = [], []
        for size in np.unique(sizes[sizes >= 2]):
            seg_s = starts[sizes == size]
            ii, jj = np.triu_indices(int(size), k=1)
            pair_a.append(doc_v[seg_s[:, None] + ii[None, :]].ravel())
            pair_b.append(doc_v[seg_s[:, None] + jj[None, :]].ravel())
        if not pair_a:
            return pa.table(
                {"a": pa.array([], type=pa.int64()),
                 "b": pa.array([], type=pa.int64()),
                 "one": pa.array([], type=pa.int64())}
            )
        a = np.concatenate(pair_a)
        b = np.concatenate(pair_b)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        # within-group dedup (same pair can collide in several bands
        # that hash to the same grp); the cross-group dedup is the
        # grouped count below
        packed = np.unique(lo.astype(np.uint64) * np.uint64(1 << 32) + hi.astype(np.uint64))
        return pa.table(
            {
                "a": pa.array((packed >> np.uint64(32)).astype(np.int64)),
                "b": pa.array((packed & np.uint64(0xFFFFFFFF)).astype(np.int64)),
                "one": pa.array(np.ones(len(packed), dtype=np.int64)),
            }
        )

    cand = grouped_sum(
        banded.groupby("grp").map_groups(expand_pairs, batch_format="pyarrow"),
        ["a", "b"],
        {"n": ("one", "sum")},
    )

    # verify with EXACT token-set jaccard: fetch each side's text via
    # a bucketed hash join (candidates are rare, so the joins move
    # O(candidates + corpus) rows once — no whole-corpus broadcast)
    docs_int = ds.map_batches(
        lambda t: pa.table(
            {"doc_id": pc.cast(t["doc_id"], pa.int64()), "text": t["text"]}
        ),
        batch_format="pyarrow",
    )
    cand_a = cand.map_batches(
        lambda t: pa.table({"doc_id": t["a"], "b": t["b"]}), batch_format="pyarrow"
    )
    with_a = hash_join(
        cand_a, docs_int, on="doc_id",
        left_cols=["doc_id", "b"], right_cols=["doc_id", "text"],
    ).map_batches(
        lambda t: pa.table(
            {"a": t["doc_id"], "doc_id": t["b"], "text_a": t["text"]}
        ),
        batch_format="pyarrow",
    )
    with_ab = hash_join(
        with_a, docs_int, on="doc_id",
        left_cols=["doc_id", "a", "text_a"], right_cols=["doc_id", "text"],
    )

    def verify_jac(t: pa.Table) -> pa.Table:
        # vectorized exact token-set jaccard (sorted dictionary codes +
        # adjacent-dup intersection counts — no Python per candidate;
        # candidates ≈ corpus on a duplicate-heavy crawl)
        j = T.pairwise_token_jaccard_arrow(t["text_a"], t["text"])
        keep = j >= threshold
        return pa.table(
            {
                "a": pc.cast(t["a"], pa.int64()).filter(pa.array(keep)),
                "b": pc.cast(t["doc_id"], pa.int64()).filter(pa.array(keep)),
                "jaccard_pct": pa.array((j[keep] * 100).astype(np.int64)),
            }
        )

    return with_ab.map_batches(verify_jac, batch_format="pyarrow").sort(["a", "b"])


# ---------------------------------------------------------------------------
# SimHash signatures + near-dup buckets (rows-only)
# ---------------------------------------------------------------------------


def docs_simhash(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def sim(t: pa.Table) -> pa.Table:
        # buffer-native vectorized simhash (bit-identical to the scalar
        # T.simhash64 — parity-tested); no per-row Python (rule 19)
        sh = T.simhash64_arrow(t["text"])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "simhash": pa.array((sh & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)),
                # 16-bit band keys for hamming-bucket grouping
                "band0": pa.array((sh & np.uint64(0xFFFF)).astype(np.int64)),
                "band1": pa.array(((sh >> np.uint64(16)) & np.uint64(0xFFFF)).astype(np.int64)),
                "band2": pa.array(((sh >> np.uint64(32)) & np.uint64(0xFFFF)).astype(np.int64)),
                "band3": pa.array(((sh >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.int64)),
            }
        )

    return ds.map_batches(sim, batch_format="pyarrow", zero_copy_batch=True).sort(
        "doc_id"
    )


# ---------------------------------------------------------------------------
# Language ID + quality score (rows-only: heuristic models)
# ---------------------------------------------------------------------------


def docs_langid_quality(sf_dir: str):
    # Plain task fn, NOT an actor pool: the marker tables are
    # featherweight module globals (already resident in every worker
    # process), and a task fn keeps Ray Data operator fusion with the
    # read — the repo's measured rule (CLAUDE.md #3; actor pools
    # reserve CPUs and were 1.85x slower for light state).
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def score(t: pa.Table) -> pa.Table:
        q = T.quality_stats_arrow(t["text"])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "lang_pred": pa.array(T.langid_arrow(t["text"])),
                "n_tokens": pa.array(q["n_tokens"]),
                "distinct_pct": pa.array(
                    np.floor(q["distinct_ratio"] * 100.0).astype(np.int64)
                ),
                "stopword_pct": pa.array(
                    np.floor(q["stopword_ratio"] * 100.0).astype(np.int64)
                ),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True).sort(
        "doc_id"
    )


# ---------------------------------------------------------------------------
# Quality stats with SQL twin (the SQL-expressible subset)
# ---------------------------------------------------------------------------


def docs_quality(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        n_tok, n_dis = T.token_count_stats_arrow(t["text"])
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = np.where(n_tok > 0, n_dis / np.maximum(n_tok, 1), 0.0)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "distinct_pct": pa.array(np.floor(ratio * 100.0).astype(np.int64)),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True).sort(
        "doc_id"
    )


DOCS_QUALITY_SQL = f"""
SELECT doc_id,
       CAST(floor(CASE WHEN len({_TOKENS_SQL}) > 0
                  THEN len(list_distinct({_TOKENS_SQL})) / greatest(len({_TOKENS_SQL}), 1) * 100.0
                  ELSE 0.0 END) AS BIGINT) AS distinct_pct
FROM documents
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Rolling-hash fingerprints (rows-only)
# ---------------------------------------------------------------------------


def docs_fingerprints(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fp(t: pa.Table) -> pa.Table:
        ids = []
        prints = []
        for d, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            f = T.rolling_fingerprints(s or "")
            ids.extend([d] * len(f))
            prints.extend((f & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64).tolist())
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "fingerprint": pa.array(prints, type=pa.int64()),
            }
        )

    return ds.map_batches(fp, batch_format="pyarrow", zero_copy_batch=True).sort(
        ["doc_id", "fingerprint"]
    )


# ---------------------------------------------------------------------------
# Byte-identical text passthrough proof: texts survive a full
# shuffle+map round-trip with identical content hash per doc_id.
# ---------------------------------------------------------------------------


def docs_text_passthrough(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    # a pointless-but-real pipeline: filter, shuffle-ish repartition, map
    ds = ds.map_batches(lambda t: t, batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.repartition(8)

    def hash_text(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "text_len": pc.cast(pc.binary_length(pc.cast(t["text"], pa.binary())), pa.int64()),
                "text": t["text"],
            }
        )

    return ds.map_batches(hash_text, batch_format="pyarrow").sort("doc_id")


DOCS_TEXT_PASSTHROUGH_SQL = """
SELECT doc_id, CAST(strlen(text) AS BIGINT) AS text_len, text
FROM documents
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Multimodal plumbing query: synthesize binary payloads from text,
# decode with the deterministic fake codec in an actor pool (rows-only)
# ---------------------------------------------------------------------------


def docs_media_features(sf_dir: str):
    from ..stages.multimodal import MediaFeatures

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def to_payload(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "payload": pc.cast(t["text"], pa.binary()),
                "format": pa.array(["fake"] * t.num_rows),
            }
        )

    ds = ds.map_batches(to_payload, batch_format="pyarrow", zero_copy_batch=True)
    return ds.map_batches(
        MediaFeatures,
        fn_constructor_args=("doc_id", "fake"),
        batch_format="pyarrow",
        concurrency=2,
        batch_size=64,  # media rows are wide: small batches (memory-aware)
    ).sort("doc_id")


def docs_html_extract(sf_dir: str):
    """REAL html→text extraction under an EXACT oracle: each document's
    text is wrapped in deterministic realistic markup (head junk,
    attributes, entities, in-body script, comments —
    functions/htmltext.synthesize_html) and the stdlib-parser extractor
    must recover the text BYTE-identically, so the oracle is simply the
    raw text column.  This is the north rule's per-row invariant
    ("byte-identical extracted text per url") as a first-class query."""
    from ..functions.htmltext import extract_text, synthesize_html

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def wrap_and_extract(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_pylist()
        extracted = [
            extract_text(synthesize_html(txt, int(i))) for i, txt in zip(ids, texts)
        ]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "text": pa.array(extracted, type=pa.string()),
            }
        )

    return ds.map_batches(
        wrap_and_extract, batch_format="pyarrow", zero_copy_batch=True
    ).sort("doc_id")


DOCS_HTML_EXTRACT_SQL = """
SELECT doc_id, text FROM documents ORDER BY doc_id
"""


def docs_normalize_text(sf_dir: str):
    """Text-cleaning operator (training-data normalize pass): lowercase
    + collapse whitespace runs + trim, fully vectorized Arrow kernels
    (utf8_lower / replace_substring_regex / trim) — zero Python per
    row, pure map, no shuffle.  The stored ``text`` column is only
    READ (passthrough invariant); the normalized form is a NEW column.
    Exact SQL twin: lower/regexp_replace/trim in DuckDB (both engines
    run RE2-class regex + Unicode-aware lower)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def norm(t: pa.Table) -> pa.Table:
        x = pc.utf8_lower(t["text"])
        x = pc.replace_substring_regex(x, r"\s+", " ")
        x = pc.utf8_trim_whitespace(x)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "norm_text": x,
                "n_chars_norm": pc.cast(pc.utf8_length(x), pa.int64()),
            }
        )

    return ds.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True).sort(
        "doc_id"
    )


DOCS_NORMALIZE_SQL = r"""
SELECT doc_id,
       trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm_text,
       CAST(strlen(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS BIGINT)
         AS n_chars_norm
FROM documents
ORDER BY doc_id
"""


def _synth_image(doc_id: int) -> "np.ndarray":
    """Deterministic RGB image per doc (splitmix pixel stream — stable
    across workers/platforms, no RNG-state dependence)."""
    from ..functions.hashing import splitmix64

    h = 12 + doc_id % 9
    w = 10 + doc_id % 7
    n = h * w * 3
    seed = splitmix64(np.uint64((doc_id * 0x9E3779B97F4A7C15) % (1 << 64)))
    px = splitmix64(seed + np.arange(n, dtype=np.uint64)) & np.uint64(0xFF)
    return px.astype(np.uint8).reshape(h, w, 3)


def docs_image_features(sf_dir: str):
    """REAL image path: deterministic PNG payload per doc (encoded with
    the pure-Python codec) → actor-pool decode → pixel feature columns.
    Rows-only (SQL cannot decode PNG); the full result is pinned in
    tests/test_goldens.py and width/height/byte_sum are re-derivable
    from _synth_image."""
    from ..functions.png import encode_png
    from ..stages.multimodal import MediaFeatures

    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def to_payload(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        payloads = [encode_png(_synth_image(int(i))) for i in ids]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "payload": pa.array(payloads, type=pa.binary()),
                "format": pa.array(["png"] * t.num_rows),
            }
        )

    ds = ds.map_batches(to_payload, batch_format="pyarrow", zero_copy_batch=True)
    return ds.map_batches(
        MediaFeatures,
        fn_constructor_args=("doc_id", "png"),
        batch_format="pyarrow",
        concurrency=2,
        batch_size=64,
    ).sort("doc_id")


def docs_audio_features(sf_dir: str):
    """REAL audio path: deterministic PCM16 WAV per doc → actor-pool
    RIFF decode → normalized audio stats.  Rows-only, golden-pinned."""
    from ..functions.hashing import splitmix64
    from ..functions.wav import encode_wav
    from ..stages.multimodal import AudioFeatures

    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def to_payload(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        payloads = []
        for i in ids:
            n = 200 + int(i) % 50 * 4
            seed = splitmix64(np.uint64(i) ^ np.uint64(0xA5A5A5A5A5A5A5A5))
            raw = splitmix64(seed + np.arange(n, dtype=np.uint64))
            samples = ((raw & np.uint64(0xFFFF)).astype(np.int64) - 32768).astype(
                np.int16
            )
            payloads.append(encode_wav(samples, 8000))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "payload": pa.array(payloads, type=pa.binary()),
            }
        )

    ds = ds.map_batches(to_payload, batch_format="pyarrow", zero_copy_batch=True)
    return ds.map_batches(
        AudioFeatures,
        fn_constructor_args=("doc_id",),
        batch_format="pyarrow",
        concurrency=2,
        batch_size=64,
    ).sort("doc_id")


# ---------------------------------------------------------------------------
# Location extraction (gazetteer scan of text -> geocoded mentions) —
# the north-star operator, with an exact SQL twin (token-equality match
# against the anchor VALUES list)
# ---------------------------------------------------------------------------


def docs_locations(sf_dir: str):
    from ..functions.gazetteer import LocationExtractor

    _cache: dict = {}

    def extract(t: pa.Table) -> pa.Table:
        if "x" not in _cache:
            _cache["x"] = LocationExtractor()
        rows, names, lats, lons = _cache["x"].extract_arrow(t["text"])
        take = pa.array(rows)
        return pa.table(
            {
                "doc_id": t["doc_id"].take(take),
                "name": names,
                "lat": pa.array(lats),
                "lon": pa.array(lons),
            }
        )

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(extract, batch_format="pyarrow", zero_copy_batch=True).sort(
        ["doc_id", "name"]
    )


def docs_locations_sql() -> str:
    from ..functions.gazetteer import gazetteer_sql_values

    return f"""
SELECT t.doc_id, t.token AS name, gaz.lat, gaz.lon
FROM (SELECT doc_id, unnest({_TOKENS_SQL}) AS token FROM documents) t
JOIN {gazetteer_sql_values()} ON t.token = gaz.name
ORDER BY doc_id, name
"""


def docs_extract_zonal(sf_dir: str):
    """Extraction -> diamond-zone PIP -> per-zone mention counts."""
    import ray

    from ..stages import geo as geo_stages
    from .spatial import N_ZONES

    mentions = docs_locations(sf_dir)
    zones_ref = ray.put(geo_stages.zones_payload(np.arange(N_ZONES, dtype=np.int64)))
    pairs = mentions.map_batches(
        geo_stages.broadcast_pip_task(zones_ref, "doc_id", ()),
        batch_format="pyarrow",
    )

    def ones(t: pa.Table) -> pa.Table:
        return pa.table(
            {"zone_id": t["zone_id"], "one": pa.array(np.ones(t.num_rows, dtype=np.int64))}
        )

    agg = grouped_sum(
        pairs.map_batches(ones, batch_format="pyarrow"),
        ["zone_id"],
        {"n_mentions": ("one", "sum")},
        merge="driver",  # <=25 zones
    )
    return agg.sort("zone_id")


def docs_extract_zonal_sql() -> str:
    from ..functions.gazetteer import gazetteer_sql_values
    from ..functions.synthgeo import zone_params_sql

    zp = zone_params_sql("z.zkey")
    return f"""
WITH mentions AS (
  SELECT gaz.lat, gaz.lon
  FROM (SELECT doc_id, unnest({_TOKENS_SQL}) AS token FROM documents) t
  JOIN {gazetteer_sql_values()} ON t.token = gaz.name
),
z AS (SELECT CAST(n_nationkey AS BIGINT) AS zkey FROM nation)
SELECT z.zkey AS zone_id, count(*) AS n_mentions
FROM mentions, z
WHERE abs(mentions.lon - {zp['cx']}) / {zp['rx']} + abs(mentions.lat - {zp['cy']}) / {zp['ry']} <= 1.0
GROUP BY z.zkey
ORDER BY zone_id
"""


def docs_sample(sf_dir: str, pct: int = 5):
    """Deterministic hash-based sampling (hash(doc_id) % 100 < pct) —
    reproducible across runs/workers, SQL-expressible."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang"])

    def pick(t: pa.Table) -> pa.Table:
        k = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = (k * 2654435761 + 1013904223) % 4294967296
        return t.filter(pa.array(h % 100 < pct))

    return ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True).sort(
        "doc_id"
    )


def docs_sample_sql(pct: int = 5) -> str:
    return f"""
SELECT doc_id, lang FROM documents
WHERE ((doc_id * 2654435761 + 1013904223) % 4294967296) % 100 < {pct}
ORDER BY doc_id
"""


def docs_stratified_sample(sf_dir: str, major_pct: int = 5, minor_pct: int = 20):
    """Per-stratum (language) hash sampling — downsample the dominant
    language hard, keep the long tail denser (the standard corpus
    rebalancing op for training-data mixes).  Same deterministic
    doc_id hash as :func:`docs_sample`, so the pick is reproducible
    across runs and partitionings; the per-row rate is a vectorized
    lookup, zero extra exchange over the plain sampler."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang"])

    def pick(t: pa.Table) -> pa.Table:
        k = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = (k * 2654435761 + 1013904223) % 4294967296
        is_major = pc.equal(t["lang"], "en").to_numpy(zero_copy_only=False)
        rate = np.where(is_major, major_pct, minor_pct)
        return t.filter(pa.array(h % 100 < rate))

    return ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True).sort(
        "doc_id"
    )


def docs_stratified_sample_sql(major_pct: int = 5, minor_pct: int = 20) -> str:
    return f"""
SELECT doc_id, lang FROM documents
WHERE ((doc_id * 2654435761 + 1013904223) % 4294967296) % 100
      < CASE WHEN lang = 'en' THEN {major_pct} ELSE {minor_pct} END
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Grouped top-k: 5 most frequent tokens per language (rank-within-group
# via vectorized segment logic over the two-phase counts)
# ---------------------------------------------------------------------------


def docs_top_terms_per_lang(sf_dir: str, k: int = 5):
    ds = read_table(sf_dir, "documents", columns=["lang", "text"])

    def explode(t: pa.Table) -> pa.Table:
        # per-batch (lang, token) combiner, vectorized: dictionary
        # codes for both keys, packed-key np.unique with counts
        flat, docidx, _c = T.flat_tokens(t["text"])
        if len(flat) == 0:
            return pa.table(
                {"lang": pa.array([], pa.string()), "token": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        lcol = t["lang"]
        if isinstance(lcol, pa.ChunkedArray):
            lcol = lcol.combine_chunks()
        lenc = pc.dictionary_encode(pc.fill_null(lcol, ""))
        lcodes = lenc.indices.to_numpy(zero_copy_only=False).astype(np.int64)[docidx]
        enc = pc.dictionary_encode(flat)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ncodes = len(enc.dictionary)
        uq, n = np.unique(lcodes * np.int64(ncodes) + codes, return_counts=True)
        return pa.table(
            {
                "lang": lenc.dictionary.take(
                    pa.array((uq // np.int64(ncodes)).astype(np.int64))
                ),
                "token": enc.dictionary.take(
                    pa.array((uq % np.int64(ncodes)).astype(np.int64))
                ),
                "n": pa.array(n.astype(np.int64)),
            }
        )

    # fully distributed: the vocabulary-sized (lang, token) count table
    # never lands on the driver.  (1) shuffle-merged grouped counts;
    # (2) per-BLOCK partial top-k per lang — every (lang, token) row is
    # globally unique after the merge, so a row in the global top-k is
    # in its block's per-lang top-k too (block rank <= global rank):
    # the partials are an exact superset, <= k x langs x blocks rows;
    # (3) single-block final rank over that tiny set.
    agg = grouped_sum(
        ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True),
        ["lang", "token"],
        {"n": ("n", "sum")},
    )

    def topk_block(t: pa.Table, emit_rank: bool) -> pa.Table:
        if t.num_rows == 0:
            base = pa.schema(
                [("lang", pa.string()), ("token", pa.string()), ("n", pa.int64())]
            )
            if emit_rank:
                base = base.append(pa.field("rank", pa.int64()))
            return base.empty_table()
        # lang asc, n desc, token asc via Arrow's C multi-key sort
        order = pc.sort_indices(
            t,
            sort_keys=[
                ("lang", "ascending"),
                ("n", "descending"),
                ("token", "ascending"),
            ],
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        lcol = t["lang"]
        if isinstance(lcol, pa.ChunkedArray):
            lcol = lcol.combine_chunks()
        lcode = pc.dictionary_encode(lcol).indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        lv = lcode[order]
        first = np.ones(len(lv), dtype=bool)
        first[1:] = lv[1:] != lv[:-1]
        starts = np.flatnonzero(first)
        grp = np.cumsum(first) - 1
        pos = np.arange(len(lv), dtype=np.int64) - starts[grp]
        keep = pos < k
        out = t.select(["lang", "token", "n"]).take(pa.array(order[keep]))
        if emit_rank:
            out = out.append_column("rank", pa.array(pos[keep] + 1))
        return out

    partial = agg.map_batches(
        lambda t: topk_block(t, False), batch_format="pyarrow", zero_copy_batch=True
    )
    return partial.repartition(1).map_batches(
        lambda t: topk_block(t, True), batch_format="pyarrow", batch_size=None
    )


def docs_top_terms_per_lang_sql(k: int = 5) -> str:
    return f"""
WITH counts AS (
  SELECT lang, token, count(*)::BIGINT AS n
  FROM (SELECT lang, unnest({_TOKENS_SQL}) AS token FROM documents)
  GROUP BY lang, token
),
ranked AS (
  SELECT lang, token, n,
         row_number() OVER (PARTITION BY lang ORDER BY n DESC, token) AS rank
  FROM counts
)
SELECT lang, token, n, rank FROM ranked WHERE rank <= {k}
ORDER BY lang, rank
"""


# ---------------------------------------------------------------------------
# Composed cleaning pipeline: quality filter -> exact dedup -> hash
# sample — the chained training-data shape, each stage reusing the
# engine's operators, with one exact SQL twin for the whole chain
# ---------------------------------------------------------------------------


def docs_clean_corpus(sf_dir: str, min_distinct_pct: int = 40, sample_pct: int = 50):
    from ..functions.hashing import hash_strings

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def filter_quality(t: pa.Table) -> pa.Table:
        n_tok, n_dis = T.token_count_stats_arrow(t["text"])
        with np.errstate(divide="ignore", invalid="ignore"):
            pct = np.floor(
                np.where(n_tok > 0, n_dis / np.maximum(n_tok, 1), 0.0) * 100.0
            ).astype(np.int64)
        return t.filter(pa.array(pct >= min_distinct_pct))

    def content_hash(t: pa.Table) -> pa.Table:
        h = hash_strings(t["text"])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "text_hash": pa.array(
                    (h & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
                ),
            }
        )

    hashed = ds.map_batches(filter_quality, batch_format="pyarrow", zero_copy_batch=True
                            ).map_batches(content_hash, batch_format="pyarrow")
    winners = grouped_sum(
        hashed.map_batches(
            lambda t: pa.table({"text_hash": t["text_hash"], "doc_id": t["doc_id"]}),
            batch_format="pyarrow",
        ),
        ["text_hash"],
        {"doc_id": ("doc_id", "min")},
    )

    def sample(t: pa.Table) -> pa.Table:
        k = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = (k * 2654435761 + 1013904223) % 4294967296
        return pa.table({"doc_id": pa.array(k)}).filter(pa.array(h % 100 < sample_pct))

    return winners.map_batches(sample, batch_format="pyarrow").sort("doc_id")


def docs_clean_corpus_sql(min_distinct_pct: int = 40, sample_pct: int = 50) -> str:
    return f"""
WITH quality AS (
  SELECT doc_id, text FROM documents
  WHERE CAST(floor(CASE WHEN len({_TOKENS_SQL}) > 0
             THEN len(list_distinct({_TOKENS_SQL})) / greatest(len({_TOKENS_SQL}), 1) * 100.0
             ELSE 0.0 END) AS BIGINT) >= {min_distinct_pct}
),
deduped AS (
  SELECT min(doc_id) AS doc_id FROM quality GROUP BY text
)
SELECT doc_id FROM deduped
WHERE ((doc_id * 2654435761 + 1013904223) % 4294967296) % 100 < {sample_pct}
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Distinctive term per document: argmax over a doc's tokens by
# (tf DESC, global df ASC, token ASC) — a TF-IDF-style fingerprint with
# a purely INTEGER ordering, so the SQL twin is hash-exact (no float
# idf anywhere).
#
# Scale shape (4 bounded exchanges, never the corpus in one place):
# explode -> grouped (doc,token) tf -> grouped token df -> bucketed
# hash join tf⋈df on token -> per-doc argmax via B-bucket vectorized
# segment logic (hash(doc)%B groups, lexsort inside — never one Python
# call per doc).
# ---------------------------------------------------------------------------


def docs_distinctive_term(sf_dir: str, n_buckets: int = 64):
    from ..functions.hashing import splitmix64
    from ..stages.join import hash_join

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        # per-batch (doc, token) tf combiner, vectorized: flat tokenize
        # -> dictionary codes -> np.unique with counts on the packed key
        flat, docidx, _c = T.flat_tokens(t["text"])
        if len(flat) == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "token": pa.array([], pa.string()),
                 "tf": pa.array([], pa.int64()), "one": pa.array([], pa.int64())}
            )
        enc = pc.dictionary_encode(flat)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ncodes = len(enc.dictionary)
        uq, tf = np.unique(docidx * np.int64(ncodes) + codes, return_counts=True)
        row_u = (uq // np.int64(ncodes)).astype(np.int64)
        code_u = (uq % np.int64(ncodes)).astype(np.int64)
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()).take(
                    pa.array(row_u, type=pa.int64())
                ),
                "token": enc.dictionary.take(pa.array(code_u, type=pa.int64())),
                "tf": pa.array(tf.astype(np.int64)),
                "one": pa.array(np.ones(len(uq), dtype=np.int64)),
            }
        )

    doc_tok = grouped_sum(
        ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True),
        ["doc_id", "token"],
        {"tf": ("tf", "sum"), "one": ("one", "sum")},
    )

    def drop_one(t: pa.Table) -> pa.Table:
        return t.select(["doc_id", "token", "tf"])

    doc_tok = doc_tok.map_batches(drop_one, batch_format="pyarrow").materialize()

    def to_df_partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "token": t["token"],
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    tok_df = grouped_sum(
        doc_tok.map_batches(to_df_partial, batch_format="pyarrow"),
        ["token"],
        {"df": ("one", "sum")},
    )

    # hash_join keys on int64: hash the token both sides, carry the
    # token strings through and re-check equality after the join (a
    # 64-bit collision would otherwise silently cross-match)
    def add_token_h(col_token: str, extra_rename=None):
        def fn(t: pa.Table) -> pa.Table:
            from ..functions.hashing import hash_strings

            h = hash_strings(t[col_token])
            t = t.append_column(
                "token_h",
                pa.array((h & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)),
            )
            if extra_rename:
                t = t.rename_columns(
                    [extra_rename.get(c, c) for c in t.schema.names]
                )
            return t

        return fn

    left = doc_tok.map_batches(add_token_h("token"), batch_format="pyarrow")
    right = tok_df.map_batches(
        add_token_h("token", {"token": "token_r"}), batch_format="pyarrow"
    )
    joined = hash_join(
        left,
        right,
        on="token_h",
        left_cols=["token_h", "doc_id", "token", "tf"],
        right_cols=["token_h", "token_r", "df"],
    ).map_batches(
        lambda t: t.filter(pc.equal(t["token"], t["token_r"])).select(
            ["doc_id", "token", "tf", "df"]
        ),
        batch_format="pyarrow",
    )

    def bucket_tag(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "bucket",
            pa.array((splitmix64(d.astype(np.uint64)) % np.uint64(n_buckets)).astype(np.int64)),
        )

    _OUT = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("token", pa.string()),
            ("tf", pa.int64()),
            ("df", pa.int64()),
        ]
    )

    def argmax_per_doc(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        # doc asc, tf desc, df asc, token asc — Arrow's multi-key sort
        # compares the token STRINGS in C (no per-row Python objects)
        order_arr = pc.sort_indices(
            g,
            sort_keys=[
                ("doc_id", "ascending"),
                ("tf", "descending"),
                ("df", "ascending"),
                ("token", "ascending"),
            ],
        )
        order = order_arr.to_numpy(zero_copy_only=False).astype(np.int64)
        d = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        dd = d[order]
        first = np.empty(len(d), dtype=bool)
        first[0] = True
        first[1:] = dd[1:] != dd[:-1]
        sel = pa.array(order[first], type=pa.int64())
        out = g.take(sel)
        return pa.table(
            {
                "doc_id": pc.cast(out["doc_id"], pa.int64()),
                "token": out["token"],
                "tf": pc.cast(out["tf"], pa.int64()),
                "df": pc.cast(out["df"], pa.int64()),
            }
        )

    return (
        joined.map_batches(bucket_tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(argmax_per_doc, batch_format="pyarrow")
        .sort("doc_id")
    )


DOCS_DISTINCTIVE_TERM_SQL = f"""
WITH tokens AS (
  SELECT doc_id, unnest({_TOKENS_SQL}) AS token FROM documents
),
tf AS (
  SELECT doc_id, token, count(*)::BIGINT AS tf FROM tokens GROUP BY doc_id, token
),
df AS (
  SELECT token, count(*)::BIGINT AS df FROM tf GROUP BY token
),
ranked AS (
  SELECT tf.doc_id, tf.token, tf.tf, df.df,
         row_number() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf DESC, df.df ASC, tf.token ASC) AS rn
  FROM tf JOIN df USING (token)
)
SELECT doc_id, token, tf, df FROM ranked WHERE rn = 1
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Dedup clustering: connected components over the near-dup pair graph —
# the step that turns pairwise candidates into dedup GROUPS (keep one
# doc per component).  Iterative distributed min-label propagation:
# every round each node takes the min label among itself and its
# neighbors (one bucketed hash join + one grouped min per round), until
# the global label sum stops changing (labels are monotone
# non-increasing non-negative ints, so sum-equality IS the fixpoint
# test — no row-wise diff needed).  Rounds needed = graph diameter
# (near-dup graphs are dense cliques: 2-3).  The SQL twin computes the
# same components with a recursive transitive-closure CTE.
# ---------------------------------------------------------------------------


def docs_dedup_components(sf_dir: str, max_iters: int = 25):
    from ..stages.components import min_label_components

    pairs = docs_jaccard_pairs(sf_dir)

    def both_dirs(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "node": pa.array(np.concatenate([a, b])),
                "dst": pa.array(np.concatenate([b, a])),
            }
        )

    edges = pairs.map_batches(both_dirs, batch_format="pyarrow").materialize()

    labels = (
        read_table(sf_dir, "documents", columns=["doc_id"])
        .map_batches(
            lambda t: pa.table(
                {
                    "node": pc.cast(t["doc_id"], pa.int64()),
                    "label": pc.cast(t["doc_id"], pa.int64()),
                }
            ).filter(pc.less(pc.cast(t["doc_id"], pa.int64()), JACCARD_DOC_LIMIT)),
            batch_format="pyarrow",
        )
        .materialize()
    )
    labels = min_label_components(
        edges, labels, max_iters=max_iters, op_name="docs_dedup_components"
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["node"], "component_id": t["label"]})

    return labels.map_batches(finish, batch_format="pyarrow").sort("doc_id")


DOCS_DEDUP_COMPONENTS_SQL = f"""
WITH RECURSIVE tok AS (
  SELECT doc_id, unnest(list_distinct({_TOKENS_SQL})) AS token
  FROM documents WHERE doc_id < {JACCARD_DOC_LIMIT}
),
sizes AS (
  SELECT doc_id, count(*)::BIGINT AS sz FROM tok GROUP BY doc_id
),
common AS (
  SELECT t1.doc_id AS a, t2.doc_id AS b, count(*)::BIGINT AS c
  FROM tok t1 JOIN tok t2 ON t1.token = t2.token AND t1.doc_id < t2.doc_id
  GROUP BY t1.doc_id, t2.doc_id
),
pairs AS (
  SELECT a, b FROM common
  JOIN sizes sa ON sa.doc_id = a
  JOIN sizes sb ON sb.doc_id = b
  WHERE c >= 0.8 * (sa.sz + sb.sz - c)
),
edges AS (
  SELECT a AS src, b AS dst FROM pairs
  UNION ALL SELECT b AS src, a AS dst FROM pairs
),
nodes AS (
  SELECT CAST(doc_id AS BIGINT) AS node FROM documents
  WHERE doc_id < {JACCARD_DOC_LIMIT}
),
reach(node, label) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
)
SELECT node AS doc_id, CAST(MIN(label) AS BIGINT) AS component_id
FROM reach GROUP BY node ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Sequence packing — the LLM-pretraining layout op: lay every doc's
# tokens head-to-tail in doc_id order and cut fixed-size context
# windows (bins), allowing docs to straddle a boundary.  Each doc maps
# to (start_tok, first_bin, last_bin).
#
# The core primitive is a DISTRIBUTED EXCLUSIVE PREFIX SCAN over the
# global doc order, built without any block-identity assumption:
#   phase 1: per-RANGE token totals (range = doc_id // R, a driver-
#            bounded key space) via the usual combiner groupby;
#   phase 2: driver exclusive-scans the ~n/R range totals, broadcasts
#            the offsets, and B hash-buckets of ranges compute their
#            in-range cumsums vectorized (each range is wholly inside
#            one bucket, so no boundary repair — same invariant as
#            events_running_total).
# ---------------------------------------------------------------------------

PACK_BIN_TOKENS = 256  # context-window size in tokens
PACK_RANGE_DOCS = 64  # docs per scan range (drives the driver scan size)


def docs_pack_sequences(sf_dir: str, n_buckets: int = 64):
    import ray

    from ..functions.hashing import splitmix64
    from ..stages.broadcast import with_broadcast

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def tok_rows(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(d),
                "range_id": pa.array(d // PACK_RANGE_DOCS),
                "n_tokens": pa.array(T.token_counts_arrow(t["text"])),
            }
        )

    toks = ds.map_batches(
        tok_rows, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # phase 1: per-range totals -> driver exclusive scan -> broadcast
    totals = grouped_sum(
        toks, ["range_id"], {"total": ("n_tokens", "sum")}, merge="driver"
    ).to_pandas().sort_values("range_id")
    rid = totals["range_id"].values.astype(np.int64)
    tot = totals["total"].values.astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(tot)[:-1]))
    ref = ray.put((rid, offsets))

    # phase 2: in-range cumsum inside hash buckets of ranges
    def bucket_tag(t: pa.Table) -> pa.Table:
        r = t["range_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column(
            "bucket", pa.array((splitmix64(r) % np.uint64(n_buckets)).astype(np.int64))
        )

    _OUT = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_tokens", pa.int64()),
            ("start_tok", pa.int64()),
            ("first_bin", pa.int64()),
            ("last_bin", pa.int64()),
        ]
    )

    def scan_bucket(state, g: pa.Table) -> pa.Table:
        rid, offsets = state
        if g.num_rows == 0:
            return _OUT.empty_table()
        d = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = g["range_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = g["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((d, r))
        d, r, n = d[order], r[order], n[order]
        cum = np.cumsum(n)
        new_r = np.empty(len(d), dtype=bool)
        new_r[0] = True
        new_r[1:] = r[1:] != r[:-1]
        seg_first = np.maximum.accumulate(np.where(new_r, np.arange(len(d)), 0))
        in_range_excl = cum - n - (cum - n)[seg_first]
        pos = np.searchsorted(rid, r)
        start = offsets[pos] + in_range_excl
        first_bin = start // PACK_BIN_TOKENS
        last_bin = np.where(
            n > 0, (start + n - 1) // PACK_BIN_TOKENS, first_bin
        )
        return pa.table(
            {
                "doc_id": pa.array(d),
                "n_tokens": pa.array(n),
                "start_tok": pa.array(start),
                "first_bin": pa.array(first_bin),
                "last_bin": pa.array(last_bin),
            }
        )

    def scan_wrap(state, g: pa.Table) -> pa.Table:
        return scan_bucket(state, g)

    out = (
        toks.map_batches(bucket_tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            with_broadcast(ref, scan_wrap, "pack_scan"), batch_format="pyarrow"
        )
    )
    return out.sort("doc_id")


DOCS_PACK_SEQUENCES_SQL = f"""
WITH t AS (
  SELECT doc_id, CAST(len({_TOKENS_SQL}) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS start_tok
  FROM t
)
SELECT doc_id, n_tokens, start_tok,
       start_tok // {PACK_BIN_TOKENS} AS first_bin,
       CASE WHEN n_tokens > 0
            THEN (start_tok + n_tokens - 1) // {PACK_BIN_TOKENS}
            ELSE start_tok // {PACK_BIN_TOKENS} END AS last_bin
FROM c
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Duplicated n-gram spans (Lee et al. 2022 "Deduplicating Training Data
# Makes Language Models Better" — the n-gram-granularity form): for
# every document, how many of its n-gram positions carry an n-gram that
# also appears in ANOTHER document.  The canonical pre-training signal
# for boilerplate / template contamination.
#
# Scale shape: one vectorized explode stage (no Python over tokens),
# per-doc combine inside the batch, then ONE hash-partition exchange on
# the gram hash (the honest cost of exact corpus-wide counting — the
# gram keyspace is unbounded so no driver merge), a bounded-bucket
# segment scan, and a doc_id grouped_sum + left join back to totals.
# ---------------------------------------------------------------------------

_DUP_NGRAM_N = 5


def _gram_hashes(t: pa.Table, n: int):
    """(doc_ids_per_gram, gram_hash_u64) for every n-gram position in
    the batch — pure Arrow/numpy: flat tokenization, shifted takes,
    one binary_join_element_wise, one vectorized string hash."""
    from ..functions.hashing import hash_strings

    flat, _docidx, counts = T.flat_tokens(t["text"])
    d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    npos = np.maximum(counts - (n - 1), 0)
    starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
    pos_doc = np.repeat(np.arange(len(counts), dtype=np.int64), npos)
    pstart = np.concatenate(([0], np.cumsum(npos)))
    local = np.arange(int(npos.sum()), dtype=np.int64) - pstart[pos_doc]
    base = starts[pos_doc] + local
    if len(base) == 0:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    parts = [flat.take(pa.array(base + j)) for j in range(n)]
    grams = pc.binary_join_element_wise(*parts, " ")
    gh = hash_strings(grams).astype(np.uint64)
    return d[pos_doc], gh


def docs_dup_ngrams(sf_dir: str, n: int = _DUP_NGRAM_N, n_buckets: int = 64):
    """Per-doc duplicated-n-gram stats: (doc_id, n_grams, n_dup,
    dup_frac) where n_dup counts gram POSITIONS whose gram occurs in
    more than one distinct document corpus-wide.  Docs with fewer than
    ``n`` tokens are excluded (no gram positions), matching the SQL.

    Collision note: grams are compared by a fixed-key 64-bit siphash
    (functions/hashing.hash_strings) rather than by string — the
    exchange ships 8-byte keys instead of unbounded gram text.  A
    collision would need two distinct grams with equal hashes
    (~m^2/2^65 for m distinct grams; ~1e-9 even at 10^9 grams), and the
    sf-scale oracles would catch any deterministic instance."""
    from ..functions.hashing import splitmix64
    from ..stages.join import hash_join

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    _PAIRS = pa.schema(
        [("doc_id", pa.int64()), ("gh", pa.uint64()), ("cnt", pa.int64())]
    )

    def pairs(t: pa.Table) -> pa.Table:
        d, gh = _gram_hashes(t, n)
        if len(d) == 0:
            return _PAIRS.empty_table()
        order = np.lexsort((d, gh))
        d, gh = d[order], gh[order]
        new = np.ones(len(d), dtype=bool)
        new[1:] = (gh[1:] != gh[:-1]) | (d[1:] != d[:-1])
        starts = np.flatnonzero(new)
        cnt = np.diff(np.concatenate((starts, [len(d)])))
        return pa.table(
            {
                "doc_id": pa.array(d[starts]),
                "gh": pa.array(gh[starts]),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )

    def totals(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        _flat, _di, counts = T.flat_tokens(t["text"])
        ng = np.maximum(counts - (n - 1), 0)
        keep = ng > 0
        return pa.table(
            {"doc_id": pa.array(d[keep]), "n_grams": pa.array(ng[keep])}
        )

    pair_ds = ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)

    def tag(t: pa.Table) -> pa.Table:
        gh = t["gh"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column(
            "__bkt",
            pa.array((splitmix64(gh) % np.uint64(n_buckets)).astype(np.int64)),
        )

    _DUPS = pa.schema([("doc_id", pa.int64()), ("dup_c", pa.int64())])

    def find_dups(g: pa.Table) -> pa.Table:
        # within the bucket every occurrence of a gram hash is present:
        # grams spanning >1 row here span >1 doc (pairs are per-doc
        # pre-combined), so multi-row segments are the duplicated grams
        if g.num_rows == 0:
            return _DUPS.empty_table()
        gh = g["gh"].to_numpy(zero_copy_only=False).astype(np.uint64)
        d = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = g["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(gh, kind="stable")
        gh, d, c = gh[order], d[order], c[order]
        new = np.ones(len(gh), dtype=bool)
        new[1:] = gh[1:] != gh[:-1]
        seg = np.cumsum(new) - 1
        seg_rows = np.bincount(seg)
        dup = seg_rows[seg] > 1
        return pa.table({"doc_id": pa.array(d[dup]), "dup_c": pa.array(c[dup])})

    dup_per_doc = grouped_sum(
        pair_ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__bkt")
        .map_groups(find_dups, batch_format="pyarrow"),
        ["doc_id"],
        {"n_dup": ("dup_c", "sum")},
    )

    totals_ds = ds.map_batches(totals, batch_format="pyarrow", zero_copy_batch=True)
    joined = hash_join(
        totals_ds,
        dup_per_doc,
        on="doc_id",
        left_cols=["doc_id", "n_grams"],
        right_cols=["doc_id", "n_dup"],
        how="left",
    )

    def finish(t: pa.Table) -> pa.Table:
        ng = t["n_grams"].to_numpy(zero_copy_only=False).astype(np.int64)
        nd = pc.fill_null(t["n_dup"], 0).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_grams": pa.array(ng),
                "n_dup": pa.array(nd),
                "dup_frac": pa.array(nd / ng),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow").sort("doc_id")


DOCS_DUP_NGRAMS_SQL = f"""
WITH words AS (SELECT doc_id, {_TOKENS_SQL} AS w FROM documents),
grams AS (
  SELECT doc_id, array_to_string(w[i:i+{_DUP_NGRAM_N - 1}], ' ') AS g
  FROM words, LATERAL (SELECT unnest(range(1, len(w) - {_DUP_NGRAM_N - 2})) AS i) t
  WHERE len(w) >= {_DUP_NGRAM_N}
),
gstat AS (SELECT g, count(DISTINCT doc_id) AS nd FROM grams GROUP BY g)
SELECT grams.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN gstat.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       sum(CASE WHEN gstat.nd > 1 THEN 1.0 ELSE 0.0 END) / count(*) AS dup_frac
FROM grams JOIN gstat USING (g)
GROUP BY grams.doc_id
ORDER BY grams.doc_id
"""


# ---------------------------------------------------------------------------
# Repetition quality signals (Gopher / Rae et al. 2021 repetition
# filters, public recipe): per-doc top-word fraction and duplicated-
# bigram fraction.  Fully batch-local (no shuffle but the final sort) —
# each doc's stats depend only on its own tokens.
# ---------------------------------------------------------------------------


def docs_repetition(sf_dir: str):
    """(doc_id, n_tokens, top_word_frac, dup_bigram_frac): the
    most-frequent-token share and the share of bigram positions whose
    bigram repeats WITHIN the doc.  Gopher's repetition-filter family;
    a filter stage thresholds these downstream."""
    from ..functions.hashing import hash_strings

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    _OUT = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_tokens", pa.int64()),
            ("top_word_frac", pa.float64()),
            ("dup_bigram_frac", pa.float64()),
        ]
    )

    def stats(t: pa.Table) -> pa.Table:
        flat, docidx, counts = T.flat_tokens(t["text"])
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nrows = len(d)
        if len(docidx) == 0:
            return _OUT.empty_table()
        th = hash_strings(flat).astype(np.uint64)
        # per-doc max same-token count: sort (docidx, token hash),
        # segment-count, segment-max per doc
        order = np.lexsort((th, docidx))
        di, hi = docidx[order], th[order]
        new = np.ones(len(di), dtype=bool)
        new[1:] = (di[1:] != di[:-1]) | (hi[1:] != hi[:-1])
        seg = np.cumsum(new) - 1
        seg_cnt = np.bincount(seg)
        seg_doc = di[np.flatnonzero(new)]
        top_c = np.zeros(nrows, dtype=np.int64)
        np.maximum.at(top_c, seg_doc, seg_cnt)
        # per-doc duplicated-bigram positions
        bd, bh = _gram_hashes(t, 2)
        # bd holds doc_ids; map back to row index via searchsorted on a
        # batch-local sort of doc_id (doc_id unique per row in a batch)
        row_order = np.argsort(d, kind="stable")
        rpos = row_order[np.searchsorted(d[row_order], bd)]
        n_big = np.bincount(rpos, minlength=nrows).astype(np.int64)
        dup_big = np.zeros(nrows, dtype=np.int64)
        if len(bh):
            border = np.lexsort((bh, rpos))
            bi, bhs = rpos[border], bh[border]
            bnew = np.ones(len(bi), dtype=bool)
            bnew[1:] = (bi[1:] != bi[:-1]) | (bhs[1:] != bhs[:-1])
            bseg = np.cumsum(bnew) - 1
            bseg_cnt = np.bincount(bseg)
            dup_rows = bseg_cnt[bseg] > 1  # positions in repeated bigram groups
            np.add.at(dup_big, bi[dup_rows], 1)
        keep = counts > 0
        nt = counts[keep]
        with np.errstate(invalid="ignore", divide="ignore"):
            dbf = np.where(
                n_big[keep] > 0, dup_big[keep] / np.maximum(n_big[keep], 1), 0.0
            )
        return pa.table(
            {
                "doc_id": pa.array(d[keep]),
                "n_tokens": pa.array(nt),
                "top_word_frac": pa.array(top_c[keep] / nt),
                "dup_bigram_frac": pa.array(dbf),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True).sort(
        "doc_id"
    )


DOCS_REPETITION_SQL = f"""
WITH words AS (SELECT doc_id, {_TOKENS_SQL} AS w FROM documents),
tc AS (SELECT doc_id, token, count(*) AS c
       FROM (SELECT doc_id, unnest(w) AS token FROM words) GROUP BY 1, 2),
tw AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
              CAST(max(c) AS BIGINT) AS top_c
       FROM tc GROUP BY 1),
bg AS (SELECT doc_id, w[i] || ' ' || w[i+1] AS b
       FROM words, LATERAL (SELECT unnest(range(1, len(w))) AS i) t
       WHERE len(w) >= 2),
bc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
bw AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
              CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_bigrams
       FROM bc GROUP BY 1)
SELECT tw.doc_id, tw.n_tokens,
       tw.top_c * 1.0 / tw.n_tokens AS top_word_frac,
       COALESCE(bw.dup_bigrams * 1.0 / bw.n_bigrams, 0.0) AS dup_bigram_frac
FROM tw LEFT JOIN bw ON tw.doc_id = bw.doc_id
WHERE tw.n_tokens > 0
ORDER BY tw.doc_id
"""


# ---------------------------------------------------------------------------
# Shard manifest for training-data export: the deterministic
# doc -> output-shard assignment (same LCG hash convention as
# docs_sample, SQL-expressible) plus per-shard size stats — the
# planning table a sharded-parquet export (state/checkpoint.py
# checkpointed_write) and a resume both key off.  16 bounded shard
# keys -> driver merge (CLAUDE.md rule 2), no all-to-all.
# ---------------------------------------------------------------------------

N_EXPORT_SHARDS = 16


def docs_shard_manifest(sf_dir: str, n_shards: int = N_EXPORT_SHARDS):
    """(shard, n_docs, n_chars, min_doc_id, max_doc_id) per export
    shard, shard = lcg(doc_id) % n_shards.  Hash-based (not range-
    based) so shards stay balanced under any doc_id distribution and
    the assignment is reproducible across runs/partitionings."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def assign(t: pa.Table) -> pa.Table:
        k = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = (k * 2654435761 + 1013904223) % 4294967296
        return pa.table(
            {
                "shard": pa.array((h % n_shards).astype(np.int64)),
                "doc_id": t["doc_id"],
                "n_chars": t["n_chars"],
                "one": pa.array(np.ones(len(k), dtype=np.int64)),
            }
        )

    out = grouped_sum(
        ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True),
        ["shard"],
        {
            "n_docs": ("one", "sum"),
            "n_chars": ("n_chars", "sum"),
            "min_doc_id": ("doc_id", "min"),
            "max_doc_id": ("doc_id", "max"),
        },
        merge="driver",
    )
    return out.sort("shard")


def docs_shard_manifest_sql(n_shards: int = N_EXPORT_SHARDS) -> str:
    return f"""
SELECT ((doc_id * 2654435761 + 1013904223) % 4294967296) % {n_shards} AS shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS n_chars,
       min(doc_id) AS min_doc_id,
       max(doc_id) AS max_doc_id
FROM documents
GROUP BY shard
ORDER BY shard
"""


def export_documents_shards(
    sf_dir: str, out_dir: str, n_shards: int = N_EXPORT_SHARDS,
    op_version: str = "v1",
) -> dict:
    """Resumable sharded Parquet export of the documents corpus.

    Each doc goes to shard lcg(doc_id) % n_shards (exactly the
    :func:`docs_shard_manifest` assignment), one directory per shard
    with an atomic _SUCCESS + lineage record
    (state/checkpoint.checkpointed_write) — a crashed export re-run
    skips completed shards.  At fleet scale each shard directory is a
    key-range-stable unit a downstream trainer can consume while later
    shards still write."""
    from ..state import checkpoint as cp

    ds = read_table(sf_dir, "documents")

    def partition_fn(t: pa.Table):
        k = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = ((k * 2654435761 + 1013904223) % 4294967296) % n_shards
        out = {}
        for s in np.unique(h):
            out[f"shard={s:04d}"] = t.filter(pa.array(h == s))
        return out

    return cp.checkpointed_write(ds, out_dir, partition_fn, op_version)


# ---------------------------------------------------------------------------
# Web-corpus curation operators: PII redaction, URL analytics,
# paragraph-level dedup, benchmark decontamination.
#
# The synthetic documents table carries no urls/PII, so — exactly like
# docs_html_extract's markup synthesis — each query first derives a
# deterministic augmented column from (doc_id, source, lang) with
# arithmetic both engines reproduce, then runs the REAL operator on it
# under an exact SQL oracle.  All kernels are RE2-class regex in both
# engines (pyarrow.compute and DuckDB both embed RE2), so match
# semantics agree byte-for-byte.
# ---------------------------------------------------------------------------

_PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE_RE = r"\+\d-\d{3}-\d{4}"
_PII_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def docs_pii_redact(sf_dir: str):
    """PII-redaction pass (training-data scrubbing): inject a
    deterministic email/phone/IPv4 per doc, then redact all three
    classes with vectorized RE2 replace kernels and count matches.
    Pure map, no shuffle; ``text`` itself is only read (passthrough
    invariant) — the scrubbed form is a new column."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def redact(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        email = [f"user{i}@mail{i % 7}.example.com" for i in ids]
        phone = [f"+1-555-{1000 + i % 9000}" for i in ids]
        ip = [f"192.168.{i % 256}.{(i * 7) % 256}" for i in ids]
        aug = pc.binary_join_element_wise(
            t["text"],
            pa.array(email, pa.string()),
            pa.array(phone, pa.string()),
            pa.array(ip, pa.string()),
            " ",
        )
        n_email = pc.count_substring_regex(aug, _PII_EMAIL_RE)
        n_phone = pc.count_substring_regex(aug, _PII_PHONE_RE)
        n_ip = pc.count_substring_regex(aug, _PII_IP_RE)
        x = pc.replace_substring_regex(aug, _PII_EMAIL_RE, "<EMAIL>")
        x = pc.replace_substring_regex(x, _PII_PHONE_RE, "<PHONE>")
        x = pc.replace_substring_regex(x, _PII_IP_RE, "<IP>")
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "clean_text": x,
                "n_email": pc.cast(n_email, pa.int64()),
                "n_phone": pc.cast(n_phone, pa.int64()),
                "n_ip": pc.cast(n_ip, pa.int64()),
            }
        )

    return ds.map_batches(redact, batch_format="pyarrow", zero_copy_batch=True).sort(
        "doc_id"
    )


DOCS_PII_REDACT_SQL = rf"""
WITH aug AS (
  SELECT doc_id,
         text || ' user' || CAST(doc_id AS VARCHAR) || '@mail'
              || CAST(doc_id % 7 AS VARCHAR) || '.example.com'
              || ' +1-555-' || CAST(1000 + doc_id % 9000 AS VARCHAR)
              || ' 192.168.' || CAST(doc_id % 256 AS VARCHAR) || '.'
              || CAST((doc_id * 7) % 256 AS VARCHAR) AS aug
  FROM documents
)
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(aug,
         '{_PII_EMAIL_RE}', '<EMAIL>', 'g'),
         '{_PII_PHONE_RE}', '<PHONE>', 'g'),
         '{_PII_IP_RE}', '<IP>', 'g') AS clean_text,
       CAST(len(regexp_extract_all(aug, '{_PII_EMAIL_RE}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(aug, '{_PII_PHONE_RE}')) AS BIGINT) AS n_phone,
       CAST(len(regexp_extract_all(aug, '{_PII_IP_RE}')) AS BIGINT) AS n_ip
FROM aug
ORDER BY doc_id
"""


_URL_HOST_RE = r"^https://(?P<host>[^/]+)/"
_URL_DOMAIN_RE = r"(?P<dom>[A-Za-z0-9-]+\.[A-Za-z]+)$"
_URL_TLD_RE = r"\.(?P<tld>[A-Za-z]+)$"


def docs_url_parse(sf_dir: str):
    """URL parsing/analytics over a Common-Crawl-style url column:
    synthesize the deterministic url (scheme://www.<source>.example.<lang>
    /<lang>/docs/<doc_id>.html), then extract host, registered domain,
    TLD and path depth with vectorized RE2 extract kernels — the
    canonical first stage of per-domain corpus curation."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "source", "lang"])

    def parse(t: pa.Table) -> pa.Table:
        url = pc.binary_join_element_wise(
            pa.array(["https://www."] * t.num_rows, pa.string()),
            t["source"],
            pa.array([".example."] * t.num_rows, pa.string()),
            t["lang"],
            pa.array(["/"] * t.num_rows, pa.string()),
            t["lang"],
            pa.array(["/docs/"] * t.num_rows, pa.string()),
            pc.cast(t["doc_id"], pa.string()),
            pa.array([".html"] * t.num_rows, pa.string()),
            "",
        )
        host = pc.struct_field(pc.extract_regex(url, _URL_HOST_RE), "host")
        domain = pc.struct_field(pc.extract_regex(host, _URL_DOMAIN_RE), "dom")
        tld = pc.struct_field(pc.extract_regex(host, _URL_TLD_RE), "tld")
        # path depth = '/' count minus the two scheme slashes and the
        # host-terminating one is included: https://h/a/docs/x.html -> 3
        depth = pc.subtract(
            pc.cast(pc.count_substring(url, "/"), pa.int64()), pa.scalar(2, pa.int64())
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "url": url,
                "host": host,
                "domain": domain,
                "tld": tld,
                "path_depth": depth,
            }
        )

    return ds.map_batches(parse, batch_format="pyarrow", zero_copy_batch=True).sort(
        "doc_id"
    )


DOCS_URL_PARSE_SQL = rf"""
WITH u AS (
  SELECT doc_id,
         'https://www.' || source || '.example.' || lang || '/' || lang
           || '/docs/' || CAST(doc_id AS VARCHAR) || '.html' AS url
  FROM documents
)
SELECT doc_id, url,
       regexp_extract(url, '{_URL_HOST_RE}', 1) AS host,
       regexp_extract(regexp_extract(url, '{_URL_HOST_RE}', 1),
                      '{_URL_DOMAIN_RE}', 1) AS domain,
       regexp_extract(regexp_extract(url, '{_URL_HOST_RE}', 1),
                      '{_URL_TLD_RE}', 1) AS tld,
       CAST(len(url) - len(replace(url, '/', '')) - 2 AS BIGINT) AS path_depth
FROM u
ORDER BY doc_id
"""


def docs_domain_stats(sf_dir: str):
    """Per-domain corpus stats (the groupby that follows URL parsing):
    doc count + total chars per host, combiner-first then a distributed
    shuffle merge — hosts are UNBOUNDED on a real crawl, so no driver
    merge (CLAUDE.md rule 2 applies only to provably bounded keys)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "source", "lang", "n_chars"])

    def host_of(t: pa.Table) -> pa.Table:
        host = pc.binary_join_element_wise(
            pa.array(["www."] * t.num_rows, pa.string()),
            t["source"],
            pa.array([".example."] * t.num_rows, pa.string()),
            t["lang"],
            "",
        )
        return pa.table(
            {
                "host": host,
                "n_chars": pc.cast(t["n_chars"], pa.int64()),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    ds = ds.map_batches(host_of, batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_sum(
        ds,
        ["host"],
        {"n_docs": ("one", "sum"), "total_chars": ("n_chars", "sum")},
    )
    return out.sort("host")


DOCS_DOMAIN_STATS_SQL = """
SELECT 'www.' || source || '.example.' || lang AS host,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1
ORDER BY host
"""


def docs_paragraph_dedup(sf_dir: str):
    """Paragraph-level exact dedup (the C4/RefinedWeb line-dedup shape):
    explode each doc into paragraphs, keep the globally FIRST occurrence
    of every distinct paragraph (min by (doc_id, para_idx)), emit the
    survivors.  The synthetic corpus has no newlines, so the word
    ``" part "`` serves as the deterministic paragraph boundary — the
    operator shape (vectorized list explode -> distributed keep-first
    grouped-min over an UNBOUNDED string key -> decode) is exactly the
    100 TB design; only the separator is synthetic.

    Explode is zero-Python: split_pattern -> list_flatten +
    list_parent_indices, with the within-doc index recovered from the
    list offsets.  Keep-first uses one shuffle grouped-min over an
    encoded rank (doc_id << 20 | idx), never a driver merge."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return paragraph_dedup_ds(ds).sort(["doc_id", "para_idx"])


def paragraph_dedup_ds(ds, sep: str = " part ", id_col: str = "doc_id"):
    """Dataset-level paragraph keep-first dedup over (id_col, text);
    see :func:`docs_paragraph_dedup`.  Unsorted output (callers sort)."""

    def explode(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t["text"], sep)
        parts = parts.combine_chunks() if isinstance(parts, pa.ChunkedArray) else parts
        flat = pc.list_flatten(parts)
        parent = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
        offs = parts.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.arange(len(flat), dtype=np.int64) - offs[parent]
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)[parent]
        # the packed rank is only injective while idx fits 20 bits and
        # ids fit the remaining 43 — guard loudly rather than silently
        # corrupting the keep-first winner (a >=2^20-paragraph doc or a
        # >=2^43 doc_id is plausible at corpus scale)
        if len(ids) and (
            int(idx.max()) >= (1 << 20)
            or int(ids.max()) >= (1 << 43)
            or int(ids.min()) < 0
        ):
            raise ValueError(
                "paragraph_dedup_ds rank overflow: need 0 <= para_idx < 2^20 "
                "and 0 <= doc_id < 2^43; widen to a two-column grouped-min"
            )
        rank = (ids << np.int64(20)) | idx
        return pa.table({"para": flat, "rank": pa.array(rank)})

    ex = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    won = grouped_sum(ex, ["para"], {"rank": ("rank", "min")})

    def decode(t: pa.Table) -> pa.Table:
        rank = t["rank"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(rank >> 20),
                "para_idx": pa.array(rank & ((1 << 20) - 1)),
                "para": t["para"],
            }
        )

    return won.map_batches(decode, batch_format="pyarrow", zero_copy_batch=True)


DOCS_PARAGRAPH_DEDUP_SQL = """
WITH ex AS (
  SELECT doc_id,
         unnest(string_split(text, ' part ')) AS para,
         generate_subscripts(string_split(text, ' part '), 1) AS idx1
  FROM documents
), ranked AS (
  SELECT doc_id, idx1, para,
         row_number() OVER (PARTITION BY para ORDER BY doc_id, idx1) AS rn
  FROM ex
)
SELECT doc_id, CAST(idx1 - 1 AS BIGINT) AS para_idx, para
FROM ranked WHERE rn = 1
ORDER BY doc_id, para_idx
"""


def docs_decontaminate(sf_dir: str):
    """Benchmark decontamination (the eval-overlap scrub every training
    corpus needs): a small 'benchmark' set — docs with doc_id % 97 == 0
    — contributes one 40-char snippet each (its text prefix); every doc
    is scanned for exact snippet containment and scored with the hit
    count.  The benchmark side is tiny by construction, so it rides the
    task closure as broadcast state (CLAUDE.md rule 3) and the scan is
    a fused vectorized match_substring per snippet — no join, no
    shuffle, stream-safe at any corpus size."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    # the benchmark set is derived by a distributed filter + slice, so
    # only the (tiny) snippet rows land on the driver — never the full
    # text column (the corpus is the big side here)
    def pick(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = pa.array(ids % 97 == 0)
        return pa.table(
            {"snippet": pc.utf8_slice_codeunits(t["text"].filter(m), 0, 40)}
        )

    snippets = [
        s.as_py()
        for b in ds.map_batches(
            pick, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow")
        for s in b["snippet"]
    ]

    def scan(t: pa.Table) -> pa.Table:
        hits = np.zeros(t.num_rows, dtype=np.int64)
        for s in snippets:
            hits += pc.cast(
                pc.match_substring(t["text"], s), pa.int64()
            ).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_hits": pa.array(hits),
                "contaminated": pa.array(hits > 0),
            }
        )

    return ds.map_batches(scan, batch_format="pyarrow", zero_copy_batch=True).sort(
        "doc_id"
    )


DOCS_DECONTAMINATE_SQL = """
SELECT d.doc_id,
       CAST((SELECT count(*) FROM documents b
             WHERE b.doc_id % 97 = 0
               AND contains(d.text, substring(b.text, 1, 40))) AS BIGINT) AS n_hits,
       (SELECT count(*) FROM documents b
        WHERE b.doc_id % 97 = 0
          AND contains(d.text, substring(b.text, 1, 40))) > 0 AS contaminated
FROM documents d
ORDER BY d.doc_id
"""


# BPE-ish tokenizer pass: the GPT-2 pretokenizer regex family, RE2-
# compatible (no lookahead — RE2 has none, so the trailing-space
# alternations are simplified).  Identical pattern string in both
# engines => identical non-overlapping leftmost matches.
_BPE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def docs_bpe_token_count(sf_dir: str):
    """Token counting for training-data budgeting: whitespace tokens
    AND a BPE-ish regex pretokenization (SURVEY §2 text-analysis row),
    both as vectorized RE2 count kernels — zero Python per row, pure
    map, no shuffle."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def count(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bpe": pc.cast(pc.count_substring_regex(t["text"], _BPE_RE), pa.int64()),
                "n_ws": pc.cast(pc.count_substring_regex(t["text"], r"\S+"), pa.int64()),
            }
        )

    return ds.map_batches(count, batch_format="pyarrow", zero_copy_batch=True).sort(
        "doc_id"
    )


DOCS_BPE_TOKEN_SQL = rf"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_BPE_RE.replace("'", "''")}')) AS BIGINT) AS n_bpe,
       CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_ws
FROM documents
ORDER BY doc_id
"""


def docs_bigrams(sf_dir: str, k: int = 30):
    """Corpus-level bigram counts (LM-data n-gram statistics): build
    consecutive-token pairs per doc with pure Arrow slicing (no Python
    strings), combiner-first counting, one shuffle merge over the
    UNBOUNDED bigram key, then global top-k.  The explode never ships
    raw text — only (bigram, partial_count) rows cross the exchange."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def pairs(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(nonempty))
        parent = parent[nonempty]
        if len(flat) < 2:
            return pa.table(
                {"bigram": pa.array([], pa.string()), "one": pa.array([], pa.int64())}
            )
        a = flat.slice(0, len(flat) - 1)
        b = flat.slice(1)
        same = pa.array(parent[1:] == parent[:-1])
        bg = pc.binary_join_element_wise(a.filter(same), b.filter(same), " ")
        return pa.table(
            {"bigram": bg, "one": pa.array(np.ones(len(bg), dtype=np.int64))}
        )

    ds = ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
    counts = grouped_sum(ds, ["bigram"], {"n": ("one", "sum")})
    return counts.sort(["n", "bigram"], descending=[True, False]).limit(k)


def docs_bigrams_sql(k: int = 30) -> str:
    return f"""
WITH tok AS (
  SELECT doc_id,
         unnest({_TOKENS_SQL}) AS w,
         generate_subscripts({_TOKENS_SQL}, 1) AS i
  FROM documents
)
SELECT t1.w || ' ' || t2.w AS bigram, CAST(count(*) AS BIGINT) AS n
FROM tok t1
JOIN tok t2 ON t1.doc_id = t2.doc_id AND t2.i = t1.i + 1
GROUP BY 1
ORDER BY n DESC, bigram
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Round-3 curation batch 2: Gopher-style quality rules, per-domain
# quota sampling, token-window chunking, end-to-end near-dup purge.
# ---------------------------------------------------------------------------


def docs_gopher_rules(sf_dir: str):
    """Gopher-style composite quality filter (Rae et al. 2021 §A1.1,
    public): word-count bounds, mean-word-length bounds, and a
    minimum alphabetic-word fraction, evaluated with integer-only
    arithmetic so the SQL twin is bit-exact.  Fully vectorized RE2
    count kernels; pure map, no shuffle.

    keep = 5 <= n_words <= 10000
           AND 3*n_words <= nonspace_chars <= 10*n_words   (mean wlen 3..10)
           AND 5*alpha_words >= 4*n_words                  (>= 80% alpha)
    """
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])

    def score(t: pa.Table) -> pa.Table:
        nw = pc.cast(pc.count_substring_regex(t["text"], r"\S+"), pa.int64())
        # nonspace chars = total chars - whitespace chars
        n_ws = pc.cast(pc.count_substring_regex(t["text"], r"\s"), pa.int64())
        nonspace = pc.subtract(
            pc.cast(pc.utf8_length(t["text"]), pa.int64()), n_ws
        )
        alpha = pc.cast(
            pc.count_substring_regex(t["text"], r"\S*[A-Za-z]\S*"), pa.int64()
        )
        nwn = nw.to_numpy(zero_copy_only=False)
        nsn = nonspace.to_numpy(zero_copy_only=False)
        aln = alpha.to_numpy(zero_copy_only=False)
        keep = (
            (nwn >= 5)
            & (nwn <= 10000)
            & (3 * nwn <= nsn)
            & (nsn <= 10 * nwn)
            & (5 * aln >= 4 * nwn)
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_words": nw,
                "nonspace_chars": nonspace,
                "alpha_words": alpha,
                "keep": pa.array(keep),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True).sort(
        "doc_id"
    )


DOCS_GOPHER_RULES_SQL = r"""
WITH m AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_words,
         CAST(length(text) - len(regexp_extract_all(text, '\s')) AS BIGINT)
           AS nonspace_chars,
         CAST(len(regexp_extract_all(text, '\S*[A-Za-z]\S*')) AS BIGINT)
           AS alpha_words
  FROM documents
)
SELECT doc_id, n_words, nonspace_chars, alpha_words,
       (n_words >= 5 AND n_words <= 10000
        AND 3 * n_words <= nonspace_chars AND nonspace_chars <= 10 * n_words
        AND 5 * alpha_words >= 4 * n_words) AS keep
FROM m
ORDER BY doc_id
"""


DOMAIN_QUOTA_BUCKETS = 64


def docs_domain_quota(sf_dir: str, quota: int = 3):
    """Per-domain quota sampling (cap every host's contribution — the
    standard anti-domination pass over a crawl): keep the `quota`
    docs with the LOWEST doc_id per host.

    Scale shape: hosts are unbounded, so per-host ranking runs inside
    a BOUNDED bucket co-partition — bucket = hash(host) % B, one
    map_groups call per bucket (B = 64, never per host; CLAUDE.md
    rule 1), with the in-bucket rank computed by one lexsort + one
    vectorized segment-position pass."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "source", "lang"])

    def prep(t: pa.Table) -> pa.Table:
        host = pc.binary_join_element_wise(
            pa.array(["www."] * t.num_rows, pa.string()),
            t["source"],
            pa.array([".example."] * t.num_rows, pa.string()),
            t["lang"],
            "",
        )
        from ..functions.hashing import hash_strings

        b = (hash_strings(host) % np.uint64(DOMAIN_QUOTA_BUCKETS)).astype(
            np.int64
        )
        return pa.table({"doc_id": t["doc_id"], "host": host, "bucket": pa.array(b)})

    def rank_filter(t: pa.Table) -> pa.Table:
        # dictionary-encode hosts -> int codes so the sort is numeric
        henc = pc.dictionary_encode(t["host"].combine_chunks())
        hcode = henc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, hcode))
        h_sorted = hcode[order]
        # segment-relative position: index within the run of equal hosts
        starts = np.r_[0, np.flatnonzero(h_sorted[1:] != h_sorted[:-1]) + 1]
        seg_id = np.searchsorted(starts, np.arange(len(order)), side="right") - 1
        pos = np.arange(len(order)) - starts[seg_id]
        kept = np.sort(order[pos < quota])
        return pa.table(
            {
                "doc_id": pa.array(ids[kept]),
                "host": t["host"].take(pa.array(kept)),
            }
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    out = prepped.groupby("bucket").map_groups(rank_filter, batch_format="pyarrow")
    return out.sort("doc_id")


def docs_domain_quota_sql(quota: int = 3) -> str:
    return f"""
WITH h AS (
  SELECT doc_id, 'www.' || source || '.example.' || lang AS host,
         row_number() OVER (PARTITION BY 'www.' || source || '.example.' || lang
                            ORDER BY doc_id) AS rn
  FROM documents
)
SELECT doc_id, host FROM h WHERE rn <= {quota} ORDER BY doc_id
"""


CHUNK_W = 32
CHUNK_S = 16


def docs_chunk_windows(sf_dir: str, w: int = CHUNK_W, s: int = CHUNK_S):
    """Token-window chunking (the pretraining/RAG chunker): slide a
    W-token window with stride S over each doc's token sequence and
    emit (doc_id, win_idx, win_start, win_len, first_tok, last_tok).
    Windows start while start < n_tokens; the last window may be short.

    Zero-Python explode: split_pattern list offsets -> numpy repeat for
    the per-doc window counts -> flat-array gathers for the boundary
    tokens.  Pure map + explode, no shuffle."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def chunk(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t["text"], " ")
        parts = parts.combine_chunks() if isinstance(parts, pa.ChunkedArray) else parts
        # tokenization contract: drop empties (multi-space runs)
        mask = pc.not_equal(pc.list_flatten(parts), "")
        flat_all = pc.list_flatten(parts)
        offs = parts.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        keep = mask.to_numpy(zero_copy_only=False)
        # per-doc token counts after the empty-drop
        parent = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
        n_tok = np.bincount(parent[keep], minlength=t.num_rows).astype(np.int64)
        flat = flat_all.filter(mask)
        new_offs = np.r_[0, np.cumsum(n_tok)]
        # windows per doc: ceil(n/s) for n>0 (start < n), 0 for empty
        n_win = np.where(n_tok > 0, (n_tok + s - 1) // s, 0)
        doc_rep = np.repeat(np.arange(t.num_rows, dtype=np.int64), n_win)
        win_idx = np.arange(int(n_win.sum()), dtype=np.int64) - np.repeat(
            np.r_[0, np.cumsum(n_win)][:-1], n_win
        )
        win_start = win_idx * s
        win_len = np.minimum(w, n_tok[doc_rep] - win_start)
        first_i = new_offs[doc_rep] + win_start
        last_i = first_i + win_len - 1
        first_tok = flat.take(pa.array(first_i))
        last_tok = flat.take(pa.array(last_i))
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids[doc_rep]),
                "win_idx": pa.array(win_idx),
                "win_start": pa.array(win_start),
                "win_len": pa.array(win_len),
                "first_tok": first_tok,
                "last_tok": last_tok,
            }
        )

    return ds.map_batches(chunk, batch_format="pyarrow", zero_copy_batch=True).sort(
        ["doc_id", "win_idx"]
    )


def docs_chunk_windows_sql(w: int = CHUNK_W, s: int = CHUNK_S) -> str:
    return f"""
WITH tok AS (
  SELECT doc_id, {_TOKENS_SQL} AS toks, len({_TOKENS_SQL}) AS n
  FROM documents
),
win AS (
  SELECT doc_id, toks, n,
         unnest(generate_series(0, CAST(ceil(n / {s}.0) AS BIGINT) - 1)) AS gs
  FROM tok WHERE n > 0
)
SELECT doc_id,
       CAST(gs AS BIGINT) AS win_idx,
       CAST(gs * {s} AS BIGINT) AS win_start,
       CAST(least({w}, n - gs * {s}) AS BIGINT) AS win_len,
       toks[gs * {s} + 1] AS first_tok,
       toks[gs * {s} + least({w}, n - gs * {s})] AS last_tok
FROM win
ORDER BY doc_id, win_idx
"""


def docs_neardup_purge(sf_dir: str):
    """End-to-end near-duplicate REMOVAL (the full curation op the
    dedup family builds toward): Jaccard pair graph -> connected
    components (min-label propagation) -> keep each component's
    canonical doc (its min doc_id == the propagated label) -> emit
    the surviving corpus rows.  Because the component label IS the
    component's minimum doc_id, the winner test is a vectorized
    doc_id == component_id filter — no extra shuffle beyond the
    component computation itself."""
    comps = docs_dedup_components(sf_dir)

    def winners(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["doc_id"], t["component_id"])
        return t.filter(keep).select(["doc_id"])

    surv = comps.map_batches(winners, batch_format="pyarrow", zero_copy_batch=True)
    docs = read_table(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])

    from ..stages.join import hash_join

    out = hash_join(
        surv,
        docs.map_batches(
            lambda t: pa.table(
                {
                    "doc_id": pc.cast(t["doc_id"], pa.int64()),
                    "lang": t["lang"],
                    "n_chars": pc.cast(t["n_chars"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ),
        on="doc_id",
        left_cols=["doc_id"],
        right_cols=["doc_id", "lang", "n_chars"],
    )
    return out.sort("doc_id")


DOCS_NEARDUP_PURGE_SQL = f"""
WITH RECURSIVE tok AS (
  SELECT doc_id, unnest(list_distinct({_TOKENS_SQL})) AS token
  FROM documents WHERE doc_id < {{limit}}
),
sizes AS (
  SELECT doc_id, count(*)::BIGINT AS sz FROM tok GROUP BY doc_id
),
common AS (
  SELECT t1.doc_id AS a, t2.doc_id AS b, count(*)::BIGINT AS c
  FROM tok t1 JOIN tok t2 ON t1.token = t2.token AND t1.doc_id < t2.doc_id
  GROUP BY t1.doc_id, t2.doc_id
),
pairs AS (
  SELECT a, b FROM common
  JOIN sizes sa ON sa.doc_id = a
  JOIN sizes sb ON sb.doc_id = b
  WHERE c >= 0.8 * (sa.sz + sb.sz - c)
),
edges AS (
  SELECT a AS src, b AS dst FROM pairs
  UNION ALL SELECT b AS src, a AS dst FROM pairs
),
nodes AS (
  SELECT CAST(doc_id AS BIGINT) AS node FROM documents
  WHERE doc_id < {{limit}}
),
reach(node, label) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
),
comp AS (
  SELECT node AS doc_id, MIN(label) AS component_id FROM reach GROUP BY node
)
SELECT c.doc_id, d.lang, CAST(d.n_chars AS BIGINT) AS n_chars
FROM comp c JOIN documents d ON d.doc_id = c.doc_id
WHERE c.doc_id = c.component_id
ORDER BY c.doc_id
"""
DOCS_NEARDUP_PURGE_SQL = DOCS_NEARDUP_PURGE_SQL.format(limit=JACCARD_DOC_LIMIT)


# ---------------------------------------------------------------------------
# Incremental (recrawl) dedup: new-shard docs whose content already
# exists in the ingested corpus are dropped BEFORE they enter the
# pipeline — the standing 10^12-doc scenario where every fresh crawl
# shard must dedup against everything crawled before it.
# ---------------------------------------------------------------------------


def docs_incremental_dedup(
    sf_dir: str, broadcast_threshold: int = 4_000_000, n_buckets: int = 64
):
    """Keep the incoming shard's docs whose content hash is ABSENT from
    the already-ingested corpus (an anti-semi-join on content).

    Corpus = even doc_id, incoming shard = odd doc_id — a deterministic
    split of ``documents`` standing in for corpus + new crawl shard
    (both filters push into the parquet read).  Both sides reduce to
    63-bit SipHash content hashes at the scan, so at most 16 B/row ever
    crosses an exchange — never text.  Plan mirrors dedup_by_url:

    - a CAPPED driver probe streams the corpus' per-batch DISTINCT
      hashes, compacting incrementally; if the corpus' distinct content
      count fits ``broadcast_threshold`` the sorted hash array
      broadcasts once (ray.put) into a fused task-side searchsorted
      filter — ZERO exchanges (CLAUDE.md rules 2/11).  Driver memory
      stays bounded by ~2x threshold x 8 B regardless of corpus size.
    - otherwise: hash-partitioned anti-join (stages/join.hash_join
      how="anti") — ONE exchange, absent-hash test vectorized per
      bucket, nothing materialized on the driver.

    Internal duplicates WITHIN the incoming shard are kept (they dedup
    against each other in the regular exact-dedup stage); only overlap
    with the corpus is removed — matching the NOT EXISTS oracle.
    63-bit hash equality stands in for text equality exactly as in
    docs_exact_dedup (collision odds ~n^2 / 2^63).
    """
    import ray

    from ..functions.hashing import hash_strings
    from ..stages.broadcast import with_broadcast
    from ..stages.join import hash_join

    def hash_stage(cols):
        def fn(t: pa.Table) -> pa.Table:
            h = hash_strings(t["text"])
            out = {c: t[c] for c in cols}
            out["text_hash"] = pa.array(
                (h & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
            )
            return pa.table(out)

        return fn

    corpus = read_table(
        sf_dir,
        "documents",
        columns=["text"],
        filter=pc.bit_wise_and(pc.field("doc_id"), 1) == 0,
    ).map_batches(
        lambda t: pa.table(
            {
                "text_hash": pa.array(
                    np.unique(
                        hash_strings(t["text"]) & np.uint64(0x7FFFFFFFFFFFFFFF)
                    ).astype(np.int64)
                )
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    incoming = read_table(
        sf_dir,
        "documents",
        columns=["doc_id", "text"],
        filter=pc.bit_wise_and(pc.field("doc_id"), 1) == 1,
    ).map_batches(hash_stage(["doc_id"]), batch_format="pyarrow", zero_copy_batch=True)

    # capped probe: stream corpus DISTINCT-per-batch hashes, compact
    cap = int(broadcast_threshold)
    buf: list[np.ndarray] = []
    buffered = 0
    over = False
    for b in corpus.iter_batches(batch_size=None, batch_format="pyarrow"):
        if b.num_rows == 0:
            continue
        buf.append(b["text_hash"].to_numpy(zero_copy_only=False))
        buffered += len(buf[-1])
        if buffered > 2 * cap:
            buf = [np.unique(np.concatenate(buf))]
            buffered = len(buf[0])
            if buffered > cap:
                over = True
                break

    if not over:
        seen = np.unique(np.concatenate(buf)) if buf else np.array([], dtype=np.int64)
        if len(seen) <= cap:
            ref = ray.put(seen)

            def anti(state, t: pa.Table) -> pa.Table:
                sorted_seen = state
                h = t["text_hash"].to_numpy(zero_copy_only=False)
                if len(sorted_seen) == 0:
                    keep = np.ones(len(h), dtype=bool)
                else:
                    pos = np.searchsorted(sorted_seen, h).clip(0, len(sorted_seen) - 1)
                    keep = sorted_seen[pos] != h
                return t.filter(pa.array(keep)).select(["doc_id"])

            return incoming.map_batches(
                with_broadcast(ref, anti, "incremental_anti"),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ).sort("doc_id")

    kept = hash_join(
        incoming,
        corpus,
        on="text_hash",
        n_buckets=n_buckets,
        left_cols=["text_hash", "doc_id"],
        right_cols=["text_hash"],
        how="anti",
    )
    return kept.select_columns(["doc_id"]).sort("doc_id")


DOCS_INCREMENTAL_DEDUP_SQL = """
SELECT n.doc_id
FROM documents n
WHERE n.doc_id % 2 = 1
  AND NOT EXISTS (
    SELECT 1 FROM documents c
    WHERE c.doc_id % 2 = 0 AND c.text = n.text
  )
ORDER BY n.doc_id
"""


# ---------------------------------------------------------------------------
# TF-IDF weighted pair similarity: the inverted-index join with GLOBAL
# term weights (the classic sparse-vector similarity join).  All-integer
# weight formula so DuckDB and numpy agree bitwise at any scale.
# ---------------------------------------------------------------------------

TFIDF_IDF_CAP = 100_000  # bounds idf so int64 score sums cannot overflow
TFIDF_TOP_K = 1000

_TFIDF_PAIR_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.int64()), ("w", pa.int64())])


def docs_tfidf_pairs(
    sf_dir: str,
    k: int = TFIDF_TOP_K,
    df_cutoff: int = JACCARD_DF_CUTOFF,
    n_groups: int = 64,
):
    """Top-k document pairs by integer TF-IDF dot product.

    score(a, b) = SUM over shared terms t of tf_a(t) * tf_b(t) * idf(t)^2
    where idf(t) = min((1000 * N) // df(t), TFIDF_IDF_CAP) — floor
    division and min are integer-exact in both engines, and N (the
    window's doc count) derives from the data on BOTH sides, so the
    oracle holds at every sf.

    Shuffle shape mirrors docs_jaccard_pairs (postings hash-bucket by
    term, ONE vectorized merge call per group; a term's postings are
    co-located so the in-group segment length IS its global df and the
    df cutoff needs no extra pass) with two scale upgrades: postings
    carry the 63-bit SipHash term id instead of the token string
    (8 B/term on the exchange at any vocabulary; a hash collision
    merging two terms has odds ~v^2/2^63), and the final ranking runs a
    per-block partial top-k before the global sort, bounding the sort
    input at k x n_blocks rows regardless of pair count.
    """
    import pyarrow.parquet as _pq

    from ..functions.hashing import hash_strings, splitmix64

    limit = JACCARD_DOC_LIMIT
    n_docs = _pq.read_table(
        table_path(sf_dir, "documents"),
        columns=["doc_id"],
        filters=[("doc_id", "<", limit)],
    ).num_rows

    ds = read_table(
        sf_dir,
        "documents",
        columns=["doc_id", "text"],
        filter=pc.field("doc_id") < limit,
    )

    def postings(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [
                    ("grp", pa.int64()),
                    ("doc_id", pa.int64()),
                    ("th", pa.int64()),
                    ("tf", pa.int64()),
                ]
            ).empty_table()
        flat, docidx, _counts = T.flat_tokens(t["text"])
        h = (hash_strings(flat) & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
        doc = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)[docidx]
        order = np.lexsort((h, doc))
        hs, dcs = h[order], doc[order]
        first = np.ones(len(hs), dtype=bool)
        first[1:] = (hs[1:] != hs[:-1]) | (dcs[1:] != dcs[:-1])
        starts = np.flatnonzero(first)
        tf = np.diff(np.append(starts, len(hs))).astype(np.int64)
        uh, ud = hs[starts], dcs[starts]
        grp = (splitmix64(uh.astype(np.uint64)) % np.uint64(n_groups)).astype(np.int64)
        return pa.table(
            {
                "grp": pa.array(grp),
                "doc_id": pa.array(ud),
                "th": pa.array(uh),
                "tf": pa.array(tf),
            }
        )

    posting = ds.map_batches(postings, batch_format="pyarrow", zero_copy_batch=True)

    idf_cap = np.int64(TFIDF_IDF_CAP)

    def pair_weights(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _TFIDF_PAIR_SCHEMA.empty_table()
        th = g["th"].to_numpy(zero_copy_only=False)
        doc = g["doc_id"].to_numpy(zero_copy_only=False)
        tf = g["tf"].to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, th))
        th_s, doc_s, tf_s = th[order], doc[order], tf[order]
        first = np.ones(len(th_s), dtype=bool)
        first[1:] = th_s[1:] != th_s[:-1]
        seg_id = np.cumsum(first) - 1
        starts = np.flatnonzero(first)
        df = np.diff(np.append(starts, len(th_s))).astype(np.int64)
        idf = np.minimum((np.int64(1000) * np.int64(n_docs)) // df, idf_cap)
        idf_sq_row = (idf * idf)[seg_id]
        ok = df[seg_id] <= df_cutoff
        pos = np.arange(len(th_s), dtype=np.int64) - starts[seg_id]
        rep = np.where(ok, pos, 0)
        total = int(rep.sum())
        b_idx = np.repeat(np.arange(len(th_s), dtype=np.int64), rep)
        offs = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(rep) - rep, rep)
        a_idx = np.repeat(starts[seg_id], rep) + offs
        w = tf_s[a_idx] * tf_s[b_idx] * idf_sq_row[b_idx]
        return pa.table(
            {
                "a": pa.array(doc_s[a_idx]),
                "b": pa.array(doc_s[b_idx]),
                "w": pa.array(w),
            }
        )

    scores = grouped_sum(
        posting.groupby("grp").map_groups(pair_weights, batch_format="pyarrow"),
        ["a", "b"],
        {"score": ("w", "sum")},
    )

    def partial_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        s = t["score"].to_numpy(zero_copy_only=False)
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        sel = np.lexsort((b, a, -s))[:k]
        return t.take(pa.array(sel))

    return (
        scores.map_batches(partial_topk, batch_format="pyarrow")
        .sort(["score", "a", "b"], descending=[True, False, False])
        .limit(k)
    )


DOCS_TFIDF_PAIRS_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKENS_SQL}) AS term
  FROM documents WHERE doc_id < {JACCARD_DOC_LIMIT}
),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, term
),
df AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
),
nn AS (
  SELECT count(*)::BIGINT AS n FROM documents WHERE doc_id < {JACCARD_DOC_LIMIT}
),
w AS (
  SELECT term, LEAST((1000 * (SELECT n FROM nn)) // df, {TFIDF_IDF_CAP})::BIGINT AS idf
  FROM df WHERE df <= {JACCARD_DF_CUTOFF}
),
pairs AS (
  SELECT ta.doc_id AS a, tb.doc_id AS b,
         SUM(ta.tf * tb.tf * w.idf * w.idf)::BIGINT AS score
  FROM tf ta
  JOIN tf tb ON ta.term = tb.term AND ta.doc_id < tb.doc_id
  JOIN w ON w.term = ta.term
  GROUP BY ta.doc_id, tb.doc_id
)
SELECT a, b, score FROM pairs
ORDER BY score DESC, a, b
LIMIT {TFIDF_TOP_K}
"""


# ---------------------------------------------------------------------------
# Cross-corpus fuzzy dedup: MinHash-LSH near-dups of an INCOMING shard
# against the ingested CORPUS — the fuzzy twin of docs_incremental_dedup
# (recrawl shards are near-dups of earlier crawls far more often than
# exact dups).  Rows-only (minhash seeds aren't SQL-expressible); gated
# by a brute-force containment + determinism test.
# ---------------------------------------------------------------------------


def docs_crosscorpus_neardup(
    sf_dir: str,
    num_perm: int = 128,
    n_bands: int = 16,
    threshold: float = 0.5,
    n_groups: int = 64,
):
    """(incoming_doc, corpus_doc, jaccard_pct) pairs with exact
    3-shingle jaccard >= threshold among cross-side LSH candidates
    (the verify measures the SAME similarity the signatures index).

    Corpus = even doc_id, incoming = odd doc_id (both filters pushed
    into the read).  Same distributed shape as docs_minhash_lsh —
    banding stays in Ray, candidates expand inside hash-bucketed groups
    (vectorized, one merge call per group), verification fetches texts
    through bucketed hash joins — but the in-group expansion is the
    RECTANGULAR cross product (incoming x corpus within a band bucket),
    never within-side pairs, so candidate count is bounded by the
    cross-side bucket co-occupancy, not C(bucket, 2)."""
    from ..functions.hashing import splitmix64
    from ..stages.join import hash_join
    from .common import grouped_sum

    def side_ds(parity: int):
        return read_table(
            sf_dir,
            "documents",
            columns=["doc_id", "text"],
            filter=pc.bit_wise_and(pc.field("doc_id"), 1) == parity,
        )

    def band_stage(side: int):
        def fn(t: pa.Table) -> pa.Table:
            docs = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            sigs = T.minhash_signatures_arrow(t["text"], num_perm, k=3)
            bh = T.minhash_bands_batch(sigs, n_bands)
            buckets = (bh & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
            n = len(docs)
            band = np.tile(np.arange(n_bands, dtype=np.int64), n)
            flat_bucket = buckets.ravel()
            grp = (
                splitmix64(
                    flat_bucket.astype(np.uint64)
                    ^ (band.astype(np.uint64) << np.uint64(48))
                )
                % np.uint64(n_groups)
            ).astype(np.int64)
            return pa.table(
                {
                    "grp": pa.array(grp),
                    "doc_id": pa.array(np.repeat(docs, n_bands)),
                    "band": pa.array(band),
                    "bucket": pa.array(flat_bucket),
                    "side": pa.array(np.full(n * n_bands, side, dtype=np.int8)),
                }
            )

        fn.__name__ = f"band_side{side}"
        return fn

    banded = side_ds(0).map_batches(band_stage(0), batch_format="pyarrow").union(
        side_ds(1).map_batches(band_stage(1), batch_format="pyarrow")
    )

    _EMPTY_XPAIRS = pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("one", pa.int64())]
    )

    def expand_cross(g: pa.Table) -> pa.Table:
        """Per (band, bucket) segment: incoming x corpus cross pairs
        only — vectorized repeat/offset expansion, no Python loop."""
        if g.num_rows == 0 or "band" not in g.column_names:
            return _EMPTY_XPAIRS.empty_table()
        band_v = g["band"].to_numpy(zero_copy_only=False)
        bucket_v = g["bucket"].to_numpy(zero_copy_only=False)
        doc_v = g["doc_id"].to_numpy(zero_copy_only=False)
        side_v = g["side"].to_numpy(zero_copy_only=False)
        # corpus rows (side 0) first within each segment
        order = np.lexsort((doc_v, side_v, bucket_v, band_v))
        band_v, bucket_v = band_v[order], bucket_v[order]
        doc_v, side_v = doc_v[order], side_v[order]
        n = len(doc_v)
        seg_first = np.ones(n, dtype=bool)
        seg_first[1:] = (band_v[1:] != band_v[:-1]) | (bucket_v[1:] != bucket_v[:-1])
        seg_id = np.cumsum(seg_first) - 1
        starts = np.flatnonzero(seg_first)
        # corpus count per segment = index of first incoming row - start
        is_cor = side_v == 0
        cor_cnt = np.bincount(seg_id[is_cor], minlength=len(starts)).astype(np.int64)
        inc_rows = np.flatnonzero(~is_cor)
        rep = cor_cnt[seg_id[inc_rows]]  # pairs per incoming row
        total = int(rep.sum())
        if total == 0:
            return _EMPTY_XPAIRS.empty_table()
        b_idx = np.repeat(inc_rows, rep)
        offs = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(rep) - rep, rep)
        a_idx = np.repeat(starts[seg_id[inc_rows]], rep) + offs
        # pack + unique: a band collision can repeat a pair within grp
        packed = np.unique(
            doc_v[b_idx].astype(np.uint64) * np.uint64(1 << 32)
            + doc_v[a_idx].astype(np.uint64)
        )
        return pa.table(
            {
                "a": pa.array((packed >> np.uint64(32)).astype(np.int64)),
                "b": pa.array((packed & np.uint64(0xFFFFFFFF)).astype(np.int64)),
                "one": pa.array(np.ones(len(packed), dtype=np.int64)),
            }
        )

    # a = incoming doc, b = corpus doc; cross-group dedup via grouped count
    cand = grouped_sum(
        banded.groupby("grp").map_groups(expand_cross, batch_format="pyarrow"),
        ["a", "b"],
        {"n": ("one", "sum")},
    )

    docs_int = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    cand_a = cand.map_batches(
        lambda t: pa.table({"doc_id": t["a"], "b": t["b"]}), batch_format="pyarrow"
    )
    with_a = hash_join(
        cand_a, docs_int, on="doc_id",
        left_cols=["doc_id", "b"], right_cols=["doc_id", "text"],
    ).map_batches(
        lambda t: pa.table(
            {"inc_doc": t["doc_id"], "doc_id": t["b"], "text_inc": t["text"]}
        ),
        batch_format="pyarrow",
    )
    with_ab = hash_join(
        with_a, docs_int, on="doc_id",
        left_cols=["doc_id", "inc_doc", "text_inc"], right_cols=["doc_id", "text"],
    )

    def verify_jac(t: pa.Table) -> pa.Table:
        # verify with the SAME similarity the index measures (3-shingle
        # jaccard): token-SET jaccard ignores word order, so it can be
        # near 1.0 on a small-vocabulary corpus while the shingle
        # signatures — correctly — see unrelated sequences
        # vectorized: sorted shingle-hash arrays + adjacent-dup
        # intersection counts (no Python per candidate pair)
        j = T.pairwise_shingle_jaccard_arrow(t["text_inc"], t["text"], k=3)
        keep = j >= threshold
        return pa.table(
            {
                "inc_doc": pc.cast(t["inc_doc"], pa.int64()).filter(pa.array(keep)),
                "cor_doc": pc.cast(t["doc_id"], pa.int64()).filter(pa.array(keep)),
                "jaccard_pct": pa.array((j[keep] * 100).astype(np.int64)),
            }
        )

    return with_ab.map_batches(verify_jac, batch_format="pyarrow").sort(
        ["inc_doc", "cor_doc"]
    )


# ---------------------------------------------------------------------------
# BM25 retrieval: score every document against a fixed query-term set
# with GLOBAL collection statistics (df per term, doc count, total
# token count), all-integer so the oracle is exact at every sf.
# ---------------------------------------------------------------------------

BM25_TERMS = ("filter", "vector", "window", "spark")
BM25_TOP_K = 20
# k1 = 1.2, b = 0.75 encoded as integer ratios: score_term =
#   idf * tf * 22 * T  //  (10*T*tf + 3*T + 9*dl*N)
# which is idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)) with
# avgdl = T/N, scaled through by 10*T (positive operands: floor == //).


def docs_bm25_topk(sf_dir: str, terms: tuple = BM25_TERMS, k: int = BM25_TOP_K):
    """Top-k documents by integer BM25 against a fixed query.

    Scale design: pass 1 reduces each document to (doc_id, dl,
    tf_per_term) — m+2 int64s, NOT the text — and materializes that
    reduced table once; the collection stats (N, T, df) merge on the
    driver from one partial row per block; pass 2 scores with the
    broadcast constants and keeps a per-block partial top-k (tie rule
    score DESC, doc_id ASC) so the final sort sees k x n_blocks rows
    regardless of corpus size.  idf reuses docs_tfidf_pairs' capped
    integer encoding: min((1000 * N) // df, TFIDF_IDF_CAP).
    """
    import ray

    from ..stages.broadcast import with_broadcast

    m = len(terms)
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    _STATS = pa.schema(
        [("doc_id", pa.int64()), ("dl", pa.int64())]
        + [(f"tf{j}", pa.int64()) for j in range(m)]
    )

    def per_doc(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _STATS.empty_table()
        flat, docidx, counts = T.flat_tokens(t["text"])
        n = t.num_rows
        cols = {
            "doc_id": t["doc_id"],
            "dl": pa.array(counts.astype(np.int64)),
        }
        for j, term in enumerate(terms):
            hit = pc.equal(flat, term).to_numpy(zero_copy_only=False).astype(bool)
            cols[f"tf{j}"] = pa.array(
                np.bincount(docidx[hit], minlength=n).astype(np.int64)
            )
        return pa.table(cols)

    stats = ds.map_batches(
        per_doc, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # collection constants: ONE partial row per block, driver-merged
    def partial(t: pa.Table) -> pa.Table:
        row = {
            "n": pa.array([t.num_rows], pa.int64()),
            "t": pa.array(
                [int(t["dl"].to_numpy(zero_copy_only=False).sum())
                 if t.num_rows else 0], pa.int64()
            ),
        }
        for j in range(m):
            tf = t[f"tf{j}"].to_numpy(zero_copy_only=False) if t.num_rows else np.zeros(0)
            row[f"df{j}"] = pa.array([int((tf > 0).sum())], pa.int64())
        return pa.table(row)

    parts = stats.map_batches(partial, batch_format="pyarrow").take_all()
    N = sum(p["n"] for p in parts)
    TT = sum(p["t"] for p in parts)
    df = np.array(
        [sum(p[f"df{j}"] for p in parts) for j in range(m)], dtype=np.int64
    )
    idf = np.minimum(
        np.where(df > 0, (1000 * N) // np.maximum(df, 1), 0), TFIDF_IDF_CAP
    ).astype(np.int64)
    ref = ray.put((np.int64(N), np.int64(TT), idf))

    def score_topk(state, t: pa.Table) -> pa.Table:
        N, TT, idf = state
        out_schema = pa.schema([("doc_id", pa.int64()), ("score", pa.int64())])
        if t.num_rows == 0:
            return out_schema.empty_table()
        dl = t["dl"].to_numpy(zero_copy_only=False).astype(np.int64)
        score = np.zeros(len(dl), dtype=np.int64)
        for j in range(m):
            tf = t[f"tf{j}"].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = tf > 0
            if not pos.any():
                continue
            num = idf[j] * tf[pos] * 22 * TT
            den = 10 * TT * tf[pos] + 3 * TT + 9 * dl[pos] * N
            score[pos] += num // den
        did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = score > 0
        did, score = did[keep], score[keep]
        if len(did) > k:  # per-block partial top-k, same tie rule
            order = np.lexsort((did, -score))[:k]
            did, score = did[order], score[order]
        return pa.table({"doc_id": pa.array(did), "score": pa.array(score)})

    return (
        stats.map_batches(
            with_broadcast(ref, score_topk, "bm25_score"), batch_format="pyarrow"
        )
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(k)
    )


def docs_bm25_topk_sql(terms: tuple = BM25_TERMS, k: int = BM25_TOP_K) -> str:
    term_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKENS_SQL}) AS token FROM documents
),
consts AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT count(*) FROM toks) AS tt
),
tf AS (
  SELECT doc_id, token, count(*)::BIGINT AS tf
  FROM toks WHERE token IN ({term_list})
  GROUP BY doc_id, token
),
df AS (SELECT token, count(*)::BIGINT AS df FROM tf GROUP BY token),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY doc_id),
scored AS (
  SELECT tf.doc_id,
         CAST(sum(
           (LEAST((1000 * c.n) // df.df, {TFIDF_IDF_CAP}) * tf.tf * 22 * c.tt)
           // (10 * c.tt * tf.tf + 3 * c.tt + 9 * dl.dl * c.n)
         ) AS BIGINT) AS score
  FROM tf
  JOIN df USING (token)
  JOIN dl USING (doc_id)
  CROSS JOIN consts c
  GROUP BY tf.doc_id
)
SELECT doc_id, score FROM scored WHERE score > 0
ORDER BY score DESC, doc_id
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Image near-dup (pHash): decode → 64-bit perceptual hash → banded
# Hamming dedup.  The multimodal member of the dedup family.
# ---------------------------------------------------------------------------

PHASH_GROUPS = 40          # planted duplicate groups in the synth corpus
PHASH_HAM_TAU = 7          # 8 bands x 8 bits: any pair <= 7 shares a band
PHASH_NOISE_BYTES = 24     # perturbed bytes per variant image


def _synth_image_grouped(doc_id: int) -> "np.ndarray":
    """Deterministic RGB image with PLANTED near-duplicates: the pixel
    base depends only on doc_id % PHASH_GROUPS; docs beyond the first
    occurrence of a group get a sparse ±8 perturbation (distinct per
    doc), so every group is a near-dup cluster under any low-frequency
    signature.  Sizes vary 32..39 px to exercise the real resize."""
    from ..functions.hashing import splitmix64

    g = doc_id % PHASH_GROUPS
    h = 32 + g % 8
    w = 32 + (g // 2) % 8
    n = h * w * 3
    seed = splitmix64(np.uint64((g * 0x9E3779B97F4A7C15 + 7) % (1 << 64)))
    px = (splitmix64(seed + np.arange(n, dtype=np.uint64)) & np.uint64(0xFF)).astype(
        np.int64
    )
    if doc_id >= PHASH_GROUPS:
        s2 = splitmix64(np.uint64(doc_id) ^ np.uint64(0xC0FFEE0DDBA11))
        idx = (splitmix64(s2 + np.arange(PHASH_NOISE_BYTES, dtype=np.uint64))
               % np.uint64(n)).astype(np.int64)
        px[idx] = np.clip(px[idx] + 8, 0, 255)
    return px.astype(np.uint8).reshape(h, w, 3)


def mm_phash_dedup(sf_dir: str, tau: int = PHASH_HAM_TAU):
    """Image near-dup dedup: PNG payload → actor-pool pHash → banded
    Hamming join → keep-first winners.

    Drop rule: image b is dropped iff some a with a.doc_id < b.doc_id
    has popcount(phash_a XOR phash_b) <= tau.  With 8 bands x 8 bits,
    any pair within tau <= 7 shares at least one exact band
    (pigeonhole), so the banded candidate generation has recall 1 and
    the rule is EXACTLY the global all-pairs rule — pinned by the
    brute-force replay test (tests/test_media.py).

    Scale design: hashing is an actor-pool stage (decoder + quantized
    DCT basis built once per actor); the exchange carries only
    (band-bucket, doc_id, phash) = 24 B/row x 8; candidate pairs meet
    inside the banded buckets (at corpus scale widen the bands /
    multi-probe to keep per-bucket occupancy bounded — documented
    tradeoff, same knob as emb_lsh_neardup); winners resolve with one
    distributed anti-join, no driver state.  rows-only: PNG decode +
    DCT are not SQL-expressible (documented in __ray_entry__ and
    tests/test_entry.py).
    """
    from ..functions.png import encode_png
    from ..stages.join import hash_join
    from ..stages.multimodal import ImagePHash, popcount64

    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def to_payload(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        payloads = [encode_png(_synth_image_grouped(int(i))) for i in ids]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "payload": pa.array(payloads, type=pa.binary()),
            }
        )

    hashed = (
        ds.map_batches(to_payload, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(
            ImagePHash,
            fn_constructor_args=("doc_id",),
            batch_format="pyarrow",
            concurrency=2,
            batch_size=64,
        )
        .materialize()  # (doc_id, phash) — 16 B/row, reused twice below
    )

    def explode_bands(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [("bb", pa.int64()), ("doc_id", pa.int64()), ("phash", pa.int64())]
            ).empty_table()
        h = t["phash"].to_numpy(zero_copy_only=False).view(np.uint64)
        n = len(h)
        bands = np.arange(8, dtype=np.uint64)
        byte = (h[:, None] >> (bands * np.uint64(8))[None, :]) & np.uint64(0xFF)
        bb = (bands[None, :] * np.uint64(256) + byte).astype(np.int64).ravel()
        rep = np.repeat(np.arange(n, dtype=np.int64), 8)
        return pa.table(
            {
                "bb": pa.array(bb),
                "doc_id": t["doc_id"].take(pa.array(rep)),
                "phash": t["phash"].take(pa.array(rep)),
            }
        )

    _DROP = pa.schema([("doc_id", pa.int64())])

    def bucket_dropped(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n < 2:
            return _DROP.empty_table()
        ids = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = g["phash"].to_numpy(zero_copy_only=False).view(np.uint64)
        order = np.argsort(ids, kind="stable")
        ids, h = ids[order], h[order]
        # strict upper triangle: j is the later (dropped-candidate) side
        ii, jj = np.triu_indices(n, k=1)
        ham = popcount64((h[ii] ^ h[jj]).view(np.int64))
        hit = np.unique(jj[ham <= tau])
        return pa.table({"doc_id": pa.array(ids[hit])})

    dropped = (
        hashed.map_batches(explode_bands, batch_format="pyarrow")
        .groupby("bb")
        .map_groups(bucket_dropped, batch_format="pyarrow")
    )
    kept = hash_join(hashed, dropped, on="doc_id", how="anti")
    return kept.sort("doc_id")


# ---------------------------------------------------------------------------
# Round-4 continuation 3: exact phi-heavy hitters via mergeable
# Misra-Gries summaries + bounded exact recount.
# ---------------------------------------------------------------------------


def docs_heavy_hitters(sf_dir: str, phi_denom: int = 1000):
    """Heavy hitters over the documents table (see heavy_hitters_ds)."""
    return heavy_hitters_ds(
        read_table(sf_dir, "documents", columns=["text"]), phi_denom=phi_denom
    )


def heavy_hitters_ds(ds, phi_denom: int = 1000):
    """EXACT phi-heavy hitters: tokens whose corpus count c satisfies
    ``c * phi_denom > N`` (N = total token count) — the sketch-then-
    verify pattern that stays exact at any corpus size.

    Pass 1 builds a Misra-Gries summary per batch with k = 2*phi_denom
    counters (``pc.value_counts`` + one numpy compaction: subtract the
    (k+1)-th largest count, drop <= 0).  Per-batch undercount is
    <= n_b/(k+1); summing summaries token-wise keeps the total
    undercount <= N/(k+1) (Agarwal et al., Mergeable Summaries, PODS
    2012), so every true heavy hitter retains summed weight
    > N/phi_denom - N/(2*phi_denom) = N/(2*phi_denom) > 0, while at
    most 2*phi_denom tokens can sit above that cut (weights sum <= N).
    The candidate set is therefore BOUNDED regardless of corpus size —
    at 100 TB it is still <= 2000 strings riding a task closure; the
    only exchange is the O(k) rows/batch partial stream (driver merge).

    Pass 2 recounts ONLY the candidates exactly (``pc.index_in`` +
    ``np.bincount`` per batch — no Python loop) and applies the exact
    integer HAVING filter, making the result bit-identical to the
    brute-force SQL twin.

    The per-batch total token count rides the same partial stream as a
    sentinel row (token = "", impossible in data: the tokenizer drops
    empty strings), so N is exact and costs no extra pass.
    """
    k = 2 * phi_denom

    def mg_stage(t: pa.Table) -> pa.Table:
        flat, _, _ = T.flat_tokens(t["text"])
        n_b = len(flat)
        vc = flat.value_counts()
        toks = vc.field("values")
        cnts = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(cnts) > k:
            # MG decrement: subtract the (k+1)-th largest count
            d = np.partition(cnts, len(cnts) - (k + 1))[len(cnts) - (k + 1)]
            w = cnts - d
            keep = w > 0
            toks = toks.filter(pa.array(keep))
            w = w[keep]
        else:
            w = cnts
        out_toks = pa.concat_arrays(
            [toks.cast(pa.string()), pa.array([""], pa.string())]
        )
        out_w = np.concatenate([w, np.array([n_b], dtype=np.int64)])
        return pa.table({"token": out_toks, "w": pa.array(out_w)})

    partials = ds.map_batches(mg_stage, batch_format="pyarrow", zero_copy_batch=True)
    # O(k) rows per batch -> bounded partial stream; driver merge
    merged = grouped_sum(
        partials, ["token"], {"w": ("w", "sum")}, merge="driver"
    ).to_pandas()
    sent = merged["token"] == ""
    n_total = int(merged.loc[sent, "w"].iloc[0]) if sent.any() else 0
    cand = merged.loc[~sent]
    # survivors of the guaranteed-recall cut: w > N/(2*phi_denom)
    cand = cand.loc[cand["w"].to_numpy() * (2 * phi_denom) > n_total, "token"]
    cand_arr = pa.array(sorted(cand.tolist()), type=pa.string())

    if len(cand_arr) == 0 or n_total == 0:
        import ray

        return ray.data.from_arrow(
            pa.table({"token": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})
        )

    def recount(t: pa.Table) -> pa.Table:
        flat, _, _ = T.flat_tokens(t["text"])
        idx = pc.index_in(flat, value_set=cand_arr)
        hits = pc.drop_null(idx).to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.bincount(hits, minlength=len(cand_arr))
        present = counts > 0
        return pa.table(
            {
                "token": cand_arr.filter(pa.array(present)),
                "c": pa.array(counts[present].astype(np.int64)),
            }
        )

    counted = ds.map_batches(recount, batch_format="pyarrow", zero_copy_batch=True)
    exact = grouped_sum(counted, ["token"], {"n": ("c", "sum")}, merge="driver")

    def having(t: pa.Table) -> pa.Table:
        keep = pc.greater(pc.multiply(t["n"], pa.scalar(phi_denom, pa.int64())),
                          pa.scalar(n_total, pa.int64()))
        return t.filter(keep)

    exact = exact.map_batches(having, batch_format="pyarrow", zero_copy_batch=True)
    return exact.sort(["n", "token"], descending=[True, False])


def docs_heavy_hitters_sql(phi_denom: int = 1000) -> str:
    return f"""
WITH tok AS (SELECT unnest({_TOKENS_SQL}) AS token FROM documents)
SELECT token, CAST(count(*) AS BIGINT) AS n
FROM tok
GROUP BY token
HAVING count(*) * {phi_denom} > (SELECT count(*) FROM tok)
ORDER BY n DESC, token
"""


# ---------------------------------------------------------------------------
# Corpus-conditioned LM scoring (CCNet-style frequency filter)
# ---------------------------------------------------------------------------


def docs_lm_score(sf_dir: str, n_buckets: int = 64):
    """sf_dir wrapper over :func:`lm_score_ds` (the documents table)."""
    return lm_score_ds(
        read_table(sf_dir, "documents", columns=["doc_id", "text"]),
        n_buckets=n_buckets,
    )


def lm_score_ds(ds, n_buckets: int = 64):
    """Corpus-conditioned document scoring: each document is scored by
    how typical its bigrams are of the corpus itself — the integer-exact
    stand-in for CCNet's LM-perplexity filter (Wenzek et al. 2020;
    public recipe: score docs by an LM fit on the corpus distribution,
    drop the tail).  For doc d with bigram instances g_1..g_nb:

        hits(d)  = sum_j corpus_count(g_j)     (self included)
        lm_score = (1000 * hits) // nb         (mean corpus frequency,
                                                integer floor — exact in
                                                both engines)

    Docs with no bigram (0/1-token) are excluded, matching the SQL
    join semantics.

    Scale shape — ONE bigram exchange, no string join, no driver state:
    per-batch (doc_id, bigram, k) combiners hash-partition on a
    buffer-native SipHash of the bigram into B buckets; ALL instances
    of a bigram are then co-located, so the corpus count n(g) and every
    doc's contribution k*n(g) are computed bucket-side with dictionary
    codes + np.add.at segment sums against the ACTUAL strings (the
    hash only routes — exactness never assumes hash equality, same
    contract as pages._shuffle_dedup).  Buckets emit <= one
    (doc_id, nb, hits) partial per doc per bucket; the final per-doc
    merge is a grouped_sum over doc_id.  At 10^12 docs: widen
    n_buckets so corpus_bigram_bytes / B fits a worker heap — the
    per-group-Python trap is per-KEY calls, not per-bucket.
    """
    from ..functions.hashing import hash_strings, splitmix64

    _PART = pa.schema(
        [("__bkt", pa.int64()), ("doc_id", pa.int64()),
         ("bigram", pa.string()), ("k", pa.int64())]
    )

    def pairs(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(nonempty))
        parent = parent[nonempty]
        if len(flat) < 2:
            return _PART.empty_table()
        a = flat.slice(0, len(flat) - 1)
        b = flat.slice(1)
        same_np = parent[1:] == parent[:-1]
        same = pa.array(same_np)
        bg = pc.binary_join_element_wise(a.filter(same), b.filter(same), " ")
        did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)[
            parent[:-1][same_np]
        ]
        # per-batch combiner: collapse repeats of (doc_id, bigram)
        g = pa.table({"doc_id": pa.array(did), "bigram": bg,
                      "one": pa.array(np.ones(len(did), dtype=np.int64))})
        g = g.group_by(["doc_id", "bigram"]).aggregate([("one", "sum")])
        bkt = (hash_strings(g["bigram"]) % np.uint64(n_buckets)).astype(np.int64)
        return pa.table({
            "__bkt": pa.array(bkt),
            "doc_id": g["doc_id"],
            "bigram": g["bigram"],
            "k": g["one_sum"],
        })

    _BOUT = pa.schema(
        [("__dbkt", pa.int64()), ("doc_id", pa.int64()),
         ("nb", pa.int64()), ("hits", pa.int64())]
    )

    def bucket_score(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _BOUT.empty_table()
        bg = g["bigram"]
        bg = bg.combine_chunks() if isinstance(bg, pa.ChunkedArray) else bg
        codes = pc.dictionary_encode(bg)
        codes = codes.combine_chunks() if isinstance(codes, pa.ChunkedArray) else codes
        idx = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = g["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        n_codes = int(idx.max()) + 1
        ng = np.zeros(n_codes, dtype=np.int64)
        np.add.at(ng, idx, k)                      # corpus count per bigram
        contrib = k * ng[idx]                      # per (doc,bigram) row
        did = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uids, inv = np.unique(did, return_inverse=True)
        nb = np.zeros(len(uids), dtype=np.int64)
        hits = np.zeros(len(uids), dtype=np.int64)
        np.add.at(nb, inv, k)
        np.add.at(hits, inv, contrib)
        dbkt = (splitmix64(uids.astype(np.uint64)) % np.uint64(n_buckets)).astype(
            np.int64
        )
        return pa.table({"__dbkt": pa.array(dbkt), "doc_id": pa.array(uids),
                         "nb": pa.array(nb), "hits": pa.array(hits)})

    # Per-doc merge is ANOTHER bucketed exchange + vectorized segment
    # sum, NOT a grouped_sum: Ray's sample-sort Aggregate over the
    # unbounded doc_id key spent 26 s/task on the 12.3M partials at 1M
    # docs (the pages._shuffle_dedup lesson exactly), while the
    # 64-value bucket sort moves the same rows in ~2 s.
    _OUT = pa.schema([("doc_id", pa.int64()), ("nb", pa.int64()),
                      ("hits", pa.int64()), ("lm_score", pa.int64())])

    def merge_docs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        did = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nb_in = g["nb"].to_numpy(zero_copy_only=False).astype(np.int64)
        h_in = g["hits"].to_numpy(zero_copy_only=False).astype(np.int64)
        uids, inv = np.unique(did, return_inverse=True)
        nb = np.zeros(len(uids), dtype=np.int64)
        hits = np.zeros(len(uids), dtype=np.int64)
        np.add.at(nb, inv, nb_in)
        np.add.at(hits, inv, h_in)
        return pa.table({
            "doc_id": pa.array(uids),
            "nb": pa.array(nb),
            "hits": pa.array(hits),
            "lm_score": pa.array((1000 * hits) // nb),
        })

    return (
        ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bkt")
        .map_groups(bucket_score, batch_format="pyarrow")
        .groupby("__dbkt")
        .map_groups(merge_docs, batch_format="pyarrow")
        .sort("doc_id")
    )


DOCS_LM_SCORE_SQL = f"""
WITH tok AS (
  SELECT doc_id,
         unnest({_TOKENS_SQL}) AS w,
         generate_subscripts({_TOKENS_SQL}, 1) AS i
  FROM documents
),
bg AS (
  SELECT t1.doc_id, t1.w || ' ' || t2.w AS g
  FROM tok t1
  JOIN tok t2 ON t1.doc_id = t2.doc_id AND t2.i = t1.i + 1
),
cnt AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM bg GROUP BY g),
per_doc AS (
  SELECT bg.doc_id,
         CAST(count(*) AS BIGINT) AS nb,
         CAST(sum(cnt.n) AS BIGINT) AS hits
  FROM bg JOIN cnt USING (g)
  GROUP BY bg.doc_id
)
SELECT doc_id, nb, hits, CAST((1000 * hits) // nb AS BIGINT) AS lm_score
FROM per_doc
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# PMI collocations (corpus-wide bigram association ranking)
# ---------------------------------------------------------------------------


def docs_pmi_collocations(sf_dir: str, n_buckets: int = 64,
                          min_count: int = 5, top_k: int = 100):
    """sf_dir wrapper over :func:`pmi_collocations_ds` (documents table).

    Only ``text`` is read: document boundaries are batch rows, and the
    scoring is corpus-level (no per-doc output)."""
    return pmi_collocations_ds(
        read_table(sf_dir, "documents", columns=["text"]),
        n_buckets=n_buckets, min_count=min_count, top_k=top_k,
    )


def pmi_collocations_ds(ds, n_buckets: int = 64, min_count: int = 5,
                        top_k: int = 100):
    """Top-k collocations: bigrams ranked by an integer-exact PMI
    surrogate.  PMI(w1,w2) = log[(c_ab/M) / ((c_1/N)(c_2/N))] is
    monotone in (c_ab * N^2)/(c_1 * c_2 * M); dropping the constants
    M and one N, the rank-equivalent integer score computed IDENTICALLY
    in both engines (positive ints, floor division) is

        score = ((c_ab * 1_000_000) // c_1) * N // c_2

    with c_ab <= c_1 (so step 1 <= 1e6) and N = total token count
    (so step 2 <= 1e6 * N — no int64 overflow below ~9e12 tokens;
    shard the corpus and merge scores per shard beyond that).
    Bigrams below ``min_count`` are dropped (HAVING twin).

    Scale shape — ONE pass over the text, TWO bounded-fanout bucket
    exchanges, no driver state:
      * per-batch combiners emit unigram partials routed on
        SipHash(w) and bigram partials routed on SipHash(w1) — so
        every instance of a bigram AND the full count of its w1 land
        in the same stage-A bucket;
      * stage-A buckets (B = n_buckets groups, never per-key Python)
        total both sides with dictionary codes + np.add.at, apply the
        min_count cut, attach c_1 by string match (pc.index_in), and
        re-route survivors on SipHash(w2); each also forwards its
        unigram table (stays in place: same hash) and broadcasts its
        token-count sentinel to all B stage-B buckets so N is exact
        with no second pass;
      * stage-B buckets attach c_2 and compute the score.
    The hash only routes — counts key on actual strings.  Final
    sort+limit moves <= (surviving bigrams) rows, output is top_k.
    """
    from ..functions.hashing import hash_strings

    B = n_buckets
    _PART = pa.schema([("__bkt", pa.int64()), ("side", pa.int64()),
                       ("w1", pa.string()), ("w2", pa.string()),
                       ("k", pa.int64())])

    def pairs(t: pa.Table) -> pa.Table:
        flat, docidx, _ = T.flat_tokens(t["text"])
        if len(flat) == 0:
            return _PART.empty_table()
        vc = flat.value_counts()
        uw = vc.field("values").cast(pa.string())
        uc = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
        out = [pa.table({
            "__bkt": pa.array((hash_strings(uw) % np.uint64(B)).astype(np.int64)),
            "side": pa.array(np.zeros(len(uw), dtype=np.int64)),
            "w1": uw,
            "w2": pa.array([""] * len(uw), pa.string()),
            "k": pa.array(uc),
        })]
        if len(flat) >= 2:
            same = docidx[1:] == docidx[:-1]
            a = flat.slice(0, len(flat) - 1).filter(pa.array(same))
            b = flat.slice(1).filter(pa.array(same))
            if len(a):
                g = pa.table({"w1": a, "w2": b,
                              "one": pa.array(np.ones(len(a), dtype=np.int64))})
                g = g.group_by(["w1", "w2"]).aggregate([("one", "sum")])
                gw1 = g["w1"].combine_chunks() if isinstance(
                    g["w1"], pa.ChunkedArray) else g["w1"]
                out.append(pa.table({
                    "__bkt": pa.array(
                        (hash_strings(gw1) % np.uint64(B)).astype(np.int64)),
                    "side": pa.array(np.ones(g.num_rows, dtype=np.int64)),
                    "w1": g["w1"],
                    "w2": g["w2"],
                    "k": g["one_sum"],
                }))
        return pa.concat_tables([x.cast(_PART) for x in out])

    _A = pa.schema([("__bkt2", pa.int64()), ("side", pa.int64()),
                    ("w1", pa.string()), ("w2", pa.string()),
                    ("c_ab", pa.int64()), ("c1", pa.int64()),
                    ("cu", pa.int64())])

    def stage_a(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _A.empty_table()
        side = g["side"].to_numpy(zero_copy_only=False)
        uni = g.filter(pa.array(side == 0))
        big = g.filter(pa.array(side == 1))
        out = []
        # total unigram counts for this bucket's words
        uw_all = uni["w1"].combine_chunks() if isinstance(
            uni["w1"], pa.ChunkedArray) else uni["w1"]
        codes = pc.dictionary_encode(uw_all)
        codes = codes.combine_chunks() if isinstance(
            codes, pa.ChunkedArray) else codes
        uw = codes.dictionary.cast(pa.string())
        idx = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uc = np.zeros(len(uw), dtype=np.int64)
        np.add.at(uc, idx, uni["k"].to_numpy(zero_copy_only=False))
        # forward the unigram table (same hash -> same stage-B bucket)
        out.append(pa.table({
            "__bkt2": pa.array((hash_strings(uw) % np.uint64(B)).astype(np.int64)),
            "side": pa.array(np.zeros(len(uw), dtype=np.int64)),
            "w1": uw,
            "w2": pa.array([""] * len(uw), pa.string()),
            "c_ab": pa.array(np.zeros(len(uw), dtype=np.int64)),
            "c1": pa.array(np.zeros(len(uw), dtype=np.int64)),
            "cu": pa.array(uc),
        }))
        # token-count sentinel broadcast to every stage-B bucket
        tot = int(uc.sum())
        out.append(pa.table({
            "__bkt2": pa.array(np.arange(B, dtype=np.int64)),
            "side": pa.array(np.full(B, 2, dtype=np.int64)),
            "w1": pa.array([""] * B, pa.string()),
            "w2": pa.array([""] * B, pa.string()),
            "c_ab": pa.array(np.zeros(B, dtype=np.int64)),
            "c1": pa.array(np.zeros(B, dtype=np.int64)),
            "cu": pa.array(np.full(B, tot, dtype=np.int64)),
        }))
        if big.num_rows:
            bt = big.group_by(["w1", "w2"]).aggregate([("k", "sum")])
            keep = pc.greater_equal(bt["k_sum"],
                                    pa.scalar(min_count, pa.int64()))
            bt = bt.filter(keep)
            if bt.num_rows:
                bw1 = bt["w1"].combine_chunks() if isinstance(
                    bt["w1"], pa.ChunkedArray) else bt["w1"]
                bw2 = bt["w2"].combine_chunks() if isinstance(
                    bt["w2"], pa.ChunkedArray) else bt["w2"]
                pos = pc.index_in(bw1, value_set=uw).to_numpy(
                    zero_copy_only=False).astype(np.int64)
                out.append(pa.table({
                    "__bkt2": pa.array(
                        (hash_strings(bw2) % np.uint64(B)).astype(np.int64)),
                    "side": pa.array(np.ones(bt.num_rows, dtype=np.int64)),
                    "w1": bt["w1"],
                    "w2": bt["w2"],
                    "c_ab": bt["k_sum"],
                    "c1": pa.array(uc[pos]),
                    "cu": pa.array(np.zeros(bt.num_rows, dtype=np.int64)),
                }))
        return pa.concat_tables([x.cast(_A) for x in out])

    _OUT = pa.schema([("w1", pa.string()), ("w2", pa.string()),
                      ("c_ab", pa.int64()), ("score", pa.int64())])

    def stage_b(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        side = g["side"].to_numpy(zero_copy_only=False)
        n_total = int(g.filter(pa.array(side == 2))["cu"].to_numpy(
            zero_copy_only=False).sum())
        big = g.filter(pa.array(side == 1))
        if big.num_rows == 0:
            return _OUT.empty_table()
        uni = g.filter(pa.array(side == 0))
        uw = uni["w1"].combine_chunks() if isinstance(
            uni["w1"], pa.ChunkedArray) else uni["w1"]
        uc = uni["cu"].to_numpy(zero_copy_only=False).astype(np.int64)
        bw2 = big["w2"].combine_chunks() if isinstance(
            big["w2"], pa.ChunkedArray) else big["w2"]
        pos = pc.index_in(bw2, value_set=uw).to_numpy(
            zero_copy_only=False).astype(np.int64)
        c2 = uc[pos]
        c_ab = big["c_ab"].to_numpy(zero_copy_only=False).astype(np.int64)
        c1 = big["c1"].to_numpy(zero_copy_only=False).astype(np.int64)
        score = ((c_ab * 1_000_000) // c1) * n_total // c2
        return pa.table({"w1": big["w1"], "w2": big["w2"],
                         "c_ab": big["c_ab"], "score": pa.array(score)})

    return (
        ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bkt")
        .map_groups(stage_a, batch_format="pyarrow")
        .groupby("__bkt2")
        .map_groups(stage_b, batch_format="pyarrow")
        .sort(["score", "w1", "w2"], descending=[True, False, False])
        .limit(top_k)
    )


DOCS_PMI_COLLOCATIONS_SQL = f"""
WITH tok AS (
  SELECT doc_id,
         unnest({_TOKENS_SQL}) AS w,
         generate_subscripts({_TOKENS_SQL}, 1) AS i
  FROM documents
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tok),
uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY w),
bg AS (
  SELECT t1.w AS w1, t2.w AS w2
  FROM tok t1 JOIN tok t2 ON t1.doc_id = t2.doc_id AND t2.i = t1.i + 1
),
bgc AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_ab
  FROM bg GROUP BY w1, w2 HAVING count(*) >= 5
)
SELECT b.w1, b.w2, b.c_ab,
       CAST(((b.c_ab * 1000000) // u1.c) * (SELECT n FROM tot) // u2.c
            AS BIGINT) AS score
FROM bgc b
JOIN uni u1 ON u1.w = b.w1
JOIN uni u2 ON u2.w = b.w2
ORDER BY score DESC, b.w1, b.w2
LIMIT 100
"""


# ---------------------------------------------------------------------------
# SimHash near-dup dedup (banded Hamming, keep-first) — the text twin
# of mm_phash_dedup, completing the dedup family (exact / normalized /
# MinHash-LSH / n-gram Jaccard / SimHash / embedding-cosine)
# ---------------------------------------------------------------------------

SIMHASH_HAM_TAU = 3


def docs_simhash_dedup(sf_dir: str, tau: int = SIMHASH_HAM_TAU):
    """Drop doc b iff some a with a.doc_id < b.doc_id has
    popcount(simhash_a XOR simhash_b) <= tau.  With 4 bands x 16 bits,
    any pair within tau <= 3 shares at least one exact band
    (pigeonhole), so banded candidate generation has recall 1 and the
    keep-first rule is EXACTLY the global all-pairs rule — pinned by
    the brute-force replay test (tests/test_webcorpus.py).

    Scale design: signatures are one buffer-native vectorized pass
    (functions/text.simhash64_arrow); the exchange carries only
    (band-bucket, doc_id, simhash) = 24 B/row x 4 bands; candidate
    pairs meet inside banded buckets (widen bands / multi-probe at
    corpus scale to bound bucket occupancy — same documented knob as
    mm_phash_dedup); winners resolve with one distributed anti-join.
    rows-only: simhash bits are not SQL-expressible (documented in
    __ray_entry__ and tests/test_entry.py).
    """
    from ..stages.join import hash_join
    from ..stages.multimodal import popcount64

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def sig(t: pa.Table) -> pa.Table:
        sh = T.simhash64_arrow(t["text"])
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "simhash": pa.array(sh.view(np.int64)),
            }
        )

    hashed = ds.map_batches(
        sig, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # (doc_id, simhash) — 16 B/row, reused twice below

    def explode_bands(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [("bb", pa.int64()), ("doc_id", pa.int64()), ("simhash", pa.int64())]
            ).empty_table()
        h = t["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        n = len(h)
        bands = np.arange(4, dtype=np.uint64)
        bits = (h[:, None] >> (bands * np.uint64(16))[None, :]) & np.uint64(0xFFFF)
        bb = (bands[None, :] * np.uint64(65536) + bits).astype(np.int64).ravel()
        rep = np.repeat(np.arange(n, dtype=np.int64), 4)
        return pa.table(
            {
                "bb": pa.array(bb),
                "doc_id": t["doc_id"].take(pa.array(rep)),
                "simhash": t["simhash"].take(pa.array(rep)),
            }
        )

    _DROP = pa.schema([("doc_id", pa.int64())])

    def bucket_dropped(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n < 2:
            return _DROP.empty_table()
        ids = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = g["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        order = np.argsort(ids, kind="stable")
        ids, h = ids[order], h[order]
        ii, jj = np.triu_indices(n, k=1)
        ham = popcount64((h[ii] ^ h[jj]).view(np.int64))
        hit = np.unique(jj[ham <= tau])
        return pa.table({"doc_id": pa.array(ids[hit])})

    dropped = (
        hashed.map_batches(explode_bands, batch_format="pyarrow")
        .groupby("bb")
        .map_groups(bucket_dropped, batch_format="pyarrow")
    )
    kept = hash_join(hashed, dropped, on="doc_id", how="anti")
    return kept.sort("doc_id")


# ---------------------------------------------------------------------------
# CDC merge / upsert: keep-latest snapshot with tombstones (the Delta/
# Hudi MERGE shape — the ingestion pattern every continuously-crawled
# corpus needs: base snapshot + changelog of updates/deletes -> latest)
# ---------------------------------------------------------------------------


def keep_latest_by_version(ds, key: str = "doc_id", version: str = "version",
                           n_buckets: int = 64):
    """Grouped argmax with payload carry: one hash-partition exchange on
    ``key`` (same shape as grouped_sum merge="bucket" / _shuffle_dedup),
    then a vectorized per-bucket lexsort + segment-first gather keeps
    the max-``version`` row per key, all other columns riding along.
    Per-group Python cost is per-BUCKET (bounded), never per-key; no
    driver state at any key cardinality."""
    from .common import bucket_ids

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("__bkt", pa.array(bucket_ids(t, [key], n_buckets)))

    def latest(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__bkt"])
        if g.num_rows == 0:
            return g
        k = g[key].to_numpy(zero_copy_only=False).astype(np.int64)
        v = g[version].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((-v, k))
        k_s = k[order]
        first = np.r_[True, k_s[1:] != k_s[:-1]]
        return g.take(pa.array(order[first]))

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bkt")
        .map_groups(latest, batch_format="pyarrow")
    )


def docs_merge_upsert(sf_dir: str):
    """CDC snapshot merge: the base corpus (version 1) unioned with a
    deterministic changelog — updates (``doc_id % 7 == 3`` → version 2,
    rewritten text) and delete tombstones (``doc_id % 13 == 5`` →
    version 3) — reduced to the latest live row per document.

    The keep-latest is a genuine distributed grouped argmax with
    payload carry (keep_latest_by_version: one bucketed exchange, no
    driver state); tombstone rows win the argmax and are then dropped,
    so a doc that was updated AND deleted stays deleted.  Text rides
    the whole path and must come back byte-identical (the oracle
    value-hashes it)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def changelog(t: pa.Table) -> pa.Table:
        doc = pc.cast(t["doc_id"], pa.int64())
        base = pa.table(
            {
                "doc_id": doc,
                "version": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "is_delete": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
                "text": t["text"],
                "lang": t["lang"],
            }
        )
        d = doc.to_numpy(zero_copy_only=False)
        upd = t.filter(pa.array(d % 7 == 3))
        udoc = pc.cast(upd["doc_id"], pa.int64())
        updates = pa.table(
            {
                "doc_id": udoc,
                "version": pa.array(np.full(upd.num_rows, 2, dtype=np.int64)),
                "is_delete": pa.array(np.zeros(upd.num_rows, dtype=np.int8)),
                "text": pc.binary_join_element_wise(
                    pa.array(["UPDATED v2: "] * upd.num_rows, pa.string()),
                    upd["text"],
                    "",
                ),
                "lang": upd["lang"],
            }
        )
        dele = t.filter(pa.array(d % 13 == 5))
        deletes = pa.table(
            {
                "doc_id": pc.cast(dele["doc_id"], pa.int64()),
                "version": pa.array(np.full(dele.num_rows, 3, dtype=np.int64)),
                "is_delete": pa.array(np.ones(dele.num_rows, dtype=np.int8)),
                "text": pa.array([None] * dele.num_rows, pa.string()),
                "lang": dele["lang"],
            }
        )
        return pa.concat_tables([base, updates, deletes])

    log = ds.map_batches(changelog, batch_format="pyarrow", zero_copy_batch=True)
    latest = keep_latest_by_version(log, key="doc_id", version="version")

    def live(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["is_delete"], 0))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "version": t["version"],
                "lang": t["lang"],
                "text": t["text"],
            }
        )

    return latest.map_batches(live, batch_format="pyarrow", zero_copy_batch=True).sort(
        "doc_id"
    )


DOCS_MERGE_UPSERT_SQL = """
WITH changelog AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, 1 AS version, 0 AS is_delete,
         text, lang FROM documents
  UNION ALL
  SELECT CAST(doc_id AS BIGINT), 2, 0, 'UPDATED v2: ' || text, lang
  FROM documents WHERE doc_id % 7 = 3
  UNION ALL
  SELECT CAST(doc_id AS BIGINT), 3, 1, NULL, lang
  FROM documents WHERE doc_id % 13 = 5
), latest AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY version DESC) AS rn
  FROM changelog
)
SELECT doc_id, CAST(version AS BIGINT) AS version, lang, text
FROM latest WHERE rn = 1 AND is_delete = 0
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Per-language percentile normalization of a quality score — the
# "keep the top X% per language" curation primitive (rank-normalized
# scores are how heterogeneous per-lang score scales become
# comparable).  PERCENT_RANK / CUME_DIST re-expressed distribution-
# style: the (lang, score) histogram is BOUNDED (langs x 101 integer
# scores), so one driver-merged grouped count + a broadcast cumulative
# table replace the window sort entirely — no per-doc shuffle at any
# corpus size.
# ---------------------------------------------------------------------------


def docs_quality_percentile(sf_dir: str):
    """Per-doc quality score (distinct-token pct, as docs_quality) with
    its per-language PERCENT_RANK and CUME_DIST in integer basis
    points: pr_bp = (rank-1)*10000 // (n-1), cume_bp = cd*10000 // n.
    The rank comes from the broadcast (lang, score) cumulative
    histogram, not a window sort — integer-exact vs the RANK()-window
    SQL twin."""
    import ray

    from ..stages.broadcast import with_broadcast

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def score_stage(t: pa.Table) -> pa.Table:
        n_tok, n_dis = T.token_count_stats_arrow(t["text"])
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = np.where(n_tok > 0, n_dis / np.maximum(n_tok, 1), 0.0)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "distinct_pct": pa.array(np.floor(ratio * 100.0).astype(np.int64)),
            }
        )

    def hist_stage(t: pa.Table) -> pa.Table:
        s = score_stage(t)
        return pa.table(
            {
                "lang": s["lang"],
                "distinct_pct": s["distinct_pct"],
                "one": pa.array(np.ones(s.num_rows, dtype=np.int64)),
            }
        )

    hist = grouped_sum(
        ds.map_batches(hist_stage, batch_format="pyarrow", zero_copy_batch=True),
        ["lang", "distinct_pct"],
        {"n": ("one", "sum")},
        merge="driver",  # bounded: langs x 101 integer scores
    )
    ht = pa.concat_tables(
        [b for b in hist.iter_batches(batch_size=None, batch_format="pyarrow")]
    )
    langs = sorted(set(ht["lang"].to_pylist()))
    lidx = {v: i for i, v in enumerate(langs)}
    S = 101  # score domain 0..100
    lower = np.zeros(len(langs) * S, dtype=np.int64)  # #{score' < s} per lang
    ties = np.zeros(len(langs) * S, dtype=np.int64)
    n_lang = np.zeros(len(langs), dtype=np.int64)
    li = np.array([lidx[v] for v in ht["lang"].to_pylist()], dtype=np.int64)
    sc = ht["distinct_pct"].to_numpy()
    cn = ht["n"].to_numpy()
    ties[li * S + sc] = cn
    np.add.at(n_lang, li, cn)
    for i in range(len(langs)):  # bounded loop: one iteration per language
        seg = ties[i * S : (i + 1) * S]
        lower[i * S : (i + 1) * S] = np.cumsum(seg) - seg
    ref = ray.put((pa.array(langs, pa.string()), lower, ties, n_lang))

    def finish(state, t: pa.Table) -> pa.Table:
        lang_arr, lower, ties, n_lang = state
        s = score_stage(t)
        li = pc.index_in(s["lang"], value_set=lang_arr).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        sc = s["distinct_pct"].to_numpy()
        key = li * 101 + sc
        n = n_lang[li]
        pr_bp = np.where(n > 1, lower[key] * 10000 // np.maximum(n - 1, 1), 0)
        cume_bp = (lower[key] + ties[key]) * 10000 // n
        return pa.table(
            {
                "doc_id": s["doc_id"],
                "lang": s["lang"],
                "distinct_pct": s["distinct_pct"],
                "pr_bp": pa.array(pr_bp.astype(np.int64)),
                "cume_bp": pa.array(cume_bp.astype(np.int64)),
            }
        )

    return ds.map_batches(
        with_broadcast(ref, finish, "quality_percentile_hist"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).sort("doc_id")


DOCS_QUALITY_PERCENTILE_SQL = f"""
WITH q AS (
  SELECT doc_id, lang,
         CAST(floor(CASE WHEN len({_TOKENS_SQL}) > 0
                    THEN len(list_distinct({_TOKENS_SQL}))
                         / greatest(len({_TOKENS_SQL}), 1) * 100.0
                    ELSE 0.0 END) AS BIGINT) AS distinct_pct
  FROM documents
), w AS (
  SELECT doc_id, lang, distinct_pct,
         RANK() OVER (PARTITION BY lang ORDER BY distinct_pct) AS rnk,
         RANK() OVER (PARTITION BY lang ORDER BY distinct_pct DESC) AS rnk_d,
         COUNT(*) OVER (PARTITION BY lang) AS cnt
  FROM q
)
SELECT doc_id, lang, distinct_pct,
       CAST(CASE WHEN cnt > 1 THEN (rnk - 1) * 10000 // (cnt - 1)
                 ELSE 0 END AS BIGINT) AS pr_bp,
       CAST((cnt - rnk_d + 1) * 10000 // cnt AS BIGINT) AS cume_bp
FROM w
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Partitioned-parquet export + partition-PRUNED read-back: the
# resumable-output convention (one directory per partition value;
# failed runs skip finished partitions) proven end to end — the
# read-back opens ONLY the requested partition's directory, so pruning
# is path-level (absent partitions are never even listed).
# ---------------------------------------------------------------------------

_EXPORT_LANG = "en"


def docs_partitioned_export(sf_dir: str):
    """Write the documents table partitioned by lang (the resumable
    layout from sources/text.write_partitioned), then compute per-source
    stats from a read of ONLY the lang='en' partition directory.  The
    oracle runs WHERE lang = 'en' over the ORIGINAL parquet, so any row
    loss / duplication / text corruption through the partitioned
    round trip breaks the value hash."""
    import shutil
    import tempfile

    import ray.data

    from ..sources.text import write_partitioned

    out_dir = os.path.join(
        tempfile.gettempdir(),
        f"graft_part_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang", "source"])
    write_partitioned(ds, out_dir, ["lang"])

    # path-level partition pruning: only lang=en is ever opened
    part = ray.data.read_parquet(
        os.path.join(out_dir, f"lang={_EXPORT_LANG}"),
        columns=["doc_id", "text", "source"],
    )

    def partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": t["source"],
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "chars": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
                "min_doc": pc.cast(t["doc_id"], pa.int64()),
            }
        )

    agg = grouped_sum(
        part.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["source"],
        {
            "n_docs": ("one", "sum"),
            "total_chars": ("chars", "sum"),
            "min_doc": ("min_doc", "min"),
        },
        merge="driver",  # source count provably bounded
    )
    return agg.sort("source")


DOCS_PARTITIONED_EXPORT_SQL = f"""
SELECT source, count(*)::BIGINT AS n_docs,
       sum(length(text))::BIGINT AS total_chars,
       CAST(min(doc_id) AS BIGINT) AS min_doc
FROM documents
WHERE lang = '{_EXPORT_LANG}'
GROUP BY source
ORDER BY source
"""


# ---------------------------------------------------------------------------
# SCD Type-2 interval construction: the temporal-table builder that
# complements docs_merge_upsert's keep-latest.  From the same
# deterministic changelog (base v1, updates v2, delete tombstones v3)
# it emits EVERY version row with its validity window
# [version, valid_to) — valid_to = the key's next version (NULL while
# current) — and an is_current flag (latest AND not a tombstone).
# Engine shape: one hash-partition exchange on doc_id, then one
# lexsort + shifted segment compare per bucket (LEAD is an
# adjacent-row gather once a key's rows are co-located and sorted —
# no per-key Python, rule 1).  The exchange ships 3 int64s/row at any
# corpus size.
# ---------------------------------------------------------------------------


def docs_scd2_intervals(sf_dir: str, n_buckets: int = 64):
    from ..functions.hashing import splitmix64

    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def changelog(t: pa.Table) -> pa.Table:
        doc = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        d_upd = doc[doc % 7 == 3]
        d_del = doc[doc % 13 == 5]
        docs = np.concatenate([doc, d_upd, d_del])
        ver = np.concatenate(
            [
                np.ones(len(doc), dtype=np.int64),
                np.full(len(d_upd), 2, dtype=np.int64),
                np.full(len(d_del), 3, dtype=np.int64),
            ]
        )
        is_del = np.concatenate(
            [
                np.zeros(len(doc) + len(d_upd), dtype=np.int64),
                np.ones(len(d_del), dtype=np.int64),
            ]
        )
        bkt = (splitmix64(docs.astype(np.uint64)) % np.uint64(n_buckets)).astype(
            np.int64
        )
        return pa.table(
            {
                "__bkt": pa.array(bkt),
                "doc_id": pa.array(docs),
                "version": pa.array(ver),
                "is_delete": pa.array(is_del),
            }
        )

    _OUT = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("version", pa.int64()),
            ("is_delete", pa.int64()),
            ("valid_to", pa.int64()),
            ("is_current", pa.int64()),
        ]
    )

    def intervals(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return _OUT.empty_table()
        doc = g["doc_id"].to_numpy(zero_copy_only=False)
        ver = g["version"].to_numpy(zero_copy_only=False)
        isd = g["is_delete"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ver, doc))
        doc, ver, isd = doc[order], ver[order], isd[order]
        same_next = np.zeros(n, dtype=bool)
        same_next[:-1] = doc[1:] == doc[:-1]
        lead = np.zeros(n, dtype=np.int64)
        lead[:-1] = ver[1:]
        valid_to = pc.if_else(
            pa.array(same_next), pa.array(lead), pa.scalar(None, pa.int64())
        )
        is_cur = ((~same_next) & (isd == 0)).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(doc),
                "version": pa.array(ver),
                "is_delete": pa.array(isd),
                "valid_to": valid_to,
                "is_current": pa.array(is_cur),
            }
        )

    return (
        ds.map_batches(changelog, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bkt")
        .map_groups(intervals, batch_format="pyarrow")
        .sort(["doc_id", "version"])
    )


DOCS_SCD2_SQL = """
WITH changelog AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, 1 AS version, 0 AS is_delete
  FROM documents
  UNION ALL
  SELECT CAST(doc_id AS BIGINT), 2, 0 FROM documents WHERE doc_id % 7 = 3
  UNION ALL
  SELECT CAST(doc_id AS BIGINT), 3, 1 FROM documents WHERE doc_id % 13 = 5
), iv AS (
  SELECT doc_id, version, is_delete,
         LEAD(version) OVER (PARTITION BY doc_id ORDER BY version) AS valid_to
  FROM changelog
)
SELECT doc_id, CAST(version AS BIGINT) AS version,
       CAST(is_delete AS BIGINT) AS is_delete,
       CAST(valid_to AS BIGINT) AS valid_to,
       CAST(CASE WHEN valid_to IS NULL AND is_delete = 0 THEN 1 ELSE 0 END
            AS BIGINT) AS is_current
FROM iv
ORDER BY doc_id, version
"""


# ---------------------------------------------------------------------------
# TextRank keyword scores (Mihalcea & Tarau 2004): integer PageRank
# over the token ADJACENCY graph (undirected: each in-document adjacent
# token pair contributes an edge in both directions, multiplicity
# kept).  Composes the corpus tokenizer (functions/text.flat_tokens —
# one Arrow split per batch, zero per-row Python) with the shard-once
# BSP pagerank engine (pipelines/graph.pagerank); node ids come from
# the driver-merged BOUNDED vocabulary (rule 2), so the SQL twin can
# run the identical unrolled integer recurrence on the token strings
# themselves.  Exact at every scale.
# ---------------------------------------------------------------------------

TEXTRANK_ITERS = 4


def docs_textrank(sf_dir: str, iters: int = TEXTRANK_ITERS):
    import ray

    from ..stages.broadcast import with_broadcast
    from .graph import pagerank

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    # pass 1: bounded vocabulary -> sorted id table (driver merge)
    def tok_partial(t: pa.Table) -> pa.Table:
        flat, _, _ = T.flat_tokens(t["text"])
        u = pc.unique(flat)
        return pa.table(
            {"token": u, "one": pa.array(np.ones(len(u), dtype=np.int64))}
        )

    vocab_pd = (
        grouped_sum(
            ds.map_batches(tok_partial, batch_format="pyarrow", zero_copy_batch=True),
            ["token"],
            {"one": ("one", "min")},
            merge="driver",
        )
        .to_pandas()
        .sort_values("token")
    )
    vocab = np.asarray(vocab_pd["token"].values, dtype=object)
    ref = ray.put(vocab)

    def edge_stage(voc: np.ndarray, t: pa.Table) -> pa.Table:
        flat, docidx, _ = T.flat_tokens(t["text"])
        if len(flat) == 0:
            return pa.table(
                {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
            )
        ids = np.searchsorted(voc, np.asarray(flat.to_numpy(zero_copy_only=False)))
        adj = docidx[1:] == docidx[:-1]
        a = ids[:-1][adj]
        b = ids[1:][adj]
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b])),
                "dst": pa.array(np.concatenate([b, a])),
            }
        )

    edges = ds.map_batches(
        with_broadcast(ref, edge_stage), batch_format="pyarrow", zero_copy_batch=True
    )
    ranks = pagerank(edges, iters=iters)

    def back(voc: np.ndarray, t: pa.Table) -> pa.Table:
        ids = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"token": pa.array(voc[ids], pa.string()), "r": t["r"]}
        )

    return ranks.map_batches(
        with_broadcast(ref, back), batch_format="pyarrow", zero_copy_batch=True
    ).sort("token")


def docs_textrank_sql(iters: int = TEXTRANK_ITERS) -> str:
    from .graph import PR_BASE, PR_SCALE

    head = f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, i, tok FROM (
    SELECT doc_id,
           unnest({_TOKENS_SQL}) AS tok,
           generate_subscripts({_TOKENS_SQL}, 1) AS i
    FROM documents
  )
),
edges AS MATERIALIZED (
  SELECT a.tok AS src, b.tok AS dst
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  UNION ALL
  SELECT b.tok, a.tok
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
),
nodes AS (
  SELECT DISTINCT src AS node FROM edges
  UNION
  SELECT DISTINCT dst AS node FROM edges
),
outd AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY src),
r0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) AS r FROM nodes)"""
    steps = []
    for i in range(1, iters + 1):
        steps.append(f""",
r{i} AS (
  SELECT n.node,
         CAST({PR_BASE} + (85 * COALESCE(c.c, 0)) // 100 AS BIGINT) AS r
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, CAST(sum(rr.r // o.d) AS BIGINT) AS c
    FROM edges e
    JOIN r{i - 1} rr ON rr.node = e.src
    JOIN outd o ON o.src = e.src
    GROUP BY e.dst
  ) c ON c.node = n.node
)""")
    return head + "".join(steps) + f"""
SELECT node AS token, r FROM r{iters} ORDER BY token
"""


# ---------------------------------------------------------------------------
# Incremental materialized-view maintenance: the per-lang corpus stats
# view updated from the CDC changelog WITHOUT rescanning the merged
# corpus — the delta-aggregation class (streaming matview / dbt
# incremental shape).  For the deterministic changelog (update rule
# doc%7==3 prepends the 12-char "UPDATED v2: "; delete rule doc%13==5
# tombstones the doc's LATEST version), the per-doc delta against the
# base view is closed-form: delete → (-1 doc, -len(v1) chars, the
# update's +12 cancelled if both fire), update-only → (+0, +12).
# ONE fused scan emits base partials WITH deltas folded in; the
# bounded per-lang aggregate driver-merges.  The oracle is the FULL
# RECOMPUTE over the merged live state — the query passing means
# incremental maintenance provably equals recomputation.
# ---------------------------------------------------------------------------


def docs_incremental_matview(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    _UPD_PREFIX_CHARS = len("UPDATED v2: ")

    def fused(t: pa.Table) -> pa.Table:
        d = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        chars = pc.utf8_length(pc.fill_null(t["text"], "")).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        is_del = d % 13 == 5
        is_upd = (d % 7 == 3) & ~is_del
        n = np.where(is_del, 0, 1).astype(np.int64)
        ch = np.where(
            is_del, 0, chars + np.where(is_upd, _UPD_PREFIX_CHARS, 0)
        ).astype(np.int64)
        return pa.table({"lang": t["lang"], "n": pa.array(n), "ch": pa.array(ch)})

    agg = grouped_sum(
        ds.map_batches(fused, batch_format="pyarrow", zero_copy_batch=True),
        ["lang"],
        {"n_docs": ("n", "sum"), "total_chars": ("ch", "sum")},
        merge="driver",
    )
    return agg.map_batches(
        lambda t: t.filter(pc.greater(t["n_docs"], 0)), batch_format="pyarrow"
    ).sort("lang")


DOCS_INCREMENTAL_MATVIEW_SQL = """
WITH changelog AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, 1 AS version, 0 AS is_delete,
         text, lang FROM documents
  UNION ALL
  SELECT CAST(doc_id AS BIGINT), 2, 0, 'UPDATED v2: ' || text, lang
  FROM documents WHERE doc_id % 7 = 3
  UNION ALL
  SELECT CAST(doc_id AS BIGINT), 3, 1, NULL, lang
  FROM documents WHERE doc_id % 13 = 5
), latest AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY version DESC) AS rn
  FROM changelog
), live AS (
  SELECT lang, text FROM latest WHERE rn = 1 AND is_delete = 0
)
SELECT lang, count(*)::BIGINT AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS total_chars
FROM live GROUP BY lang ORDER BY lang
"""


# ---------------------------------------------------------------------------
# Exact-k uniform sample (bottom-k by hash): unlike docs_sample's
# hash-threshold (whose output size is binomial), bottom-k returns
# EXACTLY k rows at any corpus size — the distributed reservoir
# replacement: each block reduces to its own k smallest (doc-id-mixed)
# hashes, the driver finishes over the bounded k x blocks partials,
# and the pick is reproducible (no RNG state).  Ties break by doc_id
# on both engines.
# ---------------------------------------------------------------------------


def docs_bottomk_sample(sf_dir: str, k: int = 100):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        key = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        h = (key * 2654435761 + 1013904223) % 4294967296
        if len(key) > k:
            idx = np.lexsort((key, h))[:k]
            t = t.take(pa.array(np.sort(idx)))
            h = h[np.sort(idx)]
        return pa.table(
            {"doc_id": pc.cast(t["doc_id"], pa.int64()), "lang": t["lang"],
             "h": pa.array(h)}
        )

    parts = [
        b
        for b in ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow")
        if b.num_rows
    ]
    whole = pa.concat_tables(parts)
    order = np.lexsort(
        (
            whole["doc_id"].to_numpy(zero_copy_only=False),
            whole["h"].to_numpy(zero_copy_only=False),
        )
    )[:k]
    out = whole.take(pa.array(order)).select(["doc_id", "lang"])
    return out.sort_by([("doc_id", "ascending")])


def docs_bottomk_sample_sql(k: int = 100) -> str:
    return f"""
SELECT doc_id, lang FROM (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
         (doc_id * 2654435761 + 1013904223) % 4294967296 AS h
  FROM documents
  ORDER BY h, doc_id LIMIT {k}
) ORDER BY doc_id
"""


def mm_image_patches(sf_dir: str):
    """ViT-style patch extraction over the REAL PNG codec path: same
    deterministic payloads as docs_image_features, decoded in an actor
    pool, split into 4x4 grayscale tiles with exact-integer mean/var.
    Rows-only (SQL cannot decode PNG); golden-pinned."""
    from ..functions.png import encode_png
    from ..stages.multimodal import ImagePatches

    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def to_payload(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        payloads = [encode_png(_synth_image(int(i))) for i in ids]
        return pa.table(
            {"doc_id": t["doc_id"], "payload": pa.array(payloads, type=pa.binary())}
        )

    ds = ds.map_batches(to_payload, batch_format="pyarrow", zero_copy_batch=True)
    return ds.map_batches(
        ImagePatches,
        fn_constructor_args=("doc_id",),
        batch_format="pyarrow",
        concurrency=2,
        batch_size=64,
    ).sort(["doc_id", "patch_row", "patch_col"])


def mm_audio_spectrogram(sf_dir: str):
    """Banded power spectrogram over the REAL WAV codec path: the same
    deterministic PCM16 payloads as docs_audio_features, framed
    128/64, rFFT power in 8 bands per doc.  Rows-only; golden-pinned."""
    from ..functions.hashing import splitmix64
    from ..functions.wav import encode_wav
    from ..stages.multimodal import AudioSpectrogram

    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def to_payload(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        payloads = []
        for i in ids:
            n = 200 + int(i) % 50 * 4
            seed = splitmix64(np.uint64(i) ^ np.uint64(0xA5A5A5A5A5A5A5A5))
            raw = splitmix64(seed + np.arange(n, dtype=np.uint64))
            samples = ((raw & np.uint64(0xFFFF)).astype(np.int64) - 32768).astype(
                np.int16
            )
            payloads.append(encode_wav(samples, 8000))
        return pa.table(
            {"doc_id": t["doc_id"], "payload": pa.array(payloads, type=pa.binary())}
        )

    ds = ds.map_batches(to_payload, batch_format="pyarrow", zero_copy_batch=True)
    return ds.map_batches(
        AudioSpectrogram,
        fn_constructor_args=("doc_id",),
        batch_format="pyarrow",
        concurrency=2,
        batch_size=64,
    ).sort(["doc_id", "band"])


# ---------------------------------------------------------------------------
# Positional phrase search: the inverted-index / corpus-search class —
# count documents and occurrences of specific multi-token PHRASES
# (adjacent-token matches, not substrings).  The phrase list is
# data-derived (the corpus's top-5 bigrams, deterministic tie-break)
# so the whole query is self-contained: phase 1 reuses the bigram
# counting exchange and lands 5 rows on the driver; phase 2 broadcasts
# the phrase token pairs and every batch matches them with two
# vectorized equality kernels over adjacent token slices — only
# (phrase, doc, count) partials cross, one bounded-key exchange each.
# ---------------------------------------------------------------------------


def docs_phrase_search(sf_dir: str, k_phrases: int = 5):
    import ray

    from ..stages.broadcast import with_broadcast

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def pairs(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(nonempty))
        parent = parent[nonempty]
        if len(flat) < 2:
            return pa.table(
                {"bigram": pa.array([], pa.string()), "one": pa.array([], pa.int64())}
            )
        a = flat.slice(0, len(flat) - 1)
        b = flat.slice(1)
        same = pa.array(parent[1:] == parent[:-1])
        bg = pc.binary_join_element_wise(a.filter(same), b.filter(same), " ")
        return pa.table(
            {"bigram": bg, "one": pa.array(np.ones(len(bg), dtype=np.int64))}
        )

    top = (
        grouped_sum(
            ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True),
            ["bigram"],
            {"n": ("one", "sum")},
        )
        .sort(["n", "bigram"], descending=[True, False])
        .limit(k_phrases)
        .to_pandas()
    )
    phrases = sorted(top["bigram"].tolist())
    ref = ray.put(phrases)

    def match(plist, t: pa.Table) -> pa.Table:
        doc = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        toks = pc.split_pattern(t["text"], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(nonempty))
        parent = parent[nonempty]
        out_p, out_d, out_c = [], [], []
        if len(flat) >= 2:
            a = flat.slice(0, len(flat) - 1)
            b = flat.slice(1)
            same = parent[1:] == parent[:-1]
            pa_ = parent[:-1]
            for ph in plist:
                w1, w2 = ph.split(" ", 1)
                m = (
                    pc.equal(a, w1).to_numpy(zero_copy_only=False)
                    & pc.equal(b, w2).to_numpy(zero_copy_only=False)
                    & same
                )
                if not m.any():
                    continue
                rows, cnts = np.unique(pa_[m], return_counts=True)
                out_p.append(np.full(len(rows), ph, dtype=object))
                out_d.append(doc[rows])
                out_c.append(cnts.astype(np.int64))
        if not out_p:
            return pa.table(
                {
                    "phrase": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                    "occ": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "phrase": pa.array(np.concatenate(out_p), pa.string()),
                "doc_id": pa.array(np.concatenate(out_d)),
                "occ": pa.array(np.concatenate(out_c)),
            }
        )

    per_doc = grouped_sum(
        ds.map_batches(
            with_broadcast(ref, match), batch_format="pyarrow", zero_copy_batch=True
        ),
        ["phrase", "doc_id"],
        {"occ": ("occ", "sum")},
    )

    def fold(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "phrase": t["phrase"],
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "occ": t["occ"],
            }
        )

    agg = grouped_sum(
        per_doc.map_batches(fold, batch_format="pyarrow", zero_copy_batch=True),
        ["phrase"],
        {"n_docs": ("one", "sum"), "n_occurrences": ("occ", "sum")},
        merge="driver",
    )
    return agg.sort("phrase")


def docs_phrase_search_sql(k_phrases: int = 5) -> str:
    return f"""
WITH tok AS (
  SELECT doc_id,
         unnest({_TOKENS_SQL}) AS w,
         generate_subscripts({_TOKENS_SQL}, 1) AS i
  FROM documents
), bg AS (
  SELECT t1.doc_id, t1.w || ' ' || t2.w AS bigram
  FROM tok t1 JOIN tok t2 ON t1.doc_id = t2.doc_id AND t2.i = t1.i + 1
), top AS (
  SELECT bigram FROM bg GROUP BY bigram
  ORDER BY count(*) DESC, bigram LIMIT {k_phrases}
)
SELECT b.bigram AS phrase,
       CAST(count(DISTINCT b.doc_id) AS BIGINT) AS n_docs,
       count(*)::BIGINT AS n_occurrences
FROM bg b JOIN top ON b.bigram = top.bigram
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Deterministic train/val/test split assignment — the corpus-split op
# every training pipeline runs before anything else.  Assignment is a
# pure function of doc_id (the docs_sample multiplicative hash), so it
# is reproducible across runs, workers and partitionings, and a doc
# never migrates between splits when the corpus is re-sharded.  The
# per-split audit (n_docs, total chars) is a 3-group aggregate:
# per-batch combiner partials -> driver merge, zero exchanges.
# ---------------------------------------------------------------------------

SPLIT_TRAIN_PCT = 80
SPLIT_VAL_PCT = 10  # remainder = test


def docs_split_assign(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def assign(t: pa.Table) -> pa.Table:
        k = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = ((k * 2654435761 + 1013904223) % 4294967296) % 100
        split = np.full(len(k), "test", dtype=object)
        split[h < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT] = "val"
        split[h < SPLIT_TRAIN_PCT] = "train"
        return pa.table(
            {
                "split": pa.array(split, pa.string()),
                "one": pa.array(np.ones(len(k), dtype=np.int64)),
                "chars": pc.cast(t["n_chars"], pa.int64()),
            }
        )

    agg = grouped_sum(
        ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True),
        ["split"],
        {"n_docs": ("one", "sum"), "total_chars": ("chars", "sum")},
        merge="driver",
    )
    return agg.sort("split")


DOCS_SPLIT_ASSIGN_SQL = f"""
WITH s AS (
  SELECT CASE
           WHEN ((doc_id * 2654435761 + 1013904223) % 4294967296) % 100
                < {SPLIT_TRAIN_PCT} THEN 'train'
           WHEN ((doc_id * 2654435761 + 1013904223) % 4294967296) % 100
                < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT} THEN 'val'
           ELSE 'test'
         END AS split,
         n_chars
  FROM documents
)
SELECT split, count(*)::BIGINT AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM s GROUP BY split ORDER BY split
"""


# ---------------------------------------------------------------------------
# Order-invariant table checksum — the data-validation / anti-entropy
# operator (verify a migrated or replicated corpus WITHOUT moving it):
# per-language row count + modular row-hash sum.  The row hash is pure
# BIGINT arithmetic (multiplicative mix of doc_id and n_chars, reduced
# mod a ~2^38 prime) so DuckDB computes the identical value; the sum is
# order- and partitioning-invariant by construction ((a+b) % M ==
# (a%M + b%M) % M), so any two engines at any shard layout agree.
# Engine shape: per-batch vectorized hash + in-batch per-lang partial
# (already reduced mod M, so cross-batch sums stay within int64 for
# up to ~3e7 blocks; tree-merge the partials beyond that), driver
# merge over the bounded language key.  One streaming pass, zero
# shuffles.
# ---------------------------------------------------------------------------

CHECKSUM_MOD = 274_877_906_899  # prime near 2^38


def docs_table_checksum(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        k = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nc = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = ((k % 2147483648) * 2654435761 + (nc % 1000003) * 97003) % CHECKSUM_MOD
        langs, inv = np.unique(
            np.asarray(t["lang"].to_numpy(zero_copy_only=False)), return_inverse=True
        )
        n = np.zeros(len(langs), dtype=np.int64)
        s = np.zeros(len(langs), dtype=np.int64)
        np.add.at(n, inv, 1)
        np.add.at(s, inv, h)
        return pa.table(
            {
                "lang": pa.array(langs, pa.string()),
                "n_docs": pa.array(n),
                "hsum": pa.array(s % CHECKSUM_MOD),
            }
        )

    agg = grouped_sum(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["lang"],
        {"n_docs": ("n_docs", "sum"), "hsum": ("hsum", "sum")},
        merge="driver",
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": t["lang"],
                "n_docs": t["n_docs"],
                "checksum": pa.array(
                    t["hsum"].to_numpy(zero_copy_only=False) % CHECKSUM_MOD
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("lang")


DOCS_TABLE_CHECKSUM_SQL = f"""
SELECT lang, count(*)::BIGINT AS n_docs,
       CAST(sum(((doc_id % 2147483648) * 2654435761
                 + (n_chars % 1000003) * 97003) % {CHECKSUM_MOD})
            % {CHECKSUM_MOD} AS BIGINT) AS checksum
FROM documents
GROUP BY lang ORDER BY lang
"""


# ---------------------------------------------------------------------------
# Snapshot diff — the dataset-versioning comparison operator (what
# changed between two corpus snapshots): full outer join on the key,
# per-row status from side-presence flags and payload comparison.
# Snapshot B is derived deterministically from the documents table so
# the op is self-contained: docs with doc_id % 11 == 0 are REMOVED,
# docs with doc_id % 7 == 0 have n_chars bumped (CHANGED), and a new
# doc (id + 1e9) is ADDED for every doc_id % 13 == 0.  Engine shape:
# one bucketed full outer hash join (stages/join.py — typed-null
# columns, presence flags), vectorized status classify, unchanged rows
# dropped pre-sort.  Scales as the join scales; no driver state.
# ---------------------------------------------------------------------------

SNAPSHOT_ADD_OFFSET = 1_000_000_000


def docs_snapshot_diff(sf_dir: str):
    from ..stages.join import hash_join

    base = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def a_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "a_chars": pc.cast(t["n_chars"], pa.int64()),
                "a_one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    def b_prep(t: pa.Table) -> pa.Table:
        k = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nc = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = k % 11 != 0
        kk, nk = k[keep], nc[keep]
        bumped = nk + (kk % 7 == 0)
        newk = k[k % 13 == 0] + SNAPSHOT_ADD_OFFSET
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate([kk, newk])),
                "b_chars": pa.array(
                    np.concatenate([bumped, np.full(len(newk), 42, dtype=np.int64)])
                ),
                "b_one": pa.array(np.ones(len(kk) + len(newk), dtype=np.int64)),
            }
        )

    joined = hash_join(
        base.map_batches(a_prep, batch_format="pyarrow", zero_copy_batch=True),
        base.map_batches(b_prep, batch_format="pyarrow", zero_copy_batch=True),
        on="doc_id",
        how="full",
    )

    def classify(t: pa.Table) -> pa.Table:
        in_a = pc.is_valid(t["a_one"]).to_numpy(zero_copy_only=False)
        in_b = pc.is_valid(t["b_one"]).to_numpy(zero_copy_only=False)
        ac = t["a_chars"].to_numpy(zero_copy_only=False)
        bc = t["b_chars"].to_numpy(zero_copy_only=False)
        status = np.full(t.num_rows, "same", dtype=object)
        status[in_a & ~in_b] = "removed"
        status[~in_a & in_b] = "added"
        both = in_a & in_b
        status[both & (ac != bc)] = "changed"
        m = pa.array(status != "same")
        return pa.table(
            {
                "doc_id": t["doc_id"].filter(m),
                "status": pa.array(status[status != "same"], pa.string()),
            }
        )

    return joined.map_batches(
        classify, batch_format="pyarrow", zero_copy_batch=True
    ).sort("doc_id")


DOCS_SNAPSHOT_DIFF_SQL = f"""
WITH a AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n_chars AS BIGINT) AS n_chars
  FROM documents
),
b AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(n_chars + CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS BIGINT)
           AS n_chars
  FROM documents WHERE doc_id % 11 <> 0
  UNION ALL
  SELECT CAST(doc_id + {SNAPSHOT_ADD_OFFSET} AS BIGINT), CAST(42 AS BIGINT)
  FROM documents WHERE doc_id % 13 = 0
)
SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
       CASE WHEN b.doc_id IS NULL THEN 'removed'
            WHEN a.doc_id IS NULL THEN 'added'
            ELSE 'changed' END AS status
FROM a FULL JOIN b ON a.doc_id = b.doc_id
WHERE b.doc_id IS NULL OR a.doc_id IS NULL OR a.n_chars <> b.n_chars
ORDER BY doc_id
"""
