"""Text-analysis kernels for the training-data pipeline operators:
tokenization, quality stats, language-ID, shingles, MinHash, SimHash,
rolling-hash fingerprints.

Tokenization contract (shared with the DuckDB oracles): a token is a
maximal run of non-space characters — exactly ``text.split(' ')`` with
empty strings dropped, which equals DuckDB's
``list_filter(string_split(text, ' '), x -> x <> '')``.  The ``text``
column itself is NEVER modified (byte-identical passthrough invariant,
BASELINE.json:15).
"""

from __future__ import annotations

import numpy as np

from .hashing import splitmix64

_U64 = np.uint64


def tokenize(text: str) -> list[str]:
    return [t for t in text.split(" ") if t]


def token_counts(texts) -> np.ndarray:
    """n_tokens per document (vectorized enough: one C-level split per doc)."""
    return np.fromiter(
        (len(tokenize(t)) if t is not None else 0 for t in texts),
        dtype=np.int64,
        count=len(texts),
    )


def distinct_token_counts(texts) -> np.ndarray:
    return np.fromiter(
        (len(set(tokenize(t))) if t is not None else 0 for t in texts),
        dtype=np.int64,
        count=len(texts),
    )


def token_counts_arrow(col) -> np.ndarray:
    """n_tokens per doc straight from an Arrow string column — one
    split_pattern + offset math, no Python strings.  Identical values
    to :func:`token_counts` (tokenize drops empties; null → 0)."""
    _flat, _docidx, counts = flat_tokens(col)
    return counts


def token_count_stats_arrow(col) -> tuple[np.ndarray, np.ndarray]:
    """(n_tokens, n_distinct) per doc, vectorized AND string-exact:
    distinct is counted over ``dictionary_encode`` codes of the flat
    tokens (identical strings → identical code — no hash-collision
    caveat), so values match ``len(set(tokenize(t)))`` per row exactly.
    One split + one dictionary encode + one sort; zero per-row Python.
    """
    import pyarrow.compute as pc

    flat, docidx, counts = flat_tokens(col)
    n_docs = len(counts)
    if len(flat) == 0:
        return counts, np.zeros(n_docs, dtype=np.int64)
    codes = pc.dictionary_encode(flat).indices.to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    n_codes = int(codes.max()) + 1
    uniq = np.unique(docidx * np.int64(n_codes) + codes)
    n_distinct = np.bincount(uniq // np.int64(n_codes), minlength=n_docs).astype(
        np.int64
    )
    return counts, n_distinct


def flat_tokens(col):
    """Vectorized batch tokenizer over an Arrow string column.

    Returns ``(flat, docidx, counts)``: ``flat`` is a pyarrow
    StringArray of every non-empty token across the batch (doc-major
    order preserved), ``docidx`` maps each flat token to its row in the
    batch, ``counts`` is tokens-per-row.  One ``pc.split_pattern`` call
    plus numpy offset math — no Python loop over rows or tokens (the
    whole point vs :func:`tokenize` per row).  Nulls count as empty.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    words = pc.split_pattern(col, " ")
    lens = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    flat_all = words.flatten()
    keep = pc.not_equal(flat_all, "").to_numpy(zero_copy_only=False).astype(bool)
    docidx_all = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    flat = flat_all.filter(pa.array(keep))
    docidx = docidx_all[keep]
    counts = np.bincount(docidx, minlength=len(lens)).astype(np.int64)
    return flat, docidx, counts


# ---------------------------------------------------------------------------
# Quality scoring (heuristics in the C4/Gopher tradition — public recipes)
# ---------------------------------------------------------------------------

_STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been it this that for on with as at by".split()
)


def quality_stats(texts) -> dict[str, np.ndarray]:
    """Per-doc quality components: n_tokens, n_distinct, distinct_ratio,
    mean_token_len, stopword_ratio, alpha_ratio."""
    n = len(texts)
    n_tokens = np.zeros(n, dtype=np.int64)
    n_distinct = np.zeros(n, dtype=np.int64)
    mean_len = np.zeros(n, dtype=np.float64)
    stop_ratio = np.zeros(n, dtype=np.float64)
    alpha_ratio = np.zeros(n, dtype=np.float64)
    for i, t in enumerate(texts):
        if not t:
            continue
        toks = tokenize(t)
        if not toks:
            continue
        n_tokens[i] = len(toks)
        n_distinct[i] = len(set(toks))
        mean_len[i] = sum(len(w) for w in toks) / len(toks)
        stop_ratio[i] = sum(w in _STOPWORDS for w in toks) / len(toks)
        n_alpha = sum(c.isalpha() for c in t)
        alpha_ratio[i] = n_alpha / len(t)
    with np.errstate(invalid="ignore", divide="ignore"):
        distinct_ratio = np.where(n_tokens > 0, n_distinct / np.maximum(n_tokens, 1), 0.0)
    return {
        "n_tokens": n_tokens,
        "n_distinct": n_distinct,
        "distinct_ratio": distinct_ratio,
        "mean_token_len": mean_len,
        "stopword_ratio": stop_ratio,
        "alpha_ratio": alpha_ratio,
    }


def quality_stats_arrow(col) -> dict[str, np.ndarray]:
    """Arrow-native :func:`quality_stats`: identical values per row
    (parity-tested), zero per-row Python.  n_tokens/n_distinct via
    flat_tokens + dictionary codes; mean/stopword via one utf8_length
    and one is_in over the flat tokens; alpha via an RE2 ``\\P{L}``
    strip (Python's ``str.isalpha`` is Unicode category L; the one
    divergence is codepoints newly assigned in a Unicode version RE2
    ships but CPython's tables don't — e.g. plane-3 Ext-H ideographs
    on 3.11 — where RE2 says letter and isalpha says no)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    flat, docidx, n_tokens = flat_tokens(col)
    n_distinct = np.zeros(n, dtype=np.int64)
    mean_len = np.zeros(n, dtype=np.float64)
    stop_ratio = np.zeros(n, dtype=np.float64)
    alpha_ratio = np.zeros(n, dtype=np.float64)
    nz = n_tokens > 0
    if len(flat):
        codes = pc.dictionary_encode(flat).indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        ncodes = int(codes.max()) + 1
        uniq = np.unique(docidx * np.int64(ncodes) + codes)
        n_distinct = np.bincount(uniq // np.int64(ncodes), minlength=n).astype(
            np.int64
        )
        tl = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.float64)
        mean_len[nz] = np.bincount(docidx, weights=tl, minlength=n)[nz] / n_tokens[nz]
        sw = pc.is_in(
            flat, value_set=pa.array(sorted(_STOPWORDS), type=pa.string())
        ).to_numpy(zero_copy_only=False).astype(np.float64)
        stop_ratio[nz] = np.bincount(docidx, weights=sw, minlength=n)[nz] / n_tokens[nz]
        # alpha ratio over the RAW text — but, like the scalar twin,
        # only for rows that have at least one token
        filled = pc.fill_null(col, "")
        tlen = pc.utf8_length(filled).to_numpy(zero_copy_only=False).astype(np.int64)
        stripped = pc.replace_substring_regex(filled, pattern=r"\P{L}", replacement="")
        na = pc.utf8_length(stripped).to_numpy(zero_copy_only=False).astype(np.float64)
        ok = nz & (tlen > 0)
        alpha_ratio[ok] = na[ok] / tlen[ok]
    with np.errstate(invalid="ignore", divide="ignore"):
        distinct_ratio = np.where(n_tokens > 0, n_distinct / np.maximum(n_tokens, 1), 0.0)
    return {
        "n_tokens": n_tokens,
        "n_distinct": n_distinct,
        "distinct_ratio": distinct_ratio,
        "mean_token_len": mean_len,
        "stopword_ratio": stop_ratio,
        "alpha_ratio": alpha_ratio,
    }


# ---------------------------------------------------------------------------
# Language ID — character n-gram heuristic (public technique; profiles are
# tiny hand-rolled trigram sets, adequate for a deterministic stage)
# ---------------------------------------------------------------------------

_LANG_MARKERS: dict[str, frozenset[str]] = {
    "en": frozenset(["the", "and", "ing", "ion", " th", "he ", "is ", "of "]),
    "es": frozenset(["de ", " de", "la ", "os ", "ión", "que", "el ", "ado"]),
    "fr": frozenset(["le ", " le", "es ", "ent", "ion", "de ", " la", "une"]),
    "de": frozenset(["der", "ein", "sch", "ung", "die", "und", "en ", "ch "]),
    "zh": frozenset([]),  # detected via CJK codepoints instead
}


def langid(texts) -> np.ndarray:
    """Deterministic heuristic language id; 'und' when no signal."""
    out = np.empty(len(texts), dtype=object)
    for i, t in enumerate(texts):
        if not t:
            out[i] = "und"
            continue
        if any("一" <= c <= "鿿" for c in t[:200]):
            out[i] = "zh"
            continue
        low = t.lower()
        grams = {low[j : j + 3] for j in range(min(len(low), 400) - 2)}
        best, best_score = "und", 0
        for lang, markers in _LANG_MARKERS.items():
            score = len(grams & markers)
            if score > best_score:
                best, best_score = lang, score
        out[i] = best
    return out.astype(str)


def langid_arrow(col) -> np.ndarray:
    """Arrow-native :func:`langid`, identical outputs per row: the CJK
    probe scans UTF-8 lead bytes of the first 200 codepoints (E5-E9,
    or E4 with continuation >= B8 — exactly U+4E00..U+9FFF), and each
    language's marker score is a sum of literal match_substring hits
    over lower(text)[:400] (a 3-gram is in the gram set iff it is a
    substring of that window).  Tie-breaks mirror the scalar loop:
    first language in _LANG_MARKERS order with a strictly higher score."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .hashing import _str_buffers

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    filled = pc.fill_null(col, "")
    empty = pc.equal(filled, "").to_numpy(zero_copy_only=False).astype(bool)
    # CJK: first 200 codepoints of the RAW text
    head = pc.utf8_slice_codeunits(filled, 0, 200)
    starts, lens, data = _str_buffers(head)
    is_cjk = np.zeros(n, dtype=bool)
    if len(data):
        nxt = np.zeros_like(data)
        nxt[:-1] = data[1:]
        m = ((data >= 0xE5) & (data <= 0xE9)) | ((data == 0xE4) & (nxt >= 0xB8))
        hits = np.flatnonzero(m)
        if len(hits):
            offs = np.concatenate((starts, [starts[-1] + lens[-1]])) if len(starts) else starts
            doc = np.searchsorted(offs[1:], hits, side="right")
            is_cjk[np.unique(doc)] = True
    low = pc.utf8_slice_codeunits(pc.utf8_lower(filled), 0, 400)
    best = np.zeros(n, dtype=np.int64)
    out = np.full(n, "und", dtype=object)
    for lang, markers in _LANG_MARKERS.items():
        if not markers:
            continue
        score = np.zeros(n, dtype=np.int64)
        for mk in markers:
            score += pc.match_substring(low, mk).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
        upd = score > best
        best = np.where(upd, score, best)
        out[upd] = lang
    out[is_cjk] = "zh"
    out[empty] = "und"
    return out.astype(str)


# ---------------------------------------------------------------------------
# Shingles + MinHash + SimHash + rolling fingerprint
# ---------------------------------------------------------------------------


def token_hashes(toks: list[str]) -> np.ndarray:
    """Deterministic u64 per token (FNV-1a over utf-8, via Python hashless)."""
    out = np.empty(len(toks), dtype=np.uint64)
    for i, w in enumerate(toks):
        h = 0xCBF29CE484222325
        for b in w.encode("utf-8"):
            h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        out[i] = h
    return out


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """u64 hashes of word k-shingles (combined via splitmix rolling)."""
    toks = tokenize(text)
    th = token_hashes(toks)
    if len(th) < k:
        return splitmix64(th) if len(th) else np.empty(0, dtype=np.uint64)
    # combine k consecutive token hashes
    acc = th[: len(th) - k + 1].copy()
    for j in range(1, k):
        acc = splitmix64(acc * _U64(1099511628211) + th[j : len(th) - k + 1 + j])
    return acc


_MINHASH_A = None
_MINHASH_B = None


def _minhash_coeffs(num_perm: int):
    global _MINHASH_A, _MINHASH_B
    if _MINHASH_A is None or len(_MINHASH_A) < num_perm:
        rng = np.random.default_rng(20240817)  # pinned seed
        _MINHASH_A = rng.integers(1, 2**61 - 1, size=256, dtype=np.uint64) | _U64(1)
        _MINHASH_B = rng.integers(0, 2**61 - 1, size=256, dtype=np.uint64)
    return _MINHASH_A[:num_perm], _MINHASH_B[:num_perm]


def minhash_signature(shingles: np.ndarray, num_perm: int = 128) -> np.ndarray:
    """(num_perm,) u64 MinHash signature of a shingle-hash set."""
    a, b = _minhash_coeffs(num_perm)
    if len(shingles) == 0:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    # universal-ish hash family: (a*x + b) with wraparound, then min
    v = shingles[:, None] * a[None, :] + b[None, :]
    return v.min(axis=0)


def minhash_bands(sig: np.ndarray, n_bands: int = 16) -> np.ndarray:
    """Band hashes for LSH bucketing: (n_bands,) u64."""
    rows = len(sig) // n_bands
    out = np.empty(n_bands, dtype=np.uint64)
    for band in range(n_bands):
        chunk = sig[band * rows : (band + 1) * rows]
        h = _U64(band) + _U64(0x9E3779B97F4A7C15)
        for x in chunk:
            h = splitmix64(h ^ x)
        out[band] = h
    return out


def jaccard_token_sets(a: str, b: str) -> float:
    sa, sb = set(tokenize(a)), set(tokenize(b))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def simhash64(text: str) -> int:
    """64-bit SimHash over token hashes (Charikar, public)."""
    th = token_hashes(tokenize(text))
    if len(th) == 0:
        return 0
    bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & _U64(1)).astype(
        np.int64
    )
    counts = (2 * bits - 1).sum(axis=0)
    return int(((counts > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.asarray(a, dtype=np.uint64) ^ np.asarray(b, dtype=np.uint64)
    # popcount via bit tricks
    x = x - ((x >> _U64(1)) & _U64(0x5555555555555555))
    x = (x & _U64(0x3333333333333333)) + ((x >> _U64(2)) & _U64(0x3333333333333333))
    x = (x + (x >> _U64(4))) & _U64(0x0F0F0F0F0F0F0F0F)
    return ((x * _U64(0x0101010101010101)) >> _U64(56)).astype(np.int64)


def rolling_fingerprints(text: str, window: int = 8, keep_mod: int = 16) -> np.ndarray:
    """Winnowing-style document fingerprints: polynomial rolling hash over
    bytes, keep hashes where h % keep_mod == 0 (content-defined sampling)."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    if len(data) < window:
        return np.empty(0, dtype=np.uint64)
    base = _U64(257)
    # rolling hash via cumulative powers (vectorized)
    n = len(data) - window + 1
    h = np.zeros(n, dtype=np.uint64)
    for j in range(window):
        h = h * base + data[j : j + n]
    h = splitmix64(h)
    return np.unique(h[h % _U64(keep_mod) == _U64(0)])


def minhash_signatures_batch(
    texts, num_perm: int = 128, k: int = 3
) -> np.ndarray:
    """(n_docs, num_perm) MinHash signatures, vectorized across docs.

    Concatenates all docs' shingle hashes and computes per-permutation
    segment minima with np.minimum.reduceat — no per-doc Python beyond
    shingling.  Identical output to minhash_signature per doc (tested).
    """
    shingle_lists = [shingle_hashes(t or "", k) for t in texts]
    lens = np.fromiter((len(s) for s in shingle_lists), dtype=np.int64, count=len(texts))
    out = np.full((len(texts), num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    nonempty = lens > 0
    if not nonempty.any():
        return out
    concat = np.concatenate([s for s in shingle_lists if len(s)])
    offsets = np.concatenate(([0], np.cumsum(lens[nonempty])))[:-1]
    a, b = _minhash_coeffs(num_perm)
    with np.errstate(over="ignore"):
        # chunk permutations to bound the (total_shingles x chunk) matrix
        chunk = max(1, min(num_perm, (1 << 24) // max(len(concat), 1)))
        res = np.empty((nonempty.sum(), num_perm), dtype=np.uint64)
        for p0 in range(0, num_perm, chunk):
            p1 = min(p0 + chunk, num_perm)
            v = concat[:, None] * a[None, p0:p1] + b[None, p0:p1]
            res[:, p0:p1] = np.minimum.reduceat(v, offsets, axis=0)
    out[nonempty] = res
    return out


def minhash_bands_batch(sigs: np.ndarray, n_bands: int = 16) -> np.ndarray:
    """(n_docs, n_bands) LSH band hashes, vectorized (identical to
    minhash_bands row-wise)."""
    n, num_perm = sigs.shape
    rows = num_perm // n_bands
    out = np.empty((n, n_bands), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for band in range(n_bands):
            h = np.full(n, band, dtype=np.uint64) + _U64(0x9E3779B97F4A7C15)
            for r in range(rows):
                h = splitmix64(h ^ sigs[:, band * rows + r])
            out[:, band] = h
    return out


# ---------------------------------------------------------------------------
# Arrow-native minhash: token FNV-1a + shingling + signatures computed
# over the Arrow string buffers — bit-identical to the per-doc
# tokenize/token_hashes/shingle_hashes path, with zero Python-string
# materialization (VERDICT r3 item 7: band_stage's to_pylist was the
# one Python materialization left in the curation chain).
# ---------------------------------------------------------------------------


def token_hashes_arrow(arr) -> np.ndarray:
    """FNV-1a u64 per element of an Arrow string array; identical values
    to :func:`token_hashes` (utf-8 bytes, same constants), vectorized
    byte-position-wise: sort by length desc, then each byte position
    updates a contiguous PREFIX of the live hash lanes."""
    from .hashing import _str_buffers

    starts, lens, data = _str_buffers(arr)
    n = len(lens)
    out = np.full(n, np.uint64(0xCBF29CE484222325), dtype=np.uint64)
    if n == 0 or len(data) == 0:
        return out
    order = np.argsort(lens, kind="stable")[::-1]
    s_starts, s_lens = starts[order], lens[order]
    lens_asc = s_lens[::-1]
    h = np.full(n, np.uint64(0xCBF29CE484222325), dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    with np.errstate(over="ignore"):
        for j in range(int(s_lens[0])):
            m = n - int(np.searchsorted(lens_asc, j, side="right"))  # lens > j
            if m == 0:
                break
            b = data[s_starts[:m] + j].astype(np.uint64)
            h[:m] = (h[:m] ^ b) * prime
    out[order] = h
    return out


def shingle_hashes_flat(
    th: np.ndarray, counts: np.ndarray, k: int = 3
) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc k-shingle hashes over FLAT doc-major token hashes.

    Returns ``(shingles, n_shingles)``: ``shingles`` is the doc-major
    concatenation of every doc's shingle hashes, ``n_shingles`` the
    per-doc count.  Matches :func:`shingle_hashes` exactly, including
    its short-doc rule (0 < n_tokens < k → splitmix64 of each token)."""
    from .hashing import splitmix64

    counts = np.asarray(counts, dtype=np.int64)
    offs = np.concatenate(([0], np.cumsum(counts)))
    n_sh = np.where(counts >= k, counts - k + 1, counts)
    tot = int(n_sh.sum())
    if tot == 0:
        return np.empty(0, dtype=np.uint64), n_sh
    # start position (flat) of every shingle: each doc contributes a
    # PREFIX of its token range, length n_sh[d]
    doc_of = np.repeat(np.arange(len(counts), dtype=np.int64), n_sh)
    local = np.arange(tot, dtype=np.int64) - np.concatenate(([0], np.cumsum(n_sh)))[:-1][doc_of]
    start = offs[:-1][doc_of] + local
    is_short = (counts < k)[doc_of]
    with np.errstate(over="ignore"):
        acc = th[start].copy()
        last = len(th) - 1
        for j in range(1, k):
            nxt = th[np.minimum(start + j, last)]  # clipped reads are
            # overwritten below for short docs, harmless for long ones
            acc = splitmix64(acc * np.uint64(1099511628211) + nxt)
        if is_short.any():
            acc[is_short] = splitmix64(th[start[is_short]])
    return acc, n_sh


def minhash_signatures_arrow(col, num_perm: int = 128, k: int = 3) -> np.ndarray:
    """(n_docs, num_perm) MinHash signatures straight from an Arrow
    string column — tokenize (flat_tokens), FNV token hashes, shingles
    and per-permutation segment minima, all vectorized; identical
    output to :func:`minhash_signatures_batch` on the same texts."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n_docs = len(col)
    flat, _docidx, counts = flat_tokens(col)
    th = token_hashes_arrow(flat)
    shingles, n_sh = shingle_hashes_flat(th, counts, k)
    out = np.full((n_docs, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    nonempty = n_sh > 0
    if not nonempty.any():
        return out
    offsets = np.concatenate(([0], np.cumsum(n_sh[nonempty])))[:-1]
    a, b = _minhash_coeffs(num_perm)
    with np.errstate(over="ignore"):
        chunk = max(1, min(num_perm, (1 << 24) // max(len(shingles), 1)))
        res = np.empty((int(nonempty.sum()), num_perm), dtype=np.uint64)
        for p0 in range(0, num_perm, chunk):
            p1 = min(p0 + chunk, num_perm)
            v = shingles[:, None] * a[None, p0:p1] + b[None, p0:p1]
            res[:, p0:p1] = np.minimum.reduceat(v, offsets, axis=0)
    out[nonempty] = res
    return out


def _pairwise_set_jaccard(docidx: np.ndarray, keys: np.ndarray, n_pairs: int) -> np.ndarray:
    """Jaccard of key-sets between doc i and doc i+n_pairs, vectorized.

    ``docidx``/``keys`` are flat (doc-major, docs 0..2*n_pairs-1 where
    the first half is side A, second half side B); keys may repeat
    within a doc.  One lexsort dedups per-doc, a second counts keys
    shared by both sides of a pair (each (pair, key) appears at most
    twice after dedup, so adjacent-duplicate counting IS the
    intersection).  No per-pair Python.
    """
    sizes = np.zeros(2 * n_pairs, dtype=np.int64)
    inter = np.zeros(n_pairs, dtype=np.int64)
    if len(keys):
        order = np.lexsort((keys, docidx))
        d, s = docidx[order], keys[order]
        keep = np.concatenate(([True], (d[1:] != d[:-1]) | (s[1:] != s[:-1])))
        d, s = d[keep], s[keep]
        sizes = np.bincount(d, minlength=2 * n_pairs).astype(np.int64)
        pid = np.where(d < n_pairs, d, d - n_pairs)
        order2 = np.lexsort((s, pid))
        p2, s2 = pid[order2], s[order2]
        dup = (p2[1:] == p2[:-1]) & (s2[1:] == s2[:-1])
        inter = np.bincount(p2[1:][dup], minlength=n_pairs).astype(np.int64)
    union = sizes[:n_pairs] + sizes[n_pairs:] - inter
    return inter / np.maximum(union, 1)


def pairwise_token_jaccard_arrow(col_a, col_b) -> np.ndarray:
    """Exact token-SET jaccard per aligned row pair, string-exact
    (dictionary codes, not hashes) — identical values to
    ``len(sa & sb) / max(len(sa | sb), 1)`` over ``set(tokenize(.))``
    per row (the verify-loop convention: empty∩empty → 0.0), with zero
    per-row Python."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col_a, pa.ChunkedArray):
        col_a = col_a.combine_chunks()
    if isinstance(col_b, pa.ChunkedArray):
        col_b = col_b.combine_chunks()
    n = len(col_a)
    both = pa.concat_arrays([col_a.cast(pa.string()), col_b.cast(pa.string())])
    flat, docidx, _counts = flat_tokens(both)
    if len(flat) == 0:
        return np.zeros(n, dtype=np.float64)
    codes = pc.dictionary_encode(flat).indices.to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    return _pairwise_set_jaccard(docidx, codes, n)


def pairwise_shingle_jaccard_arrow(col_a, col_b, k: int = 3) -> np.ndarray:
    """Exact k-shingle-hash-set jaccard per aligned row pair; identical
    values to ``set(shingle_hashes(a, k)) vs set(shingle_hashes(b, k))``
    per row (shingle_hashes_flat is bit-identical to the scalar), with
    an empty∩empty => 0.0 convention matching the ``max(|union|, 1)``
    denominator of the verify loops it replaces."""
    import pyarrow as pa

    if isinstance(col_a, pa.ChunkedArray):
        col_a = col_a.combine_chunks()
    if isinstance(col_b, pa.ChunkedArray):
        col_b = col_b.combine_chunks()
    n = len(col_a)
    both = pa.concat_arrays([col_a.cast(pa.string()), col_b.cast(pa.string())])
    flat, _docidx, counts = flat_tokens(both)
    th = token_hashes_arrow(flat)
    sh, n_sh = shingle_hashes_flat(th, counts, k)
    docidx = np.repeat(np.arange(2 * n, dtype=np.int64), n_sh)
    return _pairwise_set_jaccard(docidx, sh, n)


def simhash64_arrow(col) -> np.ndarray:
    """Vectorized SimHash over an Arrow string column; bit-identical to
    :func:`simhash64` per row (same tokenizer, same FNV-1a token
    hashes, same strict-majority bit rule), with zero per-row Python:
    one flat tokenize, one buffer-native hash pass, then 64 bincounts
    over the doc index (bit j set iff 2 * ones_j > n_tokens)."""
    flat, docidx, counts = flat_tokens(col)
    n_docs = len(counts)
    out = np.zeros(n_docs, dtype=np.uint64)
    th = token_hashes_arrow(flat)
    if len(th) == 0:
        return out
    for j in range(64):
        bit = ((th >> np.uint64(j)) & np.uint64(1)).astype(np.float64)
        ones = np.bincount(docidx, weights=bit, minlength=n_docs)
        out |= (2 * ones.astype(np.int64) > counts).astype(np.uint64) << np.uint64(j)
    return out
