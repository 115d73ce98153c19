"""Deterministic 64-bit hashing (no PYTHONHASHSEED dependence).

Every shuffle key, dedup key, salt, and fingerprint in the engine goes
through these so results are reproducible across workers and runs
(SURVEY.md §7.4.5: all nondeterminism sources pinned).
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_FNV_OFFSET = _U64(0xCBF29CE484222325)
_FNV_PRIME = _U64(0x100000001B3)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer (public domain, Steele et al.) — int mixing."""
    with np.errstate(over="ignore"):
        z = np.asarray(x).astype(np.uint64) + _U64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
        return z ^ (z >> _U64(31))


def fnv1a_bytes(data: bytes) -> int:
    """Scalar FNV-1a 64 over bytes."""
    h = int(_FNV_OFFSET)
    for b in data:
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def hash_strings(arr) -> np.ndarray:
    """Deterministic u64 hash of a string/bytes sequence, C-speed.

    Values are pandas' vectorized siphash-2-4 (fixed key,
    PYTHONHASHSEED-free, stable across processes/workers).  Arrow
    string/binary arrays without nulls take the buffer-native numpy
    path (:func:`siphash24_arrow`) — bit-identical values, ~3x faster
    than to_pylist + pandas and ZERO Python-string materialization
    (the per-row PyObject churn is what this host's lazy-backed pages
    punish; CLAUDE.md rules 13/17).  Used for shuffle/dedup keys only
    (never needs SQL-oracle parity).
    """
    try:
        import pyarrow as pa

        if isinstance(arr, (pa.Array, pa.ChunkedArray)):
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            t = arr.type
            str_like = (
                pa.types.is_string(t)
                or pa.types.is_large_string(t)
                or pa.types.is_binary(t)
                or pa.types.is_large_binary(t)
            )
            if str_like and arr.null_count == 0:
                return siphash24_arrow(arr)
            arr = arr.to_pylist()  # nulls / exotic types: pandas path
    except ImportError:
        pass
    import pandas as pd

    s = pd.Series(arr, dtype=object)
    return pd.util.hash_pandas_object(s, index=False, hash_key="geografir_ray_00").values


def salt_keys(keys: np.ndarray, row_hash: np.ndarray, n_salts: int) -> np.ndarray:
    """Salted key for hot-key mitigation: (key, row_hash % n_salts) packed.

    Two-phase aggregation pattern (SURVEY.md §7.3): group on the salted
    key first, then on the bare key over the tiny partials.
    """
    salt = (np.asarray(row_hash).astype(np.uint64)) % _U64(n_salts)
    return splitmix64(np.asarray(keys).astype(np.uint64) * _U64(1000003) + salt)


class BloomFilter:
    """Numpy bit-array Bloom filter (k hash functions via splitmix64
    with distinct seeds).  Broadcast a compact filter of a large key
    set when exact broadcast is too big: a semi-join prefilters batches
    with it (no false negatives) and an exact join verifies survivors
    (ray_guide "Semi / anti join").
    """

    def __init__(self, capacity: int, fp_rate: float = 0.01):
        n_bits = max(64, int(-capacity * np.log(fp_rate) / (np.log(2) ** 2)))
        self.n_bits = int(2 ** np.ceil(np.log2(n_bits)))  # power of two
        self.k = max(1, int(round(self.n_bits / max(capacity, 1) * np.log(2))))
        self.bits = np.zeros(self.n_bits // 64, dtype=np.uint64)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        k64 = np.asarray(keys).astype(np.uint64)
        mask = np.uint64(self.n_bits - 1)
        pos = np.empty((len(k64), self.k), dtype=np.uint64)
        h = k64
        for i in range(self.k):
            h = splitmix64(h ^ np.uint64(0x9E3779B97F4A7C15 * (i + 1) & 0xFFFFFFFFFFFFFFFF))
            pos[:, i] = h & mask
        return pos

    def add(self, keys: np.ndarray) -> None:
        pos = self._positions(keys).ravel()
        word = (pos >> np.uint64(6)).astype(np.int64)
        bit = np.uint64(1) << (pos & np.uint64(63))
        np.bitwise_or.at(self.bits, word, bit)

    def contains(self, keys: np.ndarray) -> np.ndarray:
        pos = self._positions(keys)
        word = (pos >> np.uint64(6)).astype(np.int64)
        bit = np.uint64(1) << (pos & np.uint64(63))
        hits = (self.bits[word] & bit) != 0
        return hits.all(axis=1)


# ---------------------------------------------------------------------------
# Arrow-native string hashing: identical values to hash_strings (pandas
# SipHash-2-4 over utf-8 + the splitmix-style finalizer), computed with
# numpy directly over the Arrow offsets/data buffers — zero Python
# string materialization (the to_pylist + pd.Series path allocates one
# PyObject per row, which on this host's lazy-backed pages dominated
# the 12M-url dedup exchange; VERDICT r3 item 2).
# ---------------------------------------------------------------------------

_SIP_KEY = b"geografir_ray_00"
_SIP_K0 = _U64(int.from_bytes(_SIP_KEY[:8], "little"))
_SIP_K1 = _U64(int.from_bytes(_SIP_KEY[8:], "little"))
_MASK64 = _U64(0xFFFFFFFFFFFFFFFF)


def _str_buffers(arr):
    """(starts, lens, data) int64/uint8 views over an Arrow string,
    large_string, binary or large_binary array (offset-safe)."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    if pa.types.is_large_string(t) or pa.types.is_large_binary(t):
        odt = np.int64
    elif pa.types.is_string(t) or pa.types.is_binary(t):
        odt = np.int32
    else:
        raise TypeError(f"not a string/binary array: {t}")
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=odt)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.empty(0, dtype=np.uint8)
    )
    return offs[:-1].copy(), (offs[1:] - offs[:-1]).copy(), data


def _rotl(x: np.ndarray, b: int) -> np.ndarray:
    return (x << _U64(b)) | (x >> _U64(64 - b))


def _sipround(v0, v1, v2, v3):
    v0 += v1
    v1 = _rotl(v1, 13)
    v1 ^= v0
    v0 = _rotl(v0, 32)
    v2 += v3
    v3 = _rotl(v3, 16)
    v3 ^= v2
    v0 += v3
    v3 = _rotl(v3, 21)
    v3 ^= v0
    v2 += v1
    v1 = _rotl(v1, 17)
    v1 ^= v2
    v2 = _rotl(v2, 32)
    return v0, v1, v2, v3


def _gather_le64(data: np.ndarray, pos: np.ndarray, nbytes: np.ndarray | None = None):
    """Little-endian u64 words read at byte positions ``pos``; when
    ``nbytes`` is given only that many low bytes are kept (tail reads)."""
    m = len(pos)
    if m == 0:
        return np.empty(0, dtype=np.uint64)
    if len(data) == 0:  # every string empty: tail word is zero
        return np.zeros(m, dtype=np.uint64)
    idx = pos[:, None] + np.arange(8, dtype=np.int64)[None, :]
    if nbytes is None:
        b = data[idx]
    else:
        ok = np.arange(8, dtype=np.int64)[None, :] < nbytes[:, None]
        b = np.where(ok, data[np.minimum(idx, len(data) - 1)], 0)
    return np.ascontiguousarray(b).view(np.uint64).ravel()


def siphash24_arrow(arr) -> np.ndarray:
    """Vectorized SipHash-2-4 (pandas' fixed key) of every element of an
    Arrow string/binary array.  Bit-identical to
    ``pd.util.hash_pandas_object`` BEFORE its final mixing step."""
    starts, lens, data = _str_buffers(arr)
    n = len(lens)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out
    nf = lens >> 3  # full 8-byte blocks per string
    order = np.argsort(nf, kind="stable")[::-1]  # desc: longest first
    s_starts, s_lens, s_nf = starts[order], lens[order], nf[order]
    v0 = np.full(n, _U64(0x736F6D6570736575) ^ _SIP_K0, dtype=np.uint64)
    v1 = np.full(n, _U64(0x646F72616E646F6D) ^ _SIP_K1, dtype=np.uint64)
    v2 = np.full(n, _U64(0x6C7967656E657261) ^ _SIP_K0, dtype=np.uint64)
    v3 = np.full(n, _U64(0x7465646279746573) ^ _SIP_K1, dtype=np.uint64)
    nf_asc = s_nf[::-1]
    max_nf = int(s_nf[0])
    with np.errstate(over="ignore"):
        for j in range(max_nf + 1):
            # strings whose full blocks are exhausted at j absorb their
            # tail block (remaining bytes | len<<56) exactly once
            m_gt = n - int(np.searchsorted(nf_asc, j, side="right"))  # nf > j
            m_ge = n - int(np.searchsorted(nf_asc, j, side="left"))   # nf >= j
            if m_ge > m_gt:
                sl = slice(m_gt, m_ge)
                tb = s_lens[sl] - (s_nf[sl] << np.int64(3))
                b = _gather_le64(data, s_starts[sl] + (s_nf[sl] << np.int64(3)), tb)
                b |= (s_lens[sl].astype(np.uint64) & _U64(0xFF)) << _U64(56)
                w0, w1, w2, w3 = v0[sl], v1[sl], v2[sl], v3[sl]
                w3 ^= b
                for _ in range(2):
                    w0, w1, w2, w3 = _sipround(w0, w1, w2, w3)
                w0 ^= b
                v0[sl], v1[sl], v2[sl], v3[sl] = w0, w1, w2, w3
            if m_gt == 0:
                break
            mblk = _gather_le64(data, s_starts[:m_gt] + np.int64(8 * j))
            w0, w1, w2, w3 = v0[:m_gt], v1[:m_gt], v2[:m_gt], v3[:m_gt]
            w3 ^= mblk
            for _ in range(2):
                w0, w1, w2, w3 = _sipround(w0, w1, w2, w3)
            w0 ^= mblk
            v0[:m_gt], v1[:m_gt], v2[:m_gt], v3[:m_gt] = w0, w1, w2, w3
        v2 ^= _U64(0xFF)
        for _ in range(4):
            v0, v1, v2, v3 = _sipround(v0, v1, v2, v3)
        h = v0 ^ v1 ^ v2 ^ v3
        # pandas hash_array's final mixing (splitmix-style)
        h ^= h >> _U64(30)
        h *= _U64(0xBF58476D1CE4E5B9)
        h ^= h >> _U64(27)
        h *= _U64(0x94D049BB133111EB)
        h ^= h >> _U64(31)
    out[order] = h
    return out
