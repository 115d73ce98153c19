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

    Uses pandas' vectorized siphash (fixed key, PYTHONHASHSEED-free,
    stable across processes/workers) — ~100x faster than a per-row
    Python FNV loop on 1M urls.  Used for shuffle/dedup keys only
    (never needs SQL-oracle parity).
    """
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
