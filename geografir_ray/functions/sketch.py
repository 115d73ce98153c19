"""Mergeable sketches: HyperLogLog approximate distinct counting.

Flajolet et al.'s HLL (public algorithm), numpy implementation.  The
distributed pattern (ray_guide "Aggregation at scale"): one sketch per
batch inside map_batches, merge sketches in a tiny second stage —
registers are element-wise max-mergeable, so the result is identical
regardless of partitioning (order-invariant, tested).
"""

from __future__ import annotations

import numpy as np

from .hashing import splitmix64


class HyperLogLog:
    def __init__(self, p: int = 12):
        """p = log2(registers); standard error ~= 1.04 / sqrt(2^p)."""
        if not 4 <= p <= 18:
            raise ValueError(f"p must be in [4, 18], got {p}")
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, hashes: np.ndarray) -> None:
        """Add pre-hashed u64 keys (use hashing.hash_strings / splitmix64)."""
        h = splitmix64(np.asarray(hashes).astype(np.uint64))
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | (np.uint64(1) << np.uint64(self.p - 1))
        # rank = 1 + leading zeros of the remaining bits
        lz = np.zeros(len(h), dtype=np.uint8)
        v = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            mask = v < (np.uint64(1) << np.uint64(64 - shift))
            lz[mask] += shift
            v[mask] <<= np.uint64(shift)
        rank = lz + 1
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if other.p != self.p:
            raise ValueError("cannot merge HLLs with different precisions")
        out = HyperLogLog(self.p)
        out.registers = np.maximum(self.registers, other.registers)
        return out

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        inv = np.power(2.0, -self.registers.astype(np.float64))
        raw = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if raw <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # linear counting, small range
        return raw

    def serialize(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @staticmethod
    def deserialize(data: bytes) -> "HyperLogLog":
        hll = HyperLogLog(data[0])
        hll.registers = np.frombuffer(data[1:], dtype=np.uint8).copy()
        return hll


class LogHistogram:
    """Mergeable quantile sketch for positive floats: log-spaced bins
    (bin = floor(ln x / ln(1+eps))) give a deterministic, partition-
    invariant summary with bounded RELATIVE error eps per quantile —
    the classic log-histogram / DDSketch-style scheme (public
    algorithm).  Counts are additive, so merge order never matters."""

    def __init__(self, eps: float = 0.01):
        if not 0 < eps < 1:
            raise ValueError(f"eps must be in (0,1), got {eps}")
        self.eps = eps
        self._gamma = 1.0 + eps
        self._lg = np.log(self._gamma)
        self.counts: dict[int, int] = {}
        self.n_zero = 0  # values <= 0 tracked separately

    def add(self, values: np.ndarray) -> "LogHistogram":
        v = np.asarray(values, dtype=np.float64)
        pos = v > 0.0
        self.n_zero += int((~pos).sum())
        bins = np.floor(np.log(v[pos]) / self._lg).astype(np.int64)
        b, c = np.unique(bins, return_counts=True)
        for bi, ci in zip(b.tolist(), c.tolist()):
            self.counts[bi] = self.counts.get(bi, 0) + int(ci)
        return self

    def merge(self, other: "LogHistogram") -> "LogHistogram":
        assert other.eps == self.eps
        self.n_zero += other.n_zero
        for b, c in other.counts.items():
            self.counts[b] = self.counts.get(b, 0) + c
        return self

    @property
    def total(self) -> int:
        return self.n_zero + sum(self.counts.values())

    def quantile(self, q: float) -> float:
        """Value estimate at quantile q (0..1): the representative
        (geometric midpoint) of the bin containing the q-th element."""
        n = self.total
        if n == 0:
            return float("nan")
        target = int(np.ceil(q * n))
        if target <= self.n_zero:
            return 0.0
        run = self.n_zero
        for b in sorted(self.counts):
            run += self.counts[b]
            if run >= target:
                return float(self._gamma ** (b + 0.5))
        return float(self._gamma ** (max(self.counts) + 0.5))

    def to_rows(self):
        """(bin, count) int64 arrays (n_zero under bin = MIN_INT)."""
        bins = sorted(self.counts)
        b = np.array([np.iinfo(np.int64).min] + bins, dtype=np.int64)
        c = np.array([self.n_zero] + [self.counts[x] for x in bins], dtype=np.int64)
        return b, c

    @classmethod
    def from_rows(cls, bins, counts, eps: float = 0.01) -> "LogHistogram":
        h = cls(eps)
        zmark = np.iinfo(np.int64).min
        for b, c in zip(np.asarray(bins).tolist(), np.asarray(counts).tolist()):
            if b == zmark:
                h.n_zero += int(c)
            else:
                h.counts[int(b)] = h.counts.get(int(b), 0) + int(c)
        return h
