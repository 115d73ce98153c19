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
