"""Approximate-membership filters for the URL-seen set.

At the 10^10-URL design point an exact per-shard hash set does not fit in
worker heaps, so each seen-set shard (state/seen.py) carries a vectorized
Bloom filter (~1.2 GB per 10^9 keys at 1% fpp) and optionally drops the
exact backing set (``approx_only``). A Bloom false positive makes the
crawler skip a genuinely-new URL — acceptable at design scale, never
enabled in the correctness tests (SURVEY.md §7 "Seen-set at design scale").

A cuckoo filter (north_rule names "bloom/cuckoo") is also provided: same
probe interface, supports deletion, ~2 bytes/key at 1% fpp. The Bloom
variant is the default because its adds are vectorized with numpy.

All hashing is positional on caller-provided 64-bit hashes (see
crawler_ray.keys.hash64) using double hashing h1 + i*h2 (Kirsch &
Mitzenmacher, "Less Hashing, Same Performance", 2006).
"""

from __future__ import annotations

import math

import numpy as np


class BloomFilter:
    def __init__(self, capacity: int, fpp: float = 0.01) -> None:
        capacity = max(capacity, 64)
        m = int(-capacity * math.log(fpp) / (math.log(2) ** 2))
        self.n_bits = np.uint64(max(64, m))
        self.k = max(1, round(m / capacity * math.log(2)))
        self.bits = np.zeros((int(self.n_bits) + 7) // 8, dtype=np.uint8)
        self.n_added = 0

    def _positions(self, h1: np.ndarray, h2: np.ndarray, i: int) -> np.ndarray:
        # uint64 wrapping arithmetic, matching the usual double-hash scheme
        return (h1 + np.uint64(i) * h2) % self.n_bits

    def add(self, h1: np.ndarray, h2: np.ndarray) -> None:
        for i in range(self.k):
            pos = self._positions(h1, h2, i)
            np.bitwise_or.at(
                self.bits, (pos >> np.uint64(3)).astype(np.int64),
                (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)),
            )
        self.n_added += len(h1)

    def contains(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        out = np.ones(len(h1), dtype=bool)
        for i in range(self.k):
            pos = self._positions(h1, h2, i)
            byte = self.bits[(pos >> np.uint64(3)).astype(np.int64)]
            bit = (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
            out &= (byte & bit) != 0
        return out

    def nbytes(self) -> int:
        return self.bits.nbytes


class CuckooFilter:
    """Minimal 4-way-bucketed cuckoo filter (Fan et al., CoNEXT 2014) with
    16-bit fingerprints. Python-loop insert (used for modest shard sizes or
    as a reference implementation); probe is vectorized."""

    MAX_KICKS = 500

    def __init__(self, capacity: int) -> None:
        n_buckets = 1
        while n_buckets * 4 < capacity * 1.1:
            n_buckets *= 2
        self.n_buckets = n_buckets
        self.table = np.zeros((n_buckets, 4), dtype=np.uint16)
        self.n_added = 0

    def _fp(self, h1: np.ndarray) -> np.ndarray:
        fp = (h1 >> np.uint64(48)).astype(np.uint16)
        return np.where(fp == 0, np.uint16(1), fp)  # 0 marks empty slots

    def _i1(self, h1: np.ndarray) -> np.ndarray:
        return (h1 & np.uint64(self.n_buckets - 1)).astype(np.int64)

    def _i2(self, i1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        # partial-key cuckoo: alt index = i1 xor hash(fp)
        fph = fp.astype(np.uint64) * np.uint64(0x5BD1E995)
        return ((i1.astype(np.uint64) ^ fph) & np.uint64(self.n_buckets - 1)).astype(
            np.int64
        )

    def add(self, h1: np.ndarray, _h2: np.ndarray | None = None) -> None:
        rng = np.random.default_rng(12345)  # deterministic kick choice
        fps, i1s = self._fp(h1), self._i1(h1)
        i2s = self._i2(i1s, fps)
        for fp, i1, i2 in zip(fps, i1s, i2s):
            placed = False
            for idx in (i1, i2):
                row = self.table[idx]
                empty = np.where(row == 0)[0]
                if len(empty):
                    row[empty[0]] = fp
                    placed = True
                    break
            cur_idx, cur_fp = int(i2), fp
            kicks = 0
            while not placed and kicks < self.MAX_KICKS:
                slot = int(rng.integers(4))
                cur_fp, self.table[cur_idx, slot] = (
                    self.table[cur_idx, slot],
                    cur_fp,
                )
                cur_idx = int(
                    self._i2(np.array([cur_idx]), np.array([cur_fp], np.uint16))[0]
                )
                row = self.table[cur_idx]
                empty = np.where(row == 0)[0]
                if len(empty):
                    row[empty[0]] = cur_fp
                    placed = True
                kicks += 1
            if not placed:
                raise RuntimeError("cuckoo filter full; grow capacity")
        self.n_added += len(h1)

    def contains(self, h1: np.ndarray, _h2: np.ndarray | None = None) -> np.ndarray:
        fps, i1s = self._fp(h1), self._i1(h1)
        i2s = self._i2(i1s, fps)
        in1 = (self.table[i1s] == fps[:, None]).any(axis=1)
        in2 = (self.table[i2s] == fps[:, None]).any(axis=1)
        return in1 | in2

    def nbytes(self) -> int:
        return self.table.nbytes
