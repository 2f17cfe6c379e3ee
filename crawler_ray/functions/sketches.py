"""Mergeable sketches for distributed aggregation.

The pattern (Ray guide "Aggregation at scale"): emit ONE serialized sketch
per batch from ``map_batches`` (the combiner), then merge the handful of
sketches in a tiny final stage — sketches are designed to be mergeable, so
the shuffle carries kilobytes instead of the raw keys.

HyperLogLog here is the classic Flajolet et al. 2007 register scheme
(2^p registers, bias-corrected harmonic mean, linear counting for the
small range), vectorized with numpy. Standard error ≈ 1.04/√(2^p) — p=12
(4096 registers, 4 KB) gives ~1.6 %.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..keys import hash64


class HyperLogLog:
    def __init__(self, p: int = 12) -> None:
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> None:
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)
        # rank = leading zeros of the remaining bits + 1 (capped)
        nbits = 64 - self.p
        rank = np.full(len(h), nbits + 1, dtype=np.uint8)
        found = np.zeros(len(h), dtype=bool)
        for b in range(nbits):
            bit = (rest >> np.uint64(63 - b)) & np.uint64(1)
            newly = (~found) & (bit == 1)
            rank[newly] = b + 1
            found |= newly
        np.maximum.at(self.registers, idx, rank)

    def add(self, values: list[str] | pa.Array) -> None:
        self.add_hashes(hash64(values))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        out = HyperLogLog(self.p)
        out.registers = np.maximum(self.registers, other.registers)
        return out

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        zeros = int((self.registers == 0).sum())
        if est <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # linear counting
        return float(est)

    def serialize(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "HyperLogLog":
        h = cls(data[0])
        h.registers = np.frombuffer(data[1:], dtype=np.uint8).copy()
        return h


def approx_distinct_per_group(ds, group_col: str, value_col: str, p: int = 12) -> pd.DataFrame:
    """Grouped approximate distinct count: per-batch per-group HLL sketches
    (combiner) → merge per group — only (groups × blocks) 4 KB sketches
    cross the exchange, never the raw values."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, g in df.groupby(group_col, sort=False):
            h = HyperLogLog(p)
            h.add([str(v) for v in g[value_col]])
            rows.append({group_col: key, "sketch": h.serialize()})
        return pd.DataFrame(rows)

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=65536).to_pandas()
    out = []
    for key, g in parts.groupby(group_col, sort=True):
        merged = HyperLogLog(p)
        for blob in g["sketch"]:
            merged = merged.merge(HyperLogLog.deserialize(blob))
        out.append({group_col: key, "approx_distinct": int(round(merged.estimate()))})
    return pd.DataFrame(out)
