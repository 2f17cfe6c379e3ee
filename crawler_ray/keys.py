"""Stable vectorized hashing and Finding-key encoding.

The seen-set shards, bloom filters, and shard routing all key on the full
Finding identity (url, kind, depth-for-pages) — matching the reference's
``HashSet<Finding>`` semantics (/root/reference/src/main.rs:51, 58-62).
Keys are encoded as single strings so they hash/route as one column.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

SEP = "\x1f"
_H1_SEED = 0x9E3779B97F4A7C15
_H2_SEED = 0xC2B2AE3D27D4EB4F


def finding_keys(
    url: pa.Array | list[str], kind: pa.Array | list[str], depth: pa.Array | list[int]
) -> pa.Array:
    """Vectorized key encode: ``url\\x1fkind\\x1fdepth`` with depth pinned to
    0 for images (Finding::Image carries no depth, main.rs:58-62)."""
    import pyarrow.compute as pc

    url = pa.array(url) if not isinstance(url, (pa.Array, pa.ChunkedArray)) else url
    kind = pa.array(kind) if not isinstance(kind, (pa.Array, pa.ChunkedArray)) else kind
    depth = (
        pa.array(depth, type=pa.int32())
        if not isinstance(depth, (pa.Array, pa.ChunkedArray))
        else depth
    )
    eff_depth = pc.if_else(pc.equal(kind, "page"), depth, pa.scalar(0, depth.type))
    return pc.binary_join_element_wise(
        url, kind, pc.cast(eff_depth, pa.string()), SEP
    )


def hash64(values: pa.Array | pa.ChunkedArray | list[str], seed: int = _H1_SEED) -> np.ndarray:
    """Stable-within-environment 64-bit hash of a string column (polars'
    vectorized xxh-based hash). Used for shard routing and bloom probes;
    determinism across processes holds for a fixed polars version, which is
    pinned in this environment."""
    s = pl.from_arrow(values) if isinstance(values, (pa.Array, pa.ChunkedArray)) else pl.Series(values)
    return s.hash(seed=seed & 0xFFFFFFFFFFFFFFFF).to_numpy().astype(np.uint64)


def hash_pair(values: pa.Array | pa.ChunkedArray | list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit hashes for double-hashed bloom probes."""
    return hash64(values, _H1_SEED), hash64(values, _H2_SEED)
