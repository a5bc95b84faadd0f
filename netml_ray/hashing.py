"""Stable vectorized key hashing for partition assignment.

Every co-partitioned stage (sessionize, features, as-of join) must send
the same key to the same partition.  We use polars' vectorized xxhash
(``pl.Series.hash`` with a fixed seed) — deterministic within a runtime
environment, fast, and allocation-light.  The polars version is recorded
in checkpoint manifests so a resume in a different environment can
detect a potentially different partition mapping.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

_SEED = 0xC0FFEE


def hash_column(col: "pa.ChunkedArray | pa.Array | np.ndarray") -> np.ndarray:
    """Return a stable uint64 hash per element of a key column."""
    if isinstance(col, np.ndarray):
        s = pl.Series("k", col)
    else:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        s = pl.from_arrow(pa.chunked_array([col]))
        if not isinstance(s, pl.Series):  # pragma: no cover
            s = s.to_series()
    return s.hash(seed=_SEED).to_numpy()


def pid_for(col, num_partitions: int) -> np.ndarray:
    """Partition id (int32) = stable_hash(key) % num_partitions."""
    return (hash_column(col) % np.uint64(num_partitions)).astype(np.int32)
