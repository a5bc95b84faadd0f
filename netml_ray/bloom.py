"""Bloom-filter join prefilter.

At 100 TB the probe side of an equi-join is usually much larger than
the build side, and most probe rows miss.  A Bloom filter over the
build side's key hashes, broadcast once via ``ray.put`` and tested
inside ``map_batches``, drops those rows BEFORE the co-partitioning
exchange — the all-to-all then moves only plausible matches.  Safe
for inner/semi joins (a false positive just rides the exchange and is
resolved exactly by the join; a negative is exact — the key is
definitely absent).  NOT applied to left/full joins, which must keep
every probe row anyway.

Layout: ``m`` bits packed in uint64 words, ``k`` probes per key via
double hashing ``(h1 + i * h2) mod m`` over the repo's stable 64-bit
key hash (``hashing.hash_column``) — the standard Kirsch–Mitzenmacher
construction, fully vectorized (numpy bitwise ops over the whole
batch; no Python per-row work).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from netml_ray.hashing import hash_column

__all__ = ["BloomFilter", "build_bloom", "bloom_prefilter"]


class BloomFilter:
    __slots__ = ("words", "m", "k")

    def __init__(self, num_bits: int, num_hashes: int,
                 words: np.ndarray | None = None):
        self.m = int(num_bits)
        self.k = int(num_hashes)
        self.words = (np.zeros((self.m + 63) // 64, dtype=np.uint64)
                      if words is None else words)

    def _positions(self, h: np.ndarray, i: int) -> np.ndarray:
        h1 = h
        h2 = (h >> np.uint64(33)) | np.uint64(1)  # odd → full-period step
        return (h1 + np.uint64(i) * h2) % np.uint64(self.m)

    def add_hashes(self, h: np.ndarray) -> None:
        for i in range(self.k):
            pos = self._positions(h, i)
            np.bitwise_or.at(self.words, (pos >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (pos & np.uint64(63)))

    def test_hashes(self, h: np.ndarray) -> np.ndarray:
        out = np.ones(len(h), dtype=bool)
        for i in range(self.k):
            pos = self._positions(h, i)
            bit = (self.words[(pos >> np.uint64(6)).astype(np.int64)]
                   >> (pos & np.uint64(63))) & np.uint64(1)
            out &= bit.astype(bool)
        return out

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.m == other.m and self.k == other.k
        self.words |= other.words
        return self

    def fill_ratio(self) -> float:
        return float(np.unpackbits(
            self.words.view(np.uint8)).sum()) / (len(self.words) * 64)


def _params_for(n_keys: int, *, bits_per_key: int = 10) -> tuple[int, int]:
    """m, k for a target ~1% FPR at 10 bits/key (k = round(m/n ln2))."""
    m = max(1024, int(n_keys * bits_per_key))
    k = max(1, min(8, round(bits_per_key * 0.6931)))
    return m, k


def build_bloom(ds, key: str, *, num_bits: int | None = None,
                num_hashes: int | None = None,
                bits_per_key: int = 10) -> BloomFilter:
    """One narrow pass over the BUILD side: each batch emits its local
    bitmap (m/8 bytes); the driver ORs them.  Size m from the build
    side's row count (an upper bound on distinct keys), so the driver
    fold is O(batches × m/8) bytes — fine for build sides worth
    bloom-filtering (the small side of a large-large join); for a
    build side too big for that, the join's exchange is symmetric
    anyway and the prefilter stops paying."""
    if num_bits is None or num_hashes is None:
        m, k = _params_for(ds.count(), bits_per_key=bits_per_key)
        num_bits = num_bits or m
        num_hashes = num_hashes or k
    if num_bits > (1 << 33):  # 1 GiB of bitmap
        raise ValueError(
            f"bloom bitmap would be {num_bits / 8 / 2**20:.0f} MiB — the "
            "build side is too large to bloom-filter profitably (the "
            "driver folds one bitmap per batch); use the plain "
            "co-partitioned join, or pass num_bits explicitly to accept "
            "a higher false-positive rate")

    def _p(t: pa.Table) -> pa.Table:
        bf = BloomFilter(num_bits, num_hashes)
        col = t[key].drop_null()
        if len(col):
            bf.add_hashes(hash_column(col))
        return pa.table({"w": pa.array([bf.words.tobytes()],
                                       type=pa.binary())})

    out = BloomFilter(num_bits, num_hashes)
    for r in ds.map_batches(_p, batch_format="pyarrow").take_all():
        out.words |= np.frombuffer(r["w"], dtype=np.uint64)
    return out


def bloom_prefilter(ds, key: str, bloom: BloomFilter):
    """Drop rows whose key is DEFINITELY absent from the build side.
    The bitmap is broadcast once (``ray.put``) and fetched zero-copy
    per worker — never re-shipped per batch.  NULL keys are dropped
    (they can never match an equi-join)."""
    import ray

    words_ref = ray.put(bloom.words)
    m, k = bloom.m, bloom.k

    def _f(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return t
        import pyarrow.compute as pc

        bf = BloomFilter(m, k, words=ray.get(words_ref))
        col = t[key]
        # polars xxhash hashes nulls too; mask them out afterwards
        keep = bf.test_hashes(hash_column(col))
        if col.null_count:
            keep &= pc.is_valid(col).to_numpy(zero_copy_only=False)
        return t.filter(pa.array(keep))

    return ds.map_batches(_f, batch_format="pyarrow")
