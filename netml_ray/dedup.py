"""Deduplication operators for large-scale training-data pipelines.

All run as Ray Data stages:

- exact: content hash in ``map_batches`` → ``groupby(hash)`` →
  keep the min-id row per group (deterministic winner)
- MinHash + LSH near-dup: shingle → minhash signature per doc (vectorized
  numpy) → explode to (band, band_hash) rows → groupby band buckets →
  candidate pairs → Jaccard verify → min-label union (connected
  components via iterated label propagation) → keep cluster minimum
- SimHash: 64-bit signature, duplicates = identical signature buckets
- n-gram Jaccard: exact verify kernel used by the LSH path, also
  exposed standalone for small candidate sets
- embedding cosine near-dup: cosine-similarity buckets over an
  embedding column (see ``similarity.py`` for the ANN machinery)

Patterns follow the public LSH literature (Broder '97 shingling /
MinHash; Charikar '02 SimHash) and the ray_guide dedup sketch.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_MERSENNE = (1 << 61) - 1


def _sha64(texts: list[str]) -> np.ndarray:
    out = np.empty(len(texts), dtype=np.int64)
    for i, s in enumerate(texts):
        out[i] = int.from_bytes(hashlib.sha1(s.encode("utf-8")).digest()[:8], "big", signed=True)
    return out


def add_text_hash(ds, text_col: str = "text", out: str = "text_hash"):
    def _f(t: pa.Table) -> pa.Table:
        return t.append_column(out, pa.array(_sha64(t[text_col].to_pylist())))

    return ds.map_batches(_f, batch_format="pyarrow")


def dedup_exact(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Exact dedup: hash-partition by content hash, keep min-id per
    group.  One shuffle of (hash, id, payload) rows."""
    ds = add_text_hash(ds, text_col)

    def _keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col).head(1)

    return ds.groupby("text_hash").map_groups(_keep_first, batch_format="pandas")


# ---------------------------------------------------------------------------
# shingles / MinHash / LSH
# ---------------------------------------------------------------------------

def _shingle_hashes(text: str, k: int) -> np.ndarray:
    toks = text.split()
    if len(toks) < k:
        grams = [" ".join(toks)] if toks else [""]
    else:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    out = np.empty(len(grams), dtype=np.uint64)
    for i, g in enumerate(grams):
        out[i] = int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(), "big")
    return out


class MinHasher:
    """Stateful minhash stage: permutation parameters generated once per
    actor in ``__init__`` (same seed everywhere → identical)."""

    def __init__(self, num_perm: int = 64, k: int = 3, text_col: str = "text", seed: int = 1):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = k
        self.text_col = text_col

    def signature(self, text: str) -> np.ndarray:
        h = _shingle_hashes(text, self.k).astype(np.uint64)
        # (a*h + b) mod p, rowwise min — vectorized over shingles×perms
        vals = (np.outer(h % _MERSENNE, self.a) + self.b) % _MERSENNE
        return vals.min(axis=0).astype(np.uint64)

    def __call__(self, t: pa.Table) -> pa.Table:
        sigs = np.stack([self.signature(s) for s in t[self.text_col].to_pylist()])
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.ravel().astype(np.uint64)), self.num_perm
        )
        return t.append_column("minhash", col)


def jaccard_ngrams(a: str, b: str, k: int = 3) -> float:
    sa = set(map(tuple, zip(*[a.split()[i:] for i in range(k)]))) if len(a.split()) >= k else {tuple(a.split())}
    sb = set(map(tuple, zip(*[b.split()[i:] for i in range(k)]))) if len(b.split()) >= k else {tuple(b.split())}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


def minhash_lsh_duplicates(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    k: int = 3,
    jaccard_threshold: float = 0.8,
    keep_text: bool = True,
):
    """MinHash-LSH near-duplicate pairs.

    Returns a Dataset of verified candidate pairs
    ``(id_a, id_b, jaccard)`` with id_a < id_b and jaccard ≥ threshold.
    Pipeline: minhash (actor pool) → explode band rows → groupby
    (band, band_hash) → pairwise verify inside the (small) buckets.
    """
    rows_per_band = num_perm // bands
    sig_ds = ds.map_batches(
        MinHasher, fn_constructor_kwargs={"num_perm": num_perm, "k": k, "text_col": text_col},
        batch_format="pyarrow", concurrency=(1, 8), batch_size=1024,
    )

    def _explode(t: pa.Table) -> pa.Table:
        n = t.num_rows
        sigs = np.asarray(t["minhash"].combine_chunks().flatten()).reshape(n, num_perm)
        band_hash = np.empty((n, bands), dtype=np.int64)
        for bi in range(bands):
            seg = sigs[:, bi * rows_per_band : (bi + 1) * rows_per_band]
            # order-dependent mix of the band's minhash values
            h = np.zeros(n, dtype=np.uint64)
            for c in range(rows_per_band):
                h = h * np.uint64(1099511628211) + seg[:, c]
            band_hash[:, bi] = h.astype(np.int64)
        ids = np.repeat(t[id_col].to_numpy(), bands)
        texts = np.repeat(np.asarray(t[text_col].to_pylist(), dtype=object), bands)
        band_ids = np.tile(np.arange(bands, dtype=np.int64), n)
        return pa.table(
            {
                id_col: pa.array(ids),
                text_col: pa.array(texts.tolist(), type=pa.string()),
                "band": pa.array(band_ids),
                "band_hash": pa.array(band_hash.ravel()),
            }
        )

    exploded = sig_ds.map_batches(_explode, batch_format="pyarrow")

    # one hash partition holds MANY (band, band_hash) buckets — pair
    # generation loops over buckets inside a single vectorized fn
    # instead of per-bucket map_groups dispatch (thousands of tiny
    # Python group calls otherwise dominate)
    def _bucket_pairs_part(t: pa.Table) -> pa.Table:
        t = t.sort_by([("band", "ascending"), ("band_hash", "ascending"),
                       (id_col, "ascending")])
        bands = t["band"].to_numpy()
        hashes = t["band_hash"].to_numpy()
        ids = t[id_col].to_numpy()
        texts = np.asarray(t[text_col].to_pylist(), dtype=object)
        change = np.r_[True, (bands[1:] != bands[:-1]) | (hashes[1:] != hashes[:-1])]
        starts = np.flatnonzero(change)
        ends = np.r_[starts[1:], len(bands)]
        out_a, out_b, out_j = [], [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            for i in range(s, e):
                for j in range(i + 1, e):
                    if ids[i] == ids[j]:
                        continue
                    jac = jaccard_ngrams(texts[i], texts[j], k)
                    if jac >= jaccard_threshold:
                        out_a.append(ids[i]); out_b.append(ids[j]); out_j.append(jac)
        return pa.table({"id_a": pa.array(out_a, type=pa.int64()),
                         "id_b": pa.array(out_b, type=pa.int64()),
                         "jaccard": pa.array(out_j, type=pa.float64())})

    from netml_ray.partition import partition_map

    pairs = partition_map(exploded, "band_hash", _bucket_pairs_part)

    # dedup pairs found in multiple bands (same vectorized pattern)
    def _dedup_pairs_part(t: pa.Table) -> pa.Table:
        t = t.sort_by([("id_a", "ascending"), ("id_b", "ascending")])
        a = t["id_a"].to_numpy()
        b = t["id_b"].to_numpy()
        first = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        return t.filter(pa.array(first))

    return partition_map(pairs, "id_a", _dedup_pairs_part)


def minhash_dedup_keep(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    k: int = 3,
    jaccard_threshold: float = 0.8,
):
    """Full near-dup dedup: LSH candidate pairs → connected components →
    keep each cluster's minimum id.  Returns (keep_ids_ds, clusters_df).

    Components are resolved with driver-side union-find over the
    *verified pair list* — pairs ≪ docs after Jaccard verification
    (ray_guide dedup note); at extreme scale swap in iterated min-label
    propagation with the same pair Dataset.
    """
    import ray

    pairs = minhash_lsh_duplicates(
        ds, text_col=text_col, id_col=id_col, num_perm=num_perm,
        bands=bands, k=k, jaccard_threshold=jaccard_threshold,
    ).to_pandas()

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    drop = {x for x in parent if find(x) != x}
    drop_ref = ray.put(frozenset(drop))

    def _keep(t: pa.Table) -> pa.Table:
        d = ray.get(drop_ref)
        mask = np.fromiter((int(v) not in d for v in t[id_col].to_pylist()),
                           dtype=bool, count=t.num_rows)
        return t.filter(pa.array(mask))

    clusters = pd.DataFrame(
        {"doc_id": list(parent), "cluster": [find(x) for x in parent]}
    ).sort_values(["cluster", "doc_id"]).reset_index(drop=True)
    return ds.map_batches(_keep, batch_format="pyarrow"), clusters


class SimHasher:
    """64-bit SimHash over word features (Charikar '02)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    _SHIFTS = np.arange(64, dtype=np.uint64)

    @classmethod
    def simhash64(cls, text: str) -> int:
        words = text.split()
        if not words:
            return 0
        hs = np.fromiter(
            (int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")
             for w in words),
            dtype=np.uint64, count=len(words),
        )
        bits = (hs[:, None] >> cls._SHIFTS[None, :]) & np.uint64(1)
        v = np.where(bits == 1, 1, -1).sum(axis=0)
        out = int(((v > 0).astype(np.uint64) << cls._SHIFTS).sum(dtype=np.uint64))
        return out - (1 << 64) if out >= (1 << 63) else out  # reinterpret as int64

    def __call__(self, t: pa.Table) -> pa.Table:
        sigs = np.fromiter(
            (self.simhash64(s) for s in t[self.text_col].to_pylist()),
            dtype=np.int64, count=t.num_rows,
        )
        return t.append_column("simhash", pa.array(sigs))


def simhash_duplicates(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Docs sharing an identical 64-bit simhash (hamming-0 buckets)."""
    sig = ds.map_batches(SimHasher, fn_constructor_kwargs={"text_col": text_col},
                         batch_format="pyarrow", concurrency=(1, 8))

    def _groups(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return g.head(0)[[id_col, "simhash"]]
        return g.sort_values(id_col)[[id_col, "simhash"]]

    return sig.groupby("simhash").map_groups(_groups, batch_format="pandas")
