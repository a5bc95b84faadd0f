"""Similarity search over an embedding column (``list<float>``).

- ``knn_cosine``: brute-force cosine top-k — the query matrix is
  broadcast once (``ray.put``), each batch does one numpy matmul, and
  per-batch top-k partials are merged on the driver (k × batches rows,
  tiny).  This is the exact baseline.
- ``knn_cosine_ivf``: the scale path — k-means-style coarse quantizer
  (trained on a sample, centroids broadcast), vectors bucketed by
  nearest centroid; queries probe only the ``nprobe`` nearest buckets.
  Approximate; recall controlled by nprobe.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa


def _mat(col: pa.ChunkedArray) -> np.ndarray:
    arr = col.combine_chunks()
    if isinstance(arr, pa.ChunkedArray):  # pragma: no cover
        arr = arr.combine_chunks()
    flat = np.asarray(arr.flatten(), dtype=np.float32)
    n = len(arr)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def _normalize(m: np.ndarray) -> np.ndarray:
    norm = np.linalg.norm(m, axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    return m / norm


def knn_cosine(
    ds,
    query: np.ndarray,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dtype=np.float32,
):
    """Exact top-k by cosine similarity to ``query`` (1-D vector).

    Returns a pandas DataFrame (vec_id, cos_sim) sorted by
    (-cos_sim, vec_id) — deterministic tie order.  ``dtype=np.float64``
    for oracle-parity runs; float32 is the at-scale default.
    """
    import ray

    q = np.asarray(query, dtype=dtype)
    q = q / (np.linalg.norm(q) or 1.0)
    qref = ray.put(q)

    class _Partial:
        def __init__(self):
            self.q = ray.get(qref)

        def __call__(self, t: pa.Table) -> pa.Table:
            m = _normalize(_mat(t[vec_col]).astype(dtype))
            sims = m @ self.q
            nk = min(k, len(sims))
            if nk == 0:
                return pa.table({id_col: pa.array([], type=pa.int64()),
                                 "cos_sim": pa.array([], type=pa.float64())})
            idx = np.argpartition(-sims, nk - 1)[:nk]
            return pa.table(
                {id_col: pa.array(t[id_col].to_numpy()[idx]),
                 "cos_sim": pa.array(sims[idx].astype(np.float64))}
            )

    partials = ds.map_batches(_Partial, batch_format="pyarrow", concurrency=(1, 8))
    pdf = partials.to_pandas()  # ≤ k rows per batch — tiny
    pdf = pdf.sort_values(["cos_sim", id_col], ascending=[False, True], kind="stable")
    return pdf.head(k).reset_index(drop=True)


def train_ivf_centroids(sample: np.ndarray, n_centroids: int, iters: int = 10, seed: int = 0) -> np.ndarray:
    """Plain Lloyd's k-means on a driver-side sample (deterministic)."""
    rng = np.random.default_rng(seed)
    sample = _normalize(sample.astype(np.float32))
    cent = sample[rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            m = sample[assign == c]
            if len(m):
                cent[c] = m.mean(axis=0)
        cent = _normalize(cent)
    return cent


def knn_cosine_ivf(
    ds,
    query: np.ndarray,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    nprobe: int = 4,
    sample_rows: int = 10_000,
    seed: int = 0,
):
    """IVF-bucketed approximate top-k: probe only the ``nprobe`` buckets
    whose centroid is nearest the query."""
    import ray

    sample_df = ds.limit(sample_rows).to_pandas()
    sample = np.stack(sample_df[vec_col].to_numpy()).astype(np.float32)
    cent = train_ivf_centroids(sample, n_centroids, seed=seed)
    q = np.asarray(query, dtype=np.float32)
    q = q / (np.linalg.norm(q) or 1.0)
    probe = set(np.argsort(-(cent @ q))[:nprobe].tolist())
    cref = ray.put((cent, q, probe))

    class _Probe:
        def __init__(self):
            self.cent, self.q, self.probe = ray.get(cref)

        def __call__(self, t: pa.Table) -> pa.Table:
            m = _normalize(_mat(t[vec_col]))
            if not len(m):
                return pa.table({id_col: pa.array([], type=pa.int64()),
                                 "cos_sim": pa.array([], type=pa.float64())})
            assign = np.argmax(m @ self.cent.T, axis=1)
            mask = np.isin(assign, list(self.probe))
            sims = m[mask] @ self.q
            ids = t[id_col].to_numpy()[mask]
            nk = min(k, len(sims))
            if nk == 0:
                return pa.table({id_col: pa.array([], type=pa.int64()),
                                 "cos_sim": pa.array([], type=pa.float64())})
            idx = np.argpartition(-sims, nk - 1)[:nk]
            return pa.table({id_col: pa.array(ids[idx]),
                             "cos_sim": pa.array(sims[idx].astype(np.float64))})

    partials = ds.map_batches(_Probe, batch_format="pyarrow", concurrency=(1, 8))
    pdf = partials.to_pandas()
    pdf = pdf.sort_values(["cos_sim", id_col], ascending=[False, True], kind="stable")
    return pdf.head(k).reset_index(drop=True)


def embedding_near_duplicates(
    ds,
    *,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    seed: int = 0,
    sample_rows: int = 10_000,
):
    """Embedding-cosine near-dup pairs: bucket by nearest centroid, then
    exact pairwise cosine inside each (small) bucket."""
    import ray
    import pandas as pd

    sample_df = ds.limit(sample_rows).to_pandas()
    sample = np.stack(sample_df[vec_col].to_numpy()).astype(np.float32)
    cent = train_ivf_centroids(sample, n_centroids, seed=seed)
    cref = ray.put(cent)

    class _Assign:
        def __init__(self):
            self.cent = ray.get(cref)

        def __call__(self, t: pa.Table) -> pa.Table:
            m = _normalize(_mat(t[vec_col]))
            a = np.argmax(m @ self.cent.T, axis=1) if len(m) else np.empty(0, dtype=np.int64)
            return t.append_column("bucket", pa.array(a.astype(np.int64)))

    bucketed = ds.map_batches(_Assign, batch_format="pyarrow", concurrency=(1, 8))

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos_sim": []})
        g = g.sort_values(id_col)
        m = _normalize(np.stack(g[vec_col].to_numpy()).astype(np.float32))
        sims = m @ m.T
        ids = g[id_col].to_numpy()
        ia, ib = np.triu_indices(len(g), k=1)
        mask = sims[ia, ib] >= threshold
        return pd.DataFrame(
            {"id_a": ids[ia[mask]], "id_b": ids[ib[mask]],
             "cos_sim": sims[ia[mask], ib[mask]].astype(np.float64)}
        )

    return bucketed.groupby("bucket").map_groups(_pairs, batch_format="pandas")
