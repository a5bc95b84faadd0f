"""Similarity search + near-dup operators over the embeddings table."""

import numpy as np
import pyarrow as pa
import pytest

from netml_ray.dedup import MinHasher, jaccard_ngrams
from netml_ray.similarity import (
    embedding_near_duplicates,
    knn_cosine,
    knn_cosine_ivf,
)

SF = "/root/testdata/sf0.001"


def _emb_ds():
    import ray.data as rd

    return rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])


def _emb_np():
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet")
    m = np.asarray(t["embedding"].combine_chunks().flatten(), dtype=np.float64).reshape(
        t.num_rows, -1
    )
    return t["vec_id"].to_numpy(), m


def test_knn_exact_matches_numpy(ray_session):
    ids, m = _emb_np()
    q = m[np.argmin(ids)]
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    sims = mn @ qn
    order = np.lexsort((ids, -sims))[:10]
    expected = set(ids[order].tolist())

    got = knn_cosine(_emb_ds(), q, k=10, dtype=np.float64)
    assert set(got["vec_id"]) == expected
    assert (np.diff(got["cos_sim"].to_numpy()) <= 1e-12).all()  # sorted desc


def test_knn_ivf_recall(ray_session):
    ids, m = _emb_np()
    q = m[np.argmin(ids)]
    exact = set(knn_cosine(_emb_ds(), q, k=10, dtype=np.float64)["vec_id"])
    approx = set(knn_cosine_ivf(_emb_ds(), q, k=10, n_centroids=8, nprobe=4)["vec_id"])
    recall = len(exact & approx) / 10
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_embedding_near_duplicates_finds_planted(ray_session):
    import ray.data as rd

    ids, m = _emb_np()
    n, d = m.shape
    # plant near-duplicates: tiny perturbations of the first 10 vectors
    rng = np.random.default_rng(0)
    dup = m[:10] + rng.normal(0, 1e-4, (10, d))
    allm = np.vstack([m, dup]).astype(np.float32)
    all_ids = np.r_[ids, ids[:10] + 1_000_000]
    feats = pa.FixedSizeListArray.from_arrays(pa.array(allm.ravel()), d)
    ds = rd.from_arrow(pa.table({"vec_id": pa.array(all_ids), "embedding": feats}))
    pairs = embedding_near_duplicates(ds, threshold=0.999, n_centroids=4).to_pandas()
    found = set(zip(pairs["id_a"], pairs["id_b"]))
    hits = sum((int(i), int(i) + 1_000_000) in found or (int(i) + 1_000_000, int(i)) in found
               for i in ids[:10])
    # bucketing may split a few pairs across centroid boundaries;
    # perturbed twins almost always land in the same bucket
    assert hits >= 7, f"only {hits}/10 planted near-dup pairs found"


def test_minhash_jaccard_estimate():
    mh = MinHasher(num_perm=128, k=2)
    a = "the quick brown fox jumps over the lazy dog again and again"
    b = "the quick brown fox jumps over the lazy cat again and again"
    sig_a, sig_b = mh.signature(a), mh.signature(b)
    est = (sig_a == sig_b).mean()
    true = jaccard_ngrams(a, b, 2)
    assert abs(est - true) < 0.2
    # identical text → identical signature
    assert (mh.signature(a) == mh.signature(a)).all()
