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


def test_knn_ivf_recall(ray_session, tmp_path):
    """Materialized IVF index: recall@10 >= 0.9 vs exact (VERDICT r1
    criterion), probe reads only nprobe bucket partitions, index
    reusable via load()."""
    import glob
    import os

    from netml_ray.similarity import IVFIndex

    ids, m = _emb_np()
    q = m[np.argmin(ids)]
    exact = set(knn_cosine(_emb_ds(), q, k=10, dtype=np.float64)["vec_id"])
    idx_dir = str(tmp_path / "ivf")
    approx = set(knn_cosine_ivf(_emb_ds(), q, k=10, n_centroids=8, nprobe=6,
                                index_dir=idx_dir)["vec_id"])
    recall = len(exact & approx) / 10
    assert recall >= 0.9, f"IVF recall too low: {recall}"
    # the index is a real materialized layout: every bucket partitioned
    buckets = glob.glob(os.path.join(idx_dir, "bucket=*"))
    assert len(buckets) == 8
    assert os.path.exists(os.path.join(idx_dir, "centroids.npy"))
    import pyarrow.parquet as pq

    total = sum(pq.read_table(b).num_rows for b in buckets)
    assert total == len(ids)  # every vector indexed exactly once
    # reload without ds: same result, reads only probed buckets
    idx = IVFIndex.load(idx_dir)
    again = set(idx.query(q, k=10, nprobe=6)["vec_id"])
    assert again == approx


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


def _planted_docs():
    import pandas as pd
    import pyarrow.parquet as pq

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas().head(150)
    pert = docs.head(40).copy()
    pert["doc_id"] += 1_000_000
    pert["text"] += " extra"
    return pd.concat([docs, pert], ignore_index=True)


def test_minhash_pairs_signature_vs_text_verify(ray_session):
    """The scale-safe signature estimate and the exact text re-verify
    agree on the planted near-dups; shuffle carries no text column."""
    import pandas as pd
    import ray.data as rd

    from netml_ray.dedup import minhash_lsh_duplicates

    alld = _planted_docs()
    ds = rd.from_pandas(alld)
    sig_pairs = minhash_lsh_duplicates(ds, jaccard_threshold=0.5).to_pandas()
    txt_pairs = minhash_lsh_duplicates(ds, jaccard_threshold=0.5,
                                       verify="text").to_pandas()
    # the pair set is CLUSTER-EQUIVALENT (identical-signature groups
    # star-compress to their min id), so the planted guarantee is
    # CONNECTIVITY: every original doc shares a component with its
    # perturbed copy
    def components(pairs_df):
        parent = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(pairs_df["id_a"], pairs_df["id_b"]):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return find

    for pairs_df in (sig_pairs, txt_pairs):
        find = components(pairs_df)
        for i in alld["doc_id"].head(40):
            assert find(int(i)) == find(int(i) + 1_000_000), i
    # text verify yields exact n-gram jaccard, always >= threshold
    assert (txt_pairs["jaccard"] >= 0.5).all()
    # estimates: every emitted pair clears the threshold; star pairs 1.0
    assert (sig_pairs["jaccard"] >= 0.5).all()


def test_dedup_exact_distributed_anti_join_path(ray_session):
    """broadcast_threshold=0 forces the co-partitioned anti join; result
    must equal the broadcast path."""
    import pandas as pd
    import ray.data as rd

    from netml_ray.dedup import dedup_exact

    docs = _planted_docs()
    dup = docs.head(30).copy()
    dup["doc_id"] += 5_000_000  # exact copies
    alld = pd.concat([docs, dup], ignore_index=True)
    ds = rd.from_pandas(alld)
    a = sorted(dedup_exact(ds, "text", "doc_id").to_pandas()["doc_id"])
    # force the shuffle + broadcast-anti path (fast path off)
    b = sorted(dedup_exact(rd.from_pandas(alld), "text", "doc_id",
                           narrow_collect_threshold=None)
               .to_pandas()["doc_id"])
    # force the co-partitioned anti join (both fast paths off)
    c = sorted(dedup_exact(rd.from_pandas(alld), "text", "doc_id",
                           narrow_collect_threshold=None,
                           broadcast_threshold=0).to_pandas()["doc_id"])
    assert a == b == c
    assert set(dup["doc_id"]).isdisjoint(a)  # exact copies dropped
    # duckdb ground truth: min doc_id per text
    import duckdb

    exp = duckdb.sql(
        "SELECT MIN(doc_id) FROM alld GROUP BY text ORDER BY 1"
    ).fetchnumpy()["min(doc_id)"]
    assert a == sorted(exp.tolist())


def test_simhash_duplicates_planted(ray_session):
    """Exact copies share a simhash and appear in the dup buckets."""
    import pandas as pd
    import ray.data as rd

    from netml_ray.dedup import simhash_duplicates

    docs = _planted_docs().head(150)
    dup = docs.head(25).copy()
    dup["doc_id"] += 7_000_000
    alld = pd.concat([docs, dup], ignore_index=True)
    out = simhash_duplicates(rd.from_pandas(alld)).to_pandas()
    got = set(out["doc_id"])
    for i in docs["doc_id"].head(25):
        assert int(i) in got and int(i) + 7_000_000 in got
    # every returned simhash value appears at least twice
    assert (out["simhash"].value_counts() >= 2).all()


def test_ivf_subtree_filesystem_and_rebuild(ray_session, tmp_path):
    """pyarrow.fs plumbing (r2 #6): building/querying through a
    SubTreeFileSystem (shared-storage stand-in) matches the local-path
    build; rebuilding into the same dir never duplicates vectors
    (deterministic per-bucket filenames — ADVICE r2)."""
    import os

    from pyarrow import fs as pafs

    from netml_ray.similarity import IVFIndex, knn_cosine_ivf

    ids, m = _emb_np()
    q = m[np.argmin(ids)]

    local_dir = str(tmp_path / "ivf_local")
    a = knn_cosine_ivf(_emb_ds(), q, k=10, n_centroids=8, nprobe=8,
                       index_dir=local_dir)

    sub_root = str(tmp_path / "subtree")
    os.makedirs(sub_root)
    subfs = pafs.SubTreeFileSystem(sub_root, pafs.LocalFileSystem())
    idx = IVFIndex.build(_emb_ds(), "myindex", n_centroids=8,
                         filesystem=subfs)
    b = idx.query(q, k=10, nprobe=8)
    assert list(a["vec_id"]) == list(b["vec_id"])
    # files really live under the subtree root
    assert os.path.exists(os.path.join(sub_root, "myindex", "meta.json"))

    # reload through the subtree fs
    idx2 = IVFIndex.load("myindex", filesystem=subfs)
    c = idx2.query(q, k=10, nprobe=8)
    assert list(b["vec_id"]) == list(c["vec_id"])

    # rebuild into the SAME local dir: one data.parquet per bucket, no
    # accumulation, every vector indexed exactly once
    import glob

    import pyarrow.parquet as pq

    IVFIndex.build(_emb_ds(), local_dir, n_centroids=8)
    files = glob.glob(os.path.join(local_dir, "bucket=*", "*.parquet"))
    per_bucket = {}
    for f in files:
        per_bucket.setdefault(os.path.dirname(f), []).append(f)
    assert all(len(v) == 1 for v in per_bucket.values())
    total = sum(pq.read_table(f).num_rows for f in files)
    assert total == len(ids)
    d = IVFIndex.load(local_dir).query(q, k=10, nprobe=8)
    assert list(a["vec_id"]) == list(d["vec_id"])


def test_knn_ivf_sharded_buckets(ray_session, tmp_path):
    """shards_per_bucket splits each bucket across several files (so a
    popular bucket never exceeds one task/file at scale); the manifest
    lists every shard file, load() validates them, and query results
    are identical to the unsharded build."""
    import glob
    import os

    import pyarrow.parquet as pq

    from netml_ray.similarity import IVFIndex

    ids, m = _emb_np()
    q = m[np.argmin(ids)]

    plain_dir = str(tmp_path / "ivf1")
    IVFIndex.build(_emb_ds(), plain_dir, n_centroids=8)
    a = IVFIndex.load(plain_dir).query(q, k=10, nprobe=8)

    shard_dir = str(tmp_path / "ivf3")
    idx = IVFIndex.build(_emb_ds(), shard_dir, n_centroids=8,
                         shards_per_bucket=3)
    # some bucket really is split into >1 file, and the manifest lists
    # exactly the files on disk
    files_on_disk = sorted(
        os.path.relpath(f, shard_dir).replace(os.sep, "/")
        for f in glob.glob(os.path.join(shard_dir, "bucket=*", "*.parquet")))
    manifest = sorted(p for ps in idx.meta["files"].values() for p in ps)
    assert manifest == files_on_disk
    assert any(len(ps) > 1 for ps in idx.meta["files"].values())
    total = sum(pq.read_table(os.path.join(shard_dir, p)).num_rows
                for p in manifest)
    assert total == len(ids)  # every vector indexed exactly once

    b = IVFIndex.load(shard_dir).query(q, k=10, nprobe=8)
    assert list(a["vec_id"]) == list(b["vec_id"])
    assert np.allclose(a["cos_sim"], b["cos_sim"])

    # deleting one shard file is detected at load()
    os.remove(os.path.join(shard_dir, manifest[0]))
    with pytest.raises(ValueError, match="missing bucket files"):
        IVFIndex.load(shard_dir)


def test_ngram_jaccard_duplicates_vs_bruteforce(ray_session):
    """Exact within-block word-k-gram Jaccard pairs: every emitted pair's
    jaccard equals the scalar jaccard_ngrams kernel, and the pair SET
    equals the brute-force within-block graph (exactness — no recall
    slack, unlike the MinHash estimate)."""
    import pandas as pd
    import ray.data as rd

    from netml_ray.dedup import jaccard_ngrams, ngram_jaccard_duplicates

    docs = _planted_docs()  # originals + 40 suffix-perturbed copies
    exact = docs.head(20).copy()
    exact["doc_id"] += 5_000_000  # identical texts -> J=1 pairs
    alld = pd.concat([docs, exact], ignore_index=True)

    K, THR, PFX = 3, 0.6, 8
    got = ngram_jaccard_duplicates(
        rd.from_pandas(alld), k=K, jaccard_threshold=THR,
        block_prefix=PFX, num_partitions=8).to_pandas()

    # brute force: same blocking (text prefix), exact kernel per pair
    texts = dict(zip(alld["doc_id"].astype(int), alld["text"]))
    blocks: dict = {}
    for i, t in texts.items():
        blocks.setdefault(t[:PFX], []).append(i)
    bf = {}
    for members in blocks.values():
        members.sort()
        for x in range(len(members) - 1):
            for y in range(x + 1, len(members)):
                a, b = members[x], members[y]
                j = jaccard_ngrams(texts[a], texts[b], K)
                if j >= THR:
                    bf[(a, b)] = j

    got_pairs = {(int(a), int(b)): j for a, b, j in
                 zip(got["id_a"], got["id_b"], got["jaccard"])}
    assert set(got_pairs) == set(bf)
    for p, j in bf.items():
        assert got_pairs[p] == pytest.approx(j, abs=1e-12)
    # planted exact copies are J=1 pairs with their originals
    for i in docs["doc_id"].head(20).astype(int):
        assert got_pairs.get((i, i + 5_000_000)) == 1.0


def test_simhash_near_duplicates_vs_bruteforce(ray_session):
    """Hamming<=k banding LSH: cluster-equivalence vs the exact
    all-pairs popcount graph (perfect recall via pigeonhole), every
    emitted pair's hamming verified, stars are true hamming-0."""
    import ray.data as rd

    from netml_ray.dedup import (SimHasher, popcount64,
                                 simhash_near_duplicates)

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"]).to_pandas().head(250)
    near = docs.head(60).copy()
    near["doc_id"] += 1_000_000
    # small textual perturbation -> small (usually) hamming distance
    near["text"] = near["text"].str.replace(" the ", " thee ", n=1, regex=False)
    exact = docs.head(30).copy()
    exact["doc_id"] += 2_000_000
    import pandas as pd

    alld = pd.concat([docs, near, exact], ignore_index=True)

    K = 3
    got = simhash_near_duplicates(
        rd.from_pandas(alld), max_hamming=K, num_partitions=8
    ).to_pandas()

    # brute force ground truth
    sigs = np.fromiter((SimHasher.simhash64(s) for s in alld["text"]),
                       dtype=np.int64, count=len(alld))
    ids = alld["doc_id"].to_numpy()
    iu, ju = np.triu_indices(len(ids), 1)
    d = popcount64(sigs[iu].astype(np.uint64) ^ sigs[ju].astype(np.uint64))
    hit = d <= K
    bf = {(min(int(ids[i]), int(ids[j])), max(int(ids[i]), int(ids[j])))
          for i, j in zip(iu[hit], ju[hit])}
    assert len(bf) > 30  # planted exacts guarantee pairs

    sig_of = dict(zip(ids, sigs))
    # every emitted pair: correct hamming, <= K
    for _, r in got.iterrows():
        dd = int(popcount64(np.array([sig_of[int(r["id_a"])]]).astype(np.uint64)
                            ^ np.array([sig_of[int(r["id_b"])]]).astype(np.uint64))[0])
        assert dd == int(r["hamming"]) and dd <= K

    # connectivity equivalence: the op's pair graph connects exactly
    # what the brute-force graph connects (star compression preserves
    # components — members of an identical-sig group share distances)
    def comps(pairs):
        parent = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {int(i): find(int(i)) for i in ids}

    got_pairs = {(int(a), int(b)) for a, b in zip(got["id_a"], got["id_b"])}
    assert comps(sorted(bf)) == comps(sorted(got_pairs))


def test_minhash_bucket_paths_agree(ray_session):
    """Driver fast path (small corpora) vs forced groupby-shuffle
    bucket pass: identical pair sets."""
    import pandas as pd
    import ray.data as rd

    from netml_ray.dedup import minhash_lsh_duplicates

    docs = _planted_docs()
    a = minhash_lsh_duplicates(rd.from_pandas(docs), jaccard_threshold=0.5
                               ).to_pandas()
    b = minhash_lsh_duplicates(rd.from_pandas(docs), jaccard_threshold=0.5,
                               bucket_collect_threshold=0).to_pandas()
    key = ["id_a", "id_b"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_knn_cosine_batch_matches_single(ray_session):
    """Batched multi-query top-k equals per-query exact results."""
    from netml_ray.similarity import knn_cosine, knn_cosine_batch

    ids, m = _emb_np()
    order = np.argsort(ids)
    queries = m[order[:4]]
    got = knn_cosine_batch(_emb_ds(), queries, k=10, dtype=np.float64)
    assert len(got) == 40
    for qi in range(4):
        sub = got[got["query_id"] == qi]
        single = knn_cosine(_emb_ds(), queries[qi], k=10, dtype=np.float64)
        assert sub["vec_id"].tolist() == single["vec_id"].tolist()
        np.testing.assert_allclose(sub["cos_sim"].to_numpy(),
                                   single["cos_sim"].to_numpy(), rtol=1e-12)


def test_ivf_query_batch_matches_single(ray_session, tmp_path):
    """Batched IVF probe (shared bucket scan) equals per-query results."""
    from netml_ray.similarity import IVFIndex, knn_cosine_ivf

    ids, m = _emb_np()
    order = np.argsort(ids)
    queries = m[order[:3]]
    idx_dir = str(tmp_path / "ivf_b")
    # build once via the single-query entry
    knn_cosine_ivf(_emb_ds(), queries[0], k=5, n_centroids=8, nprobe=5,
                   index_dir=idx_dir)
    idx = IVFIndex.load(idx_dir)
    got = idx.query_batch(queries, k=5, nprobe=5, dtype=np.float64)
    assert len(got) == 15
    for qi in range(3):
        single = idx.query(queries[qi], k=5, nprobe=5, dtype=np.float64)
        sub = got[got["query_id"] == qi]
        assert sub["vec_id"].tolist() == single["vec_id"].tolist()
        np.testing.assert_allclose(sub["cos_sim"].to_numpy(),
                                   single["cos_sim"].to_numpy(), rtol=1e-12)


def test_simhash_cached_matches_reference():
    """The cached unique-token path (per-actor vocab cache, count-
    weighted bit votes) must be bit-identical to the per-occurrence
    reference definition — including repeated words, unicode, empty
    and single-token docs — and across repeated calls (cache hits)."""
    from netml_ray.dedup import SimHasher

    texts = [
        "",
        "word",
        "the the the the only",
        "a b c a b c a b c d",
        "Z " * 500 + "tail",
        "naïve café – unicode tokens répétés répétés",
        "mixed CASE Mixed case MIXED",
    ]
    h = SimHasher()
    for _ in range(2):  # second round exercises pure cache hits
        for s in texts:
            assert h.simhash64_cached(s) == SimHasher.simhash64(s), s
    assert len(h._tok_cache) > 0

    # the chunked batch path (the __call__ hot path) must agree too,
    # across chunk boundaries and with empty docs in every position
    import numpy as np

    batch = ([""] + texts * 40 + [""] + texts + ["", ""])  # > 2 chunks
    got = SimHasher()._sig_chunked(batch)
    ref = np.array([SimHasher.simhash64(s) for s in batch], dtype=np.int64)
    np.testing.assert_array_equal(got, ref)


def test_simhash_vectorized_matches_reference():
    """The Arrow-tokenized batch path (__call__ hot path since r5)
    must be bit-identical to simhash64 — including ws-danger rows
    (NBSP/NEL/Zs) that must take the per-doc fallback, empty docs,
    docs longer than the token-slice budget, and pure cache hits."""
    import numpy as np
    import pyarrow as pa

    from netml_ray.dedup import SimHasher

    texts = [
        "",
        "word",
        "the the the the only",
        "a b c a b c a b c d",
        "Z " * 500 + "tail",
        "na\u00efve caf\u00e9 \u2013 unicode tokens r\u00e9p\u00e9t\u00e9s r\u00e9p\u00e9t\u00e9s",
        "mixed CASE Mixed case MIXED",
        # ws-danger set: python split() splits on these, RE2 \\s+ does
        # not — the fallback path must catch every one
        "nbsp\u00a0joined tokens here",
        "NEL\u0085split and\u2028line sep",
        "\u3000ideographic space lead",
        "w " * 300000,                     # exceeds _TOK_CHUNK alone
    ]
    batch = [""] + texts * 3 + ["", ""]
    h = SimHasher()
    for _ in range(2):  # second pass exercises pure cache hits
        got = h(pa.table({"text": pa.array(batch, type=pa.string())}))
        ref = np.array([SimHasher.simhash64(s) for s in batch],
                       dtype=np.int64)
        np.testing.assert_array_equal(got["simhash"].to_numpy(), ref)


def test_levenshtein_batch_exact(ray_session):
    """Vectorized prefix-min DP == the classic rolling-row DP on
    random pairs including empty strings."""
    import random

    from netml_ray.dedup import levenshtein_pairs_batch

    def ref(a, b):
        dp = list(range(len(b) + 1))
        for i in range(1, len(a) + 1):
            prev, dp[0] = dp[0], i
            for j in range(1, len(b) + 1):
                cur = min(dp[j] + 1, dp[j - 1] + 1,
                          prev + (a[i - 1] != b[j - 1]))
                prev, dp[j] = dp[j], cur
        return dp[len(b)]

    random.seed(7)
    pairs = [("".join(random.choice("abcd ") for _ in
                      range(random.randint(0, 24))),
              "".join(random.choice("abcd ") for _ in
                      range(random.randint(0, 24))))
             for _ in range(200)]
    got = levenshtein_pairs_batch([a for a, _ in pairs],
                                  [b for _, b in pairs])
    exp = np.array([ref(a, b) for a, b in pairs])
    np.testing.assert_array_equal(got, exp)


def test_edit_distance_pairs_planted_recall(ray_session):
    """Every planted near-copy (suffix edit, same block) is found
    with the exact distance; unrelated docs in other blocks are not
    paired."""
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.dedup import edit_distance_pairs

    rng = np.random.default_rng(71)
    base = ["the quick brown fox %03d jumps over the lazy dog" % i
            for i in range(60)]
    t = pa.table({
        "doc_id": pa.array(np.arange(60, dtype=np.int64)),
        "text": pa.array(base),
        "src": pa.array(["blk%d" % (i % 3) for i in range(60)]),
    })
    pert = pa.table({
        "doc_id": pa.array(np.arange(60, dtype=np.int64) + 1000),
        "text": pa.array([s + " xx" for s in base]),
        "src": t["src"],
    })
    both = rd.from_arrow(pa.concat_tables([t, pert])).repartition(4)
    out = edit_distance_pairs(both, block_col="src", max_dist=3,
                              prefix_len=64, bucket_width=16
                              ).to_pandas().set_index(["id_a", "id_b"])
    for i in range(60):
        assert (i, i + 1000) in out.index
        # ' xx' lands beyond the 48-char prefix? no: texts are ~47
        # chars, so the suffix IS in the prefix window -> dist == 3
        assert out.loc[(i, i + 1000), "dist"] == 3


def test_ngram_containment_vs_jaccard(ray_session):
    """A snippet lifted into a long host doc: containment == 1.0 while
    Jaccard dilutes below any useful threshold."""
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.dedup import ngram_jaccard_duplicates

    words = [f"w{i}" for i in range(200)]
    host = " ".join(words)
    snippet = " ".join(words[:12])          # same 8-codeunit prefix
    t = pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                  "text": pa.array([host, snippet])})

    cont = ngram_jaccard_duplicates(
        rd.from_arrow(t), k=3, jaccard_threshold=0.9,
        metric="containment").to_pandas()
    assert len(cont) == 1
    assert cont.iloc[0]["containment"] == 1.0

    jac = ngram_jaccard_duplicates(
        rd.from_arrow(t), k=3, jaccard_threshold=0.9).to_pandas()
    assert len(jac) == 0                     # diluted: 10/198 << 0.9

    with pytest.raises(ValueError):
        ngram_jaccard_duplicates(rd.from_arrow(t), metric="dice")


def test_snm_candidates_vs_brute(ray_session):
    """SNM window pairs match a brute sorted walk, including across
    the bucket boundary (small bucket forces edge routing)."""
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.dedup import jaro_winkler_pairs_batch, snm_candidates

    rng = np.random.default_rng(13)
    base = ["".join(rng.choice(list("abcdef"), 12)) for _ in range(150)]
    keys = base + [s[:11] + "z" for s in base[:30]]   # near-keys
    ids = np.arange(len(keys), dtype=np.int64)
    t = pa.table({"doc_id": pa.array(ids), "bk": pa.array(keys)})
    out = snm_candidates(rd.from_arrow(t).repartition(5), "bk",
                         "doc_id", window=2, min_sim=0.9,
                         bucket=16).to_pandas()
    order = sorted(range(len(keys)), key=lambda i: (keys[i], ids[i]))
    brute = []
    for p in range(len(order)):
        for d in (1, 2):
            if p + d < len(order):
                i, j = order[p], order[p + d]
                jw = jaro_winkler_pairs_batch([keys[i]], [keys[j]])[0]
                if jw >= 0.9:
                    brute.append((ids[i], ids[j], round(jw, 9)))
    got = sorted(map(tuple, out.to_numpy().tolist()))
    assert got == sorted(brute)
    assert len(got) >= 30          # the planted near-keys are found
