"""Inverted index: build/load/search vs brute-force membership."""

import numpy as np
import pyarrow as pa
import pytest


DOCS = [
    "the cat sat on the mat",
    "the dog sat",
    "cat and dog",
    "",
    "mat mat mat",          # repeated token → ONE posting
    "unrelated words here",
]


@pytest.fixture()
def built(ray_session, tmp_path):
    import ray.data as rd

    from netml_ray.invindex import InvertedIndex

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(DOCS)), type=pa.int64()),
        "text": pa.array(DOCS)}))
    return InvertedIndex.build(ds, str(tmp_path / "idx"), num_shards=4)


def _brute(terms, mode="and"):
    sets = [set(i for i, d in enumerate(DOCS) if t in d.split())
            for t in terms]
    out = sets[0]
    for s in sets[1:]:
        out = out & s if mode == "and" else out | s
    return sorted(out)


def test_postings_sorted_and_deduped(built):
    np.testing.assert_array_equal(built.postings("mat"), [0, 4])
    np.testing.assert_array_equal(built.postings("the"), [0, 1])
    assert len(built.postings("zebra")) == 0


def test_search_and_or(built):
    np.testing.assert_array_equal(built.search(["cat", "sat"]),
                                  _brute(["cat", "sat"]))
    np.testing.assert_array_equal(built.search(["cat", "dog"], mode="or"),
                                  _brute(["cat", "dog"], "or"))
    np.testing.assert_array_equal(built.search(["cat", "zebra"]), [])
    np.testing.assert_array_equal(built.search(["dog", "dog"]),
                                  _brute(["dog"]))  # dup terms collapse
    assert len(built.search([])) == 0
    with pytest.raises(ValueError):
        built.search(["cat"], mode="xor")


def test_postings_segment_split(ray_session, tmp_path):
    """A token whose postings exceed max_postings is split across
    segment rows; search-side concatenation restores the full sorted
    list (the stop-word case at scale)."""
    import ray.data as rd

    from netml_ray.invindex import InvertedIndex

    n = 57
    docs = ["common word"] * n + ["rare word"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), type=pa.int64()),
        "text": pa.array(docs)}))
    idx = InvertedIndex.build(ds, str(tmp_path / "seg"), num_shards=2,
                              max_postings=10)
    np.testing.assert_array_equal(idx.postings("common"), np.arange(n))
    np.testing.assert_array_equal(idx.postings("word"),
                                  np.arange(n + 1))
    np.testing.assert_array_equal(idx.search(["common", "word"]),
                                  np.arange(n))
    np.testing.assert_array_equal(idx.postings("rare"), [n])


def test_load_roundtrip_and_missing_shard(built, tmp_path):
    import shutil

    from netml_ray.invindex import InvertedIndex

    idx = InvertedIndex.load(built.index_dir)
    np.testing.assert_array_equal(idx.search(["cat", "sat"]),
                                  _brute(["cat", "sat"]))
    shard = next(iter(idx.meta["files"].values()))
    shutil.rmtree(f"{built.index_dir}/{shard.split('/')[0]}")
    with pytest.raises(ValueError, match="missing shards"):
        InvertedIndex.load(built.index_dir)


def test_bm25_via_index_matches_direct_scorer(ray_session, tmp_path):
    """Index-local BM25 (postings tf/dl + manifest stats) is BITWISE
    equal to the full-scan scorer on every matching doc."""
    import ray.data as rd

    from netml_ray.invindex import InvertedIndex
    from netml_ray.textstats import bm25_scores

    rng = np.random.default_rng(41)
    vocab = [f"w{i}" for i in range(40)]
    docs = [" ".join(rng.choice(vocab, rng.integers(3, 30)))
            for _ in range(400)] + ["", "w0 w0 w0"]
    t = pa.table({"doc_id": pa.array(range(len(docs)), type=pa.int64()),
                  "text": pa.array(docs)})
    idx = InvertedIndex.build(rd.from_arrow(t), str(tmp_path / "bm"),
                              num_shards=4)
    terms = ["w0", "w7", "w23"]
    ids, sc = idx.bm25(terms)
    direct = (bm25_scores(rd.from_arrow(t), terms).to_pandas()
              .sort_values("doc_id").reset_index(drop=True))
    order = np.argsort(ids)
    assert list(ids[order]) == list(direct["doc_id"])
    np.testing.assert_array_equal(sc[order], direct["bm25"].to_numpy())
    with pytest.raises(ValueError):
        idx.bm25([])


def test_varint_codec_roundtrip():
    from netml_ray.invindex import decode_varint, encode_varint

    rng = np.random.default_rng(3)
    for n in (0, 1, 7, 1000):
        v = rng.integers(0, 2**62, n).astype(np.uint64)
        buf, nb = encode_varint(v)
        assert int(nb.sum()) == len(buf)
        np.testing.assert_array_equal(decode_varint(buf.tobytes()), v)
    edge = np.array([0, 1, 127, 128, 16383, 16384, 2**63 - 1,
                     2**64 - 1], dtype=np.uint64)
    buf, _ = encode_varint(edge)
    np.testing.assert_array_equal(decode_varint(buf.tobytes()), edge)


def test_positions_and_phrase_search(ray_session, tmp_path):
    import ray.data as rd

    from netml_ray.invindex import InvertedIndex

    docs = [
        "the cat sat on the mat",     # "the cat" at 1, "the mat" at 5
        "cat the cat the cat",        # "the cat" at 2 and 4
        "the dog sat on a cat",       # no "the cat"
        "",
        "the the the",                # repeated-term phrase "the the"
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), type=pa.int64()),
        "text": pa.array(docs)}))
    idx = InvertedIndex.build(ds, str(tmp_path / "pidx"), num_shards=4,
                              positions=True)
    assert idx.meta["positions"] and idx.meta["codec"] == "delta-varint"
    assert idx.meta["index_bytes"] > 0

    ids, counts, flat = idx.postings_positions("the")
    # doc 0: the@{1,5}, doc 1: the@{2,4}, doc 2: the@{1}, doc 4: {1,2,3}
    np.testing.assert_array_equal(ids, [0, 1, 2, 4])
    np.testing.assert_array_equal(counts, [2, 2, 1, 3])
    np.testing.assert_array_equal(flat, [1, 5, 2, 4, 1, 1, 2, 3])

    np.testing.assert_array_equal(idx.phrase_search(["the", "cat"]),
                                  [0, 1])
    np.testing.assert_array_equal(idx.phrase_search(["the", "mat"]), [0])
    np.testing.assert_array_equal(
        idx.phrase_search(["cat", "sat", "on"]), [0])
    np.testing.assert_array_equal(idx.phrase_search(["the", "the"]), [4])
    assert len(idx.phrase_search(["dog", "cat"])) == 0
    assert len(idx.phrase_search(["zebra", "cat"])) == 0

    # an index built WITHOUT positions refuses phrase queries loudly
    plain = InvertedIndex.build(ds, str(tmp_path / "noidx"),
                                num_shards=2)
    with pytest.raises(ValueError, match="positions"):
        plain.phrase_search(["the", "cat"])


def test_phrase_search_matches_bruteforce_random(ray_session, tmp_path):
    import ray.data as rd

    from netml_ray.invindex import InvertedIndex

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab → many phrases
    docs = [" ".join(rng.choice(vocab, rng.integers(2, 40)))
            for _ in range(300)]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), type=pa.int64()),
        "text": pa.array(docs)}))
    idx = InvertedIndex.build(ds, str(tmp_path / "ridx"), num_shards=4,
                              positions=True, max_postings=50)

    def brute(phrase):
        out = []
        for i, d in enumerate(docs):
            ws = d.split()
            if any(ws[j:j + len(phrase)] == phrase
                   for j in range(len(ws) - len(phrase) + 1)):
                out.append(i)
        return out

    for phrase in (["w0", "w1"], ["w3", "w3"], ["w5", "w2", "w7"],
                   ["w1", "w1", "w1"]):
        np.testing.assert_array_equal(idx.phrase_search(phrase),
                                      brute(phrase), err_msg=str(phrase))
