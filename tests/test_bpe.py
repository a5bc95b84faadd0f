"""bpe.learn_bpe / apply_bpe vs a sequential Sennrich-style
reference (same determinism rule: max pair count, ties by lowest
(left, right) id pair; byte-level symbols; \\w+|[^\\w\\s] pre-tokens;
greedy left-to-right overlap resolution)."""

import re

import numpy as np
import pyarrow as pa

_PRE = re.compile(r"\w+|[^\w\s]")


def _ref_bpe(texts, num_merges, min_word_count=1, min_pair_count=2):
    """Sequential reference: dict word counts, tuple symbols."""
    wc = {}
    for s in texts:
        for w in _PRE.findall(s or ""):
            wc[w] = wc.get(w, 0) + 1
    words = {tuple(w.encode("utf-8")): n for w, n in wc.items()
             if n >= min_word_count}
    tokens = [bytes([i]) for i in range(256)]
    merges = []
    for rank in range(num_merges):
        pairs = {}
        for syms, n in words.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + n
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        if pairs[best] < min_pair_count:
            break
        new_id = 256 + rank
        tokens.append(tokens[best[0]] + tokens[best[1]])
        merges.append((rank, best[0], best[1], tokens[-1],
                       pairs[best]))
        out = {}
        for syms, n in words.items():
            res, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == best[0]
                        and syms[i + 1] == best[1]):
                    res.append(new_id)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            out[tuple(res)] = out.get(tuple(res), 0) + n
        words = out
    return merges


def _ref_encode(text, merges):
    """Sequential encode of one doc with the learned table."""
    toks = 0
    for w in _PRE.findall(text or ""):
        syms = list(w.encode("utf-8"))
        for rank, left, right, _, _ in merges:
            new_id, res, i = 256 + rank, [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == left
                        and syms[i + 1] == right):
                    res.append(new_id)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            syms = res
        toks += len(syms)
    return toks


CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps; the quick fox runs!",
    "low lower lowest newer newest wide wider widest",
    "aaa aaaa aa baaab",          # overlap stress for (a,a)
    "internationalization and internationalism are international",
    "",                            # empty doc
    "the the the the quick quick lazy",
]


def test_learn_bpe_vs_sequential_reference(ray_session):
    import ray.data as rd

    from netml_ray.bpe import learn_bpe

    ds = rd.from_items([{"doc_id": i, "text": s}
                        for i, s in enumerate(CORPUS)]).repartition(3)
    got = learn_bpe(ds, "text", num_merges=40, num_partitions=3)
    exp = _ref_bpe(CORPUS, 40)
    assert got.num_rows == len(exp)
    for row, (rank, left, right, tok, cnt) in zip(
            got.to_pylist(), exp):
        assert (row["rank"], row["left"], row["right"],
                row["token"], row["pair_count"]) == \
            (rank, left, right, tok, cnt)


def test_learn_bpe_driver_equals_distributed(ray_session):
    import ray.data as rd

    from netml_ray.bpe import learn_bpe

    ds = rd.from_items([{"doc_id": i, "text": s}
                        for i, s in enumerate(CORPUS)]).repartition(4)
    a = learn_bpe(ds, "text", num_merges=25, num_partitions=3)
    b = learn_bpe(ds, "text", num_merges=25, num_partitions=3,
                  driver_bytes=0)
    assert a.equals(b)


def test_apply_bpe_token_counts(ray_session):
    import ray.data as rd

    from netml_ray.bpe import apply_bpe, learn_bpe

    ds = rd.from_items([{"doc_id": i, "text": s}
                        for i, s in enumerate(CORPUS)]).repartition(2)
    mt = learn_bpe(ds, "text", num_merges=30, num_partitions=3)
    exp = _ref_bpe(CORPUS, 30)
    out = apply_bpe(ds, mt, "text", "doc_id").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    for i, s in enumerate(CORPUS):
        assert out.loc[i, "n_words"] == len(_PRE.findall(s))
        assert out.loc[i, "n_tokens"] == _ref_encode(s, exp)
    # more merges => no doc's token count increases
    mt2 = learn_bpe(ds, "text", num_merges=5, num_partitions=3)
    out2 = apply_bpe(ds, mt2, "text", "doc_id").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert (out["n_tokens"].to_numpy()
            <= out2["n_tokens"].to_numpy()).all()


def test_learn_bpe_early_stop_and_empty(ray_session):
    import ray.data as rd

    from netml_ray.bpe import learn_bpe

    # all-distinct single chars: no pair ever reaches min_pair_count=2
    ds = rd.from_items([{"text": "a b c d"}])
    assert learn_bpe(ds, "text", num_merges=10).num_rows == 0
    ds0 = rd.from_items([{"text": ""}])
    assert learn_bpe(ds0, "text", num_merges=10).num_rows == 0
