"""Corpus-statistics scorers (bigram LM bits, TF-IDF) vs brute force."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


DOCS = [
    "the cat sat on the mat",
    "the cat ran",
    "dog ran fast",
    "",                      # empty → 0 bigrams, NULL bits
    "solo",                  # 1 token → 0 bigrams, NULL bits
    "the cat sat on the mat",   # exact dup of doc 0
    "mat the on sat cat the",   # reversed — different bigrams
]


def _brute_lm(docs, alpha=0.5):
    toks = [d.split() for d in docs]
    stream = [w for t in toks for w in t]
    vocab = sorted(set(stream))
    bc = {}
    for t in toks:
        for a, b in zip(t, t[1:]):
            bc[(a, b)] = bc.get((a, b), 0) + 1
    cu = {}
    for (a, _), n in bc.items():
        cu[a] = cu.get(a, 0) + n
    out = []
    for i, t in enumerate(toks):
        pairs = list(zip(t, t[1:]))
        if not pairs:
            out.append((i, 0, None))
            continue
        s = sum(math.log2((bc.get(p, 0) + alpha)
                          / (cu.get(p[0], 0) + alpha * len(vocab)))
                for p in pairs)
        out.append((i, len(pairs), -s / len(pairs)))
    return out


def test_bigram_lm_bits_matches_brute_force(ray_session):
    import ray.data as rd

    from netml_ray.textstats import bigram_lm_bits

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(DOCS)), type=pa.int64()),
        "text": pa.array(DOCS)}))
    got = (bigram_lm_bits(ds, alpha=0.5).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    exp = _brute_lm(DOCS)
    assert list(got["n_bigrams"]) == [e[1] for e in exp]
    for g, e in zip(got["lm_bits"], [e[2] for e in exp]):
        if e is None:
            assert pd.isna(g)
        else:
            assert g == pytest.approx(e, abs=1e-12)
    # the exact-dup doc scores identically to its original
    assert got.loc[5, "lm_bits"] == got.loc[0, "lm_bits"]
    # reversed word order → different bigrams → different (higher) bits
    assert got.loc[6, "lm_bits"] > got.loc[0, "lm_bits"]


def test_bigram_lm_injected_model(ray_session):
    """Train on a clean subset, score everything (the CCNet shape)."""
    import ray.data as rd

    from netml_ray.textstats import bigram_counts, bigram_lm_bits, doc_frequency

    train = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "text": pa.array(["the cat sat", "the cat ran"])}))
    score = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "text": pa.array(["the cat sat", "zebra quux"])}))
    counts = bigram_counts(train).materialize()
    vs = doc_frequency(train).count()
    got = (bigram_lm_bits(score, counts=counts, vocab_size=vs)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # in-distribution doc scores low; OOV doc gets the unseen penalty
    # -log2(alpha / (alpha * V)) = log2(V)
    assert got.loc[0, "lm_bits"] < got.loc[1, "lm_bits"]
    assert got.loc[1, "lm_bits"] == pytest.approx(math.log2(vs), abs=1e-12)


def _brute_tfidf(docs, k=3):
    toks = [d.split() for d in docs]
    n = len(docs)
    df = {}
    for t in toks:
        for w in set(t):
            df[w] = df.get(w, 0) + 1
    rows = []
    for i, t in enumerate(toks):
        tf = {}
        for w in t:
            tf[w] = tf.get(w, 0) + 1
        scored = sorted(
            ((w, c, c * (math.log((n + 1) / (df[w] + 1)) + 1.0))
             for w, c in tf.items()),
            key=lambda x: (-x[2], x[0]))[:k]
        rows += [(i, w, c, s) for w, c, s in scored]
    return pd.DataFrame(rows, columns=["doc_id", "term", "tf", "tfidf"])


def test_tfidf_top_terms_matches_brute_force(ray_session):
    import ray.data as rd

    from netml_ray.textstats import tfidf_top_terms

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(DOCS)), type=pa.int64()),
        "text": pa.array(DOCS)}))
    got = (tfidf_top_terms(ds, k=3).to_pandas()
           .sort_values(["doc_id", "term"]).reset_index(drop=True))
    exp = (_brute_tfidf(DOCS, k=3)
           .sort_values(["doc_id", "term"]).reset_index(drop=True))
    assert list(got["doc_id"]) == list(exp["doc_id"])
    assert list(got["term"]) == list(exp["term"])
    assert list(got["tf"]) == list(exp["tf"])
    np.testing.assert_allclose(got["tfidf"], exp["tfidf"], atol=1e-12)


def test_bm25_matches_brute_force(ray_session):
    import ray.data as rd

    from netml_ray.textstats import bm25_scores

    terms = ["cat", "mat"]
    k1, b = 1.5, 0.75
    n = len(DOCS)
    toks = [d.split() for d in DOCS]
    avgdl = sum(len(t) for t in toks) / n
    df = {q: sum(q in t for t in toks) for q in terms}
    exp = {}
    for i, t in enumerate(toks):
        s = 0.0
        for q in sorted(terms):
            tf = t.count(q)
            idf = math.log(1.0 + (n - df[q] + 0.5) / (df[q] + 0.5))
            s += idf * (tf * (k1 + 1.0)
                        / (tf + k1 * (1.0 - b + b * len(t) / avgdl)))
        if s > 0:
            exp[i] = s

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "text": pa.array(DOCS)}))
    got = (bm25_scores(ds, terms, k1=k1, b=b).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert set(got["doc_id"]) == set(exp)
    for _, r in got.iterrows():
        assert r["bm25"] == pytest.approx(exp[r["doc_id"]], abs=1e-12)
    # doc with both terms outranks single-term docs
    best = got.loc[got["bm25"].idxmax(), "doc_id"]
    assert best in (0, 5)  # "the cat sat on the mat" variants
    with pytest.raises(ValueError):
        bm25_scores(ds, [])


def test_empty_and_whitespace_inputs(ray_session):
    """All-empty / whitespace-only corpora flow through every scorer
    without error and with the documented null/zero semantics."""
    import ray.data as rd

    from netml_ray.textstats import (bigram_lm_bits, bm25_scores,
                                     doc_frequency, tfidf_top_terms)

    t = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                  "text": pa.array(["", "   "])})
    ds = rd.from_arrow(t)
    lm = bigram_lm_bits(ds).to_pandas().sort_values("doc_id")
    assert list(lm["n_bigrams"]) == [0, 0]
    assert lm["lm_bits"].isna().all()
    assert len(tfidf_top_terms(ds, k=3).to_pandas()) == 0
    assert len(doc_frequency(ds).to_pandas()) == 0
    assert len(bm25_scores(ds, ["x"]).to_pandas()) == 0


def test_prune_thresholds(ray_session):
    """min_count / min_df drop the long tail (broadcastability prune)."""
    import ray.data as rd

    from netml_ray.textstats import bigram_counts, doc_frequency

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(["a b a b", "a b c", "rare pair"])}))
    full = bigram_counts(ds).to_pandas()
    pruned = bigram_counts(ds, min_count=2).to_pandas()
    assert set(map(tuple, pruned[["w1", "w2"]].values)) == {("a", "b")}
    assert len(full) > len(pruned)
    df_full = doc_frequency(ds).to_pandas()
    df_pruned = doc_frequency(ds, min_df=2).to_pandas()
    assert set(df_pruned["token"]) == {"a", "b"}
    assert len(df_full) > len(df_pruned)


def _brute_pmi(docs, min_count):
    toks = [d.split() for d in docs]
    uc, bc = {}, {}
    for t in toks:
        for w in t:
            uc[w] = uc.get(w, 0) + 1
        for a, b in zip(t, t[1:]):
            bc[(a, b)] = bc.get((a, b), 0) + 1
    T = sum(uc.values())
    B = sum(bc.values())
    return {(a, b): (n, math.log2((n / B) / ((uc[a] / T) * (uc[b] / T))))
            for (a, b), n in bc.items() if n >= min_count}


def test_pmi_collocations_matches_brute_force(ray_session):
    import ray.data as rd

    from netml_ray.textstats import pmi_collocations

    docs = DOCS * 3 + ["new york new york city", "  "]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), type=pa.int64()),
        "text": pa.array(docs)}))
    got = (pmi_collocations(ds, min_count=2).to_pandas()
           .sort_values(["w1", "w2"]).reset_index(drop=True))
    exp = _brute_pmi(docs, 2)
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        n, p = exp[(r["w1"], r["w2"])]
        assert r["n"] == n
        assert r["pmi"] == pytest.approx(p, abs=1e-12)
    # a bigram that ALWAYS co-occurs ("new york") scores higher than
    # one whose parts are frequent independently ("the cat")
    ny = got.set_index(["w1", "w2"]).loc[("new", "york"), "pmi"]
    tc = got.set_index(["w1", "w2"]).loc[("the", "cat"), "pmi"]
    assert ny > tc


def test_pmi_collocations_empty_and_prune(ray_session):
    import ray.data as rd

    from netml_ray.textstats import pmi_collocations

    # all-empty corpus -> empty result, no crash
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "text": pa.array(["", "   "])}))
    assert pmi_collocations(ds, min_count=1).count() == 0
    # min_count prunes: each bigram appears once -> nothing at 2
    ds2 = rd.from_arrow(pa.table({
        "doc_id": pa.array([0], type=pa.int64()),
        "text": pa.array(["a b c d"])}))
    assert pmi_collocations(ds2, min_count=2).count() == 0
    assert pmi_collocations(ds2, min_count=1).count() == 3


def test_vocab_richness_vs_brute(ray_session):
    import ray.data as rd

    from netml_ray.textstats import vocab_richness

    rng = np.random.default_rng(41)
    vocab = [f"w{i}" for i in range(200)]
    docs, grp = [], []
    for i in range(600):
        n = int(rng.integers(0, 30))
        docs.append(" ".join(rng.choice(vocab, n)) if n else "")
        grp.append(f"s{i % 3}")
    t = pa.table({"text": pa.array(docs), "source": pa.array(grp)})
    out = vocab_richness(rd.from_arrow(t).repartition(6), "text",
                         "source").to_pandas() \
        .set_index("source").sort_index()

    from collections import Counter
    for g in ["s0", "s1", "s2"]:
        c = Counter(w for txt, s in zip(docs, grp) if s == g
                    for w in txt.split())
        n_tokens = sum(c.values())
        n_types = len(c)
        hapax = sum(1 for v in c.values() if v == 1)
        assert out.loc[g, "n_tokens"] == n_tokens
        assert out.loc[g, "n_types"] == n_types
        assert np.isclose(out.loc[g, "ttr"], n_types / n_tokens)
        assert np.isclose(out.loc[g, "hapax_frac"], hapax / n_types)


def test_source_divergence_vs_brute(ray_session):
    import ray.data as rd

    from netml_ray.textstats import source_divergence

    rng = np.random.default_rng(67)
    # source s0 uses a skewed vocabulary -> higher KL than the mix
    v_all = [f"w{i}" for i in range(50)]
    v_skew = [f"w{i}" for i in range(5)]
    docs, grp = [], []
    for i in range(600):
        g = f"s{i % 3}"
        vocab = v_skew if g == "s0" else v_all
        docs.append(" ".join(rng.choice(vocab, 25)))
        grp.append(g)
    t = pa.table({"text": pa.array(docs), "source": pa.array(grp)})
    out = source_divergence(rd.from_arrow(t).repartition(6), "text",
                            "source").to_pandas() \
        .set_index("source").sort_index()

    from collections import Counter
    cg = Counter(w for d in docs for w in d.split())
    ntot = sum(cg.values())
    for g in ["s0", "s1", "s2"]:
        cs = Counter(w for d, s in zip(docs, grp) if s == g
                     for w in d.split())
        ns = sum(cs.values())
        kl = sum((n / ns) * np.log((n / ns) / (cg[w] / ntot))
                 for w, n in cs.items())
        assert out.loc[g, "n_tokens"] == ns
        assert np.isclose(out.loc[g, "kl"], kl, atol=2e-6)
    assert out.loc["s0", "kl"] > 3 * out.loc["s1", "kl"]
    assert (out["kl"] >= -1e-9).all()


def test_rrf_fuse_reference():
    """RRF == hand-computed 1/(k+rank) sums; absent ids contribute 0;
    deterministic (score desc, id) output order."""
    import pyarrow as pa

    from netml_ray.textstats import rrf_fuse

    a = pa.table({"id": pa.array([10, 20, 30], type=pa.int64())})
    b = pa.table({"id": pa.array([30, 40], type=pa.int64())})
    out = rrf_fuse([a, b], "id", k=60)
    got = dict(zip(out["id"].to_pylist(), out["rrf"].to_pylist()))
    assert got[10] == round(1 / 61, 9)
    assert got[20] == round(1 / 62, 9)
    assert got[30] == round(1 / 63 + 1 / 61, 9)
    assert got[40] == round(1 / 62, 9)
    # 30 first (two lists), then ties 20/40 broken by id
    assert out["id"].to_pylist() == [30, 10, 20, 40]


def test_logodds_tokens_vs_brute(ray_session):
    """Smoothed log-odds keyness == a Counter brute force; a planted
    A-only token gets a large positive z, B-only negative."""
    import collections

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.textstats import logodds_tokens

    rng = np.random.default_rng(14)
    vocab = ["the", "fast", "cat", "dog", "runs"]
    rows = []
    for i in range(600):
        src = "A" if i % 2 == 0 else "B"
        words = list(rng.choice(vocab, 8))
        if src == "A" and i % 10 == 0:
            words.append("zonly")
        if src == "B" and i % 10 == 1:
            words.append("bonly")
        rows.append((src, " ".join(words)))
    # a third source that must be ignored
    rows.append(("C", "the the the"))
    t = pa.table({"source": pa.array([r[0] for r in rows]),
                  "text": pa.array([r[1] for r in rows])})
    out = (logodds_tokens(rd.from_arrow(t).repartition(5), "text",
                          "source", "A", "B")
           .to_pandas().set_index("w"))
    ca: collections.Counter = collections.Counter()
    cb: collections.Counter = collections.Counter()
    for src, txt in rows:
        if src == "A":
            ca.update(txt.split())
        elif src == "B":
            cb.update(txt.split())
    na, nb = sum(ca.values()), sum(cb.values())
    for w in set(ca) | set(cb):
        d = (np.log((ca[w] + 0.5) / (na - ca[w] + 0.5))
             - np.log((cb[w] + 0.5) / (nb - cb[w] + 0.5)))
        z = d / np.sqrt(1 / (ca[w] + 0.5) + 1 / (cb[w] + 0.5))
        assert out.loc[w, "delta"] == round(float(d), 6)
        assert out.loc[w, "z"] == round(float(z), 6)
        assert out.loc[w, "n_a"] == ca[w] and out.loc[w, "n_b"] == cb[w]
    assert out.loc["zonly", "z"] > 2
    assert out.loc["bonly", "z"] < -2


def test_source_keywords_vs_brute(ray_session):
    """Top-k by TF-IDF == a Counter brute with the same rounded-score
    + smallest-token tie rule; a token unique to one group dominates
    that group's list."""
    import math
    from collections import Counter, defaultdict

    import pyarrow as pa
    import ray.data as rd

    from netml_ray.textstats import source_keywords

    rng = np.random.default_rng(141)
    vocab = [f"w{i}" for i in range(30)]
    rows_g, rows_t = [], []
    for g in ["s1", "s2", "s3"]:
        for _ in range(40):
            toks = list(rng.choice(vocab, 20))
            if g == "s2":
                toks += ["zonly"] * 3        # unique to s2
            rows_g.append(g)
            rows_t.append(" ".join(toks))
    t = pa.table({"source": pa.array(rows_g), "text": pa.array(rows_t)})
    out = source_keywords(rd.from_arrow(t).repartition(4), "text",
                          "source", top_k=5).to_pandas()

    cnt = defaultdict(Counter)
    for g, txt in zip(rows_g, rows_t):
        cnt[g].update(txt.split())
    dfc = Counter()
    for g in cnt:
        dfc.update(set(cnt[g]))
    s = len(cnt)
    for g in cnt:
        scored = sorted(
            ((round(n * math.log(s / dfc[w]), 9), w, n)
             for w, n in cnt[g].items()),
            key=lambda x: (-x[0], x[1]))[:5]
        sub = out[out["source"] == g].sort_values(
            ["score", "w"], ascending=[False, True])
        assert len(sub) == 5
        for (sc, w, n), row in zip(scored, sub.itertuples(index=False)):
            assert (row.w, row.n) == (w, n)
            assert abs(row.score - sc) < 1e-8
    assert "zonly" in set(out[out["source"] == "s2"]["w"])


def test_gram_novelty_vs_brute(ray_session):
    """Novelty == a Counter brute over distinct doc grams; an exact
    duplicate pair has novelty 0, a unique doc novelty 1, short docs
    are excluded."""
    from collections import Counter

    import pyarrow as pa
    import ray.data as rd

    from netml_ray.textstats import gram_novelty

    texts = ["a b c d e",           # shares nothing -> novelty 1
             "x y z w",             # dup of next -> 0
             "x y z w",
             "a b c q r",           # shares 'a b c' with doc 0
             "one two"]             # < 3 tokens -> excluded
    t = pa.table({"doc_id": pa.array(range(5), type=pa.int64()),
                  "text": pa.array(texts)})
    out = gram_novelty(rd.from_arrow(t).repartition(3), "text",
                       "doc_id").to_pandas().set_index("doc_id") \
        .sort_index()
    assert list(out.index) == [0, 1, 2, 3]
    df = Counter()
    sets = {}
    for i, s in enumerate(texts):
        w = s.split()
        if len(w) < 3:
            continue
        gs = {tuple(w[j:j + 3]) for j in range(len(w) - 2)}
        sets[i] = gs
        df.update(gs)
    for i, gs in sets.items():
        novel = sum(1 for g in gs if df[g] == 1)
        assert out.loc[i, "n_grams"] == len(gs)
        assert out.loc[i, "n_novel"] == novel
    assert out.loc[1, "novelty"] == 0.0
    assert out.loc[2, "novelty"] == 0.0
    assert out.loc[0, "novelty"] < 1.0          # shares 'a b c'


def test_sparse_cosine_pairs_vs_brute(ray_session):
    """sparse cosine over a synthetic sparse rep matches a dense
    numpy cosine restricted to pairs with shared terms."""
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.textstats import sparse_cosine_pairs

    rng = np.random.default_rng(6)
    n_docs, n_terms, k = 80, 30, 4
    rows = []
    for d in range(n_docs):
        for t_ in rng.choice(n_terms, k, replace=False):
            rows.append((d, f"t{t_}", float(rng.uniform(0.5, 3.0))))
    rep = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "term": pa.array([r[1] for r in rows]),
        "tfidf": pa.array([r[2] for r in rows])})
    out = sparse_cosine_pairs(rd.from_arrow(rep).repartition(4)) \
        .to_pandas()
    # dense brute
    m = np.zeros((n_docs, n_terms))
    for d, t_, w in rows:
        m[d, int(t_[1:])] = np.round(w, 9)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    dot = mn @ mn.T
    got = {(r.id_a, r.id_b): r.cos for r in out.itertuples()}
    for (a, b), c in got.items():
        assert abs(c - dot[a, b]) < 1e-8
    # every shared-term pair present
    for a in range(n_docs):
        for b in range(a + 1, n_docs):
            if (m[a] * m[b]).sum() > 0:
                assert (a, b) in got
    assert all(c > 0 for c in got.values())


def test_trigram_sb_bits_vs_brute(ray_session):
    """stupid-backoff bits match a dict-based brute scorer on a tiny
    corpus exercising all three backoff tiers."""
    import math
    from collections import Counter

    import pyarrow as pa
    import ray.data as rd

    from netml_ray.textstats import trigram_sb_bits

    docs = ["a b c a b d", "a b c e", "x y", "q", "",
            "c a b c a b"]
    t = pa.table({"doc_id": pa.array(np.arange(6, dtype=np.int64)),
                  "text": pa.array(docs)})
    out = trigram_sb_bits(rd.from_arrow(t).repartition(3)) \
        .to_pandas().set_index("doc_id").sort_index()

    toks = [d.split() for d in docs if d]
    c1 = Counter(w for ws in toks for w in ws)
    c2 = Counter((ws[i], ws[i + 1]) for ws in toks
                 for i in range(len(ws) - 1))
    c3 = Counter((ws[i], ws[i + 1], ws[i + 2]) for ws in toks
                 for i in range(len(ws) - 2))
    T = sum(c1.values())

    def s(w1, w2, w3):
        if c3[(w1, w2, w3)]:
            return math.log2(c3[(w1, w2, w3)] / c2[(w1, w2)])
        if c2[(w2, w3)]:
            return math.log2(0.4 * c2[(w2, w3)] / c1[w2])
        return math.log2(0.4 * 0.4 * c1[w3] / T)

    for d, txt in enumerate(docs):
        ws = txt.split()
        tris = [(ws[i], ws[i + 1], ws[i + 2])
                for i in range(len(ws) - 2)]
        assert out.loc[d, "n_trigrams"] == len(tris)
        if tris:
            exp = -sum(s(*g) for g in tris) / len(tris)
            assert abs(out.loc[d, "sb_bits"] - exp) < 1e-9
        else:
            assert np.isnan(out.loc[d, "sb_bits"])


def test_stupid_backoff_tiers(ray_session):
    """Held-out trigrams exercise tiers 2 and 3 of the backoff (the
    self-trained corpus query only ever hits tier 1)."""
    import math

    from netml_ray.textstats import (_GOLD, _StupidBackoffModel,
                                     _hash_strings)

    kinds, codes, ns = [], [], []

    def add(kind, words, n):
        h = _hash_strings(list(words))
        code = h[0]
        for x in h[1:]:
            code = code * _GOLD + x
        kinds.append(kind)
        codes.append(int(code.view(np.int64) if hasattr(code, "view")
                         else np.uint64(code).view(np.int64)))
        ns.append(n)

    for w, n in [("a", 4), ("b", 3), ("c", 2), ("d", 1)]:
        add(1, [w], n)
    add(2, ["a", "b"], 2)
    add(2, ["b", "c"], 2)
    add(3, ["a", "b", "c"], 1)
    m = _StupidBackoffModel(np.array(kinds, np.int8),
                            np.array(codes, np.int64),
                            np.array(ns, np.int64))

    def lp(w1, w2, w3):
        h = _hash_strings([w1, w2, w3])
        return float(m.logp2(h[0:1], h[1:2], h[2:3])[0])

    assert abs(lp("a", "b", "c") - math.log2(1 / 2)) < 1e-12   # tier 1
    assert abs(lp("d", "b", "c") - math.log2(0.4 * 2 / 3)) < 1e-12  # tier 2
    assert abs(lp("c", "d", "a") - math.log2(0.16 * 4 / 10)) < 1e-12  # tier 3
