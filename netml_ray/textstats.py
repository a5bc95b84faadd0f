"""Corpus-statistics text scorers: bigram-LM perplexity and TF-IDF.

Both operators follow the same two-phase shape, which is the 100-TB
pattern for any "score each doc against a corpus-wide statistic":

  phase 1  one narrow count shuffle — per-batch PARTIAL counts (the
           map-side combine) → ``groupby.sum`` over (gram) keys, so
           the exchange carries one row per distinct gram per batch,
           never per occurrence;
  phase 2  the count table broadcasts once (``ray.put``, fetched per
           actor in ``__init__``) and a vectorized ``map_batches``
           pass scores every doc with numpy searchsorted lookups — no
           per-row Python, no second shuffle.

At web scale the count table must be pruned to stay broadcastable:
``min_count`` / ``min_df`` drop the long tail (a gram seen < N times
carries no usable signal for either op), which is the standard CCNet /
heavy-hitters treatment.  The prune happens BEFORE the driver collect,
inside the aggregation output, so driver memory is bounded by the
pruned vocabulary, not the corpus.

The bigram LM is the CCNet-style quality signal (Wenzek et al. 2020
"CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
Data" — there a KenLM 5-gram; here an add-alpha bigram model trained
on the corpus itself, which keeps the operator dependency-free and
exactly reproducible in SQL).  Scoring: for doc tokens w_1..w_m,

    bits(doc) = -(1/(m-1)) * sum_i log2( (c(w_{i-1}, w_i) + a)
                                         / (c(w_{i-1} *) + a * V) )

with c(w *) = sum of bigram counts starting at w (so the model is ONE
table) and V = distinct token count of the corpus.  High bits = the
doc is unlike the corpus (gibberish / boilerplate outliers).

TF-IDF: score(d, t) = tf(d, t) * (ln((N + 1) / (df(t) + 1)) + 1)
(the smoothed-idf variant that never divides by zero), top-k terms
per doc with the deterministic tiebreak (score desc, term asc).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["bigram_counts", "bigram_lm_bits", "bm25_scores",
           "doc_frequency", "tfidf_top_terms"]


def _tokens_and_bounds(col) -> tuple[list[str], np.ndarray]:
    """(flat token list, per-doc token counts) for a string column.
    Python ``str.split`` per doc (C loop, L1-resident) — on this class
    of string workload it beats whole-buffer vectorization (see
    NOTES.md bandwidth gotcha); the downstream math is all numpy."""
    toks: list[str] = []
    counts = np.empty(len(col), dtype=np.int64)
    for i, s in enumerate(col.to_pylist()):
        t = s.split() if s else []
        counts[i] = len(t)
        toks.extend(t)
    return toks, counts


# ---------------------------------------------------------------------------
# bigram LM
# ---------------------------------------------------------------------------

def bigram_counts(ds, *, text_col: str = "text", min_count: int = 1,
                  with_vocab: bool = False):
    """Corpus bigram counts ``(w1, w2, n)`` — partial per-batch counts,
    one narrow groupby exchange, rows with ``n < min_count`` dropped
    inside the aggregation output (the broadcastability prune).

    ``with_vocab=True`` fuses the distinct-token count into the SAME
    pass/exchange (unigram presence rows ride along tagged with
    ``kind=0``; bigrams are ``kind=1``) and returns
    ``(bigram_table_ds, vocab_size)`` — one corpus read instead of a
    separate ``doc_frequency`` pass."""
    from ray.data.aggregate import Sum

    def _partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        vocab: set = set()
        for s in t[text_col].to_pylist():
            w = s.split() if s else []
            c.update(zip(w, w[1:]))
            if with_vocab:
                vocab.update(w)
        kinds, w1s, w2s, ns = [], [], [], []
        for (a, b), n in c.items():
            kinds.append(1)
            w1s.append(a)
            w2s.append(b)
            ns.append(n)
        if with_vocab:
            for w in vocab:
                kinds.append(0)
                w1s.append(w)
                w2s.append("")
                ns.append(1)
        return pa.table({"kind": pa.array(kinds, type=pa.int8()),
                         "w1": pa.array(w1s, type=pa.string()),
                         "w2": pa.array(w2s, type=pa.string()),
                         "n": pa.array(ns, type=pa.int64())})

    agg = (ds.map_batches(_partial, batch_format="pyarrow")
           .groupby(["kind", "w1", "w2"])
           .aggregate(Sum("n", alias_name="n")).materialize())
    grams = agg.filter(expr="kind == 1")
    if min_count > 1:
        grams = grams.filter(expr=f"n >= {min_count}")
    grams = grams.drop_columns(["kind"])
    if not with_vocab:
        return grams
    return grams, agg.filter(expr="kind == 0").count()


class _BigramModel:
    """Broadcast-side model: sorted vocab + sorted bigram codes, all
    lookups via ``np.searchsorted`` (fully vectorized scoring)."""

    def __init__(self, w1: np.ndarray, w2: np.ndarray, n: np.ndarray,
                 vocab_size: int, alpha: float):
        self.vocab = np.unique(np.r_[w1, w2])
        v = len(self.vocab)
        i1 = np.searchsorted(self.vocab, w1)
        i2 = np.searchsorted(self.vocab, w2)
        code = i1.astype(np.int64) * v + i2
        order = np.argsort(code)
        self.codes = code[order]
        self.counts = n[order].astype(np.float64)
        # c(w ·) = sum of bigram counts starting at w — ONE table model
        self.ctx = np.zeros(v, dtype=np.float64)
        np.add.at(self.ctx, i1, n.astype(np.float64))
        self.V = float(vocab_size)
        self.alpha = float(alpha)

    def ids(self, tokens: list[str]) -> np.ndarray:
        """vocab ids, -1 for OOV (never seen in any bigram)."""
        if not tokens:
            return np.empty(0, dtype=np.int64)
        if not len(self.vocab):
            return np.full(len(tokens), -1, dtype=np.int64)
        arr = np.asarray(tokens, dtype=object)
        pos = np.searchsorted(self.vocab, arr)
        pos_c = np.clip(pos, 0, len(self.vocab) - 1)
        ok = self.vocab[pos_c] == arr
        return np.where(ok, pos_c, -1).astype(np.int64)

    def logp2(self, ids: np.ndarray, valid: np.ndarray) -> np.ndarray:
        """log2 P(w2 | w1) for consecutive-token pairs; ``valid`` marks
        pairs that belong to the same doc."""
        v = len(self.vocab)
        i1, i2 = ids[:-1], ids[1:]
        if not len(self.codes) or not v:
            cb = np.zeros(len(i1), dtype=np.float64)
            cu = np.zeros(len(i1), dtype=np.float64)
        else:
            code = np.where((i1 >= 0) & (i2 >= 0), i1 * v + i2, np.int64(-1))
            pos = np.searchsorted(self.codes, code)
            pos_c = np.clip(pos, 0, len(self.codes) - 1)
            cb = np.where((self.codes[pos_c] == code) & (code >= 0),
                          self.counts[pos_c], 0.0)
            cu = np.where(i1 >= 0, self.ctx[np.clip(i1, 0, v - 1)], 0.0)
        out = np.log2((cb + self.alpha) / (cu + self.alpha * self.V))
        return np.where(valid, out, 0.0)


def bigram_lm_bits(ds, *, text_col: str = "text", id_col: str = "doc_id",
                   alpha: float = 0.5, min_count: int = 1,
                   counts=None, vocab_size: int | None = None):
    """Per-doc bigram-LM score ``(id, n_bigrams, lm_bits)`` where
    ``lm_bits`` is average -log2 P per bigram (NULL when the doc has
    fewer than 2 tokens).  ``counts`` / ``vocab_size`` inject a model
    trained elsewhere (train-on-clean-subset, score-everything — the
    CCNet deployment shape); by default both come from ``ds`` itself.
    """
    import ray

    from netml_ray.partition import _collect_table, auto_concurrency

    if counts is None and vocab_size is None:
        # fused: ONE corpus pass + ONE exchange yields both the bigram
        # table and the distinct-token count
        counts, vocab_size = bigram_counts(ds, text_col=text_col,
                                           min_count=min_count,
                                           with_vocab=True)
    elif counts is None:
        counts = bigram_counts(ds, text_col=text_col, min_count=min_count)
    ct = _collect_table(counts.materialize(),
                        pa.schema([("w1", pa.string()), ("w2", pa.string()),
                                   ("n", pa.int64())]))
    if vocab_size is None:
        # V = distinct corpus tokens = rows of the df table (one narrow
        # count exchange; never a driver token collect)
        vocab_size = doc_frequency(ds, text_col=text_col).count()
    model_ref = ray.put(_BigramModel(
        np.asarray(ct["w1"].to_pylist(), dtype=object),
        np.asarray(ct["w2"].to_pylist(), dtype=object),
        ct["n"].to_numpy(), vocab_size, alpha))

    class _Score:
        def __init__(self):
            self.m: _BigramModel = ray.get(model_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            toks, counts = _tokens_and_bounds(t[text_col])
            ids = self.m.ids(toks)
            bounds = np.r_[0, np.cumsum(counts)]
            # pair i is (tok[i], tok[i+1]); valid unless tok[i] is some
            # doc's last token
            valid = np.ones(max(len(toks) - 1, 0), dtype=bool)
            last = bounds[1:] - 1
            last = last[(last >= 0) & (last < len(valid))]
            valid[last] = False
            lp = self.m.logp2(ids, valid)
            nbg = np.maximum(counts - 1, 0)
            # per-doc sums via reduceat (independent left-to-right
            # segment sums — identical docs score BIT-identically,
            # which a csum-prefix difference does not guarantee).
            # Segments run to the next pair-bearing doc's start; the
            # positions in between are crossing pairs (valid=False →
            # lp=0), so they never contribute.
            doc_sum = np.zeros(len(counts), dtype=np.float64)
            has = nbg > 0
            if has.any() and len(lp):
                doc_sum[has] = np.add.reduceat(lp, bounds[:-1][has])
            bits = np.where(nbg > 0, -doc_sum / np.maximum(nbg, 1), np.nan)
            return pa.table({
                id_col: t[id_col],
                "n_bigrams": pa.array(nbg),
                "lm_bits": pa.array(
                    [None if not np.isfinite(x) else float(x) for x in bits],
                    type=pa.float64()),
            })

    return ds.map_batches(_Score, batch_format="pyarrow",
                          concurrency=auto_concurrency())


# ---------------------------------------------------------------------------
# TF-IDF
# ---------------------------------------------------------------------------

def doc_frequency(ds, *, text_col: str = "text", min_df: int = 1):
    """``(token, df)`` = number of docs containing each token — partial
    per-batch doc-set counts → one narrow groupby exchange."""
    from ray.data.aggregate import Sum

    def _partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for s in t[text_col].to_pylist():
            c.update(set(s.split()) if s else ())
        if not c:
            return pa.table({"token": pa.array([], type=pa.string()),
                             "df": pa.array([], type=pa.int64())})
        toks, ns = zip(*c.items())
        return pa.table({"token": pa.array(list(toks), type=pa.string()),
                         "df": pa.array(list(ns), type=pa.int64())})

    agg = (ds.map_batches(_partial, batch_format="pyarrow")
           .groupby("token").aggregate(Sum("df", alias_name="df")))
    if min_df > 1:
        agg = agg.filter(expr=f"df >= {min_df}")
    return agg


def bm25_scores(ds, terms, *, text_col: str = "text",
                id_col: str = "doc_id", k1: float = 1.5, b: float = 0.75):
    """BM25 relevance of every doc against a small query-term set
    (Robertson/Sparck Jones; the Lucene ``ln(1 + (N-df+.5)/(df+.5))``
    idf variant).  Returns ``(id, bm25)`` for docs matching at least
    one term — rank with ``.sort(descending)`` + ``limit`` downstream.

    Corpus statistics (per-term df, N, average doc length) come from
    one narrow partial pass each; the per-term df partial only emits
    the QUERY terms, so the exchange is O(terms × batches) however
    large the corpus vocabulary is.  Scoring is one broadcast-model
    ``map_batches`` pass: per term a vectorized membership mask +
    ``bincount`` tf — no per-row Python beyond the tokenizing split.
    """
    import ray
    from ray.data.aggregate import Sum

    from netml_ray.partition import auto_concurrency

    terms = sorted(set(terms))
    if not terms:
        raise ValueError("terms must be non-empty")
    ds = ds.materialize()
    n_docs = ds.count()
    tset = tuple(terms)

    def _stats_partial(t: pa.Table) -> pa.Table:
        # per-batch: doc-length sum + per-query-term df partials
        from collections import Counter

        c: Counter = Counter()
        dl_sum = 0
        for s in t[text_col].to_pylist():
            w = s.split() if s else []
            dl_sum += len(w)
            ws = set(w)
            for q in tset:
                if q in ws:
                    c[q] += 1
        return pa.table({
            "term": pa.array(list(tset) + ["\x00dl"], type=pa.string()),
            "n": pa.array([c.get(q, 0) for q in tset] + [dl_sum],
                          type=pa.int64())})

    stats = (ds.map_batches(_stats_partial, batch_format="pyarrow")
             .groupby("term").aggregate(Sum("n", alias_name="n"))
             .to_pandas())
    smap = dict(zip(stats["term"], stats["n"]))
    avgdl = smap.pop("\x00dl", 0) / max(n_docs, 1)
    idf = np.array([np.log(1.0 + (n_docs - smap.get(q, 0) + 0.5)
                           / (smap.get(q, 0) + 0.5)) for q in tset])
    model_ref = ray.put((tset, idf, float(avgdl), float(k1), float(b)))

    class _Score:
        def __init__(self):
            (self.terms, self.idf, self.avgdl,
             self.k1, self.b) = ray.get(model_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            toks, counts = _tokens_and_bounds(t[text_col])
            empty = pa.table({
                id_col: pa.array([], type=t.schema.field(id_col).type),
                "bm25": pa.array([], type=pa.float64())})
            if not toks:
                return empty
            arr = np.asarray(toks, dtype=object)
            doc_ix = np.repeat(np.arange(len(counts)), counts)
            dl = counts.astype(np.float64)
            denom_dl = self.k1 * (1.0 - self.b
                                  + self.b * dl / (self.avgdl or 1.0))
            score = np.zeros(len(counts), dtype=np.float64)
            for qi, q in enumerate(self.terms):
                tf = np.bincount(doc_ix[arr == q],
                                 minlength=len(counts)).astype(np.float64)
                score += self.idf[qi] * (tf * (self.k1 + 1.0)
                                         / (tf + denom_dl))
            hit = score > 0.0
            if not hit.any():
                return empty
            return pa.table({
                id_col: t[id_col].take(pa.array(np.flatnonzero(hit))),
                "bm25": pa.array(score[hit], type=pa.float64())})

    return ds.map_batches(_Score, batch_format="pyarrow",
                          concurrency=auto_concurrency())


def tfidf_top_terms(ds, *, text_col: str = "text", id_col: str = "doc_id",
                    k: int = 5, min_df: int = 1, n_docs: int | None = None):
    """Top-``k`` TF-IDF terms per doc: ``(id, term, tf, tfidf)``,
    deterministic tiebreak (tfidf desc, term asc).  The df table is
    broadcast (prune with ``min_df`` at web scale); scoring is one
    vectorized pass — per-batch lexsort over (doc, -score, term) and a
    rank-within-run take, no per-row Python."""
    import ray

    from netml_ray.partition import _collect_table, auto_concurrency

    ds = ds.materialize()
    if n_docs is None:
        n_docs = ds.count()
    dft = _collect_table(doc_frequency(ds, text_col=text_col,
                                       min_df=min_df).materialize(),
                         pa.schema([("token", pa.string()),
                                    ("df", pa.int64())]))
    vocab = np.asarray(dft["token"].to_pylist(), dtype=object)
    order = np.argsort(vocab)
    vocab = vocab[order]
    idf = (np.log((n_docs + 1.0) / (dft["df"].to_numpy()[order] + 1.0))
           + 1.0)
    model_ref = ray.put((vocab, idf))

    class _Score:
        def __init__(self):
            self.vocab, self.idf = ray.get(model_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            toks, counts = _tokens_and_bounds(t[text_col])
            empty = pa.table({
                id_col: pa.array([], type=t.schema.field(id_col).type),
                "term": pa.array([], type=pa.string()),
                "tf": pa.array([], type=pa.int64()),
                "tfidf": pa.array([], type=pa.float64())})
            if not toks or not len(self.vocab):
                return empty
            arr = np.asarray(toks, dtype=object)
            doc_ix = np.repeat(np.arange(len(counts)), counts)
            pos = np.searchsorted(self.vocab, arr)
            pos_c = np.clip(pos, 0, len(self.vocab) - 1)
            ok = self.vocab[pos_c] == arr
            doc_ix, vid = doc_ix[ok], pos_c[ok]
            if not len(vid):
                return empty
            # tf per (doc, token): sort by combined code, run-length
            code = doc_ix * np.int64(len(self.vocab)) + vid
            code.sort()
            starts = np.flatnonzero(np.r_[True, code[1:] != code[:-1]])
            tf = np.diff(np.r_[starts, len(code)]).astype(np.int64)
            u_doc, u_vid = np.divmod(code[starts], len(self.vocab))
            score = tf * self.idf[u_vid]
            # rank within doc by (-score, term): lexsort is stable so
            # sort terms first, then -score, then doc
            ordr = np.lexsort((self.vocab[u_vid], -score, u_doc))
            d_sorted = u_doc[ordr]
            run_start = np.flatnonzero(
                np.r_[True, d_sorted[1:] != d_sorted[:-1]])
            rank = np.arange(len(ordr)) - np.repeat(
                run_start, np.diff(np.r_[run_start, len(ordr)]))
            take = ordr[rank < k]
            ids = t[id_col].take(pa.array(u_doc[take]))
            return pa.table({
                id_col: ids,
                "term": pa.array(list(self.vocab[u_vid[take]]),
                                 type=pa.string()),
                "tf": pa.array(tf[take]),
                "tfidf": pa.array(score[take], type=pa.float64()),
            })

    return ds.map_batches(_Score, batch_format="pyarrow",
                          concurrency=auto_concurrency())
