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
import pyarrow.compute as pc

__all__ = ["bigram_counts", "bigram_lm_bits", "bm25_scores",
           "doc_frequency", "logodds_tokens", "pmi_collocations",
           "readability_profile", "rrf_fuse", "source_divergence",
           "tfidf_top_terms", "vocab_richness", "source_keywords",
           "gram_novelty"]


def _tok(col):
    """Dictionary-encoded batch tokenization (``textops.Tokenized``):
    all per-WORD work downstream happens on the SMALL dictionary and
    is broadcast to the token stream by an int-code gather.  This is
    the fix for the first version of these ops, whose object-dtype
    ``searchsorted`` over every token (plus per-doc Counter loops)
    measured ~20x slower at 500k docs."""
    from netml_ray.textops import Tokenized

    return Tokenized(col)


def _dict_strings(tok) -> np.ndarray:
    return np.asarray(tok.dictionary.to_pylist(), dtype=object)


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

    def _partial(t: pa.Table) -> pa.Table:
        tok = _tok(t[text_col])
        live = tok.n_words[tok.rowid] > 0     # drop empty-row '' tokens
        codes, rowid = tok.codes[live], tok.rowid[live]
        d = max(len(tok.dictionary), 1)
        empty = pa.table({"kind": pa.array([], type=pa.int8()),
                          "w1": pa.array([], type=pa.string()),
                          "w2": pa.array([], type=pa.string()),
                          "n": pa.array([], type=pa.int64())})
        if not len(codes):
            return empty
        same = rowid[1:] == rowid[:-1]
        pair = codes[:-1][same] * d + codes[1:][same]
        u, n = (np.unique(pair, return_counts=True) if len(pair)
                else (np.empty(0, dtype=np.int64),
                      np.empty(0, dtype=np.int64)))
        w1 = tok.dictionary.take(pa.array(u // d))
        w2 = tok.dictionary.take(pa.array(u % d))
        out = pa.table({
            "kind": pa.array(np.ones(len(u), dtype=np.int8)),
            "w1": w1.cast(pa.string()), "w2": w2.cast(pa.string()),
            "n": pa.array(n.astype(np.int64))})
        if with_vocab:
            uc = np.unique(codes)
            voc = pa.table({
                "kind": pa.array(np.zeros(len(uc), dtype=np.int8)),
                "w1": tok.dictionary.take(pa.array(uc)).cast(pa.string()),
                "w2": pa.array([""] * len(uc), type=pa.string()),
                "n": pa.array(np.ones(len(uc), dtype=np.int64))})
            out = pa.concat_tables([out, voc])
        return out

    def _combine(t: pa.Table) -> pa.Table:
        # Arrow's C++ hash group-by inside one hash partition (keyed on
        # w1, so every (kind, w1, w2) group is partition-local) — same
        # treatment that took the int64 path off Ray's sort-based
        # groupby (~60 s of an 87 s total at 500k docs was the
        # sort/sample machinery, r4 verdict wrong-#2 / queue #2)
        out = (t.select(["kind", "w1", "w2", "n"])
               .group_by(["kind", "w1", "w2"]).aggregate([("n", "sum")]))
        return out.rename_columns(["kind", "w1", "w2", "n"])

    from netml_ray.partition import partition_map

    agg = partition_map(ds.map_batches(_partial, batch_format="pyarrow"),
                        "w1", _combine).materialize()
    grams = agg.filter(expr="kind == 1")
    if min_count > 1:
        grams = grams.filter(expr=f"n >= {min_count}")
    grams = grams.drop_columns(["kind"])
    if not with_vocab:
        return grams
    return grams, agg.filter(expr="kind == 0").count()


_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _hash_strings(words) -> np.ndarray:
    """64-bit word hashes for a python string iterable — EXACTLY the
    hash ``Tokenized.word_hashes`` assigns, so string-keyed injected
    count tables interoperate with the hash-keyed model."""
    from netml_ray.textops import _rolling_hash_segments, _utf8_segments

    col = pa.array(list(words), type=pa.string())
    data, offs = _utf8_segments(col)
    return _rolling_hash_segments(data, offs)


def _bigram_hash_counts(ds, *, text_col: str, min_count: int):
    """Hash-keyed bigram counts: per-batch partial ``(code, h1, n)``
    rows where ``code = h1·GOLD + h2`` (mod 2⁶⁴) — the exchange
    carries three int64 columns however large the string vocabulary
    is (the string-keyed variant measured 87 s vs ~15 s at 500k docs /
    780k-token vocab: sort-based shuffles over wide string keys are
    bandwidth-bound).  Returns ``(grams_ds, vocab_size)``; the
    distinct-token count rides the same exchange as ``kind=0`` rows.
    64-bit collisions are negligible at any realistic vocab (same
    precedent as the n-gram decontamination hashes)."""
    from ray.data.aggregate import Sum

    def _partial(t: pa.Table) -> pa.Table:
        tok = _tok(t[text_col])
        live = tok.n_words[tok.rowid] > 0
        wh = tok.word_hashes()[live]
        rowid = tok.rowid[live]
        if not len(wh):
            return pa.table({"kind": pa.array([], type=pa.int8()),
                             "code": pa.array([], type=pa.int64()),
                             "h1": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        same = rowid[1:] == rowid[:-1]
        h1 = wh[:-1][same]
        h2 = wh[1:][same]
        code = (h1 * _GOLD + h2).view(np.int64)
        u, first, n = (np.unique(code, return_index=True,
                                 return_counts=True) if len(code)
                       else (np.empty(0, np.int64), np.empty(0, np.int64),
                             np.empty(0, np.int64)))
        uh = np.unique(wh).view(np.int64)
        return pa.table({
            "kind": pa.array(np.r_[np.ones(len(u), dtype=np.int8),
                                   np.zeros(len(uh), dtype=np.int8)]),
            "code": pa.array(np.r_[u, uh]),
            "h1": pa.array(np.r_[h1[first].view(np.int64), uh]),
            "n": pa.array(np.r_[n, np.ones(len(uh))].astype(np.int64)),
        })

    from netml_ray.partition import partition_map

    def _combine(t: pa.Table) -> pa.Table:
        kind = t["kind"].to_numpy()
        code = t["code"].to_numpy()
        h1 = t["h1"].to_numpy()
        n = t["n"].to_numpy()
        order = np.lexsort((code, kind))
        k, c, h, nn = kind[order], code[order], h1[order], n[order]
        first = np.r_[True, (k[1:] != k[:-1]) | (c[1:] != c[:-1])]
        starts = np.flatnonzero(first)
        return pa.table({"kind": pa.array(k[starts]),
                         "code": pa.array(c[starts]),
                         "h1": pa.array(h[starts]),
                         "n": pa.array(np.add.reduceat(nn, starts)
                                       .astype(np.int64))})

    # hash-partition by code + vectorized in-partition combine: Ray's
    # sort-based groupby on the same rows measured ~60 s of the 87 s
    # string-keyed total at 500k docs — the sort/sample machinery, not
    # the bytes, was the cost
    agg = partition_map(ds.map_batches(_partial, batch_format="pyarrow"),
                        "code", _combine).materialize()
    grams = agg.filter(expr="kind == 1")
    if min_count > 1:
        grams = grams.filter(expr=f"n >= {min_count}")
    return grams.drop_columns(["kind"]), agg.filter(expr="kind == 0").count()


class _BigramModel:
    """Broadcast-side model keyed on 64-bit word hashes: sorted pair
    codes + sorted context-sum keys, every lookup an integer
    ``np.searchsorted`` (no string compares anywhere in scoring)."""

    def __init__(self, code: np.ndarray, h1: np.ndarray, n: np.ndarray,
                 vocab_size: int, alpha: float):
        order = np.argsort(code)
        self.codes = code[order]
        self.counts = n[order].astype(np.float64)
        # c(w ·) = sum of bigram counts starting at w — ONE table model
        uh, inv = np.unique(h1, return_inverse=True)
        sums = np.zeros(len(uh), dtype=np.float64)
        np.add.at(sums, inv, n.astype(np.float64))
        self.ctx_keys = uh
        self.ctx_vals = sums
        self.V = float(vocab_size)
        self.alpha = float(alpha)

    @staticmethod
    def from_strings(w1, w2, n, vocab_size, alpha) -> "_BigramModel":
        h1 = _hash_strings(w1)
        h2 = _hash_strings(w2)
        return _BigramModel(h1 * _GOLD + h2, h1, np.asarray(n),
                            vocab_size, alpha)

    def logp2(self, wh: np.ndarray, valid: np.ndarray) -> np.ndarray:
        """log2 P(w2 | w1) for consecutive-token hash pairs; ``valid``
        marks pairs inside one doc."""
        h1, h2 = wh[:-1], wh[1:]
        if not len(self.codes):
            cb = np.zeros(len(h1), dtype=np.float64)
        else:
            code = h1 * _GOLD + h2
            pos = np.searchsorted(self.codes, code)
            pos_c = np.clip(pos, 0, len(self.codes) - 1)
            cb = np.where(self.codes[pos_c] == code, self.counts[pos_c],
                          0.0)
        if not len(self.ctx_keys):
            cu = np.zeros(len(h1), dtype=np.float64)
        else:
            pos = np.searchsorted(self.ctx_keys, h1)
            pos_c = np.clip(pos, 0, len(self.ctx_keys) - 1)
            cu = np.where(self.ctx_keys[pos_c] == h1,
                          self.ctx_vals[pos_c], 0.0)
        out = np.log2((cb + self.alpha) / (cu + self.alpha * self.V))
        return np.where(valid, out, 0.0)


def train_bigram_model(ds, *, text_col: str = "text", alpha: float = 0.5,
                       min_count: int = 1, counts=None,
                       vocab_size: int | None = None) -> "_BigramModel":
    """Train (or wrap an injected count table into) the broadcastable
    add-alpha bigram model — factored out of ``bigram_lm_bits`` so
    curation's optional LM-quality stage trains ONCE on the raw corpus
    and scores the surviving stream (the CCNet deployment shape)."""
    from netml_ray.partition import _collect_table

    if counts is None:
        # fused hash-keyed pipeline: ONE corpus pass + ONE narrow int64
        # exchange yields both the bigram table and the distinct-token
        # count (see _bigram_hash_counts for why not strings)
        grams, vs = _bigram_hash_counts(ds, text_col=text_col,
                                        min_count=min_count)
        if vocab_size is None:
            vocab_size = vs
        gt = _collect_table(grams.materialize(),
                            pa.schema([("code", pa.int64()),
                                       ("h1", pa.int64()),
                                       ("n", pa.int64())]))
        model = _BigramModel(gt["code"].to_numpy().view(np.uint64),
                             gt["h1"].to_numpy().view(np.uint64),
                             gt["n"].to_numpy(), vocab_size, alpha)
    else:
        # injected string-keyed count table (train-on-clean shape)
        ct = _collect_table(counts.materialize(),
                            pa.schema([("w1", pa.string()),
                                       ("w2", pa.string()),
                                       ("n", pa.int64())]))
        if vocab_size is None:
            vocab_size = doc_frequency(ds, text_col=text_col).count()
        model = _BigramModel.from_strings(
            ct["w1"].to_pylist(), ct["w2"].to_pylist(),
            ct["n"].to_numpy(), vocab_size, alpha)
    return model


def lm_bits_arrays(m: "_BigramModel", col) -> tuple[np.ndarray, np.ndarray]:
    """Per-row (n_bigrams, lm_bits) for a text column under a trained
    model — the shared scoring kernel of ``bigram_lm_bits`` and
    curation's LM-quality filter.  ``lm_bits`` is NaN for rows with
    fewer than 2 tokens."""
    tok = _tok(col)
    counts = tok.n_words
    wh = tok.word_hashes()
    # pair i is (tok[i], tok[i+1]); valid only within one row
    valid = (tok.rowid[1:] == tok.rowid[:-1]
             if len(tok.rowid) else np.zeros(0, dtype=bool))
    lp = m.logp2(wh, valid)
    nbg = np.maximum(counts - 1, 0)
    # per-doc sums via reduceat (independent left-to-right segment
    # sums — identical docs score BIT-identically, which a csum-prefix
    # difference does not guarantee).  Segments run to the next
    # pair-bearing doc's start; the positions in between are crossing
    # pairs (valid=False → lp=0), so they never contribute.
    doc_sum = np.zeros(len(counts), dtype=np.float64)
    has = nbg > 0
    if has.any() and len(lp):
        doc_sum[has] = np.add.reduceat(lp, tok.offsets[:-1][has])
    bits = np.where(nbg > 0, -doc_sum / np.maximum(nbg, 1), np.nan)
    return nbg, bits


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

    from netml_ray.partition import auto_concurrency

    model = train_bigram_model(ds, text_col=text_col, alpha=alpha,
                               min_count=min_count, counts=counts,
                               vocab_size=vocab_size)
    model_ref = ray.put(model)

    class _Score:
        def __init__(self):
            self.m: _BigramModel = ray.get(model_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            nbg, bits = lm_bits_arrays(self.m, t[text_col])
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
        tok = _tok(t[text_col])
        live = tok.n_words[tok.rowid] > 0
        codes, rowid = tok.codes[live], tok.rowid[live]
        if not len(codes):
            return pa.table({"token": pa.array([], type=pa.string()),
                             "df": pa.array([], type=pa.int64())})
        d = len(tok.dictionary)
        pres = np.unique(rowid * np.int64(d) + codes)   # (doc, token)
        u, dfc = np.unique(pres % d, return_counts=True)
        return pa.table({
            "token": tok.dictionary.take(pa.array(u)).cast(pa.string()),
            "df": pa.array(dfc.astype(np.int64))})

    from netml_ray.partition import partition_map

    def _combine(t: pa.Table) -> pa.Table:
        # in-partition sum per token: Arrow dictionary-encode (C++
        # hash) + reduceat — no python string handling, no Ray sort
        enc = pc.dictionary_encode(t["token"].combine_chunks())
        codes = enc.indices.to_numpy()
        df = t["df"].to_numpy()
        order = np.argsort(codes, kind="stable")
        c, d = codes[order], df[order]
        starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
        return pa.table({
            "token": enc.dictionary.take(pa.array(c[starts]))
            .cast(pa.string()),
            "df": pa.array(np.add.reduceat(d, starts).astype(np.int64))})

    agg = partition_map(ds.map_batches(_partial, batch_format="pyarrow"),
                        "token", _combine)
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
        # per-batch: doc-length sum + per-query-term df partials;
        # terms resolve against the small batch dictionary, membership
        # is an int-code compare over the stream
        tok = _tok(t[text_col])
        live = tok.n_words[tok.rowid] > 0
        codes, rowid = tok.codes[live], tok.rowid[live]
        dmap = {w: i for i, w in enumerate(_dict_strings(tok))}
        dfs = []
        for q in tset:
            code = dmap.get(q)
            dfs.append(0 if code is None or not len(codes)
                       else int(np.unique(rowid[codes == code]).size))
        return pa.table({
            "term": pa.array(list(tset) + ["\x00dl"], type=pa.string()),
            "n": pa.array(dfs + [int(tok.n_words.sum())],
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
            tok = _tok(t[text_col])
            empty = pa.table({
                id_col: pa.array([], type=t.schema.field(id_col).type),
                "bm25": pa.array([], type=pa.float64())})
            if not len(tok.codes):
                return empty
            dmap = {w: i for i, w in enumerate(_dict_strings(tok))}
            live = tok.n_words[tok.rowid] > 0
            dl = tok.n_words.astype(np.float64)
            denom_dl = self.k1 * (1.0 - self.b
                                  + self.b * dl / (self.avgdl or 1.0))
            score = np.zeros(t.num_rows, dtype=np.float64)
            for qi, q in enumerate(self.terms):
                code = dmap.get(q)
                if code is None:
                    continue
                tf = np.bincount(tok.rowid[live & (tok.codes == code)],
                                 minlength=t.num_rows).astype(np.float64)
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
            tok = _tok(t[text_col])
            empty = pa.table({
                id_col: pa.array([], type=t.schema.field(id_col).type),
                "term": pa.array([], type=pa.string()),
                "tf": pa.array([], type=pa.int64()),
                "tfidf": pa.array([], type=pa.float64())})
            if not len(tok.codes) or not len(self.vocab):
                return empty
            # dictionary → vocab-id LUT (object compares on the small
            # dictionary only, int gather for the stream)
            ds_ = _dict_strings(tok)
            pos = np.searchsorted(self.vocab, ds_)
            pos_c = np.clip(pos, 0, len(self.vocab) - 1)
            lut = np.where(self.vocab[pos_c] == ds_, pos_c, -1)
            live = tok.n_words[tok.rowid] > 0
            vid_all = lut[tok.codes]
            ok = live & (vid_all >= 0)
            doc_ix, vid = tok.rowid[ok], vid_all[ok]
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


# ---------------------------------------------------------------------------
# PMI collocations
# ---------------------------------------------------------------------------

def pmi_collocations(ds, *, text_col: str = "text", min_count: int = 5):
    """Pointwise-mutual-information collocations: every bigram with
    corpus count >= ``min_count`` scored

        pmi(w1, w2) = log2( (n12 / B) / ((n1 / T) * (n2 / T)) )

    where n12 = bigram count, n1/n2 = unigram TOKEN counts, T = total
    tokens, B = total bigrams — the word2vec-style phrase-detection
    statistic (Mikolov et al. 2013 use the same ratio with a discount;
    the discount here is the hard ``min_count`` prune).  Returns a
    Dataset ``(w1, w2, n, pmi)``; row membership is decided by integer
    counts only (no float threshold), so results are exactly
    reproducible in SQL.

    Scale shape (the module-docstring two-phase pattern): ONE narrow
    ``(kind, w1, w2, n)`` count exchange — unigram token counts ride
    along as ``kind=0`` rows, same trick as ``bigram_counts
    (with_vocab=True)`` — totals reduced from 2-doubles-per-block
    partials, and the unigram side pruned to ``n >= min_count`` before
    the driver collect.  The prune is sound for lookups: a surviving
    bigram implies both its unigrams appear >= min_count times
    (n(w) >= n(w1, w2) for either side).  The pruned unigram table
    broadcasts once; scoring is a vectorized per-batch searchsorted
    pass over the surviving bigram rows (no second shuffle).

    Reference analog: netml has no corpus statistics; this extends the
    engine's LLM-curation family (collocation mining is the standard
    preprocessing step for phrase-aware tokenization).
    """
    import ray

    from netml_ray.partition import auto_concurrency, partition_map

    empty = pa.table({"kind": pa.array([], type=pa.int8()),
                      "w1": pa.array([], type=pa.string()),
                      "w2": pa.array([], type=pa.string()),
                      "n": pa.array([], type=pa.int64())})

    def _partial(t: pa.Table) -> pa.Table:
        tok = _tok(t[text_col])
        live = tok.n_words[tok.rowid] > 0
        codes, rowid = tok.codes[live], tok.rowid[live]
        if not len(codes):
            return empty
        d = max(len(tok.dictionary), 1)
        same = rowid[1:] == rowid[:-1]
        pair = codes[:-1][same] * d + codes[1:][same]
        u, n = (np.unique(pair, return_counts=True) if len(pair)
                else (np.empty(0, dtype=np.int64),
                      np.empty(0, dtype=np.int64)))
        uu, un = np.unique(codes, return_counts=True)
        return pa.concat_tables([
            pa.table({
                "kind": pa.array(np.ones(len(u), dtype=np.int8)),
                "w1": tok.dictionary.take(pa.array(u // d)).cast(pa.string()),
                "w2": tok.dictionary.take(pa.array(u % d)).cast(pa.string()),
                "n": pa.array(n.astype(np.int64))}),
            pa.table({
                "kind": pa.array(np.zeros(len(uu), dtype=np.int8)),
                "w1": tok.dictionary.take(pa.array(uu)).cast(pa.string()),
                "w2": pa.array([""] * len(uu), type=pa.string()),
                "n": pa.array(un.astype(np.int64))}),
        ])

    def _combine(t: pa.Table) -> pa.Table:
        out = (t.select(["kind", "w1", "w2", "n"])
               .group_by(["kind", "w1", "w2"]).aggregate([("n", "sum")]))
        return out.rename_columns(["kind", "w1", "w2", "n"])

    agg = partition_map(ds.map_batches(_partial, batch_format="pyarrow"),
                        "w1", _combine).materialize()

    # totals over the UNpruned table: 2 doubles per block -> driver sum
    def _tots(t: pa.Table) -> pa.Table:
        k = t["kind"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        return pa.table({"t_uni": pa.array([int(n[k == 0].sum())]),
                         "t_bi": pa.array([int(n[k == 1].sum())])})

    rows = agg.map_batches(_tots, batch_format="pyarrow").take_all()
    T = float(sum(r["t_uni"] for r in rows))
    B = float(sum(r["t_bi"] for r in rows))

    big = (agg.filter(expr="kind == 1")
           .filter(expr=f"n >= {min_count}").drop_columns(["kind"]))
    if B == 0 or T == 0:
        return big.map_batches(
            lambda t: t.append_column(
                "pmi", pa.array([], type=pa.float64())),
            batch_format="pyarrow")

    uni = (agg.filter(expr="kind == 0")
           .filter(expr=f"n >= {min_count}")
           .select_columns(["w1", "n"]).take_all())
    words = np.asarray([r["w1"] for r in uni], dtype=object)
    cnts = np.asarray([r["n"] for r in uni], dtype=np.float64)
    order = np.argsort(words, kind="stable")
    ref = ray.put((words[order], cnts[order], T, B))

    class _Score:
        def __init__(self):
            self.words, self.cnts, self.T, self.B = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            if not t.num_rows:
                return t.append_column("pmi",
                                       pa.array([], type=pa.float64()))
            w1 = np.asarray(t["w1"].to_pylist(), dtype=object)
            w2 = np.asarray(t["w2"].to_pylist(), dtype=object)
            n12 = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
            n1 = self.cnts[np.searchsorted(self.words, w1)]
            n2 = self.cnts[np.searchsorted(self.words, w2)]
            # same expression shape as the SQL oracle
            pmi = np.log2((n12 / self.B) / ((n1 / self.T) * (n2 / self.T)))
            return t.append_column("pmi", pa.array(pmi, type=pa.float64()))

    return big.map_batches(_Score, batch_format="pyarrow",
                           concurrency=auto_concurrency())


# ---------------------------------------------------------------------------
# Flesch reading-ease profile
# ---------------------------------------------------------------------------

def readability_profile(ds, text_col: str, group_col: str, *,
                        round_to: int = 6) -> "pa.Table":
    """Per-group Flesch reading-ease profile: for each ``group_col``
    value, the doc count and the group means of the Flesch score,
    words-per-sentence and syllables-per-word.

    Flesch (1948) reading ease with fully vectorizable proxies: words
    = ``\\S+`` runs, sentences = ``max(1, [.!?]+ runs)``, syllables =
    ``[aeiouy]+`` vowel-group runs of the lowercased text (vowel runs
    never cross whitespace/punctuation, so the document-level count
    equals the per-word sum).  ``flesch = 206.835 - 1.015 * w/s -
    84.6 * y/w``; docs with zero words are excluded.

    Scale shape: ONE narrow ``map_batches`` partial pass — three RE2
    ``count_substring_regex`` kernels per batch, then an O(groups)
    partial row per batch — and a driver combine over O(groups) rows.
    No shuffle; mean-of-sums association differs from the oracle's
    sequential AVG, hence the documented round-6 hedge (same as
    ``welch_ttest``).  Recasts reference parser.py's per-flow
    readability-like summary scalars (STATS family, reference
    src/netml/pparser/parser.py:307-330) for text corpora.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def _partial(t: pa.Table) -> pa.Table:
        empty = pa.table({group_col: pa.array([], pa.string()),
                          "n": pa.array([], pa.int64()),
                          "sf": pa.array([], pa.float64()),
                          "swps": pa.array([], pa.float64()),
                          "sspw": pa.array([], pa.float64())})
        if not t.num_rows:
            return empty
        txt = t[text_col].combine_chunks() if isinstance(
            t[text_col], pa.ChunkedArray) else t[text_col]
        w = pc.count_substring_regex(txt, r"\S+").to_numpy(
            zero_copy_only=False).astype(np.float64)
        s = pc.count_substring_regex(txt, r"[.!?]+").to_numpy(
            zero_copy_only=False).astype(np.float64)
        y = pc.count_substring_regex(
            pc.utf8_lower(txt), r"[aeiouy]+").to_numpy(
            zero_copy_only=False).astype(np.float64)
        ok = w > 0
        if not ok.any():
            return empty
        w, y = w[ok], y[ok]
        s = np.maximum(s[ok], 1.0)
        wps = w / s
        spw = y / w
        fl = 206.835 - 1.015 * wps - 84.6 * spw
        g = np.asarray(t[group_col].to_pylist(), dtype=object)[ok]
        keys, inv = np.unique(g, return_inverse=True)
        return pa.table({
            group_col: pa.array(keys.tolist(), pa.string()),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
            "sf": pa.array(np.bincount(inv, weights=fl)),
            "swps": pa.array(np.bincount(inv, weights=wps)),
            "sspw": pa.array(np.bincount(inv, weights=spw)),
        })

    parts = pa.concat_tables(
        [b for b in ds.map_batches(_partial, batch_format="pyarrow")
         .iter_batches(batch_size=None, batch_format="pyarrow")],
        promote_options="none")
    g = np.asarray(parts[group_col].to_pylist(), dtype=object)
    keys, inv = np.unique(g, return_inverse=True)
    n = np.bincount(inv, weights=parts["n"].to_numpy(
        zero_copy_only=False).astype(np.float64))
    sf = np.bincount(inv, weights=parts["sf"].to_numpy(zero_copy_only=False))
    swps = np.bincount(inv, weights=parts["swps"].to_numpy(
        zero_copy_only=False))
    sspw = np.bincount(inv, weights=parts["sspw"].to_numpy(
        zero_copy_only=False))
    return pa.table({
        group_col: pa.array(keys.tolist(), pa.string()),
        "n_docs": pa.array(n.astype(np.int64)),
        "avg_flesch": pa.array(np.round(sf / n, round_to)),
        "avg_wps": pa.array(np.round(swps / n, round_to)),
        "avg_spw": pa.array(np.round(sspw / n, round_to)),
    })


# ---------------------------------------------------------------------------
# Per-group vocabulary richness
# ---------------------------------------------------------------------------

def _group_token_partial(t: pa.Table, text_col: str,
                         group_col: str) -> pa.Table:
    """Shared per-batch (group, token, n) count partial: dictionary-
    encoded tokens x dictionary-encoded group, ONE combined bincount;
    the exchange downstream carries distinct pairs, never the token
    stream (vocab_richness / source_keywords)."""
    import numpy as np

    from netml_ray.textops import Tokenized

    empty = pa.table({group_col: pa.array([], pa.string()),
                      "w": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})
    if not t.num_rows:
        return empty
    tok = Tokenized(t[text_col])
    codes = np.asarray(tok.codes, dtype=np.int64)
    ge = pc.dictionary_encode(t[group_col].combine_chunks()
                              if isinstance(t[group_col],
                                            pa.ChunkedArray)
                              else t[group_col])
    gcodes = ge.indices.to_numpy(zero_copy_only=False).astype(
        np.int64)[tok.rowid]
    # drop the empty-string token Tokenized emits for empty rows
    # (regexp_extract_all('\\S+') semantics)
    wlen = pc.utf8_length(tok.dictionary).to_numpy(
        zero_copy_only=False)
    keep = wlen[codes] > 0
    codes, gcodes = codes[keep], gcodes[keep]
    if not len(codes):
        return empty
    d = len(tok.dictionary)
    comb = gcodes * d + codes
    u, n = np.unique(comb, return_counts=True)
    return pa.table({
        group_col: ge.dictionary.take(pa.array(u // d)).cast(
            pa.string()),
        "w": tok.dictionary.take(pa.array(u % d)).cast(pa.string()),
        "n": pa.array(n.astype(np.int64))})


def vocab_richness(ds, text_col: str, group_col: str):
    """Per-group lexical-richness profile: total token count, distinct
    type count, type-token ratio (TTR) and hapax-legomenon fraction
    (share of types occurring exactly once in the group) — the
    classic corpus-linguistics vocabulary statistics (Baayen, "Word
    Frequency Distributions", 2001), and a practical LLM-data signal:
    boilerplate-heavy or template-generated sources show low TTR and
    low hapax share.

    Tokens are whitespace words (``textops.Tokenized``; the SQL mirror
    is ``regexp_extract_all(text, '\\S+')``), counted over the whole
    group.

    Scale shape: per-batch dictionary-encoded (group, token, n) count
    partials (one combined bincount — rows shrink to distinct pairs
    per batch), ONE hash exchange on ``group_col`` (``partition_map``),
    then an in-partition Arrow group-by + run-segmented numpy stats.
    The exchange carries the per-batch distinct-pair partials, never
    the token stream."""
    import numpy as np

    from netml_ray.partition import partition_map
    from netml_ray.textops import Tokenized

    def _partial(t: pa.Table) -> pa.Table:
        return _group_token_partial(t, text_col, group_col)

    def _fin(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({group_col: pa.array([], pa.string()),
                             "n_tokens": pa.array([], pa.int64()),
                             "n_types": pa.array([], pa.int64()),
                             "ttr": pa.array([], pa.float64()),
                             "hapax_frac": pa.array([], pa.float64())})
        agg = (t.group_by([group_col, "w"]).aggregate([("n", "sum")])
               .sort_by(group_col))
        from netml_ray.mlprep import _run_bounds
        starts, run_id = _run_bounds(agg[group_col].combine_chunks())
        n = agg["n_sum"].to_numpy().astype(np.int64)
        n_tokens = np.bincount(run_id, weights=n.astype(np.float64))
        n_types = np.bincount(run_id).astype(np.float64)
        hapax = np.bincount(run_id, weights=(n == 1).astype(np.float64))
        keys = agg[group_col].combine_chunks().take(pa.array(starts))
        return pa.table({
            group_col: keys,
            "n_tokens": pa.array(n_tokens.astype(np.int64)),
            "n_types": pa.array(n_types.astype(np.int64)),
            "ttr": pa.array(np.round(n_types / n_tokens, 9)),
            "hapax_frac": pa.array(np.round(hapax / n_types, 9))})

    parts = ds.map_batches(_partial, batch_format="pyarrow")
    return partition_map(parts, group_col, _fin)


# ---------------------------------------------------------------------------
# Per-group KL divergence vs the corpus
# ---------------------------------------------------------------------------

def source_divergence(ds, text_col: str, group_col: str, *,
                      round_to: int = 6) -> "pa.Table":
    """Per-group KL divergence of the group's unigram distribution
    from the whole corpus: ``KL(p_g || p_corpus) = Σ_w p_g(w) ·
    ln(p_g(w) / p_c(w))`` over whitespace tokens — the
    domain-shift / contamination diagnostic (a source whose language
    diverges from the mixture scores high; CCNet uses the same notion
    with an external LM, this is the self-referential exact form).
    ``p_c(w) > 0`` whenever ``p_g(w) > 0`` because the group is part
    of the corpus, so the sum is total.

    Scale shape: per-batch dictionary-encoded (group, token, n)
    partials (the ``vocab_richness`` exchange shape), ONE token-keyed
    exchange folds global token counts to an O(vocab) table collected
    and BROADCAST once (the tfidf idf-table precedent; at web scale,
    bound it with a documented min-count prune), then ONE group-keyed
    exchange computes each group's sum with an ``index_in`` dictionary
    lookup — vectorized, no token-stream reshuffle.  Round-6 hedge on
    the |vocab|-term float sum (same reasoning as welch_ttest)."""
    import numpy as np

    from netml_ray.partition import partition_map
    from netml_ray.textops import Tokenized

    def _partial(t: pa.Table) -> pa.Table:
        empty = pa.table({group_col: pa.array([], pa.string()),
                          "w": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if not t.num_rows:
            return empty
        tok = Tokenized(t[text_col])
        codes = np.asarray(tok.codes, dtype=np.int64)
        ge = pc.dictionary_encode(t[group_col].combine_chunks()
                                  if isinstance(t[group_col],
                                                pa.ChunkedArray)
                                  else t[group_col])
        gcodes = ge.indices.to_numpy(zero_copy_only=False).astype(
            np.int64)[tok.rowid]
        wlen = pc.utf8_length(tok.dictionary).to_numpy(
            zero_copy_only=False)
        keep = wlen[codes] > 0
        codes, gcodes = codes[keep], gcodes[keep]
        if not len(codes):
            return empty
        d = len(tok.dictionary)
        comb = gcodes * d + codes
        u, n = np.unique(comb, return_counts=True)
        return pa.table({
            group_col: ge.dictionary.take(pa.array(u // d)).cast(
                pa.string()),
            "w": tok.dictionary.take(pa.array(u % d)).cast(pa.string()),
            "n": pa.array(n.astype(np.int64))})

    partials = ds.map_batches(_partial,
                              batch_format="pyarrow").materialize()

    # global token counts: one token-keyed exchange over the partials,
    # folded to an O(vocab) table on the driver
    def _tok_fold(t: pa.Table) -> pa.Table:
        out = t.select(["w", "n"]).group_by(["w"]).aggregate(
            [("n", "sum")])
        return out.rename_columns(["w", "ng"])

    gt = pa.concat_tables(
        [b for b in partition_map(partials, "w", _tok_fold)
         .iter_batches(batch_size=None, batch_format="pyarrow")],
        promote_options="none")
    # fold once more (partition partials are already disjoint by w,
    # but stay safe if the exchange ever re-chunks)
    gt = gt.group_by(["w"]).aggregate([("ng", "sum")])
    vocab = gt["w"].combine_chunks()
    ng = gt["ng_sum"].to_numpy().astype(np.float64)
    ntot = float(ng.sum())

    def _fin(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({group_col: pa.array([], pa.string()),
                             "n_tokens": pa.array([], pa.int64()),
                             "kl": pa.array([], pa.float64())})
        agg = (t.group_by([group_col, "w"]).aggregate([("n", "sum")])
               .sort_by(group_col))
        from netml_ray.mlprep import _run_bounds
        starts, run_id = _run_bounds(agg[group_col].combine_chunks())
        n = agg["n_sum"].to_numpy().astype(np.float64)
        idx = pc.index_in(agg["w"], value_set=vocab).to_numpy(
            zero_copy_only=False).astype(np.int64)
        pg_c = ng[idx] / ntot
        ns = np.bincount(run_id, weights=n)
        ps = n / ns[run_id]
        terms = ps * np.log(ps / pg_c)
        kl = np.bincount(run_id, weights=terms)
        keys = agg[group_col].combine_chunks().take(pa.array(starts))
        return pa.table({
            group_col: keys,
            "n_tokens": pa.array(ns.astype(np.int64)),
            "kl": pa.array(np.round(kl, round_to))})

    return partition_map(partials, group_col, _fin)


def rrf_fuse(rankings, id_col: str, *, k: int = 60,
             round_to: int | None = 9) -> pa.Table:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher) of several
    ALREADY-ORDERED candidate tables: each table contributes
    ``1/(k + rank)`` (1-based position) per id, absent ids contribute
    0, and the fused table carries the summed score — the standard
    hybrid-retrieval combiner (BM25 × embedding × prior) because it
    needs no score calibration across rankings.

    This is a driver-side finalize over top-N candidate lists (each
    produced scale-appropriately, e.g. via :func:`sketches.top_k`
    partials) — N is a constant, so the fuse is O(Σ N log N)
    regardless of corpus size."""
    agg: dict = {}
    for t in rankings:
        ids = t[id_col].to_pylist()
        for pos, i in enumerate(ids, start=1):
            agg[i] = agg.get(i, 0.0) + 1.0 / (k + pos)
    ids = sorted(agg)
    score = np.array([agg[i] for i in ids], dtype=np.float64)
    if round_to is not None:
        score = np.round(score, round_to)
    order = np.lexsort((np.array(ids), -score))
    return pa.table({
        id_col: pa.array(np.array(ids)[order]),
        "rrf": pa.array(score[order]),
    })


def logodds_tokens(ds, text_col: str, group_col: str,
                   group_a: str, group_b: str, *,
                   alpha: float = 0.5, min_count: int = 1,
                   round_to: int = 6) -> pa.Table:
    """Smoothed log-odds-ratio keyness (the Monroe/Colaresi/Quinn
    "fightin' words" statistic with a flat +α prior): for every token
    w, δ(w) = ln((c_a+α)/(N_a−c_a+α)) − ln((c_b+α)/(N_b−c_b+α)) and
    z(w) = δ/sqrt(1/(c_a+α) + 1/(c_b+α)) — which words distinguish
    corpus slice A from slice B, the standard corpus-comparison /
    drift diagnostic next to the KL divergence.

    Scale shape: per-batch dictionary-encoded (token, n_a, n_b)
    partials over only the two groups' rows (one combined bincount),
    driver fold over O(vocab) rows — no token-stream shuffle (at web
    scale bound vocab with a documented min-count prune, the idf-table
    precedent).  Round hedge on the ln/sqrt floats."""
    import numpy as np

    from netml_ray.textops import Tokenized

    def _partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"w": pa.array([], pa.string()),
                          "na": pa.array([], pa.int64()),
                          "nb": pa.array([], pa.int64())})
        g = t[group_col]
        m = pc.or_(pc.equal(g, group_a), pc.equal(g, group_b))
        t = t.filter(pc.fill_null(m, False))
        if not t.num_rows:
            return empty
        tok = Tokenized(t[text_col])
        codes = np.asarray(tok.codes, dtype=np.int64)
        isa = pc.equal(t[group_col], group_a).to_numpy(
            zero_copy_only=False)[tok.rowid].astype(np.int64)
        wlen = pc.utf8_length(tok.dictionary).to_numpy(
            zero_copy_only=False)
        keep = wlen[codes] > 0
        codes, isa = codes[keep], isa[keep]
        if not len(codes):
            return empty
        d = len(tok.dictionary)
        cnt = np.bincount(codes * 2 + isa, minlength=2 * d)
        na, nb = cnt[1::2], cnt[0::2]
        nz = np.flatnonzero(na + nb)
        return pa.table({
            "w": tok.dictionary.take(pa.array(nz)).cast(pa.string()),
            "na": pa.array(na[nz].astype(np.int64)),
            "nb": pa.array(nb[nz].astype(np.int64))})

    agg: dict = {}
    for bt in ds.map_batches(_partial, batch_format="pyarrow") \
                .iter_batches(batch_size=None, batch_format="pyarrow"):
        for w, na, nb in zip(bt["w"].to_pylist(),
                             bt["na"].to_numpy(), bt["nb"].to_numpy()):
            ca, cb = agg.get(w, (0, 0))
            agg[w] = (ca + int(na), cb + int(nb))
    words = sorted(w for w, (ca, cb) in agg.items()
                   if ca + cb >= min_count)
    ca = np.array([agg[w][0] for w in words], dtype=np.float64)
    cb = np.array([agg[w][1] for w in words], dtype=np.float64)
    n_a, n_b = ca.sum(), cb.sum()
    delta = (np.log((ca + alpha) / (n_a - ca + alpha))
             - np.log((cb + alpha) / (n_b - cb + alpha)))
    z = delta / np.sqrt(1.0 / (ca + alpha) + 1.0 / (cb + alpha))
    return pa.table({
        "w": pa.array(words, type=pa.string()),
        "n_a": pa.array(ca.astype(np.int64)),
        "n_b": pa.array(cb.astype(np.int64)),
        "delta": pa.array(np.round(delta, round_to)),
        "z": pa.array(np.round(z, round_to)),
    })


def source_keywords(ds, text_col: str, group_col: str, *,
                    top_k: int = 5, round_to: int = 9):
    """Distinctive-term extraction: per group the ``top_k`` tokens by
    group-level TF-IDF — score = n(g, w) · ln(S / df(w)) with S the
    number of groups containing ≥1 token and df(w) the number of
    groups containing w; ranking on the ROUNDED score with ties →
    lexicographically smallest token (both rules stated in SQL).
    The "what is this source about" report beside vocab_richness.

    Scale shape: the shared (group, token, n) batch partials, ONE
    token-keyed exchange folding the O(vocab) df table (broadcast
    once — the tfidf idf precedent, with the same documented
    min-count prune at web scale), then ONE group-keyed exchange
    scoring + per-group top-k (vectorized lexsort, no per-group
    Python)."""
    import ray

    from netml_ray.partition import partition_map

    parts = ds.map_batches(
        lambda t: _group_token_partial(t, text_col, group_col),
        batch_format="pyarrow").materialize()

    def _df(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({"w": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64())})
        agg = t.group_by(["w", group_col]).aggregate([]) \
            .group_by(["w"]).aggregate([([], "count_all")])
        return agg.rename_columns(["w", "df"])

    toks, dfs, groups = [], [], set()
    for bt in partition_map(parts, "w", _df) \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        toks.append(np.asarray(bt["w"].to_pylist(), dtype=object))
        dfs.append(bt["df"].to_numpy())
    for bt in parts.iter_batches(batch_size=None,
                                 batch_format="pyarrow"):
        groups.update(bt[group_col].to_pylist())
    tok_arr = np.concatenate(toks) if toks else np.empty(0, object)
    df_arr = np.concatenate(dfs).astype(np.int64) if dfs else \
        np.empty(0, np.int64)
    order = np.argsort(tok_arr.astype(str), kind="stable")
    tok_arr, df_arr = tok_arr[order].astype(str), df_arr[order]
    s_groups = len(groups)
    ref = ray.put((tok_arr, df_arr, s_groups))

    def _score(t: pa.Table, _ref=ref) -> pa.Table:
        if not t.num_rows:
            return pa.table({group_col: t[group_col],
                             "w": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        ta, da, s = ray.get(_ref)
        agg = t.group_by([group_col, "w"]).aggregate([("n", "sum")])
        g = np.asarray(agg[group_col].to_pylist(), dtype=str)
        w = np.asarray(agg["w"].to_pylist(), dtype=str)
        n = agg["n_sum"].to_numpy().astype(np.int64)
        df = da[np.searchsorted(ta, w)]
        score = np.round(n * np.log((1.0 * s) / df), round_to)
        o = np.lexsort((w, -score, g))
        g, w, n, score = g[o], w[o], n[o], score[o]
        first = np.r_[True, g[1:] != g[:-1]]
        run_id = np.cumsum(first) - 1
        pos = np.arange(len(g)) - np.flatnonzero(first)[run_id]
        keep = pos < top_k
        return pa.table({group_col: pa.array(g[keep]),
                         "w": pa.array(w[keep]),
                         "n": pa.array(n[keep]),
                         "score": pa.array(score[keep])})

    return partition_map(parts, group_col, _score)


def gram_novelty(ds, text_col: str, id_col: str, *, k: int = 3):
    """Per-document n-gram NOVELTY: the share of a doc's distinct
    word-``k``-grams that appear in NO other document — the
    memorization/boilerplate inverse signal (novelty 1.0 = fully
    original text; low novelty = template/copied content).  Docs with
    fewer than ``k`` tokens emit no grams and are excluded (rule
    stated in SQL).

    Scale shape: per-batch per-doc DISTINCT gram pairs (grams are the
    SQL's ``w1||US||w2||US||w3`` strings, so the exchange key is
    bit-identical on both engines), ONE gram-keyed exchange — a
    gram's run length IS its document frequency, so each pair row
    immediately knows novelty — per-partition (doc, n, novel) count
    partials, O(docs) driver fold.  At web scale the gram universe is
    pruned by the documented min-df/frequency bound (the tfidf idf
    precedent); the pair exchange carries distinct (gram, doc) rows,
    never the token stream."""
    from netml_ray.partition import partition_map

    sep = "\x1f"

    def _pairs(t: pa.Table) -> pa.Table:
        empty = pa.table({"gram": pa.array([], pa.string()),
                          "doc": pa.array([], pa.int64())})
        if not t.num_rows:
            return empty
        ids = t[id_col].to_numpy(zero_copy_only=False)
        grams, docs = [], []
        for i, s in enumerate(t[text_col].to_pylist()):
            w = s.split()
            if len(w) < k:
                continue
            gs = {sep.join(w[j:j + k]) for j in range(len(w) - k + 1)}
            grams.extend(gs)
            docs.extend([int(ids[i])] * len(gs))
        if not grams:
            return empty
        return pa.table({"gram": pa.array(grams, pa.string()),
                         "doc": pa.array(docs, pa.int64())})

    pairs = ds.select_columns([id_col, text_col]) \
        .map_batches(_pairs, batch_size=None, batch_format="pyarrow")

    def _df(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({"doc": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "novel": pa.array([], pa.int64())})
        g = t["gram"].combine_chunks()
        m = t.num_rows
        first = np.ones(m, dtype=bool)
        if m > 1:
            first[1:] = np.asarray(pc.not_equal(
                g.slice(1, m - 1), g.slice(0, m - 1)).to_numpy(
                zero_copy_only=False), dtype=bool)
        run_id = np.cumsum(first) - 1
        df = np.bincount(run_id)
        doc = t["doc"].to_numpy(zero_copy_only=False).astype(np.int64)
        is_novel = (df == 1)[run_id]
        udoc = np.unique(doc)
        idx = np.searchsorted(udoc, doc)
        return pa.table({
            "doc": pa.array(udoc),
            "n": pa.array(np.bincount(idx, minlength=len(udoc))
                          .astype(np.int64)),
            "novel": pa.array(np.bincount(idx[is_novel],
                                          minlength=len(udoc))
                              .astype(np.int64))})

    parts = pa.concat_tables(
        partition_map(pairs, "gram", _df, sort_by=["gram"])
        .iter_batches(batch_size=None, batch_format="pyarrow"),
        promote_options="none")
    agg = parts.group_by(["doc"]).aggregate([("n", "sum"),
                                             ("novel", "sum")]) \
        .sort_by([("doc", "ascending")])
    n = agg["n_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
    nv = agg["novel_sum"].to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    return pa.table({id_col: agg["doc"],
                     "n_grams": pa.array(n),
                     "n_novel": pa.array(nv),
                     "novelty": pa.array(nv / (1.0 * n))})


def sparse_cosine_pairs(rep, *, id_col: str = "doc_id",
                        term_col: str = "term", w_col: str = "tfidf",
                        max_df: int = 4096, round_to: int = 9,
                        num_partitions: int | None = None):
    """More-like-this: exact cosine similarity between documents'
    SPARSE term representations (e.g. ``tfidf_top_terms`` output) —
    pairs are generated only through shared terms, never all-pairs.

    score(a, b) = Σ_t ŵ_a(t)·ŵ_b(t) with ŵ = w/‖w‖ over the doc's
    sparse vector; ``w`` is rounded to ``round_to`` first so both
    engines normalize bit-identical inputs, and the returned ``cos``
    is rounded again.

    Shape (three keyed exchanges, all run-segmented): ① id-keyed —
    append the per-doc norm (segmented reduceat); ② term-keyed —
    in-partition pair expansion of each term's posting run (the
    adamic_adar expansion with ŵ_a·ŵ_b riding it) under the ``max_df``
    quadratic guard (hyper-common terms are SKIPPED and logged — they
    carry no similarity signal anyway, the classic stop-term rule);
    ③ id_a-keyed — fold (a, b) partials.  Returns a Dataset
    ``(id_a, id_b, cos)`` with id_a < id_b."""
    import logging

    from netml_ray.partition import partition_map

    def _norm(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return t.append_column("wn", pa.array([], pa.float64()))
        ids = t[id_col].combine_chunks()
        head = np.r_[True, pc.not_equal(
            ids.slice(1), ids.slice(0, len(ids) - 1))
            .to_numpy(zero_copy_only=False)]
        starts = np.flatnonzero(head)
        w = np.round(t[w_col].to_numpy(zero_copy_only=False)
                     .astype(np.float64), round_to)
        nrm = np.sqrt(np.add.reduceat(w * w, starts))
        lens = np.diff(np.r_[starts, t.num_rows])
        return t.append_column("wn", pa.array(w / np.repeat(nrm, lens)))

    withn = partition_map(rep, id_col, _norm,
                          num_partitions=num_partitions,
                          sort_by=[id_col, term_col])

    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "s": pa.array([], pa.float64())})

    def _pairs(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return empty
        terms = t[term_col].combine_chunks()
        head = np.r_[True, pc.not_equal(
            terms.slice(1), terms.slice(0, len(terms) - 1))
            .to_numpy(zero_copy_only=False)]
        starts = np.flatnonzero(head)
        lens = np.diff(np.r_[starts, t.num_rows])
        ids = t[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        wn = t["wn"].to_numpy(zero_copy_only=False)
        big = lens > max_df
        if big.any():
            logging.getLogger(__name__).warning(
                "sparse_cosine_pairs: skipping %d term(s) with df > "
                "max_df=%d", int(big.sum()), max_df)
            keep = np.repeat(~big, lens)
            ids, wn = ids[keep], wn[keep]
            th = terms.filter(pa.array(keep))
            head = np.r_[True, pc.not_equal(
                th.slice(1), th.slice(0, len(th) - 1))
                .to_numpy(zero_copy_only=False)] \
                if len(th) else np.zeros(0, bool)
            starts = np.flatnonzero(head)
            lens = np.diff(np.r_[starts, len(ids)])
        if not len(ids):
            return empty
        m = np.arange(len(ids)) - np.repeat(starts, lens)
        cnt_i = lens[np.repeat(np.arange(len(lens)), lens)] - 1 - m
        total = int(cnt_i.sum())
        if total == 0:
            return empty
        i_row = np.repeat(np.arange(len(ids)), cnt_i)
        j_off = np.arange(total) - np.repeat(
            np.r_[0, np.cumsum(cnt_i)[:-1]], cnt_i)
        j_row = i_row + 1 + j_off
        a, b = ids[i_row], ids[j_row]
        s = wn[i_row] * wn[j_row]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        order = np.lexsort((hi, lo))
        lo, hi, s = lo[order], hi[order], s[order]
        f = np.r_[True, (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])]
        st = np.flatnonzero(f)
        return pa.table({
            "id_a": pa.array(lo[st]), "id_b": pa.array(hi[st]),
            "s": pa.array(np.add.reduceat(s, st))})

    part = partition_map(withn, term_col, _pairs,
                         num_partitions=num_partitions,
                         sort_by=[term_col, id_col])

    def _fold(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        a = t["id_a"].to_numpy()
        b = t["id_b"].to_numpy()
        f = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        st = np.flatnonzero(f)
        return pa.table({
            "id_a": pa.array(a[st]), "id_b": pa.array(b[st]),
            "cos": pa.array(np.round(
                np.add.reduceat(t["s"].to_numpy(), st), round_to))})

    return partition_map(part, "id_a", _fold,
                         num_partitions=num_partitions,
                         sort_by=["id_a", "id_b"])


# ---------------------------------------------------------------------------
# trigram LM — stupid backoff (Brants et al. 2007)
# ---------------------------------------------------------------------------

def _trigram_hash_counts(ds, *, text_col: str, min_count: int = 1):
    """ONE corpus pass + ONE narrow int64 exchange yields unigram
    (kind 1), bigram (kind 2) and trigram (kind 3) hash-keyed counts —
    the ``_bigram_hash_counts`` shape with the two extra orders riding
    the same exchange.  ``min_count`` prunes TRIGRAM rows only (the
    long tail; uni/bigram tables are the backoff and stay exact)."""
    from netml_ray.partition import partition_map

    def _partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"kind": pa.array([], type=pa.int8()),
                          "code": pa.array([], type=pa.int64()),
                          "n": pa.array([], type=pa.int64())})
        tok = _tok(t[text_col])
        live = tok.n_words[tok.rowid] > 0
        wh = tok.word_hashes()[live]
        rowid = tok.rowid[live]
        if not len(wh):
            return empty
        kinds, codes, ns = [], [], []
        u1, n1 = np.unique(wh.view(np.int64), return_counts=True)
        kinds.append(np.ones(len(u1), dtype=np.int8))
        codes.append(u1)
        ns.append(n1)
        if len(wh) > 1:
            same2 = rowid[1:] == rowid[:-1]
            code2 = (wh[:-1] * _GOLD + wh[1:])[same2].view(np.int64)
            if len(code2):
                u2, n2 = np.unique(code2, return_counts=True)
                kinds.append(np.full(len(u2), 2, dtype=np.int8))
                codes.append(u2)
                ns.append(n2)
            if len(wh) > 2:
                same3 = same2[:-1] & same2[1:]
                code3 = ((wh[:-2] * _GOLD + wh[1:-1]) * _GOLD
                         + wh[2:])[same3].view(np.int64)
                if len(code3):
                    u3, n3 = np.unique(code3, return_counts=True)
                    kinds.append(np.full(len(u3), 3, dtype=np.int8))
                    codes.append(u3)
                    ns.append(n3)
        return pa.table({
            "kind": pa.array(np.concatenate(kinds)),
            "code": pa.array(np.concatenate(codes)),
            "n": pa.array(np.concatenate(ns).astype(np.int64))})

    def _combine(t: pa.Table) -> pa.Table:
        kind = t["kind"].to_numpy()
        code = t["code"].to_numpy()
        n = t["n"].to_numpy()
        order = np.lexsort((code, kind))
        k, c, nn = kind[order], code[order], n[order]
        first = np.r_[True, (k[1:] != k[:-1]) | (c[1:] != c[:-1])]
        starts = np.flatnonzero(first)
        return pa.table({"kind": pa.array(k[starts]),
                         "code": pa.array(c[starts]),
                         "n": pa.array(np.add.reduceat(nn, starts)
                                       .astype(np.int64))})

    agg = partition_map(
        ds.map_batches(_partial, batch_format="pyarrow"),
        "code", _combine).materialize()
    if min_count > 1:
        agg = agg.filter(
            expr=f"kind < 3 or n >= {min_count}")
    return agg


class _StupidBackoffModel:
    """Broadcast trigram stupid-backoff model (Brants et al. 2007,
    "Large Language Models in Machine Translation"):

        S(w3|w1w2) = c3/c2(w1w2)            if c3 > 0
                   = 0.4 · c2(w2w3)/c1(w2)  elif c2(w2w3) > 0
                   = 0.4² · c1(w3)/T        otherwise

    All lookups are integer searchsorted over sorted hash codes."""

    LAMBDA = 0.4

    def __init__(self, kinds: np.ndarray, codes: np.ndarray,
                 counts: np.ndarray):
        def _split(k):
            m = kinds == k
            c = codes[m]
            o = np.argsort(c)
            return c[o], counts[m][o].astype(np.float64)

        self.c1k, self.c1v = _split(1)
        self.c2k, self.c2v = _split(2)
        self.c3k, self.c3v = _split(3)
        self.total = float(self.c1v.sum())

    @staticmethod
    def _lookup(keys, vals, q):
        if not len(keys):
            return np.zeros(len(q), dtype=np.float64)
        pos = np.clip(np.searchsorted(keys, q), 0, len(keys) - 1)
        return np.where(keys[pos] == q, vals[pos], 0.0)

    def logp2(self, h1, h2, h3):
        c3 = self._lookup(self.c3k, self.c3v,
                          ((h1 * _GOLD + h2) * _GOLD + h3)
                          .view(np.int64))
        ctx = self._lookup(self.c2k, self.c2v,
                           (h1 * _GOLD + h2).view(np.int64))
        b23 = self._lookup(self.c2k, self.c2v,
                           (h2 * _GOLD + h3).view(np.int64))
        u2 = self._lookup(self.c1k, self.c1v, h2.view(np.int64))
        u3 = self._lookup(self.c1k, self.c1v, h3.view(np.int64))
        lam = self.LAMBDA
        with np.errstate(divide="ignore", invalid="ignore"):
            out = np.where(
                c3 > 0, np.log2(c3 / np.maximum(ctx, 1e-300)),
                np.where(b23 > 0,
                         np.log2(lam * b23 / np.maximum(u2, 1e-300)),
                         np.log2(lam * lam
                                 * np.maximum(u3, 1e-300) / self.total)))
        return out


def sb_bits_arrays(m: "_StupidBackoffModel", col):
    """Per-doc (n_trigrams, avg −log2 S) for a text column against a
    broadcast stupid-backoff model — one vectorized pass."""
    tok = _tok(col)
    nrows = len(tok.n_words)
    nbg = np.zeros(nrows, dtype=np.int64)
    bits = np.full(nrows, np.nan)
    live = tok.n_words[tok.rowid] > 0
    wh = tok.word_hashes()[live]
    rowid = tok.rowid[live]
    if len(wh) > 2:
        same3 = (rowid[1:] == rowid[:-1])[:-1] \
            & (rowid[1:] == rowid[:-1])[1:]
        if same3.any():
            h1 = wh[:-2][same3]
            h2 = wh[1:-1][same3]
            h3 = wh[2:][same3]
            rows = rowid[:-2][same3]
            lp = m.logp2(h1, h2, h3)
            cnt = np.bincount(rows, minlength=nrows)
            ssum = np.zeros(nrows)
            np.add.at(ssum, rows, lp)
            pos = cnt > 0
            nbg[pos] = cnt[pos]
            bits[pos] = -ssum[pos] / cnt[pos]
    return nbg, bits


def trigram_sb_bits(ds, *, text_col: str = "text",
                    id_col: str = "doc_id", min_count: int = 1):
    """Per-doc trigram stupid-backoff score ``(id, n_trigrams,
    sb_bits)`` (avg −log2 S per trigram; NULL under 3 tokens) — the
    CCNet-style LM quality signal one order up from
    ``bigram_lm_bits``, with the web-scale smoothing (count-ratio
    backoff, no normalization pass).  ONE narrow count exchange
    trains; the broadcast model scores in one pass."""
    import ray

    from netml_ray.partition import _collect_table, auto_concurrency

    agg = _trigram_hash_counts(ds, text_col=text_col,
                               min_count=min_count)
    gt = _collect_table(agg, pa.schema([("kind", pa.int8()),
                                        ("code", pa.int64()),
                                        ("n", pa.int64())]))
    model = _StupidBackoffModel(gt["kind"].to_numpy(),
                                gt["code"].to_numpy(),
                                gt["n"].to_numpy())
    model_ref = ray.put(model)

    class _Score:
        def __init__(self):
            self.m = ray.get(model_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            nbg, bits = sb_bits_arrays(self.m, t[text_col])
            return pa.table({
                id_col: t[id_col],
                "n_trigrams": pa.array(nbg),
                "sb_bits": pa.array(
                    [None if not np.isfinite(x) else float(x)
                     for x in bits], type=pa.float64())})

    return ds.map_batches(_Score, batch_format="pyarrow",
                          concurrency=auto_concurrency())
