"""Distributed byte-level BPE tokenizer training + application.

The LLM-data op the reference family never had: learn a byte-pair-
encoding merge table from a corpus, Ray-Data-first.  The scale trick
is Sennrich's original one (arXiv:1508.07909): BPE never iterates over
the corpus — it iterates over the WORD-FREQUENCY table.  So:

1. ONE narrow pass + ONE hash exchange reduce the corpus (100 TB of
   text) to ``(word, count)`` — bounded by the distinct vocabulary
   (Zipf: ~10-100M rows ≈ GBs), pruned by ``min_word_count`` BEFORE
   anything is collected.
2. The merge loop runs over that word table.  Each iteration is a
   vectorized pair-count partial (adjacent symbol pairs weighted by
   word count, composite int64 keys, ``np.unique`` fold) + an argmax +
   a vectorized merge apply (greedy left-to-right, overlap-resolved by
   run parity — ``aaa`` + pair (a,a) merges once, matching the
   sequential reference).  Dual path, same contract as
   ``partition.partition_map``: below ``driver_bytes`` the word table
   collects once and the loop is driver-local numpy; above, every
   iteration is a ``map_batches`` partial over the distributed word
   table with the merge table broadcast — K narrow vocabulary-bounded
   passes, never a corpus pass.  Both paths are pinned equal in
   pytest.

Determinism rule (stated here because ties are common early): the
selected pair is the one with the HIGHEST count, ties broken by the
LOWEST (left_id, right_id).  Symbols start as UTF-8 bytes (ids 0-255,
GPT-2 style — no unicode vocab bootstrap); merged symbol i gets id
256+i.  Words are ``\\w+|[^\\w\\s]`` pre-tokens (the repo's n_bpe_tokens
regex, textops.py:416) — merges never cross word boundaries.

Application (`apply_bpe`) broadcasts the learned merge table via
``ray.put`` and re-runs the same vectorized merge kernel per batch,
rank order — training words and unseen words take the identical code
path, so ``encode(train_corpus)`` is exactly the training end state.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

__all__ = ["learn_bpe", "apply_bpe", "bpe_token_counts"]

_PRETOKEN = re.compile(r"\w+|[^\w\s]")


def _word_counts(ds, text_col: str, *, min_word_count: int,
                 num_partitions: int | None):
    """Corpus -> (word, count) via per-batch partial counts + ONE hash
    exchange on the word; prune below ``min_word_count`` AFTER the
    exchange (counts are global there)."""
    from netml_ray.partition import partition_map

    def _partial(t: pa.Table) -> pa.Table:
        words: dict[str, int] = {}
        for s in t[text_col].to_pylist():
            if not s:
                continue
            for w in _PRETOKEN.findall(s):
                words[w] = words.get(w, 0) + 1
        if not words:
            return pa.table({"word": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        return pa.table({"word": pa.array(list(words)),
                         "n": pa.array(list(words.values()),
                                       type=pa.int64())})

    partial = ds.map_batches(_partial, batch_format="pyarrow")

    def _fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        import pyarrow.compute as pc
        g = t.group_by("word").aggregate([("n", "sum")])
        agg = pa.table({"word": g["word"], "n": g["n_sum"]})
        return agg.filter(pc.greater_equal(agg["n"], min_word_count))

    return partition_map(partial, "word", _fold,
                         num_partitions=num_partitions)


def _encode_words(words: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """UTF-8 byte symbol ids (int64) + per-word lengths."""
    if not words:
        return (np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int64))
    bs = [w.encode("utf-8") for w in words]
    lens = np.fromiter((len(b) for b in bs), dtype=np.int64,
                       count=len(bs))
    syms = np.frombuffer(b"".join(bs), dtype=np.uint8).astype(np.int64)
    return syms, lens


def _pair_partial(syms: np.ndarray, lens: np.ndarray,
                  wcnt: np.ndarray, next_id: int):
    """Weighted adjacent-pair counts within words: composite int64
    keys ``left * next_id + right`` (next_id = current vocab size, so
    the key is collision-free), np.unique fold.  Returns (keys,
    counts)."""
    if len(syms) == 0:
        return (np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int64))
    wid = np.repeat(np.arange(len(lens)), lens)
    ok = np.r_[wid[1:] == wid[:-1], False]
    idx = np.flatnonzero(ok)
    if len(idx) == 0:
        return (np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int64))
    keys = syms[idx] * next_id + syms[idx + 1]
    w = wcnt[wid[idx]]
    uk, inv = np.unique(keys, return_inverse=True)
    cnt = np.zeros(len(uk), dtype=np.int64)
    np.add.at(cnt, inv, w)
    return uk, cnt


def _merge_apply(syms: np.ndarray, lens: np.ndarray, left: int,
                 right: int, new_id: int):
    """Greedy left-to-right merge of (left,right) -> new_id within
    words, vectorized.  Overlaps (e.g. ``aaa`` with pair (a,a)) are
    resolved by run parity: within each run of consecutive match
    positions, keep positions 0, 2, 4, ... — exactly the sequential
    scan's choice."""
    if len(syms) < 2:
        return syms, lens
    wid = np.repeat(np.arange(len(lens)), lens)
    m = np.flatnonzero((syms[:-1] == left) & (syms[1:] == right)
                       & (wid[:-1] == wid[1:]))
    if len(m) == 0:
        return syms, lens
    if len(m) > 1:
        # run parity: a match at m[i] is suppressed if the previous
        # KEPT match is at m[i]-1.  Within a run of consecutive
        # positions keep alternate ones (left-to-right greedy).
        run_start = np.r_[True, np.diff(m) > 1]
        run_idx = np.cumsum(run_start) - 1
        pos_in_run = np.arange(len(m)) - \
            np.flatnonzero(run_start)[run_idx]
        m = m[pos_in_run % 2 == 0]
    keep = np.ones(len(syms), dtype=bool)
    keep[m + 1] = False
    out = syms.copy()
    out[m] = new_id
    out = out[keep]
    drops = np.bincount(wid[m + 1], minlength=len(lens))
    return out, lens - drops


def learn_bpe(ds, text_col: str = "text", *, num_merges: int = 200,
              min_word_count: int = 1, min_pair_count: int = 2,
              driver_bytes: int | None = None,
              num_partitions: int | None = None) -> pa.Table:
    """Learn a byte-level BPE merge table; returns
    ``pa.Table(rank, left, right, token, pair_count)`` — ``token`` is
    the merged symbol's byte string (binary), ``left``/``right`` the
    constituent symbol ids (0-255 = raw bytes, 256+i = merge rank i).
    Stops early when no pair reaches ``min_pair_count``.

    Cluster shape: see module docstring — the corpus is touched ONCE
    (word-count exchange, ``min_word_count`` prune); the merge loop is
    vocabulary-bounded.  Driver fold per iteration holds only the
    distinct adjacent-pair counts (≤ vocab², Zipf-tiny in practice).
    """
    import ray

    from netml_ray.partition import pmap_driver_bytes

    wc = _word_counts(ds, text_col, min_word_count=min_word_count,
                      num_partitions=num_partitions).materialize()
    budget = pmap_driver_bytes() if driver_bytes is None else \
        driver_bytes
    local = (wc.size_bytes() or 0) <= budget

    # token byte strings for decode; ids 0-255 are raw bytes
    tokens: list[bytes] = [bytes([i]) for i in range(256)]
    out_rank, out_left, out_right, out_tok, out_cnt = [], [], [], [], []

    if local:
        parts_w, parts_n = [], []
        for bt in wc.iter_batches(batch_size=None,
                                  batch_format="pyarrow"):
            parts_w.extend(bt["word"].to_pylist())
            parts_n.append(bt["n"].to_numpy())
        wcnt = (np.concatenate(parts_n) if parts_n
                else np.empty(0, dtype=np.int64))
        syms, lens = _encode_words(parts_w)
        for rank in range(num_merges):
            next_id = 256 + rank
            uk, cnt = _pair_partial(syms, lens, wcnt, next_id)
            if len(uk) == 0 or cnt.max() < min_pair_count:
                break
            best = np.lexsort((uk, -cnt))[0]  # max count, min key
            left = int(uk[best] // next_id)
            right = int(uk[best] % next_id)
            syms, lens = _merge_apply(syms, lens, left, right, next_id)
            tokens.append(tokens[left] + tokens[right])
            out_rank.append(rank)
            out_left.append(left)
            out_right.append(right)
            out_tok.append(tokens[-1])
            out_cnt.append(int(cnt[best]))
    else:
        # distributed loop: word table stays sharded; per iteration a
        # narrow pair-count partial pass + driver argmax + a narrow
        # merge-apply pass (merge table broadcast, whole prefix
        # re-applied onto the immutable base blocks — K² symbol work
        # but ZERO re-shuffles and no mutable distributed state).
        base = wc
        merges: list[tuple[int, int]] = []
        for rank in range(num_merges):
            next_id = 256 + rank
            mref = ray.put(list(merges))

            def _pp(t: pa.Table, _mref=mref, _nid=next_id) -> pa.Table:
                ms = ray.get(_mref)
                syms, lens = _encode_words(t["word"].to_pylist())
                for i, (lf, rt) in enumerate(ms):
                    syms, lens = _merge_apply(syms, lens, lf, rt,
                                              256 + i)
                uk, cnt = _pair_partial(
                    syms, lens, t["n"].to_numpy(), _nid)
                return pa.table({"k": pa.array(uk),
                                 "c": pa.array(cnt)})

            fold: dict[int, int] = {}
            for bt in base.map_batches(_pp, batch_size=None,
                                       batch_format="pyarrow") \
                          .iter_batches(batch_size=None,
                                        batch_format="pyarrow"):
                for k, c in zip(bt["k"].to_numpy(),
                                bt["c"].to_numpy()):
                    fold[int(k)] = fold.get(int(k), 0) + int(c)
            if not fold:
                break
            best_k = min(fold, key=lambda k: (-fold[k], k))
            if fold[best_k] < min_pair_count:
                break
            left, right = best_k // next_id, best_k % next_id
            merges.append((left, right))
            tokens.append(tokens[left] + tokens[right])
            out_rank.append(rank)
            out_left.append(left)
            out_right.append(right)
            out_tok.append(tokens[-1])
            out_cnt.append(fold[best_k])

    return pa.table({
        "rank": pa.array(out_rank, type=pa.int64()),
        "left": pa.array(out_left, type=pa.int64()),
        "right": pa.array(out_right, type=pa.int64()),
        "token": pa.array(out_tok, type=pa.binary()),
        "pair_count": pa.array(out_cnt, type=pa.int64())})


def _encode_table(t: pa.Table, text_col: str, id_col: str,
                  merges: list[tuple[int, int]]):
    """Per-batch BPE encode: pre-tokenize, byte symbols, apply the
    merge table in rank order (same kernel as training).  Returns
    (doc_index_per_word, word_lens_after, n_words_per_doc)."""
    texts = t[text_col].to_pylist()
    words, doc_of_word = [], []
    for di, s in enumerate(texts):
        if not s:
            continue
        ws = _PRETOKEN.findall(s)
        words.extend(ws)
        doc_of_word.extend([di] * len(ws))
    syms, lens = _encode_words(words)
    for i, (lf, rt) in enumerate(merges):
        syms, lens = _merge_apply(syms, lens, lf, rt, 256 + i)
    return np.asarray(doc_of_word, dtype=np.int64), lens, len(texts)


def apply_bpe(ds, merge_table: pa.Table, text_col: str = "text",
              id_col: str = "doc_id"):
    """Encode a corpus with a learned merge table; returns a Dataset
    ``(id_col, n_words, n_tokens)`` — token count per document under
    the BPE vocabulary (the LLM-data budgeting number).  Narrow: the
    merge table broadcasts via ``ray.put``; one map_batches pass."""
    import ray

    merges = list(zip(merge_table["left"].to_pylist(),
                      merge_table["right"].to_pylist()))
    mref = ray.put(merges)

    def _enc(t: pa.Table, _mref=mref) -> pa.Table:
        ms = ray.get(_mref)
        doc_of_word, lens, ndocs = _encode_table(t, text_col, id_col,
                                                 ms)
        nw = np.bincount(doc_of_word, minlength=ndocs) \
            .astype(np.int64)
        nt = np.zeros(ndocs, dtype=np.int64)
        if len(lens):
            np.add.at(nt, doc_of_word, lens)
        return pa.table({id_col: t[id_col],
                         "n_words": pa.array(nw),
                         "n_tokens": pa.array(nt)})

    return ds.map_batches(_enc, batch_format="pyarrow")


def bpe_token_counts(ds, text_col: str = "text",
                     id_col: str = "doc_id", *,
                     num_merges: int = 200,
                     min_word_count: int = 1,
                     min_pair_count: int = 2,
                     num_partitions: int | None = None):
    """learn_bpe + apply_bpe over the same corpus — the end-to-end
    "train a tokenizer, budget the corpus" pipeline.  Returns
    (merge_table, per-doc token-count Dataset)."""
    mt = learn_bpe(ds, text_col, num_merges=num_merges,
                   min_word_count=min_word_count,
                   min_pair_count=min_pair_count,
                   num_partitions=num_partitions)
    return mt, apply_bpe(ds, mt, text_col, id_col)
