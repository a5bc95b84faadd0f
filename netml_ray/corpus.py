"""Deterministic synthetic Common-Crawl-style corpus generator.

Produces the input table from BASELINE.json input_hint:
``(url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string)`` — seeded, no wall clock, reproducible byte-for-byte.

Fixture requirements exercised (FIXTURES.md):
  * one hot url holding ≈20% of all rows (skew / salting)
  * singleton urls (dropped by min-rows filters)
  * per-url bursts separated by gaps straddling the 600 s cut
  * duplicate timestamps within a url (zero IATs)
  * urls whose trailing records fall after a gap (trailing discard)
  * ``text`` is the exact ground-truth extraction of ``html`` under the
    pinned extractor spec (textops.EXTRACTOR_VERSION)

Generation is vectorized (one RNG draw array per aspect, token
fragments precomputed) — ~100k rows/s — so multi-million-row bench
corpora are cheap to materialize (and cached by content key).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

GEN_VERSION = 2

_VOCAB = (
    "the quick brown fox jumps over lazy dog data pipeline ray arrow "
    "feature session window rolling quantile shuffle partition actor "
    "stream batch web crawl page index token model scale café naïve "
).split() + ["a&b", "<tag>", "x<y>z", "q&a", "50%"]

_LANGS = ["en", "de", "fr", "es", "zh"]
_DOMAINS = ["example.com", "data.org", "crawl.net", "web.io", "pages.dev"]

_ENT = {"&": "&amp;", "<": "&lt;", ">": "&gt;", '"': "&quot;"}


def _escape(tok: str) -> str:
    return "".join(_ENT.get(c, c) for c in tok)


def _fragments() -> tuple[list[str], list[str]]:
    """Precomputed (html_fragment, word) pairs covering word × style ×
    whitespace variants; extraction of any concatenation equals the
    space-joined words."""
    ws = [" ", "\n", "\t", "  ", "\n  "]
    frags, words = [], []
    for w in _VOCAB:
        esc = _escape(w)
        for si, style in enumerate(["plain", "p", "b"]):
            if style == "p":
                h = f"<p class='c{si}'>{esc}</p>"
            elif style == "b":
                h = f"<b>{esc}</b>"
            else:
                h = esc
            for j in range(len(ws)):
                frags.append(h + ws[j])
                words.append(w)
    return frags, words


_FRAGS, _FRAG_WORDS = _fragments()
_HEAD = "<html><head><title></title></head><body>"
_TAIL = "</body></html>"


def gen_corpus(
    n_rows: int,
    seed: int = 7,
    *,
    start_epoch: int = 1_600_000_000,
    avg_rows_per_url: int = 40,
    avg_tokens: int = 12,
    hot_frac: float = 0.2,
) -> pa.Table:
    rng = np.random.default_rng(seed)
    n_urls = max(4, n_rows // avg_rows_per_url)

    # row budget: url 0 is hot (hot_frac of rows), 10% of urls singletons
    n_hot = int(n_rows * hot_frac)
    n_single = max(1, n_urls // 10)
    remaining = n_rows - n_hot - n_single
    others = n_urls - 1 - n_single
    base = np.maximum(1, rng.poisson(max(2, remaining // max(1, others)), others))
    diff = remaining - int(base.sum())
    base[0] = max(2, base[0] + diff)
    counts = np.r_[n_hot, base, np.ones(n_single, dtype=np.int64)].astype(np.int64)
    n = int(counts.sum())

    url_idx = np.repeat(np.arange(len(counts)), counts)
    urls = np.array(
        [f"https://{_DOMAINS[i % len(_DOMAINS)]}/page/{i}" for i in range(len(counts))],
        dtype=object,
    )
    langs = np.array(_LANGS, dtype=object)[rng.integers(0, len(_LANGS), len(counts))]

    # --- timestamps: vectorized per-row step mixture, cumsum per url ---
    first = np.zeros(n, dtype=bool)
    first[np.r_[0, np.cumsum(counts)[:-1]]] = True
    u = rng.random(n)
    dt = rng.uniform(0.5, 240.0, n)
    dt[u < 0.08] = 0.0  # duplicate timestamps
    bmask = (u >= 0.08) & (u < 0.14)
    dt[bmask] = np.array([599.9, 600.0, 600.1])[rng.integers(0, 3, int(bmask.sum()))]
    smask = (u >= 0.14) & (u < 0.14 + 1.0 / 18.0)  # session break ~ every 18 rows
    dt[smask] = rng.uniform(650.0, 90000.0, int(smask.sum()))
    dt[first] = 0.0
    cs = np.cumsum(dt)
    url_first_row = np.repeat(np.flatnonzero(first), counts)
    starts = (start_epoch + rng.integers(0, 30 * 86400, len(counts))).astype(np.float64)
    ts = np.repeat(starts, counts) + (cs - cs[url_first_row])
    ts_us = np.round(ts * 1e6).astype(np.int64)

    # --- documents: fragment sampling, vectorized draws ---
    ntok = rng.integers(0, 2 * avg_tokens, n)
    ntok[rng.random(n) < 0.02] = 0  # empty-text rows
    offs = np.r_[0, np.cumsum(ntok)]
    tok = rng.integers(0, len(_FRAGS), int(offs[-1]))
    frag_arr = _FRAGS
    word_arr = _FRAG_WORDS
    html_col = np.empty(n, dtype=object)
    text_col = np.empty(n, dtype=object)
    for i in range(n):
        ids = tok[offs[i] : offs[i + 1]]
        html_col[i] = (_HEAD + "".join([frag_arr[j] for j in ids]) + _TAIL).encode("utf-8")
        text_col[i] = " ".join([word_arr[j] for j in ids])

    order = np.argsort(ts_us, kind="stable")  # corpus arrives time-ordered overall
    tbl = pa.table(
        {
            "url": pa.array(urls[url_idx][order].tolist(), type=pa.string()),
            "warc_ts": pa.array(ts_us[order], type=pa.timestamp("us")),
            "html": pa.array(html_col[order].tolist(), type=pa.binary()),
            "text": pa.array(text_col[order].tolist(), type=pa.string()),
            "lang": pa.array(langs[url_idx][order].tolist(), type=pa.string()),
        }
    )
    return tbl


def corpus_path(
    n_rows: int,
    seed: int = 7,
    cache_dir: str = "/tmp/netml_ray_corpus",
    avg_tokens: int = 12,
    shards: int = 32,
    hot_frac: float = 0.2,
) -> str:
    """Generate-once cached corpus as a DIRECTORY of parquet shards
    (deterministic by key).  Sharded layout + small row groups give the
    reader real parallelism — a single-file single-row-group corpus
    serializes the read stage."""
    os.makedirs(cache_dir, exist_ok=True)
    suffix = "" if hot_frac == 0.2 else f"_h{int(hot_frac * 100)}"
    path = os.path.join(
        cache_dir, f"corpus_v{GEN_VERSION}_n{n_rows}_s{seed}_t{avg_tokens}{suffix}"
    )
    if not os.path.isdir(path):
        tmp = path + f".tmp.{os.getpid()}"
        os.makedirs(tmp, exist_ok=True)
        tbl = gen_corpus(n_rows, seed, avg_tokens=avg_tokens, hot_frac=hot_frac)
        n = tbl.num_rows
        per = max(1, (n + shards - 1) // shards)
        for i in range(0, shards):
            lo = i * per
            if lo >= n:
                break
            part = tbl.slice(lo, min(per, n - lo))
            pq.write_table(part, os.path.join(tmp, f"shard_{i:04d}.parquet"),
                           row_group_size=16384)
        os.replace(tmp, path)  # atomic
    return path


# ---------------------------------------------------------------------------
# Synthetic documents table (curation-bench volume)
# ---------------------------------------------------------------------------

_DOC_STOPS = ["the", "and", "of", "to", "that", "with", "have", "be"]


def gen_documents(n_rows: int, seed: int = 13, *,
                  avg_words: int = 60) -> pa.Table:
    """Documents-shaped table ``(doc_id, text, lang, source, n_chars)``
    at bench volume — deterministic, with every curation stage given
    real work: ~5% exact near-duplicates (trailing-whitespace copies),
    ~1% planted PII, ~20% short/repetitive junk, benchmark docs at
    ``doc_id ≡ 0 (mod 97)`` whose snippets contaminate ~1% more."""
    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i}" for i in range(2000)] + _DOC_STOPS * 120)
    # texts: 8-word phrases drawn from a precomputed pool, joined per doc
    pool = np.array([" ".join(rng.choice(vocab, size=8)) for _ in range(4096)])
    n_phr = np.maximum(1, rng.poisson(avg_words / 8, size=n_rows))
    picks = rng.integers(0, len(pool), size=int(n_phr.sum()))
    bounds = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(n_phr, out=bounds[1:])
    # unique per-doc preamble: keeps substring-mode benchmark snippets
    # (chars 7..39) doc-specific despite the pooled phrase bodies
    texts = [f"id{i} u{(i * 2654435761) % 999983} "
             + " ".join(pool[picks[bounds[i]:bounds[i + 1]]])
             for i in range(n_rows)]
    junk = rng.random(n_rows) < 0.2
    for i in np.flatnonzero(junk):
        texts[i] = ("spam ham " * 30) if (i % 2) else "tiny doc"
    pii = rng.random(n_rows) < 0.01
    for i in np.flatnonzero(pii):
        texts[i] += " contact bob@example.com or 10.1.2.3"
    dup_src = rng.integers(0, n_rows, size=n_rows)
    dup = (rng.random(n_rows) < 0.05) & (dup_src < np.arange(n_rows))
    for i in np.flatnonzero(dup):
        texts[i] = texts[dup_src[i]] + "  "
    lang = rng.choice(np.array(_LANGS), size=n_rows,
                      p=[0.6, 0.1, 0.1, 0.1, 0.1])
    source = np.char.add("src", rng.integers(0, 50, size=n_rows).astype(str))
    n_chars = np.fromiter((len(s) for s in texts), dtype=np.int64,
                          count=n_rows)
    return pa.table({
        "doc_id": pa.array(np.arange(n_rows, dtype=np.int64)),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(lang.tolist(), type=pa.string()),
        "source": pa.array(source.tolist(), type=pa.string()),
        "n_chars": pa.array(n_chars),
    })


def documents_path(n_rows: int, seed: int = 13,
                   cache_dir: str = "/tmp/netml_ray_corpus",
                   shards: int = 32) -> str:
    """Generate-once cached documents table (sharded parquet dir)."""
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"documents_v{GEN_VERSION}_n{n_rows}_s{seed}")
    if not os.path.isdir(path):
        tmp = path + f".tmp.{os.getpid()}"
        os.makedirs(tmp, exist_ok=True)
        tbl = gen_documents(n_rows, seed)
        n = tbl.num_rows
        per = max(1, (n + shards - 1) // shards)
        for i in range(0, shards):
            lo = i * per
            if lo >= n:
                break
            part = tbl.slice(lo, min(per, n - lo))
            pq.write_table(part, os.path.join(tmp, f"shard_{i:04d}.parquet"),
                           row_group_size=16384)
        os.replace(tmp, path)  # atomic
    return path
