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
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

GEN_VERSION = 1

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


def _render_html(tokens: list[str], rng: np.random.Generator) -> bytes:
    """Render tokens into noisy HTML whose pinned extraction equals
    ``" ".join(tokens)`` exactly."""
    ws = [" ", "\n", "\t", "  ", "\n  "]
    parts = ["<html><head><title></title></head><body>"]
    for i, tok in enumerate(tokens):
        r = rng.integers(0, 10)
        esc = _escape(tok)
        if r < 2:
            parts.append(f"<p class='c{r}'>{esc}</p>")
        elif r < 4:
            parts.append(f"<b>{esc}</b>")
        else:
            parts.append(esc)
        parts.append(ws[int(rng.integers(0, len(ws)))])
    parts.append("</body></html>")
    return "".join(parts).encode("utf-8")


def gen_corpus(
    n_rows: int,
    seed: int = 7,
    *,
    start_epoch: int = 1_600_000_000,
    avg_rows_per_url: int = 40,
) -> pa.Table:
    rng = np.random.default_rng(seed)
    n_urls = max(4, n_rows // avg_rows_per_url)

    # row budget: url 0 is hot (20%), 10% of urls are singletons
    n_hot = n_rows // 5
    n_single = max(1, n_urls // 10)
    remaining = n_rows - n_hot - n_single
    others = n_urls - 1 - n_single
    base = np.maximum(1, rng.poisson(max(2, remaining // max(1, others)), others))
    # adjust to match total
    diff = remaining - int(base.sum())
    base[0] = max(2, base[0] + diff)
    counts = np.r_[n_hot, base, np.ones(n_single, dtype=np.int64)].astype(np.int64)

    urls = []
    for i in range(len(counts)):
        dom = _DOMAINS[i % len(_DOMAINS)]
        urls.append(f"https://{dom}/page/{i}")

    url_col: list[str] = []
    ts_col: list[int] = []  # epoch microseconds
    html_col: list[bytes] = []
    text_col: list[str] = []
    lang_col: list[str] = []

    for ui, cnt in enumerate(counts):
        cnt = int(cnt)
        url = urls[ui]
        lang = _LANGS[int(rng.integers(0, len(_LANGS)))]
        # session structure: bursts separated by gaps straddling 600 s
        t = float(start_epoch + rng.integers(0, 30 * 86400))
        times: list[float] = []
        i = 0
        while i < cnt:
            burst = min(cnt - i, int(rng.integers(1, max(2, cnt // 2 + 2))))
            for _ in range(burst):
                times.append(t)
                step_kind = rng.integers(0, 10)
                if step_kind == 0:
                    dt = 0.0  # duplicate timestamp
                elif step_kind == 1:
                    dt = float(rng.choice([599.9, 600.0, 600.1]))  # boundary
                else:
                    dt = float(rng.uniform(0.5, 240.0))
                t += dt
                i += 1
                if i >= cnt:
                    break
            t += float(rng.uniform(650.0, 90000.0))  # inter-session gap > 600
        times = times[:cnt]
        for tv in times:
            ntok = int(rng.integers(0, 24))
            tokens = [str(_VOCAB[int(rng.integers(0, len(_VOCAB)))]) for _ in range(ntok)]
            text = " ".join(tokens)
            html = _render_html(tokens, rng)
            url_col.append(url)
            ts_col.append(int(round(tv * 1e6)))
            html_col.append(html)
            text_col.append(text)
            lang_col.append(lang)

    order = np.argsort(np.array(ts_col), kind="stable")  # corpus arrives time-ordered overall
    tbl = pa.table(
        {
            "url": pa.array(np.array(url_col, dtype=object)[order].tolist(), type=pa.string()),
            "warc_ts": pa.array(np.array(ts_col)[order], type=pa.timestamp("us")),
            "html": pa.array([html_col[i] for i in order], type=pa.binary()),
            "text": pa.array([text_col[i] for i in order], type=pa.string()),
            "lang": pa.array([lang_col[i] for i in order], type=pa.string()),
        }
    )
    return tbl


def corpus_path(n_rows: int, seed: int = 7, cache_dir: str = "/tmp/netml_ray_corpus") -> str:
    """Generate-once cached corpus parquet (deterministic by key)."""
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"corpus_v{GEN_VERSION}_n{n_rows}_s{seed}.parquet")
    if not os.path.exists(path):
        tmp = path + ".tmp"
        pq.write_table(gen_corpus(n_rows, seed), tmp)
        os.replace(tmp, path)  # atomic
    return path
