"""Text-side operators: HTML→text extraction (stateful actor stage),
language id, quality scoring, token counting, fingerprinting.

The extractor is the recast of the reference's stateful per-record
dissector stage (scapy import-time state, parser.py:21-23 /
_iter_pcap_dict parser.py:962-1043): a callable CLASS used with
``ds.map_batches(ExtractText, concurrency=N)`` so compilation happens
once per actor.  Output must be byte-identical per url to the pinned
extraction spec (EXTRACTOR_VERSION) — asserted in tests against the
corpus ground-truth ``text`` column.
"""

from __future__ import annotations

import hashlib
import html as _html
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

EXTRACTOR_VERSION = 1

_TAG_RE = re.compile(r"<[^>]*>")


def extract_text_one(html_bytes: bytes) -> str:
    """Pinned extraction spec v1: strip tags → decode entities →
    collapse whitespace.  Deterministic: no locale / dict-order deps."""
    s = html_bytes.decode("utf-8", errors="replace")
    s = _TAG_RE.sub(" ", s)
    s = _html.unescape(s)
    return " ".join(s.split())


class ExtractText:
    """Actor-pool stage: html binary column → text string column.

    Usage::

        ds.map_batches(ExtractText, batch_format="pyarrow",
                       concurrency=8, batch_size=2048)

    Adds ``text`` (extracted) and ``size`` (= len(html) bytes, the
    recast of the reference's per-packet ``len(pkt)``, parser.py:394),
    and drops ``html`` so the wide binary column never travels further
    down the pipeline.
    """

    def __init__(self, html_col: str = "html", out_col: str = "text", drop_html: bool = True):
        self.html_col = html_col
        self.out_col = out_col
        self.drop_html = drop_html
        self.tag_re = re.compile(r"<[^>]*>")  # compiled once per actor

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t[self.html_col]
        sizes = pc.binary_length(col)
        texts = [extract_text_one(v) for v in col.to_pylist()]
        if self.out_col in t.column_names:
            t = t.drop_columns([self.out_col])
        t = t.append_column(self.out_col, pa.array(texts, type=pa.string()))
        t = t.append_column("size", pc.cast(sizes, pa.int64()))
        if self.drop_html:
            t = t.drop_columns([self.html_col])
        return t


_EXTRACT_SINGLETON: "ExtractText | None" = None


def extract_text_batch(t: pa.Table) -> pa.Table:
    """Stateless-task form of the extractor: state (compiled patterns)
    lives in a per-worker-process lazy singleton, so plain map_batches
    tasks get actor-like state amortization without actor-pool spin-up.
    Output is identical to the ``ExtractText`` actor stage."""
    global _EXTRACT_SINGLETON
    if _EXTRACT_SINGLETON is None:
        _EXTRACT_SINGLETON = ExtractText(drop_html=True)
    return _EXTRACT_SINGLETON(t)


# ---------------------------------------------------------------------------
# language id (n-gram heuristic), quality, tokens, fingerprint
# ---------------------------------------------------------------------------

# tiny per-language marker sets (public stopword knowledge)
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "for", "it"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"},
    "fr": {"le", "la", "les", "et", "de", "un", "une", "est", "pas", "pour"},
    "es": {"el", "la", "los", "las", "y", "de", "que", "es", "un", "una"},
}

_WORD_RE = re.compile(r"\w+", re.UNICODE)
_PUNCT_RE = re.compile(r"[^\w\s]", re.UNICODE)
# BPE-ish token regex (GPT-2 style simplification, public pattern)
_BPE_RE = re.compile(r"\w+|[^\w\s]")


class LangId:
    """Heuristic language id: stopword-marker voting with a CJK
    codepoint check; deterministic.  Rows-only correctness (no SQL)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word_re = re.compile(r"[a-zà-ÿäöüß]+")

    def _one(self, s: str) -> str:
        if any("一" <= ch <= "鿿" for ch in s[:200]):
            return "zh"
        words = self.word_re.findall(s.lower()[:1000])
        best, best_n = "en", -1
        for lang, markers in _LANG_MARKERS.items():
            n = sum(1 for w in words if w in markers)
            if n > best_n:
                best, best_n = lang, n
        return best

    def __call__(self, t: pa.Table) -> pa.Table:
        preds = [self._one(s) for s in t[self.text_col].to_pylist()]
        return t.append_column("pred_lang", pa.array(preds, type=pa.string()))


def token_count_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace token count + BPE-ish token count per row (vectorized
    where Arrow kernels allow)."""
    texts = t[text_col].to_pylist()
    ws = np.fromiter((len(s.split()) for s in texts), dtype=np.int64, count=len(texts))
    bpe = np.fromiter((len(_BPE_RE.findall(s)) for s in texts), dtype=np.int64, count=len(texts))
    t = t.append_column("n_tokens", pa.array(ws))
    t = t.append_column("n_bpe_tokens", pa.array(bpe))
    return t


def quality_score_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Length / punctuation / digit / uppercase / stopword ratios —
    the classic web-text quality heuristics, all SQL-expressible."""
    texts = t[text_col].to_pylist()
    n = len(texts)
    length = np.fromiter((len(s) for s in texts), dtype=np.int64, count=n)
    punct = np.fromiter((len(_PUNCT_RE.findall(s)) for s in texts), dtype=np.int64, count=n)
    digit = np.fromiter((sum(c.isdigit() for c in s) for s in texts), dtype=np.int64, count=n)
    upper = np.fromiter((sum(c.isupper() for c in s) for s in texts), dtype=np.int64, count=n)
    denom = np.maximum(length, 1).astype(np.float64)
    t = t.append_column("n_chars_calc", pa.array(length))
    t = t.append_column("punct_ratio", pa.array(punct / denom))
    t = t.append_column("digit_ratio", pa.array(digit / denom))
    t = t.append_column("upper_ratio", pa.array(upper / denom))
    return t


def fingerprint_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Deterministic document fingerprint: sha1 of utf-8 bytes (exact
    dedup key) + a 64-bit rolling-hash style fingerprint."""
    texts = t[text_col].to_pylist()
    sha = [hashlib.sha1(s.encode("utf-8")).hexdigest() for s in texts]
    roll = np.empty(len(texts), dtype=np.uint64)
    for i, s in enumerate(texts):
        h = np.uint64(1469598103934665603)  # FNV-1a 64
        for b in s.encode("utf-8"):
            h = np.uint64((int(h) ^ b) * 1099511628211 & 0xFFFFFFFFFFFFFFFF)
        roll[i] = h
    t = t.append_column("text_sha1", pa.array(sha, type=pa.string()))
    t = t.append_column("fingerprint", pa.array(roll.astype(np.int64)))
    return t
