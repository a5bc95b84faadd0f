"""Training-data curation operators: normalization, PII scan/redaction,
repetition signals, deterministic sampling, per-key caps, benchmark
decontamination.

These extend the reference's per-record transform family (netml's
parser/feature map stages, SURVEY §2 M-ops) with the curation stages a
web-scale LLM training-data pipeline needs.  All hot paths are
vectorized: Arrow compute kernels (RE2 regexes — the same engine DuckDB
uses, so oracle parity is exact) or numpy passes over the column's
concatenated utf-8 buffer (``textops._rolling_hash_segments``).

Scale notes per op are in each docstring; the common theme is that
every op here is a *narrow* ``map_batches`` stage — no shuffle — except
``limit_per_key`` (one hash-partition shuffle, the same primitive the
sessionizer uses) and the decontamination builders, whose benchmark
side is small by construction (a fixed eval set) and is broadcast via
``ray.put`` once, never re-shipped per batch.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


# ---------------------------------------------------------------------------
# Text normalization
# ---------------------------------------------------------------------------


def normalize_batch(t: pa.Table, text_col: str = "text",
                    out_col: str = "text_norm") -> pa.Table:
    """Lowercase → collapse whitespace runs to one space → trim.

    Three Arrow kernels, zero Python per row.  SQL-parity:
    ``trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))`` (both sides
    are RE2)."""
    col = t[text_col]
    norm = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(pc.utf8_lower(col), r"\s+", " "))
    return t.append_column(out_col, norm)


# ---------------------------------------------------------------------------
# PII scan / redaction
# ---------------------------------------------------------------------------

# (name, RE2 pattern, replacement token) — applied in this order.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\+?\d[\d().\- ]{7,}\d", "<PHONE>"),
)


def pii_scan_batch(t: pa.Table, text_col: str = "text",
                   *, redact: bool = True) -> pa.Table:
    """Count PII pattern hits per document and (optionally) emit a
    redacted text column.

    Counts are over the ORIGINAL text; redaction applies the patterns
    sequentially in ``PII_PATTERNS`` order (email before ipv4 before
    ssn before phone, so dotted quads don't get half-eaten by the
    phone pattern).  Pure ``pc.count_substring_regex`` /
    ``pc.replace_substring_regex`` — RE2 on both the Ray and DuckDB
    side, so semantics (leftmost, non-overlapping) agree exactly."""
    col = t[text_col]
    for name, pat, _tok in PII_PATTERNS:
        t = t.append_column(
            f"n_{name}", pc.count_substring_regex(col, pat).cast(pa.int64()))
    if redact:
        red = col
        for _name, pat, tok in PII_PATTERNS:
            red = pc.replace_substring_regex(red, pat, tok)
        t = t.append_column("text_redacted", red)
    return t


# ---------------------------------------------------------------------------
# Word segmentation + n-gram hashing (shared by repetition + decontam)
# ---------------------------------------------------------------------------

_MIX = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd multiplier


def _word_hashes(col) -> tuple[np.ndarray, np.ndarray]:
    """``(word_hash, row_id)`` for every whitespace token of a string
    column, in document order — dictionary-encode once, hash the
    (small) dictionary, gather by code.

    Tokenization parity with the SQL oracle:
    ``regexp_split_to_array(trim(text), '\\s+')`` — an all-whitespace
    (or empty) document yields ONE empty token, which downstream n-gram
    logic neutralizes via its n-1 pair counts."""
    from netml_ray.textops import Tokenized

    tok = Tokenized(col)
    return tok.word_hashes(), tok.rowid


def _ngram_hashes(wh: np.ndarray, rowid: np.ndarray, n: int,
                  return_pos: bool = False):
    """Combined hash for every WITHIN-ROW run of ``n`` consecutive word
    hashes: ``h = ((w0·M + w1)·M + w2)…`` mod 2⁶⁴.  Returns
    ``(gram_hash, gram_row)`` — plus each gram's START index in the
    token stream when ``return_pos`` — collision probability at 64
    bits is negligible against exact-string oracles at any test
    scale."""
    total = len(wh)
    if total < n:
        out = (np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64))
        return out + (np.empty(0, dtype=np.int64),) if return_pos else out
    m = total - n + 1
    gh = np.zeros(m, dtype=np.uint64)
    for k in range(n):
        gh = gh * _MIX + wh[k:k + m]
    valid = rowid[:m] == rowid[n - 1:]
    if return_pos:
        return gh[valid], rowid[:m][valid], np.flatnonzero(valid)
    return gh[valid], rowid[:m][valid]


def repetition_batch(t: pa.Table, text_col: str = "text",
                     *, n: int = 2, round_to: int | None = 9,
                     tok=None) -> pa.Table:
    """Gopher-style repetition signals (Rae et al. '21 §A1.1, public):
    per document, the fraction of duplicate word-``n``-grams
    (``1 − distinct/total``) and the fraction taken by the single most
    frequent ``n``-gram.  High values flag boilerplate / spam.

    Fully vectorized: dictionary-encoded words, n-gram combine, one
    ``lexsort`` + run-length pass per batch — no per-row Python.  For
    ``n=2`` grams are EXACT packed code pairs (no hashing at all); a
    doc with < n+1 words (or empty text) scores 0.  Pass ``tok`` to
    reuse a tokenization computed for other signals on the batch.
    """
    from netml_ray.textops import Tokenized

    nrows = t.num_rows
    if tok is None:
        tok = Tokenized(t[text_col])
    rowid = tok.rowid
    if n == 2:
        c = tok.codes
        if len(c) >= 2:
            gh = (c[:-1] << np.int64(32)) | c[1:]
            valid = rowid[:-1] == rowid[1:]
            gh, grow = gh[valid], rowid[:-1][valid]
        else:
            gh = np.empty(0, dtype=np.int64)
            grow = np.empty(0, dtype=np.int64)
    else:
        gh, grow = _ngram_hashes(tok.word_hashes(), rowid, n)
    total = np.bincount(grow, minlength=nrows).astype(np.int64)
    distinct = np.zeros(nrows, dtype=np.int64)
    top = np.zeros(nrows, dtype=np.int64)
    if len(gh):
        order = np.lexsort((gh, grow))
        gs, rs = gh[order], grow[order]
        newrun = np.ones(len(gs), dtype=bool)
        newrun[1:] = (rs[1:] != rs[:-1]) | (gs[1:] != gs[:-1])
        run_row = rs[newrun]
        distinct = np.bincount(run_row, minlength=nrows).astype(np.int64)
        run_ids = np.cumsum(newrun) - 1
        run_len = np.bincount(run_ids).astype(np.int64)
        np.maximum.at(top, run_row, run_len)
    denom = np.maximum(total, 1).astype(np.float64)
    dup = np.where(total > 0, 1.0 - distinct / denom, 0.0)
    topf = np.where(total > 0, top / denom, 0.0)
    if round_to is not None:
        dup = np.round(dup, round_to)
        topf = np.round(topf, round_to)
    t = t.append_column(f"n_{n}grams", pa.array(total))
    t = t.append_column(f"dup_{n}gram_frac", pa.array(dup))
    t = t.append_column(f"top_{n}gram_frac", pa.array(topf))
    return t


# ---------------------------------------------------------------------------
# Deterministic hash sampling
# ---------------------------------------------------------------------------


def hash_sample_batch(t: pa.Table, id_col: str = "doc_id", *,
                      pct: int = 25,
                      mult: int = 2654435761) -> pa.Table:
    """Deterministic multiplicative-hash sample: keep rows where
    ``(id·mult mod 2³²) mod 100 < pct`` (Knuth's multiplicative hash).

    Reproducible (same ids → same sample on every run / any cluster
    size), streaming (no shuffle, no RNG state), SQL-expressible.
    The multiply is taken in uint64 (wraps mod 2⁶⁴); the SQL-oracle
    int64 form agrees for ids < 2³¹."""
    ids = np.asarray(t[id_col].to_numpy(zero_copy_only=False),
                     dtype=np.uint64)
    bucket = (ids * np.uint64(mult)) % np.uint64(1 << 32) % np.uint64(100)
    return t.filter(pa.array(bucket < np.uint64(pct)))


def weighted_sample_batch(t: pa.Table, key_col: str = "source",
                          id_col: str = "doc_id", *,
                          weights: dict[str, int],
                          default_pct: int = 0,
                          mult: int = 2654435761) -> pa.Table:
    """Data mixing: per-key deterministic sampling rates (e.g. keep
    100% of wikipedia, 25% of common-crawl, 5% of forums).  Same
    multiplicative-hash bucket as ``hash_sample_batch``, with the
    keep threshold looked up per key — dictionary-encode the key
    column once, map the (small) dictionary through ``weights``,
    gather by code.  Shuffle-free, partition-invariant, reproducible.
    """
    ids = np.asarray(t[id_col].to_numpy(zero_copy_only=False),
                     dtype=np.uint64)
    bucket = (ids * np.uint64(mult)) % np.uint64(1 << 32) % np.uint64(100)
    col = t[key_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    enc = col.dictionary_encode()
    pct = np.array([weights.get(v, default_pct)
                    for v in enc.dictionary.to_pylist()], dtype=np.uint64)
    thresh = pct[enc.indices.to_numpy(zero_copy_only=False)]
    return t.filter(pa.array(bucket < thresh))


# ---------------------------------------------------------------------------
# Per-key cap (e.g. max N docs per domain)
# ---------------------------------------------------------------------------


def limit_per_key(ds, key: str, n: int, *, order_by: list[str],
                  num_partitions: int | None = None):
    """Keep the first ``n`` rows of each key ordered by ``order_by`` —
    the "cap documents per domain" curation op.

    ONE hash-partition shuffle (the sessionizer's primitive): every key
    lands whole in one partition, the partition fn sorts once and ranks
    all keys with a single vectorized run-length pass.  Skewed keys
    cost O(rows in key) numpy work, not O(rows) Python."""
    from netml_ray.partition import partition_map

    def _cap(t: pa.Table) -> pa.Table:
        m = t.num_rows
        if m == 0:
            return t
        arr = t[key]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        starts = np.ones(m, dtype=bool)
        if m > 1:
            neq = pc.not_equal(arr.slice(1, m - 1), arr.slice(0, m - 1))
            starts[1:] = neq.to_numpy(zero_copy_only=False)
        sidx = np.flatnonzero(starts)
        start_rep = np.repeat(sidx, np.diff(np.append(sidx, m)))
        rank = np.arange(m, dtype=np.int64) - start_rep
        return t.filter(pa.array(rank < n))

    return partition_map(ds, key, _cap, sort_by=[key] + list(order_by),
                         num_partitions=num_partitions)


def stratified_sample(ds, key: str, id_col: str, frac: float, *,
                      num_partitions: int | None = None):
    """EXACT stratified sampling: keep ``ceil(frac * n_k)`` rows of
    every stratum ``k`` — unlike the per-row hash samplers above
    (whose per-stratum counts are only binomially close to ``frac``),
    the proportion is hit exactly per stratum, which is what a
    data-mixing recipe with hard token budgets wants.  Rows are chosen
    deterministically by md5(id) order (ties by id), so the sample is
    reproducible and partition-invariant.  One keyed hash exchange +
    a vectorized per-run rank pass (the ``limit_per_key`` shape with a
    per-run threshold).  md5 parity with DuckDB's
    ``('0x' || substr(md5(id), 1, 15))::BIGINT`` (the repo's standard
    bit-equal trick)."""
    import hashlib

    from netml_ray.partition import partition_map

    def _pre(t: pa.Table) -> pa.Table:
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if not pa.types.is_string(ids.type):
            ids = pc.cast(ids, pa.string())
        h = np.fromiter(
            (int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
             for s in ids.to_pylist()),
            dtype=np.int64, count=t.num_rows)
        return t.append_column("__md5", pa.array(h))

    def _fn(t: pa.Table) -> pa.Table:
        m = t.num_rows
        if m == 0:
            return t.drop_columns(["__md5"])
        arr = t[key]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        starts = np.ones(m, dtype=bool)
        if m > 1:
            starts[1:] = pc.not_equal(
                arr.slice(1, m - 1), arr.slice(0, m - 1)).to_numpy(
                zero_copy_only=False)
        sidx = np.flatnonzero(starts)
        runlen = np.diff(np.append(sidx, m))
        start_rep = np.repeat(sidx, runlen)
        rank = np.arange(m, dtype=np.int64) - start_rep
        keep_n = np.ceil(frac * runlen.astype(np.float64))
        return t.filter(pa.array(rank < np.repeat(keep_n, runlen))) \
                .drop_columns(["__md5"])

    return partition_map(ds.map_batches(_pre, batch_format="pyarrow"),
                         key, _fn, sort_by=[key, "__md5", id_col],
                         num_partitions=num_partitions)


def weighted_reservoir_topk(ds, id_col: str, weight_col: str, k: int, *,
                            round_to: int | None = 9) -> pa.Table:
    """Weighted sampling WITHOUT replacement via the
    Efraimidis–Spirakis A-Res key (u^(1/w), compared as the monotone
    ``ln(u)/w``): every row draws a deterministic uniform u from
    md5(id) (the repo's standard 15-hex-digit / 2^60 bit-equal trick)
    and the k LARGEST keys win — the one-pass, shuffle-free way to
    draw a deterministic weight-proportional sample for data-mixing
    recipes ("sample 10k docs proportional to length").  Weights must
    be strictly positive.

    Scale shape: a stateless map stage scores each block, then
    :func:`netml_ray.sketches.top_k` keeps k per block and merges on
    the driver — O(blocks × k) rows move, no sort exchange.  The
    ``es_key`` column is rounded AFTER selection (value-hash parity;
    ordering uses the unrounded key on both sides)."""
    import hashlib

    from netml_ray.sketches import top_k

    def _score(t: pa.Table) -> pa.Table:
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if not pa.types.is_string(ids.type):
            ids = pc.cast(ids, pa.string())
        h = np.fromiter(
            (int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
             for s in ids.to_pylist()),
            dtype=np.int64, count=t.num_rows)
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(
            np.float64)
        if t.num_rows and not (w > 0).all():
            raise ValueError(
                f"weighted_reservoir_topk: {weight_col} must be "
                "strictly positive (ln(u)/w is undefined at w<=0)")
        with np.errstate(divide="ignore"):
            key = np.log(h.astype(np.float64) / float(1 << 60)) / w
        return t.append_column("es_key", pa.array(key))

    out = top_k(ds.map_batches(_score, batch_format="pyarrow"), k,
                [("es_key", "descending"), (id_col, "ascending")])
    if round_to is not None and out.num_rows:
        i = out.column_names.index("es_key")
        out = out.set_column(
            i, "es_key",
            pa.array(np.round(out["es_key"].to_numpy(), round_to)))
    return out


# ---------------------------------------------------------------------------
# Document chunking (embedding / RAG prep)
# ---------------------------------------------------------------------------


def chunk_batch(t: pa.Table, text_col: str = "text", *,
                size: int = 100, overlap: int = 20,
                id_col: str = "doc_id") -> pa.Table:
    """Split each document into word windows of ``size`` with
    ``overlap`` words of context between consecutive chunks — the
    standard embedding/RAG prep stage.

    Emits ``(id, chunk_id, chunk_text, chunk_words)`` rows; chunk text
    is the single-space join of the window's words (whitespace runs
    normalized).  Fully vectorized: one tokenization, word byte
    offsets by prefix sum, and ALL chunk texts materialized with a
    single fancy-index gather over the normalized byte buffer — no
    per-chunk Python.  Docs with no words emit no chunks."""
    from netml_ray.textops import Tokenized, _utf8_segments

    if overlap >= size:
        raise ValueError("overlap must be < size")
    step = size - overlap
    norm = pc.utf8_trim_whitespace(pc.replace_substring_regex(
        t[text_col], r"\s+", " "))
    tok = Tokenized(norm, pattern=" ")
    n = tok.n_words                                     # per row
    nrows = len(n)
    # chunk counts: ceil(max(n - overlap, ·)/step), min 1 for n > 0
    k = np.zeros(nrows, dtype=np.int64)
    pos = n > 0
    k[pos] = np.maximum(1, -(-(n[pos] - overlap) // step))
    total = int(k.sum())
    if total == 0:
        return pa.table({
            id_col: pa.array([], type=t.schema.field(id_col).type),
            "chunk_id": pa.array([], type=pa.int64()),
            "chunk_text": pa.array([], type=pa.string()),
            "chunk_words": pa.array([], type=pa.int64()),
        })
    crow = np.repeat(np.arange(nrows), k)               # row per chunk
    bounds = np.zeros(nrows + 1, dtype=np.int64)
    np.cumsum(k, out=bounds[1:])
    cid = np.arange(total) - np.repeat(bounds[:-1], k)  # chunk_id per chunk
    w_start = cid * step                                # word window
    w_end = np.minimum(w_start + size, n[crow])
    # word byte-offsets within each row's normalized text: word i starts
    # at prefix[i] (cumsum of len+1 across the row)
    dlen = pc.binary_length(tok.dictionary).to_numpy(
        zero_copy_only=False).astype(np.int64)
    wlen = dlen[tok.codes]                              # bytes per word
    pref = np.zeros(len(wlen) + 1, dtype=np.int64)
    np.cumsum(wlen + 1, out=pref[1:])                   # +1 separators
    row_word0 = tok.offsets[:-1]                        # first word index per row
    local_start = pref[row_word0[crow] + w_start] - pref[row_word0[crow]]
    local_end = pref[row_word0[crow] + w_end] - pref[row_word0[crow]] - 1
    data, offs = _utf8_segments(norm)
    g_start = offs[crow] + local_start
    g_end = offs[crow] + local_end
    clen = g_end - g_start
    out_total = int(clen.sum())
    out_offs = np.zeros(total + 1, dtype=np.int64)
    np.cumsum(clen, out=out_offs[1:])
    # one gather materializes every chunk's bytes
    intra = np.arange(out_total) - np.repeat(out_offs[:-1], clen)
    out_data = data[np.repeat(g_start, clen) + intra]
    chunk_text = pa.Array.from_buffers(
        pa.large_binary(), total,
        [None, pa.py_buffer(out_offs), pa.py_buffer(out_data)],
    ).cast(pa.large_utf8()).cast(pa.string())
    ids = t[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    return pa.table({
        id_col: ids.take(pa.array(crow)),
        "chunk_id": pa.array(cid),
        "chunk_text": chunk_text,
        "chunk_words": pa.array(w_end - w_start),
    })


def chunk_documents(ds, text_col: str = "text", *, size: int = 100,
                    overlap: int = 20, id_col: str = "doc_id"):
    """Dataset-level chunking stage (narrow flat-map; no shuffle)."""
    return ds.map_batches(
        lambda t: chunk_batch(t, text_col, size=size, overlap=overlap,
                              id_col=id_col),
        batch_format="pyarrow")


def segment_dedup(docs, *, size: int = 16, text_col: str = "text",
                  id_col: str = "doc_id",
                  num_partitions: int | None = None):
    """Segment-level (CCNet-style paragraph/line) dedup with text
    rebuild: split each doc into non-overlapping ``size``-word
    segments, keep each distinct segment string only at its globally
    first occurrence (ordered by ``(id, segment ordinal)``), and
    rebuild every doc from its surviving segments.

    The within-corpus analog of ``remove_duplicate_spans`` boilerplate
    removal: repeated headers/footers/navboxes vanish from every doc
    but the first.  Returns one row per input doc:
    ``(id, text, n_kept, n_total)`` — docs whose every segment was a
    repeat come back with ``text=''``.

    Scale shape: a narrow chunk explode (``chunk_batch``, overlap 0),
    ONE hash exchange keyed on the segment string (exact dedup — no
    collision risk; at 10^12 docs swap the key for a 128-bit digest),
    one ``id``-keyed exchange to rebuild, and one co-partitioned left
    join to restore fully-deduped docs.  Both partition fns are
    run-segmented (fast-path pinned in ``test_pmap_fast_path``)."""
    from netml_ray.joins import hash_join
    from netml_ray.partition import partition_map

    exploded = docs.map_batches(
        lambda t: chunk_batch(t, text_col, size=size, overlap=0,
                              id_col=id_col),
        batch_format="pyarrow").drop_columns(["chunk_words"])

    def _totals(t: pa.Table) -> pa.Table:
        norm = pc.utf8_trim_whitespace(pc.replace_substring_regex(
            t[text_col], r"\s+", " "))
        nw = pc.count_substring(norm, " ").to_numpy(
            zero_copy_only=False).astype(np.int64) + 1
        nw[pc.equal(norm, "").to_numpy(zero_copy_only=False)] = 0
        n_total = -(-nw // size)
        return pa.table({id_col: t[id_col],
                         "n_total": pa.array(n_total)})

    totals = docs.map_batches(_totals, batch_format="pyarrow")

    def _first_occurrence(t: pa.Table) -> pa.Table:
        # sorted by (chunk_text, id, chunk_id): keep each run's head
        if not t.num_rows:
            return t
        seg = t["chunk_text"].combine_chunks()
        head = np.r_[True, pc.not_equal(
            seg.slice(1), seg.slice(0, len(seg) - 1))
            .to_numpy(zero_copy_only=False)]
        return t.filter(pa.array(head))

    kept = partition_map(exploded, "chunk_text", _first_occurrence,
                         num_partitions=num_partitions,
                         sort_by=["chunk_text", id_col, "chunk_id"])

    def _rebuild(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({
                id_col: t[id_col],
                "text": pa.array([], pa.string()),
                "n_kept": pa.array([], pa.int64())})
        ids = t[id_col].combine_chunks()
        run = np.r_[True, pc.not_equal(
            ids.slice(1), ids.slice(0, len(ids) - 1))
            .to_numpy(zero_copy_only=False)]
        starts = np.flatnonzero(run)
        offs = np.r_[starts, t.num_rows].astype(np.int32)
        segs = pa.ListArray.from_arrays(
            pa.array(offs), t["chunk_text"].combine_chunks())
        return pa.table({
            id_col: ids.take(pa.array(starts)),
            "text": pc.binary_join(segs, " "),
            "n_kept": pa.array(np.diff(offs).astype(np.int64))})

    rebuilt = partition_map(kept, id_col, _rebuild,
                            num_partitions=num_partitions,
                            sort_by=[id_col, "chunk_id"])

    out = hash_join(totals, rebuilt, id_col, how="left",
                    num_partitions=num_partitions)

    def _coalesce(t: pa.Table) -> pa.Table:
        return pa.table({
            id_col: t[id_col],
            "text": pc.coalesce(t["text"], ""),
            "n_kept": pc.coalesce(t["n_kept"], pa.scalar(0, pa.int64())),
            "n_total": t["n_total"]})

    return out.map_batches(_coalesce, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Sequence packing (LLM batch prep)
# ---------------------------------------------------------------------------


def pack_sequences(ds, *, budget: int, token_col: str = "n_tokens",
                   id_col: str = "doc_id",
                   num_partitions: int | None = None):
    """Pack documents into training sequences: assign each doc to a
    bin so that a bin's total token count stays ≤ ``budget``
    (deterministic next-fit in ``id_col`` order per partition) — the
    standard packing stage before tokenized examples hit a trainer.

    ONE hash-partition shuffle; inside a partition the packer walks
    bin BOUNDARIES with ``searchsorted`` over the token cumsum —
    O(#bins) binary searches, not O(#docs) Python.  A doc larger than
    ``budget`` gets a bin of its own (callers can filter on
    ``bin_tokens > budget``).  Bin ids are globally unique:
    ``(partition_id << 40) | local_bin``.  Sequential semantics make
    this non-SQL (rows-only driver check; pytest pins the packing)."""
    from netml_ray.partition import PID, partition_map

    def _pack(t: pa.Table) -> pa.Table:
        pid = int(t[PID][0].as_py()) if t.num_rows else 0
        t = t.drop_columns([PID])
        toks = np.asarray(t[token_col].to_numpy(zero_copy_only=False),
                          dtype=np.int64)
        n = len(toks)
        csum = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(toks, out=csum[1:])
        starts = []
        i = 0
        while i < n:
            j = int(np.searchsorted(csum, csum[i] + budget, side="right")) - 1
            j = max(j, i + 1)  # oversized doc → its own bin
            starts.append(i)
            i = j
        starts.append(n)
        bounds = np.asarray(starts, dtype=np.int64)
        sizes = np.diff(bounds)
        nbins = len(sizes)
        local = np.repeat(np.arange(nbins, dtype=np.int64), sizes)
        bin_id = (np.int64(pid) << np.int64(40)) | local
        bin_tok = np.repeat(csum[bounds[1:]] - csum[bounds[:-1]], sizes)
        t = t.append_column("bin_id", pa.array(bin_id))
        t = t.append_column("bin_tokens", pa.array(bin_tok))
        return t

    return partition_map(ds, id_col, _pack, sort_by=[id_col],
                         num_partitions=num_partitions, drop_pid=False)


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------


def collect_snippets(docs, *, id_col: str = "doc_id",
                     text_col: str = "text", every: int = 97,
                     start: int = 7, length: int = 32) -> list[str]:
    """Deterministic stand-in benchmark side: a fixed substring of every
    ``every``-th document (by id).  In production this is the external
    eval-set snippet list — small by nature, hence collected to the
    driver and broadcast (same contract as the label CSV join,
    joins.py:30)."""

    def _cut(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        lens = pc.utf8_length(t[text_col]).to_numpy(zero_copy_only=False)
        keep = (ids % every == 0) & (np.asarray(lens) >= start + length + 1)
        sub = pc.utf8_slice_codeunits(t[text_col], start, start + length)
        return pa.table({"snippet": sub.filter(pa.array(keep))})

    rows = docs.map_batches(_cut, batch_format="pyarrow").take_all()
    return sorted({r["snippet"] for r in rows})


BENCH_BROADCAST_BUDGET = 1 << 28  # 256 MiB


def _guard_broadcast_bytes(nbytes: int, what: str,
                           budget: int = BENCH_BROADCAST_BUDGET) -> None:
    """Loud failure when a 'benchmark' side is too big to broadcast.

    The decontamination operators assume the EVAL side is small (it is
    ray.put once and read by every task).  A mis-pointed input — e.g.
    handing the full training corpus as the benchmark — used to degrade
    silently into an enormous broadcast; now it raises with the fix."""
    if nbytes > budget:
        raise ValueError(
            f"{what} is {nbytes / 2**20:.0f} MiB — too large to broadcast "
            f"as a benchmark side (budget {budget / 2**20:.0f} MiB). This "
            f"usually means the 'benchmark' input points at a full corpus; "
            f"pass the eval set only, or raise max_broadcast_bytes "
            f"explicitly if the eval side really is this big.")


def decontaminate_substring(ds, snippets: list[str],
                            text_col: str = "text",
                            out_col: str = "contaminated", *,
                            max_broadcast_bytes: int = BENCH_BROADCAST_BUDGET):
    """Mark documents containing ANY benchmark snippet as an exact
    substring.

    The snippet list is ``ray.put`` once and read by every task (never
    re-shipped per batch); the scan is one ``pc.match_substring``
    Arrow kernel per snippet — O(|snippets|) kernel launches, each a
    C-speed pass.  Fine for real eval sets (10³–10⁵ snippets); beyond
    that an Aho–Corasick automaton in an actor pool is the swap-in."""
    import ray

    snippets = list(snippets)
    _guard_broadcast_bytes(sum(len(s.encode()) for s in snippets),
                           f"snippet list ({len(snippets)} snippets)",
                           max_broadcast_bytes)
    ref = ray.put(snippets)

    def _mark(t: pa.Table) -> pa.Table:
        snips = ray.get(ref)
        mask = np.zeros(t.num_rows, dtype=bool)
        col = t[text_col]
        for s in snips:
            hit = pc.match_substring(col, s).to_numpy(zero_copy_only=False)
            mask |= np.asarray(hit, dtype=bool)
        return t.append_column(out_col, pa.array(mask))

    return ds.map_batches(_mark, batch_format="pyarrow")


def collect_benchmark_gram_hashes(docs, *, id_col: str = "doc_id",
                                  text_col: str = "text", every: int = 97,
                                  n: int = 13,
                                  max_broadcast_bytes: int =
                                  BENCH_BROADCAST_BUDGET) -> np.ndarray:
    """Sorted uint64 hash set of every word-``n``-gram of the benchmark
    docs (ids ≡ 0 mod ``every``) — map-side partial sets per batch, one
    tiny driver union.  Production analog: hash the eval set once,
    broadcast the (small) sorted array."""

    def _grams(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        sel = t.filter(pa.array(ids % every == 0))
        wh, rowid = _word_hashes(sel[text_col])
        gh, _ = _ngram_hashes(wh, rowid, n)
        return pa.table({"g": pa.array(np.unique(gh))})

    parts = docs.map_batches(_grams, batch_format="pyarrow").take_all()
    if not parts:
        return np.empty(0, dtype=np.uint64)
    out = np.unique(np.array([r["g"] for r in parts], dtype=np.uint64))
    _guard_broadcast_bytes(out.nbytes,
                           f"benchmark 13-gram hash set ({len(out)} grams)",
                           max_broadcast_bytes)
    return out


def curate_corpus(docs, *, lang: str = "en",
                  max_dup_2gram: float = 0.06,
                  max_top_2gram: float = 0.12,
                  snippet_every: int = 97,
                  decontam: str = "ngram",
                  mix_weights: dict | None = None,
                  mix_default_pct: int = 25,
                  max_per_source: int | None = None,
                  bench_grams: np.ndarray | None = None,
                  max_lm_bits: float | None = None,
                  lm_alpha: float = 0.5,
                  max_dup_span_frac: float | None = None,
                  span_n: int = 5,
                  span_min_count: int = 2,
                  text_col: str = "text",
                  id_col: str = "doc_id",
                  num_partitions: int | None = None):
    """End-to-end web-corpus curation — the canonical 100-TB pipeline,
    chaining the whole op family in the scale-correct order:

      1. ONE fused narrow pass (no shuffle): normalize → Gopher quality
         signals → repetition signals → language + quality +
         repetition filter → PII redaction.  Dropped rows never reach
         a shuffle; the original html/text column is carried only as
         far as the decontamination scan needs it.
      2. Benchmark decontamination — contaminated docs dropped.
         ``decontam="ngram"`` (default, the scale path): the GPT-3-style
         13-gram rule — O(corpus words) per batch regardless of
         benchmark size, one broadcast sorted hash array.
         ``decontam="substring"``: exact snippet containment — one
         ``match_substring`` kernel per snippet, viable only while the
         snippet list is small.
      3. Exact dedup on the REDACTED text (min-id survives) — the only
         payload-free shuffle in the plan (``(hash, id)`` travels).
      4. Final narrow pass: token/char counts + md5 content digest.
      5. Optional data mixing on the digested (payload-free) stream:
         ``mix_weights`` keeps each source at its deterministic rate
         (shuffle-free), ``max_per_source`` caps docs per source (one
         narrow shuffle of the digest rows).

    Returns a Dataset of
    ``(doc_id, lang, source, n_chars_clean, n_tokens, clean_md5)``.
    Fully SQL-expressible → oracle-backed end to end
    (``curate_corpus_docs`` in ``__ray_entry__``)."""
    kept = docs.map_batches(
        _pass1_factory(lang, max_dup_2gram, max_top_2gram, text_col, id_col),
        batch_format="pyarrow")
    if max_lm_bits is not None:
        # CCNet-style LM-quality stage: train the bigram model ONCE on
        # the RAW corpus (one narrow int64 count exchange), broadcast,
        # and drop surviving docs whose bits-per-bigram exceeds the
        # threshold — a narrow vectorized pass, no join.  Rounded to 6
        # decimals before the compare so the float-sum-order noise
        # between numpy reduceat and any re-implementation (the SQL
        # oracle) cannot flip a boundary doc.
        kept = _lm_bits_filter(kept, docs, max_lm_bits, lm_alpha, text_col)
    if max_dup_span_frac is not None:
        # RefinedWeb-style boilerplate stage: heavy word-n-gram set
        # from the RAW corpus (pruned inside the combine), broadcast,
        # and drop docs whose duplicated-span coverage fraction
        # exceeds the threshold.  Pure int/int double division on both
        # sides — bit-deterministic, no rounding hedge needed.
        kept = _dup_span_filter(kept, docs, max_dup_span_frac, span_n,
                                span_min_count, text_col)
    if decontam == "ngram":
        # production semantics: the benchmark/eval set is FIXED and
        # external — pass its precomputed gram hashes via bench_grams;
        # the default derives a deterministic stand-in from the corpus
        bench = bench_grams if bench_grams is not None else \
            collect_benchmark_gram_hashes(
                docs, id_col=id_col, text_col=text_col,
                every=snippet_every, n=13)
        kept = decontaminate_ngrams(kept, bench, text_col=text_col, n=13,
                                    out_col="contaminated")
    elif decontam == "substring":
        snips = collect_snippets(docs, id_col=id_col, text_col=text_col,
                                 every=snippet_every)
        kept = decontaminate_substring(kept, snips, text_col=text_col)
    else:
        raise ValueError(f"unknown decontam mode {decontam!r}")
    kept = kept.map_batches(
        lambda t: t.filter(pc.invert(t["contaminated"]))
        .drop_columns(["contaminated", text_col]),
        batch_format="pyarrow")
    out = _dedup_and_digest(kept, id_col, num_partitions)
    if mix_weights is not None:
        w = dict(mix_weights)
        out = out.map_batches(
            lambda t: weighted_sample_batch(t, "source", "doc_id",
                                            weights=w,
                                            default_pct=mix_default_pct),
            batch_format="pyarrow")
    if max_per_source is not None:
        out = limit_per_key(out, "source", max_per_source,
                            order_by=["doc_id"],
                            num_partitions=num_partitions)
    return out


def _lm_bits_filter(kept, docs, max_bits: float, alpha: float,
                    text_col: str):
    """Broadcast-model LM-quality filter over the surviving stream
    (model trained once on the raw ``docs``); NaN scores (<2-token
    docs) are kept — the length gates already own that regime."""
    import ray

    from netml_ray.partition import auto_concurrency
    from netml_ray.textstats import lm_bits_arrays, train_bigram_model

    model_ref = ray.put(train_bigram_model(docs, text_col=text_col,
                                           alpha=alpha))

    class _F:
        def __init__(self):
            self.m = ray.get(model_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            _, bits = lm_bits_arrays(self.m, t[text_col])
            keep = ~np.isfinite(bits) | (np.round(bits, 6) <= max_bits)
            return t.filter(pa.array(keep))

    return kept.map_batches(_F, batch_format="pyarrow",
                            concurrency=auto_concurrency())


def _dup_span_filter(kept, docs, max_frac: float, n: int, min_count: int,
                     text_col: str):
    """Broadcast heavy-gram duplicated-span filter over the surviving
    stream (heavy set built once on the raw ``docs`` — same probe
    shape as ``duplicate_span_stats``)."""
    import ray

    heavy = heavy_gram_hashes(docs, text_col=text_col, n=n,
                              min_count=min_count)
    ref = ray.put(np.asarray(heavy, dtype=np.uint64))

    def _f(t: pa.Table) -> pa.Table:
        bench = ray.get(ref)
        wh, rowid = _word_hashes(t[text_col])
        gh, grow = _ngram_hashes(wh, rowid, n)
        n_grams = np.bincount(grow, minlength=t.num_rows) \
            if len(grow) else np.zeros(t.num_rows, dtype=np.int64)
        n_dup = np.zeros(t.num_rows, dtype=np.int64)
        if len(gh) and len(bench):
            pos = np.searchsorted(bench, gh)
            pos[pos == len(bench)] = len(bench) - 1
            hits = bench[pos] == gh
            n_dup = np.bincount(grow[hits], minlength=t.num_rows)
        frac = n_dup / np.maximum(n_grams, 1)
        return t.filter(pa.array(frac <= max_frac))

    return kept.map_batches(_f, batch_format="pyarrow")


def _pass1_factory(lang: str, max_dup_2gram: float, max_top_2gram: float,
                   text_col: str, id_col: str):
    """The fused narrow curation pass (shared by the plain and the
    checkpointed pipeline): lang filter → normalize → Gopher +
    repetition (ONE shared tokenization) → filter → PII redact."""
    from netml_ray.textops import Tokenized, gopher_quality_batch

    pass1_schema = pa.schema([
        (id_col, pa.int64()), ("lang", pa.string()),
        ("source", pa.string()), (text_col, pa.string()),
        ("text_clean", pa.string()),
    ])

    def _pass1(t: pa.Table) -> pa.Table:
        # language filter first — it is one equality kernel and cuts
        # every later signal's input
        t = t.filter(pc.equal(t["lang"], lang))
        if t.num_rows == 0:
            return pass1_schema.empty_table()
        t = normalize_batch(t, text_col, "norm")
        # ONE tokenization (dictionary-encoded) feeds both Gopher and
        # repetition; norm is single-spaced so the plain split applies
        tok = Tokenized(t["norm"], pattern=" ")
        t = gopher_quality_batch(t, "norm", tok=tok)
        t = repetition_batch(t, "norm", round_to=None, tok=tok)
        keep = (
            np.asarray(t["gopher_keep"].to_numpy(zero_copy_only=False), bool)
            & (t["dup_2gram_frac"].to_numpy() <= max_dup_2gram)
            & (t["top_2gram_frac"].to_numpy() <= max_top_2gram)
        )
        sel = t.filter(pa.array(keep))
        red = sel["norm"]
        for _name, pat, token in PII_PATTERNS:
            red = pc.replace_substring_regex(red, pat, token)
        return pa.table({
            id_col: sel[id_col], "lang": sel["lang"],
            "source": sel["source"], text_col: sel[text_col],
            "text_clean": red,
        }).cast(pass1_schema)

    return _pass1


def _dedup_and_digest(kept, id_col: str, num_partitions: int | None):
    """Exact dedup on the redacted text (the chain's only shuffle —
    and it ships (hash, id), not payloads) + the final count/digest
    pass."""
    import hashlib

    from netml_ray.dedup import dedup_exact
    from netml_ray.partition import drop_empty_blocks

    # dedup_exact consumes its input TWICE (loser detection + anti
    # filter); without this materialize the whole narrow-pass chain
    # re-executes for each consumer (measured 2x wall).  What lands in
    # the object store is only the SURVIVING rows' narrow columns —
    # the checkpointed variant is the swap-in when even that exceeds
    # store+spill capacity.  Hash BEFORE the materialize so both
    # consumers reuse the column instead of re-digesting the text.
    from netml_ray.dedup import add_text_hash

    kept = drop_empty_blocks(add_text_hash(kept, "text_clean").materialize())
    kept = dedup_exact(kept, "text_clean", id_col,
                       num_partitions=num_partitions)

    def _final(t: pa.Table) -> pa.Table:
        clean = t["text_clean"]
        n_chars = pc.utf8_length(clean).cast(pa.int64())
        trimmed = pc.utf8_trim_whitespace(clean)
        n_tok = pc.list_value_length(
            pc.split_pattern_regex(trimmed, r"\s+")).cast(pa.int64())
        empty = pc.equal(trimmed, "")
        n_tok = pc.if_else(empty, pa.scalar(0, type=pa.int64()), n_tok)
        md5 = pa.array([hashlib.md5(s.encode("utf-8")).hexdigest()
                        for s in clean.to_pylist()], type=pa.string())
        return pa.table({
            "doc_id": t[id_col], "lang": t["lang"], "source": t["source"],
            "n_chars_clean": n_chars, "n_tokens": n_tok, "clean_md5": md5,
        })

    return kept.map_batches(_final, batch_format="pyarrow")


def curation_funnel(docs, *, lang: str = "en",
                    max_dup_2gram: float = 0.06,
                    max_top_2gram: float = 0.12,
                    snippet_every: int = 97,
                    max_lm_bits: float | None = None,
                    lm_alpha: float = 0.5,
                    max_dup_span_frac: float | None = None,
                    span_n: int = 5,
                    span_min_count: int = 2,
                    text_col: str = "text",
                    id_col: str = "doc_id",
                    distinct_driver_threshold: int = 4_000_000) -> pa.Table:
    """Per-stage survival counts for the curation chain — the drop
    accounting every production pipeline needs before deleting 50% of
    a corpus.  ONE narrow pass emits per-batch partial counts plus the
    batch's unique redacted-text hashes; the scalar counts sum on the
    driver (one row per batch).  The deduped-stage count is exact
    COUNT(DISTINCT hash): below ``distinct_driver_threshold``
    survivors the per-batch hash blobs union on the driver (bounded,
    fast); above it the blobs explode into a narrow int64 column,
    hash-partition by value, and each partition reports its unique
    count — the driver only ever sums one small int per partition, so
    a 10^12-row corpus never materializes per-doc data driver-side.
    Forced-path equality is pytest-pinned.  Stages: input → lang →
    quality (Gopher) → repetition → decontaminated → deduped."""
    import ray

    from netml_ray.dedup import _sha64
    from netml_ray.textops import Tokenized, gopher_quality_batch

    bench = collect_benchmark_gram_hashes(
        docs, id_col=id_col, text_col=text_col, every=snippet_every, n=13)
    bench_ref = ray.put(np.sort(np.asarray(bench, dtype=np.uint64)))
    model_ref = None
    if max_lm_bits is not None:
        from netml_ray.textstats import train_bigram_model

        model_ref = ray.put(train_bigram_model(docs, text_col=text_col,
                                               alpha=lm_alpha))
    heavy_ref = None
    if max_dup_span_frac is not None:
        heavy_ref = ray.put(np.asarray(
            heavy_gram_hashes(docs, text_col=text_col, n=span_n,
                              min_count=span_min_count), dtype=np.uint64))

    def _span_keep(t: pa.Table, heavy: np.ndarray) -> np.ndarray:
        wh, rowid = _word_hashes(t[text_col])
        gh, grow = _ngram_hashes(wh, rowid, span_n)
        n_grams = np.bincount(grow, minlength=t.num_rows) \
            if len(grow) else np.zeros(t.num_rows, dtype=np.int64)
        n_dup = np.zeros(t.num_rows, dtype=np.int64)
        if len(gh) and len(heavy):
            pos = np.searchsorted(heavy, gh)
            pos[pos == len(heavy)] = len(heavy) - 1
            n_dup = np.bincount(grow[heavy[pos] == gh],
                                minlength=t.num_rows)
        return n_dup / np.maximum(n_grams, 1) <= max_dup_span_frac

    def _partial(t: pa.Table) -> pa.Table:
        n_input = t.num_rows
        lang_ok = np.asarray(pc.equal(t["lang"], lang).to_numpy(
            zero_copy_only=False), dtype=bool)
        sel = t.filter(pa.array(lang_ok))
        sel = normalize_batch(sel, text_col, "norm")
        tok = Tokenized(sel["norm"], pattern=" ")
        sel = gopher_quality_batch(sel, "norm", tok=tok)
        sel = repetition_batch(sel, "norm", round_to=None, tok=tok)
        g_ok = np.asarray(sel["gopher_keep"].to_numpy(
            zero_copy_only=False), dtype=bool)
        r_ok = ((sel["dup_2gram_frac"].to_numpy() <= max_dup_2gram)
                & (sel["top_2gram_frac"].to_numpy() <= max_top_2gram))
        surv = sel.filter(pa.array(g_ok & r_ok))
        # optional scorer stages (same order as curate_corpus): LM
        # quality, then duplicated-span coverage — both broadcast
        # probes on the ORIGINAL text of the survivors
        n_lm = n_span = None
        if model_ref is not None:
            from netml_ray.textstats import lm_bits_arrays

            _, bits = lm_bits_arrays(ray.get(model_ref), surv[text_col])
            keep = ~np.isfinite(bits) | (np.round(bits, 6) <= max_lm_bits)
            surv = surv.filter(pa.array(keep))
            n_lm = surv.num_rows
        if heavy_ref is not None:
            surv = surv.filter(pa.array(_span_keep(surv,
                                                   ray.get(heavy_ref))))
            n_span = surv.num_rows
        marked = _ngram_mark(surv, ray.get(bench_ref), text_col, 13, "__c")
        clean_mask = ~np.asarray(marked["__c"].to_numpy(
            zero_copy_only=False), dtype=bool)
        final = marked.filter(pa.array(clean_mask))
        red = final["norm"]
        for _n, pat, tokrepl in PII_PATTERNS:
            red = pc.replace_substring_regex(red, pat, tokrepl)
        hashes = np.unique(_sha64(red.to_pylist()))
        return pa.table({
            "n_input": pa.array([n_input], type=pa.int64()),
            "n_lang": pa.array([int(lang_ok.sum())], type=pa.int64()),
            "n_quality": pa.array([int(g_ok.sum())], type=pa.int64()),
            "n_repetition": pa.array([int((g_ok & r_ok).sum())],
                                     type=pa.int64()),
            "n_lm_quality": pa.array([-1 if n_lm is None else n_lm],
                                     type=pa.int64()),
            "n_dup_spans": pa.array([-1 if n_span is None else n_span],
                                    type=pa.int64()),
            "n_decontaminated": pa.array([int(clean_mask.sum())],
                                         type=pa.int64()),
            "hashes": pa.array([hashes.tobytes()], type=pa.binary()),
        })

    count_cols = ["n_input", "n_lang", "n_quality", "n_repetition",
                  "n_lm_quality", "n_dup_spans", "n_decontaminated"]
    rows_ds = docs.map_batches(_partial, batch_format="pyarrow").materialize()
    crows = rows_ds.select_columns(count_cols).take_all()
    sums = {k: sum(r[k] for r in crows) for k in count_cols}

    if sums["n_decontaminated"] <= distinct_driver_threshold:
        hrows = rows_ds.select_columns(["hashes"]).take_all()
        n_dedup = len(np.unique(np.concatenate(
            [np.frombuffer(r["hashes"], dtype=np.int64) for r in hrows]))
            ) if hrows else 0
    else:
        from netml_ray.partition import partition_map

        def _explode(t: pa.Table) -> pa.Table:
            blobs = [np.frombuffer(b, dtype=np.int64)
                     for b in t["hashes"].to_pylist()]
            allh = (np.concatenate(blobs) if blobs
                    else np.empty(0, np.int64))
            return pa.table({"h": pa.array(allh, type=pa.int64())})

        h_ds = rows_ds.select_columns(["hashes"]).map_batches(
            _explode, batch_format="pyarrow")

        def _cnt(t: pa.Table) -> pa.Table:
            n = int(len(np.unique(t["h"].to_numpy()))) if t.num_rows else 0
            return pa.table({"n": pa.array([n], type=pa.int64())})

        n_dedup = sum(r["n"] for r in partition_map(
            h_ds, "h", _cnt).take_all())

    stages = ["input", "lang", "quality", "repetition"]
    counts = [sums["n_input"], sums["n_lang"], sums["n_quality"],
              sums["n_repetition"]]
    if max_lm_bits is not None:
        stages.append("lm_quality")
        counts.append(sums["n_lm_quality"])
    if max_dup_span_frac is not None:
        stages.append("dup_spans")
        counts.append(sums["n_dup_spans"])
    stages += ["decontaminated", "deduped"]
    counts += [sums["n_decontaminated"], n_dedup]
    return pa.table({"stage": pa.array(stages, type=pa.string()),
                     "n_docs": pa.array(counts, type=pa.int64())})


def curate_corpus_checkpointed(docs, out_dir: str, *, lang: str = "en",
                               max_dup_2gram: float = 0.06,
                               max_top_2gram: float = 0.12,
                               snippet_every: int = 97,
                               text_col: str = "text",
                               id_col: str = "doc_id",
                               num_partitions: int | None = None):
    """Resumable curation (north_rule: a killed 100-TB run must not
    start over): phase A — ALL narrow per-doc stages (lang/quality/
    repetition filters, PII redaction, 13-gram decontamination) —
    runs per hash(id) partition through ``checkpointed_partition_map``
    with atomic per-partition commits; a resume recomputes only
    unfinished partitions.  Phase B — the cheap global (hash, id)
    dedup + digest — recomputes from the checkpointed phase-A output
    every run (its cost is proportional to the SURVIVING rows'
    narrow columns, not the corpus).  Output ≡ ``curate_corpus``."""
    import ray

    from netml_ray.checkpoint import (checkpointed_partition_map,
                                      read_checkpointed)

    bench = collect_benchmark_gram_hashes(
        docs, id_col=id_col, text_col=text_col, every=snippet_every, n=13)
    bench_ref = ray.put(np.sort(np.asarray(bench, dtype=np.uint64)))
    pass1 = _pass1_factory(lang, max_dup_2gram, max_top_2gram,
                           text_col, id_col)

    def _fn_a(t: pa.Table) -> pa.Table:
        t = pass1(t)
        t = _ngram_mark(t, ray.get(bench_ref), text_col, 13, "contaminated")
        return t.filter(pc.invert(t["contaminated"])).drop_columns(
            ["contaminated", text_col])

    phase_a = os.path.join(out_dir, "phaseA")
    checkpointed_partition_map(
        docs, id_col, _fn_a, phase_a, num_partitions=num_partitions,
        input_desc="curate.phaseA",
        params={"lang": lang, "max_dup_2gram": max_dup_2gram,
                "max_top_2gram": max_top_2gram, "decontam": "13g",
                "snippet_every": snippet_every})
    return _dedup_and_digest(read_checkpointed(phase_a), id_col,
                             num_partitions)


def decontaminate_ngrams(ds, gram_hashes: np.ndarray, *,
                         text_col: str = "text", n: int = 13,
                         out_col: str = "contaminated_13g",
                         max_broadcast_bytes: int = BENCH_BROADCAST_BUDGET):
    """Mark documents sharing ANY word-``n``-gram with the benchmark
    set (the standard 13-gram training-set decontamination rule, e.g.
    GPT-3 App. C / PaLM — public).  Per batch: vectorized gram hashing
    + one ``np.searchsorted`` membership probe against the broadcast
    sorted array; per-row verdict via a bincount of hit rows."""
    import ray

    gram_hashes = np.sort(np.asarray(gram_hashes, dtype=np.uint64))
    _guard_broadcast_bytes(gram_hashes.nbytes,
                           f"benchmark gram-hash array ({len(gram_hashes)})",
                           max_broadcast_bytes)
    ref = ray.put(gram_hashes)

    def _mark(t: pa.Table) -> pa.Table:
        return _ngram_mark(t, ray.get(ref), text_col, n, out_col)

    return ds.map_batches(_mark, batch_format="pyarrow")


def _ngram_mark(t: pa.Table, bench: np.ndarray, text_col: str, n: int,
                out_col: str) -> pa.Table:
    """Batch-level n-gram contamination marker against a SORTED
    benchmark hash array (shared by the Dataset op and the
    checkpointed curation partition fn)."""
    wh, rowid = _word_hashes(t[text_col])
    gh, grow = _ngram_hashes(wh, rowid, n)
    out = np.zeros(t.num_rows, dtype=bool)
    if len(gh) and len(bench):
        pos = np.searchsorted(bench, gh)
        pos[pos == len(bench)] = len(bench) - 1
        hits = bench[pos] == gh
        out = np.bincount(grow[hits], minlength=t.num_rows) > 0
    return t.append_column(out_col, pa.array(out))


def heavy_gram_hashes(ds, *, text_col: str = "text", n: int = 5,
                      min_count: int = 2) -> np.ndarray:
    """Sorted hashes of every word-``n``-gram whose corpus-wide
    OCCURRENCE count is ≥ ``min_count``.

    Per-batch partial counts (vectorized gram hashing + ``np.unique``
    — the map-side combine) → one narrow ``(gram_hash, count)``
    hash-partitioned exchange (``partition_map`` + reduceat combine;
    Ray's sort-based groupby on comparable partial volumes measured
    ~4x slower — see textstats) → the ``min_count`` filter INSIDE the
    combine output, so only heavy grams are ever collected: that prune
    is what keeps the result broadcastable at web scale (boilerplate
    grams are a tiny fraction of all distinct grams)."""
    from netml_ray.partition import _collect_table, partition_map

    def _partial(t: pa.Table) -> pa.Table:
        wh, rowid = _word_hashes(t[text_col])
        gh, _ = _ngram_hashes(wh, rowid, n)
        if not len(gh):
            return pa.table({"g": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64())})
        u, c = np.unique(gh, return_counts=True)
        # int64 BIT-VIEW for the exchange: Ray's groupby round-trips
        # uint64 keys through Python ints and overflows C long
        return pa.table({"g": pa.array(u.view(np.int64)),
                         "c": pa.array(c.astype(np.int64))})

    def _combine(t: pa.Table) -> pa.Table:
        g = t["g"].to_numpy()
        c = t["c"].to_numpy()
        if not len(g):
            return pa.table({"g": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64())})
        order = np.argsort(g, kind="stable")
        gs, cs = g[order], c[order]
        starts = np.flatnonzero(np.r_[True, gs[1:] != gs[:-1]])
        sums = np.add.reduceat(cs, starts)
        keep = sums >= min_count
        return pa.table({"g": pa.array(gs[starts][keep]),
                         "c": pa.array(sums[keep].astype(np.int64))})

    agg = partition_map(ds.map_batches(_partial, batch_format="pyarrow"),
                        "g", _combine)
    t = _collect_table(agg.materialize(),
                       pa.schema([("g", pa.int64()), ("c", pa.int64())]))
    return np.sort(t["g"].to_numpy().view(np.uint64))


def duplicate_span_stats(ds, *, text_col: str = "text",
                         id_col: str = "doc_id", n: int = 5,
                         min_count: int = 2, heavy: np.ndarray | None = None):
    """Corpus-internal duplicated-span statistics per doc (the
    boilerplate signal behind RefinedWeb/CCNet-style span dedup):
    ``n_grams`` (word-``n``-gram positions), ``n_dup_spans`` (positions
    whose gram occurs ≥ ``min_count`` times corpus-wide) and
    ``dup_span_frac``.  Phase 1 builds the pruned heavy-gram set
    (``heavy_gram_hashes``); phase 2 is one broadcast +
    searchsorted-membership pass — the same probe shape as 13-gram
    decontamination, pointed at the corpus itself."""
    import ray

    if heavy is None:
        heavy = heavy_gram_hashes(ds, text_col=text_col, n=n,
                                  min_count=min_count)
    ref = ray.put(np.asarray(heavy, dtype=np.uint64))

    def _stats(t: pa.Table) -> pa.Table:
        bench = ray.get(ref)
        wh, rowid = _word_hashes(t[text_col])
        gh, grow = _ngram_hashes(wh, rowid, n)
        n_grams = np.bincount(grow, minlength=t.num_rows) \
            if len(grow) else np.zeros(t.num_rows, dtype=np.int64)
        n_dup = np.zeros(t.num_rows, dtype=np.int64)
        if len(gh) and len(bench):
            pos = np.searchsorted(bench, gh)
            pos[pos == len(bench)] = len(bench) - 1
            hits = bench[pos] == gh
            n_dup = np.bincount(grow[hits], minlength=t.num_rows)
        frac = n_dup / np.maximum(n_grams, 1)
        return pa.table({
            id_col: t[id_col],
            "n_grams": pa.array(n_grams.astype(np.int64)),
            "n_dup_spans": pa.array(n_dup.astype(np.int64)),
            "dup_span_frac": pa.array(frac.astype(np.float64)),
        })

    return ds.map_batches(_stats, batch_format="pyarrow")


def remove_duplicate_spans(ds, *, text_col: str = "text",
                           id_col: str = "doc_id", n: int = 5,
                           min_count: int = 2,
                           heavy: np.ndarray | None = None):
    """Boilerplate-span REMOVAL (the rewrite side of
    ``duplicate_span_stats``): every word covered by at least one
    word-``n``-gram occurring ≥ ``min_count`` times corpus-wide is
    dropped, and each doc's remaining words are re-joined with single
    spaces.  Returns ``(id, text_clean, n_dropped_words)``.

    Phase 2 is one broadcast + vectorized pass: gram membership by
    searchsorted, word coverage via a +1/-1 difference array over the
    token stream (a gram starting at stream index p covers p..p+n-1,
    always within one row by construction), and reconstruction as ONE
    ``pc.binary_join`` over a rebuilt list array — no per-row Python."""
    import ray

    import pyarrow.compute as pc

    from netml_ray.textops import Tokenized

    if heavy is None:
        heavy = heavy_gram_hashes(ds, text_col=text_col, n=n,
                                  min_count=min_count)
    ref = ray.put(np.asarray(heavy, dtype=np.uint64))

    def _rewrite(t: pa.Table) -> pa.Table:
        bench = ray.get(ref)
        tok = Tokenized(t[text_col])
        wh = tok.word_hashes()
        gh, _, gpos = _ngram_hashes(wh, tok.rowid, n, return_pos=True)
        total = len(tok.codes)
        covered = np.zeros(total + 1, dtype=np.int64)
        if len(gh) and len(bench):
            pos = np.searchsorted(bench, gh)
            pos[pos == len(bench)] = len(bench) - 1
            hit_start = gpos[bench[pos] == gh]
            np.add.at(covered, hit_start, 1)
            np.add.at(covered, np.minimum(hit_start + n, total), -1)
        covered = np.cumsum(covered[:-1]) > 0
        live = tok.n_words[tok.rowid] > 0 if total else \
            np.zeros(0, dtype=bool)
        keep = live & ~covered
        # rebuild per-row word lists from the kept tokens
        kept_per_row = (np.bincount(tok.rowid[keep], minlength=t.num_rows)
                        if total else np.zeros(t.num_rows, dtype=np.int64))
        offsets = np.zeros(t.num_rows + 1, dtype=np.int32)
        np.cumsum(kept_per_row, out=offsets[1:])
        words = tok.dictionary.take(pa.array(tok.codes[keep]))
        lst = pa.ListArray.from_arrays(pa.array(offsets),
                                       words.cast(pa.string()))
        clean = pc.binary_join(lst, " ")
        dropped = (np.bincount(tok.rowid[live & covered],
                               minlength=t.num_rows)
                   if total else np.zeros(t.num_rows, dtype=np.int64))
        return pa.table({
            id_col: t[id_col],
            "text_clean": clean,
            "n_dropped_words": pa.array(dropped.astype(np.int64)),
        })

    return ds.map_batches(_rewrite, batch_format="pyarrow")


def temperature_sample(ds, key_col: str = "source",
                       id_col: str = "doc_id", *,
                       frac: float = 0.5,
                       mult: int = 2654435761):
    """Temperature-based source mixing (the multilingual-LM data
    recipe: sampling share ∝ (source share)^α, α = 0.5): rare sources
    are up-weighted, dominant ones down-weighted, overall keep
    fraction ≈ ``frac``.  Per-source keep rate =
    min(1, √n_s / Σ√n · frac · N / n_s), floored to a 0..1000
    per-mille threshold over the same multiplicative-hash bucket as
    ``weighted_sample_batch`` — deterministic, partition-invariant,
    reproducible.

    α is pinned at 0.5 because ``sqrt`` is IEEE correctly-rounded on
    every engine (bit-identical thresholds on Ray and the SQL
    oracle); other exponents would ride libm ``pow`` and need a
    rounding hedge at the floor boundary.

    Shape: ONE narrow per-batch count partial (O(sources) rows, no
    shuffle) folded on the driver, then one shuffle-free filter pass
    with the per-source thresholds riding the closure."""
    counts: dict = {}
    for bt in ds.select_columns([key_col]) \
                .map_batches(
                    lambda t: pa.table(
                        pc.value_counts(t[key_col].combine_chunks())
                        .flatten(),
                        names=["k", "n"]),
                    batch_size=None, batch_format="pyarrow") \
                .iter_batches(batch_size=None, batch_format="pyarrow"):
        for k, n in zip(bt["k"].to_pylist(), bt["n"].to_pylist()):
            counts[k] = counts.get(k, 0) + n
    if not counts:
        return ds
    keys = sorted(counts)
    c = np.array([counts[k] for k in keys], dtype=np.float64)
    big_n = c.sum()
    sw = np.sqrt(c).sum()
    # same left-to-right op order as the SQL oracle
    rate = np.minimum(1.0, np.sqrt(c) / sw * frac * big_n / c)
    thresh = {k: int(np.floor(1000.0 * r))
              for k, r in zip(keys, rate)}

    def _filter(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col].to_numpy(zero_copy_only=False),
                         dtype=np.uint64)
        bucket = (ids * np.uint64(mult)) % np.uint64(1 << 32) \
            % np.uint64(1000)
        col = t[key_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        enc = col.dictionary_encode()
        th = np.array([thresh.get(v, 0)
                       for v in enc.dictionary.to_pylist()],
                      dtype=np.uint64)
        return t.filter(pa.array(
            bucket < th[enc.indices.to_numpy(zero_copy_only=False)]))

    return ds.map_batches(_filter, batch_format="pyarrow")


def decontaminate_jaccard(ds, bench, *, text_col: str = "text",
                          id_col: str = "doc_id", n: int = 3,
                          tau: float = 0.5):
    """Third decontamination mode (beside substring and 13-gram-hit):
    flag any doc whose word-``n``-gram set has Jaccard ≥ ``tau``
    against ANY benchmark document — the near-duplicate-of-eval rule
    (GPT-3 appendix C uses the same set-overlap family).  EXACT, not
    MinHash: the benchmark side is small by construction, so its
    shingle sets broadcast whole and every doc computes true
    intersections in one vectorized pass (sorted-array searchsorted
    per benchmark; 64-bit gram hashes, the decontamination-hash
    collision precedent).

    ``bench`` is a list of benchmark text strings.  Returns the input
    with ``max_jaccard`` (rounded 9) and ``contaminated`` appended."""
    import ray

    from netml_ray.textops import Tokenized

    def _grams(texts):
        # the SAME Tokenized/word-hash pipeline the scan side uses, so
        # gram sets are bit-equal across the broadcast boundary
        if not texts:
            return []
        col = pa.array(list(texts), pa.string())
        tok = Tokenized(pc.utf8_trim_whitespace(
            pc.replace_substring_regex(col, r"\s+", " ")))
        wh = tok.word_hashes()
        rowid = tok.rowid
        live = tok.n_words[rowid] > 0
        wh, rowid = wh[live], rowid[live]
        out = []
        for r in range(len(texts)):
            hs = wh[rowid == r]
            if len(hs) < n:
                continue
            g = hs[:len(hs) - n + 1].copy()
            for j in range(1, n):
                g = g * np.uint64(0x9E3779B97F4A7C15) \
                    + hs[j:len(hs) - n + 1 + j]
            out.append(np.unique(g))
        return out

    bench_sets = _grams(bench)
    _guard_broadcast_bytes(sum(b.nbytes for b in bench_sets),
                           "decontaminate_jaccard benchmark")
    bref = ray.put(bench_sets)

    class _Flag:
        def __init__(self):
            self.bench = ray.get(bref)

        def __call__(self, t: pa.Table) -> pa.Table:
            nrows = t.num_rows
            mj = np.zeros(nrows, dtype=np.float64)
            if nrows and self.bench:
                tok = Tokenized(pc.utf8_trim_whitespace(
                    pc.replace_substring_regex(t[text_col],
                                               r"\s+", " ")))
                wh = tok.word_hashes()
                rowid = tok.rowid
                live = tok.n_words[rowid] > 0
                wh, rowid = wh[live], rowid[live]
                if len(wh) >= n:
                    ok = rowid[:len(rowid) - n + 1] \
                        == rowid[n - 1:]
                    g = wh[:len(wh) - n + 1].copy()
                    for j in range(1, n):
                        g = g * np.uint64(0x9E3779B97F4A7C15) \
                            + wh[j:len(wh) - n + 1 + j]
                    g, rows = g[ok], rowid[:len(rowid) - n + 1][ok]
                    if len(g):
                        # distinct grams per doc
                        order = np.lexsort((g.view(np.int64), rows))
                        g, rows = g[order], rows[order]
                        keep = np.r_[True, (rows[1:] != rows[:-1])
                                     | (g[1:] != g[:-1])]
                        g, rows = g[keep], rows[keep]
                        dn = np.bincount(rows, minlength=nrows) \
                            .astype(np.float64)
                        for bs in self.bench:
                            pos = np.clip(
                                np.searchsorted(bs, g), 0,
                                len(bs) - 1)
                            hit = (bs[pos] == g).astype(np.float64)
                            inter = np.zeros(nrows)
                            np.add.at(inter, rows, hit)
                            denom = dn + float(len(bs)) - inter
                            with np.errstate(invalid="ignore"):
                                jac = np.where(denom > 0,
                                               inter / denom, 0.0)
                            np.maximum(mj, jac, out=mj)
            t = t.append_column("max_jaccard",
                                pa.array(np.round(mj, 9)))
            return t.append_column("contaminated",
                                   pa.array(mj >= tau))

    from netml_ray.partition import auto_concurrency

    return ds.map_batches(_Flag, batch_format="pyarrow",
                          concurrency=auto_concurrency())
