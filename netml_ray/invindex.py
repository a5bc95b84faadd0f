"""Sharded inverted index + boolean keyword search.

Boolean retrieval over a document corpus, built Ray-Data-first:

  build   one narrow ``(token, doc_id)`` exchange — per-batch partials
          emit each doc's DISTINCT tokens (the map-side dedup that
          keeps the shuffle at one row per posting, not per
          occurrence) → hash-partition by token → each partition
          writes ONE deterministically-named parquet shard of
          ``(token, npost, postings_z, tfs_z, dls_z[, pos_z])`` rows:
          sorted doc ids delta+varint-compressed per segment (the
          classic IR postings layout), tf/dl varint, and — when built
          with ``positions=True`` — per-posting 1-based token
          positions (delta+varint per posting) enabling phrase
          queries.
          A task retry overwrites its shard (never duplicates), and
          ``meta.json`` records the exact file list — the same
          manifest discipline as ``similarity.IVFIndex``.

  search  a term's shard is ``hash(term) % P`` — a query reads ONLY
          its terms' shards (parquet row-group predicate pushdown on
          the sorted ``token`` column), then intersects/unions the
          sorted postings with ``np.intersect1d`` / ``union1d``.
          Read bytes scale with terms requested, never corpus size.

All I/O routes through ``pyarrow.fs`` (URI or ``filesystem=``) so
shards land on shared storage on a real cluster.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from netml_ray.similarity import _fs_exists, _resolve_fs

__all__ = ["InvertedIndex", "encode_varint", "decode_varint"]


# ---------------------------------------------------------------------------
# delta+varint codec (the classic IR postings layout, e.g. Lucene's
# VInt / Zobel & Moffat 2006 "Inverted files for text search engines")
# ---------------------------------------------------------------------------

def encode_varint(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """LEB128-encode a uint64 array → ``(bytes, nbytes_per_value)``.

    Vectorized: one pass per byte position (≤10), no per-value Python.
    ``nbytes_per_value`` lets callers slice the byte stream into
    per-row blobs without re-scanning."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    nb = np.ones(len(v), dtype=np.int64)
    for k in range(1, 10):
        nb += (v >= (np.uint64(1) << np.uint64(7 * k))).astype(np.int64)
    out = np.zeros(int(nb.sum()), dtype=np.uint8)
    starts = np.cumsum(nb) - nb
    rem = v.copy()
    for k in range(10):
        mask = nb > k
        if not mask.any():
            break
        idx = starts[mask] + k
        byte = (rem[mask] & np.uint64(0x7F)).astype(np.uint8)
        cont = (nb[mask] > (k + 1)).astype(np.uint8)
        out[idx] = byte | (cont << np.uint8(7))
        rem[mask] >>= np.uint64(7)
    return out, nb


def decode_varint(buf) -> np.ndarray:
    """Decode a LEB128 byte stream back to uint64 — vectorized via a
    terminator-flag prefix scan + one ``bitwise_or.reduceat``."""
    b = np.frombuffer(bytes(buf), dtype=np.uint8)
    if not len(b):
        return np.empty(0, dtype=np.uint64)
    term = (b & np.uint8(0x80)) == 0
    starts = np.r_[np.int64(0), np.flatnonzero(term)[:-1] + 1]
    vid = np.r_[np.int64(0), np.cumsum(term)[:-1]]
    pos = np.arange(len(b)) - starts[vid]
    contrib = ((b.astype(np.uint64) & np.uint64(0x7F))
               << (np.uint64(7) * pos.astype(np.uint64)))
    return np.bitwise_or.reduceat(contrib, starts)


def _delta_encode(flat: np.ndarray, group_starts: np.ndarray) -> np.ndarray:
    """Per-group delta encoding: first value of each group absolute,
    the rest gaps (groups are ascending runs)."""
    flat = np.ascontiguousarray(flat, dtype=np.int64)
    if not len(flat):
        return flat.astype(np.uint64)
    d = np.empty(len(flat), dtype=np.int64)
    d[0] = flat[0]
    d[1:] = flat[1:] - flat[:-1]
    d[group_starts] = flat[group_starts]
    return d.astype(np.uint64)


def _delta_decode(vals: np.ndarray, group_starts: np.ndarray) -> np.ndarray:
    """Inverse of ``_delta_encode`` — segmented cumsum (vectorized:
    one global cumsum minus the per-group offset)."""
    v = vals.astype(np.int64)
    if not len(v):
        return v
    c = np.cumsum(v)
    # offset to subtract for each group: cumsum just before the group
    # start (0 for the first group)
    ends = np.r_[group_starts[1:], len(v)]
    counts = ends - group_starts
    base = np.zeros(len(group_starts), dtype=np.int64)
    base[1:] = c[group_starts[1:] - 1]
    return c - np.repeat(base, counts)


class InvertedIndex:
    """Materialized token → sorted-postings index.

    Layout::

        index_dir/
          meta.json                # num_shards, id_col, files, n_docs,
                                   # codec, positions, index_bytes
          shard=<s>/data.parquet   # (token, npost, postings_z, tfs_z,
                                   # dls_z[, pos_z]) sorted by token;
                                   # *_z = delta+varint binary blobs
    """

    def __init__(self, index_dir: str, meta: dict, filesystem=None):
        self.fs, self.index_dir = _resolve_fs(index_dir, filesystem)
        self.meta = meta

    # -- construction --------------------------------------------------
    @staticmethod
    def build(ds, index_dir: str, *, text_col: str = "text",
              id_col: str = "doc_id", num_shards: int | None = None,
              max_postings: int = 1_000_000, positions: bool = False,
              filesystem=None) -> "InvertedIndex":
        import json

        import pyarrow.parquet as pq

        from netml_ray.partition import default_num_partitions, partition_map

        fs, root = _resolve_fs(index_dir, filesystem)
        if num_shards is None:
            num_shards = default_num_partitions()
        n_docs = ds.count()

        def _postings_partial(t: pa.Table) -> pa.Table:
            # vectorized distinct-(doc, token) pairs with per-pair term
            # frequency and per-doc length (the BM25 payload):
            # dictionary-encode the token stream, unique over
            # (row, code), gather strings from the small dictionary
            from netml_ray.textops import Tokenized

            tok = Tokenized(t[text_col])
            live = tok.n_words[tok.rowid] > 0
            codes, rowid = tok.codes[live], tok.rowid[live]
            if not len(codes):
                cols = {"token": pa.array([], type=pa.string()),
                        id_col: pa.array([], type=pa.int64()),
                        "tf": pa.array([], type=pa.int64()),
                        "dl": pa.array([], type=pa.int64())}
                if positions:
                    cols["pos"] = pa.array(
                        [], type=pa.large_list(pa.int64()))
                return pa.table(cols)
            d = len(tok.dictionary)
            key = rowid * np.int64(d) + codes
            pres, tf = np.unique(key, return_counts=True)
            rows = pres // d
            id_np = t[id_col].to_numpy().astype(np.int64)
            cols = {
                "token": tok.dictionary.take(pa.array(pres % d))
                .cast(pa.string()),
                id_col: pa.array(id_np[rows]),
                "tf": pa.array(tf.astype(np.int64)),
                "dl": pa.array(tok.n_words[rows].astype(np.int64))}
            if positions:
                # 1-based within-doc token positions (matches SQL
                # generate_subscripts), grouped per (doc, token) pair
                # in the SAME sorted order np.unique assigned above
                within = (np.arange(len(rowid), dtype=np.int64)
                          - np.searchsorted(rowid, rowid) + 1)
                order = np.lexsort((within, key))
                offs = np.r_[np.int64(0), np.cumsum(tf)]
                cols["pos"] = pa.LargeListArray.from_arrays(
                    pa.array(offs, type=pa.int64()),
                    pa.array(within[order], type=pa.int64()))
            return pa.table(cols)

        pairs = (ds.select_columns([id_col, text_col])
                 .map_batches(_postings_partial, batch_format="pyarrow"))
        fs.create_dir(root, recursive=True)

        def _write(t: pa.Table) -> pa.Table:
            # one partition owns its tokens entirely (hash-partitioned
            # by token), so this shard's file is written exactly once;
            # drop_pid=False hands us __pid = the shard id
            from netml_ray.partition import PID

            sid = int(t[PID][0].as_py()) if t.num_rows else -1
            t = (t.drop_columns([PID])
                 .sort_by([("token", "ascending"), (id_col, "ascending")]))
            tok = t["token"]
            ids = t[id_col].to_numpy()
            # run-length by token → postings lists; a run longer than
            # max_postings is SPLIT into segment rows (a stop-word's
            # postings at 10^12 docs must not become one giant list
            # cell — search concatenates a token's segments back)
            enc = tok.combine_chunks().dictionary_encode()
            codes = enc.indices.to_numpy()
            starts = (np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
                      if len(codes) else np.empty(0, dtype=np.int64))
            bounds = np.r_[starts, len(codes)]
            run_len = np.diff(bounds)
            n_seg = -(-run_len // max_postings)
            rep_start = np.repeat(bounds[:-1], n_seg)
            seg_ix = (np.arange(int(n_seg.sum()))
                      - np.repeat(np.cumsum(n_seg) - n_seg, n_seg))
            seg_starts = (rep_start + seg_ix * max_postings).astype(np.int64)
            utoks = tok.take(pa.array(seg_starts))
            npost = np.r_[seg_starts[1:], len(codes)] - seg_starts

            def _blobs(vals: np.ndarray, delta: bool,
                       val_starts: np.ndarray) -> pa.Array:
                # delta(optional)+varint encode the whole column once,
                # then slice the byte stream into one binary blob per
                # token-segment row (``val_starts`` = each segment's
                # first value index).  int64 byte offsets (large
                # binary): a shard may exceed 2^31 bytes at scale.
                enc = (_delta_encode(vals, val_starts) if delta
                       else np.ascontiguousarray(vals, dtype=np.uint64))
                buf, nb = encode_varint(enc)
                blen = (np.add.reduceat(nb, val_starts)
                        if len(nb) else np.zeros(0, dtype=np.int64))
                boffs = np.r_[np.int64(0), np.cumsum(blen)]
                return pa.LargeBinaryArray.from_buffers(
                    pa.large_binary(), len(blen),
                    [None, pa.py_buffer(boffs.astype(np.int64)),
                     pa.py_buffer(buf)])

            cols = {"token": utoks,
                    "npost": pa.array(npost.astype(np.int64)),
                    "postings_z": _blobs(ids, True, seg_starts),
                    "tfs_z": _blobs(t["tf"].to_numpy(), False, seg_starts),
                    "dls_z": _blobs(t["dl"].to_numpy(), False, seg_starts)}
            if positions:
                flat = (t["pos"].combine_chunks().flatten()
                        .to_numpy().astype(np.int64))
                tf_np = t["tf"].to_numpy()
                pair_val_starts = np.cumsum(tf_np) - tf_np
                # positions delta-reset per PAIR (each (doc,token)
                # posting decodes independently); blob boundary per
                # SEGMENT row = byte range of its pairs' values
                enc = _delta_encode(flat, pair_val_starts)
                buf, nb = encode_varint(enc)
                seg_val_starts = pair_val_starts[seg_starts]
                blen = (np.add.reduceat(nb, seg_val_starts)
                        if len(nb) else np.zeros(0, dtype=np.int64))
                boffs = np.r_[np.int64(0), np.cumsum(blen)]
                cols["pos_z"] = pa.LargeBinaryArray.from_buffers(
                    pa.large_binary(), len(blen),
                    [None, pa.py_buffer(boffs.astype(np.int64)),
                     pa.py_buffer(buf)])
            out = pa.table(cols)
            if out.num_rows == 0 or sid < 0:
                return pa.table({"shard": pa.array([], type=pa.int64()),
                                 "file": pa.array([], type=pa.string()),
                                 "tokens": pa.array([], type=pa.int64()),
                                 "tok_sum": pa.array([], type=pa.int64()),
                                 "nbytes": pa.array([], type=pa.int64())})
            sdir = f"{root}/shard={sid}"
            fs.create_dir(sdir, recursive=True)
            tmp = f"{sdir}/.data.parquet.tmp"
            pq.write_table(out, tmp, filesystem=fs)
            fs.move(tmp, f"{sdir}/data.parquet")
            fsize = fs.get_file_info(f"{sdir}/data.parquet").size or 0
            return pa.table({"shard": pa.array([sid], type=pa.int64()),
                             "file": pa.array([f"shard={sid}/data.parquet"],
                                              type=pa.string()),
                             "tokens": pa.array([out.num_rows],
                                                type=pa.int64()),
                             "tok_sum": pa.array(
                                 [int(t["tf"].to_numpy().sum())],
                                 type=pa.int64()),
                             "nbytes": pa.array([int(fsize)],
                                                type=pa.int64())})

        marker = partition_map(pairs, "token", _write,
                               num_partitions=num_shards,
                               drop_pid=False,  # shard = partition, never fast-path
                               driver_bytes=0)
        written = marker.to_pandas()
        files = {str(int(r["shard"])): r["file"]
                 for _, r in written.iterrows()}
        meta = {"num_shards": int(num_shards), "id_col": id_col,
                "n_docs": int(n_docs), "max_postings": int(max_postings),
                "total_tokens": int(written["tok_sum"].sum()),
                "codec": "delta-varint", "positions": bool(positions),
                "index_bytes": int(written["nbytes"].sum()),
                "files": files}
        with fs.open_output_stream(f"{root}/meta.json") as f:
            f.write(json.dumps(meta).encode())
        return InvertedIndex(root, meta, filesystem=fs)

    @staticmethod
    def load(index_dir: str, filesystem=None) -> "InvertedIndex":
        import json

        fs, root = _resolve_fs(index_dir, filesystem)
        with fs.open_input_stream(f"{root}/meta.json") as f:
            meta = json.loads(f.read().decode())
        missing = [p for p in meta["files"].values()
                   if not _fs_exists(fs, f"{root}/{p}")]
        if missing:
            raise ValueError(f"index at {root} is missing shards "
                             f"{missing[:5]} — rebuild the index")
        return InvertedIndex(root, meta, filesystem=fs)

    # -- query ---------------------------------------------------------
    def _shard_of(self, term: str) -> int:
        from netml_ray.hashing import hash_column

        return int(hash_column(pa.array([term], type=pa.string()))
                   % np.uint64(self.meta["num_shards"]))

    def _term_rows(self, term: str, columns=None) -> pa.Table | None:
        """The token's segment rows from its ONE shard file (parquet
        row-group predicate pushdown on the sorted ``token`` column);
        None when the term is absent."""
        import pyarrow.dataset as pads

        if self.meta.get("codec") != "delta-varint":
            raise ValueError(
                f"index at {self.index_dir} predates the delta-varint "
                f"postings layout — rebuild the index")
        path = self.meta["files"].get(str(self._shard_of(term)))
        if path is None:
            return None
        dset = pads.dataset(f"{self.index_dir}/{path}", filesystem=self.fs)
        t = dset.to_table(filter=pads.field("token") == term,
                          columns=columns)
        return t if t.num_rows else None

    @staticmethod
    def _decode_col(t: pa.Table, col: str, delta: bool) -> np.ndarray:
        # one blob per segment row; delta groups reset per row, so each
        # row decodes independently and the concatenation (rows are in
        # token order, each segment ascending) is already sorted
        parts = []
        for buf in t[col].to_pylist():
            v = decode_varint(buf)
            parts.append(_delta_decode(v, np.zeros(1, dtype=np.int64))
                         if delta else v.astype(np.int64))
        return (np.concatenate(parts) if parts
                else np.empty(0, dtype=np.int64))

    def postings(self, term: str) -> np.ndarray:
        """Sorted doc ids containing ``term`` (reads ONE shard file,
        pushed down to the row groups covering the token)."""
        t = self._term_rows(term, ["token", "postings_z"])
        if t is None:
            return np.empty(0, dtype=np.int64)
        return self._decode_col(t, "postings_z", True)

    def postings_tf(self, term: str):
        """(sorted doc ids, per-doc tf, per-doc length) for ``term`` —
        the BM25 payload, still one shard read."""
        t = self._term_rows(term, ["token", "postings_z", "tfs_z",
                                   "dls_z"])
        if t is None:
            return (np.empty(0, dtype=np.int64),) * 3
        return (self._decode_col(t, "postings_z", True),
                self._decode_col(t, "tfs_z", False),
                self._decode_col(t, "dls_z", False))

    def postings_positions(self, term: str):
        """(sorted doc ids, per-doc occurrence count, flat 1-based
        positions) — positions group ``i`` spans
        ``flat[cumsum(counts)[i-1] : cumsum(counts)[i]]``."""
        if not self.meta.get("positions"):
            raise ValueError(
                f"index at {self.index_dir} was built without "
                f"positions=True — rebuild with positions to enable "
                f"phrase queries")
        t = self._term_rows(term, ["token", "npost", "postings_z",
                                   "tfs_z", "pos_z"])
        if t is None:
            return (np.empty(0, dtype=np.int64),) * 3
        ids = self._decode_col(t, "postings_z", True)
        counts = self._decode_col(t, "tfs_z", False)
        # positions delta-reset per POSTING: group starts come from the
        # per-row tf prefix (decode row-by-row to keep groups aligned)
        parts, taken = [], 0
        for buf, nrow in zip(t["pos_z"].to_pylist(),
                             t["npost"].to_pylist()):
            v = decode_varint(buf)
            c = counts[taken:taken + nrow]
            gs = (np.cumsum(c) - c).astype(np.int64)
            parts.append(_delta_decode(v, gs))
            taken += nrow
        flat = (np.concatenate(parts) if parts
                else np.empty(0, dtype=np.int64))
        return ids, counts, flat

    def bm25(self, terms, *, k1: float = 1.5, b: float = 0.75):
        """BM25 scores for every doc matching ≥1 term, computed from
        the index ALONE (reads only the terms' shards; df/dl/avgdl all
        come from the postings + manifest) — identical formula and
        float evaluation order to ``textstats.bm25_scores``, so both
        implementations satisfy the same exact SQL oracle.  Returns
        ``(doc_ids, scores)``."""
        if "total_tokens" not in self.meta:
            raise ValueError(
                f"index at {self.index_dir} predates the BM25 payload "
                f"(no total_tokens/tfs/dls) — rebuild the index")
        terms = sorted(set(terms))
        if not terms:
            raise ValueError("terms must be non-empty")
        n = self.meta["n_docs"]
        avgdl = self.meta["total_tokens"] / max(n, 1)
        all_ids, all_sc = [], []
        for q in terms:
            ids, tf, dl = self.postings_tf(q)
            if not len(ids):
                continue
            df = len(ids)
            idf = np.log(1.0 + (n - df + 0.5) / (df + 0.5))
            tff = tf.astype(np.float64)
            denom = k1 * (1.0 - b + b * dl.astype(np.float64)
                          / (avgdl or 1.0))
            all_ids.append(ids)
            all_sc.append(idf * (tff * (k1 + 1.0) / (tff + denom)))
        if not all_ids:
            return np.empty(0, dtype=np.int64), np.empty(0)
        # accumulate per TERM into a union-id vector: the += order is
        # sorted-term order, exactly the direct scorer's (and the
        # SQL's) left-to-right sum — bitwise-equal results (reduceat
        # does NOT guarantee left-to-right accumulation)
        union = np.unique(np.concatenate(all_ids))
        score = np.zeros(len(union), dtype=np.float64)
        for ids, sc in zip(all_ids, all_sc):
            score[np.searchsorted(union, ids)] += sc
        return union, score

    def search(self, terms, *, mode: str = "and") -> np.ndarray:
        """Sorted doc ids matching ALL (``and``) / ANY (``or``) terms.
        Terms are deduplicated; AND evaluates rarest-first so the
        working set only shrinks."""
        terms = sorted(set(terms))
        if not terms:
            return np.empty(0, dtype=np.int64)
        posts = [self.postings(t) for t in terms]
        if mode == "or":
            out = posts[0]
            for p in posts[1:]:
                out = np.union1d(out, p)
            return out
        if mode != "and":
            raise ValueError(f"mode must be 'and' or 'or', got {mode!r}")
        posts.sort(key=len)
        out = posts[0]
        for p in posts[1:]:
            if not len(out):
                break
            out = np.intersect1d(out, p, assume_unique=True)
        return out

    def phrase_search(self, terms) -> np.ndarray:
        """Sorted doc ids containing the EXACT consecutive phrase
        ``terms`` (order matters, duplicates allowed).  Requires an
        index built with ``positions=True``.

        Shape: candidate docs come from the sorted-postings AND
        intersection first, so the position check only touches docs
        already containing every term — the per-candidate loop below
        runs over that (small) survivor set, never the corpus."""
        terms = list(terms)
        if not terms:
            return np.empty(0, dtype=np.int64)
        data = {q: self.postings_positions(q) for q in set(terms)}
        cand = data[terms[0]][0]
        for q in set(terms[1:]):
            cand = np.intersect1d(cand, data[q][0], assume_unique=True)
            if not len(cand):
                return cand
        # per-term position slices for the candidate docs only
        per_term = []
        for q in terms:
            ids, counts, flat = data[q]
            starts = np.cumsum(counts) - counts
            sel = np.searchsorted(ids, cand)
            per_term.append([flat[starts[j]:starts[j] + counts[j]]
                             for j in sel])
        hits = []
        for i, d in enumerate(cand):
            s = per_term[0][i]
            for k in range(1, len(terms)):
                if not len(s):
                    break
                s = s[np.isin(s + k, per_term[k][i],
                              assume_unique=True)]
            if len(s):
                hits.append(int(d))
        return np.array(sorted(hits), dtype=np.int64)
