"""Sharded inverted index + boolean keyword search.

Boolean retrieval over a document corpus, built Ray-Data-first:

  build   one narrow ``(token, doc_id)`` exchange — per-batch partials
          emit each doc's DISTINCT tokens (the map-side dedup that
          keeps the shuffle at one row per posting, not per
          occurrence) → hash-partition by token → each partition
          writes ONE deterministically-named parquet shard of
          ``(token, postings list<int64>)`` rows with sorted postings.
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

__all__ = ["InvertedIndex"]


class InvertedIndex:
    """Materialized token → sorted-postings index.

    Layout::

        index_dir/
          meta.json                # num_shards, id_col, files, n_docs
          shard=<s>/data.parquet   # (token, postings list<int64>) sorted by token
    """

    def __init__(self, index_dir: str, meta: dict, filesystem=None):
        self.fs, self.index_dir = _resolve_fs(index_dir, filesystem)
        self.meta = meta

    # -- construction --------------------------------------------------
    @staticmethod
    def build(ds, index_dir: str, *, text_col: str = "text",
              id_col: str = "doc_id", num_shards: int | None = None,
              max_postings: int = 1_000_000,
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
                return pa.table({"token": pa.array([], type=pa.string()),
                                 id_col: pa.array([], type=pa.int64()),
                                 "tf": pa.array([], type=pa.int64()),
                                 "dl": pa.array([], type=pa.int64())})
            d = len(tok.dictionary)
            pres, tf = np.unique(rowid * np.int64(d) + codes,
                                 return_counts=True)
            rows = pres // d
            id_np = t[id_col].to_numpy().astype(np.int64)
            return pa.table({
                "token": tok.dictionary.take(pa.array(pres % d))
                .cast(pa.string()),
                id_col: pa.array(id_np[rows]),
                "tf": pa.array(tf.astype(np.int64)),
                "dl": pa.array(tok.n_words[rows].astype(np.int64))})

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
            # int64 offsets + large_list: a shard may exceed 2^31
            # posting rows at the design scale (max_postings bounds a
            # single LIST CELL, not total shard rows) — int32 offsets
            # would silently wrap and corrupt the ListArray
            offsets = np.r_[seg_starts, len(codes)].astype(np.int64)
            utoks = tok.take(pa.array(seg_starts))
            off_arr = pa.array(offsets, type=pa.int64())
            postings = pa.LargeListArray.from_arrays(
                off_arr, pa.array(ids, type=pa.int64()))
            tfs = pa.LargeListArray.from_arrays(
                off_arr, pa.array(t["tf"].to_numpy(), type=pa.int64()))
            dls = pa.LargeListArray.from_arrays(
                off_arr, pa.array(t["dl"].to_numpy(), type=pa.int64()))
            out = pa.table({"token": utoks, "postings": postings,
                            "tfs": tfs, "dls": dls})
            if out.num_rows == 0 or sid < 0:
                return pa.table({"shard": pa.array([], type=pa.int64()),
                                 "file": pa.array([], type=pa.string()),
                                 "tokens": pa.array([], type=pa.int64()),
                                 "tok_sum": pa.array([], type=pa.int64())})
            sdir = f"{root}/shard={sid}"
            fs.create_dir(sdir, recursive=True)
            tmp = f"{sdir}/.data.parquet.tmp"
            pq.write_table(out, tmp, filesystem=fs)
            fs.move(tmp, f"{sdir}/data.parquet")
            return pa.table({"shard": pa.array([sid], type=pa.int64()),
                             "file": pa.array([f"shard={sid}/data.parquet"],
                                              type=pa.string()),
                             "tokens": pa.array([out.num_rows],
                                                type=pa.int64()),
                             "tok_sum": pa.array(
                                 [int(t["tf"].to_numpy().sum())],
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

    def postings(self, term: str) -> np.ndarray:
        """Sorted doc ids containing ``term`` (reads ONE shard file,
        pushed down to the row groups covering the token)."""
        import pyarrow.dataset as pads

        path = self.meta["files"].get(str(self._shard_of(term)))
        if path is None:
            return np.empty(0, dtype=np.int64)
        dset = pads.dataset(f"{self.index_dir}/{path}", filesystem=self.fs)
        t = dset.to_table(filter=pads.field("token") == term)
        if t.num_rows == 0:
            return np.empty(0, dtype=np.int64)
        # a token may span several segment rows (max_postings split);
        # rows are in token order and each segment ascending, so the
        # flattened concatenation is already sorted
        return t["postings"].combine_chunks().flatten().to_numpy()

    def postings_tf(self, term: str):
        """(sorted doc ids, per-doc tf, per-doc length) for ``term`` —
        the BM25 payload, still one shard read."""
        import pyarrow.dataset as pads

        path = self.meta["files"].get(str(self._shard_of(term)))
        e = (np.empty(0, dtype=np.int64),) * 3
        if path is None:
            return e
        dset = pads.dataset(f"{self.index_dir}/{path}", filesystem=self.fs)
        t = dset.to_table(filter=pads.field("token") == term)
        if t.num_rows == 0:
            return e
        return tuple(t[c].combine_chunks().flatten().to_numpy()
                     for c in ("postings", "tfs", "dls"))

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
