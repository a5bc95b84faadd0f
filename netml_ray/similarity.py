"""Similarity search over an embedding column (``list<float>``).

- ``knn_cosine``: brute-force cosine top-k — the query matrix is
  broadcast once (``ray.put``), each batch does one numpy matmul, and
  per-batch top-k partials are merged on the driver (k × batches rows,
  tiny).  This is the exact baseline.
- ``knn_cosine_ivf``: the scale path — k-means-style coarse quantizer
  (trained on a sample, centroids broadcast), vectors bucketed by
  nearest centroid; queries probe only the ``nprobe`` nearest buckets.
  Approximate; recall controlled by nprobe.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa


def _mat(col: pa.ChunkedArray) -> np.ndarray:
    arr = col.combine_chunks()
    if isinstance(arr, pa.ChunkedArray):  # pragma: no cover
        arr = arr.combine_chunks()
    flat = np.asarray(arr.flatten(), dtype=np.float32)
    n = len(arr)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def _normalize(m: np.ndarray) -> np.ndarray:
    norm = np.linalg.norm(m, axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    return m / norm


def knn_cosine(
    ds,
    query: np.ndarray,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dtype=np.float32,
):
    """Exact top-k by cosine similarity to ``query`` (1-D vector).

    Returns a pandas DataFrame (vec_id, cos_sim) sorted by
    (-cos_sim, vec_id) — deterministic tie order.  ``dtype=np.float64``
    for oracle-parity runs; float32 is the at-scale default.
    """
    import ray

    q = np.asarray(query, dtype=dtype)
    q = q / (np.linalg.norm(q) or 1.0)
    qref = ray.put(q)

    class _Partial:
        def __init__(self):
            self.q = ray.get(qref)

        def __call__(self, t: pa.Table) -> pa.Table:
            m = _normalize(_mat(t[vec_col]).astype(dtype))
            sims = m @ self.q
            nk = min(k, len(sims))
            if nk == 0:
                return pa.table({id_col: pa.array([], type=pa.int64()),
                                 "cos_sim": pa.array([], type=pa.float64())})
            idx = np.argpartition(-sims, nk - 1)[:nk]
            return pa.table(
                {id_col: pa.array(t[id_col].to_numpy()[idx]),
                 "cos_sim": pa.array(sims[idx].astype(np.float64))}
            )

    from netml_ray.partition import auto_concurrency

    partials = ds.map_batches(_Partial, batch_format="pyarrow",
                              concurrency=auto_concurrency())
    pdf = partials.to_pandas()  # ≤ k rows per batch — tiny
    pdf = pdf.sort_values(["cos_sim", id_col], ascending=[False, True], kind="stable")
    return pdf.head(k).reset_index(drop=True)


def knn_cosine_batch(
    ds,
    queries: np.ndarray,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dtype=np.float32,
):
    """Exact top-k for a BATCH of queries (Q×d) in one corpus pass.

    The normalized query matrix is broadcast once (``ray.put``); every
    corpus batch computes one (batch×Q) matmul and emits its per-query
    top-k partials — O(Q·k) rows per batch through the exchange, not
    O(Q·batch).  Returns a pandas DataFrame
    ``(query_id, vec_id, cos_sim)`` with k rows per query, sorted by
    ``(query_id, -cos_sim, vec_id)``."""
    import ray

    qm = np.asarray(queries, dtype=dtype)
    if qm.ndim != 2:
        raise ValueError("queries must be a 2-D (Q, d) matrix")
    qm = _normalize(qm)
    qref = ray.put(qm)
    nq = len(qm)

    class _Partial:
        def __init__(self):
            self.qt = ray.get(qref).T  # (d, Q)

        def __call__(self, t: pa.Table) -> pa.Table:
            m = _normalize(_mat(t[vec_col]).astype(dtype))
            sims = m @ self.qt                      # (batch, Q)
            nk = min(k, len(m))
            if nk == 0:
                return pa.table({
                    "query_id": pa.array([], type=pa.int64()),
                    id_col: pa.array([], type=pa.int64()),
                    "cos_sim": pa.array([], type=pa.float64())})
            idx = np.argpartition(-sims, nk - 1, axis=0)[:nk]  # (nk, Q)
            ids = t[id_col].to_numpy()
            qid = np.repeat(np.arange(nq, dtype=np.int64), nk)
            flat = idx.T.ravel()                    # per query, its nk rows
            return pa.table({
                "query_id": pa.array(qid),
                id_col: pa.array(ids[flat]),
                "cos_sim": pa.array(
                    sims[flat, np.repeat(np.arange(nq), nk)].astype(
                        np.float64)),
            })

    from netml_ray.partition import auto_concurrency

    partials = ds.map_batches(_Partial, batch_format="pyarrow",
                              concurrency=auto_concurrency())
    pdf = partials.to_pandas()  # ≤ Q·k rows per batch — small
    pdf = pdf.sort_values(["query_id", "cos_sim", id_col],
                          ascending=[True, False, True], kind="stable")
    return (pdf.groupby("query_id", sort=True).head(k)
            .reset_index(drop=True))


def train_ivf_centroids(sample: np.ndarray, n_centroids: int, iters: int = 10, seed: int = 0) -> np.ndarray:
    """Plain Lloyd's k-means on a driver-side sample (deterministic)."""
    rng = np.random.default_rng(seed)
    sample = _normalize(sample.astype(np.float32))
    cent = sample[rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            m = sample[assign == c]
            if len(m):
                cent[c] = m.mean(axis=0)
        cent = _normalize(cent)
    return cent


def hash_sample(ds, *, id_col: str, fraction: float, limit: int):
    """Deterministic unbiased sample: keep rows whose Knuth-hashed id
    falls below ``fraction`` — independent of block order/partitioning
    (unlike ``ds.limit(n)``, which is first-N biased)."""
    thresh = int(fraction * (1 << 32))

    def _f(t: pa.Table) -> pa.Table:
        h = (t[id_col].to_numpy().astype(np.uint64) * np.uint64(2654435761)) \
            % np.uint64(1 << 32)
        return t.filter(pa.array(h < thresh))

    return ds.map_batches(_f, batch_format="pyarrow").limit(limit)


def _resolve_fs(path: str, filesystem=None):
    """(pyarrow.fs.FileSystem, fs-local path) for ``path`` — an
    explicit filesystem, a URI (s3://…, file://…), or a plain local
    path.  Everything the index reads/writes goes through this, so
    buckets can land on shared storage on a real cluster (r2 #6)."""
    import os

    from pyarrow import fs as pafs

    if filesystem is not None:
        return filesystem, path
    if "://" in str(path):
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), os.path.abspath(path)


def _fs_exists(fs, path: str) -> bool:
    from pyarrow import fs as pafs

    return fs.get_file_info(path).type != pafs.FileType.NotFound


class IVFIndex:
    """Materialized IVF index: vectors written ONCE to parquet
    partitioned by coarse-quantizer bucket; a query probes only the
    ``nprobe`` nearest buckets, so read bytes scale with
    ``nprobe / n_centroids`` of the corpus instead of a full scan.

    Layout::

        index_dir/
          meta.json           # n_centroids, dim, cols, n_rows, buckets
          centroids.npy
          bucket=<b>/data.parquet

    Build is one assignment pass + one hash shuffle by bucket (writes
    happen inside the partition tasks — nothing is driver-collected).
    All I/O routes through ``pyarrow.fs`` (pass ``filesystem=`` or a
    URI index_dir for shared storage).  One partition owns a
    (bucket, shard) group, so each group has exactly ONE
    deterministically-named file — a task retry overwrites it instead
    of accumulating duplicates, and queries read only the file LIST
    ``meta.json`` records per bucket, so stale files from an older
    build in the same dir cannot pollute results (ADVICE r2).

    ``shards_per_bucket`` splits each bucket's rows by id-hash across
    that many files/tasks — at 10^12-row scale a popular bucket exceeds
    one task's memory and one sanely-sized parquet file; sharding keeps
    both bounded without changing query results (the query reads every
    shard of a probed bucket).
    """

    def __init__(self, index_dir: str, centroids: np.ndarray, meta: dict,
                 filesystem=None):
        self.fs, self.index_dir = _resolve_fs(index_dir, filesystem)
        self.centroids = centroids
        self.meta = meta

    # -- construction --------------------------------------------------
    @staticmethod
    def build(
        ds,
        index_dir: str,
        *,
        n_centroids: int = 16,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        sample_rows: int = 10_000,
        seed: int = 0,
        num_partitions: int | None = None,
        shards_per_bucket: int = 1,
        filesystem=None,
    ) -> "IVFIndex":
        import json

        import pyarrow.parquet as pq
        import ray

        from netml_ray.partition import auto_concurrency, partition_map

        fs, root = _resolve_fs(index_dir, filesystem)
        n = ds.count()
        frac = min(1.0, 2.0 * sample_rows / max(n, 1))
        sample_df = hash_sample(ds, id_col=id_col, fraction=frac,
                                limit=sample_rows).to_pandas()
        # sort by id: see the standalone path — determinism across runs
        sample_df = sample_df.sort_values(id_col, ignore_index=True)
        sample = np.stack(sample_df[vec_col].to_numpy()).astype(np.float32)
        cent = train_ivf_centroids(sample, n_centroids, seed=seed)
        cref = ray.put(cent)

        shards = max(1, int(shards_per_bucket))

        class _Assign:
            def __init__(self):
                self.cent = ray.get(cref)

            def __call__(self, t: pa.Table) -> pa.Table:
                m = _normalize(_mat(t[vec_col]))
                a = (np.argmax(m @ self.cent.T, axis=1).astype(np.int64)
                     if len(m) else np.empty(0, dtype=np.int64))
                t = t.append_column("bucket", pa.array(a))
                # id-hash shard inside the bucket: the shuffle key is
                # (bucket, shard) so no single task/file must hold a
                # whole popular bucket
                h = (t[id_col].to_numpy().astype(np.uint64)
                     * np.uint64(2654435761)) >> np.uint64(17)
                shard = (h % np.uint64(shards)).astype(np.int64)
                return t.append_column(
                    "_ivf_pkey", pa.array(a * shards + shard))

        bucketed = ds.map_batches(_Assign, batch_format="pyarrow",
                                  concurrency=auto_concurrency())
        fs.create_dir(root, recursive=True)

        def _write(t: pa.Table) -> pa.Table:
            # one hash partition holds ALL rows of its (bucket, shard)
            # groups, so each group writes exactly one deterministically-
            # named file — a retry overwrites, never duplicates
            t = t.sort_by([("_ivf_pkey", "ascending"), (id_col, "ascending")])
            pk = t["_ivf_pkey"].to_numpy()
            starts = np.flatnonzero(np.r_[True, pk[1:] != pk[:-1]]) if len(pk) else []
            ends = np.r_[starts[1:], len(pk)] if len(pk) else []
            written = []
            for s, e in zip(starts, ends):
                bid, sid = divmod(int(pk[s]), shards)
                bdir = f"{root}/bucket={bid}"
                fs.create_dir(bdir, recursive=True)
                part = t.slice(s, e - s).drop_columns(["bucket", "_ivf_pkey"])
                name = f"data-{sid:05d}.parquet"
                tmp = f"{bdir}/.{name}.tmp"
                pq.write_table(part, tmp, filesystem=fs)
                fs.move(tmp, f"{bdir}/{name}")
                written.append((bid, f"bucket={bid}/{name}", e - s))
            return pa.table({
                "bucket": pa.array([w[0] for w in written], type=pa.int64()),
                "file": pa.array([w[1] for w in written], type=pa.string()),
                "rows": pa.array([w[2] for w in written], type=pa.int64()),
            })

        marker = partition_map(bucketed, "_ivf_pkey", _write,
                               num_partitions=num_partitions)
        written = marker.to_pandas()
        buckets = sorted(int(x) for x in written["bucket"].unique())
        files = {str(b): sorted(written.loc[written["bucket"] == b, "file"])
                 for b in buckets}
        with fs.open_output_stream(f"{root}/centroids.npy") as f:
            np.save(f, cent)
        meta = {"n_centroids": int(len(cent)), "dim": int(cent.shape[1]),
                "id_col": id_col, "vec_col": vec_col, "n_rows": int(n),
                "buckets": buckets, "files": files}
        with fs.open_output_stream(f"{root}/meta.json") as f:
            f.write(json.dumps(meta).encode())
        return IVFIndex(root, cent, meta, filesystem=fs)

    @staticmethod
    def load(index_dir: str, filesystem=None) -> "IVFIndex":
        import json

        fs, root = _resolve_fs(index_dir, filesystem)
        with fs.open_input_stream(f"{root}/meta.json") as f:
            meta = json.loads(f.read().decode())
        if "buckets" not in meta:
            raise ValueError(
                f"{root} uses a pre-r3 index layout (no bucket manifest in "
                f"meta.json) — rebuild the index")
        if "files" not in meta:  # r3 layout: one data.parquet per bucket
            meta["files"] = {str(b): [f"bucket={b}/data.parquet"]
                             for b in meta["buckets"]}
        missing = [p for ps in meta["files"].values() for p in ps
                   if not _fs_exists(fs, f"{root}/{p}")]
        if missing:
            raise ValueError(
                f"index at {root} is missing bucket files {missing[:5]} — "
                f"rebuild the index")
        import io

        with fs.open_input_stream(f"{root}/centroids.npy") as f:
            cent = np.load(io.BytesIO(f.read()))  # input streams don't seek
        return IVFIndex(root, cent, meta, filesystem=fs)

    # -- query ---------------------------------------------------------
    def query(self, query: np.ndarray, *, k: int = 10, nprobe: int = 4,
              dtype=np.float32):
        """Approximate top-k: reads ONLY the probed buckets' files (the
        exact path LISTS ``meta.json`` records — never a glob)."""
        import ray.data as rd

        q = np.asarray(query, dtype=np.float32)
        q = q / (np.linalg.norm(q) or 1.0)
        probe = np.argsort(-(self.centroids @ q))[:nprobe]
        fmap = self.meta.get("files")
        if fmap is None:  # index built pre-r4 and not via load()
            fmap = {str(b): [f"bucket={b}/data.parquet"]
                    for b in self.meta.get("buckets", [])}
        files = [f"{self.index_dir}/{p}"
                 for b in probe for p in fmap.get(str(int(b)), [])]
        if not files:
            import pandas as pd

            return pd.DataFrame({self.meta["id_col"]: [], "cos_sim": []})
        sub = rd.read_parquet(files, filesystem=self.fs)
        return knn_cosine(sub, query, k=k, id_col=self.meta["id_col"],
                          vec_col=self.meta["vec_col"], dtype=dtype)

    def query_batch(self, queries: np.ndarray, *, k: int = 10,
                    nprobe: int = 4, dtype=np.float32):
        """Batched approximate top-k: the UNION of all queries' probe
        buckets is read ONCE; each query's candidates are filtered by
        bucket assignment after the shared scan.  Read bytes scale
        with |∪ probes| / n_centroids of the corpus, not Q·nprobe.

        Returns ``(query_id, id, cos_sim)`` — k rows per query, same
        per-query results as ``query`` (pinned by test)."""
        import pandas as pd
        import ray.data as rd

        qm = np.asarray(queries)
        if qm.ndim != 2:
            raise ValueError("queries must be a 2-D (Q, d) matrix")
        # probe selection in float32 (centroid precision); similarity
        # itself sees the ORIGINAL-precision queries via dtype
        q32 = _normalize(qm.astype(np.float32))
        probes = np.argsort(-(q32 @ self.centroids.T), axis=1)[:, :nprobe]
        union = np.unique(probes)
        fmap = self.meta.get("files")
        if fmap is None:
            fmap = {str(b): [f"bucket={b}/data.parquet"]
                    for b in self.meta.get("buckets", [])}
        id_col = self.meta["id_col"]
        outs = []
        for b in union:
            files = [f"{self.index_dir}/{p}" for p in fmap.get(str(int(b)), [])]
            if not files:
                continue
            qids = np.flatnonzero((probes == b).any(axis=1))
            sub = rd.read_parquet(files, filesystem=self.fs)
            part = knn_cosine_batch(sub, qm[qids], k=k, id_col=id_col,
                                    vec_col=self.meta["vec_col"],
                                    dtype=dtype)
            part["query_id"] = qids[part["query_id"].to_numpy()]
            outs.append(part)
        if not outs:
            return pd.DataFrame({"query_id": [], id_col: [], "cos_sim": []})
        pdf = pd.concat(outs, ignore_index=True)
        pdf = pdf.sort_values(["query_id", "cos_sim", id_col],
                              ascending=[True, False, True], kind="stable")
        return (pdf.groupby("query_id", sort=True).head(k)
                .reset_index(drop=True))


def knn_cosine_ivf(
    ds,
    query: np.ndarray,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    nprobe: int = 4,
    sample_rows: int = 10_000,
    seed: int = 0,
    index_dir: str | None = None,
    dtype=np.float32,
    shards_per_bucket: int = 1,
    filesystem=None,
):
    """IVF approximate top-k via the materialized index.

    With ``index_dir`` pointing at an existing index, the build is
    skipped entirely and the query reads only ``nprobe`` bucket
    partitions.  Without it, a one-time index is built under /tmp
    (one pass over ``ds``) and then probed — pass the same
    ``index_dir`` across calls to amortize the build.  ``filesystem``
    (or a URI ``index_dir``) routes the index through ``pyarrow.fs``.
    """
    import json
    import tempfile

    idx = None
    if index_dir is not None:
        fs, root = _resolve_fs(index_dir, filesystem)
        if _fs_exists(fs, f"{root}/meta.json"):
            with fs.open_input_stream(f"{root}/meta.json") as f:
                has_manifest = "buckets" in json.loads(f.read().decode())
            if has_manifest:
                idx = IVFIndex.load(index_dir, filesystem=filesystem)
            # pre-r3 layout: rebuild in place (exact-path reads ignore
            # the old part-* files)
    if idx is None:
        if index_dir is None:
            index_dir = tempfile.mkdtemp(prefix="ivf_index_")
        idx = IVFIndex.build(ds, index_dir, n_centroids=n_centroids,
                             id_col=id_col, vec_col=vec_col,
                             sample_rows=sample_rows, seed=seed,
                             shards_per_bucket=shards_per_bucket,
                             filesystem=filesystem)
    return idx.query(query, k=k, nprobe=nprobe, dtype=dtype)


def embedding_near_duplicates(
    ds,
    *,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int | None = None,
    target_bucket: int = 1024,
    seed: int = 0,
    sample_rows: int = 10_000,
    num_partitions: int | None = None,
):
    """Embedding-cosine near-dup pairs: bucket by nearest centroid, then
    exact pairwise cosine inside each (small) bucket.

    ``n_centroids`` defaults to ``ceil(n / target_bucket)`` so expected
    bucket width — and therefore the O(width²) pairwise block — stays
    bounded as the corpus grows; the centroid sample is hash-based
    (unbiased), and pair generation loops over buckets inside one
    vectorized partition fn (no per-bucket pandas dispatch).
    """
    import ray

    from netml_ray.partition import partition_map

    n = ds.count()
    if n_centroids is None:
        n_centroids = max(4, int(np.ceil(n / target_bucket)))
    frac = min(1.0, 2.0 * sample_rows / max(n, 1))
    sample_df = hash_sample(ds, id_col=id_col, fraction=frac,
                            limit=sample_rows).to_pandas()
    # sort by id: block ARRIVAL order varies across runs, and kmeans
    # init picks positional indices — unsorted samples make the build
    # nondeterministic across processes (observed r5)
    sample_df = sample_df.sort_values(id_col, ignore_index=True)
    sample = np.stack(sample_df[vec_col].to_numpy()).astype(np.float32)
    cent = train_ivf_centroids(sample, n_centroids, seed=seed)
    cref = ray.put(cent)

    class _Assign:
        def __init__(self):
            self.cent = ray.get(cref)

        def __call__(self, t: pa.Table) -> pa.Table:
            m = _normalize(_mat(t[vec_col]))
            a = np.argmax(m @ self.cent.T, axis=1) if len(m) else np.empty(0, dtype=np.int64)
            return t.append_column("bucket", pa.array(a.astype(np.int64)))

    from netml_ray.partition import auto_concurrency

    bucketed = ds.map_batches(_Assign, batch_format="pyarrow",
                              concurrency=auto_concurrency())

    def _pairs_part(t: pa.Table) -> pa.Table:
        t = t.sort_by([("bucket", "ascending"), (id_col, "ascending")])
        b = t["bucket"].to_numpy()
        ids = t[id_col].to_numpy()
        m = _normalize(_mat(t[vec_col]))
        starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]]) if len(b) else np.empty(0, np.int64)
        ends = np.r_[starts[1:], len(b)] if len(b) else np.empty(0, np.int64)
        out_a, out_b, out_s = [], [], []
        for s, e in zip(starts, ends):
            w = e - s
            if w < 2:
                continue
            bm = m[s:e]
            sims = bm @ bm.T
            ia, ib = np.triu_indices(w, k=1)
            hit = sims[ia, ib] >= threshold
            if hit.any():
                out_a.append(ids[s:e][ia[hit]])
                out_b.append(ids[s:e][ib[hit]])
                out_s.append(sims[ia[hit], ib[hit]].astype(np.float64))
        if not out_a:
            return pa.table({"id_a": pa.array([], type=pa.int64()),
                             "id_b": pa.array([], type=pa.int64()),
                             "cos_sim": pa.array([], type=pa.float64())})
        return pa.table({"id_a": pa.array(np.concatenate(out_a).astype(np.int64)),
                         "id_b": pa.array(np.concatenate(out_b).astype(np.int64)),
                         "cos_sim": pa.array(np.concatenate(out_s))})

    return partition_map(bucketed, "bucket", _pairs_part,
                         num_partitions=num_partitions)
