"""Graph analytics over edge datasets: distributed PageRank.

The web-scale classic, expressed Ray-Data-first: the EDGE LIST is the
dataset and never leaves the cluster; only the rank vector (one double
per node) moves.  Shape per run:

1. ONE hash exchange on ``src`` co-locates every source's edges, so
   per-partition pair-dedup is globally exact (same trick as
   dedup.exact's min-id) and out-degrees are one bincount away.
2. The deduped edge dataset is materialized ONCE; every iteration is
   a narrow ``map_batches`` pass over those blocks — no per-iteration
   shuffle, no lineage re-execution.
3. The rank vector rides the object store (``ray.put`` once per
   iteration, read zero-copy by every task) — the broadcast-small-side
   pattern.  Per batch the contribution pass is two ``searchsorted``
   + one ``bincount``; tasks emit (node, partial) pairs bounded by
   the batch's distinct destinations and the driver folds them with
   ``np.add.at``.

Semantics (mirrored verbatim by the SQL oracle — K unrolled
iterations): r0 = 1/N for every node; r_{i+1}(v) = (1-d)/N +
d * sum over in-edges (u,v) of r_i(u)/outdeg(u).  Dangling-node mass
is dropped (the simplified power iteration the unrolled SQL states),
and nodes with no in-edges hold (1-d)/N — a LEFT JOIN from the node
set, not an inner join.

Scale ceiling: the broadcast rank vector is the small side — 8 bytes
x N nodes must fit a worker heap (``max_nodes`` guards it, default
200M ≈ 1.6 GB).  Beyond that the documented path is rank-as-Dataset:
hash-join ranks onto edges by ``src`` and ``groupby(dst).sum()`` per
iteration — K shuffles instead of K narrow passes, which is exactly
why the broadcast variant is the default for every graph whose node
table fits memory even when its EDGE table is 1000x larger.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from netml_ray.partition import partition_map

__all__ = ["pagerank", "dedupe_edges_with_degree"]


def dedupe_edges_with_degree(edges, src: str, dst: str, *,
                             num_partitions: int | None = None):
    """Globally distinct (src, dst) pairs via ONE hash exchange on
    ``src`` (all of a source's rows co-locate, so per-partition dedup
    is exact).  Returns the deduped edge Dataset, materialized so the
    iteration passes replay blocks instead of lineage."""
    def _dedup(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        s = t[src].to_numpy()
        d = t[dst].to_numpy()
        order = np.lexsort((d, s))
        ss, dd = s[order], d[order]
        keep = np.r_[True, (ss[1:] != ss[:-1]) | (dd[1:] != dd[:-1])]
        return pa.table({src: pa.array(ss[keep]), dst: pa.array(dd[keep])})

    return partition_map(edges, src, _dedup,
                         num_partitions=num_partitions).materialize()


def pagerank(edges, src: str = "src", dst: str = "dst", *,
             damping: float = 0.85, iters: int = 3,
             dedupe: bool = True, max_nodes: int = 200_000_000,
             num_partitions: int | None = None) -> pa.Table:
    """PageRank over an int64 edge Dataset; returns a
    ``pa.Table(node, pagerank)`` with one row per distinct node.

    ``dedupe=True`` runs the exact pair-dedup exchange first (parallel
    edges would otherwise double-count contributions AND degrees).
    ``iters`` is fixed (not convergence-tested) so the unrolled SQL
    oracle states the identical computation.
    """
    import ray

    ds = dedupe_edges_with_degree(edges, src, dst,
                                  num_partitions=num_partitions) \
        if dedupe else edges.materialize()

    # Pass 1: per-batch (node, out_cnt) partials -> node set + degrees.
    def _nodes_deg(t: pa.Table) -> pa.Table:
        s = t[src].to_numpy()
        d = t[dst].to_numpy()
        us, cs = np.unique(s, return_counts=True)
        ud = np.setdiff1d(np.unique(d), us, assume_unique=True)
        return pa.table({
            "node": pa.array(np.concatenate([us, ud])),
            "out_cnt": pa.array(np.concatenate(
                [cs, np.zeros(len(ud), dtype=np.int64)]).astype(np.int64)),
        })

    nd_parts, cnt_parts = [], []
    for bt in ds.map_batches(_nodes_deg, batch_size=None,
                             batch_format="pyarrow") \
                .iter_batches(batch_size=None, batch_format="pyarrow"):
        nd_parts.append(bt["node"].to_numpy())
        cnt_parts.append(bt["out_cnt"].to_numpy())
    nodes_arr = np.concatenate(nd_parts) if nd_parts else \
        np.empty(0, dtype=np.int64)
    cnt_arr = np.concatenate(cnt_parts) if cnt_parts else \
        np.empty(0, dtype=np.int64)
    nodes, inv = np.unique(nodes_arr, return_inverse=True)
    n = len(nodes)
    if n > max_nodes:
        raise ValueError(
            f"pagerank: {n} nodes exceeds max_nodes={max_nodes}; use the "
            "rank-as-Dataset join variant (see module docstring) for "
            "node tables beyond broadcast size")
    deg = np.zeros(n, dtype=np.float64)
    np.add.at(deg, inv, cnt_arr.astype(np.float64))

    rank = np.full(n, 1.0 / n)
    for _ in range(iters):
        with np.errstate(divide="ignore", invalid="ignore"):
            w = np.where(deg > 0, rank / deg, 0.0)
        ref = ray.put((nodes, w))

        def _contrib(t: pa.Table, _ref=ref) -> pa.Table:
            nd, wt = ray.get(_ref)
            sc = np.searchsorted(nd, t[src].to_numpy())
            dc = np.searchsorted(nd, t[dst].to_numpy())
            c = np.bincount(dc, weights=wt[sc], minlength=len(nd))
            nz = np.flatnonzero(c)
            return pa.table({"code": pa.array(nz.astype(np.int64)),
                             "c": pa.array(c[nz])})

        total = np.zeros(n)
        for bt in ds.map_batches(_contrib, batch_size=None,
                        batch_format="pyarrow") \
                    .iter_batches(batch_size=None, batch_format="pyarrow"):
            np.add.at(total, bt["code"].to_numpy(),
                      bt["c"].to_numpy())
        rank = (1.0 - damping) / n + damping * total

    return pa.table({"node": pa.array(nodes),
                     "pagerank": pa.array(rank)})
