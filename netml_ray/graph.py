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

__all__ = ["pagerank", "hits", "cooccurrence_similarity",
           "dedupe_edges_with_degree"]


def dedupe_edges_with_degree(edges, src: str, dst: str, *,
                             weight: str | None = None,
                             num_partitions: int | None = None):
    """Globally distinct (src, dst) pairs via ONE hash exchange on
    ``src`` (all of a source's rows co-locate, so per-partition dedup
    is exact).  Returns the deduped edge Dataset, materialized so the
    iteration passes replay blocks instead of lineage.

    ``weight``: ``None`` drops multiplicity (plain distinct pairs);
    ``"count"`` emits a ``w`` column = the pair's multiplicity in the
    input; any other string sums that input column per pair."""
    def _dedup(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            if weight is not None and "w" not in t.column_names:
                cols = {src: t[src], dst: t[dst],
                        "w": pa.array([], type=pa.float64())}
                return pa.table(cols)
            return t
        s = t[src].to_numpy()
        d = t[dst].to_numpy()
        order = np.lexsort((d, s))
        ss, dd = s[order], d[order]
        keep = np.r_[True, (ss[1:] != ss[:-1]) | (dd[1:] != dd[:-1])]
        if weight is None:
            return pa.table({src: pa.array(ss[keep]),
                             dst: pa.array(dd[keep])})
        starts = np.flatnonzero(keep)
        if weight == "count":
            wv = np.diff(np.r_[starts, len(ss)]).astype(np.float64)
        else:
            vals = t[weight].to_numpy().astype(np.float64)[order]
            wv = np.add.reduceat(vals, starts)
        return pa.table({src: pa.array(ss[keep]),
                         dst: pa.array(dd[keep]),
                         "w": pa.array(wv)})

    return partition_map(edges, src, _dedup,
                         num_partitions=num_partitions).materialize()


def pagerank(edges, src: str = "src", dst: str = "dst", *,
             damping: float = 0.85, iters: int = 3,
             dedupe: bool = True, weight: str | None = None,
             max_nodes: int = 200_000_000,
             num_partitions: int | None = None) -> pa.Table:
    """PageRank over an int64 edge Dataset; returns a
    ``pa.Table(node, pagerank)`` with one row per distinct node.

    ``dedupe=True`` runs the exact pair-dedup exchange first (parallel
    edges would otherwise double-count contributions AND degrees).
    ``weight``: ``None`` = classic unweighted; ``"count"`` = weighted
    by pair multiplicity in the input (requires ``dedupe=True``); any
    other string = weighted by that column (summed per distinct pair
    under dedupe).  Weighted semantics: r_{i+1}(v) = (1-d)/N +
    d·Σ_{(u,v)} r_i(u)·w(u,v)/W(u) with W(u) the sum of u's out-edge
    weights — the SQL oracle states the identical formula.
    ``iters`` is fixed (not convergence-tested) so the unrolled SQL
    oracle states the identical computation.
    """
    import ray

    if weight == "count" and not dedupe:
        raise ValueError("weight='count' requires dedupe=True (the "
                         "multiplicity comes from the dedup exchange)")
    wcol = None if weight is None else "w"
    ds = dedupe_edges_with_degree(edges, src, dst, weight=weight,
                                  num_partitions=num_partitions) \
        if dedupe else edges.materialize()
    if not dedupe and weight not in (None, "count"):
        wcol = weight

    # Pass 1: per-batch (node, out-weight) partials -> nodes + degrees.
    def _nodes_deg(t: pa.Table) -> pa.Table:
        s = t[src].to_numpy()
        d = t[dst].to_numpy()
        if wcol is None:
            us, cs = np.unique(s, return_counts=True)
            cs = cs.astype(np.float64)
        else:
            us = np.unique(s)
            cs = np.zeros(len(us))
            np.add.at(cs, np.searchsorted(us, s),
                      t[wcol].to_numpy().astype(np.float64))
        ud = np.setdiff1d(np.unique(d), us, assume_unique=True)
        return pa.table({
            "node": pa.array(np.concatenate([us, ud])),
            "out_cnt": pa.array(np.concatenate([cs, np.zeros(len(ud))])),
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
            contrib = wt[sc]
            if wcol is not None:
                contrib = contrib * t[wcol].to_numpy().astype(np.float64)
            c = np.bincount(dc, weights=contrib, minlength=len(nd))
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


def hits(edges, src: str = "src", dst: str = "dst", *,
         iters: int = 2, dedupe: bool = True,
         max_nodes: int = 200_000_000,
         num_partitions: int | None = None) -> pa.Table:
    """HITS hubs & authorities over a DIRECTED int64 edge Dataset;
    returns ``pa.Table(node, hub, auth)`` for every distinct node.

    Iteration (mirrored verbatim by the unrolled SQL oracle):
    h0 = 1/N; auth_i(v) = Σ_{(u,v)} h_{i-1}(u) then L1-normalized to
    sum 1 over ALL nodes (missing in-edges → 0); hub_i(u) =
    Σ_{(u,v)} auth_i(v) then L1-normalized.  L1 (not the textbook L2)
    keeps the oracle a plain ``sum() OVER ()`` divide; the ranking is
    scale-invariant either way.

    Same cluster shape as :func:`pagerank`: edges stay distributed
    (one dedup exchange, materialized blocks), the hub/auth vectors
    broadcast via ``ray.put``, two narrow passes per iteration.
    """
    import ray

    ds = dedupe_edges_with_degree(edges, src, dst,
                                  num_partitions=num_partitions) \
        if dedupe else edges.materialize()

    def _node_partial(t: pa.Table) -> pa.Table:
        u = np.union1d(np.unique(t[src].to_numpy()),
                       np.unique(t[dst].to_numpy()))
        return pa.table({"node": pa.array(u)})

    parts = []
    for bt in ds.map_batches(_node_partial, batch_size=None,
                             batch_format="pyarrow") \
                .iter_batches(batch_size=None, batch_format="pyarrow"):
        parts.append(bt["node"].to_numpy())
    nodes = np.unique(np.concatenate(parts)) if parts else \
        np.empty(0, dtype=np.int64)
    n = len(nodes)
    if n > max_nodes:
        raise ValueError(
            f"hits: {n} nodes exceeds max_nodes={max_nodes}; see the "
            "pagerank docstring for the rank-as-Dataset variant")

    def _fold(key_col: str, val_col: str, w: np.ndarray) -> np.ndarray:
        """One narrow pass: per-node Σ w[other-endpoint] grouped by
        ``key_col`` — the HITS matrix-vector product."""
        ref = ray.put((nodes, w))

        def _contrib(t: pa.Table, _ref=ref) -> pa.Table:
            nd, wt = ray.get(_ref)
            kc = np.searchsorted(nd, t[key_col].to_numpy())
            vc = np.searchsorted(nd, t[val_col].to_numpy())
            c = np.bincount(kc, weights=wt[vc], minlength=len(nd))
            nz = np.flatnonzero(c)
            return pa.table({"code": pa.array(nz.astype(np.int64)),
                             "c": pa.array(c[nz])})

        total = np.zeros(n)
        for bt in ds.map_batches(_contrib, batch_size=None,
                                 batch_format="pyarrow") \
                    .iter_batches(batch_size=None,
                                  batch_format="pyarrow"):
            np.add.at(total, bt["code"].to_numpy(), bt["c"].to_numpy())
        return total

    hub = np.full(n, 1.0 / n)
    auth = np.zeros(n)
    for _ in range(iters):
        auth = _fold(dst, src, hub)
        s = auth.sum()
        if s > 0:
            auth = auth / s
        hub = _fold(src, dst, auth)
        s = hub.sum()
        if s > 0:
            hub = hub / s
    return pa.table({"node": pa.array(nodes), "hub": pa.array(hub),
                     "auth": pa.array(auth)})


def cooccurrence_similarity(edges, group: str, item: str, *,
                            max_group: int = 4096,
                            num_partitions: int | None = None):
    """Common-neighbor (co-occurrence) Jaccard between items sharing a
    group — the classic link-prediction / related-items feature
    ("suppliers stocking the same parts", "docs sharing shingles").
    Returns a Dataset of ``(item_a, item_b, common, jaccard)`` with
    item_a < item_b, jaccard = common / (deg_a + deg_b - common) over
    DISTINCT (group, item) memberships.

    Shape: ONE hash exchange on ``group`` co-locates each group's
    members (dedup + pair expansion + in-partition pair-count combine
    are all vectorized: repeat/arange pair indices, lexsort+reduceat
    counts), then ONE narrow exchange on ``item_a`` combines pair
    partials; degrees ride a bounded broadcast (one row per distinct
    item).  Groups larger than ``max_group`` members are SKIPPED
    (logged) — the documented quadratic-blowup guard, same contract
    as the n-gram Jaccard family; the SQL oracle states the identical
    HAVING rule.
    """
    import logging

    from netml_ray.partition import partition_map

    def _pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        g = t[group].to_numpy()
        it = t[item].to_numpy()
        order = np.lexsort((it, g))
        gs, its = g[order], it[order]
        keep = np.r_[True, (gs[1:] != gs[:-1]) | (its[1:] != its[:-1])]
        gs, its = gs[keep], its[keep]
        first = np.r_[True, gs[1:] != gs[:-1]]
        starts = np.flatnonzero(first)
        lens = np.diff(np.r_[starts, len(gs)])
        big = lens > max_group
        if big.any():
            logging.getLogger(__name__).warning(
                "cooccurrence_similarity: skipping %d group(s) larger "
                "than max_group=%d", int(big.sum()), max_group)
            keep_rows = np.repeat(~big, lens)
            gs, its = gs[keep_rows], its[keep_rows]
            starts = np.flatnonzero(np.r_[True, gs[1:] != gs[:-1]]) \
                if len(gs) else np.empty(0, dtype=np.int64)
            lens = np.diff(np.r_[starts, len(gs)])
        # vectorized within-group pair expansion: each member at
        # within-group position m pairs as the left element with the
        # L-1-m members after it — one repeat + one offset arange,
        # no per-group Python loop
        m = np.arange(len(gs)) - np.repeat(starts, lens)
        cnt_i = lens[np.repeat(np.arange(len(lens)), lens)] - 1 - m
        total = int(cnt_i.sum())
        if total == 0:
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        i_row = np.repeat(np.arange(len(gs)), cnt_i)
        j_off = np.arange(total) - np.repeat(
            np.r_[0, np.cumsum(cnt_i)[:-1]], cnt_i)
        a = its[i_row]
        b = its[i_row + 1 + j_off]
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        order2 = np.lexsort((hi, lo))
        lo, hi = lo[order2], hi[order2]
        f2 = np.r_[True, (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])]
        s2 = np.flatnonzero(f2)
        return pa.table({
            "a": pa.array(lo[s2]), "b": pa.array(hi[s2]),
            "n": pa.array(np.diff(np.r_[s2, len(lo)])
                          .astype(np.int64))})

    partial = partition_map(edges, group, _pairs,
                            num_partitions=num_partitions)

    # degrees: distinct groups per item — small fold, broadcast below
    def _deg(t: pa.Table) -> pa.Table:
        g = t[group].to_numpy()
        it = t[item].to_numpy()
        order = np.lexsort((g, it))
        its, gs = it[order], g[order]
        keep = np.r_[True, (its[1:] != its[:-1]) | (gs[1:] != gs[:-1])]
        its = its[keep]
        first = np.r_[True, its[1:] != its[:-1]]
        s = np.flatnonzero(first)
        return pa.table({"item": pa.array(its[s]),
                         "d": pa.array(np.diff(np.r_[s, len(its)])
                                       .astype(np.int64))})

    deg_partial = partition_map(edges, item, _deg,
                                num_partitions=num_partitions)
    deg: dict = {}
    for bt in deg_partial.iter_batches(batch_size=None,
                                       batch_format="pyarrow"):
        for k, v in zip(bt["item"].to_numpy(), bt["d"].to_numpy()):
            deg[int(k)] = deg.get(int(k), 0) + int(v)
    items_sorted = np.array(sorted(deg), dtype=np.int64)
    deg_arr = np.array([deg[int(k)] for k in items_sorted],
                       dtype=np.int64)

    def _combine(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"item_a": pa.array([], type=pa.int64()),
                             "item_b": pa.array([], type=pa.int64()),
                             "common": pa.array([], type=pa.int64()),
                             "jaccard": pa.array([], type=pa.float64())})
        a = t["a"].to_numpy()
        b = t["b"].to_numpy()
        nn = t["n"].to_numpy()
        order = np.lexsort((b, a))
        a, b, nn = a[order], b[order], nn[order]
        f = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        s = np.flatnonzero(f)
        a, b = a[s], b[s]
        common = np.add.reduceat(nn, s).astype(np.int64)
        da = deg_arr[np.searchsorted(items_sorted, a)]
        db = deg_arr[np.searchsorted(items_sorted, b)]
        jac = common / (da + db - common).astype(np.float64)
        return pa.table({"item_a": pa.array(a), "item_b": pa.array(b),
                         "common": pa.array(common),
                         "jaccard": pa.array(jac)})

    return partition_map(partial, "a", _combine,
                         num_partitions=num_partitions)
