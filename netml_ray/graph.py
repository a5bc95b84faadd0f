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
           "triangle_census", "neighbor_degree_stats",
           "degree_assortativity", "k_core", "bfs_hops",
           "dedupe_edges_with_degree", "adamic_adar",
           "label_propagation"]


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
             seeds=None,
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

    ``seeds``: an int64 array of node ids makes this PERSONALIZED
    PageRank — teleportation goes to the seed set instead of uniform:
    s(v) = 1/|seeds ∩ nodes| on present seeds, else 0; r0 = s and
    r_{i+1}(v) = (1−d)·s(v) + d·Σ contributions.  Seeds absent from
    the graph are ignored (rule stated in the SQL oracle); the
    broadcast/narrow-pass cluster shape is unchanged.
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

    if seeds is not None:
        sv = np.zeros(n)
        pos = np.searchsorted(nodes, np.asarray(seeds, dtype=np.int64))
        pos = pos[(pos < n) & (nodes[np.minimum(pos, n - 1)]
                               == np.asarray(seeds, dtype=np.int64))]
        if not len(pos):
            raise ValueError("pagerank: no seed is present in the graph")
        sv[np.unique(pos)] = 1.0 / len(np.unique(pos))
        rank = sv.copy()
    else:
        sv = None
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
        if sv is None:
            rank = (1.0 - damping) / n + damping * total
        else:
            rank = (1.0 - damping) * sv + damping * total

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


def _membership_pair_partial(t: pa.Table, group: str, item: str,
                             max_group: int, caller: str) -> pa.Table:
    """Per-partition distinct-membership pair counts: dedup
    (group, item), expand within-group item pairs (canonical lo < hi),
    combine to ``(a, b, n)`` partials — all vectorized (lexsorts,
    repeat/arange pair indices, reduceat counts).  Groups larger than
    ``max_group`` members are SKIPPED (logged) — the documented
    quadratic-blowup guard shared by the co-occurrence family; SQL
    oracles state the identical HAVING rule."""
    import logging

    empty = pa.table({"a": pa.array([], type=pa.int64()),
                      "b": pa.array([], type=pa.int64()),
                      "n": pa.array([], type=pa.int64())})
    if t.num_rows == 0:
        return empty
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
            "%s: skipping %d group(s) larger than max_group=%d",
            caller, int(big.sum()), max_group)
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
        return empty
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
        "n": pa.array(np.diff(np.r_[s2, len(lo)]).astype(np.int64))})


def _canonical_degrees(edges, src: str, dst: str, *,
                       num_partitions: int | None):
    """Shared head of the undirected-graph family: canonicalize
    (a<b, self-loops dropped), global pair dedup (ONE exchange),
    driver-folded degree vector.  Returns (deduped Dataset with
    columns a/b, sorted node ids, int64 degrees)."""
    def _canon(t: pa.Table) -> pa.Table:
        s = t[src].to_numpy()
        d = t[dst].to_numpy()
        m = s != d
        s, d = s[m], d[m]
        return pa.table({"a": pa.array(np.minimum(s, d)),
                         "b": pa.array(np.maximum(s, d))})

    canon = edges.map_batches(_canon, batch_format="pyarrow")
    ded = dedupe_edges_with_degree(canon, "a", "b",
                                   num_partitions=num_partitions)

    def _deg_partial(t: pa.Table) -> pa.Table:
        u, c = np.unique(np.concatenate([t["a"].to_numpy(),
                                         t["b"].to_numpy()]),
                         return_counts=True)
        return pa.table({"node": pa.array(u),
                         "c": pa.array(c.astype(np.int64))})

    nd_parts, c_parts = [], []
    for bt in ded.map_batches(_deg_partial, batch_size=None,
                              batch_format="pyarrow") \
                 .iter_batches(batch_size=None, batch_format="pyarrow"):
        nd_parts.append(bt["node"].to_numpy())
        c_parts.append(bt["c"].to_numpy())
    nodes_all = np.concatenate(nd_parts) if nd_parts else \
        np.empty(0, dtype=np.int64)
    cnt_all = np.concatenate(c_parts) if c_parts else \
        np.empty(0, dtype=np.int64)
    nodes, inv = np.unique(nodes_all, return_inverse=True)
    deg = np.zeros(len(nodes), dtype=np.int64)
    np.add.at(deg, inv, cnt_all)
    return ded, nodes, deg


def triangle_census(edges, src: str = "src", dst: str = "dst", *,
                    closure: str = "auto",
                    broadcast_bytes: int = 256 << 20,
                    max_nodes: int = 200_000_000,
                    wedge_chunk: int = 4_000_000,
                    num_partitions: int | None = None) -> pa.Table:
    """Per-node triangle count + local clustering coefficient over an
    UNDIRECTED int64 edge Dataset; returns
    ``pa.Table(node, degree, triangles, clustering)`` with one row per
    distinct node (degree = distinct neighbors, clustering =
    2·tri / (deg·(deg−1)), 0.0 when deg < 2 — the SQL oracle states
    the identical formula).

    Degree-ordered orientation (the classic sqrt(m) wedge bound): each
    canonical edge {a,b} is oriented from the lower-(degree, id) rank
    endpoint to the higher, so every triangle is generated EXACTLY once
    — as the wedge around its lowest-rank vertex — and per-node
    oriented out-degree is O(sqrt(m)) on skew-free graphs, which is
    what keeps the wedge-candidate volume from exploding on power-law
    webgraphs (the hub with degree 10^6 emits ~0 wedges because every
    neighbor outranks it).

    Cluster shape: ONE hash exchange canonicalizes+dedups edges
    (co-locate by low endpoint, same trick as
    :func:`dedupe_edges_with_degree`); degrees fold to the driver (one
    row per node — the same broadcast ceiling as :func:`pagerank`,
    ``max_nodes``-guarded); then ONE exchange on the oriented source
    co-locates each node's out-neighborhood and wedges are generated
    AND closure-tested inside that partition, vectorized (repeat/
    arange pair indices, ``wedge_chunk``-sliced so a hub's candidate
    block stays heap-bounded), emitting only bounded (node, count)
    partials.

    Closure test — ``closure=``:

    - ``"broadcast"``: the deduped edge set rides the object store as
      ONE sorted int64 composite-key array (``ray.put`` once, zero-copy
      searchsorted per batch).  16 B/edge: a 10^9-edge graph is 8 GB —
      fine for a cluster object store, and the wedges NEVER move.
    - ``"exchange"``: wedge candidates (center, lo, hi) co-partition
      with edges on the closing edge's low endpoint
      (:func:`~netml_ray.partition.partition_map2`), membership is a
      per-partition sorted-composite searchsorted.  The wedge volume
      shuffles, but nothing needs to fit anywhere — the 100-TB path
      when the edge set outgrows the broadcast budget.
    - ``"auto"`` (default): broadcast while the edge array ≤
      ``broadcast_bytes``, else exchange.  Both paths are pinned equal
      in pytest.
    """
    import ray

    from netml_ray.partition import partition_map, partition_map2

    # 1+2. canonical dedup exchange + driver-folded degrees (shared
    #      head of the undirected-graph family).
    ded, nodes, deg = _canonical_degrees(
        edges, src, dst, num_partitions=num_partitions)
    n = len(nodes)
    if n == 0:
        return pa.table({"node": pa.array([], type=pa.int64()),
                         "degree": pa.array([], type=pa.int64()),
                         "triangles": pa.array([], type=pa.int64()),
                         "clustering": pa.array([], type=pa.float64())})
    if n > max_nodes:
        raise ValueError(
            f"triangle_census: {n} nodes exceeds max_nodes={max_nodes}; "
            "see the pagerank docstring for the scale contract")

    n_edges = int(deg.sum()) // 2
    if closure == "auto":
        closure = "broadcast" if n_edges * 8 <= broadcast_bytes \
            else "exchange"

    # 3. orient low rank -> high rank; rank = (degree, id).
    deg_ref = ray.put((nodes, deg))

    def _orient(t: pa.Table, _ref=deg_ref) -> pa.Table:
        nd, dg = ray.get(_ref)
        a = t["a"].to_numpy()
        b = t["b"].to_numpy()
        da = dg[np.searchsorted(nd, a)]
        db = dg[np.searchsorted(nd, b)]
        a_first = (da < db) | ((da == db) & (a < b))
        return pa.table({"u": pa.array(np.where(a_first, a, b)),
                         "v": pa.array(np.where(a_first, b, a))})

    oriented = ded.map_batches(_orient, batch_format="pyarrow")

    def _wedge_slices(t: pa.Table):
        """Yield vectorized wedge-candidate slices (center, lo, hi)
        from a u-co-located oriented partition, each slice bounded by
        ``wedge_chunk`` candidate rows (hub guard: chunking is by
        whole or partial u-runs, loop count = candidates/chunk)."""
        if t.num_rows == 0:
            return
        u = t["u"].to_numpy()
        v = t["v"].to_numpy()
        order = np.lexsort((v, u))
        us, vs = u[order], v[order]
        starts = np.flatnonzero(np.r_[True, us[1:] != us[:-1]])
        lens = np.diff(np.r_[starts, len(us)])
        # candidate count per row: neighbors after it in its run
        m = np.arange(len(us)) - np.repeat(starts, lens)
        cnt_i = lens[np.repeat(np.arange(len(lens)), lens)] - 1 - m
        csum = np.r_[0, np.cumsum(cnt_i)]
        total = int(csum[-1])
        pos = 0
        while pos < total:
            end = min(pos + wedge_chunk, total)
            # rows contributing to [pos, end): searchsorted on csum
            r0 = int(np.searchsorted(csum, pos, "right")) - 1
            r1 = int(np.searchsorted(csum, end, "left"))
            sub_cnt = cnt_i[r0:r1].copy()
            # trim the boundary rows' candidate windows
            off0 = pos - int(csum[r0])
            sub_first_skip = off0
            sub_cnt[0] -= off0
            tail_over = int(csum[r1]) - end
            if tail_over > 0:
                sub_cnt[-1] -= tail_over
            rows = np.arange(r0, r1)
            i_row = np.repeat(rows, sub_cnt)
            base = np.r_[0, np.cumsum(sub_cnt)[:-1]]
            j_in = np.arange(end - pos) - np.repeat(base, sub_cnt)
            skip = np.zeros(len(rows), dtype=np.int64)
            skip[0] = sub_first_skip
            j_off = j_in + np.repeat(skip, sub_cnt)
            lo = vs[i_row]  # run-sorted ascending -> lo < hi already
            hi = vs[i_row + 1 + j_off]
            yield us[i_row], lo, hi
            pos = end

    def _count_partial(cu, cl, ch) -> pa.Table:
        nz, c = np.unique(np.concatenate([cu, cl, ch]),
                          return_counts=True)
        return pa.table({"node": pa.array(nz),
                         "c": pa.array(c.astype(np.int64))})

    if closure == "broadcast":
        # collect the deduped edge set ONCE as a sorted composite key
        e_parts = []
        for bt in ded.iter_batches(batch_size=None,
                                   batch_format="pyarrow"):
            ca = np.searchsorted(nodes, bt["a"].to_numpy())
            cb = np.searchsorted(nodes, bt["b"].to_numpy())
            e_parts.append(ca.astype(np.int64) * n + cb)
        ekeys = np.sort(np.concatenate(e_parts)) if e_parts else \
            np.empty(0, dtype=np.int64)
        e_ref = ray.put((nodes, ekeys))

        def _wedge_close(t: pa.Table, _ref=e_ref) -> pa.Table:
            nd, ek = ray.get(_ref)
            nn = len(nd)
            acc_n, acc_c = [], []
            for wu, wl, wh in _wedge_slices(t):
                key = (np.searchsorted(nd, wl).astype(np.int64) * nn
                       + np.searchsorted(nd, wh))
                idx = np.searchsorted(ek, key)
                hit = (idx < len(ek)) & (ek[np.minimum(idx, len(ek) - 1)]
                                         == key)
                if hit.any():
                    p = _count_partial(wu[hit], wl[hit], wh[hit])
                    acc_n.append(p["node"].to_numpy())
                    acc_c.append(p["c"].to_numpy())
            if not acc_n:
                return pa.table({"node": pa.array([], type=pa.int64()),
                                 "c": pa.array([], type=pa.int64())})
            nz, inv2 = np.unique(np.concatenate(acc_n),
                                 return_inverse=True)
            cc = np.zeros(len(nz), dtype=np.int64)
            np.add.at(cc, inv2, np.concatenate(acc_c))
            return pa.table({"node": pa.array(nz), "c": pa.array(cc)})

        tri_partial = partition_map(oriented, "u", _wedge_close,
                                    num_partitions=num_partitions)
    else:
        # exchange path: wedges (center, lo, hi) co-partition with
        # edges on the closing edge's LOW endpoint.
        def _wedges(t: pa.Table) -> pa.Table:
            ws, ls, hs = [], [], []
            for wu, wl, wh in _wedge_slices(t):
                ws.append(wu)
                ls.append(wl)
                hs.append(wh)
            if not ws:
                return pa.table({"ctr": pa.array([], type=pa.int64()),
                                 "lo": pa.array([], type=pa.int64()),
                                 "hi": pa.array([], type=pa.int64())})
            return pa.table({"ctr": pa.array(np.concatenate(ws)),
                             "lo": pa.array(np.concatenate(ls)),
                             "hi": pa.array(np.concatenate(hs))})

        wedges = partition_map(oriented, "u", _wedges,
                               num_partitions=num_partitions)
        eren = ded.map_batches(
            lambda t: pa.table({"lo": t["a"], "ehi": t["b"]}),
            batch_format="pyarrow")

        def _close(wt: pa.Table, et: pa.Table) -> pa.Table:
            if wt.num_rows == 0 or et.num_rows == 0:
                return pa.table({"node": pa.array([], type=pa.int64()),
                                 "c": pa.array([], type=pa.int64())})
            el = et["lo"].to_numpy()
            eh = et["ehi"].to_numpy()
            wl = wt["lo"].to_numpy()
            wh = wt["hi"].to_numpy()
            wu = wt["ctr"].to_numpy()
            loc = np.unique(np.concatenate([el, eh, wl, wh]))
            nn = len(loc)
            ek = np.sort(np.searchsorted(loc, el).astype(np.int64) * nn
                         + np.searchsorted(loc, eh))
            key = (np.searchsorted(loc, wl).astype(np.int64) * nn
                   + np.searchsorted(loc, wh))
            idx = np.searchsorted(ek, key)
            hit = (idx < len(ek)) & (ek[np.minimum(idx, len(ek) - 1)]
                                     == key)
            if not hit.any():
                return pa.table({"node": pa.array([], type=pa.int64()),
                                 "c": pa.array([], type=pa.int64())})
            return _count_partial(wu[hit], wl[hit], wh[hit])

        tri_partial = partition_map2(wedges, eren, "lo", _close,
                                     num_partitions=num_partitions)

    # 4. fold per-node triangle counts on the driver (node-bounded).
    tri = np.zeros(n, dtype=np.int64)
    for bt in tri_partial.iter_batches(batch_size=None,
                                       batch_format="pyarrow"):
        np.add.at(tri, np.searchsorted(nodes, bt["node"].to_numpy()),
                  bt["c"].to_numpy())
    with np.errstate(divide="ignore", invalid="ignore"):
        clus = np.where(deg >= 2,
                        2.0 * tri / (deg * np.maximum(deg - 1, 1)),
                        0.0)
    return pa.table({"node": pa.array(nodes),
                     "degree": pa.array(deg),
                     "triangles": pa.array(tri),
                     "clustering": pa.array(clus)})


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
    from netml_ray.partition import partition_map

    def _pairs(t: pa.Table) -> pa.Table:
        return _membership_pair_partial(t, group, item, max_group,
                                        "cooccurrence_similarity")

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


def neighbor_degree_stats(edges, src: str = "src", dst: str = "dst",
                          *, max_nodes: int = 200_000_000,
                          num_partitions: int | None = None) -> pa.Table:
    """Per-node average neighbor degree over the canonical undirected
    graph — the classic rich-club / hub-affinity feature.  Returns
    ``pa.Table(node, degree, avg_nbr_degree)`` (degree = distinct
    neighbors; avg over those neighbors' degrees — the SQL oracle
    states the identical AVG-over-stubs rule).

    Shape: the shared canonical-dedup exchange + degree fold, then ONE
    narrow pass over the deduped edges with the degree vector
    broadcast (``ray.put``) — each edge contributes deg(b) to a's sum
    and deg(a) to b's; partials are node-bounded and fold on the
    driver (same broadcast ceiling as :func:`pagerank`)."""
    import ray

    ded, nodes, deg = _canonical_degrees(
        edges, src, dst, num_partitions=num_partitions)
    n = len(nodes)
    if n == 0:
        return pa.table({"node": pa.array([], type=pa.int64()),
                         "degree": pa.array([], type=pa.int64()),
                         "avg_nbr_degree": pa.array(
                             [], type=pa.float64())})
    if n > max_nodes:
        raise ValueError(
            f"neighbor_degree_stats: {n} nodes exceeds "
            f"max_nodes={max_nodes}; see the pagerank docstring")
    ref = ray.put((nodes, deg))

    def _partial(t: pa.Table, _ref=ref) -> pa.Table:
        nd, dg = ray.get(_ref)
        ca = np.searchsorted(nd, t["a"].to_numpy())
        cb = np.searchsorted(nd, t["b"].to_numpy())
        s = np.bincount(ca, weights=dg[cb].astype(np.float64),
                        minlength=len(nd))
        s += np.bincount(cb, weights=dg[ca].astype(np.float64),
                         minlength=len(nd))
        nz = np.flatnonzero(s)
        return pa.table({"code": pa.array(nz.astype(np.int64)),
                         "s": pa.array(s[nz])})

    tot = np.zeros(n, dtype=np.float64)
    for bt in ded.map_batches(_partial, batch_size=None,
                              batch_format="pyarrow") \
                 .iter_batches(batch_size=None,
                               batch_format="pyarrow"):
        np.add.at(tot, bt["code"].to_numpy(), bt["s"].to_numpy())
    return pa.table({"node": pa.array(nodes),
                     "degree": pa.array(deg),
                     "avg_nbr_degree": pa.array(tot / deg)})


def degree_assortativity(edges, src: str = "src", dst: str = "dst",
                         *, num_partitions: int | None = None
                         ) -> pa.Table:
    """Degree assortativity of the canonical undirected graph: the
    Pearson correlation of endpoint degrees over DIRECTED STUBS (each
    edge contributes both (deg a, deg b) and (deg b, deg a) — the
    standard symmetrization; the SQL oracle is a plain ``corr()`` over
    the same stub union).  Returns one row
    ``pa.Table(stubs, assortativity)``.

    Shape: shared canonical-dedup exchange + degree fold, then ONE
    narrow pass emitting five scalar moments per block (Σx, Σx², Σxy
    over stubs — x and y marginals coincide under symmetrization);
    the driver combines scalars only."""
    import ray

    ded, nodes, deg = _canonical_degrees(
        edges, src, dst, num_partitions=num_partitions)
    if len(nodes) == 0:
        return pa.table({"stubs": pa.array([0], type=pa.int64()),
                         "assortativity": pa.array(
                             [None], type=pa.float64())})
    ref = ray.put((nodes, deg))

    def _moments(t: pa.Table, _ref=ref) -> pa.Table:
        nd, dg = ray.get(_ref)
        da = dg[np.searchsorted(nd, t["a"].to_numpy())] \
            .astype(np.float64)
        db = dg[np.searchsorted(nd, t["b"].to_numpy())] \
            .astype(np.float64)
        return pa.table({
            "m": pa.array([2 * t.num_rows], type=pa.int64()),
            "s1": pa.array([float((da + db).sum())]),
            "s2": pa.array([float((da * da + db * db).sum())]),
            "sp": pa.array([float(2.0 * (da * db).sum())])})

    m = 0
    s1 = s2 = sp = 0.0
    for bt in ded.map_batches(_moments, batch_size=None,
                              batch_format="pyarrow") \
                 .iter_batches(batch_size=None,
                               batch_format="pyarrow"):
        m += int(bt["m"].to_numpy().sum())
        s1 += float(bt["s1"].to_numpy().sum())
        s2 += float(bt["s2"].to_numpy().sum())
        sp += float(bt["sp"].to_numpy().sum())
    var = m * s2 - s1 * s1
    r = (m * sp - s1 * s1) / var if var > 0 else None
    return pa.table({"stubs": pa.array([m], type=pa.int64()),
                     "assortativity": pa.array([r],
                                               type=pa.float64())})


def k_core(edges, k: int, src: str = "src", dst: str = "dst", *,
           max_nodes: int = 200_000_000, max_iters: int = 10_000,
           num_partitions: int | None = None) -> pa.Table:
    """Nodes of the k-core (maximal subgraph where every node has
    degree >= k, over distinct undirected neighbors) — the classic
    spam-farm / low-quality-page peel.  Returns
    ``pa.Table(node, degree)`` with the node's degree INSIDE the core.

    Iterative peel, Ray-Data-shaped: the deduped canonical edge set is
    materialized ONCE; each round is ONE narrow pass over those blocks
    with the alive-node bitmask broadcast (``ray.put`` of a bool
    vector — 1 byte/node, same ceiling as :func:`pagerank`), emitting
    node-bounded degree partials; the driver drops nodes under k and
    re-broadcasts.  Round count is data-dependent (worst case a path
    graph peels one node per round — ``max_iters`` guards it), which
    is also why there is no bounded SQL oracle: the driver records a
    rows-only check and semantics are pinned by pytest vs a
    sequential reference peel."""
    import ray

    ded, nodes, deg = _canonical_degrees(
        edges, src, dst, num_partitions=num_partitions)
    n = len(nodes)
    if n == 0:
        return pa.table({"node": pa.array([], type=pa.int64()),
                         "degree": pa.array([], type=pa.int64())})
    if n > max_nodes:
        raise ValueError(
            f"k_core: {n} nodes exceeds max_nodes={max_nodes}; see "
            "the pagerank docstring for the scale contract")
    alive = deg >= k
    cur = deg.copy()
    for _ in range(max_iters):
        if not alive.any():
            break
        ref = ray.put((nodes, alive))

        def _deg(t: pa.Table, _ref=ref) -> pa.Table:
            nd, al = ray.get(_ref)
            ca = np.searchsorted(nd, t["a"].to_numpy())
            cb = np.searchsorted(nd, t["b"].to_numpy())
            m = al[ca] & al[cb]
            c = (np.bincount(ca[m], minlength=len(nd))
                 + np.bincount(cb[m], minlength=len(nd)))
            nz = np.flatnonzero(c)
            return pa.table({"code": pa.array(nz.astype(np.int64)),
                             "c": pa.array(c[nz].astype(np.int64))})

        cur = np.zeros(n, dtype=np.int64)
        for bt in ded.map_batches(_deg, batch_size=None,
                                  batch_format="pyarrow") \
                     .iter_batches(batch_size=None,
                                   batch_format="pyarrow"):
            np.add.at(cur, bt["code"].to_numpy(), bt["c"].to_numpy())
        drop = alive & (cur < k)
        if not drop.any():
            break
        alive &= ~drop
    return pa.table({"node": pa.array(nodes[alive]),
                     "degree": pa.array(cur[alive])})


def bfs_hops(edges, source_nodes, *, src: str = "src",
             dst: str = "dst", max_hops: int = 3,
             max_frontier: int = 200_000_000) -> pa.Table:
    """Multi-source BFS hop distance: ``pa.Table(node, hops)`` with the
    MINIMUM hop count from any source, for every node within
    ``max_hops`` — reachability / blast-radius / k-hop-neighborhood,
    the other classic iterative graph primitive next to
    :func:`pagerank`.

    Scale shape mirrors pagerank's documented broadcast assumption:
    the edge Dataset stays distributed and each hop is ONE narrow
    map pass (per-batch: membership ``np.isin``-via-searchsorted of
    src codes against the broadcast sorted frontier, ``np.unique`` of
    the matched dsts — partials are distinct node ids, never edge
    rows); the driver unions partials and subtracts the visited set.
    Parallel edges are harmless (membership semantics), so no dedup
    exchange is needed.  Frontier/visited live driver-side, bounded
    by ``max_frontier`` with a loud fail (the rank-vector bound
    pagerank documents)."""
    import ray

    edges = edges.materialize()
    visited = np.unique(np.asarray(list(source_nodes), dtype=np.int64))
    if not len(visited):
        return pa.table({"node": pa.array([], pa.int64()),
                         "hops": pa.array([], pa.int64())})
    out_nodes = [visited]
    out_hops = [np.zeros(len(visited), dtype=np.int64)]
    frontier = visited
    for h in range(1, max_hops + 1):
        ref = ray.put(np.sort(frontier))

        def _expand(t: pa.Table, _ref=ref) -> pa.Table:
            fr = ray.get(_ref)
            s = t[src].to_numpy()
            idx = np.searchsorted(fr, s)
            idx[idx == len(fr)] = 0
            hit = fr[idx] == s
            return pa.table({
                "node": pa.array(np.unique(t[dst].to_numpy()[hit]))})

        parts = []
        for bt in edges.map_batches(_expand, batch_size=None,
                                    batch_format="pyarrow") \
                       .iter_batches(batch_size=None,
                                     batch_format="pyarrow"):
            parts.append(bt["node"].to_numpy())
        reach = np.unique(np.concatenate(parts)) if parts else \
            np.empty(0, dtype=np.int64)
        frontier = np.setdiff1d(reach, visited, assume_unique=False)
        if not len(frontier):
            break
        visited = np.union1d(visited, frontier)
        if len(visited) > max_frontier:
            raise ValueError(
                f"bfs_hops: visited set {len(visited)} exceeds "
                f"max_frontier={max_frontier}; partition the sources "
                "or lower max_hops")
        out_nodes.append(frontier)
        out_hops.append(np.full(len(frontier), h, dtype=np.int64))
    nodes = np.concatenate(out_nodes)
    hops = np.concatenate(out_hops)
    order = np.argsort(nodes)
    return pa.table({"node": pa.array(nodes[order]),
                     "hops": pa.array(hops[order])})


def adamic_adar(edges, group: str, item: str, *,
                max_group: int = 4096,
                num_partitions: int | None = None,
                round_to: int = 9):
    """Adamic–Adar link-prediction score between items sharing groups:
    AA(a, b) = Σ_{shared group g} 1 / ln(|members(g)|) — the classic
    frequency-weighted common-neighbor score (a rare shared group is
    stronger evidence than a ubiquitous one).  Returns a Dataset of
    ``(item_a, item_b, common, aa)`` with item_a < item_b over
    DISTINCT (group, item) memberships; groups of one contribute no
    pairs, so every weight's ln argument is ≥ 2.

    Shape: ONE hash exchange on ``group`` co-locates each group's full
    membership (so the group size — the ln argument — is exact inside
    the partition); dedup + weighted pair expansion + in-partition
    combine are vectorized (the `_membership_pair_partial` machinery
    with a per-group weight riding the expansion), then ONE narrow
    exchange on ``item_a`` folds (n, Σw) partials.  Groups larger than
    ``max_group`` are SKIPPED (logged) — the documented quadratic
    guard; the SQL oracle states the identical HAVING rule.  The Σw
    fold order differs from DuckDB's scan order → both sides round to
    ``round_to``."""
    import logging

    from netml_ray.partition import partition_map

    empty = pa.table({"a": pa.array([], type=pa.int64()),
                      "b": pa.array([], type=pa.int64()),
                      "n": pa.array([], type=pa.int64()),
                      "w": pa.array([], type=pa.float64())})

    def _pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
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
                "adamic_adar: skipping %d group(s) larger than "
                "max_group=%d", int(big.sum()), max_group)
            keep_rows = np.repeat(~big, lens)
            gs, its = gs[keep_rows], its[keep_rows]
            starts = np.flatnonzero(np.r_[True, gs[1:] != gs[:-1]]) \
                if len(gs) else np.empty(0, dtype=np.int64)
            lens = np.diff(np.r_[starts, len(gs)])
        if not len(gs):
            return empty
        w_grp = 1.0 / np.log(lens.astype(np.float64))  # lens==1: inf,
        # but single-member groups expand to zero pairs below
        m = np.arange(len(gs)) - np.repeat(starts, lens)
        cnt_i = lens[np.repeat(np.arange(len(lens)), lens)] - 1 - m
        total = int(cnt_i.sum())
        if total == 0:
            return empty
        i_row = np.repeat(np.arange(len(gs)), cnt_i)
        j_off = np.arange(total) - np.repeat(
            np.r_[0, np.cumsum(cnt_i)[:-1]], cnt_i)
        a = its[i_row]
        b = its[i_row + 1 + j_off]
        w = w_grp[np.repeat(np.arange(len(lens)), lens)][i_row]
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        order2 = np.lexsort((hi, lo))
        lo, hi, w = lo[order2], hi[order2], w[order2]
        f2 = np.r_[True, (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])]
        s2 = np.flatnonzero(f2)
        return pa.table({
            "a": pa.array(lo[s2]), "b": pa.array(hi[s2]),
            "n": pa.array(np.diff(np.r_[s2, len(lo)]).astype(np.int64)),
            "w": pa.array(np.add.reduceat(w, s2))})

    partial = partition_map(edges, group, _pairs,
                            num_partitions=num_partitions)

    def _combine(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"item_a": pa.array([], type=pa.int64()),
                             "item_b": pa.array([], type=pa.int64()),
                             "common": pa.array([], type=pa.int64()),
                             "aa": pa.array([], type=pa.float64())})
        a = t["a"].to_numpy()
        b = t["b"].to_numpy()
        nn = t["n"].to_numpy()
        w = t["w"].to_numpy()
        order = np.lexsort((b, a))
        a, b, nn, w = a[order], b[order], nn[order], w[order]
        f = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        s = np.flatnonzero(f)
        return pa.table({
            "item_a": pa.array(a[s]), "item_b": pa.array(b[s]),
            "common": pa.array(np.add.reduceat(nn, s).astype(np.int64)),
            "aa": pa.array(np.round(np.add.reduceat(w, s), round_to))})

    return partition_map(partial, "a", _combine,
                         num_partitions=num_partitions)


def label_propagation(edges, src: str = "src", dst: str = "dst", *,
                      iters: int = 3, dedupe: bool = True,
                      max_nodes: int = 200_000_000,
                      num_partitions: int | None = None) -> pa.Table:
    """Synchronous label propagation (community detection): every node
    starts labeled with its own id; each iteration relabels a node to
    the MOST FREQUENT label among its in-neighbors, ties → smallest
    label, no-in-edge nodes keep their label — all integer arithmetic,
    so the unrolled SQL oracle is bitwise (no float hedge anywhere).
    Deterministic by construction (synchronous update + min-label tie
    rule; the classic async variant is run-order-dependent and
    un-oracle-able).

    Cluster shape = :func:`pagerank`: edges stay a distributed
    Dataset (one dedup exchange, materialized blocks); the label
    vector broadcasts via ``ray.put``; each iteration is ONE narrow
    pass emitting per-batch (dst, label, n) count partials, folded on
    the driver.  Driver fold is bounded by distinct (dst, label)
    pairs — worst case O(E) on iteration 1, shrinking as labels
    converge; the ``max_nodes`` broadcast ceiling is shared with
    pagerank and the documented scale path beyond it is the
    rank-as-Dataset join variant."""
    import ray

    ds = dedupe_edges_with_degree(edges, src, dst,
                                  num_partitions=num_partitions) \
        if dedupe else edges.materialize()

    def _node_partial(t: pa.Table) -> pa.Table:
        u = np.union1d(np.unique(t[src].to_numpy()),
                       np.unique(t[dst].to_numpy()))
        return pa.table({"node": pa.array(u)})

    parts = [bt["node"].to_numpy()
             for bt in ds.map_batches(_node_partial, batch_size=None,
                                      batch_format="pyarrow")
             .iter_batches(batch_size=None, batch_format="pyarrow")]
    nodes = np.unique(np.concatenate(parts)) if parts else \
        np.empty(0, dtype=np.int64)
    n = len(nodes)
    if n == 0:
        return pa.table({"node": pa.array([], type=pa.int64()),
                         "label": pa.array([], type=pa.int64())})
    if n > max_nodes:
        raise ValueError(
            f"label_propagation: {n} nodes exceeds max_nodes="
            f"{max_nodes}; see the pagerank docstring")
    labels = nodes.copy()

    for _ in range(iters):
        ref = ray.put((nodes, labels))

        def _pairs(t: pa.Table, _ref=ref) -> pa.Table:
            nd, lab = ray.get(_ref)
            sc = np.searchsorted(nd, t[src].to_numpy())
            dc = np.searchsorted(nd, t[dst].to_numpy())
            sl = lab[sc]
            order = np.lexsort((sl, dc))
            dcs, sls = dc[order], sl[order]
            f = np.r_[True, (dcs[1:] != dcs[:-1]) | (sls[1:] != sls[:-1])]
            s = np.flatnonzero(f)
            return pa.table({
                "d": pa.array(dcs[s].astype(np.int64)),
                "lab": pa.array(sls[s]),
                "n": pa.array(np.diff(np.r_[s, len(dcs)])
                              .astype(np.int64))})

        acc: dict = {}
        for bt in ds.map_batches(_pairs, batch_size=None,
                                 batch_format="pyarrow") \
                    .iter_batches(batch_size=None,
                                  batch_format="pyarrow"):
            for d, la, c in zip(bt["d"].to_numpy(),
                                bt["lab"].to_numpy(),
                                bt["n"].to_numpy()):
                k = (int(d), int(la))
                acc[k] = acc.get(k, 0) + int(c)
        new_labels = labels.copy()
        if acc:
            ks = np.array(list(acc.keys()), dtype=np.int64)
            cs = np.array(list(acc.values()), dtype=np.int64)
            o = np.lexsort((ks[:, 1], -cs, ks[:, 0]))
            ks, cs = ks[o], cs[o]
            first = np.r_[True, ks[1:, 0] != ks[:-1, 0]]
            fi = np.flatnonzero(first)
            new_labels[ks[fi, 0]] = ks[fi, 1]
        labels = new_labels

    return pa.table({"node": pa.array(nodes),
                     "label": pa.array(labels)})


def bellman_ford(edges, source_nodes, *, src: str = "src",
                 dst: str = "dst", weight: str = "w",
                 rounds: int = 3,
                 max_nodes: int = 200_000_000) -> pa.Table:
    """Weighted single/multi-source shortest paths, Bellman–Ford
    Jacobi rounds: after round r every node holds the exact minimum
    distance over paths of ≤ r edges (the unweighted analog is
    :func:`bfs_hops`).  Relaxations read the FROZEN previous-round
    vector, so the result is well-defined and matches the recursive-
    CTE oracle's ≤-``rounds``-edge walk.

    Scale shape: the edge Dataset stays distributed; each round is
    ONE narrow map pass — per batch, a searchsorted lookup of src
    distances against the broadcast vector, candidate = d + w, and a
    lexsort/reduceat per-batch MIN per dst (partials are one row per
    distinct dst, never edge rows); the driver folds mins.  The
    distance vector is driver-side, bounded by ``max_nodes`` with a
    loud fail (pagerank's documented rank-vector bound)."""
    import ray

    edges = edges.materialize()
    keys = np.unique(np.asarray(list(source_nodes), dtype=np.int64))
    if not len(keys):
        return pa.table({"node": pa.array([], pa.int64()),
                         "dist": pa.array([], pa.int64())})
    dist = np.zeros(len(keys), dtype=np.int64)
    for _ in range(rounds):
        ref = ray.put((keys, dist))

        def _relax(t: pa.Table) -> pa.Table:
            k, d = ray.get(ref)
            s = t[src].to_numpy()
            dd = t[dst].to_numpy()
            w = t[weight].to_numpy()
            pos = np.clip(np.searchsorted(k, s), 0, len(k) - 1)
            ok = k[pos] == s
            if not ok.any():
                return pa.table({"node": pa.array([], pa.int64()),
                                 "d": pa.array([], pa.int64())})
            cand = d[pos[ok]] + w[ok]
            dn = dd[ok]
            order = np.lexsort((cand, dn))
            dn, cand = dn[order], cand[order]
            first = np.r_[True, dn[1:] != dn[:-1]]
            st = np.flatnonzero(first)
            return pa.table({"node": pa.array(dn[st]),
                             "d": pa.array(cand[st])})

        acc: dict = {}
        for bt in edges.map_batches(_relax, batch_format="pyarrow") \
                       .iter_batches(batch_size=None,
                                     batch_format="pyarrow"):
            for nd, dv in zip(bt["node"].to_numpy(),
                              bt["d"].to_numpy()):
                if nd not in acc or dv < acc[nd]:
                    acc[nd] = dv
        if not acc:
            break
        new_k = np.fromiter(acc.keys(), dtype=np.int64, count=len(acc))
        new_d = np.fromiter(acc.values(), dtype=np.int64,
                            count=len(acc))
        merged = {int(k_): int(d_) for k_, d_ in zip(keys, dist)}
        changed = False
        for nd, dv in zip(new_k, new_d):
            nd = int(nd)
            if nd not in merged or dv < merged[nd]:
                merged[nd] = int(dv)
                changed = True
        if len(merged) > max_nodes:
            raise ValueError(
                f"bellman_ford: reached set exceeds max_nodes="
                f"{max_nodes}; shard the distance vector")
        keys = np.fromiter(sorted(merged), dtype=np.int64,
                           count=len(merged))
        dist = np.array([merged[int(k_)] for k_ in keys],
                        dtype=np.int64)
        if not changed:
            break
    return pa.table({"node": pa.array(keys),
                     "dist": pa.array(dist)})


def min_label_rounds(edges, *, src: str = "src", dst: str = "dst",
                     rounds: int = 3,
                     max_nodes: int = 200_000_000) -> pa.Table:
    """FIXED-round synchronous min-label propagation over an edge
    Dataset: after round r every node holds min{id(u) : u within ≤r
    hops} — the deterministic, oracle-able prefix of connected-
    components labeling (the label_propagation precedent: BOTH
    engines run exactly ``rounds`` Jacobi rounds, so parity holds
    whether or not the diameter has converged; run more rounds for
    full components).

    Edges stay distributed; each round is ONE narrow pass emitting
    per-batch (dst, min incoming label) partials against the frozen
    broadcast label vector; the driver folds mins.  Node set =
    endpoints of the edges; the label vector is driver-side, bounded
    by ``max_nodes`` with a loud fail."""
    import ray

    edges = edges.materialize()
    ends = []
    for bt in edges.select_columns([src, dst]) \
                   .iter_batches(batch_size=None,
                                 batch_format="pyarrow"):
        ends.append(np.unique(np.r_[bt[src].to_numpy(),
                                    bt[dst].to_numpy()]))
    if not ends:
        return pa.table({"node": pa.array([], pa.int64()),
                         "label": pa.array([], pa.int64())})
    keys = np.unique(np.concatenate(ends)).astype(np.int64)
    if len(keys) > max_nodes:
        raise ValueError(
            f"min_label_rounds: {len(keys)} nodes exceeds max_nodes="
            f"{max_nodes}; shard the label vector")
    label = keys.copy()
    for _ in range(rounds):
        ref = ray.put((keys, label))

        def _mins(t: pa.Table) -> pa.Table:
            k, lab = ray.get(ref)
            s = t[src].to_numpy()
            d = t[dst].to_numpy()
            ls = lab[np.searchsorted(k, s)]
            order = np.lexsort((ls, d))
            d, ls = d[order], ls[order]
            first = np.r_[True, d[1:] != d[:-1]]
            st = np.flatnonzero(first)
            return pa.table({"node": pa.array(d[st]),
                             "m": pa.array(ls[st])})

        incoming: dict = {}
        for bt in edges.map_batches(_mins, batch_format="pyarrow") \
                       .iter_batches(batch_size=None,
                                     batch_format="pyarrow"):
            for nd, m in zip(bt["node"].to_numpy(),
                             bt["m"].to_numpy()):
                if nd not in incoming or m < incoming[nd]:
                    incoming[nd] = m
        if not incoming:
            break
        pos = np.searchsorted(keys, np.fromiter(
            incoming.keys(), dtype=np.int64, count=len(incoming)))
        vals = np.fromiter(incoming.values(), dtype=np.int64,
                           count=len(incoming))
        nxt = label.copy()
        np.minimum.at(nxt, pos, vals)
        if (nxt == label).all():
            break
        label = nxt
    return pa.table({"node": pa.array(keys),
                     "label": pa.array(label)})
