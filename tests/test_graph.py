"""graph.pagerank vs a dense numpy power-iteration reference."""

import numpy as np
import pyarrow as pa


def _dense_pagerank(edges, n, damping, iters):
    """Reference: dense adjacency power iteration with the same
    simplified rule (dangling mass dropped, (1-d)/N floor)."""
    A = np.zeros((n, n))
    for s, d in edges:
        A[d, s] = 1.0
    deg = A.sum(axis=0)
    with np.errstate(divide="ignore", invalid="ignore"):
        W = np.where(deg > 0, A / deg, 0.0)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        r = (1.0 - damping) / n + damping * (W @ r)
    return r


def test_pagerank_vs_dense(ray_session):
    import ray.data as rd

    from netml_ray.graph import pagerank

    rng = np.random.default_rng(5)
    n = 40
    edges = set()
    while len(edges) < 220:
        s, d = rng.integers(0, n, 2)
        if s != d:
            edges.add((int(s), int(d)))
    edges = sorted(edges)
    # duplicate some edges on the input side: dedupe=True must ignore them
    src = np.array([e[0] for e in edges] + [edges[0][0], edges[1][0]],
                   dtype=np.int64)
    dst = np.array([e[1] for e in edges] + [edges[0][1], edges[1][1]],
                   dtype=np.int64)
    ds = rd.from_arrow(pa.table({"src": pa.array(src),
                                 "dst": pa.array(dst)}))
    got = pagerank(ds, iters=4, damping=0.85, num_partitions=4)
    present = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {v: i for i, v in enumerate(present)}
    exp = _dense_pagerank([(idx[s], idx[d]) for s, d in edges],
                          len(present), 0.85, 4)
    nodes = got["node"].to_numpy()
    r = got["pagerank"].to_numpy()
    assert list(nodes) == present
    np.testing.assert_allclose(r, exp, atol=1e-12)
    # ranks of present nodes plus the dropped-dangling deficit stay <= 1
    assert r.sum() <= 1.0 + 1e-9


def test_pagerank_sink_and_source(ray_session):
    """A sink (no out-edges) still gets rank; a pure source holds the
    (1-d)/N floor after iteration 1."""
    import ray.data as rd

    from netml_ray.graph import pagerank

    # 0 -> 1, 2 -> 1 : node 1 is a sink, nodes 0/2 pure sources
    ds = rd.from_arrow(pa.table({
        "src": pa.array(np.array([0, 2], dtype=np.int64)),
        "dst": pa.array(np.array([1, 1], dtype=np.int64))}))
    got = pagerank(ds, iters=2, damping=0.85)
    r = dict(zip(got["node"].to_numpy().tolist(),
                 got["pagerank"].to_numpy().tolist()))
    n = 3
    floor = 0.15 / n
    assert np.isclose(r[0], floor) and np.isclose(r[2], floor)
    # sink: floor + d * (two sources at floor, deg 1 each)
    assert np.isclose(r[1], floor + 0.85 * 2 * floor)


def test_hits_vs_dense(ray_session):
    """hub/auth == dense L1-normalized iteration on a random directed
    graph; on a bipartite left->right graph, left nodes are pure hubs
    (auth 0) and right pure authorities (hub 0)."""
    import ray.data as rd

    from netml_ray.graph import hits

    rng = np.random.default_rng(7)
    edges = set()
    while len(edges) < 120:
        s, d = rng.integers(0, 25, 2)
        if s != d:
            edges.add((int(s), int(d)))
    edges = sorted(edges)
    present = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {v: i for i, v in enumerate(present)}
    n = len(present)
    A = np.zeros((n, n))
    for s, d in edges:
        A[idx[d], idx[s]] = 1.0  # A[dst, src]
    h = np.full(n, 1.0 / n)
    for _ in range(3):
        a = A @ h
        a = a / a.sum() if a.sum() > 0 else a
        h = A.T @ a
        h = h / h.sum() if h.sum() > 0 else h
    ds = rd.from_arrow(pa.table({
        "src": pa.array(np.array([e[0] for e in edges], dtype=np.int64)),
        "dst": pa.array(np.array([e[1] for e in edges], dtype=np.int64))}))
    got = hits(ds, iters=3, num_partitions=4)
    assert list(got["node"].to_numpy()) == present
    np.testing.assert_allclose(got["hub"].to_numpy(), h, atol=1e-12)
    np.testing.assert_allclose(got["auth"].to_numpy(), a, atol=1e-12)

    # bipartite purity
    ds2 = rd.from_arrow(pa.table({
        "src": pa.array(np.array([0, 2, 4], dtype=np.int64)),
        "dst": pa.array(np.array([1, 1, 3], dtype=np.int64))}))
    g2 = hits(ds2, iters=2)
    d2 = {int(r["node"]): (r["hub"], r["auth"])
          for r in g2.to_pylist()}
    assert d2[1][0] == 0 and d2[3][0] == 0        # sinks: no hub score
    assert d2[0][1] == 0 and d2[2][1] == 0 and d2[4][1] == 0


def test_cooccurrence_similarity_vs_bruteforce(ray_session):
    """pair common counts + jaccard == brute-force over distinct
    memberships, with duplicated input rows ignored."""
    import itertools

    import ray.data as rd

    from netml_ray.graph import cooccurrence_similarity

    rng = np.random.default_rng(11)
    n = 3000
    g = rng.integers(0, 60, n)
    it = rng.integers(0, 15, n)
    t = pa.table({"g": pa.array(g.astype(np.int64)),
                  "i": pa.array(it.astype(np.int64))})
    got = (cooccurrence_similarity(rd.from_arrow(t), "g", "i",
                                   num_partitions=4)
           .to_pandas().sort_values(["item_a", "item_b"])
           .reset_index(drop=True))
    member = {}
    for gg, ii in set(zip(g.tolist(), it.tolist())):
        member.setdefault(gg, set()).add(ii)
    deg = {}
    for gg, s in member.items():
        for ii in s:
            deg[ii] = deg.get(ii, 0) + 1
    common = {}
    for gg, s in member.items():
        for x, y in itertools.combinations(sorted(s), 2):
            common[(x, y)] = common.get((x, y), 0) + 1
    exp = sorted((x, y, c, c / (deg[x] + deg[y] - c))
                 for (x, y), c in common.items())
    assert len(got) == len(exp)
    for row, (x, y, c, j) in zip(got.itertuples(index=False), exp):
        assert (row.item_a, row.item_b, row.common) == (x, y, c)
        assert abs(row.jaccard - j) < 1e-12


def test_cooccurrence_max_group_skip(ray_session):
    """groups above max_group contribute no pairs but still count
    toward degrees."""
    import ray.data as rd

    from netml_ray.graph import cooccurrence_similarity

    # group 0 has 4 members (skipped at max_group=3); group 1 has 2
    t = pa.table({"g": pa.array([0, 0, 0, 0, 1, 1], type=pa.int64()),
                  "i": pa.array([1, 2, 3, 4, 1, 2], type=pa.int64())})
    got = (cooccurrence_similarity(rd.from_arrow(t), "g", "i",
                                   max_group=3)
           .to_pandas())
    assert len(got) == 1
    r = got.iloc[0]
    # deg over ALL memberships: deg(1)=2, deg(2)=2; common=1 (group 1)
    assert (r["item_a"], r["item_b"], r["common"]) == (1, 2, 1)
    assert abs(r["jaccard"] - 1 / 3) < 1e-12


def test_pagerank_weighted_vs_dense(ray_session):
    """weight='count': duplicated input pairs become edge weights;
    ranks match a dense weighted power iteration."""
    import ray.data as rd

    from netml_ray.graph import pagerank

    rng = np.random.default_rng(19)
    n = 20
    base = []
    while len(set(base)) < 60:
        s, d = rng.integers(0, n, 2)
        if s != d:
            base.append((int(s), int(d)))
    # multiplicity: each distinct pair appears 1-3 times
    w = {}
    for e in base:
        w[e] = min(w.get(e, 0) + 1, 3)
    rows = [e for e, k in w.items() for _ in range(k)]
    rng.shuffle(rows)
    src = np.array([e[0] for e in rows], dtype=np.int64)
    dst = np.array([e[1] for e in rows], dtype=np.int64)
    ds = rd.from_arrow(pa.table({"src": pa.array(src),
                                 "dst": pa.array(dst)}))
    got = pagerank(ds, iters=4, damping=0.85, weight="count",
                   num_partitions=3)
    present = sorted({e[0] for e in w} | {e[1] for e in w})
    idx = {v: i for i, v in enumerate(present)}
    m = len(present)
    W = np.zeros((m, m))
    for (s, d), k in w.items():
        W[idx[d], idx[s]] += k
    wdeg = W.sum(axis=0)
    with np.errstate(divide="ignore", invalid="ignore"):
        P = np.where(wdeg > 0, W / wdeg, 0.0)
    r = np.full(m, 1.0 / m)
    for _ in range(4):
        r = 0.15 / m + 0.85 * (P @ r)
    assert list(got["node"].to_numpy()) == present
    np.testing.assert_allclose(got["pagerank"].to_numpy(), r,
                               atol=1e-12)
    # unweighted on the same input treats duplicates as one edge:
    # different result unless all weights are equal
    got_u = pagerank(ds, iters=4, damping=0.85, num_partitions=3)
    assert not np.allclose(got_u["pagerank"].to_numpy(), r, atol=1e-9)


def _brute_triangles(src, dst):
    """Reference: per-node degree + triangle count over the canonical
    distinct undirected edge set (self-loops dropped)."""
    import itertools

    E = {(min(s, d), max(s, d)) for s, d in zip(src, dst) if s != d}
    adj = {}
    for a, b in E:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = {v: 0 for v in adj}
    for x in adj:
        for y, z in itertools.combinations(sorted(adj[x]), 2):
            if y > x and z > x and (y, z) in E:
                tri[x] += 1
                tri[y] += 1
                tri[z] += 1
    return adj, tri


def test_triangle_census_vs_bruteforce_both_paths(ray_session):
    """broadcast closure == exchange closure == brute force, incl.
    the clustering-coefficient formula and duplicate/reversed/self
    edge handling."""
    import ray.data as rd

    from netml_ray.graph import triangle_census

    rng = np.random.default_rng(23)
    src = rng.integers(0, 45, 500).astype(np.int64)
    dst = rng.integers(0, 45, 500).astype(np.int64)
    ds = rd.from_arrow(pa.table({"src": pa.array(src),
                                 "dst": pa.array(dst)})).repartition(4)
    adj, tri = _brute_triangles(src, dst)
    for mode in ("broadcast", "exchange"):
        out = triangle_census(ds, closure=mode, num_partitions=4)
        assert list(out["node"].to_numpy()) == sorted(adj)
        for node, deg, t, c in zip(out["node"].to_numpy(),
                                   out["degree"].to_numpy(),
                                   out["triangles"].to_numpy(),
                                   out["clustering"].to_numpy()):
            d = len(adj[int(node)])
            assert deg == d
            assert t == tri[int(node)]
            exp_c = 2.0 * t / (d * (d - 1)) if d >= 2 else 0.0
            assert abs(c - exp_c) < 1e-12


def test_triangle_census_wedge_chunking(ray_session):
    """A tiny wedge_chunk forces the hub-guard slicing through every
    boundary case (mid-run splits, partially consumed rows) — counts
    must be identical to the unchunked run."""
    import ray.data as rd

    from netml_ray.graph import triangle_census

    rng = np.random.default_rng(7)
    src = rng.integers(0, 25, 400).astype(np.int64)
    dst = rng.integers(0, 25, 400).astype(np.int64)
    ds = rd.from_arrow(pa.table({"src": pa.array(src),
                                 "dst": pa.array(dst)}))
    big = triangle_census(ds, wedge_chunk=4_000_000, num_partitions=3)
    for chunk in (1, 3, 7):
        small = triangle_census(ds, wedge_chunk=chunk,
                                num_partitions=3)
        assert small.equals(big)


def test_neighbor_degree_and_assortativity_vs_bruteforce(ray_session):
    import ray.data as rd

    from netml_ray.graph import (degree_assortativity,
                                 neighbor_degree_stats)

    rng = np.random.default_rng(31)
    src = rng.integers(0, 30, 300).astype(np.int64)
    dst = rng.integers(0, 30, 300).astype(np.int64)
    ds = rd.from_arrow(pa.table({"src": pa.array(src),
                                 "dst": pa.array(dst)})).repartition(3)
    adj, _ = _brute_triangles(src, dst)
    out = neighbor_degree_stats(ds, num_partitions=4)
    assert list(out["node"].to_numpy()) == sorted(adj)
    for node, deg, av in zip(out["node"].to_numpy(),
                             out["degree"].to_numpy(),
                             out["avg_nbr_degree"].to_numpy()):
        nbrs = adj[int(node)]
        assert deg == len(nbrs)
        exp = sum(len(adj[v]) for v in nbrs) / len(nbrs)
        assert abs(av - exp) < 1e-12
    got = degree_assortativity(ds, num_partitions=4)
    xs, ys = [], []
    for a, b in {(min(s, d), max(s, d))
                 for s, d in zip(src, dst) if s != d}:
        xs += [len(adj[a]), len(adj[b])]
        ys += [len(adj[b]), len(adj[a])]
    x, y = np.array(xs, float), np.array(ys, float)
    r = np.corrcoef(x, y)[0, 1]
    assert got["stubs"].to_numpy()[0] == len(x)
    assert abs(got["assortativity"].to_numpy()[0] - r) < 1e-9
    # empty graph: null assortativity, zero stubs
    e0 = rd.from_arrow(pa.table({"src": pa.array([], type=pa.int64()),
                                 "dst": pa.array([], type=pa.int64())}))
    g0 = degree_assortativity(e0)
    assert g0["stubs"].to_numpy()[0] == 0
    assert g0["assortativity"].null_count == 1


def test_k_core_vs_sequential_peel(ray_session):
    import ray.data as rd

    from netml_ray.graph import k_core

    rng = np.random.default_rng(41)
    src = rng.integers(0, 40, 350).astype(np.int64)
    dst = rng.integers(0, 40, 350).astype(np.int64)
    ds = rd.from_arrow(pa.table({"src": pa.array(src),
                                 "dst": pa.array(dst)})).repartition(3)
    E = {(min(s, d), max(s, d)) for s, d in zip(src, dst) if s != d}
    for k in (2, 4, 7, 100):
        adj = {}
        for a, b in E:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        changed = True
        while changed:
            changed = False
            for v in [v for v in adj if len(adj[v]) < k]:
                for u in adj.pop(v):
                    adj[u].discard(v)
                changed = True
        out = k_core(ds, k, num_partitions=4)
        assert list(out["node"].to_numpy()) == sorted(adj)
        for node, deg in zip(out["node"].to_numpy(),
                             out["degree"].to_numpy()):
            assert deg == len(adj[int(node)])
    # path graph peels one endpoint pair per round at k=2 -> empty
    path = rd.from_arrow(pa.table(
        {"src": pa.array(np.arange(50, dtype=np.int64)),
         "dst": pa.array(np.arange(1, 51, dtype=np.int64))}))
    assert k_core(path, 2).num_rows == 0
    # cycle is its own 2-core
    cyc = rd.from_arrow(pa.table(
        {"src": pa.array(np.arange(50, dtype=np.int64)),
         "dst": pa.array(np.r_[np.arange(1, 50), 0].astype(np.int64))}))
    assert k_core(cyc, 2).num_rows == 50


def test_bfs_hops_vs_brute(ray_session):
    """Distributed frontier BFS == a python adjacency-dict BFS
    (min hops, multi-source, parallel edges harmless), bounded by
    max_hops; unreachable nodes absent."""
    import ray.data as rd

    from netml_ray.graph import bfs_hops

    rng = np.random.default_rng(7)
    n_nodes, n_edges = 300, 900
    src = rng.integers(0, n_nodes, n_edges)
    dst = rng.integers(0, n_nodes, n_edges)
    # a deliberately disconnected island
    iso = np.array([900, 901]), np.array([901, 900])
    src = np.concatenate([src, iso[0]])
    dst = np.concatenate([dst, iso[1]])
    # parallel edges: duplicate a slice
    src = np.concatenate([src, src[:50]])
    dst = np.concatenate([dst, dst[:50]])
    edges = pa.table({"src": pa.array(src.astype(np.int64)),
                      "dst": pa.array(dst.astype(np.int64))})
    adj: dict = {}
    for a, b in zip(src, dst):
        adj.setdefault(int(a), set()).add(int(b))
    sources = [0, 5]
    dist = {s: 0 for s in sources}
    frontier = list(sources)
    for h in range(1, 4):
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = h
                    nxt.append(v)
        frontier = nxt
    for parts in (1, 5):
        got = bfs_hops(rd.from_arrow(edges).repartition(parts),
                       sources, max_hops=3)
        gd = dict(zip(got["node"].to_pylist(),
                      got["hops"].to_pylist()))
        assert gd == dist
    assert 900 not in dist and 901 not in dist


def test_adamic_adar_vs_brute(ray_session):
    """AA score == a Counter brute over distinct memberships; groups
    above max_group are skipped from pairs (guard semantics)."""
    import math
    from collections import defaultdict

    import pyarrow as pa
    import ray.data as rd

    from netml_ray.graph import adamic_adar

    rng = np.random.default_rng(41)
    # group sizes vary 2..~15 distinct members; guard at 10 skips some
    g = rng.integers(0, 300, 4_000)
    it = rng.integers(0, 40, 4_000)
    t = pa.table({"g": pa.array(g), "i": pa.array(it)})
    out = adamic_adar(rd.from_arrow(t).repartition(5), "g", "i",
                      max_group=10).to_pandas() \
        .set_index(["item_a", "item_b"])

    members = defaultdict(set)
    for gg, ii in zip(g, it):
        members[gg].add(ii)
    assert any(len(m) > 10 for m in members.values())   # guard fires
    assert any(2 <= len(m) <= 10 for m in members.values())
    exp_n = defaultdict(int)
    exp_w = defaultdict(float)
    for gg, ms in members.items():
        if len(ms) > 10:
            continue
        ms = sorted(ms)
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                exp_n[(ms[x], ms[y])] += 1
                exp_w[(ms[x], ms[y])] += 1.0 / math.log(len(ms))
    assert len(out) == len(exp_n)
    for k, n in exp_n.items():
        assert out.loc[k, "common"] == n
        assert abs(out.loc[k, "aa"] - exp_w[k]) < 1e-8


def test_personalized_pagerank(ray_session):
    """PPR vs a dense numpy power iteration on a small graph; mass
    concentrates near the seeds; non-seed teleport is zero."""
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.graph import pagerank

    rng = np.random.default_rng(101)
    src = rng.integers(0, 40, 600)
    dst = rng.integers(0, 40, 600)
    t = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    seeds = np.array([0, 1], dtype=np.int64)
    out = pagerank(rd.from_arrow(t), seeds=seeds, iters=3) \
        .to_pandas().set_index("node")

    edges = {(a, b) for a, b in zip(src, dst)}
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for a, _ in edges:
        deg[idx[a]] += 1
    s = np.zeros(n)
    s[[idx[0], idx[1]]] = 0.5
    r = s.copy()
    for _ in range(3):
        c = np.zeros(n)
        for a, b in edges:
            c[idx[b]] += r[idx[a]] / deg[idx[a]]
        r = (1.0 - 0.85) * s + 0.85 * c
    for v in nodes:
        assert abs(out.loc[v, "pagerank"] - r[idx[v]]) < 1e-10

    import pytest

    with pytest.raises(ValueError):
        pagerank(rd.from_arrow(t), seeds=np.array([999], dtype=np.int64))


def test_label_propagation_vs_brute(ray_session):
    """3-iteration sync LPA == a python brute with the same
    mode/min-label rule; two disconnected cliques collapse to their
    min node id."""
    import ray.data as rd

    from netml_ray.graph import label_propagation

    # two 4-cliques (0-3, 10-13), symmetric edges
    def clique(base):
        out = []
        for i in range(4):
            for j in range(4):
                if i != j:
                    out.append((base + i, base + j))
        return out

    edges = clique(0) + clique(10)
    src = np.array([e[0] for e in edges], dtype=np.int64)
    dst = np.array([e[1] for e in edges], dtype=np.int64)
    got = label_propagation(
        rd.from_arrow(pa.table({"src": pa.array(src),
                                "dst": pa.array(dst)})), iters=3) \
        .to_pandas().set_index("node")
    assert (got.loc[[0, 1, 2, 3], "label"] == 0).all()
    assert (got.loc[[10, 11, 12, 13], "label"] == 10).all()

    # random graph vs brute
    rng = np.random.default_rng(111)
    e2 = {(int(a), int(b)) for a, b in
          zip(rng.integers(0, 30, 300), rng.integers(0, 30, 300))
          if a != b}
    src2 = np.array([e[0] for e in e2], dtype=np.int64)
    dst2 = np.array([e[1] for e in e2], dtype=np.int64)
    got2 = label_propagation(
        rd.from_arrow(pa.table({"src": pa.array(src2),
                                "dst": pa.array(dst2)})), iters=3) \
        .to_pandas().set_index("node")
    nodes = sorted({a for a, _ in e2} | {b for _, b in e2})
    lab = {v: v for v in nodes}
    from collections import Counter, defaultdict
    inn = defaultdict(list)
    for a, b in e2:
        inn[b].append(a)
    for _ in range(3):
        new = dict(lab)
        for v in nodes:
            if inn[v]:
                c = Counter(lab[u] for u in inn[v])
                best = max(c.items(), key=lambda kv: (kv[1], -kv[0]))
                new[v] = best[0]
        lab = new
    for v in nodes:
        assert got2.loc[v, "label"] == lab[v]


def test_bellman_ford_vs_brute(ray_session):
    """3-round distances equal brute min over <=3-edge paths on a
    random weighted digraph; round-r monotonicity holds."""
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.graph import bellman_ford

    rng = np.random.default_rng(29)
    n, m = 40, 300
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    w = rng.integers(1, 10, m)
    t = pa.table({"src": pa.array(src), "dst": pa.array(dst),
                  "w": pa.array(w.astype(np.int64))})
    out = bellman_ford(rd.from_arrow(t).repartition(4), [0],
                       rounds=3).to_pandas().set_index("node")
    INF = 1 << 60
    d = np.full(n, INF, dtype=np.int64)
    d[0] = 0
    for _ in range(3):
        nd = d.copy()
        for s, e, ww in zip(src, dst, w):
            if d[s] < INF and d[s] + ww < nd[e]:
                nd[e] = d[s] + ww
        d = nd
    reached = np.flatnonzero(d < INF)
    assert sorted(out.index) == sorted(reached.tolist())
    for node in reached:
        assert out.loc[node, "dist"] == d[node]


def test_min_label_rounds_vs_brute(ray_session):
    """r-round labels equal min id within <=r hops; enough rounds give
    full components."""
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.graph import min_label_rounds

    rng = np.random.default_rng(31)
    # chain 10-11-12-...-19 (diameter 9) + random clutter
    chain = np.arange(10, 20)
    src = np.r_[chain[:-1], rng.integers(30, 60, 40)]
    dst = np.r_[chain[1:], rng.integers(30, 60, 40)]
    s = np.r_[src, dst]
    d = np.r_[dst, src]
    t = pa.table({"src": pa.array(s), "dst": pa.array(d)})
    out3 = min_label_rounds(rd.from_arrow(t), rounds=3) \
        .to_pandas().set_index("node")
    # brute BFS min-label within <=3 hops
    import collections
    adj = collections.defaultdict(set)
    for a, b in zip(s, d):
        adj[a].add(b)
    for node in out3.index:
        seen = {node}
        frontier = {node}
        for _ in range(3):
            frontier = set().union(*(adj[x] for x in frontier)) - seen
            seen |= frontier
        assert out3.loc[node, "label"] == min(seen)
    full = min_label_rounds(rd.from_arrow(t), rounds=12) \
        .to_pandas().set_index("node")
    assert (full.loc[chain, "label"] == 10).all()
