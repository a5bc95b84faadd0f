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
