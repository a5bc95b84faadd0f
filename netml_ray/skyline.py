"""Pareto-front (skyline) operator.

``pareto_front`` returns every distinct objective vector not dominated
by another row (``a`` dominates ``b`` when ``a`` is at least as good in
every objective and strictly better in at least one), plus the number
of input rows carrying each front vector.  The classic multi-objective
"best trade-off" query (Börzsönyi et al., "The Skyline Operator",
ICDE 2001) — netml has no analog; this generalizes its per-flow argmax
selections (reference parser.py keeps per-flow extrema only) to a
corpus-scale multi-criteria filter.

Scale shape (north_rule: same job on N and 4N nodes):

- Pass 1: per-batch vectorized partial fronts — valid because the
  skyline of a union is contained in the union of per-block skylines —
  then a driver-side final front over the (tiny) union of partials.
  No shuffle; the exchange is O(front size) rows per block.
- Pass 2: the final front (small by construction) is closed over and
  broadcast with the task; each batch emits an O(front) count partial
  (rows per front vector), summed on the driver.  No shuffle.

The front itself must fit on the driver — true for the low-dimension
skylines this targets (front size is O(log^{d-1} n) in expectation for
independent dimensions); the module raises if a partial front exceeds
``max_front`` so a pathological anti-correlated input fails loudly
instead of silently collecting the dataset.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["pareto_front"]

_CHUNK = 512


def _oriented(t: pa.Table, cols, sense) -> np.ndarray:
    """(n, d) float64/int64 matrix oriented so larger == better."""
    mats = []
    for c, s in zip(cols, sense):
        col = t[c]
        if pa.types.is_timestamp(col.type) or pa.types.is_date(col.type):
            col = col.cast(pa.int64())
        v = col.to_numpy(zero_copy_only=False).astype(np.float64, copy=True)
        if s == "min":
            v = -v
        elif s != "max":
            raise ValueError(f"sense must be 'max' or 'min', got {s!r}")
        mats.append(v)
    return np.column_stack(mats)


def _front_of(m: np.ndarray, max_front: int) -> np.ndarray:
    """Skyline rows of an oriented matrix; returns distinct front rows."""
    if not m.shape[0]:
        return m
    # distinct objective vectors (duplicates neither dominate each other)
    m = np.unique(m, axis=0)                      # lexsorted ASCENDING
    m = m[::-1]                                   # lexsort DESC: dominators first
    d = m.shape[1]
    if d == 2:
        # dominated iff the running max of col1 over strictly preceding
        # rows (which all have col0 >= own col0, strict somewhere among
        # distinct rows) is >= own col1.
        prev = np.maximum.accumulate(m[:, 1])
        keep = np.ones(len(m), bool)
        keep[1:] = prev[:-1] < m[1:, 1]
        out = m[keep]
    else:
        # chunked scan: in lexsorted-desc order every dominator of a row
        # precedes it, so checking each chunk against the accumulated
        # front plus within-chunk pairwise dominance is exact.
        front = np.empty((0, d))
        for i in range(0, len(m), _CHUNK):
            c = m[i:i + _CHUNK]
            if len(front):
                # dominated by an accumulated-front row? (front rows are
                # distinct from c rows, so >= in all dims == dominance)
                dom = (front[None, :, :] >= c[:, None, :]).all(2).any(1)
                c = c[~dom]
            if len(c):
                ge = (c[None, :, :] >= c[:, None, :]).all(2)
                np.fill_diagonal(ge, False)
                c = c[~ge.any(1)]
            if len(c):
                front = np.concatenate([front, c])
            if len(front) > max_front:
                raise ValueError(
                    f"pareto front exceeds max_front={max_front}; "
                    "raise the cap or reduce dimensions")
        out = front
    if len(out) > max_front:
        raise ValueError(
            f"pareto front exceeds max_front={max_front}; "
            "raise the cap or reduce dimensions")
    return out


def pareto_front(ds, cols, sense, *, max_front: int = 100_000,
                 count_col: str = "n_rows") -> pa.Table:
    """Global skyline of ``ds`` over ``cols`` with per-column ``sense``
    ('max' / 'min'), plus the input-row multiplicity of each front
    vector.  Returns a driver-side ``pa.Table`` (the front is small by
    construction) sorted by the first objective best-first, original
    column types preserved."""
    cols = list(cols)
    sense = list(sense)
    if len(cols) != len(sense) or len(cols) < 2:
        raise ValueError("need >=2 (col, sense) pairs")
    ds = ds.select_columns(cols).materialize()

    def _partial(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return t
        f = _front_of(_oriented(t, cols, sense), max_front)
        # carry the front back as original-typed rows: match oriented
        # rows to source rows (first occurrence) via void-view lookup
        m = _oriented(t, cols, sense)
        keep = np.zeros(t.num_rows, bool)
        for row in f:
            eq = (m == row[None, :]).all(1)
            keep[int(np.argmax(eq))] = True
        return t.filter(pa.array(keep))

    import ray
    part_tables = ray.get(ds.map_batches(
        _partial, batch_format="pyarrow").to_arrow_refs())
    part_tables = [p for p in part_tables if p.num_rows]
    if not part_tables:
        return pa.table({c: pa.array([], type=ds.schema().field(c).type)
                         for c in cols} | {count_col: pa.array([], pa.int64())})
    union = pa.concat_tables(part_tables, promote_options="none")
    final = _front_of(_oriented(union, cols, sense), max_front)

    # pass 2: count input rows per front vector (broadcast the small
    # front in the task closure; O(front * d) vectorized masks per batch)
    def _counts(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({"i": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        m = _oriented(t, cols, sense)
        idx, n = [], []
        for i, row in enumerate(final):
            k = int((m == row[None, :]).all(1).sum())
            if k:
                idx.append(i)
                n.append(k)
        return pa.table({"i": pa.array(idx, pa.int64()),
                         "n": pa.array(n, pa.int64())})

    tot = np.zeros(len(final), np.int64)
    for r in ds.map_batches(_counts, batch_format="pyarrow").take_all():
        tot[r["i"]] += r["n"]

    # rebuild original-typed front rows from the union table
    mu = _oriented(union, cols, sense)
    pick = []
    for row in final:
        pick.append(int(np.argmax((mu == row[None, :]).all(1))))
    out = union.take(pa.array(pick, pa.int64()))
    out = out.append_column(count_col, pa.array(tot, pa.int64()))
    # sort best-first on the first objective, tiebreak on the rest
    order = np.lexsort(tuple(
        (-1 if s == "max" else 1) *
        _oriented(out, [c], ["max"])[:, 0]
        for c, s in zip(reversed(cols), reversed(sense))))
    return out.take(pa.array(order, pa.int64()))
