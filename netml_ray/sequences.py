"""Event-sequence analytics: ordered funnels and transition counts.

The two classic per-entity ordered-event operators a product/behavior
pipeline needs on top of sessionization (reference analog: the per-flow
ordered packet walks in netml's parser — see
reference/src/netml/pparser/parser.py flow assembly — recast as keyed
time-ordered sequence features):

* :func:`funnel_stages` — for each key, how many of an ORDERED list of
  stages it completed, where each stage must occur STRICTLY after the
  previous stage's completion time (min-ts semantics, the standard
  funnel rule and exactly what the SQL oracle's chained
  ``min(ts) .. WHERE ts > prev`` CTEs state).
* :func:`transition_counts` — global Markov transition counts over
  adjacent event types per key, ordered by (ts, tiebreak) — the SQL
  ``lead() OVER (PARTITION BY key ORDER BY ts, id)`` rule.

Scale shape: both ride ``partition_map`` (ONE hash exchange to
co-locate each key's rows; both fns are run-segmented so the driver
fast path stays valid), and everything inside a partition is
vectorized — segment mins via ``np.minimum.reduceat``, shifted-array
adjacency, combined-code bincounts.  ``transition_counts`` emits one
tiny (from, to, n) partial per partition and the driver sums — output
cardinality is |types|², never rows."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["funnel_stages", "transition_counts"]


def _runs(keys: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(run start indices, per-row run ids) for a SORTED key column."""
    m = len(keys)
    starts = np.ones(m, dtype=bool)
    if m > 1:
        starts[1:] = np.asarray(pc.not_equal(
            keys.slice(1, m - 1), keys.slice(0, m - 1)).to_numpy(
            zero_copy_only=False), dtype=bool)
    return np.flatnonzero(starts), np.cumsum(starts) - 1


def funnel_stages(ds, key_col: str, ts_col: str, type_col: str,
                  stages: list[str], *, tiebreak: str,
                  out_col: str = "stages_completed"):
    """Per-key ordered funnel: the number of ``stages`` completed in
    order, each strictly after the previous completion.

    Semantics (mirrored verbatim by the SQL oracle): t₀ = min ts of
    stage 0; tᵢ = min ts of stage i with ts > tᵢ₋₁; the answer is the
    longest prefix with a defined tᵢ.  Vectorized per partition: one
    segment-min (``np.minimum.reduceat`` over masked +inf candidates)
    per stage — no per-key Python loop.  Returns (key, stages_completed)
    for every key present."""
    from .partition import partition_map

    def _fn(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({key_col: t[key_col],
                             out_col: pa.array([], type=pa.int64())})
        keys = t[key_col].combine_chunks()
        starts, run_id = _runs(keys)
        ts = t[ts_col].to_numpy(zero_copy_only=False)
        if np.issubdtype(ts.dtype, np.datetime64):
            # int64 ns: float64 can't represent ns epochs exactly
            # (2^53 < 1.7e18), so tie comparisons MUST stay integral
            ts = ts.view("i8")
            lo, hi = np.iinfo(np.int64).min, np.iinfo(np.int64).max
        else:
            ts = ts.astype(np.float64)
            lo, hi = -np.inf, np.inf
        enc = pc.dictionary_encode(t[type_col].combine_chunks())
        codes = enc.indices.to_numpy().astype(np.int64)
        vocab = {v: i for i, v in enumerate(enc.dictionary.to_pylist())}
        nruns = len(starts)
        prev = np.full(nruns, lo, dtype=ts.dtype)
        done = np.zeros(nruns, dtype=np.int64)
        alive = np.ones(nruns, dtype=bool)
        for i, stage in enumerate(stages):
            sc = vocab.get(stage, -1)
            mask = (codes == sc) & (ts > prev[run_id]) & alive[run_id]
            cand = np.where(mask, ts, hi)
            smin = np.minimum.reduceat(cand, starts)
            hit = (smin != hi) & alive
            done[hit] = i + 1
            prev = np.where(hit, smin, prev)
            alive = hit
        return pa.table({
            key_col: keys.take(pa.array(starts)),
            out_col: pa.array(done, type=pa.int64()),
        })

    return partition_map(ds, key_col, _fn,
                         sort_by=[key_col, ts_col, tiebreak])


def transition_counts(ds, key_col: str, ts_col: str, type_col: str, *,
                      tiebreak: str) -> pa.Table:
    """Global (from_type, to_type, n) counts of ADJACENT events per
    key, ordered by (ts, tiebreak) — the Markov-chain transition
    matrix of the corpus.

    One hash exchange co-locates each key's rows; each partition emits
    a ≤ |types|² count partial (combined-code bincount over the
    shifted adjacency, run boundaries masked), and the driver merges —
    the reduce is bounded by the type cardinality, never the rows."""
    from .partition import partition_map

    def _fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"from_type": pa.array([], type=pa.string()),
                          "to_type": pa.array([], type=pa.string()),
                          "n": pa.array([], type=pa.int64())})
        if t.num_rows < 2:
            return empty
        keys = t[key_col].combine_chunks()
        _, run_id = _runs(keys)
        enc = pc.dictionary_encode(t[type_col].combine_chunks())
        codes = enc.indices.to_numpy().astype(np.int64)
        k = len(enc.dictionary)
        a = codes[:-1]
        b = codes[1:]
        same = run_id[:-1] == run_id[1:]
        if not same.any():
            return empty
        comb = a[same] * k + b[same]
        cnt = np.bincount(comb, minlength=k * k)
        nz = np.flatnonzero(cnt)
        return pa.table({
            "from_type": enc.dictionary.take(pa.array(nz // k)),
            "to_type": enc.dictionary.take(pa.array(nz % k)),
            "n": pa.array(cnt[nz], type=pa.int64()),
        })

    partials = partition_map(ds, key_col, _fn,
                             sort_by=[key_col, ts_col, tiebreak])
    batches = list(partials.iter_batches(batch_format="pyarrow",
                                         batch_size=None))
    if not batches:
        return pa.table({"from_type": pa.array([], type=pa.string()),
                         "to_type": pa.array([], type=pa.string()),
                         "n": pa.array([], type=pa.int64())})
    merged = pa.concat_tables(
        [pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch)
         else b for b in batches])
    return (merged.group_by(["from_type", "to_type"])
            .aggregate([("n", "sum")])
            .rename_columns(["from_type", "to_type", "n"])
            .sort_by([("from_type", "ascending"),
                      ("to_type", "ascending")]))
