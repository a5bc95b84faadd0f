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

__all__ = ["funnel_stages", "transition_counts", "interval_sweep",
           "cohort_retention", "group_autocorr", "temporal_pairs",
           "active_users", "streaks", "scd2_intervals",
           "time_weighted_avg", "debounce", "event_paths",
           "trigram_counts", "new_returning", "markov_accuracy",
           "funnel_rates", "event_gaps", "session_conversion",
           "dod_retention"]


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
                  max_gap=None, out_col: str = "stages_completed"):
    """Per-key ordered funnel: the number of ``stages`` completed in
    order, each strictly after the previous completion.

    Semantics (mirrored verbatim by the SQL oracle): t₀ = min ts of
    stage 0; tᵢ = min ts of stage i with ts > tᵢ₋₁ (and, when
    ``max_gap`` is given, ts ≤ tᵢ₋₁ + max_gap — the conversion-window
    rule, in the ts column's units); the answer is the longest prefix
    with a defined tᵢ.  Vectorized per partition: one segment-min
    (``np.minimum.reduceat`` over masked +inf candidates) per stage —
    no per-key Python loop.  Returns (key, stages_completed) for
    every key present."""
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
            if max_gap is not None and i > 0:
                # dead runs wrap at the sentinel — already masked out
                mask &= ts <= prev[run_id] + max_gap
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


def interval_sweep(ds, key_col: str, start_us_col: str, end_us_col: str,
                   *, out_max: str = "max_concurrent",
                   out_busy: str = "busy_us"):
    """Per-key interval aggregation by sweep line: maximum concurrency
    and total covered ("busy") time of a set of [start, end) intervals
    — the classic capacity / utilization features.

    Each row becomes two boundary events (+1 at start, −1 at end, an
    int64-µs timeline); ONE hash exchange co-locates a key's
    boundaries, then a vectorized per-run (lexsort → cumsum → max /
    masked-diff sum) pass.  Ends sort before starts at equal times, so
    touching intervals never count as overlapping (the same ORDER BY
    t, d rule the SQL oracle states).  The exchange carries
    (key, t, d) triples — never payloads."""
    from .partition import partition_map

    def _emit(t: pa.Table) -> pa.Table:
        s = t[start_us_col].to_numpy(zero_copy_only=False).astype(np.int64)
        e = t[end_us_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keys = t[key_col]
        return pa.table({
            key_col: pa.concat_arrays(
                [keys.combine_chunks()] * 2) if t.num_rows else keys,
            "t": pa.array(np.concatenate([s, e]), type=pa.int64()),
            "d": pa.array(np.concatenate([
                np.ones(len(s), dtype=np.int64),
                -np.ones(len(e), dtype=np.int64)])),
        })

    def _fn(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({key_col: t[key_col],
                             out_max: pa.array([], type=pa.int64()),
                             out_busy: pa.array([], type=pa.int64())})
        keys = t[key_col].combine_chunks()
        starts, run_id = _runs(keys)
        tt = t["t"].to_numpy()
        d = t["d"].to_numpy()
        conc = np.cumsum(d)
        # reset the running sum at run starts: subtract each run's
        # preceding prefix (d sums to 0 within a complete run, so the
        # offset is exactly the cumsum at the previous run's end)
        offs = np.concatenate([[0], conc[starts[1:] - 1]])
        conc = conc - offs[run_id]
        mx = np.maximum.reduceat(conc, starts)
        gap = np.empty_like(tt)
        gap[:-1] = tt[1:] - tt[:-1]
        gap[-1] = 0
        # last row of each run contributes no gap
        last = np.zeros(len(tt), dtype=bool)
        last[starts[1:] - 1] = True
        last[-1] = True
        busy_term = np.where((conc > 0) & ~last, gap, 0)
        busy = np.add.reduceat(busy_term, starts)
        # reduceat on a single-element slice returns the element; busy
        # terms are already 0 on run-last rows so sums are correct
        return pa.table({
            key_col: keys.take(pa.array(starts)),
            out_max: pa.array(mx, type=pa.int64()),
            out_busy: pa.array(busy, type=pa.int64()),
        })

    emitted = ds.map_batches(_emit, batch_format="pyarrow")
    return partition_map(emitted, key_col, _fn,
                         sort_by=[key_col, "t", "d"])


def cohort_retention(ds, key_col: str, ts_col: str, *,
                     bucket_us: int = 7 * 24 * 3600 * 1_000_000,
                     epoch_origin_us: int = 0) -> "object":
    """Cohort retention counts: assign each entity to the bucket of
    its FIRST activity (its cohort) and count, for every later bucket
    offset, how many of that cohort were active — the standard
    product-analytics retention triangle, as (cohort_bucket,
    bucket_offset, n_active) rows.

    Shape: one narrow distinct-(key, bucket) pass (per-batch dedup so
    the exchange carries at most one row per entity per bucket), ONE
    hash exchange on the key, a vectorized per-run (min-bucket →
    offsets) pass emitting distinct (cohort, offset) pairs per
    entity, then a tiny count aggregate — output cardinality is
    O(#buckets²), never entities."""
    from .partition import partition_map

    def _distinct(t: pa.Table) -> pa.Table:
        ts = t[ts_col].to_numpy(zero_copy_only=False)
        if np.issubdtype(ts.dtype, np.datetime64):
            ts = ts.astype("datetime64[us]").view("i8")
        else:
            ts = ts.astype(np.int64)
        b = (ts - epoch_origin_us) // bucket_us
        out = pa.table({key_col: t[key_col],
                        "bucket": pa.array(b, type=pa.int64())})
        return out.group_by([key_col, "bucket"]).aggregate([])

    def _fn(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({"cohort": pa.array([], type=pa.int64()),
                             "offset": pa.array([], type=pa.int64())})
        keys = t[key_col].combine_chunks()
        starts, run_id = _runs(keys)
        b = t["bucket"].to_numpy()
        # the per-batch dedup is only batch-local — collapse the
        # sorted (key, bucket) runs to one row each here
        first = np.ones(len(b), dtype=bool)
        first[1:] = (b[1:] != b[:-1]) | (run_id[1:] != run_id[:-1])
        # sorted by (key, bucket): run first row IS the cohort bucket
        cohort = b[starts][run_id]
        return pa.table({
            "cohort": pa.array(cohort[first], type=pa.int64()),
            "offset": pa.array((b - cohort)[first], type=pa.int64()),
        })

    pairs = partition_map(
        ds.map_batches(_distinct, batch_format="pyarrow"),
        key_col, _fn, sort_by=[key_col, "bucket"])
    batches = list(pairs.iter_batches(batch_format="pyarrow",
                                      batch_size=None))
    if not batches:
        return pa.table({"cohort": pa.array([], type=pa.int64()),
                         "offset": pa.array([], type=pa.int64()),
                         "n_active": pa.array([], type=pa.int64())})
    merged = pa.concat_tables(batches)
    return (merged.group_by(["cohort", "offset"])
            .aggregate([([], "count_all")])
            .rename_columns(["cohort", "offset", "n_active"])
            .sort_by([("cohort", "ascending"), ("offset", "ascending")]))


def group_autocorr(ds, key_col: str, order_by: str, col: str, *,
                   lag: int = 1, tiebreak: str,
                   out_col: str | None = None,
                   round_to: int | None = 9):
    """Per-key lag-``k`` autocorrelation of an ordered series —
    sample Pearson r between ``x_t`` and ``x_{t+lag}`` within each
    key, ordered by (order_by, tiebreak).  The standard
    burstiness / persistence feature for event streams (the SQL rule
    is ``corr(value, lead(value, lag) OVER ...)``).

    ONE co-locating hash exchange, then a vectorized per-run pass:
    the shifted pairing plus six ``np.bincount`` segment sums — no
    per-key Python loop.  Keys with fewer than ``lag+2`` points or a
    zero-variance side get NULL (the SQL ``corr`` rule)."""
    from .partition import partition_map

    out_col = out_col or f"autocorr_{col}"

    def _fn(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({key_col: t[key_col],
                             out_col: pa.array([], type=pa.float64())})
        keys = t[key_col].combine_chunks()
        starts, run_id = _runs(keys)
        x = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        nruns = len(starts)
        a = x[:-lag] if lag else x
        b = x[lag:] if lag else x
        rid = run_id[:-lag] if lag else run_id
        valid = (run_id[:-lag] == run_id[lag:]) if lag else \
            np.ones(len(x), dtype=bool)
        rv = rid[valid]
        av = a[valid]
        bv = b[valid]
        n = np.bincount(rv, minlength=nruns).astype(np.float64)
        sa = np.bincount(rv, weights=av, minlength=nruns)
        sb = np.bincount(rv, weights=bv, minlength=nruns)
        saa = np.bincount(rv, weights=av * av, minlength=nruns)
        sbb = np.bincount(rv, weights=bv * bv, minlength=nruns)
        sab = np.bincount(rv, weights=av * bv, minlength=nruns)
        with np.errstate(invalid="ignore", divide="ignore"):
            va = saa - sa * sa / np.where(n > 0, n, 1)
            vb = sbb - sb * sb / np.where(n > 0, n, 1)
            cov = sab - sa * sb / np.where(n > 0, n, 1)
            r = cov / np.sqrt(va * vb)
        ok = (n >= 2) & (va > 0) & (vb > 0)
        if round_to is not None:
            r = np.round(r, round_to)
        return pa.table({
            key_col: keys.take(pa.array(starts)),
            out_col: pa.array(np.where(ok, r, np.nan),
                              type=pa.float64(), from_pandas=True),
        })

    return partition_map(ds, key_col, _fn,
                         sort_by=[key_col, order_by, tiebreak])


def temporal_pairs(ds, key_col: str, ts_col: str, type_col: str, *,
                   window_us: int, tiebreak: str,
                   max_pairs_per_partition: int = 50_000_000
                   ) -> pa.Table:
    """Global (type_a, type_b, n) counts of DIRECTED event pairs where
    b follows a within ``window_us`` microseconds in the same key's
    stream — temporal co-occurrence mining (the windowed
    generalization of :func:`transition_counts`, which only counts
    ADJACENT pairs; this is the "episode mining" count of Mannila et
    al., KDD 1997).  Pair order is (ts, tiebreak): a pair (i, j) is
    counted when i precedes j in that order AND ``ts_j − ts_i <=
    window_us`` (ties at the same timestamp are ordered — and counted
    one way — by the tiebreak, the rule the SQL oracle states).

    Scale shape: ONE hash exchange co-locates each key's rows sorted
    by (key, ts, tiebreak); inside a partition the follower range per
    row comes from ONE run-clamped ``np.searchsorted`` over the int64
    timestamps, the pair expansion is the repeat/arange kernel
    (cooccurrence shape), and the partial is a ≤ |types|² bincount —
    the exchange output is bounded by type cardinality, never rows.
    A partition whose pair expansion would exceed
    ``max_pairs_per_partition`` raises (loud-fail quadratic guard:
    window × rate decides the blowup, same contract as the
    n-gram-Jaccard family)."""
    from .partition import partition_map

    empty = pa.table({"type_a": pa.array([], type=pa.string()),
                      "type_b": pa.array([], type=pa.string()),
                      "n": pa.array([], type=pa.int64())})

    def _fn(t: pa.Table) -> pa.Table:
        if t.num_rows < 2:
            return empty
        keys = t[key_col].combine_chunks()
        starts, run_id = _runs(keys)
        ts = t[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        x = ts.to_numpy(zero_copy_only=False).astype(np.int64)
        enc = pc.dictionary_encode(t[type_col].combine_chunks())
        codes = enc.indices.to_numpy().astype(np.int64)
        k = len(enc.dictionary)
        # follower range per row: (i, hi_i) with ts <= ts_i + window
        # WITHIN the row's own run — timestamps are sorted per run but
        # reset across runs, so this must be the segmented kernel
        # (windows._seg_searchsorted, one 2n lexsort), not a flat
        # np.searchsorted over the whole partition.
        from netml_ray.windows import _seg_searchsorted
        hi = starts[run_id] + _seg_searchsorted(
            run_id, x, x + window_us, "right")
        cnt_i = hi - np.arange(len(x)) - 1
        total = int(cnt_i.sum())
        if total > max_pairs_per_partition:
            raise ValueError(
                f"temporal_pairs: pair expansion {total} exceeds "
                f"max_pairs_per_partition={max_pairs_per_partition}; "
                "shrink window_us or raise the cap")
        if total == 0:
            return empty
        i_row = np.repeat(np.arange(len(x)), cnt_i)
        j_off = np.arange(total) - np.repeat(
            np.r_[0, np.cumsum(cnt_i)[:-1]], cnt_i)
        a = codes[i_row]
        b = codes[i_row + 1 + j_off]
        cnt = np.bincount(a * k + b, minlength=k * k)
        nz = np.flatnonzero(cnt)
        return pa.table({
            "type_a": enc.dictionary.take(pa.array(nz // k)),
            "type_b": enc.dictionary.take(pa.array(nz % k)),
            "n": pa.array(cnt[nz], type=pa.int64()),
        })

    partials = partition_map(ds.select_columns(
        [key_col, ts_col, type_col, tiebreak]), key_col, _fn,
        sort_by=[key_col, ts_col, tiebreak])
    batches = list(partials.iter_batches(batch_format="pyarrow",
                                         batch_size=None))
    if not batches:
        return empty
    merged = pa.concat_tables(
        [pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch)
         else b for b in batches])
    if not merged.num_rows:
        return empty
    return (merged.group_by(["type_a", "type_b"])
            .aggregate([("n", "sum")])
            .rename_columns(["type_a", "type_b", "n"])
            .sort_by([("type_a", "ascending"),
                      ("type_b", "ascending")]))


def active_users(ds, key_col: str, ts_col: str, *,
                 window_days: int = 7) -> pa.Table:
    """Rolling active-user counts (WAU-style): for every day d, the
    number of DISTINCT keys with at least one event in the
    ``window_days``-day window ending at d (days = floor(epoch_us /
    86400e6); window inclusive of both ends) — the engagement metric
    every product pipeline computes, and a classic hard case for
    naive distribution because it is a distinct count over a SLIDING
    range.

    Scale shape: the trick is that each key contributes to a UNION OF
    INTERVALS of days — [d, d+w−1] for each active day d, merged when
    gaps are < w — so ONE keyed hash exchange (distinct active days
    per key, merged intervals, all run-segmented numpy) emits ±1
    difference-array partials keyed by day, and the driver folds
    O(days) ints and takes one cumulative sum.  No day×key blowup, no
    per-day distinct pass.  Days with zero coverage are omitted (the
    SQL states ``HAVING count > 0``)."""
    from .partition import partition_map

    w = int(window_days)

    def _fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"day": pa.array([], pa.int64()),
                          "delta": pa.array([], pa.int64())})
        if not t.num_rows:
            return empty
        keys = t[key_col].combine_chunks()
        _, run_id = _runs(keys)
        ts = t[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        day = ts.to_numpy(zero_copy_only=False) // (86400 * 10**6)
        # distinct (run, day), sorted
        order = np.lexsort((day, run_id))
        rs, dys = run_id[order], day[order]
        keep = np.r_[True, (rs[1:] != rs[:-1]) | (dys[1:] != dys[:-1])]
        rs, dys = rs[keep], dys[keep]
        # interval starts: first day of a run, or a gap >= w
        new_iv = np.r_[True, (rs[1:] != rs[:-1])
                       | (dys[1:] - dys[:-1] >= w)]
        iv_id = np.cumsum(new_iv) - 1
        iv_start = dys[new_iv]
        iv_last = np.maximum.reduceat(dys, np.flatnonzero(new_iv))
        del iv_id
        starts = iv_start
        ends = iv_last + w          # exclusive end of coverage
        days = np.r_[starts, ends]
        deltas = np.r_[np.ones(len(starts), np.int64),
                       -np.ones(len(ends), np.int64)]
        # pre-fold per partition: sum deltas per day
        ud, inv = np.unique(days, return_inverse=True)
        dl = np.bincount(inv, weights=deltas).astype(np.int64)
        nz = dl != 0
        return pa.table({"day": pa.array(ud[nz]),
                         "delta": pa.array(dl[nz])})

    partials = partition_map(ds.select_columns([key_col, ts_col]),
                             key_col, _fn, sort_by=[key_col])
    agg: dict[int, int] = {}
    for bt in partials.iter_batches(batch_size=None,
                                    batch_format="pyarrow"):
        for dday, dv in zip(bt["day"].to_numpy(), bt["delta"].to_numpy()):
            agg[int(dday)] = agg.get(int(dday), 0) + int(dv)
    if not agg:
        return pa.table({"day": pa.array([], pa.int64()),
                         "wau": pa.array([], pa.int64())})
    dd = np.array(sorted(agg), dtype=np.int64)
    dv = np.array([agg[k] for k in dd], dtype=np.int64)
    lo, hi = int(dd.min()), int(dd.max())
    diff = np.zeros(hi - lo + 1, np.int64)
    diff[dd - lo] = dv
    wau = np.cumsum(diff)
    days_out = np.arange(lo, hi + 1, dtype=np.int64)
    nz = wau > 0
    return pa.table({"day": pa.array(days_out[nz]),
                     "wau": pa.array(wau[nz])})


def streaks(ds, key_col: str, ts_col: str, *,
            day_us: int = 86_400 * 10**6):
    """Per-key activity streaks (the gaps-and-islands classic): for
    every key, the number of DISTINCT active days and the LONGEST run
    of consecutive days with at least one event — the engagement /
    habit feature next to :func:`active_users`.  Days are
    ``floor(epoch_us / 86400e6)`` (== ``CAST(ts AS DATE)`` for
    post-epoch timestamps, which is all this engine's corpora carry).

    Scale shape: ONE keyed hash exchange (``partition_map`` sorted by
    (key, ts)); inside a partition everything is run-segmented numpy —
    distinct (key, day) via a first-occurrence mask on the already
    sorted pairs, streak boundaries via ``day[1:] - day[:-1] != 1``,
    per-key longest via ``np.maximum.reduceat`` over streak lengths.
    Output is one row per key (tiny), never per day."""
    from .partition import partition_map

    def _fn(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({key_col: t[key_col],
                             "n_active_days": pa.array([], pa.int64()),
                             "longest_streak": pa.array([], pa.int64())})
        keys = t[key_col].combine_chunks()
        starts, run_id = _runs(keys)
        ts = t[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        day = ts.to_numpy(zero_copy_only=False) // day_us
        # distinct (key, day): rows are sorted by (key, ts) so days are
        # nondecreasing within a run — first occurrence == day change
        keep = np.r_[True, (run_id[1:] != run_id[:-1])
                     | (day[1:] != day[:-1])]
        rs, dys = run_id[keep], day[keep]
        # streak boundary: key change or a calendar gap
        new_st = np.r_[True, (rs[1:] != rs[:-1])
                       | (dys[1:] - dys[:-1] != 1)]
        st_idx = np.flatnonzero(new_st)
        st_len = np.diff(np.r_[st_idx, len(rs)])
        st_key = rs[new_st]                      # run id per streak
        key_first = np.r_[True, st_key[1:] != st_key[:-1]]
        longest = np.maximum.reduceat(st_len, np.flatnonzero(key_first))
        n_days = np.bincount(rs, minlength=len(starts))
        return pa.table({
            key_col: keys.take(pa.array(starts)),
            "n_active_days": pa.array(n_days.astype(np.int64)),
            "longest_streak": pa.array(longest.astype(np.int64)),
        })

    return partition_map(ds.select_columns([key_col, ts_col]),
                         key_col, _fn, sort_by=[key_col, ts_col])


def scd2_intervals(ds, key_col: str, ts_col: str, type_col: str, *,
                   tiebreak: str):
    """Slowly-changing-dimension (type 2) snapshot build: collapse each
    key's time-ordered event stream into VALIDITY INTERVALS — one row
    per maximal run of the same ``type_col`` value, carrying
    ``valid_from`` (first ts of the run), ``valid_to`` (first ts of
    the key's NEXT run, typed NULL on the key's last run — the open
    current record) and ``n_rows``.  This is the feature-store /
    warehouse "dimension history" primitive (the SQL rn − rnt
    gaps-and-islands idiom, stated verbatim by the oracle).

    Scale shape: ONE keyed hash exchange; run boundaries via
    dictionary-code shifts, ``valid_from`` by direct take at run
    starts, ``valid_to`` by shifting run starts within the key — all
    vectorized, output cardinality = number of value changes."""
    from .partition import partition_map

    def _fn(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({
                key_col: t[key_col],
                type_col: t[type_col],
                "valid_from": pa.array([], pa.timestamp("us")),
                "valid_to": pa.array([], pa.timestamp("us")),
                "n_rows": pa.array([], pa.int64())})
        keys = t[key_col].combine_chunks()
        _, run_id = _runs(keys)
        enc = pc.dictionary_encode(t[type_col].combine_chunks())
        codes = enc.indices.to_numpy().astype(np.int64)
        ts_us = t[ts_col].cast(pa.int64()).to_numpy()
        new_iv = np.r_[True, (run_id[1:] != run_id[:-1])
                       | (codes[1:] != codes[:-1])]
        iv_idx = np.flatnonzero(new_iv)
        n_rows = np.diff(np.r_[iv_idx, t.num_rows])
        valid_from = ts_us[iv_idx]
        iv_key = run_id[iv_idx]
        # valid_to = next interval's valid_from when it is the SAME key
        nxt_from = np.r_[valid_from[1:], 0]
        same_key = np.r_[iv_key[1:] == iv_key[:-1], False]
        return pa.table({
            key_col: keys.take(pa.array(iv_idx)),
            type_col: enc.dictionary.take(
                pa.array(codes[iv_idx])),
            "valid_from": pa.array(valid_from, type=pa.timestamp("us")),
            "valid_to": pa.array(nxt_from, type=pa.timestamp("us"),
                                 mask=~same_key),
            "n_rows": pa.array(n_rows.astype(np.int64)),
        })

    return partition_map(ds, key_col, _fn,
                         sort_by=[key_col, ts_col, tiebreak])


def time_weighted_avg(ds, key_col: str, ts_col: str, val_col: str, *,
                      tiebreak: str, round_to: int | None = 9):
    """Duration-weighted mean per key: each row's value is HELD until
    the key's next event, so the average weights each value by its
    holding time — ``sum(v·Δt) / sum(Δt)`` over the lead deltas, the
    feature-store aggregate for state-like signals (price, score,
    level) where arithmetic means over-count bursts.  Keys with a
    single event (no holding interval) emit no row; a key whose
    events all share one timestamp emits a typed NULL (0/0 — the SQL
    states ``NULLIF``).  ``n_seg`` = number of holding intervals.

    Scale shape: ONE keyed hash exchange; inside a partition the lead
    delta is a shifted subtraction and the per-key sums are
    ``np.add.reduceat`` — output is one row per key."""
    from .partition import partition_map

    def _fn(t: pa.Table) -> pa.Table:
        empty = pa.table({key_col: t[key_col].slice(0, 0),
                          "twa": pa.array([], pa.float64()),
                          "n_seg": pa.array([], pa.int64())})
        if t.num_rows < 2:
            return empty
        keys = t[key_col].combine_chunks()
        starts, run_id = _runs(keys)
        ts_us = t[ts_col].cast(pa.int64()).to_numpy()
        v = t[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        n = t.num_rows
        # holding interval i -> i+1, valid when same key
        dur = (ts_us[1:] - ts_us[:-1]).astype(np.float64)
        same = run_id[1:] == run_id[:-1]
        dur = np.where(same, dur, 0.0)
        num = np.where(same, v[:-1] * dur, 0.0)
        seg = same.astype(np.int64)
        # reduceat over the n-1 interval rows at each run's first row;
        # cross-run interval terms are zeroed above, so including a
        # run's trailing cross-interval in its segment is harmless
        rstarts = np.minimum(starts, n - 2)
        num_k = np.add.reduceat(num, rstarts)
        dur_k = np.add.reduceat(dur, rstarts)
        seg_k = np.add.reduceat(seg, rstarts)
        # reduceat duplicates the segment when two starts collide
        # (adjacent single-row runs at the tail) — recompute exactly
        # for the rare collision case via bincount instead
        if len(np.unique(rstarts)) != len(rstarts):
            num_k = np.bincount(run_id[:-1], weights=num,
                                minlength=len(starts))
            dur_k = np.bincount(run_id[:-1], weights=dur,
                                minlength=len(starts))
            seg_k = np.bincount(run_id[:-1], weights=seg,
                                minlength=len(starts)).astype(np.int64)
        has = seg_k > 0
        twa = np.full(len(starts), np.nan)
        nz = has & (dur_k > 0)
        twa[nz] = num_k[nz] / dur_k[nz]
        if round_to is not None:
            twa = np.round(twa, round_to)
        out_keys = keys.take(pa.array(starts[has]))
        return pa.table({
            key_col: out_keys,
            "twa": pa.array(twa[has], mask=~nz[has]),
            "n_seg": pa.array(seg_k[has].astype(np.int64)),
        })

    return partition_map(ds.select_columns(
        [key_col, ts_col, val_col] + ([tiebreak] if tiebreak else [])),
        key_col, _fn, sort_by=[key_col, ts_col, tiebreak])


def debounce(ds, key_cols: list, ts_col: str, gap_us: int, *,
             tiebreak: str):
    """Stream debounce / rate-limit: keep a row iff it is the FIRST of
    its composite key or at least ``gap_us`` after the key's
    IMMEDIATELY PRECEDING event (kept or not) in (ts, tiebreak) order
    — the lag-based burst suppressor (``lag IS NULL OR ts − lag ≥
    gap``, stated verbatim by the SQL oracle).  Unlike greedy
    keep-anchored throttling, this rule is a pure shifted comparison,
    so it stays fully vectorized.

    ONE hash exchange on the FIRST key column; further key columns
    segment runs inside the partition (nested runs keep the fn
    run-segmented for the driver fast path)."""
    from .partition import partition_map

    k0, rest = key_cols[0], key_cols[1:]

    def _fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t
        same = np.ones(n - 1, dtype=bool) if n > 1 else \
            np.empty(0, dtype=bool)
        for kc in key_cols:
            col = t[kc]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            same &= np.asarray(pc.equal(
                col.slice(1, n - 1), col.slice(0, n - 1)).to_numpy(
                zero_copy_only=False), dtype=bool)
        ts_us = t[ts_col].cast(pa.int64()).to_numpy()
        close = same & (ts_us[1:] - ts_us[:-1] < gap_us)
        keep = np.r_[True, ~close]
        return t.filter(pa.array(keep))

    return partition_map(ds, k0, _fn,
                         sort_by=[k0] + rest + [ts_col, tiebreak])


def event_paths(ds, key_col: str, ts_col: str, type_col: str, *,
                tiebreak: str, max_len: int | None = None,
                sep: str = ">", out_col: str = "path"):
    """Per-key journey string: the ``sep``-joined sequence of
    ``type_col`` values in (ts, tiebreak) order (optionally capped to
    the FIRST ``max_len`` events — the scale hygiene bound, stated as
    a row_number filter by the SQL oracle), plus the joined count —
    the product-analytics "user path" table feeding funnel mining.

    ONE keyed exchange; inside a partition the paths materialize with
    ZERO per-row Python: run starts become ListArray offsets over the
    (possibly capped) type column and one ``pc.binary_join`` emits
    every key's string."""
    from .partition import partition_map

    def _fn(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({key_col: t[key_col],
                             out_col: pa.array([], pa.string()),
                             "n_events": pa.array([], pa.int64())})
        keys = t[key_col].combine_chunks()
        starts, run_id = _runs(keys)
        types = t[type_col].combine_chunks()
        if max_len is not None:
            rank = np.arange(t.num_rows, dtype=np.int64) - np.repeat(
                starts, np.diff(np.r_[starts, t.num_rows]))
            keep = rank < max_len
            types = types.filter(pa.array(keep))
            capped = np.minimum(np.diff(np.r_[starts, t.num_rows]),
                                max_len)
            offsets = np.r_[0, np.cumsum(capped)]
        else:
            offsets = np.r_[starts, t.num_rows]
        la = pa.ListArray.from_arrays(
            pa.array(offsets.astype(np.int32)), types)
        path = pc.binary_join(la, sep)
        n = np.diff(offsets)
        return pa.table({key_col: keys.take(pa.array(starts)),
                         out_col: path,
                         "n_events": pa.array(n.astype(np.int64))})

    return partition_map(ds, key_col, _fn,
                         sort_by=[key_col, ts_col, tiebreak])


def trigram_counts(ds, key_col: str, ts_col: str, type_col: str, *,
                   tiebreak: str) -> pa.Table:
    """Global (t1, t2, t3) counts of three ADJACENT events per key —
    the order-3 extension of :func:`transition_counts`, same
    combined-code bincount shape (≤ |types|³ partial rows per
    partition, run boundaries masked on both shifts)."""
    from .partition import partition_map

    def _fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"t1": pa.array([], pa.string()),
                          "t2": pa.array([], pa.string()),
                          "t3": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if t.num_rows < 3:
            return empty
        keys = t[key_col].combine_chunks()
        _, run_id = _runs(keys)
        enc = pc.dictionary_encode(t[type_col].combine_chunks())
        codes = enc.indices.to_numpy().astype(np.int64)
        k = len(enc.dictionary)
        a, b, c = codes[:-2], codes[1:-1], codes[2:]
        same = (run_id[:-2] == run_id[1:-1]) & \
               (run_id[1:-1] == run_id[2:])
        if not same.any():
            return empty
        comb = (a[same] * k + b[same]) * k + c[same]
        cnt = np.bincount(comb, minlength=k * k * k)
        nz = np.flatnonzero(cnt)
        return pa.table({
            "t1": enc.dictionary.take(pa.array(nz // (k * k))),
            "t2": enc.dictionary.take(pa.array((nz // k) % k)),
            "t3": enc.dictionary.take(pa.array(nz % k)),
            "n": pa.array(cnt[nz], type=pa.int64()),
        })

    partials = partition_map(ds, key_col, _fn,
                             sort_by=[key_col, ts_col, tiebreak])
    batches = list(partials.iter_batches(batch_format="pyarrow",
                                         batch_size=None))
    empty = pa.table({"t1": pa.array([], pa.string()),
                      "t2": pa.array([], pa.string()),
                      "t3": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})
    if not batches:
        return empty
    merged = pa.concat_tables(
        [pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch)
         else b for b in batches])
    if not merged.num_rows:
        return empty
    return (merged.group_by(["t1", "t2", "t3"])
            .aggregate([("n", "sum")])
            .rename_columns(["t1", "t2", "t3", "n"])
            .sort_by([("t1", "ascending"), ("t2", "ascending"),
                      ("t3", "ascending")]))


def new_returning(ds, key_col: str, ts_col: str, *,
                  day_us: int = 86_400 * 10**6):
    """Daily NEW vs RETURNING active entities: for each calendar day
    (``floor(epoch_us / 86400e6)``), how many distinct keys were
    active for the FIRST time ever vs active again — the growth-
    accounting split every engagement dashboard leads with.

    Scale shape: per-batch distinct (key, day) Arrow group-by partials
    (the exchange carries distinct pairs, never the event stream),
    ONE key-hash exchange (``partition_map`` sorted by (key, day) —
    run-segmented: a key's first day is its run's first distinct
    day), per-partition (day, is_new, n) count partials, driver folds
    O(days) rows.  Output: (day, new_users, returning_users)."""
    from .partition import partition_map

    def _distinct(t: pa.Table) -> pa.Table:
        ts = t[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        day = pc.divide(ts, day_us)
        return pa.table({key_col: t[key_col], "day": day}) \
            .group_by([key_col, "day"]).aggregate([])

    pairs = ds.select_columns([key_col, ts_col]) \
        .map_batches(_distinct, batch_size=None, batch_format="pyarrow")

    def _fn(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({"day": pa.array([], pa.int64()),
                             "is_new": pa.array([], pa.bool_()),
                             "n": pa.array([], pa.int64())})
        keys = t[key_col].combine_chunks()
        _, run_id = _runs(keys)
        day = t["day"].to_numpy(zero_copy_only=False).astype(np.int64)
        # distinct (key, day) again: partials from different batches
        # may repeat a pair; rows are sorted by (key, day)
        keep = np.r_[True, (run_id[1:] != run_id[:-1])
                     | (day[1:] != day[:-1])]
        rs, dys = run_id[keep], day[keep]
        is_new = np.r_[True, rs[1:] != rs[:-1]]
        code = dys * 2 + is_new
        uc, n = np.unique(code, return_counts=True)
        return pa.table({"day": pa.array(uc // 2),
                         "is_new": pa.array((uc % 2).astype(bool)),
                         "n": pa.array(n.astype(np.int64))})

    parts = pa.concat_tables(
        partition_map(pairs, key_col, _fn, sort_by=[key_col, "day"])
        .iter_batches(batch_size=None, batch_format="pyarrow"),
        promote_options="none")
    agg = parts.group_by(["day", "is_new"]).aggregate([("n", "sum")]) \
        .sort_by([("day", "ascending"), ("is_new", "ascending")])
    day = agg["day"].to_numpy(zero_copy_only=False).astype(np.int64)
    isn = agg["is_new"].to_numpy(zero_copy_only=False).astype(bool)
    n = agg["n_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
    days = np.unique(day)
    new_n = np.zeros(len(days), dtype=np.int64)
    ret_n = np.zeros(len(days), dtype=np.int64)
    idx = np.searchsorted(days, day)
    np.add.at(new_n, idx[isn], n[isn])
    np.add.at(ret_n, idx[~isn], n[~isn])
    return pa.table({"day": pa.array(days),
                     "new_users": pa.array(new_n),
                     "returning_users": pa.array(ret_n)})


def markov_accuracy(ds, key_col: str, ts_col: str, type_col: str, *,
                    tiebreak: str, round_to: int = 9) -> pa.Table:
    """Markov next-event predictability: fit the order-1 chain on the
    corpus (``transition_counts``) and score it in-sample — for each
    from-type, the predicted next type (argmax transition count, tie →
    lexicographically smallest, rule stated in SQL), the transition
    total, hits (= the argmax count) and accuracy.  The "how
    predictable is user behavior" feature that decides whether a
    sequence model is worth training.

    Scale shape: everything distributed rides transition_counts' ONE
    keyed exchange + |types|²-bounded partials; this adds O(|types|²)
    driver math only."""
    tc = transition_counts(ds, key_col, ts_col, type_col,
                           tiebreak=tiebreak)
    if isinstance(tc, pa.Table):
        t = tc
    else:
        t = pa.concat_tables(tc.iter_batches(batch_size=None,
                                             batch_format="pyarrow"),
                             promote_options="none")
    t = t.sort_by([("from_type", "ascending"),
                   ("n", "descending"), ("to_type", "ascending")])
    f = t["from_type"].combine_chunks()
    m = t.num_rows
    first = np.ones(m, dtype=bool)
    if m > 1:
        first[1:] = np.asarray(pc.not_equal(
            f.slice(1, m - 1), f.slice(0, m - 1)).to_numpy(
            zero_copy_only=False), dtype=bool)
    s = np.flatnonzero(first)
    n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    # rows sorted (from, n DESC, to ASC): the run head IS the
    # prediction — max count, smallest to_type on ties
    tot = np.add.reduceat(n, s)
    best = n[s]
    return pa.table({
        "from_type": f.take(pa.array(s)),
        "predicted": t["to_type"].take(pa.array(s)),
        "n_transitions": pa.array(tot),
        "n_correct": pa.array(best),
        "accuracy": pa.array(np.round(best / (1.0 * tot), round_to))})


def funnel_rates(ds, key_col: str, ts_col: str, type_col: str,
                 stages: list[str], *, tiebreak: str,
                 round_to: int = 9) -> pa.Table:
    """Stage-to-stage funnel conversion table: on top of
    :func:`funnel_stages` (strict-order min-ts semantics), for each
    stage i — the number of keys reaching it (stages_completed ≥ i)
    and the conversion rate vs the previous stage (stage 1 converts
    from the full key population; an empty previous stage emits a
    typed NULL, rule stated in SQL).  The drop-off report product
    analytics reads daily.

    Scale shape: funnel_stages' ONE keyed exchange, then a ≤(K+1)-int
    bincount partial per output batch and O(K) driver math."""
    per_key = funnel_stages(ds, key_col, ts_col, type_col, stages,
                            tiebreak=tiebreak)
    k = len(stages)

    def _p(t: pa.Table) -> pa.Table:
        sc = t["stages_completed"].to_numpy(zero_copy_only=False)
        cnt = np.bincount(sc, minlength=k + 1)
        return pa.table({"sc": pa.array(np.arange(k + 1,
                                                  dtype=np.int64)),
                         "n": pa.array(cnt.astype(np.int64))})

    tot = np.zeros(k + 1, dtype=np.int64)
    for bt in per_key.map_batches(_p, batch_size=None,
                                  batch_format="pyarrow") \
                     .iter_batches(batch_size=None,
                                   batch_format="pyarrow"):
        np.add.at(tot, bt["sc"].to_numpy(), bt["n"].to_numpy())
    n_ge = np.cumsum(tot[::-1])[::-1]        # n_ge[i] = keys with sc>=i
    stage = np.arange(1, k + 1, dtype=np.int64)
    reached = n_ge[1:]
    prev = n_ge[:-1]
    conv = np.zeros(k, dtype=np.float64)
    mask = prev == 0
    conv[~mask] = np.round(reached[~mask] / (1.0 * prev[~mask]),
                           round_to)
    return pa.table({
        "stage": pa.array(stage),
        "stage_name": pa.array(list(stages)),
        "n_reached": pa.array(reached),
        "conversion": pa.array(conv, mask=mask)})


def event_gaps(ds, key_col: str, ts_col: str, *, type_col=None,
               event_type=None, tiebreak: str) -> pa.Table:
    """Per-key inter-event gap profile, optionally restricted to ONE
    event type (the repurchase-cadence feature: median days between
    purchases drives every retention model).  Emits (key, n_events,
    median_gap_us, max_gap_us) for keys with ≥ 2 qualifying events
    (rule stated in SQL); the median is the LOWER-median ELEMENT of
    the int64 microsecond gaps — both engines return the identical
    integer, no float hedge needed (the theil_sen pick precedent).

    Scale shape: optional narrow type filter, then ONE keyed hash
    exchange sorted by (key, ts, tiebreak); per partition gaps are one
    shifted subtraction, per-run medians one (run, gap) lexsort +
    index pick, maxima one reduceat."""
    from .partition import partition_map

    if type_col is not None:
        ds = ds.filter(expr=f"{type_col} == '{event_type}'")
    cols = [key_col, ts_col, tiebreak]
    ds = ds.select_columns(cols)

    def _fn(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({
                key_col: t[key_col],
                "n_events": pa.array([], pa.int64()),
                "median_gap_us": pa.array([], pa.int64()),
                "max_gap_us": pa.array([], pa.int64())})
        keys = t[key_col].combine_chunks()
        starts, run_id = _runs(keys)
        ts = t[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        us = ts.to_numpy(zero_copy_only=False).astype(np.int64)
        gap = us[1:] - us[:-1]
        in_run = run_id[1:] == run_id[:-1]
        g = gap[in_run]
        gr = run_id[1:][in_run]
        if not len(g):
            return pa.table({
                key_col: keys.slice(0, 0),
                "n_events": pa.array([], pa.int64()),
                "median_gap_us": pa.array([], pa.int64()),
                "max_gap_us": pa.array([], pa.int64())})
        order = np.lexsort((g, gr))
        g, gr = g[order], gr[order]
        rs = np.flatnonzero(np.r_[True, gr[1:] != gr[:-1]])
        cnt = np.diff(np.r_[rs, len(gr)])
        med = g[rs + (cnt - 1) // 2]
        mx = np.maximum.reduceat(g, rs)
        return pa.table({
            key_col: keys.take(pa.array(starts[gr[rs]])),
            "n_events": pa.array((cnt + 1).astype(np.int64)),
            "median_gap_us": pa.array(med),
            "max_gap_us": pa.array(mx)})

    return partition_map(ds, key_col, _fn,
                         sort_by=[key_col, ts_col, tiebreak])


def session_conversion(ds, key_col: str, ts_col: str, type_col: str,
                       *, gap_s: float, convert_type: str,
                       tiebreak: str) -> "object":
    """Per-key session conversion: sessionize by the timeout rule
    (new session when the float-epoch-second gap to the previous
    event exceeds ``gap_s`` — the SQL ``epoch(ts) - lag(...) > gap``
    cut, identical to the sessionize oracle) and report how many
    sessions contain at least one ``convert_type`` event.  Emits
    (key, n_sessions, n_converted, conversion); the rate is one exact
    small-int division — identical on both engines, no hedge.

    Scale shape: ONE keyed hash exchange sorted by (key, ts,
    tiebreak); cuts by shifted subtraction, per-session conversion by
    ``maximum.reduceat``, per-key counts by a second reduceat over
    session runs.  Run-segmented (cuts never cross keys)."""
    from .partition import partition_map

    def _fn(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({
                key_col: t[key_col],
                "n_sessions": pa.array([], pa.int64()),
                "n_converted": pa.array([], pa.int64()),
                "conversion": pa.array([], pa.float64())})
        keys = t[key_col].combine_chunks()
        starts, run_id = _runs(keys)
        ts = t[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        sec = ts.to_numpy(zero_copy_only=False) / 1e6
        m = t.num_rows
        new_sess = np.ones(m, dtype=bool)
        if m > 1:
            new_sess[1:] = (run_id[1:] != run_id[:-1]) \
                | (sec[1:] - sec[:-1] > gap_s)
        s_idx = np.flatnonzero(new_sess)
        conv_row = np.asarray(
            pc.equal(t[type_col], convert_type).to_numpy(
                zero_copy_only=False), dtype=np.int64)
        s_conv = np.maximum.reduceat(conv_row, s_idx)
        s_run = run_id[s_idx]
        kb = np.r_[True, s_run[1:] != s_run[:-1]]
        ks = np.flatnonzero(kb)
        n_sess = np.diff(np.r_[ks, len(s_run)]).astype(np.int64)
        n_conv = np.add.reduceat(s_conv, ks).astype(np.int64)
        return pa.table({
            key_col: keys.take(pa.array(starts)),
            "n_sessions": pa.array(n_sess),
            "n_converted": pa.array(n_conv),
            "conversion": pa.array(n_conv / (1.0 * n_sess))})

    cols = [key_col, ts_col, type_col, tiebreak]
    return partition_map(ds.select_columns(cols), key_col, _fn,
                         sort_by=[key_col, ts_col, tiebreak])


def dod_retention(ds, key_col: str, ts_col: str, *,
                  day_us: int = 86_400 * 10**6) -> pa.Table:
    """Day-over-day retention curve: for every calendar day, how many
    distinct keys were active AND active again the NEXT day — the
    next-day-stickiness headline beside :func:`new_returning`.  Every
    active day emits a row (the last day retains 0 by construction).

    Scale shape: distinct (key, day) partials, ONE key-hash exchange
    (consecutive-day detection is a shifted comparison within each
    key's sorted distinct days — run-segmented), per-partition
    (day, n_active, n_retained) partials, driver folds O(days); the
    rate is exact small-int division (no hedge)."""
    from .partition import partition_map

    def _distinct(t: pa.Table) -> pa.Table:
        ts = t[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        day = pc.divide(ts, day_us)
        return pa.table({key_col: t[key_col], "day": day}) \
            .group_by([key_col, "day"]).aggregate([])

    pairs = ds.select_columns([key_col, ts_col]) \
        .map_batches(_distinct, batch_size=None, batch_format="pyarrow")

    def _fn(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({"day": pa.array([], pa.int64()),
                             "n_active": pa.array([], pa.int64()),
                             "n_retained": pa.array([], pa.int64())})
        keys = t[key_col].combine_chunks()
        _, run_id = _runs(keys)
        day = t["day"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.r_[True, (run_id[1:] != run_id[:-1])
                     | (day[1:] != day[:-1])]
        rs, dys = run_id[keep], day[keep]
        ret = np.zeros(len(dys), dtype=bool)
        if len(dys) > 1:
            ret[:-1] = (rs[1:] == rs[:-1]) & (dys[1:] - dys[:-1] == 1)
        days = np.unique(dys)
        idx = np.searchsorted(days, dys)
        n_act = np.bincount(idx, minlength=len(days))
        n_ret = np.bincount(idx[ret], minlength=len(days))
        return pa.table({"day": pa.array(days),
                         "n_active": pa.array(n_act.astype(np.int64)),
                         "n_retained": pa.array(n_ret.astype(np.int64))})

    parts = pa.concat_tables(
        partition_map(pairs, key_col, _fn, sort_by=[key_col, "day"])
        .iter_batches(batch_size=None, batch_format="pyarrow"),
        promote_options="none")
    agg = parts.group_by(["day"]).aggregate([("n_active", "sum"),
                                             ("n_retained", "sum")]) \
        .sort_by([("day", "ascending")])
    na = agg["n_active_sum"].to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    nr = agg["n_retained_sum"].to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    return pa.table({"day": agg["day"],
                     "n_active": pa.array(na),
                     "n_retained": pa.array(nr),
                     "retention": pa.array(nr / (1.0 * na))})


def skipgram_pairs(ds, key_col: str, ts_col: str, type_col: str, *,
                   window: int = 2, tiebreak: str) -> pa.Table:
    """Global (center, context, n) skip-gram co-occurrence counts per
    key sequence ordered by (ts, tiebreak): every ordered pair at
    rank distance 1..``window`` within the same key, BOTH directions —
    the word2vec/item2vec training-pair builder
    (``transition_counts`` is the ``window=1``, one-direction case).

    Same scale shape as the transition matrix: ONE hash exchange
    co-locates each key's rows, each partition emits a ≤ |types|²
    count partial (one shifted-adjacency bincount per offset d, run
    boundaries masked), and the driver merges O(types²) rows — the
    reduce is bounded by type cardinality, never the rows."""
    from .partition import partition_map

    empty = pa.table({"center": pa.array([], type=pa.string()),
                      "context": pa.array([], type=pa.string()),
                      "n": pa.array([], type=pa.int64())})

    def _fn(t: pa.Table) -> pa.Table:
        if t.num_rows < 2:
            return empty
        keys = t[key_col].combine_chunks()
        _, run_id = _runs(keys)
        enc = pc.dictionary_encode(t[type_col].combine_chunks())
        codes = enc.indices.to_numpy().astype(np.int64)
        k = len(enc.dictionary)
        cnt = np.zeros(k * k, dtype=np.int64)
        for d in range(1, window + 1):
            if t.num_rows <= d:
                break
            a = codes[:-d]
            b = codes[d:]
            same = run_id[:-d] == run_id[d:]
            if not same.any():
                continue
            cnt += np.bincount(a[same] * k + b[same],
                               minlength=k * k)
            cnt += np.bincount(b[same] * k + a[same],
                               minlength=k * k)
        nz = np.flatnonzero(cnt)
        if not len(nz):
            return empty
        return pa.table({
            "center": enc.dictionary.take(pa.array(nz // k)),
            "context": enc.dictionary.take(pa.array(nz % k)),
            "n": pa.array(cnt[nz], type=pa.int64()),
        })

    partials = partition_map(ds, key_col, _fn,
                             sort_by=[key_col, ts_col, tiebreak])
    batches = list(partials.iter_batches(batch_format="pyarrow",
                                         batch_size=None))
    if not batches:
        return empty
    merged = pa.concat_tables(
        [pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch)
         else b for b in batches])
    return (merged.group_by(["center", "context"])
            .aggregate([("n", "sum")])
            .rename_columns(["center", "context", "n"])
            .sort_by([("center", "ascending"),
                      ("context", "ascending")]))


def out_of_order_stats(ds, key_col: str, ts_col: str, *,
                       arrival_col: str,
                       num_partitions: int | None = None):
    """Streaming watermark audit: per key, in ARRIVAL order
    (``arrival_col``), count events whose event time ``ts_col`` is
    behind the running maximum seen so far (late/out-of-order data)
    and the worst lateness in µs — the stats that size a streaming
    window's allowed-lateness at ingest time.

    Returns ``(key, n_events, n_late, max_lateness_us)`` per key.
    Shape: ONE hash exchange; inside each partition the per-run
    prefix max is a segmented Hillis–Steele doubling scan (log₂ n
    vectorized passes — no per-key Python, no overflow-prone offset
    composite), then reduceat folds per run."""
    from .partition import partition_map

    I64MIN = np.iinfo(np.int64).min

    def _fn(t: pa.Table) -> pa.Table:
        empty = pa.table({
            key_col: t[key_col].slice(0, 0),
            "n_events": pa.array([], pa.int64()),
            "n_late": pa.array([], pa.int64()),
            "max_lateness_us": pa.array([], pa.int64())})
        n = t.num_rows
        if n == 0:
            return empty
        keys = t[key_col].combine_chunks()
        starts, _ = _runs(keys)
        ts = t[ts_col].combine_chunks()
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        tsv = ts.to_numpy(zero_copy_only=False).astype(np.int64)
        new_key = np.zeros(n, dtype=bool)
        new_key[starts] = True
        key_start = np.maximum.accumulate(
            np.where(new_key, np.arange(n), 0))
        wm = tsv.copy()
        shift = 1
        while shift < n:
            ok = np.arange(shift, n) - shift >= key_start[shift:]
            np.maximum(wm[shift:],
                       np.where(ok, wm[:-shift], I64MIN),
                       out=wm[shift:])
            shift <<= 1
        wm_prev = np.r_[I64MIN, wm[:-1]]
        wm_prev[starts] = I64MIN
        late = tsv < wm_prev
        lateness = np.where(late, wm_prev - tsv, 0)
        return pa.table({
            key_col: keys.take(pa.array(starts)),
            "n_events": pa.array(
                np.diff(np.r_[starts, n]).astype(np.int64)),
            "n_late": pa.array(
                np.add.reduceat(late.astype(np.int64), starts)),
            "max_lateness_us": pa.array(
                np.maximum.reduceat(lateness, starts))})

    # ts as final tiebreak: duplicate arrival stamps would otherwise
    # make the "1 PRECEDING" watermark frame order-dependent on both
    # engines (observed on lineitem's duplicated line numbers)
    return partition_map(ds, key_col, _fn,
                         num_partitions=num_partitions,
                         sort_by=[key_col, arrival_col, ts_col])


def windowed_dedup(ds, key_col: str, type_col: str, ts_col: str, *,
                   window_us: int = 3_600_000_000,
                   tiebreak: str | None = None,
                   num_partitions: int | None = None):
    """Streaming ingestion dedup: keep only the FIRST event per
    ``(key, type, tumbling window)`` — the at-least-once → effectively-
    once cleanup every event pipeline runs at the front door (retries
    and replays land in the same window and collapse).

    ONE hash exchange on ``key``; inside a partition the composite
    run head test is three vectorized not_equal/int compares — rows
    sorted by (key, type, ts, tiebreak), window id = ts_µs //
    ``window_us`` so window groups are contiguous within each
    (key, type) run and no second exchange is needed."""
    from .partition import partition_map

    def _fn(t: pa.Table) -> pa.Table:
        if t.num_rows < 2:
            return t
        keys = t[key_col].combine_chunks()
        typ = t[type_col].combine_chunks()
        ts = t[ts_col].combine_chunks()
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        w = ts.to_numpy(zero_copy_only=False) // window_us
        new_key = np.r_[True, pc.not_equal(
            keys.slice(1), keys.slice(0, len(keys) - 1))
            .to_numpy(zero_copy_only=False)]
        new_typ = np.r_[True, pc.not_equal(
            typ.slice(1), typ.slice(0, len(typ) - 1))
            .to_numpy(zero_copy_only=False)]
        new_win = np.r_[True, w[1:] != w[:-1]]
        return t.filter(pa.array(new_key | new_typ | new_win))

    sort_by = [key_col, type_col, ts_col] \
        + ([tiebreak] if tiebreak else [])
    return partition_map(ds, key_col, _fn,
                         num_partitions=num_partitions,
                         sort_by=sort_by)
