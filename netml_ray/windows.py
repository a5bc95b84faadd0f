"""Dataset-level window operators: lag/lead, inter-arrival deltas,
rolling aggregates (north_rule additions; reference analog is the
lag-1 ``np.diff`` in parser.py:371)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from netml_ray import kernels
from netml_ray.partition import partition_map
from netml_ray.sessionize import TS_SEC, _key_codes, with_ts_sec


def _window_partial(col, win: np.ndarray, v: np.ndarray, key_name: str,
                    idx: np.ndarray | None = None) -> pa.Table:
    """Per-batch partial aggregate over (key, window_id): ONE
    dictionary-encode + lexsort + reduceat — no pandas hop in the
    per-batch inner loop (VERDICT r2 #5).  ``idx`` expands rows into
    overlapping windows (hopping case) before grouping."""
    ktype = col.type
    enc = pc.dictionary_encode(
        col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy()
    if idx is not None:
        codes = codes[idx]
        v = v[idx]
    if len(codes) == 0:
        return pa.table({key_name: pa.array([], type=ktype),
                         "window_id": pa.array([], type=pa.int64()),
                         "n": pa.array([], type=pa.int64()),
                         "s": pa.array([], type=pa.float64()),
                         "mn": pa.array([], type=pa.float64()),
                         "mx": pa.array([], type=pa.float64())})
    order = np.lexsort((win, codes))
    c = codes[order]
    w = win[order]
    vv = v[order]
    first = np.r_[True, (c[1:] != c[:-1]) | (w[1:] != w[:-1])]
    starts = np.flatnonzero(first)
    counts = np.diff(np.r_[starts, len(c)])
    return pa.table({
        key_name: pc.take(enc.dictionary, pa.array(c[starts])),
        "window_id": pa.array(w[starts]),
        "n": pa.array(counts.astype(np.int64)),
        "s": pa.array(np.add.reduceat(vv, starts)),
        "mn": pa.array(np.minimum.reduceat(vv, starts)),
        "mx": pa.array(np.maximum.reduceat(vv, starts)),
    })


def _combine_window_partials(partial, key: str,
                             num_partitions: int | None = None):
    """Final (key, window_id) combine of ``_window_partial`` rows via
    ``partition_map`` on ``key`` — key-hash co-location guarantees
    every (key, window) pair lands whole, and the reduction is the
    same dict-encode + lexsort + reduceat pass as the partials.  This
    replaces ``groupby([key, window_id]).aggregate(...)``: the hash
    exchange ships identical partial rows (one per key×window per
    batch) but skips the sort-based shuffle's sampling pass, and the
    small-input driver fast path applies."""

    def _fin(t: pa.Table) -> pa.Table:
        ktype = t.schema.field(key).type
        if t.num_rows == 0:
            return pa.table({key: pa.array([], type=ktype),
                             "window_id": pa.array([], type=pa.int64()),
                             "n_events": pa.array([], type=pa.int64()),
                             "value_sum": pa.array([], type=pa.float64()),
                             "value_min": pa.array([], type=pa.float64()),
                             "value_max": pa.array([], type=pa.float64())})
        enc = pc.dictionary_encode(t[key].combine_chunks())
        codes = enc.indices.to_numpy()
        wid = t["window_id"].to_numpy()
        order = np.lexsort((wid, codes))
        c, w = codes[order], wid[order]
        first = np.r_[True, (c[1:] != c[:-1]) | (w[1:] != w[:-1])]
        starts = np.flatnonzero(first)
        return pa.table({
            key: pc.take(enc.dictionary, pa.array(c[starts])),
            "window_id": pa.array(w[starts]),
            "n_events": pa.array(
                np.add.reduceat(t["n"].to_numpy()[order], starts)
                .astype(np.int64)),
            "value_sum": pa.array(
                np.add.reduceat(t["s"].to_numpy()[order], starts)),
            "value_min": pa.array(
                np.minimum.reduceat(t["mn"].to_numpy()[order], starts)),
            "value_max": pa.array(
                np.maximum.reduceat(t["mx"].to_numpy()[order], starts)),
        })

    return partition_map(partial, key, _fin,
                         num_partitions=num_partitions)


def add_lag_lead(
    ds,
    key: str,
    ts_col: str,
    value_col: str,
    *,
    k: int = 1,
    tiebreak: str | None = None,
    num_partitions: int | None = None,
):
    """Append ``lag_<v>``, ``lead_<v>`` and ``delta_sec`` (inter-arrival
    seconds, NaN at each key's first row) per key in ts order."""
    ds = with_ts_sec(ds, ts_col)
    sort_by = [key, TS_SEC] + ([tiebreak] if tiebreak else [])

    def _fn(t: pa.Table) -> pa.Table:
        codes = _key_codes(t, key)
        v = t[value_col].to_numpy().astype(np.float64)
        tsf = t[TS_SEC].to_numpy()
        lag, lead = kernels.lag_lead(codes, v, k)
        dts, _ = kernels.lag_lead(codes, tsf, 1)
        t = t.append_column(f"lag_{value_col}", pa.array(lag))
        t = t.append_column(f"lead_{value_col}", pa.array(lead))
        t = t.append_column("delta_sec", pa.array(tsf - dts))
        return t

    return partition_map(ds, key, _fn, sort_by=sort_by, num_partitions=num_partitions)


def add_rolling(
    ds,
    key: str,
    ts_col: str,
    value_col: str,
    *,
    window: int = 5,
    tiebreak: str | None = None,
    num_partitions: int | None = None,
):
    """Append rolling count/sum/mean/std/min/max over the current +
    window-1 preceding rows per key (SQL ROWS BETWEEN n PRECEDING AND
    CURRENT ROW; std is population — stddev_pop parity)."""
    ds = with_ts_sec(ds, ts_col)
    sort_by = [key, TS_SEC] + ([tiebreak] if tiebreak else [])

    def _fn(t: pa.Table) -> pa.Table:
        codes = _key_codes(t, key)
        v = t[value_col].to_numpy().astype(np.float64)
        r = kernels.rolling_stats(codes, v, window)
        for name in ("count", "sum", "mean", "std", "min", "max"):
            t = t.append_column(f"roll_{name}", pa.array(r[name]))
        return t

    return partition_map(ds, key, _fn, sort_by=sort_by, num_partitions=num_partitions)


def tumbling_window_agg(
    ds,
    key: str,
    ts_col: str,
    value_col: str,
    *,
    window_sec: float = 3600.0,
    origin: float = 0.0,
):
    """Tumbling event-time windows per key: count/sum/min/max of
    ``value_col`` per ``(key, floor((ts - origin)/window))``.

    The streaming-window shape from SURVEY §2.10 recast as batch:
    window ids are a pure projection, so this is map-side partial
    aggregation (one row per key×window per batch) + a tiny groupby —
    no sessionization shuffle, no sort (ray_guide "Aggregation at
    scale" pattern).
    """
    from netml_ray.sessionize import ts_seconds

    def _partial(t: pa.Table) -> pa.Table:
        sec = ts_seconds(t, ts_col)
        win = np.floor((sec - origin) / window_sec).astype(np.int64)
        v = t[value_col].to_numpy().astype(np.float64)
        return _window_partial(t[key], win, v, key)

    partial = ds.map_batches(_partial, batch_format="pyarrow")
    return _combine_window_partials(partial, key)


def hopping_window_agg(
    ds,
    key: str,
    ts_col: str,
    value_col: str,
    *,
    window_sec: float = 21600.0,
    hop_sec: float = 7200.0,
    origin: float = 0.0,
):
    """Hopping (sliding) event-time windows per key: each row lands in
    ``window/hop`` overlapping windows ``[wid*hop, wid*hop + window)``;
    aggregates per ``(key, wid)``.  Row→window expansion happens inside
    map_batches (vectorized repeat), then the same partial-agg + tiny
    combine as the tumbling case."""
    from netml_ray.sessionize import ts_seconds

    def _partial(t: pa.Table) -> pa.Table:
        sec = ts_seconds(t, ts_col) - origin
        lo = np.floor((sec - window_sec) / hop_sec).astype(np.int64) + 1
        hi = np.floor(sec / hop_sec).astype(np.int64)
        reps = (hi - lo + 1).astype(np.int64)
        idx = np.repeat(np.arange(t.num_rows), reps)
        total = int(reps.sum())
        # per-row window ordinal without a Python loop over rows
        cum = np.concatenate([[0], np.cumsum(reps)])
        offs = np.arange(total, dtype=np.int64) - np.repeat(cum[:-1], reps)
        wid = np.repeat(lo, reps) + offs
        v = t[value_col].to_numpy().astype(np.float64)
        return _window_partial(t[key], wid, v, key, idx=idx)

    partial = ds.map_batches(_partial, batch_format="pyarrow")
    return _combine_window_partials(partial, key)


def add_rolling_quantile(
    ds,
    key: str,
    ts_col: str,
    value_col: str,
    *,
    window: int = 5,
    q: float = 0.5,
    tiebreak: str | None = None,
    num_partitions: int | None = None,
):
    """Rolling linear-interpolated quantile (SQL quantile_cont window
    parity) per key over current + window-1 preceding rows."""
    ds = with_ts_sec(ds, ts_col)
    sort_by = [key, TS_SEC] + ([tiebreak] if tiebreak else [])

    def _fn(t: pa.Table) -> pa.Table:
        codes = _key_codes(t, key)
        v = t[value_col].to_numpy().astype(np.float64)
        return t.append_column("roll_q", pa.array(kernels.rolling_quantile(codes, v, window, q)))

    return partition_map(ds, key, _fn, sort_by=sort_by, num_partitions=num_partitions)


def groupby_quantiles(ds, key: str, col: str, qs: list[float], *,
                      round_to: int | None = 9,
                      num_partitions: int | None = None):
    """Exact per-group quantiles (linear interpolation — the
    ``np.quantile`` / DuckDB ``quantile_cont`` rule): ONE hash
    partition shuffle co-locates each key, a partition-local sort by
    ``(key, col)`` orders every group, and all groups' quantiles come
    out of a handful of vectorized gathers (no per-group dispatch).

    Output: one row per key with ``q{q}_{col}`` columns."""

    def _names(q: float) -> str:
        return f"q{str(q).replace('.', '')}_{col}"

    def _gq(t: pa.Table) -> pa.Table:
        m = t.num_rows
        karr = t[key]
        if isinstance(karr, pa.ChunkedArray):
            karr = karr.combine_chunks()
        out_cols: dict = {}
        if m == 0:
            out_cols[key] = karr
            for q in qs:
                out_cols[_names(q)] = pa.array([], type=pa.float64())
            return pa.table(out_cols)
        starts = np.ones(m, dtype=bool)
        if m > 1:
            starts[1:] = np.asarray(pc.not_equal(
                karr.slice(1, m - 1), karr.slice(0, m - 1)).to_numpy(
                zero_copy_only=False), dtype=bool)
        sidx = np.flatnonzero(starts)
        counts = np.diff(np.append(sidx, m))
        v = np.asarray(t[col].to_numpy(zero_copy_only=False),
                       dtype=np.float64)
        out_cols[key] = karr.take(pa.array(sidx))
        for q in qs:
            pos = (counts - 1) * q
            lo = pos.astype(np.int64)
            frac = pos - lo
            glo = sidx + lo
            ghi = np.minimum(glo + 1, sidx + counts - 1)
            vals = v[glo] + (v[ghi] - v[glo]) * frac
            if round_to is not None:
                vals = np.round(vals, round_to)
            out_cols[_names(q)] = pa.array(vals)
        return pa.table(out_cols)

    return partition_map(ds, key, _gq, sort_by=[key, col],
                         num_partitions=num_partitions)


def pivot_agg(ds, key: str, cat_col: str, val_col: str, *,
              categories: list[str], agg: str = "sum",
              num_partitions: int | None = None):
    """Wide categorical aggregation: one output row per ``key`` with a
    ``{agg}_{category}`` column per listed category (the wide-feature
    form of the reference's categorical counts, parser.py header
    stats).

    Map-side combine first: each batch reduces to per-(key, cat)
    partials via ONE dictionary-encode + lexsort + reduceat, so the
    single hash shuffle carries one row per (key, category) pair seen
    in the batch — not per event.  ``agg`` ∈ {sum, count, mean}; mean
    is derived from (sum, count) partials, so it is exact."""
    if agg not in ("sum", "count", "mean"):
        raise ValueError(f"agg={agg!r} not supported (sum|count|mean)")
    cats = list(categories)

    def _partial(t: pa.Table) -> pa.Table:
        empty = pa.table({key: pa.array([], type=t.schema.field(key).type),
                          cat_col: pa.array([], type=pa.string()),
                          "__s": pa.array([], type=pa.float64()),
                          "__n": pa.array([], type=pa.int64())})
        if t.num_rows == 0:
            return empty
        karr = t[key]
        if isinstance(karr, pa.ChunkedArray):
            karr = karr.combine_chunks()
        ke = karr.dictionary_encode()
        kc = ke.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        carr = t[cat_col]
        if isinstance(carr, pa.ChunkedArray):
            carr = carr.combine_chunks()
        ce = carr.dictionary_encode()
        cc = ce.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = np.asarray(t[val_col].to_numpy(zero_copy_only=False),
                       dtype=np.float64)
        order = np.lexsort((cc, kc))
        ks, cs, vs = kc[order], cc[order], v[order]
        first = np.ones(len(ks), dtype=bool)
        first[1:] = (ks[1:] != ks[:-1]) | (cs[1:] != cs[:-1])
        starts = np.flatnonzero(first)
        sums = np.add.reduceat(vs, starts)
        counts = np.diff(np.append(starts, len(ks)))
        sel = order[first]
        return pa.table({
            key: karr.take(pa.array(sel)),
            cat_col: carr.take(pa.array(sel)).cast(pa.string()),
            "__s": pa.array(sums),
            "__n": pa.array(counts.astype(np.int64)),
        })

    partials = ds.map_batches(_partial, batch_format="pyarrow")

    def _widen(t: pa.Table) -> pa.Table:
        karr = t[key]
        if isinstance(karr, pa.ChunkedArray):
            karr = karr.combine_chunks()
        out_fields = [f"{agg}_{c}" for c in cats]
        if t.num_rows == 0:
            cols = {key: karr}
            for f in out_fields:
                cols[f] = pa.array([], type=pa.float64() if agg != "count"
                                   else pa.int64())
            return pa.table(cols)
        ke = karr.dictionary_encode()
        kc = ke.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nk = len(ke.dictionary)
        cat_idx = {c: i for i, c in enumerate(cats)}
        ci = np.array([cat_idx.get(c, -1)
                       for c in t[cat_col].to_pylist()], dtype=np.int64)
        keep = ci >= 0
        sums = np.zeros((nk, len(cats)), dtype=np.float64)
        counts = np.zeros((nk, len(cats)), dtype=np.int64)
        np.add.at(sums, (kc[keep], ci[keep]),
                  t["__s"].to_numpy()[keep])
        np.add.at(counts, (kc[keep], ci[keep]),
                  t["__n"].to_numpy()[keep])
        ucodes, uidx = np.unique(kc, return_index=True)
        first_pos = np.zeros(nk, dtype=np.int64)
        first_pos[ucodes] = uidx
        cols = {key: karr.take(pa.array(first_pos))}
        for j, f in enumerate(out_fields):
            if agg == "sum":
                cols[f] = pa.array(sums[:, j])
            elif agg == "count":
                cols[f] = pa.array(counts[:, j])
            else:  # mean: exact from (sum, count) partials
                with np.errstate(invalid="ignore"):
                    m = sums[:, j] / counts[:, j]
                cols[f] = pa.array(np.where(counts[:, j] > 0, m, np.nan))
        return pa.table(cols)

    return partition_map(partials, key, _widen,
                         num_partitions=num_partitions)


def _seg_searchsorted(codes: np.ndarray, a: np.ndarray, x: np.ndarray,
                      side: str) -> np.ndarray:
    """Segmented searchsorted, fully vectorized: for every row i,
    the insertion position of ``x[i]`` within ITS OWN segment of ``a``
    (segments = runs of ``codes``; ``a`` ascending within each run).

    One lexsort of the 2n combined (segment, value, tag) rows replaces
    a per-key searchsorted loop: with the tag ordered so targets sort
    before equal data values (side='left') or after them ('right'),
    each target's within-segment data count IS its insertion index.
    Exact — float comparisons only, no composite-key arithmetic."""
    n = len(a)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    tagd, tagt = (1, 0) if side == "left" else (0, 1)
    vals = np.concatenate([a, x])
    seg = np.concatenate([codes, codes])
    tag = np.concatenate([np.full(n, tagd, np.int8),
                          np.full(n, tagt, np.int8)])
    rid = np.concatenate([np.zeros(n, np.int64),
                          np.arange(n, dtype=np.int64)])
    order = np.lexsort((tag, vals, seg))
    is_data = tag[order] == tagd
    cumd = np.cumsum(is_data)
    segs = seg[order]
    run_first = np.r_[True, segs[1:] != segs[:-1]]
    start_pos = np.flatnonzero(run_first)
    before = np.r_[0, cumd[start_pos[1:] - 1]]
    run_id = np.cumsum(run_first) - 1
    within = cumd - before[run_id]
    tmask = ~is_data
    res = np.empty(n, dtype=np.int64)
    res[rid[order][tmask]] = within[tmask]
    return res


def _seg_starts_per_row(codes: np.ndarray) -> np.ndarray:
    n = len(codes)
    first = np.r_[True, codes[1:] != codes[:-1]]
    starts = np.flatnonzero(first)
    return np.repeat(starts, np.diff(np.r_[starts, n]))


def add_rolling_time(
    ds,
    key: str,
    ts_col: str,
    value_col: str,
    *,
    window_sec: float,
    tiebreak: str | None = None,
    num_partitions: int | None = None,
):
    """Time-RANGE rolling aggregates per key: count/sum/mean of
    ``value_col`` over the trailing ``[ts - window_sec, ts]`` interval
    (SQL ``RANGE BETWEEN w PRECEDING AND CURRENT ROW`` on the epoch
    seconds — both interval endpoints inclusive, equal-``ts`` peers
    always included).  The core north-star shape: feature state as
    "activity in the last hour" rather than "last N rows".

    Vectorized: the interval's row bounds come from TWO segmented
    searchsorted passes (one lexsort each, no per-key loop) and the
    sums from one prefix-cumsum gather."""
    ds = with_ts_sec(ds, ts_col)
    sort_by = [key, TS_SEC] + ([tiebreak] if tiebreak else [])

    def _fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            for c, typ in (("rollt_count", pa.int64()),
                           ("rollt_sum", pa.float64()),
                           ("rollt_mean", pa.float64())):
                t = t.append_column(c, pa.array([], type=typ))
            return t
        codes = _key_codes(t, key)
        tsf = t[TS_SEC].to_numpy()
        v = t[value_col].to_numpy().astype(np.float64)
        seg0 = _seg_starts_per_row(codes)
        lo = seg0 + _seg_searchsorted(codes, tsf, tsf - window_sec, "left")
        hi = seg0 + _seg_searchsorted(codes, tsf, tsf, "right")
        cnt = hi - lo
        csum = np.r_[0.0, np.cumsum(v)]
        s = csum[hi] - csum[lo]
        t = t.append_column("rollt_count", pa.array(cnt.astype(np.int64)))
        t = t.append_column("rollt_sum", pa.array(s))
        t = t.append_column("rollt_mean", pa.array(s / cnt))
        return t

    return partition_map(ds, key, _fn, sort_by=sort_by,
                         num_partitions=num_partitions)


def add_cumulative(
    ds,
    key: str,
    ts_col: str,
    value_col: str,
    *,
    tiebreak: str | None = None,
    num_partitions: int | None = None,
):
    """Expanding (cumulative) aggregates per key in ``(ts, tiebreak)``
    order: running count/sum/mean of ``value_col`` plus
    ``since_first_sec`` (seconds since the key's first event — session
    age).  SQL ``ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW``.
    One cumsum + one segment-offset gather; no per-key work."""
    ds = with_ts_sec(ds, ts_col)
    sort_by = [key, TS_SEC] + ([tiebreak] if tiebreak else [])

    def _fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            for c, typ in (("cum_count", pa.int64()),
                           ("cum_sum", pa.float64()),
                           ("cum_mean", pa.float64()),
                           ("since_first_sec", pa.float64())):
                t = t.append_column(c, pa.array([], type=typ))
            return t
        codes = _key_codes(t, key)
        v = t[value_col].to_numpy().astype(np.float64)
        tsf = t[TS_SEC].to_numpy()
        seg0 = _seg_starts_per_row(codes)
        idx = np.arange(n, dtype=np.int64)
        cnt = idx - seg0 + 1
        csum = np.cumsum(v)
        base = np.r_[0.0, csum][seg0]
        s = csum - base
        t = t.append_column("cum_count", pa.array(cnt))
        t = t.append_column("cum_sum", pa.array(s))
        t = t.append_column("cum_mean", pa.array(s / cnt))
        t = t.append_column("since_first_sec", pa.array(tsf - tsf[seg0]))
        return t

    return partition_map(ds, key, _fn, sort_by=sort_by,
                         num_partitions=num_partitions)


def add_rank_features(
    ds,
    key: str,
    ts_col: str,
    *,
    ntile: int = 4,
    tiebreak: str | None = None,
    num_partitions: int | None = None,
):
    """SQL ranking window functions per key in ``(ts, tiebreak)``
    order: ``row_num`` (ROW_NUMBER), ``pct_rank`` (PERCENT_RANK with
    a unique ordering, = (row-1)/(n-1), 0 for single-row keys) and
    ``tile`` (NTILE(``ntile``): first ``n mod k`` buckets get the
    extra row).  One segment-offset pass — no per-key work."""
    ds = with_ts_sec(ds, ts_col)
    sort_by = [key, TS_SEC] + ([tiebreak] if tiebreak else [])

    def _fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            for c, typ in (("row_num", pa.int64()),
                           ("pct_rank", pa.float64()),
                           ("tile", pa.int64())):
                t = t.append_column(c, pa.array([], type=typ))
            return t
        codes = _key_codes(t, key)
        seg0 = _seg_starts_per_row(codes)
        idx = np.arange(n, dtype=np.int64)
        i = idx - seg0                      # 0-based position in key
        # per-row segment length: the NEXT segment's start minus ours
        is_start = np.r_[True, codes[1:] != codes[:-1]]
        starts = np.flatnonzero(is_start)
        seg_len_per = np.repeat(np.diff(np.r_[starts, n]),
                                np.diff(np.r_[starts, n]))
        rn = i + 1
        pct = np.where(seg_len_per > 1, i / np.maximum(seg_len_per - 1, 1),
                       0.0)
        q, r = np.divmod(seg_len_per, ntile)
        big = (q + 1) * r                   # rows covered by big buckets
        tile = np.where(
            i < big, i // np.maximum(q + 1, 1),
            r + (i - big) // np.maximum(q, 1)) + 1
        t = t.append_column("row_num", pa.array(rn))
        t = t.append_column("pct_rank", pa.array(pct.astype(np.float64)))
        t = t.append_column("tile", pa.array(tile.astype(np.int64)))
        return t

    return partition_map(ds, key, _fn, sort_by=sort_by,
                         num_partitions=num_partitions)


def _fill_indices(codes: np.ndarray, valid: np.ndarray,
                  backward: bool = False) -> np.ndarray:
    """Per-key-segment fill source index for every row (-1 = no
    source): the most recent valid row at-or-before (forward) or the
    next valid row at-or-after (backward) WITHIN the row's key run.
    One global cummax + a same-key check — the global running maximum
    of valid positions is the within-segment one whenever its key
    matches (positions are sorted by key), so no per-segment loop."""
    n = len(codes)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    if backward:
        rev = _fill_indices(codes[::-1], valid[::-1], backward=False)
        return np.where(rev[::-1] >= 0, n - 1 - rev[::-1], -1)
    last = np.where(valid, np.arange(n, dtype=np.int64), -1)
    np.maximum.accumulate(last, out=last)
    ok = (last >= 0) & (codes[np.maximum(last, 0)] == codes)
    return np.where(ok, last, -1)


def add_fill(
    ds,
    key: str,
    ts_col: str,
    cols,
    *,
    directions=("forward",),
    tiebreak: str | None = None,
    num_partitions: int | None = None,
):
    """Per-key ordered NULL fill — the ``backfill`` op the north_rule
    names next to lag/lead/sessionize (reference analog: the implicit
    carry-forward of per-flow state in parser.py's sequential walk).
    For each column in ``cols`` appends ``<col>_ffill`` (most recent
    non-NULL at-or-before, per key in ``(ts, tiebreak)`` order) and/or
    ``<col>_bfill`` per ``directions``.  Type-generic: the fill is a
    single ``pc.take`` with a masked index array, so strings/ints/
    floats all fill zero-copy without a Python row loop.  SQL parity:
    ``last_value(col IGNORE NULLS) OVER (PARTITION BY key ORDER BY ts
    ROWS UNBOUNDED PRECEDING)`` / ``first_value .. FOLLOWING``."""
    ds = with_ts_sec(ds, ts_col)
    sort_by = [key, TS_SEC] + ([tiebreak] if tiebreak else [])
    cols = list(cols)
    directions = tuple(directions)
    for d in directions:
        if d not in ("forward", "backward"):
            raise ValueError(f"unknown fill direction {d!r}")

    def _fn(t: pa.Table) -> pa.Table:
        codes = _key_codes(t, key)
        for col in cols:
            arr = t[col]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            valid = np.asarray(pc.is_valid(arr))
            for d in directions:
                idx = _fill_indices(codes, valid, backward=(d == "backward"))
                take = pa.array(idx, type=pa.int64(), mask=idx < 0)
                suffix = "_ffill" if d == "forward" else "_bfill"
                t = t.append_column(col + suffix, pc.take(arr, take))
        return t

    return partition_map(ds, key, _fn, sort_by=sort_by,
                         num_partitions=num_partitions)


def resample_ffill(
    ds,
    key: str,
    ts_col: str,
    value_cols,
    *,
    step_sec: float,
    tiebreak: str | None = None,
    num_partitions: int | None = None,
):
    """Resample each key's event stream onto a regular time grid,
    carrying the latest-known value forward (point-in-time state at
    grid timestamps — the as-of join against a GENERATED grid, fused
    into one narrow pass so the grid never exists as a shuffled
    table).  Grid points run from each key's first event time rounded
    UP to the step grid through its last event time, so every grid
    point has a preceding event (no NULL rows).

    All math in integer microseconds on one global monotone axis: per
    key, event times shift onto disjoint ranges (cumsum of spans), the
    grid shifts identically, and ONE ``np.searchsorted`` resolves the
    as-of event index for every grid point of every key — no per-key
    loop.  Ties on (key, ts) resolve to the last row in ``tiebreak``
    order on both this and the SQL side."""
    value_cols = list(value_cols)
    step = int(round(step_sec * 1_000_000))
    if step <= 0:
        raise ValueError("step_sec must be positive")
    sort_by = [key, ts_col] + ([tiebreak] if tiebreak else [])

    def _fn(t: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [(key, t.schema.field(key).type),
             ("grid_ts", pa.timestamp("us"))]
            + [(c + "_ffill", t.schema.field(c).type) for c in value_cols])
        if t.num_rows == 0:
            return out_schema.empty_table()
        codes = _key_codes(t, key)
        ts = t[ts_col].combine_chunks().cast(pa.int64()).to_numpy()
        is_start = np.r_[True, codes[1:] != codes[:-1]]
        starts = np.flatnonzero(is_start)
        ends = np.r_[starts[1:], len(codes)]
        first, last = ts[starts], ts[ends - 1]
        lo = -(-first // step) * step          # ceil to the step grid
        cnt = np.maximum((last - lo) // step + 1, 0)
        total = int(cnt.sum())
        if total == 0:
            return out_schema.empty_table()
        k_rep = np.repeat(np.arange(len(starts)), cnt)
        off = np.r_[0, np.cumsum(cnt)[:-1]]
        g = lo[k_rep] + step * (np.arange(total) - off[k_rep])
        # disjoint per-key ranges → one global monotone axis
        base = np.r_[0, np.cumsum(last - first + 1)[:-1]]
        seg_of_row = np.cumsum(is_start) - 1
        evp = ts - first[seg_of_row] + base[seg_of_row]
        gp = g - first[k_rep] + base[k_rep]
        idx = np.searchsorted(evp, gp, side="right") - 1
        take = pa.array(idx, type=pa.int64())
        cols = {key: pc.take(t[key], pa.array(starts[k_rep])),
                "grid_ts": pa.array(g).cast(pa.timestamp("us"))}
        for c in value_cols:
            cols[c + "_ffill"] = pc.take(t[c], take)
        return pa.table(cols).cast(out_schema)

    return partition_map(ds, key, _fn, sort_by=sort_by,
                         num_partitions=num_partitions)


def add_ewma(ds, key: str, order_by: str, col: str, *,
             alpha: float, tiebreak: str, suffix: str = "_ewm",
             round_to: int | None = 9):
    """Per-key exponentially-weighted moving average (pandas
    ``adjust=True`` semantics: ``y_i = Σ_j x_j q^{i-j} / Σ_j q^{i-j}``
    with ``q = 1−alpha``) — the classic recency-weighted feature for
    event streams.

    ONE hash exchange co-locates each key's rows; inside a partition
    the whole frame goes through pandas' C ``groupby(...).ewm`` kernel
    in one call — no Python loop over keys.  The SQL oracle states the
    identical weighted sum explicitly (O(run²) per key — fine for an
    oracle, which is why the engine side exists)."""
    import pandas as pd  # noqa: F401  (pandas ewm kernel)

    def _fn(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return t.append_column(col + suffix,
                                   pa.array([], type=pa.float64()))
        df = t.select([key, col]).to_pandas()
        ew = (df.groupby(key, sort=False)[col]
              .ewm(alpha=alpha, adjust=True).mean()
              .reset_index(level=0, drop=True).sort_index()
              .to_numpy())
        if round_to is not None:
            ew = np.round(ew, round_to)
        return t.append_column(col + suffix,
                               pa.array(ew, type=pa.float64()))

    return partition_map(ds, key, _fn,
                         sort_by=[key, order_by, tiebreak])


def add_rolling_corr(
    ds,
    key: str,
    ts_col: str,
    x_col: str,
    y_col: str | None = None,
    *,
    window: int = 5,
    tiebreak: str | None = None,
    num_partitions: int | None = None,
):
    """Append ``roll_corr`` — rolling Pearson correlation over the
    current + window-1 preceding rows per key.  With ``y_col=None``
    the second series is the within-key ROW POSITION (1-based
    row_number), making ``roll_corr`` the LOCAL TREND feature: +1 when
    x is locally monotonically rising, -1 falling, NaN where SQL corr
    is NULL (window < 2 rows or zero variance).  Position is a small
    exact integer, so the kernel's centered sums stay cancellation-
    free regardless of the timestamp magnitudes (the raw-epoch
    variant loses ~6 digits to cancellation at epoch~1.7e9).

    Same partition/sort shape as ``add_rolling``: ONE hash partition
    on ``key``, per-partition sort on (key, ts, tiebreak), vectorized
    kernel — no second exchange.
    """
    ds = with_ts_sec(ds, ts_col)
    sort_by = [key, TS_SEC] + ([tiebreak] if tiebreak else [])

    def _fn(t: pa.Table) -> pa.Table:
        codes = _key_codes(t, key)
        x = t[x_col].to_numpy().astype(np.float64)
        if y_col is None:
            starts = _seg_starts_per_row(codes)
            y = (np.arange(len(codes)) - starts + 1).astype(np.float64)
        else:
            y = t[y_col].to_numpy().astype(np.float64)
        r = kernels.rolling_corr(codes, x, y, window)
        return t.append_column("roll_corr", pa.array(r, type=pa.float64()))

    return partition_map(ds, key, _fn, sort_by=sort_by,
                         num_partitions=num_partitions)


def add_forward_window(
    ds,
    key: str,
    ts_col: str,
    value_col: str,
    *,
    horizon_sec: float,
    tiebreak: str | None = None,
    num_partitions: int | None = None,
):
    """Forward-looking time-RANGE aggregates per key: count/sum of
    ``value_col`` over ``[ts, ts + horizon_sec]`` (SQL ``RANGE BETWEEN
    CURRENT ROW AND h FOLLOWING`` on epoch seconds — both endpoints
    inclusive, equal-``ts`` peers included on BOTH sides, exactly the
    value-based SQL frame).  The label-engineering mirror of
    :func:`add_rolling_time`: "activity in the NEXT hour" is the
    standard supervised target for churn / burst prediction, and
    building it here (instead of in training code) keeps the
    time-travel boundary in one audited kernel.

    Same scale shape as the trailing op: ONE hash partition on
    ``key``, two segmented-searchsorted passes + one prefix-cumsum
    gather — no per-key loop, no second exchange.
    """
    ds = with_ts_sec(ds, ts_col)
    sort_by = [key, TS_SEC] + ([tiebreak] if tiebreak else [])

    def _fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            for c, typ in (("fwd_count", pa.int64()),
                           ("fwd_sum", pa.float64())):
                t = t.append_column(c, pa.array([], type=typ))
            return t
        codes = _key_codes(t, key)
        tsf = t[TS_SEC].to_numpy()
        v = t[value_col].to_numpy().astype(np.float64)
        seg0 = _seg_starts_per_row(codes)
        lo = seg0 + _seg_searchsorted(codes, tsf, tsf, "left")
        hi = seg0 + _seg_searchsorted(codes, tsf, tsf + horizon_sec,
                                      "right")
        cnt = hi - lo
        csum = np.r_[0.0, np.cumsum(v)]
        s = csum[hi] - csum[lo]
        t = t.append_column("fwd_count", pa.array(cnt.astype(np.int64)))
        t = t.append_column("fwd_sum", pa.array(s))
        return t

    return partition_map(ds, key, _fn, sort_by=sort_by,
                         num_partitions=num_partitions)


def add_seasonal_deviation(
    ds,
    key: str,
    ts_col: str,
    value_col: str,
    *,
    num_partitions: int | None = None,
):
    """Per-(key, hour-of-day) seasonal baseline and deviation:
    ``season_mean`` = the key's mean of ``value_col`` over ALL its
    rows sharing the row's hour-of-day (SQL ``avg(v) OVER (PARTITION
    BY key, hour(ts))``), ``season_dev`` = value - season_mean.  The
    classic de-seasonalization feature: "is this event big FOR THIS
    USER AT THIS TIME OF DAY".

    ONE hash partition on ``key``; inside a partition the (key-run x
    24-hour) group means come from two ``np.bincount`` calls over the
    combined code ``run*24 + hour`` — run-segmented (groups never span
    key runs), so the driver fast path stays valid.  Hour is taken
    from the timestamp column directly (``pc.hour``), not the float
    epoch, for exact SQL parity.
    """
    def _fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            for c in ("season_mean", "season_dev"):
                t = t.append_column(c, pa.array([], type=pa.float64()))
            return t
        codes = _key_codes(t, key)
        if pa.types.is_temporal(t.schema.field(ts_col).type):
            hour = pc.hour(t[ts_col]).to_numpy().astype(np.int64)
        else:  # numeric epoch seconds: hour-of-day by modular floor
            hour = (np.floor_divide(
                t[ts_col].to_numpy().astype(np.int64), 3600) % 24)
        v = t[value_col].to_numpy().astype(np.float64)
        gid = codes * 24 + hour
        m = int(gid.max()) + 1
        sums = np.bincount(gid, weights=v, minlength=m)
        cnts = np.bincount(gid, minlength=m)
        with np.errstate(invalid="ignore"):
            means = sums / cnts
        sm = means[gid]
        t = t.append_column("season_mean", pa.array(sm))
        t = t.append_column("season_dev", pa.array(v - sm))
        return t

    return partition_map(ds, key, _fn, sort_by=[key],
                         num_partitions=num_partitions)


def add_time_to_event(
    ds,
    key: str,
    ts_col: str,
    type_col: str,
    target: str,
    *,
    tiebreak: str | None = None,
    out_col: str = "tte_sec",
    out_unit: str = "sec",
    num_partitions: int | None = None,
):
    """Time-to-event (survival) feature: for every row, time until the
    key's NEXT ``type_col == target`` row strictly after it in
    (ts, tiebreak) order — NULL when the key never converts again.
    The churn/conversion label: ``min(CASE WHEN type=target THEN
    epoch(ts) END) OVER (... ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED
    FOLLOWING) - epoch(ts)``.

    ``out_unit='sec'`` emits float seconds (NaN for never);
    ``out_unit='us'`` emits EXACT int64 microseconds (typed NULL for
    never) straight off the timestamp column — zero float arithmetic,
    so oracle parity is bitwise rather than round-hedged.

    Vectorized without a suffix scan: target-row positions are already
    sorted, so each row's next target is ONE ``searchsorted(tgt_idx,
    i, 'right')`` away, validated against its segment end.  Same ONE
    hash-partition shape as the other window ops; run-segmented.
    """
    if out_unit not in ("sec", "us"):
        raise ValueError(f"out_unit must be 'sec' or 'us', got {out_unit!r}")
    ds = with_ts_sec(ds, ts_col)
    sort_by = [key, TS_SEC] + ([tiebreak] if tiebreak else [])

    def _fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            typ = pa.float64() if out_unit == "sec" else pa.int64()
            return t.append_column(out_col, pa.array([], type=typ))
        codes = _key_codes(t, key)
        if out_unit == "us":
            tsf = t[ts_col].cast(pa.int64()).to_numpy()
        else:
            tsf = t[TS_SEC].to_numpy()
        is_tgt = pc.fill_null(pc.equal(t[type_col], target),
                              False).to_numpy(zero_copy_only=False)
        tgt_idx = np.flatnonzero(np.asarray(is_tgt, dtype=bool))
        out = np.zeros(n, dtype=tsf.dtype)
        ok = np.zeros(n, dtype=bool)
        if len(tgt_idx):
            # segment end (exclusive) per row = start of the NEXT run
            first = np.r_[True, codes[1:] != codes[:-1]]
            starts = np.flatnonzero(first)
            seg_end = np.repeat(np.r_[starts[1:], n],
                                np.diff(np.r_[starts, n]))
            j = np.searchsorted(tgt_idx, np.arange(n), side="right")
            nxt = tgt_idx[np.minimum(j, len(tgt_idx) - 1)]
            ok = (j < len(tgt_idx)) & (nxt < seg_end)
            out[ok] = tsf[nxt[ok]] - tsf[np.flatnonzero(ok)]
        if out_unit == "us":
            col = pa.array(out.astype(np.int64), mask=~ok)
        else:
            outf = out.astype(np.float64)
            outf[~ok] = np.nan
            col = pa.array(outf)
        return t.append_column(out_col, col)

    return partition_map(ds, key, _fn, sort_by=sort_by,
                         num_partitions=num_partitions)


def add_rolling_distinct(
    ds,
    key: str,
    ts_col: str,
    cat_col: str,
    *,
    window: int = 5,
    tiebreak: str | None = None,
    out_col: str = "roll_distinct",
    num_partitions: int | None = None,
):
    """Rolling DISTINCT count of ``cat_col`` over the current +
    window-1 preceding rows per key (SQL ``count(DISTINCT c) OVER
    (... ROWS BETWEEN w-1 PRECEDING AND CURRENT ROW)``) — the
    behavioral-diversity feature ("how many different actions in the
    user's last 5 events").  Exact int64, so oracle parity is bitwise.

    Vectorized via the last-occurrence rule: position j counts toward
    window [lo_i, i] iff j's NEXT same-category occurrence inside its
    key run lands after i.  ``nxt`` comes from one lexsort of
    (run, category, position); the window sum is <= ``window`` shifted
    vectorized compares — O(n·window), the same regime as
    ``rolling_corr``.  ONE hash exchange; run-segmented.
    """
    ds = with_ts_sec(ds, ts_col)
    sort_by = [key, TS_SEC] + ([tiebreak] if tiebreak else [])

    def _fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t.append_column(out_col,
                                   pa.array([], type=pa.int64()))
        codes = _key_codes(t, key)
        cat = t[cat_col].combine_chunks() if isinstance(
            t[cat_col], pa.ChunkedArray) else t[cat_col]
        ccode = pc.dictionary_encode(cat).indices.to_numpy().astype(
            np.int64)
        pos = np.arange(n, dtype=np.int64)
        order = np.lexsort((pos, ccode, codes))
        oc, ok_, op = codes[order], ccode[order], pos[order]
        same = np.r_[(oc[:-1] == oc[1:]) & (ok_[:-1] == ok_[1:]), False]
        # next same-(run,cat) position: the following entry in the
        # lexsort order where the (run, cat) pair repeats
        nxt_sorted = np.full(n, n, dtype=np.int64)
        nxt_sorted[:-1] = np.where(same[:-1], op[1:], n)
        nxt = np.empty(n, dtype=np.int64)
        nxt[op] = nxt_sorted
        seg0 = _seg_starts_per_row(codes)
        lo = np.maximum(seg0, pos - (window - 1))
        cnt = np.zeros(n, dtype=np.int64)
        for k in range(window):
            j = pos - k
            valid = j >= lo
            jv = j[valid]
            cnt[valid] += (nxt[jv] > pos[valid]).astype(np.int64)
        return t.append_column(out_col, pa.array(cnt))

    return partition_map(ds, key, _fn, sort_by=sort_by,
                         num_partitions=num_partitions)


def rollup_agg(
    ds,
    key_a: str,
    key_b: str,
    value_col: str,
    *,
    num_partitions: int | None = None,
):
    """OLAP ROLLUP over two grouping columns: one pass emits ALL
    levels — ``(a, b)``, ``(a, NULL)`` and the ``(NULL, NULL)`` grand
    total — with ``n`` (count) and ``s`` (sum of ``value_col``),
    exactly SQL ``GROUP BY ROLLUP(a, b)``.

    Scale shape: map-side (a, b, n, s) partials per batch (one row per
    distinct pair per batch), ONE hash exchange on ``a`` — which
    co-locates everything both the (a,b) and the (a) levels need, so
    both are finalized in the same partition pass — and the grand
    total folds from O(partitions) partial rows on the driver.  No
    second exchange, no sort.
    """
    import ray.data as rd

    def _partial(t: pa.Table) -> pa.Table:
        a = t[key_a].combine_chunks() if isinstance(
            t[key_a], pa.ChunkedArray) else t[key_a]
        ea = pc.dictionary_encode(a)
        ca = ea.indices.to_numpy().astype(np.int64)
        b = t[key_b].to_numpy()
        v = t[value_col].to_numpy().astype(np.float64)
        order = np.lexsort((b, ca))
        ca, bs, vs = ca[order], b[order], v[order]
        first = np.r_[True, (ca[1:] != ca[:-1]) | (bs[1:] != bs[:-1])]
        starts = np.flatnonzero(first)
        return pa.table({
            key_a: pc.take(ea.dictionary, pa.array(ca[starts])),
            key_b: pa.array(bs[starts]),
            "n": pa.array(np.diff(np.r_[starts, len(ca)])
                          .astype(np.int64)),
            "s": pa.array(np.add.reduceat(vs, starts)),
        })

    partial = ds.map_batches(_partial, batch_format="pyarrow")

    def _finalize(t: pa.Table) -> pa.Table:
        atype = t.schema.field(key_a).type
        btype = t.schema.field(key_b).type
        if t.num_rows == 0:
            return pa.table({key_a: pa.array([], type=atype),
                             key_b: pa.array([], type=btype),
                             "n": pa.array([], type=pa.int64()),
                             "s": pa.array([], type=pa.float64())})
        ea = pc.dictionary_encode(t[key_a].combine_chunks())
        ca = ea.indices.to_numpy().astype(np.int64)
        b = t[key_b].to_numpy()
        nn = t["n"].to_numpy()
        ss = t["s"].to_numpy()
        order = np.lexsort((b, ca))
        ca, bs = ca[order], b[order]
        nn, ss = nn[order], ss[order]
        first = np.r_[True, (ca[1:] != ca[:-1]) | (bs[1:] != bs[:-1])]
        st = np.flatnonzero(first)
        lvl2 = pa.table({
            key_a: pc.take(ea.dictionary, pa.array(ca[st])),
            key_b: pa.array(bs[st], type=btype),
            "n": pa.array(np.add.reduceat(nn, st).astype(np.int64)),
            "s": pa.array(np.add.reduceat(ss, st)),
        })
        fa = np.r_[True, ca[1:] != ca[:-1]]
        sa = np.flatnonzero(fa)
        lvl1 = pa.table({
            key_a: pc.take(ea.dictionary, pa.array(ca[sa])),
            key_b: pa.array([None] * len(sa), type=btype),
            "n": pa.array(np.add.reduceat(nn, sa).astype(np.int64)),
            "s": pa.array(np.add.reduceat(ss, sa)),
        })
        return pa.concat_tables([lvl2, lvl1])

    levels = partition_map(partial, key_a, _finalize,
                           num_partitions=num_partitions).materialize()

    # grand total: fold the finalized (a,b) rows' (n, s) on the driver
    tot_n, tot_s = 0, 0.0
    out_schema = None
    for bt in levels.iter_batches(batch_size=None,
                                  batch_format="pyarrow"):
        if out_schema is None:
            out_schema = bt.schema
        m = pc.is_valid(bt[key_b]).to_numpy(zero_copy_only=False)
        tot_n += int(bt["n"].to_numpy()[m].sum())
        tot_s += float(bt["s"].to_numpy()[m].sum())
    if out_schema is None:
        return levels
    total = pa.table({
        out_schema.field(0).name: pa.array([None],
                                           type=out_schema.field(0).type),
        out_schema.field(1).name: pa.array([None],
                                           type=out_schema.field(1).type),
        "n": pa.array([tot_n], type=pa.int64()),
        "s": pa.array([tot_s], type=pa.float64()),
    })
    return levels.union(rd.from_arrow(total))


def cube_agg(
    ds,
    key_a: str,
    key_b: str,
    value_col: str,
    *,
    num_partitions: int | None = None,
):
    """OLAP CUBE over two grouping columns: ROLLUP's three levels plus
    the ``(NULL, b)`` marginal — SQL ``GROUP BY CUBE(a, b)``.

    The (b) level is derived from the already-finalized (a, b) rows
    (cardinality |a×b|, thousands — not the raw row count), so the
    extra cost over ROLLUP is one narrow exchange over that small set,
    never a second pass of the data.
    """
    rolled = rollup_agg(ds, key_a, key_b, value_col,
                        num_partitions=num_partitions).materialize()

    def _lvl2(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(t[key_a]), pc.is_valid(t[key_b]))
        return t.filter(m)

    def _b_level(t: pa.Table) -> pa.Table:
        atype = t.schema.field(key_a).type
        btype = t.schema.field(key_b).type
        if t.num_rows == 0:
            return pa.table({key_a: pa.array([], type=atype),
                             key_b: pa.array([], type=btype),
                             "n": pa.array([], type=pa.int64()),
                             "s": pa.array([], type=pa.float64())})
        b = t[key_b].to_numpy()
        order = np.argsort(b, kind="stable")
        bs = b[order]
        nn = t["n"].to_numpy()[order]
        ss = t["s"].to_numpy()[order]
        first = np.r_[True, bs[1:] != bs[:-1]]
        st = np.flatnonzero(first)
        k = len(st)
        return pa.table({
            key_a: pa.array([None] * k, type=atype),
            key_b: pa.array(bs[st], type=btype),
            "n": pa.array(np.add.reduceat(nn, st).astype(np.int64)),
            "s": pa.array(np.add.reduceat(ss, st)),
        })

    b_rows = partition_map(
        rolled.map_batches(_lvl2, batch_format="pyarrow"),
        key_b, _b_level, num_partitions=num_partitions)
    return rolled.union(b_rows)


def melt(ds, id_cols: list, value_cols: list, *,
         var_name: str = "variable", value_name: str = "value"):
    """Unpivot (wide → long): each input row becomes
    ``len(value_cols)`` rows of ``(*id_cols, variable, value)`` — the
    inverse of :func:`pivot_agg` and the reshape every
    feature-matrix-to-EAV export needs.  Values cast to float64 (the
    common melt type; duckdb UNPIVOT promotes identically when the
    columns are numeric).

    Scale shape: a pure narrow ``map_batches`` transform — per batch
    ONE vertical concat of value-column slices with a repeated
    variable tag, zero-copy takes on the id columns, no shuffle, no
    state.  Output rows = input rows × len(value_cols), streamed."""

    vcols = list(value_cols)
    icols = list(id_cols)

    def _f(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if not n:
            return pa.table(
                {c: t[c] for c in icols}
                | {var_name: pa.array([], pa.string()),
                   value_name: pa.array([], pa.float64())})
        parts = []
        for c in vcols:
            p = t.select(icols)
            p = p.append_column(var_name,
                                pa.array([c] * n, pa.string()))
            p = p.append_column(value_name, t[c].cast(pa.float64()))
            parts.append(p)
        return pa.concat_tables(parts, promote_options="none")

    return ds.select_columns(icols + vcols).map_batches(
        _f, batch_format="pyarrow")


def interpolate_time(
    ds,
    key: str,
    ts_col: str,
    val_col: str,
    *,
    tiebreak: str | None = None,
    out_col: str | None = None,
    round_to: int = 9,
    num_partitions: int | None = None,
):
    """Per-key time-weighted LINEAR interpolation of NULL values —
    the gap-repair sibling of ``add_fill``: a NULL row between two
    non-NULL neighbours (in ``(ts, tiebreak)`` order within its key)
    gets ``prev + (next - prev) * ((ts - t_prev) / (t_next -
    t_prev))``; leading/trailing NULL runs (no neighbour on one side)
    and zero-width gaps (``t_next == t_prev``) stay NULL.  Appends
    ``out_col`` (default ``<val>_interp``, rounded) and a ``filled``
    flag (row was NULL and got a value).

    Scale shape: ONE ``partition_map`` hash exchange; inside a
    partition the strict previous/next non-NULL row indices come from
    the same global-cummax ``_fill_indices`` trick ``add_fill`` uses
    (no per-segment loop), and the blend is three vectorized float64
    ops whose order matches the SQL expression exactly
    (``pv + (nv - pv) * (dt1 / (1.0 * dt2))``)."""
    out_col = out_col or (val_col + "_interp")
    sort_by = [key, ts_col] + ([tiebreak] if tiebreak else [])

    def _fn(t: pa.Table) -> pa.Table:
        codes = _key_codes(t, key)
        arr = t[val_col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        valid = np.asarray(pc.is_valid(arr))
        v = arr.to_numpy(zero_copy_only=False).astype(np.float64)
        ts = t[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        tsv = ts.to_numpy(zero_copy_only=False).astype(np.int64)
        prev = _fill_indices(codes, valid, backward=False)
        nxt = _fill_indices(codes, valid, backward=True)
        have = (prev >= 0) & (nxt >= 0)
        pi, ni = np.maximum(prev, 0), np.maximum(nxt, 0)
        pv, nv = v[pi], v[ni]
        dt2 = (tsv[ni] - tsv[pi]).astype(np.float64)
        gap_ok = have & (dt2 > 0)
        frac = np.divide((tsv - tsv[pi]).astype(np.float64), dt2,
                         out=np.zeros(len(v)), where=gap_ok)
        interp = pv + (nv - pv) * frac
        outv = np.where(valid, v, interp)
        ok = valid | (~valid & gap_ok)
        res = pc.if_else(pa.array(ok),
                         pa.array(np.round(outv, round_to)),
                         pa.nulls(len(v), pa.float64()))
        return (t.append_column(out_col, res)
                .append_column("filled", pa.array(~valid & ok)))

    return partition_map(ds, key, _fn, sort_by=sort_by,
                         num_partitions=num_partitions)
