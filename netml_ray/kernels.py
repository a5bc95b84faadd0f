"""Segmented numpy kernels — the vectorized hot path of every keyed op.

Each kernel operates on *one hash partition* already sorted by
``(key, ts, tiebreak)``: flat numpy arrays plus segment boundaries.  All
keys in the partition are processed in a few vectorized numpy calls; no
Python-per-row loops (the only Python-level loops iterate over *splits*
or *segments*, i.e. output-proportional work).

Semantics replicate noise-lab/netml exactly (cited per kernel); the
row-wise oracle in ``netml_ray.oracle`` is the independent ground truth
these kernels are tested against.
"""

from __future__ import annotations

import numpy as np

SAMP_CAP = 500  # reference memory guard: parser.py:535-542


# ---------------------------------------------------------------------------
# segment machinery
# ---------------------------------------------------------------------------

def segment_starts(codes: np.ndarray) -> np.ndarray:
    """Start indices of runs of equal values in a sorted code array."""
    if len(codes) == 0:
        return np.empty(0, dtype=np.int64)
    return np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]]).astype(np.int64)


def encode_keys(*cols: np.ndarray) -> np.ndarray:
    """Dense int64 codes for (already sorted) composite key columns.

    Rows are grouped when *all* columns are equal to the previous row.
    """
    n = len(cols[0])
    if n == 0:
        return np.empty(0, dtype=np.int64)
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for c in cols:
        change[1:] |= c[1:] != c[:-1]
    return np.cumsum(change).astype(np.int64) - 1


# ---------------------------------------------------------------------------
# G3: gap/timeout sessionization  (ref: parser.py:141-206)
# ---------------------------------------------------------------------------

def gap_sessionize(
    key_codes: np.ndarray,
    ts: np.ndarray,
    gap: float,
    *,
    min_rows: int = 2,
    netml: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
    """Gap-cut sessionization over (key, ts)-sorted arrays.

    Returns ``(keep_mask, session_ordinal)`` where ``session_ordinal``
    is the 0-based session index within each key.

    netml=True replicates the reference exactly (parser.py:141-206):
      * keys with fewer than ``max(2, min_rows)`` rows dropped up front
        (parser.py:146-147)
      * a new session starts when ``ts[i] - ts[i-1] > gap`` (strictly
        greater; parser.py:165)
      * if a key split at all, its *trailing* session is discarded
        (parser.py:188-193)
      * sessions with fewer than ``min_rows`` rows dropped afterwards
        (raw threshold, not max(2, .); parser.py:197)

    netml=False is the plain cumulative gap cut (no discards) — the
    SQL-expressible variant used for the DuckDB oracle checks.
    """
    n = len(ts)
    if n == 0:
        return np.zeros(0, dtype=bool), np.zeros(0, dtype=np.int64)

    new_key = np.r_[True, key_codes[1:] != key_codes[:-1]]
    cut = new_key.copy()
    cut[1:] |= (ts[1:] - ts[:-1]) > gap

    sid_global = np.cumsum(cut) - 1  # unique session id within partition
    key_start = np.maximum.accumulate(np.where(new_key, np.arange(n), 0))
    ordinal = sid_global - sid_global[key_start]

    if not netml:
        return np.ones(n, dtype=bool), ordinal

    # key sizes (pre-split filter)
    starts = np.flatnonzero(new_key)
    sizes = np.diff(np.r_[starts, n])
    key_size = np.repeat(sizes, sizes)
    keep = key_size >= max(2, min_rows)

    # trailing-session discard for keys that split
    max_ord = np.zeros(len(starts), dtype=np.int64)
    np.maximum.at(max_ord, np.repeat(np.arange(len(starts)), sizes), ordinal)
    key_idx = np.repeat(np.arange(len(starts)), sizes)
    split_key = max_ord > 0
    keep &= ~(split_key[key_idx] & (ordinal == max_ord[key_idx]))

    # post-split min-rows filter (raw threshold)
    sess_counts = np.bincount(sid_global, weights=keep.astype(np.int64), minlength=sid_global[-1] + 1)
    keep &= sess_counts[sid_global] >= min_rows

    return keep, ordinal


# ---------------------------------------------------------------------------
# G4: interval split with grid-aligned nominal starts (ref: parser.py:209-299)
# ---------------------------------------------------------------------------

def interval_split(
    seg_codes: np.ndarray,
    ts: np.ndarray,
    interval: float,
    *,
    min_rows: int = 2,
) -> tuple[np.ndarray, np.ndarray]:
    """Split (key, session) segments into subflows by ``interval``.

    Replicates parser.py:209-299 exactly, including the quirk that a new
    subflow's first element carries a *nominal* grid-aligned start time
    (parser.py:258-261) which the next gap test compares against, the
    trailing-subflow discard (parser.py:278-283), and the
    ``max(2, min_rows)`` post filter (parser.py:288-292).

    The scan is sequential in the reference; here the inner loop is over
    *splits* (output-proportional), with the common within-subflow scan
    answered by a precomputed ``diff > interval`` index.

    Returns ``(keep_mask, sub_ordinal)``.
    """
    n = len(ts)
    keep = np.zeros(n, dtype=bool)
    sub = np.zeros(n, dtype=np.int64)
    if n == 0:
        return keep, sub

    starts = segment_starts(seg_codes)
    ends = np.r_[starts[1:], n]
    diff = np.empty(n, dtype=np.float64)
    diff[0] = 0.0
    diff[1:] = ts[1:] - ts[:-1]
    # indices i (>0) with ts[i] - ts[i-1] > interval, for fast next-cut lookup
    cut_idx = np.flatnonzero(diff > interval)

    for s, e in zip(starts, ends):
        seg_n = e - s
        if seg_n == 1:
            # single row: never splits; kept iff min threshold allows
            if seg_n >= max(2, min_rows):  # pragma: no cover (always false)
                keep[s:e] = True
            continue
        # fast path: no internal gap > interval → no split, whole segment kept
        j = np.searchsorted(cut_idx, s + 1)
        if j >= len(cut_idx) or cut_idx[j] >= e:
            if seg_n >= max(2, min_rows):
                keep[s:e] = True
            continue
        # slow path: sequential subflow scan, iterating over cut points
        start = ts[s]          # nominal grid start (parser.py:248,258)
        i0 = s                 # first row of the open subflow
        stored0 = ts[s]        # stored time of the open subflow's first element
        ordv = 0
        closed: list[int] = []  # ordinals of emitted (closed) subflows
        i = s + 1
        while i < e:
            prev_stored = stored0 if i == i0 + 1 else ts[i - 1]
            if ts[i] - prev_stored > interval:
                closed.append(ordv)
                start += int((ts[i] - start) // interval) * interval
                ordv += 1
                sub[i:e] = ordv  # provisional; later cuts overwrite
                i0 = i
                stored0 = start
                i += 1
            else:
                # within-subflow: jump to the next raw-diff cut candidate
                j = np.searchsorted(cut_idx, i + 1)
                nxt = cut_idx[j] if j < len(cut_idx) and cut_idx[j] < e else e
                i = nxt
        # trailing open subflow discarded (split happened on this path)
        kept_ords = np.array(closed, dtype=np.int64)
        seg_sub = sub[s:e]
        counts = np.bincount(seg_sub, minlength=ordv + 1)
        ok = np.zeros(ordv + 1, dtype=bool)
        ok[kept_ords] = True
        ok &= counts >= max(2, min_rows)
        keep[s:e] = ok[seg_sub]

    return keep, sub


# ---------------------------------------------------------------------------
# quantiles (np.quantile 'linear' parity; ref: parser.py:618-621, 783-785)
# ---------------------------------------------------------------------------

def quantile_linear_sorted(a_sorted: np.ndarray, q: float) -> float:
    """np.quantile(..., method='linear') on an already-sorted array."""
    n = len(a_sorted)
    if n == 0:
        raise ValueError("empty")
    pos = (n - 1) * q
    lo = int(np.floor(pos))
    hi = int(np.ceil(pos))
    if lo == hi:
        return float(a_sorted[lo])
    return float(a_sorted[lo] + (pos - lo) * (a_sorted[hi] - a_sorted[lo]))


def segmented_quantiles(
    values: np.ndarray, seg_codes: np.ndarray, qs: tuple[float, ...]
) -> np.ndarray:
    """Per-segment np.quantile('linear') — vectorized across segments.

    Returns array of shape (n_segments, len(qs)).
    """
    n = len(values)
    starts = segment_starts(seg_codes)
    ends = np.r_[starts[1:], n]
    lens = ends - starts
    order = np.lexsort((values, seg_codes))
    sv = values[order]
    out = np.empty((len(starts), len(qs)), dtype=np.float64)
    for qi, q in enumerate(qs):
        pos = (lens - 1) * q
        lo = np.floor(pos).astype(np.int64)
        hi = np.ceil(pos).astype(np.int64)
        frac = pos - lo
        vlo = sv[starts + lo]
        vhi = sv[starts + hi]
        out[:, qi] = vlo + frac * (vhi - vlo)
    return out


# ---------------------------------------------------------------------------
# per-session feature kernels (ref: parser.py:354-469, 472-559)
# ---------------------------------------------------------------------------

def _seg_bounds(seg_codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    starts = segment_starts(seg_codes)
    return starts, np.r_[starts[1:], len(seg_codes)]


def iat_lists(seg_codes: np.ndarray, ts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Inter-arrival deltas per segment (ref: parser.py:354-375).

    Returns (offsets[int64, n_seg+1], values[float64]) — a ragged list.
    """
    starts, ends = _seg_bounds(seg_codes)
    n = len(ts)
    d = np.empty(n, dtype=np.float64)
    d[0] = np.nan
    d[1:] = ts[1:] - ts[:-1]
    mask = np.ones(n, dtype=bool)
    mask[starts] = False  # first row of each segment has no IAT
    values = d[mask]
    lens = (ends - starts) - 1
    offsets = np.r_[0, np.cumsum(lens)]
    return offsets, values


def size_lists(seg_codes: np.ndarray, sizes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-record sizes per segment (ref: parser.py:378-398)."""
    starts, ends = _seg_bounds(seg_codes)
    lens = ends - starts
    offsets = np.r_[0, np.cumsum(lens)]
    return offsets, sizes.astype(np.float64)


def iat_size_lists(
    seg_codes: np.ndarray, ts: np.ndarray, sizes: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Interleaved [iat0, size0, iat1, size1, ..., size_last]
    (ref: parser.py:401-427).  Length per segment = 2*n-1.
    """
    starts, ends = _seg_bounds(seg_codes)
    lens = ends - starts
    out_lens = 2 * lens - 1
    offsets = np.r_[0, np.cumsum(out_lens)]
    total = int(offsets[-1])
    values = np.empty(total, dtype=np.float64)

    n = len(ts)
    iat = np.empty(n, dtype=np.float64)
    iat[0] = 0.0
    iat[1:] = ts[1:] - ts[:-1]

    seg_ofs = np.repeat(offsets[:-1] - 2 * starts, lens)  # per-row base offset
    pos_in_seg = np.arange(n) * 2 + seg_ofs  # 2*(i - start) + offset
    # sizes go at even slots shifted: size_j at position 2*j+1 except last at 2*j
    is_last = np.zeros(n, dtype=bool)
    is_last[ends - 1] = True
    size_pos = np.where(is_last, pos_in_seg, pos_in_seg + 1)
    values[size_pos] = sizes
    # iats at positions 2*(j-1) for j>=1 → pos_in_seg - 2
    not_first = np.ones(n, dtype=bool)
    not_first[starts] = False
    values[pos_in_seg[not_first] - 2] = iat[not_first]
    return offsets, values


def stats_matrix(
    seg_codes: np.ndarray, ts: np.ndarray, sizes: np.ndarray
) -> np.ndarray:
    """Per-segment 12-vector (ref: parser.py:430-469):
    [duration, pkts_rate, bytes_rate, mean, std(pop), q1, q2, q3,
     min, max, num_pkts, num_bytes]; zero-duration → rates 0.0.
    """
    starts, ends = _seg_bounds(seg_codes)
    lens = (ends - starts).astype(np.float64)
    s = sizes.astype(np.float64)
    duration = ts[ends - 1] - ts[starts]
    num_bytes = np.add.reduceat(s, starts)
    mean = num_bytes / lens
    dev2 = (s - np.repeat(mean, (ends - starts))) ** 2
    std = np.sqrt(np.add.reduceat(dev2, starts) / lens)
    qs = segmented_quantiles(s, seg_codes, (0.25, 0.5, 0.75))
    mn = np.minimum.reduceat(s, starts)
    mx = np.maximum.reduceat(s, starts)
    with np.errstate(divide="ignore", invalid="ignore"):
        pkts_rate = np.where(duration == 0, 0.0, lens / duration)
        bytes_rate = np.where(duration == 0, 0.0, num_bytes / duration)
    return np.column_stack(
        [duration, pkts_rate, bytes_rate, mean, std, qs[:, 0], qs[:, 1], qs[:, 2], mn, mx, lens, num_bytes]
    )


def samp_lists(
    seg_codes: np.ndarray,
    ts: np.ndarray,
    sizes: np.ndarray | None,
    rate: float,
) -> tuple[np.ndarray, np.ndarray]:
    """SAMP_NUM (sizes=None) / SAMP_SIZE per segment (ref: parser.py:472-559).

    Semantics replicated from the reference's sequential scan:
    bin ``k`` covers ``(t0 + k*rate, t0 + (k+1)*rate]`` (left-open,
    right-closed, with t0 itself in bin 0); skipped bins are zero-filled;
    if the emitted vector would exceed 500 elements the scan stops and
    the vector is truncated to 500 with no trailing partial bin
    (parser.py:533-542); otherwise the trailing bin is appended iff its
    accumulated value is > 0 (parser.py:549-550).
    """
    # The reference's bin boundaries come from the *incremental* float
    # state ``current`` (current += rate; current += m*rate), which a
    # closed-form floor((t - t0)/rate) formula cannot replicate bit-for-
    # bit (e.g. (a+300)-a ≠ 300.0 in float64 — found by the hypothesis
    # property tests).  So the kernel walks *emitted bins* (≤ 501 per
    # session thanks to the cap, parser.py:538-542): rows within a bin
    # are consumed in bulk via searchsorted + an exact-expression
    # boundary fix-up, and sizes via a prefix sum — per-session cost is
    # O(bins · log n), not O(rows).
    starts, ends = _seg_bounds(seg_codes)
    n_seg = len(starts)
    w = np.ones(len(ts), dtype=np.float64) if sizes is None else sizes.astype(np.float64)
    cw = np.r_[0.0, np.cumsum(w)]

    out_vals: list[np.ndarray] = []
    out_lens = np.empty(n_seg, dtype=np.int64)
    for k, (s, e) in enumerate(zip(starts, ends)):
        tseg = ts[s:e]
        n = e - s
        feats: list[float] = []
        current = tseg[0]
        binstart = 0
        while True:
            # first row j with tseg[j] - current > rate (exact reference
            # expression; searchsorted gives the candidate, the loops
            # correct ±1-ulp boundary disagreements)
            j = int(np.searchsorted(tseg, current + rate, side="right"))
            j = max(j, binstart + 1)
            while j - 1 > binstart and tseg[j - 1] - current > rate:
                j -= 1
            while j < n and not (tseg[j] - current > rate):
                j += 1
            if j >= n:
                samp = (n - binstart) if sizes is None else (cw[e] - cw[s + binstart])
                if samp > 0:  # trailing bin (parser.py:549-550)
                    feats.append(float(samp))
                break
            samp = (j - binstart) if sizes is None else (cw[s + j] - cw[s + binstart])
            current += rate
            feats.append(float(samp))
            m = int((tseg[j] - current) // rate)  # parser.py:533
            if m > 0:
                m = min(m, SAMP_CAP)
                feats.extend([0.0] * m)
                current += m * rate
            if len(feats) > SAMP_CAP:  # parser.py:538-542
                feats = feats[:SAMP_CAP]
                break
            binstart = j
        v = np.asarray(feats, dtype=np.float64)
        out_vals.append(v)
        out_lens[k] = len(v)
    offsets = np.r_[0, np.cumsum(out_lens)]
    values = np.concatenate(out_vals) if out_vals else np.empty(0, dtype=np.float64)
    return offsets, values


def header_lists(
    seg_codes: np.ndarray,
    cat_codes: np.ndarray,
    sizes: np.ndarray,
    n_cats: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-segment header vector: ``n_cats`` categorical value-counts
    followed by the per-record size series (ragged) — the recast of the
    reference's header features (8 TCP-flag counts + per-packet TTL
    list, parser.py:302-351); callers pad/truncate to ``n_cats + dim``
    exactly as the reference pads to ``8 + dim`` (parser.py:822-828).
    """
    starts, ends = _seg_bounds(seg_codes)
    n_seg = len(starts)
    lens = ends - starts
    seg_idx = np.repeat(np.arange(n_seg), lens)
    counts = np.zeros((n_seg, n_cats), dtype=np.float64)
    np.add.at(counts, (seg_idx, cat_codes), 1.0)
    out_lens = n_cats + lens
    offsets = np.r_[0, np.cumsum(out_lens)]
    values = np.empty(int(offsets[-1]), dtype=np.float64)
    for i, (s, e) in enumerate(zip(starts, ends)):
        o = offsets[i]
        values[o : o + n_cats] = counts[i]
        values[o + n_cats : offsets[i + 1]] = sizes[s:e]
    return offsets, values


def pad_truncate(offsets: np.ndarray, values: np.ndarray, dim: int) -> np.ndarray:
    """Fix ragged rows to width ``dim``: cut or zero-pad (ref: parser.py:818).

    Returns a dense (n_seg, dim) float64 matrix.
    """
    n_seg = len(offsets) - 1
    out = np.zeros((n_seg, dim), dtype=np.float64)
    lens = np.diff(offsets)
    take = np.minimum(lens, dim)
    # flat destination indices
    row = np.repeat(np.arange(n_seg), take)
    col = np.concatenate([np.arange(t) for t in take]) if n_seg else np.empty(0, dtype=np.int64)
    src = np.repeat(offsets[:-1], take) + col
    out[row, col] = values[src]
    return out


def fft_real(mat: np.ndarray, fft_bin: int) -> np.ndarray:
    """np.real(np.fft.fft(v, n=fft_bin)) per row (ref: parser.py:624-652).

    The reference FFTs the raw ragged vector with n=fft_bin; np.fft.fft
    truncates/zero-pads to n first, which equals FFT of the
    pad_truncate(dim=fft_bin) matrix — so callers pass the padded matrix.
    """
    return np.real(np.fft.fft(mat, n=fft_bin, axis=1))


# ---------------------------------------------------------------------------
# lag/lead / rolling windows (north_rule additions; reference analog is the
# lag-1 np.diff in parser.py:371)
# ---------------------------------------------------------------------------

def lag_lead(
    seg_codes: np.ndarray, values: np.ndarray, k: int = 1
) -> tuple[np.ndarray, np.ndarray]:
    """Per-segment lag-k and lead-k with NaN fill at segment edges."""
    n = len(values)
    lag = np.full(n, np.nan)
    lead = np.full(n, np.nan)
    if n > k:
        lag[k:] = values[:-k]
        lead[:-k] = values[k:]
    starts, ends = _seg_bounds(seg_codes)
    for s in starts:
        lag[s : s + k] = np.nan
    for e in ends:
        lead[max(0, e - k) : e] = np.nan
    return lag, lead


def rolling_quantile(
    seg_codes: np.ndarray, values: np.ndarray, window: int, q: float
) -> np.ndarray:
    """Rolling linear-interpolated quantile over the current + window-1
    preceding rows per segment (SQL ``quantile_cont(...) OVER (ROWS
    BETWEEN w-1 PRECEDING AND CURRENT ROW)`` parity).

    Vectorized via a lagged-value matrix + np.nanquantile — O(n·w)."""
    n = len(values)
    mat = np.full((n, window), np.nan)
    starts, ends = _seg_bounds(seg_codes)
    seg_of = np.zeros(n, dtype=np.int64)
    seg_of[starts] = 1
    seg_of = np.cumsum(seg_of) - 1
    pos = np.arange(n) - starts[seg_of]
    for k in range(window):
        ok = pos >= k
        mat[ok, k] = values[np.arange(n)[ok] - k]
    return np.nanquantile(mat, q, axis=1)


def rolling_stats(
    seg_codes: np.ndarray, values: np.ndarray, window: int
) -> dict[str, np.ndarray]:
    """Rolling count/sum/mean/min/max over the current row and the
    ``window - 1`` preceding rows, restarting at segment boundaries.

    Matches SQL ``ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW``.
    Implemented with cumsum differences (sum/mean/count) and a
    monotonic-wedge pass for min/max (O(n) total).
    """
    n = len(values)
    starts, ends = _seg_bounds(seg_codes)
    seg_of = np.zeros(n, dtype=np.int64)
    seg_of[starts] = 1
    seg_of = np.cumsum(seg_of) - 1
    pos = np.arange(n) - starts[seg_of]  # position within segment
    lo = np.maximum(0, pos - (window - 1)) + starts[seg_of]  # window start idx

    cs = np.r_[0.0, np.cumsum(values)]
    idx = np.arange(n)
    cnt = (idx - lo + 1).astype(np.float64)
    sm = cs[idx + 1] - cs[lo]
    mean = sm / cnt

    mn = np.empty(n)
    mx = np.empty(n)
    from collections import deque

    for s, e in zip(starts, ends):
        dq_min: deque[int] = deque()
        dq_max: deque[int] = deque()
        for i in range(s, e):
            w0 = lo[i]
            while dq_min and dq_min[0] < w0:
                dq_min.popleft()
            while dq_max and dq_max[0] < w0:
                dq_max.popleft()
            v = values[i]
            while dq_min and values[dq_min[-1]] >= v:
                dq_min.pop()
            while dq_max and values[dq_max[-1]] <= v:
                dq_max.pop()
            dq_min.append(i)
            dq_max.append(i)
            mn[i] = values[dq_min[0]]
            mx[i] = values[dq_max[0]]

    # population std (SQL stddev_pop window parity), numerically
    # stable: sum of squared deviations AROUND THE WINDOW MEAN via
    # <= window shifted vectorized adds (the E[x^2]-mean^2 shortcut
    # loses ~1e-5 absolute near var=0 when mean^2 >> var).
    if window <= 64:
        smdev = np.zeros(n)
        for k in range(window):
            idxk = idx - k
            valid = idxk >= lo
            d = values[idxk[valid]] - mean[valid]
            smdev[valid] += d * d
        var = smdev / cnt
    else:  # large windows: cumsum shortcut, clamped
        csq = np.r_[0.0, np.cumsum(values * values)]
        var = np.maximum((csq[idx + 1] - csq[lo]) / cnt - mean * mean, 0.0)
    std = np.sqrt(var)
    return {"count": cnt, "sum": sm, "mean": mean, "min": mn, "max": mx,
            "std": std}


def rolling_corr(
    seg_codes: np.ndarray, x: np.ndarray, y: np.ndarray, window: int
) -> np.ndarray:
    """Rolling Pearson correlation of ``(x, y)`` over the current row
    and the ``window - 1`` preceding rows, restarting at segment
    boundaries — SQL ``corr(x, y) OVER (... ROWS BETWEEN window-1
    PRECEDING AND CURRENT ROW)`` parity, NaN where SQL yields NULL
    (fewer than 2 rows in the window, or zero variance on either
    side; corr = covar_samp / (stddev_samp·stddev_samp) =
    sxy / sqrt(sxx·syy), so the (n-1) factors cancel).

    Numerically the deviations are taken AROUND THE WINDOW MEANS via
    <= window shifted vectorized adds (the same cancellation-free
    treatment as ``rolling_stats``'s std) — O(n·window), fine for the
    small feature windows this engine targets.
    """
    n = len(x)
    if n == 0:
        return np.empty(0, dtype=np.float64)
    starts, _ends = _seg_bounds(seg_codes)
    seg_of = np.zeros(n, dtype=np.int64)
    seg_of[starts] = 1
    seg_of = np.cumsum(seg_of) - 1
    pos = np.arange(n) - starts[seg_of]
    lo = np.maximum(0, pos - (window - 1)) + starts[seg_of]
    idx = np.arange(n)
    cnt = (idx - lo + 1).astype(np.float64)
    csx = np.r_[0.0, np.cumsum(x)]
    csy = np.r_[0.0, np.cumsum(y)]
    mx_ = (csx[idx + 1] - csx[lo]) / cnt
    my_ = (csy[idx + 1] - csy[lo]) / cnt
    sxx = np.zeros(n)
    syy = np.zeros(n)
    sxy = np.zeros(n)
    for k in range(window):
        idxk = idx - k
        valid = idxk >= lo
        iv = idxk[valid]
        dx = x[iv] - mx_[valid]
        dy = y[iv] - my_[valid]
        sxx[valid] += dx * dx
        syy[valid] += dy * dy
        sxy[valid] += dx * dy
    out = np.full(n, np.nan)
    ok = (cnt >= 2) & (sxx > 0) & (syy > 0)
    out[ok] = sxy[ok] / np.sqrt(sxx[ok] * syy[ok])
    return out
