"""Distributed sessionization over ray.data.Dataset.

Pipeline shape (ref semantics: parser.py:691-735):

  pass A  partition_map(key) → G3 gap-cut → per-session durations only
          (small output) → exact global quantile → ``interval`` scalar
  pass B  partition_map(key) → G3 + G4 fused (interval broadcast via
          closure capture of a plain float — tiny, shipped once per
          task spec, not per batch) → rows + ``session_id``

Two shuffles of the (narrow) input are the price of the reference's
schema-from-data design: the G4 split interval is a global quantile of
G3 session durations (parser.py:726-729), so no single pass can both
compute it and use it.  ``interval_hint`` skips pass A when the caller
already knows the interval (resume / pre-computed manifest).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from netml_ray import kernels
from netml_ray.partition import partition_map

TS_SEC = "ts_sec"
SESSION = "session_id"


def ts_seconds(t: pa.Table, ts_col: str) -> np.ndarray:
    """timestamp[us] → float64 epoch seconds (µs/1e6), matching the
    oracle's conversion exactly (both do int_us / 1e6)."""
    typ = t[ts_col].type
    if pa.types.is_timestamp(typ):
        us = pc.cast(t[ts_col], pa.int64()).to_numpy()
        return us.astype(np.float64) / 1e6
    return t[ts_col].to_numpy().astype(np.float64)


def with_ts_sec(ds, ts_col: str):
    def _f(t: pa.Table) -> pa.Table:
        if TS_SEC in t.column_names:
            return t
        return t.append_column(TS_SEC, pa.array(ts_seconds(t, ts_col)))

    return ds.map_batches(_f, batch_format="pyarrow")


def _key_codes(t: pa.Table, key: str) -> np.ndarray:
    """Dense int codes for a (sorted) key column via dictionary encode
    (vectorized C path; table must be sorted by key so codes change
    exactly at key boundaries)."""
    enc = pc.dictionary_encode(t[key])
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    return enc.indices.to_numpy().astype(np.int64)


def _per_key_session_ordinal(key_codes: np.ndarray, seg_codes: np.ndarray) -> np.ndarray:
    """Renumber segment codes to a dense 0-based ordinal within key."""
    n = len(key_codes)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    new_seg = np.r_[True, seg_codes[1:] != seg_codes[:-1]]
    seg_dense = np.cumsum(new_seg) - 1
    new_key = np.r_[True, key_codes[1:] != key_codes[:-1]]
    key_start = np.maximum.accumulate(np.where(new_key, np.arange(n), 0))
    return seg_dense - seg_dense[key_start]


def sessionize_simple(
    ds,
    key: str = "url",
    ts_col: str = "warc_ts",
    *,
    gap: float = 600.0,
    tiebreak: str | None = None,
    num_partitions: int | None = None,
):
    """Plain gap-cut sessionization (no netml discard quirks): every row
    kept, ``session_id`` = 0-based session ordinal per key.  This is
    the SQL-window-expressible variant used for oracle checks."""
    ds = with_ts_sec(ds, ts_col)
    sort_by = [key, TS_SEC] + ([tiebreak] if tiebreak else [])

    def _fn(t: pa.Table) -> pa.Table:
        codes = _key_codes(t, key)
        tsf = t[TS_SEC].to_numpy()
        _, ordinal = kernels.gap_sessionize(codes, tsf, gap, netml=False)
        return t.append_column(SESSION, pa.array(ordinal))

    return partition_map(ds, key, _fn, sort_by=sort_by, num_partitions=num_partitions)


def sessionize_netml(
    ds,
    key: str = "url",
    ts_col: str = "warc_ts",
    *,
    gap: float = 600.0,
    min_rows: int = 2,
    tiebreak: str | None = None,
    num_partitions: int | None = None,
):
    """G3 only: gap cut with the reference's pre-filter, trailing-session
    discard and post min-rows filter (parser.py:141-206)."""
    ds = with_ts_sec(ds, ts_col)
    sort_by = [key, TS_SEC] + ([tiebreak] if tiebreak else [])

    def _fn(t: pa.Table) -> pa.Table:
        codes = _key_codes(t, key)
        tsf = t[TS_SEC].to_numpy()
        keep, ordinal = kernels.gap_sessionize(codes, tsf, gap, min_rows=min_rows, netml=True)
        t = t.append_column(SESSION, pa.array(ordinal))
        return t.filter(pa.array(keep))

    return partition_map(ds, key, _fn, sort_by=sort_by, num_partitions=num_partitions)


def _g3_g4_fn(key: str, gap: float, min_rows: int, interval: float):
    """Fused G3+G4 partition kernel; ``interval`` captured by value."""

    def _fn(t: pa.Table) -> pa.Table:
        codes = _key_codes(t, key)
        tsf = t[TS_SEC].to_numpy()
        keep, g3_ord = kernels.gap_sessionize(codes, tsf, gap, min_rows=min_rows, netml=True)
        t = t.filter(pa.array(keep))
        codes = codes[keep]
        g3_ord = g3_ord[keep]
        tsf = tsf[keep]
        seg = kernels.encode_keys(codes, g3_ord)
        keep2, sub = kernels.interval_split(seg, tsf, interval, min_rows=min_rows)
        final_seg = kernels.encode_keys(codes, g3_ord, sub)
        ordinal = _per_key_session_ordinal(codes, final_seg)
        t = t.append_column(SESSION, pa.array(ordinal))
        return t.filter(pa.array(keep2))

    return _fn


def _g3_durations_fn(key: str, gap: float, min_rows: int):
    def _fn(t: pa.Table) -> pa.Table:
        codes = _key_codes(t, key)
        tsf = t[TS_SEC].to_numpy()
        keep, g3_ord = kernels.gap_sessionize(codes, tsf, gap, min_rows=min_rows, netml=True)
        codes = codes[keep]
        g3_ord = g3_ord[keep]
        tsf = tsf[keep]
        seg = kernels.encode_keys(codes, g3_ord)
        starts = kernels.segment_starts(seg)
        ends = np.r_[starts[1:], len(seg)]
        dur = tsf[ends - 1] - tsf[starts] if len(starts) else np.empty(0)
        return pa.table({"duration": pa.array(dur, type=pa.float64())})

    return _fn


def exact_quantiles(ds, col: str, qs: list[float], *, collect_threshold: int = 5_000_000) -> list[float]:
    """Exact np.quantile('linear')-compatible global quantiles.

    Small inputs: collect the column and call np.quantile (bit-identical
    to the reference's parser.py:619).  Large inputs: distributed sort +
    order-statistic pick at floor/ceil((n-1)q), linear-interpolated —
    same result without materializing the column on the driver.
    """
    # single streaming pass: collect up to the threshold; only fall back
    # to the distributed sort path when the column is genuinely huge
    chunks: list[np.ndarray] = []
    total = 0
    overflow = False
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        chunks.append(b[col].to_numpy())
        total += b.num_rows
        if total > collect_threshold:
            overflow = True
            break
    if not overflow:
        if total == 0:
            raise ValueError("quantile of empty dataset")
        vals = np.concatenate(chunks)
        return [float(np.quantile(vals, q=q)) for q in qs]
    # distributed: one sort, then fetch the handful of needed order stats
    n = ds.count()
    needed: set[int] = set()
    for q in qs:
        pos = (n - 1) * q
        needed.add(int(np.floor(pos)))
        needed.add(int(np.ceil(pos)))
    idxs = sorted(needed)
    sorted_ds = ds.sort(col)
    splits = sorted_ds.split_at_indices(idxs)
    stat: dict[int, float] = {}
    for i, part in zip(idxs, splits[1:]):
        row = part.take(1)
        stat[i] = float(row[0][col])
    out = []
    for q in qs:
        pos = (n - 1) * q
        lo, hi = int(np.floor(pos)), int(np.ceil(pos))
        if lo == hi:
            out.append(stat[lo])
        else:
            out.append(stat[lo] + (pos - lo) * (stat[hi] - stat[lo]))
    return out


def exact_quantiles_multi(ds, specs: dict[str, list[float]], *, collect_threshold: int = 5_000_000) -> dict[str, list[float]]:
    """Exact quantiles for several columns in ONE streaming pass
    (falls back to per-column exact_quantiles above the threshold)."""
    chunks: dict[str, list[np.ndarray]] = {c: [] for c in specs}
    total = 0
    overflow = False
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        for c in specs:
            chunks[c].append(b[c].to_numpy())
        total += b.num_rows
        if total > collect_threshold:
            overflow = True
            break
    if overflow:
        return {c: exact_quantiles(ds, c, qs, collect_threshold=collect_threshold)
                for c, qs in specs.items()}
    if total == 0:
        raise ValueError("quantile of empty dataset")
    out = {}
    for c, qs in specs.items():
        vals = np.concatenate(chunks[c])
        out[c] = [float(np.quantile(vals, q=q)) for q in qs]
    return out


def netml_session_pipeline(
    ds,
    key: str = "url",
    ts_col: str = "warc_ts",
    *,
    gap: float = 600.0,
    q_interval: float = 0.9,
    min_rows: int = 2,
    interval_hint: float = 0.0,
    tiebreak: str | None = None,
    num_partitions: int | None = None,
):
    """Full reference pipeline: G3 → interval = q-quantile of G3 session
    durations → G4.  Returns ``(sessions_ds, interval)``; sessions_ds
    rows carry ``session_id`` (dense 0-based per key) and ``ts_sec``.
    """
    ds = with_ts_sec(ds, ts_col)
    sort_by = [key, TS_SEC] + ([tiebreak] if tiebreak else [])

    if interval_hint > 0:
        interval = float(interval_hint)
    else:
        dur_ds = partition_map(
            ds, key, _g3_durations_fn(key, gap, min_rows), sort_by=sort_by, num_partitions=num_partitions
        )
        interval = exact_quantiles(dur_ds, "duration", [q_interval])[0]

    out = partition_map(
        ds,
        key,
        _g3_g4_fn(key, gap, min_rows, interval),
        sort_by=sort_by,
        num_partitions=num_partitions,
    )
    return out, interval
