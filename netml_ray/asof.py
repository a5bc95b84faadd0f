"""Point-in-time (backward as-of) join — the engine's J3 operator.

Attaches, to every left row ``(key, ts)``, the right row with the
greatest ``right_ts`` ≤ left ts (or < when ``strict=True``) for the
same key — zero temporal leakage by construction.  Ties on ``right_ts``
within a key resolve to the *last* such right row under the
deterministic partition sort — pandas merge_asof semantics, mirrored in
the row-wise oracle (netml_ray.oracle.asof_expected).

Implementation: co-partition both sides by ``hash(key) % P`` (one
shuffle over the union), per-partition sort by (key, ts), then a pure
numpy ``searchsorted`` per key segment and a single Arrow ``take`` —
no pandas conversion, list/nested right columns stay zero-copy Arrow.
The reference's nearest analog is the last-value-wins label lookup
(parser.py:900-918); there is no distributed as-of join to port — this
operator is new, designed Ray-Data-first per SURVEY.md §2.5 J3.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from netml_ray.partition import partition_map2
from netml_ray.kernels import segment_starts


def _num_or_ts(col: pa.ChunkedArray) -> np.ndarray:
    typ = col.type
    if pa.types.is_timestamp(typ):
        return pc.cast(col, pa.int64()).to_numpy()
    return col.to_numpy()


def asof_match_indices(
    lkeys, lts: np.ndarray, rkeys, rts: np.ndarray, strict: bool
) -> np.ndarray:
    """Per-key backward as-of match: for each left row, the index of the
    last right row with rts ≤ (or <) lts and equal key; -1 = no match.
    Both sides must be sorted by (key, ts).  ``lkeys``/``rkeys`` are
    numpy arrays (dictionary codes in the hot path; any comparable
    values work).  Python work is per key *segment*, numpy per row."""
    lkeys = np.asarray(lkeys)
    rkeys = np.asarray(rkeys)
    n = len(lts)
    out = np.full(n, -1, dtype=np.int64)
    if n == 0 or len(rts) == 0:
        return out
    r_starts = segment_starts(rkeys)
    r_ends = np.r_[r_starts[1:], len(rkeys)]
    rmap = {rkeys[s]: (s, e) for s, e in zip(r_starts, r_ends)}
    l_starts = segment_starts(lkeys)
    l_ends = np.r_[l_starts[1:], n]
    side = "left" if strict else "right"
    for s, e in zip(l_starts, l_ends):
        seg = rmap.get(lkeys[s])
        if seg is None:
            continue
        rs, re_ = seg
        pos = np.searchsorted(rts[rs:re_], lts[s:e], side=side) - 1
        idx = np.where(pos >= 0, pos + rs, -1)
        out[s:e] = idx
    return out


def asof_match_indices_forward(
    lkeys, lts: np.ndarray, rkeys, rts: np.ndarray, strict: bool
) -> np.ndarray:
    """Per-key FORWARD as-of match: for each left row, the index of the
    first right row with rts ≥ (or >) lts and equal key; -1 = no
    match.  The mirror of :func:`asof_match_indices` — same sorted
    inputs, same per-segment searchsorted shape."""
    lkeys = np.asarray(lkeys)
    rkeys = np.asarray(rkeys)
    n = len(lts)
    out = np.full(n, -1, dtype=np.int64)
    if n == 0 or len(rts) == 0:
        return out
    r_starts = segment_starts(rkeys)
    r_ends = np.r_[r_starts[1:], len(rkeys)]
    rmap = {rkeys[s]: (s, e) for s, e in zip(r_starts, r_ends)}
    l_starts = segment_starts(lkeys)
    l_ends = np.r_[l_starts[1:], n]
    side = "right" if strict else "left"
    for s, e in zip(l_starts, l_ends):
        seg = rmap.get(lkeys[s])
        if seg is None:
            continue
        rs, re_ = seg
        pos = np.searchsorted(rts[rs:re_], lts[s:e], side=side)
        out[s:e] = np.where(pos < (re_ - rs), pos + rs, -1)
    return out


def asof_join(
    left,
    right,
    key: str,
    left_ts: str,
    right_ts: str,
    *,
    strict: bool = False,
    tolerance: float | None = None,
    direction: str = "backward",
    right_cols: list[str] | None = None,
    suffix: str = "_state",
    left_tiebreak: str | None = None,
    num_partitions: int | None = None,
):
    """As-of join of two Datasets (see module docstring).

    Unmatched left rows keep nulls in the attached columns — filter
    afterwards for inner semantics.  ``tolerance`` (pandas merge_asof
    parity): a match further than ``tolerance`` away is treated as no
    match (attached columns null).  Units are the ts columns' NATIVE
    units — MICROSECONDS for timestamp columns, raw values for
    numerics.  ``direction`` (pandas merge_asof parity): 'backward'
    (default — latest right at or before), 'forward' (earliest right
    at or after), 'nearest' (smaller absolute gap wins; EXACT tie →
    backward, documented since pandas leaves it unspecified);
    ``strict=True`` excludes exact-timestamp matches from either side
    (allow_exact_matches=False)."""
    if tolerance is not None and tolerance < 0:
        raise ValueError("tolerance must be non-negative")
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest,"
                         f" got {direction!r}")

    def _fn(lt: pa.Table, rt: pa.Table) -> pa.Table:
        # ONE dictionary encode over both key columns → int codes whose
        # equality matches string equality across sides; all downstream
        # work is numpy (no to_pylist, no per-row Python)
        nl = lt.num_rows
        combo = pa.chunked_array(
            list(lt[key].chunks) + list(rt[key].chunks), type=lt[key].type
        )
        enc = pc.dictionary_encode(combo)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy().astype(np.int64)
        lkeys, rkeys = codes[:nl], codes[nl:]
        ltsv = _num_or_ts(lt[left_ts]).astype(np.float64)
        rtsv = _num_or_ts(rt[right_ts]).astype(np.float64)

        def _with_tol(idx: np.ndarray, fwd: bool) -> np.ndarray:
            if tolerance is None or not len(idx):
                return idx
            ok = idx >= 0
            far = np.zeros(len(idx), dtype=bool)
            gap = (rtsv[idx[ok]] - ltsv[ok]) if fwd \
                else (ltsv[ok] - rtsv[idx[ok]])
            far[ok] = gap > tolerance
            return np.where(far, -1, idx)

        if direction == "backward":
            idx = _with_tol(
                asof_match_indices(lkeys, ltsv, rkeys, rtsv, strict),
                fwd=False)
        elif direction == "forward":
            idx = _with_tol(
                asof_match_indices_forward(lkeys, ltsv, rkeys, rtsv,
                                           strict), fwd=True)
        else:
            b = _with_tol(
                asof_match_indices(lkeys, ltsv, rkeys, rtsv, strict),
                fwd=False)
            f = _with_tol(
                asof_match_indices_forward(lkeys, ltsv, rkeys, rtsv,
                                           strict), fwd=True)
            bg = np.where(b >= 0, ltsv - rtsv[np.maximum(b, 0)], np.inf)
            fg = np.where(f >= 0, rtsv[np.maximum(f, 0)] - ltsv, np.inf)
            # tie → backward (bg <= fg keeps the backward match)
            idx = np.where(bg <= fg, b, f)
            idx = np.where((b < 0) & (f < 0), -1, idx)
        mask = idx < 0
        take_idx = pa.array(np.where(mask, 0, idx), mask=mask)
        keep = right_cols if right_cols is not None else [c for c in rt.column_names if c != key]
        if right_ts not in keep:
            keep = [right_ts] + list(keep)
        out = lt
        for c in keep:
            name = c + suffix if c in lt.column_names else c
            out = out.append_column(name, pc.take(rt[c], take_idx))
        return out

    return partition_map2(
        left,
        right,
        key,
        _fn,
        num_partitions=num_partitions,
        sort_left=[key, left_ts] + ([left_tiebreak] if left_tiebreak else []),
        sort_right=[key, right_ts],
    )
