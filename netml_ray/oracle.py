"""Row-wise single-process oracle of the reference semantics.

This module intentionally mirrors the *sequential* structure of
noise-lab/netml (cited per function) with plain Python loops over
per-key record lists — slow, but unambiguous.  It is the ground truth
the vectorized kernels (``netml_ray.kernels``) and the distributed
pipeline are tested against, playing the role the pcap fixtures play in
the reference's tests (tests/cli_tests/test_learn.py).

A "flow" here is ``(key, times, sizes)`` — the recast of the
reference's ``(fid, [pkt, ...])`` where time = warc_ts epoch seconds
and size = len(html) bytes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

Flow = tuple[object, np.ndarray, np.ndarray]  # (key, times, sizes)


def df_to_flows(df: pd.DataFrame, key: str, ts: str, size: str) -> list[Flow]:
    """Group rows into per-key flows, preserving first-seen key order
    (ref: OrderedDict accumulation, parser.py:112-130)."""
    flows: dict[object, list[tuple[float, float]]] = {}
    for k, t, s in zip(df[key], df[ts], df[size]):
        flows.setdefault(k, []).append((float(t), float(s)))
    out = []
    for k, recs in flows.items():
        recs.sort(key=lambda r: r[0])  # per-flow time sort (parser.py:151)
        out.append((k, np.array([r[0] for r in recs]), np.array([r[1] for r in recs])))
    return out


def gap_sessionize(flows: list[Flow], gap: float, min_rows: int = 2) -> list[Flow]:
    """Timeout split with trailing discard (ref: parser.py:141-206)."""
    new_flows: list[Flow] = []
    for k, times, sizes in flows:
        if len(times) < max(2, min_rows):
            continue  # pre-filter (parser.py:146-147)
        subflows = []
        cur = [0]
        split = False
        for j in range(1, len(times)):
            if times[j] - times[cur[-1]] > gap:  # strictly greater (parser.py:165)
                subflows.append(cur)
                cur = [j]
                split = True
            else:
                cur.append(j)
        if not split:
            subflows.append(cur)  # else: trailing discarded (parser.py:188-193)
        for idxs in subflows:
            new_flows.append((k, times[idxs], sizes[idxs]))
    # post filter: raw threshold (parser.py:197)
    return [(k, t, s) for k, t, s in new_flows if len(t) >= min_rows]


def interval_split(flows: list[Flow], interval: float, min_rows: int = 2) -> list[Flow]:
    """Interval split with nominal grid starts (ref: parser.py:209-299)."""
    new_flows: list[Flow] = []
    for k, times, sizes in flows:
        start = times[0]
        stored = [times[0]]  # stored time per element of the open subflow
        cur = [0]
        subflows = []
        split = False
        for j in range(1, len(times)):
            if times[j] - stored[-1] > interval:
                subflows.append(cur)
                start += int((times[j] - start) // interval) * interval  # parser.py:258
                cur = [j]
                stored = [start]  # nominal start is the stored time (parser.py:261)
                split = True
            else:
                cur.append(j)
                stored.append(times[j])
        if not split:
            subflows.append(cur)  # else trailing discarded (parser.py:278-283)
        for idxs in subflows:
            if len(idxs) < max(2, min_rows):  # parser.py:288-292
                continue
            new_flows.append((k, times[idxs], sizes[idxs]))
    return new_flows


def flow_durations(flows: list[Flow]) -> np.ndarray:
    return np.array([t.max() - t.min() for _, t, _ in flows])


def split_interval(durations: np.ndarray, q: float) -> float:
    """interval = np.quantile(durations, q) (ref: parser.py:618-621)."""
    return float(np.quantile(durations, q=q))


def netml_sessionize(
    df: pd.DataFrame,
    key: str,
    ts: str,
    size: str,
    *,
    gap: float = 600.0,
    q_interval: float = 0.9,
    min_rows: int = 2,
    interval: float = 0.0,
) -> tuple[list[Flow], float]:
    """Full reference session pipeline (ref: parser.py:691-735):
    gap split → interval = q-quantile of durations → interval split."""
    flows = gap_sessionize(df_to_flows(df, key, ts, size), gap, min_rows)
    if interval <= 0:
        interval = split_interval(flow_durations(flows), q_interval)
    return interval_split(flows, interval, min_rows), interval


# --- feature extractors (ref: parser.py:354-559) ---------------------------

def feat_iat(flows: list[Flow]) -> list[list[float]]:
    return [list(np.diff(t)) for _, t, _ in flows]


def feat_size(flows: list[Flow]) -> list[list[float]]:
    return [list(s) for _, _, s in flows]


def feat_iat_size(flows: list[Flow]) -> list[list[float]]:
    out = []
    for _, t, s in flows:
        iats = list(np.diff(t))
        v = []
        for j in range(len(iats)):
            v.extend([iats[j], s[j]])
        v.append(s[-1])
        out.append(v)
    return out


def feat_stats(flows: list[Flow]) -> list[list[float]]:
    out = []
    for _, t, s in flows:
        dur = t.max() - t.min()
        num = len(s)
        tot = float(np.sum(s))
        if dur == 0:
            pr, br = 0.0, 0.0
        else:
            pr, br = num / dur, tot / dur
        q1, q2, q3 = np.quantile(s, q=[0.25, 0.5, 0.75])
        out.append(
            [dur, pr, br, float(np.mean(s)), float(np.std(s)), q1, q2, q3,
             float(np.min(s)), float(np.max(s)), num, tot]
        )
    return out


def feat_samp(flows: list[Flow], rate: float, kind: str = "SAMP_NUM") -> list[list[float]]:
    """Sequential SAMP scan, faithful to parser.py:472-559."""
    out = []
    for _, times, sizes in flows:
        feats: list[float] = []
        samp = -1.0
        for i in range(len(times)):
            if i == 0:
                current = times[0]
                samp = 1.0 if kind == "SAMP_NUM" else float(sizes[0])
                continue
            if times[i] - current <= rate:
                samp += 1.0 if kind == "SAMP_NUM" else float(sizes[i])
            else:
                current += rate
                feats.append(samp)
                num_intervals = int(np.floor((times[i] - current) // rate))
                if num_intervals > 0:
                    num_intervals = min(num_intervals, 500)
                    feats.extend([0.0] * num_intervals)
                    current += num_intervals * rate
                if len(feats) > 500:
                    samp = -1.0
                    feats = feats[:500]
                    break
                samp = 1.0 if kind == "SAMP_NUM" else float(sizes[i])
        if samp > 0:
            feats.append(samp)
        out.append(feats)
    return out


def pad_truncate(features: list[list[float]], dim: int) -> np.ndarray:
    """ref: parser.py:818"""
    fixed = [v[:dim] if len(v) > dim else list(v) + [0] * (dim - len(v)) for v in features]
    return np.asarray(fixed, dtype=float)


def fft_features(features: list[list[float]], fft_bin: int) -> np.ndarray:
    """ref: parser.py:624-652"""
    return np.asarray([list(np.real(np.fft.fft(v, n=fft_bin))) for v in features])


def flows2features(
    flows: list[Flow], feat_type: str, q_interval: float, *, fft: bool = False
) -> tuple[np.ndarray, list, int]:
    """Feature dispatch with data-dependent dims (ref: parser.py:762-834).

    Returns (matrix, keys, dim).
    """
    num = [len(t) for _, t, _ in flows]
    dim = int(np.floor(np.quantile(num, q_interval)))
    if feat_type == "IAT":
        d, feats = dim - 1, feat_iat(flows)
    elif feat_type == "SIZE":
        d, feats = dim, feat_size(flows)
    elif feat_type == "IAT_SIZE":
        d, feats = 2 * dim - 1, feat_iat_size(flows)
    elif feat_type == "STATS":
        d, feats = 12, feat_stats(flows)
    elif feat_type in ("SAMP_NUM", "SAMP_SIZE"):
        d = dim - 1
        rate = split_interval(flow_durations(flows), 0.3)  # parser.py:801-808
        feats = feat_samp(flows, rate, feat_type)
    else:
        raise ValueError(feat_type)
    if fft:
        mat = fft_features(feats, d)
    else:
        mat = pad_truncate(feats, d)
    keys = [k for k, _, _ in flows]
    return mat, keys, d


# --- as-of ground truth ----------------------------------------------------

def asof_expected(
    left: pd.DataFrame,
    right: pd.DataFrame,
    key: str,
    lts: str,
    rts: str,
    *,
    strict: bool = False,
) -> list[int | None]:
    """For each left row, the index of the matching right row: the one
    with the greatest ``rts`` ≤ (or < when strict) the left ts for the
    same key; ties on rts broken by greatest position (pandas
    merge_asof semantics).  O(n*m) scan — oracle only."""
    out = []
    for _, lrow in left.iterrows():
        best = None
        for ridx, rrow in right.iterrows():
            if rrow[key] != lrow[key]:
                continue
            if (rrow[rts] < lrow[lts]) or (not strict and rrow[rts] == lrow[lts]):
                if best is None or (rrow[rts], ridx) >= (right.loc[best, rts], best):
                    best = ridx
        out.append(best)
    return out
