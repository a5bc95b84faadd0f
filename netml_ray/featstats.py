"""Distributional / statistical feature operators.

The round-5 feature-engineering additions a training-data pipeline
wants once the basic keyed moments exist: time-decayed aggregates
(feature-store freshness weighting), contingency chi-squared,
Benford first-digit audit, per-key burstiness (Fano factor),
per-key Gini concentration, Zipf rank-frequency slope, and
winsorized (quantile-clipped) statistics.

Scale shapes (north_rule: same job on N and 4N nodes):

- ``decayed_agg`` / ``burstiness``: per-batch pre-aggregated partials
  (one row per key present per batch) through ONE ``partition_map``
  hash exchange — the shuffle moves partial rows, never events.
- ``chi2_independence`` / ``benford_digits`` / ``zipf_slope``: narrow
  count partials, driver reduce over O(categories) rows — no shuffle.
- ``gini``: needs every key's values sorted in one place; rides the
  keyed hash exchange and documents the bounded-group assumption
  (same contract as the sessionizer: P sized so the largest key fits
  a worker).

All recast netml's per-flow distributional features (reference
parser.py STATS family, src/netml/pparser/parser.py:307-330) as
corpus-scale keyed statistics.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "decayed_agg", "chi2_independence", "benford_digits",
    "burstiness", "changepoint", "circular_daytime",
    "cusum_stat", "gini", "group_ecdf", "runs_test",
    "kaplan_meier", "kendall_tau", "mann_kendall",
    "rfm_segment", "spearman_corr", "theil_sen",
    "trend_slope", "zipf_slope",
    "winsorized_group_stats", "traffic_matrix", "weighted_median",
    "hhi_concentration", "period_growth", "cond_entropy",
    "leadlag_corr", "cramers_v", "ks_test", "anova_f",
]


# ---------------------------------------------------------------------------
# time-decayed aggregates
# ---------------------------------------------------------------------------

def max_timestamp(ds, ts_col: str) -> float:
    """Global max of a timestamp column in epoch seconds — one narrow
    partial pass (one float per batch), no shuffle."""

    def _p(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({"m": pa.array([], type=pa.float64())})
        v = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"m": pa.array([float(v.max()) / 1e6])})

    best = -np.inf
    for r in ds.map_batches(_p, batch_format="pyarrow").take_all():
        best = max(best, r["m"])
    if not np.isfinite(best):
        raise ValueError("max_timestamp of empty dataset")
    return best


def decayed_agg(ds, key_col: str, ts_col: str, val_col: str, *,
                half_life_s: float, t_ref: float | None = None,
                round_to: int | None = 9):
    """Exponentially time-decayed sum / count / mean per key, decayed
    to ``t_ref`` (default: the global max timestamp): each event
    contributes ``value * 0.5 ** ((t_ref - ts) / half_life_s)``.

    The feature-store staple ("how active was this url, weighted
    toward now") netml approximates with fixed windows; the decay
    form needs no window boundary and composes in one pass: per-batch
    per-key partial (wsum, wn) rows → ONE pre-aggregated hash
    exchange → vectorized finalize.  Exact associativity: the decay
    weight is computed per event against the fixed ``t_ref``, so
    partial sums commute."""
    from .partition import partition_map

    if t_ref is None:
        t_ref = max_timestamp(ds, ts_col)

    def _partial(t: pa.Table) -> pa.Table:
        empty = pa.table({key_col: pa.array([], type=t[key_col].type),
                          "ws": pa.array([], type=pa.float64()),
                          "wn": pa.array([], type=pa.float64())})
        if not t.num_rows:
            return empty
        enc = pc.dictionary_encode(t[key_col].combine_chunks())
        codes = enc.indices.to_numpy(zero_copy_only=False)
        k = len(enc.dictionary)
        ts = t[ts_col].cast(pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.float64) / 1e6
        w = np.power(0.5, (t_ref - ts) / half_life_s)
        v = t[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            key_col: enc.dictionary,
            "ws": pa.array(np.bincount(codes, weights=w * v, minlength=k)),
            "wn": pa.array(np.bincount(codes, weights=w, minlength=k)),
        })

    def _fin(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({key_col: t[key_col],
                             "decayed_sum": pa.array([], type=pa.float64()),
                             "decayed_n": pa.array([], type=pa.float64()),
                             "decayed_mean": pa.array([], type=pa.float64())})
        agg = (t.group_by([key_col])
               .aggregate([("ws", "sum"), ("wn", "sum")]))
        ws = agg["ws_sum"].to_numpy()
        wn = agg["wn_sum"].to_numpy()
        mean = np.divide(ws, wn, out=np.full_like(ws, np.nan), where=wn > 0)
        if round_to is not None:
            ws, wn = np.round(ws, round_to), np.round(wn, round_to)
            mean = np.round(mean, round_to)
        return pa.table({key_col: agg[key_col],
                         "decayed_sum": pa.array(ws),
                         "decayed_n": pa.array(wn),
                         "decayed_mean": pa.array(mean)})

    return partition_map(
        ds.map_batches(_partial, batch_format="pyarrow"), key_col, _fin)


# ---------------------------------------------------------------------------
# contingency chi-squared
# ---------------------------------------------------------------------------

def chi2_independence(ds, xcol: str, ycol: str,
                      *, round_to: int | None = 9) -> pa.Table:
    """Pearson chi-squared statistic of independence for two
    categoricals: ``sum((O - E)^2 / E)`` over the contingency table,
    ``E = row_total * col_total / n``.  Narrow (x, y, n) count
    partials, driver reduce over O(|X|·|Y|) distinct pairs — the
    feature-selection screen companion to ``mutual_information``.

    Returns a one-row table ``(chi2, dof, n)``."""
    obs, xs, ys = _contingency(ds, xcol, ycol)
    n = obs.sum()
    exp = obs.sum(axis=1, keepdims=True) * obs.sum(axis=0, keepdims=True) / n
    chi2 = float(((obs - exp) ** 2 / exp).sum())
    dof = (len(xs) - 1) * (len(ys) - 1)
    if round_to is not None:
        chi2 = round(chi2, round_to)
    return pa.table({"chi2": pa.array([chi2]),
                     "dof": pa.array([dof], type=pa.int64()),
                     "n": pa.array([int(n)], type=pa.int64())})


def cramers_v(ds, xcol: str, ycol: str, *,
              round_to: int = 9) -> pa.Table:
    """Cramér's V — the [0, 1]-normalized effect size of the chi²
    independence test: V = √(χ² / (n · min(r−1, c−1))), comparable
    ACROSS tables where raw χ² is not.  Same narrow contingency fold
    as :func:`chi2_independence`; a degenerate table (single row or
    column) emits a typed NULL V (rule stated in SQL).  Returns one
    row ``(chi2, dof, n, cramers_v)``."""
    obs, xs, ys = _contingency(ds, xcol, ycol)
    n = obs.sum()
    exp = obs.sum(axis=1, keepdims=True) * obs.sum(axis=0, keepdims=True) / n
    chi2 = float(((obs - exp) ** 2 / exp).sum())
    dof = (len(xs) - 1) * (len(ys) - 1)
    mindof = min(len(xs) - 1, len(ys) - 1)
    v = None if mindof == 0 else round(
        float(np.sqrt(chi2 / (n * mindof))), round_to)
    return pa.table({"chi2": pa.array([round(chi2, round_to)]),
                     "dof": pa.array([dof], type=pa.int64()),
                     "n": pa.array([int(n)], type=pa.int64()),
                     "cramers_v": pa.array([v], pa.float64())})


def _contingency(ds, xcol: str, ycol: str):
    """Shared narrow contingency fold: per-batch (x, y, n) group-by
    partials, driver O(|X|·|Y|) dense matrix.  Returns
    ``(obs, xs, ys)`` with xs/ys sorted."""

    def _p(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({"x": pa.array([], type=pa.string()),
                             "y": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        g = (t.select([xcol, ycol]).group_by([xcol, ycol])
             .aggregate([([], "count_all")]))
        return g.rename_columns(["x", "y", "n"])

    agg: dict = {}
    for r in ds.map_batches(_p, batch_format="pyarrow").take_all():
        k = (r["x"], r["y"])
        agg[k] = agg.get(k, 0) + r["n"]

    xs = sorted({k[0] for k in agg})
    ys = sorted({k[1] for k in agg})
    obs = np.zeros((len(xs), len(ys)))
    xi = {v: i for i, v in enumerate(xs)}
    yi = {v: i for i, v in enumerate(ys)}
    for (x, y), n in agg.items():
        obs[xi[x], yi[y]] = n
    return obs, xs, ys


# ---------------------------------------------------------------------------
# Benford first-digit audit
# ---------------------------------------------------------------------------

def benford_digits(ds, col: str, *, round_to: int | None = 9) -> pa.Table:
    """First-significant-digit distribution of a positive numeric
    column vs Benford's law: 9 rows ``(digit, n, p_obs, p_benford,
    chi2_component)``.  The classic data-quality / fraud screen.
    Narrow per-batch digit histograms (9 ints per batch), driver sum.

    First digit via the same float formula the SQL oracle uses —
    ``floor(x / 10 ** floor(log10(x)))`` — and BOTH sides then keep
    only digits in 1..9, so the rare float-log boundary value (e.g.
    999.9999999999999 normalizing to digit 0 or 10) is dropped by the
    identical rule on each side rather than patched on one."""

    def _p(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({"digit": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[v > 0]
        if not len(v):
            return pa.table({"digit": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        e = np.floor(np.log10(v))
        d = np.floor(v / np.power(10.0, e)).astype(np.int64)
        d = d[(d >= 1) & (d <= 9)]
        return pa.table({"digit": pa.array(np.arange(1, 10)),
                         "n": pa.array(np.bincount(d, minlength=10)[1:10]
                                       .astype(np.int64))})

    counts = np.zeros(10, dtype=np.int64)
    for r in ds.map_batches(_p, batch_format="pyarrow").take_all():
        counts[r["digit"]] += r["n"]
    n = counts[1:10]
    tot = int(n.sum())
    p_obs = n / tot
    digits = np.arange(1, 10)
    p_ben = np.log10(1.0 + 1.0 / digits)
    chi2 = (p_obs - p_ben) ** 2 / p_ben * tot
    if round_to is not None:
        p_obs, p_ben = np.round(p_obs, round_to), np.round(p_ben, round_to)
        chi2 = np.round(chi2, round_to)
    return pa.table({"digit": pa.array(digits.astype(np.int64)),
                     "n": pa.array(n),
                     "p_obs": pa.array(p_obs),
                     "p_benford": pa.array(p_ben),
                     "chi2_component": pa.array(chi2)})


# ---------------------------------------------------------------------------
# burstiness (Fano factor over time buckets)
# ---------------------------------------------------------------------------

def burstiness(ds, key_col: str, ts_col: str, *, bucket_s: float,
               round_to: int | None = 9):
    """Per-key burstiness of event arrivals over fixed time buckets:
    count events per ``(key, floor(ts / bucket_s))``, then per key the
    Fano factor ``var_pop / mean`` and the Goh–Barabási burstiness
    index ``(sigma - mu) / (sigma + mu)`` over the key's NON-EMPTY
    buckets.  Poisson arrivals → Fano ≈ 1; bursty crawl/bot traffic
    → Fano >> 1.  One (key, bucket, n) partial pass, ONE hash
    exchange of pre-aggregated rows, vectorized per-run reduce."""
    from .mlprep import _run_bounds
    from .partition import partition_map

    def _p(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({key_col: pa.array([], type=t[key_col].type),
                             "b": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        ts = t[ts_col].cast(pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.float64) / 1e6
        b = np.floor(ts / bucket_s).astype(np.int64)
        tt = pa.table({key_col: t[key_col], "b": pa.array(b)})
        return (tt.group_by([key_col, "b"])
                .aggregate([([], "count_all")])
                .rename_columns([key_col, "b", "n"]))

    def _fin(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            f = pa.array([], type=pa.float64())
            return pa.table({key_col: t[key_col], "n_buckets": pa.array(
                [], type=pa.int64()), "fano": f, "burstiness": f})
        agg = (t.group_by([key_col, "b"]).aggregate([("n", "sum")])
               .sort_by([(key_col, "ascending"), ("b", "ascending")]))
        starts, run_id = _run_bounds(agg[key_col].combine_chunks())
        n = agg["n_sum"].to_numpy().astype(np.float64)
        cnt = np.bincount(run_id).astype(np.float64)
        mu = np.bincount(run_id, weights=n) / cnt
        m2 = np.bincount(run_id, weights=n * n) / cnt - mu * mu
        m2 = np.maximum(m2, 0.0)  # fp guard
        sigma = np.sqrt(m2)
        fano = np.divide(m2, mu, out=np.full_like(mu, np.nan),
                         where=mu > 0)
        bidx = np.divide(sigma - mu, sigma + mu,
                         out=np.full_like(mu, np.nan),
                         where=(sigma + mu) > 0)
        if round_to is not None:
            fano, bidx = np.round(fano, round_to), np.round(bidx, round_to)
        return pa.table({
            key_col: agg[key_col].combine_chunks().take(pa.array(starts)),
            "n_buckets": pa.array(cnt.astype(np.int64)),
            "fano": pa.array(fano),
            "burstiness": pa.array(bidx)})

    return partition_map(ds.map_batches(_p, batch_format="pyarrow"),
                         key_col, _fin, sort_by=[key_col, "b"])


# ---------------------------------------------------------------------------
# Gini concentration
# ---------------------------------------------------------------------------

def gini(ds, key_col: str, val_col: str, *,
         round_to: int | None = 9):
    """Per-key Gini coefficient of a non-negative value column:
    ``G = 2 * sum(i * x_(i)) / (n * sum(x)) - (n + 1) / n`` with
    ``x`` ascending, ``i`` 1-based.  The concentration feature
    (inequality of bytes per url, spend per user).

    Needs each key's values sorted together → rides the keyed hash
    exchange with a partition-local sort; assumes the bounded-group
    contract (largest key fits a worker — the sessionizer's
    assumption).  Vectorized across all keys in a partition via one
    lexsort + segmented cumulative ranks."""
    from .mlprep import _run_bounds
    from .partition import partition_map

    def _fin(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({key_col: t[key_col],
                             "n": pa.array([], type=pa.int64()),
                             "gini": pa.array([], type=pa.float64())})
        starts, run_id = _run_bounds(t[key_col].combine_chunks())
        x = t[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        n = np.bincount(run_id).astype(np.float64)
        # 1-based rank within each run (input sorted by key, val)
        idx = np.arange(len(x), dtype=np.float64)
        i = idx - idx[starts][run_id] + 1.0
        sx = np.bincount(run_id, weights=x)
        six = np.bincount(run_id, weights=i * x)
        g = np.where(sx > 0, 2.0 * six / (n * sx) - (n + 1.0) / n, 0.0)
        if round_to is not None:
            g = np.round(g, round_to)
        return pa.table({
            key_col: t[key_col].combine_chunks().take(pa.array(starts)),
            "n": pa.array(n.astype(np.int64)),
            "gini": pa.array(g)})

    return partition_map(ds, key_col, _fin, sort_by=[key_col, val_col])


# ---------------------------------------------------------------------------
# Zipf rank-frequency slope
# ---------------------------------------------------------------------------

def zipf_slope(ds, text_col: str = "text", *, top_n: int = 200,
               round_to: int | None = 9) -> pa.Table:
    """OLS slope/intercept of ``ln(count)`` on ``ln(rank)`` over the
    corpus's ``top_n`` most frequent whitespace tokens (ties broken by
    token ascending, the deterministic SQL rule).  Natural text tracks
    slope ≈ -1 (Zipf); far-off corpora flag template/spam skew — a
    corpus-level quality gate beside the per-doc Gopher rules.

    Shape: the ``top_tokens`` count exchange (narrow, pre-aggregated
    token partials + per-partition select_k — the vocabulary never
    rides a global sort), then an O(top_n) driver regression."""
    from .textops import top_tokens

    top = top_tokens(ds, text_col=text_col, k=top_n)
    top = top.to_pandas()  # O(top_n) rows
    n = top["n"].to_numpy().astype(np.float64)
    rank = np.arange(1, len(n) + 1, dtype=np.float64)
    lx, ly = np.log(rank), np.log(n)
    mx, my = lx.mean(), ly.mean()
    slope = float(((lx - mx) * (ly - my)).sum() / ((lx - mx) ** 2).sum())
    intercept = float(my - slope * mx)
    r = float(((lx - mx) * (ly - my)).sum()
              / np.sqrt(((lx - mx) ** 2).sum() * ((ly - my) ** 2).sum()))
    out = {"slope": slope, "intercept": intercept, "r2": r * r,
           "n_terms": len(n)}
    if round_to is not None:
        for k in ("slope", "intercept", "r2"):
            out[k] = round(out[k], round_to)
    return pa.table({k: pa.array([v], type=pa.int64()
                     if k == "n_terms" else pa.float64())
                     for k, v in out.items()})


# ---------------------------------------------------------------------------
# winsorized (quantile-clipped) group statistics
# ---------------------------------------------------------------------------

def winsorized_group_stats(ds, val_col: str, key_col: str, *,
                           p_lo: float = 0.05, p_hi: float = 0.95,
                           round_to: int | None = 9) -> pa.Table:
    """Per-key count / mean / min / max of ``val_col`` AFTER clipping
    to the GLOBAL exact [p_lo, p_hi] quantiles — the standard outlier
    winsorization before scaling/encoding.  Two narrow passes: the
    exact-quantile machinery (collect under threshold, distributed
    order-stat pick above — ``sessionize.exact_quantiles``), then
    per-batch per-key clipped partials (n, sum, min, max — four
    numbers per key per batch) reduced on the driver, O(batches ×
    keys).  No shuffle."""
    from .sessionize import exact_quantiles

    lo, hi = exact_quantiles(ds, val_col, [p_lo, p_hi])

    def _p(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({key_col: pa.array([], type=t[key_col].type),
                             "n": pa.array([], type=pa.int64()),
                             "s": pa.array([], type=pa.float64()),
                             "mn": pa.array([], type=pa.float64()),
                             "mx": pa.array([], type=pa.float64())})
        enc = pc.dictionary_encode(t[key_col].combine_chunks())
        codes = enc.indices.to_numpy(zero_copy_only=False)
        k = len(enc.dictionary)
        v = np.clip(t[val_col].to_numpy(zero_copy_only=False)
                    .astype(np.float64), lo, hi)
        mn = np.full(k, np.inf)
        np.minimum.at(mn, codes, v)
        mx = np.full(k, -np.inf)
        np.maximum.at(mx, codes, v)
        return pa.table({
            key_col: enc.dictionary,
            "n": pa.array(np.bincount(codes, minlength=k).astype(np.int64)),
            "s": pa.array(np.bincount(codes, weights=v, minlength=k)),
            "mn": pa.array(mn), "mx": pa.array(mx)})

    agg: dict = {}
    for r in ds.map_batches(_p, batch_format="pyarrow").take_all():
        e = agg.setdefault(r[key_col], [0, 0.0, np.inf, -np.inf])
        e[0] += r["n"]
        e[1] += r["s"]
        e[2] = min(e[2], r["mn"])
        e[3] = max(e[3], r["mx"])

    keys = sorted(agg)
    n = np.array([agg[k][0] for k in keys], dtype=np.int64)
    s = np.array([agg[k][1] for k in keys])
    mn = np.array([agg[k][2] for k in keys])
    mx = np.array([agg[k][3] for k in keys])
    mean = s / n
    if round_to is not None:
        mean = np.round(mean, round_to)
        mn, mx = np.round(mn, round_to), np.round(mx, round_to)
    return pa.table({key_col: pa.array(keys), "n": pa.array(n),
                     "mean_w": pa.array(mean), "min_w": pa.array(mn),
                     "max_w": pa.array(mx)})


# ---------------------------------------------------------------------------
# population stability index (distribution drift)
# ---------------------------------------------------------------------------

def psi(ds, val_col: str, ts_col: str, *, n_bins: int = 10,
        split_ts: float | None = None,
        round_to: int | None = 9) -> pa.Table:
    """Population Stability Index between a REFERENCE period and a
    CURRENT period of the same stream — the standard drift monitor
    for a deployed feature: bin edges = the reference period's exact
    deciles, ``PSI = Σ (p_cur - p_ref) · ln(p_cur / p_ref)`` over the
    bins.  PSI < 0.1 ≈ stable, > 0.25 ≈ shifted.

    ``split_ts`` (epoch seconds) divides the periods; default = the
    midpoint of the stream's [min, max] timestamp.  Shape: one narrow
    min/max pass, the exact-quantile machinery on the reference
    period, then ONE narrow binned-count pass over both periods
    (2·n_bins ints per batch) — no shuffle.

    Returns one row per bin ``(bin, n_ref, n_cur, p_ref, p_cur,
    psi_term)`` — the total is the sum of ``psi_term`` (kept per-bin
    so the oracle comparison pins every bin, not just the sum)."""
    from .sessionize import exact_quantiles

    def _ts_sec(t: pa.Table) -> np.ndarray:
        return (t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
                .astype(np.float64) / 1e6)

    if split_ts is None:
        lo_hi = [np.inf, -np.inf]
        for b in ds.map_batches(
                lambda t: pa.table({
                    "lo": pa.array([float(_ts_sec(t).min())]
                                   if t.num_rows else [],
                                   type=pa.float64()),
                    "hi": pa.array([float(_ts_sec(t).max())]
                                   if t.num_rows else [],
                                   type=pa.float64())}),
                batch_format="pyarrow").take_all():
            lo_hi[0] = min(lo_hi[0], b["lo"])
            lo_hi[1] = max(lo_hi[1], b["hi"])
        split_ts = (lo_hi[0] + lo_hi[1]) / 2.0

    ref = ds.map_batches(
        lambda t: t.filter(pa.array(_ts_sec(t) < split_ts)),
        batch_format="pyarrow")
    qs = [i / n_bins for i in range(1, n_bins)]
    edges = np.asarray(exact_quantiles(ref, val_col, qs),
                       dtype=np.float64)

    def _counts(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({"bin": pa.array([], type=pa.int64()),
                             "nr": pa.array([], type=pa.int64()),
                             "nc": pa.array([], type=pa.int64())})
        v = t[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        cur = _ts_sec(t) >= split_ts
        b = np.searchsorted(edges, v, side="right")
        nr = np.bincount(b[~cur], minlength=n_bins)
        nc = np.bincount(b[cur], minlength=n_bins)
        return pa.table({"bin": pa.array(np.arange(n_bins)),
                         "nr": pa.array(nr.astype(np.int64)),
                         "nc": pa.array(nc.astype(np.int64))})

    nr = np.zeros(n_bins, dtype=np.int64)
    nc = np.zeros(n_bins, dtype=np.int64)
    for r in ds.map_batches(_counts, batch_format="pyarrow").take_all():
        nr[r["bin"]] += r["nr"]
        nc[r["bin"]] += r["nc"]
    p_ref = nr / nr.sum()
    p_cur = nc / nc.sum()
    with np.errstate(divide="ignore", invalid="ignore"):
        term = (p_cur - p_ref) * np.log(p_cur / p_ref)
    dead = ~((p_ref > 0) & (p_cur > 0))
    term = np.where(dead, 0.0, term)
    if round_to is not None:
        p_ref, p_cur = np.round(p_ref, round_to), np.round(p_cur, round_to)
        term = np.round(term, round_to)
    return pa.table({"bin": pa.array(np.arange(n_bins, dtype=np.int64)),
                     "n_ref": pa.array(nr), "n_cur": pa.array(nc),
                     "p_ref": pa.array(p_ref), "p_cur": pa.array(p_cur),
                     # empty-on-either-side bins are NULL (the SQL CASE)
                     "psi_term": pa.array(term, mask=dead)})


# ---------------------------------------------------------------------------
# CUSUM changepoint statistic
# ---------------------------------------------------------------------------

def cusum_stat(ds, key_col: str, ts_col: str, val_col: str, *,
               tiebreak_col: str, min_n: int = 2, round_to: int = 6):
    """Per-key standardized CUSUM changepoint statistic: with the
    key's events in time order, ``S_k = sum_{i<=k}(v_i) - k * mean``
    and the statistic is ``max_k |S_k| / (sd_pop * sqrt(n))`` — the
    classic Page (1954) cumulative-sum drift detector, normalized so
    ~0.3-0.8 is stationary noise and >1.3 flags a mean shift (the
    Kolmogorov–Smirnov-style bridge maximum).  netml's closest analog
    is the per-flow trend eyeballing its STATS vector enables; this
    makes the changepoint score a first-class keyed feature.

    Scale shape: ONE ``partition_map`` hash exchange keyed on
    ``key_col`` with a per-partition ``(key, ts, tiebreak)`` sort,
    then fully vectorized run-segmented math (global cumsum + per-run
    offset subtraction, ``maximum.reduceat`` for the bridge max) — no
    driver loop, no second pass.  Keys with ``n < min_n`` or zero
    variance are dropped.  Float association differs from the
    oracle's sequential windowed SUM at the 1e-12 level, hence the
    documented round-6 hedge (same as ``welch_ttest``)."""
    from .mlprep import _run_bounds
    from .partition import partition_map

    def _fin(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({key_col: pa.array([], type=t[key_col].type),
                             "n": pa.array([], type=pa.int64()),
                             "cusum": pa.array([], type=pa.float64())})
        starts, run_id = _run_bounds(t[key_col].combine_chunks())
        v = t[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        cnt = np.bincount(run_id).astype(np.float64)
        mu = np.bincount(run_id, weights=v) / cnt
        var = np.bincount(run_id, weights=v * v) / cnt - mu * mu
        sd = np.sqrt(np.maximum(var, 0.0))
        cs = np.cumsum(v)
        off = np.concatenate(([0.0], cs[starts[1:] - 1])) \
            if len(starts) > 1 else np.zeros(1)
        local = cs - off[run_id]
        k = (np.arange(len(v)) - starts[run_id] + 1).astype(np.float64)
        dev = np.abs(local - k * mu[run_id])
        maxdev = np.maximum.reduceat(dev, starts)
        ok = (cnt >= min_n) & (sd > 0)
        stat = np.round(
            np.divide(maxdev, sd * np.sqrt(cnt),
                      out=np.zeros_like(maxdev), where=ok), round_to)
        keys = t[key_col].combine_chunks().take(pa.array(starts))
        out = pa.table({key_col: keys,
                        "n": pa.array(cnt.astype(np.int64)),
                        "cusum": pa.array(stat)})
        return out.filter(pa.array(ok))

    cols = [key_col, ts_col, tiebreak_col, val_col]
    return partition_map(ds.select_columns(cols), key_col, _fin,
                         sort_by=[key_col, ts_col, tiebreak_col])


# ---------------------------------------------------------------------------
# Per-key OLS time trend
# ---------------------------------------------------------------------------

def trend_slope(ds, key_col: str, ts_col: str, val_col: str, *,
                min_n: int = 2, round_slope: int = 9,
                round_icept: int = 6):
    """Per-key OLS trend of ``val_col`` against time: with x = epoch
    seconds and y = the value, returns ``slope_per_day`` (86400 x the
    per-second OLS slope — the "how fast is this key's value drifting"
    feature) and ``intercept`` (value at epoch 0, the standard
    regr_intercept), computed with the numerically stable centered
    formulation ``slope = sum((x-x̄)(y-ȳ)) / sum((x-x̄)²)``.  Keys
    with ``n < min_n`` or zero time-variance are dropped.  netml's
    closest analog is the per-flow duration/rate scalars (reference
    src/netml/pparser/parser.py STATS family); this makes the local
    drift direction a first-class keyed feature.

    Scale shape: ONE ``partition_map`` hash exchange on ``key_col``
    (narrow 3-column input), then fully vectorized run-segmented
    centered sums via ``np.bincount`` — no driver loop.  The centered
    math matches DuckDB's streaming-stable ``regr_slope`` to ~1e-15
    relative, far below the round hedges (slope_per_day round-9,
    intercept round-6 — documented, same reasoning as welch_ttest)."""
    from .mlprep import _run_bounds
    from .partition import partition_map

    def _fin(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({
                key_col: pa.array([], type=t[key_col].type),
                "n": pa.array([], type=pa.int64()),
                "slope_per_day": pa.array([], type=pa.float64()),
                "intercept": pa.array([], type=pa.float64())})
        starts, run_id = _run_bounds(t[key_col].combine_chunks())
        ts = t[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        x = ts.to_numpy(zero_copy_only=False).astype(np.float64) / 1e6
        y = t[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        cnt = np.bincount(run_id).astype(np.float64)
        mx = np.bincount(run_id, weights=x) / cnt
        my = np.bincount(run_id, weights=y) / cnt
        dx = x - mx[run_id]
        dy = y - my[run_id]
        sxx = np.bincount(run_id, weights=dx * dx)
        sxy = np.bincount(run_id, weights=dx * dy)
        ok = (cnt >= min_n) & (sxx > 0)
        slope = np.divide(sxy, sxx, out=np.zeros_like(sxy), where=ok)
        icept = my - slope * mx
        keys = t[key_col].combine_chunks().take(pa.array(starts))
        out = pa.table({
            key_col: keys,
            "n": pa.array(cnt.astype(np.int64)),
            "slope_per_day": pa.array(
                np.round(slope * 86400.0, round_slope)),
            "intercept": pa.array(np.round(icept, round_icept))})
        return out.filter(pa.array(ok))

    cols = [key_col, ts_col, val_col]
    return partition_map(ds.select_columns(cols), key_col, _fin,
                         sort_by=[key_col])


# ---------------------------------------------------------------------------
# Per-key Spearman rank correlation
# ---------------------------------------------------------------------------

def spearman_corr(ds, key_col: str, xcol: str, ycol: str, *,
                  min_n: int = 2, round_to: int = 6):
    """Per-key Spearman rank correlation between two numeric columns —
    the monotonic-association feature (e.g. x = time, y = value gives
    "is this key's value drifting monotonically", robust to outliers
    where :func:`trend_slope` is not).  Ties get AVERAGE ranks (the
    standard fractional-rank rule: ``RANK() + (ties-1)/2``), then the
    statistic is the Pearson correlation of the two rank vectors.
    Keys with ``n < min_n`` or a zero-variance rank vector on either
    side are dropped.

    Scale shape: ONE ``partition_map`` hash exchange on ``key_col``;
    inside a partition everything is vectorized — two lexsorts for the
    per-run fractional ranks (tie-group bounds via reduceat-style
    first/last positions, scatter back by inverse permutation) and one
    ``np.bincount`` centered-moment pass for the segmented Pearson.
    Round-6 hedge on the float association (same as welch_ttest)."""
    from .mlprep import _run_bounds
    from .partition import partition_map

    def _frac_ranks(run_id: np.ndarray, starts: np.ndarray,
                    v: np.ndarray) -> np.ndarray:
        """Average-tie ranks of v within each run (1-based)."""
        order = np.lexsort((v, run_id))
        rs, vs = run_id[order], v[order]
        # tie-group starts within the (run, value) sort
        tie_first = np.r_[True, (rs[1:] != rs[:-1]) | (vs[1:] != vs[:-1])]
        tf = np.flatnonzero(tie_first)
        tlen = np.diff(np.r_[tf, len(vs)])
        pos = np.arange(len(vs)) - starts[rs]          # 0-based in run
        first_pos = pos[tf]
        avg = first_pos + (tlen - 1) / 2.0 + 1.0       # 1-based avg rank
        ranks_sorted = np.repeat(avg, tlen)
        out = np.empty(len(v), dtype=np.float64)
        out[order] = ranks_sorted
        return out

    def _fin(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({key_col: pa.array([], type=t[key_col].type),
                             "n": pa.array([], type=pa.int64()),
                             "spearman": pa.array([], type=pa.float64())})
        starts, run_id = _run_bounds(t[key_col].combine_chunks())
        xs = t[xcol]
        if pa.types.is_timestamp(xs.type):
            xs = xs.cast(pa.int64())
        x = xs.to_numpy(zero_copy_only=False).astype(np.float64)
        y = t[ycol].to_numpy(zero_copy_only=False).astype(np.float64)
        # the partition arrives sorted by (key, x), so x-ranks need NO
        # lexsort — tie groups are contiguous runs of equal (run, x)
        # and every row's rank is its position offset (measured: the
        # two lexsorts were ~80% of the kernel at 5M rows; this halves
        # that)
        tie_first = np.r_[True, (run_id[1:] != run_id[:-1])
                          | (x[1:] != x[:-1])]
        tf = np.flatnonzero(tie_first)
        tlen = np.diff(np.r_[tf, len(x)])
        pos = np.arange(len(x)) - starts[run_id]
        rx = np.repeat(pos[tf] + (tlen - 1) / 2.0 + 1.0, tlen)
        ry = _frac_ranks(run_id, starts, y)
        cnt = np.bincount(run_id).astype(np.float64)
        mx = np.bincount(run_id, weights=rx) / cnt
        my = np.bincount(run_id, weights=ry) / cnt
        dx = rx - mx[run_id]
        dy = ry - my[run_id]
        sxx = np.bincount(run_id, weights=dx * dx)
        syy = np.bincount(run_id, weights=dy * dy)
        sxy = np.bincount(run_id, weights=dx * dy)
        ok = (cnt >= min_n) & (sxx > 0) & (syy > 0)
        rho = np.divide(sxy, np.sqrt(sxx * syy),
                        out=np.zeros_like(sxy), where=ok)
        keys = t[key_col].combine_chunks().take(pa.array(starts))
        out = pa.table({key_col: keys,
                        "n": pa.array(cnt.astype(np.int64)),
                        "spearman": pa.array(np.round(rho, round_to))})
        return out.filter(pa.array(ok))

    cols = [key_col, xcol, ycol]
    return partition_map(ds.select_columns(cols), key_col, _fin,
                         sort_by=[key_col, xcol])


# ---------------------------------------------------------------------------
# Kendall rank correlation
# ---------------------------------------------------------------------------

def _inversions_sorted_runs(y: np.ndarray) -> int:
    """Inversion count (pairs ``i<j`` with ``y[i] > y[j]``) of ONE
    sequence via a vectorized bottom-up mergesort: at each level the
    array is sorted within blocks of width ``w``; cross-block
    inversions between each (left, right) half-pair are counted with a
    SINGLE global ``searchsorted`` after offsetting every block's
    values by ``block_id * K`` (the offsets dominate, so the
    concatenation of per-block-sorted lefts is globally sorted).
    O(n log n) comparisons, log n numpy passes, no Python inner loop.

    ``y`` must be rank-compressed non-negative ints (caller does this)
    so the offset arithmetic stays inside int64."""
    n = len(y)
    if n < 2:
        return 0
    a = y.astype(np.int64, copy=True)
    K = np.int64(a.max()) + 1
    inv = 0
    w = 1
    idx = np.arange(n)
    while w < n:
        block = idx // (2 * w)
        in_right = (idx % (2 * w)) >= w
        lefts = a[~in_right] + block[~in_right] * K
        rights = a[in_right] + block[in_right] * K
        if len(lefts) and len(rights):
            # per right element: # left elements in its block > it
            ss = np.searchsorted(lefts, rights, side="right")
            # end position of each right element's block within the
            # lefts concatenation: count greater = block_end - ss
            lb = block[~in_right]
            lend = np.searchsorted(lb, block[in_right], side="right")
            inv += int((lend - ss).sum())
        # merge: sort values within 2w blocks (offset trick again)
        order = np.argsort(block * K + a, kind="stable")
        a = a[order]
        w *= 2
    return inv


def _tie_pair_count(sorted_vals: np.ndarray) -> int:
    """Sum of t*(t-1)/2 over tie groups of a SORTED array."""
    if len(sorted_vals) == 0:
        return 0
    first = np.r_[True, sorted_vals[1:] != sorted_vals[:-1]]
    t = np.diff(np.r_[np.flatnonzero(first), len(sorted_vals)])
    return int((t * (t - 1) // 2).sum())


def kendall_tau(ds, key_col: str, xcol: str, ycol: str, *,
                min_n: int = 2, round_to: int = 6,
                knight_threshold: int = 2048,
                pair_chunk: int = 1 << 24):
    """Per-key Kendall tau-b rank correlation between two numeric
    columns — the concordance feature (fraction of event pairs whose
    x-order agrees with their y-order), more robust to extreme ranks
    than Spearman.  Tie handling is tau-b:
    ``tau = (C - D) / sqrt((n0 - n1) * (n0 - n2))`` with ``n0 =
    n(n-1)/2``, ``n1``/``n2`` the x-/y-tie pair counts.  Keys with
    ``n < min_n`` or an all-tied side (zero denominator) are dropped.

    Scale shape: ONE ``partition_map`` hash exchange on ``key_col``;
    inside a partition, SHORT runs (the common case — per-entity event
    counts) go through a fully vectorized segmented pair expansion
    (all runs at once, evaluated in ``pair_chunk``-bounded slices so
    memory stays flat), and runs longer than ``knight_threshold`` are
    handled individually by Knight's O(n log n) algorithm (sort by
    (x, y), count y inversions with a vectorized mergesort) so one hot
    key never triggers a quadratic blowup.  Both paths are exact and
    agree bitwise on C, D and the tie counts."""
    from .mlprep import _run_bounds
    from .partition import partition_map

    def _knight_run(x: np.ndarray, y: np.ndarray):
        """(C - D, n1, n2) for one run, O(n log n)."""
        n = len(x)
        n0 = n * (n - 1) // 2
        order = np.lexsort((y, x))
        xs, ys = x[order], y[order]
        # rank-compress y for the int mergesort
        yr = np.searchsorted(np.sort(y), ys, side="left")
        swaps = _inversions_sorted_runs(yr)
        n1 = _tie_pair_count(xs)
        n2 = _tie_pair_count(np.sort(y))
        # joint ties: tie groups of the (x, y) lexsorted pairs
        first = np.r_[True, (xs[1:] != xs[:-1]) | (ys[1:] != ys[:-1])]
        t = np.diff(np.r_[np.flatnonzero(first), n])
        n3 = int((t * (t - 1) // 2).sum())
        cmd = n0 - n1 - n2 + n3 - 2 * swaps
        return cmd, n1, n2

    def _fin(t: pa.Table) -> pa.Table:
        empty = pa.table({key_col: pa.array([], type=(
            t[key_col].type if t.num_rows or t.column_names else pa.int64())),
            "n": pa.array([], type=pa.int64()),
            "kendall": pa.array([], type=pa.float64())})
        if not t.num_rows:
            return empty
        starts, run_id = _run_bounds(t[key_col].combine_chunks())
        xs = t[xcol]
        if pa.types.is_timestamp(xs.type):
            xs = xs.cast(pa.int64())
        x = xs.to_numpy(zero_copy_only=False).astype(np.float64)
        y = t[ycol].to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(x)
        cnt = np.bincount(run_id)
        nruns = len(cnt)
        cmd = np.zeros(nruns, dtype=np.int64)   # C - D
        n1 = np.zeros(nruns, dtype=np.int64)
        n2 = np.zeros(nruns, dtype=np.int64)
        big = cnt > knight_threshold
        # --- long runs: Knight, one at a time (few by contract) ---
        for r in np.flatnonzero(big):
            s, ln = starts[r], cnt[r]
            cmd[r], n1[r], n2[r] = _knight_run(x[s:s + ln], y[s:s + ln])
        # --- short runs: segmented pair expansion, chunked ---
        small_mask = ~big[run_id]
        if small_mask.any():
            pos = np.arange(n) - starts[run_id]
            partners = np.where(small_mask, pos, 0)  # pairs where row is j
            total_pairs = int(partners.sum())
            block_start = np.cumsum(partners) - partners
            j_all = np.repeat(np.arange(n), partners)
            for lo in range(0, total_pairs, pair_chunk):
                hi = min(lo + pair_chunk, total_pairs)
                j = j_all[lo:hi]
                i = np.arange(lo, hi) - block_start[j] + starts[run_id[j]]
                sx = np.sign(x[j] - x[i])
                sy = np.sign(y[j] - y[i])
                s = sx * sy
                rid = run_id[j]
                cmd += np.bincount(rid, weights=s,
                                   minlength=nruns).astype(np.int64)
                n1 += np.bincount(rid[sx == 0], minlength=nruns)
                n2 += np.bincount(rid[sy == 0], minlength=nruns)
        n0 = cnt.astype(np.int64) * (cnt - 1) // 2
        d1 = (n0 - n1).astype(np.float64)
        d2 = (n0 - n2).astype(np.float64)
        ok = (cnt >= min_n) & (d1 > 0) & (d2 > 0)
        tau = np.divide(cmd.astype(np.float64), np.sqrt(d1 * d2),
                        out=np.zeros(nruns), where=ok)
        keys = t[key_col].combine_chunks().take(pa.array(starts))
        out = pa.table({key_col: keys,
                        "n": pa.array(cnt.astype(np.int64)),
                        "kendall": pa.array(np.round(tau, round_to))})
        return out.filter(pa.array(ok))

    cols = [key_col, xcol, ycol]
    return partition_map(ds.select_columns(cols), key_col, _fin,
                         sort_by=[key_col, xcol])


# ---------------------------------------------------------------------------
# per-group empirical CDF
# ---------------------------------------------------------------------------

def group_ecdf(ds, key_col: str, val_col: str, id_col: str, *,
               out_col: str = "ecdf", round_to: int = 9):
    """Empirical CDF of ``val_col`` within each key — the
    distribution-free "how extreme is this value for THIS entity"
    feature (SQL ``cume_dist() OVER (PARTITION BY key ORDER BY
    val)``): ``ecdf = #(rows in key with value <= v) / n``, ties
    sharing the tie group's upper count.  ``id_col`` rides along to
    keep output rows addressable.

    Scale shape: ONE ``partition_map`` hash exchange sorted by
    (key, value); inside a partition every row's numerator is the END
    position of its (run, value) tie group — two diffs and a repeat,
    no per-row work."""
    from .mlprep import _run_bounds
    from .partition import partition_map

    def _fin(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({
                id_col: pa.array([], type=pa.int64()),
                key_col: pa.array([], type=pa.string()),
                val_col: pa.array([], type=pa.float64()),
                out_col: pa.array([], type=pa.float64())})
        starts, run_id = _run_bounds(t[key_col].combine_chunks())
        v = t[val_col].to_numpy(zero_copy_only=False)
        n = len(v)
        cnt = np.bincount(run_id).astype(np.float64)
        tie_first = np.r_[True, (run_id[1:] != run_id[:-1])
                          | (v[1:] != v[:-1])]
        tf = np.flatnonzero(tie_first)
        tlen = np.diff(np.r_[tf, n])
        # end position (1-based, within run) of each tie group
        end_pos = (tf + tlen - starts[run_id[tf]]).astype(np.float64)
        ecdf = np.repeat(end_pos, tlen) / cnt[run_id]
        return pa.table({
            id_col: t[id_col],
            key_col: t[key_col],
            val_col: t[val_col],
            out_col: pa.array(np.round(ecdf, round_to))})

    cols = [key_col, val_col, id_col]
    return partition_map(ds.select_columns(cols), key_col, _fin,
                         sort_by=[key_col, val_col])


# ---------------------------------------------------------------------------
# RFM segmentation
# ---------------------------------------------------------------------------

def rfm_segment(ds, key_col: str, ts_col: str, val_col: str, *,
                n_bins: int = 5, round_monetary: int = 6):
    """Classic RFM (recency / frequency / monetary) customer
    segmentation (Hughes, "Strategic Database Marketing", 1994): per
    key, days since last event (vs the global max timestamp), event
    count, and value sum; each scored 1..n_bins by exact quantile
    bins of the PER-KEY aggregate distribution (recency inverted so
    most-recent scores highest), plus the combined
    ``segment = 100·r + 10·f + m`` code.

    Binning rule: ``bin = #(edges <= v)`` over exact interior
    quantiles of the aggregate columns — the same deterministic
    value-based rule as PSI / gains_table, stated identically in the
    SQL oracle.  ``monetary`` is rounded to ``round_monetary`` BEFORE
    binning on both sides (the sum-order hedge: a 1e-12 association
    difference must not flip a quantile edge).

    Scale shape: ONE keyed exchange for the per-key aggregates
    (narrow 3-column input, run-segmented bincount reduce), one
    global ts-max narrow pass, one exact-quantile pass over the
    O(keys) aggregate table, then a vectorized searchsorted score
    pass — no further shuffle."""
    import pyarrow.compute as pc

    from .mlprep import _run_bounds
    from .partition import partition_map
    from .sessionize import exact_quantiles_multi

    gmax = ds.select_columns([ts_col]).max(ts_col)
    gmax_us = int(pa.scalar(gmax).cast(pa.timestamp("us")).cast(
        pa.int64()).as_py())

    def _agg(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({key_col: pa.array([], type=t[key_col].type),
                             "recency_days": pa.array([], pa.float64()),
                             "frequency": pa.array([], pa.int64()),
                             "monetary": pa.array([], pa.float64())})
        starts, run_id = _run_bounds(t[key_col].combine_chunks())
        ts = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = t[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        cnt = np.bincount(run_id).astype(np.int64)
        last = np.maximum.reduceat(ts, starts)
        mon = np.round(np.bincount(run_id, weights=v), round_monetary)
        keys = t[key_col].combine_chunks().take(pa.array(starts))
        return pa.table({
            key_col: keys,
            "recency_days": pa.array(
                (gmax_us - last) / 86400e6),
            "frequency": pa.array(cnt),
            "monetary": pa.array(mon)})

    agg = partition_map(ds.select_columns([key_col, ts_col, val_col]),
                        key_col, _agg,
                        sort_by=[key_col]).materialize()
    qs = [i / n_bins for i in range(1, n_bins)]
    edges = exact_quantiles_multi(
        agg, {"recency_days": qs, "frequency": qs, "monetary": qs})
    e_r = np.asarray(edges["recency_days"], dtype=np.float64)
    e_f = np.asarray(edges["frequency"], dtype=np.float64)
    e_m = np.asarray(edges["monetary"], dtype=np.float64)

    def _score(t: pa.Table) -> pa.Table:
        r = t["recency_days"].to_numpy(zero_copy_only=False)
        f = t["frequency"].to_numpy(zero_copy_only=False).astype(
            np.float64)
        m = t["monetary"].to_numpy(zero_copy_only=False)
        rs = n_bins - np.searchsorted(e_r, r, side="right")
        fs = np.searchsorted(e_f, f, side="right") + 1
        ms = np.searchsorted(e_m, m, side="right") + 1
        t = t.append_column("r_score", pa.array(rs.astype(np.int64)))
        t = t.append_column("f_score", pa.array(fs.astype(np.int64)))
        t = t.append_column("m_score", pa.array(ms.astype(np.int64)))
        return t.append_column(
            "segment", pa.array((100 * rs + 10 * fs + ms)
                                .astype(np.int64)))

    return agg.map_batches(_score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Kaplan-Meier survival curve
# ---------------------------------------------------------------------------

def kaplan_meier(ds, dur_col: str, observed_col: str, *,
                 round_to: int = 9) -> pa.Table:
    """Kaplan-Meier product-limit survival estimate (Kaplan & Meier,
    JASA 1958) over right-censored durations: for each distinct
    duration t carrying at least one OBSERVED event, ``n_risk`` =
    subjects with duration >= t, ``d`` = observed events at t, and
    ``survival = Π_{t_i <= t} (1 − d_i / n_risk_i)``.

    The product is computed as ``exp(Σ ln(term))`` with zero terms
    factored out through a min-flag — the EXACT expression the SQL
    oracle states (a zero term only occurs at the last event time,
    where it correctly pins survival to 0; a plain ln would blow up).

    Scale shape: per-batch (duration, n_all, d) count partials (one
    combined group-by per batch — the exchange carries distinct
    durations, never subjects), driver fold + one sort over the
    O(distinct durations) rows.  The input is typically already a
    per-key aggregate (see ``q_kaplan_meier_events``), so rows are
    O(keys) to begin with."""

    def _partial(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({"t": pa.array([], pa.int64()),
                             "n_all": pa.array([], pa.int64()),
                             "d": pa.array([], pa.int64())})
        g = pa.table({"t": t[dur_col],
                      "obs": t[observed_col]}) \
            .group_by(["t"]).aggregate([([], "count_all"),
                                        ("obs", "sum")])
        return g.rename_columns(["t", "n_all", "d"])

    parts = pa.concat_tables(
        [b for b in ds.map_batches(_partial, batch_format="pyarrow")
         .iter_batches(batch_size=None, batch_format="pyarrow")],
        promote_options="none")
    agg = parts.group_by(["t"]).aggregate([("n_all", "sum"),
                                           ("d", "sum")])
    t = agg["t"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_all = agg["n_all_sum"].to_numpy().astype(np.int64)
    d = agg["d_sum"].to_numpy().astype(np.int64)
    order = np.argsort(t, kind="stable")
    t, n_all, d = t[order], n_all[order], d[order]
    total = int(n_all.sum())
    n_risk = total - np.r_[0, np.cumsum(n_all)[:-1]]
    term = 1.0 - d / n_risk
    safe = np.where(term > 0, term, 1.0)
    logsum = np.cumsum(np.log(safe))
    zero_seen = np.cumsum(term <= 0) > 0
    surv = np.where(zero_seen, 0.0, np.exp(logsum))
    keep = d > 0
    return pa.table({
        "t": pa.array(t[keep]),
        "n_risk": pa.array(n_risk[keep]),
        "d": pa.array(d[keep]),
        "survival": pa.array(np.round(surv[keep], round_to))})


def traffic_matrix(ds, ts_col: str, *, round_to: int = 9) -> pa.Table:
    """Calendar traffic profile: event counts per (day-of-week, hour)
    cell plus each cell's share of total — the seasonality fingerprint
    every behavioral pipeline plots (and the binned prior for the
    seasonal-deviation feature).

    Scale shape: a pure narrow pass — each batch folds into ONE 7×24
    bincount partial (dow = (epoch_day + 4) % 7 with Sunday = 0,
    DuckDB's dayofweek convention; hour = epoch_hour % 24), the driver
    sums 168 ints.  No shuffle, no per-row Python."""
    import pyarrow as pa

    def _partial(t: pa.Table) -> pa.Table:
        ts = t[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        us = ts.to_numpy(zero_copy_only=False)
        dow = ((us // 86_400_000_000) + 4) % 7
        hour = (us // 3_600_000_000) % 24
        cnt = np.bincount(dow * 24 + hour, minlength=168)
        nz = np.flatnonzero(cnt)
        return pa.table({"cell": pa.array(nz.astype(np.int64)),
                         "n": pa.array(cnt[nz].astype(np.int64))})

    total = np.zeros(168, dtype=np.int64)
    for bt in ds.map_batches(_partial, batch_size=None,
                             batch_format="pyarrow") \
                .iter_batches(batch_size=None, batch_format="pyarrow"):
        np.add.at(total, bt["cell"].to_numpy(), bt["n"].to_numpy())
    nz = np.flatnonzero(total)
    n_all = int(total.sum())
    share = np.round(total[nz] / n_all, round_to) if n_all else \
        np.zeros(0)
    return pa.table({
        "dow": pa.array((nz // 24).astype(np.int64)),
        "hour": pa.array((nz % 24).astype(np.int64)),
        "n": pa.array(total[nz]),
        "share": pa.array(share),
    })


def weighted_median(ds, key: str, val_col: str, wt_col: str, *,
                    num_partitions: int | None = None) -> "object":
    """Per-key WEIGHTED (lower) median: the smallest value v whose
    cumulative weight (ordered by value) reaches half the key's total
    weight — the robust center for weighted observations (price
    weighted by quantity, score weighted by exposure).  Emits
    (key, w_median, total_wt).

    ONE keyed hash exchange sorted by (key, value); inside a partition
    the per-run cumulative weight is a global cumsum minus the run's
    base (vectorized), and the pick is one boolean argmax per run —
    no per-key Python.  Tie groups are safe on both engines: every
    row of a value shares the prefix-sum at the group's last row, so
    the chosen v is order-independent within ties (the SQL states the
    identical ``min(v) FILTER (cum >= tot/2)`` rule)."""
    from netml_ray.partition import partition_map

    def _fn(t: pa.Table) -> pa.Table:
        m = t.num_rows
        if m == 0:
            return pa.table({key: t[key],
                             "w_median": pa.array([], pa.float64()),
                             "total_wt": pa.array([], pa.float64())})
        arr = t[key]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        starts = np.ones(m, dtype=bool)
        if m > 1:
            starts[1:] = pc.not_equal(
                arr.slice(1, m - 1), arr.slice(0, m - 1)).to_numpy(
                zero_copy_only=False)
        sidx = np.flatnonzero(starts)
        runlen = np.diff(np.append(sidx, m))
        v = t[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        w = t[wt_col].to_numpy(zero_copy_only=False).astype(np.float64)
        cs = np.cumsum(w)
        base = np.repeat(np.r_[0.0, cs[sidx[1:] - 1]], runlen)
        cum = cs - base
        tot = np.add.reduceat(w, sidx)
        half = np.repeat(tot / 2.0, runlen)
        hit = cum >= half
        # first hit per run (the run's LAST row always hits: cum there
        # equals tot >= tot/2, so every run gets exactly one pick)
        seg_id = np.repeat(np.arange(len(sidx)), runlen)
        order = np.flatnonzero(hit)
        seg_of_hit = seg_id[order]
        seen_first = np.r_[True, seg_of_hit[1:] != seg_of_hit[:-1]]
        first_hit = np.full(len(sidx), -1, dtype=np.int64)
        first_hit[seg_of_hit[seen_first]] = order[seen_first]
        return pa.table({
            key: arr.take(pa.array(sidx)),
            "w_median": pa.array(v[first_hit]),
            "total_wt": pa.array(tot),
        })

    return partition_map(ds.select_columns([key, val_col, wt_col]),
                         key, _fn, sort_by=[key, val_col],
                         num_partitions=num_partitions)


# ---------------------------------------------------------------------------
# Mann-Kendall trend test
# ---------------------------------------------------------------------------


def mann_kendall(ds, key_col: str, ts_col: str, val_col: str, *,
                 tiebreak: str | None = None, min_n: int = 5,
                 round_var: int = 9, round_z: int = 6,
                 knight_threshold: int = 2048,
                 pair_chunk: int = 1 << 24):
    """Per-key Mann-Kendall monotone-trend test over the time-ordered
    value sequence: ``S = sum_{i<j} sign(v_j - v_i)`` (pairs in
    ``(ts, tiebreak)`` order), tie-corrected variance ``var_S =
    (n(n-1)(2n+5) - sum_t t(t-1)(2t+5)) / 18`` over the value-tie
    groups, and the continuity-corrected normal statistic ``z =
    (S -/+ 1)/sqrt(var_S)`` (0 when S = 0).  The non-parametric
    drift detector feature-stores run next to CUSUM — no slope model
    assumed (reference analog: parser.py's per-flow trend quirks are
    parametric; this is the robust recast).

    Scale shape: the kendall_tau machinery with the x side replaced
    by the within-run position (strictly increasing, so no x ties):
    ONE ``partition_map`` hash exchange on ``key_col``; short runs go
    through the chunk-bounded segmented pair expansion, runs longer
    than ``knight_threshold`` through Knight's O(n log n) inversion
    count — both exact, agreeing bitwise on S and the tie counts.
    Keys with ``n < min_n`` or zero variance (all values tied) drop.
    """
    from .mlprep import _run_bounds
    from .partition import partition_map

    def _fin(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({
                key_col: pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
                "s": pa.array([], type=pa.int64()),
                "var_s": pa.array([], type=pa.float64()),
                "z": pa.array([], type=pa.float64())})
        starts, run_id = _run_bounds(t[key_col].combine_chunks())
        v = t[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(v)
        cnt = np.bincount(run_id)
        nruns = len(cnt)
        s_stat = np.zeros(nruns, dtype=np.int64)
        big = cnt > knight_threshold
        for r in np.flatnonzero(big):  # few by contract
            st, ln = starts[r], cnt[r]
            vr = v[st:st + ln]
            n0 = ln * (ln - 1) // 2
            yr = np.searchsorted(np.sort(vr), vr, side="left")
            swaps = _inversions_sorted_runs(yr)
            n2 = _tie_pair_count(np.sort(vr))
            s_stat[r] = n0 - n2 - 2 * swaps
        small_mask = ~big[run_id]
        if small_mask.any():
            pos = np.arange(n) - starts[run_id]
            partners = np.where(small_mask, pos, 0)
            total_pairs = int(partners.sum())
            block_start = np.cumsum(partners) - partners
            j_all = np.repeat(np.arange(n), partners)
            for lo in range(0, total_pairs, pair_chunk):
                hi = min(lo + pair_chunk, total_pairs)
                j = j_all[lo:hi]
                i = np.arange(lo, hi) - block_start[j] + starts[run_id[j]]
                s_stat += np.bincount(
                    run_id[j], weights=np.sign(v[j] - v[i]),
                    minlength=nruns).astype(np.int64)
        # tie-corrected variance: per-run value-tie group sizes
        order = np.lexsort((v, run_id))
        vs, rs = v[order], run_id[order]
        gfirst = np.r_[True, (rs[1:] != rs[:-1]) | (vs[1:] != vs[:-1])]
        gstart = np.flatnonzero(gfirst)
        gsize = np.diff(np.r_[gstart, n]).astype(np.int64)
        term = gsize * (gsize - 1) * (2 * gsize + 5)
        tie_term = np.bincount(rs[gstart], weights=term.astype(np.float64),
                               minlength=nruns)
        cn = cnt.astype(np.int64)
        var_s = (cn * (cn - 1) * (2 * cn + 5) - tie_term) / 18.0
        ok = (cn >= min_n) & (var_s > 0)
        sd = np.sqrt(np.where(ok, var_s, 1.0))
        z = np.where(s_stat > 0, (s_stat - 1) / sd,
                     np.where(s_stat < 0, (s_stat + 1) / sd, 0.0))
        keys = t[key_col].combine_chunks().take(pa.array(starts))
        out = pa.table({
            key_col: keys,
            "n": pa.array(cn),
            "s": pa.array(s_stat),
            "var_s": pa.array(np.round(var_s, round_var)),
            "z": pa.array(np.round(z, round_z))})
        return out.filter(pa.array(ok))

    cols = [key_col, ts_col, val_col] + ([tiebreak] if tiebreak else [])
    sort_by = [key_col, ts_col] + ([tiebreak] if tiebreak else [])
    return partition_map(ds.select_columns(cols), key_col, _fin,
                         sort_by=sort_by)


# ---------------------------------------------------------------------------
# Theil-Sen robust slope
# ---------------------------------------------------------------------------


def theil_sen(ds, key_col: str, ts_col: str, val_col: str, *,
              min_pairs: int = 3, round_to: int = 9,
              pair_chunk: int = 1 << 24):
    """Per-key Theil-Sen slope: the LOWER median of all pairwise
    slopes ``(v_j - v_i) / ((t_j - t_i)/1e6)`` over time pairs with
    ``t_j > t_i`` (per-second units; equal-timestamp pairs are
    excluded on both engines).  The breakdown-robust alternative to
    the OLS ``trend_slope`` — up to ~29% outliers cannot move it.

    Scale shape: ONE ``partition_map`` hash exchange; pair expansion
    is segmented and evaluated in ``pair_chunk`` slices so memory
    stays flat, then one lexsort of (run, slope) picks each run's
    lower-median element (index ``(m-1)//2``) — deterministic because
    the pick is an ELEMENT, not an average.  Inherently O(n_k^2)
    pairs per key: the per-entity-small-n contract shared with
    kendall_tau/mann_kendall (document the partition bound when keys
    can be hot)."""
    from .mlprep import _run_bounds
    from .partition import partition_map

    def _fin(t: pa.Table) -> pa.Table:
        empty = pa.table({
            key_col: pa.array([], type=(
                t[key_col].type if t.num_rows or t.column_names
                else pa.int64())),
            "n_pairs": pa.array([], type=pa.int64()),
            "ts_slope": pa.array([], type=pa.float64())})
        if not t.num_rows:
            return empty
        starts, run_id = _run_bounds(t[key_col].combine_chunks())
        ts = t[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        x = ts.to_numpy(zero_copy_only=False).astype(np.int64)
        v = t[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(v)
        pos = np.arange(n) - starts[run_id]
        total_pairs = int(pos.sum())
        if total_pairs == 0:
            return empty
        block_start = np.cumsum(pos) - pos
        j_all = np.repeat(np.arange(n), pos)
        rid_parts, slope_parts = [], []
        for lo in range(0, total_pairs, pair_chunk):
            hi = min(lo + pair_chunk, total_pairs)
            j = j_all[lo:hi]
            i = np.arange(lo, hi) - block_start[j] + starts[run_id[j]]
            dt = x[j] - x[i]
            keep = dt > 0
            if not keep.any():
                continue
            dt_s = dt[keep].astype(np.float64) / 1000000.0
            slope_parts.append((v[j][keep] - v[i][keep]) / dt_s)
            rid_parts.append(run_id[j][keep])
        if not rid_parts:
            return empty
        rid = np.concatenate(rid_parts)
        slopes = np.concatenate(slope_parts)
        order = np.lexsort((slopes, rid))
        rid_s, slopes_s = rid[order], slopes[order]
        m = np.bincount(rid_s, minlength=len(starts))
        has = m > 0
        first = np.cumsum(m) - m              # start offset per run
        med_idx = first + (m - 1) // 2
        ok = has & (m >= min_pairs)
        keys = t[key_col].combine_chunks().take(pa.array(starts))
        out = pa.table({
            key_col: keys,
            "n_pairs": pa.array(m.astype(np.int64)),
            "ts_slope": pa.array(np.round(
                slopes_s[np.minimum(med_idx, len(slopes_s) - 1)],
                round_to))})
        return out.filter(pa.array(ok))

    return partition_map(ds.select_columns([key_col, ts_col, val_col]),
                         key_col, _fin, sort_by=[key_col, ts_col])


# ---------------------------------------------------------------------------
# circular (hour-of-day) statistics
# ---------------------------------------------------------------------------


def circular_daytime(ds, key_col: str, ts_col: str, *,
                     min_n: int = 2, round_to: int = 6):
    """Per-key circular statistics of the time-of-day: each event's
    within-day position becomes an angle ``theta = 2*pi * (us_in_day /
    86400e6)`` and the key gets the mean resultant components
    ``c_bar = mean(cos theta)``, ``s_bar = mean(sin theta)`` and the
    concentration ``r = sqrt(c_bar^2 + s_bar^2)`` (1 = all events at
    the same clock time, 0 = uniform over the day).  The standard
    circadian-regularity feature — a plain mean of hour-of-day is
    meaningless across midnight, the resultant is not.  Components are
    emitted instead of atan2(mean angle) to avoid the +/-pi branch
    cut; downstream can atan2 locally.

    Scale shape: per-batch (key, n, sum cos, sum sin) partials (one
    bincount triple), ONE keyed exchange of those partials, driver-free
    finalize.  Trig is evaluated in float64 on both engines (<=1 ulp
    apart) and per-key sums associate differently, hence the shared
    round-6 hedge."""
    from .partition import partition_map as _pm

    DAY_US = 86_400_000_000

    def _partial(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({key_col: pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64()),
                             "cs": pa.array([], type=pa.float64()),
                             "ss": pa.array([], type=pa.float64())})
        ts = t[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        us = ts.to_numpy(zero_copy_only=False).astype(np.int64)
        theta = 2.0 * np.pi * ((us % DAY_US) / 86400000000.0)
        karr = t[key_col].combine_chunks()
        uniq = karr.unique()
        codes = pc.index_in(karr, uniq).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        k = len(uniq)
        return pa.table({
            key_col: uniq,
            "n": pa.array(np.bincount(codes, minlength=k)
                          .astype(np.int64)),
            "cs": pa.array(np.bincount(codes, weights=np.cos(theta),
                                       minlength=k)),
            "ss": pa.array(np.bincount(codes, weights=np.sin(theta),
                                       minlength=k))})

    partial = ds.select_columns([key_col, ts_col]).map_batches(
        _partial, batch_format="pyarrow")

    def _fin(t: pa.Table) -> pa.Table:
        from .mlprep import _run_bounds
        if not t.num_rows:
            return pa.table({key_col: pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64()),
                             "c_bar": pa.array([], type=pa.float64()),
                             "s_bar": pa.array([], type=pa.float64()),
                             "r": pa.array([], type=pa.float64())})
        starts, run_id = _run_bounds(t[key_col].combine_chunks())
        n = np.bincount(run_id, weights=t["n"].to_numpy(
            zero_copy_only=False).astype(np.float64))
        cs = np.bincount(run_id, weights=t["cs"].to_numpy())
        ss = np.bincount(run_id, weights=t["ss"].to_numpy())
        cb, sb = cs / n, ss / n
        ok = n >= min_n
        keys = t[key_col].combine_chunks().take(pa.array(starts))
        out = pa.table({
            key_col: keys,
            "n": pa.array(n.astype(np.int64)),
            "c_bar": pa.array(np.round(cb, round_to)),
            "s_bar": pa.array(np.round(sb, round_to)),
            "r": pa.array(np.round(np.sqrt(cb * cb + sb * sb),
                                   round_to))})
        return out.filter(pa.array(ok))

    return _pm(partial, key_col, _fin, sort_by=[key_col])


# ---------------------------------------------------------------------------
# CUSUM change-point localization (integer-exact)
# ---------------------------------------------------------------------------


def changepoint(ds, key_col: str, ts_col: str, val_col: str, *,
                tiebreak_col: str, scale: int = 100, min_n: int = 4,
                round_to: int = 6):
    """Per-key CUSUM change-point LOCATION: with the key's events in
    (ts, tiebreak) order and values scaled to integers (``round(v *
    scale)``), the deviation at position k is the integer ``dev_k =
    |n * S_k - k * S_n|`` (the bridge |S_k - k*mean| times n, exact in
    int64) and the change point is the FIRST k attaining the maximum.
    Integer deviations make the argmax deterministic across engines —
    the float bridge of ``cusum_stat`` localizes ambiguously when two
    positions differ at the 1e-12 level.  Returns the 1-based k, the
    timestamp there, and the normalized magnitude ``dev* / (n *
    sd_pop(v_int) * sqrt(n))`` (round hedge).

    Scale shape: identical to ``cusum_stat`` — ONE keyed exchange,
    global-cumsum-minus-offset segmented bridge, ``maximum.reduceat``
    + first-hit scan; no driver loop."""
    from .mlprep import _run_bounds
    from .partition import partition_map

    def _fin(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({key_col: pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64()),
                             "k_star": pa.array([], type=pa.int64()),
                             "ts_star": pa.array([], type=pa.timestamp("us")),
                             "magnitude": pa.array([], type=pa.float64())})
        starts, run_id = _run_bounds(t[key_col].combine_chunks())
        v = np.round(t[val_col].to_numpy(zero_copy_only=False)
                     .astype(np.float64) * scale).astype(np.int64)
        cnt = np.bincount(run_id).astype(np.int64)
        cs = np.cumsum(v)
        off = np.concatenate(([0], cs[starts[1:] - 1])) \
            if len(starts) > 1 else np.zeros(1, dtype=np.int64)
        local = cs - off[run_id]                       # S_k (int64)
        tot = np.add.reduceat(v, starts)               # S_n per run
        k = (np.arange(len(v)) - starts[run_id] + 1).astype(np.int64)
        dev = np.abs(cnt[run_id] * local - k * tot[run_id])  # exact int64
        maxdev = np.maximum.reduceat(dev, starts)
        hit = dev == maxdev[run_id]
        seg = run_id[hit]
        first = np.r_[True, seg[1:] != seg[:-1]]
        pos = np.flatnonzero(hit)[first]               # first argmax row
        k_star = k[pos]
        # normalized magnitude on the scaled values (population sd)
        vf = v.astype(np.float64)
        mu = np.bincount(run_id, weights=vf) / cnt
        var = np.bincount(run_id, weights=vf * vf) / cnt - mu * mu
        sd = np.sqrt(np.maximum(var, 0.0))
        ok = (cnt >= min_n) & (sd > 0)
        mag = np.divide(maxdev.astype(np.float64),
                        cnt * sd * np.sqrt(cnt.astype(np.float64)),
                        out=np.zeros(len(cnt)), where=ok)
        keys = t[key_col].combine_chunks().take(pa.array(starts))
        out = pa.table({
            key_col: keys,
            "n": pa.array(cnt),
            "k_star": pa.array(k_star),
            "ts_star": t[ts_col].combine_chunks().take(pa.array(pos)),
            "magnitude": pa.array(np.round(mag, round_to))})
        return out.filter(pa.array(ok))

    cols = [key_col, ts_col, tiebreak_col, val_col]
    return partition_map(ds.select_columns(cols), key_col, _fin,
                         sort_by=[key_col, ts_col, tiebreak_col])


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test
# ---------------------------------------------------------------------------


def runs_test(ds, key_col: str, ts_col: str, val_col: str, *,
              tiebreak_col: str, min_each: int = 2, round_to: int = 6):
    """Per-key Wald-Wolfowitz runs test for randomness of the
    time-ordered value sequence around its key MEDIAN (lower-median
    element, the deterministic pick): rows are labeled above (v >
    med) / not-above, R = number of label runs, and under
    randomness ``E[R] = 1 + 2*n1*n2/n``, ``Var[R] = 2*n1*n2*(2*n1*n2
    - n) / (n^2 * (n-1))``, ``z = (R - E) / sqrt(Var)``.  Counts are
    integers so E/Var/z are reproducible bit-for-bit from the same
    closed forms on both engines (single round hedge on the ratios).
    Trending or oscillating keys flag as too-few / too-many runs —
    the model-free cousin of mann_kendall.

    Scale shape: ONE keyed exchange sorted by (key, ts, tiebreak);
    the per-run median is an element pick over a SECOND in-partition
    value sort (lexsort, no extra exchange), labels and run
    boundaries are shifted comparisons."""
    from .mlprep import _run_bounds
    from .partition import partition_map

    def _fin(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({key_col: pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64()),
                             "n_above": pa.array([], type=pa.int64()),
                             "n_runs": pa.array([], type=pa.int64()),
                             "z": pa.array([], type=pa.float64())})
        starts, run_id = _run_bounds(t[key_col].combine_chunks())
        v = t[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(v)
        cnt = np.bincount(run_id).astype(np.int64)
        # lower-median element per run via one segmented value sort
        order = np.lexsort((v, run_id))
        med_pos = starts + (cnt - 1) // 2
        med = v[order[med_pos]][run_id]
        above = v > med
        n1 = np.bincount(run_id[above], minlength=len(cnt)) \
            .astype(np.int64)
        n2 = cnt - n1
        boundary = np.r_[True, (above[1:] != above[:-1])
                         | (run_id[1:] != run_id[:-1])]
        runs = np.bincount(run_id[boundary], minlength=len(cnt)) \
            .astype(np.int64)
        nn = cnt.astype(np.float64)
        two = (2.0 * n1 * n2)
        e_r = 1.0 + two / nn
        var_r = np.divide(two * (two - nn), nn * nn * (nn - 1.0),
                          out=np.zeros(len(cnt)),
                          where=cnt > 1)
        ok = (n1 >= min_each) & (n2 >= min_each) & (var_r > 0)
        z = np.divide(runs - e_r, np.sqrt(np.where(ok, var_r, 1.0)),
                      out=np.zeros(len(cnt)), where=ok)
        keys = t[key_col].combine_chunks().take(pa.array(starts))
        out = pa.table({
            key_col: keys,
            "n": pa.array(cnt),
            "n_above": pa.array(n1),
            "n_runs": pa.array(runs),
            "z": pa.array(np.round(z, round_to))})
        return out.filter(pa.array(ok))

    cols = [key_col, ts_col, tiebreak_col, val_col]
    return partition_map(ds.select_columns(cols), key_col, _fin,
                         sort_by=[key_col, ts_col, tiebreak_col])


def hhi_concentration(ds, group_col: str, member_col: str, *,
                      round_to: int = 9) -> pa.Table:
    """Per-group Herfindahl–Hirschman concentration: with n(g, m) =
    row count of member ``m`` inside group ``g``, HHI(g) =
    Σ_m (n(g,m) / n(g))² — 1/|members| (uniform) … 1.0 (one member
    owns the group).  The concentration / monopolization feature for
    activity audits (is one user generating all 'purchase' events?).

    Scale shape: per-batch (group, member, n) Arrow group-by partials
    (the exchange carries distinct pairs, never the row stream — the
    vocab_richness precedent), ONE group-hash exchange via
    partition_map, in-partition pair collapse + segmented share² sums
    (two reduceat passes, no per-group Python).  Output one row per
    group.  Float note: the share² sum folds in sorted member order;
    DuckDB folds in scan order — both sides round to ``round_to``
    (the established sum-order hedge)."""
    from .partition import partition_map

    def _partial(t: pa.Table) -> pa.Table:
        g = t.select([group_col, member_col]).group_by(
            [group_col, member_col]).aggregate([([], "count_all")])
        return g.rename_columns([group_col, member_col, "n"])

    parts = ds.map_batches(_partial, batch_size=None,
                           batch_format="pyarrow")

    def _fin(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({group_col: t[group_col],
                             "n_events": pa.array([], pa.int64()),
                             "n_members": pa.array([], pa.int64()),
                             "hhi": pa.array([], pa.float64())})
        grp = t[group_col].combine_chunks()
        mem = t[member_col].combine_chunks()
        m = t.num_rows
        # pair boundary (rows sorted by (group, member)): collapse
        # duplicate (g, m) partials from different input batches
        pb = np.ones(m, dtype=bool)
        if m > 1:
            pb[1:] = (np.asarray(pc.not_equal(
                grp.slice(1, m - 1), grp.slice(0, m - 1)).to_numpy(
                zero_copy_only=False), dtype=bool)
                | np.asarray(pc.not_equal(
                    mem.slice(1, m - 1), mem.slice(0, m - 1)).to_numpy(
                    zero_copy_only=False), dtype=bool))
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        pair_n = np.add.reduceat(n, np.flatnonzero(pb))
        pair_grp = grp.take(pa.array(np.flatnonzero(pb)))
        k = len(pair_n)
        gb = np.ones(k, dtype=bool)
        if k > 1:
            gb[1:] = np.asarray(pc.not_equal(
                pair_grp.slice(1, k - 1), pair_grp.slice(0, k - 1))
                .to_numpy(zero_copy_only=False), dtype=bool)
        gs = np.flatnonzero(gb)
        tot = np.add.reduceat(pair_n, gs).astype(np.float64)
        run_id = np.cumsum(gb) - 1
        share = pair_n / tot[run_id]
        hhi = np.add.reduceat(share * share, gs)
        return pa.table({
            group_col: pair_grp.take(pa.array(gs)),
            "n_events": pa.array(tot.astype(np.int64)),
            "n_members": pa.array(np.diff(np.r_[gs, k]).astype(np.int64)),
            "hhi": pa.array(np.round(hhi, round_to))})

    return partition_map(parts, group_col, _fin,
                         sort_by=[group_col, member_col])


def period_growth(ds, cat_col: str, ts_col: str, *,
                  period_us: int = 604_800 * 10**6,
                  round_to: int = 9) -> pa.Table:
    """Period-over-period growth: event counts per (category, period
    bucket) plus the relative change vs the category's PREVIOUS
    bucket-with-data (SQL ``lag`` over existing rows, NOT the
    calendar — zero-event gaps are skipped, rule stated in the
    oracle).  The week-over-week trend feature.

    Scale shape: ONE narrow pass — per batch a (cat, period, n)
    Arrow group-by partial (≤ |cats|·|periods| rows), driver folds the
    tiny table and computes the lag with one shift.  No shuffle."""

    def _partial(t: pa.Table) -> pa.Table:
        ts = t[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        per = pc.divide(ts, period_us)
        g = pa.table({cat_col: t[cat_col], "period": per}) \
            .group_by([cat_col, "period"]).aggregate([([], "count_all")])
        return g.rename_columns([cat_col, "period", "n"])

    parts = pa.concat_tables(
        ds.map_batches(_partial, batch_size=None,
                       batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow"),
        promote_options="none")
    agg = parts.group_by([cat_col, "period"]).aggregate([("n", "sum")])
    agg = agg.sort_by([(cat_col, "ascending"), ("period", "ascending")])
    cat = agg[cat_col].combine_chunks()
    per = agg["period"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = agg["n_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
    m = len(n)
    first = np.ones(m, dtype=bool)
    if m > 1:
        first[1:] = np.asarray(pc.not_equal(
            cat.slice(1, m - 1), cat.slice(0, m - 1)).to_numpy(
            zero_copy_only=False), dtype=bool)
    prev = np.r_[0, n[:-1]].astype(np.float64)
    growth = np.round(np.divide(n - prev, prev,
                                out=np.zeros(m, dtype=np.float64),
                                where=~first), round_to)
    return pa.table({
        cat_col: cat,
        "period": pa.array(per),
        "n": pa.array(n),
        "growth": pa.array(growth, mask=first),
    })


def cond_entropy(ds, x_col: str, y_col: str, *,
                 round_to: int = 9) -> pa.Table:
    """Conditional entropy H(Y|X=x) per x plus the marginal H(Y) and
    the information gain IG = H(Y) − Σ_x p(x)·H(Y|X=x) — how much a
    feature (day-of-week, source, segment) explains a categorical
    target.  Natural-log entropy (the entropy_events convention).

    Scale shape: ONE narrow pass of (x, y, n) Arrow group-by partials
    (≤ |x|·|y| rows per batch), driver folds the contingency table and
    does O(|x|·|y|) float math.  Entropy sums fold in sorted (x, y)
    order vs DuckDB's scan order → both sides round (sum-order
    hedge).  IG is emitted as a constant column (same value every
    row) so the full computation is hash-checked."""

    def _partial(t: pa.Table) -> pa.Table:
        g = t.select([x_col, y_col]).group_by(
            [x_col, y_col]).aggregate([([], "count_all")])
        return g.rename_columns([x_col, y_col, "n"])

    parts = pa.concat_tables(
        ds.map_batches(_partial, batch_size=None,
                       batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow"),
        promote_options="none")
    agg = parts.group_by([x_col, y_col]).aggregate([("n", "sum")])
    agg = agg.sort_by([(x_col, "ascending"), (y_col, "ascending")])
    x = agg[x_col].combine_chunks()
    n = agg["n_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
    m = len(n)
    xb = np.ones(m, dtype=bool)
    if m > 1:
        xb[1:] = np.asarray(pc.not_equal(
            x.slice(1, m - 1), x.slice(0, m - 1)).to_numpy(
            zero_copy_only=False), dtype=bool)
    xs = np.flatnonzero(xb)
    nx = np.add.reduceat(n, xs).astype(np.float64)
    run_id = np.cumsum(xb) - 1
    p_in = n / nx[run_id]
    h_x = np.add.reduceat(-p_in * np.log(p_in), xs)
    total = float(n.sum())
    # marginal H(Y): fold y over all x, in sorted y order
    ya = agg.group_by([y_col]).aggregate([("n_sum", "sum")]) \
        .sort_by([(y_col, "ascending")])
    py = ya["n_sum_sum"].to_numpy(zero_copy_only=False) / total
    h_y = float(-(py * np.log(py)).sum())
    ig = h_y - float(((nx / total) * h_x).sum())
    k = len(xs)
    return pa.table({
        x_col: x.take(pa.array(xs)),
        "n": pa.array(nx.astype(np.int64)),
        "h_cond": pa.array(np.round(h_x, round_to)),
        "h_marginal": pa.array(np.full(k, round(h_y, round_to))),
        "info_gain": pa.array(np.full(k, round(ig, round_to))),
    })


def leadlag_corr(ds, ts_col: str, flag_a, flag_b, *,
                 max_lag: int = 3, day_us: int = 86_400 * 10**6,
                 round_to: int = 9) -> pa.Table:
    """Lead–lag cross-correlation between two event streams' DAILY
    counts: Pearson corr of (count_A[d], count_B[d + lag]) for lag
    0..max_lag over the full calendar spine (missing days count 0) —
    does stream A lead stream B?  The campaign-attribution /
    leading-indicator diagnostic.

    ``flag_a`` / ``flag_b``: per-batch boolean selector functions
    (pa.Table -> bool ndarray).  Scale shape: ONE narrow pass of
    (day, n_a, n_b) bincount partials, driver folds O(days) ints and
    computes the corr from EXACT integer power sums — the closed-form
    (nΣxy − ΣxΣy)/√((nΣx²−(Σx)²)(nΣy²−(Σy)²)) stated identically in
    SQL, so the only float ops are the final expression.  Zero
    variance on either side → typed NULL (rule in SQL)."""

    def _partial(t: pa.Table) -> pa.Table:
        ts = t[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        day = ts.to_numpy(zero_copy_only=False) // day_us
        a = np.asarray(flag_a(t), dtype=bool)
        b = np.asarray(flag_b(t), dtype=bool)
        days = np.unique(day)
        idx = np.searchsorted(days, day)
        na = np.bincount(idx[a], minlength=len(days))
        nb = np.bincount(idx[b], minlength=len(days))
        return pa.table({"day": pa.array(days),
                         "n_a": pa.array(na.astype(np.int64)),
                         "n_b": pa.array(nb.astype(np.int64))})

    acc: dict[int, list[int]] = {}
    for bt in ds.map_batches(_partial, batch_size=None,
                             batch_format="pyarrow") \
                .iter_batches(batch_size=None, batch_format="pyarrow"):
        for d, na, nb in zip(bt["day"].to_numpy(),
                             bt["n_a"].to_numpy(),
                             bt["n_b"].to_numpy()):
            e = acc.setdefault(int(d), [0, 0])
            e[0] += int(na)
            e[1] += int(nb)
    if not acc:
        raise ValueError("leadlag_corr: empty input")
    dmin, dmax = min(acc), max(acc)
    span = dmax - dmin + 1
    xa = np.zeros(span, dtype=np.int64)
    xb = np.zeros(span, dtype=np.int64)
    for d, (na, nb) in acc.items():
        xa[d - dmin] = na
        xb[d - dmin] = nb
    lags, nd, corr, mask = [], [], [], []
    for lag in range(max_lag + 1):
        x = xa[:span - lag] if lag else xa
        y = xb[lag:]
        m = len(x)
        sx, sy = int(x.sum()), int(y.sum())
        sxx = int((x * x).sum())
        syy = int((y * y).sum())
        sxy = int((x * y).sum())
        num = m * sxy - sx * sy
        den2 = (m * sxx - sx * sx) * (m * syy - sy * sy)
        lags.append(lag)
        nd.append(m)
        if den2 <= 0:
            corr.append(0.0)
            mask.append(True)
        else:
            corr.append(round(num / np.sqrt(1.0 * den2), round_to))
            mask.append(False)
    return pa.table({
        "lag": pa.array(lags, pa.int64()),
        "n_days": pa.array(nd, pa.int64()),
        "corr": pa.array(np.array(corr), mask=np.array(mask))})


def ks_test(ds, val_col: str, group_col: str, group_a, group_b, *,
            collect_threshold: int = 50_000_000,
            round_to: int = 9) -> pa.Table:
    """Exact two-sample Kolmogorov–Smirnov statistic between the
    ``val_col`` distributions of two groups: D = max over observed
    points of |F_a(v) − F_b(v)| with ties folded (both ECDFs evaluated
    with ≤ v, the SQL RANGE-frame rule), plus the asymptotic p-value
    2·exp(−2·D²·n_a·n_b/(n_a+n_b)) — the drift / A-B distribution
    check beside psi.

    Scale shape: ONE narrow filtered pass collects the two groups'
    value arrays (exact KS needs a global order — the exact_quantiles
    collect precedent; a loud fail above ``collect_threshold`` points
    to the documented binned-ECDF approximation for corpus-scale
    columns), one driver sort + two searchsorted.  F values are exact
    small-int divisions — identical on both engines; only the exp in
    the p-value is rounded."""

    def _p(t: pa.Table) -> pa.Table:
        g = t[group_col]
        keep = pc.or_(pc.equal(g, group_a), pc.equal(g, group_b))
        t = t.filter(keep)
        return pa.table({
            "v": t[val_col],
            "is_a": pc.equal(t[group_col], group_a)})

    va, vb = [], []
    total = 0
    for bt in ds.select_columns([val_col, group_col]) \
                .map_batches(_p, batch_size=None,
                             batch_format="pyarrow") \
                .iter_batches(batch_size=None, batch_format="pyarrow"):
        v = bt["v"].to_numpy(zero_copy_only=False)
        ia = np.asarray(bt["is_a"].to_numpy(zero_copy_only=False),
                        dtype=bool)
        va.append(v[ia])
        vb.append(v[~ia])
        total += len(v)
        if total > collect_threshold:
            raise ValueError(
                "ks_test: group sizes exceed collect_threshold="
                f"{collect_threshold}; use a binned ECDF for "
                "corpus-scale columns")
    a = np.sort(np.concatenate(va)) if va else np.empty(0)
    b = np.sort(np.concatenate(vb)) if vb else np.empty(0)
    na, nb = len(a), len(b)
    if na == 0 or nb == 0:
        raise ValueError("ks_test: empty group")
    pts = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(a, pts, side="right") / (1.0 * na)
    fb = np.searchsorted(b, pts, side="right") / (1.0 * nb)
    d = float(np.max(np.abs(fa - fb)))
    m = (1.0 * na) * nb / (na + nb)
    p = float(2.0 * np.exp(-2.0 * m * d * d))
    return pa.table({
        "n_a": pa.array([na], pa.int64()),
        "n_b": pa.array([nb], pa.int64()),
        "d_stat": pa.array([d]),
        "p_approx": pa.array([round(min(p, 1.0), round_to)])})


def mannwhitney_u(ds, val_col: str, group_col: str, group_a, group_b,
                  *, collect_threshold: int = 50_000_000,
                  round_to: int = 6) -> pa.Table:
    """Two-sample Mann–Whitney U test (rank-sum; the nonparametric
    sibling of ``welch_ttest``): pooled average ranks with the
    midrank tie rule, U_a = R_a − n_a(n_a+1)/2, and the tie-corrected
    normal-approximation z = (U_a − n_a·n_b/2) / σ with
    σ² = n_a·n_b/12 · ((n+1) − Σ(t³−t)/(n(n−1))).

    U_a is EXACT (average ranks are half-integers; their sum is a
    dyadic rational, bit-identical to SQL's window-rank route); only z
    is rounded.  Scale shape: same as ``ks_test`` — exact ranks need a
    global order, so one narrow filtered pass collects the two groups'
    values (loud fail above ``collect_threshold``; the binned-ECDF
    approximation is the documented corpus-scale path), then one
    driver sort + two searchsorted calls compute every midrank
    vectorized."""

    def _p(t: pa.Table) -> pa.Table:
        g = t[group_col]
        keep = pc.and_(
            pc.or_(pc.equal(g, group_a), pc.equal(g, group_b)),
            pc.is_valid(t[val_col]))
        t = t.filter(pc.fill_null(keep, False))
        return pa.table({
            "v": t[val_col],
            "is_a": pc.equal(t[group_col], group_a)})

    va, vb = [], []
    total = 0
    for bt in ds.select_columns([val_col, group_col]) \
                .map_batches(_p, batch_size=None,
                             batch_format="pyarrow") \
                .iter_batches(batch_size=None, batch_format="pyarrow"):
        v = bt["v"].to_numpy(zero_copy_only=False)
        ia = np.asarray(bt["is_a"].to_numpy(zero_copy_only=False),
                        dtype=bool)
        va.append(v[ia])
        vb.append(v[~ia])
        total += len(v)
        if total > collect_threshold:
            raise ValueError(
                "mannwhitney_u: group sizes exceed collect_threshold="
                f"{collect_threshold}; use a binned rank approximation "
                "for corpus-scale columns")
    a = np.concatenate(va) if va else np.empty(0)
    b = np.concatenate(vb) if vb else np.empty(0)
    na, nb = len(a), len(b)
    if na == 0 or nb == 0:
        raise ValueError("mannwhitney_u: empty group")
    pooled = np.sort(np.concatenate([a, b]))
    lo = np.searchsorted(pooled, a, side="left")
    hi = np.searchsorted(pooled, a, side="right")
    # midrank of x = (left_count + right_count + 1) / 2, 1-based
    r_a = float(np.sum((lo + hi + 1) * 0.5))
    u_a = r_a - na * (na + 1) / 2.0
    n = na + nb
    _, counts = np.unique(pooled, return_counts=True)
    c = counts.astype(np.float64)
    tt = float(np.sum(c * c * c - c))
    sigma = np.sqrt(na * nb / 12.0 * ((n + 1) - tt / (n * (n - 1.0))))
    z = (u_a - na * nb / 2.0) / sigma
    return pa.table({
        "n_a": pa.array([na], pa.int64()),
        "n_b": pa.array([nb], pa.int64()),
        "u_a": pa.array([u_a]),
        "z": pa.array([round(float(z), round_to)])})


def anova_f(ds, group_col: str, val_col: str, *,
            round_to: int = 9) -> pa.Table:
    """One-way ANOVA F statistic: does ``val_col``'s mean differ
    across ``group_col`` levels?  Power-sum algebra stated identically
    in SQL: SSB = Σ_g s1_g²/n_g − (Σs1)²/N, SSW = Σs2 − Σ_g s1_g²/n_g,
    F = (SSB/(k−1)) / (SSW/(N−k)); degenerate inputs (k < 2 or
    N ≤ k or SSW = 0) emit a typed NULL F (rule in SQL).

    Scale shape: ONE narrow pass of per-batch (group, n, Σx, Σx²)
    Arrow group-by partials, O(groups) driver fold.  Float parity:
    the raw SS terms sit on a large-magnitude cancellation (Σx² −
    Σs1²/n) whose sum-order noise (~1e-8 absolute, measured) defeats
    a 1e-9 rounding hedge, so the emitted columns are SCALE-FREE —
    η² = SSB/(SSB+SSW) (O(1), relative noise ~1e-12, rounded 9) and
    F rounded to 3 decimals (noise ≪ quantum at any corpus size);
    both sides state the identical rounding."""

    def _p(t: pa.Table) -> pa.Table:
        x = t[val_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        g = pa.table({group_col: t[group_col], "x": pa.array(x),
                      "xx": pa.array(x * x)}) \
            .group_by([group_col]) \
            .aggregate([([], "count_all"), ("x", "sum"), ("xx", "sum")])
        return g.rename_columns([group_col, "n", "s1", "s2"])

    parts = pa.concat_tables(
        ds.select_columns([group_col, val_col])
        .map_batches(_p, batch_size=None, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow"),
        promote_options="none")
    agg = parts.group_by([group_col]).aggregate(
        [("n", "sum"), ("s1", "sum"), ("s2", "sum")]) \
        .sort_by([(group_col, "ascending")])
    n = agg["n_sum"].to_numpy(zero_copy_only=False).astype(np.float64)
    s1 = agg["s1_sum"].to_numpy(zero_copy_only=False)
    s2 = agg["s2_sum"].to_numpy(zero_copy_only=False)
    k = len(n)
    nn = float(n.sum())
    within_term = float((s1 * s1 / n).sum())
    ssb = within_term - float(s1.sum()) * float(s1.sum()) / nn
    ssw = float(s2.sum()) - within_term
    f = None
    eta = None
    if k >= 2 and nn > k and ssw > 0:
        f = round((ssb / (k - 1)) / (ssw / (nn - k)), 3)
        eta = round(ssb / (ssb + ssw), round_to)
    return pa.table({
        "k": pa.array([k], pa.int64()),
        "n": pa.array([int(nn)], pa.int64()),
        "eta_sq": pa.array([eta], pa.float64()),
        "f_stat": pa.array([f], pa.float64())})


def dominant_period(ds, key_col: str, ts_col: str, *,
                    day0_epoch_day: int = 19723,
                    round_to: int = 6) -> pa.Table:
    """Per-key dominant periodicity via a daily-count periodogram:
    bucket events into days, DFT the count series (k = 1..D//2),
    report the argmax-power frequency and its period in days — the
    seasonality detector beside circadian/seasonal_dev (those assume
    the period; this FINDS it).

    Scale shape: ONE narrow (key, day) count-partial pass (the fold
    is bounded by keys × days, not rows); the periodogram itself runs
    on the driver over that tiny table.  Cross-engine determinism:
    the C/S components are rounded to ``round_to`` BEFORE squaring
    (their pre-round noise is ~1e-11 relative — far below the
    quantum — while the squared magnitudes would straddle it), so
    power values and the argmax rank bitwise-match the SQL oracle."""
    acc: dict = {}
    for bt in ds.select_columns([key_col, ts_col]) \
                .map_batches(
                    lambda t: _day_counts(t, key_col, ts_col,
                                          day0_epoch_day),
                    batch_size=None, batch_format="pyarrow") \
                .iter_batches(batch_size=None,
                              batch_format="pyarrow"):
        for k_, d_, n_ in zip(bt["k"].to_pylist(),
                              bt["day"].to_pylist(),
                              bt["n"].to_pylist()):
            acc[(k_, d_)] = acc.get((k_, d_), 0) + n_
    if not acc:
        return pa.table({key_col: pa.array([], pa.string()),
                         "dominant_k": pa.array([], pa.int64()),
                         "period_days": pa.array([], pa.float64()),
                         "power": pa.array([], pa.float64())})
    big_d = max(d_ for _, d_ in acc) + 1
    keys = sorted({k_ for k_, _ in acc})
    out_k, out_p, out_w = [], [], []
    for key in keys:
        days = np.array([d_ for (k_, d_) in acc if k_ == key])
        n = np.array([acc[(key, d_)] for d_ in days],
                     dtype=np.float64)
        best = None
        for k_ in range(1, big_d // 2 + 1):
            ang = 2 * np.pi * k_ * days / big_d
            c = round(float((n * np.cos(ang)).sum()), round_to)
            s = round(float((n * np.sin(ang)).sum()), round_to)
            pw = round(c * c + s * s, round_to)
            if best is None or pw > best[1]:
                best = (k_, pw)
        out_k.append(best[0])
        out_p.append(round(big_d * 1.0 / best[0], round_to))
        out_w.append(best[1])
    return pa.table({
        key_col: pa.array(keys),
        "dominant_k": pa.array(out_k, pa.int64()),
        "period_days": pa.array(out_p, pa.float64()),
        "power": pa.array(out_w, pa.float64())})


def _day_counts(t: pa.Table, key_col: str, ts_col: str,
                day0: int) -> pa.Table:
    ts = t[ts_col].combine_chunks()
    if pa.types.is_timestamp(ts.type):
        ts = ts.cast(pa.int64())
    day = ts.to_numpy(zero_copy_only=False) // 86_400_000_000 - day0
    key = t[key_col].combine_chunks()
    enc = pc.dictionary_encode(key)
    codes = enc.indices.to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    nd = int(day.max()) + 1 if len(day) else 0
    comb = codes * max(nd, 1) + day
    u, n = np.unique(comb, return_counts=True)
    return pa.table({
        "k": enc.dictionary.take(pa.array(u // max(nd, 1))),
        "day": pa.array((u % max(nd, 1)).astype(np.int64)),
        "n": pa.array(n.astype(np.int64))})
