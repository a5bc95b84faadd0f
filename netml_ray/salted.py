"""Explicit hot-key (skew) handling: salted sessionization.

A single hot url (the corpus generator plants one with ~20% of all
rows) lands every row in one hash partition under plain
``partition_map`` — one straggler task and, at 10^12-row scale, a
partition that cannot fit a worker.  The salted path splits a hot key's
timeline into contiguous time chunks (``salt = floor(ts / chunk)``),
sessionizes each chunk independently, and runs a *small* boundary-merge
pass over per-chunk session summaries (sessions ≪ rows) to stitch
sessions that span chunk edges — the two-phase design SURVEY §7.4
calls for.

    phase A   per-key counts (partial agg) → hot key set (broadcast)
    phase B   cold keys → ordinary sessionize (one shuffle)
              hot keys → shuffle by (key, salt); local gap cut;
                         emit rows + (salt, local_sid)
    phase C   per-(key, salt, local_sid) summaries (first/last ts, n) —
              tiny — merged sequentially per key on the driver:
              sessions merge across a chunk edge iff the boundary gap
              ≤ gap; global ids + netml keep-flags (trailing-session
              discard, min-rows) derived from merged counts
    phase D   broadcast {(key, salt, lsid) → (session_id, keep)} and
              map it over the salted rows — no further shuffle

Equivalence to the unsalted operators is pinned by tests (same session
sets for simple AND netml modes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from netml_ray import kernels
from netml_ray.partition import partition_map
from netml_ray.sessionize import SESSION, TS_SEC, _key_codes, with_ts_sec

SALT = "__salt"
LSID = "__lsid"


def hot_keys(ds, key: str, threshold: int) -> set:
    """Keys with more than ``threshold`` rows (partial agg + tiny groupby)."""
    from ray.data.aggregate import Sum

    def _partial(t: pa.Table) -> pa.Table:
        vc = t[key].combine_chunks().value_counts()
        return pa.table({key: vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    agg = ds.map_batches(_partial, batch_format="pyarrow").groupby(key).aggregate(
        Sum("n", alias_name="n")
    )
    out = set()
    for b in agg.iter_batches(batch_format="pyarrow", batch_size=1 << 16):
        m = pc.greater(b["n"], pa.scalar(threshold))
        out.update(b.filter(m)[key].to_pylist())
    return out


def hot_keys_sampled(ds, key: str, threshold: int, *,
                     oversample: float = 50.0, seed: int = 0) -> set:
    """Scale path for hot-key detection: the exact ``hot_keys`` groupby
    counts EVERY key (at 10^12 rows that is billions of groups through
    a shuffle); here rows are hash-sampled at rate p = oversample /
    threshold, so a key at the threshold yields ~``oversample``
    expected sample hits and the per-key count table is ~p·n rows.
    Keys whose scaled estimate exceeds threshold/2 are returned —
    the deliberate 2x safety margin makes missing a truly hot key
    (the expensive failure) vanishingly unlikely (Chernoff: p < 1e-9
    at oversample=50), at the cost of salting a few borderline-warm
    keys, which is only mild overhead.  Deterministic: the sample is
    keyed on a hash of (key, row-position-independent content)."""
    from ray.data.aggregate import Sum

    p = min(1.0, oversample / max(threshold, 1))
    if p >= 1.0:
        return hot_keys(ds, key, threshold)
    thresh32 = np.uint64(int(p * (1 << 32)))

    def _partial(t: pa.Table) -> pa.Table:
        # per-row hash over (key, ts) content → deterministic sample
        import polars as pl

        h = pl.from_arrow(t).hash_rows(seed=seed).to_numpy()
        keep = (h % np.uint64(1 << 32)) < thresh32
        sub = t.filter(pa.array(keep))
        vc = sub[key].combine_chunks().value_counts()
        return pa.table({key: vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    agg = ds.map_batches(_partial, batch_format="pyarrow").groupby(key).aggregate(
        Sum("n", alias_name="n"))
    out = set()
    cut = (threshold / 2.0) * p
    for b in agg.iter_batches(batch_format="pyarrow", batch_size=1 << 16):
        m = pc.greater(b["n"], pa.scalar(cut))
        out.update(b.filter(m)[key].to_pylist())
    return out


def split_hot(ds, key: str, hot: set):
    """Split a dataset into (cold, hot) by membership of ``key`` in the
    broadcast ``hot`` set (vectorized ``pc.is_in``)."""
    import ray

    hot_ref = ray.put(pa.array(sorted(hot)))

    def _split(want_hot: bool):
        def _f(t: pa.Table) -> pa.Table:
            mask = pc.fill_null(pc.is_in(t[key], value_set=ray.get(hot_ref)), False)
            return t.filter(mask if want_hot else pc.invert(mask))

        return _f

    return (ds.map_batches(_split(False), batch_format="pyarrow"),
            ds.map_batches(_split(True), batch_format="pyarrow"))


def salt_and_cut(hotds, key: str, *, gap: float, chunk: float,
                 tiebreak: str | None = None,
                 num_partitions: int | None = None):
    """Phase B+C front half: salt hot rows by time chunk, gap-cut each
    (key, chunk) locally, and aggregate per-(key, salt, local-sid)
    summaries (first/last ts, n — tiny: sessions ≪ rows).

    Returns ``(salted_rows_ds, summary_df)``; rows carry ``__salt``,
    ``__lsid`` and ``__saltkey``; the summary is a pandas frame sorted
    by (key, salt, lsid) ready for ``merge_chunk_summaries``.
    """

    def _add_salt(t: pa.Table) -> pa.Table:
        salt = np.floor(t[TS_SEC].to_numpy() / chunk).astype(np.int64)
        t = t.append_column(SALT, pa.array(salt))
        combo = pc.binary_join_element_wise(
            pc.cast(t[key], pa.string()), pc.cast(t[SALT], pa.string()), "\x1f"
        )
        return t.append_column("__saltkey", combo)

    hotds = hotds.map_batches(_add_salt, batch_format="pyarrow")
    sort_by = ["__saltkey", TS_SEC] + ([tiebreak] if tiebreak else [])

    def _local_cut(t: pa.Table) -> pa.Table:
        codes = _key_codes(t, "__saltkey")
        tsf = t[TS_SEC].to_numpy()
        _, lsid = kernels.gap_sessionize(codes, tsf, gap, netml=False)
        return t.append_column(LSID, pa.array(lsid))

    salted = partition_map(hotds, "__saltkey", _local_cut, sort_by=sort_by,
                           num_partitions=num_partitions).materialize()

    def _summ(t: pa.Table) -> pa.Table:
        t = t.sort_by([(key, "ascending"), (SALT, "ascending"), (LSID, "ascending"),
                       (TS_SEC, "ascending")])
        codes = _key_codes(t, key)
        seg = kernels.encode_keys(codes, t[SALT].to_numpy(), t[LSID].to_numpy())
        starts = kernels.segment_starts(seg)
        ends = np.r_[starts[1:], len(seg)]
        tsf = t[TS_SEC].to_numpy()
        return pa.table({
            key: pc.take(t[key], pa.array(starts)),
            SALT: pa.array(t[SALT].to_numpy()[starts]),
            LSID: pa.array(t[LSID].to_numpy()[starts]),
            "first_ts": pa.array(tsf[starts]),
            "last_ts": pa.array(tsf[ends - 1]),
            "n": pa.array((ends - starts).astype(np.int64)),
        })

    from ray.data.aggregate import Max, Min, Sum

    summ = (
        salted.map_batches(_summ, batch_format="pyarrow")
        .groupby([key, SALT, LSID])
        .aggregate(Min("first_ts", alias_name="first_ts"),
                   Max("last_ts", alias_name="last_ts"),
                   Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values([key, SALT, LSID], kind="stable")
        .reset_index(drop=True)
    )
    return salted, summ


def salt_and_summarize(hotds, key: str, *, gap: float, chunk: float,
                       num_partitions: int | None = None) -> pd.DataFrame:
    """Flagship front half (r2 #8 overhead cut): per-(key, salt,
    local-sid) session summaries WITHOUT materializing the salted rows.

    ``salt_and_cut`` shuffles the hot rows by (key, time-chunk),
    materializes them, re-maps for summaries, and runs a summary
    groupby — but the G3 boundary merge needs only the summaries
    (sessions ≪ rows).  Here the chunk-local gap cut and the summary
    aggregation fuse into ONE partition fn: each (key, chunk) group is
    whole inside its ``partition_map`` partition, so the per-group
    summaries are exact with no follow-up groupby, and only tiny
    summary rows leave the pass."""

    def _add_salt(t: pa.Table) -> pa.Table:
        salt = np.floor(t[TS_SEC].to_numpy() / chunk).astype(np.int64)
        t = t.append_column(SALT, pa.array(salt))
        combo = pc.binary_join_element_wise(
            pc.cast(t[key], pa.string()), pc.cast(t[SALT], pa.string()), "\x1f"
        )
        return t.append_column("__saltkey", combo)

    hotds = hotds.map_batches(_add_salt, batch_format="pyarrow")

    def _cut_summ(t: pa.Table) -> pa.Table:
        codes = _key_codes(t, "__saltkey")
        tsf = t[TS_SEC].to_numpy()
        _, lsid = kernels.gap_sessionize(codes, tsf, gap, netml=False)
        seg = kernels.encode_keys(codes, lsid)
        starts = kernels.segment_starts(seg)
        ends = np.r_[starts[1:], len(seg)]
        return pa.table({
            key: pc.take(t[key], pa.array(starts)),
            SALT: pa.array(t[SALT].to_numpy()[starts]),
            LSID: pa.array(lsid[starts]),
            "first_ts": pa.array(tsf[starts]),
            "last_ts": pa.array(tsf[ends - 1] if len(starts) else np.empty(0)),
            "n": pa.array((ends - starts).astype(np.int64)),
        })

    summ_ds = partition_map(hotds, "__saltkey", _cut_summ,
                            sort_by=["__saltkey", TS_SEC],
                            num_partitions=num_partitions)
    summ = (summ_ds.to_pandas()
            .sort_values([key, SALT, LSID], kind="stable")
            .reset_index(drop=True))
    return summ


def merge_chunk_summaries(summ: pd.DataFrame, key: str, *, gap: float,
                          min_rows: int, netml: bool) -> pd.DataFrame:
    """Stitch per-chunk local sessions into global G3 sessions
    (vectorized — no iterrows): sessions merge across a chunk edge iff
    the boundary gap ≤ gap; netml keep rules (pre-size filter,
    trailing-session discard, post min-rows) applied on merged counts.

    Adds ``_gsid`` (global session ordinal per key) and ``_keep``;
    the per-global-session aggregate view is available via
    ``global_session_summary``.
    """
    n = len(summ)
    if n == 0:
        summ = summ.copy()
        summ["_gsid"] = np.zeros(0, dtype=np.int64)
        summ["_keep"] = np.zeros(0, dtype=bool)
        return summ
    k = summ[key].to_numpy()
    ft = summ["first_ts"].to_numpy()
    lt = summ["last_ts"].to_numpy()
    new_key = np.r_[True, k[1:] != k[:-1]]
    prev_last = np.r_[0.0, lt[:-1]]
    cut = new_key | (ft - prev_last > gap)
    gs = np.cumsum(cut) - 1
    key_start = np.maximum.accumulate(np.where(new_key, np.arange(n), 0))
    gsid = gs - gs[key_start]
    summ = summ.copy()
    summ["_gsid"] = gsid

    keep = np.ones(n, dtype=bool)
    if netml:
        cnt = summ["n"].to_numpy()
        # per-(key, gsid) merged counts + per-key totals / max gsid
        sess_count = np.zeros(gs[-1] + 1, dtype=np.int64)
        np.add.at(sess_count, gs, cnt)
        kcodes = np.cumsum(new_key) - 1
        key_total = np.zeros(kcodes[-1] + 1, dtype=np.int64)
        np.add.at(key_total, kcodes, cnt)
        key_max_gsid = np.zeros(kcodes[-1] + 1, dtype=np.int64)
        np.maximum.at(key_max_gsid, kcodes, gsid)
        keep &= key_total[kcodes] >= max(2, min_rows)      # pre-size filter
        split_key = key_max_gsid > 0
        keep &= ~(split_key[kcodes] & (gsid == key_max_gsid[kcodes]))  # trailing
        keep &= sess_count[gs] >= min_rows                 # post min-rows
    summ["_keep"] = keep
    return summ


def global_session_summary(summ: pd.DataFrame, key: str) -> pd.DataFrame:
    """Per-(key, _gsid) aggregate of a merged chunk summary: first/last
    ts, total rows, keep flag (uniform within a global session)."""
    g = summ.groupby([key, "_gsid"], sort=True)
    out = g.agg(first_ts=("first_ts", "min"), last_ts=("last_ts", "max"),
                n=("n", "sum"), _keep=("_keep", "all")).reset_index()
    return out


def sessionize_salted(
    ds,
    key: str = "url",
    ts_col: str = "warc_ts",
    *,
    gap: float = 600.0,
    netml: bool = False,
    min_rows: int = 2,
    hot_threshold: int = 1_000_000,
    chunk: float | None = None,
    tiebreak: str | None = None,
    num_partitions: int | None = None,
):
    """Sessionize with explicit salting for hot keys.

    Output schema matches ``sessionize_simple`` / ``sessionize_netml``:
    input rows (+ ``ts_sec``) + ``session_id``; in netml mode filtered
    rows are dropped.  ``chunk`` defaults to ``max(3600, 200 * gap)``.
    """
    import ray

    from netml_ray.sessionize import sessionize_netml as _netml
    from netml_ray.sessionize import sessionize_simple as _simple

    if chunk is None:
        chunk = max(3600.0, 200.0 * gap)
    ds = with_ts_sec(ds, ts_col)
    hot = hot_keys(ds, key, hot_threshold)
    if not hot:
        f = _netml if netml else _simple
        return f(ds, key=key, ts_col=ts_col, gap=gap, tiebreak=tiebreak,
                 num_partitions=num_partitions, **({"min_rows": min_rows} if netml else {}))

    cold, hotds = split_hot(ds, key, hot)

    f = _netml if netml else _simple
    cold_out = f(cold, key=key, ts_col=ts_col, gap=gap, tiebreak=tiebreak,
                 num_partitions=num_partitions, **({"min_rows": min_rows} if netml else {}))

    salted, summ = salt_and_cut(hotds, key, gap=gap, chunk=chunk,
                                tiebreak=tiebreak, num_partitions=num_partitions)
    summ = merge_chunk_summaries(summ, key, gap=gap, min_rows=min_rows, netml=netml)

    mapping = summ[[key, SALT, LSID, "_gsid", "_keep"]]
    map_ref = ray.put(mapping)

    class _Apply:
        def __init__(self):
            self.map = ray.get(map_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            df = pa.table({key: t[key], SALT: t[SALT], LSID: t[LSID]}).to_pandas()
            m = df.merge(self.map, on=[key, SALT, LSID], how="left")
            t = t.append_column(SESSION, pa.array(m["_gsid"].to_numpy().astype(np.int64)))
            t = t.filter(pa.array(m["_keep"].to_numpy()))
            return t.drop_columns([SALT, LSID, "__saltkey"])

    from netml_ray.partition import auto_concurrency

    hot_out = salted.map_batches(_Apply, batch_format="pyarrow",
                                 concurrency=auto_concurrency())
    return cold_out.union(hot_out)
