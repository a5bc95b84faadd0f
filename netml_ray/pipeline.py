"""End-to-end pipelines.

``crawl_feature_pipeline`` is the flagship (BASELINE.json north_star):

  phase 0  read crawl Parquet → stateful HTML→text extraction (actor
           pool) → narrow projection (url, warc_ts, ts_sec, size),
           materialized once (html never travels past extraction)
  phase 1  global scalars: G3 session-duration quantile → ``interval``;
           G3+G4 per-session (n, duration) stats → ``dim`` / ``rate``.
           Both passes shuffle only to emit *tiny* per-session rows.
           Persisted to ``out_dir/scalars.json`` → a resume skips them.
  phase 2  ONE fused partition pass: per key-complete, time-sorted hash
           partition — G3+G4 sessionize → per-session feature vectors →
           backward as-of attach (latest completed session state, zero
           leakage) to every (url, warc_ts) event of the partition.
           With ``out_dir`` set the pass is checkpointed per partition
           (atomic writes + lineage/metrics; killed runs resume without
           recomputing completed partitions).

The data-dependent scalars (interval = q-quantile of G3 durations,
parser.py:726-729; dim = floor(quantile of session sizes),
parser.py:783-785; SAMP rate, parser.py:801-808) are why phase 1
exists — the reference's schema-from-data design forces the extra
passes; they move only per-session aggregates, not rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from netml_ray import kernels
from netml_ray.asof import asof_join
from netml_ray.features import FeatureMeta, _feature_fn, session_features
from netml_ray.partition import partition_map
from netml_ray.sessionize import (
    SESSION,
    TS_SEC,
    _g3_durations_fn,
    _key_codes,
    _per_key_session_ordinal,
    exact_quantiles,
    netml_session_pipeline,
    sessionize_simple,
    with_ts_sec,
)
from netml_ray.textops import ExtractText

FEAT_WIDTH = {
    "IAT": lambda d: d - 1,
    "SIZE": lambda d: d,
    "IAT_SIZE": lambda d: 2 * d - 1,
    "STATS": lambda d: 12,
    "SAMP_NUM": lambda d: d - 1,
    "SAMP_SIZE": lambda d: d - 1,
}


def extract_narrow(corpus_path: str, extract_concurrency=None, materialize: bool = True):
    """read → extract (per-worker-state tasks or actor pool) → narrow
    projection.  ``materialize=False`` when a single downstream consumer
    (e.g. partition_sorted) will drive the whole lineage once — skips an
    execution + driver gather."""
    import ray
    import ray.data as rd

    from netml_ray.textops import extract_text_batch

    import os

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    # bound the task count: the default reader heuristic yields thousands
    # of ~2.7k-row blocks for a sharded corpus (per-task overhead then
    # dominates), while overriding ABOVE the file count inserts a
    # SplitBlocks re-chunk that pushes every html byte through an extra
    # object-store hop (measured 24% slower on the read+extract leg).
    # Rule: never exceed the file count; otherwise ~2 blocks/cpu.
    target = max(64, 2 * ncpu)
    if os.path.isdir(corpus_path):
        nfiles = sum(1 for f in os.listdir(corpus_path) if f.endswith(".parquet"))
        target = min(nfiles, target) if nfiles else target
    ds = rd.read_parquet(
        corpus_path, columns=["url", "warc_ts", "html"],
        override_num_blocks=target,
    )
    if extract_concurrency is None:
        # default: stateless tasks with per-worker lazy extractor state —
        # same amortization as an actor pool, none of the pool spin-up
        # (12.8s vs 4.7s for 600k docs / 32 cpus measured here).  Pass an
        # int/tuple to force a real actor pool (heavy parser state).
        ds = ds.map_batches(extract_text_batch, batch_format="pyarrow", batch_size=2048)
    else:
        ds = ds.map_batches(
            ExtractText,
            fn_constructor_kwargs={"drop_html": True},
            batch_format="pyarrow",
            batch_size=2048,
            concurrency=extract_concurrency,
        )
    narrow = ds.select_columns(["url", "warc_ts", "size"])
    # ~24B/row after dropping html/text
    narrow = with_ts_sec(narrow, "warc_ts")
    return narrow.materialize() if materialize else narrow


def _g3g4_sessionize_arrays(codes, tsf, gap, interval, min_rows):
    """Shared G3+G4 kernel: returns (keep_mask, final_segment_codes)."""
    keep, g3_ord = kernels.gap_sessionize(codes, tsf, gap, min_rows=min_rows, netml=True)
    codes2 = codes[keep]
    tsf2 = tsf[keep]
    seg = kernels.encode_keys(codes2, g3_ord[keep])
    keep2, sub = kernels.interval_split(seg, tsf2, interval, min_rows=min_rows)
    final_seg = kernels.encode_keys(seg, sub)
    idx = np.flatnonzero(keep)[keep2]
    mask = np.zeros(len(codes), dtype=bool)
    mask[idx] = True
    return mask, final_seg[keep2]


def _session_scalar_stats_fn(key: str, gap: float, min_rows: int, interval: float):
    """Emit per-session (n, duration) only — feeds the dim/rate quantiles."""

    def _fn(t: pa.Table) -> pa.Table:
        codes = _key_codes(t, key)
        tsf = t[TS_SEC].to_numpy()
        mask, seg = _g3g4_sessionize_arrays(codes, tsf, gap, interval, min_rows)
        tsf2 = tsf[mask]
        starts = kernels.segment_starts(seg)
        ends = np.r_[starts[1:], len(seg)]
        return pa.table(
            {
                "n": pa.array((ends - starts).astype(np.float64)),
                "duration": pa.array(tsf2[ends - 1] - tsf2[starts] if len(starts) else np.empty(0)),
            }
        )

    return _fn


def compute_crawl_scalars(
    narrow,
    *,
    key: str = "url",
    gap: float = 600.0,
    q_interval: float = 0.9,
    min_rows: int = 2,
    feat_type: str = "STATS",
    num_partitions: int | None = None,
    parts=None,
    pid_counts=None,
) -> dict:
    """Global scalar passes.  When ``parts``/``pid_counts`` from
    ``partition_sorted`` are given, both passes are shuffle-free
    aligned maps over the already-sorted partitions."""
    from netml_ray.partition import aligned_map

    sort_by = [key, TS_SEC]
    if parts is not None:
        dur_ds = aligned_map(parts, _g3_durations_fn(key, gap, min_rows), pid_counts)
    else:
        dur_ds = partition_map(narrow, key, _g3_durations_fn(key, gap, min_rows),
                               sort_by=sort_by, num_partitions=num_partitions)
    interval = exact_quantiles(dur_ds, "duration", [q_interval])[0]

    stats_fn = _session_scalar_stats_fn(key, gap, min_rows, interval)
    if parts is not None:
        stats_ds = aligned_map(parts, stats_fn, pid_counts)
    else:
        stats_ds = partition_map(narrow, key, stats_fn, sort_by=sort_by,
                                 num_partitions=num_partitions)
    need_rate = feat_type in ("SAMP_NUM", "SAMP_SIZE")
    specs = {"n": [q_interval]}
    if need_rate:
        specs["duration"] = [0.3]
    from netml_ray.sessionize import exact_quantiles_multi

    qres = exact_quantiles_multi(stats_ds, specs)
    dim = int(np.floor(qres["n"][0]))
    rate = qres["duration"][0] if need_rate else 0.0
    return {"interval": interval, "dim": dim, "rate": rate,
            "gap": gap, "q_interval": q_interval, "min_rows": min_rows,
            "feat_type": feat_type, "width": FEAT_WIDTH[feat_type](dim)}


def _feature_matrix(meta: FeatureMeta, seg: np.ndarray, tsf2: np.ndarray,
                    sz2: np.ndarray, fft: bool) -> np.ndarray:
    """Per-session feature matrix over final-session segment codes
    (same kernels as session_features; shared by the cold fused pass
    and the hot-key session pass)."""
    ft = meta.feat_type
    if ft == "IAT":
        offsets, values = kernels.iat_lists(seg, tsf2)
        mat = kernels.pad_truncate(offsets, values, meta.width)
    elif ft == "SIZE":
        offsets, values = kernels.size_lists(seg, sz2)
        mat = kernels.pad_truncate(offsets, values, meta.width)
    elif ft == "IAT_SIZE":
        offsets, values = kernels.iat_size_lists(seg, tsf2, sz2)
        mat = kernels.pad_truncate(offsets, values, meta.width)
    elif ft == "STATS":
        mat = kernels.stats_matrix(seg, tsf2, sz2)
    elif ft == "SAMP_NUM":
        offsets, values = kernels.samp_lists(seg, tsf2, None, meta.rate)
        mat = kernels.pad_truncate(offsets, values, meta.width)
    elif ft == "SAMP_SIZE":
        offsets, values = kernels.samp_lists(seg, tsf2, sz2, meta.rate)
        mat = kernels.pad_truncate(offsets, values, meta.width)
    else:  # pragma: no cover
        raise ValueError(ft)
    if fft:
        mat = kernels.fft_real(mat, mat.shape[1])
    return mat


def _fused_fn(key: str, scalars: dict, fft: bool = False):
    """Phase-2 kernel: sessionize → features → as-of attach, all local
    to one key-complete sorted partition."""
    gap = scalars["gap"]
    interval = scalars["interval"]
    min_rows = scalars["min_rows"]
    meta = FeatureMeta(scalars["feat_type"], scalars["dim"], scalars["width"],
                       scalars["rate"], fft)

    def _fn(t: pa.Table) -> pa.Table:
        codes = _key_codes(t, key)
        tsf = t[TS_SEC].to_numpy()
        sz = t["size"].to_numpy().astype(np.float64)
        mask, seg = _g3g4_sessionize_arrays(codes, tsf, gap, interval, min_rows)
        codes2, tsf2, sz2 = codes[mask], tsf[mask], sz[mask]
        starts = kernels.segment_starts(seg)
        ends = np.r_[starts[1:], len(seg)]
        n = len(tsf)
        if len(starts) == 0:
            # no session survived in this partition → all rows unmatched
            width = meta.width
            empty = pa.ListArray.from_arrays(
                pa.array(np.zeros(n + 1, dtype=np.int64)), pa.array([], type=pa.float64())
            )
            allnull = pa.array(np.arange(n), mask=np.ones(n, dtype=bool))
            return pa.table({
                "url": t[key],
                "warc_ts": t["warc_ts"],
                "state_ts": pa.array(np.full(n, np.nan), mask=np.ones(n, dtype=bool)),
                "session_id": pa.array(np.zeros(n, dtype=np.int64), mask=np.ones(n, dtype=bool)),
                "features": pc.take(empty, allnull) if n else empty,
            })

        # feature matrix per session (same kernels as session_features)
        mat = _feature_matrix(meta, seg, tsf2, sz2, fft)

        # backward as-of: latest session (by end time) with end_sec <= ts,
        # per key — vectorized searchsorted over each key's session run
        sess_key = codes2[starts]          # key code per session
        sess_end = tsf2[ends - 1]          # state timestamp per session
        n = len(tsf)
        match = np.full(n, -1, dtype=np.int64)
        key_starts = kernels.segment_starts(codes)
        key_ends = np.r_[key_starts[1:], n]
        skey_starts = kernels.segment_starts(sess_key)
        skey_ends = np.r_[skey_starts[1:], len(sess_key)]
        smap = {int(sess_key[s]): (s, e) for s, e in zip(skey_starts, skey_ends)}
        for ks, ke in zip(key_starts, key_ends):
            rng = smap.get(int(codes[ks]))
            if rng is None:
                continue
            s, e = rng
            pos = np.searchsorted(sess_end[s:e], tsf[ks:ke], side="right") - 1
            match[ks:ke] = np.where(pos >= 0, pos + s, -1)

        nomatch = match < 0
        safe = np.where(nomatch, 0, match)
        width = mat.shape[1]
        feat_flat = mat[safe].ravel()
        feat_col = pa.ListArray.from_arrays(
            pa.array(np.arange(n + 1, dtype=np.int64) * width),
            pa.array(feat_flat),
        )
        state_ts = np.where(nomatch, np.nan, sess_end[safe])
        sess_ord = _per_key_session_ordinal(sess_key, np.arange(len(sess_key)))
        out = pa.table(
            {
                "url": t[key],
                "warc_ts": t["warc_ts"],
                "state_ts": pa.array(state_ts, mask=nomatch),
                "session_id": pa.array(
                    np.where(nomatch, 0, sess_ord[safe]), mask=nomatch
                ),
                "features": feat_col,
            }
        )
        # null-out features for unmatched rows
        if nomatch.any():
            fmask = pa.array(~nomatch)
            feat_valid = pa.ListArray.from_arrays(
                pa.array(np.arange(n + 1, dtype=np.int64) * width),
                pa.array(feat_flat),
            )
            # rebuild with validity: use if_else on list arrays via take
            take_idx = pa.array(np.arange(n), mask=nomatch)
            out = out.set_column(
                out.column_names.index("features"), "features",
                pc.take(feat_valid, take_idx),
            )
        return out

    return _fn


G3KEY = "__g3key"
HOTSALT = "__hotsalt"


def _hot_g3_parts(hotds, key: str, *, gap: float, chunk: float,
                  min_rows: int, num_partitions: int | None):
    """Hot-side G3 front half (salted plan steps 1-3):

      1. shuffle by (key, time-chunk); local G3 gap cut per chunk —
         over a NARROW (key, ts) projection, no payload travels
      2. tiny per-chunk session summaries → vectorized boundary merge
         (exact G3 incl. netml discards) on the driver
      3. shuffle surviving rows by (key, G3-session) — far finer grain
         than key — returning ``(gsum, hot_parts, hot_counts)`` for
         shuffle-free aligned maps downstream.
    """
    import ray

    from netml_ray.partition import auto_concurrency, partition_sorted
    from netml_ray.salted import (
        global_session_summary,
        merge_chunk_summaries,
        salt_and_summarize,
    )

    chunk_summ = salt_and_summarize(hotds.select_columns([key, TS_SEC]), key,
                                    gap=gap, chunk=chunk,
                                    num_partitions=num_partitions)
    summ = merge_chunk_summaries(chunk_summ, key, gap=gap, min_rows=min_rows,
                                 netml=True)
    gsum = global_session_summary(summ, key)

    # assign GLOBAL G3 ids to hot rows via broadcast per-key session
    # START boundaries (sessions partition each key's timeline, so
    # gsid = searchsorted(first_ts, ts) — no join, no row mapping
    # table).  The G3 key is the session's ROW INDEX in gsum — a plain
    # int64, so no per-row string building and the downstream shuffle
    # hashes/sorts integers (measured ~2x faster than the former
    # "url\\x1fgsid" string key at 750k hot rows)
    gsum = gsum.sort_values([key, "_gsid"], kind="stable").reset_index(drop=True)
    bnd = {}
    base = 0
    for u, g in gsum.groupby(key, sort=False):
        bnd[u] = (g["first_ts"].to_numpy().astype(np.float64),
                  g["_keep"].to_numpy().astype(bool),
                  base)
        base += len(g)
    bnd_ref = ray.put(bnd)

    class _AssignG3:
        def __init__(self):
            self.bnd = ray.get(bnd_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            n = t.num_rows
            tsf = t[TS_SEC].to_numpy()
            enc = pc.dictionary_encode(t[key].combine_chunks())
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            codes = enc.indices.to_numpy()
            g3 = np.zeros(n, dtype=np.int64)
            keepm = np.zeros(n, dtype=bool)
            for ci, u in enumerate(enc.dictionary.to_pylist()):
                b = self.bnd.get(u)
                if b is None:
                    continue
                ii = np.flatnonzero(codes == ci)
                pos = np.searchsorted(b[0], tsf[ii], side="right") - 1
                pos = np.maximum(pos, 0)
                g3[ii] = pos + b[2]
                keepm[ii] = b[1][pos]
            t = t.append_column(G3KEY, pa.array(g3))
            return t.filter(pa.array(keepm))

    hot_sess = hotds.map_batches(_AssignG3, batch_format="pyarrow",
                                 concurrency=auto_concurrency())
    # ONE shuffle of the hot rows by (key, G3 session) — the stats and
    # feature passes then run as shuffle-free aligned maps over it
    hot_parts, hot_counts = partition_sorted(
        hot_sess, G3KEY, sort_by=[G3KEY, TS_SEC],
        num_partitions=num_partitions)
    return gsum, hot_parts, hot_counts


def _hot_durations(gsum) -> np.ndarray:
    kept = gsum[gsum["_keep"]]
    return (kept["last_ts"] - kept["first_ts"]).to_numpy().astype(np.float64)


def _hot_stats_fn(interval: float, min_rows: int):
    """Per-(key, G3 session) partition → per-final-session (n, duration)."""

    def _fn(t: pa.Table) -> pa.Table:
        seg = _key_codes(t, G3KEY)
        tsf = t[TS_SEC].to_numpy()
        keep2, sub = kernels.interval_split(seg, tsf, interval, min_rows=min_rows)
        fseg = kernels.encode_keys(seg, sub)[keep2]
        tsf2 = tsf[keep2]
        starts = kernels.segment_starts(fseg)
        ends = np.r_[starts[1:], len(fseg)]
        return pa.table({
            "n": pa.array((ends - starts).astype(np.float64)),
            "duration": pa.array(tsf2[ends - 1] - tsf2[starts] if len(starts) else np.empty(0)),
        })

    return _fn


def _hot_feats_fn(key: str, meta: FeatureMeta, interval: float,
                  min_rows: int, fft: bool):
    """Per-(key, G3 session) partition → per-session feature state rows
    (key, start_sec, end_sec, features) — sessions ≪ rows."""
    width = meta.width

    def _fn(t: pa.Table) -> pa.Table:
        seg = _key_codes(t, G3KEY)
        tsf = t[TS_SEC].to_numpy()
        sz = t["size"].to_numpy().astype(np.float64)
        keep2, sub = kernels.interval_split(seg, tsf, interval, min_rows=min_rows)
        fseg = kernels.encode_keys(seg, sub)[keep2]
        tsf2 = tsf[keep2]
        sz2 = sz[keep2]
        starts = kernels.segment_starts(fseg)
        ends = np.r_[starts[1:], len(fseg)]
        if len(starts) == 0:
            return pa.table({
                key: pa.array([], type=pa.string()),
                "start_sec": pa.array([], type=pa.float64()),
                "end_sec": pa.array([], type=pa.float64()),
                "features": pa.array([], type=pa.list_(pa.float64())),
            })
        mat = _feature_matrix(meta, fseg, tsf2, sz2, fft)
        t2 = t.filter(pa.array(keep2))
        feats = pa.ListArray.from_arrays(
            pa.array(np.arange(len(starts) + 1, dtype=np.int64) * width),
            pa.array(mat.ravel()),
        )
        return pa.table({
            key: pc.take(t2[key], pa.array(starts)),
            "start_sec": pa.array(tsf2[starts]),
            "end_sec": pa.array(tsf2[ends - 1]),
            "features": feats,
        })

    return _fn


def _crawl_scalars_union(parts, pid_counts, gsum, hot_parts, hot_counts, *,
                         key: str, gap: float, q_interval: float,
                         min_rows: int, feat_type: str) -> dict:
    """Global scalars over the UNION of cold and hot per-session
    aggregates — bit-equal to the unsalted plan's scalars."""
    import ray.data as rd

    from netml_ray.partition import aligned_map
    from netml_ray.sessionize import exact_quantiles_multi

    cold_dur = aligned_map(parts, _g3_durations_fn(key, gap, min_rows), pid_counts)
    hot_dur = _hot_durations(gsum)
    dur_ds = cold_dur.union(rd.from_arrow(pa.table({"duration": pa.array(hot_dur)})))
    interval = exact_quantiles(dur_ds, "duration", [q_interval])[0]

    hot_stats = aligned_map(hot_parts, _hot_stats_fn(interval, min_rows), hot_counts)
    cold_stats = aligned_map(
        parts, _session_scalar_stats_fn(key, gap, min_rows, interval), pid_counts)
    stats_ds = cold_stats.union(hot_stats)
    need_rate = feat_type in ("SAMP_NUM", "SAMP_SIZE")
    specs = {"n": [q_interval]}
    if need_rate:
        specs["duration"] = [0.3]
    qres = exact_quantiles_multi(stats_ds, specs)
    dim = int(np.floor(qres["n"][0]))
    rate = qres["duration"][0] if need_rate else 0.0
    return {"interval": interval, "dim": dim, "rate": rate,
            "gap": gap, "q_interval": q_interval, "min_rows": min_rows,
            "feat_type": feat_type, "width": FEAT_WIDTH[feat_type](dim)}


def _hot_state_frame(hot_parts, hot_counts, key: str, feats_fn):
    """Collect the per-session hot state (sessions ≪ rows) to a pandas
    frame with a per-key session ordinal — the broadcastable as-of
    state, and exactly what ``hot_state.parquet`` persists."""
    from netml_ray.partition import aligned_map

    hot_state = aligned_map(hot_parts, feats_fn, hot_counts).to_pandas()
    hot_state = hot_state.sort_values([key, "start_sec"],
                                      kind="stable").reset_index(drop=True)
    hot_state["ord"] = hot_state.groupby(key).cumcount()
    return hot_state


def _states_dict(hot_state, key: str, width: int) -> dict:
    hot_state = hot_state.sort_values([key, "ord"], kind="stable")
    states = {}
    for u, g in hot_state.groupby(key, sort=False):
        states[u] = (
            g["end_sec"].to_numpy().astype(np.float64),
            g["ord"].to_numpy().astype(np.int64),
            np.vstack(g["features"].to_numpy()) if len(g) else np.empty((0, width)),
        )
    return states


def _attach_table(t: pa.Table, states: dict, key: str, width: int) -> pa.Table:
    """Backward as-of attach of broadcast per-key session state onto
    hot rows — streams with no shuffle (shared by the fast path's
    actor stage and the checkpointed partition writer)."""
    n = t.num_rows
    tsf = t[TS_SEC].to_numpy()
    state_ts = np.full(n, np.nan)
    sess_id = np.zeros(n, dtype=np.int64)
    nomatch = np.ones(n, dtype=bool)
    feat = np.zeros((n, width))
    enc = pc.dictionary_encode(t[key].combine_chunks())
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy()
    for ci, u in enumerate(enc.dictionary.to_pylist()):
        st = states.get(u)
        if st is None:
            continue
        ii = np.flatnonzero(codes == ci)
        ends, ords, mat = st
        pos = np.searchsorted(ends, tsf[ii], side="right") - 1
        ok = pos >= 0
        io = ii[ok]
        po = pos[ok]
        nomatch[io] = False
        state_ts[io] = ends[po]
        sess_id[io] = ords[po]
        feat[io] = mat[po]
    feat_col = pa.ListArray.from_arrays(
        pa.array(np.arange(n + 1, dtype=np.int64) * width),
        pa.array(feat.ravel()),
    )
    if nomatch.any():
        feat_col = pc.take(feat_col, pa.array(np.arange(n), mask=nomatch))
    return pa.table({
        "url": t[key],
        "warc_ts": t["warc_ts"],
        "state_ts": pa.array(state_ts, mask=nomatch),
        "session_id": pa.array(sess_id, mask=nomatch),
        "features": feat_col,
    })


def _crawl_hot_cold(
    narrow,
    hot: set,
    *,
    gap: float,
    q_interval: float,
    min_rows: int,
    feat_type: str,
    fft: bool,
    num_partitions: int | None,
    chunk: float,
):
    """Flagship with explicit hot-key (skew) handling.

    Cold keys run the ordinary single-shuffle fused plan.  Hot keys —
    whose full run cannot live in one hash partition at 10^12-row
    scale — take a salted plan that never co-locates a whole key:
    chunk-local G3 cut → driver boundary merge → per-G3-session
    features → broadcast as-of attach (see ``_hot_g3_parts`` /
    ``_attach_table``).

    The irreducible caveat: one G3 session is the reference's
    sequential G4 unit, so a single *session* too large for one task
    would need a state-relay over time chunks — G3 sessions are
    gap-bounded, making that pathology far rarer than a hot key.

    Global scalars (interval / dim / rate quantiles) are computed over
    the union of cold and hot per-session aggregates, so results are
    bit-equal to the unsalted plan (pinned by tests).
    """
    import ray

    from netml_ray.partition import aligned_map, auto_concurrency, partition_sorted
    from netml_ray.salted import split_hot

    key = "url"
    cold, hotds = split_hot(narrow, key, hot)
    # hotds is consumed by THREE passes (chunk summaries, G3 assign,
    # as-of attach) — materialize the narrow hot rows once instead of
    # re-running the split filter per consumer
    hotds = hotds.materialize()
    parts, pid_counts = partition_sorted(cold, key, sort_by=[key, TS_SEC],
                                         num_partitions=num_partitions)
    gsum, hot_parts, hot_counts = _hot_g3_parts(
        hotds, key, gap=gap, chunk=chunk, min_rows=min_rows,
        num_partitions=num_partitions)
    scalars = _crawl_scalars_union(
        parts, pid_counts, gsum, hot_parts, hot_counts,
        key=key, gap=gap, q_interval=q_interval, min_rows=min_rows,
        feat_type=feat_type)
    width = scalars["width"]
    meta = FeatureMeta(feat_type, scalars["dim"], width, scalars["rate"], fft)

    hot_state = _hot_state_frame(
        hot_parts, hot_counts, key,
        _hot_feats_fn(key, meta, scalars["interval"], min_rows, fft))
    states = _states_dict(hot_state, key, width)
    state_ref = ray.put(states)

    class _Attach:
        def __init__(self):
            self.states = ray.get(state_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            return _attach_table(t, self.states, key, width)

    hot_joined = hotds.map_batches(_Attach, batch_format="pyarrow",
                                   concurrency=auto_concurrency())
    cold_joined = aligned_map(parts, _fused_fn(key, scalars, fft), pid_counts)
    return cold_joined.union(hot_joined), scalars


def _load_or_detect_hot(out_dir: str, narrow, key: str, hot_threshold: int,
                        hot_chunk: float | None, gap: float,
                        have_done: bool) -> tuple[set, float]:
    """Persisted hot-key set for the checkpointed salted path: detected
    once (sampled) and pinned in ``hot_meta.json`` BEFORE any partition
    completes, so a resume partitions the exact same hot/cold split
    even though detection is sampling-based."""
    import json
    import os

    p = os.path.join(out_dir, "hot_meta.json")
    if os.path.exists(p):
        with open(p) as f:
            m = json.load(f)
        return set(m["hot"]), float(m["chunk"])
    if have_done:
        raise ValueError(
            f"{out_dir} has completed partitions but no hot_meta.json — "
            f"delete the directory to start fresh")
    from netml_ray.salted import hot_keys_sampled

    hot = hot_keys_sampled(narrow, key, hot_threshold)
    chunk = hot_chunk if hot_chunk is not None else max(3600.0, 200.0 * gap)
    os.makedirs(out_dir, exist_ok=True)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"hot": sorted(hot), "chunk": chunk}, f)
    os.replace(tmp, p)
    return hot, chunk


def _crawl_hot_cold_checkpointed(
    narrow,
    hot: set,
    *,
    out_dir: str,
    num_partitions: int,
    done_recs: dict,
    gap: float,
    q_interval: float,
    min_rows: int,
    feat_type: str,
    fft: bool,
    chunk: float,
    corpus_path: str,
):
    """Checkpointed flagship WITH hot-key salting — the two
    scale-critical features combined (VERDICT r2 #1): a long skewed run
    is exactly the one that gets killed mid-way, so the 100-TB flagship
    needs resume AND the salted plan together.

    Checkpoint layout extends the unsalted one:

      part=0..P-1          cold fused partitions (as the unsalted path)
      part=P..2P-1         hot as-of output, partitioned by
                           hash(key, time-chunk) — DETERMINISTIC
                           membership, so a resume filters completed
                           hot chunks out before the shuffle
      hot_meta.json        pinned hot-key set + chunk width
      hot_state/           per-session hot state (sessions ≪ rows),
                           SHARDED parquet + _manifest.json (committed
                           last), persisted before any partition
                           completes — a resume broadcasts it without
                           recomputing the salted G3 passes
      scalars.json         global scalars (union of cold + hot)
      complete.json        written after both sides finish

    Invariant: ``scalars.json`` and the hot-state shards are written
    BEFORE the first partition completes, so any resume with completed
    partitions can load both; results are bit-equal to the unsalted
    fast path (pinned by tests).
    """
    import json
    import os

    import ray

    from netml_ray.checkpoint import (
        checkpointed_write_from_parts,
        completed_partitions,
        filter_pids,
        have_hot_state,
        load_hot_state,
        load_scalars,
        read_checkpointed,
        save_hot_state,
        save_scalars,
    )
    from netml_ray.partition import partition_sorted
    from netml_ray.salted import split_hot

    key = "url"
    P = num_partitions
    done = set(done_recs)
    complete_path = os.path.join(out_dir, "complete.json")
    scalars = load_scalars(out_dir)
    if scalars is not None and any(
        scalars.get(k) != v
        for k, v in (("feat_type", feat_type), ("gap", gap),
                     ("q_interval", q_interval), ("min_rows", min_rows))
    ):
        scalars = None  # stale scalars — recompute
    have_state = have_hot_state(out_dir)
    if scalars is not None and have_state and os.path.exists(complete_path):
        return read_checkpointed(out_dir), scalars  # fully complete

    cold, hotds = split_hot(narrow, key, hot)
    hotds = hotds.materialize()  # three consumers (see _crawl_hot_cold)

    if scalars is None or not have_state:
        if done:
            raise ValueError(
                f"{out_dir} has completed partitions but no matching "
                f"scalars.json / hot_state — delete the directory "
                f"to start fresh")
        parts, pid_counts = partition_sorted(
            cold, key, sort_by=[key, TS_SEC], num_partitions=P)
        gsum, hot_parts, hot_counts = _hot_g3_parts(
            hotds, key, gap=gap, chunk=chunk, min_rows=min_rows,
            num_partitions=P)
        scalars = _crawl_scalars_union(
            parts, pid_counts, gsum, hot_parts, hot_counts,
            key=key, gap=gap, q_interval=q_interval, min_rows=min_rows,
            feat_type=feat_type)
        save_scalars(out_dir, scalars)
        width = scalars["width"]
        meta = FeatureMeta(feat_type, scalars["dim"], width, scalars["rate"], fft)
        hot_state = _hot_state_frame(
            hot_parts, hot_counts, key,
            _hot_feats_fn(key, meta, scalars["interval"], min_rows, fft))
        st_tbl = pa.Table.from_pandas(
            hot_state[[key, "start_sec", "end_sec", "features", "ord"]],
            preserve_index=False)
        save_hot_state(out_dir, st_tbl)
    else:
        width = scalars["width"]
        cold_done = {p for p in done if p < P}
        remaining = filter_pids(cold, key, P, cold_done)
        parts, pid_counts = partition_sorted(
            remaining, key, sort_by=[key, TS_SEC], num_partitions=P)
        hot_state = load_hot_state(out_dir).to_pandas()

    states = _states_dict(hot_state, key, width)
    state_ref = ray.put(states)

    # cold fused partitions → part=0..P-1 (identical to the unsalted path)
    checkpointed_write_from_parts(parts, _fused_fn(key, scalars, fft),
                                  out_dir, input_desc=corpus_path)

    # hot attach partitions → part=P..2P-1: membership is
    # hash(key, time-chunk) — a pure function of the row, so a resume
    # filters completed hot chunks out BEFORE the shuffle
    def _add_hotsalt(t: pa.Table) -> pa.Table:
        salt = np.floor(t[TS_SEC].to_numpy() / chunk).astype(np.int64)
        combo = pc.binary_join_element_wise(
            pc.cast(t[key], pa.string()),
            pa.array(salt.astype(str), type=pa.string()), "\x1f")
        return t.append_column(HOTSALT, combo)

    hot_rows = hotds.map_batches(_add_hotsalt, batch_format="pyarrow")
    hot_done = {p - P for p in done if p >= P}
    if hot_done:
        hot_rows = filter_pids(hot_rows, HOTSALT, P, hot_done)
    hparts, _ = partition_sorted(hot_rows, HOTSALT,
                                 sort_by=[HOTSALT, TS_SEC],
                                 num_partitions=P)

    def _attach_fn(t: pa.Table) -> pa.Table:
        return _attach_table(t.drop_columns([HOTSALT]), ray.get(state_ref),
                             key, width)

    checkpointed_write_from_parts(hparts, _attach_fn, out_dir,
                                  input_desc=corpus_path, pid_offset=P)

    tmp = complete_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"pids": sorted(completed_partitions(out_dir))}, f)
    os.replace(tmp, complete_path)
    return read_checkpointed(out_dir), scalars


def crawl_feature_pipeline(
    corpus_path: str,
    *,
    feat_type: str = "STATS",
    gap: float = 600.0,
    q_interval: float = 0.9,
    min_rows: int = 2,
    fft: bool = False,
    extract_concurrency=None,
    num_partitions: int | None = None,
    out_dir: str | None = None,
    hot_threshold: int | None = None,
    hot_chunk: float | None = None,
):
    """Flagship pipeline (see module docstring).

    Returns ``(joined_ds, scalars)``.  With ``out_dir`` the fused phase
    is checkpointed per partition and a rerun resumes (scalars are also
    persisted and skipped on resume).

    ``hot_threshold`` (rows per key) triggers explicit skew handling:
    keys above it take the salted two-phase plan (``_crawl_hot_cold``)
    instead of landing whole in one hash partition; results are
    identical (pinned by tests).  Combined with ``out_dir`` the salted
    plan is also checkpointed (``_crawl_hot_cold_checkpointed``): cold
    fused partitions and hot ``(key, time-chunk)`` output partitions
    both resume without recomputation.
    """
    from netml_ray.checkpoint import load_scalars, read_checkpointed, save_scalars
    from netml_ray.partition import aligned_map, partition_sorted

    narrow = extract_narrow(
        corpus_path, extract_concurrency,
        materialize=bool(out_dir) or hot_threshold is not None,
    )

    if hot_threshold is not None and not out_dir:
        from netml_ray.salted import hot_keys_sampled

        # sampled detection: exact per-key counts would shuffle one
        # group per key (billions at 10^12 rows); the sample keeps the
        # count table at ~oversample/threshold of the input with a 2x
        # safety margin on the hot cut (over-salting a warm key is
        # mild overhead; missing a hot key is the expensive failure)
        hot = hot_keys_sampled(narrow, "url", hot_threshold)
        if hot:
            chunk = hot_chunk if hot_chunk is not None else max(3600.0, 200.0 * gap)
            return _crawl_hot_cold(
                narrow, hot, gap=gap, q_interval=q_interval, min_rows=min_rows,
                feat_type=feat_type, fft=fft, num_partitions=num_partitions,
                chunk=chunk,
            )

    if out_dir:
        # resumable path — SAME single-shuffle plan as the fast path:
        # completed pids are filtered out BEFORE the one sort-partition
        # shuffle, the scalar passes run as shuffle-free aligned maps
        # over the sorted partitions (skipped entirely on resume —
        # scalars.json is written before any partition completes), and
        # the fused pass writes each complete partition atomically with
        # lineage.  ALL run parameters are pinned: scalars.json carries
        # the ones the fused kernel reads (recomputed if any differ) and
        # the full set — incl. fft and the corpus path — goes into the
        # checkpoint manifest so a rerun with different parameters
        # cannot silently mix stale completed partitions with new ones.
        from netml_ray.checkpoint import (
            checkpointed_write_from_parts,
            completed_partitions,
            filter_pids,
            validate_or_init_manifest,
        )

        run_params = {"feat_type": feat_type, "gap": gap,
                      "q_interval": q_interval, "min_rows": min_rows,
                      "fft": fft, "corpus": corpus_path,
                      "hot_threshold": hot_threshold, "hot_chunk": hot_chunk}
        num_partitions, done_recs = validate_or_init_manifest(
            out_dir, "url", num_partitions, run_params)
        if hot_threshold is not None:
            hot, chunk = _load_or_detect_hot(
                out_dir, narrow, "url", hot_threshold, hot_chunk, gap,
                bool(done_recs))
            if hot:
                return _crawl_hot_cold_checkpointed(
                    narrow, hot, out_dir=out_dir,
                    num_partitions=num_partitions, done_recs=done_recs,
                    gap=gap, q_interval=q_interval, min_rows=min_rows,
                    feat_type=feat_type, fft=fft, chunk=chunk,
                    corpus_path=corpus_path)
        done = set(done_recs)
        scalars = load_scalars(out_dir)
        if scalars is not None and any(
            scalars.get(k) != run_params[k]
            for k in ("feat_type", "gap", "q_interval", "min_rows")
        ):
            scalars = None  # stale scalars — recompute
        if scalars is not None and len(done) >= num_partitions:
            return read_checkpointed(out_dir), scalars  # fully complete
        remaining = filter_pids(narrow, "url", num_partitions, done)
        parts, pid_counts = partition_sorted(
            remaining, "url", sort_by=["url", TS_SEC],
            num_partitions=num_partitions)
        if scalars is None:
            if done:
                # scalars.json is written before the first partition
                # completes; reaching here means it was deleted or the
                # scalar-relevant params changed under existing output
                raise ValueError(
                    f"{out_dir} has completed partitions but no matching "
                    f"scalars.json — delete the directory to start fresh")
            scalars = compute_crawl_scalars(
                narrow, gap=gap, q_interval=q_interval, min_rows=min_rows,
                feat_type=feat_type, parts=parts, pid_counts=pid_counts,
            )
            save_scalars(out_dir, scalars)
        if len(done) < num_partitions:
            checkpointed_write_from_parts(
                parts, _fused_fn("url", scalars, fft), out_dir,
                input_desc=corpus_path)
        return read_checkpointed(out_dir), scalars

    # fast path: ONE shuffle (sort-partition), then every pass — the two
    # scalar passes and the fused sessionize+features+as-of pass — is a
    # shuffle-free aligned map over the sorted partitions
    parts, pid_counts = partition_sorted(
        narrow, "url", sort_by=["url", TS_SEC], num_partitions=num_partitions
    )
    scalars = compute_crawl_scalars(
        narrow, gap=gap, q_interval=q_interval, min_rows=min_rows,
        feat_type=feat_type, parts=parts, pid_counts=pid_counts,
    )
    joined = aligned_map(parts, _fused_fn("url", scalars, fft), pid_counts)
    return joined, scalars


def events_session_pipeline(
    sf_dir: str,
    *,
    gap: float = 43200.0,
    num_partitions: int | None = None,
):
    """Flagship over the driver's ``events`` table: sessionize per
    user_id, per-session stats state, as-of join the latest *closed*
    session's stats onto every event (strictly-before → leak-free)."""
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"])
    ev = with_ts_sec(ev, "ts")
    sess = sessionize_simple(ev, key="user_id", ts_col="ts", gap=gap,
                             tiebreak="event_id", num_partitions=num_partitions)
    sess = sess.materialize()

    def _summarize(t: pa.Table) -> pa.Table:
        codes = _key_codes(t, "user_id")
        sess_ids = t[SESSION].to_numpy()
        seg = kernels.encode_keys(codes, sess_ids)
        starts = kernels.segment_starts(seg)
        ends = np.r_[starts[1:], len(seg)]
        v = t["value"].to_numpy().astype(np.float64)
        tsf = t[TS_SEC].to_numpy()
        lens = (ends - starts).astype(np.float64)
        sums = np.add.reduceat(v, starts)
        return pa.table(
            {
                "user_id": pc.take(t["user_id"], pa.array(starts)),
                SESSION: pa.array(sess_ids[starts]),
                "s_n": pa.array((ends - starts).astype(np.int64)),
                "s_mean": pa.array(sums / lens),
                "s_min": pa.array(np.minimum.reduceat(v, starts)),
                "s_max": pa.array(np.maximum.reduceat(v, starts)),
                "end_sec": pa.array(tsf[ends - 1]),
            }
        )

    state = partition_map(
        sess, "user_id", _summarize,
        sort_by=["user_id", SESSION, TS_SEC, "event_id"],
        num_partitions=num_partitions,
    ).materialize()  # one row per session — pin for the as-of shuffle

    joined = asof_join(
        sess.select_columns(["event_id", "user_id", TS_SEC, "value", SESSION]),
        state,
        key="user_id",
        left_ts=TS_SEC,
        right_ts="end_sec",
        strict=True,  # only *closed* earlier sessions → no leakage
        left_tiebreak="event_id",
        num_partitions=num_partitions,
    )
    return joined
