"""End-to-end pipelines.

``crawl_feature_pipeline`` is the flagship (BASELINE.json north_star):
read crawl Parquet → stateful HTML→text extraction (actor pool) →
project narrow → netml sessionization (G3+G4, data-dependent interval)
→ per-session feature vectors (data-dependent dim) → backward as-of
join attaching each url's latest completed-session feature state to
every (url, warc_ts) crawl event with zero temporal leakage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from netml_ray.asof import asof_join
from netml_ray.features import session_features
from netml_ray.sessionize import (
    SESSION,
    TS_SEC,
    netml_session_pipeline,
    sessionize_simple,
    with_ts_sec,
)
from netml_ray.textops import ExtractText


def crawl_feature_pipeline(
    corpus_path: str,
    *,
    feat_type: str = "STATS",
    gap: float = 600.0,
    q_interval: float = 0.9,
    extract_concurrency=None,
    num_partitions: int | None = None,
    keep_text: bool = False,
):
    """Returns ``(joined_ds, meta)``.

    ``joined_ds`` rows: every crawl event ``(url, warc_ts)`` with the
    latest-known session feature state (``features``, ``state_ts`` =
    session end) attached; events before any completed session carry
    nulls.  ``state_ts <= warc_ts`` for every matched row (leak-free).
    """
    import ray.data as rd

    import ray

    if extract_concurrency is None:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        extract_concurrency = (1, max(2, ncpu - 2))
    ds = rd.read_parquet(corpus_path, columns=["url", "warc_ts", "html"])
    ds = ds.map_batches(
        ExtractText,
        fn_constructor_kwargs={"drop_html": True},
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=extract_concurrency,
    )
    narrow = ds.select_columns(["url", "warc_ts", "size"])
    # materialize the narrow projection ONCE: it is consumed three times
    # (G3-durations pass, G3+G4 pass, as-of left side) and re-running the
    # extract actor pool per consumer would triple the heaviest stage.
    # html was dropped above, so the pinned footprint is ~24B/row.
    narrow = with_ts_sec(narrow, "warc_ts").materialize()

    sessions, interval = netml_session_pipeline(
        narrow, key="url", ts_col="warc_ts", gap=gap, q_interval=q_interval,
        num_partitions=num_partitions,
    )
    sessions = sessions.materialize()  # reused by the stats pass + feature pass

    feats, meta = session_features(
        sessions, feat_type, key="url", q_interval=q_interval, num_partitions=num_partitions
    )
    # small (one row per session); pin it so the as-of shuffle's sort
    # sampling doesn't re-execute the feature lineage
    feats = feats.materialize()

    events = narrow.select_columns(["url", "warc_ts", TS_SEC])
    joined = asof_join(
        events,
        feats.select_columns(["url", "end_sec", "features", SESSION]),
        key="url",
        left_ts=TS_SEC,
        right_ts="end_sec",
        num_partitions=num_partitions,
    )
    meta.rate = meta.rate  # keep dataclass
    return joined, {"interval": interval, "dim": meta.dim, "width": meta.width,
                    "rate": meta.rate, "feat_type": feat_type}


def events_session_pipeline(
    sf_dir: str,
    *,
    gap: float = 43200.0,
    window: int = 5,
    num_partitions: int | None = None,
):
    """Flagship over the driver's ``events`` table: sessionize per
    user_id, per-session stats state, as-of join the latest *closed*
    session's stats onto every event (leak-free)."""
    import ray.data as rd
    import pyarrow.compute as pc

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"])
    ev = with_ts_sec(ev, "ts")
    sess = sessionize_simple(ev, key="user_id", ts_col="ts", gap=gap,
                             tiebreak="event_id", num_partitions=num_partitions)
    sess = sess.materialize()

    # per-session summary state (count / mean / min / max / end time)
    def _summarize(t: pa.Table) -> pa.Table:
        from netml_ray import kernels
        from netml_ray.sessionize import _key_codes

        t = t.sort_by([("user_id", "ascending"), (SESSION, "ascending"), (TS_SEC, "ascending")])
        codes = _key_codes(t, "user_id")
        # user_id is int64 — dictionary_encode works on any type
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
                "user_id": pa.compute.take(t["user_id"], pa.array(starts)),
                SESSION: pa.array(sess_ids[starts]),
                "s_n": pa.array((ends - starts).astype(np.int64)),
                "s_mean": pa.array(sums / lens),
                "s_min": pa.array(np.minimum.reduceat(v, starts)),
                "s_max": pa.array(np.maximum.reduceat(v, starts)),
                "end_sec": pa.array(tsf[ends - 1]),
            }
        )

    from netml_ray.partition import partition_map

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
