"""partition_map driver fast path: forced-path equality per op family.

conftest.py pins ``NETML_RAY_PMAP_DRIVER_BYTES=0`` for the whole test
session so every other test exercises the real hash shuffle; here each
representative run-segmented operator runs BOTH ways — fast (driver
collect, whole-sorted-table fn application) and distributed — and the
row sets must match exactly (VERDICT r3 #6 / builder queue #7).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _events(n=4000, seed=3):
    rng = np.random.default_rng(seed)
    return pa.table({
        "user_id": pa.array(rng.integers(0, 97, n)),
        "ts": pa.array(np.sort(rng.uniform(0, 5_000, n))),
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "value": pa.array(rng.normal(size=n).round(3)),
        "etype": pa.array(rng.choice(["a", "b", "c"], n)),
    })


def _both_ways(monkeypatch, run):
    """Run ``run()`` distributed (budget 0) then fast (huge budget)."""
    monkeypatch.setenv("NETML_RAY_PMAP_DRIVER_BYTES", "0")
    dist = run()
    monkeypatch.setenv("NETML_RAY_PMAP_DRIVER_BYTES", str(1 << 40))
    fast = run()
    return dist, fast


def _norm(df, keys):
    return (df.sort_values(keys, kind="stable")
            .reset_index(drop=True))


def test_fast_path_windows_and_sessionize(ray_session, monkeypatch):
    import ray.data as rd

    from netml_ray.sessionize import sessionize_simple
    from netml_ray.windows import (add_cumulative, add_lag_lead,
                                   add_rolling, add_rolling_time,
                                   groupby_quantiles, pivot_agg)

    t = _events()

    def run():
        ds = rd.from_arrow(t)
        sess = sessionize_simple(ds, key="user_id", ts_col="ts",
                                 gap=30.0, tiebreak="event_id").to_pandas()
        lag = add_lag_lead(rd.from_arrow(t), "user_id", "ts", "value",
                           tiebreak="event_id").to_pandas()
        roll = add_rolling(rd.from_arrow(t), "user_id", "ts", "value",
                           window=4, tiebreak="event_id").to_pandas()
        rollt = add_rolling_time(rd.from_arrow(t), "user_id", "ts",
                                 "value", window_sec=120.0,
                                 tiebreak="event_id").to_pandas()
        cum = add_cumulative(rd.from_arrow(t), "user_id", "ts", "value",
                             tiebreak="event_id").to_pandas()
        gq = groupby_quantiles(rd.from_arrow(t), "user_id", "value",
                               [0.25, 0.5, 0.9]).to_pandas()
        piv = pivot_agg(rd.from_arrow(t), "user_id", "etype", "value",
                        categories=["a", "b", "c"], agg="sum").to_pandas()
        return sess, lag, roll, rollt, cum, gq, piv

    dist, fast = _both_ways(monkeypatch, run)
    for d, f, keys in zip(dist, fast,
                          (["user_id", "event_id"],) * 5
                          + (["user_id"],) * 2):
        pd.testing.assert_frame_equal(_norm(d, keys), _norm(f, keys))


def test_fast_path_curation_and_sketches(ray_session, monkeypatch):
    import ray.data as rd

    from netml_ray.curation import limit_per_key
    from netml_ray.sketches import count_distinct

    t = _events()

    def run():
        cap = limit_per_key(rd.from_arrow(t), "user_id", 7,
                            order_by=["ts", "event_id"]).to_pandas()
        cd = count_distinct(rd.from_arrow(t), "etype",
                            "user_id").to_pandas()
        return cap, cd

    dist, fast = _both_ways(monkeypatch, run)
    pd.testing.assert_frame_equal(_norm(dist[0], ["event_id"]),
                                  _norm(fast[0], ["event_id"]))
    pd.testing.assert_frame_equal(_norm(dist[1], ["etype"]),
                                  _norm(fast[1], ["etype"]))


def test_fast_path_dedup_family(ray_session, monkeypatch):
    import ray.data as rd

    from netml_ray.dedup import dedup_exact, simhash_duplicates

    rng = np.random.default_rng(5)
    texts = [f"doc body {i % 120} words here" for i in range(800)]
    t = pa.table({"doc_id": pa.array(np.arange(800, dtype=np.int64)),
                  "text": pa.array(texts),
                  "junk": pa.array(rng.normal(size=800))})

    def run():
        # narrow_collect_threshold=None routes through partition_map
        kept = dedup_exact(rd.from_arrow(t),
                           narrow_collect_threshold=None).to_pandas()
        dups = simhash_duplicates(rd.from_arrow(t)).to_pandas()
        return kept, dups

    dist, fast = _both_ways(monkeypatch, run)
    pd.testing.assert_frame_equal(_norm(dist[0], ["doc_id"]),
                                  _norm(fast[0], ["doc_id"]))
    pd.testing.assert_frame_equal(_norm(dist[1], ["doc_id"]),
                                  _norm(fast[1], ["doc_id"]))


def test_fast_path_respects_drop_pid_false(ray_session, monkeypatch):
    """pack_sequences (drop_pid=False: bins depend on the partition
    grouping) must NEVER take the whole-table fast path — its output at
    a given num_partitions is identical whatever the budget."""
    import ray.data as rd

    from netml_ray.curation import pack_sequences

    t = pa.table({
        "doc_id": pa.array(np.arange(300, dtype=np.int64)),
        "n_tokens": pa.array(
            np.random.default_rng(0).integers(10, 400, 300)),
    })

    def run():
        return pack_sequences(rd.from_arrow(t), budget=512,
                              num_partitions=8).to_pandas()

    dist, fast = _both_ways(monkeypatch, run)
    pd.testing.assert_frame_equal(_norm(dist, ["doc_id"]),
                                  _norm(fast, ["doc_id"]))


def test_fast_path_two_sided_joins(ray_session, monkeypatch):
    """partition_map2 driver fast path (both sides under the byte
    budget → collect, sort, ONE fn application) must match the
    co-partitioned shuffle for every two-sided consumer family:
    hash_join inner/left/full, backward as-of join (strict and not),
    and the dedup anti-join."""
    import ray.data as rd

    from netml_ray.asof import asof_join
    from netml_ray.dedup import dedup_exact
    from netml_ray.joins import hash_join

    rng = np.random.default_rng(9)
    nl, nr = 3000, 800
    left = pa.table({
        "k": pa.array(rng.integers(0, 300, nl)),
        "lv": pa.array(rng.normal(size=nl).round(3)),
        "ts": pa.array(np.sort(rng.uniform(0, 1000, nl)).round(3)),
        "lid": pa.array(np.arange(nl, dtype=np.int64)),
    })
    right = pa.table({
        "k": pa.array(rng.integers(0, 400, nr)),  # some keys unmatched
        "rv": pa.array(rng.normal(size=nr).round(3)),
        "rts": pa.array(np.sort(rng.uniform(0, 1000, nr)).round(3)),
    })

    from netml_ray.joins import anti_join, semi_join

    def run():
        outs = []
        for how in ("inner", "left", "full"):
            outs.append(hash_join(rd.from_arrow(left),
                                  rd.from_arrow(right), "k", how=how,
                                  num_partitions=6).to_pandas())
        outs.append(semi_join(rd.from_arrow(left), rd.from_arrow(right),
                              "k", num_partitions=6).to_pandas())
        outs.append(anti_join(rd.from_arrow(left), rd.from_arrow(right),
                              "k", num_partitions=6).to_pandas())
        for strict in (False, True):
            outs.append(asof_join(rd.from_arrow(left),
                                  rd.from_arrow(right), "k", "ts", "rts",
                                  strict=strict, left_tiebreak="lid",
                                  num_partitions=6).to_pandas())
        texts = [f"body {i % 150}" for i in range(1000)]
        docs = pa.table({"doc_id": pa.array(np.arange(1000, dtype=np.int64)),
                         "text": pa.array(texts)})
        outs.append(dedup_exact(rd.from_arrow(docs),
                                narrow_collect_threshold=None,
                                broadcast_threshold=0,
                                num_partitions=6).to_pandas())
        return outs

    dist, fast = _both_ways(monkeypatch, run)
    sort_keys = [None, None, None, ["lid"], ["lid"],
                 ["lid"], ["lid"], ["doc_id"]]
    for d, f, keys in zip(dist, fast, sort_keys):
        if keys is None:
            keys = [c for c in d.columns]
        pd.testing.assert_frame_equal(_norm(d, keys), _norm(f, keys))


def test_fast_path_fill(ray_session, monkeypatch):
    import pyarrow.compute as pc
    import ray.data as rd

    from netml_ray.windows import add_fill

    t = _events()
    # punch deterministic holes in value (float) and etype (string)
    eid = t["event_id"].to_numpy()
    t = t.set_column(
        t.schema.get_field_index("value"), "value",
        pc.if_else(pa.array(eid % 5 == 0), pa.nulls(len(eid), pa.float64()),
                   t["value"].combine_chunks()))
    t = t.set_column(
        t.schema.get_field_index("etype"), "etype",
        pc.if_else(pa.array(eid % 7 == 0), pa.nulls(len(eid), pa.string()),
                   t["etype"].combine_chunks()))

    def run():
        return add_fill(rd.from_arrow(t), "user_id", "ts",
                        ["value", "etype"],
                        directions=("forward", "backward"),
                        tiebreak="event_id").to_pandas()

    dist, fast = _both_ways(monkeypatch, run)
    pd.testing.assert_frame_equal(_norm(dist, ["user_id", "event_id"]),
                                  _norm(fast, ["user_id", "event_id"]))


def test_fast_path_resample(ray_session, monkeypatch):
    import ray.data as rd

    from netml_ray.windows import resample_ffill

    t = _events()
    t = t.set_column(
        t.schema.get_field_index("ts"), "ts",
        pa.array((t["ts"].to_numpy() * 1e6).astype("int64")).cast(
            pa.timestamp("us")))

    def run():
        return resample_ffill(rd.from_arrow(t), "user_id", "ts",
                              ["value", "etype"], step_sec=120.0,
                              tiebreak="event_id").to_pandas()

    dist, fast = _both_ways(monkeypatch, run)
    pd.testing.assert_frame_equal(_norm(dist, ["user_id", "grid_ts"]),
                                  _norm(fast, ["user_id", "grid_ts"]))


def test_fast_path_grouped_cat_stats_and_edit_pairs(ray_session,
                                                    monkeypatch):
    """group_entropy / group_mode / edit_distance_pairs are
    run-segmented partition_map consumers — fast == distributed."""
    import ray.data as rd

    from netml_ray.dedup import edit_distance_pairs
    from netml_ray.mlprep import group_entropy, group_mode

    t = _events()
    texts = [f"shared prefix body {i % 50} tail {i % 7}"
             for i in range(600)]
    dt = pa.table({"doc_id": pa.array(np.arange(600, dtype=np.int64)),
                   "text": pa.array(texts),
                   "src": pa.array([f"s{i % 4}" for i in range(600)])})

    def run():
        ent = group_entropy(rd.from_arrow(t), "user_id",
                            "etype").to_pandas()
        mode = group_mode(rd.from_arrow(t), "user_id",
                          "etype").to_pandas()
        pairs = edit_distance_pairs(
            rd.from_arrow(dt), block_col="src", max_dist=10,
            prefix_len=32, bucket_width=16).to_pandas()
        return ent, mode, pairs

    dist, fast = _both_ways(monkeypatch, run)
    pd.testing.assert_frame_equal(_norm(dist[0], ["user_id"]),
                                  _norm(fast[0], ["user_id"]))
    pd.testing.assert_frame_equal(_norm(dist[1], ["user_id"]),
                                  _norm(fast[1], ["user_id"]))
    pd.testing.assert_frame_equal(_norm(dist[2], ["id_a", "id_b"]),
                                  _norm(fast[2], ["id_a", "id_b"]))


def test_fast_path_sequences(ray_session, monkeypatch):
    """funnel_stages / transition_counts are run-segmented
    partition_map consumers — fast == distributed."""
    import ray.data as rd

    from netml_ray.sequences import funnel_stages, transition_counts

    t = _events()

    def run():
        f = funnel_stages(rd.from_arrow(t), "user_id", "ts", "etype",
                          ["a", "c", "b"], tiebreak="event_id"
                          ).to_pandas()
        tr = transition_counts(rd.from_arrow(t), "user_id", "ts",
                               "etype", tiebreak="event_id").to_pandas()
        return f, tr

    dist, fast = _both_ways(monkeypatch, run)
    pd.testing.assert_frame_equal(_norm(dist[0], ["user_id"]),
                                  _norm(fast[0], ["user_id"]))
    pd.testing.assert_frame_equal(_norm(dist[1], ["from_type",
                                                  "to_type"]),
                                  _norm(fast[1], ["from_type",
                                                  "to_type"]))


def test_fast_path_interval_and_cohort(ray_session, monkeypatch):
    """interval_sweep / cohort_retention are run-segmented
    partition_map consumers — fast == distributed."""
    import ray.data as rd

    from netml_ray.sequences import cohort_retention, interval_sweep

    rng = np.random.default_rng(17)
    n = 1500
    s = rng.integers(0, 500_000, n)
    t = pa.table({"k": pa.array(rng.integers(0, 31, n)),
                  "s": pa.array(s, type=pa.int64()),
                  "e": pa.array(s + rng.integers(1, 9_000, n),
                                type=pa.int64())})

    def run():
        sw = interval_sweep(rd.from_arrow(t), "k", "s", "e").to_pandas()
        cr = cohort_retention(
            rd.from_arrow(t.select(["k", "s"])), "k", "s",
            bucket_us=50_000).to_pandas()
        return sw, cr

    dist, fast = _both_ways(monkeypatch, run)
    pd.testing.assert_frame_equal(_norm(dist[0], ["k"]),
                                  _norm(fast[0], ["k"]))
    pd.testing.assert_frame_equal(_norm(dist[1], ["cohort", "offset"]),
                                  _norm(fast[1], ["cohort", "offset"]))


def test_fast_path_ewma(ray_session, monkeypatch):
    """add_ewma is a run-segmented partition_map consumer — fast ==
    distributed."""
    import ray.data as rd

    from netml_ray.windows import add_ewma

    t = _events()

    def run():
        return (add_ewma(rd.from_arrow(t), "user_id", "ts", "value",
                         alpha=0.3, tiebreak="event_id").to_pandas(),)

    dist, fast = _both_ways(monkeypatch, run)
    pd.testing.assert_frame_equal(_norm(dist[0], ["event_id"]),
                                  _norm(fast[0], ["event_id"]))


def test_fast_path_autocorr(ray_session, monkeypatch):
    """group_autocorr is a run-segmented partition_map consumer —
    fast == distributed."""
    import ray.data as rd

    from netml_ray.sequences import group_autocorr

    t = _events()

    def run():
        return (group_autocorr(rd.from_arrow(t), "user_id", "ts",
                               "value", lag=1,
                               tiebreak="event_id").to_pandas(),)

    dist, fast = _both_ways(monkeypatch, run)
    pd.testing.assert_frame_equal(_norm(dist[0], ["user_id"]),
                                  _norm(fast[0], ["user_id"]))


def test_fast_path_rolling_corr(ray_session, monkeypatch):
    """add_rolling_corr is a run-segmented partition_map consumer —
    fast == distributed."""
    import ray.data as rd

    from netml_ray.windows import add_rolling_corr

    t = _events()

    def run():
        return (add_rolling_corr(rd.from_arrow(t), "user_id", "ts",
                                 "value", window=4,
                                 tiebreak="event_id").to_pandas(),)

    dist, fast = _both_ways(monkeypatch, run)
    pd.testing.assert_frame_equal(_norm(dist[0], ["event_id"]),
                                  _norm(fast[0], ["event_id"]))


def test_fast_path_forward_window(ray_session, monkeypatch):
    """add_forward_window is a run-segmented partition_map consumer —
    fast == distributed."""
    import ray.data as rd

    from netml_ray.windows import add_forward_window

    t = _events()

    def run():
        return (add_forward_window(rd.from_arrow(t), "user_id", "ts",
                                   "value", horizon_sec=100.0,
                                   tiebreak="event_id").to_pandas(),)

    dist, fast = _both_ways(monkeypatch, run)
    pd.testing.assert_frame_equal(_norm(dist[0], ["event_id"]),
                                  _norm(fast[0], ["event_id"]))


def test_fast_path_seasonal_deviation(ray_session, monkeypatch):
    """add_seasonal_deviation groups by run x hour within a key —
    run-segmented; fast == distributed."""
    import ray.data as rd

    from netml_ray.windows import add_seasonal_deviation

    t = _events()

    def run():
        return (add_seasonal_deviation(rd.from_arrow(t), "user_id",
                                       "ts", "value").to_pandas(),)

    dist, fast = _both_ways(monkeypatch, run)
    pd.testing.assert_frame_equal(_norm(dist[0], ["event_id"]),
                                  _norm(fast[0], ["event_id"]))


def test_fast_path_pagerank_dedupe(ray_session, monkeypatch):
    """dedupe_edges_with_degree's per-partition pair-dedup is exact on
    both paths (a pair lives in exactly one src-hash partition), so the
    whole pagerank result is path-invariant."""
    import ray.data as rd

    from netml_ray.graph import pagerank

    rng = np.random.default_rng(9)
    src = rng.integers(0, 50, 900).astype(np.int64)
    dst = rng.integers(0, 50, 900).astype(np.int64)
    t = pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    def run():
        return (pagerank(rd.from_arrow(t), iters=3,
                         num_partitions=4).to_pandas(),)

    dist, fast = _both_ways(monkeypatch, run)
    pd.testing.assert_frame_equal(_norm(dist[0], ["node"]),
                                  _norm(fast[0], ["node"]))


def test_fast_path_time_to_event(ray_session, monkeypatch):
    """add_time_to_event is a run-segmented partition_map consumer —
    fast == distributed."""
    import ray.data as rd

    from netml_ray.windows import add_time_to_event

    t = _events()

    def run():
        return (add_time_to_event(rd.from_arrow(t), "user_id", "ts",
                                  "etype", "b",
                                  tiebreak="event_id").to_pandas(),)

    dist, fast = _both_ways(monkeypatch, run)
    pd.testing.assert_frame_equal(_norm(dist[0], ["event_id"]),
                                  _norm(fast[0], ["event_id"]))


def test_fast_path_rolling_distinct(ray_session, monkeypatch):
    """add_rolling_distinct is a run-segmented partition_map consumer —
    fast == distributed."""
    import ray.data as rd

    from netml_ray.windows import add_rolling_distinct

    t = _events()

    def run():
        return (add_rolling_distinct(rd.from_arrow(t), "user_id", "ts",
                                     "etype", window=4,
                                     tiebreak="event_id").to_pandas(),)

    dist, fast = _both_ways(monkeypatch, run)
    pd.testing.assert_frame_equal(_norm(dist[0], ["event_id"]),
                                  _norm(fast[0], ["event_id"]))


def test_fast_path_cooccurrence(ray_session, monkeypatch):
    """cooccurrence_similarity's three partition_map stages compose to
    a path-invariant final result (pair partials may differ per path;
    the combine re-aggregates them)."""
    import ray.data as rd

    from netml_ray.graph import cooccurrence_similarity

    rng = np.random.default_rng(13)
    t = pa.table({"g": pa.array(rng.integers(0, 40, 1500)
                                .astype(np.int64)),
                  "i": pa.array(rng.integers(0, 12, 1500)
                                .astype(np.int64))})

    def run():
        return (cooccurrence_similarity(rd.from_arrow(t), "g", "i",
                                        num_partitions=4).to_pandas(),)

    dist, fast = _both_ways(monkeypatch, run)
    pd.testing.assert_frame_equal(_norm(dist[0], ["item_a", "item_b"]),
                                  _norm(fast[0], ["item_a", "item_b"]))


def test_fast_path_rollup(ray_session, monkeypatch):
    """rollup_agg's finalize is a-complete on both paths — fast ==
    distributed (incl. the driver-folded grand total)."""
    import ray.data as rd

    from netml_ray.windows import rollup_agg

    t = _events()

    def run():
        return (rollup_agg(rd.from_arrow(t), "etype", "user_id",
                           "value").to_pandas(),)

    dist, fast = _both_ways(monkeypatch, run)
    pd.testing.assert_frame_equal(
        _norm(dist[0], ["etype", "user_id"]),
        _norm(fast[0], ["etype", "user_id"]))


def test_fast_path_cube(ray_session, monkeypatch):
    """cube_agg (rollup + derived b-level) is path-invariant."""
    import ray.data as rd

    from netml_ray.windows import cube_agg

    t = _events()

    def run():
        return (cube_agg(rd.from_arrow(t), "etype", "user_id",
                         "value").to_pandas(),)

    dist, fast = _both_ways(monkeypatch, run)
    pd.testing.assert_frame_equal(
        _norm(dist[0], ["etype", "user_id"]),
        _norm(fast[0], ["etype", "user_id"]))


def test_fast_path_featstats(ray_session, monkeypatch):
    import ray.data as rd

    from netml_ray.featstats import burstiness, decayed_agg, gini

    rng = np.random.default_rng(21)
    n = 5000
    t = pa.table({
        "k": pa.array(rng.integers(0, 60, n)),
        "ts": pa.array(np.sort(rng.integers(0, 30 * 86400_000_000, n))
                       ).cast(pa.timestamp("us")),
        "v": pa.array(rng.normal(10, 4, n).round(3)),
    })

    def run_decayed():
        return decayed_agg(rd.from_arrow(t).repartition(6), "k", "ts",
                           "v", half_life_s=86400.0).to_pandas()

    def run_burst():
        return burstiness(rd.from_arrow(t).repartition(6), "k", "ts",
                          bucket_s=3600.0).to_pandas()

    def run_gini():
        tt = t.set_column(2, "v", pa.array(
            np.abs(t["v"].to_numpy(zero_copy_only=False))))
        return gini(rd.from_arrow(tt).repartition(6), "k",
                    "v").to_pandas()

    def run_kendall():
        from netml_ray.featstats import kendall_tau
        return kendall_tau(rd.from_arrow(t).repartition(6), "k", "ts",
                           "v").to_pandas()

    def run_ecdf():
        from netml_ray.featstats import group_ecdf
        tt = t.append_column(
            "id", pa.array(np.arange(t.num_rows, dtype=np.int64)))
        return group_ecdf(rd.from_arrow(tt).repartition(6), "k", "v",
                          "id").to_pandas()

    for run, keys in ((run_decayed, ["k"]), (run_burst, ["k"]),
                      (run_gini, ["k"]), (run_kendall, ["k"]),
                      (run_ecdf, ["id"])):
        dist, fast = _both_ways(monkeypatch, run)
        pd.testing.assert_frame_equal(_norm(dist, keys),
                                      _norm(fast, keys))


def test_fast_path_mk_theilsen_interp(ray_session, monkeypatch):
    """fast == distributed for the mann_kendall / theil_sen /
    interpolate_time consumers (all run-segmented by construction)."""
    import ray.data as rd

    from netml_ray.featstats import mann_kendall, theil_sen
    from netml_ray.windows import interpolate_time

    rng = np.random.default_rng(22)
    n = 4000
    v = rng.integers(0, 9, n).astype(float)
    v[rng.integers(0, n, n // 5)] = np.nan
    t = pa.table({
        "k": pa.array(rng.integers(0, 50, n)),
        "ts": pa.array(np.sort(rng.integers(0, 10**9, n))
                       .astype(np.int64)),
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "v": pa.array(rng.normal(5, 2, n).round(3)),
        "vn": pa.array(v),
    })

    def run_mk():
        return mann_kendall(rd.from_arrow(t).repartition(6), "k",
                            "ts", "v", tiebreak="id").to_pandas()

    def run_ts():
        return theil_sen(rd.from_arrow(t).repartition(6), "k", "ts",
                         "v").to_pandas()

    def run_interp():
        return interpolate_time(rd.from_arrow(t).repartition(6), "k",
                                "ts", "vn", tiebreak="id").to_pandas()

    for run, keys in ((run_mk, ["k"]), (run_ts, ["k"]),
                      (run_interp, ["id"])):
        dist, fast = _both_ways(monkeypatch, run)
        pd.testing.assert_frame_equal(_norm(dist, keys),
                                      _norm(fast, keys))


def test_fast_path_circadian_changepoint_runs(ray_session, monkeypatch):
    """fast == distributed for circular_daytime / changepoint /
    runs_test (all run-segmented finalizes)."""
    import ray.data as rd

    from netml_ray.featstats import changepoint, circular_daytime, \
        runs_test

    rng = np.random.default_rng(23)
    n = 4000
    t = pa.table({
        "k": pa.array(rng.integers(0, 50, n)),
        "ts": pa.array(np.sort(rng.choice(10**12, n, replace=False))
                       .astype(np.int64)).cast(pa.timestamp("us")),
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "v": pa.array(rng.normal(5, 2, n).round(3)),
    })

    def run_circ():
        return circular_daytime(rd.from_arrow(t).repartition(6), "k",
                                "ts").to_pandas()

    def run_cp():
        return changepoint(rd.from_arrow(t).repartition(6), "k", "ts",
                           "v", tiebreak_col="id").to_pandas()

    def run_rt():
        return runs_test(rd.from_arrow(t).repartition(6), "k", "ts",
                         "v", tiebreak_col="id").to_pandas()

    for run in (run_circ, run_cp, run_rt):
        dist, fast = _both_ways(monkeypatch, run)
        pd.testing.assert_frame_equal(_norm(dist, ["k"]),
                                      _norm(fast, ["k"]))


def test_fast_path_hhi_new_returning(ray_session, monkeypatch):
    """hhi_concentration / new_returning are partial-emitting
    partition_map consumers whose driver fold makes fast ==
    distributed at the FINAL output."""
    import ray.data as rd

    from netml_ray.featstats import hhi_concentration
    from netml_ray.sequences import new_returning

    t = _events()

    def run():
        h = hhi_concentration(rd.from_arrow(t), "etype", "user_id") \
            .to_pandas()
        ts = pa.table({
            "user_id": t["user_id"],
            "ts": pa.array((t["ts"].to_numpy() * 1e6).astype(np.int64)
                           .astype("datetime64[us]"))})
        nr = new_returning(rd.from_arrow(ts), "user_id", "ts") \
            .to_pandas()
        return h, nr

    dist, fast = _both_ways(monkeypatch, run)
    pd.testing.assert_frame_equal(_norm(dist[0], ["etype"]),
                                  _norm(fast[0], ["etype"]))
    pd.testing.assert_frame_equal(_norm(dist[1], ["day"]),
                                  _norm(fast[1], ["day"]))


def test_fast_path_geo(ray_session, monkeypatch):
    """nearest_poi / grid_stats partition_map consumers: fast ==
    distributed at the final output."""
    import ray.data as rd

    from netml_ray.geo import grid_stats, nearest_poi

    t = _events()

    def run():
        np_ = nearest_poi(rd.from_arrow(t), "user_id").to_pandas()
        gs = grid_stats(rd.from_arrow(t), "user_id", "value") \
            .to_pandas()
        return np_, gs

    dist, fast = _both_ways(monkeypatch, run)
    pd.testing.assert_frame_equal(_norm(dist[0], ["user_id"]),
                                  _norm(fast[0], ["user_id"]))
    pd.testing.assert_frame_equal(_norm(dist[1],
                                        ["cell_lat", "cell_lon"]),
                                  _norm(fast[1],
                                        ["cell_lat", "cell_lon"]))


def test_fast_path_adamic_adar(ray_session, monkeypatch):
    """adamic_adar's two partition_map stages: fast == distributed."""
    import ray.data as rd

    from netml_ray.graph import adamic_adar

    t = _events()

    def run():
        return adamic_adar(rd.from_arrow(t), "user_id", "event_id") \
            .to_pandas()

    dist, fast = _both_ways(monkeypatch, run)
    pd.testing.assert_frame_equal(_norm(dist, ["item_a", "item_b"]),
                                  _norm(fast, ["item_a", "item_b"]))


def test_fast_path_session_and_gaps(ray_session, monkeypatch):
    """session_conversion / event_gaps / dod_retention: fast ==
    distributed at the final output."""
    import ray.data as rd

    from netml_ray.sequences import (dod_retention, event_gaps,
                                     session_conversion)

    t = _events()
    ts_tbl = pa.table({
        "user_id": t["user_id"],
        "ts": pa.array((t["ts"].to_numpy() * 1e6).astype(np.int64)
                       .astype("datetime64[us]")),
        "event_id": t["event_id"],
        "etype": t["etype"]})

    def run():
        sc = session_conversion(rd.from_arrow(ts_tbl), "user_id",
                                "ts", "etype", gap_s=100.0,
                                convert_type="a",
                                tiebreak="event_id").to_pandas()
        eg = event_gaps(rd.from_arrow(ts_tbl), "user_id", "ts",
                        type_col="etype", event_type="b",
                        tiebreak="event_id").to_pandas()
        dr = dod_retention(rd.from_arrow(ts_tbl), "user_id", "ts",
                           day_us=500_000_000).to_pandas()
        return sc, eg, dr

    dist, fast = _both_ways(monkeypatch, run)
    for i, keys in enumerate([["user_id"], ["user_id"], ["day"]]):
        pd.testing.assert_frame_equal(_norm(dist[i], keys),
                                      _norm(fast[i], keys))


def test_fast_path_textstat_exchanges(ray_session, monkeypatch):
    """gram_novelty / source_keywords partition_map stages: fast ==
    distributed."""
    import ray.data as rd

    from netml_ray.textstats import gram_novelty, source_keywords

    rng = np.random.default_rng(151)
    vocab = [f"w{i}" for i in range(25)]
    texts = [" ".join(rng.choice(vocab, 12)) for _ in range(300)]
    t = pa.table({
        "doc_id": pa.array(np.arange(300, dtype=np.int64)),
        "source": pa.array(rng.choice(["s1", "s2", "s3"], 300)),
        "text": pa.array(texts)})

    def run():
        gn = gram_novelty(rd.from_arrow(t), "text", "doc_id") \
            .to_pandas()
        sk = source_keywords(rd.from_arrow(t), "text", "source",
                             top_k=3).to_pandas()
        return gn, sk

    dist, fast = _both_ways(monkeypatch, run)
    pd.testing.assert_frame_equal(_norm(dist[0], ["doc_id"]),
                                  _norm(fast[0], ["doc_id"]))
    pd.testing.assert_frame_equal(_norm(dist[1], ["source", "w"]),
                                  _norm(fast[1], ["source", "w"]))


def test_fast_path_segment_dedup(ray_session, monkeypatch):
    """segment_dedup's two partition_map stages: fast == distributed."""
    import ray.data as rd

    from netml_ray.curation import segment_dedup

    rng = np.random.default_rng(97)
    vocab = [f"w{i}" for i in range(12)]
    # small vocab + short segments → plenty of cross-doc repeats
    texts = [" ".join(rng.choice(vocab, int(k)))
             for k in rng.integers(0, 30, 400)]
    t = pa.table({"doc_id": pa.array(np.arange(400, dtype=np.int64)),
                  "text": pa.array(texts)})

    def run():
        return segment_dedup(rd.from_arrow(t), size=4).to_pandas()

    dist, fast = _both_ways(monkeypatch, run)
    pd.testing.assert_frame_equal(_norm(dist, ["doc_id"]),
                                  _norm(fast, ["doc_id"]))


def test_fast_path_dense_ids(ray_session, monkeypatch):
    """dense_ids' dedup exchange: fast == distributed."""
    import ray.data as rd

    from netml_ray.mlprep import dense_ids

    rng = np.random.default_rng(41)
    t = pa.table({"k": pa.array(rng.integers(0, 500, 5000))})

    def run():
        return dense_ids(rd.from_arrow(t), "k").to_pandas()

    dist, fast = _both_ways(monkeypatch, run)
    pd.testing.assert_frame_equal(_norm(dist, ["k"]),
                                  _norm(fast, ["k"]))


def test_fast_path_skipgram(ray_session, monkeypatch):
    """skipgram_pairs' count partials fold identically on both paths."""
    import ray.data as rd

    from netml_ray.sequences import skipgram_pairs

    t = _events(3000, seed=9)

    def run():
        return skipgram_pairs(rd.from_arrow(t), "user_id", "ts",
                              "etype", window=2,
                              tiebreak="event_id").to_pandas()

    dist, fast = _both_ways(monkeypatch, run)
    pd.testing.assert_frame_equal(_norm(dist, ["center", "context"]),
                                  _norm(fast, ["center", "context"]))


def test_fast_path_out_of_order(ray_session, monkeypatch):
    """out_of_order_stats: fast == distributed."""
    import ray.data as rd

    from netml_ray.sequences import out_of_order_stats

    rng = np.random.default_rng(57)
    n = 2500
    t = pa.table({
        "k": pa.array(rng.integers(0, 80, n)),
        "a": pa.array(rng.permutation(n).astype(np.int64)),
        "ts": pa.array(rng.integers(0, 10**8, n)
                       .astype("datetime64[us]"))})

    def run():
        return out_of_order_stats(rd.from_arrow(t), "k", "ts",
                                  arrival_col="a").to_pandas()

    dist, fast = _both_ways(monkeypatch, run)
    pd.testing.assert_frame_equal(_norm(dist, ["k"]),
                                  _norm(fast, ["k"]))


def test_fast_path_agg_state(ray_session, monkeypatch):
    """group_agg_state / merge_agg_states: fast == distributed."""
    import ray.data as rd

    from netml_ray.mlprep import group_agg_state, merge_agg_states

    t = _events(3000, seed=21)

    def run():
        a = group_agg_state(rd.from_arrow(t.slice(0, 1500)),
                            "user_id", "value")
        b = group_agg_state(rd.from_arrow(t.slice(1500)),
                            "user_id", "value")
        return merge_agg_states([a, b], "user_id").to_pandas()

    dist, fast = _both_ways(monkeypatch, run)
    pd.testing.assert_frame_equal(_norm(dist, ["user_id"]),
                                  _norm(fast, ["user_id"]))


def test_fast_path_mlt_snm_windowed(ray_session, monkeypatch):
    """sparse_cosine_pairs / snm_candidates / windowed_dedup: fast ==
    distributed on every partition_map stage."""
    import ray.data as rd

    from netml_ray.dedup import snm_candidates
    from netml_ray.sequences import windowed_dedup
    from netml_ray.textstats import sparse_cosine_pairs

    rng = np.random.default_rng(71)
    rep_rows = []
    for d in range(60):
        for t_ in rng.choice(20, 4, replace=False):
            rep_rows.append((d, f"t{t_}", float(rng.uniform(0.5, 2))))
    rep = pa.table({
        "doc_id": pa.array([r[0] for r in rep_rows], pa.int64()),
        "term": pa.array([r[1] for r in rep_rows]),
        "tfidf": pa.array([r[2] for r in rep_rows])})
    keys = ["".join(rng.choice(list("abcd"), 10)) for _ in range(120)]
    snm_t = pa.table({"doc_id": pa.array(np.arange(120, dtype=np.int64)),
                      "bk": pa.array(keys)})
    ev = _events(2000, seed=72)
    wt = pa.table({
        "eid": ev["event_id"], "k": ev["user_id"],
        "ty": ev["etype"],
        "ts": pa.array((ev["ts"].to_numpy() * 1e6).astype(np.int64)
                       .astype("datetime64[us]"))})

    def run():
        mlt = sparse_cosine_pairs(rd.from_arrow(rep)).to_pandas()
        snm = snm_candidates(rd.from_arrow(snm_t), "bk", "doc_id",
                             window=2, min_sim=0.0,
                             bucket=32).to_pandas()
        wd = windowed_dedup(rd.from_arrow(wt), "k", "ty", "ts",
                            window_us=10**8,
                            tiebreak="eid").to_pandas()
        return mlt, snm, wd

    dist, fast = _both_ways(monkeypatch, run)
    for i, kcols in enumerate([["id_a", "id_b"], ["id_a", "id_b"],
                               ["eid"]]):
        pd.testing.assert_frame_equal(_norm(dist[i], kcols),
                                      _norm(fast[i], kcols))


def test_fast_path_trigram_counts(ray_session, monkeypatch):
    """_trigram_hash_counts' code exchange: fast == distributed."""
    import ray.data as rd

    from netml_ray.textstats import _trigram_hash_counts

    rng = np.random.default_rng(91)
    vocab = [f"w{i}" for i in range(15)]
    texts = [" ".join(rng.choice(vocab, int(k)))
             for k in rng.integers(0, 25, 300)]
    t = pa.table({"doc_id": pa.array(np.arange(300, dtype=np.int64)),
                  "text": pa.array(texts)})

    def run():
        return _trigram_hash_counts(
            rd.from_arrow(t), text_col="text").to_pandas()

    dist, fast = _both_ways(monkeypatch, run)
    pd.testing.assert_frame_equal(_norm(dist, ["kind", "code"]),
                                  _norm(fast, ["kind", "code"]))
