"""Sequence analytics: ordered funnels and transition counts."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _mk(n=4000, seed=9, nkeys=80):
    rng = np.random.default_rng(seed)
    return pa.table({
        "k": pa.array(rng.integers(0, nkeys, n)),
        "ts": pa.array(rng.uniform(0, 10_000, n).round(3)),
        "et": pa.array(rng.choice(list("ABCD"), n)),
        "i": pa.array(np.arange(n, dtype=np.int64)),
    })


def _ref_funnel(pdf, stages):
    out = {}
    for k, sub in pdf.sort_values(["ts", "i"]).groupby("k"):
        prev = -np.inf
        done = 0
        for st in stages:
            cand = sub.loc[(sub["et"] == st) & (sub["ts"] > prev), "ts"]
            if cand.empty:
                break
            prev = cand.min()
            done += 1
        out[k] = done
    return out


def test_funnel_matches_reference(ray_session):
    """Segment-min chained funnel == a per-key python walk, for any
    partitioning, including repeated stages and never-started keys."""
    import ray.data as rd

    from netml_ray.sequences import funnel_stages

    t = _mk()
    pdf = t.to_pandas()
    stages = ["A", "C", "A", "B"]
    exp = _ref_funnel(pdf, stages)
    for parts in (1, 7):
        got = (funnel_stages(rd.from_arrow(t).repartition(parts),
                             "k", "ts", "et", stages, tiebreak="i")
               .to_pandas().set_index("k")["stages_completed"])
        assert len(got) == len(exp)
        for k, v in exp.items():
            assert got[k] == v
    # a stage value absent from the data stalls every key at its index
    got0 = (funnel_stages(rd.from_arrow(t), "k", "ts", "et",
                          ["Z", "A"], tiebreak="i")
            .to_pandas()["stages_completed"])
    assert (got0 == 0).all()


def test_funnel_int64_timestamp_ties(ray_session):
    """Timestamp columns compare as int64 ns — adjacent-ns events
    (beyond float64 resolution at epoch scale) still chain strictly."""
    import ray.data as rd

    from netml_ray.sequences import funnel_stages

    base = np.datetime64("2026-01-01T00:00:00.000000001", "ns")
    ts = pa.array([base, base + np.timedelta64(1, "ns"),
                   base + np.timedelta64(1, "ns")])
    t = pa.table({"k": pa.array([1, 1, 1]), "ts": ts,
                  "et": pa.array(["A", "B", "A"]),
                  "i": pa.array([0, 1, 2], type=pa.int64())})
    got = (funnel_stages(rd.from_arrow(t), "k", "ts", "et",
                         ["A", "B", "A"], tiebreak="i").to_pandas())
    # A@t0, B@t0+1ns, then no A strictly after t0+1ns -> 2 stages
    assert got["stages_completed"].tolist() == [2]


def test_transition_counts_match_pandas(ray_session):
    """Adjacent-pair counts == a pandas shift reference; run
    boundaries never pair across keys; partition-invariant."""
    import ray.data as rd

    from netml_ray.sequences import transition_counts

    t = _mk(seed=10)
    pdf = t.to_pandas().sort_values(["k", "ts", "i"])
    nxt = pdf.groupby("k")["et"].shift(-1)
    ref = (pd.DataFrame({"from_type": pdf["et"], "to_type": nxt})
           .dropna().groupby(["from_type", "to_type"])
           .size().rename("n").reset_index())
    for parts in (1, 6):
        got = transition_counts(
            rd.from_arrow(t).repartition(parts), "k", "ts", "et",
            tiebreak="i").to_pandas()
        pd.testing.assert_frame_equal(
            got, ref.sort_values(["from_type", "to_type"])
            .reset_index(drop=True), check_dtype=False)
    assert got["n"].sum() == len(pdf) - pdf["k"].nunique()


def test_interval_sweep_matches_reference(ray_session):
    """Sweep-line max-concurrency and busy time == a per-key python
    sweep; touching intervals don't overlap; partition-invariant."""
    import ray.data as rd

    from netml_ray.sequences import interval_sweep

    rng = np.random.default_rng(91)
    n = 2000
    s = rng.integers(0, 1_000_000, n)
    dur = rng.integers(1, 5_000, n)
    t = pa.table({"k": pa.array(rng.integers(0, 25, n)),
                  "s": pa.array(s, type=pa.int64()),
                  "e": pa.array(s + dur, type=pa.int64())})
    # touching pair: [0,10) then [10,20) -> max_concurrent 1
    touch = pa.table({"k": pa.array([777, 777]),
                      "s": pa.array([0, 10], type=pa.int64()),
                      "e": pa.array([10, 20], type=pa.int64())})
    full = pa.concat_tables([t, touch])
    pdf = full.to_pandas()

    def ref(sub):
        ev = sorted([(x, 1) for x in sub["s"]] +
                    [(x, -1) for x in sub["e"]],
                    key=lambda p: (p[0], p[1]))
        conc = mx = busy = 0
        for (tt, d), nxt in zip(ev, ev[1:] + [None]):
            conc += d
            mx = max(mx, conc)
            if nxt is not None and conc > 0:
                busy += nxt[0] - tt
        return mx, busy

    for parts in (1, 6):
        out = (interval_sweep(rd.from_arrow(full).repartition(parts),
                              "k", "s", "e")
               .to_pandas().set_index("k"))
        for k, sub in pdf.groupby("k"):
            mx, busy = ref(sub)
            assert out.loc[k, "max_concurrent"] == mx
            assert out.loc[k, "busy_us"] == busy
    assert out.loc[777, "max_concurrent"] == 1
    assert out.loc[777, "busy_us"] == 20


def test_cohort_retention_matches_pandas(ray_session):
    """(cohort, offset, n_active) == a pandas reference with per-key
    first-bucket cohorts; cross-batch duplicate (key, bucket) pairs
    collapse to one."""
    import ray.data as rd

    from netml_ray.sequences import cohort_retention

    rng = np.random.default_rng(92)
    n = 3000
    t = pa.table({
        "k": pa.array(rng.integers(0, 120, n)),
        "ts": pa.array(rng.integers(0, 40, n) * 10 + 5,
                       type=pa.int64()),
    })
    out = (cohort_retention(rd.from_arrow(t).repartition(7),
                            "k", "ts", bucket_us=100)
           .to_pandas())
    pdf = t.to_pandas()
    pdf["bucket"] = pdf["ts"] // 100
    ub = pdf[["k", "bucket"]].drop_duplicates()
    cohort = ub.groupby("k")["bucket"].min().rename("cohort")
    ub = ub.join(cohort, on="k")
    ref = (ub.assign(offset=ub["bucket"] - ub["cohort"])
           .groupby(["cohort", "offset"]).size().rename("n_active")
           .reset_index().sort_values(["cohort", "offset"])
           .reset_index(drop=True))
    import pandas as pd
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_funnel_max_gap_window(ray_session):
    """Conversion-window funnel: a stage beyond max_gap of the
    previous completion doesn't count, and a LATER in-window event
    can't rescue it (min-ts picks the earliest candidate in-window)."""
    import ray.data as rd

    from netml_ray.sequences import funnel_stages

    t = pa.table({
        "k": pa.array([1, 1, 1, 2, 2, 2]),
        "ts": pa.array([0, 100, 150, 0, 5, 8], type=pa.int64()),
        "et": pa.array(["A", "B", "C", "A", "B", "C"]),
        "i": pa.array(np.arange(6, dtype=np.int64)),
    })
    # no gap: both keys complete all 3
    out = (funnel_stages(rd.from_arrow(t), "k", "ts", "et",
                         ["A", "B", "C"], tiebreak="i")
           .to_pandas().set_index("k")["stages_completed"])
    assert out[1] == 3 and out[2] == 3
    # gap 10: key 1's B at t=100 is out of window -> stalls at 1
    out = (funnel_stages(rd.from_arrow(t), "k", "ts", "et",
                         ["A", "B", "C"], tiebreak="i", max_gap=10)
           .to_pandas().set_index("k")["stages_completed"])
    assert out[1] == 1 and out[2] == 3


def test_group_autocorr_matches_pandas(ray_session):
    """Lag-k autocorr == pandas per-key shifted corr; short /
    constant keys NULL; partition-invariant; lag=2 exercised."""
    import ray.data as rd

    from netml_ray.sequences import group_autocorr

    rng = np.random.default_rng(95)
    n = 2500
    t = pa.table({
        "k": pa.array(rng.integers(0, 50, n)),
        "o": pa.array(rng.uniform(0, 1e5, n).round(2)),
        "i": pa.array(np.arange(n, dtype=np.int64)),
        "v": pa.array(np.cumsum(rng.normal(0, 1, n))),  # persistent
    })
    edge = pa.table({"k": pa.array([901, 902, 902, 903, 903, 903]),
                     "o": pa.array([1.0, 1.0, 2.0, 1.0, 2.0, 3.0]),
                     "i": pa.array(np.arange(6, dtype=np.int64) + n),
                     "v": pa.array([5.0, 7.0, 7.0, 4.0, 4.0, 4.0])})
    full = pa.concat_tables([t, edge])
    pdf = full.to_pandas().sort_values(["k", "o", "i"])
    for lag in (1, 2):
        for parts in (1, 6):
            out = (group_autocorr(
                rd.from_arrow(full).repartition(parts), "k", "o", "v",
                lag=lag, tiebreak="i")
                .to_pandas().set_index("k")["autocorr_v"])
            for k, sub in pdf.groupby("k"):
                exp = sub["v"].corr(sub["v"].shift(-lag))
                got = out[k]
                if np.isnan(exp):
                    assert np.isnan(got)
                else:
                    assert got == pytest.approx(round(exp, 9),
                                                abs=2e-9)
    # single-pair and zero-variance keys are NULL at lag 1
    assert np.isnan(out[901])
    assert np.isnan(out[903])


def test_temporal_pairs_vs_brute(ray_session):
    import ray.data as rd

    from netml_ray.sequences import temporal_pairs

    rng = np.random.default_rng(47)
    n = 3000
    w = 500
    t = pa.table({
        "user_id": pa.array(rng.integers(0, 40, n)),
        "ts": pa.array(rng.integers(0, 5000, n).astype(np.int64)).cast(
            pa.timestamp("us")),
        "event_id": pa.array(np.arange(n)),
        "event_type": pa.array(rng.choice(["a", "b", "c"], n)),
    })
    out = temporal_pairs(rd.from_arrow(t).repartition(6), "user_id",
                         "ts", "event_type", window_us=w,
                         tiebreak="event_id").to_pandas() \
        .set_index(["type_a", "type_b"])

    df = t.to_pandas()
    df["us"] = df["ts"].astype("int64")
    from collections import Counter
    exp = Counter()
    for _, g in df.groupby("user_id"):
        g = g.sort_values(["us", "event_id"]).reset_index(drop=True)
        us = g["us"].to_numpy()
        et = g["event_type"].to_numpy()
        for i in range(len(g)):
            for j in range(i + 1, len(g)):
                if us[j] - us[i] > w:
                    break
                exp[(et[i], et[j])] += 1
    assert len(out) == len(exp)
    for k, v in exp.items():
        assert out.loc[k, "n"] == v


def test_temporal_pairs_guard_and_tie_order(ray_session):
    import ray.data as rd

    from netml_ray.sequences import temporal_pairs

    # two same-timestamp events: counted ONE way, by tiebreak order
    t = pa.table({
        "user_id": pa.array([1, 1]),
        "ts": pa.array([100, 100], type=pa.int64()).cast(
            pa.timestamp("us")),
        "event_id": pa.array([7, 3]),
        "event_type": pa.array(["x", "y"]),
    })
    out = temporal_pairs(rd.from_arrow(t), "user_id", "ts",
                         "event_type", window_us=10,
                         tiebreak="event_id").to_pandas()
    # event_id 3 ('y') precedes 7 ('x')
    assert len(out) == 1
    assert out.loc[0, "type_a"] == "y" and out.loc[0, "type_b"] == "x"

    # quadratic guard fails loudly
    big = pa.table({
        "user_id": pa.array([1] * 200),
        "ts": pa.array(np.zeros(200, dtype=np.int64)).cast(
            pa.timestamp("us")),
        "event_id": pa.array(np.arange(200)),
        "event_type": pa.array(["a"] * 200),
    })
    with pytest.raises(Exception, match="max_pairs_per_partition"):
        temporal_pairs(rd.from_arrow(big), "user_id", "ts",
                       "event_type", window_us=10, tiebreak="event_id",
                       max_pairs_per_partition=1000)


def test_active_users_vs_brute(ray_session):
    import ray.data as rd

    from netml_ray.sequences import active_users

    rng = np.random.default_rng(59)
    n = 4000
    w = 7
    day_us = 86400 * 10**6
    t = pa.table({
        "user_id": pa.array(rng.integers(0, 60, n)),
        "ts": pa.array(rng.integers(0, 60 * day_us, n)).cast(
            pa.timestamp("us")),
    })
    out = active_users(rd.from_arrow(t).repartition(6), "user_id",
                       "ts", window_days=w).to_pandas() \
        .set_index("day")

    df = t.to_pandas()
    df["day"] = df["ts"].astype("int64") // day_us
    lo, hi = df["day"].min(), df["day"].max()
    exp = {}
    for d in range(lo, hi + w):
        u = df.loc[(df["day"] >= d - w + 1) & (df["day"] <= d),
                   "user_id"].nunique()
        if u > 0:
            exp[d] = u
    assert set(out.index) == set(exp)
    for d, u in exp.items():
        assert out.loc[d, "wau"] == u


def test_active_users_interval_merge(ray_session):
    """One user active on days 0 and 3 (gap < w) covers one merged
    interval; days 0 and 20 cover two."""
    import ray.data as rd

    from netml_ray.sequences import active_users

    day_us = 86400 * 10**6
    t = pa.table({
        "user_id": pa.array([1, 1, 2, 2]),
        "ts": pa.array(np.array([0, 3, 0, 20]) * day_us).cast(
            pa.timestamp("us")),
    })
    out = active_users(rd.from_arrow(t), "user_id", "ts",
                       window_days=7).to_pandas().set_index("day")
    # user 1 covers days 0..9; user 2 covers 0..6 and 20..26
    assert out.loc[0, "wau"] == 2 and out.loc[6, "wau"] == 2
    assert out.loc[7, "wau"] == 1 and out.loc[9, "wau"] == 1
    assert 10 not in out.index and 19 not in out.index
    assert out.loc[20, "wau"] == 1 and out.loc[26, "wau"] == 1
    assert 27 not in out.index


def _mk_ts(n=5000, seed=17, nkeys=60, span_days=40):
    rng = np.random.default_rng(seed)
    us = rng.integers(0, span_days * 86_400_000_000, n)
    return pa.table({
        "k": pa.array(rng.integers(0, nkeys, n)),
        "ts": pa.array(us.astype("datetime64[us]")),
        "et": pa.array(rng.choice(list("ABC"), n)),
        "v": pa.array(rng.uniform(-5, 5, n).round(3)),
        "i": pa.array(np.arange(n, dtype=np.int64)),
    })


def test_streaks_vs_brute(ray_session):
    """Gaps-and-islands streaks == per-key python walk over distinct
    sorted days, for any partitioning."""
    import ray.data as rd

    from netml_ray.sequences import streaks

    t = _mk_ts()
    pdf = t.to_pandas()
    pdf["day"] = pdf["ts"].astype("int64") // 86_400_000_000
    exp = {}
    for k, sub in pdf.groupby("k"):
        days = sorted(set(sub["day"]))
        longest = cur = 1
        for a, b in zip(days, days[1:]):
            cur = cur + 1 if b - a == 1 else 1
            longest = max(longest, cur)
        exp[k] = (len(days), longest)
    for parts in (1, 9):
        got = (streaks(rd.from_arrow(t).repartition(parts), "k", "ts")
               .to_pandas().set_index("k"))
        assert len(got) == len(exp)
        for k, (nd, ls) in exp.items():
            assert got.loc[k, "n_active_days"] == nd
            assert got.loc[k, "longest_streak"] == ls


def test_scd2_vs_brute(ray_session):
    """SCD-2 intervals == a per-key python run collapse: one row per
    maximal same-type run, valid_to = next run's first ts (NaT on the
    last run), n_rows exact."""
    import ray.data as rd

    from netml_ray.sequences import scd2_intervals

    t = _mk_ts(n=3000, nkeys=40)
    pdf = t.to_pandas().sort_values(["k", "ts", "i"])
    exp = []
    for k, sub in pdf.groupby("k"):
        runs = []
        for _, row in sub.iterrows():
            if runs and runs[-1][0] == row["et"]:
                runs[-1][2] += 1
            else:
                runs.append([row["et"], row["ts"], 1])
        for j, (et, vf, nr) in enumerate(runs):
            vt = runs[j + 1][1] if j + 1 < len(runs) else pd.NaT
            exp.append((k, et, vf, vt, nr))
    expdf = (pd.DataFrame(exp, columns=["k", "et", "valid_from",
                                        "valid_to", "n_rows"])
             .sort_values(["k", "valid_from", "et"])
             .reset_index(drop=True))
    for c in ("valid_from", "valid_to"):
        expdf[c] = expdf[c].astype("datetime64[ns]")
    for parts in (1, 6):
        got = (scd2_intervals(rd.from_arrow(t).repartition(parts),
                              "k", "ts", "et", tiebreak="i")
               .to_pandas()
               .sort_values(["k", "valid_from", "et"])
               .reset_index(drop=True))
        for c in ("valid_from", "valid_to"):
            got[c] = got[c].astype("datetime64[ns]")
        pd.testing.assert_frame_equal(got, expdf, check_dtype=False)


def test_time_weighted_avg_vs_brute(ray_session):
    """Duration-weighted mean == per-key python lead-delta sums;
    single-event keys drop; an all-same-timestamp key emits NULL."""
    import ray.data as rd

    from netml_ray.sequences import time_weighted_avg

    t = _mk_ts(n=4000, nkeys=50)
    # append a singleton key and an all-ties key
    extra = pa.table({
        "k": pa.array([997, 998, 998, 998], type=pa.int64()),
        "ts": pa.array(np.array([11, 7, 7, 7],
                                dtype="datetime64[us]")),
        "et": pa.array(["A"] * 4),
        "v": pa.array([1.0, 2.0, 3.0, 4.0]),
        "i": pa.array([90001, 90002, 90003, 90004],
                      type=pa.int64()),
    })
    t = pa.concat_tables([t, extra])
    pdf = t.to_pandas().sort_values(["k", "ts", "i"])
    exp = {}
    for k, sub in pdf.groupby("k"):
        e = sub["ts"].astype("int64").to_numpy()
        v = sub["v"].to_numpy()
        if len(e) < 2:
            continue
        dur = (e[1:] - e[:-1]).astype(float)
        num = float((v[:-1] * dur).sum())
        den = float(dur.sum())
        exp[k] = (round(num / den, 9) if den > 0 else None,
                  len(e) - 1)
    for parts in (1, 8):
        got = (time_weighted_avg(rd.from_arrow(t).repartition(parts),
                                 "k", "ts", "v", tiebreak="i")
               .to_pandas().set_index("k"))
        assert len(got) == len(exp)
        assert 997 not in got.index
        assert np.isnan(got.loc[998, "twa"]) and exp[998][0] is None
        for k, (twa, nseg) in exp.items():
            assert got.loc[k, "n_seg"] == nseg
            if twa is not None:
                assert got.loc[k, "twa"] == pytest.approx(twa,
                                                          abs=1e-9)


def test_debounce_vs_brute(ray_session):
    """Lag-based debounce == per-(key,type) python walk: keep iff
    first or >= gap after the immediately preceding event."""
    import ray.data as rd

    from netml_ray.sequences import debounce

    t = _mk_ts(n=4000, nkeys=30, span_days=10)
    gap = 6 * 3600 * 10**6
    pdf = t.to_pandas().sort_values(["k", "et", "ts", "i"])
    keep_ids = []
    for _, sub in pdf.groupby(["k", "et"]):
        e = sub["ts"].astype("int64").to_numpy()
        ids = sub["i"].to_numpy()
        keep_ids.append(ids[0])
        for j in range(1, len(e)):
            if e[j] - e[j - 1] >= gap:
                keep_ids.append(ids[j])
    exp = set(int(x) for x in keep_ids)
    assert 0 < len(exp) < len(pdf)      # the gap actually bites
    for parts in (1, 7):
        got = debounce(rd.from_arrow(t).repartition(parts),
                       ["k", "et"], "ts", gap, tiebreak="i")
        assert set(got.to_pandas()["i"]) == exp


def test_event_paths_vs_brute(ray_session):
    """Journey strings == per-key python join (with and without the
    max_len cap), any partitioning."""
    import ray.data as rd

    from netml_ray.sequences import event_paths

    t = _mk(seed=21, n=2000, nkeys=40)
    pdf = t.to_pandas().sort_values(["k", "ts", "i"])
    for cap in (None, 10):
        exp = {}
        for k, sub in pdf.groupby("k"):
            ets = sub["et"].tolist()
            if cap is not None:
                ets = ets[:cap]
            exp[k] = (">".join(ets), len(ets))
        for parts in (1, 6):
            got = (event_paths(rd.from_arrow(t).repartition(parts),
                               "k", "ts", "et", tiebreak="i",
                               max_len=cap)
                   .to_pandas().set_index("k"))
            assert len(got) == len(exp)
            for k, (p, n) in exp.items():
                assert got.loc[k, "path"] == p
                assert got.loc[k, "n_events"] == n


def test_trigram_counts_vs_pandas(ray_session):
    """Adjacent-triple counts == a double-shift pandas reference; no
    triple crosses a key boundary."""
    import ray.data as rd

    from netml_ray.sequences import trigram_counts

    t = _mk(seed=22)
    pdf = t.to_pandas().sort_values(["k", "ts", "i"])
    g = pdf.groupby("k")["et"]
    ref = (pd.DataFrame({"t1": pdf["et"], "t2": g.shift(-1),
                         "t3": g.shift(-2)})
           .dropna().groupby(["t1", "t2", "t3"])
           .size().rename("n").reset_index()
           .sort_values(["t1", "t2", "t3"]).reset_index(drop=True))
    for parts in (1, 6):
        got = trigram_counts(
            rd.from_arrow(t).repartition(parts), "k", "ts", "et",
            tiebreak="i").to_pandas()
        pd.testing.assert_frame_equal(got, ref, check_dtype=False)


def test_new_returning_vs_brute(ray_session):
    """Daily new/returning split == a pandas first-seen brute; the
    per-day totals equal distinct active users and each user is 'new'
    exactly once."""
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.sequences import new_returning

    rng = np.random.default_rng(21)
    n = 9_000
    us = rng.integers(1_700_000_000_000_000, 1_702_600_000_000_000, n)
    uid = rng.integers(0, 300, n)
    t = pa.table({"user_id": pa.array(uid),
                  "ts": pa.array(us.astype("datetime64[us]"))})
    out = new_returning(rd.from_arrow(t).repartition(6),
                        "user_id", "ts").to_pandas().set_index("day")
    df = t.to_pandas()
    df["day"] = df["ts"].astype("int64") // (86_400 * 10**6)
    du = df[["user_id", "day"]].drop_duplicates()
    d0 = du.groupby("user_id")["day"].min()
    du = du.assign(is_new=du["day"].values == d0[du["user_id"]].values)
    ref = du.groupby("day")["is_new"].agg(["sum", "count"])
    assert len(out) == len(ref)
    assert (out["new_users"] == ref["sum"]).all()
    assert (out["returning_users"] == ref["count"] - ref["sum"]).all()
    assert out["new_users"].sum() == df["user_id"].nunique()


def test_markov_accuracy_vs_brute(ray_session):
    """Per-from-type prediction == mode of next type (tie → smallest)
    and accuracy == mode share, vs a pandas lead brute."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.sequences import markov_accuracy

    rng = np.random.default_rng(61)
    n = 5_000
    t = pa.table({
        "user_id": pa.array(rng.integers(0, 80, n)),
        "ts": pa.array(np.sort(rng.integers(0, 10**9, n))
                       .astype("datetime64[us]")),
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "etype": pa.array(rng.choice(["a", "b", "c", "d"], n,
                                     p=[0.5, 0.3, 0.1, 0.1]))})
    out = markov_accuracy(rd.from_arrow(t).repartition(5), "user_id",
                          "ts", "etype", tiebreak="event_id") \
        .to_pandas().set_index("from_type")
    df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
    df["next"] = df.groupby("user_id")["etype"].shift(-1)
    tr = df.dropna(subset=["next"])
    ref = tr.groupby(["etype", "next"]).size().rename("n").reset_index()
    for f, sub in ref.groupby("etype"):
        sub = sub.sort_values(["n", "next"],
                              ascending=[False, True])
        assert out.loc[f, "predicted"] == sub.iloc[0]["next"]
        assert out.loc[f, "n_correct"] == sub.iloc[0]["n"]
        assert out.loc[f, "n_transitions"] == sub["n"].sum()
        assert abs(out.loc[f, "accuracy"]
                   - sub.iloc[0]["n"] / sub["n"].sum()) < 1e-8


def test_funnel_rates_vs_brute(ray_session):
    """Per-stage reach == brute stage-counts from funnel_stages
    semantics; conversions multiply back to the final reach."""
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.sequences import funnel_rates, funnel_stages

    rng = np.random.default_rng(81)
    n = 4_000
    t = pa.table({
        "user_id": pa.array(rng.integers(0, 120, n)),
        "ts": pa.array(np.sort(rng.uniform(0, 1e6, n))),
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "etype": pa.array(rng.choice(["a", "b", "c", "x"], n))})
    stages = ["a", "b", "c"]
    out = funnel_rates(rd.from_arrow(t), "user_id", "ts", "etype",
                       stages, tiebreak="event_id").to_pandas()
    per_key = funnel_stages(rd.from_arrow(t), "user_id", "ts",
                            "etype", stages, tiebreak="event_id") \
        .to_pandas()
    n_keys = len(per_key)
    for i in range(1, 4):
        reached = int((per_key["stages_completed"] >= i).sum())
        row = out[out["stage"] == i].iloc[0]
        assert row["n_reached"] == reached
        prev = n_keys if i == 1 else \
            int((per_key["stages_completed"] >= i - 1).sum())
        assert abs(row["conversion"] - reached / prev) < 1e-9
    assert list(out["stage_name"]) == stages


def test_event_gaps_vs_brute(ray_session):
    """Per-key gap count / lower-median / max == a python walk;
    single-event keys are dropped."""
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.sequences import event_gaps

    rng = np.random.default_rng(92)
    n = 3_000
    t = pa.table({
        "user_id": pa.array(rng.integers(0, 90, n)),
        "ts": pa.array(rng.choice(10**9, n, replace=False)
                       .astype(np.int64).astype("datetime64[us]")),
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "etype": pa.array(rng.choice(["p", "x"], n))})
    out = event_gaps(rd.from_arrow(t).repartition(5), "user_id", "ts",
                     type_col="etype", event_type="p",
                     tiebreak="event_id").to_pandas() \
        .set_index("user_id")
    df = t.to_pandas()
    df = df[df["etype"] == "p"].sort_values(["user_id", "ts"])
    seen = 0
    for uid, sub in df.groupby("user_id"):
        us = sub["ts"].astype("int64").to_numpy()
        if len(us) < 2:
            assert uid not in out.index
            continue
        gaps = np.sort(np.diff(us))
        assert out.loc[uid, "n_events"] == len(us)
        assert out.loc[uid, "median_gap_us"] == gaps[(len(gaps) - 1) // 2]
        assert out.loc[uid, "max_gap_us"] == gaps[-1]
        seen += 1
    assert seen == len(out)


def test_session_conversion_vs_brute(ray_session):
    """Session counts + converted sessions == a python timeout walk."""
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.sequences import session_conversion

    rng = np.random.default_rng(93)
    n = 4_000
    t = pa.table({
        "user_id": pa.array(rng.integers(0, 70, n)),
        "ts": pa.array(np.sort(rng.integers(0, 10**13, n))
                       .astype("datetime64[us]")),
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "etype": pa.array(rng.choice(["buy", "view"], n,
                                     p=[0.15, 0.85]))})
    gap = 3600.0
    out = session_conversion(rd.from_arrow(t).repartition(5),
                             "user_id", "ts", "etype", gap_s=gap,
                             convert_type="buy", tiebreak="event_id") \
        .to_pandas().set_index("user_id")
    df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
    for uid, sub in df.groupby("user_id"):
        sec = sub["ts"].astype("int64").to_numpy() / 1e6
        conv = (sub["etype"] == "buy").to_numpy()
        n_sess, n_conv, cur_conv = 0, 0, False
        for i in range(len(sec)):
            if i == 0 or sec[i] - sec[i - 1] > gap:
                if n_sess:
                    n_conv += int(cur_conv)
                n_sess += 1
                cur_conv = False
            cur_conv = cur_conv or conv[i]
        n_conv += int(cur_conv)
        assert out.loc[uid, "n_sessions"] == n_sess
        assert out.loc[uid, "n_converted"] == n_conv
        assert out.loc[uid, "conversion"] == n_conv / n_sess


def test_dod_retention_vs_brute(ray_session):
    """Per-day active/retained == a pandas set brute; last day retains
    zero."""
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.sequences import dod_retention

    rng = np.random.default_rng(102)
    n = 6_000
    us = rng.integers(0, 20 * 86_400 * 10**6, n)
    uid = rng.integers(0, 150, n)
    t = pa.table({"user_id": pa.array(uid),
                  "ts": pa.array(us.astype("datetime64[us]"))})
    out = dod_retention(rd.from_arrow(t).repartition(5),
                        "user_id", "ts").to_pandas().set_index("day")
    df = t.to_pandas()
    df["day"] = df["ts"].astype("int64") // (86_400 * 10**6)
    byday = df.groupby("day")["user_id"].agg(set)
    for d, users in byday.items():
        nxt = byday.get(d + 1, set())
        assert out.loc[d, "n_active"] == len(users)
        assert out.loc[d, "n_retained"] == len(users & nxt)
    assert out.iloc[-1]["n_retained"] == len(
        byday.iloc[-1] & byday.get(byday.index[-1] + 1, set()))


def test_skipgram_pairs_vs_brute(ray_session):
    """skipgram counts match a per-key brute double loop; window=1
    equals the symmetrized transition matrix."""
    import pyarrow as pa
    import ray.data as rd
    from collections import Counter

    from netml_ray.sequences import skipgram_pairs, transition_counts

    rng = np.random.default_rng(33)
    n = 2_000
    t = pa.table({
        "u": pa.array(rng.integers(0, 40, n)),
        "ts": pa.array(np.sort(rng.uniform(0, 1e4, n))),
        "eid": pa.array(np.arange(n, dtype=np.int64)),
        "ty": pa.array(rng.choice(["a", "b", "c", "d"], n))})
    out = skipgram_pairs(rd.from_arrow(t).repartition(5), "u", "ts",
                         "ty", window=2, tiebreak="eid").to_pandas()
    df = t.to_pandas().sort_values(["u", "ts", "eid"])
    brute = Counter()
    for _, g in df.groupby("u"):
        ty = list(g["ty"])
        for i in range(len(ty)):
            for j in range(max(0, i - 2), min(len(ty), i + 3)):
                if j != i:
                    brute[(ty[i], ty[j])] += 1
    got = {(r.center, r.context): r.n for r in out.itertuples()}
    assert got == dict(brute)

    w1 = skipgram_pairs(rd.from_arrow(t), "u", "ts", "ty",
                        window=1, tiebreak="eid").to_pandas()
    tr = transition_counts(rd.from_arrow(t), "u", "ts", "ty",
                           tiebreak="eid").to_pandas()
    trc = Counter()
    for r in tr.itertuples():
        trc[(r.from_type, r.to_type)] += r.n
        trc[(r.to_type, r.from_type)] += r.n
    assert {(r.center, r.context): r.n for r in w1.itertuples()} \
        == dict(trc)


def test_out_of_order_stats_vs_brute(ray_session):
    """lateness counts/maxima match a per-key brute walk; in-order
    keys report zero."""
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.sequences import out_of_order_stats

    rng = np.random.default_rng(19)
    n = 3_000
    key = rng.integers(0, 60, n)
    arr = np.arange(n, dtype=np.int64)           # unique arrival
    ts = rng.integers(0, 10**9, n)               # µs, shuffled → late
    t = pa.table({"k": pa.array(key), "a": pa.array(arr),
                  "ts": pa.array(ts.astype("datetime64[us]"))})
    out = out_of_order_stats(rd.from_arrow(t).repartition(5), "k",
                             "ts", arrival_col="a").to_pandas() \
        .set_index("k").sort_index()
    df = t.to_pandas()
    df["ts_us"] = df["ts"].astype("int64")
    for k, g in df.sort_values("a").groupby("k"):
        wm, n_late, worst = None, 0, 0
        for v in g["ts_us"]:
            if wm is not None and v < wm:
                n_late += 1
                worst = max(worst, wm - v)
            wm = v if wm is None else max(wm, v)
        assert out.loc[k, "n_late"] == n_late
        assert out.loc[k, "max_lateness_us"] == worst
        assert out.loc[k, "n_events"] == len(g)

    ordered = pa.table({
        "k": pa.array(np.zeros(100, dtype=np.int64)),
        "a": pa.array(np.arange(100, dtype=np.int64)),
        "ts": pa.array(np.arange(100).astype("datetime64[us]"))})
    o = out_of_order_stats(rd.from_arrow(ordered), "k", "ts",
                           arrival_col="a").to_pandas().iloc[0]
    assert o["n_late"] == 0 and o["max_lateness_us"] == 0


def test_windowed_dedup_vs_brute(ray_session):
    """first event per (key, type, window) survives; replays planted
    in the same window collapse, next-window copies survive."""
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.sequences import windowed_dedup

    rng = np.random.default_rng(44)
    n = 2_000
    ts = rng.integers(0, 50_000, n)          # window_us=10_000 → 5 windows
    t = pa.table({
        "eid": pa.array(np.arange(n, dtype=np.int64)),
        "k": pa.array(rng.integers(0, 30, n)),
        "ty": pa.array(rng.choice(["a", "b"], n)),
        "ts": pa.array(ts.astype("datetime64[us]"))})
    out = windowed_dedup(rd.from_arrow(t).repartition(4), "k", "ty",
                         "ts", window_us=10_000,
                         tiebreak="eid").to_pandas()
    df = t.to_pandas()
    df["ts_us"] = df["ts"].astype("int64")
    df["w"] = df["ts_us"] // 10_000
    exp = df.sort_values(["ts_us", "eid"]) \
        .groupby(["k", "ty", "w"]).head(1)
    assert sorted(out["eid"]) == sorted(exp["eid"])
