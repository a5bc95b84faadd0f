"""Vectorized kernels vs the row-wise oracle (reference semantics)."""

import numpy as np
import pandas as pd
import pytest

from netml_ray import kernels, oracle


def make_keyed_data(seed=3, n_keys=25, max_rows=60):
    """Random keyed event data with gap bursts, duplicate ts, singletons."""
    rng = np.random.default_rng(seed)
    keys, ts, sizes = [], [], []
    for k in range(n_keys):
        n = 1 if k % 9 == 0 else int(rng.integers(2, max_rows))
        t = float(rng.uniform(0, 1000))
        for _ in range(n):
            keys.append(f"k{k:03d}")
            ts.append(t)
            sizes.append(float(rng.integers(1, 2000)))
            r = rng.integers(0, 12)
            if r == 0:
                dt = 0.0  # duplicate timestamp
            elif r == 1:
                dt = float(rng.choice([599.5, 600.0, 600.5, 1200.0]))  # gap boundary
            elif r == 2:
                dt = float(rng.uniform(600.0, 5000.0))  # big gap
            else:
                dt = float(rng.uniform(0.1, 120.0))
            t += dt
    df = pd.DataFrame({"key": keys, "ts": ts, "size": sizes})
    return df


def sorted_arrays(df):
    d = df.sort_values(["key", "ts"], kind="stable").reset_index(drop=True)
    codes = pd.factorize(d["key"])[0].astype(np.int64)
    return d, codes, d["ts"].to_numpy(), d["size"].to_numpy()


def flows_from_kernel(d, keep, seg_ids):
    """Reconstruct (key, times, sizes) per kept segment for comparison."""
    d = d.assign(_seg=seg_ids)[keep]
    out = []
    for (k, s), g in d.groupby(["key", "_seg"], sort=True):
        out.append((k, tuple(g["ts"]), tuple(g["size"])))
    return sorted(out)


def flows_to_cmp(flows):
    return sorted((k, tuple(t), tuple(s)) for k, t, s in flows)


@pytest.mark.parametrize("gap", [600.0, 100.0, 3000.0])
def test_gap_sessionize_netml_vs_oracle(gap):
    df = make_keyed_data()
    d, codes, ts, sz = sorted_arrays(df)
    keep, ordinal = kernels.gap_sessionize(codes, ts, gap, min_rows=2, netml=True)
    got = flows_from_kernel(d, keep, kernels.encode_keys(codes, ordinal))
    exp = flows_to_cmp(oracle.gap_sessionize(oracle.df_to_flows(df, "key", "ts", "size"), gap, 2))
    assert got == exp


def test_gap_sessionize_simple_no_drops():
    df = make_keyed_data(seed=5)
    d, codes, ts, sz = sorted_arrays(df)
    keep, ordinal = kernels.gap_sessionize(codes, ts, 600.0, netml=False)
    assert keep.all()
    # ordinal increments exactly at gap cuts within key
    for k, g in d.assign(o=ordinal).groupby("key"):
        cuts = (g["ts"].diff() > 600.0).fillna(False).cumsum()
        assert (g["o"].to_numpy() == cuts.to_numpy()).all()


@pytest.mark.parametrize("interval", [50.0, 137.7, 700.0])
def test_interval_split_vs_oracle(interval):
    df = make_keyed_data(seed=11)
    flows_g3 = oracle.gap_sessionize(oracle.df_to_flows(df, "key", "ts", "size"), 600.0, 2)
    exp = flows_to_cmp(oracle.interval_split(flows_g3, interval, 2))

    d, codes, ts, sz = sorted_arrays(df)
    keep, g3_ord = kernels.gap_sessionize(codes, ts, 600.0, min_rows=2, netml=True)
    d2 = d[keep].reset_index(drop=True)
    codes2, ts2 = codes[keep], ts[keep]
    seg = kernels.encode_keys(codes2, g3_ord[keep])
    keep2, sub = kernels.interval_split(seg, ts2, interval, min_rows=2)
    got = flows_from_kernel(d2, keep2, kernels.encode_keys(seg, sub))
    assert got == exp


def _final_flows(df, gap=600.0, q=0.9):
    flows, interval = oracle.netml_sessionize(df, "key", "ts", "size", gap=gap, q_interval=q)
    return flows, interval


def _kernel_final(df, interval, gap=600.0):
    d, codes, ts, sz = sorted_arrays(df)
    keep, g3 = kernels.gap_sessionize(codes, ts, gap, min_rows=2, netml=True)
    d2 = d[keep].reset_index(drop=True)
    codes2, ts2, sz2 = codes[keep], ts[keep], sz[keep]
    seg = kernels.encode_keys(codes2, g3[keep])
    keep2, sub = kernels.interval_split(seg, ts2, interval, min_rows=2)
    d3 = d2[keep2].reset_index(drop=True)
    final_seg = kernels.encode_keys(seg, sub)[keep2]
    # re-densify codes
    final_seg = kernels.encode_keys(final_seg)
    return d3, final_seg


def test_full_session_pipeline_and_features():
    df = make_keyed_data(seed=21, n_keys=40)
    flows, interval = _final_flows(df)
    d3, seg = _kernel_final(df, interval)
    codes3 = pd.factorize(d3["key"])[0].astype(np.int64)
    ts3, sz3 = d3["ts"].to_numpy(), d3["size"].to_numpy()

    got_flows = flows_from_kernel(d3, np.ones(len(d3), bool), seg)
    assert got_flows == flows_to_cmp(flows)

    # map oracle flows into the kernel's (key, start-time) sort order
    oflows = sorted(flows, key=lambda f: (f[0], f[1][0], tuple(f[1])))

    starts = kernels.segment_starts(seg)
    ends = np.r_[starts[1:], len(seg)]

    # IAT
    offs, vals = kernels.iat_lists(seg, ts3)
    exp = oracle.feat_iat(oflows)
    for i in range(len(starts)):
        np.testing.assert_allclose(vals[offs[i]:offs[i + 1]], exp[i])

    # SIZE
    offs, vals = kernels.size_lists(seg, sz3)
    exp = oracle.feat_size(oflows)
    for i in range(len(starts)):
        np.testing.assert_allclose(vals[offs[i]:offs[i + 1]], exp[i])

    # IAT_SIZE
    offs, vals = kernels.iat_size_lists(seg, ts3, sz3)
    exp = oracle.feat_iat_size(oflows)
    for i in range(len(starts)):
        np.testing.assert_allclose(vals[offs[i]:offs[i + 1]], exp[i])

    # STATS
    mat = kernels.stats_matrix(seg, ts3, sz3)
    exp = np.array(oracle.feat_stats(oflows))
    np.testing.assert_allclose(mat, exp, rtol=1e-9, atol=1e-12)

    # SAMP_NUM / SAMP_SIZE at several rates incl. the reference q=0.3 rate
    rate_ref = oracle.split_interval(oracle.flow_durations(oflows), 0.3)
    for rate in [rate_ref, 7.3, 0.9, 2000.0]:
        if rate <= 0:
            continue
        offs, vals = kernels.samp_lists(seg, ts3, None, rate)
        exp = oracle.feat_samp(oflows, rate, "SAMP_NUM")
        for i in range(len(starts)):
            np.testing.assert_allclose(vals[offs[i]:offs[i + 1]], exp[i], err_msg=f"NUM rate={rate} seg={i}")
        offs, vals = kernels.samp_lists(seg, ts3, sz3, rate)
        exp = oracle.feat_samp(oflows, rate, "SAMP_SIZE")
        for i in range(len(starts)):
            np.testing.assert_allclose(vals[offs[i]:offs[i + 1]], exp[i], err_msg=f"SIZE rate={rate} seg={i}")


def test_samp_cap_500():
    # one key, long regular spacing → many bins; exercise cap/truncate
    n = 80
    ts = np.arange(n, dtype=float) * 50.0  # 50s spacing
    df = pd.DataFrame({"key": ["k"] * n, "ts": ts, "size": np.ones(n)})
    flows = oracle.df_to_flows(df, "key", "ts", "size")
    seg = np.zeros(n, dtype=np.int64)
    for rate in [0.07, 0.05, 1.0]:  # tiny rates → >500 bins → cap
        offs, vals = kernels.samp_lists(seg, ts, None, rate)
        exp = oracle.feat_samp(flows, rate, "SAMP_NUM")
        np.testing.assert_allclose(vals[: offs[1]], exp[0], err_msg=f"rate={rate}")
        assert offs[1] == len(exp[0])


def test_pad_truncate_and_fft():
    feats = [[1.0, 2.0, 3.0], [4.0], [], [5.0, 6.0, 7.0, 8.0, 9.0]]
    offsets = np.r_[0, np.cumsum([len(f) for f in feats])]
    values = np.concatenate([np.array(f) for f in feats if f])
    for dim in [1, 2, 3, 6]:
        got = kernels.pad_truncate(offsets, values, dim)
        exp = oracle.pad_truncate(feats, dim)
        np.testing.assert_allclose(got, exp)
        np.testing.assert_allclose(kernels.fft_real(got, dim), oracle.fft_features(feats, dim))


def test_quantile_parity():
    rng = np.random.default_rng(0)
    v = rng.uniform(0, 100, 501)
    segs = np.r_[np.zeros(200, np.int64), np.ones(301, np.int64)]
    v_sorted_by_seg = v.copy()
    got = kernels.segmented_quantiles(v_sorted_by_seg, segs, (0.25, 0.5, 0.75, 0.9, 0.3))
    for si, sl in enumerate([slice(0, 200), slice(200, 501)]):
        for qi, q in enumerate((0.25, 0.5, 0.75, 0.9, 0.3)):
            assert got[si, qi] == pytest.approx(np.quantile(v[sl], q), abs=1e-12)


def test_lag_lead_and_rolling():
    seg = np.array([0, 0, 0, 0, 1, 1, 2], dtype=np.int64)
    v = np.array([1.0, 2.0, 3.0, 4.0, 10.0, 20.0, 7.0])
    lag, lead = kernels.lag_lead(seg, v, 1)
    np.testing.assert_array_equal(np.isnan(lag), [True, False, False, False, True, False, True])
    assert lag[1] == 1.0 and lead[0] == 2.0 and np.isnan(lead[3]) and lead[4] == 20.0

    r = kernels.rolling_stats(seg, v, 3)
    s = pd.Series(v)
    grp = pd.Series(seg)
    exp = s.groupby(grp).rolling(3, min_periods=1)
    np.testing.assert_allclose(r["mean"], exp.mean().to_numpy())
    np.testing.assert_allclose(r["sum"], exp.sum().to_numpy())
    np.testing.assert_allclose(r["min"], exp.min().to_numpy())
    np.testing.assert_allclose(r["max"], exp.max().to_numpy())
    np.testing.assert_allclose(r["count"], exp.count().to_numpy())
