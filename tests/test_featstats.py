"""featstats operators vs driver-side brute force (numpy/pandas)."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _events_table(n=6000, seed=11):
    rng = np.random.default_rng(seed)
    ts = np.sort(rng.uniform(0, 90 * 86400, n)) * 1e6
    return pa.table({
        "user_id": pa.array(rng.integers(0, 120, n)),
        "ts": pa.array(np.round(ts).astype(np.int64)).cast(
            pa.timestamp("us")),
        "value": pa.array(rng.normal(50, 20, n).round(3)),
        "etype": pa.array(rng.choice(["a", "b", "c", "d"], n)),
    })


def test_decayed_agg_vs_brute(ray_session):
    import ray.data as rd

    from netml_ray.featstats import decayed_agg

    t = _events_table()
    ds = rd.from_arrow(t).repartition(8)
    out = decayed_agg(ds, "user_id", "ts", "value",
                      half_life_s=7 * 86400.0).to_pandas()

    df = t.to_pandas()
    ts = df["ts"].astype("int64").to_numpy() / 1e6
    t_ref = ts.max()
    w = 0.5 ** ((t_ref - ts) / (7 * 86400.0))
    df = df.assign(w=w, wv=w * df["value"].to_numpy())
    exp = df.groupby("user_id").agg(ws=("wv", "sum"), wn=("w", "sum"))
    out = out.set_index("user_id").sort_index()
    assert np.allclose(out["decayed_sum"], exp["ws"])
    assert np.allclose(out["decayed_n"], exp["wn"])
    assert np.allclose(out["decayed_mean"], exp["ws"] / exp["wn"])


def test_decayed_agg_recency_direction(ray_session):
    """A key whose mass is all at t_ref dominates an equal-total key
    whose mass is old — the point of the decay weighting."""
    import ray.data as rd

    from netml_ray.featstats import decayed_agg

    day = 86400.0 * 1e6
    t = pa.table({
        "k": pa.array(["new"] * 5 + ["old"] * 5),
        "ts": pa.array(([int(90 * day)] * 5 + [int(1 * day)] * 5),
                       type=pa.int64()).cast(pa.timestamp("us")),
        "v": pa.array([10.0] * 10),
    })
    out = decayed_agg(rd.from_arrow(t), "k", "ts", "v",
                      half_life_s=86400.0).to_pandas().set_index("k")
    assert out.loc["new", "decayed_sum"] == 50.0
    assert out.loc["old", "decayed_sum"] < 1e-20


def test_chi2_independence_vs_brute(ray_session):
    import ray.data as rd

    from netml_ray.featstats import chi2_independence

    rng = np.random.default_rng(5)
    x = rng.choice(["en", "de", "fr"], 4000, p=[0.6, 0.25, 0.15])
    # dependent y: distribution shifts with x
    y = np.where(x == "en", rng.choice(["web", "book"], 4000, p=[0.8, 0.2]),
                 rng.choice(["web", "book"], 4000, p=[0.3, 0.7]))
    t = pa.table({"lang": pa.array(x), "source": pa.array(y)})
    out = chi2_independence(rd.from_arrow(t).repartition(6),
                            "lang", "source").to_pandas()

    obs = pd.crosstab(pd.Series(x), pd.Series(y)).to_numpy().astype(float)
    exp = obs.sum(1, keepdims=True) * obs.sum(0, keepdims=True) / obs.sum()
    chi2 = ((obs - exp) ** 2 / exp).sum()
    assert np.isclose(out["chi2"][0], chi2)
    assert out["dof"][0] == 2
    assert out["n"][0] == 4000
    assert out["chi2"][0] > 100  # clearly dependent


def test_benford_digits(ray_session):
    import ray.data as rd

    from netml_ray.featstats import benford_digits

    rng = np.random.default_rng(7)
    # log-uniform data follows Benford closely
    v = 10 ** rng.uniform(0, 5, 20000)
    t = pa.table({"x": pa.array(v)})
    out = benford_digits(rd.from_arrow(t).repartition(5),
                         "x").to_pandas()
    assert list(out["digit"]) == list(range(1, 10))
    assert out["n"].sum() == 20000
    assert np.allclose(out["p_obs"].sum(), 1.0)
    # observed tracks Benford within sampling noise
    assert np.abs(out["p_obs"] - out["p_benford"]).max() < 0.02
    # per-digit first-digit extraction matches string brute force
    brute = np.array([int(f"{x:e}"[0]) for x in v])
    bn = np.bincount(brute, minlength=10)[1:10]
    assert list(out["n"]) == list(bn)


def test_burstiness_vs_brute(ray_session):
    import ray.data as rd

    from netml_ray.featstats import burstiness

    t = _events_table(seed=13)
    out = burstiness(rd.from_arrow(t).repartition(7), "user_id", "ts",
                     bucket_s=86400.0).to_pandas().set_index("user_id")

    df = t.to_pandas()
    sec = df["ts"].astype("int64").to_numpy() / 1e6
    df = df.assign(b=np.floor(sec / 86400.0).astype(np.int64))
    cnt = df.groupby(["user_id", "b"]).size().rename("n").reset_index()
    for uid, g in cnt.groupby("user_id"):
        n = g["n"].to_numpy().astype(float)
        mu, m2 = n.mean(), n.var()
        sigma = np.sqrt(m2)
        assert out.loc[uid, "n_buckets"] == len(n)
        assert np.isclose(out.loc[uid, "fano"], m2 / mu)
        assert np.isclose(out.loc[uid, "burstiness"],
                          (sigma - mu) / (sigma + mu))


def test_gini_vs_brute(ray_session):
    import ray.data as rd

    from netml_ray.featstats import gini

    rng = np.random.default_rng(3)
    t = pa.table({
        "src": pa.array(rng.choice(["a", "b", "c"], 3000)),
        "x": pa.array(rng.pareto(2.0, 3000) * 100 + 1),
    })
    out = gini(rd.from_arrow(t).repartition(5), "src",
               "x").to_pandas().set_index("src")
    df = t.to_pandas()
    for src, g in df.groupby("src"):
        x = np.sort(g["x"].to_numpy())
        n = len(x)
        i = np.arange(1, n + 1)
        expect = 2.0 * (i * x).sum() / (n * x.sum()) - (n + 1.0) / n
        assert np.isclose(out.loc[src, "gini"], expect)
        assert 0.0 < out.loc[src, "gini"] < 1.0


def test_gini_extremes(ray_session):
    import ray.data as rd

    from netml_ray.featstats import gini

    t = pa.table({
        "k": pa.array(["eq"] * 100 + ["conc"] * 100),
        "x": pa.array([5.0] * 100 + [0.0] * 99 + [1000.0]),
    })
    out = gini(rd.from_arrow(t), "k", "x").to_pandas().set_index("k")
    assert np.isclose(out.loc["eq", "gini"], 0.0)       # perfect equality
    assert np.isclose(out.loc["conc", "gini"], 0.99)    # (n-1)/n


def test_zipf_slope_vs_polyfit(ray_session):
    import ray.data as rd

    from netml_ray.featstats import zipf_slope

    rng = np.random.default_rng(9)
    # Zipf-distributed token stream over a 500-word vocabulary
    vocab = np.array([f"w{i}" for i in range(500)])
    freq = 1.0 / np.arange(1, 501)
    tok = rng.choice(vocab, size=(2000, 30), p=freq / freq.sum())
    docs = pa.table({"text": pa.array([" ".join(r) for r in tok])})
    out = zipf_slope(rd.from_arrow(docs).repartition(4), "text",
                     top_n=100).to_pandas()

    counts = pd.Series(tok.ravel()).value_counts()
    top = counts.sort_values(ascending=False).head(100)
    # tie-break parity: (count desc, token asc)
    top = (top.rename_axis("tok").reset_index(name="n")
           .sort_values(["n", "tok"], ascending=[False, True]).head(100))
    lx = np.log(np.arange(1, 101))
    ly = np.log(top["n"].to_numpy().astype(float))
    slope, intercept = np.polyfit(lx, ly, 1)
    assert np.isclose(out["slope"][0], slope, atol=1e-6)
    assert np.isclose(out["intercept"][0], intercept, atol=1e-6)
    assert out["n_terms"][0] == 100
    assert -1.35 < out["slope"][0] < -0.65  # Zipf-ish corpus
    assert out["r2"][0] > 0.9


def test_winsorized_group_stats(ray_session):
    import ray.data as rd

    from netml_ray.featstats import winsorized_group_stats

    t = _events_table(seed=17)
    out = winsorized_group_stats(
        rd.from_arrow(t).repartition(6), "value", "etype",
        p_lo=0.05, p_hi=0.95).to_pandas().set_index("etype")

    df = t.to_pandas()
    lo, hi = np.quantile(df["value"], [0.05, 0.95])
    df = df.assign(v=df["value"].clip(lo, hi))
    exp = df.groupby("etype")["v"].agg(["count", "mean", "min", "max"])
    assert np.array_equal(out["n"], exp["count"])
    assert np.allclose(out["mean_w"], exp["mean"])
    assert np.allclose(out["min_w"], exp["min"])
    assert np.allclose(out["max_w"], exp["max"])
    assert out["min_w"].min() >= lo - 1e-9
    assert out["max_w"].max() <= hi + 1e-9


def test_attribution_last_touch_semantics(ray_session, tmp_path):
    """Crafted stream: purchase attributed to the latest touch at-or-
    before it; same-ts touches break ties by max event_id; a purchase
    with no prior touch lands in 'none'."""
    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod

    us = 1_000_000
    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6, 7], type=pa.int64()),
        "ts": pa.array([1 * us, 2 * us, 2 * us, 3 * us,
                        1 * us, 5 * us, 9 * us],
                       type=pa.int64()).cast(pa.timestamp("us")),
        "user_id": pa.array([10, 10, 10, 10, 20, 20, 30],
                            type=pa.int64()),
        "event_type": pa.array(["click", "view", "click", "purchase",
                                "purchase", "purchase", "purchase"]),
        "value": pa.array([0.0] * 7),
        "props": pa.array([""] * 7),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = (entrymod.q_attribution_events(str(tmp_path))
           .to_pandas().set_index("channel"))
    # user 10: purchase@3 sees click(1), view(2,id=2), click(2,id=3)
    #   → latest ts=2, tie by max event_id → click
    # user 20: purchase@1 has no prior touch (purchase@5 is not a
    #   touch) → none; user 30 likewise → none
    assert out.loc["click", "conversions"] == 1
    assert out.loc["none", "conversions"] == 3


def test_stratified_sample_exact_proportions(ray_session, monkeypatch):
    """Every stratum yields EXACTLY ceil(frac * n_k) rows, the chosen
    ids are the md5-order prefix, and fast == distributed."""
    import hashlib

    import ray.data as rd

    from netml_ray.curation import stratified_sample

    rng = np.random.default_rng(6)
    n = 4000
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "source": pa.array(rng.choice(["cc", "wiki", "code"], n,
                                      p=[0.7, 0.2, 0.1])),
    })

    def run():
        return stratified_sample(rd.from_arrow(t).repartition(5),
                                 "source", "doc_id", 0.25).to_pandas()

    monkeypatch.setenv("NETML_RAY_PMAP_DRIVER_BYTES", "0")
    dist = run()
    monkeypatch.setenv("NETML_RAY_PMAP_DRIVER_BYTES", str(1 << 40))
    fast = run()
    for out in (dist, fast):
        df = t.to_pandas()
        sizes = df.groupby("source").size()
        got = out.groupby("source").size()
        for src, nk in sizes.items():
            assert got[src] == int(np.ceil(0.25 * nk))
            g = df[df.source == src].assign(
                hk=lambda d: [int(hashlib.md5(str(i).encode())
                                  .hexdigest()[:15], 16)
                              for i in d.doc_id])
            want = set(g.sort_values(["hk", "doc_id"])
                       .head(int(np.ceil(0.25 * nk)))["doc_id"])
            assert set(out[out.source == src]["doc_id"]) == want
    pd.testing.assert_frame_equal(
        dist.sort_values(["source", "doc_id"]).reset_index(drop=True),
        fast.sort_values(["source", "doc_id"]).reset_index(drop=True))


def test_jaro_winkler_batch_duckdb_parity():
    """Fuzz the vectorized JW kernel against DuckDB's native
    jaro_winkler_similarity (the oracle scorer) — classic edges plus
    random strings incl. empties and repeats."""
    import random
    import string

    import duckdb

    from netml_ray.dedup import jaro_winkler_pairs_batch

    random.seed(123)
    pairs = [("martha", "marhta"), ("dixon", "dicksonx"),
             ("prefixaaaa", "prefixbbbb"), ("", ""), ("a", ""),
             ("abcdef", "abcdef"), ("ab", "ba"), ("xabcde", "yabcde"),
             ("aaaa", "aaaaaaaaaa")]
    for _ in range(1500):
        a = "".join(random.choices(string.ascii_lowercase[:5],
                                   k=random.randint(0, 24)))
        b = "".join(random.choices(string.ascii_lowercase[:5],
                                   k=random.randint(0, 24)))
        pairs.append((a, b))
    got = jaro_winkler_pairs_batch([p[0] for p in pairs],
                                   [p[1] for p in pairs])
    con = duckdb.connect()
    exp = np.array([con.execute(
        "SELECT jaro_winkler_similarity(?, ?)", [a, b]).fetchone()[0]
        for a, b in pairs])
    assert np.allclose(got, exp, atol=1e-12)


def test_jaro_winkler_pairs_finds_planted_mutations(ray_session):
    import ray.data as rd

    from netml_ray.dedup import jaro_winkler_pairs

    rng = np.random.default_rng(2)
    texts = ["the quick brown fox number %d jumps over the lazy dog" % i
             for i in range(200)]
    mut = [t[:9] + "Z" + t[10:] for t in texts]
    t = pa.table({
        "doc_id": pa.array(np.arange(400, dtype=np.int64)),
        "text": pa.array(texts + mut),
        "source": pa.array(["s"] * 400),
    })
    out = jaro_winkler_pairs(rd.from_arrow(t).repartition(4),
                             block_col="source", min_sim=0.9,
                             prefix_len=64).to_pandas()
    planted = set(zip(range(200), range(200, 400)))
    got = set(zip(out["id_a"], out["id_b"]))
    assert planted <= got           # every mutation found
    assert (out["sim"] >= 0.9).all()


def test_kll_sketch_error_bound_and_merge(ray_session):
    import ray.data as rd

    from netml_ray.sketches import KLLSketch, kll_quantiles

    rng = np.random.default_rng(14)
    data = np.concatenate([rng.normal(0, 1, 120_000),
                           rng.exponential(5, 80_000)])
    qs = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]

    # driver-side: stream in chunks, rank error < 3/k
    s = KLLSketch(200)
    for c in np.array_split(data, 37):
        s.update(c)
    for g, q in zip(s.quantiles(qs), qs):
        assert abs((data < g).mean() - q) < 3.0 / 200

    # merge of disjoint sketches stays in the envelope
    a, b = KLLSketch(200), KLLSketch(200)
    a.update(data[:70_000])
    b.update(data[70_000:])
    a.merge(b)
    for g, q in zip(a.quantiles(qs), qs):
        assert abs((data < g).mean() - q) < 3.0 / 200

    # distributed one-pass partials over a Dataset
    ds = rd.from_arrow(pa.table({"v": pa.array(data)})).repartition(16)
    got = kll_quantiles(ds, "v", qs, k=200)
    for g, q in zip(got, qs):
        assert abs((data < g).mean() - q) < 3.0 / 200

    # serialization round-trip is exact
    clone = KLLSketch.from_bytes(s.to_bytes())
    assert clone.quantiles(qs) == s.quantiles(qs)


def test_spectral_features_actor_stage(ray_session):
    """Pure sine at f -> dominant bin == f (within bin width) through
    the full actor-pool Dataset stage; rolloff/centroid near f."""
    import ray.data as rd

    from netml_ray.multimodal import SpectralFeatures, encode_wav

    rate = 16000
    freqs = [250.0, 440.0, 1000.0, 3000.0]
    rows = []
    for f in freqs:
        ts = np.arange(8000) / rate
        x = (10000 * np.sin(2 * np.pi * f * ts)).astype(np.int16)
        rows.append(encode_wav(x, rate))
    t = pa.table({
        "audio_id": pa.array(np.arange(len(rows), dtype=np.int64)),
        "audio": pa.array(rows, type=pa.binary()),
    })
    out = (rd.from_arrow(t)
           .map_batches(SpectralFeatures, batch_size=2, concurrency=2,
                        batch_format="pyarrow")
           .to_pandas().sort_values("audio_id"))
    bin_hz = rate / 8000
    for f, feats in zip(freqs, out["spectral_features"]):
        dom, cent, bw, roll = feats
        assert abs(dom - f) <= bin_hz
        assert abs(cent - f) < 25  # leakage skews slightly
        assert abs(roll - f) <= 2 * bin_hz
        assert bw < 200


def test_psi_detects_planted_drift(ray_session):
    """Second half shifted by +2σ → PSI >> 0.25; identical halves →
    PSI ≈ 0.  Terms match a pandas brute force."""
    import ray.data as rd

    from netml_ray.featstats import psi

    rng = np.random.default_rng(19)
    n = 40_000
    ts = (np.arange(n) * 1_000_000).astype(np.int64)

    def make(vals):
        return rd.from_arrow(pa.table({
            "ts": pa.array(ts).cast(pa.timestamp("us")),
            "value": pa.array(vals),
        })).repartition(8)

    stable = rng.normal(0, 1, n)
    out = psi(make(stable), "value", "ts", n_bins=10).to_pandas()
    assert out["psi_term"].sum() < 0.01

    drift = np.concatenate([rng.normal(0, 1, n // 2),
                            rng.normal(2, 1, n // 2)])
    out2 = psi(make(drift), "value", "ts", n_bins=10).to_pandas()
    total = out2["psi_term"].sum()
    assert total > 0.25

    # brute-force term parity
    ref, cur = drift[:n // 2], drift[n // 2:]
    edges = np.quantile(ref, np.arange(1, 10) / 10)
    br = np.bincount(np.searchsorted(edges, ref, side="right"),
                     minlength=10)
    bc = np.bincount(np.searchsorted(edges, cur, side="right"),
                     minlength=10)
    pr, pc_ = br / br.sum(), bc / bc.sum()
    expect = (pc_ - pr) * np.log(pc_ / pr)
    assert np.allclose(out2["psi_term"].to_numpy(), expect, atol=1e-8)
    assert np.array_equal(out2["n_ref"], br)
    assert np.array_equal(out2["n_cur"], bc)


def test_isotonic_pava_vs_brute_and_apply(ray_session):
    import ray.data as rd

    from netml_ray.models import (apply_calibration, calibrate_scores,
                                  fit_isotonic)

    rng = np.random.default_rng(23)
    s = np.round(rng.normal(size=800), 2)  # force score ties
    p = 1 / (1 + np.exp(-3 * s))
    y = (rng.uniform(size=800) < p).astype(float)

    fit = fit_isotonic(s, y)
    assert (np.diff(fit["y"]) >= -1e-12).all()  # non-decreasing

    # brute-force PAVA: pool ANY adjacent violator until monotone
    ux, inv, cnt = np.unique(s, return_inverse=True, return_counts=True)
    vals = (np.bincount(inv, weights=y) / cnt).tolist()
    w = cnt.astype(float).tolist()
    while True:
        for i in range(len(vals) - 1):
            if vals[i] > vals[i + 1] + 1e-15:
                m = ((vals[i] * w[i] + vals[i + 1] * w[i + 1])
                     / (w[i] + w[i + 1]))
                vals[i:i + 2] = [m]
                w[i:i + 2] = [w[i] + w[i + 1]]
                break
        else:
            break
    brute = np.repeat(vals, [int(x) for x in np.round(
        np.array(w) / 1)])  # expand by pooled unique-count weights
    # expand brute blocks back to unique-score granularity
    out, k = [], 0
    for v, ww in zip(vals, w):
        take = 0
        acc = 0.0
        while acc < ww - 1e-9:
            acc += cnt[k + take]
            take += 1
        out.extend([v] * take)
        k += take
    assert np.allclose(fit["y"], out)

    # perfectly separable scores → a clean 0/1 step
    s2 = np.arange(100, dtype=float)
    y2 = (s2 >= 50).astype(float)
    f2 = fit_isotonic(s2, y2)
    assert np.allclose(calibrate_scores(np.array([10.0, 90.0]), f2),
                       [0.0, 1.0])

    # distributed apply matches the driver-side map
    t = pa.table({"score": pa.array(s)})
    got = (apply_calibration(rd.from_arrow(t).repartition(5), fit)
           .to_pandas())
    assert np.allclose(np.sort(got["calibrated"]),
                       np.sort(calibrate_scores(s, fit)))


def test_sentence_stats_edges():
    from netml_ray.textops import sentence_stats_batch

    t = pa.table({"doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                  "text": pa.array(["Hi there. Bye! Ok?", "",
                                    "no punct at all", "..."])})
    out = sentence_stats_batch(t).to_pandas().set_index("doc_id")
    assert list(out["n_sentences"]) == [3, 0, 1, 0]
    assert np.isclose(out.loc[1, "mean_sentence_chars"], (8 + 3 + 2) / 3)
    assert out.loc[1, "max_sentence_chars"] == 8
    assert pd.isna(out.loc[2, "mean_sentence_chars"])
    assert pd.isna(out.loc[4, "max_sentence_chars"])  # punct-only


def test_spearman_vs_scipy_style_brute(ray_session):
    import ray.data as rd

    from netml_ray.featstats import spearman_corr

    rng = np.random.default_rng(23)
    n = 5000
    # integer values force ties; ts collisions force x-ties too
    t = pa.table({
        "user_id": pa.array(rng.integers(0, 70, n)),
        "ts": pa.array(rng.integers(0, 500, n) * 10**6).cast(
            pa.timestamp("us")),
        "value": pa.array(rng.integers(0, 40, n).astype(np.float64)),
    })
    out = spearman_corr(rd.from_arrow(t).repartition(7), "user_id",
                        "ts", "value").to_pandas() \
        .set_index("user_id").sort_index()

    df = t.to_pandas()
    df["x"] = df["ts"].astype("int64")
    rows = []
    for k, g in df.groupby("user_id"):
        rx = pd.Series(g["x"]).rank(method="average").to_numpy()
        ry = pd.Series(g["value"]).rank(method="average").to_numpy()
        if len(g) < 2 or rx.var() == 0 or ry.var() == 0:
            continue
        rho = np.corrcoef(rx, ry)[0, 1]
        rows.append((k, len(g), rho))
    exp = pd.DataFrame(rows, columns=["user_id", "n", "spearman"]) \
        .set_index("user_id").sort_index()
    assert (out["n"] == exp["n"]).all()
    assert np.allclose(out["spearman"], exp["spearman"], atol=2e-6)


def test_spearman_monotonic_extremes(ray_session):
    import ray.data as rd

    from netml_ray.featstats import spearman_corr

    n = 50
    ts = (np.arange(n, dtype=np.int64) * 10**6)
    t = pa.table({
        "user_id": pa.array([1] * n + [2] * n + [3] * n),
        "ts": pa.array(np.tile(ts, 3)).cast(pa.timestamp("us")),
        "value": pa.array(np.r_[
            np.exp(np.arange(n) / 7.0),          # monotone up (nonlinear)
            -np.arange(n, dtype=np.float64),     # monotone down
            np.ones(n)]),                        # constant -> dropped
    })
    out = spearman_corr(rd.from_arrow(t), "user_id", "ts", "value") \
        .to_pandas().set_index("user_id")
    assert np.isclose(out.loc[1, "spearman"], 1.0)
    assert np.isclose(out.loc[2, "spearman"], -1.0)
    assert 3 not in out.index


def test_rfm_vs_brute(ray_session):
    import ray.data as rd

    from netml_ray.featstats import rfm_segment

    rng = np.random.default_rng(43)
    n = 6000
    t = pa.table({
        "user_id": pa.array(rng.integers(0, 100, n)),
        "ts": pa.array(rng.integers(0, 90 * 86400 * 10**6, n)).cast(
            pa.timestamp("us")),
        "value": pa.array(rng.gamma(2, 30, n).round(3)),
    })
    out = rfm_segment(rd.from_arrow(t).repartition(7), "user_id",
                      "ts", "value").to_pandas() \
        .set_index("user_id").sort_index()

    df = t.to_pandas()
    df["us"] = df["ts"].astype("int64")
    gmax = df["us"].max()
    a = df.groupby("user_id").agg(last=("us", "max"),
                                  frequency=("us", "size"),
                                  monetary=("value", "sum"))
    a["recency_days"] = (gmax - a["last"]) / 86400e6
    a["monetary"] = a["monetary"].round(6)
    qs = [0.2, 0.4, 0.6, 0.8]
    e_r = np.quantile(a["recency_days"], qs)
    e_f = np.quantile(a["frequency"].astype(float), qs)
    e_m = np.quantile(a["monetary"], qs)
    rs = 5 - np.searchsorted(e_r, a["recency_days"], side="right")
    fs = np.searchsorted(e_f, a["frequency"], side="right") + 1
    ms = np.searchsorted(e_m, a["monetary"], side="right") + 1
    a = a.sort_index()
    assert np.allclose(out["recency_days"], a["recency_days"])
    assert (out["frequency"] == a["frequency"]).all()
    assert np.allclose(out["monetary"], a["monetary"])
    assert (out["r_score"].to_numpy() == rs).all()
    assert (out["f_score"].to_numpy() == fs).all()
    assert (out["m_score"].to_numpy() == ms).all()
    assert (out["segment"] == 100 * out["r_score"]
            + 10 * out["f_score"] + out["m_score"]).all()
    # scores span the full 1..5 range on a 100-key gamma population
    assert out["r_score"].min() == 1 and out["r_score"].max() == 5
    assert out["m_score"].min() == 1 and out["m_score"].max() == 5


def test_kaplan_meier_vs_brute(ray_session):
    import ray.data as rd

    from netml_ray.featstats import kaplan_meier

    rng = np.random.default_rng(53)
    n = 2000
    dur = rng.integers(1, 60, n).astype(np.int64)
    obs = (rng.random(n) < 0.7).astype(np.int64)
    t = pa.table({"t": pa.array(dur), "obs": pa.array(obs)})
    out = kaplan_meier(rd.from_arrow(t).repartition(5), "t", "obs") \
        .to_pandas().set_index("t")

    # brute product-limit
    surv = 1.0
    exp_rows = {}
    for tt in sorted(set(dur)):
        at_risk = int((dur >= tt).sum())
        d = int(obs[dur == tt].sum())
        surv *= 1 - d / at_risk
        if d > 0:
            exp_rows[tt] = (at_risk, d, surv)
    assert set(out.index) == set(exp_rows)
    for tt, (nr, d, s) in exp_rows.items():
        assert out.loc[tt, "n_risk"] == nr
        assert out.loc[tt, "d"] == d
        assert np.isclose(out.loc[tt, "survival"], s, atol=2e-9)
    # survival is non-increasing and within [0, 1]
    sv = out.sort_index()["survival"].to_numpy()
    assert (np.diff(sv) <= 1e-12).all()
    assert sv[0] <= 1.0 and sv[-1] >= 0.0


def test_kaplan_meier_all_die_hits_zero(ray_session):
    import ray.data as rd

    from netml_ray.featstats import kaplan_meier

    t = pa.table({"t": pa.array([1, 2, 2, 3], type=pa.int64()),
                  "obs": pa.array([1, 1, 1, 1], type=pa.int64())})
    out = kaplan_meier(rd.from_arrow(t), "t", "obs").to_pandas() \
        .set_index("t")
    assert np.isclose(out.loc[1, "survival"], 0.75)
    assert np.isclose(out.loc[2, "survival"], 0.25)
    assert out.loc[3, "survival"] == 0.0


def test_kendall_tau_vs_brute_both_paths(ray_session):
    import ray.data as rd

    from netml_ray.featstats import kendall_tau

    rng = np.random.default_rng(57)
    keys, xs, ys = [], [], []
    for k in range(40):
        m = int(rng.integers(2, 50))
        keys += [k] * m
        # heavy ties on both sides to exercise tau-b
        xs += list(rng.integers(0, 8, m).astype(float))
        ys += list(rng.integers(0, 5, m).astype(float))
    t = pa.table({"k": pa.array(keys), "x": pa.array(xs),
                  "y": pa.array(ys)})

    def brute(x, y):
        n = len(x)
        C = D = n1 = n2 = 0
        for i in range(n):
            for j in range(i + 1, n):
                sx = np.sign(x[j] - x[i])
                sy = np.sign(y[j] - y[i])
                if sx == 0:
                    n1 += 1
                if sy == 0:
                    n2 += 1
                if sx * sy > 0:
                    C += 1
                elif sx * sy < 0:
                    D += 1
        n0 = n * (n - 1) // 2
        if n0 - n1 <= 0 or n0 - n2 <= 0:
            return None
        return (C - D) / np.sqrt((n0 - n1) * (n0 - n2))

    import pandas as pd
    df = pd.DataFrame({"k": keys, "x": xs, "y": ys})
    exp = {}
    for k, g in df.groupby("k"):
        tv = brute(g.x.to_numpy(), g.y.to_numpy())
        if tv is not None:
            exp[k] = tv

    # pair-expansion path AND per-run Knight path agree with brute
    for thr in (2048, 1):
        out = kendall_tau(rd.from_arrow(t).repartition(5), "k", "x",
                          "y", knight_threshold=thr).to_pandas() \
            .set_index("k").sort_index()
        assert set(out.index) == set(exp)
        for k, tv in exp.items():
            assert np.isclose(out.loc[k, "kendall"], round(tv, 6),
                              atol=1e-6), (thr, k)


def test_kendall_tau_hot_key_knight_path(ray_session):
    """One key far above knight_threshold goes through the
    O(n log n) mergesort path and matches the quadratic kernel."""
    import ray.data as rd

    from netml_ray.featstats import kendall_tau

    rng = np.random.default_rng(58)
    n = 6000
    t = pa.table({"k": pa.array(np.zeros(n, dtype=np.int64)),
                  "x": pa.array(rng.integers(0, 500, n).astype(float)),
                  "y": pa.array(rng.integers(0, 300, n).astype(float))})
    knight = kendall_tau(rd.from_arrow(t), "k", "x", "y",
                         knight_threshold=100).to_pandas()
    quad = kendall_tau(rd.from_arrow(t), "k", "x", "y",
                       knight_threshold=10**9).to_pandas()
    assert len(knight) == len(quad) == 1
    assert knight.loc[0, "kendall"] == quad.loc[0, "kendall"]
    assert knight.loc[0, "n"] == n


def test_group_ecdf_vs_pandas(ray_session):
    import ray.data as rd

    from netml_ray.featstats import group_ecdf

    rng = np.random.default_rng(59)
    n = 4000
    t = pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "k": pa.array(rng.integers(0, 30, n)),
        "v": pa.array(rng.integers(0, 40, n).astype(float)),  # ties
    })
    out = group_ecdf(rd.from_arrow(t).repartition(6), "k", "v",
                     "id").to_pandas().set_index("id").sort_index()
    import pandas as pd
    df = pd.DataFrame({"id": np.arange(n), "k": t["k"].to_numpy(),
                       "v": t["v"].to_numpy()}).set_index("id")
    exp = df.groupby("k")["v"].transform(
        lambda s: s.rank(method="max", pct=True))
    assert len(out) == n
    assert np.allclose(out["ecdf"], exp[out.index])
    # every max value has ecdf exactly 1
    gmax = df.groupby("k")["v"].transform("max")
    assert (out.loc[df.index[df.v == gmax], "ecdf"] == 1.0).all()


def test_traffic_matrix_vs_pandas(ray_session):
    """(dow, hour) counts and shares == a pandas dt reference
    (dayofweek convention: Sunday = 0)."""
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.featstats import traffic_matrix

    rng = np.random.default_rng(5)
    us = rng.integers(1_700_000_000_000_000, 1_710_000_000_000_000,
                      20_000)
    t = pa.table({"ts": pa.array(us.astype("datetime64[us]"))})
    out = traffic_matrix(rd.from_arrow(t).repartition(6), "ts") \
        .to_pandas()
    pdf = t.to_pandas()
    dow = (pdf["ts"].dt.dayofweek + 1) % 7      # pandas Monday=0
    ref = (pdf.assign(dow=dow, hour=pdf["ts"].dt.hour)
           .groupby(["dow", "hour"]).size().rename("n").reset_index())
    merged = out.merge(ref, on=["dow", "hour"], suffixes=("", "_ref"))
    assert len(merged) == len(ref) == len(out)
    assert (merged["n"] == merged["n_ref"]).all()
    assert np.allclose(out["share"], out["n"] / out["n"].sum(),
                       atol=1e-9)


def test_weighted_median_vs_brute(ray_session):
    """Weighted lower median == the brute per-key sort + cumsum walk;
    unweighted (wt=1) case equals the lower median; tie values safe."""
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.featstats import weighted_median

    rng = np.random.default_rng(6)
    n = 5000
    t = pa.table({
        "k": pa.array(rng.integers(0, 40, n)),
        "v": pa.array(rng.choice([1.0, 2.5, 2.5, 3.0, 7.5, 9.0], n)),
        "w": pa.array(rng.integers(1, 9, n).astype(np.float64)),
    })
    pdf = t.to_pandas()
    exp = {}
    for k, sub in pdf.groupby("k"):
        sub = sub.sort_values("v")
        cum = sub["w"].cumsum().to_numpy()
        tot = cum[-1]
        v = sub["v"].to_numpy()
        exp[k] = (float(v[np.argmax(cum >= tot / 2)]), float(tot))
    for parts in (1, 6):
        got = (weighted_median(rd.from_arrow(t).repartition(parts),
                               "k", "v", "w")
               .to_pandas().set_index("k"))
        assert len(got) == len(exp)
        for k, (wm, tot) in exp.items():
            assert got.loc[k, "w_median"] == wm
            assert got.loc[k, "total_wt"] == tot
    # wt == 1 reduces to the classic lower median
    ones = t.set_column(2, "w", pa.array(np.ones(n)))
    got = (weighted_median(rd.from_arrow(ones), "k", "v", "w")
           .to_pandas().set_index("k"))
    for k, sub in pdf.groupby("k"):
        v = np.sort(sub["v"].to_numpy())
        lower_med = v[int(np.ceil(len(v) / 2)) - 1]
        assert got.loc[k, "w_median"] == lower_med


def test_mann_kendall_vs_brute_both_paths(ray_session):
    import ray.data as rd

    from netml_ray.featstats import mann_kendall

    rng = np.random.default_rng(59)
    keys, ts, vs = [], [], []
    for k in range(30):
        m = int(rng.integers(5, 40))
        keys += [k] * m
        ts += list(np.sort(rng.choice(10_000, m, replace=False)))
        # integer-ish values for heavy ties
        vs += list(rng.integers(0, 6, m).astype(float))
    t = pa.table({"k": pa.array(keys),
                  "ts": pa.array(np.array(ts, dtype=np.int64)),
                  "v": pa.array(vs),
                  "id": pa.array(np.arange(len(keys)))})

    def brute(v):
        n = len(v)
        s = sum(np.sign(v[j] - v[i])
                for i in range(n) for j in range(i + 1, n))
        _, c = np.unique(v, return_counts=True)
        var = (n * (n - 1) * (2 * n + 5)
               - (c * (c - 1) * (2 * c + 5)).sum()) / 18.0
        if n < 5 or var <= 0:
            return None
        z = (s - 1) / np.sqrt(var) if s > 0 else (
            (s + 1) / np.sqrt(var) if s < 0 else 0.0)
        return int(s), var, z

    import pandas as pd
    df = pd.DataFrame({"k": keys, "ts": ts, "v": vs}).sort_values(
        ["k", "ts"])
    exp = {k: brute(g.v.to_numpy()) for k, g in df.groupby("k")}
    exp = {k: e for k, e in exp.items() if e is not None}

    for thr in (2048, 1):
        out = mann_kendall(rd.from_arrow(t).repartition(4), "k", "ts",
                           "v", tiebreak="id",
                           knight_threshold=thr).to_pandas() \
            .set_index("k").sort_index()
        assert set(out.index) == set(exp), thr
        for k, (s, var, z) in exp.items():
            assert out.loc[k, "s"] == s, (thr, k)
            assert np.isclose(out.loc[k, "var_s"], var), (thr, k)
            assert np.isclose(out.loc[k, "z"], round(z, 6),
                              atol=1e-6), (thr, k)


def test_theil_sen_vs_brute(ray_session):
    import ray.data as rd

    from netml_ray.featstats import theil_sen

    rng = np.random.default_rng(60)
    keys, ts, vs = [], [], []
    for k in range(25):
        m = int(rng.integers(3, 40))
        keys += [k] * m
        # repeated timestamps sometimes (dt=0 pairs must drop)
        ts += list(np.sort(rng.integers(0, 500, m)) * 1_000_000)
        vs += list((rng.uniform(-1, 1, m) + 0.01 * k
                    * np.arange(m)).round(6))
    t = pa.table({"k": pa.array(keys),
                  "ts": pa.array(np.array(ts, dtype=np.int64)),
                  "v": pa.array(vs)})

    import pandas as pd
    df = pd.DataFrame({"k": keys, "ts": ts, "v": vs})
    exp = {}
    for k, g in df.groupby("k"):
        x, v = g.ts.to_numpy(), g.v.to_numpy()
        sl = [(v[j] - v[i]) / ((x[j] - x[i]) / 1e6)
              for i in range(len(x)) for j in range(i + 1, len(x))
              if x[j] > x[i]]
        if len(sl) >= 3:
            exp[k] = (len(sl), np.sort(np.array(sl))[(len(sl) - 1) // 2])

    out = theil_sen(rd.from_arrow(t).repartition(5), "k", "ts",
                    "v").to_pandas().set_index("k").sort_index()
    assert set(out.index) == set(exp)
    for k, (m, med) in exp.items():
        assert out.loc[k, "n_pairs"] == m, k
        assert out.loc[k, "ts_slope"] == round(med, 9), k


def test_circular_daytime_vs_brute(ray_session):
    import ray.data as rd

    from netml_ray.featstats import circular_daytime

    rng = np.random.default_rng(61)
    n = 4000
    DAY = 86_400_000_000
    us = rng.integers(0, 30 * DAY, n)
    k = rng.integers(0, 40, n)
    # one strongly-clock-locked key: all events at ~09:00
    lock = k == 3
    us[lock] = (us[lock] // DAY) * DAY + 9 * 3_600_000_000 \
        + rng.integers(0, 60_000_000, int(lock.sum()))
    t = pa.table({"k": pa.array(k),
                  "ts": pa.array(us.astype(np.int64)).cast(
                      pa.timestamp("us"))})

    out = circular_daytime(rd.from_arrow(t).repartition(5), "k",
                           "ts").to_pandas().set_index("k").sort_index()
    import pandas as pd
    df = pd.DataFrame({"k": k, "us": us})
    for kk, g in df.groupby("k"):
        theta = 2 * np.pi * ((g.us.to_numpy() % DAY) / 86400000000.0)
        cb, sb = np.cos(theta).mean(), np.sin(theta).mean()
        assert np.isclose(out.loc[kk, "c_bar"], cb, atol=1e-6)
        assert np.isclose(out.loc[kk, "s_bar"], sb, atol=1e-6)
        assert np.isclose(out.loc[kk, "r"], np.hypot(cb, sb), atol=1e-6)
    # the clock-locked key concentrates, the others don't
    assert out.loc[3, "r"] > 0.99
    assert out.drop(3)["r"].max() < 0.9


def test_changepoint_vs_brute(ray_session):
    import ray.data as rd

    from netml_ray.featstats import changepoint

    rng = np.random.default_rng(62)
    keys, ts, vs = [], [], []
    for kk in range(30):
        m = int(rng.integers(4, 50))
        keys += [kk] * m
        ts += list(np.sort(rng.choice(10**6, m, replace=False)))
        v = rng.normal(0, 1, m)
        v[m // 2:] += rng.choice([0.0, 3.0])   # half the keys shift
        vs += list(np.round(v, 2))
    t = pa.table({"k": pa.array(keys),
                  "ts": pa.array(np.array(ts, np.int64)).cast(
                      pa.timestamp("us")),
                  "id": pa.array(np.arange(len(keys))),
                  "v": pa.array(vs)})

    out = changepoint(rd.from_arrow(t).repartition(5), "k", "ts", "v",
                      tiebreak_col="id", scale=100, min_n=4) \
        .to_pandas().set_index("k").sort_index()
    import pandas as pd
    df = pd.DataFrame({"k": keys, "ts": ts, "v": vs}).sort_values(
        ["k", "ts"])
    for kk, g in df.groupby("k"):
        vi = np.round(g.v.to_numpy() * 100).astype(np.int64)
        n = len(vi)
        S = np.cumsum(vi)
        dev = np.abs(n * S - np.arange(1, n + 1) * S[-1])
        sd = np.sqrt((vi.astype(float) ** 2).mean() - vi.mean() ** 2)
        if n < 4 or sd <= 0:
            assert kk not in out.index
            continue
        ks = int(np.argmax(dev)) + 1          # first argmax, 1-based
        assert out.loc[kk, "k_star"] == ks, kk
        assert out.loc[kk, "n"] == n
        mag = dev.max() / (n * sd * np.sqrt(n))
        assert np.isclose(out.loc[kk, "magnitude"], mag, atol=1e-5), kk


def test_runs_test_vs_brute(ray_session):
    import ray.data as rd

    from netml_ray.featstats import runs_test

    rng = np.random.default_rng(63)
    keys, ts, vs = [], [], []
    for kk in range(30):
        m = int(rng.integers(5, 60))
        keys += [kk] * m
        ts += list(np.sort(rng.choice(10**6, m, replace=False)))
        if kk == 0:      # strictly alternating -> too many runs
            vs += [float(i % 2) for i in range(m)]
        elif kk == 1:    # trending -> too few runs
            vs += list(np.arange(m, dtype=float))
        else:
            vs += list(rng.integers(0, 7, m).astype(float))
    t = pa.table({"k": pa.array(keys),
                  "ts": pa.array(np.array(ts, np.int64)),
                  "id": pa.array(np.arange(len(keys))),
                  "v": pa.array(vs)})

    out = runs_test(rd.from_arrow(t).repartition(5), "k", "ts", "v",
                    tiebreak_col="id").to_pandas() \
        .set_index("k").sort_index()
    import pandas as pd
    df = pd.DataFrame({"k": keys, "ts": ts, "v": vs}).sort_values(
        ["k", "ts"])
    for kk, g in df.groupby("k"):
        v = g.v.to_numpy()
        n = len(v)
        med = np.sort(v)[(n - 1) // 2]
        ab = v > med
        n1 = int(ab.sum()); n2 = n - n1
        if n1 < 2 or n2 < 2:
            assert kk not in out.index
            continue
        R = 1 + int((ab[1:] != ab[:-1]).sum())
        two = 2.0 * n1 * n2
        e = 1.0 + two / n
        var = two * (two - n) / (n * n * (n - 1.0))
        z = (R - e) / np.sqrt(var)
        assert out.loc[kk, "n_runs"] == R, kk
        assert out.loc[kk, "n_above"] == n1, kk
        assert np.isclose(out.loc[kk, "z"], z, atol=1e-5), kk
    if 0 in out.index and 1 in out.index:
        assert out.loc[0, "z"] > 3      # alternating: too many runs
        assert out.loc[1, "z"] < -3     # trending: too few runs


def test_hhi_concentration_vs_brute(ray_session):
    """Per-group HHI == a pandas share² brute, incl. the single-member
    (HHI = 1) and uniform (HHI = 1/k) extremes."""
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.featstats import hhi_concentration

    rng = np.random.default_rng(11)
    g = rng.choice(["a", "b", "c", "mono"], 5_000,
                   p=[0.4, 0.3, 0.29, 0.01])
    m = rng.integers(0, 40, 5_000)
    m[g == "mono"] = 7                       # one member owns the group
    t = pa.table({"g": pa.array(g), "m": pa.array(m)})
    out = hhi_concentration(rd.from_arrow(t).repartition(5), "g", "m") \
        .to_pandas().set_index("g")
    df = t.to_pandas()
    for grp, sub in df.groupby("g"):
        cnt = sub.groupby("m").size()
        share = cnt / cnt.sum()
        assert out.loc[grp, "n_events"] == len(sub)
        assert out.loc[grp, "n_members"] == len(cnt)
        assert abs(out.loc[grp, "hhi"] - (share ** 2).sum()) < 1e-8
    assert out.loc["mono", "hhi"] == 1.0


def test_period_growth_vs_pandas(ray_session):
    """Weekly counts + lag-over-existing-rows growth == pandas
    pct_change within category; first row per category is NULL."""
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.featstats import period_growth

    rng = np.random.default_rng(12)
    n = 8_000
    us = rng.integers(1_700_000_000_000_000, 1_706_000_000_000_000, n)
    cat = rng.choice(["x", "y"], n)
    t = pa.table({"c": pa.array(cat),
                  "ts": pa.array(us.astype("datetime64[us]"))})
    out = period_growth(rd.from_arrow(t).repartition(4), "c", "ts") \
        .to_pandas()
    df = t.to_pandas()
    df["period"] = df["ts"].astype("int64") // (604_800 * 10**6)
    ref = (df.groupby(["c", "period"]).size().rename("n")
           .reset_index().sort_values(["c", "period"]))
    ref["growth"] = ref.groupby("c")["n"].pct_change()
    merged = out.merge(ref, on=["c", "period"], suffixes=("", "_ref"))
    assert len(merged) == len(ref) == len(out)
    assert (merged["n"] == merged["n_ref"]).all()
    both = merged.dropna(subset=["growth_ref"])
    assert np.allclose(both["growth"], both["growth_ref"], atol=1e-8)
    firsts = merged[merged["growth_ref"].isna()]
    assert firsts["growth"].isna().all()
    assert len(firsts) == 2                   # one per category


def test_cond_entropy_vs_brute(ray_session):
    """H(Y|X), H(Y) and IG == a scipy-free numpy brute; a perfectly
    predictive X gives IG == H(Y), an independent X gives IG ≈ 0."""
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.featstats import cond_entropy

    rng = np.random.default_rng(13)
    n = 6_000
    x = rng.integers(0, 5, n)
    y_dep = np.where(x < 2, "p", "q")        # fully determined by x
    t = pa.table({"x": pa.array(x), "y": pa.array(y_dep)})
    out = cond_entropy(rd.from_arrow(t).repartition(4), "x", "y") \
        .to_pandas()
    assert np.allclose(out["h_cond"], 0.0)
    p = np.bincount((x < 2).astype(int)) / n
    h_y = float(-(p * np.log(p)).sum())
    assert abs(out["info_gain"].iloc[0] - h_y) < 1e-8
    assert abs(out["h_marginal"].iloc[0] - h_y) < 1e-8

    y_ind = rng.choice(["p", "q"], n)        # independent of x
    t2 = pa.table({"x": pa.array(x), "y": pa.array(y_ind)})
    out2 = cond_entropy(rd.from_arrow(t2).repartition(4), "x", "y") \
        .to_pandas()
    df = pa.table({"x": x, "y": y_ind}).to_pandas()
    for _, row in out2.iterrows():
        sub = df[df["x"] == row["x"]]["y"].value_counts(normalize=True)
        h = float(-(sub * np.log(sub)).sum())
        assert abs(row["h_cond"] - h) < 1e-8
    assert abs(out2["info_gain"].iloc[0]) < 0.01


def test_leadlag_corr_recovers_planted_lag(ray_session):
    """A stream B that is stream A shifted by 2 days peaks the
    cross-correlation at lag 2; values match a numpy brute."""
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.featstats import leadlag_corr

    rng = np.random.default_rng(72)
    days = 60
    day_us = 86_400 * 10**6
    base = rng.integers(5, 80, days)
    rows_ts, rows_f = [], []
    for d in range(days):
        rows_ts += [d * day_us + 1] * int(base[d])
        rows_f += ["A"] * int(base[d])
        if d >= 2:                       # B echoes A two days later
            rows_ts += [d * day_us + 2] * int(base[d - 2])
            rows_f += ["B"] * int(base[d - 2])
    t = pa.table({"ts": pa.array(np.array(rows_ts, dtype=np.int64)
                                 .astype("datetime64[us]")),
                  "f": pa.array(rows_f)})
    out = leadlag_corr(
        rd.from_arrow(t).repartition(6), "ts",
        lambda b: np.asarray(b["f"].to_numpy(zero_copy_only=False)
                             == "A"),
        lambda b: np.asarray(b["f"].to_numpy(zero_copy_only=False)
                             == "B"),
        max_lag=3).to_pandas().set_index("lag")
    assert out["corr"].idxmax() == 2
    # brute at lag 2
    xa = base[:days - 2].astype(float)
    xb = base[:days - 2].astype(float)   # B[d+2] == A[d]
    ref = np.corrcoef(xa, xb)[0, 1]
    assert abs(out.loc[2, "corr"] - ref) < 1e-9
    assert (out["n_days"] == [60, 59, 58, 57]).all()


def test_cramers_v_vs_brute(ray_session):
    """V == sqrt(chi2/(n*mindof)) with chi2 matching
    chi2_independence; perfectly-associated table gives V == 1."""
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.featstats import chi2_independence, cramers_v

    rng = np.random.default_rng(91)
    n = 6_000
    x = rng.choice(["a", "b", "c"], n)
    y = np.where(rng.random(n) < 0.3, x, rng.choice(["p", "q"], n))
    t = pa.table({"x": pa.array(x), "y": pa.array(y)})
    out = cramers_v(rd.from_arrow(t).repartition(4), "x", "y") \
        .to_pandas().iloc[0]
    ref = chi2_independence(rd.from_arrow(t), "x", "y") \
        .to_pandas().iloc[0]
    assert abs(out["chi2"] - ref["chi2"]) < 1e-6
    assert out["dof"] == ref["dof"]
    exp_v = np.sqrt(out["chi2"] / (n * min(3 - 1, 5 - 1)))
    assert abs(out["cramers_v"] - exp_v) < 1e-8

    perfect = cramers_v(rd.from_arrow(pa.table(
        {"x": pa.array(x), "y": pa.array(x)})), "x", "y") \
        .to_pandas().iloc[0]
    assert abs(perfect["cramers_v"] - 1.0) < 1e-9


def test_ks_test_vs_scipy_free_brute(ray_session):
    """D matches a brute two-ECDF max; identical samples give D==0 and
    a clearly shifted sample a large D."""
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.featstats import ks_test

    rng = np.random.default_rng(121)
    n = 5_000
    g = rng.choice(["a", "b"], n)
    v = rng.normal(size=n)
    v[g == "b"] += 0.5
    t = pa.table({"v": pa.array(v), "g": pa.array(g)})
    out = ks_test(rd.from_arrow(t).repartition(4), "v", "g",
                  "a", "b").to_pandas().iloc[0]
    a = np.sort(v[g == "a"]); b = np.sort(v[g == "b"])
    pts = np.unique(v)
    d = np.max(np.abs(
        np.searchsorted(a, pts, side="right") / len(a)
        - np.searchsorted(b, pts, side="right") / len(b)))
    assert abs(out["d_stat"] - d) < 1e-12
    assert out["d_stat"] > 0.15
    assert out["n_a"] == (g == "a").sum()

    same = ks_test(rd.from_arrow(pa.table(
        {"v": pa.array(np.r_[v[:100], v[:100]]),
         "g": pa.array(["a"] * 100 + ["b"] * 100)})), "v", "g",
        "a", "b").to_pandas().iloc[0]
    assert same["d_stat"] == 0.0 and same["p_approx"] == 1.0


def test_anova_f_vs_brute(ray_session):
    """F == the classic SSB/SSW decomposition; equal-mean groups give
    small F, a shifted group a large one."""
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.featstats import anova_f

    rng = np.random.default_rng(131)
    n = 6_000
    g = rng.choice(["a", "b", "c"], n)
    v = rng.normal(size=n)
    v[g == "c"] += 1.0
    t = pa.table({"g": pa.array(g), "v": pa.array(v)})
    out = anova_f(rd.from_arrow(t).repartition(4), "g", "v") \
        .to_pandas().iloc[0]
    gm = v.mean()
    ssb = sum(len(v[g == x]) * (v[g == x].mean() - gm) ** 2
              for x in "abc")
    ssw = sum(((v[g == x] - v[g == x].mean()) ** 2).sum()
              for x in "abc")
    f = (ssb / 2) / (ssw / (n - 3))
    assert abs(out["eta_sq"] - ssb / (ssb + ssw)) < 1e-8
    assert abs(out["f_stat"] - f) < 1e-2
    assert out["f_stat"] > 100            # planted shift detected


def test_mannwhitney_vs_brute(ray_session):
    """U_a matches a brute pairwise count (with half-credit ties),
    symmetric data gives z near 0, a planted shift a large |z|."""
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.featstats import mannwhitney_u

    rng = np.random.default_rng(77)
    n = 1_200
    g = rng.choice(["a", "b"], n)
    # integer values force real ties → exercises the midrank rule
    v = rng.integers(0, 40, n).astype(np.float64)
    t = pa.table({"v": pa.array(v), "g": pa.array(g)})
    out = mannwhitney_u(rd.from_arrow(t).repartition(4), "v", "g",
                        "a", "b").to_pandas().iloc[0]
    a, b = v[g == "a"], v[g == "b"]
    # brute: U_a = #(a > b) + 0.5 * #(a == b) over all pairs
    u_brute = float(np.sum(a[:, None] > b[None, :])
                    + 0.5 * np.sum(a[:, None] == b[None, :]))
    assert out["u_a"] == u_brute
    assert out["n_a"] == len(a) and out["n_b"] == len(b)
    assert abs(out["z"]) < 3.5          # no real shift

    v2 = v.copy()
    v2[g == "a"] += 8.0                 # planted shift → huge z
    shifted = mannwhitney_u(rd.from_arrow(pa.table(
        {"v": pa.array(v2), "g": pa.array(g)})), "v", "g",
        "a", "b").to_pandas().iloc[0]
    assert shifted["z"] > 10.0


def test_dominant_period_planted(ray_session):
    """a planted 7-day cycle is detected (k = D/7); a flat series
    never reports spurious dominant power above the planted one."""
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.featstats import dominant_period

    rng = np.random.default_rng(4)
    D = 28
    rows_k, rows_t = [], []
    day0_us = 19723 * 86_400_000_000
    for d in range(D):
        # weekly cycle: big spike every 7th day
        n = 200 if d % 7 == 0 else 20
        for _ in range(n):
            rows_k.append("weekly")
            rows_t.append(day0_us + d * 86_400_000_000
                          + int(rng.integers(0, 86_400_000_000)))
        for _ in range(30):
            rows_k.append("flat")
            rows_t.append(day0_us + d * 86_400_000_000
                          + int(rng.integers(0, 86_400_000_000)))
    t = pa.table({"k": pa.array(rows_k),
                  "ts": pa.array(np.array(rows_t, dtype=np.int64)
                                 .astype("datetime64[us]"))})
    out = dominant_period(rd.from_arrow(t).repartition(4), "k",
                          "ts").to_pandas().set_index("k")
    assert out.loc["weekly", "dominant_k"] == 4          # 28/7
    assert abs(out.loc["weekly", "period_days"] - 7.0) < 1e-9
    assert out.loc["weekly", "power"] > out.loc["flat", "power"]
