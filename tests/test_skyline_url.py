"""Skyline (pareto_front), URL features, readability, CUSUM — each vs
a driver-side brute force."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


# ---------------------------------------------------------------------------
# pareto_front
# ---------------------------------------------------------------------------

def _brute_front(df, cols, sense):
    """O(n^2) skyline over distinct objective vectors."""
    m = df[cols].drop_duplicates().to_numpy(dtype=float)
    for c, s in zip(range(len(cols)), sense):
        if s == "min":
            m[:, c] = -m[:, c]
    keep = []
    for i in range(len(m)):
        dominated = False
        for j in range(len(m)):
            if i == j:
                continue
            if (m[j] >= m[i]).all() and (m[j] > m[i]).any():
                dominated = True
                break
        if not dominated:
            keep.append(i)
    out = m[keep]
    for c, s in zip(range(len(cols)), sense):
        if s == "min":
            out[:, c] = -out[:, c]
    return {tuple(r) for r in out}


def test_pareto_front_2d_vs_brute(ray_session):
    import ray.data as rd

    from netml_ray.skyline import pareto_front

    rng = np.random.default_rng(7)
    t = pa.table({
        "a": pa.array(rng.integers(0, 60, 4000).astype(np.float64)),
        "b": pa.array(rng.integers(0, 60, 4000).astype(np.float64)),
    })
    out = pareto_front(rd.from_arrow(t).repartition(7), ["a", "b"],
                       ["max", "min"]).to_pandas()
    exp = _brute_front(t.to_pandas(), ["a", "b"], ["max", "min"])
    got = {(r.a, r.b) for r in out.itertuples()}
    assert got == exp
    # multiplicity: counts sum to the number of input rows matching
    df = t.to_pandas()
    for r in out.itertuples():
        n = ((df["a"] == r.a) & (df["b"] == r.b)).sum()
        assert r.n_rows == n
    # best-first ordering on the first objective
    assert (np.diff(out["a"].to_numpy()) <= 0).all()


def test_pareto_front_3d_vs_brute(ray_session):
    import ray.data as rd

    from netml_ray.skyline import pareto_front

    rng = np.random.default_rng(13)
    t = pa.table({
        "x": pa.array(rng.integers(0, 12, 2500).astype(np.float64)),
        "y": pa.array(rng.integers(0, 12, 2500).astype(np.float64)),
        "z": pa.array(rng.integers(0, 12, 2500).astype(np.float64)),
    })
    out = pareto_front(rd.from_arrow(t).repartition(5), ["x", "y", "z"],
                       ["max", "max", "max"]).to_pandas()
    exp = _brute_front(t.to_pandas(), ["x", "y", "z"],
                       ["max", "max", "max"])
    got = {(r.x, r.y, r.z) for r in out.itertuples()}
    assert got == exp


def test_pareto_front_max_front_guard(ray_session):
    import ray.data as rd

    from netml_ray.skyline import pareto_front

    # perfectly anti-correlated: every distinct vector is on the front
    n = 500
    t = pa.table({"a": pa.array(np.arange(n, dtype=np.float64)),
                  "b": pa.array(np.arange(n, dtype=np.float64)[::-1])})
    # raised inside the Ray map task -> surfaces wrapped in RayTaskError
    with pytest.raises(Exception, match="max_front"):
        pareto_front(rd.from_arrow(t), ["a", "b"], ["max", "max"],
                     max_front=50)


# ---------------------------------------------------------------------------
# URL features
# ---------------------------------------------------------------------------

def test_url_feature_table_cases():
    from netml_ray.urlops import url_feature_table

    urls = pa.array([
        "https://www.example.com/a/b/c?x=1&y=2",
        "http://cdn.news.org/",
        "https://host",                 # no dot -> null tld
        "not a url",                    # unparsable
        "https://sub.site.io/p?q=",     # one '=' in query
        "http://example.net/a//b/",     # empty segment not counted
    ])
    f = url_feature_table(urls).to_pandas()
    assert f.loc[0, "scheme"] == "https"
    assert f.loc[0, "host"] == "www.example.com"
    assert f.loc[0, "domain"] == "example.com"
    assert f.loc[0, "tld"] == "com"
    assert f.loc[0, "path_depth"] == 3
    assert f.loc[0, "n_params"] == 2
    assert bool(f.loc[0, "is_https"])
    assert f.loc[0, "url_len"] == len(urls[0].as_py())

    assert f.loc[1, "domain"] == "cdn.news.org"
    assert f.loc[1, "tld"] == "org"
    assert f.loc[1, "path_depth"] == 0
    assert not bool(f.loc[1, "is_https"])

    assert pd.isna(f.loc[2, "tld"])
    assert pd.isna(f.loc[3, "scheme"]) and pd.isna(f.loc[3, "host"])
    assert f.loc[3, "path_depth"] == 0 and f.loc[3, "n_params"] == 0
    assert f.loc[4, "n_params"] == 1
    assert f.loc[5, "path_depth"] == 2


def test_url_feature_profile_vs_pandas(ray_session):
    import ray.data as rd

    from netml_ray.urlops import url_feature_profile, url_feature_table

    rng = np.random.default_rng(3)
    doms = [f"site{i}" for i in range(15)]
    urls = [
        f"{'https' if rng.random() < 0.7 else 'http'}://"
        f"{'www.' if rng.random() < 0.5 else ''}{rng.choice(doms)}."
        f"{rng.choice(['com', 'org', 'io'])}"
        f"{'/p' * int(rng.integers(0, 4))}"
        f"{['', '?a=1', '?a=1&b=2'][int(rng.integers(0, 3))]}"
        for _ in range(3000)
    ]
    t = pa.table({"url": pa.array(urls)})
    out = url_feature_profile(
        rd.from_arrow(t).repartition(6), "url").to_pandas()

    f = url_feature_table(t["url"]).to_pandas()
    f["is_https"] = f["is_https"].astype("int64")
    exp = (f.groupby(["tld", "path_depth", "n_params", "is_https"])
           .agg(n=("url_len", "size"), n_domains=("domain", "nunique"),
                avg_len=("url_len", "mean")).reset_index())
    m = out.merge(exp, on=["tld", "path_depth", "n_params", "is_https"],
                  suffixes=("", "_e"))
    assert len(m) == len(exp) == len(out)
    assert (m["n"] == m["n_e"]).all()
    assert (m["n_domains"] == m["n_domains_e"]).all()
    assert np.allclose(m["avg_len"], m["avg_len_e"])


# ---------------------------------------------------------------------------
# readability_profile
# ---------------------------------------------------------------------------

def test_readability_vs_brute(ray_session):
    import re

    import ray.data as rd

    from netml_ray.textstats import readability_profile

    rng = np.random.default_rng(5)
    words = ["the", "quick", "brown", "fox", "jumps", "encyclopedia",
             "a", "antidisestablishment", "ray", "data"]
    docs, grp = [], []
    for i in range(800):
        n = int(rng.integers(0, 40))
        toks = list(rng.choice(words, n)) if n else []
        # sprinkle sentence enders
        txt = " ".join(
            w + ("." if rng.random() < 0.2 else "") for w in toks)
        docs.append(txt)
        grp.append(f"g{i % 4}")
    t = pa.table({"text": pa.array(docs), "source": pa.array(grp)})
    out = readability_profile(
        rd.from_arrow(t).repartition(5), "text", "source").to_pandas()

    rows = []
    for txt, g in zip(docs, grp):
        w = len(re.findall(r"\S+", txt))
        if w == 0:
            continue
        s = max(len(re.findall(r"[.!?]+", txt)), 1)
        y = len(re.findall(r"[aeiouy]+", txt.lower()))
        rows.append((g, 206.835 - 1.015 * w / s - 84.6 * y / w,
                     w / s, y / w))
    exp = (pd.DataFrame(rows, columns=["source", "fl", "wps", "spw"])
           .groupby("source").agg(n_docs=("fl", "size"),
                                  avg_flesch=("fl", "mean"),
                                  avg_wps=("wps", "mean"),
                                  avg_spw=("spw", "mean")))
    out = out.set_index("source").sort_index()
    assert (out["n_docs"] == exp["n_docs"]).all()
    assert np.allclose(out["avg_flesch"], exp["avg_flesch"], atol=2e-6)
    assert np.allclose(out["avg_wps"], exp["avg_wps"], atol=2e-6)
    assert np.allclose(out["avg_spw"], exp["avg_spw"], atol=2e-6)


# ---------------------------------------------------------------------------
# cusum_stat
# ---------------------------------------------------------------------------

def test_cusum_vs_brute(ray_session):
    import ray.data as rd

    from netml_ray.featstats import cusum_stat

    rng = np.random.default_rng(9)
    n = 5000
    t = pa.table({
        "user_id": pa.array(rng.integers(0, 80, n)),
        "ts": pa.array(np.sort(rng.integers(0, 10**9, n))).cast(
            pa.timestamp("us")),
        "event_id": pa.array(np.arange(n)),
        "value": pa.array(rng.normal(0, 1, n).round(3)),
    })
    out = cusum_stat(rd.from_arrow(t).repartition(8), "user_id", "ts",
                     "value", tiebreak_col="event_id").to_pandas()

    df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
    rows = []
    for k, g in df.groupby("user_id"):
        v = g["value"].to_numpy()
        if len(v) < 2:
            continue
        sd = v.std()
        if sd <= 0:
            continue
        s = np.cumsum(v) - np.arange(1, len(v) + 1) * v.mean()
        rows.append((k, len(v), np.abs(s).max() / (sd * np.sqrt(len(v)))))
    exp = pd.DataFrame(rows, columns=["user_id", "n", "cusum"]) \
        .set_index("user_id").sort_index()
    out = out.set_index("user_id").sort_index()
    assert (out["n"] == exp["n"]).all()
    assert np.allclose(out["cusum"], exp["cusum"], atol=2e-6)


def test_cusum_detects_shift(ray_session):
    """A key with a mean shift scores far above a stationary key."""
    import ray.data as rd

    from netml_ray.featstats import cusum_stat

    rng = np.random.default_rng(2)
    n = 400
    flat = rng.normal(0, 1, n)
    shifted = np.concatenate([rng.normal(0, 1, n // 2),
                              rng.normal(4, 1, n // 2)])
    t = pa.table({
        "user_id": pa.array([1] * n + [2] * n),
        "ts": pa.array(np.tile(np.arange(n, dtype=np.int64), 2)).cast(
            pa.timestamp("us")),
        "event_id": pa.array(np.arange(2 * n)),
        "value": pa.array(np.concatenate([flat, shifted])),
    })
    out = cusum_stat(rd.from_arrow(t), "user_id", "ts", "value",
                     tiebreak_col="event_id").to_pandas() \
        .set_index("user_id")
    assert out.loc[2, "cusum"] > 3 * out.loc[1, "cusum"]
    assert out.loc[2, "cusum"] > 1.3


# ---------------------------------------------------------------------------
# trend_slope
# ---------------------------------------------------------------------------

def test_trend_slope_vs_brute(ray_session):
    import ray.data as rd

    from netml_ray.featstats import trend_slope

    rng = np.random.default_rng(17)
    n = 4000
    t = pa.table({
        "user_id": pa.array(rng.integers(0, 60, n)),
        "ts": pa.array(np.sort(rng.integers(0, 90 * 86400 * 10**6, n))
                       ).cast(pa.timestamp("us")),
        "value": pa.array(rng.normal(50, 20, n).round(3)),
    })
    out = trend_slope(rd.from_arrow(t).repartition(7), "user_id", "ts",
                      "value").to_pandas().set_index("user_id") \
        .sort_index()

    df = t.to_pandas()
    df["x"] = df["ts"].astype("int64") / 1e6
    rows = []
    for k, g in df.groupby("user_id"):
        if len(g) < 2 or g["x"].var(ddof=0) == 0:
            continue
        slope, icept = np.polyfit(g["x"], g["value"], 1)
        rows.append((k, len(g), slope * 86400, icept))
    exp = pd.DataFrame(rows, columns=["user_id", "n", "slope_per_day",
                                      "intercept"]) \
        .set_index("user_id").sort_index()
    assert (out["n"] == exp["n"]).all()
    assert np.allclose(out["slope_per_day"], exp["slope_per_day"],
                       rtol=1e-6, atol=1e-9)
    assert np.allclose(out["intercept"], exp["intercept"],
                       rtol=1e-6, atol=1e-5)


def test_trend_slope_planted(ray_session):
    """A key with a planted positive drift recovers the exact slope;
    a constant-time key is dropped."""
    import ray.data as rd

    from netml_ray.featstats import trend_slope

    day_us = 86400 * 10**6
    xs = np.arange(100, dtype=np.int64) * day_us
    t = pa.table({
        "user_id": pa.array([1] * 100 + [2] * 3),
        "ts": pa.array(np.r_[xs, [5, 5, 5]]).cast(pa.timestamp("us")),
        "value": pa.array(np.r_[3.0 + 2.0 * np.arange(100), [1., 2., 3.]]),
    })
    out = trend_slope(rd.from_arrow(t), "user_id", "ts", "value") \
        .to_pandas().set_index("user_id")
    assert np.isclose(out.loc[1, "slope_per_day"], 2.0)
    assert np.isclose(out.loc[1, "intercept"], 3.0)
    assert 2 not in out.index


def test_canonicalize_urls_cases(ray_session):
    """Fragment stripped, trailing utm_*/fbclid params stripped
    (single and stacked), mid-URL params and clean URLs untouched."""
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.urlops import canonicalize_urls

    cases = [
        ("https://a.com/x?a=1", "https://a.com/x?a=1"),
        ("https://a.com/x?a=1#frag", "https://a.com/x?a=1"),
        ("https://a.com/x?utm_campaign=z", "https://a.com/x"),
        ("https://a.com/x?a=1&utm_source=n", "https://a.com/x?a=1"),
        ("https://a.com/x?a=1&utm_source=n&fbclid=22#s",
         "https://a.com/x?a=1"),
        ("https://a.com/x?utm_a=1&b=2", "https://a.com/x?utm_a=1&b=2"),
        ("https://a.com/plain", "https://a.com/plain"),
    ]
    t = pa.table({"url": pa.array([c[0] for c in cases])})
    out = canonicalize_urls(rd.from_arrow(t), "url").to_pandas()
    assert out["canon_url"].tolist() == [c[1] for c in cases]
