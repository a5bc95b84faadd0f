"""Distributed quantile path, CSV sink, events-pipeline leakage."""

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from netml_ray.sessionize import exact_quantiles, exact_quantiles_multi


def test_exact_quantiles_distributed_path_matches_collect(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(12)
    vals = rng.uniform(0, 1000, 5000)
    ds = rd.from_arrow(pa.table({"v": pa.array(vals)}))
    qs = [0.25, 0.5, 0.9, 0.3]
    got_collect = exact_quantiles(ds, "v", qs)
    # force the distributed sort + order-statistic path
    got_dist = exact_quantiles(ds, "v", qs, collect_threshold=100)
    exp = [float(np.quantile(vals, q)) for q in qs]
    np.testing.assert_allclose(got_collect, exp, rtol=0, atol=0)
    np.testing.assert_allclose(got_dist, exp, rtol=1e-12)
    multi = exact_quantiles_multi(ds, {"v": qs}, collect_threshold=100)
    np.testing.assert_allclose(multi["v"], exp, rtol=1e-12)


def test_csv_sink_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    df = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    ds = rd.from_pandas(df)
    out = str(tmp_path / "csv_out")
    ds.write_csv(out)
    files = glob.glob(os.path.join(out, "*.csv"))
    assert files
    back = pd.concat([pd.read_csv(f) for f in files]).sort_values("a").reset_index(drop=True)
    pd.testing.assert_frame_equal(back, df)


def test_events_flagship_zero_leakage(ray_session):
    from netml_ray.pipeline import events_session_pipeline
    from netml_ray.sessionize import TS_SEC

    out = events_session_pipeline("/root/testdata/sf0.001", num_partitions=8).to_pandas()
    assert len(out) == 1000
    matched = out["end_sec"].notna()
    assert matched.any()
    # strictly-before state: the attached session CLOSED before the event
    assert (out.loc[matched, "end_sec"] < out.loc[matched, TS_SEC]).all()
    # attached state session precedes the event's own session
    assert (out.loc[matched, "session_id_state"] < out.loc[matched, "session_id"]).all()


def test_broadcast_join_duplicate_build_keys(ray_session):
    """Duplicate build-side keys: clear error by default; explicit
    keep-last/first dedup on request (ADVICE r1)."""
    import pandas as pd
    import pytest
    import ray.data as rd

    from netml_ray.joins import broadcast_join

    ds = rd.from_items([{"k": "a", "v": 1}, {"k": "b", "v": 2}])
    build = pd.DataFrame({"k": ["a", "a", "c"], "val": [10, 20, 30]})
    with pytest.raises(ValueError, match="duplicate"):
        broadcast_join(ds, build, "k")
    out = broadcast_join(ds, build, "k", on_duplicate="last").to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    assert out.loc[0, "val"] == 20  # last wins
    assert pd.isna(out.loc[1, "val"])  # left join keeps unmatched
    out2 = broadcast_join(ds, build, "k", how="inner",
                          on_duplicate="first").to_pandas()
    assert len(out2) == 1 and out2.loc[0, "val"] == 10


def test_add_rolling_time_vs_bruteforce(ray_session):
    """Time-RANGE rolling: vectorized segmented-searchsorted result ==
    O(n^2) brute force, including EXACT boundary ties (events planted
    exactly window_sec apart must be included — inclusive lower bound)
    and equal-ts peers (RANGE includes all peers of the current row)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.windows import add_rolling_time

    rng = np.random.default_rng(7)
    n = 1500
    key = rng.integers(0, 23, n)
    ts = np.round(rng.uniform(0, 10_000, n), 3)
    ts[50] = ts[40]              # equal-ts peers within a key
    key[50] = key[40]
    ts[60] = ts[55] + 600.0      # exact boundary tie
    key[60] = key[55]
    v = rng.normal(size=n).round(3)
    t = pa.table({"k": pa.array(key), "ts": pa.array(ts),
                  "eid": pa.array(np.arange(n, dtype=np.int64)),
                  "value": pa.array(v)})
    got = (add_rolling_time(rd.from_arrow(t), "k", "ts", "value",
                            window_sec=600.0, tiebreak="eid",
                            num_partitions=6)
           .to_pandas().sort_values("eid").reset_index(drop=True))
    for i in range(n):
        m = (key == key[i]) & (ts >= ts[i] - 600.0) & (ts <= ts[i])
        row = got[got["eid"] == i].iloc[0]
        assert row["rollt_count"] == m.sum(), i
        np.testing.assert_allclose(row["rollt_sum"], v[m].sum(),
                                   rtol=0, atol=1e-9)


def test_add_cumulative_vs_bruteforce(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.windows import add_cumulative

    rng = np.random.default_rng(8)
    n = 1200
    key = rng.integers(0, 17, n)
    ts = np.round(rng.uniform(0, 5_000, n), 3)
    v = rng.normal(size=n).round(3)
    t = pa.table({"k": pa.array(key), "ts": pa.array(ts),
                  "eid": pa.array(np.arange(n, dtype=np.int64)),
                  "value": pa.array(v)})
    got = (add_cumulative(rd.from_arrow(t), "k", "ts", "value",
                          tiebreak="eid", num_partitions=6)
           .to_pandas().sort_values("eid").reset_index(drop=True))
    df = pd.DataFrame({"k": key, "ts": ts, "eid": np.arange(n),
                       "value": v}).sort_values(["k", "ts", "eid"])
    g = df.groupby("k")["value"]
    df["cum_count"] = g.cumcount() + 1
    df["cum_sum"] = g.cumsum()
    df["since"] = df["ts"] - df.groupby("k")["ts"].transform("first")
    exp = df.sort_values("eid").reset_index(drop=True)
    assert (got["cum_count"].to_numpy() == exp["cum_count"].to_numpy()).all()
    np.testing.assert_allclose(got["cum_sum"], exp["cum_sum"], atol=1e-9)
    np.testing.assert_allclose(got["cum_mean"],
                               exp["cum_sum"] / exp["cum_count"], atol=1e-9)
    np.testing.assert_allclose(got["since_first_sec"], exp["since"],
                               atol=0)


def test_add_rolling_corr_vs_pandas(ray_session):
    """roll_corr == pandas groupby-rolling corr of value vs within-key
    row position; NaN rules match SQL (n<2 or constant value)."""
    import ray.data as rd

    from netml_ray.windows import add_rolling_corr

    rng = np.random.default_rng(11)
    n = 600
    t = pa.table({
        "k": pa.array(rng.integers(0, 9, n)),
        "ts": pa.array(np.sort(rng.uniform(0, 1000, n))),
        "id": pa.array(np.arange(n, dtype=np.int64)),
        # quantized values so constant-value windows actually occur
        "value": pa.array(rng.integers(0, 3, n).astype(np.float64)),
    })
    got = (add_rolling_corr(rd.from_arrow(t), "k", "ts", "value",
                            window=5, tiebreak="id")
           .to_pandas().sort_values("id").reset_index(drop=True))
    df = t.to_pandas().sort_values(["k", "ts", "id"])
    exp = []
    for _, g in df.groupby("k", sort=False):
        v = g["value"].to_numpy()
        rn = np.arange(1, len(g) + 1, dtype=np.float64)
        for i in range(len(g)):
            w0 = max(0, i - 4)
            x, y = v[w0:i + 1], rn[w0:i + 1]
            if len(x) < 2 or np.ptp(x) == 0 or np.ptp(y) == 0:
                exp.append((g["id"].iloc[i], np.nan))
            else:
                exp.append((g["id"].iloc[i], np.corrcoef(x, y)[0, 1]))
    exp = (pd.DataFrame(exp, columns=["id", "c"])
           .sort_values("id").reset_index(drop=True))
    gv = got["roll_corr"].to_numpy()
    ev = exp["c"].to_numpy()
    nan_g, nan_e = np.isnan(gv), np.isnan(ev)
    assert (nan_g == nan_e).all()
    np.testing.assert_allclose(gv[~nan_g], ev[~nan_e], atol=1e-12)
    # a strictly increasing run pins +1
    t2 = pa.table({"k": pa.array([0] * 6),
                   "ts": pa.array(np.arange(6.0)),
                   "id": pa.array(np.arange(6, dtype=np.int64)),
                   "value": pa.array(np.arange(6.0))})
    g2 = (add_rolling_corr(rd.from_arrow(t2), "k", "ts", "value",
                           window=3, tiebreak="id")
          .to_pandas().sort_values("id"))
    assert np.isnan(g2["roll_corr"].iloc[0])
    np.testing.assert_allclose(g2["roll_corr"].iloc[1:], 1.0, atol=1e-12)


def test_add_forward_window_vs_bruteforce(ray_session):
    """fwd_count/fwd_sum == per-key brute force over [ts, ts+h]
    (value-based frame, equal-ts peers included on both sides)."""
    import ray.data as rd

    from netml_ray.windows import add_forward_window

    rng = np.random.default_rng(21)
    n = 500
    t = pa.table({
        "k": pa.array(rng.integers(0, 7, n)),
        # integer-ish seconds so exact-tie peers occur
        "ts": pa.array(np.sort(rng.integers(0, 400, n)).astype(np.float64)),
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "value": pa.array(rng.normal(size=n).round(3)),
    })
    h = 50.0
    got = (add_forward_window(rd.from_arrow(t), "k", "ts", "value",
                              horizon_sec=h, tiebreak="id")
           .to_pandas().sort_values("id").reset_index(drop=True))
    df = t.to_pandas()
    cnt = np.empty(n, dtype=np.int64)
    sm = np.empty(n)
    for i in range(n):
        m = ((df["k"] == df["k"][i]) & (df["ts"] >= df["ts"][i])
             & (df["ts"] <= df["ts"][i] + h))
        cnt[i] = int(m.sum())
        sm[i] = df.loc[m, "value"].sum()
    assert (got["fwd_count"].to_numpy() == cnt).all()
    np.testing.assert_allclose(got["fwd_sum"], sm, atol=1e-9)


def test_add_seasonal_deviation_vs_pandas(ray_session):
    """season_mean == groupby (key, hour-of-day) transform('mean') on a
    real timestamp column; season_dev = value - season_mean."""
    import ray.data as rd

    from netml_ray.windows import add_seasonal_deviation

    rng = np.random.default_rng(22)
    n = 800
    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = base + (rng.integers(0, 14 * 86400, n) * 1_000_000).astype(
        "timedelta64[us]")
    t = pa.table({
        "k": pa.array(rng.integers(0, 11, n)),
        "ts": pa.array(np.sort(ts)),
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "value": pa.array(rng.normal(size=n).round(3)),
    })
    got = (add_seasonal_deviation(rd.from_arrow(t), "k", "ts", "value")
           .to_pandas().sort_values("id").reset_index(drop=True))
    df = t.to_pandas()
    df["hour"] = df["ts"].dt.hour
    exp = df.groupby(["k", "hour"])["value"].transform("mean")
    np.testing.assert_allclose(got["season_mean"], exp, atol=1e-12)
    np.testing.assert_allclose(got["season_dev"], df["value"] - exp,
                               atol=1e-12)


def test_add_time_to_event_vs_bruteforce(ray_session):
    """tte == per-row brute force: time of the key's next target row
    strictly after it in (ts, id) order; NULL/NaN when none.  Both
    units, and the us unit is exact int64."""
    import ray.data as rd

    from netml_ray.windows import add_time_to_event

    rng = np.random.default_rng(31)
    n = 700
    base = np.datetime64("2024-03-01T00:00:00", "us")
    ts = base + np.sort(rng.integers(0, 10 * 86400, n)) \
        .astype("timedelta64[s]").astype("timedelta64[us]")
    t = pa.table({
        "k": pa.array(rng.integers(0, 9, n)),
        "ts": pa.array(ts),
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "etype": pa.array(rng.choice(["buy", "view", "click"], n,
                                     p=[0.1, 0.5, 0.4])),
    })
    got = (add_time_to_event(rd.from_arrow(t), "k", "ts", "etype",
                             "buy", tiebreak="id", out_col="tte_us",
                             out_unit="us")
           .to_pandas().sort_values("id").reset_index(drop=True))
    df = t.to_pandas().sort_values(["k", "ts", "id"]).reset_index(drop=True)
    usec = df["ts"].astype("int64")
    exp = np.full(n, -1, dtype=np.int64)
    for kk, g in df.groupby("k", sort=False):
        gi = g.index.to_numpy()
        for pos, i in enumerate(gi):
            fut = [j for j in gi[pos + 1:] if df["etype"][j] == "buy"]
            if fut:
                exp[df["id"][i]] = usec[fut[0]] - usec[i]
    gv = got["tte_us"].to_numpy(na_value=-1).astype(np.int64)
    assert (gv == exp).all()
    # sec unit agrees where defined
    got_s = (add_time_to_event(rd.from_arrow(t), "k", "ts", "etype",
                               "buy", tiebreak="id")
             .to_pandas().sort_values("id").reset_index(drop=True))
    sv = got_s["tte_sec"].to_numpy()
    defined = exp >= 0
    assert (np.isnan(sv) == ~defined).all()
    np.testing.assert_allclose(sv[defined], exp[defined] / 1e6,
                               rtol=1e-12)


def test_frequency_encode_vs_pandas(ray_session):
    import ray.data as rd

    from netml_ray.mlprep import frequency_encode

    rng = np.random.default_rng(33)
    n = 2000
    t = pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "c": pa.array(rng.choice(["a", "b", "c", "d"], n,
                                 p=[0.5, 0.3, 0.15, 0.05])),
    })
    got = (frequency_encode(rd.from_arrow(t), "c")
           .to_pandas().sort_values("id").reset_index(drop=True))
    df = t.to_pandas()
    exp_cnt = df.groupby("c")["c"].transform("count")
    assert (got["c_count"].to_numpy() == exp_cnt.to_numpy()).all()
    np.testing.assert_allclose(got["c_freq"], exp_cnt / n, atol=1e-15)


def test_add_rolling_distinct_vs_bruteforce(ray_session):
    """roll_distinct == len(set(...)) over the trailing-5 window per
    key, exact int64."""
    import ray.data as rd

    from netml_ray.windows import add_rolling_distinct

    rng = np.random.default_rng(41)
    n = 900
    t = pa.table({
        "k": pa.array(rng.integers(0, 8, n)),
        "ts": pa.array(np.sort(rng.integers(0, 300, n))
                       .astype(np.float64)),
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "c": pa.array(rng.choice(["a", "b", "c", "d", "e"], n)),
    })
    got = (add_rolling_distinct(rd.from_arrow(t), "k", "ts", "c",
                                window=5, tiebreak="id")
           .to_pandas().sort_values("id").reset_index(drop=True))
    df = t.to_pandas().sort_values(["k", "ts", "id"])
    exp = np.empty(n, dtype=np.int64)
    for _, g in df.groupby("k", sort=False):
        cs = g["c"].to_list()
        ids = g["id"].to_list()
        for i in range(len(cs)):
            exp[ids[i]] = len(set(cs[max(0, i - 4):i + 1]))
    assert (got["roll_distinct"].to_numpy() == exp).all()


def test_welch_ttest_vs_numpy(ray_session):
    import ray.data as rd

    from netml_ray.mlprep import welch_ttest

    rng = np.random.default_rng(43)
    n = 3000
    g = rng.choice(["x", "y", "z"], n, p=[0.4, 0.4, 0.2])
    v = rng.normal(loc=np.where(g == "x", 5.0, 4.5), scale=2.0)
    t = pa.table({"g": pa.array(g), "v": pa.array(v)})
    got = welch_ttest(rd.from_arrow(t), "g", "v", "x", "y").to_pandas()
    xa, xb = v[g == "x"], v[g == "y"]
    ma, mb = xa.mean(), xb.mean()
    va, vb = xa.var(ddof=1), xb.var(ddof=1)
    se2 = va / len(xa) + vb / len(xb)
    tstat = (ma - mb) / np.sqrt(se2)
    df = se2 ** 2 / ((va / len(xa)) ** 2 / (len(xa) - 1)
                     + (vb / len(xb)) ** 2 / (len(xb) - 1))
    assert got["n_a"][0] == len(xa) and got["n_b"][0] == len(xb)
    np.testing.assert_allclose(
        got[["mean_a", "mean_b", "var_a", "var_b", "t_stat", "df"]]
        .iloc[0].to_numpy(),
        [ma, mb, va, vb, tstat, df], rtol=1e-9)


def test_rollup_agg_vs_pandas(ray_session):
    """rollup levels == pandas groupby at each level; NULL markers on
    rolled-up columns; grand total counts each row once."""
    import ray.data as rd

    from netml_ray.windows import rollup_agg

    rng = np.random.default_rng(51)
    n = 2000
    t = pa.table({
        "a": pa.array(rng.choice(["x", "y", "z"], n)),
        "b": pa.array(rng.integers(0, 6, n).astype(np.int64)),
        "v": pa.array(rng.normal(size=n).round(3)),
    })
    got = (rollup_agg(rd.from_arrow(t), "a", "b", "v")
           .to_pandas())
    df = t.to_pandas()
    l2 = got[got["b"].notna() & got["a"].notna()]
    exp2 = df.groupby(["a", "b"]).agg(n=("v", "size"), s=("v", "sum"))
    assert len(l2) == len(exp2)
    for row in l2.itertuples(index=False):
        e = exp2.loc[(row.a, row.b)]
        assert row.n == e["n"]
        assert abs(row.s - e["s"]) < 1e-9
    l1 = got[got["b"].isna() & got["a"].notna()]
    exp1 = df.groupby("a").agg(n=("v", "size"), s=("v", "sum"))
    assert len(l1) == len(exp1)
    for row in l1.itertuples(index=False):
        e = exp1.loc[row.a]
        assert row.n == e["n"]
        assert abs(row.s - e["s"]) < 1e-9
    l0 = got[got["a"].isna()]
    assert len(l0) == 1 and l0["b"].isna().all()
    assert l0["n"].iloc[0] == n
    assert abs(l0["s"].iloc[0] - df["v"].sum()) < 1e-9


def test_cube_agg_vs_pandas(ray_session):
    """cube adds the (NULL, b) marginal on top of rollup's levels."""
    import ray.data as rd

    from netml_ray.windows import cube_agg

    rng = np.random.default_rng(53)
    n = 1500
    t = pa.table({
        "a": pa.array(rng.choice(["x", "y"], n)),
        "b": pa.array(rng.integers(0, 4, n).astype(np.int64)),
        "v": pa.array(rng.normal(size=n).round(3)),
    })
    got = cube_agg(rd.from_arrow(t), "a", "b", "v").to_pandas()
    df = t.to_pandas()
    # level counts: |a x b| + |a| + |b| + 1
    na, nb = df["a"].nunique(), df["b"].nunique()
    nab = df.groupby(["a", "b"]).ngroups
    assert len(got) == nab + na + nb + 1
    bl = got[got["a"].isna() & got["b"].notna()]
    expb = df.groupby("b").agg(n=("v", "size"), s=("v", "sum"))
    assert len(bl) == nb
    for row in bl.itertuples(index=False):
        e = expb.loc[row.b]
        assert row.n == e["n"] and abs(row.s - e["s"]) < 1e-9


def test_melt_roundtrip_and_shape(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.windows import melt

    rng = np.random.default_rng(79)
    n = 2000
    t = pa.table({
        "id": pa.array(np.arange(n)),
        "a": pa.array(rng.normal(0, 1, n)),
        "b": pa.array(rng.integers(0, 50, n)),
    })
    out = melt(rd.from_arrow(t).repartition(5), ["id"], ["a", "b"]) \
        .to_pandas()
    assert len(out) == 2 * n
    assert set(out["variable"]) == {"a", "b"}
    df = t.to_pandas().set_index("id")
    wa = out[out["variable"] == "a"].set_index("id")["value"]
    wb = out[out["variable"] == "b"].set_index("id")["value"]
    assert np.allclose(wa.sort_index(), df["a"])
    assert np.allclose(wb.sort_index(), df["b"].astype(float))


def test_dup_cluster_sizes_planted(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    import __ray_entry__ as m

    # build a corpus with known cluster sizes: 10 singletons,
    # 3 pairs, 2 triples, 1 cluster of 5
    docs = [f"unique doc {i}" for i in range(10)]
    docs += ["pair a"] * 2 + ["pair b"] * 2 + ["pair c"] * 2
    docs += ["triple a"] * 3 + ["triple b"] * 3
    docs += ["five"] * 5
    rng = np.random.default_rng(89)
    order = rng.permutation(len(docs))
    t = pa.table({"text": pa.array([docs[i] for i in order])})

    import tempfile, os
    d = tempfile.mkdtemp(prefix="dupclust_")
    import pyarrow.parquet as pq
    pq.write_table(t, os.path.join(d, "documents.parquet"))
    out = m.queries()["dup_cluster_sizes_docs"](d).to_pandas() \
        .set_index("cluster_size")
    assert out.loc[1, "n_clusters"] == 10
    assert out.loc[2, "n_clusters"] == 3
    assert out.loc[3, "n_clusters"] == 2
    assert out.loc[5, "n_clusters"] == 1


def test_top_token_per_doc_semantics(ray_session):
    """Tie → lexicographically smallest; counts match a Counter brute;
    whitespace-only docs are dropped (SQL x <> '' rule)."""
    import sys
    from collections import Counter

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry_mod

    import pyarrow as pa
    import ray.data as rd

    texts = ["b a b a", "z z y", "  ", "solo"]
    t = pa.table({"doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                  "text": pa.array(texts)})
    import tempfile, os
    d = tempfile.mkdtemp()
    import pyarrow.parquet as pq
    pq.write_table(t, os.path.join(d, "documents.parquet"))
    out = entry_mod.q_top_token_per_doc(d).to_pandas() \
        .set_index("doc_id").sort_index()
    assert list(out.index) == [1, 2, 4]
    assert out.loc[1, "top_token"] == "a" and out.loc[1, "n"] == 2
    assert out.loc[2, "top_token"] == "z" and out.loc[2, "n"] == 2
    assert out.loc[4, "top_token"] == "solo"


def test_kwic_window_edges(ray_session):
    """KWIC snippets clamp at doc boundaries and use the FIRST hit."""
    import sys

    import pyarrow as pa

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as m

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "customer at start of doc here now",
            "a b c d e f customer g h i j k l",
            "no hit in this one",
            "x customer y customer z"])})
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        import pyarrow.parquet as pq
        pq.write_table(t, os.path.join(d, "documents.parquet"))
        res = m.queries()["kwic_docs"](d).to_pandas() \
            .set_index("doc_id")
    assert res.loc[0, "pos"] == 1
    assert res.loc[0, "snippet"] == "customer at start of doc here"
    assert res.loc[1, "pos"] == 7
    assert res.loc[1, "snippet"] == "b c d e f customer g h i j k"
    assert 2 not in res.index
    assert res.loc[3, "pos"] == 2          # first hit wins
    assert res.loc[3, "snippet"] == "x customer y customer z"
