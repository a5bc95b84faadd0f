"""Scaler fit/transform and Misra-Gries heavy hitters."""

import numpy as np
import pyarrow as pa
import pytest


def test_fit_scaler_matches_numpy(ray_session):
    import ray.data as rd

    from netml_ray.mlprep import fit_scaler, transform_scaled

    rng = np.random.default_rng(11)
    a = rng.normal(5.0, 2.0, 5000)
    b = rng.uniform(-3.0, 7.0, 5000)
    c = np.full(5000, 4.2)          # degenerate: std = 0, range = 0
    t = pa.table({"a": pa.array(a), "b": pa.array(b), "c": pa.array(c),
                  "rid": pa.array(np.arange(5000, dtype=np.int64))})
    ds = rd.from_arrow([t.slice(i, 500) for i in range(0, 5000, 500)])
    fit = fit_scaler(ds, ["a", "b", "c"])
    for name, v in (("a", a), ("b", b), ("c", c)):
        assert fit[name]["mean"] == pytest.approx(v.mean(), rel=1e-12)
        assert fit[name]["std"] == pytest.approx(v.std(), rel=1e-9, abs=1e-12)
        assert fit[name]["min"] == v.min() and fit[name]["max"] == v.max()
        assert fit[name]["n"] == 5000

    std = (transform_scaled(ds, fit, mode="standard").to_pandas()
           .sort_values("rid").reset_index(drop=True))
    np.testing.assert_allclose(std["a_scaled"],
                               (a - a.mean()) / a.std(), rtol=1e-9)
    np.testing.assert_array_equal(std["c_scaled"], 0.0)
    mm = (transform_scaled(ds, fit, mode="minmax").to_pandas()
          .sort_values("rid").reset_index(drop=True))
    np.testing.assert_allclose(mm["b_scaled"],
                               (b - b.min()) / (b.max() - b.min()),
                               rtol=1e-12)
    np.testing.assert_array_equal(mm["c_scaled"], 0.0)
    with pytest.raises(ValueError):
        transform_scaled(ds, fit, mode="robust")


def test_fit_scaler_ignores_nan(ray_session):
    import ray.data as rd

    from netml_ray.mlprep import fit_scaler

    v = np.array([1.0, np.nan, 3.0, np.nan, 5.0])
    ds = rd.from_arrow(pa.table({"x": pa.array(v)}))
    fit = fit_scaler(ds, ["x"])
    assert fit["x"]["n"] == 3
    assert fit["x"]["mean"] == pytest.approx(3.0)
    assert fit["x"]["min"] == 1.0 and fit["x"]["max"] == 5.0


def _zipf_stream(n=30000, seed=7):
    rng = np.random.default_rng(seed)
    return rng.zipf(1.3, n).clip(max=5000)


def test_misra_gries_guarantees(ray_session):
    import ray.data as rd

    from netml_ray.mlprep import misra_gries_topk

    v = _zipf_stream()
    n, k = len(v), 32
    t = pa.table({"x": pa.array(v.astype(np.int64))})
    ds = rd.from_arrow([t.slice(i, 1000) for i in range(0, n, 1000)])
    got = dict(misra_gries_topk(ds, "x", k=k))
    true = dict(zip(*np.unique(v, return_counts=True)))
    # every item with true count > n/k is reported
    for item, cnt in true.items():
        if cnt > n / k:
            assert item in got
    # estimates never exceed truth and err low by at most n/k
    for item, est in got.items():
        assert est <= true[item]
        assert true[item] - est <= n / k


def test_misra_gries_partition_invariant_bounds(ray_session):
    import ray.data as rd

    from netml_ray.mlprep import misra_gries_topk

    v = _zipf_stream(seed=23)
    n, k = len(v), 16
    true = dict(zip(*np.unique(v, return_counts=True)))
    t = pa.table({"x": pa.array(v.astype(np.int64))})
    for width in (500, 3000, n):
        ds = rd.from_arrow([t.slice(i, width) for i in range(0, n, width)])
        got = dict(misra_gries_topk(ds, "x", k=k))
        for item, cnt in true.items():
            if cnt > n / k:
                assert item in got, (width, item)


def test_misra_gries_block_summary_is_valid_mg(ray_session):
    """The vectorized per-block summary (exact counts pruned to k-1)
    obeys the same invariants as the textbook streaming loop: ≤ k-1
    rows, never overestimates, misses by at most n_block/k."""
    import ray.data as rd

    from netml_ray.mlprep import misra_gries_partials

    v = _zipf_stream(5000, seed=3)
    t = pa.table({"x": pa.array(v.astype(np.int64))})
    out = (misra_gries_partials(rd.from_arrow(t), "x", k=8)
           .to_pandas())
    assert len(out) <= 7
    true = dict(zip(*np.unique(v, return_counts=True)))
    for _, r in out.iterrows():
        assert r["n"] <= true[r["item"]]
        assert true[r["item"]] - r["n"] <= len(v) / 8


def test_misra_gries_exact_when_k_exceeds_cardinality(ray_session):
    import ray.data as rd

    from netml_ray.mlprep import misra_gries_topk

    v = np.array(["a"] * 7 + ["b"] * 5 + ["c"] * 2)
    np.random.default_rng(1).shuffle(v)
    t = pa.table({"x": pa.array(v)})
    ds = rd.from_arrow([t.slice(i, 3) for i in range(0, len(v), 3)])
    assert misra_gries_topk(ds, "x", k=64) == [("a", 7), ("b", 5), ("c", 2)]


def test_pca_matches_numpy(ray_session):
    """Distributed fit (moment partials + driver eigh) must equal the
    single-matrix numpy PCA: covariance allclose, components equal up
    to the pinned sign convention, projection allclose, and the fit
    must be invariant to block structure."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.mlprep import fit_pca, transform_pca

    rng = np.random.default_rng(7)
    n, d = 1200, 12
    base = rng.normal(size=(n, 3)) @ rng.normal(size=(3, d)) \
        + 0.05 * rng.normal(size=(n, d)) + rng.normal(size=d)
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(base.astype(np.float32))),
    })
    ds = rd.from_arrow(t)
    fit = fit_pca(ds, "embedding", k=3)

    m = base.astype(np.float32).astype(np.float64)
    mu = m.mean(axis=0)
    cov = (m - mu).T @ (m - mu) / n
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:3]
    comp = v[:, order]
    flip = np.sign(comp[np.argmax(np.abs(comp), axis=0), np.arange(3)])
    comp = comp * flip

    np.testing.assert_allclose(fit["mean"], mu, rtol=0, atol=1e-9)
    np.testing.assert_allclose(fit["explained_variance"], w[order],
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(fit["components"], comp,
                               rtol=1e-6, atol=1e-9)
    assert (np.diff(fit["explained_variance"]) <= 1e-12).all()

    out = transform_pca(ds, fit, "embedding",
                        keep=["vec_id"]).to_pandas()
    out = out.sort_values("vec_id").reset_index(drop=True)
    exp = (m - mu) @ comp
    for j in range(3):
        np.testing.assert_allclose(out[f"pc{j+1}"].to_numpy(),
                                   exp[:, j], rtol=1e-6, atol=1e-8)

    # block-structure invariance: same fit from a repartitioned input
    fit2 = fit_pca(ds.repartition(7), "embedding", k=3)
    np.testing.assert_allclose(fit2["components"], fit["components"],
                               rtol=1e-9, atol=1e-12)


def test_grouped_split_leakage_free(ray_session):
    """Every key's rows land in ONE split, proportions are roughly the
    requested ones, assignment is identical across repartitionings
    (shuffle-free determinism), and bad pcts raise."""
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from netml_ray.mlprep import grouped_split

    rng = np.random.default_rng(3)
    n = 20000
    t = pa.table({
        "row": pa.array(np.arange(n, dtype=np.int64)),
        "user": pa.array(rng.integers(0, 2000, n)),
    })
    out = grouped_split(rd.from_arrow(t), "user").to_pandas()
    per_key = out.groupby("user")["split"].nunique()
    assert (per_key == 1).all()
    frac = out.drop_duplicates("user")["split"].value_counts(
        normalize=True)
    assert abs(frac.get("train", 0) - 0.8) < 0.05
    out2 = grouped_split(rd.from_arrow(t).repartition(9),
                         "user").to_pandas()
    m = out.merge(out2, on="row", suffixes=("", "_2"))
    assert (m["split"] == m["split_2"]).all()
    with pytest.raises(ValueError):
        grouped_split(rd.from_arrow(t), "user",
                      splits=(("a", 50), ("b", 20)))


def test_add_quantile_bins_vs_numpy(ray_session):
    """Bin = #edges strictly below the value, edges = exact global
    quantiles rounded to 9; partition-invariant."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.mlprep import add_quantile_bins

    rng = np.random.default_rng(4)
    v = np.round(rng.normal(size=5000), 3)
    # plant values exactly ON an edge candidate to pin the boundary
    v[:10] = np.round(np.quantile(v, 0.5), 9)
    t = pa.table({"i": pa.array(np.arange(len(v), dtype=np.int64)),
                  "value": pa.array(v)})
    out, edges = add_quantile_bins(rd.from_arrow(t), "value",
                                   qs=(0.1, 0.5, 0.9))
    out = out.to_pandas().sort_values("i").reset_index(drop=True)
    exp_edges = np.round(np.quantile(v, [0.1, 0.5, 0.9]), 9)
    np.testing.assert_array_equal(edges, exp_edges)
    exp = np.searchsorted(exp_edges, v, side="left")
    np.testing.assert_array_equal(out["value_bin"].to_numpy(), exp)


def test_group_zscore_vs_pandas(ray_session):
    """Per-key standardization matches pandas groupby-transform with
    population std; single-member and constant groups -> 0; result is
    partition-invariant (broadcast stats are global)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.mlprep import group_zscore

    rng = np.random.default_rng(11)
    n = 4000
    key = rng.integers(0, 97, n)
    key[0] = 999            # singleton group
    v = np.round(rng.normal(10, 3, n), 3)
    v[key == 5] = 7.25      # constant group
    t = pa.table({"i": pa.array(np.arange(n, dtype=np.int64)),
                  "k": pa.array(key.astype(np.int64)),
                  "value": pa.array(v)})
    out = (group_zscore(rd.from_arrow(t).repartition(7), "k", "value")
           .to_pandas().sort_values("i").reset_index(drop=True))
    df = pd.DataFrame({"k": key, "value": v})
    g = df.groupby("k")["value"]
    sd = g.transform(lambda s: s.std(ddof=0))
    mu = g.transform("mean")
    exp = np.where(sd > 0, (df["value"] - mu) / sd.where(sd > 0, 1.0), 0.0)
    np.testing.assert_allclose(out["value_gz"].to_numpy(),
                               np.round(exp, 9), atol=1e-9)
    assert out.loc[out["k"] == 999, "value_gz"].eq(0).all()
    assert out.loc[out["k"] == 5, "value_gz"].eq(0).all()


def test_onehot_encode(ray_session):
    """Discovered categories are sorted; unseen pinned categories give
    all-zero columns; null input rows encode as 0 (SQL CASE parity)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.mlprep import onehot_encode

    t = pa.table({"i": pa.array(np.arange(6, dtype=np.int64)),
                  "c": pa.array(["b", "a", None, "c", "a", "b"])})
    out = (onehot_encode(rd.from_arrow(t).repartition(3), "c")
           .to_pandas().sort_values("i").reset_index(drop=True))
    assert [c for c in out.columns if c.startswith("c__")] == \
        ["c__a", "c__b", "c__c"]
    np.testing.assert_array_equal(out["c__a"], [0, 1, 0, 0, 1, 0])
    np.testing.assert_array_equal(out["c__b"], [1, 0, 0, 0, 0, 1])
    np.testing.assert_array_equal(out["c__c"], [0, 0, 0, 1, 0, 0])
    assert out["c__a"].dtype == np.int64
    # pinned (training-time) categories: unseen value -> all zeros row
    out2 = (onehot_encode(rd.from_arrow(t), "c", categories=["a", "z"])
            .to_pandas().sort_values("i").reset_index(drop=True))
    np.testing.assert_array_equal(out2["c__z"], [0] * 6)
    np.testing.assert_array_equal(out2["c__a"], [0, 1, 0, 0, 1, 0])


def test_feature_hash_parity_and_nulls(ray_session):
    """Engine bucket == DuckDB hex-cast md5 form; crossed columns,
    int casts, and NULL->'' handling all bit-equal; stateless
    (partition-invariant by construction)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.mlprep import feature_hash

    t = pa.table({
        "i": pa.array(np.arange(6, dtype=np.int64)),
        "c": pa.array(["x", None, "y", "x", "z|", ""]),
        "u": pa.array([1, 2, None, 4, 5, 6], type=pa.int64()),
    })
    out = (feature_hash(rd.from_arrow(t).repartition(3), ["c", "u"],
                        n_buckets=64, out_col="fh")
           .to_pandas().sort_values("i").reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", t)
    exp = con.sql(
        "SELECT i, (('0x' || substr(md5(concat(COALESCE(c,''), '|', "
        "COALESCE(CAST(u AS VARCHAR), ''))), 1, 15))::BIGINT % 64) AS fh "
        "FROM t ORDER BY i").df()
    np.testing.assert_array_equal(out["fh"].to_numpy(),
                                  exp["fh"].to_numpy())
    assert out["fh"].between(0, 63).all()


def test_kmeans_matches_numpy_lloyd(ray_session):
    """Distributed partial-pass k-means == a driver-side numpy Lloyd
    reference with the same init / rounding / tie rules, regardless of
    partitioning; empty clusters keep their previous centroid."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.mlprep import kmeans_fit, kmeans_predict

    rng = np.random.default_rng(21)
    k, d, n = 3, 8, 2000
    centers = rng.normal(0, 5, (k, d))
    x = (centers[rng.integers(0, k, n)] +
         rng.normal(0, 0.5, (n, d))).astype(np.float64)
    offs = pa.array(np.arange(n + 1, dtype=np.int64) * d)
    t = pa.table({"i": pa.array(np.arange(n, dtype=np.int64)),
                  "v": pa.ListArray.from_arrays(offs, pa.array(x.ravel()))})
    init = x[:k].copy()

    def ref_assign(m, cent):
        dist = np.sqrt(((m[:, None, :] - cent[None]) ** 2).sum(-1))
        return np.argmin(np.round(dist, 9), axis=1)

    cent_ref = init.copy()
    for _ in range(2):
        a = ref_assign(x, cent_ref)
        nxt = cent_ref.copy()
        for j in range(k):
            if (a == j).any():
                nxt[j] = np.round(x[a == j].mean(axis=0), 9)
        cent_ref = nxt

    ds = rd.from_arrow(t).repartition(7)
    cent = kmeans_fit(ds, "v", init=init, iters=2)
    np.testing.assert_allclose(cent, cent_ref, atol=1e-12)
    out = (kmeans_predict(ds, cent, "v").to_pandas()
           .sort_values("i").reset_index(drop=True))
    np.testing.assert_array_equal(out["cluster"].to_numpy(),
                                  ref_assign(x, cent_ref))
    # empty-cluster rule: a far-away init centroid attracts nothing
    # and must survive the update untouched
    far = np.vstack([init[:2], np.full((1, d), 1e6)])
    cent2 = kmeans_fit(ds, "v", init=far, iters=1)
    np.testing.assert_array_equal(cent2[2], far[2])


def test_group_moments_matches_duckdb(ray_session):
    """Power-sum partial moments == DuckDB's bias-corrected
    skewness/kurtosis (G1/G2), partition-invariant; tiny / zero-var
    groups follow the SQL NULL rules."""
    import duckdb
    import ray.data as rd

    from netml_ray.mlprep import group_moments

    rng = np.random.default_rng(31)
    n = 4000
    g = rng.choice(["a", "b", "c"], n)
    v = rng.gamma(2.0, 3.0, n)       # skewed on purpose
    t = pa.table({"g": pa.array(g), "v": pa.array(v)})
    # edge groups: n=2 (skew NULL), n=3 (kurt NULL), zero-variance
    edge = pa.table({"g": pa.array(["two", "two", "thr", "thr", "thr",
                                    "zv", "zv", "zv", "zv", "zv"]),
                     "v": pa.array([1.0, 2.0, 1.0, 5.0, 9.0,
                                    7.0, 7.0, 7.0, 7.0, 7.0])})
    full = pa.concat_tables([t, edge])
    for parts in (1, 7):
        out = group_moments(rd.from_arrow(full).repartition(parts),
                            "g", "v").to_pandas().sort_values("g")
        con = duckdb.connect()
        con.register("t", full)
        exp = con.sql(
            "SELECT g, count(*) AS n, round(avg(v),9) AS mean_v, "
            "round(stddev_samp(v),9) AS std_v, "
            "round(skewness(v),9) AS skew_v, "
            "round(kurtosis(v),9) AS kurt_v FROM t GROUP BY g "
            "ORDER BY g").df()
        np.testing.assert_array_equal(out["n"].to_numpy(),
                                      exp["n"].to_numpy())
        for col in ("mean", "std", "skew", "kurt"):
            a = out[f"{col}_v"].to_numpy(dtype=float)
            b = exp[f"{col}_v"].to_numpy(dtype=float)
            np.testing.assert_array_equal(np.isnan(a), np.isnan(b))
            np.testing.assert_allclose(a[~np.isnan(a)], b[~np.isnan(b)],
                                       atol=2e-9)


def test_group_corr_matches_pandas(ray_session):
    """Per-key Pearson r from six-double partials == pandas corr;
    NULL pairs dropped first; n<2 / zero-variance keys -> NULL."""
    import pandas as pd
    import ray.data as rd

    from netml_ray.mlprep import group_corr

    rng = np.random.default_rng(32)
    n = 3000
    g = rng.choice(["p", "q", "r"], n)
    x = rng.normal(0, 1, n)
    y = 0.6 * x + rng.normal(0, 0.5, n)
    # NULL holes + a constant-x key + a single-row key
    xm = pa.array(np.where(rng.random(n) < 0.05, np.nan, x)).cast(pa.float64())
    xm = pa.compute.if_else(pa.compute.is_nan(xm), pa.scalar(None, pa.float64()), xm)
    t = pa.table({"g": pa.array(g), "x": xm, "y": pa.array(y)})
    edge = pa.table({"g": pa.array(["cx", "cx", "cx", "one"]),
                     "x": pa.array([2.0, 2.0, 2.0, 1.0]),
                     "y": pa.array([1.0, 5.0, 9.0, 3.0])})
    full = pa.concat_tables([t, edge])
    out = (group_corr(rd.from_arrow(full).repartition(5), "g", "x", "y")
           .to_pandas().set_index("g")["corr_x_y"])
    pdf = full.to_pandas().dropna(subset=["x", "y"])
    for k, sub in pdf.groupby("g"):
        exp = sub["x"].corr(sub["y"])
        got = out[k]
        if len(sub) < 2 or sub["x"].nunique() < 2 or sub["y"].nunique() < 2:
            assert got is None or np.isnan(got)
        else:
            assert got == pytest.approx(exp, abs=2e-9)


def test_robust_zscore_matches_numpy(ray_session):
    """(x − median)/MAD per key == a numpy reference; MAD=0 keys map
    to 0; partition-invariant."""
    import ray.data as rd

    from netml_ray.mlprep import robust_zscore

    rng = np.random.default_rng(33)
    n = 2000
    g = rng.choice(["a", "b"], n)
    v = rng.normal(10, 4, n)
    t = pa.table({"i": pa.array(np.arange(n, dtype=np.int64)),
                  "g": pa.array(g), "v": pa.array(v)})
    zv = pa.table({"i": pa.array([n, n + 1, n + 2], type=pa.int64()),
                   "g": pa.array(["z", "z", "z"]),
                   "v": pa.array([5.0, 5.0, 5.0])})
    full = pa.concat_tables([t, zv])
    out = (robust_zscore(rd.from_arrow(full).repartition(6), "g", "v")
           .to_pandas().sort_values("i").reset_index(drop=True))
    pdf = full.to_pandas()
    med = pdf.groupby("g")["v"].median()
    mad = (pdf["v"] - pdf["g"].map(med)).abs().groupby(pdf["g"]).median()
    m = pdf["g"].map(mad).to_numpy()
    exp = np.where(m > 0,
                   (pdf["v"] - pdf["g"].map(med)).to_numpy()
                   / np.where(m > 0, m, 1.0), 0.0)
    np.testing.assert_allclose(out["v_rz"].to_numpy(), np.round(exp, 9),
                               atol=2e-9)
    assert (out.loc[out["g"] == "z", "v_rz"] == 0).all()


def test_group_entropy_mode_match_pandas(ray_session):
    """Entropy / mode from (key,cat) count partials == a pandas
    reference, partition-invariant; mode ties break to the smallest
    category."""
    import pandas as pd
    import ray.data as rd

    from netml_ray.mlprep import group_entropy, group_mode

    rng = np.random.default_rng(51)
    n = 3000
    t = pa.table({"k": pa.array(rng.integers(0, 40, n)),
                  "c": pa.array(rng.choice(list("abcde"), n))})
    # forced tie: key 999 sees 'b' and 'a' twice each -> mode 'a'
    tie = pa.table({"k": pa.array([999] * 4),
                    "c": pa.array(["b", "a", "b", "a"])})
    full = pa.concat_tables([t, tie])
    pdf = full.to_pandas()

    def ref_entropy(s):
        p = s.value_counts(normalize=True).to_numpy()
        return float(-(p * np.log(p)).sum())

    exp_h = pdf.groupby("k")["c"].apply(ref_entropy)
    exp_m = pdf.groupby("k")["c"].apply(
        lambda s: s.value_counts().sort_index().sort_values(
            ascending=False, kind="stable").index[0])
    for parts in (1, 8):
        ds = rd.from_arrow(full).repartition(parts)
        h = group_entropy(ds, "k", "c").to_pandas().set_index("k")["entropy"]
        m = group_mode(ds, "k", "c").to_pandas().set_index("k")["mode_c"]
        for k in exp_h.index:
            assert h[k] == pytest.approx(exp_h[k], abs=2e-9)
            assert m[k] == exp_m[k]
    assert m[999] == "a"


def test_mutual_information_matches_manual(ray_session):
    """MI over joint count partials == the direct plug-in estimate;
    independent columns -> ~0, identical columns -> H(X)."""
    import ray.data as rd

    from netml_ray.mlprep import mutual_information

    rng = np.random.default_rng(52)
    n = 5000
    x = rng.choice(["p", "q", "r"], n)
    y = np.where(rng.random(n) < 0.7, x, rng.choice(["p", "q", "r"], n))
    t = pa.table({"x": pa.array(x), "y": pa.array(y)})
    ds = rd.from_arrow(t).repartition(6)
    got = mutual_information(ds, "x", "y")

    import collections
    joint = collections.Counter(zip(x, y))
    px = collections.Counter(x)
    py = collections.Counter(y)
    mi = sum((c / n) * np.log((c / n) / ((px[a] / n) * (py[b] / n)))
             for (a, b), c in joint.items())
    assert got == pytest.approx(round(max(mi, 0.0), 9), abs=2e-9)
    # identical columns: MI == entropy of X
    t2 = pa.table({"x": pa.array(x), "y": pa.array(x)})
    p = np.array(list(px.values())) / n
    hx = float(-(p * np.log(p)).sum())
    assert mutual_information(rd.from_arrow(t2), "x", "y") == \
        pytest.approx(hx, abs=2e-9)


def test_target_encode_oof_leakage_safe(ray_session):
    """Out-of-fold target encoding: (a) matches a pandas reference
    with the same md5 fold rule; (b) LEAKAGE property — perturbing
    the targets of fold f leaves fold-f rows' encodings unchanged."""
    import hashlib

    import pandas as pd
    import ray.data as rd

    from netml_ray.mlprep import target_encode_oof

    rng = np.random.default_rng(81)
    n = 2000
    ids = np.arange(n, dtype=np.int64)
    cat = rng.choice(["a", "b", "c"], n)
    y = rng.normal(10, 3, n)
    folds = np.array([int(hashlib.md5(str(i).encode())
                          .hexdigest()[:15], 16) % 5 for i in ids])
    t = pa.table({"i": pa.array(ids), "c": pa.array(cat),
                  "y": pa.array(y)})
    out = (target_encode_oof(rd.from_arrow(t).repartition(6),
                             "c", "y", "i", n_folds=5, m=10.0)
           .to_pandas().sort_values("i").reset_index(drop=True))

    df = pd.DataFrame({"c": cat, "y": y, "f": folds})
    cf = df.groupby(["c", "f"])["y"].agg(["count", "sum"])
    ctot = df.groupby("c")["y"].agg(["count", "sum"])
    ftot = df.groupby("f")["y"].agg(["count", "sum"])
    nt, st = len(df), df["y"].sum()
    exp = []
    for c, f in zip(cat, folds):
        nf, sf = (cf.loc[(c, f)] if (c, f) in cf.index
                  else pd.Series({"count": 0, "sum": 0.0}))[["count", "sum"]]
        gm = (st - ftot.loc[f, "sum"]) / (nt - ftot.loc[f, "count"])
        exp.append(((ctot.loc[c, "sum"] - sf) + 10 * gm)
                   / ((ctot.loc[c, "count"] - nf) + 10))
    np.testing.assert_allclose(out["c_te_oof"].to_numpy(),
                               np.round(exp, 9), atol=2e-9)

    # leakage check: shift fold-0 targets by +1000; fold-0 rows'
    # encodings must be IDENTICAL (they never see their own fold)
    y2 = np.where(folds == 0, y + 1000.0, y)
    t2 = pa.table({"i": pa.array(ids), "c": pa.array(cat),
                   "y": pa.array(y2)})
    out2 = (target_encode_oof(rd.from_arrow(t2), "c", "y", "i",
                              n_folds=5, m=10.0)
            .to_pandas().sort_values("i").reset_index(drop=True))
    f0 = folds == 0
    np.testing.assert_array_equal(out.loc[f0, "c_te_oof"].to_numpy(),
                                  out2.loc[f0, "c_te_oof"].to_numpy())
    assert (out.loc[~f0, "c_te_oof"].to_numpy()
            != out2.loc[~f0, "c_te_oof"].to_numpy()).all()


def test_random_projection_vs_numpy(ray_session):
    """proj == X @ S/sqrt(d_out) with the md5-parity sign matrix;
    distance preservation sanity on a planted far pair."""
    import hashlib

    import ray.data as rd

    from netml_ray.mlprep import random_projection

    rng = np.random.default_rng(17)
    n, d_in, d_out = 80, 16, 4
    X = rng.normal(size=(n, d_in)).astype(np.float32)
    t = pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                  "embedding": pa.array(list(X))})
    got = (random_projection(rd.from_arrow(t), "embedding", "vec_id",
                             d_in=d_in, d_out=d_out)
           .to_pandas().sort_values(["vec_id", "j"])
           .reset_index(drop=True))
    S = np.empty((d_in, d_out))
    for i in range(d_in):
        for j in range(d_out):
            h = int(hashlib.md5(f"{i}_{j}".encode()).hexdigest()[:15],
                    16)
            S[i, j] = 1.0 if h % 2 == 0 else -1.0
    exp = (X.astype(np.float64) @ S) / np.sqrt(d_out)
    np.testing.assert_allclose(got["proj"].to_numpy(),
                               exp.reshape(-1), atol=1e-12)
    # wrong declared d_in fails loudly
    import pytest as _pytest

    with _pytest.raises(Exception):
        random_projection(rd.from_arrow(t), "embedding", "vec_id",
                          d_in=d_in + 1, d_out=d_out).materialize()


def test_woe_iv_vs_brute(ray_session):
    import ray.data as rd

    from netml_ray.mlprep import woe_iv

    rng = np.random.default_rng(31)
    n = 6000
    cats = rng.choice(["a", "b", "c", "d", "only0"], n,
                      p=[0.3, 0.3, 0.2, 0.15, 0.05])
    # label depends on category so WOE is non-trivial; 'only0' never 1
    p1 = {"a": 0.7, "b": 0.4, "c": 0.2, "d": 0.5, "only0": 0.0}
    y = (rng.random(n) < np.array([p1[c] for c in cats])).astype(np.int64)
    t = pa.table({"cat": pa.array(cats), "y": pa.array(y)})
    table, iv = woe_iv(rd.from_arrow(t).repartition(6), "cat", "y")
    out = table.to_pandas().set_index("cat")

    df = t.to_pandas()
    t0 = (df["y"] == 0).sum()
    t1 = (df["y"] == 1).sum()
    exp_iv = 0.0
    seen = set()
    for c, g in df.groupby("cat"):
        n0 = (g["y"] == 0).sum()
        n1 = (g["y"] == 1).sum()
        if n0 == 0 or n1 == 0:
            continue
        seen.add(c)
        woe = np.log((n1 / t1) / (n0 / t0))
        assert np.isclose(out.loc[c, "woe"], woe, atol=2e-9)
        assert out.loc[c, "n0"] == n0 and out.loc[c, "n1"] == n1
        exp_iv += (n1 / t1 - n0 / t0) * woe
    assert set(out.index) == seen            # one-sided cat dropped
    assert "only0" not in out.index
    assert np.isclose(iv, exp_iv, atol=2e-9)
    assert iv > 0


def test_gains_table_vs_brute(ray_session):
    import ray.data as rd

    from netml_ray.mlprep import gains_table

    rng = np.random.default_rng(37)
    n = 8000
    score = rng.normal(0, 1, n)
    # positives concentrate at high scores -> lift > 1 in the top bin
    y = (rng.random(n) < 1 / (1 + np.exp(-2 * score))).astype(np.int64)
    t = pa.table({"s": pa.array(score), "y": pa.array(y)})
    out = gains_table(rd.from_arrow(t).repartition(6), "s", "y") \
        .to_pandas()

    edges = np.quantile(score, [i / 10 for i in range(1, 10)])
    b = np.searchsorted(edges, score, side="right")
    en = np.bincount(b, minlength=10)
    ep = np.bincount(b, weights=y, minlength=10).astype(np.int64)
    order = np.arange(9, -1, -1)
    cn = np.cumsum(en[order])
    cp = np.cumsum(ep[order])
    assert (out["bin"].to_numpy() == order).all()
    assert (out["n"].to_numpy() == en[order]).all()
    assert (out["n_pos"].to_numpy() == ep[order]).all()
    assert np.allclose(out["capture"], cp / ep.sum(), atol=2e-9)
    assert np.allclose(out["lift"],
                       (cp / cn) / (ep.sum() / n), atol=2e-9)
    # sanity: top decile captures more than 10% of positives
    assert out.loc[0, "capture"] > 0.15 and out.loc[0, "lift"] > 1.2
    # the full table always ends at capture 1, lift 1
    assert np.isclose(out["capture"].iloc[-1], 1.0)
    assert np.isclose(out["lift"].iloc[-1], 1.0)


def test_profile_table_vs_pandas(ray_session):
    import ray.data as rd

    from netml_ray.mlprep import profile_table

    rng = np.random.default_rng(61)
    n = 3000
    vals = rng.normal(10, 5, n)
    vals[rng.random(n) < 0.1] = np.nan
    t = pa.table({
        "a": pa.array(rng.integers(-5, 100, n)),
        "b": pa.array(vals),
        "s": pa.array(rng.choice(["x", "y", None], n).tolist()),
    })
    out = profile_table(rd.from_arrow(t).repartition(6)).to_pandas() \
        .set_index("column")

    df = t.to_pandas()
    assert (out["n"] == n).all()
    assert out.loc["a", "n_null"] == 0
    assert out.loc["b", "n_null"] == int(df["b"].isna().sum())
    assert out.loc["s", "n_null"] == int(df["s"].isna().sum())
    assert out.loc["a", "vmin"] == df["a"].min()
    assert out.loc["a", "vmax"] == df["a"].max()
    assert np.isclose(out.loc["a", "vmean"], df["a"].mean(), atol=1e-6)
    assert np.isclose(out.loc["b", "vmin"], df["b"].min(skipna=True))
    assert np.isclose(out.loc["b", "vmean"], df["b"].mean(skipna=True),
                      atol=1e-6)
    import pandas as pd
    assert pd.isna(out.loc["s", "vmin"]) and pd.isna(out.loc["s", "vmean"])


def test_group_auc_vs_sklearn_style_brute(ray_session):
    import ray.data as rd

    from netml_ray.mlprep import group_auc

    rng = np.random.default_rng(83)
    n = 6000
    g = rng.choice(["a", "b", "c"], n)
    # per-group signal strength differs; integer scores force ties
    strength = {"a": 2.0, "b": 0.5, "c": 0.0}
    y = rng.integers(0, 2, n)
    s = np.array([strength[gi] for gi in g]) * y \
        + rng.integers(0, 8, n).astype(np.float64)
    t = pa.table({"g": pa.array(g), "s": pa.array(s),
                  "y": pa.array(y.astype(np.int64))})
    out = group_auc(rd.from_arrow(t).repartition(6), "g", "s", "y") \
        .to_pandas().set_index("g").sort_index()

    import pandas as pd
    df = t.to_pandas()
    for gi, sub in df.groupby("g"):
        rk = pd.Series(sub["s"]).rank(method="average").to_numpy()
        n1 = sub["y"].sum()
        n0 = len(sub) - n1
        auc = (rk[sub["y"].to_numpy() == 1].sum()
               - n1 * (n1 + 1) / 2) / (n1 * n0)
        assert np.isclose(out.loc[gi, "auc"], auc, atol=2e-6)
        assert out.loc[gi, "n_pos"] == n1 and out.loc[gi, "n_neg"] == n0
    # direction: stronger signal -> higher AUC; no signal ~ 0.5
    assert out.loc["a", "auc"] > out.loc["b", "auc"] > 0.5
    assert abs(out.loc["c", "auc"] - 0.5) < 0.05


def test_group_auc_single_class_dropped(ray_session):
    import ray.data as rd

    from netml_ray.mlprep import group_auc

    t = pa.table({"g": pa.array(["x", "x", "z", "z"]),
                  "s": pa.array([1.0, 2.0, 1.0, 2.0]),
                  "y": pa.array([1, 1, 0, 1])})
    out = group_auc(rd.from_arrow(t), "g", "s", "y").to_pandas()
    assert set(out["g"]) == {"z"}
    assert np.isclose(out.loc[0, "auc"], 1.0)


def test_temporal_split_vs_brute(ray_session):
    """Per-key temporal holdout: first ceil(0.8 n) rows train, rest
    test; every test ts >= every train ts of its key; exact counts
    for the ceil boundary cases n=1..5."""
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.mlprep import temporal_split

    rng = np.random.default_rng(8)
    n = 4000
    t = pa.table({
        "k": pa.array(rng.integers(0, 70, n)),
        "ts": pa.array(rng.integers(0, 10**9, n), type=pa.int64()),
        "i": pa.array(np.arange(n, dtype=np.int64)),
    })
    # tiny keys for the ceil boundary: sizes 1..5
    extra = pa.table({
        "k": pa.array([100, 101, 101, 102, 102, 102, 103, 103, 103,
                       103, 104, 104, 104, 104, 104], type=pa.int64()),
        "ts": pa.array(range(15), type=pa.int64()),
        "i": pa.array(range(90000, 90015), type=pa.int64()),
    })
    t = pa.concat_tables([t, extra])
    out = (temporal_split(rd.from_arrow(t).repartition(7), "k", "ts",
                          test_frac=0.2, tiebreak="i")
           .to_pandas())
    pdf = t.to_pandas().sort_values(["k", "ts", "i"])
    for k, sub in pdf.groupby("k"):
        m = len(sub)
        n_train = int(np.ceil(0.8 * m))
        folds = out.set_index("i").loc[sub["i"], "fold"].tolist()
        assert folds == ["train"] * n_train + ["test"] * (m - n_train)
    # n=1..5 -> train counts 1,2,3,4,4
    for k, exp_train in [(100, 1), (101, 2), (102, 3), (103, 4),
                         (104, 4)]:
        got_train = out[(out["k"] == k) & (out["fold"] == "train")]
        assert len(got_train) == exp_train


def test_prop_ztest_reference(ray_session):
    """Pooled two-proportion z == the closed-form reference; planted
    rate difference gives the right sign; empty group raises."""
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.mlprep import prop_ztest

    rng = np.random.default_rng(15)
    n = 20000
    grp = np.where(rng.random(n) < 0.5, "a", "b")
    p = np.where(grp == "a", 0.30, 0.25)
    suc = rng.random(n) < p
    t = pa.table({"g": pa.array(grp), "s": pa.array(suc)})
    out = prop_ztest(rd.from_arrow(t).repartition(6), "g", "s",
                     "a", "b").to_pandas().iloc[0]
    na = int((grp == "a").sum()); ka = int(suc[grp == "a"].sum())
    nb = int((grp == "b").sum()); kb = int(suc[grp == "b"].sum())
    pool = (ka + kb) / (na + nb)
    z = (ka / na - kb / nb) / np.sqrt(pool * (1 - pool)
                                      * (1 / na + 1 / nb))
    assert out["n_a"] == na and out["k_a"] == ka
    assert out["z"] == round(float(z), 9)
    assert out["z"] > 2          # the planted +5pp difference shows
    with pytest.raises(ValueError, match="no rows"):
        prop_ztest(rd.from_arrow(t), "g", "s", "a", "zzz")


def test_quantize_stats_vs_brute(ray_session):
    """Per-vector quantization error == a numpy brute; error is
    bounded by span/levels per dim and zero for constant dims."""
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.mlprep import quantize_stats

    rng = np.random.default_rng(51)
    n, d = 400, 16
    m = rng.normal(size=(n, d)).astype(np.float32)
    m[:, 3] = 1.25                                 # zero-span dim
    t = pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                  "embedding": pa.array(list(m))})
    out = quantize_stats(rd.from_arrow(t).repartition(4), "embedding") \
        .to_pandas().set_index("vec_id").sort_index()

    x = m.astype(np.float64)
    lo, hi = x.min(axis=0), x.max(axis=0)
    span = hi - lo
    with np.errstate(divide="ignore", invalid="ignore"):
        q = np.floor((x - lo) / span * 255)
    q = np.where(span == 0, 0.0, np.clip(q, 0, 255))
    err = np.abs(x - (lo + (q * span) / 255))
    assert np.allclose(out["max_abs_err"], err.max(axis=1), atol=1e-8)
    assert np.allclose(out["mean_abs_err"], err.mean(axis=1), atol=1e-8)
    # bound: one quantization step per dim
    assert (err.max(axis=0) <= span / 255 + 1e-12).all()
    assert (err[:, 3] == 0).all()


def test_cohens_kappa_vs_brute(ray_session):
    """κ == the closed form on the confusion counts; perfect agreement
    → 1, independent raters → ≈ 0."""
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.mlprep import cohens_kappa

    rng = np.random.default_rng(71)
    n = 8_000
    a = rng.random(n) < 0.4
    b = np.where(rng.random(n) < 0.8, a, rng.random(n) < 0.4)
    t = pa.table({"a": pa.array(a), "b": pa.array(b)})
    out = cohens_kappa(rd.from_arrow(t).repartition(5), "a", "b") \
        .to_pandas().iloc[0]
    tt = int(np.sum(a & b)); tf = int(np.sum(a & ~b))
    ft = int(np.sum(~a & b)); ff = int(np.sum(~a & ~b))
    po = (tt + ff) / n
    pe = ((tt + tf) * (tt + ft) + (ft + ff) * (tf + ff)) / (n * n)
    assert out["n"] == n
    assert abs(out["p_o"] - po) < 1e-9
    assert abs(out["kappa"] - (po - pe) / (1 - pe)) < 1e-8

    perfect = cohens_kappa(rd.from_arrow(pa.table(
        {"a": pa.array(a), "b": pa.array(a)})), "a", "b") \
        .to_pandas().iloc[0]
    assert perfect["kappa"] == 1.0


def test_dense_ids_contiguous_sorted(ray_session):
    """dense_ids: idx is a 0..n-1 permutation following global key
    order, stable across repartitioning, string keys included."""
    import ray.data as rd

    from netml_ray.mlprep import dense_ids

    rng = np.random.default_rng(5)
    keys = rng.integers(0, 1000, 20_000)
    t = pa.table({"k": pa.array(keys)})
    out = dense_ids(rd.from_arrow(t).repartition(7), "k") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    uniq = np.unique(keys)
    assert len(out) == len(uniq)
    assert (out["k"].to_numpy() == uniq).all()
    assert (out["idx"].to_numpy() == np.arange(len(uniq))).all()

    s = pa.table({"k": pa.array(["b", "a", "c", "a", "b"])})
    so = dense_ids(rd.from_arrow(s), "k").to_pandas() \
        .sort_values("idx").reset_index(drop=True)
    assert list(so["k"]) == ["a", "b", "c"]
    assert list(so["idx"]) == [0, 1, 2]


def test_negative_samples_properties(ray_session):
    """negatives are in 1..n, never equal the positive, k per row,
    deterministic across runs and repartitioning."""
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.mlprep import negative_samples

    rng = np.random.default_rng(8)
    n_rows, n_items = 3_000, 200
    t = pa.table({
        "a": pa.array(rng.integers(0, 10_000, n_rows)),
        "b": pa.array(np.arange(n_rows, dtype=np.int64)),
        "item": pa.array(rng.integers(1, n_items + 1, n_rows))})
    out = negative_samples(rd.from_arrow(t), ["a", "b"], "item",
                           n_items, k=3).to_pandas()
    assert len(out) == 3 * n_rows
    assert out["neg"].between(1, n_items).all()
    assert (out["neg"] != out["pos"]).all()
    assert out.groupby(["a", "b"]).size().eq(3).all()

    again = negative_samples(rd.from_arrow(t).repartition(6),
                             ["a", "b"], "item", n_items,
                             k=3).to_pandas()
    key = ["a", "b", "j"]
    assert out.sort_values(key).reset_index(drop=True) \
        .equals(again.sort_values(key).reset_index(drop=True))


def test_kcenter_select_vs_brute(ray_session):
    """farthest-first selection matches a brute greedy walk and the
    covering radius is non-increasing."""
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.mlprep import kcenter_select

    rng = np.random.default_rng(23)
    n, d, k = 400, 8, 5
    m = rng.normal(size=(n, d))
    ids = rng.permutation(n).astype(np.int64)
    offs = np.arange(n + 1, dtype=np.int64) * d
    t = pa.table({
        "vec_id": pa.array(ids),
        "v": pa.ListArray.from_arrays(pa.array(offs),
                                      pa.array(m.ravel()))})
    out = kcenter_select(rd.from_arrow(t).repartition(4),
                         "vec_id", "v", k).to_pandas()
    # brute greedy with the same rounding/tie rules
    order = np.argsort(ids)
    centers = [m[order[0]]]
    sel = [ids[order[0]]]
    dist = [0.0]
    for _ in range(1, k):
        dmin = np.min(np.round(np.sqrt(
            ((m[:, None, :] - np.asarray(centers)[None]) ** 2)
            .sum(-1)), 9), axis=1)
        best = np.lexsort((ids, -dmin))[0]
        centers.append(m[best])
        sel.append(ids[best])
        dist.append(float(dmin[best]))
    assert list(out["vec_id"]) == [int(s) for s in sel]
    assert np.allclose(out["dist"], dist)
    assert (np.diff(out["dist"][1:]) <= 1e-12).all()


def test_incremental_state_equals_full(ray_session):
    """state(old) ⊕ state(delta) == state(old ∪ delta) — the
    incremental-pipeline monoid contract — and matches a pandas
    groupby recompute."""
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.mlprep import group_agg_state, merge_agg_states

    rng = np.random.default_rng(14)
    n = 6_000
    t = pa.table({
        "k": pa.array(rng.integers(0, 150, n)),
        "v": pa.array(rng.normal(size=n).round(4))})
    full = group_agg_state(rd.from_arrow(t), "k", "v").to_pandas()
    a, b = t.slice(0, 2500), t.slice(2500)
    merged = merge_agg_states(
        [group_agg_state(rd.from_arrow(a), "k", "v"),
         group_agg_state(rd.from_arrow(b), "k", "v")],
        "k").to_pandas()
    full = full.sort_values("k").reset_index(drop=True)
    merged = merged.sort_values("k").reset_index(drop=True)
    assert (full["n"] == merged["n"]).all()
    assert np.allclose(full["s"], merged["s"])
    assert (full["mn"] == merged["mn"]).all()
    assert (full["mx"] == merged["mx"]).all()

    ref = t.to_pandas().groupby("k")["v"] \
        .agg(["count", "sum", "min", "max"]).reset_index()
    assert (full["n"].to_numpy() == ref["count"].to_numpy()).all()
    assert np.allclose(full["s"], ref["sum"])
    assert (full["mn"].to_numpy() == ref["min"].to_numpy()).all()
    assert (full["mx"].to_numpy() == ref["max"].to_numpy()).all()
