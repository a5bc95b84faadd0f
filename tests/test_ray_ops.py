"""Distributed operators vs the oracle, via real Ray Data execution."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from netml_ray import oracle
from netml_ray.asof import asof_join
from netml_ray.corpus import gen_corpus
from netml_ray.features import session_features
from netml_ray.sessionize import (
    SESSION,
    TS_SEC,
    netml_session_pipeline,
    sessionize_netml,
    sessionize_simple,
)
from netml_ray.textops import ExtractText, extract_text_one
from tests.test_kernels import make_keyed_data


@pytest.fixture(scope="module")
def corpus_df():
    t = gen_corpus(4000, seed=7)
    df = t.to_pandas()
    df["ts_f"] = t["warc_ts"].cast(pa.int64()).to_numpy() / 1e6
    df["size"] = [len(h) for h in df["html"]]
    return t, df


def _ds_from_df(df, cols):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df[cols], preserve_index=False))


def test_corpus_shape(corpus_df):
    t, df = corpus_df
    assert len(df) == 4000
    counts = df.groupby("url").size()
    assert counts.max() >= 0.18 * len(df)  # hot url
    assert (counts == 1).sum() >= 1  # singletons
    assert df.groupby("url")["ts_f"].apply(lambda s: s.duplicated().any()).any()


def test_extract_byte_identical(corpus_df, ray_session):
    import ray.data as rd

    t, df = corpus_df
    ds = rd.from_arrow(t.select(["url", "warc_ts", "html", "text"]))
    ds = ds.map_batches(
        ExtractText(html_col="html", out_col="extracted", drop_html=True),
        batch_format="pyarrow",
        batch_size=512,
    )
    out = ds.to_pandas()
    # byte-identical to the ground-truth text column, every row
    assert (out["extracted"] == out["text"]).all()
    assert (out["size"] == df.sort_values(["warc_ts"])["size"].to_numpy()).sum() >= 0  # size present


def test_extract_unit():
    html = b"<html><body><p class='x'>a&amp;b</p>\n  <b>x&lt;y&gt;z</b>  ok</body></html>"
    assert extract_text_one(html) == "a&b x<y>z ok"
    assert extract_text_one(b"<html><body></body></html>") == ""


def test_sessionize_simple_vs_pandas(ray_session):
    df = make_keyed_data(seed=13)
    df = df.rename(columns={"key": "url", "ts": "tsv"})
    df["rid"] = np.arange(len(df))
    ds = _ds_from_df(df, ["url", "tsv", "size", "rid"])
    out = sessionize_simple(ds, key="url", ts_col="tsv", gap=600.0, tiebreak="rid", num_partitions=8).to_pandas()
    assert len(out) == len(df)
    exp = df.sort_values(["url", "tsv", "rid"], kind="stable")
    exp_sid = exp.groupby("url")["tsv"].transform(lambda s: (s.diff() > 600.0).fillna(False).cumsum())
    got = out.set_index("rid")[SESSION]
    assert (got.loc[exp["rid"]].to_numpy() == exp_sid.to_numpy()).all()


def test_sessionize_netml_vs_oracle(ray_session):
    df = make_keyed_data(seed=17, n_keys=30)
    df = df.rename(columns={"key": "url", "ts": "tsv"})
    ds = _ds_from_df(df, ["url", "tsv", "size"])
    out = sessionize_netml(ds, key="url", ts_col="tsv", gap=600.0, num_partitions=8).to_pandas()
    exp_flows = oracle.gap_sessionize(
        oracle.df_to_flows(df.rename(columns={"url": "key", "tsv": "ts"}), "key", "ts", "size"), 600.0, 2
    )
    got = sorted(
        (k, tuple(g[TS_SEC])) for (k, s), g in out.sort_values([TS_SEC]).groupby(["url", SESSION])
    )
    exp = sorted((k, tuple(t)) for k, t, s in exp_flows)
    assert got == exp


def test_full_pipeline_and_features_vs_oracle(corpus_df, ray_session):
    import ray.data as rd

    t, df = corpus_df
    ds = rd.from_arrow(t.select(["url", "warc_ts", "html"]))
    ds = ds.map_batches(ExtractText(), batch_format="pyarrow", batch_size=512)
    sessions, interval = netml_session_pipeline(
        ds, key="url", ts_col="warc_ts", gap=600.0, q_interval=0.9, num_partitions=8
    )
    sessions = sessions.materialize()

    odf = df.rename(columns={"url": "key", "ts_f": "ts"})
    exp_flows, exp_interval = oracle.netml_sessionize(odf, "key", "ts", "size", gap=600.0, q_interval=0.9)
    assert interval == pytest.approx(exp_interval, rel=1e-12)

    sdf = sessions.to_pandas()
    got = sorted(
        (k, tuple(g.sort_values(TS_SEC)[TS_SEC])) for (k, s), g in sdf.groupby(["url", SESSION])
    )
    exp = sorted((k, tuple(ts)) for k, ts, _ in exp_flows)
    assert got == exp

    oflows = sorted(exp_flows, key=lambda f: (f[0], f[1][0], tuple(f[1])))
    for feat_type in ["IAT", "SIZE", "IAT_SIZE", "STATS", "SAMP_NUM", "SAMP_SIZE"]:
        feats_ds, meta = session_features(
            sessions, feat_type, key="url", q_interval=0.9, num_partitions=8
        )
        fdf = feats_ds.to_pandas().sort_values(["url", "start_sec"]).reset_index(drop=True)
        exp_mat, exp_keys, exp_dim = oracle.flows2features(oflows, feat_type, 0.9)
        assert meta.width == exp_dim
        got_mat = np.vstack(fdf["features"].to_numpy())
        assert got_mat.shape == exp_mat.shape
        assert list(fdf["url"]) == [k for k, _, _ in oflows]
        np.testing.assert_allclose(got_mat, exp_mat, rtol=1e-9, atol=1e-12, err_msg=feat_type)

    # FFT variant
    feats_ds, meta = session_features(sessions, "IAT", key="url", q_interval=0.9, fft=True, num_partitions=8)
    fdf = feats_ds.to_pandas().sort_values(["url", "start_sec"]).reset_index(drop=True)
    exp_mat, _, _ = oracle.flows2features(oflows, "IAT", 0.9, fft=True)
    np.testing.assert_allclose(np.vstack(fdf["features"].to_numpy()), exp_mat, rtol=1e-9, atol=1e-9)


def test_asof_join_vs_oracle(ray_session):
    rng = np.random.default_rng(4)
    n_l, n_r = 300, 120
    keys = [f"u{i}" for i in range(12)]
    left = pd.DataFrame(
        {
            "url": rng.choice(keys, n_l),
            "ts": rng.uniform(0, 1000, n_l).round(1),
            "event_id": np.arange(n_l),
        }
    )
    right = pd.DataFrame(
        {
            "url": rng.choice(keys[:10], n_r),  # some keys have no state
            "state_ts": rng.uniform(0, 1000, n_r).round(1),
            "value": rng.normal(size=n_r).round(4),
        }
    )
    # inject exact-tie timestamps
    right.loc[5, ["url", "state_ts"]] = [left.loc[0, "url"], left.loc[0, "ts"]]
    lds = _ds_from_df(left, ["url", "ts", "event_id"])
    rds = _ds_from_df(right, ["url", "state_ts", "value"])

    for strict in (False, True):
        out = asof_join(
            lds, rds, key="url", left_ts="ts", right_ts="state_ts",
            strict=strict, left_tiebreak="event_id", num_partitions=6,
        ).to_pandas().sort_values("event_id").reset_index(drop=True)
        r_sorted = right.sort_values(["url", "state_ts"], kind="stable").reset_index(drop=True)
        exp_idx = oracle.asof_expected(
            left.sort_values("event_id"), r_sorted, "url", "ts", "state_ts", strict=strict
        )
        exp_val = [None if i is None else r_sorted.loc[i, "value"] for i in exp_idx]
        got_val = out["value"].tolist()
        for g, e in zip(got_val, exp_val):
            if e is None:
                assert g is None or (isinstance(g, float) and np.isnan(g))
            else:
                assert g == pytest.approx(e)
        # zero-leakage property
        ok = out["state_ts"].notna()
        if strict:
            assert (out.loc[ok, "state_ts"] < out.loc[ok, "ts"]).all()
        else:
            assert (out.loc[ok, "state_ts"] <= out.loc[ok, "ts"]).all()


def test_fingerprint_rolling_hash_matches_horner(ray_session):
    """The vectorized Rabin-Karp segment hash equals the per-byte
    Horner recurrence (h = h*B + b mod 2^64), incl. empty and unicode
    docs."""
    from netml_ray.textops import (_rolling_hash_segments, _utf8_segments,
                                   fingerprint_batch)

    texts = ["", "a", "hello world", "héllo wörld ünïcode", "x" * 10_000,
             "the quick brown fox", "", "　wide ws"]
    t = pa.table({"doc_id": pa.array(range(len(texts))),
                  "text": pa.array(texts, type=pa.string())})
    data, offs = _utf8_segments(t["text"])
    got = _rolling_hash_segments(data, offs)
    B = 1099511628211
    for i, s in enumerate(texts):
        h = 0
        for byt in s.encode("utf-8"):
            h = (h * B + byt) % (1 << 64)
        assert int(got[i]) == h, s
    # the batch op wires both columns
    out = fingerprint_batch(t)
    assert out["text_sha1"][0].as_py() == __import__("hashlib").sha1(b"").hexdigest()
    # identical texts -> identical fingerprints; distinct -> distinct here
    assert out["fingerprint"][0].as_py() == out["fingerprint"][6].as_py()
    assert len(set(out["fingerprint"].to_pylist())) == len(texts) - 1


def test_fingerprint_large_string_offsets(ray_session):
    """64-bit-offset (large_string) columns hash identically to their
    32-bit counterparts (ADVICE r2: offset-width handling)."""
    from netml_ray.textops import fingerprint_batch

    texts = ["abc", "", "déf ghi"]
    small = pa.table({"text": pa.array(texts, type=pa.string())})
    large = pa.table({"text": pa.array(texts, type=pa.large_string())})
    a = fingerprint_batch(small)["fingerprint"].to_pylist()
    b = fingerprint_batch(large)["fingerprint"].to_pylist()
    assert a == b


def test_add_fill_matches_pandas(ray_session):
    """Per-key ffill/bfill (north_rule 'backfill') vs the pandas
    groupby ffill/bfill oracle, floats and strings, including keys
    whose values are ALL null."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.windows import add_fill

    rng = np.random.default_rng(11)
    n = 3000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 40, n),
        "ts": np.sort(rng.uniform(0, 1000, n)),
        "event_id": np.arange(n, dtype=np.int64),
        "value": rng.normal(size=n).round(3),
        "etype": rng.choice(["x", "y", "z"], n).astype(object),
    })
    df.loc[df.event_id % 4 == 0, "value"] = np.nan
    df.loc[df.event_id % 6 == 0, "etype"] = None
    df.loc[df.user_id == 7, "value"] = np.nan   # an all-null key

    out = add_fill(rd.from_arrow(pa.Table.from_pandas(df)),
                   "user_id", "ts", ["value", "etype"],
                   directions=("forward", "backward"),
                   tiebreak="event_id").to_pandas()
    out = out.sort_values("event_id").reset_index(drop=True)

    g = df.sort_values(["user_id", "ts", "event_id"]).groupby("user_id")
    exp = df.sort_values(["user_id", "ts", "event_id"]).assign(
        value_ffill=g["value"].ffill(), value_bfill=g["value"].bfill(),
        etype_ffill=g["etype"].ffill(), etype_bfill=g["etype"].bfill(),
    ).sort_values("event_id").reset_index(drop=True)
    for c in ("value_ffill", "value_bfill"):
        np.testing.assert_allclose(out[c].to_numpy(), exp[c].to_numpy())
    for c in ("etype_ffill", "etype_bfill"):
        assert out[c].fillna("∅").tolist() == exp[c].fillna("∅").tolist()


def test_resample_ffill_matches_pandas(ray_session):
    """resample_ffill vs a pandas merge_asof-per-key oracle: grid from
    ceil(first/step) to last, latest value at-or-before each grid
    point, ties resolved to max tiebreak."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.windows import resample_ffill

    rng = np.random.default_rng(23)
    n = 2000
    step = 50.0
    df = pd.DataFrame({
        "user_id": rng.integers(0, 25, n),
        "ts": pd.to_datetime(
            rng.integers(0, 3_000_000_000, n), unit="us"),
        "event_id": np.arange(n, dtype=np.int64),
        "value": rng.normal(size=n).round(3),
    })
    # force (key, ts) ties so the tiebreak path is exercised
    df.loc[1::7, "ts"] = df["ts"].iloc[0::7].values[: len(df.loc[1::7])]

    out = resample_ffill(rd.from_arrow(pa.Table.from_pandas(df)),
                         "user_id", "ts", ["value"],
                         step_sec=step, tiebreak="event_id").to_pandas()
    out = out.sort_values(["user_id", "grid_ts"]).reset_index(drop=True)

    step_us = int(step * 1e6)
    rows = []
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        tus = g["ts"].astype("int64").to_numpy()
        lo = -(-tus.min() // step_us) * step_us
        grid = np.arange(lo, tus.max() + 1, step_us)
        idx = np.searchsorted(tus, grid, side="right") - 1
        for gt, i in zip(grid, idx):
            rows.append((uid, pd.Timestamp(gt, unit="us"),
                         g["value"].iloc[i]))
    exp = (pd.DataFrame(rows, columns=["user_id", "grid_ts",
                                       "value_ffill"])
           .sort_values(["user_id", "grid_ts"]).reset_index(drop=True))
    assert len(out) == len(exp)
    assert (out["user_id"].to_numpy() == exp["user_id"].to_numpy()).all()
    assert (out["grid_ts"].to_numpy() == exp["grid_ts"].to_numpy()).all()
    np.testing.assert_allclose(out["value_ffill"].to_numpy(),
                               exp["value_ffill"].to_numpy())


def test_add_ewma_matches_pandas(ray_session):
    """Per-key EWMA == pandas groupby.ewm(adjust=True) on the
    (ts, tiebreak)-sorted frame, partition-invariant."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.windows import add_ewma

    rng = np.random.default_rng(23)
    n = 3000
    t = pa.table({
        "k": pa.array(rng.integers(0, 60, n)),
        "ts": pa.array(rng.uniform(0, 1e6, n).round(3)),
        "i": pa.array(np.arange(n, dtype=np.int64)),
        "v": pa.array(rng.normal(5, 2, n)),
    })
    pdf = t.to_pandas().sort_values(["k", "ts", "i"])
    exp = (pdf.groupby("k", sort=False)["v"]
           .ewm(alpha=0.2, adjust=True).mean()
           .reset_index(level=0, drop=True))
    pdf["want"] = exp
    want = pdf.sort_values("i")["want"].to_numpy()
    for parts in (1, 7):
        out = (add_ewma(rd.from_arrow(t).repartition(parts),
                        "k", "ts", "v", alpha=0.2, tiebreak="i")
               .to_pandas().sort_values("i"))
        np.testing.assert_allclose(out["v_ewm"].to_numpy(),
                                   np.round(want, 9), atol=2e-9)


def test_interpolate_time_matches_pandas(ray_session):
    """Per-key time-weighted linear interpolation vs the pandas
    per-group oracle (interpolate(method='index') restricted to
    interior holes), including an all-null key, leading/trailing
    holes, and tied-timestamp gaps (stay null)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.windows import interpolate_time

    rng = np.random.default_rng(12)
    n = 3000
    ts_us = np.sort(rng.integers(0, 10**9, n)).astype(np.int64)
    df = pd.DataFrame({
        "user_id": rng.integers(0, 40, n),
        "ts": ts_us,
        "event_id": np.arange(n, dtype=np.int64),
        "value": rng.normal(size=n).round(3),
    })
    df.loc[df.event_id % 3 == 0, "value"] = np.nan
    df.loc[df.user_id == 5, "value"] = np.nan   # all-null key

    out = interpolate_time(
        rd.from_arrow(pa.Table.from_pandas(df)), "user_id", "ts",
        "value", tiebreak="event_id").to_pandas() \
        .sort_values("event_id").reset_index(drop=True)

    s = df.sort_values(["user_id", "ts", "event_id"])
    exp_parts = []
    for k, g in s.groupby("user_id"):
        gi = g.set_index(pd.Index(g.ts.to_numpy().astype(float)))
        interp = gi["value"].interpolate(
            method="index", limit_area="inside").to_numpy()
        exp_parts.append(pd.DataFrame({
            "event_id": g.event_id.to_numpy(), "exp": interp}))
    exp = (pd.concat(exp_parts).sort_values("event_id")
           .reset_index(drop=True))
    got = out["value_interp"].to_numpy()
    want = np.round(exp["exp"].to_numpy(), 9)
    both_nan = np.isnan(got) & np.isnan(want)
    assert (both_nan | np.isclose(got, want, atol=1e-9,
                                  equal_nan=False)).all()
    # filled flag: was-null rows that got a value
    was_null = df.sort_values("event_id")["value"].isna().to_numpy()
    assert (out["filled"].to_numpy()
            == (was_null & ~np.isnan(got))).all()
