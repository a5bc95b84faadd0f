"""Fused flagship pipeline vs oracle + checkpoint/resume semantics."""

import glob
import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from netml_ray import oracle
from netml_ray.checkpoint import (
    checkpointed_partition_map,
    completed_partitions,
    read_checkpointed,
)
from netml_ray.corpus import corpus_path
from netml_ray.pipeline import crawl_feature_pipeline


@pytest.fixture(scope="module")
def corpus_file():
    return corpus_path(4000, seed=7, cache_dir="/tmp/netml_ray_test_corpus")


def _oracle_expected(path):
    import pyarrow.parquet as pq

    t = pq.read_table(path)
    df = t.to_pandas()
    df["ts"] = t["warc_ts"].cast(pa.int64()).to_numpy() / 1e6
    df["size"] = [len(h) for h in df["html"]]
    flows, interval = oracle.netml_sessionize(
        df.rename(columns={"url": "key"}), "key", "ts", "size", gap=600.0, q_interval=0.9
    )
    oflows = sorted(flows, key=lambda f: (f[0], f[1][0]))
    mat, keys, dim = oracle.flows2features(oflows, "STATS", 0.9)
    # per url: session end times ascending + feature rows
    by_url: dict = {}
    for i, (k, ts_arr, _) in enumerate(oflows):
        by_url.setdefault(k, []).append((ts_arr[-1], i))
    exp = {}
    for idx, row in df.iterrows():
        lst = by_url.get(row["url"], [])
        best = None
        for end, i in lst:
            if end <= row["ts"] and (best is None or end > best[0]):
                best = (end, i)
        exp[(row["url"], row["warc_ts"])] = best and (best[0], mat[best[1]])
    return exp, interval


def test_fused_pipeline_matches_oracle_asof(corpus_file, ray_session):
    joined, scalars = crawl_feature_pipeline(corpus_file, feat_type="STATS", num_partitions=8)
    out = joined.to_pandas()
    exp, interval = _oracle_expected(corpus_file)
    assert scalars["interval"] == pytest.approx(interval, rel=1e-12)
    assert len(out) == 4000
    n_matched = 0
    for _, r in out.iterrows():
        e = exp[(r["url"], r["warc_ts"])]
        if e is None:
            assert r["features"] is None or (isinstance(r["state_ts"], float) and np.isnan(r["state_ts"]))
        else:
            n_matched += 1
            assert r["state_ts"] == pytest.approx(e[0], abs=1e-9)
            np.testing.assert_allclose(np.asarray(r["features"]), e[1], rtol=1e-9, atol=1e-12)
    assert n_matched > 100  # corpus guarantees plenty of matched events
    # zero temporal leakage
    ok = out["state_ts"].notna()
    ts_sec = out["warc_ts"].astype("int64") / 1e6
    assert (out.loc[ok, "state_ts"] <= ts_sec[ok] + 1e-9).all()


def _flaky_fn(marker_dir):
    """Partition fn (closure → pickled by value for workers) that fails
    for a subset of partitions while the FAIL marker exists."""

    def _fn(t: pa.Table) -> pa.Table:
        import hashlib
        import os as _os

        import pyarrow.compute as pc

        key0 = t["url"][0].as_py()
        _os.makedirs(marker_dir, exist_ok=True)
        tag = hashlib.sha1(key0.encode()).hexdigest()[:12]
        with open(_os.path.join(marker_dir, f"call_{tag}"), "a") as f:
            f.write("x\n")
        if _os.path.exists(_os.path.join(marker_dir, "FAIL")) and t.num_rows % 3 == 0:
            raise RuntimeError("injected failure")
        return pa.table({"url": t["url"], "n": pc.cast(pc.multiply(t["size"], 2), pa.int64())})

    return _fn


def test_checkpoint_resume(corpus_file, ray_session, tmp_path):
    import ray.data as rd

    out_dir = str(tmp_path / "ckpt")
    marker = str(tmp_path / "marker")

    ds = rd.read_parquet(corpus_file, columns=["url", "warc_ts"])
    import pyarrow.compute as pc

    ds = ds.map_batches(
        lambda t: t.append_column("size", pc.binary_length(pc.cast(t["url"], pa.binary()))),
        batch_format="pyarrow",
    )

    fn = _flaky_fn(marker)
    os.makedirs(marker, exist_ok=True)

    # "killed after K partitions": first run sees only part of the key
    # space (deterministic stand-in for a mid-run kill — what survives a
    # real kill is exactly the set of atomically-completed partitions),
    # plus an injected-failure smoke to exercise the abort path.
    from netml_ray.hashing import pid_for

    import pyarrow.compute as pc

    def _half(t: pa.Table) -> pa.Table:
        import numpy as np

        keep = pid_for(t["url"], 8) < 4
        return t.filter(pa.array(keep))

    open(os.path.join(marker, "FAIL"), "w").close()
    try:
        checkpointed_partition_map(
            ds.map_batches(_half, batch_format="pyarrow"), "url", fn, out_dir,
            num_partitions=8,
        )
    except Exception:
        pass
    os.remove(os.path.join(marker, "FAIL"))
    checkpointed_partition_map(
        ds.map_batches(_half, batch_format="pyarrow"), "url", fn, out_dir,
        num_partitions=8,
    )
    done_first = completed_partitions(out_dir)
    assert 0 < len(done_first) < 8  # partial completion (pids 0..3 only)
    first_ts = {p: rec["ts"] for p, rec in done_first.items()}

    # resume over the FULL input: completed partitions are skipped
    checkpointed_partition_map(ds, "url", fn, out_dir, num_partitions=8)
    done_second = completed_partitions(out_dir)
    assert len(done_second) == 8
    # completed partitions were NOT recomputed (records untouched)
    for p, ts in first_ts.items():
        assert done_second[p]["ts"] == ts

    # output equals a clean run
    clean_dir = str(tmp_path / "clean")
    fn2 = _flaky_fn(str(tmp_path / "m2"))
    checkpointed_partition_map(ds, "url", fn2, clean_dir, num_partitions=8)
    a = read_checkpointed(out_dir).to_pandas().sort_values(["url", "n"]).reset_index(drop=True)
    b = read_checkpointed(clean_dir).to_pandas().sort_values(["url", "n"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    # lineage/metrics recorded
    rec = next(iter(done_second.values()))
    for field in ("rows", "checksum", "wall_s", "env", "input_rows"):
        assert field in rec


def test_resumable_crawl_pipeline(corpus_file, ray_session, tmp_path):
    out_dir = str(tmp_path / "flagship")
    j1, s1 = crawl_feature_pipeline(corpus_file, feat_type="STATS",
                                    num_partitions=8, out_dir=out_dir)
    df1 = j1.to_pandas()
    assert os.path.exists(os.path.join(out_dir, "scalars.json"))
    done = completed_partitions(out_dir)
    assert len(done) > 0
    ts_before = {p: r["ts"] for p, r in done.items()}

    # rerun: everything resumes, nothing recomputed
    j2, s2 = crawl_feature_pipeline(corpus_file, feat_type="STATS",
                                    num_partitions=8, out_dir=out_dir)
    df2 = j2.to_pandas()
    assert s1 == s2
    done2 = completed_partitions(out_dir)
    assert {p: r["ts"] for p, r in done2.items()} == ts_before

    key = ["url", "warc_ts"]
    a = df1.sort_values(key).reset_index(drop=True)
    b = df2.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_checkpoint_manifest_guard(corpus_file, ray_session, tmp_path):
    """Resume under a different partitioning / params must fail loudly
    (not silently mix incompatible hash partitionings)."""
    import ray.data as rd

    out_dir = str(tmp_path / "mguard")
    ds = rd.read_parquet(corpus_file, columns=["url", "warc_ts"])

    def _fn(t: pa.Table) -> pa.Table:
        return pa.table({"url": t["url"]})

    checkpointed_partition_map(ds, "url", _fn, out_dir, num_partitions=4,
                               params={"x": 1})
    # same settings → fine; num_partitions=None adopts the manifest value
    checkpointed_partition_map(ds, "url", _fn, out_dir, num_partitions=None,
                               params={"x": 1})
    with pytest.raises(ValueError, match="num_partitions"):
        checkpointed_partition_map(ds, "url", _fn, out_dir, num_partitions=8,
                                   params={"x": 1})
    with pytest.raises(ValueError, match="params"):
        checkpointed_partition_map(ds, "url", _fn, out_dir, num_partitions=4,
                                   params={"x": 2})
    # pre-manifest layout (partitions but no manifest) is rejected
    os.remove(os.path.join(out_dir, "manifest.json"))
    with pytest.raises(ValueError, match="manifest"):
        checkpointed_partition_map(ds, "url", _fn, out_dir, num_partitions=4,
                                   params={"x": 1})


def test_resumable_pipeline_param_change_refused(corpus_file, ray_session, tmp_path):
    """Changed fft / feat_type etc. must not silently reuse stale
    completed partitions (ADVICE r1)."""
    out_dir = str(tmp_path / "pguard")
    crawl_feature_pipeline(corpus_file, feat_type="STATS",
                           num_partitions=4, out_dir=out_dir)
    with pytest.raises(ValueError, match="incompatible"):
        crawl_feature_pipeline(corpus_file, feat_type="STATS", fft=True,
                               num_partitions=4, out_dir=out_dir)
    with pytest.raises(ValueError, match="incompatible"):
        crawl_feature_pipeline(corpus_file, feat_type="IAT",
                               num_partitions=4, out_dir=out_dir)


def test_hot_salted_flagship_equals_unsalted(corpus_file, ray_session):
    """Fused flagship with hot-key salting (the 20%-hot planted url
    takes the chunked G3-merge + per-G3-session G4 path) must equal the
    plain fused plan row-for-row."""
    plain, s_plain = crawl_feature_pipeline(corpus_file, feat_type="STATS",
                                            num_partitions=8)
    # threshold low enough that the planted hot url (and only it)
    # qualifies; small chunk so the hot key really spans many chunks
    salted, s_salt = crawl_feature_pipeline(
        corpus_file, feat_type="STATS", num_partitions=8,
        hot_threshold=300, hot_chunk=900.0)
    assert s_plain == s_salt

    key = ["url", "warc_ts"]
    a = plain.to_pandas().sort_values(key).reset_index(drop=True)
    b = salted.to_pandas().sort_values(key).reset_index(drop=True)
    assert len(a) == len(b) == 4000
    assert (a["url"] == b["url"]).all()
    np.testing.assert_array_equal(a["state_ts"].isna(), b["state_ts"].isna())
    ok = a["state_ts"].notna()
    np.testing.assert_allclose(a.loc[ok, "state_ts"], b.loc[ok, "state_ts"],
                               rtol=0, atol=0)
    assert (a.loc[ok, "session_id"].astype(int).to_numpy()
            == b.loc[ok, "session_id"].astype(int).to_numpy()).all()
    fa = np.vstack(a.loc[ok, "features"].to_numpy())
    fb = np.vstack(b.loc[ok, "features"].to_numpy())
    np.testing.assert_allclose(fa, fb, rtol=0, atol=0)


def test_hot_salted_flagship_iat_and_samp(corpus_file, ray_session):
    """Same equivalence for a list-shaped and a rate-dependent feature
    type (exercises dim and rate scalars through the hot union)."""
    for ft in ("IAT", "SAMP_NUM"):
        plain, sp = crawl_feature_pipeline(corpus_file, feat_type=ft,
                                           num_partitions=8)
        salted, ss = crawl_feature_pipeline(
            corpus_file, feat_type=ft, num_partitions=8,
            hot_threshold=300, hot_chunk=900.0)
        assert sp == ss, ft
        key = ["url", "warc_ts"]
        a = plain.to_pandas().sort_values(key).reset_index(drop=True)
        b = salted.to_pandas().sort_values(key).reset_index(drop=True)
        np.testing.assert_array_equal(a["state_ts"].isna(), b["state_ts"].isna())
        ok = a["state_ts"].notna()
        fa = np.vstack(a.loc[ok, "features"].to_numpy())
        fb = np.vstack(b.loc[ok, "features"].to_numpy())
        np.testing.assert_allclose(fa, fb, rtol=0, atol=0, err_msg=ft)


def test_resumable_pipeline_partial_resume(corpus_file, ray_session, tmp_path):
    """Delete a few completed partitions (stand-in for a mid-run kill):
    a rerun recomputes ONLY those, leaves the rest untouched, and the
    combined output equals the original run."""
    out_dir = str(tmp_path / "partial")
    j1, s1 = crawl_feature_pipeline(corpus_file, feat_type="STATS",
                                    num_partitions=8, out_dir=out_dir)
    df1 = j1.to_pandas()
    done = completed_partitions(out_dir)
    assert len(done) == 8  # every partition non-empty for this corpus
    ts_before = {p: r["ts"] for p, r in done.items()}
    for p in (1, 4, 6):
        shutil.rmtree(os.path.join(out_dir, f"part={p}"))

    j2, s2 = crawl_feature_pipeline(corpus_file, feat_type="STATS",
                                    num_partitions=8, out_dir=out_dir)
    assert s1 == s2
    done2 = completed_partitions(out_dir)
    assert set(done2) == set(range(8))
    for p, rec in done2.items():
        if p in (1, 4, 6):
            assert rec["ts"] > ts_before[p]  # recomputed
        else:
            assert rec["ts"] == ts_before[p]  # untouched
        # lineage checksums survive the round trip
        assert rec["checksum"] == done[p]["checksum"]

    key = ["url", "warc_ts"]
    a = df1.sort_values(key).reset_index(drop=True)
    b = j2.to_pandas().sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_checkpointed_salted_flagship(corpus_file, ray_session, tmp_path):
    """hot_threshold + out_dir combined (VERDICT r2 #1): bit-equal to
    the plain fused plan; a no-op rerun recomputes nothing; deleting a
    cold AND a hot partition (kill stand-in) recomputes ONLY those."""
    plain, s_plain = crawl_feature_pipeline(corpus_file, feat_type="STATS",
                                            num_partitions=8)
    out_dir = str(tmp_path / "salted_ckpt")
    j1, s1 = crawl_feature_pipeline(
        corpus_file, feat_type="STATS", num_partitions=8, out_dir=out_dir,
        hot_threshold=300, hot_chunk=900.0)
    assert s1 == s_plain
    key = ["url", "warc_ts"]
    a = plain.to_pandas().sort_values(key).reset_index(drop=True)
    b = j1.to_pandas().sort_values(key).reset_index(drop=True)
    assert len(a) == len(b) == 4000
    np.testing.assert_array_equal(a["state_ts"].isna(), b["state_ts"].isna())
    ok = a["state_ts"].notna()
    np.testing.assert_allclose(a.loc[ok, "state_ts"], b.loc[ok, "state_ts"],
                               rtol=0, atol=0)
    assert (a.loc[ok, "session_id"].astype(int).to_numpy()
            == b.loc[ok, "session_id"].astype(int).to_numpy()).all()
    fa = np.vstack(a.loc[ok, "features"].to_numpy())
    fb = np.vstack(b.loc[ok, "features"].to_numpy())
    np.testing.assert_allclose(fa, fb, rtol=0, atol=0)

    done = completed_partitions(out_dir)
    # both sides present: cold fused pids < 8, hot attach pids >= 8
    assert any(p < 8 for p in done) and any(p >= 8 for p in done)
    for f in ("hot_meta.json", os.path.join("hot_state", "_manifest.json"),
              "complete.json", "scalars.json", "manifest.json"):
        assert os.path.exists(os.path.join(out_dir, f)), f
    ts_before = {p: r["ts"] for p, r in done.items()}

    # no-op rerun: nothing recomputed
    j2, s2 = crawl_feature_pipeline(
        corpus_file, feat_type="STATS", num_partitions=8, out_dir=out_dir,
        hot_threshold=300, hot_chunk=900.0)
    assert s2 == s1
    done2 = completed_partitions(out_dir)
    assert {p: r["ts"] for p, r in done2.items()} == ts_before

    # killed-run stand-in: delete one cold and one hot partition; a
    # rerun recomputes ONLY those (lineage checksums survive)
    victims = [min(p for p in done if p < 8), max(p for p in done if p >= 8)]
    for p in victims:
        shutil.rmtree(os.path.join(out_dir, f"part={p}"))
    os.remove(os.path.join(out_dir, "complete.json"))
    j3, s3 = crawl_feature_pipeline(
        corpus_file, feat_type="STATS", num_partitions=8, out_dir=out_dir,
        hot_threshold=300, hot_chunk=900.0)
    assert s3 == s1
    done3 = completed_partitions(out_dir)
    assert set(done3) == set(done)
    for p, rec in done3.items():
        if p in victims:
            assert rec["ts"] > ts_before[p]  # recomputed
            assert rec["checksum"] == done[p]["checksum"]
        else:
            assert rec["ts"] == ts_before[p]  # untouched
    c = j3.to_pandas().sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(b, c)
