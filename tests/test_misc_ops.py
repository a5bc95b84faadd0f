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
