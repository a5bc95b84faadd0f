"""Co-partitioned hash join + range (interval) join."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from netml_ray.joins import hash_join, range_join


def _mk(ds_dict):
    import ray.data as rd

    # from_arrow (not from_pandas): partition_map2 needs an Arrow schema
    return rd.from_arrow(pa.Table.from_pandas(pd.DataFrame(ds_dict),
                                              preserve_index=False))


def test_hash_join_matches_pandas(ray_session):
    rng = np.random.default_rng(0)
    left = pd.DataFrame({"k": rng.integers(0, 50, 500),
                         "x": rng.normal(size=500)})
    right = pd.DataFrame({"k": rng.integers(0, 60, 80),
                          "y": rng.normal(size=80)})
    for how in ("inner", "left"):
        got = hash_join(_mk(left), _mk(right), "k", how=how,
                        num_partitions=8).to_pandas()
        exp = left.merge(right, on="k", how=how)
        key = ["k", "x", "y"]
        g = got.sort_values(key).reset_index(drop=True)[key]
        e = exp.sort_values(key).reset_index(drop=True)[key]
        pd.testing.assert_frame_equal(g, e, check_dtype=False)


def test_hash_join_rejects_unknown_how(ray_session):
    with pytest.raises(ValueError):
        hash_join(_mk({"k": [1]}), _mk({"k": [1]}), "k", how="outer")


def test_range_join_matches_bruteforce(ray_session):
    rng = np.random.default_rng(1)
    left = pd.DataFrame({"k": rng.integers(0, 10, 200),
                         "lid": np.arange(200),
                         "t": rng.uniform(0, 1000, 200)})
    right = pd.DataFrame({"k": rng.integers(0, 12, 300),
                          "rid": np.arange(300),
                          "rt": rng.uniform(0, 1000, 300)})
    lo, hi = -50.0, 25.0
    got = range_join(_mk(left), _mk(right), "k", left_ts="t", right_ts="rt",
                     lo=lo, hi=hi, num_partitions=8).to_pandas()
    # brute force
    exp_rows = []
    for _, lrow in left.iterrows():
        m = right[(right["k"] == lrow["k"])
                  & (right["rt"] >= lrow["t"] + lo)
                  & (right["rt"] <= lrow["t"] + hi)]
        for _, rrow in m.iterrows():
            exp_rows.append((lrow["k"], lrow["lid"], rrow["rid"]))
    exp = pd.DataFrame(exp_rows, columns=["k", "lid", "rid"])
    key = ["k", "lid", "rid"]
    g = got.sort_values(key).reset_index(drop=True)[key]
    e = exp.sort_values(key).reset_index(drop=True)[key]
    assert len(g) == len(e) and len(g) > 0
    pd.testing.assert_frame_equal(g, e, check_dtype=False)
