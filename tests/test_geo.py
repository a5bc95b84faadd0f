"""geo.py: nearest-POI + grid density vs brute references."""

import math

import numpy as np
import pyarrow as pa
import pytest


def _haversine_km(lat1, lon1, lat2, lon2):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp = math.radians((lat2 - lat1) / 2)
    dl = math.radians((lon2 - lon1) / 2)
    h = math.sin(dp) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl) ** 2
    return 2 * 6371.0 * math.asin(math.sqrt(h))


def test_synth_latlon_bounds():
    from netml_ray.geo import synth_latlon

    k = np.arange(10_000, dtype=np.int64)
    lat, lon = synth_latlon(k)
    assert lat.min() >= -90 and lat.max() < 90
    assert lon.min() >= -180 and lon.max() < 180
    # deterministic
    lat2, _ = synth_latlon(k.copy())
    assert (lat == lat2).all()


def test_nearest_poi_vs_brute(ray_session):
    import ray.data as rd

    from netml_ray.geo import DEFAULT_POIS, nearest_poi, synth_latlon

    rng = np.random.default_rng(31)
    keys = rng.integers(0, 500, 4_000)
    t = pa.table({"user_id": pa.array(keys)})
    out = nearest_poi(rd.from_arrow(t).repartition(5), "user_id") \
        .to_pandas().set_index("user_id")
    uk = np.unique(keys)
    assert len(out) == len(uk)
    lat, lon = synth_latlon(uk)
    for i, k in enumerate(uk):
        dists = [(_haversine_km(lat[i], lon[i], plat, plon), pid)
                 for pid, plat, plon in DEFAULT_POIS]
        best = min(dists)
        assert out.loc[k, "poi_id"] == best[1]
        assert abs(out.loc[k, "dist_km"] - best[0]) < 1e-3


def test_grid_stats_vs_pandas(ray_session):
    import ray.data as rd

    from netml_ray.geo import grid_stats, synth_latlon

    rng = np.random.default_rng(32)
    n = 6_000
    keys = rng.integers(0, 400, n)
    val = rng.normal(size=n).round(3)
    t = pa.table({"user_id": pa.array(keys), "value": pa.array(val)})
    out = grid_stats(rd.from_arrow(t).repartition(4), "user_id",
                     "value").to_pandas()
    lat, lon = synth_latlon(keys)
    import pandas as pd

    df = pd.DataFrame({
        "cy": np.floor((lat + 90.0) / 5.0).astype(np.int64),
        "cx": np.floor((lon + 180.0) / 5.0).astype(np.int64),
        "user_id": keys, "value": val})
    ref = df.groupby(["cy", "cx"]).agg(
        n_events=("value", "size"),
        n_users=("user_id", "nunique"),
        value_sum=("value", "sum")).reset_index()
    merged = out.merge(ref, left_on=["cell_lat", "cell_lon"],
                       right_on=["cy", "cx"], suffixes=("", "_ref"))
    assert len(merged) == len(ref) == len(out)
    assert (merged["n_events"] == merged["n_events_ref"]).all()
    assert (merged["n_users"] == merged["n_users_ref"]).all()
    assert np.allclose(merged["value_sum"], merged["value_sum_ref"],
                       atol=1e-6)
