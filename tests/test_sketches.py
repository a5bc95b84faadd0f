"""Exact per-key distinct counts + HyperLogLog accuracy."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from netml_ray.sketches import approx_distinct, count_distinct


def test_count_distinct_matches_pandas(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(4)
    n = 20000
    df = pd.DataFrame({
        "k": rng.choice([f"g{i}" for i in range(30)], size=n),
        "v": rng.integers(0, 500, size=n),
    })
    got = count_distinct(rd.from_pandas(df), "k", "v",
                         num_partitions=8).to_pandas()
    got = got.sort_values("k").reset_index(drop=True)
    exp = (df.groupby("k")["v"].nunique().rename("n_distinct_v")
           .reset_index().sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@pytest.mark.parametrize("true_n", [100, 5000, 200000])
def test_hll_error_bound(ray_session, true_n):
    import ray.data as rd

    vals = np.arange(true_n, dtype=np.int64)
    # duplicates should not move the estimate
    vals = np.concatenate([vals, vals[: true_n // 2]])
    ds = rd.from_arrow(pa.table({"v": pa.array(vals)})).repartition(8)
    est = approx_distinct(ds, "v", p=12)
    assert abs(est - true_n) / true_n < 0.05  # ~1.6% typical at p=12


def test_hll_strings_and_merge_invariance(ray_session):
    import ray.data as rd

    vals = [f"url{i}" for i in range(30000)]
    t = pa.table({"v": pa.array(vals * 2)})
    e1 = approx_distinct(rd.from_arrow(t).repartition(2), "v")
    e2 = approx_distinct(rd.from_arrow(t).repartition(16), "v")
    assert e1 == e2  # register max-merge is partition-invariant
    assert abs(e1 - 30000) / 30000 < 0.05


def test_count_min_bounds(ray_session):
    import ray.data as rd

    from netml_ray.sketches import approx_counts

    rng = np.random.default_rng(17)
    # zipf-ish: key i appears ~ n/(i+1) times
    keys = np.repeat(np.arange(200), (4000 / (np.arange(200) + 1)).astype(int))
    rng.shuffle(keys)
    t = pa.table({"k": pa.array(keys, type=pa.int64())})
    ds = rd.from_arrow(t).repartition(8)
    probe = np.arange(50, dtype=np.int64)
    est = approx_counts(ds, "k", pa.array(probe), width=2048)
    true = np.array([(keys == k).sum() for k in probe])
    assert (est >= true).all()                    # never underestimates
    n = len(keys)
    assert (est - true <= np.e / 2048 * n + 1).all()  # CM error bound
    # heavy hitters are near-exact at this width
    assert est[0] == true[0]


def test_bottomk_sample_partition_invariant(ray_session):
    """The Knuth-hash bottom-k sample is IDENTICAL whatever the block
    layout, and approximate quantiles from it sit within the O(1/sqrt k)
    rank-error band of the exact quantiles."""
    import ray.data as rd

    from netml_ray.sketches import approx_quantiles_sampled, bottomk_sample

    rng = np.random.default_rng(31)
    n, k = 50_000, 2048
    v = rng.lognormal(0.0, 1.0, n)
    t = pa.table({"event_id": pa.array(np.arange(n, dtype=np.int64)),
                  "value": pa.array(v)})
    samples = []
    for width in (1000, 7777, n):
        ds = rd.from_arrow([t.slice(i, width) for i in range(0, n, width)])
        s = bottomk_sample(ds, "value", "event_id", k=k).to_pandas()
        assert len(s) == k
        samples.append(s.reset_index(drop=True))
    for s in samples[1:]:
        pd.testing.assert_frame_equal(samples[0], s)

    qs = [0.1, 0.5, 0.9]
    ds = rd.from_arrow([t.slice(i, 5000) for i in range(0, n, 5000)])
    est = approx_quantiles_sampled(ds, "value", "event_id", qs, k=k)
    # rank-error check: the estimate's true rank is within 4/sqrt(k)
    # of the target quantile (generous band; typical error ~1/sqrt(k))
    sv = np.sort(v)
    for q, e in zip(qs, est):
        rank = np.searchsorted(sv, e) / n
        assert abs(rank - q) < 4 / np.sqrt(k), (q, rank)


def test_bottomk_sample_small_input_returns_all(ray_session):
    import ray.data as rd

    from netml_ray.sketches import bottomk_sample

    t = pa.table({"event_id": pa.array([5, 1, 9], type=pa.int64()),
                  "value": pa.array([1.0, 2.0, 3.0])})
    s = bottomk_sample(rd.from_arrow(t), "value", "event_id",
                       k=100).to_pandas()
    assert len(s) == 3 and set(s["event_id"]) == {1, 5, 9}


def test_top_k_matches_full_sort(ray_session):
    import ray.data as rd

    from netml_ray.sketches import top_k

    rng = np.random.default_rng(7)
    n = 20_000
    t = pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        # heavy ties so the tiebreak column actually decides rows
        "score": pa.array(rng.integers(0, 50, n).astype(np.float64)),
    })
    keys = [("score", "descending"), ("id", "ascending")]
    expect = t.sort_by(keys).slice(0, 25).to_pandas()
    for width in (500, 7777, n):
        ds = rd.from_arrow([t.slice(i, width) for i in range(0, n, width)])
        got = top_k(ds, 25, keys).to_pandas()
        pd.testing.assert_frame_equal(expect.reset_index(drop=True),
                                      got.reset_index(drop=True))


def test_top_k_small_input_returns_all(ray_session):
    import ray.data as rd

    from netml_ray.sketches import top_k

    t = pa.table({"id": pa.array([3, 1, 2], type=pa.int64()),
                  "score": pa.array([1.0, 5.0, 3.0])})
    got = top_k(rd.from_arrow(t), 10,
                [("score", "descending"), ("id", "ascending")])
    assert got["id"].to_pylist() == [1, 2, 3]


def test_group_top_k_matches_window_rank(ray_session):
    """Per-group top-k via block partials == the ROW_NUMBER() window
    route, for any partitioning; ties broken by the unique column."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.sketches import group_top_k

    rng = np.random.default_rng(41)
    n = 5000
    t = pa.table({
        "i": pa.array(np.arange(n, dtype=np.int64)),
        "g": pa.array(rng.choice([f"g{j}" for j in range(12)], n)),
        # few distinct values -> plenty of ties for the tiebreak rule
        "v": pa.array(rng.integers(0, 40, n).astype(np.float64)),
    })
    pdf = t.to_pandas()
    exp = (pdf.sort_values(["g", "v", "i"],
                           ascending=[True, False, True])
           .groupby("g").head(4).reset_index(drop=True))
    for parts in (1, 9):
        out = group_top_k(rd.from_arrow(t).repartition(parts), "g", 4,
                          [("v", "descending"), ("i", "ascending")]
                          ).to_pandas().reset_index(drop=True)
        pd.testing.assert_frame_equal(
            out[["i", "g", "v"]], exp[["i", "g", "v"]],
            check_like=True)


def test_group_top_k_small_groups_return_all(ray_session):
    """Groups smaller than k survive whole."""
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.sketches import group_top_k

    t = pa.table({"g": pa.array(["a", "a", "b"]),
                  "v": pa.array([1.0, 2.0, 5.0]),
                  "i": pa.array([0, 1, 2], type=pa.int64())})
    out = group_top_k(rd.from_arrow(t).repartition(2), "g", 10,
                      [("v", "descending"), ("i", "ascending")])
    assert out.num_rows == 3


def test_histogram_matches_numpy(ray_session):
    """Fixed-width histogram partials == numpy reference with clamped
    edges and dropped NULLs; empty bins present."""
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.sketches import histogram

    rng = np.random.default_rng(61)
    v = rng.uniform(-5, 25, 4000)
    vals = pa.array(np.where(rng.random(4000) < 0.03, np.nan, v),
                    from_pandas=True)
    t = pa.table({"v": vals})
    out = histogram(rd.from_arrow(t).repartition(5), "v",
                    lo=0.0, hi=20.0, nbins=10).to_pandas()
    keep = v[~np.isnan(vals.to_numpy(zero_copy_only=False))]
    bins = np.clip(np.floor(keep / 2.0), 0, 9).astype(int)
    exp = np.bincount(bins, minlength=10)
    np.testing.assert_array_equal(out["n"].to_numpy(), exp)
    np.testing.assert_allclose(out["bin_lo"].to_numpy(),
                               np.arange(10) * 2.0)
    assert out["n"].sum() == len(keep)
