"""Bloom-filter join prefilter: exactness, FPR, join bit-equality."""

import numpy as np
import pandas as pd
import pyarrow as pa


def test_bloom_no_false_negatives_and_low_fpr(ray_session):
    import ray.data as rd

    from netml_ray.bloom import build_bloom
    from netml_ray.hashing import hash_column

    rng = np.random.default_rng(4)
    members = rng.choice(10**9, 50_000, replace=False).astype(np.int64)
    t = pa.table({"k": pa.array(members)})
    bf = build_bloom(rd.from_arrow(t).repartition(8), "k")

    # zero false negatives (the correctness property)
    assert bf.test_hashes(hash_column(members)).all()

    # false-positive rate near the 10-bits/key design point (~1%)
    non = (members.max() + 1 + np.arange(50_000)).astype(np.int64)
    fpr = bf.test_hashes(hash_column(non)).mean()
    assert fpr < 0.03, fpr
    assert 0.0 < bf.fill_ratio() < 0.6


def test_bloom_prefilter_drops_only_non_members(ray_session):
    import ray.data as rd

    from netml_ray.bloom import bloom_prefilter, build_bloom

    right = pa.table({"k": pa.array(np.arange(0, 1000, dtype=np.int64))})
    left = pa.table({
        "k": pa.array(np.arange(0, 10_000, dtype=np.int64)),
        "v": pa.array(np.arange(10_000, dtype=np.int64)),
    })
    bf = build_bloom(rd.from_arrow(right), "k")
    kept = bloom_prefilter(rd.from_arrow(left).repartition(4), "k",
                           bf).to_pandas()
    # every true member survived
    assert set(range(1000)) <= set(kept["k"])
    # the vast majority of the 9000 non-members were dropped pre-shuffle
    assert len(kept) < 1000 + 0.05 * 9000


def test_hash_join_bloom_bit_equal(ray_session):
    import ray.data as rd

    from netml_ray.joins import hash_join, semi_join

    rng = np.random.default_rng(8)
    left = pa.table({
        "k": pa.array(rng.integers(0, 5000, 20_000)),
        "x": pa.array(rng.normal(size=20_000).round(4)),
    })
    # sparse right side: most left rows miss
    right = pa.table({
        "k": pa.array(rng.choice(5000, 300, replace=False).astype(np.int64)),
        "y": pa.array(rng.normal(size=300).round(4)),
    })
    lds = rd.from_arrow(left).repartition(6)
    rds = rd.from_arrow(right).repartition(3)

    def norm(df):
        return (df.sort_values(list(df.columns), kind="stable")
                .reset_index(drop=True))

    plain = hash_join(lds, rds, "k", num_partitions=8).to_pandas()
    with_bloom = hash_join(lds, rds, "k", num_partitions=8,
                           bloom=True).to_pandas()
    pd.testing.assert_frame_equal(norm(plain), norm(with_bloom))

    s_plain = semi_join(lds, rds, "k", num_partitions=8).to_pandas()
    s_bloom = semi_join(lds, rds, "k", num_partitions=8,
                        bloom=True).to_pandas()
    pd.testing.assert_frame_equal(norm(s_plain), norm(s_bloom))


def test_bloom_prefilter_drops_null_keys(ray_session):
    import ray.data as rd

    from netml_ray.bloom import bloom_prefilter, build_bloom

    right = pa.table({"k": pa.array([1, 2, None], type=pa.int64())})
    left = pa.table({"k": pa.array([1, None, 2, 99], type=pa.int64())})
    bf = build_bloom(rd.from_arrow(right), "k")
    kept = bloom_prefilter(rd.from_arrow(left), "k", bf).to_pandas()
    assert set(kept["k"].dropna()) == {1, 2}
    assert not kept["k"].isna().any()


def test_build_bloom_size_guard(ray_session):
    import pytest
    import ray.data as rd

    from netml_ray.bloom import build_bloom

    tiny = rd.from_arrow(pa.table({"k": pa.array([1, 2, 3],
                                                 type=pa.int64())}))
    with pytest.raises(ValueError, match="too large to bloom-filter"):
        build_bloom(tiny, "k", num_bits=1 << 34, num_hashes=4)
