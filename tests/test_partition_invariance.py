"""Partition-count invariance: distributed results must not depend on
how the key space is sharded — the core distributed-correctness
property for every keyed operator."""

import numpy as np
import pandas as pd
import pytest

from netml_ray.corpus import corpus_path
from netml_ray.pipeline import crawl_feature_pipeline


@pytest.mark.parametrize("feat_type", ["IAT", "SAMP_NUM"])
def test_flagship_partition_invariance(ray_session, feat_type):
    cp = corpus_path(4000, seed=7, cache_dir="/tmp/netml_ray_test_corpus")
    outs = []
    for p in (3, 16):
        joined, scalars = crawl_feature_pipeline(cp, feat_type=feat_type, num_partitions=p)
        df = joined.to_pandas().sort_values(["url", "warc_ts"], kind="stable").reset_index(drop=True)
        outs.append((df, scalars))
    (a, sa), (b, sb) = outs
    assert sa == sb  # global scalars identical regardless of sharding
    assert len(a) == len(b)
    assert (a["url"] == b["url"]).all()
    assert (a["state_ts"].fillna(-1) == b["state_ts"].fillna(-1)).all()
    fa = [None if v is None else tuple(v) for v in a["features"]]
    fb = [None if v is None else tuple(v) for v in b["features"]]
    assert fa == fb
