"""MinHash full dedup (clusters → keep list) + session-partitioned
features equivalence."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from netml_ray.dedup import minhash_dedup_keep
from netml_ray.features import session_features
from netml_ray.sessionize import netml_session_pipeline


def test_minhash_dedup_keep_removes_planted(ray_session):
    import ray.data as rd

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"]).to_pandas()
    docs = docs.head(200)
    dup1 = docs.head(50).copy()
    dup1["doc_id"] += 1_000_000
    dup1["text"] += " tail"
    dup2 = docs.head(20).copy()
    dup2["doc_id"] += 2_000_000  # exact copies
    alld = pd.concat([docs, dup1, dup2], ignore_index=True)
    ds = rd.from_pandas(alld)
    kept_ds, clusters = minhash_dedup_keep(ds, jaccard_threshold=0.5)
    kept = set(kept_ds.to_pandas()["doc_id"])
    # every cluster keeps exactly its minimum-id representative
    for rep in set(clusters["cluster"]):
        assert rep in kept
    member_nonreps = set(clusters.loc[clusters["doc_id"] != clusters["cluster"], "doc_id"])
    assert kept.isdisjoint(member_nonreps)
    dropped = set(alld["doc_id"]) - kept
    assert len(dropped & set(dup2["doc_id"])) == 20  # exact dups always caught
    assert len(dropped & set(dup1["doc_id"])) >= 35  # near-dups mostly caught
    # cluster representative is the min id
    for _, row in clusters.iterrows():
        assert row["cluster"] <= row["doc_id"]


def test_session_partitioned_features_equivalence(ray_session):
    import ray.data as rd

    from netml_ray.corpus import corpus_path

    cp = corpus_path(4000, seed=7, cache_dir="/tmp/netml_ray_test_corpus")
    from netml_ray.pipeline import extract_narrow

    narrow = extract_narrow(cp)
    sessions, _ = netml_session_pipeline(narrow, key="url", ts_col="warc_ts",
                                         gap=600.0, num_partitions=8)
    sessions = sessions.materialize()
    a, meta_a = session_features(sessions, "STATS", key="url", num_partitions=8)
    b, meta_b = session_features(sessions, "STATS", key="url", num_partitions=8,
                                 partition_on="session")
    da = a.to_pandas().sort_values(["url", "start_sec"]).reset_index(drop=True)
    db = b.to_pandas().sort_values(["url", "start_sec"]).reset_index(drop=True)
    assert len(da) == len(db)
    assert (da["url"] == db["url"]).all()
    np.testing.assert_allclose(np.vstack(da["features"]), np.vstack(db["features"]))
