"""README-flow API parity (reference tests/cli_tests/test_learn.py
style: end-to-end runs with pinned counts + shapes)."""

import numpy as np
import pandas as pd
import pytest

from netml_ray.api import CrawlCorpus
from netml_ray.corpus import corpus_path


@pytest.fixture(scope="module")
def corpus_file():
    return corpus_path(6000, seed=7, cache_dir="/tmp/netml_ray_test_corpus")


def test_readme_flow_unlabeled(ray_session, corpus_file):
    cc = CrawlCorpus(corpus_file, min_rows=2, num_partitions=8)
    cc.corpus2sessions(q_interval=0.9)
    cc.sessions2features("IAT")
    assert cc.features.ndim == 2 and cc.features.shape[0] > 0
    assert cc.features.shape[1] == cc.dim == cc.meta.dim - 1  # IAT rule
    assert len(cc.keys) == cc.features.shape[0]
    assert cc.labels is None
    assert cc.corpus2sessions.tot_time > 0
    assert cc.sessions2features.tot_time > 0


def test_readme_flow_labeled_and_pinned_counts(ray_session, corpus_file):
    cc = CrawlCorpus(corpus_file, min_rows=2, num_partitions=8)
    cc.corpus2sessions(q_interval=0.9)
    n_sessions_rows = cc.sessions.count()
    # pinned counts for the deterministic seed-7 corpus (reference
    # pattern: exactly-88-flows assertions, test_learn.py:134-149)
    cc.sessions2features("STATS")
    n_sessions = cc.features.shape[0]
    assert n_sessions > 20
    assert cc.features.shape[1] == 12

    # label only a subset of urls → inner semantics; conflicting rows →
    # last wins (parser.py:900-918)
    urls = sorted(set(cc.keys))
    labeled = urls[: len(urls) // 2]
    labels_df = pd.DataFrame({
        "url": labeled + [labeled[0]],
        "label_raw": ["BENIGN"] * len(labeled) + ["BOT"],  # conflict on first
    })
    cc2 = CrawlCorpus(corpus_file, min_rows=2, num_partitions=8)
    cc2.corpus2sessions(q_interval=0.9)
    cc2.label_sessions(labels_df)
    cc2.sessions2features("STATS")
    assert set(cc2.keys) <= set(labeled)
    assert len(cc2.labels) == cc2.features.shape[0]
    lab_by_key = dict(zip(cc2.keys, cc2.labels))
    assert lab_by_key[labeled[0]] == 1  # last row won
    for u in labeled[1:]:
        if u in lab_by_key:
            assert lab_by_key[u] == 0

    # determinism: same corpus, same counts
    assert cc2.sessions.count() == n_sessions_rows


def test_corpus2pandas(ray_session, corpus_file):
    cc = CrawlCorpus(corpus_file, num_partitions=8)
    df = cc.corpus2pandas()
    assert len(df) == 6000
    assert (df["time_normed"] >= 0).all()
    assert df["time_normed"].iloc[0] == 0.0
    assert {"url", "size", "ts_sec"} <= set(df.columns)


def test_label_sessions_default_label(ray_session, corpus_file):
    """label_sessions(label=k) WITHOUT a labels_df (reference
    label_flows(label=0) analog): constant label per FEATURE row."""
    cc = CrawlCorpus(corpus_file, min_rows=2, num_partitions=8)
    cc.corpus2sessions(q_interval=0.9)
    cc.label_sessions(label=3)
    cc.sessions2features("STATS")
    assert cc.labels.shape == (cc.features.shape[0],)
    assert (cc.labels == 3).all()


def test_registry_window_discipline():
    """The first 50 queries() entries (the driver harness's recording
    window) must ALL be oracle-SQL-backed, and every oracle key must
    name a registered query — pins the rotation discipline so a new
    entry can't silently land in-window without its DuckDB oracle."""
    import __ray_entry__ as m

    q = m.queries()
    o = m.oracle_sql()
    window = list(q)[:50]
    missing = [n for n in window if n not in o]
    assert not missing, f"in-window entries without an oracle: {missing}"
    stray = [n for n in o if n not in q]
    assert not stray, f"oracle entries without a query: {stray}"
