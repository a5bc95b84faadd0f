"""Header-feature path (reference parser.py:820-829 recast): categorical
lang counts + size series prepended to the feature vector."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from netml_ray import oracle
from netml_ray.corpus import gen_corpus
from netml_ray.features import DEFAULT_LANGS, session_features
from netml_ray.sessionize import netml_session_pipeline


@pytest.mark.parametrize("fft", [False, True])
def test_header_features_vs_pandas_expected(ray_session, fft):
    import ray.data as rd

    t = gen_corpus(3000, seed=11)
    df = t.to_pandas()
    df["ts_f"] = t["warc_ts"].cast(pa.int64()).to_numpy() / 1e6
    df["size"] = [len(h) for h in df["html"]]
    # drop duplicate (url, ts) rows so lang lookup per record is unique
    df = df.drop_duplicates(subset=["url", "ts_f"], keep="first").reset_index(drop=True)

    ds = rd.from_arrow(pa.Table.from_pandas(
        df[["url", "warc_ts", "size", "lang"]], preserve_index=False))
    sessions, interval = netml_session_pipeline(
        ds, key="url", ts_col="warc_ts", gap=600.0, q_interval=0.9, num_partitions=8
    )
    sessions = sessions.materialize()
    feats_ds, meta = session_features(
        sessions, "SIZE", key="url", q_interval=0.9, fft=fft, header=True,
        num_partitions=8,
    )
    got = feats_ds.to_pandas().sort_values(["url", "start_sec"]).reset_index(drop=True)

    # oracle expectation
    odf = df.rename(columns={"url": "key", "ts_f": "ts"})
    flows, interval_o = oracle.netml_sessionize(odf, "key", "ts", "size",
                                                gap=600.0, q_interval=0.9)
    assert interval == pytest.approx(interval_o, rel=1e-12)
    oflows = sorted(flows, key=lambda f: (f[0], f[1][0], tuple(f[1])))
    feat_mat, keys, width = oracle.flows2features(oflows, "SIZE", 0.9, fft=fft)

    lang_of = {(k, round(ts, 6)): l for k, ts, l in zip(odf["key"], odf["ts"], odf["lang"])}
    n_cats = len(DEFAULT_LANGS)
    h_dim = n_cats + width
    headers = []
    for k, times, sizes in oflows:
        langs = [lang_of[(k, round(tv, 6))] for tv in times]
        vec = [float(sum(1 for x in langs if x == L)) for L in DEFAULT_LANGS] + list(sizes)
        headers.append(vec)
    if fft:
        hmat = oracle.fft_features(headers, h_dim)
    else:
        hmat = oracle.pad_truncate(headers, h_dim)
    expected = np.hstack([hmat, feat_mat])

    got_mat = np.vstack(got["features"].to_numpy())
    assert got_mat.shape == expected.shape
    np.testing.assert_allclose(got_mat, expected, rtol=1e-9, atol=1e-9)
