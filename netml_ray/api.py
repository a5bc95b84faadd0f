"""User-facing API mirroring the reference's ``PCAP`` class flow
(README.md:124-205; class at parser.py:655-688) so a netml user can
switch 1:1:

    reference                         netml_ray
    ---------                         ---------
    PCAP(pcap_file, flow_ptks_thres)  CrawlCorpus(parquet_path, min_rows)
    .pcap2flows(q_interval=0.9)       .corpus2sessions(q_interval=0.9)
    .label_flows(label_file)          .label_sessions(labels_df)
    .flow2features('IAT', fft, header).sessions2features('IAT', fft, header)
    .features / .labels / .fids       .features / .labels / .keys
    .pcap2pandas() → .df              .corpus2pandas() → .df
    <method>.tot_time (minutes)       same (tool.py:139-159 analog)

Execution is Ray Data underneath; ``.features`` materializes the
(post-aggregation, small) matrix on the driver exactly where the
reference holds it in memory.
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
import pyarrow as pa

from netml_ray.features import DEFAULT_LANGS, FeatureMeta, session_features
from netml_ray.joins import normalize_labels
from netml_ray.sessionize import SESSION, TS_SEC, netml_session_pipeline


class CrawlCorpus:
    """Sessionize a crawl Parquet corpus and extract per-session
    feature vectors with the reference's exact semantics."""

    def __init__(self, corpus_path: str, *, min_rows: int = 2, verbose: int = 0,
                 key: str = "url", ts_col: str = "warc_ts",
                 num_partitions: int | None = None):
        self.corpus_path = corpus_path
        self.min_rows = min_rows
        self.verbose = verbose
        self.key = key
        self.ts_col = ts_col
        self.num_partitions = num_partitions
        self.labels = None
        self._label_map = None
        self._default_label = 0
        self.df = None

    def _narrow(self):
        from netml_ray.pipeline import extract_narrow

        return extract_narrow(self.corpus_path)

    def corpus2sessions(self, interval: float = 0.0, q_interval: float = 0.9,
                        *, gap: float = 600.0):
        """Analog of pcap2flows (parser.py:691-760): gap split →
        interval from the duration quantile → interval split."""
        t0 = time.time()
        narrow = self._narrow()
        self.q_interval = q_interval
        self.sessions, self.interval = netml_session_pipeline(
            narrow, key=self.key, ts_col=self.ts_col, gap=gap,
            q_interval=q_interval, min_rows=self.min_rows,
            interval_hint=interval, num_partitions=self.num_partitions,
        )
        self.sessions = self.sessions.materialize()
        self.corpus2sessions.__func__.tot_time = (time.time() - t0) / 60
        return self

    def sessions2features(self, feat_type: str = "IAT", *, fft: bool = False,
                          header: bool = False, langs: tuple = DEFAULT_LANGS):
        """Analog of flow2features (parser.py:762-855)."""
        t0 = time.time()
        feats_ds, meta = session_features(
            self.sessions, feat_type, key=self.key, q_interval=self.q_interval,
            fft=fft, header=header, langs=langs,
            num_partitions=self.num_partitions,
        )
        fdf = feats_ds.to_pandas().sort_values(
            [self.key, "start_sec"], kind="stable").reset_index(drop=True)
        if self.labels is not None and self._label_map is not None:
            lab = self._label_map
            mask = fdf[self.key].isin(lab)
            fdf = fdf[mask].reset_index(drop=True)  # inner semantics
            self.labels = fdf[self.key].map(lab).to_numpy(dtype=int)
        elif self.labels is not None:
            # label_sessions(label=k) without a labels_df: every feature
            # row gets the constant label (ref label_flows(label=0)),
            # sized per FEATURE row, not per session row
            self.labels = np.full(len(fdf), self._default_label, dtype=int)
        self.features = np.vstack(fdf["features"].to_numpy()) if len(fdf) else np.empty((0, 0))
        self.keys = fdf[self.key].tolist()
        self.session_ids = fdf[SESSION].to_numpy()
        self.meta: FeatureMeta = meta
        self.dim = meta.width
        self.sessions2features.__func__.tot_time = (time.time() - t0) / 60
        return self

    def label_sessions(self, labels_df: pd.DataFrame | None = None,
                       label: int = 0, label_col: str = "label_raw"):
        """Analog of label_flows (parser.py:857-924): last-row-wins
        build side, BENIGN/NORMAL→0, inner semantics applied when the
        feature matrix is materialized."""
        t0 = time.time()
        if labels_df is not None:
            norm = normalize_labels(labels_df, self.key, label_col)
            self._label_map = dict(zip(norm[self.key], norm["label"]))
            self.labels = np.empty(0, dtype=int)  # filled on features
        else:
            self._label_map = None
            self._default_label = label
            self.labels = np.empty(0, dtype=int)  # filled on features
        self.label_sessions.__func__.tot_time = (time.time() - t0) / 60
        return self

    def corpus2pandas(self) -> pd.DataFrame:
        """Analog of pcap2pandas (parser.py:1078-1088): one row per
        record with derived columns, time-normalized."""
        t0 = time.time()
        narrow = self._narrow()
        df = narrow.to_pandas().sort_values([TS_SEC, self.key], kind="stable")
        df["time_normed"] = df[TS_SEC] - df[TS_SEC].min()  # parser.py:1074
        self.df = df.reset_index(drop=True)
        self.corpus2pandas.__func__.tot_time = (time.time() - t0) / 60
        return self.df
