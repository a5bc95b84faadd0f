"""Per-session feature vectors — the recast of the reference's
flow2features (parser.py:762-834) as Ray Data stages.

Feature width is data-dependent (dim = floor(q-quantile of per-session
row counts), parser.py:783-785; SAMP rate = 0.3-quantile of session
durations, parser.py:801-808) → a small stats pass (partial aggregation
inside map_batches, then a tiny groupby) feeds global scalars that are
broadcast by closure into the vectorized feature pass.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from netml_ray import kernels
from netml_ray.partition import partition_map
from netml_ray.sessionize import SESSION, TS_SEC, _key_codes, exact_quantiles

FEAT_TYPES = ("IAT", "SIZE", "IAT_SIZE", "STATS", "SAMP_NUM", "SAMP_SIZE")


@dataclass
class FeatureMeta:
    feat_type: str
    dim: int        # the quantile dim (parser.py:785)
    width: int      # actual vector width after the per-type dim rule
    rate: float     # SAMP sampling rate (0 when unused)
    fft: bool


def session_stats_small(sessions_ds, key: str = "url"):
    """Per-session (n, tmin, tmax) with partial pre-aggregation inside
    map_batches — sessions may span block boundaries; the tiny global
    groupby combines partials correctly regardless."""

    def _partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {key: pa.array([], type=pa.string()), SESSION: pa.array([], type=pa.int64()),
                 "n": pa.array([], type=pa.int64()),
                 "tmin": pa.array([], type=pa.float64()), "tmax": pa.array([], type=pa.float64())}
            )
        t = t.sort_by([(key, "ascending"), (SESSION, "ascending")])
        codes = _key_codes(t, key)
        sess = t[SESSION].to_numpy()
        tsf = t[TS_SEC].to_numpy()
        seg = kernels.encode_keys(codes, sess)
        starts = kernels.segment_starts(seg)
        ends = np.r_[starts[1:], len(seg)]
        return pa.table(
            {
                key: pc.take(t[key], pa.array(starts)),
                SESSION: pa.array(sess[starts]),
                "n": pa.array((ends - starts).astype(np.int64)),
                "tmin": pa.array(np.minimum.reduceat(tsf, starts)),
                "tmax": pa.array(np.maximum.reduceat(tsf, starts)),
            }
        )

    from ray.data.aggregate import Max, Min, Sum

    partial = sessions_ds.map_batches(_partial, batch_format="pyarrow")
    return partial.groupby([key, SESSION]).aggregate(
        Sum("n", alias_name="n"), Min("tmin", alias_name="tmin"), Max("tmax", alias_name="tmax")
    )


def compute_dims(
    sessions_ds, feat_type: str, *, key: str = "url", q_interval: float = 0.9
) -> FeatureMeta:
    """Global scalar pass: dim and (for SAMP) the sampling rate —
    exact np.quantile parity (parser.py:783-808)."""
    stats = session_stats_small(sessions_ds, key).materialize()
    counts = stats.map_batches(
        lambda t: pa.table({"v": pc.cast(t["n"], pa.float64())}), batch_format="pyarrow"
    )
    dim = int(np.floor(exact_quantiles(counts, "v", [q_interval])[0]))
    rate = 0.0
    if feat_type in ("SAMP_NUM", "SAMP_SIZE"):
        durs = stats.map_batches(
            lambda t: pa.table({"v": pc.subtract(t["tmax"], t["tmin"])}), batch_format="pyarrow"
        )
        rate = exact_quantiles(durs, "v", [0.3])[0]
    width = {
        "IAT": dim - 1,
        "SIZE": dim,
        "IAT_SIZE": 2 * dim - 1,
        "STATS": 12,
        "SAMP_NUM": dim - 1,
        "SAMP_SIZE": dim - 1,
    }[feat_type]
    return FeatureMeta(feat_type, dim, width, rate, False)


DEFAULT_LANGS = ("en", "de", "fr", "es", "zh")


def _header_matrix(meta, seg, sizes, langs_col_values, langs: tuple, fft: bool):
    """Reference header path (parser.py:820-829): n_cats categorical
    counts + size series, padded (or FFT'd) to ``n_cats + width``."""
    n_cats = len(langs)
    lut = {v: i for i, v in enumerate(langs)}
    codes = np.fromiter((lut.get(v, n_cats) for v in langs_col_values),
                        dtype=np.int64, count=len(langs_col_values))
    # unknown categories fall into a scratch bucket that is dropped
    starts = kernels.segment_starts(seg)
    ends = np.r_[starts[1:], len(seg)]
    lens = ends - starts
    seg_idx = np.repeat(np.arange(len(starts)), lens)
    counts = np.zeros((len(starts), n_cats + 1), dtype=np.float64)
    np.add.at(counts, (seg_idx, codes), 1.0)
    counts = counts[:, :n_cats]
    out_lens = n_cats + lens
    offsets = np.r_[0, np.cumsum(out_lens)]
    values = np.empty(int(offsets[-1]), dtype=np.float64)
    for i, (s, e) in enumerate(zip(starts, ends)):
        o = offsets[i]
        values[o : o + n_cats] = counts[i]
        values[o + n_cats : offsets[i + 1]] = sizes[s:e]
    h_dim = n_cats + meta.width  # analog of h_dim = 8 + self.dim
    hmat = kernels.pad_truncate(offsets, values, h_dim)
    if fft:
        hmat = kernels.fft_real(hmat, h_dim)
    return hmat


def _feature_fn(meta: FeatureMeta, key: str, size_col: str,
                header: bool = False, lang_col: str = "lang",
                langs: tuple = DEFAULT_LANGS):
    def _fn(t: pa.Table) -> pa.Table:
        codes = _key_codes(t, key)
        sess = t[SESSION].to_numpy()
        tsf = t[TS_SEC].to_numpy()
        sz = t[size_col].to_numpy().astype(np.float64)
        seg = kernels.encode_keys(codes, sess)
        starts = kernels.segment_starts(seg)
        ends = np.r_[starts[1:], len(seg)]

        ft = meta.feat_type
        if ft == "IAT":
            offsets, values = kernels.iat_lists(seg, tsf)
            mat = kernels.pad_truncate(offsets, values, meta.width)
        elif ft == "SIZE":
            offsets, values = kernels.size_lists(seg, sz)
            mat = kernels.pad_truncate(offsets, values, meta.width)
        elif ft == "IAT_SIZE":
            offsets, values = kernels.iat_size_lists(seg, tsf, sz)
            mat = kernels.pad_truncate(offsets, values, meta.width)
        elif ft == "STATS":
            mat = kernels.stats_matrix(seg, tsf, sz)
        elif ft == "SAMP_NUM":
            offsets, values = kernels.samp_lists(seg, tsf, None, meta.rate)
            mat = kernels.pad_truncate(offsets, values, meta.width)
        elif ft == "SAMP_SIZE":
            offsets, values = kernels.samp_lists(seg, tsf, sz, meta.rate)
            mat = kernels.pad_truncate(offsets, values, meta.width)
        else:  # pragma: no cover
            raise ValueError(ft)
        if meta.fft:
            mat = kernels.fft_real(mat, mat.shape[1])
        if header:
            hmat = _header_matrix(meta, seg, sz, t[lang_col].to_pylist(), langs, meta.fft)
            mat = np.hstack([hmat, mat])  # h + f (parser.py:825-829)

        n_seg, width = mat.shape
        feat_col = pa.ListArray.from_arrays(
            pa.array(np.arange(n_seg + 1, dtype=np.int64) * width),
            pa.array(mat.ravel()),
        )
        return pa.table(
            {
                key: pc.take(t[key], pa.array(starts)),
                SESSION: pa.array(sess[starts]),
                "n_rows": pa.array((ends - starts).astype(np.int64)),
                "start_sec": pa.array(tsf[starts]),
                "end_sec": pa.array(tsf[ends - 1]),
                "features": feat_col,
            }
        )

    return _fn


def session_features(
    sessions_ds,
    feat_type: str = "IAT",
    *,
    key: str = "url",
    size_col: str = "size",
    q_interval: float = 0.9,
    fft: bool = False,
    header: bool = False,
    lang_col: str = "lang",
    langs: tuple = DEFAULT_LANGS,
    tiebreak: str | None = None,
    meta: FeatureMeta | None = None,
    num_partitions: int | None = None,
    partition_on: str = "key",
):
    """Compute per-session feature vectors.

    Returns ``(features_ds, meta)`` — one row per (key, session_id)
    with a fixed-width ``features: list<double>`` column plus
    ``start_sec`` / ``end_sec`` (the session's time extent; ``end_sec``
    is the as-of state timestamp downstream).  ``header=True`` prepends
    the categorical-counts + size-series header vector (reference
    parser.py:820-829; width ``len(langs) + width``).

    ``partition_on="session"`` hash-partitions by (key, session_id)
    instead of key — the skew-free path: a hot key's sessions spread
    across partitions (sessions are bounded; keys are not), at the cost
    of per-key feature locality downstream.
    """
    if feat_type not in FEAT_TYPES:
        raise ValueError(f"feat_type must be one of {FEAT_TYPES}")
    if meta is None:
        meta = compute_dims(sessions_ds, feat_type, key=key, q_interval=q_interval)
        meta.fft = fft
    sort_by = [key, SESSION, TS_SEC] + ([tiebreak] if tiebreak else [])
    fn = _feature_fn(meta, key, size_col, header=header, lang_col=lang_col, langs=langs)

    if partition_on == "session":
        import pyarrow.compute as _pc

        def _combo(t: pa.Table) -> pa.Table:
            c = _pc.binary_join_element_wise(
                _pc.cast(t[key], pa.string()),
                _pc.cast(t[SESSION], pa.string()), "\x1f",
            )
            return t.append_column("__sesskey", c)

        ds2 = sessions_ds.map_batches(_combo, batch_format="pyarrow")

        def _fn2(t: pa.Table) -> pa.Table:
            return fn(t.drop_columns(["__sesskey"]))

        out = partition_map(ds2, "__sesskey", _fn2, sort_by=sort_by,
                            num_partitions=num_partitions)
    else:
        out = partition_map(sessions_ds, key, fn, sort_by=sort_by,
                            num_partitions=num_partitions)
    return out, meta
