"""Property-based tests: vectorized kernels ≡ sequential oracle on
hypothesis-generated inputs (beyond the fixed-seed fixtures)."""

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from netml_ray import kernels, oracle

settings.register_profile("ci", max_examples=60, deadline=None)
settings.load_profile("ci")


@st.composite
def keyed_events(draw, max_keys=6, max_rows=40):
    n_keys = draw(st.integers(1, max_keys))
    keys, ts, sizes = [], [], []
    for k in range(n_keys):
        n = draw(st.integers(1, max_rows))
        t = draw(st.floats(0, 1000, allow_nan=False))
        for _ in range(n):
            keys.append(f"k{k}")
            ts.append(round(t, 6))
            sizes.append(float(draw(st.integers(0, 500))))
            # steps engineered to hit gap boundaries and duplicates
            t += draw(st.sampled_from([0.0, 0.5, 10.0, 99.9, 100.0, 100.1, 300.0, 1500.0]))
    return pd.DataFrame({"key": keys, "ts": ts, "size": sizes})


def _sorted_arrays(df):
    d = df.sort_values(["key", "ts"], kind="stable").reset_index(drop=True)
    codes = pd.factorize(d["key"])[0].astype(np.int64)
    return d, codes, d["ts"].to_numpy(), d["size"].to_numpy()


def _flows_cmp(flows):
    return sorted((k, tuple(t), tuple(s)) for k, t, s in flows)


def _kernel_flows(d, keep, seg):
    d = d.assign(_seg=seg)[keep]
    return sorted(
        (k, tuple(g["ts"]), tuple(g["size"]))
        for (k, s), g in d.groupby(["key", "_seg"], sort=True)
    )


@given(keyed_events(), st.sampled_from([50.0, 100.0, 600.0]))
def test_prop_gap_sessionize(df, gap):
    d, codes, ts, sz = _sorted_arrays(df)
    keep, ordinal = kernels.gap_sessionize(codes, ts, gap, min_rows=2, netml=True)
    got = _kernel_flows(d, keep, kernels.encode_keys(codes, ordinal))
    exp = _flows_cmp(oracle.gap_sessionize(oracle.df_to_flows(df, "key", "ts", "size"), gap, 2))
    assert got == exp


@given(keyed_events(), st.sampled_from([10.0, 99.9, 100.0, 250.0]))
def test_prop_interval_split(df, interval):
    flows_g3 = oracle.gap_sessionize(oracle.df_to_flows(df, "key", "ts", "size"), 600.0, 2)
    exp = _flows_cmp(oracle.interval_split(flows_g3, interval, 2))

    d, codes, ts, sz = _sorted_arrays(df)
    keep, g3 = kernels.gap_sessionize(codes, ts, 600.0, min_rows=2, netml=True)
    d2 = d[keep].reset_index(drop=True)
    seg = kernels.encode_keys(codes[keep], g3[keep])
    keep2, sub = kernels.interval_split(seg, ts[keep], interval, min_rows=2)
    got = _kernel_flows(d2, keep2, kernels.encode_keys(seg, sub))
    assert got == exp


@given(keyed_events(max_keys=3), st.sampled_from([0.5, 1.0, 7.3, 100.0]), st.booleans())
def test_prop_samp(df, rate, use_sizes):
    if not oracle.gap_sessionize(oracle.df_to_flows(df, "key", "ts", "size"), 600.0, 2):
        return  # everything filtered before the quantile stage
    flows, interval = oracle.netml_sessionize(df, "key", "ts", "size",
                                              gap=600.0, q_interval=0.9)
    if not flows:
        return
    oflows = sorted(flows, key=lambda f: (f[0], f[1][0], tuple(f[1])))
    d, codes, ts, sz = _sorted_arrays(df)
    keep, g3 = kernels.gap_sessionize(codes, ts, 600.0, min_rows=2, netml=True)
    seg0 = kernels.encode_keys(codes[keep], g3[keep])
    keep2, sub = kernels.interval_split(seg0, ts[keep], interval, min_rows=2)
    idx = np.flatnonzero(keep)[keep2]
    seg = kernels.encode_keys(kernels.encode_keys(seg0, sub)[keep2])
    ts2, sz2 = ts[idx], sz[idx]

    kind = "SAMP_SIZE" if use_sizes else "SAMP_NUM"
    offs, vals = kernels.samp_lists(seg, ts2, sz2 if use_sizes else None, rate)
    exp = oracle.feat_samp(oflows, rate, kind)
    assert len(offs) - 1 == len(exp)
    for i in range(len(exp)):
        np.testing.assert_allclose(vals[offs[i]:offs[i + 1]], exp[i],
                                   err_msg=f"{kind} rate={rate} seg={i}")


@given(st.integers(0, 10_000))
def test_prop_asof_indices(seed):
    rng = np.random.default_rng(seed)
    keys = [f"u{i}" for i in range(4)]
    nl, nr = int(rng.integers(1, 30)), int(rng.integers(0, 20))
    lk = sorted(rng.choice(keys, nl).tolist())
    rk = sorted(rng.choice(keys, nr).tolist())
    lt = np.sort(rng.integers(0, 50, nl)).astype(np.float64)
    rt = np.sort(rng.integers(0, 50, nr)).astype(np.float64)
    # sort within key groups
    ldf = pd.DataFrame({"k": lk, "t": rng.permutation(lt)}).sort_values(["k", "t"]).reset_index(drop=True)
    rdf = pd.DataFrame({"k": rk, "t": rng.permutation(rt)}).sort_values(["k", "t"]).reset_index(drop=True)
    for strict in (False, True):
        from netml_ray.asof import asof_match_indices

        got = asof_match_indices(ldf["k"].tolist(), ldf["t"].to_numpy(),
                                 rdf["k"].tolist(), rdf["t"].to_numpy(), strict)
        exp = oracle.asof_expected(ldf, rdf, "k", "t", "t", strict=strict)
        for g, e in zip(got.tolist(), exp):
            if e is None:
                assert g == -1
            else:
                # both pick the last eligible row; compare by (key, ts)
                assert rdf.loc[g, "t"] == rdf.loc[e, "t"]
                assert rdf.loc[g, "k"] == rdf.loc[e, "k"]


# --- extraction fast-path parity --------------------------------------------

_NASTY_ATOMS = [
    "hello", "a&b", "&amp;", "&lt;", "&gt;", "&quot;", "&amp;lt;",
    "&amp;amp;", "&ltx", "&lt", "&#60;", "&#x3C;", "&nbsp;", "&unknown;",
    "&&", "&", "<p>", "</p>", "<b class='x'>", "<", ">", "x<y>z",
    "café", " ", " ", "\x1c", "\x85", "　", "\t", "\n",
    "  ", "", "tag>", "<notclosed", ";", "&amp", "&gt", "&quo;", "q&a;",
]


@given(st.lists(st.sampled_from(_NASTY_ATOMS), min_size=0, max_size=30),
       st.integers(0, 3))
def test_prop_extract_vectorized_parity(atoms, joiner):
    """The Arrow fast path (+fallback guards) is byte-identical to the
    per-row reference spec on adversarial entity / whitespace / tag
    soup."""
    import pyarrow as pa

    from netml_ray.textops import _extract_vectorized, extract_text_one

    sep = ["", " ", "\n", " "][joiner]
    doc = sep.join(atoms)
    docs = [doc.encode("utf-8"), b"", ("<html>" + doc + "</html>").encode("utf-8")]
    col = pa.chunked_array([pa.array(docs, type=pa.binary())])
    got = _extract_vectorized(col)
    assert got is not None
    exp = [extract_text_one(d) for d in docs]
    assert got.to_pylist() == exp


def test_extract_invalid_utf8_fallback():
    import pyarrow as pa

    from netml_ray.textops import ExtractText, extract_text_one

    docs = [b"ok <b>text</b>", b"\xff\xfe broken <i>tag</i>", b"a&amp;b"]
    t = pa.table({"html": pa.array(docs, type=pa.binary())})
    out = ExtractText()(t)
    assert out["text"].to_pylist() == [extract_text_one(d) for d in docs]
    assert out["size"].to_pylist() == [len(d) for d in docs]


# --- salted boundary-merge core (no Ray needed) -----------------------------

@given(st.integers(0, 5000), st.sampled_from([50.0, 200.0, 1000.0]),
       st.booleans())
def test_prop_chunk_merge_equals_direct_g3(seed, chunk, netml):
    """merge_chunk_summaries over arbitrary time-chunked local cuts
    must reproduce gap_sessionize's session boundaries and keep flags
    exactly — the correctness core of the hot-key path."""
    import pandas as pd

    from netml_ray import kernels
    from netml_ray.salted import global_session_summary, merge_chunk_summaries

    rng = np.random.default_rng(seed)
    gap = 100.0
    rows = []
    for key in ["a", "b"][: int(rng.integers(1, 3))]:
        t = float(rng.uniform(0, 50))
        for _ in range(int(rng.integers(1, 40))):
            rows.append((key, t))
            t += float(rng.choice([0.0, 10.0, 99.9, 100.0, 100.1, 500.0]))
    df = pd.DataFrame(rows, columns=["key", "ts"]).sort_values(
        ["key", "ts"], kind="stable").reset_index(drop=True)

    # direct G3 over the full data
    codes = pd.factorize(df["key"])[0].astype(np.int64)
    tsv = df["ts"].to_numpy()
    keep_d, ord_d = kernels.gap_sessionize(codes, tsv, gap, min_rows=2,
                                           netml=netml)

    # chunked local cuts → summaries → merge
    salt = np.floor(tsv / chunk).astype(np.int64)
    summ_rows = []
    for (k, s), g in df.assign(salt=salt).groupby(["key", "salt"], sort=True):
        gt = g["ts"].to_numpy()
        c = np.zeros(len(gt), dtype=np.int64)
        _, lsid = kernels.gap_sessionize(c, gt, gap, netml=False)
        for sid in np.unique(lsid):
            m = lsid == sid
            summ_rows.append((k, s, int(sid), gt[m].min(), gt[m].max(),
                              int(m.sum())))
    summ = pd.DataFrame(summ_rows, columns=["key", "__salt", "__lsid",
                                            "first_ts", "last_ts", "n"])
    summ = summ.sort_values(["key", "__salt", "__lsid"],
                            kind="stable").reset_index(drop=True)
    merged = merge_chunk_summaries(summ, "key", gap=gap, min_rows=2,
                                   netml=netml)
    gsum = global_session_summary(merged, "key")

    # row-level reconstruction: session of a row = searchsorted over its
    # key's session start boundaries (what the flagship hot path does)
    for key in df["key"].unique():
        km = df["key"] == key
        g = gsum[gsum["key"] == key].sort_values("_gsid")
        tk = df.loc[km, "ts"].to_numpy()
        pos = np.searchsorted(g["first_ts"].to_numpy(), tk, side="right") - 1
        pos = np.maximum(pos, 0)
        got_sid = g["_gsid"].to_numpy()[pos]
        got_keep = g["_keep"].to_numpy()[pos]
        np.testing.assert_array_equal(got_sid, ord_d[km.to_numpy()])
        np.testing.assert_array_equal(got_keep, keep_d[km.to_numpy()])


# ---------------------------------------------------------------------------
# Tokenized (shared dictionary tokenization) — the core under gopher,
# repetition, n-gram decontamination, LangId and fingerprint word hashing
# ---------------------------------------------------------------------------

_TOK_ALPHABET = list("ab Z0.#…é中\t\n")


@given(st.lists(st.text(alphabet=st.sampled_from(_TOK_ALPHABET), max_size=24),
                min_size=0, max_size=20))
def test_tokenized_matches_python_split(texts):
    import pyarrow as pa

    from netml_ray.textops import Tokenized

    tok = Tokenized(pa.array(texts, type=pa.string()))
    # n_words ≡ str.split() count (ASCII-ws corpus alphabet)
    assert tok.n_words.tolist() == [len(s.split()) for s in texts]
    # words in order ≡ regexp_split_to_array(trim, \s+) semantics
    flat_words = [tok.dictionary[c].as_py() for c in tok.codes]
    exp = []
    for i, s in enumerate(texts):
        ws = __import__("re").split(r"\s+", s.strip())
        exp.extend(ws if ws != [] else [""])
    assert flat_words == exp
    # word lengths via dictionary gather ≡ per-word codepoint length
    assert tok.word_lengths().tolist() == [len(w) for w in flat_words]


@given(st.lists(st.text(alphabet=st.sampled_from(_TOK_ALPHABET), max_size=24),
                min_size=1, max_size=12))
def test_tokenized_word_hashes_match_direct(texts):
    import numpy as np
    import pyarrow as pa

    from netml_ray.textops import (Tokenized, _rolling_hash_segments,
                                   _utf8_segments)

    tok = Tokenized(pa.array(texts, type=pa.string()))
    got = tok.word_hashes()
    # reference: hash every word column directly (no dictionary)
    flat_words = [tok.dictionary[c].as_py() for c in tok.codes]
    if flat_words:
        data, offs = _utf8_segments(pa.array(flat_words, type=pa.string()))
        exp = _rolling_hash_segments(data, offs)
        assert np.array_equal(got, exp)


@st.composite
def segmented_series(draw, max_segs=5, max_rows=30):
    segs, xs, ys = [], [], []
    for s in range(draw(st.integers(1, max_segs))):
        n = draw(st.integers(1, max_rows))
        for _ in range(n):
            segs.append(s)
            # quantized values so zero-variance windows occur
            xs.append(float(draw(st.integers(-2, 2))))
            ys.append(float(draw(st.integers(-2, 2))))
    return (np.asarray(segs, dtype=np.int64),
            np.asarray(xs), np.asarray(ys))


@given(segmented_series(), st.integers(2, 6))
def test_prop_rolling_corr(data, window):
    segs, x, y = data
    got = kernels.rolling_corr(segs, x, y, window)
    for i in range(len(x)):
        s0 = np.searchsorted(segs, segs[i], "left")
        lo = max(s0, i - window + 1)
        xs, ys = x[lo:i + 1], y[lo:i + 1]
        if len(xs) < 2 or np.ptp(xs) == 0 or np.ptp(ys) == 0:
            assert np.isnan(got[i])
        else:
            exp = np.corrcoef(xs, ys)[0, 1]
            assert abs(got[i] - exp) < 1e-9


@given(segmented_series(), st.sampled_from(["left", "right"]))
def test_prop_seg_searchsorted(data, side):
    from netml_ray.windows import _seg_searchsorted

    segs, x, _ = data
    # data array must ascend within each segment
    a = np.concatenate([
        np.sort(x[segs == s]) for s in np.unique(segs)])
    got = _seg_searchsorted(segs, a, x, side)
    pos = 0
    for s in np.unique(segs):
        m = segs == s
        seg_a = a[m]
        for i in np.flatnonzero(m):
            exp = np.searchsorted(seg_a, x[i], side)
            assert got[i] == exp
        pos += int(m.sum())


@given(st.lists(st.tuples(st.integers(0, 12), st.integers(0, 12),
                          st.integers(0, 12)),
                min_size=1, max_size=120),
       st.tuples(st.sampled_from(["max", "min"]),
                 st.sampled_from(["max", "min"]),
                 st.sampled_from(["max", "min"])))
def test_prop_pareto_front_kernel(rows, sense):
    """_front_of ≡ O(n²) dominance check on small integer grids (ties
    and duplicated vectors are the hard cases)."""
    from netml_ray.skyline import _front_of

    m = np.asarray(rows, dtype=np.float64)
    oriented = m.copy()
    for c, s in enumerate(sense):
        if s == "min":
            oriented[:, c] = -oriented[:, c]
    got = {tuple(r) for r in _front_of(oriented, 10_000)}
    uniq = np.unique(oriented, axis=0)
    exp = set()
    for i in range(len(uniq)):
        dominated = any(
            (uniq[j] >= uniq[i]).all() and (uniq[j] > uniq[i]).any()
            for j in range(len(uniq)) if j != i)
        if not dominated:
            exp.add(tuple(uniq[i]))
    assert got == exp


@given(st.lists(st.tuples(st.integers(0, 5), st.integers(0, 30)),
                min_size=1, max_size=80),
       st.integers(1, 9))
def test_prop_active_users_intervals(rows, w):
    """The merged-interval difference-array construction ≡ per-day
    distinct count, on hypothesis-generated (user, day) activity."""
    users = np.array([r[0] for r in rows], dtype=np.int64)
    days = np.array([r[1] for r in rows], dtype=np.int64)

    # kernel-level re-implementation of active_users' partition fn,
    # driven over the whole input as one partition (sorted by user)
    order = np.argsort(users, kind="stable")
    u, d = users[order], days[order]
    run_id = np.cumsum(np.r_[True, u[1:] != u[:-1]]) - 1
    o2 = np.lexsort((d, run_id))
    rs, dys = run_id[o2], d[o2]
    keep = np.r_[True, (rs[1:] != rs[:-1]) | (dys[1:] != dys[:-1])]
    rs, dys = rs[keep], dys[keep]
    new_iv = np.r_[True, (rs[1:] != rs[:-1]) | (dys[1:] - dys[:-1] >= w)]
    iv_start = dys[new_iv]
    iv_last = np.maximum.reduceat(dys, np.flatnonzero(new_iv))
    lo = int(days.min())
    hi = int(days.max()) + w
    diff = np.zeros(hi - lo + 2, np.int64)
    np.add.at(diff, iv_start - lo, 1)
    np.add.at(diff, iv_last + w - lo, -1)
    wau = np.cumsum(diff)[:-1]

    for day in range(lo, hi):
        exp = len({uu for uu, dd in zip(users, days)
                   if day - w + 1 <= dd <= day})
        assert wau[day - lo] == exp


def test_segment_dedup_identity_when_unique(ray_session):
    """Invariant: with all-unique segments, segment_dedup returns
    every doc's normalized text unchanged (n_kept == n_total)."""
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.curation import segment_dedup

    # unique tokens everywhere → no segment can repeat
    texts = [" ".join(f"t{d}_{i}" for i in range(k))
             for d, k in enumerate([1, 5, 16, 17, 33, 0, 48])]
    t = pa.table({"doc_id": pa.array(np.arange(len(texts),
                                               dtype=np.int64)),
                  "text": pa.array(texts)})
    out = segment_dedup(rd.from_arrow(t), size=16).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    for d, txt in enumerate(texts):
        assert out.loc[d, "text"] == txt
        assert out.loc[d, "n_kept"] == out.loc[d, "n_total"]
