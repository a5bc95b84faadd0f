"""ML-prep operators: feature scaling and heavy-hitter sketching.

``fit_scaler`` / ``transform_scaled`` is the classic fit-then-transform
split done Ray-Data-first: the fit is ONE pass of per-batch moment
partials (count, sum, sum-of-squares, min, max per column — a handful
of doubles per batch, so the reduce is O(batches), no shuffle), and the
transform is a stateless vectorized ``map_batches`` with the tiny fit
table broadcast in the closure.  Population std (ddof=0) to match SQL
``stddev_pop`` exactly.

``misra_gries_partials`` / ``misra_gries_merge`` is the deterministic
heavy-hitters summary (Misra & Gries 1982): k-1 counters per partition,
mergeable by summing counters then decrementing by the (k)th largest —
the merged summary retains every item with true count > n/k and each
reported count is an UNDERestimate by at most n/k.  At web scale this
finds hot tokens / hot keys in one narrow pass with O(k) state per
partition — no vocabulary-wide shuffle at all (compare
``textops.top_tokens``, which exchanges one row per distinct token per
batch and is exact).

``pca_partials`` / ``fit_pca`` / ``transform_pca`` extends the same
fit-then-transform shape to dimensionality reduction: one
second-moment partial pass (8·(d+d²) bytes per batch), a driver-side
d×d ``eigh``, and a broadcast-projection transform."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["fit_scaler", "transform_scaled", "woe_iv", "gains_table",
           "profile_table", "group_auc",
           "misra_gries_partials",
           "misra_gries_merge", "misra_gries_topk",
           "pca_partials", "fit_pca", "transform_pca",
           "grouped_split", "add_quantile_bins", "target_encode",
           "group_zscore", "onehot_encode", "feature_hash",
           "kmeans_fit", "kmeans_predict",
           "group_moments", "group_corr", "robust_zscore",
           "group_entropy", "group_mode", "mutual_information",
           "target_encode_oof", "frequency_encode", "welch_ttest",
           "quantize_stats", "cohens_kappa",
           "random_projection", "temporal_split", "prop_ztest"]


# ---------------------------------------------------------------------------
# scaler
# ---------------------------------------------------------------------------

def fit_scaler(ds, cols: list[str]) -> dict:
    """One-pass per-column fit stats: ``{col: {mean, std, min, max}}``.
    Partial moments per batch (8 doubles per column), summed on the
    driver — numerically this is the textbook sum/sumsq route, which
    is fine for feature columns at double precision and keeps the
    partial EXACTLY mergeable (order-independent up to fp addition)."""

    def _partial(t: pa.Table) -> pa.Table:
        out = {"col": pa.array(list(cols), type=pa.string())}
        ns, sums, sqs, mins, maxs = [], [], [], [], []
        for c in cols:
            v = t[c].to_numpy(zero_copy_only=False).astype(np.float64)
            v = v[~np.isnan(v)]
            ns.append(len(v))
            sums.append(v.sum() if len(v) else 0.0)
            sqs.append((v * v).sum() if len(v) else 0.0)
            mins.append(v.min() if len(v) else np.inf)
            maxs.append(v.max() if len(v) else -np.inf)
        out["n"] = pa.array(ns, type=pa.int64())
        out["s"] = pa.array(sums, type=pa.float64())
        out["sq"] = pa.array(sqs, type=pa.float64())
        out["mn"] = pa.array(mins, type=pa.float64())
        out["mx"] = pa.array(maxs, type=pa.float64())
        return pa.table(out)

    from ray.data.aggregate import Max, Min, Sum

    agg = (ds.select_columns(cols)
           .map_batches(_partial, batch_format="pyarrow")
           .groupby("col")
           .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"),
                      Sum("sq", alias_name="sq"),
                      Min("mn", alias_name="mn"),
                      Max("mx", alias_name="mx"))
           .to_pandas())
    fit = {}
    for _, r in agg.iterrows():
        n = float(r["n"]) or 1.0
        mean = r["s"] / n
        var = max(r["sq"] / n - mean * mean, 0.0)
        fit[r["col"]] = {"mean": mean, "std": float(np.sqrt(var)),
                         "min": float(r["mn"]), "max": float(r["mx"]),
                         "n": int(r["n"])}
    return fit


def transform_scaled(ds, fit: dict, *, mode: str = "standard",
                     suffix: str = "_scaled"):
    """Append ``<col><suffix>`` per fitted column: z-score
    (``standard``: (x-mean)/std, std 0 → 0) or ``minmax``
    ((x-min)/(max-min), degenerate range → 0).  Stateless vectorized
    pass; ``fit`` is a tiny dict shipped in the task closure."""
    if mode not in ("standard", "minmax"):
        raise ValueError(f"mode must be 'standard' or 'minmax', got {mode!r}")
    items = sorted(fit.items())

    def _f(t: pa.Table) -> pa.Table:
        for c, st in items:
            v = t[c].to_numpy(zero_copy_only=False).astype(np.float64)
            if mode == "standard":
                out = ((v - st["mean"]) / st["std"] if st["std"] > 0
                       else np.zeros_like(v))
            else:
                rng = st["max"] - st["min"]
                out = (v - st["min"]) / rng if rng > 0 else np.zeros_like(v)
            t = t.append_column(c + suffix, pa.array(out, type=pa.float64()))
        return t

    return ds.map_batches(_f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Misra-Gries
# ---------------------------------------------------------------------------

def _mg_one(tokens: list, k: int) -> dict:
    """Classic k-1-counter Misra-Gries over a token iterable."""
    c: dict = {}
    for x in tokens:
        if x in c:
            c[x] += 1
        elif len(c) < k - 1:
            c[x] = 1
        else:
            dead = [y for y in c if c[y] == 1]
            for y in c:
                c[y] -= 1
            for y in dead:
                del c[y]
    return c


def _mg_merge2(a: dict, b: dict, k: int) -> dict:
    """Merge two MG summaries (Agarwal et al. 2013): sum counters,
    keep the top k-1 after decrementing by the k-th largest."""
    out = dict(a)
    for x, n in b.items():
        out[x] = out.get(x, 0) + n
    if len(out) < k:
        return out
    vals = sorted(out.values(), reverse=True)
    kth = vals[k - 1]
    return {x: n - kth for x, n in out.items() if n > kth}


def misra_gries_partials(ds, col: str, *, k: int = 64):
    """Per-block MG summaries as ``(item, n)`` rows (≤ k-1 per block).

    The per-block summary is VECTORIZED: exact value counts via
    ``pc.value_counts`` (an exact count table is an MG summary with
    zero error), then one prune — subtract the k-th largest count and
    drop non-positives — which is exactly the Agarwal et al. merge
    reduction, so the mergeable-summaries n/k bound carries through
    (``_mg_one``, the textbook streaming loop, stays as the pinned
    reference implementation)."""

    def _f(t: pa.Table) -> pa.Table:
        ktype = t.schema.field(col).type
        vc = pc.value_counts(t[col].combine_chunks())
        items = vc.field("values")
        counts = vc.field("counts").to_numpy()
        if len(counts) >= k:
            kth = np.partition(counts, -k)[-k]
            keep = counts > kth
            items = items.filter(pa.array(keep))
            counts = counts[keep] - kth
        return pa.table({
            "item": items.cast(ktype),
            "n": pa.array(counts.astype(np.int64), type=pa.int64())})

    return ds.map_batches(_f, batch_format="pyarrow")


def misra_gries_merge(partials, *, k: int = 64) -> dict:
    """Driver merge of the partial summaries — O(blocks × k) rows ever
    reach the driver, independent of corpus size or vocabulary."""
    out: dict = {}
    for batch in partials.iter_batches(batch_format="pyarrow",
                                      batch_size=None):
        d = dict(zip(batch["item"].to_pylist(),
                     (int(x) for x in batch["n"].to_pylist())))
        out = _mg_merge2(out, d, k)
    return out


def misra_gries_topk(ds, col: str, *, k: int = 64) -> "list[tuple]":
    """Heavy-hitter candidates sorted by estimated count (desc, then
    item).  Guarantee: every item with true count > n/k appears;
    estimates err low by at most n/k."""
    merged = misra_gries_merge(misra_gries_partials(ds, col, k=k), k=k)
    return sorted(merged.items(), key=lambda x: (-x[1], str(x[0])))


# ---------------------------------------------------------------------------
# PCA (distributed fit: one partial-moments pass, driver eigh)
# ---------------------------------------------------------------------------


def pca_partials(ds, col: str):
    """Per-batch second-moment partials for a fixed-width
    ``list<float>`` column: ``(n, Σx, Σxxᵀ)`` — ONE narrow pass, one
    small row per batch (8·(d+d²) bytes), no shuffle.  The exact
    100-TB shape: the corpus streams once and only moment vectors
    reach the driver."""

    def _p(t: pa.Table) -> pa.Table:
        arr = t[col].combine_chunks()
        m = np.asarray(arr.flatten(), dtype=np.float64).reshape(
            t.num_rows, -1)
        d = m.shape[1] if t.num_rows else 0
        s = m.sum(axis=0) if t.num_rows else np.empty(0)
        ss = (m.T @ m).ravel() if t.num_rows else np.empty(0)
        return pa.table({
            "n": pa.array([t.num_rows], type=pa.int64()),
            "s": pa.ListArray.from_arrays(
                pa.array([0, d], type=pa.int64()), pa.array(s)),
            "ss": pa.ListArray.from_arrays(
                pa.array([0, d * d], type=pa.int64()), pa.array(ss)),
        })

    return ds.map_batches(_p, batch_format="pyarrow")


def fit_pca(ds, col: str, *, k: int = 2) -> dict:
    """Distributed PCA fit: reduce the moment partials on the driver,
    population covariance ``Σxxᵀ/n − μμᵀ``, one dense ``eigh`` on the
    d×d matrix (d is the embedding width — driver-sized by
    construction).  Component signs are made deterministic by flipping
    each eigenvector so its largest-|entry| coordinate is positive."""
    rows = pca_partials(ds, col).take_all()
    rows = [r for r in rows if r["n"] > 0]
    if not rows:
        raise ValueError("fit_pca: empty input")
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    ss = np.sum([np.asarray(r["ss"]) for r in rows], axis=0)
    d = len(s)
    mu = s / n
    cov = ss.reshape(d, d) / n - np.outer(mu, mu)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comp = v[:, order]
    flip = np.sign(comp[np.argmax(np.abs(comp), axis=0),
                        np.arange(comp.shape[1])])
    flip[flip == 0] = 1.0
    comp = comp * flip
    return {"mean": mu, "components": comp,
            "explained_variance": w[order], "n": int(n)}


def transform_pca(ds, fit: dict, col: str, *, out_prefix: str = "pc",
                  keep: list | None = None):
    """Project each row onto the fitted components (broadcast model,
    one matmul per batch): appends ``<prefix>1..<prefix>k``."""
    import ray

    ref = ray.put((np.asarray(fit["mean"]),
                   np.asarray(fit["components"])))

    def _f(t: pa.Table) -> pa.Table:
        mu, comp = ray.get(ref)
        arr = t[col].combine_chunks()
        m = np.asarray(arr.flatten(), dtype=np.float64).reshape(
            t.num_rows, -1)
        proj = (m - mu) @ comp if t.num_rows else \
            np.empty((0, comp.shape[1]))
        if keep is not None:
            t = t.select(keep)
        for j in range(proj.shape[1]):
            t = t.append_column(f"{out_prefix}{j + 1}",
                                pa.array(proj[:, j]))
        return t

    return ds.map_batches(_f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Leakage-safe grouped split + quantile binning
# ---------------------------------------------------------------------------

_KNUTH = 2654435761


def grouped_split(ds, key: str, *, splits=(("train", 80), ("val", 10),
                                           ("test", 10)),
                  out_col: str = "split"):
    """Deterministic leakage-safe train/val/test assignment: the split
    is a pure function of the KEY (Knuth multiplicative hash bucket
    mod 100), so every row of an entity lands in the same split — the
    grouped-split discipline that prevents per-entity leakage across
    folds.  Shuffle-free, partition-invariant, resumable (re-running
    assigns identically).  ``splits`` are (label, pct) with pcts
    summing to 100; integer keys only on the oracled path (string keys
    hash via blake2b, not SQL-expressible)."""
    labels = [s[0] for s in splits]
    pcts = np.cumsum([s[1] for s in splits])
    if pcts[-1] != 100:
        raise ValueError("split percentages must sum to 100")
    bounds = pcts[:-1]

    def _f(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy()
        if k.dtype.kind in "iu":
            bucket = ((k.astype(np.uint64) * np.uint64(_KNUTH))
                      % np.uint64(1 << 32)) % np.uint64(100)
        else:
            from netml_ray.dedup import _sha64
            bucket = _sha64([str(x) for x in k.tolist()]).view(
                np.uint64) % np.uint64(100)
        idx = np.searchsorted(bounds, bucket.astype(np.int64),
                              side="right")
        lab = pa.DictionaryArray.from_arrays(
            pa.array(idx.astype(np.int32)),
            pa.array(labels, type=pa.string()))
        return t.append_column(out_col, lab.cast(pa.string()))

    return ds.map_batches(_f, batch_format="pyarrow")


def add_quantile_bins(ds, col: str, *, qs=(0.25, 0.5, 0.75),
                      out_col: str | None = None):
    """Global quantile discretization: exact quantile edges in one
    pass (``sessionize.exact_quantiles`` — collected below threshold,
    distributed order-statistics above), rounded to 9 decimals (the
    interpolation hedge, so numpy and any reimplementation agree
    bit-exactly on the edges), then ``bin = #edges strictly below the
    value`` per batch via one searchsorted against the broadcast
    edges."""
    from netml_ray.sessionize import exact_quantiles

    edges = np.round(np.asarray(
        exact_quantiles(ds, col, list(qs)), dtype=np.float64), 9)
    out_col = out_col or f"{col}_bin"

    def _f(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy()
        b = np.searchsorted(edges, v, side="left")
        return t.append_column(out_col, pa.array(b.astype(np.int64)))

    return ds.map_batches(_f, batch_format="pyarrow"), edges


def target_encode(ds, cat_col: str, target_col: str, *, m: float = 10.0,
                  suffix: str = "_te", round_to: int | None = 9):
    """Smoothed target (mean) encoding of a categorical column:
    ``enc(c) = (Σ_c target + m·global_mean) / (n_c + m)`` — the
    standard leakage-prone-if-naive encoder done in the fit-then-
    transform shape: per-batch ``(cat, n, Σ)`` partials (one row per
    category per batch — categoricals are low-cardinality by
    assumption), driver reduce, broadcast map.  ``round_to`` hedges
    the float sum-order on the encoded value (SQL parity)."""

    def _p(t: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(t[cat_col].combine_chunks())
        codes = enc.indices.to_numpy()
        v = t[target_col].to_numpy(zero_copy_only=False).astype(np.float64)
        k = len(enc.dictionary)
        return pa.table({
            "cat": enc.dictionary.cast(pa.string()),
            "n": pa.array(np.bincount(codes, minlength=k)
                          .astype(np.int64)),
            "s": pa.array(np.bincount(codes, weights=v, minlength=k)),
        })

    agg: dict[str, list] = {}
    for r in ds.map_batches(_p, batch_format="pyarrow").take_all():
        e = agg.setdefault(r["cat"], [0, 0.0])
        e[0] += r["n"]
        e[1] += r["s"]
    tot_n = sum(v[0] for v in agg.values())
    tot_s = sum(v[1] for v in agg.values())
    gm = tot_s / max(tot_n, 1)
    enc_map = {c: (s + m * gm) / (n + m) for c, (n, s) in agg.items()}

    def _f(t: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(t[cat_col].combine_chunks())
        vals = np.array([enc_map.get(c, gm)
                         for c in enc.dictionary.to_pylist()])
        out = vals[enc.indices.to_numpy()] if t.num_rows else \
            np.empty(0, dtype=np.float64)
        if round_to is not None:
            out = np.round(out, round_to)
        return t.append_column(cat_col + suffix, pa.array(out))

    return ds.map_batches(_f, batch_format="pyarrow")


def group_zscore(ds, key_col: str, col: str, *, suffix: str = "_gz",
                 round_to: int | None = 9):
    """Within-group standardization ``(x - mean_g) / std_g`` (population
    std; a single-member or constant group → 0), the per-entity feature
    normalizer (recasts netml's per-flow normalization of packet-size /
    IAT series, reference parser.py:767-817, as a keyed column op).

    Same fit-then-transform shape as :func:`target_encode`: per-batch
    ``(key, n, Σ, Σ²)`` partials (one row per key per batch), a driver
    reduce, and a broadcast vectorized map — NO shuffle of the data
    itself.  Driver state is O(#groups); for key cardinalities beyond
    driver memory use ``partition.partition_map`` with a per-run moment
    pass instead (one hash exchange) — this broadcast path is the right
    shape for the common case (entities ≪ rows)."""

    def _p(t: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(t[key_col].combine_chunks())
        codes = enc.indices.to_numpy()
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        k = len(enc.dictionary)
        return pa.table({
            "k": enc.dictionary,
            "n": pa.array(np.bincount(codes, minlength=k).astype(np.int64)),
            "s": pa.array(np.bincount(codes, weights=v, minlength=k)),
            "ss": pa.array(np.bincount(codes, weights=v * v, minlength=k)),
        })

    agg: dict = {}
    for r in ds.map_batches(_p, batch_format="pyarrow").take_all():
        e = agg.setdefault(r["k"], [0, 0.0, 0.0])
        e[0] += r["n"]
        e[1] += r["s"]
        e[2] += r["ss"]
    stats = {}
    for k, (n, s, ss) in agg.items():
        mu = s / n
        var = max(ss / n - mu * mu, 0.0)
        stats[k] = (mu, np.sqrt(var))

    def _f(t: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(t[key_col].combine_chunks())
        dvals = enc.dictionary.to_pylist()
        mus = np.array([stats.get(c, (0.0, 0.0))[0] for c in dvals])
        sds = np.array([stats.get(c, (0.0, 0.0))[1] for c in dvals])
        idx = enc.indices.to_numpy() if t.num_rows else \
            np.empty(0, dtype=np.int64)
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        sd = sds[idx] if t.num_rows else np.empty(0)
        mu = mus[idx] if t.num_rows else np.empty(0)
        with np.errstate(invalid="ignore", divide="ignore"):
            out = np.where(sd > 0, (v - mu) / np.where(sd > 0, sd, 1.0), 0.0)
        if round_to is not None:
            out = np.round(out, round_to)
        return t.append_column(col + suffix, pa.array(out))

    return ds.map_batches(_f, batch_format="pyarrow")


def onehot_encode(ds, col: str, *, categories: list | None = None,
                  sep: str = "__"):
    """One-hot encode a low-cardinality string column: appends one
    int64 0/1 column ``<col><sep><value>`` per distinct value
    (discovered in a tiny per-batch-unique partial pass when
    ``categories`` is not given; sorted for a deterministic layout).
    The category list is broadcast in the transform closure — the data
    itself is never shuffled.  Unseen values at transform time (when
    ``categories`` is pinned from a training corpus) get all-zeros,
    the standard handle_unknown='ignore' behavior."""
    if categories is None:
        def _u(t: pa.Table) -> pa.Table:
            return pa.table({"v": pc.unique(t[col].combine_chunks())})

        cats = set()
        for r in ds.map_batches(_u, batch_format="pyarrow").take_all():
            if r["v"] is not None:
                cats.add(r["v"])
        categories = sorted(cats)

    def _f(t: pa.Table) -> pa.Table:
        v = t[col].combine_chunks()
        for c in categories:
            t = t.append_column(
                f"{col}{sep}{c}",
                pc.fill_null(pc.cast(pc.equal(v, c), pa.int64()), 0))
        return t

    return ds.map_batches(_f, batch_format="pyarrow")


def feature_hash(ds, cols: list[str], *, n_buckets: int = 1024,
                 out_col: str | None = None, sep: str = "|"):
    """The hashing trick for (crossed) categorical features: bucket =
    ``md5(col1 | col2 | ...) mod n_buckets`` — the standard fixed-width
    encoder for unbounded-cardinality categoricals (domains, urls,
    user ids) where one-hot / target-encoding state would explode.
    Weinberger et al. 2009 ("Feature Hashing for Large Scale Multitask
    Learning"); with more than one column this is also the classic
    crossed-feature construction.

    Stateless and shuffle-free: no fit pass, no driver state, no
    vocabulary anywhere — the property that makes it THE encoder at
    10^12 rows.  Deterministic across runs/cluster sizes, and
    SQL-expressible for the oracle:
    ``('0x' || substr(md5(key), 1, 15))::BIGINT % n_buckets`` equals
    ``int(md5(key.encode()).hexdigest()[:15], 16) % n_buckets``
    (60 bits, fits int64; verified bit-equal vs DuckDB).  NULL cells
    enter the key as '' (COALESCE on the SQL side).  md5 runs once per
    DISTINCT key per batch (dictionary-encode then gather), so the
    per-batch Python loop is over the small per-batch vocabulary, not
    rows."""
    import hashlib

    if out_col is None:
        out_col = "_".join(cols) + "_fh"

    def _f(t: pa.Table) -> pa.Table:
        parts = []
        for i, c in enumerate(cols):
            if i:
                parts.append(pa.array([sep] * t.num_rows, type=pa.string()))
            col = t[c].combine_chunks()
            if not pa.types.is_string(col.type):
                col = pc.cast(col, pa.string())
            parts.append(pc.fill_null(col, ""))
        key = (pc.binary_join_element_wise(*parts, "")
               if len(parts) > 1 else parts[0])
        enc = pc.dictionary_encode(key)
        dvals = np.array(
            [int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % n_buckets
             for s in enc.dictionary.to_pylist()], dtype=np.int64)
        idx = enc.indices.to_numpy() if t.num_rows else \
            np.empty(0, dtype=np.int64)
        out = dvals[idx] if t.num_rows else np.empty(0, dtype=np.int64)
        return t.append_column(out_col, pa.array(out, type=pa.int64()))

    return ds.map_batches(_f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# distributed k-means (Lloyd's)
# ---------------------------------------------------------------------------

def _kmeans_matrix(t: pa.Table, col: str) -> np.ndarray:
    arr = t[col].combine_chunks()
    return np.asarray(arr.flatten(), dtype=np.float64).reshape(
        t.num_rows, -1)


def _kmeans_assign(m: np.ndarray, cent: np.ndarray,
                   round_to: int | None) -> np.ndarray:
    """Nearest centroid per row: Euclidean distance, rounded to
    ``round_to`` before the argmin (the repo's standard float
    sum-order hedge, so an SQL oracle computing the same rounded
    distance picks the same centroid), lowest centroid id on ties."""
    # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2, but the expanded form
    # loses ~8 digits to cancellation — compute the exact difference
    # norm per centroid instead (k small; one (B,d) temp per centroid)
    d2 = np.empty((m.shape[0], len(cent)))
    for j in range(len(cent)):
        diff = m - cent[j]
        d2[:, j] = np.einsum("ij,ij->i", diff, diff)
    dist = np.sqrt(d2)
    if round_to is not None:
        dist = np.round(dist, round_to)
    return np.argmin(dist, axis=1)  # first (lowest cid) on ties


def kmeans_fit(ds, col: str, *, init: np.ndarray, iters: int = 2,
               round_to: int | None = 9) -> np.ndarray:
    """Distributed Lloyd's k-means over a fixed-width ``list<float>``
    column (the clustering the IVF index trains on a driver-side
    sample — ``similarity.train_ivf_centroids`` — done over the FULL
    dataset): per iteration ONE narrow pass of per-batch partials
    ``(cid, n_j, Σ_j x)`` (k·(d+1) doubles per batch, no shuffle),
    driver reduce, new centroid = mean, broadcast for the next
    iteration.  Deterministic: ``init`` is explicit (pass e.g. the
    k lowest-id rows), assignment ties break to the lowest centroid
    id, and both distances and updated centroids are rounded to
    ``round_to`` so a SQL oracle reproducing the same rounding is
    bit-comparable.  An empty cluster keeps its previous centroid."""
    cent = np.asarray(init, dtype=np.float64)
    k, d = cent.shape

    for _ in range(iters):
        frozen = cent

        def _p(t: pa.Table) -> pa.Table:
            m = _kmeans_matrix(t, col)
            if not len(m):
                return pa.table({
                    "cid": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                    "s": pa.array([], type=pa.list_(pa.float64()))})
            a = _kmeans_assign(m, frozen, round_to)
            sums = np.zeros((k, d))
            np.add.at(sums, a, m)
            n = np.bincount(a, minlength=k).astype(np.int64)
            live = np.flatnonzero(n)
            offs = np.arange(len(live) + 1, dtype=np.int64) * d
            return pa.table({
                "cid": pa.array(live.astype(np.int64)),
                "n": pa.array(n[live]),
                "s": pa.ListArray.from_arrays(
                    pa.array(offs), pa.array(sums[live].ravel()))})

        tot_n = np.zeros(k, dtype=np.int64)
        tot_s = np.zeros((k, d))
        for r in ds.map_batches(_p, batch_format="pyarrow").take_all():
            tot_n[r["cid"]] += r["n"]
            tot_s[r["cid"]] += np.asarray(r["s"])
        nxt = cent.copy()
        live = tot_n > 0
        nxt[live] = tot_s[live] / tot_n[live, None]
        if round_to is not None:
            nxt[live] = np.round(nxt[live], round_to)
        cent = nxt
    return cent


def kmeans_predict(ds, centroids: np.ndarray, col: str, *,
                   out_col: str = "cluster",
                   round_to: int | None = 9):
    """Assign each row to its nearest centroid (same rounded-distance
    / lowest-id tie rule as the fit pass); centroids broadcast in the
    task closure, one stateless vectorized pass."""
    cent = np.asarray(centroids, dtype=np.float64)

    def _f(t: pa.Table) -> pa.Table:
        m = _kmeans_matrix(t, col)
        a = (_kmeans_assign(m, cent, round_to) if len(m)
             else np.empty(0, dtype=np.int64))
        return t.append_column(out_col, pa.array(a.astype(np.int64)))

    return ds.map_batches(_f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# higher moments / correlation / robust scaling
# ---------------------------------------------------------------------------

def _group_power_sums(ds, key_col: str, cols_powers):
    """One narrow pass of per-batch per-key power sums.

    ``cols_powers`` is ``[(name, fn)]`` where ``fn(batch_table) ->
    float64 ndarray`` yields the per-row quantity to sum; each batch
    emits one row per key present (a handful of doubles), so the driver
    reduce is O(batches × keys) — the same no-shuffle fit shape as
    :func:`group_zscore`.  Returns ``{key: [n, sum_1, sum_2, ...]}``."""

    names = [n for n, _ in cols_powers]

    def _p(t: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(t[key_col].combine_chunks())
        codes = enc.indices.to_numpy()
        k = len(enc.dictionary)
        out = {"k": enc.dictionary,
               "n": pa.array(np.bincount(codes, minlength=k)
                             .astype(np.int64))}
        for name, fn in cols_powers:
            w = fn(t)
            out[name] = pa.array(np.bincount(codes, weights=w,
                                             minlength=k))
        return pa.table(out)

    agg: dict = {}
    for r in ds.map_batches(_p, batch_format="pyarrow").take_all():
        e = agg.setdefault(r["k"], [0] + [0.0] * len(names))
        e[0] += r["n"]
        for i, name in enumerate(names):
            e[1 + i] += r[name]
    return agg


def group_moments(ds, key_col: str, col: str, *,
                  round_to: int | None = 9) -> pa.Table:
    """Per-key count / mean / sample std / sample skewness / sample
    excess kurtosis in ONE narrow pass of power-sum partials
    (n, Σx, Σx², Σx³, Σx⁴ per key per batch — five doubles; no data
    shuffle, driver state O(#keys)).

    The bias-corrected estimators match SQL exactly (DuckDB
    ``skewness`` = G1 = g1·√(n(n-1))/(n-2), ``kurtosis`` = G2 =
    ((n+1)·g2 + 6)·(n-1)/((n-2)(n-3)) where g1 = m3/m2^1.5 and
    g2 = m4/m2² − 3 are the biased moment ratios); groups too small
    for the correction (n<3 / n<4) or with zero variance get NULL,
    the SQL rule.  This recasts netml's per-flow distributional
    features (reference parser.py STATS family) as a keyed moments
    aggregate."""

    v_of = lambda t: t[col].to_numpy(zero_copy_only=False).astype(np.float64)  # noqa: E731
    agg = _group_power_sums(ds, key_col, [
        ("s1", v_of),
        ("s2", lambda t: v_of(t) ** 2),
        ("s3", lambda t: v_of(t) ** 3),
        ("s4", lambda t: v_of(t) ** 4),
    ])

    keys = sorted(agg)
    rows = {"k": [], "n": [], "mean": [], "std": [], "skew": [],
            "kurt": []}
    for k in keys:
        n, s1, s2, s3, s4 = agg[k]
        mu = s1 / n
        # central moments from raw power sums
        m2 = s2 / n - mu * mu
        m3 = s3 / n - 3 * mu * s2 / n + 2 * mu ** 3
        m4 = (s4 / n - 4 * mu * s3 / n + 6 * mu * mu * s2 / n
              - 3 * mu ** 4)
        m2 = max(m2, 0.0)
        std = (np.sqrt(m2 * n / (n - 1)) if n > 1 else None)
        skew = kurt = None
        if n >= 3 and m2 > 0:
            g1 = m3 / m2 ** 1.5
            skew = g1 * np.sqrt(n * (n - 1.0)) / (n - 2)
        if n >= 4 and m2 > 0:
            g2 = m4 / (m2 * m2) - 3.0
            kurt = ((n + 1.0) * g2 + 6) * (n - 1.0) / ((n - 2) * (n - 3))
        if round_to is not None:
            mu = round(mu, round_to)
            std = None if std is None else round(std, round_to)
            skew = None if skew is None else round(skew, round_to)
            kurt = None if kurt is None else round(kurt, round_to)
        rows["k"].append(k)
        rows["n"].append(n)
        rows["mean"].append(mu)
        rows["std"].append(std)
        rows["skew"].append(skew)
        rows["kurt"].append(kurt)
    return pa.table({
        key_col: pa.array(rows["k"]),
        "n": pa.array(rows["n"], type=pa.int64()),
        f"mean_{col}": pa.array(rows["mean"], type=pa.float64()),
        f"std_{col}": pa.array(rows["std"], type=pa.float64()),
        f"skew_{col}": pa.array(rows["skew"], type=pa.float64()),
        f"kurt_{col}": pa.array(rows["kurt"], type=pa.float64()),
    })


def group_corr(ds, key_col: str, xcol: str, ycol: str, *,
               out_col: str | None = None,
               round_to: int | None = 9) -> pa.Table:
    """Per-key sample Pearson correlation in ONE narrow pass of
    (n, Σx, Σy, Σx², Σy², Σxy) partials — six doubles per key per
    batch, no shuffle.  NULL-pair rows are dropped first (the SQL
    ``corr`` rule); keys with n<2 or a zero-variance side get NULL."""

    out_col = out_col or f"corr_{xcol}_{ycol}"

    def _pair(t: pa.Table):
        x = t[xcol].combine_chunks() if isinstance(t[xcol], pa.ChunkedArray) else t[xcol]
        y = t[ycol].combine_chunks() if isinstance(t[ycol], pa.ChunkedArray) else t[ycol]
        ok = pc.and_(pc.is_valid(x), pc.is_valid(y))
        return t.filter(ok)

    x_of = lambda t: t[xcol].to_numpy(zero_copy_only=False).astype(np.float64)  # noqa: E731
    y_of = lambda t: t[ycol].to_numpy(zero_copy_only=False).astype(np.float64)  # noqa: E731

    filtered = ds.map_batches(_pair, batch_format="pyarrow")
    agg = _group_power_sums(filtered, key_col, [
        ("sx", x_of),
        ("sy", y_of),
        ("sxx", lambda t: x_of(t) ** 2),
        ("syy", lambda t: y_of(t) ** 2),
        ("sxy", lambda t: x_of(t) * y_of(t)),
    ])

    keys = sorted(agg)
    vals = []
    for k in keys:
        n, sx, sy, sxx, syy, sxy = agg[k]
        r = None
        if n >= 2:
            vx = sxx - sx * sx / n
            vy = syy - sy * sy / n
            cov = sxy - sx * sy / n
            if vx > 0 and vy > 0:
                r = cov / np.sqrt(vx * vy)
                if round_to is not None:
                    r = round(r, round_to)
        vals.append(r)
    return pa.table({key_col: pa.array(keys),
                     out_col: pa.array(vals, type=pa.float64())})


def robust_zscore(ds, key_col: str, col: str, *, suffix: str = "_rz",
                  round_to: int | None = 9):
    """Median/MAD standardization ``(x − median_g) / MAD_g`` per key
    (MAD = median of |x − median_g|, the outlier-robust alternative to
    :func:`group_zscore`; MAD = 0 → 0).

    Exact medians need order statistics, so this is two
    ``groupby_quantiles`` passes (one hash shuffle each, driver state
    O(#keys)) plus one broadcast vectorized transform — use it for
    moderate key cardinality (entity types, sources), not for
    per-entity keys in the millions."""
    from .windows import groupby_quantiles

    med_t = groupby_quantiles(ds, key_col, col, [0.5], round_to=None)
    med = {r[key_col]: r[f"q05_{col}"]
           for r in med_t.take_all()}

    def _gather(t: pa.Table, table: dict) -> np.ndarray:
        if not t.num_rows:
            return np.empty(0)
        enc = pc.dictionary_encode(t[key_col].combine_chunks())
        vals = np.array([table[c] for c in enc.dictionary.to_pylist()])
        return vals[enc.indices.to_numpy()]

    def _absdev(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        m = _gather(t, med)
        return t.append_column("_absdev", pa.array(np.abs(v - m)))

    mad_t = groupby_quantiles(
        ds.map_batches(_absdev, batch_format="pyarrow"),
        key_col, "_absdev", [0.5], round_to=None)
    mad = {r[key_col]: r["q05__absdev"] for r in mad_t.take_all()}

    def _f(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        m = _gather(t, med)
        s = _gather(t, mad)
        with np.errstate(invalid="ignore", divide="ignore"):
            out = np.where(s > 0, (v - m) / np.where(s > 0, s, 1.0), 0.0)
        if round_to is not None:
            out = np.round(out, round_to)
        return t.append_column(col + suffix, pa.array(out))

    return ds.map_batches(_f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# grouped categorical statistics (entropy / mode / mutual information)
# ---------------------------------------------------------------------------

def _cat_count_partials(ds, key_col: str, cat_col: str):
    """Per-batch (key, cat, n) count partials — a narrow pass that
    shrinks the exchange from rows to distinct (key, cat) pairs per
    batch (vectorized: one dictionary-encode per column + a combined
    bincount).  Feed the result to ``partition_map`` keyed on
    ``key_col`` so the per-key finalize scales to millions of keys
    without driver state."""

    def _p(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({key_col: t[key_col], cat_col: t[cat_col],
                             "n": pa.array([], type=pa.int64())})
        ke = pc.dictionary_encode(t[key_col].combine_chunks())
        ce = pc.dictionary_encode(t[cat_col].combine_chunks())
        kc = ke.indices.to_numpy().astype(np.int64)
        cc = ce.indices.to_numpy().astype(np.int64)
        ncat = len(ce.dictionary)
        comb = kc * ncat + cc
        cnt = np.bincount(comb, minlength=len(ke.dictionary) * ncat)
        nz = np.flatnonzero(cnt)
        return pa.table({
            key_col: ke.dictionary.take(pa.array(nz // ncat)),
            cat_col: ce.dictionary.take(pa.array(nz % ncat)),
            "n": pa.array(cnt[nz], type=pa.int64()),
        })

    return ds.map_batches(_p, batch_format="pyarrow")


def _run_bounds(keys: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Start indices and run ids for equal-key runs of a SORTED array."""
    m = len(keys)
    starts = np.ones(m, dtype=bool)
    if m > 1:
        starts[1:] = np.asarray(pc.not_equal(
            keys.slice(1, m - 1), keys.slice(0, m - 1)).to_numpy(
            zero_copy_only=False), dtype=bool)
    return np.flatnonzero(starts), np.cumsum(starts) - 1


def group_entropy(ds, key_col: str, cat_col: str, *,
                  out_col: str = "entropy", round_to: int | None = 9):
    """Shannon entropy (nats) of a categorical per key.

    Shape: one narrow (key, cat, n) partial pass, then ONE hash
    exchange of those pre-aggregated counts through ``partition_map``
    — the shuffle moves distinct pairs, not rows, and per-key state
    never touches the driver.  The classic behavioral-diversity /
    label-noise feature (e.g. entropy of event types per user)."""
    from .partition import partition_map

    def _fin(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({key_col: t[key_col],
                             out_col: pa.array([], type=pa.float64())})
        # merge duplicate (key, cat) partials, then reduce per key run
        agg = t.group_by([key_col, cat_col]).aggregate([("n", "sum")])
        agg = agg.sort_by([(key_col, "ascending"), (cat_col, "ascending")])
        starts, run_id = _run_bounds(agg[key_col].combine_chunks())
        n = agg["n_sum"].to_numpy().astype(np.float64)
        tot = np.bincount(run_id, weights=n)
        p = n / tot[run_id]
        h = np.bincount(run_id, weights=-p * np.log(p))
        if round_to is not None:
            h = np.round(h, round_to)
        return pa.table({
            key_col: agg[key_col].combine_chunks().take(pa.array(starts)),
            out_col: pa.array(h, type=pa.float64()),
        })

    return partition_map(_cat_count_partials(ds, key_col, cat_col),
                         key_col, _fin, sort_by=[key_col, cat_col])


def group_mode(ds, key_col: str, cat_col: str, *,
               out_col: str | None = None):
    """Most frequent categorical value per key (ties broken by the
    smallest value — the deterministic SQL ``ROW_NUMBER`` rule).  Same
    scale shape as :func:`group_entropy`: narrow count partials, one
    pre-aggregated hash exchange, vectorized per-run argmax."""
    from .partition import partition_map

    out_col = out_col or f"mode_{cat_col}"

    def _fin(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({key_col: t[key_col],
                             out_col: t[cat_col]})
        agg = t.group_by([key_col, cat_col]).aggregate([("n", "sum")])
        # sort so the winner is the FIRST row of each key run:
        # count desc, category asc
        agg = agg.sort_by([(key_col, "ascending"),
                           ("n_sum", "descending"),
                           (cat_col, "ascending")])
        starts, _ = _run_bounds(agg[key_col].combine_chunks())
        take = pa.array(starts)
        return pa.table({
            key_col: agg[key_col].combine_chunks().take(take),
            out_col: agg[cat_col].combine_chunks().take(take),
        })

    return partition_map(_cat_count_partials(ds, key_col, cat_col),
                         key_col, _fin, sort_by=[key_col, cat_col])


def mutual_information(ds, xcol: str, ycol: str, *,
                       round_to: int | None = 9) -> float:
    """Mutual information (nats) between two categorical columns:
    I(X;Y) = Σ p(x,y)·ln(p(x,y)/(p(x)p(y))).

    One narrow (x, y, n) partial pass; the driver merge is
    O(batches × |X|·|Y|) — bounded by the categorical cardinalities,
    never the row count.  The standard feature-selection /
    redundancy screen over categorical feature pairs."""
    agg: dict = {}
    for r in _cat_count_partials(ds, xcol, ycol).take_all():
        kk = (r[xcol], r[ycol])
        agg[kk] = agg.get(kk, 0) + r["n"]
    tot = float(sum(agg.values()))
    px: dict = {}
    py: dict = {}
    for (x, y), n in agg.items():
        px[x] = px.get(x, 0) + n
        py[y] = py.get(y, 0) + n
    mi = 0.0
    for (x, y), n in agg.items():
        pxy = n / tot
        mi += pxy * np.log(pxy / ((px[x] / tot) * (py[y] / tot)))
    mi = max(mi, 0.0)
    return round(mi, round_to) if round_to is not None else mi


def target_encode_oof(ds, cat_col: str, target_col: str, id_col: str, *,
                      n_folds: int = 5, m: float = 10.0,
                      suffix: str = "_te_oof",
                      round_to: int | None = 9):
    """LEAKAGE-SAFE (out-of-fold) smoothed target encoding: each row's
    encoding uses only statistics from the OTHER folds —
    ``enc = (S_c − S_{c,f} + m·gm_f) / (N_c − N_{c,f} + m)`` with
    ``gm_f`` the out-of-fold global mean — so a row's own target never
    reaches its own feature (the K-fold rule from the target-encoding
    literature; naive :func:`target_encode` leaks and overfits on
    rare categories).

    Fold assignment is a pure function of the row id
    (``md5(id) mod n_folds`` — the same DuckDB-bit-equal trick as
    :func:`feature_hash`), so it is deterministic across runs, cluster
    sizes and partitionings — the property that makes the split
    reproducible at 10^12 rows with no stored fold table.

    Shape: ONE narrow (fold, cat, n, Σ) partial pass (≤ folds×cats
    rows per batch), driver reduce, broadcast map — no shuffle."""
    import hashlib

    def _fold_codes(t: pa.Table) -> np.ndarray:
        ids = t[id_col].combine_chunks()
        if not pa.types.is_string(ids.type):
            ids = pc.cast(ids, pa.string())
        enc = pc.dictionary_encode(ids)
        dvals = np.array(
            [int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % n_folds
             for s in enc.dictionary.to_pylist()], dtype=np.int64)
        return (dvals[enc.indices.to_numpy()] if t.num_rows
                else np.empty(0, dtype=np.int64))

    def _p(t: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(t[cat_col].combine_chunks())
        codes = enc.indices.to_numpy().astype(np.int64)
        folds = _fold_codes(t)
        v = t[target_col].to_numpy(zero_copy_only=False).astype(np.float64)
        k = len(enc.dictionary)
        comb = codes * n_folds + folds
        n = np.bincount(comb, minlength=k * n_folds)
        s = np.bincount(comb, weights=v, minlength=k * n_folds)
        nz = np.flatnonzero(n)
        return pa.table({
            "cat": enc.dictionary.cast(pa.string()).take(
                pa.array(nz // n_folds)),
            "fold": pa.array(nz % n_folds, type=pa.int64()),
            "n": pa.array(n[nz], type=pa.int64()),
            "s": pa.array(s[nz], type=pa.float64()),
        })

    agg: dict = {}
    for r in ds.map_batches(_p, batch_format="pyarrow").take_all():
        e = agg.setdefault((r["cat"], r["fold"]), [0, 0.0])
        e[0] += r["n"]
        e[1] += r["s"]
    cats = sorted({c for c, _ in agg})
    cat_tot = {c: [0, 0.0] for c in cats}
    fold_tot = [[0, 0.0] for _ in range(n_folds)]
    nt, st = 0, 0.0
    for (c, f), (n, s) in agg.items():
        cat_tot[c][0] += n
        cat_tot[c][1] += s
        fold_tot[f][0] += n
        fold_tot[f][1] += s
        nt += n
        st += s
    # enc_map[(cat, fold)] and per-fold default for unseen cats
    gm_f = [(st - fs) / max(nt - fn, 1)
            for fn, fs in fold_tot]
    enc_map: dict = {}
    for c in cats:
        nc, sc = cat_tot[c]
        for f in range(n_folds):
            nf, sf = agg.get((c, f), (0, 0.0))
            enc_map[(c, f)] = ((sc - sf) + m * gm_f[f]) / ((nc - nf) + m)

    def _f(t: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(t[cat_col].combine_chunks())
        folds = _fold_codes(t)
        dvals = enc.dictionary.to_pylist()
        idx = (enc.indices.to_numpy() if t.num_rows
               else np.empty(0, dtype=np.int64))
        out = np.array([enc_map.get((dvals[i], f), gm_f[f])
                        for i, f in zip(idx, folds)], dtype=np.float64)
        if round_to is not None:
            out = np.round(out, round_to)
        return t.append_column(cat_col + suffix, pa.array(out))

    return ds.map_batches(_f, batch_format="pyarrow")


def frequency_encode(ds, col: str, *, round_to: int | None = None):
    """Frequency (count) encoding: append ``<col>_count`` (global
    occurrence count of the row's category) and ``<col>_freq``
    (count / total rows) — the zero-leakage categorical encoder that
    needs no target column.  SQL: ``count(*) OVER (PARTITION BY col)``
    and its ratio to ``count(*) OVER ()``.

    The broadcast-small-side shape: pass 1 is map-side per-batch
    ``value_counts`` partials (one row per distinct category per
    batch, no shuffle) folded on the driver — bounded by the category
    cardinality, NOT the row count; pass 2 attaches via one
    ``pc.index_in`` lookup against the broadcast table per batch.
    """
    parts = ds.map_batches(
        lambda t: (lambda vc: pa.table({
            "v": vc.field("values"), "n": vc.field("counts")}))(
                pc.value_counts(t[col].combine_chunks())),
        batch_format="pyarrow").take_all()
    counts: dict = {}
    for r in parts:
        counts[r["v"]] = counts.get(r["v"], 0) + r["n"]
    total = sum(counts.values())
    keys = pa.array(list(counts.keys()))
    cnt_arr = np.fromiter(counts.values(), dtype=np.int64,
                          count=len(counts))
    freq_arr = cnt_arr / float(total)
    if round_to is not None:
        freq_arr = np.round(freq_arr, round_to)

    def _attach(t: pa.Table) -> pa.Table:
        code = pc.index_in(t[col], value_set=keys).to_numpy(
            zero_copy_only=False).astype(np.int64)
        t = t.append_column(f"{col}_count",
                            pa.array(cnt_arr[code]))
        return t.append_column(f"{col}_freq", pa.array(freq_arr[code]))

    return ds.map_batches(_attach, batch_format="pyarrow")


def welch_ttest(ds, group_col: str, value_col: str, a, b,
                *, round_to: int | None = None) -> pa.Table:
    """Two-sample Welch t-test between groups ``a`` and ``b`` of
    ``group_col`` on ``value_col`` — the A/B-metrics primitive.
    Returns ONE row: n/mean/sample-variance per group, the Welch t
    statistic and the Welch–Satterthwaite degrees of freedom,
    computed exactly as the SQL oracle states them (avg / var_samp;
    t = (ma-mb)/sqrt(va/na + vb/nb)).

    Scale shape: one narrow pass of per-batch (n, Σ, Σx²) partials for
    each group — six doubles per batch, no shuffle, driver combine.
    Sample variance from the power sums: var = (Σx² - n·mean²)/(n-1),
    adequate at double precision for feature columns and EXACTLY the
    mergeable-partial route every other moments op here uses.
    """
    def _partial(t: pa.Table) -> pa.Table:
        out = []
        for g in (a, b):
            m = pc.fill_null(pc.equal(t[group_col], g), False)
            v = pc.filter(t[value_col], m).to_numpy(
                zero_copy_only=False).astype(np.float64)
            v = v[~np.isnan(v)]
            out.append((len(v), v.sum() if len(v) else 0.0,
                        (v * v).sum() if len(v) else 0.0))
        return pa.table({
            "g": pa.array([0, 1], type=pa.int64()),
            "n": pa.array([out[0][0], out[1][0]], type=pa.int64()),
            "s": pa.array([out[0][1], out[1][1]]),
            "sq": pa.array([out[0][2], out[1][2]])})

    agg = np.zeros((2, 3))
    for bt in ds.map_batches(_partial, batch_format="pyarrow") \
                .iter_batches(batch_size=None, batch_format="pyarrow"):
        g = bt["g"].to_numpy()
        agg[g, 0] += bt["n"].to_numpy()
        agg[g, 1] += bt["s"].to_numpy()
        agg[g, 2] += bt["sq"].to_numpy()
    (na, sa, qa), (nb, sb, qb) = agg
    ma, mb = sa / na, sb / nb
    va = (qa - na * ma * ma) / (na - 1.0)
    vb = (qb - nb * mb * mb) / (nb - 1.0)
    se2 = va / na + vb / nb
    tstat = (ma - mb) / np.sqrt(se2)
    df = se2 * se2 / ((va / na) ** 2 / (na - 1.0)
                      + (vb / nb) ** 2 / (nb - 1.0))
    vals = {"n_a": int(na), "n_b": int(nb), "mean_a": ma, "mean_b": mb,
            "var_a": va, "var_b": vb, "t_stat": tstat, "df": df}
    if round_to is not None:
        for k in ("mean_a", "mean_b", "var_a", "var_b", "t_stat", "df"):
            vals[k] = float(np.round(vals[k], round_to))
    return pa.table({k: pa.array([v]) for k, v in vals.items()})


def _jl_signs(d_in: int, d_out: int) -> np.ndarray:
    """Deterministic ±1 sign matrix keyed by md5(f"{i}_{j}") parity —
    the same DuckDB-bit-equal construction as ``feature_hash`` (
    ``('0x' || substr(md5(i || '_' || j), 1, 15))::BIGINT % 2``), so
    the SQL oracle regenerates the IDENTICAL matrix from scratch."""
    import hashlib

    s = np.empty((d_in, d_out), dtype=np.float64)
    for i in range(d_in):
        for j in range(d_out):
            h = int(hashlib.md5(f"{i}_{j}".encode()).hexdigest()[:15], 16)
            s[i, j] = 1.0 if h % 2 == 0 else -1.0
    return s


def random_projection(ds, col: str, id_col: str, *, d_in: int,
                      d_out: int = 8, round_to: int | None = None):
    """Johnson–Lindenstrauss-style signed random projection of an
    embedding ``list<float>`` column to ``d_out`` dims:
    ``proj_j = Σ_i x_i · sign(i,j) / sqrt(d_out)`` with the
    deterministic md5-parity sign matrix (Achlioptas 2003's ±1
    database-friendly variant, seeded so SQL can rebuild it) — the
    stateless dimensionality reducer for when PCA's fit pass is too
    expensive or must be reproducible across disjoint runs.

    Returns LONG format ``(id, j, proj)``.  One stateless vectorized
    pass: the d_in × d_out matrix ships in the task closure
    (kilobytes); per batch one float64 matmul.
    """
    S = _jl_signs(d_in, d_out) / np.sqrt(float(d_out))

    def _f(t: pa.Table) -> pa.Table:
        m = _kmeans_matrix(t, col).astype(np.float64)
        if m.shape[1] != d_in:
            raise ValueError(
                f"random_projection: expected {d_in}-dim vectors, "
                f"got {m.shape[1]}")
        proj = m @ S
        if round_to is not None:
            proj = np.round(proj, round_to)
        n = len(m)
        ids = np.repeat(t[id_col].to_numpy(), d_out)
        return pa.table({
            id_col: pa.array(ids),
            "j": pa.array(np.tile(np.arange(d_out, dtype=np.int64), n)),
            "proj": pa.array(proj.reshape(-1))})

    return ds.map_batches(_f, batch_format="pyarrow")


def woe_iv(ds, cat_col: str, label_col: str, *,
           round_to: int | None = 9):
    """Weight-of-evidence encoding + information value of a
    categorical feature against a binary label — the classic
    credit-scoring / feature-screening pair (Siddiqi, "Credit Risk
    Scorecards", 2006): for each category c,
    ``woe_c = ln((n1_c/N1) / (n0_c/N0))`` and the feature's
    ``iv = Σ_c (n1_c/N1 − n0_c/N0) · woe_c``.

    Categories seen on only one label side carry infinite WOE; they
    are DROPPED from both the per-category table and the IV sum (the
    standard practice absent smoothing) — the SQL oracle must state
    the identical ``HAVING n0 > 0 AND n1 > 0`` rule.

    Returns ``(pa.Table with (cat, n0, n1, woe), iv)``.  Shape: ONE
    narrow (cat, label, n) count-partial pass (``_cat_count_partials``
    — O(cats×2) rows per batch, no shuffle), O(cats) driver math.
    netml analog: the label-conditioned categorical tallies its
    supervised feature selection implies (reference
    src/netml/ndm/_base.py label handling)."""
    agg: dict = {}
    for r in _cat_count_partials(ds, cat_col, label_col).take_all():
        kk = (r[cat_col], int(r[label_col]))
        agg[kk] = agg.get(kk, 0) + r["n"]
    cats = sorted({c for c, _ in agg})
    n0 = np.array([agg.get((c, 0), 0) for c in cats], dtype=np.float64)
    n1 = np.array([agg.get((c, 1), 0) for c in cats], dtype=np.float64)
    tot0, tot1 = n0.sum(), n1.sum()
    ok = (n0 > 0) & (n1 > 0)
    cats = [c for c, k in zip(cats, ok) if k]
    n0, n1 = n0[ok], n1[ok]
    p0, p1 = n0 / tot0, n1 / tot1
    woe = np.log(p1 / p0)
    iv = float(((p1 - p0) * woe).sum())
    if round_to is not None:
        woe = np.round(woe, round_to)
        iv = round(iv, round_to)
    table = pa.table({
        cat_col: pa.array(cats),
        "n0": pa.array(n0.astype(np.int64)),
        "n1": pa.array(n1.astype(np.int64)),
        "woe": pa.array(woe),
    })
    return table, iv


def gains_table(ds, score_col: str, label_col: str, *,
                n_bins: int = 10, round_to: int = 9) -> pa.Table:
    """Cumulative gains / lift table — the standard model-evaluation
    summary: rows binned into ``n_bins`` exact score quantiles, then,
    scanning from the TOP score bin down, the cumulative capture rate
    (share of all positives reached) and cumulative lift (capture
    rate over the random baseline).  ``label_col`` is binary 0/1.

    Binning rule: ``bin = #(edges <= score)`` with edges the exact
    interior quantiles (``sessionize.exact_quantiles``, the same rule
    PSI uses) — value-based, so ties land deterministically and the
    SQL oracle can state the identical correlated-count expression
    (NTILE would split ties by arbitrary row order).

    Scale shape: one exact-quantile pass for the edges, then ONE
    narrow binned-count pass (2×n_bins ints per batch, no shuffle)
    and O(n_bins) driver math.  Returned top-bin-first."""
    from netml_ray.sessionize import exact_quantiles

    qs = [i / n_bins for i in range(1, n_bins)]
    edges = np.asarray(exact_quantiles(ds, score_col, qs),
                       dtype=np.float64)

    def _counts(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({"bin": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "n_pos": pa.array([], pa.int64())})
        v = t[score_col].to_numpy(zero_copy_only=False).astype(
            np.float64)
        y = t[label_col].to_numpy(zero_copy_only=False).astype(
            np.int64)
        b = np.searchsorted(edges, v, side="right")
        return pa.table({
            "bin": pa.array(np.arange(n_bins, dtype=np.int64)),
            "n": pa.array(np.bincount(b, minlength=n_bins)
                          .astype(np.int64)),
            "n_pos": pa.array(np.bincount(b, weights=y,
                                          minlength=n_bins)
                              .astype(np.int64))})

    n = np.zeros(n_bins, np.int64)
    n_pos = np.zeros(n_bins, np.int64)
    for bt in ds.select_columns([score_col, label_col]).map_batches(
            _counts, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"):
        n[bt["bin"].to_numpy()] += bt["n"].to_numpy()
        n_pos[bt["bin"].to_numpy()] += bt["n_pos"].to_numpy()

    tot_n, tot_p = float(n.sum()), float(n_pos.sum())
    # top bin first
    order = np.arange(n_bins - 1, -1, -1)
    cn = np.cumsum(n[order]).astype(np.float64)
    cp = np.cumsum(n_pos[order]).astype(np.float64)
    capture = np.round(cp / tot_p, round_to) if tot_p > 0 else \
        np.full(n_bins, np.nan)
    lift = np.round((cp / cn) / (tot_p / tot_n), round_to) \
        if tot_p > 0 else np.full(n_bins, np.nan)
    return pa.table({
        "bin": pa.array(order),
        "n": pa.array(n[order]),
        "n_pos": pa.array(n_pos[order]),
        "capture": pa.array(capture),
        "lift": pa.array(lift)})


def profile_table(ds, *, round_to: int = 6) -> pa.Table:
    """Data-quality column profile — the distributed ``describe()``
    every ingestion pipeline runs first: one row per column with row
    count, null count, and (for numeric columns) min / max / mean.
    Non-numeric columns get NULL min/max/mean (their profile is the
    null rate; distinct counts are a separate, shuffle-bearing op —
    see ``sketches`` for the approximate path).

    Scale shape: ONE narrow pass — each batch emits a fixed
    O(columns) partial row set (count, null count, min, max, sum per
    column), the driver folds O(batches × columns) tiny rows.  No
    shuffle, no column materialization.  Mean is sum/count with the
    documented round hedge (sum-order noise)."""

    fields = list(ds.schema().base_schema)
    names = [f.name for f in fields]
    numeric = {f.name for f in fields
               if pa.types.is_integer(f.type)
               or pa.types.is_floating(f.type)}

    def _partial(t: pa.Table) -> pa.Table:
        rows = {"column": [], "n": [], "n_null": [],
                "vmin": [], "vmax": [], "vsum": []}
        for name in names:
            col = t[name]
            n = len(col)
            nn = col.null_count
            if name in numeric:
                v = col.drop_null().to_numpy(zero_copy_only=False) \
                    .astype(np.float64)
                # NaN floats are data values to Arrow but missing to a
                # profiler: count them as null, keep them out of stats
                nan = int(np.isnan(v).sum())
                nn += nan
                if nan:
                    v = v[~np.isnan(v)]
                if len(v):
                    mn, mx, sm = (float(v.min()), float(v.max()),
                                  float(v.sum()))
                else:
                    mn = mx = sm = None
            else:
                mn = mx = sm = None
            rows["column"].append(name)
            rows["n"].append(n)
            rows["n_null"].append(nn)
            rows["vmin"].append(mn)
            rows["vmax"].append(mx)
            rows["vsum"].append(sm)
        return pa.table({
            "column": pa.array(rows["column"], pa.string()),
            "n": pa.array(rows["n"], pa.int64()),
            "n_null": pa.array(rows["n_null"], pa.int64()),
            "vmin": pa.array(rows["vmin"], pa.float64()),
            "vmax": pa.array(rows["vmax"], pa.float64()),
            "vsum": pa.array(rows["vsum"], pa.float64())})

    parts = pa.concat_tables(
        [b for b in ds.map_batches(_partial, batch_format="pyarrow")
         .iter_batches(batch_size=None, batch_format="pyarrow")],
        promote_options="none").to_pandas()
    out_rows = []
    for name in names:
        g = parts[parts["column"] == name]
        n = int(g["n"].sum())
        nn = int(g["n_null"].sum())
        if name in numeric and g["vmin"].notna().any():
            mn = float(g["vmin"].min())
            mx = float(g["vmax"].max())
            mean = round(float(g["vsum"].sum()) / (n - nn), round_to)
            mn, mx = round(mn, round_to), round(mx, round_to)
        else:
            mn = mx = mean = None
        out_rows.append((name, n, nn, mn, mx, mean))
    return pa.table({
        "column": pa.array([r[0] for r in out_rows], pa.string()),
        "n": pa.array([r[1] for r in out_rows], pa.int64()),
        "n_null": pa.array([r[2] for r in out_rows], pa.int64()),
        "vmin": pa.array([r[3] for r in out_rows], pa.float64()),
        "vmax": pa.array([r[4] for r in out_rows], pa.float64()),
        "vmean": pa.array([r[5] for r in out_rows], pa.float64())})


def group_auc(ds, key_col: str, score_col: str, label_col: str, *,
              min_each: int = 1, round_to: int = 6):
    """Per-group ROC AUC via the Mann-Whitney rank-sum identity:
    with fractional (average-tie) ranks of the score within the
    group, ``AUC = (R1 − n1(n1+1)/2) / (n1·n0)`` where ``R1`` is the
    rank sum of positives — the per-segment model-evaluation staple
    (a model can be great overall and broken on one segment).
    Groups missing a class (n1 or n0 below ``min_each``) are dropped;
    the SQL oracle states the identical rank and drop rules.

    Scale shape: ONE keyed exchange with the partition sorted by
    (key, score), so fractional ranks are position offsets over
    contiguous tie groups (no lexsort — the spearman_corr fast path),
    then one ``np.bincount`` pass.  Round-6 hedge on the rank-sum
    float division."""
    from .partition import partition_map

    def _fin(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({key_col: pa.array([], type=t[key_col].type),
                             "n_pos": pa.array([], pa.int64()),
                             "n_neg": pa.array([], pa.int64()),
                             "auc": pa.array([], pa.float64())})
        starts, run_id = _run_bounds(t[key_col].combine_chunks())
        s = t[score_col].to_numpy(zero_copy_only=False).astype(
            np.float64)
        y = t[label_col].to_numpy(zero_copy_only=False).astype(
            np.float64)
        tie_first = np.r_[True, (run_id[1:] != run_id[:-1])
                          | (s[1:] != s[:-1])]
        tf = np.flatnonzero(tie_first)
        tlen = np.diff(np.r_[tf, len(s)])
        pos = np.arange(len(s)) - starts[run_id]
        rk = np.repeat(pos[tf] + (tlen - 1) / 2.0 + 1.0, tlen)
        cnt = np.bincount(run_id).astype(np.float64)
        n1 = np.bincount(run_id, weights=y)
        n0 = cnt - n1
        r1 = np.bincount(run_id, weights=rk * y)
        ok = (n1 >= min_each) & (n0 >= min_each)
        auc = np.divide(r1 - n1 * (n1 + 1) / 2.0, n1 * n0,
                        out=np.zeros_like(r1), where=ok)
        keys = t[key_col].combine_chunks().take(pa.array(starts))
        out = pa.table({key_col: keys,
                        "n_pos": pa.array(n1.astype(np.int64)),
                        "n_neg": pa.array(n0.astype(np.int64)),
                        "auc": pa.array(np.round(auc, round_to))})
        return out.filter(pa.array(ok))

    cols = [key_col, score_col, label_col]
    return partition_map(ds.select_columns(cols), key_col, _fin,
                         sort_by=[key_col, score_col])


def temporal_split(ds, key: str, ts_col: str, *,
                   test_frac: float = 0.2, tiebreak: str,
                   out_col: str = "fold",
                   num_partitions: int | None = None):
    """Per-key TEMPORAL holdout split: within each key's (ts, tiebreak)
    order, the first ``ceil((1-test_frac)·n)`` rows are 'train' and
    the rest 'test' — the leakage-safe alternative to a random split
    for time-ordered data (every test row is strictly after every
    train row OF ITS KEY; the north_rule's zero-temporal-leakage
    discipline applied to model evaluation).

    ONE keyed hash exchange; inside a partition the per-run rank is
    the stratified_sample shape (run starts → repeat → arange
    subtraction), fully vectorized and run-segmented."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from netml_ray.partition import partition_map

    def _fn(t: pa.Table) -> pa.Table:
        m = t.num_rows
        if m == 0:
            return t.append_column(out_col,
                                   pa.array([], type=pa.string()))
        arr = t[key]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        starts = np.ones(m, dtype=bool)
        if m > 1:
            starts[1:] = pc.not_equal(
                arr.slice(1, m - 1), arr.slice(0, m - 1)).to_numpy(
                zero_copy_only=False)
        sidx = np.flatnonzero(starts)
        runlen = np.diff(np.append(sidx, m))
        rank = np.arange(m, dtype=np.int64) - np.repeat(sidx, runlen)
        n_train = np.ceil((1.0 - test_frac)
                          * runlen.astype(np.float64))
        fold = np.where(rank < np.repeat(n_train, runlen),
                        "train", "test")
        return t.append_column(out_col,
                               pa.array(fold, type=pa.string()))

    return partition_map(ds, key, _fn,
                         sort_by=[key, ts_col, tiebreak],
                         num_partitions=num_partitions)


def prop_ztest(ds, group_col: str, success_col: str,
               group_a, group_b, *, round_to: int = 9) -> pa.Table:
    """Two-proportion z-test (pooled): compare success rates between
    two groups — the conversion A/B companion to ``welch_ttest``.
    z = (p_a − p_b) / sqrt(p̂(1−p̂)(1/n_a + 1/n_b)) with p̂ the pooled
    rate.  ONE narrow pass: each batch folds to four ints, the driver
    computes the statistic with the exact expression the SQL states.
    Returns one row (n_a, k_a, n_b, k_b, p_a, p_b, z)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def _partial(t: pa.Table) -> pa.Table:
        g = t[group_col]
        s = pc.fill_null(t[success_col], False)
        ia = pc.fill_null(pc.equal(g, group_a), False)
        ib = pc.fill_null(pc.equal(g, group_b), False)
        return pa.table({
            "na": pa.array([pc.sum(pc.cast(ia, pa.int64())).as_py()
                            or 0]),
            "ka": pa.array([pc.sum(pc.cast(pc.and_(ia, s), pa.int64()))
                            .as_py() or 0]),
            "nb": pa.array([pc.sum(pc.cast(ib, pa.int64())).as_py()
                            or 0]),
            "kb": pa.array([pc.sum(pc.cast(pc.and_(ib, s), pa.int64()))
                            .as_py() or 0]),
        })

    na = ka = nb = kb = 0
    for r in ds.map_batches(_partial, batch_format="pyarrow") \
               .take_all():
        na += r["na"]; ka += r["ka"]; nb += r["nb"]; kb += r["kb"]
    if na == 0 or nb == 0:
        raise ValueError("prop_ztest: a group has no rows")
    pa_, pb = ka / (1.0 * na), kb / (1.0 * nb)
    pool = (ka + kb) / (1.0 * (na + nb))
    z = (pa_ - pb) / np.sqrt(pool * (1 - pool)
                             * (1.0 / na + 1.0 / nb))
    return pa.table({
        "n_a": pa.array([na], pa.int64()),
        "k_a": pa.array([ka], pa.int64()),
        "n_b": pa.array([nb], pa.int64()),
        "k_b": pa.array([kb], pa.int64()),
        "p_a": pa.array([round(pa_, round_to)]),
        "p_b": pa.array([round(pb, round_to)]),
        "z": pa.array([round(float(z), round_to)]),
    })


def quantize_stats(ds, col: str, *, levels: int = 255,
                   round_to: int = 9):
    """Int8 scalar quantization audit: per-dimension global (min, max)
    → q_j = floor((x_j − min_j) / span_j · levels) clamped to
    [0, levels] → x̂_j = min_j + (q_j · span_j) / levels; emits ONE row
    per vector with the max and mean absolute reconstruction error —
    the accuracy-loss report every embedding-compression rollout needs
    before switching ANN search to int8.

    Scale shape: pass 1 folds per-batch (d-length min, max) partials
    on the driver (O(d) floats per batch); pass 2 is a narrow
    broadcast transform (the fitted (min, span) arrays ride the task
    closure).  floor / clamp / the error's float ops are stated
    IDENTICALLY in the SQL oracle; only the d-term mean sum is
    order-sensitive → rounded both sides.  Zero-span dims quantize to
    0 and reconstruct exactly (rule in SQL)."""
    lo = None
    hi = None

    def _minmax(t: pa.Table) -> pa.Table:
        m = _kmeans_matrix(t, col)
        if not len(m):
            return pa.table({"lo": pa.array([], pa.float64()),
                             "hi": pa.array([], pa.float64())})
        return pa.table({"lo": pa.array(m.min(axis=0)),
                         "hi": pa.array(m.max(axis=0))})

    for bt in ds.map_batches(_minmax, batch_size=None,
                             batch_format="pyarrow") \
                .iter_batches(batch_size=None, batch_format="pyarrow"):
        blo = bt["lo"].to_numpy()
        bhi = bt["hi"].to_numpy()
        if not len(blo):
            continue
        lo = blo if lo is None else np.minimum(lo, blo)
        hi = bhi if hi is None else np.maximum(hi, bhi)
    if lo is None:
        raise ValueError("quantize_stats: empty input")
    span = hi - lo

    def _err(t: pa.Table, _lo=lo, _span=span) -> pa.Table:
        m = _kmeans_matrix(t, col)
        if not len(m):
            return pa.table({"vec_id": t["vec_id"],
                             "max_abs_err": pa.array([], pa.float64()),
                             "mean_abs_err": pa.array([], pa.float64())})
        with np.errstate(divide="ignore", invalid="ignore"):
            q = np.floor((m - _lo) / _span * levels)
        q = np.where(_span == 0, 0.0, np.clip(q, 0, levels))
        recon = _lo + (q * _span) / levels
        err = np.abs(m - recon)
        return pa.table({
            "vec_id": t["vec_id"],
            "max_abs_err": pa.array(np.round(err.max(axis=1),
                                             round_to)),
            "mean_abs_err": pa.array(np.round(err.mean(axis=1),
                                              round_to))})

    return ds.map_batches(_err, batch_format="pyarrow")


def cohens_kappa(ds, a_col: str, b_col: str, *, round_to: int = 9
                 ) -> pa.Table:
    """Cohen's kappa between two BOOLEAN rater columns — the
    chance-corrected agreement score for label-quality audits (does
    the heuristic labeler agree with the rule beyond chance?).
    κ = (p_o − p_e) / (1 − p_e); perfect-agreement-by-chance
    (p_e = 1) emits a typed NULL (rule stated in SQL).

    Scale shape: ONE narrow pass folding a 4-int confusion partial per
    batch (the prop_ztest shape); all downstream math is a single
    driver expression over exact integer counts, stated identically
    in the SQL oracle.  Output: one row (n, p_o, p_e, kappa)."""

    def _partial(t: pa.Table) -> pa.Table:
        a = np.asarray(t[a_col].to_numpy(zero_copy_only=False),
                       dtype=bool)
        b = np.asarray(t[b_col].to_numpy(zero_copy_only=False),
                       dtype=bool)
        return pa.table({
            "tt": pa.array([int(np.sum(a & b))]),
            "tf": pa.array([int(np.sum(a & ~b))]),
            "ft": pa.array([int(np.sum(~a & b))]),
            "ff": pa.array([int(np.sum(~a & ~b))])})

    tt = tf = ft = ff = 0
    for bt in ds.map_batches(_partial, batch_size=None,
                             batch_format="pyarrow") \
                .iter_batches(batch_size=None, batch_format="pyarrow"):
        tt += int(bt["tt"][0].as_py())
        tf += int(bt["tf"][0].as_py())
        ft += int(bt["ft"][0].as_py())
        ff += int(bt["ff"][0].as_py())
    n = tt + tf + ft + ff
    if n == 0:
        raise ValueError("cohens_kappa: empty input")
    po = (tt + ff) / (1.0 * n)
    pe = ((tt + tf) * (tt + ft) + (ft + ff) * (tf + ff)) / (1.0 * n * n)
    kappa = None if pe == 1.0 else round((po - pe) / (1.0 - pe),
                                         round_to)
    return pa.table({
        "n": pa.array([n], pa.int64()),
        "p_o": pa.array([round(po, round_to)]),
        "p_e": pa.array([round(pe, round_to)]),
        "kappa": pa.array([kappa], pa.float64())})


def dense_ids(ds, key: str, *, num_partitions: int | None = None):
    """Global contiguous ID assignment (distributed ``factorize``):
    map every distinct ``key`` to a dense ``idx`` in 0..n_distinct-1,
    in GLOBAL KEY-SORTED order — the embedding-table / vocabulary
    index builder (SQL ``row_number() OVER (ORDER BY key) - 1`` over
    the distinct keys).

    Scale shape: ONE hash exchange dedups keys (partition-local sorted
    unique), then a range ``Dataset.sort`` orders the (much smaller)
    distinct set globally; per-block offsets are an exclusive prefix
    sum over BLOCK METADATA row counts (driver touches counts only,
    never rows) and each block is stamped with its ``arange`` by a
    raw Ray task — position-aware block transforms are the documented
    case (c) where the Dataset API genuinely can't express the
    semantics.  Returns a Dataset of ``(key, idx)``."""
    import ray
    import ray.data as rd

    from netml_ray.partition import partition_map

    def _distinct(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return t
        k = t[key].combine_chunks()
        head = np.r_[True, pc.not_equal(
            k.slice(1), k.slice(0, len(k) - 1))
            .to_numpy(zero_copy_only=False)]
        return t.filter(pa.array(head))

    uniq = partition_map(ds.select_columns([key]), key, _distinct,
                         num_partitions=num_partitions,
                         sort_by=[key])
    ordered = uniq.sort(key).materialize()

    @ray.remote
    def _stamp(block: pa.Table, off: int) -> pa.Table:
        return block.append_column(
            "idx", pa.array(np.arange(off, off + block.num_rows,
                                      dtype=np.int64)))

    blocks = []          # (ref, n) in global sorted order
    for bundle in ordered.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            n = meta.num_rows
            if n is None:                      # metadata gap: count once
                n = ray.get(ref).num_rows
            if n:
                blocks.append((ref, n))
    if not blocks:
        ktype = ordered.schema().base_schema.field(key).type
        return rd.from_arrow(pa.table({
            key: pa.array([], ktype),
            "idx": pa.array([], pa.int64())}))
    offs = np.r_[0, np.cumsum([n for _, n in blocks])[:-1]]
    refs = [_stamp.remote(ref, int(o))
            for (ref, _), o in zip(blocks, offs)]
    return rd.from_arrow_refs(refs)


def negative_samples(ds, key_cols: list, pos_col: str, n_items: int,
                     *, k: int = 3,
                     mult: int = 2654435761, mult2: int = 40503):
    """Deterministic negative sampling for recommendation / embedding
    training: for every positive row emit ``k`` pseudo-random
    negatives over the dense item space 1..``n_items`` via pure
    integer arithmetic — ``raw = (key·m1 + tie·m2 + j) mod n + 1``,
    bumped one slot (mod n) when it collides with the positive.  All
    int64 ops, so the sample is reproducible across engines and runs
    (the property that makes training-data generation resumable);
    no RNG state, no shuffle — a pure narrow flat-map.

    ``key_cols`` = [primary, tiebreak] integer columns that uniquely
    identify the positive row.  Output: key cols, ``pos`` (the
    positive item), ``j`` (1..k), ``neg``."""
    a_col, b_col = key_cols

    def _f(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({
                a_col: t[a_col], b_col: t[b_col],
                "pos": pa.array([], pa.int64()),
                "j": pa.array([], pa.int64()),
                "neg": pa.array([], pa.int64())})
        a = t[a_col].to_numpy().astype(np.int64)
        b = t[b_col].to_numpy().astype(np.int64)
        pos = t[pos_col].to_numpy().astype(np.int64)
        n = t.num_rows
        ar = np.repeat(a, k)
        br = np.repeat(b, k)
        pr = np.repeat(pos, k)
        j = np.tile(np.arange(1, k + 1, dtype=np.int64), n)
        raw = (ar * mult + br * mult2 + j) % n_items + 1
        hit = raw == pr
        raw[hit] = raw[hit] % n_items + 1
        return pa.table({a_col: pa.array(ar), b_col: pa.array(br),
                         "pos": pa.array(pr), "j": pa.array(j),
                         "neg": pa.array(raw)})

    return ds.map_batches(_f, batch_format="pyarrow")


def kcenter_select(ds, id_col: str, col: str, k: int, *,
                   round_to: int = 9) -> pa.Table:
    """Greedy k-center (farthest-first) coreset selection over a
    fixed-width ``list<float>`` column — the diversity-sampling /
    data-selection primitive (Gonzalez 1985; 2-approximation of the
    k-center cover).  Seed = the lowest-``id_col`` row; each round
    picks the point maximizing its min Euclidean distance to the
    chosen set (per-center distances rounded to ``round_to`` before
    the min, ties → lowest id — both rules stated by the SQL oracle).

    Returns k rows ``(rank, id, dist)`` where ``dist`` is the
    selection-time covering radius (0 for the seed).  Scale shape: k
    narrow passes, each a per-batch (argmax, id, vector) partial with
    the chosen centers broadcast — no shuffle; the driver folds
    O(blocks) candidate rows per round."""
    from netml_ray.sketches import top_k

    seed_t = top_k(ds, 1, [(id_col, "ascending")])
    seed_id = seed_t[id_col][0].as_py()
    seed_v = np.asarray(seed_t[col].combine_chunks().flatten(),
                        dtype=np.float64)
    centers = [seed_v]
    out_ids = [seed_id]
    out_dist = [0.0]
    for _ in range(1, k):
        frozen = np.vstack(centers)

        def _p(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "id": pa.array([], t.schema.field(id_col).type),
                "d": pa.array([], pa.float64()),
                "v": pa.array([], pa.list_(pa.float64()))})
            if not t.num_rows:
                return empty
            m = _kmeans_matrix(t, col)
            ids = t[id_col].combine_chunks()
            # min over centers of rounded L2 distance
            d2 = ((m[:, None, :] - frozen[None, :, :]) ** 2).sum(-1)
            d = np.round(np.sqrt(d2), round_to).min(axis=1)
            order = np.lexsort((ids.to_numpy(zero_copy_only=False),
                                -d))
            b = int(order[0])
            return pa.table({
                "id": ids.take(pa.array([b])),
                "d": pa.array([float(d[b])]),
                "v": pa.array([m[b].tolist()],
                              pa.list_(pa.float64()))})

        best_id, best_d, best_v = None, -1.0, None
        for r in ds.map_batches(_p, batch_format="pyarrow").take_all():
            if (r["d"] > best_d
                    or (r["d"] == best_d and r["id"] < best_id)):
                best_id, best_d = r["id"], r["d"]
                best_v = np.asarray(r["v"], dtype=np.float64)
        centers.append(best_v)
        out_ids.append(best_id)
        out_dist.append(best_d)
    return pa.table({
        "rank": pa.array(np.arange(k, dtype=np.int64)),
        id_col: pa.array(out_ids, seed_t.schema.field(id_col).type),
        "dist": pa.array(out_dist, pa.float64())})


def group_agg_state(ds, key: str, val: str, *,
                    num_partitions: int | None = None):
    """Per-key mergeable aggregate STATE ``(key, n, s, mn, mx)`` — the
    commutative-monoid partial every incremental pipeline checkpoints:
    yesterday's state plus today's delta folds to exactly the
    full-recompute answer (``merge_agg_states``), so a daily run never
    rescans history.  ONE keyed exchange; inside each partition the
    fold is segmented reduceat — no per-key Python.

    Also the MERGE step: apply to a union of state tables (same
    schema) and the reduceat folds combine them — ``n``/``s`` add,
    ``mn``/``mx`` fold — because the state columns themselves are the
    monoid.  (``s`` folds in partition order; consumers wanting
    cross-engine float equality round derived means, the repo's
    standard hedge.)"""
    from netml_ray.partition import partition_map

    is_state = all(c in ds.schema().names for c in ("n", "s", "mn", "mx"))

    def _fold(t: pa.Table) -> pa.Table:
        empty = pa.table({
            key: t[key].slice(0, 0),
            "n": pa.array([], pa.int64()),
            "s": pa.array([], pa.float64()),
            "mn": pa.array([], pa.float64()),
            "mx": pa.array([], pa.float64())})
        if not t.num_rows:
            return empty
        keys = t[key].combine_chunks()
        head = np.r_[True, pc.not_equal(
            keys.slice(1), keys.slice(0, len(keys) - 1))
            .to_numpy(zero_copy_only=False)]
        starts = np.flatnonzero(head)
        if is_state:
            n = np.add.reduceat(t["n"].to_numpy(), starts)
            s = np.add.reduceat(t["s"].to_numpy(), starts)
            mn = np.minimum.reduceat(t["mn"].to_numpy(), starts)
            mx = np.maximum.reduceat(t["mx"].to_numpy(), starts)
        else:
            v = t[val].to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            n = np.diff(np.r_[starts, t.num_rows]).astype(np.int64)
            s = np.add.reduceat(v, starts)
            mn = np.minimum.reduceat(v, starts)
            mx = np.maximum.reduceat(v, starts)
        return pa.table({
            key: keys.take(pa.array(starts)),
            "n": pa.array(n.astype(np.int64)),
            "s": pa.array(s), "mn": pa.array(mn),
            "mx": pa.array(mx)})

    return partition_map(ds, key, _fold,
                         num_partitions=num_partitions,
                         sort_by=[key])


def merge_agg_states(states: list, key: str, *,
                     num_partitions: int | None = None):
    """Fold any number of ``group_agg_state`` tables into one — union
    then ONE keyed exchange re-running the same segmented monoid
    fold.  Incremental-pipeline contract: state(old) ⊕ state(delta)
    == state(old ∪ delta), pinned by pytest."""
    ds = states[0]
    for other in states[1:]:
        ds = ds.union(other)
    return group_agg_state(ds, key, "s",
                           num_partitions=num_partitions)
