"""Novelty-detection models — the recast of the reference's ``ndm``
package (src/netml/ndm: model.py, pca.py, gmm.py, kde.py, ocsvm.py,
iforest.py, ae.py) for the Ray engine.

Division of labor mirrors the reference and SURVEY §2.4 T2/T3:

- **fit** runs on the driver over a sampled/limited features Dataset
  (post-aggregation matrices are small; analog cli.py:493-583)
- **predict/score** runs distributed: the fitted model is broadcast via
  ``ray.put`` and applied per batch by an actor pool (analog
  cli.py:200-202)

This container has no sklearn/torch, so all SIX algorithms of the
reference's registry are pure-numpy reimplementations of the public
math: PCA reconstruction error, Gaussian KDE log-likelihood, spherical
GMM via EM, Isolation Forest (Liu et al. '08), one-class SVM on Random
Fourier Features (Schölkopf '01 + Rahimi-Recht '07), and an MLP
autoencoder with hand-rolled Adam.  ``MissingDependencyError`` remains
as the API for any future dependency-gated algorithm (reference
pattern: utils/tool.py:17-18).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class MissingDependencyError(RuntimeError):
    """Analog of the reference's ManualDependencyError (tool.py:17-18)."""


class PCADetector:
    """Anomaly score = reconstruction error from a rank-k PCA
    (math parity with the reference's pca.py:76-107 approach)."""

    def __init__(self, n_components: int = 2):
        self.k = n_components

    def fit(self, X: np.ndarray) -> "PCADetector":
        self.mean_ = X.mean(axis=0)
        Xc = X - self.mean_
        _, s, vt = np.linalg.svd(Xc, full_matrices=False)
        self.components_ = vt[: self.k]
        return self

    def decision_function(self, X: np.ndarray) -> np.ndarray:
        Xc = X - self.mean_
        proj = Xc @ self.components_.T @ self.components_
        # higher = more anomalous
        return np.sqrt(((Xc - proj) ** 2).sum(axis=1))


class KDEDetector:
    """Gaussian KDE negative log-likelihood (analog kde.py:78-107)."""

    def __init__(self, bandwidth: float = 1.0, max_fit_rows: int = 5000):
        self.h = bandwidth
        self.max_fit_rows = max_fit_rows

    def fit(self, X: np.ndarray) -> "KDEDetector":
        self.X_ = X[: self.max_fit_rows]
        self.d_ = X.shape[1]
        return self

    def decision_function(self, X: np.ndarray) -> np.ndarray:
        # -log mean kernel density; higher = more anomalous
        out = np.empty(len(X))
        h2 = 2.0 * self.h * self.h
        for i in range(0, len(X), 256):
            blk = X[i : i + 256]
            d2 = ((blk[:, None, :] - self.X_[None, :, :]) ** 2).sum(axis=2)
            out[i : i + 256] = -np.log(np.exp(-d2 / h2).mean(axis=1) + 1e-300)
        return out


class GMMDetector:
    """Spherical-covariance GMM by EM; score = −log p(x)
    (analog gmm.py:91-122)."""

    def __init__(self, n_components: int = 3, iters: int = 30, seed: int = 42):
        self.k = n_components
        self.iters = iters
        self.seed = seed

    def fit(self, X: np.ndarray) -> "GMMDetector":
        rng = np.random.default_rng(self.seed)
        n, d = X.shape
        k = min(self.k, n)
        mu = X[rng.choice(n, k, replace=False)].astype(np.float64)
        var = np.full(k, X.var() + 1e-6)
        pi = np.full(k, 1.0 / k)
        for _ in range(self.iters):
            logp = self._log_comp(X, mu, var, pi)
            m = logp.max(axis=1, keepdims=True)
            r = np.exp(logp - m)
            r /= r.sum(axis=1, keepdims=True)
            nk = r.sum(axis=0) + 1e-12
            pi = nk / n
            mu = (r.T @ X) / nk[:, None]
            for j in range(k):
                var[j] = (r[:, j] * ((X - mu[j]) ** 2).sum(axis=1)).sum() / (nk[j] * d) + 1e-9
        self.mu_, self.var_, self.pi_ = mu, var, pi
        return self

    @staticmethod
    def _log_comp(X, mu, var, pi):
        d = X.shape[1]
        d2 = ((X[:, None, :] - mu[None, :, :]) ** 2).sum(axis=2)
        return (
            np.log(pi)[None, :]
            - 0.5 * d * np.log(2 * np.pi * var)[None, :]
            - d2 / (2 * var)[None, :]
        )

    def decision_function(self, X: np.ndarray) -> np.ndarray:
        logp = self._log_comp(X, self.mu_, self.var_, self.pi_)
        m = logp.max(axis=1)
        return -(m + np.log(np.exp(logp - m[:, None]).sum(axis=1)))


def _harmonic(n: np.ndarray | float) -> np.ndarray | float:
    return np.log(n) + 0.5772156649015329  # H(n) ≈ ln n + Euler-Mascheroni


def _avg_path_len(n):
    """c(n): average BST unsuccessful-search path length (Liu et al.
    2008, eq. 1) — the normalizer in the iForest anomaly score."""
    n = np.asarray(n, dtype=np.float64)
    out = np.zeros_like(n)
    m2 = n > 2
    out[m2] = 2.0 * _harmonic(n[m2] - 1.0) - 2.0 * (n[m2] - 1.0) / n[m2]
    out[n == 2] = 1.0
    return out


class IFDetector:
    """Isolation Forest, pure numpy (Liu/Ting/Zhou ICDM'08 — the public
    algorithm behind the reference's sklearn/pyod-backed IF,
    src/netml/ndm/iforest.py:42-70).  Anomaly score = 2^(-E[h(x)]/c(ψ))
    with pyod's invert_order convention folded in: HIGHER = more
    anomalous, matching this module's other detectors.

    Trees are stored as flat node arrays; scoring routes every row
    down every tree with one vectorized gather per depth level.
    """

    def __init__(self, n_estimators: int = 100, max_samples: int = 256,
                 random_state: int = 42):
        self.n_estimators = n_estimators
        self.max_samples = max_samples
        self.seed = random_state

    def fit(self, X: np.ndarray) -> "IFDetector":
        rng = np.random.default_rng(self.seed)
        n, d = X.shape
        psi = min(self.max_samples, n)
        self.psi_ = psi
        depth_cap = int(np.ceil(np.log2(max(psi, 2))))
        self.trees_ = []
        for _ in range(self.n_estimators):
            idx = rng.choice(n, size=psi, replace=False)
            feat, thr, left, right, leaf_n, depth = [], [], [], [], [], []

            def _grow(rows: np.ndarray, dep: int) -> int:
                node = len(feat)
                feat.append(-1); thr.append(0.0); left.append(-1)
                right.append(-1); leaf_n.append(len(rows)); depth.append(dep)
                if dep >= depth_cap or len(rows) <= 1:
                    return node
                sub = X[rows]
                spread = sub.max(axis=0) - sub.min(axis=0)
                nz = np.flatnonzero(spread > 0)
                if not len(nz):
                    return node
                f = int(rng.choice(nz))
                lo, hi = sub[:, f].min(), sub[:, f].max()
                t = float(rng.uniform(lo, hi))
                go_left = sub[:, f] < t
                feat[node] = f
                thr[node] = t
                left[node] = _grow(rows[go_left], dep + 1)
                right[node] = _grow(rows[~go_left], dep + 1)
                return node

            _grow(idx, 0)
            self.trees_.append((
                np.array(feat, dtype=np.int64), np.array(thr),
                np.array(left, dtype=np.int64), np.array(right, dtype=np.int64),
                np.array(leaf_n, dtype=np.int64), np.array(depth, dtype=np.int64),
            ))
        return self

    def decision_function(self, X: np.ndarray) -> np.ndarray:
        m = len(X)
        path = np.zeros(m, dtype=np.float64)
        for feat, thr, left, right, leaf_n, depth in self.trees_:
            node = np.zeros(m, dtype=np.int64)
            active = feat[node] >= 0
            while active.any():
                f = feat[node[active]]
                go_left = X[active, f] < thr[node[active]]
                nxt = np.where(go_left, left[node[active]], right[node[active]])
                node[active] = nxt
                active = feat[node] >= 0
            path += depth[node] + _avg_path_len(leaf_n[node])
        eh = path / self.n_estimators
        return np.power(2.0, -eh / max(_avg_path_len(np.array([self.psi_]))[0], 1e-9)) * 1.0


class OCSVMDetector:
    """One-class SVM with an RBF kernel approximated by Random Fourier
    Features (Rahimi & Recht NIPS'07 — public method), trained by
    alternating subgradient descent on the standard OCSVM objective
    (Schölkopf et al. '01):

        min_w ½‖w‖² + 1/(νn) Σ max(0, ρ − ⟨w, φ(x)⟩) − ρ

    with ρ re-set each epoch to the ν-quantile of scores (its optimality
    condition).  Anomaly score = ρ − ⟨w, φ(x)⟩ — HIGHER = more
    anomalous, the module convention (pyod's invert_order folded in;
    reference analog src/netml/ndm/ocsvm.py — sklearn-backed there).
    The RFF lift makes scoring a single matmul per batch — the
    distributed-predict-friendly form of the kernel machine.
    """

    def __init__(self, nu: float = 0.5, gamma: str | float = "scale",
                 n_features: int = 256, epochs: int = 60, lr: float = 0.05,
                 random_state: int = 42):
        self.nu = nu
        self.gamma = gamma
        self.D = n_features
        self.epochs = epochs
        self.lr = lr
        self.seed = random_state

    def _phi(self, X: np.ndarray) -> np.ndarray:
        return np.sqrt(2.0 / self.D) * np.cos(X @ self.W_ + self.b_)

    def fit(self, X: np.ndarray) -> "OCSVMDetector":
        rng = np.random.default_rng(self.seed)
        n, d = X.shape
        self.mean_ = X.mean(axis=0)
        self.std_ = X.std(axis=0) + 1e-9
        Xs = (X - self.mean_) / self.std_
        g = (1.0 / (d * max(Xs.var(), 1e-12))
             if self.gamma == "scale" else float(self.gamma))
        self.W_ = rng.normal(0.0, np.sqrt(2.0 * g), size=(d, self.D))
        self.b_ = rng.uniform(0.0, 2.0 * np.pi, size=self.D)
        Z = self._phi(Xs)
        w = Z.mean(axis=0)  # warm start toward the data (w=0 is a
        # stationary point of the subgradient with no violators)
        for _ in range(self.epochs):
            s = Z @ w
            rho = float(np.quantile(s, self.nu))
            viol = s <= rho
            grad = w - (Z[viol].sum(axis=0) / (self.nu * n))
            w -= self.lr * grad
        self.w_ = w
        self.rho_ = float(np.quantile(Z @ w, self.nu))
        return self

    def decision_function(self, X: np.ndarray) -> np.ndarray:
        Xs = (X - self.mean_) / self.std_
        return self.rho_ - self._phi(Xs) @ self.w_


class AEDetector:
    """Autoencoder novelty detector in pure numpy: d → h → z → h → d
    MLP (ReLU hidden, linear output) trained with Adam on MSE over
    standardized inputs; anomaly score = per-row reconstruction error
    (reference analog src/netml/ndm/ae.py — torch-backed there; the
    math is the standard public formulation)."""

    def __init__(self, hidden: int | None = None, latent: int | None = None,
                 epochs: int = 200, batch_size: int = 64, lr: float = 1e-3,
                 random_state: int = 42):
        self.hidden = hidden
        self.latent = latent
        self.epochs = epochs
        self.batch_size = batch_size
        self.lr = lr
        self.seed = random_state

    def fit(self, X: np.ndarray) -> "AEDetector":
        rng = np.random.default_rng(self.seed)
        n, d = X.shape
        h = self.hidden or max(2, int(np.ceil(d * 0.75)))
        z = self.latent or max(1, d // 2)
        self.mean_ = X.mean(axis=0)
        self.std_ = X.std(axis=0) + 1e-9
        Xs = (X - self.mean_) / self.std_

        def init(i, o):
            return rng.normal(0, np.sqrt(2.0 / i), size=(i, o))

        params = [init(d, h), np.zeros(h), init(h, z), np.zeros(z),
                  init(z, h), np.zeros(h), init(h, d), np.zeros(d)]
        m = [np.zeros_like(p) for p in params]
        v = [np.zeros_like(p) for p in params]
        b1, b2, eps = 0.9, 0.999, 1e-8
        t = 0
        for _ in range(self.epochs):
            idx = rng.permutation(n)
            for s in range(0, n, self.batch_size):
                B = Xs[idx[s : s + self.batch_size]]
                W1, c1, W2, c2, W3, c3, W4, c4 = params
                a1 = np.maximum(B @ W1 + c1, 0)
                a2 = np.maximum(a1 @ W2 + c2, 0)
                a3 = np.maximum(a2 @ W3 + c3, 0)
                out = a3 @ W4 + c4
                g = 2.0 * (out - B) / len(B)
                gW4 = a3.T @ g; gc4 = g.sum(0)
                g3 = (g @ W4.T) * (a3 > 0)
                gW3 = a2.T @ g3; gc3 = g3.sum(0)
                g2 = (g3 @ W3.T) * (a2 > 0)
                gW2 = a1.T @ g2; gc2 = g2.sum(0)
                g1 = (g2 @ W2.T) * (a1 > 0)
                gW1 = B.T @ g1; gc1 = g1.sum(0)
                grads = [gW1, gc1, gW2, gc2, gW3, gc3, gW4, gc4]
                t += 1
                for i, (p, gr) in enumerate(zip(params, grads)):
                    m[i] = b1 * m[i] + (1 - b1) * gr
                    v[i] = b2 * v[i] + (1 - b2) * gr * gr
                    mh = m[i] / (1 - b1 ** t)
                    vh = v[i] / (1 - b2 ** t)
                    p -= self.lr * mh / (np.sqrt(vh) + eps)
        self.params_ = params
        return self

    def decision_function(self, X: np.ndarray) -> np.ndarray:
        Xs = (X - self.mean_) / self.std_
        W1, c1, W2, c2, W3, c3, W4, c4 = self.params_
        a1 = np.maximum(Xs @ W1 + c1, 0)
        a2 = np.maximum(a1 @ W2 + c2, 0)
        a3 = np.maximum(a2 @ W3 + c3, 0)
        out = a3 @ W4 + c4
        return ((out - Xs) ** 2).mean(axis=1)


ALGORITHMS = {
    "PCA": PCADetector,
    "KDE": KDEDetector,
    "GMM": GMMDetector,
    "OCSVM": OCSVMDetector,
    "IF": IFDetector,
    "AE": AEDetector,
}


def auc_score(y_true: np.ndarray, scores: np.ndarray) -> float:
    """ROC AUC by rank statistic (ties → midrank), numpy only —
    analog of the reference's sklearn roc_curve+auc (ndm/model.py:97-104)."""
    order = np.argsort(scores, kind="stable")
    ranks = np.empty(len(scores), dtype=np.float64)
    ranks[order] = np.arange(1, len(scores) + 1)
    s_sorted = scores[order]
    # midranks for ties
    i = 0
    while i < len(s_sorted):
        j = i
        while j + 1 < len(s_sorted) and s_sorted[j + 1] == s_sorted[i]:
            j += 1
        if j > i:
            ranks[order[i : j + 1]] = (i + 1 + j + 1) / 2.0
        i = j + 1
    pos = y_true == 1
    n1, n0 = pos.sum(), (~pos).sum()
    if n1 == 0 or n0 == 0:
        return float("nan")
    return float((ranks[pos].sum() - n1 * (n1 + 1) / 2.0) / (n1 * n0))


def collect_features(ds, feature_col: str = "features", limit: int | None = 100_000) -> np.ndarray:
    """Driver-side matrix from a features Dataset (fit-side; small)."""
    if limit is not None:
        ds = ds.limit(limit)
    rows = []
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=1 << 16):
        col = b[feature_col]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        flat = np.asarray(arr.flatten(), dtype=np.float64)
        rows.append(flat.reshape(len(arr), -1))
    return np.vstack(rows) if rows else np.empty((0, 0))


def fit(algorithm: str, X: np.ndarray, **params):
    """Driver-side fit (analog cli.py:539-563 plugin resolve + fit)."""
    cls = ALGORITHMS[algorithm.upper()]
    return cls(**params).fit(X)


def score_dataset(ds, model, feature_col: str = "features", concurrency=None):
    """Distributed scoring: model broadcast once, actor pool per batch
    (analog cli.py:200-202).  Appends a ``score`` column.  The actor
    pool scales with the cluster (``auto_concurrency``) unless an
    explicit ``concurrency`` is passed."""
    import ray

    from netml_ray.partition import auto_concurrency

    if concurrency is None:
        concurrency = auto_concurrency()
    ref = ray.put(model)

    class Scorer:
        def __init__(self):
            self.model = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            col = t[feature_col]
            arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            mask = arr.is_valid().to_numpy(zero_copy_only=False)
            flat = np.asarray(arr.flatten(), dtype=np.float64)
            width = flat.size // max(1, int(mask.sum())) if mask.any() else 1
            scores = np.full(t.num_rows, np.nan)
            if mask.any():
                X = flat.reshape(int(mask.sum()), width)
                scores[mask] = self.model.decision_function(X)
            return t.append_column("score", pa.array(scores, mask=~mask))

    return ds.map_batches(Scorer, batch_format="pyarrow", concurrency=concurrency)


# ---------------------------------------------------------------------------
# isotonic calibration (PAVA)
# ---------------------------------------------------------------------------

def fit_isotonic(scores: np.ndarray, labels: np.ndarray) -> dict:
    """Pool-Adjacent-Violators: fit a non-decreasing map from raw
    anomaly/classifier scores to calibrated P(label=1).  O(n) stack
    PAVA over the score-sorted labels (ties in score pre-pooled so
    the fit is input-order invariant).  Driver-side like every
    ``models.fit`` (the calibration sample is small); the returned
    dict broadcasts to the cluster via ``apply_calibration``."""
    s = np.asarray(scores, dtype=np.float64)
    y = np.asarray(labels, dtype=np.float64)
    order = np.argsort(s, kind="stable")
    s, y = s[order], y[order]
    # pre-pool exact score ties (PAVA blocks may never split a tie)
    ux, inv, cnt = np.unique(s, return_inverse=True, return_counts=True)
    ysum = np.bincount(inv, weights=y)
    # stack PAVA over (mean, weight) blocks
    means: list[float] = []
    weights: list[float] = []
    starts: list[int] = []
    for i in range(len(ux)):
        m, w = ysum[i] / cnt[i], float(cnt[i])
        st = i
        while means and means[-1] >= m:
            m = (means[-1] * weights[-1] + m * w) / (weights[-1] + w)
            w += weights[-1]
            st = starts[-1]
            means.pop(); weights.pop(); starts.pop()
        means.append(m); weights.append(w); starts.append(st)
    block_of = np.repeat(np.arange(len(means)),
                         np.diff(np.append(starts, len(ux))))
    return {"x": ux, "y": np.asarray(means)[block_of]}


def calibrate_scores(scores: np.ndarray, fit: dict) -> np.ndarray:
    """Apply an isotonic fit: step interpolation at the fitted score
    points (right-continuous — a score equal to a knot gets that
    knot's value; outside the range clamps to the edge values)."""
    x, y = fit["x"], fit["y"]
    idx = np.clip(np.searchsorted(x, scores, side="right") - 1,
                  0, len(x) - 1)
    return y[idx]


def apply_calibration(ds, fit: dict, score_col: str = "score",
                      out_col: str = "calibrated"):
    """Broadcast the (small) isotonic table once and map batches."""
    import ray

    ref = ray.put(fit)

    def _f(t):
        f = ray.get(ref)
        s = t[score_col].to_numpy(zero_copy_only=False)
        return t.append_column(out_col,
                               pa.array(calibrate_scores(s, f)))

    return ds.map_batches(_f, batch_format="pyarrow")
