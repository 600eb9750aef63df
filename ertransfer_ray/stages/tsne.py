"""Exact t-SNE (van der Maaten & Hinton, JMLR 2008) in pure numpy, plus the
reference's embedding-cluster diagnostic built on it.

Reference parity: `clustering/Embeddings/embeddings.py:29-49` normalizes
pair embeddings, projects with ``TSNE(n_components=10, method='exact')``,
KMeans(2)-clusters the projection and prints per-cluster F1/P/R, then
projects again to 2-D and saves a label-colored ``scatter_TSNE2d.png``.
sklearn/matplotlib are absent from this container, so both the projector
and the renderer are local: this module implements the exact O(n²) t-SNE
the reference requests, and the PNG comes from functions/plot.py over this
repo's own encoder.

Scale note: t-SNE is a DIAGNOSTIC, not a pipeline stage — the reference
itself runs it driver-side over one dataset's pair embeddings. The wrapper
therefore samples to ``max_points`` (deterministic hash-ranked choice)
before the O(n²) projection; the corpus never materializes.
"""

from __future__ import annotations

import os

import numpy as np

_EPS = 1e-12


def _conditional_probs(d2: np.ndarray, perplexity: float) -> np.ndarray:
    """Row-stochastic P_{j|i} with per-row beta binary-searched so each
    row's perplexity hits the target (standard 50-step search)."""
    n = d2.shape[0]
    target = np.log(perplexity)
    P = np.zeros((n, n), np.float64)
    for i in range(n):
        di = np.delete(d2[i], i)
        lo, hi = -np.inf, np.inf
        beta = 1.0
        for _ in range(50):
            w = np.exp(-di * beta)
            s = w.sum()
            if s <= 0:
                h = 0.0
            else:
                # H = log(s) + beta * <d>_w
                h = np.log(s) + beta * float((di * w).sum()) / s
            if abs(h - target) < 1e-5:
                break
            if h > target:
                lo = beta
                beta = beta * 2 if hi == np.inf else (beta + hi) / 2
            else:
                hi = beta
                beta = beta / 2 if lo == -np.inf else (beta + lo) / 2
        w = np.exp(-di * beta)
        s = w.sum()
        row = w / s if s > 0 else np.full(n - 1, 1.0 / (n - 1))
        P[i, :i] = row[:i]
        P[i, i + 1 :] = row[i:]
    return P


def tsne(
    X: np.ndarray,
    n_components: int = 2,
    perplexity: float = 30.0,
    n_iter: int = 500,
    learning_rate: float = 200.0,
    early_exaggeration: float = 12.0,
    seed: int = 0,
) -> np.ndarray:
    """Exact t-SNE embedding of ``X`` (n, d) -> (n, n_components).

    The standard optimizer: 50-step perplexity search, early exaggeration
    for the first quarter of the iterations, momentum 0.5→0.8, per-weight
    adaptive gains. Deterministic per seed. O(n²) memory/compute — callers
    sample first (see ``embedding_cluster_diagnostic``).
    """
    X = np.asarray(X, np.float64)
    n = X.shape[0]
    if n == 0:
        return np.zeros((0, n_components))
    if n == 1:
        return np.zeros((1, n_components))
    perplexity = min(perplexity, max((n - 1) / 3.0, 1.0))

    sq = (X * X).sum(axis=1)
    d2 = np.maximum(sq[:, None] + sq[None, :] - 2.0 * (X @ X.T), 0.0)
    P = _conditional_probs(d2, perplexity)
    P = (P + P.T) / (2.0 * n)
    P = np.maximum(P, _EPS)

    rng = np.random.default_rng(seed)
    Y = 1e-4 * rng.standard_normal((n, n_components))
    dY = np.zeros_like(Y)
    gains = np.ones_like(Y)
    exag_until = max(n_iter // 4, 1)
    P_run = P * early_exaggeration

    for it in range(n_iter):
        if it == exag_until:
            P_run = P
        ysq = (Y * Y).sum(axis=1)
        num = 1.0 / (1.0 + np.maximum(ysq[:, None] + ysq[None, :] - 2.0 * (Y @ Y.T), 0.0))
        np.fill_diagonal(num, 0.0)
        Q = np.maximum(num / num.sum(), _EPS)
        W = (P_run - Q) * num
        # grad_i = 4 * sum_j W_ij (y_i - y_j)  ==  4 * (diag(rowsum) - W) @ Y
        grad = 4.0 * ((np.diag(W.sum(axis=1)) - W) @ Y)
        momentum = 0.5 if it < exag_until else 0.8
        same_sign = np.sign(grad) == np.sign(dY)
        gains = np.where(same_sign, gains * 0.8, gains + 0.2)
        gains = np.maximum(gains, 0.01)
        dY = momentum * dY - learning_rate * gains * grad
        Y = Y + dY
        Y = Y - Y.mean(axis=0)
    return Y


def _local_kmeans(
    X: np.ndarray, k: int, n_init: int = 10, max_iter: int = 100, seed: int = 0
) -> np.ndarray:
    """Driver-side Lloyd's with ``n_init`` restarts (best inertia wins) —
    the sampled-diagnostic analog of the distributed stages/kmeans.py."""
    X = np.asarray(X, np.float64)
    n = X.shape[0]
    best_labels, best_inertia = None, np.inf
    rng = np.random.default_rng(seed)
    for _ in range(n_init):
        idx = rng.choice(n, size=min(k, n), replace=False)
        C = X[idx].copy()
        labels = np.zeros(n, np.int64)
        for _ in range(max_iter):
            d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            new_labels = d.argmin(axis=1)
            if np.array_equal(new_labels, labels) and _ > 0:
                break
            labels = new_labels
            for c in range(C.shape[0]):
                m = labels == c
                if m.any():
                    C[c] = X[m].mean(axis=0)
        inertia = float(((X - C[labels]) ** 2).sum())
        if inertia < best_inertia:
            best_inertia, best_labels = inertia, labels
    return best_labels


def embedding_cluster_diagnostic(
    X: np.ndarray,
    labels: np.ndarray,
    out_dir: str,
    max_points: int = 1000,
    seed: int = 0,
    n_iter: int = 500,
) -> dict:
    """The reference's embedding diagnostic (embeddings.py:29-49): row-
    normalize, t-SNE to 10-D (exact), KMeans(2, n_init=10) on the
    projection, report per-cluster F1/P/R against the labels, then t-SNE
    to 2-D and write ``scatter_TSNE2d.png`` + ``tsne_report.txt``.

    Inputs are a SAMPLE (deterministic truncation of the first
    ``max_points`` rows after a seeded shuffle) because exact t-SNE is
    O(n²); the reference runs the same algorithm over one benchmark
    dataset's pairs, which is the same size class.
    """
    X = np.asarray(X, np.float64)
    labels = np.asarray(labels).astype(np.int64).ravel()
    n = X.shape[0]
    if n > max_points:
        order = np.random.default_rng(seed).permutation(n)[:max_points]
        order.sort()
        X, labels = X[order], labels[order]
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    X = X / np.maximum(norms, _EPS)

    X10 = tsne(X, n_components=10, n_iter=n_iter, seed=seed)
    preds = _local_kmeans(X10, 2, n_init=10, seed=seed)

    report: dict = {"n": int(X.shape[0])}
    total_pos = float(labels.sum())
    lines = []
    for c in (0, 1):
        split = labels[preds == c]
        size = float(split.shape[0])
        pos = float(split.sum())
        f1 = 2 * pos / (size + total_pos) if (size + total_pos) > 0 else 0.0
        p = pos / size if size > 0 else 0.0
        r = pos / total_pos if total_pos > 0 else 0.0
        report[f"cluster{c}"] = {"f1": f1, "precision": p, "recall": r}
        lines.append(f"Cluster {c}: F1 {f1}, P {p}, R {r}")

    X2 = tsne(X, n_components=2, n_iter=n_iter, seed=seed)
    from ..functions.plot import save_png, scatter

    os.makedirs(out_dir, exist_ok=True)
    save_png(os.path.join(out_dir, "scatter_TSNE2d.png"), scatter(X2, labels))
    with open(os.path.join(out_dir, "tsne_report.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    report["xy"] = X2
    return report
