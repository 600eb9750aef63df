"""Trained corpus-quality classifier (GPT-3 / CCNet recipe, torch-free).

GPT-3 filtered Common Crawl with a linear classifier trained to separate
high-quality exemplars (positives) from raw-crawl background
(negatives); CCNet ranks by a similar model family. This is that
component on Ray Data:

- **Features**: signed hashed character n-grams (the stateless
  `encoders.HashedNgramEncoder` — the model IS the hash, so every
  worker agrees with no weight shipping).
- **Training**: ridge regression on ±1 labels, solved CLOSED-FORM from
  distributed sufficient statistics — each batch contributes
  ``(n, XᵀX, Xᵀy)`` (d² + d floats regardless of batch size), the
  driver reduces partials and solves one d×d system. One streaming pass
  over each corpus, no iterations, no shuffle; the fit is
  parallelism-invariant up to float summation order (pinned in tests to
  1e-8).
- **Scoring**: a stateless map attaching ``quality_prob`` =
  σ(x·w) per doc; ``w`` is d floats broadcast by value inside the task
  closure.

At 100 TB the training side is whatever sample the curator picks (the
sufficient statistics make corpus size irrelevant to driver memory) and
scoring is a pure map over the stream.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from .encoders import HashedNgramEncoder


@dataclass
class QualityClassifier:
    w: np.ndarray  # (dim,) float64
    dim: int
    ngram: int
    seed: int

    def encoder(self, text_col: str, id_col: str) -> HashedNgramEncoder:
        return HashedNgramEncoder(
            dim=self.dim, ngram=self.ngram, seed=self.seed,
            text_col=text_col, id_col=id_col,
        )


def train_quality_classifier(
    pos_ds,
    neg_ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 256,
    ngram: int = 3,
    seed: int = 13,
    ridge: float = 1e-3,
) -> QualityClassifier:
    """Fit w = (XᵀX + λI)⁻¹ Xᵀy over pos (+1) ∪ neg (−1). See module
    docstring for the distributed shape."""
    from ..functions.arrays import list_column_to_matrix

    enc_kwargs = dict(dim=dim, ngram=ngram, seed=seed,
                      text_col=text_col, id_col=id_col)

    def stats_for(ds, label: float):
        enc = HashedNgramEncoder(**enc_kwargs)

        def partial(t: pa.Table) -> pa.Table:
            x = list_column_to_matrix(enc(t).column("embedding")).astype(np.float64)
            if x.size == 0:
                return pa.table(
                    {
                        "n": pa.array([], pa.int64()),
                        "xtx": pa.array([], pa.list_(pa.float64())),
                        "xty": pa.array([], pa.list_(pa.float64())),
                    }
                )
            return pa.table(
                {
                    "n": pa.array([x.shape[0]], pa.int64()),
                    "xtx": pa.array([(x.T @ x).ravel().tolist()], pa.list_(pa.float64())),
                    "xty": pa.array(
                        [(label * x.sum(axis=0)).tolist()], pa.list_(pa.float64())
                    ),
                }
            )

        return ds.map_batches(partial, batch_format="pyarrow")

    xtx = np.zeros((dim, dim))
    xty = np.zeros(dim)
    n_total = 0
    for part in (stats_for(pos_ds, 1.0), stats_for(neg_ds, -1.0)):
        for b in part.iter_batches(batch_format="pyarrow"):
            for n, a, y in zip(
                b.column("n").to_pylist(),
                b.column("xtx").to_pylist(),
                b.column("xty").to_pylist(),
            ):
                n_total += n
                xtx += np.asarray(a).reshape(dim, dim)
                xty += np.asarray(y)
    if n_total == 0:
        raise ValueError("train_quality_classifier: no training rows")
    w = np.linalg.solve(xtx + ridge * np.eye(dim), xty)
    return QualityClassifier(w=w, dim=dim, ngram=ngram, seed=seed)


def score_quality(
    ds,
    clf: QualityClassifier,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int | None = 6,
    features_col: str | None = None,
):
    """Attach ``quality_prob`` = σ(x·w) per doc (stateless map; w is d
    floats carried by value — no object-store round trip needed).
    ``features_col`` names a precomputed ``list<float64>`` feature column
    to score directly, skipping the text encode — for callers that already
    materialized features (e.g. the oracle side-input path)."""
    from ..functions.arrays import list_column_to_matrix

    enc = clf.encoder(text_col, id_col) if features_col is None else None
    w = clf.w

    def score(t: pa.Table) -> pa.Table:
        if features_col is not None:
            x = list_column_to_matrix(t.column(features_col))
        else:
            x = list_column_to_matrix(enc(t).column("embedding")).astype(np.float64)
        z = x @ w if x.size else np.zeros(t.num_rows)
        p = 1.0 / (1.0 + np.exp(-z))
        if round_to is not None:
            from ..functions.arrays import sql_round

            p = sql_round(p, round_to)
        return pa.table(
            {
                id_col: t.column(id_col),
                "quality_prob": pa.array(p, pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")
