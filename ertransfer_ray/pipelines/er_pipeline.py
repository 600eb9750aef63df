"""End-to-end ER pipeline: normalize → block → score → cluster.

The three-stage streaming DAG of BASELINE.json.north_star, wired from the
stage modules. Each stage is lazy Dataset algebra; nothing materializes the
full corpus on the driver. Stage boundaries can be checkpointed to
partitioned Parquet via state.manifest for resumable runs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa

from ..functions.textnorm import normalize_pages_batch
from ..stages.blocking import emit_block_keys, generate_pairs
from ..stages.clustering import connected_components, reciprocal_top1
from ..stages.scoring import score_pairs


@dataclass
class ERConfig:
    # blocking
    num_perm: int = 64
    num_bands: int = 16
    tokenization: str = "words"
    sn_prefix: int = 12
    payload_chars: int = 256
    max_block_size: int = 64
    window: int = 8
    # scoring; None → sized from cluster CPUs minus shuffle headroom
    weights: dict | str | None = None
    scorer_concurrency: int | tuple | None = None
    scorer_batch_size: int = 2048
    # clustering
    theta: float = 0.5
    reciprocal: bool = False  # True → 1:1 semantics (D4) before closure
    cc_rounds: int = 25
    cc_driver_threshold: int = 200_000
    seed: int = 7
    extra: dict = field(default_factory=dict)


def normalize_pages(pages_ds):
    """Stage 0: html → byte-identical text + normalized title/text."""
    return pages_ds.map_batches(normalize_pages_batch, batch_format="pyarrow")


def block(norm_ds, cfg: ERConfig):
    """Stage 1: blocking keys + bounded pair generation."""
    keyed = emit_block_keys(
        norm_ds,
        num_perm=cfg.num_perm,
        num_bands=cfg.num_bands,
        seed=cfg.seed,
        tokenization=cfg.tokenization,
        sn_prefix=cfg.sn_prefix,
        payload_chars=cfg.payload_chars,
    )
    return generate_pairs(keyed, max_block_size=cfg.max_block_size, window=cfg.window)


def score(pairs_ds, cfg: ERConfig):
    """Stage 2: actor-pool pairwise scoring → (left_url, right_url, prob)."""
    return score_pairs(
        pairs_ds,
        weights=cfg.weights,
        concurrency=cfg.scorer_concurrency,
        batch_size=cfg.scorer_batch_size,
    )


def cluster(predictions_ds, cfg: ERConfig):
    """Stage 3: threshold (+optional reciprocal top-1) → connected components."""
    if cfg.reciprocal:
        edges = reciprocal_top1(predictions_ds, theta=cfg.theta)
    else:
        edges = predictions_ds.map_batches(
            lambda t: t.filter(pa.compute.greater(t["prob"], cfg.theta)),
            batch_format="pyarrow",
        )
    return connected_components(
        edges, max_rounds=cfg.cc_rounds, driver_threshold=cfg.cc_driver_threshold
    )


def run_er(pages_ds, cfg: ERConfig | None = None, normalized: bool = False) -> dict:
    """Full pipeline. Returns dict of lazy Datasets:
    ``{"normalized", "pairs", "predictions", "clusters"}``.

    ``normalized=True`` skips stage 0 when the input already has
    (url, norm_text, norm_title) — e.g. the documents-table adapter.
    """
    cfg = cfg or ERConfig()
    norm = pages_ds if normalized else normalize_pages(pages_ds)
    pairs = block(norm, cfg)
    predictions = score(pairs, cfg)
    clusters = cluster(predictions, cfg)
    return {
        "normalized": norm,
        "pairs": pairs,
        "predictions": predictions,
        "clusters": clusters,
    }
