"""Per-dataset splitter settings registry + selection.

The reference tunes its Top-K blocking per dataset to a 0.90 blocking-recall
level and selects the row by parsing the dataset folder name from the input
path (``d<N>_…`` → ``d<N>``): table at
/root/reference/splitters/KNN-Join/settings.py:1-12, selection at
splitter.py:175-183. The values below replicate that published
configuration table (data, not code); ``default`` mode mirrors
splitter.py:179-183 — the stock config with ``reverse`` flipped on when
table A is smaller than table B (the K-indexed side should be the larger
one).

Key mapping reference → engine: ``QGram`` → ``qgram``, ``K`` → ``k``,
``similarity``/``multiset`` → the set_metric pair, ``clean`` →
prepare_entity_table's clean flag, ``reverse`` → topk_similarity_join's
side swap.
"""

from __future__ import annotations

import re

#: recall level → dataset → settings (reference settings.py:1-12, verbatim
#: values with engine key names).
DATASET_SETTINGS: dict[float, dict[str, dict]] = {
    0.90: {
        "d1": dict(clean=True, reverse=True, qgram=4, multiset=True, similarity="dice", k=1),
        "d2": dict(clean=True, reverse=False, qgram=3, multiset=True, similarity="cosine", k=4),
        "d3": dict(clean=True, reverse=True, qgram=5, multiset=True, similarity="cosine", k=26),
        "d4": dict(clean=False, reverse=False, qgram=2, multiset=True, similarity="cosine", k=1),
        "d5": dict(clean=False, reverse=False, qgram=5, multiset=False, similarity="cosine", k=1),
        "d6": dict(clean=False, reverse=False, qgram=5, multiset=False, similarity="cosine", k=1),
        "d7": dict(clean=False, reverse=False, qgram=5, multiset=False, similarity="cosine", k=1),
        "d8": dict(clean=True, reverse=True, qgram=4, multiset=True, similarity="cosine", k=2),
        "d9": dict(clean=False, reverse=True, qgram=4, multiset=False, similarity="cosine", k=1),
        "d10": dict(clean=False, reverse=True, qgram=4, multiset=False, similarity="cosine", k=5),
    }
}

#: splitter.py:179 — the stock configuration used with ``-d``.
DEFAULT_SETTINGS = dict(
    clean=True, reverse=False, qgram=5, multiset=True, similarity="cosine", k=5
)

#: DeepBlocker per-dataset table (reference splitters/DeepBlocker/
#: settings.py:1-13, verbatim values; K there counts embedding-KNN
#: neighbours, no q-gram/similarity knobs).
DEEPBLOCKER_SETTINGS: dict[float, dict[str, dict]] = {
    0.90: {
        "d1": dict(clean=False, reverse=False, k=1),
        "d2": dict(clean=True, reverse=True, k=35),
        "d3": dict(clean=True, reverse=True, k=180),
        "d4": dict(clean=True, reverse=True, k=1),
        "d5": dict(clean=True, reverse=False, k=31),
        "d6": dict(clean=False, reverse=False, k=63),
        "d7": dict(clean=True, reverse=True, k=1),
        "d8": dict(clean=True, reverse=False, k=17),
        "d9": dict(clean=True, reverse=False, k=5),
    }
}

DEEPBLOCKER_DEFAULT = dict(clean=True, reverse=False, k=5)


def dataset_key_from_path(input_path: str) -> str:
    """'…/d8_amazon_walmart[/]' → 'd8' (reference splitter.py:175-178)."""
    parts = [p for p in str(input_path).split("/") if p]
    if not parts:
        raise ValueError(f"cannot parse dataset folder from {input_path!r}")
    key = parts[-1].split("_")[0]
    if not re.fullmatch(r"d\d+", key):
        raise ValueError(f"dataset folder {parts[-1]!r} does not start with d<N>_")
    return key


def select_settings(
    input_path: str,
    recall: float = 0.90,
    default: bool = False,
    table_a_rows: int | None = None,
    table_b_rows: int | None = None,
    method: str = "knn",
) -> dict:
    """Resolve the splitter settings for a dataset directory.

    ``default=True`` → stock config, with ``reverse`` enabled when A is the
    smaller table (splitter.py:179-183). Otherwise the registry row for the
    parsed ``d<N>`` key at the requested recall level; unknown datasets fall
    back to the default rule rather than failing. ``method`` picks the
    registry: "knn" (Top-K q-gram join) or "deepblocker" (embedding KNN)."""
    registry, default_row = {
        "knn": (DATASET_SETTINGS, DEFAULT_SETTINGS),
        "deepblocker": (DEEPBLOCKER_SETTINGS, DEEPBLOCKER_DEFAULT),
    }[method]
    if not default:
        try:
            key = dataset_key_from_path(input_path)
            return dict(registry[recall][key])
        except (KeyError, ValueError):
            pass
    settings = dict(default_row)
    if (
        table_a_rows is not None
        and table_b_rows is not None
        and table_a_rows < table_b_rows
    ):
        settings["reverse"] = True
    return settings
