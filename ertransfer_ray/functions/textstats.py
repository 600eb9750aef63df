"""Text-analysis kernels for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

These extend the reference's text-processing family (M3/M4) with the
operations a large-scale corpus pipeline needs; each has a ``queries()``
entry over the ``documents`` table. Definitions are chosen to be
oracle-checkable where possible:

- ``token_count`` = number of whitespace-separated tokens
  (SQL: ``length(regexp_split_to_array(trim(text), '\\s+'))``)
- ``word_chars``/``n_chars`` are plain lengths
- language ID and quality score are deterministic heuristics (not
  SQL-expressible; driver records a rows-only check for them).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import rolling_fingerprint

_BPE_ISH = re.compile(r"\w+|[^\w\s]")

# tiny per-language stopword profiles for the n-gram/stopword language
# heuristic (public-knowledge word lists)
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "with"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu"},
    "fr": {"le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"},
    "es": {"el", "la", "los", "las", "es", "y", "que", "en", "por", "con"},
}


def token_count_batch(texts: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Whitespace token count, fully vectorized in Arrow: count of
    whitespace runs in the trimmed string + 1 (0 for empty)."""
    trimmed = pc.utf8_trim_whitespace(texts)
    runs = pc.count_substring_regex(trimmed, r"\s+")
    nonempty = pc.not_equal(trimmed, "")
    return pc.if_else(nonempty, pc.add(runs, 1), 0).combine_chunks()


def bpe_ish_token_count(texts: list[str]) -> np.ndarray:
    """Regex word+punct tokenization count — the 'BPE-ish' estimate."""
    return np.fromiter((len(_BPE_ISH.findall(t)) for t in texts), dtype=np.int64, count=len(texts))


def language_id(texts: list[str]) -> tuple[list[str], np.ndarray]:
    """Stopword-profile language heuristic → (lang, confidence).

    Deterministic: argmax over per-language stopword hit counts, ties broken
    by language code order; 'und' (undetermined) when nothing matches.
    """
    langs = []
    confs = np.zeros(len(texts))
    for i, t in enumerate(texts):
        words = set(t.lower().split())
        scores = {
            lang: len(words & prof) for lang, prof in sorted(_LANG_PROFILES.items())
        }
        best = max(sorted(scores), key=lambda k: scores[k])
        total = sum(scores.values())
        if scores[best] == 0:
            langs.append("und")
            confs[i] = 0.0
        else:
            langs.append(best)
            confs[i] = scores[best] / total if total else 0.0
    return langs, confs


def quality_features(texts: list[str]) -> pd.DataFrame:
    """Per-document quality signals: length, token stats, punct/stopword/
    uppercase ratios, mean word length — the classic web-corpus filters."""
    n = len(texts)
    out = {
        "n_chars": np.zeros(n, dtype=np.int64),
        "n_tokens": np.zeros(n, dtype=np.int64),
        "mean_word_len": np.zeros(n),
        "punct_ratio": np.zeros(n),
        "stopword_ratio": np.zeros(n),
        "upper_ratio": np.zeros(n),
        "digit_ratio": np.zeros(n),
    }
    en_stop = _LANG_PROFILES["en"]
    for i, t in enumerate(texts):
        out["n_chars"][i] = len(t)
        toks = t.split()
        out["n_tokens"][i] = len(toks)
        if t:
            chars = np.frombuffer(t.encode("utf-8", "replace"), dtype=np.uint8)
            out["punct_ratio"][i] = float(
                np.isin(chars, np.frombuffer(b".,;:!?\"'()[]{}", dtype=np.uint8)).mean()
            )
            out["upper_ratio"][i] = sum(c.isupper() for c in t) / len(t)
            out["digit_ratio"][i] = sum(c.isdigit() for c in t) / len(t)
        if toks:
            out["mean_word_len"][i] = float(np.mean([len(w) for w in toks]))
            out["stopword_ratio"][i] = sum(w.lower() in en_stop for w in toks) / len(toks)
    return pd.DataFrame(out)


def quality_score(texts: list[str]) -> np.ndarray:
    """Scalar quality score in [0,1]: penalize extreme length, high punct,
    low stopword ratio (boilerplate), high digit ratio. Deterministic."""
    f = quality_features(texts)
    score = np.ones(len(texts))
    score *= np.clip(f["n_tokens"] / 20.0, 0.0, 1.0)  # too-short penalty
    score *= np.clip(2.0 - f["n_tokens"] / 50_000.0, 0.0, 1.0)  # absurd length
    score *= 1.0 - np.clip(f["punct_ratio"] * 3.0, 0.0, 0.8)
    score *= 1.0 - np.clip(f["digit_ratio"] * 2.0, 0.0, 0.8)
    return np.clip(score, 0.0, 1.0)


class TextStats:
    """Actor-pool stage: adds language/quality/token/fingerprint columns.

    Regexes/profiles compile once per actor (``__init__``), per-batch work is
    array-at-a-time. Use as
    ``ds.map_batches(TextStats, batch_format="pyarrow", concurrency=N)``.
    """

    def __init__(self, text_col: str = "text", fingerprint: bool = True):
        self.text_col = text_col
        self.fingerprint = fingerprint

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        langs, confs = language_id(texts)
        batch = batch.append_column("lang_pred", pa.array(langs, pa.string()))
        batch = batch.append_column("lang_conf", pa.array(confs, pa.float64()))
        batch = batch.append_column("token_count", token_count_batch(batch.column(self.text_col)))
        batch = batch.append_column(
            "bpe_token_count", pa.array(bpe_ish_token_count(texts), pa.int64())
        )
        batch = batch.append_column("quality", pa.array(quality_score(texts), pa.float64()))
        if self.fingerprint:
            batch = batch.append_column(
                "fingerprint",
                pa.array(rolling_fingerprint(texts).astype(np.int64) >> 1, pa.int64()),
            )
        return batch
