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


def batch_term_counts(texts: "pd.Series") -> "pd.Series":
    """Exact term counts of one batch under the corpus-wide tokenization
    convention (lowercase, whitespace split) — THE single implementation
    behind every term-frequency partial (corpus_top_terms, Misra-Gries
    heavy hitters, BPE word counts). Comparison contract with the SQL
    regexp_split '\\s+' oracles is ASCII-whitespace corpora (pandas
    .str.split also splits exotic Unicode whitespace)."""
    ex = texts.fillna("").astype(str).str.lower().str.split().explode().dropna()
    return ex.value_counts()


def bpe_ish_token_count(texts: list[str]) -> np.ndarray:
    """Regex word+punct tokenization count — the 'BPE-ish' estimate.
    Vectorized: one C-level regex count over the batch (same matches as
    ``len(_BPE_ISH.findall(t))`` per text)."""
    s = pd.Series(texts, dtype="object")
    return s.str.count(_BPE_ISH).fillna(0).to_numpy(dtype=np.int64)


def _word_hit_counts(texts: list[str], distinct: bool) -> pd.DataFrame:
    """Per-document per-language stopword hit counts, one exploded pass.

    ``distinct=True`` counts stopword TYPES (set semantics, language_id);
    ``distinct=False`` counts occurrences (stopword_ratio)."""
    s = pd.Series(texts, dtype="object").str.lower().str.split()
    ex = s.explode().dropna()
    if distinct:
        pairs = pd.DataFrame({"doc": ex.index.to_numpy(), "w": ex.to_numpy()})
        pairs = pairs.drop_duplicates()
        ex = pd.Series(pairs["w"].to_numpy(), index=pairs["doc"].to_numpy())
    out = pd.DataFrame(index=pd.RangeIndex(len(texts)))
    for lang, prof in sorted(_LANG_PROFILES.items()):
        hits = ex[ex.isin(prof)].groupby(level=0).size()
        out[lang] = hits.reindex(out.index, fill_value=0).to_numpy()
    return out


def language_id(texts: list[str]) -> tuple[list[str], np.ndarray]:
    """Stopword-profile language heuristic → (lang, confidence).

    Deterministic: argmax over per-language DISTINCT-stopword hit counts,
    ties broken by language code order; 'und' (undetermined) when nothing
    matches. Vectorized: one lower+split+explode pass, per-language ``isin``
    + grouped size — no per-document Python."""
    if not len(texts):
        return [], np.zeros(0)
    counts = _word_hit_counts(texts, distinct=True)
    langs_sorted = list(counts.columns)
    m = counts.to_numpy(dtype=np.int64)
    best_idx = np.argmax(m, axis=1)  # first max = sorted-code tie-break
    best_cnt = m[np.arange(len(m)), best_idx]
    total = m.sum(axis=1)
    langs = [
        langs_sorted[j] if c > 0 else "und" for j, c in zip(best_idx, best_cnt)
    ]
    with np.errstate(invalid="ignore", divide="ignore"):
        confs = np.where(total > 0, best_cnt / np.maximum(total, 1), 0.0)
    confs[best_cnt == 0] = 0.0
    return langs, confs


_WS_CODEPOINTS = np.array(
    [9, 10, 11, 12, 13, 28, 29, 30, 31, 32, 0x85, 0xA0, 0x1680]
    + list(range(0x2000, 0x200B)) + [0x2028, 0x2029, 0x202F, 0x205F, 0x3000],
    dtype=np.uint32,
)
_PUNCT_CODEPOINTS = np.frombuffer(
    '.,;:!?"\'()[]{}'.encode("utf-32-le"), dtype=np.uint32
)


def quality_features(texts: list[str]) -> pd.DataFrame:
    """Per-document quality signals: length, token stats, punct/stopword/
    uppercase ratios, mean word length — the classic web-corpus filters.

    Char classes follow the documented SQL oracle (`[A-Z]`, `[0-9]`, ASCII
    punctuation over CHARACTER counts). Fully vectorized: the batch is one
    codepoint array, per-doc sums come from ``np.add.reduceat``; token-level
    features ride one pandas split/explode pass."""
    n = len(texts)
    if n == 0:
        return pd.DataFrame(
            {c: np.zeros(0) for c in (
                "n_chars", "n_tokens", "mean_word_len", "punct_ratio",
                "stopword_ratio", "upper_ratio", "digit_ratio")}
        ).astype({"n_chars": np.int64, "n_tokens": np.int64})
    arr = np.frombuffer("".join(texts).encode("utf-32-le"), dtype=np.uint32)
    lengths = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lengths[:-1], out=starts[1:])

    def per_doc_sum(mask: np.ndarray) -> np.ndarray:
        # reduceat needs in-bounds indices; empty docs contribute 0 via diff
        if len(arr) == 0:
            return np.zeros(n, dtype=np.int64)
        csum = np.concatenate([[0], np.cumsum(mask, dtype=np.int64)])
        return csum[starts + lengths] - csum[starts]

    is_ws = np.isin(arr, _WS_CODEPOINTS)
    punct = per_doc_sum(np.isin(arr, _PUNCT_CODEPOINTS))
    upper = per_doc_sum((arr >= 65) & (arr <= 90))
    digit = per_doc_sum((arr >= 48) & (arr <= 57))
    ws = per_doc_sum(is_ws)
    nonspace = lengths - ws

    # token-level: one lower+split+explode pass shared by count and stopwords
    s = pd.Series(texts, dtype="object").str.lower().str.split()
    n_tokens = s.str.len().fillna(0).to_numpy(dtype=np.int64)
    ex = s.explode().dropna()
    stop_hits = (
        ex[ex.isin(_LANG_PROFILES["en"])].groupby(level=0).size()
        .reindex(pd.RangeIndex(n), fill_value=0).to_numpy(dtype=np.int64)
    )

    safe_chars = np.maximum(lengths, 1)
    safe_toks = np.maximum(n_tokens, 1)
    return pd.DataFrame(
        {
            "n_chars": lengths,
            "n_tokens": n_tokens,
            "mean_word_len": np.where(n_tokens > 0, nonspace / safe_toks, 0.0),
            "punct_ratio": np.where(lengths > 0, punct / safe_chars, 0.0),
            "stopword_ratio": np.where(n_tokens > 0, stop_hits / safe_toks, 0.0),
            "upper_ratio": np.where(lengths > 0, upper / safe_chars, 0.0),
            "digit_ratio": np.where(lengths > 0, digit / safe_chars, 0.0),
        }
    )


def repetition_stats(texts: list[str]) -> pd.DataFrame:
    """Within-document repetition signals (the Gopher-style duplicate-n-gram
    quality filters): per doc, the fraction of words (resp. adjacent word
    2-grams) that are repeats of an earlier occurrence —
    ``1 − distinct/total`` over lowercase whitespace tokens. SQL-expressible
    via ``list_distinct`` (oracle `doc_repetition_stats`). Vectorized: one
    explode pass; 2-grams built by a shift within doc groups."""
    n = len(texts)
    s = pd.Series(texts, dtype="object").fillna("").str.lower().str.split()
    n_words = s.str.len().to_numpy(dtype=np.int64)

    ex = s.explode().dropna()
    idx = pd.RangeIndex(n)
    if len(ex):
        uniq_w = ex.groupby(level=0).nunique().reindex(idx, fill_value=0)
        uniq_w = uniq_w.to_numpy(dtype=np.int64)
        doc = np.asarray(ex.index, dtype=np.int64)
        words = ex.to_numpy(dtype=object)
        same_doc = doc[:-1] == doc[1:]
        grams = pd.DataFrame(
            {
                "doc": doc[:-1][same_doc],
                "g": pd.Series(words[:-1][same_doc]).str.cat(
                    pd.Series(words[1:][same_doc]), sep=" "
                ),
            }
        )
        uniq_g = (
            grams.groupby("doc")["g"].nunique().reindex(idx, fill_value=0)
            .to_numpy(dtype=np.int64)
        )
    else:
        uniq_w = np.zeros(n, dtype=np.int64)
        uniq_g = np.zeros(n, dtype=np.int64)

    n_2grams = np.maximum(n_words - 1, 0)
    dup_word_frac = np.where(
        n_words > 0, 1.0 - uniq_w / np.maximum(n_words, 1), 0.0
    )
    dup_2gram_frac = np.where(
        n_2grams > 0, 1.0 - uniq_g / np.maximum(n_2grams, 1), 0.0
    )
    return pd.DataFrame(
        {
            "n_words": n_words,
            "n_2grams": n_2grams,
            "dup_word_frac": dup_word_frac,
            "dup_2gram_frac": dup_2gram_frac,
        }
    )


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
