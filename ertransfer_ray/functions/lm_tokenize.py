"""M15: LM pair tokenization — truncation budget + CLS/SEP layout + padding.

Pure-Python parity of the reference's feature conversion
(/root/reference/methods/emtransformer/feature_extraction.py:9-28 truncation,
:31-152 layout): the *semantics* (truncate-longer-first budget loop, special
token accounting, segment ids, attention mask, fixed-length padding, the
XLNet cls-at-end / RoBERTa extra-SEP / pad-on-left variants) are fully
implemented and tested; only the learned WordPiece vocabulary is absent in
this container, so token→id uses a deterministic hash vocabulary and the
tokenizer is a whitespace+punctuation splitter (the plumbing a real HF
tokenizer would drop into unchanged — swap ``basic_tokenize`` /
``tokens_to_ids`` per actor in ``PairTokenizer.__init__``).

Special-token id conventions follow the public BERT vocab (PAD=0, CLS=101,
SEP=102); hashed token ids live above the special range.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from .hashing import stable_hash64

PAD_ID = 0
CLS_ID = 101
SEP_ID = 102
_SPECIAL_FLOOR = 1000  # hashed vocab ids start here
_TOKEN_RE = re.compile(r"\w+|[^\w\s]")


def truncate_seq_pair(tokens_a: list, tokens_b: list, max_length: int) -> tuple[list, list]:
    """Reference ``_truncate_seq_pair`` (feature_extraction.py:9-28): pop one
    token at a time from the LONGER sequence (ties pop b) until the combined
    length fits the budget. Returns new (shorter or equal) lists."""
    a, b = list(tokens_a), list(tokens_b)
    while len(a) + len(b) > max_length:
        if len(a) > len(b):
            a.pop()
        else:
            b.pop()
    return a, b


def truncated_lengths(la: int, lb: int, max_length: int) -> tuple[int, int]:
    """Closed form of :func:`truncate_seq_pair`'s final lengths — O(1)
    instead of O(overflow), for vectorized batch planning. Equivalence with
    the loop is property-tested (tests/test_lm_tokenize.py)."""
    if la + lb <= max_length:
        return la, lb
    # the loop drains the longer side first; once balanced it alternates
    # (b first on ties), ending at ceil/floor of the budget unless one side
    # was already below its half-share
    half_hi = (max_length + 1) // 2
    la2 = min(la, max(half_hi, max_length - lb))
    return la2, max_length - la2


def basic_tokenize(text: str, do_lower_case: bool = True) -> list[str]:
    """Whitespace + punctuation split (stand-in for WordPiece; the reference
    lowercases via the tokenizer's do_lower_case,
    methods/emtransformer/entrypoint.py:103)."""
    if do_lower_case:
        text = text.lower()
    return _TOKEN_RE.findall(text)


def tokens_to_ids(tokens: list[str]) -> np.ndarray:
    """Deterministic hash vocabulary: stable 64-bit hash folded into
    [_SPECIAL_FLOOR, 2^31) so ids never collide with the special tokens."""
    if not tokens:
        return np.zeros(0, dtype=np.int64)
    h = stable_hash64(tokens)
    return (
        (h % np.uint64((1 << 31) - _SPECIAL_FLOOR)).astype(np.int64) + _SPECIAL_FLOOR
    )


class WordPieceVocab:
    """Real WordPiece vocabulary loaded from a BERT-style vocab file (one
    token per line, id = line number) — the drop-in that replaces the hash
    vocabulary when the learned vocab is available. ``tokenize`` is the
    public greedy longest-match-first algorithm with ``##`` continuation
    pieces and ``[UNK]`` fallback (BERT's published tokenizer semantics);
    special-token ids come from the file itself."""

    def __init__(self, vocab_path: str, unk_token: str = "[UNK]",
                 max_chars_per_word: int = 100):
        with open(vocab_path, encoding="utf-8") as f:
            self.vocab = {line.rstrip("\n"): i for i, line in enumerate(f)}
        if unk_token not in self.vocab:
            raise ValueError(f"vocab file lacks {unk_token!r}: {vocab_path}")
        self.unk_token = unk_token
        self.max_chars_per_word = max_chars_per_word
        self.pad_id = self.vocab.get("[PAD]", PAD_ID)
        self.cls_id = self.vocab.get("[CLS]", CLS_ID)
        self.sep_id = self.vocab.get("[SEP]", SEP_ID)

    def wordpiece(self, word: str) -> list[str]:
        if len(word) > self.max_chars_per_word:
            return [self.unk_token]
        pieces: list[str] = []
        start = 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = sub
                    break
                end -= 1
            if cur is None:
                return [self.unk_token]
            pieces.append(cur)
            start = end
        return pieces

    def tokenize(self, words: list[str]) -> list[str]:
        out: list[str] = []
        for w in words:
            out.extend(self.wordpiece(w))
        return out

    def ids(self, tokens: list[str]) -> np.ndarray:
        unk = self.vocab[self.unk_token]
        return np.fromiter(
            (self.vocab.get(t, unk) for t in tokens), dtype=np.int64,
            count=len(tokens),
        )


def encode_pair(
    tokens_a: list[str],
    tokens_b: list[str] | None,
    max_seq_length: int,
    cls_token_at_end: bool = False,
    sep_token_extra: bool = False,
    pad_on_left: bool = False,
    cls_token_segment_id: int = 1,
    sequence_a_segment_id: int = 0,
    sequence_b_segment_id: int = 1,
    pad_token_segment_id: int = 0,
    ids_fn=None,
    cls_id: int = CLS_ID,
    sep_id: int = SEP_ID,
    pad_id: int = PAD_ID,
) -> dict:
    """The reference's InputFeatures layout (feature_extraction.py:44-128):

    - pair budget = max_seq_length − (4 if extra SEP else 3); single budget
      = max_seq_length − (3 if extra SEP else 2)
    - BERT/XLM: [CLS] A [SEP] (SEP) B [SEP]; XLNet: A [SEP] (SEP) B [SEP] [CLS]
    - segment ids: CLS gets ``cls_token_segment_id``, A-run 0, B-run 1
    - attention mask 1 on real tokens; zero-pad (left or right) to length.

    Returns dict(input_ids, input_mask, segment_ids) as int64 numpy arrays
    of length ``max_seq_length`` plus the surviving token strings.
    """
    if tokens_b is not None:
        special = 4 if sep_token_extra else 3
        tokens_a, tokens_b = truncate_seq_pair(tokens_a, tokens_b, max_seq_length - special)
    else:
        special = 3 if sep_token_extra else 2
        tokens_a = list(tokens_a)[: max_seq_length - special]

    tokens = list(tokens_a) + ["[SEP]"]
    if sep_token_extra:
        tokens += ["[SEP]"]
    segment_ids = [sequence_a_segment_id] * len(tokens)
    if tokens_b:
        tokens += list(tokens_b) + ["[SEP]"]
        segment_ids += [sequence_b_segment_id] * (len(tokens_b) + 1)
    if cls_token_at_end:
        tokens = tokens + ["[CLS]"]
        segment_ids = segment_ids + [cls_token_segment_id]
    else:
        tokens = ["[CLS]"] + tokens
        segment_ids = [cls_token_segment_id] + segment_ids

    ids = np.empty(len(tokens), dtype=np.int64)
    plain_idx = [i for i, t in enumerate(tokens) if t not in ("[CLS]", "[SEP]")]
    ids[:] = cls_id
    for i, t in enumerate(tokens):
        if t == "[SEP]":
            ids[i] = sep_id
    if plain_idx:
        ids[plain_idx] = (ids_fn or tokens_to_ids)([tokens[i] for i in plain_idx])

    mask = np.ones(len(tokens), dtype=np.int64)
    seg = np.asarray(segment_ids, dtype=np.int64)
    pad = max_seq_length - len(tokens)
    if pad_on_left:
        ids = np.concatenate([np.full(pad, pad_id, dtype=np.int64), ids])
        mask = np.concatenate([np.zeros(pad, dtype=np.int64), mask])
        seg = np.concatenate([np.full(pad, pad_token_segment_id, dtype=np.int64), seg])
    else:
        ids = np.concatenate([ids, np.full(pad, pad_id, dtype=np.int64)])
        mask = np.concatenate([mask, np.zeros(pad, dtype=np.int64)])
        seg = np.concatenate([seg, np.full(pad, pad_token_segment_id, dtype=np.int64)])
    assert len(ids) == len(mask) == len(seg) == max_seq_length
    return {"tokens": tokens, "input_ids": ids, "input_mask": mask, "segment_ids": seg}


class PairTokenizer:
    """Actor-pool stage (T5 front half): batch of candidate-pair rows →
    fixed-length (input_ids, input_mask, segment_ids) list columns, keys
    carried. A real deployment loads the HF tokenizer HERE, once per actor
    (the reference loads it once per process, entrypoint.py:83-109), and
    replaces basic_tokenize/tokens_to_ids; everything else is unchanged.

    Use: ``pairs.map_batches(PairTokenizer, fn_constructor_kwargs=...,
    batch_format="pandas", concurrency=(1, N), batch_size=B)``.
    """

    def __init__(
        self,
        left_col: str = "left_payload",
        right_col: str = "right_payload",
        max_seq_length: int = 128,
        do_lower_case: bool = True,
        cls_token_at_end: bool = False,
        sep_token_extra: bool = False,
        pad_on_left: bool = False,
        vocab_path: str | None = None,
    ):
        self.left_col = left_col
        self.right_col = right_col
        self.max_seq_length = max_seq_length
        self.do_lower_case = do_lower_case
        self.layout = dict(
            cls_token_at_end=cls_token_at_end,
            sep_token_extra=sep_token_extra,
            pad_on_left=pad_on_left,
        )
        if vocab_path is not None:
            # the REAL-vocab drop-in: loaded ONCE per actor, exactly where a
            # HF tokenizer would live (reference entrypoint.py:83-109) —
            # WordPiece splits + file ids replace the hash vocabulary, layout
            # semantics unchanged
            vocab = WordPieceVocab(vocab_path)
            self._split = vocab.tokenize
            self.layout.update(
                ids_fn=vocab.ids,
                cls_id=vocab.cls_id, sep_id=vocab.sep_id, pad_id=vocab.pad_id,
            )
        else:
            self._split = None

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out_ids, out_mask, out_seg = [], [], []
        for a, b in zip(batch[self.left_col], batch[self.right_col]):
            ta = basic_tokenize(a or "", self.do_lower_case)
            tb = basic_tokenize(b or "", self.do_lower_case)
            if self._split is not None:
                ta, tb = self._split(ta), self._split(tb)
            enc = encode_pair(
                ta,
                tb,
                self.max_seq_length,
                **self.layout,
            )
            out_ids.append(enc["input_ids"])
            out_mask.append(enc["input_mask"])
            out_seg.append(enc["segment_ids"])
        out = batch[[c for c in ("left_url", "right_url") if c in batch.columns]].copy()
        out["input_ids"] = out_ids
        out["input_mask"] = out_mask
        out["segment_ids"] = out_seg
        return out


def tokenize_pairs(pairs_ds, batch_size: int = 1024, concurrency=2, **tok_kwargs):
    """pairs Dataset (…payload columns…) → tokenized feature Dataset.
    The M15 stage as Dataset algebra; slot a real tokenizer via tok_kwargs."""
    return pairs_ds.map_batches(
        PairTokenizer,
        fn_constructor_kwargs=tok_kwargs,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )
