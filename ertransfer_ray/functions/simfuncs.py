"""String/set/vector similarity kernels — the reference's matcher feature
family (T6 Magellan sim features, J1 token similarity, T4/cosine), implemented
with numpy; no external similarity libraries.

Reference citations:
- token/q-gram set similarity (cosine/dice/jaccard) — the pyjedai TopKJoin
  metric family configured at /root/reference/splitters/KNN-Join/settings.py:1-12
- Jaro-Winkler / token features — Magellan's auto feature table,
  /root/reference/methods/magellan/entrypoint.py:63-127
- embedding cosine — /root/reference/methods/embeddings/get_similarity.py:4-10
"""

from __future__ import annotations

import numpy as np


def qgrams(s: str, q: int = 5, multiset: bool = True) -> list[str]:
    """Character q-grams; the reference's default blocking tokenization is
    5-gram multiset (splitters/KNN-Join/splitter.py:179-181)."""
    if len(s) < q:
        return [s] if s else []
    grams = [s[i : i + q] for i in range(len(s) - q + 1)]
    return grams if multiset else list(dict.fromkeys(grams))


def jaccard(a, b) -> float:
    """Set Jaccard |A∩B| / |A∪B|."""
    sa, sb = set(a), set(b)
    if not sa and not sb:
        return 1.0
    u = len(sa | sb)
    return len(sa & sb) / u if u else 0.0


def dice(a, b) -> float:
    sa, sb = set(a), set(b)
    if not sa and not sb:
        return 1.0
    d = len(sa) + len(sb)
    return 2.0 * len(sa & sb) / d if d else 0.0


def cosine_set(a, b) -> float:
    """Set cosine |A∩B| / sqrt(|A||B|) — the reference's default J1 metric."""
    sa, sb = set(a), set(b)
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / float(np.sqrt(len(sa) * len(sb)))


def overlap_coefficient(a, b) -> float:
    sa, sb = set(a), set(b)
    m = min(len(sa), len(sb))
    return len(sa & sb) / m if m else 1.0


def cosine_bag(a, b) -> float:
    """Multiset (term-frequency vector) cosine — the reference's TopKJoin
    'multiset' tokenization mode (settings.py 'multiset': True)."""
    from collections import Counter

    ca, cb = Counter(a), Counter(b)
    if not ca and not cb:
        return 1.0
    if not ca or not cb:
        return 0.0
    dot = sum(v * cb[k] for k, v in ca.items() if k in cb)
    na = np.sqrt(sum(v * v for v in ca.values()))
    nb = np.sqrt(sum(v * v for v in cb.values()))
    return dot / float(na * nb)


def dice_bag(a, b) -> float:
    """Multiset Dice: 2·Σ min(tf_a, tf_b) / (|a| + |b|) over token bags."""
    from collections import Counter

    ca, cb = Counter(a), Counter(b)
    if not ca and not cb:
        return 1.0
    d = sum(ca.values()) + sum(cb.values())
    inter = sum(min(v, cb[k]) for k, v in ca.items() if k in cb)
    return 2.0 * inter / d if d else 0.0


def set_metric(similarity: str = "cosine", multiset: bool = True):
    """Resolve the reference's (similarity, multiset) setting pair
    (splitters/KNN-Join/settings.py:1-12) to a token-list scoring kernel."""
    table = {
        ("cosine", True): cosine_bag,
        ("cosine", False): cosine_set,
        ("dice", True): dice_bag,
        ("dice", False): dice,
        ("jaccard", True): jaccard,
        ("jaccard", False): jaccard,
    }
    try:
        return table[(similarity, multiset)]
    except KeyError:
        raise ValueError(f"unknown similarity metric {similarity!r}") from None


class PreparedBag:
    """Per-document token bag prepared ONCE for many pair scorings:
    tokens → stable-hashed uint64 keys, sorted + unique, with counts.
    Kernel-building (Counter construction, set hashing) is the dominant
    cost when a doc scores against hundreds of candidates — measured ~60 µs
    per cosine_bag call vs ~8 µs for the prepared intersect1d form."""

    __slots__ = ("keys", "counts", "norm", "total")

    def __init__(self, tokens):
        from .hashing import stable_hash64

        if len(tokens) == 0:
            self.keys = np.empty(0, dtype=np.uint64)
            self.counts = np.empty(0, dtype=np.float64)
            self.norm = 0.0
            self.total = 0.0
            return
        h = np.sort(stable_hash64(list(tokens)))
        keys, counts = np.unique(h, return_counts=True)
        self.keys = keys
        self.counts = counts.astype(np.float64)
        self.norm = float(np.sqrt(np.sum(self.counts * self.counts)))
        self.total = float(self.counts.sum())


def prepare_bags(token_lists) -> list[PreparedBag]:
    """Batched PreparedBag construction: ONE stable_hash64 call over the
    concatenated tokens of every doc (per-doc hashing pays ~1 ms of
    pandas hash_array call overhead; batched it amortizes to ~0.1 µs per
    token), then per-doc sort+unique."""
    from .hashing import stable_hash64

    lens = [len(t) for t in token_lists]
    flat: list = []
    for t in token_lists:
        flat.extend(t)
    h = stable_hash64(flat) if flat else np.empty(0, dtype=np.uint64)
    out = []
    off = 0
    for n in lens:
        bag = PreparedBag.__new__(PreparedBag)
        seg = h[off : off + n]
        off += n
        keys, counts = np.unique(seg, return_counts=True)
        bag.keys = keys
        bag.counts = counts.astype(np.float64)
        bag.norm = float(np.sqrt(np.sum(bag.counts * bag.counts)))
        bag.total = float(bag.counts.sum())
        out.append(bag)
    return out


def _prepared_inter(a: PreparedBag, b: PreparedBag):
    _, ia, ib = np.intersect1d(
        a.keys, b.keys, assume_unique=True, return_indices=True
    )
    return ia, ib


def prepared_metric(similarity: str = "cosine", multiset: bool = True):
    """Pair kernel over :class:`PreparedBag` objects — same values as
    ``set_metric(similarity, multiset)`` over the raw token lists (the
    multiset=False caller passes deduplicated tokens, making counts 1 and
    the bag forms reduce to the set forms)."""

    def cos(a: PreparedBag, b: PreparedBag) -> float:
        if a.norm == 0.0 and b.norm == 0.0:
            return 1.0
        if a.norm == 0.0 or b.norm == 0.0:
            return 0.0
        ia, ib = _prepared_inter(a, b)
        if multiset:
            return float(np.dot(a.counts[ia], b.counts[ib])) / (a.norm * b.norm)
        return len(ia) / float(np.sqrt(len(a.keys) * len(b.keys)))

    def dice_k(a: PreparedBag, b: PreparedBag) -> float:
        if a.total == 0.0 and b.total == 0.0:
            return 1.0
        ia, ib = _prepared_inter(a, b)
        if multiset:
            d = a.total + b.total
            inter = float(np.minimum(a.counts[ia], b.counts[ib]).sum())
            return 2.0 * inter / d if d else 0.0
        d = len(a.keys) + len(b.keys)
        return 2.0 * len(ia) / d if d else 0.0

    def jac(a: PreparedBag, b: PreparedBag) -> float:
        if len(a.keys) == 0 and len(b.keys) == 0:
            return 1.0
        ia, _ = _prepared_inter(a, b)
        u = len(a.keys) + len(b.keys) - len(ia)
        return len(ia) / u if u else 0.0

    table = {"cosine": cos, "dice": dice_k, "jaccard": jac}
    try:
        return table[similarity]
    except KeyError:
        raise ValueError(f"unknown similarity metric {similarity!r}") from None


def jaro(a: str, b: str) -> float:
    """Jaro similarity (scalar). Short-string kernel for titles/names."""
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    bm = np.zeros(lb, dtype=bool)
    am = np.zeros(la, dtype=bool)
    matches = 0
    for i, ca in enumerate(a):
        lo = max(0, i - window)
        hi = min(lb, i + window + 1)
        for j in range(lo, hi):
            if not bm[j] and b[j] == ca:
                bm[j] = True
                am[i] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    k = 0
    for i in range(la):
        if am[i]:
            while not bm[k]:
                k += 1
            if a[i] != b[k]:
                transpositions += 1
            k += 1
    t = transpositions / 2
    m = matches
    return (m / la + m / lb + (m - t) / m) / 3.0


def jaro_winkler(a: str, b: str, p: float = 0.1, max_prefix: int = 4) -> float:
    """Jaro-Winkler with standard prefix boost."""
    j = jaro(a, b)
    if j == 0.0:
        return 0.0
    prefix = 0
    for ca, cb in zip(a[:max_prefix], b[:max_prefix]):
        if ca != cb:
            break
        prefix += 1
    return j + prefix * p * (1.0 - j)


def batch_jaro_winkler(left: list[str], right: list[str]) -> np.ndarray:
    """Per-pair Jaro-Winkler over aligned lists.

    Character-level similarity doesn't vectorize with numpy; strings here are
    bounded (normalized titles, truncated), so a tight Python loop per batch
    inside the scoring actor pool is the pragmatic kernel. Loop cost is
    amortized per batch, setup (none needed) per actor.
    """
    return np.fromiter(
        (jaro_winkler(a, b) for a, b in zip(left, right)),
        dtype=np.float64,
        count=len(left),
    )


def batch_token_jaccard(left_tokens: list[list[str]], right_tokens: list[list[str]]) -> np.ndarray:
    return np.fromiter(
        (jaccard(a, b) for a, b in zip(left_tokens, right_tokens)),
        dtype=np.float64,
        count=len(left_tokens),
    )


def length_ratio(left: list[str], right: list[str]) -> np.ndarray:
    la = np.fromiter((len(s) for s in left), dtype=np.float64, count=len(left))
    lb = np.fromiter((len(s) for s in right), dtype=np.float64, count=len(right))
    mx = np.maximum(la, lb)
    mn = np.minimum(la, lb)
    out = np.ones_like(mx)
    nz = mx > 0
    out[nz] = mn[nz] / mx[nz]
    return out


# ---------------------------------------------------------------------------
# Vector (embedding) similarity — fully vectorized
# ---------------------------------------------------------------------------

def cosine_matrix(x: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Cosine similarity between row-vectors ``x (n,d)`` and ``q (m,d)`` →
    ``(n, m)``. float64 accumulation for cross-engine reproducibility
    (DuckDB's list_cosine_similarity also accumulates in double).
    """
    x = np.asarray(x, dtype=np.float64)
    q = np.atleast_2d(np.asarray(q, dtype=np.float64))
    xn = np.linalg.norm(x, axis=1, keepdims=True)
    qn = np.linalg.norm(q, axis=1, keepdims=True)
    xn[xn == 0] = 1.0
    qn[qn == 0] = 1.0
    return (x / xn) @ (q / qn).T


def pairwise_cosine(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Row-aligned cosine between ``x (n,d)`` and ``y (n,d)`` → ``(n,)``."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    num = (x * y).sum(axis=1)
    den = np.linalg.norm(x, axis=1) * np.linalg.norm(y, axis=1)
    out = np.zeros(len(x))
    nz = den > 0
    out[nz] = num[nz] / den[nz]
    return out


def softmax(logits: np.ndarray, axis: int = -1) -> np.ndarray:
    """M13: logits → probabilities (reference methods/ditto/transform.py:101)."""
    z = logits - logits.max(axis=axis, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=axis, keepdims=True)
