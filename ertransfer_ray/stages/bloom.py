"""Mergeable Bloom filter over int64 key hashes — the membership-gate
sketch for lookup sides too big to broadcast exactly.

Beyond-reference operator (the reference engine broadcasts every lookup
side whole, methods/* pandas scripts); standard sketch, e.g. Bloom (1970)
and the mergeable-summaries framing of Agarwal et al. (PODS'12).

Why it earns its place at 100 TB: the exact broadcast arms in this repo
ship 8 B per distinct key (a sorted int64 array). A Bloom at the default
``fpp=0.5 %`` ships ~1.4 B per key — a ~5.7× smaller broadcast — and its
build never materializes the key list anywhere: each block contributes
only its DISTINCT probe positions (bounded by k × block keys, independent
of the filter width), OR-merged on the driver, so the bitmap is
block-layout-invariant by construction (OR is commutative/associative/
idempotent).

Error model is ONE-SIDED: ``contains`` never returns False for a member
(zero false negatives), and a non-member hits with probability
≈ (1 − e^(−kn/m))^k. Consumers in this repo therefore use the filter only
as a PREFILTER whose misses are definitive, with an exact verification
pass restricted to the (rare) hits — the composed result is exact, so it
keeps the value-level SQL oracle (see stages/decontam.py ``strategy=
"bloom"``).

Probe scheme: double hashing (Kirsch–Mitzenmauer) over the splitmix64
finalizer of the key — probe_i = (h1 + i·h2) mod m with m a power of two
and h2 forced odd so the probe sequence walks the whole table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)
_SEED2 = np.uint64(0xA5A5A5A55A5A5A5A)
_ONE = np.uint64(1)
_SIX = np.uint64(6)
_SIXTYTHREE = np.uint64(63)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized over uint64 (wrapping arithmetic)."""
    x = x + _GOLDEN
    x = (x ^ (x >> np.uint64(30))) * _MIX1
    x = (x ^ (x >> np.uint64(27))) * _MIX2
    return x ^ (x >> np.uint64(31))


def bloom_params(n_keys: int, fpp: float = 0.005) -> tuple[int, int]:
    """(m_bits, k) for ``n_keys`` expected distinct keys at false-positive
    rate ``fpp`` — the textbook m = −n·ln p / ln²2 rounded UP to a power of
    two (power-of-two widths make the probe a mask, not a modulo), and
    k = (m/n)·ln 2 clamped to [1, 16]."""
    if n_keys <= 0:
        raise ValueError(f"n_keys must be positive, got {n_keys}")
    if not 0.0 < fpp < 1.0:
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    m = -n_keys * np.log(fpp) / (np.log(2.0) ** 2)
    m_bits = 1 << max(6, int(np.ceil(np.log2(m))))
    k = int(round(m_bits / n_keys * np.log(2.0)))
    return m_bits, min(16, max(1, k))


def probe_positions(h: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """Flat DISTINCT bit positions the keys ``h`` map to under the
    (m_bits, k) geometry — without allocating a bitmap, so per-block build
    partials carry no per-call m_bits/8-byte buffer."""
    if h.size == 0:
        return np.empty(0, dtype=np.uint64)
    x = np.ascontiguousarray(h, dtype=np.int64).view(np.uint64)
    h1 = _splitmix64(x)
    h2 = _splitmix64(x ^ _SEED2) | _ONE
    mask = np.uint64(m_bits - 1)
    out = np.empty((k, x.size), dtype=np.uint64)
    for i in range(k):
        out[i] = (h1 + np.uint64(i) * h2) & mask
    return np.unique(out.ravel())


class BloomFilter:
    """Fixed-width Bloom filter over int64 hash keys, vectorized probes.

    ``words`` is the packed bitmap (m_bits/64 uint64 words); two filters
    with equal (m_bits, k) merge by OR."""

    def __init__(self, m_bits: int, k: int, words: np.ndarray | None = None):
        if m_bits < 64 or m_bits & (m_bits - 1):
            raise ValueError(f"m_bits must be a power of two >= 64, got {m_bits}")
        if not 1 <= k <= 16:
            raise ValueError(f"k must be in [1, 16], got {k}")
        self.m_bits = m_bits
        self.k = k
        if words is None:
            words = np.zeros(m_bits // 64, dtype=np.uint64)
        elif words.dtype != np.uint64 or words.size != m_bits // 64:
            raise ValueError("words must be uint64 of size m_bits/64")
        self.words = words

    @property
    def nbytes(self) -> int:
        return self.words.nbytes

    def _probes(self, h: np.ndarray) -> np.ndarray:
        """(k, n) uint64 bit positions for int64/uint64 key array ``h``."""
        x = np.ascontiguousarray(h, dtype=np.int64).view(np.uint64)
        h1 = _splitmix64(x)
        h2 = _splitmix64(x ^ _SEED2) | _ONE
        mask = np.uint64(self.m_bits - 1)
        out = np.empty((self.k, x.size), dtype=np.uint64)
        for i in range(self.k):
            out[i] = (h1 + np.uint64(i) * h2) & mask
        return out

    def positions(self, h: np.ndarray) -> np.ndarray:
        """Flat DISTINCT bit positions ``h`` would set (see module-level
        :func:`probe_positions` for the allocation-free form)."""
        return probe_positions(h, self.m_bits, self.k)

    def set_positions(self, pos: np.ndarray) -> None:
        p = np.ascontiguousarray(pos, dtype=np.uint64)
        np.bitwise_or.at(self.words, (p >> _SIX).astype(np.int64), _ONE << (p & _SIXTYTHREE))

    def add(self, h: np.ndarray) -> None:
        if h.size:
            self.set_positions(self._probes(h).ravel())

    def contains(self, h: np.ndarray) -> np.ndarray:
        """Boolean membership per key — True may be a false positive at the
        configured fpp; False is DEFINITIVE (never a false negative)."""
        if h.size == 0:
            return np.zeros(0, dtype=bool)
        probes = self._probes(h)
        out = np.ones(h.size, dtype=bool)
        for i in range(self.k):
            p = probes[i]
            out &= (self.words[(p >> _SIX).astype(np.int64)] >> (p & _SIXTYTHREE)) & _ONE == _ONE
        return out

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (other.m_bits, other.k) != (self.m_bits, self.k):
            raise ValueError("cannot merge Bloom filters with different (m_bits, k)")
        np.bitwise_or(self.words, other.words, out=self.words)
        return self

    def fill_ratio(self) -> float:
        """Fraction of set bits — sanity meter; effective fpp ≈ ratio^k."""
        return float(np.unpackbits(self.words.view(np.uint8)).mean())


def bloom_sparse_table(bf: BloomFilter) -> pa.Table:
    """Sparse (word_idx, word) rows of the non-zero bitmap words — the
    persistable sidecar form. Size follows the number of SET bits (≈ keys
    added), not the filter width, so a small increment's sidecar is small
    even under a store-capacity-sized filter."""
    idx = np.flatnonzero(bf.words)
    return pa.table(
        {
            "word_idx": pa.array(idx, pa.int64()),
            "word": pa.array(bf.words[idx], pa.uint64()),
        }
    )


def merge_sparse_into(bf: BloomFilter, table: pa.Table) -> BloomFilter:
    """OR a sparse sidecar table into ``bf`` (same (m_bits, k) geometry —
    the caller owns that contract via its persisted config)."""
    idx = table.column("word_idx").to_numpy(zero_copy_only=False)
    if idx.size and (idx.min() < 0 or idx.max() >= bf.words.size):
        raise ValueError(
            "sparse bloom sidecar word_idx out of range — geometry mismatch "
            "with the configured (m_bits, k)"
        )
    w = table.column("word").to_numpy(zero_copy_only=False).astype(np.uint64)
    np.bitwise_or.at(bf.words, idx.astype(np.int64), w)
    return bf


def bloom_from_keyed(ds, col: str, m_bits: int, k: int) -> BloomFilter:
    """Distributed Bloom build over an int64 hash column: each block emits
    its distinct probe positions (k × distinct keys uint64s, NOT an m-bit
    bitmap — partial size follows the data, not the filter width); the
    driver sets bits. Block-layout-invariant because the bit-OR of position
    sets is order-free."""

    def partial(t: pa.Table) -> pa.Table:
        h = t.column(col).to_numpy(zero_copy_only=False)
        pos = probe_positions(np.unique(h), m_bits, k)
        return pa.table({"pos": pa.array(pos, pa.uint64())})

    bf = BloomFilter(m_bits, k)
    # whole-block batches: the default batch_size=1024 splits a block into
    # thousands of tiny partial calls (measured 17 s → 2 s on a 1.6M-key
    # single-file store)
    for b in ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_format="pyarrow", batch_size=None):
        if b.num_rows:
            bf.set_positions(b.column("pos").to_numpy(zero_copy_only=False))
    return bf
