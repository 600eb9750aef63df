"""Deduplication stages for training-data pipelines.

Five dedup families, each a Dataset → Dataset stage over a text (or
embedding) column:

- exact          — content-hash → hash-partitioned keep-first (D1 family,
                   /root/reference/splitters/random-split/merger.py:34)
- minhash_lsh    — shingle → MinHash → band keys → groupby(band) candidate
                   pairs → Jaccard verify → connected components → keep one
                   per component (the web-scale near-dup pipeline)
- simhash        — 64-bit SimHash, bucket by rotated 16-bit prefixes,
                   verify by Hamming distance
- ngram_jaccard  — n-gram shingle Jaccard verification over LSH candidates
                   (exposed as the verifier of minhash_lsh; also standalone
                   for candidate pair lists)
- embedding near-dup — cosine ≥ τ over an embedding column via bucketed
                   brute-force (see knn.py for the ANN machinery)

All keep-first decisions are deterministic: the survivor is the smallest id
in the duplicate group.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import (
    hamming_distance64,
    lsh_band_keys,
    minhash_signatures,
    simhash64,
    stable_hash64,
)
from ..functions.simfuncs import jaccard, qgrams
from .clustering import connected_components
from .groupby import bucketed_group_apply, distinct_rows


def add_content_hash(ds, text_col: str = "text", out: str = "content_hash"):
    """Vectorized stable content hash column (int64)."""

    def fn(t: pa.Table) -> pa.Table:
        h = stable_hash64(t.column(text_col).to_pylist())
        return t.append_column(out, pa.array((h >> np.uint64(1)).astype(np.int64)))

    return ds.map_batches(fn, batch_format="pyarrow")


def exact_dedup(ds, id_col: str, text_col: str = "text"):
    """Exact dedup: hash-partition on content hash, keep smallest id.

    Returns the surviving rows (all columns). The groupby key is the 64-bit
    content hash, so the shuffle moves (hash, row) — at scale, project to
    (hash, id) first and semi-join survivors back if rows are wide.
    """
    hashed = add_content_hash(ds, text_col)
    kept = bucketed_group_apply(
        hashed,
        "content_hash",
        lambda df: df.sort_values(id_col).drop_duplicates("content_hash"),
    )
    return kept.drop_columns(["content_hash"])


def exact_dedup_summary(ds, id_col: str, text_col: str = "text"):
    """(keep_id, dup_count) per distinct content — the oracle-checkable
    projection of exact dedup (SQL: min(id), count(*) GROUP BY text)."""
    hashed = add_content_hash(ds, text_col)

    def summarize(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("content_hash", as_index=False, sort=False).agg(
            keep_id=(id_col, "min"), dup_count=(id_col, "size")
        )[["keep_id", "dup_count"]]

    return bucketed_group_apply(hashed, "content_hash", summarize)


class _ShingleMinHash:
    """Actor-pool stage: emit (band_key, id) rows for every document."""

    def __init__(self, id_col: str, text_col: str, num_perm: int, num_bands: int,
                 shingle_words: int = 3, seed: int = 7):
        from ..functions.hashing import minhash_coeffs

        self.id_col = id_col
        self.text_col = text_col
        self.num_perm = num_perm
        self.num_bands = num_bands
        self.shingle_words = shingle_words
        self.coeffs = minhash_coeffs(num_perm, seed)

    def _shingles(self, text: str) -> list[str]:
        ws = text.lower().split()
        k = self.shingle_words
        if len(ws) <= k:
            return [" ".join(ws)] if ws else []
        return [" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)]

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column(self.id_col).to_pylist()
        texts = t.column(self.text_col).to_pylist()
        sh = [self._shingles(x) for x in texts]
        sig = minhash_signatures(sh, self.num_perm, coeffs=self.coeffs)
        bands = lsh_band_keys(sig, self.num_bands)
        n = len(ids)
        return pa.table(
            {
                "band_key": pa.array(np.concatenate(bands), pa.string()),
                "doc_id": pa.array(ids * self.num_bands),
                "text": pa.array(texts * self.num_bands, pa.string()),
            }
        )


def minhash_lsh_dedup_pairs(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 128,
    num_bands: int = 16,
    shingle_words: int = 3,
    jaccard_threshold: float = 0.8,
    max_block_size: int = 128,
):
    """MinHash-LSH near-dup candidate pairs, Jaccard-verified.

    Pipeline: shingle → minhash → band keys → groupby(band_key) → per-group
    pair generation (capped) → n-gram Jaccard verify ≥ threshold → distinct
    pairs (left_id < right_id, with verified jaccard score).
    """
    from .scoring import default_pool_size

    keyed = ds.map_batches(
        _ShingleMinHash,
        fn_constructor_kwargs=dict(
            id_col=id_col, text_col=text_col, num_perm=num_perm,
            num_bands=num_bands, shingle_words=shingle_words,
        ),
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=(1, default_pool_size()),
    )

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df.duplicated("band_key", keep=False)]  # singletons can't pair
        frames = []
        for _, g in df.groupby("band_key", sort=False):
            g = g.drop_duplicates("doc_id").sort_values("doc_id").head(max_block_size)
            n = len(g)
            if n < 2:
                continue
            ids = g["doc_id"].to_numpy()
            texts = g["text"].tolist()
            shingle_sets = [
                set(qgrams(" ".join(t.lower().split()), 3)) if t else set() for t in texts
            ]
            ii, jj = np.triu_indices(n, k=1)
            jac = np.fromiter(
                (jaccard(shingle_sets[i], shingle_sets[j]) for i, j in zip(ii, jj)),
                dtype=np.float64,
                count=len(ii),
            )
            keep = jac >= jaccard_threshold
            frames.append(
                pd.DataFrame(
                    {"left_id": ids[ii[keep]], "right_id": ids[jj[keep]], "jaccard": jac[keep]}
                )
            )
        if not frames:
            return pd.DataFrame({"left_id": [], "right_id": [], "jaccard": []}).astype(
                {"left_id": "int64", "right_id": "int64", "jaccard": "float64"}
            )
        return pd.concat(frames, ignore_index=True)

    pairs = bucketed_group_apply(keyed, "band_key", pairs_in_bucket)
    return distinct_rows(pairs, ["left_id", "right_id"])


def minhash_lsh_dedup(ds, id_col: str = "doc_id", text_col: str = "text", **kwargs):
    """Full near-dup dedup: verified pairs → connected components →
    (doc_id, group_id) assignment where group_id = smallest doc id reachable.
    Docs without any near-dup are absent (implicitly their own group)."""
    pairs = minhash_lsh_dedup_pairs(ds, id_col, text_col, **kwargs)

    def as_urls(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "left_url": pa.compute.cast(t.column("left_id"), pa.string()),
                "right_url": pa.compute.cast(t.column("right_id"), pa.string()),
            }
        )

    cc = connected_components(pairs.map_batches(as_urls, batch_format="pyarrow"))

    def back_to_ids(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.compute.cast(t.column("url"), pa.int64()),
                "group_id": pa.compute.cast(t.column("cluster_id"), pa.int64()),
            }
        )

    return cc.map_batches(back_to_ids, batch_format="pyarrow")


def simhash_dedup_pairs(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    num_prefix_buckets: int = 4,
):
    """SimHash near-dup pairs: bucket on rotated 16-bit prefixes of the
    64-bit simhash (any pair within Hamming ≤ 3 shares at least one of the
    4 rotated prefixes exactly — pigeonhole), verify by Hamming distance."""

    def emit(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        texts = t.column(text_col).to_pylist()
        sh = simhash64([x.lower().split() for x in texts])
        buckets, out_ids, out_sh = [], [], []
        for b in range(num_prefix_buckets):
            chunk = ((sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
            buckets.extend([f"b{b}:{c}" for c in chunk])
            out_ids.extend(ids)
            out_sh.extend(sh.astype(np.int64).tolist())
        return pa.table(
            {
                "bucket": pa.array(buckets, pa.string()),
                "doc_id": pa.array(out_ids),
                "simhash": pa.array(out_sh, pa.int64()),
            }
        )

    keyed = ds.map_batches(emit, batch_format="pyarrow")

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df.duplicated("bucket", keep=False)]  # singletons can't pair
        frames = []
        for _, g in df.groupby("bucket", sort=False):
            g = g.drop_duplicates("doc_id").sort_values("doc_id")
            n = len(g)
            if n < 2:
                continue
            ids = g["doc_id"].to_numpy()
            sh = g["simhash"].to_numpy().astype(np.uint64)
            ii, jj = np.triu_indices(n, k=1)
            hd = hamming_distance64(sh[ii], sh[jj])
            keep = hd <= max_hamming
            frames.append(
                pd.DataFrame(
                    {"left_id": ids[ii[keep]], "right_id": ids[jj[keep]], "hamming": hd[keep]}
                )
            )
        if not frames:
            return pd.DataFrame({"left_id": [], "right_id": [], "hamming": []}).astype(
                {"left_id": "int64", "right_id": "int64", "hamming": "int64"}
            )
        return pd.concat(frames, ignore_index=True)

    pairs = bucketed_group_apply(keyed, "bucket", verify)
    return distinct_rows(pairs, ["left_id", "right_id"])


def embedding_neardup_pairs(
    ds,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cosine_threshold: float = 0.95,
    num_buckets: int = 8,
    seed: int = 5,
):
    """Embedding near-dup pairs via random-hyperplane LSH buckets +
    in-bucket brute-force cosine. A pair is emitted iff cosine ≥ threshold
    and the two vectors share a bucket (recall grows with bucket count
    via multiple projections; here 2 projections of log2(num_buckets) bits).
    """
    from ..functions.simfuncs import cosine_matrix

    # num_buckets=1 → 0 hyperplane bits → everything in one bucket (exact)
    bits = int(np.ceil(np.log2(num_buckets))) if num_buckets > 1 else 0
    n_proj = 2 if bits else 1

    def emit(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        vecs = np.asarray(t.column(vec_col).to_pylist(), dtype=np.float64)
        dim = vecs.shape[1] if len(vecs) else 1
        rng = np.random.default_rng(seed)
        out_b, out_i, out_v = [], [], []
        for p in range(n_proj):
            if bits:
                planes = rng.standard_normal((bits, dim))
                if len(vecs):
                    sig = (vecs @ planes.T > 0).astype(np.int64)
                    codes = (sig * (1 << np.arange(bits))).sum(axis=1)
                else:
                    codes = []
            else:
                codes = np.zeros(len(vecs), dtype=np.int64)
            out_b.extend([f"p{p}:{c}" for c in codes])
            out_i.extend(ids)
            out_v.extend(vecs.tolist())
        return pa.table(
            {
                "bucket": pa.array(out_b, pa.string()),
                "vec_id": pa.array(out_i),
                "vec": pa.array(out_v, pa.list_(pa.float64())),
            }
        )

    keyed = ds.map_batches(emit, batch_format="pyarrow")

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df.duplicated("bucket", keep=False)]  # singletons can't pair
        frames = []
        for _, g in df.groupby("bucket", sort=False):
            g = g.drop_duplicates("vec_id").sort_values("vec_id")
            n = len(g)
            if n < 2:
                continue
            ids = g["vec_id"].to_numpy()
            vecs = np.asarray(g["vec"].tolist(), dtype=np.float64)
            cm = cosine_matrix(vecs, vecs)
            ii, jj = np.triu_indices(n, k=1)
            cos = cm[ii, jj]
            keep = cos >= cosine_threshold
            frames.append(
                pd.DataFrame(
                    {"left_id": ids[ii[keep]], "right_id": ids[jj[keep]], "cosine": cos[keep]}
                )
            )
        if not frames:
            return pd.DataFrame({"left_id": [], "right_id": [], "cosine": []}).astype(
                {"left_id": "int64", "right_id": "int64", "cosine": "float64"}
            )
        return pd.concat(frames, ignore_index=True)

    pairs = bucketed_group_apply(keyed, "bucket", verify)
    return distinct_rows(pairs, ["left_id", "right_id"])
