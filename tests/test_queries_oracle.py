"""Value-level oracle guards for the pipelines whose driver check depends on
the engine's approximate stages being exact on the test corpora:

- er_documents: the SQL oracle is the score-graph connected components
  (semantic spec); the engine's MinHash-LSH blocking must achieve recall 1.0
  against that exact edge set on the synthetic corpora, else the driver's
  hash compare regresses. Asserted here at sf0.001 so a blocking change
  that loses recall fails in pytest, not in the driver.
- ngram_jaccard_pairs: exact inverted-index near-dup, value-parity with the
  exploded-shingle SQL.

Also asserts the id-only shuffle contract of the near-dup stages (the
blocking.py:85-91 rule): key rows carry ONLY (key, id) — no text/vectors.
"""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ertransfer_ray.pipelines.queries import ORACLE_SQL, build_queries
from ertransfer_ray.stages.dedup import (
    _ShingleMinHash,
    embedding_neardup_pairs,
    minhash_lsh_dedup_pairs,
    ngram_jaccard_pairs,
)

SF = "/root/testdata/sf0.001"

needs_testdata = pytest.mark.skipif(
    not os.path.exists(f"{SF}/documents.parquet"), reason="testdata absent"
)


def _oracle(name: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    return con.execute(ORACLE_SQL[name]).fetchdf()


@needs_testdata
def test_er_documents_matches_exact_score_graph_oracle():
    eng = build_queries()["er_documents"](SF).reset_index(drop=True)
    sql = _oracle("er_documents").reset_index(drop=True)
    assert len(eng) == len(sql)
    assert eng.equals(sql), "LSH blocking lost recall vs the exact edge set"


@needs_testdata
def test_ngram_jaccard_matches_sql_oracle():
    eng = build_queries()["ngram_jaccard_pairs"](SF).reset_index(drop=True)
    sql = _oracle("ngram_jaccard_pairs").reset_index(drop=True)
    assert len(eng) == len(sql)
    pd.testing.assert_frame_equal(eng, sql, check_dtype=False, atol=1e-9)


def _docs():
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = "the quick brown fox jumps over the lazy dog again and again yesterday"
    other = "completely different content about databases and distributed systems design"
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "text": pa.array(
                    [base, base, near, other, other + " extended"], pa.string()
                ),
            }
        )
    )


def test_minhash_key_shuffle_is_id_only():
    keyed = _docs().map_batches(
        _ShingleMinHash,
        fn_constructor_kwargs=dict(
            id_col="doc_id", text_col="text", num_perm=32, num_bands=8
        ),
        batch_format="pyarrow",
        concurrency=2,
    )
    assert set(keyed.schema().names) == {"band_key", "doc_id"}
    assert keyed.schema().types == [pa.int64(), pa.int64()]


def test_minhash_broadcast_and_join_strategies_agree():
    a = (
        minhash_lsh_dedup_pairs(_docs(), jaccard_threshold=0.4)
        .to_pandas()
        .sort_values(["left_id", "right_id"], ignore_index=True)
    )
    b = (
        minhash_lsh_dedup_pairs(_docs(), jaccard_threshold=0.4, strategy="join")
        .to_pandas()
        .sort_values(["left_id", "right_id"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        a[["left_id", "right_id", "jaccard"]], b[["left_id", "right_id", "jaccard"]]
    )


def test_ngram_broadcast_and_join_strategies_agree():
    from ertransfer_ray.stages.dedup import ngram_jaccard_pairs

    a = (
        ngram_jaccard_pairs(_docs(), jaccard_threshold=0.4)
        .to_pandas()
        .sort_values(["left_id", "right_id"], ignore_index=True)
    )
    b = (
        ngram_jaccard_pairs(_docs(), jaccard_threshold=0.4, strategy="join")
        .to_pandas()
        .sort_values(["left_id", "right_id"], ignore_index=True)
    )
    b["left_id"] = b["left_id"].astype(a["left_id"].dtype)
    b["right_id"] = b["right_id"].astype(a["right_id"].dtype)
    pd.testing.assert_frame_equal(
        a[["left_id", "right_id", "jaccard"]], b[["left_id", "right_id", "jaccard"]]
    )


def _emb(n=40, dim=8, seed=3):
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n // 2, dim))
    near = base + 0.01 * rng.standard_normal((n // 2, dim))
    vecs = np.concatenate([base, near])
    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64())),
            }
        )
    )


def test_embedding_neardup_strategies_agree():
    a = (
        embedding_neardup_pairs(_emb(), cosine_threshold=0.99, num_buckets=4)
        .to_pandas()
        .sort_values(["left_id", "right_id"], ignore_index=True)
    )
    b = (
        embedding_neardup_pairs(
            _emb(), cosine_threshold=0.99, num_buckets=4, strategy="join"
        )
        .to_pandas()
        .sort_values(["left_id", "right_id"], ignore_index=True)
    )
    assert len(a) >= 1
    pd.testing.assert_frame_equal(
        a[["left_id", "right_id"]], b[["left_id", "right_id"]]
    )
    np.testing.assert_allclose(a["cosine"], b["cosine"], atol=1e-12)


@needs_testdata
def test_simhash_pigeonhole_exhaustive_at_hamming3():
    """At max_hamming=3 the 4 rotated 16-bit prefixes guarantee every
    qualifying pair shares a bucket (3 flipped bits can touch at most 3 of
    the 4 chunks), so the stage's output must equal brute-force all-pairs
    Hamming ≤ 3 — the value-level check for a sketch SQL can't compute."""
    import pyarrow.parquet as pq

    from ertransfer_ray.functions.hashing import hamming_distance64, simhash64
    from ertransfer_ray.stages.dedup import simhash_dedup_pairs

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ids = np.asarray(t.column("doc_id").to_pylist())
    sh = simhash64([x.lower().split() for x in t.column("text").to_pylist()])
    ii, jj = np.triu_indices(len(ids), k=1)
    hd = hamming_distance64(sh[ii], sh[jj])
    keep = hd <= 3
    order = np.lexsort((ids[jj[keep]], ids[ii[keep]]))
    brute = pd.DataFrame(
        {
            "left_id": ids[ii[keep]][order],
            "right_id": ids[jj[keep]][order],
            "hamming": hd[keep][order].astype("int64"),
        }
    )
    eng = (
        simhash_dedup_pairs(rd.from_arrow(t), max_hamming=3)
        .to_pandas()
        .sort_values(["left_id", "right_id"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(eng, brute, check_dtype=False)


def test_ngram_jaccard_basic():
    out = ngram_jaccard_pairs(_docs(), jaccard_threshold=0.4).to_pandas()
    got = set(zip(out["left_id"], out["right_id"]))
    assert (1, 2) in got and (1, 3) in got and (2, 3) in got
    assert (4, 5) in got  # shared prefix → high char-3-gram overlap
    assert not any({a, b} == {1, 4} for a, b in got)
    # exact dup pair has jaccard exactly 1.0
    assert float(out[(out.left_id == 1) & (out.right_id == 2)]["jaccard"].iloc[0]) == 1.0
