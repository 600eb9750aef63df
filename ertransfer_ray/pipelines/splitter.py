"""Reference-shaped splitter workflow: two entity tables + golden matches →
labeled candidate-pair splits (train/valid/test) with blocking statistics.

This is the Ray-Data re-expression of the reference's splitter step
(/root/reference/splitters/KNN-Join/splitter.py __main__, traced in
SURVEY §3.1): its container contract reads ``tableA/tableB/matches`` and
writes ``train/valid/test`` + ``split_statistics`` (§2.10).

Stage map (reference → here):
- read + id-index (S1, splitter.py:160-165)       → read_parquet/read_csv, id kept as column
- match-validity filter (M10, :167-170)           → broadcast semi-join on both id sets
- string coercion + clean (M1/M3, :28-43)         → coerce_strings + clean_text map_batches
- agValue serialization (M4, :45-52)              → ag_value over non-id columns
- Top-K similarity join (J1, :72-86)              → MinHash-LSH band keys + bucketed
                                                     per-block top-K by set-cosine (the
                                                     reference's default metric,
                                                     settings.py / :179-181)
- golden-set labeling (J5/M12, :88-91)            → broadcast membership per batch
- stratified 60/20/20 split (A6, :112-132)        → deterministic hash-of-pair-key split
                                                     (reference uses seeded shuffle; hash
                                                     keying keeps outputs identical at any
                                                     parallelism — SURVEY §7.4)
- split statistics (A1/S4, :105-110,198-207)      → split_stats per split

Pair rows carry both records' ids plus the blocking score; payload columns
are re-attached only on request (J3) — the reference's full-payload wide
rows (splitter.py:96-103) don't scale (SURVEY §7.4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..functions.hashing import lsh_band_keys, minhash_coeffs, minhash_signatures, stable_hash64
from ..functions.simfuncs import cosine_set, qgrams
from ..functions.textnorm import ag_value, clean_text, coerce_strings
from ..stages.groupby import bucketed_group_apply
from ..stages.joins import BroadcastHashJoin, put_broadcast


def prepare_entity_table(ds, id_col: str = "id", clean: bool = True):
    """M1+M2 (+M3) + M4: coerce to strings, optionally clean, build agValue.
    Output: (id, agValue)."""

    def fn(t: pa.Table) -> pa.Table:
        t = coerce_strings(t, id_cols=(id_col,))
        attr_cols = [c for c in t.column_names if c != id_col]
        t = ag_value(t, attr_cols)
        ag = t.column("agValue")
        if clean:
            ag = pa.array([clean_text(v) for v in ag.to_pylist()], pa.string())
        return pa.table({id_col: t.column(id_col), "agValue": ag})

    return ds.map_batches(fn, batch_format="pyarrow")


def filter_valid_matches(matches_df: pd.DataFrame, a_ids: set, b_ids: set) -> pd.DataFrame:
    """M10: drop match rows whose ids are absent from either table
    (reference splitter.py:167-170)."""
    return matches_df[
        matches_df["tableA_id"].isin(a_ids) & matches_df["tableB_id"].isin(b_ids)
    ].reset_index(drop=True)


class _SideKeyEmitter:
    """Emit (band_key, side, id, agValue) rows for one side of the join."""

    def __init__(self, side: int, num_perm: int, num_bands: int, qgram: int, seed: int):
        self.side = side
        self.num_perm = num_perm
        self.num_bands = num_bands
        self.qgram = qgram
        self.coeffs = minhash_coeffs(num_perm, seed)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("id").to_pylist()
        ags = t.column("agValue").to_pylist()
        toks = [qgrams(a, self.qgram) if self.qgram else a.split() for a in ags]
        sig = minhash_signatures(toks, self.num_perm, coeffs=self.coeffs)
        bands = lsh_band_keys(sig, self.num_bands)
        reps = self.num_bands
        return pa.table(
            {
                "block_key": pa.array(np.concatenate(bands), pa.string()),
                "side": pa.array(np.full(len(ids) * reps, self.side, dtype=np.int8)),
                "id": pa.array(ids * reps, pa.int64()),
                "agValue": pa.array(ags * reps, pa.string()),
            }
        )


def topk_similarity_join(
    table_a,
    table_b,
    k: int = 5,
    num_perm: int = 64,
    num_bands: int = 16,
    qgram: int = 5,
    seed: int = 7,
    max_block_side: int = 256,
):
    """J1: approximate Top-K similarity join of B-records per A-record.

    Reference semantics (pyjedai TopKJoin, splitter.py:72-86): tokenize both
    tables' agValues (char-5-gram default), score set-cosine, keep the K most
    similar B records per A record. Here the token index becomes a shuffle:
    band keys co-locate likely-similar A/B rows, each bucket scores its
    A×B block exactly, and a final per-A top-K pass merges across buckets.

    Output: (tableA_id, tableB_id, score).
    """
    ka = table_a.map_batches(
        _SideKeyEmitter, fn_constructor_kwargs=dict(
            side=0, num_perm=num_perm, num_bands=num_bands, qgram=qgram, seed=seed),
        batch_format="pyarrow", batch_size=2048, concurrency=2,
    )
    kb = table_b.map_batches(
        _SideKeyEmitter, fn_constructor_kwargs=dict(
            side=1, num_perm=num_perm, num_bands=num_bands, qgram=qgram, seed=seed),
        batch_format="pyarrow", batch_size=2048, concurrency=2,
    )

    def score_block(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _, g in df.groupby("block_key", sort=False):
            a = g[g["side"] == 0].drop_duplicates("id").head(max_block_side)
            b = g[g["side"] == 1].drop_duplicates("id").head(max_block_side)
            if a.empty or b.empty:
                continue
            a_sets = [frozenset(qgrams(v, qgram)) for v in a["agValue"]]
            b_sets = [frozenset(qgrams(v, qgram)) for v in b["agValue"]]
            rows_a, rows_b, scores = [], [], []
            for i, (aid, sa) in enumerate(zip(a["id"].to_numpy(), a_sets)):
                for j, (bid, sb) in enumerate(zip(b["id"].to_numpy(), b_sets)):
                    rows_a.append(aid)
                    rows_b.append(bid)
                    scores.append(cosine_set(sa, sb))
            frames.append(
                pd.DataFrame({"tableA_id": rows_a, "tableB_id": rows_b, "score": scores})
            )
        if not frames:
            return pd.DataFrame(
                {"tableA_id": pd.Series([], dtype="int64"),
                 "tableB_id": pd.Series([], dtype="int64"),
                 "score": pd.Series([], dtype="float64")}
            )
        out = pd.concat(frames, ignore_index=True)
        # per-bucket dedup before the cross-bucket shuffle
        return out.sort_values("score", ascending=False).drop_duplicates(
            ["tableA_id", "tableB_id"]
        )

    scored = bucketed_group_apply(ka.union(kb), "block_key", score_block)

    def topk_per_a(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["score", "tableB_id"], ascending=[False, True])
        df = df.drop_duplicates(["tableA_id", "tableB_id"])
        return df.groupby("tableA_id", sort=False).head(k)

    return bucketed_group_apply(scored, "tableA_id", topk_per_a)


def label_pairs(pairs_ds, matches_df: pd.DataFrame):
    """J5/M12: label = (tableA_id, tableB_id) ∈ golden set, int32."""
    golden = set(zip(matches_df["tableA_id"], matches_df["tableB_id"]))
    ref = put_broadcast(golden)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        g = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        df = df.copy(deep=False)
        df["label"] = [
            np.int32((a, b) in g) for a, b in zip(df["tableA_id"], df["tableB_id"])
        ]
        return df

    return pairs_ds.map_batches(fn, batch_format="pandas")


def stratified_split(
    labeled_pairs_ds,
    fractions: tuple[float, float, float] = (0.6, 0.2, 0.2),
    seed: int = 42,
):
    """A6: deterministic stratified 60/20/20 split.

    Reference uses seeded shuffled ``train_test_split`` (splitter.py:112-132);
    here split membership is a pure function of hash(pair_key, seed) computed
    independently per label stratum, so outputs are identical at any
    parallelism level (SURVEY §7.4 determinism requirement).
    """
    lo = fractions[0]
    hi = fractions[0] + fractions[1]

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        key = (
            df["tableA_id"].astype(str) + "|" + df["tableB_id"].astype(str) + f"|{seed}"
        ).to_numpy(dtype=object)
        u = stable_hash64(key).astype(np.float64) / float(2**64)
        df = df.copy(deep=False)
        df["split"] = np.where(u < lo, "train", np.where(u < hi, "valid", "test"))
        return df

    return labeled_pairs_ds.map_batches(assign, batch_format="pandas")


def split_statistics(split_ds, n_matches: int) -> pd.DataFrame:
    """A1/S4: per-split entries / matches / precision / recall
    (reference splitter.py:105-110, written at :198-207)."""
    from ..stages.groupby import partial_aggregate
    from .metrics import split_stats

    agg = partial_aggregate(
        split_ds, "split", {"n": (None, "count"), "pos": ("label", "sum")}
    )
    rows = []
    for r in agg.itertuples(index=False):
        s = split_stats(int(r.n), int(r.pos), n_matches)
        rows.append({"split": r.split, **s})
    return pd.DataFrame(rows).sort_values("split", ignore_index=True)


def attach_payloads(pairs_ds, table_a_df: pd.DataFrame, table_b_df: pd.DataFrame):
    """J3: re-attach full records to id-only pair rows via broadcast lookup,
    producing the reference's wide pair row (tableA_*, tableB_*, label).
    Only for bounded outputs — the contract view, not the internal format."""
    a = table_a_df.add_prefix("tableA_").rename(columns={"tableA_id": "tableA_id"})
    b = table_b_df.add_prefix("tableB_").rename(columns={"tableB_id": "tableB_id"})
    ra, rb = put_broadcast(a), put_broadcast(b)
    stage_a = BroadcastHashJoin(ra, on="tableA_id", how="left")
    stage_b = BroadcastHashJoin(rb, on="tableB_id", how="left")
    return pairs_ds.map_batches(stage_a, batch_format="pandas").map_batches(
        stage_b, batch_format="pandas"
    )


def run_splitter(
    table_a,
    table_b,
    matches_df: pd.DataFrame,
    k: int = 5,
    clean: bool = True,
    seed: int = 42,
    **join_kwargs,
) -> dict:
    """The full splitter step. Returns dict with lazy Datasets + stats:
    ``{"pairs", "splits", "stats", "blocking_recall"}``."""
    a_prep = prepare_entity_table(table_a, clean=clean).materialize()
    b_prep = prepare_entity_table(table_b, clean=clean).materialize()
    a_ids = {r["id"] for r in a_prep.select_columns(["id"]).take_all()}
    b_ids = {r["id"] for r in b_prep.select_columns(["id"]).take_all()}
    matches_df = filter_valid_matches(matches_df, a_ids, b_ids)

    pairs = topk_similarity_join(a_prep, b_prep, k=k, **join_kwargs)
    labeled = label_pairs(pairs, matches_df).materialize()

    n_pos = sum(
        r["label"] for r in labeled.select_columns(["label"]).take_all()
    )
    blocking_recall = n_pos / len(matches_df) if len(matches_df) else 1.0

    splits = stratified_split(labeled, seed=seed)
    stats = split_statistics(splits, n_matches=len(matches_df))
    return {
        "pairs": labeled,
        "splits": splits,
        "stats": stats,
        "blocking_recall": blocking_recall,
    }


def merge_splits_to_matches(splits_ds) -> pd.DataFrame:
    """D2 merger: union splits → label==1 → project id pair → dedup → sort
    (reference splitters/random-split/merger.py:27-38)."""
    pos = splits_ds.map_batches(
        lambda df: df[df["label"] == 1][["tableA_id", "tableB_id"]],
        batch_format="pandas",
    )
    out = pos.to_pandas().drop_duplicates().sort_values(
        ["tableA_id", "tableB_id"], ignore_index=True
    )
    return out
