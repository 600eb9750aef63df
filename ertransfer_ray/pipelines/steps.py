"""SURVEY §2.10 user-extension surface: the reference's three-step container
contract as a ``PipelineStage`` protocol + registry + CLI.

The reference's plugin API is the container contract
(/root/reference/README.md:25-48): a *splitter* step takes
``(input_dir, output_dir, -r/-d)`` and turns the ``tableA/tableB/matches.csv``
bundle into ``train/valid/test.csv`` + copies + ``split_statistics.txt``
(splitters/KNN-Join/splitter.py:135-158, 190-207); a *matcher* step takes
``(input_dir, output_dir, -e, -pt, -t [dirs], -s)``, reads the 6-file bundle
and writes ``predictions_<ds>.csv`` + ``metrics_<ds>.csv``
(methods/emtransformer/entrypoint.py:19-46); a *clustering* step takes
``(predictions_file, [-d])`` and writes ``<ds>_clustering.txt``
(clustering/Probabilities/entrypoint.py:52-58). Every method there
reimplements the same ``transform_input``/``transform_output`` adapter pair
(methods/emtransformer/transform.py:29-113) — that pair IS the step
interface, and here it lives once per stage class.

A user "adding a matcher" registers a class with ``@register_stage`` whose
``run(input_path, output_dir, **options)`` honors the same file contract;
``python -m ertransfer_ray <stage> …`` resolves it by name.
"""

from __future__ import annotations

import json
import os
import time
from typing import Protocol, runtime_checkable

import numpy as np
import pandas as pd


@runtime_checkable
class PipelineStage(Protocol):
    """One step of the reference's three-step DAG: reads a file bundle from
    ``input_path``, writes the contract artifacts under ``output_dir``,
    returns a summary dict. Stages are plain classes registered by name."""

    name: str

    def run(self, input_path: str, output_dir: str | None = None, **options) -> dict:
        ...


_REGISTRY: dict[str, type] = {}


def register_stage(cls):
    """Class decorator: make a stage resolvable by ``cls.name``. Re-registering
    a name overrides it (user replaces a builtin step with their own)."""
    _REGISTRY[cls.name] = cls
    return cls


def get_stage(name: str) -> type:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown stage {name!r}; registered: {sorted(_REGISTRY)}"
        ) from None


def available_stages() -> list[str]:
    return sorted(_REGISTRY)


# ---------------------------------------------------------------------------
# shared adapters (the reference's transform_input/transform_output pair)
# ---------------------------------------------------------------------------

def _side_columns(df: pd.DataFrame, prefix: str) -> list[str]:
    """Attribute columns of one side of a wide pair row, reference order
    (methods/emtransformer/transform.py:12: columns carrying the prefix,
    minus the id)."""
    return [
        c for c in df.columns
        if c.startswith(prefix) and c != f"{prefix}id"
    ]


def _ag_value(df: pd.DataFrame, cols: list[str]) -> pd.Series:
    """M4 agValue over a wide pair row's side columns: fillna('') +
    str-join with spaces (transform.py:8-26 join_columns)."""
    if not cols:
        return pd.Series([""] * len(df), index=df.index)
    s = df[cols[0]].fillna("").astype(str)
    for c in cols[1:]:
        s = s.str.cat(df[c].fillna("").astype(str), sep=" ")
    return s.str.strip()


def pair_frame_from_bundle(df: pd.DataFrame) -> pd.DataFrame:
    """Wide pair rows (tableA_id, tableA_*, tableB_id, tableB_*, label) →
    the engine's scoring columns (left/right url+payload+title, label).
    The first attribute column doubles as the title (the reference's
    datasets lead with name/title, datasets/README.md:5-9)."""
    a_cols = _side_columns(df, "tableA_")
    b_cols = _side_columns(df, "tableB_")
    out = pd.DataFrame(
        {
            "left_url": df["tableA_id"].astype("int64"),
            "right_url": df["tableB_id"].astype("int64"),
            "left_payload": _ag_value(df, a_cols),
            "right_payload": _ag_value(df, b_cols),
            "left_title": df[a_cols[0]].fillna("").astype(str) if a_cols else "",
            "right_title": df[b_cols[0]].fillna("").astype(str) if b_cols else "",
        }
    )
    if "label" in df.columns:
        out["label"] = df["label"].astype("int64")
    return out


def _read_split_csv(path: str) -> pd.DataFrame:
    return pd.read_csv(path, encoding_errors="replace")


# ---------------------------------------------------------------------------
# normalize step (the reference's 4th container, run before the splitter)
# ---------------------------------------------------------------------------

@register_stage
class NormalizeStage:
    """Reference normanizer contract (splitters/random-split/
    normanizer.py:42-81): canonicalize a raw dataset directory into the
    ``tableA/tableB/matches.csv`` bundle — delimiter sniffing, per-dataset
    file renames, D1/D2 match-column renames, entity-id enforcement."""

    name = "normalize"

    def run(self, input_path: str, output_dir: str | None = None,
            **_options) -> dict:
        from ..sources.csv_normalize import normalize_dataset_dir

        renamed = normalize_dataset_dir(input_path, output_dir)
        return {"renamed": renamed, "output_dir": output_dir or input_path}


# ---------------------------------------------------------------------------
# merger step (splits → matches, the reference's random-split merger)
# ---------------------------------------------------------------------------

@register_stage
class MergerStage:
    """Reference merger contract (splitters/random-split/merger.py:17-38):
    concat train/test (+valid when present), keep label==1, project the id
    pair (renaming ``table1.id``/``table2.id`` when present), dedup, sort by
    tableA_id, write ``matches.csv``."""

    name = "merger"

    def run(self, input_path: str, output_dir: str | None = None,
            **_options) -> dict:
        output_dir = output_dir or input_path
        os.makedirs(output_dir, exist_ok=True)
        frames = []
        for split in ("test", "train", "valid"):
            p = os.path.join(input_path, f"{split}.csv")
            if os.path.exists(p):
                frames.append(_read_split_csv(p))
        if not frames:
            raise FileNotFoundError(f"{input_path}: no train/test/valid.csv")
        m = pd.concat(frames, ignore_index=True)
        m = m[m["label"] == 1]
        if "table1.id" in m.columns:
            m = m.rename(columns={"table1.id": "tableA_id",
                                  "table2.id": "tableB_id"})
        m = (
            m[["tableA_id", "tableB_id"]]
            .drop_duplicates()
            .sort_values("tableA_id", ignore_index=True)
        )
        m.to_csv(os.path.join(output_dir, "matches.csv"), index=False)
        return {"n_matches": len(m), "output_dir": output_dir}


# ---------------------------------------------------------------------------
# splitter step
# ---------------------------------------------------------------------------

@register_stage
class SplitterStage:
    """Reference splitter contract (splitters/KNN-Join/splitter.py:135-207):
    read ``tableA/tableB/matches.csv`` from ``input_path``, write
    ``train/valid/test.csv`` (wide pair rows with both payloads + label),
    passthrough copies of the three inputs, and ``split_statistics.txt``."""

    name = "splitter"

    def run(
        self,
        input_path: str,
        output_dir: str | None = None,
        *,
        recall: float = 0.90,
        default: bool = False,
        seed: int = 42,
        method: str = "knn",
        **overrides,
    ) -> dict:
        import ray.data as rd

        from ..sources.csv_normalize import read_entity_csv, read_matches_csv
        from .splitter import (
            attach_payloads,
            filter_valid_matches,
            run_splitter_for_dataset,
            write_split_statistics,
        )

        output_dir = output_dir or input_path
        os.makedirs(output_dir, exist_ok=True)
        a_df = read_entity_csv(os.path.join(input_path, "tableA.csv"))
        b_df = read_entity_csv(os.path.join(input_path, "tableB.csv"))
        matches_df = read_matches_csv(os.path.join(input_path, "matches.csv"))
        valid_matches = filter_valid_matches(
            matches_df, set(a_df["id"]), set(b_df["id"])
        )

        t0 = time.perf_counter()
        res = run_splitter_for_dataset(
            rd.from_pandas(a_df),
            rd.from_pandas(b_df),
            matches_df,
            input_path=input_path,
            recall=recall,
            default=default,
            seed=seed,
            method=method,
            **overrides,
        )
        wide = attach_payloads(res["splits"], a_df, b_df).to_pandas()
        blocking_time = time.perf_counter() - t0

        a_attr = [f"tableA_{c}" for c in a_df.columns if c != "id"]
        b_attr = [f"tableB_{c}" for c in b_df.columns if c != "id"]
        ordered = ["tableA_id"] + a_attr + ["tableB_id"] + b_attr + ["label"]
        for split in ("train", "valid", "test"):
            part = wide[wide["split"] == split][ordered]
            part = part.sort_values(
                ["tableA_id", "tableB_id"], ignore_index=True
            )
            part.to_csv(os.path.join(output_dir, f"{split}.csv"), index=False)
        # passthrough copies (splitter.py:190-196)
        if os.path.abspath(output_dir) != os.path.abspath(input_path):
            a_df.to_csv(os.path.join(output_dir, "tableA.csv"), index=False)
            b_df.to_csv(os.path.join(output_dir, "tableB.csv"), index=False)
            matches_df.to_csv(os.path.join(output_dir, "matches.csv"), index=False)
        write_split_statistics(
            os.path.join(output_dir, "split_statistics.txt"),
            len(a_df),
            len(b_df),
            len(valid_matches),
            blocking_time,
            res["stats"],
        )
        return {
            "blocking_recall": res["blocking_recall"],
            "settings": res.get("settings"),
            "output_dir": output_dir,
        }


# ---------------------------------------------------------------------------
# matcher step
# ---------------------------------------------------------------------------

@register_stage
class MatcherStage:
    """Reference matcher contract (methods/emtransformer/entrypoint.py:19-46
    + transform.py:29-113): read the 6-file bundle from ``input_path``,
    train on ``train.csv`` (deterministic logistic fit over the pair-feature
    kernel — the trainer seam where a torch loop plugs in), store/reuse
    ``model.json`` (S9, ``prev_trained``), score the home ``test.csv`` and
    every extra test bundle, write ``predictions_<ds>.csv``
    (tableA_id, tableB_id, label, prob_class1 — transform.py:76-79) and
    ``metrics_<ds>.csv`` (f1/precision/recall + stage times + train_size,
    transform.py:94-102)."""

    name = "matcher"

    def run(
        self,
        input_path: str,
        output_dir: str | None = None,
        *,
        test_dirs: tuple[str, ...] = (),
        epochs: int = 5,
        seed: int = 42,
        prev_trained: bool = False,
        input_train_full: str | None = None,
        weights_path: str | None = None,
        theta: float = 0.5,
        **_options,
    ) -> dict:
        from ..stages.scoring import (
            PairScorer,
            fit_logistic_weights,
            matcher_metrics,
        )

        output_dir = output_dir or os.path.join(input_path, "output")
        os.makedirs(output_dir, exist_ok=True)

        t0 = time.perf_counter()
        # -if v|vt folds valid (and test) into train
        # (methods/emtransformer/transform.py:35-41)
        splits = ["train"]
        if input_train_full in ("v", "vt"):
            splits.append("valid")
        if input_train_full == "vt":
            splits.append("test")
        train = pd.concat(
            [
                pair_frame_from_bundle(
                    _read_split_csv(os.path.join(input_path, f"{s}.csv"))
                )
                for s in splits
            ],
            ignore_index=True,
        )
        preprocess_time = time.perf_counter() - t0

        model_path = os.path.join(output_dir, "model.json")
        t0 = time.perf_counter()
        if weights_path is not None:
            # T9 weights-swap path: a stored matcher artifact replaces
            # training outright (DADER/Unicorn scorer shape)
            with open(weights_path) as f:
                weights = json.load(f)
            train_time = 0.0
        elif prev_trained and os.path.exists(model_path):
            with open(model_path) as f:
                weights = json.load(f)
            train_time = 0.0
        else:
            weights = fit_logistic_weights(train, epochs=epochs)
            train_time = time.perf_counter() - t0
        with open(model_path, "w") as f:
            json.dump(weights, f, sort_keys=True)

        scorer = PairScorer(weights=weights)
        summaries = {}
        targets = [(self._ds_name(input_path), input_path)] + [
            (self._ds_name(d), d) for d in test_dirs
        ]
        for ds_name, d in targets:
            t0 = time.perf_counter()
            test = pair_frame_from_bundle(
                _read_split_csv(os.path.join(d, "test.csv"))
            )
            scored = scorer(test)
            preds = pd.DataFrame(
                {
                    "tableA_id": test["left_url"],
                    "tableB_id": test["right_url"],
                    "label": test["label"],
                    "prob_class1": scored["prob"],
                }
            )
            eval_time = time.perf_counter() - t0
            preds.to_csv(
                os.path.join(output_dir, f"predictions_{ds_name}.csv"), index=False
            )
            truth_pos = {
                (a, b)
                for a, b, lab in zip(
                    test["left_url"], test["right_url"], test["label"]
                )
                if lab == 1
            }
            m = matcher_metrics(
                scored.assign(
                    left_url=test["left_url"], right_url=test["right_url"]
                ),
                truth_pos,
                theta=theta,
            )
            metrics = pd.DataFrame(
                [
                    {
                        "f1": m["f1"],
                        "precision": m["precision"],
                        "recall": m["recall"],
                        "preprocess_time": preprocess_time,
                        "train_time": train_time,
                        "eval_time": eval_time,
                        "train_size": len(train),
                    }
                ]
            )
            metrics.to_csv(
                os.path.join(output_dir, f"metrics_{ds_name}.csv"), index=False
            )
            summaries[ds_name] = m
        return {"metrics": summaries, "model_path": model_path,
                "output_dir": output_dir}

    @staticmethod
    def _ds_name(path: str) -> str:
        return os.path.basename(os.path.normpath(path))


# ---------------------------------------------------------------------------
# clustering step
# ---------------------------------------------------------------------------

@register_stage
class ClusteringStage:
    """Reference clustering contract (clustering/Probabilities/
    entrypoint.py:52-106): input is ONE ``predictions_<ds>.csv``; the output
    names derive from its stem; ``default`` applies θ=0.5, otherwise the
    10-run threshold grid search; writes ``<ds>_clustering.txt`` (+ the
    probability-histogram table)."""

    name = "clustering"

    def run(
        self,
        input_path: str,
        output_dir: str | None = None,
        *,
        default: bool = False,
        num_runs: int = 10,
        seed: int = 42,
        **_options,
    ) -> dict:
        from .tuning import write_clustering_report

        output_dir = output_dir or os.path.dirname(os.path.abspath(input_path))
        os.makedirs(output_dir, exist_ok=True)
        stem = os.path.splitext(os.path.basename(input_path))[0]
        ds_name = stem[len("predictions_"):] if stem.startswith("predictions_") else stem

        df = pd.read_csv(input_path, encoding_errors="replace")
        data = pd.DataFrame(
            {
                "left_url": df["tableA_id"],
                "right_url": df["tableB_id"],
                "prob": df["prob_class1"].astype(np.float64),
                "label": df["label"].astype("int64"),
            }
        )
        results = write_clustering_report(
            data, ds_name, output_dir, default=default,
            num_runs=num_runs, seed=seed,
        )
        return {"ds_name": ds_name, "results": results, "output_dir": output_dir}
