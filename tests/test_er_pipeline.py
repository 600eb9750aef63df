"""End-to-end conformance: the BASELINE.json headline metric —
pairwise F1 ≥ 0.99 on labeled pairs of the synthetic corpus."""

import pandas as pd
import ray.data as rd

from ertransfer_ray.pipelines.er_pipeline import ERConfig, run_er
from ertransfer_ray.pipelines.metrics import clustering_f1, pairwise_f1, prf1, split_stats


def test_metric_formula_parity():
    # A2 with guard
    assert prf1(0, 0, 5) == {"precision": 0.0, "recall": 0.0, "f1": 0.0}
    m = prf1(3, 4, 6)
    assert abs(m["f1"] - 2 * 0.75 * 0.5 / 1.25) < 1e-12
    # A3: 2·TP/(candidates+GT)
    assert clustering_f1(3, 4, 6) == 0.6
    assert clustering_f1(0, 0, 0) == 0.0
    # A1
    s = split_stats(10, 4, 8)
    assert s == {"num_entries": 10, "num_matches": 4, "precision": 0.4, "recall": 0.5}


def test_end_to_end_pairwise_f1(pages_corpus):
    pages = rd.from_arrow(pages_corpus["pages"])
    res = run_er(pages, ERConfig())
    assign = res["clusters"].to_pandas()
    truth = pages_corpus["truth_pairs"].to_pandas()
    m = pairwise_f1(assign, truth)
    assert m["f1"] >= 0.99, m

    # every url must be assignable (singletons simply absent from edges →
    # treated as their own cluster by pairwise_f1's None handling)
    urls = set(pages_corpus["pages"].column("url").to_pylist())
    assert set(assign["url"]).issubset(urls)


def test_pairwise_f1_hard_corpus():
    """The ≥0.99 criterion on a MUCH harder corpus than the shared fixture:
    6.7× the entities, 0.45 perturbation strength (vs 0.35 — more token
    drops/swaps/case noise/typos per duplicate). Default ERConfig, no
    tuning. Measured 0.9995 here (and 0.9997 at 2000 entities/0.40) —
    the bar holds with margin off the fixture's operating point."""
    from ertransfer_ray.sources.pages import generate_pages

    tabs = generate_pages(
        num_entities=800, max_dups=5, seed=101, perturb_strength=0.45
    )
    res = run_er(rd.from_arrow(tabs["pages"]), ERConfig())
    m = pairwise_f1(res["clusters"].to_pandas(), tabs["truth_pairs"].to_pandas())
    assert m["f1"] >= 0.99, m


def test_pipeline_outputs_are_lazy_datasets(pages_corpus):
    pages = rd.from_arrow(pages_corpus["pages"])
    res = run_er(pages, ERConfig())
    assert set(res) == {"normalized", "pairs", "predictions", "clusters"}
    schema = res["predictions"].schema()
    assert set(schema.names) == {"left_url", "right_url", "prob"}


def test_flagship_identical_under_64_and_128_bit_cc_keys(pages_corpus):
    """ERConfig.cc_key_bits threads through run_er: the flagship's cluster
    assignment is byte-identical whether CC runs on 64-bit or 128-bit hashed
    node keys (cc_driver_threshold=0 forces the DISTRIBUTED path both times —
    the driver union-find would never consult key_bits)."""
    pages = rd.from_arrow(pages_corpus["pages"])
    outs = {}
    for bits in (64, 128):
        res = run_er(pages, ERConfig(cc_driver_threshold=0, cc_key_bits=bits))
        outs[bits] = (
            res["clusters"].to_pandas()
            .sort_values(["url", "cluster_id"], ignore_index=True)
        )
    pd.testing.assert_frame_equal(outs[64], outs[128])


def test_run_er_empty_corpus(ray_session):
    """Round 5: an empty corpus returns typed empty stage outputs instead
    of a schema-less KeyError inside attach_pair_payloads."""
    import pyarrow as pa
    import ray.data as rd

    from ertransfer_ray.pipelines.er_pipeline import ERConfig, run_er

    empty = rd.from_arrow(
        pa.table(
            {
                "url": pa.array([], pa.string()),
                "norm_text": pa.array([], pa.string()),
                "norm_title": pa.array([], pa.string()),
            }
        )
    )
    res = run_er(empty, ERConfig(sn_prefix=0), normalized=True)
    assert res["clusters"].count() == 0
    assert res["pairs"].count() == 0

    # the hand-written empty schemas must track the REAL stage outputs —
    # compare against a tiny non-empty run so a stage schema change can't
    # silently diverge the empty arm
    tiny = rd.from_arrow(
        pa.table(
            {
                "url": pa.array([f"u{i}" for i in range(4)], pa.string()),
                "norm_text": pa.array(
                    ["alpha beta gamma delta"] * 2 + ["zz yy xx ww"] * 2,
                    pa.string(),
                ),
                "norm_title": pa.array(["t"] * 4, pa.string()),
            }
        )
    )
    full = run_er(tiny, ERConfig(sn_prefix=0), normalized=True)
    for stage in ("pairs", "predictions", "clusters"):
        assert set(res[stage].schema().names) == set(full[stage].schema().names), stage
