"""Deterministic synthetic Common-Crawl-style web-page corpus (FIXTURES.md F1).

Shape follows BASELINE.json.input_hint exactly:
``(url: string, warc_ts: timestamp[us], html: binary, text: string, lang: string)``
plus sidecar truth tables:

- ``truth_clusters(url, entity_id)`` — oracle cluster assignment
- ``truth_pairs(left_url, right_url, label)`` — labeled within-block pairs,
  the pairwise-F1 ≥ 0.99 evaluation set (BASELINE.json.metric)

Every value is a pure function of ``(seed, entity index, dup index)`` — no
wall clock, no process state — so the same corpus regenerates identically at
any parallelism level.

Generation model (mirrors the reference's dirty-ER datasets, e.g.
/root/reference/datasets/d2_abt_buy: records = title-ish name + attribute
text, duplicates = perturbed copies): E entities, each expanded to 1..max_dups
near-duplicate pages with controlled perturbations (token drop, token swap,
case noise, typo) — strong enough to be realistic, weak enough that a tuned
blocking + scoring pipeline recovers clusters at pairwise F1 ≥ 0.99.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_ADJ = """quick bright silent golden rustic modern vintage compact deluxe hybrid
    turbo classic nimble sturdy sleek portable wireless digital analog quantum
    solar lunar arctic tropical urban rural coastal alpine velvet crimson""".split()
_NOUN = """widget gadget sprocket module panel sensor router beacon filter
    amplifier battery charger adapter bracket spindle gasket valve rotor
    stator flange coupler manifold actuator solenoid dynamo turbine""".split()
_WORDS = """premium edition series model review specs details overview guide
    manual release update version official store shop catalog listing product
    features performance quality design build warranty shipping price offer
    discount bundle kit pack set pro max mini ultra plus lite standard""".split()
_LANGS = ["en", "en", "en", "en", "en", "en", "en", "en", "de", "fr"]
_EPOCH_US = 1_500_000_000 * 1_000_000  # 2017-07-14, fixed


def _entity_phrase(rng: np.random.Generator) -> tuple[str, str]:
    """(title, body) for one ground-truth entity."""
    title = " ".join(
        [
            str(rng.choice(_ADJ)),
            str(rng.choice(_NOUN)),
            str(rng.integers(100, 9999)),
        ]
    )
    body_words = rng.choice(_WORDS, size=int(rng.integers(12, 28)), replace=True)
    return title, " ".join(body_words.tolist())


def _perturb(words: list[str], rng: np.random.Generator, strength: float) -> list[str]:
    out = list(words)
    n = len(out)
    # token drop
    if n > 4 and rng.random() < strength:
        del out[int(rng.integers(1, n))]
    # adjacent swap
    if len(out) > 3 and rng.random() < strength:
        i = int(rng.integers(1, len(out) - 1))
        out[i], out[i + 1] = out[i + 1], out[i]
    # case noise
    if rng.random() < strength:
        i = int(rng.integers(0, len(out)))
        out[i] = out[i].upper()
    # typo: duplicate a char
    if rng.random() < strength * 0.7:
        i = int(rng.integers(0, len(out)))
        w = out[i]
        if len(w) > 3:
            j = int(rng.integers(1, len(w) - 1))
            out[i] = w[:j] + w[j] + w[j:]
    return out


def generate_pages(
    num_entities: int = 200,
    max_dups: int = 4,
    seed: int = 42,
    perturb_strength: float = 0.35,
) -> dict[str, pa.Table]:
    """Build the corpus. Returns ``{"pages": …, "truth_clusters": …, "truth_pairs": …}``.

    ``html`` wraps ``text`` in a fixed template; the engine's extractor must
    invert it byte-identically (input_hint invariant, tested in
    tests/test_pages.py).
    """
    rng = np.random.default_rng(seed)
    urls: list[str] = []
    ts: list[int] = []
    htmls: list[bytes] = []
    texts: list[str] = []
    langs: list[str] = []
    entity_ids: list[int] = []

    for e in range(num_entities):
        title, body = _entity_phrase(rng)
        n_dups = int(rng.integers(1, max_dups + 1))
        for d in range(n_dups):
            if d == 0:
                t_words = title.split()
                b_words = body.split()
            else:
                t_words = _perturb(title.split(), rng, perturb_strength * 0.6)
                b_words = _perturb(body.split(), rng, perturb_strength)
            page_title = " ".join(t_words)
            page_text = page_title + "\n" + " ".join(b_words)
            url = f"https://site{e % 37}.example/e{e}/p{d}"
            html = (
                f"<html><head><title>{page_title}</title></head>"
                f"<body>\n{page_text}\n</body></html>"
            ).encode("utf-8")
            urls.append(url)
            ts.append(_EPOCH_US + (e * 16 + d) * 60_000_000)
            htmls.append(html)
            texts.append(page_text)
            langs.append(_LANGS[int(rng.integers(0, len(_LANGS)))])
            entity_ids.append(e)

    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )
    truth_clusters = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "entity_id": pa.array(entity_ids, pa.int64()),
        }
    )

    # Labeled pairs: all positive pairs (same entity) + hard negatives sampled
    # from entities sharing a leading title token (≈ same blocking key).
    lefts, rights, labels = [], [], []
    by_entity: dict[int, list[int]] = {}
    for i, e in enumerate(entity_ids):
        by_entity.setdefault(e, []).append(i)
    for e, idxs in by_entity.items():
        for i in range(len(idxs)):
            for j in range(i + 1, len(idxs)):
                a, b = urls[idxs[i]], urls[idxs[j]]
                lo, hi = (a, b) if a < b else (b, a)
                lefts.append(lo)
                rights.append(hi)
                labels.append(1)
    # negatives: pages of different entities with the same first title token
    first_tok: dict[str, list[int]] = {}
    for i, t in enumerate(texts):
        tok = t.split(" ", 1)[0].lower()
        first_tok.setdefault(tok, []).append(i)
    neg_rng = np.random.default_rng(seed + 1)
    for tok, idxs in first_tok.items():
        if len(idxs) < 2:
            continue
        for _ in range(min(len(idxs) * 2, 50)):
            i, j = neg_rng.choice(idxs, size=2, replace=False)
            if entity_ids[i] == entity_ids[j]:
                continue
            a, b = urls[i], urls[j]
            lo, hi = (a, b) if a < b else (b, a)
            lefts.append(lo)
            rights.append(hi)
            labels.append(0)
    truth_pairs = (
        pa.table(
            {
                "left_url": pa.array(lefts, pa.string()),
                "right_url": pa.array(rights, pa.string()),
                "label": pa.array(labels, pa.int32()),
            }
        )
        .group_by(["left_url", "right_url"])
        .aggregate([("label", "max")])
        .rename_columns(["left_url", "right_url", "label"])
    )
    return {"pages": pages, "truth_clusters": truth_clusters, "truth_pairs": truth_pairs}


def write_pages_corpus(out_dir: str, **kwargs) -> dict[str, str]:
    """Write the corpus as parquet; returns table → path."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    tables = generate_pages(**kwargs)
    paths = {}
    for name, tbl in tables.items():
        p = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(tbl, p)
        paths[name] = p
    return paths


def documents_as_pages(sf_dir: str, path: str | None = None):
    """Adapt a documents-shaped parquet (doc_id,text,…) to the pages
    pipeline shape: url := doc-<id>, norm fields derived from text.
    Used by bench.py to run the ER pipeline over the bulk-text corpus;
    ``path`` overrides the default ``{sf_dir}/documents.parquet`` (e.g. the
    expanded scaling corpus).
    """
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    # single-file inputs arrive as ONE block; split so downstream per-batch
    # kernels (minhash, scoring) parallelize across the whole cluster.
    # FIXED count (not CPU-derived): both scaling legs then execute the
    # identical plan, and 64 tasks load-balance the compute-dense minhash
    # stage far better than one-block-per-core at high CPU counts
    ds = rd.read_parquet(
        path or f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        override_num_blocks=64,
    )

    def to_pages(batch: pa.Table) -> pa.Table:
        # fully vectorized normalization: lowercase → non-word runs to one
        # space → trim. Matches " ".join(tokenize(t)) for \w+ tokenization.
        text = batch.column("text")
        lower = pc.utf8_lower(text)
        norm = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(lower, r"[^\w]+", " ")
        )
        title = pc.utf8_slice_codeunits(norm, 0, 80)
        url = pc.binary_join_element_wise(
            "doc-", pc.cast(batch.column("doc_id"), pa.string()), ""
        )
        # no raw `text` passthrough: the ER stages consume only the norm
        # columns, and the raw bytes would double the materialized
        # normalized table (and its plasma traffic) for nothing
        return pa.table({"url": url, "norm_text": norm, "norm_title": title})

    return ds.map_batches(to_pages, batch_format="pyarrow")
