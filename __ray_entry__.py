"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (nor in the ertransfer_ray library) calls ``ray.init()``/
``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: three-stage ER (blocking → scoring → clustering)
    over the sf0.001 documents corpus; returns the cluster assignment."""
    from ertransfer_ray.pipelines.queries import q_er_documents

    return q_er_documents("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from ertransfer_ray.pipelines.queries import build_queries

    return build_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for EVERY queries() entry — including the
    flagship ``er_documents`` (score-graph + recursive-CTE connected
    components), ``ngram_jaccard_pairs`` (exploded-shingle set arithmetic),
    and the sketch/trained pipelines (``minhash_neardup_pairs`` /
    ``simhash_neardup_pairs`` / ``doc_quality_classifier`` /
    ``kmeans_embeddings`` / ``deepblocker_topk``) whose query fns persist
    their sketches / trained artifacts as parquet side-inputs so SQL
    re-derives the full decision arithmetic — see
    queries._write_oracle_side. Zero rows-only entries since round 5."""
    from ertransfer_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
