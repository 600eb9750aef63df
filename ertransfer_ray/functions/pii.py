"""PII detection + redaction over web text (RefinedWeb/Dolma-style scrub).

The published web-corpus recipes (RefinedWeb §3.4, Dolma's pii tagger)
mask emails, phone numbers and IP addresses with typed placeholder
tokens before training. This module implements that scrub as a pure
Arrow stage: the patterns are RE2-compatible and executed by Arrow's
C++ regex kernels (``pc.replace_substring_regex`` /
``pc.count_substring_regex``), which embed the SAME RE2 engine as
DuckDB's ``regexp_*`` functions — so the scrub is byte-reproducible by
the SQL oracle (verified in tests) and there is no Python-level row
loop anywhere.

Scale: stateless map over zero-copy Arrow batches — no shuffle, no
state, linear in corpus bytes; the regex programs are compiled once per
kernel invocation inside Arrow. The reference has no PII stage; this
is part of the beyond-reference LLM-data-pipeline surface.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

#: (name, RE2 pattern, replacement) — applied IN THIS ORDER, each pattern
#: scanning the output of the previous replacement (an email is consumed
#: before its digit runs could feed the phone pattern; IPv4 runs last so a
#: phone-shaped dotted quad is claimed by the more specific phone rule).
PII_PATTERNS: list[tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "phone",
        r"(?:\+?1[-. ]?)?(?:\([0-9]{3}\)|[0-9]{3})[-. ][0-9]{3}[-. ]?[0-9]{4}",
        "<PHONE>",
    ),
    (
        "ipv4",
        r"\b(?:(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\.){3}"
        r"(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\b",
        "<IP>",
    ),
]


def redact_pii(texts: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Sequentially mask every PII_PATTERNS hit with its typed token."""
    out = texts
    for _, pat, repl in PII_PATTERNS:
        out = pc.replace_substring_regex(out, pattern=pat, replacement=repl)
    return out


def pii_counts_and_redact(
    texts: pa.Array | pa.ChunkedArray,
) -> tuple[dict[str, pa.Array], pa.Array]:
    """Per-text hit counts for each pattern plus the fully redacted text.

    Counts are taken on the progressively redacted text (the exact
    population each replacement sees), so ``sum(counts)`` equals the
    number of placeholder tokens inserted.
    """
    counts: dict[str, pa.Array] = {}
    out = texts
    for name, pat, repl in PII_PATTERNS:
        counts[f"n_{name}"] = pc.cast(
            pc.count_substring_regex(out, pattern=pat), pa.int64()
        )
        out = pc.replace_substring_regex(out, pattern=pat, replacement=repl)
    return counts, out


class ScrubPII:
    """``map_batches`` callable: replaces ``text_col`` with its redacted
    form and appends ``n_email`` / ``n_phone`` / ``n_ipv4`` count columns.
    Stateless — run as plain tasks, not an actor pool."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts, red = pii_counts_and_redact(batch.column(self.text_col))
        idx = batch.schema.get_field_index(self.text_col)
        out = batch.set_column(idx, self.text_col, red)
        for name, arr in counts.items():
            out = out.append_column(name, arr)
        return out
