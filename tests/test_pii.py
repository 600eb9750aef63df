"""PII scrub: typed-token masking + counts, and RE2 parity with DuckDB
(the oracle engine) on adversarial strings."""

import duckdb
import pyarrow as pa

from ertransfer_ray.functions.pii import (
    PII_PATTERNS,
    ScrubPII,
    pii_counts_and_redact,
    redact_pii,
)

TRICKY = [
    "contact john.doe+spam@example.co.uk or admin@sub.domain.org today",
    "ip 192.168.1.254 and 10.0.0.1 seen; call 555-123-4567 or (212) 555 0199",
    "no pii here, just numbers 12345 and a date 2021-01-01",
    "email a@b.co. trailing dot; phone +1-800-555-0123; 999.999.999.999 invalid ip",
    "glued:user123@ex4.com, octets at bounds 255.255.255.255 and 0.0.0.0",
    "version 1.2.3.4 is a valid dotted quad; 1.2.3.456 is not",
    "",
    "   ",
    "unicode héllo@exämple.com stays (non-ASCII local/host not matched) café",
]


def test_redact_masks_expected_spans():
    out = redact_pii(pa.array(TRICKY)).to_pylist()
    assert out[0] == "contact <EMAIL> or <EMAIL> today"
    assert out[1] == "ip <IP> and <IP> seen; call <PHONE> or <PHONE>"
    assert out[2] == TRICKY[2]
    assert "<EMAIL>" in out[3] and "<PHONE>" in out[3]
    assert "999.999.999.999" in out[3]  # invalid octets survive
    assert out[4].startswith("glued:<EMAIL>,") and out[4].count("<IP>") == 2
    assert "<IP>" in out[5] and "1.2.3.456" in out[5]
    assert out[6] == "" and out[7] == "   "
    # non-ASCII email local parts are not claimed (ASCII-only pattern), but
    # the ASCII tail around the @ still matches per RE2 semantics.
    assert "café" in out[8]


def test_counts_match_inserted_tokens():
    counts, red = pii_counts_and_redact(pa.array(TRICKY))
    red = red.to_pylist()
    for name, col in counts.items():
        tok = {"n_email": "<EMAIL>", "n_phone": "<PHONE>", "n_ipv4": "<IP>"}[name]
        assert col.to_pylist() == [t.count(tok) for t in red]


def test_duckdb_re2_parity_on_tricky_strings():
    """Arrow and DuckDB embed the same RE2 engine; the oracle depends on
    byte-identical replacement output — pin it on the adversarial set."""
    arr = pa.array(TRICKY)
    for _, pat, repl in PII_PATTERNS:
        a = pa.compute.replace_substring_regex(
            arr, pattern=pat, replacement=repl
        ).to_pylist()
        d = [
            r[0]
            for r in duckdb.sql(
                "SELECT regexp_replace(t, ?, ?, 'g') FROM (SELECT unnest(?) t)",
                params=[pat, repl, TRICKY],
            ).fetchall()
        ]
        assert a == d


def test_scrub_batch_stage():
    t = pa.table({"doc_id": list(range(len(TRICKY))), "text": TRICKY})
    out = ScrubPII("text")(t)
    assert out.column_names == ["doc_id", "text", "n_email", "n_phone", "n_ipv4"]
    assert out.column("text").to_pylist() == redact_pii(pa.array(TRICKY)).to_pylist()
    # empty batch passes through with the same appended schema
    empty = ScrubPII("text")(t.slice(0, 0))
    assert empty.num_rows == 0 and empty.column_names == out.column_names
