"""URL canonicalization for web-page tables (the flagship corpus keys
every page by ``url`` — BASELINE input_hint; reference pages are keyed
the same way).

Canonical form, applied in this order:

1. drop the fragment (``#…``);
2. lowercase the scheme and host (path/query case is preserved);
3. strip a leading ``www.`` from the host;
4. strip the scheme-default port (``http:80`` / ``https:443``);
5. remove tracking query parameters (``utm_*``, ``fbclid``, ``gclid``),
   healing the separators;
6. drop an empty trailing ``?`` and a single trailing ``/``.

Everything is RE2 executed by Arrow's C++ kernels; DuckDB's ``regexp_*``
embed the same engine, so the SQL oracle reproduces the output byte-for-
byte from the SAME interpolated pattern constants. Stateless map, no
shuffle, no Python row loop. Strings that do not look like scheme://host
URLs pass through unchanged.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

#: scheme://host prefix (named groups: Arrow extract_regex requires names;
#: the SQL oracle addresses the same groups by index 1/2).
URL_PREFIX_PATTERN = (
    r"^(?P<pre>[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*)(?P<rest>.*)$"
)

#: (pattern, replacement) RE2 rewrites applied AFTER the lowercase step,
#: in order. RE2 has no lookahead, so boundary context is captured and
#: restored with backreferences (\1\2 works identically in both engines).
URL_NORM_STEPS: list[tuple[str, str]] = [
    (r"^(http://[^/?#:]*):80([/?#].*)?$", r"\1\2"),
    (r"^(https://[^/?#:]*):443([/?#].*)?$", r"\1\2"),
    (r"^(https?://)www\.", r"\1"),
    # tracking params must start at a [?&] boundary (an unanchored form
    # fired on substrings like '?myfbclid=…' and merged distinct URLs).
    # RE2 has no lookbehind, so the separator is captured and restored;
    # the (…&)+ run form consumes CONSECUTIVE tracking params in one
    # match — GlobalReplace resumes after each match, so a one-param
    # pattern would skip the second of '?utm_a=1&utm_b=2&id=3'.
    (r"([?&])(?:(?:utm_[A-Za-z0-9]+|fbclid|gclid)=[^&#]*&)+", r"\1"),
    # trailing tracking param: drop it AND its leading separator
    (r"[?&](?:utm_[A-Za-z0-9]+|fbclid|gclid)=[^&#]*$", ""),
    (r"\?$", ""),
    (r"/+$", ""),  # all trailing slashes (one pass = idempotent)
]

#: fragment strip runs FIRST (before lowercasing) so `#` never splits the
#: prefix match.
FRAGMENT_PATTERN = r"#.*$"

#: host of a normalized URL (named group for Arrow; index 1 in SQL).
HOST_PATTERN = r"^[a-z][a-z0-9+.\-]*://(?P<host>[^/?#:]+)"


def normalize_urls(urls: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Canonicalize a string column of URLs (see module docstring)."""
    u = pc.replace_substring_regex(urls, pattern=FRAGMENT_PATTERN, replacement="")
    ex = pc.extract_regex(u, pattern=URL_PREFIX_PATTERN)
    lowered = pc.binary_join_element_wise(
        pc.utf8_lower(pc.struct_field(ex, "pre")), pc.struct_field(ex, "rest"), ""
    )
    u = pc.if_else(ex.is_valid(), lowered, u)
    for pat, repl in URL_NORM_STEPS:
        u = pc.replace_substring_regex(u, pattern=pat, replacement=repl)
    return u


def host_of(urls: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Host of each (normalized) URL; '' when no scheme://host present —
    matching DuckDB's regexp_extract no-match convention."""
    ex = pc.extract_regex(urls, pattern=HOST_PATTERN)
    return pc.if_else(
        ex.is_valid(),
        pc.struct_field(ex, "host"),
        pa.scalar("", pa.string()),
    )


class NormalizeUrls:
    """``map_batches`` callable: adds ``url_norm`` + ``host`` next to
    ``url_col``. Stateless — run as plain tasks."""

    def __init__(self, url_col: str = "url"):
        self.url_col = url_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        norm = normalize_urls(batch.column(self.url_col))
        return batch.append_column("url_norm", norm).append_column(
            "host", host_of(norm)
        )
