"""Text column functions: harmonization, tokenization, hashing.

Everything is a Catalyst expression over a string column — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..operators.text import TOKEN_SPLIT, portable_hash60


def harmonize(col) -> Column:
    """Deterministic text harmonization (reference
    ``custom/harmonizations/default.py`` rule-chain shape):
    lowercase -> digit runs to '#' -> collapse whitespace -> trim."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(col), "[0-9]+", "#"),
            "\\s+",
            " ",
        )
    )


def tokens(col) -> Column:
    """Lower + split on non-alphanumerics + drop empties (shared with
    every dedup/text operator and the DuckDB oracles)."""
    return F.filter(F.split(F.lower(col), TOKEN_SPLIT), lambda x: x != "")


def hash60(col) -> Column:
    """Portable deterministic 60-bit hash (identical in DuckDB)."""
    return portable_hash60(col)


TRACKING_PARAMS = "utm_[a-zA-Z]+|fbclid|gclid|ref"


def canonical_url(col) -> Column:
    """Deterministic URL canonicalization for crawl dedup: strip
    fragment, strip tracking params (utm_*/fbclid/gclid/ref), lowercase
    scheme://host[:port], drop www., drop default ports, drop a trailing
    slash.  Pure regexp chain — RE2-compatible (no lookaround), so the
    DuckDB oracle applies the identical rules; golden pairs in
    tests/test_functions.py."""
    x = F.regexp_replace(col, "#.*", "")                       # fragment
    # tracking params must be anchored to a ?/& delimiter: an unanchored
    # pattern would eat 'ref=' inside 'href=' or a '/ref=5/...' path
    x = F.regexp_replace(
        x, f"([?&])({TRACKING_PARAMS})=[^&]*", "$1")
    x = F.regexp_replace(x, "&&+", "&")                        # && -> &
    x = F.regexp_replace(x, "\\?&", "?")                       # ?& -> ?
    x = F.regexp_replace(x, "[?&]$", "")                       # dangling
    head = F.regexp_extract(x, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", 0)
    tail = F.regexp_replace(x, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    x = F.concat(F.lower(head), tail)                          # lc host
    x = F.regexp_replace(x, "^(https?://)www\\.", "$1")        # www.
    x = F.regexp_replace(x, "^(http://[^/:?#]+):80([/?#]|$)", "$1$2")
    x = F.regexp_replace(x, "^(https://[^/:?#]+):443([/?#]|$)", "$1$2")
    return F.regexp_replace(x, "/$", "")                       # trailing /


def sentence_split(col) -> Column:
    """Split into sentence-ish units on terminal punctuation followed by
    whitespace; keeps the terminal character with the sentence."""
    return F.filter(
        F.split(F.regexp_replace(col, "([.!?])\\s+", "$1\x00"), "\x00"),
        lambda x: x != "",
    )
