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


def sentence_split(col) -> Column:
    """Split into sentence-ish units on terminal punctuation followed by
    whitespace; keeps the terminal character with the sentence."""
    return F.filter(
        F.split(F.regexp_replace(col, "([.!?])\\s+", "$1\x00"), "\x00"),
        lambda x: x != "",
    )
