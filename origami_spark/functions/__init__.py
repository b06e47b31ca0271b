"""Reusable scalar column functions (all JVM-side Catalyst expressions).

The reference's ``custom/harmonizations/default.py`` declares text
normalization rules *with embedded golden I/O pairs* (``"tests": [...]``
at lines 36-50) — the only unit tests the reference ships.  This package
keeps that contract: every function here has golden pairs in
``tests/test_functions.py``, and the same expressions back the driver
queries so the DuckDB oracles double-check them.
"""

from .text_fns import (  # noqa: F401
    canonical_url,
    harmonize,
    hash60,
    sentence_split,
    tokens,
)
