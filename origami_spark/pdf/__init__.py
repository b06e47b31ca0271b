"""Minimal PDF text extraction + 2-D layout ordering.

The north rule names "PDF/layout parse" alongside HTML boilerplate
strip.  This package provides a from-scratch, dependency-free PDF text
extractor (stdlib ``zlib`` handles FlateDecode) plus the *real* 2-D
XY-cut reading order — the case where origami's recursive cut
(``core/xycut.py:187-241``) does not collapse to a sort, unlike the
1-D character-span reduction used for HTML.

Scope (deliberate): text-bearing PDFs with uncompressed or
FlateDecode content streams, Tj/TJ/'/Td/TD/Tm/T* text operators,
PDFDocEncoding/ASCII strings.  No encryption, no CMaps/Type0 font
decoding, no object streams — those need codec tables this container
doesn't ship; the parser skips what it cannot decode rather than
failing the document (the reference's tolerance posture).
"""

from .extract import extract_pdf_blocks, extract_pdf_text  # noqa: F401
from .order import xy_cut_2d  # noqa: F401
