"""Deterministic synthetic PDF builder (tests/fixtures only).

Builds small but structurally-honest PDFs: header, catalog/pages/page
objects, a (optionally FlateDecode) content stream, xref table and
trailer — the golden text is constructed alongside, same contract as
sources/corpus.py for HTML.
"""

from __future__ import annotations

import zlib


def _esc(s: str) -> bytes:
    return (
        s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    ).encode("latin-1", "replace")


def make_pdf(blocks, compress: bool = True) -> bytes:
    """blocks: list of (lines: list[str], x: float, y: float).

    Each block becomes one BT..ET group positioned via Tm, lines via
    `0 -12 Td`."""
    parts = []
    for lines, x, y in blocks:
        parts.append(b"BT")
        parts.append(f"/F1 10 Tf 1 0 0 1 {x} {y} Tm".encode())
        for i, line in enumerate(lines):
            if i:
                parts.append(b"0 -12 Td")
            parts.append(b"(" + _esc(line) + b") Tj")
        parts.append(b"ET")
    stream = b"\n".join(parts)
    filt = b""
    if compress:
        stream = zlib.compress(stream)
        filt = b"/Filter /FlateDecode "

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length %d %s>>\nstream\n%s\nendstream" % (len(stream), filt, stream),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n%s\nendobj\n" % (i, body)
    xref_at = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)


def two_column_pdf(compress: bool = True):
    """-> (pdf_bytes, golden_text): classic two-column page; reading
    order = full left column, then right column (the case 1-D ordering
    cannot express)."""
    blocks = [
        (["Left column first paragraph", "continues on second line."], 50, 700),
        (["Left column second paragraph."], 50, 600),
        (["Right column first paragraph."], 320, 700),
        (["Right column second paragraph."], 320, 600),
    ]
    golden = (
        "Left column first paragraph\ncontinues on second line.\n\n"
        "Left column second paragraph.\n\n"
        "Right column first paragraph.\n\n"
        "Right column second paragraph.\n"
    )
    return make_pdf(blocks, compress=compress), golden
