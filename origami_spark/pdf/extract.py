"""PDF content-stream text extraction (pure stdlib).

Strategy: scan indirect objects by pattern (robust to broken xref
tables, like the reference's tolerance of damaged inputs), inflate
FlateDecode streams, then walk text operators inside BT/ET blocks
tracking the text matrix enough to recover block positions for layout
ordering.
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)\bendobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\s*endstream", re.S)
_BT_RE = re.compile(rb"\bBT\b(.*?)\bET\b", re.S)

# text-positioning / showing operators inside BT..ET
_TOK_RE = re.compile(
    rb"""
    \((?P<str>(?:\\.|[^\\()])*)\)      # literal string
  | \[(?P<arr>(?:\\.|[^\]])*)\]\s*TJ   # TJ array
  | (?P<num>[-+]?\d*\.?\d+)            # number operand
  | (?P<op>T[dDjJmLc*]|Tf|Tw|Tz|'|")   # operators we care about
    """,
    re.S | re.X,
)

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape(raw: bytes) -> str:
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        c = raw[i:i + 1]
        if c == b"\\" and i + 1 < n:
            nxt = raw[i + 1:i + 2]
            if nxt.isdigit():  # octal \ddd (1-3 digits)
                j = i + 1
                while j < min(i + 4, n) and raw[j:j + 1].isdigit():
                    j += 1
                out.append(int(raw[i + 1:j], 8) & 0xFF)
                i = j
                continue
            out += _ESCAPES.get(nxt, nxt)
            i += 2
            continue
        out += c
        i += 1
    # PDFDocEncoding ~ latin-1 for the printable range we support
    return out.decode("latin-1")


@dataclass
class PdfBlock:
    text: str
    x: float
    y: float
    width: float
    height: float


def _content_streams(data: bytes):
    """Yield decoded content-stream bytes (FlateDecode or raw)."""
    for m in _OBJ_RE.finditer(data):
        body = m.group(3)
        sm = _STREAM_RE.search(body)
        if not sm:
            continue
        head, stream = body[: sm.start()], sm.group(1)
        if b"/FlateDecode" in head:
            try:
                stream = zlib.decompress(stream)
            except zlib.error:
                continue  # undecodable: skip, don't fail the doc
        elif b"/Filter" in head:
            continue  # unsupported filter
        if b"BT" in stream:
            yield stream


def _walk_text(bt_body: bytes):
    """-> list of (text, x, y) runs inside one BT..ET block."""
    runs = []
    x = y = 0.0
    nums: list = []

    def show(raw: bytes):
        s = _unescape(raw)
        if s:
            runs.append((s, x, y))

    for m in _TOK_RE.finditer(bt_body):
        if m.group("str") is not None and not m.group("op"):
            # bare string: operand for the NEXT Tj/'/" — peek handled by
            # keeping it; simplest correct model: strings only display
            # via Tj/'/" which immediately follow, so stash it
            nums.append(("s", m.group("str")))
            continue
        if m.group("arr") is not None:
            # TJ: strings interleaved with kerning numbers; a large
            # negative kern renders as an inter-word gap
            parts = []
            for am in re.finditer(
                rb"\((?P<s>(?:\\.|[^\\()])*)\)|(?P<k>[-+]?\d*\.?\d+)",
                m.group("arr"),
            ):
                if am.group("s") is not None:
                    parts.append(_unescape(am.group("s")))
                elif float(am.group("k")) < -180:
                    parts.append(" ")
            s = "".join(parts)
            if s:
                runs.append((s, x, y))
            nums.clear()
            continue
        if m.group("num") is not None:
            nums.append(("n", float(m.group("num"))))
            continue
        op = m.group("op")
        if op in (b"Td", b"TD"):
            vals = [v for k, v in nums if k == "n"][-2:]
            if len(vals) == 2:
                x += vals[0]
                y += vals[1]
            nums.clear()
        elif op == b"Tm":
            vals = [v for k, v in nums if k == "n"][-6:]
            if len(vals) == 6:
                x, y = vals[4], vals[5]
            nums.clear()
        elif op == b"T*":
            y -= 12.0  # nominal leading
            nums.clear()
        elif op in (b"Tj", b"'", b'"'):
            strs = [v for k, v in nums if k == "s"]
            if strs:
                if op != b"Tj":
                    y -= 12.0
                show(strs[-1])
            nums.clear()
        else:
            nums.clear()
    return runs


def extract_pdf_blocks(data: bytes) -> list:
    """-> list[PdfBlock]: one block per BT..ET group, positioned at its
    first text run; width/height estimated from content (no font
    metrics without embedded CMaps — nominal 6pt/char, 12pt leading)."""
    blocks = []
    for stream in _content_streams(data):
        for bm in _BT_RE.finditer(stream):
            runs = _walk_text(bm.group(1))
            if not runs:
                continue
            # group runs into lines by y
            lines: dict = {}
            for s, rx, ry in runs:
                lines.setdefault(round(ry, 1), []).append((rx, s))
            ordered = []
            for ly in sorted(lines, reverse=True):  # PDF y grows upward
                parts = [s for _rx, s in sorted(lines[ly], key=lambda t: t[0])]
                ordered.append(" ".join(" ".join(parts).split()))
            text = "\n".join(ln for ln in ordered if ln)
            if not text:
                continue
            xs = [rx for _s, rx, _ry in runs]
            ys = [ry for _s, _rx, ry in runs]
            width = max(6.0 * max(len(ln) for ln in text.split("\n")), 1.0)
            blocks.append(PdfBlock(
                text=text,
                x=min(xs),
                y=max(ys),
                width=width,
                height=12.0 * (text.count("\n") + 1),
            ))
    return blocks


def extract_pdf_text(data: bytes) -> str:
    """Full-document text in 2-D XY-cut reading order, blocks joined by
    blank lines (same compose contract as the HTML path)."""
    from .order import xy_cut_2d

    blocks = extract_pdf_blocks(data)
    if not blocks:
        return ""
    boxes = [
        (i, b.x, b.y - b.height, b.x + b.width, b.y)
        for i, b in enumerate(blocks)
    ]
    order = xy_cut_2d(boxes)
    return "\n\n".join(blocks[i].text for i in order) + "\n"
