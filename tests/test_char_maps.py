"""Char-granularity offset map (the dewarp Grid/Transformer analog,
reference core/dewarp.py:496-576): per normalized char, the raw byte
offset it originates from — opt-in via extract_page(char_maps=True) /
parse_stage(char_maps=True).

The exactness contract has two halves:

* the map-producing normalization equals normalize_text bit-for-bit
  (same charref segmentation, same whitespace collapse) — fuzzed;
* projecting a normalized-text span through the map yields a raw byte
  range that re-extracts to the same text, char-exact on the entity/
  whitespace fixtures.
"""

import json
import os

from hypothesis import given, settings
from hypothesis import strategies as st

from origami_spark.extract_local import extract_document
from origami_spark.html.blocks import _normalize_with_map, extract_page
from origami_spark.html.tokenizer import normalize_text

FIXTURES = os.path.join(os.path.dirname(__file__), "..", "fixtures")


def _maps_of(html: bytes):
    """[(line_text, line_span, char_map)] over all mapped blocks."""
    out = []
    for b in extract_page(html, char_maps=True):
        if b.label != "TEXT" or not b.char_maps:
            continue
        for line, sp, cm in zip(b.text.split("\n"), b.line_spans, b.char_maps):
            out.append((line, sp, cm))
    return out


def test_map_structure_and_monotonicity():
    html = (b"<html><body><p>x&nbsp;y AT&amp;T  caf&eacute; "
            b"&#8212;dash&#8212; na&#239;ve</p></body></html>")
    rows = _maps_of(html)
    assert rows
    for line, (s, e, _l), cm in rows:
        assert len(cm) == len(line)
        known = [o for o in cm if o >= 0]
        assert known == sorted(known)          # forward map is monotone
        assert all(s <= o < e for o in known)  # inside the line hull


def test_char_roundtrip_on_entity_whitespace_fixtures():
    """Char-exact roundtrip: for every normalized char with a known
    source, re-extracting the raw bytes at its mapped offset and
    normalizing reproduces that char (entities included: the mapped
    offset points at the '&' of the source entity)."""
    for case in ("unicode-entities", "plain-article", "gutter-split",
                 "rule-split", "continuation-divs"):
        with open(os.path.join(FIXTURES, case, "page.html"), "rb") as f:
            html = f.read()
        rows = _maps_of(html)
        assert rows, case
        for line, _sp, cm in rows:
            for i, (ch, off) in enumerate(zip(line, cm)):
                if off < 0:
                    continue
                nxt = next((o for o in cm[i + 1:] if o > off), off + 48)
                piece = normalize_text(html[off:nxt].decode("utf-8", "replace"))
                assert piece[:1] in (ch, ""), (case, line, i, ch, piece)
                if ch != " ":
                    assert piece[:1] == ch, (case, line, i, ch, piece)


def test_span_surgery_projection():
    """The consumer story: take a normalized-text span (as
    remove_duplicate_spans would emit), project it through the map,
    and check the raw slice normalizes back to the span's text."""
    html = (b"<html><body><p>alpha beta&nbsp;gamma AT&amp;T delta "
            b"epsilon zeta</p></body></html>")
    (line, _sp, cm), = _maps_of(html)
    for i in range(len(line)):
        for j in range(i + 1, min(i + 20, len(line)) + 1):
            if cm[i] < 0 or line[i] == " " or (j < len(line) and cm[j] < 0):
                continue
            raw_s = cm[i]
            raw_e = cm[j] if j < len(line) else _sp[1]
            got = normalize_text(html[raw_s:raw_e].decode("utf-8", "replace"))
            assert got == line[i:j].strip(), (i, j, got, line[i:j])


_ENTITY_SOUP = st.text(
    alphabet=st.sampled_from(list("ab &;#xX01779nbampqutol<>\t\n")),
    min_size=0, max_size=60)


@given(_ENTITY_SOUP)
@settings(max_examples=300, deadline=None)
def test_map_normalization_equals_normalize_text(raw):
    """The mapped normalization IS normalize_text — on arbitrary entity
    soup, including truncated/bogus references and whitespace runs."""
    norm, offs = _normalize_with_map([(raw, (0, len(raw.encode("utf-8"))))])
    assert norm == normalize_text(raw)
    assert len(offs) == len(norm)


@given(st.lists(st.tuples(_ENTITY_SOUP, st.booleans()), max_size=6))
@settings(max_examples=150, deadline=None)
def test_map_normalization_multi_piece(pieces):
    """Multi-piece lines (inline elements): same equality, with spans
    assigned consecutively and span-less pieces interleaved."""
    built, pos = [], 0
    for text, has_span in pieces:
        n = len(text.encode("utf-8"))
        built.append((text, (pos, pos + n) if has_span else None))
        pos += n
    raw = "".join(t for t, _ in built)
    norm, offs = _normalize_with_map(built)
    assert norm == normalize_text(raw)
    assert len(offs) == len(norm)


def test_goldens_unaffected_by_flag():
    """char_maps is observability only: block text/spans are identical
    with and without it, on generator pages."""
    from origami_spark.sources.corpus import generate_pages

    for p in generate_pages(42, 40):
        plain = extract_page(p["html"])
        mapped = extract_page(p["html"], char_maps=True)
        assert [(b.label, b.text, b.start, b.end) for b in plain] == \
            [(b.label, b.text, b.start, b.end) for b in mapped]
        r = extract_document(p["html"])
        assert r["text"] == p["text"]
        assert r["spans"] == json.loads(p["spans_json"])


def test_kernel_emits_aligned_char_maps(spark):
    """Spark surface: parse_stage(char_maps=True) emits line_char_maps
    aligned with line_spans, and each map's offsets sit inside its
    line's hull."""
    from origami_spark.pipeline import parse_stage
    from origami_spark.sources.corpus import pages_df

    rows = (
        parse_stage(pages_df(spark, 30, num_partitions=2), char_maps=True)
        .filter("label = 'TEXT' AND line_char_maps IS NOT NULL")
        .select("text", "line_spans", "line_char_maps")
        .collect()
    )
    assert rows
    for r in rows:
        assert len(r["line_spans"]) == len(r["line_char_maps"])
        for line, sp, cm in zip(r["text"].split("\n"), r["line_spans"],
                                r["line_char_maps"]):
            assert len(cm) == len(line)
            for o in cm:
                if o >= 0:
                    assert sp["start"] <= o < sp["end"]
