"""Local oracle vs constructive goldens — the byte-identity gate
(FIXTURES.md §3), fast path without Spark."""

import json

from origami_spark.extract_local import extract_document
from origami_spark.sources.corpus import generate_pages

N = 1500


def test_byte_identical_text_and_spans():
    pages = generate_pages(42, N)
    for p in pages:
        r = extract_document(p["html"])
        assert r["text"] == p["text"], p["url"]
        assert r["spans"] == json.loads(p["spans_json"]), p["url"]


def test_other_seed_also_matches():
    for p in generate_pages(7, 200):
        assert extract_document(p["html"])["text"] == p["text"], p["url"]


def test_generator_deterministic():
    a = generate_pages(42, 50)
    b = generate_pages(42, 50)
    assert all(x["html"] == y["html"] and x["text"] == y["text"]
               for x, y in zip(a, b))


def test_hostile_inputs_never_raise():
    cases = [
        b"",
        bytes(range(256)),
        b"<p>a <em>b<p>c",
        b"<div>" * 300 + b"x" + b"</div>" * 300,
        b"<script>'<p>x</p>'</script>",
        "<p>héllo — wörld.</p>".encode(),
        b"<table><tr><td>a<td>b</table>",
        b"< not a tag < p >",
    ]
    for data in cases:
        r = extract_document(data)
        assert all(0 <= s["start"] <= s["end"] <= len(data) for s in r["spans"])


def test_spans_monotone_nonoverlapping():
    for p in generate_pages(42, 300):
        spans = extract_document(p["html"])["spans"]
        for a, b in zip(spans, spans[1:]):
            assert a["end"] <= b["start"]  # non-overlapping, monotone


def test_spans_rewarp_roundtrip():
    """The rewarp contract (reference ``compose.py:413-432``): spans
    index the RAW html such that re-extracting just the sliced bytes
    reproduces exactly that block's composed text."""
    for p in generate_pages(42, 200):
        r = extract_document(p["html"])
        for m in r["blocks"]:
            sliced = extract_document(p["html"][m["start"]:m["end"]])
            assert sliced["text"].rstrip("\n") == m["text"], (
                p["url"], m["path"])
