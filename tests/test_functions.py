"""Golden I/O pairs for scalar functions — the reference's embedded
harmonization tests (custom/harmonizations/default.py:36-50), made into
a real suite."""

import pyspark.sql.functions as F
import pytest

from origami_spark.functions import (
    canonical_url,
    harmonize,
    hash60,
    sentence_split,
    tokens,
)

HARMONIZE_PAIRS = [
    ("Hello   World", "hello world"),
    ("Room 101, floor 3", "room #, floor #"),
    ("  trimmed\t\n  ", "trimmed"),
    ("MiXeD CaSe 2024!", "mixed case #!"),
    ("", ""),
    ("42", "#"),
]

TOKEN_PAIRS = [
    ("Hello, world!", ["hello", "world"]),
    ("a--b__c", ["a", "b", "c"]),   # _ is non-alphanumeric for our split
    ("  ", []),
    ("ABC123 def", ["abc123", "def"]),
]

URL_PAIRS = [
    ("HTTPS://WWW.Example.COM:443/Path/?utm_source=x&id=5#frag",
     "https://example.com/Path/?id=5"),
    ("http://site.org:80/a?ref=tw", "http://site.org/a"),
    ("http://site.org/a?id=1&utm_campaign=z", "http://site.org/a?id=1"),
    ("https://a.com/", "https://a.com"),
    ("https://a.com/x/?utm_a=1&utm_b=2&q=3", "https://a.com/x/?q=3"),
    ("ftp://Host.Com/File", "ftp://host.com/File"),  # path case kept
    ("https://b.net:8443/x", "https://b.net:8443/x"),  # non-default port kept
    # anchoring regressions: 'ref=' inside 'href=' or inside a path
    # segment must NOT be treated as a tracking param
    ("https://a.com/?href=x&id=1", "https://a.com/?href=x&id=1"),
    ("https://a.com/ref=5/page", "https://a.com/ref=5/page"),
    ("https://a.com/?a=1&ref=x&b=2", "https://a.com/?a=1&b=2"),
    ("https://a.com/?ref=a&ref=b", "https://a.com"),
]

SENTENCE_PAIRS = [
    ("One. Two! Three?", ["One.", "Two!", "Three?"]),
    ("No terminal here", ["No terminal here"]),
    ("Trailing. ", ["Trailing."]),
]


def run_fn(spark, fn, value):
    return (
        spark.range(1)
        .select(fn(F.lit(value)).alias("out"))
        .collect()[0]["out"]
    )


@pytest.mark.parametrize("raw,want", HARMONIZE_PAIRS)
def test_harmonize_goldens(spark, raw, want):
    assert run_fn(spark, harmonize, raw) == want


@pytest.mark.parametrize("raw,want", TOKEN_PAIRS)
def test_tokens_goldens(spark, raw, want):
    assert run_fn(spark, tokens, raw) == want


@pytest.mark.parametrize("raw,want", URL_PAIRS)
def test_canonical_url_goldens(spark, raw, want):
    assert run_fn(spark, canonical_url, raw) == want


@pytest.mark.parametrize("raw,want", SENTENCE_PAIRS)
def test_sentence_split_goldens(spark, raw, want):
    assert run_fn(spark, sentence_split, raw) == want


def test_hash60_matches_python_md5(spark):
    import hashlib

    for s in ("", "abc", "The quick brown fox", "über café"):
        want = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
        assert run_fn(spark, hash60, s) == want
