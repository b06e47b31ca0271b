"""WARC source: parse round-trip (plain + per-record gzip) and the full
WARC -> engine -> golden-text path."""

import pyspark.sql.functions as F

from origami_spark.sources.corpus import generate_pages
from origami_spark.sources.warc import parse_warc_bytes, read_warc, synth_warc


def test_parse_roundtrip_plain_and_gzip():
    pages = generate_pages(42, 30)
    for gz in (False, True):
        data = synth_warc(pages, per_record_gzip=gz)
        got = parse_warc_bytes(data)
        assert [g["url"] for g in got] == [p["url"] for p in pages]
        for g, p in zip(got, pages):
            assert g["html"] == p["html"], (gz, g["url"])
            assert g["warc_ts"] == p["warc_ts"]


def test_non_response_records_skipped():
    pages = generate_pages(42, 3)
    data = synth_warc(pages)
    # splice in a warcinfo record (no target-uri) up front
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
            b"Content-Length: 4\r\n\r\nabc1\r\n\r\n")
    got = parse_warc_bytes(info + data)
    assert len(got) == 3


def test_corrupt_gzip_member_keeps_good_prefix():
    """A truncated/corrupt member mid-archive must not raise — records
    before the bad member survive (a raised zlib.error would fail the
    whole archive's Spark task)."""
    pages = generate_pages(42, 6)
    good = synth_warc(pages[:3], per_record_gzip=True)
    garbage = b"\x1f\x8b\x08\x00BROKEN-NOT-REALLY-GZIP-DATA"
    tail = synth_warc(pages[3:], per_record_gzip=True)
    got = parse_warc_bytes(good + garbage + tail)
    assert [g["url"] for g in got] == [p["url"] for p in pages[:3]]


def test_warc_to_extraction_byte_identical(spark, tmp_path):
    """Archives in, golden text out: the WARC connector feeds the same
    engine and the output matches the constructive goldens bytewise."""
    from origami_spark.pipeline import extract_fused

    pages = generate_pages(42, 60)
    # two archives, one plain + one per-record gzip (Common Crawl style)
    (tmp_path / "a.warc").write_bytes(synth_warc(pages[:30]))
    (tmp_path / "b.warc.gz").write_bytes(
        synth_warc(pages[30:], per_record_gzip=True))

    df = read_warc(spark, str(tmp_path / "*.warc*"))
    assert df.count() == 60
    out = extract_fused(spark, df, partitions=4)
    golden = spark.createDataFrame(
        [(p["url"], p["text"]) for p in pages], "url string, golden string")
    cmp = out.join(golden, "url")
    assert cmp.count() == 60
    assert cmp.filter(F.col("text") != F.col("golden")).count() == 0
