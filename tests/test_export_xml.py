"""XML export: well-formedness, escaping, reading-order refs."""

import xml.etree.ElementTree as ET

from origami_spark.operators.export_xml import to_xml
from origami_spark.pipeline import extract_fused
from origami_spark.sources.corpus import pages_df


def test_xml_wellformed_and_complete(spark):
    pages = pages_df(spark, 60, num_partitions=4).cache()
    composed = extract_fused(spark, pages)
    out = {r["url"]: r["xml"] for r in to_xml(composed).collect()}
    assert len(out) == 60
    checked_blocks = 0
    for url, xml in out.items():
        root = ET.fromstring(xml)  # raises if not well-formed
        assert root.tag == "Document" and root.get("url") == url
        refs = [r.get("idref") for r in root.find("ReadingOrder")]
        blocks = root.findall("Block")
        assert [b.get("id") for b in blocks] == refs  # order refs match
        for b in blocks:
            assert int(b.get("start")) < int(b.get("end"))
        checked_blocks += len(blocks)
    assert checked_blocks > 100


def test_xml_escaping(spark):
    html = "<body><p>AT&amp;T says 1 &lt; 2 &amp; \"x\".</p></body>".encode()
    pages = spark.createDataFrame([("u", bytearray(html))],
                                  "url string, html binary")
    xml = to_xml(extract_fused(spark, pages, partitions=1)).first()["xml"]
    root = ET.fromstring(xml)
    assert root.find("Text").text.strip() == 'AT&T says 1 < 2 & "x".'
