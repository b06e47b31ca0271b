"""S6 lines stage: explode semantics + path scheme."""

from origami_spark.operators.layout import refine
from origami_spark.operators.lines import lines_table
from origami_spark.pipeline import parse_stage
from origami_spark.sources.corpus import pages_df


def test_line_raw_spans_rewarp(spark):
    """Line-level offset map: every line's raw span slices html bytes
    that normalize back to the line text (dewarp grid contract at line
    granularity)."""
    from origami_spark.html.tokenizer import normalize_text

    pages = pages_df(spark, 60, num_partitions=4).cache()
    html_by_url = {r["url"]: bytes(r["html"]) for r in pages.collect()}
    refined = refine(parse_stage(pages))
    lines = lines_table(refined).filter("raw_start is not null").collect()
    assert lines
    import html as _h
    import re as _re

    for r in lines[:500]:
        raw = html_by_url[r["url"]][r["raw_start"]:r["raw_end"]]
        # strip any inline tags the hull may cover, then normalize
        stripped = _re.sub(rb"<[^>]*>", b"", raw).decode("utf-8", "replace")
        assert normalize_text(stripped) == r["text"], (r["url"], r["path"])


def test_line_confidence_real(spark):
    """confidence = non-link char share per line (ConfidenceSampler
    analog): a linked line scores < 1.0, a pure-text line exactly 1.0,
    and the value matches the normalized link evidence."""
    html = (
        b"<html><body><main>"
        b"<p>a long pure text line with no links at all keeps the whole "
        b"block under the boilerplate threshold.<br>"
        b'visit <a href="/x">the linked archive pages</a> now<br>'
        b'<a href="/y">al</a>most <a href="/z">fully linked line</a></p>'
        b"</main></body></html>"
    )
    df = spark.createDataFrame([("u", bytearray(html))], "url string, html binary")
    refined = refine(parse_stage(df, partitions=1))
    rows = {r["line_id"]: r for r in lines_table(refined).collect()}
    assert rows[1]["confidence"] == 1.0
    # line 2: 'the linked archive pages' linked out of 'visit ... now'
    got2 = rows[2]["confidence"]
    want2 = round((len(rows[2]["text"]) - len("the linked archive pages"))
                  / len(rows[2]["text"]), 4)
    assert got2 == want2 < 1.0
    # line 3 is almost fully linked -> low confidence, predicted LINK
    assert rows[3]["confidence"] < 0.3
    assert rows[3]["predicted_label"] == "LINK"
    assert rows[1]["predicted_label"] == "TEXT"


def test_chrome_rescue_block(spark):
    """Reclassification: a long, link-free TEXT block inside chrome is
    re-homed (reference line re-homing, batch/detect/lines.py:108-127);
    short/linked chrome stays dropped."""
    from origami_spark.extract_local import extract_document

    with open("fixtures/chrome-rescue/page.html", "rb") as f:
        html = f.read()
    df = spark.createDataFrame([("u", bytearray(html))], "url string, html binary")
    refined = refine(parse_stage(df, partitions=1))
    texts = [r["text"] for r in refined.collect()]
    assert any(t.startswith("Editors' note") for t in texts)
    assert not any("Home" in t for t in texts)
    # spark relational path == local oracle
    assert sorted(texts) == sorted(
        m["text"] for m in extract_document(html)["blocks"])


def test_line_rehoming_relational(spark):
    """Line-level re-homing fires identically in the relational chain:
    the nav's announcement line survives alone, its link lines die with
    the block (reference line re-assignment, lines.py:108-127)."""
    from origami_spark.extract_local import extract_document

    with open("fixtures/line-rehoming/page.html", "rb") as f:
        html = f.read()
    df = spark.createDataFrame([("u", bytearray(html))], "url string, html binary")
    refined = refine(parse_stage(df, partitions=1))
    texts = [r["text"] for r in refined.collect()]
    assert any(t.startswith("Buried in the navigation") for t in texts)
    assert not any("member login" in t for t in texts)
    assert sorted(texts) == sorted(
        m["text"] for m in extract_document(html)["blocks"])


def test_lines_explode_and_paths(spark):
    pages = pages_df(spark, 40, num_partitions=4)
    refined = refine(parse_stage(pages))
    lines = lines_table(refined)
    rows = lines.collect()
    assert rows, "corpus must yield line rows"
    for r in rows:
        assert r["path"] == f"{r['block_path']}/{r['line_id']}"
        assert r["line_id"] >= 1
        assert r["text"] != ""
        assert "\n" not in r["text"]
    # every multi-line block explodes completely
    blk = {(r["url"], r["path"]): r for r in refined.collect()}
    import collections
    per_block = collections.Counter((r["url"], r["block_path"]) for r in rows)
    for (url, path), n in per_block.items():
        assert n == blk[(url, path)]["text"].count("\n") + 1
