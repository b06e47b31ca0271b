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
