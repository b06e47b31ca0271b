"""S6 lines stage: explode semantics + path scheme."""

from origami_spark.operators.layout import refine
from origami_spark.operators.lines import lines_table
from origami_spark.pipeline import parse_stage
from origami_spark.sources.corpus import pages_df


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
