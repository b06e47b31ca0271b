"""Per-url extraction explainer (annotate/*.py analog)."""

from origami_spark.debug import explain_extraction, explain_extraction_text
from origami_spark.sources.corpus import pages_df


def test_explain_extraction_accounts_for_every_block(spark):
    pages = pages_df(spark, 20, num_partitions=2).cache()
    url = pages.select("url").first()["url"]
    rows = explain_extraction(spark, pages, url).collect()
    assert rows, "page must parse into blocks"
    outcomes = [r["rule_outcome"] for r in rows]
    # every parsed block gets exactly one explanation
    assert all(o is not None for o in outcomes)
    kept = [r for r in rows if r["rule_outcome"] == "kept"]
    # kept blocks carry a reading-order rank, contiguous from 1
    assert sorted(r["rank"] for r in kept) == list(range(1, len(kept) + 1))
    # chrome pages always produce at least one dropped-chrome row
    assert any(o.startswith("dropped: chrome") for o in outcomes)


def test_explain_extraction_text_renders(spark):
    pages = pages_df(spark, 5, num_partitions=1).cache()
    url = pages.select("url").first()["url"]
    table = explain_extraction_text(spark, pages, url)
    assert "rule_outcome" in table and "+--" in table.splitlines()[0]
