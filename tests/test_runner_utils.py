"""reset / cleanup / sample utilities (§2.0 framework completeness)."""

import os

from origami_spark.pipeline import extract_staged
from origami_spark.plans.runner import (
    cleanup_incomplete,
    reset_stages,
    sample_stage,
)
from origami_spark.sources.corpus import pages_df


def test_reset_and_recompute(spark, tmp_path):
    wd = str(tmp_path / "wd")
    pages = pages_df(spark, 40, num_partitions=4).cache()
    out1 = extract_staged(spark, pages, wd)
    assert out1.count() == 40
    removed = reset_stages(wd, ["s8_compose", "not_a_stage"])
    assert removed == ["s8_compose"]
    assert not os.path.exists(f"{wd}/s8_compose")
    # rerun recomputes only the reset stage (upstream still committed)
    out2 = extract_staged(spark, pages, wd)
    assert out2.count() == 40


def test_cleanup_incomplete(spark, tmp_path):
    wd = str(tmp_path / "wd")
    pages = pages_df(spark, 20, num_partitions=2)
    extract_staged(spark, pages, wd)
    # simulate a crashed writer: stage dir without the _SUCCESS marker
    os.makedirs(f"{wd}/s9_broken")
    with open(f"{wd}/s9_broken/part-0000.parquet", "w") as f:
        f.write("partial")
    removed = cleanup_incomplete(wd)
    assert removed == ["s9_broken"]
    assert os.path.exists(f"{wd}/s8_compose")  # committed stages untouched


def test_sample_stage_deterministic(spark, tmp_path):
    wd = str(tmp_path / "wd")
    extract_staged(spark, pages_df(spark, 60, num_partitions=4), wd)
    a = {r["url"] for r in sample_stage(spark, wd, "s8_compose", 0.3).collect()}
    b = {r["url"] for r in sample_stage(spark, wd, "s8_compose", 0.3).collect()}
    assert a == b  # seeded => reproducible
    assert 0 < len(a) < 60
