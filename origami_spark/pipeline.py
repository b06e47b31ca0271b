"""The extraction pipeline: pages -> blocks -> layout -> order -> compose.

Two execution modes:

* ``extract(spark, pages)`` — one lazy DataFrame chain; Catalyst fuses
  the relational stages, best for benchmarks and interactive use.
* ``extract_staged(spark, pages, work_dir)`` — origami-style artifact
  chain: every stage commits a checkpoint table and is resumable via
  anti-join (plans/runner.py), with per-partition lineage.  This is the
  10^12-document deployment shape: any stage can die and rerun without
  recomputing finished documents.

Physical plan per SURVEY.md §4: scan -> (anti-join done) -> repartition
by url-hash -> mapInPandas(parse kernel) -> window/groupBy relational
rules co-partitioned on url -> compose.  The parse kernel is the only
Python; everything after it is whole-stage-codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .kernels.parse import BLOCKS_SCHEMA, parse_blocks
from .operators import compose as compose_op
from .operators import layout as layout_op
from .operators import order as order_op
from .plans.runner import run_stage


def parse_stage(pages: DataFrame, partitions: int | None = None) -> DataFrame:
    """S1+S2: pages -> exploded block rows.

    Repartitioning by url hash balances documents across executors
    regardless of host skew (urls are unique, so hot hosts cannot gang
    up in one partition — the explicit skew handling the north rule
    asks for; size skew is bounded by the Arrow max-records batch knob
    in session.py)."""
    src = pages.select("url", "html")
    if partitions:
        src = src.repartition(partitions, "url")
    return src.mapInPandas(parse_blocks, schema=BLOCKS_SCHEMA)


def extract(spark: SparkSession, pages: DataFrame,
            partitions: int | None = None) -> DataFrame:
    """Single lazy chain: (url, text, spans) for every input page."""
    blocks = parse_stage(pages, partitions)
    refined = layout_op.refine(blocks)
    ranked = order_op.rank_blocks(refined)
    return compose_op.compose(ranked, pages)


def extract_staged(spark: SparkSession, pages: DataFrame, work_dir: str,
                   partitions: int | None = None,
                   run_id: str | None = None) -> DataFrame:
    """Checkpointed chain with resume + lineage (see plans/runner.py)."""
    blocks = run_stage(
        spark, "s2_blocks", pages,
        lambda df: parse_stage(df, partitions), work_dir, run_id=run_id,
    )
    refined = run_stage(
        spark, "s5_layout", blocks, layout_op.refine, work_dir, run_id=run_id,
    )
    ranked = run_stage(
        spark, "s7_order", refined, order_op.rank_blocks, work_dir, run_id=run_id,
    )
    # compose resumes on the page universe: only not-yet-composed urls
    # (the `pg` passed to build) pull their ranked blocks via semi-join
    return run_stage(
        spark, "s8_compose", pages,
        lambda pg: compose_op.compose(
            ranked.join(pg.select("url"), "url", "left_semi"), pg),
        work_dir, run_id=run_id,
    )
