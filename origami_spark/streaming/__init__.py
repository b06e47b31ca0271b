"""Streaming: incremental ingest for the extraction pipeline.

HONESTY NOTE (SURVEY.md §2.10): the reference is strictly batch — it has
no watermarks, windows, state stores, or late-data semantics; its notion
of incrementality is resume-by-checkpoint (skip pages whose outputs
exist, ``processor.py:365-394``).  This package therefore does NOT claim
streaming parity.  What it provides is the Spark-native upgrade of the
reference's incremental model: a Structured Streaming file/table source
feeding the same fused extraction kernel via ``foreachBatch``, so a
landing zone of crawl output is drained continuously with exactly-once
sink semantics — each micro-batch is the same idempotent per-url write
the batch runner commits.
"""

from .corpus import stream_corpus  # noqa: F401
from .ingest import (  # noqa: F401
    stream_exact_dedup,
    stream_extract,
    stream_extract_warc,
)
