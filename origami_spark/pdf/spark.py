"""Spark adapter: PDF payload column -> extracted text, same fused-
kernel shape as the HTML pipeline (one Arrow batch of documents per
call, zero per-row Python)."""

from __future__ import annotations

from pyspark.sql import DataFrame

PDF_SCHEMA = "url string, text string, n_blocks int"


def _kernel(batches):
    import pandas as pd

    from .extract import extract_pdf_blocks, extract_pdf_text

    for pdf in batches:
        urls, texts, nb = [], [], []
        for url, payload in zip(pdf["url"], pdf["payload"]):
            data = bytes(payload) if payload is not None else b""
            urls.append(url)
            texts.append(extract_pdf_text(data))
            nb.append(len(extract_pdf_blocks(data)))
        yield pd.DataFrame({"url": urls, "text": texts, "n_blocks": nb})


def extract_pdfs(spark, docs: DataFrame, partitions: int | None = None) -> DataFrame:
    """docs: (url string, payload binary) -> (url, text, n_blocks)."""
    src = docs.select("url", "payload")
    n = partitions or src.sparkSession.sparkContext.defaultParallelism * 4
    return src.repartition(n, "url").mapInPandas(_kernel, schema=PDF_SCHEMA)
