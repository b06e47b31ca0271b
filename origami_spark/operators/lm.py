"""Corpus language-model quality scoring, dependency-free.

The ccnet pipeline (Wenzek et al. 2020, "CCNet: Extracting High
Quality Monolingual Datasets from Web Crawl Data" — public) ranks web
documents by LANGUAGE-MODEL perplexity: text that a model of the
target distribution finds surprising is usually boilerplate, gibberish
or the wrong register.  ccnet uses a pretrained KenLM; this container
has no model files, so the analog is self-contained: an order-2
character Markov model ESTIMATED FROM THE CORPUS ITSELF (or any
reference corpus the caller passes), scoring p(c3 | c1 c2) with
add-one smoothing.

Engine-portability design: log-probabilities are QUANTIZED to integers
(``qlp = floor(-log2(p) * q + 0.5)``, default q=4096 — ~2.4e-4 bits of
resolution).  Per-document scores are then INTEGER sums, which are
associative — the score cannot vary with partitioning, and a DuckDB
oracle summing the same integers matches bit-for-bit.  The float
``log2`` runs ONLY inside the engine when the model table is built;
the driver query stages that table to parquet (the
ann_ivf_topk/lines_confidence_checked pattern) and the oracle re-reads
it, so cross-engine libm last-ulp differences never enter the gate.

Plan shape at 100 TB: model estimation is the wordcount shape (one
shuffle on the trigram key, map-side partial agg; the char-trigram
type space is bounded by charset^3, not corpus size); scoring is a
BROADCAST join of the model table against the per-doc trigram explode
plus one integer groupBy per doc — 2 exchanges total, no window, no
Python.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["char_trigram_lm", "lm_score"]


def _trigrams(docs: DataFrame, text_col: str,
              id_col: str) -> DataFrame:
    """One row per (doc, position): the 3-char substring starting
    there.  Docs shorter than 3 chars contribute nothing."""
    # NB Spark sequence(1, 0) is DESCENDING [1, 0], not empty — docs
    # shorter than 3 chars must take the empty-array branch explicitly
    idx = F.when(
        F.length(text_col) >= 3,
        F.sequence(F.lit(1), F.length(text_col) - 2),
    ).otherwise(F.array().cast("array<int>"))
    return docs.select(
        F.col(id_col),
        F.explode(
            F.transform(idx, lambda i: F.col(text_col).substr(i, F.lit(3)))
        ).alias("tg"),
    )


def char_trigram_lm(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", q: int = 4096) -> DataFrame:
    """Estimate the order-2 character LM: for every corpus trigram
    ``c1c2c3``, ``p = (count(c1c2c3) + 1) / (count(c1c2*) + V)`` with
    V = distinct trigram types (add-one smoothing), returned as
    ``(tg string, qlp bigint)`` where ``qlp = floor(-log2(p)*q + 0.5)``
    — the integer-quantized surprise of seeing ``c3`` after ``c1c2``.
    Persist this table (the driver query stages it to parquet) and
    score any corpus against it with :func:`lm_score`."""
    tg = _trigrams(docs, text_col, id_col)
    tri = tg.groupBy("tg").agg(F.count(F.lit(1)).alias("c3"))
    v = tri.select(F.count(F.lit(1)).alias("v"))
    bi = (
        tri.select(F.substring("tg", 1, 2).alias("bg"), "c3")
        .groupBy("bg").agg(F.sum("c3").alias("c2"))
    )
    return (
        tri.withColumn("bg", F.substring("tg", 1, 2))
        .join(bi, "bg")
        .crossJoin(F.broadcast(v))
        .select(
            "tg",
            F.floor(
                -F.log2((F.col("c3") + 1).cast("double")
                        / (F.col("c2") + F.col("v")))
                * q + F.lit(0.5)
            ).cast("bigint").alias("qlp"),
        )
    )


def lm_score(docs: DataFrame, lm: DataFrame, text_col: str = "text",
             id_col: str = "doc_id", q: int = 4096,
             oov_qlp: int | None = None) -> DataFrame:
    """Score documents against a ``char_trigram_lm`` table: returns
    ``(id_col, n_trigrams bigint, sum_qlp bigint, bits_per_char
    double)`` where bits_per_char = sum_qlp / (n_trigrams * q) — the
    model's cross-entropy per character; HIGH values mean the corpus
    LM finds the text surprising (the ccnet quality signal, inverted:
    ccnet keeps the LOW-perplexity head/middle).  Docs with fewer than
    3 characters are excluded (no trigram evidence).  Trigrams absent
    from the model score ``oov_qlp`` (default: ceil of -log2 of the
    add-one floor, 24*q — a documented, deterministic penalty).
    Integer sums make the score partition-order-independent; the
    bits_per_char division is exact IEEE in every engine."""
    if oov_qlp is None:
        oov_qlp = 24 * q
    tg = _trigrams(docs, text_col, id_col)
    scored = tg.join(F.broadcast(lm), "tg", "left")
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.sum(F.coalesce("qlp", F.lit(oov_qlp))).alias("sum_qlp"),
        )
        .select(
            id_col,
            "n_trigrams",
            "sum_qlp",
            (F.col("sum_qlp") / (F.col("n_trigrams") * F.lit(float(q))))
            .alias("bits_per_char"),
        )
    )
