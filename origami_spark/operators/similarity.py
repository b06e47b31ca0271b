"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — brute-force exact top-k: query set broadcast against
  the corpus, cosine via zip_with/aggregate (JVM-side), window top-k.
  The baseline and the verifier for the approximate path.
* ``lsh_topk`` — random-hyperplane LSH: deterministic pseudo-random
  hyperplanes derived from the portable md5 hash, sign-bit signatures,
  bucket-equality candidate join, exact cosine re-rank inside buckets.
  At 10^12 rows the bucket join is the only shuffle and each bucket is
  small; multiple hash tables raise recall.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cosine(a: str, b: str):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0).cast("double"), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def cosine_topk(emb: DataFrame, query_ids, k: int = 5) -> DataFrame:
    """Exact top-k neighbours for the given query vec_ids (excluding
    self).  Query side is tiny -> broadcast join, no shuffle of the
    corpus."""
    e = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    q = e.filter(F.col("vec_id").isin(list(query_ids))).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(_cosine("qv", "embedding"), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= k)
        .select("query_id", "vec_id", "cosine", "rk")
    )


def plane_coefficients(planes: int, dim: int) -> list:
    """Deterministic pseudo-random hyperplane components in [-1, 1]:
    coeff(p, d) = ((md5-hash60("p|d") mod 2001) - 1000) / 1000.

    Computed driver-side once and inlined as literals, so any engine
    (the DuckDB oracle included) reproduces identical signatures."""
    import hashlib

    return [
        [
            ((int(hashlib.md5(f"{p}|{d}".encode()).hexdigest()[:15], 16)
              % 2001) - 1000) / 1000.0
            for d in range(dim)
        ]
        for p in range(planes)
    ]


def hyperplane_signature(emb: DataFrame, planes: int = 8,
                         dim: int = 64) -> DataFrame:
    """Sign-bit signature per vector from deterministic hyperplanes."""
    coeffs = plane_coefficients(planes, dim)
    bit_exprs = []
    for p in range(planes):
        dot = None
        for d in range(dim):
            term = F.element_at("embedding", d + 1).cast("double") * F.lit(coeffs[p][d])
            dot = term if dot is None else dot + term
        bit_exprs.append(F.when(dot >= 0, 1).otherwise(0).alias(f"b{p}"))
    sig = None
    for p in range(planes):
        term = F.col(f"b{p}") * F.lit(1 << p)
        sig = term if sig is None else sig + term
    return emb.select("vec_id", "embedding", *bit_exprs).select(
        "vec_id", "embedding", sig.alias("bucket")
    )


def lsh_topk(emb: DataFrame, query_ids, k: int = 5, planes: int = 8) -> DataFrame:
    """Approximate top-k: candidates share the query's hyperplane bucket,
    exact cosine re-rank within."""
    dim = 64
    signed = hyperplane_signature(emb, planes, dim)
    q = signed.filter(F.col("vec_id").isin(list(query_ids))).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    cand = signed.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("query_id")),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        cand.select(
            "query_id", "vec_id",
            F.round(_cosine("qv", "embedding"), 4).alias("cosine"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "vec_id", "cosine", "rk")
    )
