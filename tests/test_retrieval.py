"""BM25 retrieval: exactness vs a Python reference, two-level top-k
== serial, determinism under repartitioning, degenerate inputs."""

import math
import re

import pytest

from origami_spark.operators.retrieval import bm25_stats, bm25_topk

Q = 1_000_000


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _toks(t):
    return [x for x in re.split("[^a-z0-9]+", t.lower()) if x]


def _ref_bm25(rows, terms, k1=1.2, b=0.75):
    toks = {i: _toks(t) for i, t in rows}
    n = len(rows)
    total = sum(len(v) for v in toks.values())
    avgdl = total / n
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    qidf = {t: math.floor(
        math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0) * Q + 0.5)
        for t in terms}
    scores = {}
    for i, v in toks.items():
        s, matched = 0, 0
        for t in terms:
            tf = v.count(t)
            if not tf:
                continue
            matched += 1
            contrib = ((qidf[t] / Q)
                       * (tf * (k1 + 1.0)
                          / (tf + k1 * ((1.0 - b) + b * len(v) / avgdl))))
            s += math.floor(contrib * Q + 0.5)
        if matched:
            scores[i] = (matched, s)
    return scores, qidf, df, avgdl


ROWS = [
    (0, "spark window merge spark spark"),
    (1, "window window window and nothing else"),
    (2, "merge one mention in a long long long long long document"),
    (3, "no relevant vocabulary here at all"),
    (4, "spark window merge all three terms short"),
]
TERMS = ["spark", "window", "merge"]


def test_bm25_stats_matches_python_reference(spark):
    got = {r["term"]: (r["df"], r["qidf"], r["n_docs"], r["avgdl"])
           for r in bm25_stats(_docs(spark, ROWS), TERMS).collect()}
    _, qidf, df, avgdl = _ref_bm25(ROWS, TERMS)
    assert got == {t: (df[t], qidf[t], len(ROWS), avgdl) for t in TERMS}
    # a term absent from the corpus: df 0, idf at its maximum
    miss = {r["term"]: r["df"]
            for r in bm25_stats(_docs(spark, ROWS),
                                ["zzz"] + TERMS).collect()}
    assert miss["zzz"] == 0


def test_bm25_topk_exact_and_partition_independent(spark):
    docs = _docs(spark, ROWS)
    stats = bm25_stats(docs, TERMS)
    ref, *_ = _ref_bm25(ROWS, TERMS)
    got = {r["doc_id"]: (r["n_terms_matched"], r["score_q"])
           for r in bm25_topk(docs, stats, k=10).collect()}
    assert got == ref                  # doc 3 absent: no matched term
    ranked = [r["doc_id"]
              for r in bm25_topk(docs, stats, k=10)
              .orderBy("rk").collect()]
    want = sorted(ref, key=lambda i: (-ref[i][1], i))
    assert ranked == want
    again = [tuple(r) for r in bm25_topk(docs.repartition(7), stats, k=10)
             .orderBy("rk").collect()]
    first = [tuple(r) for r in bm25_topk(docs, stats, k=10)
             .orderBy("rk").collect()]
    assert again == first


def test_bm25_two_level_topk_equals_serial_cut(spark):
    """k smaller than the match count: the two-level hash-group top-k
    must return exactly the serial top-k (every group's top-k retains
    any global top-k member)."""
    rows = [(i, "spark " * (1 + i % 13) + "filler " * (i % 7))
            for i in range(200)]
    docs = _docs(spark, rows)
    stats = bm25_stats(docs, ["spark"])
    got = [(r["doc_id"], r["score_q"])
           for r in bm25_topk(docs, stats, k=9).orderBy("rk").collect()]
    ref, *_ = _ref_bm25(rows, ["spark"])
    want = sorted(((i, s) for i, (_, s) in ref.items()),
                  key=lambda x: (-x[1], x[0]))[:9]
    assert got == want


def test_bm25_empty_corpus_raises(spark):
    with pytest.raises(ValueError, match="non-empty"):
        bm25_stats(_docs(spark, [(0, "...")]), TERMS)


def test_bm25_duplicate_query_terms_deduped(spark):
    """Duplicate (or case-colliding) query terms must not inflate tf
    via duplicated stats rows."""
    docs = _docs(spark, ROWS)
    clean = sorted(map(tuple,
                       bm25_topk(docs, bm25_stats(docs, TERMS), k=10)
                       .collect()))
    dup = sorted(map(tuple,
                     bm25_topk(docs,
                               bm25_stats(docs, ["Spark", "spark", "SPARK"]
                                          + TERMS), k=10).collect()))
    assert clean == dup
