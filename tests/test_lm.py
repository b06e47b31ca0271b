"""Corpus char-trigram LM: exactness vs a Python reference, the
integer-sum determinism contract, and the quality signal itself."""

import math

import pyspark.sql.functions as F

from origami_spark.operators.lm import char_trigram_lm, lm_buckets, lm_score

Q = 4096


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _ref_lm(texts):
    tri, bi = {}, {}
    for t in texts:
        for i in range(len(t) - 2):
            g = t[i:i + 3]
            tri[g] = tri.get(g, 0) + 1
    for g, c in tri.items():
        bi[g[:2]] = bi.get(g[:2], 0) + c
    v = len(tri)
    return {
        g: math.floor(-math.log2((c + 1) / (bi[g[:2]] + v)) * Q + 0.5)
        for g, c in tri.items()
    }


def test_lm_matches_python_reference(spark):
    texts = ["abcabcabd", "the cat sat", "zz"]
    docs = _docs(spark, list(enumerate(texts)))
    rows = char_trigram_lm(docs).collect()
    assert {r["tg"]: r["qlp"] for r in rows} == _ref_lm(texts)
    assert {r["q"] for r in rows} == {Q}   # quantization travels along


def test_lm_score_exact_and_deterministic(spark):
    texts = ["abcabcabd", "the cat sat", "abc the"]
    docs = _docs(spark, list(enumerate(texts)))
    lm = char_trigram_lm(docs)
    ref = _ref_lm(texts)

    def score(t):
        gs = [t[i:i + 3] for i in range(len(t) - 2)]
        s = sum(ref[g] for g in gs)
        return len(gs), s, s / (len(gs) * float(Q))

    got = {r["doc_id"]: (r["n_trigrams"], r["sum_qlp"], r["bits_per_char"])
           for r in lm_score(docs, lm).collect()}
    assert got == {i: score(t) for i, t in enumerate(texts)}
    # integer sums: identical under any partitioning
    again = {r["doc_id"]: (r["n_trigrams"], r["sum_qlp"], r["bits_per_char"])
             for r in lm_score(docs.repartition(7), lm).collect()}
    assert again == got


def test_short_docs_excluded_and_oov_penalized(spark):
    lm_docs = _docs(spark, [(0, "abcdefg")])
    lm = char_trigram_lm(lm_docs)
    batch = _docs(spark, [(1, "ab"), (2, "abc"), (3, "xyz")])
    got = {r["doc_id"]: r for r in lm_score(batch, lm).collect()}
    assert 1 not in got                      # < 3 chars: no evidence
    # OOV = one bit beyond the least likely SEEN trigram — always the
    # most surprising outcome, never invertible by the smoothing floor
    max_qlp = max(_ref_lm(["abcdefg"]).values())
    assert got[3]["sum_qlp"] == max_qlp + Q  # fully out-of-vocabulary
    assert got[2]["sum_qlp"] < got[3]["sum_qlp"]
    assert max(r["qlp"] for r in lm.collect()) < got[3]["sum_qlp"]


def test_bits_per_char_separates_natural_from_gibberish(spark):
    """The ccnet signal: text drawn from the corpus distribution
    scores LOWER cross-entropy than character soup."""
    base = [(i, f"the quick brown fox number {i} jumps over the lazy "
                f"dog and then the cat sat on the mat again")
            for i in range(30)]
    lm = char_trigram_lm(_docs(spark, base))
    probe = _docs(spark, [
        (100, "the quick brown fox jumps over the lazy dog"),
        (101, "qzxj vwpk fhgr mlnt bzdc qqqq xkcd zzzz wxyz"),
    ])
    got = {r["doc_id"]: r["bits_per_char"]
           for r in lm_score(probe, lm).collect()}
    assert got[100] < got[101] / 2


def test_lm_plan_is_broadcast_join_no_python(spark):
    docs = _docs(spark, [(i, f"document {i} text body") for i in range(50)])
    out = lm_score(docs, char_trigram_lm(docs))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def _scored(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, bits_per_char double")


def _ref_buckets(rows, buckets=3):
    order = sorted(rows, key=lambda r: (r[1], r[0]))
    n = len(order)
    return {
        d: (rk + 1, (rk * buckets) // n + 1)
        for rk, (d, _) in enumerate(order)
    }


def test_lm_buckets_matches_serial_reference(spark):
    """Decomposed 256-bins-per-bit rank == serial sort rank, ties on
    bits_per_char broken by doc_id, equal-count thirds."""
    rows = [(i, [2.5, 0.75, 2.5, 9.0, 0.25, 4.125][i % 6] + (i // 6) * 0.01)
            for i in range(24)]
    got = {r["doc_id"]: (r["lm_rank"], r["lm_bucket"])
           for r in lm_buckets(_scored(spark, rows)).collect()}
    assert got == _ref_buckets(rows)
    # exact ties everywhere: one bin, id breaks the order
    ties = [(i, 1.5) for i in range(9)]
    got = {r["doc_id"]: (r["lm_rank"], r["lm_bucket"])
           for r in lm_buckets(_scored(spark, ties)).collect()}
    assert got == {i: (i + 1, i // 3 + 1) for i in range(9)}


def test_lm_buckets_partitioning_invariant(spark):
    rows = [(i, float((i * 37) % 11) / 3.0) for i in range(40)]
    base = sorted(lm_buckets(_scored(spark, rows)).collect())
    again = sorted(
        lm_buckets(_scored(spark, rows).repartition(13)).collect())
    assert base == again


def test_lm_buckets_uneven_split_boundaries(spark):
    """n not divisible by buckets: floor math puts the extras where the
    serial formulation puts them (first buckets get the smaller share
    when n=7, k=3 -> sizes 2,2,3 via floor((rank-1)*3/7))."""
    rows = [(i, float(i)) for i in range(7)]
    got = {r["doc_id"]: r["lm_bucket"]
           for r in lm_buckets(_scored(spark, rows)).collect()}
    assert got == {0: 1, 1: 1, 2: 1, 3: 2, 4: 2, 5: 3, 6: 3}
    assert got == {d: b for d, (_, b) in _ref_buckets(rows).items()}


def test_lm_buckets_window_is_partitioned(spark):
    """The per-doc rank window must partition by the value bin — no
    single-partition window over the document rows (the small prefix
    window over the per-bin aggregate is the only global one)."""
    rows = [(i, float((i * 37) % 11) / 3.0) for i in range(40)]
    out = lm_buckets(_scored(spark, rows))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "row_number" in plan
    import re
    # every row_number window spec carries a partition key (_g#..)
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        spec = m.group(1)
        if "row_number" not in plan[max(0, m.start() - 200):m.start()]:
            continue
        assert "_g#" in spec, spec
    assert "BatchEvalPython" not in plan


def test_lm_buckets_end_to_end_orders_by_surprise(spark):
    """Pipeline shape: natural text lands in an earlier bucket than
    hex soup when scored and bucketed against the corpus model."""
    base = [(i, f"the quick brown fox number {i} jumps over the lazy "
                f"dog and then the cat sat on the mat again")
            for i in range(12)]
    soup = [(100 + i, f"qzxj{i:x} vwpk fhgr mlnt bzdc xkcd wxyz {i:x}qj")
            for i in range(6)]
    docs = _docs(spark, base + soup)
    scored = lm_score(docs, char_trigram_lm(docs))
    got = {r["doc_id"]: r["lm_bucket"]
           for r in lm_buckets(scored).collect()}
    assert max(got[i] for i, _ in base) <= min(got[i] for i, _ in soup)
