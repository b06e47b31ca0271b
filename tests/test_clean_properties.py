"""Invariant sweep for the cleaning/sampling/host/paragraph family over
an adversarial corpus: crafted edge cases plus seeded random unicode.

One Spark pass per operator (hypothesis-per-example would pay a job per
example); the corpus is deterministic so failures reproduce.
"""

import random

import pyspark.sql.functions as F

EDGE = [
    "",
    " ",
    "\n",
    "\n\n\n\n",
    "   \n\t\n   ",
    "a",
    "a " * 5000,                      # long repetitive
    "x" * 10000,                      # one huge token
    "line\n" * 200,                   # many identical lines
    "Ünïcodé tëxt with àccents.\nNaïve façade.",
    "日本語のテキストです。\n中文文本在这里。",
    "emoji 😀😃😄 line.\nanother 🎉 line!",
    "combining á é í.",
    "tab\tsep\tvals\nmore\ttabs",
    'quotes "everywhere" \'here\' too.',
    "<html><p>not actually parsed</p>",
    "ends with space \nnext line",
    " nbsp line .",
    "mail x@y.zz and 1.2.3.4 and 123456789012",
    "a b\r\nc d\r\n",                 # CRLF
]


def _adversarial_docs(spark, n_random=150):
    rng = random.Random(42)
    alphabets = [
        "abcdefghij ",
        "abc.!?\n\"' ",
        "αβγδε ζηθ\n",
        "0123456789.@ ",
        "ab\ncd\n\n",
    ]
    texts = list(EDGE)
    for _ in range(n_random):
        alpha = rng.choice(alphabets)
        texts.append("".join(rng.choice(alpha)
                             for _ in range(rng.randrange(0, 400))))
    rows = [(i, t, f"src{i % 5}") for i, t in enumerate(texts)]
    return spark.createDataFrame(rows, "doc_id bigint, text string, source string")


def test_repetition_stats_invariants(spark):
    from origami_spark.operators.clean import repetition_stats

    rows = repetition_stats(_adversarial_docs(spark)).collect()
    assert rows
    for r in rows:
        assert r["n_lines"] >= 0
        for c in ("dup_line_frac", "dup_line_char_frac", "dup_5gram_frac"):
            assert 0.0 <= r[c] <= 1.0, (r["doc_id"], c, r[c])
        # overlapping occurrences make the top-2gram share exceed 1 on
        # degenerate repetition ("a a a a"), but never negative/absurd
        assert 0.0 <= r["top_2gram_frac"] <= 2.0, r
        assert r["top_2gram"] is not None


def test_clean_lines_invariants(spark):
    from origami_spark.operators.clean import clean_lines

    docs = _adversarial_docs(spark)
    out = clean_lines(docs).collect()
    for r in out:
        assert r["n_kept"] >= 0 and r["n_dropped"] >= 0
        kept_lines = r["clean_text"].split("\n") if r["clean_text"] else []
        assert len(kept_lines) == r["n_kept"], r["doc_id"]
        if not r["page_ok"]:
            assert r["n_kept"] == 0 and r["clean_text"] == ""
        for ln in kept_lines:
            assert ln and ln[-1] in '.!?"', (r["doc_id"], ln)
            assert "javascript" not in ln.lower()


def test_pii_scrub_idempotent_and_complete(spark):
    import re

    from origami_spark.operators.clean import EMAIL_RE, pii_scrub

    docs = _adversarial_docs(spark)
    once = pii_scrub(docs).withColumnRenamed("scrubbed", "text") \
        .select("doc_id", "text")
    twice = pii_scrub(once)
    email = re.compile(EMAIL_RE)
    for r in twice.collect():
        # a second pass finds nothing: the first one was complete and
        # the placeholders don't re-match
        assert (r["n_emails"], r["n_ips"], r["n_longnums"]) == (0, 0, 0), r
        assert not email.search(r["scrubbed"]), r


def test_gopher_gate_invariants(spark):
    from origami_spark.operators.clean import gopher_gate

    names = {"too_few_tokens", "too_many_tokens", "mean_len_low",
             "mean_len_high", "too_few_stopwords", "dup_lines",
             "dup_line_chars", "top_2gram", "dup_5grams"}
    for r in gopher_gate(_adversarial_docs(spark)).collect():
        reasons = [x for x in r["reasons"].split(",") if x]
        assert r["keep"] == (not reasons)
        assert set(reasons) <= names, r
        assert len(reasons) == len(set(reasons))


def test_paragraph_dedup_invariants(spark):
    from origami_spark.operators.dedup import paragraph_dedup

    docs = _adversarial_docs(spark)
    orig = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in paragraph_dedup(docs).collect():
        assert 0 <= r["n_dropped"] <= r["n_paras"]
        ws = " \t\r\f\v\xa0"  # the operator's portable strip class
        original_paras = {p.strip(ws) for p in orig[r["doc_id"]].split("\n")
                          if p.strip(ws)}
        for p in (r["kept_text"].split("\n") if r["kept_text"] else []):
            assert p in original_paras, (r["doc_id"], p)


def test_sampling_invariants(spark):
    from origami_spark.operators.sampling import hash_sample, token_budget

    docs = _adversarial_docs(spark)
    assert hash_sample(docs, 1.0).count() == docs.count()
    assert hash_sample(docs, 0.0).count() == 0
    tb = token_budget(docs, 100).collect()
    per_src_max = {}
    for r in tb:
        # zero-token docs pass through at unchanged cum (they cost
        # nothing) — the bound is on cum, not on positivity
        assert 0 <= r["cum_tokens"] <= 100
        per_src_max[r["source"]] = max(per_src_max.get(r["source"], 0),
                                       r["cum_tokens"])
    assert per_src_max  # some source fits something under the budget


def test_host_cap_invariants(spark):
    from origami_spark.operators.hosts import host_cap

    rows = [(f"https://h{i % 4}.com/{i}", "t") for i in range(40)]
    rows += [("no scheme at all", "t"), ("", "t")]
    pages = spark.createDataFrame(rows, "url string, text string")
    out = host_cap(pages, k=3)
    counts = {r["host"]: r["count"]
              for r in out.groupBy("host").count().collect()}
    for h, c in counts.items():
        assert c <= 3, (h, c)
