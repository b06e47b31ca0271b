"""Distributed BPE training/encoding vs a pure-Python reference
implementation (Sennrich et al. 2016 semantics): exact merge-sequence
equality including tie-breaks, exact encode counts, determinism under
repartitioning, and the early-stop contract."""

import re
from collections import Counter

import pyspark.sql.functions as F

from origami_spark.operators.bpe import (EOW, _encode_word, bpe_encode,
                                         bpe_merges_df, bpe_train,
                                         word_counts)


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string")


def _ref_word_counts(texts):
    c = Counter()
    for t in texts:
        c.update(w for w in re.split("[^a-z0-9]+", t.lower()) if w)
    return c


def _ref_train(wc, n_merges, min_pair_count=2):
    syms = {w: list(w) + [EOW] for w in wc}
    merges = []
    for _ in range(n_merges):
        stats = Counter()
        for w, s in syms.items():
            for i in range(len(s) - 1):
                stats[(s[i], s[i + 1])] += wc[w]
        if not stats:
            break
        best = min(stats, key=lambda p: (-stats[p], p))
        if stats[best] < min_pair_count:
            break
        a, b = best
        merges.append(best)
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges


def _ref_train_batched_rounds(wc, n_merges, batch, min_pair_count=2):
    """Pure-Python mirror of the batched round: full pair counts,
    sorted by (count DESC, left, right), top 8*k window, greedy
    disjoint-symbol selection, all accepted merges applied in one
    pass in accepted order.  Returns the per-round pair lists."""
    syms = {w: list(w) + [EOW] for w in wc}
    rounds = []

    def apply(pair):
        a, b = pair
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out

    done = 0
    while done < n_merges:
        k = min(batch, n_merges - done)
        stats = Counter()
        for w, s in syms.items():
            for i in range(len(s) - 1):
                stats[(s[i], s[i + 1])] += wc[w]
        window = sorted(stats, key=lambda p: (-stats[p], p))[:max(8 * k, 8)]
        chosen, used = [], set()
        for a, b in window:
            if stats[(a, b)] < min_pair_count:
                break
            if a in used or b in used or (a + b) in used:
                continue
            chosen.append((a, b))
            used.update((a, b, a + b))
            if len(chosen) >= k:
                break
        if not chosen:
            break
        rounds.append(chosen)
        done += len(chosen)
        for pair in chosen:
            apply(pair)
    return rounds


def _ref_train_batched(wc, n_merges, batch, min_pair_count=2):
    return [p for rnd in _ref_train_batched_rounds(
        wc, n_merges, batch, min_pair_count) for p in rnd]


TEXTS = ["the lower the newer the wider",
         "low lower lowest new newer newest",
         "wide wider widest low low low new new",
         "the the the lowest newest widest"]


def test_train_matches_python_reference(spark):
    docs = _docs(spark, TEXTS)
    got = bpe_train(docs, n_merges=25)
    want = _ref_train(_ref_word_counts(TEXTS), 25)
    assert got == want
    assert len(got) > 5  # the corpus supports a real merge sequence


def test_train_batched_matches_batched_reference(spark):
    """batch>1 is the documented approximation: Spark must equal the
    batched pure-Python mirror pair-for-pair (same window, same
    disjoint-symbol greedy, same in-round application order)."""
    docs = _docs(spark, TEXTS)
    wc = _ref_word_counts(TEXTS)
    for batch in (2, 4, 8):
        got = bpe_train(docs, n_merges=20, batch=batch, min_pair_count=1)
        want = _ref_train_batched(wc, 20, batch, min_pair_count=1)
        assert got == want, (batch, got, want)
        assert len(got) > 5


def test_train_batch1_is_exactly_serial(spark):
    """batch=1 through the batched code path is the serial Sennrich
    sequence (the batched mirror with k=1 degenerates to it too)."""
    docs = _docs(spark, TEXTS)
    wc = _ref_word_counts(TEXTS)
    serial = _ref_train(wc, 12)
    assert bpe_train(docs, n_merges=12, batch=1) == serial
    assert _ref_train_batched(wc, 12, 1) == serial


def test_train_batched_disjointness_within_round():
    """No round may contain two pairs sharing a symbol (or a pair
    consuming another's concatenation) — the commutation invariant
    that makes one-pass application well-defined."""
    wc = _ref_word_counts(TEXTS)
    rounds = _ref_train_batched_rounds(wc, 24, 4, min_pair_count=1)
    assert sum(len(r) for r in rounds) > 8
    for rnd in rounds:
        used = set()
        for a, b in rnd:
            assert a not in used and b not in used and (a + b) not in used
            used.update((a, b, a + b))


def test_train_tie_break_and_overlap(spark):
    # 'aaaa' x3: (a,a) count = 9 (every adjacent position, overlaps
    # included); the greedy fold leaves [aa, aa, </w>], so round 2 is
    # a TIE at 3 between (aa, aa) and (aa, </w>) — broken
    # lexicographically ('</w>' < 'aa'), exactly like the reference
    texts = ["aaaa aaaa aaaa"]
    docs = _docs(spark, texts)
    got = bpe_train(docs, n_merges=3, min_pair_count=1)
    want = _ref_train(_ref_word_counts(texts), 3, min_pair_count=1)
    assert got == want
    assert got[0] == ("a", "a") and got[1] == ("aa", EOW)


def test_train_early_stop_on_rare_pairs(spark):
    # every word unique, each pair weight 1 -> min_pair_count=2 learns
    # only the pairs shared across words
    texts = ["ab cd ef"]
    docs = _docs(spark, texts)
    got = bpe_train(docs, n_merges=10, min_pair_count=2)
    assert got == _ref_train(_ref_word_counts(texts), 10)


def test_encode_matches_reference_and_roundtrips(spark):
    docs = _docs(spark, TEXTS + ["", "!!!"])
    merges = bpe_train(docs, n_merges=15)
    ranks = {m: i for i, m in enumerate(merges)}
    mdf = bpe_merges_df(spark, merges)

    def ref_count(text):
        words = [w for w in re.split("[^a-z0-9]+", text.lower()) if w]
        n_bpe = sum(len(_encode_word(w, ranks)) for w in words)
        return (len(words), n_bpe,
                n_bpe / len(words) if words else 0.0)

    got = {r["doc_id"]: (r["n_words"], r["n_bpe_tokens"], r["bpe_per_word"])
           for r in bpe_encode(docs, mdf).collect()}
    want = {i: ref_count(t) for i, t in enumerate(TEXTS + ["", "!!!"])}
    assert got == want
    # zero-token docs are total (0s, not missing)
    assert got[4] == (0, 0, 0.0) and got[5] == (0, 0, 0.0)
    again = {r["doc_id"]: (r["n_words"], r["n_bpe_tokens"], r["bpe_per_word"])
             for r in bpe_encode(docs.repartition(5), mdf).collect()}
    assert again == got
    # every encoded word reassembles exactly
    for w in ("lower", "newest", "the", "zzz9"):
        assert "".join(_encode_word(w, ranks)) == w + EOW


def test_word_counts_shape(spark):
    docs = _docs(spark, ["a b a", "b! A?"])
    got = {r["word"]: r["n"] for r in word_counts(docs).collect()}
    assert got == {"a": 3, "b": 2}
