"""Deterministic sampling + token budgeting (operators/sampling.py)."""

from origami_spark.operators.sampling import (
    hash_sample,
    stratified_sample,
    token_budget,
)

SF = "/root/testdata/sf0.001"


def test_hash_sample_is_deterministic_and_nested(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = {r["doc_id"] for r in hash_sample(docs, 0.3).select("doc_id").collect()}
    b = {r["doc_id"] for r in
         hash_sample(docs.repartition(13), 0.3).select("doc_id").collect()}
    assert a == b  # partitioning-independent
    small = {r["doc_id"] for r in
             hash_sample(docs, 0.1).select("doc_id").collect()}
    assert small <= a  # threshold sampling nests across rates
    other = {r["doc_id"] for r in
             hash_sample(docs, 0.3, seed="s1").select("doc_id").collect()}
    assert other != a  # a new seed draws an independent sample
    # rate is approximately honored
    assert 0.2 < len(a) / docs.count() < 0.4


def test_stratified_sample_rates(spark):
    rows = [(i, f"src{i % 3}") for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id bigint, source string")
    out = stratified_sample(docs, "source",
                            {"src0": 1.0, "src1": 0.0}, default_rate=0.5)
    by_src = {r["source"]: r["count"] for r in
              out.groupBy("source").count().collect()}
    assert by_src.get("src0") == 100   # rate 1.0: everything
    assert "src1" not in by_src        # rate 0.0: nothing
    assert 20 < by_src.get("src2", 0) < 80  # default 0.5


def test_token_budget_prefix_cut(spark):
    # one source, three docs of 4 tokens each, budget 9 -> exactly the
    # first two docs in hash order are kept and cum_tokens is exact
    rows = [(i, "s", "a b c d") for i in range(3)]
    docs = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    out = token_budget(docs, 9).orderBy("cum_tokens").collect()
    assert [r["cum_tokens"] for r in out] == [4, 8]
    assert all(r["n_tokens"] == 4 for r in out)
    # zero budget keeps nothing; huge budget keeps everything
    assert token_budget(docs, 0).count() == 0
    assert token_budget(docs, 100).count() == 3


def test_token_budget_is_per_group_and_deterministic(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = token_budget(docs, 500)
    b = token_budget(docs.repartition(17), 500)
    ka = sorted(r["doc_id"] for r in a.collect())
    kb = sorted(r["doc_id"] for r in b.collect())
    assert ka == kb
    # every source respects its own budget
    import pyspark.sql.functions as F

    worst = a.groupBy("source").agg(F.max("cum_tokens").alias("m")) \
        .agg(F.max("m")).collect()[0][0]
    assert worst <= 500
    assert a.select("source").distinct().count() > 1


def test_token_budget_decomposed_equals_serial_per_source(spark):
    """The per-source budget is now the same decomposed prefix sum as
    the global one (VERDICT r3 item 3): it must equal the naive
    one-window-per-source form exactly, including on an adversarial
    corpus that is 100% one source."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from origami_spark.operators.sampling import _bucket
    from origami_spark.operators.text import tokens_col

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    one_src = docs.withColumn("source", F.lit("only"))
    for frame, budget in ((docs, 500), (one_src, 2500)):
        got = {(r["doc_id"], r["source"]): r["cum_tokens"]
               for r in token_budget(frame, budget).collect()}
        serial = frame.select(
            "doc_id", "source",
            F.size(tokens_col()).cast("bigint").alias("n_tokens"),
            _bucket("doc_id", "s0").alias("_b"),
        )
        w = Window.partitionBy("source").orderBy("_b", "doc_id").rowsBetween(
            Window.unboundedPreceding, Window.currentRow)
        want = {
            (r["doc_id"], r["source"]): r["cum"]
            for r in serial.withColumn("cum", F.sum("n_tokens").over(w))
            .filter(F.col("cum") <= budget).collect()
        }
        assert got == want and 0 < len(got) < frame.count()


def test_token_budget_one_source_spreads_over_groups(spark):
    """Adversarial skew: with every doc in ONE source, the running sum
    must not serialize on one window partition — the within-group
    windows partition on (source, _g) and no hash group holds more
    than 2/groups of the rows (VERDICT r3 item 3 'done' criterion)."""
    import pyspark.sql.functions as F

    from origami_spark.operators.sampling import _SCALE, _bucket

    n, groups = 2000, 64
    rows = [(i, "only", "tok " * 5) for i in range(n)]
    docs = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    out = token_budget(docs, 10**9, groups=groups)
    # value sanity: everything kept under an unlimited budget
    assert out.count() == n
    # the physical partitioning key is (source, _g): measure the actual
    # group occupancy the window tasks would see
    occ = (
        docs.select(
            F.floor(_bucket("doc_id", "s0") * groups / _SCALE).alias("g"))
        .groupBy("g").count().collect()
    )
    assert len(occ) == groups
    assert max(r["count"] for r in occ) <= 2 * n / groups
    # and the executed plan carries the decomposed (source, _g) window
    # key for the per-doc running sum (a source-only hashpartitioning
    # also exists, but only over the `groups`-row prefix aggregate)
    import re

    plan = out._jdf.queryExecution().executedPlan().toString()
    keys = re.findall(r"hashpartitioning\(source#\d+(, _g#\d+)?", plan)
    assert any(k.startswith(", _g") for k in keys), plan


def test_token_budget_keeps_null_source_group(spark):
    """A NULL source is a legitimate budget group (window semantics in
    both engines group NULLs together) — the decomposition's prefix
    join must not drop it (eqNullSafe)."""
    rows = [(i, None, "a b c d e") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    out = token_budget(docs, 25).collect()
    assert sorted(r["cum_tokens"] for r in out) == [5, 10, 15, 20, 25]
    assert all(r["source"] is None for r in out)


def test_token_budget_global_equals_serial_prefix_cut(spark):
    """The decomposed (group-offset + per-group window) form must equal
    the naive single-window global prefix cut exactly."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from origami_spark.operators.sampling import (
        _bucket,
        token_budget_global,
    )
    from origami_spark.operators.text import tokens_col

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = {r["doc_id"]: r["cum_tokens"]
           for r in token_budget_global(docs, 2500).collect()}

    serial = docs.select(
        "doc_id",
        F.size(tokens_col()).cast("bigint").alias("n_tokens"),
        _bucket("doc_id", "s0").alias("_b"),
    )
    w = Window.orderBy("_b", "doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    want = {
        r["doc_id"]: r["cum"]
        for r in serial.withColumn("cum", F.sum("n_tokens").over(w))
        .filter(F.col("cum") <= 2500).collect()
    }
    assert got == want and 0 < len(got) < docs.count()


def test_token_budget_global_deterministic_across_parallelism(spark):
    from origami_spark.operators.sampling import token_budget_global

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = sorted(r["doc_id"] for r in token_budget_global(docs, 2500).collect())
    b = sorted(r["doc_id"] for r in
               token_budget_global(docs.repartition(11), 2500).collect())
    assert a == b


def test_token_budgets_exclude_null_ids(spark):
    """A NULL doc_id must not consume budget (Spark would sort it NULLS
    FIRST while the oracle sorts it last — both budget operators filter
    it out instead)."""
    from origami_spark.operators.sampling import (
        token_budget,
        token_budget_global,
    )

    rows = [(i, "s", "a b c d e") for i in range(10)] + \
           [(None, "s", "x " * 400)]
    docs = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    per_src = token_budget(docs, 25).collect()
    assert sorted(r["cum_tokens"] for r in per_src) == [5, 10, 15, 20, 25]
    assert all(r["doc_id"] is not None for r in per_src)
    glob = token_budget_global(docs, 25).collect()
    assert sorted(r["cum_tokens"] for r in glob) == [5, 10, 15, 20, 25]
    assert all(r["doc_id"] is not None for r in glob)


def test_shuffle_order_decomposed_equals_serial(spark):
    """shuffle_order == the serial single-window rank over the same
    (hash, id) order; deterministic across partitionings; positions a
    dense 1..n permutation."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from origami_spark.operators.sampling import _hash_order, shuffle_order

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = {r["doc_id"]: r["shuffle_pos"]
           for r in shuffle_order(docs).collect()}
    serial = {
        r["doc_id"]: r["pos"]
        for r in docs.select(
            "doc_id", _hash_order("doc_id", "s0").alias("_h"))
        .withColumn("pos", F.row_number().over(
            Window.orderBy("_h", "doc_id")).cast("bigint"))
        .collect()
    }
    assert got == serial
    assert sorted(got.values()) == list(range(1, len(got) + 1))
    again = {r["doc_id"]: r["shuffle_pos"]
             for r in shuffle_order(docs.repartition(13)).collect()}
    assert again == got


def test_shuffle_order_no_single_partition_window(spark):
    """The rank windows partition on the hash-range group — the
    executed plan must not contain an empty-key (global) window
    exchange over the doc rows."""
    from origami_spark.operators.sampling import shuffle_order

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = shuffle_order(docs)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # AQE toString echoes the initial plan after the final one —
    # assert over the final section only
    plan = plan.split("== Initial Plan ==")[0]
    assert "hashpartitioning(_g" in plan, plan
    # the only SinglePartition exchange allowed is the `groups`-row
    # prefix aggregate; the doc-row window must never use it
    assert plan.count("Exchange SinglePartition") <= 1, plan


def test_interleave_sources_weighted_prefixes(spark):
    """Sorting by emit_key yields weight-proportional source shares in
    every aligned prefix; unlisted sources are excluded; positions are
    dense per source."""
    from origami_spark.operators.sampling import interleave_sources

    rows = [(i, f"s{i % 4}", "x") for i in range(400)]
    docs = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    w = {"s0": 3.0, "s1": 1.0}
    out = interleave_sources(docs, w).collect()
    assert {r["source"] for r in out} == {"s0", "s1"}
    per = {s: sorted(r["src_pos"] for r in out if r["source"] == s)
           for s in ("s0", "s1")}
    assert per["s0"] == list(range(1, 101))
    assert per["s1"] == list(range(1, 101))
    # emit order: after the first 4k emissions (aligned prefix), s0 has
    # emitted 3x s1's count (exactly: s0 pos p emits at p/3, s1 at p)
    ordered = sorted(out, key=lambda r: (r["emit_key"], r["source"],
                                         r["doc_id"]))
    head = ordered[:40]
    assert sum(1 for r in head if r["source"] == "s0") == 30
    assert sum(1 for r in head if r["source"] == "s1") == 10
    # exact key law
    for r in out:
        assert r["emit_key"] == r["src_pos"] / w[r["source"]]


def test_pack_sequences_equals_serial_packing(spark):
    """The decomposed pack assignment must equal the naive
    single-window serial packing exactly: pack_id/pack_offset from the
    serial exclusive prefix in (hash, id) order."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from origami_spark.operators.sampling import _bucket, pack_sequences
    from origami_spark.operators.text import tokens_col

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = {r["doc_id"]: (r["pack_id"], r["pack_offset"])
           for r in pack_sequences(docs, seq_len=128).collect()}

    serial = docs.select(
        "doc_id",
        F.size(tokens_col()).cast("bigint").alias("n_tokens"),
        _bucket("doc_id", "s0").alias("_b"),
    )
    w = Window.orderBy("_b", "doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    excl = F.col("cum") - F.col("n_tokens")
    want = {
        r["doc_id"]: (r["p"], r["o"])
        for r in serial.withColumn("cum", F.sum("n_tokens").over(w))
        .select("doc_id",
                F.floor(excl / 128).cast("bigint").alias("p"),
                (excl % 128).cast("bigint").alias("o")).collect()
    }
    assert got == want and len(got) == docs.count()
    # real packing happened: several packs, offsets inside the sequence
    packs = {p for p, _ in got.values()}
    assert len(packs) > 1
    assert all(0 <= o < 128 for _, o in got.values())


def test_pack_sequences_long_doc_spans_packs(spark):
    """A doc longer than seq_len occupies several packs: the next doc
    starts in a LATER pack, and continuation packs contain no starting
    doc (pack ids can skip)."""
    docs = spark.createDataFrame(
        [(1, "w " * 50), (2, "x " * 500), (3, "y " * 50), (4, "")],
        "doc_id long, text string")
    from origami_spark.operators.sampling import pack_sequences

    out = {r["doc_id"]: (r["pack_id"], r["pack_offset"])
           for r in pack_sequences(docs, seq_len=100).collect()}
    assert len(out) == 4  # empty text => 0 tokens, still placed
    by_order = sorted(out.values())
    # total tokens 600 over seq_len 100 => starts spread over >2 packs
    assert by_order[-1][0] >= 2


def test_pack_sequences_excludes_null_ids(spark):
    from origami_spark.operators.sampling import pack_sequences

    docs = spark.createDataFrame(
        [(1, "a b c"), (None, "d e f")], "doc_id long, text string")
    out = pack_sequences(docs, seq_len=4).collect()
    assert [r["doc_id"] for r in out] == [1]


def test_split_assign_is_stable_under_growth_and_partitioning(spark):
    """Every doc keeps its split when the corpus grows or repartitions;
    weights land near-exact; bad weights raise."""
    import pytest

    from origami_spark.operators.sampling import split_assign

    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(4000)], "doc_id bigint, text string")
    small = {r["doc_id"]: r["split"]
             for r in split_assign(docs.limit(1000),
                                   [("train", 0.8), ("val", 0.1),
                                    ("test", 0.1)]).collect()}
    full = {r["doc_id"]: r["split"]
            for r in split_assign(docs.repartition(13),
                                  [("train", 0.8), ("val", 0.1),
                                   ("test", 0.1)]).collect()}
    assert all(full[i] == s for i, s in small.items())
    from collections import Counter
    c = Counter(full.values())
    assert 0.77 < c["train"] / 4000 < 0.83
    assert 0.07 < c["val"] / 4000 < 0.13
    assert 0.07 < c["test"] / 4000 < 0.13
    # a different seed redraws; identical seed reproduces exactly
    redraw = {r["doc_id"]: r["split"]
              for r in split_assign(docs, [("train", 0.8), ("val", 0.1),
                                           ("test", 0.1)],
                                    seed="s1").collect()}
    assert redraw != full
    with pytest.raises(ValueError, match="sum to 1"):
        split_assign(docs, [("a", 0.5), ("b", 0.2)])


def test_split_assign_rejects_bad_weights_and_drops_null_ids(spark):
    import pytest

    from origami_spark.operators.sampling import split_assign

    docs = spark.createDataFrame(
        [(1, "a"), (None, "ghost"), (2, "b")],
        "doc_id bigint, text string")
    out = split_assign(docs).collect()
    # NULL-id convention: the row filters out, never lands in a split
    assert {r["doc_id"] for r in out} == {1, 2}
    with pytest.raises(ValueError, match="positive"):
        split_assign(docs, [("a", 1.1), ("b", -0.2), ("c", 0.1)])


def test_upsample_sources_exact_reference(spark):
    """Exact copy-count parity with a pure-Python reference: full
    epochs repeat every doc, the fractional epoch hash-selects the
    same docs the oracle selects, absent sources drop."""
    import hashlib

    from origami_spark.operators.sampling import upsample_sources

    rows = [(i, f"src{i % 4}") for i in range(400)]
    docs = spark.createDataFrame(rows, "doc_id bigint, source string")
    epochs = {"src0": 3.0, "src1": 2.5, "src2": 0.4}  # src3 absent

    def bucket(i):
        h = int(hashlib.md5(f"s0|{i}".encode()).hexdigest()[:15], 16)
        return h % 1_000_000

    want = {}
    for i, src in rows:
        if src not in epochs:
            continue
        e = epochs[src]
        n = int(e) + (1 if bucket(i) < round((e - int(e)) * 1e6) else 0)
        if n:
            want[i] = n

    out = upsample_sources(docs, epochs).collect()
    got = {}
    for r in out:
        got[r["doc_id"]] = got.get(r["doc_id"], 0) + 1
    assert got == want
    # epochs are the 0-based copy index, dense per doc
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r["epoch"])
    for i, es in per_doc.items():
        assert sorted(es) == list(range(want[i]))
    # integral epoch: every src0 doc exactly 3 copies
    assert all(want[i] == 3 for i, s in rows if s == "src0")
    # fractional-only epoch (0.4): a strict subset survives once
    n2 = sum(1 for i, s in rows if s == "src2" and i in want)
    assert 0 < n2 < 100


def test_upsample_sources_partition_independent_and_no_shuffle(spark):
    from origami_spark.operators.sampling import upsample_sources

    rows = [(i, f"src{i % 2}") for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id bigint, source string")
    a = sorted(map(tuple, upsample_sources(docs, {"src0": 2.3}).collect()))
    b = sorted(map(tuple, upsample_sources(
        docs.repartition(7), {"src0": 2.3}).collect()))
    assert a == b and len(a) > 0
    plan = (upsample_sources(docs, {"src0": 2.3})
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, plan  # pure projection at any scale

    import pytest as _pt
    with _pt.raises(ValueError):
        upsample_sources(docs, {"src0": -0.1})


def test_temperature_epochs_spec(spark):
    """alpha=1 is the identity reweight; alpha=0 equalizes expected
    contributions; alpha=0.5 sits between and preserves total mass;
    composing with upsample_sources realizes the spec in expectation."""
    import pytest as _pt

    from origami_spark.operators.sampling import (
        temperature_epochs,
        upsample_sources,
    )

    rows = ([(i, "big") for i in range(900)]
            + [(900 + i, "small") for i in range(100)])
    docs = spark.createDataFrame(rows, "doc_id bigint, source string")

    nat = temperature_epochs(docs, alpha=1.0)
    assert nat == {"big": _pt.approx(1.0), "small": _pt.approx(1.0)}

    flat = temperature_epochs(docs, alpha=0.0)
    # equal contributions: 500 expected docs each -> epochs 500/n_s
    assert flat["big"] == _pt.approx(500 / 900)
    assert flat["small"] == _pt.approx(500 / 100)

    mid = temperature_epochs(docs, alpha=0.5)
    assert flat["small"] > mid["small"] > 1.0 > mid["big"] > flat["big"]
    # mass preserved: sum over sources of epochs*n == corpus size
    assert mid["big"] * 900 + mid["small"] * 100 == _pt.approx(1000)

    out = upsample_sources(docs, mid).groupBy("source").count().collect()
    got = {r["source"]: r["count"] for r in out}
    # realized counts within ~3 sigma of the expected contribution
    assert abs(got["small"] - mid["small"] * 100) < 40
    assert abs(got["big"] - mid["big"] * 900) < 60

    with _pt.raises(ValueError):
        temperature_epochs(docs, alpha=-1)
