"""URL blocklist filtering (operators/urlfilter.py)."""

import pyspark.sql.functions as F

from origami_spark.operators.urlfilter import domain_suffixes, url_blocklist


def _pages(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, url string")


def _domains(spark, ds):
    return spark.createDataFrame([(d,) for d in ds], "domain string")


def _terms(spark, ts):
    return spark.createDataFrame([(t,) for t in ts], "term string")


def test_domain_suffixes_chain(spark):
    got = spark.range(1).select(
        domain_suffixes(F.lit("a.b.tracker.net")).alias("s"),
        domain_suffixes(F.lit("")).alias("empty"),
        domain_suffixes(F.lit("localhost")).alias("single"),
    ).first()
    assert got["s"] == ["a.b.tracker.net", "b.tracker.net",
                        "tracker.net", "net"]
    assert got["empty"] == []
    assert got["single"] == ["localhost"]


def test_domain_rule_blocks_subdomains_not_siblings(spark):
    pages = _pages(spark, [
        (1, "https://a.b.tracker.net/x"),     # subdomain of entry
        (2, "https://tracker.net/x"),          # exact host
        (3, "https://nottracker.net/x"),       # NOT a dot-suffix
        (4, "https://w3.example.org/x"),       # exact-host entry
        (5, "https://w4.example.org/x"),       # sibling — clean
        (6, "https://deep.w3.example.org/x"),  # subdomain of exact entry
    ])
    dom = _domains(spark, ["tracker.net", "w3.example.org"])
    got = {r["doc_id"]: (r["blocked"], r["reason"])
           for r in url_blocklist(pages, dom, _terms(spark, [])).collect()}
    assert got == {
        1: (True, "domain:tracker.net"),
        2: (True, "domain:tracker.net"),
        3: (False, None),
        4: (True, "domain:w3.example.org"),
        5: (False, None),
        6: (True, "domain:w3.example.org"),
    }


def test_term_rule_case_insensitive_and_min_reason(spark):
    pages = _pages(spark, [
        (1, "https://ok.org/CASINO-night"),      # term, upper-cased url
        (2, "https://tracker.net/casino"),       # domain AND term
        (3, "https://ok.org/fine"),
    ])
    got = {r["doc_id"]: (r["blocked"], r["reason"])
           for r in url_blocklist(pages, _domains(spark, ["tracker.net"]),
                                  _terms(spark, ["casino"])).collect()}
    # 'domain:...' < 'term:...' lexicographically — deterministic winner
    assert got == {1: (True, "term:casino"),
                   2: (True, "domain:tracker.net"),
                   3: (False, None)}


def test_rule_lists_canonicalized(spark):
    """Mixed-case entries match (hosts are lower-case, so an as-is join
    would silently never block); empty entries are inert rather than
    corpus-fatal (contains(url, '') is true for EVERY url)."""
    pages = _pages(spark, [
        (1, "https://a.Tracker.net/x"),
        (2, "https://ok.org/CASINO"),
        (3, "https://ok.org/fine"),
    ])
    dom = _domains(spark, ["Tracker.NET", ""])
    trm = _terms(spark, ["CaSiNo", ""])
    got = {r["doc_id"]: (r["blocked"], r["reason"])
           for r in url_blocklist(pages, dom, trm).collect()}
    assert got == {1: (True, "domain:tracker.net"),
                   2: (True, "term:casino"),
                   3: (False, None)}


def test_unparseable_url_is_clean_not_crash(spark):
    pages = _pages(spark, [(1, "not a url"), (2, "")])
    out = url_blocklist(pages, _domains(spark, ["tracker.net"]),
                        _terms(spark, ["casino"])).collect()
    assert all(not r["blocked"] for r in out)


def test_blocklist_sides_broadcast(spark):
    """The 100-TB shape: both rule lists join BROADCAST (equality join
    for domains, nested-loop for terms) and the aggregated reason set
    joins BACK broadcast — the corpus side is never hash-exchanged.
    The plan's ONLY shuffle is the matched-rows min-reason groupBy.
    Broadcast disabled globally so only the operator's explicit hints
    can produce the shape."""
    pages = _pages(spark, [(i, f"https://h{i % 7}.example.org/p/{i}")
                           for i in range(100)])
    dom = _domains(spark, ["h3.example.org"])
    trm = _terms(spark, ["/p/7"])
    bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out = url_blocklist(pages, dom, trm)
        out.collect()
        # AQE's toString echoes the Initial Plan after the Final Plan —
        # assert on the final section only
        plan = (out._jdf.queryExecution().executedPlan().toString()
                .split("== Initial Plan ==")[0])
        assert "BroadcastHashJoin" in plan          # domain equality + label joins
        assert "BroadcastNestedLoopJoin" in plan    # term contains join
        assert "SortMergeJoin" not in plan          # label join is NOT a corpus shuffle
        # exactly one shuffle: the matched-rows min-reason aggregation
        assert plan.count("Exchange hashpartitioning") == 1, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
