"""Head-metadata harvest (operators/pagemeta.py)."""

from origami_spark.operators.pagemeta import html_head_meta


def _row(spark, html: bytes):
    pages = spark.createDataFrame([("https://a.com/x", html)],
                                  "url string, html binary")
    return html_head_meta(pages).collect()[0]


def test_all_fields_extracted_and_normalized(spark):
    html = (b'<!doctype html><html><head>'
            b'<title>  My\n  Page\tTitle </title>'
            b'<meta charset="UTF-8">'
            b'<meta name="description" content="A  short   summary">'
            b'<link rel="canonical" href="https://a.com/canonical">'
            b'</head><body><h1 class="top">Lead  Headline</h1>'
            b'<h1>Second</h1></body></html>')
    r = _row(spark, html)
    assert r["title"] == "My Page Title"
    assert r["charset"] == "utf-8"          # lower-cased
    assert r["h1"] == "Lead Headline"       # first h1 wins
    assert r["description"] == "A short summary"
    assert r["canonical"] == "https://a.com/canonical"


def test_missing_and_empty_fields_are_null(spark):
    r = _row(spark, b"<html><head><title>   </title></head><body></body></html>")
    assert r["title"] is None               # whitespace-only -> NULL
    assert r["charset"] is None
    assert r["h1"] is None
    assert r["description"] is None
    assert r["canonical"] is None


def test_nested_markup_yields_null(spark):
    r = _row(spark, b"<h1>Before <em>inner</em> after</h1>")
    assert r["h1"] is None                  # the documented [^<]* contract


def test_bare_charset_and_attribute_order(spark):
    r = _row(spark, b'<meta http-equiv="x" charset=ISO-8859-1><h1 id="a">T</h1>')
    assert r["charset"] == "iso-8859-1"
    assert r["h1"] == "T"


def test_corpus_pages_have_title_and_charset(spark):
    """Every generated corpus page declares a title and utf-8."""
    from origami_spark.sources.corpus import pages_df

    out = html_head_meta(pages_df(spark, 50)).collect()
    assert len(out) == 50
    assert all(r["charset"] == "utf-8" for r in out)
    assert all(r["title"] for r in out)
    assert all(r["h1"] for r in out)        # the header host h1


def test_no_python_udf_no_exchange(spark):
    pages = spark.createDataFrame([("u", b"<x>")], "url string, html binary")
    plan = (html_head_meta(pages)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan           # single scan projection


def test_uppercase_tags_harvest(spark):
    """HTML tag/attribute names are case-insensitive; values keep case."""
    r = _row(spark, b'<TITLE>Home Page</TITLE><META CHARSET=UTF-8>'
                    b'<H1 CLASS="x">Lead</H1>'
                    b'<LINK REL="canonical" HREF="https://a.com/C">')
    assert r["title"] == "Home Page"
    assert r["charset"] == "utf-8"
    assert r["h1"] == "Lead"
    assert r["canonical"] == "https://a.com/C"   # value case preserved
