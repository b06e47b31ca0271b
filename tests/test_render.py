"""Hand-written goldens for the psql table renderer + text normalizer.

These keep the shared spec modules honest: corpus generator and
extractor both use them, so their correctness must be established
against fixed strings, never against each other."""

from origami_spark.html.render import render_table
from origami_spark.html.tokenizer import normalize_text


def test_psql_with_header():
    got = render_table([["h1", "h2"], ["a", "bb"]], has_header=True)
    assert got == (
        "+----+----+\n"
        "| h1 | h2 |\n"
        "|----+----|\n"
        "| a  | bb |\n"
        "+----+----+"
    )


def test_psql_no_header_width():
    got = render_table([["a", "long cell"], ["bbb", "c"]], has_header=False)
    assert got == (
        "+-----+-----------+\n"
        "| a   | long cell |\n"
        "| bbb | c         |\n"
        "+-----+-----------+"
    )


def test_ragged_rows_padded():
    got = render_table([["a", "b", "c"], ["d"]], has_header=False)
    assert got.splitlines()[2] == "| d |   |   |"


def test_single_column_plain():
    assert render_table([["x"], ["y"]], has_header=False) == "x\ny"


def test_empty():
    assert render_table([], has_header=False) == ""


def test_normalize_entities():
    assert normalize_text("AT&amp;T &quot;q&quot; caf&eacute;") == 'AT&T "q" café'


def test_normalize_nbsp_and_ws():
    assert normalize_text("  a&nbsp;b \n\t c  ") == "a b c"


def test_normalize_numeric_entities():
    assert normalize_text("&#65;&#x42;&#8212;") == "AB—"
