"""Tokenizer/tree: byte-offset exactness and tag-soup tolerance."""

from origami_spark.html.tokenizer import build_tree


def find(page, tag):
    return [n for n in page.nodes if n.tag == tag]


def test_spans_are_exact_byte_offsets():
    data = b'<html><body><p id="x">hi</p></body></html>'
    page = build_tree(data)
    p = find(page, "p")[0]
    assert data[p.start : p.end] == b'<p id="x">hi</p>'
    assert data[p.inner_start : p.inner_end] == b"hi"
    assert p.attrs == {"id": "x"}


def test_multibyte_spans_stay_byte_accurate():
    data = "<p>héllo</p><p>wörld.</p>".encode()
    page = build_tree(data)
    ps = find(page, "p")
    assert data[ps[0].start : ps[0].end].decode() == "<p>héllo</p>"
    assert data[ps[1].start : ps[1].end].decode() == "<p>wörld.</p>"


def test_implicit_p_close():
    page = build_tree(b"<body><p>one<p>two</p></body>")
    ps = find(page, "p")
    assert len(ps) == 2
    assert ps[0].parent_id == ps[1].parent_id


def test_implied_p_close_through_inline():
    # HTML5: block start implies </p> even through open inline elements
    data = b"<div><p>a <b>bold<div>next</div></div>"
    page = build_tree(data)
    divs = find(page, "div")
    assert divs[1].parent_id == divs[0].node_id  # not a child of <b>


def test_void_and_selfclose():
    page = build_tree(b"<p>a<br>b<img src='x'/>c</p>")
    assert len(find(page, "br")) == 1
    assert len(find(page, "img")) == 1
    p = find(page, "p")[0]
    assert [page.data[s:e] for s, e in p.texts] == [b"a", b"b", b"c"]


def test_xhtml_selfclose_nonvoid():
    # greedy attrs regex must not eat the '/' of <tag/>: a self-closed
    # script has no raw body, so following text belongs to the parent
    page = build_tree(b"<script/>after.<p>x</p>")
    script = find(page, "script")[0]
    assert script.end == len(b"<script/>")
    assert page.nodes[0].texts  # 'after.' attached to root, not lost
    page2 = build_tree(b'<div id="d"/><p>y</p>')
    div = find(page2, "div")[0]
    assert div.children == []
    assert div.attrs == {"id": "d"}


def test_script_body_not_parsed():
    data = b"<script>var s = '<p>x</p>';</script><p>real</p>"
    page = build_tree(data)
    assert len(find(page, "p")) == 1


def test_comment_and_doctype_skipped():
    page = build_tree(b"<!doctype html><!-- <p>no</p> --><p>yes</p>")
    assert len(find(page, "p")) == 1


def test_unmatched_close_ignored():
    page = build_tree(b"<p>a</div></p>")
    assert find(page, "p")[0].texts


def test_unclosed_elements_close_at_eof():
    data = b"<div><p>hang"
    page = build_tree(data)
    assert find(page, "p")[0].end == len(data)


def test_table_implicit_cells():
    page = build_tree(b"<table><tr><td>a<td>b<tr><td>c</table>")
    assert len(find(page, "td")) == 3
    assert len(find(page, "tr")) == 2


# ---------------------------------------------------------------------------
# charset sniffing (BOM > meta prescan > utf-8)
# ---------------------------------------------------------------------------

def test_sniff_charset_precedence():
    from origami_spark.html.tokenizer import sniff_charset

    assert sniff_charset(b"\xef\xbb\xbf<html>") == ("utf-8", 3)
    assert sniff_charset(b"\xff\xfex\x00") == ("utf-16-le", 2)
    assert sniff_charset(b"\xfe\xff\x00x") == ("utf-16-be", 2)
    assert sniff_charset(b'<meta charset="gb2312">') == ("gb2312", 0)
    assert sniff_charset(
        b'<META HTTP-EQUIV="Content-Type" '
        b'CONTENT="text/html; charset=Windows-1251">') == ("windows-1251", 0)
    assert sniff_charset(b"<html>no declaration") == ("utf-8", 0)
    # HTML5: an ASCII-readable utf-16 meta is a lie -> utf-8
    assert sniff_charset(b'<meta charset="utf-16">') == ("utf-8", 0)


def test_sniff_limit_is_1024_bytes():
    from origami_spark.html.tokenizer import sniff_charset

    late = b"<html>" + b" " * 1100 + b'<meta charset="gb2312">'
    assert sniff_charset(late) == ("utf-8", 0)


def test_to_utf8_passthrough_is_same_object():
    from origami_spark.html.tokenizer import to_utf8

    data = "<html><p>plain utf-8 é</p></html>".encode()
    assert to_utf8(data) is data  # zero-copy on the hot path


def test_to_utf8_transcodes_legacy():
    from origami_spark.html.tokenizer import to_utf8

    cp = '<meta charset="windows-1252"><p>café — naïve</p>'.encode("cp1252")
    assert to_utf8(cp).decode() == '<meta charset="windows-1252"><p>café — naïve</p>'
    gb = '<meta charset="gb2312"><p>中文</p>'.encode("gb2312")
    assert "中文" in to_utf8(gb).decode()
    u16 = "<p>utf-16 body</p>".encode("utf-16")  # BOM + LE
    assert to_utf8(u16) == "<p>utf-16 body</p>".encode()


def test_to_utf8_never_raises_on_lies():
    from origami_spark.html.tokenizer import to_utf8

    # claims gb2312, bytes are invalid for it -> replacement, no raise
    lie = b'<meta charset="gb2312"><p>\xff\xfe\xfd garbage</p>'
    assert b"<p>" in to_utf8(lie)
    # unknown label -> utf-8 passthrough
    unk = b'<meta charset="not-a-charset-9000"><p>ok</p>'
    assert to_utf8(unk) is unk
    # BOM stripped even for utf-8
    assert to_utf8(b"\xef\xbb\xbf<p>x</p>") == b"<p>x</p>"


def test_utf16_meta_aliases_are_ignored():
    """The HTML5 ignore-utf-16-meta rule must catch ALIASES too: a page
    declaring charset=utf16 (or utf-16le / UTF_16BE / utf32) in 8-bit
    bytes must decode as utf-8, not as CJK mojibake."""
    from origami_spark.html.tokenizer import sniff_charset, to_utf8

    for label in (b"utf16", b"utf-16le", b"UTF_16BE", b"utf32", b"Utf-16"):
        page = b'<meta charset="' + label + b'"><p>hello world</p>'
        assert sniff_charset(page) == ("utf-8", 0), label
        assert b"hello world" in to_utf8(page), label
