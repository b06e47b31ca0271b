"""Block extraction: labels, stats, adjacency evidence."""

from origami_spark.html.blocks import extract_page


def by_label(blocks, label):
    return [b for b in blocks if b.label == label]


def test_labels_and_chrome():
    blocks = extract_page(
        b"<body><nav><a href='/'>x</a></nav><p>main.</p><hr>"
        b"<table><tr><td>a</td><td>b</td></tr></table>"
        b"<img src='i.jpg'><footer>f</footer></body>"
    )
    labels = [(b.label, b.in_chrome) for b in blocks]
    assert ("TEXT", True) in labels       # nav
    assert ("TEXT", False) in labels      # p
    assert ("SEPARATOR", False) in labels
    assert ("TABULAR", False) in labels
    assert ("ILLUSTRATION", False) in labels


def test_link_density_stats():
    (b,) = extract_page(b"<body><p><a href='/'>linked</a> plain</p></body>")
    assert b.text == "linked plain"
    assert b.link_len == len("linked")
    assert b.text_len == len("linked plain")


def test_ws_gap_and_ends_clean():
    data = b"<body><p>no punct</p> <p>ends.</p>x<p>third.</p></body>"
    blocks = extract_page(data)
    # stray 'x' directly in <body> -> body emits a hull-span block that
    # covers only the 'x' run, never the whole document
    body = [b for b in blocks if b.tag == "body"][0]
    assert data[body.start:body.end] == b"x"
    ps = [b for b in blocks if b.tag == "p"]
    assert ps[0].ws_gap_next is True
    assert ps[0].ends_clean is False
    assert ps[1].ends_clean is True
    assert ps[1].ws_gap_next is False  # 'x' block between them in seq


def test_list_is_one_multiline_block():
    (b,) = extract_page(b"<body><ul><li>one</li><li>two</li></ul></body>")
    assert b.text == "one\ntwo"
    assert b.n_lines == 2


def test_br_makes_lines():
    (b,) = extract_page(b"<body><p>a<br>b</p></body>")
    assert b.text == "a\nb"
    assert b.n_lines == 2


def test_paths_per_label():
    blocks = extract_page(b"<body><p>a.</p><hr><p>b.</p></body>")
    assert [b.path for b in blocks] == ["TEXT/0", "SEPARATOR/0", "TEXT/1"]


def test_byte_spans_slice_source():
    data = b"<body>\n  <p>hello.</p>\n</body>"
    (b,) = extract_page(data)
    assert data[b.start : b.end] == b"<p>hello.</p>"
