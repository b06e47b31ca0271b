"""PDF extraction + 2-D XY-cut ordering."""

from hypothesis import given, settings
from hypothesis import strategies as st

from origami_spark.pdf import extract_pdf_blocks, extract_pdf_text, xy_cut_2d
from origami_spark.pdf.synth import make_pdf, two_column_pdf


def test_two_column_reading_order():
    pdf, golden = two_column_pdf()
    assert extract_pdf_text(pdf) == golden


def test_uncompressed_stream():
    pdf, golden = two_column_pdf(compress=False)
    assert extract_pdf_text(pdf) == golden


def test_single_column_top_down():
    pdf = make_pdf([
        (["Title line."], 72, 720),
        (["Second paragraph."], 72, 650),
        (["Third paragraph."], 72, 580),
    ])
    assert extract_pdf_text(pdf) == (
        "Title line.\n\nSecond paragraph.\n\nThird paragraph.\n"
    )


def test_string_escapes_and_octal():
    pdf = make_pdf([(["parens (x) \\ done."], 50, 700)])
    assert extract_pdf_text(pdf) == "parens (x) \\ done.\n"
    blocks = extract_pdf_blocks(pdf)
    assert blocks[0].x == 50 and blocks[0].y == 700


def test_tj_array_kerning_gap():
    # hand-built content stream: TJ with a large negative kern = space
    import zlib

    stream = b"BT 1 0 0 1 50 700 Tm [(Hel) -50 (lo) -300 (world.)] TJ ET"
    body = zlib.compress(stream)
    pdf = (b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(body)).encode()
           + b" /Filter /FlateDecode >>\nstream\n" + body
           + b"\nendstream\nendobj\n")
    assert extract_pdf_text(pdf) == "Hello world.\n"


def test_hostile_inputs():
    pdf, _ = two_column_pdf()
    for data in (b"", b"not a pdf", pdf[:150], bytes(range(256)),
                 pdf.replace(b"FlateDecode", b"LZWDecode")):
        assert isinstance(extract_pdf_text(data), str)  # never raises


def test_xycut2d_columns_before_rows():
    # two columns each of two boxes: whole left column first
    boxes = [
        ("L1", 50, 600, 250, 700), ("L2", 50, 450, 250, 550),
        ("R1", 320, 600, 520, 700), ("R2", 320, 450, 520, 550),
    ]
    assert xy_cut_2d(boxes) == ["L1", "L2", "R1", "R2"]


def test_xycut2d_rows_win_ties():
    boxes = [("top", 50, 600, 550, 700), ("bottom", 50, 400, 550, 500)]
    assert xy_cut_2d(boxes) == ["top", "bottom"]


@settings(max_examples=150, deadline=None)
@given(st.lists(
    st.tuples(st.integers(0, 500), st.integers(0, 500),
              st.integers(1, 80), st.integers(1, 80)),
    max_size=25,
))
def test_xycut2d_permutation(raw):
    boxes = [(i, x, y, x + w, y + h) for i, (x, y, w, h) in enumerate(raw)]
    out = xy_cut_2d(boxes)
    assert sorted(out) == list(range(len(boxes)))


def test_spark_pdf_kernel(spark):
    from origami_spark.pdf.spark import extract_pdfs

    rows = []
    for i in range(20):
        pdf, golden = two_column_pdf(compress=(i % 2 == 0))
        rows.append((f"doc{i:02d}", bytearray(pdf), golden))
    df = spark.createDataFrame(
        [(u, p) for u, p, _g in rows], "url string, payload binary")
    got = {r["url"]: r["text"] for r in extract_pdfs(spark, df, partitions=4).collect()}
    assert all(got[u] == g for u, _p, g in rows)
