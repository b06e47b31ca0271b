"""Deterministic synthetic Common-Crawl-style page corpus.

Generates the input table of `BASELINE.json.input_hint`
``(url, warc_ts, html, text, lang)`` where ``text`` is the *constructive
golden*: the generator assembles each page from templates and records, at
build time, exactly what a correct extractor must emit (FIXTURES.md §1 —
"byte-identical expectation is constructive, not scraped").  This mirrors
how origami's ground truth lives next to the page (``.gt.page.xml``,
reference ``batch/utils/evaluate.py:41-44``).

Determinism: every page is a pure function of ``(seed, doc_id)`` via
``random.Random(f"{seed}:{doc_id}")`` (string seeding is stable across
platforms/processes).  Generation is distributed: ``pages_df`` runs the
same function inside ``mapInPandas`` over ``spark.range(n)`` so a
10^12-row corpus generates without any driver-side loop.

Corpus properties exercised (FIXTURES.md):
* hosts Zipf-skewed over 12 hostnames          -> host-salting path
* page sizes vary, few large pages             -> size-bucketing path
* nav/header/footer/aside chrome               -> frame-removal rule
* link-farm divs (link_density ~ 1.0)          -> boilerplate classifier
* split paragraph fragments                    -> adjacency merge rule
* <hr> separators                              -> separator barrier
* tables w/ and w/o header row                 -> psql rendering
* entities / NBSP / unicode / random html ws   -> normalization hazards
* pages with no main content                   -> empty-output path
"""

from __future__ import annotations

import datetime as _dt
import html as _htmllib
import json
import random

from ..html.render import render_table

# bump when the generator's output changes: bench caches keyed by VERSION
VERSION = 4

HOSTS = [f"site{i:02d}.example.org" for i in range(12)]
LANGS = ["en", "en", "en", "de", "fr", "es", "zh"]  # en-heavy

_WORDS = (
    "the quick brown fox jumps over lazy dog spark query engine data page "
    "block text layout table column reading order batch arrow kernel byte "
    "stream filter join window merge split host crawl corpus document line "
    "separator content main article value number system model result test"
).split()

# (html form, golden form) hazard tokens
_HAZARDS = [
    ("AT&amp;T", "AT&T"),
    ("&quot;quoted&quot;", '"quoted"'),
    ("caf&eacute;", "café"),
    ("&lt;tag&gt;", "<tag>"),
    ("na&#239;ve", "naïve"),
    ("x&nbsp;y", "x y"),
    ("über", "über"),
    ("&#8212;dash&#8212;", "—dash—"),
]

_EPOCH = _dt.datetime(2024, 1, 1)


def _ws(rng) -> str:
    """Random insignificant inter-token whitespace in the raw html."""
    return rng.choice([" ", " ", " ", "  ", "\n", "\n  ", "\t"])


def _tokens(rng, n: int):
    """-> (html_tokens, golden_tokens)."""
    html_toks, gold_toks = [], []
    for _ in range(n):
        if rng.random() < 0.08:
            h, g = rng.choice(_HAZARDS)
        else:
            h = g = rng.choice(_WORDS)
        html_toks.append(h)
        gold_toks.append(g)
    return html_toks, gold_toks


def _sentence_html(rng, html_toks, link_prob: float = 0.15) -> str:
    """Join tokens with random ws; occasionally wrap tokens in inline tags.

    At most ONE <a> per sentence, and only for sentences of >=5 tokens, so
    main-content blocks always stay under the boilerplate link-density
    threshold (0.5) — the generator must never produce a golden block the
    classifier would legitimately drop."""
    out = []
    linked = len(html_toks) < 5
    for i, t in enumerate(html_toks):
        if rng.random() < link_prob:
            tag = rng.choice(["a", "em", "strong", "span"])
            if tag == "a":
                if linked:
                    tag = "em"
                else:
                    linked = True
            href = ' href="/l%d"' % rng.randrange(100) if tag == "a" else ""
            if tag != "a" and rng.random() < 0.25:  # nested inline pair
                t = f"<{tag}><b>{t}</b></{tag}>"
            else:
                t = f"<{tag}{href}>{t}</{tag}>"
        out.append(t)
        if i < len(html_toks) - 1:
            out.append(_ws(rng))
    return "".join(out)


class _Builder:
    """Accumulates html parts tracking byte offsets."""

    def __init__(self):
        self.parts: list = []
        self.pos = 0

    def add(self, s: str) -> tuple:
        b = s.encode("utf-8")
        start = self.pos
        self.parts.append(b)
        self.pos += len(b)
        return start, self.pos

    def bytes(self) -> bytes:
        return b"".join(self.parts)


def generate_page(seed: int, doc_id: int) -> dict:
    """One deterministic page. Returns url/warc_ts/html/text/lang plus the
    golden span list [{label,start,end}] of surviving blocks in order."""
    rng = random.Random(f"{seed}:{doc_id}")
    # Zipf-ish host pick: geometric decay over the host list
    h = 0
    while h < len(HOSTS) - 1 and rng.random() < 0.55:
        h += 1
    host = HOSTS[h]
    lang = rng.choice(LANGS)
    url = f"https://{host}/{lang}/a{doc_id}"
    warc_ts = _EPOCH + _dt.timedelta(seconds=(doc_id * 9973) % 31_536_000)

    b = _Builder()
    golden_blocks: list = []  # (text, start, end, label)

    b.add("<!doctype html>\n<html><head><title>")
    b.add(_htmllib.escape(" ".join(rng.choices(_WORDS, k=3))))
    b.add('</title><meta charset="utf-8"></head>\n<body>\n')

    # chrome: nav
    b.add("<nav>")
    for i in range(rng.randint(3, 6)):
        b.add(f'<a href="/nav{i}">{rng.choice(_WORDS)}</a> ')
    b.add("</nav>\n<header><h1>")
    b.add(_htmllib.escape(host))
    b.add("</h1></header>\n")

    # chrome: link-dense sidebar
    if rng.random() < 0.4:
        b.add("<aside>")
        for i in range(rng.randint(3, 8)):
            b.add(f'<a href="/s{i}">{rng.choice(_WORDS)} {rng.choice(_WORDS)}</a> ')
        b.add("</aside>\n")

    b.add("<main>\n")
    empty_page = rng.random() < 0.04
    if not empty_page:
        # optional article title
        if rng.random() < 0.7:
            ht, gt = _tokens(rng, rng.randint(2, 6))
            s, _ = b.add("<h1>")
            b.add(_sentence_html(rng, ht, link_prob=0.0))
            _, e = b.add("</h1>\n")
            golden_blocks.append((" ".join(gt), s, e - 1, "TEXT"))

        size_r = rng.random()
        if size_r < 0.005:       # rare very large page (size-skew tail)
            n_para = rng.randint(150, 300)
        elif size_r < 0.03:      # large page
            n_para = rng.randint(40, 70)
        else:
            n_para = rng.randint(2, 6)
        for _ in range(n_para):
            if rng.random() < 0.10:  # comments are invisible to extraction
                b.add(f"<!-- generated block {rng.randrange(1000)} -->\n")
            r = rng.random()
            if r < 0.12:  # table
                ncols = rng.randint(2, 4)
                nrows = rng.randint(2, 4)
                has_header = rng.random() < 0.5
                rows = []
                s, _ = b.add("<table>")
                for ri in range(nrows):
                    cell_tag = "th" if (has_header and ri == 0) else "td"
                    b.add("<tr>")
                    row = []
                    for _c in range(ncols):
                        ht, gt = _tokens(rng, rng.randint(1, 2))
                        b.add(f"<{cell_tag}>")
                        b.add(" ".join(ht))
                        b.add(f"</{cell_tag}>")
                        row.append(" ".join(gt))
                    b.add("</tr>")
                    rows.append(row)
                _, e = b.add("</table>\n")
                golden_blocks.append(
                    (render_table(rows, has_header and nrows > 1), s, e - 1, "TABULAR")
                )
            elif r < 0.22:  # list
                nli = rng.randint(2, 5)
                s, _ = b.add("<ul>")
                lines = []
                for _i in range(nli):
                    ht, gt = _tokens(rng, rng.randint(2, 5))
                    b.add("<li>")
                    b.add(_sentence_html(rng, ht, link_prob=0.05))
                    b.add("</li>")
                    lines.append(" ".join(gt))
                _, e = b.add("</ul>\n")
                golden_blocks.append(("\n".join(lines), s, e - 1, "TEXT"))
            elif r < 0.30:  # link farm (boilerplate, NOT in golden)
                b.add('<div class="links">')
                for i in range(rng.randint(4, 8)):
                    b.add(f'<a href="/f{i}">{rng.choice(_WORDS)}</a> ')
                b.add("</div>\n")
            elif r < 0.36:  # separator
                b.add("<hr>\n")
            elif r < 0.42:  # image
                b.add(f'<img src="/img{rng.randrange(50)}.jpg" alt="">\n')
            elif r < 0.52:  # split paragraph (two fragments -> one block)
                ht, gt = _tokens(rng, rng.randint(8, 20))
                k = rng.randint(2, len(ht) - 2)
                s, _ = b.add("<p>")
                b.add(_sentence_html(rng, ht[:k]))
                b.add("</p>")
                b.add(rng.choice(["\n", " ", "\n  "]))
                b.add("<p>")
                b.add(_sentence_html(rng, ht[k:]))
                _, e = b.add(".</p>\n")
                golden_blocks.append((" ".join(gt) + ".", s, e - 1, "TEXT"))
            elif r < 0.60:  # multi-line paragraph via <br>
                nlines = rng.randint(2, 3)
                lines = []
                s, _ = b.add("<p>")
                for li in range(nlines):
                    ht, gt = _tokens(rng, rng.randint(4, 10))
                    b.add(_sentence_html(rng, ht))
                    b.add(".")
                    if li < nlines - 1:
                        b.add("<br>")
                    lines.append(" ".join(gt) + ".")
                _, e = b.add("</p>\n")
                golden_blocks.append(("\n".join(lines), s, e - 1, "TEXT"))
            elif r < 0.66:  # textual-rule split (SplitDetector analog):
                # one <p> holding two pieces separated by a '-----' line
                # -> TWO golden blocks with exact text-hull spans
                ht1, gt1 = _tokens(rng, rng.randint(4, 10))
                ht2, gt2 = _tokens(rng, rng.randint(4, 10))
                b.add("<p>")
                s1, _ = b.add(" ".join(ht1))
                _, e1 = b.add(".")
                b.add("<br>")
                b.add(rng.choice(["-----", "=====", "*****", "____"]))
                b.add("<br>")
                s2, _ = b.add(" ".join(ht2))
                _, e2 = b.add(".")
                b.add("</p>\n")
                golden_blocks.append((" ".join(gt1) + ".", s1, e1, "TEXT"))
                golden_blocks.append((" ".join(gt2) + ".", s2, e2, "TEXT"))
            elif r < 0.71:  # glued articles (density-valley split):
                # one <div> holding two articles separated by a run of
                # >= 3 <br> (>= 2 blank lines) -> TWO golden blocks with
                # exact text-hull spans; the gutter is an implicit T
                # separator (html/blocks.py SPLIT_MIN_BLANK_LINES)
                ht1, gt1 = _tokens(rng, rng.randint(4, 12))
                ht2, gt2 = _tokens(rng, rng.randint(4, 12))
                b.add("<div>")
                s1, _ = b.add(" ".join(ht1))
                _, e1 = b.add(".")
                b.add("<br>" * rng.randint(3, 6))
                s2, _ = b.add(" ".join(ht2))
                _, e2 = b.add(".")
                b.add("</div>\n")
                golden_blocks.append((" ".join(gt1) + ".", s1, e1, "TEXT"))
                golden_blocks.append((" ".join(gt2) + ".", s2, e2, "TEXT"))
            else:  # plain paragraph
                tag = "blockquote" if rng.random() < 0.12 else "p"
                ht, gt = _tokens(rng, rng.randint(6, 30))
                s, _ = b.add(f"<{tag}>")
                b.add(_sentence_html(rng, ht))
                _, e = b.add(f".</{tag}>\n")
                golden_blocks.append((" ".join(gt) + ".", s, e - 1, "TEXT"))
    b.add("</main>\n<footer>&copy; 2024 ")
    b.add(_htmllib.escape(host))
    b.add("</footer>\n</body></html>\n")

    text = "\n\n".join(t for (t, _s, _e, _l) in golden_blocks)
    if text:
        text += "\n"
    spans = [
        {"label": lb, "start": s, "end": e}
        for (_t, s, e, lb) in golden_blocks
    ]
    return {
        "url": url,
        "warc_ts": warc_ts,
        "html": b.bytes(),
        "text": text,
        "lang": lang,
        "spans_json": json.dumps(spans),
    }


PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string, "
    "spans_json string"
)


def pages_df(spark, n: int, seed: int = 42, num_partitions: int | None = None):
    """Distributed deterministic corpus: spark.range -> mapInPandas."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows = [generate_page(seed, int(i)) for i in pdf["id"]]
            yield pd.DataFrame(rows)

    rng_df = spark.range(0, n, 1, num_partitions or spark.sparkContext.defaultParallelism)
    return rng_df.mapInPandas(gen, schema=PAGES_SCHEMA)


def generate_pages(seed: int, n: int):
    """Driver-side generator for unit tests (no Spark needed)."""
    return [generate_page(seed, i) for i in range(n)]
