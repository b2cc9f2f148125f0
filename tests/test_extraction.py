"""Main-content extraction operators (operators/extraction.py) — the
north rule's named extraction tier: HTML boilerplate strip + DOM
heuristics, and the PDF/layout-parse reading-order analog."""

from __future__ import annotations

from pyspark.sql import functions as F

from memo_fraktur_ocr_code_spark.operators.extraction import (
    canonicalize_url,
    extract_code_blocks,
    extract_links,
    extract_main_content,
    extract_outline,
    layout_reading_order,
    registered_domain,
)

_PAGE = """<html><head><title>Long page title over any threshold here</title>
<style>p{color:red}</style></head><body>
<nav><a href="/">Home</a> <a href="/x">Archive</a> <a href="/y">About us page</a></nav>
<header><h1>Site Name Banner Headline Words</h1></header>
<div id="main">
<p>This is the first real paragraph of the article, with enough characters to pass.</p>
<p>Q &amp; A session notes with <b>bold</b> words &lt;escaped&gt; and more than enough length here.</p>
<p><a href="/r">related</a> <a href="/m">more stories here</a> <a href="/t">trending now today</a></p>
<p>ok</p>
<script>var x = "<p>not a block</p>";</script>
</div>
<aside><a href="/ad">Advert one</a> click <a href="/ad2">here now</a></aside>
<footer>site footer boilerplate line for the page</footer>
</body></html>"""


def _one(df):
    return df.collect()[0].asDict()


def test_extract_main_content_heuristics(spark):
    df = spark.createDataFrame([(1, _PAGE)], "doc_id long, html string")
    r = _one(extract_main_content(df))
    kept = r["main_text"].split("\n")
    # exactly the two long, low-link-density article paragraphs, in order
    assert kept == [
        "This is the first real paragraph of the article, with enough"
        " characters to pass.",
        "Q & A session notes with bold words <escaped> and more than"
        " enough length here.",
    ]
    # nav/header/aside/footer/script/style/title never leak
    for frag in ("Home", "Banner", "Advert", "footer", "color:red",
                 "not a block", "page title"):
        assert frag not in r["main_text"]
    assert r["n_blocks"] == 4  # two kept + link-farm + "ok"
    assert r["n_kept"] == 2
    assert r["n_short_dropped"] == 1  # "ok"
    assert r["n_link_dropped"] == 1  # the all-anchor paragraph


def test_extract_null_and_empty_html(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "<p>plain text body long enough to keep"
                                 " around here</p>")],
        "doc_id long, html string",
    )
    rows = {r["id"]: r.asDict()
            for r in extract_main_content(df).collect()}
    assert rows[1]["main_text"] == "" and rows[1]["n_blocks"] == 0
    assert rows[2]["main_text"] == "" and rows[2]["n_blocks"] == 0
    assert rows[3]["n_kept"] == 1


def test_extract_entity_decode_single_pass(spark):
    # &amp; decodes LAST, so "&amp;lt;" becomes the literal "&lt;",
    # never a second-pass "<"
    df = spark.createDataFrame(
        [(1, "<p>escaped entity &amp;lt; stays literal in this long"
             " paragraph</p>")],
        "doc_id long, html string",
    )
    r = _one(extract_main_content(df))
    assert "&lt;" in r["main_text"] and "< " not in r["main_text"]


def test_extract_nested_container_pinned_limit(spark):
    # Documented limitation: a same-named nested container keeps the
    # inner tail (non-greedy match ends at the FIRST close tag).  Pin
    # it so any change is deliberate.
    html = ("<nav>outer <nav>inner</nav> tail of the outer nav block"
            " long enough</nav><p>real article body text long enough"
            " to keep</p>")
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    r = _one(extract_main_content(df))
    assert "real article body" in r["main_text"]
    assert "tail of the outer nav" in r["main_text"]  # the pinned leak


def test_extract_plan_is_narrow(spark):
    df = spark.createDataFrame([(1, _PAGE)], "doc_id long, html string")
    plan = (
        extract_main_content(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # pure per-row projection


def test_extract_links_quote_forms_and_positions(spark):
    html = (
        '<p><a href="/dq?x=1">One</a> mid '
        "<a href='/sq'>Tw&amp;o</a> "
        "<a name=anchor-only>skip</a> "
        "<a href=plain-form>Th<b>ree</b></a></p>"
    )
    df = spark.createDataFrame([(1, html), (2, None)],
                               "doc_id long, html string")
    rows = [r.asDict() for r in
            extract_links(df).orderBy("id", "pos").collect()]
    # the href-less anchor holds position 2 but emits no row; NULL html
    # emits nothing
    assert rows == [
        {"id": 1, "pos": 0, "href": "/dq?x=1", "anchor_text": "One"},
        {"id": 1, "pos": 1, "href": "/sq", "anchor_text": "Tw&o"},
        # visible_text replaces tags with a space (the same definition
        # main-content scoring uses), so the inline <b> splits the word
        {"id": 1, "pos": 3, "href": "plain-form", "anchor_text": "Th ree"},
    ]


def test_extract_links_plan_is_narrow(spark):
    df = spark.createDataFrame([(1, "<a href=x>y</a>")],
                               "doc_id long, html string")
    plan = (
        extract_links(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # generate + project only


def _canon(spark, url):
    df = spark.createDataFrame([(url,)], "u string")
    return df.select(canonicalize_url(F.col("u")).alias("c")).first()["c"]


def test_canonicalize_url_full_chain(spark):
    assert (
        _canon(spark, "HTTP://User:pw@WWW.Ex.COM:80/path/A?b=2"
                      "&utm_source=x&a=1&fbclid=abc#frag")
        == "http://www.ex.com/path/A?a=1&b=2"
    )


def test_canonicalize_url_ports_paths_idempotence(spark):
    # https default port stripped; empty path becomes /
    assert _canon(spark, "https://Ex.com:443") == "https://ex.com/"
    # non-default port survives; so does a trailing slash difference
    assert _canon(spark, "http://ex.com:8080/a/") == "http://ex.com:8080/a/"
    # all-tracking query collapses to no query at all
    assert _canon(spark, "http://ex.com/p?utm_medium=m") == "http://ex.com/p"
    # ?ref=... is stripped but ?refresh=1 is NOT (anchored name match)
    assert _canon(spark, "http://ex.com/p?refresh=1&ref=h") == \
        "http://ex.com/p?refresh=1"
    # canonicalization is idempotent
    once = _canon(spark, "HTTPS://A.B.Co.UK/x%20y?z=1&a=2")
    assert _canon(spark, once) == once
    # no scheme -> NULL (relative URLs resolve via a base join, not here)
    assert _canon(spark, "www.ex.com/path") is None


def test_registered_domain_suffixes(spark):
    df = spark.createDataFrame(
        [("www.example.co.uk",), ("a.b.example.com",), ("example.com",),
         ("co.uk",), ("192.168.0.1",), ("localhost",)],
        "h string",
    )
    out = [r["rd"] for r in
           df.select(registered_domain(F.col("h")).alias("rd")).collect()]
    assert out == ["example.co.uk", "example.com", "example.com",
                   "co.uk", "192.168.0.1", "localhost"]


def test_extract_code_blocks(spark):
    txt = (
        "intro\n```python\ndef f():\n    return 1\n```\nmid\n"
        "```\nplain\n```\n"
        "inline ```not a fence``` stays prose\n"
        "```sql  \nSELECT 1;\n```\n"
        "```\n```\n"  # empty body
        "```toml\nk = 1\n\n```"  # trailing EMPTY line must survive
    )
    df = spark.createDataFrame(
        [(1, txt), (2, "no fences"), (3, None),
         (4, "```py\nunterminated tail")],
        "doc_id long, text string",
    )
    rows = [r.asDict() for r in
            extract_code_blocks(df).orderBy("id", "block_idx").collect()]
    assert rows == [
        {"id": 1, "block_idx": 0, "lang": "python", "n_lines": 2,
         "code": "def f():\n    return 1"},
        {"id": 1, "block_idx": 1, "lang": None, "n_lines": 1,
         "code": "plain"},
        {"id": 1, "block_idx": 2, "lang": "sql", "n_lines": 1,
         "code": "SELECT 1;"},
        {"id": 1, "block_idx": 3, "lang": None, "n_lines": 0,
         "code": ""},
        # \z strip: only the fence's own terminator goes — the body's
        # final empty line stays (Java's $ would eat both newlines)
        {"id": 1, "block_idx": 4, "lang": "toml", "n_lines": 2,
         "code": "k = 1\n"},
    ]  # fence-less, NULL and unterminated docs emit nothing


def test_extract_outline(spark):
    html = (
        "<h1>Top</h1><p>body</p><h2 class='x'>Se&amp;c <b>two</b></h2>"
        "<script>var h = '<h3>not real</h3>';</script>"
        "<H3>cased</H3><h6></h6>"
    )
    df = spark.createDataFrame([(1, html), (2, None)],
                               "doc_id long, html string")
    rows = [r.asDict() for r in
            extract_outline(df).orderBy("id", "pos").collect()]
    assert rows == [
        {"id": 1, "pos": 0, "level": 1, "heading": "Top"},
        {"id": 1, "pos": 1, "level": 2, "heading": "Se&c two"},
        {"id": 1, "pos": 2, "level": 3, "heading": "cased"},
        # empty heading kept: position matters even with no text
        {"id": 1, "pos": 3, "level": 6, "heading": ""},
    ]


_COLS = ("doc_id long, page long, block_id long, x0 long, y0 long,"
         " x1 long, y1 long, text string")


def _blocks(spark, rows, order=None):
    df = spark.createDataFrame(rows, _COLS)
    return {
        (r["doc_id"], r["page"]): r.asDict()
        for r in layout_reading_order(df).collect()
    }


def test_layout_two_column_reading_order(spark):
    rows = [
        (7, 0, 0, 0, 0, 1000, 80, "TITLE"),
        (7, 0, 1, 0, 100, 480, 220, "left one"),
        (7, 0, 2, 520, 100, 1000, 220, "right one"),
        (7, 0, 3, 0, 250, 480, 370, "left two"),
        (7, 0, 4, 0, 550, 1000, 600, "BOTTOM"),
    ]
    out = _blocks(spark, rows)
    r = out[(7, 0)]
    assert r["page_text"] == "TITLE\nleft one\nleft two\nright one\nBOTTOM"
    assert r["n_blocks"] == 5 and r["n_fullwidth"] == 2
    # input order must not matter
    out2 = _blocks(spark, list(reversed(rows)))
    assert out2[(7, 0)]["page_text"] == r["page_text"]


def test_layout_multiple_bands(spark):
    # fw cut mid-page: column text above it reads before it, column
    # text below it after — the 2*count+is_fw band arithmetic
    rows = [
        (1, 0, 0, 0, 100, 480, 200, "above left"),
        (1, 0, 1, 520, 100, 1000, 200, "above right"),
        (1, 0, 2, 0, 300, 1000, 340, "RULE"),
        (1, 0, 3, 520, 400, 1000, 500, "below right"),
        (1, 0, 4, 0, 400, 480, 500, "below left"),
    ]
    r = _blocks(spark, rows)[(1, 0)]
    assert r["page_text"].split("\n") == [
        "above left", "above right", "RULE", "below left", "below right",
    ]


def test_layout_tie_break_and_pages(spark):
    # same column, same y0 → x0 then block_id break ties; pages are
    # independent groups
    rows = [
        (1, 0, 0, 10, 100, 200, 150, "a"),
        (1, 0, 1, 5, 100, 195, 150, "b"),
        (1, 1, 2, 0, 0, 1000, 50, "page2 title wide"),
    ]
    out = _blocks(spark, rows)
    assert out[(1, 0)]["page_text"] == "b\na"
    assert out[(1, 1)]["n_fullwidth"] == 1


# ---------------------------------------------------------------------------
# Anchor-text aggregation (r5 session 2)
# ---------------------------------------------------------------------------


def test_anchor_text_stats_mode_and_ties(spark):
    """top_anchor is the mode of trimmed texts; a count tie elects the
    lexicographically smallest; NULL urls and blank anchors drop."""
    from memo_fraktur_ocr_code_spark.operators.extraction import (
        anchor_text_stats,
    )

    rows = [
        ("http://a/", "Home"),
        ("http://a/", "  Home  "),       # trims into the mode
        ("http://a/", "Start"),
        ("http://b/", "Beta"),
        ("http://b/", "Alpha"),          # 1-1 tie -> 'Alpha' (lex min)
        ("http://b/", ""),               # blank dropped
        ("http://b/", "   "),            # whitespace dropped
        (None, "ghost"),                  # NULL url dropped
    ]
    df = spark.createDataFrame(
        rows, "canonical_url string, anchor_text string"
    )
    out = {r["canonical_url"]: r for r in anchor_text_stats(df).collect()}
    assert set(out) == {"http://a/", "http://b/"}
    a = out["http://a/"]
    assert (a["n_anchors"], a["n_texts"], a["top_count"],
            a["top_anchor"]) == (3, 2, 2, "Home")
    b = out["http://b/"]
    assert (b["n_anchors"], b["n_texts"], b["top_count"],
            b["top_anchor"]) == (2, 2, 1, "Alpha")
