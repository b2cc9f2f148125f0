"""Main-content extraction — the north rule's named extraction tier
("HTML boilerplate strip, PDF/layout parse, DOM heuristics") as
engine-portable Spark operators.

Six operators:

* :func:`extract_main_content` — HTML → main text via the public
  boilerpipe / JusText heuristic family (Kohlschütter et al. WSDM'10;
  Pomikálek 2011): drop non-content subtrees (``script``/``style``/
  ``head`` plus the DOM boilerplate containers ``nav``/``header``/
  ``footer``/``aside``/``form``), segment the rest into text blocks at
  block-level tag boundaries, then keep a block iff it is long enough
  AND its anchor-text density is low enough.  The whole operator is a
  single narrow projection — regex chains + array higher-order
  functions per row, NO shuffle, NO UDF — so it runs at scan speed and
  scales embarrassingly to a 100 TB crawl.

* :func:`extract_links` — HTML → one row per ``<a href=…>`` anchor
  (the web-graph side of extraction: outlink tables feed URL-frontier
  dedup, host-level quality priors and link-spam scoring).  Pure
  Catalyst ``regexp_extract_all`` + ``posexplode`` — the only plan
  growth is the explode itself.

* :func:`canonicalize_url` (a Column builder) — the URL normalization
  every crawl-dedup stage runs before keying anything on a URL
  (CCNet / RefinedWeb dedup by canonical URL): lowercase scheme+host,
  strip userinfo / default ports / fragments / tracking parameters,
  sort the surviving query parameters.  :func:`registered_domain`
  extracts the naive eTLD+1 (small built-in multi-label suffix list —
  a full public-suffix list is a data file, not an algorithm change).

* :func:`extract_code_blocks` — fenced ```lang``` code blocks out of
  markdown-ish text, the transcript-payload analog of main-content
  extraction: agent turns interleave prose with code, and training
  pipelines route the two through different quality/dedup stages.

* :func:`extract_outline` — the ``<h1>``–``<h6>`` heading hierarchy
  of an HTML page in document order (level, position, text): the
  structural skeleton section-aware chunkers and TOC builders key on.

* :func:`layout_reading_order` — the PDF/layout-parse analog over a
  typed layout-block table ``(doc, page, block, x0, y0, x1, y1,
  text)`` (what a real PDF parser emits; the parser binary itself is
  environment-limited here, like S13 in COVERAGE.md): recover reading
  order with a one-level XY-cut heuristic (Nagy & Seth 1984 recursive
  XY-cut, flattened): full-width blocks split a page into horizontal
  bands, column assignment inside a band is by block-center midpoint,
  and text assembles in ``(band, column, y, x)`` order.

Engine portability (the repo-wide DuckDB oracle contract):

* every regex avoids lookarounds and backreferences (RE2-safe), uses
  only ``(?is)`` inline flags, ``\\b``, ``[^>]*`` and non-greedy
  ``.*?`` — verified to behave identically under Java regex and RE2;
  ``script``/``style`` subtrees are removed by SEPARATE passes because
  matching open/close tags via a backreference is not RE2-expressible;
* link-density thresholding is a cross-multiplied integer comparison
  (``10000*link_chars <= max_link_bp*text_chars``) — no division
  anywhere, so there is no float-rounding surface to diverge on;
* entity decode is a fixed replace chain with ``&amp;`` LAST, so
  ``&amp;lt;`` decodes once (to ``&lt;``), never twice.

Honest limits (documented, test-pinned): subtree removal assumes the
boilerplate containers are not nested inside a same-named tag
(``<nav><nav>…</nav></nav>`` keeps the inner tail — real-world crawls
handle this upstream with an HTML tidy pass), and CDATA sections are
treated as text.

Reference parity note: the reference corpus pipeline strips OCR page
furniture rather than HTML (filters F3/F4, `memoocr` pipeline); these
operators extend the same discard-boilerplate role to the web-crawl
input class the graft brief targets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Subtrees whose whole content is dropped.  ``head`` removes titles,
#: meta and anything the script/style passes missed inside it; the rest
#: are the DOM-heuristic boilerplate containers.
DROP_SUBTREES = ("script", "style", "head", "nav", "header", "footer",
                 "aside", "form")

#: Block-level tags — a boundary between candidate text blocks.
_BLOCK_TAGS = (
    "p|div|section|article|main|h[1-6]|ul|ol|li|table|thead|tbody|tr"
    "|td|th|blockquote|pre|br|hr|html|body|title"
)
BLOCK_SPLIT_RE = rf"(?i)</?(?:{_BLOCK_TAGS})\b[^>]*>"

ANCHOR_RE = r"(?is)<a\b[^>]*>(.*?)</a>"

#: ``&amp;`` deliberately last — see module docstring.
_ENTITIES = (("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
             ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&"))


def _strip_subtree(col: Column, tag: str) -> Column:
    return F.regexp_replace(col, rf"(?is)<{tag}\b[^>]*>.*?</{tag}>", " ")


def visible_text(col: Column) -> Column:
    """Tag-stripped, entity-decoded, whitespace-squeezed visible text
    of an HTML fragment (block or anchor body) — THE text definition
    shared by block scoring and anchor-char counting, so link density
    compares like with like."""
    t = F.regexp_replace(col, r"(?s)<[^>]*>", " ")
    for ent, rep in _ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def extract_main_content(
    df: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
    min_chars: int = 25,
    max_link_bp: int = 3300,
) -> DataFrame:
    """Extract main content from an HTML column.

    Returns one row per input row (keep-everything contract; NULL html
    behaves as empty):

    ``(id, main_text, n_blocks, n_kept, n_short_dropped,
    n_link_dropped)``

    * ``n_blocks`` counts blocks with any visible text;
    * a block is KEPT iff ``len(text) >= min_chars`` and
      ``10000 * link_chars <= max_link_bp * len(text)`` where
      ``link_chars`` is the visible-char count of its ``<a>`` bodies;
    * ``main_text`` joins kept blocks with ``\\n`` in document order.

    Scale shape: narrow per-row projection only — the plan is a scan +
    project with zero Exchange (asserted in tests/test_extraction.py),
    so throughput is whole-stage-codegen regex speed and partitioning
    is inherited from the source.
    """
    h = F.coalesce(F.col(html_col), F.lit(""))
    h = F.regexp_replace(h, r"(?s)<!--.*?-->", " ")
    for tag in DROP_SUBTREES:
        h = _strip_subtree(h, tag)

    def _block(b: Column) -> Column:
        txt = visible_text(b)
        # 64-bit accumulator: the DuckDB oracle computes these products
        # in BIGINT, and a link-index block past ~214k anchor chars
        # would overflow a 32-bit 10000*lc (ANSI raises, legacy wraps)
        link_chars = F.aggregate(
            F.regexp_extract_all(b, F.lit(ANCHOR_RE), F.lit(1)),
            F.lit(0).cast("long"),
            lambda acc, a: acc + F.length(visible_text(a)).cast("long"),
        )
        return F.struct(txt.alias("t"), link_chars.alias("lc"))

    blocks = F.transform(F.split(h, BLOCK_SPLIT_RE), _block)
    nonempty = F.filter(blocks, lambda s: F.length(s["t"]) > 0)
    is_long = lambda s: F.length(s["t"]) >= F.lit(int(min_chars))  # noqa: E731
    low_link = lambda s: (  # noqa: E731
        F.lit(10000).cast("long") * s["lc"]
        <= F.lit(int(max_link_bp)).cast("long")
        * F.length(s["t"]).cast("long")
    )
    kept = F.filter(nonempty, lambda s: is_long(s) & low_link(s))
    short_dropped = F.filter(nonempty, lambda s: ~is_long(s))
    link_dropped = F.filter(nonempty, lambda s: is_long(s) & ~low_link(s))

    return df.select(
        F.col(id_col).alias("id"),
        F.array_join(
            F.transform(kept, lambda s: s["t"]), "\n"
        ).alias("main_text"),
        F.size(nonempty).alias("n_blocks"),
        F.size(kept).alias("n_kept"),
        F.size(short_dropped).alias("n_short_dropped"),
        F.size(link_dropped).alias("n_link_dropped"),
    )


#: Full anchor elements (open tag + body + close).  Non-greedy body,
#: no backreferences — RE2-safe like every regex in this module.
ANCHOR_FULL_RE = r"(?is)<a\b[^>]*>.*?</a>"

#: Tracking / click-id query parameters dropped by canonicalization —
#: the de-facto standard strip set (utm_* per Google Analytics docs,
#: the ad-network click ids, mailchimp/instagram share ids).  Matched
#: against ``name=`` (or bare ``name``) case-insensitively via
#: lower() on the pair.
TRACKING_PARAM_RE = (
    r"^(utm_[a-z0-9_]*|fbclid|gclid|msclkid|mc_eid|igshid|ref|ref_src)"
    r"(=|$)"
)

#: Multi-label public suffixes recognised by :func:`registered_domain`
#: — the common ccTLD second-level registries.  A production run swaps
#: in the full Mozilla public-suffix list as a broadcast lookup; the
#: ALGORITHM (match longest known suffix, keep one more label) is this.
MULTI_SUFFIXES = (
    "co.uk", "org.uk", "gov.uk", "ac.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "co.in", "co.nz",
)


def extract_links(
    df: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
) -> DataFrame:
    """Explode an HTML column into its outlinks.

    Returns one row per ``<a>`` element that carries an ``href``
    attribute (anchors without one — fragment targets — are dropped):

    ``(id, pos, href, anchor_text)``

    * ``pos`` is the 0-based anchor index in document order (position
      among ALL anchors, including href-less ones, so it is stable
      under attribute edits);
    * ``href`` honours double-quoted, single-quoted and unquoted
      attribute syntax, first match wins in that order;
    * ``anchor_text`` is :func:`visible_text` of the anchor body — the
      same text definition :func:`extract_main_content` scores with.

    This is an exploded child table (docs with no anchors contribute
    no rows), the natural shape for a link graph — join back to the
    page table on ``id`` when page context is needed.

    Scale shape: generate + project, zero shuffle; output size is the
    anchor count, so partitioning inherits from the source scan and a
    downstream ``groupBy(host)`` is the first exchange.
    """
    h = F.coalesce(F.col(html_col), F.lit(""))
    h = F.regexp_replace(h, r"(?s)<!--.*?-->", " ")
    anchors = F.regexp_extract_all(h, F.lit(ANCHOR_FULL_RE), F.lit(0))
    exploded = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(anchors).alias("pos", "_a"),
    )
    attrs = F.regexp_extract(F.col("_a"), r"(?is)^<a\b([^>]*)>", 1)
    body = F.regexp_extract(F.col("_a"), r"(?is)^<a\b[^>]*>(.*)</a>$", 1)
    href = F.coalesce(
        F.nullif(
            F.regexp_extract(attrs, r'(?i)\bhref\s*=\s*"([^"]*)"', 1),
            F.lit(""),
        ),
        F.nullif(
            F.regexp_extract(attrs, r"(?i)\bhref\s*=\s*'([^']*)'", 1),
            F.lit(""),
        ),
        F.nullif(
            F.regexp_extract(attrs, r"""(?i)\bhref\s*=\s*([^\s"'>]+)""", 1),
            F.lit(""),
        ),
    )
    return (
        exploded.select(
            "id",
            "pos",
            href.alias("href"),
            visible_text(body).alias("anchor_text"),
        )
        .where(F.col("href").isNotNull())
    )


#: Fenced code block: opening fence at line start with an optional
#: language token, body up to the next line-initial closing fence.
#: ``(?ms)`` so ``^`` anchors lines and ``.`` crosses them — both
#: inline flags are Java-regex ∩ RE2.  Unterminated fences match
#: nothing (honest: a truncated turn yields no half-block).
CODE_FENCE_RE = r"(?ms)^```([A-Za-z0-9_+.-]*)[ \t]*\n(.*?)^```[ \t]*$"

#: HTML headings.  The close tag matches any ``</h1>``–``</h6>`` —
#: tying it to the opening level needs a backreference, which RE2
#: lacks; mismatched-level closes (invalid HTML) end the heading early,
#: a documented tolerance.
HEADING_RE = r"(?is)<h([1-6])\b[^>]*>(.*?)</h[1-6]>"


def _zip_groups(col: Column, pattern: str) -> Column:
    """Array of (g1, g2) structs for every match of a 2-group pattern —
    two ``regexp_extract_all`` passes zipped by index, because a single
    pass extracts only one group per match (the same recipe the DuckDB
    oracle uses, so group pairing is identical by construction)."""
    return F.arrays_zip(
        F.regexp_extract_all(col, F.lit(pattern), F.lit(1)).alias("g1"),
        F.regexp_extract_all(col, F.lit(pattern), F.lit(2)).alias("g2"),
    )


def extract_code_blocks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Explode markdown-ish text into its fenced code blocks.

    The transcript analog of :func:`extract_main_content`: agent turns
    interleave prose with ```lang fenced code, and a training pipeline
    routes code through different dedup/quality stages than prose
    (code-specific near-dup, license scanning, language-binned mixing).

    One row per fence, ``(id, block_idx, lang, n_lines, code)``:

    * ``block_idx`` — 0-based fence index within the document;
    * ``lang`` — the info token after the opening fence, NULL when
      absent (bare ```-fence);
    * ``n_lines`` — newline-separated line count of the body;
    * ``code`` — the body verbatim, trailing fence newline excluded.

    Exploded child table like :func:`extract_links` (documents without
    fences emit nothing); zero shuffle, scan-speed regex.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    pairs = _zip_groups(t, CODE_FENCE_RE)
    exploded = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(pairs).alias("block_idx", "_m"),
    )
    # body keeps its trailing newline (the one before the close fence);
    # strip exactly that one so `code` round-trips cleanly.  \z, not $:
    # Java's $ also matches BEFORE a final line terminator, so `\n$` on
    # a body ending in an empty line ("x\n\n") would strip both
    # newlines; RE2's $ would strip one — \z (end of input, both
    # engines) removes exactly the terminator
    code = F.regexp_replace(F.col("_m.g2"), r"\n\z", "")
    return exploded.select(
        "id",
        "block_idx",
        F.nullif(F.col("_m.g1"), F.lit("")).alias("lang"),
        F.when(F.length(code) == 0, F.lit(0))
        .otherwise(
            F.length(code)
            - F.length(F.regexp_replace(code, r"\n", ""))
            + F.lit(1)
        )
        .alias("n_lines"),
        code.alias("code"),
    )


def extract_outline(
    df: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
) -> DataFrame:
    """Explode an HTML page into its heading hierarchy.

    ``(id, pos, level, heading)`` — one row per ``<h1>``–``<h6>`` in
    document order; ``level`` is the digit, ``heading`` the
    :func:`visible_text` of the element body.  Only ``script``/
    ``style``/comments are stripped first (a heading inside ``header``
    or ``nav`` is still structure — boilerplate JUDGMENT belongs to
    :func:`extract_main_content`, not the outline).  Empty headings
    (no visible text) are kept: a TOC builder needs the position even
    when the text is an image.
    """
    h = F.coalesce(F.col(html_col), F.lit(""))
    h = F.regexp_replace(h, r"(?s)<!--.*?-->", " ")
    for tag in ("script", "style"):
        h = _strip_subtree(h, tag)
    pairs = _zip_groups(h, HEADING_RE)
    exploded = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(pairs).alias("pos", "_m"),
    )
    return exploded.select(
        "id",
        "pos",
        F.col("_m.g1").cast("int").alias("level"),
        visible_text(F.col("_m.g2")).alias("heading"),
    )


def canonicalize_url(col: Column) -> Column:
    """Canonical form of an absolute URL (NULL when there is no
    ``scheme://`` prefix — relative URLs need a base to resolve
    against, which is a join with the page table, not a rewrite).

    Chain (every step a portable regex/list op — the DuckDB oracle
    mirrors it verbatim):

    1. trim, drop the ``#fragment``;
    2. lowercase the scheme;
    3. authority: strip ``userinfo@``, lowercase host, strip the
       scheme's default port (``:80`` http, ``:443`` https);
    4. path: empty → ``/`` (``http://h`` ≡ ``http://h/`` per RFC 3986
       §6.2.3); otherwise kept verbatim — trailing-slash and
       percent-encoding rewrites change semantics and stay out;
    5. query: split on ``&``, drop empties and tracking params
       (:data:`TRACKING_PARAM_RE`), byte-sort the rest, rejoin.
    """
    u = F.regexp_replace(F.trim(col), r"(?s)#.*$", "")
    scheme = F.lower(
        F.nullif(
            F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1),
            F.lit(""),
        )
    )
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    authority = F.regexp_extract(rest, r"^([^/?]*)", 1)
    hostport = F.lower(F.regexp_replace(authority, r"^[^@]*@", ""))
    host = F.when(
        scheme == "http", F.regexp_replace(hostport, r":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(hostport, r":443$", "")
    ).otherwise(hostport)
    pathq = F.substring(rest, F.length(authority) + 1, F.lit(1 << 30))
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    path = F.when(F.length(path) == 0, F.lit("/")).otherwise(path)
    query = F.regexp_extract(pathq, r"(?s)^[^?]*\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (F.length(p) > 0)
            & ~F.lower(p).rlike(TRACKING_PARAM_RE),
        )
    )
    q = F.array_join(params, "&")
    return F.when(
        scheme.isNotNull(),
        F.concat(
            scheme,
            F.lit("://"),
            host,
            path,
            F.when(F.length(q) > 0, F.concat(F.lit("?"), q)).otherwise(
                F.lit("")
            ),
        ),
    )


def registered_domain(host: Column) -> Column:
    """Naive eTLD+1 of a lowercase host: one label above the public
    suffix, where the suffix is the last label unless the last TWO
    labels are a known multi-label registry (:data:`MULTI_SUFFIXES`).
    IPv4 literals pass through whole (a dotted-quad is not a DNS
    hierarchy)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, -2, 2), ".")
    is_multi = last2.isin(*MULTI_SUFFIXES)
    is_ip = host.rlike(r"^[0-9]+(\.[0-9]+){3}$")
    take = F.when(is_multi & (n >= 3), F.lit(3)).otherwise(F.lit(2))
    return F.when(is_ip | (n <= take), host).otherwise(
        F.array_join(F.slice(labels, -take, take), ".")
    )


def layout_reading_order(
    df: DataFrame,
    doc_col: str = "doc_id",
    page_col: str = "page",
    block_col: str = "block_id",
    text_col: str = "text",
    page_width: int = 1000,
    fw_frac_bp: int = 6000,
) -> DataFrame:
    """Assemble per-page text in reading order from layout blocks.

    Input: one row per layout block with integer coordinates
    ``(doc, page, block, x0, y0, x1, y1, text)`` in any order (a PDF
    parser emits blocks in object order, not reading order).

    Heuristic (one-level XY-cut): a block is FULL-WIDTH iff
    ``10000*(x1-x0) >= fw_frac_bp*page_width``.  Full-width blocks cut
    the page into horizontal bands; every block's band is
    ``2 * |{full-width y1 <= this y0}|`` plus 1 for the full-width
    block itself, so a cut sorts after the column text above it and
    before the column text below it.  Within a band, columns order by
    block-center midpoint (``x0+x1 < page_width`` → left), then
    ``(y0, x0, block)``.

    Returns ``(doc, page, page_text, n_blocks, n_fullwidth)`` with
    ``page_text`` the ``\\n``-join in reading order.

    Scale shape: the full-width census aggregates per page (tiny), the
    join and final assembly both key on ``(doc, page)`` — state is
    bounded by blocks-per-page, never corpus-sized; no window over an
    unpartitioned frame.
    """
    doc, page = F.col(doc_col), F.col(page_col)
    width = F.col("x1") - F.col("x0")
    is_fw = (F.lit(10000) * width >= F.lit(int(fw_frac_bp))
             * F.lit(int(page_width)))
    d = df.withColumn("_is_fw", is_fw)

    fw = (
        d.filter(F.col("_is_fw"))
        .groupBy(doc.alias("_d"), page.alias("_p"))
        .agg(F.sort_array(F.collect_list("y1")).alias("_fw_y1s"))
    )
    j = d.join(
        fw,
        (doc == F.col("_d")) & (page == F.col("_p")),
        "left",
    )
    cuts = F.coalesce(F.col("_fw_y1s"), F.array().cast("array<long>"))
    band = (
        F.lit(2)
        * F.size(F.filter(cuts, lambda v: v <= F.col("y0")))
        + F.col("_is_fw").cast("int")
    )
    col_idx = F.when(F.col("_is_fw"), F.lit(0)).otherwise(
        F.when(F.col("x0") + F.col("x1") < F.lit(int(page_width)),
               F.lit(1)).otherwise(F.lit(2))
    )
    ordered = F.array_sort(
        F.collect_list(
            F.struct(
                band.alias("band"),
                col_idx.alias("col"),
                F.col("y0").alias("y0"),
                F.col("x0").alias("x0"),
                F.col(block_col).alias("blk"),
                F.col(text_col).alias("txt"),
            )
        )
    )
    return (
        j.groupBy(doc.alias("doc_id"), page.alias("page"))
        .agg(
            F.array_join(
                F.transform(ordered, lambda s: s["txt"]), "\n"
            ).alias("page_text"),
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum(F.col("_is_fw").cast("int")).alias("n_fullwidth"),
        )
    )


def anchor_text_stats(
    links: DataFrame,
    url_col: str = "canonical_url",
    text_col: str = "anchor_text",
) -> DataFrame:
    """Aggregate the link graph's anchor texts per target URL — the
    classic document-expansion signal (what OTHER pages call a target
    is often a better description than the target's own words; the
    anchor-text index of web search, and a standard web-corpus
    enrichment column).

    Input is an exploded link table (:func:`extract_links` output with
    a canonicalized URL column); rows with a NULL URL or an
    empty/whitespace anchor are ignored.  Output per target URL:

    ``(canonical_url, n_anchors, n_texts, top_count, top_anchor)``

    where ``top_anchor`` is the MODE of the trimmed anchor texts, ties
    broken by the lexicographically smallest text — a total order, so
    any two engines and any partitioning elect the same representative.

    Scale shape: two shrinking aggregations — ``(url, text)`` counts
    (map-side combine absorbs within-page repetition) then per-url
    stats — plus a self-join of the distinct-pair table against the
    per-url max to extract the mode.  Everything after the first agg is
    distinct-pair-sized, not link-sized; no windows, no corpus shuffle
    beyond the two keys.
    """
    pairs = links.select(
        F.col(url_col).alias("canonical_url"),
        F.trim(F.col(text_col)).alias("atext"),
    ).where(
        F.col("canonical_url").isNotNull() & (F.length("atext") > 0)
    )
    from memo_fraktur_ocr_code_spark.operators.aggregates import (
        mode_per_key,
    )

    cnt = pairs.groupBy("canonical_url", "atext").agg(
        F.count(F.lit(1)).alias("c")
    )
    stats = cnt.groupBy("canonical_url").agg(
        F.sum("c").alias("n_anchors"),
        F.count(F.lit(1)).alias("n_texts"),
    )
    mode = (
        mode_per_key(cnt, ["canonical_url"], "atext")
        .withColumnRenamed("mode_count", "top_count")
        .withColumnRenamed("mode_value", "top_anchor")
    )
    return stats.join(mode, "canonical_url").select(
        "canonical_url", "n_anchors", "n_texts", "top_count",
        "top_anchor",
    )
