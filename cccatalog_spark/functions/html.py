"""F22/F23 — HTML text / metadata extraction (SURVEY §2.8), and the
text half of the WAT archive scan (S2).

The reference scrapes provider pages with lxml/BeautifulSoup inside
its ~15 HTML scraper scripts; the extraction ITSELF is pure
computation — only the fetch is a network effect. This module runs the
extraction engine-side with the stdlib ``html.parser`` (no lxml in
this environment, none needed): strip script/style/template subtrees,
collect visible text, the <title>, anchor hrefs, and og:/meta
properties — the fields a web-corpus training pipeline keeps per page.

Shape: one Arrow-batched pandas UDF per page batch (mapInPandas
friendly). Parsing is per-row independent → embarrassingly parallel;
no shuffle is introduced by extraction itself.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd

from pyspark.sql import Column

_SKIP_SUBTREES = {"script", "style", "template", "noscript"}
# block boundaries become line breaks; newlines INSIDE text data are
# plain whitespace (HTML semantics), so blocks are marked with a
# sentinel and each block's internal whitespace collapses to spaces
_BLOCK_SEP = "\x00"

_BLOCK_TAGS = {
    "p", "div", "br", "li", "tr", "h1", "h2", "h3", "h4", "h5", "h6",
    "section", "article", "header", "footer", "blockquote", "pre",
}


class _Extractor(HTMLParser):
    """Single-pass extractor: visible text, title, hrefs, meta map."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.chunks: list[str] = []
        self.title_chunks: list[str] = []
        self.links: list[str] = []
        self.images: list[str] = []
        self.meta: dict[str, str] = {}
        self._skip_depth = 0
        self._in_title = False

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_SUBTREES:
            self._skip_depth += 1
            return
        if tag == "title":
            self._in_title = True
        elif tag == "a":
            href = dict(attrs).get("href")
            if href:
                self.links.append(href)
        elif tag == "img":
            src = dict(attrs).get("src")
            if src:
                self.images.append(src)
        elif tag == "meta":
            a = dict(attrs)
            key = a.get("property") or a.get("name")
            if key and "content" in a:
                self.meta.setdefault(key, a["content"] or "")
        elif tag in _BLOCK_TAGS:
            self.chunks.append(_BLOCK_SEP)

    def handle_endtag(self, tag):
        if tag in _SKIP_SUBTREES:
            self._skip_depth = max(0, self._skip_depth - 1)
        elif tag == "title":
            self._in_title = False
        elif tag in _BLOCK_TAGS:
            self.chunks.append(_BLOCK_SEP)

    def handle_data(self, data):
        if self._skip_depth:
            return
        if self._in_title:
            self.title_chunks.append(data)
        else:
            self.chunks.append(data)


def extract_page(html: str | None) -> dict | None:
    """One page → {title, text, links, images, meta}. Whitespace in the
    visible text collapses per line, blank lines drop — the
    normalization every HTML→text corpus step performs."""
    if html is None:
        return None
    p = _Extractor()
    try:
        p.feed(html)
        p.close()
    except Exception:
        return None
    raw = "".join(p.chunks)
    lines = [" ".join(ln.split()) for ln in raw.split(_BLOCK_SEP)]
    text = "\n".join(ln for ln in lines if ln)
    return {
        "title": " ".join("".join(p.title_chunks).split()) or None,
        "text": text,
        "links": p.links,
        "images": p.images,
        "meta": p.meta,
    }


PAGE_SCHEMA = (
    "title string, text string, links array<string>, "
    "images array<string>, meta map<string,string>"
)


def extract_page_col(html_col: Column) -> Column:
    """Arrow-batched column form: html string → struct(title, text,
    links, meta)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(f"struct<{PAGE_SCHEMA}>")
    def _udf(s: pd.Series) -> pd.DataFrame:
        rows = [
            extract_page(h) or {"title": None, "text": None,
                                "links": None, "images": None,
                                "meta": None}
            for h in s
        ]
        return pd.DataFrame(rows)

    # plan pin (the parse IS deterministic): without this, Catalyst
    # pushes downstream filters below the projection and duplicates
    # the ArrowEvalPython node — the page parse would run twice per
    # row, doubling the dominant cost of a 100 TB WAT scan.
    return _udf.asNondeterministic()(html_col)
