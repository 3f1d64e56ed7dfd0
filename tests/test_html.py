"""F22/F23 HTML extraction via stdlib html.parser: visible-text
normalization, subtree stripping, entity decoding, link/meta lifting."""

from __future__ import annotations

from cccatalog_spark.functions.html import extract_page


def test_extract_strips_script_style_and_decodes_entities():
    page = extract_page(
        "<html><head><title>T &amp; U</title>"
        "<script>var a='<p>fake</p>';</script>"
        "<style>p{}</style></head>"
        "<body><p>A&nbsp;&lt;b&gt;</p><noscript>no</noscript></body></html>"
    )
    assert page["title"] == "T & U"
    # &nbsp; decodes to \xa0 (unicode whitespace → collapses to space)
    assert page["text"] == "A <b>"
    # entities decoded, script/style/noscript content absent
    assert "fake" not in page["text"]
    assert "no" not in page["text"].split()
    assert "<b>" in page["text"]


def test_extract_block_tags_break_lines_and_collapse_ws():
    page = extract_page(
        "<body><p>  one\n  word </p><div>two</div>three</body>"
    )
    assert page["text"].split("\n") == ["one word", "two", "three"]


def test_extract_links_and_meta():
    page = extract_page(
        '<head><meta property="og:title" content="OT">'
        '<meta name="description" content="D">'
        '<meta name="nocontent"></head>'
        '<body><a href="/x">x</a><a>no-href</a><a href="https://y">y</a>'
        "</body>"
    )
    assert page["links"] == ["/x", "https://y"]
    assert page["meta"] == {"og:title": "OT", "description": "D"}


def test_extract_handles_none_and_garbage():
    assert extract_page(None) is None
    # malformed html still yields best-effort text, never raises
    page = extract_page("<p>ok<div></wat><<<")
    assert "ok" in page["text"]


def test_extract_meta_first_wins():
    page = extract_page(
        '<meta name="k" content="first"><meta name="k" content="second">'
    )
    assert page["meta"]["k"] == "first"
