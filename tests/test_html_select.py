"""Unit tests for the declarative DOM capture engine
(functions/html_select) — pure Python, no Spark session needed for the
parser itself. Covers the matcher semantics modeled on BeautifulSoup
and the malformed-HTML tolerance a Common Crawl corpus demands."""

from __future__ import annotations

from cccatalog_spark.functions.html_select import (
    Rule,
    capture_page,
    compile_rules,
)


def cap(html, rules):
    return capture_page(html, compile_rules(rules))


def test_attr_matchers_presence_absence_token_regex():
    html = """
    <a href="/x" rel="license">with</a>
    <a rel="license">nohref</a>
    <p title="t">titled</p><p>untitled</p>
    <div class="a b c">tokens</div>
    <span class="user-name">regex</span>"""
    out = cap(html, [
        Rule("href_req", "a", {"rel": "license", "href": True}, get="href"),
        Rule("no_title", "p", {"title": None}, get="text", multi=True),
        Rule("tokens", "div", {"class": "c a"}, get="text"),
        Rule("rx", "span", {"class": "re:name$"}, get="text"),
    ])
    assert out["f"]["href_req"] == ["/x"]
    assert out["f"]["no_title"] == ["untitled"]
    assert out["f"]["tokens"] == ["tokens"]
    assert out["f"]["rx"] == ["regex"]


def test_first_match_wins_vs_multi():
    html = "<b>one</b><b>two</b>"
    out = cap(html, [
        Rule("first", "b", get="text"),
        Rule("all", "b", get="text", multi=True),
    ])
    assert out["f"]["first"] == ["one"]
    assert out["f"]["all"] == ["one", "two"]


def test_text_normalization_and_text_direct():
    html = "<div class='d'>A  \n B <i>child</i> C</div>"
    out = cap(html, [
        Rule("t", "div", {"class": "d"}, get="text"),
        Rule("td", "div", {"class": "d"}, get="text_direct"),
    ])
    assert out["f"]["t"] == ["A B child C"]
    assert out["f"]["td"] == ["A B C"]


def test_within_scope_and_nested_groups():
    html = """
    <div class="outer">
      <div class="card"><a href="/1">x</a></div>
      <div class="card"><div class="inner"><a href="/2">y</a></div></div>
    </div>
    <a href="/outside">z</a>"""
    out = cap(html, [
        Rule("card", "div", {"class": "card"}, get=None, multi=True),
        Rule("link", "a", {"href": True}, within="card", get="href"),
    ])
    assert [g.get("link") for g in out["g"]["card"]] == ["/1", "/2"]


def test_same_element_opens_scope_then_captures_attr():
    # rule order matters: the scope opens first, then a later rule
    # matching the SAME element captures its attr into the instance
    html = '<span class="slide" about="/img/1"><b>x</b></span>'
    out = cap(html, [
        Rule("slide", "span", {"class": "slide"}, get=None, multi=True),
        Rule("about", "span", {"class": "slide"}, within="slide",
             get="about"),
    ])
    assert out["g"]["slide"] == [{"about": "/img/1"}]


def test_attr_dict_groups_are_name_prefixed():
    html = '<img src="/a.png" width="5"><img src="/b.png">'
    # non-multi = soup.find: the FIRST matching element provides the
    # whole dict; multi = find_all: one dict per element
    out = cap(html, [Rule("im", "img", {"src": True},
                          get=["src", "width"])])
    assert out["g"]["im"] == [{"im.src": "/a.png", "im.width": "5"}]
    out = cap(html, [Rule("im", "img", {"src": True},
                          get=["src", "width"], multi=True)])
    assert out["g"]["im"] == [
        {"im.src": "/a.png", "im.width": "5"}, {"im.src": "/b.png"}
    ]


def test_attr_dict_first_claim_is_atomic():
    # the spinner case: first img lacks title/width — its claim stays;
    # the later element's attrs must NOT fill the gaps (the reference
    # reads every attr off the single soup.find result)
    html = ('<div class="ph"><img src="spinner.gif">'
            '<img src="big.jpg" title="Real" width="9"></div>')
    out = cap(html, [Rule("im", "img", {"src": True},
                          get=["src", "title", "width"])])
    assert out["g"]["im"] == [{"im.src": "spinner.gif"}]


def test_multi_slots_keep_positional_alignment():
    # anchors with empty text keep "" placeholders so parallel multi
    # captures zip index-aligned (the capl_grid 'l'-anchor pairing)
    html = ('<span class="x"><a href="/s"></a><a href="/l">l</a></span>')
    out = cap(html, [
        Rule("hrefs", "a", {"href": True}, get="href", multi=True),
        Rule("texts", "a", {"href": True}, get="text", multi=True),
    ])
    assert out["f"]["hrefs"] == ["/s", "/l"]
    assert out["f"]["texts"] == ["", "l"]


def test_bare_attribute_is_present_with_empty_value():
    # <a href> minimized attribute: present for {href: True}, absent
    # matcher {title: None} must NOT match an element bearing title
    html = '<a href>x</a><p title>y</p><p>z</p>'
    out = cap(html, [
        Rule("a", "a", {"href": True}, get="text"),
        Rule("p", "p", {"title": None}, get="text"),
    ])
    assert out["f"]["a"] == ["x"]
    assert out["f"]["p"] == ["z"]


def test_within_cycle_and_unknown_target_fail_fast():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="cycle"):
        compile_rules([
            Rule("a", "div", within="b", get=None),
            Rule("b", "div", within="a", get=None),
        ])
    with _pytest.raises(ValueError, match="unknown 'within'"):
        compile_rules([Rule("a", "div", within="nope", get="text")])
    with _pytest.raises(ValueError, match="duplicate"):
        compile_rules([Rule("a", "div"), Rule("a", "span")])


def test_malformed_html_unclosed_and_misnested_tags():
    # unclosed <div>, stray </em>, mis-nested <b><i></b></i> — the
    # parser must not lose captures before or after the damage
    html = """
    <div class="a">first
    <b><i>deep</b></i>
    </em>
    <span class="t">after</span>"""
    out = cap(html, [
        Rule("a", "div", {"class": "a"}, get="text"),
        Rule("t", "span", {"class": "t"}, get="text"),
    ])
    # the unclosed div's text finalizes at document close
    assert out["f"]["t"] == ["after"]
    assert "first" in out["f"]["a"][0]


def test_void_and_self_closing_elements_never_open_scopes():
    html = '<img class="s" src="/x"><p>after</p>'
    out = cap(html, [
        Rule("s", "img", {"class": "s"}, get=None, multi=True),  # scope on
        # a void element is impossible — must not swallow the document
        Rule("p", "p", get="text"),
        Rule("src", "img", {"class": "s"}, get="src"),
    ])
    assert "s" not in out["g"]
    assert out["f"]["p"] == ["after"]
    assert out["f"]["src"] == ["/x"]


def test_duplicate_attrs_first_wins_and_entities_decode():
    html = '<a href="/one" href="/two">x &amp; y</a>'
    out = cap(html, [
        Rule("h", "a", {"href": True}, get="href"),
        Rule("t", "a", get="text"),
    ])
    assert out["f"]["h"] == ["/one"]
    assert out["f"]["t"] == ["x & y"]


def test_multi_child_in_group_joins_with_unit_separator():
    html = """
    <div class="card"><p class="tags"><a>x</a><a>y</a></p></div>"""
    out = cap(html, [
        Rule("card", "div", {"class": "card"}, get=None, multi=True),
        Rule("tagp", "p", {"class": "tags"}, within="card", get=None),
        Rule("tags", "a", within="tagp", get="text", multi=True),
    ])
    assert out["g"]["card"] == [{"tags": "x\x1fy"}]


def test_none_html_and_empty_page():
    assert capture_page(None, compile_rules([Rule("x", "a")])) is None
    assert cap("", [Rule("x", "a")]) == {"f": {}, "g": {}}
