"""Property test: the single-pass capture engine vs an independent
two-pass model (build a DOM tree, then interpret the rules over it —
the BeautifulSoup evaluation order the reference scrapers assume).
Hypothesis generates random well-formed documents; any divergence in
scope handling, first-match ordering, text collection, or group
instancing between the streaming engine and the tree-walk model fails
here."""

from __future__ import annotations

from html.parser import HTMLParser

from hypothesis import given, settings
from hypothesis import strategies as st

from cccatalog_spark.functions.html_select import (
    Rule,
    capture_page,
    compile_rules,
)

# -- independent model: DOM build + recursive rule interpreter ----------


class _Node:
    def __init__(self, tag, attrs):
        self.tag = tag
        self.attrs = attrs
        self.children: list = []  # _Node | str


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root", {})
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        d = {}
        for k, v in attrs:
            # bare attribute = present with "" (BS4 semantics)
            d.setdefault(k, "" if v is None else v)
        node = _Node(tag, d)
        self.stack[-1].children.append(node)
        self.stack.append(node)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        self.stack[-1].children.append(data)


def _text(node) -> str:
    parts = []

    def walk(n):
        for ch in n.children:
            if isinstance(ch, str):
                parts.append(ch)
            else:
                walk(ch)

    walk(node)
    return " ".join("".join(parts).split())


def _matches(node, rule: Rule) -> bool:
    if node.tag != rule.tag:
        return False
    for k, m in (rule.attrs or {}).items():
        v = node.attrs.get(k)
        if m is True:
            if v is None:
                return False
        elif v is None or (
            v != m
            and not (
                k in ("class", "rel")
                and m.split()
                and all(t in v.split() for t in m.split())
            )
        ):
            return False
    return True


def _find_all(node, rule: Rule, stop: Rule | None = None) -> list:
    """Matching descendants in document order. With ``stop``, do not
    descend into nested elements matching ``stop`` — the engine's
    documented group semantics: a child capture belongs to the
    INNERMOST open scope instance, so an outer instance never sees
    captures that a nested instance claims."""
    out = []

    def walk(n):
        for ch in n.children:
            if isinstance(ch, str):
                continue
            if _matches(ch, rule):
                out.append(ch)
            if stop is not None and _matches(ch, stop):
                continue
            walk(ch)

    walk(node)
    return out


def model_capture(html: str, rules: list[Rule]) -> dict:
    """Two-pass reference semantics for the rule shapes used here:
    flat rules (within=None) over the document; child rules inside
    each instance of their multi-scope parent (document order)."""
    b = _TreeBuilder()
    b.feed(html)
    b.close()
    root = b.root
    by_name = {r.name: r for r in rules}
    flat: dict[str, list[str]] = {}
    groups: dict[str, list[dict]] = {}
    def _rule_values(scope_node, r, stop=None):
        """Engine slot semantics: every matched element claims a slot
        in document order (an empty first element yields nothing for a
        non-multi rule — not the next element's value). Multi rules
        keep "" placeholders for empty/missing values so sibling multi
        captures stay positionally aligned."""
        hits = _find_all(scope_node, r, stop=stop)
        if r.get == "text":
            per_hit = [_text(h) or None for h in hits]
        else:
            per_hit = [h.attrs.get(r.get) for h in hits]
        if not r.multi:
            return [v for v in per_hit[:1] if v is not None]
        return ["" if v is None else v for v in per_hit]

    for r in rules:
        if r.get is None:
            continue  # scopes captured via their children
        if r.within is None:
            vals = _rule_values(root, r)
            if vals:
                flat[r.name] = vals
    for r in rules:
        if r.get is None and r.multi:
            insts = []
            for scope_node in _find_all(root, r):
                inst = {}
                for child in rules:
                    if child.within != r.name or child.get is None:
                        continue
                    vals = _rule_values(scope_node, child, stop=r)
                    if vals:
                        inst[child.name] = "\x1f".join(vals)
                insts.append(inst)
            if insts:
                groups[r.name] = insts
    return {"f": flat, "g": groups}


# -- document generator -------------------------------------------------

_WORD = st.text(
    alphabet="abcdef xyz", min_size=1, max_size=8
).map(lambda s: s.strip() or "w")

_ATTRS = st.fixed_dictionaries(
    {},
    optional={
        "class": st.sampled_from(
            ["card", "card big", "author", "text block", "misc"]
        ),
        "href": st.sampled_from(["/a", "/b", "http://x/y"]),
        "title": st.sampled_from(["t1", "All tagged images"]),
    },
)


def _render(tag, attrs, inner):
    a = "".join(f' {k}="{v}"' for k, v in attrs.items())
    return f"<{tag}{a}>{inner}</{tag}>"


_node = st.deferred(
    lambda: st.one_of(
        _WORD,
        st.builds(
            _render,
            st.sampled_from(["div", "span", "a", "p", "small"]),
            _ATTRS,
            st.lists(_node, max_size=3).map("".join),
        ),
    )
)

_DOC = st.lists(_node, min_size=1, max_size=6).map("".join)

RULES = [
    Rule("lic", "a", {"href": True}, get="href"),
    Rule("all_a", "a", {"href": True}, get="href", multi=True),
    Rule("desc", "div", {"class": "text block"}, get="text"),
    Rule("titled", "a", {"title": "All tagged images"}, get="text",
         multi=True),
    Rule("card", "div", {"class": "card"}, get=None, multi=True),
    Rule("c_link", "a", {"href": True}, within="card", get="href"),
    Rule("c_text", "span", within="card", get="text", multi=True),
]


@settings(max_examples=150, deadline=None)
@given(_DOC)
def test_engine_equals_tree_model(doc):
    engine = capture_page(doc, compile_rules(RULES))
    model = model_capture(doc, RULES)
    assert engine == model, doc
