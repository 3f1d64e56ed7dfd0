"""Declarative DOM capture — the selector half of the reference's 15
per-site Common Crawl scrapers (providers/commoncrawl/*.py, ~2,779
LoC of BeautifulSoup ``find``/``findChild``/``find_all`` calls).

The reference walks a parsed soup imperatively per site.  Here the
selector set of ALL sites compiles to one declarative rule list per
site, and a single stdlib-``HTMLParser`` pass per page evaluates every
rule at once — no BeautifulSoup, no per-site parser code.  The page
pass is per-row independent (Arrow-batched pandas UDF, mapInPandas
friendly → embarrassingly parallel at 100 TB); everything downstream
of capture (field mapping, license resolution, row filters) is Column
algebra in ``operators/provider_specs_cc.py``.

Rule semantics (modeled on the BeautifulSoup calls in the scrapers):

- ``tag``: element name, or tuple of names.
- ``attrs``: {attr: matcher} where matcher is ``True`` (attribute
  present — BS4 ``{'href': True}``), ``None`` (attribute ABSENT —
  BS4 ``{'title': None}``, EOL.py:132), a string (equal to the raw
  attribute value, or all its whitespace tokens present in the
  element's token list — BS4 multi-valued class matching), or
  ``re:<pattern>`` (``re.search`` over the raw value — BS4
  ``re.compile`` filters).
- ``within``: name of another rule; this rule only matches inside an
  element matched by that rule (``findChild``).  Chains compose.
- ``get``: ``"text"`` (whitespace-normalized descendant text),
  ``"text_direct"`` (the element's own text nodes only —
  ``.contents[0]``-style, ThorvaldsensMuseum.py:88), ``"text_raw"``
  (descendant text stripped but NOT collapsed — for scrapers that
  split on internal whitespace runs, DigitaltMuseum.py:84-90), an
  attribute name, or a LIST of attribute names — the atomic
  multi-attribute read: every attribute comes off the SAME element
  as one {attr: value} dict in the group output. Non-multi list
  rules claim the FIRST matching element (``soup.find`` + several
  attr reads); ``multi=True`` emits one dict per element (the
  ``find_all`` over void elements like ``img``,
  ScienceMuseum.py:118).
  ``get=None`` marks a pure SCOPE rule: it captures nothing itself
  and only provides ``within`` context; with ``multi=True`` each
  scope match opens a fresh group instance (the scrapers' per-card
  ``for item in soup.find_all(...)`` loops).
- ``multi``: capture every match (else first match wins). Multi
  rules resolve empty/missing values to "" so sibling multi captures
  over the same element set stay positionally aligned (specs zip
  them); non-multi rules drop empty claims (``soup.find`` returned
  the element, it just had no value).
- A valueless attribute (``<a href>``) is PRESENT with value "" —
  BS4 semantics for minimized/boolean attributes.

Output per page (JSON, parsed by ``CAPS_SCHEMA``):
``{"f": {name: [values...]}, "g": {name: [{k: v}...]}}`` — ``f`` holds
flat rule captures, ``g`` holds group instances (one map per scope
match or per attr-dict match).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass
from html.parser import HTMLParser

import pandas as pd

from pyspark.sql import Column

CAPS_SCHEMA = (
    "struct<f: map<string,array<string>>, "
    "g: map<string,array<map<string,string>>>>"
)

# elements that never take an end tag: capture attrs at the start tag
# and never push them on the open-element stack
_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}

_MULTI_SEP = "\x1f"  # joins multi child captures inside one group


@dataclass(frozen=True)
class Rule:
    name: str
    tag: str | tuple[str, ...]
    attrs: dict | None = None
    within: str | None = None
    get: str | list[str] | None = "text"
    multi: bool = False


def _compile_matcher(matcher):
    if matcher is True or matcher is None:
        return matcher
    if isinstance(matcher, str) and matcher.startswith("re:"):
        return re.compile(matcher[3:])
    return str(matcher)


class _CompiledRule:
    __slots__ = (
        "rule", "tags", "attrs", "is_scope", "attr_list", "group_owner",
        "chain",
    )

    def __init__(self, rule: Rule):
        self.rule = rule
        self.tags = (
            {rule.tag} if isinstance(rule.tag, str) else set(rule.tag)
        )
        self.attrs = {
            k: _compile_matcher(v) for k, v in (rule.attrs or {}).items()
        }
        self.is_scope = rule.get is None
        self.attr_list = rule.get if isinstance(rule.get, list) else None
        self.group_owner: str | None = None  # nearest multi scope
        self.chain: list[str] = []  # within ancestry, innermost first

    def matches(self, tag: str, attrs: dict[str, str | None]) -> bool:
        if tag not in self.tags:
            return False
        for k, m in self.attrs.items():
            v = attrs.get(k)
            if m is True:
                if v is None:
                    return False
            elif m is None:
                if v is not None:
                    return False
            elif isinstance(m, re.Pattern):
                if v is None or not m.search(v):
                    return False
            else:
                if v is None:
                    return False
                if v != m:
                    # token-subset matching applies only to the
                    # MULTI-VALUED attributes BS4 treats as token
                    # lists (class, rel); single-valued attrs
                    # (title/id/property/...) require exact equality
                    if k not in ("class", "rel"):
                        return False
                    want = m.split()
                    have = v.split()
                    if not want or not all(t in have for t in want):
                        return False
        return True


def compile_rules(rules: list[Rule]) -> list[_CompiledRule]:
    by_name: dict[str, Rule] = {}
    for r in rules:
        if r.name in by_name:
            raise ValueError(f"duplicate rule name {r.name!r}")
        by_name[r.name] = r
    compiled = [_CompiledRule(r) for r in rules]
    for c in compiled:
        # fail fast on authoring errors: an unknown `within` target or
        # a within-cycle would otherwise surface as a KeyError (or an
        # infinite loop) inside every executor's UDF batch
        chain, cur, seen = [], c.rule.within, set()
        while cur is not None:
            if cur in seen:
                raise ValueError(
                    f"rule {c.rule.name!r}: 'within' cycle via {cur!r}"
                )
            seen.add(cur)
            parent = by_name.get(cur)
            if parent is None:
                raise ValueError(
                    f"rule {c.rule.name!r}: unknown 'within' target {cur!r}"
                )
            chain.append(cur)
            if parent.get is None and parent.multi and c.group_owner is None:
                c.group_owner = cur
            cur = parent.within
        c.chain = chain
    return compiled


class _Capture(HTMLParser):
    """One pass over one page evaluating every compiled rule.

    Capture SLOTS are reserved at element-OPEN time and text fills in
    at element close, so both capture order (multi) and first-match
    claims (non-multi) follow DOCUMENT order — the order a tree-walk
    (``soup.find``) sees — even when matching elements nest. A
    non-multi slot claimed by the first matching element stays claimed
    even if that element's text turns out empty (``soup.find`` returns
    the first ELEMENT; an empty one yields no value, not the next
    element's value). Empty non-multi slots drop at finalize; empty
    MULTI slots resolve to "" so sibling multi captures over the same
    element set stay positionally aligned (``find_all`` yields every
    element, empty or not).
    """

    def __init__(self, compiled: list[_CompiledRule]):
        super().__init__(convert_charrefs=True)
        self.rules = compiled
        # during the parse, values are mutable 1-slot lists; finalize()
        # resolves them to plain strings and drops unfilled slots
        self.flat: dict[str, list[list]] = {}
        self.groups: dict[str, list[dict]] = {}
        # open-element stack: (tag, text_collectors, scopes_opened)
        self.stack: list[tuple[str, list, list[str]]] = []
        # scope name -> stack of (depth, instance dict | None)
        self.open_scopes: dict[str, list[tuple[int, dict | None]]] = {}
        self._multi = {c.rule.name: c.rule.multi for c in compiled}
        # (instance id | "", rule name) claims for atomic attr-list
        # rules: the FIRST matching element provides the whole dict
        self._claimed: set[tuple] = set()

    # -- capture plumbing ---------------------------------------------------
    def _scope_open(self, name: str) -> bool:
        s = self.open_scopes.get(name)
        return bool(s)

    def _target(self, c: _CompiledRule) -> dict | None:
        """Group instance dict for a rule owned by a multi scope, else
        None → flat."""
        if c.group_owner is None:
            return None
        return self.open_scopes[c.group_owner][-1][1]

    def _reserve(self, c: _CompiledRule) -> list | None:
        """Claim a capture slot in document order; None when a
        non-multi rule's slot is already claimed."""
        r = c.rule
        inst = self._target(c)
        if inst is None:
            slots = self.flat.setdefault(r.name, [])
        else:
            slots = inst.setdefault(r.name, [])
        if not r.multi and slots:
            return None
        slot = [None]
        slots.append(slot)
        return slot

    def _store(self, c: _CompiledRule, value: str) -> None:
        slot = self._reserve(c)
        if slot is not None:
            slot[0] = value

    # -- parser hooks -------------------------------------------------------
    def _handle_tag(self, tag: str, attr_pairs, self_closing: bool) -> None:
        attrs: dict[str, str] = {}
        for k, v in attr_pairs:
            # a valueless attribute (<a href>) parses as value None but
            # IS present — BS4 models it as "", and the {attr: True}
            # presence / {attr: None} absence matchers must agree
            attrs.setdefault(k, "" if v is None else v)
        void = self_closing or tag in _VOID
        collectors: list = []
        scopes_opened: list[str] = []
        for c in self.rules:
            if not c.matches(tag, attrs):
                continue
            if any(not self._scope_open(n) for n in c.chain):
                continue
            r = c.rule
            if c.is_scope:
                if void:
                    continue  # a scope needs a subtree
                inst: dict | None = None
                if r.multi:
                    inst = {}
                    self.groups.setdefault(r.name, []).append(inst)
                self.open_scopes.setdefault(r.name, []).append(
                    (len(self.stack), inst)
                )
                scopes_opened.append(r.name)
            elif c.attr_list is not None:
                # whole dict from ONE element — the atomic multi-attr
                # read a scraper's `img = soup.find(...); img['src'],
                # img['width'], ...` does. Non-multi: the FIRST matching
                # element claims (soup.find — even when it is missing
                # some attrs; later elements never fill the gaps).
                # Multi: every element emits (find_all).
                d = {
                    f"{r.name}.{a}": attrs[a]
                    for a in c.attr_list
                    if attrs.get(a) is not None
                }
                inst = self._target(c)
                if inst is not None:
                    key = (id(inst), r.name)
                    if r.multi:
                        for k, v in d.items():
                            inst.setdefault(k, v)
                    elif key not in self._claimed:
                        self._claimed.add(key)
                        inst.update(d)
                elif r.multi:
                    if d:
                        self.groups.setdefault(r.name, []).append(d)
                else:
                    key = ("", r.name)
                    if key not in self._claimed:
                        self._claimed.add(key)
                        self.groups.setdefault(r.name, []).append(d)
            elif r.get in ("text", "text_direct", "text_raw"):
                if not void:
                    slot = self._reserve(c)
                    if slot is not None:
                        collectors.append(
                            [c, [], len(self.stack) + 1, slot]
                        )
            else:
                # single-attr capture: every matching element claims a
                # slot in document order, even when the attribute is
                # missing (soup.find returns the ELEMENT; a missing
                # attr yields no value, not the next element's value).
                # Multi rules take "" placeholders for missing attrs so
                # sibling multi captures over the same elements stay
                # positionally aligned (arrays_zip pairing in specs).
                slot = self._reserve(c)
                if slot is not None:
                    v = attrs.get(r.get)
                    slot[0] = ("" if v is None else v) if r.multi else v
        if not void:
            self.stack.append((tag, collectors, scopes_opened))

    def handle_starttag(self, tag, attr_pairs):
        self._handle_tag(tag, attr_pairs, False)

    def handle_startendtag(self, tag, attr_pairs):
        self._handle_tag(tag, attr_pairs, True)

    def handle_data(self, data):
        depth = len(self.stack)
        for _, collectors, _ in self.stack:
            for col in collectors:
                c, chunks, own_depth, _slot = col
                if c.rule.get == "text_direct" and depth != own_depth:
                    continue
                chunks.append(data)

    def _pop(self) -> None:
        _, collectors, scopes_opened = self.stack.pop()
        for c, chunks, _d, slot in collectors:
            raw = "".join(chunks)
            text = raw.strip() if c.rule.get == "text_raw" else (
                " ".join(raw.split())
            )
            if text:
                slot[0] = text
        for name in scopes_opened:
            self.open_scopes[name].pop()

    def handle_endtag(self, tag):
        # pop up to and including the nearest matching open tag;
        # tolerate mis-nesting by ignoring unmatched end tags
        for i in range(len(self.stack) - 1, -1, -1):
            if self.stack[i][0] == tag:
                while len(self.stack) > i:
                    self._pop()
                return

    def close(self):
        super().close()
        while self.stack:
            self._pop()

    def _resolve(self, name: str, slots: list[list]) -> list | None:
        """Slot lists → value lists. Multi rules keep "" placeholders
        for unfilled slots so parallel multi captures over the same
        elements stay index-aligned; non-multi claims drop empties."""
        if self._multi.get(name):
            return ["" if s[0] is None else s[0] for s in slots] or None
        vals = [s[0] for s in slots if s[0] is not None]
        return vals or None

    def finalize(self) -> tuple[dict, dict]:
        flat = {}
        for name, slots in self.flat.items():
            vals = self._resolve(name, slots)
            if vals is not None:
                flat[name] = vals
        groups = {}
        for name, insts in self.groups.items():
            out = []
            for inst in insts:
                d = {}
                for k, v in inst.items():
                    if isinstance(v, list):  # slot list (text/attr rule)
                        vals = self._resolve(k, v)
                        if vals is not None:
                            d[k] = _MULTI_SEP.join(vals)
                    else:  # attr-dict capture: already a plain string
                        d[k] = v
                out.append(d)
            groups[name] = out
        return flat, groups


def capture_page(html: str | None, compiled: list[_CompiledRule]):
    """One page → ``{"f": {...}, "g": {...}}`` (None on parse failure)."""
    if html is None:
        return None
    p = _Capture(compiled)
    try:
        p.feed(html)
        p.close()
    except Exception:
        return None
    flat, groups = p.finalize()
    return {"f": flat, "g": groups}


def capture_col(html_col: Column, rules: list[Rule]) -> Column:
    """Arrow-batched column form: html string → ``CAPS_SCHEMA`` struct.

    The rule list is tiny (closure-captured, serialized once per task,
    compiled once per executor batch) — no per-row recompilation.
    """
    from pyspark.sql.functions import from_json, pandas_udf

    compile_rules(rules)  # validate spec authoring driver-side

    @pandas_udf("string")
    def _udf(s: pd.Series) -> pd.Series:
        compiled = compile_rules(rules)
        out = []
        for h in s:
            caps = capture_page(h, compiled)
            out.append(
                None if caps is None else json.dumps(caps, ensure_ascii=False)
            )
        return pd.Series(out, dtype="object")

    # asNondeterministic is a plan pin, not a semantics statement: the
    # parse IS deterministic, but Catalyst otherwise pushes the spec's
    # required-field filters below the projection and DUPLICATES the
    # ArrowEvalPython node — the page parse (the dominant cost at
    # 100 TB) would run twice per row. Nondeterministic expressions are
    # never duplicated or pushed, so the parse stays single-evaluation.
    return from_json(_udf.asNondeterministic()(html_col), CAPS_SCHEMA)
