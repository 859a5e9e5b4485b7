"""Minimal HTML DOM with bs4-compatible semantics for the extraction ops.

The reference extracts text with BeautifulSoup (archive/full_text_CrawlerAsync.py
:212-400).  bs4/lxml are not available in this environment, so this module
implements — on top of the stdlib ``html.parser`` — exactly the subset of DOM
semantics the reference extractor depends on:

- ``find`` / ``find_all`` with tag-name and attribute matching (``class``
  matched as a token within the class list, other attrs matched exactly),
- ``node.string`` (the single-text-child accessor used on <script> tags),
- ``get_text(strip=True)``: concatenation of each text node stripped, empty
  chunks dropped, no separator — bs4's behavior for
  ``get_text(separator='', strip=True)``,
- a CSS ``select`` subset: selector groups (","), descendant and child (">")
  combinators, ``tag``, ``#id``, ``.class`` (stackable), ``[attr*="v"]``,
  ``:nth-child(n)``,
- ``decompose()``.

This is plain deterministic Python used ONLY inside Arrow-batched pandas UDFs
(never per-row driver code), so it is the vectorized extraction path the north
rule requires.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# tags that imply auto-closing of an open <p> (enough for our page shapes)
_P_CLOSERS = frozenset("p div ul ol li table article section nav header footer aside".split())


class Node:
    __slots__ = ("tag", "attrs", "children", "parent", "_pos", "_end", "_elements")

    def __init__(self, tag: str, attrs: dict | None = None, parent: "Node | None" = None):
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list = []  # Node or str (text)
        self.parent = parent
        # document-order element index maintained by the tree builder: _pos is
        # this element's pre-order position, _end the position just past its
        # last descendant, so the subtree is the contiguous slice
        # elements[_pos+1:_end].  _elements is set on the root only;
        # decompose() invalidates it and traversal falls back to walking.
        self._pos = None
        self._end = None
        self._elements = None

    # -- tree traversal -----------------------------------------------------
    def _doc_elements(self):
        node = self
        while node.parent is not None:
            node = node.parent
        return node._elements

    def descendants(self):
        """Pre-order element descendants (excluding self)."""
        els = self._doc_elements()
        if els is not None and self._pos is not None and self._end is not None:
            for i in range(self._pos + 1, self._end):
                yield els[i]
            return
        stack = list(reversed([c for c in self.children if isinstance(c, Node)]))
        while stack:
            node = stack.pop()
            yield node
            stack.extend(reversed([c for c in node.children if isinstance(c, Node)]))

    # -- bs4-compatible accessors --------------------------------------------
    @property
    def string(self):
        """bs4 ``.string``: the text if the node has exactly one text child."""
        kids = self.children
        if len(kids) == 1 and isinstance(kids[0], str):
            return kids[0]
        # bs4 also recurses through a single-element chain
        elems = [c for c in kids if isinstance(c, Node)]
        texts = [c for c in kids if isinstance(c, str)]
        if len(elems) == 1 and not texts:
            return elems[0].string
        return None

    def get_text(self, strip: bool = False, separator: str = "") -> str:
        chunks: list[str] = []
        stack = list(reversed(self.children))
        while stack:
            c = stack.pop()
            if isinstance(c, str):
                if strip:
                    c = c.strip()
                    if c:
                        chunks.append(c)
                else:
                    chunks.append(c)
            else:
                stack.extend(reversed(c.children))
        return separator.join(chunks)

    @property
    def text(self) -> str:
        return self.get_text()

    def classes(self) -> list[str]:
        return (self.attrs.get("class") or "").split()

    def _matches(self, name, attrs: dict | None) -> bool:
        if name is not None:
            if isinstance(name, (list, tuple, set, frozenset)):
                if self.tag not in name:
                    return False
            elif self.tag != name:
                return False
        if attrs:
            for k, v in attrs.items():
                if k == "class":
                    if v not in self.classes():
                        return False
                else:
                    if self.attrs.get(k) != v:
                        return False
        return True

    def find(self, name=None, attrs: dict | None = None, **kw):
        if kw:
            attrs = {**(attrs or {}), **kw}
        for node in self.descendants():
            if node._matches(name, attrs):
                return node
        return None

    def find_all(self, name=None, attrs: dict | None = None, **kw):
        if kw:
            attrs = {**(attrs or {}), **kw}
        return [n for n in self.descendants() if n._matches(name, attrs)]

    def decompose(self):
        if self.parent is not None:
            root = self
            while root.parent is not None:
                root = root.parent
            root._elements = None  # positions go stale; revert to tree walks
            self.parent.children = [c for c in self.parent.children if c is not self]
            self.parent = None

    # -- CSS selector subset --------------------------------------------------
    def select(self, selector: str) -> list["Node"]:
        out: list[Node] = []
        seen_ids: set[int] = set()
        for group in selector.split(","):
            group = group.strip()
            if not group:
                continue
            for node in _select_group(self, group):
                if id(node) not in seen_ids:
                    seen_ids.add(id(node))
                    out.append(node)
        return out

    def select_one(self, selector: str):
        res = self.select(selector)
        return res[0] if res else None

    def __repr__(self):  # pragma: no cover
        return f"<Node {self.tag} {self.attrs}>"


_SIMPLE_RE = re.compile(
    r"""(?P<tag>[a-zA-Z][\w-]*|\*)?
        (?P<rest>(?:\#[\w-]+|\.[\w-]+|\[[^\]]+\]|:nth-child\(\d+\))*)""",
    re.X,
)
_PART_RE = re.compile(r"\#([\w-]+)|\.([\w-]+)|\[([^\]]+)\]|:nth-child\((\d+)\)")
_ATTR_RE = re.compile(r"""^([\w-]+)\s*(\*=|\^=|\$=|=)\s*["']?([^"']*)["']?$""")


def _parse_simple(sel: str):
    m = _SIMPLE_RE.match(sel)
    if not m or m.end() != len(sel):
        raise ValueError(f"unsupported selector: {sel!r}")
    tag = m.group("tag")
    if tag == "*":
        tag = None
    conds = []
    for pm in _PART_RE.finditer(m.group("rest") or ""):
        if pm.group(1):
            conds.append(("id", "=", pm.group(1)))
        elif pm.group(2):
            conds.append(("class", "~", pm.group(2)))
        elif pm.group(3):
            am = _ATTR_RE.match(pm.group(3).strip())
            if not am:
                raise ValueError(f"unsupported attr selector: {pm.group(3)!r}")
            conds.append((am.group(1), am.group(2), am.group(3)))
        elif pm.group(4):
            conds.append((":nth-child", "=", int(pm.group(4))))
    return tag, conds


def _node_matches_simple(node: Node, tag, conds) -> bool:
    if tag is not None and node.tag != tag:
        return False
    for attr, op, val in conds:
        if attr == ":nth-child":
            if node.parent is None:
                return False
            siblings = [c for c in node.parent.children if isinstance(c, Node)]
            try:
                if siblings.index(node) + 1 != val:
                    return False
            except ValueError:
                return False
            continue
        if op == "~":  # class token
            if val not in node.classes():
                return False
            continue
        actual = node.attrs.get(attr)
        if actual is None:
            return False
        if op == "=":
            if actual != val:
                return False
        elif op == "*=":
            if val not in actual:
                return False
        elif op == "^=":
            if not actual.startswith(val):
                return False
        elif op == "$=":
            if not actual.endswith(val):
                return False
    return True


def _select_group(root: Node, group: str) -> list[Node]:
    # tokenize into simple selectors + combinators
    tokens: list[tuple[str, object]] = []  # (combinator, parsed-simple)
    parts = re.split(r"\s*(>)\s*|\s+", group)
    comb = " "
    for p in parts:
        if p is None or p == "":
            continue
        if p == ">":
            comb = ">"
            continue
        tokens.append((comb, _parse_simple(p)))
        comb = " "
    if not tokens:
        return []

    # current candidate set starts as all descendants matching first simple sel
    _, (tag0, conds0) = tokens[0]
    current = [n for n in root.descendants() if _node_matches_simple(n, tag0, conds0)]
    for comb, (tag, conds) in tokens[1:]:
        nxt: list[Node] = []
        seen: set[int] = set()
        for base in current:
            if comb == ">":
                cands = [c for c in base.children if isinstance(c, Node)]
            else:
                cands = list(base.descendants())
            for c in cands:
                if _node_matches_simple(c, tag, conds) and id(c) not in seen:
                    seen.add(id(c))
                    nxt.append(c)
        current = nxt
    # document order
    if root._doc_elements() is not None:
        current.sort(
            key=lambda n: n._pos if n._pos is not None else 1 << 60
        )
    else:
        order = {id(n): i for i, n in enumerate(root.descendants())}
        current.sort(key=lambda n: order.get(id(n), 1 << 60))
    return current


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]")
        self.stack = [self.root]
        self.elements: list[Node] = []  # document (pre-order) element list

    def _open(self, tag, attrs_list):
        attrs = {}
        for k, v in attrs_list:
            attrs[k] = v if v is not None else ""
        if tag == "p" or tag in _P_CLOSERS:
            # implicit </p> before block-level elements
            if self.stack[-1].tag == "p":
                self.stack.pop()._end = len(self.elements)
        node = Node(tag, attrs, parent=self.stack[-1])
        node._pos = len(self.elements)
        self.elements.append(node)
        self.stack[-1].children.append(node)
        return node

    def handle_starttag(self, tag, attrs_list):
        node = self._open(tag, attrs_list)
        if tag not in VOID_TAGS:
            self.stack.append(node)
        else:
            node._end = node._pos + 1  # void element: empty subtree

    def handle_startendtag(self, tag, attrs_list):
        node = self._open(tag, attrs_list)
        node._end = node._pos + 1

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                end = len(self.elements)
                for n in self.stack[i:]:
                    n._end = end
                del self.stack[i:]
                return
        # unmatched close tag: ignore

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)

    def finish(self) -> Node:
        end = len(self.elements)
        for n in self.stack[1:]:  # implicitly closed at EOF
            n._end = end
        root = self.root
        root._pos = -1
        root._end = end
        root._elements = self.elements
        return root


# -- fast single-pass tokenizer ---------------------------------------------
# The stdlib HTMLParser is built for incremental feeds: every event pays
# updatepos/rawdata-rebuffer/dispatch overhead, which profiles at ~70% of
# extraction time.  This tokenizer makes ONE pass over the full document and
# drives the same _TreeBuilder hooks.  Byte-equivalence strategy: it reuses
# the stdlib's own tolerant regexes for tag/attribute parsing (so well-formed
# tags parse identically, including entity unescape and quote handling) and
# BAILS OUT — returning False so the caller re-parses with the stdlib — on
# any construct whose tolerant-recovery behavior it does not replicate
# (junk inside a start tag, gunked end tags, unterminated comments/cdata
# constructs, a bare "<" in text).  Differential fuzzing in
# tests/test_htmlmini.py asserts tree identity against the stdlib builder.
from html import unescape as _unescape
from html.parser import (  # type: ignore[attr-defined]
    attrfind_tolerant as _attrfind,
    commentclose as _commentclose,
    endtagfind as _endtagfind,
    locatestarttagend_tolerant as _locatestart,
    tagfind_tolerant as _tagfind,
)

_CDATA_CLOSE = {
    "script": re.compile(r"</\s*script\s*>", re.I),
    "style": re.compile(r"</\s*style\s*>", re.I),
}
_SP_SEMI = re.compile(r"[\s;]")


def _fast_feed(s: str, builder: _TreeBuilder) -> bool:
    """Tokenize the whole document in one pass; False = caller must fall
    back to the stdlib parser (input outside the replicated subset)."""
    i, n = 0, len(s)
    cdata_elem = None
    cdata_close = None
    handle_data = builder.handle_data
    while i < n:
        if cdata_elem is None:
            j = s.find("<", i)
            if j < 0:
                # full-document parse == feed()+close(): goahead's EOF flush
                # emits the unescaped tail (except in cdata mode)
                j = n
            if i < j:
                chunk = s[i:j]
                handle_data(_unescape(chunk) if "&" in chunk else chunk)
            i = j
            if i == n:
                break
            c = s[i + 1 : i + 2]
            if ("a" <= c <= "z") or ("A" <= c <= "Z"):
                m = _locatestart.match(s, i)
                j2 = m.end()
                nxt = s[j2 : j2 + 1]
                if nxt == ">":
                    endpos = j2 + 1
                elif nxt == "/" and s.startswith("/>", j2):
                    endpos = j2 + 2
                else:
                    return False  # junk in tag / EOF inside tag
                tm = _tagfind.match(s, i + 1)
                k = tm.end()
                tag = tm.group(1).lower()
                attrs = []
                while k < endpos:
                    am = _attrfind.match(s, k)
                    if not am:
                        break
                    attrname, rest, attrvalue = am.group(1, 2, 3)
                    if not rest:
                        attrvalue = None
                    elif (
                        attrvalue[:1] == "'" == attrvalue[-1:]
                        or attrvalue[:1] == '"' == attrvalue[-1:]
                    ):
                        attrvalue = attrvalue[1:-1]
                    if attrvalue:
                        attrvalue = _unescape(attrvalue)
                    attrs.append((attrname.lower(), attrvalue))
                    k = am.end()
                end = s[k:endpos].strip()
                if end == ">":
                    builder.handle_starttag(tag, attrs)
                    if tag in _CDATA_CLOSE:
                        cdata_elem = tag
                        cdata_close = _CDATA_CLOSE[tag]
                elif end == "/>":
                    builder.handle_startendtag(tag, attrs)
                else:
                    return False  # attr junk: stdlib re-emits tag as data
                i = endpos
            elif c == "/":
                m = _endtagfind.match(s, i)
                if not m:
                    return False  # </>, gunked close, bogus comment
                builder.handle_endtag(m.group(1).lower())
                i = m.end()
            elif s.startswith("<!--", i):
                m = _commentclose.search(s, i + 4)
                if not m:
                    return False  # unterminated comment
                i = m.end()  # comment events don't reach the tree
            elif c == "?" or (c == "!" and not s.startswith("<![", i)):
                gt = s.find(">", i + 1)
                if gt < 0:
                    return False
                i = gt + 1  # pi / doctype / bogus decl: tree-neutral
            else:
                return False  # bare "<" in text or marked section
        else:
            m = cdata_close.search(s, i)
            if m is None:
                break  # HTMLParser drops unterminated cdata content
            if i < m.start():
                handle_data(s[i : m.start()])  # raw: no unescape in cdata
            builder.handle_endtag(cdata_elem)
            cdata_elem = None
            i = m.end()
    return True


def parse_html(html) -> Node:
    """Parse HTML (str or bytes) into a Node tree.

    Bytes are decoded utf-8 with errors ignored — matching the reference's
    ``response.content.decode("utf-8", errors="ignore")`` (core/crawler.py:451).
    """
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="ignore")
    builder = _TreeBuilder()
    try:
        ok = _fast_feed(html, builder)
    except Exception:
        ok = False
    if not ok:
        builder = _TreeBuilder()
        builder.feed(html)
        builder.close()
    return builder.finish()
