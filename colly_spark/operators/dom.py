"""Lightweight DOM + CSS/XPath-lite selector engine (E1-E3 backbone).

The reference drives extraction through goquery CSS matches
(colly.go:1104-1119 handleOnHTML) and htmlquery/xmlquery XPath
(colly.go:1123-1182 handleOnXML — XPath runs over HTML docs too), with
element accessors ChildText(s)/ChildAttr(s)/ForEach (element.go:75-153)
and struct unmarshal over scoped sub-selections (unmarshal.go:40-120).

This module gives the Spark engine the same query surface without
external deps: a stdlib-HTMLParser DOM tree, a CSS subset matcher
(compound selectors, descendant/child combinators, selector lists,
first/last/nth-child), and an XPath-lite evaluator (`//a/@href`,
`//urlset/url/loc`, `//div[@class='x']//p/text()`). All of it is plain
per-document Python invoked from Arrow-batched UDFs — map-side only.
"""

from __future__ import annotations

import re
from functools import lru_cache
from html.parser import HTMLParser

_VOID = frozenset({
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
})


class Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict, parent: "Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list = []  # Node | str (text)
        self.parent = parent

    # --- accessors (element.go:75-153 analogues) -----------------------
    def text(self) -> str:
        """Concatenated descendant text (goquery Selection.Text)."""
        out: list[str] = []

        def walk(n):
            for c in n.children:
                if isinstance(c, str):
                    out.append(c)
                else:
                    walk(c)

        walk(self)
        return "".join(out)

    def iter_elements(self):
        """Self + descendants in document order."""
        yield self
        for c in self.children:
            if isinstance(c, Node):
                yield from c.iter_elements()

    def element_children(self) -> list["Node"]:
        return [c for c in self.children if isinstance(c, Node)]

    def child_index(self) -> int:
        """1-based position among element siblings (for :nth-child)."""
        if self.parent is None:
            return 1
        sibs = self.parent.element_children()
        return sibs.index(self) + 1


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#root", {}, None)
        self._stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, dict(attrs), self._stack[-1])
        self._stack[-1].children.append(node)
        if tag not in _VOID:
            self._stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = Node(tag, dict(attrs), self._stack[-1])
        self._stack[-1].children.append(node)

    def handle_endtag(self, tag):
        # close the nearest open element of this tag (tolerant of
        # mis-nesting, like html5 tree builders)
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                break

    def handle_data(self, data):
        if data:
            self._stack[-1].children.append(data)


def parse_dom(text: str) -> Node:
    b = _TreeBuilder()
    try:
        b.feed(text)
        b.close()
    except Exception:
        pass
    return b.root


# --- CSS subset ---------------------------------------------------------

_COMPOUND_RE = re.compile(
    r"([a-zA-Z][\w-]*|\*)?"            # tag
    r"((?:[#.][\w-]+|\[[^\]]+\]|:[\w-]+(?:\([^)]*\))?)*)$")
_PART_RE = re.compile(r"#[\w-]+|\.[\w-]+|\[[^\]]+\]|:[\w-]+(?:\([^)]*\))?")


class _Compound:
    __slots__ = ("tag", "id", "classes", "attrs", "pseudos")

    def __init__(self, token: str):
        m = _COMPOUND_RE.match(token)
        if not m:
            raise ValueError(f"bad selector compound: {token!r}")
        tag, rest = m.groups()
        self.tag = None if tag in (None, "*") else tag.lower()
        self.id = None
        self.classes: list[str] = []
        self.attrs: list[tuple[str, str | None]] = []
        self.pseudos: list[str] = []
        for part in _PART_RE.findall(rest or ""):
            if part.startswith("#"):
                self.id = part[1:]
            elif part.startswith("."):
                self.classes.append(part[1:])
            elif part.startswith("["):
                inner = part[1:-1]
                if "=" in inner:
                    k, _, v = inner.partition("=")
                    self.attrs.append((k.strip(), v.strip().strip("\"'")))
                else:
                    self.attrs.append((inner.strip(), None))
            else:
                self.pseudos.append(part[1:])

    def matches(self, n: Node) -> bool:
        if self.tag and n.tag != self.tag:
            return False
        if self.id and n.attrs.get("id") != self.id:
            return False
        for cls in self.classes:
            if cls not in (n.attrs.get("class") or "").split():
                return False
        for k, v in self.attrs:
            if k not in n.attrs:
                return False
            if v is not None and n.attrs.get(k) != v:
                return False
        for p in self.pseudos:
            if p == "first-child":
                if n.child_index() != 1:
                    return False
            elif p == "last-child":
                if n.parent is None or n.child_index() != len(n.parent.element_children()):
                    return False
            elif p.startswith("nth-child(") and p.endswith(")"):
                try:
                    want = int(p[10:-1])
                except ValueError:
                    return False
                if n.child_index() != want:
                    return False
            else:
                return False  # unsupported pseudo-class → no match
        return True


@lru_cache(maxsize=2048)
def _compile_selector(selector: str):
    """→ list of alternatives; each: [(combinator, _Compound), ...]
    right-most compound last; combinator applies to the LEFT of it."""
    alts = []
    for alt in selector.split(","):
        alt = alt.strip()
        if not alt:
            continue
        tokens = re.split(r"\s*(>)\s*|\s+", alt)
        seq: list[tuple[str, _Compound]] = []
        comb = " "
        for t in tokens:
            if t is None or t == "":
                continue
            if t == ">":
                comb = ">"
                continue
            seq.append((comb, _Compound(t)))
            comb = " "
        if seq:
            alts.append(seq)
    return alts


def _matches_seq(n: Node, seq) -> bool:
    comb, comp = seq[-1]
    if not comp.matches(n):
        return False
    if len(seq) == 1:
        return True
    rest = seq[:-1]
    if comb == ">":
        p = n.parent
        return p is not None and p.tag != "#root" and _matches_seq(p, rest)
    p = n.parent
    while p is not None and p.tag != "#root":
        if _matches_seq(p, rest):
            return True
        p = p.parent
    return False


def select(scope: Node, selector: str) -> list[Node]:
    """All descendant elements of ``scope`` matching the CSS selector,
    in document order (goquery Selection.Find semantics)."""
    try:
        alts = _compile_selector(selector)
    except ValueError:
        return []
    out: list[Node] = []
    for n in scope.iter_elements():
        if n is scope:
            continue
        if any(_matches_seq(n, seq) for seq in alts):
            out.append(n)
    return out


# --- XPath-lite ---------------------------------------------------------

_XSTEP_RE = re.compile(
    r"^([\w*-]+|text\(\)|@[\w-]+)((?:\[[^\]]+\])*)$")


def xpath_lite(scope: Node, expr: str) -> list:
    """Evaluate an XPath subset over the DOM: ``//a/@href``,
    ``//urlset/url/loc``, ``/html/body//p``, ``//div[@class='x']``,
    trailing ``text()``. Namespace prefixes are ignored (the reference's
    sitemap xpath matches namespaced urlset). Returns Nodes, or strings
    for ``@attr`` / ``text()`` terminals."""
    expr = expr.strip()
    if not expr:
        return []
    # tokenize into (deep, step) pairs
    steps: list[tuple[bool, str]] = []
    i = 0
    if expr.startswith("//"):
        deep, i = True, 2
    elif expr.startswith("/"):
        deep, i = False, 1
    else:
        deep = True
    buf = ""
    while i <= len(expr):
        if i == len(expr) or expr[i] == "/":
            if buf:
                steps.append((deep, buf))
                buf = ""
            if i + 1 < len(expr) and expr[i:i + 2] == "//":
                deep = True
                i += 2
            else:
                deep = False
                i += 1
        else:
            buf += expr[i]
            i += 1

    def local(tag: str) -> str:
        return tag.rsplit(":", 1)[-1].lower()

    current: list = [scope]
    for deep, step in steps:
        m = _XSTEP_RE.match(step)
        if not m:
            return []
        name, preds = m.groups()
        nxt: list = []
        if name.startswith("@"):
            attr = name[1:]
            for n in current:
                if isinstance(n, Node):
                    v = n.attrs.get(attr)
                    if v is not None:
                        nxt.append(v)
            current = nxt
            continue
        if name == "text()":
            current = [n.text() for n in current if isinstance(n, Node)]
            continue
        want = None if name == "*" else name.lower()
        for n in current:
            if not isinstance(n, Node):
                continue
            pool = (x for x in n.iter_elements() if x is not n) if deep \
                else iter(n.element_children())
            for c in pool:
                if want is not None and local(c.tag) != want:
                    continue
                ok = True
                for pred in re.findall(r"\[([^\]]+)\]", preds or ""):
                    pred = pred.strip()
                    pm = re.match(r"^@([\w-]+)\s*=\s*['\"]([^'\"]*)['\"]$", pred)
                    if pm:
                        if c.attrs.get(pm.group(1)) != pm.group(2):
                            ok = False
                            break
                    elif re.match(r"^@[\w-]+$", pred):
                        if pred[1:] not in c.attrs:
                            ok = False
                            break
                    elif pred.isdigit():
                        # positional predicate resolved after collection
                        ok = ok  # handled below
                    else:
                        ok = False
                        break
                if ok:
                    nxt.append(c)
        # positional predicates ([N]) — applied over the collected set
        pos = re.findall(r"\[(\d+)\]", preds or "")
        if pos:
            idx = int(pos[0]) - 1
            nxt = [nxt[idx]] if 0 <= idx < len(nxt) else []
        current = nxt
    # dedupe while preserving document order (deep steps can revisit)
    seen: set = set()
    out = []
    for x in current:
        key = id(x) if isinstance(x, Node) else ("s", x, len(out))
        if key in seen:
            continue
        seen.add(key)
        out.append(x)
    return out
