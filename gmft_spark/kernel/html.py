"""HTML main-content extraction (boilerplate strip + DOM heuristics).

The north rule's generalization of the extraction pipeline: transcript
turns can carry HTML payloads, from which the engine must recover the
main content — title, article text, and any data tables — while dropping
boilerplate (navigation, headers/footers, scripts, ads).

Implementation is a readability-style density heuristic over a light DOM
built with the stdlib ``html.parser`` (no external parser libraries):

  * ``script``/``style``/``noscript``/``template`` subtrees are dropped;
  * structural boilerplate tags (``nav``/``header``/``footer``/``aside``)
    and elements whose class/id look boilerplate-ish are dropped;
  * remaining block elements are scored by text length × (1 − link
    density); the best-scoring block subtree is the main content;
  * ``<table>`` elements inside the main content become row/col grids
    (th/td cells, whitespace-normalized), reusing the engine's normalized
    cell representation.

Pure data→data kernel: called from Arrow batches in
operators/html_content.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser
from typing import List, Optional

_DROP_TAGS = {"script", "style", "noscript", "template", "svg", "iframe"}
_BOILERPLATE_TAGS = {"nav", "header", "footer", "aside", "form", "button"}
_BOILERPLATE_HINTS = (
    "nav",
    "menu",
    "footer",
    "header",
    "sidebar",
    "banner",
    "advert",
    "ads",
    "cookie",
    "breadcrumb",
    "share",
    "social",
    "comment",
)
_BLOCK_TAGS = {
    "div",
    "article",
    "section",
    "main",
    "body",
    "td",
    "li",
    "p",
    "pre",
    "blockquote",
}


@dataclass
class _Node:
    tag: str
    attrs: dict
    parent: Optional["_Node"] = None
    children: List["_Node"] = field(default_factory=list)
    text_parts: List[str] = field(default_factory=list)

    def own_text(self) -> str:
        return " ".join(" ".join(self.text_parts).split())


class _TreeBuilder(HTMLParser):
    _VOID = {
        "br", "hr", "img", "input", "meta", "link", "area", "base",
        "col", "embed", "source", "track", "wbr",
    }

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("document", {})
        self.cur = self.root

    def handle_starttag(self, tag, attrs):
        if tag in self._VOID:
            return
        node = _Node(tag, dict(attrs), parent=self.cur)
        self.cur.children.append(node)
        self.cur = node

    def handle_endtag(self, tag):
        # close the nearest matching open ancestor (tolerant of bad HTML)
        node = self.cur
        while node is not self.root and node.tag != tag:
            node = node.parent
        if node is not self.root:
            self.cur = node.parent

    def handle_data(self, data):
        if data.strip():
            self.cur.text_parts.append(data)


def _is_boilerplate(node: _Node) -> bool:
    if node.tag in _BOILERPLATE_TAGS:
        return True
    blob = " ".join(
        str(node.attrs.get(k, "")) for k in ("class", "id", "role")
    ).lower()
    return any(h in blob for h in _BOILERPLATE_HINTS)


def _walk_text(node: _Node, parts: List[str]) -> None:
    if node.tag in _DROP_TAGS:
        return
    if node.own_text():
        parts.append(node.own_text())
    for c in node.children:
        _walk_text(c, parts)


def _subtree_text(node: _Node) -> str:
    parts: List[str] = []
    _walk_text(node, parts)
    return " ".join(parts)


def _link_text_len(node: _Node) -> int:
    if node.tag in _DROP_TAGS:
        return 0
    n = len(_subtree_text(node)) if node.tag == "a" else 0
    if node.tag != "a":
        for c in node.children:
            n += _link_text_len(c)
    return n


def _prune(node: _Node) -> None:
    node.children = [
        c
        for c in node.children
        if c.tag not in _DROP_TAGS and not _is_boilerplate(c)
    ]
    for c in node.children:
        _prune(c)


def _find(node: _Node, tag: str):
    if node.tag == tag:
        yield node
    for c in node.children:
        yield from _find(c, tag)


def _score(node: _Node) -> float:
    text = _subtree_text(node)
    if not text:
        return 0.0
    link_len = _link_text_len(node)
    link_density = link_len / len(text)
    return len(text) * max(0.0, 1.0 - link_density)


@dataclass
class HtmlContent:
    title: Optional[str]
    main_text: str
    tables: List[List[List[Optional[str]]]]
    n_dropped_chars: int  # boilerplate characters removed


_MAX_SPAN = 1000  # per-axis clamp on colspan/rowspan attributes
# total occupancy budget per table: spans stop expanding (degrade to 1×1,
# never raise) once a table has claimed this many slots — otherwise 20
# cells of rowspan=1000 colspan=1000 (<1 KB of markup) claim 20M slots
# and stall the executor inside the mapInPandas HTML path
_MAX_OCC = 200_000


def _span(cell: _Node, attr: str) -> int:
    """colspan/rowspan attribute as a sane int: default 1, non-numeric or
    non-positive → 1 (the rowspan=0 "rest of section" form is treated as
    1 — deterministic and safe on malformed markup), clamped."""
    try:
        v = int(str(cell.attrs.get(attr, "1")).strip())
    except ValueError:
        return 1
    return max(1, min(v, _MAX_SPAN))


def table_to_grid(table_node: _Node) -> List[List[Optional[str]]]:
    """``<table>`` → list of rows of normalized cell strings (th and td),
    with colspan/rowspan expanded by the standard occupancy algorithm:
    each cell claims the first free slot left-to-right in its row and
    fills its span rectangle with its own text — the DOM twin of the PDF
    pipeline's semantic spanning fill (kernel/table.py F11), so a
    spanning header lands in every column it covers. Span-free tables
    produce exactly the pre-span grids (row per ``<tr>`` with cells,
    ``None`` for empty cells). Rowspans are clipped at the last ``<tr>``
    (spec behavior), and a table's total claimed slots are bounded by
    ``_MAX_OCC`` (hostile-markup budget; spans degrade to 1×1 past it)."""
    trs = list(_find(table_node, "tr"))
    occ: dict = {}  # (tr_idx, col) -> cell text (may be None)
    widths: dict = {}  # tr_idx -> max occupied col + 1 (incremental)
    has_cells = set()
    for r, tr in enumerate(trs):
        c = 0
        for cell in tr.children:
            if cell.tag not in ("td", "th"):
                continue
            has_cells.add(r)
            while (r, c) in occ:
                c += 1
            t = _subtree_text(cell) or None
            cs = _span(cell, "colspan")
            rs = min(_span(cell, "rowspan"), len(trs) - r)  # spec clip
            if len(occ) + cs * rs > _MAX_OCC:
                cs = rs = 1
            for dr in range(rs):
                rr = r + dr
                for dc in range(cs):
                    occ.setdefault((rr, c + dc), t)
                if c + cs > widths.get(rr, 0):
                    widths[rr] = c + cs
            c += cs
    grid = []
    for r in range(len(trs)):
        width = widths.get(r, 0)
        if r in has_cells or width > 0:
            grid.append([occ.get((r, c)) for c in range(width)])
    return grid


def extract_main_content(html: str) -> HtmlContent:
    """Boilerplate-stripped main content of an HTML document."""
    builder = _TreeBuilder()
    builder.feed(html or "")
    root = builder.root

    raw_len = len(_subtree_text(root))

    titles = list(_find(root, "title"))
    title = _subtree_text(titles[0]) if titles else None
    if not title:
        h1s = list(_find(root, "h1"))
        title = _subtree_text(h1s[0]) if h1s else None

    _prune(root)

    # candidate main blocks: semantic containers first, then scored blocks
    candidates = list(_find(root, "main")) + list(_find(root, "article"))
    if not candidates:
        blocks = [
            n
            for tag in _BLOCK_TAGS
            for n in _find(root, tag)
            if n.tag not in ("td", "li")
        ]
        candidates = blocks or [root]
    best = max(candidates, key=_score)

    main_text = _subtree_text(best)
    tables = [table_to_grid(t) for t in _find(best, "table")]
    tables = [g for g in tables if g]
    return HtmlContent(
        title=title,
        main_text=main_text,
        tables=tables,
        n_dropped_chars=max(0, raw_len - len(main_text)),
    )
