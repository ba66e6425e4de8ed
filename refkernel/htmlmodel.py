"""HTML → page/block/table item model (KERNEL_SPEC.md §2).

The graft's page model: Common-Crawl-style HTML stands in for the
reference's PDF page objects (SURVEY.md §1.2). Built on stdlib
``html.parser`` only (no bs4/lxml in this sandbox). Produces a flat,
document-ordered list of items:

    ("block", page, kind, norm_text)
    ("table", page, method, raw_rows, cell_norm_texts)

where ``kind`` ∈ {content, boilerplate} (table cells are classified at
span emission), ``method`` ∈ {lattice, stream} and ``raw_rows`` is the
unnormalized cell grid fed to the cleaning/validity pipeline.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from .textnorm import norm_text

SKIP_TAGS = {"script", "style", "noscript", "template", "svg", "head"}
BLOCK_TAGS = {
    "p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "blockquote",
    "figcaption", "dt", "dd",
}
CONTAINER_TAGS = {
    "div", "section", "article", "main", "body", "ul", "ol",
    "nav", "footer", "header", "aside", "figure",
}
BOILER_TAGS = {"nav", "footer", "header", "aside"}
BOILER_CLASS_TOKENS = ("nav", "menu", "footer", "sidebar", "cookie",
                       "banner")

_GAP_RE = re.compile(r" {2,}")
_NONWS_RE = re.compile(r"\S")


def _nonws(s: str) -> int:
    return len(_NONWS_RE.findall(s))


class _Block:
    __slots__ = ("page", "boiler", "parts", "link_chars", "total_chars")

    def __init__(self, page: int, boiler: bool):
        self.page = page
        self.boiler = boiler
        self.parts: list[str] = []
        self.link_chars = 0
        self.total_chars = 0


class _Table:
    __slots__ = ("page", "method", "rows", "row", "cell")

    def __init__(self, page: int, method: str):
        self.page = page
        self.method = method
        self.rows: list[list[str]] = []
        self.row: list[str] | None = None
        self.cell: list[str] | None = None


def block_kind(boiler: bool, text_len: int, link_chars: int,
               total_chars: int) -> str:
    if boiler:
        return "boilerplate"
    density = link_chars / total_chars if total_chars > 0 else 0.0
    if density > 0.5:
        return "boilerplate"
    if text_len < 25 and density > 0.2:
        return "boilerplate"
    return "content"


def detect_pre_table(raw: str) -> list[list[str]] | None:
    """Whitespace-gap ("stream") table detection over a <pre> body."""
    lines = [ln for ln in raw.split("\n") if ln.strip()]
    if len(lines) < 2:
        return None
    rows = [_GAP_RE.split(ln.strip()) for ln in lines]
    multi = sum(1 for r in rows if len(r) >= 2)
    if multi >= 2 and multi / len(lines) >= 0.5:
        return rows
    return None


class _ModelParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.items: list[tuple] = []
        # stack frames: (tag, boiler_inherited, page_at_open)
        self.stack: list[tuple[str, bool, int]] = []
        self.page = 1
        self.max_page = 0
        self.skip_depth = 0
        self.link_depth = 0
        self.block: _Block | None = None
        self.tables: list[_Table] = []
        self.pre_depth = 0
        self.pre_parts: list[str] = []
        self.pre_page = 1
        self.pre_boiler = False

    # -- helpers -------------------------------------------------------
    def _inherited_boiler(self) -> bool:
        return self.stack[-1][1] if self.stack else False

    def _touch_page(self, page: int):
        if page > self.max_page:
            self.max_page = page

    def _flush_block(self):
        b = self.block
        self.block = None
        if b is None:
            return
        text = norm_text("".join(b.parts))
        if not text:
            return
        kind = block_kind(b.boiler, len(text), b.link_chars, b.total_chars)
        self.items.append(("block", b.page, kind, text))
        self._touch_page(b.page)

    def _open_block(self, boiler: bool):
        self._flush_block()
        self.block = _Block(self.page, boiler)

    def _close_cell(self, t: _Table):
        if t.cell is not None and t.row is not None:
            t.row.append("".join(t.cell))
        t.cell = None

    def _close_row(self, t: _Table):
        self._close_cell(t)
        if t.row is not None:
            t.rows.append(t.row)
        t.row = None

    def _close_table(self):
        t = self.tables.pop()
        self._close_row(t)
        cell_texts = [
            [norm_text(c) for c in row] for row in t.rows
        ]
        self.items.append(("table", t.page, t.method, t.rows, cell_texts))
        self._touch_page(t.page)

    def _finish_pre(self):
        raw = "".join(self.pre_parts)
        self.pre_parts = []
        rows = detect_pre_table(raw)
        if rows is not None:
            cell_texts = [[norm_text(c) for c in row] for row in rows]
            self.items.append(
                ("table", self.pre_page, "stream", rows, cell_texts)
            )
            self._touch_page(self.pre_page)
        else:
            text = norm_text(raw)
            if text:
                kind = block_kind(self.pre_boiler, len(text), 0, _nonws(raw))
                self.items.append(("block", self.pre_page, kind, text))
                self._touch_page(self.pre_page)

    # -- HTMLParser events ---------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in SKIP_TAGS:
            self.skip_depth += 1
            self.stack.append((tag, self._inherited_boiler(), self.page))
            return
        attrd = dict(attrs)
        cls = (attrd.get("class") or "").lower()
        boiler_here = tag in BOILER_TAGS or any(
            tok in cls for tok in BOILER_CLASS_TOKENS
        )
        boiler = self._inherited_boiler() or boiler_here
        page_at_open = self.page
        if tag == "section":
            dp = attrd.get("data-page")
            if dp is not None:
                try:
                    self.page = int(dp)
                except ValueError:
                    pass

        if self.pre_depth > 0:
            # inside <pre>: nested tags contribute nothing structural
            if tag == "pre":
                self.pre_depth += 1
            self.stack.append((tag, boiler, page_at_open))
            return

        if tag == "table":
            self._flush_block()
            border = attrd.get("border")
            method = "lattice" if border not in (None, "", "0") else "stream"
            self.tables.append(_Table(self.page, method))
        elif self.tables:
            t = self.tables[-1]
            if tag == "tr":
                self._close_row(t)
                t.row = []
            elif tag in ("td", "th"):
                self._close_cell(t)
                if t.row is None:
                    t.row = []
                t.cell = []
        elif tag == "pre":
            self._flush_block()
            self.pre_depth = 1
            self.pre_parts = []
            self.pre_page = self.page
            self.pre_boiler = boiler
        elif tag in BLOCK_TAGS:
            self._open_block(boiler)
        elif tag == "a":
            self.link_depth += 1
        elif tag in CONTAINER_TAGS:
            self._flush_block()
        self.stack.append((tag, boiler, page_at_open))

    def handle_endtag(self, tag):
        # unwind to the matching open tag (tolerates mild malformation)
        idx = None
        for i in range(len(self.stack) - 1, -1, -1):
            if self.stack[i][0] == tag:
                idx = i
                break
        if idx is None:
            return
        _, _, page_at_open = self.stack[idx]
        del self.stack[idx:]

        if tag in SKIP_TAGS:
            self.skip_depth = max(0, self.skip_depth - 1)
            return
        if self.pre_depth > 0:
            if tag == "pre":
                self.pre_depth -= 1
                if self.pre_depth == 0:
                    self._finish_pre()
            return
        if tag == "table":
            if self.tables:
                self._close_table()
        elif self.tables:
            t = self.tables[-1]
            if tag == "tr":
                self._close_row(t)
            elif tag in ("td", "th"):
                self._close_cell(t)
        elif tag in BLOCK_TAGS:
            self._flush_block()
        elif tag == "a":
            self.link_depth = max(0, self.link_depth - 1)
        elif tag in CONTAINER_TAGS:
            self._flush_block()
        if tag == "section":
            self.page = page_at_open

    def handle_data(self, data):
        if self.skip_depth > 0 or not data:
            return
        if self.pre_depth > 0:
            self.pre_parts.append(data)
            return
        if self.tables:
            t = self.tables[-1]
            if t.cell is not None:
                t.cell.append(data)
            return
        if self.block is None:
            if not data.strip():
                return
            self.block = _Block(self.page, self._inherited_boiler())
        self.block.parts.append(data)
        n = _nonws(data)
        self.block.total_chars += n
        if self.link_depth > 0:
            self.block.link_chars += n


def parse_html(html: bytes) -> tuple[list[tuple], int]:
    """Decode + parse → (items, n_pages). KERNEL_SPEC.md §1-2."""
    try:
        text = html.decode("utf-8")
    except UnicodeDecodeError:
        text = html.decode("latin-1")
    p = _ModelParser()
    try:
        p.feed(text)
        p.close()
    except AssertionError:
        # html.parser raises on marked sections with a missing or
        # unknown status keyword (e.g. '<![x]>' —
        # _markupbase.parse_marked_section). Semantics: parsing stops
        # at the offending construct; events emitted so far stand.
        # The engine's fast scanner returns at the same position
        # (kernel/htmlscan.py:_marked_section), keeping byte-parity.
        pass
    # flush any trailing open structures
    while p.tables:
        p._close_table()
    if p.pre_depth > 0:
        p._finish_pre()
    p._flush_block()
    return p.items, p.max_page
