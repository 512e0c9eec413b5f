"""HTML table algebra (SURVEY.md §2.5 D2, §2.8 O3).

From-scratch rowspan/colspan grid normalization re-expressing the
reference's table machinery (reference mineru/utils/table_merge.py:568-809
structural merge / colspan adjust; mineru/model/xlsx/xlsx_converter.py:39-166
merged-cell semantics) without BeautifulSoup — the shared regex
tokenizer (kernels/htmltok.py) only.

A table is parsed into a dense occupancy grid; merged cells are anchored at
their top-left cell and re-emitted with explicit rowspan/colspan in a
canonical HTML form, which is the engine's golden table encoding.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html import escape as html_escape


@dataclass
class Cell:
    text: str = ""
    rowspan: int = 1
    colspan: int = 1
    header: bool = False


@dataclass
class TableGrid:
    rows: list[list[Cell]] = field(default_factory=list)  # anchor cells only
    ncols: int = 0


class _TableParser:
    """Streaming table scanner over the shared regex tokenizer
    (kernels/htmltok.py); same event semantics as the previous
    stdlib-HTMLParser version (depth-1 structure, nested-table text flows
    into the enclosing cell)."""

    def __init__(self):
        self.tables: list[list[list[Cell]]] = []
        self._rows: list[list[Cell]] | None = None
        self._row: list[Cell] | None = None
        self._cell: Cell | None = None
        self._buf: list[str] = []
        self._depth = 0

    def feed(self, html: str) -> None:
        from .htmltok import tokenize

        for ev in tokenize(html):
            kind = ev[0]
            if kind == "data":
                if self._cell is not None:
                    self._buf.append(ev[1])
            elif kind == "start":
                self._starttag(ev[1], ev[2])
            else:
                self._endtag(ev[1])

    def _starttag(self, tag, a):
        if tag == "table":
            self._depth += 1
            if self._depth == 1:
                self._rows = []
            return
        if self._depth != 1:
            return
        if tag == "tr":
            self._row = []
        elif tag in ("td", "th"):
            self._cell = Cell(rowspan=span_of(a.get("rowspan")),
                              colspan=span_of(a.get("colspan")),
                              header=(tag == "th"))
            self._buf = []

    def _endtag(self, tag):
        if tag == "table":
            if self._depth == 1 and self._rows is not None:
                if self._row:
                    self._rows.append(self._row)
                    self._row = None
                self.tables.append(self._rows)
                self._rows = None
            self._depth -= 1
            return
        if self._depth != 1:
            return
        if tag in ("td", "th") and self._cell is not None:
            self._cell.text = " ".join("".join(self._buf).split())
            if self._row is None:
                self._row = []
            self._row.append(self._cell)
            self._cell = None
        elif tag == "tr" and self._row is not None:
            if self._rows is None:
                self._rows = []
            self._rows.append(self._row)
            self._row = None


import re as _re
from html import unescape as _unescape

_EQ_RE = _re.compile(r"<eq>(.*?)</eq>", _re.DOTALL)
_SRC_RE = _re.compile(r'src="(?!data:)([^"]+)"')


def replace_eq_tags(html: str) -> str:
    """M6: ``<eq>…</eq>`` inside table HTML → inline math `` $…$ ``
    (reference _replace_eq_tags_in_table_html, mkcontent :236-248)."""
    if not html or "<eq>" not in html:
        return html
    return _EQ_RE.sub(lambda m: f" ${_unescape(m.group(1))}$ ", html)


def prefix_img_src(html: str, img_bucket_path: str) -> str:
    """M6: prefix non-data image sources in table HTML (reference
    _prefix_table_img_src, mkcontent :224-233)."""
    if not html or not img_bucket_path:
        return html
    return _SRC_RE.sub(
        lambda m: f'src="{img_bucket_path}/{m.group(1)}"', html)


def parse_tables(html: str) -> list[TableGrid]:
    p = _TableParser()
    p.feed(replace_eq_tags(html))
    out = []
    for rows in p.tables:
        grid = _normalize(rows)
        if grid.rows:
            out.append(grid)
    return out


def grid_from_rows(rows: list[list[Cell]]) -> TableGrid | None:
    """Normalize pre-collected cell rows into a grid (for callers that
    already hold a parsed DOM — avoids re-parsing the payload)."""
    grid = _normalize(rows)
    return grid if grid.rows else None


def span_of(value) -> int:
    """Tolerant rowspan/colspan attribute parse (shared contract with
    _TableParser)."""
    try:
        return max(1, int(value))
    except (TypeError, ValueError):
        return 1


def _normalize(rows: list[list[Cell]]) -> TableGrid:
    """Resolve rowspan/colspan into a dense occupancy matrix; clip spans
    that overflow the table (reference table_merge.py:769-809 adjusts
    colspans the same way)."""
    # first pass: number of columns = max over rows of span-weighted width,
    # accounting for rowspan carry-over
    occupied: dict[tuple[int, int], bool] = {}
    anchors: list[list[Cell]] = []
    ncols = 0
    for r, row in enumerate(rows):
        c = 0
        arow = []
        for cell in row:
            while occupied.get((r, c)):
                c += 1
            cs = max(1, cell.colspan)
            rs = max(1, cell.rowspan)
            for dr in range(rs):
                for dc in range(cs):
                    occupied[(r + dr, c + dc)] = True
            arow.append(Cell(cell.text, rs, cs, cell.header))
            c += cs
        ncols = max(ncols, c)
        anchors.append(arow)
    # clip rowspans that overflow past the last row
    nrows = len(anchors)
    for r, arow in enumerate(anchors):
        for cell in arow:
            if r + cell.rowspan > nrows:
                cell.rowspan = nrows - r
    return TableGrid(rows=anchors, ncols=ncols)


def render_table_html(grid: TableGrid) -> str:
    """Canonical HTML re-emission: lowercase tags, spans only when > 1,
    header cells as <th>.  This canonical form is the golden encoding for
    the md/table output (reference keeps table bodies as HTML in md,
    mkcontent :224-253)."""
    parts = ["<table>"]
    for row in grid.rows:
        parts.append("<tr>")
        for cell in row:
            tag = "th" if cell.header else "td"
            attrs = ""
            if cell.rowspan > 1:
                attrs += f' rowspan="{cell.rowspan}"'
            if cell.colspan > 1:
                attrs += f' colspan="{cell.colspan}"'
            parts.append(f"<{tag}{attrs}>{html_escape(cell.text)}</{tag}>")
        parts.append("</tr>")
    parts.append("</table>")
    return "".join(parts)


def table_cell_count(grid: TableGrid) -> int:
    return sum(len(r) for r in grid.rows)


CONTINUATION_END_MARKERS = (
    "(续)", "(续表)", "(续上表)", "(continued)", "(cont.)", "(cont’d)",
    "(…continued)", "continued", "续表",
)
CONTINUATION_INLINE_MARKERS = ("(continued)",)


def is_continuation_text(text: str) -> bool:
    """'(continued)' / 续表 caption-marker detection (reference
    table_continuation.py:23-50): end markers match on a word boundary so
    'discontinued' does not hit; inline markers match anywhere."""
    t = (text or "").strip().lower()
    if not t:
        return False
    for marker in CONTINUATION_END_MARKERS:
        m = marker.lower()
        if t.endswith(m):
            head = t[: -len(m)].rstrip()
            if not head or not (head[-1].isalnum() and m[0].isalnum()):
                return True
    return any(m in t for m in CONTINUATION_INLINE_MARKERS)


def merge_continuation(a: TableGrid, b: TableGrid) -> TableGrid | None:
    """Cross-turn table merge (reference table_merge.py:661-733): merge b
    into a iff column counts match and b has no header row while a does
    (continuation heuristic).  Returns merged grid or None."""
    if a.ncols != b.ncols or not a.rows or not b.rows:
        return None
    a_has_header = any(c.header for c in a.rows[0])
    b_has_header = any(c.header for c in b.rows[0])
    if not a_has_header or b_has_header:
        return None
    return TableGrid(rows=[*a.rows, *b.rows], ncols=a.ncols)


def merge_marked_continuation(a: TableGrid, b: TableGrid) -> TableGrid | None:
    """Marker-gated cross-page merge (reference table_merge.py repeated-
    header handling): column counts must match; a REPEATED header row on
    the continuation (same cell texts as the anchor's header) is dropped
    before appending."""
    if a.ncols != b.ncols or not a.rows or not b.rows:
        return None
    rows_b = b.rows
    if (a.rows and rows_b
            and [c.text for c in rows_b[0]] == [c.text for c in a.rows[0]]):
        rows_b = rows_b[1:]
    if not rows_b:
        return TableGrid(rows=list(a.rows), ncols=a.ncols)
    return TableGrid(rows=[*a.rows, *rows_b], ncols=a.ncols)
