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
    link: str = ""   # cell hyperlink target: renders as <a href> around
                     # the escaped text (reference _cell_value_to_html
                     # wrap, xlsx_converter.py:1544-1553); never part of
                     # the text the merge/header comparisons see
    rich: list = None  # styled segments [(text, (styles...))]: rendered
                       # as nested inline font tags (reference
                       # _apply_inline_font_tags, :1474-1496 — sup/sub
                       # innermost, then s, u, em, strong); cell.text
                       # stays the PLAIN join for merge/header compares
    media: tuple = ()  # cell-anchored image paths (reference
                       # table_image_map → '<img src=.../>' appended to
                       # the cell's media content, xlsx_converter.py:
                       # 313-319, :609); rendered AFTER the text/link
    math: tuple = ()   # cell-anchored latex formulas (reference
                       # math_map + equation_bookends '<eq>{EQ}</eq>',
                       # xlsx_converter.py:311, :710-723, :1043-1048);
                       # rendered after media, unescaped at M6 by
                       # replace_eq_tags → $..$


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


def normalize_row_colspans(rows: list[list[Cell]]) -> None:
    """Fix mammoth gridSpan artifacts in borderless DOCX tables
    (reference _normalize_table_colspans, docx_converter.py:1284-1372;
    call sites :1264/:1277 — the docx table path only): w:gridSpan comes
    from Word's virtual grid and can inflate a row's effective column
    count.  When NO cell carries rowspan > 1 (rowspans break the
    per-row sum assumption — the reference skips the table), compute
    each row's colspan sum, take the MOST COMMON sum as the target
    (Counter.most_common: ties go to the count seen first), and shrink
    over-wide rows left-to-right starting at the first colspan > 1 cell
    (each shrinks by at most span − 1).  Rows below the target and
    single-count tables are untouched.  In place."""
    from collections import Counter

    if any(c.rowspan > 1 for row in rows for c in row):
        return
    counts = [sum(max(1, c.colspan) for c in row) for row in rows]
    if len(set(counts)) <= 1:
        return
    target = Counter(counts).most_common(1)[0][0]
    for row, count in zip(rows, counts):
        if count <= target:
            continue
        excess = count - target
        for c in row:
            if excess <= 0:
                break
            if c.colspan > 1:
                reduce_by = min(c.colspan - 1, excess)
                c.colspan -= reduce_by
                excess -= reduce_by


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
            arow.append(Cell(cell.text, rs, cs, cell.header,
                             cell.link, cell.rich, cell.media, cell.math))
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


_RICH_TAGS = (("superscript", "sup"), ("subscript", "sub"),
              ("strikethrough", "s"), ("underline", "u"),
              ("italic", "em"), ("bold", "strong"))


def _render_rich_segments(segments: list) -> str:
    """Styled cell segments → inline HTML with the reference's nesting
    order (_apply_inline_font_tags, xlsx_converter.py:1474-1496: script
    innermost, strong outermost); text escaped per segment."""
    parts = []
    for text, styles in segments:
        t = html_escape(text)
        if not t:
            continue
        # boundary spaces stay OUTSIDE the tags (a styled run's edge
        # space is layout, not styled content)
        lead = t[:len(t) - len(t.lstrip(" "))]
        trail = t[len(t.rstrip(" ")):]
        core = t[len(lead):len(t) - len(trail)]
        sset = set(styles)
        if core:
            for name, tag in _RICH_TAGS:
                if name in sset:
                    core = f"<{tag}>{core}</{tag}>"
        parts.append(f"{lead}{core}{trail}")
    return "".join(parts)


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
            inner = (_render_rich_segments(cell.rich) if cell.rich
                     else html_escape(cell.text))
            if cell.link:
                inner = f'<a href="{html_escape(cell.link)}">{inner}</a>'
            for mp in cell.media:
                # media rides after the text, outside any hyperlink
                inner += f'<img src="{html_escape(mp)}" />'
            for eq in cell.math:
                # formulas after media (reference :1043-1048); escaped
                # for the symmetric replace_eq_tags unescape at M6
                inner += f"<eq>{html_escape(eq)}</eq>"
            parts.append(f"<{tag}{attrs}>{inner}</{tag}>")
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
    table_continuation.py:23-50): text normalizes full→half width first
    (char_utils.full_to_half — FF01-FF5E punctuation included, so
    （续表） matches), end markers match on a word boundary so
    'discontinued' does not hit; inline markers match anywhere."""
    t = "".join(chr(ord(c) - 0xFEE0) if 0xFF01 <= ord(c) <= 0xFF5E else c
                for c in (text or "")).strip().lower()
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


def _row_meta(grid_or_rows) -> list[dict]:
    """Per-row structure metrics over the anchor-cell grid (the
    TableMergeState row metrics, reference table_merge.py:95-160 /
    :385-399 / :484-550, recast on the occupancy algebra):

      carried   positions continued into this row by a rowspan from above
      actual    sum of this row's anchor colspans (no carry)
      eff       carried + actual (effective columns)
      segments  rendered VISUAL segments: consecutive columns from the
                same source cell are ONE segment — an anchor's colspan is
                not expanded, and a carried rowspan cell with colspan>1
                is one segment, not one per occupied column (reference
                calculate_row_rendered_segments, table_merge.py:541-565:
                distinct consecutive source markers)
    """
    rows = (grid_or_rows.rows if isinstance(grid_or_rows, TableGrid)
            else grid_or_rows)
    out = []
    # source-cell marker per occupied position, so carried runs collapse
    # to one segment per source (the reference's visual-source scan)
    occupied: dict[tuple[int, int], tuple] = {}
    for r, row in enumerate(rows):
        c = 0
        carried = 0
        segments = 0
        prev = None

        def eat_carried(c, carried, segments, prev):
            while (m := occupied.get((r, c))) is not None:
                carried += 1
                if m != prev:
                    segments += 1
                prev = m
                c += 1
            return c, carried, segments, prev

        actual = 0
        c, carried, segments, prev = eat_carried(c, carried, segments, prev)
        for idx, cell in enumerate(row):
            c, carried, segments, prev = eat_carried(c, carried, segments,
                                                     prev)
            marker = (r, idx)
            for dr in range(cell.rowspan):
                for dc in range(cell.colspan):
                    occupied[(r + dr, c + dc)] = marker
            actual += cell.colspan
            segments += 1  # anchor = one segment, colspan not expanded
            prev = marker
            c += cell.colspan
        c, carried, segments, prev = eat_carried(c, carried, segments, prev)
        out.append({
            "carried": carried,
            "actual": actual,
            "eff": carried + actual,
            "segments": segments,
            "colspans": tuple(cell.colspan for cell in row),
            "rowspans": tuple(cell.rowspan for cell in row),
            "texts": tuple(" ".join(cell.text.split()).lower()
                           for cell in row),
        })
    return out


MAX_HEADER_ROWS = 5


def detect_repeated_header_rows(a: TableGrid, b: TableGrid,
                                max_rows: int = MAX_HEADER_ROWS) -> int:
    """How many leading rows of ``b`` repeat ``a``'s header (reference
    detect_table_headers :568-634 + rowspan expansion :638-658): first a
    STRUCTURAL pass (cell count, colspans, rowspans, normalized texts all
    equal), then — when that matches nothing — a VISUAL pass (texts +
    rendered segment counts only; OCR loses spans).  The count expands to
    cover any rowspan reaching past the matched rows."""
    ma, mb = _row_meta(a), _row_meta(b)
    n = min(len(a.rows), len(b.rows), max_rows)
    k = 0
    for i in range(n):
        if (len(a.rows[i]) == len(b.rows[i])
                and ma[i]["eff"] == mb[i]["eff"]
                and ma[i]["colspans"] == mb[i]["colspans"]
                and ma[i]["rowspans"] == mb[i]["rowspans"]
                and ma[i]["texts"] == mb[i]["texts"]):
            k += 1
        else:
            break
    if k == 0:
        for i in range(n):
            if (ma[i]["texts"] == mb[i]["texts"]
                    and ma[i]["segments"] == mb[i]["segments"]):
                k += 1
            else:
                break
    # expand by rowspan coverage (:638-658)
    expanded = min(k, len(b.rows))
    i = 0
    while i < expanded:
        for cell in b.rows[i]:
            if cell.rowspan > 1:
                expanded = min(max(expanded, i + cell.rowspan), len(b.rows))
        i += 1
    return expanded


def can_merge_structural(a: TableGrid, b: TableGrid) -> bool:
    """can_merge_by_structure (:663-690): equal total columns always
    merge; unequal columns merge when the BOUNDARY rows match — the last
    row of ``a`` vs the first data row of ``b`` (after the repeated
    header), by effective cols, actual cols, or rendered segments
    (check_rows_match :734-753)."""
    if not a.rows or not b.rows:
        return False
    if a.ncols == b.ncols:
        return True
    k = detect_repeated_header_rows(a, b)
    if k >= len(b.rows):
        return False
    ma, mb = _row_meta(a), _row_meta(b)
    last, first = ma[-1], mb[k]
    return (last["eff"] == first["eff"]
            or last["actual"] == first["actual"]
            or last["segments"] == first["segments"])


def _adjust_rows_colspan(rows: list[list[Cell]], metas: list[dict],
                         ref_structure: tuple, ref_visual: int,
                         target_cols: int, ref_row_meta: dict) -> None:
    """adjust_table_rows_colspan (:769-807): rows narrower than the
    target either copy the reference row's colspans (when they visually
    mirror the match-reference row) or stretch their LAST cell."""
    for row, meta in zip(rows, metas):
        if not row:
            continue
        if meta["eff"] >= target_cols or meta["actual"] >= target_cols:
            continue
        if (len(row) == ref_visual
                and len(row) == len(ref_row_meta["colspans"])
                and meta["colspans"] == ref_row_meta["colspans"]):
            if len(row) <= len(ref_structure):
                for idx, cell in enumerate(row):
                    if idx < len(ref_structure) and ref_structure[idx] > 1:
                        cell.colspan = ref_structure[idx]
        else:
            diff = target_cols - meta["eff"]
            if diff > 0:
                row[-1].colspan += diff


def _row_vcols(rows: list[list[Cell]], row_idx: int) -> list[int]:
    """Starting VISUAL column of each anchor cell in row ``row_idx``
    (reference build_visual_col_mapping: rowspans from above occupy
    their columns)."""
    occupied: dict[tuple[int, int], bool] = {}
    for r in range(row_idx + 1):
        c = 0
        starts = []
        for cell in rows[r]:
            while occupied.get((r, c)):
                c += 1
            starts.append(c)
            for dr in range(cell.rowspan):
                for dc in range(cell.colspan):
                    occupied[(r + dr, c + dc)] = True
            c += cell.colspan
        if r == row_idx:
            return starts
    return []


def _cell_semantic(c: Cell) -> bool:
    """User-visible semantic content (reference
    _cell_has_semantic_content, table_merge.py:810-818: stripped text
    or an embedded img/eq/… element — our cells carry those as the
    typed media/math fields)."""
    return bool(c.text.strip() or c.media or c.math)


def _carry_rowspan_structure(rows: list[list[Cell]], k: int) -> None:
    """Sink blank STRUCTURAL rowspan placeholders of row ``k`` into row
    ``k+1`` before the row is dropped (reference
    _carry_rowspan_structure_to_next_row, table_merge.py:841-867 +
    _insert_cell_before_visual_column :826-838): each contentless
    rowspan>1 cell re-inserts into the next row at its visual column
    with rowspan-1, so deleting the row cannot shift later columns.
    The next row's visual mapping is computed with row ``k`` still in
    place, exactly like the reference."""
    if k + 1 >= len(rows):
        return
    cur = rows[k]
    vmap = _row_vcols(rows, k)
    carried = []
    for cell, start in zip(cur, vmap):
        if cell.rowspan <= 1 or _cell_semantic(cell):
            continue
        carried.append((start, Cell(text="", rowspan=cell.rowspan - 1,
                                    colspan=cell.colspan,
                                    header=cell.header)))
    for start, nc in sorted(carried, key=lambda t: t[0], reverse=True):
        nxt = rows[k + 1]
        nvmap = _row_vcols(rows, k + 1)
        for idx, sv in enumerate(nvmap):
            if sv >= start:
                nxt.insert(idx, nc)
                break
        else:
            nxt.append(nc)


def _apply_cell_merge(rows_a: list[list[Cell]], rows_b: list[list[Cell]],
                      k: int, cell_merge: list) -> None:
    """Cross-page CELL continuation (reference _apply_cell_merge
    :938-1017): for each visual column flagged 1, the continuation's
    first data-row cell CONTENT (text + typed media/math) appends into
    the anchor's last-row cell at the same visual column and the source
    cell empties; a first data row left with no semantic content is
    dropped, with its blank structural rowspan placeholders SUNK into
    the following row (rowspan-1, re-inserted at their visual columns)
    so later rows keep their alignment."""
    if not rows_a or k >= len(rows_b):
        return
    last, first = rows_a[-1], rows_b[k]
    v1 = _row_vcols(rows_a, len(rows_a) - 1)
    v2 = _row_vcols(rows_b, k)
    vcol_to_1 = {}
    for ci, start in enumerate(v1):
        for c in range(start, start + last[ci].colspan):
            vcol_to_1[c] = ci
    vcol_to_2 = {}
    for ci, start in enumerate(v2):
        for c in range(start, start + first[ci].colspan):
            vcol_to_2[c] = ci
    transferred: set[tuple[int, int]] = set()
    for vi, flag in enumerate(cell_merge):
        if flag != 1:
            continue
        c1, c2 = vcol_to_1.get(vi), vcol_to_2.get(vi)
        if c1 is None or c2 is None or (c1, c2) in transferred:
            continue
        if first[c2].text:
            last[c1].text = (f"{last[c1].text} {first[c2].text}"
                             if last[c1].text else first[c2].text)
        if first[c2].media:
            last[c1].media = tuple(last[c1].media) + tuple(first[c2].media)
        if first[c2].math:
            last[c1].math = tuple(last[c1].math) + tuple(first[c2].math)
        first[c2].text = ""
        first[c2].media = ()
        first[c2].math = ()
        transferred.add((c1, c2))
    if not any(_cell_semantic(c) for c in first):
        _carry_rowspan_structure(rows_b, k)
        del rows_b[k]


def merge_structural(a: TableGrid, b: TableGrid,
                     cell_merge: list | None = None) -> TableGrid | None:
    """Full structural cross-page merge (perform_table_merge
    :1020-1083 on the grid algebra): detect+skip the repeated
    (possibly multi-row, rowspan-expanded) header, apply the model's
    cell_merge continuation signal (split cells re-joined across the
    page break), align unequal column counts by colspan adjustment
    toward the wider table, append the data rows, re-normalize.
    Returns None when the structures don't merge."""
    from copy import deepcopy

    if not can_merge_structural(a, b):
        return None
    k = detect_repeated_header_rows(a, b)
    rows_b = [list(r) for r in deepcopy(b.rows)]
    if k >= len(rows_b):
        return TableGrid(rows=deepcopy(a.rows), ncols=a.ncols)
    rows_a = [list(r) for r in deepcopy(a.rows)]
    if cell_merge:
        _apply_cell_merge(rows_a, rows_b, k, cell_merge)
        if k >= len(rows_b):
            return grid_from_rows(rows_a)
    # metas computed on the possibly cell-merged rows so indices align
    ma, mb = _row_meta(rows_a), _row_meta(rows_b)
    ncols_a = max((m["eff"] for m in ma), default=0)
    ncols_b = max((m["eff"] for m in mb), default=0)
    if ncols_a > ncols_b:
        ref = rows_a[-1]
        _adjust_rows_colspan(rows_b[k:], mb[k:],
                             tuple(c.colspan for c in ref), len(ref),
                             ncols_a, mb[k])
    elif ncols_b > ncols_a:
        ref = rows_b[k]
        _adjust_rows_colspan(rows_a, ma,
                             tuple(c.colspan for c in ref), len(ref),
                             ncols_b, ma[-1])
    merged = grid_from_rows(rows_a + rows_b[k:])
    return merged


