"""OOXML chart → HTML data table (SURVEY.md §2.8; r5 directive #1).

The reference ships a dedicated chart-extraction module
(/root/reference/mineru/backend/utils/office_chart.py): DrawingML chart
XML is parsed into a ``ChartSpec`` (plot kind, axis titles, per-series
name/categories/values, office_chart.py:180-283), rendered to an HTML
data table (cache path :314-341, workbook path :283-312), and a chart
whose series cannot be parsed falls back to a plain table of the
embedded workbook's first non-empty sheet (:159-177 / :65-90).  The
chart block the converters append is ``{"type": chart, "content":
html}`` (docx_converter.py:3345-3411 `_handle_drawingml`,
pptx_converter.py:689-720 `_handle_chart`).

Our payload analog is the POST-XML shape — the parsed spec itself, the
same modeling step as every other office payload in this repo (the
payload is what the reference's XML walk produces, the kernel implements
everything downstream of it):

    {"plot_kind": "category"|"date"|"scatter"|"bubble",
     "cat_axis_title": "...", "val_axis_title": "...",
     "x_axis_title": "...",                      # scatter/bubble bottom axis
     "date_1904": false,                          # Mac epoch flag (c:date1904)
     "series": [{"name": "Q1"|null,               # null → "Series{i}"
                 "cats": [v, ...],                # v scalar, or list =
                                                  #   multiLvlStrRef level parts
                 "xs":   [v, ...],                # scatter/bubble x
                 "vals": [v, ...],                # values / y
                 "sizes": [v, ...]}],             # bubble sizes
     "workbook": [[v, ...], ...]}                 # embedded workbook rows
                                                  #   (fallback table source)

Semantics re-expressed (reference line anchors on each function):

- category/date charts: one shared category column + one value column
  per series; headers = [category-axis title] + series names (:327-341,
  :344-383);
- date axis: numeric categories are Excel date serials → ISO dates,
  honoring the 1904 (Mac) epoch flag and the Lotus 1900 leap-bug window
  (:904-922 `_excel_serial_to_iso` / openpyxl from_excel semantics);
- scatter: per-series (X, Y); when every series shares one normalized X
  sequence the table collapses to a single X column (:781-816
  `_render_scatter_like_chart_table`, shared-axis test :766-775);
- bubble: per-series (X, Y, size) with the same shared-X collapse
  (:819-870);
- series names resolve name → "Series{index}" (:755-762);
- multi-level categories join level parts with " / " (:649-680
  `_extract_multilevel_string_cache`);
- integral floats render as ints, None/"" as "" (:925-946
  `_stringify_cell_value`);
- no parsable series → the embedded workbook's first non-empty sheet as
  a plain header+body table, trailing-empty cells trimmed, first/last
  non-empty rows bounding (:65-156).

One deliberate collapse, documented: the reference renders from the
workbook when present and falls back to the chart's cached values
(:166-177) — two copies of the same numbers (data_only=True workbook
reads return what the cache mirrors).  The payload model carries the
values ONCE in the series, so cache and workbook paths coincide; the
``workbook`` key exists solely for the no-series fallback table, which
is the only case where the two sources differ in the reference.
"""

from __future__ import annotations

import math
from datetime import datetime, time, timedelta
from html import escape

# reference _MAX_CACHE_INDEX_SPAN (office_chart.py:18): a hostile index
# span must not materialize an unbounded list
MAX_POINTS = 100_000

_PLOT_KINDS = ("category", "date", "scatter", "bubble")

# Excel epochs (openpyxl WINDOWS_EPOCH/MAC_EPOCH; public Excel spec):
# Windows serial 1 = 1900-01-01 with the phantom 1900-02-29 at serial 60
_WINDOWS_EPOCH = datetime(1899, 12, 30)
_MAC_EPOCH = datetime(1904, 1, 1)


def _excel_serial_to_iso(serial: float, date_1904: bool) -> str | None:
    """Excel date serial → ISO string (reference _excel_serial_to_iso,
    office_chart.py:904-922, openpyxl from_excel semantics): fractional
    day = time of day; serial in [0,1) = bare time; midnight renders as
    a date, otherwise 'YYYY-MM-DD HH:MM:SS'."""
    if not isinstance(serial, (int, float)) or isinstance(serial, bool) \
            or not math.isfinite(serial):
        return None
    serial = float(serial)
    if date_1904:
        epoch = _MAC_EPOCH
    else:
        epoch = _WINDOWS_EPOCH
        if 0 < serial < 60:
            serial += 1  # Lotus 1900 window: serial 1 = 1900-01-01
    day = math.floor(serial)
    micros = round((serial - day) * 86_400_000_000)
    if 0 < serial < 1:
        # strictly fractional serial = bare time of day; serial 0 is the
        # epoch date itself (1904-01-01 in the Mac system)
        t = (datetime.min + timedelta(microseconds=micros)).time()
        return t.isoformat()
    try:
        dt = epoch + timedelta(days=day, microseconds=micros)
    except OverflowError:
        return None
    if dt.time() == time():
        return dt.date().isoformat()
    return dt.isoformat(sep=" ")


def _stringify(value, *, date_hint: bool = False,
               date_1904: bool = False) -> str:
    """Scalar → cell string (reference _stringify_cell_value
    office_chart.py:925-946 + _stringify_cache_value :886-901): None/''
    → ''; with a date hint anything numeric (or numeric-string, the
    cached-XML case) converts as an Excel serial; integral floats drop
    the '.0'; multi-level category lists join non-empty parts with
    ' / '."""
    if value is None or value == "":
        return ""
    if isinstance(value, list):
        parts = [_stringify(p, date_hint=date_hint, date_1904=date_1904)
                 for p in value[:64]]
        return " / ".join(p for p in parts if p)
    if date_hint:
        if isinstance(value, (int, float)) and not isinstance(value, bool):
            iso = _excel_serial_to_iso(value, date_1904)
            if iso is not None:
                return iso
        elif isinstance(value, str):
            try:
                serial = float(value)
            except ValueError:
                return value
            return _excel_serial_to_iso(serial, date_1904) or value
    if isinstance(value, float) and value.is_integer() \
            and math.isfinite(value):
        return str(int(value))
    return str(value)


def _vector(series: dict, key: str) -> list:
    v = series.get(key)
    if not isinstance(v, list):
        return []
    return v[:MAX_POINTS]


def _series_name(series: dict, index: int) -> str:
    """name → 'Series{index}' fallback (reference _resolve_series_name,
    office_chart.py:755-762; 1-based index)."""
    name = series.get("name")
    if isinstance(name, str) and name:
        return name
    return f"Series{index}"


def _render_html_table(headers: list[str], columns: list[list[str]],
                       row_count: int) -> str:
    """Compact header+body table, short cells padded with ''
    (reference _render_html_table, office_chart.py:966-989)."""
    if row_count <= 0 or len(headers) != len(columns):
        return ""
    parts = ["<table><thead><tr>"]
    for h in headers:
        parts.append(f"<th>{escape(h)}</th>")
    parts.append("</tr></thead><tbody>")
    for i in range(row_count):
        parts.append("<tr>")
        for col in columns:
            parts.append(f"<td>{escape(col[i] if i < len(col) else '')}</td>")
        parts.append("</tr>")
    parts.append("</tbody></table>")
    return "".join(parts)


def _shared_x(x_cols: list[list[str]]) -> bool:
    """All per-series X sequences normalize equal → one shared X column
    (reference _get_shared_axis_values, office_chart.py:766-775)."""
    return bool(x_cols) and all(c == x_cols[0] for c in x_cols[1:])


def _render_category(spec: dict, series: list[dict]) -> str:
    """Category/date chart → [cat axis] + one column per series
    (reference render cache path office_chart.py:314-341, workbook path
    :344-383 — identical output shape)."""
    date_hint = spec.get("plot_kind") == "date"
    date_1904 = bool(spec.get("date_1904"))
    cats: list[str] = []
    for s in series:
        vec = _vector(s, "cats")
        if vec:
            cats = [_stringify(v, date_hint=date_hint, date_1904=date_1904)
                    for v in vec]
            break
    names, val_cols = [], []
    for i, s in enumerate(series, start=1):
        names.append(_series_name(s, i))
        val_cols.append([_stringify(v) for v in _vector(s, "vals")])
    row_count = max(len(cats),
                    max((len(c) for c in val_cols), default=0))
    if not names or row_count == 0:
        return ""
    cat_title = spec.get("cat_axis_title")
    headers = [cat_title if isinstance(cat_title, str) else ""] + names
    return _render_html_table(headers, [cats] + val_cols, row_count)


def _render_scatter(spec: dict, series: list[dict]) -> str:
    """Scatter → shared-X single table or per-series (X, Y) pairs
    (reference office_chart.py:781-816; cache path requires every series
    to carry both vectors, :419-435)."""
    x_cols, names, y_cols = [], [], []
    for i, s in enumerate(series, start=1):
        xs, ys = _vector(s, "xs"), _vector(s, "vals")
        if not xs or not ys:
            return ""
        x_cols.append([_stringify(v) for v in xs])
        names.append(_series_name(s, i))
        y_cols.append([_stringify(v) for v in ys])
    if not names:
        return ""
    if _shared_x(x_cols):
        row_count = max(len(x_cols[0]),
                        max((len(c) for c in y_cols), default=0))
        if row_count == 0:
            return ""
        x_title = spec.get("x_axis_title")
        headers = [x_title if isinstance(x_title, str) else ""] + names
        return _render_html_table(headers, [x_cols[0]] + y_cols, row_count)
    headers, columns, row_count = [], [], 0
    for name, xc, yc in zip(names, x_cols, y_cols):
        headers.extend((f"{name} X", f"{name} Y"))
        columns.extend((xc, yc))
        row_count = max(row_count, len(xc), len(yc))
    if row_count == 0:
        return ""
    return _render_html_table(headers, columns, row_count)


def _render_bubble(spec: dict, series: list[dict]) -> str:
    """Bubble → shared-X [X, name, name size, ...] or per-series
    (X, Y, size) triples (reference office_chart.py:819-870)."""
    x_cols, names, y_cols, size_cols = [], [], [], []
    for i, s in enumerate(series, start=1):
        xs, ys, szs = _vector(s, "xs"), _vector(s, "vals"), \
            _vector(s, "sizes")
        if not xs or not ys or not szs:
            return ""
        x_cols.append([_stringify(v) for v in xs])
        names.append(_series_name(s, i))
        y_cols.append([_stringify(v) for v in ys])
        size_cols.append([_stringify(v) for v in szs])
    if not names:
        return ""
    if _shared_x(x_cols):
        row_count = max(len(x_cols[0]),
                        max((len(c) for c in y_cols), default=0),
                        max((len(c) for c in size_cols), default=0))
        if row_count == 0:
            return ""
        x_title = spec.get("x_axis_title")
        headers = [x_title if isinstance(x_title, str) else ""]
        columns = [x_cols[0]]
        for name, yc, sc in zip(names, y_cols, size_cols):
            headers.extend((name, f"{name} size"))
            columns.extend((yc, sc))
        return _render_html_table(headers, columns, row_count)
    headers, columns, row_count = [], [], 0
    for name, xc, yc, sc in zip(names, x_cols, y_cols, size_cols):
        headers.extend((f"{name} X", f"{name} Y", f"{name} size"))
        columns.extend((xc, yc, sc))
        row_count = max(row_count, len(xc), len(yc), len(sc))
    if row_count == 0:
        return ""
    return _render_html_table(headers, columns, row_count)


def _workbook_table(rows) -> str:
    """Embedded-workbook fallback: first row of the non-empty band is the
    header, trailing empty cells trimmed, interior gaps kept, rows padded
    to uniform width (reference html_table_from_excel_bytes +
    _extract_non_empty_worksheet_rows + _render_embedded_workbook_table,
    office_chart.py:65-156)."""
    if not isinstance(rows, list):
        return ""
    str_rows: list[list[str]] = []
    for row in rows[:MAX_POINTS]:
        if not isinstance(row, list):
            return ""
        vals = [_stringify(v) for v in row[:4096]]
        while vals and vals[-1] == "":
            vals.pop()  # trim trailing empties, keep interior gaps
        str_rows.append(vals)
    non_empty = [i for i, r in enumerate(str_rows) if any(v != "" for v in r)]
    if not non_empty:
        return ""
    band = str_rows[non_empty[0]:non_empty[-1] + 1]
    width = max(len(r) for r in band)
    band = [r + [""] * (width - len(r)) for r in band]
    parts = ["<table><thead><tr>"]
    for h in band[0]:
        parts.append(f"<th>{escape(h)}</th>")
    parts.append("</tr></thead><tbody>")
    for row in band[1:]:
        parts.append("<tr>")
        for v in row:
            parts.append(f"<td>{escape(v)}</td>")
        parts.append("</tr>")
    parts.append("</tbody></table>")
    return "".join(parts)


def chart_to_html(spec) -> str:
    """Chart payload → HTML data table; '' when nothing renders.

    Decision order mirrors extract_chart_html_from_ooxml
    (office_chart.py:159-177): unparsable spec or no series → workbook
    fallback table; otherwise render per plot kind, falling back to the
    workbook table when the series render comes up empty.  Hostile
    payloads (wrong types anywhere) degrade to the fallback chain, never
    raise."""
    try:
        if not isinstance(spec, dict):
            return ""
        series = spec.get("series")
        series = [s for s in series if isinstance(s, dict)] \
            if isinstance(series, list) else []
        series = series[:256]
        kind = spec.get("plot_kind")
        if not series or kind not in _PLOT_KINDS:
            return _workbook_table(spec.get("workbook"))
        if kind == "scatter":
            html = _render_scatter(spec, series)
        elif kind == "bubble":
            html = _render_bubble(spec, series)
        else:
            html = _render_category(spec, series)
        if html:
            return html
        return _workbook_table(spec.get("workbook"))
    except Exception:
        return ""
