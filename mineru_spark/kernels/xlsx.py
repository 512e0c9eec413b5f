"""XLSX sheet-cell route (SURVEY.md §2.8 O3 — DataRegion detection).

Payload analog of the raw-sheet shape the reference converts (reference
mineru/model/xlsx/xlsx_converter.py): a sparse cell list plus merge
ranges per sheet — what a spreadsheet fragment looks like after the zip/
XML unwrap, BEFORE any table structure is known:

    {"kind": "xlsx_cells", "sheets": [
        {"name": "Sheet1",
         "cells": [{"r": 0, "c": 0, "v": "text"}, ...],    # 0-based sparse
         "merges": [[r0, c0, r1, c1], ...]}]}              # inclusive

Reference semantics re-expressed (no openpyxl — plain dict/set algebra):

- true data bounds = bbox over non-empty cells + merge ranges
  (_find_true_data_bounds :1151-1191);
- tables found by BFS flood fill from each unvisited non-empty cell,
  4-directional, crossing gaps up to a tolerance of blank cells, merged
  regions counting as content (_find_table_bounds :1194-1318);
- AUTO gap-tolerance selection: the fill runs at tolerances (0, 1, 2),
  each candidate is scored by the reference's penalty (severe interior
  separators, interior blank-line ratio, sparse large tables, real
  singletons, area-weighted blank ratio, row overlap), and the winner is
  picked among near-best candidates by the tiebreak chain
  severe-count → preference 1≻0≻2 → interior ratio → penalty
  (_select_best_gap_candidate :930-974, weights :936-943, constants
  :33-35);
- grid extraction walks the table bounding box, skipping hidden merged
  cells and anchoring rowspan/colspan at each merge's top-left
  (_MergedCellLookup :103-165); empty positions stay as empty cells;
- semantic-subset filter: a table whose semantic cell positions are a
  strict subset of another's is dropped (_filter_semantic_subset_tables
  :780-798);
- 1×1 singleton tables render as TEXT blocks (treat_singleton_as_text,
  _build_block_from_excel_table :459-473);
- tables emit in (anchor_row, anchor_col) order (:775-781 sort anchor);
- sheet titles prepend only when >1 sheet produced content
  (_should_emit_sheet_titles :297-307);
- the first table row renders as header cells (excel_table_to_html
  :1013 `th if cell.row == 0`).

r5 additions: cell-anchored sheet images (in-cell <img> media when a
table consumes the anchor, standalone image blocks otherwise — reference
:312-319/:1064-1082) and sheet charts re-rendered as SYNTHETIC TABLES of
their source sheet range (series reference formulas parsed against the
current sheet, same-sheet closed ranges only, row/col union across
series, merge spans clipped to the selection — _find_charts_in_sheet
:677-708, _collect_chart_source_axes :566-586,
_build_synthetic_table_from_sheet_selection :624-676), interleaved with
tables by cell anchor (:322-328).
Still out of scope: raster pixel decode (sha256 path naming only,
COVERAGE.md §2.7) and cell math maps — the docx table path carries the
equation-injection analog.
"""

from __future__ import annotations

import re
from collections import Counter, deque

from . import tables as tbl

# Auto gap-tolerance selection (reference xlsx_converter.py:33-35): the
# flood fill runs at every candidate tolerance, each candidate's table
# set is scored by a blank/separator/singleton penalty, and the winner is
# picked among near-best candidates (≤ min + margin) by fewest severe
# separators, then the tolerance preference 1 ≻ 0 ≻ 2, then the interior
# blank-line ratio, then raw penalty (_select_best_gap_candidate
# :930-974).
GAP_CANDIDATES = (0, 1, 2)
GAP_PREFERENCE = {1: 0, 0: 1, 2: 2}
GAP_PREFERENCE_MARGIN = 0.15
# Defensive bounds for hostile payloads (a web-scale job must survive a
# merge range claiming a billion cells without allocating it): merge
# ranges clamp to 256×64 cells (≤4096 ranges), total materialized merge
# membership to 64Ki cells (a fully merged 256×256 area — far beyond any
# real sheet fragment; it also caps the flood-fill worst case at ~1s
# instead of ~4s on a hostile all-merge payload), and a detected
# region's bbox walk to 512×512.
MAX_MERGE_ROWS = 256
MAX_MERGE_COLS = 64
MAX_MERGES = 4096
MAX_MERGED_CELLS = 65536
MAX_REGION_DIM = 512


def _rich_segments(runs) -> list | None:
    """Cell "runs" payload → [(text, (styles...))] segments via the
    shared office style vocabulary (docx._run_styles); None when the
    payload has no usable styled content."""
    if not isinstance(runs, list):
        return None
    from .docx import _run_styles

    segs = []
    styled = False
    prev_trailing_ws = False
    for r in runs:
        if not isinstance(r, dict):
            continue
        raw = str(r.get("text", ""))
        text = " ".join(raw.split())
        if not text:
            prev_trailing_ws = prev_trailing_ws or bool(raw)
            continue
        # run-boundary whitespace survives as ONE space on the following
        # segment (inner whitespace collapses like the plain cell text)
        if segs and (prev_trailing_ws or raw[:1].isspace()):
            text = " " + text
        prev_trailing_ws = raw[-1:].isspace()
        styles = _run_styles(r)
        styled = styled or bool(styles)
        segs.append((text, styles))
    return segs if segs and styled else None


def _flood_tables(cells: dict, merges: list, gap_tolerance: int,
                  links: dict | None = None,
                  rich: dict | None = None,
                  media: dict | None = None,
                  maths: dict | None = None) -> list[dict]:
    """Flood-fill DataRegion detection over one sheet at a FIXED gap
    tolerance (reference _find_data_tables_with_gap_raw :1105-1148).

    cells: {(r, c): text}; merges: [(r0, c0, r1, c1)] inclusive;
    links: {(r, c): url} cell hyperlink targets (reference
    _get_cell_hyperlink_target → <a href> wrap, :1524-1553).
    Returns raw (unfiltered) tables in fill order:
    [{"anchor", "rows", "semantic", "singleton", "nrows", "ncols",
      "mask"}] where mask is the semantic-content occupancy grid expanded
    over merge spans (_build_table_content_mask :876-889).
    """
    links = links or {}
    rich = rich or {}
    media = media or {}
    maths = maths or {}
    anchor_span: dict[tuple, tuple] = {}
    merged_pos: set[tuple] = set()
    hidden_pos: set[tuple] = set()
    for m in merges:
        if len(merged_pos) > MAX_MERGED_CELLS:
            break  # hostile payload; real sheets never get near this
        r0, c0, r1, c1 = m
        r1 = min(r1, r0 + MAX_MERGE_ROWS - 1)
        c1 = min(c1, c0 + MAX_MERGE_COLS - 1)
        anchor_span[(r0, c0)] = (r1 - r0 + 1, c1 - c0 + 1)
        for r in range(r0, r1 + 1):
            for c in range(c0, c1 + 1):
                merged_pos.add((r, c))
                if (r, c) != (r0, c0):
                    hidden_pos.add((r, c))

    if not cells and not merges:
        return []
    coords = list(cells) + list(merged_pos)
    max_row = max(r for r, _ in coords)
    max_col = max(c for _, c in coords)

    def has_content(r: int, c: int) -> bool:
        if r < 0 or c < 0 or r > max_row or c > max_col:
            return False
        return (r, c) in cells or (r, c) in merged_pos

    visited: set[tuple] = set()
    found: list[dict] = []
    for start in sorted(cells):
        if start in visited:
            continue
        # --- flood fill (reference _find_table_bounds phase 1) ---
        queue = deque([start])
        table_cells = {start}
        min_r = max_r = start[0]
        min_c = max_c = start[1]
        while queue:
            r, c = queue.popleft()
            min_r, max_r = min(min_r, r), max(max_r, r)
            min_c, max_c = min(min_c, c), max(max_c, c)
            for dr, dc in ((0, 1), (0, -1), (1, 0), (-1, 0)):
                for step in range(1, gap_tolerance + 2):
                    nr, nc = r + dr * step, c + dc * step
                    if (nr, nc) in table_cells:
                        break  # already ours; don't jump over
                    if has_content(nr, nc):
                        table_cells.add((nr, nc))
                        queue.append((nr, nc))
                        break
        visited |= table_cells

        # --- grid extraction (phase 2): bbox walk, hidden cells skipped,
        # empty positions kept so the rectangle stays dense ---
        max_r = min(max_r, min_r + MAX_REGION_DIM - 1)
        max_c = min(max_c, min_c + MAX_REGION_DIM - 1)
        nrows, ncols = max_r - min_r + 1, max_c - min_c + 1
        rows: list[list[tbl.Cell]] = []
        semantic: set[tuple] = set()
        mask = [[False] * ncols for _ in range(nrows)]
        for ri in range(min_r, max_r + 1):
            row: list[tbl.Cell] = []
            for cj in range(min_c, max_c + 1):
                if (ri, cj) in hidden_pos:
                    continue
                rs, cs = anchor_span.get((ri, cj), (1, 1))
                text = " ".join(str(cells.get((ri, cj), "")).split())
                # semantic content = text OR anchored media OR anchored
                # math (reference _cell_has_semantic_content :757-763)
                if text or media.get((ri, cj)) or maths.get((ri, cj)):
                    semantic.add((ri, cj))
                    # semantic content covers its whole merge span
                    # (_build_table_content_mask expands over row/col span)
                    for mr in range(ri - min_r, min(ri - min_r + rs, nrows)):
                        for mc in range(cj - min_c,
                                        min(cj - min_c + cs, ncols)):
                            mask[mr][mc] = True
                row.append(tbl.Cell(text=text, rowspan=rs, colspan=cs,
                                    header=(ri == min_r),
                                    link=links.get((ri, cj), ""),
                                    rich=rich.get((ri, cj)),
                                    # cell-anchored images ride in every
                                    # constructed cell, empty ones too
                                    # (reference cell build :609)
                                    media=tuple(media.get((ri, cj), ())),
                                    math=tuple(maths.get((ri, cj), ()))))
            rows.append(row)

        singleton = None
        # singleton-as-text only for a bare cell: anchored media or math
        # forces the 1x1 TABLE render so the attachment survives
        # (reference _can_render_singleton_as_text :743-755)
        if (max_r == min_r and max_c == min_c
                and anchor_span.get((min_r, min_c), (1, 1)) == (1, 1)
                and not media.get((min_r, min_c))
                and not maths.get((min_r, min_c))):
            singleton = cells.get((min_r, min_c), "")
        found.append({"anchor": (min_r, min_c), "rows": rows,
                      "semantic": semantic, "singleton": singleton,
                      "nrows": nrows, "ncols": ncols, "mask": mask,
                      # constructed (non-hidden) positions — the
                      # reference's used_cells set (:478-492)
                      "used": {(ri, cj)
                               for ri in range(min_r, max_r + 1)
                               for cj in range(min_c, max_c + 1)
                               if (ri, cj) not in hidden_pos}})
    return found


def _max_consecutive(flags: list[bool]) -> int:
    best = cur = 0
    for f in flags:
        cur = cur + 1 if f else 0
        best = max(best, cur)
    return best


def _candidate_summary(tables: list[dict]) -> dict:
    """Per-candidate quality metrics (reference
    _summarize_candidate_tables :890-975 over
    _summarize_table_for_gap_selection :838-874)."""
    n = len(tables)
    real_singleton = severe = sparse_large = 0
    total_area = 0
    blank_num = 0.0
    interior_blank = 0
    interior_possible = 0
    row_cover: Counter = Counter()
    for t in tables:
        nr, nc, mask = t["nrows"], t["ncols"], t["mask"]
        area = nr * nc
        content = sum(sum(1 for f in row if f) for row in mask)
        blank_ratio = 1.0 - content / max(area, 1)
        # interior = rows/cols excluding the first and last line
        bl_rows = ([not any(mask[ri]) for ri in range(1, max(nr - 1, 1))]
                   if nr > 2 else [])
        bl_cols = ([not any(mask[ri][ci] for ri in range(nr))
                    for ci in range(1, max(nc - 1, 1))] if nc > 2 else [])
        total_area += area
        blank_num += area * blank_ratio
        interior_blank += sum(bl_rows) + sum(bl_cols)
        interior_possible += max(nr - 2, 0) + max(nc - 2, 0)
        for ri in range(t["anchor"][0], t["anchor"][0] + nr):
            row_cover[ri] += 1
        if t["singleton"] is not None and t["singleton"] != "":
            real_singleton += 1
        if area >= 6 and blank_ratio > 0.35:
            sparse_large += 1
        if max(_max_consecutive(bl_rows), _max_consecutive(bl_cols)) >= 2:
            severe += 1
    occupied = max(len(row_cover), 1)
    return {
        "real_singleton_ratio": real_singleton / max(n, 1),
        "weighted_blank_ratio": blank_num / max(total_area, 1),
        "interior_blank_line_ratio": interior_blank / max(interior_possible, 1),
        "sparse_large_table_ratio": sparse_large / max(n, 1),
        "severe_separator_count": severe,
        "row_overlap_excess_ratio":
            sum(max(0, c - 1) for c in row_cover.values()) / occupied,
    }


def _penalty(s: dict) -> float:
    # reference penalty weights (:936-943)
    return (6.0 * s["severe_separator_count"]
            + 2.5 * s["interior_blank_line_ratio"]
            + 1.5 * s["sparse_large_table_ratio"]
            + 1.0 * s["real_singleton_ratio"]
            + 0.5 * s["weighted_blank_ratio"]
            + 1.0 * s["row_overlap_excess_ratio"])


def _sheet_tables(cells: dict, merges: list,
                  links: dict | None = None,
                  rich: dict | None = None,
                  media: dict | None = None,
                  maths: dict | None = None) -> list[dict]:
    """DataRegion detection with auto gap-tolerance selection: flood fill
    at every candidate tolerance, score, pick near-best by the reference's
    tiebreak chain, then apply the semantic-subset filter to the winner
    (_select_best_gap_candidate :930-974; scores are computed on RAW
    tables, the subset filter applies to the selected candidate's output,
    exactly the reference's order).

    Returns [{"anchor": (r, c), "grid": TableGrid, "singleton": str|None}]
    in reading order.
    """
    cands = []
    for gap in GAP_CANDIDATES:
        raw = _flood_tables(cells, merges, gap, links, rich, media, maths)
        s = _candidate_summary(raw)
        cands.append({"gap": gap, "raw": raw, "summary": s,
                      "penalty": _penalty(s)})
    if not any(c["raw"] for c in cands):
        return []
    min_pen = min(c["penalty"] for c in cands)
    near = [c for c in cands if c["penalty"] <= min_pen + GAP_PREFERENCE_MARGIN]
    best = min(near, key=lambda c: (c["summary"]["severe_separator_count"],
                                    GAP_PREFERENCE[c["gap"]],
                                    c["summary"]["interior_blank_line_ratio"],
                                    c["penalty"]))
    found = best["raw"]

    # semantic-subset filter (reference :780-798): strict-subset tables go
    keep = [t for i, t in enumerate(found)
            if not any(t["semantic"] < o["semantic"]
                       for j, o in enumerate(found) if j != i)]
    keep.sort(key=lambda t: t["anchor"])
    out = []
    for t in keep:
        grid = tbl.grid_from_rows(t["rows"])
        if grid is None and t["singleton"] is None:
            continue
        out.append({"anchor": t["anchor"], "grid": grid,
                    "singleton": t["singleton"], "used": t["used"]})
    return out


# A1-style cell/range reference with optional $ anchors; open-ended
# references ($A:$B, $1:$5) deliberately fail the match — the reference
# skips charts whose bounds are not all ints
# (_parse_chart_reference_formula, xlsx_converter.py:530-564).
_RANGE_REF_RE = re.compile(
    r"^\$?([A-Za-z]{1,3})\$?([0-9]{1,7})"
    r"(?::\$?([A-Za-z]{1,3})\$?([0-9]{1,7}))?$")


def _col_index(letters: str) -> int:
    """'A' → 1, 'Z' → 26, 'AA' → 27 (openpyxl column_index_from_string)."""
    n = 0
    for ch in letters.upper():
        n = n * 26 + (ord(ch) - 64)
    return n


def _parse_range_formula(formula, sheet_name: str):
    """Parse one chart series reference formula ('Sheet1!$A$1:$B$5',
    \"'My Sheet'!$C$2\") against the current sheet
    (_parse_chart_reference_formula, xlsx_converter.py:530-564):
    None (⇒ skip the whole chart) when the formula is not a same-sheet
    closed range; otherwise ([0-based rows], [0-based cols]) — possibly
    empty for reversed bounds, exactly like range(min-1, max) there."""
    if not isinstance(formula, str):
        return None
    f = formula.strip()
    if f.startswith("'"):
        # quoted sheet name; '' escapes a literal quote inside it
        name_chars: list[str] = []
        i = 1
        while i < len(f):
            if f[i] == "'":
                if f[i + 1:i + 2] == "'":
                    name_chars.append("'")
                    i += 2
                    continue
                break
            name_chars.append(f[i])
            i += 1
        if f[i:i + 2] != "'!":
            return None
        sheet_part = "".join(name_chars)
        ref = f[i + 2:]
    else:
        sheet_part, bang, ref = f.partition("!")
        if not bang:
            return None  # unqualified range: range_to_tuple raises ⇒ skip
    if sheet_part != sheet_name:
        return None  # different-sheet source (xlsx_converter.py:547-553)
    m = _RANGE_REF_RE.match(ref.strip())
    if not m:
        return None
    min_col, min_row = _col_index(m.group(1)), int(m.group(2))
    max_col = _col_index(m.group(3)) if m.group(3) else min_col
    max_row = int(m.group(4)) if m.group(4) else min_row
    # hostile-payload clamp (not in the reference, which trusts openpyxl
    # bounds): never materialize more than MAX_REGION_DIM rows/cols
    max_row = min(max_row, min_row + MAX_REGION_DIM - 1)
    max_col = min(max_col, min_col + MAX_REGION_DIM - 1)
    return (list(range(min_row - 1, max_row)),
            list(range(min_col - 1, max_col)))


def _chart_source_axes(ranges, sheet_name: str):
    """Union of referenced rows/cols across every series formula of one
    chart (_collect_chart_source_axes, xlsx_converter.py:566-586): ANY
    unsupported formula skips the chart; no formulas or an empty union
    skips it too. Returns (sorted rows, sorted cols) or None."""
    if not isinstance(ranges, (list, tuple)) or not ranges:
        return None
    rows_set: set[int] = set()
    cols_set: set[int] = set()
    for formula in ranges[:64]:
        parsed = _parse_range_formula(formula, sheet_name)
        if parsed is None:
            return None
        rows_set.update(parsed[0])
        cols_set.update(parsed[1])
    if not rows_set or not cols_set:
        return None
    return (sorted(rows_set)[:MAX_REGION_DIM],
            sorted(cols_set)[:MAX_REGION_DIM])


def _synthetic_chart_table(rows: list[int], cols: list[int], cells: dict,
                           merges: list, links: dict, rich: dict,
                           media: dict, maths: dict):
    """Re-render the chart's source sheet selection as a table grid
    (_build_synthetic_table_from_sheet_selection, xlsx_converter.py:
    624-676): the display grid is the rows×cols cross product (a
    non-rectangular union of series ranges materializes as the full
    cross product); a merge participates only when its TOP-LEFT cell is
    selected, its span counts the SELECTED rows/cols inside the merge,
    and the other selected members vanish; cells carry the same
    link/rich/media/math machinery as flood-fill tables (the reference
    routes both through _build_excel_cell + excel_table_to_html); the
    first display row renders as header."""
    selected = {(r, c) for r in rows for c in cols}
    spans: dict[tuple, tuple] = {}
    hidden: set[tuple] = set()
    for r0, c0, r1, c1 in merges:
        top = (r0, c0)
        if top not in selected:
            continue
        sel_rows = [r for r in rows if r0 <= r <= r1]
        sel_cols = [c for c in cols if c0 <= c <= c1]
        if not sel_rows or not sel_cols:
            continue
        spans[top] = (len(sel_rows), len(sel_cols))
        for r in sel_rows:
            for c in sel_cols:
                if (r, c) != top:
                    hidden.add((r, c))
    out_rows: list[list[tbl.Cell]] = []
    for di, sr in enumerate(rows):
        row: list[tbl.Cell] = []
        for sc in cols:
            if (sr, sc) in hidden:
                continue
            rs, cs = spans.get((sr, sc), (1, 1))
            text = " ".join(str(cells.get((sr, sc), "")).split())
            row.append(tbl.Cell(text=text, rowspan=rs, colspan=cs,
                                header=(di == 0),
                                link=links.get((sr, sc), ""),
                                rich=rich.get((sr, sc)),
                                media=tuple(media.get((sr, sc), ())),
                                math=tuple(maths.get((sr, sc), ()))))
        out_rows.append(row)
    return tbl.grid_from_rows(out_rows)


def extract_xlsx(payload: dict) -> tuple[list[dict], dict]:
    sheets = payload.get("sheets", [])
    if not isinstance(sheets, list):
        sheets = []
    sheet_blocks: list[tuple[str, list[dict]]] = []
    tables_parsed = 0
    for page_idx, sheet in enumerate(sheets):
        if not isinstance(sheet, dict):
            continue
        if sheet.get("hidden") is True:
            # hidden worksheets are skipped entirely (reference
            # _iter_sheets_to_convert, xlsx_converter.py:275-286:
            # sheet_state != visible dropped unless
            # include_hidden_sheets); the >1-non-empty-sheet title
            # rule then naturally counts visible sheets only
            continue
        name = str(sheet.get("name", f"Sheet{page_idx + 1}"))
        cells: dict[tuple, str] = {}
        links: dict[tuple, str] = {}
        rich: dict[tuple, list] = {}
        for cell in sheet.get("cells") or []:
            if not isinstance(cell, dict):
                continue
            v = cell.get("v")
            segs = _rich_segments(cell.get("runs"))
            if v is None or str(v) == "":
                # runs-only cell: the plain value IS the segments' join
                # (the reference derives both views from one cell value)
                if not segs:
                    continue
                v = "".join(t for t, _st in segs)
            try:
                pos = (int(cell["r"]), int(cell["c"]))
            except (KeyError, TypeError, ValueError):
                continue
            cells[pos] = str(v)
            # cell hyperlink target (reference _get_cell_hyperlink_target
            # → sanitize → <a href> wrap, xlsx_converter.py:1524-1553);
            # only string targets qualify, like the run-level rule
            link = cell.get("link")
            if isinstance(link, str) and link.strip() \
                    and link.strip() != ".":
                links[pos] = link.strip()
            # rich styled segments (reference CellRichText parts →
            # inline font tags, xlsx_converter.py:1529-1546): the plain
            # text above stays the compare/merge key, the render uses
            # the segments
            if segs:
                rich[pos] = segs
        merges = []
        for m in sheet.get("merges") or []:
            if (isinstance(m, (list, tuple)) and len(m) == 4
                    and all(isinstance(v, int) and v >= 0 for v in m)
                    and m[0] <= m[2] and m[1] <= m[3]
                    and len(merges) < MAX_MERGES):
                merges.append(tuple(m))
        # sheet images with cell anchors (r5 directive #5; reference
        # _collect_sheet_images + table_image_map, xlsx_converter.py:
        # 312-319, 342-359): the sha256 path rides either inside its
        # anchor cell (if a table consumes that cell) or as a standalone
        # image block after the sheet's visual artifacts
        from . import emit
        anchored_imgs: list[tuple[tuple, str]] = []
        media: dict[tuple, list] = {}
        for img in (sheet.get("images") or [])[:64]:
            if not isinstance(img, dict):
                continue
            path = emit.office_image_path(img.get("data_b64"))
            if path is None:
                continue
            try:
                pos = (int(img["r"]), int(img["c"]))
            except (KeyError, TypeError, ValueError):
                continue
            anchored_imgs.append((pos, path))
            media.setdefault(pos, []).append(path)
        # cell-anchored math formulas (reference
        # _map_math_formulas_to_cells, xlsx_converter.py:361-444: OMML in
        # the sheet drawing anchored at (row, col) → latex list per cell;
        # the payload carries the converted latex, like the docx math-run
        # model carries oMath2Latex output)
        maths: dict[tuple, list] = {}
        for mt in (sheet.get("maths") or [])[:64]:
            if not isinstance(mt, dict):
                continue
            latex = mt.get("latex")
            if not isinstance(latex, str) or not latex.strip():
                continue
            try:
                pos = (int(mt["r"]), int(mt["c"]))
            except (KeyError, TypeError, ValueError):
                continue
            maths.setdefault(pos, []).append(latex.strip())
        page: list[dict] = []
        used_cells: set[tuple] = set()
        # visual artifacts (tables + charts) interleave by cell anchor,
        # charts after tables on ties via the order offset (reference
        # _convert_sheet sort, xlsx_converter.py:322-328: charts get
        # order 10_000 + i)
        artifacts: list[tuple[tuple, int, dict]] = []
        for order, t in enumerate(_sheet_tables(cells, merges, links,
                                                rich, media, maths)):
            used_cells |= t["used"]
            if t["singleton"] is not None:
                blk = {"type": "text",
                       "text": " ".join(t["singleton"].split()),
                       "page_idx": page_idx, "bbox": [0, 0, 0, 0],
                       "level": 1}
            else:
                blk = {"type": "table",
                       "text": tbl.render_table_html(t["grid"]),
                       "page_idx": page_idx, "bbox": [0, 0, 0, 0],
                       "level": 1}
                tables_parsed += 1
            artifacts.append((t["anchor"], order, blk))
        for order, ch in enumerate((sheet.get("charts") or [])[:16]):
            # sheet chart → the chart's SOURCE RANGE re-rendered as a
            # synthetic table block at the chart frame's anchor cell
            # (reference _find_charts_in_sheet :677-708: series
            # reference formulas → same-sheet row/col union →
            # _build_synthetic_table_from_sheet_selection → chart-typed
            # block; a chart with any unsupported/different-sheet/
            # open-ended formula is skipped entirely)
            if not isinstance(ch, dict):
                continue
            axes = _chart_source_axes(ch.get("ranges"), name)
            if axes is None:
                continue
            grid = _synthetic_chart_table(axes[0], axes[1], cells,
                                          merges, links, rich, media,
                                          maths)
            if grid is None:
                continue
            try:
                anchor = (int(ch.get("r", 0)), int(ch.get("c", 0)))
            except (TypeError, ValueError):
                anchor = (0, 0)
            artifacts.append((anchor, 10_000 + order,
                              {"type": "chart",
                               "text": tbl.render_table_html(grid),
                               "page_idx": page_idx, "bbox": [0, 0, 0, 0],
                               "level": 1}))
        artifacts.sort(key=lambda a: (a[0], a[1]))
        page.extend(blk for _, _, blk in artifacts)
        # images whose anchor no table consumed → standalone blocks after
        # the artifacts (reference _find_images_in_sheet :1064-1082)
        for pos, path in anchored_imgs:
            if pos in used_cells:
                continue
            page.append({"type": "image", "img_path": path, "text": "",
                         "page_idx": page_idx, "bbox": [0, 0, 0, 0],
                         "level": 1})
        sheet_blocks.append((name, page))

    # sheet titles only when >1 sheet produced content (:297-307)
    emit_titles = sum(1 for _, page in sheet_blocks if page) > 1
    blocks: list[dict] = []
    for page_idx, (name, page) in enumerate(sheet_blocks):
        if page and emit_titles:
            blocks.append({"type": "title", "text": name,
                           "page_idx": page_idx, "bbox": [0, 0, 0, 0],
                           "level": 1, "pre_rendered": True})
        blocks.extend(page)
    return blocks, {"blocks_classified": len(blocks),
                    "tables_parsed": tables_parsed}
