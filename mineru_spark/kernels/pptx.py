"""PPTX-shape fragment extraction (SURVEY.md §2.8 O2).

The reference's PPTX converter flattens slide shapes (recursively
composing GROUP transforms, pptx_converter.py:256-282 + _SlideTransform
:49-79), orders them with XY-Cut++ (:197), converts embedded tables to
HTML (:300-305, _handle_tables :597), and appends speaker notes as
page_footnote blocks after the slide content (_handle_slide_notes
:548-582).  Our payload analog is a JSON list of positioned shape
fragments:

    {"kind": "pptx_shapes", "slides": [
        {"slide_idx": 0, "size": [960, 540],
         "notes": ["speaker note", ...],                      # optional
         "shapes": [
            {"bbox": [x0,y0,x1,y1], "kind": "title"|"body"|"bullets",
             "text": "...",
             "runs": [docx-style run dicts]?},   # body: styled/link runs
            {"bbox": [...], "kind": "table", "html": "<table>…"},
            {"kind": "group", "offset": [dx,dy], "scale": [sx,sy],
             "shapes": [...]}]}]}

Shapes carry no reading order — the geometric XY-cut kernel (shared with
the PDF route, kernels/xycut.py) is the ordering operator.  Bullets render
as list items; titles as level-2 headings (slide titles are sections of
the deck document); notes become page_footnote blocks (dropped from md,
kept in content_list — the reference's BlockType.PAGE_FOOTNOTE contract).

r5 additions mirroring the reference's text-element machinery:
- NESTED LISTS: a bullets shape may carry structured `items`
  ({text, level, ordered, start?, restart?}); the kernel rebuilds the
  reference's list stack (_ensure_list_level pptx_converter.py:
  1661-1702, ordered-restart rule _should_restart_ordered_list
  :1718-1733, contiguous-level normalization
  _normalize_contiguous_list_level :1686-1693) and renders marked
  items with the reference's four-space-per-level indent
  (output_builders.py:86), shared with the docx route.
- TITLE PROMOTION: body shapes may carry `font_size` (pt) and
  `all_bold`; per slide, the most-common non-bold text size is the
  body size, the single largest all-bold text block promotes to a
  level-2 title when ≥ body+4 and ≥ second-bold+2, and every all-bold
  block at the next distinct size below the level-2 size promotes to
  level 3 when ≥ body+2 and level-2 ≥ it+2
  (_promote_slide_text_blocks_to_titles + _promote_level2/3_,
  _most_common_size tie → smallest).  Internal font keys are stripped
  from the emitted blocks (_cleanup_slide_text_block_metadata analog).
"""

from __future__ import annotations

from . import emit
from . import tables as tbl
from .xycut import xy_cut_order

# picture skip thresholds (reference pptx_converter.py:38-40)
MIN_PICTURE_DIMENSION_RATIO = 0.1
MIN_PICTURE_AREA_RATIO = 0.01
BACKGROUND_PICTURE_TEXT_COVERAGE_RATIO = 0.1


def _rect_union_area(rects: list) -> float:
    """Area of the union of axis-aligned rectangles via an x-sweep with
    y-interval merging (the standard coordinate-compression algorithm;
    the reference's _rectangles_union_area :406-443 computes the same
    quantity)."""
    if not rects:
        return 0.0
    xs = sorted({r[0] for r in rects} | {r[2] for r in rects})
    total = 0.0
    for x0, x1 in zip(xs, xs[1:]):
        if x1 <= x0:
            continue
        ys = sorted((r[1], r[3]) for r in rects if r[0] < x1 and r[2] > x0)
        if not ys:
            continue
        height = 0.0
        cy0, cy1 = ys[0]
        for y0, y1 in ys[1:]:
            if y0 <= cy1:
                cy1 = max(cy1, y1)
            else:
                height += max(0.0, cy1 - cy0)
                cy0, cy1 = y0, y1
        height += max(0.0, cy1 - cy0)
        total += (x1 - x0) * height
    return total


def _nonempty_text_shape(sp: dict) -> bool:
    """Reference _is_nonempty_text_shape/_shape_has_raw_text (:445-468):
    a text-frame shape with any non-blank text (math <m:t> counts)."""
    if sp.get("kind") not in ("title", "body", "bullets"):
        return False
    if str(sp.get("text", "") or "").strip():
        return True
    runs = sp.get("runs")
    if isinstance(runs, list):
        for r in runs:
            if not isinstance(r, dict):
                continue
            if str(r.get("text", "") or "").strip():
                return True
            m = r.get("math")
            if isinstance(m, str) and m.strip():
                return True
    items = sp.get("items")
    if isinstance(items, list):
        for it in items:
            if isinstance(it, dict) \
                    and str(it.get("text", "") or "").strip():
                return True
    return False


def _skip_picture(sp: dict, later: list[dict],
                  sw: float, sh: float) -> bool:
    """Reference _should_skip_picture (:532-547): drop decorative
    pictures — SMALL (either dimension < 10% of the slide's, or area
    < 1% of the slide's, :470-495) or BACKGROUND (the union of later
    non-empty text shapes' overlaps covers ≥ 10% of the picture,
    :497-530; 'later' = shapes after it in flattened z-order, i.e. the
    text drawn ON TOP of it)."""
    b = sp.get("bbox")
    if not isinstance(b, (list, tuple)) or len(b) < 4:
        return False
    w, h = b[2] - b[0], b[3] - b[1]
    if w > 0 and h > 0 and sw * sh > 0:
        if w < MIN_PICTURE_DIMENSION_RATIO * sw \
                or h < MIN_PICTURE_DIMENSION_RATIO * sh:
            return True
        if (w * h) / (sw * sh) < MIN_PICTURE_AREA_RATIO:
            return True
    area = max(0.0, w) * max(0.0, h)
    if area <= 0:
        return False
    overlaps = []
    for nxt in later:
        if not _nonempty_text_shape(nxt):
            continue
        nb = nxt.get("bbox")
        if not isinstance(nb, (list, tuple)) or len(nb) < 4:
            continue
        x0, y0 = max(b[0], nb[0]), max(b[1], nb[1])
        x1, y1 = min(b[2], nb[2]), min(b[3], nb[3])
        if x1 > x0 and y1 > y0:
            overlaps.append((x0, y0, x1, y1))
    if not overlaps:
        return False
    return (_rect_union_area(overlaps) / area
            >= BACKGROUND_PICTURE_TEXT_COVERAGE_RATIO)


def _flatten_shapes(shapes: list, sx: float = 1.0, sy: float = 1.0,
                    dx: float = 0.0, dy: float = 0.0) -> list[dict]:
    """Flatten nested group shapes, composing the affine slide transform
    exactly like the reference (_SlideTransform.compose :73-79): child
    coordinates are group-local; scale multiplies, offsets accumulate."""
    out: list[dict] = []
    for sp in shapes:
        if not isinstance(sp, dict):
            continue
        if sp.get("kind") == "group":
            gdx, gdy = (sp.get("offset") or [0.0, 0.0])[:2]
            gsx, gsy = (sp.get("scale") or [1.0, 1.0])[:2]
            out.extend(_flatten_shapes(
                sp.get("shapes") or [],
                sx * gsx, sy * gsy,
                sx * gdx + dx, sy * gdy + dy))
            continue
        b = sp.get("bbox")
        if not (isinstance(b, list) and len(b) == 4):
            continue
        out.append({**sp, "bbox": [sx * b[0] + dx, sy * b[1] + dy,
                                   sx * b[2] + dx, sy * b[3] + dy]})
    return out


def _build_list_lines(items: list) -> tuple[list[str], str]:
    """Structured list items → marker-prefixed md lines + root attribute,
    via the reference's list-stack algebra (pptx_converter.py:1661-1733):
    pop to the target depth, pop on attribute switch at the same depth,
    pop when an EXPLICIT ordered restart's start differs from the
    continuation number (start + direct item count), push missing levels
    carrying the item's attribute (start only at the target level), and
    normalize the first visible level to 0 so a missing parent level
    can't indent the whole list (:1686-1693)."""
    stack: list[dict] = []   # {attr, start, count(direct items)}
    lines: list[str] = []
    base: int | None = None
    root_attr = "unordered"
    for it in items:
        if not isinstance(it, dict):
            continue
        text = emit.normalize_text(str(it.get("text", ""))).strip()
        if not text:
            continue
        attr = "ordered" if it.get("ordered") else "unordered"
        try:
            raw = int(it.get("level", 0) or 0)
        except (TypeError, ValueError):
            raw = 0
        if base is None:
            base = raw
            root_attr = attr
        level = max(0, raw - base)
        start = it.get("start")
        start = int(start) if isinstance(start, (int, float)) \
            and not isinstance(start, bool) else None
        while len(stack) > level + 1:
            stack.pop()
        if len(stack) == level + 1 and stack[level]["attr"] != attr:
            stack.pop()
        if (bool(it.get("restart")) and attr == "ordered"
                and start is not None and len(stack) == level + 1
                and stack[level]["attr"] == "ordered"
                and stack[level]["count"]
                and start != stack[level]["start"] + stack[level]["count"]):
            stack.pop()
        while len(stack) < level + 1:
            ilevel = len(stack)
            st = start if (attr == "ordered" and start is not None
                           and ilevel == level) else 1
            stack.append({"attr": attr, "start": st, "count": 0})
        node = stack[level]
        marker = (f"{node['start'] + node['count']}. "
                  if node["attr"] == "ordered" else "- ")
        lines.append("    " * level + marker
                     + emit.escape_markdown(text))
        node["count"] += 1
    return lines, root_attr


def _promote_titles(slide_blocks: list[dict]) -> None:
    """Font-size title promotion over one slide's blocks (reference
    _promote_slide_text_blocks_to_titles + _promote_level2_text_blocks
    + _promote_level3_text_blocks; _most_common_size ties break to the
    SMALLEST size).  Thresholds are the spec: level-2 needs a UNIQUE
    largest all-bold text block ≥ body+4 (when a body size exists) and
    ≥ second-bold+2 (when one exists); level-3 needs a body size, an
    existing level-2 title with a font size, and promotes EVERY
    all-bold text block at the largest bold size strictly below the
    level-2 size when it is ≥ body+2 and level-2 ≥ it+2."""
    from collections import Counter

    sizes = [b["_fs"] for b in slide_blocks
             if b.get("type") == "text" and b.get("_fs") is not None
             and not b.get("_ab")]
    body = (min(Counter(sizes).items(), key=lambda kv: (-kv[1], kv[0]))[0]
            if sizes else None)
    bold = [b for b in slide_blocks
            if b.get("type") == "text" and b.get("_ab")
            and b.get("_fs") is not None]
    if bold:
        bsizes = sorted({b["_fs"] for b in bold}, reverse=True)
        cands = [b for b in bold if b["_fs"] == bsizes[0]]
        if (len(cands) == 1
                and (body is None or bsizes[0] >= body + 4)
                and (len(bsizes) < 2 or bsizes[0] >= bsizes[1] + 2)):
            cands[0]["type"] = "title"
            cands[0]["level"] = 2
    if body is None:
        return
    l2 = sorted({b["_fs"] for b in slide_blocks
                 if b.get("type") == "title" and b.get("level") == 2
                 and b.get("_fs") is not None}, reverse=True)
    if not l2:
        return
    l3s = sorted({b["_fs"] for b in slide_blocks
                  if b.get("type") == "text" and b.get("_ab")
                  and b.get("_fs") is not None and b["_fs"] < l2[0]},
                 reverse=True)
    if not l3s or l3s[0] < body + 2 or l2[0] < l3s[0] + 2:
        return
    for b in slide_blocks:
        if (b.get("type") == "text" and b.get("_ab")
                and b.get("_fs") == l3s[0]):
            b["type"] = "title"
            b["level"] = 3


def extract_pptx(payload: dict) -> tuple[list[dict], dict]:
    blocks: list[dict] = []
    tables_parsed = 0
    slides = payload.get("slides", [])
    if not isinstance(slides, list):
        slides = []
    for slide in slides:
        if not isinstance(slide, dict):
            continue
        sidx = int(slide.get("slide_idx", 0))
        sw, sh = (slide.get("size") or [960.0, 540.0])[:2]
        shapes = _flatten_shapes(slide.get("shapes") or [])
        # decorative-picture skip decided in flattened z-order (the
        # payload order), BEFORE reading-order sorting: 'later' shapes
        # are the ones drawn on top (reference _collect_shape_blocks)
        skip = {i for i, sp in enumerate(shapes)
                if sp.get("kind") == "image"
                and _skip_picture(sp, shapes[i + 1:], float(sw),
                                  float(sh))}
        order = xy_cut_order([sp["bbox"] for sp in shapes])
        slide_start = len(blocks)  # slice for per-slide title promotion
        for i in order:
            sp = shapes[i]
            kind = sp.get("kind", "body")
            b = sp["bbox"]
            nb = [round(b[0] / sw * 1000), round(b[1] / sh * 1000),
                  round(b[2] / sw * 1000), round(b[3] / sh * 1000)]
            if kind == "table":
                grids = tbl.parse_tables(str(sp.get("html", "")))
                if grids:
                    tables_parsed += 1
                    blocks.append({"type": "table",
                                   "text": tbl.render_table_html(grids[0]),
                                   "page_idx": sidx, "bbox": nb, "level": 1})
                continue
            if kind == "chart":
                # graph frame shape (reference _handle_chart,
                # pptx_converter.py:689-720): unlike the docx route the
                # block is appended ONLY when the render is non-empty
                # (:712-713 `if not chart_html: return`)
                from . import charts
                spec = sp.get("chart")
                html = charts.chart_to_html(spec) \
                    if isinstance(spec, dict) else ""
                if html:
                    blocks.append({"type": "chart", "text": html,
                                   "page_idx": sidx, "bbox": nb,
                                   "level": 1})
                continue
            if kind == "image":
                if i in skip:
                    continue  # small/background decorative picture
                # picture shape → image block via the SHARED office
                # image contract (emit.office_image_block: strict base64,
                # sha256-of-bytes path, degrade on bad data) — one
                # definition with the docx route
                blk = emit.office_image_block(sp.get("data_b64"),
                                              page_idx=sidx, bbox=nb)
                if blk is not None:
                    blocks.append(blk)
                continue
            if kind == "bullets" and isinstance(sp.get("items"), list) \
                    and sp["items"]:
                # structured multi-level list items (reference
                # _handle_text_elements list branch)
                lines, root_attr = _build_list_lines(sp["items"])
                if lines:
                    blocks.append({"type": "list",
                                   "text": "\n".join(lines),
                                   "page_idx": sidx, "bbox": nb,
                                   "level": 1, "pre_rendered": True,
                                   "items_marked": True,
                                   "attribute": root_attr})
                continue
            text = str(sp.get("text", "")).strip()
            rich = (kind == "body" and isinstance(sp.get("runs"), list))
            if not text and not rich:
                continue
            if kind == "title":
                btype, level = "title", 2
            elif kind == "bullets":
                btype, level = "list", 1
                text = "\n".join(ln.lstrip("•◦-* ").strip()
                                 for ln in text.split("\n") if ln.strip())
            else:
                btype, level = "text", 1
                text = emit.merge_lines(text.split("\n"))
            rec = {"type": btype, "text": text, "page_idx": sidx,
                   "bbox": nb, "level": level}
            fs = sp.get("font_size")
            if isinstance(fs, (int, float)) and not isinstance(fs, bool):
                rec["_fs"] = float(fs)
                rec["_ab"] = bool(sp.get("all_bold"))
            if rich:
                # styled/hyperlink runs through the SHARED office run
                # machinery (the reference routes pptx runs through the
                # same office_rich_text helpers as docx,
                # pptx_converter.py:570 _build_paragraph_rich_text +
                # :1009-1028 hyperlink tag; office_rich_text.py:180-228)
                from . import inline
                from .docx import _render_runs
                rraw, rrecs = _render_runs(sp["runs"])
                rtext = inline.finalize_text_block(rraw)
                if rtext:
                    rec.update(text=rtext, pre_rendered=True, _runs=rrecs)
                elif not text:
                    continue
            blocks.append(rec)
        # per-slide title promotion, then strip the internal font keys
        # (the reference's _cleanup_slide_text_block_metadata)
        _promote_titles(blocks[slide_start:])
        for b in blocks[slide_start:]:
            b.pop("_fs", None)
            b.pop("_ab", None)
        # speaker notes AFTER the slide's shapes (reference :206, :548-582)
        notes = slide.get("notes")
        if isinstance(notes, str):
            notes = [notes]
        for note in notes or []:
            note = " ".join(str(note).split())
            if note:
                blocks.append({"type": "page_footnote", "text": note,
                               "page_idx": sidx, "bbox": [0, 0, 0, 0],
                               "level": 1})
    metrics_extra = {"blocks_classified": len(blocks),
                     "tables_parsed": tables_parsed}
    return blocks, metrics_extra
