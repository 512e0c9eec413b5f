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
"""

from __future__ import annotations

from . import emit
from . import tables as tbl
from .xycut import xy_cut_order


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
        order = xy_cut_order([sp["bbox"] for sp in shapes])
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
                # picture shape → image block via the SHARED office
                # image contract (emit.office_image_block: strict base64,
                # sha256-of-bytes path, degrade on bad data) — one
                # definition with the docx route
                blk = emit.office_image_block(sp.get("data_b64"),
                                              page_idx=sidx, bbox=nb)
                if blk is not None:
                    blocks.append(blk)
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
            if rich:
                # styled/hyperlink runs through the SHARED office run
                # machinery (the reference routes pptx runs through the
                # same office_rich_text helpers as docx,
                # pptx_converter.py:570 _build_paragraph_rich_text +
                # :1009-1028 hyperlink tag; office_rich_text.py:180-228)
                from .docx import _render_runs
                rtext, rrecs = _render_runs(sp["runs"])
                if rtext:
                    rec.update(text=rtext, pre_rendered=True, _runs=rrecs)
                elif not text:
                    continue
            blocks.append(rec)
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
