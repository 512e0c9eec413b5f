"""PPTX-shape fragment extraction (SURVEY.md §2.8 O2).

The reference's PPTX converter flattens slide shapes and orders them with
XY-Cut++ (reference mineru/model/pptx/pptx_converter.py:197 using
xycut_pp_sorter).  Our payload analog is a JSON list of positioned shape
fragments:

    {"kind": "pptx_shapes", "slides": [
        {"slide_idx": 0, "size": [960, 540],
         "shapes": [{"bbox": [x0,y0,x1,y1], "kind": "title"|"body"|"bullets",
                     "text": "..."}]}]}

Shapes carry no reading order — the geometric XY-cut kernel (shared with
the PDF route, kernels/xycut.py) is the ordering operator.  Bullets render
as list items; titles as level-2 headings (slide titles are sections of
the deck document).
"""

from __future__ import annotations

from . import emit
from .xycut import xy_cut_order


def extract_pptx(payload: dict) -> tuple[list[dict], dict]:
    blocks: list[dict] = []
    slides = payload.get("slides", [])
    if not isinstance(slides, list):
        slides = []
    for slide in slides:
        if not isinstance(slide, dict):
            continue
        sidx = int(slide.get("slide_idx", 0))
        sw, sh = (slide.get("size") or [960.0, 540.0])[:2]
        shapes = [sp for sp in (slide.get("shapes") or [])
                  if isinstance(sp, dict) and isinstance(sp.get("bbox"), list)
                  and len(sp["bbox"]) == 4]
        order = xy_cut_order([sp["bbox"] for sp in shapes])
        for i in order:
            sp = shapes[i]
            kind = sp.get("kind", "body")
            text = str(sp.get("text", "")).strip()
            if not text:
                continue
            b = sp["bbox"]
            nb = [round(b[0] / sw * 1000), round(b[1] / sh * 1000),
                  round(b[2] / sw * 1000), round(b[3] / sh * 1000)]
            if kind == "title":
                btype, level = "title", 2
            elif kind == "bullets":
                btype, level = "list", 1
                text = "\n".join(ln.lstrip("•◦-* ").strip()
                                 for ln in text.split("\n") if ln.strip())
            else:
                btype, level = "text", 1
                text = emit.merge_lines(text.split("\n"))
            blocks.append({"type": btype, "text": text, "page_idx": sidx,
                           "bbox": nb, "level": level})
    metrics_extra = {"blocks_classified": len(blocks)}
    return blocks, metrics_extra
