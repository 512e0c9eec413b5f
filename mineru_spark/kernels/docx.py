"""DOCX-style run fragment extraction (SURVEY.md §2.8 O1).

The reference's DOCX converter walks the document XML linearly, resolves
the style chain, renders styled runs, and handles numbered lists
(reference mineru/model/docx/docx_converter.py: `_walk_linear` :818,
`_add_list_item` :2485).  Our payload analog is the post-XML shape — a
linear list of styled paragraphs with inline runs:

    {"kind": "docx_runs", "paras": [
        {"style": "Heading1"|"Heading2"|"Normal"|"ListParagraph"|"Code",
         "numbered": false,
         "runs": [{"text": "...", "bold": false, "italic": false}]}]}

Semantics re-expressed:
- style chain → block type (headings → title levels, ListParagraph →
  list items merged into one list block, Code → fenced block);
- inline bold/italic runs → `**`/`*` markdown with the escape rules of
  the shared emission kernel applied to the run text first;
- consecutive ListParagraph paragraphs coalesce into ONE list block
  (the reference's numbering-context behavior).
"""

from __future__ import annotations

from . import emit

_STYLE_HEADING = {"Heading1": 1, "Heading2": 2, "Heading3": 3}


def _render_runs(runs: list) -> str:
    parts = []
    for r in runs:
        if not isinstance(r, dict):
            continue
        t = emit.escape_markdown(emit.normalize_text(str(r.get("text", ""))))
        if not t:
            continue
        if r.get("bold"):
            t = f"**{t}**"
        if r.get("italic"):
            t = f"*{t}*"
        parts.append(t)
    return " ".join(parts)


def extract_docx(payload: dict) -> tuple[list[dict], dict]:
    blocks: list[dict] = []
    paras = payload.get("paras", [])
    if not isinstance(paras, list):
        paras = []
    pending_items: list[str] = []

    def flush_list():
        nonlocal pending_items
        if pending_items:
            blocks.append({"type": "list", "text": "\n".join(pending_items),
                           "page_idx": 0, "bbox": [0, 0, 0, 0], "level": 1,
                           "pre_rendered": True})
            pending_items = []

    for p in paras:
        if not isinstance(p, dict):
            continue
        style = str(p.get("style", "Normal"))
        text = _render_runs(p.get("runs") or [])
        if not text:
            continue
        if style == "ListParagraph":
            pending_items.append(text)
            continue
        flush_list()
        if style in _STYLE_HEADING:
            blocks.append({"type": "title", "text": text, "page_idx": 0,
                           "bbox": [0, 0, 0, 0],
                           "level": _STYLE_HEADING[style],
                           "pre_rendered": True})
        elif style == "Code":
            blocks.append({"type": "code", "text": text, "page_idx": 0,
                           "bbox": [0, 0, 0, 0], "level": 1})
        else:
            blocks.append({"type": "text", "text": text, "page_idx": 0,
                           "bbox": [0, 0, 0, 0], "level": 1,
                           "pre_rendered": True})
    flush_list()
    return blocks, {"blocks_classified": len(blocks)}
