"""DOCX-style run fragment extraction (SURVEY.md §2.8 O1).

The reference's DOCX converter walks the document XML linearly, resolves
the style chain, renders styled runs, handles numbered lists via the
numbering part, converts OMML math, and turns TOC structures into index
blocks (reference mineru/model/docx/docx_converter.py: `_walk_linear`
:818, `_add_list_item` :2485, numbering chain `_get_numId_and_ilvl`
:2239 + per-(numId, ilvl) counters :96-114, OMML → latex via oMath2Latex
:1237/:2098, TOC handling :928/:1419-1432, hidden webHidden page-number
runs :375-388).  Our payload analog is the post-XML shape — a linear list
of styled paragraphs with inline runs:

    {"kind": "docx_runs", "paras": [
        {"style": "Heading1"|"Heading2"|"Normal"|"ListParagraph"|"Code"
                  |"TOC",
         "num": {"id": int, "ilvl": int, "ordered": bool},   # optional
         "sect": {"type": "nextPage"|"continuous"|...,       # optional:
                  "pg_mar_zero": bool},  # sectPr → page break (see loop)
         "runs": [{"text": "...", "bold": false, "italic": false,
                   "underline": false, "strikethrough": false,
                   "script": "super"|"sub"?, "hidden": false,
                   "link": "https://..."?}
                  | {"math": "latex"}
                  | {"image": {"data_b64": "...", "rel_id": "rId7"?}}]}
      | {"style": "Table",
         "rows": [[{"text": "...", "rowspan": 1, "colspan": 1,
                    "header": false, "math": "latex"?}, ...], ...]}]}

Semantics re-expressed:
- style chain → block type (headings → title levels, ListParagraph →
  list items, Code → fenced block, TOC → index block);
- inline bold/italic runs → `**`/`*` markdown with the escape rules of
  the shared emission kernel applied to the run text first;
- HYPERLINK runs → `[text](target)` with the reference's escaping
  (label brackets, URL parens → %28/%29; docx_converter.py:209-240),
  same-target run grouping (office_rich_text.py:195-228) and
  invalid-target fallback to plain text (:172-192); typed run records
  additionally feed content_list_v2 (directives r4 #2/#4);
- OMML math runs → inline `$…$` (oMath2Latex analog: latex arrives on
  the run, like the charstream's Math-font spans);
- hidden runs (webHidden TOC page-number fields) are dropped;
- NUMBERING CHAINS: ordered items keep a per-(numId, ilvl) counter that
  SURVIVES interruptions — a later group with the same numId continues
  3., 4., … exactly like Word (reference counter cache :101);
- ilvl nesting indents items four spaces per level (the shared
  office list builder, output_builders.py:86);
- consecutive TOC paragraphs coalesce into one index block;
- TABLES: a `Table` para carries cell rows (vMerge/gridSpan already
  resolved to rowspan/colspan, the post-XML analog of the reference's
  mammoth table→HTML path, docx_converter.py:960-1122); cells render
  through the shared grid algebra (kernels/tables.py) into the canonical
  table HTML, with OMML cell equations injected as `$…$` like the
  reference's _inject_equations_into_table (:1125-1236).
"""

from __future__ import annotations

import re

from . import emit

_STYLE_HEADING = {"Heading1": 1, "Heading2": 2, "Heading3": 3}

# the reference's known text styles (docx_converter.py:1545-1554): a
# paragraph in this set is always plain TEXT; only styles OUTSIDE it are
# eligible for the SEQ-field caption check (:1568-1579)
_TEXT_STYLES = frozenset({"Paragraph", "Normal", "Subtitle", "Author",
                          "DefaultText", "ListParagraph", "ListBullet",
                          "Quote"})


def _valid_link_target(target) -> bool:
    """Reference is_valid_hyperlink_target (office_rich_text.py:172-178):
    non-None, non-blank, and not the self-referential '.'.  Hostile
    payloads: only STRING targets qualify — a dict/list in the link slot
    must degrade to plain text, not stringify into a URL."""
    if not isinstance(target, str):
        return False
    t = target.strip()
    # compare the STRIPPED target to '.' — the url renderer strips too,
    # so ' . ' must degrade like '.' (reference compares unstripped, but
    # its renderer does not strip either; ours does, so validity and
    # rendering must agree)
    return bool(t and t != ".")


def _escape_link_url(url: str) -> str:
    """Parens break the []() form — %-encode them (reference
    _escape_hyperlink_url, docx_converter.py:226-240; the helper is
    latent in the current snapshot but kept for markdown validity)."""
    return str(url).strip().replace("(", "%28").replace(")", "%29")


_VISIBLE_SPACE_STYLES = ("underline", "emphasis", "strikethrough")


def _run_styles(r: dict) -> tuple[str, ...]:
    """Ordered style names of a run (reference formatting_to_style_str,
    office_rich_text.py:44-62: bold, italic, underline, emphasis,
    strikethrough, then super/subscript)."""
    styles = []
    for k in ("bold", "italic", "underline", "emphasis",
              "strikethrough"):
        if r.get(k):
            styles.append(k)
    if r.get("script") == "super":
        styles.append("superscript")
    elif r.get("script") == "sub":
        styles.append("subscript")
    return tuple(styles)


def _norm_blank_styles(content: str,
                       styles: tuple[str, ...]) -> tuple[str, ...]:
    """Blank-run style normalization (reference normalize_format_for_text,
    office_rich_text.py:88-115): a whitespace-only run drops its
    non-visible bold/italic; if no visible style (underline / emphasis /
    strikethrough) remains, the whole style set drops."""
    if content.strip() or not styles:
        return styles
    if not any(s in _VISIBLE_SPACE_STYLES for s in styles):
        return ()
    return tuple(s for s in styles if s not in ("bold", "italic"))


def _record_of(content: str, styles: tuple[str, ...]):
    """One text span → one typed v2 record (oracle.runs_from_records):
    (type, content) with type text|bold|italic|bold_italic, or
    ("styled", content, [styles...]) for the full chain.  Content is
    normalized (the repo's v2 contract); a whitespace-only span with a
    VISIBLE style keeps its raw width-normalized content so the span
    survives — reference _span_has_content_for_v2
    (output_builders.py:716-731)."""
    plain = emit.normalize_text(content)
    if not plain:
        if content and any(s in ("underline", "strikethrough")
                           for s in styles):
            return ("styled", emit.fullwidth_to_halfwidth(content),
                    list(styles))
        return None
    sset = frozenset(styles)
    if not styles:
        return ("text", plain)
    if sset == {"bold", "italic"}:
        return ("bold_italic", plain)
    if sset in ({"bold"}, {"italic"}):
        return (styles[0], plain)
    return ("styled", plain, list(styles))


def _spans_and_records(runs: list) -> tuple[list, list]:
    """Payload runs → (inline span stream, typed v2 records).

    Spans feed the shared office inline renderer (kernels/inline.py, the
    inline_renderer.py analog); records feed content_list_v2
    (oracle.runs_from_records).  Runs carry their OWN whitespace like
    Word's (the converter concatenates run texts directly); hidden runs
    (webHidden TOC page-number fields) drop; consecutive runs sharing
    one valid link target group into ONE hyperlink span with styled
    children (format_hyperlink_group / _format_hyperlink_segments,
    office_rich_text.py:195-228; invalid targets — None/blank/'.' —
    degrade to plain styled text per :180-192)."""
    spans: list = []
    records: list = []
    i, n = 0, len(runs)
    while i < n:
        r = runs[i]
        if not isinstance(r, dict) or r.get("hidden"):
            i += 1
            continue
        if "math" in r:
            m = r.get("math")
            m = m.strip() if isinstance(m, str) else ""
            if m:
                # display flag → INTERLINE span (office display math,
                # inline_renderer.py:919-929); default inline
                kind = ("interline_equation" if r.get("display")
                        else "inline_equation")
                spans.append({"type": kind, "content": m})
                records.append((kind, m))
            i += 1
            continue
        link = r.get("link")
        if _valid_link_target(link):
            group = [r]
            j = i + 1
            while j < n and isinstance(runs[j], dict) \
                    and not runs[j].get("hidden") \
                    and "math" not in runs[j] \
                    and str(runs[j].get("link", "")) == str(link):
                group.append(runs[j])
                j += 1
            children = []
            for g in group:
                raw = emit.fullwidth_to_halfwidth(str(g.get("text", "")))
                st = _norm_blank_styles(raw, _run_styles(g))
                children.append({"type": "text", "content": raw,
                                 "style": list(st)})
            label_plain = emit.normalize_text(
                "".join(c["content"] for c in children))
            if label_plain:
                spans.append({"type": "hyperlink",
                              "url": _escape_link_url(link),
                              "children": children})
                records.append(("hyperlink", label_plain,
                                str(link).strip()))
            i = j
            continue
        raw = emit.fullwidth_to_halfwidth(str(r.get("text", "")))
        if raw:
            styles = _norm_blank_styles(raw, _run_styles(r))
            spans.append({"type": "text", "content": raw,
                          "style": list(styles)})
            rec = _record_of(raw, styles)
            if rec is not None:
                records.append(rec)
        i += 1
    return spans, records


def _render_runs(runs: list) -> tuple[str, list[tuple]]:
    """Inline runs → (UNFINALIZED paragraph text, typed run records).

    The text is the reference's merge_para_with_text render core
    (kernels/inline.py): block-level markdown/HTML syntax selection,
    style-key grouping, visible-space markers, equation padding and the
    markdown boundary-space rule.  NO text-block post-processing is
    applied — callers finalize per block kind (inline.finalize_text_block
    for TEXT blocks and list items, .strip() for titles/captions, per
    merge_para_with_text :954-959 and output_builders.py:93)."""
    from . import inline

    spans, records = _spans_and_records(runs)
    return inline.render_spans(spans), records


import re as _re

_TOC_ROMAN_RE = _re.compile(r"[ivxlcdm]+", _re.IGNORECASE)
_TOC_NUM_PREFIX_RE = _re.compile(r"^(\d+(?:\.\d+)+)(?![\d.])")
_CJK_RE = _re.compile(r"[一-鿿]")


def _looks_like_index_page_token(token: str) -> bool:
    """Page-number shape test for TOC tab tails (reference
    _looks_like_index_page_token, output_builders.py:164-180): short
    (≤12), no CJK, and all-digits OR roman numerals OR a single ASCII
    letter.  Anything else is body content and must NOT be stripped."""
    token = token.strip()
    if not token or len(token) > 12:
        return False
    if _CJK_RE.search(token):
        return False
    if token.isdigit():
        return True
    if _TOC_ROMAN_RE.fullmatch(token):
        return True
    return len(token) == 1 and token.isalpha() and token.isascii()


def _strip_toc_page_tail(runs: list) -> list:
    """Drop the trailing tab+page-number from a TOC item's runs and turn
    remaining tabs into spaces (reference _strip_index_page_tail,
    output_builders.py:182-203): the LAST visible non-math run containing
    a tab is split at its last tab; the tail is stripped only when it
    looks like a page token; every other tab in non-math runs becomes a
    plain space.  Math runs are never touched (the reference skips
    INLINE_EQUATION spans)."""
    def _tabbable(r) -> bool:
        return isinstance(r, dict) and "math" not in r \
            and not r.get("hidden") and isinstance(r.get("text"), str)

    last = -1
    for idx, r in enumerate(runs):
        if _tabbable(r) and "\t" in r["text"]:
            last = idx
    strip = False
    if last >= 0:
        strip = _looks_like_index_page_token(
            runs[last]["text"].rsplit("\t", 1)[1])
    out = []
    for idx, r in enumerate(runs):
        if _tabbable(r) and "\t" in r["text"]:
            t = r["text"]
            if idx == last and strip:
                t = t.rsplit("\t", 1)[0]
            r = {**r, "text": t.replace("\t", " ")}
        out.append(r)
    return out


def _render_toc_item(runs: list) -> tuple[str, str, list[tuple]]:
    """One TOC paragraph's runs → (md text, plain text, v2 records).

    Reference _render_index_leaf_item (output_builders.py:269-292):
    page tail stripped first; the block's inline syntax is selected with
    hyperlink spans included; hyperlink items keep their VISIBLE text
    only (plain_text_only=True — style kept, target dropped,
    _render_mixed_index_item :238-267); when every non-empty non-math
    item shares one identical non-empty style the leaf renders with a
    SINGLE style wrapper around the ''-joined escaped text
    (_render_uniform_index_item :220-236 — avoids fragmented markers).
    Typed v2 records keep the hyperlink URL (the index block retains its
    HYPERLINK spans; only the renderer drops the target)."""
    from . import inline

    stripped = _strip_toc_page_tail(runs)
    spans, records = _spans_and_records(stripped)
    syntax = inline.select_syntax(spans)
    # flatten to (content, kind, style) items (_collect_index_span_items
    # :143-154; hyperlink children keep their per-child styles)
    items: list[tuple] = []
    for sp in spans:
        if sp["type"] == "inline_equation":
            items.append((sp["content"], "inline_equation", []))
        elif sp["type"] == "hyperlink":
            for c in sp.get("children") or []:
                items.append((str(c.get("content", "")), "hyperlink",
                              list(c.get("style") or [])))
        else:
            items.append((str(sp.get("content", "")), "text",
                          list(sp.get("style") or [])))
    plain = emit.normalize_text(
        "".join(c for c, k, _ in items if k != "inline_equation"))

    non_eq_styles = [tuple(st) for c, k, st in items
                     if c and k != "inline_equation"]
    uniform = None
    if non_eq_styles and non_eq_styles[0] \
            and all(s == non_eq_styles[0] for s in non_eq_styles):
        uniform = list(non_eq_styles[0])

    if uniform:
        raw_parts = []
        for c, k, _st in items:
            if not c:
                continue
            if k == "inline_equation":
                raw_parts.append(f"${c}$")
            else:
                raw_parts.append(inline._esc(c, syntax))
        text = "".join(raw_parts).strip()
        md = inline._apply_style(text, uniform, syntax) if text else ""
        return md, plain, records

    parts: list = []
    for c, k, st in items:
        if not c:
            continue
        if k == "inline_equation":
            parts.append(inline._part("inline_equation", f"${c}$"))
        elif k == "hyperlink":
            inline._append_hyperlink_part(parts, c, st, syntax,
                                          plain_text_only=True)
        else:
            inline._append_text_part(parts, c, st, syntax)
    md = inline.join_parts(parts).strip()
    return md, plain, records


def _correct_toc_level_by_text(level: int, plain: str) -> int:
    """Multi-level section numbers in the item text can only make an
    over-deep TOC style SHALLOWER (reference _correct_toc_level_by_text,
    docx_converter.py:2870-2891): '1.2 Foo' has text depth 1, '1.2.3'
    depth 2; level 0 is never corrected, and single numbers ('3.') never
    match (the regex needs at least one dot group)."""
    if level <= 0:
        return max(0, level)
    m = _TOC_NUM_PREFIX_RE.match(plain.strip())
    if m:
        text_level = m.group(1).count(".")
        if text_level < level:
            return text_level
    return level


def _valid_anchor(anchor) -> str | None:
    if not isinstance(anchor, str):
        return None
    a = anchor.strip()
    return a or None


def _table_grid(rows_payload: list):
    """Cell rows → normalized TableGrid via the shared rowspan/colspan
    occupancy algebra (tables.grid_from_rows); None when degenerate."""
    from . import tables as tbl

    cell_rows = []
    for row in rows_payload:
        if not isinstance(row, list):
            continue
        crow = []
        for c in row:
            if not isinstance(c, dict):
                continue
            text = " ".join(str(c.get("text", "")).split())
            math = str(c.get("math", "")).strip()
            if math:
                # reference equation injection: formulas lost by the HTML
                # table path are re-added to the cell as $…$
                text = f"{text} ${math}$" if text else f"${math}$"
            crow.append(tbl.Cell(text=text,
                                 rowspan=tbl.span_of(c.get("rowspan")),
                                 colspan=tbl.span_of(c.get("colspan")),
                                 header=bool(c.get("header"))))
        if crow:
            cell_rows.append(crow)
    if not cell_rows:
        return None
    # mammoth gridSpan artifact fix before the occupancy resolve
    # (reference _normalize_table_colspans, docx_converter.py:1284-1372,
    # applied to every docx table at :1264/:1277)
    tbl.normalize_row_colspans(cell_rows)
    return tbl.grid_from_rows(cell_rows)


def _detect_heading_numids(paras: list) -> set:
    """Pre-scan for numIds used as SECTION HEADINGS (reference
    _detect_heading_list_numids, docx_converter.py:2688-2765).  A numId
    converts to title blocks only when BOTH hold:
      1. body content (a non-list text paragraph or a table) appears
         BETWEEN two of its items, and
      2. its items occur at more than one indent level (a genuine
         multi-level structure, not a single-level entry list).
    Heading-styled paragraphs count as neither list nor content
    (reference excludes Title/Heading, :2727-2733)."""
    items: list[tuple] = []
    ilvls: dict = {}
    for p in paras:
        if not isinstance(p, dict):
            continue
        style = str(p.get("style", "Normal"))
        if style in _STYLE_HEADING:
            continue
        if style == "Table":
            if p.get("rows"):
                items.append(("content", None))
            continue
        runs = p.get("runs") or []
        if not isinstance(runs, list):
            runs = []
        raw = "".join(str(r.get("text", "")) for r in runs
                      if isinstance(r, dict))
        if not raw.strip():
            continue
        num = p.get("num") if isinstance(p.get("num"), dict) else None
        if style == "ListParagraph" and num is not None \
                and num.get("id") is not None:
            nid = num.get("id")
            il = num.get("ilvl", 0)
            if not isinstance(il, int) or isinstance(il, bool):
                il = 0
            items.append(("list", nid))
            ilvls.setdefault(nid, set()).add(il)
        else:
            items.append(("content", None))
    heading: set = set()
    seen: dict = {}
    for kind, nid in items:
        if kind == "list":
            if seen.get(nid):
                heading.add(nid)
            seen[nid] = False
        else:
            for k in seen:
                seen[k] = True
    return {n for n in heading if len(ilvls.get(n, ())) > 1}


_SECTION_NUM_RE = re.compile(r"^(\d+(?:\.\d+)*)")


def _assign_section_numbers(blocks: list[dict]) -> None:
    """Document-level hierarchical section numbering over title blocks
    (reference result_to_middle_json, model_output_to_middle_json.py:
    132-168): a numbered-style title floors its ancestor counters at 1,
    increments its own level, resets deeper levels, and receives
    section_number "1.2.1"; a NON-numbered title whose raw content
    starts with a literal number of exactly its level's depth
    (_extract_section_parts_from_content :68-83) SYNCS the counters so
    later numbered titles continue from the right base."""
    counters: dict[int, int] = {}
    for b in blocks:
        if b.get("type") != "title" or "is_numbered_style" not in b:
            continue
        level = max(1, int(b.get("level", 1) or 1))
        if b["is_numbered_style"]:
            for anc in range(1, level):
                if counters.get(anc, 0) == 0:
                    counters[anc] = 1
            counters[level] = counters.get(level, 0) + 1
            for d in list(counters):
                if d > level:
                    counters[d] = 0
            b["section_number"] = ".".join(
                str(counters.get(lv, 0)) for lv in range(1, level + 1))
        else:
            recs = b.get("_runs") or []
            content = str(recs[0][1]) if recs and len(recs[0]) > 1 \
                else str(b.get("text", ""))
            m = _SECTION_NUM_RE.match(content.strip())
            if m:
                parts = [int(x) for x in m.group(1).split(".")]
                if len(parts) == level:
                    for k, v in enumerate(parts, start=1):
                        counters[k] = v
                    for d in list(counters):
                        if d > level:
                            counters[d] = 0


def _mount_toc_anchor_links(blocks: list[dict]) -> None:
    """Validate TOC entry anchors against the parsed body blocks, then
    mount [text](#anchor) links (reference _link_index_entries_by_anchor,
    model_output_to_middle_json.py:94-123 + the leaf render
    output_builders.py:269-292): an entry keeps its anchor only when
    some body block carries that bookmark; dangling anchors are removed
    so no dead internal link renders.  QUIRK preserved: when NO body
    block carries any anchor the reference returns before filtering, so
    every TOC anchor survives and links mount for all of them."""
    valid = {b["anchor"].strip() for b in blocks
             if isinstance(b.get("anchor"), str) and b["anchor"].strip()}
    for b in blocks:
        items = b.get("toc_items")
        if b.get("type") != "index" or not items:
            continue
        lines: list[str] = []
        for it in items:
            a = it.get("anchor")
            a = a.strip() if isinstance(a, str) else ""
            if a and valid and a not in valid:
                it.pop("anchor", None)
                a = ""
            elif a:
                it["anchor"] = a
            text = it["text"]
            if a:
                text = f"[{text}](#{_escape_link_url(a)})"
            lines.append(f"{'    ' * it['ilevel']}- {text}")
        b["text"] = "\n".join(lines)


def extract_docx(payload: dict) -> tuple[list[dict], dict]:
    blocks: list[dict] = []
    tables_parsed = 0
    paras = payload.get("paras", [])
    if not isinstance(paras, list):
        paras = []
    pending_items: list[str] = []
    pending_ordered = False
    pending_numid = None
    pending_toc: list[str] = []
    # images from list/TOC paragraphs wait for their block to flush so
    # they land AFTER it, like the Normal-paragraph path
    pending_imgs: list[dict] = []
    # per-(numId, ilvl) counters survive list interruptions (Word
    # continues numbering within a numId; reference cache :101)
    counters: dict[tuple, int] = {}
    # numIds used as section headings (detection pre-scan, reference
    # convert() :787)
    heading_numids = _detect_heading_numids(paras)
    # current page index: SECTION BREAKS paginate the document
    # (reference _start_new_page docx_converter.py:722-724; call sites
    # :1393-1398 break-before on an empty paragraph / :1419-1424 TOC
    # section-end / :1597-1598 break-after a text paragraph).  A
    # layout-only section break (empty para, no picture, type=continuous,
    # all-zero page margins — _is_layout_only_section_break :726-755)
    # does NOT paginate.  List/index blocks cannot span pages in the
    # block model, so the active group flushes at the boundary; a page
    # left empty produces no page_info entry (blocks keep true indices).
    pg = [0]

    def flush_list():
        nonlocal pending_items, pending_numid, pending_imgs
        if pending_items:
            blocks.append({"type": "list", "text": "\n".join(pending_items),
                           "page_idx": pg[0], "bbox": [0, 0, 0, 0],
                           "level": 1,
                           "pre_rendered": True, "items_marked": True,
                           "attribute": "ordered" if pending_ordered
                           else "unordered"})
            pending_items = []
            pending_numid = None
        for b in pending_imgs:
            b["page_idx"] = pg[0]
        blocks.extend(pending_imgs)
        pending_imgs = []

    def flush_toc():
        """Consecutive TOC paragraphs → ONE hierarchical index block
        (reference _add_index_item nesting, docx_converter.py:2892-3015 +
        the plain-TOC path :3063-3097).  Levels normalize against the
        FIRST item's ilvl (plain_toc_base_level :3086-3088), then the
        text-number correction applies; each item renders as
        '    '*ilevel + '- ' + text with the anchor mounted as an
        internal [text](#anchor) link (_render_index_leaf_item
        output_builders.py:269-292, _flatten_index_items :295-307).
        toc_items carries the structured per-item form for
        content_list_v2 (ilevel/prefix/anchor, _flatten_list_items_v2
        :104-136) and middle."""
        nonlocal pending_toc, pending_imgs
        if pending_toc:
            base = pending_toc[0]["ilvl"]
            lines: list[str] = []
            items: list[dict] = []
            for it in pending_toc:
                lvl = _correct_toc_level_by_text(
                    max(0, it["ilvl"] - base), it["plain"])
                indent = "    " * lvl
                # link mounting deferred: _mount_toc_anchor_links
                # validates anchors against the parsed body blocks at
                # document end, then mounts [text](#anchor)
                lines.append(f"{indent}- {it['md']}")
                rec = {"text": it["md"], "ilevel": lvl,
                       "prefix": f"{indent}-", "recs": it["recs"]}
                if it["anchor"]:
                    rec["anchor"] = it["anchor"]
                items.append(rec)
            blocks.append({"type": "index", "text": "\n".join(lines),
                           "page_idx": pg[0], "bbox": [0, 0, 0, 0],
                           "level": 1,
                           "pre_rendered": True, "toc_items": items})
            pending_toc = []
            for b in pending_imgs:
                b["page_idx"] = pg[0]
            blocks.extend(pending_imgs)
            pending_imgs = []

    def image_blocks(runs: list) -> list[dict]:
        """Image runs of one paragraph → image blocks appended after the
        paragraph's (possibly pending) block (reference collects the
        paragraph's picture refs and appends one IMAGE block per unique
        rel id, docx_converter.py:1605-1663 seen_rel_ids +
        BlockType.IMAGE).  Construction is the shared
        emit.office_image_block (sha256-of-bytes path, strict-base64
        degrade) used by the pptx route too."""
        out: list[dict] = []
        seen: set = set()
        for r in runs:
            if not isinstance(r, dict) or "image" not in r:
                continue
            img = r["image"]
            if not isinstance(img, dict):
                continue
            rel = img.get("rel_id")
            if rel is not None and rel in seen:
                continue  # one block per relationship id
            if rel is not None:
                seen.add(rel)
            blk = emit.office_image_block(img.get("data_b64"))
            if blk is not None:
                out.append(blk)
        return out

    def emit_blocks(lst: list[dict]) -> None:
        for b in lst:
            b["page_idx"] = pg[0]
        blocks.extend(lst)

    def end_section() -> None:
        flush_list()
        flush_toc()
        pg[0] += 1

    for p in paras:
        if not isinstance(p, dict):
            continue
        style = str(p.get("style", "Normal"))
        if style == "Chart":
            # DrawingML chart at paragraph position (reference
            # _handle_drawingml, docx_converter.py:3345-3411): the chart
            # block is appended BEFORE extraction is attempted, so a
            # chart whose series/workbook cannot be parsed still yields
            # a typed block with empty content — only a para with no
            # chart element at all (non-dict payload) appends nothing
            # (:3365-3369 `if chart is None: continue`).
            spec = p.get("chart")
            if isinstance(spec, dict):
                flush_list()
                flush_toc()
                from . import charts
                blocks.append({"type": "chart",
                               "text": charts.chart_to_html(spec),
                               "page_idx": pg[0], "bbox": [0, 0, 0, 0],
                               "level": 1})
            continue
        if style == "Textbox":
            # textbox paragraph group anchored at this position
            # (reference textbox walk, docx_converter.py:839-889 +
            # _handle_textbox_content :3413-3462): paragraphs collect per
            # CONTAINER, sort by vertical position within the container
            # (None positions last), dedupe on (text, position) across
            # containers — the modern/legacy XPath double-match guard — then
            # render INLINE as regular text paragraphs with the full run
            # machinery (styles/links/math)
            flush_list()
            flush_toc()
            containers = p.get("containers")
            if not isinstance(containers, list):
                containers = []
            seen_tb: set = set()
            for cont in containers:
                tb_paras = cont.get("paras") if isinstance(cont, dict) \
                    else None
                if not isinstance(tb_paras, list):
                    continue
                entries = []
                for tp in tb_paras:
                    if not isinstance(tp, dict):
                        continue
                    pos = tp.get("pos")
                    if not isinstance(pos, (int, float)) \
                            or isinstance(pos, bool):
                        pos = None
                    entries.append((pos, tp))
                entries.sort(key=lambda e: (e[0] is None,
                                            e[0] if e[0] is not None
                                            else 0.0))
                for pos, tp in entries:
                    from . import inline
                    traw, trecs = _render_runs(tp.get("runs") or [])
                    ttext = inline.finalize_text_block(traw)
                    if not ttext:
                        continue
                    key = (ttext, pos)
                    if key in seen_tb:
                        continue  # duplicate content+position skipped
                    seen_tb.add(key)
                    blocks.append({"type": "text", "text": ttext,
                                   "page_idx": pg[0],
                                   "bbox": [0, 0, 0, 0],
                                   "level": 1, "pre_rendered": True,
                                   "_runs": trecs})
            continue
        if style == "Table":
            flush_list()
            flush_toc()
            grid = _table_grid(p.get("rows") or [])
            if grid is not None:
                from . import tables as tbl
                blocks.append({"type": "table",
                               "text": tbl.render_table_html(grid),
                               "page_idx": pg[0], "bbox": [0, 0, 0, 0],
                               "level": 1})
                tables_parsed += 1
            continue
        runs_payload = p.get("runs") or []
        # section-break pagination (reference _handle_text_elements
        # :1389-1398): a paragraph carrying a sectPr that is not
        # layout-only starts a new page — BEFORE the paragraph when its
        # raw text is empty, AFTER its block otherwise (is_section_end,
        # :1597-1598).  Layout-only (:726-755) = no text, no picture,
        # type=continuous AND all-zero page margins (payload carries the
        # post-XML decision inputs: {"type": str, "pg_mar_zero": bool}).
        sect = p.get("sect") if isinstance(p.get("sect"), dict) else None
        sect_end = False
        if sect is not None and isinstance(runs_payload, list):
            raw = "".join(str(r.get("text", "")) for r in runs_payload
                          if isinstance(r, dict))
            has_img = any(isinstance(r, dict) and "image" in r
                          for r in runs_payload)
            layout_only = (not raw.strip() and not has_img
                           and str(sect.get("type", "continuous"))
                           == "continuous"
                           and sect.get("pg_mar_zero") is True)
            if not layout_only:
                if raw.strip():
                    sect_end = True
                else:
                    end_section()
        if style == "TOC":
            anchor = _valid_anchor(p.get("anchor"))
            if anchor is not None or pending_toc:
                # the cover-text guard (reference :3085-3087): an
                # anchor-less TOC-styled paragraph BEFORE any index
                # entry is body text reusing the style, not a TOC item —
                # it falls through to the Normal path below; once the
                # sequence has started, anchor-less entries are allowed
                md_item, plain_item, recs_item = \
                    _render_toc_item(runs_payload)
                imgs = image_blocks(runs_payload)
                if md_item:
                    flush_list()
                    ilvl = p.get("ilvl")
                    if not isinstance(ilvl, int) or isinstance(ilvl, bool):
                        ilvl = 0
                    pending_toc.append({"md": md_item, "plain": plain_item,
                                        "recs": recs_item,
                                        "ilvl": max(0, min(8, ilvl)),
                                        "anchor": anchor})
                    pending_imgs.extend(imgs)
                elif imgs:
                    pending_imgs.extend(imgs)
                # empty item is consumed without breaking the sequence
                # (reference `if not text: return True`)
                if sect_end:
                    # TOC paragraphs keep end-of-paragraph section-break
                    # semantics (reference :1419-1424)
                    end_section()
                continue
            style = "Normal"
        # raw = the un-postprocessed paragraph render; finalization is
        # per block kind (reference merge_para_with_text :954-959 applies
        # strip + standalone-marker + prefix escape to TEXT blocks only;
        # list items skip the prefix escape, output_builders.py:93;
        # titles/captions/code take the stripped render)
        from . import inline
        raw, recs = _render_runs(runs_payload)
        text = raw.strip()
        imgs = image_blocks(runs_payload)
        if not text:
            if imgs:
                flush_list()
                flush_toc()
                emit_blocks(imgs)
            if sect_end:
                end_section()
            continue
        flush_toc()
        if style == "ListParagraph":
            num = p.get("num") if isinstance(p.get("num"), dict) else {}
            numid = num.get("id")
            ilvl = int(num.get("ilvl", 0) or 0)
            ordered = bool(num.get("ordered"))
            if numid is not None and numid in heading_numids:
                # heading-list chain: items of a numId whose occurrences
                # interleave with body content AND span >1 indent level
                # convert to TITLE blocks at level ilvl+1 instead of
                # list items, closing any active list first (reference
                # heading_list_numids consumption,
                # docx_converter.py:1447-1464; detection :2688-2765);
                # they do NOT advance the chain's list counters
                flush_list()
                blk = {"type": "title", "text": text, "page_idx": pg[0],
                       "bbox": [0, 0, 0, 0],
                       "level": max(1, ilvl + 1),
                       "is_numbered_style": ordered,
                       "pre_rendered": True, "_runs": recs}
                hanchor = _valid_anchor(p.get("anchor"))
                if hanchor:
                    blk["anchor"] = hanchor
                blocks.append(blk)
                emit_blocks(imgs)
                if sect_end:
                    end_section()
                continue
            if pending_items and numid != pending_numid:
                flush_list()
            pending_numid = numid
            pending_ordered = ordered
            # four spaces per level like the reference's shared
            # list builder (output_builders.py:86)
            indent = "    " * ilvl
            if ordered and numid is not None:
                # first appearance starts at the level definition's start
                # value (payload `num.start` = the resolved lvlOverride/
                # startOverride → abstractNum w:start chain,
                # _get_numbering_level_start docx_converter.py:2388-2421);
                # later appearances continue (+1), and every advance
                # resets DEEPER counters of the same chain so sub-items
                # restart under the next parent (_advance_list_counter
                # :2423-2438)
                key = (numid, ilvl)
                if key not in counters:
                    start = num.get("start")
                    counters[key] = start \
                        if isinstance(start, int) \
                        and not isinstance(start, bool) else 1
                else:
                    counters[key] += 1
                for k in [k for k in counters
                          if k[0] == numid and k[1] > ilvl]:
                    del counters[k]
                item_text = inline.finalize_text_block(
                    raw, escape_prefix=False)
                pending_items.append(f"{indent}{counters[key]}. {item_text}")
            else:
                item_text = inline.finalize_text_block(
                    raw, escape_prefix=False)
                pending_items.append(f"{indent}- {item_text}")
            pending_imgs.extend(imgs)
            if sect_end:
                end_section()
            continue
        flush_list()
        # bookmark anchors ride title/text blocks (reference
        # _extract_paragraph_bookmark, docx_converter.py:3017-3042: TOC
        # link targets land on the heading/paragraph they mark; md/
        # content_list/middle all carry them — output_builders.py:
        # 360-366/:374-377/:546-549)
        anchor = _valid_anchor(p.get("anchor"))
        if style in _STYLE_HEADING:
            # heading-style titles carry is_numbered_style=False like the
            # reference's Title/Heading blocks (docx_converter.py:
            # 1494-1500) — they feed the section-number SYNC branch of
            # the document pass when their text embeds a literal number
            blk = {"type": "title", "text": text, "page_idx": pg[0],
                   "bbox": [0, 0, 0, 0],
                   "level": _STYLE_HEADING[style],
                   "is_numbered_style": False,
                   "pre_rendered": True, "_runs": recs}
            if anchor:
                blk["anchor"] = anchor
            blocks.append(blk)
        elif style == "Code":
            blocks.append({"type": "code", "text": text,
                           "page_idx": pg[0],
                           "bbox": [0, 0, 0, 0], "level": 1})
        elif style not in _TEXT_STYLES and p.get("seq") is True:
            # SEQ-field caption paragraph: a style OUTSIDE the known text
            # set whose runs carry a `SEQ` field instruction becomes a
            # CAPTION block (reference _is_caption,
            # docx_converter.py:3323-3341, branch order :1545-1579 — the
            # check runs only after the known text styles miss).  The
            # payload carries the post-XML decision as `seq: true`.
            # Captions take no anchor (reference caption_block :1575-1579)
            # and classify/attach to their visual parent downstream
            # (kernels/captions.py).
            blocks.append({"type": "caption", "text": text,
                           "page_idx": pg[0], "bbox": [0, 0, 0, 0],
                           "level": 1, "pre_rendered": True,
                           "_runs": recs})
        else:
            blk = {"type": "text",
                   "text": inline.finalize_text_block(raw),
                   "page_idx": pg[0],
                   "bbox": [0, 0, 0, 0], "level": 1,
                   "pre_rendered": True, "_runs": recs}
            if anchor:
                blk["anchor"] = anchor
            blocks.append(blk)
        emit_blocks(imgs)
        if sect_end:
            end_section()
    flush_list()
    flush_toc()
    _assign_section_numbers(blocks)
    _mount_toc_anchor_links(blocks)
    discarded = _header_footer_blocks(payload)
    blocks.extend(discarded)
    return blocks, {"blocks_classified": len(blocks) - len(discarded),
                    "blocks_discarded": len(discarded),
                    "tables_parsed": tables_parsed}


def _header_footer_blocks(payload: dict) -> list[dict]:
    """Section header/footer paragraphs → typed DISCARDED blocks
    (reference _add_header_footer, docx_converter.py:3260-3321 +
    _process_header_footer_paragraph :3230-3256): per section the
    variant list is [default] + [even if the DOC-level odd/even flag] +
    [first if the SECTION first-page flag]; each variant's paragraph
    texts (full run machinery — styles/links/math) join with ' '; empty
    and PURE-DIGIT texts are filtered (bare page numbers), and a
    per-section per-kind set dedupes repeated variant text.  The blocks
    ride the B9 discard contract: absent from md/md_nlp, typed in
    content_list, in middle's discarded_blocks (appended after content
    blocks, the charstream page order).

    Payload analog:
        {"hf_sections": [{"first_page": bool,
                          "headers": [{"variant": "default"|"even"|
                                       "first", "paras": [[run,...],...]}],
                          "footers": [...]}],
         "odd_even_pages": bool}
    """
    out: list[dict] = []
    sections = payload.get("hf_sections")
    if not isinstance(sections, list):
        return out
    odd_even = bool(payload.get("odd_even_pages"))
    for sec in sections[:8]:
        if not isinstance(sec, dict):
            continue
        first_page = bool(sec.get("first_page"))
        for kind, btype in (("headers", "header"), ("footers", "footer")):
            added: set[str] = set()
            entries = sec.get(kind)
            if not isinstance(entries, list):
                continue
            for ent in entries[:8]:
                if not isinstance(ent, dict):
                    continue
                variant = ent.get("variant", "default")
                if variant == "even" and not odd_even:
                    continue  # even variant gated on the doc-level flag
                if variant == "first" and not first_page:
                    continue  # first variant gated per section
                parts = []
                for runs in (ent.get("paras") or []):
                    if isinstance(runs, list):
                        t, _ = _render_runs(runs)
                        t = t.strip()
                        if t:
                            parts.append(t)
                text = " ".join(parts)
                if not text or text.isdigit() or text in added:
                    continue
                added.add(text)
                out.append({"type": btype, "text": text, "page_idx": 0,
                            "bbox": [0, 0, 0, 0], "level": 1,
                            "discarded": True, "pre_rendered": True})
    return out
