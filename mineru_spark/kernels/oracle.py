"""Single-process extraction oracle: one turn in, golden outputs out.

This module is THE contract: the Spark pipeline's pandas-UDF bodies call
``extract_turn`` per turn, and the pytest golden test calls the same
function single-process; per-turn text equality under stable
``(conv_id, turn_idx)`` ordering is then equality between the Spark job's
output and this oracle's (BASELINE.json north rule; reference anchors the
same way on end-to-end golden outputs, tests/unittest/test_e2e.py:23-71).

Output fields per turn (FIXTURES.md §3):
  route            parse route from the ingest classifier
  md / md_nlp      markdown (exact bytes; the equality target)
  content_list     JSON array of typed para dicts, discarded types included
  content_list_v2  per-page nested ContentTypeV2 encoding with typed runs
  middle           full IR: para_blocks + discarded_blocks per page
  spans            list of {page_idx,bbox,type,content}
  metrics          {blocks_classified, blocks_discarded,
                    boilerplate_dropped, tables_parsed, chars_deduped,
                    ocr_fallback, para_merged, tables_merged,
                    spans_need_ocr}
"""

from __future__ import annotations

import json

# Rust JSON parser when present (bundled transitively in this
# environment; NOT a hard dependency).  Parse side only: every json.dumps
# stays stdlib so output encodings are byte-stable regardless of which
# parser ran.  PARSER PARITY (r5 ADVICE fix): stdlib json.loads accepts
# input orjson treats differently — NaN/Infinity literals and
# overflow-to-inf float literals (orjson raises), lone-surrogate escapes
# (orjson raises), and arbitrary-precision integers (orjson keeps 64-bit
# ints exact and parses anything wider as a LOSSY double) — so the same
# payload would extract differently on a stdlib-only node, golden-hash
# drift the in-process parity gate cannot see.  The pinned behavior is
# orjson's (measured on the bundled 3.8.3); the stdlib fallback below
# reproduces it bit-for-bit, so both environments parse OR degrade
# identically (on the common RFC 8259 subset the decoders already
# agree).
_JSON_ERRORS = (ValueError, TypeError)

# orjson's exact-integer window: i64 min .. u64 max
_I64_MIN, _U64_MAX = -(1 << 63), (1 << 64) - 1


def _reject_constant(_name):  # NaN / Infinity / -Infinity literals
    raise ValueError("non-strict JSON constant")


def _finite_float(s: str) -> float:
    f = float(s)
    if f != f or f in (float("inf"), float("-inf")):
        # stdlib silently overflows '1e400' to inf; orjson raises
        raise ValueError("number is infinity when parsed as double")
    return f


def _orjsonify(o):
    """Post-transform to orjson semantics: ints outside the 64-bit
    window become doubles (orjson's lossy wide-int parse; reject if even
    the double overflows), strings with lone surrogates are rejected."""
    if isinstance(o, int) and not isinstance(o, bool):
        if _I64_MIN <= o <= _U64_MAX:
            return o
        f = float(o)  # OverflowError propagates = reject, like orjson
        if f in (float("inf"), float("-inf")):
            raise ValueError("integer overflows double")
        return f
    if isinstance(o, str):
        try:
            o.encode("utf-8")
        except UnicodeEncodeError:
            raise ValueError("lone surrogate in string") from None
        return o
    if isinstance(o, list):
        return [_orjsonify(v) for v in o]
    if isinstance(o, dict):
        return {_orjsonify(k): _orjsonify(v) for k, v in o.items()}
    return o


def _strict_loads_stdlib(s):
    return _orjsonify(json.loads(s, parse_constant=_reject_constant,
                                 parse_float=_finite_float))


try:
    from orjson import loads as _json_loads
except ImportError:  # pragma: no cover - depends on environment
    _json_loads = _strict_loads_stdlib

from . import charstream, emit, html_extract, pptx as pptx_kernel
from . import docx as docx_kernel
from . import tables as tbl
from .classify import classify_payload

OUTPUT_FIELDS = ["route", "md", "md_nlp", "content_list",
                 "content_list_v2", "middle", "spans", "metrics"]

_ZERO_METRICS = {
    "blocks_classified": 0, "blocks_discarded": 0, "boilerplate_dropped": 0,
    "tables_parsed": 0, "chars_deduped": 0, "ocr_fallback": 0,
    "para_merged": 0, "tables_merged": 0, "spans_need_ocr": 0,
}

_METRIC_KEYS = list(_ZERO_METRICS)


def _content_list_json(blocks: list[dict]) -> str:
    """Canonical content_list encoding: flat list of typed para dicts with
    page-relative bbox (reference make_blocks_to_content_list,
    mkcontent :609-742); key order fixed for byte equality."""
    items = []
    ref_group: list[dict] = []

    def flush_refs():
        # adjacent REF_TEXT blocks group into ONE reference list item
        # (reference merge_adjacent_ref_text_blocks_for_content,
        # pipeline_middle_json_mkcontent.py:448-475 + the content_list
        # REF_TEXT branch :633-641: type LIST, sub_type ref_text,
        # list_items = the per-block merged text)
        nonlocal ref_group
        if not ref_group:
            return
        first = ref_group[0]
        items.append({
            "type": "list",
            "page_idx": first["page_idx"],
            "bbox": [int(v) for v in first["bbox"]],
            "sub_type": "ref_text",
            "list_items": [t for t in
                           (emit.render_block(r) for r in ref_group) if t],
        })
        ref_group = []

    for b in blocks:
        if b["type"] == "ref_text":
            if ref_group and ref_group[-1]["page_idx"] != b["page_idx"]:
                flush_refs()
            ref_group.append(b)
            continue
        flush_refs()
        item = {
            "type": "text" if b["type"] == "abstract" else b["type"],
            "page_idx": b["page_idx"],
            "bbox": [int(v) for v in b["bbox"]],
        }
        if b["type"] == "table":
            # <eq> math bookends unescape at output (reference
            # _format_embedded_html at the content_list table branch,
            # output_builders.py:493; middle keeps the raw bookends)
            item["table_body"] = tbl.replace_eq_tags(b["text"])
            item["table_caption"] = [emit.normalize_text(c)
                                     for c in b.get("caption", [])]
            item["table_footnote"] = [emit.normalize_text(f)
                                      for f in b.get("footnote", [])]
        elif b["type"] == "image":
            # S8: sha2-named path string (reference content_list carries
            # img_path, mkcontent :656-665)
            item["img_path"] = b.get("img_path", "")
            item["image_caption"] = [emit.normalize_text(c)
                                     for c in b.get("caption", [])]
            item["image_footnote"] = [emit.normalize_text(f)
                                      for f in b.get("footnote", [])]
        elif b["type"] == "chart":
            # office chart item (reference make_blocks_to_content_list
            # chart branch, output_builders.py:500-524): html content +
            # empty img_path (no raster in scope) + caption list
            item["img_path"] = ""
            item["content"] = tbl.replace_eq_tags(b["text"])
            item["chart_caption"] = [emit.normalize_text(c)
                                     for c in b.get("caption", [])]
        elif b["type"] == "equation":
            item["text"] = b["text"]
            item["text_format"] = "latex"
        elif b["type"] == "code":
            # sub_type promotion (reference pipeline_magic_model.py:
            # 145-156/:216-218): a language guess makes it CODE; no
            # guess keeps the ALGORITHM sub_type.  Generic children
            # attach to code visuals too (reference content_list CODE
            # branch, pipeline_middle_json_mkcontent.py:718-733)
            item["text"] = b["text"]
            lang = b.get("lang", "")
            item["sub_type"] = "code" if lang else "algorithm"
            if lang:
                item["code_language"] = lang
            if b.get("caption") or b.get("footnote"):
                item["code_caption"] = [emit.normalize_text(c)
                                        for c in b.get("caption", [])]
                item["code_footnote"] = [emit.normalize_text(f)
                                         for f in b.get("footnote", [])]
        elif b["type"] == "index" and b.get("toc_items") is not None:
            # hierarchical TOC: rendered indented item strings (reference
            # make_blocks_to_content_list INDEX branch,
            # output_builders.py:454-458 `_flatten_index_items` — anchors
            # are already mounted as [text](#anchor) links)
            item["list_items"] = [ln for ln in b["text"].split("\n")
                                  if ln.strip()]
        elif (b["type"] in ("list", "index")
                and "_starts" in b and not b.get("pre_rendered")):
            # PIPELINE list/index: content_list carries the SAME
            # hard-break-joined text as md (reference
            # make_blocks_to_content_list routes LIST/INDEX through
            # merge_para_with_text, pipeline_middle_json_mkcontent.py:
            # 612-621)
            item["text"] = emit.render_block(b)
        else:
            text = b["text"]
            if b["type"] == "title":
                item["text_level"] = b.get("level", 1)
                # computed section number precedes the content
                # (reference get_title_data span prepend,
                # output_builders.py:739-744)
                sn = b.get("section_number", "")
                if sn and b.get("is_numbered_style"):
                    text = f"{sn} {text}"
            item["text"] = emit.normalize_text(text)
        anchor = b.get("anchor")
        if isinstance(anchor, str) and anchor.strip():
            # bookmark anchor rides every para_content shape (reference
            # output_builders.py:546-549)
            item["anchor"] = anchor.strip()
        items.append(item)
    flush_refs()
    return json.dumps(items, ensure_ascii=False, sort_keys=True,
                      separators=(",", ":"))


def _content_list_v2_json(blocks: list[dict]) -> str:
    """content_list_v2: the per-page nested, ContentTypeV2-typed encoding
    (reference make_blocks_to_content_list_v2, mkcontent :745-965, page
    nesting :993-1004).  Output is a JSON array of PAGES, each page an
    array of typed block dicts.  Paragraph/title blocks from the char
    kernels carry REAL typed span runs (text / sup / sub /
    equation_inline, merged like the reference's same-type run coalescing
    with hyphen/CJK-aware joins, mkcontent :550-607; sup/sub are our own
    run types — the reference embeds them as HTML); blocks from the
    office/html converters fall back to a single text run.  The v2 block
    taxonomy, list_items splitting, table simple/complex typing and nest
    level are faithful."""
    def runs(text: str) -> list[dict]:
        t = emit.normalize_text(text)
        return [{"content": t, "type": "text"}] if t else []

    _V2_RUN_TYPE = {"text": "text", "sup": "sup", "sub": "sub",
                    "inline_equation": "equation_inline",
                    "interline_equation": "equation_interline"}
    # office/html style-run records (docx._render_runs, html_extract) →
    # v2 text runs with a style list, the shape of the reference office
    # spans (inline_renderer.py `span.get('style', [])`)
    _V2_RUN_STYLE = {"bold": ["bold"], "italic": ["italic"],
                     "bold_italic": ["bold", "italic"]}

    def runs_from_records(recs: list) -> list[dict]:
        out: list[dict] = []
        for rec in recs:
            if rec[0] == "hyperlink":
                # ("hyperlink", label, url): typed link run (reference
                # ContentType.HYPERLINK span with a url field)
                _, label, url = rec
                label = emit.normalize_text(label)
                if label:
                    out.append({"content": label, "type": "hyperlink",
                                "url": url})
                continue
            if rec[0] == "styled":
                # ("styled", content, [styles...]): full style chain
                # (underline/emphasis/strikethrough/super/subscript).
                # A whitespace-only span with a VISIBLE style keeps its
                # raw content — reference _span_has_content_for_v2
                # (output_builders.py:716-731)
                _, content, styles = rec
                norm = emit.normalize_text(content)
                if norm:
                    out.append({"content": norm, "type": "text",
                                "style": list(styles)})
                elif content and any(s in ("underline", "strikethrough")
                                     for s in styles):
                    out.append({"content": content, "type": "text",
                                "style": list(styles)})
                continue
            typ, content = rec
            style = _V2_RUN_STYLE.get(typ)
            vt = "text" if style else _V2_RUN_TYPE.get(typ, "text")
            content = emit.normalize_text(content)
            if not content:
                continue
            if style:
                out.append({"content": content, "type": "text",
                            "style": style})
            elif out and out[-1]["type"] == vt == "text" \
                    and "style" not in out[-1]:
                # same-type coalescing with the shared hyphen/CJK join rule
                out[-1]["content"] = emit.merge_lines(
                    [out[-1]["content"], content])
            else:
                out.append({"content": content, "type": vt})
        return out

    def caption_runs(b: dict) -> list[dict]:
        # office captions keep their styled run records (reference
        # _collect_caption_v2 builds v2 caption spans with
        # merge_para_with_text_v2 over the caption block,
        # output_builders.py:344-349); charstream captions stay plain
        caps = b.get("caption", [])
        recs = b.get("caption_recs") or [None] * len(caps)
        out: list[dict] = []
        for c, rec in zip(caps, recs):
            out.extend(runs_from_records(rec) if rec else runs(c))
        return out

    pages: dict[int, list[dict]] = {}
    ref_group: list[dict] = []

    def flush_refs():
        # adjacent REF_TEXT blocks → ONE reference_list item (reference
        # merge_adjacent_ref_text_blocks_for_content + the v2 REF_TEXT
        # branch, pipeline_middle_json_mkcontent.py:909-923)
        nonlocal ref_group
        if not ref_group:
            return
        first = ref_group[0]
        li = [{"item_type": "text", "item_content": runs(r["text"])}
              for r in ref_group if emit.normalize_text(r["text"])]
        pages.setdefault(first["page_idx"], []).append(
            {"type": "list",
             "content": {"list_type": "reference_list",
                         "list_items": li},
             "bbox": [int(v) for v in first["bbox"]]})
        ref_group = []

    for b in blocks:
        t = b["type"]
        if t == "ref_text":
            if ref_group and ref_group[-1]["page_idx"] != b["page_idx"]:
                flush_refs()
            ref_group.append(b)
            continue
        flush_refs()
        text = b.get("text", "")
        blk_runs = (runs_from_records(b["_runs"]) if b.get("_runs")
                    else None) or None
        if t == "title":
            tc = blk_runs or runs(text)
            sn = b.get("section_number", "")
            if sn and b.get("is_numbered_style"):
                # section-number text span first (reference
                # inline_renderer.py:904-909)
                tc = [{"type": "text", "content": f"{sn} "}] + tc
            item = {"type": "title",
                    "content": {"title_content": tc,
                                "level": b.get("level", 1)}}
        elif t == "equation":
            item = {"type": "equation_interline",
                    "content": {"math_content": text,
                                "math_type": "latex"}}
        elif t == "image":
            item = {"type": "image",
                    "content": {
                        "image_source": {"path": b.get("img_path", "")},
                        "image_caption": caption_runs(b),
                        "image_footnote": [r for f in b.get("footnote", [])
                                           for r in runs(f)]}}
        elif t == "chart":
            # ContentTypeV2.CHART shape (reference
            # make_blocks_to_content_list_v2 chart branch,
            # output_builders.py:632-647)
            item = {"type": "chart",
                    "content": {
                        "image_source": {"path": ""},
                        "content": tbl.replace_eq_tags(text),
                        "chart_caption": caption_runs(b)}}
        elif t == "table":
            nest = 2 if text.count("<table") > 1 else 1
            complex_ = ("colspan" in text or "rowspan" in text or nest > 1)
            item = {"type": "table",
                    "content": {
                        "table_caption": caption_runs(b),
                        "table_footnote": [r for f in b.get("footnote", [])
                                           for r in runs(f)],
                        # v2 html is output-formatted (reference
                        # output_builders.py:627); middle keeps raw <eq>
                        "html": tbl.replace_eq_tags(text),
                        "table_type": "complex_table" if complex_
                        else "simple_table",
                        "table_nest_level": nest}}
        elif t == "code":
            caps = [r for c in b.get("caption", []) for r in runs(c)]
            fns = [r for f in b.get("footnote", []) for r in runs(f)]
            if b.get("lang", ""):
                item = {"type": "code",
                        "content": {"code_caption": caps,
                                    "code_content": runs(text),
                                    "code_footnote": fns,
                                    "code_language": b.get("lang", "")}}
            else:
                # ALGORITHM sub_type (reference v2 encoding,
                # pipeline_middle_json_mkcontent.py:898-905)
                item = {"type": "algorithm",
                        "content": {"algorithm_caption": caps,
                                    "algorithm_content": runs(text),
                                    "algorithm_footnote": fns}}
        elif t in ("list", "index"):
            if t == "index" and b.get("toc_items") is not None:
                # hierarchical TOC items (reference v2 INDEX branch,
                # output_builders.py:658-665 via _flatten_list_items_v2
                # :104-136): ilevel + '    '*ilevel prefix + typed run
                # content + optional anchor per item
                items = []
                for ti in b["toc_items"]:
                    rec = {"item_type": "text",
                           "ilevel": ti["ilevel"],
                           "prefix": ti["prefix"],
                           "item_content":
                               runs_from_records(ti.get("recs") or [])
                               or runs(ti["text"])}
                    if ti.get("anchor"):
                        rec["anchor"] = ti["anchor"]
                    items.append(rec)
            elif "_starts" in b and not b.get("pre_rendered"):
                # PIPELINE list/index: v2 items are the START-LINE
                # groups (reference _split_list_item_blocks groups
                # lines between IS_LIST_START_LINE marks,
                # pipeline_middle_json_mkcontent.py:925-957), each
                # merged with the block-level language join
                lines = [ln for ln in text.split("\n")]
                starts = b.get("_starts")
                if not isinstance(starts, list) or len(starts) != len(lines):
                    starts = [True] * len(lines)
                groups: list[list[str]] = []
                for i, ln in enumerate(lines):
                    if not ln.strip():
                        continue
                    if groups and not (i > 0 and starts[i]):
                        groups[-1].append(ln)
                    else:
                        groups.append([ln])
                items = [{"item_type": "text",
                          "item_content": runs(emit.merge_lines(g))}
                         for g in groups
                         if emit.normalize_text(emit.merge_lines(g))]
            else:
                items = [{"item_type": "text", "item_content": runs(it)}
                         for it in text.split("\n") if it.strip()]
            if t == "list":
                item = {"type": "list",
                        "content": {"list_type": "text_list",
                                    "attribute": b.get("attribute",
                                                       "unordered"),
                                    "list_items": items}}
            else:
                item = {"type": "index",
                        "content": {"list_type": "text_list",
                                    "list_items": items}}
        elif t == "quote":
            item = {"type": "quote",
                    "content": {"quote_content": runs(text)}}
        elif t in ("page_footnote", "header", "footer", "page_number",
                   "aside_text"):
            # v2 discarded-type encoding (mkcontent :749-773)
            v2t = {"header": "page_header", "footer": "page_footer",
                   "page_number": "page_number",
                   "aside_text": "page_aside_text",
                   "page_footnote": "page_footnote"}[t]
            item = {"type": v2t,
                    "content": {f"{v2t}_content": runs(text)}}
        else:
            item = {"type": "paragraph",
                    "content": {"paragraph_content": blk_runs or runs(text)}}
        anchor = b.get("anchor")
        if isinstance(anchor, str) and anchor.strip():
            # v2 anchor rides the top-level block dict (reference
            # output_builders.py:667-669)
            item["anchor"] = anchor.strip()
        item["bbox"] = [int(v) for v in b["bbox"]]
        pages.setdefault(b["page_idx"], []).append(item)
    flush_refs()
    out = [pages[p] for p in sorted(pages)]
    return json.dumps(out, ensure_ascii=False, sort_keys=True,
                      separators=(",", ":"))


def _middle_json(blocks: list[dict], route: str) -> str:
    """Full-IR encoding (reference middle_json: {"pdf_info": [page_info...],
    "_backend"}, model_json_to_middle_json.py:234-235): blocks grouped per
    page with their type/text/bbox/level/caption structure."""
    pages: dict[int, list[dict]] = {}
    dpages: dict[int, list[dict]] = {}
    for b in blocks:
        item = {"type": b["type"], "bbox": [int(v) for v in b["bbox"]],
                "level": b.get("level", 1)}
        if b.get("discarded"):
            item["text"] = b["text"]
            dpages.setdefault(b["page_idx"], []).append(item)
            continue
        if b["type"] in ("table", "image", "chart"):
            if b["type"] == "table":
                item["html"] = b["text"]
            if b["type"] == "chart":
                # chart body span carries its html as 'content'
                # (reference CHART_BODY span, get_body_data
                # output_builders.py:690-691)
                item["content"] = b["text"]
            if b["type"] == "image" and b.get("img_path"):
                item["img_path"] = b["img_path"]
            item["caption"] = [emit.normalize_text(c)
                               for c in b.get("caption", [])]
            item["footnote"] = [emit.normalize_text(f)
                                for f in b.get("footnote", [])]
        else:
            item["text"] = b["text"]
            if b.get("toc_items") is not None:
                # middle keeps the STRUCTURED index form — per-item
                # ilevel/anchor with the item text unlinked (the
                # reference middle holds the nested index block tree,
                # _add_index_item docx_converter.py:2892-3015; links are
                # mounted at output time only)
                item["items"] = [
                    {"text": ti["text"], "ilevel": ti["ilevel"],
                     **({"anchor": ti["anchor"]} if ti.get("anchor")
                        else {})}
                    for ti in b["toc_items"]]
            if b.get("anchor"):
                item["anchor"] = b["anchor"]
            if b["type"] == "title" and "is_numbered_style" in b:
                # docx-route titles keep the numbered-heading flag and
                # the computed section number in middle (reference
                # result_to_middle_json, model_output_to_middle_json.py:
                # 136-152); renderers prepend at output time only
                item["is_numbered_style"] = bool(b["is_numbered_style"])
                if b.get("section_number"):
                    item["section_number"] = b["section_number"]
            if b.get("lang"):
                item["lang"] = b["lang"]
            if b.get("cross_page"):
                # SplitFlag.CROSS_PAGE analog (para_split.py:301-304)
                item["cross_page"] = True
            if b.get("_lines"):
                # full block→line→span hierarchy with bboxes (the
                # reference middle's page→block→line→span geometry;
                # model_json_to_middle_json line/span records)
                item["lines"] = b["_lines"]
            elif b.get("_runs"):
                # geometry-free converters (office/html) keep typed runs;
                # 3-field records carry their url (hyperlink) or style
                # list (styled)
                item["spans"] = [
                    {"type": r[0], "content": r[1],
                     **({} if len(r) < 3 else
                        {"url": r[2]} if r[0] == "hyperlink" else
                        {"style": list(r[2])})}
                    for r in b["_runs"]]
        pages.setdefault(b["page_idx"], []).append(item)
    info = [{"page_idx": p, "para_blocks": pages.get(p, []),
             **({"discarded_blocks": dpages[p]} if p in dpages else {})}
            for p in sorted(set(pages) | set(dpages))]
    return json.dumps({"pdf_info": info, "_backend": route},
                      ensure_ascii=False, sort_keys=True,
                      separators=(",", ":"))


def _md_nlp(blocks: list[dict]) -> str:
    """NLP_MD MakeMode (reference MakeMode enum_class.py:89-93; union_make
    :968-1011): image blocks are dropped from the text-only rendering."""
    pages: dict[int, list[str]] = {}
    for b in blocks:
        if b["type"] in ("image", "chart"):
            # NLP_MD drops visual bodies; charts skip like images
            # (reference office builder NLP_MD branch,
            # output_builders.py:411-412 `continue`)
            continue
        seg = emit.render_block(b)
        if seg:
            pages.setdefault(b["page_idx"], []).append(seg)
    return emit.join_pages(["\n\n".join(pages[p]) for p in sorted(pages)])


def _extract_office(payload: str) -> tuple[list[dict], dict]:
    grids = tbl.parse_tables(payload)
    blocks = [{"type": "table", "text": tbl.render_table_html(g),
               "page_idx": 0, "bbox": [0, 0, 0, 0], "level": 1}
              for g in grids]
    metrics = dict(_ZERO_METRICS)
    metrics["blocks_classified"] = len(blocks)
    metrics["tables_parsed"] = len(grids)
    return blocks, metrics


def extract_turn(text: str | None, tool: str | None = None) -> dict:
    """Never raises: a malformed payload yields route='error' with empty
    outputs (the reference's per-doc try/except — a broken document must
    not fail the batch, cli/common.py:194-247 skip-broken-pages)."""
    try:
        return _extract_turn_inner(text, tool)
    except Exception:
        m = dict(_ZERO_METRICS)
        return {"route": "error", "md": "", "md_nlp": "",
                "content_list": "[]", "content_list_v2": "[]",
                "middle": "{}", "spans": [], "metrics": m}


def _extract_turn_inner(text: str | None, tool: str | None = None) -> dict:
    route = classify_payload(text, tool)
    spans: list[dict] = []
    if route == "empty":
        blocks, metrics = [], dict(_ZERO_METRICS)
    elif route == "pdf":
        try:
            payload = _json_loads(text)
        except _JSON_ERRORS:
            payload = {"pages": []}
        blocks, spans, metrics = charstream.extract_pdf(payload)
        route = "pdf_ocr" if metrics["ocr_fallback"] else "pdf_txt"
        return {"route": route,
                "md": charstream.blocks_to_md(blocks),
                "md_nlp": _md_nlp(blocks),
                "content_list": _content_list_json(blocks),
                "content_list_v2": _content_list_v2_json(blocks),
                "middle": _middle_json(blocks, route),
                "spans": spans, "metrics": metrics}
    elif route == "pptx":
        try:
            payload = _json_loads(text)
        except _JSON_ERRORS:
            payload = {}
        blocks, extra = pptx_kernel.extract_pptx(payload)
        metrics = dict(_ZERO_METRICS)
        metrics.update(extra)
    elif route == "docx":
        try:
            payload = _json_loads(text)
        except _JSON_ERRORS:
            payload = {}
        blocks, extra = docx_kernel.extract_docx(payload)
        metrics = dict(_ZERO_METRICS)
        metrics.update(extra)
    elif route == "xlsx":
        from . import xlsx as xlsx_kernel
        try:
            payload = _json_loads(text)
        except _JSON_ERRORS:
            payload = {}
        blocks, extra = xlsx_kernel.extract_xlsx(payload)
        metrics = dict(_ZERO_METRICS)
        metrics.update(extra)
    elif route == "office":
        blocks, metrics = _extract_office(text)
    elif route == "html":
        blocks, metrics = html_extract.extract_html(text)
    else:  # plain text: single text block
        blocks = [{"type": "text", "text": " ".join(text.split()),
                   "page_idx": 0, "bbox": [0, 0, 0, 0], "level": 1}]
        metrics = dict(_ZERO_METRICS)
        metrics["blocks_classified"] = 1

    if route in ("pptx", "docx", "xlsx"):
        # office caption machinery (office_magic_model.py: classify →
        # tie-up-by-index → two-layer attach; see kernels/captions.py):
        # caption blocks and prefix-promoted texts ride their visual
        # parent's `caption` list, orphans demote to text
        from . import captions as captions_kernel
        blocks = captions_kernel.attach_office_captions(blocks)
    if route in ("html", "pptx", "docx", "xlsx", "office", "plain",
                 "empty"):
        segs = [emit.render_block(b) for b in blocks]
        md = "\n\n".join(s for s in segs if s)
        for b in blocks:
            if b["type"] not in ("table", "chart"):
                spans.append({"page_idx": b["page_idx"],
                              "bbox": [float(v) for v in b["bbox"]],
                              "type": b["type"],
                              "content": emit.normalize_text(b["text"])})
    return {"route": route, "md": md, "md_nlp": _md_nlp(blocks),
            "content_list": _content_list_json(blocks),
            "content_list_v2": _content_list_v2_json(blocks),
            "middle": _middle_json(blocks, route),
            "spans": spans, "metrics": metrics}


def metrics_tuple(metrics: dict) -> tuple:
    return tuple(int(metrics[k]) for k in _METRIC_KEYS)


# ---------------------------------------------------------------------------
# Conversation-level finalize (D2: cross-turn table merge)
# ---------------------------------------------------------------------------

def finalize_conv(turn_outs: list[dict]) -> list[dict]:
    """Cross-turn continuation-table merge (reference cross-page table
    merge, table_merge.py:661-733 / :1123): an office turn immediately
    following another office turn, whose table is headerless with the same
    column count, is folded into the anchor turn's table.  The continuation
    turn's outputs are emptied; the anchor's ``tables_merged`` counts the
    folds.  Chains (A←B←C) anchor at A.

    Mutates and returns ``turn_outs`` (each: {turn_idx, route, md,
    content_list, metrics}); input must be the complete turn set of ONE
    conversation sorted by turn_idx.
    """
    anchor: dict | None = None
    anchor_grid = None
    for t in turn_outs:
        if t["route"] != "office":
            anchor, anchor_grid = None, None
            continue
        grids = tbl.parse_tables(t["md"]) if t["md"] else []
        if anchor is not None and t["turn_idx"] == anchor["_last_idx"] + 1 \
                and len(grids) == 1 and anchor_grid is not None:
            merged = tbl.merge_continuation(anchor_grid, grids[0])
            if merged is not None:
                anchor_grid = merged
                html = tbl.render_table_html(merged)
                mb = [{"type": "table", "text": html, "page_idx": 0,
                       "bbox": [0, 0, 0, 0], "level": 1}]
                anchor["md"] = html
                anchor["md_nlp"] = html
                anchor["content_list"] = _content_list_json(mb)
                anchor["content_list_v2"] = _content_list_v2_json(mb)
                anchor["middle"] = _middle_json(mb, "office")
                anchor["metrics"]["tables_merged"] += 1
                anchor["_last_idx"] = t["turn_idx"]
                t["md"] = ""
                t["md_nlp"] = ""
                t["content_list"] = "[]"
                t["content_list_v2"] = "[]"
                t["middle"] = "{}"
                t["metrics"]["blocks_classified"] = 0
                continue
        # this turn becomes the new anchor (if it holds exactly one table)
        if len(grids) == 1:
            anchor, anchor_grid = t, grids[0]
            anchor["_last_idx"] = t["turn_idx"]
        else:
            anchor, anchor_grid = None, None
    for t in turn_outs:
        t.pop("_last_idx", None)
    return turn_outs
