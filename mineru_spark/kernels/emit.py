"""Markdown / text emission utilities (SURVEY.md §2.6, M1-M8).

From-scratch re-expressions of the reference's emission semantics:

- ligature / unicode replacement    — reference span_pre_proc.py:29-39
- full-width → half-width           — reference char_utils.py:21-38
- hyphen line-end merge             — reference char_utils.py:7-18,
                                      pipeline_middle_json_mkcontent.py:411-418
- CJK no-space span join            — pipeline_middle_json_mkcontent.py:402-405
  (the reference uses fast-langdetect; we substitute a deterministic
  CJK-codepoint-ratio rule — documented divergence, fixed identically in
  oracle and engine)
- conservative markdown escaping    — markdown_utils.py:12-48
- md pages joined by blank line     — pipeline_middle_json_mkcontent.py:1005
"""

from __future__ import annotations

import re

from .tables import replace_eq_tags

LIGATURE_MAP = {
    "ﬁ": "fi", "ﬂ": "fl", "ﬀ": "ff", "ﬃ": "ffi", "ﬄ": "ffl",
    "ﬅ": "ft", "ﬆ": "st",  # full reference set (span_pre_proc.py:29-33)
    "−": "-",       # unicode minus → hyphen
    "": "-",  # STX used as a soft break by some producers
                    # (reference __replace_unicode, span_pre_proc.py:35-39)
}

_LIG_RE = re.compile("|".join(LIGATURE_MAP))

_MD_SPECIALS = set("*_~$`")

_CJK_RANGES = (
    (0x4E00, 0x9FFF),   # CJK Unified Ideographs
    (0x3400, 0x4DBF),   # Extension A
    (0x3040, 0x30FF),   # Hiragana + Katakana
    (0xAC00, 0xD7AF),   # Hangul syllables
    (0xF900, 0xFAFF),   # CJK Compatibility Ideographs
)


def expand_ligatures(text: str) -> str:
    if not text:
        return text
    return _LIG_RE.sub(lambda m: LIGATURE_MAP[m.group(0)], text)


_FW_TABLE = {o: o - 0xFEE0
             for rng in ((0xFF21, 0xFF3A), (0xFF41, 0xFF5A), (0xFF10, 0xFF19))
             for o in range(rng[0], rng[1] + 1)}


def fullwidth_to_halfwidth(text: str) -> str:
    """Normalize full-width letters/digits (U+FF01-FF5E letters/digits only,
    mirroring the reference's letter/digit-scoped conversion).  The table
    maps only non-ASCII codepoints, so ASCII text (the hot path) returns
    unchanged via the C-speed isascii check instead of a per-char
    translate scan."""
    if text.isascii():
        return text
    return text.translate(_FW_TABLE)


_CJK_RE = re.compile("[" + "".join(f"{chr(lo)}-{chr(hi)}"
                                   for lo, hi in _CJK_RANGES) + "]")


def is_cjk_char(ch: str) -> bool:
    return _CJK_RE.match(ch) is not None


def cjk_ratio(text: str) -> float:
    if not text:
        return 0.0
    return len(_CJK_RE.findall(text)) / len(text)


def is_cjk_text(text: str) -> bool:
    """Deterministic substitute for the reference's langdetect call."""
    return cjk_ratio(text) > 0.4


# reference LINE_END_HYPHEN_RE (char_utils.py:7-10): a LETTER followed by
# a line-break hyphen variant — "3-" or an em dash never splice
_LINE_END_HYPHEN_RE = re.compile(r"[A-Za-z]+[-­‐‑⁃]$")


def merge_lines(lines: list[str]) -> str:
    """Join the text lines of one paragraph block.

    The language gate is BLOCK-level, like the reference's
    ``_merge_para_text`` (detect_lang over the collected block text,
    pipeline_middle_json_mkcontent.py:305-311; CJK_LANGS membership
    :402-405 decides the join): the shared deterministic cascade
    (kernels/langid.lang_of — the same oracle-checked decision
    q_doc_langid runs in SQL) classifies the whole paragraph once.

    CJK blocks (zh/ja/ko): lines join with no separator.
    Western/und blocks: space-joined, except a word-break hyphen (a
    letter followed by a hyphen variant at line end, char_utils.py:7-18)
    merges iff the next line starts lowercase (mkcontent :415-417,
    :430-445).
    """
    from .langid import CJK_LANGS, lang_of

    lines = [ln for ln in (s.strip() for s in lines) if ln]
    if not lines:
        return ""
    cjk_block = lang_of(" ".join(lines)) in CJK_LANGS
    out = lines[0]
    for nxt in lines[1:]:
        if cjk_block:
            out = out + nxt
        elif _LINE_END_HYPHEN_RE.search(out) and nxt[:1].islower():
            out = out[:-1] + nxt
        else:
            out = out + " " + nxt
    return out


def join_list_lines(lines: list[str], starts: list[bool]) -> str:
    """Pipeline LIST/INDEX markdown join (reference _merge_para_text +
    _line_prefix, pipeline_middle_json_mkcontent.py:305-338/:422-427):
    a '  \\n' HARD BREAK precedes every item-start line after the first;
    continuation lines join with the block-level M2 language rule
    (CJK no-space / hyphen splice / space).  No list markers are added —
    the reference renders the line text verbatim (markers, if any, are
    part of the span content) — and no block-prefix escape applies
    (merge_para_with_text escapes the prefix for TEXT blocks only).

    The block language is detected ONCE over the whole block like the
    reference (detect_lang over the collected text), then each item
    group merges under that flag."""
    from .langid import CJK_LANGS, lang_of

    pairs = [(ln, st) for ln, st in
             zip(lines, list(starts) + [True] * len(lines))
             if ln.strip()]
    if not pairs:
        return ""
    cjk_block = lang_of(" ".join(p[0].strip() for p in pairs)) in CJK_LANGS
    items: list[str] = []
    cur = ""
    for i, (ln, st) in enumerate(pairs):
        ln = ln.strip()
        if i > 0 and st:
            items.append(cur)
            cur = ln
        elif not cur:
            cur = ln
        elif cjk_block:
            cur = cur + ln
        elif _LINE_END_HYPHEN_RE.search(cur) and ln[:1].islower():
            cur = cur[:-1] + ln
        else:
            cur = cur + " " + ln
    items.append(cur)
    return "  \n".join(
        s for s in (escape_inline(normalize_text(it)) for it in items)
        if s)


_HAS_SPECIAL = re.compile(r"[*_~$`\\]")
_ESCAPE_ALL = {ord(c): "\\" + c for c in "*_~$`"}
# reference TEXT_BLOCK_MARKDOWN_PREFIX_RE (markdown_utils.py:7-9): up to 3
# leading spaces/tabs, then #{1,6} or +/-, followed by space/tab
_BLOCK_PREFIX = re.compile(r"^(?P<indent>[ \t]{0,3})(?P<marker>#{1,6}|[+-])"
                           r"(?=[ \t])")


def _escape_block_prefix(s: str) -> str:
    m = _BLOCK_PREFIX.match(s)
    if not m:
        return s
    i = m.start("marker")
    return f"{s[:i]}\\{s[i:]}"


def escape_inline(text: str) -> str:
    """Conservative INLINE markdown escape (reference
    escape_conservative_markdown_text, markdown_utils.py:12-35):
    backslash-escape ``* _ ~ $ ``` `` when not already escaped.  No
    block-prefix handling — that applies once per assembled text block
    (escape_text_block_markdown_prefix :38-48), not per span."""
    if not text:
        return text
    if _HAS_SPECIAL.search(text) is None:
        return text
    if "\\" not in text:
        # no backslashes → nothing is "already escaped": every special
        # gets escaped, which one C-level translate does
        return text.translate(_ESCAPE_ALL)
    out = []
    bs_run = 0
    for ch in text:
        if ch == "\\":
            bs_run += 1
            out.append(ch)
            continue
        if ch in _MD_SPECIALS and bs_run % 2 == 0:
            out.append("\\")
        out.append(ch)
        bs_run = 0
    return "".join(out)


def escape_markdown(text: str) -> str:
    """Conservative markdown escape (reference markdown_utils.py:6-48):
    backslash-escape ``* _ ~ $ ``` `` when not already escaped, and escape a
    leading block marker (#{1,6} or +/-, ≤3 indent, space/tab after)."""
    if not text:
        return text
    return _escape_block_prefix(escape_inline(text))


def normalize_text(text: str) -> str:
    """Fixed normalization order: full→half width, strip (reference
    mkcontent :359-388; escaping is applied at md render, not here)."""
    return fullwidth_to_halfwidth(text).strip()


def render_md_block(btype: str, text: str, level: int = 1) -> str:
    """One block → one markdown segment (reference mkcontent :34-36 titles,
    :70-204 visual segments)."""
    if btype == "title":
        return "#" * max(1, level) + " " + normalize_text(text)
    if btype == "list":
        items = [it for it in text.split("\n") if it.strip()]
        return "\n".join("- " + escape_markdown(normalize_text(it)) for it in items)
    if btype == "index":
        # TOC/index block (D1, reference para_split.py:183-189): lines kept
        # verbatim, one per row (the reference's per-line hard breaks)
        items = [it for it in text.split("\n") if it.strip()]
        return "\n".join(escape_markdown(normalize_text(it)) for it in items)
    if btype == "quote":
        return "> " + escape_markdown(normalize_text(text))
    if btype == "table":
        return text  # already canonical HTML block
    if btype == "code":
        return "```\n" + text + "\n```"
    return escape_markdown(normalize_text(text))


def _join_visual_segments(segs: list) -> str:
    """Segment join for two-layer visual blocks (reference
    get_visual_block_separator, pipeline_middle_json_mkcontent.py:
    191-204): '  \\n' hard break between markdown lines, '\\n' before an
    html block, '\\n\\n' after one; the assembled text strips edges
    (mk_blocks :65)."""
    para = ""
    prev_kind = None
    for seg, kind in segs:
        if para:
            if prev_kind == "html_block":
                para += "\n\n"
            elif kind == "html_block":
                para += "\n"
            else:
                para += "  \n"
        para += seg
        prev_kind = kind
    return para.strip()


def render_block(b: dict) -> str:
    """Rich block dict → markdown segment (M5 visual segments; M2 display
    math `$$...$$`, reference mkcontent :207-219; code fences with the B12
    language guess)."""
    t = b["type"]
    text = b.get("text", "")
    if t in ("page_footnote", "header", "footer", "page_number",
             "aside_text"):
        # discarded-type blocks (headers/footers/page numbers/speaker
        # notes): kept typed in content_list and in middle's
        # discarded_blocks, dropped from markdown (reference contract)
        return ""
    if t == "equation":
        return f"$$\n{text}\n$$" if text else ""
    if t == "code":
        lang = b.get("lang", "")
        body = None
        body_kind = "markdown_line"
        if text and not lang:
            # ALGORITHM sub_type: a code block whose text guesses no
            # language renders as the pre-wrap HTML div preserving
            # indentation (reference render_algorithm_html_from_lines,
            # markdown_utils.py:51-96 — the family's algorithm render —
            # + the sub_type promotion, pipeline_magic_model.py:
            # 145-156/:216-218)
            from html import escape as _hesc
            body = ('<div class="mineru-algorithm" style="white-space: '
                    'pre-wrap; font-family:monospace;">\n'
                    f"{_hesc(text, quote=False)}\n</div>")
            body_kind = "html_block"
        elif text:
            body = f"```{lang}\n{text}\n```"
        # CODE is a visual main type: generically-labeled captions /
        # footnotes attach and render in reading order with the same
        # separator rules as the other visuals
        # (merge_visual_blocks_to_markdown)
        if b.get("caption") or b.get("footnote"):
            order = b.get("_vorder")
            if not isinstance(order, list) or not order:
                order = ([("caption", c) for c in b.get("caption", [])]
                         + [("body", None)]
                         + [("footnote", f)
                            for f in b.get("footnote", [])])
            segs = []
            for field, content in order:
                if field == "body":
                    if body:
                        segs.append((body, body_kind))
                else:
                    s = escape_markdown(normalize_text(str(content or "")))
                    if s:
                        segs.append((s, "markdown_line"))
            return _join_visual_segments(segs)
        return body or ""
    if t == "abstract":
        # ABSTRACT blocks render as plain text (reference md TEXT-family
        # branch, pipeline_middle_json_mkcontent.py:27-33; the type also
        # BREAKS paragraph-merge groups like titles, para_split.py:43-48)
        return escape_markdown(normalize_text(text))
    if t == "ref_text":
        # bibliography reference entry: merged line text, conservative
        # escape only (REF_TEXT is not TEXT → no block-prefix escape)
        return escape_inline(normalize_text(text))
    if t in ("table", "image", "chart") and "caption_pre" in b:
        # OFFICE two-layer visual (marked by the caption pass,
        # kernels/captions.py): the office builder's MM_MD order
        # (output_builders.py:379-427) — body FIRST (image line /
        # newline-wrapped html), then each caption appended with a
        # '  \n' hard break; the block strips \r\n at the end (:431).
        # An empty chart body skips the whole block, captions included
        # (the reference `continue`s before its caption loop, :421).
        if t == "chart" and not text:
            return ""
        para = ""
        if t == "image":
            if b.get("img_path"):
                para += f"![]({b['img_path']})"
        elif text:
            para += f"\n{replace_eq_tags(text)}\n"
        for c, pre in zip(b.get("caption", []), b["caption_pre"]):
            # pre-rendered captions (docx run machinery) already carry
            # their md escapes; promoted plain texts escape here
            seg = c if pre else escape_markdown(normalize_text(c))
            if seg:
                para += "  \n" + seg
        return para.strip("\r\n")
    if t == "chart":
        # caption-less chart (docx/pptx/xlsx routes): HTML data table
        # inline; empty content (unparsable chart — the docx route keeps
        # the typed block) contributes nothing to md
        return replace_eq_tags(text) if text else ""
    if t in ("table", "image"):
        # PIPELINE visual rendering (charstream route; reference
        # merge_visual_blocks_to_markdown, pipeline_middle_json_
        # mkcontent.py:70-104): children and body render in READING
        # ORDER (get_blocks_in_index_order :91-101) as segments —
        # captions/footnotes are markdown lines, a table html body is an
        # html_block — with the separator rules of
        # get_visual_block_separator (:191-204): '  \n' hard break
        # between markdown lines, '\n' before an html block, '\n\n'
        # after one.
        order = b.get("_vorder")
        if not isinstance(order, list) or not order:
            order = ([("caption", c) for c in b.get("caption", [])]
                     + [("body", None)]
                     + [("footnote", f) for f in b.get("footnote", [])])
        segs: list[tuple[str, str]] = []
        for field, content in order:
            if field == "body":
                if t == "table" and text:
                    # canonical HTML body; <eq> bookends from
                    # cell-anchored math unescape to inline $..$ at
                    # output time only (middle keeps the raw bookends)
                    segs.append((replace_eq_tags(text), "html_block"))
                elif t == "image" and b.get("img_path"):
                    # S8: the reference's image body line (:152-155)
                    segs.append((f"![]({b['img_path']})",
                                 "markdown_line"))
            else:
                s = escape_markdown(normalize_text(str(content or "")))
                if s:
                    segs.append((s, "markdown_line"))
        return _join_visual_segments(segs)
    if b.get("pre_rendered"):
        # run-level renderers (docx styled runs) escape inline; don't
        # double-escape here
        anchor = b.get("anchor")
        anchor = anchor.strip() if isinstance(anchor, str) else ""
        if t == "title":
            # bookmark anchor target precedes the heading (reference
            # output_builders.py:374-377: any title anchor renders an
            # <a id> line; text blocks render one only for _Toc-prefixed
            # anchors, :360-366); a numbered-style section heading
            # renders its computed section number first
            # (inline_renderer.py:518-523)
            sn = b.get("section_number", "")
            if sn and b.get("is_numbered_style"):
                text = f"{sn} {text}"
            head = "#" * max(1, b.get("level", 1)) + " " + text
            return f'<a id="{anchor}"></a>\n{head}' if anchor else head
        if t == "text" and anchor.startswith("_Toc"):
            return f'<a id="{anchor}"></a>\n{text}'
        if t == "list":
            if b.get("items_marked"):
                # items already carry their markers (docx numbering chains:
                # "1. " continuation counters / "- " bullets / indents)
                return "\n".join(it for it in text.split("\n") if it.strip())
            return "\n".join("- " + it for it in text.split("\n") if it)
        return text
    if t in ("list", "index") and "_starts" in b:
        # PIPELINE list/index blocks (charstream route, D1): hard-break
        # join per item-start line, NO markers added (reference renders
        # the lines verbatim through merge_para_with_text — mk md list
        # branch, pipeline_middle_json_mkcontent.py:27-33).  Office/html
        # lists never carry _starts and keep their builder rendering.
        lines = text.split("\n")
        starts = b.get("_starts")
        if not isinstance(starts, list) or len(starts) != len(lines):
            starts = [True] * len(lines)
        return join_list_lines(lines, starts)
    return render_md_block(t, text, b.get("level", 1))


def join_pages(page_mds: list[str]) -> str:
    """Pages joined by blank line (reference mkcontent :1005-1006)."""
    return "\n\n".join(m for m in page_mds if m)


def office_image_path(data_b64) -> str | None:
    """Shared office picture naming: decode base64 strictly, sha256-of-
    bytes path (the content term of the crop-sink naming; no raster
    decode in scope); invalid/empty data degrades to None.  One
    definition so the docx/pptx/xlsx routes cannot drift."""
    import base64
    import hashlib

    try:
        data = base64.b64decode(str(data_b64 or ""), validate=True)
    except Exception:
        return None
    if not data:
        return None
    return f"images/{hashlib.sha256(data).hexdigest()}.jpg"


def office_image_block(data_b64, page_idx: int = 0,
                       bbox: list | None = None) -> dict | None:
    """Office picture → standalone image block over office_image_path."""
    path = office_image_path(data_b64)
    if path is None:
        return None
    return {"type": "image", "img_path": path,
            "text": "", "page_idx": page_idx,
            "bbox": bbox or [0, 0, 0, 0], "level": 1}
