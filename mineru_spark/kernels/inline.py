"""Office inline span rendering — the mkcontent inline renderer.

Re-expresses the reference's paragraph-level inline machinery
(``mineru/backend/office/mkcontent/inline_renderer.py``) over the
payload run/span model:

- block-level inline SYNTAX selection (:559-582): a block whose styled
  units all share at most ONE enumerable markdown style key renders
  with markdown wrappers; any complex style (underline / emphasis /
  super / subscript), any second distinct style key, or any hyperlink
  with mixed/complex children switches the WHOLE block to HTML inline
  tags;
- adjacent same-style-key text spans group into one wrapper
  (:745-790), with leading/trailing whitespace kept OUTSIDE the
  wrapper (:377-420);
- visible-space markers (:257-355): whitespace inside underlined runs
  renders as ``_`` and inside struckthrough runs as ``-`` so the
  styling of spaces survives markdown (underline wins when both);
- HTML blocks merge consecutive tokens through a wrapper STACK DIFF
  (:688-745) with the fixed nesting order emphasis > s > em > strong >
  u > sup/sub, so shared styles open once instead of per fragment;
- paragraph join (:224-248) concatenates parts directly (runs carry
  their own whitespace, like Word's), padding inline equations with
  spaces and inserting ONE space after a markdown-wrapped part that
  ends in punctuation when the next part starts with a plain text
  character (:194-222 — CommonMark cannot close ``**foo.**bar``);
- text-block finalization (:945-950): strip edges, escape a line that
  is ALL ``_``/``-`` (would parse as a thematic break, :368-375), and
  escape a leading block marker (markdown_utils.py:38-48) — prefix
  escaping is skipped for list items (output_builders.py:93).

Span model (built by docx._render_runs from payload runs):
  {"type": "text", "content": str, "style": [names...]}
  {"type": "inline_equation", "content": latex}
  {"type": "interline_equation", "content": latex}   # display $$ block
  {"type": "hyperlink", "url": str, "children": [{"content", "style"}]}
Style names follow the reference's formatting_to_style_str order
(office_rich_text.py:44-62): bold, italic, underline, emphasis,
strikethrough, superscript|subscript.
"""

from html import escape as _html_escape
import unicodedata

from . import emit

SYNTAX_MD = "markdown"
SYNTAX_HTML = "html"

# reference OFFICE_MARKDOWN_STYLE_WRAPPERS (inline_renderer.py:29-34)
MD_WRAPPERS = {
    frozenset({"bold"}): "**",
    frozenset({"italic"}): "*",
    frozenset({"strikethrough"}): "~~",
    frozenset({"bold", "italic"}): "***",
}
# reference OFFICE_COMPLEX_HTML_STYLES (:35-40)
COMPLEX_STYLES = {"underline", "emphasis", "superscript", "subscript"}
EMPHASIS_STYLE = "text-emphasis: dot; text-emphasis-position: under;"
# reference STYLE_WRAPPER_OPEN/CLOSE (:42-59)
_WRAP_OPEN = {
    "emphasis": f'<span style="{EMPHASIS_STYLE}">',
    "strikethrough": "<s>",
    "italic": "<em>",
    "bold": "<strong>",
    "underline": "<u>",
    "superscript": "<sup>",
    "subscript": "<sub>",
}
_WRAP_CLOSE = {
    "emphasis": "</span>",
    "strikethrough": "</s>",
    "italic": "</em>",
    "bold": "</strong>",
    "underline": "</u>",
    "superscript": "</sup>",
    "subscript": "</sub>",
}


def style_key(style):
    """Markdown-safe style key (:456-470): None = unstyled, '' = needs
    HTML, frozenset = one of the four enumerable wrapper sets."""
    s = {n for n in (style or ()) if n}
    if not s:
        return None
    if s & COMPLEX_STYLES:
        return ""
    k = frozenset(s)
    return k if k in MD_WRAPPERS else ""


def _esc(content: str, syntax: str) -> str:
    """_escape_office_inline_text (:135-141): conservative markdown
    escape; HTML blocks additionally entity-escape first."""
    if not content:
        return content
    if syntax == SYNTAX_MD:
        return emit.escape_inline(content)
    return emit.escape_inline(_html_escape(content, quote=False))


def _apply_md_style(content: str, style) -> str:
    if not style or not content:
        return content
    wrapper = MD_WRAPPERS.get(style_key(style))
    if wrapper:
        return f"{wrapper}{content}{wrapper}"
    return content


def _apply_html_style(content: str, style) -> str:
    """:93-118 — tag order sup/sub (elif), u, strong, em, s, emphasis."""
    if not style or not content:
        return content
    if "superscript" in style:
        content = f"<sup>{content}</sup>"
    elif "subscript" in style:
        content = f"<sub>{content}</sub>"
    if "underline" in style:
        content = f"<u>{content}</u>"
    if "bold" in style:
        content = f"<strong>{content}</strong>"
    if "italic" in style:
        content = f"<em>{content}</em>"
    if "strikethrough" in style:
        content = f"<s>{content}</s>"
    if "emphasis" in style:
        content = f'<span style="{EMPHASIS_STYLE}">{content}</span>'
    return content


def _apply_style(content: str, style, syntax: str) -> str:
    if syntax == SYNTAX_MD:
        return _apply_md_style(content, style)
    return _apply_html_style(content, style)


def _marker_of(style):
    """Visible-space marker (:257-264): underline → '_' wins over
    strikethrough → '-'; anything else (incl. emphasis) has none."""
    if not style:
        return None
    if "underline" in style:
        return "_"
    if "strikethrough" in style:
        return "-"
    return None


def _ascii_space_only(content: str) -> bool:
    return bool(content) and all(ch == " " for ch in content)


def _replace_spaces_with_marker(content, marker, syntax):
    """:273-297 — every ASCII space → marker; other text escaped."""
    out = []
    buf = []
    for ch in content:
        if ch == " ":
            if buf:
                out.append(_esc("".join(buf), syntax))
                buf.clear()
            out.append(marker)
        else:
            buf.append(ch)
    if buf:
        out.append(_esc("".join(buf), syntax))
    return "".join(out)


def _render_edge_space_markers(content, marker, syntax):
    """:300-315 — only EDGE spaces become markers; interior spaces
    stay plain."""
    lead = len(content) - len(content.lstrip(" "))
    trail = len(content) - len(content.rstrip(" "))
    end = len(content) - trail if trail else len(content)
    core = content[lead:end]
    return marker * lead + _esc(core, syntax) + marker * trail


def _render_marker_text(content, style, syntax, render_style=None):
    """_render_visible_space_marker_text (:317-356)."""
    marker = _marker_of(style)
    render_style = list(style or []) if render_style is None \
        else render_style
    if marker is None:
        return _apply_style(_esc(content, syntax), render_style or [],
                            syntax)
    style = style or []
    if marker == "-" and not _ascii_space_only(content):
        return _apply_style(
            _render_edge_space_markers(content, marker, syntax),
            render_style, syntax)
    if _ascii_space_only(content):
        rendered = _replace_spaces_with_marker(content, marker, syntax)
        ignored = "underline" if marker == "_" else "strikethrough"
        render_style = [n for n in (render_style or []) if n != ignored]
        return _apply_style(rendered, render_style, syntax)
    rendered = _render_edge_space_markers(content, marker, syntax)
    return _apply_style(rendered, render_style, syntax)


def _render_styled_inline(content, style, syntax):
    """_render_styled_inline_text (:359-366)."""
    if content and _marker_of(style):
        return _render_marker_text(content, style, syntax)
    return _apply_style(_esc(content, syntax), style, syntax)


def _has_md_wrapper(style, syntax) -> bool:
    if syntax != SYNTAX_MD:
        return False
    return style_key(style) in MD_WRAPPERS


def _part(span_type, rendered, raw="", mdw=False):
    return {"t": span_type, "r": rendered, "raw": raw, "mdw": mdw}


def _append_text_part(parts, content, span_style, syntax,
                      render_style=None):
    """_append_text_part (:377-441): marker styles render whole; plain
    content keeps edge whitespace OUTSIDE the wrapper; whitespace-only
    content without a visible style passes through raw."""
    render_style = list(span_style or []) if render_style is None \
        else render_style
    if content and _marker_of(span_style):
        parts.append(_part(
            "text",
            _render_marker_text(content, span_style, syntax, render_style),
            raw=content, mdw=_has_md_wrapper(render_style, syntax)))
        return
    escaped = _esc(content, syntax)
    stripped = escaped.strip()
    if stripped:
        styled = _apply_style(stripped, render_style, syntax)
        lead = escaped[:len(escaped) - len(escaped.lstrip())]
        trail = escaped[len(escaped.rstrip()):]
        parts.append(_part("text", lead + styled + trail, raw=content,
                           mdw=_has_md_wrapper(render_style, syntax)))
    elif content:
        rendered = content
        if span_style and any(s in ("underline", "strikethrough")
                              for s in span_style):
            rendered = _apply_style(_esc(rendered, syntax), render_style,
                                    syntax)
        parts.append(_part("text", rendered, raw=content,
                           mdw=_has_md_wrapper(render_style, syntax)))


def _append_md_grouped(parts, text_spans):
    """_append_markdown_grouped_text_parts (:753-790): adjacent spans
    sharing one style KEY concatenate into one wrapped part."""
    pending: list = []
    pending_style = None
    pending_key = None
    has_pending = False

    def flush():
        nonlocal pending, pending_style, pending_key, has_pending
        if pending:
            _append_text_part(parts, "".join(pending),
                              list(pending_style or []), SYNTAX_MD)
            pending = []
            pending_style = None
            pending_key = None
            has_pending = False

    for span in text_spans:
        s_style = tuple(span.get("style") or ())
        s_key = style_key(s_style)
        if not has_pending:
            pending_style = s_style
            pending_key = s_key
            has_pending = True
        if s_key != pending_key:
            flush()
            pending_style = s_style
            pending_key = s_key
            has_pending = True
        pending.append(str(span.get("content", "")))
    flush()


def _stack_of(style):
    """_style_range_stack (:688-705): outermost-first wrapper stack."""
    style = style or set()
    stack = []
    if "emphasis" in style:
        stack.append("emphasis")
    if "strikethrough" in style:
        stack.append("strikethrough")
    if "italic" in style:
        stack.append("italic")
    if "bold" in style:
        stack.append("bold")
    if "underline" in style:
        stack.append("underline")
    if "superscript" in style:
        stack.append("superscript")
    elif "subscript" in style:
        stack.append("subscript")
    return stack


def _tokens_from_spans(text_spans, syntax):
    """_build_style_range_tokens (:585-682): split each span into
    (content, style-set) tokens with unstyled edge whitespace."""
    tokens: list = []

    def add(content, style):
        if content:
            tokens.append((content, set(style or [])))

    for span in text_spans:
        content = str(span.get("content", ""))
        if not content:
            continue
        span_style = span.get("style") or []
        marker = _marker_of(span_style)
        if marker:
            render_style = list(span_style)
            if marker == "-" and not _ascii_space_only(content):
                rendered = _render_edge_space_markers(content, marker,
                                                      syntax)
            elif _ascii_space_only(content):
                rendered = _replace_spaces_with_marker(content, marker,
                                                       syntax)
                ignored = "underline" if marker == "_" \
                    else "strikethrough"
                render_style = [n for n in render_style if n != ignored]
            else:
                rendered = _render_edge_space_markers(content, marker,
                                                      syntax)
            add(rendered, render_style)
            continue
        escaped = _esc(content, syntax)
        stripped = escaped.strip()
        if stripped:
            lead = escaped[:len(escaped) - len(escaped.lstrip())]
            trail = escaped[len(escaped.rstrip()):]
            add(lead, [])
            add(stripped, span_style)
            add(trail, [])
        else:
            add(content, [])
    return tokens


def _render_tokens(tokens) -> str:
    """_render_style_range_tokens (:728-750): wrapper stack diff —
    shared outer styles stay open across adjacent tokens."""
    out = []
    cur: list = []
    for content, style in tokens:
        nxt = _stack_of(style)
        pre = 0
        for a, b in zip(cur, nxt):
            if a != b:
                break
            pre += 1
        for w in reversed(cur[pre:]):
            out.append(_WRAP_CLOSE[w])
        for w in nxt[pre:]:
            out.append(_WRAP_OPEN[w])
        out.append(content)
        cur = nxt
    for w in reversed(cur):
        out.append(_WRAP_CLOSE[w])
    return "".join(out)


def _split_blank_edges(text_spans):
    """_split_plain_blank_edges (:443-453)."""
    start, end = 0, len(text_spans)
    while start < end and \
            not str(text_spans[start].get("content", "")).strip():
        start += 1
    while end > start and \
            not str(text_spans[end - 1].get("content", "")).strip():
        end -= 1
    return text_spans[:start], text_spans[start:end], text_spans[end:]


def _append_grouped(parts, text_spans, syntax):
    """_append_style_grouped_text_parts (:793-828)."""
    if syntax == SYNTAX_MD:
        _append_md_grouped(parts, text_spans)
        return
    leading, core, trailing = _split_blank_edges(text_spans)
    for span in leading:
        _append_text_part(parts, str(span.get("content", "")),
                          span.get("style") or [], syntax)
    tokens = _tokens_from_spans(core, syntax)
    if tokens:
        parts.append(_part("text", _render_tokens(tokens)))
    for span in trailing:
        _append_text_part(parts, str(span.get("content", "")),
                          span.get("style") or [], syntax)


def _hyperlink_requires_html(span) -> bool:
    """:494-516 — non-text child, complex child style, or >1 distinct
    child style key (None counts here, unlike block selection)."""
    children = span.get("children") or []
    if not children:
        return style_key(span.get("style") or []) == ""
    keys = set()
    for child in children:
        if child.get("type", "text") != "text":
            return True
        content = str(child.get("content", ""))
        if not content.strip():
            continue
        k = style_key(child.get("style") or [])
        if k == "":
            return True
        keys.add(k)
    return len(keys) > 1


def _render_link(text, url, syntax):
    """:128-132 — markdown []( ) or entity-escaped <a>.  Markdown labels
    escape the []()-breaking brackets (reference _escape_hyperlink_text,
    docx_converter.py:209-224 — latent in the current snapshot; kept for
    markdown validity)."""
    if syntax == SYNTAX_MD:
        text = text.replace("[", "\\[").replace("]", "\\]")
        return f"[{text}]({url})"
    return f'<a href="{_html_escape(str(url), quote=True)}">{text}</a>'


def _hyperlink_label(children, syntax) -> str:
    """_render_hyperlink_children_label (:830-843)."""
    child_parts: list = []
    spans = [{"content": c.get("content", ""),
              "style": c.get("style") or []}
             for c in (children or [])
             if c.get("type", "text") == "text"]
    _append_grouped(child_parts, spans, syntax)
    return join_parts(child_parts).strip()


def _append_hyperlink_part(parts, content, span_style, syntax, url="",
                           plain_text_only=False, children=None):
    """_append_hyperlink_part (:846-887)."""
    if children:
        label = _hyperlink_label(children, syntax)
        if not label:
            return
        rendered = label if plain_text_only \
            else _render_link(label, url, syntax)
    else:
        stripped = str(content).strip()
        if not stripped:
            return
        styled = _render_styled_inline(stripped, span_style, syntax)
        if plain_text_only:
            lead = content[:len(content) - len(content.lstrip())]
            trail = content[len(content.rstrip()):]
            rendered = lead + styled + trail
        else:
            rendered = _render_link(styled, url, syntax)
    parts.append(_part("hyperlink", rendered))


def _is_punct_or_symbol(ch: str) -> bool:
    return unicodedata.category(ch).startswith(("P", "S"))


def _needs_boundary_space(prev, nxt) -> bool:
    """_needs_markdown_boundary_space (:194-222)."""
    if not prev["mdw"]:
        return False
    if nxt["t"] in ("hyperlink", "inline_equation",
                    "interline_equation"):
        return False
    prev_raw = prev["raw"]
    next_raw = nxt["raw"]
    if not prev_raw.strip() or not next_raw.strip():
        return False
    if prev_raw[-1].isspace() or next_raw[0].isspace():
        return False
    pc = next(
        (c for c in reversed(prev_raw) if not c.isspace()), None)
    nc = next((c for c in next_raw if not c.isspace()), None)
    if pc is None or nc is None:
        return False
    if not _is_punct_or_symbol(pc):
        return False
    return not nc.isspace() and not _is_punct_or_symbol(nc)


def join_parts(parts) -> str:
    """_join_rendered_parts (:224-248): direct concatenation; inline
    equations padded with spaces; boundary space after wrapped
    punctuation."""
    out: list = []
    prev = None
    n = len(parts)
    for i, part in enumerate(parts):
        if part["t"] == "inline_equation":
            if out and not out[-1].endswith(" "):
                out.append(" ")
            out.append(part["r"])
            if i != n - 1:
                out.append(" ")
        else:
            if prev is not None and _needs_boundary_space(prev, part):
                out.append(" ")
            out.append(part["r"])
        prev = part
    return "".join(out)


def select_syntax(spans) -> str:
    """_select_block_inline_syntax (:559-582): one enumerable markdown
    style key allowed; a complex key, a second distinct key, or an
    HTML-requiring hyperlink switches the block to HTML."""
    units = []
    for span in spans:
        t = span.get("type", "text")
        if t == "hyperlink":
            if _hyperlink_requires_html(span):
                return SYNTAX_HTML
            children = span.get("children") or []
            if children:
                for c in children:
                    if c.get("type", "text") == "text":
                        units.append((str(c.get("content", "")),
                                      c.get("style") or []))
            else:
                units.append((str(span.get("content", "")),
                              span.get("style") or []))
        elif t == "text":
            units.append((str(span.get("content", "")),
                          span.get("style") or []))
        else:
            units.append((str(span.get("content", "")), []))
    keys = set()
    for content, style in units:
        if not content:
            continue
        k = style_key(style)
        if k == "":
            return SYNTAX_HTML
        if k is not None:
            keys.add(k)
            if len(keys) > 1:
                return SYNTAX_HTML
    return SYNTAX_MD


def render_spans(spans, syntax=None) -> str:
    """merge_para_with_text's render core (:889-959): walk spans in
    order, buffering consecutive text spans so style grouping never
    crosses an equation/hyperlink boundary; join.  NO block-level
    post-processing — callers apply finalize_text_block per block kind."""
    if syntax is None:
        syntax = select_syntax(spans)
    parts: list = []
    buf: list = []

    def flush():
        if buf:
            _append_grouped(parts, buf, syntax)
            buf.clear()

    for span in spans:
        t = span.get("type", "text")
        if t == "text":
            buf.append(span)
        elif t == "inline_equation":
            flush()
            content = f"${span.get('content', '')}$".strip()
            if content:
                parts.append(_part("inline_equation", content))
        elif t == "interline_equation":
            # display math inside an office paragraph renders as a $$
            # block (:919-929: "\n$$\n{content}\n$$\n".strip()); no
            # space padding and never a boundary-space target
            flush()
            content = f"\n$$\n{span.get('content', '')}\n$$\n".strip()
            if content != "$$\n\n$$":
                parts.append(_part("interline_equation", content))
        elif t == "hyperlink":
            flush()
            _append_hyperlink_part(
                parts, str(span.get("content", "")),
                span.get("style") or [], syntax,
                url=span.get("url", ""),
                children=span.get("children"))
        else:
            flush()
    flush()
    return join_parts(parts)


def _escape_standalone_marker(content: str) -> str:
    """:368-375 — a line that is ALL '_' or ALL '-' would parse as a
    thematic break; escape its first character."""
    if content and all(ch == "_" for ch in content):
        return f"\\{content}"
    if content and all(ch == "-" for ch in content):
        return f"\\{content}"
    return content


def finalize_text_block(text: str, escape_prefix: bool = True) -> str:
    """TEXT-block post-processing (merge_para_with_text :954-959):
    strip edges, standalone-marker escape, then (unless a list item —
    output_builders.py:93 passes escape_text_block_prefix=False) the
    leading block-marker escape."""
    if not text:
        return text
    text = text.strip()
    text = _escape_standalone_marker(text)
    if escape_prefix:
        text = emit._escape_block_prefix(text)
    return text
