"""Minimal tolerant HTML tokenizer (shared by the DOM and table parsers).

A from-scratch regex scanner replacing stdlib ``html.parser`` in the hot
path (the stdlib parser is a per-char pure-Python state machine and was
the HTML route's floor: ~2× the tokenizer's cost at 10-100 KB payloads).
Event stream mirrors the subset of SAX we rely on:

    ("start", tag, attrs)   — attrs dict only when the tag carries any
    ("end", tag)
    ("data", text)          — entity-unescaped

Semantics matched to our previous HTMLParser usage:
- convert_charrefs: data and attribute values are html.unescape()d;
- <script>/<style> content is raw text up to the matching close tag;
- comments / doctypes / CDATA are skipped;
- self-closing ``<tag/>`` emits start only for void elements, start+end
  otherwise (that matches how our DOM builder treated them);
- malformed trailing ``<`` is emitted as data.
"""

from __future__ import annotations

import re
from html import unescape

_TOKEN = re.compile(
    r"<!--.*?(?:-->|$)"          # comment
    r"|<!\[CDATA\[.*?(?:\]\]>|$)"  # cdata
    r"|<[!?][^>]*>?"             # doctype / processing instruction
    r"|</\s*([a-zA-Z][-\w:.]*)[^>]*>"          # end tag     (group 1)
    r"|<([a-zA-Z][-\w:.]*)((?:[^>\"']|\"[^\"]*\"|'[^']*')*)(/?)>"
    # start tag: name (2), attr blob (3), self-close (4)
    r"|[^<]+"                    # text
    r"|<",                       # stray '<'
    re.DOTALL)

_ATTR = re.compile(
    r"([a-zA-Z_:][-\w:.]*)\s*(?:=\s*(\"[^\"]*\"|'[^']*'|[^\s>]*))?")

_RAWTEXT = {"script", "style"}
_RAWTEXT_CLOSE = {t: re.compile(rf"</\s*{t}\s*>", re.IGNORECASE)
                  for t in _RAWTEXT}

VOID = {"br", "hr", "img", "meta", "link", "input", "area", "base",
        "col", "embed", "source", "track", "wbr"}

def _parse_attrs(blob: str) -> dict:
    out: dict = {}
    for m in _ATTR.finditer(blob):
        name = m.group(1).lower()
        v = m.group(2)
        if v is None:
            out[name] = None
            continue
        if v[:1] in "\"'":
            v = v[1:-1]
        out[name] = unescape(v) if "&" in v else v
    return out


def tokenize(html: str):
    """Yield ("start", tag, attrs) / ("end", tag) / ("data", text)."""
    pos = 0
    n = len(html)
    match = _TOKEN.match
    while pos < n:
        m = match(html, pos)
        if m is None:  # defensive; _TOKEN matches any position
            yield ("data", html[pos:])
            return
        pos = m.end()
        # dispatch on lastindex (the highest group that matched): start
        # tags always bind group 4 (the self-close group, possibly
        # empty), end tags bind only group 1, and group-free branches
        # (text / comment / doctype / stray '<') give None — saves the
        # three dead group() calls per token on the common branches
        li = m.lastindex
        if li is None:
            tok = m.group(0)
            if tok[0] != "<":
                yield ("data", unescape(tok) if "&" in tok else tok)
            elif tok == "<":
                yield ("data", "<")
            # else: comment / cdata / doctype — skipped
        elif li == 1:
            yield ("end", m.group(1).lower())
        else:
            tag = m.group(2).lower()
            attr_blob = m.group(3)
            attrs = _parse_attrs(attr_blob) if attr_blob.strip() else {}
            yield ("start", tag, attrs)
            if m.group(4):
                if tag not in VOID:
                    yield ("end", tag)
            elif tag in _RAWTEXT:
                # raw-text content: scan to the matching close tag
                cm = _RAWTEXT_CLOSE[tag].search(html, pos)
                if cm is None:
                    yield ("data", html[pos:])
                    yield ("end", tag)
                    return
                if cm.start() > pos:
                    yield ("data", html[pos:cm.start()])
                yield ("end", tag)
                pos = cm.end()
