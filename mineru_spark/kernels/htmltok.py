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
    while pos < n:
        m = _TOKEN.match(html, pos)
        if m is None:  # defensive; _TOKEN matches any position
            yield ("data", html[pos:])
            return
        pos = m.end()
        end_tag, start_tag, attr_blob, selfclose = \
            m.group(1), m.group(2), m.group(3), m.group(4)
        if start_tag is not None:
            tag = start_tag.lower()
            attrs = _parse_attrs(attr_blob) if attr_blob.strip() else {}
            yield ("start", tag, attrs)
            if selfclose:
                if tag not in VOID:
                    yield ("end", tag)
            elif tag in _RAWTEXT:
                # raw-text content: scan to the matching close tag
                close = re.compile(rf"</\s*{tag}\s*>", re.IGNORECASE)
                cm = close.search(html, pos)
                if cm is None:
                    yield ("data", html[pos:])
                    yield ("end", tag)
                    return
                if cm.start() > pos:
                    yield ("data", html[pos:cm.start()])
                yield ("end", tag)
                pos = cm.end()
        elif end_tag is not None:
            yield ("end", end_tag.lower())
        else:
            tok = m.group(0)
            c = tok[0]
            if c != "<" or tok == "<":
                if tok == "<":
                    yield ("data", "<")
                else:
                    yield ("data", unescape(tok) if "&" in tok else tok)
            # else: comment / cdata / doctype — skipped
