"""HTML main-content extraction (SURVEY.md §2.8; north rule axis A).

The reference has no HTML main-content extractor; per the north rule this is
a readability/trafilatura-style text-density / link-density boilerplate
classifier composed with the reference's block model: DOM nodes become
blocks, and the discard rule plays the role of the reference's
header/footer/page_number discard (reference
mineru/backend/pipeline/pipeline_magic_model.py:199-220).

Rules (deterministic, fixed in both oracle and engine):

- structural boilerplate: <nav> <header> <footer> <aside> <script> <style>
  <noscript> <form> subtrees are dropped outright;
- link-density boilerplate: any remaining block whose
  link_chars / chars > 0.5 is dropped (trafilatura-style heuristic);
- surviving blocks are emitted in document order as title / text / list /
  table / code blocks and rendered with the shared emission kernel
  (kernels.emit), so HTML and PDF routes share one markdown contract.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from .htmltok import VOID, tokenize

from . import emit
from . import tables as tbl

_DROP_TAGS = {"nav", "header", "footer", "aside", "script", "style",
              "noscript", "form", "button", "iframe"}
_BLOCK_TAGS = {"p", "h1", "h2", "h3", "h4", "h5", "h6", "ul", "ol", "li",
               "table", "pre", "blockquote", "article", "div", "section",
               "main", "body", "html"}
_HEADING = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}

LINK_DENSITY_MAX = 0.5


@dataclass(slots=True)
class _Node:
    tag: str
    children: list = field(default_factory=list)  # _Node | str
    parent: "_Node | None" = None
    attrs: dict = field(default_factory=dict)     # td/th spans, a href, …


def _build_dom(payload: str) -> _Node:
    """Minimal tolerant DOM builder (void elements, implied closes) over
    the shared regex tokenizer (kernels/htmltok.py)."""
    root = _Node("#root")
    cur = root
    for ev in tokenize(payload):
        kind = ev[0]
        if kind == "data":
            cur.children.append(ev[1])
        elif kind == "start":
            node = _Node(ev[1])
            if ev[2]:
                node.attrs = ev[2]
            node.parent = cur
            cur.children.append(node)
            if ev[1] not in VOID:
                cur = node
        else:  # end: walk up to the nearest matching open tag
            tag = ev[1]
            n = cur
            while n is not root and n.tag != tag:
                n = n.parent
            if n is not root:
                cur = n.parent
    return root


def _text_stats(node: _Node, in_link: bool = False) -> tuple[int, int]:
    """(chars, link_chars) over a subtree — the text-density/link-density
    signal of the boilerplate classifier."""
    chars = link_chars = 0
    for ch in node.children:
        if isinstance(ch, str):
            n = len(ch.strip())
            chars += n
            if in_link:
                link_chars += n
        else:
            c, lc = _text_stats(ch, in_link or ch.tag == "a")
            chars += c
            link_chars += lc
    return chars, link_chars


def _inner_text(node: _Node) -> str:
    parts = []
    for ch in node.children:
        if isinstance(ch, str):
            parts.append(ch)
        else:
            parts.append(_inner_text(ch))
    return "".join(parts)


def _collapse(s: str) -> str:
    return " ".join(s.split())


_BOLD_TAGS = ("b", "strong")
_ITALIC_TAGS = ("i", "em")


def _inline_runs(node: _Node) -> list[tuple]:
    """Typed inline run records for content_list_v2 (r4 directive #4):
    walk a content block's subtree carrying (bold, italic) state and emit
    ("text"|"bold"|"italic"|"bold_italic", content) records, plus
    ("hyperlink", label, href) for <a href> and ("inline_equation", tex)
    for <eq>.  Markdown output stays flat text (the main-content axis
    strips link/style syntax like the boilerplate extractors it mirrors);
    the typed records preserve the structure v2 is for.  Adjacent
    same-style fragments coalesce here so the record list mirrors the
    reference office spans' run granularity, not tokenizer granularity."""
    records: list[tuple] = []

    def emit_rec(rec: tuple) -> None:
        if records and len(rec) == 2 and len(records[-1]) == 2 \
                and records[-1][0] == rec[0]:
            records[-1] = (rec[0], f"{records[-1][1]} {rec[1]}")
        else:
            records.append(rec)

    def walk(n: _Node, bold: bool, italic: bool) -> None:
        for ch in n.children:
            if isinstance(ch, str):
                t = _collapse(ch)
                if t:
                    kind = ("bold_italic" if bold and italic else
                            "bold" if bold else
                            "italic" if italic else "text")
                    emit_rec((kind, t))
                continue
            if ch.tag == "a":
                href = str(ch.attrs.get("href", "")).strip()
                label = _collapse(_inner_text(ch))
                if label:
                    if href and href != ".":
                        emit_rec(("hyperlink", label, href))
                    else:
                        emit_rec(("text", label))
                continue
            if ch.tag == "eq":
                tex = _inner_text(ch).strip()
                if tex:
                    emit_rec(("inline_equation", tex))
                continue
            walk(ch, bold or ch.tag in _BOLD_TAGS,
                 italic or ch.tag in _ITALIC_TAGS)

    walk(node, False, False)
    return records


def _attach_runs(rec_block: "Block", node: _Node) -> None:
    """Attach typed records to a Block only when the subtree has inline
    STRUCTURE (style/link/math); plain paragraphs keep the single-text
    fallback so their v2 encoding is unchanged."""
    recs = _inline_runs(node)
    if any(r[0] != "text" for r in recs):
        rec_block.runs = recs


@dataclass
class Block:
    btype: str          # title | text | list | quote | table | code
    text: str           # text content, items joined by \n for lists, HTML for tables
    level: int = 1
    grid: object = None   # TableGrid for table blocks
    marked: bool = False  # list items already carry markers/indentation
    ordered: bool = False
    runs: list = None     # typed inline records when structure exists
    src: str = ""         # image blocks: the source reference


def _list_items(node: _Node, depth: int, ordered: bool) -> list[str]:
    """Flatten a (possibly nested) list into marker-carrying item lines:
    two spaces of indent per level, `1.`/`2.`… markers for <ol>, `-` for
    <ul>; a nested list inside an <li> recurses one level deeper."""
    items: list[str] = []
    counter = 0
    indent = "  " * depth
    for li in node.children:
        if isinstance(li, str) or li.tag != "li":
            continue
        own = _collapse("".join(
            c if isinstance(c, str) else
            ("" if c.tag in ("ul", "ol") else _inner_text(c))
            for c in li.children))
        counter += 1
        if own:
            marker = f"{counter}. " if ordered else "- "
            # marked items bypass render-time escaping → escape here
            items.append(indent + marker
                         + emit.escape_markdown(emit.normalize_text(own)))
        for sub in li.children:
            if not isinstance(sub, str) and sub.tag in ("ul", "ol"):
                items.extend(_list_items(sub, depth + 1, sub.tag == "ol"))
    return items


def _cell_text(node: _Node) -> str:
    """Cell text with M6 inline-math normalization: an <eq> child renders
    as `` $…$ `` (reference mkcontent :236-248)."""
    parts = []
    for ch in node.children:
        if isinstance(ch, str):
            parts.append(ch)
        elif ch.tag == "eq":
            parts.append(f" ${_inner_text(ch)}$ ")
        else:
            parts.append(_cell_text(ch))
    return "".join(parts)


def _grid_from_dom(tnode: _Node):
    """Build the table grid straight from the parsed DOM (one parse per
    payload — the table re-parse the round-1 design paid is gone).  Cell
    text includes nested-table text, matching _TableParser's buffering;
    nested tables contribute no structure (same depth==1 rule)."""
    rows: list[list[tbl.Cell]] = []

    def walk(n: _Node) -> None:
        for ch in n.children:
            if isinstance(ch, str):
                continue
            if ch.tag == "table":
                continue  # nested table: text flows via the cell's inner text
            if ch.tag == "tr":
                row = []
                for cc in ch.children:
                    if not isinstance(cc, str) and cc.tag in ("td", "th"):
                        row.append(tbl.Cell(
                            " ".join(_cell_text(cc).split()),
                            tbl.span_of(cc.attrs.get("rowspan")),
                            tbl.span_of(cc.attrs.get("colspan")),
                            cc.tag == "th"))
                if row:
                    rows.append(row)
            else:
                walk(ch)

    walk(tnode)
    return tbl.grid_from_rows(rows)


_INLINE_TAGS = ("span", "b", "i", "em", "strong", "a", "code", "u", "small")


def _flush_loose(pending: list[tuple[str, bool]], out: list[Block],
                 dropped: list[int]) -> None:
    """Merge adjacent bare-text / inline children of a container into one
    paragraph block (readability-style: text directly under <div>/<body>
    is content too).  The buffered run is subject to the same link-density
    rule as a real <p>."""
    if not pending:
        return
    chars = sum(len(t.strip()) for t, _ in pending)
    link_chars = sum(len(t.strip()) for t, is_link in pending if is_link)
    txt = _collapse("".join(t for t, _ in pending))
    pending.clear()
    if not txt:
        return
    if chars and link_chars / chars > LINK_DENSITY_MAX:
        dropped[0] += 1
        return
    out.append(Block("text", txt))


def _collect_blocks(node: _Node, out: list[Block], dropped: list[int],
                    raw_html: str) -> None:
    # run of loose text/inline children awaiting promotion to a text block:
    # list of (text, came_from_link) fragments
    pending: list[tuple[str, bool]] = []
    for ch in node.children:
        if isinstance(ch, str):
            if ch.strip():
                pending.append((ch, False))
            elif pending:
                pending.append((" ", False))
            continue
        if ch.tag in _INLINE_TAGS:
            txt = _inner_text(ch)
            if txt.strip():
                pending.append((txt, ch.tag == "a"))
            continue
        if ch.tag == "img":
            # block-level content image: keep the source reference as the
            # image path (main-content extractors keep content images;
            # the boilerplate rules above already dropped nav/ad
            # containers wholesale)
            _flush_loose(pending, out, dropped)
            src = str(ch.attrs.get("src", "")).strip()
            if src:
                b = Block("image", "")
                b.src = src
                out.append(b)
            continue
        _flush_loose(pending, out, dropped)
        if ch.tag in _DROP_TAGS:
            dropped[0] += 1
            continue
        if ch.tag in _HEADING:
            txt = _collapse(_inner_text(ch))
            if txt:
                b = Block("title", txt, _HEADING[ch.tag])
                _attach_runs(b, ch)
                out.append(b)
            continue
        if ch.tag == "p":
            chars, link_chars = _text_stats(ch)
            if chars and link_chars / chars > LINK_DENSITY_MAX:
                dropped[0] += 1
                continue
            txt = _collapse(_inner_text(ch))
            if txt:
                b = Block("text", txt)
                _attach_runs(b, ch)
                out.append(b)
            continue
        if ch.tag in ("ul", "ol"):
            chars, link_chars = _text_stats(ch)
            if chars and link_chars / chars > LINK_DENSITY_MAX:
                dropped[0] += 1
                continue
            items = _list_items(ch, 0, ch.tag == "ol")
            if items:
                b = Block("list", "\n".join(items))
                b.marked = True
                b.ordered = ch.tag == "ol"
                out.append(b)
            continue
        if ch.tag == "blockquote":
            txt = _collapse(_inner_text(ch))
            if txt:
                b = Block("quote", txt)
                _attach_runs(b, ch)
                out.append(b)
            continue
        if ch.tag == "pre":
            txt = _inner_text(ch).strip("\n")
            if txt.strip():
                out.append(Block("code", txt))
            continue
        if ch.tag == "table":
            grid = _grid_from_dom(ch)
            if grid is not None:
                out.append(Block("table", "", grid=grid))
            continue
        if ch.tag in _BLOCK_TAGS or ch.tag in ("head", "title"):
            # container: check link density for generic containers, recurse
            if ch.tag in ("div", "section"):
                chars, link_chars = _text_stats(ch)
                if chars and link_chars / chars > LINK_DENSITY_MAX:
                    dropped[0] += 1
                    continue
            if ch.tag in ("head", "title"):
                continue
            _collect_blocks(ch, out, dropped, raw_html)
            continue
        # unknown tag: recurse conservatively
        _collect_blocks(ch, out, dropped, raw_html)
    _flush_loose(pending, out, dropped)


def extract_html(payload: str) -> tuple[list[dict], dict]:
    """payload HTML → (blocks, metrics).

    Each block: {type, text, page_idx, bbox, level}; bbox is the 0-1000
    normalized degenerate box (HTML has no geometry) mirroring the output
    grid of the reference (mkcontent :478-489).
    """
    root = _build_dom(payload)

    out: list[Block] = []
    dropped = [0]
    _collect_blocks(root, out, dropped, payload)

    blocks: list[dict] = []
    tables_parsed = 0
    for b in out:
        if b.btype == "table":
            html = tbl.render_table_html(b.grid)
            tables_parsed += 1
            blocks.append({"type": "table", "text": html,
                           "page_idx": 0, "bbox": [0, 0, 0, 0], "level": 1})
            continue
        rec = {"type": b.btype, "text": b.text, "page_idx": 0,
               "bbox": [0, 0, 0, 0], "level": b.level}
        if b.btype == "image":
            rec["img_path"] = b.src
        if b.runs:
            rec["_runs"] = b.runs
        if b.btype == "list" and b.marked:
            rec["items_marked"] = True
            rec["pre_rendered"] = True
            rec["attribute"] = "ordered" if b.ordered else "unordered"
        blocks.append(rec)

    metrics = {
        "blocks_classified": len(blocks),
        "blocks_discarded": dropped[0],
        "boilerplate_dropped": dropped[0],
        "tables_parsed": tables_parsed,
        "chars_deduped": 0,
        "ocr_fallback": 0,
        "para_merged": 0,
        "tables_merged": 0,
        "spans_need_ocr": 0,
    }
    return blocks, metrics


def blocks_to_md(blocks: list[dict]) -> str:
    segs = [emit.render_block(b) for b in blocks]
    return "\n\n".join(s for s in segs if s)
