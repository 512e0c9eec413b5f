"""Hand-written kernel fixtures with known expected outputs.

These pin the extraction semantics independently of the generator (the
golden-equality suite compares Spark vs oracle; THIS suite pins the oracle
itself against human-checked expectations, mirroring the reference's golden
content assertions, tests/unittest/test_e2e.py:152-220)."""

import json

from mineru_spark.kernels import emit
from mineru_spark.kernels import tables as tbl
from mineru_spark.kernels.classify import classify_payload
from mineru_spark.kernels.charstream import extract_pdf, blocks_to_md
from mineru_spark.kernels.html_extract import extract_html
from mineru_spark.kernels.html_extract import blocks_to_md as html_md
from mineru_spark.kernels.oracle import extract_turn


# ---------------------------------------------------------------------------
# emit
# ---------------------------------------------------------------------------

def test_escape_markdown():
    assert emit.escape_markdown("a*b_c") == "a\\*b\\_c"
    assert emit.escape_markdown("x\\*y") == "x\\*y"  # already escaped
    assert emit.escape_markdown("# heading like") == "\\# heading like"
    assert emit.escape_markdown("- item like") == "\\- item like"
    assert emit.escape_markdown("plain") == "plain"
    # reference TEXT_BLOCK_MARKDOWN_PREFIX_RE semantics
    # (markdown_utils.py:7-9): multi-# markers, ≤3 indent, tab after
    assert emit.escape_markdown("## two hashes") == "\\## two hashes"
    assert emit.escape_markdown("  + indented item") == "  \\+ indented item"
    assert emit.escape_markdown("#\theading tab") == "\\#\theading tab"
    assert emit.escape_markdown("#nospace") == "#nospace"
    assert emit.escape_markdown("    - four-space indent") == \
        "    - four-space indent"  # >3 indent: code block, not a marker


def test_fullwidth_and_ligatures():
    assert emit.fullwidth_to_halfwidth("ＡＢｃ１２") == "ABc12"
    assert emit.fullwidth_to_halfwidth("，") == "，"  # punctuation untouched
    assert emit.expand_ligatures("ﬁle ﬂow oﬀ −1") == "file flow off -1"


def test_merge_lines_hyphen_and_cjk():
    assert emit.merge_lines(["exam-", "ple here"]) == "example here"
    assert emit.merge_lines(["exam-", "Ple"]) == "exam- Ple"  # uppercase: keep
    assert emit.merge_lines(["数据管道", "处理文档"]) == "数据管道处理文档"
    assert emit.merge_lines(["hello", "world"]) == "hello world"
    # char_utils.py:7-10: only a LETTER before the hyphen splices
    assert emit.merge_lines(["page 3-", "continues"]) == "page 3- continues"
    assert emit.merge_lines(["exam‐", "ple"]) == "example"  # ‐ variant
    assert emit.expand_ligatures("oﬅen ﬆop") == "often stop"


# ---------------------------------------------------------------------------
# classify
# ---------------------------------------------------------------------------

def test_classify_routes():
    assert classify_payload("") == "empty"
    assert classify_payload(None) == "empty"
    assert classify_payload('{"kind": "pdf_chars", "pages": []}') == "pdf"
    assert classify_payload("<table><tr><td>x</td></tr></table>") == "office"
    assert classify_payload("<html><body>hi</body></html>") == "html"
    assert classify_payload("just plain words") == "plain"
    assert classify_payload('{"kind": "xlsx_cells", "sheets": []}') == "xlsx"


def test_classify_series_parity():
    """The vectorized Spark-side router must agree with the scalar oracle
    router on every payload kind the generator emits (plus edge cases)."""
    import pandas as pd

    from mineru_spark.datagen.transcripts import gen_turn
    from mineru_spark.kernels.classify import classify_series

    texts = [gen_turn(ci, ti)["text"]
             for ci in range(40) for ti in range(2)]
    texts += ["", None, "   ", "x < y but plain", "<table><tr></tr></table>",
              '{"kind": "docx_runs", "paras": []}',
              '{"kind": "xlsx_cells", "sheets": []}', "<HTML>hi</HTML>"]
    got = classify_series(pd.Series(texts, dtype=object)).tolist()
    want = [classify_payload(t) for t in texts]
    assert got == want


# ---------------------------------------------------------------------------
# tables
# ---------------------------------------------------------------------------

def test_table_grid_spans():
    html = ('<table><tr><th>a</th><th>b</th><th>c</th></tr>'
            '<tr><td rowspan="2">x</td><td colspan="2">y</td></tr>'
            '<tr><td>p</td><td>q</td></tr></table>')
    grids = tbl.parse_tables(html)
    assert len(grids) == 1
    g = grids[0]
    assert g.ncols == 3
    assert tbl.render_table_html(g) == (
        '<table><tr><th>a</th><th>b</th><th>c</th></tr>'
        '<tr><td rowspan="2">x</td><td colspan="2">y</td></tr>'
        '<tr><td>p</td><td>q</td></tr></table>')


def test_table_rowspan_overflow_clipped():
    html = '<table><tr><td rowspan="5">x</td><td>y</td></tr></table>'
    g = tbl.parse_tables(html)[0]
    assert g.rows[0][0].rowspan == 1


def test_table_eq_tag_normalized():
    """M6: <eq>…</eq> in table HTML → $…$ on both the raw-parse path
    (office route) and the DOM path (html route)."""
    from mineru_spark.kernels.tables import parse_tables, render_table_html
    html = "<table><tr><td><eq>a^2+b^2</eq></td><td>x</td></tr></table>"
    out = render_table_html(parse_tables(html)[0])
    assert "$a^2+b^2$" in out and "<eq>" not in out
    blocks, _ = extract_html(f"<article>{html}</article>")
    assert "$a^2+b^2$" in blocks[0]["text"]


def test_table_img_src_prefix():
    from mineru_spark.kernels.tables import prefix_img_src
    h = '<td><img src="images/x.png"></td><td><img src="data:abc"></td>'
    out = prefix_img_src(h, "s3://bucket")
    assert 'src="s3://bucket/images/x.png"' in out
    assert 'src="data:abc"' in out  # data URIs untouched


def test_table_continuation_merge():
    a = tbl.parse_tables('<table><tr><th>h1</th><th>h2</th></tr>'
                         '<tr><td>1</td><td>2</td></tr></table>')[0]
    b = tbl.parse_tables('<table><tr><td>3</td><td>4</td></tr></table>')[0]
    m = tbl.merge_continuation(a, b)
    assert m is not None and len(m.rows) == 3
    assert tbl.merge_continuation(b, a) is None  # b has no header


# ---------------------------------------------------------------------------
# html extraction
# ---------------------------------------------------------------------------

def test_html_boilerplate_strip():
    html = ("<html><body><nav><ul><li><a href='/'>one two three</a></li>"
            "<li><a href='/'>four five</a></li></ul></nav>"
            "<article><h1>Title Here</h1><p>main content stays here.</p>"
            "<p><a href='/x'>link link link link</a> tiny</p></article>"
            "<footer>foot <a href='/'>terms</a></footer></body></html>")
    blocks, metrics = extract_html(html)
    md = html_md(blocks)
    assert md == "# Title Here\n\nmain content stays here."
    assert metrics["boilerplate_dropped"] >= 2  # nav, footer, link-dense <p>


def test_html_loose_text_promoted():
    """Bare text / inline children directly under a container become a text
    block (readability semantics: unwrapped content is still content)."""
    html = ("<html><body><div>loose text lives here "
            "<b>bold bit</b> and continues.</div>"
            "<section>another naked paragraph.</section></body></html>")
    blocks, _ = extract_html(html)
    md = html_md(blocks)
    assert md == ("loose text lives here bold bit and continues."
                  "\n\nanother naked paragraph.")


def test_html_loose_link_run_is_boilerplate():
    """A loose inline run that is mostly anchors is still link-density
    boilerplate, same rule as a real <p>."""
    html = ("<div><a href='/a'>one two three four</a> "
            "<a href='/b'>five six seven eight</a> x</div>")
    blocks, metrics = extract_html(html)
    assert blocks == []
    assert metrics["boilerplate_dropped"] == 1


def test_html_nested_ordered_list_and_blockquote():
    """Nested lists flatten with indent + per-level markers; <ol> numbers
    its items; blockquote renders as a `>` markdown quote."""
    html = ("<article><ol><li>first<ul><li>sub a</li><li>sub b</li></ul>"
            "</li><li>second</li></ol>"
            "<blockquote>wise words here.</blockquote></article>")
    blocks, _ = extract_html(html)
    md = html_md(blocks)
    assert md == ("1. first\n  - sub a\n  - sub b\n2. second\n\n"
                  "> wise words here.")
    assert blocks[0]["attribute"] == "ordered"
    assert blocks[1]["type"] == "quote"


def test_html_list_and_table():
    html = ("<article><ul><li>alpha one</li><li>beta two</li></ul>"
            "<table><tr><th>h</th></tr><tr><td>v</td></tr></table></article>")
    blocks, _ = extract_html(html)
    md = html_md(blocks)
    assert md == ("- alpha one\n- beta two\n\n"
                  "<table><tr><th>h</th></tr><tr><td>v</td></tr></table>")


# ---------------------------------------------------------------------------
# charstream
# ---------------------------------------------------------------------------

def _char(ch, x, y, size=10.0, rot=0.0, idx=0, w=None):
    w = w if w is not None else 5.0 * size / 10.0
    return {"char": ch, "bbox": [x, y, x + w, y + size],
            "font": {"name": "F", "size": size, "flags": 0, "weight": 400},
            "rotation": rot, "char_idx": idx}


def _page(chars, layout):
    return {"kind": "pdf_chars",
            "pages": [{"page_idx": 0, "page_size": [612.0, 792.0],
                       "chars": chars, "layout": layout}]}


def test_charstream_spaces_and_lines():
    # "ab cd" on line 1, "ef" on line 2 (gap > 0.25 * width=5 → space)
    chars = [_char("a", 50, 100, idx=0), _char("b", 55, 100, idx=1),
             _char("c", 65, 100, idx=2), _char("d", 70, 100, idx=3),
             _char("e", 50, 112, idx=4), _char("f", 55, 112, idx=5)]
    layout = [{"bbox": [45, 95, 200, 130], "label": "text", "index": 0}]
    blocks, spans, m = extract_pdf(_page(chars, layout))
    assert blocks[0]["text"] == "ab cd ef"
    assert m["ocr_fallback"] == 1  # < 50 chars/page


def test_charstream_dedup_and_watermark():
    chars = [_char("a", 50, 100, idx=0),
             _char("a", 51.5, 101.5, idx=0),        # shadow dup
             _char("a", 50.4, 100.0, idx=0),        # jitter dup
             _char("W", 300, 300, rot=30.0, idx=9)]  # watermark
    layout = [{"bbox": [45, 95, 200, 130], "label": "text", "index": 0}]
    blocks, _, m = extract_pdf(_page(chars, layout))
    assert blocks[0]["text"] == "a"
    assert m["chars_deduped"] == 3


def test_charstream_out_of_order_sort():
    chars = [_char("b", 55, 100, idx=1), _char("a", 50, 100, idx=0),
             _char("c", 65, 100, idx=2)]
    layout = [{"bbox": [45, 95, 200, 130], "label": "text", "index": 0}]
    blocks, _, _ = extract_pdf(_page(chars, layout))
    assert blocks[0]["text"] == "a bc" or blocks[0]["text"] == "ab c"
    # idx order: a(50),b(55) adjacent, c at 65 → gap 5 > 1.25 → "ab c"
    assert blocks[0]["text"] == "ab c"


def test_charstream_superscript():
    chars = [_char("x", 50, 100, idx=0), _char("y", 55, 100, idx=1),
             _char("2", 60, 98, size=7.0, idx=2)]
    layout = [{"bbox": [45, 90, 200, 130], "label": "text", "index": 0}]
    blocks, spans, _ = extract_pdf(_page(chars, layout))
    assert blocks[0]["text"] == "xy<sup>2</sup>"
    assert any(s["type"] == "sup" for s in spans)


def test_charstream_hyphen_merge_and_discard():
    chars = ([_char(c, 50 + 5 * i, 100, idx=i)
              for i, c in enumerate("exam-")]
             + [_char(c, 50 + 5 * i, 112, idx=5 + i)
                for i, c in enumerate("ple")]
             + [_char("H", 50, 20, idx=100)])
    layout = [{"bbox": [45, 95, 200, 130], "label": "text", "index": 1},
              {"bbox": [45, 15, 200, 35], "label": "header", "index": 0}]
    blocks, _, m = extract_pdf(_page(chars, layout))
    content = [b for b in blocks if not b.get("discarded")]
    assert len(content) == 1
    assert content[0]["text"] == "example"
    assert m["blocks_discarded"] == 1
    # discarded blocks are retained TYPED (for content_list/middle), after
    # the page's content blocks, and render to no markdown
    disc = [b for b in blocks if b.get("discarded")]
    assert disc and disc[0]["type"] == "header" and disc[0]["text"] == "H"
    assert blocks_to_md(blocks) == "example"


def test_charstream_title_levels_and_order():
    mk = lambda s, y, i0: [_char(c, 50 + 5 * k, y, idx=i0 + k)
                           for k, c in enumerate(s)]
    chars = mk("Doc", 50, 0) + mk("Sec", 80, 10) + mk("body", 110, 20)
    layout = [{"bbox": [45, 45, 200, 65], "label": "doc_title", "index": 0},
              {"bbox": [45, 75, 200, 95], "label": "paragraph_title", "index": 1},
              {"bbox": [45, 105, 200, 125], "label": "text", "index": 2}]
    blocks, _, _ = extract_pdf(_page(chars, layout))
    md = blocks_to_md(blocks)
    assert md == "# Doc\n\n## Sec\n\nbody"


# ---------------------------------------------------------------------------
# oracle end-to-end (one turn per route)
# ---------------------------------------------------------------------------

def test_extract_turn_shapes():
    out = extract_turn("", "none")
    assert out["route"] == "empty" and out["md"] == ""
    out = extract_turn("<html><body><article><p>hi there</p></article>"
                       "</body></html>", "browser")
    assert out["md"] == "hi there"
    cl = json.loads(out["content_list"])
    assert cl[0]["type"] == "text" and cl[0]["text"] == "hi there"
    out = extract_turn("<table><tr><td>z</td></tr></table>", "file_reader")
    assert out["md"] == "<table><tr><td>z</td></tr></table>"
    assert out["metrics"]["tables_parsed"] == 1


# ---------------------------------------------------------------------------
# xy-cut reading order (B8)
# ---------------------------------------------------------------------------

def test_xycut_two_columns():
    from mineru_spark.kernels.xycut import xy_cut_order
    # header spans full width on top; two columns below; footer at bottom
    boxes = [
        [50, 700, 550, 720],    # 0 footer (bottom)
        [300, 100, 550, 300],   # 1 right column top
        [50, 100, 280, 200],    # 2 left column top
        [50, 20, 550, 40],      # 3 header (top)
        [50, 220, 280, 380],    # 4 left column bottom
        [300, 320, 550, 500],   # 5 right column bottom
    ]
    assert xy_cut_order(boxes) == [3, 2, 4, 1, 5, 0]


def test_xycut_cross_layout_banner():
    """XY-Cut++ pre-mask (xycut_pp_sorter.py:149-183, :372-414): a
    full-width banner over two columns is masked out before cutting, so
    the columns still order column-major; the banner zipper-merges back by
    its top edge."""
    from mineru_spark.kernels.xycut import xy_cut_order
    boxes = [
        [50, 100, 240, 180],    # 0 col1 top
        [50, 220, 240, 300],    # 1 col1 bottom
        [340, 100, 562, 180],   # 2 col2 top
        [340, 220, 562, 300],   # 3 col2 bottom
        [50, 185, 562, 215],    # 4 spanning banner
    ]
    # masked: the 100pt gutter beats the 40pt row gap → column-major, with
    # the banner re-entering by its top edge; unmasked, the banner fills
    # the gutter projection and forces row-major interleaving
    assert xy_cut_order(boxes) == [0, 4, 1, 2, 3]
    # without the banner: pure column-major
    assert xy_cut_order(boxes[:4]) == [0, 1, 2, 3]


def test_xycut_narrow_element_filter():
    """A skinny margin rule between two columns must not suppress the
    column cut (xycut_pp_sorter.py:269-301)."""
    from mineru_spark.kernels.xycut import xy_cut_order
    boxes = [
        [50, 100, 290, 300],    # 0 left column
        [320, 100, 560, 300],   # 1 right column
        [300, 100, 310, 300],   # 2 narrow divider glueing the projections
    ]
    order = xy_cut_order(boxes)
    # left column first, right column after (divider may land either side)
    assert order.index(0) < order.index(1)


def test_charstream_xycut_when_no_index():
    mk = lambda s, x, y, i0: [_char(c, x + 5 * k, y, idx=i0 + k)
                              for k, c in enumerate(s)]
    chars = (mk("left.", 50, 100, 0) + mk("right.", 320, 100, 10)
             + mk("leftb.", 50, 140, 20))
    # layout order scrambled and index=-1 → kernel must XY-cut:
    # top slice splits into left/right columns, bottom row last
    layout = [{"bbox": [315, 95, 560, 130], "label": "text", "index": -1},
              {"bbox": [45, 95, 290, 130], "label": "text", "index": -1},
              {"bbox": [45, 135, 290, 170], "label": "text", "index": -1}]
    blocks, _, _ = extract_pdf(_page(chars, layout))
    # column gutter (25pt) beats the inter-row gap (5pt) → column-major
    assert [b["text"] for b in blocks] == ["left.", "leftb.", "right."]


# ---------------------------------------------------------------------------
# cross-block paragraph merge (D1)
# ---------------------------------------------------------------------------

def _mk_line(s, y, i0):
    return [_char(c, 50 + 5 * k, y, idx=i0 + k) for k, c in enumerate(s)]


def _two_page(chars0, layout0, chars1, layout1):
    return {"kind": "pdf_chars", "pages": [
        {"page_idx": 0, "page_size": [612.0, 792.0],
         "chars": chars0, "layout": layout0},
        {"page_idx": 1, "page_size": [612.0, 792.0],
         "chars": chars1, "layout": layout1}]}


def test_para_merge_across_pages():
    """Reference merge guards (para_split.py:265-306): prev block's last
    line right-flush, no stop flag, next block left-flush + lowercase, on a
    later page → merge, with the cross_page flag."""
    a = _mk_line("alpha beta gam", 100, 0) + \
        _mk_line("delta epsilon zet", 112, 20)
    la = [{"bbox": [45, 95, 300, 130], "label": "text", "index": 0}]
    b = _mk_line("ends the tale.", 60, 40)
    lb = [{"bbox": [45, 55, 300, 90], "label": "text", "index": 0}]
    blocks, _, m = extract_pdf(_two_page(a, la, b, lb))
    assert len(blocks) == 1
    assert blocks[0]["text"] == \
        "alpha beta gam delta epsilon zet ends the tale."
    assert blocks[0]["cross_page"] is True
    assert m["para_merged"] == 1


def test_para_no_merge_after_period():
    """A stop flag on the previous block vetoes the merge even across
    pages (LINE_STOP_FLAG, para_split.py:7)."""
    a = _mk_line("alpha beta gam", 100, 0) + \
        _mk_line("delta epsilon is.", 112, 20)
    la = [{"bbox": [45, 95, 300, 130], "label": "text", "index": 0}]
    b = _mk_line("next paragraph.", 60, 40)
    lb = [{"bbox": [45, 55, 300, 90], "label": "text", "index": 0}]
    blocks, _, m = extract_pdf(_two_page(a, la, b, lb))
    assert len(blocks) == 2 and m["para_merged"] == 0


def test_para_no_merge_digit_or_upper_head():
    """span_start_with_num / span_start_with_big_char vetoes
    (para_split.py:291-296)."""
    a = _mk_line("alpha beta gam", 100, 0) + \
        _mk_line("delta epsilon zet", 112, 20)
    la = [{"bbox": [45, 95, 300, 130], "label": "text", "index": 0}]
    for head in ("2026 follows it.", "Next sentence x."):
        b = _mk_line(head, 60, 40)
        lb = [{"bbox": [45, 55, 300, 90], "label": "text", "index": 0}]
        blocks, _, m = extract_pdf(_two_page(a, la, b, lb))
        assert len(blocks) == 2 and m["para_merged"] == 0


def test_para_no_merge_same_column():
    """Stacked same-column blocks never merge: the later block must sit
    above the previous block's bottom edge or on a later page
    (para_split.py:300)."""
    chars = _mk_line("alpha beta gam", 100, 0) + \
        _mk_line("delta epsilon zet", 112, 20) + \
        _mk_line("ends the tale.", 200, 40)
    layout = [{"bbox": [45, 95, 300, 130], "label": "text", "index": 0},
              {"bbox": [45, 195, 300, 230], "label": "text", "index": 1}]
    blocks, _, m = extract_pdf(_page(chars, layout))
    assert len(blocks) == 2 and m["para_merged"] == 0


def test_adjacent_list_blocks_merge():
    """Adjacent list/list blocks merge unconditionally (para_split.py
    :404-411); a title between them breaks the group."""
    import json
    from mineru_spark.kernels.oracle import extract_turn

    def li_block(y, items, idx0, index):
        chars, lo = [], []
        j = idx0
        rows = []
        for r, it in enumerate(items):
            for k, c in enumerate(it):
                chars.append(_char(c, 50 + 5 * k, y + 12 * r, idx=j))
                j += 1
        lo = [{"bbox": [45, y - 5, 300, y + 12 * len(items)],
               "label": "list", "index": index}]
        return chars, lo, j

    c1, l1, j = li_block(100, ["• one", "• two"], 0, 0)
    c2, l2, _ = li_block(200, ["• three"], j, 1)
    out = extract_turn(json.dumps(_page(c1 + c2, l1 + l2)), "pdf_reader")
    cl = json.loads(out["content_list"])
    lists = [b for b in cl if b["type"] == "list"]
    assert len(lists) == 1
    # content_list carries the same hard-break join as md (reference
    # routes LIST through merge_para_with_text)
    assert lists[0]["text"] == "• one  \n• two  \n• three"


def test_d1_geometric_index_block():
    """TOC lines (left-flush, ≥80% digit-end) → index block, lines kept
    verbatim (para_split.py:183-189)."""
    chars, layout, j = [], [], 0
    for r, line in enumerate(("alpha beta 12", "gamma delta 34",
                              "epsilon zeta 56", "theta lambda 78")):
        chars += _mk_line(line, 100 + 12 * r, j)
        j += 20
    layout = [{"bbox": [45, 95, 300, 160], "label": "text", "index": 0}]
    blocks, _, _ = extract_pdf(_page(chars, layout))
    assert blocks[0]["type"] == "index"
    assert blocks[0]["text"].split("\n") == [
        "alpha beta 12", "gamma delta 34", "epsilon zeta 56",
        "theta lambda 78"]


# ---------------------------------------------------------------------------
# conv-level finalize (D2)
# ---------------------------------------------------------------------------

def test_finalize_conv_table_merge():
    from mineru_spark.kernels.oracle import finalize_conv
    a = extract_turn('<table><tr><th>h1</th><th>h2</th></tr>'
                     '<tr><td>1</td><td>2</td></tr></table>', "file_reader")
    b = extract_turn('<table><tr><td>3</td><td>4</td></tr></table>',
                     "file_reader")
    a["turn_idx"], b["turn_idx"] = 0, 1
    finalize_conv([a, b])
    assert a["metrics"]["tables_merged"] == 1
    assert "<td>3</td><td>4</td>" in a["md"]
    assert b["md"] == "" and b["content_list"] == "[]"


def test_finalize_conv_no_merge_nonadjacent():
    from mineru_spark.kernels.oracle import finalize_conv
    a = extract_turn('<table><tr><th>h1</th><th>h2</th></tr>'
                     '<tr><td>1</td><td>2</td></tr></table>', "file_reader")
    b = extract_turn('<table><tr><td>3</td><td>4</td></tr></table>',
                     "file_reader")
    a["turn_idx"], b["turn_idx"] = 0, 5  # gap: not a continuation
    finalize_conv([a, b])
    assert a["metrics"]["tables_merged"] == 0 and b["md"] != ""


# ---------------------------------------------------------------------------
# rich block kinds (B10-B12, G2/G4 analogs, B5/B6, C10)
# ---------------------------------------------------------------------------

def _caption_chars(text, y, i0):
    out = []
    x = 50.0
    j = i0
    for word in text.split(" "):
        for c in word:
            out.append(_char(c, x, y, idx=j)); x += 5.0; j += 1
        x += 5.0
    return out, x, j


def test_visual_caption_matching():
    cap, xe, _ = _caption_chars("Table 1: demo.", 210, 0)
    layout = [
        {"bbox": [50, 100, 300, 200], "label": "table", "index": 0,
         "html": "<table><tr><th>h</th></tr><tr><td>v</td></tr></table>"},
        {"bbox": [45, 205, 320, 225], "label": "table_caption", "index": 1},
    ]
    blocks, _, m = extract_pdf(_page(cap, layout))
    assert len(blocks) == 1 and blocks[0]["type"] == "table"
    assert blocks[0]["caption"] == ["Table 1: demo."]
    assert m["tables_parsed"] == 1
    md = blocks_to_md(blocks)
    # children render in READING order (the caption sits BELOW the
    # table), with a blank line after the html body
    # (merge_visual_blocks_to_markdown + get_visual_block_separator)
    assert md == ("<table><tr><th>h</th></tr><tr><td>v</td></tr></table>"
                  "\n\nTable 1: demo.")


def test_cross_page_table_merge_in_document():
    """In-document cross-page table merge (table_merge.py +
    table_continuation.py markers): a headerless continuation merges
    structurally; a '(continued)'-captioned repeat merges with its
    duplicate header dropped; an unrelated header table does NOT merge."""
    import json
    from mineru_spark.kernels.oracle import extract_turn

    anchor = ("<table><tr><th>a</th><th>b</th></tr>"
              "<tr><td>1</td><td>2</td></tr></table>")

    def two_page(cont_html, caption=None):
        pages = [{"page_idx": 0, "page_size": [612.0, 792.0], "chars": [],
                  "layout": [{"bbox": [50, 600, 562, 660], "label": "table",
                              "index": 0, "html": anchor}]},
                 {"page_idx": 1, "page_size": [612.0, 792.0], "chars": [],
                  "layout": [{"bbox": [50, 60, 562, 120], "label": "table",
                              "index": 0, "html": cont_html}]}]
        if caption:
            cchars = [_char(c, 50 + 5 * k, 130, idx=k)
                      for k, c in enumerate(caption)]
            pages[1]["chars"] = cchars
            pages[1]["layout"].append(
                {"bbox": [45, 125, 300, 145], "label": "table_caption",
                 "index": 1})
        return json.dumps({"kind": "pdf_chars", "pages": pages})

    # structural: headerless, same ncols
    o = extract_turn(two_page("<table><tr><td>3</td><td>4</td></tr></table>"),
                     "pdf_reader")
    assert o["metrics"]["tables_merged"] == 1
    assert o["md"].count("<table>") == 1 and "<td>3</td>" in o["md"]
    # marked: repeated header + (continued) caption → header dropped
    o2 = extract_turn(two_page(
        "<table><tr><th>a</th><th>b</th></tr>"
        "<tr><td>5</td><td>6</td></tr></table>", "Table 1 (continued)"),
        "pdf_reader")
    assert o2["metrics"]["tables_merged"] == 1
    assert o2["md"].count("<th>a</th>") == 1 and "<td>5</td>" in o2["md"]
    assert "(continued)" not in o2["md"]  # marker caption dropped
    # unrelated table with its own header: no merge
    o3 = extract_turn(two_page(
        "<table><tr><th>x</th><th>y</th></tr>"
        "<tr><td>7</td><td>8</td></tr></table>"), "pdf_reader")
    assert o3["metrics"]["tables_merged"] == 0
    assert o3["md"].count("<table>") == 2


def test_structural_merge_headers_and_colspan_adjust():
    """Full structural merge machinery (table_merge.py
    detect_table_headers :568-634, _expand_header_count_by_rowspan
    :638-658, can_merge_by_structure :663-690, check_rows_match
    :734-753, adjust_table_rows_colspan :769-807, perform_table_merge
    :1020-1083) on the grid algebra."""
    from mineru_spark.kernels import tables as tbl

    def grid(html):
        return tbl.parse_tables(html)[0]

    # multi-row repeated header whose first row carries rowspan=2: the
    # skip count expands to cover both header rows
    hdr = '<tr><th rowspan="2">k</th><th>p</th></tr><tr><th>q</th></tr>'
    a = grid(f"<table>{hdr}<tr><td>1</td><td>2</td></tr></table>")
    b = grid(f"<table>{hdr}<tr><td>3</td><td>4</td></tr></table>")
    assert tbl.detect_repeated_header_rows(a, b) == 2
    m = tbl.merge_structural(a, b)
    assert tbl.render_table_html(m).count("<th>p</th>") == 1
    assert "<td>3</td>" in tbl.render_table_html(m)

    # unequal column counts: the continuation's narrow rows adopt the
    # anchor boundary row's colspan structure
    a2 = grid('<table><tr><th>h1</th><th>h2</th><th>h3</th></tr>'
              '<tr><td>1</td><td colspan="2">wide</td></tr></table>')
    b2 = grid('<table><tr><td>2</td><td>narrow</td></tr></table>')
    assert tbl.can_merge_structural(a2, b2)
    m2 = tbl.merge_structural(a2, b2)
    assert m2.ncols == 3
    html2 = tbl.render_table_html(m2)
    assert '<td colspan="2">narrow</td>' in html2

    # last-cell stretch path: a continuation row that does NOT mirror the
    # match-reference row pads its last cell to the target width
    m3 = tbl.merge_structural(
        a2, grid('<table><tr><td>4</td><td>narrow2</td></tr>'
                 '<tr><td>total</td></tr></table>'))
    assert m3 is not None and m3.ncols == 3
    assert '<td colspan="3">total</td>' in tbl.render_table_html(m3)

    # structurally incompatible boundary rows: refused
    a4 = grid('<table><tr><th>x</th><th>y</th><th>z</th></tr>'
              '<tr><td>1</td><td>2</td><td>3</td></tr></table>')
    b4 = grid("<table><tr><td>solo</td></tr></table>")
    assert tbl.merge_structural(a4, b4) is None


def test_cell_merge_cross_page_continuation():
    """VLM cell_merge signal (reference _apply_cell_merge :938-1017 +
    vlm_magic_model.py:231-232): flagged visual columns' content in the
    continuation's first data row appends into the anchor's last-row
    cells; a fully-emptied row is dropped; unflagged content survives."""
    import json

    from mineru_spark.kernels import tables as tbl
    from mineru_spark.kernels.oracle import extract_turn

    def grid(h):
        return tbl.parse_tables(h)[0]

    a = grid("<table><tr><th>k</th><th>v</th></tr>"
             "<tr><td>key one</td><td>value starts</td></tr></table>")
    b = grid("<table><tr><td></td><td>and ends here</td></tr>"
             "<tr><td>k2</td><td>v2</td></tr></table>")
    m = tbl.merge_structural(a, b, cell_merge=[0, 1])
    html = tbl.render_table_html(m)
    assert "<td>value starts and ends here</td>" in html
    assert html.count("<tr>") == 3  # emptied continuation row dropped
    assert "<td>k2</td>" in html

    # mixed: an unflagged non-empty cell keeps the row alive (emptied
    # flagged cell stays blank)
    b2 = grid("<table><tr><td>stray</td><td>tail</td></tr></table>")
    m2 = tbl.merge_structural(a, b2, cell_merge=[0, 1])
    h2 = tbl.render_table_html(m2)
    assert "<td>value starts tail</td>" in h2
    assert "<td>stray</td>" in h2 and h2.count("<tr>") == 3

    # end-to-end: two-page pdf payload, continuation record carries the
    # cell_merge flags → single merged table in md
    pages = [
        {"page_idx": 0, "page_size": [612.0, 792.0], "chars": [],
         "layout": [{"bbox": [50, 600, 562, 660], "label": "table",
                     "index": 0,
                     "html": "<table><tr><th>k</th><th>v</th></tr>"
                             "<tr><td>key one</td><td>value starts</td>"
                             "</tr></table>"}]},
        {"page_idx": 1, "page_size": [612.0, 792.0], "chars": [],
         "layout": [{"bbox": [50, 60, 562, 120], "label": "table",
                     "index": 0, "cell_merge": [0, 1],
                     "html": "<table><tr><td></td>"
                             "<td>and ends here</td></tr></table>"}]},
    ]
    out = extract_turn(json.dumps({"kind": "pdf_chars", "pages": pages}),
                       "pdf_reader")
    assert out["metrics"]["tables_merged"] == 1
    assert "<td>value starts and ends here</td>" in out["md"]
    assert out["md"].count("<table>") == 1


def test_caption_tiebreak_geometry_and_later_table():
    """B10 tiebreaks (find_best_visual_parent,
    visual_magic_model_utils.py:535-621): equal index distance resolves by
    edge distance when it discriminates; a table caption dead-centered
    between two tables goes to the LATER one."""
    import json
    from mineru_spark.kernels.oracle import extract_turn

    def cap_chars(s, y, i0):
        return [_char(c, 50 + 5 * k, y, idx=i0 + k)
                for k, c in enumerate(s)]

    # geometry discriminates: caption is index-equidistant but sits right
    # below table A (edge gap ~4pt) and far from table B (>100pt)
    layout = [
        {"bbox": [50, 100, 300, 160], "label": "table", "index": 0,
         "html": "<table><tr><td>a</td></tr></table>"},
        {"bbox": [50, 164, 300, 176], "label": "table_caption", "index": 1},
        {"bbox": [50, 300, 300, 360], "label": "table", "index": 2,
         "html": "<table><tr><td>b</td></tr></table>"},
    ]
    chars = cap_chars("Table near A.", 165, 0)
    out = extract_turn(json.dumps(_page(chars, layout)), "pdf_reader")
    cl = json.loads(out["content_list"])
    tables = [b for b in cl if b["type"] == "table"]
    assert tables[0]["table_caption"] == ["Table near A."]
    assert tables[1]["table_caption"] == []

    # geometry ties (< 2pt spread): caption between two tables → LATER
    layout2 = [
        {"bbox": [50, 100, 300, 160], "label": "table", "index": 0,
         "html": "<table><tr><td>a</td></tr></table>"},
        {"bbox": [50, 170, 300, 182], "label": "table_caption", "index": 1},
        {"bbox": [50, 192, 300, 252], "label": "table", "index": 2,
         "html": "<table><tr><td>b</td></tr></table>"},
    ]
    chars2 = cap_chars("Between tables.", 171, 0)
    out2 = extract_turn(json.dumps(_page(chars2, layout2)), "pdf_reader")
    cl2 = json.loads(out2["content_list"])
    tables2 = [b for b in cl2 if b["type"] == "table"]
    assert tables2[0]["table_caption"] == []
    assert tables2[1]["table_caption"] == ["Between tables."]


def test_orphan_caption_degrades_to_text():
    cap, _, _ = _caption_chars("Figure 9: alone.", 210, 0)
    layout = [{"bbox": [45, 205, 320, 225], "label": "image_caption",
               "index": 0}]
    blocks, _, _ = extract_pdf(_page(cap, layout))
    assert blocks[0]["type"] == "text"


def test_equation_block():
    layout = [{"bbox": [200, 100, 400, 124], "label": "interline_equation",
               "index": 0, "latex": r"\frac{a}{b}"}]
    blocks, _, _ = extract_pdf(_page([], layout))
    assert blocks[0]["type"] == "equation"
    assert blocks_to_md(blocks) == "$$\n\\frac{a}{b}\n$$"


def test_code_block_language_guess():
    from mineru_spark.kernels.charstream import guess_code_lang
    assert guess_code_lang("def run(x):\nreturn x") == "python"
    assert guess_code_lang("SELECT a FROM t") == "sql"
    assert guess_code_lang("const f = (x) => x") == "javascript"
    assert guess_code_lang("plain words") == ""
    l1, _, j = _caption_chars("def run(x):", 100, 0)
    l2, _, _ = _caption_chars("return x", 112, j)
    layout = [{"bbox": [45, 95, 300, 130], "label": "code", "index": 0}]
    blocks, _, _ = extract_pdf(_page(l1 + l2, layout))
    assert blocks[0]["type"] == "code" and blocks[0]["lang"] == "python"
    assert blocks_to_md(blocks) == "```python\ndef run(x):\nreturn x\n```"


def test_list_block_bullets():
    l1, _, j = _caption_chars("• alpha beta", 100, 0)
    l2, _, _ = _caption_chars("• gamma", 112, j)
    layout = [{"bbox": [45, 95, 300, 130], "label": "list", "index": 0}]
    blocks, _, _ = extract_pdf(_page(l1 + l2, layout))
    assert blocks[0]["type"] == "list"
    # model-labeled list: lines verbatim (markers are span content),
    # hard break per item-start line (pipeline md list join)
    assert blocks_to_md(blocks) == "• alpha beta  \n• gamma"


def test_vertical_text_assembly():
    # two columns of CJK, right column first (B6 right→left)
    chars = []
    for k, c in enumerate("数据管"):    # right column x=530
        chars.append(_char(c, 530, 100 + 12 * k, idx=k, w=10))
    for k, c in enumerate("处理文"):    # left column x=515
        chars.append(_char(c, 515, 100 + 12 * k, idx=10 + k, w=10))
    layout = [{"bbox": [513, 95, 542, 240], "label": "text", "index": 0}]
    blocks, _, _ = extract_pdf(_page(chars, layout))
    assert blocks[0]["text"] == "数据管处理文"


def test_vertical_block_cross_page_merge():
    """D1 vertical variant (para_split.py:309-345): a later vertical block
    whose first column starts at its top merges into an earlier vertical
    block whose last column reaches its bottom, when heights are
    comparable, no stop flag ends the earlier text, and the x-ranges
    overlap (right→left flow).  Columns join with no separator; the merge
    is marked cross_page."""
    def vchars(texts, i0):
        out = []
        for col, (x, s) in enumerate(texts):
            for k, c in enumerate(s):
                out.append(_char(c, x, 100 + 12 * k, idx=i0 + col * 10 + k,
                                 w=10))
        return out

    pages = [
        {"page_idx": 0, "page_size": [612.0, 792.0],
         "chars": vchars([(530, "数据管"), (515, "处理文")], 0),
         "layout": [{"bbox": [513, 95, 542, 240], "label": "text",
                     "index": 0}]},
        {"page_idx": 1, "page_size": [612.0, 792.0],
         "chars": vchars([(530, "続行拡"), (515, "張充実")], 0),
         "layout": [{"bbox": [513, 95, 542, 240], "label": "text",
                     "index": 0}]},
    ]
    blocks, _, m = extract_pdf({"kind": "pdf_chars", "pages": pages})
    assert len(blocks) == 1
    assert blocks[0]["text"] == "数据管处理文続行拡張充実"
    assert blocks[0]["cross_page"] is True
    assert m["para_merged"] == 1

    # negative: earlier block ends with a stop flag → no merge
    pages[0]["chars"] = vchars([(530, "数据管"), (515, "处理。")], 0)
    blocks2, _, m2 = extract_pdf({"kind": "pdf_chars", "pages": pages})
    assert len(blocks2) == 2 and m2["para_merged"] == 0


def test_b10_inline_caption_fragment():
    """B10 inline fallback (visual_magic_model_utils.py:101-131,:351-379):
    a text fragment on the caption's line, directly above the visual,
    joins the caption; a fragment on a different line stays text."""
    cap, _, j = _caption_chars("Figure 1:", 200, 0)
    frag = []
    for k, c in enumerate("extra part"):
        if c != " ":
            frag.append(_char(c, 160 + 5 * k, 200, idx=j + k))
    layout = [
        {"bbox": [45, 195, 150, 215], "label": "image_caption", "index": 0},
        {"bbox": [155, 195, 300, 215], "label": "text", "index": 1},
        {"bbox": [45, 230, 300, 330], "label": "image", "index": 2},
    ]
    blocks, _, _ = extract_pdf(_page(cap + frag, layout))
    img = [b for b in blocks if b["type"] == "image"][0]
    assert img["caption"] == ["Figure 1:", "extra part"]

    # different line (no y-overlap, center gap > 0.5·h) → stays text
    frag_lo = [_char(c, 160 + 5 * k, 260, idx=j + k)
               for k, c in enumerate("extrapart")]
    layout_lo = [
        {"bbox": [45, 195, 150, 215], "label": "image_caption", "index": 0},
        {"bbox": [155, 255, 300, 275], "label": "text", "index": 1},
        {"bbox": [45, 290, 300, 390], "label": "image", "index": 2},
    ]
    blocks2, _, _ = extract_pdf(_page(cap + frag_lo, layout_lo))
    img2 = [b for b in blocks2 if b["type"] == "image"][0]
    assert img2["caption"] == ["Figure 1:"]
    assert any(b["type"] == "text" for b in blocks2)

    # KIND mismatch (ADVICE r4 low #4): an image_caption above a TABLE
    # must not promote the fragment — the attach loop would route an
    # image_caption to a faraway image instead of the adjacent visual
    layout_tbl = [
        {"bbox": [45, 195, 150, 215], "label": "image_caption", "index": 0},
        {"bbox": [155, 195, 300, 215], "label": "text", "index": 1},
        {"bbox": [45, 230, 300, 330], "label": "table", "index": 2},
    ]
    blocks3, _, _ = extract_pdf(_page(cap + frag, layout_tbl))
    assert any(b["type"] == "text" and "extra" in b.get("text", "")
               for b in blocks3), "fragment must stay text on kind mismatch"


def test_b10_stacked_table_caption_cluster():
    """B10 stacked fallback (:226-305): a single-line text fragment BELOW
    the last labeled caption in the stack piled above a table becomes a
    table caption."""
    cap, _, j = _caption_chars("Table 2: stuff", 262, 0)
    frag, _, _ = _caption_chars("More details here", 280, j)
    layout = [
        {"bbox": [45, 258, 300, 276], "label": "table_caption", "index": 0},
        {"bbox": [45, 278, 300, 294], "label": "text", "index": 1},
        {"bbox": [50, 300, 300, 400], "label": "table", "index": 2,
         "html": "<table><tr><th>h</th></tr><tr><td>v</td></tr></table>"},
    ]
    blocks, _, _ = extract_pdf(_page(cap + frag, layout))
    tab = [b for b in blocks if b["type"] == "table"][0]
    assert tab["caption"] == ["Table 2: stuff", "More details here"]


def test_b10_leading_continuation_caption():
    """B10 leading-continuation fallback (:133-223): page-leading
    single-line '(continued)' text adjacent to the first table becomes
    its caption instead of body text."""
    cont, _, _ = _caption_chars("(continued)", 98, 0)
    layout = [
        {"bbox": [45, 95, 300, 112], "label": "text", "index": 0},
        {"bbox": [50, 120, 300, 220], "label": "table", "index": 1,
         "html": "<table><tr><th>h</th></tr><tr><td>v</td></tr></table>"},
    ]
    blocks, _, _ = extract_pdf(_page(cont, layout))
    assert len(blocks) == 1 and blocks[0]["type"] == "table"
    assert blocks[0]["caption"] == ["(continued)"]


def test_middle_line_hierarchy_and_image_paths():
    """middle IR keeps the block→line→span hierarchy with page-normalized
    bboxes for char-kernel blocks (reference page→block→line→span), and
    image blocks carry a deterministic sha256-named img_path through
    md (![](...) line), content_list and content_list_v2
    (pdf_image_tools.py:495-514 naming; mkcontent :656-665)."""
    import json

    chars = [_char("a", 50, 100, idx=0), _char("b", 55, 100, idx=1),
             _char("c", 65, 100, idx=2), _char("d", 70, 100, idx=3),
             _char("e", 50, 112, idx=4), _char("f", 55, 112, idx=5)]
    cap, _, _ = _caption_chars("Figure 9: map", 210, 10)
    layout = [
        {"bbox": [45, 95, 200, 130], "label": "text", "index": 0},
        {"bbox": [45, 205, 320, 225], "label": "image_caption", "index": 1},
        {"bbox": [45, 230, 320, 330], "label": "image", "index": 2},
    ]
    out = extract_turn(json.dumps(_page(chars + cap, layout)), "pdf_reader")
    middle = json.loads(out["middle"])
    page = middle["pdf_info"][0]
    tb = [b for b in page["para_blocks"] if b["type"] == "text"][0]
    assert len(tb["lines"]) == 2          # "ab cd" / "ef"
    for ln in tb["lines"]:
        assert len(ln["bbox"]) == 4
        assert ln["spans"], "line without span records"
        for s in ln["spans"]:
            assert set(s) == {"bbox", "content", "type"}
            assert len(s["bbox"]) == 4
    assert tb["lines"][0]["spans"][0]["content"] == "ab cd"
    assert tb["lines"][1]["spans"][0]["content"] == "ef"

    img_mid = [b for b in page["para_blocks"] if b["type"] == "image"][0]
    path = img_mid["img_path"]
    assert path.startswith("images/") and path.endswith(".jpg")
    assert len(path) == len("images/") + 64 + len(".jpg")
    assert f"![]({path})" in out["md"]
    cl_img = [i for i in json.loads(out["content_list"])
              if i["type"] == "image"][0]
    assert cl_img["img_path"] == path
    v2_img = [i for pg in json.loads(out["content_list_v2"]) for i in pg
              if i["type"] == "image"][0]
    assert v2_img["content"]["image_source"]["path"] == path


def test_punct_run_ocr_route():
    text = "...." * 30  # 120 punct chars in runs
    chars, _, _ = _caption_chars(text, 100, 0)
    layout = [{"bbox": [45, 95, 700, 130], "label": "text", "index": 0}]
    _, _, m = extract_pdf(_page(chars, layout))
    assert m["ocr_fallback"] == 1


def test_classification_cascade_c2_c8():
    # C2: extreme page aspect
    pg = {"pages": [{"page_idx": 0, "page_size": [2000.0, 100.0],
                     "chars": [], "layout": []}]}
    _, _, m = extract_pdf(pg)
    assert m["ocr_fallback"] == 1
    # C8: three scripts heavily mixed
    chars = []
    for k, c in enumerate("abcdefgh"):
        chars.append(_char(c, 50 + 5 * k, 100, idx=k))
    for k, c in enumerate("αβγδεζηθ"):
        chars.append(_char(c, 50 + 5 * k, 112, idx=10 + k))
    for k, c in enumerate("абвгдежз"):
        chars.append(_char(c, 50 + 5 * k, 124, idx=20 + k))
    chars = chars * 4  # dedup-safe? same positions → dup! offset instead
    chars = []
    j = 0
    for row, text in enumerate(("abcdefgh", "αβγδεζηθ", "абвгдежз") * 3):
        for k, c in enumerate(text):
            chars.append(_char(c, 50 + 5 * k, 100 + 12 * row, idx=j)); j += 1
    layout = [{"bbox": [45, 95, 300, 250], "label": "text", "index": 0}]
    _, _, m = extract_pdf(_page(chars, layout))
    assert m["ocr_fallback"] == 1


def test_e7_span_fill_straddling_stop_char():
    """E7 (span_pre_proc.py:453-486): a '.' whose center-x lies OUTSIDE
    span 1 still enters it through the stop-flag right-edge rule — even
    though center-in-bbox assignment would give it to the adjacent span."""
    import numpy as np
    from mineru_spark.kernels.charstream import (PageCols,
                                                 fill_chars_into_spans)
    chars = [_char(c, 50 + 5 * k, 100, idx=k) for k, c in enumerate("word")]
    # '.' at x 69.5-74.5 → center 72 > span1 right edge (70.5); its x0 is
    # within span-height (10) of that edge → stop-flag acceptance
    chars.append(_char(".", 69.5, 100, idx=4))
    chars.append(_char("n", 76, 100, idx=5))
    pc = PageCols(chars)
    sel = np.arange(pc.n)
    span1 = [50.0, 100.0, 70.5, 110.0]
    span2 = [71.0, 100.0, 95.0, 110.0]
    filled, n_empty, assigned = fill_chars_into_spans(
        pc, sel, [span1, span2], 10.0)
    by_box = {tuple(b): [pc.glyphs[i] for i in idxs] for b, idxs in filled}
    assert by_box[tuple(span1)] == ["w", "o", "r", "d", "."]
    assert by_box[tuple(span2)] == ["n"]
    assert assigned.all()


def test_e7_empty_span_and_unassigned_drop():
    import json
    from mineru_spark.kernels.oracle import extract_turn
    chars = [_char(c, 50 + 5 * k, 100, idx=k) for k, c in enumerate("hello")]
    # a stray char far below every span: dropped (exists in no span)
    chars.append(_char("z", 50, 400, idx=99))
    layout = [{"bbox": [45, 95, 300, 130], "label": "text", "index": 0,
               "spans": [[50.0, 100.0, 80.0, 110.0],          # holds hello
                         [50.0, 150.0, 200.0, 160.0]]}]       # empty → OCR
    out = extract_turn(json.dumps(_page(chars, layout)), "pdf_reader")
    assert out["md"] == "hello"            # 'z' dropped, empty span empty
    assert out["metrics"]["spans_need_ocr"] == 1


def test_e10_pua_span_flagged():
    """E10 (span_pre_proc.py:388-430): a PUA run ≥2 inside a span flags it
    for post-OCR; a single isolated PUA char does not."""
    import json
    from mineru_spark.kernels.oracle import extract_turn

    def payload(n_pua):
        chars = [_char(c, 50 + 5 * k, 100, idx=k)
                 for k, c in enumerate("normal text here")]
        for k in range(n_pua):
            chars.append(_char(chr(0xE000 + k), 150 + 5 * k, 100,
                               idx=50 + k))
        layout = [{"bbox": [45, 95, 300, 115], "label": "text", "index": 0,
                   "spans": [[50.0, 100.0, 135.0, 110.0],
                             [148.0, 100.0, 165.0, 110.0]]}]
        return json.dumps(_page(chars, layout))

    out = extract_turn(payload(3), "pdf_reader")
    assert out["metrics"]["spans_need_ocr"] == 1
    out1 = extract_turn(payload(1), "pdf_reader")
    assert out1["metrics"]["spans_need_ocr"] == 0


def test_e7_vertical_span_fill():
    """A span taller than 2.3× median and 2.3× its width fills via the
    vertical assembler (span_pre_proc.py:94, right→left columns)."""
    import json
    from mineru_spark.kernels.oracle import extract_turn
    chars = [_char(c, 50 + 5 * (k % 2), 100 + 12 * (k // 2), idx=k)
             for k, c in enumerate("abcdef")]
    vchars = [_char(ch, 500, 100 + 12 * k, idx=50 + k)
              for k, ch in enumerate("语言模型")]
    layout = [
        {"bbox": [45, 95, 300, 140], "label": "text", "index": 0,
         "spans": [[50.0, 100.0, 60.0, 110.0],
                   [50.0, 112.0, 60.0, 122.0],
                   [50.0, 124.0, 60.0, 134.0]]},
        {"bbox": [495, 95, 515, 160], "label": "text", "index": 1,
         "spans": [[498.0, 98.0, 512.0, 150.0]]},
    ]
    out = extract_turn(json.dumps(_page(chars + vchars, layout)),
                       "pdf_reader")
    assert "语言模型" in out["md"]
    assert "ab" in out["md"]


def _body_block(n_rows=6, ncols=20):
    """A healthy text page: n_rows x ncols plain chars + its layout."""
    chars = []
    j = 0
    for r in range(n_rows):
        for k in range(ncols):
            chars.append(_char("abcdefghij"[k % 10], 50 + 5 * k,
                               100 + 12 * r, idx=j))
            j += 1
    layout = [{"bbox": [45, 95, 200, 100 + 12 * n_rows],
               "label": "text", "index": 0}]
    return chars, layout


def test_c4_unicode_map_errors():
    chars, layout = _body_block()
    for k, c in enumerate(chars):
        if k % 20 == 0:
            c["map_err"] = True  # 5% ≥ 4% threshold
    _, _, m = extract_pdf(_page(chars, layout))
    assert m["ocr_fallback"] == 1
    chars2, layout2 = _body_block()
    chars2[0]["map_err"] = True  # 1/120 < 4%
    _, _, m2 = extract_pdf(_page(chars2, layout2))
    assert m2["ocr_fallback"] == 0


def test_c5_cid_font_without_tounicode():
    chars, layout = _body_block()
    for c in chars[:40]:  # 40 ≥ 30 and 40/120 ≥ 1%
        c["font"] = {**c["font"], "name": "CIDX", "cid": True,
                     "to_unicode": False}
    _, _, m = extract_pdf(_page(chars, layout))
    assert m["ocr_fallback"] == 1
    chars2, layout2 = _body_block()
    for c in chars2[:20]:  # 20 < 30 count gate
        c["font"] = {**c["font"], "name": "CIDX", "cid": True,
                     "to_unicode": False}
    _, _, m2 = extract_pdf(_page(chars2, layout2))
    assert m2["ocr_fallback"] == 0


def test_c6_latin_charset_cjk():
    chars, layout = _body_block()
    for k in range(35):
        chars.append(_char(chr(0x4E00 + k), 50 + 10 * (k % 20),
                           300 + 12 * (k // 20), idx=1000 + k))
        chars[-1]["font"] = {**chars[-1]["font"], "name": "LatinCS",
                             "charset": "latin", "to_unicode": True}
    _, _, m = extract_pdf(_page(chars, layout))
    assert m["ocr_fallback"] == 1
    # same font but Latin glyphs → not triggered
    chars2, layout2 = _body_block()
    for k in range(35):
        chars2.append(_char("abcde"[k % 5], 50 + 10 * (k % 20),
                            300 + 12 * (k // 20), idx=1000 + k))
        chars2[-1]["font"] = {**chars2[-1]["font"], "name": "LatinCS",
                              "charset": "latin", "to_unicode": True}
    _, _, m2 = extract_pdf(_page(chars2, layout2))
    assert m2["ocr_fallback"] == 0


def test_c11_image_coverage():
    chars, layout = _body_block()
    layout = layout + [{"bbox": [0, 0, 581.4, 712.8],  # 0.95w × 0.9h ≥ 0.8
                        "label": "image", "index": 1}]
    _, _, m = extract_pdf(_page(chars, layout))
    assert m["ocr_fallback"] == 1
    small = layout[:1] + [{"bbox": [100, 100, 400, 400],
                           "label": "image", "index": 1}]
    _, _, m2 = extract_pdf(_page(chars, small))
    assert m2["ocr_fallback"] == 0


def test_d1_list_classification():
    from mineru_spark.kernels.charstream import is_list_block
    assert is_list_block(["1. alpha", "2. beta", "3. gamma"])
    assert not is_list_block(["• a", "• b", "• c", "plain"])  # 3/4 < 0.8
    assert not is_list_block(["one line", "two line", "three line"])
    l1, _, j = _caption_chars("1. alpha beta", 100, 0)
    l2, _, j = _caption_chars("2. gamma", 112, j)
    l3, _, _ = _caption_chars("3. delta", 124, j)
    layout = [{"bbox": [45, 95, 300, 140], "label": "text", "index": 0}]
    blocks, _, _ = extract_pdf(_page(l1 + l2 + l3, layout))
    assert blocks[0]["type"] == "list"
    assert blocks_to_md(blocks) == "1. alpha beta  \n2. gamma  \n3. delta"


def test_pptx_route():
    import json
    payload = {"kind": "pptx_shapes", "slides": [{
        "slide_idx": 0, "size": [960, 540], "shapes": [
            {"bbox": [500, 120, 880, 400], "kind": "body",
             "text": "right col."},
            {"bbox": [80, 30, 880, 80], "kind": "title", "text": "Deck"},
            {"bbox": [80, 120, 460, 400], "kind": "bullets",
             "text": "• one\n• two"},
        ]}]}
    out = extract_turn(json.dumps(payload), "file_reader")
    assert out["route"] == "pptx"
    assert out["md"] == "## Deck\n\n- one\n- two\n\nright col."


def test_pptx_group_table_notes():
    """O2 fidelity: group shapes flatten with composed transforms, table
    shapes render via the grid algebra, speaker notes become
    page_footnote blocks (kept in content_list, dropped from md)."""
    import json
    payload = {"kind": "pptx_shapes", "slides": [{
        "slide_idx": 0, "size": [960, 540],
        "notes": ["remember  the demo."],
        "shapes": [
            {"bbox": [80, 30, 880, 80], "kind": "title", "text": "Deck"},
            {"kind": "group", "offset": [80.0, 120.0], "scale": [1.0, 1.0],
             "shapes": [{"bbox": [0, 0, 380, 120], "kind": "body",
                         "text": "grouped text."}]},
            {"bbox": [500, 120, 880, 400], "kind": "table",
             "html": "<table><tr><th>h</th></tr><tr><td>v</td></tr></table>"},
        ]}]}
    out = extract_turn(json.dumps(payload), "file_reader")
    assert out["route"] == "pptx"
    assert out["md"] == ("## Deck\n\ngrouped text.\n\n"
                         "<table><tr><th>h</th></tr><tr><td>v</td></tr>"
                         "</table>")
    cl = json.loads(out["content_list"])
    assert cl[-1] == {"type": "page_footnote", "page_idx": 0,
                      "bbox": [0, 0, 0, 0], "text": "remember the demo."}
    assert "remember the demo." not in out["md"]


def test_docx_route_styled_runs():
    import json
    payload = {"kind": "docx_runs", "paras": [
        {"style": "Heading1", "runs": [{"text": "Doc Title"}]},
        {"style": "Normal", "runs": [
            {"text": "plain start "}, {"text": "bold bit", "bold": True},
            {"text": " more", "bold": True}]},
        {"style": "Normal", "runs": [
            {"text": "mixed ", "bold": True},
            {"text": "it_x", "italic": True}]},
        {"style": "ListParagraph", "runs": [{"text": "first"}]},
        {"style": "ListParagraph", "runs": [{"text": "second"}]},
        {"style": "Normal", "runs": [{"text": "after list"}]},
    ]}
    out = extract_turn(json.dumps(payload), "file_reader")
    assert out["route"] == "docx"
    # runs carry their own whitespace and concatenate directly; two
    # same-key bold runs group into ONE wrapper
    # (_append_markdown_grouped_text_parts, inline_renderer.py:753-790);
    # a block mixing TWO distinct markdown style keys (bold + italic)
    # switches to HTML inline syntax (_select_block_inline_syntax
    # :559-582) with edge whitespace outside the tags
    assert out["md"] == ("# Doc Title\n\n"
                         "plain start **bold bit more**\n\n"
                         "<strong>mixed</strong> <em>it\\_x</em>\n\n"
                         "- first\n- second\n\n"
                         "after list")


def test_docx_numbering_chain_toc_omml():
    """O1 fidelity: per-(numId, ilvl) counters continue across
    interruptions (docx_converter.py:96-114), hidden TOC page-number runs
    are dropped (:375-388), TOC paragraphs become an index block
    (:1419-1432), OMML runs render as inline math (:1237)."""
    from mineru_spark.kernels.docx import extract_docx
    p = {"paras": [
        {"style": "TOC", "anchor": "_Toc10000001",
         "runs": [{"text": "Intro"}, {"text": "3", "hidden": True}]},
        {"style": "ListParagraph", "num": {"id": 5, "ilvl": 0,
                                           "ordered": True},
         "runs": [{"text": "one"}]},
        {"style": "ListParagraph", "num": {"id": 5, "ilvl": 1,
                                           "ordered": True},
         "runs": [{"text": "sub"}]},
        # interruption is a HEADING: it counts as neither list nor body
        # content in the heading-numid pre-scan (:2727-2733), so the
        # multi-level chain stays a LIST and its counters continue
        {"style": "Heading2", "runs": [{"text": "break."},
                                       {"math": "E=mc^2"}]},
        {"style": "ListParagraph", "num": {"id": 5, "ilvl": 0,
                                           "ordered": True},
         "runs": [{"text": "two continues"}]},
    ]}
    blocks, _ = extract_docx(p)
    assert [b["type"] for b in blocks] == ["index", "list", "title", "list"]
    # hidden page number gone; the anchor mounts as an internal link
    assert blocks[0]["text"] == "- [Intro](#_Toc10000001)"
    assert blocks[1]["text"] == "1. one\n    1. sub"
    assert "$E=mc^2$" in blocks[2]["text"]
    assert blocks[3]["text"] == "2. two continues"  # chain continued
    assert blocks[1]["attribute"] == "ordered"


def test_docx_table_para_kind():
    """O1 tables (reference renders DOCX tables via the mammoth HTML path
    with vMerge/gridSpan spans and equation injection,
    docx_converter.py:960-1122, :1125-1236): the Table para kind flows
    through the shared grid algebra into canonical table HTML, and the md
    rendering keeps the table body as HTML (reference e2e table
    assertions, tests/unittest/test_e2e.py:181-199 analog)."""
    import json

    from mineru_spark.kernels.docx import extract_docx

    p = {"paras": [
        {"style": "Heading1", "runs": [{"text": "Doc"}]},
        {"style": "ListParagraph", "runs": [{"text": "item"}]},
        {"style": "Table", "rows": [
            [{"text": "H1", "header": True}, {"text": "H2", "header": True}],
            [{"text": "a", "rowspan": 2}, {"text": "b"}],
            [{"text": "c"}],
            [{"text": "wide", "colspan": 2, "math": r"x^2"}],
        ]},
        {"style": "Normal", "runs": [{"text": "after."}]},
    ]}
    blocks, m = extract_docx(p)
    # the table interrupts (flushes) the pending list
    assert [b["type"] for b in blocks] == ["title", "list", "table", "text"]
    assert m["tables_parsed"] == 1
    html = blocks[2]["text"]
    assert html.startswith("<table>")
    assert "<th>H1</th>" in html
    assert 'rowspan="2"' in html and 'colspan="2"' in html
    assert "$x^2$" in html
    # end-to-end: same table HTML lands in md / content_list
    out = extract_turn(json.dumps({"kind": "docx_runs", **p}), "file_reader")
    assert out["route"] == "docx"
    assert html in out["md"]
    assert json.loads(out["content_list"])[2]["table_body"] == html


def test_xlsx_sheet_cells_route():
    """O3 sheet-cell route (reference xlsx_converter.py): flood-fill
    DataRegion detection with gap tolerance 1, merged-cell anchor spans
    with hidden cells skipped, empty in-bbox positions kept, far-away
    singleton as TEXT, sheet titles only when >1 sheet has content,
    first region row as header cells."""
    import json

    from mineru_spark.kernels.xlsx import extract_xlsx

    sheet1 = {"name": "Revenue", "cells": [
        # header row with a 2-wide merge anchored at (0,1)
        {"r": 0, "c": 0, "v": "Region"}, {"r": 0, "c": 1, "v": "H1+H2"},
        # data rows; (1,2)/(2,1) intentionally blank — (2,2) is only
        # reachable by crossing the (2,1) hole with gap tolerance 1
        {"r": 1, "c": 0, "v": "north"}, {"r": 1, "c": 1, "v": "10"},
        {"r": 2, "c": 0, "v": "south"},
        {"r": 2, "c": 2, "v": "20"},
        # singleton note 5 rows away: own 1×1 region → text block
        {"r": 8, "c": 0, "v": "totals audited"},
    ], "merges": [[0, 1, 0, 2]]}
    sheet2 = {"name": "Notes", "cells": [
        {"r": 0, "c": 0, "v": "n1"}, {"r": 0, "c": 1, "v": "n2"},
        {"r": 1, "c": 0, "v": "a"}, {"r": 1, "c": 1, "v": "b"},
    ], "merges": []}
    payload = {"kind": "xlsx_cells", "sheets": [sheet1, sheet2]}
    blocks, m = extract_xlsx(payload)
    kinds = [(b["type"], b["page_idx"]) for b in blocks]
    # >1 sheet with content → title per sheet; main table + singleton text
    assert kinds == [("title", 0), ("table", 0), ("text", 0),
                     ("title", 1), ("table", 1)]
    assert m["tables_parsed"] == 2
    html = blocks[1]["text"]
    assert 'colspan="2"' in html           # merge anchor span
    assert "<th>Region</th>" in html       # first region row = header
    assert "<td></td>" in html             # in-bbox empty position kept
    assert "north" in html and "20" in html  # gap-1 hole crossed
    assert blocks[2]["text"] == "totals audited"

    # single-sheet payload: no title blocks (reference :297-307)
    blocks1, _ = extract_xlsx({"sheets": [sheet2]})
    assert [b["type"] for b in blocks1] == ["table"]

    # end-to-end through the route cascade
    out = extract_turn(json.dumps(payload), "file_reader")
    assert out["route"] == "xlsx"
    assert "# Revenue" in out["md"] and 'colspan="2"' in out["md"]


def test_xlsx_semantic_subset_filter():
    """A region whose semantic cells are a strict subset of another's is
    dropped (reference _filter_semantic_subset_tables :780-798): here the
    small region's cells all fall inside the big region's bbox walk."""
    from mineru_spark.kernels.xlsx import _sheet_tables

    # big L-shaped region whose bbox covers the small one entirely
    cells = {(0, 0): "a", (0, 3): "b", (1, 0): "c", (1, 3): "d"}
    # flood fill with gap 1 connects columns 0 and 3?  no — distance is 3;
    # the two column pairs become two regions, each's bbox walk holding
    # only its own cells → no subset relation, both kept
    tabs = _sheet_tables(cells, [])
    assert len(tabs) == 2
    chars = ([_char(c, 50 + 5 * k, 100, idx=k) for k, c in enumerate("cost")]
             + [{**_char(c, 80 + 5 * k, 100, idx=10 + k),
                 "font": {"name": "Math", "size": 10.0, "flags": 0,
                          "weight": 400}} for k, c in enumerate("x+y")]
             + [_char(c, 100 + 5 * k, 100, idx=20 + k)
                for k, c in enumerate("here.")])
    layout = [{"bbox": [45, 95, 300, 130], "label": "text", "index": 0}]
    blocks, spans, _ = extract_pdf(_page(chars, layout))
    assert blocks[0]["text"] == "cost $x+y$ here."
    assert any(s["type"] == "inline_equation" for s in spans)


def test_docx_hyperlink_runs():
    """O1 hyperlinks (r4 directive #2): link runs render as [label](url)
    with the reference's escaping — label brackets escaped
    (docx_converter.py:209-222), URL parens %-encoded (:226-240) —
    consecutive same-target runs group into ONE link with per-run styling
    kept inside the label (office_rich_text.py:195-228,
    inline_renderer.py:830-842), and invalid targets (blank / '.')
    degrade to plain styled text (office_rich_text.py:172-192)."""
    from mineru_spark.kernels.docx import extract_docx
    p = {"paras": [
        {"style": "Normal", "runs": [
            {"text": "see "},
            {"text": "the docs", "link": "https://ex.org/p(1)?q=2"},
            {"text": " now."}]},
        {"style": "Normal", "runs": [
            {"text": "Part ", "bold": True, "link": "https://ex.org/a"},
            {"text": "two", "link": "https://ex.org/a"},
            {"text": " done."}]},
        {"style": "Normal", "runs": [
            {"text": "click [here]", "link": "https://ex.org/b"}]},
        {"style": "Normal", "runs": [
            {"text": "dead link ", "link": "."},
            {"text": "blank", "bold": True, "link": "  "}]},
        {"style": "Normal", "runs": [
            {"text": "uniform ", "bold": True, "link": "https://ex.org/u"},
            {"text": "bold", "bold": True, "link": "https://ex.org/u"},
            {"text": " tail."}]},
    ]}
    blocks, _ = extract_docx(p)
    texts = [b["text"] for b in blocks]
    assert texts[0] == "see [the docs](https://ex.org/p%281%29?q=2) now."
    # MIXED-style children force the whole block to HTML inline syntax
    # (_hyperlink_requires_html, inline_renderer.py:494-516: a bold and
    # a plain child are two distinct style keys)
    assert texts[1] == ('<a href="https://ex.org/a"><strong>Part</strong> '
                        "two</a> done.")
    assert texts[2] == "[click \\[here\\]](https://ex.org/b)"
    # invalid targets: plain styled text, no link syntax
    assert texts[3] == "dead link **blank**"
    # uniform-style children keep markdown link syntax with ONE wrapper
    assert texts[4] == "[**uniform bold**](https://ex.org/u) tail."
    # typed v2 records carry the hyperlink runs
    recs = blocks[0]["_runs"]
    assert ("hyperlink", "the docs", "https://ex.org/p(1)?q=2") in recs
    assert recs[0] == ("text", "see")


def test_docx_hyperlink_v2_runs():
    """The typed link/style records surface in content_list_v2 as typed
    span runs (hyperlink runs with url, styled text runs with a style
    list), not the old single-text fallback (r4 directive #4)."""
    import json
    payload = {"kind": "docx_runs", "paras": [
        {"style": "Normal", "runs": [
            {"text": "go", "bold": True},
            {"text": "home", "link": "https://ex.org/h"}]},
    ]}
    out = extract_turn(json.dumps(payload), "file_reader")
    v2 = json.loads(out["content_list_v2"])
    para = v2[0][0]["content"]["paragraph_content"]
    assert {"content": "go", "type": "text", "style": ["bold"]} in para
    assert {"content": "home", "type": "hyperlink",
            "url": "https://ex.org/h"} in para


def test_html_inline_runs_v2():
    """HTML blocks with inline structure carry typed v2 run records
    (bold/italic/hyperlink/equation), while plain paragraphs keep the
    single-text fallback (r4 directive #4)."""
    import json
    html = ("<html><body><article>"
            "<p>plain only paragraph here</p>"
            "<p>mix <b>bold bit</b> and <em>ital</em> plus "
            '<a href="https://x.org/r/7">ref seven</a> end</p>'
            "<h2>Head <i>leaning</i></h2>"
            "</article></body></html>")
    out = extract_turn(html, "browser")
    assert out["route"] == "html"
    v2 = json.loads(out["content_list_v2"])
    paras = [b for pg in v2 for b in pg]
    plain = paras[0]["content"]["paragraph_content"]
    assert plain == [{"content": "plain only paragraph here",
                      "type": "text"}]
    mixed = paras[1]["content"]["paragraph_content"]
    assert {"content": "bold bit", "type": "text",
            "style": ["bold"]} in mixed
    assert {"content": "ital", "type": "text", "style": ["italic"]} in mixed
    assert {"content": "ref seven", "type": "hyperlink",
            "url": "https://x.org/r/7"} in mixed
    head = paras[2]["content"]["title_content"]
    assert {"content": "leaning", "type": "text",
            "style": ["italic"]} in head


def test_xlsx_auto_gap_tolerance_split():
    """Auto gap-tolerance (r4 directive #3; reference
    xlsx_converter.py:33-35,930-974): two dense 3x3 blocks separated by
    one blank row.  Tolerance 1 fuses them (interior-blank-row penalty
    ~0.49, beyond the 0.15 margin); tolerance 0 scores 0 — the selection
    must pick 0 and emit TWO tables."""
    from mineru_spark.kernels.xlsx import extract_xlsx
    cells = []
    for rr in range(3):
        for cc in range(3):
            cells.append({"r": rr, "c": cc, "v": f"a{rr}{cc}"})
            cells.append({"r": rr + 4, "c": cc, "v": f"b{rr}{cc}"})
    blocks, m = extract_xlsx({"sheets": [{"name": "S", "cells": cells}]})
    tables = [b for b in blocks if b["type"] == "table"]
    assert len(tables) == 2
    assert "a00" in tables[0]["text"] and "b00" in tables[1]["text"]
    assert "a00" not in tables[1]["text"]


def test_xlsx_auto_gap_tolerance_bridge():
    """Label column + blank column + value column: tolerance 0 splits it
    into two row-overlapping strips (row-overlap penalty 1.0), tolerance
    1 reads ONE bridged table (~0.79) — near-best then preference 1≻0≻2
    picks tolerance 1."""
    from mineru_spark.kernels.xlsx import extract_xlsx
    cells = []
    for rr in range(5):
        cells.append({"r": rr, "c": 0, "v": f"lab{rr}"})
        cells.append({"r": rr, "c": 2, "v": str(100 + rr)})
    blocks, m = extract_xlsx({"sheets": [{"name": "S", "cells": cells}]})
    tables = [b for b in blocks if b["type"] == "table"]
    assert len(tables) == 1
    assert "lab0" in tables[0]["text"] and "104" in tables[0]["text"]


def test_xlsx_gap_candidate_scoring():
    """The candidate summary reproduces the reference's metric values on
    a handcrafted sheet (weights :936-943, summary :838-975)."""
    from mineru_spark.kernels.xlsx import (_candidate_summary,
                                           _flood_tables, _penalty)
    cells = {}
    for rr in range(3):
        for cc in range(3):
            cells[(rr, cc)] = f"a{rr}{cc}"
            cells[(rr + 4, cc)] = f"b{rr}{cc}"
    t0 = _flood_tables(cells, [], 0)
    t1 = _flood_tables(cells, [], 1)
    assert len(t0) == 2 and len(t1) == 1
    s0, s1 = _candidate_summary(t0), _candidate_summary(t1)
    assert _penalty(s0) == 0.0
    assert s1["interior_blank_line_ratio"] == 1 / 6
    assert abs(_penalty(s1) - (2.5 / 6 + 0.5 * 3 / 21)) < 1e-12
    assert s1["severe_separator_count"] == 0


def test_langid_decision_cascade():
    """Shared language-ID cascade (r4 directive #8): script ratios decide
    ko/ja/zh/ru, stopword votes decide Latin languages, zero evidence →
    'und'.  This is the SAME function emit.merge_lines gates the M2 CJK
    join on and q_doc_langid runs as SQL (oracle-checked)."""
    from mineru_spark.kernels.langid import lang_of

    assert lang_of("数据管道处理文档的系统") == "zh"
    assert lang_of("これはテストです") == "ja"          # kana outranks CJK
    assert lang_of("데이터 파이프라인 시스템") == "ko"
    assert lang_of("Это тестовая строка") == "ru"
    assert lang_of("the cat and the dog of the house") == "en"
    assert lang_of("der Hund und die Katze ist da") == "de"
    assert lang_of("le chat et la maison est grande") == "fr"
    assert lang_of("el perro y los gatos es grande") == "es"
    assert lang_of("zxcv qwerty asdf") == "und"
    assert lang_of("") == "und"


def test_merge_lines_block_level_cjk():
    """M2 join is block-level like the reference's detect_lang gate
    (pipeline_middle_json_mkcontent.py:305-311, CJK_LANGS :221): a
    majority-CJK paragraph joins ALL its line boundaries without a
    separator, including a trailing Latin fragment."""
    from mineru_spark.kernels import emit

    assert emit.merge_lines(["数据管道分析系统的文档",
                             "with spark"]) == "数据管道分析系统的文档with spark"
    # majority-Latin stays western-joined even with a CJK fragment
    assert emit.merge_lines(["the analysis of the pipeline system",
                             "数据"]) == "the analysis of the pipeline system 数据"


def test_guess_code_lang_token_classifier():
    """B12 (r4 directive #7): the token-weight classifier identifies ≥5
    languages deterministically and returns '' when unsure (the magika
    stand-in's DEFAULT_LANG fallback, guess_suffix_or_lang.py:73-85)."""
    from mineru_spark.kernels.langid import guess_code_lang

    assert guess_code_lang(
        "def load(path):\n    return None if not path else open(path)"
    ) == "python"
    assert guess_code_lang(
        "SELECT a, b FROM t WHERE x > 1 GROUP BY a HAVING count(*) > 2"
    ) == "sql"
    assert guess_code_lang(
        "const f = (x) => { console.log(typeof x); };"
    ) == "javascript"
    assert guess_code_lang(
        "public static void main(String[] args) { System.out.println(1); }"
    ) == "java"
    assert guess_code_lang(
        '#include <stdio.h>\nint main() { printf("hi"); return 0; }'
    ) == "c"
    assert guess_code_lang(
        'func main() {\n  defer f.Close()\n  if err != nil { fmt.Println(err) }\n}'
    ) == "go"
    assert guess_code_lang(
        'pub fn run() { let mut v = Vec::new(); println!("{}", 1); }'
    ) == "rust"
    assert guess_code_lang(
        '#!/bin/bash\nif [ -f "$1" ]; then echo ok; fi'
    ) == "shell"
    assert guess_code_lang("just some prose with words") == ""
    assert guess_code_lang("") == ""


def test_row_meta_segments_merge_carried_spans():
    """A carried cell with rowspan>1 AND colspan>1 renders as ONE visual
    segment in the continued row, not one per occupied column (reference
    calculate_row_rendered_segments, table_merge.py:541-565: distinct
    consecutive source markers).  ADVICE r4 low #2."""
    html = ('<table>'
            '<tr><td rowspan="2" colspan="2">wide-tall</td><td>x</td></tr>'
            '<tr><td>y</td></tr>'
            '<tr><td>a</td><td>b</td><td>c</td></tr></table>')
    grids = tbl.parse_tables(html)
    meta = tbl._row_meta(grids[0])
    # row 0: two anchors (the 2x2 cell + x) = 2 segments
    assert meta[0]["segments"] == 2
    # row 1: the carried 2-wide cell is ONE segment + anchor y = 2
    # (the old per-position count said 3)
    assert meta[1]["segments"] == 2
    assert meta[1]["carried"] == 2          # positions, unchanged
    assert meta[1]["eff"] == 3
    # row 2: three anchors
    assert meta[2]["segments"] == 3


def test_docx_full_style_chain():
    """Underline/strikethrough/super/subscript runs (r4 style-chain
    depth): pure md-expressible sets use the reference's wrappers
    (OFFICE_MARKDOWN_STYLE_WRAPPERS, inline_renderer.py:29-34), complex
    sets nest HTML tags in the reference's order (:91-117), and v2
    records carry the ordered style list."""
    import json
    payload = {"kind": "docx_runs", "paras": [
        {"style": "Normal", "runs": [
            {"text": "gone", "strikethrough": True},
            {"text": " both ", "bold": True, "italic": True},
            {"text": "under", "underline": True},
            {"text": " x2", "script": "super"},
            {"text": " h2o ", "script": "sub"},
            {"text": "bu", "bold": True, "underline": True}]},
        {"style": "Normal", "runs": [
            {"text": "cut ", "strikethrough": True},
            {"text": "also cut", "strikethrough": True}]},
        {"style": "Normal", "runs": [
            {"text": "big", "bold": True, "italic": True}]},
    ]}
    out = extract_turn(json.dumps(payload), "file_reader")
    md_blocks = out["md"].split("\n\n")
    # complex styles in the block → the WHOLE block renders with HTML
    # inline tags through the wrapper-stack renderer
    # (_select_block_inline_syntax :559-582, _render_style_range_tokens
    # :728-750; stack order emphasis>s>em>strong>u>sup/sub :688-705)
    assert md_blocks[0] == ("<s>gone</s> <em><strong>both</strong></em> "
                            "<u>under</u> <sup>x2</sup> "
                            "<sub>h2o</sub> <strong><u>bu</u></strong>")
    # single-key blocks keep the enumerable markdown wrappers, adjacent
    # same-key runs grouped into ONE wrapper
    assert md_blocks[1] == "~~cut also cut~~"
    assert md_blocks[2] == "***big***"
    v2 = json.loads(out["content_list_v2"])
    para = v2[0][0]["content"]["paragraph_content"]
    assert {"content": "gone", "type": "text",
            "style": ["strikethrough"]} in para
    assert {"content": "under", "type": "text",
            "style": ["underline"]} in para
    assert {"content": "x2", "type": "text",
            "style": ["superscript"]} in para
    assert {"content": "bu", "type": "text",
            "style": ["bold", "underline"]} in para


def test_pptx_rich_body_runs():
    """PPTX body shapes route styled/hyperlink runs through the shared
    office run machinery (reference _build_paragraph_rich_text,
    pptx_converter.py:570, over the same office_rich_text helpers as
    DOCX): md gets the styled/link rendering, v2 gets typed records."""
    import json
    payload = {"kind": "pptx_shapes", "slides": [
        {"slide_idx": 0, "size": [960, 540], "shapes": [
            {"bbox": [80, 30, 880, 80], "kind": "title", "text": "Deck"},
            {"bbox": [80, 120, 460, 400], "kind": "body", "text": "",
             "runs": [{"text": "plain bit. "},
                      {"text": "hot ", "bold": True},
                      {"text": "docs", "link": "https://ex.org/d"}]},
        ]}]}
    out = extract_turn(json.dumps(payload), "file_reader")
    assert out["route"] == "pptx"
    assert "plain bit. **hot** [docs](https://ex.org/d)" in out["md"]
    v2 = json.loads(out["content_list_v2"])
    para = [b for pg in v2 for b in pg
            if b["type"] == "paragraph"][0]["content"]["paragraph_content"]
    assert {"content": "hot", "type": "text", "style": ["bold"]} in para \
        or ("bold", "hot") in [(r.get("style", [None])[0], r["content"])
                               for r in para if r.get("style")]
    assert {"content": "docs", "type": "hyperlink",
            "url": "https://ex.org/d"} in para


def test_docx_hostile_run_payloads():
    """Hostile run fields degrade, never raise and never leak non-string
    link targets into []() syntax (job-level never-raise guarantee)."""
    import json
    p = {"kind": "docx_runs", "paras": [{"style": "Normal", "runs": [
        {"text": 5, "link": {"a": 1}}, {"link": None, "text": "x"},
        {"math": None}, {"text": "z", "link": ["arr"]},
        {"text": "y", "script": 42}, "junk", None]}]}
    out = extract_turn(json.dumps(p), "file_reader")
    assert out["route"] == "docx"
    # runs concatenate directly (no separator injection): hostile
    # non-string fields degrade to their text content only
    assert out["md"] == "5xzy"


def test_office_and_html_image_blocks():
    """Inline images across the office/html routes: docx image runs
    (deduped per rel_id, sha256-of-bytes path — reference picture refs →
    IMAGE blocks, docx_converter.py:1605-1663), pptx picture shapes, and
    html content <img> (source kept as the path); invalid base64
    degrades to no block."""
    import base64
    import hashlib
    import json

    blob = b"fake-image-bytes" * 4
    b64 = base64.b64encode(blob).decode()
    want = f"images/{hashlib.sha256(blob).hexdigest()}.jpg"

    docx = {"kind": "docx_runs", "paras": [
        {"style": "Normal", "runs": [
            {"text": "before."},
            {"image": {"data_b64": b64, "rel_id": "rId1"}},
            {"image": {"data_b64": b64, "rel_id": "rId1"}},  # dup rel id
            {"image": {"data_b64": "!!!notb64"}}]},          # degrades
    ]}
    out = extract_turn(json.dumps(docx), "file_reader")
    assert out["md"].count(f"![]({want})") == 1
    cl = json.loads(out["content_list"])
    assert [b for b in cl if b["type"] == "image"][0]["img_path"] == want

    pptx = {"kind": "pptx_shapes", "slides": [
        {"slide_idx": 0, "size": [960, 540], "shapes": [
            {"bbox": [80, 30, 880, 80], "kind": "title", "text": "T"},
            {"bbox": [80, 120, 460, 400], "kind": "image",
             "data_b64": b64}]}]}
    out = extract_turn(json.dumps(pptx), "file_reader")
    assert f"![]({want})" in out["md"]

    html = ('<html><body><article><p>some text here</p>'
            '<img src="https://x.org/p.png" alt="f"><p>more text</p>'
            '</article></body></html>')
    out = extract_turn(html, "browser")
    assert "![](https://x.org/p.png)" in out["md"]


def test_langid_split_matches_sql_twin():
    """lang_of tokenizes on SPACE runs only, like the SQL twin's
    split(trim(text), ' +') — newline/tab-joined stopwords are ONE token
    to both engines (code-review r4 fix)."""
    from mineru_spark.kernels.langid import lang_of

    assert lang_of("et\nest\nle") == "und"          # one token, no hits
    assert lang_of("le chat et la maison est la") == "fr"
    # r5 ADVICE fix: Python str.strip() strips ALL Unicode whitespace but
    # the SQL twins trim() only spaces — '\nthe ...' must keep its leading
    # newline glued to the first token in BOTH engines
    assert lang_of("\nthe cat and dog in the box") == \
        lang_of("Xthe cat and dog in the box")  # '\nthe'/'Xthe' both miss
    assert lang_of("  the and of to  ") == "en"  # spaces still stripped


def test_oracle_json_fallback_matches_orjson():
    """The stdlib JSON fallback must behave bit-for-bit like orjson —
    reject NaN/Infinity literals, overflow-to-inf floats and lone
    surrogates; parse >64-bit integers as LOSSY doubles — so the same
    payload parses or degrades identically on stdlib-only and orjson
    nodes (r5 ADVICE fix — cross-environment golden-hash stability)."""
    import pytest

    from mineru_spark.kernels.oracle import _strict_loads_stdlib

    bads = ('{"a": NaN}', '{"a": Infinity}', '[-Infinity]',
            '{"f": 1e400}',                      # double overflow
            '{"s": "\\ud800"}')                  # lone surrogate
    for bad in bads:
        with pytest.raises((ValueError, TypeError)):
            _strict_loads_stdlib(bad)
    oks = (
        # full 64-bit window exact; outside it lossy double, like orjson
        '{"n": 18446744073709551615, "m": -9223372036854775808}',
        '{"big": 18446744073709551616, "neg": -9223372036854775809}',
        '{"s": "\\ud83d\\ude00", "f": 1.5, "b": true, "x": null}',
    )
    parsed = [_strict_loads_stdlib(s) for s in oks]
    assert parsed[0]["n"] == 2**64 - 1 and isinstance(parsed[0]["n"], int)
    assert isinstance(parsed[1]["big"], float)   # lossy wide-int parse
    assert parsed[2]["s"] == "😀"
    try:
        import orjson
    except ImportError:
        pass
    else:
        for s, p in zip(oks, parsed):
            assert orjson.loads(s) == p
        for bad in bads:
            with pytest.raises((ValueError, TypeError)):
                orjson.loads(bad)  # JSONDecodeError subclasses ValueError


def test_docx_list_images_follow_their_list():
    """An image run inside a list paragraph lands AFTER the flushed list
    block, like the Normal-paragraph path (code-review r4 fix)."""
    import base64
    from mineru_spark.kernels.docx import extract_docx

    b64 = base64.b64encode(b"img-bytes").decode()
    p = {"paras": [
        {"style": "ListParagraph",
         "runs": [{"text": "item one"}, {"image": {"data_b64": b64}}]},
        {"style": "ListParagraph", "runs": [{"text": "item two"}]},
        {"style": "Normal", "runs": [{"text": "after"}]},
    ]}
    blocks, _ = extract_docx(p)
    assert [b["type"] for b in blocks] == ["list", "image", "text"]


def test_docx_whitespace_padded_dot_link_degrades():
    """' . ' is as invalid a link target as '.' — validity and the URL
    renderer must agree on stripping (code-review r4 fix)."""
    import json
    p = {"kind": "docx_runs", "paras": [
        {"style": "Normal", "runs": [{"text": "x", "link": " . "}]}]}
    assert extract_turn(json.dumps(p), "file_reader")["md"] == "x"


def test_fast_median_matches_numpy_exactly():
    import numpy as np
    from mineru_spark.kernels.charstream import _median

    rng = np.random.default_rng(7)
    for _ in range(500):
        a = rng.normal(size=int(rng.integers(1, 50)))
        assert _median(a) == float(np.median(a))


def test_xlsx_cell_hyperlinks():
    """Cell-level hyperlinks wrap the ESCAPED cell text in <a href> in
    the canonical table HTML (reference _cell_value_to_html,
    xlsx_converter.py:1524-1553); invalid targets ('.', blank,
    non-string) degrade to plain cells, and the link survives grid
    normalization (rowspan carry)."""
    import json
    p = {"kind": "xlsx_cells", "sheets": [{"name": "S", "cells": [
        {"r": 0, "c": 0, "v": "k"}, {"r": 0, "c": 1, "v": "v"},
        {"r": 1, "c": 0, "v": "a<b", "link": "https://x.org/?a=1&b=2"},
        {"r": 1, "c": 1, "v": "dot", "link": "."},
        {"r": 2, "c": 0, "v": "tall", "link": "https://x.org/t"},
        {"r": 2, "c": 1, "v": "plain", "link": 7},
    ], "merges": [[2, 0, 3, 0]]}]}
    out = extract_turn(json.dumps(p), "file_reader")
    md = out["md"]
    assert '<td><a href="https://x.org/?a=1&amp;b=2">a&lt;b</a></td>' in md
    assert "<td>dot</td>" in md and "<td>plain</td>" in md
    assert '<td rowspan="2"><a href="https://x.org/t">tall</a></td>' in md


def test_xlsx_rich_cell_runs():
    """Styled cell runs render as nested inline font tags in the
    canonical table HTML with the reference's nesting order
    (_apply_inline_font_tags, xlsx_converter.py:1474-1496: script
    innermost, strong outermost), boundary spaces outside the tags, and
    a runs-only cell derives its plain value from the segments."""
    import json
    p = {"kind": "xlsx_cells", "sheets": [{"name": "S", "cells": [
        {"r": 0, "c": 0, "v": "metric"}, {"r": 0, "c": 1, "v": "delta"},
        {"r": 1, "c": 0, "v": "rev"},
        {"r": 1, "c": 1, "runs": [
            {"text": "up "},
            {"text": "12%", "bold": True, "underline": True}]},
        {"r": 2, "c": 0, "v": "note"},
        {"r": 2, "c": 1, "v": "x2", "runs": [
            {"text": "x"}, {"text": "2", "script": "super"}]},
    ]}]}
    out = extract_turn(json.dumps(p), "file_reader")
    md = out["md"]
    assert "<td>up <strong><u>12%</u></strong></td>" in md
    assert "<td>x<sup>2</sup></td>" in md


# ---------------------------------------------------------------------------
# O-chart: OOXML chart → HTML data table (r5 directive #1)
# ---------------------------------------------------------------------------

def test_chart_category_exact_html():
    """Category chart: [cat-axis title] + one column per series, series
    name fallback SeriesN, integral floats → int strings, ragged value
    columns pad with '', HTML-hostile text escaped (reference
    office_chart.py:314-341, :755-762, :925-946, :966-989)."""
    from mineru_spark.kernels.charts import chart_to_html

    spec = {"plot_kind": "category", "cat_axis_title": "Quarter",
            "series": [
                {"cats": ["Q1", "Q2", "Q3"], "vals": [10.0, 20.5, 30],
                 "name": "A & B <x>"},
                {"vals": [1.0, 2.0]},                 # no name, ragged
            ]}
    assert chart_to_html(spec) == (
        "<table><thead><tr><th>Quarter</th><th>A &amp; B &lt;x&gt;</th>"
        "<th>Series2</th></tr></thead><tbody>"
        "<tr><td>Q1</td><td>10</td><td>1</td></tr>"
        "<tr><td>Q2</td><td>20.5</td><td>2</td></tr>"
        "<tr><td>Q3</td><td>30</td><td></td></tr>"
        "</tbody></table>")


def test_chart_multilevel_categories_join():
    """multiLvlStrRef category levels join with ' / ', empty parts
    skipped (reference office_chart.py:649-680)."""
    from mineru_spark.kernels.charts import chart_to_html

    spec = {"plot_kind": "category",
            "series": [{"cats": [["2023", "Q1"], ["2023", ""], ["", "Q3"]],
                        "vals": [1, 2, 3], "name": "S"}]}
    html = chart_to_html(spec)
    assert "<td>2023 / Q1</td>" in html
    assert "<td>2023</td>" in html      # empty level part skipped
    assert "<td>Q3</td>" in html


def test_chart_date_axis_serials():
    """Date-axis categories are Excel serials → ISO: Windows epoch with
    the Lotus 1900 window (serial 1 = 1900-01-01, 60 = phantom Feb 29 →
    Feb 28, 61 = 1900-03-01), midday fractions render as datetimes, the
    1904 flag switches to the Mac epoch (reference office_chart.py:
    904-922; openpyxl from_excel semantics)."""
    from mineru_spark.kernels.charts import chart_to_html

    spec = {"plot_kind": "date",
            "series": [{"cats": [1, 60, 61, 45000, 45000.5],
                        "vals": [1, 2, 3, 4, 5], "name": "S"}]}
    html = chart_to_html(spec)
    for iso in ("1900-01-01", "1900-02-28", "1900-03-01",
                "2023-03-15", "2023-03-15 12:00:00"):
        assert f"<td>{iso}</td>" in html, (iso, html)
    mac = chart_to_html({"plot_kind": "date", "date_1904": True,
                         "series": [{"cats": [0, 366],
                                     "vals": [1, 2], "name": "S"}]})
    assert "<td>1904-01-01</td>" in mac and "<td>1905-01-01</td>" in mac
    # numeric STRINGS convert too (cached-XML form, :886-901)
    cached = chart_to_html({"plot_kind": "date",
                            "series": [{"cats": ["45000", "n/a"],
                                        "vals": [1, 2], "name": "S"}]})
    assert "<td>2023-03-15</td>" in cached and "<td>n/a</td>" in cached


def test_chart_scatter_shared_vs_distinct_x():
    """Scatter: equal normalized X sequences collapse to ONE X column;
    otherwise per-series '{name} X'/'{name} Y' pairs (reference
    office_chart.py:766-816)."""
    from mineru_spark.kernels.charts import chart_to_html

    shared = {"plot_kind": "scatter", "x_axis_title": "T",
              "series": [{"xs": [1, 2], "vals": [3, 4], "name": "A"},
                         {"xs": [1.0, 2.0], "vals": [5, 6], "name": "B"}]}
    html = chart_to_html(shared)   # 1 vs 1.0 normalize equal
    assert html.startswith(
        "<table><thead><tr><th>T</th><th>A</th><th>B</th>")
    assert "<tr><td>1</td><td>3</td><td>5</td></tr>" in html

    distinct = {"plot_kind": "scatter",
                "series": [{"xs": [1, 2], "vals": [3, 4], "name": "A"},
                           {"xs": [9, 8], "vals": [5, 6], "name": "B"}]}
    html2 = chart_to_html(distinct)
    assert "<th>A X</th><th>A Y</th><th>B X</th><th>B Y</th>" in html2
    # a series missing its X vector kills the scatter render entirely
    assert chart_to_html({"plot_kind": "scatter",
                          "series": [{"vals": [1, 2]}]}) == ""


def test_chart_bubble_tables():
    """Bubble: shared-X → [X, name, 'name size'] columns; distinct →
    per-series X/Y/size triples (reference office_chart.py:819-870)."""
    from mineru_spark.kernels.charts import chart_to_html

    shared = {"plot_kind": "bubble", "x_axis_title": "X",
              "series": [{"xs": [1, 2], "vals": [3, 4], "sizes": [5, 6],
                          "name": "A"}]}
    html = chart_to_html(shared)
    assert "<th>X</th><th>A</th><th>A size</th>" in html
    distinct = {"plot_kind": "bubble",
                "series": [
                    {"xs": [1], "vals": [2], "sizes": [3], "name": "A"},
                    {"xs": [9], "vals": [8], "sizes": [7], "name": "B"}]}
    html2 = chart_to_html(distinct)
    assert ("<th>A X</th><th>A Y</th><th>A size</th>"
            "<th>B X</th><th>B Y</th><th>B size</th>") in html2


def test_chart_workbook_fallback_trim():
    """No parsable series → embedded-workbook table: leading/trailing
    empty rows dropped, trailing empty cells trimmed, interior gaps
    kept, rows padded to uniform width, first band row = header
    (reference office_chart.py:65-156)."""
    from mineru_spark.kernels.charts import chart_to_html

    spec = {"plot_kind": "category", "series": [],
            "workbook": [["", ""],
                         ["Item", "N", "", ""],
                         ["a", 1, 2.0],
                         ["b", "", 3],
                         ["", ""]]}
    assert chart_to_html(spec) == (
        "<table><thead><tr><th>Item</th><th>N</th><th></th></tr></thead>"
        "<tbody><tr><td>a</td><td>1</td><td>2</td></tr>"
        "<tr><td>b</td><td></td><td>3</td></tr></tbody></table>")
    # series that render empty ALSO chain to the workbook (:166-177)
    chained = {"plot_kind": "scatter", "series": [{"vals": [1]}],
               "workbook": [["H"], ["v"]]}
    assert chart_to_html(chained) == (
        "<table><thead><tr><th>H</th></tr></thead>"
        "<tbody><tr><td>v</td></tr></tbody></table>")
    # nothing anywhere → ''
    assert chart_to_html({"plot_kind": "category", "series": []}) == ""
    assert chart_to_html(None) == ""
    assert chart_to_html({"plot_kind": "category",
                          "series": "garbage", "workbook": 7}) == ""


def test_chart_blocks_through_docx_and_pptx_routes():
    """DOCX keeps the typed chart block even when it renders empty
    (reference appends before parsing, docx_converter.py:3371-3375);
    PPTX appends only non-empty (pptx_converter.py:712-713).  All five
    encodings carry the block: md inlines the html, md_nlp drops it,
    content_list/v2/middle keep typed content."""
    import json

    from mineru_spark.kernels.oracle import extract_turn

    chart = {"plot_kind": "category",
             "series": [{"cats": ["a"], "vals": [1], "name": "S"}]}
    docx = json.dumps({"kind": "docx_runs", "paras": [
        {"style": "Normal", "runs": [{"text": "before"}]},
        {"style": "Chart", "chart": chart},
        {"style": "Chart", "chart": {"plot_kind": "category",
                                     "series": []}},   # renders ''
        {"style": "Normal", "runs": [{"text": "after"}]}]})
    out = extract_turn(docx, "file_reader")
    assert out["route"] == "docx"
    assert "<table><thead><tr><th></th><th>S</th>" in out["md"]
    assert "<table" not in out["md_nlp"]          # NLP_MD drops charts
    cl = json.loads(out["content_list"])
    charts_cl = [b for b in cl if b["type"] == "chart"]
    assert len(charts_cl) == 2                    # empty block KEPT
    assert charts_cl[0]["content"].startswith("<table>")
    assert charts_cl[0]["img_path"] == "" and charts_cl[1]["content"] == ""
    v2 = json.loads(out["content_list_v2"])
    v2charts = [b for p in v2 for b in p if b["type"] == "chart"]
    assert len(v2charts) == 2
    assert v2charts[0]["content"]["content"].startswith("<table>")
    assert v2charts[0]["content"]["image_source"] == {"path": ""}
    mid = json.loads(out["middle"])
    midcharts = [b for pg in mid["pdf_info"] for b in pg["para_blocks"]
                 if b["type"] == "chart"]
    assert len(midcharts) == 2 and midcharts[0]["content"].startswith("<t")

    pptx = json.dumps({"kind": "pptx_shapes", "slides": [
        {"slide_idx": 0, "size": [960, 540], "shapes": [
            {"bbox": [10, 10, 400, 200], "kind": "chart", "chart": chart},
            {"bbox": [10, 300, 400, 500], "kind": "chart",
             "chart": {"plot_kind": "category", "series": []}}]}]})
    out2 = extract_turn(pptx, "file_reader")
    assert out2["route"] == "pptx"
    cl2 = json.loads(out2["content_list"])
    assert len([b for b in cl2 if b["type"] == "chart"]) == 1  # empty DROPPED
    assert "<table><thead>" in out2["md"]


def test_docx_header_footer_discard_contract():
    """Section headers/footers (r5 directive #3): variant gating (even
    needs the doc-level flag, first needs the section flag), pure-digit
    filter, per-kind dedupe; blocks are ABSENT from md/md_nlp, typed in
    content_list, and land in middle's discarded_blocks (reference
    _add_header_footer, docx_converter.py:3260-3321)."""
    import json

    from mineru_spark.kernels.oracle import extract_turn

    doc = {"kind": "docx_runs",
           "paras": [{"style": "Normal", "runs": [{"text": "body text"}]}],
           "odd_even_pages": False,
           "hf_sections": [{
               "first_page": True,
               "headers": [
                   {"variant": "default",
                    "paras": [[{"text": "Annual "}, {"text": "Report"}]]},
                   {"variant": "even",
                    "paras": [[{"text": "EVEN HDR"}]]},     # gated OFF
                   {"variant": "first",
                    "paras": [[{"text": "Cover Page"}]]},
                   {"variant": "default",
                    "paras": [[{"text": "Annual "}, {"text": "Report"}]]},
               ],
               "footers": [
                   {"variant": "default", "paras": [[{"text": "42"}]]},
                   {"variant": "default",
                    "paras": [[{"text": "Confidential"}]]},
               ]}]}
    out = extract_turn(json.dumps(doc), "file_reader")
    assert out["route"] == "docx"
    assert "Annual Report" not in out["md"]
    assert "Annual Report" not in out["md_nlp"]
    cl = json.loads(out["content_list"])
    hdrs = [b["text"] for b in cl if b["type"] == "header"]
    ftrs = [b["text"] for b in cl if b["type"] == "footer"]
    assert hdrs == ["Annual Report", "Cover Page"]  # deduped, even gated
    assert ftrs == ["Confidential"]                 # '42' digit-filtered
    mid = json.loads(out["middle"])
    disc = [b for pg in mid["pdf_info"]
            for b in pg.get("discarded_blocks", [])]
    assert {(b["type"], b["text"]) for b in disc} == {
        ("header", "Annual Report"), ("header", "Cover Page"),
        ("footer", "Confidential")}
    assert out["metrics"]["blocks_discarded"] == 3
    assert out["metrics"]["blocks_classified"] == 1  # body only
    # v2 discarded-type encoding
    v2 = json.loads(out["content_list_v2"])
    v2types = [b["type"] for p in v2 for b in p]
    assert "page_header" in v2types and "page_footer" in v2types


def test_docx_textbox_inline_sorted_deduped():
    """Textbox paragraph groups (r5 directive #4): per-container
    position sort (None last), (text, pos) dedupe across containers,
    rendered INLINE at the anchor position with the shared run machinery
    (reference docx_converter.py:839-889, :3413-3462)."""
    import json

    from mineru_spark.kernels.oracle import extract_turn

    doc = {"kind": "docx_runs", "paras": [
        {"style": "Normal", "runs": [{"text": "before"}]},
        {"style": "Textbox", "containers": [
            {"paras": [
                {"pos": 200.0, "runs": [{"text": "low box"}]},
                {"pos": 10.0, "runs": [{"text": "high box",
                                        "bold": True}]},
                {"runs": [{"text": "unpositioned"}]},
                {"pos": 200.0, "runs": [{"text": "low box"}]},  # dup
            ]},
            {"paras": [
                {"pos": 10.0, "runs": [{"text": "high box",
                                        "bold": True}]},  # cross-cont dup
                {"pos": 5.0, "runs": [{"text": "other box"}]},
            ]},
        ]},
        {"style": "Normal", "runs": [{"text": "after"}]}]}
    out = extract_turn(json.dumps(doc), "file_reader")
    texts = [b["text"] for b in json.loads(out["content_list"])
             if b["type"] == "text"]
    assert texts == ["before", "**high box**", "low box", "unpositioned",
                     "other box", "after"]
    assert out["md"].index("high box") < out["md"].index("low box") \
        < out["md"].index("unpositioned") < out["md"].index("other box")


def test_docx_hierarchical_toc_index():
    """Hierarchical TOC (reference plain-TOC path docx_converter.py:
    3063-3097 + _add_index_item :2892-3015 + index rendering
    output_builders.py:164-307): base-level normalization, text-number
    level correction, page-tail strip (digits/roman/letter stripped,
    body tails kept, tabs→spaces), uniform-style collapse, TOC
    hyperlinks render visible text only, anchors mount as internal
    links, the anchor-less cover guard, and the bookmark target on the
    heading (md <a id> line + content_list/middle anchor fields).
    The _Toc22222222 entry's anchor DANGLES (no body block carries it)
    so its link is stripped by the validation pass
    (_link_index_entries_by_anchor)."""
    import json

    from mineru_spark.kernels.oracle import extract_turn

    doc = {"kind": "docx_runs", "paras": [
        # cover guard: anchor-less TOC before any entry → plain text
        {"style": "TOC", "runs": [{"text": "Cover Line"}]},
        {"style": "TOC", "ilvl": 1, "anchor": "_Toc11111111",
         "runs": [{"text": "Introduction\t3"}]},
        # ilvl 3 → norm 2, but text depth "4.1" = 1 → corrected to 1
        {"style": "TOC", "ilvl": 3,
         "runs": [{"text": "4.1 Scope\tiv"}]},
        # uniform italic split runs → ONE marker; letter page stripped
        {"style": "TOC", "ilvl": 2, "anchor": "_Toc22222222",
         "runs": [{"text": "Details ", "italic": True},
                  {"text": "of work\tB", "italic": True}]},
        # non-page tail after the tab is BODY: kept, tab → space
        {"style": "TOC", "ilvl": 1,
         "runs": [{"text": "Methods"}, {"text": " see\tchapter notes"}]},
        # hyperlink keeps visible text in the rendered item, url in v2
        {"style": "TOC", "ilvl": 1,
         "runs": [{"text": "Linked entry", "link": "https://e.org/x"}]},
        {"style": "Heading1", "anchor": "_Toc11111111",
         "runs": [{"text": "Introduction"}]},
    ]}
    out = extract_turn(json.dumps(doc), "file_reader")
    assert out["route"] == "docx"
    assert ("Cover Line\n\n"
            "- [Introduction](#_Toc11111111)\n"
            "    - 4.1 Scope\n"
            "    - *Details of work*\n"
            "- Methods see chapter notes\n"
            "- Linked entry\n\n"
            '<a id="_Toc11111111"></a>\n# Introduction') == out["md"]
    cl = json.loads(out["content_list"])
    idx = next(b for b in cl if b["type"] == "index")
    assert idx["list_items"] == [
        "- [Introduction](#_Toc11111111)",
        "    - 4.1 Scope",
        "    - *Details of work*",
        "- Methods see chapter notes",
        "- Linked entry"]
    title = next(b for b in cl if b["type"] == "title")
    assert title["anchor"] == "_Toc11111111"
    v2 = json.loads(out["content_list_v2"])
    items = next(b for b in v2[0]
                 if b["type"] == "index")["content"]["list_items"]
    assert [it["ilevel"] for it in items] == [0, 1, 1, 0, 0]
    assert items[0]["prefix"] == "-" and items[1]["prefix"] == "    -"
    assert items[0]["anchor"] == "_Toc11111111"
    assert "anchor" not in items[2]     # dangling anchor removed
    assert "anchor" not in items[3]
    # v2 keeps the typed hyperlink run with its url
    assert items[4]["item_content"] == [
        {"content": "Linked entry", "type": "hyperlink",
         "url": "https://e.org/x"}]
    mid = json.loads(out["middle"])
    paras = mid["pdf_info"][0]["para_blocks"]
    m_idx = next(b for b in paras if b["type"] == "index")
    assert m_idx["items"][0] == {"text": "Introduction", "ilevel": 0,
                                 "anchor": "_Toc11111111"}
    m_title = next(b for b in paras if b["type"] == "title")
    assert m_title["anchor"] == "_Toc11111111"


def test_xlsx_cell_anchored_images():
    """Sheet images (r5 directive #5): an image anchored in a cell a
    table consumes renders as in-cell <img> media (after text, outside
    any hyperlink); an image outside every table becomes a standalone
    image block after the sheet's artifacts (reference
    xlsx_converter.py:312-319, :609, :1064-1082)."""
    import base64
    import hashlib
    import json

    from mineru_spark.kernels.oracle import extract_turn

    blob_in, blob_out = b"in-cell-bytes", b"floating-bytes"
    sha_in = hashlib.sha256(blob_in).hexdigest()
    sha_out = hashlib.sha256(blob_out).hexdigest()
    doc = {"kind": "xlsx_cells", "sheets": [{
        "name": "S1",
        "cells": [{"r": 0, "c": 0, "v": "H1"}, {"r": 0, "c": 1, "v": "H2"},
                  {"r": 1, "c": 0, "v": "a"}, {"r": 1, "c": 1, "v": "b"}],
        "merges": [],
        "images": [
            {"r": 1, "c": 1, "data_b64":
             base64.b64encode(blob_in).decode()},
            {"r": 40, "c": 9, "data_b64":
             base64.b64encode(blob_out).decode()}]}]}
    out = extract_turn(json.dumps(doc), "file_reader")
    assert out["route"] == "xlsx"
    assert f'<td>b<img src="images/{sha_in}.jpg" /></td>' in out["md"]
    cl = json.loads(out["content_list"])
    imgs = [b for b in cl if b["type"] == "image"]
    assert len(imgs) == 1 and imgs[0]["img_path"] == f"images/{sha_out}.jpg"
    # the standalone block comes AFTER the table
    types = [b["type"] for b in cl]
    assert types.index("table") < types.index("image")


def test_xlsx_sheet_chart_interleaves_by_anchor():
    """Sheet charts re-render their source sheet RANGE as a synthetic
    table and sort among tables by cell anchor, charts after tables on
    equal anchors (reference xlsx_converter.py:322-328,
    _find_charts_in_sheet :677-708)."""
    import json

    from mineru_spark.kernels.oracle import extract_turn

    doc = {"kind": "xlsx_cells", "sheets": [{
        "name": "S1",
        "cells": [{"r": 10, "c": 0, "v": "H"}, {"r": 11, "c": 0, "v": "v"}],
        "merges": [],
        "charts": [{"r": 0, "c": 0,                       # ABOVE the table
                    "ranges": ["S1!$A$11:$A$12"]},
                   {"r": 30, "c": 0,
                    "ranges": ["Other!$A$11:$A$12"]}]}]}  # wrong sheet → skipped
    out = extract_turn(json.dumps(doc), "file_reader")
    cl = json.loads(out["content_list"])
    types = [b["type"] for b in cl]
    assert types == ["chart", "table"]   # anchor (0,0) precedes (10,0)
    # the chart table re-renders the referenced cells, display row 0 = th
    assert cl[0]["content"] == (
        "<table><tr><th>H</th></tr><tr><td>v</td></tr></table>")


def test_xlsx_chart_range_union_merge_clip_and_skips():
    """Chart source-axes semantics pinned against the reference:
    (a) a non-rectangular two-formula union materializes as the sorted
    rows×cols cross product (_collect_chart_source_axes :566-586);
    (b) a merge whose top-left is selected clips its span to the
    SELECTED rows/cols and hides the other selected members
    (_build_synthetic_table_from_sheet_selection :624-676);
    (c) quoted sheet names resolve; (d) any open-ended or unqualified
    formula skips the whole chart (:530-564)."""
    import json

    from mineru_spark.kernels.oracle import extract_turn

    cells = [{"r": 0, "c": 0, "v": "A1"}, {"r": 0, "c": 1, "v": "B1"},
             {"r": 0, "c": 2, "v": "C1"},
             {"r": 1, "c": 0, "v": "a2"}, {"r": 1, "c": 2, "v": "c2"},
             {"r": 2, "c": 0, "v": "a3"}, {"r": 2, "c": 2, "v": "c3"}]
    # merge spans cols B:C on row 0; selection takes cols A and C only
    doc = {"kind": "xlsx_cells", "sheets": [{
        "name": "S1", "cells": cells, "merges": [[0, 1, 0, 2]],
        "charts": [
            # cats = A1:A3, vals = C1:C3 → union cols {A, C}, rows 0-2;
            # the B1:C1 merge's top-left (0,1) is NOT selected → no merge
            {"r": 20, "c": 0, "ranges": ["S1!$A$1:$A$3", "S1!$C$1:$C$3"]},
            # rectangle over the merge: top-left selected, colspan clips
            # from 2 source cols to the 2 selected ones, (0,2) hidden
            {"r": 21, "c": 0, "ranges": ["'S1'!$A$1:$C$2"]},
            # open-ended → skipped even though the first formula is fine
            {"r": 22, "c": 0, "ranges": ["S1!$A$1:$A$3", "S1!$A:$C"]},
            # unqualified range (no sheet!) → skipped
            {"r": 23, "c": 0, "ranges": ["$A$1:$A$3"]}]}]}
    out = extract_turn(json.dumps(doc), "file_reader")
    cl = json.loads(out["content_list"])
    charts = [b["content"] for b in cl if b["type"] == "chart"]
    assert len(charts) == 2
    # (a) union grid: B column absent; B1's text lives under the merge
    # anchor which is unselected, so row 0 shows A1 | C1
    assert charts[0] == (
        "<table><tr><th>A1</th><th>C1</th></tr>"
        "<tr><td>a2</td><td>c2</td></tr>"
        "<tr><td>a3</td><td>c3</td></tr></table>")
    # (b) merge clipped to selection: B1 th carries colspan=2, C1 hidden
    assert charts[1] == (
        '<table><tr><th>A1</th><th colspan="2">B1</th></tr>'
        "<tr><td>a2</td><td></td><td>c2</td></tr></table>")


def test_assemble_block_fast_path_equivalence_pins():
    """The r5 uniform-role fast path of _assemble_block must agree with
    the general (sup/sub/math) path on the branch-sensitive cases:
    space splicing at word gaps, whitespace-only lines (line text ' ',
    NO span), and per-char assembly when \\r\\n glyphs disable slicing.
    Pins the exact outputs so a future fast-path edit cannot drift."""
    import numpy as np
    from mineru_spark.kernels.charstream import PageCols, _assemble_block

    def run(chars):
        pc = PageCols(chars)
        return _assemble_block(pc, np.arange(pc.n), 0)

    # two lines, a word gap on line 1 (gap > SPACE_GAP_RATIO * med width)
    chars = [_char(c, 50 + 5 * k, 100, idx=k) for k, c in enumerate("ab")]
    chars += [_char(c, 75 + 5 * k, 100, idx=2 + k) for k, c in enumerate("cd")]
    chars += [_char(c, 50 + 5 * k, 115, idx=4 + k) for k, c in enumerate("ef")]
    lines, lbb, spans = run(chars)
    assert lines == ["ab cd", "ef"]
    assert [s["type"] for s in spans] == ["text", "text"]
    assert [s["content"] for s in spans] == ["ab cd", "ef"]
    assert [s["line"] for s in spans] == [0, 1]
    # span bbox on the fast path comes from the reduceat line bboxes
    assert spans[0]["bbox"] == [50.0, 100.0, 85.0, 110.0]
    assert lbb.shape == (2, 4)

    # whitespace-only middle line: text ' ' in lines, no span emitted
    chars = [_char(c, 50 + 5 * k, 100, idx=k) for k, c in enumerate("ab")]
    chars += [_char(" ", 50, 115, idx=2)]
    chars += [_char(c, 50 + 5 * k, 130, idx=3 + k) for k, c in enumerate("cd")]
    lines, _, spans = run(chars)
    assert lines == ["ab", " ", "cd"]
    assert [s["content"] for s in spans] == ["ab", "cd"]
    assert [s["line"] for s in spans] == [0, 2]

    # \r glyph forces the per-char path inside the uniform fast path:
    # the \r is skipped, the gap space survives
    chars = [_char("a", 50, 100, idx=0), _char("\r", 55, 100, idx=1),
             _char("b", 75, 100, idx=2)]
    lines, _, spans = run(chars)
    assert lines == ["a b"]
    assert spans[0]["content"] == "a b"

    # a small trailing char (sup candidate) routes the block through the
    # GENERAL path and types the span — proving the dispatch condition
    chars = [_char(c, 50 + 5 * k, 100, idx=k) for k, c in enumerate("xy")]
    chars += [_char("2", 60, 99.0, size=6.0, idx=2)]
    lines, _, spans = run(chars)
    assert any(s["type"] == "sup" for s in spans)
    assert lines == ["xy<sup>2</sup>"]


def test_pptx_nested_lists_and_ordered_restart():
    """r5 pptx structured lists: level normalization (base level 1 → 0),
    nested ordered counters, attribute switches, and the explicit-restart
    rule (a restart whose start EQUALS the continuation number does NOT
    break the list; a different start does) — reference
    pptx_converter.py:1661-1733."""
    import json
    from mineru_spark.kernels.oracle import extract_turn

    payload = {"kind": "pptx_shapes", "slides": [{
        "slide_idx": 0, "size": [960.0, 540.0],
        "shapes": [{"bbox": [80.0, 120.0, 460.0, 400.0], "kind": "bullets",
                    "items": [
            {"text": "alpha", "level": 1, "ordered": False},
            {"text": "beta", "level": 2, "ordered": True},
            {"text": "gamma", "level": 2, "ordered": True},
            {"text": "delta", "level": 1, "ordered": False},
            {"text": "eps", "level": 2, "ordered": True,
             "start": 5, "restart": True},
            {"text": "zeta", "level": 2, "ordered": True,
             "start": 6, "restart": True},   # == continuation → no break
            {"text": "eta", "level": 2, "ordered": True,
             "start": 1, "restart": True},   # != continuation → new list
        ]}]}]}
    out = extract_turn(json.dumps(payload), "file_reader")
    assert out["md"] == ("- alpha\n"
                         "    1. beta\n"
                         "    2. gamma\n"
                         "- delta\n"
                         "    5. eps\n"
                         "    6. zeta\n"
                         "    1. eta")


def test_pptx_font_size_title_promotion():
    """r5 pptx title promotion: unique biggest all-bold block ≥ body+4
    and ≥ second-bold+2 → level-2 title; the second-tier bold ≥ body+2
    with level-2 ≥ it+2 → level-3; a DUPLICATE top bold size suppresses
    both (no unique level-2 candidate and no level-2 size to anchor
    level-3) — reference _promote_level2/3_text_blocks."""
    import json
    from mineru_spark.kernels.oracle import extract_turn

    def slide(dup_top):
        shapes = [
            {"bbox": [80.0, 120.0, 460.0, 170.0], "kind": "body",
             "text": "Big bold heading.", "font_size": 28.0,
             "all_bold": True},
            {"bbox": [80.0, 180.0, 460.0, 220.0], "kind": "body",
             "text": "Sub heading bold.", "font_size": 22.0,
             "all_bold": True},
            {"bbox": [80.0, 230.0, 460.0, 300.0], "kind": "body",
             "text": "Body text one.", "font_size": 18.0},
            {"bbox": [80.0, 310.0, 460.0, 380.0], "kind": "body",
             "text": "Body text two.", "font_size": 18.0},
        ]
        if dup_top:
            shapes.append({"bbox": [80.0, 390.0, 460.0, 430.0],
                           "kind": "body", "text": "Rival bold.",
                           "font_size": 28.0, "all_bold": True})
        return {"kind": "pptx_shapes", "slides": [
            {"slide_idx": 0, "size": [960.0, 540.0], "shapes": shapes}]}

    out = extract_turn(json.dumps(slide(False)), "file_reader")
    assert "## Big bold heading." in out["md"]
    assert "### Sub heading bold." in out["md"]
    assert "_fs" not in out["middle"] and "_ab" not in out["middle"]

    out2 = extract_turn(json.dumps(slide(True)), "file_reader")
    assert "##" not in out2["md"]          # no promotion at all
    assert "Big bold heading." in out2["md"]


def test_xlsx_cell_anchored_math():
    """Drawing-anchored OMML formulas map to cells (reference
    _map_math_formulas_to_cells xlsx_converter.py:361-444,
    _get_cell_math_formulas :710-723): the latex rides inside the cell
    as <eq> bookends AFTER text and media (:1043-1048), the middle IR
    keeps the raw bookends (magic model), and every mkcontent output
    (md, content_list, v2) unescapes them to inline ` $..$ `
    (_format_embedded_html, output_builders.py:405/:493/:627)."""
    import json

    from mineru_spark.kernels.oracle import extract_turn

    doc = {"kind": "xlsx_cells", "sheets": [{
        "name": "S1",
        "cells": [{"r": 0, "c": 0, "v": "H1"}, {"r": 0, "c": 1, "v": "H2"},
                  {"r": 1, "c": 0, "v": "a"}, {"r": 1, "c": 1, "v": "b"}],
        "merges": [],
        "maths": [{"r": 1, "c": 1, "latex": r"\frac{x}{y}"},
                  # hostile entries are skipped, never raised
                  {"r": 1}, "nope", {"r": 0, "c": 0, "latex": 7}]}]}
    out = extract_turn(json.dumps(doc), "file_reader")
    assert out["route"] == "xlsx"
    assert r"<td>b $\frac{x}{y}$ </td>" in out["md"]
    assert "<eq>" not in out["md"]
    cl = json.loads(out["content_list"])
    tbl_items = [b for b in cl if b["type"] == "table"]
    assert r"b $\frac{x}{y}$ " in tbl_items[0]["table_body"]
    # middle keeps the raw wire bookends
    mid = json.loads(out["middle"])
    mid_html = mid["pdf_info"][0]["para_blocks"][0]["html"]
    assert r"<eq>\frac{x}{y}</eq>" in mid_html
    assert "<eq>" not in out["content_list_v2"]
    v2 = json.loads(out["content_list_v2"])
    v2_tables = [b for pg in v2 for b in pg if b["type"] == "table"]
    assert r"b $\frac{x}{y}$ " in v2_tables[0]["content"]["html"]


def test_xlsx_math_semantic_and_singleton():
    """Math alone is semantic content (_cell_has_semantic_content
    :757-763): an EMPTY cell inside the region keeps its formula in the
    rendered table.  A 1x1 singleton region with an anchored formula
    must render as a TABLE, not a text block
    (_can_render_singleton_as_text :743-755).  Latex html-escapes on
    the wire and unescapes symmetrically at M6."""
    import json

    from mineru_spark.kernels.oracle import extract_turn

    doc = {"kind": "xlsx_cells", "sheets": [{
        "name": "S1",
        # L-shaped region: (1,1) has NO value, only the formula
        "cells": [{"r": 0, "c": 0, "v": "H1"}, {"r": 0, "c": 1, "v": "H2"},
                  {"r": 1, "c": 0, "v": "a"},
                  # far-away singleton note cell with its own formula
                  {"r": 20, "c": 0, "v": "note"}],
        "merges": [],
        "maths": [{"r": 1, "c": 1, "latex": "E=mc^2"},
                  {"r": 20, "c": 0, "latex": "a<b"}]}]}
    out = extract_turn(json.dumps(doc), "file_reader")
    md = out["md"]
    # empty cell made semantic by its formula
    assert "<td> $E=mc^2$ </td>" in md
    # singleton forced to a 1x1 table (not a plain text block); the
    # lone row takes the established first-row header rendering
    assert "<th>note $a<b$ </th>" in md
    cl = json.loads(out["content_list"])
    assert [b["type"] for b in cl] == ["table", "table"]
    # wire form escapes the latex; middle keeps it escaped
    assert "<eq>a&lt;b</eq>" in out["middle"]


def test_xlsx_hidden_sheet_skipped():
    """Hidden worksheets are skipped entirely (reference
    _iter_sheets_to_convert xlsx_converter.py:275-286): their content
    never reaches any encoding, and the >1-non-empty-sheet title rule
    counts only VISIBLE sheets — a 2-sheet workbook with one hidden
    emits the survivor WITHOUT a sheet title."""
    import json

    from mineru_spark.kernels.oracle import extract_turn

    def sheet(name, word, hidden=False):
        sh = {"name": name,
              "cells": [{"r": 0, "c": 0, "v": "K"}, {"r": 0, "c": 1, "v": "V"},
                        {"r": 1, "c": 0, "v": word}, {"r": 1, "c": 1, "v": "1"}],
              "merges": []}
        if hidden:
            sh["hidden"] = True
        return sh

    both = {"kind": "xlsx_cells",
            "sheets": [sheet("Alpha", "visible-word"),
                       sheet("Beta", "hidden-word", hidden=True)]}
    out = extract_turn(json.dumps(both), "file_reader")
    assert out["route"] == "xlsx"
    assert "visible-word" in out["md"]
    assert "hidden-word" not in out["md"]
    assert "hidden-word" not in out["middle"]
    # survivor is the only visible sheet -> NO sheet title emitted
    assert "Alpha" not in out["md"]

    # control: both visible -> titles for both
    both_vis = {"kind": "xlsx_cells",
                "sheets": [sheet("Alpha", "visible-word"),
                           sheet("Beta", "other-word")]}
    out2 = extract_turn(json.dumps(both_vis), "file_reader")
    assert "Alpha" in out2["md"] and "Beta" in out2["md"]

    # hostile: non-bool hidden values are NOT treated as hidden
    weird = {"kind": "xlsx_cells",
             "sheets": [sheet("Alpha", "visible-word"),
                        dict(sheet("Beta", "other-word"), hidden="yes")]}
    out3 = extract_turn(json.dumps(weird), "file_reader")
    assert "other-word" in out3["md"]


def test_pptx_math_runs_inline_equation():
    """OMML math inside a pptx paragraph becomes an inline equation
    segment with no style/link (reference _is_math_content_node +
    _convert_math_node_to_latex, pptx_converter.py:1162-1172, rendered
    through the same office run machinery as docx math runs): `$..$`
    in md, a typed inline_equation run in content_list_v2."""
    import json

    from mineru_spark.kernels.oracle import extract_turn

    doc = {"kind": "pptx_shapes", "slides": [{"shapes": [
        {"bbox": [80.0, 120.0, 460.0, 400.0], "kind": "body", "text": "",
         "runs": [{"text": "Variance is "},
                  {"math": r"\sigma^2"},
                  {"text": " over n.", "bold": True},
                  {"math": "   "}]}]}]}  # blank latex run contributes nothing
    out = extract_turn(json.dumps(doc), "file_reader")
    assert out["route"] == "pptx"
    assert r"Variance is $\sigma^2$" in out["md"]
    v2 = json.loads(out["content_list_v2"])
    runs = [r for pg in v2 for b in pg if b["type"] == "paragraph"
            for r in b["content"]["paragraph_content"]]
    assert {"content": r"\sigma^2", "type": "equation_inline"} in runs
    # the styled run after the equation keeps its own styling
    assert {"content": "over n.", "style": ["bold"], "type": "text"} in runs


def test_docx_section_breaks_paginate():
    """Section breaks start new pages (reference _start_new_page
    docx_converter.py:722-724): BEFORE an empty sectPr paragraph
    (:1393-1396), AFTER a text paragraph carrying one (:1597-1598);
    a layout-only break (empty, continuous, all-zero margins,
    :726-755) does not paginate; continuous with unknown margins does.
    List groups flush at the boundary, and the middle IR splits
    para_blocks per page."""
    from mineru_spark.kernels.docx import extract_docx
    from mineru_spark.kernels.oracle import extract_turn

    paras = [
        {"style": "Heading1", "runs": [{"text": "Intro"}]},
        {"style": "Normal", "runs": [{"text": "First page text."}],
         "sect": {"type": "nextPage"}},                       # after
        {"style": "ListParagraph", "num": {"id": 1, "ilvl": 0,
                                           "ordered": True},
         "runs": [{"text": "item one"}]},
        {"style": "Normal", "runs": [], "sect": {"type": "nextPage"}},
        {"style": "Normal", "runs": [{"text": "Third page."}]},
        {"style": "Normal", "runs": [],
         "sect": {"type": "continuous", "pg_mar_zero": True}},  # no-op
        {"style": "Normal", "runs": [{"text": "Still third."}]},
        {"style": "Normal", "runs": [],
         "sect": {"type": "continuous"}},                     # breaks
        {"style": "Normal", "runs": [{"text": "Fourth page."}]},
    ]
    blocks, _ = extract_docx({"kind": "docx_runs", "paras": paras})
    got = [(b["page_idx"], b["type"]) for b in blocks]
    assert got == [(0, "title"), (0, "text"),
                   (1, "list"),           # flushed by the empty break
                   (2, "text"), (2, "text"),
                   (3, "text")]

    import json
    res = extract_turn(json.dumps({"kind": "docx_runs", "paras": paras}),
                       "file_reader")
    info = json.loads(res["middle"])["pdf_info"]
    assert [p["page_idx"] for p in info] == [0, 1, 2, 3]
    assert len(info[2]["para_blocks"]) == 2


def test_docx_numbering_start_and_child_reset():
    """Ordered counters start at the level definition's start value
    (reference _get_numbering_level_start docx_converter.py:2388-2421)
    and advancing a level RESETS deeper counters of the same chain so
    sub-items restart under the next parent (_advance_list_counter
    :2433-2438); a different numId keeps its own chain untouched."""
    from mineru_spark.kernels.docx import extract_docx

    def li(nid, ilvl, text, start=None, ordered=True):
        num = {"id": nid, "ilvl": ilvl, "ordered": ordered}
        if start is not None:
            num["start"] = start
        return {"style": "ListParagraph", "num": num,
                "runs": [{"text": text}]}

    paras = [
        li(1, 0, "parent one", start=4),
        li(1, 1, "sub a"),
        li(1, 1, "sub b"),
        li(1, 0, "parent two"),
        li(1, 1, "sub c"),          # resets → 1. again
        li(2, 0, "other chain"),    # different numId → own counter
        # heading-styled interruption: neither list nor content in the
        # heading-numid pre-scan, so chain 1 stays a LIST
        {"style": "Heading2", "runs": [{"text": "interruption."}]},
        li(1, 0, "parent three"),   # same chain continues across gap
    ]
    blocks, _ = extract_docx({"kind": "docx_runs", "paras": paras})
    lists = [b["text"] for b in blocks if b["type"] == "list"]
    assert lists[0] == ("4. parent one\n    1. sub a\n    2. sub b\n"
                        "5. parent two\n    1. sub c")
    assert lists[1] == "1. other chain"
    assert lists[2] == "6. parent three"
    # hostile start values degrade to 1
    blocks, _ = extract_docx({"kind": "docx_runs", "paras": [
        li(3, 0, "x", start="nine"), li(3, 0, "y", start=True)]})
    assert [b["text"] for b in blocks if b["type"] == "list"] == \
        ["1. x\n2. y"]


def test_docx_numbered_headings_and_section_numbers():
    """A multi-level numId interleaved with body content converts to
    TITLE blocks (reference _detect_heading_list_numids
    docx_converter.py:2688-2765, consumption :1447-1464) with computed
    hierarchical section numbers; a literal-numbered heading SYNCS the
    counters (model_output_to_middle_json.py:132-168); a single-level
    interleaved chain and a contiguous multi-level chain both STAY
    lists; an unordered heading chain titles without numbers."""
    import json
    from mineru_spark.kernels.oracle import extract_turn

    def li(nid, ilvl, text, ordered=True):
        return {"style": "ListParagraph",
                "num": {"id": nid, "ilvl": ilvl, "ordered": ordered},
                "runs": [{"text": text}]}

    body = {"style": "Normal", "runs": [{"text": "Body."}]}
    paras = [
        {"style": "Heading1", "runs": [{"text": "2 Background"}]},
        li(5, 0, "Methods"), body,
        li(5, 1, "Data"), body,
        li(5, 0, "Results"), body,
        li(7, 0, "alpha"), body, li(7, 0, "beta"),      # single-level
        li(8, 0, "contig"), li(8, 1, "uous"),           # no interleave
    ]
    res = extract_turn(json.dumps({"kind": "docx_runs", "paras": paras}),
                       "file_reader")
    md = res["md"]
    assert "# 3 Methods" in md and "## 3.1 Data" in md \
        and "# 4 Results" in md
    assert "1. alpha" in md and "2. beta" in md          # stayed a list
    assert "1. contig" in md and "    1. uous" in md
    titles = [b for pg in json.loads(res["middle"])["pdf_info"]
              for b in pg["para_blocks"] if b["type"] == "title"]
    assert [t.get("section_number") for t in titles] == \
        [None, "3", "3.1", "4"]
    assert titles[0]["is_numbered_style"] is False
    # unordered heading chain: titles, no section numbers
    paras2 = [li(5, 0, "One", ordered=False), body,
              li(5, 1, "Sub", ordered=False), body,
              li(5, 0, "Two", ordered=False)]
    res2 = extract_turn(json.dumps({"kind": "docx_runs", "paras": paras2}),
                        "file_reader")
    assert "# One" in res2["md"] and "## Sub" in res2["md"] \
        and "section_number" not in res2["middle"]


# ---------------------------------------------------------------------------
# office caption machinery (office_magic_model.py classify + tie-up)
# ---------------------------------------------------------------------------

def test_office_caption_seq_attach_and_md_order():
    """A SEQ-field Caption paragraph after an image attaches to it
    (docx_converter.py:3323-3341 → classify → tie-up) and md renders
    body FIRST then '  \\n'-joined captions (output_builders.py:
    379-394); a seq-less Caption style stays plain text
    (branch order docx_converter.py:1568-1595)."""
    import json

    from mineru_spark.kernels.oracle import extract_turn

    doc = {"kind": "docx_runs", "paras": [
        {"style": "Normal", "runs": [{"image": {"data_b64": "aGVsbG8="}}]},
        {"style": "Caption", "seq": True,
         "runs": [{"text": "Figure 1: "},
                  {"text": "styled tail", "italic": True}]},
        {"style": "Caption", "seq": False,
         "runs": [{"text": "Source: somewhere."}]},
    ]}
    out = extract_turn(json.dumps(doc), "file_reader")
    assert out["md"] == (
        "![](images/2cf24dba5fb0a30e26e83b2ac5b9e29e1b161e5c1fa7425e730"
        "43362938b9824.jpg)  \nFigure 1: *styled tail*"
        "\n\nSource: somewhere.")
    cl = json.loads(out["content_list"])
    assert [b["type"] for b in cl] == ["image", "text"]
    assert cl[0]["image_caption"] == ["Figure 1: *styled tail*"]
    # v2 keeps the styled caption runs (caption_recs path)
    v2 = json.loads(out["content_list_v2"])
    cap_runs = v2[0][0]["content"]["image_caption"]
    assert cap_runs == [
        {"content": "Figure 1:", "type": "text"},
        {"content": "styled tail", "type": "text", "style": ["italic"]}]


def test_office_caption_promotion_contiguity_and_orphan():
    """Prefix promotion of the text after a visual
    (classify_caption_blocks rule 5), a before-caption via the
    next-parent rule, the {body}-gap contiguity bridge
    (fix_two_layer_blocks, office_magic_model.py:688-696), and orphan
    demotion to text."""
    import json

    from mineru_spark.kernels.oracle import extract_turn

    doc = {"kind": "docx_runs", "paras": [
        {"style": "Caption", "seq": True,
         "runs": [{"text": "Table 1: before."}]},
        {"style": "Table", "rows": [[{"text": "h"}], [{"text": "v"}]]},
        {"style": "Normal", "runs": [{"text": "Table 1. after."}]},
        {"style": "Normal", "runs": [{"text": "plain body text."}]},
        {"style": "Caption", "seq": True,
         "runs": [{"text": "Figure 7: orphan."}]},
        {"style": "Normal", "runs": [{"text": "closing text."}]},
    ]}
    out = extract_turn(json.dumps(doc), "file_reader")
    cl = json.loads(out["content_list"])
    assert [b["type"] for b in cl] == ["table", "text", "text", "text"]
    # both captions attached in index order (before-caption first)
    assert cl[0]["table_caption"] == ["Table 1: before.", "Table 1. after."]
    assert cl[1]["text"] == "plain body text."
    assert cl[2]["text"] == "Figure 7: orphan."
    # md: table html, then captions '  \n'-joined after the body
    assert ("</table>\n  \nTable 1: before.  \nTable 1. after."
            in out["md"])


def test_office_caption_tie_up_effective_distance():
    """Two tables with two captions between them: each caption attaches
    by EFFECTIVE index distance (other same-kind captions in the gap
    don't count — calc_effective_index_diff,
    magic_model_utils.py:86-106), ties going to the FIRST body
    (include_bbox=False, :120-121)."""
    import json

    from mineru_spark.kernels.oracle import extract_turn

    # layout: T1, cap_a, cap_b, T2
    # cap_a: diff(T1)=1; diff(T2)=2-1(other cap between)=1 → tie → T1
    # cap_b: diff(T1)=2-1=1; diff(T2)=1 → tie → T1 as well (first body)
    # continuity on T1: caps desc [2,1] contiguous → both kept
    doc = {"kind": "docx_runs", "paras": [
        {"style": "Table", "rows": [[{"text": "t1"}]]},
        {"style": "Caption", "seq": True, "runs": [{"text": "Table A."}]},
        {"style": "Caption", "seq": True, "runs": [{"text": "Table B."}]},
        {"style": "Table", "rows": [[{"text": "t2"}]]},
    ]}
    out = extract_turn(json.dumps(doc), "file_reader")
    cl = json.loads(out["content_list"])
    tables = [b for b in cl if b["type"] == "table"]
    assert tables[0]["table_caption"] == ["Table A.", "Table B."]
    assert tables[1]["table_caption"] == []


def test_pptx_caption_promotion_after_picture():
    """A pptx text shape starting with 'Fig' right after a picture
    promotes to an image caption through the shared office pass."""
    import json

    from mineru_spark.kernels.oracle import extract_turn

    doc = {"kind": "pptx_shapes", "slides": [{"shapes": [
        {"bbox": [100.0, 100.0, 300.0, 300.0], "kind": "image",
         "data_b64": "aGVsbG8="},
        {"bbox": [100.0, 320.0, 300.0, 350.0], "kind": "body",
         "text": "Fig 1: a slide picture."},
    ]}]}
    out = extract_turn(json.dumps(doc), "file_reader")
    cl = json.loads(out["content_list"])
    imgs = [b for b in cl if b["type"] == "image"]
    assert len(imgs) == 1
    assert imgs[0]["image_caption"] == ["Fig 1: a slide picture."]
    assert not any(b["type"] == "text" for b in cl)


def test_docx_table_colspan_normalize():
    """Mammoth gridSpan artifact fix (_normalize_table_colspans,
    docx_converter.py:1284-1372): over-wide rows shrink left-to-right
    to the MODAL column count; rowspan tables and already-consistent
    tables are untouched; under-target rows stay as-is."""
    import json

    from mineru_spark.kernels.oracle import extract_turn

    def table_md(rows):
        doc = {"kind": "docx_runs",
               "paras": [{"style": "Table", "rows": rows}]}
        return extract_turn(json.dumps(doc), "file_reader")["md"]

    # 3 rows of width 2, one row inflated to width 3 → shrinks back
    rows = [[{"text": "a", "header": True}, {"text": "b", "header": True}],
            [{"text": "c", "colspan": 2}, {"text": "d"}],   # width 3
            [{"text": "e"}, {"text": "f"}]]
    assert table_md(rows) == (
        "<table><tr><th>a</th><th>b</th></tr>"
        "<tr><td>c</td><td>d</td></tr>"
        "<tr><td>e</td><td>f</td></tr></table>")

    # with a rowspan anywhere the fix is skipped: the occupancy algebra
    # resolves the inflated row by widening the grid instead
    rows = [[{"text": "a", "rowspan": 2}, {"text": "b"}],
            [{"text": "c", "colspan": 2}],                  # width 3
            [{"text": "d"}, {"text": "e"}]]
    md = table_md(rows)
    assert 'colspan="2"' in md and 'rowspan="2"' in md

    # modal TIE (two rows each of width 2 and 3): Counter.most_common
    # keeps the count seen FIRST (width 2 from row 0) → width-3 rows
    # shrink
    rows = [[{"text": "a"}, {"text": "b"}],
            [{"text": "g"}, {"text": "h"}],
            [{"text": "c", "colspan": 2}, {"text": "d"}],   # width 3
            [{"text": "e"}, {"text": "f", "colspan": 2}]]   # width 3
    assert table_md(rows) == (
        "<table><tr><td>a</td><td>b</td></tr>"
        "<tr><td>g</td><td>h</td></tr>"
        "<tr><td>c</td><td>d</td></tr>"
        "<tr><td>e</td><td>f</td></tr></table>")
    # clear majority the other way: width 3 is modal, width-2 rows are
    # UNDER target and stay untouched
    rows = [[{"text": "a"}, {"text": "b"}],
            [{"text": "c", "colspan": 2}, {"text": "d"}],   # width 3
            [{"text": "e"}, {"text": "f"}, {"text": "g"}]]  # width 3
    assert table_md(rows) == (
        "<table><tr><td>a</td><td>b</td></tr>"
        '<tr><td colspan="2">c</td><td>d</td></tr>'
        "<tr><td>e</td><td>f</td><td>g</td></tr></table>")

    # an UNDER-target row is never padded or widened
    rows = [[{"text": "a"}, {"text": "b"}],
            [{"text": "c"}],
            [{"text": "d"}, {"text": "e"}]]
    assert table_md(rows) == (
        "<table><tr><td>a</td><td>b</td></tr>"
        "<tr><td>c</td></tr>"
        "<tr><td>d</td><td>e</td></tr></table>")


def test_toc_anchor_link_validation():
    """TOC anchors validate against body-block bookmarks
    (_link_index_entries_by_anchor, model_output_to_middle_json.py:
    94-123): a dangling anchor loses its link AND its anchor field;
    when NO body block carries any anchor the reference returns early
    and every TOC link survives (quirk preserved)."""
    import json

    from mineru_spark.kernels.oracle import extract_turn

    def doc(mount_on_heading):
        h1 = {"style": "Heading1", "runs": [{"text": "Target"}]}
        if mount_on_heading:
            h1["anchor"] = "_Toc11111111"
        return {"kind": "docx_runs", "paras": [
            {"style": "TOC", "ilvl": 0, "anchor": "_Toc11111111",
             "runs": [{"text": "Alpha"}]},
            {"style": "TOC", "ilvl": 1, "anchor": "_Toc99999999",
             "runs": [{"text": "Beta"}]},
            h1,
        ]}

    out = extract_turn(json.dumps(doc(True)), "file_reader")
    assert "- [Alpha](#_Toc11111111)" in out["md"]
    assert "[Beta]" not in out["md"] and "- Beta" in out["md"]
    v2 = json.loads(out["content_list_v2"])
    leaf = [x for pg in v2 for x in pg if x["type"] == "list"]
    # dangling anchor removed from the structured items too
    assert "_Toc99999999" not in out["content_list_v2"]

    out2 = extract_turn(json.dumps(doc(False)), "file_reader")
    assert "- [Alpha](#_Toc11111111)" in out2["md"]
    assert "    - [Beta](#_Toc99999999)" in out2["md"]


def test_pptx_picture_skip_rules():
    """Decorative PPTX pictures drop (reference _should_skip_picture,
    pptx_converter.py:470-547): SMALL = either dimension < 10% of the
    slide or area < 1%; BACKGROUND = later z-order non-empty text
    shapes cover ≥ 10% of the picture.  Content pictures stay; a
    background-sized picture with no text on top stays too."""
    import base64
    import hashlib
    import json

    from mineru_spark.kernels.oracle import extract_turn

    def img(bbox, tag):
        blob = hashlib.sha256(tag.encode()).digest() * 2
        return {"bbox": bbox, "kind": "image",
                "data_b64": base64.b64encode(blob).decode()}

    payload = {"kind": "pptx_shapes", "slides": [
        # slide 0: background picture UNDER a body text (covers ~20% of
        # it) → skipped; tiny logo → skipped; normal picture → kept
        {"slide_idx": 0, "size": [960, 540], "shapes": [
            img([0.0, 0.0, 960.0, 540.0], "bg"),
            {"bbox": [80.0, 120.0, 460.0, 400.0], "kind": "body",
             "text": "on top of the background."},
            img([900.0, 500.0, 950.0, 535.0], "logo"),
            img([500.0, 120.0, 880.0, 400.0], "content"),
        ]},
        # slide 1: the same background-sized picture with NO text shape
        # after it in z-order → kept (the negative)
        {"slide_idx": 1, "size": [960, 540], "shapes": [
            {"bbox": [80.0, 120.0, 460.0, 400.0], "kind": "body",
             "text": "before the picture."},
            img([0.0, 0.0, 960.0, 540.0], "bg2"),
        ]},
    ]}
    out = extract_turn(json.dumps(payload), "file_reader")
    assert out["route"] == "pptx"
    cl = json.loads(out["content_list"])
    imgs_by_page = {}
    for b in cl:
        if b["type"] == "image":
            imgs_by_page.setdefault(b["page_idx"], []).append(b)
    want = f"images/{hashlib.sha256(hashlib.sha256(b'content').digest() * 2).hexdigest()}.jpg"
    assert [b["img_path"] for b in imgs_by_page.get(0, [])] == [want]
    assert len(imgs_by_page.get(1, [])) == 1  # bg2 kept


def test_cell_merge_sinks_blank_rowspan_placeholders():
    """A merged-away first data row whose blank rowspan>1 cell is pure
    structure SINKS that placeholder into the next row with rowspan-1
    at its visual column (reference _carry_rowspan_structure_to_next_row,
    table_merge.py:841-867) — the row drops and later columns stay
    aligned."""
    from mineru_spark.kernels import tables as tbl

    def grid(h):
        return tbl.parse_tables(h)[0]

    a = grid("<table><tr><th>k</th><th>v</th></tr>"
             "<tr><td>key one</td><td>value starts</td></tr></table>")
    # continuation: first data row = blank rowspan-2 structural cell +
    # the flagged continuation text; second row has ONE cell (the other
    # column covered by the rowspan)
    b = grid('<table><tr><td rowspan="2"></td><td>and ends</td></tr>'
             "<tr><td>v2</td></tr></table>")
    m = tbl.merge_structural(a, b, cell_merge=[0, 1])
    html = tbl.render_table_html(m)
    assert "<td>value starts and ends</td>" in html
    # the emptied row dropped; its rowspan placeholder sank into the
    # next row (now a plain blank cell, rowspan reduced 2 → 1)
    assert html.count("<tr>") == 3
    assert "<tr><td></td><td>v2</td></tr>" in html
    assert "rowspan" not in html


def test_d1_list_start_line_marking_and_join():
    """IS_LIST_START_LINE sub-cases (para_split.py:202-256) + the
    pipeline md list join (hard break before start lines, language join
    for continuation lines, no markers added)."""
    import numpy as np

    from mineru_spark.kernels import emit
    from mineru_spark.kernels.charstream import classify_text_block

    # normal indented list (≥2 indented continuations): flush-left lines
    # start items; indented continuation lines join their item with a
    # space (:249-255)
    lines = ["first item starts", "continues here", "still continues",
             "second item ends"]
    lbb = np.array([[50.0, 100, 280, 110],
                    [70.0, 112, 260, 122],     # indented continuation
                    [70.0, 124, 250, 134],     # indented continuation
                    [50.0, 136, 240, 146]])
    kind, starts = classify_text_block(lines, lbb, (50, 100, 300, 150),
                                       612.0)
    assert kind == "list"
    assert starts == [True, False, False, True]
    assert emit.join_list_lines(lines, starts) == \
        ("first item starts continues here still continues  \n"
         "second item ends")

    # end-flag delimited items: the line AFTER a '.'-terminated line
    # starts the next item (flag_end >= 80%, :216-226)
    lines2 = ["alpha beta gamma.", "delta epsilon.", "zeta eta theta."]
    lbb2 = np.array([[50.0, 100, 280, 110],
                     [50.0, 112, 280, 122],
                     [50.0, 124, 280, 134]])
    kind2, starts2 = classify_text_block(lines2, lbb2,
                                         (50, 100, 300, 140), 612.0)
    assert kind2 == "list"
    assert starts2 == [False, True, True]
    assert emit.join_list_lines(lines2, starts2) == \
        "alpha beta gamma.  \ndelta epsilon.  \nzeta eta theta."

    # index blocks hard-break every line
    assert emit.join_list_lines(["Intro 3", "Scope 9"], [True, True]) == \
        "Intro 3  \nScope 9"


def test_label_tail_abstract_algorithm_content_ref_text():
    """The PP-DocLayoutV2 label tail (pipeline_magic_model.py:18-41):
    'abstract' renders as plain text but keeps its own middle type and
    never merges into neighbors; 'algorithm' maps to CODE and, with no
    language guess, renders the pre-wrap HTML div
    (render_algorithm_html_from_lines) and encodes as v2 ALGORITHM;
    'content' is INDEX (hard break per line); adjacent
    'reference_content' blocks group into ONE reference list in
    content_list (type list / sub_type ref_text) and v2
    (reference_list)."""
    import json

    from mineru_spark.kernels.oracle import extract_turn

    def block(label, lines, y, idx):
        chars, j = [], idx * 1000
        for r, ln in enumerate(lines):
            for k, c in enumerate(ln):
                chars.append(_char(c, 50 + 5 * k, y + 12 * r, idx=j))
                j += 1
        lo = {"bbox": [45, y - 5, 560, y + 12 * len(lines)],
              "label": label, "index": idx}
        return chars, lo

    specs = [
        ("abstract", ["summary of the document body."], 60),
        ("content", ["Intro 3", "Methods 9"], 100),
        ("algorithm", ["for each x in S do", "  y <- f(x)", "end for"],
         160),
        ("text", ["plain body paragraph here."], 240),
        ("reference_content", ["[1] first citation entry."], 300),
        ("reference_content", ["[2] second citation entry."], 330),
    ]
    chars, layout = [], []
    for i, (lbl, lines, y) in enumerate(specs):
        c, lo = block(lbl, lines, y, i)
        chars.extend(c)
        layout.append(lo)
    out = extract_turn(json.dumps(_page(chars, layout)), "pdf_reader")
    md = out["md"]
    assert "summary of the document body." in md
    assert "Intro 3  \nMethods 9" in md
    assert '<div class="mineru-algorithm" style="white-space: pre-wrap; ' \
           'font-family:monospace;">' in md
    assert "for each x in S do" in md and "end for" in md
    assert "[1] first citation entry." in md

    cl = json.loads(out["content_list"])
    # abstract emits as content_list TEXT
    assert any(b["type"] == "text"
               and b.get("text", "").startswith("summary") for b in cl)
    # algorithm code item keeps the sub_type, no code_language
    alg = next(b for b in cl if b["type"] == "code")
    assert alg["sub_type"] == "algorithm" and "code_language" not in alg
    # the two adjacent reference blocks grouped into ONE list item
    refs = [b for b in cl if b.get("sub_type") == "ref_text"]
    assert len(refs) == 1 and len(refs[0]["list_items"]) == 2
    assert refs[0]["list_items"][0].startswith("[1]")

    v2 = json.loads(out["content_list_v2"])
    flat = [b for pg in v2 for b in pg]
    assert any(b["type"] == "algorithm"
               and b["content"]["algorithm_content"] for b in flat)
    rlists = [b for b in flat
              if b["type"] == "list"
              and b["content"].get("list_type") == "reference_list"]
    assert len(rlists) == 1 and len(rlists[0]["content"]["list_items"]) == 2

    mid = json.loads(out["middle"])
    types = [b["type"] for pg in mid["pdf_info"]
             for b in pg["para_blocks"]]
    assert "abstract" in types and "ref_text" in types


def test_generic_caption_labels_kind_agnostic_attach():
    """The pipeline's GENERIC child labels (figure_title → CAPTION,
    vision_footnote → FOOTNOTE, pipeline_magic_model.py:27/:42) attach
    to the best visual parent of ANY kind — an image-adjacent
    figure_title lands on the image even with a table elsewhere, and an
    orphan (no visuals at all) demotes to text."""
    import json

    from mineru_spark.kernels.oracle import extract_turn

    def cap(text, y, idx, label):
        chars = [_char(c, 150 + 5 * k, y, idx=idx * 1000 + k)
                 for k, c in enumerate(text)]
        return chars, {"bbox": [145, y - 5, 400, y + 12],
                       "label": label, "index": idx}

    chars, layout = [], []
    layout.append({"bbox": [150, 60, 450, 140], "label": "image",
                   "index": 0})
    c, lo = cap("Figure 1: the picture.", 150, 1, "figure_title")
    chars += c; layout.append(lo)
    layout.append({"bbox": [50, 220, 562, 280], "label": "table",
                   "index": 2,
                   "html": "<table><tr><td>x</td></tr></table>"})
    c, lo = cap("Note: under the table.", 290, 3, "vision_footnote")
    chars += c; layout.append(lo)
    out = extract_turn(json.dumps(_page(chars, layout)), "pdf_reader")
    cl = json.loads(out["content_list"])
    img = next(b for b in cl if b["type"] == "image")
    assert img["image_caption"] == ["Figure 1: the picture."]
    tbl_b = next(b for b in cl if b["type"] == "table")
    assert tbl_b["table_footnote"] == ["Note: under the table."]

    # orphan generic caption with no visual present → text block
    c2, lo2 = cap("Figure 9: nothing here.", 60, 0, "figure_title")
    out2 = extract_turn(json.dumps(_page(c2, [lo2])), "pdf_reader")
    cl2 = json.loads(out2["content_list"])
    assert any(b["type"] == "text"
               and b["text"].startswith("Figure 9") for b in cl2)


def test_visual_segment_order_and_separators():
    """Visual children render in reading order with the reference's
    separators (merge_visual_blocks_to_markdown :70-104 +
    get_visual_block_separator :191-204): markdown lines join with a
    '  \\n' hard break, an html body takes '\\n' before and '\\n\\n'
    after."""
    import json

    from mineru_spark.kernels.oracle import extract_turn

    def cap(text, y, idx, label):
        chars = [_char(c, 150 + 5 * k, y, idx=idx * 1000 + k)
                 for k, c in enumerate(text)]
        return chars, {"bbox": [145, y - 5, 400, y + 12],
                       "label": label, "index": idx}

    chars, layout = [], []
    # caption ABOVE the table, footnote below → caption  \n<html>\n\nnote
    c, lo = cap("Table 1: demo.", 60, 0, "table_caption")
    chars += c; layout.append(lo)
    layout.append({"bbox": [50, 80, 560, 140], "label": "table",
                   "index": 1,
                   "html": "<table><tr><td>v</td></tr></table>"})
    c, lo = cap("Note: below.", 150, 2, "table_footnote")
    chars += c; layout.append(lo)
    out = extract_turn(json.dumps(_page(chars, layout)), "pdf_reader")
    assert ("Table 1: demo.\n"
            "<table><tr><td>v</td></tr></table>\n\n"
            "Note: below.") in out["md"]

    # image with caption above and footnote below: all markdown lines →
    # hard breaks between every pair
    chars2, layout2 = [], []
    c, lo = cap("Figure 2: pic.", 60, 0, "image_caption")
    chars2 += c; layout2.append(lo)
    layout2.append({"bbox": [150, 80, 450, 160], "label": "image",
                    "index": 1})
    c, lo = cap("Source: here.", 170, 2, "image_footnote")
    chars2 += c; layout2.append(lo)
    out2 = extract_turn(json.dumps(_page(chars2, layout2)), "pdf_reader")
    img_path = json.loads(out2["content_list"])
    ip = next(b for b in img_path if b["type"] == "image")["img_path"]
    assert (f"Figure 2: pic.  \n![]({ip})  \nSource: here.") in out2["md"]


def test_code_visual_caption_attach():
    """CODE is a visual main type (pipeline_magic_model.py:44): a
    generic figure_title adjacent to a code block attaches to it,
    renders in reading order above the fenced body with a hard break,
    and surfaces in content_list code_caption and v2."""
    import json

    from mineru_spark.kernels.oracle import extract_turn

    chars = [_char(c, 150 + 5 * k, 60, idx=k)
             for k, c in enumerate("Listing 1: setup.")]
    code_chars = []
    j = 100
    for r, ln in enumerate(("import os", "print(os.name)")):
        for k, c in enumerate(ln):
            code_chars.append(_char(c, 50 + 5 * k, 90 + 14 * r, idx=j))
            j += 1
    layout = [
        {"bbox": [145, 50, 400, 75], "label": "figure_title", "index": 0},
        {"bbox": [45, 85, 400, 125], "label": "code", "index": 1},
    ]
    out = extract_turn(json.dumps(_page(chars + code_chars, layout)),
                       "pdf_reader")
    assert ("Listing 1: setup.  \n```python\nimport os\n"
            "print(os.name)\n```") in out["md"]
    cl = json.loads(out["content_list"])
    code = next(b for b in cl if b["type"] == "code")
    assert code["code_caption"] == ["Listing 1: setup."]
    v2 = json.loads(out["content_list_v2"])
    v2code = next(b for pg in v2 for b in pg if b["type"] == "code")
    assert v2code["content"]["code_caption"] == [
        {"content": "Listing 1: setup.", "type": "text"}]
