"""Property-based robustness tests (hypothesis).

The reference has no property tests (SURVEY §5); at 10^12-turn scale the
properties that matter are: the kernel NEVER raises on arbitrary payload
bytes, outputs are deterministic, the table algebra reaches a fixed point,
and reading-order is a true permutation."""

import json

from hypothesis import given, settings, strategies as st

from mineru_spark.kernels.oracle import extract_turn
from mineru_spark.kernels import tables as tbl
from mineru_spark.kernels.xycut import xy_cut_order


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=400))
def test_extract_turn_never_raises_on_text(payload):
    out = extract_turn(payload, None)
    assert isinstance(out["md"], str)
    assert isinstance(json.loads(out["content_list"]), list)


@settings(max_examples=60, deadline=None)
@given(st.recursive(
    st.none() | st.booleans() | st.integers() | st.floats(allow_nan=False)
    | st.text(max_size=12),
    lambda ch: st.lists(ch, max_size=4) | st.dictionaries(
        st.sampled_from(["pages", "chars", "layout", "bbox", "char", "font",
                         "kind", "rotation", "char_idx", "label", "index",
                         "page_idx", "page_size", "size"]),
        ch, max_size=5),
    max_leaves=24))
def test_extract_turn_never_raises_on_jsonish(doc):
    payload = json.dumps({"kind": "pdf_chars", "pages": doc},
                         ensure_ascii=False)
    out = extract_turn(payload, "pdf_reader")
    assert out["route"] in ("pdf_txt", "pdf_ocr", "error")


@settings(max_examples=80, deadline=None)
@given(st.text(max_size=300))
def test_extract_turn_deterministic(payload):
    a = extract_turn(payload, "browser")
    b = extract_turn(payload, "browser")
    assert a["md"] == b["md"] and a["content_list"] == b["content_list"]


@settings(max_examples=60, deadline=None)
@given(st.lists(
    st.tuples(st.integers(1, 3), st.integers(1, 3), st.booleans(),
              st.text(alphabet="abc ", max_size=8)),
    min_size=1, max_size=12))
def test_table_render_parse_fixed_point(cells):
    """render(parse(x)) is a fixed point: canonicalization is idempotent."""
    rows = []
    for i in range(0, len(cells), 3):
        row = "".join(
            f'<{"th" if h else "td"} rowspan="{r}" colspan="{c}">{t}'
            f'</{"th" if h else "td"}>'
            for r, c, h, t in cells[i:i + 3])
        rows.append(f"<tr>{row}</tr>")
    html = f"<table>{''.join(rows)}</table>"
    grids = tbl.parse_tables(html)
    if not grids:
        return
    once = tbl.render_table_html(grids[0])
    again = tbl.render_table_html(tbl.parse_tables(once)[0])
    assert once == again


@settings(max_examples=80, deadline=None)
@given(st.lists(
    st.tuples(st.floats(0, 500), st.floats(0, 700),
              st.floats(1, 100), st.floats(1, 60)),
    min_size=1, max_size=20))
def test_xycut_is_permutation(boxes):
    bxs = [[x, y, x + w, y + h] for x, y, w, h in boxes]
    order = xy_cut_order(bxs)
    assert sorted(order) == list(range(len(bxs)))


@given(st.text(alphabet=st.characters(codec="utf-8"), max_size=500))
@settings(max_examples=150, deadline=None)
def test_tokenizer_never_raises_and_roundtrips_text(s):
    """The regex tokenizer consumes arbitrary input without raising, and
    plain text (no markup chars) passes through as data."""
    from mineru_spark.kernels.htmltok import tokenize
    evs = list(tokenize(s))
    assert all(e[0] in ("start", "end", "data") for e in evs)
    if "<" not in s and "&" not in s and s:
        assert "".join(e[1] for e in evs if e[0] == "data") == s


def test_tokenizer_adversarial_payloads():
    from mineru_spark.kernels.oracle import extract_turn
    bads = ["<", "<a", "<table><tr><td",
            "<script>if(a<b){x}</script>ok",
            "<p>x & y &amp; &#65; &bogus; z</p>", "<td colspan='zz'>x",
            "<!-- unterminated", "<![CDATA[ unterminated",
            "<p a=\"unclosed>t", "\x00<p>\x01</p>",
            "<p>" + "<b>" * 2000 + "deep" + "</b>" * 2000,
            "<style>p{content:'</div>'}</style><p>after</p>"]
    for b in bads:
        out = extract_turn(b, "browser")
        assert isinstance(out["md"], str)


def test_xlsx_docx_adversarial_payloads_bounded():
    """Office payload kinds never raise AND stay time-bounded under
    hostile inputs: billion-cell merge ranges clamp (MAX_MERGE_*/
    MAX_MERGED_CELLS), giant region bboxes clamp (MAX_REGION_DIM),
    far-apart cells don't allocate the empty space between them."""
    import json
    import time

    bads = [
        '{"kind": "xlsx_cells", "sheets": "nope"}',
        '{"kind": "xlsx_cells", "sheets": [{"cells": [{"r": 0}],'
        ' "merges": [[0, 0]]}]}',
        json.dumps({"kind": "xlsx_cells", "sheets": [
            {"cells": [{"r": 0, "c": 0, "v": "a"}],
             "merges": [[0, 0, 10**9, 10**9]]}]}),
        json.dumps({"kind": "xlsx_cells", "sheets": [
            {"cells": [{"r": 0, "c": 0, "v": "a"},
                       {"r": 10**6, "c": 10**6, "v": "b"}]}]}),
        json.dumps({"kind": "xlsx_cells", "sheets": [
            {"cells": [{"r": 0, "c": 0, "v": "a"}],
             "merges": [[i, 0, i + 255, 63]
                        for i in range(0, 512 * 256, 256)]}]}),
        '{"kind": "docx_runs", "paras": [{"style": "Table", "rows": "x"}]}',
        '{"kind": "docx_runs", "paras": [{"style": "Table",'
        ' "rows": [[{"rowspan": "huge", "math": 3}], "bad"]}]}',
    ]
    for b in bads:
        t0 = time.perf_counter()
        out = extract_turn(b, "file_reader")
        assert isinstance(out["md"], str)
        assert out["route"] in ("xlsx", "docx", "error")
        assert time.perf_counter() - t0 < 5.0


def test_tokenizer_entities_and_rawtext():
    from mineru_spark.kernels.html_extract import extract_html
    blocks, _ = extract_html(
        "<article><p>x &amp; y &#65;</p>"
        "<script>var a = 1 < 2;</script></article>")
    assert blocks[0]["text"] == "x & y A"
    assert len(blocks) == 1  # script content never leaks into blocks


_coord = st.one_of(st.floats(allow_nan=True, allow_infinity=True,
                             width=32),
                   st.integers(-10**6, 10**6))
_char_rec = st.fixed_dictionaries({
    "char": st.text(min_size=0, max_size=2),
    "bbox": st.lists(_coord, min_size=0, max_size=6),
    "font": st.fixed_dictionaries({"name": st.text(max_size=4),
                                   "size": _coord}),
    "rotation": _coord,
    "char_idx": st.integers(-10, 10**9),
})
_layout_rec = st.fixed_dictionaries({
    "bbox": st.lists(_coord, min_size=4, max_size=4),
    "label": st.sampled_from(["text", "table", "image", "code", "list",
                              "header", "table_caption", "weird"]),
    "index": st.integers(-2, 5),
}, optional={"spans": st.lists(st.lists(_coord, min_size=4, max_size=4),
                               max_size=3),
             "html": st.text(max_size=40),
             "latex": st.text(max_size=20)})


@given(st.lists(_char_rec, max_size=25), st.lists(_layout_rec, max_size=5))
@settings(max_examples=120, deadline=None)
def test_pdf_payload_shaped_fuzz(chars, layout):
    """Structurally-valid pdf_chars payloads with hostile VALUES (NaN/inf
    coords, negative sizes, short bboxes, junk labels) must never raise —
    extract_turn degrades per-record or to route=error, and stays
    deterministic."""
    import json
    from mineru_spark.kernels.oracle import extract_turn
    payload = json.dumps({"kind": "pdf_chars", "pages": [
        {"page_idx": 0, "page_size": [612.0, 792.0],
         "chars": chars, "layout": layout}]}, ensure_ascii=False)
    a = extract_turn(payload, "pdf_reader")
    b = extract_turn(payload, "pdf_reader")
    assert isinstance(a["md"], str)
    assert a["md"] == b["md"] and a["middle"] == b["middle"]


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(max_codepoint=0x3200), max_size=40),
       st.sampled_from(["<table><tr><td>x</td></tr></table>", "<TABLE>",
                        "<tab", "plain", "", "{\"kind\": \"docx_runs\"}"]))
def test_office_sniff_regex_matches_classifier(prefix, payload):
    """The JVM sniff regex and the Python classifier agree on ANY
    prefix+payload combination — the r4 #1 parity, as a property (the
    regex is evaluated with Python's re here; the Spark-side equivalence
    is pinned by test_plans.test_office_sniff_matches_python_classifier)."""
    import re

    from mineru_spark.kernels.classify import (OFFICE_SNIFF_RE,
                                               classify_payload)

    text = prefix + payload
    jvm = re.match(OFFICE_SNIFF_RE.replace("(?i)", ""), text,
                   re.IGNORECASE) is not None
    assert jvm == (classify_payload(text) == "office")


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=300))
def test_probe_media_never_raises(data):
    from mineru_spark.multimodal import probe_media

    out = probe_media(data)
    assert set(out) == {"mime", "width", "height", "duration_ms"}


@settings(max_examples=150, deadline=None)
@given(st.lists(st.dictionaries(
    st.sampled_from(["text", "bold", "italic", "underline",
                     "strikethrough", "script", "hidden", "link", "math",
                     "image"]),
    st.none() | st.booleans() | st.integers() | st.text(max_size=10)
    | st.dictionaries(st.sampled_from(["data_b64", "rel_id"]),
                      st.text(max_size=8), max_size=2),
    max_size=5), max_size=6))
def test_docx_runs_fuzz_never_raises(runs):
    from mineru_spark.kernels.docx import extract_docx

    blocks, metrics = extract_docx({"paras": [
        {"style": "Normal", "runs": runs},
        {"style": "ListParagraph", "runs": runs},
        {"style": "TOC", "runs": runs},
        # anchored TOC drives the hierarchical index path (tab strip,
        # uniform-style collapse, link-to-plain) over hostile runs
        {"style": "TOC", "runs": runs, "anchor": "_Toc1", "ilvl": 1},
        {"style": "TOC", "runs": runs, "anchor": 7, "ilvl": True}]})
    assert all("type" in b for b in blocks)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=120))
def test_lang_of_total_and_deterministic(text):
    from mineru_spark.kernels.langid import lang_of

    out = lang_of(text)
    assert out == lang_of(text)
    assert out in {"ko", "ja", "zh", "ru", "en", "de", "fr", "es", "und"}


_style_strategy = st.dictionaries(
    st.sampled_from(["bold", "italic", "underline", "emphasis",
                     "strikethrough"]),
    st.booleans(), max_size=3)


@settings(max_examples=120, deadline=None)
@given(st.lists(st.tuples(st.text(max_size=24), _style_strategy),
                max_size=5))
def test_inline_render_total_deterministic_and_balanced(run_specs):
    """The inline renderer is total and deterministic over arbitrary
    styled runs, and every HTML wrapper it opens it also closes (the
    stack-diff invariant)."""
    from mineru_spark.kernels.docx import _render_runs

    runs = [{"text": t, **flags} for t, flags in run_specs]
    out1, recs1 = _render_runs(runs)
    out2, recs2 = _render_runs(runs)
    assert out1 == out2 and recs1 == recs2
    for open_tag, close_tag in (("<strong>", "</strong>"),
                                ("<em>", "</em>"), ("<u>", "</u>"),
                                ("<s>", "</s>"), ("<sup>", "</sup>"),
                                ("<sub>", "</sub>"),
                                ("<span ", "</span>")):
        assert out1.count(open_tag) == out1.count(close_tag), \
            (open_tag, out1)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=60))
def test_finalize_text_block_idempotent(text):
    """strip + standalone-marker escape + prefix escape reach a fixed
    point after one application."""
    from mineru_spark.kernels.inline import finalize_text_block

    once = finalize_text_block(text)
    assert finalize_text_block(once) == once


@settings(max_examples=80, deadline=None)
@given(st.lists(st.text(alphabet=st.characters(
    blacklist_characters="*_~$`\\<>&"), max_size=20), max_size=4))
def test_inline_plain_runs_concatenate_exactly(texts):
    """Unstyled special-free runs concatenate to exactly the normalized
    ''-join (whitespace ownership lives in the runs)."""
    from mineru_spark.kernels.docx import _render_runs
    from mineru_spark.kernels.emit import fullwidth_to_halfwidth

    out, _ = _render_runs([{"text": t} for t in texts])
    assert out == "".join(fullwidth_to_halfwidth(t) for t in texts)


@settings(max_examples=80, deadline=None)
@given(st.lists(st.text(max_size=16), max_size=6),
       st.lists(st.booleans(), max_size=6))
def test_join_list_lines_total_and_stable(lines, starts):
    """The pipeline list join is total over ragged inputs (starts
    shorter/longer than lines) and deterministic."""
    from mineru_spark.kernels.emit import join_list_lines

    a = join_list_lines(lines, starts)
    assert a == join_list_lines(lines, starts)
    # every non-blank markdown-visible item came from the input
    for item in a.split("  \n"):
        assert isinstance(item, str)
