"""Deterministic synthetic transcript corpus (FIXTURES.md §1-2).

NOTE (r6): materialized-corpus consumers key their cache directory on this
file's hash; the corpus is now written at 4x-parallelism partitioning
(pipeline.synthesize_transcripts) so scans of it get straggler-resistant
task granularity — content per (conv_id, turn_idx) is byte-identical.

One row per turn with the exact ``BASELINE.json input_hint`` schema
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp)``.  Every value is a pure function of ``(conv_id, turn_idx)``
via sha256-seeded PRNGs — no global RNG state — so ANY subset of the corpus
regenerates identically on any executor.  This is what lets the Spark job
synthesize its own input shard-locally (mapInPandas over a ``spark.range``)
instead of shipping data, and what makes the pytest oracle reproducible.

Payload kinds inside ``text`` (mirroring the reference's input universe,
/root/reference/mineru/cli/common.py:42-47, recast for transcripts):

- HTML fragments (~60%, tool=browser): main-content <article> wrapped in
  boilerplate (nav/header/footer/sidebar/script/style) with high link
  density — exercises the boilerplate discard analog of the reference's
  header/footer discard (pipeline_magic_model.py:199-220).
- PDF-like char streams (~30%, tool=pdf_reader): JSON char records
  mirroring the reference char schema (pdf_text_tool.py:181-190) plus a
  layout array, with corruption knobs keyed to reference kernels:
  shadow-offset duplicates (pdf_text_tool.py:107-146), near-identical
  jitter dups (:278-314), ligatures (span_pre_proc.py:29-33), full-width
  forms (char_utils.py:21-38), sup/sub at 0.7x size (span_pre_proc.py:536),
  rotated watermark chars (span_pre_proc.py:173-208), occasionally
  shuffled char records (span_pre_proc.py:609-614), hyphen-split line
  ends (char_utils.py:7-18).
- Office table fragments (~10%, tool=file_reader): HTML tables with
  rowspan/colspan merged cells (xlsx_converter.py:39-166 semantics).
- DOCX run / PPTX shape / XLSX sheet-cell fragments (~3% each,
  tool=file_reader): post-XML payload analogs for the office converters
  (docx_converter / pptx converter / xlsx_converter DataRegion route).
- Empty (~5%, tool=none): null-path coverage.

Conversation lengths follow a Zipf-ish tail: ~1% of convs are 40-80 turns
(long-document skew for the partitioning tests); the rest are 1-8.
"""

from __future__ import annotations

import hashlib
import json
import random
from datetime import datetime, timedelta, timezone

_BASE_TS = datetime(2026, 1, 1, tzinfo=timezone.utc)

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

_VOCAB = (
    "alpha beta gamma delta epsilon zeta theta lambda sigma omega "
    "pipeline extraction transcript document layout segment marker "
    "vector column partition shuffle broadcast window ordered stable "
    "content density kernel span block line page turn metric golden "
    "merge filter classify route emit parse render table figure title "
    "system agent browser reader result output schema "
    "quantity revenue supplier nation region order process stream batch"
).split()

# occasional words exercising the markdown escape path
# (reference markdown_utils.py:12-48)
_SPECIAL_WORDS = ["a*b", "x_y", "p~q", "c$d", "tick`mark"]

# CJK sample sentences (exercise the no-space CJK join rule,
# pipeline_middle_json_mkcontent.py:402-405)
_CJK_SENTENCES = [
    "数据管道处理文档内容",
    "分布式系统按分区并行执行",
    "提取主要内容并生成结构化文本",
    "每个回合的文本保持稳定顺序",
]

PAGE_W, PAGE_H = 612.0, 792.0
BODY_SIZE = 10.0
CHAR_W = 5.0
LINE_H = 12.0


def _prng(*keys) -> random.Random:
    h = hashlib.sha256("|".join(str(k) for k in keys).encode("utf-8")).digest()
    return random.Random(int.from_bytes(h[:8], "big"))


def conv_length(conv_i: int) -> int:
    rng = _prng("len", conv_i)
    if rng.random() < 0.01:
        return rng.randint(40, 80)  # long-document skew tail
    return rng.randint(1, 8)


def n_convs_for_sf(sf: float) -> int:
    """~200 convs at sf=0.001 (≈900 turns), scaling linearly."""
    return max(8, int(200 * (sf / 0.001)))


def _words(rng: random.Random, n: int, special: bool = False) -> list[str]:
    out = []
    for _ in range(n):
        if special and rng.random() < 0.08:
            out.append(rng.choice(_SPECIAL_WORDS))
        else:
            out.append(rng.choice(_VOCAB))
    return out


def _sentence(rng: random.Random, lo=5, hi=14, special=False) -> str:
    ws = _words(rng, rng.randint(lo, hi), special=special)
    return " ".join(ws)


# ---------------------------------------------------------------------------
# HTML fragments
# ---------------------------------------------------------------------------

def _gen_html(rng: random.Random) -> str:
    def link_farm(n):
        return "".join(
            f'<li><a href="/x/{i}">{rng.choice(_VOCAB)} {rng.choice(_VOCAB)}</a></li>'
            for i in range(n)
        )

    n_paras = rng.randint(2, 5)
    paras = []
    for _ in range(n_paras):
        if rng.random() < 0.07:
            paras.append(f"<p>{rng.choice(_CJK_SENTENCES)}</p>")
        elif rng.random() < 0.25:
            # inline structure inside a kept paragraph: bold/italic runs
            # and an in-content link below the density cutoff — exercises
            # the v2 typed-run records (r4 directive #4)
            a, b, c = (_sentence(rng, 4, 8, special=True),
                       _sentence(rng, 1, 3), _sentence(rng, 3, 6))
            btag = rng.choice(("b", "strong"))
            itag = rng.choice(("i", "em"))
            link = (f' See <a href="https://example.org/ref/{rng.randint(1, 99)}">'
                    f"{_sentence(rng, 1, 2)}</a>."
                    if rng.random() < 0.5 else "")
            paras.append(f"<p>{a} <{btag}>{b}</{btag}> "
                         f"<{itag}>{c}</{itag}>.{link}</p>")
        else:
            paras.append(f"<p>{_sentence(rng, 8, 20, special=True)}.</p>")
    ordered = rng.random() < 0.3
    li_parts = []
    for k in range(rng.randint(2, 4)):
        inner = _sentence(rng, 2, 5)
        if k == 0 and rng.random() < 0.3:
            # nested sub-list inside the first item
            sub = "".join(f"<li>{_sentence(rng, 2, 4)}</li>"
                          for _ in range(rng.randint(2, 3)))
            li_parts.append(f"<li>{inner}<ul>{sub}</ul></li>")
        else:
            li_parts.append(f"<li>{inner}</li>")
    ltag = "ol" if ordered else "ul"
    items = "".join(li_parts)
    quote = (f"<blockquote>{_sentence(rng, 6, 12)}.</blockquote>"
             if rng.random() < 0.25 else "")
    table = ""
    if rng.random() < 0.5:
        hdr = "".join(f"<th>{w}</th>" for w in _words(rng, 3))
        rows = "".join(
            "<tr>" + "".join(f"<td>{w}</td>" for w in _words(rng, 3)) + "</tr>"
            for _ in range(rng.randint(2, 3))
        )
        table = f"<table><tr>{hdr}</tr>{rows}</table>"
    figure = (f'<img src="https://example.org/img/{rng.randint(1, 999)}.png" '
              'alt="fig">' if rng.random() < 0.2 else "")
    article = (
        f"<h1>{_sentence(rng, 3, 6).title()}</h1>"
        + paras[0]
        + figure
        + f"<h2>{_sentence(rng, 2, 4).title()}</h2>"
        + "".join(paras[1:])
        + quote
        + f"<{ltag}>{items}</{ltag}>"
        + table
    )
    return (
        "<html><head><title>page</title><style>body{margin:0}</style>"
        "<script>var t=1;</script></head><body>"
        f"<nav><ul>{link_farm(rng.randint(5, 9))}</ul></nav>"
        f"<header><a href='/'>Home</a> | {rng.choice(_VOCAB)} portal</header>"
        f"<div class='sidebar'><ul>{link_farm(rng.randint(4, 8))}</ul></div>"
        f"<article>{article}</article>"
        f"<footer>© 2026 {rng.choice(_VOCAB)} <a href='/tos'>terms</a> "
        f"<a href='/privacy'>privacy</a></footer>"
        "</body></html>"
    )


# ---------------------------------------------------------------------------
# PDF-like char streams
# ---------------------------------------------------------------------------

_LIGATURES = {"fi": "ﬁ", "fl": "ﬂ", "ff": "ﬀ"}


def _emit_word_chars(chars: list, word: str, x: float, y: float, size: float,
                     rng: random.Random, idx_start: int, sup: bool = False) -> tuple[float, int]:
    """Append char records for one word; returns (new_x, next_char_idx).

    Coordinate system: top-left origin, y down (documented divergence from raw
    PDF points; self-consistent between generator and kernel).
    """
    # ligature substitution: the payload carries the ligature glyph, the
    # kernel must expand it back (reference span_pre_proc.py:29-33)
    for lig, glyph in _LIGATURES.items():
        if lig in word and rng.random() < 0.5:
            word = word.replace(lig, glyph, 1)
            break
    w = CHAR_W * (size / BODY_SIZE)
    h = size
    ci = idx_start
    for ch in word:
        rec = {
            "char": ch,
            "bbox": [round(x, 2), round(y, 2), round(x + w, 2), round(y + h, 2)],
            "font": {"name": "Body" if not sup else "Sup", "size": size,
                     "flags": 0, "weight": 400},
            "rotation": 0.0,
            "char_idx": ci,
        }
        chars.append(rec)
        # corruption: shadow duplicate offset 1.0-2.5pt diagonal
        # (reference pdf_text_tool.py:107-146 drops these)
        if rng.random() < 0.02:
            d = 1.0 + rng.random() * 1.5
            chars.append({**rec, "bbox": [round(x + d, 2), round(y + d, 2),
                                          round(x + w + d, 2), round(y + h + d, 2)]})
        # corruption: near-identical jitter duplicate ≤1.0pt
        # (reference pdf_text_tool.py:278-314)
        if rng.random() < 0.015:
            j = rng.random() * 0.6
            chars.append({**rec, "bbox": [round(x + j, 2), round(y, 2),
                                          round(x + w + j, 2), round(y + h, 2)]})
        x += w
        ci += 1
    return x, ci


def _gen_pdf_block_chars(rng: random.Random, bbox: list[float], n_sentences: int,
                         idx_start: int, cjk: bool = False,
                         continues: bool = False,
                         lead_digit: bool = False) -> tuple[list, int]:
    """Lay words left-to-right, wrapping inside bbox; spaces are implied by
    gaps (1 char width), exactly like a real PDF text stream — the kernel
    re-inserts spaces when gap > 0.25 × median char width
    (reference span_pre_proc.py:605-649)."""
    x0, y0, x1, _ = bbox
    chars: list = []
    x, y = x0, y0
    ci = idx_start
    if cjk:
        text = rng.choice(_CJK_SENTENCES)
        for ch in text:
            if x + BODY_SIZE > x1:
                x, y = x0, y + LINE_H
            rec = {"char": ch,
                   "bbox": [round(x, 2), round(y, 2), round(x + BODY_SIZE, 2),
                            round(y + BODY_SIZE, 2)],
                   "font": {"name": "CJK", "size": BODY_SIZE, "flags": 0, "weight": 400},
                   "rotation": 0.0, "char_idx": ci}
            chars.append(rec)
            x += BODY_SIZE
            ci += 1
        return chars, ci

    sentence_lens = [rng.randint(6, 10) for _ in range(n_sentences)]
    for si, n_words in enumerate(sentence_lens):
        for wi in range(n_words):
            word = rng.choice(_VOCAB)
            if lead_digit and si == 0 and wi == 0:
                # digit-led paragraph head (exercises the D1 merge veto:
                # a block starting with a digit is never a continuation)
                word = str(rng.randint(2020, 2030))
            # corruption: full-width forms (reference char_utils.py:21-38)
            if rng.random() < 0.05:
                word = "".join(chr(ord(c) - ord("a") + 0xFF41)
                               if "a" <= c <= "z" else c for c in word)
            # sentence-final period attaches to the last word (no gap);
            # a "continues" block omits the final period so the paragraph
            # runs on into the next block/page (exercises the reference's
            # cross-page paragraph merge, para_split.py:265-306)
            if wi == n_words - 1 and not (continues and si == n_sentences - 1):
                word = word + "."
            w_px = CHAR_W * len(word)
            if x + w_px > x1:
                if rng.random() < 0.25 and len(word) >= 6 and x1 - x > 4 * CHAR_W:
                    # hyphen-split at line end; next line starts lowercase →
                    # kernel merges (reference char_utils.py:7-18)
                    k = int((x1 - x) / CHAR_W) - 1
                    k = max(2, min(k, len(word) - 2))
                    x, ci = _emit_word_chars(chars, word[:k] + "-", x, y,
                                             BODY_SIZE, rng, ci)
                    x, y = x0, y + LINE_H
                    x, ci = _emit_word_chars(chars, word[k:], x, y,
                                             BODY_SIZE, rng, ci)
                else:
                    x, y = x0, y + LINE_H
                    x, ci = _emit_word_chars(chars, word, x, y, BODY_SIZE,
                                             rng, ci)
            else:
                x, ci = _emit_word_chars(chars, word, x, y, BODY_SIZE, rng, ci)
            # superscript footnote marker at 0.7× size above the body band
            # (reference span_pre_proc.py:536-556)
            if wi != n_words - 1 and rng.random() < 0.05:
                x, ci = _emit_word_chars(chars, str(rng.randint(1, 9)), x,
                                         y - 0.2 * BODY_SIZE, 0.7 * BODY_SIZE,
                                         rng, ci, sup=True)
            # a "continues" paragraph must end with a FULL last line (the
            # page cut the sentence, it didn't trail off): pad the tail of
            # the final sentence with filler words that keep fitting
            if continues and si == n_sentences - 1 and wi == n_words - 1:
                # gap + one 1-char word costs 2*CHAR_W; stop when the line
                # is within 2*CHAR_W (< line height) of the right edge
                while x + 2 * CHAR_W <= x1:
                    x += CHAR_W
                    x, ci = _emit_word_chars(chars, "a", x, y, BODY_SIZE,
                                             rng, ci)
            # inline math run in the Math font (M2 `$...$` analog)
            if wi != n_words - 1 and rng.random() < 0.02:
                x += CHAR_W
                expr = rng.choice(("x+y", "a=b", "n<m"))
                for chm in expr:
                    chars.append({"char": chm,
                                  "bbox": [round(x, 2), round(y, 2),
                                           round(x + CHAR_W, 2),
                                           round(y + BODY_SIZE, 2)],
                                  "font": {"name": "Math", "size": BODY_SIZE,
                                           "flags": 0, "weight": 400},
                                  "rotation": 0.0, "char_idx": ci})
                    x += CHAR_W
                    ci += 1
            x += CHAR_W  # inter-word gap (no space char emitted)
    return chars, ci


def _row_spans(blk_chars: list) -> list:
    """Model-emitted span boxes for a block: cluster the block's chars into
    rows with the same consecutive y-overlap rule the kernel's line
    segmentation uses (>0.6 of the smaller height), one bbox per row —
    the layout model's text spans (exercises the E7 char→span fill,
    reference span_pre_proc.py:311-364)."""
    spans: list = []
    cur = None
    prev = None
    prev_glyph = None
    for c in blk_chars:
        b = c["bbox"]
        # a jitter/shadow duplicate of the previous char joins its row but
        # must not become the comparison anchor (its ≤2.5pt offset would
        # break the row at the next smaller char, e.g. a superscript)
        is_dup = (prev is not None and c["char"] == prev_glyph
                  and abs(b[0] - prev[0]) <= 2.5 and abs(b[1] - prev[1]) <= 2.5)
        if prev is not None and not is_dup:
            ov = min(prev[3], b[3]) - max(prev[1], b[1])
            new_row = ov <= 0.6 * min(prev[3] - prev[1], b[3] - b[1])
        else:
            new_row = prev is None
        if new_row:
            cur = [b[0], b[1], b[2], b[3]]
            spans.append(cur)
        else:
            cur[0] = min(cur[0], b[0])
            cur[1] = min(cur[1], b[1])
            cur[2] = max(cur[2], b[2])
            cur[3] = max(cur[3], b[3])
        if not is_dup:
            prev = b
            prev_glyph = c["char"]
    return [[round(v, 2) for v in s] for s in spans]


def _gen_split_table(rng: random.Random) -> tuple[str, str, bool, list | None]:
    """A table split across two pages: (anchor html, continuation html,
    marked, cell_merge).  marked=True → the continuation repeats the
    header and its caption says '(continued)' (only the marker path
    merges it); marked=False → headerless rows (the structural path
    merges it); cell_merge (rare) → the page break split one logical row
    and the VLM-style signal flags which visual columns' content
    continues (reference _apply_cell_merge)."""
    ncols = rng.randint(3, 4)
    hdr_words = _words(rng, ncols)
    hdr = "<tr>" + "".join(f"<th>{w}</th>" for w in hdr_words) + "</tr>"

    def rows(n):
        return "".join(
            "<tr>" + "".join(f"<td>{_sentence(rng, 1, 2)}</td>"
                             for _ in range(ncols)) + "</tr>"
            for _ in range(n))

    marked = rng.random() < 0.5
    if marked and rng.random() < 0.3:
        # unequal-column continuation: the anchor ends in a label+span
        # summary row (2 visual cells over ncols columns) and the marked
        # continuation arrives as narrow 2-cell rows — the structural
        # merge matches the boundary by rendered segments and aligns the
        # columns by colspan adjustment (reference
        # adjust_table_rows_colspan / check_rows_match)
        wide = (f"<tr><td>{_sentence(rng, 1, 2)}</td>"
                f'<td colspan="{ncols - 1}">{_sentence(rng, 1, 2)}</td>'
                "</tr>")
        anchor = f"<table>{hdr}{rows(rng.randint(1, 2))}{wide}</table>"
        cont_rows = "".join(
            f"<tr><td>{_sentence(rng, 1, 2)}</td>"
            f"<td>{_sentence(rng, 1, 2)}</td></tr>"
            for _ in range(rng.randint(1, 2)))
        return anchor, f"<table>{cont_rows}</table>", True, None
    anchor = f"<table>{hdr}{rows(rng.randint(2, 3))}</table>"
    if not marked and rng.random() < 0.25:
        # cell-split continuation: the break cut one logical row in two;
        # the continuation's first row holds only the continued halves
        # and the layout record carries the cell_merge column flags
        flags = [1 if rng.random() < 0.6 else 0 for _ in range(ncols)]
        if not any(flags):
            flags[rng.randrange(ncols)] = 1
        unflagged = [i for i, f in enumerate(flags) if not f]
        if unflagged and rng.random() < 0.3:
            # blank STRUCTURAL rowspan placeholder on an unflagged
            # column: the emptied first row must drop AND sink the
            # placeholder into the narrow next row
            # (_carry_rowspan_structure_to_next_row analog)
            sink_col = rng.choice(unflagged)
            half = "<tr>" + "".join(
                (f"<td>{_sentence(rng, 1, 2)}</td>" if f
                 else ('<td rowspan="2"></td>' if i == sink_col
                       else "<td></td>"))
                for i, f in enumerate(flags)) + "</tr>"
            narrow = "<tr>" + "".join(
                f"<td>{_sentence(rng, 1, 2)}</td>"
                for i in range(ncols) if i != sink_col) + "</tr>"
            cont = f"<table>{half}{narrow}</table>"
            return anchor, cont, False, flags
        half = "<tr>" + "".join(
            (f"<td>{_sentence(rng, 1, 2)}</td>" if f else "<td></td>")
            for f in flags) + "</tr>"
        cont = f"<table>{half}{rows(rng.randint(0, 1))}</table>"
        return anchor, cont, False, flags
    if marked:
        cont = f"<table>{hdr}{rows(rng.randint(1, 2))}</table>"
    else:
        cont = f"<table>{rows(rng.randint(1, 2))}</table>"
    return anchor, cont, marked, None


def _gen_pdf(rng: random.Random) -> str:
    # rare giant document (the long-document tail the processing-window /
    # Arrow-batch memory bounds exist for)
    n_pages = 15 if rng.random() < 0.004 else rng.randint(1, 2)
    # cross-page split: page 0's last body paragraph continues onto page 1
    # (reference cross-page merge, para_split.py:265-306)
    cross_page = n_pages == 2 and rng.random() < 0.5
    # reading order source: model-emitted index (B7) or geometric XY-cut
    # when the layout carries no order (B8, xycut_pp_sorter.py:85-414)
    no_index = rng.random() < 0.3
    # ~40% of docs carry model-emitted span boxes on their layout blocks
    # (the E7 char→span fill path); the rest use block-level assignment
    spans_mode = rng.random() < 0.4
    # cross-PAGE split table (reference table_merge.py in-document merge):
    # anchor last on page 0, continuation first on page 1
    table_split = n_pages == 2 and not cross_page and rng.random() < 0.25
    split_tbl = _gen_split_table(rng) if table_split else None
    # cross-PAGE vertical text split (D1 vertical merge variant,
    # para_split.py:309-345): page 0 ends with a vertical CJK column run
    # that continues as page 1's FIRST vertical block at the same x-range
    vertical_split = (n_pages == 2 and not cross_page and not table_split
                      and not no_index and rng.random() < 0.15)
    vtexts = None
    if vertical_split:
        pool = "".join(c for s in _CJK_SENTENCES for c in s
                       if c not in "。！？，、")
        i0 = rng.randrange(max(1, len(pool) - 12))
        vtexts = (pool[i0:i0 + 6], pool[i0 + 6:i0 + 12])
        if len(vtexts[1]) < 3:
            vertical_split, vtexts = False, None
    pages = []
    for p in range(n_pages):
        layout, chars = [], []
        ci = 0
        li = 0

        def add_block(label, bbox, n_sent=1, cjk=False, continues=False,
                      lead_digit=False):
            nonlocal ci, li
            blk_chars, ci = _gen_pdf_block_chars(rng, bbox, n_sent, ci,
                                                 cjk=cjk, continues=continues,
                                                 lead_digit=lead_digit)
            if blk_chars:
                xs0 = min(c["bbox"][0] for c in blk_chars)
                ys0 = min(c["bbox"][1] for c in blk_chars)
                xs1 = max(c["bbox"][2] for c in blk_chars)
                ys1 = max(c["bbox"][3] for c in blk_chars)
                bbox = [min(bbox[0], xs0), min(bbox[1], ys0),
                        max(bbox[2], xs1), max(bbox[3], ys1)]
            layout.append({"bbox": [round(v, 2) for v in bbox],
                           "label": label,
                           "index": -1 if no_index else li})
            if spans_mode and blk_chars:
                layout[-1]["spans"] = _row_spans(blk_chars)
            chars.extend(blk_chars)
            li += 1

        # header (discarded by B9 analog)
        add_block("header", [50.0, 20.0, 562.0, 34.0], 1)
        y = 60.0
        if p == 0:
            add_block("doc_title", [50.0, y, 562.0, y + 14.0], 1)
            y += 40.0
        elif cross_page:
            # continuation paragraph: first body block, starts lowercase —
            # except ~30%: a digit-led paragraph that must NOT merge (the
            # reference's span_start_with_num veto, para_split.py:292)
            h = rng.randint(2, 4) * LINE_H
            add_block("text", [50.0, y, 562.0, y + h], rng.randint(1, 2),
                      lead_digit=rng.random() < 0.3)
            y += h + 14.0
        def add_text_line_block(label, text, y, size=BODY_SIZE, x0=50.0):
            """One literal text line as chars (captions, code lines, list
            items keep their exact glyph sequence; spaces become gaps)."""
            nonlocal ci, li
            blk_chars: list = []
            x = x0
            j = ci
            for word in text.split(" "):
                for chx in word:
                    blk_chars.append({
                        "char": chx,
                        "bbox": [round(x, 2), round(y, 2),
                                 round(x + CHAR_W, 2), round(y + size, 2)],
                        "font": {"name": "Body", "size": size, "flags": 0,
                                 "weight": 400},
                        "rotation": 0.0, "char_idx": j})
                    x += CHAR_W
                    j += 1
                x += CHAR_W  # word gap
            ci = j
            layout.append({"bbox": [round(x0, 2), round(y, 2), round(x, 2),
                                    round(y + size, 2)],
                           "label": label, "index": -1 if no_index else li})
            if spans_mode and blk_chars:
                layout[-1]["spans"] = _row_spans(blk_chars)
            chars.extend(blk_chars)
            li += 1

        def add_multiline_block(label, lines, y, x0s=None):
            nonlocal ci, li
            blk_chars: list = []
            j = ci
            yy = y
            x_min = min(x0s) if x0s else 50.0
            x_max = x_min
            for li_n, line in enumerate(lines):
                x = x0s[li_n] if x0s else 50.0
                for word in line.split(" "):
                    for chx in word:
                        blk_chars.append({
                            "char": chx,
                            "bbox": [round(x, 2), round(yy, 2),
                                     round(x + CHAR_W, 2),
                                     round(yy + BODY_SIZE, 2)],
                            "font": {"name": "Mono", "size": BODY_SIZE,
                                     "flags": 0, "weight": 400},
                            "rotation": 0.0, "char_idx": j})
                        x += CHAR_W
                        j += 1
                    x += CHAR_W
                x_max = max(x_max, x)
                yy += LINE_H
            ci = j
            layout.append({"bbox": [round(x_min, 2), round(y, 2),
                                    round(x_max, 2), round(yy, 2)],
                           "label": label, "index": -1 if no_index else li})
            if spans_mode and blk_chars:
                layout[-1]["spans"] = _row_spans(blk_chars)
            chars.extend(blk_chars)
            li += 1
            return yy

        def add_vertical_run(vtext, yv):
            """Single vertical CJK column (B5 shape) at a fixed x; char
            extents define the merge geometry the D1 vertical variant
            reads."""
            nonlocal ci, li
            vx, vy = 530.0, yv
            j = ci
            for chv in vtext:
                chars.append({"char": chv,
                              "bbox": [vx, round(vy, 2), vx + 10.0,
                                       round(vy + 10.0, 2)],
                              "font": {"name": "CJK", "size": BODY_SIZE,
                                       "flags": 0, "weight": 400},
                              "rotation": 0.0, "char_idx": j})
                vy += 12.0
                j += 1
            ci = j
            layout.append({"bbox": [vx - 2, round(yv - 2, 2), vx + 12.0,
                                    round(vy + 2, 2)],
                           "label": "text", "index": li})
            li += 1
            return vy + 12.0

        if vertical_split and p == 1:
            # continuation column FIRST on page 1 (same x-range as the
            # page-0 tail column → the vertical merge guards hold)
            y = add_vertical_run(vtexts[1], y)
        if table_split and p == 1:
            # continuation table FIRST on page 1 (cross-page merge target)
            anchor_html, cont_html, marked, cmerge = split_tbl
            leading_text_marker = marked and rng.random() < 0.5
            if leading_text_marker:
                # the '(continued)' marker arrives as page-leading PLAIN
                # text — the B10 leading-continuation fallback must
                # promote it to the table's caption
                # (visual_magic_model_utils.py:133-173)
                add_text_line_block("text", "Table 9 (continued)", y)
                y += 14.0 + BODY_SIZE
            rec = {"bbox": [50.0, round(y, 2), 562.0, round(y + 60, 2)],
                   "label": "table",
                   "index": -1 if no_index else li,
                   "html": cont_html}
            if cmerge:
                rec["cell_merge"] = cmerge
            layout.append(rec)
            li += 1
            y += 64.0
            if marked and not leading_text_marker:
                add_text_line_block("table_caption",
                                    "Table 9 (continued)", y)
                y += 24.0
        two_col = rng.random() < 0.4
        if two_col:
            if rng.random() < 0.25:
                # full-width banner between two column rows — the XY-Cut++
                # cross-layout case the pre-mask exists for
                # (xycut_pp_sorter.py:149-183).  Fixed geometry: row gaps
                # (10pt) < gutter (20pt), so the masked cut goes
                # column-major; without the mask the banner fills the
                # gutter projection and would force row-major.
                rh = 4 * LINE_H
                for cx0, cx1 in ((50.0, 296.0), (316.0, 562.0)):
                    add_block("text", [cx0, y, cx1, y + rh],
                              rng.randint(1, 2))
                add_block("text", [50.0, y + rh + 10.0, 562.0,
                                   y + rh + 34.0], 1)
                for cx0, cx1 in ((50.0, 296.0), (316.0, 562.0)):
                    add_block("text", [cx0, y + rh + 44.0, cx1,
                                       y + 2 * rh + 44.0], rng.randint(1, 2))
                y += 2 * rh + 54.0
            else:
                max_yy = y
                for cx0, cx1 in ((50.0, 296.0), (316.0, 562.0)):
                    yy = y
                    for _ in range(rng.randint(1, 2)):
                        h = rng.randint(3, 6) * LINE_H
                        add_block("paragraph_title" if rng.random() < 0.25
                                  else "text",
                                  [cx0, yy, cx1, yy + h], rng.randint(1, 2),
                                  cjk=rng.random() < 0.05)
                        yy += h + 14.0
                    max_yy = max(max_yy, yy)
                y = max_yy + 10.0
        else:
            for _ in range(rng.randint(2, 4)):
                h = rng.randint(3, 6) * LINE_H
                add_block("paragraph_title" if rng.random() < 0.2 else "text",
                          [50.0, y, 562.0, y + h], rng.randint(1, 2),
                          cjk=rng.random() < 0.05)
                y += h + 14.0

        # document-level label tail (reference PP-DocLayoutV2 labels,
        # pipeline_magic_model.py:18-41): an ABSTRACT paragraph near the
        # top of page 0 (breaks merge groups like titles), a "content"
        # TOC block (INDEX: every line an item), and a bibliography tail
        # of ADJACENT reference_content blocks on the last page (they
        # must group into ONE reference list in content_list/v2)
        if p == 0 and rng.random() < 0.12:
            h = rng.randint(2, 4) * LINE_H
            add_block("abstract", [50.0, y, 562.0, y + h],
                      rng.randint(1, 2))
            y += h + 14.0
        if p == 0 and rng.random() < 0.10:
            toc_lines = [f"{_sentence(rng, 2, 3).title()} "
                         f"{rng.randint(1, 40)}"
                         for _ in range(rng.randint(3, 5))]
            y = add_multiline_block("content", toc_lines, y) + 12.0
        if p == n_pages - 1 and rng.random() < 0.15:
            for _r in range(rng.randint(2, 4)):
                ref_lines = [f"[{_r + 1}] {_sentence(rng, 3, 6)}."]
                if rng.random() < 0.3:
                    ref_lines.append(_sentence(rng, 2, 4) + ".")
                y = add_multiline_block("reference_content",
                                        ref_lines, y) + 8.0

        # rich block kinds (each with its own extraction kernel path)
        r_rich = rng.random()
        if r_rich < 0.25:
            # table block: structure-rec html on the layout record (G4)
            # + caption/footnote blocks matched by B10
            html, _nc = _gen_office(rng)
            layout.append({"bbox": [50.0, round(y, 2), 562.0, round(y + 60, 2)],
                           "label": "table", "index": -1 if no_index else li,
                           "html": html})
            li += 1
            y += 64.0
            # ~25% use the GENERIC figure_title / vision_footnote labels
            # (the reference PIPELINE path's only child labels) — the
            # kind-agnostic attach must still find the table
            cap_lbl = ("figure_title" if rng.random() < 0.25
                       else "table_caption")
            add_text_line_block(
                cap_lbl, f"Table {p + 1}: {_sentence(rng, 3, 6)}.", y)
            y += 24.0
            if rng.random() < 0.4:
                fn_lbl = ("vision_footnote" if rng.random() < 0.25
                          else "table_footnote")
                add_text_line_block(
                    fn_lbl, f"Note: {_sentence(rng, 2, 4)}.", y)
                y += 24.0
        elif r_rich < 0.40:
            if rng.random() < 0.3:
                # caption + SAME-LINE text fragment ABOVE the image: the
                # B10 inline-caption fallback must promote the fragment
                # (visual_magic_model_utils.py:101-131)
                add_text_line_block("image_caption",
                                    f"Figure {p + 1}:", y)
                add_text_line_block("text", _sentence(rng, 2, 4), y,
                                    x0=260.0)
                y += 14.0 + BODY_SIZE
                layout.append({"bbox": [150.0, round(y, 2), 450.0,
                                        round(y + 80, 2)],
                               "label": "image",
                               "index": -1 if no_index else li})
                li += 1
                y += 84.0
            else:
                # image block (opaque body) + caption
                layout.append({"bbox": [150.0, round(y, 2), 450.0,
                                        round(y + 80, 2)],
                               "label": "image",
                               "index": -1 if no_index else li})
                li += 1
                y += 84.0
                cap_lbl = ("figure_title" if rng.random() < 0.25
                           else "image_caption")
                add_text_line_block(
                    cap_lbl,
                    f"Figure {p + 1}: {_sentence(rng, 3, 6)}.", y)
                y += 24.0
        elif r_rich < 0.55:
            # interline equation: latex on the layout record (G2/MFR)
            latex = rng.choice((
                r"\frac{a}{b} = \sum_{i=0}^{n} x_i",
                r"e^{i\pi} + 1 = 0",
                r"\int_0^1 f(x)\,dx",
                r"\bar{x} = \frac{1}{n}\sum x_i",
            ))
            eq_rec = {"bbox": [200.0, round(y, 2), 400.0, round(y + 24, 2)],
                      "label": "interline_equation",
                      "index": -1 if no_index else li, "latex": latex}
            if rng.random() < 0.3:
                eq_rec["tag"] = p * 10 + 1  # D3 formula number
            layout.append(eq_rec)
            li += 1
            y += 30.0
        elif r_rich < 0.70:
            if rng.random() < 0.18:
                # generic caption ABOVE the code/algorithm block — CODE
                # is a visual main type, the kind-agnostic attach must
                # land it (pipeline_magic_model.py:44)
                add_text_line_block(
                    "figure_title",
                    f"Listing {rng.randint(1, 9)}: {_sentence(rng, 2, 4)}.",
                    y)
                y += 24.0
            if rng.random() < 0.3:
                # ALGORITHM label: pseudo-code that guesses NO language
                # (reference "algorithm" -> BlockType.CODE with the
                # ALGORITHM sub_type kept, pipeline_magic_model.py:
                # 145-156 -> pre-wrap HTML render)
                algo_lines = rng.choice((
                    ["for each x in S do", "  y <- f(x)", "end for"],
                    ["while queue not empty do", "  pop u", "end while"],
                    ["procedure MERGE(a, b)", "  join halves",
                     "end procedure"],
                ))
                y = add_multiline_block("algorithm", algo_lines, y) + 12.0
            else:
                code_lines = rng.choice((
                    ["def run(x):", "return x + 1"],
                    ["import os", "print(os.name)"],
                    ["SELECT a FROM t", "WHERE a > 1"],
                    ["const f = (x) => x", "var y = f(2)"],
                ))
                y = add_multiline_block("code", code_lines, y) + 12.0
        elif r_rich < 0.85:
            ld = rng.random()
            if ld < 0.3:
                # numbered list that the layout model mislabels as text —
                # the kernel's D1 classifier must recover it
                items = [f"{k + 1}. {_sentence(rng, 2, 5)}"
                         for k in range(rng.randint(3, 5))]
                y = add_multiline_block("text", items, y) + 12.0
            elif ld < 0.45:
                # MARKERLESS sentence-per-line items: the geometric D1
                # classifier fires on the end-flag statistics and marks
                # the line AFTER each '.'-terminated line as an item
                # start (para_split.py:216-226)
                items = [f"{_sentence(rng, 2, 5)}."
                         for _ in range(rng.randint(3, 5))]
                y = add_multiline_block("text", items, y) + 12.0
            elif ld < 0.55:
                # right-gap delimited items (no end flags, no markers):
                # equal-width long lines + short ragged tails — the gap
                # after each tail starts the next item (:227-240)
                base = "kernel merge window table batch stream"
                lines = [base, _sentence(rng, 1, 2),
                         base, _sentence(rng, 1, 2)]
                y = add_multiline_block("text", lines, y) + 12.0
            elif ld < 0.63:
                # indented digit-led ordered items with flush-left
                # continuations (num_start == flag_end, :241-248); the
                # last continuation is the longest line so the
                # multi-paragraph veto stays off
                lines = [f"1. {_sentence(rng, 2, 3)}.",
                         _sentence(rng, 2, 3),
                         f"2. {_sentence(rng, 2, 3)}.",
                         "window batch merge table stream kernel row"]
                y = add_multiline_block("text", lines, y,
                                        x0s=[70.0, 50.0, 70.0, 50.0]) \
                    + 12.0
            else:
                items = [f"• {_sentence(rng, 2, 5)}"
                         for _ in range(rng.randint(2, 4))]
                y = add_multiline_block("list", items, y) + 12.0
        elif r_rich < 0.93:
            # vertical CJK run (B5/B6): single column, chars stacked
            vtext = rng.choice(_CJK_SENTENCES)[:6]
            vx = 530.0
            vy = y
            j = ci
            for chv in vtext:
                chars.append({"char": chv,
                              "bbox": [vx, round(vy, 2), vx + 10.0,
                                       round(vy + 10.0, 2)],
                              "font": {"name": "CJK", "size": BODY_SIZE,
                                       "flags": 0, "weight": 400},
                              "rotation": 0.0, "char_idx": j})
                vy += 12.0
                j += 1
            ci = j
            layout.append({"bbox": [vx - 2, round(y - 2, 2), vx + 12.0,
                                    round(vy + 2, 2)],
                           "label": "text", "index": -1 if no_index else li})
            if spans_mode:
                # one tall span: exercises the vertical-span fill rule
                # (h > 2.3× median and > 2.3× width, span_pre_proc.py:94)
                layout[-1]["spans"] = [[vx, round(y, 2), vx + 10.0,
                                        round(vy, 2)]]
            li += 1
            y = vy + 12.0
        elif r_rich < 0.97:
            # TOC/index block mislabeled as text: left-flush lines ending
            # in page numbers — the D1 geometric classifier (edge stats +
            # ≥80% digit-end) must recover it as an index block
            toc = [f"{_sentence(rng, 2, 4)} {rng.randint(1, 99)}"
                   for _ in range(rng.randint(4, 6))]
            y = add_multiline_block("text", toc, y) + 12.0
        if p == 0 and cross_page:
            # the continuing paragraph: ends mid-sentence (no period)
            h = rng.randint(2, 4) * LINE_H
            add_block("text", [50.0, y, 562.0, y + h], rng.randint(1, 2),
                      continues=True)
            y += h + 14.0
        if vertical_split and p == 0:
            # anchor column LAST on page 0 (no stop flag at its foot —
            # the continuation on page 1 merges into it)
            y = add_vertical_run(vtexts[0], y)
        if table_split and p == 0:
            # anchor table LAST on page 0 (its caption is attached and
            # removed from the block list, so adjacency survives)
            add_text_line_block("table_caption",
                                f"Table 9: {_sentence(rng, 3, 5)}.", y)
            y += 24.0
            layout.append({"bbox": [50.0, round(y, 2), 562.0,
                                    round(y + 60, 2)],
                           "label": "table",
                           "index": -1 if no_index else li,
                           "html": split_tbl[0]})
            li += 1
            y += 64.0
        # page number (discarded)
        add_block("page_number", [290.0, 760.0, 322.0, 772.0], 1)

        # corruption: rotated watermark chars scattered across the page
        # (reference span_pre_proc.py:173-208 filters non-axis rotations)
        for wch in "DRAFT":
            wx, wy = rng.uniform(200, 400), rng.uniform(300, 500)
            chars.append({"char": wch,
                          "bbox": [round(wx, 2), round(wy, 2),
                                   round(wx + 20, 2), round(wy + 20, 2)],
                          "font": {"name": "WM", "size": 20.0, "flags": 0,
                                   "weight": 400},
                          "rotation": 30.0, "char_idx": 10_000_000 + ci})
            ci += 1

        # corruption: shuffle a slice of the char records (the kernel must
        # sort by char_idx only when out of order, span_pre_proc.py:609-614)
        if len(chars) > 30 and rng.random() < 0.5:
            a = rng.randrange(0, len(chars) - 20)
            seg = chars[a:a + 15]
            rng.shuffle(seg)
            chars[a:a + 15] = seg

        pages.append({"page_idx": p, "page_size": [PAGE_W, PAGE_H],
                      "chars": chars, "layout": layout})
    return json.dumps({"kind": "pdf_chars", "pages": pages}, ensure_ascii=False)


# ---------------------------------------------------------------------------
# DOCX styled-run fragments (O1: linear paragraph walk, style chain)
# ---------------------------------------------------------------------------

def _gen_chart(rng: random.Random) -> dict:
    """Parsed-chart payload (post-XML ChartSpec analog; reference
    office_chart.py:180-283): category/date/scatter/bubble series with
    the edge cases the renderer must pin — missing series names
    (→ SeriesN), ragged value lengths (short columns pad with ''),
    integral floats (→ int strings), date-serial categories (both
    epochs), multi-level categories (' / ' join), shared vs distinct
    scatter X, HTML-hostile strings, and the no-series workbook
    fallback (including the fully-unparsable chart that renders '')."""
    d = rng.random()
    if d < 0.30:  # category chart
        ncat = rng.randint(3, 5)
        multi = rng.random() < 0.2
        cats = [[f"G{i // 2 + 1}", _words(rng, 1)[0].title()] if multi
                else _sentence(rng, 1, 2).title() for i in range(ncat)]
        nser = rng.randint(1, 3)
        series = []
        for si in range(nser):
            vals = [float(rng.randint(1, 500)) if rng.random() < 0.7
                    else round(rng.uniform(0.5, 99.5), 2)
                    for _ in range(ncat)]
            if rng.random() < 0.15 and len(vals) > 1:
                vals = vals[:-1]  # ragged: short column pads with ''
            s = {"vals": vals}
            if si == 0 or rng.random() < 0.7:
                s["cats"] = cats
            if rng.random() < 0.75:
                s["name"] = _words(rng, 1)[0].title() + \
                    (" & co <x>" if rng.random() < 0.1 else "")
            series.append(s)
        spec = {"plot_kind": "category", "series": series}
        if rng.random() < 0.6:
            spec["cat_axis_title"] = _words(rng, 1)[0].title()
        if rng.random() < 0.4:
            spec["val_axis_title"] = _words(rng, 1)[0].title()
        return spec
    if d < 0.45:  # date-axis chart (Excel serials, both epochs)
        base = rng.randint(43831, 45500)
        cats = [base + 30 * i + (0.5 if rng.random() < 0.15 else 0)
                for i in range(rng.randint(3, 5))]
        series = [{"cats": cats,
                   "vals": [rng.randint(10, 900) for _ in cats],
                   "name": f"{_words(rng, 1)[0].title()} {si + 1}"}
                  for si in range(rng.randint(1, 2))]
        return {"plot_kind": "date", "series": series,
                "date_1904": rng.random() < 0.25,
                "cat_axis_title": "Date" if rng.random() < 0.5 else ""}
    if d < 0.62:  # scatter
        npt = rng.randint(3, 6)
        shared = rng.random() < 0.5
        xs0 = [round(rng.uniform(0, 50), 1) for _ in range(npt)]
        series = []
        for si in range(rng.randint(1, 3)):
            xs = xs0 if shared else \
                [round(rng.uniform(0, 50), 1) for _ in range(npt)]
            s = {"xs": list(xs),
                 "vals": [round(rng.uniform(-5, 105), 2)
                          for _ in range(npt)]}
            if rng.random() < 0.7:
                s["name"] = _words(rng, 1)[0].title()
            series.append(s)
        spec = {"plot_kind": "scatter", "series": series}
        if rng.random() < 0.5:
            spec["x_axis_title"] = _words(rng, 1)[0].title()
        return spec
    if d < 0.72:  # bubble
        npt = rng.randint(3, 5)
        shared = rng.random() < 0.5
        xs0 = [float(rng.randint(1, 40)) for _ in range(npt)]
        series = []
        for si in range(rng.randint(1, 2)):
            xs = xs0 if shared else \
                [float(rng.randint(1, 40)) for _ in range(npt)]
            series.append({"xs": list(xs),
                           "vals": [rng.randint(5, 95) for _ in range(npt)],
                           "sizes": [round(rng.uniform(0.5, 9.5), 1)
                                     for _ in range(npt)],
                           "name": _words(rng, 1)[0].title()})
        return {"plot_kind": "bubble", "series": series,
                "x_axis_title": "X" if rng.random() < 0.5 else ""}
    if d < 0.82:  # scatter series missing its X vector → render '' →
        # workbook fallback chain (office_chart.py:166-177)
        return {"plot_kind": "scatter",
                "series": [{"vals": [1, 2, 3]}],
                "workbook": [[f"col{j}" for j in range(3)]] +
                            [[_sentence(rng, 1, 2), rng.randint(1, 99),
                              float(rng.randint(1, 9))]
                             for _ in range(rng.randint(2, 4))]}
    if d < 0.94:  # no parsable series → embedded-workbook table, with
        # the trim semantics exercised (leading/trailing empty rows,
        # trailing empty cells, interior gaps kept)
        body = [[_sentence(rng, 1, 2), rng.randint(1, 999), ""]
                if rng.random() < 0.3 else
                [_sentence(rng, 1, 2), rng.randint(1, 999),
                 round(rng.uniform(0, 9), 1)]
                for _ in range(rng.randint(2, 4))]
        rows = [["", "", ""],
                ["Item", "Count", "Score", "", ""]] + body + [["", ""]]
        return {"plot_kind": rng.choice(("category", "unknownChart")),
                "series": [], "workbook": rows}
    # fully unparsable: no series, no workbook → '' (docx keeps the
    # typed empty block, pptx drops it)
    return {"plot_kind": "category", "series": []}


def _gen_docx(rng: random.Random) -> str:
    paras = []
    head_anchor = None
    # ~25%: a hierarchical TOC at the top (reference plain-TOC path,
    # docx_converter.py:3063-3097: per-entry TOC level + bookmark anchor
    # + tab-separated page number; hidden webHidden runs dropped
    # :375-388).  Entries exercise base-level normalization, the
    # text-number level correction (:2870-2891), the page-tail strip and
    # its negatives (output_builders.py:164-203), uniform-style collapse
    # (:205-236), plain-text-only TOC hyperlinks (:238-267), and the
    # anchor-less cover-text guard (:3085-3087).
    toc_d = rng.random()
    if toc_d < 0.25:
        base = rng.randint(0, 1)
        lvl = base
        for k in range(rng.randint(3, 6)):
            ed = rng.random()
            entry = _sentence(rng, 2, 4).title()
            runs = []
            if ed < 0.12 and lvl > base:
                # multi-level number prefix one step SHALLOWER than the
                # style level → the text correction pulls it up
                entry = f"{rng.randint(1, 9)}.{rng.randint(1, 9)} {entry}"
            if ed < 0.27 and not (ed < 0.12):
                # uniform-style item: every run shares one style → ONE
                # marker around the joined text
                style_key = "italic" if ed < 0.2 else "bold"
                # runs carry their own whitespace (Word concatenates run
                # texts directly; the converter adds no separators)
                runs = [{"text": entry + " ", style_key: True},
                        {"text": _sentence(rng, 1, 2), style_key: True}]
            elif ed < 0.32:
                runs = [{"text": entry},
                        {"math": rng.choice((r"x^2", r"\alpha"))}]
            elif ed < 0.42:
                # hyperlink run: TOC keeps the visible text only
                runs = [{"text": entry,
                         "link": "https://example.org/ref"}]
            else:
                runs = [{"text": entry}]
            # page tail: visible tab+token (stripped when page-like),
            # a NON-page tail kept as body, or the legacy hidden run
            td = rng.random()
            if td < 0.35:
                tok = rng.choice((str(rng.randint(1, 99)), "iv", "xii",
                                  "B"))
                tgt = runs[-1] if "math" not in runs[-1] else runs[0]
                tgt["text"] = str(tgt.get("text", "")) + "\t" + tok
            elif td < 0.45:
                runs.append({"text": " see\tchapter notes"})
            elif td < 0.6:
                runs.append({"text": str(rng.randint(1, 40)),
                             "hidden": True})
            anchor = None
            if k == 0 or rng.random() < 0.7:
                anchor = f"_Toc{rng.randint(10000000, 99999999)}"
                if k == 0:
                    head_anchor = anchor
            para = {"style": "TOC", "runs": runs, "ilvl": lvl}
            if anchor:
                para["anchor"] = anchor
            paras.append(para)
            # plausible nesting walk
            step = rng.random()
            if step < 0.4 and lvl < base + 2:
                lvl += 1
            elif step < 0.6 and lvl > base:
                lvl -= 1
    elif toc_d < 0.30:
        # cover-text guard: TOC-styled, anchor-less, BEFORE any index
        # entry → must become a plain text paragraph
        paras.append({"style": "TOC",
                      "runs": [{"text": _sentence(rng, 3, 6).title()}]})
    h1 = {"style": "Heading1",
          "runs": [{"text": _sentence(rng, 3, 6).title()}]}
    if head_anchor is not None and rng.random() >= 0.15:
        # the first TOC anchor lands on the heading it targets
        # (bookmarkStart extraction, docx_converter.py:3017-3042) →
        # md/content_list/middle all carry the target; the OTHER TOC
        # anchors dangle and must lose their links
        # (_link_index_entries_by_anchor).  ~15% of TOC docs mount NO
        # body anchor at all — the reference's early-return quirk then
        # keeps every TOC link
        h1["anchor"] = head_anchor
    paras.append(h1)
    # one numbering chain id per doc: a later group with the same numId
    # CONTINUES the count across interruptions (reference counter cache,
    # docx_converter.py:96-114)
    num_id = rng.randint(1, 9)
    ordered_chain = rng.random() < 0.5
    for _ in range(rng.randint(2, 5)):
        kind = rng.random()
        if kind < 0.15:
            paras.append({"style": "Heading2",
                          "runs": [{"text": _sentence(rng, 2, 4).title()}]})
        elif kind < 0.35:
            for _k in range(rng.randint(2, 4)):
                num = {"id": num_id, "ilvl": 0, "ordered": ordered_chain}
                # ~12%: custom numbering start (w:start / startOverride,
                # resolved pre-XML onto the payload; reference
                # _get_numbering_level_start docx_converter.py:2388-2421)
                if rng.random() < 0.12:
                    num["start"] = rng.randint(3, 9)
                paras.append({"style": "ListParagraph", "num": num,
                              "runs": [{"text": _sentence(rng, 2, 5)}]})
                # occasional nested sub-items (ilvl 1); TWO parents with
                # subs exercise the deeper-counter reset on parent
                # advance (_advance_list_counter :2433-2438)
                if rng.random() < 0.25:
                    for _s in range(rng.randint(1, 2)):
                        paras.append({"style": "ListParagraph",
                                      "num": {"id": num_id, "ilvl": 1,
                                              "ordered": ordered_chain},
                                      "runs": [{"text":
                                                _sentence(rng, 2, 4)}]})
        else:
            # runs carry their OWN whitespace like real Word runs (the
            # converter concatenates run texts with no separator;
            # inline_renderer joins parts with '').  The joiner space
            # attaches to either the preceding or the following run.
            runs = []
            for _k in range(rng.randint(1, 4)):
                run = {"text": _sentence(rng, 3, 8, special=True) + ".",
                       "bold": rng.random() < 0.2,
                       "italic": rng.random() < 0.15}
                # full style chain (r4): underline/strikethrough/super/
                # subscript (+ emphasis, r5) are COMPLEX styles — one
                # such run switches the whole block to HTML inline tags
                # (inline_renderer.py:559-582)
                sd = rng.random()
                if sd < 0.06:
                    run["underline"] = True
                elif sd < 0.1:
                    run["strikethrough"] = True
                elif sd < 0.13:
                    run["script"] = "super" if sd < 0.115 else "sub"
                elif sd < 0.15:
                    run["emphasis"] = True
                if runs:
                    if rng.random() < 0.5:
                        runs[-1]["text"] = str(runs[-1]["text"]) + " "
                    else:
                        run["text"] = " " + run["text"]
                runs.append(run)
            rcd = rng.random()
            if rcd < 0.12 and runs:
                # mid-word split: one run's sentence splits at an interior
                # character into two SAME-STYLE runs — they must regroup
                # into one wrapper and concatenate seamlessly
                # (_append_markdown_grouped_text_parts,
                # inline_renderer.py:753-790)
                ri = rng.randint(0, len(runs) - 1)
                t = str(runs[ri]["text"])
                if len(t) > 6:
                    cut = rng.randint(2, len(t) - 3)
                    left = dict(runs[ri]); right = dict(runs[ri])
                    left["text"], right["text"] = t[:cut], t[cut:]
                    runs[ri:ri + 1] = [left, right]
            elif rcd < 0.18:
                # markdown boundary-space rule: a bold run ending in
                # punctuation directly abuts a plain text run — the
                # renderer must insert ONE space so CommonMark can close
                # the wrapper (_needs_markdown_boundary_space :194-222)
                runs.append({"text": " " + _sentence(rng, 1, 2) + ":",
                             "bold": True})
                runs.append({"text": _sentence(rng, 2, 4) + "."})
            elif rcd < 0.23 and runs:
                # visible-space run: whitespace styled underline /
                # strikethrough renders as '_'/'-' markers
                # (_render_visible_space_marker_text :317-356)
                key = "underline" if rcd < 0.205 else "strikethrough"
                runs.append({"text": " " * rng.randint(1, 3), key: True})
                runs.append({"text": _sentence(rng, 2, 4) + "."})
            # OMML math run (oMath2Latex analog: latex on the run; the
            # join pads inline equations with spaces, :230-240; ~25%
            # carry the display flag -> $$ block, :919-929)
            if rng.random() < 0.15:
                mrun = {"math": rng.choice(
                    (r"E=mc^2", r"\sum_{i} x_i", r"a_n"))}
                if rng.random() < 0.25:
                    mrun["display"] = True
                runs.append(mrun)
                runs.append({"text": " " + _sentence(rng, 2, 4) + "."})
            # hyperlink runs (r4 directive #2): same-target styled split
            # runs that must group into ONE [label](url); URLs with parens
            # (→ %28/%29), labels with brackets (→ \[ \]), and the
            # invalid targets ('' / '.') that must degrade to plain text
            # (reference office_rich_text.py:172-228)
            hld = rng.random()
            if hld < 0.25:
                url = rng.choice((
                    "https://example.org/a",
                    "https://example.org/p(1)?q=2",
                    "https://example.org/docs#s3",
                    "", "."))
                if runs:
                    runs[-1]["text"] = str(runs[-1].get("text", "")) + " "
                if hld < 0.08:
                    # split styled group: two adjacent runs, one target
                    # (a mixed-style label forces the whole block to
                    # HTML via _hyperlink_requires_html :494-516)
                    runs.append({"text": _sentence(rng, 1, 2) + " ",
                                 "bold": True, "link": url})
                    runs.append({"text": _sentence(rng, 1, 2),
                                 "link": url})
                else:
                    label = _sentence(rng, 1, 3)
                    if hld < 0.12:
                        label = f"see [{label}]"
                    runs.append({"text": label, "link": url,
                                 "italic": rng.random() < 0.3})
                runs.append({"text": " " + _sentence(rng, 2, 4) + "."})
            paras.append({"style": "Normal", "runs": runs})
            # occasional inline picture: image-run paragraph (reference
            # picture refs -> IMAGE blocks); sometimes image-only
            if rng.random() < 0.12:
                import base64 as _b64
                import hashlib as _hl
                blob = _hl.sha256(
                    f"docximg-{rng.randint(0, 9999)}".encode()).digest() * 3
                img = {"image": {"data_b64":
                                 _b64.b64encode(blob).decode(),
                                 "rel_id": f"rId{rng.randint(1, 9)}"}}
                if rng.random() < 0.5:
                    paras.append({"style": "Normal", "runs": [img]})
                else:
                    paras.append({"style": "Normal", "runs": [
                        {"text": _sentence(rng, 2, 4) + "."}, img]})
                # ~36% of pictures get a caption paragraph (office
                # caption machinery, office_magic_model.py:737-…):
                # SEQ-field Caption style, a prefix-promoted plain text
                # ("fig"/图), or a seq-less Caption style that must stay
                # plain text
                cd = rng.random()
                if cd < 0.16:
                    paras.append(
                        {"style": "Caption", "seq": True,
                         "runs": [{"text":
                                   f"Figure {rng.randint(1, 20)}: "},
                                  {"text": _sentence(rng, 2, 5) + ".",
                                   "italic": cd < 0.04}]})
                elif cd < 0.30:
                    head = "图" if cd < 0.22 else "fig. "
                    paras.append(
                        {"style": "Normal",
                         "runs": [{"text": f"{head}{rng.randint(1, 9)}: "
                                   + _sentence(rng, 2, 5) + "."}]})
                elif cd < 0.36:
                    paras.append(
                        {"style": "Caption", "seq": False,
                         "runs": [{"text": "Source: "
                                   + _sentence(rng, 2, 4) + "."}]})
    # ~10%: a numbered-heading structure (reference
    # _detect_heading_list_numids docx_converter.py:2688-2765 +
    # heading-numid consumption :1447-1464 + the document section-number
    # pass, model_output_to_middle_json.py:132-168): a multi-level numId
    # whose items interleave with body text converts to TITLE blocks
    # with computed "1.2.1" section numbers; sometimes preceded by a
    # literal-numbered Heading that SYNCS the counters, and sometimes an
    # unordered (bullet) chain → titles without numbers.  A single-level
    # interleaved chain is also emitted ~30% as the negative case (must
    # STAY a list).
    hnd = rng.random()
    if hnd < 0.10:
        hnid = num_id + 10
        h_ordered = rng.random() < 0.75
        if rng.random() < 0.4:
            # literal section number on a styled heading → counter sync
            paras.append({"style": "Heading1",
                          "runs": [{"text": f"{rng.randint(2, 5)} "
                                    + _sentence(rng, 2, 3).title()}]})
        for si in range(rng.randint(2, 3)):
            paras.append({"style": "ListParagraph",
                          "num": {"id": hnid, "ilvl": 0,
                                  "ordered": h_ordered},
                          "runs": [{"text": _sentence(rng, 2, 4).title()}]})
            paras.append({"style": "Normal",
                          "runs": [{"text": _sentence(rng, 4, 8) + "."}]})
            if si == 0 or rng.random() < 0.5:
                paras.append({"style": "ListParagraph",
                              "num": {"id": hnid, "ilvl": 1,
                                      "ordered": h_ordered},
                              "runs": [{"text":
                                        _sentence(rng, 2, 4).title()}]})
                paras.append({"style": "Normal",
                              "runs": [{"text":
                                        _sentence(rng, 3, 6) + "."}]})
    elif hnd < 0.13:
        # negative: single-level interleaved chain stays a list
        lnid = num_id + 20
        for _n in range(2):
            paras.append({"style": "ListParagraph",
                          "num": {"id": lnid, "ilvl": 0, "ordered": True},
                          "runs": [{"text": _sentence(rng, 2, 4)}]})
            paras.append({"style": "Normal",
                          "runs": [{"text": _sentence(rng, 3, 6) + "."}]})
    # ~30%: a table (reference renders DOCX tables via its mammoth-HTML
    # path with vMerge/gridSpan resolved, docx_converter.py:960-1122; the
    # payload carries the post-XML cell rows).  Header row + occasional
    # colspan-2 / rowspan-2 anchors + rare OMML cell equation.
    if rng.random() < 0.3:
        ncols = rng.randint(2, 4)
        nrows = rng.randint(2, 4)
        rows = [[{"text": _sentence(rng, 1, 2).title(), "header": True}
                 for _ in range(ncols)]]
        carry = 0  # columns occupied by a rowspan-2 anchor from the row above
        for i in range(nrows):
            row = []
            c = carry
            carry = 0
            while c < ncols:
                cell = {"text": _sentence(rng, 1, 3)}
                adv = 1
                if c + 1 < ncols and rng.random() < 0.15:
                    cell["colspan"] = 2
                    adv = 2
                elif i + 1 < nrows and carry == 0 and rng.random() < 0.12:
                    cell["rowspan"] = 2
                    carry = 1
                if rng.random() < 0.08:
                    cell["math"] = rng.choice((r"x^2", r"\alpha_i"))
                row.append(cell)
                c += adv
            rows.append(row)
        # ~12%: inflate one data row's gridSpan when the table carries
        # no rowspan (the mammoth virtual-grid artifact) — the kernel's
        # _normalize_table_colspans analog must shrink it back to the
        # modal row width (docx_converter.py:1284-1372)
        has_rowspan = any("rowspan" in c for row in rows for c in row)
        if not has_rowspan and rng.random() < 0.12:
            ri = 1 + rng.randint(0, nrows - 1)
            rows[ri][0]["colspan"] = int(rows[ri][0].get("colspan", 1)) + 1
        # ~12% a SEQ caption BEFORE the table (next-parent rule), ~5%
        # with an after-caption too (the {body} gap is contiguous,
        # fix_two_layer_blocks office_magic_model.py:688-696); ~16% a
        # prefix-promoted "Table N" text after it
        tcd = rng.random()
        if tcd < 0.12:
            paras.append(
                {"style": "Caption", "seq": True,
                 "runs": [{"text": f"Table {rng.randint(1, 9)}: "
                           + _sentence(rng, 2, 4) + "."}]})
        paras.append({"style": "Table", "rows": rows})
        if tcd < 0.05 or 0.12 <= tcd < 0.28:
            head = "表 " if 0.12 <= tcd < 0.16 else "Table "
            paras.append(
                {"style": "Normal",
                 "runs": [{"text": f"{head}{rng.randint(1, 9)}. "
                           + _sentence(rng, 2, 4) + "."}]})
    # ~4%: an orphan SEQ caption in open text — far from any visual it
    # demotes to text; adjacent to a stray visual it may legitimately
    # attach (both engines run the same classify)
    if rng.random() < 0.04:
        paras.append({"style": "Caption", "seq": True,
                      "runs": [{"text": f"Figure {rng.randint(30, 99)}: "
                                + _sentence(rng, 2, 4) + "."}]})
    # ~20%: a DrawingML chart paragraph (reference _handle_drawingml,
    # docx_converter.py:3345-3411; r5 directive #1) — the block is kept
    # even when the chart renders empty
    if rng.random() < 0.2:
        paras.append({"style": "Chart", "chart": _gen_chart(rng)})
        ccd = rng.random()
        if ccd < 0.25:
            # chart captions promote on 图/fig/chart prefixes
            head = ("chart " if ccd < 0.12
                    else ("图表 " if ccd < 0.18 else "Fig. "))
            paras.append(
                {"style": "Normal",
                 "runs": [{"text": f"{head}{rng.randint(1, 9)}: "
                           + _sentence(rng, 2, 4) + "."}]})
    # ~12%: textbox paragraph group anchored mid-document (r5 directive
    # #4; reference docx_converter.py:839-889): containers with
    # position-sorted paras, a duplicate (text,pos) pair that must
    # dedupe, and a position-less para that must sort last
    if rng.random() < 0.12:
        conts = []
        for _c in range(rng.randint(1, 2)):
            tps = [{"pos": round(rng.uniform(0.0, 400.0), 1),
                    "runs": [{"text": _sentence(rng, 2, 5) + ".",
                              "bold": rng.random() < 0.2}]}
                   for _k in range(rng.randint(2, 3))]
            if rng.random() < 0.3:
                tps.append({"pos": tps[0]["pos"],
                            "runs": list(tps[0]["runs"])})  # dup → dedupe
            if rng.random() < 0.3:
                tps.append({"runs": [{"text": _sentence(rng, 2, 4)}]})
            conts.append({"paras": tps})
        paras.insert(rng.randint(1, len(paras)),
                     {"style": "Textbox", "containers": conts})
    doc: dict = {"kind": "docx_runs", "paras": paras}
    # ~25%: section headers/footers through the B9 discard contract (r5
    # directive #3; reference _add_header_footer docx_converter.py:
    # 3260-3321): odd/even + first-page variants, pure-digit page-number
    # footers that must filter, duplicate variant text that must dedupe
    if rng.random() < 0.25:
        doc["odd_even_pages"] = rng.random() < 0.4
        secs = []
        for _s in range(2 if rng.random() < 0.15 else 1):
            hdr_text = _sentence(rng, 2, 4).title()
            hdrs = [{"variant": "default",
                     "paras": [[{"text": hdr_text}]]}]
            if rng.random() < 0.5:
                hdrs.append({"variant": "even",
                             "paras": [[{"text":
                                         _sentence(rng, 2, 4).title()}]]})
            if rng.random() < 0.4:
                hdrs.append({"variant": "first",
                             "paras": [[{"text":
                                         _sentence(rng, 2, 3).title()}]]})
            if rng.random() < 0.3:  # same text again → dedupes
                hdrs.append({"variant": "default",
                             "paras": [[{"text": hdr_text}]]})
            fd = rng.random()
            if fd < 0.35:
                # bare page number → isdigit filter drops it
                fparas = [[{"text": str(rng.randint(1, 99))}]]
            elif fd < 0.55:
                # footer with a hyperlink run (full run machinery)
                fparas = [[{"text": _sentence(rng, 1, 3) + " "},
                           {"text": _sentence(rng, 1, 2),
                            "link": "https://example.org/legal"}]]
            else:
                fparas = [[{"text": _sentence(rng, 2, 5)}]]
            secs.append({"first_page": rng.random() < 0.5,
                         "headers": hdrs,
                         "footers": [{"variant": "default",
                                      "paras": fparas}]})
        doc["hf_sections"] = secs
    # ~18%: SECTION BREAKS paginate the doc (reference _start_new_page
    # docx_converter.py:722-724, call sites :1393-1398/:1419-1424/
    # :1597-1598; layout-only guard :726-755).  Cases: empty-para break
    # (before), text-para section end (after), layout-only continuous
    # (no break), continuous with non-zero margins (breaks).
    sbd = rng.random()
    if sbd < 0.18 and len(paras) >= 3:
        n_breaks = 1 if rng.random() < 0.7 else 2
        for _b in range(n_breaks):
            pos = rng.randint(1, len(paras) - 1)
            bd = rng.random()
            if bd < 0.35:
                paras.insert(pos, {"style": "Normal", "runs": [],
                                   "sect": {"type": "nextPage"}})
            elif bd < 0.5:
                # layout-only: continuous + all-zero margins → NO break
                paras.insert(pos, {"style": "Normal", "runs": [],
                                   "sect": {"type": "continuous",
                                            "pg_mar_zero": True}})
            elif bd < 0.62:
                # continuous but margins not all-zero → still breaks
                paras.insert(pos, {"style": "Normal", "runs": [],
                                   "sect": {"type": "continuous",
                                            "pg_mar_zero": False}})
            else:
                # section end rides a TEXT paragraph → break AFTER it
                paras.insert(pos, {"style": "Normal",
                                   "runs": [{"text":
                                             _sentence(rng, 3, 6) + "."}],
                                   "sect": {"type": "nextPage"}})
    return json.dumps(doc, ensure_ascii=False)


# ---------------------------------------------------------------------------
# XLSX sheet-cell fragments (O3: DataRegion detection, merged-cell grid)
# ---------------------------------------------------------------------------

def _a1(r: int, c: int) -> str:
    """0-based (row, col) → absolute A1 reference ('$B$3')."""
    c += 1
    letters = ""
    while c:
        c, rem = divmod(c - 1, 26)
        letters = chr(65 + rem) + letters
    return f"${letters}${r + 1}"


def _gen_xlsx(rng: random.Random) -> str:
    """Sparse sheet cells + merge ranges (the reference's raw-sheet input,
    xlsx_converter.py): a main data region at a random offset (header row,
    occasional horizontal header merge, occasional gap-1 hole inside the
    region that flood fill must cross), sometimes a far-away singleton
    cell (its own 1×1 region → text block), sometimes a second sheet."""
    def sheet(idx: int) -> dict:
        r0, c0 = rng.randint(0, 3), rng.randint(0, 2)
        ncols, nrows = rng.randint(2, 4), rng.randint(2, 4)
        cells, merges = [], []
        merged_header = ncols >= 3 and rng.random() < 0.3
        for c in range(ncols):
            if merged_header and c == 1:
                merges.append([r0, c0 + 1, r0, c0 + 2])
            if merged_header and c == 2:
                continue  # hidden under the header merge anchor
            cells.append({"r": r0, "c": c0 + c,
                          "v": _sentence(rng, 1, 2).title()})
        hole = rng.random() < 0.25  # one blank cell inside the region
        hole_at = (r0 + 1 + rng.randint(0, nrows - 1),
                   c0 + rng.randint(0, ncols - 1)) if hole else None
        for r in range(nrows):
            for c in range(ncols):
                if (r0 + 1 + r, c0 + c) == hole_at:
                    continue
                cell = {"r": r0 + 1 + r, "c": c0 + c,
                        "v": _sentence(rng, 1, 3)}
                rr = rng.random()
                if rr < 0.06:
                    # cell hyperlink → <a href> wrap in the table HTML
                    cell["link"] = \
                        f"https://example.org/cell/{rng.randint(1, 99)}"
                elif rr < 0.12:
                    # rich styled runs → nested inline font tags
                    a, b = cell["v"].split(" ", 1) if " " in cell["v"] \
                        else (cell["v"], "")
                    runs = [{"text": a + (" " if b else ""),
                             "bold": rng.random() < 0.5}]
                    if b:
                        runs.append({"text": b,
                                     "italic": rng.random() < 0.5,
                                     "underline": rng.random() < 0.3})
                    cell["runs"] = runs
                cells.append(cell)
        has_singleton = rng.random() < 0.3
        if has_singleton:
            # isolated note cell, > gap+1 away → its own singleton region
            cells.append({"r": r0 + nrows + 4, "c": c0,
                          "v": _sentence(rng, 2, 5)})
        shape = rng.random()
        if shape < 0.12:
            # two dense blocks separated by ONE blank row: tolerance 1
            # would fuse them into a table with an interior blank row
            # (penalty ≈0.49 > margin), tolerance 0 scores 0 → the auto
            # selection must pick 0 and emit TWO tables (r4 directive #3)
            base = r0 + nrows + 10
            for rr in range(3):
                for cc in range(3):
                    cells.append({"r": base + rr, "c": c0 + cc,
                                  "v": _sentence(rng, 1, 2)})
                    cells.append({"r": base + 4 + rr, "c": c0 + cc,
                                  "v": _sentence(rng, 1, 2)})
        elif shape < 0.24:
            # label column + blank column + value column: tolerance 0
            # splits it into two fully row-overlapping strips (penalty
            # 1.0), tolerance 1 reads ONE table across the blank column
            # (penalty ≈0.79) — the selection must bridge the gap
            base = r0 + nrows + 10
            for rr in range(5):
                cells.append({"r": base + rr, "c": c0,
                              "v": _sentence(rng, 1, 2)})
                cells.append({"r": base + rr, "c": c0 + 2,
                              "v": str(rng.randint(1, 999))})
        sh = {"name": f"Sheet{idx + 1}", "cells": cells,
              "merges": merges}
        # ~18%: cell-anchored sheet images (r5 directive #5) — one
        # anchored INSIDE the main region (renders as in-cell <img>
        # media) and/or one far outside every table (standalone image
        # block after the sheet's artifacts)
        imd = rng.random()
        if imd < 0.18:
            import base64 as _b64
            import hashlib as _hl
            imgs = []
            if imd < 0.12:
                blob = _hl.sha256(
                    f"xlsimg-in-{rng.randint(0, 999)}".encode()).digest()
                imgs.append({"r": r0 + 1, "c": c0,
                             "data_b64": _b64.b64encode(blob).decode()})
            if imd > 0.05:
                blob = _hl.sha256(
                    f"xlsimg-out-{rng.randint(0, 999)}".encode()).digest()
                imgs.append({"r": r0 + nrows + 30, "c": c0 + 8,
                             "data_b64": _b64.b64encode(blob).decode()})
            sh["images"] = imgs
        # ~14%: a sheet chart anchored below the data region. The payload
        # carries the chart's series REFERENCE FORMULAS; the kernel
        # re-renders the referenced sheet range as a synthetic table
        # (reference _find_charts_in_sheet xlsx_converter.py:677-708).
        # Variants cover: whole-region rectangle (merge clipping when the
        # header merge exists), non-rectangular two-column union,
        # quoted-sheet single cell, and the two skip rules (different
        # sheet / open-ended bounds → NO chart block).
        cr = rng.random()
        if cr < 0.14:
            sname = f"Sheet{idx + 1}"
            last_r, last_c = r0 + nrows, c0 + ncols - 1
            sub = rng.random()
            if sub < 0.30:
                ranges = [f"{sname}!{_a1(r0, c0)}:{_a1(last_r, last_c)}"]
            elif sub < 0.55:
                ranges = [f"{sname}!{_a1(r0 + 1, c0)}:{_a1(last_r, c0)}",
                          f"{sname}!{_a1(r0 + 1, last_c)}:"
                          f"{_a1(last_r, last_c)}"]
            elif sub < 0.70:
                ranges = [f"'{sname}'!{_a1(r0 + 1, c0 + 1)}"]
            elif sub < 0.85:
                ranges = [f"{sname}!{_a1(r0, c0)}:{_a1(last_r, last_c)}",
                          f"Other!{_a1(r0, c0)}:{_a1(last_r, last_c)}"]
            else:
                ranges = [f"{sname}!$A:$C"]
            sh["charts"] = [{"r": r0 + nrows + 6, "c": c0,
                             "ranges": ranges}]
        # ~10%: drawing-anchored OMML formulas mapped to cells (reference
        # _map_math_formulas_to_cells xlsx_converter.py:361-444 +
        # _get_cell_math_formulas :710-723): latex rides inside the table
        # cell as <eq> bookends (:1043-1048), unescaped to $..$ at M6.
        # One formula lands on a region cell (sometimes the hole cell —
        # math alone is semantic content, :757-763); when the far
        # singleton exists, a second formula there must force the 1×1
        # TABLE render instead of the text block (:743-755).
        mr = rng.random()
        if mr < 0.10:
            latexes = (r"\sum_{i=1}^{n} x_i", r"\beta^2+1",
                       r"\frac{a}{b}", r"E=mc^2")
            maths = [{"r": r0 + 1, "c": c0 + 1,
                      "latex": latexes[int(mr * 1000) % 4]}]
            if mr < 0.04 and has_singleton:
                maths.append({"r": r0 + nrows + 4, "c": c0,
                              "latex": r"e^{i\pi}+1=0"})
            sh["maths"] = maths
        return sh

    n_sheets = 2 if rng.random() < 0.3 else 1
    out_sheets = [sheet(i) for i in range(n_sheets)]
    # ~8% of multi-sheet workbooks hide one sheet (reference
    # _iter_sheets_to_convert xlsx_converter.py:275-286: non-visible
    # sheets skipped) — its content must vanish AND the survivor must
    # lose its sheet title (>1 non-empty VISIBLE sheets rule)
    hd = rng.random()  # drawn unconditionally (replay purity)
    if n_sheets == 2 and hd < 0.08:
        out_sheets[int(hd * 1000) % 2]["hidden"] = True
    return json.dumps(
        {"kind": "xlsx_cells", "sheets": out_sheets},
        ensure_ascii=False)


# ---------------------------------------------------------------------------
# PPTX shape fragments (O2: unordered shapes, XY-cut ordering)
# ---------------------------------------------------------------------------

def _gen_pptx(rng: random.Random) -> str:
    slides = []
    for sidx in range(rng.randint(1, 2)):
        shapes = []
        pskip = rng.random()
        if pskip < 0.10:
            # near-full-slide picture FIRST in z-order: the later text
            # shapes drawn on top cover ≥10% of it → BACKGROUND skip
            # (reference _is_background_picture :497-530); slides that
            # happen to end with no text shape keep it (the negative)
            import base64 as _b64
            import hashlib as _hl
            blob = _hl.sha256(
                f"pptbg-{sidx}-{rng.randint(0, 999)}".encode()).digest() * 2
            shapes.append({"bbox": [0.0, 0.0, 960.0, 540.0],
                           "kind": "image",
                           "data_b64": _b64.b64encode(blob).decode()})
        shapes.append({"bbox": [80.0, 30.0, 880.0, 80.0], "kind": "title",
                       "text": _sentence(rng, 3, 6).title()})
        if pskip >= 0.10 and pskip < 0.18:
            # tiny decorative logo: both dimensions < 10% of the slide →
            # SMALL skip (reference _is_small_picture :470-495)
            import base64 as _b64
            import hashlib as _hl
            blob = _hl.sha256(
                f"pptlogo-{sidx}-{rng.randint(0, 999)}".encode()).digest() * 2
            shapes.append({"bbox": [900.0, 500.0, 950.0, 535.0],
                           "kind": "image",
                           "data_b64": _b64.b64encode(blob).decode()})
        # two content placeholders side by side (xy-cut orders them)
        for cx0, cx1 in ((80.0, 460.0), (500.0, 880.0)):
            r = rng.random()
            if r < 0.4:
                if rng.random() < 0.5:
                    # structured multi-level items (r5): random level
                    # walk over 0-2, per-level ordered/unordered, and an
                    # occasional explicit ordered restart whose start may
                    # or may not equal the continuation number
                    ordered_at = {0: rng.random() < 0.5,
                                  1: rng.random() < 0.5, 2: False}
                    lvl = rng.randint(0, 1)  # nonzero base exercises
                    items = []               # level normalization
                    for _ in range(rng.randint(3, 6)):
                        lvl = min(2, max(0, lvl + rng.choice([-1, 0, 0, 1])))
                        items.append({"text": _sentence(rng, 2, 5),
                                      "level": lvl,
                                      "ordered": ordered_at[lvl]})
                    if ordered_at[0] and rng.random() < 0.5:
                        items.append({"text": _sentence(rng, 2, 4),
                                      "level": 0, "ordered": True,
                                      "start": rng.choice([1, 7]),
                                      "restart": True})
                    shapes.append({"bbox": [cx0, 120.0, cx1, 400.0],
                                   "kind": "bullets", "items": items})
                else:
                    items = "\n".join(f"• {_sentence(rng, 2, 5)}"
                                      for _ in range(rng.randint(2, 4)))
                    shapes.append({"bbox": [cx0, 120.0, cx1, 400.0],
                                   "kind": "bullets", "text": items})
            elif r < 0.55:
                # embedded table shape (reference _handle_tables :597)
                html, _nc = _gen_office(rng)
                shapes.append({"bbox": [cx0, 120.0, cx1, 400.0],
                               "kind": "table", "html": html})
            elif r < 0.7:
                # GROUP shape: children in group-local coordinates; the
                # extractor composes offset/scale (pptx_converter.py:49-79)
                shapes.append({
                    "kind": "group",
                    "offset": [cx0, 120.0], "scale": [1.0, 1.0],
                    "shapes": [
                        {"bbox": [0.0, 0.0, cx1 - cx0, 130.0],
                         "kind": "body",
                         "text": _sentence(rng, 4, 8) + "."},
                        {"bbox": [0.0, 150.0, cx1 - cx0, 280.0],
                         "kind": "body",
                         "text": _sentence(rng, 4, 8) + "."},
                    ]})
            elif r < 0.75:
                import base64 as _b64
                import hashlib as _hl
                blob = _hl.sha256(
                    f"pptimg-{sidx}-{rng.randint(0, 999)}".encode()).digest() * 2
                shapes.append({"bbox": [cx0, 120.0, cx1, 400.0],
                               "kind": "image",
                               "data_b64": _b64.b64encode(blob).decode()})
                if rng.random() < 0.3:
                    # caption text shape under the picture — promoted by
                    # the 图/fig prefix rule after XY-cut ordering puts
                    # it right after its image
                    shapes.append(
                        {"bbox": [cx0, 410.0, cx1, 440.0], "kind": "body",
                         "text": f"Fig {rng.randint(1, 9)}: "
                         + _sentence(rng, 2, 4) + "."})
            elif r < 0.82:
                # chart graphic frame (reference _handle_chart,
                # pptx_converter.py:689-720; r5 directive #1)
                shapes.append({"bbox": [cx0, 120.0, cx1, 400.0],
                               "kind": "chart",
                               "chart": _gen_chart(rng)})
            elif r < 0.9:
                # styled/hyperlink body runs through the shared office
                # run machinery (reference routes pptx runs through the
                # same office_rich_text helpers as docx)
                runs = [{"text": _sentence(rng, 3, 6) + ". "},
                        {"text": _sentence(rng, 1, 3),
                         "bold": rng.random() < 0.5,
                         "italic": rng.random() < 0.3}]
                if rng.random() < 0.4:
                    runs[-1]["text"] = str(runs[-1]["text"]) + " "
                    runs.append({"text": _sentence(rng, 1, 2),
                                 "link": f"https://example.org/s/{sidx}"})
                if rng.random() < 0.3:
                    # OMML math node inside a pptx paragraph → inline
                    # equation segment (reference _is_math_content_node +
                    # _convert_math_node_to_latex, pptx_converter.py:
                    # 1162-1172; same run machinery as docx math runs)
                    runs.append({"math": rng.choice(
                        (r"\sigma^2", r"\sqrt{n}", r"a_i b_i"))})
                shapes.append({"bbox": [cx0, 120.0, cx1, 400.0],
                               "kind": "body", "text": "", "runs": runs})
            else:
                lines = "\n".join(_sentence(rng, 4, 8) + "."
                                   for _ in range(rng.randint(1, 3)))
                shapes.append({"bbox": [cx0, 120.0, cx1, 400.0],
                               "kind": "body", "text": lines})
        if rng.random() < 0.3:
            # font-profile ensemble exercising title promotion (r5): two
            # body blocks at the common size, one unique biggest bold
            # (level-2 candidate), sometimes a second-tier bold (level-3)
            # and sometimes a DUPLICATE top bold that must suppress the
            # level-2 promotion entirely
            shapes.append({"bbox": [80.0, 410.0, 460.0, 438.0],
                           "kind": "body",
                           "text": _sentence(rng, 3, 6) + ".",
                           "font_size": 28.0, "all_bold": True})
            if rng.random() < 0.6:
                shapes.append({"bbox": [500.0, 410.0, 880.0, 438.0],
                               "kind": "body",
                               "text": _sentence(rng, 3, 5) + ".",
                               "font_size": 22.0, "all_bold": True})
            for px0, px1 in ((80.0, 460.0), (500.0, 880.0)):
                shapes.append({"bbox": [px0, 448.0, px1, 520.0],
                               "kind": "body",
                               "text": _sentence(rng, 4, 8) + ".",
                               "font_size": 18.0})
            if rng.random() < 0.25:
                shapes.append({"bbox": [80.0, 95.0, 460.0, 114.0],
                               "kind": "body",
                               "text": _sentence(rng, 3, 5) + ".",
                               "font_size": 28.0, "all_bold": True})
        # shapes arrive shuffled (no reading order in the payload)
        rng.shuffle(shapes)
        slide = {"slide_idx": sidx, "size": [960.0, 540.0],
                 "shapes": shapes}
        if rng.random() < 0.3:
            # speaker notes (page_footnote blocks after the slide content)
            slide["notes"] = [_sentence(rng, 4, 9) + "."
                              for _ in range(rng.randint(1, 2))]
        slides.append(slide)
    return json.dumps({"kind": "pptx_shapes", "slides": slides},
                      ensure_ascii=False)


# ---------------------------------------------------------------------------
# Office table fragments
# ---------------------------------------------------------------------------

def _gen_office(rng: random.Random,
                continuation_of: int | None = None) -> tuple[str, int]:
    """Well-formed table (occupancy-tracked rowspan/colspan) → (html, ncols).

    ``continuation_of=N``: emit a headerless N-column continuation fragment
    (the cross-turn split exercising the reference's cross-page table merge,
    table_merge.py:661-733: header detect + structural-compat merge)."""
    if continuation_of is not None:
        ncols = continuation_of
        rows = []
        for _ in range(rng.randint(1, 3)):
            rows.append("<tr>" + "".join(
                f"<td>{_sentence(rng, 1, 3)}</td>" for _ in range(ncols))
                + "</tr>")
        return f"<table>{''.join(rows)}</table>", ncols

    ncols = rng.randint(3, 4)
    nrows = rng.randint(3, 5)
    hdr = "<tr>" + "".join(f"<th>{w}</th>" for w in _words(rng, ncols)) + "</tr>"
    occupied: set[tuple[int, int]] = set()
    rows = []
    for r in range(nrows):
        cells = []
        c = 0
        while c < ncols:
            if (r, c) in occupied:
                c += 1
                continue
            free_right = c + 1 < ncols and (r, c + 1) not in occupied
            if rng.random() < 0.15 and free_right:
                cells.append(f'<td colspan="2">{_sentence(rng, 1, 2)}</td>')
                occupied.add((r, c + 1))
                c += 2
            elif rng.random() < 0.1 and r + 1 < nrows:
                cells.append(f'<td rowspan="2">{_sentence(rng, 1, 2)}</td>')
                occupied.add((r + 1, c))
                c += 1
            elif rng.random() < 0.05:
                # embedded inline formula (M6: <eq>…</eq> → $…$,
                # reference mkcontent :236-248)
                expr = rng.choice(("a^2+b^2", "x_i", r"\frac{p}{q}"))
                cells.append(f"<td><eq>{expr}</eq></td>")
                c += 1
            else:
                cells.append(f"<td>{_sentence(rng, 1, 3)}</td>")
                c += 1
        rows.append("<tr>" + "".join(cells) + "</tr>")
    return f"<table>{hdr}{''.join(rows)}</table>", ncols


def _inject_mojibake(payload: str) -> str:
    """Replace every 20th char glyph with U+FFFD (≥3% abnormal ratio)."""
    d = json.loads(payload)
    k = 0
    for page in d["pages"]:
        for rec in page["chars"]:
            if k % 20 == 0:
                rec["char"] = "�"
            k += 1
    return json.dumps(d, ensure_ascii=False)


def _inject_map_err(payload: str) -> str:
    """Flag every 20th char as a unicode-map failure (C4 analog of the
    pdfium per-char map-error signal, pdf_classify.py:459-476; ≥4%)."""
    d = json.loads(payload)
    k = 0
    for page in d["pages"]:
        for rec in page["chars"]:
            if k % 20 == 0:
                rec["map_err"] = True
            k += 1
    return json.dumps(d, ensure_ascii=False)


def _inject_cid_font(payload: str) -> str:
    """Re-font the first ≥40 chars of page 0 into a CID font that carries
    no ToUnicode map (C5 analog, pdf_classify.py:596-655)."""
    d = json.loads(payload)
    page = d["pages"][0]
    for rec in page["chars"][:max(40, len(page["chars"]) // 10)]:
        f = rec["font"]
        rec["font"] = {**f, "name": "CIDNoUni", "cid": True,
                       "to_unicode": False}
    return json.dumps(d, ensure_ascii=False)


def _inject_latin_cjk(payload: str) -> str:
    """Append 40 CJK chars set in a ToUnicode'd Latin-CharSet font (C6
    analog, pdf_classify.py:658-732): the charset says Latin, the decoded
    text is CJK."""
    d = json.loads(payload)
    page = d["pages"][0]
    text = ("".join(_CJK_SENTENCES) * 3)[:40]
    x, y = 50.0, 700.0
    base = 20_000_000
    for k, ch in enumerate(text):
        if k == 20:
            x, y = 50.0, 712.0
        page["chars"].append({
            "char": ch, "bbox": [round(x, 2), y, round(x + 10.0, 2), y + 10.0],
            "font": {"name": "LatinCS", "size": BODY_SIZE, "flags": 0,
                     "weight": 400, "charset": "latin", "to_unicode": True},
            "rotation": 0.0, "char_idx": base + k})
        x += 10.0
    return json.dumps(d, ensure_ascii=False)


def _inject_pua_run(payload: str) -> str:
    """Rewrite 4 consecutive chars of page 0 into private-use glyphs (E10:
    a PUA run ≥2 flags its span for post-OCR, span_pre_proc.py:388-430;
    too few chars to trip the doc-level C7 ratio)."""
    d = json.loads(payload)
    chars = d["pages"][0]["chars"]
    start = min(20, max(0, len(chars) - 4))
    for k, rec in enumerate(chars[start:start + 4]):
        rec["char"] = chr(0xE000 + k)
    return json.dumps(d, ensure_ascii=False)


def _inject_image_cover(payload: str) -> str:
    """Append a near-full-page image object to EVERY page (C11 analog,
    pdf_classify.py:1055-1090: per-page image-area coverage ≥ 0.8 on ≥ 80%
    of sampled pages)."""
    d = json.loads(payload)
    for page in d["pages"]:
        w, h = (page.get("page_size") or [PAGE_W, PAGE_H])[:2]
        idxs = [b.get("index", -1) for b in page["layout"]]
        nxt = max(idxs) + 1 if idxs and max(idxs) >= 0 else -1
        page["layout"].append({"bbox": [0.0, 0.0, round(w * 0.95, 2),
                                        round(h * 0.9, 2)],
                               "label": "image", "index": nxt})
    return json.dumps(d, ensure_ascii=False)


# ---------------------------------------------------------------------------
# Turn assembly
# ---------------------------------------------------------------------------

OFFICE_P = 0.90       # base office-route probability threshold (r ≥ 0.90)
OFFICE_CONT_P = 0.70  # relaxed threshold after an office turn (r ≥ 0.70)


def _is_office(conv_id: str, turn_idx: int) -> bool:
    """Deterministic route rule: office on r ≥ OFFICE_P, or on
    r ≥ OFFICE_CONT_P when the previous turn was office (tables tend to
    continue across tool turns — exercises the cross-turn merge)."""
    r = _prng("turn", conv_id, turn_idx).random()
    if r >= OFFICE_P:
        return True
    return r >= OFFICE_CONT_P and turn_idx > 0 \
        and _is_office(conv_id, turn_idx - 1)


def _office_ncols(conv_id: str, turn_idx: int) -> int:
    """Column count of the office table at (conv_id, turn_idx), resolving
    continuation chains recursively (pure function — any turn can re-derive
    its predecessor's table shape without data movement)."""
    rng = _prng("turn", conv_id, turn_idx)
    rng.random()  # the route draw (known office)
    cont = None
    if turn_idx > 0 and _is_office(conv_id, turn_idx - 1):
        cont = _office_ncols(conv_id, turn_idx - 1)
    _, nc = _gen_office(rng, continuation_of=cont)
    return nc


def gen_turn(conv_i: int, turn_idx: int) -> dict:
    conv_id = f"conv-{conv_i:08d}"
    rng = _prng("turn", conv_id, turn_idx)
    role = ("user", "assistant", "tool")[turn_idx % 3]
    r = rng.random()
    office = _is_office(conv_id, turn_idx)
    if office:
        cont_ncols = None
        if turn_idx > 0 and _is_office(conv_id, turn_idx - 1):
            cont_ncols = _office_ncols(conv_id, turn_idx - 1)
        text, _ = _gen_office(rng, continuation_of=cont_ncols)
        # ~15% of office payloads carry leading whitespace — newline/tab/
        # CRLF/ideographic space/a >1 KiB space run — so the JVM run-key
        # sniff's lstrip() parity (classify.OFFICE_SNIFF_RE) sits behind
        # the extraction hash gate (round-3 verdict finding #1: F.ltrim
        # strips only spaces and a substring window can't eat unbounded
        # whitespace; either slip silently breaks the cross-turn merge).
        # Drawn AFTER _gen_office so _office_ncols' replay (which stops at
        # _gen_office) stays pure.
        wsd = rng.random()
        if wsd < 0.15:
            _prefixes = ("\n", "\t", "\r\n  ", "　", " " * 1200)
            text = _prefixes[int(wsd * 1000) % len(_prefixes)] + text
        tool = "file_reader"
    elif r < 0.05:
        text, tool = "", "none"
    elif r < 0.58:
        text, tool = _gen_html(rng), "browser"
    elif r < 0.62:
        text, tool = _gen_pptx(rng), "file_reader"
    elif r < 0.65:
        text, tool = _gen_docx(rng), "file_reader"
    elif r < 0.68:
        text, tool = _gen_xlsx(rng), "file_reader"
    else:
        text, tool = _gen_pdf(rng), "pdf_reader"
        # rare corruption knobs, one per classifier signal family
        # (reference pdf_classify.py cascade): each flips the doc to the
        # ocr route through a different detector
        rc = _prng("corrupt", conv_id, turn_idx).random()
        if rc < 0.025:
            text = _inject_mojibake(text)       # C7 abnormal ratio
        elif rc < 0.040:
            text = _inject_map_err(text)        # C4 unicode-map errors
        elif rc < 0.055:
            text = _inject_cid_font(text)       # C5 CID w/o ToUnicode
        elif rc < 0.070:
            text = _inject_latin_cjk(text)      # C6 Latin CharSet → CJK
        elif rc < 0.085:
            text = _inject_image_cover(text)    # C11 image coverage
        elif rc < 0.10:
            text = _inject_pua_run(text)        # E10 per-span PUA run
    ts = _BASE_TS + timedelta(seconds=conv_i * 3600 + turn_idx * 37)
    return {"conv_id": conv_id, "turn_idx": turn_idx, "role": role,
            "text": text, "tool": tool, "ts": ts}


def gen_transcripts_pdf(n_convs: int, conv_offset: int = 0):
    """All turns for convs [conv_offset, conv_offset + n_convs) as a pandas
    DataFrame (driver-side / oracle-side use; the Spark path generates
    shard-locally via pipeline.synthesize_transcripts)."""
    import pandas as pd

    rows = []
    for ci in range(conv_offset, conv_offset + n_convs):
        for ti in range(conv_length(ci)):
            rows.append(gen_turn(ci, ti))
    pdf = pd.DataFrame(rows, columns=TRANSCRIPT_COLUMNS)
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    return pdf
