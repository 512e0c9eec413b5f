"""PDF-like char-stream extraction (SURVEY.md §2.3-2.4: E1-E12, B1-B9).

From-scratch numpy re-expression of the reference's char→span→line→block
assembly:

- rotated/watermark char filter      — reference span_pre_proc.py:134-208
  (only 0/90/180/270° chars participate)
- near-identical + shadow-offset char dedup via a 3×3 spatial hash
                                     — reference pdf_text_tool.py:107-146,
                                       :149-166, :278-314 (tolerance ≤2.5pt)
- char→block assignment, first-block-wins in reading-order index
                                     — reference span_pre_proc.py:234-308
- line segmentation by y-interval overlap > 0.6 of min height
                                     — reference ocr_utils.py:67-79,
                                       span_block_fix.py:52-88
- sup/sub role: size < 0.8× body and center outside body band ±0.15×h
                                     — reference span_pre_proc.py:536-594
- chars_to_content: sort by char_idx only when out of order; space when
  gap > 0.25 × median char width; ligature expansion; drop \\r\\n
                                     — reference span_pre_proc.py:605-649
- block label map + title levels     — reference pipeline_magic_model.py:19-43,
                                       model_json_to_middle_json.py:196-208
- header/footer/page_number discard  — reference pipeline_magic_model.py:199-220
- reading order by layout index      — reference pipeline_magic_model.py:121
- txt/ocr classification subset (avg chars/page < 50; abnormal char ratio
  ≥ 0.03)                            — reference pdf_classify.py:401-415,
                                       :418-451

Coordinates: top-left origin, y increasing downward (generator contract).
"""

from __future__ import annotations

import numpy as np

from . import emit
from .xycut import xy_cut_order

DEDUP_TOL = 2.5          # pt; covers jitter ≤1.0 and shadow 1.0-2.5
DEDUP_CELL = 8.0         # spatial hash cell size
LINE_OVERLAP = 0.6       # y-interval overlap ratio → same line
SUP_SIZE_RATIO = 0.8     # size < 0.8 × body size → candidate sup/sub
BAND_RATIO = 0.15        # body-band half-width as fraction of body height
SPACE_GAP_RATIO = 0.25   # gap > 0.25 × median char width → insert space
MIN_CHARS_PER_PAGE = 50  # C3: below this → ocr route
MAX_CHARS_PER_PAGE = 65535  # E6: beyond this → ocr (span_pre_proc.py:17)
ABNORMAL_RATIO = 0.03    # C7: control/PUA/replacement char ratio → ocr

DISCARD_LABELS = {"header", "footer", "page_number", "aside_text",
                  "page_footnote"}

# PP-DocLayoutV2-style label → (block type, title level) — the reference
# label set (pipeline_magic_model.py:18-41 PP_DOCLAYOUT_V2_LABELS_TO_
# BLOCK_TYPES); "algorithm" is the reference's code label (CODE blocks
# whose text guesses no language keep the ALGORITHM sub_type and render
# as the pre-wrap HTML div), "content" is the TOC label (INDEX), and
# "reference_content" is the bibliography label (REF_TEXT — adjacent
# blocks group in content_list/v2)
LABEL_MAP = {
    "doc_title": ("title", 1),
    "paragraph_title": ("title", 2),
    "text": ("text", 1),
    "list": ("list", 1),
    "table": ("table", 1),
    "image": ("image", 1),
    "code": ("code", 1),
    "algorithm": ("code", 1),
    "abstract": ("abstract", 1),
    "content": ("index", 1),
    "reference_content": ("ref_text", 1),
    "interline_equation": ("equation", 1),
    "vertical_text": ("text", 1),
}

# caption/footnote labels → (parent block type, slot)   (B10)
# kind None = the reference PIPELINE path's GENERIC child labels
# ("figure_title" → CAPTION, "vision_footnote" → FOOTNOTE,
# pipeline_magic_model.py:27/:42): find_best_visual_parent runs over
# ALL visual mains (main_type_to_visual_type maps every main type to
# itself, :476-481), not a kind-matched subset; orphans demote to text
# (:384-387).  Charstream visual mains are table/image (chart is
# office-only; code captions out of scope, documented).
CAPTION_LABELS = {
    "table_caption": ("table", "caption"),
    "table_footnote": ("table", "footnote"),
    "image_caption": ("image", "caption"),
    "image_footnote": ("image", "footnote"),
    "figure_title": (None, "caption"),
    "vision_footnote": (None, "footnote"),
}

PUNCT_RUN_RATIO = 0.25   # C10: chars inside punct runs ≥ 4 long
ASPECT_MAX = 10.0        # C2: page w/h or h/w beyond this → ocr
# C4-C6, C11 font-table / raster signals (pdf_classify.py:18-26)
MAP_ERR_RATIO = 0.04         # C4: unicode-map failure ratio over samples
CID_USAGE_COUNT = 30         # C5: cid-without-ToUnicode chars per page ≥
CID_USAGE_RATIO = 0.01       # C5: … and page-usage ratio ≥
LATIN_CJK_COUNT = 30         # C6: latin-CharSet font chars per page ≥
LATIN_CJK_USAGE_RATIO = 0.01 # C6: … page-usage ratio ≥
LATIN_CJK_CJK_RATIO = 0.8    # C6: … of which CJK glyph share ≥
IMAGE_COVERAGE = 0.8         # C11: image area / page area per page ≥,
                             #      and share of such sampled pages ≥
SCRIPT_MIX_RATIO = 0.18  # C8: non-dominant-script share threshold
SCRIPT_MIN = 3           # C8: ≥3 scripts present
MOJIBAKE_RATIO = 0.026   # C9: U+7280-72DF share of CJK chars
_PUNCT = set(".,;:!?|-_=+*#~^'`\"()[]{}<>/\\")

VERTICAL_ASPECT = 3.0     # B5: block h/w ≥ 3 → vertical-text candidate
VERTICAL_SINGLE = 0.8     # ≥80% single-char lines confirms vertical
LIST_LINE_RATIO = 0.8     # D1: ≥80% of ≥3 lines carry a list marker



_PUNCT_CODES = np.array(sorted(ord(c) for c in _PUNCT), dtype=np.uint32)
# O(1) membership: tiny boolean LUTs beat np.isin's sort-based in1d on
# the per-block hot path.  Codepoints ≥ LUT size clamp to the top slot,
# which is deliberately False in every table.
_PUNCT_LUT = np.zeros(128, dtype=bool)
_PUNCT_LUT[[c for c in _PUNCT_CODES if c < 127]] = True


def _page_signals(codes: "np.ndarray") -> dict:
    """All per-char classification signals in one vectorized pass over the
    page's codepoint array (C7/C8/C9/C10 + E10 PUA)."""
    abnormal = int((((codes < 32) & (codes != 9) & (codes != 10)
                     & (codes != 13))
                    | (codes == 0xFFFD)
                    | ((codes >= 0xE000) & (codes <= 0xF8FF))).sum())
    scripts = {}
    for name, lo, hi in _SCRIPT_RANGES:
        n = int(((codes >= lo) & (codes <= hi)).sum())
        if n:
            scripts[name] = n
    cjk = int(((codes >= 0x4E00) & (codes <= 0x9FFF)).sum())
    moji = int(((codes >= 0x7280) & (codes <= 0x72DF)).sum())
    # punct runs ≥ 4 (C10): boolean mask run-length via edge detection
    mask = _PUNCT_LUT[np.minimum(codes, 127)]
    if mask.any():
        edges = np.diff(np.concatenate(([0], mask.view(np.int8), [0])))
        starts = np.flatnonzero(edges == 1)
        ends = np.flatnonzero(edges == -1)
        lens = ends - starts
        punct_run = int(lens[lens >= 4].sum())
    else:
        punct_run = 0
    return {"abnormal": abnormal, "scripts": scripts, "cjk": cjk,
            "mojibake": moji, "punct_run": punct_run}


# E7 char→span fill (reference span_pre_proc.py:311-364, :371-378, :453-486)
SPAN_HEIGHT_RATIO = 0.33      # |char ctr-y − span ctr-y| < ⅓ span height
SPAN_EMPTY_FACTOR = 0.5       # len(content)·h < w·0.5 → empty span (OCR)
# E10 per-span private-use fallback (span_pre_proc.py:18-22, :388-430):
# ≥2 PUA chars AND (a PUA run ≥2 OR PUA ratio ≥5%) → post-OCR the span
PUA_COUNT_MIN = 2
PUA_RUN_MIN = 2
PUA_RATIO_MIN = 0.05
VERTICAL_SPAN_FACTOR = 2.3    # h > 2.3·median and h > 2.3·w → vertical span
SPAN_STOP_FLAG = ('.', '!', '?', '。', '！', '？', ')', '）', '"', '”',
                  ':', '：', ';', '；', ']', '】', '}', '>', '》', '、',
                  ',', '，', '-', '—', '–')
SPAN_START_FLAG = ('(', '（', '"', '“', '【', '{', '《', '<', '「', '『',
                   '[')
_STOP_CODES = np.array(sorted({ord(c) for c in SPAN_STOP_FLAG}),
                       dtype=np.int64)
_START_CODES = np.array(sorted({ord(c) for c in SPAN_START_FLAG}),
                        dtype=np.int64)
# BMP-sized boolean LUTs (64 KiB each) for the E7 per-span hot path; the
# clamp slot 0xFFFF is not a flag char in either set, so
# LUT[minimum(codes, 0xFFFF)] is exact for all of Unicode.
_STOP_LUT = np.zeros(0x10000, dtype=bool)
_STOP_LUT[_STOP_CODES] = True
_START_LUT = np.zeros(0x10000, dtype=bool)
_START_LUT[_START_CODES] = True


def fill_chars_into_spans(pc: PageCols, sel: "np.ndarray",
                          span_boxes: list, median_h: float
                          ) -> tuple[list, int, "np.ndarray"]:
    """E7: fill chars into model-emitted span boxes (reference
    fill_char_in_spans + calculate_char_in_span, span_pre_proc.py:311-364,
    :453-486), vectorized per span instead of the reference's y-cell grid
    (the grid is a lookup optimization, not semantics — same answer).

    Acceptance per reference: char center inside the span box AND
    |char ctr-y − span ctr-y| < ⅓·span height; end-punctuation chars whose
    center-x misses may still enter near the RIGHT edge (within span-height
    of it), open-punctuation near the LEFT edge.  Spans are visited in y0
    order, first accepting span wins.  Vertical spans (height > 2.3× page
    median AND > 2.3× width) take every char whose center falls inside
    (the reference fills them from pdfium lines, :101-114).

    Returns (list of (span_box, char index array) in y0 order, empty-span
    count via the len·h < w·0.5 test, assigned mask over sel)."""
    n = len(sel)
    cx = (pc.x0[sel] + pc.x1[sel]) / 2.0
    cy = (pc.y0[sel] + pc.y1[sel]) / 2.0
    chx0, chx1 = pc.x0[sel], pc.x1[sel]
    codes = pc.codes[sel]
    clamped = np.minimum(codes, 0xFFFF)
    is_stop = _STOP_LUT[clamped]
    is_start = _START_LUT[clamped]
    assigned = np.zeros(n, dtype=bool)
    out: list[tuple[list, np.ndarray]] = []
    n_empty = 0
    boxes = sorted((list(map(float, b)) for b in span_boxes),
                   key=lambda b: b[1])
    for b in boxes:
        sx0, sy0, sx1, sy1 = b
        sh = sy1 - sy0
        sw = sx1 - sx0
        scy = (sy0 + sy1) / 2.0
        free = ~assigned
        if sh > VERTICAL_SPAN_FACTOR * median_h \
                and sh > VERTICAL_SPAN_FACTOR * max(sw, 1e-6):
            m = free & (cx > sx0) & (cx < sx1) & (cy > sy0) & (cy < sy1)
        else:
            ytest = free & (cy > sy0) & (cy < sy1) \
                & (np.abs(cy - scy) < sh * SPAN_HEIGHT_RATIO)
            base = ytest & (cx > sx0) & (cx < sx1)
            stop_alt = ytest & is_stop & (chx0 > sx1 - sh) & (chx0 < sx1) \
                & (cx > sx0)
            start_alt = ytest & is_start & (chx1 > sx0) & (chx1 < sx0 + sh) \
                & (cx < sx1)
            m = base | stop_alt | start_alt
        assigned |= m
        idxs = sel[np.flatnonzero(m)]
        out.append((b, idxs))
        # post-OCR flags (reference need_ocr_spans, :347-364): the E10
        # private-use rule first, else the empty-span test (char count is
        # a faithful stand-in for len(content) here)
        if len(idxs) and _pua_span_signal(pc.codes[idxs]):
            n_empty += 1
        elif len(idxs) * sh < sw * SPAN_EMPTY_FACTOR:
            n_empty += 1
    return out, n_empty, assigned


def _pua_span_signal(codes: "np.ndarray") -> bool:
    """E10: per-span private-use fallback decision (span_pre_proc.py
    :388-430): ≥2 PUA chars and (max PUA run ≥2 or PUA ratio ≥5% of
    non-whitespace chars).  Whitespace breaks runs (it is never PUA, so
    the run-length mask handles that implicitly)."""
    pua = (codes >= 0xE000) & (codes <= 0xF8FF)
    cnt = int(pua.sum())
    if cnt < PUA_COUNT_MIN:
        return False
    nonspace = int(((codes != 9) & (codes != 10) & (codes != 13)
                    & (codes != 32)).sum())
    if nonspace and cnt / nonspace >= PUA_RATIO_MIN:
        return True
    edges = np.diff(np.concatenate(([0], pua.view(np.int8), [0])))
    starts = np.flatnonzero(edges == 1)
    ends = np.flatnonzero(edges == -1)
    return bool(len(starts)) and int((ends - starts).max()) >= PUA_RUN_MIN


def _assemble_block_from_spans(pc: PageCols, sel: "np.ndarray",
                               span_boxes: list, median_h: float,
                               page_idx: int
                               ) -> tuple[list[str], "np.ndarray",
                                          list[dict], int]:
    """Span-bearing block (E7 path): fill the block's chars into the
    model-emitted span boxes, assemble each span's content with the shared
    char kernels, then merge spans into lines by the 0.6 y-interval overlap
    rule (reference line build, ocr_utils.py:67-79).  Unfilled chars are
    dropped, exactly like the reference (they exist in no span).

    Returns (line texts, line bbox array, span records, empty-span count).
    """
    filled, n_empty, _ = fill_chars_into_spans(pc, sel, span_boxes, median_h)
    pieces: list[tuple[list, str, list]] = []  # (bbox, text, records)
    for b, idxs in filled:
        if len(idxs) == 0:
            continue
        sh = b[3] - b[1]
        sw = max(1e-6, b[2] - b[0])
        if sh > VERTICAL_SPAN_FACTOR * median_h \
                and sh > VERTICAL_SPAN_FACTOR * sw:
            text, recs = _assemble_vertical(pc, idxs, page_idx)
        else:
            lines, _, recs = _assemble_block(pc, idxs, page_idx)
            text = " ".join(ln for ln in lines if ln)
        if text:
            pieces.append((b, text, recs))
    # spans → lines: consecutive (y-sorted) spans sharing > 0.6 overlap of
    # the smaller height form one line, ordered left→right within it
    lines_text: list[str] = []
    lbb_rows: list[list[float]] = []
    spans_out: list[dict] = []
    cur: list[tuple[list, str, list]] = []
    for piece in pieces:
        if cur:
            pb, b = cur[-1][0], piece[0]
            ov = min(pb[3], b[3]) - max(pb[1], b[1])
            if ov <= LINE_OVERLAP * min(pb[3] - pb[1], b[3] - b[1]):
                cur.sort(key=lambda p: p[0][0])
                lines_text.append(" ".join(p[1] for p in cur))
                lbb_rows.append([min(p[0][0] for p in cur),
                                 min(p[0][1] for p in cur),
                                 max(p[0][2] for p in cur),
                                 max(p[0][3] for p in cur)])
                for p in cur:
                    for s in p[2]:
                        s["line"] = len(lines_text) - 1
                    spans_out.extend(p[2])
                cur = []
        cur.append(piece)
    if cur:
        cur.sort(key=lambda p: p[0][0])
        lines_text.append(" ".join(p[1] for p in cur))
        lbb_rows.append([min(p[0][0] for p in cur),
                         min(p[0][1] for p in cur),
                         max(p[0][2] for p in cur),
                         max(p[0][3] for p in cur)])
        for p in cur:
            for s in p[2]:
                s["line"] = len(lines_text) - 1
            spans_out.extend(p[2])
    lbb = np.array(lbb_rows, dtype=np.float64).reshape(len(lbb_rows), 4) \
        if lbb_rows else np.empty((0, 4))
    return lines_text, lbb, spans_out, n_empty


VERTICAL_SPAN_HW_RATIO = 2.0      # span h/w > 2 → vertical span (B5)
VERTICAL_SPAN_SHARE = 0.8         # >80% such spans → vertical block


def _is_vertical_by_spans(span_boxes: list) -> bool:
    """B5 by span statistics (reference is_vertical_text_block_by_spans,
    span_block_fix.py:9-30): >80% of valid spans taller than 2× width."""
    valid = vert = 0
    for b in span_boxes:
        if not isinstance(b, (list, tuple)) or len(b) < 4:
            continue
        w, h = b[2] - b[0], b[3] - b[1]
        if w <= 0 or h <= 0:
            continue
        valid += 1
        if h / w > VERTICAL_SPAN_HW_RATIO:
            vert += 1
    return valid > 0 and vert / valid > VERTICAL_SPAN_SHARE


def _bbox_edge_distance(a, b) -> float:
    """Rectangle gap distance (reference boxbase.bbox_distance:40-75):
    euclidean distance between the closest edges, 0 when overlapping."""
    dx = max(b[0] - a[2], a[0] - b[2], 0.0)
    dy = max(b[1] - a[3], a[1] - b[3], 0.0)
    return float((dx * dx + dy * dy) ** 0.5)


def _bbox_center_distance(a, b) -> float:
    """Center-to-center distance (boxbase.bbox_center_distance:78)."""
    ax, ay = (a[0] + a[2]) / 2.0, (a[1] + a[3]) / 2.0
    bx, by = (b[0] + b[2]) / 2.0, (b[1] + b[3]) / 2.0
    return float(((ax - bx) ** 2 + (ay - by) ** 2) ** 0.5)


def _is_single_line(r: dict) -> bool:
    """is_single_line_caption_fragment analog (visual_magic_model_utils.py
    :323-325): blocks without line geometry count as single-line."""
    return r.get("_mg", {}).get("n_lines", 1) <= 1


def _horiz_near(b, t, tol_frac: float = 0.03) -> bool:
    """is_horizontally_near_table (:313-321): within max(12, w·0.03)."""
    tol = max(12.0, (t[2] - t[0]) * tol_frac)
    return not (b[2] < t[0] - tol or b[0] > t[2] + tol)


def _stacked_gap(h: float) -> float:
    """stacked_caption_max_gap (:328-330)."""
    return max(12.0, h * 1.5)


def _fallback_captions(raw: list[dict]) -> None:
    """B10 caption fallbacks (reference visual_magic_model_utils.py):
    promote unlabeled text fragments to caption labels BEFORE parent
    attachment, in the reference's call order (pipeline_magic_model.py
    :123-124 → inline, stacked, leading-continuation).

    1. inline fragments (:101-131 + :351-379): a text block sandwiched
       between a caption and a visual main block joins the caption when
       it sits on the caption's line (y-overlap ≥ 0.6 of the smaller
       height, or center-Δy ≤ 0.5 of the larger) and the pair sits
       directly above the visual (gap ∈ [0, max(12, 1.5·h)]);
    2. stacked table clusters (:226-251 + :267-305): inside the stack of
       caption/text/footnote blocks geometrically piled above a table,
       single-line text fragments BELOW the last labeled caption become
       captions;
    3. leading table continuations (:133-223): single-line '(continued)'
       / 续表 text blocks at the head of the page, geometrically adjacent
       to the first table, become its captions.

    Mutates labels in place; the existing attach loop then routes the
    promoted blocks to their visual parents.  raw is one page in reading
    order with discarded blocks already removed (the reference likewise
    skips VISUAL_RELATION_IGNORED_TYPES)."""
    from . import tables as tbl

    if len(raw) >= 3:
        # --- rule 1: inline caption fragments ---
        for i in range(1, len(raw) - 1):
            r = raw[i]
            if r["label"] != "text":
                continue
            prev, nxt = raw[i - 1], raw[i + 1]
            slot = CAPTION_LABELS.get(prev["label"])
            if not slot or slot[1] != "caption":
                continue
            # the caption KIND must match the visual directly below —
            # an image_caption above a table must not promote the
            # fragment to image_caption (the attach loop would route it
            # to a faraway image); the reference pairs the fragment with
            # the specific visual block (ADVICE r4 low #4)
            if nxt["label"] != slot[0]:
                continue
            cb, rb, vb = prev["_raw"], r["_raw"], nxt["_raw"]
            ch = max(cb[3] - cb[1], 1.0)
            rh = max(rb[3] - rb[1], 1.0)
            overlap = min(cb[3], rb[3]) - max(cb[1], rb[1])
            center_dy = abs((cb[1] + cb[3]) / 2 - (rb[1] + rb[3]) / 2)
            same_line = (overlap / max(min(ch, rh), 1.0) >= 0.6
                         or center_dy <= max(ch, rh) * 0.5)
            gap = vb[1] - max(cb[3], rb[3])
            if same_line and 0 <= gap <= _stacked_gap(max(ch, rh)):
                r["label"] = prev["label"]
                r.pop("_mg", None)  # no longer merges as body text

    # --- rule 2: stacked table caption clusters ---
    cluster_types = {"table_caption", "table_footnote", "text"}
    for t in raw:
        if t["label"] != "table":
            continue
        tb = t["_raw"]
        above = [r for r in raw
                 if r is not t and r["label"] in cluster_types
                 and r["_raw"][3] <= tb[1] and _horiz_near(r["_raw"], tb)]
        cluster: list[dict] = []
        next_top = tb[1]
        max_h = 1.0
        for r in sorted(above, key=lambda x: (x["_raw"][1], x["pos"]),
                        reverse=True):
            h = max(r["_raw"][3] - r["_raw"][1], 1.0)
            gap = next_top - r["_raw"][3]
            if not 0 <= gap <= _stacked_gap(max(max_h, h)):
                break
            cluster.append(r)
            next_top = r["_raw"][1]
            max_h = max(max_h, h)
        cluster.reverse()
        last_cap = None
        for pos in range(len(cluster) - 1, -1, -1):
            if cluster[pos]["label"] == "table_caption":
                last_cap = pos
                break
        if last_cap is None:
            continue
        for r in cluster[last_cap + 1:]:
            if r["label"] == "text" and _is_single_line(r):
                r["label"] = "table_caption"
                r.pop("_mg", None)

    # --- rule 3: leading '(continued)' text above the first table ---
    leading: list[dict] = []
    cursor = 0
    while cursor < len(raw):
        r = raw[cursor]
        if not (r["label"] == "text" and _is_single_line(r)
                and tbl.is_continuation_text(r["text"])):
            break
        leading.append(r)
        cursor += 1
    if leading and cursor < len(raw) and raw[cursor]["label"] == "table":
        tb = raw[cursor]["_raw"]
        next_top = tb[1]
        max_h = 1.0
        ok = True
        for r in reversed(leading):
            rb = r["_raw"]
            if not _horiz_near(rb, tb):
                ok = False
                break
            h = max(rb[3] - rb[1], 1.0)
            gap = next_top - rb[3]
            if gap > _stacked_gap(max(max_h, h)) or gap < -max(2.0, h * 0.3):
                ok = False
                break
            next_top = rb[1]
            max_h = max(max_h, h)
        if ok:
            for r in leading:
                r["label"] = "table_caption"
                r.pop("_mg", None)


def _font_signals(pc: PageCols) -> tuple[int, bool, bool]:
    """Per-page font-table signals (C4/C5/C6 analogs over the payload's
    font-resource metadata, reference pdf_classify.py:459-732):

    returns (unicode-map-error char count, C5 triggered, C6 triggered).
    C5: chars set in CID fonts that carry no ToUnicode map (count ≥ 30 and
    ≥ 1% of the page).  C6: a Type1-style font whose CharSet is Latin but
    whose decoded chars are ≥ 80% CJK (same count/usage gates)."""
    map_err = int(pc.maperr.sum()) if pc.maperr is not None else 0
    c5 = c6 = False
    n = pc.n
    if n:
        cid_names = {nm for nm, f in pc.font_attrs.items()
                     if f.get("cid") and not f.get("to_unicode")}
        if cid_names:
            cnt = sum(1 for nm in pc.names if nm in cid_names)
            c5 = cnt >= CID_USAGE_COUNT and cnt / n >= CID_USAGE_RATIO
        for nm, f in pc.font_attrs.items():
            if f.get("charset") == "latin" and f.get("to_unicode"):
                m = np.array([x == nm for x in pc.names])
                cnt = int(m.sum())
                if cnt >= LATIN_CJK_COUNT and cnt / n >= LATIN_CJK_USAGE_RATIO:
                    codes = pc.codes[m]
                    cjk = int(((codes >= 0x4E00) & (codes <= 0x9FFF)).sum())
                    if cjk / cnt >= LATIN_CJK_CJK_RATIO:
                        c6 = True
                        break
    return map_err, c5, c6


import re as _re

_LIST_MARKER = _re.compile(r"^(?:[•◦▪*-]|\d{1,3}[.)])\s")

# reference para_split.py:7-8
LINE_STOP_FLAG = ('.', '!', '?', '。', '！', '？', ')', '）', '"', '”',
                  ':', '：', ';', '；')
LIST_END_FLAG = ('.', '。', ';', '；')


def is_list_block(lines: list[str]) -> bool:
    """D1 marker-based list detection (explicit bullets/numbering — the
    cases the reference's layout model would label `list` outright): ≥3
    lines of which ≥80% start with a bullet or a numbered marker."""
    if len(lines) < 3:
        return False
    hits = sum(1 for ln in lines if _LIST_MARKER.match(ln))
    return hits >= LIST_LINE_RATIO * len(lines)


def classify_text_block(lines: list[str], lbb: "np.ndarray",
                        block_bbox: tuple, page_w: float) -> str:
    """D1 geometric list/index classification — the reference's line-edge
    alignment statistics (para_split.py:59-262) over our line bboxes:

    - index: ≥80% of lines flush on one edge AND ≥80% start or end with a
      digit (TOC / index blocks);
    - centered list: ≥2 lines clear of both edges, every line centered,
      tall-ish block;
    - list: ≥2 left-flush lines and (≥2 right-ragged, or ≥80% end with a
      list terminator, or ≥2 left-indented), unless the block shows the
      indented-first-line + short-last-line shape of a multi-paragraph;
    - else text.

    `lines` are the assembled line texts, `lbb` the (n,4) line bbox array.

    Returns ``(kind, starts)``: kind in {"text","list","index"}; for
    list/index, ``starts`` marks the ITEM-START lines (the reference's
    ListLineTag.IS_LIST_START_LINE) that the md join hard-breaks before;
    None for text.
    """
    n = len(lines)
    if n < 2:
        return "text", None
    # bbox_fs: union of line bboxes (reference __process_blocks)
    ux0, uy0 = float(lbb[:, 0].min()), float(lbb[:, 1].min())
    ux1, uy1 = float(lbb[:, 2].max()), float(lbb[:, 3].max())
    lh = float(lbb[0, 3] - lbb[0, 1])
    bw = ux1 - ux0
    bh = uy1 - uy0
    if lh <= 0 or bw <= 0:
        return "text", None
    bw_ratio = bw / page_w if page_w else 0.0

    x0, x1 = lbb[:, 0], lbb[:, 2]
    left_close = np.abs(x0 - ux0) < lh / 2
    left_not_close = (x0 - ux0) > lh
    right_close = np.abs(ux1 - x1) < lh
    # CJK-like text has no long unbreakable words → tighter ragged-edge
    # threshold; same for wide blocks (para_split.py:141-151)
    blk_text = "".join(lines)
    if emit.is_cjk_text(blk_text) or bw_ratio >= 0.5:
        closed_area = 0.26 * bw
    else:
        closed_area = 0.36 * bw
    right_not_close = (ux1 - x1) > closed_area
    mid = (x0 + x1) / 2.0
    center_close = np.abs(mid - (ux0 + ux1) / 2.0) < lh / 2
    both_clear = ((x0 - ux0) > 0.7 * lh) & ((ux1 - x1) > 0.7 * lh)

    # indented first line + flush-left short last line → multi-paragraph
    multiple_para = (x0[0] - ux0 > lh / 2
                     and abs(x0[-1] - ux0) < lh / 2
                     and ux1 - x1[-1] > lh)

    num_start = sum(1 for t in lines if t and t[0].isdigit())
    num_end = sum(1 for t in lines if t and t[-1].isdigit())
    flag_end = sum(1 for t in lines if t and t[-1] in LIST_END_FLAG)
    line_num_flag = num_start / n >= 0.8 or num_end / n >= 0.8
    line_end_flag = flag_end / n >= 0.8

    lc, rc = int(left_close.sum()), int(right_close.sum())
    if (lc / n >= 0.8 or rc / n >= 0.8) and line_num_flag:
        return "index", [True] * n
    if (int(both_clear.sum()) >= 2 and int(center_close.sum()) == n
            and both_clear.sum() / n >= 0.5 and bh / bw > 0.4):
        # centered list: every line is its own item (para_split.py:196-200)
        return "list", [True] * n
    if (lc >= 2
            and (int(right_not_close.sum()) >= 2 or line_end_flag
                 or int(left_not_close.sum()) >= 2)
            and not multiple_para):
        # ITEM-START line marking, the reference's five sub-cases
        # (IS_LIST_START_LINE assignment, para_split.py:202-256) — the
        # md join hard-breaks exactly before start lines
        starts = [False] * n
        if lc / n > 0.8:
            if flag_end == 0 and rc / n < 0.5:
                # short one-line items, all flush left (:210-215)
                starts = [bool(f) for f in left_close]
            elif line_end_flag:
                # items delimited by end punctuation (:216-226)
                for i, t in enumerate(lines):
                    if t and t[-1] in LIST_END_FLAG and i + 1 < n:
                        starts[i + 1] = True
            else:
                # right-gap ends delimit items (:227-240)
                pending = False
                for i in range(n):
                    if pending:
                        starts[i] = True
                        pending = False
                    if abs(ux1 - float(x1[i])) > 0.1 * bw:
                        pending = True
        elif num_start >= 2 and num_start == flag_end:
            # indented ordered list: digit-led lines start items
            # (:241-248)
            starts = [bool(t and t[0].isdigit()) for t in lines]
        else:
            # normal indented list: flush-left lines start items
            # (:249-255)
            starts = [bool(f) for f in left_close]
        return "list", starts
    return "text", None


# B12 language guess: the shared deterministic token-weight classifier
# (kernels/langid.py) replaces the old 3-keyword early-exit — same magika
# stand-in role (reference guess_suffix_or_lang.py:73-85), 8 languages
from .langid import guess_code_lang  # noqa: F401  (re-export: B12 kernel)


_SCRIPT_RANGES = (
    ("latin", 0x0041, 0x024F),
    ("greek", 0x0370, 0x03FF),
    ("cyrillic", 0x0400, 0x04FF),
    ("arabic", 0x0600, 0x06FF),
    ("devanagari", 0x0900, 0x097F),
    ("cjk", 0x4E00, 0x9FFF),
    ("kana", 0x3040, 0x30FF),
    ("hangul", 0xAC00, 0xD7AF),
)


class PageCols:
    """Columnar page chars (the pdftext PageChars analog the reference
    itself materializes, pdf_text_tool.py:174-190 — kept columnar here
    instead of flipping back to row dicts).  Built ONCE per page; every
    downstream kernel (dedup, block assignment, line assembly) works on
    slices of these arrays."""

    __slots__ = ("n", "x0", "y0", "x1", "y1", "size", "idx", "codes",
                 "glyphs", "mathmask", "names", "font_attrs", "maperr")

    def __init__(self, recs: list[dict]):
        n = len(recs)
        self.n = n
        # np.fromiter over a flattened generator beats np.array on a list
        # of lists ~2-3x (no per-row list allocation/ndim sniffing)
        bbox = np.fromiter((v for r in recs for v in r["bbox"]),
                           dtype=np.float64, count=4 * n).reshape(n, 4)
        self.x0, self.y0 = bbox[:, 0], bbox[:, 1]
        self.x1, self.y1 = bbox[:, 2], bbox[:, 3]
        fonts = [r["font"] for r in recs]
        self.size = np.fromiter((f["size"] for f in fonts),
                                dtype=np.float64, count=n)
        self.idx = np.fromiter((r["char_idx"] for r in recs),
                               dtype=np.int64, count=n)
        glyphs = [r["char"] for r in recs]
        self.glyphs = glyphs
        joined = "".join(glyphs)
        if len(joined) == n:  # all single-codepoint glyphs: C-speed decode
            self.codes = np.frombuffer(joined.encode("utf-32-le"),
                                       dtype=np.uint32).astype(np.int64)
        else:
            self.codes = np.array([(ord(g) if len(g) == 1 else hash(g))
                                   & 0xFFFFF for g in glyphs], dtype=np.int64)
        # per-char font names + first-seen font resource attributes (the
        # pypdf font-table signals, pdf_classify.py:932-1032) + per-char
        # unicode-map failure flags (pdfium signal, :459-476)
        names = [f.get("name") for f in fonts]
        # reversed dict build: the LAST assignment wins, so iterating the
        # reversed pairs leaves the FIRST-seen font per name — identical
        # to the old `if nm not in attrs` loop, but one C-level pass
        attrs = dict(zip(names[::-1], fonts[::-1]))
        maperr = None
        if any(r.get("map_err") for r in recs):
            maperr = np.fromiter((bool(r.get("map_err")) for r in recs),
                                 dtype=bool, count=n)
        self.names = names
        self.font_attrs = attrs
        self.maperr = maperr
        # inline-math marker font (MFR-analog); None when absent
        self.mathmask = (np.array([nm == "Math" for nm in names])
                         if "Math" in attrs else None)

    def take(self, mask: "np.ndarray") -> "PageCols":
        out = PageCols.__new__(PageCols)
        out.n = int(mask.sum())
        for f in ("x0", "y0", "x1", "y1", "size", "idx", "codes"):
            setattr(out, f, getattr(self, f)[mask])
        out.glyphs = [g for g, m in zip(self.glyphs, mask) if m]
        out.names = [g for g, m in zip(self.names, mask) if m]
        out.font_attrs = self.font_attrs
        out.maperr = self.maperr[mask] if self.maperr is not None else None
        out.mathmask = self.mathmask[mask] if self.mathmask is not None \
            else None
        return out


def _dedup_mask(pc: PageCols) -> "np.ndarray":
    """Spatial-hash dedup: a char is a duplicate iff an already-kept char of
    the same glyph and size lies within DEDUP_TOL pt (covers both jitter
    and shadow-offset duplicates).  Payload order wins (first kept).

    Vectorized (SURVEY §2.3 E2 plan): a numpy prefilter quantizes
    (key, x0, y0) to the DEDUP_CELL grid and finds 'suspects' — chars with
    ANOTHER same-key char in their 3×3 cell neighborhood — with 9
    searchsorted passes; only suspects (≈2× the dup rate, a few % of a
    page) enter the sequential greedy resolution, whose semantics the
    prefilter provably preserves: any pair within DEDUP_TOL shares a key
    and a neighborhood, so both ends are suspects; non-suspects can
    neither be duplicates nor decide one.  Returns the keep mask."""
    n = pc.n
    keep = np.ones(n, dtype=bool)
    if n < 2:
        return keep
    sizek = (pc.size * 10 + 0.5).astype(np.int64)
    key = ((pc.codes & 0xFFFFF) << 20) | (sizek & 0xFFFFF)
    cx = np.floor_divide(pc.x0, DEDUP_CELL).astype(np.int64)
    cy = np.floor_divide(pc.y0, DEDUP_CELL).astype(np.int64)
    packed = (key << 24) | ((cx & 0xFFF) << 12) | (cy & 0xFFF)
    # suspect detection at OCCUPIED-CELL granularity: one unique() pass
    # gives center-cell multiplicity; the 8 neighbor probes then search
    # u<=n unique cells instead of 9 probes x n chars (same result — a
    # char is suspect iff its (key,cell) is multiply occupied or any
    # same-key neighbor cell is occupied, which is a property of the
    # CELL, not the char)
    cells, inv, counts = np.unique(packed, return_inverse=True,
                                   return_counts=True)
    cell_suspect = counts > 1
    u = len(cells)
    ckey = cells & ~np.int64(0xFFFFFF)
    ccx = (cells >> 12) & 0xFFF
    ccy = cells & 0xFFF
    # neighbor occupancy is symmetric (the &0xFFF wraparound preserves
    # it both ways), so 4 forward probes suffice: a hit marks BOTH ends
    # — the probing cell and the found neighbor (its index is the
    # searchsorted position)
    for dx, dy in ((0, 1), (1, -1), (1, 0), (1, 1)):
        tgt = ckey | (((ccx + dx) & 0xFFF) << 12) | ((ccy + dy) & 0xFFF)
        pos = np.searchsorted(cells, tgt)
        np.minimum(pos, u - 1, out=pos)
        hit = cells[pos] == tgt
        cell_suspect |= hit
        cell_suspect[pos[hit]] = True
    suspect = cell_suspect[inv]
    if not suspect.any():
        return keep

    x0, y0 = pc.x0, pc.y0
    grid: dict[int, dict[tuple, list]] = {}
    for i in np.flatnonzero(suspect):
        rx, ry = x0[i], y0[i]
        kb = int(key[i])
        sub = grid.get(kb)
        if sub is None:
            sub = grid[kb] = {}
        ci, cj = int(cx[i]), int(cy[i])
        dup = False
        for nx2 in (ci - 1, ci, ci + 1):
            for ny2 in (cj - 1, cj, cj + 1):
                lst = sub.get((nx2, ny2))
                if lst:
                    for px, py in lst:
                        if -DEDUP_TOL <= px - rx <= DEDUP_TOL and \
                                -DEDUP_TOL <= py - ry <= DEDUP_TOL:
                            dup = True
                            break
                    if dup:
                        break
            if dup:
                break
        if dup:
            keep[i] = False
            continue
        lst = sub.get((ci, cj))
        if lst is None:
            sub[(ci, cj)] = [(rx, ry)]
        else:
            lst.append((rx, ry))
    return keep


def _median(a) -> float:
    """Exact np.median for 1-D input via np.partition on the middle
    index(es): identical element selection and identical two-middle
    averaging for even n (parity asserted over random arrays in tests).
    Saves np.median's _ureduce dispatch layers on the thousands of tiny
    per-block arrays; end-to-end the win is small (the dispatch cost is
    real per call but a minor share of the kernel), kept for the cheaper
    call-site semantics (float out, no wrapping)."""
    a = np.asarray(a, dtype=np.float64)
    n = a.size
    h = n >> 1
    if n & 1:
        return float(np.partition(a, h)[h])
    b = np.partition(a, (h - 1, h))
    return float((b[h - 1] + b[h]) / 2.0)


def _assemble_block(pc: PageCols, sel: "np.ndarray",
                    page_idx: int) -> tuple[list[str], "np.ndarray",
                                            list[dict]]:
    """Block chars (index array into the page columns) → (line texts,
    line bbox array (n_lines, 4), span records).

    Vectorized over the page's column arrays; per-line bboxes feed the D1
    edge-alignment statistics; hyphen/CJK merge is applied later by the
    caller.
    """
    n = len(sel)
    if n == 0:
        return [], np.empty((0, 4)), []
    x0, y0 = pc.x0[sel], pc.y0[sel]
    x1, y1 = pc.x1[sel], pc.y1[sel]
    size, idx = pc.size[sel], pc.idx[sel]
    pg = pc.glyphs
    glyphs = [pg[i] for i in sel.tolist()]
    # inline-math runs are marked by the font (MFR-analog for in-line
    # formulas); mask built only when such a font appears on the page
    math_mask = pc.mathmask[sel] if pc.mathmask is not None else None

    # E9 sort-avoidance: sort by char_idx only when out of order
    if not np.all(idx[1:] >= idx[:-1]):
        order = np.argsort(idx, kind="stable")
        x0, y0, x1, y1, size, idx = (a[order] for a in (x0, y0, x1, y1, size, idx))
        glyphs = [glyphs[i] for i in order]
        if math_mask is not None:
            math_mask = math_mask[order]

    h = y1 - y0
    # line segmentation: consecutive-char y-interval overlap
    ov = np.minimum(y1[1:], y1[:-1]) - np.maximum(y0[1:], y0[:-1])
    min_h = np.minimum(h[1:], h[:-1])
    new_line = ov <= LINE_OVERLAP * min_h
    line_id = np.concatenate([[0], np.cumsum(new_line)])

    widths = x1 - x0
    med_w = _median(widths) if n else 1.0
    gap = x0[1:] - x1[:-1]
    same_line = line_id[1:] == line_id[:-1]
    space_before = np.concatenate([[False],
                                   same_line & (gap > SPACE_GAP_RATIO * med_w)])

    lines_text: list[str] = []
    spans_out: list[dict] = []
    # fast-path text building: runs are contiguous slices, so run text is
    # a substring of the block string with spaces spliced at the (rare)
    # gap positions — iterations scale with WORDS, not chars.  Blocks
    # containing \r\n glyphs take the per-char path (its skip rule
    # interacts with space suppression).
    block_str = "".join(glyphs)
    # slicing needs index alignment (single-codepoint glyphs, no \r\n skip)
    fast_text = len(block_str) == n and "\r" not in block_str \
        and "\n" not in block_str
    # line boundaries (contiguous slices: line_id is nondecreasing)
    bounds = np.concatenate(
        ([0], np.nonzero(new_line)[0] + 1, [n]))
    # per-line bboxes (contiguous slices → reduceat); also reused as the
    # span bbox on the uniform fast path below (one run per line ⇒ the
    # run bbox IS the line bbox)
    starts = bounds[:-1]
    lbb = np.empty((len(starts), 4), dtype=np.float64)
    lbb[:, 0] = np.minimum.reduceat(x0, starts)
    lbb[:, 1] = np.minimum.reduceat(y0, starts)
    lbb[:, 2] = np.maximum.reduceat(x1, starts)
    lbb[:, 3] = np.maximum.reduceat(y1, starts)

    # uniform-role fast path: when the block has no inline math and no
    # sup/sub candidate on ANY line (the overwhelmingly common case),
    # every line is a single role-0 run — the per-line numpy machinery
    # (arange, run masks, nonzero) collapses to string slicing.  The
    # per-line small-char test `size < r*max(line)` is evaluated
    # block-wide with one reduceat; semantics are bit-identical to the
    # general loop below.
    line_max = np.maximum.reduceat(size, starts)
    if (math_mask is None or not math_mask.any()) and \
            not (size < SUP_SIZE_RATIO * line_max[line_id]).any():
        ps_all = np.flatnonzero(space_before).tolist()
        pi, n_ps = 0, len(ps_all)
        bounds_l = bounds.tolist()
        lbb_l = lbb.tolist()
        for lid in range(len(bounds_l) - 1):
            a, b = bounds_l[lid], bounds_l[lid + 1]
            if fast_text:
                if pi < n_ps and ps_all[pi] < b:
                    segs = []
                    prev = a
                    while pi < n_ps and ps_all[pi] < b:
                        p = ps_all[pi]
                        pi += 1
                        segs.append(block_str[prev:p])
                        segs.append(" ")
                        prev = p
                    segs.append(block_str[prev:b])
                    text = emit.expand_ligatures("".join(segs))
                else:
                    text = emit.expand_ligatures(block_str[a:b])
            else:
                buf = []
                for k in range(a, b):
                    ch = glyphs[k]
                    if ch in ("\r", "\n"):
                        continue
                    if k > a and space_before[k]:
                        buf.append(" ")
                    buf.append(ch)
                text = emit.expand_ligatures("".join(buf))
            stripped = text.strip()
            if not stripped:
                lines_text.append(" " if text else "")
                continue
            lead = " " if text[:1] == " " else ""
            lines_text.append(lead + stripped)
            spans_out.append({
                "page_idx": page_idx,
                "bbox": lbb_l[lid],
                "type": "text",
                "content": stripped,
                "line": lid,
            })
        return lines_text, lbb, spans_out

    for lid in range(len(bounds) - 1):
        li = np.arange(bounds[lid], bounds[lid + 1])
        l_size = size[li]
        max_size = float(l_size.max())
        small = l_size < SUP_SIZE_RATIO * max_size
        role = np.zeros(len(li), dtype=np.int8)  # 0 normal 1 sup 2 sub 3 math
        if math_mask is not None:
            role[math_mask[li]] = 3
        if small.any():
            # body-band medians only when sup/sub candidates exist (the
            # rare case; medians on tiny arrays are the hot cost otherwise)
            body = li[~small]
            body_c = _median((y0[body] + y1[body]) / 2.0)
            body_h = _median(h[body])
            centers = (y0[li] + y1[li]) / 2.0
            role[small & (centers < body_c - BAND_RATIO * body_h)] = 1
            role[small & (centers > body_c + BAND_RATIO * body_h)] = 2

        # spans = runs of equal role
        run_start = np.concatenate([[True], role[1:] != role[:-1]])
        run_ids = np.cumsum(run_start) - 1
        parts: list[str] = []
        for rid in range(int(run_ids[-1]) + 1):
            rm = run_ids == rid
            ridx = li[rm]
            a, b = int(ridx[0]), int(ridx[-1]) + 1
            if fast_text and b - a == len(ridx):
                # contiguous slice + splice spaces at gap positions.
                # space_before[a] is False at a line start; at a mid-line
                # run start the previous run always left `parts` non-empty
                # here (no \r\n in the fast path), so the per-char loop's
                # (k > 0 or parts) guard is equivalent.
                sub = block_str[a:b]
                ps = np.flatnonzero(space_before[a:b])
                if len(ps):
                    segs = []
                    prev = 0
                    for p in ps:
                        segs.append(sub[prev:int(p)])
                        segs.append(" ")
                        prev = int(p)
                    segs.append(sub[prev:])
                    sub = "".join(segs)
                text = emit.expand_ligatures(sub)
            else:
                buf = []
                for k, gi in enumerate(ridx):
                    ch = glyphs[gi]
                    if ch in ("\r", "\n"):
                        continue
                    if space_before[gi] and (k > 0 or parts):
                        buf.append(" ")
                    buf.append(ch)
                text = emit.expand_ligatures("".join(buf))
            r = int(role[np.nonzero(rm)[0][0]])
            stripped = text.strip()
            if not stripped:
                if text:
                    parts.append(" ")
                continue
            lead = " " if text[:1] == " " else ""
            if r == 1:
                parts.append(f"{lead}<sup>{stripped}</sup>")
            elif r == 2:
                parts.append(f"{lead}<sub>{stripped}</sub>")
            elif r == 3:
                # inline math span (M2 `$...$`, mkcontent :207-219)
                parts.append(f"{lead}${stripped}$")
            else:
                parts.append(lead + stripped)
            spans_out.append({
                "page_idx": page_idx,
                "bbox": [float(x0[ridx].min()), float(y0[ridx].min()),
                         float(x1[ridx].max()), float(y1[ridx].max())],
                "type": {0: "text", 1: "sup", 2: "sub",
                         3: "inline_equation"}[r],
                "content": stripped,
                "line": lid,  # block-local line id (middle hierarchy)
            })
        lines_text.append("".join(parts))

    return lines_text, lbb, spans_out


def _assemble_vertical(pc: PageCols, sel: "np.ndarray",
                       page_idx: int) -> tuple[str, list[dict]]:
    """Vertical-text reassembly (B5/B6, reference span_block_fix.py:9-30,
    :91-167): columns ordered right→left, chars top→bottom within a
    column, joined without separators (vertical runs are CJK)."""
    if len(sel) == 0:
        return "", []
    x0, y0 = pc.x0[sel], pc.y0[sel]
    xr = np.round(x0, 1)
    # lexsort: primary x descending (right→left), secondary y ascending
    order = np.lexsort((y0, -xr))
    text = emit.expand_ligatures(
        "".join(pc.glyphs[sel[i]] for i in order))
    bbox = [float(x0.min()), float(y0.min()),
            float(pc.x1[sel].max()), float(pc.y1[sel].max())]
    span = {"page_idx": page_idx, "bbox": bbox,
            "type": "text", "content": text}
    return text, [span]


def _vertical_merge_geometry(pc: PageCols, sel: "np.ndarray") -> dict | None:
    """Merge geometry for the D1 vertical variant (para_split.py:309-345):
    the FIRST line of a vertical block is its rightmost column, the LAST
    its leftmost (right→left flow); the reference's line_width becomes the
    column width."""
    if len(sel) == 0:
        return None
    x0, y0, x1, y1 = pc.x0[sel], pc.y0[sel], pc.x1[sel], pc.y1[sel]
    xr = np.round(x0, 1)
    first = xr == xr.max()
    last = xr == xr.min()
    return {
        "first_top": float(y0[first].min()),
        "first_w": float(max(x1[first].max() - x0[first].min(), 1e-6)),
        "last_bottom": float(y1[last].max()),
        "last_w": float(max(x1[last].max() - x0[last].min(), 1e-6)),
        "x0": float(x0.min()), "x1": float(x1.max()),
        "y0": float(y0.min()), "y1": float(y1.max()),
    }


def extract_pdf(payload: dict) -> tuple[list[dict], list[dict], dict]:
    """Parsed pdf_chars payload → (blocks, spans, metrics)."""
    blocks_out: list[dict] = []
    discarded_out: list[dict] = []
    spans_out: list[dict] = []
    chars_deduped = 0
    blocks_discarded = 0
    total_chars = 0
    abnormal_chars = 0
    tables_parsed = 0
    punct_run_chars = 0
    bad_aspect = False
    max_page_chars = 0
    script_counts: dict[str, int] = {}
    cjk_chars = 0
    mojibake_chars = 0
    map_err_chars = 0
    c5_trig = False
    c6_trig = False
    high_cov_pages = 0
    empty_spans = 0

    pages = payload.get("pages", [])
    if not isinstance(pages, list):
        pages = []
    # C1: the classification cascade samples ≤10 evenly spaced pages
    # (reference pdf_classify.py:259-287); extraction still walks them all
    if len(pages) > 10:
        sampled = set(np.linspace(0, len(pages) - 1, 10).astype(int).tolist())
    else:
        sampled = set(range(len(pages)))
    n_pages = max(1, len(sampled))
    for page_no, page in enumerate(pages):
        if not isinstance(page, dict):
            continue
        page_idx = int(page.get("page_idx", 0))
        pw, ph = (page.get("page_size") or [612.0, 792.0])[:2]
        # C2: extreme page aspect ratio (pdf_classify.py:290-310)
        if pw > 0 and ph > 0 and max(pw / ph, ph / pw) > ASPECT_MAX:
            bad_aspect = True
        recs = page.get("chars", [])
        if not isinstance(recs, list):
            recs = []
        # one validation + E8 rotation pass (malformed records and rotated
        # watermark chars both count as dropped); exception-guarded rather
        # than isinstance-laden — broken records are the rare path
        axis = []
        append = axis.append
        for r in recs:
            try:
                b = r["bbox"]
                if isinstance(b, list) and len(b) == 4 \
                        and isinstance(r["font"], dict):
                    # rotation is absent on the vast majority of chars:
                    # skip the float()/mod for that case
                    rot = r.get("rotation")
                    if rot is None or rot == 0 \
                            or float(rot) % 90.0 == 0.0:
                        append(r)
            except (TypeError, KeyError):
                pass
        chars_deduped += len(recs) - len(axis)

        pc = PageCols(axis)
        keep = _dedup_mask(pc)
        n_kept = int(keep.sum())
        if n_kept < pc.n:
            chars_deduped += pc.n - n_kept
            pc = pc.take(keep)
        in_sample = page_no in sampled
        if in_sample:
            total_chars += pc.n
        max_page_chars = max(max_page_chars, pc.n)
        if pc.n and in_sample:
            sig = _page_signals(pc.codes)
            abnormal_chars += sig["abnormal"]
            punct_run_chars += sig["punct_run"]
            cjk_chars += sig["cjk"]
            mojibake_chars += sig["mojibake"]
            for name, n in sig["scripts"].items():
                script_counts[name] = script_counts.get(name, 0) + n
            merr, c5, c6 = _font_signals(pc)
            map_err_chars += merr
            c5_trig = c5_trig or c5
            c6_trig = c6_trig or c6

        cx = (pc.x0 + pc.x1) / 2.0
        cy = (pc.y0 + pc.y1) / 2.0
        assigned = np.zeros(pc.n, dtype=bool)

        layout = page.get("layout", [])
        if not isinstance(layout, list):
            layout = []
        layout = [b for b in layout
                  if isinstance(b, dict) and isinstance(b.get("bbox"), list)
                  and len(b["bbox"]) == 4]
        # E7: page-level median span height (span_pre_proc.py:71-82) for
        # the char→span fill grid/band tests
        sheights = [s[3] - s[1] for b in layout
                    for s in (b.get("spans") or [])
                    if isinstance(s, (list, tuple)) and len(s) == 4]
        page_median_h = _median(sheights) if sheights else 0.0
        if in_sample and pw > 0 and ph > 0:
            # C11: summed image-object area vs page area (pdf_classify.py
            # :1055-1090 — areas summed, ratio clipped to 1.0 per page)
            img_area = sum(
                max(0.0, b["bbox"][2] - b["bbox"][0])
                * max(0.0, b["bbox"][3] - b["bbox"][1])
                for b in layout if b.get("label") == "image")
            if min(img_area / (pw * ph), 1.0) >= IMAGE_COVERAGE:
                high_cov_pages += 1
        if any(int(b.get("index", -1)) < 0 for b in layout):
            # no model-emitted order → geometric XY-cut (B8)
            order = xy_cut_order([b["bbox"] for b in layout])
            layout = [layout[i] for i in order]
        else:
            # model-emitted reading order (B7, pipeline_magic_model.py:121)
            layout = sorted(layout, key=lambda b: b.get("index", 0))
        raw: list[dict] = []  # per-page, in reading order
        for pos, blk in enumerate(layout):
            label = blk.get("label", "text")
            bx0, by0, bx1, by1 = blk["bbox"]
            if pc.n:
                m = (~assigned) & (cx >= bx0) & (cx <= bx1) & \
                    (cy >= by0) & (cy <= by1)
                assigned |= m
                sel = np.flatnonzero(m)
            else:
                sel = np.empty(0, dtype=np.int64)
            if label in DISCARD_LABELS:
                # discarded blocks keep their text and type: the reference
                # drops them from markdown but emits them TYPED in
                # content_list (mkcontent :626-637) and keeps them in the
                # page's discarded_blocks list in middle json
                blocks_discarded += 1
                dlines, _, _ = _assemble_block(pc, sel, page_idx)
                dtext = emit.merge_lines(dlines)
                if dtext:
                    discarded_out.append({
                        "type": label, "text": dtext, "page_idx": page_idx,
                        "bbox": [round(bx0 / pw * 1000),
                                 round(by0 / ph * 1000),
                                 round(bx1 / pw * 1000),
                                 round(by1 / ph * 1000)],
                        "level": 1, "discarded": True})
                continue
            btype, level = LABEL_MAP.get(label, ("text", 1))
            nb = [round(bx0 / pw * 1000), round(by0 / ph * 1000),
                  round(bx1 / pw * 1000), round(by1 / ph * 1000)]
            rec = {"type": btype, "label": label, "pos": pos, "text": "",
                   "page_idx": page_idx, "bbox": nb, "level": level,
                   "caption": [], "footnote": [],
                   "_raw": (bx0, by0, bx1, by1)}

            if label == "interline_equation":
                # MFR-analog: latex arrives on the layout record (G2);
                # formula-number attach (D3, formula_number.py:94-166)
                rec["text"] = str(blk.get("latex", "")).strip()
                tag = blk.get("tag")
                if rec["text"] and tag is not None:
                    rec["text"] += r" \tag{" + str(tag) + "}"
            elif label == "table":
                # structure-rec analog: html arrives on the layout record
                # (G4); normalized through the grid algebra
                from . import tables as tbl
                grids = tbl.parse_tables(str(blk.get("html", "")))
                if grids:
                    rec["text"] = tbl.render_table_html(grids[0])
                    tables_parsed += 1
                    cm = blk.get("cell_merge")
                    if isinstance(cm, list) and cm:
                        # VLM cross-page cell-continuation signal
                        # (vlm_magic_model.py:231-232): consumed by the
                        # cross-page merge below
                        rec["_cmerge"] = [int(bool(v)) for v in cm]
            elif label == "image":
                # S8 image sink analog: deterministic sha256-named path
                # string per the reference's crop-file naming
                # (pdf_image_tools.py:495-514 — sha256 of
                # "{type}/{page_md5}_{page}_{x0}_{y0}_{x1}_{y1}" + .jpg;
                # no raster here, so the page-image md5 term is omitted
                # and the name derives from geometry alone)
                import hashlib as _hl
                key = (f"image/{page_idx}_{int(bx0)}_{int(by0)}"
                       f"_{int(bx1)}_{int(by1)}")
                rec["img_path"] = \
                    f"images/{_hl.sha256(key.encode()).hexdigest()}.jpg"
            else:
                # vertical detection (B5): tall-narrow block whose line
                # segmentation degenerates to single-char lines
                bw, bh = max(1e-6, bx1 - bx0), by1 - by0
                blk_spans = blk.get("spans")
                if isinstance(blk_spans, list) and blk_spans \
                        and page_median_h > 0:
                    if _is_vertical_by_spans(blk_spans):
                        # B5 span-statistics rule (span_block_fix.py:9-30):
                        # >80% of spans taller than 2× their width
                        text, bspans = _assemble_vertical(pc, sel, page_idx)
                        rec["text"] = text
                        rec["_vert"] = True
                        rec["_vmg"] = _vertical_merge_geometry(pc, sel)
                        spans_out.extend(bspans)
                        if rec["text"]:
                            raw.append(rec)
                        continue
                    # E7 span path: model-emitted span boxes on the block
                    lines, lbb, bspans, ne = _assemble_block_from_spans(
                        pc, sel, blk_spans, page_median_h, page_idx)
                    empty_spans += ne
                else:
                    lines, lbb, bspans = _assemble_block(pc, sel, page_idx)
                if (bh / bw >= VERTICAL_ASPECT and len(lines) >= 3
                        and sum(1 for ln in lines if len(ln) == 1)
                        >= VERTICAL_SINGLE * len(lines)):
                    text, bspans = _assemble_vertical(pc, sel, page_idx)
                    rec["text"] = text
                    rec["_vert"] = True
                    rec["_vmg"] = _vertical_merge_geometry(pc, sel)
                elif rec["type"] == "code":
                    # "code" and "algorithm" labels both map here; an
                    # empty language guess marks the ALGORITHM sub_type
                    # downstream (pre-wrap HTML render)
                    rec["text"] = "\n".join(lines)
                    rec["lang"] = guess_code_lang(rec["text"])
                elif rec["type"] == "index":
                    # "content" label (the reference's TOC/INDEX): every
                    # line is an item-start (para_split.py:62-64)
                    kept = [ln.strip() for ln in lines if ln.strip()]
                    rec["text"] = "\n".join(kept)
                    rec["_starts"] = [True] * len(kept)
                elif label == "list":
                    # model-labeled list: lines kept VERBATIM (the
                    # reference renders span content as-is — markers are
                    # part of the text); marker lines start items
                    kept = [ln.strip() for ln in lines if ln.strip()]
                    rec["text"] = "\n".join(kept)
                    rec["_starts"] = [bool(_LIST_MARKER.match(ln))
                                      for ln in kept]
                elif label == "text" and is_list_block(lines):
                    # D1: unlabeled marker list detected from line
                    # structure; the marker IS the item-start signal
                    rec["type"] = "list"
                    kept = [ln.strip() for ln in lines if ln.strip()]
                    rec["text"] = "\n".join(kept)
                    rec["_starts"] = [bool(_LIST_MARKER.match(ln))
                                      for ln in kept]
                elif label == "text" and len(lines) >= 2 and (ks := (
                        classify_text_block(lines, lbb,
                                            (bx0, by0, bx1, by1), pw))
                        )[0] != "text":
                    # D1: geometric list/index classification (edge
                    # stats) + the reference's IS_LIST_START_LINE marks
                    # (kept aligned through the blank-line filter)
                    rec["type"] = ks[0]
                    kept_pairs = [(ln.strip(), st) for ln, st in
                                  zip(lines, ks[1]) if ln.strip()]
                    rec["text"] = "\n".join(p[0] for p in kept_pairs)
                    rec["_starts"] = [p[1] for p in kept_pairs]
                else:
                    rec["text"] = emit.merge_lines(lines)
                    # typed span runs for content_list_v2 (text / sup /
                    # sub / inline_equation, in reading order)
                    rec["_runs"] = [(s["type"], s["content"])
                                    for s in bspans]
                    # block→line→span hierarchy with page-normalized
                    # bboxes for the middle IR (reference keeps
                    # page→block→line→span geometry end to end)
                    if len(lbb):
                        def _nb(v):
                            return [round(v[0] / pw * 1000),
                                    round(v[1] / ph * 1000),
                                    round(v[2] / pw * 1000),
                                    round(v[3] / ph * 1000)]
                        by_line: dict[int, list] = {}
                        for s in bspans:
                            by_line.setdefault(
                                int(s.get("line", 0)), []).append(s)
                        rec["_lines"] = [
                            {"bbox": _nb(lbb[li]),
                             "spans": [{"bbox": _nb(s["bbox"]),
                                        "content": s["content"],
                                        "type": s["type"]}
                                       for s in by_line.get(li, [])]}
                            for li in range(len(lbb))]
                    if lines and len(lbb):
                        # merge-guard geometry for the cross-page/column
                        # paragraph merge (D1, para_split.py:265-306)
                        ux0 = float(lbb[:, 0].min())
                        ux1 = float(lbb[:, 2].max())
                        lh = float(lbb[0, 3] - lbb[0, 1])
                        rec["_mg"] = {
                            "first_flush": abs(float(lbb[0, 0]) - ux0)
                            < lh / 2,
                            "last_right_flush": abs(ux1 - float(lbb[-1, 2]))
                            < lh,
                            "width": ux1 - ux0,
                            "n_lines": len(lines),
                            "y0": float(lbb[:, 1].min()),
                            "y1": float(lbb[:, 3].max()),
                        }
                spans_out.extend(bspans)

            if rec["text"] or label == "image":
                raw.append(rec)

        # B10 fallbacks: promote unlabeled caption fragments (inline /
        # stacked / leading-continuation rules) before parent attachment
        _fallback_captions(raw)

        # B10: attach caption/footnote blocks to the best visual parent of
        # the matching kind (reference find_best_visual_parent,
        # visual_magic_model_utils.py:535-621): min reading-order distance;
        # on ties, geometric edge distance when it discriminates (> 2pt
        # spread), else table-caption→later table / footnote→earlier
        # parent, else min center distance
        page_blocks: list[dict] = []
        # CODE is a visual main type in the reference pipeline
        # (VISUAL_MAIN_TYPES, pipeline_magic_model.py:44) — only the
        # GENERIC child labels can reach it (typed caption labels carry
        # a table/image kind), exactly like the reference whose pipeline
        # children are generic-only
        visuals = {i: r for i, r in enumerate(raw)
                   if r["label"] in ("table", "image", "code",
                                     "algorithm")}
        for i, r in enumerate(raw):
            slot = CAPTION_LABELS.get(r["label"])
            if slot:
                kind, field = slot
                cands = [j for j, v in visuals.items()
                         if kind is None or v["label"] == kind]
                if cands:
                    dmin = min(abs(visuals[j]["pos"] - r["pos"])
                               for j in cands)
                    tied = [j for j in cands
                            if abs(visuals[j]["pos"] - r["pos"]) == dmin]
                    if len(tied) == 1:
                        pick = tied[0]
                    else:
                        ed = {j: _bbox_edge_distance(r["_raw"],
                                                     visuals[j]["_raw"])
                              for j in tied}
                        if max(ed.values()) - min(ed.values()) > 2:
                            pick = min(tied,
                                       key=lambda j: (ed[j],
                                                      visuals[j]["pos"]))
                        elif field == "caption" and all(
                                visuals[j]["label"] == "table"
                                for j in tied):
                            # a caption between two near-equidistant tables
                            # belongs to the LATER one (applies to the
                            # generic figure_title label too when every
                            # tied parent is a table)
                            pick = max(tied, key=lambda j: visuals[j]["pos"])
                        elif field == "footnote":
                            pick = min(tied, key=lambda j: visuals[j]["pos"])
                        else:
                            pick = min(
                                tied,
                                key=lambda j: (_bbox_center_distance(
                                    r["_raw"], visuals[j]["_raw"]),
                                    visuals[j]["pos"]))
                    visuals[pick][field].append(r["text"])
                    # keep the child's READING-ORDER position so the md
                    # render can interleave children with the body in
                    # index order (reference get_blocks_in_index_order,
                    # pipeline_middle_json_mkcontent.py:91-101)
                    visuals[pick].setdefault("_vsegs", []).append(
                        (r["pos"], field, r["text"]))
                    continue
                r["type"] = "text"  # orphan caption degrades to text
            page_blocks.append(r)
        for r in page_blocks:
            if "_vsegs" in r:
                segs = sorted(r.pop("_vsegs")
                              + [(r["pos"], "body", None)])
                r["_vorder"] = [(f, t) for _, f, t in segs]
            r.pop("label", None)
            r.pop("pos", None)
            r.pop("_raw", None)
        blocks_out.extend(page_blocks)

    for s in spans_out:
        s.pop("line", None)  # block-local id; not part of the span record
    blocks_out, tables_xmerged = _merge_cross_page_tables(blocks_out)
    blocks_out, para_merged = _merge_split_paras(blocks_out)
    if discarded_out:
        # append each page's discarded blocks AFTER its content blocks
        # (the reference's para_blocks + discarded_blocks page order,
        # mkcontent :983-985); merges above never see them
        by_page: dict[int, list[dict]] = {}
        for d in discarded_out:
            by_page.setdefault(d["page_idx"], []).append(d)
        combined: list[dict] = []
        cur_page: int | None = None
        for b in blocks_out:
            if cur_page is not None and b["page_idx"] != cur_page:
                combined.extend(by_page.pop(cur_page, []))
                for p in sorted(k for k in by_page
                                if cur_page < k < b["page_idx"]):
                    combined.extend(by_page.pop(p))
            cur_page = b["page_idx"]
            combined.append(b)
        if cur_page is not None:
            combined.extend(by_page.pop(cur_page, []))
        for p in sorted(by_page):  # pages with ONLY discarded blocks
            combined.extend(by_page[p])
        blocks_out = combined

    ocr = 0
    scripted = sum(script_counts.values())
    minor_scripts = [k for k, v in script_counts.items()
                     if scripted and v / scripted >= 0.05]
    minor_share = (1.0 - max(script_counts.values()) / scripted)         if scripted else 0.0
    if bad_aspect:
        ocr = 1  # C2 (pdf_classify.py:290-310)
    elif max_page_chars > MAX_CHARS_PER_PAGE:
        ocr = 1  # E6 runaway page (reference const span_pre_proc.py:17)
    elif total_chars / n_pages < MIN_CHARS_PER_PAGE:
        ocr = 1  # C3
    elif total_chars and map_err_chars / total_chars >= MAP_ERR_RATIO:
        ocr = 1  # C4 unicode-map failures (pdf_classify.py:459-476, :137-149)
    elif c5_trig:
        ocr = 1  # C5 CID font without ToUnicode (pdf_classify.py:596-655)
    elif c6_trig:
        ocr = 1  # C6 Latin-CharSet font decoding CJK (pdf_classify.py:658-732)
    elif total_chars and abnormal_chars / total_chars >= ABNORMAL_RATIO:
        ocr = 1  # C7 (control/PUA/replacement; PUA doubles as E10 signal)
    elif len(minor_scripts) >= SCRIPT_MIN and minor_share >= SCRIPT_MIX_RATIO:
        ocr = 1  # C8 cross-script mix (pdf_classify.py:49-71, :749-799)
    elif cjk_chars >= 50 and mojibake_chars / cjk_chars >= MOJIBAKE_RATIO:
        ocr = 1  # C9 mojibake detector (pdf_classify.py:802-828)
    elif total_chars and punct_run_chars / total_chars >= PUNCT_RUN_RATIO:
        ocr = 1  # C10 (ASCII-punct runs, pdf_classify.py:837-929)
    elif sampled and high_cov_pages / len(sampled) >= IMAGE_COVERAGE:
        ocr = 1  # C11 high image coverage (pdf_classify.py:242-246,:1055-1090)

    metrics = {
        "blocks_classified": sum(1 for b in blocks_out
                                 if not b.get("discarded")),
        "blocks_discarded": blocks_discarded,
        "boilerplate_dropped": blocks_discarded,
        "tables_parsed": tables_parsed,
        "chars_deduped": chars_deduped,
        "ocr_fallback": ocr,
        "para_merged": para_merged,
        "tables_merged": tables_xmerged,
        "spans_need_ocr": empty_spans,
    }
    return blocks_out, spans_out, metrics


def _merge_cross_page_tables(blocks: list[dict]) -> tuple[list[dict], int]:
    """In-document cross-PAGE table merge (reference table_merge.py
    :661-733 + table_continuation.py markers; distinct from the
    cross-TURN D2 merge in oracle.finalize_conv): the last block of page p
    and the first block of page p+1 are both tables, and either the later
    one's caption carries a continuation marker ('(continued)' / 续表 —
    repeated header dropped) or it is a headerless structural continuation
    with the same column count."""
    from . import tables as tbl

    out: list[dict] = []
    merged = 0
    for b in blocks:
        if (out and b["type"] == "table" and out[-1]["type"] == "table"
                and b["page_idx"] == out[-1]["page_idx"] + 1):
            p = out[-1]
            ga = tbl.parse_tables(p["text"])
            gb = tbl.parse_tables(b["text"])
            if len(ga) == 1 and len(gb) == 1:
                marked = any(tbl.is_continuation_text(c)
                             for c in b.get("caption", []))
                cmerge = b.get("_cmerge")
                # marked continuations — and blocks carrying the model's
                # cell_merge continuation signal — go through the full
                # structural merge (multi-row repeated headers skipped
                # with rowspan expansion, unequal column counts aligned
                # by colspan adjustment, split cells re-joined); unmarked
                # ones keep the conservative headerless equal-column rule
                m = (tbl.merge_structural(ga[0], gb[0], cell_merge=cmerge)
                     if (marked or cmerge)
                     else tbl.merge_continuation(ga[0], gb[0]))
                if m is not None:
                    keep_caps = [c for c in b.get("caption", [])
                                 if not tbl.is_continuation_text(c)]
                    # continuation children render AFTER the anchor's
                    # (their reading-order indices are later); the
                    # continuation marker caption drops entirely
                    tail = [(f, t) for f, t in b.get("_vorder", [])
                            if f != "body"
                            and not (f == "caption"
                                     and tbl.is_continuation_text(t))]
                    vorder = (p.get("_vorder")
                              or [("caption", c)
                                  for c in p.get("caption", [])]
                              + [("body", None)]
                              + [("footnote", f)
                                 for f in p.get("footnote", [])])
                    out[-1] = {**p, "text": tbl.render_table_html(m),
                               "caption": p.get("caption", []) + keep_caps,
                               "footnote": p.get("footnote", [])
                               + b.get("footnote", []),
                               "_vorder": vorder + tail}
                    merged += 1
                    continue
        out.append(b)
    return out, merged


def _merge_split_paras(blocks: list[dict]) -> tuple[list[dict], int]:
    """Cross-page/column paragraph merge (D1, reference
    para_split.py:265-306 __merge_2_text_blocks): a later text block merges
    into the previous one iff ALL the reference guards hold:

    - the later block's first line is left-flush (a real new paragraph
      would be indented);
    - the previous block's last line reaches its right edge (the sentence
      ran out of room, not out of words);
    - the previous text does not end with a stop flag (. ! ? ) " : ; and
      CJK equivalents);
    - block widths differ by less than 2× (width ratio guard);
    - the later text does not start with a digit or an uppercase letter;
    - the later block sits ABOVE the previous block's bottom edge or on a
      later page (column/page wrap — stacked same-column paragraphs never
      merge, para_split.py:300 `block1.bbox[1] < block2.bbox[3]`);
    - at least one of the two blocks has more than one line.

    Hyphen endings splice, CJK joins without a space (emit.merge_lines).
    Blocks merged across pages are marked cross_page (SplitFlag analog)."""
    out: list[dict] = []
    merged = 0
    for b in blocks:
        # adjacent list/list or index/index blocks merge unconditionally
        # (para_split.py:404-411 __merge_2_list_blocks; adjacency implies
        # same group — a title/equation between them breaks it)
        if (out and b["type"] in ("list", "index")
                and out[-1]["type"] == b["type"]
                and out[-1]["text"] and b["text"]):
            p = out[-1]
            pn = len(p["text"].split("\n"))
            bn = len(b["text"].split("\n"))
            # line start flags travel with their lines through the merge
            # (reference __merge_2_list_blocks extends the marked lines)
            starts = (list(p.get("_starts") or [True] * pn)
                      + list(b.get("_starts") or [True] * bn))
            out[-1] = {**p, "text": p["text"] + "\n" + b["text"],
                       "_starts": starts}
            if b["page_idx"] > p["page_idx"]:
                out[-1]["cross_page"] = True
            merged += 1
            continue
        # D1 vertical variant (para_split.py:309-345,
        # __merge_2_vertical_text_blocks): the later (left) vertical block
        # merges into the earlier (right) one iff its first column starts
        # at the block top (< colw/2), the earlier's last column reaches
        # its bottom (< colw), no stop flag, comparable heights
        # (|h1-h2| < min(h1,h2)), the later text does not open with a
        # digit/uppercase, and the later block's right edge passes the
        # earlier's left edge (right→left column flow).
        if (out and b.get("_vert") and out[-1].get("_vert")
                and b["type"] == "text" and out[-1]["type"] == "text"):
            p = out[-1]
            mp, mb = p.get("_vmg"), b.get("_vmg")
            head = b["text"][:1]
            if mp and mb and p["text"] and b["text"]:
                hp, hb = mp["y1"] - mp["y0"], mb["y1"] - mb["y0"]
                if (abs(mb["y0"] - mb["first_top"]) < mb["first_w"] / 2
                        and abs(mp["y1"] - mp["last_bottom"]) < mp["last_w"]
                        and not p["text"].endswith(LINE_STOP_FLAG)
                        and abs(hp - hb) < min(hp, hb)
                        and not head.isdigit() and not head.isupper()
                        and mb["x1"] > mp["x0"]):
                    # vertical runs are CJK: columns join with no separator
                    out[-1] = {**p, "text": p["text"] + b["text"],
                               "_vmg": {**mp,
                                        "last_bottom": mb["last_bottom"],
                                        "last_w": mb["last_w"],
                                        "x0": min(mp["x0"], mb["x0"]),
                                        "x1": max(mp["x1"], mb["x1"]),
                                        "y0": min(mp["y0"], mb["y0"]),
                                        "y1": max(mp["y1"], mb["y1"])}}
                    if b["page_idx"] > p["page_idx"]:
                        out[-1]["cross_page"] = True
                    merged += 1
                    continue
        if out and b["type"] == "text" and out[-1]["type"] == "text":
            p = out[-1]
            mp, mb = p.get("_mg"), b.get("_mg")
            head = b["text"][:1]
            if (mp and mb and p["text"] and b["text"]
                    and mb["first_flush"]
                    and mp["last_right_flush"]
                    and not p["text"].endswith(LINE_STOP_FLAG)
                    and abs(mp["width"] - mb["width"])
                    < min(mp["width"], mb["width"])
                    and not head.isdigit() and not head.isupper()
                    and (b["page_idx"] > p["page_idx"]
                         or mb["y0"] < mp["y1"])
                    and (mp["n_lines"] > 1 or mb["n_lines"] > 1)):
                cross = b["page_idx"] > p["page_idx"]
                out[-1] = {**p,
                           "text": emit.merge_lines([p["text"], b["text"]]),
                           "_mg": {**mp, "last_right_flush":
                                   mb["last_right_flush"],
                                   "n_lines": mp["n_lines"] + mb["n_lines"]}}
                if p.get("_runs") and b.get("_runs"):
                    out[-1]["_runs"] = p["_runs"] + b["_runs"]
                if p.get("_lines") and b.get("_lines"):
                    out[-1]["_lines"] = p["_lines"] + b["_lines"]
                if cross:
                    out[-1]["cross_page"] = True
                merged += 1
                continue
        out.append(b)
    for b in out:
        b.pop("_mg", None)
        b.pop("_vmg", None)
        b.pop("_vert", None)
        b.pop("_cmerge", None)
    return out, merged


def blocks_to_md(blocks: list[dict]) -> str:
    """Blocks (already in reading order) → markdown; pages joined by a
    blank line like the reference (mkcontent :1005-1006)."""
    pages: dict[int, list[str]] = {}
    for b in blocks:
        seg = emit.render_block(b)
        if seg:
            pages.setdefault(b["page_idx"], []).append(seg)
    return emit.join_pages(["\n\n".join(pages[p]) for p in sorted(pages)])
