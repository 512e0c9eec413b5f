"""Office-route caption machinery (SURVEY.md §2.8 O4).

Re-expresses the reference's office caption subsystem — the part of
`mineru/backend/office/office_magic_model.py` that turns flat converter
blocks into two-layer visual blocks with attached captions:

- `classify_caption_blocks` (:737-…): STEP 1 promotes the text block
  immediately after a table/image/chart to a caption when its stripped,
  lower-cased content starts with the kind's prefixes (table: 表/table;
  image: 图/fig; chart: 图/fig/chart). STEP 2 classifies every caption
  block by its ADJACENT parent — scan backward then forward, skipping
  only consecutive captions, stopping at any other type; the previous
  parent wins over the next; a caption with no adjacent visual demotes
  to text.
- `tie_up_category_by_index` (`mineru/utils/magic_model_utils.py:
  40-134`, via the `include_bbox=False` wrapper
  `office_magic_model.py:623-653`): each typed caption attaches to the
  body of its kind with the minimal EFFECTIVE index distance — the
  absolute index gap minus the number of other same-kind captions
  strictly between; on a tie the FIRST body in page order wins (the
  no-bbox branch, magic_model_utils.py:120-121).
- `fix_two_layer_blocks` (`office_magic_model.py:667-735`): per body,
  captions sort by index DESCENDING and only the contiguous run
  closest to the body survives — a gap whose indices are exactly
  {body_index} is not a gap (one caption on each side of the body is
  contiguous); once a real gap appears, the remaining captions demote
  to text, as do captions never attached.

The reference runs this per page inside its office MagicModel
(`blocks_to_page_info`, `model_output_to_middle_json.py:11-66`); here
it runs per `page_idx` group over the flat office block list. Attached
captions move into the body block's `caption` list (the same two-layer
model the charstream route's B10 uses) with their styled run records in
a parallel `caption_recs` list for content_list_v2; demoted captions
stay in place retyped as text.
"""

from __future__ import annotations

_VISUALS = ("table", "image", "chart")
# caption prefixes per parent kind (classify_caption_blocks rule 5,
# office_magic_model.py:748-760)
_PREFIXES = {
    "table": ("表", "table"),
    "image": ("图", "fig"),
    "chart": ("图", "fig", "chart"),
}


def _effective_diff(a: int, b: int, obj_indices: set[int]) -> int:
    """Index distance minus same-kind captions strictly between
    (calc_effective_index_diff, magic_model_utils.py:86-106)."""
    if a == b:
        return 0
    lo, hi = (a, b) if a < b else (b, a)
    return (hi - lo) - sum(1 for k in range(lo + 1, hi)
                           if k in obj_indices)


def _contiguous_run(caps_desc: list[int], body: int) -> tuple[list, list]:
    """Keep the caption run contiguous with the body; a gap of exactly
    {body} is bridged (fix_two_layer_blocks, office_magic_model.py:
    676-702). Returns (kept ascending, demoted)."""
    kept = [caps_desc[0]]
    demoted: list[int] = []
    for i in range(1, len(caps_desc)):
        prev, cur = caps_desc[i - 1], caps_desc[i]
        if cur == prev - 1 or set(range(cur + 1, prev)) == {body}:
            kept.append(cur)
        else:
            demoted = caps_desc[i:]
            break
    kept.reverse()
    return kept, demoted


def _attach_page(pb: list[dict]) -> list[dict]:
    n = len(pb)
    pb = list(pb)
    # STEP 1: prefix promotion of the first text block after a visual.
    # The reference mutates page_blocks[i+1] mid-iteration; promoting to
    # "caption" removes it from both the visual set and the text set, so
    # a single forward pass with in-place retype is equivalent.
    for i, b in enumerate(pb):
        bt = b.get("type")
        if bt in _PREFIXES and i + 1 < n \
                and pb[i + 1].get("type") == "text":
            content = str(pb[i + 1].get("text", "")).strip().lower()
            if any(content.startswith(p) for p in _PREFIXES[bt]):
                pb[i + 1] = {**pb[i + 1], "type": "caption"}

    # STEP 2: adjacent-parent classification (kind or None=demote)
    kinds: dict[int, str | None] = {}
    for i, b in enumerate(pb):
        if b.get("type") != "caption":
            continue
        prev_parent = next_parent = None
        j = i - 1
        while j >= 0:
            t = pb[j].get("type")
            if t in _VISUALS:
                prev_parent = t
                break
            if t != "caption":
                break
            j -= 1
        k = i + 1
        while k < n:
            t = pb[k].get("type")
            if t in _VISUALS:
                next_parent = t
                break
            if t != "caption":
                break
            k += 1
        kinds[i] = prev_parent or next_parent

    if not kinds:
        return pb

    # STEP 3: per-kind tie-up + continuity filter
    attach_to: dict[int, int] = {}          # caption pos → body pos
    demote: set[int] = {i for i, kd in kinds.items() if kd is None}
    for kind in _VISUALS:
        objs = sorted(i for i, kd in kinds.items() if kd == kind)
        if not objs:
            continue
        subs = [i for i, b in enumerate(pb) if b.get("type") == kind]
        if not subs:           # unreachable after step 2, kept for safety
            demote |= set(objs)
            continue
        obj_set = set(objs)
        per_body: dict[int, list[int]] = {s: [] for s in subs}
        for o in objs:
            best = None
            best_d = None
            for s in subs:     # ties keep the first body in page order
                d = _effective_diff(o, s, obj_set)
                if best_d is None or d < best_d:
                    best, best_d = s, d
            per_body[best].append(o)
        for body, caps in per_body.items():
            if not caps:
                continue
            kept, demoted = _contiguous_run(sorted(caps, reverse=True),
                                            body)
            demote |= set(demoted)
            for c in kept:
                attach_to[c] = body

    out: list[dict] = []
    for i, b in enumerate(pb):
        if b.get("type") == "caption":
            if i in attach_to:
                continue       # rides inside its body block
            nb = {**b, "type": "text"}
            out.append(nb)
            continue
        if b.get("type") in _VISUALS:
            caps = sorted(c for c, bd in attach_to.items() if bd == i)
            if caps:
                nb = {**b}
                nb["caption"] = (list(nb.get("caption", ()))
                                 + [str(pb[c].get("text", ""))
                                    for c in caps])
                # pre-rendered captions (docx run machinery) skip the
                # md re-escape; promoted plain texts (xlsx singletons)
                # escape at render like any text block would have
                nb["caption_pre"] = [bool(pb[c].get("pre_rendered"))
                                     for c in caps]
                recs = [pb[c].get("_runs") for c in caps]
                if any(recs):
                    nb["caption_recs"] = recs
                out.append(nb)
                continue
        out.append(b)
    return out


def attach_office_captions(blocks: list[dict]) -> list[dict]:
    """Run the caption pass per page over a flat office block list."""
    if not blocks:
        return blocks
    page_order: list[int] = []
    pages: dict[int, list[dict]] = {}
    for b in blocks:
        p = b.get("page_idx", 0)
        if p not in pages:
            pages[p] = []
            page_order.append(p)
        pages[p].append(b)
    if not any(b.get("type") == "caption" for b in blocks) \
            and not any(b.get("type") in _PREFIXES for b in blocks):
        return blocks
    return [b for p in page_order for b in _attach_page(pages[p])]
