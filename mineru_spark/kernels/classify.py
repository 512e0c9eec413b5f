"""Payload routing (SURVEY.md §2.2).

The reference's ``auto`` router is a 10-signal early-exit cascade over PDF
bytes (reference mineru/utils/pdf_classify.py:94-256, thresholds :17-48) +
byte-signature sniffing at ingest (guess_suffix_by_bytes,
mineru/utils/guess_suffix_or_lang.py:87; read_fn cli/common.py:171-183).

For transcript payloads the ingest-level sniff becomes a cheap prefix
classifier → ``parse_route`` column (a plain projection+filter in Spark);
the txt/ocr sub-decision for char-stream payloads (C3 min chars/page, C7
abnormal char ratio) lives in charstream.extract_pdf and surfaces as the
``ocr_fallback`` metric, an explicit deliverable of the north rule.
"""

from __future__ import annotations

ROUTES = ("empty", "html", "pdf", "pptx", "docx", "xlsx", "office", "plain")

# The exact character set Python's str.lstrip() strips (str.isspace() ==
# True), spelled as a Java regex class so the JVM-side office-run sniff
# (pipeline._candidate_run_keys / extract_finalized, streaming ingest
# _split_open_runs) detects EXACTLY the rows classify_payload routes to
# 'office'.  Java's bare \s is ASCII-only and Spark's F.ltrim strips only
# ' ' — both diverge from lstrip() on '\n<table…' payloads (round-3
# verdict finding #1), silently skipping the cross-turn table merge.
# Note \x1C-\x1F and \x85: Python treats them as whitespace, Unicode's
# White_Space property (Java (?U)\s) omits the former.
_PY_WS_CLASS = ("\\t\\n\\x0B\\f\\r \\x1C-\\x1F\\x85\\xA0\\u1680"
                "\\u2000-\\u200A\\u2028\\u2029\\u202F\\u205F\\u3000")

# Anchored, case-insensitive: matches iff text.lstrip().lower() starts
# with '<table' — i.e. iff classify_payload() returns 'office'.  Anchored
# at ^ so a non-whitespace first char fails in O(1); no substring window,
# so arbitrarily long leading whitespace (which lstrip() also eats) can't
# hide an office payload from the JVM sniff.
OFFICE_SNIFF_RE = "(?i)^[" + _PY_WS_CLASS + "]*<table"


def classify_payload(text: str | None, tool: str | None = None) -> str:
    """Early-exit prefix sniff; mirrors the reference's content-type probe
    order (magic bytes first, structure second)."""
    if text is None or not text.strip():
        return "empty"
    head = text.lstrip()[:200]
    if head.startswith("{") and '"kind"' in head:
        if "pdf_chars" in head:
            return "pdf"
        if "pptx_shapes" in head:
            return "pptx"
        if "docx_runs" in head:
            return "docx"
        if "xlsx_cells" in head:
            return "xlsx"
    low = head.lower()
    if low.startswith("<table"):
        return "office"
    if low.startswith("<!doctype") or low.startswith("<html") or "<" in low[:80]:
        return "html"
    return "plain"


def classify_series(text, tool=None):
    """Vectorized twin of :func:`classify_payload` for the Spark-side
    pandas UDF: the same decision cascade as pandas ``.str`` ops +
    ``np.select`` — no per-row Python.  Parity with the scalar version is
    asserted by tests/test_kernels.py::test_classify_series_parity."""
    import numpy as np
    import pandas as pd

    s = text.fillna("").astype(str)
    head = s.str.lstrip().str.slice(0, 200)
    low = head.str.lower()
    jsonish = head.str.startswith("{") & head.str.contains('"kind"',
                                                           regex=False)
    conds = [
        s.str.strip().eq(""),
        jsonish & head.str.contains("pdf_chars", regex=False),
        jsonish & head.str.contains("pptx_shapes", regex=False),
        jsonish & head.str.contains("docx_runs", regex=False),
        jsonish & head.str.contains("xlsx_cells", regex=False),
        low.str.startswith("<table"),
        (low.str.startswith("<!doctype") | low.str.startswith("<html")
         | low.str.slice(0, 80).str.contains("<", regex=False)),
    ]
    choices = ["empty", "pdf", "pptx", "docx", "xlsx", "office", "html"]
    return pd.Series(np.select(conds, choices, default="plain"),
                     index=s.index)
