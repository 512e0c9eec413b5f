"""Shared deterministic language-ID decision (r4 directives #7/#8).

ONE decision function used by three consumers so engine, oracle, and
markdown emission cannot drift:

- ``q_doc_langid`` (queries.py) builds the SAME cascade as Spark SQL
  expressions from the constants below, and its DuckDB oracle re-derives
  it in ANSI SQL — the decision is oracle-checked end-to-end;
- ``emit.merge_lines`` (M2) calls :func:`lang_of` per paragraph block to
  pick the CJK no-separator join vs the western hyphen/space join — the
  block-level language gate of the reference's ``_merge_para_text``
  (pipeline_middle_json_mkcontent.py:305-311 detect_lang +
  ``CJK_LANGS`` :221, language.py:21-40), with the fasttext model
  replaced by this deterministic cascade;
- the code-language guesser (charstream B12) is the sibling
  :func:`guess_code_lang` below.

Decision cascade (fixed order, fixed thresholds):

1. script ratios over the space-stripped text — hangul > 0.3 → ko,
   kana > 0.2 → ja (Japanese mixes kana with ideographs, so kana wins
   before the unified-CJK test), unified CJK > 0.3 → zh,
   cyrillic > 0.3 → ru;
2. otherwise stopword votes over whitespace-split words: the language
   with the most marker hits wins, ties break by LANG_PROFILES order,
   zero hits → "und".
"""

from __future__ import annotations

import re

# (lang, marker stopwords) — vote priority = tuple order
LANG_PROFILES = (
    ("en", ("the", "and", "of", "to", "in")),
    ("de", ("der", "die", "und", "das", "ist")),
    ("fr", ("le", "la", "les", "et", "est")),
    ("es", ("el", "los", "las", "y", "es")),
)

# script ranges as (lang, char-class, threshold), cascade order; the
# class strings are shared verbatim with the Spark regexp expressions and
# the DuckDB oracle SQL (queries._langid_oracle_sql)
SCRIPT_RULES = (
    ("ko", "가-힯", 0.3),    # hangul syllables
    ("ja", "぀-ヿ", 0.2),    # hiragana + katakana
    ("zh", "一-鿿", 0.3),    # CJK unified ideographs
    ("ru", "Ѐ-ӿ", 0.3),     # cyrillic
)
_SCRIPT_RX = tuple((lang, re.compile(f"[{cls}]"), thr)
                   for lang, cls, thr in SCRIPT_RULES)
_PROFILE_SETS = tuple((lang, frozenset(ws)) for lang, ws in LANG_PROFILES)
# one-pass voting table: word -> profile indices it votes for (stopword
# sets are small and static, so invert them once at import)
_WORD_VOTES: dict[str, tuple[int, ...]] = {}
for _i, (_lang, _ws) in enumerate(LANG_PROFILES):
    for _w in _ws:
        _WORD_VOTES[_w] = _WORD_VOTES.get(_w, ()) + (_i,)
# the SQL twin splits trim(text) on ' +' (SPACES only, runs collapsed);
# str.split() would split on all Unicode whitespace and diverge — e.g.
# 'et\nest' is ONE token to the SQL and must be one token here
_WORD_SPLIT = re.compile(" +")

CJK_LANGS = {"zh", "ja", "ko"}  # reference CJK_LANGS (mkcontent :221)


def lang_of(text: str) -> str:
    """The decision cascade; must agree row-for-row with q_doc_langid's
    Spark/SQL expression tree (tests/test_queries_oracle.py parity)."""
    if not text:
        return "und"
    # fast path: every script class starts at U+0370, so pure-ASCII text
    # (the overwhelming majority in the hot merge path) skips all four
    # script regexes — C-speed isascii() instead of 4 full scans
    if not text.isascii():
        dense = text.replace(" ", "")
        total = max(len(dense), 1)
        for lang, rx, thr in _SCRIPT_RX:
            if len(rx.findall(dense)) / total > thr:
                return lang
    # plain split(" ") instead of the ' +' regex split: the only
    # difference is empty tokens at space runs, which can never match a
    # stopword, so the VOTES are identical (the SQL twins use trim() —
    # space-only strip — which this preserves: '\nthe' stays one
    # non-matching token in both engines, r4 ADVICE parity fix).
    # One pass over the words via the inverted table instead of one
    # membership scan per profile.
    counts = [0] * len(LANG_PROFILES)
    votes = _WORD_VOTES
    for w in text.split(" "):
        e = votes.get(w)
        if e is not None:
            for i in e:
                counts[i] += 1
    best_n, best_i = 0, 0
    for i, c in enumerate(counts):
        if c > best_n:  # strict: ties keep the earlier profile
            best_n, best_i = c, i
    return LANG_PROFILES[best_i][0] if best_n > 0 else "und"


# ---------------------------------------------------------------------------
# B12: code-language guess (deterministic magika stand-in,
# reference guess_suffix_or_lang.py:73-85)
# ---------------------------------------------------------------------------

# token → (weight, language): distinctive identifiers/keywords with
# weights reflecting how language-specific each token is (public
# knowledge of language syntax; magika's label set trimmed to the
# languages that appear in extracted code blocks).  Scoring sums the
# weights of matched tokens; the max-score language wins when its score
# clears MIN_SCORE, ties break by _CODE_PRIORITY order.
_CODE_TOKEN_WEIGHTS = {
    "python": {"def": 3, "elif": 5, "lambda": 4, "self": 3, "import": 2,
               "None": 4, "True": 2, "False": 2, "print": 2, "yield": 4,
               "async": 2, "class": 1, "return": 1, "from": 1, "with": 1},
    "sql": {"select": 5, "where": 4, "join": 3, "insert": 4, "update": 2,
            "group": 2, "order": 2, "from": 2, "table": 2, "varchar": 5,
            "distinct": 4, "having": 5, "limit": 2, "into": 2},
    "javascript": {"function": 3, "const": 3, "let": 3, "var": 2,
                   "console": 4, "undefined": 5, "typeof": 5, "=>": 5,
                   "document": 3, "await": 2, "null": 1, "this": 1,
                   "new": 1, "export": 2},
    "java": {"public": 3, "static": 3, "void": 3, "private": 4,
             "extends": 4, "implements": 5, "String": 4, "System": 4,
             "final": 2, "package": 2, "class": 1, "new": 1,
             "@Override": 6, "throws": 4},
    "c": {"#include": 6, "printf": 5, "sizeof": 6, "malloc": 6,
          "#define": 6, "struct": 3, "char": 2, "int": 2, "void": 2,
          "NULL": 4, "return": 1},
    "go": {"func": 5, "fmt": 5, "nil": 4, "defer": 6, "chan": 6,
           "package": 3, "err": 3, "range": 2, "struct": 2, "var": 1,
           "interface": 2, ":=": 5},
    "rust": {"fn": 5, "mut": 6, "impl": 6, "pub": 4, "crate": 6,
             "println!": 7, "match": 2, "enum": 2, "let": 2, "use": 1,
             "Vec": 4, "Some": 3, "Ok": 3},
    "shell": {"echo": 4, "fi": 6, "esac": 7, "done": 4, "then": 4,
              "grep": 4, "sudo": 4, "#!/bin/bash": 8, "#!/bin/sh": 8,
              "export": 2, "$1": 5},
}
_CODE_PRIORITY = ("python", "sql", "javascript", "java", "c", "go",
                  "rust", "shell")
_CODE_MIN_SCORE = 4

# identifier-ish tokens plus the non-word operators in the tables
_CODE_TOKEN_RE = re.compile(
    r"#!/bin/(?:ba)?sh|#include|#define|@Override|println!|=>|:=|\$1"
    r"|[A-Za-z_][A-Za-z_0-9]*")


def guess_code_lang(text: str) -> str:
    """Deterministic token-weight classifier over the embedded table
    (B12; reference calls magika on the merged code text,
    guess_suffix_or_lang.py:73-85, and falls back to DEFAULT_LANG —
    here '' — when unsure).  SQL keywords are case-folded like SQL
    itself; everything else matches case-sensitively so `String` (java)
    and `None` (python) stay distinctive."""
    if not text:
        return ""
    tokens = _CODE_TOKEN_RE.findall(text)
    if not tokens:
        return ""
    scores = dict.fromkeys(_CODE_PRIORITY, 0)
    for tok in tokens:
        for lang, table in _CODE_TOKEN_WEIGHTS.items():
            w = table.get(tok)
            if w is None and lang == "sql":
                w = table.get(tok.lower())
            if w:
                scores[lang] += w
    best = max(_CODE_PRIORITY, key=lambda lg: scores[lg])
    # priority order breaks ties because max() keeps the first maximum
    return best if scores[best] >= _CODE_MIN_SCORE else ""
