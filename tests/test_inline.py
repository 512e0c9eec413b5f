"""Office inline renderer parity pins (kernels/inline.py — the
reference's mkcontent inline_renderer.py re-expressed over payload
runs).  Every expectation is hand-derived from the reference's rules;
file:line cites are in the kernel docstrings."""

from mineru_spark.kernels import inline
from mineru_spark.kernels.docx import _render_runs


def md(runs):
    return _render_runs(runs)[0]


def test_runs_concatenate_directly():
    # Word splits text across runs arbitrarily; the paragraph join is
    # '' — a mid-word split must reassemble seamlessly
    assert md([{"text": "Hel"}, {"text": "lo world"}]) == "Hello world"


def test_same_key_runs_group_into_one_wrapper():
    # adjacent same-style-key spans concatenate INSIDE one wrapper
    # (_append_markdown_grouped_text_parts)
    assert md([{"text": "bol", "bold": True},
               {"text": "d run", "bold": True}]) == "**bold run**"
    # bold+italic shares the *** key regardless of payload flag order
    assert md([{"text": "a ", "bold": True, "italic": True},
               {"text": "b", "italic": True, "bold": True}]) == "***a b***"


def test_edge_whitespace_outside_wrapper():
    # leading/trailing whitespace of a styled group stays OUTSIDE the
    # markdown wrapper (_append_text_part :377-420)
    assert md([{"text": " pad ", "bold": True}]) == " **pad** "


def test_markdown_boundary_space_rule():
    # wrapped part ending in punctuation + text-char start → ONE space
    assert md([{"text": "Fig.", "bold": True},
               {"text": "shows"}]) == "**Fig.** shows"
    # no insertion when the next char is punctuation
    assert md([{"text": "Fig.", "bold": True},
               {"text": ",x"}]) == "**Fig.**,x"
    # no insertion when the previous char is not punctuation
    assert md([{"text": "Fig", "bold": True},
               {"text": "shows"}]) == "**Fig**shows"
    # no insertion when whitespace already separates
    assert md([{"text": "Fig.", "bold": True},
               {"text": " shows"}]) == "**Fig.** shows"
    # unwrapped previous part never triggers it
    assert md([{"text": "Fig."}, {"text": "shows"}]) == "Fig.shows"


def test_inline_equation_padding():
    assert md([{"text": "E is"}, {"math": "mc^2"},
               {"text": "here"}]) == "E is $mc^2$ here"
    # no trailing pad when the equation is last
    assert md([{"text": "x:"}, {"math": "y"}]) == "x: $y$"
    # no double space when one already exists
    assert md([{"text": "x: "}, {"math": "y"},
               {"text": " z"}]) == "x: $y$  z"


def test_two_distinct_md_keys_switch_block_to_html():
    # bold + italic units = two keys → HTML inline tags for the WHOLE
    # block (_select_block_inline_syntax :559-582)
    assert md([{"text": "a ", "bold": True},
               {"text": "b", "italic": True}]) \
        == "<strong>a</strong> <em>b</em>"
    # unstyled units don't count as a key
    assert md([{"text": "a ", "bold": True},
               {"text": "b"}]) == "**a** b"


def test_complex_style_switches_block_to_html():
    out = md([{"text": "normal ", "bold": True},
              {"text": "sup", "script": "super"}])
    assert out == "<strong>normal</strong> <sup>sup</sup>"
    # emphasis (East Asian emphasis mark) is a complex style
    out = md([{"text": "dot", "emphasis": True}])
    assert out == f'<span style="{inline.EMPHASIS_STYLE}">dot</span>'


def test_html_wrapper_stack_diff_merges_shared_styles():
    # both runs bold; the second adds italic — <strong> opens ONCE
    # (stack order: em outside strong per :688-705, so the shared
    # prefix is [bold] only when italic is absent)
    out = md([{"text": "bu ", "bold": True, "underline": True},
              {"text": "b2", "bold": True}])
    # the underlined run's trailing space is a VISIBLE space → '_'
    # edge marker inside the <u> (:300-315), then the stack diff closes
    # only </u> while <strong> spans both tokens
    assert out == "<strong><u>bu_</u>b2</strong>"
    # plain edge whitespace splits into an UNSTYLED token (:645-668),
    # so the stack fully closes around it — like the reference
    out = md([{"text": "bu", "bold": True, "underline": True},
              {"text": " b2", "bold": True}])
    assert out == "<strong><u>bu</u></strong> <strong>b2</strong>"
    # whereas direct adjacency shares the <strong> span
    out = md([{"text": "bu", "bold": True, "underline": True},
              {"text": "b2", "bold": True}])
    assert out == "<strong><u>bu</u>b2</strong>"


def test_visible_space_markers():
    # underlined spaces → '_' per space, underline dropped from the
    # marker run's own wrapper (:317-356)
    assert md([{"text": "a"}, {"text": "  ", "underline": True},
               {"text": "b"}]) == "a__b"
    # struckthrough spaces → '-'
    assert md([{"text": "a"}, {"text": " ", "strikethrough": True},
               {"text": "b"}]) == "a-b"
    # strikethrough with content: EDGE spaces become markers inside the
    # wrapper (:300-315)
    assert md([{"text": " x ", "strikethrough": True}]) == "~~-x-~~"
    # underline with content keeps edge markers too (complex → HTML)
    assert md([{"text": " x", "underline": True}]) == "<u>_x</u>"


def test_blank_run_style_normalization():
    # a whitespace-only run drops bold/italic entirely (reference
    # normalize_format_for_text, office_rich_text.py:88-115)
    assert md([{"text": "a"}, {"text": " ", "bold": True},
               {"text": "b"}]) == "a b"
    # ...and with a visible style it keeps only the visible rendering
    assert md([{"text": "a"}, {"text": " ", "bold": True,
                               "underline": True},
               {"text": "b"}]) == "a_b"


def test_standalone_marker_and_prefix_escape():
    assert inline.finalize_text_block("___") == "\\___"
    assert inline.finalize_text_block("---") == "\\---"
    assert inline.finalize_text_block("-x-") == "-x-"
    assert inline.finalize_text_block("- item like") == "\\- item like"
    # list items skip the prefix escape (output_builders.py:93)
    assert inline.finalize_text_block("- item like",
                                      escape_prefix=False) == "- item like"


def test_hyperlink_mixed_children_force_html():
    out = md([{"text": "go "},
              {"text": "bold ", "bold": True, "link": "https://e.org/"},
              {"text": "plain", "link": "https://e.org/"}])
    assert out == ('go <a href="https://e.org/"><strong>bold</strong> '
                   "plain</a>")


def test_hyperlink_uniform_children_stay_markdown():
    out = md([{"text": "go "},
              {"text": "all bold", "bold": True, "link": "https://e.org/"}])
    assert out == "go [**all bold**](https://e.org/)"


def test_hyperlink_label_bracket_escape():
    out = md([{"text": "see [it]", "link": "https://e.org/"}])
    assert out == "[see \\[it\\]](https://e.org/)"


def test_select_syntax_counts_hyperlink_children_keys():
    # italic link children + bold body text = two keys → HTML block
    out = md([{"text": "b ", "bold": True},
              {"text": "lnk", "italic": True, "link": "https://e.org/"}])
    assert out == ('<strong>b</strong> <a href="https://e.org/">'
                   "<em>lnk</em></a>")


def test_v2_records_keep_visible_whitespace_spans():
    _, recs = _render_runs([{"text": "a"},
                            {"text": "  ", "underline": True},
                            {"text": "b"}])
    assert ("styled", "  ", ["underline"]) in recs
    # plain blank runs contribute no record
    _, recs = _render_runs([{"text": "a"}, {"text": " "}, {"text": "b"}])
    assert recs == [("text", "a"), ("text", "b")]


def test_office_display_math():
    """A display-flagged math run renders as a $$ block inside the
    paragraph (inline_renderer.py:919-929): no space padding, never a
    boundary-space target, and the v2 record is equation_interline."""
    out, recs = md_recs([{"text": "see:", "bold": True},
                         {"math": "x^2", "display": True},
                         {"text": " done."}])
    assert out == "**see:**$$\nx^2\n$$ done."
    assert ("interline_equation", "x^2") in recs


def md_recs(runs):
    from mineru_spark.kernels.docx import _render_runs
    return _render_runs(runs)
