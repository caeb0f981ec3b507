"""Reference parity vectors: every expected value in this file is
TRANSCRIBED from the reference's own Rust unit tests (file:line cited per
test) — not regenerated from our kernels. This is the independent
correctness anchor VERDICT r1 item 7 asked for: self-generated golden
fixtures can drift silently; these cannot.

Also includes float32-boundary probes for the threshold comparisons the
reference evaluates in f32 while we compute in f64 (ROUND1_NOTES
deviation 2): y-tolerance grouping and detect_columns gap ratios.
"""

import numpy as np
import pytest

from pdf_inspector_spark.kernels.detector import scan_content_for_text_operators
from pdf_inspector_spark.kernels.extractor import (TextItem, group_into_lines,
                                                   is_bold_font,
                                                   is_italic_font)
from pdf_inspector_spark.kernels.markdown import (detect_header_level,
                                                  format_list_item,
                                                  is_code_like, is_list_item,
                                                  to_markdown)
from pdf_inspector_spark.kernels.tables import (Table, detect_tables,
                                                table_to_markdown)
from pdf_inspector_spark.kernels.tounicode import ToUnicodeCMap


def _item(text, x, y, font_size=12.0, width=10.0, font="F1", page=1):
    return TextItem(text, x, y, width, font_size, font, font_size, page)


# ---------------------------------------------------------------------------
# src/detector.rs:429 test_scan_content_operators
# ---------------------------------------------------------------------------

def test_scan_content_operators():
    ops, imgs = scan_content_for_text_operators(
        b"BT /F1 12 Tf 100 700 Td (Hello World) Tj ET")
    assert (ops, imgs) == (1, False)
    ops2, _ = scan_content_for_text_operators(
        b"BT /F1 12 Tf 100 700 Td [(H) 10 (ello)] TJ ET")
    assert ops2 == 1
    ops3, imgs3 = scan_content_for_text_operators(
        b"q 100 0 0 100 50 700 cm /Img1 Do Q")
    assert (ops3, imgs3) == (0, True)


# ---------------------------------------------------------------------------
# src/extractor.rs:2448 test_group_into_lines
# ---------------------------------------------------------------------------

def test_group_into_lines():
    items = [
        TextItem("Hello", 100.0, 700.0, 50.0, 12.0, "F1", 12.0, 1),
        TextItem("World", 160.0, 700.0, 50.0, 12.0, "F1", 12.0, 1),
        TextItem("Next line", 100.0, 680.0, 80.0, 12.0, "F1", 12.0, 1),
    ]
    lines = group_into_lines(items)
    assert len(lines) == 2
    assert lines[0].text() == "Hello World"
    assert lines[1].text() == "Next line"


# ---------------------------------------------------------------------------
# src/extractor.rs:2498 test_bold_italic_detection
# ---------------------------------------------------------------------------

def test_bold_italic_detection():
    for f in ("Arial-Bold", "TimesNewRoman-Bold", "Helvetica-BoldOblique",
              "ABCDEF+ArialMT-Bold", "NotoSans-Black", "Roboto-SemiBold"):
        assert is_bold_font(f), f
    assert not is_bold_font("Arial")
    assert not is_bold_font("TimesNewRoman-Italic")
    for f in ("Arial-Italic", "TimesNewRoman-Italic", "Helvetica-Oblique",
              "ABCDEF+ArialMT-Italic", "Helvetica-BoldOblique"):
        assert is_italic_font(f), f
    assert not is_italic_font("Arial")
    assert not is_italic_font("TimesNewRoman-Bold")
    assert is_bold_font("Arial-BoldItalic") and is_italic_font("Arial-BoldItalic")
    assert is_bold_font("Helvetica-BoldOblique") and is_italic_font("Helvetica-BoldOblique")


# ---------------------------------------------------------------------------
# src/extractor.rs:2526 test_word_level_items_get_spaces
# ---------------------------------------------------------------------------

def test_word_level_items_get_spaces():
    items = [
        TextItem("the", 100.0, 500.0, 19.5, 12.0, "C2_0", 12.0, 1),
        TextItem("Prague", 119.5, 500.0, 42.0, 12.0, "C2_0", 12.0, 1),
        TextItem("Rules", 161.5, 500.0, 35.0, 12.0, "C2_0", 12.0, 1),
    ]
    lines = group_into_lines(items)
    assert len(lines) == 1
    assert lines[0].text() == "the Prague Rules"


# ---------------------------------------------------------------------------
# src/extractor.rs:2576 test_single_char_items_still_join
# ---------------------------------------------------------------------------

def test_single_char_items_still_join():
    items = [
        TextItem("N", 100.0, 500.0, 8.0, 12.0, "F1", 12.0, 1),
        TextItem("A", 108.0, 500.0, 8.0, 12.0, "F1", 12.0, 1),
        TextItem("V", 116.0, 500.0, 8.0, 12.0, "F1", 12.0, 1),
    ]
    lines = group_into_lines(items)
    assert len(lines) == 1
    assert lines[0].text() == "NAV"


# ---------------------------------------------------------------------------
# src/extractor.rs:2626 test_cjk_items_join_without_spaces
# ---------------------------------------------------------------------------

def test_cjk_items_join_without_spaces():
    items = [
        TextItem("である", 100.0, 500.0, 24.0, 12.0, "C2_0", 12.0, 1),
        TextItem("履行義務", 124.0, 500.0, 32.0, 12.0, "C2_0", 12.0, 1),
        TextItem("を識別す", 156.0, 500.0, 32.0, 12.0, "C2_0", 12.0, 1),
    ]
    lines = group_into_lines(items)
    assert len(lines) == 1
    assert lines[0].text() == "である履行義務を識別す"


# ---------------------------------------------------------------------------
# src/markdown.rs:1627 test_is_list_item
# ---------------------------------------------------------------------------

def test_is_list_item():
    for t in ("• Item one", "- Item two", "* Item three", "1. First",
              "2) Second", "a. Letter item"):
        assert is_list_item(t), t
    assert not is_list_item("Regular text")


# ---------------------------------------------------------------------------
# src/markdown.rs:1638 test_format_list_item
# ---------------------------------------------------------------------------

def test_format_list_item():
    assert format_list_item("• Item") == "- Item"
    assert format_list_item("- Item") == "- Item"
    assert format_list_item("1. First") == "1. First"


# ---------------------------------------------------------------------------
# src/markdown.rs:1645 test_is_code_like
# ---------------------------------------------------------------------------

def test_is_code_like():
    assert is_code_like("const x = 5;")
    assert is_code_like("function foo() {")
    assert is_code_like("import React from 'react'")
    assert not is_code_like("This is regular text.")


# ---------------------------------------------------------------------------
# src/markdown.rs:1653 test_detect_header_level
# ---------------------------------------------------------------------------

def test_detect_header_level():
    tiers = [24.0, 18.0, 15.0]
    assert detect_header_level(24.0, 12.0, tiers) == 1
    assert detect_header_level(18.0, 12.0, tiers) == 2
    assert detect_header_level(15.0, 12.0, tiers) == 3
    assert detect_header_level(12.0, 12.0, tiers) is None
    tiers = [15.0]
    assert detect_header_level(15.0, 12.0, tiers) == 1
    assert detect_header_level(14.0, 12.0, tiers) is None
    assert detect_header_level(12.0, 12.0, tiers) is None
    tiers = []
    assert detect_header_level(24.0, 12.0, tiers) == 1
    assert detect_header_level(18.0, 12.0, tiers) == 2
    assert detect_header_level(15.0, 12.0, tiers) == 3
    assert detect_header_level(14.5, 12.0, tiers) == 4
    assert detect_header_level(14.0, 12.0, tiers) is None
    assert detect_header_level(12.0, 12.0, tiers) is None
    tiers = [20.0]
    assert detect_header_level(13.0, 12.0, tiers) is None


# ---------------------------------------------------------------------------
# src/markdown.rs:1682 test_to_markdown
# ---------------------------------------------------------------------------

def test_to_markdown_plain():
    md = to_markdown("• First item\n• Second item\n\nRegular paragraph.")
    assert "- First item" in md
    assert "- Second item" in md


# ---------------------------------------------------------------------------
# src/tables.rs:1173 test_table_detection
# ---------------------------------------------------------------------------

def test_table_detection():
    items = []
    for (row_y, cells) in [
        (500.0, ["Subject", "Q1", "Q2", "Q3"]),
        (480.0, ["Math", "9.0", "8.5", "9.5"]),
        (460.0, ["Science", "8.0", "9.0", "8.5"]),
        (440.0, ["English", "9.5", "9.0", "9.5"]),
    ]:
        for x, t in zip((100.0, 200.0, 280.0, 360.0), cells):
            items.append(_item(t, x, row_y, 8.0))
    tables = detect_tables(items, 10.0)
    assert len(tables) == 1
    assert len(tables[0].columns) == 4
    assert len(tables[0].rows) == 4


# ---------------------------------------------------------------------------
# src/tables.rs:1205 test_table_to_markdown
# ---------------------------------------------------------------------------

def test_table_to_markdown():
    table = Table([100.0, 200.0], [500.0, 480.0],
                  [["Header 1", "Header 2"], ["Cell 1", "Cell 2"]], [])
    md = table_to_markdown(table)
    assert "| Header 1" in md
    assert "| ---" in md
    assert "| Cell 1" in md


# ---------------------------------------------------------------------------
# src/tables.rs:1223 test_body_font_table_detected
# ---------------------------------------------------------------------------

def test_body_font_table_detected():
    items = []
    for (row_y, cells) in [
        (500.0, ["Name", "Price", "Qty", "Total"]),
        (480.0, ["Widget", "5.00", "10", "50.00"]),
        (460.0, ["Gadget", "12.50", "4", "50.00"]),
        (440.0, ["Gizmo", "3.25", "20", "65.00"]),
    ]:
        for x, t in zip((100.0, 200.0, 300.0, 400.0), cells):
            items.append(_item(t, x, row_y, 10.0))
    tables = detect_tables(items, 10.0)
    assert len(tables) == 1, "Body-font table should be detected by Pass 2"
    assert len(tables[0].columns) == 4
    assert len(tables[0].rows) >= 3


# ---------------------------------------------------------------------------
# src/tables.rs:1260 test_paragraph_not_falsely_detected
# ---------------------------------------------------------------------------

def test_paragraph_not_falsely_detected():
    texts = [
        "This is a paragraph of text that spans the full width",
        "of the page and should not be detected as a table.",
        "It continues for several lines with normal body text",
        "that is left-aligned and has no columnar structure.",
        "The paragraph keeps going with more content here.",
        "And it has even more text on this line as well.",
        "Finally the paragraph concludes with this last line.",
        "One more line to have enough items for detection.",
        "And another line of plain paragraph text content.",
        "Last line of the paragraph ends here for the test.",
    ]
    items = [_item(t, 72.0, 500.0 - 15.0 * i, 10.0)
             for i, t in enumerate(texts)]
    assert detect_tables(items, 10.0) == []


# ---------------------------------------------------------------------------
# src/tables.rs:1334 test_word_level_paragraph_not_detected_as_table
# ---------------------------------------------------------------------------

def test_word_level_paragraph_not_detected_as_table():
    rows = [
        (500.0, [("We", 72.0), ("would", 95.0), ("like", 145.0), ("to", 180.0),
                 ("thank", 200.0), ("all", 250.0), ("the", 278.0),
                 ("practitioners", 305.0)]),
        (485.0, [("and", 72.0), ("researchers", 105.0), ("across", 185.0),
                 ("the", 232.0), ("University", 260.0), ("of", 335.0),
                 ("Leeds", 355.0)]),
        (470.0, [("Libraries", 72.0), ("whose", 142.0), ("contributions", 190.0),
                 ("made", 290.0), ("this", 328.0), ("report", 360.0)]),
        (455.0, [("possible", 72.0), ("Both", 140.0), ("constituent", 178.0),
                 ("studies", 262.0), ("were", 315.0), ("approved", 350.0)]),
    ]
    items = [_item(t, x, y, 10.0) for y, words in rows for t, x in words]
    assert detect_tables(items, 10.0) == []


# ---------------------------------------------------------------------------
# src/tables.rs:1380 test_large_data_table_not_rejected
# ---------------------------------------------------------------------------

def test_large_data_table_not_rejected():
    items = [_item("Temp", 100.0, 800.0, 8.0),
             _item("Pressure", 200.0, 800.0, 8.0),
             _item("Volume", 300.0, 800.0, 8.0),
             _item("Enthalpy", 400.0, 800.0, 8.0)]
    for i in range(1, 50):
        y = 800.0 - i * 12.0
        items.append(_item(f"{-40 + i * 2}", 100.0, y, 8.0))
        items.append(_item(f"{100.0 + i * 5.0:.1f}", 200.0, y, 8.0))
        items.append(_item(f"{0.05 + i * 0.01:.3f}", 300.0, y, 8.0))
        items.append(_item(f"{150.0 + i * 2.5:.1f}", 400.0, y, 8.0))
    tables = detect_tables(items, 10.0)
    assert len(tables) == 1, "Large data table should not be rejected"
    assert len(tables[0].rows) >= 40


# ---------------------------------------------------------------------------
# src/tables.rs:1423 test_uniform_spacing_rows_not_merged
# ---------------------------------------------------------------------------

def test_uniform_spacing_rows_not_merged():
    companies = ["SC Priority LLC", "Craft Roofing Co", "Alpha Roofing Inc",
                 "Beta Construction", "Gamma Builders", "Delta Roofing",
                 "Epsilon Contractors"]
    items = [_item("No.", 50.0, 800.0, 8.0),
             _item("Company", 120.0, 800.0, 8.0),
             _item("Bid Amount", 350.0, 800.0, 8.0)]
    for i, company in enumerate(companies):
        y = 790.0 - i * 10.0
        items.append(_item(f"{i + 1}", 50.0, y, 8.0))
        items.append(_item(company, 120.0, y, 8.0))
        items.append(_item(f"${100 + i * 10},000", 350.0, y, 8.0))
    tables = detect_tables(items, 12.0)
    assert len(tables) == 1
    assert len(tables[0].rows) == 8, "Each company must be on its own row"


# ---------------------------------------------------------------------------
# src/tounicode.rs:690 test_parse_bfchar_2byte
# ---------------------------------------------------------------------------

_BFCHAR_2B = b"""
/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
1 begincodespacerange
<0000><FFFF>
endcodespacerange
3 beginbfchar
<0003> <0020>
<0024> <0041>
<0025> <0042>
endbfchar
endcmap
"""


def test_parse_bfchar_2byte():
    cmap = ToUnicodeCMap.parse(_BFCHAR_2B)
    assert cmap is not None
    assert cmap.code_byte_length == 2
    assert cmap.lookup(0x0003) == " "
    assert cmap.lookup(0x0024) == "A"
    assert cmap.lookup(0x0025) == "B"


# ---------------------------------------------------------------------------
# src/tounicode.rs:714 test_parse_bfchar_1byte
# ---------------------------------------------------------------------------

def test_parse_bfchar_1byte():
    cmap = ToUnicodeCMap.parse(b"""
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
3 beginbfchar
<20> <0020>
<41> <0041>
<42> <0042>
endbfchar
""")
    assert cmap.code_byte_length == 1
    assert cmap.lookup(0x0020) == " "
    assert cmap.lookup(0x0041) == "A"


# ---------------------------------------------------------------------------
# src/tounicode.rs:736 test_decode_cids_2byte
# ---------------------------------------------------------------------------

def test_decode_cids_2byte():
    cmap = ToUnicodeCMap.parse(b"""
1 begincodespacerange
<0000><FFFF>
endcodespacerange
3 beginbfchar
<0003> <0020>
<0024> <0041>
<0025> <0042>
endbfchar
""")
    assert cmap.decode_cids(bytes([0x00, 0x24, 0x00, 0x25, 0x00, 0x03])) == "AB "


# ---------------------------------------------------------------------------
# src/tounicode.rs:755 test_decode_cids_1byte_no_cjk_garbage
# ---------------------------------------------------------------------------

def test_decode_cids_1byte_no_cjk_garbage():
    cmap = ToUnicodeCMap.parse(b"""
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
5 beginbfchar
<20> <0020>
<42> <0042>
<79> <0079>
<50> <0050>
<52> <0052>
endbfchar
""")
    assert cmap.code_byte_length == 1
    result = cmap.decode_cids(bytes([0x42, 0x79]))
    assert result == "By"
    assert "䉹" not in result, "Should not produce CJK garbage"
    assert cmap.decode_cids(bytes([0x50, 0x52])) == "PR"


# ---------------------------------------------------------------------------
# src/tounicode.rs:784 test_bfrange_array_format
# ---------------------------------------------------------------------------

def test_bfrange_array_format():
    cmap = ToUnicodeCMap.parse(b"""
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
1 beginbfrange
<0003> <0005> [<0041> <0042> <0043>]
endbfrange
""")
    assert cmap.lookup(0x0003) == "A"
    assert cmap.lookup(0x0004) == "B"
    assert cmap.lookup(0x0005) == "C"


# ---------------------------------------------------------------------------
# src/tounicode.rs:801 test_unmapped_2byte_cids_skipped
# ---------------------------------------------------------------------------

def test_unmapped_2byte_cids_skipped():
    cmap = ToUnicodeCMap.parse(b"""
1 begincodespacerange
<0000><FFFF>
endcodespacerange
1 beginbfchar
<0041> <0041>
endbfchar
""")
    assert cmap.code_byte_length == 2
    result = cmap.decode_cids(bytes([0x42, 0x79]))
    assert "䉹" not in result, "Unmapped 2-byte CIDs should not produce CJK"


# ---------------------------------------------------------------------------
# f32-boundary probes (ROUND1_NOTES deviation 2: reference computes in f32,
# we compute in f64). These pin behavior at values where an f32 round-trip
# could flip a threshold comparison.
# ---------------------------------------------------------------------------

def test_f32_boundary_y_tolerance_grouping():
    """y_tolerance = 3.0 (src/extractor.rs:2396) with a strict `<`.
    Items whose stored coordinates are exactly f32-representable compare
    identically in f32 and f64 (widening is exact), so the only parity
    requirement is the comparison contract itself: dy just under 3 groups,
    dy == 3.0 exactly SPLITS (strict), dy just over splits."""
    base = 700.0
    for dy, n_lines in ((2.99, 1), (3.0, 2), (3.01, 2)):
        # all three dy values and base are exactly f32-representable-ish
        # inputs after the f32 round-trip the reference would apply
        y2 = float(np.float32(base) - np.float32(dy))
        items = [_item("a", 100.0, base), _item("b", 130.0, y2)]
        got = len(group_into_lines(items))
        expected = 1 if abs(base - y2) < 3.0 else 2
        assert got == expected == n_lines, (dy, y2, got)


def test_f32_boundary_header_ratio():
    """detect_header_level ratio thresholds (1.2 et al): a font pair whose
    f64 ratio is exactly at the boundary must classify identically when the
    inputs take f32-representable values (the reference's storage type)."""
    base = float(np.float32(12.0))
    at_ratio = float(np.float32(14.4))  # 14.4/12 = 1.2 in f64: 1.1999999…
    r = detect_header_level(at_ratio, base, [])
    # 14.4f32/12f32 = 1.2000000476… ≥ 1.2 → level 4 in the reference's
    # fallback ladder; our f64 14.4/12 = 1.1999999999999998 < 1.2 → None.
    # Pin the f64 behavior here and document the deviation: inputs that are
    # EXACTLY at an irrepresentable boundary are the known f32/f64 gap.
    assert r is None
    clearly_over = 14.5
    assert detect_header_level(clearly_over, base, []) == 4


def test_f32_boundary_join_gap_ratios():
    """should_join_items gap thresholds (src/extractor.rs:657-830): the
    comparisons are gap < font_size * RATIO with RATIO ∈ {0.01, 0.15,
    0.25, 0.3}. For f32-representable gaps and sizes, f32 vs f64 evaluate
    identically except when the product lands exactly on an
    irrepresentable boundary; pin the decision at representable values
    straddling each threshold (font_size 12 → thresholds 0.12/1.8/3/3.6)."""
    from pdf_inspector_spark.kernels.extractor import should_join_items

    def pair(prev_text, curr_text, gap, fs=12.0, w=40.0):
        a = TextItem(prev_text, 100.0, 500.0, w, fs, "F1", fs, 1)
        b = TextItem(curr_text, 100.0 + w + gap, 500.0, w, fs, "F1", fs, 1)
        return a, b

    # numeric continuity: ratio 0.3 → threshold 3.6 at fs=12
    assert should_join_items(*pair("34,20", "8", 3.5)) is True
    assert should_join_items(*pair("34,20", "8", 3.7)) is False
    # single-char fragment vs multi-char: ratio 0.25 → 3.0
    assert should_join_items(*pair("N", "AV", 2.9)) is True
    assert should_join_items(*pair("N", "AV", 3.1)) is False
    # touching CID word-level items: gap below 1% of fs (0.12) with long
    # words on both sides → separate words (the "the Prague Rules" rule)
    assert should_join_items(*pair("Prague", "Rules", 0.1)) is False
    # three-word prev context: gap < 0.15*fs joins
    assert should_join_items(*pair("one two three", "four", 0.1)) is True


def test_f32_boundary_detect_columns_gap():
    """detect_columns (src/extractor.rs:2280-2360 constants): a two-column
    layout is recognized from the x-gap histogram; pin the decision for a
    clearly-two-column page and a clearly-one-column page built from
    f32-representable coordinates."""
    from pdf_inspector_spark.kernels.extractor import detect_columns
    two_col = []
    for i in range(12):
        y = 700.0 - 14.0 * i
        two_col.append(TextItem("left column text here", 72.0, y, 180.0,
                                12.0, "F1", 12.0, 1))
        two_col.append(TextItem("right column text too", 320.0, y, 180.0,
                                12.0, "F1", 12.0, 1))
    cols = detect_columns(two_col, 1)
    assert cols is not None and len(cols) == 2
    one_col = [TextItem("full width paragraph line of text", 72.0,
                        700.0 - 14.0 * i, 420.0, 12.0, "F1", 12.0, 1)
               for i in range(12)]
    assert len(detect_columns(one_col, 1)) == 1  # one region = one column


def test_f32_boundary_table_font_bands():
    """detect_tables font bands (src/tables.rs:30-109): pass 1 takes
    6.0 <= fs <= base*0.90, pass 2 takes base*0.85 <= fs <= base*1.05.
    Pin the inclusive boundaries at f32-representable sizes: with
    base=10, a 9.0pt table sits exactly ON the pass-1 edge (10*0.9 = 9.0
    exactly in both f32 and f64 — 0.9 rounds identically relative to the
    product) and must be detected; 10.5pt sits on the pass-2 upper edge."""
    def grid(fs):
        items = []
        for (row_y, cells) in [
            (500.0, ["Name", "Price", "Qty", "Total"]),
            (480.0, ["Widget", "5.00", "10", "50.00"]),
            (460.0, ["Gadget", "12.50", "4", "50.00"]),
            (440.0, ["Gizmo", "3.25", "20", "65.00"]),
        ]:
            for x, t in zip((100.0, 200.0, 300.0, 400.0), cells):
                items.append(_item(t, x, row_y, fs))
        return items

    # exactly on the pass-1 upper edge (<= is inclusive)
    assert len(detect_tables(grid(9.0), 10.0)) == 1
    # just above pass-1 but inside pass-2's [8.5, 10.5] band
    assert len(detect_tables(grid(10.0), 10.0)) == 1
    # exactly on the pass-2 upper edge (inclusive)
    assert len(detect_tables(grid(10.5), 10.0)) == 1
    # above both bands: no detection path accepts 11pt at base 10
    assert detect_tables(grid(11.0), 10.0) == []
    # below the 6.0pt floor of both passes
    assert detect_tables(grid(5.5), 10.0) == []
