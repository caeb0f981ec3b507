"""Kernel unit tests — direct ports of the reference's synthetic-input tests
(FIXTURES.md §4; reference test locations cited per test)."""

import pytest

from pdf_inspector_spark.kernels.detector import (
    sample_page_indices, scan_content_for_text_operators)
from pdf_inspector_spark.kernels.extractor import (
    TextItem, group_into_lines, is_bold_font, is_italic_font)
from pdf_inspector_spark.kernels.markdown import (
    detect_header_level, format_list_item, is_code_like, is_list_item,
    to_markdown)
from pdf_inspector_spark.kernels.tables import (
    Table, detect_tables, table_to_markdown)
from pdf_inspector_spark.kernels.tounicode import ToUnicodeCMap


def make_item(text, x, y, font_size=12.0, width=None, font="F1", page=1,
              bold=False, italic=False):
    if width is None:
        width = 10.0
    return TextItem(text, x, y, width, font_size, font, font_size, page,
                    bold, italic)


# -- detector (src/detector.rs:424-447) ------------------------------------

class TestDetector:
    def test_scan_content_operators(self):
        content = b"BT /F1 12 Tf 100 700 Td (Hello World) Tj ET"
        ops, imgs = scan_content_for_text_operators(content)
        assert ops == 1
        assert not imgs

        content2 = b"BT /F1 12 Tf 100 700 Td [(H) 10 (ello)] TJ ET"
        ops2, _ = scan_content_for_text_operators(content2)
        assert ops2 == 1

        content3 = b"q 100 0 0 100 50 700 cm /Img1 Do Q"
        ops3, imgs3 = scan_content_for_text_operators(content3)
        assert ops3 == 0
        assert imgs3

    def test_sampling_plan(self):
        # src/detector.rs:117-142: first + last + evenly spaced
        assert sample_page_indices(3, 5) == [1, 2, 3]
        assert sample_page_indices(1, 5) == [1]
        idx = sample_page_indices(100, 5)
        assert idx[0] == 1 and idx[-1] == 100 and len(idx) == 5
        assert idx == sorted(set(idx))
        assert sample_page_indices(7, 5) == [1, 2, 3, 4, 7]


# -- tounicode (src/tounicode.rs:685-821) -----------------------------------

class TestToUnicode:
    def test_parse_bfchar_2byte(self):
        cmap = ToUnicodeCMap.parse(b"""
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
""")
        assert cmap.code_byte_length == 2
        assert cmap.lookup(0x0003) == " "
        assert cmap.lookup(0x0024) == "A"
        assert cmap.lookup(0x0025) == "B"

    def test_parse_bfchar_1byte(self):
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
        assert cmap.lookup(0x20) == " "
        assert cmap.lookup(0x41) == "A"

    def test_decode_cids_2byte(self):
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

    def test_decode_cids_1byte_no_cjk_garbage(self):
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
        assert "䉹" not in result
        assert cmap.decode_cids(bytes([0x50, 0x52])) == "PR"

    def test_bfrange_array_format(self):
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

    def test_bfrange_base_form(self):
        cmap = ToUnicodeCMap.parse(b"""
1 beginbfrange
<0041> <005A> <0041>
endbfrange
""")
        assert cmap.lookup(0x41) == "A"
        assert cmap.lookup(0x5A) == "Z"

    def test_unmapped_2byte_cids_skipped(self):
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
        assert "䉹" not in result


# -- extractor line grouping (src/extractor.rs:2443-2674) --------------------

class TestLineGrouping:
    def test_group_into_lines(self):
        items = [
            make_item("Hello", 100.0, 700.0, 12.0, width=50.0),
            make_item("World", 160.0, 700.0, 12.0, width=50.0),
            make_item("Next line", 100.0, 680.0, 12.0, width=80.0),
        ]
        lines = group_into_lines(items)
        assert len(lines) == 2
        assert lines[0].text() == "Hello World"
        assert lines[1].text() == "Next line"

    def test_bold_italic_detection(self):
        assert is_bold_font("Arial-Bold")
        assert is_bold_font("TimesNewRoman-Bold")
        assert is_bold_font("Helvetica-BoldOblique")
        assert is_bold_font("ABCDEF+ArialMT-Bold")
        assert is_bold_font("NotoSans-Black")
        assert is_bold_font("Roboto-SemiBold")
        assert not is_bold_font("Arial")
        assert not is_bold_font("TimesNewRoman-Italic")
        assert is_italic_font("Arial-Italic")
        assert is_italic_font("TimesNewRoman-Italic")
        assert is_italic_font("Helvetica-Oblique")
        assert is_italic_font("ABCDEF+ArialMT-Italic")
        assert is_italic_font("Helvetica-BoldOblique")
        assert not is_italic_font("Arial")
        assert not is_italic_font("TimesNewRoman-Bold")
        assert is_bold_font("Arial-BoldItalic")
        assert is_italic_font("Arial-BoldItalic")

    def test_word_level_items_get_spaces(self):
        # CID per-word items touching at gap 0 → "the Prague Rules"
        items = [
            make_item("the", 100.0, 500.0, 12.0, width=19.5, font="C2_0"),
            make_item("Prague", 119.5, 500.0, 12.0, width=42.0, font="C2_0"),
            make_item("Rules", 161.5, 500.0, 12.0, width=35.0, font="C2_0"),
        ]
        lines = group_into_lines(items)
        assert len(lines) == 1
        assert lines[0].text() == "the Prague Rules"

    def test_single_char_items_still_join(self):
        items = [
            make_item("N", 100.0, 500.0, 12.0, width=8.0),
            make_item("A", 108.0, 500.0, 12.0, width=8.0),
            make_item("V", 116.0, 500.0, 12.0, width=8.0),
        ]
        lines = group_into_lines(items)
        assert len(lines) == 1
        assert lines[0].text() == "NAV"

    def test_cjk_items_join_without_spaces(self):
        items = [
            make_item("である", 100.0, 500.0, 12.0, width=24.0, font="C2_0"),
            make_item("履行義務", 124.0, 500.0, 12.0, width=32.0, font="C2_0"),
            make_item("を識別す", 156.0, 500.0, 12.0, width=32.0, font="C2_0"),
        ]
        lines = group_into_lines(items)
        assert len(lines) == 1
        assert lines[0].text() == "である履行義務を識別す"


# -- tables (src/tables.rs:1152-1463) ---------------------------------------

class TestTables:
    def test_table_detection(self):
        items = [
            make_item("Subject", 100.0, 500.0, 8.0),
            make_item("Q1", 200.0, 500.0, 8.0),
            make_item("Q2", 280.0, 500.0, 8.0),
            make_item("Q3", 360.0, 500.0, 8.0),
            make_item("Math", 100.0, 480.0, 8.0),
            make_item("9.0", 200.0, 480.0, 8.0),
            make_item("8.5", 280.0, 480.0, 8.0),
            make_item("9.5", 360.0, 480.0, 8.0),
            make_item("Science", 100.0, 460.0, 8.0),
            make_item("8.0", 200.0, 460.0, 8.0),
            make_item("9.0", 280.0, 460.0, 8.0),
            make_item("8.5", 360.0, 460.0, 8.0),
            make_item("English", 100.0, 440.0, 8.0),
            make_item("9.5", 200.0, 440.0, 8.0),
            make_item("9.0", 280.0, 440.0, 8.0),
            make_item("9.5", 360.0, 440.0, 8.0),
        ]
        tables = detect_tables(items, 10.0)
        assert len(tables) == 1
        assert len(tables[0].columns) == 4
        assert len(tables[0].rows) == 4

    def test_table_to_markdown(self):
        table = Table([100.0, 200.0], [500.0, 480.0],
                      [["Header 1", "Header 2"], ["Cell 1", "Cell 2"]], [])
        md = table_to_markdown(table)
        assert "| Header 1" in md
        assert "| ---" in md
        assert "| Cell 1" in md

    def test_body_font_table_detected(self):
        items = [
            make_item("Name", 100.0, 500.0, 10.0),
            make_item("Price", 200.0, 500.0, 10.0),
            make_item("Qty", 300.0, 500.0, 10.0),
            make_item("Total", 400.0, 500.0, 10.0),
            make_item("Widget", 100.0, 480.0, 10.0),
            make_item("5.00", 200.0, 480.0, 10.0),
            make_item("10", 300.0, 480.0, 10.0),
            make_item("50.00", 400.0, 480.0, 10.0),
            make_item("Gadget", 100.0, 460.0, 10.0),
            make_item("12.50", 200.0, 460.0, 10.0),
            make_item("4", 300.0, 460.0, 10.0),
            make_item("50.00", 400.0, 460.0, 10.0),
            make_item("Gizmo", 100.0, 440.0, 10.0),
            make_item("3.25", 200.0, 440.0, 10.0),
            make_item("20", 300.0, 440.0, 10.0),
            make_item("65.00", 400.0, 440.0, 10.0),
        ]
        tables = detect_tables(items, 10.0)
        assert len(tables) == 1, "body-font table must be detected by pass 2"
        assert len(tables[0].columns) == 4
        assert len(tables[0].rows) >= 3

    def test_paragraph_not_falsely_detected(self):
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
        items = [make_item(t, 72.0, 500.0 - 15.0 * i, 10.0)
                 for i, t in enumerate(texts)]
        assert detect_tables(items, 10.0) == []

    def test_word_level_paragraph_not_detected_as_table(self):
        rows = [
            [("We", 72.0), ("would", 95.0), ("like", 145.0), ("to", 180.0),
             ("thank", 200.0), ("all", 250.0), ("the", 278.0),
             ("practitioners", 305.0)],
            [("and", 72.0), ("researchers", 105.0), ("across", 185.0),
             ("the", 232.0), ("University", 260.0), ("of", 335.0),
             ("Leeds", 355.0)],
            [("Libraries", 72.0), ("whose", 142.0), ("contributions", 190.0),
             ("made", 290.0), ("this", 328.0), ("report", 360.0)],
            [("possible", 72.0), ("Both", 140.0), ("constituent", 178.0),
             ("studies", 262.0), ("were", 315.0), ("approved", 350.0)],
        ]
        items = []
        for i, row in enumerate(rows):
            y = 500.0 - 15.0 * i
            for text, x in row:
                items.append(make_item(text, x, y, 10.0))
        assert detect_tables(items, 10.0) == []

    def test_large_data_table_not_rejected(self):
        items = [
            make_item("Temp", 100.0, 800.0, 8.0),
            make_item("Pressure", 200.0, 800.0, 8.0),
            make_item("Volume", 300.0, 800.0, 8.0),
            make_item("Enthalpy", 400.0, 800.0, 8.0),
        ]
        for i in range(1, 50):
            y = 800.0 - i * 12.0
            items.append(make_item(f"{-40 + i * 2}", 100.0, y, 8.0))
            items.append(make_item(f"{100.0 + i * 5.0:.1f}", 200.0, y, 8.0))
            items.append(make_item(f"{0.05 + i * 0.01:.3f}", 300.0, y, 8.0))
            items.append(make_item(f"{150.0 + i * 2.5:.1f}", 400.0, y, 8.0))
        tables = detect_tables(items, 10.0)
        assert len(tables) == 1
        assert len(tables[0].rows) >= 40

    def test_uniform_spacing_rows_not_merged(self):
        companies = ["SC Priority LLC", "Craft Roofing Co", "Alpha Roofing Inc",
                     "Beta Construction", "Gamma Builders", "Delta Roofing",
                     "Epsilon Contractors"]
        items = [
            make_item("No.", 50.0, 800.0, 8.0),
            make_item("Company", 120.0, 800.0, 8.0),
            make_item("Bid Amount", 350.0, 800.0, 8.0),
        ]
        for i, company in enumerate(companies):
            y = 790.0 - i * 10.0
            items.append(make_item(f"{i + 1}", 50.0, y, 8.0))
            items.append(make_item(company, 120.0, y, 8.0))
            items.append(make_item(f"${100 + i * 10},000", 350.0, y, 8.0))
        tables = detect_tables(items, 12.0)
        assert len(tables) == 1
        assert len(tables[0].rows) == 8, "companies must not merge into shared rows"


# -- markdown (src/markdown.rs:1622-1688) -----------------------------------

class TestMarkdown:
    def test_is_list_item(self):
        assert is_list_item("• Item one")
        assert is_list_item("- Item two")
        assert is_list_item("* Item three")
        assert is_list_item("1. First")
        assert is_list_item("2) Second")
        assert is_list_item("a. Letter item")
        assert not is_list_item("Regular text")

    def test_format_list_item(self):
        assert format_list_item("• Item") == "- Item"
        assert format_list_item("- Item") == "- Item"
        assert format_list_item("1. First") == "1. First"

    def test_is_code_like(self):
        assert is_code_like("const x = 5;")
        assert is_code_like("function foo() {")
        assert is_code_like("import React from 'react'")
        assert not is_code_like("This is regular text.")

    def test_detect_header_level(self):
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

    def test_to_markdown(self):
        md = to_markdown("• First item\n• Second item\n\nRegular paragraph.")
        assert "- First item" in md
        assert "- Second item" in md


class TestTableCellCleanup:
    """Footnote extraction + continuation-row merge (src/tables.rs:946-1150)."""

    def test_footnote_rows_extracted(self):
        from pdf_inspector_spark.kernels.tables import clean_table_cells
        cells = [
            ["Name", "Value", "Unit"],
            ["Temp", "25", "C"],
            ["(1)", "measured at sea level", ""],
            ["Note:", "all values nominal", ""],
        ]
        cleaned, footnotes = clean_table_cells(cells)
        assert cleaned == [["Name", "Value", "Unit"], ["Temp", "25", "C"]]
        assert footnotes == ["(1) measured at sea level",
                             "Note: all values nominal"]

    def test_continuation_rows_merged(self):
        from pdf_inspector_spark.kernels.tables import clean_table_cells
        cells = [
            ["Part", "Description"],
            ["X1", "first half of a long"],
            ["", "description continued"],
            ["", ""],  # fully empty row dropped
            ["X2", "short"],
        ]
        cleaned, footnotes = clean_table_cells(cells)
        assert cleaned == [
            ["Part", "Description"],
            ["X1", "first half of a long description continued"],
            ["X2", "short"],
        ]
        assert footnotes == []

    def test_is_footnote_row_variants(self):
        from pdf_inspector_spark.kernels.tables import is_footnote_row
        assert is_footnote_row("(1)")
        assert is_footnote_row("2) see above")
        assert is_footnote_row("Note: caveat")
        assert is_footnote_row("Notes: several")
        assert not is_footnote_row("Normal cell")
        assert not is_footnote_row("(a) letter")

    def test_markdown_includes_footnotes(self):
        from pdf_inspector_spark.kernels.tables import Table, table_to_markdown
        table = Table([0.0, 100.0], [500.0, 480.0, 460.0],
                      [["H1", "H2"], ["a", "1"], ["(1)", "a footnote"]], [])
        md = table_to_markdown(table)
        assert "| a " in md
        assert "(1) a footnote" in md
        assert "| (1)" not in md  # footnote is below the table, not a row


def test_count_near_equivalent_to_quadratic_scan():
    """_count_near (two-pointer) must equal the original any()-scan
    count for ascending float lists — including exact-tolerance
    boundaries and duplicates."""
    import random

    from pdf_inspector_spark.kernels.tables import _count_near

    def quad(a, b, tol):
        return sum(1 for x in a if any(abs(x - y) < tol for y in b))

    rng = random.Random(7)
    cases = [([], [], 10.0), ([1.0], [], 10.0), ([], [1.0], 10.0),
             ([0.0, 10.0], [10.0], 10.0),          # exact-tolerance edge
             ([5.0, 5.0, 5.0], [5.0, 14.9, 15.0], 10.0)]
    for _ in range(500):
        a = sorted(round(rng.uniform(0, 200), 1) for _ in range(rng.randrange(0, 12)))
        b = sorted(round(rng.uniform(0, 200), 1) for _ in range(rng.randrange(0, 12)))
        cases.append((a, b, rng.choice([10.0, 0.5, 25.0])))
    for a, b, tol in cases:
        assert _count_near(a, b, tol) == quad(a, b, tol), (a, b, tol)
