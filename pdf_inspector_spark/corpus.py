"""Deterministic synthetic PDF corpus.

One minimal PDF per reference code path (FIXTURES.md §2). Every entry is
byte-deterministic (no timestamps, no randomness) so fixtures derived from
them are stable across runs. The kernels are the oracle: golden outputs are
whatever the kernels produce, pinned by tests/test_corpus.py so regressions
in either the builder or the kernels surface as diffs.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass, field


# --------------------------------------------------------------------------
# PDF assembly helpers
# --------------------------------------------------------------------------

def _stream_obj(d: bytes, data: bytes, compress: bool = False) -> bytes:
    if compress:
        data = zlib.compress(data)
        d = d[:-2].rstrip() + b" /Filter /FlateDecode >>"
    head = d[:-2].rstrip() + b" /Length " + str(len(data)).encode() + b" >>"
    return head + b"\nstream\n" + data + b"\nendstream"


def build_pdf(objects: dict[int, bytes], root: int = 1,
              info: int | None = None) -> bytes:
    """Assemble a classic-xref PDF from {obj_num: body bytes}."""
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objects[num] + b"\nendobj\n"
    xref_pos = len(out)
    maxn = max(objects) + 1
    out += f"xref\n0 {maxn}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, maxn):
        out += f"{offsets.get(num, 0):010d} 00000 n \n".encode()
    trailer = b"trailer\n<< /Size " + str(maxn).encode() + f" /Root {root} 0 R".encode()
    if info is not None:
        trailer += f" /Info {info} 0 R".encode()
    trailer += b" >>\n"
    out += trailer + f"startxref\n{xref_pos}\n".encode() + b"%%EOF\n"
    return bytes(out)


def _catalog_and_pages(page_nums: list[int]) -> dict[int, bytes]:
    kids = " ".join(f"{n} 0 R" for n in page_nums)
    return {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: (f"<< /Type /Pages /Kids [{kids}] /Count {len(page_nums)} >>").encode(),
    }


_HELV = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding /FirstChar 32 /LastChar 126 /Widths ["
# A simple fixed-width table: space 250, everything else 500 (deterministic
# and wide enough that join heuristics behave like real metrics).
_HELV_WIDTHS = b" ".join(b"250" if c == 32 else b"500" for c in range(32, 127))
_HELV_FONT = _HELV + _HELV_WIDTHS + b"] >>"


def _page(num: int, contents_num: int, resources: bytes,
          extra: bytes = b"") -> bytes:
    return (f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Contents {contents_num} 0 R /Resources ".encode()
            + resources + b" " + extra + b">>")


def _esc_literal(text: bytes) -> bytes:
    return (text.replace(b"\\", rb"\\").replace(b"(", rb"\(")
            .replace(b")", rb"\)"))


def _text_ops(lines: list[tuple[float, float, float, bytes]],
              font: bytes = b"/F1") -> bytes:
    """Each line: (x, y, size, text) as a separate BT…ET block."""
    parts = []
    for x, y, size, text in lines:
        parts.append(b"BT " + font + f" {size:g} Tf {x:g} {y:g} Td (".encode()
                     + _esc_literal(text) + b") Tj ET")
    return b"\n".join(parts)


# --------------------------------------------------------------------------
# Corpus entries
# --------------------------------------------------------------------------

@dataclass
class CorpusEntry:
    doc_id: str
    pdf_bytes: bytes
    expected_type: str  # expected classification (sanity anchor for tests)
    notes: str = ""
    tags: list[str] = field(default_factory=list)


def _tj_basic() -> bytes:
    body = [(72.0, 700.0, 12.0, b"Hello World"),
            (72.0, 684.0, 12.0, b"This is a simple text based PDF."),
            (72.0, 668.0, 12.0, b"It exercises the plain Tj path.")]
    objs = _catalog_and_pages([3])
    objs[3] = _page(3, 4, b"<< /Font << /F1 5 0 R >> >>")
    objs[4] = _stream_obj(b"<< >>", _text_ops(body))
    objs[5] = _HELV_FONT
    return build_pdf(objs)


def _tj_multiline() -> bytes:
    content = (b"BT /F1 12 Tf 72 700 Td (First line via Td) Tj "
               b"0 -16 TD (Second line via TD) Tj "
               b"T* (Third line via T-star) Tj "
               b"(Fourth line via quote) ' "
               b"(Fifth line via quote again) ' ET")
    objs = _catalog_and_pages([3])
    objs[3] = _page(3, 4, b"<< /Font << /F1 5 0 R >> >>")
    objs[4] = _stream_obj(b"<< >>", content)
    objs[5] = _HELV_FONT
    return build_pdf(objs)


def _tm_positioned() -> bytes:
    content = (b"BT /F1 12 Tf 2 0 0 2 72 700 Tm (Scaled Heading) Tj ET\n"
               b"BT /F1 12 Tf 1 0 0 1 72 650 Tm (Body text at normal scale.) Tj ET\n"
               b"BT /F1 12 Tf 1 0 0 1 72 634 Tm (Another body line follows here.) Tj ET\n"
               b"BT /F1 12 Tf 1 0 0 1 72 618 Tm (And one more to set the base size.) Tj ET")
    objs = _catalog_and_pages([3])
    objs[3] = _page(3, 4, b"<< /Font << /F1 5 0 R >> >>")
    objs[4] = _stream_obj(b"<< >>", content)
    objs[5] = _HELV_FONT
    return build_pdf(objs)


def _tj_kerning() -> bytes:
    # [(Hel) -50 (lo) -300 (World)] TJ : -50 is kerning (no space),
    # -300 crosses the threshold → space.
    # space threshold for these metrics = clamp(250*0.4, 80, 200) = 100:
    # -50/-80 stay joined, -300/-250 become spaces.
    content = (b"BT /F1 12 Tf 72 700 Td [(Hel) -50 (lo) -300 (World)] TJ ET\n"
               b"BT /F1 12 Tf 72 684 Td [(kern) -80 (ing) -250 (test)] TJ ET\n"
               b"BT /F1 12 Tf 72 668 Td (plain third line) Tj ET")
    objs = _catalog_and_pages([3])
    objs[3] = _page(3, 4, b"<< /Font << /F1 5 0 R >> >>")
    objs[4] = _stream_obj(b"<< >>", content)
    objs[5] = _HELV_FONT
    return build_pdf(objs)


_CID_CMAP = b"""/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
/CMapName /Adobe-Identity-UCS def
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
8 beginbfchar
<0001> <0074>
<0002> <0068>
<0003> <0065>
<0004> <0050>
<0005> <0072>
<0006> <0061>
<0007> <0067>
<0008> <0075>
endbfchar
2 beginbfrange
<0010> <0014> <0041>
<0020> <0022> [<0052> <0075> <006C>]
endbfrange
endcmap
CMapName currentdict /CMap defineresource pop
end end"""


def _cid_tounicode() -> bytes:
    # "the" = 010203, "Pragu" = 0405060708, then bfrange: ABCDE, Rul
    content = (b"BT /F1 12 Tf 72 700 Td [<000100020003> -400 <00040005000600070008> ] TJ ET\n"
               b"BT /F1 12 Tf 72 684 Td <00100011001200130014> Tj ET\n"
               b"BT /F1 12 Tf 72 668 Td <002000210022> Tj ET")
    objs = _catalog_and_pages([3])
    objs[3] = _page(3, 4, b"<< /Font << /F1 5 0 R >> >>")
    objs[4] = _stream_obj(b"<< >>", content)
    objs[5] = (b"<< /Type /Font /Subtype /Type0 /BaseFont /SynthCID "
               b"/Encoding /Identity-H /DescendantFonts [7 0 R] /ToUnicode 6 0 R >>")
    objs[6] = _stream_obj(b"<< >>", _CID_CMAP, compress=True)
    objs[7] = (b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /SynthCID "
               b"/DW 1000 /W [1 8 520 16 20 600 32 34 550] >>")
    return build_pdf(objs)


_CID_1BYTE_CMAP = b"""1 begincodespacerange
<0000> <FFFF>
endcodespacerange
6 beginbfchar
<42> <0042>
<79> <0079>
<50> <0050>
<52> <0052>
<20> <0020>
<41> <0041>
endbfchar"""


def _cid_1byte() -> bytes:
    # codespace says 2-byte but entries are 1-byte → 1-byte decode ("By PR")
    content = (b"BT /F1 12 Tf 72 700 Td (By PR) Tj ET\n"
               b"BT /F1 12 Tf 72 684 Td (ABBA) Tj ET\n"
               b"BT /F1 12 Tf 72 668 Td (By By By) Tj ET")
    objs = _catalog_and_pages([3])
    objs[3] = _page(3, 4, b"<< /Font << /F1 5 0 R >> >>")
    objs[4] = _stream_obj(b"<< >>", content)
    objs[5] = (b"<< /Type /Font /Subtype /Type0 /BaseFont /OneByteCID "
               b"/Encoding /Identity-H /DescendantFonts [7 0 R] /ToUnicode 6 0 R >>")
    objs[6] = _stream_obj(b"<< >>", _CID_1BYTE_CMAP)
    objs[7] = (b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /OneByteCID "
               b"/DW 500 >>")
    return build_pdf(objs)


def _differences_enc() -> bytes:
    # Differences array remaps 0x80→eacute, 0x81→bullet, 0x82→uni2013
    content = (b"BT /F1 12 Tf 72 700 Td (caf\x80 latte) Tj ET\n"
               b"BT /F1 12 Tf 72 684 Td (\x81 item one \x82 range) Tj ET\n"
               b"BT /F1 12 Tf 72 668 Td (plain ascii line) Tj ET")
    objs = _catalog_and_pages([3])
    objs[3] = _page(3, 4, b"<< /Font << /F1 5 0 R >> >>")
    objs[4] = _stream_obj(b"<< >>", content)
    objs[5] = (b"<< /Type /Font /Subtype /Type1 /BaseFont /Special "
               b"/Encoding 6 0 R >>")
    objs[6] = (b"<< /Type /Encoding /BaseEncoding /WinAnsiEncoding "
               b"/Differences [128 /eacute /bullet /uni2013] >>")
    return build_pdf(objs)


def _ligatures() -> bytes:
    # CMap maps codes to ligature codepoints FB00-FB04 → expanded by kernel
    cmap = b"""1 begincodespacerange
<00> <FF>
endcodespacerange
7 beginbfchar
<01> <FB00>
<02> <FB01>
<03> <FB02>
<04> <FB03>
<05> <FB04>
<61> <0061>
<20> <0020>
endbfchar"""
    content = (b"BT /F1 12 Tf 72 700 Td (a\x01a \x02a \x03a) Tj ET\n"
               b"BT /F1 12 Tf 72 684 Td (a\x04a a\x05a) Tj ET\n"
               b"BT /F1 12 Tf 72 668 Td (aaa aaa aaa) Tj ET")
    objs = _catalog_and_pages([3])
    objs[3] = _page(3, 4, b"<< /Font << /F1 5 0 R >> >>")
    objs[4] = _stream_obj(b"<< >>", content)
    objs[5] = (b"<< /Type /Font /Subtype /TrueType /BaseFont /LigFont "
               b"/ToUnicode 6 0 R >>")
    objs[6] = _stream_obj(b"<< >>", cmap)
    return build_pdf(objs)


def _utf16_fallback() -> bytes:
    # String operand with FE FF BOM, no CMap → UTF-16BE fallback.
    utf16_payload = "Unicode Tëxt".encode("utf-16-be")
    def esc(b: bytes) -> bytes:
        return b.replace(b"\\", rb"\\").replace(b"(", rb"\(").replace(b")", rb"\)")
    content = (b"BT /F1 12 Tf 72 700 Td (\xfe\xff" + esc(utf16_payload) + b") Tj ET\n"
               b"BT /F1 12 Tf 72 684 Td (ascii fallback line) Tj ET\n"
               b"BT /F1 12 Tf 72 668 Td (third line of text) Tj ET")
    objs = _catalog_and_pages([3])
    objs[3] = _page(3, 4, b"<< /Font << /F1 5 0 R >> >>")
    objs[4] = _stream_obj(b"<< >>", content)
    objs[5] = b"<< /Type /Font /Subtype /Type1 /BaseFont /NoCMapFont >>"
    # Info dict with UTF-16BE title exercises get_document_title
    objs[6] = b"<< /Title (\xfe\xff" + esc("Tïtle".encode("utf-16-be")) + b") >>"
    return build_pdf(objs, info=6)


def _form_xobject() -> bytes:
    form_content = b"BT /F1 10 Tf 10 10 Td (Inside the form) Tj ET"
    form = _stream_obj(
        b"<< /Type /XObject /Subtype /Form /BBox [0 0 200 50] "
        b"/Resources << /Font << /F1 5 0 R >> >> >>", form_content)
    content = (b"BT /F1 12 Tf 72 700 Td (Before the form) Tj ET\n"
               b"q 1 0 0 1 100 600 cm /Fm1 Do Q\n"
               b"BT /F1 12 Tf 72 500 Td (After the form) Tj ET\n"
               b"BT /F1 12 Tf 72 484 Td (Final body line) Tj ET")
    objs = _catalog_and_pages([3])
    objs[3] = _page(3, 4, b"<< /Font << /F1 5 0 R >> /XObject << /Fm1 6 0 R >> >>")
    objs[4] = _stream_obj(b"<< >>", content)
    objs[5] = _HELV_FONT
    objs[6] = form
    return build_pdf(objs)


def _image_page_objs(page_num: int, contents_num: int, img_num: int,
                     w: int, h: int) -> dict[int, bytes]:
    content = f"q {w} 0 0 {h} 0 0 cm /Im0 Do Q".encode()
    return {
        page_num: _page(page_num, contents_num,
                        f"<< /XObject << /Im0 {img_num} 0 R >> >>".encode()),
        contents_num: _stream_obj(b"<< >>", content),
        img_num: _stream_obj(
            f"<< /Type /XObject /Subtype /Image /Width {w} /Height {h} "
            f"/ColorSpace /DeviceGray /BitsPerComponent 8 >>".encode(),
            b"\x80" * 64),
    }


def _scanned_only() -> bytes:
    objs = _catalog_and_pages([3, 6])
    objs.update(_image_page_objs(3, 4, 5, 800, 900))
    objs.update(_image_page_objs(6, 7, 8, 800, 900))
    return build_pdf(objs)


def _template_mixed() -> bytes:
    content = (b"q 612 0 0 792 0 0 cm /Im0 Do Q\n"
               b"BT /F1 12 Tf 72 700 Td (Form field label) Tj ET\n"
               b"BT /F1 12 Tf 72 684 Td (Another field value) Tj ET\n"
               b"BT /F1 12 Tf 72 668 Td (Third entry line) Tj ET")
    objs = _catalog_and_pages([3])
    objs[3] = _page(3, 4, b"<< /Font << /F1 6 0 R >> /XObject << /Im0 5 0 R >> >>")
    objs[4] = _stream_obj(b"<< >>", content)
    objs[5] = _stream_obj(
        b"<< /Type /XObject /Subtype /Image /Width 1000 /Height 800 "
        b"/ColorSpace /DeviceGray /BitsPerComponent 8 >>", b"\x80" * 64)
    objs[6] = _HELV_FONT
    return build_pdf(objs)


def _mixed_pages() -> bytes:
    """3 text pages + 2 image-only pages → text ratio 0.6 boundary."""
    objs = _catalog_and_pages([3, 5, 7, 9, 12])
    font_num = 15
    for i, page_num in enumerate([3, 5, 7]):
        body = [(72.0, 700.0, 12.0, f"Text page {i + 1} line one".encode()),
                (72.0, 684.0, 12.0, b"line two of the page"),
                (72.0, 668.0, 12.0, b"line three of the page"),
                (72.0, 652.0, 12.0, b"line four wraps it up")]
        objs[page_num] = _page(page_num, page_num + 1,
                               f"<< /Font << /F1 {font_num} 0 R >> >>".encode())
        objs[page_num + 1] = _stream_obj(b"<< >>", _text_ops(body))
    objs.update(_image_page_objs(9, 10, 11, 600, 700))
    objs.update(_image_page_objs(12, 13, 14, 600, 700))
    objs[font_num] = _HELV_FONT
    return build_pdf(objs)


def _multipage_7() -> bytes:
    """7 text pages (> max_pages_to_sample=5) → sampling plan exercised."""
    page_nums = [3 + 2 * i for i in range(7)]
    objs = _catalog_and_pages(page_nums)
    font_num = 17
    for i, page_num in enumerate(page_nums):
        body = [(72.0, 700.0, 12.0, f"Page {i + 1} headline text".encode()),
                (72.0, 684.0, 12.0, f"Body line A on page {i + 1}".encode()),
                (72.0, 668.0, 12.0, f"Body line B on page {i + 1}".encode()),
                (72.0, 652.0, 12.0, f"Body line C on page {i + 1}".encode())]
        objs[page_num] = _page(page_num, page_num + 1,
                               f"<< /Font << /F1 {font_num} 0 R >> >>".encode())
        objs[page_num + 1] = _stream_obj(b"<< >>", _text_ops(body))
    objs[font_num] = _HELV_FONT
    return build_pdf(objs)


def _two_column() -> bytes:
    """Two text columns (gutter ~20pt) + a full-width title."""
    lines: list[tuple[float, float, float, bytes]] = []
    lines.append((72.0, 730.0, 18.0, b"Full Width Title Spanning Columns Here Now"))
    left_words = [b"left column line %d text" % i for i in range(1, 16)]
    right_words = [b"right column line %d body" % i for i in range(1, 16)]
    for i, t in enumerate(left_words):
        lines.append((72.0, 700.0 - 16.0 * i, 10.0, t))
    for i, t in enumerate(right_words):
        lines.append((330.0, 700.0 - 16.0 * i, 10.0, t))
    objs = _catalog_and_pages([3])
    objs[3] = _page(3, 4, b"<< /Font << /F1 5 0 R >> >>")
    objs[4] = _stream_obj(b"<< >>", _text_ops(lines))
    objs[5] = _HELV_FONT
    return build_pdf(objs)


def _table_small_font() -> bytes:
    """Grades-style table at 8pt beneath 12pt body (src/tables.rs:1172-1202)."""
    body = [(72.0, 740.0, 12.0, b"Report card for the spring semester."),
            (72.0, 724.0, 12.0, b"Grades are tabulated below by quarter."),
            (72.0, 708.0, 12.0, b"Additional commentary follows the table."),
            (72.0, 692.0, 12.0, b"All scores are on a ten point scale.")]
    table = []
    header = [b"Subject", b"Q1", b"Q2", b"Q3"]
    rows = [[b"Math", b"9.0", b"8.5", b"9.5"],
            [b"Science", b"8.0", b"9.0", b"8.5"],
            [b"English", b"9.5", b"9.0", b"9.5"]]
    xs = [100.0, 200.0, 280.0, 360.0]
    for x, t in zip(xs, header):
        table.append((x, 500.0, 8.0, t))
    for r, row in enumerate(rows):
        for x, t in zip(xs, row):
            table.append((x, 480.0 - 20.0 * r, 8.0, t))
    objs = _catalog_and_pages([3])
    objs[3] = _page(3, 4, b"<< /Font << /F1 5 0 R >> >>")
    objs[4] = _stream_obj(b"<< >>", _text_ops(body + table))
    objs[5] = _HELV_FONT
    return build_pdf(objs)


def _table_body_font() -> bytes:
    """Widget/Gadget body-font table (src/tables.rs:1223-1257)."""
    table = []
    header = [b"Name", b"Price", b"Qty", b"Total"]
    rows = [[b"Widget", b"5.00", b"10", b"50.00"],
            [b"Gadget", b"12.50", b"4", b"50.00"],
            [b"Gizmo", b"3.25", b"20", b"65.00"]]
    xs = [100.0, 200.0, 300.0, 400.0]
    for x, t in zip(xs, header):
        table.append((x, 500.0, 10.0, t))
    for r, row in enumerate(rows):
        for x, t in zip(xs, row):
            table.append((x, 480.0 - 20.0 * r, 10.0, t))
    objs = _catalog_and_pages([3])
    objs[3] = _page(3, 4, b"<< /Font << /F1 5 0 R >> >>")
    objs[4] = _stream_obj(b"<< >>", _text_ops(table))
    objs[5] = _HELV_FONT
    return build_pdf(objs)


def _para_not_table() -> bytes:
    """Left-aligned paragraph emitted as per-word items — must NOT be a table."""
    rows = [
        [(b"We", 72.0), (b"would", 95.0), (b"like", 145.0), (b"to", 180.0),
         (b"thank", 200.0), (b"all", 250.0), (b"the", 278.0), (b"people", 305.0)],
        [(b"and", 72.0), (b"researchers", 105.0), (b"across", 185.0),
         (b"the", 232.0), (b"University", 260.0), (b"of", 335.0), (b"Leeds", 355.0)],
        [(b"Libraries", 72.0), (b"whose", 142.0), (b"contributions", 190.0),
         (b"made", 290.0), (b"this", 328.0), (b"report", 360.0)],
        [(b"possible", 72.0), (b"Both", 140.0), (b"constituent", 178.0),
         (b"studies", 262.0), (b"were", 315.0), (b"approved", 350.0)],
    ]
    lines = []
    for i, row in enumerate(rows):
        y = 500.0 - 15.0 * i
        for t, x in row:
            lines.append((x, y, 10.0, t))
    objs = _catalog_and_pages([3])
    objs[3] = _page(3, 4, b"<< /Font << /F1 5 0 R >> >>")
    objs[4] = _stream_obj(b"<< >>", _text_ops(lines))
    objs[5] = _HELV_FONT
    return build_pdf(objs)


def _lists_code() -> bytes:
    lines = [
        (72.0, 700.0, 12.0, b"Shopping List Overview Today"),
        (80.0, 680.0, 12.0, b"\x95 first bullet item"),     # 0x95 = • in WinAnsi
        (80.0, 664.0, 12.0, b"\x95 second bullet item"),
        (80.0, 648.0, 12.0, b"1. numbered entry one"),
        (80.0, 632.0, 12.0, b"2) numbered entry two"),
        (80.0, 616.0, 12.0, b"a. letter entry alpha"),
        (72.0, 584.0, 12.0, b"const x = compute(a, b);"),
        (72.0, 568.0, 12.0, b"regular closing prose line"),
    ]
    objs = _catalog_and_pages([3])
    objs[3] = _page(3, 4, b"<< /Font << /F1 5 0 R >> >>")
    objs[4] = _stream_obj(b"<< >>", _text_ops(lines))
    objs[5] = _HELV_FONT
    return build_pdf(objs)


def _links_annots() -> bytes:
    content = _text_ops([
        (72.0, 700.0, 12.0, b"Visit the project site below."),
        (72.0, 684.0, 12.0, b"The link is an annotation."),
        (72.0, 668.0, 12.0, b"Trailing body line of text."),
    ])
    objs = _catalog_and_pages([3])
    objs[3] = _page(3, 4, b"<< /Font << /F1 5 0 R >> >>",
                    b"/Annots [6 0 R] ")
    objs[4] = _stream_obj(b"<< >>", content)
    objs[5] = _HELV_FONT
    objs[6] = (b"<< /Type /Annot /Subtype /Link /Rect [72 696 200 712] "
               b"/A << /Type /Action /S /URI /URI (https://example.com/docs) >> >>")
    return build_pdf(objs)


def _page_numbers() -> bytes:
    lines = [
        (300.0, 750.0, 10.0, b"7"),          # top page number → filtered
        (72.0, 700.0, 12.0, b"Chapter content starts here."),
        (72.0, 684.0, 12.0, b"More prose continues on this line."),
        (72.0, 668.0, 12.0, b"And a final body line too."),
        (300.0, 40.0, 10.0, b"7"),           # bottom page number → filtered
    ]
    objs = _catalog_and_pages([3])
    objs[3] = _page(3, 4, b"<< /Font << /F1 5 0 R >> >>")
    objs[4] = _stream_obj(b"<< >>", _text_ops(lines))
    objs[5] = _HELV_FONT
    return build_pdf(objs)


def _cjk_text() -> bytes:
    cmap = b"""1 begincodespacerange
<0000> <FFFF>
endcodespacerange
9 beginbfchar
<0001> <3067>
<0002> <3042>
<0003> <308B>
<0004> <5C65>
<0005> <884C>
<0006> <7FA9>
<0007> <52D9>
<0008> <3092>
<0009> <8B58>
endbfchar"""
    content = (b"BT /F1 12 Tf 72 700 Td [<000100020003> 0 <00040005> 0 <00060007>] TJ ET\n"
               b"BT /F1 12 Tf 72 684 Td <00080009> Tj ET\n"
               b"BT /F1 12 Tf 72 668 Td <000100020003> Tj ET")
    objs = _catalog_and_pages([3])
    objs[3] = _page(3, 4, b"<< /Font << /F1 5 0 R >> >>")
    objs[4] = _stream_obj(b"<< >>", content)
    objs[5] = (b"<< /Type /Font /Subtype /Type0 /BaseFont /CJKFont "
               b"/Encoding /Identity-H /DescendantFonts [7 0 R] /ToUnicode 6 0 R >>")
    objs[6] = _stream_obj(b"<< >>", cmap)
    objs[7] = (b"<< /Type /Font /Subtype /CIDFontType0 /BaseFont /CJKFont "
               b"/DW 1000 >>")
    return build_pdf(objs)


def _malformed() -> bytes:
    # No %PDF header, no parseable objects → load raises → quarantine row.
    return b"\x00\xff\xfe garbage bytes not pdf structure \x01\x02" * 16


def _rotated_text() -> bytes:
    """90°-rotated Tm (b=1, c=-1): effective size from row norms
    (src/extractor.rs:1791-1800); interpreter must stay numerically sane."""
    content = (b"BT /F1 12 Tf 0 1 -1 0 300 100 Tm (Rotated sideways text) Tj ET\n"
               b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (Normal line one here) Tj ET\n"
               b"BT /F1 12 Tf 1 0 0 1 72 684 Tm (Normal line two here) Tj ET\n"
               b"BT /F1 12 Tf 1 0 0 1 72 668 Tm (Normal line three here) Tj ET")
    objs = _catalog_and_pages([3])
    objs[3] = _page(3, 4, b"<< /Font << /F1 5 0 R >> >>")
    objs[4] = _stream_obj(b"<< >>", content)
    objs[5] = _HELV_FONT
    return build_pdf(objs)


def _diagonal_text() -> bytes:
    """30°-rotated Tm (cos=0.866, sin=0.5) — a non-axis-aligned matrix,
    unlike the 90° case in _rotated_text: effective size comes from the
    row norms (src/extractor.rs:1791-1800) and the width advance runs
    along the rotated baseline through TM×CTM. Pathological-layout
    fixture (VERDICT r2 item 9)."""
    content = (b"BT /F1 12 Tf 0.866 0.5 -0.5 0.866 150 300 Tm "
               b"(Diagonal banner text) Tj ET\n"
               b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (Upright line one) Tj ET\n"
               b"BT /F1 12 Tf 1 0 0 1 72 684 Tm (Upright line two) Tj ET\n"
               b"BT /F1 12 Tf 1 0 0 1 72 668 Tm (Upright line three) Tj ET")
    objs = _catalog_and_pages([3])
    objs[3] = _page(3, 4, b"<< /Font << /F1 5 0 R >> >>")
    objs[4] = _stream_obj(b"<< >>", content)
    objs[5] = _HELV_FONT
    return build_pdf(objs)


def _continuation_table() -> bytes:
    """A table that CONTINUES across a page break: two consecutive
    table-only pages, one table each, equal column counts — the
    continuation pages' header+separator rows must be stripped and their
    data rows appended to the first page's table
    (src/markdown.rs:261-381, src/tables.rs:946-995)."""
    header = [b"Region", b"Sales", b"Cost", b"Net"]
    xs = [100.0, 200.0, 300.0, 400.0]

    def table_page(rows: list[list[bytes]]) -> bytes:
        items = []
        for x, t in zip(xs, header):
            items.append((x, 500.0, 10.0, t))
        for r, row in enumerate(rows):
            for x, t in zip(xs, row):
                items.append((x, 480.0 - 20.0 * r, 10.0, t))
        return _text_ops(items)

    page1 = table_page([[b"North", b"90.00", b"40.00", b"50.00"],
                        [b"South", b"80.00", b"35.00", b"45.00"],
                        [b"East", b"70.00", b"30.00", b"40.00"]])
    page2 = table_page([[b"West", b"60.00", b"25.00", b"35.00"],
                        [b"Central", b"50.00", b"20.00", b"30.00"],
                        [b"Islands", b"40.00", b"15.00", b"25.00"]])
    objs = _catalog_and_pages([3, 5])
    objs[3] = _page(3, 4, b"<< /Font << /F1 7 0 R >> >>")
    objs[4] = _stream_obj(b"<< >>", page1)
    objs[5] = _page(5, 6, b"<< /Font << /F1 7 0 R >> >>")
    objs[6] = _stream_obj(b"<< >>", page2)
    objs[7] = _HELV_FONT
    return build_pdf(objs)


_RTL_CMAP = b"""1 begincodespacerange
<0000> <FFFF>
endcodespacerange
5 beginbfchar
<0001> <05E9>
<0002> <05DC>
<0003> <05D5>
<0004> <05DD>
<0005> <0020>
endbfchar"""


def _footnote_table() -> bytes:
    """Table with an in-table CONTINUATION row (empty first column — its
    cells merge into the previous row, src/tables.rs:946-995) and a
    numbered FOOTNOTE row ("(1) ..." — extracted out of the grid,
    src/tables.rs:1118-1150). Complements continuation_table, which
    covers the cross-PAGE merge."""
    header = [b"Item", b"Price", b"Qty", b"Notes"]
    xs = [100.0, 200.0, 300.0, 400.0]
    items = []
    for x, t in zip(xs, header):
        items.append((x, 500.0, 10.0, t))
    rows = [[b"Widget", b"5.00", b"10", b"bulk (1)"],
            [b"Gadget", b"12.50", b"4", b"fragile"]]
    for r, row in enumerate(rows):
        for x, t in zip(xs, row):
            items.append((x, 480.0 - 20.0 * r, 10.0, t))
    # continuation row: first column EMPTY, later columns continue the
    # Gadget row's cells (≥3 X-clusters so the strict region scan keeps
    # the row inside the table region)
    items.append((200.0, 440.0, 10.0, b"0.50"))
    items.append((300.0, 440.0, 10.0, b"2"))
    items.append((400.0, 440.0, 10.0, b"keep dry"))
    # final data row, then the footnote row (spread over 3 columns so it
    # stays in-region; first cell "(1)" triggers footnote extraction)
    for x, t in zip(xs, [b"Gizmo", b"3.25", b"20", b"std"]):
        items.append((x, 420.0, 10.0, t))
    items.append((100.0, 400.0, 10.0, b"(1)"))
    items.append((200.0, 400.0, 10.0, b"net of"))
    items.append((300.0, 400.0, 10.0, b"discounts"))
    objs = _catalog_and_pages([3])
    objs[3] = _page(3, 4, b"<< /Font << /F1 5 0 R >> >>")
    objs[4] = _stream_obj(b"<< >>", _text_ops(items))
    objs[5] = _HELV_FONT
    return build_pdf(objs)


def _rtl_text() -> bytes:
    """RTL (Hebrew) run via Type0+ToUnicode: the reference performs NO
    bidi reordering — CIDs decode in STREAM (logical) order and the
    output string carries the RTL codepoints as-is
    (decode cascade src/extractor.rs:1854-1957). Pins that parity plus
    RTL↔Latin line coexistence."""
    # codes 0001..0004 = shin lamed vav final-mem ("shalom"), 0005 = space
    content = (b"BT /F1 12 Tf 72 700 Td <00010002000300050004> Tj ET\n"
               b"BT /F2 12 Tf 72 684 Td (Latin line follows here) Tj ET\n"
               b"BT /F2 12 Tf 72 668 Td (Another latin line last) Tj ET")
    objs = _catalog_and_pages([3])
    objs[3] = _page(3, 4, b"<< /Font << /F1 5 0 R /F2 8 0 R >> >>")
    objs[4] = _stream_obj(b"<< >>", content)
    objs[5] = (b"<< /Type /Font /Subtype /Type0 /BaseFont /SynthRTL "
               b"/Encoding /Identity-H /DescendantFonts [7 0 R] /ToUnicode 6 0 R >>")
    objs[6] = _stream_obj(b"<< >>", _RTL_CMAP, compress=True)
    objs[7] = (b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /SynthRTL "
               b"/DW 600 >>")
    objs[8] = _HELV_FONT
    return build_pdf(objs)


def _contents_array() -> bytes:
    """Page /Contents as an ARRAY of two streams — concatenated before
    interpretation (reference: lopdf get_page_content merges)."""
    c1 = b"BT /F1 12 Tf 72 700 Td (First stream text) Tj ET"
    c2 = (b"BT /F1 12 Tf 72 684 Td (Second stream text) Tj ET\n"
          b"BT /F1 12 Tf 72 668 Td (Also second stream) Tj ET")
    objs = _catalog_and_pages([3])
    objs[3] = (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
               b"/Contents [4 0 R 6 0 R] /Resources << /Font << /F1 5 0 R >> >> >>")
    objs[4] = _stream_obj(b"<< >>", c1)
    objs[5] = _HELV_FONT
    objs[6] = _stream_obj(b"<< >>", c2, compress=True)
    return build_pdf(objs)


def _type3_font() -> bytes:
    """Type3 font with FontMatrix [0.01 …] → units_scale 0.01 (glyph
    widths in a 100-unit grid; src/extractor.rs:162-179)."""
    widths = b" ".join(b"25" if c == 32 else b"50" for c in range(32, 127))
    content = (b"BT /F1 12 Tf 72 700 Td (Type three glyphs) Tj ET\n"
               b"BT /F1 12 Tf 72 684 Td (second line of text) Tj ET\n"
               b"BT /F1 12 Tf 72 668 Td (third line follows) Tj ET")
    objs = _catalog_and_pages([3])
    objs[3] = _page(3, 4, b"<< /Font << /F1 5 0 R >> >>")
    objs[4] = _stream_obj(b"<< >>", content)
    objs[5] = (b"<< /Type /Font /Subtype /Type3 /FontMatrix [0.01 0 0 0.01 0 0] "
               b"/FirstChar 32 /LastChar 126 /Widths [" + widths + b"] "
               b"/CharProcs << >> /Encoding /WinAnsiEncoding >>")
    return build_pdf(objs)


def _nested_form() -> bytes:
    """Form XObject whose content invokes ANOTHER form via Do: the
    reference's form mini-interpreter does not recurse (no Do handling,
    src/extractor.rs:1435-1626) — inner text must NOT appear. Pins the
    one-level-nesting parity."""
    inner = _stream_obj(
        b"<< /Type /XObject /Subtype /Form /BBox [0 0 100 20] "
        b"/Resources << /Font << /F1 5 0 R >> >> >>",
        b"BT /F1 10 Tf 0 0 Td (INNER SHOULD NOT APPEAR) Tj ET")
    outer = _stream_obj(
        b"<< /Type /XObject /Subtype /Form /BBox [0 0 200 50] "
        b"/Resources << /Font << /F1 5 0 R >> /XObject << /In1 7 0 R >> >> >>",
        b"BT /F1 10 Tf 10 10 Td (Outer form text) Tj ET /In1 Do")
    # ≥3 page-level Tj ops so the detector's page-stream scan (which,
    # like the reference, does not look inside XObjects) stays TextBased.
    content = (b"BT /F1 12 Tf 72 700 Td (Page level text) Tj ET\n"
               b"BT /F1 12 Tf 72 684 Td (More page level text) Tj ET\n"
               b"q 1 0 0 1 100 600 cm /Fm1 Do Q\n"
               b"BT /F1 12 Tf 72 500 Td (After the forms) Tj ET")
    objs = _catalog_and_pages([3])
    objs[3] = _page(3, 4, b"<< /Font << /F1 5 0 R >> /XObject << /Fm1 6 0 R >> >>")
    objs[4] = _stream_obj(b"<< >>", content)
    objs[5] = _HELV_FONT
    objs[6] = outer
    objs[7] = inner
    return build_pdf(objs)


def _toc_page() -> bytes:
    """Dot-leader TOC lines: table rejection (src/tables.rs:618-664) +
    collapse_dot_leaders in cleanup (src/markdown.rs:1386-1391)."""
    lines = [
        (72.0, 720.0, 16.0, b"Table of Contents"),
        (72.0, 690.0, 12.0, b"Introduction ................................ 1"),
        (72.0, 674.0, 12.0, b"Methods ..................................... 5"),
        (72.0, 658.0, 12.0, b"Results ..................................... 12"),
        (72.0, 642.0, 12.0, b"Discussion .................................. 20"),
        (72.0, 626.0, 12.0, b"References .................................. 31"),
    ]
    objs = _catalog_and_pages([3])
    objs[3] = _page(3, 4, b"<< /Font << /F1 5 0 R >> >>")
    objs[4] = _stream_obj(b"<< >>", _text_ops(lines))
    objs[5] = _HELV_FONT
    return build_pdf(objs)


def _drop_cap() -> bytes:
    """Single 36pt uppercase letter + lowercase paragraph → merged
    (src/markdown.rs:950-1027)."""
    # The lowercase continuation line comes FIRST in stream order and the
    # oversized cap is a separate line at its own y (the reference notes
    # the drop cap may appear after its line, src/markdown.rs:894-896).
    lines = [
        (100.0, 700.0, 12.0, b"nce upon a time the body text began"),
        (72.0, 692.0, 36.0, b"O"),
        (72.0, 684.0, 12.0, b"and continued on the following line"),
        (72.0, 668.0, 12.0, b"with a third line to set the base size"),
        (72.0, 652.0, 12.0, b"and one final line of the paragraph"),
    ]
    objs = _catalog_and_pages([3])
    objs[3] = _page(3, 4, b"<< /Font << /F1 5 0 R >> >>")
    objs[4] = _stream_obj(b"<< >>", _text_ops(lines))
    objs[5] = _HELV_FONT
    return build_pdf(objs)


def _objstm() -> bytes:
    """Catalog/pages/page/font packed in a compressed object stream
    (PDF 1.5 ObjStm) — the modern layout both real-world toolchains in
    tests/test_real_pdfs.py produce."""
    inner_objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>"),
        (5, _HELV_FONT),
    ]
    bodies = []
    header = []
    off = 0
    for num, body in inner_objs:
        header.append(f"{num} {off}".encode())
        bodies.append(body)
        off += len(body) + 1
    header_bytes = b" ".join(header) + b"\n"
    payload = header_bytes + b" ".join(bodies) + b" "
    first = len(header_bytes)
    content = _text_ops([
        (72.0, 700.0, 12.0, b"Object stream layout works"),
        (72.0, 684.0, 12.0, b"objects live inside ObjStm"),
        (72.0, 668.0, 12.0, b"classic and modern coexist"),
    ])
    objs = {
        4: _stream_obj(b"<< >>", content),
        10: _stream_obj(
            f"<< /Type /ObjStm /N {len(inner_objs)} /First {first} >>".encode(),
            payload, compress=True),
    }
    return build_pdf(objs)


def _hyphen_caption() -> bytes:
    """Spaced-hyphen fix (src/markdown.rs:1395-1411) + caption lines
    (src/markdown.rs:1173-1214) + URL auto-linking (:1515-1620)."""
    lines = [
        (72.0, 700.0, 12.0, b"The state - of - the art approach works"),
        (72.0, 684.0, 12.0, b"Figure 3: throughput by executor count"),
        (72.0, 668.0, 12.0, b"See https://example.org/bench for data"),
        (72.0, 652.0, 12.0, b"Source: internal measurements 2024"),
    ]
    objs = _catalog_and_pages([3])
    objs[3] = _page(3, 4, b"<< /Font << /F1 5 0 R >> >>")
    objs[4] = _stream_obj(b"<< >>", _text_ops(lines))
    objs[5] = _HELV_FONT
    return build_pdf(objs)


def _inline_image() -> bytes:
    """Inline image (BI … ID <binary> EI) between text operators: the
    interpreter skips it (like the reference, whose operator match has
    no BI case) without corrupting surrounding text."""
    content = (b"BT /F1 12 Tf 72 700 Td (Before inline image) Tj ET\n"
               b"BI /W 4 /H 4 /CS /G /BPC 8 ID "
               b"\x00\x11\x22\x33\x44\x55\x66\x77\x88\x99\xaa\xbb\xcc\xdd\xee\xff"
               b" EI\n"
               b"BT /F1 12 Tf 72 684 Td (After inline image) Tj ET\n"
               b"BT /F1 12 Tf 72 668 Td (Third line of text) Tj ET")
    objs = _catalog_and_pages([3])
    objs[3] = _page(3, 4, b"<< /Font << /F1 5 0 R >> >>")
    objs[4] = _stream_obj(b"<< >>", content)
    objs[5] = _HELV_FONT
    return build_pdf(objs)


def _inline_image_binary_ei() -> bytes:
    """Inline image whose UNENCODED binary contains the raw bytes 'EI'
    with non-whitespace neighbors: the tokenizer must only terminate at a
    whitespace-delimited EI, or every operator after the image corrupts
    (ADVICE r1; real-world scanner output trips this)."""
    content = (b"BT /F1 12 Tf 72 700 Td (Before binary EI) Tj ET\n"
               b"BI /W 4 /H 2 /CS /G /BPC 8 ID "
               b"\x10xEIx\xfeEI9\x00 EI\n"
               b"BT /F1 12 Tf 72 684 Td (After binary EI) Tj ET")
    objs = _catalog_and_pages([3])
    objs[3] = _page(3, 4, b"<< /Font << /F1 5 0 R >> >>")
    objs[4] = _stream_obj(b"<< >>", content)
    objs[5] = _HELV_FONT
    return build_pdf(objs)


def _dest_link() -> bytes:
    """Link annotation with a /Dest array and NO /A action: the reference
    deliberately skips Dest-only links (src/extractor.rs:1783-1785
    'We'll skip this for now') — must be ignored without error, and the
    URI link on the same page still extracted."""
    objs = _catalog_and_pages([3])
    objs[3] = (b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
               b"/MediaBox [0 0 612 792] "
               b"/Resources << /Font << /F1 5 0 R >> >> "
               b"/Annots [6 0 R 7 0 R] >>")
    objs[4] = _stream_obj(b"<< >>",
                          b"BT /F1 12 Tf 72 700 Td (Dest and URI links) Tj ET")
    objs[5] = _HELV_FONT
    objs[6] = (b"<< /Type /Annot /Subtype /Link "
               b"/Rect [72 690 150 705] /Dest [3 0 R /XYZ 0 792 0] >>")
    objs[7] = (b"<< /Type /Annot /Subtype /Link /Rect [160 690 280 705] "
               b"/A << /Type /Action /S /URI /URI (https://example.com/x) >> >>")
    return build_pdf(objs)


def _encrypted_doc() -> bytes:
    """Trailer carries /Encrypt: must become an error row (the reference's
    PdfError::Encrypted, src/lib.rs:141), never garbage extraction."""
    objs = _catalog_and_pages([3])
    objs[3] = _page(3, 4, b"<< /Font << /F1 5 0 R >> >>")
    objs[4] = _stream_obj(b"<< >>",
                          b"BT /F1 12 Tf 72 700 Td (secret text) Tj ET")
    objs[5] = _HELV_FONT
    objs[6] = b"<< /Filter /Standard /V 2 /R 3 /O (o) /U (u) /P -44 >>"
    return build_pdf(objs).replace(b"/Root 1 0 R",
                                   b"/Root 1 0 R /Encrypt 6 0 R")


def _kitchen_sink() -> bytes:
    """Feature-interaction stressor: one document combining a heading,
    a two-column body, a small-font data table, a page number, and a
    URI link annotation — every §2.5/§2.6/§2.7 stage active on the SAME
    page, pinning their interactions (column cursors around a claimed
    table region, page-number stripping, link item placement)."""
    lines: list[tuple[float, float, float, bytes]] = []
    lines.append((72.0, 750.0, 18.0, b"Quarterly Operations Review"))
    # two-column body
    for i in range(1, 9):
        lines.append((72.0, 710.0 - 15.0 * i, 10.0,
                      b"left column narrative row %d here" % i))
        lines.append((330.0, 710.0 - 15.0 * i, 10.0,
                      b"right column commentary row %d too" % i))
    # small-font table beneath the columns
    xs = [100.0, 200.0, 280.0, 360.0]
    header = [b"Region", b"Q1", b"Q2", b"Q3"]
    rows = [[b"North", b"1.0", b"2.5", b"3.5"],
            [b"South", b"4.0", b"5.0", b"6.5"],
            [b"West", b"7.5", b"8.0", b"9.5"]]
    for x, t in zip(xs, header):
        lines.append((x, 440.0, 8.0, t))
    for r, row in enumerate(rows):
        for x, t in zip(xs, row):
            lines.append((x, 425.0 - 15.0 * r, 8.0, t))
    lines.append((300.0, 40.0, 9.0, b"7"))  # bare page number
    objs = _catalog_and_pages([3])
    objs[3] = (b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
               b"/MediaBox [0 0 612 792] "
               b"/Resources << /Font << /F1 5 0 R >> >> "
               b"/Annots [6 0 R] >>")
    objs[4] = _stream_obj(b"<< >>", _text_ops(lines))
    objs[5] = _HELV_FONT
    objs[6] = (b"<< /Type /Annot /Subtype /Link /Rect [72 60 200 75] "
               b"/A << /Type /Action /S /URI /URI (https://example.org/q) >> >>")
    return build_pdf(objs)


def _xref_stream_pdf() -> bytes:
    """PDF 1.5 layout with a cross-reference STREAM and NO classic
    xref/trailer keyword: /Root lives in the XRef stream's dict. The
    loader must pick the trailer keys out of the /Type /XRef object
    (validated on real system PDFs; this entry pins it hermetically)."""
    import struct

    objects = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 5 0 R >> >> >>"),
        4: _stream_obj(b"<< >>",
                       b"BT /F1 12 Tf 72 700 Td (XRef stream layout) Tj ET"),
        5: _HELV_FONT,
    }
    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objects[num] + b"\nendobj\n"
    xref_pos = len(out)
    # entries 0..6: free, five type-1 objects, the XRef stream itself
    rows = [(0, 0, 255)]
    rows += [(1, offsets[n], 0) for n in sorted(objects)]
    rows.append((1, xref_pos, 0))
    data = b"".join(struct.pack(">BHB", t, o & 0xFFFF, g) for t, o, g in rows)
    comp = zlib.compress(data)
    out += (f"6 0 obj\n<< /Type /XRef /Size 7 /Root 1 0 R /W [1 2 1] "
            f"/Filter /FlateDecode /Length {len(comp)} >>\nstream\n").encode()
    out += comp + b"\nendstream\nendobj\n"
    out += f"startxref\n{xref_pos}\n%%EOF\n".encode()
    return bytes(out)


def build_corpus() -> list[CorpusEntry]:
    """The full deterministic corpus, in a stable order."""
    return [
        CorpusEntry("tj_basic", _tj_basic(), "text_based",
                    "Tj path (src/extractor.rs:1044-1104)"),
        CorpusEntry("tj_multiline", _tj_multiline(), "text_based",
                    "Td/TD/T*/' line advance (src/extractor.rs:1019-1043,1209-1251)"),
        CorpusEntry("tm_positioned", _tm_positioned(), "text_based",
                    "Tm scale → heading tiers (src/extractor.rs:1791-1800)"),
        CorpusEntry("tj_kerning", _tj_kerning(), "text_based",
                    "TJ kerning→space threshold (src/extractor.rs:1112-1148)"),
        CorpusEntry("cid_tounicode", _cid_tounicode(), "text_based",
                    "Type0 + ToUnicode bfchar/bfrange (src/tounicode.rs:27-302)"),
        CorpusEntry("cid_1byte_cmap", _cid_1byte(), "text_based",
                    "1-byte-entries codespace override (src/tounicode.rs:89-109)"),
        CorpusEntry("differences_enc", _differences_enc(), "text_based",
                    "Differences decode (src/extractor.rs:425-469,1911-1932)"),
        CorpusEntry("ligatures", _ligatures(), "text_based",
                    "ligature expansion (src/extractor.rs:1961-1987)"),
        CorpusEntry("utf16_fallback", _utf16_fallback(), "text_based",
                    "UTF-16BE fallback + title (src/extractor.rs:1944-1950)"),
        CorpusEntry("form_xobject", _form_xobject(), "text_based",
                    "Form XObject recursion (src/extractor.rs:1375-1629)"),
        CorpusEntry("scanned_only", _scanned_only(), "scanned",
                    "Scanned(0.95) early exit (src/detector.rs:195-199)"),
        CorpusEntry("template_mixed", _template_mixed(), "mixed",
                    "template image ≥500k px (src/detector.rs:328-399)"),
        CorpusEntry("mixed_pages", _mixed_pages(), "text_based",
                    "text ratio 0.6 boundary (src/detector.rs:192)"),
        CorpusEntry("multipage_7", _multipage_7(), "text_based",
                    "sampling plan first/last/evenly (src/detector.rs:117-142)"),
        CorpusEntry("two_column", _two_column(), "text_based",
                    "column detection + spanning merge (src/extractor.rs:2010-2315)"),
        CorpusEntry("table_small_font", _table_small_font(), "text_based",
                    "small-font table pass (src/tables.rs:38-70)"),
        CorpusEntry("table_body_font", _table_body_font(), "text_based",
                    "body-font strict pass (src/tables.rs:72-106)"),
        CorpusEntry("para_not_table", _para_not_table(), "text_based",
                    "paragraph false-positive rejection (src/tables.rs:1260-1377)"),
        CorpusEntry("lists_code", _lists_code(), "text_based",
                    "list/code detection (src/markdown.rs:1217-1350)"),
        CorpusEntry("links_annots", _links_annots(), "text_based",
                    "link annotations (src/extractor.rs:1681-1787)"),
        CorpusEntry("page_numbers", _page_numbers(), "text_based",
                    "page-number filtering (src/extractor.rs:2205-2220)"),
        CorpusEntry("cjk_text", _cjk_text(), "text_based",
                    "CJK no-space join (src/extractor.rs:704-707,795-800)"),
        CorpusEntry("malformed", _malformed(), None,
                    "error/quarantine channel (src/lib.rs:135-145)"),
        CorpusEntry("rotated_text", _rotated_text(), "text_based",
                    "rotated Tm / effective size norms (src/extractor.rs:1791-1800)"),
        CorpusEntry("diagonal_text", _diagonal_text(), "text_based",
                    "30° Tm rotation — non-axis-aligned row norms + "
                    "rotated-baseline advance (src/extractor.rs:1791-1800)"),
        CorpusEntry("continuation_table", _continuation_table(), "text_based",
                    "table continuing across a page break — header strip + "
                    "row append (src/markdown.rs:261-381)"),
        CorpusEntry("rtl_text", _rtl_text(), "text_based",
                    "RTL (Hebrew) CID run — logical-order decode, no bidi "
                    "(src/extractor.rs:1854-1957)"),
        CorpusEntry("footnote_table", _footnote_table(), "text_based",
                    "in-table continuation row merge + numbered footnote "
                    "extraction (src/tables.rs:946-995, :1118-1150)"),
        CorpusEntry("contents_array", _contents_array(), "text_based",
                    "/Contents array of streams (incl. Flate second stream)"),
        CorpusEntry("type3_font", _type3_font(), "text_based",
                    "Type3 FontMatrix units_scale (src/extractor.rs:162-179)"),
        CorpusEntry("nested_form", _nested_form(), "text_based",
                    "one-level form nesting parity (src/extractor.rs:1435-1626)"),
        CorpusEntry("toc_page", _toc_page(), "text_based",
                    "TOC rejection + dot-leader collapse (src/tables.rs:618, src/markdown.rs:1386)"),
        CorpusEntry("drop_cap", _drop_cap(), "text_based",
                    "drop-cap merge (src/markdown.rs:950-1027)"),
        CorpusEntry("hyphen_caption", _hyphen_caption(), "text_based",
                    "hyphenation fix + captions + URL links (src/markdown.rs:1173-1620)"),
        CorpusEntry("objstm", _objstm(), "text_based",
                    "PDF 1.5 object-stream layout (ObjStm expansion)"),
        CorpusEntry("inline_image", _inline_image(), "text_based",
                    "BI/ID/EI inline image skipped, text around it kept"),
        CorpusEntry("inline_image_binary_ei", _inline_image_binary_ei(),
                    "text_based",
                    "raw 'EI' bytes inside inline-image data do not desync "
                    "the tokenizer (whitespace-delimited EI only)"),
        CorpusEntry("dest_link", _dest_link(), "text_based",
                    "/Dest-array link ignored (src/extractor.rs:1783-1785), "
                    "URI link on same page still extracted"),
        CorpusEntry("encrypted", _encrypted_doc(), None,
                    "/Encrypt trailer → error row "
                    "(PdfError::Encrypted, src/lib.rs:141)"),
        CorpusEntry("xref_stream", _xref_stream_pdf(), "text_based",
                    "PDF 1.5 cross-reference stream, no classic trailer "
                    "(Root from the /Type /XRef dict)"),
        CorpusEntry("kitchen_sink", _kitchen_sink(), "text_based",
                    "heading + two columns + small-font table + page "
                    "number + URI link on ONE page (stage interactions)"),
    ]


def corpus_payloads() -> dict[str, bytes]:
    return {e.doc_id: e.pdf_bytes for e in build_corpus()}


if __name__ == "__main__":
    from .kernels.pipeline import process_pdf_mem
    for e in build_corpus():
        r = process_pdf_mem(e.pdf_bytes)
        print(f"{e.doc_id:18s} {str(r['pdf_type']):12s} err={r['error_kind']} "
              f"text={(r['text'] or '')[:48]!r}")
