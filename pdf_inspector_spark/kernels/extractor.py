"""Positioned text extraction: content-stream interpreter, font decoding,
word-join heuristics and reading-order reconstruction.

Behavioral parity with the reference extractor (reference: src/extractor.rs).
The graphics-state machine is inherently sequential per page; batch-level
parallelism across documents is provided by the Spark stage that calls
``extract_text_with_positions_mem`` once per payload in an Arrow batch.
All heuristic constants are ported verbatim (citations inline).
"""

from __future__ import annotations

from .glyph_names import glyph_to_char
from .pdfobj import Document, Name, Ref, Stream, decode_content
from .tounicode import FontCMaps

# --------------------------------------------------------------------------
# Font widths (src/extractor.rs:19-370)
# --------------------------------------------------------------------------


class FontWidthInfo:
    __slots__ = ("widths", "default_width", "space_width", "is_cid", "units_scale")

    def __init__(self, widths: dict[int, int], default_width: int,
                 space_width: int, is_cid: bool, units_scale: float) -> None:
        self.widths = widths
        self.default_width = default_width
        self.space_width = space_width
        self.is_cid = is_cid
        self.units_scale = units_scale


def _as_int(doc: Document, obj) -> int | None:
    v = doc.resolve(obj)
    if isinstance(v, bool):
        return None
    if isinstance(v, int):
        return v
    if isinstance(v, float):
        return int(v)
    return None


def parse_simple_font_widths(doc: Document, font_dict: dict) -> FontWidthInfo | None:
    """FirstChar/LastChar/Widths; space default 250; Type3 units from
    FontMatrix[0] else 0.001 (src/extractor.rs:96-188)."""
    first_char = _as_int(doc, font_dict.get("FirstChar"))
    last_char = _as_int(doc, font_dict.get("LastChar"))
    if first_char is None or last_char is None:
        return None
    widths_array = doc.get_array(font_dict.get("Widths"))
    if widths_array is None:
        return None
    # Measured and rejected (r6): a dict(zip(range, widths)) fast path
    # gated on an all-ints check — the all() generator pass over the
    # array costs more than the zip saves at real 95-entry Widths
    # (10.9 vs 10.1 µs/call symmetric microbench). The loop stays.
    widths: dict[int, int] = {}
    space_width = 0
    for i, w_obj in enumerate(widths_array):
        code = first_char + i
        if code > last_char:
            break
        if type(w_obj) is int:  # fast path: plain integer width
            w = w_obj
        else:
            w = _as_int(doc, w_obj)
            if w is None:
                continue
        if code == 32:
            space_width = w
        widths[code] = w
    if space_width == 0:
        space_width = 250
    units_scale = 0.001
    fm = doc.get_array(font_dict.get("FontMatrix"))
    if fm:
        v = fm[0]
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            units_scale = abs(float(v))
        else:
            units_scale = 0.001
    return FontWidthInfo(widths, 0, space_width, False, units_scale)


def parse_cid_w_array(doc: Document, w_array: list, widths: dict[int, int]) -> None:
    """W formats ``[c [w…]]`` and ``[c_first c_last w]``
    (src/extractor.rs:245-336)."""
    i = 0
    n = len(w_array)
    while i < n:
        start_cid = _as_int(doc, w_array[i]) if not isinstance(w_array[i], (list, Ref)) else None
        if isinstance(w_array[i], (int, float)) and not isinstance(w_array[i], bool):
            start_cid = int(w_array[i])
        else:
            i += 1
            continue
        i += 1
        if i >= n:
            break
        nxt = w_array[i]
        resolved = doc.resolve(nxt) if isinstance(nxt, Ref) else nxt
        if isinstance(resolved, list):
            for j, w_obj in enumerate(resolved):
                if isinstance(w_obj, (int, float)) and not isinstance(w_obj, bool):
                    widths[start_cid + j] = int(w_obj)
            i += 1
        elif isinstance(nxt, (int, float)) and not isinstance(nxt, bool):
            end = int(nxt)
            i += 1
            if i >= n:
                break
            w_obj = w_array[i]
            if isinstance(w_obj, (int, float)) and not isinstance(w_obj, bool):
                w = int(w_obj)
                for cid in range(start_cid, end + 1):
                    widths[cid] = w
                i += 1
            else:
                i += 1
        else:
            i += 1


def parse_type0_widths(doc: Document, font_dict: dict) -> FontWidthInfo | None:
    """DescendantFonts → CIDFont → DW (default 1000) + W array; CID space =
    widths[32] | widths[3] | DW/4 (src/extractor.rs:192-241)."""
    desc = doc.get_array(font_dict.get("DescendantFonts"))
    if not desc:
        return None
    cid_font = doc.get_dict(desc[0])
    if not cid_font:
        return None
    default_width = _as_int(doc, cid_font.get("DW"))
    if default_width is None:
        default_width = 1000
    widths: dict[int, int] = {}
    w_array = doc.get_array(cid_font.get("W"))
    if w_array:
        parse_cid_w_array(doc, w_array, widths)
    space_width = widths.get(32, widths.get(3))
    if space_width is None:
        space_width = default_width // 4 if default_width > 0 else 250
    return FontWidthInfo(widths, default_width, space_width, True, 0.001)


def parse_font_widths(doc: Document, font_dict: dict) -> FontWidthInfo | None:
    """Dispatch by Subtype (src/extractor.rs:81-91)."""
    subtype = font_dict.get("Subtype")
    if subtype == "Type0":
        return parse_type0_widths(doc, font_dict)
    if subtype in ("Type1", "TrueType", "MMType1", "Type3"):
        return parse_simple_font_widths(doc, font_dict)
    return None


def build_font_widths(doc: Document, fonts: dict[str, dict]) -> dict[str, FontWidthInfo]:
    """Per-document memoized: the same font dictionaries recur on every
    page, so parse each once per document (cache keyed by dict identity,
    stored on the Document — never leaves the executor)."""
    cache = getattr(doc, "_width_cache", None)
    if cache is None:
        cache = doc._width_cache = {}
    out: dict[str, FontWidthInfo] = {}
    for name, fdict in fonts.items():
        key = id(fdict)
        if key in cache:
            info = cache[key]
        else:
            info = cache[key] = parse_font_widths(doc, fdict)
        if info is not None:
            out[name] = info
    return out


def compute_string_width_ts(data: bytes, fi: FontWidthInfo, font_size: float) -> float:
    """Σ glyph widths × units_scale × font_size (src/extractor.rs:341-370).

    Measured and rejected (r5): a flat 256-entry byte→width table built
    per FontWidthInfo — the corpus averages ~7 width calls per doc, so
    the per-doc table build never amortizes (interleaved A/B: 2–12%
    slower end-to-end). The dict walk stays."""
    total = 0.0
    widths = fi.widths
    dw = fi.default_width
    if fi.is_cid:
        for j in range(0, len(data) - 1, 2):
            cid = (data[j] << 8) | data[j + 1]
            total += widths.get(cid, dw)
    else:
        for b in data:
            total += widths.get(b, dw)
    return total * fi.units_scale * font_size


# --------------------------------------------------------------------------
# Font encodings from Differences arrays (src/extractor.rs:381-469)
# --------------------------------------------------------------------------

def parse_encoding_dictionary(doc: Document, enc_dict: dict) -> dict[int, str] | None:
    diff = doc.resolve(enc_dict.get("Differences"))
    if not isinstance(diff, list):
        return None
    enc_map: dict[int, str] = {}
    current_code = 0
    for item in diff:
        if isinstance(item, bool):
            continue
        if isinstance(item, (int, float)):
            current_code = int(item) & 0xFF
        elif isinstance(item, Name):
            ch = glyph_to_char(str(item))
            if ch is not None:
                enc_map[current_code] = ch
            current_code = (current_code + 1) & 0xFF
    return enc_map or None


def parse_font_encoding(doc: Document, font_dict: dict) -> dict[int, str] | None:
    enc = font_dict.get("Encoding")
    if isinstance(enc, Name):
        return None  # standard encodings handled by the base-encoding fallback
    enc_dict = doc.get_dict(enc)
    if enc_dict is not None:
        return parse_encoding_dictionary(doc, enc_dict)
    return None


def build_font_encodings(doc: Document, fonts: dict[str, dict]) -> dict[str, dict[int, str]]:
    """Per-document memoized (see build_font_widths)."""
    cache = getattr(doc, "_enc_cache", None)
    if cache is None:
        cache = doc._enc_cache = {}
    out: dict[str, dict[int, str]] = {}
    for name, fdict in fonts.items():
        key = id(fdict)
        if key in cache:
            m = cache[key]
        else:
            m = cache[key] = parse_font_encoding(doc, fdict)
        if m is not None:
            out[name] = m
    return out


# --------------------------------------------------------------------------
# TextItem / TextLine (src/extractor.rs:472-516)
# --------------------------------------------------------------------------

ITEM_TEXT = "text"
ITEM_IMAGE = "image"
ITEM_LINK = "link"


class TextItem:
    __slots__ = ("text", "x", "y", "width", "height", "font", "font_size",
                 "page", "is_bold", "is_italic", "item_type", "link")

    def __init__(self, text: str, x: float, y: float, width: float, height: float,
                 font: str, font_size: float, page: int, is_bold: bool = False,
                 is_italic: bool = False, item_type: str = ITEM_TEXT,
                 link: str | None = None) -> None:
        self.text = text
        self.x = x
        self.y = y
        self.width = width
        self.height = height
        self.font = font
        self.font_size = font_size
        self.page = page
        self.is_bold = is_bold
        self.is_italic = is_italic
        self.item_type = item_type
        self.link = link

    def to_row(self) -> dict:
        return {
            "text": self.text, "x": self.x, "y": self.y,
            "width": self.width, "height": self.height, "font": self.font,
            "font_size": self.font_size, "page": self.page,
            "is_bold": self.is_bold, "is_italic": self.is_italic,
            "item_type": self.item_type, "link": self.link,
        }

    @classmethod
    def from_row(cls, r: dict) -> "TextItem":
        return cls(r["text"], r["x"], r["y"], r["width"], r["height"], r["font"],
                   r["font_size"], r["page"], r.get("is_bold", False),
                   r.get("is_italic", False), r.get("item_type", ITEM_TEXT),
                   r.get("link"))

    def __repr__(self) -> str:
        return f"TextItem({self.text!r}@{self.x},{self.y} p{self.page})"


def effective_width(item: TextItem) -> float:
    """Width fallback = chars × fs × 0.5 (src/extractor.rs:1990-1996)."""
    if item.width > 0.0:
        return item.width
    return len(item.text) * item.font_size * 0.5


def is_cjk_char(c: str) -> bool:
    """CJK ranges incl. Hiragana/Katakana/FF00 (src/extractor.rs:1805-1814)."""
    o = ord(c)
    return (0x3000 <= o <= 0x303F or 0x3040 <= o <= 0x309F
            or 0x30A0 <= o <= 0x30FF or 0x4E00 <= o <= 0x9FFF
            or 0xF900 <= o <= 0xFAFF or 0xFF00 <= o <= 0xFFEF)


def is_bold_font(font_name: str) -> bool:
    """Bold-name substrings (src/extractor.rs:1818-1835)."""
    lower = font_name.lower()
    return ("bold" in lower or "-bd" in lower or "_bd" in lower
            or "black" in lower or "heavy" in lower
            or "demibold" in lower or "semibold" in lower
            or "demi-bold" in lower or "semi-bold" in lower
            or "extrabold" in lower or "ultrabold" in lower
            or ("medium" in lower and "mediumitalic" not in lower))


def is_italic_font(font_name: str) -> bool:
    """Italic-name substrings (src/extractor.rs:1839-1850)."""
    lower = font_name.lower()
    return ("italic" in lower or "oblique" in lower or "-it" in lower
            or "_it" in lower or "slant" in lower or "inclined" in lower
            or "kursiv" in lower)


def should_join_items(prev_item: TextItem, curr_item: TextItem) -> bool:
    """Position/case-based word-join decision — constants ported verbatim
    (src/extractor.rs:657-830). Highest-fidelity-risk operator."""
    if prev_item.text.endswith(" ") or curr_item.text.startswith(" "):
        return False

    prev_stripped = prev_item.text.rstrip()
    curr_stripped = curr_item.text.lstrip()
    prev_last = prev_stripped[-1] if prev_stripped else None
    curr_first = curr_stripped[0] if curr_stripped else None

    # punctuation that binds without a space (www + .com)
    if curr_first is not None and curr_first in ".,;!?)]}'":
        return True

    # label: value gets a space
    if prev_last == ":" and curr_first is not None and curr_first.isalnum():
        return False

    if prev_item.width > 0.0:
        prev_end_x = prev_item.x + prev_item.width
        gap = curr_item.x - prev_end_x
        font_size = prev_item.font_size

        prev_chars = len(prev_item.text.strip())
        curr_chars = len(curr_item.text.strip())
        p_strip = prev_item.text.strip()
        c_strip = curr_item.text.strip()
        prev_last_char = p_strip[-1] if p_strip else None
        curr_first_char = c_strip[0] if c_strip else None
        cjk = ((prev_last_char is not None and is_cjk_char(prev_last_char))
               or (curr_first_char is not None and is_cjk_char(curr_first_char)))

        # Truly-touching multi-char items: CID word-level operators
        # (gap < 1% of font size; src/extractor.rs:707-739)
        if not cjk and 0.0 <= gap < font_size * 0.01 and prev_chars >= 3 and curr_chars >= 2:
            prev_word_count = len(prev_item.text.split())
            if prev_word_count >= 3:
                return gap < font_size * 0.15
            last_word = prev_item.text.rstrip().split()[-1] if prev_item.text.rstrip().split() else prev_item.text
            first_word = curr_item.text.lstrip().split()[0] if curr_item.text.lstrip().split() else curr_item.text
            if len(last_word) > 2 and len(first_word) > 2:
                return False  # separate words from a CID font

        # numeric continuity (src/extractor.rs:745-755)
        if prev_last is not None and curr_first is not None:
            prev_is_numeric = prev_last.isdigit() or prev_last in ",."
            curr_is_numeric = curr_first.isdigit() or curr_first in "%."
            if prev_is_numeric and curr_is_numeric:
                return gap < font_size * 0.3
            if prev_last in "+-" and curr_first.isdigit():
                return gap < font_size * 0.3

        # single-char fragment next to multi-char item (src/extractor.rs:760-776)
        if (prev_chars == 1) != (curr_chars == 1):
            return gap < font_size * 0.25

        if prev_chars == 1 and curr_chars == 1:
            if prev_last is not None and curr_first is not None:
                p_numeric = prev_last.isdigit() or prev_last in ",.%+-"
                c_numeric = curr_first.isdigit() or curr_first in ",.%"
                if p_numeric and c_numeric:
                    return gap < font_size * 0.25

        # default with accurate widths (src/extractor.rs:780)
        return gap < font_size * 0.15

    # Fallback: width estimated from character count (src/extractor.rs:783-829)
    char_width = prev_item.font_size * 0.45
    estimated_prev_width = len(prev_item.text) * char_width
    prev_end_x = prev_item.x + estimated_prev_width
    gap = curr_item.x - prev_end_x

    cjk = ((prev_last is not None and is_cjk_char(prev_last))
           or (curr_first is not None and is_cjk_char(curr_first)))
    if cjk:
        return gap < char_width * 0.8

    if (prev_last is not None and curr_first is not None
            and prev_last.isalpha() and curr_first.isalpha()):
        same_case = ((prev_last.isupper() and curr_first.isupper())
                     or (prev_last.islower() and curr_first.islower()))
        if same_case:
            return gap < char_width * 0.8
        if prev_last.islower() and curr_first.isupper():
            return False  # lowercase→uppercase is a word boundary
        return gap < char_width * 0.3
    return gap < char_width * 0.5


class TextLine:
    __slots__ = ("items", "y", "page", "_tcache")

    def __init__(self, items: list[TextItem], y: float, page: int) -> None:
        self.items = items
        self.y = y
        self.page = page
        # Rendered-text memo: the markdown heuristics call text()/
        # text_plain() ~7x per line (r5 profile: 91.5k calls for 13k
        # lines). Keyed by (len(items), bold, italic): appends/extends
        # (group_single_column, merge_heading_lines) change the length
        # and miss naturally; the ONE in-place item mutation
        # (merge_drop_caps) calls invalidate() explicitly.
        self._tcache: dict | None = None

    def invalidate(self) -> None:
        self._tcache = None

    def _needs_space_between(self, prev_item: TextItem, item: TextItem, result: str) -> bool:
        """src/extractor.rs:619-651."""
        text = item.text
        prev_ends_with_hyphen = result.endswith("-")
        curr_is_hyphen = text.strip() == "-"
        curr_starts_with_hyphen = text.startswith("-")

        font_ratio = item.font_size / prev_item.font_size if prev_item.font_size else 1.0
        reverse_ratio = prev_item.font_size / item.font_size if item.font_size else 1.0
        y_diff = abs(item.y - prev_item.y)
        is_sub_super = font_ratio < 0.85 and y_diff > 1.0
        was_sub_super = reverse_ratio < 0.85 and y_diff > 1.0

        join = should_join_items(prev_item, item)
        space_exists = result.endswith(" ") or text.startswith(" ")

        return not (prev_ends_with_hyphen or curr_is_hyphen or curr_starts_with_hyphen
                    or is_sub_super or was_sub_super or join or space_exists)

    def text(self) -> str:
        return self.text_with_formatting(False, False)

    def text_plain(self) -> str:
        return self.text_with_formatting(False, False)

    def text_plain_uncached(self) -> str:
        """src/extractor.rs:601-616."""
        result = ""
        for i, item in enumerate(self.items):
            if i == 0:
                result += item.text
            else:
                if self._needs_space_between(self.items[i - 1], item, result):
                    result += " "
                result += item.text
        return result

    def text_with_formatting(self, format_bold: bool, format_italic: bool) -> str:
        """src/extractor.rs:524-598."""
        key = (len(self.items), format_bold, format_italic)
        cache = self._tcache
        if cache is not None:
            hit = cache.get(key)
            if hit is not None:
                return hit
        out = self._render(format_bold, format_italic)
        if cache is None:
            cache = self._tcache = {}
        cache[key] = out
        return out

    def _render(self, format_bold: bool, format_italic: bool) -> str:
        if not format_bold and not format_italic:
            return self.text_plain_uncached()
        result = ""
        current_bold = False
        current_italic = False
        for i, item in enumerate(self.items):
            text = item.text
            text_trimmed = text.strip()
            if not text_trimmed:
                continue
            if i == 0 or not result:
                needs_space = False
            else:
                needs_space = self._needs_space_between(self.items[i - 1], item, result)
            has_leading_space = text.startswith(" ")
            item_bold = format_bold and item.is_bold
            item_italic = format_italic and item.is_italic
            if current_italic and not item_italic:
                result += "*"
                current_italic = False
            if current_bold and not item_bold:
                result += "**"
                current_bold = False
            if needs_space or (has_leading_space and result and not result.endswith(" ")):
                result += " "
            if item_bold and not current_bold:
                result += "**"
                current_bold = True
            if item_italic and not current_italic:
                result += "*"
                current_italic = True
            result += text_trimmed
        if current_italic:
            result += "*"
        if current_bold:
            result += "**"
        return result


# --------------------------------------------------------------------------
# Matrix helpers (src/extractor.rs:893-906, :1791-1800)
# --------------------------------------------------------------------------

def multiply_matrices(m1, m2):
    return (
        m1[0] * m2[0] + m1[1] * m2[2],
        m1[0] * m2[1] + m1[1] * m2[3],
        m1[2] * m2[0] + m1[3] * m2[2],
        m1[2] * m2[1] + m1[3] * m2[3],
        m1[4] * m2[0] + m1[5] * m2[2] + m2[4],
        m1[4] * m2[1] + m1[5] * m2[3] + m2[5],
    )


def effective_font_size(base_size: float, tm) -> float:
    scale_x = (tm[0] * tm[0] + tm[1] * tm[1]) ** 0.5
    scale_y = (tm[2] * tm[2] + tm[3] * tm[3]) ** 0.5
    return base_size * max(scale_x, scale_y)


# --------------------------------------------------------------------------
# Text decode cascade (src/extractor.rs:1854-1957)
# --------------------------------------------------------------------------

import re as _re

_CTRL_RE = _re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f]")
_LIG_RE = _re.compile("[ﬀﬁﬂﬃﬄ]")


def expand_ligatures(text: str) -> str:
    """Strip control chars (keep \\n \\r \\t); expand U+FB00–FB04
    (src/extractor.rs:1961-1987)."""
    if _CTRL_RE.search(text):
        text = _CTRL_RE.sub("", text)
    if not _LIG_RE.search(text):
        return text
    return (text.replace("ﬀ", "ff").replace("ﬁ", "fi")
            .replace("ﬂ", "fl").replace("ﬃ", "ffi")
            .replace("ﬄ", "ffl"))


_STD_ENCODINGS = {"WinAnsiEncoding": "cp1252", "MacRomanEncoding": "mac-roman",
                  "StandardEncoding": "latin-1", "PDFDocEncoding": "latin-1"}


def extract_text_from_operand(operand, doc: Document, fonts: dict[str, dict],
                              current_font: str, font_cmaps: FontCMaps,
                              font_base_names: dict[str, str],
                              font_tounicode_refs: dict[str, int],
                              font_encodings: dict[str, dict[int, str]]) -> str | None:
    """The 8-step decode cascade (src/extractor.rs:1854-1957):
    ① CMap by ToUnicode obj ref ② base-name+obj ③ base name ④ resource name
    ⑤ Differences map with printable-byte fallback ⑥ standard font encoding
    ⑦ UTF-16BE BOM ⑧ Latin-1."""
    if not isinstance(operand, bytes):
        return None
    data = operand

    obj_num = font_tounicode_refs.get(current_font)
    if obj_num is not None:
        cmap = font_cmaps.get_by_obj(obj_num)
        if cmap is not None:
            decoded = cmap.decode_cids(data)
            if decoded:
                return decoded

    base_name = font_base_names.get(current_font)
    if base_name is not None and obj_num is not None:
        cmap = font_cmaps.get_with_obj(base_name, obj_num)
        if cmap is not None:
            decoded = cmap.decode_cids(data)
            if decoded:
                return decoded

    if base_name is not None:
        cmap = font_cmaps.get(base_name)
        if cmap is not None:
            decoded = cmap.decode_cids(data)
            if decoded:
                return decoded

    cmap = font_cmaps.get(current_font)
    if cmap is not None:
        decoded = cmap.decode_cids(data)
        if decoded:
            return decoded

    enc_map = font_encodings.get(current_font)
    if enc_map is not None and any(b in enc_map for b in data):
        out = []
        for b in data:
            ch = enc_map.get(b)
            if ch is not None:
                out.append(ch)
            elif b >= 0x20:
                out.append(chr(b))
        decoded = "".join(out)
        if decoded:
            return decoded

    font_dict = fonts.get(current_font)
    if font_dict is not None:
        enc = font_dict.get("Encoding")
        codec = None
        if isinstance(enc, Name):
            codec = _STD_ENCODINGS.get(str(enc))
        elif isinstance(enc, (dict, Ref)):
            ed = doc.get_dict(enc)
            if ed is not None and isinstance(ed.get("BaseEncoding"), Name):
                codec = _STD_ENCODINGS.get(str(ed["BaseEncoding"]))
        if codec is not None:
            try:
                return data.decode(codec, errors="replace")
            except LookupError:
                pass

    if len(data) >= 2 and data[0] == 0xFE and data[1] == 0xFF:
        return data[2:].decode("utf-16-be", errors="replace")

    return data.decode("latin-1")


# --------------------------------------------------------------------------
# XObjects / links (src/extractor.rs:1309-1787)
# --------------------------------------------------------------------------

def get_page_xobjects(doc: Document, page_obj_num: int) -> dict[str, tuple[str, int | None]]:
    """name → ("image", None) | ("form", obj_num)."""
    out: dict[str, tuple[str, int | None]] = {}
    res = doc.get_page_resources(page_obj_num)
    if not res:
        return out
    xdict = doc.get_dict(res.get("XObject"))
    if not xdict:
        return out
    for name, ref in xdict.items():
        obj = doc.resolve(ref)
        if isinstance(obj, Stream):
            subtype = obj.dict.get("Subtype")
            if subtype == "Image":
                out[str(name)] = ("image", None)
            elif subtype == "Form" and isinstance(ref, Ref):
                out[str(name)] = ("form", ref.num)
    return out


def get_form_fonts(doc: Document, form_dict: dict) -> tuple[dict[str, dict], dict[str, int]]:
    """Fonts from a Form XObject's Resources; also the font obj numbers
    (src/extractor.rs:1632-1678)."""
    fonts: dict[str, dict] = {}
    refs: dict[str, int] = {}
    res = doc.get_dict(form_dict.get("Resources"))
    if not res:
        return fonts, refs
    fdict = doc.get_dict(res.get("Font"))
    if not fdict:
        return fonts, refs
    for name, ref in fdict.items():
        d = doc.get_dict(ref)
        if d is not None:
            fonts[str(name)] = d
            if isinstance(ref, Ref):
                refs[str(name)] = ref.num
    return fonts, refs


def extract_link_uri(doc: Document, annot: dict) -> str | None:
    """A-dict → URI (src/extractor.rs:1764-1787)."""
    action = doc.get_dict(annot.get("A"))
    if action is not None:
        uri = doc.resolve(action.get("URI"))
        if isinstance(uri, bytes):
            return uri.decode("utf-8", errors="replace")
    return None


def _get_number(v) -> float | None:
    if isinstance(v, bool):
        return None
    if isinstance(v, (int, float)):
        return float(v)
    return None


def extract_page_links(doc: Document, page_obj_num: int, page_num: int) -> list[TextItem]:
    """Link annotations → TextItems (src/extractor.rs:1681-1761)."""
    links: list[TextItem] = []
    page = doc.get_dict(Ref(page_obj_num))
    if not page:
        return links
    annots = doc.get_array(page.get("Annots"))
    if not annots:
        return links
    for annot_ref in annots:
        annot = doc.get_dict(annot_ref)
        if not annot:
            continue
        subtype = annot.get("Subtype")
        if isinstance(subtype, Name) and subtype != "Link":
            continue
        rect_arr = doc.get_array(annot.get("Rect"))
        rect = None
        if rect_arr and len(rect_arr) >= 4:
            x1 = _get_number(rect_arr[0]) or 0.0
            y1 = _get_number(rect_arr[1]) or 0.0
            x2 = _get_number(rect_arr[2]) or 0.0
            y2 = _get_number(rect_arr[3]) or 0.0
            rect = (x1, y1, x2 - x1, y2 - y1)
        uri = extract_link_uri(doc, annot)
        if rect is not None and uri is not None:
            x, y, w, h = rect
            links.append(TextItem(uri, x, y, w, h, "", 0.0, page_num,
                                  item_type=ITEM_LINK, link=uri))
    return links


# --------------------------------------------------------------------------
# Content-stream interpreter (src/extractor.rs:909-1298)
# --------------------------------------------------------------------------

def _font_metadata(doc: Document, page_obj_num: int,
                   fonts: dict[str, dict]) -> tuple[dict[str, str], dict[str, int]]:
    base_names: dict[str, str] = {}
    tounicode_refs: dict[str, int] = {}
    for resource_name, fdict in fonts.items():
        bf = fdict.get("BaseFont")
        if isinstance(bf, Name):
            base_names[resource_name] = str(bf)
        tu = fdict.get("ToUnicode")
        if isinstance(tu, Ref):
            tounicode_refs[resource_name] = tu.num
    return base_names, tounicode_refs


def _emit_tj_item(items: list[TextItem], text: str, text_matrix, ctm,
                  current_font: str, current_font_size: float, width: float,
                  page_num: int, base_font: str) -> None:
    rendered = effective_font_size(current_font_size, text_matrix)
    combined = multiply_matrices(text_matrix, ctm)
    items.append(TextItem(expand_ligatures(text), combined[4], combined[5],
                          width, rendered, current_font, rendered, page_num,
                          is_bold_font(base_font), is_italic_font(base_font)))


def _interpret_stream(doc: Document, operations, page_num: int,
                      fonts: dict[str, dict], font_encodings, font_widths,
                      base_names, tounicode_refs, font_cmaps: FontCMaps,
                      parent_ctm=None, xobjects=None,
                      allow_graphics_state: bool = True) -> list[TextItem]:
    """Shared interpreter core. With ``parent_ctm`` set it behaves like the
    Form XObject mini-interpreter (src/extractor.rs:1375-1629, no q/Q/cm/Do);
    otherwise the full page interpreter (src/extractor.rs:909-1298)."""
    items: list[TextItem] = []
    ctm = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)
    ctm_stack: list[tuple] = []
    current_font = ""
    current_font_size = 12.0
    text_matrix = [1.0, 0.0, 0.0, 1.0, 0.0, 0.0]
    line_matrix = [1.0, 0.0, 0.0, 1.0, 0.0, 0.0]
    in_text_block = False
    is_form = parent_ctm is not None
    place_ctm = parent_ctm if is_form else None

    def decode(operand):
        return extract_text_from_operand(operand, doc, fonts, current_font,
                                         font_cmaps, base_names,
                                         tounicode_refs, font_encodings)

    # Branch order is measured operator frequency (BT/Tf/ET/Tj/Td are
    # ~96% of real content-stream ops), not spec order — the chain is
    # the interpreter's per-op fixed cost. Operator names are distinct,
    # so ordering is semantics-free.
    for op in operations:
        o = op.operator
        ops = op.operands
        if o == "Tj":
            if in_text_block and ops:
                text = decode(ops[0])
                if text is not None and text.strip():
                    place = place_ctm if is_form else ctm
                    # Position is taken from the text matrix BEFORE the
                    # width advance (src/extractor.rs:1058-1082).
                    tm_at_emit = tuple(text_matrix)
                    width = 0.0
                    fi = font_widths.get(current_font)
                    if fi is not None and isinstance(ops[0], bytes):
                        w_ts = compute_string_width_ts(ops[0], fi, current_font_size)
                        text_matrix[4] += w_ts * text_matrix[0]
                        text_matrix[5] += w_ts * text_matrix[1]
                        width = abs(w_ts * (text_matrix[0] * place[0]
                                            + text_matrix[1] * place[2]))
                    base_font = base_names.get(current_font, current_font)
                    _emit_tj_item(items, text, tm_at_emit, place, current_font,
                                  current_font_size, width, page_num, base_font)
        elif o == "Td" or o == "TD":
            if len(ops) >= 2:
                tx = _get_number(ops[0]) or 0.0
                ty = _get_number(ops[1]) or 0.0
                if is_form:
                    # Form mini-interpreter parity (src/extractor.rs:
                    # 1452-1459): offsets apply directly to the
                    # post-advance text matrix; no line matrix.
                    text_matrix[4] += tx
                    text_matrix[5] += ty
                else:
                    line_matrix[4] += tx
                    line_matrix[5] += ty
                    text_matrix = list(line_matrix)
        elif o == "Tf":
            if len(ops) >= 2:
                if isinstance(ops[0], Name):
                    current_font = str(ops[0])
                sz = _get_number(ops[1])
                if sz is not None:
                    current_font_size = sz
        elif o == "BT":
            in_text_block = True
            text_matrix = [1.0, 0.0, 0.0, 1.0, 0.0, 0.0]
            line_matrix = [1.0, 0.0, 0.0, 1.0, 0.0, 0.0]
        elif o == "ET":
            in_text_block = False
        elif o == "TJ":
            if in_text_block and ops and isinstance(ops[0], list):
                fi = font_widths.get(current_font)
                # space threshold: 40% of space width, clamped [80, 200]
                # (src/extractor.rs:1112-1120)
                if fi is not None:
                    space_em = fi.space_width * fi.units_scale
                    space_threshold = min(max(space_em * 1000.0 * 0.4, 80.0), 200.0)
                else:
                    space_threshold = 120.0
                combined_text = ""
                total_width_ts = 0.0
                for element in ops[0]:
                    num = _get_number(element)
                    if num is not None:
                        total_width_ts += -num / 1000.0 * current_font_size
                        if num < -space_threshold and combined_text and not combined_text.endswith(" "):
                            combined_text += " "
                        continue
                    if fi is not None and isinstance(element, bytes):
                        total_width_ts += compute_string_width_ts(element, fi, current_font_size)
                    t = decode(element)
                    if t is not None:
                        combined_text += t
                if combined_text.strip():
                    place = place_ctm if is_form else ctm
                    width = 0.0
                    if fi is not None:
                        width = abs(total_width_ts * (text_matrix[0] * place[0]
                                                      + text_matrix[1] * place[2]))
                    base_font = base_names.get(current_font, current_font)
                    _emit_tj_item(items, combined_text, text_matrix, place,
                                  current_font, current_font_size, width,
                                  page_num, base_font)
                    if fi is not None:
                        text_matrix[4] += total_width_ts * text_matrix[0]
                        text_matrix[5] += total_width_ts * text_matrix[1]
        elif o == "Tm":
            if len(ops) >= 6:
                for i in range(6):
                    v = _get_number(ops[i])
                    text_matrix[i] = v if v is not None else (1.0 if i in (0, 3) else 0.0)
                line_matrix = list(text_matrix)
        elif o == "T*":
            if not is_form:  # the reference's form interpreter has no T*
                line_matrix[5] -= current_font_size * 1.2  # line height approx
                text_matrix = list(line_matrix)
        elif o == "q" and allow_graphics_state:
            ctm_stack.append(ctm)
        elif o == "Q" and allow_graphics_state:
            if ctm_stack:
                ctm = ctm_stack.pop()
        elif o == "cm" and allow_graphics_state:
            if len(ops) >= 6:
                nm = tuple(_get_number(v) if _get_number(v) is not None
                           else (1.0 if i in (0, 3) else 0.0)
                           for i, v in enumerate(ops[:6]))
                ctm = multiply_matrices(nm, ctm)
        elif o == "'":
            if not is_form:
                line_matrix[5] -= current_font_size * 1.2
                text_matrix = list(line_matrix)
                if ops:
                    text = decode(ops[0])
                    if text is not None and text.strip():
                        base_font = base_names.get(current_font, current_font)
                        _emit_tj_item(items, text, text_matrix, ctm, current_font,
                                      current_font_size, 0.0, page_num, base_font)
        elif o == "Do":
            if not is_form and xobjects and ops and isinstance(ops[0], Name):
                xobj_name = str(ops[0])
                entry = xobjects.get(xobj_name)
                if entry is not None:
                    kind, form_num = entry
                    if kind == "image":
                        items.append(TextItem(f"[Image: {xobj_name}]", ctm[4], ctm[5],
                                              abs(ctm[0]), abs(ctm[3]), "", 0.0,
                                              page_num, item_type=ITEM_IMAGE))
                    elif kind == "form" and form_num is not None:
                        items.extend(extract_form_xobject_text(
                            doc, form_num, page_num, font_cmaps, ctm))
    return items


def extract_page_text_items(doc: Document, page_obj_num: int, page_num: int,
                            font_cmaps: FontCMaps) -> list[TextItem]:
    """Full page interpreter (src/extractor.rs:909-1298)."""
    fonts = doc.get_page_fonts(page_obj_num)
    font_encodings = build_font_encodings(doc, fonts)
    font_widths = build_font_widths(doc, fonts)
    base_names, tounicode_refs = _font_metadata(doc, page_obj_num, fonts)
    xobjects = get_page_xobjects(doc, page_obj_num)
    content = doc.get_page_content(page_obj_num)
    operations = decode_content(content)
    return _interpret_stream(doc, operations, page_num, fonts, font_encodings,
                             font_widths, base_names, tounicode_refs, font_cmaps,
                             xobjects=xobjects)


def extract_form_xobject_text(doc: Document, form_obj_num: int, page_num: int,
                              font_cmaps: FontCMaps, parent_ctm) -> list[TextItem]:
    """Form XObject mini-interpreter (src/extractor.rs:1375-1629)."""
    obj = doc.resolve(Ref(form_obj_num))
    if not isinstance(obj, Stream):
        return []
    content = obj.decompressed()
    operations = decode_content(content)
    form_fonts, _refs = get_form_fonts(doc, obj.dict)
    font_encodings = build_font_encodings(doc, form_fonts)
    font_widths = build_font_widths(doc, form_fonts)
    base_names: dict[str, str] = {}
    tounicode_refs: dict[str, int] = {}
    for rn, fd in form_fonts.items():
        bf = fd.get("BaseFont")
        if isinstance(bf, Name):
            base_names[rn] = str(bf)
        tu = fd.get("ToUnicode")
        if isinstance(tu, Ref):
            tounicode_refs[rn] = tu.num
    return _interpret_stream(doc, operations, page_num, form_fonts,
                             font_encodings, font_widths, base_names,
                             tounicode_refs, font_cmaps, parent_ctm=parent_ctm,
                             allow_graphics_state=False)


def extract_positioned_text_from_doc(doc: Document, font_cmaps: FontCMaps) -> list[TextItem]:
    """Per-page items + link annotations (src/extractor.rs:873-890)."""
    all_items: list[TextItem] = []
    for page_num, obj_num in sorted(doc.get_pages().items()):
        all_items.extend(extract_page_text_items(doc, obj_num, page_num, font_cmaps))
        all_items.extend(extract_page_links(doc, obj_num, page_num))
    return all_items


def extract_text_with_positions_mem(buf: bytes) -> list[TextItem]:
    """CMaps from raw bytes + positioned extraction
    (src/extractor.rs:864-870)."""
    font_cmaps = FontCMaps.from_pdf_bytes(buf)
    doc = Document.load_mem(buf)
    return extract_positioned_text_from_doc(doc, font_cmaps)


def extract_text_mem(buf: bytes) -> str:
    """Plain-text path (src/extractor.rs:839-851): full extraction with
    per-page newlines, no reading-order reconstruction — the analog of
    lopdf's built-in ``doc.extract_text`` used by the reference's
    simple/fallback path."""
    font_cmaps = FontCMaps.from_pdf_bytes(buf)
    doc = Document.load_mem(buf)
    pages: list[str] = []
    for page_num, obj_num in sorted(doc.get_pages().items()):
        items = extract_page_text_items(doc, obj_num, page_num, font_cmaps)
        pages.append("".join(i.text for i in items if i.item_type == ITEM_TEXT))
    return "\n".join(pages)


# --------------------------------------------------------------------------
# Reading-order reconstruction (src/extractor.rs:1998-2441)
# --------------------------------------------------------------------------

class ColumnRegion:
    __slots__ = ("x_min", "x_max")

    def __init__(self, x_min: float, x_max: float) -> None:
        self.x_min = x_min
        self.x_max = x_max


def detect_columns(items: list[TextItem], page: int) -> list[ColumnRegion]:
    """Horizontal projection-profile gutter detection; constants per
    src/extractor.rs:2010-2186."""
    BIN_WIDTH = 2.0
    MIN_GUTTER_WIDTH = 8.0
    MIN_VERTICAL_SPAN_RATIO = 0.30
    MIN_ITEMS_PER_COLUMN = 10
    NOISE_FRACTION = 0.05

    page_items = [i for i in items if i.page == page]
    if not page_items:
        return []
    x_min = min(i.x for i in page_items)
    x_max = max(i.x + effective_width(i) for i in page_items)
    page_width = x_max - x_min
    if page_width < 200.0 or len(page_items) < 20:
        return [ColumnRegion(x_min, x_max)]

    num_bins = max(int(-(-page_width // BIN_WIDTH)), 1)
    # Difference-array accumulation: O(items + bins) instead of
    # O(items × span); the prefix sum reproduces the per-bin counts of
    # the naive `for b in range(left, right): histogram[b] += 1` exactly.
    diff = [0] * (num_bins + 1)
    for item in page_items:
        w = effective_width(item)
        left = min(int((item.x - x_min) / BIN_WIDTH), num_bins)
        right = min(int(-(-(item.x + w - x_min) // BIN_WIDTH)), num_bins)
        if left < right:
            diff[left] += 1
            diff[right] -= 1
    histogram = [0] * num_bins
    acc = 0
    for b in range(num_bins):
        acc += diff[b]
        histogram[b] = acc

    max_count = max(histogram) if histogram else 0
    noise_threshold = int(max_count * NOISE_FRACTION)

    valleys: list[tuple[int, int]] = []
    valley_start: int | None = None
    for i, count in enumerate(histogram):
        if count <= noise_threshold:
            if valley_start is None:
                valley_start = i
        elif valley_start is not None:
            valleys.append((valley_start, i))
            valley_start = None
    if valley_start is not None:
        valleys.append((valley_start, num_bins))

    margin_threshold = page_width * 0.05
    filtered = []
    for start, end in valleys:
        width_pts = (end - start) * BIN_WIDTH
        if width_pts < MIN_GUTTER_WIDTH:
            continue
        center_pts = (start + end) / 2.0 * BIN_WIDTH
        if margin_threshold < center_pts < page_width - margin_threshold:
            filtered.append((start, end))
    valleys = filtered
    if not valleys:
        return [ColumnRegion(x_min, x_max)]

    y_min = min(i.y for i in page_items)
    y_max = max(i.y for i in page_items)
    y_range = y_max - y_min

    valid: list[tuple[int, int]] = []
    for start, end in valleys:
        gutter_left = x_min + start * BIN_WIDTH
        gutter_right = x_min + end * BIN_WIDTH
        gutter_center = (gutter_left + gutter_right) / 2.0
        left_items = [i for i in page_items if i.x + effective_width(i) <= gutter_center]
        right_items = [i for i in page_items if i.x >= gutter_center]
        if len(left_items) < MIN_ITEMS_PER_COLUMN or len(right_items) < MIN_ITEMS_PER_COLUMN:
            continue
        if y_range > 0.0:
            l_ymin = min(i.y for i in left_items)
            l_ymax = max(i.y for i in left_items)
            r_ymin = min(i.y for i in right_items)
            r_ymax = max(i.y for i in right_items)
            overlap = max(min(l_ymax, r_ymax) - max(l_ymin, r_ymin), 0.0)
            if overlap / y_range < MIN_VERTICAL_SPAN_RATIO:
                continue
        valid.append((start, end))
    if not valid:
        return [ColumnRegion(x_min, x_max)]

    if len(valid) > 3:  # keep the 3 widest gutters (≤4 columns)
        valid.sort(key=lambda v: v[1] - v[0], reverse=True)
        valid = valid[:3]
        valid.sort(key=lambda v: v[0])

    columns: list[ColumnRegion] = []
    col_start = x_min
    for start, end in valid:
        gutter_center = x_min + (start + end) / 2.0 * BIN_WIDTH
        columns.append(ColumnRegion(col_start, gutter_center))
        col_start = gutter_center
    columns.append(ColumnRegion(col_start, x_max))
    return columns


def spans_multiple_columns(item: TextItem, columns: list[ColumnRegion]) -> bool:
    """Item overlaps ≥2 regions by >10% of region or >20pt
    (src/extractor.rs:2189-2202)."""
    w = effective_width(item)
    item_right = item.x + w
    count = 0
    for col in columns:
        overlap = max(min(item_right, col.x_max) - max(item.x, col.x_min), 0.0)
        if overlap > (col.x_max - col.x_min) * 0.10 or overlap > 20.0:
            count += 1
    return count >= 2


def is_page_number(item: TextItem) -> bool:
    """1–4 digit item at y>720 or y<100 (src/extractor.rs:2205-2220)."""
    text = item.text.strip()
    if not text or len(text) > 4:
        return False
    if not text.isascii() or not text.isdigit():
        return False
    return item.y > 720.0 or item.y < 100.0


def should_use_y_sorting(items: list[TextItem]) -> bool:
    """Chaos heuristic: >40% of large (>50pt) Y-jumps upward
    (src/extractor.rs:2324-2357)."""
    if len(items) < 5:
        return False
    jump_threshold = 50.0
    up = down = 0
    ys = [i.y for i in items]
    for a, b in zip(ys, ys[1:]):
        delta = b - a
        if delta > jump_threshold:
            up += 1
        elif delta < -jump_threshold:
            down += 1
    total = up + down
    if total < 3:
        return False
    return up / total > 0.4


def group_single_column(items: list[TextItem]) -> list[TextLine]:
    """Greedy line clustering with y_tolerance 3.0 and same-X new-line guard
    (src/extractor.rs:2361-2441)."""
    if not items:
        return []
    if should_use_y_sorting(items):
        items = sorted(items, key=lambda i: (-i.y, i.x))

    lines: list[TextLine] = []
    y_tolerance = 3.0
    for item in items:
        should_merge = False
        if lines:
            last_line = lines[-1]
            if last_line.page == item.page:
                y_diff = abs(last_line.y - item.y)
                if y_diff < y_tolerance:
                    should_merge = True
                    if y_diff > 0.5:  # Y changed: maybe a stacked new line
                        first_item = last_line.items[0]
                        if abs(item.x - first_item.x) < 5.0:
                            should_merge = False
                        elif item.x < last_line.items[-1].x - 10.0:
                            should_merge = False
        if should_merge:
            lines[-1].items.append(item)
        else:
            lines.append(TextLine([item], item.y, item.page))

    for line in lines:
        line.items.sort(key=lambda i: i.x)
    return lines


def group_into_lines(items: list[TextItem]) -> list[TextLine]:
    """Page-number filter → per-page column detection → single- vs
    multi-column grouping → section-based merge (src/extractor.rs:2223-2320)."""
    if not items:
        return []
    items = [i for i in items if not is_page_number(i)]
    pages = sorted({i.page for i in items})
    all_lines: list[TextLine] = []

    for page in pages:
        page_items = [i for i in items if i.page == page]
        columns = detect_columns(page_items, page)
        if len(columns) <= 1:
            all_lines.extend(group_single_column(page_items))
            continue

        spanning_items: list[TextItem] = []
        column_items: list[TextItem] = []
        for item in page_items:
            if spans_multiple_columns(item, columns):
                spanning_items.append(item)
            else:
                column_items.append(item)

        per_column_lines: list[list[TextLine]] = []
        for column in columns:
            col_items = [i for i in column_items
                         if column.x_min <= i.x + effective_width(i) / 2.0 < column.x_max]
            per_column_lines.append(group_single_column(col_items))

        spanning_lines = group_single_column(spanning_items)
        spanning_lines.sort(key=lambda l: -l.y)

        merged: list[TextLine] = []
        col_cursors = [0] * len(per_column_lines)
        for span_line in spanning_lines:
            span_y = span_line.y
            for ci, col_lines in enumerate(per_column_lines):
                while col_cursors[ci] < len(col_lines) and col_lines[col_cursors[ci]].y >= span_y:
                    merged.append(col_lines[col_cursors[ci]])
                    col_cursors[ci] += 1
            merged.append(span_line)
        for ci, col_lines in enumerate(per_column_lines):
            while col_cursors[ci] < len(col_lines):
                merged.append(col_lines[col_cursors[ci]])
                col_cursors[ci] += 1
        all_lines.extend(merged)

    return all_lines
