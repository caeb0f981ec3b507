"""ToUnicode CMap parsing and CID→Unicode decoding.

Behavioral parity with the reference's CMap layer
(reference: src/tounicode.rs). Key semantics preserved:

- codespace byte-width detection with the 1-byte-entries override when the
  codespace says 2-byte but every bfchar/bfrange source code is ≤2 hex
  digits (src/tounicode.rs:89-109) — the "CJK garbage" regression guard;
- bfchar and bfrange sections, including the ``[<u1> <u2> …]`` array form
  (src/tounicode.rs:115-302);
- decode: 1-byte unmapped codes ≥0x20 fall back to Latin-1, 2-byte
  unmapped CIDs are skipped, and >50% unmapped returns "" so callers fall
  through the decode cascade (src/tounicode.rs:326-374);
- raw-byte stream extraction (``N 0 obj … stream…endstream`` with optional
  FlateDecode) that works on linearized PDFs without an object parser
  (src/tounicode.rs:413-466).
"""

from __future__ import annotations

import re
import zlib

_HEX_RE = re.compile(r"<([0-9A-Fa-f\s]*)>")


def _parse_hex_u16(h: str) -> int | None:
    try:
        v = int(h.strip(), 16)
    except ValueError:
        return None
    return v if 0 <= v <= 0xFFFF else None


def _parse_hex_u32(h: str) -> int | None:
    try:
        return int(h.strip(), 16)
    except ValueError:
        return None


def _hex_to_unicode_string(h: str) -> str | None:
    """UTF-16BE hex → str, 4 hex digits at a time (src/tounicode.rs:389-409).

    Surrogate pairs are combined; lone surrogates are dropped (Rust's
    char::from_u32 rejects surrogate codepoints).
    """
    h = h.strip()
    units: list[int] = []
    i = 0
    while i + 4 <= len(h):
        try:
            units.append(int(h[i:i + 4], 16))
        except ValueError:
            pass
        i += 4
    if not units:
        return None
    try:
        s = "".join(map(chr, units)).encode("utf-16", "surrogatepass").decode("utf-16")
    except UnicodeDecodeError:
        s = "".join(chr(u) for u in units if not 0xD800 <= u <= 0xDFFF)
    return s or None


class ToUnicodeCMap:
    """A parsed ToUnicode CMap (reference: src/tounicode.rs:11-18)."""

    __slots__ = ("char_map", "ranges", "code_byte_length")

    def __init__(self) -> None:
        self.char_map: dict[int, str] = {}
        self.ranges: list[tuple[int, int, int]] = []
        self.code_byte_length: int = 2

    # -- parsing ---------------------------------------------------------

    @classmethod
    def parse(cls, content: bytes) -> "ToUnicodeCMap | None":
        text = content.decode("utf-8", errors="replace")
        cmap = cls()
        src_hex_lengths: list[int] = []

        codespace_byte_len: int | None = None
        cs_start = text.find("begincodespacerange")
        if cs_start != -1:
            section_start = cs_start + len("begincodespacerange")
            cs_end = text.find("endcodespacerange", section_start)
            if cs_end != -1:
                for m in _HEX_RE.finditer(text[section_start:cs_end]):
                    hex_digits = re.sub(r"\s", "", m.group(1))
                    if hex_digits:
                        codespace_byte_len = (len(hex_digits) + 1) // 2

        pos = 0
        while True:
            start = text.find("beginbfchar", pos)
            if start == -1:
                break
            section_start = start + len("beginbfchar")
            end = text.find("endbfchar", section_start)
            if end == -1:
                break
            cmap._parse_bfchar(text[section_start:end], src_hex_lengths)
            pos = end

        pos = 0
        while True:
            start = text.find("beginbfrange", pos)
            if start == -1:
                break
            section_start = start + len("beginbfrange")
            end = text.find("endbfrange", section_start)
            if end == -1:
                break
            cmap._parse_bfrange(text[section_start:end], src_hex_lengths)
            pos = end

        if not cmap.char_map and not cmap.ranges:
            return None

        if codespace_byte_len is not None:
            if (codespace_byte_len == 2 and src_hex_lengths
                    and all(l <= 2 for l in src_hex_lengths)):
                cmap.code_byte_length = 1
            else:
                cmap.code_byte_length = codespace_byte_len
        elif src_hex_lengths:
            cmap.code_byte_length = 1 if max(src_hex_lengths) <= 2 else 2
        else:
            cmap.code_byte_length = 2

        return cmap

    def _parse_bfchar(self, section: str, src_hex_lengths: list[int]) -> None:
        toks = _tokenize_hex_and_brackets(section)
        i = 0
        while i < len(toks):
            if toks[i][0] != "hex":
                break
            src_hex = toks[i][1]
            if src_hex.strip():
                src_hex_lengths.append(len(src_hex.strip()))
            i += 1
            if i >= len(toks) or toks[i][0] != "hex":
                continue
            dst_hex = toks[i][1]
            i += 1
            src = _parse_hex_u16(src_hex)
            dst = _hex_to_unicode_string(dst_hex)
            if src is not None and dst is not None:
                self.char_map[src] = dst

    def _parse_bfrange(self, section: str, src_hex_lengths: list[int]) -> None:
        toks = _tokenize_hex_and_brackets(section)
        i = 0
        n = len(toks)
        while i < n:
            if toks[i][0] != "hex":
                i += 1
                continue
            start_hex = toks[i][1]
            if start_hex.strip():
                src_hex_lengths.append(len(start_hex.strip()))
            i += 1
            if i >= n or toks[i][0] != "hex":
                continue
            end_hex = toks[i][1]
            i += 1
            if i >= n:
                break
            if toks[i][0] == "hex":
                base_hex = toks[i][1]
                i += 1
                start = _parse_hex_u16(start_hex)
                end = _parse_hex_u16(end_hex)
                base = _parse_hex_u32(base_hex)
                if start is not None and end is not None and base is not None:
                    self.ranges.append((start, end, base))
            elif toks[i][0] == "[":
                i += 1
                start = _parse_hex_u16(start_hex)
                end = _parse_hex_u16(end_hex)
                if start is None or end is None:
                    # skip to closing bracket
                    while i < n and toks[i][0] != "]":
                        i += 1
                    if i < n:
                        i += 1
                    continue
                cid = start
                while i < n and toks[i][0] != "]":
                    if toks[i][0] == "hex":
                        s = _hex_to_unicode_string(toks[i][1])
                        if s is not None:
                            self.char_map[cid] = s
                        if cid >= end:
                            # consume the rest of the array
                            while i < n and toks[i][0] != "]":
                                i += 1
                            break
                        cid += 1
                    i += 1
                if i < n and toks[i][0] == "]":
                    i += 1

    # -- lookup / decode -------------------------------------------------

    def lookup(self, cid: int) -> str | None:
        """CID → Unicode string (src/tounicode.rs:305-323)."""
        s = self.char_map.get(cid)
        if s is not None:
            return s
        for start, end, base in self.ranges:
            if start <= cid <= end:
                cp = base + (cid - start)
                if 0 <= cp <= 0x10FFFF and not 0xD800 <= cp <= 0xDFFF:
                    return chr(cp)
        return None

    def decode_cids(self, data: bytes) -> str:
        """Decode a byte string honoring code width (src/tounicode.rs:326-374)."""
        out: list[str] = []
        unmapped = 0
        if self.code_byte_length == 1:
            for b in data:
                s = self.lookup(b)
                if s is not None:
                    out.append(s)
                else:
                    if b >= 0x20:
                        out.append(chr(b))
                    unmapped += 1
            total = len(data)
        else:
            for j in range(0, len(data) - 1, 2):
                cid = (data[j] << 8) | data[j + 1]
                s = self.lookup(cid)
                if s is not None:
                    out.append(s)
                else:
                    unmapped += 1
            total = len(data) // 2
        if total > 0 and unmapped > total // 2:
            return ""
        return "".join(out)


def _tokenize_hex_and_brackets(section: str) -> list[tuple[str, str]]:
    """Tokenize a CMap section into ('hex', digits), ('[', ''), (']', '')."""
    toks: list[tuple[str, str]] = []
    i = 0
    n = len(section)
    while i < n:
        c = section[i]
        if c == "<":
            j = section.find(">", i + 1)
            if j == -1:
                break
            toks.append(("hex", section[i + 1:j]))
            i = j + 1
        elif c == "[":
            toks.append(("[", ""))
            i += 1
        elif c == "]":
            toks.append(("]", ""))
            i += 1
        else:
            i += 1
    return toks


# -- raw-byte stream extraction (linearized-PDF safe) ---------------------

def extract_stream_from_raw_pdf(pdf: bytes, obj_num: int) -> bytes | None:
    """Extract object ``obj_num``'s stream payload straight from raw bytes
    (src/tounicode.rs:413-466); decompresses when /Filter mentions
    FlateDecode, returns raw data when inflate fails."""
    pattern = f"{obj_num} 0 obj".encode()
    obj_start = pdf.find(pattern)
    if obj_start == -1:
        return None
    search_start = obj_start + len(pattern)
    kw = pdf.find(b"stream", search_start)
    if kw == -1:
        return None
    content_start = kw + 6
    if pdf[content_start:content_start + 1] == b"\r":
        content_start += 1
    if pdf[content_start:content_start + 1] == b"\n":
        content_start += 1
    stream_end = pdf.find(b"endstream", content_start)
    if stream_end == -1:
        return None
    actual_end = stream_end
    if actual_end > content_start and pdf[actual_end - 1:actual_end] == b"\n":
        actual_end -= 1
    if actual_end > content_start and pdf[actual_end - 1:actual_end] == b"\r":
        actual_end -= 1
    data = pdf[content_start:actual_end]
    dict_region = pdf[obj_start:kw + 6]
    if b"FlateDecode" in dict_region:
        try:
            return zlib.decompress(data)
        except zlib.error:
            return data
    return data


_TOUNICODE_REF_RE = re.compile(rb"/ToUnicode[\s\r\n]*(\d+)")


def extract_tounicode_cmaps(pdf: bytes) -> dict[int, ToUnicodeCMap]:
    """All ToUnicode CMaps keyed by object number (src/tounicode.rs:477-514)."""
    cmaps: dict[int, ToUnicodeCMap] = {}
    for m in _TOUNICODE_REF_RE.finditer(pdf):
        obj_num = int(m.group(1))
        if obj_num in cmaps:
            continue
        data = extract_stream_from_raw_pdf(pdf, obj_num)
        if data is None:
            continue
        cmap = ToUnicodeCMap.parse(data)
        if cmap is not None:
            cmaps[obj_num] = cmap
    return cmaps


_BASEFONT_RE = re.compile(rb"/BaseFont[\s\r\n]*/([^\s/<>\[\]]+)")
_TOUNICODE_IN_DICT_RE = re.compile(rb"/ToUnicode[\s\r\n]*(\d+)")


class FontCMaps:
    """Font name / object number → ToUnicodeCMap (src/tounicode.rs:518-623)."""

    def __init__(self) -> None:
        self.by_name: dict[str, ToUnicodeCMap] = {}
        self.by_obj_num: dict[int, ToUnicodeCMap] = {}

    @classmethod
    def from_pdf_bytes(cls, pdf: bytes) -> "FontCMaps":
        self = cls()
        self.by_obj_num = extract_tounicode_cmaps(pdf)

        # Scan font dictionaries: "/Type /Font … /BaseFont /Name … /ToUnicode N 0 R"
        pos = 0
        while True:
            idx = pdf.find(b"/Type /Font", pos)
            if idx == -1:
                break
            dict_start = pdf.rfind(b"<<", 0, idx)
            dict_end = pdf.find(b">>", idx)
            if dict_start != -1 and dict_end != -1:
                region = pdf[dict_start:dict_end + 2]
                bm = _BASEFONT_RE.search(region)
                tm = _TOUNICODE_IN_DICT_RE.search(region)
                if bm and tm:
                    font_name = bm.group(1).decode("latin-1")
                    obj_num = int(tm.group(1))
                    cmap = self.by_obj_num.get(obj_num)
                    if cmap is not None:
                        # Unique key handles multiple fonts with one BaseFont;
                        # bare name kept for fallback (last one wins).
                        self.by_name[f"{font_name}_{obj_num}"] = cmap
                        self.by_name[font_name] = cmap
            pos = idx + len(b"/Type /Font")
        return self

    def get(self, font_name: str) -> ToUnicodeCMap | None:
        """Exact, then fuzzy F-prefix-stripped contains match for names of
        length ≥4 (src/tounicode.rs:588-607). Python dicts are
        insertion-ordered, so the fuzzy fallback is deterministic here
        (the reference iterates a HashMap — order undefined)."""
        cmap = self.by_name.get(font_name)
        if cmap is not None:
            return cmap
        stripped = font_name[1:] if font_name.startswith("F") else font_name
        if len(stripped) >= 4:
            for name, cmap in self.by_name.items():
                if stripped in name or name in stripped:
                    return cmap
        return None

    def get_by_obj(self, obj_num: int) -> ToUnicodeCMap | None:
        return self.by_obj_num.get(obj_num)

    def get_with_obj(self, font_name: str, obj_num: int) -> ToUnicodeCMap | None:
        cmap = self.by_name.get(f"{font_name}_{obj_num}")
        if cmap is not None:
            return cmap
        return self.by_obj_num.get(obj_num)
