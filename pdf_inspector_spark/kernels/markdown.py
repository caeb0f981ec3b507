"""Markdown structuring: headers, lists, code, captions, tables, images,
post-processing cleanup.

Behavioral parity with the reference markdown emitter (reference:
src/markdown.rs). The line-by-line state machine, heading-tier discovery,
paragraph-threshold computation and the clean-up regex passes are ported
with constants intact (citations inline).
"""

from __future__ import annotations

import re
from collections import Counter

from .extractor import (ITEM_IMAGE, ITEM_LINK, ITEM_TEXT, TextItem, TextLine,
                        group_into_lines, is_bold_font, is_italic_font)
from .tables import detect_tables, table_to_markdown


class MarkdownOptions:
    """Defaults per src/markdown.rs:41-57."""
    __slots__ = ("detect_headers", "detect_lists", "detect_code",
                 "base_font_size", "remove_page_numbers", "format_urls",
                 "fix_hyphenation", "detect_bold", "detect_italic",
                 "include_images", "include_links")

    def __init__(self, detect_headers: bool = True, detect_lists: bool = True,
                 detect_code: bool = True, base_font_size: float | None = None,
                 remove_page_numbers: bool = True, format_urls: bool = True,
                 fix_hyphenation: bool = True, detect_bold: bool = True,
                 detect_italic: bool = True, include_images: bool = True,
                 include_links: bool = True) -> None:
        self.detect_headers = detect_headers
        self.detect_lists = detect_lists
        self.detect_code = detect_code
        self.base_font_size = base_font_size
        self.remove_page_numbers = remove_page_numbers
        self.format_urls = format_urls
        self.fix_hyphenation = fix_hyphenation
        self.detect_bold = detect_bold
        self.detect_italic = detect_italic
        self.include_images = include_images
        self.include_links = include_links


# -- font stats (src/markdown.rs:242-259, 1029-1055) -----------------------

def calculate_font_stats_from_items(items: list[TextItem]) -> float:
    counts: Counter[int] = Counter()
    for item in items:
        if item.font_size >= 9.0:
            counts[int(item.font_size * 10.0)] += 1
    if not counts:
        return 12.0
    best = max(counts.items(), key=lambda kv: kv[1])[0]
    return best / 10.0


def calculate_font_stats(lines: list[TextLine]) -> float:
    counts: Counter[int] = Counter()
    for line in lines:
        if line.items and line.items[0].font_size >= 9.0:
            counts[int(line.items[0].font_size * 10.0)] += 1
    if not counts:
        return 12.0
    best = max(counts.items(), key=lambda kv: kv[1])[0]
    return best / 10.0


# -- thresholds & tiers (src/markdown.rs:1065-1170) ------------------------

def compute_paragraph_threshold(lines: list[TextLine], base_size: float) -> float:
    """max(1.3×median same-page gap, 1.5×base); fallback 1.8×base; needs
    ≥5 gaps (src/markdown.rs:1065-1101)."""
    fallback = base_size * 1.8
    gaps: list[float] = []
    prev: tuple[int, float] | None = None
    for line in lines:
        if prev is not None and line.page == prev[0]:
            gap = prev[1] - line.y
            if 0.0 < gap < base_size * 10.0:
                gaps.append(gap)
        prev = (line.page, line.y)
    if len(gaps) < 5:
        return fallback
    gaps.sort()
    median = gaps[len(gaps) // 2]
    return max(median * 1.3, base_size * 1.5)


def compute_heading_tiers(lines: list[TextLine], base_size: float) -> list[float]:
    """Sizes ≥1.2×base, desc-sorted, 0.5pt clustering, ≤4 tiers
    (src/markdown.rs:1106-1132)."""
    sizes = [line.items[0].font_size for line in lines
             if line.items and line.items[0].font_size / base_size >= 1.2]
    sizes.sort(reverse=True)
    tiers: list[float] = []
    for size in sizes:
        if not any(abs(t - size) < 0.5 for t in tiers):
            tiers.append(size)
    return tiers[:4]


def detect_header_level(font_size: float, base_size: float,
                        heading_tiers: list[float]) -> int | None:
    """Tier match ±0.5pt → H(tier+1); ratio fallback (src/markdown.rs:1137-1170)."""
    ratio = font_size / base_size if base_size else 0.0
    if ratio < 1.2:
        return None
    if heading_tiers:
        for i, tier_size in enumerate(heading_tiers):
            if abs(font_size - tier_size) < 0.5:
                return i + 1
        if ratio >= 1.5:
            return min(len(heading_tiers) + 1, 4)
        return None
    if ratio >= 2.0:
        return 1
    if ratio >= 1.5:
        return 2
    if ratio >= 1.25:
        return 3
    return 4


# -- line classifiers (src/markdown.rs:1173-1350) --------------------------

_CAPTION_PREFIXES = (
    "Figure ", "Figura ", "Fig. ", "Fig ", "Table ", "Tabela ", "Source:",
    "Fonte:", "Source ", "Fonte ", "Note:", "Nota:", "Chart ", "Gráfico ",
    "Graph ", "Diagram ", "Image ", "Imagem ", "Photo ", "Foto ",
)


_LIST_NUM_RE = re.compile(r"[0-9]+[.)]")
_SPECIAL_DELETE = str.maketrans("", "", "{}()[];=<>")


def is_caption_line(text: str) -> bool:
    t = text.strip()
    if t.startswith(_CAPTION_PREFIXES):
        return True
    lower = t.lower()
    return (lower.startswith("figure ") or lower.startswith("table ")
            or lower.startswith("source:"))


def is_list_item(text: str) -> bool:
    """Bullets, ``1.``/``1)``, ``a.``/``a)``/``(a)`` (src/markdown.rs:1217-1255)."""
    t = text.lstrip()
    if t.startswith(("• ", "- ", "* ", "○ ", "● ", "◦ ")):
        return True
    # == "first '.'/')' in t[:5] is preceded by 1+ ASCII digits only"
    # ([0-9] == isascii+isdigit; single C-level match replaces the
    # any/next/all genexpr chain that was a markdown-stage hotspot, r5)
    if _LIST_NUM_RE.match(t[:5]):
        return True
    if len(t) >= 2:
        first, second = t[0], t[1]
        if first.isascii() and first.isalpha() and second in ".)":
            return True
        if first == "(" and len(t) >= 3 and t[2] == ")":
            return True
    return False


def format_list_item(text: str) -> str:
    """Bullets normalized to ``-`` (src/markdown.rs:1258-1275)."""
    t = text.lstrip()
    for bullet in "•○●◦":
        if t.startswith(bullet):
            return "- " + t[len(bullet):].lstrip()
    if t.startswith("- ") or t.startswith("* "):
        return t
    return t


_CODE_PATTERNS = ("import ", "export ", "from ", "const ", "let ", "var ",
                  "function ", "class ", "def ", "pub fn ", "fn ", "async fn ",
                  "impl ", "=> ", "-> ", ":: ", ":= ")


def is_code_like(text: str) -> bool:
    """Keyword prefixes, ≥3 special chars <200 len, trailing ``;{}``
    (src/markdown.rs:1278-1327)."""
    t = text.strip()
    if t.startswith(_CODE_PATTERNS):
        return True
    # C-level count via delete-translate (== sum of c in "{}()[];=<>")
    special = len(t) - len(t.translate(_SPECIAL_DELETE))
    if special >= 3 and len(t) < 200:
        return True
    return t.endswith((";", "{", "}"))


_MONO_PATTERNS = ("courier", "consolas", "monaco", "menlo", "mono", "fixed",
                  "terminal", "typewriter", "source code", "fira code",
                  "jetbrains", "inconsolata", "dejavu sans mono",
                  "liberation mono")


_MONO_MEMO: dict[str, bool] = {}


def is_monospace_font(font_name: str) -> bool:
    # Pure predicate over the font name; names repeat per line item, so a
    # bounded memo removes the 14-substring scan from the per-item path.
    hit = _MONO_MEMO.get(font_name)
    if hit is None:
        lower = font_name.lower()
        hit = any(p in lower for p in _MONO_PATTERNS)
        if len(_MONO_MEMO) < 4096:
            _MONO_MEMO[font_name] = hit
    return hit


# -- structural merges (src/markdown.rs:901-1027) --------------------------

def merge_heading_lines(lines: list[TextLine], base_size: float,
                        heading_tiers: list[float]) -> list[TextLine]:
    """Merge consecutive same-tier same-page headings with 0<Δy<2×fs
    (src/markdown.rs:901-948)."""
    result: list[TextLine] = []
    for line in lines:
        line_font = line.items[0].font_size if line.items else base_size
        line_level = detect_header_level(line_font, base_size, heading_tiers)
        should_merge = False
        if result and line_level is not None:
            prev = result[-1]
            prev_font = prev.items[0].font_size if prev.items else base_size
            prev_level = detect_header_level(prev_font, base_size, heading_tiers)
            y_gap = prev.y - line.y
            should_merge = (prev.page == line.page and prev_level == line_level
                            and 0.0 < y_gap < line_font * 2.0)
        if should_merge:
            prev = result[-1]
            if line.items:
                first = line.items[0]
                space_item = TextItem(" " + first.text.lstrip(), first.x, first.y,
                                      first.width, first.height, first.font,
                                      first.font_size, first.page, first.is_bold,
                                      first.is_italic, first.item_type, first.link)
                prev.items.append(space_item)
                prev.items.extend(line.items[1:])
        else:
            result.append(line)
    return result


def merge_drop_caps(lines: list[TextLine], base_size: float) -> list[TextLine]:
    """Single uppercase ≥2.5×base merged into first lowercase-starting
    paragraph-start line (src/markdown.rs:950-1027)."""
    result: list[TextLine] = []
    for line in lines:
        trimmed = line.text().strip()
        is_drop_cap = (len(trimmed) <= 2 and line.items
                       and line.items[0].font_size >= base_size * 2.5
                       and trimmed[:1].isupper())
        if is_drop_cap:
            drop_char = trimmed[0]
            target_idx = None
            for idx, prev_line in enumerate(result):
                if prev_line.page != line.page:
                    continue
                prev_trimmed = prev_line.text().strip()
                if prev_trimmed[:1].islower():
                    if idx == 0:
                        is_para_start = True
                    else:
                        before = result[idx - 1].text().strip()
                        is_para_start = not before[:1].islower() if before else True
                    if is_para_start:
                        target_idx = idx
                        break
            if target_idx is not None and result[target_idx].items:
                first = result[target_idx].items[0]
                first.text = drop_char + first.text.strip()
                result[target_idx].invalidate()  # in-place item mutation
            continue
        result.append(line)
    return result


# -- continuation tables (src/markdown.rs:261-381) -------------------------

def count_table_columns(table_md: str) -> int:
    lines = table_md.split("\n")
    if len(lines) >= 2 and "---" in lines[1]:
        pipes = lines[1].count("|")
        return pipes - 1 if pipes >= 2 else 0
    return 0


def merge_continuation_tables(page_tables: dict[int, list[tuple[float, str]]],
                              table_only_pages: set[int]) -> None:
    """Consecutive table-only pages, one table each, equal col counts →
    strip header+separator, append rows (src/markdown.rs:267-368)."""
    sorted_pages = sorted(page_tables.keys())
    if len(sorted_pages) < 2:
        return
    i = 0
    while i < len(sorted_pages):
        first_page = sorted_pages[i]
        first_tables = page_tables.get(first_page)
        if not first_tables or len(first_tables) != 1 or first_page not in table_only_pages:
            i += 1
            continue
        first_cols = count_table_columns(first_tables[0][1])
        if first_cols == 0:
            i += 1
            continue
        continuation: list[int] = []
        j = i + 1
        while j < len(sorted_pages):
            next_page = sorted_pages[j]
            prev_page = continuation[-1] if continuation else first_page
            if next_page != prev_page + 1 or next_page not in table_only_pages:
                break
            next_tables = page_tables.get(next_page)
            if not next_tables or len(next_tables) != 1:
                break
            if count_table_columns(next_tables[0][1]) != first_cols:
                break
            continuation.append(next_page)
            j += 1
        if continuation:
            extra_rows = []
            for p in continuation:
                for line_idx, line in enumerate(page_tables[p][0][1].split("\n")):
                    if line_idx >= 2 and line:
                        extra_rows.append(line + "\n")
            y, md = page_tables[first_page][0]
            page_tables[first_page][0] = (y, md + "".join(extra_rows))
            for p in continuation:
                del page_tables[p]
            i = j
        else:
            i += 1


# -- main emitters (src/markdown.rs:116-713) -------------------------------

def to_markdown_from_items(items: list[TextItem],
                           options: MarkdownOptions | None = None,
                           precomputed_lines=None) -> str:
    """Structure stage entry point (src/markdown.rs:116-239).

    ``precomputed_lines`` is an optional ``(source_items, lines)`` pair
    from items_to_text_and_spans(return_lines=True): when no table items
    are carved out, the markdown stage's grouping input is the identical
    item list the text stage already grouped, so the pipeline passes the
    result through instead of re-deriving it (~2x group_into_lines work
    per document otherwise). Used only when the source lists match
    element-for-element; callers outside the pipeline just omit it."""
    if options is None:
        options = MarkdownOptions()
    if not items:
        return ""

    images: list[TextItem] = []
    links: list[TextItem] = []
    text_items: list[TextItem] = []
    for item in items:
        if item.item_type == ITEM_IMAGE:
            if options.include_images:
                images.append(item)
        elif item.item_type == ITEM_LINK:
            if options.include_links:
                links.append(item)
        else:
            text_items.append(item)

    base_size = options.base_font_size or calculate_font_stats_from_items(text_items)

    table_item_idx: set[int] = set()
    page_tables: dict[int, list[tuple[float, str]]] = {}
    page_images: dict[int, list[tuple[float, str]]] = {}

    for img in images:
        name = img.text
        if name.startswith("[Image: ") and name.endswith("]"):
            name = name[len("[Image: "):-1]
        page_images.setdefault(img.page, []).append(
            (img.y, f"![Image: {name}](image)\n"))

    # O(n) page pre-grouping (src/markdown.rs:177-184)
    page_groups: dict[int, list[tuple[int, TextItem]]] = {}
    for global_idx, item in enumerate(text_items):
        page_groups.setdefault(item.page, []).append((global_idx, item))

    for page in sorted(page_groups):
        group = page_groups[page]
        page_items = [it for _, it in group]
        for table in detect_tables(page_items, base_size):
            for idx in table.item_indices:
                if idx < len(group):
                    table_item_idx.add(group[idx][0])
            table_y = table.rows[0] if table.rows else 0.0
            page_tables.setdefault(page, []).append((table_y, table_to_markdown(table)))

    non_table_items = [item for idx, item in enumerate(text_items)
                       if idx not in table_item_idx]

    pages_with_text = {i.page for i in non_table_items}
    table_only_pages = {p for p in page_tables if p not in pages_with_text}
    merge_continuation_tables(page_tables, table_only_pages)

    lines = None
    if precomputed_lines is not None and not table_item_idx:
        src, pre = precomputed_lines
        # identity comparison per element (TextItem defines no __eq__):
        # reuse is valid only for the exact objects the text stage grouped
        if src == non_table_items:
            lines = pre
    if lines is None:
        lines = group_into_lines(non_table_items)
    return _to_markdown_from_lines(lines, options, page_tables, page_images)


def to_markdown_from_lines(lines: list[TextLine],
                           options: MarkdownOptions | None = None) -> str:
    """Emitter without tables/images (src/markdown.rs:716-890)."""
    if options is None:
        options = MarkdownOptions()
    return _to_markdown_from_lines(lines, options, {}, {})


def _flush_page(page: int, page_tables, page_images, inserted_tables,
                inserted_images, out: list[str], state: dict) -> None:
    """src/markdown.rs:384-421."""
    for idx, (_, table_md) in enumerate(page_tables.get(page, [])):
        if (page, idx) not in inserted_tables:
            if state["in_paragraph"]:
                out.append("\n\n")
                state["in_paragraph"] = False
            out.append("\n")
            out.append(table_md)
            out.append("\n")
            inserted_tables.add((page, idx))
    for idx, (_, image_md) in enumerate(page_images.get(page, [])):
        if (page, idx) not in inserted_images:
            if state["in_paragraph"]:
                out.append("\n\n")
                state["in_paragraph"] = False
            out.append("\n")
            out.append(image_md)
            out.append("\n")
            inserted_images.add((page, idx))


def _to_markdown_from_lines(lines: list[TextLine], options: MarkdownOptions,
                            page_tables: dict[int, list[tuple[float, str]]],
                            page_images: dict[int, list[tuple[float, str]]]) -> str:
    """Main state machine (src/markdown.rs:424-713)."""
    if not lines and not page_tables and not page_images:
        return ""

    base_size = options.base_font_size or calculate_font_stats(lines)
    lines = merge_drop_caps(lines, base_size)
    heading_tiers = compute_heading_tiers(lines, base_size)
    lines = merge_heading_lines(lines, base_size, heading_tiers)
    para_threshold = compute_paragraph_threshold(lines, base_size)

    out: list[str] = []
    state = {"in_paragraph": False}
    current_page = 0
    prev_y = float("inf")
    in_list = False
    last_list_x: float | None = None
    inserted_tables: set[tuple[int, int]] = set()
    inserted_images: set[tuple[int, int]] = set()

    all_content_pages = sorted(set(page_tables) | set(page_images))

    def output_endswith(s: str) -> bool:
        joined_tail = "".join(out[-3:])
        return joined_tail.endswith(s)

    for line in lines:
        if line.page != current_page:
            if current_page > 0:
                _flush_page(current_page, page_tables, page_images,
                            inserted_tables, inserted_images, out, state)
                if state["in_paragraph"]:
                    out.append("\n\n")
                    state["in_paragraph"] = False
                out.append("\n\n")
            for p in all_content_pages:
                if p <= current_page:
                    continue
                if p >= line.page:
                    break
                _flush_page(p, page_tables, page_images, inserted_tables,
                            inserted_images, out, state)
                if state["in_paragraph"]:
                    out.append("\n\n")
                    state["in_paragraph"] = False
                out.append("\n\n")
            current_page = line.page
            prev_y = float("inf")

        for idx, (table_y, table_md) in enumerate(page_tables.get(current_page, [])):
            if table_y > line.y and (current_page, idx) not in inserted_tables:
                if state["in_paragraph"]:
                    out.append("\n\n")
                    state["in_paragraph"] = False
                out.append("\n")
                out.append(table_md)
                out.append("\n")
                inserted_tables.add((current_page, idx))

        for idx, (image_y, image_md) in enumerate(page_images.get(current_page, [])):
            if image_y > line.y and (current_page, idx) not in inserted_images:
                if state["in_paragraph"]:
                    out.append("\n\n")
                    state["in_paragraph"] = False
                out.append("\n")
                out.append(image_md)
                out.append("\n")
                inserted_images.add((current_page, idx))

        y_gap = prev_y - line.y
        if y_gap > para_threshold and state["in_paragraph"]:
            out.append("\n\n")
            state["in_paragraph"] = False
        prev_y = line.y

        text = line.text_with_formatting(options.detect_bold, options.detect_italic)
        trimmed = text.strip()
        plain_trimmed = line.text().strip()
        if not trimmed:
            continue

        if is_caption_line(plain_trimmed):
            if state["in_paragraph"]:
                out.append("\n\n")
                state["in_paragraph"] = False
            out.append(trimmed)
            out.append("\n\n")
            continue

        if (options.detect_headers and len(plain_trimmed) > 3
                and len(plain_trimmed.split()) <= 15):
            line_font_size = line.items[0].font_size if line.items else base_size
            header_level = detect_header_level(line_font_size, base_size, heading_tiers)
            if header_level is not None:
                if state["in_paragraph"]:
                    out.append("\n\n")
                    state["in_paragraph"] = False
                out.append("#" * header_level + " " + plain_trimmed + "\n\n")
                in_list = False
                continue

        if options.detect_lists and is_list_item(plain_trimmed):
            if state["in_paragraph"]:
                out.append("\n\n")
                state["in_paragraph"] = False
            out.append(format_list_item(trimmed))
            out.append("\n")
            in_list = True
            last_list_x = line.items[0].x if line.items else None
            continue
        elif in_list:
            line_x = line.items[0].x if line.items else None
            is_continuation = False
            if last_list_x is not None and line_x is not None:
                x_ok = last_list_x - 5.0 <= line_x <= last_list_x + 50.0
                y_ok = y_gap < base_size * 7.0
                is_continuation = x_ok and y_ok and not is_list_item(plain_trimmed)
            if is_continuation:
                if output_endswith("\n"):
                    # replace trailing newline with a joining space
                    last = out.pop()
                    if last.endswith("\n"):
                        last = last[:-1] + " "
                    out.append(last)
                out.append(trimmed)
                out.append("\n")
                continue
            else:
                in_list = False
                last_list_x = None

        if options.detect_code:
            if any(is_monospace_font(i.font) for i in line.items):
                if state["in_paragraph"]:
                    out.append("\n\n")
                    state["in_paragraph"] = False
                out.append(f"```\n{plain_trimmed}\n```\n")
                continue

        if state["in_paragraph"]:
            out.append(" ")
        out.append(trimmed)
        state["in_paragraph"] = True

    _flush_page(current_page, page_tables, page_images, inserted_tables,
                inserted_images, out, state)
    for p in all_content_pages:
        if p <= current_page:
            continue
        _flush_page(p, page_tables, page_images, inserted_tables,
                    inserted_images, out, state)

    if state["in_paragraph"]:
        out.append("\n")

    return clean_markdown("".join(out), options)


# -- plain-text path (src/markdown.rs:60-113) ------------------------------

def to_markdown(text: str, options: MarkdownOptions | None = None) -> str:
    if options is None:
        options = MarkdownOptions()
    out: list[str] = []
    in_list = False
    in_code_block = False
    for line in text.split("\n"):
        trimmed = line.strip()
        if not trimmed:
            if in_list:
                in_list = False
            if in_code_block:
                out.append("```\n")
                in_code_block = False
            out.append("\n")
            continue
        if options.detect_lists and is_list_item(trimmed):
            out.append(format_list_item(trimmed) + "\n")
            in_list = True
            continue
        if options.detect_code and is_code_like(trimmed):
            if not in_code_block:
                out.append("```\n")
                in_code_block = True
            out.append(trimmed + "\n")
            continue
        elif in_code_block:
            out.append("```\n")
            in_code_block = False
        out.append(trimmed + "\n")
    if in_code_block:
        out.append("```\n")
    return "".join(out)


# -- post-processing (src/markdown.rs:1353-1620) ---------------------------

_DOT_LEADER_RE = re.compile(r"\.{4,}")
_LETTER = "a-zA-ZáàâãéèêíïóôõöúçñÁÀÂÃÉÈÊÍÏÓÔÕÖÚÇÑ"
_SPACED_HYPHEN_RE = re.compile(rf"([{_LETTER}]) - ([{_LETTER}])")
_URL_RE = re.compile(r"https?://[^\s<>\)\]]+[^\s<>\)\]\.\,;]")


def collapse_dot_leaders(text: str) -> str:
    return _DOT_LEADER_RE.sub(" ... ", text)


def fix_hyphenation(text: str) -> str:
    return _SPACED_HYPHEN_RE.sub(r"\1-\2", text)


def is_page_number_line(trimmed: str) -> bool:
    """Isolated digits, ``Page X of Y``, ``X of Y``, ``- X -``
    (src/markdown.rs:1452-1512)."""
    if not trimmed:
        return False
    if len(trimmed) <= 4 and all(c.isascii() and c.isdigit() for c in trimmed):
        return True
    lower = trimmed.lower()
    if lower.startswith("page"):
        rest = lower[4:].strip()
        if rest == "of" or rest.startswith("of "):
            return True
        if rest[:1].isdigit():
            return True
        if not rest or all(w == "of" or all(c.isascii() and c.isdigit() for c in w)
                           for w in rest.split()):
            return True
    of_idx = trimmed.find(" of ")
    if of_idx != -1:
        before = trimmed[:of_idx].strip()
        after = trimmed[of_idx + 4:].strip()
        if (before and after
                and all(c.isascii() and c.isdigit() for c in before)
                and all(c.isascii() and c.isdigit() for c in after)):
            return True
    if len(trimmed) >= 3 and trimmed.startswith("-") and trimmed.endswith("-"):
        inner = trimmed[1:-1].strip()
        if inner and all(c.isascii() and c.isdigit() for c in inner):
            return True
    return False


def remove_page_numbers(text: str) -> str:
    """Drop isolated page-number lines (src/markdown.rs:1414-1449)."""
    lines = text.split("\n")
    result: list[str] = []
    n = len(lines)
    for i, line in enumerate(lines):
        trimmed = line.strip()
        if is_page_number_line(trimmed):
            prev_is_break = i > 0 and lines[i - 1].strip() == "---"
            next_is_break = i + 1 < n and lines[i + 1].strip() == "---"
            prev_is_empty = i > 0 and not lines[i - 1].strip()
            next_is_empty = i + 1 < n and not lines[i + 1].strip()
            is_isolated = ((prev_is_break or prev_is_empty or i == 0)
                           and (next_is_break or next_is_empty or i + 1 == n))
            before_break = i + 1 < n and (
                lines[i + 1].strip() == "---"
                or (i + 2 < n and not lines[i + 1].strip()
                    and lines[i + 2].strip() == "---"))
            if is_isolated or before_break:
                continue
        result.append(line)
    return "\n".join(result)


def format_urls(text: str) -> str:
    """``https?://…`` → ``[url](url)`` unless already linked
    (src/markdown.rs:1515-1620)."""
    result: list[str] = []
    last_end = 0
    for m in _URL_RE.finditer(text):
        start = m.start()
        url = m.group(0)
        before = text[max(start - 2, 0):start]
        already_linked = before.endswith("](")
        prefix = text[:start]
        inside_link_text = prefix.count("[") > prefix.count("]")
        if already_linked or inside_link_text:
            result.append(text[last_end:m.end()])
        else:
            result.append(text[last_end:start])
            result.append(f"[{url}]({url})")
        last_end = m.end()
    result.append(text[last_end:])
    return "".join(result)


def clean_markdown(text: str, options: MarkdownOptions) -> str:
    """Cleanup pipeline (src/markdown.rs:1353-1382)."""
    text = collapse_dot_leaders(text)
    if options.fix_hyphenation:
        text = fix_hyphenation(text)
    if options.remove_page_numbers:
        text = remove_page_numbers(text)
    if options.format_urls:
        text = format_urls(text)
    while "\n\n\n" in text:
        text = text.replace("\n\n\n", "\n\n")
    return text.strip() + "\n"
