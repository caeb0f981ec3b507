"""Table region detection and markdown-table formatting.

Behavioral parity with the reference table detector (reference:
src/tables.rs). Two passes — small-font (≤0.90×base) and body-font
(0.85–1.05×base, stricter structural criteria) — followed by eight
validations; all thresholds ported verbatim (citations inline).
"""

from __future__ import annotations

from collections import Counter

from .extractor import TextItem

MODE_SMALL_FONT = "small_font"
MODE_BODY_FONT = "body_font"


class Table:
    __slots__ = ("columns", "rows", "cells", "item_indices")

    def __init__(self, columns: list[float], rows: list[float],
                 cells: list[list[str]], item_indices: list[int]) -> None:
        self.columns = columns
        self.rows = rows
        self.cells = cells
        self.item_indices = item_indices


def detect_tables(items: list[TextItem], base_font_size: float) -> list[Table]:
    """Two-pass detection with claimed-index exclusion (src/tables.rs:30-109)."""
    if len(items) < 6:
        return []
    tables: list[Table] = []
    claimed: set[int] = set()

    # Pass 1: small-font tables
    table_font_threshold = base_font_size * 0.90
    candidates = [(i, it) for i, it in enumerate(items)
                  if 6.0 <= it.font_size <= table_font_threshold]
    if len(candidates) >= 6:
        for y_min, y_max in find_table_regions(candidates):
            region = [(i, it) for i, it in candidates if y_min <= it.y <= y_max]
            if len(region) < 6:
                continue
            t = detect_table_in_region(region, MODE_SMALL_FONT)
            if t is not None:
                claimed.update(t.item_indices)
                tables.append(t)

    # Pass 2: body-font tables (stricter)
    lo = base_font_size * 0.85
    hi = base_font_size * 1.05
    body = [(i, it) for i, it in enumerate(items)
            if i not in claimed and lo <= it.font_size <= hi and it.font_size >= 6.0]
    if len(body) >= 9:
        for y_min, y_max in find_table_regions_strict(body):
            region = [(i, it) for i, it in body if y_min <= it.y <= y_max]
            if len(region) < 9:
                continue
            t = detect_table_in_region(region, MODE_BODY_FONT)
            if t is not None:
                tables.append(t)

    return tables


def find_table_regions(items: list[tuple[int, TextItem]]) -> list[tuple[float, float]]:
    """1-D Y-clustering: gap 30pt, ≥4 items, ±5pt padding
    (src/tables.rs:112-149)."""
    if not items:
        return []
    ys = sorted(it.y for _, it in items)
    regions: list[tuple[float, float]] = []
    gap_threshold = 30.0
    region_start = region_end = ys[0]
    count = 1
    for y in ys[1:]:
        if y - region_end > gap_threshold:
            if count >= 4:
                regions.append((region_start - 5.0, region_end + 5.0))
            region_start = region_end = y
            count = 1
        else:
            region_end = y
            count += 1
    if count >= 4:
        regions.append((region_start - 5.0, region_end + 5.0))
    return regions


def _count_near(a: list[float], b: list[float], tol: float) -> int:
    """|{x in a : exists y in b with |x-y| < tol}| for ascending lists."""
    count = 0
    j = 0
    nb = len(b)
    for x in a:
        while j < nb and b[j] <= x - tol:
            j += 1
        if j < nb and abs(x - b[j]) < tol:
            count += 1
    return count


def find_table_regions_strict(items: list[tuple[int, TextItem]]) -> list[tuple[float, float]]:
    """Row groups ±8pt → ≥3 X-clusters (20pt) → runs ≤25pt gap → pairwise
    column-alignment score ≥0.5 at 10pt tolerance (src/tables.rs:155-271)."""
    if not items:
        return []
    row_groups: list[tuple[float, list[float]]] = []
    for _, item in items:
        for center, xs in row_groups:
            if abs(item.y - center) < 8.0:
                xs.append(item.x)
                break
        else:
            row_groups.append((item.y, [item.x]))

    qualifying: list[tuple[float, list[float]]] = []
    for y, xs in row_groups:
        sorted_xs = sorted(xs)
        if not sorted_xs:
            continue
        cluster_starts = [sorted_xs[0]]
        last_x = sorted_xs[0]
        for x in sorted_xs[1:]:
            if x - last_x > 20.0:
                cluster_starts.append(x)
                last_x = x
        if len(cluster_starts) >= 3:
            qualifying.append((y, cluster_starts))

    if len(qualifying) < 3:
        return []
    qualifying.sort(key=lambda r: r[0])

    candidate_regions: list[list[tuple[float, list[float]]]] = []
    current = [qualifying[0]]
    for row in qualifying[1:]:
        if row[0] - current[-1][0] > 25.0:
            if len(current) >= 3:
                candidate_regions.append(current)
            current = [row]
        else:
            current.append(row)
    if len(current) >= 3:
        candidate_regions.append(current)

    regions: list[tuple[float, float]] = []
    tolerance = 10.0
    for region_rows in candidate_regions:
        total_score = 0.0
        pair_count = 0
        n = len(region_rows)
        for i in range(n):
            for j in range(i + 1, n):
                a = region_rows[i][1]
                b = region_rows[j][1]
                # Two-pointer near-match count over the (already sorted
                # ascending) cluster-start lists — same result as the
                # quadratic any() scan (equivalence-fuzzed in
                # tests/test_kernels.py), linear in |a|+|b|.
                matches_a = _count_near(a, b, tolerance)
                matches_b = _count_near(b, a, tolerance)
                max_len = max(len(a), len(b))
                if max_len > 0:
                    total_score += (matches_a + matches_b) / (2 * max_len)
                    pair_count += 1
        avg = total_score / pair_count if pair_count else 0.0
        if avg >= 0.5:
            regions.append((region_rows[0][0] - 5.0, region_rows[-1][0] + 5.0))
    return regions


def detect_table_in_region(items: list[tuple[int, TextItem]], mode: str) -> Table | None:
    """Grid build + 8 validations (src/tables.rs:274-426)."""
    columns = find_column_boundaries(items, mode)
    min_cols = 2 if mode == MODE_SMALL_FONT else 3
    if len(columns) < min_cols or len(columns) > 15:
        return None
    rows = find_row_boundaries(items)
    min_rows = 2 if mode == MODE_SMALL_FONT else 3
    if len(rows) < min_rows:
        return None
    min_alignment = 0.5 if mode == MODE_SMALL_FONT else 0.7
    if check_column_alignment(items, columns, mode) < min_alignment:
        return None

    cell_items: list[list[list[TextItem]]] = [
        [[] for _ in columns] for _ in rows]
    item_indices: list[int] = []
    for idx, item in items:
        col = find_column_index(columns, item.x)
        row = find_row_index(rows, item.y)
        if col is not None and row is not None:
            cell_items[row][col].append(item)
            item_indices.append(idx)

    first_table_row, excluded = find_first_table_row(cell_items, rows, items)
    item_indices = [i for i in item_indices if i not in excluded]
    if first_table_row > 0:
        rows = rows[first_table_row:]
        cell_items = cell_items[first_table_row:]

    cells: list[list[str]] = []
    for row_items in cell_items:
        row_cells = []
        for col_items in row_items:
            col_items.sort(key=lambda it: it.x)
            row_cells.append(join_cell_items(col_items))
        cells.append(row_cells)

    # V1: most rows have first-column content (src/tables.rs:355-358)
    if sum(1 for row in cells if row[0]) < len(rows) // 2:
        return None
    # V2: multi-column fill (src/tables.rs:361-370)
    multi = sum(1 for row in cells if sum(1 for c in row if c) >= 2)
    threshold = max(len(rows) // 3, 1) if mode == MODE_SMALL_FONT else max(len(rows) // 2, 1)
    if multi < threshold:
        return None
    # V3: ≤200 rows (src/tables.rs:374-379)
    if len(rows) > 200:
        return None
    # V4: avg filled cells (src/tables.rs:383-393)
    total_filled = sum(sum(1 for c in row if c) for row in cells)
    avg = total_filled / len(rows) if rows else 0.0
    if avg < (1.5 if mode == MODE_SMALL_FONT else 2.5):
        return None
    # V5: key-value layout (src/tables.rs:398-400)
    if is_key_value_layout(cells):
        return None
    # V6: consistent columns (src/tables.rs:404-406)
    if not has_consistent_columns(cells):
        return None
    # V7: table-like content (src/tables.rs:410-412)
    if not has_table_like_content(cells, mode):
        return None
    # V8: not a TOC (src/tables.rs:415-418)
    if is_table_of_contents(cells):
        return None

    return Table(columns, rows, cells, item_indices)


def is_key_value_layout(cells: list[list[str]]) -> bool:
    """>70% rows ≤2 filled cols, >50% label-like first col, ≤6 cols
    (src/tables.rs:429-468)."""
    if not cells:
        return False
    num_cols = len(cells[0])
    label_like = 0
    two_or_less = 0
    for row in cells:
        filled = sum(1 for c in row if c)
        if filled <= 2:
            two_or_less += 1
        first = row[0].strip() if row else ""
        if first.endswith(":") or (
                len(first) > 3 and all(c.isupper() or c.isspace() or c in "()" for c in first)):
            label_like += 1
    n = len(cells)
    return two_or_less / n > 0.7 and label_like / n > 0.5 and num_cols <= 6


def has_consistent_columns(cells: list[list[str]]) -> bool:
    """≥40% rows within ±2 of modal filled-count (src/tables.rs:471-501)."""
    if len(cells) < 3:
        return True
    filled = [sum(1 for c in row if c) for row in cells]
    most_common = Counter(filled).most_common(1)[0][0]
    consistent = sum(1 for c in filled
                     if max(most_common - 2, 0) <= c <= most_common + 2)
    return consistent / len(cells) > 0.4


def has_table_like_content(cells: list[list[str]], mode: str) -> bool:
    """Data-like fraction > 0.2/0.3; SmallFont ≥5-col bypass
    (src/tables.rs:504-538)."""
    data_like = 0
    total = 0
    for row in cells[1:]:  # skip header
        for cell in row:
            t = cell.strip()
            if t:
                total += 1
                if looks_like_table_data(t):
                    data_like += 1
    if total == 0:
        return False
    pct = data_like / total
    num_cols = len(cells[0]) if cells else 0
    min_pct = 0.2 if mode == MODE_SMALL_FONT else 0.3
    return pct > min_pct or (mode == MODE_SMALL_FONT and num_cols >= 5)


def looks_like_table_data(s: str) -> bool:
    """Numbers / dates / part numbers / units / packages / temp ranges
    (src/tables.rs:542-601)."""
    s = s.strip()
    if not s:
        return False
    if looks_like_number(s):
        return True
    digit_count = sum(1 for c in s if c.isascii() and c.isdigit())
    if (len(s) <= 10 and digit_count >= 4 and ("/" in s or "-" in s)
            and all((c.isascii() and c.isdigit()) or c in "/-" for c in s)):
        return True
    if (len(s) <= 10 and s.isalnum()
            and any(c.isascii() and c.isdigit() for c in s)):
        return True
    has_number = any(c.isascii() and c.isdigit() for c in s)
    has_unit = ("°" in s or "V" in s or "A" in s or "Hz" in s or "mA" in s
                or "µ" in s or "pin" in s or "MHz" in s or "kHz" in s)
    if has_number and has_unit:
        return True
    if "(" in s and ")" in s and has_number:
        return True
    if ("°C" in s or "°F" in s) and "to" in s:
        return True
    return False


def looks_like_number(s: str) -> bool:
    """Digits with . , - + only (src/tables.rs:604-614)."""
    s = s.strip()
    if not s:
        return False
    return (all((c.isascii() and c.isdigit()) or c in ".,-+" for c in s)
            and any(c.isascii() and c.isdigit() for c in s))


def is_table_of_contents(cells: list[list[str]]) -> bool:
    """Dot-leader cells >15% or (>5% dots & >15% page-number cells)
    (src/tables.rs:618-664)."""
    if not cells:
        return False
    dot_cells = 0
    page_num_cells = 0
    total = 0
    for row in cells:
        for cell in row:
            t = cell.strip()
            if not t:
                continue
            total += 1
            dots = t.count(".")
            if dots > len(t) // 2 and dots >= 3:
                dot_cells += 1
            digits_only = "".join(c for c in t if not c.isspace())
            if (0 < len(digits_only) <= 4
                    and all(c.isascii() and c.isdigit() for c in digits_only)):
                page_num_cells += 1
    if total == 0:
        return False
    dot_ratio = dot_cells / total
    page_ratio = page_num_cells / total
    return dot_ratio > 0.15 or (dot_ratio > 0.05 and page_ratio > 0.15)


def check_column_alignment(items: list[tuple[int, TextItem]],
                           columns: list[float], mode: str) -> float:
    """Fraction of items within 40/30pt of a column (src/tables.rs:667-682)."""
    tolerance = 40.0 if mode == MODE_SMALL_FONT else 30.0
    aligned = sum(1 for _, it in items
                  if any(abs(it.x - col) < tolerance for col in columns))
    return aligned / len(items) if items else 0.0


def find_column_boundaries(items: list[tuple[int, TextItem]], mode: str) -> list[float]:
    """X clustering with adaptive threshold clamp(avg_gap, 25, 50) and the
    BodyFont anti-paragraph rule (src/tables.rs:685-755)."""
    xs = sorted(it.x for _, it in items)
    if not xs:
        return []
    x_range = xs[-1] - xs[0]
    avg_gap = x_range / (len(xs) - 1) if len(xs) > 1 else 60.0
    cluster_threshold = min(max(avg_gap, 25.0), 50.0)

    columns: list[float] = []
    cluster: list[float] = [xs[0]]
    for x in xs[1:]:
        center = sum(cluster) / len(cluster)
        if x - center > cluster_threshold:
            columns.append(center)
            cluster = [x]
        else:
            cluster.append(x)
    if cluster:
        columns.append(sum(cluster) / len(cluster))

    min_items_per_col = max(len(items) // max(len(columns), 1) // 4, 2)
    columns = [col for col in columns
               if sum(1 for _, it in items if abs(it.x - col) < cluster_threshold)
               >= min_items_per_col]

    if mode == MODE_BODY_FONT:
        total = len(items)
        for col in columns:
            count = sum(1 for _, it in items if abs(it.x - col) < cluster_threshold)
            if count / total > 0.60:
                return []
    return columns


def find_row_boundaries(items: list[tuple[int, TextItem]]) -> list[float]:
    """Y-desc clustering, threshold max(0.8×median_font, 4.0)
    (src/tables.rs:758-795)."""
    ys = sorted((it.y for _, it in items), reverse=True)
    if not ys:
        return []
    font_sizes = sorted(it.font_size for _, it in items)
    median_font = font_sizes[len(font_sizes) // 2]
    cluster_threshold = max(median_font * 0.8, 4.0)
    rows: list[float] = []
    cluster: list[float] = [ys[0]]
    for y in ys[1:]:
        center = sum(cluster) / len(cluster)
        if center - y >= cluster_threshold:
            rows.append(center)
            cluster = [y]
        else:
            cluster.append(y)
    if cluster:
        rows.append(sum(cluster) / len(cluster))
    return rows


def find_column_index(columns: list[float], x: float) -> int | None:
    """Nearest centroid within clamp(min_gap/2, 25, 50) (src/tables.rs:798-821)."""
    if not columns:
        return None
    if len(columns) >= 2:
        min_gap = min(abs(b - a) for a, b in zip(columns, columns[1:]))
        threshold = min(max(min_gap / 2.0, 25.0), 50.0)
    else:
        threshold = 50.0
    idx = min(range(len(columns)), key=lambda i: abs(x - columns[i]))
    return idx if abs(x - columns[idx]) < threshold else None


def find_row_index(rows: list[float], y: float) -> int | None:
    """Nearest centroid within 15pt (src/tables.rs:824-836)."""
    if not rows:
        return None
    idx = min(range(len(rows)), key=lambda i: abs(y - rows[i]))
    return idx if abs(y - rows[idx]) < 15.0 else None


def join_cell_items(items: list[TextItem]) -> str:
    """X-sorted join with hyphen + sub/superscript awareness
    (src/tables.rs:840-884)."""
    result = ""
    for i, item in enumerate(items):
        text = item.text.strip()
        if not text:
            continue
        if not result:
            result = text
            continue
        prev_item = items[i - 1]
        prev_ends_with_hyphen = result.endswith("-")
        curr_is_hyphen = text == "-"
        curr_starts_with_hyphen = text.startswith("-")
        font_ratio = item.font_size / prev_item.font_size if prev_item.font_size else 1.0
        reverse_ratio = prev_item.font_size / item.font_size if item.font_size else 1.0
        y_diff = abs(item.y - prev_item.y)
        is_sub_super = font_ratio < 0.85 and y_diff > 1.0
        was_sub_super = reverse_ratio < 0.85 and y_diff > 1.0
        if (prev_ends_with_hyphen or curr_is_hyphen or curr_starts_with_hyphen
                or is_sub_super or was_sub_super):
            result += text
        else:
            result += " " + text
    return result


def table_to_markdown(table: Table) -> str:
    """Width-aligned pipes + separator + footnotes (src/tables.rs:887-943)."""
    if not table.cells or not table.cells[0]:
        return ""
    cleaned, footnotes = clean_table_cells(table.cells)
    if not cleaned:
        return ""
    num_cols = len(cleaned[0])
    col_widths = [max(3, max((len(row[c]) if c < len(row) else 0) for row in cleaned))
                  for c in range(num_cols)]
    out: list[str] = []
    for row_idx, row in enumerate(cleaned):
        parts = ["|"]
        for col_idx, cell in enumerate(row):
            parts.append(f" {cell:<{col_widths[col_idx]}} |")
        out.append("".join(parts))
        if row_idx == 0:
            sep = ["|"]
            for w in col_widths:
                sep.append(f" {'-' * w} |")
            out.append("".join(sep))
    result = "\n".join(out) + "\n"
    if footnotes:
        result += "\n" + "".join(f + "\n" for f in footnotes)
    return result


def clean_table_cells(cells: list[list[str]]) -> tuple[list[list[str]], list[str]]:
    """Drop empty rows, extract footnotes, merge continuation rows
    (src/tables.rs:946-995)."""
    cleaned: list[list[str]] = []
    footnotes: list[str] = []
    for row in cells:
        if all(not c.strip() for c in row):
            continue
        first = row[0].strip() if row else ""
        if is_footnote_row(first):
            footnotes.append(" ".join(c.strip() for c in row if c.strip()))
            continue
        is_continuation = (not first and any(c.strip() for c in row[1:]) and cleaned)
        if is_continuation:
            prev = cleaned[-1]
            for col_idx, cell in enumerate(row):
                t = cell.strip()
                if t and col_idx < len(prev):
                    if prev[col_idx]:
                        prev[col_idx] += " "
                    prev[col_idx] += t
        else:
            cleaned.append([c.strip() for c in row])
    return cleaned, footnotes


def find_first_table_row(cell_items: list[list[list[TextItem]]], rows: list[float],
                         original_items: list[tuple[int, TextItem]]
                         ) -> tuple[int, set[int]]:
    """Skip leading form-metadata rows before the real header
    (src/tables.rs:999-1115)."""
    excluded: set[int] = set()
    cells = [[join_cell_items(col) for col in row] for row in cell_items]
    if not cells:
        return 0, excluded

    total_cols = len(cells[0])
    first_table_row = 0

    def has_form(row: list[str]) -> bool:
        for c in row:
            t = c.strip()
            if not t:
                continue
            if (t.endswith(":") and len(t) > 1) or (": " in t and not looks_like_number(t)):
                return True
        return False

    for row_idx, row in enumerate(cells):
        filled = [c for c in row if c.strip()]
        fill_ratio = len(filled) / total_cols if total_cols else 0.0
        if has_form(row):
            continue
        numeric_count = sum(1 for c in filled if looks_like_number(c.strip()))
        if numeric_count >= 2:
            first_table_row = row_idx
            break
        if fill_ratio >= 0.4:
            first_table_row = row_idx
            break
        if fill_ratio < 0.3:
            continue
        if row_idx + 1 < len(cells):
            nxt = cells[row_idx + 1]
            nxt_filled = sum(1 for c in nxt if c.strip())
            nxt_ratio = nxt_filled / total_cols if total_cols else 0.0
            nxt_numeric = sum(1 for c in nxt if looks_like_number(c.strip()))
            if (nxt_ratio >= 0.4 or nxt_numeric >= 2) and not has_form(nxt):
                first_table_row = row_idx
                break

    if first_table_row > 0:
        y_tolerance = 15.0
        for idx, item in original_items:
            for row_y in rows[:first_table_row]:
                if abs(item.y - row_y) < y_tolerance:
                    excluded.add(idx)
                    break
    return first_table_row, excluded


def is_footnote_row(text: str) -> bool:
    """``(1)``, ``1)``, ``Note:``/``Notes:`` prefixes (src/tables.rs:1118-1150)."""
    t = text.strip()
    if t.startswith("(") and len(t) >= 2:
        inside = t[1:]
        close = inside.find(")")
        if close != -1:
            num = inside[:close]
            if num and all(c.isascii() and c.isdigit() for c in num):
                return True
    if len(t) >= 2:
        paren = t.find(")")
        if paren > 0:
            num = t[:paren]
            if all(c.isascii() and c.isdigit() for c in num):
                return True
    lower = t.lower()
    return lower.startswith("note:") or lower.startswith("notes:")
