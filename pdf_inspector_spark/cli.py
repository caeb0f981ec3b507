"""CLI parity with the reference binaries (reference: src/bin/pdf2md.rs,
src/bin/detect_pdf.rs): single-document inspection without Spark.

    python -m pdf_inspector_spark.cli detect <file.pdf> [--json]
    python -m pdf_inspector_spark.cli pdf2md <file.pdf> [--json|--text]

Exit codes mirror the reference: 0 success, 2 scanned-needs-OCR
(src/bin/pdf2md.rs exit-code contract), 1 error.
"""

from __future__ import annotations

import json
import sys
import time


def _read(path: str) -> bytes | None:
    try:
        with open(path, "rb") as f:
            return f.read()
    except OSError as exc:
        print(f"error: cannot read {path}: {exc.strerror}", file=sys.stderr)
        return None


def _detect(path: str, as_json: bool) -> int:
    from .kernels.pipeline import classify_mem
    t0 = time.monotonic()
    buf = _read(path)
    if buf is None:
        return 1
    r = classify_mem(buf)
    r["detection_time_ms"] = int((time.monotonic() - t0) * 1000)
    if r["error_kind"]:
        print(json.dumps(r) if as_json else f"error: {r['error_msg']}",
              file=sys.stderr)
        return 1
    if as_json:
        print(json.dumps({k: r[k] for k in (
            "pdf_type", "page_count", "pages_sampled", "pages_with_text",
            "confidence", "title", "ocr_recommended", "detection_time_ms")}))
    else:
        print(f"type: {r['pdf_type']} (confidence {r['confidence']:.2f})")
        print(f"pages: {r['page_count']} (sampled {r['pages_sampled']}, "
              f"with text {r['pages_with_text']})")
        if r["title"]:
            print(f"title: {r['title']}")
        print(f"ocr recommended: {r['ocr_recommended']}")
    return 0


def _pdf2md(path: str, mode: str, out_file: str | None = None) -> int:
    """--json (reference key set) / --raw (markdown only, no headers —
    the reference's flag, src/bin/pdf2md.rs "Raw output - just the
    markdown") / --text (our extension: plain extracted text); optional
    output file like the reference's pdf2md."""
    from .kernels.pipeline import process_pdf_mem
    buf = _read(path)
    if buf is None:
        return 1
    r = process_pdf_mem(buf)
    if r["error_kind"]:
        print(f"error: {r['error_msg']}", file=sys.stderr)
        return 1
    if r["pdf_type"] in ("scanned", "image_based"):
        # --json still reports the result row (the reference prints JSON
        # before the exit-code check too); other modes error to stderr.
        if mode != "--json":
            print(f"PDF is {r['pdf_type']}; OCR required", file=sys.stderr)
            return 2
    if mode == "--json":
        # Key set mirrors src/bin/pdf2md.rs JSON output exactly.
        out = json.dumps({
            "pdf_type": r["pdf_type"],
            "page_count": r["page_count"],
            "has_text": r["text"] is not None,
            "processing_time_ms": r["processing_time_ms"],
            # UTF-8 BYTE length: the reference emits markdown.len(), and
            # Rust String::len() counts bytes, not code points — the two
            # diverge for any non-ASCII markdown.
            "markdown_length": len((r["markdown"] or "").encode("utf-8")),
            "markdown": r["markdown"] or "",
        }) + "\n"
    elif mode == "--raw":
        out = r["markdown"] or ""
    elif mode == "--text":
        out = (r["text"] or "") + "\n"
    else:
        out = r["markdown"] or ""
    if out_file:
        with open(out_file, "w", encoding="utf-8") as f:
            f.write(out)
        print(f"wrote {out_file}", file=sys.stderr)
    else:
        print(out, end="")
    return 0


def _debug_items(path: str, mode: str) -> int:
    """Debug-bin parity (reference: src/bin/debug_pages.rs, debug_order.rs,
    debug_ygaps.rs, debug_ligatures.rs): dump positioned items / lines /
    Y-gaps for layout debugging."""
    from .kernels.extractor import extract_text_with_positions_mem, group_into_lines
    buf = _read(path)
    if buf is None:
        return 1
    try:
        items = extract_text_with_positions_mem(buf)
    except Exception as exc:  # noqa: BLE001
        print(f"error: {exc}", file=sys.stderr)
        return 1
    if mode == "--lines":
        for line in group_into_lines([i for i in items if i.item_type == "text"]):
            print(f"p{line.page} y={line.y:8.2f}  {line.text()}")
    elif mode == "--ygaps":
        lines = group_into_lines([i for i in items if i.item_type == "text"])
        prev = None
        for line in lines:
            gap = (f"{prev[1] - line.y:8.2f}"
                   if prev and prev[0] == line.page else "   start")
            print(f"p{line.page} y={line.y:8.2f} gap={gap}  {line.text()[:60]}")
            prev = (line.page, line.y)
    else:
        for i in items:
            print(f"p{i.page} ({i.x:7.2f},{i.y:7.2f}) w={i.width:6.2f} "
                  f"fs={i.font_size:5.2f} {i.font:8s} "
                  f"{'B' if i.is_bold else ' '}{'I' if i.is_italic else ' '} "
                  f"{i.item_type:5s} {i.text[:50]!r}")
    return 0


def main(argv: list[str]) -> int:
    if len(argv) < 2:
        print(__doc__, file=sys.stderr)
        return 1
    cmd, path = argv[0], argv[1]
    flag = argv[2] if len(argv) > 2 else ""
    if cmd == "detect":
        return _detect(path, flag == "--json")
    if cmd == "pdf2md":
        flags = [a for a in argv[2:] if a.startswith("--")]
        positional = [a for a in argv[2:] if not a.startswith("--")]
        return _pdf2md(path, flags[0] if flags else "",
                       positional[0] if positional else None)
    if cmd == "debug":
        return _debug_items(path, flag)
    print(f"unknown command: {cmd}", file=sys.stderr)
    return 1


if __name__ == "__main__":
    try:
        sys.exit(main(sys.argv[1:]))
    except BrokenPipeError:  # e.g. `| head` closed the pipe
        os_devnull = open("/dev/null", "w")
        sys.stdout = os_devnull
        sys.exit(0)
