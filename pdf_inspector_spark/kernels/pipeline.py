"""Top-level per-document pipeline: detect → route → extract → structure.

Behavioral parity with the reference orchestration (reference:
src/lib.rs:42-133). Errors never raise past this layer — they become
error fields on the result row so the Spark pipeline can route failed
rows to a quarantine sink (src/lib.rs:135-145 → error-as-row contract).
"""

from __future__ import annotations

import hashlib
import time
from collections import OrderedDict

from .detector import (DetectionConfig, PDF_TYPE_IMAGE, PDF_TYPE_MIXED,
                       PDF_TYPE_SCANNED, PDF_TYPE_TEXT, detect_pdf_type_mem)
from .extractor import (ITEM_TEXT, TextItem, extract_text_with_positions_mem,
                        group_into_lines)
from .markdown import MarkdownOptions, to_markdown_from_items

# Content-addressed result LRU (per process / per executor). In transcript
# corpora the same attachment recurs across turns and conversations
# (re-sent PDFs, standard forms, template documents), so keying the
# per-document result on sha256(payload)+length converts every repeat
# into a dict copy. sha256 (not md5): chosen-prefix md5 collisions are
# practical and colliding PDF pairs are published on the web, so an
# md5-keyed cache would return one crawled document's extraction for
# another; the digest cost is negligible next to the parse it avoids.
# Bounded; the kernel is pure, so a hit is byte-identical to a
# recompute. Disable with process_pdf_mem(..., use_cache=False) — the
# perf harness does, to measure the raw kernel.
_CACHE_MAX = 4096
_result_cache: OrderedDict[tuple, dict] = OrderedDict()


def classify_mem(buf: bytes, config: DetectionConfig = DetectionConfig()) -> dict:
    """Classification stage with error-as-row semantics."""
    try:
        result = detect_pdf_type_mem(buf, config)
        result["error_kind"] = None
        result["error_msg"] = None
        return result
    except Exception as exc:  # noqa: BLE001 — quarantine channel, never raise
        return {
            "pdf_type": None, "page_count": 0, "pages_sampled": 0,
            "pages_with_text": 0, "confidence": 0.0, "title": None,
            "ocr_recommended": False,
            "error_kind": type(exc).__name__, "error_msg": str(exc)[:500],
        }


def items_to_text_and_spans(items: list[TextItem], return_lines: bool = False):
    """Reading-order line texts joined with ``\\n`` + span offsets.

    The per-turn ``text`` is the byte-equality contract target (reference
    entry point 3: src/extractor.rs:854-861 + group_into_lines :2223).

    With ``return_lines=True`` also returns ``(source_items, lines)`` so
    the markdown stage can reuse the grouping instead of re-deriving it
    (to_markdown_from_items accepts it as ``precomputed_lines`` and
    only uses it when its own input is the identical item list — i.e.
    no table items were carved out).
    """
    src = [i for i in items if i.item_type == ITEM_TEXT]
    lines = group_into_lines(src)
    parts: list[str] = []
    spans: list[dict] = []
    offset = 0
    for line in lines:
        t = line.text()
        if parts:
            offset += 1  # the joining "\n"
        start = offset
        offset += len(t)
        parts.append(t)
        first = line.items[0] if line.items else None
        spans.append({
            "start": start, "end": offset, "page": line.page,
            "x": first.x if first else 0.0,
            "y": line.y,
            "font_size": first.font_size if first else 0.0,
        })
    if return_lines:
        return "\n".join(parts), spans, (src, lines)
    return "\n".join(parts), spans


def extract_turn_text(buf: bytes) -> dict:
    """Extraction stage: positioned items → text + spans, error-as-row."""
    try:
        items = extract_text_with_positions_mem(buf)
    except Exception as exc:  # noqa: BLE001
        return {"text": None, "spans": [], "n_items": 0,
                "error_kind": type(exc).__name__, "error_msg": str(exc)[:500]}
    text, spans = items_to_text_and_spans(items)
    return {"text": text, "spans": spans, "n_items": len(items),
            "error_kind": None, "error_msg": None}


def process_pdf_mem(buf: bytes,
                    config: DetectionConfig | None = None,
                    options: MarkdownOptions | None = None,
                    with_markdown: bool = True,
                    use_cache: bool = True) -> dict:
    """Full pipeline (src/lib.rs:91-133): detect → route by type →
    extract+markdown (TextBased), early-exit (Scanned/ImageBased), or
    best-effort extract (Mixed, failures tolerated).

    The document is parsed ONCE and shared between the detect and extract
    stages (the reference re-loads per stage, src/lib.rs:46+51; at
    100 TB the duplicate parse dominates, so we hoist it).

    Results are memoized on sha256(buf)+len (see _result_cache above).
    Only the default config/options are cached; custom configs bypass."""
    cacheable = use_cache and options is None and config is None
    if config is None:
        config = _DEFAULT_CONFIG
    if cacheable:
        key = (hashlib.sha256(buf).digest(), len(buf), with_markdown)
        hit = _result_cache.get(key)
        if hit is not None:
            _result_cache.move_to_end(key)
            return dict(hit)
    r = _process_pdf_mem_uncached(buf, config, options, with_markdown)
    if cacheable:
        _result_cache[key] = dict(r)
        if len(_result_cache) > _CACHE_MAX:
            _result_cache.popitem(last=False)
    return r


_DEFAULT_CONFIG = DetectionConfig()


def _process_pdf_mem_uncached(buf: bytes,
                              config: DetectionConfig,
                              options: MarkdownOptions | None,
                              with_markdown: bool) -> dict:
    from .detector import detect_from_document
    from .extractor import extract_positioned_text_from_doc
    from .pdfobj import Document
    from .tounicode import FontCMaps

    start = time.monotonic()
    text = None
    spans: list[dict] = []
    markdown = None

    try:
        doc = Document.load_mem(buf)
        detection = detect_from_document(doc, doc.page_count(), config)
        detection["error_kind"] = None
        detection["error_msg"] = None
    except Exception as exc:  # noqa: BLE001
        doc = None
        detection = {
            "pdf_type": None, "page_count": 0, "pages_sampled": 0,
            "pages_with_text": 0, "confidence": 0.0, "title": None,
            "ocr_recommended": False,
            "error_kind": type(exc).__name__, "error_msg": str(exc)[:500],
        }
    pdf_type = detection["pdf_type"]
    error_kind = detection["error_kind"]
    error_msg = detection["error_msg"]

    if doc is not None and pdf_type in (PDF_TYPE_TEXT, PDF_TYPE_MIXED):
        try:
            font_cmaps = FontCMaps.from_pdf_bytes(buf)
            items = extract_positioned_text_from_doc(doc, font_cmaps)
        except Exception as exc:  # noqa: BLE001
            items = None
            if pdf_type == PDF_TYPE_TEXT:
                # Mixed tolerates extraction failure (src/lib.rs:72-84);
                # TextBased reports it.
                error_kind, error_msg = type(exc).__name__, str(exc)[:500]
        if items is not None:
            text, spans, pre_lines = items_to_text_and_spans(
                items, return_lines=True)
            if with_markdown:
                try:
                    markdown = to_markdown_from_items(
                        items, options, precomputed_lines=pre_lines)
                except Exception as exc:  # noqa: BLE001
                    if pdf_type == PDF_TYPE_TEXT:
                        error_kind, error_msg = type(exc).__name__, str(exc)[:500]
    # Scanned/ImageBased: early exit — flagged for OCR (src/lib.rs:62-71)

    return {
        "pdf_type": pdf_type,
        "page_count": detection["page_count"],
        "confidence": detection["confidence"],
        "ocr_recommended": detection["ocr_recommended"],
        "title": detection["title"],
        "text": text,
        "spans": spans,
        "markdown": markdown,
        "error_kind": error_kind,
        "error_msg": error_msg,
        "processing_time_ms": int((time.monotonic() - start) * 1000),
    }
