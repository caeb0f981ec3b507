"""Reference-compatible public API (drop-in surface).

Mirrors the reference crate's exports (reference: src/lib.rs:8-17 pub use
list) so a user of `pdf_inspector` can switch imports and keep their
call sites:

    from pdf_inspector_spark.compat import (
        process_pdf, process_pdf_mem, detect_pdf_type, extract_text,
        extract_text_with_positions, to_markdown, to_markdown_from_items,
        MarkdownOptions, DetectionConfig, PdfType, TextItem)

Differences from the reference (documented, deliberate):
- errors are raised as ``PdfError`` (ValueError subclass) instead of a
  Rust Result; the Spark pipeline path never raises (error-as-row).
- ``PdfProcessResult`` is a plain dict with the same field names.
"""

from __future__ import annotations

import time

from .kernels.detector import (DetectionConfig, detect_pdf_type_mem)
from .kernels.extractor import (TextItem, TextLine,
                                extract_text_mem,
                                extract_text_with_positions_mem,
                                group_into_lines)
from .kernels.markdown import (MarkdownOptions, to_markdown,
                               to_markdown_from_items, to_markdown_from_lines)
from .kernels.pipeline import process_pdf_mem as _process_pdf_mem

__all__ = [
    "DetectionConfig", "MarkdownOptions", "PdfError", "PdfType", "TextItem",
    "TextLine", "detect_pdf_type", "detect_pdf_type_mem", "extract_text",
    "extract_text_mem", "extract_text_with_positions",
    "extract_text_with_positions_mem", "group_into_lines", "process_pdf",
    "process_pdf_mem", "to_markdown", "to_markdown_from_items",
    "to_markdown_from_lines",
]


class PdfError(ValueError):
    """Parity with the reference's error enum (src/lib.rs:135-145)."""


class PdfType:
    """Classification constants (src/detector.rs:13-22)."""
    TEXT_BASED = "text_based"
    SCANNED = "scanned"
    IMAGE_BASED = "image_based"
    MIXED = "mixed"


def _read(path) -> bytes:
    try:
        with open(path, "rb") as f:
            return f.read()
    except OSError as exc:
        raise PdfError(f"IO error: {exc}") from exc


def detect_pdf_type(path, config: DetectionConfig = DetectionConfig()) -> dict:
    """Path-based detection (src/detector.rs:66-83)."""
    try:
        return detect_pdf_type_mem(_read(path), config)
    except PdfError:
        raise
    except Exception as exc:  # noqa: BLE001
        raise PdfError(str(exc)) from exc


def extract_text(path) -> str:
    """Plain-text extraction (src/extractor.rs:833-836)."""
    try:
        return extract_text_mem(_read(path))
    except PdfError:
        raise
    except Exception as exc:  # noqa: BLE001
        raise PdfError(str(exc)) from exc


def extract_text_with_positions(path) -> list[TextItem]:
    """Positioned extraction (src/extractor.rs:854-861)."""
    try:
        return extract_text_with_positions_mem(_read(path))
    except PdfError:
        raise
    except Exception as exc:  # noqa: BLE001
        raise PdfError(str(exc)) from exc


def process_pdf_mem(buffer: bytes) -> dict:
    """Full pipeline from memory (src/lib.rs:91-133). Raises PdfError on
    unparseable input; otherwise returns the result dict."""
    r = _process_pdf_mem(buffer)
    if r["pdf_type"] is None and r["error_kind"] is not None:
        raise PdfError(r["error_msg"] or r["error_kind"])
    return r


def process_pdf(path) -> dict:
    """Full pipeline from a file path (src/lib.rs:42-88)."""
    start = time.monotonic()
    r = process_pdf_mem(_read(path))
    r["processing_time_ms"] = int((time.monotonic() - start) * 1000)
    return r
