"""Scanned-vs-text PDF classification.

Behavioral parity with the reference detector (reference: src/detector.rs):
page sampling plan (first + last + evenly spaced, :117-142), per-page
text-operator byte scan (:283-320), image-XObject coverage with the
500k-pixel template threshold (:328-399, :331), and the classification
decision tree with its confidence constants (:187-211).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from .pdfobj import Document, Stream

PDF_TYPE_TEXT = "text_based"
PDF_TYPE_SCANNED = "scanned"
PDF_TYPE_IMAGE = "image_based"
PDF_TYPE_MIXED = "mixed"

TEMPLATE_IMAGE_THRESHOLD = 500_000  # pixels (src/detector.rs:331)


@dataclass(frozen=True)
class DetectionConfig:
    """Defaults per src/detector.rs:55-63."""
    max_pages_to_sample: int = 5
    min_text_ops_per_page: int = 3
    text_page_ratio_threshold: float = 0.6


# "T" followed by "j"/"J" followed by whitespace-or-end counts as a text op;
# "Do" followed by whitespace-or-end flags an XObject placement
# (src/detector.rs:283-320). Vectorizable as a regex over the whole stream.
_TEXT_OP_RE = re.compile(rb"T[jJ](?=[\x00\t\n\x0b\x0c\r ]|$)")
_DO_OP_RE = re.compile(rb"Do(?=[\x00\t\n\x0b\x0c\r ]|$)")


def scan_content_for_text_operators(content: bytes) -> tuple[int, bool]:
    """Count Tj/TJ operators and detect Do (src/detector.rs:283-320)."""
    return len(_TEXT_OP_RE.findall(content)), _DO_OP_RE.search(content) is not None


def sample_page_indices(total_pages: int, pages_to_sample: int) -> list[int]:
    """First + last + evenly distributed page numbers, 1-indexed, sorted,
    deduped (src/detector.rs:117-142)."""
    if pages_to_sample >= total_pages:
        return list(range(1, total_pages + 1))
    indices = [1]
    if pages_to_sample > 1:
        indices.append(total_pages)
    remaining = max(pages_to_sample - 2, 0)
    if remaining > 0 and total_pages > 2:
        step = (total_pages - 2) // (remaining + 1)
        for i in range(1, remaining + 1):
            idx = 1 + step * i
            if 1 < idx < total_pages and idx not in indices:
                indices.append(idx)
    return sorted(set(indices))


def _analyze_page_images(doc: Document, page_obj_num: int) -> tuple[bool, int, bool]:
    """(has_images, total_area, has_template_image) per src/detector.rs:328-399."""
    has_images = False
    total_area = 0
    has_template = False
    res = doc.get_page_resources(page_obj_num)
    if res:
        xdict = doc.get_dict(res.get("XObject"))
        if xdict:
            for _, ref in xdict.items():
                obj = doc.resolve(ref)
                if isinstance(obj, Stream) and obj.dict.get("Subtype") == "Image":
                    has_images = True
                    w = obj.dict.get("Width") or 0
                    h = obj.dict.get("Height") or 0
                    if isinstance(w, (int, float)) and isinstance(h, (int, float)):
                        area = int(w) * int(h)
                        total_area += area
                        if area >= TEMPLATE_IMAGE_THRESHOLD:
                            has_template = True
    return has_images, total_area, has_template


def _analyze_page_content(doc: Document, page_obj_num: int) -> tuple[int, bool, bool]:
    """(text_ops, has_images, has_template_image) per src/detector.rs:239-274."""
    text_ops = 0
    has_images = False
    for stream in doc.get_page_content_streams(page_obj_num):
        content = stream.decompressed()
        ops, imgs = scan_content_for_text_operators(content)
        text_ops += ops
        has_images = has_images or imgs
    found, _area, has_template = _analyze_page_images(doc, page_obj_num)
    if found:
        has_images = True
    return text_ops, has_images, has_template


def get_document_title(doc: Document) -> str | None:
    """Trailer → Info → Title; UTF-16BE BOM else UTF-8-lossy
    (src/detector.rs:402-422)."""
    info = doc.get_dict(doc.trailer.get("Info"))
    if not info:
        return None
    title = doc.resolve(info.get("Title"))
    if not isinstance(title, bytes):
        return None
    if len(title) >= 2 and title[0] == 0xFE and title[1] == 0xFF:
        return title[2:].decode("utf-16-be", errors="replace")
    return title.decode("utf-8", errors="replace")


def detect_from_document(doc: Document, page_count: int,
                         config: DetectionConfig = DetectionConfig()) -> dict:
    """Classification decision tree (src/detector.rs:105-225).

    Returns the PdfTypeResult fields as a plain dict (struct column shape).
    """
    pages = doc.get_pages()
    total_pages = len(pages)
    pages_to_sample = min(config.max_pages_to_sample, total_pages)
    sample = sample_page_indices(total_pages, pages_to_sample) if total_pages else []

    pages_with_text = 0
    pages_with_images = 0
    pages_with_template = 0
    total_text_ops = 0
    for page_num in sample:
        obj_num = pages.get(page_num)
        if obj_num is None:
            continue
        text_ops, has_images, has_template = _analyze_page_content(doc, obj_num)
        if text_ops >= config.min_text_ops_per_page:
            pages_with_text += 1
        if has_images:
            pages_with_images += 1
        if has_template:
            pages_with_template += 1
        total_text_ops += text_ops

    pages_sampled = len(sample)
    text_ratio = pages_with_text / pages_sampled if pages_sampled else 0.0
    has_template_images = pages_with_template > 0
    template_ratio = pages_with_template / pages_sampled if pages_sampled else 0.0

    if has_template_images and pages_with_text > 0:
        ocr = True
        pdf_type, confidence = PDF_TYPE_MIXED, 0.5 + 0.3 * (1.0 - template_ratio)
    elif text_ratio >= config.text_page_ratio_threshold:
        ocr = False
        pdf_type, confidence = PDF_TYPE_TEXT, text_ratio
    elif pages_with_text == 0 and pages_with_images > 0:
        ocr = True
        if total_text_ops == 0:
            pdf_type, confidence = PDF_TYPE_SCANNED, 0.95
        else:
            pdf_type, confidence = PDF_TYPE_IMAGE, 0.8
    elif pages_with_text > 0 and pages_with_images > 0:
        ocr = True
        pdf_type, confidence = PDF_TYPE_MIXED, 0.7
    elif total_text_ops == 0:
        ocr = True
        pdf_type, confidence = PDF_TYPE_SCANNED, 0.9
    else:
        ocr = False
        pdf_type, confidence = PDF_TYPE_TEXT, max(text_ratio, 0.5)

    return {
        "pdf_type": pdf_type,
        "page_count": page_count,
        "pages_sampled": pages_sampled,
        "pages_with_text": pages_with_text,
        "confidence": float(confidence),
        "title": get_document_title(doc),
        "ocr_recommended": ocr,
    }


def detect_pdf_type_mem(buf: bytes,
                        config: DetectionConfig = DetectionConfig()) -> dict:
    """Detect from a memory buffer (src/detector.rs:86-102)."""
    doc = Document.load_mem(buf)
    return detect_from_document(doc, doc.page_count(), config)
