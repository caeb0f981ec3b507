"""The reference-compatible API surface (mirrors src/lib.rs pub uses):
every entry point a `pdf_inspector` user calls exists and behaves."""

import pytest

from pdf_inspector_spark import compat
from pdf_inspector_spark.corpus import corpus_payloads

PAYLOADS = corpus_payloads()


@pytest.fixture(scope="module")
def text_pdf(tmp_path_factory):
    p = tmp_path_factory.mktemp("pdfs") / "doc.pdf"
    p.write_bytes(PAYLOADS["tj_basic"])
    return str(p)


@pytest.fixture(scope="module")
def scanned_pdf(tmp_path_factory):
    p = tmp_path_factory.mktemp("pdfs") / "scan.pdf"
    p.write_bytes(PAYLOADS["scanned_only"])
    return str(p)


def test_exports_match_reference_surface():
    # src/lib.rs:15-17 pub use list + config/types
    for name in ("detect_pdf_type", "PdfType", "extract_text",
                 "extract_text_with_positions", "TextItem", "to_markdown",
                 "to_markdown_from_items", "MarkdownOptions", "process_pdf",
                 "process_pdf_mem", "DetectionConfig", "PdfError"):
        assert hasattr(compat, name), name


def test_process_pdf_path(text_pdf):
    r = compat.process_pdf(text_pdf)
    assert r["pdf_type"] == compat.PdfType.TEXT_BASED
    assert r["markdown"] and "Hello World" in r["markdown"]
    assert r["processing_time_ms"] >= 0


def test_process_pdf_scanned_early_exit(scanned_pdf):
    r = compat.process_pdf(scanned_pdf)
    assert r["pdf_type"] == compat.PdfType.SCANNED
    assert r["markdown"] is None and r["text"] is None
    assert r["ocr_recommended"] is True


def test_detect_and_extract_paths(text_pdf):
    d = compat.detect_pdf_type(text_pdf)
    assert d["pdf_type"] == compat.PdfType.TEXT_BASED
    items = compat.extract_text_with_positions(text_pdf)
    assert items and items[0].text == "Hello World"
    text = compat.extract_text(text_pdf)
    assert "Hello World" in text


def test_error_paths_raise_pdf_error(tmp_path):
    with pytest.raises(compat.PdfError):
        compat.process_pdf("/nonexistent/file.pdf")
    with pytest.raises(compat.PdfError):
        compat.detect_pdf_type("/nonexistent/file.pdf")
    bad = tmp_path / "bad.pdf"
    bad.write_bytes(b"not a pdf")
    with pytest.raises(compat.PdfError):
        compat.process_pdf(str(bad))


def test_custom_config(text_pdf):
    cfg = compat.DetectionConfig(max_pages_to_sample=1,
                                 min_text_ops_per_page=1,
                                 text_page_ratio_threshold=0.5)
    d = compat.detect_pdf_type(text_pdf, cfg)
    assert d["pages_sampled"] == 1
