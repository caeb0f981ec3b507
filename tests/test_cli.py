"""CLI contract parity with the reference binaries (src/bin/pdf2md.rs,
src/bin/detect_pdf.rs): --raw emits the markdown with no headers, --json
emits the reference's exact key set, exit code 2 for scanned docs."""

import json

import pytest

from pdf_inspector_spark import cli
from pdf_inspector_spark.corpus import _scanned_only, _tj_basic
from pdf_inspector_spark.kernels.pipeline import process_pdf_mem


@pytest.fixture(scope="module")
def text_pdf(tmp_path_factory):
    p = tmp_path_factory.mktemp("cli") / "text.pdf"
    p.write_bytes(_tj_basic())
    return str(p)


@pytest.fixture(scope="module")
def scanned_pdf(tmp_path_factory):
    p = tmp_path_factory.mktemp("cli") / "scan.pdf"
    p.write_bytes(_scanned_only())
    return str(p)


def test_raw_emits_markdown_no_headers(text_pdf, capsys):
    """Reference: 'Raw output - just the markdown' — NOT the plain text."""
    rc = cli.main(["pdf2md", text_pdf, "--raw"])
    captured = capsys.readouterr()
    expected = process_pdf_mem(open(text_pdf, "rb").read())["markdown"]
    assert rc == 0
    assert captured.out == expected


def test_text_flag_is_plain_text_extension(text_pdf, capsys):
    rc = cli.main(["pdf2md", text_pdf, "--text"])
    captured = capsys.readouterr()
    expected = process_pdf_mem(open(text_pdf, "rb").read())["text"]
    assert rc == 0
    assert captured.out == expected + "\n"


def test_json_key_set_matches_reference(text_pdf, capsys):
    rc = cli.main(["pdf2md", text_pdf, "--json"])
    captured = capsys.readouterr()
    assert rc == 0
    d = json.loads(captured.out)
    # exact key set of src/bin/pdf2md.rs JSON output
    assert set(d) == {"pdf_type", "page_count", "has_text",
                      "processing_time_ms", "markdown_length", "markdown"}
    assert d["has_text"] is True
    assert d["markdown_length"] == len(d["markdown"])


def test_scanned_exit_code_2(scanned_pdf, capsys):
    rc = cli.main(["pdf2md", scanned_pdf, "--raw"])
    captured = capsys.readouterr()
    assert rc == 2
    assert captured.out == ""
    assert "OCR" in captured.err


def test_scanned_json_reports_without_exit_2(scanned_pdf, capsys):
    """The reference's --json branch prints the row and exits 0 even for
    scanned docs (json_output is checked before the type match)."""
    rc = cli.main(["pdf2md", scanned_pdf, "--json"])
    captured = capsys.readouterr()
    assert rc == 0
    d = json.loads(captured.out)
    assert d["pdf_type"] in ("scanned", "image_based")
    assert d["has_text"] is False
