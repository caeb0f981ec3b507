"""Robustness fuzzing: arbitrary and mutated payloads must produce
error rows (or degraded output) — never exceptions, never hangs. At
10^12-turn scale a single raising payload would fail tasks; a looping
payload would wedge an executor core."""

import hashlib

from hypothesis import given, settings, strategies as st

from pdf_inspector_spark.corpus import corpus_payloads
from pdf_inspector_spark.kernels.pipeline import process_pdf_mem

PAYLOADS = corpus_payloads()


@settings(max_examples=200, deadline=2000)
@given(st.binary(min_size=0, max_size=2048))
def test_random_bytes_never_raise(buf):
    r = process_pdf_mem(buf)
    assert r["error_kind"] is not None or r["pdf_type"] is not None


@settings(max_examples=100, deadline=5000)
@given(st.sampled_from(sorted(PAYLOADS)), st.data())
def test_mutated_corpus_never_raises(doc_id, data):
    """Bit-flip / truncate / splice real PDFs: the parser must degrade
    gracefully (error row or partial output), never raise or loop."""
    base = bytearray(PAYLOADS[doc_id])
    mode = data.draw(st.integers(0, 2))
    if mode == 0:  # random byte flips
        for _ in range(data.draw(st.integers(1, 16))):
            pos = data.draw(st.integers(0, len(base) - 1))
            base[pos] = data.draw(st.integers(0, 255))
    elif mode == 1:  # truncation
        base = base[:data.draw(st.integers(0, len(base)))]
    else:  # splice two documents
        other = PAYLOADS[data.draw(st.sampled_from(sorted(PAYLOADS)))]
        cut = data.draw(st.integers(0, len(base)))
        base = base[:cut] + other[len(other) - cut:]
    r = process_pdf_mem(bytes(base))
    assert isinstance(r, dict)
    assert "pdf_type" in r and "error_kind" in r


def test_deterministic_under_repetition():
    """Same payload → identical result dict every time (no hidden state
    leaks between documents in a batch)."""
    buf = PAYLOADS["cid_tounicode"]
    results = [process_pdf_mem(buf) for _ in range(3)]
    for r in results[1:]:
        a = {k: v for k, v in r.items() if k != "processing_time_ms"}
        b = {k: v for k, v in results[0].items() if k != "processing_time_ms"}
        assert a == b


def test_interleaved_documents_independent():
    """Processing order must not affect outputs (executor batches mix
    documents arbitrarily)."""
    ids = sorted(PAYLOADS)
    solo = {i: process_pdf_mem(PAYLOADS[i])["text"] for i in ids}
    for i in reversed(ids):
        assert process_pdf_mem(PAYLOADS[i])["text"] == solo[i]


def test_huge_flat_content_bounded():
    """A pathologically long content stream parses in bounded time
    (no quadratic scanning)."""
    body = b"BT /F1 12 Tf 72 700 Td " + b"(x) Tj " * 20000 + b"ET"
    from pdf_inspector_spark.corpus import _catalog_and_pages, _stream_obj, build_pdf, _HELV_FONT
    objs = _catalog_and_pages([3])
    objs[3] = (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
               b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>")
    objs[4] = _stream_obj(b"<< >>", body)
    objs[5] = _HELV_FONT
    import time
    t0 = time.monotonic()
    r = process_pdf_mem(build_pdf(objs))
    assert time.monotonic() - t0 < 20.0
    assert r["pdf_type"] == "text_based"


def test_adversarial_length_values_never_raise():
    """/Length slicing: wrong, negative, huge, non-integer and Ref-valued
    /Length entries must all fall back to the scan and never raise."""
    for length in (b"-5", b"0", b"3", b"999999999", b"2 0 R", b"(x)", b"1.5"):
        body = (b"<< /Length " + length + b" >>\nstream\n"
                b"real stream data here\nendstream")
        pdf = (b"%PDF-1.4\n1 0 obj\n" + body + b"\nendobj\n"
               b"trailer\n<< /Size 2 /Root 1 0 R >>\n%%EOF\n")
        r = process_pdf_mem(pdf, use_cache=False)
        assert isinstance(r, dict)  # error-row or parsed; never a raise


def test_embedded_endstream_with_exact_length_roundtrip():
    """Payload containing the literal bytes '\\nendstream' with a correct
    /Length must survive byte-for-byte (the r1-ADVICE truncation bug)."""
    from pdf_inspector_spark.kernels.pdfobj import Document, Stream
    payload = b"A" * 10 + b"\nendstream\n" + b"B" * 10
    body = (b"<< /Length " + str(len(payload)).encode() + b" >>\nstream\n"
            + payload + b"\nendstream")
    pdf = (b"%PDF-1.4\n1 0 obj\n" + body + b"\nendobj\n"
           b"trailer\n<< /Size 2 /Root 1 0 R >>\n%%EOF\n")
    st = Document.load_mem(pdf).objects[1]
    assert isinstance(st, Stream)
    assert st.raw == payload
