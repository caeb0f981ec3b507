"""Robustness of the PDF object parser against adversarial byte patterns
that are legal in real files (ADVICE round 1):

- a FlateDecode payload containing the literal bytes 'endstream' must not
  be truncated when the dict carries a resolvable integer /Length
  (reference: lopdf honors /Length; src/tounicode.rs:413-466 only uses
  the raw scan for CMaps);
- inline image data between ID and EI may contain the raw bytes 'EI';
  only a whitespace-delimited EI terminates the image, so the content
  tokenizer stays synchronized.
"""

import zlib

from pdf_inspector_spark.kernels.pdfobj import (Document, Stream,
                                                decode_content)


def test_length_protects_endstream_in_flate_payload():
    # zlib level 0 emits stored (uncompressed) deflate blocks, so the
    # compressed byte stream literally contains the plaintext — including
    # the bytes 'endstream'. A legal FlateDecode stream the old raw scan
    # truncated mid-payload.
    plain = b"some text then endstream appears raw inside the payload"
    comp = zlib.compress(plain, 0)
    assert b"endstream" in comp
    body = (b"<< /Filter /FlateDecode /Length " + str(len(comp)).encode()
            + b" >>\nstream\n" + comp + b"\nendstream")
    pdf = (b"%PDF-1.4\n1 0 obj\n" + body + b"\nendobj\n"
           b"trailer\n<< /Size 2 /Root 1 0 R >>\nstartxref\n0\n%%EOF\n")
    doc = Document.load_mem(pdf)
    st = doc.objects[1]
    assert isinstance(st, Stream)
    assert st.raw == comp
    assert st.decompressed() == plain


def test_length_fallback_to_scan_when_length_wrong():
    data = b"hello stream body"
    body = (b"<< /Length 9999 >>\nstream\n" + data + b"\nendstream")
    pdf = (b"%PDF-1.4\n1 0 obj\n" + body + b"\nendobj\n"
           b"trailer\n<< /Size 2 /Root 1 0 R >>\n%%EOF\n")
    doc = Document.load_mem(pdf)
    st = doc.objects[1]
    assert isinstance(st, Stream)
    assert st.raw == data


def test_inline_image_embedded_EI_bytes_do_not_desync():
    # Binary image data contains 'EI' with non-whitespace neighbors
    # ('xEIx') — must NOT terminate the image; the real ' EI ' does.
    content = (b"BT /F1 12 Tf 72 700 Td (before) Tj ET\n"
               b"BI /W 2 /H 2 /BPC 8 /CS /G ID \xffxEIx\x00\x01 EI\n"
               b"BT /F1 12 Tf 72 680 Td (after) Tj ET\n")
    ops = decode_content(content)
    names = [o.operator for o in ops]
    # both text blocks survive intact around the inline image
    assert names.count("Tj") == 2
    tjs = [o.operands[0] for o in ops if o.operator == "Tj"]
    assert tjs == [b"before", b"after"]


def test_inline_image_unterminated_consumes_rest():
    content = (b"BT (x) Tj ET\nBI /W 1 ID \xff\xfeEIX")  # no delimited EI
    ops = decode_content(content)
    assert [o.operator for o in ops][-1] == "ET"


def test_object_intern_never_shares_across_divergent_tails():
    """Cross-doc object interning (pdfobj._obj_intern) must not reuse a
    parse when the object's bytes continue past a bogus 'endobj' inside
    its stream payload: two buffers identical up to that bogus marker
    but different afterwards must parse to their own (different)
    streams. The guard is store-only-when-parse-stayed-inside-span."""
    data_a = b"AAAA endobj TAIL-A-" + b"a" * 16
    data_b = b"AAAA endobj TAIL-B-" + b"b" * 16
    assert data_a[:12] == data_b[:12]  # identical through the bogus endobj

    def pdf(payload: bytes) -> bytes:
        body = (b"<< /Length " + str(len(payload)).encode()
                + b" >>\nstream\n" + payload + b"\nendstream")
        return (b"%PDF-1.4\n1 0 obj\n" + body + b"\nendobj\n"
                b"trailer\n<< /Size 2 /Root 1 0 R >>\n%%EOF\n")

    sa = Document.load_mem(pdf(data_a)).objects[1]
    sb = Document.load_mem(pdf(data_b)).objects[1]
    assert isinstance(sa, Stream) and isinstance(sb, Stream)
    assert sa.raw == data_a
    assert sb.raw == data_b
    assert sa.raw != sb.raw


def test_object_intern_shares_identical_font_objects():
    """The intended fast path: byte-identical objects across documents
    resolve to the SAME parsed object (shared, read-only)."""
    from pdf_inspector_spark.corpus import _tj_basic, _tj_multiline
    da = Document.load_mem(_tj_basic())
    db = Document.load_mem(_tj_multiline())

    def font_obj(doc):
        for obj in doc.objects.values():
            if isinstance(obj, dict) and obj.get("Type") == "Font":
                return obj
        return None

    fa, fb = font_obj(da), font_obj(db)
    assert fa is not None and fb is not None
    assert fa is fb  # interned: same object identity


def test_iter_obj_headers_equivalent_to_regex():
    """The find()-anchored header scan must yield exactly what the
    reference regex yields — same (num, end) pairs, same order — on
    adversarial byte soups (digits inside streams, endobj substrings,
    word chars after obj, multi-number runs, boundary positions)."""
    import re

    from pdf_inspector_spark.kernels.pdfobj import (_OBJ_RE,
                                                    _iter_obj_headers)

    cases = [
        b"1 0 obj << >> endobj",
        b"12 3 obj obj 4 5 obj",
        b"1 2 3 obj",
        b"1 2 obj3 4 obj",
        b"99 88 obj7 6 obj x",
        b"endobj obj 5 6 objA 7\t\r\n8 obj",
        b"stream 123 456 789 obj endstream",
        b"0 0 obj",
        b"obj", b" obj", b"5obj", b"5 obj", b"5  6   obj",
        b"5\x0c6\x0bobj",          # formfeed / vertical tab are \s
        b"\xff\xd8 12 0 obj \x00\x01 13 0 obj",
        b"9 9 obj" + b"obj" * 5,
        b"1 0 obj 2 0 obj 3 0 obj",
    ]
    import random
    rng = random.Random(42)
    alphabet = b"0123456789 \t\r\nobjendstream<<>>/x\x00\xff"
    for _ in range(300):
        cases.append(bytes(rng.choice(alphabet)
                           for _ in range(rng.randrange(0, 200))))
    for buf in cases:
        expect = [(int(m.group(1)), m.end())
                  for m in _OBJ_RE.finditer(buf)]
        got = list(_iter_obj_headers(buf))
        assert got == expect, buf


def test_iter_obj_headers_equivalent_on_corpus():
    """Same equivalence on every real corpus payload."""
    from pdf_inspector_spark.corpus import corpus_payloads
    from pdf_inspector_spark.kernels.pdfobj import (_OBJ_RE,
                                                    _iter_obj_headers)
    for doc_id, buf in corpus_payloads().items():
        expect = [(int(m.group(1)), m.end())
                  for m in _OBJ_RE.finditer(buf)]
        assert list(_iter_obj_headers(buf)) == expect, doc_id
