"""Property-based invariants (hypothesis):

- PDF object serializer→parser roundtrip: any object tree we can write,
  the lexer parses back identically.
- Reading-order reconstruction: total (every item lands in exactly one
  line), deterministic, page-partitioned.
"""

from hypothesis import given, settings, strategies as st

from pdf_inspector_spark.kernels.extractor import TextItem, group_into_lines
from pdf_inspector_spark.kernels.pdfobj import Name, Ref, _Lexer


# -- serializer for the roundtrip property ---------------------------------

def serialize(obj) -> bytes:
    if obj is True:
        return b"true"
    if obj is False:
        return b"false"
    if obj is None:
        return b"null"
    if isinstance(obj, Ref):
        return f"{obj.num} {obj.gen} R".encode()
    if isinstance(obj, Name):
        out = b"/"
        for ch in str(obj).encode("latin-1"):
            if ch in b"()<>[]{}/%# \t\n\r" or ch < 0x21 or ch > 0x7E:
                out += f"#{ch:02x}".encode()
            else:
                out += bytes([ch])
        return out
    if isinstance(obj, int):
        return str(obj).encode()
    if isinstance(obj, float):
        return f"{obj:.6f}".encode()
    if isinstance(obj, bytes):
        out = b"("
        for ch in obj:
            if ch in b"()\\":
                out += b"\\" + bytes([ch])
            else:
                out += bytes([ch])
        return out + b")"
    if isinstance(obj, list):
        return b"[ " + b" ".join(serialize(x) for x in obj) + b" ]"
    if isinstance(obj, dict):
        parts = [serialize(Name(k)) + b" " + serialize(v)
                 for k, v in obj.items()]
        return b"<< " + b" ".join(parts) + b" >>"
    raise TypeError(type(obj))


_scalars = st.one_of(
    st.booleans(),
    st.none(),
    st.integers(min_value=-2**31, max_value=2**31),
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False,
              allow_infinity=False).map(lambda f: round(f, 6)),
    st.binary(max_size=64),
    st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126),
            min_size=1, max_size=12).map(Name),
    st.builds(Ref, st.integers(1, 9999), st.integers(0, 9)),
)

_objects = st.recursive(
    _scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=6),
        st.dictionaries(
            st.text(alphabet=st.characters(min_codepoint=65, max_codepoint=90),
                    min_size=1, max_size=8),
            children, max_size=6),
    ),
    max_leaves=25,
)


@settings(max_examples=300, deadline=2000)
@given(_objects)
def test_object_roundtrip(obj):
    data = serialize(obj)
    lex = _Lexer(data)
    parsed = lex.parse_object()
    assert parsed == obj or (isinstance(obj, float)
                             and abs(parsed - obj) < 1e-4)


# -- reading order invariants ----------------------------------------------

_items = st.lists(
    st.builds(
        TextItem,
        st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126),
                min_size=1, max_size=8),                       # text
        st.floats(0, 600, allow_nan=False),                    # x
        st.floats(0, 800, allow_nan=False),                    # y
        st.floats(0, 200, allow_nan=False),                    # width
        st.just(12.0),                                         # height
        st.just("F1"),                                         # font
        st.floats(6, 40, allow_nan=False),                     # font_size
        st.integers(1, 3),                                     # page
    ),
    max_size=40,
)


@settings(max_examples=150, deadline=2000)
@given(_items)
def test_grouping_is_total_and_deterministic(items):
    lines_a = group_into_lines(list(items))
    lines_b = group_into_lines(list(items))
    # deterministic
    assert [(l.page, l.y, l.text()) for l in lines_a] == \
        [(l.page, l.y, l.text()) for l in lines_b]
    # total modulo the page-number filter (1-4 digit items at page edges)
    survivors = sum(len(l.items) for l in lines_a)
    dropped = sum(1 for i in items
                  if i.text.strip().isdigit() and len(i.text.strip()) <= 4
                  and (i.y > 720.0 or i.y < 100.0))
    assert survivors == len(items) - dropped
    # lines never mix pages
    for line in lines_a:
        assert all(i.page == line.page for i in line.items)


def test_zip_chain_ngrams_match_naive(spark):
    """The r3 zip_with-over-slices n-gram builders (bigrams in
    text_repetition_stats, 3-shingles in the MinHash chain, 8-grams in
    decontamination) must produce exactly the naive sliding-window
    n-grams for arbitrary token streams, including the k-1 edge sizes
    the slice arithmetic has to get right."""
    import random
    import re

    from pdf_inspector_spark.operators.dedup import _SH3
    from pdf_inspector_spark.operators.textstats import _G8

    rng = random.Random(20260816)
    vocab = ["a", "bb", "ccc", "Ä", "word", "x1", "ẞ", "t-t"]
    docs = []
    for i in range(40):
        n = rng.choice([0, 1, 2, 3, 7, 8, 9, rng.randrange(30)])
        docs.append((i, "  ".join(rng.choice(vocab) for _ in range(n))))
    spark.createDataFrame(docs, "doc_id long, text string") \
        .createOrReplaceTempView("ngram_docs")

    bigram = ("CASE WHEN size(ts) >= 2 THEN "
              "zip_with(slice(ts, 1, size(ts) - 1), "
              "slice(ts, 2, size(ts) - 1), (a, b) -> concat(a, ' ', b)) "
              "ELSE array() END")
    rows = spark.sql(f"""
        SELECT doc_id, {bigram} AS bi,
               CASE WHEN size(ts) >= 3 THEN {_SH3} ELSE array() END AS sh3,
               CASE WHEN size(ts) >= 8 THEN {_G8} ELSE array() END AS g8
        FROM (SELECT doc_id,
                     filter(split(lower(text), '\\\\s+'), x -> x != '') AS ts
              FROM ngram_docs)
    """).collect()
    got = {r["doc_id"]: r for r in rows}
    for doc_id, text in docs:
        toks = [t for t in re.split(r"\s+", text.lower()) if t]
        for col, k in (("bi", 2), ("sh3", 3), ("g8", 8)):
            want = [" ".join(toks[i:i + k])
                    for i in range(len(toks) - k + 1)] if len(toks) >= k else []
            assert list(got[doc_id][col]) == want, (doc_id, col, text)
