"""Extended fuzz session: random object-tree roundtrips + random byte
mutations of corpus PDFs through the full kernel. Never-raise + roundtrip
invariants. Prints a summary; exits 1 on any violation."""
import random, sys, traceback
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tests.test_properties import serialize
from pdf_inspector_spark.kernels.pdfobj import _Lexer, Name, Ref
from pdf_inspector_spark.kernels.pipeline import process_pdf_mem
from pdf_inspector_spark.corpus import build_corpus

import sys as _s; rng = random.Random(int(_s.argv[1]) if len(_s.argv) > 1 else 20260816)

def rand_obj(depth=0):
    r = rng.random()
    if depth > 3 or r < 0.35:
        c = rng.randrange(5)
        if c == 0: return rng.randint(-2**31, 2**31)
        if c == 1: return round(rng.uniform(-1e6, 1e6), 6)
        if c == 2: return bytes(rng.randrange(256) for _ in range(rng.randrange(12)))
        if c == 3: return Name("".join(chr(rng.randrange(33, 127)) for _ in range(rng.randrange(1, 8))))
        return rng.choice([True, False, None, Ref(rng.randrange(1, 99), 0)])
    if r < 0.7:
        return [rand_obj(depth+1) for _ in range(rng.randrange(5))]
    return {("K%d" % i): rand_obj(depth+1) for i in range(rng.randrange(4))}

fails = 0
# 1) roundtrip: 30k random trees
for i in range(30000):
    obj = rand_obj()
    data = serialize(obj)
    try:
        got = _Lexer(data).parse_object()
    except Exception:
        print("PARSE RAISE on", data[:120]); fails += 1; continue
    if got != obj and not (isinstance(obj, float)):
        # float formatting roundtrip allowed small repr differences? serialize uses %.6f
        if repr(got) != repr(obj):
            print("MISMATCH", repr(obj)[:80], "->", repr(got)[:80]); fails += 1
print("roundtrip done")

# 2) byte-mutation fuzz of real corpus PDFs: never raise
corpus = [e.pdf_bytes for e in build_corpus()]
for i in range(4000):
    buf = bytearray(rng.choice(corpus))
    for _ in range(rng.randrange(1, 12)):
        op = rng.randrange(3)
        pos = rng.randrange(len(buf))
        if op == 0: buf[pos] = rng.randrange(256)
        elif op == 1: del buf[pos:pos + rng.randrange(1, 40)]
        else: buf[pos:pos] = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 20)))
    try:
        r = process_pdf_mem(bytes(buf), use_cache=False)
        assert isinstance(r, dict)
    except Exception:
        print("RAISE on mutation", i); traceback.print_exc(); fails += 1
        open(f"/tmp/fuzz_crash_{i}.pdf", "wb").write(bytes(buf))
print("mutation done; fails =", fails)
sys.exit(1 if fails else 0)
