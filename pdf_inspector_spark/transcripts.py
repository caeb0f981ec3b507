"""Deterministic synthetic transcripts tables (FIXTURES.md §1).

Schema (BASELINE.json input_hint):

    transcripts(conv_id string, turn_idx int32, role string,
                text string, tool string, ts timestamp)

``text`` carries one synthetic PDF from the corpus as a latin-1-safe
string (bytes 0x00–0xFF map 1:1). Payload assignment, roles, timestamps
and the skew profile are all pure functions of (conv_id, turn_idx) — no
RNG state — so the table and its expected outputs are reproducible
anywhere, including inside Spark executors.

Skew recipe (§1.1): the first 1% of conversations are "mega" and own
~30% of all turns, so a naive repartition(conv_id) yields stragglers and
the salted plan measurably wins.
"""

from __future__ import annotations

import hashlib
import os
from datetime import datetime, timedelta, timezone

import pyarrow as pa
import pyarrow.parquet as pq

from .corpus import corpus_payloads

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA_DIR = os.path.join(REPO_ROOT, "data")

BASE_TS = datetime(2024, 1, 1, tzinfo=timezone.utc)

# scale name -> (n_convs, mega_turns, normal_turns_mod)
SCALES = {
    "t-small": (20, 30, 7),
    "t-med": (500, 600, 27),
    "t-bench": (5000, 1200, 57),
    # ~1.6M turns: big enough that the CACHED pipeline runs >10s at 8
    # cores, so the production path's N→4N scaling is measurable too
    # (opt-in via bench.py --cached-ladder; not part of the default run).
    "t-large": (40000, 1200, 57),
}

_ROLES = ("user", "assistant", "tool")
_TOOLS = ("pdf_reader", "search", "calculator", "browser")

# 100-slot weighted payload pool: ~13% scanned/image-ish + mixed payloads
# (routing selectivity), 2% malformed (quarantine channel), rest text-based.
_TEXT_IDS = [
    "tj_basic", "tj_multiline", "tm_positioned", "tj_kerning",
    "cid_tounicode", "cid_1byte_cmap", "differences_enc", "ligatures",
    "utf16_fallback", "form_xobject", "mixed_pages", "multipage_7",
    "two_column", "table_small_font", "table_body_font", "para_not_table",
    "lists_code", "links_annots", "page_numbers", "cjk_text",
    "rotated_text", "contents_array", "type3_font", "nested_form",
    "toc_page", "drop_cap", "hyphen_caption", "objstm",
    "diagonal_text", "continuation_table", "rtl_text", "footnote_table",
]


def _payload_pool() -> list[str]:
    pool: list[str] = []
    pool += ["malformed"] * 2
    pool += ["scanned_only"] * 8
    pool += ["template_mixed"] * 5
    i = 0
    while len(pool) < 100:
        pool.append(_TEXT_IDS[i % len(_TEXT_IDS)])
        i += 1
    assert len(pool) == 100
    return pool


_POOL = _payload_pool()


def _h(conv_id: str, turn_idx: int) -> int:
    """Stable 64-bit hash of (conv_id, turn_idx)."""
    d = hashlib.md5(f"{conv_id}:{turn_idx}".encode()).digest()
    return int.from_bytes(d[:8], "big")


def conv_ids(scale: str) -> list[str]:
    n_convs, _, _ = SCALES[scale]
    return [f"conv-{i:06d}" for i in range(n_convs)]


def turns_for_conv(scale: str, conv_index: int) -> int:
    n_convs, mega_turns, normal_mod = SCALES[scale]
    n_mega = max(n_convs // 100, 1)
    if conv_index < n_mega:
        return mega_turns
    return 1 + _h(f"conv-{conv_index:06d}", -1) % normal_mod


def assign_doc_id(conv_id: str, turn_idx: int) -> str:
    """Which corpus payload a turn carries — pure function of the key."""
    return _POOL[_h(conv_id, turn_idx) % 100]


def turn_role(conv_id: str, turn_idx: int) -> str:
    return _ROLES[_h(conv_id, turn_idx) % 3]


def iter_rows(scale: str):
    payloads = corpus_payloads()
    payload_text = {k: v.decode("latin-1") for k, v in payloads.items()}
    for ci, conv_id in enumerate(conv_ids(scale)):
        n_turns = turns_for_conv(scale, ci)
        for t in range(n_turns):
            role = turn_role(conv_id, t)
            doc_id = assign_doc_id(conv_id, t)
            yield {
                "conv_id": conv_id,
                "turn_idx": t,
                "role": role,
                "text": payload_text[doc_id],
                "tool": _TOOLS[_h(conv_id, t) % len(_TOOLS)] if role == "tool" else None,
                "ts": BASE_TS + timedelta(seconds=ci * 3600 + t * 60),
            }


SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us", tz="UTC")),
])


# Split granularity: one file = one scan split (single row group). The
# split count must be ≫ max parallelism or wave quantization caps scaling:
# t-bench at 3072 rows/file gave 67 splits → ceil(67/32)=3 waves at 32
# cores = 70% utilization (vs 93% at 8) — that alone reads as a fake
# 8→32 scaling loss. 768 rows/file ≈ 268 splits ≈ ≥93% utilization at
# every level measured here. A real 10^12-turn Iceberg table has millions
# of splits, so THIS is the faithful layout, not the coarse one.
ROWS_PER_FILE = 768


def table_path(scale: str, data_dir: str = DATA_DIR) -> str:
    return os.path.join(data_dir, f"transcripts_{scale}.parquet")


# Bump when the row-generation LOGIC changes (role/timestamp/doc
# assignment functions, skew recipe) — the parts of iter_rows a content
# hash cannot see. Folded into corpus_fingerprint so stale tables
# regenerate (ADVICE r3: parameter changes previously served stale data).
_GENERATOR_VERSION = 1


def corpus_fingerprint() -> str:
    """Content hash of everything that feeds the transcripts tables:
    the payload pool (ids + bytes of every referenced corpus entry), the
    SCALES shape parameters, and a generator-logic version constant.
    Tables on disk regenerate automatically when any of it changes (the
    r2 flow relied on manual `force=True`, which silently serves stale
    tables in any environment that kept an old data/ dir). Golden-only
    corpus entries outside the pool don't affect the tables, so they
    don't trigger regeneration."""
    payloads = corpus_payloads()
    h = hashlib.sha256()
    for k in sorted(set(_POOL)):
        v = payloads[k]
        h.update(k.encode())
        h.update(len(v).to_bytes(8, "big"))
        h.update(v)
    h.update("|".join(_POOL).encode())
    h.update(f"gen_v{_GENERATOR_VERSION}".encode())
    h.update(repr(sorted(SCALES.items())).encode())
    h.update(f"rows_per_file={ROWS_PER_FILE}".encode())
    return h.hexdigest()


def write_transcripts(scale: str, data_dir: str = DATA_DIR,
                      force: bool = False) -> str:
    """Write (or reuse) the table for a scale as a DIRECTORY of part
    files (~3k rows each). Returns the directory path.

    Many files ≈ a real table layout: Spark gets file-level scan
    parallelism, so the per-row pipeline runs straight on scan
    partitions with no payload shuffle. (A single small parquet file
    yields ONE input split regardless of row groups — measured as the
    bench bottleneck.)
    """
    path = table_path(scale, data_dir)
    done_marker = os.path.join(path, "_SUCCESS")
    fp = corpus_fingerprint()
    if os.path.exists(done_marker) and not force:
        with open(done_marker) as f:
            if f.read().strip() == fp:
                return path
    os.makedirs(path, exist_ok=True)
    for old in os.listdir(path):
        os.unlink(os.path.join(path, old))
    cols: dict[str, list] = {f.name: [] for f in SCHEMA}
    part = 0

    def flush() -> None:
        nonlocal part, cols
        if not cols["conv_id"]:
            return
        table = pa.Table.from_pydict(cols, schema=SCHEMA)
        pq.write_table(table, os.path.join(path, f"part-{part:05d}.parquet"),
                       row_group_size=4096, compression="zstd")
        part += 1
        cols = {f.name: [] for f in SCHEMA}

    for row in iter_rows(scale):
        for k in cols:
            cols[k].append(row[k])
        if len(cols["conv_id"]) >= ROWS_PER_FILE:
            flush()
    flush()
    with open(done_marker, "w") as f:
        f.write(fp + "\n")
    return path


def conv_bucket(conv_id: str, buckets: int = 16) -> int:
    """Derived partition key: a stable hash of conv_id. Conversation-keyed
    queries re-derive the bucket and touch exactly ONE partition — the
    plain-parquet analog of Iceberg's bucket partition transform +
    manifest pruning (SURVEY.md §4 scan row)."""
    return _h(conv_id, -9) % buckets


def write_transcripts_partitioned(scale: str, buckets: int = 16,
                                  data_dir: str = DATA_DIR,
                                  force: bool = False) -> str:
    """Write (or reuse) the transcripts table hive-partitioned by the
    derived conv_bucket key (``conv_bucket=K/part-*.parquet``). All turns
    of a conversation land in one bucket, so a conversation-keyed read
    prunes to a single partition directory at PLANNING time —
    tests/test_scan_pruning.py asserts the scan's numFiles/numPartitions
    metrics, not just the PartitionFilters plan string."""
    import shutil
    path = os.path.join(data_dir,
                        f"transcripts_{scale}_bucketed{buckets}.parquet")
    done_marker = os.path.join(path, "_SUCCESS")
    fp = corpus_fingerprint() + f"|buckets={buckets}"
    if os.path.exists(done_marker) and not force:
        with open(done_marker) as f:
            if f.read().strip() == fp:
                return path
    if os.path.exists(path):
        shutil.rmtree(path)
    parts: dict[int, int] = {}
    bufs: dict[int, dict[str, list]] = {}

    def flush(b: int) -> None:
        cols = bufs[b]
        if not cols["conv_id"]:
            return
        sub = os.path.join(path, f"conv_bucket={b}")
        os.makedirs(sub, exist_ok=True)
        table = pa.Table.from_pydict(cols, schema=SCHEMA)
        pq.write_table(table,
                       os.path.join(sub, f"part-{parts.get(b, 0):05d}.parquet"),
                       row_group_size=4096, compression="zstd")
        parts[b] = parts.get(b, 0) + 1
        bufs[b] = {f.name: [] for f in SCHEMA}

    for row in iter_rows(scale):
        b = conv_bucket(row["conv_id"], buckets)
        if b not in bufs:
            bufs[b] = {f.name: [] for f in SCHEMA}
        for k in bufs[b]:
            bufs[b][k].append(row[k])
        if len(bufs[b]["conv_id"]) >= ROWS_PER_FILE:
            flush(b)
    for b in list(bufs):
        flush(b)
    os.makedirs(path, exist_ok=True)
    with open(done_marker, "w") as f:
        f.write(fp + "\n")
    return path


def expected_turns(scale: str) -> list[dict]:
    """Golden per-turn outputs: what the pipeline must produce for every
    (conv_id, turn_idx), derived from the corpus fixtures (the kernel
    oracle). This is the byte-equality contract table."""
    from .fixtures import load_fixtures
    fx = load_fixtures()
    out = []
    for ci, conv_id in enumerate(conv_ids(scale)):
        for t in range(turns_for_conv(scale, ci)):
            doc_id = assign_doc_id(conv_id, t)
            e = fx[doc_id]
            out.append({
                "conv_id": conv_id, "turn_idx": t, "doc_id": doc_id,
                "pdf_type": e["pdf_type"], "text": e["text"],
                "markdown": e["markdown"], "error_kind": e["error_kind"],
                "n_spans": len(e["spans"]) if e["spans"] is not None else 0,
                "ocr_recommended": bool(e["ocr_recommended"]),
            })
    return out


def scale_stats(scale: str) -> dict:
    n_convs, _, _ = SCALES[scale]
    n_mega = max(n_convs // 100, 1)
    turns = [turns_for_conv(scale, i) for i in range(n_convs)]
    total = sum(turns)
    mega = sum(turns[:n_mega])
    return {"scale": scale, "convs": n_convs, "turns": total,
            "mega_convs": n_mega, "mega_share": round(mega / total, 3)}


if __name__ == "__main__":
    import sys
    scales = sys.argv[1:] or ["t-small", "t-med"]
    for s in scales:
        p = write_transcripts(s, force=True)
        print(scale_stats(s), "->", p)
