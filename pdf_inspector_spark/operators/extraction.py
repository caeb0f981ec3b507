"""Extraction-stage operators exposed through the driver contract.

These run the real Spark pipeline over the deterministic transcripts
table (t-small scale) and are checked against the kernel-oracle fixture
parquet — the per-turn byte-equality contract (north rule). The oracle
SQL reads the fixture file directly via read_parquet(); the fixture is
(re)generated deterministically on demand, so the comparison is stable.

``sf_dir`` is accepted for contract compatibility but unused: the
extraction input is the transcripts table, not the TPC-H star schema.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from . import register
from ..transcripts import DATA_DIR, write_transcripts

SCALE = "t-small"
# v8 (r4): + footnote_table in the payload pool (was golden-only in r3)
# — the table-cell footnote/continuation cleaner now runs under the
# end-to-end per-turn gate, not just the corpus golden test.
# v7: +3 pathological-layout corpus entries (diagonal_text,
# continuation_table, rtl_text) in the payload pool
EXPECTED_PATH = os.path.join(DATA_DIR, f"expected_{SCALE}_v8.parquet")
EXPECTED_PATH_TMED = os.path.join(DATA_DIR, "expected_t-med_v8.parquet")
EXPECTED_PATH_TBENCH = os.path.join(DATA_DIR, "expected_t-bench_v8.parquet")

_EXPECTED_SCHEMA = pa.schema([
    ("conv_id", pa.string()), ("turn_idx", pa.int32()),
    ("doc_id", pa.string()), ("pdf_type", pa.string()),
    ("text", pa.string()), ("markdown", pa.string()),
    ("error_kind", pa.string()), ("n_spans", pa.int32()),
    ("ocr_recommended", pa.bool_()),
])


def _write_expected(scale: str, path: str) -> None:
    """Write the expected-output fixture parquet, streaming in 100k-row
    batches: one Arrow table of the whole fixture is ~1 GB at t-bench
    and ~7 GB at t-large (turn texts are materialized per row), while
    the streamed file is identical and the peak stays ~100 MB."""
    if os.path.exists(path):
        return
    from ..fixtures import load_fixtures
    from ..transcripts import assign_doc_id, conv_ids, turns_for_conv
    os.makedirs(DATA_DIR, exist_ok=True)
    fx = load_fixtures()
    writer = pq.ParquetWriter(path + ".tmp", _EXPECTED_SCHEMA,
                              compression="zstd")
    batch: list[dict] = []

    def flush() -> None:
        if batch:
            writer.write_table(
                pa.Table.from_pylist(batch, schema=_EXPECTED_SCHEMA))
            batch.clear()

    for ci, conv_id in enumerate(conv_ids(scale)):
        for t in range(turns_for_conv(scale, ci)):
            e = fx[assign_doc_id(conv_id, t)]
            batch.append({
                "conv_id": conv_id, "turn_idx": t,
                "doc_id": assign_doc_id(conv_id, t),
                "pdf_type": e["pdf_type"], "text": e["text"],
                "markdown": e["markdown"], "error_kind": e["error_kind"],
                "n_spans": len(e["spans"]) if e["spans"] is not None else 0,
                "ocr_recommended": bool(e["ocr_recommended"]),
            })
            if len(batch) >= 100_000:
                flush()
    flush()
    writer.close()
    os.replace(path + ".tmp", path)


def ensure_fixture_tables() -> tuple[str, str]:
    """Materialize the transcripts table and its expected-output parquet."""
    tpath = write_transcripts(SCALE)
    _write_expected(SCALE, EXPECTED_PATH)
    # t-med fixture for the 100x-scale digest gate entry
    write_transcripts("t-med")
    _write_expected("t-med", EXPECTED_PATH_TMED)
    return tpath, EXPECTED_PATH


SNAP_ROOT = os.path.join(DATA_DIR, f"transcripts_{SCALE}_snaptable")


def ensure_snapshot_table(spark: SparkSession) -> str:
    """The t-small transcripts table as a snapshot/manifest table
    (pdf_inspector_spark.snapshots — the Iceberg analog): the pi_* gated
    queries read their input through ``snapshots.read``, so the scan's
    file list comes from the committed manifest, exactly like an Iceberg
    table scan on a real deployment (north rule: "Iceberg transcripts
    table"). Rebuilt from scratch whenever the corpus fingerprint
    changes; otherwise the committed snapshot is reused as-is."""
    from .. import snapshots
    from ..transcripts import corpus_fingerprint
    fp_path = os.path.join(SNAP_ROOT, "_FINGERPRINT")
    fp = corpus_fingerprint()
    if (snapshots.current_snapshot(SNAP_ROOT) is not None
            and os.path.exists(fp_path)):
        with open(fp_path, encoding="utf-8") as f:
            if f.read().strip() == fp:
                return SNAP_ROOT
    import shutil
    if os.path.exists(SNAP_ROOT):
        shutil.rmtree(SNAP_ROOT)
    tpath = write_transcripts(SCALE)
    snapshots.commit(spark.read.parquet(tpath), SNAP_ROOT, mode="append")
    with open(fp_path, "w", encoding="utf-8") as f:
        f.write(fp + "\n")
    return SNAP_ROOT


_RESULT_CACHE: dict = {}


def _pipeline_result(spark: SparkSession):
    """Run the pipeline once per session and reuse across the extraction
    queries (cached DataFrame of derived columns only — tiny).

    The cache stores (session, df) and hits only when the stored session
    IS the caller's session: keying on id() alone is unsound once a
    stopped session is garbage-collected and a new one reuses its id —
    the hit would hand out a DataFrame bound to a dead JVM context.
    (Holding the strong session ref also pins the id against reuse.)"""
    key = id(spark)
    hit = _RESULT_CACHE.get(key)
    if hit is not None and hit[0] is spark:
        return hit[1]
    # the dedup-aware plan is the production extraction plan; running
    # it here puts its FULL output schema (text, markdown, spans,
    # classification fields, quarantine rows) under every pi_* oracle.
    # The input is read THROUGH the snapshot/manifest layer (explicit
    # manifest file list, not a directory glob) — the Iceberg-analog
    # scan path, gated here end-to-end.
    from .. import snapshots
    from ..pipeline import run_pipeline_dedup, with_turn_order
    ensure_fixture_tables()
    df = snapshots.read(spark, ensure_snapshot_table(spark))
    out = with_turn_order(run_pipeline_dedup(df, with_markdown=True)).cache()
    _RESULT_CACHE[key] = (spark, out)
    return out


def _classify_counts(spark: SparkSession, sf_dir: str):
    return (_pipeline_result(spark)
            .groupBy("pdf_type")
            .agg(F.count("*").alias("n_turns"))
            .orderBy(F.col("pdf_type").asc_nulls_first()))


def _extract_turns(spark: SparkSession, sf_dir: str):
    return (_pipeline_result(spark)
            .select("conv_id", "turn_idx",
                    F.col("text_out").alias("text"))
            .orderBy("conv_id", "turn_idx"))


def _quarantine_counts(spark: SparkSession, sf_dir: str):
    return (_pipeline_result(spark)
            .where(F.col("error_kind").isNotNull())
            .groupBy("error_kind")
            .agg(F.count("*").alias("n_rows"))
            .orderBy("error_kind"))


def _markdown_turns(spark: SparkSession, sf_dir: str):
    return (_pipeline_result(spark)
            .select("conv_id", "turn_idx", "markdown")
            .orderBy("conv_id", "turn_idx"))


def _turn_rank(spark: SparkSession, sf_dir: str):
    return (_pipeline_result(spark)
            .select("conv_id", "turn_idx", "turn_rank")
            .orderBy("conv_id", "turn_idx"))


def _span_counts(spark: SparkSession, sf_dir: str):
    return (_pipeline_result(spark)
            .select("conv_id", "turn_idx",
                    F.coalesce(F.size("spans"), F.lit(0)).alias("n_spans"))
            .orderBy("conv_id", "turn_idx"))


def _dedup_extracted(spark: SparkSession, sf_dir: str):
    """Composition: extraction output → exact dedup of turn texts
    (the training-data pipeline pattern: extract, then dedup downstream
    on DERIVED text, never on raw payloads)."""
    return (_pipeline_result(spark)
            .where(F.col("text_out").isNotNull())
            .groupBy(F.sha2(F.col("text_out"), 256).alias("text_sha"))
            .agg(F.count("*").alias("n_copies"),
                 F.min(F.concat_ws(":", "conv_id",
                                   F.col("turn_idx").cast("string")))
                 .alias("keeper_turn"))
            .orderBy("text_sha"))


def _quality_extracted(spark: SparkSession, sf_dir: str):
    """Composition: extraction → integer quality score over the DERIVED
    turn text (same formula as text_quality_score, applied downstream of
    the pipeline instead of to raw documents)."""
    r = _pipeline_result(spark).where(F.col("text_out").isNotNull())
    n_chars = F.length("text_out")
    n_tokens = F.size(F.filter(F.split(F.col("text_out"), r"\s+"),
                               lambda x: x != ""))
    n_punct = n_chars - F.length(F.regexp_replace("text_out", "[.,;:!?]", ""))
    n_upper = n_chars - F.length(F.regexp_replace("text_out", "[A-Z]", ""))
    score = (
        F.when(n_tokens >= 50, 40).otherwise((n_tokens * 40) / F.lit(50)).cast("long")
        + F.when((n_tokens > 0) & (n_chars * 10).between(n_tokens * 30, n_tokens * 80), 30).otherwise(0)
        + F.when(n_punct * 10 <= n_chars, 20).otherwise(0)
        + F.when(n_upper * 5 <= n_chars, 10).otherwise(0))
    return (r.select("conv_id", "turn_idx",
                     n_chars.alias("n_chars"),
                     n_tokens.alias("n_tokens"),
                     score.alias("quality_score"))
            .orderBy("conv_id", "turn_idx"))


def _extract_digest(scale: str, expected_path: str):
    """Per-turn byte equality at `scale` under the hard hash gate,
    compacted to one md5 digest per conversation: digest = md5 over the
    conversation's turn texts in turn order, unit-separator-joined (NULL
    text -> empty). Any single-character drift in any turn flips its
    conversation's digest. r3 gated t-med (9,935 turns); r4 moved the
    registry entry to t-bench (205,770 turns — the scale the bench
    headlines measure), with t-med equality still pinned per-turn in
    tests/test_tmed_sweep.py."""
    def run(spark: SparkSession, sf_dir: str):
        from ..pipeline import run_pipeline_dedup
        from ..transcripts import write_transcripts
        tpath = write_transcripts(scale)
        _write_expected(scale, expected_path)  # the oracle's input
        df = spark.read.parquet(tpath)
        # the dedup-aware plan (distinct payloads only cross into Python)
        # is the production extraction plan; gating it here checks ITS
        # output byte-for-byte at this scale, not just the per-row plan's
        out = run_pipeline_dedup(df, with_markdown=True)
        view = f"digest_out_{scale.replace('-', '_')}"
        out.createOrReplaceTempView(view)
        return spark.sql(f"""
            SELECT conv_id,
                   COUNT(*) AS n_turns,
                   md5(array_join(transform(
                         array_sort(collect_list(struct(turn_idx,
                                                        coalesce(text_out, '')))),
                         s -> s.col2), chr(31))) AS turns_digest,
                   md5(array_join(transform(
                         array_sort(collect_list(struct(turn_idx,
                                                        coalesce(markdown, '')))),
                         s -> s.col2), chr(31))) AS markdown_digest
            FROM {view}
            GROUP BY conv_id
            ORDER BY conv_id
        """)
    return run


def _routing_selectivity(spark: SparkSession, sf_dir: str):
    return (_pipeline_result(spark)
            .agg(F.count("*").alias("n_turns"),
                 F.sum(F.when(F.col("pdf_type").isin("text_based", "mixed"), 1)
                       .otherwise(0)).alias("n_routable"),
                 F.sum(F.when(F.col("ocr_recommended"), 1).otherwise(0))
                 .alias("n_ocr_flagged"),
                 F.sum(F.when(F.col("text_out").isNotNull(), 1).otherwise(0))
                 .alias("n_extracted")))


def _register_all() -> None:
    # Registration is PURE (no filesystem writes): this module is imported
    # on executors when grouped-map functions unpickle, where the repo data
    # dir does not exist. Oracle inputs are materialized at contract-call
    # time (__spark_entry__.oracle_sql / the query functions themselves).
    exp = f"read_parquet('{EXPECTED_PATH}')"

    register("pi_classify_counts", _classify_counts, f"""
        SELECT pdf_type, COUNT(*) AS n_turns FROM {exp}
        GROUP BY pdf_type ORDER BY pdf_type NULLS FIRST
    """, "pipeline classification counts vs kernel-oracle fixtures")

    register("pi_extract_turns", _extract_turns, f"""
        SELECT conv_id, turn_idx, text FROM {exp}
        ORDER BY conv_id, turn_idx
    """, "per-turn extracted text — the byte-equality contract "
         "(window-ordered on conv_id, turn_idx)")

    register("pi_markdown_turns", _markdown_turns, f"""
        SELECT conv_id, turn_idx, markdown FROM {exp}
        ORDER BY conv_id, turn_idx
    """, "per-turn markdown — structure-stage equality contract")

    register("pi_quarantine_counts", _quarantine_counts, f"""
        SELECT error_kind, COUNT(*) AS n_rows FROM {exp}
        WHERE error_kind IS NOT NULL
        GROUP BY error_kind ORDER BY error_kind
    """, "quarantine-channel row counts by error kind")

    register("pi_turn_rank", _turn_rank, f"""
        SELECT conv_id, turn_idx,
               ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY turn_idx)
                 AS turn_rank
        FROM {exp} ORDER BY conv_id, turn_idx
    """, "stable turn-ordering contract: row_number over (conv_id, turn_idx)")

    register("pi_span_counts", _span_counts, f"""
        SELECT conv_id, turn_idx, n_spans FROM {exp}
        ORDER BY conv_id, turn_idx
    """, "per-turn span counts — span-output coverage of the contract")

    register("pi_dedup_extracted_turns", _dedup_extracted, f"""
        SELECT sha256(text) AS text_sha, COUNT(*) AS n_copies,
               MIN(conv_id || ':' || turn_idx::VARCHAR) AS keeper_turn
        FROM {exp}
        WHERE text IS NOT NULL
        GROUP BY sha256(text)
        ORDER BY text_sha
    """, "extraction → exact dedup composition over derived turn texts "
         "(full sha256 group key — see dedup.py collision rationale)")

    register("pi_quality_extracted", _quality_extracted, f"""
        WITH feats AS (
          SELECT conv_id, turn_idx,
                 length(text) AS n_chars,
                 len(list_filter(regexp_split_to_array(text, '\\s+'),
                                 x -> x <> '')) AS n_tokens,
                 length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct,
                 length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS n_upper
          FROM {exp} WHERE text IS NOT NULL
        )
        SELECT conv_id, turn_idx, n_chars, n_tokens,
               ((CASE WHEN n_tokens >= 50 THEN 40 ELSE n_tokens * 40 // 50 END)
                + (CASE WHEN n_tokens > 0 AND n_chars * 10
                         BETWEEN n_tokens * 30 AND n_tokens * 80 THEN 30 ELSE 0 END)
                + (CASE WHEN n_punct * 10 <= n_chars THEN 20 ELSE 0 END)
                + (CASE WHEN n_upper * 5 <= n_chars THEN 10 ELSE 0 END))::BIGINT
                 AS quality_score
        FROM feats
        ORDER BY conv_id, turn_idx
    """, "extraction → quality-score composition over derived turn text")

    # DuckDB SUM(int) yields HUGEINT (→ float64 through pandas) while Spark
    # yields BIGINT: cast every SUM to BIGINT so the driver hash gate agrees.
    # n_ocr_flagged counts the pipeline's own ocr_recommended flag (persisted
    # in the v6 fixture), not a pdf_type re-derivation.
    register("pi_extract_digest_tbench",
             _extract_digest("t-bench", EXPECTED_PATH_TBENCH), f"""
        SELECT conv_id,
               COUNT(*) AS n_turns,
               md5(string_agg(COALESCE(text, ''), chr(31)
                              ORDER BY turn_idx)) AS turns_digest,
               md5(string_agg(COALESCE(markdown, ''), chr(31)
                              ORDER BY turn_idx)) AS markdown_digest
        FROM read_parquet('{EXPECTED_PATH_TBENCH.replace("'", "''")}')
        GROUP BY conv_id
        ORDER BY conv_id
    """, "per-turn text AND markdown byte equality at t-bench (205,770 "
         "turns — the scale the bench headlines measure) compacted to "
         "per-conversation digests; runs the dedup-aware production plan")

    register("pi_routing_selectivity", _routing_selectivity, f"""
        SELECT COUNT(*) AS n_turns,
               CAST(SUM(CASE WHEN pdf_type IN ('text_based','mixed')
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_routable,
               CAST(SUM(CASE WHEN ocr_recommended THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_ocr_flagged,
               CAST(SUM(CASE WHEN text IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_extracted
        FROM {exp}
    """, "routing selectivity: routable / OCR-flagged / extracted counts")


_register_all()
