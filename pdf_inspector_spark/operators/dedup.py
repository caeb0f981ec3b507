"""Deduplication operators over the documents table: exact (hash-groupBy),
MinHash+LSH (shingle→minhash→band→bucket-join), SimHash, and n-gram
Jaccard verification.

Public-literature lineage: MinHash resemblance sketches (Broder 1997,
"On the resemblance and containment of documents"); banded LSH
(Indyk–Motwani 1998 / Leskovec-Rajaraman-Ullman, "Mining of Massive
Datasets" ch. 3); SimHash (Charikar 2002, STOC); connected components
by alternating star contraction (Kiveris et al. 2014, "Connected
Components in MapReduce and Beyond", SoCC).

Everything is column expressions — shingling, hashing, min-folding and
banding all run JVM-side via higher-order array functions, so the hot
path never leaves Tungsten. The band bucket join is the scale path: at
10^12 rows the candidate join shuffles only (band, key, doc_id), never
document text.

Degenerate-bucket guard (r3): real crawl corpora contain thousand-fold
EXACT duplicates; m byte-identical documents share every band bucket, so
an unguarded band self-join emits ~m²·bands junk candidate pairs from a
single hot payload. Every LSH pipeline here therefore
  (1) collapses exact duplicates to ONE representative per full-sha256
      content hash before shingling (exact-dup membership is the
      exact-dedup operator's output, not LSH's job), and
  (2) caps per-bucket membership at BUCKET_CAP before the self-join —
      a bucket that big after rep-collapse means the band key carries
      no discriminating information (candidate recall for its members
      is covered by the other bands).
tests/test_plan_shape.py asserts the 1k-identical-docs pathological
table produces O(k) candidate pairs, not O(m²).

MinHash hash = first 15 hex chars of md5 as bigint (same value in both
engines); content-identity keys use full sha256 (collision-resistant —
md5 chosen-prefix collisions are practical, see kernels/pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from . import load_views, materialize, register
from .textstats import DUCK_H64, SPARK_H64


def _sql(query: str):
    def run(spark: SparkSession, sf_dir: str):
        load_views(spark, sf_dir)
        return spark.sql(query)
    return run


_MERS = 2147483647  # 2^31 - 1

# 3-word shingles via a zip_with chain over three aligned slices.
# NOT transform(sequence(1, n-2), i -> ...element_at(ts, i)...): a lambda
# that CAPTURES the computed token array re-evaluates the array's whole
# expression chain per element once projection collapse inlines it
# (O(n²) per document — measured as a hang on a 120k-token doc).
# zip_with lambdas touch only their element variables, so the chain is
# linear regardless of how Catalyst collapses the projections.
_SH3 = ("zip_with(zip_with(slice(ts, 1, size(ts) - 2), "
        "slice(ts, 2, size(ts) - 2), (a, b) -> concat(a, ' ', b)), "
        "slice(ts, 3, size(ts) - 2), (a, b) -> concat(a, ' ', b))")

# LSH geometry — the SQL is GENERATED from (n_bands, rows_per_band), so a
# deployment tunes recall/precision without touching query text
# (candidate probability for a pair with Jaccard s:
# 1 - (1 - s^rows_per_band)^n_bands). Two geometries run under the gate:
N_BANDS = 4          # test-scale: 8 perms, keeps the sf0.01 oracle fast
ROWS_PER_BAND = 2
PROD_BANDS = 16      # production shape: 64 perms (dedup_minhash_prod)
PROD_ROWS = 4
BUCKET_CAP = 50      # degenerate-bucket guard (post-rep-collapse)

# Deterministic "re-crawl overlay": every 10th document reappears under a
# new doc_id (offset 10^6) with identical text — the cross-crawl
# duplication pattern a web-scale pipeline dedups. Derived purely from
# the input table (no synthesized data), identically in both engines, so
# duplicate-group outputs are non-vacuous (the raw sf tables contain no
# exact text duplicates).
_RECRAWL = """
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
"""

_DOCS = "SELECT doc_id, text FROM documents"


# -- exact dedup --------------------------------------------------------------
# Group key = FULL sha256 of the text (r3: the r2 version truncated md5 to
# 60 bits, where birthday collisions at the claimed 10^12-doc scale are
# expected in the thousands — silently merging non-duplicates). One gated
# query carries both the duplicate groups and the corpus cardinality
# stats (folded from the r2 dedup_exact_stats so the registry fits the
# driver's 50-query window).

# r7 (guide §2.4 "two operations keyed the same way can share one
# exchange"): both the per-hash groups and the corpus stats now derive
# from ONE `counts` aggregate keyed text_hash, so the two CTE
# references duplicate IDENTICAL hashpartitioning(text_hash) exchange
# subtrees and ReuseExchange computes the scan+sha256+partial-aggregate
# once. The r3–r6 form computed `hashed` twice: once into the groups
# aggregate, once into a COUNT(DISTINCT) whose expand-aggregate shape
# did not match, so the corpus was scanned and hashed twice per run.
# n_docs = SUM(n_copies), n_unique = COUNT(*) over counts — exact.
_EXACT_SPARK = f"""
WITH corpus AS ({_RECRAWL}),
counts AS (
  SELECT sha2(text, 256) AS text_hash, COUNT(*) AS n_copies,
         MIN(doc_id) AS keeper_doc_id
  FROM corpus
  GROUP BY sha2(text, 256)
),
stats AS (
  -- The count expression references keeper_doc_id so column pruning
  -- cannot drop min(doc_id) out of this branch's partial aggregate —
  -- which would make the two exchange subtrees differ and defeat
  -- ReuseExchange (verified in the executed plan). The CASE keeps the
  -- frozen oracle's COUNT(DISTINCT text_hash) NULL semantics exactly:
  -- a NULL-text group (NULL hash, non-NULL keeper) must NOT count
  -- toward n_unique.
  SELECT SUM(n_copies) AS n_docs,
         COUNT(CASE WHEN text_hash IS NOT NULL
               THEN keeper_doc_id END) AS n_unique,
         SUM(n_copies) - COUNT(CASE WHEN text_hash IS NOT NULL
                               THEN keeper_doc_id END) AS n_redundant
  FROM counts
)
SELECT c.text_hash, c.n_copies, c.keeper_doc_id,
       s.n_docs, s.n_unique, s.n_redundant
FROM counts c CROSS JOIN stats s
WHERE c.n_copies > 1
ORDER BY text_hash
"""

# The ORACLE text is FROZEN verbatim at its round-start form (the
# driver fingerprints oracle SQL; only the Spark side above was
# restructured — both compute the identical result set). Do NOT derive
# this from _EXACT_SPARK again.
_EXACT_DUCK = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
),
hashed AS (
  SELECT doc_id, sha256(text) AS text_hash FROM corpus
),
stats AS (
  SELECT COUNT(*) AS n_docs,
         COUNT(DISTINCT text_hash) AS n_unique,
         COUNT(*) - COUNT(DISTINCT text_hash) AS n_redundant
  FROM hashed
),
groups AS (
  SELECT text_hash, COUNT(*) AS n_copies, MIN(doc_id) AS keeper_doc_id
  FROM hashed
  GROUP BY text_hash
  HAVING COUNT(*) > 1
)
SELECT g.text_hash, g.n_copies, g.keeper_doc_id,
       s.n_docs, s.n_unique, s.n_redundant
FROM groups g CROSS JOIN stats s
ORDER BY text_hash
"""

register("dedup_exact_groups", _sql(_EXACT_SPARK), _EXACT_DUCK,
         "exact duplicate groups via full-sha256 groupBy (map-side "
         "combine) over a deterministic re-crawl overlay, plus corpus "
         "cardinality stats (non-vacuous)")


# -- MinHash + LSH ------------------------------------------------------------
# 3-word shingles → ONE md5-60bit hash per shingle → minhash permutations
# via multiplicative mixing mod the Mersenne prime 2^31-1 (values stay
# < 2^36, safe under ANSI arithmetic; identical in both engines) → bands
# → candidate pairs sharing any surviving band bucket.


def bands_chain_spark(corpus_sql: str, n_bands: int, rows_per_band: int,
                      cap: int = BUCKET_CAP, fanout: int = 64) -> str:
    """CTE chain (Spark SQL) ending in `bands(doc_id, b, bkey)` (with a
    `buckets(b, bkey, ds)` stage just below it):
    rep-collapse → repartition(fanout) → shingle → explode → hash →
    minhash (grouped MIN aggregates) → band → bucket collect + cap.

    The explicit REPARTITION after the rep-collapse is load-bearing
    (r4, measured): AQE coalesces shuffle reads by map-output BYTES,
    and the rep-collapse exchange carries only ~1.3 MB of compressed
    text at sf0.1 — so the CPU-dense shingle→hash→minhash stage above
    it collapsed to ONE task carrying ~3 CPU-seconds of fold work
    (the capped-bands subquery measured 3.0 s wall on a 32-core box,
    ~1.0 s after the fix; the residual is per-task setup — a fanout
    sweep measured 16/32/64 partitions statistically tied, so fanout
    stays moderate rather than maximal). An explicit partition count is
    exempt from AQE coalescing; bands_df passes 2×defaultParallelism.
    The same bytes-vs-CPU mismatch exists at 10^12 rows — derived-work
    stages must partition by expected CPU, not by exchange bytes.

    r7 (optimization guide §4.1 "prefer codegen over interpreted"):
    the minhash fold is {n_perms} codegen'd MIN aggregates over the
    EXPLODED shingle-hash rows, not an interpreted aggregate/zip_with
    lambda chain over a per-doc array. Measured at sf1.0 (50k docs,
    ~2.6M shingles, 64 perms): the interpreted fold alone cost ~1.5 s
    wall on 32 cores (~170M lambda invocations through Catalyst's
    interpreter); the grouped-MIN formulation runs inside
    WholeStageCodegen and, because the explode preserves the
    REPARTITION(doc_id) partitioning, the GROUP BY doc_id needs NO new
    exchange. min() over the permuted hash multiset is order- and
    duplicate-insensitive, so values are bit-identical to the fold.

    r7 candidate generation: the capped band rows are grouped once into
    bucket member arrays (exchange-free — the cap window's partitioning
    is the group's clustering; arrays bounded by the cap, so the
    collect buffer is always small) and pairs come from in-bucket
    combination explosion — no band-table self-join, which also removes
    the need to checkpoint the band table. The cap itself STAYS a
    window count (spillable sort): a HAVING over the collect aggregate
    was tried and rejected because a degenerate mega-bucket would
    materialize its whole member list in one unspillable aggregation
    buffer before being dropped."""
    return f"""
corpus AS ({corpus_sql}),
reps AS (
  -- keeper election via map-side-combinable aggregate, NOT a
  -- ROW_NUMBER window: the window shuffles EVERY row's payload to its
  -- hash partition, while partial aggregation moves each distinct
  -- payload across the exchange once per task (all texts in a group
  -- are byte-identical under the sha256+length key, so FIRST is exact)
  SELECT MIN(doc_id) AS doc_id, FIRST(text) AS text
  FROM corpus
  GROUP BY sha2(text, 256), length(text)
),
toks AS (
  -- repartition the RAW rows; tokenize in a projection ABOVE the
  -- exchange so the regex split runs at fanout parallelism, not on the
  -- AQE-coalesced (bytes-sized, ~2-partition) rep-collapse output
  SELECT doc_id, filter(split(lower(text), '\\\\s+'), x -> x != '') AS ts
  FROM (SELECT /*+ REPARTITION({fanout}, doc_id) */ doc_id, text
        FROM reps)
),
sh AS (
  -- per-doc FIRST aggregate (exchange-free: input is already
  -- hash-partitioned by doc_id) serving as a predicate-pushdown
  -- BARRIER: the explode below makes the optimizer infer a
  -- size(shingles) > 0 filter, and without the barrier that filter is
  -- substituted through the projections and re-evaluates the whole
  -- tokenize→shingle→array_distinct chain ~3× BELOW the fanout
  -- exchange (measured at sf1.0: +0.8 s wall on the 2 coalesced
  -- pre-exchange partitions). The <3-token guard is the empty array —
  -- explode of an empty array emits nothing, exactly the old
  -- WHERE size(ts) >= 3 semantics (and no longer a pushable filter).
  SELECT doc_id,
         FIRST(CASE WHEN size(ts) >= 3 THEN array_distinct({_SH3})
               ELSE array() END) AS shingles
  FROM toks
  GROUP BY doc_id
),
{_bands_tail(n_bands, rows_per_band, cap, src='sh')}"""


def _bands_tail(n_bands: int, rows_per_band: int, cap: int,
                src: str) -> str:
    """The hash→minhash→band→bucket tail of the chain, over any source
    relation with (doc_id, shingles) columns — shared between the full
    corpus chain (src='sh') and the jaccard family, which materializes
    ONE shingle table and feeds it to both the band chain and the
    verification joins (r7: previously the chain rebuilt reps→tokenize→
    shingles from scratch next to the materialized jac_sh — a whole
    duplicate pass)."""
    n_perms = n_bands * rows_per_band
    bkey = SPARK_H64.format(
        x=f"concat_ws(':', transform(sequence(1, {rows_per_band}), "
          f"r -> cast(element_at(mins, b*{rows_per_band}+r) AS STRING)))")
    mins_aggs = ", ".join(
        f"MIN((h * {2 * j + 1} + {j} * 1000003L) % {_MERS})"
        for j in range(n_perms))
    return f"""hs AS (
  SELECT doc_id, {SPARK_H64.format(x='s')} % {_MERS} AS h
  FROM {src}
  LATERAL VIEW explode(shingles) AS s
),
-- minhash as {n_perms} grouped MIN aggregates (codegen'd; exchange-free
-- because explode preserves the REPARTITION(doc_id) partitioning)
mh AS (
  SELECT doc_id, array({mins_aggs}) AS mins
  FROM hs
  GROUP BY doc_id
),
bands0 AS (
  SELECT doc_id, b, {bkey} AS bkey
  FROM mh
  LATERAL VIEW explode(sequence(0, {n_bands - 1})) AS b
),
-- bucket cap as a WINDOW count (spillable sort), NOT a HAVING over a
-- collect_list aggregate: a degenerate mega-bucket (millions of
-- byte-distinct docs with one token stream) must be DROPPED without
-- ever materializing its member list in a single unspillable
-- aggregation buffer. The member collect below therefore only ever
-- sees buckets already capped at {cap} members.
bands AS (
  SELECT doc_id, b, bkey FROM (
    SELECT doc_id, b, bkey, COUNT(*) OVER (PARTITION BY b, bkey) AS bsz
    FROM bands0) sized
  WHERE bsz <= {cap}
),
buckets AS (
  -- exchange-free: the window's hashpartitioning(b, bkey) is exactly
  -- this group's clustering; arrays bounded by the cap above
  SELECT b, bkey, sort_array(collect_list(doc_id)) AS ds
  FROM bands
  GROUP BY b, bkey
)"""


def bands_chain_duck(corpus_sql: str, n_bands: int, rows_per_band: int,
                     cap: int = BUCKET_CAP) -> str:
    """Same chain for the DuckDB oracle."""
    n_perms = n_bands * rows_per_band
    bkey = DUCK_H64.format(
        x=f"array_to_string(list_transform(range(1, {rows_per_band + 1}), "
          f"r -> mins[(b*{rows_per_band}+r)::int]::VARCHAR), ':')")
    return f"""
corpus AS ({corpus_sql}),
reps AS (
  SELECT MIN(doc_id) AS doc_id, FIRST(text) AS text
  FROM corpus
  GROUP BY sha256(text), length(text)
),
toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS ts
  FROM reps
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(ts) - 1),
             i -> ts[i::int] || ' ' || ts[i::int + 1] || ' ' || ts[i::int + 2])) AS shingles
  FROM toks WHERE len(ts) >= 3
),
hs AS (
  SELECT doc_id,
         list_transform(shingles, s -> {DUCK_H64.format(x='s')} % {_MERS}) AS hashes
  FROM sh
),
mh AS (
  SELECT doc_id,
         list_transform(range(0, {n_perms}),
             j -> list_min(list_transform(hashes,
                 h -> (h * (2*j + 1) + j * 1000003) % {_MERS}))) AS mins
  FROM hs
),
bands0 AS (
  SELECT doc_id, b, {bkey} AS bkey
  FROM mh, (SELECT unnest(range(0, {n_bands})) AS b)
),
bands AS (
  SELECT doc_id, b, bkey FROM (
    SELECT doc_id, b, bkey, COUNT(*) OVER (PARTITION BY b, bkey) AS bsz
    FROM bands0) sized
  WHERE bsz <= {cap}
)"""


def _pairs_duck(corpus_sql: str, n_bands: int, rows_per_band: int,
                cap: int = BUCKET_CAP) -> str:
    return f"""
WITH {bands_chain_duck(corpus_sql, n_bands, rows_per_band, cap)}
SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
FROM bands a JOIN bands c
  ON a.b = c.b AND a.bkey = c.bkey AND a.doc_id < c.doc_id
ORDER BY doc_a, doc_b
"""


def _cpu_fanout(spark) -> int:
    """Back-compat alias — the shared implementation lives in
    operators.cpu_fanout (textstats/similarity need it too and dedup
    imports from textstats, so it cannot live here)."""
    from . import cpu_fanout
    return cpu_fanout(spark)


def bands_df(spark, sf_dir: str, corpus_sql: str, n_bands: int,
             rows_per_band: int, cap: int = BUCKET_CAP):
    """The guarded band-signature table (doc_id, b, bkey).

    r7: no longer checkpointed here — candidate generation is an
    in-bucket pair explosion (candidate_pairs below), not a band-table
    self-join, so the shingle→hash→minhash subtree has exactly ONE
    consumer and materializing it would only add an extra pass.
    Iterative consumers (star contraction) still materialize their
    edge tables via operators.materialize."""
    load_views(spark, sf_dir)
    chain = bands_chain_spark(corpus_sql, n_bands, rows_per_band, cap,
                              fanout=_cpu_fanout(spark))
    return spark.sql(f"WITH {chain} SELECT doc_id, b, bkey FROM bands")


# Pair explosion over a sorted bucket-member array: (ds[i], ds[j]) for
# all i < j — doc_a < doc_b for free because ds is sorted ascending.
_PAIRS_EXPR = ("flatten(transform(ds, (x, i) -> "
               "transform(slice(ds, i + 2, size(ds)), "
               "y -> struct(x AS doc_a, y AS doc_b))))")


def candidate_pairs(bands):
    """Distinct rep-level candidate pairs sharing any band bucket.

    r7 (optimization guide §2.4 "remove shuffles outright"): the band
    bucket members are collected per (b, bkey) group and pairs emitted
    by exploding in-bucket combinations — replacing the former
    band-table self-join, which needed the band table checkpointed and
    broadcast plus two join-side scans. The bucket cap bounds every
    member list at BUCKET_CAP, so the per-group pair fan-out is ≤
    C(cap, 2). Output is identical: pairs (a < b) co-bucketed in ≥1
    band, de-duplicated across bands."""
    import pyspark.sql.functions as F
    return (bands.groupBy("b", "bkey")
            .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
            .where(F.size("ds") >= 2)
            .select(F.explode(F.expr(_PAIRS_EXPR)).alias("p"))
            .select(F.col("p.doc_a").alias("doc_a"),
                    F.col("p.doc_b").alias("doc_b"))
            .distinct())


def candidate_pairs_df(spark, sf_dir: str, corpus_sql: str, n_bands: int,
                       rows_per_band: int, cap: int = BUCKET_CAP):
    """Candidate pairs straight from the chain's `buckets` stage —
    skips the explode→regroup round trip candidate_pairs(bands_df(...))
    would do (identical output; candidate_pairs stays the generic
    entry point for an arbitrary band table)."""
    load_views(spark, sf_dir)
    chain = bands_chain_spark(corpus_sql, n_bands, rows_per_band, cap,
                              fanout=_cpu_fanout(spark))
    return spark.sql(f"""
WITH {chain}
SELECT DISTINCT doc_a, doc_b
FROM (SELECT inline({_PAIRS_EXPR}) FROM buckets WHERE size(ds) >= 2) p
""")


def _minhash_spark(spark, sf_dir: str):
    return candidate_pairs_df(spark, sf_dir, _DOCS, N_BANDS,
                              ROWS_PER_BAND).orderBy("doc_a", "doc_b")


register("dedup_minhash_lsh", _minhash_spark,
         _pairs_duck(_DOCS, N_BANDS, ROWS_PER_BAND),
         f"MinHash({N_BANDS * ROWS_PER_BAND})+LSH({N_BANDS} bands×"
         f"{ROWS_PER_BAND} rows) candidate pairs; rep-collapse + bucket "
         "cap guard; codegen'd grouped-MIN minhash, pairs by in-bucket "
         "explosion (no band self-join); only (band, key, doc_id) ever "
         "shuffles")


def _minhash_prod_spark(spark, sf_dir: str):
    """Production geometry (64 perms as 16×4) over the re-crawl overlay —
    the exact-duplicate rep-collapse is non-vacuous here (the 50 overlay
    copies collapse to their originals before shingling)."""
    return candidate_pairs_df(spark, sf_dir, _RECRAWL, PROD_BANDS,
                              PROD_ROWS).orderBy("doc_a", "doc_b")


register("dedup_minhash_prod", _minhash_prod_spark,
         _pairs_duck(_RECRAWL, PROD_BANDS, PROD_ROWS),
         f"MinHash({PROD_BANDS * PROD_ROWS})+LSH({PROD_BANDS} bands×"
         f"{PROD_ROWS} rows) — the production geometry — over the "
         "re-crawl overlay; exercises the degenerate-bucket guard "
         "(exact dups collapse to one representative)")


# -- SimHash ------------------------------------------------------------------
# 16-bit SimHash over distinct-token hashes: bit b set iff the majority of
# token hashes have bit b set.

# r7 (guide §4.1, §2.5): the r2–r6 form ran an interpreted
# aggregate/zip_with fold over a per-doc hash array — ~43M lambda
# invocations at sf1.0 — on the RAW documents scan, whose parallelism is
# the parquet row-group count (2 at sf1.0), so 0.8 s wall on 2 of 32
# cores. Now: fanout repartition of the raw rows, tokenize above the
# exchange, a per-doc FIRST-aggregate barrier (exchange-free; stops the
# explode-inferred size(ts)>0 filter from re-evaluating the tokenize
# chain below the exchange), then 16 codegen'd SUM aggregates over the
# exploded token hashes. SUM of ±1 terms is order-insensitive and exact,
# so the per-bit majority vote — and the assembled simhash — is
# bit-identical to the fold.
_SIMHASH_BITS = ", ".join(
    f"SUM((shiftright(h, {b}) & 1L) * 2L - 1L) AS c{b}" for b in range(16))
_SIMHASH_ASSEMBLE = " + ".join(
    f"(CASE WHEN c{b} > 0 THEN {1 << b}L ELSE 0L END)" for b in range(16))

_SIMHASH_SPARK = f"""
WITH toks AS (
  SELECT doc_id,
         array_distinct(filter(split(lower(text), '\\\\s+'), x -> x != '')) AS ts
  FROM (SELECT /*+ REPARTITION({{fanout}}, doc_id) */ doc_id, text
        FROM documents)
),
tsb AS (
  SELECT doc_id, FIRST(ts) AS ts FROM toks GROUP BY doc_id
),
hx AS (
  SELECT doc_id, {SPARK_H64.format(x='t')} AS h
  FROM tsb
  LATERAL VIEW explode(ts) AS t
),
cnt AS (
  SELECT doc_id, {_SIMHASH_BITS}
  FROM hx
  GROUP BY doc_id
)
SELECT doc_id, {_SIMHASH_ASSEMBLE} AS simhash
FROM cnt
ORDER BY doc_id
"""


def _simhash_spark(spark: SparkSession, sf_dir: str):
    load_views(spark, sf_dir)
    return spark.sql(_SIMHASH_SPARK.format(fanout=_cpu_fanout(spark)))

_SIMHASH_DUCK = f"""
WITH toks AS (
  SELECT doc_id,
         list_distinct(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                   x -> x <> '')) AS ts
  FROM documents
),
hs AS (
  SELECT doc_id, list_transform(ts, t -> {DUCK_H64.format(x='t')}) AS hashes
  FROM toks WHERE len(ts) > 0
)
SELECT doc_id,
       list_sum(list_transform(range(0, 16),
         b -> CASE WHEN list_sum(list_transform(hashes,
                        h -> ((h >> b::int) & 1) * 2 - 1)) > 0
                   THEN (1::BIGINT << b::int) ELSE 0 END))::BIGINT AS simhash
FROM hs
ORDER BY doc_id
"""

register("dedup_simhash", _simhash_spark, _SIMHASH_DUCK,
         "16-bit SimHash per document (majority vote over token-hash bits)")


# -- n-gram Jaccard verification ----------------------------------------------
# Exact Jaccard over distinct 3-gram sets, computed ONLY for the guarded
# LSH candidate pairs — never all pairs within a block. At 10^12 rows the
# pairwise work is bounded by the capped LSH collision count. The shingle
# table is materialized once and joined back to both sides of each
# candidate pair.

def _shingles_spark_sql(fanout: int = 64) -> str:
    # same repartition-raw-rows + per-doc-aggregate-barrier structure as
    # bands_chain_spark (see its docstrings): tokenize above the fanout
    # exchange, and no pushable size(ts) filter — the final
    # size(shingles) > 0 filter sits on the aggregate's output column,
    # which cannot be substituted below it (it is exactly the old
    # WHERE size(ts) >= 3 row set: ≥3 tokens ⇒ ≥1 shingle).
    return f"""
WITH reps AS (
  SELECT MIN(doc_id) AS doc_id, FIRST(text) AS text
  FROM documents
  GROUP BY sha2(text, 256), length(text)
),
toks AS (
  SELECT doc_id, filter(split(lower(text), '\\\\s+'), x -> x != '') AS ts
  FROM (SELECT /*+ REPARTITION({fanout}, doc_id) */ doc_id, text
        FROM reps)
),
gb AS (
  SELECT doc_id,
         FIRST(CASE WHEN size(ts) >= 3 THEN array_distinct({_SH3})
               ELSE array() END) AS shingles
  FROM toks
  GROUP BY doc_id
)
SELECT doc_id, shingles FROM gb WHERE size(shingles) > 0
"""

_VERIFY_SPARK = """
WITH scored AS (
  SELECT cand.doc_a, cand.doc_b,
         size(array_intersect(x.shingles, y.shingles)) AS n_inter,
         size(x.shingles) + size(y.shingles) AS sz
  FROM jac_cand cand JOIN jac_sh x ON x.doc_id = cand.doc_a
            JOIN jac_sh y ON y.doc_id = cand.doc_b
)
SELECT doc_a, doc_b, n_inter,
       sz - n_inter AS n_union,
       CAST(n_inter * 1000 AS BIGINT) DIV (sz - n_inter) AS jaccard_milli
FROM scored
WHERE n_inter * 10 >= sz - n_inter
ORDER BY doc_a, doc_b
"""


def _pairs_from_view(spark, shingle_view: str, n_bands: int,
                     rows_per_band: int, cap: int = BUCKET_CAP):
    """Candidate pairs from an existing (doc_id, shingles) relation —
    lets the jaccard family reuse its materialized shingle table for
    the band chain instead of rebuilding reps→tokenize→shingles (r7:
    that duplicate pass cost ~0.5 s of the 1.3 s jaccard total at
    sf0.1). Band/bucket/pair semantics identical to candidate_pairs_df:
    docs excluded by the view's size filter had no shingles and never
    produced band rows anyway."""
    chain = _bands_tail(n_bands, rows_per_band, cap, src=shingle_view)
    return spark.sql(f"""
WITH {chain}
SELECT DISTINCT doc_a, doc_b
FROM (SELECT inline({_PAIRS_EXPR}) FROM buckets WHERE size(ds) >= 2) p
""")


def _jaccard_spark(spark, sf_dir: str):
    """ONE materialized shingle table (operators.materialize — persisted
    intermediate) feeds all three consumers: the band chain and both
    verification join sides."""
    load_views(spark, sf_dir)
    sh = materialize(spark.sql(_shingles_spark_sql(_cpu_fanout(spark))))
    sh.createOrReplaceTempView("jac_sh")
    _pairs_from_view(spark, "jac_sh", N_BANDS, ROWS_PER_BAND) \
        .createOrReplaceTempView("jac_cand")
    return spark.sql(_VERIFY_SPARK)


_JACCARD_DUCK = f"""
WITH {bands_chain_duck(_DOCS, N_BANDS, ROWS_PER_BAND)},
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
  FROM bands a JOIN bands c
    ON a.b = c.b AND a.bkey = c.bkey AND a.doc_id < c.doc_id
),
scored AS (
  SELECT cand.doc_a, cand.doc_b,
         len(list_filter(x.shingles, s -> list_contains(y.shingles, s))) AS n_inter,
         len(x.shingles) + len(y.shingles) AS sz
  FROM cand JOIN sh x ON x.doc_id = cand.doc_a
            JOIN sh y ON y.doc_id = cand.doc_b
)
SELECT doc_a, doc_b, n_inter,
       sz - n_inter AS n_union,
       (n_inter * 1000) // (sz - n_inter) AS jaccard_milli
FROM scored
WHERE n_inter * 10 >= sz - n_inter
ORDER BY doc_a, doc_b
"""

register("dedup_ngram_jaccard", _jaccard_spark, _JACCARD_DUCK,
         "exact 3-gram Jaccard verification over guarded LSH candidate "
         "pairs only (integer milli-Jaccard ≥ 0.1; no unbounded pairwise "
         "block)")


# -- duplicate clusters: connected components over LSH candidate edges --------
# The full dedup story: LSH candidate pairs are EDGES; duplicate groups
# are the connected components. Two formulations exist; ONE is gated:
#
# - `label_propagation_components` (below) — iterative min-label
#   propagation, one broadcastable aggregation+join per round, converging
#   in O(diameter) rounds. Retired from the driver registry in r3 (the
#   star variant strictly dominates at scale); still crosschecked against
#   the recursive-CTE oracle by tests/test_retired_ops.py.
# - `dedup_cluster_star` — alternating large-star / small-star
#   contraction (Kiveris et al.): O(log n) rounds independent of
#   component DIAMETER — the difference between 8 and 10^4 rounds on a
#   10^12-row near-dup chain.


def label_propagation_components(spark, sf_dir: str):
    import pyspark.sql.functions as F

    bands = bands_df(spark, sf_dir, _DOCS, N_BANDS, ROWS_PER_BAND)
    edges = materialize(
        candidate_pairs(bands)
        .select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
        "lp_edges")
    # undirected adjacency
    adj = edges.union(edges.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst")))
    labels = (edges.select(F.col("src").alias("doc_id"))
              .union(edges.select(F.col("dst").alias("doc_id")))
              .distinct()
              .withColumn("label", F.col("doc_id")))
    for _ in range(12):  # > graph diameter at any realistic cluster size
        neighbor_min = (adj.join(labels, adj.dst == labels.doc_id)
                        .groupBy("src").agg(F.min("label").alias("nmin")))
        new_labels = (labels.join(neighbor_min,
                                  labels.doc_id == neighbor_min.src, "left")
                      .select(F.col("doc_id"),
                              F.least(F.col("label"),
                                      F.coalesce(F.col("nmin"), F.col("label")))
                              .alias("label")))
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "doc_id")
                   .where(F.col("n.label") != F.col("o.label")).count())
        labels = materialize(new_labels, "lp_labels")
        if changed == 0:
            break
    return (labels.select(F.col("doc_id"),
                          F.col("label").alias("cluster_id"))
            .orderBy("doc_id"))


_CLUSTER_DUCK = """
WITH RECURSIVE
{bands_chain},
edges AS (
  SELECT DISTINCT a.doc_id AS src, c.doc_id AS dst
  FROM bands a JOIN bands c
    ON a.b = c.b AND a.bkey = c.bkey AND a.doc_id < c.doc_id
),
adj AS (
  SELECT src, dst FROM edges
  UNION ALL
  SELECT dst AS src, src AS dst FROM edges
),
nodes AS (SELECT DISTINCT src AS doc_id FROM adj),
reach(node, r) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT a.dst, reach.r FROM reach JOIN adj a ON a.src = reach.node
)
SELECT node AS doc_id, MIN(r) AS cluster_id
FROM reach GROUP BY node ORDER BY doc_id
"""


def _cluster_duck_sql() -> str:
    return _CLUSTER_DUCK.format(
        bands_chain=bands_chain_duck(_DOCS, N_BANDS, ROWS_PER_BAND))


# -- duplicate clusters, star-contraction variant ------------------------------


def star_components(edges, nodes, max_rounds: int = 20):
    """Alternating large-star/small-star contraction over an edge
    DataFrame (u, v) → (doc_id, cluster_id) labels for every node in
    ``nodes``. Returns (labels_df, rounds_used). Each round is two
    groupBy+join passes; converges in O(log n) rounds regardless of
    component diameter. Raises RuntimeError if the edge set has not
    converged after max_rounds (silent wrong labels are worse than a
    loud failure — tune max_rounds upward for adversarial graphs)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Observation

    def large_star(e):
        # undirected neighborhood; attach strictly-greater neighbors to
        # the neighborhood minimum
        nbr = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (nbr.groupBy("u")
                .agg(F.least(F.min("v"), F.first("u")).alias("m")))
        return (nbr.where(F.col("v") > F.col("u"))
                .join(mins, "u")
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .where(F.col("u") != F.col("v"))
                .distinct())

    def small_star(e):
        # orient child -> smaller parent; attach all smaller neighbors
        # (and the node itself) to the minimum parent
        d = e.select(F.greatest("u", "v").alias("u"),
                     F.least("u", "v").alias("v"))
        mins = d.groupBy("u").agg(F.min("v").alias("m"))
        attach_parents = (d.join(mins, "u")
                          .where(F.col("v") != F.col("m"))
                          .select(F.col("v").alias("u"),
                                  F.col("m").alias("v")))
        attach_self = mins.select(F.col("u"), F.col("m").alias("v"))
        return (attach_parents.union(attach_self)
                .where(F.col("u") != F.col("v"))
                .distinct())

    def marker_exprs():
        # Order-independent EXACT edge-set marker: count + two xors of
        # INDEPENDENT per-edge hashes (the seed literal changes the
        # xxhash64 digest entirely). xor alone can spuriously collide on
        # a changed edge set (pairs cancel); an undetected same-marker
        # change now needs a simultaneous collision in both independent
        # xors AND the count. xor never overflows, so the marker is safe
        # under ANSI arithmetic at any edge count (the r3 version summed
        # ~1e9-magnitude terms, which overflows BIGINT past ~9.2e9 edges
        # — ADVICE r3). Both aggregates are task-order-independent
        # (count sums, xor commutes), so collecting them as observed
        # metrics during the materialize action yields the exact tuple
        # the old standalone marker job computed.
        return [F.count(F.lit(1)).alias("n"),
                F.expr("bit_xor(xxhash64(u, v))").alias("h"),
                F.expr("bit_xor(xxhash64(u, v, 8191))").alias("h2")]

    prev = None
    converged = False
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        # The marker rides the materialize action as observed metrics
        # (CollectMetrics): one job per round where the r7-start form ran
        # materialize + a separate full-edge-set aggregate scan — at
        # scale that second read pass per round is the saving. The
        # metrics node is top-of-plan (above the distinct's exchange),
        # so it executes in the result stage, where accumulator updates
        # are exactly-once even under task retries.
        obs = Observation()
        edges = materialize(
            small_star(large_star(edges)).observe(obs, *marker_exprs()),
            "star_edges")
        m = obs.get
        fp = (m["n"], m["h"], m["h2"])
        if fp == prev:
            converged = True
            break
        prev = fp
    if not converged:
        raise RuntimeError(
            f"star_components: edge set still changing after {max_rounds} "
            "rounds — raise max_rounds (components need O(log n) rounds)")
    # converged: every non-root points directly at its component root
    final = edges.select(F.col("u").alias("doc_id"),
                         F.col("v").alias("root"))
    labels = (nodes.join(final, "doc_id", "left")
              .select(F.col("doc_id"),
                      F.coalesce(F.col("root"), F.col("doc_id"))
                      .alias("cluster_id")))
    return labels, rounds


def _cluster_star_spark(spark, sf_dir: str):
    import pyspark.sql.functions as F

    edges = materialize(
        candidate_pairs_df(spark, sf_dir, _DOCS, N_BANDS, ROWS_PER_BAND)
        .select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v")),
        "star_in_edges")
    nodes = materialize(
        edges.select(F.col("u").alias("doc_id"))
        .union(edges.select(F.col("v").alias("doc_id"))).distinct(),
        "star_nodes")
    labels, _rounds = star_components(edges, nodes)
    return labels.orderBy("doc_id")


register("dedup_cluster_star", _cluster_star_spark, _cluster_duck_sql(),
         "duplicate clusters via alternating large-star/small-star "
         "contraction — O(log n) rounds vs O(diameter) for label "
         "propagation; recursive-CTE oracle; guarded LSH edges")


# -- the composed dedup pipeline (VERDICT r4 item 7) ---------------------------
# What a production pipeline actually ships, end to end in ONE gated
# query: guarded LSH candidates → exact-Jaccard VERIFIED edges
# (jaccard_milli ≥ VERIFY_MILLI — candidates alone over-merge: banding is
# probabilistic, verification is exact) → connected components by star
# contraction → keeper election (the component minimum; star roots ARE
# the component minima, so is_keeper = (doc_id = cluster_id)). Every
# stage reuses the guarded builders above; nothing here is new machinery,
# only the composition.

VERIFY_MILLI = 800  # exact-Jaccard acceptance threshold (0.8)


def _verified_clusters_spark(spark, sf_dir: str):
    import pyspark.sql.functions as F

    load_views(spark, sf_dir)
    sh = materialize(spark.sql(_shingles_spark_sql(_cpu_fanout(spark))))
    sh.createOrReplaceTempView("jac_sh")
    _pairs_from_view(spark, "jac_sh", N_BANDS, ROWS_PER_BAND) \
        .createOrReplaceTempView("jac_cand")
    verified = spark.sql(_VERIFY_SPARK)
    edges = materialize(
        verified.where(F.col("jaccard_milli") >= VERIFY_MILLI)
        .select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v")),
        "vc_edges")
    nodes = materialize(
        edges.select(F.col("u").alias("doc_id"))
        .union(edges.select(F.col("v").alias("doc_id"))).distinct(),
        "vc_nodes")
    labels, _rounds = star_components(edges, nodes)
    counts = labels.groupBy("cluster_id").agg(
        F.count("*").alias("n_members"))
    return (labels.join(counts, "cluster_id")
            .select("doc_id", "cluster_id", "n_members",
                    (F.col("doc_id") == F.col("cluster_id"))
                    .alias("is_keeper"))
            .orderBy("doc_id"))


_VERIFIED_CLUSTERS_DUCK = f"""
WITH RECURSIVE
{bands_chain_duck(_DOCS, N_BANDS, ROWS_PER_BAND)},
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
  FROM bands a JOIN bands c
    ON a.b = c.b AND a.bkey = c.bkey AND a.doc_id < c.doc_id
),
scored AS (
  SELECT cand.doc_a, cand.doc_b,
         len(list_filter(x.shingles, s -> list_contains(y.shingles, s))) AS n_inter,
         len(x.shingles) + len(y.shingles) AS sz
  FROM cand JOIN sh x ON x.doc_id = cand.doc_a
            JOIN sh y ON y.doc_id = cand.doc_b
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM scored
  WHERE n_inter * 10 >= sz - n_inter
    AND (n_inter * 1000) // (sz - n_inter) >= {VERIFY_MILLI}
),
adj AS (
  SELECT src, dst FROM edges
  UNION ALL
  SELECT dst AS src, src AS dst FROM edges
),
nodes AS (SELECT DISTINCT src AS doc_id FROM adj),
reach(node, r) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT a.dst, reach.r FROM reach JOIN adj a ON a.src = reach.node
),
labels AS (
  SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node
),
counts AS (
  SELECT cluster_id, COUNT(*) AS n_members FROM labels GROUP BY cluster_id
)
SELECT l.doc_id, l.cluster_id, c.n_members,
       l.doc_id = l.cluster_id AS is_keeper
FROM labels l JOIN counts c USING (cluster_id)
ORDER BY l.doc_id
"""

register("dedup_verified_clusters", _verified_clusters_spark,
         _VERIFIED_CLUSTERS_DUCK,
         f"the composed dedup pipeline: guarded LSH candidates → exact-"
         f"Jaccard verified edges (≥ {VERIFY_MILLI}‰) → star-contraction "
         "components → keeper election (component minimum)")
