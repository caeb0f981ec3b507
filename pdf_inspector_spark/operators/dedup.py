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

Hash = first 15 hex chars of md5 as bigint (same value in both engines).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from . import load_views, register
from .textstats import DUCK_H64, SPARK_H64


def _sql(query: str):
    def run(spark: SparkSession, sf_dir: str):
        load_views(spark, sf_dir)
        return spark.sql(query)
    return run


# -- exact dedup ------------------------------------------------------------
# The corpus is widened with a deterministic "re-crawl overlay": every
# 10th document reappears under a new doc_id (offset 10^6) with identical
# text — the cross-crawl duplication pattern a web-scale pipeline dedups.
# Derived purely from the input table (no synthesized data), identically
# in both engines, so the operator's duplicate-group output is non-vacuous
# (the raw sf tables contain no exact text duplicates).

_RECRAWL_SPARK = """
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
"""

_RECRAWL_DUCK = _RECRAWL_SPARK

_EXACT_SPARK = f"""
WITH corpus AS ({_RECRAWL_SPARK}),
hashed AS (
  SELECT doc_id, {SPARK_H64.format(x='text')} AS text_hash FROM corpus
)
SELECT text_hash, COUNT(*) AS n_copies, MIN(doc_id) AS keeper_doc_id
FROM hashed
GROUP BY text_hash
HAVING COUNT(*) > 1
ORDER BY text_hash
"""

_EXACT_DUCK = f"""
WITH corpus AS ({_RECRAWL_DUCK}),
hashed AS (
  SELECT doc_id, {DUCK_H64.format(x='text')} AS text_hash FROM corpus
)
SELECT text_hash, COUNT(*) AS n_copies, MIN(doc_id) AS keeper_doc_id
FROM hashed
GROUP BY text_hash
HAVING COUNT(*) > 1
ORDER BY text_hash
"""

register("dedup_exact_groups", _sql(_EXACT_SPARK), _EXACT_DUCK,
         "exact duplicate groups via content-hash groupBy (map-side combine) "
         "over a deterministic re-crawl overlay (non-vacuous)")

_EXACT_KEEP_SPARK = f"""
WITH hashed AS (
  SELECT doc_id, {SPARK_H64.format(x='lower(text)')} AS text_hash FROM documents
)
SELECT COUNT(*) AS n_docs,
       COUNT(DISTINCT text_hash) AS n_unique,
       COUNT(*) - COUNT(DISTINCT text_hash) AS n_redundant
FROM hashed
"""

_EXACT_KEEP_DUCK = f"""
WITH hashed AS (
  SELECT doc_id, {DUCK_H64.format(x='lower(text)')} AS text_hash FROM documents
)
SELECT COUNT(*) AS n_docs,
       COUNT(DISTINCT text_hash) AS n_unique,
       COUNT(*) - COUNT(DISTINCT text_hash) AS n_redundant
FROM hashed
"""

register("dedup_exact_stats", _sql(_EXACT_KEEP_SPARK), _EXACT_KEEP_DUCK,
         "normalized exact-dedup cardinality stats")


# -- MinHash + LSH ----------------------------------------------------------
# 3-word shingles → ONE md5-60bit hash per shingle → 8 minhash
# permutations via multiplicative mixing mod the Mersenne prime 2^31-1
# (values stay < 2^36, safe under ANSI arithmetic; identical in both
# engines) → 4 bands × 2 rows → candidate pairs sharing any band bucket.

_MERS = 2147483647  # 2^31 - 1

# LSH geometry — module-level constants; the SQL below is GENERATED from
# them, so a deployment tunes recall/precision without touching query
# text. Test-scale defaults (8 perms = 4 bands x 2 rows) keep the sf0.01
# oracle fast; production near-dup dedup typically runs 128 perms as
# 32x4 or 16x8 (candidate probability for a pair with Jaccard s:
# 1 - (1 - s^ROWS_PER_BAND)^N_BANDS).
N_BANDS = 4
ROWS_PER_BAND = 2
N_PERMS = N_BANDS * ROWS_PER_BAND

_MINHASH_SPARK = f"""
WITH toks AS (
  SELECT doc_id, filter(split(lower(text), '\\\\s+'), x -> x != '') AS ts
  FROM documents
),
sh AS (
  SELECT doc_id,
         array_distinct(transform(sequence(1, size(ts) - 2),
             i -> concat_ws(' ', element_at(ts, i), element_at(ts, i + 1),
                            element_at(ts, i + 2)))) AS shingles
  FROM toks WHERE size(ts) >= 3
),
hs AS (
  SELECT doc_id,
         transform(shingles, s -> {SPARK_H64.format(x='s')} % {_MERS}) AS hashes
  FROM sh
),
mh AS (
  SELECT doc_id,
         transform(sequence(0, {N_PERMS - 1}),
             j -> array_min(transform(hashes,
                 h -> (h * (2*j + 1) + j * 1000003L) % {_MERS}))) AS mins
  FROM hs
),
bands AS (
  SELECT doc_id, b,
         {SPARK_H64.format(x=f"concat_ws(':', transform(sequence(1, {ROWS_PER_BAND}), r -> cast(element_at(mins, b*{ROWS_PER_BAND}+r) AS STRING)))")} AS bkey
  FROM mh
  LATERAL VIEW explode(sequence(0, {N_BANDS - 1})) AS b
)
SELECT doc_id, b, bkey FROM bands
"""

_MINHASH_DUCK = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS ts
  FROM documents
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
         list_transform(range(0, {N_PERMS}),
             j -> list_min(list_transform(hashes,
                 h -> (h * (2*j + 1) + j * 1000003) % {_MERS}))) AS mins
  FROM hs
),
bands AS (
  SELECT doc_id, b,
         {DUCK_H64.format(x=f"array_to_string(list_transform(range(1, {ROWS_PER_BAND + 1}), r -> mins[(b*{ROWS_PER_BAND}+r)::int]::VARCHAR), ':')")} AS bkey
  FROM mh, (SELECT unnest(range(0, {N_BANDS})) AS b)
)
SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
FROM bands a JOIN bands c
  ON a.b = c.b AND a.bkey = c.bkey AND a.doc_id < c.doc_id
ORDER BY doc_a, doc_b
"""

def _minhash_spark(spark, sf_dir: str):
    """Materialize the band-signature table once (localCheckpoint) before
    the self-join: without it Catalyst inlines the whole
    shingle→hash→minhash subtree into BOTH join sides (~8× recompute).
    At production scale the signature table is a persisted intermediate
    for the same reason."""
    import pyspark.sql.functions as F

    from . import load_views
    load_views(spark, sf_dir)
    bands = spark.sql(_MINHASH_SPARK).localCheckpoint()
    a, c = bands.alias("a"), bands.alias("c")
    return (a.join(c, (F.col("a.b") == F.col("c.b"))
                   & (F.col("a.bkey") == F.col("c.bkey"))
                   & (F.col("a.doc_id") < F.col("c.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("c.doc_id").alias("doc_b"))
            .distinct()
            .orderBy("doc_a", "doc_b"))


register("dedup_minhash_lsh", _minhash_spark, _MINHASH_DUCK,
         f"MinHash({N_PERMS})+LSH({N_BANDS} bands×{ROWS_PER_BAND} rows) "
         "candidate pairs; signature table materialized once, band join "
         "shuffles only (band, key, doc_id)")


# -- SimHash ----------------------------------------------------------------
# 16-bit SimHash over distinct-token hashes: bit b set iff the majority of
# token hashes have bit b set.

_SIMHASH_SPARK = f"""
WITH toks AS (
  SELECT doc_id,
         array_distinct(filter(split(lower(text), '\\\\s+'), x -> x != '')) AS ts
  FROM documents
),
hs AS (
  SELECT doc_id, transform(ts, t -> {SPARK_H64.format(x='t')}) AS hashes
  FROM toks WHERE size(ts) > 0
)
SELECT doc_id,
       aggregate(
         transform(sequence(0, 15),
           b -> CASE WHEN aggregate(hashes, 0L,
                          (acc, h) -> acc + (shiftright(h, b) & 1L) * 2L - 1L) > 0
                     THEN CAST(shiftleft(1, b) AS BIGINT) ELSE 0L END),
         0L, (acc, x) -> acc + x) AS simhash
FROM hs
ORDER BY doc_id
"""

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

register("dedup_simhash", _sql(_SIMHASH_SPARK), _SIMHASH_DUCK,
         "16-bit SimHash per document (majority vote over token-hash bits)")


# -- n-gram Jaccard verification -------------------------------------------
# Exact Jaccard over distinct 3-gram sets, computed ONLY for the LSH
# candidate pairs (the band bucket join above) — never all pairs within a
# block. At 10^12 rows the pairwise work is bounded by the LSH collision
# count; the old formulation (all pairs sharing `source`) was O(n²) per
# block. The shingle table is materialized once and joined back to both
# sides of each candidate pair.

_SHINGLES_SPARK = """
SELECT doc_id,
       array_distinct(transform(sequence(1, size(ts) - 2),
           i -> concat_ws(' ', element_at(ts, i), element_at(ts, i + 1),
                          element_at(ts, i + 2)))) AS shingles
FROM (SELECT doc_id, filter(split(lower(text), '\\\\s+'), x -> x != '') AS ts
      FROM documents)
WHERE size(ts) >= 3
"""

_BANDS_FROM_SH_SPARK = f"""
WITH hs AS (
  SELECT doc_id,
         transform(shingles, s -> {SPARK_H64.format(x='s')} % {_MERS}) AS hashes
  FROM jac_sh
),
mh AS (
  SELECT doc_id,
         transform(sequence(0, {N_PERMS - 1}),
             j -> array_min(transform(hashes,
                 h -> (h * (2*j + 1) + j * 1000003L) % {_MERS}))) AS mins
  FROM hs
)
SELECT doc_id, b,
       {SPARK_H64.format(x=f"concat_ws(':', transform(sequence(1, {ROWS_PER_BAND}), r -> cast(element_at(mins, b*{ROWS_PER_BAND}+r) AS STRING)))")} AS bkey
FROM mh
LATERAL VIEW explode(sequence(0, {N_BANDS - 1})) AS b
"""

_VERIFY_SPARK = """
WITH cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
  FROM jac_bands a JOIN jac_bands c
    ON a.b = c.b AND a.bkey = c.bkey AND a.doc_id < c.doc_id
),
scored AS (
  SELECT cand.doc_a, cand.doc_b,
         size(array_intersect(x.shingles, y.shingles)) AS n_inter,
         size(x.shingles) + size(y.shingles) AS sz
  FROM cand JOIN jac_sh x ON x.doc_id = cand.doc_a
            JOIN jac_sh y ON y.doc_id = cand.doc_b
)
SELECT doc_a, doc_b, n_inter,
       sz - n_inter AS n_union,
       CAST(n_inter * 1000 AS BIGINT) DIV (sz - n_inter) AS jaccard_milli
FROM scored
WHERE n_inter * 10 >= sz - n_inter
ORDER BY doc_a, doc_b
"""


def _jaccard_spark(spark, sf_dir: str):
    """Shingle table and band table are each materialized once
    (localCheckpoint — a persisted intermediate on a real cluster) so the
    candidate self-join and the two verification joins reuse them instead
    of recomputing the shingle subtree per join side."""
    from . import load_views
    load_views(spark, sf_dir)
    sh = spark.sql(_SHINGLES_SPARK).localCheckpoint()
    sh.createOrReplaceTempView("jac_sh")
    bands = spark.sql(_BANDS_FROM_SH_SPARK).localCheckpoint()
    bands.createOrReplaceTempView("jac_bands")
    return spark.sql(_VERIFY_SPARK)


_JACCARD_DUCK = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS ts
  FROM documents
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
         list_transform(range(0, {N_PERMS}),
             j -> list_min(list_transform(hashes,
                 h -> (h * (2*j + 1) + j * 1000003) % {_MERS}))) AS mins
  FROM hs
),
bands AS (
  SELECT doc_id, b,
         {DUCK_H64.format(x=f"array_to_string(list_transform(range(1, {ROWS_PER_BAND + 1}), r -> mins[(b*{ROWS_PER_BAND}+r)::int]::VARCHAR), ':')")} AS bkey
  FROM mh, (SELECT unnest(range(0, {N_BANDS})) AS b)
),
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
         "exact 3-gram Jaccard verification over LSH candidate pairs only "
         "(integer milli-Jaccard ≥ 0.1; no unbounded pairwise block)")


# -- duplicate clusters: connected components over LSH candidate edges ------
# The full dedup story: LSH candidate pairs are EDGES; duplicate groups
# are the connected components. Spark runs iterative min-label
# propagation (the scalable formulation — each round is one broadcast-
# able aggregation+join, converging in O(diameter) rounds); the oracle
# computes the same components with a recursive CTE.


def _cluster_spark(spark, sf_dir: str):
    import pyspark.sql.functions as F

    from . import load_views
    load_views(spark, sf_dir)
    bands = spark.sql(_MINHASH_SPARK).localCheckpoint()
    a, c = bands.alias("a"), bands.alias("c")
    edges = (a.join(c, (F.col("a.b") == F.col("c.b"))
                    & (F.col("a.bkey") == F.col("c.bkey"))
                    & (F.col("a.doc_id") < F.col("c.doc_id")))
             .select(F.col("a.doc_id").alias("src"),
                     F.col("c.doc_id").alias("dst"))
             .distinct().localCheckpoint())
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
        labels = new_labels.localCheckpoint()
        if changed == 0:
            break
    return (labels.select(F.col("doc_id"),
                          F.col("label").alias("cluster_id"))
            .orderBy("doc_id"))


_CLUSTER_DUCK = f"""
WITH RECURSIVE
bands AS ({{bands_sql}}),
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
    # embed the band computation (everything up to the bands SELECT)
    inner = _MINHASH_DUCK.strip()
    # _MINHASH_DUCK is "WITH toks AS (...), ... SELECT DISTINCT a.doc_id ..."
    # we need just the bands relation: rewrap its CTE chain.
    prefix = inner[len("WITH "):inner.index("SELECT DISTINCT")]
    bands_sql = ("SELECT doc_id, b, bkey FROM (WITH " + prefix.rstrip().rstrip(",")
                 + " SELECT doc_id, b, bkey FROM bands)")
    return _CLUSTER_DUCK.format(bands_sql=bands_sql)


register("dedup_cluster_components", _cluster_spark, _cluster_duck_sql(),
         "duplicate clusters = connected components over LSH candidate "
         "edges; iterative min-label propagation (Spark) vs recursive CTE "
         "(oracle) — the one genuinely iterative operator")


# -- duplicate clusters, star-contraction variant ----------------------------
# Alternating large-star / small-star contraction (Kiveris et al.,
# "Connected Components in MapReduce and Beyond", public algorithm):
# converges in O(log n) rounds independent of component DIAMETER, where
# min-label propagation above needs O(diameter) rounds — the difference
# between 8 and 10^4 rounds on a 10^12-row near-dup chain. Each round is
# two groupBy+join passes over the edge list; same recursive-CTE oracle
# as dedup_cluster_components.


def star_components(edges, nodes, max_rounds: int = 20):
    """Alternating large-star/small-star contraction over an edge
    DataFrame (u, v) → (doc_id, cluster_id) labels for every node in
    ``nodes``. Returns (labels_df, rounds_used). Each round is two
    groupBy+join passes; converges in O(log n) rounds regardless of
    component diameter."""
    import pyspark.sql.functions as F

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

    def fingerprint(e) -> tuple:
        # bit_xor never overflows (sum of 64-bit hashes would under ANSI)
        row = (e.agg(F.count("*").alias("n"),
                     F.expr("bit_xor(xxhash64(u, v))").alias("h"))
               .collect())[0]
        return (row["n"], row["h"])

    prev = None
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        edges = small_star(large_star(edges)).localCheckpoint()
        fp = fingerprint(edges)
        if fp == prev:
            break
        prev = fp
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

    from . import load_views
    load_views(spark, sf_dir)
    bands = spark.sql(_MINHASH_SPARK).localCheckpoint()
    a, c = bands.alias("a"), bands.alias("c")
    edges = (a.join(c, (F.col("a.b") == F.col("c.b"))
                    & (F.col("a.bkey") == F.col("c.bkey"))
                    & (F.col("a.doc_id") < F.col("c.doc_id")))
             .select(F.col("a.doc_id").alias("u"),
                     F.col("c.doc_id").alias("v"))
             .distinct().localCheckpoint())
    nodes = (edges.select(F.col("u").alias("doc_id"))
             .union(edges.select(F.col("v").alias("doc_id")))
             .distinct().localCheckpoint())
    labels, _rounds = star_components(edges, nodes)
    return labels.orderBy("doc_id")


register("dedup_cluster_star", _cluster_star_spark, _cluster_duck_sql(),
         "duplicate clusters via alternating large-star/small-star "
         "contraction — O(log n) rounds vs O(diameter) for label "
         "propagation; same recursive-CTE oracle")
