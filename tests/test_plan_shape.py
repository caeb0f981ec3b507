"""Plan-shape contracts for the operators VERDICT r1 flagged as
scale-killers: the fix is pinned at the physical-plan level so a
regression (global single-partition window, unbounded pairwise block)
fails CI, not a 100-TB run.

- KMV k-min set: distributed TakeOrderedAndProject, never a global
  ROW_NUMBER window over all distinct hashes.
- n-gram Jaccard & embedding near-dup: pairwise work bounded by LSH
  candidates — equi-joins only, no CartesianProduct / BroadcastNestedLoop.
"""

import pytest


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sf_available():
    import os
    if not os.path.isdir(SF_DIR):
        pytest.skip("driver testdata not present")
    return SF_DIR


def test_kmv_uses_take_ordered_not_global_window(spark, sf_available):
    from pdf_inspector_spark.operators import load_views
    from pdf_inspector_spark.operators.sketches import _KMV_SPARK
    load_views(spark, sf_available)
    plan = _plan(spark.sql(_KMV_SPARK))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Window" not in plan, plan


def test_jaccard_plan_has_no_cartesian_or_nested_loop(spark, sf_available):
    from pdf_inspector_spark.operators.dedup import _jaccard_spark
    plan = _plan(_jaccard_spark(spark, sf_available))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # verification joins candidates back to the materialized shingle table
    assert "Scan ExistingRDD" in plan or "LocalTableScan" in plan, plan


def test_neardup_plan_blocks_on_bucket_equijoin(spark, sf_available):
    from pdf_inspector_spark.operators.similarity import _neardup_spark
    plan = _plan(_neardup_spark(spark, sf_available))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # banded OR-construction: candidates join on (band, bkey)
    assert "band" in plan and "bkey" in plan, plan


def test_exact_dedup_aggregates_with_partial_merge(spark, sf_available):
    """Exact dedup = two-phase hash aggregate on the content hash
    (map-side combine), not a sort or window."""
    from pdf_inspector_spark.operators import load_views
    from pdf_inspector_spark.operators.dedup import _EXACT_SPARK
    load_views(spark, sf_available)
    plan = _plan(spark.sql(_EXACT_SPARK))
    assert "partial_count" in plan or "HashAggregate" in plan, plan
    assert "Window" not in plan, plan


def test_repetition_stats_linear_on_long_doc(spark, tmp_path):
    """VERDICT r2 item 4: the top-bigram path must be LINEAR in document
    length. A 120k-token document with ~unique bigrams costs ~1.4×10^10
    comparisons under the r2 array formulation (aggregate over
    array_distinct × filter-count — minutes in ONE task); the explode →
    groupBy → max plan finishes in seconds.

    The long doc goes through a PARQUET scan, not a local relation: a
    one-row LocalRelation makes the whole bigram pipeline foldable and
    Catalyst's constant-folding of ~n-element array literals across
    optimizer iterations blows up super-quadratically around n≈500 —
    a plan-time artifact of the test harness, not the operator (the
    production input is always a scan)."""
    import time

    from pdf_inspector_spark.operators import _LOADED_VIEWS
    from pdf_inspector_spark.operators.textstats import _REP_SPARK
    n = 120_000
    text = " ".join(f"w{i}" for i in range(n))  # all bigrams distinct
    p = str(tmp_path / "longdoc.parquet")
    spark.createDataFrame([(1, text)], "doc_id long, text string") \
        .write.parquet(p)
    spark.read.parquet(p).createOrReplaceTempView("documents")
    try:
        t0 = time.monotonic()
        rows = spark.sql(_REP_SPARK).collect()
        elapsed = time.monotonic() - t0
    finally:
        # un-memoize load_views so later tests re-register the real view
        _LOADED_VIEWS.pop(id(spark), None)
        spark.catalog.dropTempView("documents")
    assert len(rows) == 1
    assert rows[0]["n_tokens"] == n
    # distinct bigrams → top share = 1/(n-1) → milli ratio 0
    assert rows[0]["top_bigram_milli"] == 0
    assert elapsed < 60, f"quadratic regression? {elapsed:.1f}s"

    # Same guard for the MinHash band chain (worst pre-fix offender:
    # captured-hashes re-eval per permutation × captured-ts re-eval per
    # shingle ≈ O(perms·n²) — hung for minutes on this doc).
    from pdf_inspector_spark.operators.dedup import bands_chain_spark
    spark.read.parquet(p).createOrReplaceTempView("longdoc")
    chain = bands_chain_spark("SELECT doc_id, text FROM longdoc", 4, 2)
    t0 = time.monotonic()
    n_bands = spark.sql(
        f"WITH {chain} SELECT doc_id, b, bkey FROM bands").count()
    elapsed = time.monotonic() - t0
    assert n_bands == 4
    assert elapsed < 60, f"quadratic regression in bands? {elapsed:.1f}s"


def test_ivf_training_iterates_effectively(spark, sf_available):
    """VERDICT r2 item 8: the trained IVF must run ≥2 EFFECTIVE Lloyd
    iterations (assignments still moving in round 2), not a single step
    with dead extra rounds."""
    from pdf_inspector_spark.operators.similarity import ivf_train
    _asg, moved = ivf_train(spark, sf_available)
    assert len(moved) >= 2 and moved[0] > 0 and moved[1] > 0, moved


def test_persist_mode_parquet_equivalent(spark, sf_available, monkeypatch):
    """Cluster-faithful persisted intermediates (carried deviation from
    r1-r2): PDF_INSPECTOR_PERSIST=parquet swaps every materialize() from
    localCheckpoint to write+re-read. Results must be identical on the
    pipelines that lean on materialization (guarded LSH pairs and
    star-contraction clusters)."""
    from pdf_inspector_spark.operators.dedup import (
        _cluster_star_spark, _minhash_spark, _verified_clusters_spark)
    base_pairs = sorted(map(tuple, _minhash_spark(spark, sf_available).collect()))
    base_labels = sorted(map(tuple, _cluster_star_spark(spark, sf_available).collect()))
    base_vc = sorted(map(tuple,
                         _verified_clusters_spark(spark, sf_available).collect()))
    monkeypatch.setenv("PDF_INSPECTOR_PERSIST", "parquet")
    pq_pairs = sorted(map(tuple, _minhash_spark(spark, sf_available).collect()))
    pq_labels = sorted(map(tuple, _cluster_star_spark(spark, sf_available).collect()))
    pq_vc = sorted(map(tuple,
                       _verified_clusters_spark(spark, sf_available).collect()))
    assert pq_pairs == base_pairs and len(base_pairs) > 0
    assert pq_labels == base_labels and len(base_labels) > 0
    assert pq_vc == base_vc and len(base_vc) > 0


def test_star_contraction_converges_in_log_rounds(spark):
    """Star contraction's value proposition: a 64-node PATH (diameter 63)
    converges in O(log n) rounds where min-label propagation would need
    ~63. All nodes must label to the path minimum."""
    import pyspark.sql.functions as F

    from pdf_inspector_spark.operators.dedup import star_components
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "u long, v long").localCheckpoint()
    nodes = spark.range(64).select(F.col("id").alias("doc_id"))
    labels, rounds = star_components(edges, nodes)
    rows = {r["doc_id"]: r["cluster_id"] for r in labels.collect()}
    assert rows == {i: 0 for i in range(64)}
    assert rounds <= 10, f"expected O(log n) convergence, took {rounds}"


def test_lsh_guard_collapses_exact_duplicates(spark, sf_available):
    """Degenerate-bucket guard, part 1 (VERDICT r2 'What's wrong' #4):
    1,000 byte-identical documents share EVERY band bucket, so an
    unguarded band self-join emits ~m²·bands ≈ 2M candidate pairs. The
    rep-collapse must reduce them to O(k): the 1,000 copies contribute
    ONE representative, so pair count is bounded by the distinct-text
    neighbor count, not the copy count."""
    from pdf_inspector_spark.operators.dedup import (
        bands_chain_spark, candidate_pairs)
    rows = [(i, "the quick brown fox jumps over the lazy dog again and again")
            for i in range(1000)]
    # a handful of near-dup distinct texts that legitimately collide
    rows += [(2000 + i, f"the quick brown fox jumps over the lazy dog variant {i}")
             for i in range(5)]
    spark.createDataFrame(rows, "doc_id long, text string") \
        .createOrReplaceTempView("patho_docs")
    chain = bands_chain_spark("SELECT doc_id, text FROM patho_docs", 4, 2)
    bands = spark.sql(f"WITH {chain} SELECT doc_id, b, bkey FROM bands") \
        .localCheckpoint()
    n_pairs = candidate_pairs(bands).count()
    # 6 distinct texts (1 rep + 5 variants) → at most C(6,2)=15 pairs
    assert n_pairs <= 15, f"guard failed: {n_pairs} pairs (O(m²) blowup)"


def test_lsh_guard_caps_degenerate_buckets(spark, sf_available):
    """Degenerate-bucket guard, part 2: 60 documents with DISTINCT bytes
    but identical token streams (whitespace variations survive sha256
    rep-collapse but split('\\s+') collapses them) land in one bucket of
    size 60 > BUCKET_CAP=50 — the cap must drop the bucket entirely.
    At 40 docs (under the cap) the same construction must emit all
    C(40,2) pairs."""
    from pdf_inspector_spark.operators.dedup import (
        BUCKET_CAP, bands_chain_spark, candidate_pairs)

    def mk(n):
        base = "alpha beta gamma delta epsilon zeta eta theta"
        # doc i uses i+1 spaces: n DISTINCT byte strings, ONE token stream
        rows = [(i, base.replace(" ", " " * (1 + i))) for i in range(n)]
        return spark.createDataFrame(rows, "doc_id long, text string")

    assert BUCKET_CAP == 50
    mk(60).createOrReplaceTempView("patho_docs")
    chain = bands_chain_spark("SELECT doc_id, text FROM patho_docs", 4, 2)
    over = spark.sql(f"WITH {chain} SELECT doc_id, b, bkey FROM bands") \
        .localCheckpoint()
    assert candidate_pairs(over).count() == 0

    mk(40).createOrReplaceTempView("patho_docs")
    chain = bands_chain_spark("SELECT doc_id, text FROM patho_docs", 4, 2)
    under = spark.sql(f"WITH {chain} SELECT doc_id, b, bkey FROM bands") \
        .localCheckpoint()
    assert candidate_pairs(under).count() == 40 * 39 // 2


def test_star_contraction_matches_propagation_on_random_graph(spark):
    """Property check: star contraction and a NetworkX-free exact union-
    find agree on a deterministic pseudo-random graph."""
    import hashlib

    import pyspark.sql.functions as F

    from pdf_inspector_spark.operators.dedup import star_components
    n, m = 200, 150
    pairs = []
    for i in range(m):
        h = int.from_bytes(hashlib.md5(f"e{i}".encode()).digest()[:8], "big")
        a, b = h % n, (h >> 20) % n
        if a != b:
            pairs.append((min(a, b), max(a, b)))
    # exact union-find ground truth
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    truth = {}
    for x in set(a for p in pairs for a in p):
        truth[x] = find(x)
    # min-root canonicalization: find() with min-merge yields the min id
    edges = spark.createDataFrame(sorted(set(pairs)),
                                  "u long, v long").localCheckpoint()
    nodes = spark.createDataFrame([(x,) for x in sorted(truth)],
                                  "doc_id long")
    labels, _ = star_components(edges, nodes)
    got = {r["doc_id"]: r["cluster_id"] for r in labels.collect()}
    assert got == truth


def test_assemble_docs_blocked_equals_naive(spark):
    """Blocked assembly (tiny blocks + binding budget) must agree with
    the naive single-pass join + char-budget truncation."""
    from pdf_inspector_spark.operators.conversation import assemble_docs
    rows = ([("c1", i, f"turn-{i}" if i % 3 else None) for i in range(50)]
            + [("c2", i, "") for i in range(5)]
            + [("c3", 0, "only")])
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text_out string")
    out = {r["conv_id"]: r
           for r in assemble_docs(df, block_turns=8,
                                  doc_char_budget=60).collect()}
    for conv, texts, n_turns in (
            ("c1", [f"turn-{i}" for i in range(50) if i % 3], 50),
            ("c2", [], 5), ("c3", ["only"], 1)):
        full = "\n\n".join(texts)
        r = out[conv]
        assert r["n_turns"] == n_turns
        assert r["n_extracted"] == len(texts)
        assert r["doc_chars"] == len(full)       # FULL length, not truncated
        assert r["doc"] == full[:60]             # budget-cut document


def test_assemble_docs_mega_conversation_bounded(spark):
    """VERDICT r3 straggler hazard: a single mega conversation must not
    put the whole document through one Python task. With blocked
    assembly every grouped-map task sees <= BLOCK_TURNS turns, the
    budget bounds the assembled row, and the job stays fast."""
    import time

    from pdf_inspector_spark.operators.conversation import (DOC_CHAR_BUDGET,
                                                            assemble_docs)
    n = 60_000
    df = spark.range(n).selectExpr("'mega' AS conv_id",
                                   "CAST(id AS INT) AS turn_idx",
                                   "repeat('x', 80) AS text_out")
    t0 = time.monotonic()
    row = assemble_docs(df).collect()[0]
    elapsed = time.monotonic() - t0
    full_chars = n * 80 + 2 * (n - 1)
    assert full_chars > DOC_CHAR_BUDGET          # the budget binds
    assert row["n_turns"] == n
    assert row["doc_chars"] == full_chars        # stat reports FULL length
    assert len(row["doc"]) == DOC_CHAR_BUDGET    # document cut at budget
    assert row["doc"] == "x" * 80 + "\n\n" + row["doc"][82:]
    assert elapsed < 90, f"mega-conversation assembly took {elapsed:.1f}s"


def test_multiprobe_recall_strictly_above_single_probe(spark, sf_available):
    """The gated multiprobe query must SHOW the recall win: corpus-wide
    recall@3 at nprobe=2 strictly above nprobe=1 (VERDICT r3 item 4)."""
    from pdf_inspector_spark.operators.similarity import (_MULTIPROBE_SPARK,
                                                          _sql)
    rows = _sql(_MULTIPROBE_SPARK)(spark, sf_available).collect()
    hits1 = sum(r["hits_nprobe1"] for r in rows)
    hits2 = sum(r["hits_nprobe2"] for r in rows)
    assert hits2 > hits1, (hits1, hits2)
    assert all(r["hits_nprobe2"] >= r["hits_nprobe1"] for r in rows)


def test_lsh_chain_repartitions_cpu_dense_stage(spark, sf_available):
    """The explicit CPU-fanout repartition after the rep-collapse must
    stay in the plan as a user-specified (AQE-exempt) exchange: without
    it, AQE sizes the shuffle read by map-output BYTES (~1.3MB of
    compressed text) and collapses the shingle→minhash stage to one
    task carrying the whole fold cost (r4, measured 3 CPU-s on one of
    32 cores)."""
    from pdf_inspector_spark.operators import load_views
    from pdf_inspector_spark.operators.dedup import (N_BANDS, ROWS_PER_BAND,
                                                     _DOCS,
                                                     bands_chain_spark)
    load_views(spark, sf_available)
    chain = bands_chain_spark(_DOCS, N_BANDS, ROWS_PER_BAND, fanout=16)
    plan = _plan(spark.sql(f"WITH {chain} SELECT doc_id, b, bkey FROM bands"))
    assert "REPARTITION_BY_NUM" in plan, plan
    assert "hashpartitioning(doc_id" in plan


def test_prop_assemble_matches_naive_randomized(spark):
    """Randomized blocked-assembly equivalence: any mix of NULL/empty/
    present texts, any block size, any budget must match the naive
    join-then-cut reference."""
    from hypothesis import given, settings, strategies as st

    from pdf_inspector_spark.operators.conversation import assemble_docs

    @settings(max_examples=5, deadline=None)
    @given(st.data())
    def check(data):
        n_convs = data.draw(st.integers(1, 3))
        rows, naive = [], {}
        for c in range(n_convs):
            conv = f"c{c}"
            texts = data.draw(st.lists(
                st.one_of(st.none(), st.just(""),
                          st.text(alphabet="abxy ", min_size=1, max_size=9)),
                min_size=1, max_size=25))
            for i, t in enumerate(texts):
                rows.append((conv, i, t))
            naive[conv] = [t for t in texts if t]
        block = data.draw(st.integers(1, 7))
        budget = data.draw(st.integers(1, 60))
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, text_out string")
        out = {r["conv_id"]: r
               for r in assemble_docs(df, block_turns=block,
                                      doc_char_budget=budget).collect()}
        for conv, texts in naive.items():
            full = "\n\n".join(texts)
            r = out[conv]
            assert r["n_extracted"] == len(texts)
            assert r["doc_chars"] == len(full)
            assert r["doc"] == full[:budget]

    check()


def test_assemble_docs_materializes_blocks_once(spark):
    """ADVICE r4 (medium): assemble_docs branches the grouped-map blocks
    frame into three aggregations (stats, full_len, kept). Without the
    materialize, Catalyst inlines the applyInPandas stage and its
    upstream shuffle into EVERY consumer (~3x recompute). Pin: the final
    plan contains ZERO FlatMapGroupsInPandas nodes (the grouped map ran
    once, behind the materialization boundary), and at most one scan of
    the materialized blocks source feeds each branch."""
    import pyspark.sql.functions as F

    from pdf_inspector_spark.operators.conversation import assemble_docs
    turns = (spark.range(0, 300)
             .select((F.col("id") % 7).cast("string").alias("conv_id"),
                     (F.col("id") / 7).cast("int").alias("turn_idx"),
                     F.concat(F.lit("t"), F.col("id")).alias("text_out")))
    out = assemble_docs(turns, block_turns=16)
    plan = _plan(out)
    assert "FlatMapGroupsInPandas" not in plan, (
        "grouped-map stage re-inlined into the consumers:\n" + plan)
    rows = out.collect()
    assert len(rows) == 7
    assert all(r["n_turns"] >= 42 for r in rows)


def test_ivf_observed_moved_matches_join_count(spark, sf_available):
    """Same r7 fuse applied to ivf_train: the per-round moved-count is
    an observed metric on the round's materialize instead of a
    standalone new-vs-old join job. Pin the equivalence for round 1:
    the observed count must equal an explicit join-count of the round-1
    assignment against the initial assignment (ivf_q keeps it as c0)."""
    import pyspark.sql.functions as F

    from pdf_inspector_spark.operators.similarity import ivf_train

    asg1, moved = ivf_train(spark, sf_available, max_rounds=1)
    recomputed = (asg1.alias("n")
                  .join(spark.table("ivf_q").select(
                      "vec_id", F.col("c0").alias("c_init")), "vec_id")
                  .where(F.col("n.c") != F.col("c_init")).count())
    assert moved[0] == recomputed and moved[0] > 0, (moved, recomputed)
