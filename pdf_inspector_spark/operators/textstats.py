"""Text-analysis operators over the documents table: language ID
(stopword-ratio heuristic), quality scoring, token counting, and
rolling-hash document fingerprinting.

Public-literature lineage: winnowing fingerprints (Schleimer-Wilkerson-
Aiken 2003, SIGMOD); repetition/quality filters in the style of Gopher
(Rae et al. 2021) and C4 (Raffel et al. 2020); n-gram train/test
decontamination as practiced in GPT-3/PaLM reports (public).

All computations are pure column expressions (JVM-side in Spark — no
Python in the hot path) with integer/exact arithmetic wherever a value
crosses the Spark↔DuckDB comparison boundary.

Shared deterministic 60-bit hash: first 15 hex chars of md5, as bigint —
identical in both engines:
  Spark:  cast(conv(substring(md5(x),1,15),16,10) as bigint)
  DuckDB: ('0x'||substr(md5(x),1,15))::bigint
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from . import load_views, register


def _sql(query: str):
    def run(spark: SparkSession, sf_dir: str):
        load_views(spark, sf_dir)
        return spark.sql(query)
    return run


SPARK_H64 = "CAST(conv(substring(md5({x}), 1, 15), 16, 10) AS BIGINT)"
DUCK_H64 = "('0x' || substr(md5({x}), 1, 15))::BIGINT"

_STOPWORDS = "('the','a','and','of','to','in','is','for','on','with')"


# -- language ID ------------------------------------------------------------
# Two independent heuristics in one per-doc pass (folded from the r2
# text_langid + text_langid_trigram queries so the registry fits the
# driver's 50-query gate window): a stopword-ratio decision and a
# character-trigram-profile decision (top English / Spanish trigrams).
# Pure array expressions in both engines; integer-ratio decisions only.

_EN_TRIGRAMS = ("('the',' th','he ','ing','nd ',' an','and',' of','of ','ed ',"
                "'to ',' to','er ',' in','ion','ati',' co','ent')")
_ES_TRIGRAMS = ("('de ',' de','os ','la ',' la','el ',' el','es ','ión','ció',"
                "'ent','en ',' en','ar ','ado','que',' qu','ue ')")

_LANGID_SPARK = f"""
WITH toks AS (
  SELECT doc_id, lang,
         filter(split(lower(text), '\\\\s+'), x -> x != '') AS ts,
         -- lower(substring(text,...)): `text` is an ATTRIBUTE so the
         -- per-element work is O(1); substring(lower(text),...) would
         -- capture the computed lower(text) in the lambda and
         -- re-lowercase the whole document per trigram (O(n²)).
         transform(sequence(1, greatest(length(text) - 2, 1)),
                   i -> lower(substring(text, i, 3))) AS tg
  FROM documents
),
scored AS (
  SELECT doc_id, lang, size(ts) AS n_tokens,
         size(filter(ts, t -> t IN {_STOPWORDS})) AS n_stop,
         size(filter(tg, g -> g IN {_EN_TRIGRAMS})) AS en_hits,
         size(filter(tg, g -> g IN {_ES_TRIGRAMS})) AS es_hits
  FROM toks
)
SELECT doc_id, lang, n_tokens, n_stop,
       CASE WHEN n_tokens > 0 AND n_stop * 20 >= n_tokens
            THEN 'en' ELSE 'other' END AS pred_lang,
       en_hits, es_hits,
       CASE WHEN en_hits >= es_hits THEN 'en' ELSE 'es' END AS pred_trigram
FROM scored
ORDER BY doc_id
"""

_LANGID_DUCK = f"""
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     x -> x <> '') AS ts,
         list_transform(range(1, greatest(length(text) - 2, 1) + 1),
                        i -> lower(substr(text, i::int, 3))) AS tg
  FROM documents
),
scored AS (
  SELECT doc_id, lang, len(ts) AS n_tokens,
         len(list_filter(ts, t -> t IN {_STOPWORDS})) AS n_stop,
         len(list_filter(tg, g -> g IN {_EN_TRIGRAMS})) AS en_hits,
         len(list_filter(tg, g -> g IN {_ES_TRIGRAMS})) AS es_hits
  FROM toks
)
SELECT doc_id, lang, n_tokens, n_stop,
       CASE WHEN n_tokens > 0 AND n_stop * 20 >= n_tokens
            THEN 'en' ELSE 'other' END AS pred_lang,
       en_hits, es_hits,
       CASE WHEN en_hits >= es_hits THEN 'en' ELSE 'es' END AS pred_trigram
FROM scored
ORDER BY doc_id
"""

register("text_langid", _sql(_LANGID_SPARK), _LANGID_DUCK,
         "language ID: stopword-ratio AND character-trigram-profile "
         "decisions per document (integer ratios, no float)")


# -- quality scoring --------------------------------------------------------
# Integer feature extraction; the score stays a ratio of exact ints.

_QUALITY_SPARK = """
WITH feats AS (
  SELECT doc_id,
         length(text) AS n_chars,
         size(filter(split(text, '\\\\s+'), x -> x != '')) AS n_tokens,
         length(text) - length(regexp_replace(text, '[.,;:!?]', '')) AS n_punct,
         length(text) - length(regexp_replace(text, '[A-Z]', '')) AS n_upper
  FROM documents
)
SELECT doc_id, n_chars, n_tokens, n_punct, n_upper,
       (CASE WHEN n_tokens >= 50 THEN 40 ELSE n_tokens * 40 DIV 50 END)
       + (CASE WHEN n_tokens > 0 AND n_chars * 10 BETWEEN n_tokens * 30 AND n_tokens * 80
               THEN 30 ELSE 0 END)
       + (CASE WHEN n_punct * 10 <= n_chars THEN 20 ELSE 0 END)
       + (CASE WHEN n_upper * 5 <= n_chars THEN 10 ELSE 0 END) AS quality_score
FROM feats
ORDER BY doc_id
"""

_QUALITY_DUCK = """
WITH feats AS (
  SELECT doc_id,
         length(text) AS n_chars,
         len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS n_tokens,
         length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct,
         length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS n_upper
  FROM documents
)
SELECT doc_id, n_chars, n_tokens, n_punct, n_upper,
       (CASE WHEN n_tokens >= 50 THEN 40 ELSE n_tokens * 40 // 50 END)
       + (CASE WHEN n_tokens > 0 AND n_chars * 10 BETWEEN n_tokens * 30 AND n_tokens * 80
               THEN 30 ELSE 0 END)
       + (CASE WHEN n_punct * 10 <= n_chars THEN 20 ELSE 0 END)
       + (CASE WHEN n_upper * 5 <= n_chars THEN 10 ELSE 0 END) AS quality_score
FROM feats
ORDER BY doc_id
"""

register("text_quality_score", _sql(_QUALITY_SPARK), _QUALITY_DUCK,
         "length/punct/case quality features → integer 0-100 score")


# -- token counting ---------------------------------------------------------

_TOKENS_SPARK = """
WITH toks AS (
  SELECT doc_id, source,
         size(filter(split(text, '\\\\s+'), x -> x != '')) AS n_tokens,
         length(text) AS n_chars
  FROM documents
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(MAX(n_tokens) AS BIGINT) AS max_tokens
FROM toks
GROUP BY source
ORDER BY source
"""

# DuckDB SUM(INTEGER) returns HUGEINT (int128), which pandas renders as
# float64 — cast to BIGINT so the driver value hash matches Spark's BIGINT.
_TOKENS_DUCK = """
WITH toks AS (
  SELECT doc_id, source,
         len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS n_tokens,
         length(text) AS n_chars
  FROM documents
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(MAX(n_tokens) AS BIGINT) AS max_tokens
FROM toks
GROUP BY source
ORDER BY source
"""

register("text_token_counts", _sql(_TOKENS_SPARK), _TOKENS_DUCK,
         "whitespace tokenization + per-source aggregation")


# BPE-ish tokenization: a GPT-2-style pre-tokenizer regex (contractions,
# letter runs, digit runs, punctuation runs, whitespace runs). Both Java
# regex (Spark) and RE2 (DuckDB) support \p{L}/\p{N} with identical
# match semantics for this pattern.
_BPE_PATTERN = r"'(?:s|d|m|t|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"
# Spark SQL string literals process backslash escapes → double them;
# DuckDB literals are raw but need the leading quote doubled.
_BPE_SPARK_LIT = _BPE_PATTERN.replace("\\", "\\\\").replace("'", "\\'")
_BPE_DUCK_LIT = _BPE_PATTERN.replace("'", "''")

# Folded-in document fingerprint (winnowing-lite, Schleimer et al. 2003):
# hash every 8-char window at stride 4, keep the minimum. Same per-doc
# grain as the token counts, so it rides the same scan.

_BPE_SPARK = f"""
SELECT doc_id,
       size(filter(split(text, '\\\\s+'), x -> x != '')) AS n_ws_tokens,
       size(regexp_extract_all(text, '{_BPE_SPARK_LIT}', 0)) AS n_bpe_tokens,
       length(text) AS n_chars,
       array_min(transform(sequence(1, greatest(length(text) - 7, 1), 4),
                           i -> {SPARK_H64.format(x='substring(text, i, 8)')})) AS fingerprint
FROM documents
ORDER BY doc_id
"""

_BPE_DUCK = f"""
SELECT doc_id,
       len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS n_ws_tokens,
       len(regexp_extract_all(text, '{_BPE_DUCK_LIT}')) AS n_bpe_tokens,
       length(text) AS n_chars,
       list_min(list_transform(range(1, greatest(length(text) - 7, 1) + 1, 4),
                               i -> {DUCK_H64.format(x='substr(text, i::int, 8)')})) AS fingerprint
FROM documents
ORDER BY doc_id
"""

register("text_bpe_tokens", _sql(_BPE_SPARK), _BPE_DUCK,
         "BPE-ish pre-tokenizer counts (GPT-2-style regex) + rolling-hash "
         "winnowing fingerprint per document")


# -- train/test decontamination ----------------------------------------------
# The training-data hygiene operator: flag documents whose word-8-gram
# sets overlap a benchmark/eval set. The benchmark here is the
# deterministic subset doc_id % 50 = 0; the corpus carries a "leaked
# benchmark" overlay (those docs re-crawled under doc_id + 10^6) so the
# operator's positive path is exercised — exactly the leak pattern
# decontamination exists to catch. Grams travel as 60-bit hashes, never
# strings; at 10^12 rows the benchmark gram table is the small side of a
# broadcast join and candidate grams never shuffle.

# 8-gram strings via a zip_with chain over 8 aligned slices — NOT
# transform(sequence, i -> slice(ts, i, 8)): a lambda capturing the
# computed token array re-evaluates its chain per gram after projection
# collapse (O(n²) per doc). Each zip_with lambda sees only elements.
_G8 = "slice(ts, 1, size(ts) - 7)"
for _k in range(2, 9):
    _G8 = (f"zip_with({_G8}, slice(ts, {_k}, size(ts) - 7), "
           "(a, b) -> concat(a, ' ', b))")

# r7: the gram table is referenced THREE times (bench set, candidate
# side, the distinct-doc spine) and Spark inlines CTEs — the whole
# tokenize→8-gram→md5 chain ran 3× per query, on the row-group-bound
# (~2-partition) documents scan. Now the grams are built once behind
# the fanout repartition + per-doc FIRST barrier (same pattern and
# rationale as dedup.bands_chain_spark: the barrier stops the
# explode-inferred size>0 filter from re-evaluating the gram chain
# below the exchange; ELSE array() ≡ the old WHERE size(ts) >= 8) and
# materialized (operators.materialize), so the three consumers read the
# checkpointed 60-bit hash rows. The bench side stays the small side of
# the join — the 10^12-row scale story is unchanged.
_DECON_GRAMS_TMPL = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 50 = 0
),
toks AS (
  SELECT doc_id, filter(split(lower(text), '\\\\s+'), x -> x != '') AS ts
  FROM (SELECT /*+ REPARTITION({{fanout}}, doc_id) */ doc_id, text
        FROM corpus)
),
gb AS (
  SELECT doc_id,
         FIRST(CASE WHEN size(ts) >= 8
               THEN array_distinct(transform({_G8},
                        g -> {SPARK_H64.format(x='g')}))
               ELSE array() END) AS ghs
  FROM toks
  GROUP BY doc_id
)
SELECT doc_id, explode(ghs) AS gh FROM gb
"""

_DECON_SPARK_TAIL = """
WITH bench AS (
  SELECT DISTINCT gh FROM decon_grams
  WHERE doc_id % 50 = 0 AND doc_id < 1000000
),
cand AS (
  SELECT doc_id, gh FROM decon_grams
  WHERE NOT (doc_id % 50 = 0 AND doc_id < 1000000)
),
hits AS (
  SELECT c.doc_id, COUNT(*) AS n_hits
  FROM cand c JOIN bench b ON c.gh = b.gh
  GROUP BY c.doc_id
)
SELECT t.doc_id,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_overlap_8grams,
       COALESCE(h.n_hits, 0) > 0 AS contaminated
FROM (SELECT DISTINCT doc_id FROM decon_grams
      WHERE NOT (doc_id % 50 = 0 AND doc_id < 1000000)) t
LEFT JOIN hits h ON h.doc_id = t.doc_id
ORDER BY t.doc_id
"""


def _decon_spark(spark: SparkSession, sf_dir: str):
    from . import cpu_fanout, materialize
    load_views(spark, sf_dir)
    grams = materialize(spark.sql(
        _DECON_GRAMS_TMPL.format(fanout=cpu_fanout(spark))), "decon_grams")
    grams.createOrReplaceTempView("decon_grams")
    return spark.sql(_DECON_SPARK_TAIL)

_DECON_DUCK = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 50 = 0
),
toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS ts
  FROM corpus
),
grams AS (
  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ts) - 6),
             i -> {DUCK_H64.format(x="array_to_string(ts[i:i+7], ' ')")}))) AS gh
  FROM toks WHERE len(ts) >= 8
),
bench AS (
  SELECT DISTINCT gh FROM grams WHERE doc_id % 50 = 0 AND doc_id < 1000000
),
cand AS (
  SELECT doc_id, gh FROM grams WHERE NOT (doc_id % 50 = 0 AND doc_id < 1000000)
),
hits AS (
  SELECT c.doc_id, COUNT(*) AS n_hits
  FROM cand c JOIN bench b ON c.gh = b.gh
  GROUP BY c.doc_id
)
SELECT t.doc_id,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_overlap_8grams,
       COALESCE(h.n_hits, 0) > 0 AS contaminated
FROM (SELECT DISTINCT doc_id FROM grams
      WHERE NOT (doc_id % 50 = 0 AND doc_id < 1000000)) t
LEFT JOIN hits h ON h.doc_id = t.doc_id
ORDER BY t.doc_id
"""

register("text_decontamination", _decon_spark, _DECON_DUCK,
         "train/test decontamination: word-8-gram overlap vs a benchmark "
         "subset (hash-gram broadcast join; leaked-benchmark overlay)")


# -- PII scrubbing ------------------------------------------------------------
# Training-data hygiene: count and strip emails / phone-like numbers.
# Patterns use only constructs with identical semantics in Java regex
# (Spark) and RE2 (DuckDB): character classes, bounded repetition, no
# backreferences/lookaround. The scrubbed text crosses the comparison
# boundary as a hash.

_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
_PHONE_RE = "[+]?[0-9]{3}[- .][0-9]{3}[- .][0-9]{4}"

_PII_SPARK = f"""
WITH scrubbed AS (
  SELECT doc_id,
         size(regexp_extract_all(text, '{_EMAIL_RE}', 0)) AS n_emails,
         size(regexp_extract_all(text, '{_PHONE_RE}', 0)) AS n_phones,
         regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>'),
                        '{_PHONE_RE}', '<PHONE>') AS clean
  FROM documents
)
SELECT doc_id,
       CAST(n_emails AS BIGINT) AS n_emails,
       CAST(n_phones AS BIGINT) AS n_phones,
       {SPARK_H64.format(x='clean')} AS clean_hash,
       length(clean) AS n_chars_clean
FROM scrubbed
ORDER BY doc_id
"""

_PII_DUCK = f"""
WITH scrubbed AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_emails,
         len(regexp_extract_all(text, '{_PHONE_RE}')) AS n_phones,
         regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                        '{_PHONE_RE}', '<PHONE>', 'g') AS clean
  FROM documents
)
SELECT doc_id,
       CAST(n_emails AS BIGINT) AS n_emails,
       CAST(n_phones AS BIGINT) AS n_phones,
       {DUCK_H64.format(x='clean')} AS clean_hash,
       length(clean) AS n_chars_clean
FROM scrubbed
ORDER BY doc_id
"""

register("text_pii_scrub", _sql(_PII_SPARK), _PII_DUCK,
         "PII scrubbing: email/phone counts + redacted-text hash "
         "(regex subset with identical Java/RE2 semantics)")


# -- repetition statistics (Gopher-style quality filters) --------------------
# Duplicate-line fraction and top-bigram share as exact integer ratios
# (×1000) — the repetition filters every LLM data pipeline applies before
# training. The Spark top-bigram path is LINEAR in document length:
# explode bigrams → groupBy(doc_id, gram) → max(count). The r2
# formulation (aggregate over array_distinct × filter-count) was
# O(distinct-grams × grams) per row — ~10^12 comparisons in ONE task for
# a 10^6-token document. The oracle keeps the list formulation (same
# values; sf0.01 docs are short).

_REP_SPARK = """
WITH feats AS (
  SELECT doc_id,
         filter(split(text, '\\n'), x -> x != '') AS lines,
         filter(split(lower(text), '\\\\s+'), x -> x != '') AS ts
  FROM documents
),
base AS (
  SELECT doc_id,
         CAST(CASE WHEN size(lines) > 0
              THEN (size(lines) - size(array_distinct(lines))) * 1000
                   DIV size(lines) ELSE 0 END AS BIGINT) AS dup_line_milli,
         CAST(size(ts) AS BIGINT) AS n_tokens,
         -- zip_with over two slices, NOT transform(sequence, i ->
         -- element_at(ts, i)): a lambda that captures the computed
         -- array re-evaluates its whole chain per element after
         -- projection collapse (O(n²) per doc — hung on a 120k-token
         -- doc); zip_with lambdas touch only their element variables.
         CASE WHEN size(ts) >= 2
              THEN zip_with(slice(ts, 1, size(ts) - 1),
                            slice(ts, 2, size(ts) - 1),
                            (a, b) -> concat(a, ' ', b))
              ELSE array() END AS bigrams
  FROM feats
),
g AS (
  SELECT doc_id, gram, COUNT(*) AS c
  FROM base LATERAL VIEW explode(bigrams) AS gram
  GROUP BY doc_id, gram
),
top AS (
  SELECT doc_id, MAX(c) AS top_c, SUM(c) AS n_bigrams
  FROM g GROUP BY doc_id
)
SELECT b.doc_id,
       b.dup_line_milli,
       CAST(COALESCE(t.top_c * 1000 DIV t.n_bigrams, 0) AS BIGINT)
         AS top_bigram_milli,
       b.n_tokens
FROM base b LEFT JOIN top t ON t.doc_id = b.doc_id
ORDER BY b.doc_id
"""

_REP_DUCK = """
WITH feats AS (
  SELECT doc_id,
         list_filter(string_split(text, chr(10)), x -> x <> '') AS lines,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     x -> x <> '') AS ts
  FROM documents
),
bi AS (
  SELECT doc_id, lines, ts,
         list_filter(list_transform(range(1, greatest(len(ts) - 1, 1) + 1),
                        i -> CASE WHEN i + 1 <= len(ts)
                             THEN ts[i::int] || ' ' || ts[i::int + 1] END),
                     x -> x IS NOT NULL) AS bigrams
  FROM feats
)
SELECT doc_id,
       CAST(CASE WHEN len(lines) > 0
            THEN (len(lines) - len(list_distinct(lines))) * 1000
                 // len(lines) ELSE 0 END AS BIGINT) AS dup_line_milli,
       CAST(CASE WHEN len(bigrams) > 0
            THEN list_max(list_transform(list_distinct(bigrams),
                   g -> len(list_filter(bigrams, x -> x = g)))) * 1000
                 // len(bigrams) ELSE 0 END AS BIGINT)
         AS top_bigram_milli,
       CAST(len(ts) AS BIGINT) AS n_tokens
FROM bi
ORDER BY doc_id
"""

register("text_repetition_stats", _sql(_REP_SPARK), _REP_DUCK,
         "Gopher-style repetition filters: duplicate-line fraction and "
         "top-bigram share as exact milli-ratios")


# -- stratified hash sampling -------------------------------------------------
# Training-mix construction: per-source sampling rates applied via the
# shared deterministic hash (h % 1000 < rate_milli) — reproducible on any
# engine/cluster, no RNG state, join-free re-derivation for lineage. The
# rate table is a broadcastable literal; at 10^12 rows the filter is a
# scan-side predicate.

_RATES_CASE = ("CASE source WHEN 'wiki' THEN 900 WHEN 'web' THEN 250 "
               "WHEN 'forum' THEN 500 ELSE 100 END")

_STRAT_SPARK = f"""
WITH sampled AS (
  SELECT doc_id, source,
         {SPARK_H64.format(x="concat('sample:', cast(doc_id AS STRING))")} % 1000 AS h,
         {_RATES_CASE} AS rate_milli
  FROM documents
)
SELECT source,
       CAST(MAX(rate_milli) AS BIGINT) AS rate_milli,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN h < rate_milli THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(SUM(CASE WHEN h < rate_milli THEN doc_id ELSE 0 END) AS BIGINT)
         AS kept_id_sum
FROM sampled
GROUP BY source
ORDER BY source
"""

_STRAT_DUCK = f"""
WITH sampled AS (
  SELECT doc_id, source,
         {DUCK_H64.format(x="'sample:' || doc_id::VARCHAR")} % 1000 AS h,
         {_RATES_CASE} AS rate_milli
  FROM documents
)
SELECT source,
       CAST(MAX(rate_milli) AS BIGINT) AS rate_milli,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN h < rate_milli THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(SUM(CASE WHEN h < rate_milli THEN doc_id ELSE 0 END) AS BIGINT)
         AS kept_id_sum
FROM sampled
GROUP BY source
ORDER BY source
"""

register("text_stratified_sample", _sql(_STRAT_SPARK), _STRAT_DUCK,
         "deterministic stratified sampling: per-source rates via the "
         "shared 60-bit hash (reproducible, scan-side predicate)")


# -- sequence packing ----------------------------------------------------------
# Greedy-by-order packing of documents into ~4096-token training
# sequences, per source: pack_id = floor(cumulative_tokens / budget)
# under a deterministic (source, doc_id) order. A per-source window —
# partition-parallel; at 10^12 rows each source packs independently.

_PACK_SPARK = """
WITH toks AS (
  SELECT doc_id, source,
         size(filter(split(text, '\\\\s+'), x -> x != '')) AS n_tokens
  FROM documents
),
packed AS (
  SELECT source, doc_id, n_tokens,
         CAST((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) - n_tokens)
              / 4096 AS BIGINT) AS pack_id
  FROM toks
)
SELECT source, pack_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM packed
GROUP BY source, pack_id
ORDER BY source, pack_id
"""

_PACK_DUCK = """
WITH toks AS (
  SELECT doc_id, source,
         len(list_filter(regexp_split_to_array(text, '\\s+'),
                         x -> x <> '')) AS n_tokens
  FROM documents
),
packed AS (
  SELECT source, doc_id, n_tokens,
         CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) - n_tokens)
              / 4096.0) AS BIGINT) AS pack_id
  FROM toks
)
SELECT source, pack_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM packed
GROUP BY source, pack_id
ORDER BY source, pack_id
"""

register("text_pack_sequences", _sql(_PACK_SPARK), _PACK_DUCK,
         "sequence packing: cumulative-token binning into 4096-token "
         "training packs per source (partition-parallel window)")
