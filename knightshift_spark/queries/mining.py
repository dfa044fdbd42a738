"""Round-7 declared queries for the text-mining operators that were
pytest-only through round 6 (VERDICT r6 #2–#4): substring-level exact
dedup, cross-relation fuzzy join, and heavy-hitter mining. Slots come
from the round-7 absorptions (q32→q31b, q55→q28, q62b→q62 — see
COVERAGE.md fusion map); every oracle reproduces the operator's exact
md5-anchored arithmetic in DuckDB, the same portability argument the
q29–q31b family pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from knightshift_spark.queries import query
from knightshift_spark.queries.dedup import _band_rows, _mh_cols, hash32_sql
from knightshift_spark.tables import load_table as t

_TK = (
    "CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) "
    r"ELSE string_split_regex(trim(lower(text)), '\s+') END"
)
_BIGRAMS = (
    "list_distinct(list_transform(range(1, len(tk)), "
    "i -> tk[i] || ' ' || tk[i+1]))"
)

# ---------------------------------------------------------------------------
# q69: cross-relation fuzzy join (operators.fuzzyjoin.fuzzy_join)
# ---------------------------------------------------------------------------


def _q69_oracle() -> str:
    """Banded-candidate ∩ exact-Jaccard, BOTH relations banded with the
    index's minhash family — the LSH path itself is what gets checked
    (not the all-pairs baseline), mirroring q31b's argument: max_bucket
    (500) and df_max (10 000) exceed any occupancy/df possible at this
    table's scale (bench-verified: identical row counts capped vs the
    oracle's uncapped replay), so the capped operator runs its exact
    branches."""
    h32 = hash32_sql("shingle")
    sides = []
    for tag, scope in (("l", "doc_id % 2 = 0"), ("r", "doc_id % 2 = 1")):
        sides.append(f"""
      {tag}tk AS (SELECT doc_id, {_TK} AS tk FROM documents WHERE {scope}),
      {tag}sh AS MATERIALIZED (
        SELECT doc_id, unnest({_BIGRAMS}) AS shingle FROM {tag}tk),
      {tag}hx AS (SELECT doc_id, shingle, {h32} AS h FROM {tag}sh),
      {tag}mh AS (
        SELECT doc_id,
               {_mh_cols(16)}
        FROM {tag}hx GROUP BY doc_id),
      {tag}b AS (
        {_band_rows(4, 4, src=f"{tag}mh")})""")
    return f"""
      WITH {",".join(sides)},
      cand AS MATERIALIZED (
        SELECT DISTINCT lb.doc_id AS left_id, rb.doc_id AS right_id
        FROM lb JOIN rb ON lb.band = rb.band AND lb.bucket = rb.bucket),
      lsz AS (SELECT doc_id, COUNT(*) AS n FROM lsh GROUP BY doc_id),
      rsz AS (SELECT doc_id, COUNT(*) AS n FROM rsh GROUP BY doc_id),
      inter AS (
        SELECT l.doc_id AS left_id, r.doc_id AS right_id, COUNT(*) AS ni
        FROM lsh l JOIN rsh r ON l.shingle = r.shingle
        GROUP BY 1, 2)
      SELECT i.left_id, i.right_id,
             ROUND(CAST(ni AS DOUBLE) / (ls.n + rs.n - ni), 4) AS jaccard
      FROM inter i
      JOIN cand ON i.left_id = cand.left_id AND i.right_id = cand.right_id
      JOIN lsz ls ON i.left_id = ls.doc_id
      JOIN rsz rs ON i.right_id = rs.doc_id
      WHERE ROUND(CAST(ni AS DOUBLE) / (ls.n + rs.n - ni), 4) >= 0.5"""


@query(
    "q69_fuzzy_join",
    oracle=_q69_oracle(),
    doc="cross-relation fuzzy join (operators.fuzzyjoin.fuzzy_join): two "
        "disjoint document slices joined on exact bigram-shingle Jaccard "
        ">= 0.5, candidates from shared MinHash band buckets on BOTH "
        "sides — the scale generalization of the reference's exact "
        "enrichment equi-join (backfill_user_profiles.py:169-175) to "
        "dirty keys. The oracle reproduces banding AND rescore; the "
        "bucket/df caps (500/10000) exceed any occupancy at this "
        "table's scale, so the capped production operator runs its "
        "exact branches (the q31b argument). Splits the WHOLE table "
        "even/odd so the bench measures the join, not the per-job "
        "floor (the q57 scope rule)",
)
def q69(spark: SparkSession, sf: str) -> DataFrame:
    from knightshift_spark.operators.fuzzyjoin import fuzzy_join

    docs = t(spark, sf, "documents")
    left = docs.filter(F.col("doc_id") % 2 == 0)
    right = docs.filter(F.col("doc_id") % 2 == 1)
    return fuzzy_join(
        left, right, threshold=0.5, num_hashes=16, bands=4, max_bucket=500
    )


# ---------------------------------------------------------------------------
# q70: substring-level exact dedup (operators.substring)
# ---------------------------------------------------------------------------

_K, _D = 20, 4  # anchor gram length / density — small k so the synthetic
# corpus's shared boilerplate yields real spans at this scope (65 docs)


def _q70_oracle() -> str:
    """Character-level replay of the anchor pipeline: every k-gram whose
    portable hash ≡ 0 (mod density) is an anchor; occurrences after the
    globally first (min doc, then min pos) mark k-windows; windows merge
    gaps-and-islands per doc; spans cut out of the text via ordered
    slice concatenation. All integer/md5 arithmetic — zero float."""
    h32 = hash32_sql("gram")
    return f"""
      WITH d AS MATERIALIZED (
        SELECT doc_id, text FROM documents WHERE doc_id < 150),
      g AS (
        SELECT doc_id,
               unnest(range(1, greatest(len(text) - {_K} + 2, 1))) AS pos,
               text
        FROM d),
      gr AS (SELECT doc_id, pos, substr(text, pos, {_K}) AS gram FROM g),
      anc AS MATERIALIZED (
        SELECT doc_id, pos, gram FROM gr WHERE {h32} % {_D} = 0),
      lat AS (
        SELECT doc_id, pos, pos + {_K} - 1 AS e
        FROM (SELECT doc_id, pos,
                     ROW_NUMBER() OVER (PARTITION BY gram
                                        ORDER BY doc_id, pos) AS rn
              FROM anc)
        WHERE rn > 1),
      nw AS (
        SELECT doc_id, pos, e,
               CASE WHEN MAX(e) OVER w IS NULL THEN 1
                    WHEN pos > MAX(e) OVER w + 1 THEN 1
                    ELSE 0 END AS isnew
        FROM lat
        WINDOW w AS (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      isl AS (
        SELECT doc_id, pos, e,
               SUM(isnew) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS island
        FROM nw),
      spans AS MATERIALIZED (
        SELECT doc_id, island, MIN(pos) AS s, MAX(e) AS en
        FROM isl GROUP BY doc_id, island),
      sl AS (
        SELECT doc_id, s, en,
               COALESCE(LAG(en) OVER (PARTITION BY doc_id ORDER BY s), 0) AS pe
        FROM spans),
      per AS (
        SELECT sl.doc_id,
               COUNT(*) AS n_spans,
               CAST(SUM(en - s + 1) AS BIGINT) AS dup_chars,
               COALESCE(string_agg(substr(d.text, pe + 1, s - pe - 1),
                                   '' ORDER BY s), '')
                 || substr(d.text, MAX(en) + 1) AS stripped
        FROM sl JOIN d ON sl.doc_id = d.doc_id
        GROUP BY sl.doc_id, d.text)
      SELECT d.doc_id,
             COALESCE(per.n_spans, 0) AS n_spans,
             CAST(COALESCE(per.dup_chars, 0) AS BIGINT) AS dup_chars,
             md5(COALESCE(per.stripped, d.text)) AS stripped_fp
      FROM d LEFT JOIN per ON d.doc_id = per.doc_id"""


@query(
    "q70_substring_dedup",
    oracle=_q70_oracle(),
    doc="substring-level exact dedup (the ExactSubstr recipe via "
        "content-defined anchors, operators.substring): per document, "
        "the maximal character spans whose content's globally-first "
        "occurrence lies elsewhere (duplicated_spans: span count + "
        "duplicated char mass) and the md5 of the text with those spans "
        "cut out (strip_duplicated_spans) — both oracle-checked against "
        "a character-level DuckDB replay of anchor selection, "
        "first-occurrence ranking, gaps-and-islands merge, and ordered "
        "slice concatenation. k=20, density=4 at the 150-doc demo scope; "
        "the operator itself is unbounded (one gram-keyed shuffle + one "
        "doc-keyed merge at any scale)",
)
def q70(spark: SparkSession, sf: str) -> DataFrame:
    from knightshift_spark.operators.substring import (
        duplicated_spans,
        strip_duplicated_spans,
    )

    docs = t(spark, sf, "documents").filter(F.col("doc_id") < 150).select(
        "doc_id", "text"
    )
    spans = duplicated_spans(docs, k=_K, density=_D)
    per = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("end") - F.col("start") + 1).cast("bigint").alias("dup_chars"),
    )
    stripped = strip_duplicated_spans(docs, k=_K, density=_D).select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("stripped_fp")
    )
    return (
        docs.select("doc_id")
        .join(per, "doc_id", "left")
        .join(stripped, "doc_id", "left")
        .fillna({"n_spans": 0, "dup_chars": 0})
    )


# ---------------------------------------------------------------------------
# q71: heavy hitters (operators.heavyhitters.frequent_ngrams)
# ---------------------------------------------------------------------------


@query(
    "q71_heavy_hitters",
    oracle=f"""
      WITH toks AS (SELECT {_TK} AS tk FROM documents),
      g AS MATERIALIZED (
        SELECT unnest(list_transform(range(1, len(tk)),
                      i -> tk[i] || ' ' || tk[i+1])) AS item
        FROM toks)
      SELECT item, COUNT(*) AS n FROM g GROUP BY item
      HAVING COUNT(*) >= GREATEST(1, CAST(CEIL(
        (SELECT COUNT(*) FROM g) * CAST(0.001 AS DOUBLE)) AS BIGINT))""",
    doc="corpus-wide frequent word bigrams >= 0.1% of all occurrences "
        "(operators.heavyhitters.frequent_ngrams): Misra-Gries summaries "
        "per partition (cap 4096) -> exact recount of the candidate set "
        "only — the EXACT answer with shuffle O(candidates) instead of "
        "O(distinct grams), the boilerplate-phrase detector at 100 TB. "
        "Exactness premise min_frac > 1/(cap+1) holds at every SF by "
        "construction (0.001 > 1/4097); the full-count DuckDB oracle "
        "pins that the bounded-shuffle path IS exact, not approximate. "
        "min_count derives as ceil(N * min_frac) in IEEE double in both "
        "engines",
)
def q71(spark: SparkSession, sf: str) -> DataFrame:
    from knightshift_spark.operators.heavyhitters import frequent_ngrams

    return frequent_ngrams(
        t(spark, sf, "documents"), n=2, min_frac=0.001, cap=4096
    )
