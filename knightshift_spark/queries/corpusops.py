"""Corpus-construction queries: paragraph dedup, BM25 harvesting, packing.

Round-3 additions promoting the pytest-only corpus operators into the
driver's oracle-checked set (VERDICT r2 "What's missing" #1). The oracles
reproduce the exact arithmetic in DuckDB:

- paragraph identity is the same md5 fingerprint family as q29;
- BM25 keeps Lucene's idf formula with the identical operation order and
  accumulates per-term contributions in DECIMAL(28,12) on BOTH engines,
  so float-sum order can't flip the rounded output (a 1-ulp ``ln``
  divergence is ~1e-16 relative — three orders below the decimal grid);
- chunk packing is integer arithmetic end-to-end (exact prefix sums).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from knightshift_spark.operators.packing import chunk_pack
from knightshift_spark.operators.ranking import bm25_scores
from knightshift_spark.queries import query
from knightshift_spark.tables import load_table as t

# The driver's documents table is single-line text (no '\n'), so the
# declared paragraph-dedup query splits on a literal word separator that
# actually occurs in the corpus; the operator itself is separator-agnostic
# (production uses '\n\n' / '\n').
_PARA_SEP = " a "

_BM25_TERMS = ("join", "hash", "merge")


@query(
    "q66_paragraph_dedup",
    oracle=rf"""
      WITH p0 AS (
        SELECT doc_id, string_split(text, '{_PARA_SEP}') AS parts FROM documents),
      paras AS (
        SELECT doc_id, CAST(j AS INT) AS pos,
               parts[CAST(j + 1 AS INT)] AS para,
               md5(regexp_replace(trim(lower(parts[CAST(j + 1 AS INT)])),
                                  '\s+', ' ', 'g')) AS fp
        FROM p0, unnest(range(0, len(parts))) AS u(j)),
      ranked AS (
        SELECT doc_id, pos, para,
               ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id, pos) AS rn
        FROM paras)
      SELECT doc_id, string_agg(para, '{_PARA_SEP}' ORDER BY pos) AS text
      FROM ranked WHERE rn = 1 GROUP BY doc_id""",
    doc="paragraph-level exact dedup (C4/CCNet-style): a paragraph repeated "
        "anywhere survives only at its first (doc_id, pos) occurrence; "
        "documents reassemble from surviving paragraphs in order and drop "
        "out entirely when every paragraph was claimed elsewhere. "
        "min(struct) first-occurrence + doc reassembly — 3 bounded shuffles",
)
def q66(spark: SparkSession, sf: str) -> DataFrame:
    from knightshift_spark.operators.dedup import dedup_paragraphs

    return dedup_paragraphs(t(spark, sf, "documents"), sep=_PARA_SEP)


@query(
    "q67_bm25_topk",
    oracle=r"""
      WITH toks AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(trim(lower(text)), '\s+') END AS tk
        FROM documents),
      stats AS (
        SELECT COUNT(*) AS n_docs, AVG(len(tk)) AS avgdl FROM toks),
      tf AS (
        SELECT doc_id, doc_len, term, COUNT(*) AS tf
        FROM (SELECT doc_id, len(tk) AS doc_len, unnest(tk) AS term FROM toks) u
        WHERE term IN ('join', 'hash', 'merge')
        GROUP BY 1, 2, 3),
      dft AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
      scored AS (
        SELECT doc_id,
               COUNT(*) AS n_terms_matched,
               SUM(CAST(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                        * (tf * 2.2)
                        / (tf + 1.2 * (0.25 + (0.75 * doc_len) / avgdl))
                        AS DECIMAL(28,12))) AS s
        FROM tf JOIN dft USING (term) CROSS JOIN stats
        GROUP BY doc_id)
      SELECT doc_id, n_terms_matched, ROUND(CAST(s AS DOUBLE), 6) AS bm25
      FROM scored ORDER BY bm25 DESC, doc_id LIMIT 20""",
    doc="Okapi BM25 (Lucene idf) top-20 against a fixed query-term set — "
        "targeted corpus harvesting. Token stream filters to the query "
        "terms BEFORE aggregation; df/avgdl are tiny broadcast aggregates. "
        "Absorbs former q23_topk: the same agg + global order + limit "
        "shape, planned as TakeOrderedAndProject (no full-sort "
        "materialization)",
)
def q67(spark: SparkSession, sf: str) -> DataFrame:
    return bm25_scores(t(spark, sf, "documents"), list(_BM25_TERMS)).limit(20)


_PACK_BUCKETS = 64  # greedy-pack range buckets in the declared form: small
# enough that the oracle's per-bucket recursive walk stays shallow, large
# enough to exercise real bucket-boundary behavior at every SF


@query(
    "q68_chunk_pack",
    oracle=rf"""
      WITH RECURSIVE d AS MATERIALIZED (
        SELECT doc_id,
               CAST(CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END
                    AS BIGINT) AS n_tokens
        FROM documents),
      pre AS (
        SELECT doc_id, n_tokens,
               CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS tok_start
        FROM d),
      bb AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi FROM d),
      bkts AS (
        SELECT doc_id, n_tokens,
               CAST(floor((doc_id - lo)
                    * GREATEST(1, LEAST({_PACK_BUCKETS}, hi - lo + 1))
                    / (hi - lo + 1)) AS INT) AS bkt
        FROM d, bb),
      ordered AS MATERIALIZED (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY bkt ORDER BY doc_id) AS rn
        FROM bkts),
      walk AS (
        SELECT bkt, rn, doc_id, n_tokens,
               CAST(0 AS BIGINT) AS pack, 0 AS pos, n_tokens AS used
        FROM ordered WHERE rn = 1
        UNION ALL
        SELECT o.bkt, o.rn, o.doc_id, o.n_tokens,
               CASE WHEN w.used > 0 AND w.used + o.n_tokens > 256
                    THEN w.pack + 1 ELSE w.pack END,
               CASE WHEN w.used > 0 AND w.used + o.n_tokens > 256
                    THEN 0 ELSE w.pos + 1 END,
               CASE WHEN w.used > 0 AND w.used + o.n_tokens > 256
                    THEN o.n_tokens ELSE w.used + o.n_tokens END
        FROM walk w JOIN ordered o ON o.bkt = w.bkt AND o.rn = w.rn + 1)
      SELECT pre.doc_id, pre.n_tokens, tok_start,
             tok_start // 256 AS chunk_first,
             (tok_start + greatest(pre.n_tokens - 1, 0)) // 256 AS chunk_last,
             (tok_start + greatest(pre.n_tokens - 1, 0)) // 256
               - tok_start // 256 + 1 AS n_chunks_spanned,
             (CAST(w.bkt AS BIGINT) << 32) + w.pack AS pack_id,
             w.pos AS pack_pos
      FROM pre JOIN walk w ON pre.doc_id = w.doc_id""",
    doc="GPT-style sequence packing, BOTH strategies over one token "
        "relation: concat-and-split (documents laid end-to-end in doc_id "
        "order, stream cut every 256 tokens — global span + chunk range "
        "per doc) AND first-fit whole-document greedy packing "
        "(operators.packing.greedy_pack: pack_id/pack_pos, packs never "
        "cross range buckets — its one scale concession, encoded "
        "identically in the oracle's per-bucket recursive-CTE walk, "
        "promoted from test_packing per ROADMAP item 2). Spark plan is "
        "the two-phase distributed prefix sum + one applyInPandas walk "
        "per bucket, NOT a global window — the oracle's serial SUM() "
        "OVER / recursion is exactly what the operator avoids at 100 TB; "
        "integer arithmetic end-to-end",
)
def q68(spark: SparkSession, sf: str) -> DataFrame:
    from knightshift_spark.functions.text import token_count
    from knightshift_spark.operators.packing import greedy_pack

    docs = t(spark, sf, "documents").select(
        "doc_id", token_count(F.col("text")).cast("bigint").alias("n_tokens")
    )
    packed = greedy_pack(docs, budget=256, n_buckets=_PACK_BUCKETS).select(
        "doc_id", "pack_id", "pack_pos"
    )
    return chunk_pack(docs, budget=256).join(packed, "doc_id")
