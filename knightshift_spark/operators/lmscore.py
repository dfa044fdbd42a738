"""Unigram LM quality scoring — CCNet-style perplexity filtering, lite.

CCNet (Wenzek et al. 2020, public method) ranks crawl documents by the
perplexity of a language model trained on a high-quality reference
corpus (they use KenLM 5-grams); documents statistically unlike the
reference are cut. This module implements the distributed skeleton of
that filter with a unigram model — the piece that is an ENGINE problem
(two-pass frequency/score dataflow, deterministic accumulation); heavier
models slot into the same table shape.

Two phases, both plain DataFrame ops:

1. ``unigram_logprob_table(ref_docs)`` — token frequencies over the
   reference corpus -> add-one-smoothed log-probabilities. One
   groupBy(token) shuffle; output is vocabulary-sized (model, not data).
2. ``lm_quality_score(docs, table)`` — per-document mean token
   log-prob under the model. Tokens explode, broadcast-join the model
   table (vocabulary-sized => broadcast at any corpus scale),
   out-of-vocabulary tokens take the smoothed unseen probability, and
   the per-doc mean accumulates in DECIMAL(28,12) so partition order
   can never flip a rounded score (the BM25 determinism rule).

Scores are natural-log per-token averages; ``exp(-avg_logprob)`` is the
perplexity. Higher avg_logprob (less negative) = more reference-like.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from knightshift_spark.operators.dedup import word_tokens

_DEC = "decimal(28,12)"


def unigram_logprob_table(
    ref_docs: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """(token, logp) over the reference corpus, add-one smoothed:
    logp = ln((count + 1) / (total + V + 1)). The ``+ 1`` slot in the
    denominator reserves mass for the single shared UNSEEN token every
    out-of-vocabulary term maps to at scoring time; that slot is stored
    IN the table as a NULL-token row (``token IS NULL`` — a value no
    real token can collide with), so a persisted model carries its own
    smoothing and survives parquet round-trips self-contained.
    ``min_count`` prunes the vocabulary tail (rare tokens carry little
    signal and bloat the broadcast); pruned tokens score as unseen."""
    import math

    toks = ref_docs.select(
        F.explode(word_tokens(F.col(text_col))).alias("token")
    )
    counts = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
    )
    # two tiny scalars (total mass + vocab size) — computed in ONE job
    total, vocab = counts.agg(F.sum("n"), F.count(F.lit(1))).collect()[0]
    total, vocab = int(total or 0), int(vocab or 0)
    denom = float(total + vocab + 1)
    vocab_rows = counts.select(
        "token",
        F.round(F.log((F.col("n") + 1) / F.lit(denom)), 12).alias("logp"),
    )
    from knightshift_spark.plans.localrel import local_relation

    unseen_row = local_relation(
        ref_docs.sparkSession,
        [(None, round(math.log(1.0 / denom), 12))],
        "token string, logp double",
    )
    return vocab_rows.unionByName(unseen_row)


def unseen_logprob(table: DataFrame) -> float:
    """The smoothed log-prob an out-of-vocabulary token receives — read
    from the table's own NULL-token row (one model-sized lookup)."""
    row = table.filter(F.col("token").isNull()).limit(1).collect()
    if not row:
        raise ValueError(
            "model table has no NULL-token unseen row — was it built by "
            "unigram_logprob_table?"
        )
    return float(row[0]["logp"])


def lm_quality_score(
    docs: DataFrame,
    table: DataFrame,
    unseen_logp: float | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, avg_logprob) — mean per-token log-prob under the
    unigram model. Empty documents score NULL (no evidence either way —
    the token-count gate is the right filter for them, not this one).
    ``unseen_logp`` defaults to the table-derived min_count=1 value."""
    if unseen_logp is None:
        unseen_logp = unseen_logprob(table)
    toks = docs.select(
        F.col(id_col), F.explode(word_tokens(F.col(text_col))).alias("token")
    )
    scored = toks.join(F.broadcast(table), "token", "left").select(
        id_col,
        F.coalesce("logp", F.lit(float(unseen_logp))).alias("logp"),
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        # DECIMAL accumulation: float-sum order varies per partitioning,
        # decimals do not — same rule as BM25 (queries/corpusops.py)
        F.sum(F.col("logp").cast(_DEC)).alias("__s"),
    )
    out = per_doc.select(
        id_col,
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.round((F.col("__s") / F.col("n_tokens")).cast("double"), 6).alias(
            "avg_logprob"
        ),
    )
    # docs with zero tokens never reach the explode — restore them with
    # NULL scores so the output covers the input id space. r14: detect
    # them with a direct token-count predicate on the docs scan instead
    # of anti-joining against ``out`` — the anti-join's build side was
    # the ENTIRE explode+join+aggregate subtree executed a second time
    # (runtime exchange reuse deduped only its shuffle stages), where
    # ``size(word_tokens(text)) = 0`` is one scan-level projection.
    # Identical output for per-id-unique inputs (the operator's
    # contract — callers run it post-dedup / per keyed batch): a doc
    # row yields exploded tokens iff its token array is non-empty, so
    # "id absent from out" ⟺ "this id's rows all have size 0".
    empties = docs.filter(
        F.coalesce(F.size(word_tokens(F.col(text_col))), F.lit(0)) == 0
    ).select(id_col)
    return out.unionByName(
        empties.select(
            id_col,
            F.lit(0).cast("bigint").alias("n_tokens"),
            F.lit(None).cast("double").alias("avg_logprob"),
        )
    )


def ppl_bucket(
    docs: DataFrame,
    table: DataFrame,
    edges: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str | None = None,
    unseen_logp: float | None = None,
    accuracy: int = 10_000,
) -> DataFrame:
    """CCNet's head/middle/tail split: bucket documents by their LM
    score's position in the corpus distribution — ``head`` is the most
    reference-like (highest avg log-prob / lowest perplexity), ``tail``
    the least. CCNet keeps head+middle for pretraining and samples the
    tail; the buckets here feed exactly that policy.

    ``edges`` are the (upper-tail, upper-head... ) quantile FRACTIONS of
    ``avg_logprob``: a doc below the ``edges[0]`` quantile is ``tail``,
    above ``edges[1]`` is ``head``, between is ``middle``. With
    ``group_col`` (CCNet buckets per language) the quantiles compute per
    group — one ``percentile_approx`` aggregate (bounded sketch state,
    group-count-sized output, broadcast back), so the corpus side is one
    scoring pass + a map-side join at any scale. Zero-token docs score
    NULL and bucket NULL (the token-count gate owns them); NULL-group
    docs also bucket NULL (no distribution of their own to rank in).

    Output: (id, [group], n_tokens, avg_logprob, ppl_bucket).
    """
    if not (0.0 < edges[0] < edges[1] < 1.0):
        raise ValueError(f"edges must satisfy 0 < lo < hi < 1, got {edges}")
    keep = [id_col] + ([group_col] if group_col else [])
    scored = lm_quality_score(
        docs, table, unseen_logp=unseen_logp, id_col=id_col, text_col=text_col
    )
    if group_col:
        scored = scored.join(docs.select(id_col, group_col), id_col)
    q = F.percentile_approx(
        "avg_logprob", F.array(F.lit(edges[0]), F.lit(edges[1])), accuracy
    )
    if group_col:
        cuts = scored.groupBy(group_col).agg(q.alias("__q"))
        both = scored.join(F.broadcast(cuts), group_col, "left")
    else:
        both = scored.crossJoin(F.broadcast(scored.agg(q.alias("__q"))))
    bucket = (
        # NULL cuts happen when the doc's group is NULL (it can never
        # equi-join its own cuts row back) — bucket NULL, don't let the
        # NULL comparisons fall through to 'middle'
        F.when(
            F.col("avg_logprob").isNull() | F.col("__q").isNull(),
            F.lit(None).cast("string"),
        )
        .when(F.col("avg_logprob") < F.element_at("__q", 1), F.lit("tail"))
        .when(F.col("avg_logprob") >= F.element_at("__q", 2), F.lit("head"))
        .otherwise(F.lit("middle"))
    )
    return both.select(*keep, "n_tokens", "avg_logprob", bucket.alias("ppl_bucket"))


def ppl_cuts(
    docs: DataFrame,
    table: DataFrame,
    edges: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
    id_col: str = "doc_id",
    text_col: str = "text",
    unseen_logp: float | None = None,
    accuracy: int = 10_000,
) -> tuple[float, float] | None:
    """The (lo, hi) ``avg_logprob`` cut VALUES at the ``edges`` quantiles
    of a REFERENCE corpus — CCNet's train-once side of the bucketing.
    Driver-sized (two floats); apply them to any later batch with
    ``ppl_bucket_with_cuts``. This is the split that makes the head/
    middle/tail policy streaming-safe: the corpus-global quantile runs
    once over the reference, incremental batches pay one scoring pass
    each and compare against constants. None on an empty/unscorable
    reference (no distribution to cut)."""
    if not (0.0 < edges[0] < edges[1] < 1.0):
        raise ValueError(f"edges must satisfy 0 < lo < hi < 1, got {edges}")
    scored = lm_quality_score(
        docs, table, unseen_logp=unseen_logp, id_col=id_col, text_col=text_col
    )
    row = scored.agg(
        F.percentile_approx(
            "avg_logprob", F.array(F.lit(edges[0]), F.lit(edges[1])), accuracy
        ).alias("__q")
    ).first()
    if row is None or row["__q"] is None:
        return None
    return float(row["__q"][0]), float(row["__q"][1])


def ppl_bucket_with_cuts(
    docs: DataFrame,
    table: DataFrame,
    cuts: tuple[float, float],
    id_col: str = "doc_id",
    text_col: str = "text",
    unseen_logp: float | None = None,
) -> DataFrame:
    """CCNet bucketing against PRECOMPUTED cut values (``ppl_cuts`` over
    a reference corpus): score each document and compare to constants —
    no corpus-global aggregate, so this is the form the incremental
    ingestion path runs per micro-batch. Same bucket rule as
    ``ppl_bucket``: below lo → ``tail``, at/above hi → ``head``,
    between → ``middle``; NULL score (zero tokens) buckets NULL.

    Output: (id, n_tokens, avg_logprob, ppl_bucket)."""
    lo, hi = float(cuts[0]), float(cuts[1])
    scored = lm_quality_score(
        docs, table, unseen_logp=unseen_logp, id_col=id_col, text_col=text_col
    )
    bucket = (
        F.when(F.col("avg_logprob").isNull(), F.lit(None).cast("string"))
        .when(F.col("avg_logprob") < F.lit(lo), F.lit("tail"))
        .when(F.col("avg_logprob") >= F.lit(hi), F.lit("head"))
        .otherwise(F.lit("middle"))
    )
    return scored.select(
        id_col, "n_tokens", "avg_logprob", bucket.alias("ppl_bucket")
    )
