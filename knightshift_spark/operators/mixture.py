"""Token-budget mixture planning — how much of each source to train on.

Pretraining recipes state their data mixture as tokens-per-source with
repetition ("epochs") for small high-quality sources (the LLaMA/GPT-3
papers publish exactly such tables). Turning desired WEIGHTS plus a
total token budget into per-source sampling fractions is a tiny
water-filling problem — but its inputs (per-source token counts) come
from the corpus, and its output must be APPLIED deterministically at
corpus scale. This module does both halves Spark-first:

- ``mixture_plan``: one aggregation computes per-source available
  tokens; the water-filling solve runs driver-side over the ≤#sources
  summary rows (iterate: spread the remaining budget across uncapped
  sources by weight; cap any source hitting ``max_epochs``; repeat —
  converges in ≤ #sources rounds). Returns the published-table shape:
  (source, available_tokens, weight, epochs, target_tokens).

- ``apply_mixture_plan``: replication + fractional sampling as pure
  DataFrame ops. A source at e epochs emits ⌊e⌋ full copies (explode
  of a ⌊e⌋-long sequence — map-side, no shuffle) plus an md5-keyed
  deterministic sample of the fractional remainder; every output row
  carries its ``epoch`` index so downstream shuffling/packing can keep
  copies apart. Same rows every run, every partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from knightshift_spark.functions.text import token_count


def source_token_counts(
    docs: DataFrame, source_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """(source, n_docs, n_tokens) — one map-side-combinable shuffle.
    NULL text counts 0 tokens (``token_count`` yields -1 for a null
    array under Spark's legacy sizeOfNull — unguarded, null-heavy
    sources would understate their totals and skew the budget split)."""
    return docs.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.greatest(token_count(F.col(text_col)), F.lit(0))
        ).alias("n_tokens"),
    )


def mixture_plan(
    docs: DataFrame,
    weights: dict[str, float],
    total_tokens: int,
    source_col: str = "source",
    text_col: str = "text",
    max_epochs: float = 4.0,
) -> list[dict]:
    """Water-filling mixture solve. Returns one dict per source:
    {source, available_tokens, weight, epochs, target_tokens}; sources
    absent from ``weights`` get epochs 0. Capped sources (at
    ``max_epochs``) release their unmet share to the uncapped rest, so
    the realized total meets the budget unless EVERY source caps (then
    the plan is the max_epochs ceiling and the shortfall is visible in
    the target sums)."""
    if total_tokens <= 0:
        raise ValueError(f"total_tokens must be positive, got {total_tokens}")
    bad = {s: w for s, w in weights.items() if w < 0}
    if bad:
        raise ValueError(f"negative weights: {bad}")
    counts = {
        r[source_col]: int(r["n_tokens"])
        for r in source_token_counts(docs, source_col, text_col).collect()
    }
    missing = set(weights) - set(counts)
    if missing:
        raise ValueError(f"weighted sources absent from corpus: {sorted(missing)}")

    active = {s for s, w in weights.items() if w > 0 and counts[s] > 0}
    epochs: dict[str, float] = {s: 0.0 for s in weights}
    budget = float(total_tokens)
    while active and budget > 1e-9:
        wsum = sum(weights[s] for s in active)
        capped = set()
        for s in sorted(active):
            share = budget * weights[s] / wsum
            want = epochs[s] + share / counts[s]
            if want >= max_epochs:
                capped.add(s)
        if not capped:
            for s in active:
                epochs[s] += (budget * weights[s] / wsum) / counts[s]
            budget = 0.0
        else:
            for s in capped:
                budget -= (max_epochs - epochs[s]) * counts[s]
                epochs[s] = max_epochs
            active -= capped
    return [
        {
            "source": s,
            "available_tokens": counts[s],
            "weight": weights[s],
            "epochs": round(epochs[s], 6),
            "target_tokens": int(epochs[s] * counts[s]),
        }
        for s in sorted(weights)
    ]


def apply_mixture_plan(
    docs: DataFrame,
    plan: list[dict],
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Materialize the plan: each source's docs appear ⌊epochs⌋ full
    times plus a deterministic md5-keyed sample of the remainder; the
    ``epoch`` column (1-based) distinguishes copies. Document-level
    granularity: the fractional epoch samples whole documents, so
    realized tokens track the target in expectation (exact-token
    cutting belongs to the packer, `operators.packing`).

    ONE corpus scan for the whole plan: the (tiny) plan broadcasts onto
    the docs, epochs explode map-side (⌊e⌋ copies plus a final slot the
    md5-bucket filter keeps with probability frac) — a per-source
    filter-and-union would re-scan the input once per source. The
    fractional draw reproduces ``sampling.hash_sample`` bit-for-bit
    (same bucket formula, salt ``{salt}|epoch{⌊e⌋+1}``)."""
    from knightshift_spark.operators.sampling import _BUCKETS, bucket_of

    spark = docs.sparkSession
    rows = [
        (str(r["source"]), int(float(r["epochs"])),
         round(float(r["epochs"]) - int(float(r["epochs"])), 9))
        for r in plan
        if float(r["epochs"]) > 0
    ]
    if not rows:
        return docs.limit(0).withColumn("epoch", F.lit(1))
    from knightshift_spark.plans.localrel import local_relation

    plan_df = local_relation(
        spark, rows, f"{source_col} string, __full int, __frac double"
    )
    joined = docs.join(F.broadcast(plan_df), source_col)
    hi = F.col("__full") + (F.col("__frac") > 0).cast("int")
    exploded = joined.withColumn(
        "epoch", F.explode(F.sequence(F.lit(1), hi))
    )
    # sampling's own bucket formula with a per-row salt suffix —
    # identical keep-set to hash_sample(sub, frac,
    # salt=f"{salt}|epoch{full+1}")
    bucket = bucket_of(
        id_col,
        F.concat(F.lit(f"|{salt}|epoch"), F.col("epoch").cast("string")),
    )
    kept = exploded.filter(
        (F.col("epoch") <= F.col("__full"))
        | (bucket < (F.col("__frac") * _BUCKETS).cast("bigint"))
    )
    return kept.drop("__full", "__frac")
