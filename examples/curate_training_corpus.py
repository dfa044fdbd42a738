"""Example — end-to-end training-corpus curation with this engine.

The full composition a pretraining-data pipeline runs, each stage a
DataFrame transform designed for 100 TB (see SCALE.md):

  paragraph dedup → doc-level curation (exact dedup → MinHash-LSH
  near-dup → quality/lang gates → benchmark decontamination →
  deterministic mixture sampling) → ANN index build for the survivors'
  embeddings → token-balanced training shards with a verified manifest.

Runnable against the driver testdata:

    python examples/curate_training_corpus.py [sf_dir] [out_dir]

NOT imported by the engine or its tests — a usage demonstration.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from knightshift_spark.operators.dedup import dedup_paragraphs  # noqa: E402
from knightshift_spark.operators.similarity import write_ann_index  # noqa: E402
from knightshift_spark.pipelines.corpus import curate_corpus  # noqa: E402
from knightshift_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated_corpus"
    spark = get_spark("curate-example")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # held-out eval slice to decontaminate against (in production: the
    # benchmark suites' text)
    eval_docs = docs.filter(F.col("doc_id") % 25 == 7)
    corpus = docs.filter(F.col("doc_id") % 25 != 7)

    # 1. paragraph-level dedup (C4-style boilerplate removal)
    para_clean = dedup_paragraphs(corpus).join(
        corpus.select("doc_id", "lang", "source"), "doc_id"
    )

    # 2. doc-level curation with decontamination + mixture; cluster dedup
    # (connected components over confirmed pairs), the Gopher repetition
    # screen, the CCNet-style LM gate (reference model = the corpus's own
    # head — demo stand-in for a curated reference corpus), and a final
    # PII scrub are the production-strength settings
    from knightshift_spark.operators.lmscore import unigram_logprob_table

    lm_table = unigram_logprob_table(corpus.limit(500))

    # 1b. boilerplate-phrase report: exact corpus-wide frequent trigrams
    # (two-phase heavy hitters) — the phrases a cleaning pass would strip
    from knightshift_spark.operators.heavyhitters import frequent_ngrams

    print("most frequent trigrams (exact, two-phase):")
    frequent_ngrams(para_clean, 3, cap=2048, min_frac=2e-3, k=5).show(
        truncate=False
    )

    # 1c. learned quality gate, bootstrapped by weak supervision: the
    # stopword-ratio heuristic labels a training split, the linear
    # classifier GENERALIZES beyond it (hashed n-grams see content the
    # single ratio can't). In production the positive side is a curated
    # reference corpus (the GPT-3 recipe)
    from knightshift_spark.functions.text import stopword_ratio
    from knightshift_spark.operators.classifier import train_quality_classifier

    ranked = corpus.select(
        "doc_id", "text", stopword_ratio(F.col("text")).alias("__swr")
    )
    hi = ranked.orderBy(F.col("__swr").desc(), "doc_id").limit(200)
    lo = ranked.orderBy(F.col("__swr").asc(), "doc_id").limit(200)
    quality_model = train_quality_classifier(hi, lo, dim=1 << 16, max_iter=20)

    result = curate_corpus(
        para_clean,
        strip_substrings={"k": 40, "density": 8},  # ExactSubstr pre-cut
        jaccard_threshold=0.5,
        min_tokens=5,
        langs=("en", "und"),
        persist_intermediates=True,
        eval_docs=eval_docs,
        quota=200,  # no single source dominates the mixture
        mixture={f"src{i}": 1.0 if i % 2 == 0 else 0.5 for i in range(20)},
        transitive_closure=True,
        repetition_thresholds={"dup_line_frac": 0.30, "dup_5gram_char_frac": 0.15},
        lm_table=lm_table,
        min_avg_logprob=-10.0,  # lenient: cuts only statistical outliers
        quality_model=quality_model,
        # lenient Pareto tail (alpha 1 keeps ~half even at score 0) —
        # the synthetic demo corpus has no true junk; production uses
        # the published alpha=9 against a real reference corpus
        classifier_pareto_alpha=1.0,
        pii_scrub=True,
    )
    # 2b. sizing report BEFORE the destructive write: what the cluster
    # dedup is about to do (clusters, docs removed, text mass reclaimed)
    # — the operational gate ops teams read before committing
    from knightshift_spark.operators.dedup import dedup_report

    dedup_report(para_clean, result.near_dup_pairs).show(truncate=False)

    result.kept.write.mode("overwrite").parquet(f"{out_dir}/documents")
    result.stats.show(truncate=False)

    # 2c. layout hygiene: compact the (stage-fragmented) output into
    # target-sized, id-clustered files — the write a scan actually wants
    from knightshift_spark.plans.layout import compact_parquet

    print(
        compact_parquet(
            spark,
            f"{out_dir}/documents",
            f"{out_dir}/documents_compacted",
            target_file_mb=256,
            order_by=["doc_id"],
        )
    )

    # 3. ANN index over the survivors' embeddings (build once, query many;
    # later arrivals go through append_ann_index — no retrain until its
    # drift signal says the codebooks went stale)
    kept_ids = spark.read.parquet(f"{out_dir}/documents").select(
        F.col("doc_id").alias("vec_id")
    )
    write_ann_index(
        emb.join(kept_ids, "vec_id", "left_semi"),
        f"{out_dir}/ann_index",
        n_clusters=4,
        m=4,
        ksub=8,
    )

    # 4. the output stage: token-balanced, deterministic training shards
    # with a verifiable manifest — what the training run actually reads
    from knightshift_spark.functions.text import token_count
    from knightshift_spark.operators.sharding import (
        verify_shards,
        write_training_shards,
    )

    kept = spark.read.parquet(f"{out_dir}/documents_compacted").withColumn(
        "n_tokens", token_count(F.col("text"))
    )
    print(write_training_shards(kept, f"{out_dir}/shards", shard_tokens=2_000))
    drift = verify_shards(spark, f"{out_dir}/shards")
    assert drift.count() == 0, "shard manifest drift detected"
    print(f"curated corpus + ANN index + shards written under {out_dir}")


if __name__ == "__main__":
    main()
