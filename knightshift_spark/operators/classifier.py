"""Trainable document-quality classifier (the GPT-3/CCNet filtering
recipe, Spark-ML native).

Large-scale corpus curation's workhorse quality gate is a LINEAR
classifier over hashed bag-of-ngram features, trained to separate a
high-quality reference corpus from raw crawl text, then applied to every
document with a stochastic Pareto keep-rule (Brown et al. 2020 appendix
A; CCNet's fastText stage is the same shape). The reference pipeline's
hand-written validity rules (`validate_tv_channel_games.py`) are the
fixed-rule ancestor of this learned gate.

Spark-first layout — every stage is JVM-side except nothing:
- features: our `word_tokens` (+ word bigrams) hashed by Spark ML's
  ``HashingTF`` (hashing trick: fixed dimensionality, no vocabulary
  build, no driver state, identical hashing at train and score time).
- model: ``pyspark.ml.classification.LogisticRegression`` — distributed
  L-BFGS over the cluster, the idiomatic Spark expression of "fastText
  without subword embeddings".
- scoring: ``model.transform`` (a narrow map — no shuffle), probability
  of the high-quality class exposed as ``quality_score``.
- keep rule: deterministic Pareto thresholding — the md5-keyed uniform
  (same family as ``operators.sampling``) is transformed to a Pareto
  draw, so re-runs keep EXACTLY the same rows (the published recipe's
  ``np.random.pareto`` is irreproducible across runs/partitionings;
  determinism is this engine's contract).

Model persistence is Spark ML's own (``model.save``/``load`` — parquet
coefficients, exchangeable between clusters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from knightshift_spark.operators.dedup import (
    stable_hash32,
    word_ngrams_all,
    word_tokens,
)

_UNIFORM_BUCKETS = 1 << 30


def featurize_docs(
    docs: DataFrame,
    text_col: str = "text",
    dim: int = 1 << 18,
    bigrams: bool = True,
    features_col: str = "features",
) -> DataFrame:
    """Append a hashed term-frequency vector column. Unigrams (+word
    bigrams by default) → ``HashingTF(dim)``. All original columns pass
    through; the transform is a narrow projection (no shuffle, no fitted
    state — hashing needs no fit, which is what makes train/score
    consistent for free)."""
    from pyspark.ml.feature import HashingTF

    tk = word_tokens(F.col(text_col))
    terms = F.concat(tk, word_ngrams_all(tk, 2)) if bigrams else tk
    # NULL text → empty term array, not a null one: HashingTF throws on
    # null input, and a raw crawl always has some null-text rows
    with_terms = docs.withColumn(
        "__terms", F.coalesce(terms, F.array().cast("array<string>"))
    )
    htf = HashingTF(
        inputCol="__terms", outputCol=features_col, numFeatures=dim
    )
    return htf.transform(with_terms).drop("__terms")


def train_quality_classifier(
    high_quality: DataFrame,
    low_quality: DataFrame,
    text_col: str = "text",
    dim: int = 1 << 18,
    bigrams: bool = True,
    reg_param: float = 1e-4,
    max_iter: int = 50,
):
    """Fit the linear quality model: label 1 = high-quality corpus,
    label 0 = raw corpus. Returns a ``LogisticRegressionModel``; pass it
    to ``score_docs`` / ``pareto_quality_filter``. Training is one
    union + distributed L-BFGS — both corpora stay distributed, nothing
    but the (dim-sized) coefficient vector ever reaches the driver."""
    from pyspark.ml.classification import LogisticRegression

    def prep(df: DataFrame, label: float) -> DataFrame:
        return featurize_docs(df, text_col, dim, bigrams).select(
            F.col("features"), F.lit(label).alias("label")
        )

    data = prep(high_quality, 1.0).unionByName(prep(low_quality, 0.0))
    lr = LogisticRegression(
        maxIter=max_iter, regParam=reg_param, standardization=False
    )
    return lr.fit(data)


import threading
import weakref

# keyed by the model OBJECT, not stored on it (ADVICE r9: mutating the
# caller's model was a surprising side effect and racy for concurrent
# first scores); weak keys let discarded models free their clones
_SUMMARY_FREE_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()
_SUMMARY_FREE_LOCK = threading.Lock()


def _summary_free(model):
    """A copy of ``model`` with the training summary DETACHED.

    The summary holds its SparkSession, and ``model.transform``'s
    scoring lambda captures the model — so the session rides into every
    scoring task closure. That is dead weight at best, and on Spark 4.1
    it is a correctness trap: a session that has ever evaluated a
    ``df.observe(Observation, ...)`` carries a non-serializable
    ObservationManager, and scoring then dies with 'Task not
    serializable' arbitrarily far from the cause. Persisted models drop
    their summary by contract, so one write/read round-trip is the
    supported detach; cached on the instance so it costs once.

    The round-trip path defaults to a driver tempdir, which is only
    correct when driver and executors share a filesystem (local mode —
    ML writers run Spark jobs, so executors do the writing). On a
    multi-node cluster set ``KNIGHTSHIFT_SCRATCH`` to a shared-FS/DFS
    URI; the detach then round-trips through storage every node sees —
    a non-local master WITHOUT scratch set fails fast here with the
    remedy, instead of dying inside executor-side ML writer tasks
    (ADVICE r9). The clone is cached in a lock-guarded module-level
    weak map, so concurrent first scores detach once and the caller's
    model object is never mutated."""
    if not getattr(model, "hasSummary", False):
        return model
    with _SUMMARY_FREE_LOCK:
        cached = _SUMMARY_FREE_CACHE.get(model)
        if cached is not None:
            return cached
        import os
        import shutil
        import tempfile
        import uuid

        scratch = os.environ.get("KNIGHTSHIFT_SCRATCH")
        if not scratch:
            from pyspark.sql import SparkSession

            spark = SparkSession.getActiveSession()
            master = spark.sparkContext.master if spark is not None else ""
            if master and not master.startswith("local"):
                raise RuntimeError(
                    "score_docs needs to detach the model's training "
                    "summary via a save/load round-trip, and the default "
                    "driver tempdir is not visible to executors on "
                    f"master={master!r}. Set KNIGHTSHIFT_SCRATCH to a "
                    "shared-FS/DFS URI (e.g. hdfs:///tmp or s3a://...), "
                    "or score with a model loaded from disk (persisted "
                    "models carry no summary)."
                )
        d = (
            f"{scratch.rstrip('/')}/ks-clf-{uuid.uuid4().hex}"
            if scratch
            else tempfile.mkdtemp(prefix="ks-clf-")
        )
        try:
            path = os.path.join(d, "m") if not scratch else f"{d}/m"
            model.write().overwrite().save(path)
            clean = type(model).load(path)
        finally:
            if not scratch:
                shutil.rmtree(d, ignore_errors=True)
            # shared-FS scratch: best-effort cleanup through the JVM
            # Hadoop FS would add a config dependency here; callers own
            # scratch GC.
        _SUMMARY_FREE_CACHE[model] = clean
        return clean


def score_docs(
    model,
    docs: DataFrame,
    text_col: str = "text",
    bigrams: bool = True,
    score_col: str = "quality_score",
) -> DataFrame:
    """All original columns + ``quality_score`` = P(high quality).
    ``model.transform`` is a narrow map over the hashed features —
    scoring 100 TB is embarrassingly parallel with zero shuffle."""
    from pyspark.ml.functions import vector_to_array

    model = _summary_free(model)
    dim = model.numFeatures
    feats = featurize_docs(docs, text_col, dim, bigrams)
    scored = model.transform(feats)
    return scored.select(
        *docs.columns,
        F.round(vector_to_array("probability")[1], 6).alias(score_col),
    )


def pareto_quality_filter(
    model,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 9.0,
    bigrams: bool = True,
    salt: str = "",
    score_col: str = "quality_score",
) -> DataFrame:
    """The published stochastic keep-rule, made deterministic: keep a
    document iff ``pareto_draw(alpha) > 1 - quality_score``, where the
    draw is the inverse-CDF transform ``(1-u)^(-1/alpha) - 1`` of an
    md5-keyed uniform ``u`` of (id, salt). High-scoring docs are almost
    always kept; low scorers survive with probability ``~(2-score)^-α``
    — the long tail that keeps the filtered corpus from collapsing onto
    the classifier's idea of quality. Same rows every run; change
    ``salt`` to re-deal the tail. Returns kept docs + their score."""
    scored = score_docs(model, docs, text_col, bigrams, score_col)
    u = (
        stable_hash32(
            F.concat(F.col(id_col).cast("string"), F.lit(f"|pareto|{salt}"))
        )
        % _UNIFORM_BUCKETS
    ).cast("double") / F.lit(float(_UNIFORM_BUCKETS))
    draw = F.pow(F.lit(1.0) - u, F.lit(-1.0 / alpha)) - F.lit(1.0)
    return scored.filter(draw > (F.lit(1.0) - F.col(score_col)))
