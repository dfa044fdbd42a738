"""Quality-classifier tests: separable synthetic corpora, deterministic
Pareto keep-rule, Spark-ML model persistence roundtrip."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from knightshift_spark.operators.classifier import (
    featurize_docs,
    pareto_quality_filter,
    score_docs,
    train_quality_classifier,
)

_GOOD = (
    "theorem proof analysis careful study results evidence method "
    "experiment rigorous detailed measured prose paragraph chapter"
).split()
_BAD = (
    "click buy cheap free winner casino pills viagra lottery spam "
    "subscribe offer deal discount limited"
).split()


def _corpus(spark, vocab, n, seed, prefix):
    rng = random.Random(seed)
    rows = [
        (f"{prefix}{i}", " ".join(rng.choices(vocab, k=30))) for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def _fixture(spark):
    good = _corpus(spark, _GOOD, 80, 1, "g")
    bad = _corpus(spark, _BAD, 80, 2, "b")
    model = train_quality_classifier(good, bad, dim=1 << 12, max_iter=25)
    return good, bad, model


def test_classifier_separates_synthetic_corpora(spark):
    good, bad, model = _fixture(spark)
    gs = score_docs(model, _corpus(spark, _GOOD, 20, 3, "gt"))
    bs = score_docs(model, _corpus(spark, _BAD, 20, 4, "bt"))
    g_min = gs.agg(F.min("quality_score")).collect()[0][0]
    b_max = bs.agg(F.max("quality_score")).collect()[0][0]
    assert g_min > 0.9, g_min
    assert b_max < 0.1, b_max
    # scoring keeps every original column and adds exactly one
    assert gs.columns == ["doc_id", "text", "quality_score"]


def test_pareto_filter_deterministic_and_biased(spark):
    good, bad, model = _fixture(spark)
    mixed = _corpus(spark, _GOOD, 50, 5, "m").unionByName(
        _corpus(spark, _BAD, 50, 6, "x")
    )
    kept1 = sorted(r["doc_id"] for r in pareto_quality_filter(model, mixed).collect())
    kept2 = sorted(r["doc_id"] for r in pareto_quality_filter(model, mixed).collect())
    assert kept1 == kept2  # same rows every run — md5-keyed draw
    n_good = sum(1 for d in kept1 if d.startswith("m"))
    n_bad = sum(1 for d in kept1 if d.startswith("x"))
    assert n_good >= 45  # high scorers essentially always kept
    assert n_bad <= 15  # low scorers survive only via the pareto tail
    # a different salt re-deals the tail but not the high scorers
    kept3 = sorted(
        r["doc_id"]
        for r in pareto_quality_filter(model, mixed, salt="v2").collect()
    )
    assert sum(1 for d in kept3 if d.startswith("m")) >= 45


def test_model_persistence_roundtrip(spark, tmp_path):
    from pyspark.ml.classification import LogisticRegressionModel

    good, bad, model = _fixture(spark)
    path = str(tmp_path / "quality_lr")
    model.write().overwrite().save(path)
    loaded = LogisticRegressionModel.load(path)
    probe = _corpus(spark, _GOOD + _BAD, 10, 7, "p")
    a = score_docs(model, probe).orderBy("doc_id").collect()
    b = score_docs(loaded, probe).orderBy("doc_id").collect()
    assert [r["quality_score"] for r in a] == [r["quality_score"] for r in b]


def test_featurize_is_shuffle_free(spark):
    docs = _corpus(spark, _GOOD, 5, 8, "d")
    plan = featurize_docs(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_null_text_scores_instead_of_crashing(spark):
    good, bad, model = _fixture(spark)
    probe = spark.createDataFrame(
        [("p1", "careful study results"), ("p2", None)],
        "doc_id string, text string",
    )
    rows = {r["doc_id"]: r["quality_score"] for r in score_docs(model, probe).collect()}
    assert set(rows) == {"p1", "p2"}  # the null row survives (empty features)
