"""Corpus curation pipeline: crafted docs with known dedup/quality/lang
outcomes, plus empty-input robustness for the scale operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from knightshift_spark.pipelines.corpus import curate_corpus

GOOD_EN = (
    "the quick brown fox jumps over the lazy dog and it is a good day "
    "for the hounds to be out in the field with the pack"
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, GOOD_EN),
            (2, GOOD_EN),  # exact dup of 1 → removed
            (3, GOOD_EN + " extra tail words here"),  # near-dup of 1 → removed
            (4, "short"),  # fails min_tokens
            (5, "le chat est sur la table et il est un des animaux de la maison qui dort"),  # non-en
            (6, "a completely different document that is about the weather and the sea and it has the right amount of words in it"),
        ],
        "doc_id int, text string",
    )


def test_curate_corpus_end_to_end(spark):
    res = curate_corpus(_docs(spark), jaccard_threshold=0.5, min_tokens=5)
    kept = sorted(r["doc_id"] for r in res.kept.collect())
    assert kept == [1, 6]
    rows = res.stats.collect()
    stats = {r["reason"]: r["n"] for r in rows}
    assert stats == {
        "input": 6,
        "exact_dup_removed": 1,
        "near_dup_removed": 1,
        "quality_or_lang_removed": 2,
        "contaminated_removed": 0,
        "quota_removed": 0,
        "mixture_removed": 0,
        "kept": 2,
    }
    assert all(r["ok"] for r in rows)
    row = {r["doc_id"]: r for r in res.kept.collect()}
    assert row[1]["lang_pred"] == "en" and row[1]["n_tokens"] > 20


def test_curate_corpus_empty_input(spark):
    empty = spark.createDataFrame([], "doc_id int, text string")
    # BOTH stats paths must survive an empty corpus: the default
    # observe-instrumented action and the lazy union-of-counts plan
    for persist in (True, False):
        res = curate_corpus(empty, persist_intermediates=persist)
        assert res.kept.count() == 0
        stats = {r["reason"]: r["n"] for r in res.stats.collect()}
        assert stats["input"] == 0 and stats["kept"] == 0


def test_dedup_ops_empty_input(spark):
    from knightshift_spark.operators.dedup import (
        jaccard_pairs,
        lsh_candidate_pairs,
        minhash_wide,
        simhash16,
    )

    empty = spark.createDataFrame([], "doc_id int, text string")
    assert jaccard_pairs(empty).count() == 0
    assert lsh_candidate_pairs(empty).count() == 0
    assert minhash_wide(empty).count() == 0
    assert simhash16(empty).count() == 0


def test_knn_empty_candidates(spark):
    from knightshift_spark.operators.similarity import knn_bruteforce

    q = spark.createDataFrame([(0, [1.0, 2.0])], "vec_id int, embedding array<float>")
    empty = spark.createDataFrame([], "vec_id int, embedding array<float>")
    assert knn_bruteforce(q, empty, k=3).count() == 0


def test_curate_corpus_decontaminate_and_mixture(spark):
    """Full composition: dedup -> gates -> decontamination anti-join ->
    deterministic mixture sampling; stats funnel still sums to input."""
    from knightshift_spark.pipelines.corpus import curate_corpus

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today", "web"),
            (2, "the quick brown fox jumps over the lazy dog today", "web"),  # exact dup
            (3, "a completely original document with the plenty of words in it", "web"),
            (4, "benchmark question one is about the speed of a fox", "books"),
            (5, "this is that and it is on for as at by", "books"),
        ],
        "doc_id long, text string, source string",
    )
    ev = spark.createDataFrame(
        [(100, "benchmark question one is about the speed of a fox", "eval")],
        "doc_id long, text string, source string",
    )
    res = curate_corpus(
        docs,
        min_tokens=5,
        langs=("en", "und"),
        eval_docs=ev,
        mixture={"web": 1.0, "books": 1.0},
    )
    kept_ids = {r["doc_id"] for r in res.kept.collect()}
    assert 2 not in kept_ids          # exact dup gone
    assert 4 not in kept_ids          # contaminated by the eval doc
    assert {1, 3} <= kept_ids
    rows = res.stats.collect()
    stats = {r["reason"]: r["n"] for r in rows}
    assert stats["input"] == 5
    assert stats["kept"] == len(kept_ids)
    assert stats["contaminated_removed"] == 1  # doc 4 hit the eval 5-gram
    assert (
        stats["exact_dup_removed"] + stats["near_dup_removed"]
        + stats["quality_or_lang_removed"] + stats["contaminated_removed"]
        + stats["quota_removed"] + stats["mixture_removed"] + stats["kept"]
    ) == stats["input"]
    assert all(r["ok"] for r in rows)

    # mixture dropping a stratum entirely is deterministic
    res2 = curate_corpus(
        docs, min_tokens=5, langs=("en", "und"),
        mixture={"web": 1.0},  # books default 0.0
    )
    assert all(r["source"] == "web" for r in res2.kept.collect())


def test_curate_corpus_quota_caps_dominant_source(spark):
    """The quota stage keeps at most n docs per source, deterministically:
    two runs keep the identical id set; a different salt redraws it."""
    # per-doc-unique vocabulary: zero shingle overlap, so the near-dup
    # stage passes everything through and only the quota bites
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}x{j}" for j in range(8)),
          "web" if i < 8 else "books") for i in range(10)],
        "doc_id long, text string, source string",
    )
    kw = dict(min_tokens=3, langs=("en", "und"), quota=3)
    r1 = curate_corpus(docs, **kw)
    r2 = curate_corpus(docs, **kw)
    ids1 = sorted(r["doc_id"] for r in r1.kept.collect())
    ids2 = sorted(r["doc_id"] for r in r2.kept.collect())
    assert ids1 == ids2  # deterministic
    by_src = {}
    for r in r1.kept.collect():
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    assert len(by_src["web"]) == 3 and len(by_src["books"]) == 2
    stats = {r["reason"]: r["n"] for r in r1.stats.collect()}
    assert stats["quota_removed"] == 5  # web had 8, capped at 3


def test_q57_funnel_deterministic_across_runs(spark):
    """VERDICT r2 #4 acceptance: the declared seven-stage funnel produces
    identical per-stage counts on two independent runs (every selection
    is md5-keyed, never rand()), and every ok bit holds."""
    from knightshift_spark.queries import load_all
    from tests.conftest import SF_SMOKE

    fn = load_all()["q57_curate_corpus"].spark_fn
    r1 = sorted(map(tuple, fn(spark, SF_SMOKE).collect()))
    r2 = sorted(map(tuple, fn(spark, SF_SMOKE).collect()))
    assert r1 == r2
    assert len(r1) == 8
    assert all(ok for _, _, ok in r1)


def test_curate_corpus_transitive_closure_catches_chains(spark):
    """Pair-local removal keeps C when the confirmed pairs are (A,B),(C,B)
    — C never appears as doc_b. Cluster dedup (connected components)
    drops everything but the component minimum."""
    base = GOOD_EN
    docs = spark.createDataFrame(
        [
            (1, base + " alpha beta gamma delta"),
            (2, base),                      # near-dup of both neighbors
            (3, base + " alpha beta gamma delta epsilon zeta eta theta"),
            (6, "a completely different document that is about the weather and the sea and it has the right amount of words in it"),
        ],
        "doc_id int, text string",
    )
    pairwise = curate_corpus(docs, jaccard_threshold=0.5, min_tokens=5)
    clustered = curate_corpus(
        docs, jaccard_threshold=0.5, min_tokens=5, transitive_closure=True
    )
    kept_pair = sorted(r["doc_id"] for r in pairwise.kept.collect())
    kept_clust = sorted(r["doc_id"] for r in clustered.kept.collect())
    assert kept_clust == [1, 6]  # one survivor per cluster, always
    assert set(kept_clust) <= set(kept_pair)  # closure is strictly stronger
    stats = {r["reason"]: r["n"] for r in clustered.stats.collect()}
    assert stats["near_dup_removed"] == 2 and stats["kept"] == 2


def test_curate_corpus_repetition_screen(spark):
    spam = ("buy cheap pills now and again " * 12).strip()
    docs = spark.createDataFrame(
        [(1, GOOD_EN), (2, spam)], "doc_id int, text string"
    )
    # without the screen the spam doc passes token/stopword gates
    base = curate_corpus(docs, min_tokens=5, langs=("en", "und"))
    assert sorted(r["doc_id"] for r in base.kept.collect()) == [1, 2]
    screened = curate_corpus(
        docs, min_tokens=5, langs=("en", "und"),
        repetition_thresholds={"dup_5gram_char_frac": 0.15},
    )
    assert sorted(r["doc_id"] for r in screened.kept.collect()) == [1]
    stats = {r["reason"]: r["n"] for r in screened.stats.collect()}
    assert stats["quality_or_lang_removed"] == 1


def test_near_dup_pairs_feed_dedup_report(spark):
    """VERDICT r5 #7: the exposed confirmed-pair relation drives the
    sizing report, and the report's n_removed equals what the
    transitive-closure funnel actually removed at the near-dup stage."""
    from knightshift_spark.operators.dedup import dedup_report

    docs = _docs(spark)
    res = curate_corpus(
        docs, jaccard_threshold=0.5, min_tokens=0, langs=("en", "und"),
        transitive_closure=True,
    )
    report = dedup_report(docs, res.near_dup_pairs).collect()[0]
    funnel = {r["reason"]: r["n"] for r in res.stats.collect()}
    # exact dedup runs BEFORE the pair stage, so the report covers the
    # near-dup clusters only; both views must agree on the removal count
    assert report["n_removed"] == funnel["near_dup_removed"]
    assert report["n_clusters"] >= 1
    assert report["chars_reclaimed"] > 0


def test_lm_gate_and_pii_scrub_stages(spark):
    """Round-6 stages: the CCNet-style LM gate adds an lm_filtered
    funnel row (only when active) and drops reference-unlike docs; the
    PII scrub transforms surviving text without changing the kept set."""
    from knightshift_spark.operators.lmscore import unigram_logprob_table

    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank", "a"),
        (2, "the slow red fox walks under the happy dog by the river path", "a"),
        (3, "zzz qqq xxx vvv kkk jjj www yyy uuu ooo ppp lll", "a"),  # gibberish
        (4, "email me at jane@example.com about the quick fox and the dog", "a"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    ref = spark.createDataFrame(
        [(100, "the quick brown fox and the lazy dog walk by the river")],
        "doc_id long, text string",
    )
    table = unigram_logprob_table(ref)

    res = curate_corpus(
        docs, jaccard_threshold=0.9, min_tokens=1, langs=("en", "und"),
        lm_table=table, min_avg_logprob=-2.9, pii_scrub=True,
    )
    stats = {r["reason"]: r["n"] for r in res.stats.collect()}
    assert "lm_filtered" in stats and stats["lm_filtered"] >= 1
    kept = {r["doc_id"]: r["text"] for r in res.kept.collect()}
    assert 3 not in kept  # gibberish fell to the LM gate
    assert 1 in kept and "<EMAIL>" in kept.get(4, "<EMAIL>")
    assert "jane@example.com" not in kept.get(4, "")
    # funnel monotonicity bits still hold with the extra stage
    assert all(r["ok"] for r in res.stats.collect())


def test_default_funnel_rows_unchanged_by_new_stages(spark):
    """The dynamic stats builder must emit the EXACT same reasons in the
    same order as round 5 when no new stage is active (q57 contract)."""
    expected = [
        "input", "exact_dup_removed", "near_dup_removed",
        "quality_or_lang_removed", "contaminated_removed",
        "quota_removed", "mixture_removed", "kept",
    ]
    # both stats builders (observe default + lazy opt-in) keep the shape
    for persist in (True, False):
        res = curate_corpus(
            _docs(spark), jaccard_threshold=0.5, min_tokens=5,
            persist_intermediates=persist,
        )
        reasons = [r["reason"] for r in res.stats.collect()]
        assert reasons == expected


def test_classifier_gate_stage(spark):
    """The learned quality gate: a model trained on separable corpora
    drops spam-like docs from the funnel (hard-threshold mode), adds a
    classifier_filtered row only when active, and survivors carry their
    quality_score."""
    from knightshift_spark.operators.classifier import train_quality_classifier

    good_vocab = "careful study results method evidence analysis".split()
    bad_vocab = "click buy cheap free winner casino".split()
    import random as _random

    rng = _random.Random(7)
    hi = spark.createDataFrame(
        [(i, " ".join(rng.choices(good_vocab, k=20))) for i in range(40)],
        "doc_id long, text string",
    )
    lo = spark.createDataFrame(
        [(100 + i, " ".join(rng.choices(bad_vocab, k=20))) for i in range(40)],
        "doc_id long, text string",
    )
    model = train_quality_classifier(hi, lo, dim=1 << 12, max_iter=25)

    docs = spark.createDataFrame(
        [
            (1, "careful study results and evidence for the method analysis", "a"),
            (2, "click buy cheap free winner casino click buy cheap free", "a"),
        ],
        "doc_id long, text string, source string",
    )
    res = curate_corpus(
        docs, jaccard_threshold=0.9, min_tokens=1, langs=("en", "und"),
        quality_model=model, min_quality_score=0.5,
    )
    stats = {r["reason"]: r["n"] for r in res.stats.collect()}
    assert stats["classifier_filtered"] == 1
    kept = res.kept.collect()
    assert [r["doc_id"] for r in kept] == [1]
    assert kept[0]["quality_score"] > 0.9
    assert all(r["ok"] for r in res.stats.collect())


def test_strip_substrings_pre_stage(spark):
    """Substring dedup runs BEFORE the doc-level screens: the embedded
    boilerplate is cut from the later doc, so the two docs are no longer
    near-dups and both survive; the funnel gains no row."""
    boiler = "identical boilerplate block repeated across these documents"
    docs = spark.createDataFrame(
        [
            (1, f"the quick brown fox jumps over a lazy dog . {boiler}", "a"),
            (2, f"{boiler} . seven wild geese flew under cold winter skies", "a"),
        ],
        "doc_id long, text string, source string",
    )
    res = curate_corpus(
        docs, jaccard_threshold=0.5, min_tokens=3, langs=("en", "und"),
        strip_substrings={"k": 20, "density": 1},
    )
    kept = {r["doc_id"]: r["text"] for r in res.kept.collect()}
    assert set(kept) == {1, 2}
    assert boiler in kept[1]      # first occurrence keeps the block
    assert boiler not in kept[2]  # later copy lost it before screening
    reasons = [r["reason"] for r in res.stats.collect()]
    assert "classifier_filtered" not in reasons  # no new funnel rows
