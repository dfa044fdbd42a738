"""Property tests for the round-6b operators: fused repetition families,
heavy hitters, and the incremental matview, each against straight-Python
reference semantics on hypothesis-generated inputs."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_WORDS = ["aa", "bb", "ccc", "dd", "e"]
_doc = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=12).map(" ".join)


@given(st.lists(_doc, min_size=1, max_size=8))
@settings(**_SETTINGS)
def test_ngram_multi_equals_per_family(spark, texts):
    """The fused multi-family pass must return exactly the per-family
    operator's fractions for every family, doc by doc."""
    from knightshift_spark.operators.quality import (
        ngram_repetition_multi,
        ngram_repetition_stats,
    )

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    fused = {
        r["doc_id"]: r.asDict()
        for r in ngram_repetition_multi(docs, (2, 3)).collect()
    }
    for n in (2, 3):
        single = {
            r["doc_id"]: r.asDict()
            for r in ngram_repetition_stats(docs, n).collect()
        }
        for d, row in single.items():
            assert d in fused
            assert fused[d][f"top_{n}gram_char_frac"] == row[f"top_{n}gram_char_frac"]
            assert fused[d][f"dup_{n}gram_char_frac"] == row[f"dup_{n}gram_char_frac"]
        # fused may carry EXTRA docs (grams only in the other family) —
        # those must report 0.0 for this family
        for d in set(fused) - set(single):
            assert fused[d][f"top_{n}gram_char_frac"] == 0.0
            assert fused[d][f"dup_{n}gram_char_frac"] == 0.0


@given(
    st.lists(st.sampled_from(["x", "y", "z", "w", "v"]), min_size=1, max_size=80),
    st.integers(2, 5),
)
@settings(**_SETTINGS)
def test_heavy_hitters_exact_on_random_streams(spark, items, nparts):
    """Two-phase mining must equal the exact filtered count for any
    stream and partitioning, at any threshold satisfying the premise."""
    from knightshift_spark.operators.heavyhitters import heavy_hitters

    n = len(items)
    cap = 16
    min_count = max(n // (cap + 1) + 1, 2)
    truth = sorted(
        ((k, c) for k, c in Counter(items).items() if c >= min_count),
        key=lambda kv: (-kv[1], kv[0]),
    )
    df = spark.createDataFrame([(i,) for i in items], "item string").repartition(
        nparts
    )
    got = [
        (r["item"], r["n"])
        for r in heavy_hitters(df, cap=cap, min_count=min_count).collect()
    ]
    assert got == truth


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(-100, 100)),
        min_size=1,
        max_size=40,
    ),
    st.integers(1, 4),
)
@settings(**_SETTINGS)
def test_matview_any_batch_split_equals_one_shot(spark, tmp_path_factory, rows, n_batches):
    """Merging ANY split of the input as successive batches must equal
    the single groupBy over the whole input."""
    from knightshift_spark.streaming.matview import merge_view_batch, read_view

    view = str(tmp_path_factory.mktemp("mv") / "view")
    chunk = max(1, len(rows) // n_batches)
    for b, lo in enumerate(range(0, len(rows), chunk)):
        batch = spark.createDataFrame(rows[lo : lo + chunk], "g int, v int")
        merge_view_batch(batch, view, ["g"], "v", n_buckets=4, batch_id=b)
    got = {
        r["g"]: (r["n"], r["sum"], r["min"], r["max"])
        for r in read_view(spark, view).collect()
    }
    want = {}
    for g in {g for g, _ in rows}:
        vs = [v for gg, v in rows if gg == g]
        want[g] = (len(vs), float(sum(vs)), float(min(vs)), float(max(vs)))
    assert got == want


@given(
    st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=20).map(
            " ".join
        ),
        min_size=1,
        max_size=6,
    ),
    st.integers(1, 3),
)
@settings(**_SETTINGS)
def test_substring_strip_matches_python_reference(spark, texts, density):
    """strip_duplicated_spans ≡ the straight-Python reference of the
    same anchor algorithm, for arbitrary corpora and densities."""
    from test_substring import _py_reference

    from knightshift_spark.operators.substring import strip_duplicated_spans

    rows = list(enumerate(texts))
    k = 5
    want = _py_reference(rows, k=k, density=density)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["text"]
        for r in strip_duplicated_spans(docs, k=k, density=density).collect()
    }
    assert got == want
