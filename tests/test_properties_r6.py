"""Property-based tests for the round-6 operators: engine results vs
straight-Python reference semantics on hypothesis-generated inputs."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=10,  # each example runs Spark jobs — keep the suite fast
    deadline=None,
    derandomize=True,  # property failures must reproduce across runs
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _quantile_cont(values, p):
    """Reference linear-interpolation percentile (NumPy 'linear', DuckDB
    quantile_cont, Spark percentile)."""
    vs = sorted(v for v in values if v is not None)
    if not vs:
        return None
    h = p * (len(vs) - 1)
    lo, hi = vs[math.floor(h)], vs[math.ceil(h)]
    return lo + (h - math.floor(h)) * (hi - lo)


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.one_of(st.none(), st.integers(-50, 50)),
        ),
        min_size=1,
        max_size=60,
    ),
    st.floats(0.0, 1.0).map(lambda p: round(p, 3)),
)
@settings(**_SETTINGS)
def test_grouped_percentiles_matches_reference(spark, rows, p):
    from knightshift_spark.operators.percentiles import grouped_percentiles

    df = spark.createDataFrame(rows, "g string, v int")
    out = {
        r["g"]: r["px"]
        for r in grouped_percentiles(df, ["g"], "v", {"px": p}).collect()
    }
    for g in {g for g, _ in rows}:
        want = _quantile_cont([v for gg, v in rows if gg == g], p)
        if want is None:
            assert out[g] is None
        else:
            assert out[g] is not None and abs(out[g] - want) < 1e-9, (g, p)


@given(
    st.lists(st.integers(0, 40), min_size=1, max_size=50),
    st.integers(2, 20),
    st.integers(1, 20),
)
@example(lengths=[1, 0], window=2, stride=1)  # zero-token doc clamps to one window
@settings(**_SETTINGS)
def test_sliding_windows_matches_reference(spark, lengths, window, stride):
    from knightshift_spark.operators.packing import sliding_windows

    stride = min(stride, window)
    docs = spark.createDataFrame(
        list(enumerate(lengths)), "doc_id long, n_tokens long"
    )
    got = {
        r["doc_id"]: (r["tok_start"], r["win_first"], r["win_last"])
        for r in sliding_windows(docs, window, stride, n_buckets=3).collect()
    }
    start = 0
    for i, n in enumerate(lengths):
        end = start + max(n - 1, 0)
        w_first = max(0, -((start - window + 1) // -stride))
        w_last = end // stride
        if n == 0:  # empty docs emit exactly one (empty) window
            w_first = w_last
        assert got[i] == (start, w_first, w_last), (i, n, window, stride)
        start += n


@given(
    st.lists(
        st.tuples(st.sampled_from("xyz"), st.integers(0, 9)), max_size=6
    ).map(
        lambda parts: "https://Ex.COM/p?"
        + "&".join(f"{k}{i}={i}" for k, i in parts)
        + "#f"
    )
)
@settings(**_SETTINGS)
def test_normalize_url_idempotent_and_param_order_free(spark, url):
    import random

    from pyspark.sql import functions as F

    from knightshift_spark.operators.urlops import normalize_url

    q = url.split("?", 1)[1].removesuffix("#f")
    params = [p for p in q.split("&") if p]
    random.Random(0).shuffle(params)
    shuffled = url.split("?", 1)[0] + "?" + "&".join(params) + "#f"
    df = spark.createDataFrame([(url,), (shuffled,)], "u string")
    a, b = [r["n"] for r in df.select(normalize_url(F.col("u")).alias("n")).collect()]
    assert a == b  # parameter order is transport noise
    again = (
        spark.createDataFrame([(a,)], "u string")
        .select(normalize_url(F.col("u")).alias("n"))
        .collect()[0]["n"]
    )
    assert again == a  # idempotent


@given(
    st.lists(st.floats(0.01, 1.0), min_size=2, max_size=5),
    st.integers(0, 3),
)
@settings(**_SETTINGS)
def test_split_corpus_partitions_for_any_fractions(spark, weights, salt_i):
    from knightshift_spark.operators.sampling import split_corpus

    total = sum(weights)
    fractions = {f"s{i}": w / total for i, w in enumerate(weights)}
    # float re-normalization can leave |sum - 1| up to a few ulp — the
    # operator's tolerance (1e-9) accepts it
    docs = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    out = split_corpus(docs, fractions, salt=str(salt_i)).collect()
    assert len(out) == 300
    assert {r["split"] for r in out} <= set(fractions)
    # disjoint + total: each row exactly one split (it's a column, so
    # the real property is the label set above plus full coverage)
    assert all(r["split"] is not None for r in out)
