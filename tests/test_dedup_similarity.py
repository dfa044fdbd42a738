"""Dedup + similarity operator tests on crafted inputs with known answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from knightshift_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_pairs,
    minhash_signatures,
    simhash16,
)
from knightshift_spark.operators.similarity import cosine, knn_bruteforce, knn_lsh


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
            (3, "completely different words entirely unrelated text here"),
            (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        ],
        "doc_id int, text string",
    )


def test_exact_dedup(spark):
    assert exact_dedup(_docs(spark), ["text"]).count() == 3


def test_jaccard_pairs(spark):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_pairs(_docs(spark), threshold=0.05).collect()
    }
    assert pairs[(1, 4)] == 1.0  # identical
    assert 0.5 < pairs[(1, 2)] < 1.0  # near-dup
    assert (1, 3) not in pairs  # unrelated


def test_minhash_identical_docs_agree_fully(spark):
    mh = minhash_signatures(_docs(spark), num_hashes=8)
    sig = {
        (r["doc_id"], r["j"]): r["mh"] for r in mh.collect()
    }
    assert all(sig[(1, j)] == sig[(4, j)] for j in range(8))
    pairs = {
        (r["doc_a"], r["doc_b"]): r["n_agree"]
        for r in minhash_pairs(_docs(spark), num_hashes=8, min_agree=1).collect()
    }
    assert pairs[(1, 4)] == 8


def test_lsh_finds_exact_dups(spark):
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(_docs(spark), num_hashes=16, bands=4).collect()
    }
    assert (1, 4) in cand


def test_lsh_cap_is_noop_above_occupancy(spark):
    """max_bucket above every bucket's occupancy ⇒ output identical to the
    uncapped operator (the exact all-pairs branch runs for every bucket)."""
    docs = _docs(spark)
    uncapped = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(docs, num_hashes=16, bands=4).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(
            docs, num_hashes=16, bands=4, max_bucket=100
        ).collect()
    }
    assert capped == uncapped


def test_lsh_cap_linear_on_duplicate_cluster(spark):
    """The 100 TB duplicate-cluster scenario: a 10k-copy cluster lands in
    ONE bucket per band. Uncapped all-pairs would emit C(10k,2) ≈ 5·10⁷
    candidates; the cap's star pairing emits exactly n−1 — linear in the
    cluster, and every member stays reachable from the representative."""
    n = 10_000
    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(n)],
        "doc_id long, text string",
    ).repartition(8)
    pairs = lsh_candidate_pairs(
        docs, num_hashes=16, bands=4, max_bucket=32
    ).collect()
    assert len(pairs) == n - 1
    assert all(r["doc_a"] == 0 for r in pairs)  # rep = min id
    assert {r["doc_b"] for r in pairs} == set(range(1, n))


def test_lsh_cap_linearity_scales(spark):
    """Candidate count grows ~linearly (not quadratically) with cluster
    size under the cap: doubling the cluster doubles the candidates."""
    def count_at(n):
        docs = spark.createDataFrame(
            [(i, "alpha beta gamma delta epsilon zeta") for i in range(n)],
            "doc_id long, text string",
        )
        return lsh_candidate_pairs(docs, num_hashes=16, bands=4, max_bucket=8).count()

    c1, c2 = count_at(500), count_at(1000)
    assert c1 == 499 and c2 == 999  # n−1 exactly: pure star pairs


def test_lsh_cap_mixed_buckets(spark):
    """Small buckets keep exact all-pairs while an over-cap cluster in the
    same run is star-paired — both behaviors from one plan."""
    small = [
        (10_000, "the quick brown fox jumps over the lazy dog"),
        (10_001, "the quick brown fox jumps over the lazy dog"),  # exact dup
    ]
    cluster = [(i, "completely different words entirely unrelated text here") for i in range(50)]
    docs = spark.createDataFrame(small + cluster, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(docs, num_hashes=16, bands=4, max_bucket=10).collect()
    }
    assert {(0, i) for i in range(1, 50)} <= got  # star pairs from the big cluster
    assert not any(a != 0 and a < 10_000 for a, _ in got)  # no intra-cluster all-pairs
    # the under-cap bucket still all-pairs exactly
    assert (10_000, 10_001) in got


def test_lsh_cap_validation(spark):
    import pytest

    with pytest.raises(ValueError, match="max_bucket"):
        lsh_candidate_pairs(_docs(spark), max_bucket=0)


def test_simhash_identical_for_dups(spark):
    sh = {r["doc_id"]: r["simhash"] for r in simhash16(_docs(spark)).collect()}
    assert sh[1] == sh[4]
    assert 0 <= sh[1] < 2**16


def _vecs(spark):
    return spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.9, 0.1, 0.0]),   # closest to 0
            (2, [0.0, 1.0, 0.0]),
            (3, [-1.0, 0.0, 0.0]),  # opposite
        ],
        "vec_id int, embedding array<float>",
    )


def test_cosine_values(spark):
    v = _vecs(spark)
    a = v.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("a"))
    b = v.filter(F.col("vec_id") == 3).select(F.col("embedding").alias("b"))
    sim = a.crossJoin(b).select(cosine(F.col("a"), F.col("b")).alias("s")).collect()[0]["s"]
    assert abs(sim + 1.0) < 1e-9


def test_knn_bruteforce_ranking(spark):
    v = _vecs(spark)
    out = knn_bruteforce(
        v.filter(F.col("vec_id") == 0), v.filter(F.col("vec_id") > 0), k=3
    ).collect()
    order = [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert order == [1, 2, 3]


def test_knn_lsh_self_bucket(spark):
    # identical vectors share every SRP bucket → always retrievable
    v = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0, 4.0]), (1, [1.0, 2.0, 3.0, 4.0]), (2, [1.0, 2.0, 3.0, 4.0])],
        "vec_id int, embedding array<float>",
    )
    out = knn_lsh(
        v.filter(F.col("vec_id") == 0), v.filter(F.col("vec_id") > 0),
        k=2, bits=4, dim=4,
    ).collect()
    assert sorted(r["neighbor_id"] for r in out) == [1, 2]
    assert all(abs(r["sim"] - 1.0) < 1e-6 for r in out)


def test_knn_ivf_clusters_and_ranks(spark):
    from knightshift_spark.operators.similarity import ivf_centroids, knn_ivf

    v = spark.createDataFrame(
        [
            (0, [10.0, 0.0]), (1, [11.0, 0.5]), (2, [10.5, -0.5]),   # cluster A
            (3, [0.0, 10.0]), (4, [0.5, 11.0]), (5, [-0.5, 10.5]),  # cluster B
        ],
        "vec_id int, embedding array<float>",
    )
    cents = ivf_centroids(v, n_clusters=2)
    assert len(cents) == 2 and len(cents[0]) == 2
    # query near cluster A retrieves only A-members
    q = spark.createDataFrame([(100, [9.0, 0.2])], "vec_id int, embedding array<float>")
    out = knn_ivf(q, v, k=3, n_clusters=2).collect()
    assert sorted(r["neighbor_id"] for r in out) == [0, 1, 2]
    assert all(r["sim"] > 0.9 for r in out)


def test_knn_arrow_matches_codegen(spark):
    from tests.conftest import SF_SMOKE
    from knightshift_spark.operators.similarity import knn_bruteforce, knn_bruteforce_arrow
    from knightshift_spark.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    c = emb.filter(F.col("vec_id") >= 5)
    exact = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in knn_bruteforce(q, c, k=3).collect()}
    arrow = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in knn_bruteforce_arrow(q, c, k=3).collect()}
    assert exact == arrow


def test_driver_bound_guards(spark):
    """VERDICT r6 #6: the two caller-trusted driver transfers are hard-
    capped — a 100×-scale caller gets a loud error, never a driver OOM."""
    import pytest

    from knightshift_spark.operators.bpe import MAX_BPE_SAMPLE, train_bpe_on_corpus
    from knightshift_spark.operators.similarity import knn_bruteforce_arrow

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="MAX_BPE_SAMPLE"):
        train_bpe_on_corpus(docs, sample=MAX_BPE_SAMPLE + 1)

    q = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(5)], "vec_id long, embedding array<float>"
    )
    c = spark.createDataFrame([(9, [0.0, 1.0])], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="max_queries"):
        knn_bruteforce_arrow(q, c, k=1, max_queries=4)
    # at the bound it still runs (limit(max+1) only guards, never trims)
    assert knn_bruteforce_arrow(q, c, k=1, max_queries=5).count() == 5


def test_knn_arrow_tie_break_partition_invariant(spark):
    """Candidates tied at the k-th similarity must truncate deterministically
    (smallest neighbor_id wins), so the result is identical whether the batch
    sees all tied rows together or split across partitions."""
    from knightshift_spark.operators.similarity import knn_bruteforce_arrow

    q = spark.createDataFrame([(0, [1.0, 0.0])], "vec_id long, embedding array<float>")
    # 40 candidates all identical to the query (sim == 1.0), ids shuffled
    ids = [((i * 17) % 40) + 1 for i in range(40)]
    c = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in ids], "vec_id long, embedding array<float>"
    )
    runs = []
    for nparts in (1, 8):
        out = knn_bruteforce_arrow(q, c.repartition(nparts), k=5).collect()
        runs.append(sorted((r["query_id"], r["rank"], r["neighbor_id"]) for r in out))
    assert runs[0] == runs[1]
    # deterministic rule: ties keep the smallest neighbor_id
    assert [r[2] for r in runs[0]] == [1, 2, 3, 4, 5]


def test_jaccard_df_max_caps_ubiquitous_shingle(spark):
    """One shingle shared by EVERY doc would create O(n²) join rows; with
    df_max it is pruned from numerator AND denominator consistently."""
    from knightshift_spark.operators.dedup import jaccard_pairs

    # every doc contains 'common token'; docs otherwise disjoint
    docs = spark.createDataFrame(
        [(i, f"common token unique{i}a unique{i}b unique{i}c") for i in range(30)],
        "doc_id long, text string",
    )
    uncapped = jaccard_pairs(docs, threshold=0.0)
    # the shared 'common token' bigram pairs all 30 docs: C(30,2) rows
    assert uncapped.count() == 30 * 29 // 2
    capped = jaccard_pairs(docs, threshold=0.0, df_max=5)
    # shingles in >5 docs pruned -> disjoint docs -> zero pairs
    assert capped.count() == 0
    # df_max larger than any doc-frequency is a no-op
    same = jaccard_pairs(docs, threshold=0.0, df_max=1000)
    assert same.count() == uncapped.count()


def test_ivf_multiprobe_recovers_boundary_queries(spark):
    """n_probe=2 scores the 2 nearest clusters: its hit set contains the
    single-probe hits, and with enough probes IVF converges to exact."""
    from knightshift_spark.operators.similarity import knn_bruteforce, knn_ivf

    from knightshift_spark.tables import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    q, c = emb.filter(F.col("vec_id") < 3), emb.filter(F.col("vec_id") >= 3)
    p1 = {(r["query_id"], r["neighbor_id"])
          for r in knn_ivf(q, c, k=2, n_clusters=3, n_probe=1).collect()}
    p3 = {(r["query_id"], r["neighbor_id"])
          for r in knn_ivf(q, c, k=2, n_clusters=3, n_probe=3).collect()}
    exact = {(r["query_id"], r["neighbor_id"])
             for r in knn_bruteforce(q, c, k=2).collect()}
    assert p3 == exact  # probing every cluster == brute force
    assert len(p1) <= len(p3)


def test_lsh_hamming_probe_superset(spark):
    """Hamming-1 probing can only ADD candidate pairs (probe sketches
    are a superset); with k large enough to not truncate, the scored
    pair set must contain every exact-bucket pair."""
    from knightshift_spark.operators.similarity import knn_lsh

    from knightshift_spark.tables import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    q, c = emb.filter(F.col("vec_id") < 3), emb.filter(F.col("vec_id") >= 3)
    h0 = {(r["query_id"], r["neighbor_id"])
          for r in knn_lsh(q, c, k=10**6, bits=4, hamming_probe=0).collect()}
    h1 = {(r["query_id"], r["neighbor_id"])
          for r in knn_lsh(q, c, k=10**6, bits=4, hamming_probe=1).collect()}
    assert h0 <= h1


def test_contamination_report_flags_overlap(spark):
    """Corpus doc sharing a 5-gram with the eval set is flagged with the
    right counts; clean docs are absent; the eval-gram join broadcasts."""
    from knightshift_spark.operators.dedup import contamination_report

    ev = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # 8 tokens -> 4 distinct 5-grams; 2 of them hit the eval doc
            (1, "alpha beta gamma delta epsilon zeta other words"),
            (2, "totally unrelated text with no overlap at all"),
            (3, "four words only here"),  # < 5 tokens -> no grams
        ],
        "doc_id long, text string",
    )
    rep = contamination_report(corpus, ev, n=5)
    rows = {r["doc_id"]: r for r in rep.collect()}
    assert set(rows) == {1}
    assert rows[1]["n_grams"] == 4
    assert rows[1]["n_hit"] == 2
    assert rows[1]["hit_frac"] == 0.5
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_contaminated_ids_hashed_prefilter_equals_string_broadcast(spark):
    """The 8-byte-hash prefilter path returns EXACTLY the string-
    broadcast path's ids (the confirm join removes any hash collisions),
    and its corpus-facing join broadcasts the hash relation."""
    from knightshift_spark.operators.dedup import contaminated_ids

    ev = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta other words"),
            (2, "totally unrelated text with no overlap at all"),
            (3, "alpha beta gamma delta epsilon again here too"),
            (4, "four words only here"),
        ],
        "doc_id long, text string",
    )
    plain = {r["doc_id"] for r in contaminated_ids(corpus, ev, n=5).collect()}
    hashed = contaminated_ids(corpus, ev, n=5, hashed_prefilter=True)
    assert {r["doc_id"] for r in hashed.collect()} == plain == {1, 3}
    plan = hashed._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_knn_pq_exact_when_codebook_saturates(spark):
    """With ksub >= distinct sub-vectors, every sub-vector is its own
    centroid, so ADC distance is exact L2 on unit vectors — which ranks
    identically to cosine. PQ top-k must then match brute force."""
    from knightshift_spark.operators.similarity import knn_bruteforce, knn_pq

    rows = [
        (i, [float((i * 7 + j * 3) % 11 + 1) for j in range(8)]) for i in range(10)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") < 2)
    c = emb.filter(F.col("vec_id") >= 2)
    truth = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in knn_bruteforce(q, c, k=3).collect()
    }
    pq = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in knn_pq(q, c, k=3, m=2, ksub=8).collect()
    }
    assert pq == truth

    # compressed relation really is code-only: lossy at small ksub, but
    # still returns a full top-k per query
    lossy = knn_pq(q, c, k=3, m=2, ksub=2)
    assert lossy.groupBy("query_id").count().filter("count != 3").count() == 0


def test_knn_ivfpq_exact_when_saturated(spark):
    """Probing every cluster + a saturating residual codebook makes
    IVF-PQ's ADC distance exact, so top-k must match brute force."""
    from knightshift_spark.operators.similarity import knn_bruteforce, knn_ivfpq

    rows = [
        (i, [float((i * 7 + j * 3) % 11 + 1) for j in range(8)]) for i in range(10)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") < 2)
    c = emb.filter(F.col("vec_id") >= 2)
    truth = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in knn_bruteforce(q, c, k=3).collect()
    }
    got = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in knn_ivfpq(
            q, c, k=3, n_clusters=2, n_probe=2, m=2, ksub=8
        ).collect()
    }
    assert got == truth

    # single-probe prunes: each query scores only its own cell's rows
    pruned = knn_ivfpq(q, c, k=3, n_clusters=2, n_probe=1, m=2, ksub=8)
    assert pruned.groupBy("query_id").count().count() == 2


def test_dedup_paragraphs(spark):
    """Repeated paragraph survives only at its first (doc_id, pos);
    documents reassemble in order; fully-duplicate docs drop out."""
    from knightshift_spark.operators.dedup import dedup_paragraphs

    boiler = "subscribe to our newsletter"
    docs = spark.createDataFrame(
        [
            (1, f"intro one\n\n{boiler}\n\nbody one"),
            (2, f"{boiler}\n\nbody two"),          # loses the boilerplate
            (3, f"{boiler.upper()}"),              # normalized dup only -> drops out
            (4, "unique text"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["text"] for r in dedup_paragraphs(docs).collect()}
    assert out[1] == f"intro one\n\n{boiler}\n\nbody one"  # first occurrence intact
    assert out[2] == "body two"
    assert 3 not in out
    assert out[4] == "unique text"


def test_persisted_ann_index_matches_inline(spark, tmp_path):
    """write_ann_index -> query_ann_index returns exactly what the inline
    knn_ivfpq computes with the same parameters (build once, query many)."""
    from knightshift_spark.operators.similarity import (
        knn_ivfpq,
        query_ann_index,
        write_ann_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 3)
    c = emb.filter(F.col("vec_id") >= 3)

    inline = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["adc_dist"])
        for r in knn_ivfpq(q, c, k=3, n_clusters=2, n_probe=1, m=2, ksub=4).collect()
    )
    idx = str(tmp_path / "ann_index")
    write_ann_index(c, idx, n_clusters=2, n_probe_default=1, m=2, ksub=4)
    out = query_ann_index(spark, idx, q, k=3)
    persisted = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["adc_dist"])
        for r in out.collect()
    )
    assert persisted == inline

    # the probe dynamically prunes the cid-partitioned index scan:
    # only probed cells' files are read
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()


def test_prebuilt_artifacts_match_inline_build(spark):
    """centroids=/index= prebuilt paths return byte-identical results to
    the build-inline paths (the in-session build-once contract)."""
    from knightshift_spark.operators.similarity import (
        build_ivfpq_index,
        ivf_centroids,
        knn_ivf,
        knn_ivfpq,
    )
    from knightshift_spark.tables import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    c = emb.filter(F.col("vec_id") >= 5)

    cents = ivf_centroids(c, n_clusters=4)
    inline = sorted(map(tuple, knn_ivf(q, c, k=3, n_clusters=4).collect()))
    prebuilt = sorted(
        map(tuple, knn_ivf(q, c, k=3, n_clusters=4, centroids=cents).collect())
    )
    assert inline == prebuilt

    idx = build_ivfpq_index(c, n_clusters=4, m=4, ksub=8)
    inline2 = sorted(
        map(tuple, knn_ivfpq(q, c, k=3, n_clusters=4, m=4, ksub=8).collect())
    )
    prebuilt2 = sorted(map(tuple, knn_ivfpq(q, c, k=3, index=idx).collect()))
    assert inline2 == prebuilt2


def test_ann_recall_full_sweep(spark):
    """The full 6-variant recall sweep (incl. the PQ/IVF-PQ configs whose
    per-config codegen compile is too slow for the declared bench query —
    VERDICT r2 #2). Pins the self-verifying `ok` bit the lean q59 carries:
    recall in [0,1] everywhere, and every widening variant (multiprobe /
    hamming-probe) at least matches its base."""
    from knightshift_spark.operators.similarity import (
        ivf_centroids,
        knn_ivf,
        knn_ivfpq,
        knn_pq,
    )
    from knightshift_spark.queries.similarity import ann_recall_harness
    from knightshift_spark.tables import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    c = emb.filter(F.col("vec_id") >= 10)
    truth = knn_bruteforce(q, c, k=3, dim=64)
    cents = ivf_centroids(c, n_clusters=4)
    variants = {
        "lsh_b4": knn_lsh(q, c, k=3, bits=4),
        "lsh_b4_h1": knn_lsh(q, c, k=3, bits=4, hamming_probe=1),
        "ivf_c4": knn_ivf(q, c, k=3, n_clusters=4, centroids=cents),
        "ivf_c4_p2": knn_ivf(q, c, k=3, n_clusters=4, n_probe=2, centroids=cents),
        "pq_m4_k8": knn_pq(q, c, k=3, m=4, ksub=8),
        "ivfpq_c4p2": knn_ivfpq(q, c, k=3, n_clusters=4, n_probe=2, m=4, ksub=8),
    }
    widens = {"lsh_b4_h1": "lsh_b4", "ivf_c4_p2": "ivf_c4"}
    rows = {
        r["method"]: r
        for r in ann_recall_harness(spark, variants, truth, widens).collect()
    }
    assert sorted(rows) == sorted(variants)
    assert all(r["ok"] for r in rows.values()), rows
    assert all(r["n_truth"] == 30 for r in rows.values())  # 10 queries x k=3


def test_ivf_kmeanspar_beats_lowest_id_seeding_on_clustered_data(spark):
    """VERDICT r2 #5: on clustered data, the k-means||-style build
    (farthest-first oversampling + Lloyd-to-convergence) must measurably
    beat the old lowest-id-seeds + single-Lloyd-step codebook. The
    fixture is adversarial for naive seeding: all the lowest ids sit in
    ONE blob, so lowest-id seeds collapse there while farthest-first
    spreads across blobs. Uniform-random embeddings can't show this."""
    import numpy as np

    from knightshift_spark.operators.similarity import (
        _lloyd_step,
        ivf_centroids,
        knn_bruteforce,
        knn_ivf,
    )

    rng = np.random.RandomState(7)
    blobs = [rng.normal(loc=mu, scale=0.05, size=(30, 8)) for mu in
             ((3, 0, 0, 0, 0, 0, 0, 0), (0, 3, 0, 0, 0, 0, 0, 0),
              (0, 0, 3, 0, 0, 0, 0, 0), (0, 0, 0, 3, 0, 0, 0, 0))]
    # ids 0..29 all in blob 0 (adversarial), then blob 1, 2, 3
    rows = [(int(30 * b + i), [float(x) for x in blobs[b][i]])
            for b in range(4) for i in range(30)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = vecs.filter((F.col("vec_id") % 30) < 3)   # 3 queries per blob
    c = vecs.filter((F.col("vec_id") % 30) >= 3)

    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_bruteforce(q, c, k=3, dim=8).collect()
    }

    def recall(cents):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in knn_ivf(q, c, k=3, n_clusters=4, centroids=cents).collect()
        }
        return len(got & truth) / len(truth)

    old_seeds = [[float(x) for x in r["embedding"]]
                 for r in c.orderBy("vec_id").limit(4).collect()]
    old_cents = _lloyd_step(c, old_seeds, "embedding")  # old: 1 step only
    new_cents = ivf_centroids(c, n_clusters=4)

    r_old, r_new = recall(old_cents), recall(new_cents)
    assert r_new > r_old, (r_old, r_new)
    assert r_new == 1.0  # well-separated blobs: the new build nails them


def test_neardup_pairs_lsh_scale_path(spark):
    """The bucketed embedding near-dup twin of the all-pairs baseline:
    exact duplicates and tight near-dups share all SRP signs, so the
    bucket join finds them; the rescore keeps only true pairs (no false
    positives vs the brute-force baseline at the same threshold)."""
    import numpy as np

    from knightshift_spark.operators.similarity import cosine, neardup_pairs_lsh

    rng = np.random.RandomState(3)
    base = rng.normal(size=(20, 16))
    rows = []
    for i, v in enumerate(base):
        rows.append((2 * i, [float(x) for x in v]))
        rows.append((2 * i + 1, [float(x) for x in v + rng.normal(scale=1e-3, size=16)]))
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    got = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in neardup_pairs_lsh(vecs, threshold=0.999, bits=6, dim=16).collect()
    }
    # every planted twin pair (2i, 2i+1) found with sim ~ 1
    for i in range(20):
        assert (2 * i, 2 * i + 1) in got, f"missing twin pair {i}"
    # no false positives vs brute force at the same threshold
    a = vecs.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("__a"))
    b = vecs.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("__b"))
    brute = {
        (r["id_a"], r["id_b"])
        for r in F.broadcast(a).crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cosine(F.col("__a"), F.col("__b"), 16), 4).alias("sim"))
        .filter(F.col("sim") >= 0.999)
        .collect()
    }
    assert set(got) <= brute


def test_neardup_lsh_cap_star_pairs(spark):
    """Over-cap SRP buckets star-pair against the min-id representative:
    a 200-copy vector cluster yields exactly n−1 pairs (all sim 1.0), not
    C(n,2); a cap above occupancy reproduces the uncapped output."""
    import numpy as np

    from knightshift_spark.operators.similarity import neardup_pairs_lsh

    rng = np.random.RandomState(7)
    v = [float(x) for x in rng.normal(size=16)]
    n = 200
    cluster = [(i, v) for i in range(n)]
    # a handful of unrelated vectors that land in other buckets
    others = [(1000 + j, [float(x) for x in rng.normal(size=16)]) for j in range(5)]
    vecs = spark.createDataFrame(cluster + others, "vec_id long, embedding array<float>")

    capped = neardup_pairs_lsh(
        vecs, threshold=0.999, bits=6, dim=16, max_bucket=16
    ).collect()
    star = [(r["id_a"], r["id_b"], r["sim"]) for r in capped if r["id_b"] < 1000]
    assert len(star) == n - 1
    assert all(a == 0 and s == 1.0 for a, _, s in star)
    assert {b for _, b, _ in star} == set(range(1, n))

    # cap above every bucket ⇒ identical to uncapped
    small = vecs.filter(F.col("vec_id").isin([0, 1, 1000, 1001, 1002]))
    got_uncapped = {
        (r["id_a"], r["id_b"]) for r in
        neardup_pairs_lsh(small, threshold=0.5, bits=4, dim=16).collect()
    }
    got_capped = {
        (r["id_a"], r["id_b"]) for r in
        neardup_pairs_lsh(small, threshold=0.5, bits=4, dim=16, max_bucket=50).collect()
    }
    assert got_capped == got_uncapped


def test_winnow_fingerprints_match_duckdb_oracle(spark):
    """Winnowing (rolling k-gram hash + window min) reproduced exactly in
    DuckDB with the same md5-derived hash — the cross-engine oracle for
    the document-fingerprinting operator."""
    import duckdb

    from knightshift_spark.operators.dedup import winnow_fingerprints

    k, w = 5, 4
    rows = [
        (1, "The quick  brown fox jumps over the lazy dog"),
        (2, "the quick brown fox JUMPS over the lazy dog"),  # normalizes equal to 1
        (3, "completely different text with its own content"),
        (4, "tiny"),   # shorter than k
        (5, ""),       # empty
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        (r["doc_id"], r["fp"]) for r in winnow_fingerprints(docs, k=k, w=w).collect()
    }

    hash32 = (
        "list_sum(list_transform(range(1, 9), i -> "
        "CAST((strpos('0123456789abcdef', substr(md5(g), i, 1)) - 1) AS BIGINT)"
        " * (CAST(1 AS BIGINT) << (4 * (8 - i)))))"
    ).replace("md5(g)", f"md5(substr(t, CAST(p AS INT), {k}))")
    vals = ", ".join(f"({d}, '{t}')" for d, t in rows)
    sql = rf"""
    WITH n AS (
      SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t
      FROM (VALUES {vals}) AS v(doc_id, text)),
    h AS (
      SELECT doc_id,
             list_transform(range(1, greatest(len(t) - {k - 1}, 1) + 1),
                            p -> {hash32}) AS hs
      FROM n),
    f AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(hs) - {w - 1}, 1) + 1),
                           i -> list_min(hs[CAST(i AS INT):CAST(i + {w - 1} AS INT)]))) AS fps
      FROM h)
    SELECT doc_id, unnest(fps) AS fp FROM f
    """
    want = set(map(tuple, duckdb.connect().execute(sql).fetchall()))
    assert got == want
    # normalization-equal docs share ALL fingerprints
    f1 = {fp for d, fp in got if d == 1}
    f2 = {fp for d, fp in got if d == 2}
    assert f1 == f2 and f1
    # unrelated doc shares none
    f3 = {fp for d, fp in got if d == 3}
    assert not (f1 & f3)


def test_winnow_candidates_find_shared_substring(spark):
    """Winnowing guarantee: docs sharing a substring of length >= w+k-1
    produce at least one shared fingerprint -> a candidate pair."""
    from knightshift_spark.operators.dedup import winnow_candidate_pairs

    shared = "the identical plagiarized passage lives here"
    docs = spark.createDataFrame(
        [
            (1, f"intro words before {shared} and then a different tail"),
            (2, f"completely other opening {shared} closing remarks differ"),
            (3, "no overlap with anything else in this corpus at all"),
        ],
        "doc_id int, text string",
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in winnow_candidate_pairs(docs, k=5, w=4).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 1
    assert not any(3 in p for p in pairs)


def _aniso_vectors(spark, n=64, d=16, seed=11):
    """Anisotropic fixture: latent factors mixed across ALL dims by a
    fixed rotation, so variance/correlation straddles PQ's contiguous
    subspace boundaries — the case OPQ exists for."""
    import numpy as np

    rng = np.random.default_rng(seed)
    # low-rank + noise latent, then a random orthogonal mixing matrix
    Z = rng.normal(size=(n, d)) * np.linspace(3.0, 0.1, d)[None, :]
    Q, _ = np.linalg.qr(rng.normal(size=(d, d)))
    X = Z @ Q
    rows = [(i, [float(x) for x in X[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_opq_rotation_is_orthogonal_and_deterministic(spark):
    import numpy as np

    from knightshift_spark.operators.similarity import opq_train

    vecs = _aniso_vectors(spark)
    R1, books1 = opq_train(vecs, m=4, ksub=4, iters=3, sample=64)
    R2, books2 = opq_train(vecs, m=4, ksub=4, iters=3, sample=64)
    assert R1 == R2 and books1 == books2  # deterministic end to end
    R = np.array(R1)
    assert np.allclose(R @ R.T, np.eye(len(R)), atol=1e-9)
    assert len(books1) == 4 and len(books1[0]) == 4


def test_opq_cuts_quantization_error_on_anisotropic_data(spark):
    """The point of OPQ: reconstruction error in the rotated space is
    strictly below plain PQ's on data whose structure straddles subspace
    boundaries (both quantizers trained by the same k-means recipe)."""
    import numpy as np

    from knightshift_spark.operators.similarity import (
        _np_subspace_kmeans,
        _unit,
        opq_train,
    )
    from pyspark.sql import functions as F

    vecs = _aniso_vectors(spark)
    rows = _unit(vecs, "vec_id", "embedding", "vec_id", "v").orderBy("vec_id").collect()
    X = np.array([r["v"] for r in rows])

    def mse(Y):
        books, codes = _np_subspace_kmeans(Y, m=4, ksub=4)
        Yhat = np.hstack([books[j][codes[:, j]] for j in range(4)])
        return float(((Y - Yhat) ** 2).sum(axis=1).mean())

    plain = mse(X)
    R, _books = opq_train(vecs, m=4, ksub=4, iters=5, sample=64)
    rotated = mse(X @ np.array(R))
    assert rotated < plain * 0.95  # >5% error cut on the rigged fixture


def test_knn_opq_end_to_end(spark):
    """Full OPQ path (train → rotate both sides via Arrow → ADC): valid
    top-k contract, deterministic output, and the load-bearing geometry —
    an orthogonal rotation must preserve true cosine similarity exactly,
    so brute-force top-k in the rotated space equals the original.
    (OPQ-beats-PQ is asserted on reconstruction ERROR in the test above;
    recall@k at 44 candidates is one-pair noise, not a signal.)"""
    from knightshift_spark.operators.similarity import (
        knn_bruteforce,
        knn_opq,
        opq_train,
        rotate_vectors,
    )
    from pyspark.sql import functions as F

    vecs = _aniso_vectors(spark, n=48)
    q = vecs.filter(F.col("vec_id") < 4)
    c = vecs.filter(F.col("vec_id") >= 4)

    trained = opq_train(c, m=4, ksub=4, iters=4, sample=64)
    opq = knn_opq(q, c, k=3, m=4, ksub=4, trained=trained)
    rows = opq.collect()
    assert len(rows) == 4 * 3  # k rows per query
    assert all(r["rank"] in (1, 2, 3) and r["adc_dist"] >= 0 for r in rows)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, opq.collect()))

    # rotation preserves the true geometry: exact top-k unchanged
    R, _books = trained
    qr, cr = rotate_vectors(q, R), rotate_vectors(c, R)
    base = [
        (r["query_id"], r["neighbor_id"], r["sim"], r["rank"])
        for r in knn_bruteforce(q, c, k=3).orderBy("query_id", "rank").collect()
    ]
    rot = [
        (r["query_id"], r["neighbor_id"], r["sim"], r["rank"])
        for r in knn_bruteforce(qr, cr, k=3).orderBy("query_id", "rank").collect()
    ]
    assert [(a, b, d) for a, b, _s, d in base] == [(a, b, d) for a, b, _s, d in rot]
    assert all(abs(s1 - s2) < 1e-6 for (_, _, s1, _), (_, _, s2, _) in zip(base, rot))


def _union_find(pairs, ids):
    """Driver-side oracle: min-id component labels via union-find."""
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in ids}


def test_connected_components_vs_union_find(spark):
    import random

    from knightshift_spark.operators.dedup import connected_components

    rng = random.Random(7)
    ids = list(range(100))
    pairs = [
        tuple(sorted(rng.sample(ids, 2)))
        for _ in range(120)
    ]
    expect = _union_find(pairs, {i for p in pairs for i in p})
    got = {
        r["id"]: r["comp"]
        for r in connected_components(
            spark.createDataFrame(pairs, "doc_a long, doc_b long")
        ).collect()
    }
    assert got == expect


def test_connected_components_topologies(spark):
    from knightshift_spark.operators.dedup import connected_components

    # long chain (diameter 40 → needs pointer jumping, not 40 rounds),
    # a star, a cycle, and an isolated pair — all in one edge list
    chain = [(i, i + 1) for i in range(100, 140)]
    star = [(200, x) for x in range(201, 210)]
    cycle = [(300, 301), (301, 302), (302, 300)]
    extra = [(400, 401)]
    pairs = spark.createDataFrame(
        chain + star + cycle + extra, "doc_a long, doc_b long"
    )
    got = {r["id"]: r["comp"] for r in connected_components(pairs, max_iters=10).collect()}
    assert all(got[i] == 100 for i in range(100, 141))
    assert all(got[i] == 200 for i in range(200, 210))
    assert all(got[i] == 300 for i in (300, 301, 302))
    assert got[400] == 400 and got[401] == 400


def test_dedup_keep_list_end_to_end(spark):
    """pairs → components → keep-list over a duplicate-heavy corpus: the
    capped LSH's star pairs must still collapse each duplicate cluster
    to ONE surviving doc (the whole point of star-connectivity)."""
    from knightshift_spark.operators.dedup import dedup_keep_list, lsh_candidate_pairs

    texts = {
        0: "the quick brown fox jumps over the lazy dog today",
        1: "pack my box with five dozen liquor jugs right now",
        2: "completely unrelated document about spark physical plans",
    }
    rows = []
    for base_id, text in texts.items():
        for c in range(12):  # 12 exact copies of each
            rows.append((base_id * 100 + c, text))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = lsh_candidate_pairs(docs, num_hashes=16, bands=4, max_bucket=4)
    kept = dedup_keep_list(docs, pairs)
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, 100, 200]
    # empty pair set keeps everything
    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    assert dedup_keep_list(docs, empty).count() == 36


def test_rotate_vectors_id_types_and_nulls(spark):
    import numpy as np

    from knightshift_spark.operators.similarity import rotate_vectors

    R = np.eye(4).tolist()
    df = spark.createDataFrame(
        [("a", [1.0, 2.0, 3.0, 4.0]), ("b", None), ("c", [1.0, 2.0])],
        "vec_id string, embedding array<double>",
    )
    got = {r["vec_id"]: r["embedding"] for r in rotate_vectors(df, R).collect()}
    assert got["a"] == [1.0, 2.0, 3.0, 4.0]  # identity rotation, string ids
    assert got["b"] is None  # NULL passes through
    assert got["c"] is None  # wrong-length vector → NULL, not a crash


def test_opq_train_empty_raises(spark):
    import pytest

    from knightshift_spark.operators.similarity import opq_train

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        opq_train(empty)


def test_dedup_report(spark):
    from knightshift_spark.operators.dedup import dedup_report

    docs = spark.createDataFrame(
        [(i, "x" * (10 * (i + 1))) for i in range(6)], "doc_id long, text string"
    )
    # clusters: {0,1,2} (chain) and {4,5}; doc 3 unpaired
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "doc_a long, doc_b long"
    )
    r = dedup_report(docs, pairs).collect()[0]
    assert r["n_docs"] == 6
    assert r["n_clusters"] == 2 and r["n_clustered"] == 5
    assert r["max_cluster"] == 3
    assert r["n_removed"] == 3  # docs 1, 2, 5
    assert r["chars_reclaimed"] == 20 + 30 + 60
    # without a text column: counts only
    r2 = dedup_report(docs, pairs, text_col=None).collect()[0]
    assert r2["n_removed"] == 3 and "chars_reclaimed" not in r2.asDict()


def test_dedup_report_pairs_outside_docs_consistent(spark):
    # ADVICE r5 #4: pairs may reference ids absent from docs (pairs built
    # on a superset snapshot); the cluster counts must come from the
    # pairs universe in BOTH paths, chars_reclaimed only from docs rows
    from knightshift_spark.operators.dedup import dedup_report

    docs = spark.createDataFrame(
        [(0, "aaaa"), (1, "bbbb")], "doc_id long, text string"
    )
    # cluster {0,1,99}: 99 not in docs; removed = {1, 99}
    pairs = spark.createDataFrame([(0, 1), (1, 99)], "doc_a long, doc_b long")
    r = dedup_report(docs, pairs).collect()[0]
    r2 = dedup_report(docs, pairs, text_col=None).collect()[0]
    assert r["n_removed"] == r2["n_removed"] == 2
    assert r["n_clustered"] == 3 and r["n_clusters"] == 1
    assert r["chars_reclaimed"] == 4  # only doc 1 has a docs row


def test_opq_train_rejects_zero_iters(spark):
    import pytest

    from knightshift_spark.operators.similarity import opq_train

    vecs = spark.createDataFrame([(1, [1.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="iters"):
        opq_train(vecs, m=4, ksub=2, iters=0)


def test_opq_books_live_in_final_rotation_space(spark):
    # ADVICE r5 #1: the returned codebooks must be trained on X @ R for
    # the RETURNED R — quantization error with the returned pair can't be
    # worse than with books refit on the final rotation (they're equal)
    import numpy as np

    from knightshift_spark.operators.similarity import (
        _np_subspace_kmeans,
        _unit,
        opq_train,
    )

    rng = np.random.default_rng(5)
    X = rng.normal(size=(64, 8)) @ np.diag([5, 4, 3, 2, 1, 0.5, 0.25, 0.1])
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(X)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    R, books = opq_train(vecs, m=4, ksub=4, iters=3, sample=64)
    R = np.array(R)
    sample = np.array(
        [r["__v"] for r in _unit(vecs, "vec_id", "embedding", "__id", "__v")
         .orderBy("__id").limit(64).collect()]
    )
    refit, _ = _np_subspace_kmeans(sample @ R, m=4, ksub=4)
    for got, want in zip(books, refit):
        assert np.allclose(np.array(got), want)


def test_knn_ivfpq_opq_identity_matches_plain(spark):
    """With the identity rotation, OPQ-IVF-PQ must equal plain IVF-PQ
    bit for bit (same coarse cells, same residual codes, same ADC)."""
    import numpy as np

    from knightshift_spark.operators.similarity import knn_ivfpq, knn_ivfpq_opq
    from pyspark.sql import functions as F

    vecs = _aniso_vectors(spark, n=40)
    q = vecs.filter(F.col("vec_id") < 3)
    c = vecs.filter(F.col("vec_id") >= 3)
    plain = sorted(
        map(tuple, knn_ivfpq(q, c, k=3, n_clusters=2, m=4, ksub=4).collect())
    )
    viaopq = sorted(
        map(
            tuple,
            knn_ivfpq_opq(
                q, c, k=3, n_clusters=2, m=4, ksub=4,
                rotation=np.eye(16).tolist(),
            ).collect(),
        )
    )
    assert plain == viaopq


def test_knn_ivfpq_opq_trained_contract(spark):
    from knightshift_spark.operators.similarity import knn_ivfpq_opq, opq_train
    from pyspark.sql import functions as F

    vecs = _aniso_vectors(spark, n=40)
    q = vecs.filter(F.col("vec_id") < 3)
    c = vecs.filter(F.col("vec_id") >= 3)
    R, _books = opq_train(c, m=4, ksub=4, iters=3, sample=64)
    out = knn_ivfpq_opq(q, c, k=3, n_clusters=2, m=4, ksub=4, rotation=R)
    rows = out.collect()
    assert len(rows) == 3 * 3
    assert all(r["rank"] in (1, 2, 3) and r["adc_dist"] >= 0 for r in rows)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, out.collect()))


def test_connected_components_property_random_graphs(spark):
    """Hypothesis: on ANY random pair set, distributed components equal
    driver-side union-find (min-id labels)."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    from knightshift_spark.operators.dedup import connected_components

    @settings(
        max_examples=8, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        pairs=st.lists(
            st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(
                lambda p: p[0] != p[1]
            ),
            min_size=1,
            max_size=25,
        )
    )
    def check(pairs):
        norm = [(min(a, b), max(a, b)) for a, b in pairs]
        expect = _union_find(norm, {i for p in norm for i in p})
        got = {
            r["id"]: r["comp"]
            for r in connected_components(
                spark.createDataFrame(norm, "doc_a long, doc_b long")
            ).collect()
        }
        assert got == expect

    check()


def test_ivf_local_twin_matches_distributed(spark):
    """VERDICT r10 #2: the adaptive small-input path (driver-side numpy
    Lloyd's) must produce BIT-IDENTICAL centroids to the distributed
    k-means‖ build — both paths forced on the same (non-trivial,
    normalized-double) vectors. The twin replays Spark's arithmetic
    exactly: pow(x,2)=x*x folds, struct-min ties, and the
    decimal(30,15) HALF_UP Lloyd means."""
    import pytest

    from knightshift_spark.operators.similarity import _unit, ivf_centroids

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    u = _unit(emb, "vec_id", "embedding", "__id", "__v").limit(400)
    kw = dict(id_col="__id", vec_col="__v", seed_rounds=2, lloyd_iters=3)
    local = ivf_centroids(u, 4, mode="local", **kw)
    dist = ivf_centroids(u, 4, mode="distributed", **kw)
    assert local == dist  # exact float equality, every coordinate
    # the auto gate picks the local path for this tiny input
    auto = ivf_centroids(u, 4, mode="auto", **kw)
    assert auto == local
    with pytest.raises(ValueError, match="mode"):
        ivf_centroids(u, 4, mode="bogus", **kw)


def test_pq_local_twin_matches_distributed_on_exact_data(spark):
    """pq_codebooks' refine means are plain double F.avg (order-
    dependent at the ulp in general), so the both-paths pin uses
    integer-valued vectors where every partial sum is exact in float64
    — both paths must then agree exactly."""
    from knightshift_spark.operators.similarity import pq_codebooks

    rows = [
        (i, [float((i * 7 + j * 3) % 17 - 8) for j in range(8)])
        for i in range(64)
    ]
    v = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    local = pq_codebooks(v, m=2, ksub=4, mode="local")
    dist = pq_codebooks(v, m=2, ksub=4, mode="distributed")
    assert local == dist


def test_ivf_local_gate_falls_back_on_twin_invalid_input(spark):
    """r11 review: the driver-side twin is only bit-faithful when ids
    are unique (the distributed argmin groupBys by id) and coordinates
    fit the 1e15-scaled int64 replay — duplicate ids or huge magnitudes
    must fall back to the distributed build, not diverge or crash."""
    from knightshift_spark.operators.similarity import ivf_centroids

    # duplicate ids (NOT at the minimum id, so the distributed path's
    # own first-center pick stays deterministic)
    rows = [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (1, [0.0, 2.0]), (2, [3.0, 3.0])]
    v = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kw = dict(id_col="vec_id", vec_col="embedding", seed_rounds=1, lloyd_iters=1)
    assert ivf_centroids(v, 2, mode="local", **kw) == ivf_centroids(
        v, 2, mode="distributed", **kw
    )
    # coordinate beyond the int64 decimal replay (|x| * 1e15 > 2^63)
    big = spark.createDataFrame(
        [(i, [float(10000 + i), 0.5]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    assert ivf_centroids(big, 2, mode="local", **kw) == ivf_centroids(
        big, 2, mode="distributed", **kw
    )


def test_q59_shared_scored_variants_match_knn_operators(spark):
    """r11: q59 derives each probe pair from ONE persisted scored
    relation; outputs must be BIT-IDENTICAL to the standalone
    knn_lsh/knn_ivf operators (same folds, window, rounding)."""
    from knightshift_spark.operators.similarity import (
        knn_ivf,
        knn_lsh,
        prepare_ivf_candidates,
        prepare_lsh_candidates,
    )
    from knightshift_spark.queries.similarity import (
        _ivf_variant_pair,
        _lsh_variant_pair,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q, c = emb.filter(F.col("vec_id") < 10), emb.filter(F.col("vec_id") >= 10)
    c_lsh = prepare_lsh_candidates(c, bits=4)
    b4, b4h1, s1 = _lsh_variant_pair(q, c_lsh, k=3, bits=4)

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    assert rows(b4) == rows(knn_lsh(q, c_lsh, k=3, bits=4))
    assert rows(b4h1) == rows(knn_lsh(q, c_lsh, k=3, bits=4, hamming_probe=1))
    s1.unpersist()

    from knightshift_spark.operators.dedup import stable_hash32

    seeds = (
        c.select("vec_id", "embedding", stable_hash32(
            F.concat(F.col("vec_id").cast("string"), F.lit("|ivfseed"))
        ).alias("__h"))
        .orderBy("__h", "vec_id").limit(4).collect()
    )
    cents = [[float(x) for x in r["embedding"]] for r in seeds]
    c_ivf = prepare_ivf_candidates(c, cents)
    p1, p2, s2 = _ivf_variant_pair(q, c_ivf, cents, k=3)
    assert rows(p1) == rows(knn_ivf(q, c_ivf, k=3, n_clusters=4, centroids=cents))
    assert rows(p2) == rows(
        knn_ivf(q, c_ivf, k=3, n_clusters=4, n_probe=2, centroids=cents)
    )
    s2.unpersist()


def test_jaccard_rescore_pairs_equals_pair_filtered_jaccard_pairs(spark):
    """r14 pair-driven rescore ≡ jaccard_pairs ⋉ pairs — including the
    ≥1-shared-shingle requirement at threshold 0, df_max capping, and a
    candidate pair with no shared shingle (dropped by both shapes)."""
    from knightshift_spark.operators.dedup import jaccard_rescore_pairs

    docs = _docs(spark)
    # candidate list: a real near-dup, an exact dup, an UNRELATED pair
    # (no shared shingle), and one pair deliberately absent (2,4)
    pairs = spark.createDataFrame(
        [(1, 2), (1, 4), (1, 3)], "doc_a int, doc_b int"
    )
    for thr, dfm in ((0.05, None), (0.0, None), (0.5, 5), (0.0, 2)):
        old = {
            tuple(r)
            for r in jaccard_pairs(docs, threshold=thr, df_max=dfm)
            .join(pairs, ["doc_a", "doc_b"], "left_semi")
            .collect()
        }
        for bcast in (False, True):
            new = {
                tuple(r)
                for r in jaccard_rescore_pairs(
                    pairs, docs, threshold=thr, df_max=dfm,
                    broadcast_sets=bcast,
                ).collect()
            }
            assert new == old, (thr, dfm, bcast, new, old)


def test_jaccard_rescore_pairs_max_set_size_guard(spark):
    """r15 payload guard (VERDICT r14 #6): with the cap above every doc's
    shingle-set size the output is identical to the unguarded form; a hub
    doc over the cap raises loudly with its id — the guard never
    truncates (truncation would change the Jaccard)."""
    import pytest

    from knightshift_spark.operators.dedup import jaccard_rescore_pairs

    docs = _docs(spark)
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "doc_a int, doc_b int")
    base = {
        tuple(r)
        for r in jaccard_rescore_pairs(pairs, docs, threshold=0.0).collect()
    }
    guarded = {
        tuple(r)
        for r in jaccard_rescore_pairs(
            pairs, docs, threshold=0.0, max_set_size=10_000
        ).collect()
    }
    assert guarded == base
    # hub doc: 39 distinct bigrams against a 3-shingle cap → loud error
    big = " ".join(f"w{i}" for i in range(40))
    docs2 = spark.createDataFrame(
        [(1, big), (2, big)], "doc_id int, text string"
    )
    p2 = spark.createDataFrame([(1, 2)], "doc_a int, doc_b int")
    with pytest.raises(Exception) as ei:
        jaccard_rescore_pairs(
            p2, docs2, threshold=0.0, max_set_size=3
        ).collect()
    assert "shingles" in str(ei.value)
