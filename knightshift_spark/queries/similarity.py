"""Similarity-search queries over ``embeddings`` (SURVEY.md §2.7).

The oracle reproduces cosine with the *same* left-to-right double-precision
folds (``list_sum(list_transform(...))`` ↔ ``F.aggregate``), so values are
bit-identical before rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from knightshift_spark.operators.similarity import (
    cosine,
    ivf_centroids,
    knn_bruteforce,
    knn_ivf,
    knn_lsh,
)
from knightshift_spark.queries import query
from knightshift_spark.tables import load_table as t

_DOT = (
    "list_sum(list_transform(range(1, len({a}) + 1), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)


def _cos(a: str, b: str) -> str:
    return (
        f"({_DOT.format(a=a, b=b)} / "
        f"(sqrt({_DOT.format(a=a, b=a)}) * sqrt({_DOT.format(a=b, b=b)})))"
    )


@query(
    "q34_embedding_neardup",
    oracle=f"""
      WITH v AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 100)
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             ROUND({_cos('a.embedding', 'b.embedding')}, 4) AS sim
      FROM v a, v b
      WHERE a.vec_id < b.vec_id
        AND ROUND({_cos('a.embedding', 'b.embedding')}, 4) >= 0.3""",
    doc="embedding-cosine near-duplicate pairs (threshold 0.3)",
)
def q34(spark: SparkSession, sf: str) -> DataFrame:
    v = t(spark, sf, "embeddings").filter(F.col("vec_id") < 100)
    a = v.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("__ea"))
    b = v.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("__eb"))
    sim = F.round(cosine("__ea", "__eb", dim=64), 4)
    return (
        F.broadcast(a)
        .crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("sim"))
        .filter(F.col("sim") >= 0.3)
    )


def _dual_topk(scored: DataFrame, base_flag, k: int) -> tuple[DataFrame, DataFrame]:
    """(base top-k, widened top-k) from ONE scored relation in ONE pass.

    r14 (guide §2.4): the previous shape persisted ``scored`` and ran
    two separate ``topk_by_sim`` plans (filtered base + full) over the
    cache — two window plans, a cache write + read, and measurable
    block-manager contention (event-log: 32-task stages at ~1 s run /
    ~0.02 s CPU each while tasks queued on the same cached blocks).
    Both rankings are windows clustered on ``query_id``:
    ``HashPartitioning(query_id)`` satisfies the clustered distribution
    of BOTH (``query_id`` ⊆ both window keys), so computing the two
    row_numbers side by side costs ONE exchange and two local sorts —
    no persist, no duplicated scoring subtree.

    Output is bit-identical to ``topk_by_sim`` on the filtered/full
    relations: each (query, neighbor) pair appears exactly once in
    ``scored`` (disjoint probe/cluster membership — the callers'
    invariant), and the base window partitions additionally by
    ``base_flag`` so base ranks count only base rows, with the same
    (sim desc, neighbor_id) order and rounding."""
    from pyspark.sql import Window

    order = [F.col("__sim").desc(), F.col("neighbor_id")]
    w_all = Window.partitionBy("query_id").orderBy(*order)
    w_base = Window.partitionBy("query_id", base_flag).orderBy(*order)
    ranked = scored.withColumn(
        "__rn_all", F.row_number().over(w_all)
    ).withColumn("__rn_base", F.row_number().over(w_base))
    sim = F.round("__sim", 4).alias("sim")
    base = ranked.filter(base_flag & (F.col("__rn_base") <= k)).select(
        "query_id", "neighbor_id", sim, F.col("__rn_base").alias("rank")
    )
    widened = ranked.filter(F.col("__rn_all") <= k).select(
        "query_id", "neighbor_id", sim, F.col("__rn_all").alias("rank")
    )
    return base, widened


def _lsh_variant_pair(
    queries: DataFrame, c_lsh: DataFrame, k: int, bits: int
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(exact-bucket top-k, Hamming-1-probed top-k) from ONE scored
    relation (see ``_dual_topk``): the widening variant's candidate set
    strictly contains the base's (probe index 0 = the query's own
    sketch). The third element is kept for call-site compatibility
    (formerly the persisted relation; unpersist on it is a no-op)."""
    from knightshift_spark.operators.similarity import dot, norm, srp_probe_array

    probes = srp_probe_array(F.col("embedding"), bits, 64, hamming_probe=1)
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("__qv"),
        norm("embedding", 64).alias("__qn"),
        F.posexplode(probes).alias("__pi", "__sk"),
    )
    scored = (
        F.broadcast(q)
        .join(c_lsh.select("neighbor_id", "__cv", "__cn", "__sk"), "__sk")
        .select(
            "query_id",
            "neighbor_id",
            "__pi",
            (dot("__qv", "__cv", 64) / (F.col("__qn") * F.col("__cn"))).alias(
                "__sim"
            ),
        )
    )
    base, widened = _dual_topk(scored, F.col("__pi") == 0, k)
    return base, widened, scored


def _ivf_variant_pair(
    queries: DataFrame, c_ivf: DataFrame, cents: list, k: int
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(1-probe top-k, 2-probe top-k) from ONE scored relation (see
    ``_dual_topk``) — probe rank 0 is the nearest centroid, exactly
    ``knn_ivf``'s ``n_probe=1`` candidate set (clusters are disjoint,
    so each pair appears once and no dedup is needed). The third
    element is kept for call-site compatibility (formerly the persisted
    relation; unpersist on it is a no-op)."""
    from knightshift_spark.operators.similarity import (
        assign_ivf_clusters,
        dot,
        norm,
    )

    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("__qv"),
        norm("embedding", 64).alias("__qn"),
        F.posexplode(
            assign_ivf_clusters(F.col("embedding"), cents, 2)
        ).alias("__pr", "__cid"),
    )
    scored = (
        F.broadcast(q)
        .join(c_ivf.select("neighbor_id", "__cv", "__cn", "__cid"), "__cid")
        .select(
            "query_id",
            "neighbor_id",
            "__pr",
            (dot("__qv", "__cv", 64) / (F.col("__qn") * F.col("__cn"))).alias(
                "__sim"
            ),
        )
    )
    base, widened = _dual_topk(scored, F.col("__pr") == 0, k)
    return base, widened, scored


def ann_recall_harness(
    spark: SparkSession,
    variants: dict[str, DataFrame],
    truth: DataFrame,
    widens: dict[str, str] | None = None,
) -> DataFrame:
    """recall@k over ``variants`` (name → approx top-k DataFrame) vs the
    brute-force ``truth``. ONE plan: method-tagged union of the approx
    results, one inner join against persisted truth, one groupBy. The
    method-count-sized result is materialized inside the harness (so the
    persisted intermediates can be unpersisted before returning — repeated
    invocations don't leak cached blocks) and handed back as a small
    local-relation DataFrame.

    ``widens`` maps a variant name to the variant it strictly widens (e.g.
    multiprobe → its single-probe base). The output carries a
    self-verifying ``ok`` column: recall ∈ [0, 1] for every row, and a
    widening variant's recall must be ≥ its base's (candidate supersets
    can't lose hits) — so a rows-only driver check still pins the
    *property*, not just the row count.
    """
    truth = truth.select("query_id", "neighbor_id").persist()
    approx = None
    for name, df in variants.items():
        tagged = df.select("query_id", "neighbor_id").withColumn(
            "method", F.lit(name)
        )
        approx = tagged if approx is None else approx.unionByName(tagged)
    hits = (
        approx.join(truth, ["query_id", "neighbor_id"], "inner")
        .groupBy("method")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    # static method list (LocalTableScan) keeps zero-hit methods in the
    # output instead of dropping them from the groupBy
    methods = spark.createDataFrame(
        [(m, (widens or {}).get(m)) for m in variants], "method string, widens string"
    )
    totals = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    recall = F.round(F.coalesce("n_hits", F.lit(0)) / F.col("n_truth"), 4)
    # persist: one row per method; referenced twice below (scored + base
    # lookup) — without the persist the whole variant union would be
    # computed once per reference
    scored = (
        methods.join(hits, "method", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "method",
            "widens",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            "n_truth",
            recall.alias("recall_at_k"),
        )
        .persist()
    )
    base = scored.select(
        F.col("method").alias("widens"), F.col("recall_at_k").alias("base_recall")
    )
    out = (
        scored.join(F.broadcast(base), "widens", "left")
        .select(
            "method",
            "n_hits",
            "n_truth",
            "recall_at_k",
            (
                F.col("recall_at_k").between(0.0, 1.0)
                & F.coalesce(
                    F.col("recall_at_k") >= F.col("base_recall"), F.lit(True)
                )
            ).alias("ok"),
        )
        .orderBy("method")
    )
    rows = out.collect()  # one row per method — driver-safe by construction
    truth.unpersist()
    scored.unpersist()
    from knightshift_spark.plans.localrel import local_relation

    return local_relation(spark, rows, out.schema)


# q59_ann_recall is declared at the end of this module: its round-7
# composed oracle consumes _srp_sketch_sql, which must exist first.


def _srp_sketch_sql(vec: str, bits: int = 4, dim: int = 64) -> str:
    """DuckDB expression computing the same SRP sketch as
    ``operators.similarity.srp_sketch``: hyperplane signs come from the
    identical md5 derivation, folded in as literals."""
    import hashlib

    def sign(b: int, i: int) -> str:
        h = int(hashlib.md5(f"srp:{b}:{i}".encode()).hexdigest()[:8], 16)
        return "1.0" if h % 2 == 0 else "-1.0"

    terms = []
    for b in range(bits):
        signs = ", ".join(sign(b, i) for i in range(dim))
        proj = (
            f"list_sum(list_transform(range(1, {dim + 1}), "
            f"i -> CAST({vec}[i] AS DOUBLE) * ([{signs}])[i]))"
        )
        terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << b} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


@query(
    "q33_knn_cosine",
    oracle=f"""
      WITH q AS (SELECT vec_id AS query_id, embedding AS qv,
                        {_srp_sketch_sql('embedding')} AS sk
                 FROM embeddings WHERE vec_id < 5),
      c AS (SELECT vec_id AS neighbor_id, embedding AS cv,
                   {_srp_sketch_sql('embedding')} AS sk
            FROM embeddings WHERE vec_id >= 5),
      brute AS (
        SELECT query_id, neighbor_id, {_cos('qv', 'cv')} AS sim FROM q, c),
      lsh AS (
        SELECT query_id, neighbor_id, {_cos('qv', 'cv')} AS sim
        FROM q JOIN c ON q.sk = c.sk),
      tagged AS (
        SELECT 'brute' AS path, * FROM brute
        UNION ALL
        SELECT 'lsh' AS path, * FROM lsh),
      ranked AS (
        SELECT path, query_id, neighbor_id, sim,
               ROW_NUMBER() OVER (PARTITION BY path, query_id ORDER BY sim DESC, neighbor_id) AS rank
        FROM tagged)
      SELECT path, query_id, neighbor_id, ROUND(sim, 4) AS sim, CAST(rank AS INT) AS rank
      FROM ranked WHERE rank <= 3""",
    doc="cosine top-k, BOTH ANN paths tagged by `path` (round-8 fusion "
        "q33←q33b, freeing a declared slot for q72 under the driver's "
        "50-query budget): path='brute' is the exact broadcast baseline, "
        "path='lsh' the SRP-bucketed scale path with portable md5-derived "
        "hyperplanes — both top-3 lists hash-checked",
)
def q33(spark: SparkSession, sf: str) -> DataFrame:
    emb = t(spark, sf, "embeddings")
    qs, cs = emb.filter(F.col("vec_id") < 5), emb.filter(F.col("vec_id") >= 5)
    brute = knn_bruteforce(qs, cs, k=3, dim=64).withColumn("path", F.lit("brute"))
    lsh = knn_lsh(qs, cs, k=3, bits=4).withColumn("path", F.lit("lsh"))
    return brute.unionByName(lsh).select(
        "path", "query_id", "neighbor_id", "sim", "rank"
    )


def _sq_l2_sql(a: str, b: str, dim: int = 64) -> str:
    """DuckDB squared-L2 with the same left-to-right double fold as
    ``operators.similarity._sq_l2``."""
    return (
        f"list_sum(list_transform(range(1, {dim + 1}), i -> "
        f"(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) * "
        f"(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))))"
    )


def _top3_sql(name: str, pair_src: str) -> str:
    """Ranked top-3 CTE pair over a (query_id, neighbor_id, sim) source —
    the SQL twin of the knn_* window (sim DESC, neighbor_id tie-break)."""
    return f"""
      {name} AS (
        SELECT query_id, neighbor_id FROM (
          SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY sim DESC, neighbor_id) AS rnk
          FROM ({pair_src}))
        WHERE rnk <= 3)"""


def _q59_oracle() -> str:
    """Composed exact oracle for the whole recall harness (VERDICT r6
    #5, taken further): with the declared IVF codebook switched to the
    hash-ranked seed rule, EVERY variant — SRP buckets, Hamming-1
    probes, both IVF probe settings — plus the brute-force truth and the
    recall/ok arithmetic is deterministic md5/double arithmetic DuckDB
    reproduces bit-for-bit (the q33/q33b portability argument, extended
    to the harness)."""
    from knightshift_spark.queries.dedup import hash32_sql

    seed_hash = hash32_sql("CAST(neighbor_id AS VARCHAR) || '|ivfseed'")
    cos = _cos("q.v", "c.v")
    lsh0 = (
        f"SELECT q.query_id, c.neighbor_id, {_cos('q.v', 'c.v')} AS sim "
        "FROM qs q JOIN cs c ON q.sk = c.sk"
    )
    lsh1 = (
        f"SELECT q.query_id, c.neighbor_id, {_cos('q.v', 'c.v')} AS sim "
        "FROM qs q JOIN cs c ON bit_count(xor(q.sk, c.sk)) <= 1"
    )
    ivf = (
        "SELECT q.query_id, c.neighbor_id, {cos} AS sim "
        "FROM qv q JOIN qprobe p ON q.query_id = p.query_id AND p.pr <= {np} "
        "JOIN casg a ON p.cid = a.cid "
        "JOIN cv c ON a.neighbor_id = c.neighbor_id"
    )
    return f"""
      WITH qv AS MATERIALIZED (
        SELECT vec_id AS query_id, embedding AS v FROM embeddings
        WHERE vec_id < 10),
      cv AS MATERIALIZED (
        SELECT vec_id AS neighbor_id, embedding AS v FROM embeddings
        WHERE vec_id >= 10),
      {_top3_sql("truth", f"SELECT q.query_id, c.neighbor_id, {cos} AS sim FROM qv q, cv c")},
      qs AS MATERIALIZED (
        SELECT query_id, v, {_srp_sketch_sql('v')} AS sk FROM qv),
      cs AS MATERIALIZED (
        SELECT neighbor_id, v, {_srp_sketch_sql('v')} AS sk FROM cv),
      cent AS MATERIALIZED (
        SELECT ROW_NUMBER() OVER (ORDER BY h, neighbor_id) - 1 AS cid, v
        FROM (SELECT neighbor_id, v, {seed_hash} AS h FROM cv
              ORDER BY h, neighbor_id LIMIT 4)),
      casg AS MATERIALIZED (
        SELECT neighbor_id, cid FROM (
          SELECT c.neighbor_id, ct.cid,
                 ROW_NUMBER() OVER (PARTITION BY c.neighbor_id
                                    ORDER BY {_sq_l2_sql('c.v', 'ct.v')}, ct.cid) AS rn
          FROM cv c CROSS JOIN cent ct)
        WHERE rn = 1),
      qprobe AS MATERIALIZED (
        SELECT q.query_id, ct.cid,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                                  ORDER BY {_sq_l2_sql('q.v', 'ct.v')}, ct.cid) AS pr
        FROM qv q CROSS JOIN cent ct),
      {_top3_sql("lsh0", lsh0)},
      {_top3_sql("lsh1", lsh1)},
      {_top3_sql("ivf1", ivf.format(cos=cos, np=1))},
      {_top3_sql("ivf2", ivf.format(cos=cos, np=2))},
      appr AS (
        SELECT 'lsh_b4' AS method, query_id, neighbor_id FROM lsh0
        UNION ALL SELECT 'lsh_b4_h1', query_id, neighbor_id FROM lsh1
        UNION ALL SELECT 'ivf_seed4', query_id, neighbor_id FROM ivf1
        UNION ALL SELECT 'ivf_seed4_p2', query_id, neighbor_id FROM ivf2),
      hits AS (
        SELECT method, COUNT(*) AS n_hits
        FROM appr JOIN truth USING (query_id, neighbor_id)
        GROUP BY method),
      m(method, widens) AS (VALUES
        ('ivf_seed4', NULL), ('ivf_seed4_p2', 'ivf_seed4'),
        ('lsh_b4', NULL), ('lsh_b4_h1', 'lsh_b4')),
      tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth),
      sc AS MATERIALIZED (
        SELECT m.method, m.widens,
               CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
               (SELECT n_truth FROM tot) AS n_truth,
               ROUND(CAST(COALESCE(h.n_hits, 0) AS DOUBLE)
                     / (SELECT n_truth FROM tot), 4) AS recall_at_k
        FROM m LEFT JOIN hits h ON m.method = h.method)
      SELECT s.method, s.n_hits, s.n_truth, s.recall_at_k,
             (s.recall_at_k BETWEEN 0 AND 1)
               AND COALESCE(s.recall_at_k >= b.recall_at_k, TRUE) AS ok
      FROM sc s LEFT JOIN sc b ON s.widens = b.method"""


@query(
    "q59_ann_recall",
    oracle=_q59_oracle(),
    doc="recall@k harness: LSH (SRP buckets, plus Hamming-1 multiprobe) "
        "and IVF (1- and 2-probe) top-k vs brute-force ground truth — the "
        "accept/reject dial for ANN parameters at scale — now with a "
        "COMPOSED EXACT ORACLE: the declared codebook is the hash-ranked "
        "seed rule (4 lowest md5-bucket candidates), so every variant, "
        "the truth set, and the recall/ok arithmetic reproduce in DuckDB "
        "bit-for-bit (q33/q33b's portability argument extended to the "
        "harness). The Lloyd-refined production codebook build "
        "(ivf_centroids) remains covered by pytest (brute-force recall "
        "floors) and the bench ANN section — the q31b pattern: declared "
        "form checks the exact path, production branch verified where "
        "exactness is measurable. Lean 4-variant set (the full 6-variant "
        "sweep incl. PQ/IVF-PQ runs in pytest); output rows keep the "
        "self-verifying ok bit (recall bounds + multiprobe monotonicity). "
        "Absorbs former q53_knn_ivf: both IVF probe settings share one "
        "codebook and one prepared assignment table",
)
def q59(spark: SparkSession, sf: str) -> DataFrame:
    from knightshift_spark.operators.dedup import stable_hash32
    from knightshift_spark.operators.similarity import (
        prepare_ivf_candidates,
        prepare_lsh_candidates,
    )
    from knightshift_spark.plans.partitioning import tiny_job_confs

    # r14: the recall harness is a BOUNDED parameter-evaluation surface
    # (10 queries × the candidate sample, method-count-sized output) —
    # the same declaration q57 makes with small_input=True, so its eager
    # jobs run under the same scoped confs (AQE re-optimization + 32-way
    # tiny shuffles are pure overhead here; measured −5 CPU-s/build).
    with tiny_job_confs(spark, True):
        return _q59_body(spark, sf, stable_hash32, prepare_ivf_candidates,
                         prepare_lsh_candidates)


def _q59_body(spark, sf, stable_hash32, prepare_ivf_candidates,
              prepare_lsh_candidates) -> DataFrame:
    emb = t(spark, sf, "embeddings")
    q, c = emb.filter(F.col("vec_id") < 10), emb.filter(F.col("vec_id") >= 10)
    # the candidate relation feeds truth + codebook + 2 prepared index
    # tables — pin it in memory for the duration of the harness build
    c = c.persist()
    truth = knn_bruteforce(q, c, k=3, dim=64)
    # deterministic hash-ranked seed codebook (4 rows collected — bounded
    # by construction); one codebook serves both IVF probe settings
    seeds = (
        c.select(
            "vec_id",
            "embedding",
            stable_hash32(
                F.concat(F.col("vec_id").cast("string"), F.lit("|ivfseed"))
            ).alias("__h"),
        )
        .orderBy("__h", "vec_id")
        .limit(4)
        .collect()
    )
    cents = [[float(x) for x in r["embedding"]] for r in seeds]
    # shared index tables: the sketch / cluster-assignment projections
    # (the per-candidate codegen cost) run once per index, not once per
    # probe setting — the in-memory form of the persisted-index path
    # NOT persisted (r11 review): each prepared table now feeds exactly
    # one consumer — the persisted scored relation — so caching them was
    # pure materialization cost (c itself stays persisted above)
    c_lsh = prepare_lsh_candidates(c, bits=4)
    c_ivf = prepare_ivf_candidates(c, cents)
    # r11: each index family scores ONCE (persisted pair relation) and
    # both probe settings are windows over it — the widening variant's
    # candidate set strictly contains the base's, so the base is a
    # pre-window filter instead of a second codegen-heavy scoring plan
    # (the harness's charged build had 4 such plans; now 2). Outputs
    # stay bit-identical to knn_lsh/knn_ivf (pinned in pytest).
    lsh_b4, lsh_b4_h1, s_lsh = _lsh_variant_pair(q, c_lsh, k=3, bits=4)
    ivf_p1, ivf_p2, s_ivf = _ivf_variant_pair(q, c_ivf, cents, k=3)
    variants = {
        "lsh_b4": lsh_b4,
        "lsh_b4_h1": lsh_b4_h1,
        "ivf_seed4": ivf_p1,
        "ivf_seed4_p2": ivf_p2,
    }
    widens = {"lsh_b4_h1": "lsh_b4", "ivf_seed4_p2": "ivf_seed4"}
    out = ann_recall_harness(spark, variants, truth, widens)
    for cached in (c, s_lsh, s_ivf):  # harness materialized -> drop
        cached.unpersist()
    return out
