"""Q01–Q24: relational operator coverage (SURVEY.md §2.8).

Each query exercises specific inventory operators (OP-xx refs in docs).
Built with the DataFrame API so Catalyst gets full freedom: filters and
projections reach the parquet scan (PushedFilters/ReadSchema), small dims
broadcast, aggregates get map-side partials.

Round 2: same-table micro-queries are fused so the whole declared set
fits the driver's 50-query correctness budget with zero coverage loss —
every absorbed operator is named in the surviving query's doc (q05←q18,
q06←q07, q08←q14, q10←q11, q15←q45, q19←q20/q25, q24←q50; q03/q04 moved
into q47/q46, q21's ranking window lives on in q40).

Round 3 (freeing slots for the oracle-checked corpus operators q66–q68):
q12's max(struct) last-wins rides q60's groupBy (same key, same shuffle —
``last_shipdate`` column), q23's agg + global-order + limit
(TakeOrderedAndProject) shape lives on in q67_bm25_topk, and q53's IVF
probe runs inside q59's recall harness (both probe settings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from knightshift_spark.queries import query
from knightshift_spark.tables import load_table as t


def money_units(col, frac_digits: int = 4):
    """A money double as exact fixed-point integer units: the inputs are
    2-dp money × 2-dp discount, so the true product is an exact 4-dp
    value; the double carries it with ~1e-9 absolute error, so
    ``round(x·1e4)`` recovers the exact integer in both engines (the
    nearest rounding tie is 0.5 away). Project this ONCE before the
    aggregation — built inside each aggregate, the product+round
    re-computes per aggregate expression (measured 2× the agg cost)."""
    return F.round(col * F.lit(10**frac_digits)).cast("bigint")


def money_whole_frac(e4_col, frac_digits: int = 4):
    """Deterministic money aggregation: the whole/fraction BIGINT split of
    a pre-projected ``money_units`` column — SUM both parts (any number of
    aggregation levels; bigint addition is associative so every order
    gives the one answer), then ``round(whole + frac/1e4, 2)``. The fast
    exact path for fixed-point values (VERDICT r4 #2: decimal(38,10)
    accumulation made q15 the suite's one >2×-of-DuckDB query; decimal
    WIDTH barely matters — measured 0.66s at widths 15–25 vs 0.26s for
    integer sums on 6M rows — the per-row decimal cast/add machinery is
    the tax, so step out of decimals entirely).

    Overflow (the reason for TWO sums rather than one): one bigint in e4
    units caps at ~9.2e18/1.1e9 ≈ 8e9 rows per group — real 100 TB
    corpora exceed that. Splitting each row into whole units (≤1.1e5)
    and fractional e4 remainder (<1e4) bounds both sums by ~1e16 at
    6e11 rows/group — 50× headroom at 100 TB.

    floor + pmod (not div + %) so the identity ``x = floor(x/u)·u +
    pmod(x, u)`` also holds for negative money (refunds)."""
    unit = F.lit(10**frac_digits)
    return (
        F.floor(e4_col / unit).cast("bigint").alias("__whole"),
        F.pmod(e4_col, unit).alias("__frac"),
    )


@query(
    "q01_filter_scan",
    oracle="""SELECT l_orderkey, l_linenumber FROM lineitem
              WHERE l_returnflag = 'R' AND l_quantity > 30""",
    doc="OP-03 scan + OP-24/25 predicates; filters push to parquet scan",
)
def q01(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    return li.filter((F.col("l_returnflag") == "R") & (F.col("l_quantity") > 30)).select(
        "l_orderkey", "l_linenumber"
    )


@query(
    "q02_project_cast",
    oracle="SELECT o_orderkey, CAST(TRUNC(o_totalprice) AS INT) AS v FROM orders",
    doc="OP-11 projection + OP-13 int cast (truncating, like Python int())",
)
def q02(spark: SparkSession, sf: str) -> DataFrame:
    return t(spark, sf, "orders").select(
        "o_orderkey", F.col("o_totalprice").try_cast("int").alias("v")
    )


@query(
    "q05_recode",
    oracle="""SELECT o_orderkey,
              CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'HOT'
                   ELSE 'NORMAL' END AS priority_class,
              CONCAT_WS(', ',
                CASE WHEN o_totalprice > 200000 THEN 'big' END,
                CASE WHEN o_orderstatus = 'F' THEN 'final' END) AS notes
              FROM orders""",
    doc="OP-17/OP-19 dictionary recode as chained when() + OP-23 notes "
        "accumulator (concat_ws skips NULLs in both engines; absorbs former "
        "q18_concat_ws — same-table projections fuse into one scan)",
)
def q05(spark: SparkSession, sf: str) -> DataFrame:
    return t(spark, sf, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "HOT")
        .otherwise("NORMAL")
        .alias("priority_class"),
        F.concat_ws(
            ", ",
            F.when(F.col("o_totalprice") > 200000, "big"),
            F.when(F.col("o_orderstatus") == "F", "final"),
        ).alias("notes"),
    )


@query(
    "q06_nullif",
    oracle="""SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg,
              UPPER(TRIM(c_name)) AS name_norm FROM customer""",
    doc="OP-18 sentinel→NULL + OP-20 trim/case normalization (absorbs "
        "former q07_upper_trim; one customer scan)",
)
def q06(spark: SparkSession, sf: str) -> DataFrame:
    return t(spark, sf, "customer").select(
        "c_custkey",
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg"),
        F.upper(F.trim("c_name")).alias("name_norm"),
    )


@query(
    "q08_isin_count",
    oracle="""SELECT COUNT(CASE WHEN l_linestatus IN ('O') THEN 1 END) AS n_open,
              COUNT(*) AS n_all FROM lineitem""",
    doc="OP-25 set membership + OP-32 count: filtered and total counts in "
        "one pass (absorbs former q14_count — one scan, map-side partials)",
)
def q08(spark: SparkSession, sf: str) -> DataFrame:
    return t(spark, sf, "lineitem").agg(
        F.count(F.when(F.col("l_linestatus").isin("O"), 1)).alias("n_open"),
        F.count(F.lit(1)).alias("n_all"),
    )


@query(
    "q09_unpivot_distinct",
    oracle="""SELECT DISTINCT u FROM (
                SELECT l_suppkey AS u FROM lineitem
                UNION ALL SELECT l_partkey FROM lineitem) t""",
    doc="OP-29 two-column unpivot ∪ distinct via explode(array())",
)
def q09(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "lineitem")
        .select(F.explode(F.array("l_suppkey", "l_partkey")).alias("u"))
        .distinct()
    )


@query(
    "q10_semi_join",
    oracle="""SELECT c_custkey, 'present' AS tag FROM customer
              WHERE c_custkey IN (SELECT o_custkey FROM orders)
              UNION ALL
              SELECT c_custkey, 'absent' AS tag FROM customer
              WHERE c_custkey NOT IN
                (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)""",
    doc="OP-30 existence joins, both polarities: left_semi (present) ∪ "
        "left_anti (absent, the OP-08 insert-if-absent predicate) — "
        "absorbs former q11_anti_join; each branch is its own join so "
        "both physical operators are exercised and oracle-checked",
)
def q10(spark: SparkSession, sf: str) -> DataFrame:
    c, o = t(spark, sf, "customer"), t(spark, sf, "orders")
    # distinct + not-null ONCE, shared by both joins: an equality
    # semi-join never matches NULL keys, so the null filter is
    # semantics-preserving on the semi side too, and the shared subtree
    # lets Catalyst reuse one exchange for both branches. The distinct
    # shrinks the build/shuffle side from |orders| to |distinct
    # custkeys| — at sf1 that cut the measured run 0.61 s → 0.42 s
    # (broadcast build of 1.5 M rows → 15 k), and at 100 TB it is the
    # difference between shuffling the fact table and shuffling the
    # key domain.
    okeys = (
        o.select(F.col("o_custkey").alias("c_custkey"))
        .filter(F.col("c_custkey").isNotNull())
        .distinct()
    )
    semi = (
        c.join(okeys, "c_custkey", "left_semi")
        .select("c_custkey", F.lit("present").alias("tag"))
    )
    anti = (
        c.join(okeys, "c_custkey", "left_anti")
        .select("c_custkey", F.lit("absent").alias("tag"))
    )
    return semi.unionByName(anti)


@query(
    "q13_left_join_coalesce",
    oracle="""SELECT o.o_orderkey, COALESCE(c.c_name, 'missing') AS c_name_f
              FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey""",
    doc="OP-06 merge-shaped equi-join; customer side broadcasts",
)
def q13(spark: SparkSession, sf: str) -> DataFrame:
    o, c = t(spark, sf, "orders"), t(spark, sf, "customer")
    return o.join(
        F.broadcast(c.select("c_custkey", "c_name")),
        o.o_custkey == c.c_custkey,
        "left",
    ).select("o_orderkey", F.coalesce("c_name", F.lit("missing")).alias("c_name_f"))


@query(
    "q15_pricing_summary",
    # The money term below is the two-level BIGINT formula, NOT the naive
    # ROUND(SUM(price*(1-disc)), 2). Equivalence premise (edit with care):
    # inputs are exact 4-dp fixed-point values (2-dp money x 2-dp discount),
    # so ROUND(x*10000) recovers the exact integer product in both engines
    # (the nearest rounding tie sits 0.5 away, doubles carry ~1e-9 error)
    # and the whole/fraction split is then pure integer arithmetic. If the
    # inputs ever stop being exactly representable at 4 dp, this oracle and
    # money_units() must change together.
    oracle="""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
              ROUND(SUM(FLOOR(CAST(ROUND(l_extendedprice*(1-l_discount)*10000) AS BIGINT)/10000))
                    + SUM(((CAST(ROUND(l_extendedprice*(1-l_discount)*10000) AS BIGINT) % 10000) + 10000) % 10000)/10000.0,
                    2) AS revenue,
              ROUND(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
              ROUND(quantile_cont(l_quantity, 0.9), 4) AS p90_qty
              FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    doc="OP-33 grouped counts, TPC-H Q1 shape; two-level bigint money "
        "accumulation (exact + deterministic, see money_whole_frac) keeps "
        "the per-row cost at integer-add speed. Absorbs former "
        "q45_percentile as a VALUE-HISTOGRAM exact percentile "
        "(grouped_percentiles): l_quantity has a ~50-value domain, so "
        "cumulative-weight interpolation over the histogram equals "
        "quantile_cont exactly with bounded state — no per-group value "
        "multiset (the r5 scale-killer); the money partial sums ride the "
        "same histogram shuffle",
)
def q15(spark: SparkSession, sf: str) -> DataFrame:
    from knightshift_spark.operators.percentiles import grouped_percentiles

    li = t(spark, sf, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    unit = F.lit(10**4)
    # whole/fraction split pre-projected so the money partial sums ride
    # the histogram shuffle (see money_whole_frac for the overflow math)
    whole, frac = money_whole_frac(money_units(rev))
    return grouped_percentiles(
        li.select("l_returnflag", "l_linestatus", "l_quantity", whole, frac),
        keys=["l_returnflag", "l_linestatus"],
        value_col="l_quantity",
        percentiles={"p50_qty": 0.5, "p90_qty": 0.9},
        extra_sums=["__whole", "__frac"],
        round_digits=4,
    ).select(
        "l_returnflag",
        "l_linestatus",
        "n",
        F.round(
            F.col("__whole") + F.col("__frac").cast("double") / unit, 2
        ).alias("revenue"),
        "p50_qty",
        "p90_qty",
    )


@query(
    "q16_join_agg",
    oracle="""SELECT n_name, COUNT(*) AS n FROM customer
              JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name""",
    doc="hash join + agg; 25-row nation broadcasts",
)
def q16(spark: SparkSession, sf: str) -> DataFrame:
    c, n = t(spark, sf, "customer"), t(spark, sf, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q17_three_way_join",
    oracle="""SELECT r_name,
              ROUND(CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_bal
              FROM supplier JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey GROUP BY r_name""",
    doc="broadcast 3-way star join",
)
def q17(spark: SparkSession, sf: str) -> DataFrame:
    s = t(spark, sf, "supplier")
    n = t(spark, sf, "nation")
    r = t(spark, sf, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.round(
                F.sum(F.col("s_acctbal").cast("decimal(18,2)")).cast("double"), 2
            ).alias("total_bal")
        )
    )


@query(
    "q19_regexp_extract",
    oracle="""SELECT event_id, regexp_extract(props, '"k": (\\d+)', 1) AS k_str,
              TRY_CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INT) AS k_re,
              CAST(json_extract(props, '$.k') AS INT) AS k_json
              FROM events""",
    doc="OP-22 tag extraction + OP-13 try-cast NULL-on-garbage + OP-21 JSON "
        "access (absorbs former q20_json_extract / q25_try_cast — all three "
        "extraction paths fuse into one events scan; both engines return '' "
        "on regex no-match)",
)
def q19(spark: SparkSession, sf: str) -> DataFrame:
    k_str = F.regexp_extract("props", r'"k": (\d+)', 1)
    return t(spark, sf, "events").select(
        "event_id",
        k_str.alias("k_str"),
        k_str.try_cast("int").alias("k_re"),
        F.get_json_object("props", "$.k").try_cast("int").alias("k_json"),
    )


@query(
    "q22_hourly_rollup",
    oracle="""SELECT DATE_TRUNC('hour', ts) AS h, event_type, COUNT(*) AS n
              FROM events GROUP BY 1, 2""",
    doc="event-time tumbling window (batch form of the streaming rollup)",
)
def q22(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q24_intersect",
    oracle="""SELECT k, 'both' AS tag FROM (
                SELECT n_regionkey AS k FROM nation
                INTERSECT SELECT r_regionkey FROM region) a
              UNION ALL
              SELECT k, 'left_only' AS tag FROM (
                SELECT n_nationkey AS k FROM nation
                EXCEPT SELECT r_regionkey FROM region) b""",
    doc="set ops, both polarities (absorbs former q50_except): INTERSECT "
        "via .intersect, EXCEPT via .subtract — subtract keeps SQL EXCEPT "
        "DISTINCT semantics even with duplicate left values (exceptAll()."
        "distinct() would not: 3×A vs 1×B keeps A there, EXCEPT drops it)",
)
def q24(spark: SparkSession, sf: str) -> DataFrame:
    n, r = t(spark, sf, "nation"), t(spark, sf, "region")
    rkeys = r.select(F.col("r_regionkey").alias("k"))
    both = (
        n.select(F.col("n_regionkey").alias("k"))
        .intersect(rkeys)
        .select("k", F.lit("both").alias("tag"))
    )
    left_only = (
        n.select(F.col("n_nationkey").alias("k"))
        .subtract(rkeys)
        .select("k", F.lit("left_only").alias("tag"))
    )
    return both.unionByName(left_only)
