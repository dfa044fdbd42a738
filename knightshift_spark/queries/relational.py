"""Q01–Q25: relational operator coverage (SURVEY.md §2.8).

Each query exercises specific inventory operators (OP-xx refs in docs).
Built with the DataFrame API so Catalyst gets full freedom: filters and
projections reach the parquet scan (PushedFilters/ReadSchema), small dims
broadcast, aggregates get map-side partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from knightshift_spark.queries import query
from knightshift_spark.tables import load_table as t


def _dec_sum_round(col, scale: str = "decimal(38,10)", digits: int = 2):
    """Deterministic float aggregation: exact decimal accumulation, then
    double + round. Float sum order differs across engines/partitions;
    decimal addition is associative so any plan gives one answer."""
    return F.round(F.sum(col.cast(scale)).cast("double"), digits)


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
    "q03_split_last",
    oracle="SELECT p_partkey, split_part(p_type, ' ', -1) AS type_last FROM part",
    doc="OP-12 key-from-URL style string split, last element",
)
def q03(spark: SparkSession, sf: str) -> DataFrame:
    return t(spark, sf, "part").select(
        "p_partkey", F.element_at(F.split("p_type", " "), -1).alias("type_last")
    )


@query(
    "q04_date_parse",
    oracle="""SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d FROM orders
              WHERE o_orderdate >= TIMESTAMP '1997-01-01'""",
    doc="OP-14 date handling + pushdown-friendly range predicate",
)
def q04(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        .select("o_orderkey", F.to_date("o_orderdate").alias("d"))
    )


@query(
    "q05_recode",
    oracle="""SELECT o_orderkey,
              CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'HOT'
                   ELSE 'NORMAL' END AS priority_class FROM orders""",
    doc="OP-17/OP-19 dictionary recode as chained when()",
)
def q05(spark: SparkSession, sf: str) -> DataFrame:
    return t(spark, sf, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "HOT")
        .otherwise("NORMAL")
        .alias("priority_class"),
    )


@query(
    "q06_nullif",
    oracle="SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg FROM customer",
    doc="OP-18 sentinel→NULL",
)
def q06(spark: SparkSession, sf: str) -> DataFrame:
    return t(spark, sf, "customer").select(
        "c_custkey", F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg")
    )


@query(
    "q07_upper_trim",
    oracle="SELECT n_nationkey, UPPER(TRIM(n_name)) AS n_name_norm FROM nation",
    doc="OP-20 trim/case normalization",
)
def q07(spark: SparkSession, sf: str) -> DataFrame:
    return t(spark, sf, "nation").select(
        "n_nationkey", F.upper(F.trim("n_name")).alias("n_name_norm")
    )


@query(
    "q08_isin_count",
    oracle="SELECT COUNT(*) AS n FROM lineitem WHERE l_linestatus IN ('O')",
    doc="OP-25 set membership + OP-32 count",
)
def q08(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "lineitem")
        .filter(F.col("l_linestatus").isin("O"))
        .agg(F.count(F.lit(1)).alias("n"))
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
    oracle="""SELECT c_custkey FROM customer
              WHERE c_custkey IN (SELECT o_custkey FROM orders)""",
    doc="OP-30 existence semi-join",
)
def q10(spark: SparkSession, sf: str) -> DataFrame:
    c, o = t(spark, sf, "customer"), t(spark, sf, "orders")
    return c.join(
        o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_semi"
    ).select("c_custkey")


@query(
    "q11_anti_join",
    oracle="""SELECT c_custkey FROM customer
              WHERE c_custkey NOT IN
                (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)""",
    doc="OP-30/OP-08 insert-if-absent anti-join",
)
def q11(spark: SparkSession, sf: str) -> DataFrame:
    c, o = t(spark, sf, "customer"), t(spark, sf, "orders")
    return c.join(
        o.filter(F.col("o_custkey").isNotNull()).select(
            F.col("o_custkey").alias("c_custkey")
        ),
        "c_custkey",
        "left_anti",
    ).select("c_custkey")


@query(
    "q12_last_wins",
    oracle="""SELECT l_orderkey, l_shipdate AS last_shipdate FROM lineitem
              QUALIFY ROW_NUMBER() OVER (PARTITION BY l_orderkey
                      ORDER BY l_linenumber DESC, l_shipdate DESC) = 1""",
    doc="OP-31 last-writer-wins dedup. Spark plan: max(struct(ord, val)) — "
        "lexicographic struct max == row_number desc form, but aggregates "
        "with map-side partial combine: shuffle carries one row per key "
        "instead of every row (the window form shuffles + sorts all rows). "
        "Total order (linenumber, shipdate) keeps ties deterministic.",
)
def q12(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max(F.struct("l_linenumber", "l_shipdate")).alias("__m"))
        .select("l_orderkey", F.col("__m.l_shipdate").alias("last_shipdate"))
    )


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


@query("q14_count", oracle="SELECT COUNT(*) AS n FROM lineitem", doc="OP-32")
def q14(spark: SparkSession, sf: str) -> DataFrame:
    return t(spark, sf, "lineitem").agg(F.count(F.lit(1)).alias("n"))


@query(
    "q15_pricing_summary",
    oracle="""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
              ROUND(CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,10))) AS DOUBLE), 2) AS revenue
              FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    doc="OP-33 grouped counts, TPC-H Q1 shape; decimal accumulation for "
        "cross-engine determinism",
)
def q15(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), _dec_sum_round(rev).alias("revenue")
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
    "q18_concat_ws",
    oracle="""SELECT o_orderkey, CONCAT_WS(', ',
                CASE WHEN o_totalprice > 200000 THEN 'big' END,
                CASE WHEN o_orderstatus = 'F' THEN 'final' END) AS notes
              FROM orders""",
    doc="OP-23 notes accumulator: concat_ws skips NULLs in both engines",
)
def q18(spark: SparkSession, sf: str) -> DataFrame:
    return t(spark, sf, "orders").select(
        "o_orderkey",
        F.concat_ws(
            ", ",
            F.when(F.col("o_totalprice") > 200000, "big"),
            F.when(F.col("o_orderstatus") == "F", "final"),
        ).alias("notes"),
    )


@query(
    "q19_regexp_extract",
    oracle="""SELECT event_id, regexp_extract(props, '"k": (\\d+)', 1) AS k_str
              FROM events""",
    doc="OP-22 tag extraction; both engines return '' on no-match",
)
def q19(spark: SparkSession, sf: str) -> DataFrame:
    return t(spark, sf, "events").select(
        "event_id", F.regexp_extract("props", r'"k": (\d+)', 1).alias("k_str")
    )


@query(
    "q20_json_extract",
    oracle="""SELECT event_id, CAST(json_extract(props, '$.k') AS INT) AS k
              FROM events""",
    doc="OP-21 JSON access via get_json_object",
)
def q20(spark: SparkSession, sf: str) -> DataFrame:
    return t(spark, sf, "events").select(
        "event_id", F.get_json_object("props", "$.k").try_cast("int").alias("k")
    )


@query(
    "q21_row_number",
    oracle="""SELECT user_id, event_id,
              ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
              FROM events""",
    doc="window ranking (OP-31 mechanics); single shuffle on user_id",
)
def q21(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return t(spark, sf, "events").select(
        "user_id", "event_id", F.row_number().over(w).cast("bigint").alias("rn")
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
    "q23_topk",
    oracle="""SELECT o_custkey,
              ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS s
              FROM orders GROUP BY o_custkey
              ORDER BY s DESC, o_custkey LIMIT 10""",
    doc="top-k: agg + global order with total tie-break; Spark plans "
        "TakeOrderedAndProject (no full sort materialization)",
)
def q23(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2
            ).alias("s")
        )
        .orderBy(F.col("s").desc(), "o_custkey")
        .limit(10)
    )


@query(
    "q24_intersect",
    oracle="""SELECT n_regionkey FROM nation
              INTERSECT SELECT r_regionkey FROM region""",
    doc="set op",
)
def q24(spark: SparkSession, sf: str) -> DataFrame:
    n, r = t(spark, sf, "nation"), t(spark, sf, "region")
    return n.select("n_regionkey").intersect(
        r.select(F.col("r_regionkey").alias("n_regionkey"))
    )


@query(
    "q25_try_cast",
    oracle="""SELECT event_id,
              TRY_CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INT) AS k
              FROM events""",
    doc="OP-13 try-cast NULL-on-garbage semantics",
)
def q25(spark: SparkSession, sf: str) -> DataFrame:
    return t(spark, sf, "events").select(
        "event_id",
        F.regexp_extract("props", r'"k": (\d+)', 1).try_cast("int").alias("k"),
    )
