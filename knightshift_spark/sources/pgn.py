"""PGN text source: line stream → sessionized game blocks → header map.

Reference semantics (SURVEY.md §2.1-2.2):

- A game block is a run of ``[Key "Value"]`` header lines terminated by a
  move line starting with ``"1. "`` (reference
  ``ingestion/get_games_from_tv.py:196-199``).
- Header parse: ``[Key "Value"]`` → (lower(key), value); split on first
  space, strip brackets/quotes (reference ``utils/pgn_parser.py:33-36``);
  non-header lines joined with a space into ``moves``
  (``pgn_parser.py:42``).
- Blocks without a ``site`` header are dropped
  (``get_games_from_tv.py:208-209``).

Spark plan: one window (partitioned by source file, ordered by line
number) assigns ``game_seq`` = number of *preceding* move lines; one
groupBy assembles each block. Both are a single shuffle keyed by
(src, game_seq); at 100 TB the PGN corpus is many files, so ``src``
gives natural parallelism and no global ordering is ever required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

HEADER_RE = r'^\[(\w+)\s+"(.*)"\]\s*$'
MOVE_PREFIX = "1. "


def lines_from_blobs(blobs: DataFrame) -> DataFrame:
    """``(src, blob)`` whole-file text → ``(line, src, line_no)`` rows.

    ``posexplode(split(...))`` derives the line number from the file
    content itself, so ordering is exact by construction — no dependence
    on task/partition enumeration order. Handles \\r\\n and lone \\r.
    """
    unified = F.regexp_replace(F.regexp_replace("blob", "\r\n", "\n"), "\r", "\n")
    # drop the conventional trailing newline so line counting matches a
    # line-mode reader (no phantom empty last line)
    normalized = F.regexp_replace(unified, "\n$", "")
    return blobs.select(
        "src", F.posexplode(F.split(normalized, "\n")).alias("idx", "line")
    ).select("line", (F.col("idx") + F.lit(1)).alias("line_no"), "src")


def read_pgn_lines(spark: SparkSession, path: str) -> DataFrame:
    """Batch-read PGN dump files as ordered lines with provenance.

    Reads ``wholetext`` (one record per file) and splits lines with an
    explicit ``posexplode`` index: line numbers come from the file bytes,
    not from task ordering, so a file can never get scrambled headers —
    the previous ``monotonically_increasing_id``-ordered form assumed
    partition index follows file-split offset, which is undocumented
    behavior and a silent-corruption risk for files larger than one split.

    Writer-side contract (documented invariant): spool/dump files are
    bounded (the reference's poll loop emits ~MAX_GAMES games per fetch,
    ``get_games_from_tv.py:60-61``); at 100 TB the corpus is MANY bounded
    files, so per-file atomicity costs nothing and files parse in
    parallel. Archive dumps too big for one executor's memory should be
    pre-split at game boundaries before landing in the spool.
    """
    df = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("src"), F.col("value").alias("blob")
    )
    return lines_from_blobs(df)


def lines_from_text(spark: SparkSession, text: str, src: str = "inline") -> DataFrame:
    """Build the same shape from an in-memory PGN string (tests/fixtures).

    Built as a true JVM ``LocalTableScan`` (``plans.localrel``): the
    list-based ``createDataFrame`` lands as a Python RDD whose
    ``defaultParallelism`` worker tasks re-run on EVERY action over the
    pipeline (r14 measurement: ~7 CPU-s per execution of the q28 plan at
    ``local[32]`` for a 40-line fixture).
    """
    from knightshift_spark.plans.localrel import local_relation

    rows = [(ln, i + 1, src) for i, ln in enumerate(text.splitlines())]
    return local_relation(spark, rows, "line string, line_no long, src string")


def sessionize(lines: DataFrame) -> DataFrame:
    """Assign ``game_seq``: running count of move lines *before* each line
    (reference boundary rule ``get_games_from_tv.py:196-199`` — the move
    line closes the block, so it belongs to the block it terminates)."""
    is_move = F.when(F.col("line").startswith(MOVE_PREFIX), F.lit(1)).otherwise(F.lit(0))
    w = (
        Window.partitionBy("src")
        .orderBy("line_no")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return lines.withColumn("game_seq", F.coalesce(F.sum(is_move).over(w), F.lit(0)))


def assemble_games(lines_with_seq: DataFrame) -> DataFrame:
    """Group each block into one row: ``headers`` map + ``moves`` string.

    Header keys are lower-cased (``pgn_parser.py:34``); duplicate keys
    last-win (session conf ``spark.sql.mapKeyDedupPolicy=LAST_WIN``).
    Non-header, non-blank lines become ``moves`` joined by one space in
    line order (``pgn_parser.py:38-42``).
    """
    key = F.regexp_extract("line", HEADER_RE, 1)
    val = F.regexp_extract("line", HEADER_RE, 2)
    is_header = F.col("line").rlike(HEADER_RE)
    tagged = lines_with_seq.select(
        "src",
        "game_seq",
        "line_no",
        # headers carry line_no so last-wins is deterministic: collect_list
        # order after a shuffle is NOT guaranteed, so sort by line number
        # before building the map (struct sort is lexicographic → n first)
        F.when(
            is_header,
            F.struct(
                F.col("line_no").alias("n"),
                F.lower(key).alias("key"),
                val.alias("value"),
            ),
        ).alias("hdr"),
        F.when(~is_header & (F.trim("line") != ""), F.struct(F.col("line_no").alias("n"), F.col("line").alias("l"))).alias("mv"),
    )
    grouped = tagged.groupBy("src", "game_seq").agg(
        F.array_sort(F.collect_list("hdr")).alias("_hdrs"),
        F.array_sort(F.collect_list("mv")).alias("_mvs"),
    )
    headers = F.map_from_entries(
        F.transform("_hdrs", lambda s: F.struct(s["key"].alias("key"), s["value"].alias("value")))
    )
    return grouped.select(
        "src",
        "game_seq",
        headers.alias("headers"),
        F.concat_ws(" ", F.transform("_mvs", lambda s: s["l"])).alias("moves"),
    ).filter(F.map_contains_key("headers", F.lit("site")))
