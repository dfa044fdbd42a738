"""Deterministic sampling / mixture weighting for corpus building.

A training-data pipeline samples per-domain ("20% web, 40% code, ...")
and must be REPRODUCIBLE: re-running the job, or running it on another
engine, must select the same rows. ``rand()`` gives neither, so selection
here is a pure function of the row key — the portable md5-derived 32-bit
hash (``operators.dedup.stable_hash32``), the same family the dedup
oracles use.

Scale shape: selection is a filter over the scan (zero shuffles); the
per-stratum fraction arrives by broadcast join against a tiny weights
relation, so the corpus side never repartitions. Changing ``salt``
re-draws an independent sample (e.g. per epoch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from knightshift_spark.operators.dedup import stable_hash32

# hash buckets for the keep-threshold; 2^20 gives ~1e-6 fraction granularity
_BUCKETS = 1 << 20


def bucket_of(key: str, salt_col) -> "F.Column":
    """md5 keep-bucket of (key, salt) where the salt is a COLUMN suffix —
    the one formula every deterministic sampler here derives from (also
    reused by ``operators.mixture`` for per-epoch fractional draws, so
    the two can never drift)."""
    return stable_hash32(F.concat(F.col(key).cast("string"), salt_col)) % _BUCKETS


def _bucket(key, salt: str):
    return bucket_of(key, F.lit(f"|{salt}"))


def hash_sample(
    df: DataFrame, fraction: float, key_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose key-hash bucket
    falls below ``fraction`` of the bucket space. Same rows every run,
    every engine; disjoint salts give independent draws."""
    return df.filter(_bucket(key_col, salt) < int(fraction * _BUCKETS))


def deterministic_shuffle(
    df: DataFrame, key_col: str = "doc_id", salt: str = "", n_partitions: int | None = None
) -> DataFrame:
    """Reproducible global shuffle for training order: rows sort by the
    md5 bucket of (key, salt) — same permutation every run and every
    engine; a new ``salt`` (e.g. the epoch number) gives an independent
    permutation.

    Scale shape: one range-exchange on the hash key then a partition-local
    sort — Spark's normal distributed sort, nothing driver-side.  Written
    out partition-by-partition the global order is the concatenation of
    partition files in partition order (standard sorted-write contract).
    The key itself tie-breaks hash collisions so the order is total."""
    shuffled = df.withColumn("__shuffle_key", _bucket(key_col, salt))
    if n_partitions:
        shuffled = shuffled.repartitionByRange(
            n_partitions, "__shuffle_key", key_col
        ).sortWithinPartitions("__shuffle_key", key_col)
    else:
        shuffled = shuffled.orderBy("__shuffle_key", key_col)
    return shuffled.drop("__shuffle_key")


def cap_per_group(
    df: DataFrame,
    n_max: int,
    group_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Keep at most ``n_max`` rows per group, chosen deterministically —
    the domain-quota step of corpus assembly (cap any one site/source
    from dominating the mixture).  Selection order inside a group is the
    same salted hash as ``hash_sample``, so re-runs keep identical rows
    and a different salt redraws the quota.

    One hash-shuffle on the group column (the window); skewed giant
    groups are exactly the rows this operator discards, and the rank
    window evaluates streaming per group — no group materializes in
    memory."""
    w = Window.partitionBy(group_col).orderBy(_bucket(key_col, salt), key_col)
    return (
        df.withColumn("__qrank", F.row_number().over(w))
        .filter(F.col("__qrank") <= n_max)
        .drop("__qrank")
    )


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the mixture-weighting step of
    corpus assembly. ``fractions`` maps stratum value → keep fraction;
    strata absent from the map keep ``default_fraction`` (0.0 = drop).

    The fractions ride in as a broadcast relation, so the plan is
    scan → broadcast-hash-join → filter: no shuffle of the corpus side,
    which is what lets this run as a pass-through stage at 100 TB.
    """
    from knightshift_spark.plans.localrel import local_relation

    spark = df.sparkSession
    weights = local_relation(
        spark,
        [(k, int(v * _BUCKETS)) for k, v in fractions.items()],
        f"{strata_col} string, __keep_below int",
    )
    return (
        df.join(F.broadcast(weights), strata_col, "left")
        .withColumn(
            "__keep_below",
            F.coalesce("__keep_below", F.lit(int(default_fraction * _BUCKETS))),
        )
        .filter(_bucket(key_col, salt) < F.col("__keep_below"))
        .drop("__keep_below")
    )


def split_corpus(
    df: DataFrame,
    fractions: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic disjoint train/val/test (or any named) split.

    Each row lands in exactly one split: its key-hash bucket falls into
    one of the consecutive bucket ranges sized by ``fractions`` (dict
    order — insertion-ordered, so write the dict in the order you want
    the ranges carved). Fractions must sum to 1 (±1e-9): a corpus split
    must be a PARTITION — silently dropping the remainder is how eval
    rows leak or vanish. Same row → same split on every run and engine
    (md5-keyed, like every sampler here); a different ``salt`` re-deals.

    Zero shuffles: the split is a projected label over the scan. Write
    with ``partitionBy(out_col)`` to get split-pruned reads downstream.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(
            f"split fractions must sum to 1 exactly, got {total!r} "
            f"({fractions!r}) — a split is a partition, not a sample"
        )
    if any(f < 0 for f in fractions.values()):
        raise ValueError(f"negative split fraction in {fractions!r}")
    b = _bucket(key_col, salt)
    expr = None
    edge = 0.0
    names = list(fractions)
    for name in names[:-1]:
        edge += fractions[name]
        cond = b < int(edge * _BUCKETS)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    # the last split takes everything remaining — no row can fall through
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(names[-1])
    return df.withColumn(out_col, expr)
