"""Cleaning pipeline: validate + normalize ``tv_channel_games``.

The reference walks the table row-at-a-time
(``cleaning/validate_tv_channel_games.py:166-190``): rows missing required
fields or with an invalid result are DELETEd; the rest are normalized
(elo try-cast, title canonicalization, ECO ``"?"``→NULL, termination
recode), flagged ``ind_validated=true``, stamped, and annotated.

Plan shape: the whole stage is ONE projection over one scan — every rule
is a ``when(needs_fix, normalized).otherwise(original)`` column, so
Catalyst fuses the entire stage into a single whole-stage-codegen pass.
(An earlier union-of-branches formulation re-computed the upstream
subtree once per branch — 4 windows in the plan instead of 1; never
split-and-union what a conditional projection can express.) The
valid/deleted outputs are two filters over the same single-pass plan.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from knightshift_spark.functions.cleaning import (
    VALID_RESULTS,
    VALID_TERMINATIONS,
    canonicalize_termination,
    eco_nullif_unknown,
    is_missing,
    normalize_title,
    safe_int,
    validation_notes,
)

REQUIRED_FIELDS = ("id_user_white", "id_user_black", "val_moves_pgn", "val_result")


class CleanResult(NamedTuple):
    valid: DataFrame
    deleted: DataFrame


def needs_revalidation(df: DataFrame, force: bool = False) -> Column:
    """Revalidation predicate — reference ``validate_tv_channel_games.py:86-95``:
    force, OR not yet validated, OR ``"?"`` in ECO, OR non-canonical
    termination."""
    if force:
        return F.lit(True)
    eco = F.coalesce(F.col("val_opening_eco_code"), F.lit(""))
    term = F.coalesce(F.col("val_termination"), F.lit(""))
    return (
        ~F.coalesce(F.col("ind_validated"), F.lit(False))
        | eco.contains("?")
        | ~term.isin(*VALID_TERMINATIONS)
    )


def _delete_predicate() -> Column:
    """Required fields present and result allowed — rows failing either are
    deleted (reference ``validate_tv_channel_games.py:48-49,65-75,109-114``)."""
    missing_required = None
    for c in REQUIRED_FIELDS:
        m = is_missing(F.col(c))
        missing_required = m if missing_required is None else (missing_required | m)
    bad_result = ~F.col("val_result").isin(*VALID_RESULTS)
    return missing_required | bad_result


def clean_games(
    df: DataFrame, force: bool = False, validated_ts: Column | None = None
) -> CleanResult:
    """Run the full cleaning stage; returns (valid, deleted) DataFrames.

    Notes reproduce the reference's per-rule messages joined with ``", "``
    (default ``"Valid"``, ``validate_tv_channel_games.py:103-155``).
    """
    if validated_ts is None:
        validated_ts = F.current_timestamp()

    fix = needs_revalidation(df, force)
    delete = fix & _delete_predicate()

    def conditional(normalized: Column, original: Column) -> Column:
        return F.when(fix, normalized).otherwise(original)

    elo_w_raw, elo_b_raw = F.col("val_elo_white"), F.col("val_elo_black")
    # elo columns cast unconditionally: keeps the output schema int even
    # when a dirty input carries string elos (idempotent on clean rows)
    elo_w = safe_int(elo_w_raw.cast("string"))
    elo_b = safe_int(elo_b_raw.cast("string"))

    notes = validation_notes(
        F.when(elo_w_raw.isNotNull() & elo_w.isNull(), F.lit("white elo invalid")),
        F.when(elo_b_raw.isNotNull() & elo_b.isNull(), F.lit("black elo invalid")),
        F.when(
            F.trim(F.coalesce(F.col("val_opening_eco_code"), F.lit(""))) == "?",
            F.lit("eco unknown"),
        ),
    )

    cleaned = df.select(
        "id_game",
        "val_event_name",
        "val_site_url",
        "dt_game",
        "id_user_white",
        "id_user_black",
        "val_result",
        "dt_game_utc",
        "tm_game_utc",
        elo_w.alias("val_elo_white"),
        elo_b.alias("val_elo_black"),
        conditional(normalize_title(F.col("val_title_white")), F.col("val_title_white")).alias("val_title_white"),
        conditional(normalize_title(F.col("val_title_black")), F.col("val_title_black")).alias("val_title_black"),
        "val_variant",
        "val_time_control",
        conditional(
            eco_nullif_unknown(F.col("val_opening_eco_code")), F.col("val_opening_eco_code")
        ).alias("val_opening_eco_code"),
        "val_opening_name",
        conditional(
            canonicalize_termination(F.col("val_termination")), F.col("val_termination")
        ).alias("val_termination"),
        "val_moves_pgn",
        "tm_ingested",
        conditional(validated_ts, F.col("tm_validated")).alias("tm_validated"),
        conditional(F.lit(True), F.col("ind_validated")).alias("ind_validated"),
        conditional(notes, F.col("val_validation_notes")).alias("val_validation_notes"),
        "ind_profile_updated",
        delete.alias("__delete"),
    )
    valid = cleaned.filter(~F.col("__delete")).drop("__delete")
    deleted = df.filter(delete)
    return CleanResult(valid=valid, deleted=deleted)
