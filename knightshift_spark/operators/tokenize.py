"""Tokenizer-seam operators: token counting over any ``Tokenizer``.

Two execution paths, chosen by what the tokenizer provides (see
``knightshift_spark.seams``):

- JVM path: the tokenizer supplies ``count_expr`` → a pure codegen
  projection, zero Python in the job (the default regex tokenizer).
- Arrow path: only ``encode`` → ``mapInPandas`` batches texts through
  Python. This is the seam a real BPE/SentencePiece model plugs into;
  vectorized Arrow transfer, never row-at-a-time pickling.

Either way the output contract is identical: ``(id_col, n_tokens)`` with
``n_tokens`` BIGINT — pipeline code cannot tell which path ran.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from knightshift_spark.seams import RegexSubwordTokenizer


def subtoken_count(
    docs: DataFrame,
    tokenizer=None,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "n_subtokens",
) -> DataFrame:
    """(id, token count) under ``tokenizer`` (default: the regex-BPE
    stand-in). Dispatches to the JVM expression when the tokenizer offers
    one; otherwise runs the Arrow-batched Python path."""
    tokenizer = tokenizer if tokenizer is not None else RegexSubwordTokenizer()
    if hasattr(tokenizer, "count_expr"):
        return docs.select(
            id_col, tokenizer.count_expr(F.col(text_col)).alias(out_col)
        )

    out_schema = f"{id_col} bigint, {out_col} bigint"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    out_col: pdf[text_col].map(
                        lambda s: len(tokenizer.encode(s))
                    ).astype("int64"),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(run, schema=out_schema)
