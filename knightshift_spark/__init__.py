"""knightshift_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the data/query capabilities of
the reference pipeline (moveeleven-data/knightshift): PGN ingestion,
validation/cleaning, enrichment, keyed upsert/merge — plus the large-scale
training-data operators (dedup, similarity search, text analysis,
multimodal plumbing) a 100 TB pipeline needs.

Everything is declarative DataFrame/SQL so Catalyst handles pushdown,
pruning, join strategy, and AQE handles skew/coalesce at cluster scale.
"""

from knightshift_spark.session import get_spark, tune_session

__all__ = ["get_spark", "tune_session"]
__version__ = "0.1.0"
