"""Stage logging — engine twin of the reference's ``logging_utils.py``
(timestamped stage banners + per-stage counters, reference
``utils/logging_utils.py`` and ``main.py:_stage``).

Spark already logs task-level detail; this layer gives the operator-level
narrative the reference prints: stage start/stop, wall time, row counters.
"""

from __future__ import annotations

import logging
import time
from contextlib import contextmanager

logger = logging.getLogger("knightshift_spark")
if not logger.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(
        logging.Formatter("%(asctime)s [%(levelname)s] %(name)s: %(message)s")
    )
    logger.addHandler(_h)
    logger.setLevel(logging.INFO)


@contextmanager
def stage(name: str):
    """``with stage("TV Game Ingestion"): ...`` — banner + wall time,
    mirroring ``main.py:62-65``'s ``_stage`` wrapper."""
    logger.info("=== stage start: %s ===", name)
    t0 = time.perf_counter()
    try:
        yield
    except Exception:
        logger.exception("stage FAILED: %s (%.2fs)", name, time.perf_counter() - t0)
        raise
    logger.info("=== stage done: %s (%.2fs) ===", name, time.perf_counter() - t0)


def log_counts(**counts: int) -> None:
    """Batch counters (OP-33) in one structured line."""
    logger.info("counters: %s", ", ".join(f"{k}={v}" for k, v in counts.items()))
