from __future__ import annotations

import os
import sys

import pytest
from hypothesis import settings as _hyp_settings

# Property failures must reproduce across runs (a randomized 10-example
# property once shipped red by seed luck); per-test @settings can still
# override knobs, but the registered profile makes the default deterministic.
_hyp_settings.register_profile("repo", derandomize=True)
_hyp_settings.load_profile("repo")

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

# Spark's Python workers must import test modules too (functions passed to
# mapInPandas pickle by reference); local-mode workers inherit this env.
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in (os.path.join(_REPO, "tests"), _REPO, os.environ.get("PYTHONPATH")) if p
)

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "4")  # tiny data → tiny shuffles

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from knightshift_spark.session import get_spark

    s = get_spark("tests")
    yield s
    s.stop()
