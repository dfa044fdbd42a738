from __future__ import annotations

import os
import sys

import pytest

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
