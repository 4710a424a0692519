import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


@pytest.fixture(scope="session")
def spark():
    from ner_spark.session import get_spark

    s = get_spark(master="local[4]", app_name="ner_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def fixtures_small():
    """Golden fixture dir at the smallest scale (builds once, cached)."""
    from ner_spark.fixtures.build import build_fixtures

    return build_fixtures("sf0.001")
