import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scrappy_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("scrappy-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def md5_hash60(s) -> int:
    """The engine's hash60 primitive (conv(substr(md5,1,15),16,10)),
    reimplemented once for tests that verify hash-derived placement."""
    import hashlib

    return int(hashlib.md5(str(s).encode()).hexdigest()[:15], 16)
