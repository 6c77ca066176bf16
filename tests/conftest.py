import sys

sys.path.insert(0, "/root/repo")

import pytest

from ftm_lakehouse_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture()
def lake_root(tmp_path):
    return str(tmp_path / "lake")
