from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


@pytest.fixture(scope="session")
def spark():
    from mimirsbrunn_spark.session import get_spark

    s = get_spark(app_name="mimirsbrunn_spark_tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def fixtures_dir(tmp_path_factory, spark):
    from mimirsbrunn_spark.datagen import write_fixtures

    out = tmp_path_factory.mktemp("fixtures")
    write_fixtures(str(out), n_docs=400, n_addresses=400, n_streets=120, n_pois=120,
                   n_stops=80, spark=spark)
    return str(out)
