import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from metasra_pipeline_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("metasra-tests", cores=os.environ.get("SPARK_GRAFT_CPUS", "8"),
                  shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def refdata(spark):
    from metasra_pipeline_spark.refdata import load_refdata
    return load_refdata(spark)
