import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cpg_spark import synth  # noqa: E402
from cpg_spark.schema import ALIAS_DICT, PAGES  # noqa: E402
from cpg_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("cpg-spark-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def corpus():
    return synth.make_corpus(40)


@pytest.fixture(scope="session")
def pages_df(spark, corpus):
    return spark.createDataFrame(corpus["pages"], PAGES).cache()


@pytest.fixture(scope="session")
def alias_df(spark, corpus):
    return spark.createDataFrame(corpus["alias_dict"], ALIAS_DICT).cache()
