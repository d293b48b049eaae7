from __future__ import annotations

import pandas as pd
import pytest

from dude_spark.fixtures import IMAGES_COLUMNS, TRUTH_COLUMNS, generate_pdf
from dude_spark.session import get_spark

N_FIXTURE = 600


@pytest.fixture(scope="session")
def spark():
    s = get_spark("dude_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_pdf() -> pd.DataFrame:
    return generate_pdf(N_FIXTURE)


@pytest.fixture(scope="session")
def images_df(spark, fixture_pdf):
    df = spark.createDataFrame(fixture_pdf[IMAGES_COLUMNS])
    df.persist()
    df.count()
    return df


@pytest.fixture(scope="session")
def truth_pdf(fixture_pdf) -> pd.DataFrame:
    return fixture_pdf[TRUTH_COLUMNS]
