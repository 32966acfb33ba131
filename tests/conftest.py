import pytest

from nama_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("nama_spark_tests", cores="*", shuffle_partitions=8)
    yield s


def md_from_rows(spark, rows):
    """rows: [(string, count, group)] → MatchData"""
    from nama_spark.operators.matchdata import MatchData

    df = spark.createDataFrame(rows, ["string", "count", "group"])
    return MatchData(df)
