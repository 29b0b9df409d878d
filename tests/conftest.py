import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parser_rdf_spark.session import build_session  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="parser-rdf-spark-tests",
        master=os.environ.get("SPARK_GRAFT_TEST_MASTER", "local[4]"),
        shuffle_partitions=4,
    )
    yield s
    s.stop()


def pages_df(spark, docs: dict[str, str]):
    """Build a pages DataFrame from {url: text} fixture docs."""
    from datetime import datetime, timezone

    from parser_rdf_spark.schemas import PAGES

    rows = [
        (url, datetime(2026, 1, 1, tzinfo=timezone.utc), None, text, "en")
        for url, text in docs.items()
    ]
    return spark.createDataFrame(rows, schema=PAGES)
