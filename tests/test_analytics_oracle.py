"""Oracle-compare every analytics query at sf0.001 (fast) — the same
check the driver runs at sf0.01."""

import pytest

from near_event_streams_spark.plans.analytics import ORACLE_SQL, QUERIES
from tests.conftest import SF_DIR
from tests.oracle import compare, duck_connection


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    df = QUERIES[name](spark, SF_DIR)
    if name in ORACLE_SQL:
        compare(df, duck, ORACLE_SQL[name], name=name)
    else:
        # rows-only entries (approximate ops) must at least run
        assert df.count() >= 0
