"""win_sessionize tie-break regression (r6 verdict nit #3).

With duplicate (user_id, ts) rows straddling a session boundary, the
cumulative-sum window must tie-break on event_id in BOTH engines —
otherwise max_session_events depends on the engines' internal tie order.

Fixture, ordered by (ts, event_id): 10:00 eid=5 | 11:00 eid=2, 11:00
eid=3 | 11:10 eid=1. The flag window (already tie-broken) marks eid=2 as
the session opener (gap 3600s from 10:00) and eid=3 as a continuation
(gap 0). Under the correct (ts, event_id) cum-sum order the sessions are
{5} and {2,3,1} → max 3; a cum-sum that happens to order eid=3 before
eid=2 yields {5,3} and {2,1} → max 2. So a tie-order divergence between
Spark and DuckDB flips the answer, and this test pins it.
"""

from datetime import datetime

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_for_dumdums_spark.catalog import ORACLE, QUERIES, load_all

load_all()
from tests.oracle_util import assert_matches_duckdb


@pytest.fixture(scope="module")
def tie_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sessionize_ties")
    ts = [
        datetime(2024, 1, 1, 10, 0, 0),
        datetime(2024, 1, 1, 11, 0, 0),
        datetime(2024, 1, 1, 11, 0, 0),
        datetime(2024, 1, 1, 11, 10, 0),
    ]
    pdf = pd.DataFrame(
        {
            # event_ids deliberately not in timestamp order at the tie
            "event_id": [5, 2, 3, 1],
            "ts": pd.to_datetime(ts),
            "user_id": [7, 7, 7, 7],
            "event_type": ["view"] * 4,
            "value": [1.0] * 4,
            "props": ["{}"] * 4,
        }
    )
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), d / "events.parquet")
    return str(d)


def test_sessionize_tie_stable_vs_oracle(spark, tie_dir):
    sdf = QUERIES["win_sessionize"](spark, tie_dir)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tie_dir}/events.parquet')"
    )
    assert_matches_duckdb(sdf, con, ORACLE["win_sessionize"])
    row = sdf.collect()[0]
    assert row.n_users == 1
    assert row.n_sessions == 2
    assert row.max_session_events == 3  # {2,3,1}, only under the tie-break
