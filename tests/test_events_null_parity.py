"""Events-derived NULL-parity sweep (r11, r10 verdict ask #5): every
oracle query that reads the events table must degrade IDENTICALLY on
NULL user_id / NULL ts / NULL props / NULL value / NULL event_type on
both engines. The synthetic events table carries no NULLs, so an
over-broad coalesce, a fold seed, or a count-vs-count(col) drift in
either engine's expression sits latent until real data hits it — the
r9 advice #1 fix (NULL user_id silently shrinking approx_distinct_users'
exact leg) showed the class is real for events-derived queries and was
guarded by only one bespoke test. This sweep is the documents-side
test_nulltext_parity contract applied to the events surface: the
query list is AUTO-INCLUDED from the registry (any oracle whose SQL
references the events view), so a new events query gets the gate for
free.

The fixture swaps ONLY events.parquet for a NULL-bearing feed;
every other table symlinks to the real corpus, so joiners
(events_salted_enrich, creds_lookup_join, the CDC feeds) run their
full plan.
"""

from __future__ import annotations

import datetime
import os
import re

import duckdb
import pytest

from postgres_cdc_plugin_spark import registry
from postgres_cdc_plugin_spark.session import table_path

from .conftest import SF_SMALL, TABLES, assert_parity

QUERIES = registry.queries()
ORACLES = registry.oracle_sql()

# Auto-included surface: every oracle query whose SQL reads the events
# view. Word-boundary match so a column or CTE merely named
# "...events..." elsewhere can't leak in.
EVENTS_NAMES = sorted(
    n for n, sql in ORACLES.items() if re.search(r"\bevents\b", sql)
)


def test_sweep_covers_the_events_surface():
    """The auto-inclusion must actually catch the events families —
    a regex drift that silently empties the sweep would turn this file
    into a no-op (the completeness contract the non-ASCII gate pins
    for documents)."""
    assert {
        "approx_distinct_users",
        "events_sessionize",
        "events_funnel",
        "events_dau_wau_mau",
        "props_json_extract",
        "queue_state_machine",
        "status_counts",
        "user_activity_window",
        "cdc_envelope",
    } <= set(EVENTS_NAMES)
    assert len(EVENTS_NAMES) >= 40


_ET = ["signup", "view", "click", "purchase", "error"]


@pytest.fixture(scope="session")
def nullevents_dir(spark, tmp_path_factory):
    """Events feed with one NULL per column class plus an all-NULL
    payload row, over a 30-row structured backbone (3 users x 10
    events cycling the real event types with monotone timestamps, so
    sessions/funnels/windows still produce rows). Every other table
    symlinks to the real corpus."""
    d = tmp_path_factory.mktemp("nullevents_sf")
    ts0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in (1, 2, 3):
        for i in range(10):
            rows.append(
                (
                    eid,
                    ts0 + datetime.timedelta(hours=3 * i + u, minutes=7 * u),
                    u,
                    _ET[i % 5],
                    float(i) + 0.25,
                    '{"k": %d}' % i,
                )
            )
            eid += 1
    day2 = ts0 + datetime.timedelta(days=2)
    rows += [
        # NULL user_id — the r9 advice #1 class
        (eid + 0, day2, None, "click", 5.5, '{"k": 1}'),
        # NULL props — every json_extract path
        (eid + 1, day2 + datetime.timedelta(hours=1), 1, "view", 3.25, None),
        # NULL ts — windows, sessions, tumbling/sliding buckets
        (eid + 2, None, 2, "purchase", 7.5, '{"k": 2}'),
        # NULL value — sums/avgs/histograms
        (eid + 3, day2 + datetime.timedelta(hours=2), 3, "click", None, '{"k": 3}'),
        # NULL event_type — funnels, state machines, type rollups
        (eid + 4, day2 + datetime.timedelta(hours=3), 1, None, 2.0, '{"k": 4}'),
        # all-NULL payload: only the event_id survives
        (eid + 5, None, None, None, None, None),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(os.path.join(str(d), "events.parquet"))
    for t in TABLES:
        if t != "events":
            os.symlink(table_path(SF_SMALL, t), table_path(str(d), t))
    return str(d)


@pytest.fixture(scope="session")
def nullevents_duck(nullevents_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{table_path(nullevents_dir, t)}"
            + ("/*.parquet')" if t == "events" else "')")
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", EVENTS_NAMES)
def test_nullevents_parity(name, spark, nullevents_dir, nullevents_duck):
    assert_parity(
        QUERIES[name](spark, nullevents_dir),
        nullevents_duck.sql(ORACLES[name]),
        f"nullevents:{name}",
    )
