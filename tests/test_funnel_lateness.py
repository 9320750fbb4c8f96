"""Constructed-data semantics pins for the r13 event operators:
olap_window_funnel (ClickHouse windowFunnel parity) and
stream_lateness_profile (watermark-planning disorder profile)."""

from __future__ import annotations

import datetime

from etl_dag_spark.queries import SPARK_QUERIES

from tests.conftest import SF_DIR


def test_window_funnel_levels_on_crafted_events(spark, tmp_path):
    """The 24h window binds, ordering is strict, a later signup
    re-anchors the window, and non-signup users are invisible."""
    t0 = datetime.datetime(2025, 1, 1)
    h = datetime.timedelta(hours=1)
    rows = [
        # user 1: full conversion inside 24h → level 3
        (1, t0, 1, "signup"), (2, t0 + h, 1, "view"),
        (3, t0 + 2 * h, 1, "purchase"),
        # user 2: purchase 25h after signup → window binds, level 2
        (4, t0, 2, "signup"), (5, t0 + h, 2, "view"),
        (6, t0 + 25 * h, 2, "purchase"),
        # user 3: view BEFORE signup, purchase without a view → level 1
        (7, t0 + h, 3, "signup"), (8, t0, 3, "view"),
        (9, t0 + 2 * h, 3, "purchase"),
        # user 4: first signup's window misses, a SECOND signup
        # re-anchors it → level 3 (exists-over-all-anchors semantics)
        (10, t0, 4, "signup"), (11, t0 + 30 * h, 4, "signup"),
        (12, t0 + 31 * h, 4, "view"), (13, t0 + 32 * h, 4, "purchase"),
        # user 5: never signed up → counted at no level
        (14, t0, 5, "view"), (15, t0 + h, 5, "purchase"),
    ]
    df = spark.createDataFrame(
        [(i, ts, u, et, 1.0, "{}") for i, ts, u, et in rows],
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string",
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    got = {
        r.level: r.n_users
        for r in SPARK_QUERIES["olap_window_funnel"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 2}


def test_lateness_profile_partitions_the_feed(spark):
    """Invariants on the real table: the classes partition every
    event, the zero class is exactly lateness 0, class maxima respect
    their bucket bounds, and the profile is deterministic."""
    from etl_dag_spark.sources.tables import load_events

    prof = {
        r.lateness_class: (r.n_events, r.max_lateness_us)
        for r in SPARK_QUERIES["stream_lateness_profile"](
            spark, SF_DIR
        ).collect()
    }
    total = load_events(spark, SF_DIR).count()
    assert sum(n for n, _ in prof.values()) == total
    bounds = {
        "0": 0,
        "<=1m": 60_000_000,
        "<=10m": 600_000_000,
        "<=1h": 3_600_000_000,
    }
    for cls, (n, mx) in prof.items():
        assert n > 0
        if cls in bounds:
            assert mx <= bounds[cls]
    # hour-bucketed shuffle bounds lateness strictly under one hour
    assert ">1h" not in prof
    # deterministic: a second evaluation is identical
    again = {
        r.lateness_class: (r.n_events, r.max_lateness_us)
        for r in SPARK_QUERIES["stream_lateness_profile"](
            spark, SF_DIR
        ).collect()
    }
    assert again == prof
