"""Watermark advisor (r14, VERDICT r13 #7): the r13 lateness profile
composed into a recommended ``withWatermark`` delay, and the gate that
every §2e streaming query's CONFIGURED watermark covers the harness
feed's observed disorder — a watermark shorter than the lateness tail
silently drops rows, so this pin is what makes the defaults honest."""

from __future__ import annotations

import inspect
import re

import pytest

from tests.conftest import SF_DIR

from etl_dag_spark.streaming.quality import (
    recommend_watermark,
    recommend_watermark_us,
)


def _profile(spark):
    from etl_dag_spark.queries import SPARK_QUERIES

    return SPARK_QUERIES["stream_lateness_profile"](spark, SF_DIR)


def _interval_seconds(s: str) -> int:
    m = re.match(r"^\s*(\d+)\s+(second|minute|hour)s?\s*$", s)
    assert m, f"unparsed interval {s!r}"
    return int(m.group(1)) * {"second": 1, "minute": 60, "hour": 3600}[
        m.group(2)
    ]


def test_recommendation_classes_on_constructed_profiles(spark):
    def prof(rows):
        return spark.createDataFrame(
            rows, "lateness_class string, n_events bigint, max_lateness_us bigint"
        )

    # perfectly ordered feed → no delay needed
    assert recommend_watermark_us(prof([("0", 100, 0)])) == 0
    assert recommend_watermark(prof([("0", 100, 0)])) == "0 seconds"
    # 2% of events up to 10m late, 99% coverage → the 10m class bound
    p = prof([("0", 98, 0), ("<=10m", 2, 400_000_000)])
    assert recommend_watermark_us(p, coverage=0.99) == 600_000_000
    assert recommend_watermark(p, coverage=0.99) == "10 minutes"
    # lowering required coverage lowers the recommendation
    assert recommend_watermark_us(p, coverage=0.98) == 0
    # a tail beyond 1h: cover the observed max, rounded up to a minute
    p = prof([("0", 50, 0), (">1h", 50, 3_660_000_001)])
    assert recommend_watermark_us(p, coverage=0.99) == 3_720_000_000
    assert recommend_watermark(p, coverage=0.99) == "62 minutes"


def test_configured_streaming_watermarks_cover_the_harness_feed(spark):
    """THE gate: every §2e streaming query's default watermark must be
    at least the advisor's recommendation on the harness feed at 99%
    coverage (and the feed's observed max lateness must not exceed any
    default — the stricter full-coverage check, since the defaults were
    chosen from this very profile)."""
    from etl_dag_spark.streaming import events as ev
    from etl_dag_spark.streaming import stateful as st

    profile = _profile(spark)
    rec_us = recommend_watermark_us(profile, coverage=0.99)

    configured = {}
    for mod, fns in (
        (ev, ["windowed_counts", "session_counts", "dedup_stream",
              "click_purchase_join"]),
        (st, ["closed_user_sessions"]),
    ):
        for fn in fns:
            sig = inspect.signature(getattr(mod, fn))
            configured[f"{mod.__name__}.{fn}"] = _interval_seconds(
                sig.parameters["watermark"].default
            )
    assert configured, "no streaming watermark defaults found"
    for name, secs in configured.items():
        assert secs * 1_000_000 >= rec_us, (
            f"{name} watermark {secs}s < recommended {rec_us/1e6}s "
            "on the harness feed — late rows would drop silently"
        )
    # full-coverage form: nothing in the observed feed is later than
    # any configured default
    max_late = max(
        r["max_lateness_us"] for r in profile.collect()
    )
    assert max_late <= min(configured.values()) * 1_000_000
