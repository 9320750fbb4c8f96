"""Data-contract probe for the harness test tables.

Round 4 lost 14 driver queries, 38 tests, and the whole bench to ONE
silent environment change: ``events.parquet`` flipped from
TIMESTAMP(NANOS) to timestamp[us]. This module makes the next such
change a single readable failure naming the table and dtype, instead of
dozens of cryptic AnalysisExceptions downstream.

The contract asserted here is *logical*: column names, value ranges,
and referential sanity. Physical timestamp encoding is deliberately NOT
pinned — the loaders (``sources.tables``) must adapt, and the adapter
itself is exercised against both µs and an in-test nanos fixture.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_dag_spark.sources.tables import (
    TABLES,
    event_ts_encoding,
    load_events,
    read_events_batch,
    with_event_time,
)

from tests.conftest import SF_DIR

# logical contract: column name -> accepted pyarrow type *families*
# ("int" = any integer width, "float" = any float, "ts" = any timestamp
# unit OR int64 nanos, "str" = utf8, "list<float>" = float list)
CONTRACT: dict[str, dict[str, str]] = {
    "region": {"r_regionkey": "int", "r_name": "str"},
    "nation": {"n_nationkey": "int", "n_name": "str", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "int",
        "c_name": "str",
        "c_nationkey": "int",
        "c_acctbal": "float",
        "c_mktsegment": "str",
    },
    "supplier": {
        "s_suppkey": "int",
        "s_name": "str",
        "s_nationkey": "int",
        "s_acctbal": "float",
    },
    "part": {
        "p_partkey": "int",
        "p_name": "str",
        "p_brand": "str",
        "p_type": "str",
        "p_size": "int",
        "p_retailprice": "float",
    },
    "orders": {
        "o_orderkey": "int",
        "o_custkey": "int",
        "o_orderstatus": "str",
        "o_totalprice": "float",
        "o_orderdate": "ts",
        "o_orderpriority": "str",
    },
    "lineitem": {
        "l_orderkey": "int",
        "l_partkey": "int",
        "l_suppkey": "int",
        "l_linenumber": "int",
        "l_quantity": "float",
        "l_extendedprice": "float",
        "l_discount": "float",
        "l_tax": "float",
        "l_returnflag": "str",
        "l_linestatus": "str",
        "l_shipdate": "ts",
    },
    "events": {
        "event_id": "int",
        "ts": "ts",
        "user_id": "int",
        "event_type": "str",
        "value": "float",
        "props": "str",
    },
    "documents": {
        "doc_id": "int",
        "text": "str",
        "lang": "str",
        "source": "str",
        "n_chars": "int",
    },
    "embeddings": {"vec_id": "int", "embedding": "list<float>", "label": "int"},
}


def _family_ok(family: str, t: pa.DataType) -> bool:
    if family == "int":
        return pa.types.is_integer(t)
    if family == "float":
        return pa.types.is_floating(t)
    if family == "str":
        return pa.types.is_string(t) or pa.types.is_large_string(t)
    if family == "ts":
        # any timestamp unit, or raw int64 epoch-nanos (legacy encoding)
        return pa.types.is_timestamp(t) or pa.types.is_int64(t)
    if family == "list<float>":
        return (pa.types.is_list(t) or pa.types.is_large_list(t)) and pa.types.is_floating(
            t.value_type
        )
    raise ValueError(family)


@pytest.mark.parametrize("table", sorted(CONTRACT))
def test_table_matches_logical_contract(table):
    path = os.path.join(SF_DIR, f"{table}.parquet")
    assert os.path.exists(path), f"contract: table {table!r} missing at {path}"
    schema = pq.read_schema(path)
    got = {f.name: f.type for f in schema}
    want = CONTRACT[table]
    assert set(got) == set(want), (
        f"contract: {table} columns drifted — expected {sorted(want)}, "
        f"found {sorted(got)}"
    )
    for col, family in want.items():
        assert _family_ok(family, got[col]), (
            f"contract: {table}.{col} has physical type {got[col]} which is "
            f"outside the accepted {family!r} family"
        )


def test_table_list_is_exactly_the_loader_registry():
    assert set(CONTRACT) == set(TABLES)


def test_events_value_ranges(spark):
    """Logical value contract for events, independent of ts encoding:
    timestamps in a sane epoch window, keys non-negative, known event
    vocabulary non-empty."""
    e = load_events(spark, SF_DIR)
    row = e.selectExpr(
        "min(ts_ns) AS lo",
        "max(ts_ns) AS hi",
        "min(event_id) AS id_lo",
        "min(user_id) AS uid_lo",
        "count(*) AS n",
        "count(DISTINCT event_type) AS n_types",
    ).first()
    y2000 = 946_684_800 * 10**9
    y2100 = 4_102_444_800 * 10**9
    assert row.n > 0
    assert y2000 < row.lo <= row.hi < y2100, (
        f"contract: events.ts_ns range [{row.lo}, {row.hi}] outside "
        "the 2000-2100 epoch-nanos window — wrong unit conversion?"
    )
    assert row.id_lo >= 0 and row.uid_lo >= 0
    assert row.n_types >= 2


@pytest.fixture(scope="module")
def nanos_events(spark, tmp_path_factory):
    """A tiny TIMESTAMP(NANOS)-encoded twin of the events table — the
    legacy physical encoding rounds 1-3 shipped — written with pyarrow
    so the legacy branch stays covered whatever the harness writes."""
    out = str(tmp_path_factory.mktemp("nanos") / "events.parquet")
    base = 1_704_067_200_000_000_000  # 2024-01-01 UTC in ns
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(
                [base, base + 1_500_000_000, base + 3_600_000_000_000],
                pa.timestamp("ns"),
            ),
            "user_id": pa.array([10, 10, 11], pa.int64()),
            "event_type": pa.array(["click", "purchase", "click"]),
            "value": pa.array([1.0, 2.5, None], pa.float64()),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    pq.write_table(t, out, store_schema=False)
    return out


def test_encoding_sniffer(nanos_events):
    assert event_ts_encoding(os.path.join(SF_DIR, "events.parquet")) in (
        "us",
        "ms",
        "ns",
        "i64",
    )
    assert event_ts_encoding(nanos_events) == "ns"


def test_loader_adapts_to_nanos_and_current_encoding(spark, nanos_events):
    """read_events_batch yields identical ts_ns/ts_utc semantics for the
    legacy nanos encoding and whatever the harness currently writes."""
    legacy = read_events_batch(spark, nanos_events)
    rows = {r["event_id"]: (r["ts_ns"], str(r["ts_utc"])) for r in legacy.collect()}
    base = 1_704_067_200_000_000_000
    assert rows[1] == (base, "2024-01-01 00:00:00")
    assert rows[2] == (base + 1_500_000_000, "2024-01-01 00:00:01.500000")
    assert rows[3] == (base + 3_600_000_000_000, "2024-01-01 01:00:00")
    # current harness encoding: same two derived columns, same types
    current = load_events(spark, SF_DIR)
    want_types = {"ts_ns": "bigint", "ts_utc": "timestamp_ntz"}
    for df, label in ((legacy, "nanos"), (current, "harness")):
        got = {k: v for k, v in df.dtypes if k in want_types}
        assert got == want_types, f"{label}: derived event-time types drifted: {got}"


def test_with_event_time_rejects_unknown_type(spark):
    df = spark.createDataFrame([("x",)], "ts string")
    with pytest.raises(TypeError, match="unsupported Spark type"):
        with_event_time(df)
