"""DAG orchestrator (plans/dag.py) — the Spark-native replacement for
the reference's Airflow surface (ETL_DAG.py:241-277): dependency
ordering, retries, context passing, cycle/missing-dep failure."""

from __future__ import annotations

import graphlib

import pytest

from etl_dag_spark.plans.dag import DAG, Task


def test_runs_in_dependency_order_and_passes_context():
    dag = DAG("etl")
    order: list[str] = []

    @dag.task("load_env_vars")
    def load_env(ctx):
        order.append("load_env_vars")
        return {"sf": 0.001}

    @dag.task("validate_files", deps=("load_env_vars",))
    def validate(ctx):
        order.append("validate_files")
        assert ctx["load_env_vars"] == {"sf": 0.001}
        return "ok"

    @dag.task("load_data", deps=("validate_files",))
    def load(ctx):
        order.append("load_data")
        return ctx["validate_files"] + "!"

    ctx = dag.run()
    assert order == ["load_env_vars", "validate_files", "load_data"]
    assert ctx["load_data"] == "ok!"


def test_retries_then_succeeds():
    dag = DAG("retrying")
    attempts = {"n": 0}

    def flaky(ctx):
        attempts["n"] += 1
        if attempts["n"] < 3:
            raise RuntimeError("transient")
        return "done"

    dag.add(Task("flaky", flaky, retries=3, retry_delay_s=0.0))
    assert dag.run()["flaky"] == "done"
    assert attempts["n"] == 3


def test_retries_exhausted_reraises():
    dag = DAG("failing")
    dag.add(Task("always_bad", lambda ctx: 1 / 0, retries=1, retry_delay_s=0.0))
    with pytest.raises(ZeroDivisionError):
        dag.run()


def test_cycle_raises():
    dag = DAG("cyclic")
    dag.add(Task("a", lambda ctx: None, deps=("b",)))
    dag.add(Task("b", lambda ctx: None, deps=("a",)))
    with pytest.raises(graphlib.CycleError):
        dag.run()


def test_duplicate_task_rejected():
    dag = DAG("dup")
    dag.add(Task("t", lambda ctx: None))
    with pytest.raises(ValueError, match="duplicate"):
        dag.add(Task("t", lambda ctx: None))
