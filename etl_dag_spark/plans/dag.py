"""Lightweight DAG orchestrator — the Spark-native replacement for the
reference's Airflow surface (ETL_DAG.py:241-277: PythonOperator tasks,
``t1 >> t2 >> t3`` dependencies, retries, logging).

Tasks are Python callables receiving a shared mutable context (usually
holding the SparkSession and DataFrames). Because Spark plans are lazy,
"running" a transformation task is metadata-only; only sink/action
tasks trigger jobs — so the DAG layer adds zero overhead to the data
path and the whole pipeline still optimizes as one Catalyst plan per
action.
"""

from __future__ import annotations

import logging
import time
from collections.abc import Callable
from dataclasses import dataclass, field
from graphlib import TopologicalSorter

logger = logging.getLogger(__name__)


@dataclass
class Task:
    name: str
    fn: Callable[[dict], object]
    deps: tuple[str, ...] = ()
    retries: int = 0
    retry_delay_s: float = 0.0


@dataclass
class DAG:
    name: str
    tasks: dict[str, Task] = field(default_factory=dict)

    def task(self, name: str, deps: tuple[str, ...] = (), retries: int = 0,
             retry_delay_s: float = 0.0):
        """Decorator: ``@dag.task("load", deps=("validate",))``"""
        def deco(fn: Callable[[dict], object]) -> Callable[[dict], object]:
            self.add(Task(name, fn, deps, retries, retry_delay_s))
            return fn
        return deco

    def add(self, task: Task) -> None:
        if task.name in self.tasks:
            raise ValueError(f"duplicate task {task.name!r}")
        self.tasks[task.name] = task

    def run(self, context: dict | None = None) -> dict:
        """Execute tasks in dependency order; each task's return value is
        stored in the context under its name. Raises on cycle or missing
        dependency (graphlib) and re-raises the task error after retries
        are exhausted — matching Airflow's fail-the-run semantics."""
        context = context if context is not None else {}
        graph = {name: set(t.deps) for name, t in self.tasks.items()}
        for name in TopologicalSorter(graph).static_order():
            task = self.tasks[name]
            attempt = 0
            while True:
                try:
                    logger.info("dag=%s task=%s attempt=%d", self.name, name, attempt)
                    context[name] = task.fn(context)
                    break
                except Exception:
                    attempt += 1
                    if attempt > task.retries:
                        logger.exception("dag=%s task=%s failed", self.name, name)
                        raise
                    time.sleep(task.retry_delay_s)
        return context
