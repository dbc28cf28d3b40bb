"""Orchestration DAG: ordering, cycle detection, end-to-end local run."""

from __future__ import annotations

import pytest

from engage_spark.pipelines.dag import TASKS, Task, topological_order


def test_topological_order_respects_dependencies():
    order = topological_order(TASKS)
    assert order.index("weather_forecast") < order.index("covid_transform")
    assert order.index("covid_transform") < order.index("simulator")


def test_cycle_detection():
    tasks = {
        "a": Task("a", lambda *_: None, upstream=("b",)),
        "b": Task("b", lambda *_: None, upstream=("a",)),
    }
    with pytest.raises(ValueError, match="cycle"):
        topological_order(tasks)


def test_airflow_dag_gated():
    from engage_spark.pipelines.dag import build_airflow_dag

    try:
        import airflow  # noqa: F401

        has_airflow = True
    except ImportError:
        has_airflow = False
    if not has_airflow:
        with pytest.raises(NotImplementedError, match="airflow"):
            build_airflow_dag("/tmp/x")
