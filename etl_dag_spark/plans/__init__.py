from etl_dag_spark.plans.dag import DAG, Task

__all__ = ["DAG", "Task"]
