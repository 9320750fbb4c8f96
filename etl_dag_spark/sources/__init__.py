from etl_dag_spark.sources.readers import read_source
from etl_dag_spark.sources.tables import TABLES, load_tables

__all__ = ["read_source", "load_tables", "TABLES"]
