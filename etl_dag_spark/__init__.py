"""etl_dag_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
ETL-DAG repo (Airflow + pandas + Snowflake; see /root/reference) as
declarative Spark DataFrame plans, extended with LLM-training-data
operators (dedup, similarity search, text analysis, multimodal columns)
designed for 100 TB scale.
"""

from etl_dag_spark.session import get_spark
from etl_dag_spark.sources.tables import load_tables

__version__ = "0.1.0"

__all__ = ["get_spark", "load_tables", "__version__"]
