from etl_dag_spark.functions.country import COUNTRY_TO_ISO3, iso3_column, iso3_sql_case
from etl_dag_spark.functions.text import tokens_column, shingles_column
from etl_dag_spark.functions.vectors import cosine_column, dot_column

__all__ = [
    "COUNTRY_TO_ISO3",
    "iso3_column",
    "iso3_sql_case",
    "tokens_column",
    "shingles_column",
    "cosine_column",
    "dot_column",
]
