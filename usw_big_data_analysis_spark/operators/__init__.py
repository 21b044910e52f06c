"""Reusable operator library — the spark.ml / pandas-UDF layer behind the
oracle-checked SQL queries in ``queries/``."""
