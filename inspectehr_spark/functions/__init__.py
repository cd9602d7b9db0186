"""Scalar column functions: text metrics, code validators, datetime helpers.
All native pyspark.sql.functions expressions — no Python UDFs."""
