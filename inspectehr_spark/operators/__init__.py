"""Check operators: each takes DataFrames + rules and returns a failure log
(schemas.FAILURE_LOG) or a metrics table (schemas.METRICS)."""
