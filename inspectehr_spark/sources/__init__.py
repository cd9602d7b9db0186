"""Sources & sinks: schema-enforced readers, Iceberg-or-parquet gating."""
