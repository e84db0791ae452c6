"""Sources & sinks: mapped/validated ingest, parquet/CSV/table IO."""
