"""Sources & sinks: CSV/parquet/catalog-table ingestion with layout detection."""
