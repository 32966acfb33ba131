"""Sources & sinks: CSV/parquet/catalog-table ingestion with layout
detection; bucketed catalog sinks for exchange-free record-scale joins."""
