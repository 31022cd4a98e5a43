"""Sources & sinks: synthetic webtext corpus, driver testdata loaders,
resumable stage-committed parquet sink (Iceberg-contract fallback)."""
