"""The incremental sync pipeline — the reference's actual product,
re-expressed as Spark DataFrame plans over a versioned parquet store."""
