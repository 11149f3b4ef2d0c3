"""Sources & sinks: synthetic corpus generation, checkpointed parquet IO."""
