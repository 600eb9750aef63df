"""Sources: parquet readers with pruning + the synthetic web-page corpus."""
