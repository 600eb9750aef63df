"""Dataset -> Dataset pipeline stages."""
