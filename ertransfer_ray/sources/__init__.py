"""Sources: parquet readers with pruning, the synthetic web-page corpus,
and WARC/WET crawl-archive reading/writing (sources/warc.py)."""
