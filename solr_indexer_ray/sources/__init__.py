"""Sources: deterministic corpus synthesis and parquet unit readers."""
