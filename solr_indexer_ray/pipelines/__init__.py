"""End-to-end pipelines: index build, BM25 search, oracle, mutations."""
