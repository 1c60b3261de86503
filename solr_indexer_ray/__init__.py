"""solr_indexer_ray — a Ray-Data-native full-text indexing and BM25 search engine.

A from-scratch re-expression of the query and data-processing capabilities of
metno/solr-indexer (reference at /root/reference) on ``ray.data.Dataset``
pipelines: where the reference parses/validates/transforms metadata documents
and delegates the inverted index + BM25 ranking to an external Apache Solr
core over HTTP, this package implements the whole stack natively —

- ``sources``   : deterministic corpus generation + metadata-driven parquet
                  reading with deterministic doc-id assignment
                  (reference analogue: input discovery, ``solrindexer/cli.py:516-540``)
- ``functions`` : pure kernels — analyzers, Lucene SmallFloat norms, varint
                  posting codecs, text statistics, id/date normalization,
                  spatial string formats
- ``stages``    : ``map_batches`` stages — validation, dedup, ANN, multimodal
- ``pipelines`` : index build (SPIMI-style per-partition postings + groupby
                  merge), BM25 top-k search, brute-force oracle, mutations
- ``state``     : per-partition checkpoint manifests with lineage + metrics

No function in this package calls ``ray.init()`` — sessions are owned by the
caller (tests, bench.py, or the graft driver).
"""

__version__ = "0.1.0"

from solr_indexer_ray.config import IndexConfig  # noqa: F401
