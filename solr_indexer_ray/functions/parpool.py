"""Shared intra-query thread pool for GIL-releasing numpy kernels.

numpy's searchsorted / cumsum / gather / compress kernels release the
GIL, and at posting-stream sizes they are memory-latency- or
bandwidth-bound, so chunking one logical pass across a few threads
scales ~3-4× (measured on the phrase membership path).  One pool is
shared process-wide: latency paths run one query at a time, and Ray
workers are separate processes, so each worker lazily builds its own.
"""

from __future__ import annotations

_POOL = None

#: minimum elements per chunk — inputs below 2×CHUNK run inline, so
#: per-range distributed slices never pay the dispatch overhead
CHUNK = 1 << 18


def pool():
    global _POOL
    if _POOL is None:
        import os
        from concurrent.futures import ThreadPoolExecutor

        _POOL = ThreadPoolExecutor(min(8, os.cpu_count() or 1))
    return _POOL


def n_chunks(size: int) -> int:
    return min(8, -(-size // CHUNK))
