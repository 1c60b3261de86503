"""Shared intra-query thread pool for GIL-releasing numpy kernels.

numpy's searchsorted / cumsum / gather / compress kernels release the
GIL, and at posting-stream sizes they are memory-latency- or
bandwidth-bound, so chunking one logical pass across a few threads
scales ~3-4× (measured on the phrase membership path).  One pool is
shared process-wide: latency paths run one query at a time, and Ray
workers are separate processes, so each worker lazily builds its own.
"""

from __future__ import annotations

import os
import threading

_POOL = None
_POOL_PID = None
_POOL_LOCK = threading.Lock()

#: minimum elements per chunk — inputs below 2×CHUNK run inline.
#: Measured crossover: chunked searchsorted already wins 1.6× at 64k
#: probes and ~4× at 512k; below 128k the dispatch overhead and the
#: risk of thread oversubscription in concurrent per-range tasks
#: outweigh the gain.
CHUNK = 1 << 16


def pool():
    """The shared executor, rebuilt after fork (a child inheriting the
    parent's executor object has none of its worker threads — submitting
    there would hang forever) and built under a lock (two racing first
    callers must not leak a second pool's threads)."""
    global _POOL, _POOL_PID
    pid = os.getpid()
    if _POOL is None or _POOL_PID != pid:
        with _POOL_LOCK:
            if _POOL is None or _POOL_PID != pid:
                from concurrent.futures import ThreadPoolExecutor

                _POOL = ThreadPoolExecutor(min(8, os.cpu_count() or 1))
                _POOL_PID = pid
    return _POOL


def n_chunks(size: int) -> int:
    return min(8, -(-size // CHUNK))
