"""Thumbnail-analogue enrichment stage (SURVEY.md ST4, last partial).

Reference behavior (``solrindexer/tools.py:334-385``, ``add_nbs_thumbnail``):
per document, pick a data-access URL, regex-extract a product key
(``product/year/month/day[/mode]/fname``), construct a thumbnail path under
a configured base path, probe the FILESYSTEM (``os.path.isfile``), and on a
hit set ``thumbnail_url`` to base-url + key; misses leave the document
unchanged.  The reference probes one file per document per record.

Ray-Data-first re-expression: the probe side becomes a MANIFEST — the set
of available thumbnail keys, scanned once (``build_thumbnail_manifest``)
and broadcast via ``ray.put`` — and the enrichment is an actor-pool
``map_batches`` stage (:class:`ThumbnailStage`) that resolves the manifest
once per actor in ``__init__`` and does a set-membership lookup per row.
At 100 TB that is one object-store read per actor instead of one
``os.path.isfile`` RPC per document against a shared filesystem.

Quirks kept verbatim from the reference:

- URL selection from a LIST column takes element [0], or element [1] when
  [0] does not end with ``.zip`` (``tools.py:341-343`` — note the reference
  IndexErrors on single-element lists; we tolerate and take the last).
- ``S1*`` products include the acquisition-mode path segment; a missing
  mode interpolates the literal string ``"None"`` (an f-string of a None
  group), which can never probe true — preserved.
- Non-``S1`` products omit the mode segment.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pyarrow as pa

#: reference: ``NBS_PROD_RE``, ``solrindexer/tools.py:335``
NBS_PROD_RE = re.compile(
    r"(\w\d\w)/(\d{4})/(\d{2})/(\d{2})(?:/(IW|EW))?/(.+)\.zip"
)


def thumbnail_key(url: str | None) -> str | None:
    """Relative thumbnail key for one data-access URL, or None.

    Mirrors the reference's path construction (``tools.py:346-371``):
    ``{product}/{year}/{month}/{day}[/{mode}]/ql/{fname}/thumbnail.png``.
    """
    if not url:
        return None
    m = NBS_PROD_RE.search(url)
    if not m:
        return None
    product, year, month, day, mode, fname = m.groups()
    if product.startswith("S1"):
        # reference interpolates mode unconditionally (None -> "None")
        return f"{product}/{year}/{month}/{day}/{mode}/ql/{fname}/thumbnail.png"
    return f"{product}/{year}/{month}/{day}/ql/{fname}/thumbnail.png"


def pick_url(value) -> str | None:
    """Reference URL selection: scalar passes through; for a list take
    [0], or [1] when [0] does not end with ``.zip`` (``tools.py:341-343``);
    tolerate short lists by falling back to the last element."""
    if value is None:
        return None
    if isinstance(value, (list, tuple)):
        if not value:
            return None
        first = value[0]
        if first is not None and str(first).endswith(".zip"):
            return str(first)
        return str(value[1]) if len(value) > 1 else (
            str(first) if first is not None else None
        )
    return str(value)


def build_thumbnail_manifest(base_path: str) -> frozenset:
    """Scan a thumbnail tree ONCE into the set of available relative keys
    (``product/.../thumbnail.png``) — the broadcastable small side of the
    lookup join.  Run on the driver, ``ray.put`` the result, and pass the
    ObjectRef to :class:`ThumbnailStage`."""
    base = os.fspath(base_path)
    keys = []
    for root, _dirs, files in os.walk(base):
        for f in files:
            if f == "thumbnail.png":
                keys.append(
                    os.path.relpath(os.path.join(root, f), base)
                    .replace(os.sep, "/")
                )
    return frozenset(keys)


class ThumbnailStage:
    """Actor-pool enrichment stage: add ``thumbnail_url`` where the
    constructed key exists in the manifest (reference ST4 semantics).

    Pass to ``Dataset.map_batches(ThumbnailStage, fn_constructor_kwargs=
    {...}, concurrency=N, batch_format="pyarrow")`` or use
    :meth:`as_doc_enricher` to hook into ``UnitIndexer``.

    ``manifest`` may be a set of keys, a ``ray.ObjectRef`` to one
    (broadcast — resolved once per actor here, never per batch), or None
    with ``base_path`` set (each actor scans the tree once; fine for
    small local trees, prefer the broadcast at scale).
    """

    def __init__(self, base_url: str, manifest=None, base_path: str = None,
                 url_col: str = "data_access_url_http"):
        import ray

        if manifest is None:
            if base_path is None:
                raise ValueError("ThumbnailStage needs manifest or base_path")
            manifest = build_thumbnail_manifest(base_path)
        elif isinstance(manifest, ray.ObjectRef):
            manifest = ray.get(manifest)
        self.manifest = frozenset(manifest)
        self.base_url = base_url.rstrip("/")
        self.url_col = url_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.url_col not in batch.column_names:
            return batch.append_column(
                "thumbnail_url", pa.nulls(batch.num_rows, pa.string())
            )
        urls = [pick_url(v) for v in batch[self.url_col].to_pylist()]
        keys = [thumbnail_key(u) for u in urls]
        out = [
            f"{self.base_url}/{k}" if k is not None and k in self.manifest
            else None
            for k in keys
        ]
        if "thumbnail_url" in batch.column_names:
            batch = batch.drop_columns(["thumbnail_url"])
        return batch.append_column(
            "thumbnail_url", pa.array(out, pa.string())
        )

    def as_doc_enricher(self):
        """Adapter for ``UnitIndexer(doc_enricher=...)`` — same row-count
        contract the hook enforces."""
        return lambda table: self(table)
