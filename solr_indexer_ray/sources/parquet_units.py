"""Metadata-driven parquet reading with deterministic doc-id assignment.

The reference shards its input by round-robin over a sorted file list
(``/root/reference/solrindexer/cli.py:279-287, 529-536``).  We shard by
parquet **row group**: a metadata-only scan (cheap even at 10^12-file corpus
scale — it reads footers, not data) enumerates units ``(file, row_group)`` in
sorted file order and assigns each unit a global row offset via prefix sums.

``doc_id = unit.row_offset + position_within_row_group`` — dense, globally
unique, and **deterministic regardless of task scheduling order** (SURVEY.md
§7.3 "Deterministic docIDs under parallelism and resume"): it depends only on
the sorted input listing and parquet metadata, never on completion order.
This avoids the global sort shuffle a rank-based assignment would need, and
it is stable under resume, which the per-partition checkpoint manifest
requires (north rule).

Units are also the checkpoint granularity: one unit -> one docs part file +
one raw-postings part file + one manifest entry.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.parquet as pq


@dataclass(frozen=True)
class ReadUnit:
    unit_id: int
    file: str
    row_group: int
    row_offset: int  # global offset of the unit's first row == first doc_id
    num_rows: int

    def to_row(self) -> dict:
        return {
            "unit_id": self.unit_id,
            "file": self.file,
            "row_group": self.row_group,
            "row_offset": self.row_offset,
            "num_rows": self.num_rows,
        }


def _expand_paths(paths) -> list:
    if isinstance(paths, (str, os.PathLike)):
        paths = [paths]
    files = []
    for p in paths:
        p = os.fspath(p)
        if os.path.isdir(p):
            files.extend(
                os.path.join(root, f)
                for root, _, fs in os.walk(p)
                for f in fs
                if f.endswith(".parquet")
            )
        else:
            files.append(p)
    return sorted(files)


def list_units(paths) -> list:
    """Enumerate (file, row_group) units with global row offsets.

    Reference analogue of input discovery ``_resolve_input_files``
    (``solrindexer/cli.py:516-540``): sorted for determinism.
    """
    units: list = []
    offset = 0
    uid = 0
    for f in _expand_paths(paths):
        meta = pq.ParquetFile(f).metadata
        for rg in range(meta.num_row_groups):
            n = meta.row_group(rg).num_rows
            units.append(ReadUnit(uid, f, rg, offset, n))
            offset += n
            uid += 1
    return units


def read_unit(unit, columns=None) -> pa.Table:
    """Read one row group and attach the deterministic ``doc_id`` column."""
    if isinstance(unit, dict):
        unit = ReadUnit(**{k: unit[k] for k in
                           ("unit_id", "file", "row_group", "row_offset", "num_rows")})
    table = pq.ParquetFile(unit.file).read_row_group(unit.row_group, columns=columns)
    doc_ids = pa.array(
        range(unit.row_offset, unit.row_offset + table.num_rows), pa.int64()
    )
    return table.append_column("doc_id", doc_ids)


def total_rows(units) -> int:
    return sum(u.num_rows for u in units)
