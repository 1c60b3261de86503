"""Per-partition checkpoint manifest with lineage + metrics.

North-rule requirement: "resumable from checkpoint with per-partition
lineage + metrics".  The reference has **no** checkpointing (a crashed run
restarts from scratch; SURVEY.md §4) — its closest precedents are Solr's
idempotent upsert-by-id and the vocabulary disk cache
(``/root/reference/solrindexer/vocabulary.py:345-394``).

Design: one JSON file per completed build unit under
``<index>/_manifest/unit-NNNNNN.json``, written atomically (tmp + rename).
An entry records lineage (input file, row group, row counts, content
digest) and metrics (wall seconds, token counts).  Resume = skip units whose
manifest entry exists and whose outputs exist.  The final ``commit`` — the
analogue of the reference's explicit Solr hard commit
(``solrindexer/mmd.py:1303-1304``) — atomically publishes ``stats.json``,
which is what marks the index readable.
"""

from __future__ import annotations

import json
import os
import time


def _atomic_write_json(path: str, obj: dict) -> None:
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(obj, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


class BuildManifest:
    """Manifest directory handle for one index build."""

    def __init__(self, index_dir: str):
        self.index_dir = os.fspath(index_dir)
        self.manifest_dir = os.path.join(self.index_dir, "_manifest")

    # -- layout ------------------------------------------------------------
    def unit_entry_path(self, unit_id: int) -> str:
        return os.path.join(self.manifest_dir, f"unit-{unit_id:06d}.json")

    @property
    def stats_path(self) -> str:
        return os.path.join(self.index_dir, "stats.json")

    def ensure_dirs(self) -> None:
        for sub in ("_manifest", "docs", "postings_raw"):
            os.makedirs(os.path.join(self.index_dir, sub), exist_ok=True)

    # -- unit entries ------------------------------------------------------
    def unit_complete(self, unit_id: int) -> bool:
        path = self.unit_entry_path(unit_id)
        if not os.path.exists(path):
            return False
        try:
            entry = json.load(open(path))
        except (json.JSONDecodeError, OSError):
            return False
        return all(
            os.path.exists(os.path.join(self.index_dir, out))
            for out in entry.get("outputs", [])
        )

    def read_unit(self, unit_id: int) -> dict:
        return json.load(open(self.unit_entry_path(unit_id)))

    def write_unit(self, unit_id: int, entry: dict) -> None:
        entry = dict(entry, unit_id=unit_id, written_at=time.time())
        _atomic_write_json(self.unit_entry_path(unit_id), entry)

    def read_all_units(self) -> list:
        if not os.path.isdir(self.manifest_dir):
            return []
        out = []
        for name in sorted(os.listdir(self.manifest_dir)):
            if name.startswith("unit-") and name.endswith(".json"):
                try:
                    out.append(json.load(open(os.path.join(self.manifest_dir, name))))
                except (json.JSONDecodeError, OSError):
                    continue
        return out

    # -- publish / status --------------------------------------------------
    def commit(self, stats: dict) -> None:
        """Atomic publish: the index is readable iff stats.json exists."""
        _atomic_write_json(self.stats_path, dict(stats, committed_at=time.time()))

    def is_committed(self) -> bool:
        """Reference analogue: ``ping`` (``solrindexer/mmd.py:1289-1300``)."""
        return os.path.exists(self.stats_path)

    def read_stats(self) -> dict:
        return json.load(open(self.stats_path))

    # ------------------------------------------------------------------ #
    # build lock (one writer per index dir)
    # ------------------------------------------------------------------ #
    def lock_path(self) -> str:
        return os.path.join(self.index_dir, ".build_lock")

    def acquire_lock(self) -> None:
        """O_EXCL pid lock: exactly one build/extend/compact may write an
        index dir at a time (Solr analogue: the core's single writer —
        Lucene's write.lock).  A lock whose pid is dead is stale from a
        killed run and is taken over (that is also how resume-after-kill
        proceeds, tested in TestResume)."""
        os.makedirs(self.index_dir, exist_ok=True)
        path = self.lock_path()
        pid = os.getpid()
        while True:
            try:
                fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, str(pid).encode())
                os.close(fd)
                return
            except FileExistsError:
                try:
                    holder = int(open(path).read().strip() or 0)
                except (OSError, ValueError):
                    holder = 0
                if holder and _pid_alive(holder) and holder != pid:
                    raise RuntimeError(
                        f"index {self.index_dir} is locked by running "
                        f"build pid {holder}"
                    )
                # stale (dead pid) -> steal
                try:
                    os.unlink(path)
                except FileNotFoundError:
                    pass

    def release_lock(self) -> None:
        try:
            os.unlink(self.lock_path())
        except FileNotFoundError:
            pass

    def status(self) -> dict:
        """Index health summary (reference: ``get_status``,
        ``solrindexer/mmd.py:1306-1332``)."""
        units = self.read_all_units()
        stats = self.read_stats() if self.is_committed() else {}
        return {
            "committed": self.is_committed(),
            "generation": stats.get("generation", 1) if stats else None,
            "units_complete": len(units),
            "n_docs": stats.get("n_docs"),
            "n_term_rows": stats.get("n_term_rows"),
            "avgdl": stats.get("avgdl"),
            "wall_s_total": round(
                sum(u.get("metrics", {}).get("wall_s", 0.0) for u in units), 3
            ),
        }
def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True
