"""Local replica of the driver's correctness check.

Runs every ``queries()`` callable and its ``oracle_sql()`` twin at the given
sf dir, compares row count, schema (column names), and order-insensitive
values (sorted columns, sorted rows, exact equality).  Everything in the
pipeline is deterministic, so a pass here predicts a pass in the driver.

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
            drop=True
        )
    return df


def compare(name: str, mine: pd.DataFrame, oracle: pd.DataFrame) -> list:
    problems = []
    if sorted(mine.columns) != sorted(oracle.columns):
        problems.append(
            f"schema: mine={sorted(mine.columns)} oracle={sorted(oracle.columns)}"
        )
        return problems
    if len(mine) != len(oracle):
        problems.append(f"rows: mine={len(mine)} oracle={len(oracle)}")
    a, b = canon(mine), canon(oracle)
    if len(a) == len(b):
        for col in a.columns:
            av, bv = a[col], b[col]
            # The driver's value hash is dtype-sensitive: int64 vs float64
            # hash-mismatch even when every value compares equal.  Flag
            # numeric-kind drift explicitly (bool/int vs float).
            ak, bk = av.dtype.kind, bv.dtype.kind
            num = set("biuf")
            if ak != bk and ak in num and bk in num and {ak, bk} & {"f"}:
                problems.append(
                    f"dtype drift on {col!r}: mine={av.dtype} oracle={bv.dtype}"
                )
            try:
                same = av.equals(bv) or (av.astype(object) == bv.astype(object)).all()
            except (TypeError, ValueError):
                same = False
            if not same:
                bad = (av.astype(object) != bv.astype(object))
                idx = bad[bad].index[:3].tolist()
                examples = [
                    (i, av.iloc[i], bv.iloc[i]) for i in idx
                ]
                problems.append(f"col {col!r} differs, e.g. {examples}")
    return problems


def run_sweep(sf_dir: str, only=None, log=print) -> dict:
    """Run the full queries()-vs-oracle_sql() sweep; returns a result dict
    per key: {"status": "ok"|"ok_rows_only"|"fail", "rows": n,
    "seconds": t, "problems": [...]}.

    Importable so the pytest contract_sweep marker and the CLI entry share
    one implementation; assumes Ray is already initialised (pytest session
    fixture) or auto-inits lazily via Ray Data.
    """
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    results: dict = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            log(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            results[name] = {
                "status": "fail", "rows": None, "seconds": None,
                "problems": [f"query raised {type(e).__name__}: {e}"],
            }
            continue
        dt = round(time.time() - t0, 2)
        if name not in sqls:
            log(f"ok*   {name}: rows={len(mine)} ({dt:.1f}s, rows-only)")
            results[name] = {
                "status": "ok_rows_only", "rows": len(mine),
                "seconds": dt, "problems": [],
            }
            continue
        try:
            oracle = con.execute(sqls[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            log(f"FAIL  {name}: oracle SQL raised {type(e).__name__}: {e}")
            results[name] = {
                "status": "fail", "rows": len(mine), "seconds": dt,
                "problems": [f"oracle SQL raised {type(e).__name__}: {e}"],
            }
            continue
        problems = compare(name, mine, oracle)
        if problems:
            log(f"FAIL  {name}: rows={len(mine)} ({dt:.1f}s)")
            for p in problems:
                log(f"      - {p}")
        else:
            log(f"ok    {name}: rows={len(mine)} ({dt:.1f}s)")
        results[name] = {
            "status": "fail" if problems else "ok",
            "rows": len(mine), "seconds": dt, "problems": problems,
        }
    return results


def main() -> int:
    args = list(sys.argv[1:])
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i:i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    results = run_sweep(sf_dir, only=only)
    n_fail = sum(1 for r in results.values() if r["status"] == "fail")
    ray.shutdown()
    if json_out:
        import json as _json

        summary = {
            "sf_dir": sf_dir,
            "total": len(results),
            "ok": sum(1 for r in results.values() if r["status"] == "ok"),
            "ok_rows_only": sum(
                1 for r in results.values()
                if r["status"] == "ok_rows_only"
            ),
            "fail": n_fail,
            "results": results,
        }
        with open(json_out, "w") as f:
            _json.dump(summary, f, indent=1, sort_keys=True)
    print("FAILURES:", n_fail)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
