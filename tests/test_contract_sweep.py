"""Full contract sweep as a pytest marker (VERDICT r4 item 6): every
queries() key replayed against its oracle_sql() twin at sf0.01, with the
machine-checked result pinned to bench_artifacts/contract_sweep.json.

Opt-in (slow — the whole 104-key surface):

    pytest -m contract_sweep tests/test_contract_sweep.py

The default run (`pytest tests/ -x -q`) deselects it via addopts.
"""

import json
import os

import pytest

SF_DIR = os.environ.get("GRAFT_SWEEP_SF_DIR", "/root/testdata/sf0.01")
ARTIFACT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "bench_artifacts", "contract_sweep.json",
)


@pytest.mark.contract_sweep
def test_full_contract_sweep(ray_session):
    if not os.path.isdir(SF_DIR):
        pytest.skip(f"{SF_DIR} not present")
    from tools.check_contract import run_sweep

    results = run_sweep(SF_DIR, log=lambda *_: None)
    os.makedirs(os.path.dirname(ARTIFACT), exist_ok=True)
    summary = {
        "sf_dir": SF_DIR,
        "total": len(results),
        "ok": sum(1 for r in results.values() if r["status"] == "ok"),
        "ok_rows_only": sum(
            1 for r in results.values() if r["status"] == "ok_rows_only"
        ),
        "fail": sum(1 for r in results.values() if r["status"] == "fail"),
        "results": results,
    }
    with open(ARTIFACT, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    failed = {k: v["problems"] for k, v in results.items()
              if v["status"] == "fail"}
    assert not failed, f"contract sweep failures: {failed}"
    assert summary["total"] >= 100  # the whole surface, not a slice
