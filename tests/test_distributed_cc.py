"""Distributed connected components for near-dedup survivors (VERDICT r4
item 2): min-label propagation in Ray Data must (a) match the driver
union-find on assorted graph shapes and (b) carry a >=1M-pair survivor
selection WITHOUT the pair set ever materializing on the driver — asserted
by spying on the driver-path entry points."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

import solr_indexer_ray.stages.dedup as dd

SHAPES = {
    # a 6-chain needs ~4 pointer-jumping rounds — multi-round coverage
    # without paying tiny-graph Ray-op fixed overhead 12 times (the
    # distributed path exists for >200k-pair graphs; below the threshold
    # production traffic takes the driver union-find anyway)
    "chain": [(i, i + 1) for i in range(6)],
    "star": [(0, i) for i in range(1, 9)],
    "two_cliques": (
        [(a, b) for a in range(4) for b in range(a + 1, 4)]
        + [(10 + a, 10 + b) for a in range(3) for b in range(a + 1, 3)]
    ),
    "unordered_ids": [(9, 3), (3, 7), (50, 2), (2, 9)],
    "self_dup_pairs": [(4, 7), (7, 4), (4, 7)],
}


def _pairs_ds(edges):
    return rd.from_arrow(
        pa.table(
            {
                "id_a": pa.array([a for a, _ in edges], pa.int64()),
                "id_b": pa.array([b for _, b in edges], pa.int64()),
                "similarity": pa.array([1.0] * len(edges), pa.float64()),
            }
        )
    )


@pytest.mark.parametrize("shape", sorted(SHAPES))
def test_matches_driver_union_find(ray_session, shape):
    edges = SHAPES[shape]
    expected = dd.component_dropped_ids(
        [{"id_a": a, "id_b": b} for a, b in edges]
    )
    got = {
        r["doc_id"]
        for r in dd.distributed_dropped_ids(_pairs_ds(edges)).take_all()
    }
    assert got == expected


def test_survivors_threshold_routes_small_to_driver(ray_session,
                                                    monkeypatch):
    """Below the pair threshold the driver union-find fast path runs."""
    calls = {"driver": 0}
    orig = dd.component_dropped_ids

    def spy(rows):
        calls["driver"] += 1
        return orig(rows)

    monkeypatch.setattr(dd, "component_dropped_ids", spy)
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(10), pa.int64()),
                "text": pa.array([f"t{i}" for i in range(10)]),
            }
        )
    )
    out = dd.near_dedup_survivors(docs, _pairs_ds([(1, 4), (4, 8)]))
    assert sorted(r["doc_id"] for r in out.take_all()) == [
        0, 1, 2, 3, 5, 6, 7, 9,
    ]
    assert calls["driver"] == 1


def test_million_pair_survivors_never_touch_driver(ray_session,
                                                   monkeypatch):
    """>=1M candidate pairs: survivor selection must route through
    distributed min-label propagation — the driver union-find and any
    pairs.take_all() are poisoned, so the pair set provably never
    materializes on the driver (VERDICT r4 item 2 done-criterion)."""
    n = 1_000_000
    a = np.arange(0, 2 * n, 2, dtype=np.int64)
    b = a + 1
    base = 10_000_000
    # a short chain on top of the disjoint pairs exercises multi-round
    # propagation without inflating round count
    ca = base + np.arange(4, dtype=np.int64)
    cb = ca + 1
    pairs = rd.from_arrow(
        pa.table(
            {
                "id_a": np.concatenate([a, ca]),
                "id_b": np.concatenate([b, cb]),
                "similarity": np.ones(n + 4),
            }
        )
    )

    def poisoned(_rows):
        raise AssertionError(
            "driver union-find must not run above the pair threshold"
        )

    monkeypatch.setattr(dd, "component_dropped_ids", poisoned)

    def poisoned_take_all(*args, **kwargs):
        raise AssertionError(
            "the pair set must not materialize on the driver"
        )

    # instance-level poison: exactly the pair Dataset the survivor path
    # receives (derived datasets run remotely; the driver-side fast path
    # is the only caller of pairs.take_all)
    pairs.take_all = poisoned_take_all
    corpus = rd.range(2 * n).map_batches(
        lambda t: pa.table({"doc_id": t["id"]}),
        batch_format="pyarrow",
    )
    out = dd.near_dedup_survivors(corpus, pairs)
    # survivors: one per disjoint pair (the even ids); chain ids are
    # absent from this corpus, so they don't add rows
    assert out.count() == n
