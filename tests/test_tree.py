import numpy as np
import pytest

from symmetric_eigenvalue_tpu.core.tree import build_plan


@pytest.mark.parametrize("n,leaf", [(1, 32), (2, 1), (7, 2), (16, 4), (37, 4),
                                    (100, 8), (1000, 32), (127, 1)])
def test_plan_invariants(n, leaf):
    plan = build_plan(n, leaf)
    P = plan.num_leaves
    assert P & (P - 1) == 0  # power of two
    assert sum(plan.leaf_sizes) == n
    assert plan.leaf_pad == max(plan.leaf_sizes)
    # reference layout: n//P with first n%P leaves one larger (main.c:317-332)
    base, rem = divmod(n, P)
    assert all(sz == base + (1 if i < rem else 0)
               for i, sz in enumerate(plan.leaf_sizes))
    assert min(plan.leaf_sizes) >= 1
    # offsets are the prefix sum
    assert list(plan.leaf_offsets) == list(np.concatenate(
        [[0], np.cumsum(plan.leaf_sizes)[:-1]]))
    # levels
    assert len(plan.levels) == plan.num_levels
    for li, lv in enumerate(plan.levels):
        assert lv.num_merges == P >> (li + 1)
        assert lv.merge_size == plan.leaf_pad * (1 << (li + 1))
        for r in lv.boundary_rows:
            assert 0 <= r < n - 1


def test_row_map_and_pad_mask():
    plan = build_plan(10, 3)  # P=2, sizes (5,5)
    rows = plan.row_map()
    assert rows.shape == (10,)
    assert len(set(rows.tolist())) == 10
    mask = plan.pad_mask()
    assert mask.sum() == plan.padded_n - 10
    assert not mask[rows].any()


def test_boundaries_partition_leaves():
    plan = build_plan(100, 8)
    # level-1 boundaries sit between adjacent leaf pairs
    lv = plan.levels[0]
    for j, r in enumerate(lv.boundary_rows):
        mid_leaf = 2 * j + 1
        assert r == plan.leaf_offsets[mid_leaf] - 1


def test_max_leaves_cap():
    plan = build_plan(1000, 1, max_leaves=8)
    assert plan.num_leaves <= 8


def test_resolved_leaf_size_cap(monkeypatch):
    import jax

    from symmetric_eigenvalue_tpu.config import SolverConfig

    cfg = SolverConfig()
    # explicit size wins
    assert SolverConfig(leaf_size=8).resolved_leaf_size(65536) == 8
    # on CPU: plain default
    assert cfg.resolved_leaf_size(65536) == 32
    # on (pretend) TPU: default 64 (round-robin Jacobi makes bigger leaves
    # cheap; tools/leaf_retune.py measured 2.79 s at 64 vs 2.98 at 128 for
    # n=16384) and the leaf count capped at 1024
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert cfg.resolved_leaf_size(16384) == 64
    assert cfg.resolved_leaf_size(65536) == 64
    assert cfg.resolved_leaf_size(262144) == 256
