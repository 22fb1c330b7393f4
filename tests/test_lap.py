"""JV assignment solver vs scipy: optimal cost must match exactly."""

import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment

from gvl_tpu.train.lap import batched_lap, lap_jv, lap_scipy_callback


def total_cost(cost, col_to_row):
    return sum(cost[r, c] for c, r in enumerate(col_to_row))


def test_lap_matches_scipy_optimal_cost(rng):
    for trial in range(20):
        R = rng.randint(3, 40)
        C = rng.randint(1, R + 1)
        cost = rng.randn(R, C).astype(np.float32) * rng.uniform(0.1, 10)
        got = np.asarray(lap_jv(jnp.asarray(cost)))
        assert len(set(got.tolist())) == C, "assignment must be injective"
        assert (got >= 0).all() and (got < R).all()
        rows, cols = linear_sum_assignment(cost)
        want = cost[rows, cols].sum()
        np.testing.assert_allclose(total_cost(cost, got), want, rtol=1e-5)


def test_lap_batched_and_padded_columns(rng):
    B, R, C = 4, 20, 8
    cost = rng.randn(B, R, C).astype(np.float32)
    sizes = rng.randint(1, C + 1, size=B)
    # pad invalid columns with a constant
    for b in range(B):
        cost[b, :, sizes[b]:] = 0.0
    got = np.asarray(batched_lap(jnp.asarray(cost)))
    for b in range(B):
        c = sizes[b]
        rows, cols = linear_sum_assignment(cost[b, :, :c])
        want = cost[b][rows, cols].sum()
        have = sum(cost[b, got[b, j], j] for j in range(c))
        np.testing.assert_allclose(have, want, rtol=1e-5)
        assert len(set(got[b, :c].tolist())) == c


def test_lap_size_aware_columns(rng):
    """col_valid gating: invalid columns are skipped (-1 in output), valid
    columns still get the scipy-optimal assignment — for packed-front masks
    (match_layer) AND scattered masks (match_layer_m2o's tiled layout)."""
    B, R, C = 6, 20, 8
    cost = rng.randn(B, R, C).astype(np.float32)
    valid = np.zeros((B, C), bool)
    for b in range(B):
        if b % 2 == 0:                       # packed front
            valid[b, :rng.randint(1, C + 1)] = True
        else:                                # scattered
            idx = rng.choice(C, size=rng.randint(1, C), replace=False)
            valid[b, idx] = True
    got = np.asarray(batched_lap(jnp.asarray(cost), jnp.asarray(valid)))
    for b in range(B):
        cols = np.where(valid[b])[0]
        rows_s, cols_s = linear_sum_assignment(cost[b][:, cols])
        want = cost[b][rows_s, cols[cols_s]].sum()
        have = sum(cost[b, got[b, j], j] for j in cols)
        np.testing.assert_allclose(have, want, rtol=1e-5)
        assert len(set(got[b, cols].tolist())) == len(cols)
        assert (got[b, ~valid[b]] == -1).all()


def test_scipy_callback_matches_scipy(rng):
    B, R, C = 3, 12, 5
    cost = rng.randn(B, R, C).astype(np.float32)
    sizes = np.array([5, 3, 1], np.int32)
    got = np.asarray(lap_scipy_callback(jnp.asarray(cost), jnp.asarray(sizes)))
    for b in range(B):
        rows, cols = linear_sum_assignment(cost[b, :, :sizes[b]])
        want = np.full((C,), -1, np.int32)
        want[cols] = rows
        np.testing.assert_array_equal(got[b], want)


def test_lap_rejects_more_cols_than_rows(rng):
    """C > R would hang the augmenting-path loop on device — it must raise
    a clear trace-time error instead."""
    import pytest

    from gvl_tpu.train.lap import lap_jv
    with pytest.raises(ValueError, match="cols <= rows"):
        lap_jv(jnp.asarray(rng.randn(3, 4).astype(np.float32)))
