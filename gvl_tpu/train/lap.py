"""Linear assignment (Hungarian matching) on device.

The reference ships cost matrices to the CPU and calls scipy's
linear_sum_assignment per sample per decoder layer (reference:
pdvc/matcher.py:120-128) — a device->host sync in the middle of every
training step. Here the solver is a jit-compatible Jonker-Volgenant
shortest-augmenting-path implementation (exact: same optimal cost as scipy;
tie-breaking may differ, which only permutes equal-cost assignments), vmapped
over the batch — matching runs on the TPU inside the train step.

A scipy pure_callback variant is kept for bit-exact parity experiments
(cfg.matcher_impl = 'scipy').

Shapes: cost (R, C) with rows = queries, cols = GT events (C <= R). Padded
columns should carry a constant cost (e.g. 0); they absorb leftover rows
without disturbing the optimum over the real columns.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_INF = jnp.float32(1e18)


def lap_jv(cost: jnp.ndarray) -> jnp.ndarray:
    """Exact min-cost assignment of each column to a distinct row.

    cost: (R, C) float32, C <= R. Returns col_to_row (C,) int32.

    Shortest-augmenting-path Hungarian with potentials; the classic O(n^3)
    formulation, vectorized over rows. The alternating tree grows one column
    at a time (outer scan); each Dijkstra step is O(R) vector work inside a
    while_loop, so the whole solve stays on device with static shapes.
    """
    R, C = cost.shape
    if C > R:
        # a one-to-one assignment of every column is infeasible and the
        # augmenting-path loop would spin forever on device with no error
        # (callers that need rectangular C>R semantics pad dummy rows —
        # see match_layer_m2o)
        raise ValueError(
            f"lap_jv needs cols <= rows, got cost shape ({R}, {C}); "
            "check num_queries >= max GT events per video")
    cost = cost.astype(jnp.float32)

    # Potentials: u over columns (the side we insert one by one), v over rows
    # plus a virtual root row at index R. p[r] = column matched to row r
    # (-1 = free). p[R] temporarily holds the column being inserted.
    u0 = jnp.zeros((C,), jnp.float32)
    v0 = jnp.zeros((R + 1,), jnp.float32)
    p0 = jnp.full((R + 1,), -1, jnp.int32)

    def insert_column(carry, col):
        u, v, p = carry
        p = p.at[R].set(col)

        minv = jnp.full((R,), _INF)
        way = jnp.full((R,), R, jnp.int32)   # predecessor row in the tree
        used = jnp.zeros((R + 1,), bool)

        def body(st):
            minv, way, used, u, v, r0, _ = st
            used = used.at[r0].set(True)
            c0 = jnp.where(r0 == R, jnp.int32(col), p[jnp.minimum(r0, R)])
            cur = cost[:, c0] - u[c0] - v[:R]
            upd = (~used[:R]) & (cur < minv)
            minv = jnp.where(upd, cur, minv)
            way = jnp.where(upd, r0, way)
            masked = jnp.where(used[:R], _INF, minv)
            r1 = jnp.argmin(masked).astype(jnp.int32)
            delta = masked[r1]
            # potential update: used side shifts by delta (index C = dropped)
            cols_of_used = jnp.where(used, jnp.where(
                jnp.arange(R + 1) == R, col, p), C)
            u = u.at[cols_of_used].add(
                jnp.where(used, delta, 0.0), mode="drop")
            v = v - jnp.where(used, delta, 0.0)
            minv = minv - jnp.where(used[:R], 0.0, delta)
            cont = p[r1] != -1
            return minv, way, used, u, v, r1, cont

        st = (minv, way, used, u, v, jnp.int32(R), True)
        _, way, _, u, v, r_end, _ = jax.lax.while_loop(
            lambda s: s[6], body, st)

        # augment along the alternating path
        def aug(st):
            p, r = st
            r_prev = way[r]
            new_col = jnp.where(r_prev == R, jnp.int32(col),
                                p[jnp.minimum(r_prev, R)])
            p = p.at[r].set(new_col)
            return p, r_prev

        def aug_cond(st):
            _, r = st
            return r != R

        p, _ = jax.lax.while_loop(aug_cond, aug, (p, r_end))
        p = p.at[R].set(-1)
        return (u, v, p), None

    (u, v, p), _ = jax.lax.scan(insert_column, (u0, v0, p0),
                                jnp.arange(C, dtype=jnp.int32))

    rows = jnp.arange(R, dtype=jnp.int32)
    col_to_row = jnp.full((C,), -1, jnp.int32)
    col_to_row = col_to_row.at[jnp.where(p[:R] >= 0, p[:R], C)].set(
        rows, mode="drop")
    return col_to_row


def batched_lap(cost: jnp.ndarray) -> jnp.ndarray:
    """cost (B, R, C) -> col_to_row (B, C) int32."""
    return jax.vmap(lap_jv)(cost)


def lap_scipy_callback(cost: jnp.ndarray, sizes: jnp.ndarray) -> jnp.ndarray:
    """scipy.linear_sum_assignment via pure_callback — bit-exact with the
    reference's matcher, at the price of a host sync per call. cost (B,R,C);
    sizes (B,) valid column counts. Returns (B, C) col_to_row, -1 in pads."""
    from scipy.optimize import linear_sum_assignment

    def host_fn(cost_np, sizes_np):
        B, R, C = cost_np.shape
        out = np.full((B, C), -1, np.int32)
        for b in range(B):
            c = int(sizes_np[b])
            if c == 0:
                continue
            rows, cols = linear_sum_assignment(cost_np[b, :, :c])
            out[b, cols] = rows.astype(np.int32)
        return out

    B, R, C = cost.shape
    return jax.pure_callback(
        host_fn, jax.ShapeDtypeStruct((B, C), jnp.int32), cost, sizes,
        vmap_method="sequential")
