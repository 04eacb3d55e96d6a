"""Integer Bresenham ray traversal under `lax.scan` — cell-exact vs the CPU
reference (`OccupancyGrid._bresenham`, server_nodes/dual_bot_mapper.py:158-179).

The reference walks one ray at a time in Python. Here one `lax.scan` of K
fixed steps walks EVERY ray in the batch in lockstep (vmap-free: all carries
are batched arrays), producing [R, K] cell coordinates plus masks. K is a
static bound: with the 1.2 m trust window and 5 cm cells
(dual_bot_mapper.py:57, 87) a ray spans at most ~25 cells; K = 32 leaves
margin. The classic error-update variant used by the reference emits exactly
chebyshev(dx, dy) + 1 cells, so masks are derived, not data-dependent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DEFAULT_K = 32


def chebyshev_cells(x0, y0, x1, y1):
    """Number of cells Bresenham visits for each ray."""
    return jnp.maximum(jnp.abs(x1 - x0), jnp.abs(y1 - y0)) + 1


def bresenham_cells(x0, y0, x1, y1, k_max: int = DEFAULT_K):
    """Trace all rays simultaneously.

    x0..y1: int32 [...] start/end cells.
    Returns (cells_x [..., K], cells_y [..., K], valid [..., K],
             is_endpoint [..., K]) where `valid` marks real visited cells and
    `is_endpoint` the final cell of each ray. Rays longer than K are
    truncated (the trust window makes this impossible in practice).
    """
    dx = jnp.abs(x1 - x0)
    dy = jnp.abs(y1 - y0)
    sx = jnp.where(x0 < x1, 1, -1)
    sy = jnp.where(y0 < y1, 1, -1)

    def step(carry, _):
        x, y, err, done_prev = carry
        at_end = (x == x1) & (y == y1)
        emit_valid = ~done_prev
        emit = (x, y, emit_valid, at_end & emit_valid)

        e2 = 2 * err
        step_x = (e2 > -dy) & ~at_end
        step_y = (e2 < dx) & ~at_end
        err_new = err - jnp.where(step_x, dy, 0) + jnp.where(step_y, dx, 0)
        x_new = x + jnp.where(step_x, sx, 0)
        y_new = y + jnp.where(step_y, sy, 0)
        return (x_new, y_new, err_new, done_prev | at_end), emit

    init = (x0, y0, dx - dy, jnp.zeros_like(x0, dtype=bool))
    _, (cx, cy, valid, endpoint) = jax.lax.scan(step, init, None, length=k_max)
    # scan stacks along axis 0 -> move K last.
    mv = lambda a: jnp.moveaxis(a, 0, -1)
    return mv(cx), mv(cy), mv(valid), mv(endpoint)
