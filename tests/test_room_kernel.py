"""Room-block raster kernel vs the per-agent reference on a tiled world."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from swarm_tpu.config import GridConfig
from swarm_tpu.geom.world import TILE_COLS, TILE_ROWS, make_tiled_rooms
from swarm_tpu.ops.beam_raster import (BeamSpec, beams_from_scan,
                                       free_raster_reference)
from swarm_tpu.ops.beam_raster_pallas import room_raster_pallas


def test_room_kernel_matches_reference():
    n_rooms, per_row = 4, 2
    walls, origins = make_tiled_rooms(n_rooms, per_row=per_row)
    size = max(per_row * TILE_COLS, 2 * TILE_ROWS)
    size = -(-size // 256) * 256
    cfg = GridConfig(size=size, origin_x=0.0, origin_y=0.0)

    rng = np.random.default_rng(0)
    n = 8
    room = np.arange(n) // 2
    xy = np.stack([origins[room, 0] + rng.uniform(1.0, 5.0, n),
                   origins[room, 1] + rng.uniform(1.0, 3.0, n)], -1)
    xy = jnp.asarray(xy, jnp.float32)
    yaw = jnp.asarray(rng.uniform(-np.pi, np.pi, n), jnp.float32)
    active = jnp.asarray([True] * (n - 1) + [False])
    d, _ = beams_from_scan(
        jnp.asarray(rng.uniform(0.1, 2.0, (n, 37)), jnp.float32), 1.2, 0.05)
    spec = BeamSpec.scan(37)
    lo = jnp.zeros((size, size), jnp.float32)

    ref, _ = free_raster_reference(lo, xy, yaw, d, active, spec, cfg,
                                   n_groups=16)
    with pltpu.force_tpu_interpret_mode():
        out, cnt = room_raster_pallas(lo, xy, yaw, d, active, spec, cfg,
                                      n_groups=16, per_row=per_row)
    diff = np.abs(np.asarray(out) - np.asarray(ref))
    # identical except cells the per-agent window reaches beyond its tile
    assert (diff > 1e-4).sum() <= 32, (diff > 1e-4).sum()
    assert (np.asarray(out) != 0).sum() > 500


def test_room_kernel_inactive_agents_noop():
    n_rooms, per_row = 2, 1
    walls, origins = make_tiled_rooms(n_rooms, per_row=per_row)
    size = -(-max(per_row * TILE_COLS, 2 * TILE_ROWS) // 256) * 256
    cfg = GridConfig(size=size, origin_x=0.0, origin_y=0.0)
    n = 4
    xy = jnp.asarray(np.stack([origins[np.arange(n) // 2, 0] + 2.0,
                               origins[np.arange(n) // 2, 1] + 2.0], -1),
                     jnp.float32)
    yaw = jnp.zeros((n,), jnp.float32)
    d = jnp.full((n, 37), 1.0, jnp.float32)
    lo = jnp.zeros((size, size), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out, cnt = room_raster_pallas(lo, xy, yaw, d, jnp.zeros((n,), bool),
                                      BeamSpec.scan(37), cfg,
                                      per_row=per_row)
    assert float(jnp.abs(out).max()) == 0.0
    assert float(jnp.abs(cnt).max()) == 0.0


def test_room_kernel_endpoint_painting_matches_window_kernel():
    """With `trusted`, the room kernel paints the same trusted-weighted
    endpoint rings as the per-agent window kernel (evidence fits inside
    both the [64, 256] window and the room tile for the 1.2 m reach)."""
    from swarm_tpu.ops.beam_raster_pallas import free_raster_pallas

    n_rooms, per_row = 4, 2
    walls, origins = make_tiled_rooms(n_rooms, per_row=per_row)
    size = -(-max(per_row * TILE_COLS, 2 * TILE_ROWS) // 256) * 256
    cfg = GridConfig(size=size, origin_x=0.0, origin_y=0.0)

    rng = np.random.default_rng(1)
    n = 8
    room = np.arange(n) // 2
    xy = jnp.asarray(np.stack(
        [origins[room, 0] + rng.uniform(1.0, 5.0, n),
         origins[room, 1] + rng.uniform(1.0, 3.0, n)], -1), jnp.float32)
    yaw = jnp.asarray(rng.uniform(-np.pi, np.pi, n), jnp.float32)
    active = jnp.ones((n,), bool)
    d, t = beams_from_scan(
        jnp.asarray(rng.uniform(0.1, 1.3, (n, 37)), jnp.float32), 1.2, 0.05)
    spec = BeamSpec.scan(37)
    lo = jnp.zeros((size, size), jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        win, wcnt = free_raster_pallas(lo, xy, yaw, d, active, spec, cfg,
                                       n_groups=8, trusted=t)
        rm, rcnt = room_raster_pallas(lo, xy, yaw, d, active, spec, cfg,
                                      n_groups=8, per_row=per_row,
                                      trusted=t)
    diff = np.abs(np.asarray(rm) - np.asarray(win))
    assert (diff > 1e-4).sum() <= 32, (diff > 1e-4).sum()
    # rings actually painted (positive evidence present)
    assert float(jnp.max(rm)) > 0.0
    # both kernels report the same in-kernel applied counts
    np.testing.assert_allclose(float(jnp.sum(rcnt)), float(jnp.sum(wcnt)),
                               rtol=1e-6)


def test_room_kernel_rejects_oversized_reach():
    """Evidence reach beyond the tile-row budget must fail loudly instead
    of silently truncating the map (review finding: SensorConfig.max_range
    is a free knob)."""
    import pytest

    size = 512
    cfg = GridConfig(size=size, origin_x=0.0, origin_y=0.0)
    n = 2
    xy = jnp.zeros((n, 2), jnp.float32)
    yaw = jnp.zeros((n,), jnp.float32)
    d = jnp.full((n, 37), 1.0, jnp.float32)
    with pytest.raises(ValueError, match="reach"):
        room_raster_pallas(jnp.zeros((size, size), jnp.float32), xy, yaw, d,
                           jnp.ones((n,), bool), BeamSpec.scan(37), cfg,
                           per_row=2, reach=80, interpret=True)
