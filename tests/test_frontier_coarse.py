"""Coarse frontier targets + grouped ray casting."""

import jax.numpy as jnp
import numpy as np

from swarm_tpu.config import CoordConfig, GridConfig
from swarm_tpu.geom.world import (BEDROOM_WALLS, cast_rays,
                                  cast_rays_grouped, make_multi_room,
                                  walls_by_group)
from swarm_tpu.ops.frontier import frontier_clusters, frontier_targets_coarse


def test_coarse_targets_near_exact_clusters():
    cfg = GridConfig(size=512)
    coord = CoordConfig(max_frontiers=16)
    grid = np.full((512, 512), -1, np.int8)
    # two free blobs bordered by unknown -> two frontier clusters
    grid[100:140, 100:140] = 0
    grid[300:330, 320:360] = 0
    g = jnp.asarray(grid)
    from swarm_tpu.ops.frontier import frontier_mask
    c_exact, _, n_exact = frontier_clusters(g, cfg, coord)
    c_coarse, sizes, n_coarse = frontier_targets_coarse(g, cfg, coord)
    assert int(n_exact) >= 2 and int(n_coarse) >= 2
    # every coarse target sits ON the frontier (within half a block of a
    # frontier cell), and both blobs are represented
    mask = np.asarray(frontier_mask(g, cfg))
    fy, fx = np.nonzero(mask)
    fw = np.stack([cfg.origin_x + (fx + 0.5) * cfg.resolution,
                   cfg.origin_y + (fy + 0.5) * cfg.resolution], -1)
    cc = np.asarray(c_coarse)[: int(n_coarse)]
    for p in cc:
        assert np.hypot(*(fw - p).T).min() < 0.5, p
    # blob membership: at least one target near each blob's bounding box
    near_a = (np.abs(cc[:, 0] - (cfg.origin_x + 120 * 0.05)) < 2.5) & \
             (np.abs(cc[:, 1] - (cfg.origin_y + 120 * 0.05)) < 2.5)
    near_b = (np.abs(cc[:, 0] - (cfg.origin_x + 340 * 0.05)) < 2.5) & \
             (np.abs(cc[:, 1] - (cfg.origin_y + 315 * 0.05)) < 2.5)
    assert near_a.any() and near_b.any()
    assert (np.asarray(sizes)[: int(n_coarse)] > 0).all()


def test_coarse_separation_suppression():
    cfg = GridConfig(size=512)
    coord = CoordConfig(max_frontiers=8, frontier_separation_m=2.0)
    grid = np.full((512, 512), -1, np.int8)
    grid[200:260, 200:260] = 0          # one big blob
    cents, _, n = frontier_targets_coarse(jnp.asarray(grid), cfg, coord)
    c = np.asarray(cents)[: int(n)]
    # suppression: no two targets closer than ~the separation radius
    if len(c) > 1:
        d = np.hypot(*(c[:, None] - c[None, :]).T)
        np.fill_diagonal(d, np.inf)
        assert d.min() > 1.0


def test_grouped_casting_matches_full():
    walls = make_multi_room(4, per_row=2)
    grouped = jnp.asarray(walls_by_group(walls))
    rng = np.random.default_rng(0)
    n = 16
    room = rng.integers(0, 4, n)
    ox = (room % 2) * 8.0 + rng.uniform(0.5, 5.0, n)
    oy = (room // 2) * 6.0 + rng.uniform(-1.5, 1.5, n)
    origins = jnp.asarray(np.stack([ox, oy], -1), jnp.float32)
    angles = jnp.asarray(rng.uniform(-np.pi, np.pi, n), jnp.float32)

    full = cast_rays(origins, angles, jnp.asarray(walls))
    culled = cast_rays_grouped(origins, angles, grouped,
                               jnp.asarray(room, jnp.int32))
    np.testing.assert_allclose(np.asarray(culled), np.asarray(full),
                               rtol=1e-5)
